"""Golden tests for the HTML normalization kernels, pinned to
html_util.py:116-187 (boilerplate strip) and teds.py:112-133 (grammar
repair)."""

from donut_spark.core.htmlnorm import (
    classify_charset,
    clean_table_html,
    collapse_whitespace,
    extract_main_text,
    html_to_spans,
    normalize_compact_html,
    postprocess_sequence,
    preprocess_label,
    remove_close_tags,
    remove_html_tags,
    remove_thead_tbody,
    repair_table_html,
    table_stats,
)


# -- regex helpers --


def test_remove_html_tags():
    assert remove_html_tags("<b>bold</b> text") == "bold text"


def test_remove_close_tags():
    assert remove_close_tags("<b>bold</b> text") == "<b>bold text"


def test_remove_thead_tbody():
    assert remove_thead_tbody("<thead><tr></tr></thead><tbody></tbody>") == "<tr></tr>"


def test_collapse_whitespace():
    assert collapse_whitespace("a  b\n\tc") == "a b c"


def test_preprocess_label():
    assert preprocess_label("<img> a  b", remove_img_tag=True) == " a b"
    # without the flag nothing happens (reference keeps raw spacing)
    assert preprocess_label("<img> a  b") == "<img> a  b"


def test_normalize_compact_html():
    assert normalize_compact_html("a \n <tr> <td> x") == "a<tr><td>x"


def test_postprocess_sequence():
    # drops the first <task> token and the pad spaces around tags
    seq = "<s_tableocr><s_a> v </s_a>"
    assert postprocess_sequence(seq) == "<s_a>v</s_a>"


# -- boilerplate strip (T8) --


def test_block_tags_get_space_padding():
    out = extract_main_text("<p>one</p><p>two</p>")
    assert out == "one two"


def test_br_becomes_space():
    assert extract_main_text("a<br>b") == "a b"


def test_ol_li_markers_numeric():
    out = extract_main_text("<ol><li>first</li><li>second</li></ol>")
    assert out == "1. first 2. second"


def test_ol_li_markers_alpha():
    out = extract_main_text('<ol type="a"><li>x</li><li>y</li></ol>')
    assert out == "a. x b. y"


def test_ol_li_markers_upper_roman():
    out = extract_main_text('<ol type="I"><li>x</li><li>y</li></ol>')
    assert out == "Ⅰ. x Ⅱ. y"


def test_ul_li_bullets():
    out = extract_main_text("<ul><li>x</li><li>y</li></ul>")
    assert out == "• x • y"


def test_td_flatten_and_attr_prune():
    html = '<table border="1"><tr><td class="z" colspan="2"><b>a</b> b</td><td rowspan="1">c</td></tr></table>'
    out = clean_table_html(html)
    assert out == '<table><tr><td colspan="2">a b</td><td>c</td></tr></table>'


def test_td_img_sentinel_kept():
    html = '<table><tr><td>x <img src="i1.png"> y</td></tr></table>'
    out = clean_table_html(html)
    assert out == "<table><tr><td>x <img> y</td></tr></table>"


def test_td_img_removed_when_flagged():
    html = "<table><tr><td>x <img> y</td></tr></table>"
    out = clean_table_html(html, remove_img_tag=True)
    assert out == "<table><tr><td>x y</td></tr></table>"


def test_table_structural_attrs_cleared():
    html = '<table style="border:0"><thead class="h"><tr id="r1"><td>x</td></tr></thead></table>'
    out = clean_table_html(html)
    assert out == "<table><thead><tr><td>x</td></tr></thead></table>"


def test_nested_boilerplate_document():
    html = (
        '<div class="nav"><nav>menu junk</nav></div>'
        "<div><h1>Title</h1><p>Body  text<br>more</p></div>"
    )
    assert extract_main_text(html) == "menu junk Title Body text more"


def test_extract_keep_img_marker():
    out = extract_main_text('a <img src="x"> b', keep_img=True)
    assert out == "a <img> b"


# -- flagship span extraction --


def test_html_to_spans_interleaving():
    html = '<p>intro</p><img src="img_1"><p>middle</p><img src="img_2"><p>end</p>'
    spans = html_to_spans(html)
    assert spans == [
        ("text", "intro", ""),
        ("media", "", "img_1"),
        ("text", "middle", ""),
        ("media", "", "img_2"),
        ("text", "end", ""),
    ]


def test_html_to_spans_drops_empty_text():
    spans = html_to_spans('<img src="a"><img src="b">')
    assert spans == [("media", "", "a"), ("media", "", "b")]


def test_html_to_spans_plain_text():
    assert html_to_spans("just words") == [("text", "just words", "")]


# -- grammar repair (T4) --


def test_repair_simple_tbody_table():
    compact = "<tr><td>a<td>b<tr><td>c<td>d"
    out = repair_table_html(compact)
    assert out == (
        "<table><tr><td>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></table>"
    )


def test_repair_thead_tbody_table():
    compact = "<thead><tr><td>h1<td>h2<tbody><tr><td>a<td>b"
    out = repair_table_html(compact)
    assert out == (
        "<table><thead><tr><td>h1</td><td>h2</td></tr></thead>"
        "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>"
    )


def test_repair_span_attrs():
    compact = '<tr><tdcolspan="2"> x<td>y'
    out = repair_table_html(compact)
    assert out == '<table><tr><td colspan="2">x</td><td>y</td></tr></table>'


def test_repair_strips_cell_pad_spaces():
    compact = "<tr><td> a <td> b"
    out = repair_table_html(compact)
    assert out == "<table><tr><td>a</td><td>b</td></tr></table>"


# -- stats + charset --


def test_table_stats():
    html = (
        '<table><tr><td colspan="2">a</td><td>b</td></tr>'
        '<tr><td rowspan="3">c</td><td>d</td><td>e</td></tr></table>'
    )
    stats = table_stats(html)
    assert stats == {
        "nums_row": 2,
        "nums_col": 3,
        "max_row_span": 3,
        "max_col_span": 2,
        "has_span": True,
        "has_row_span": True,
        "has_col_span": True,
    }


def test_table_stats_no_spans():
    stats = table_stats("<table><tr><td>a</td></tr></table>")
    assert stats["has_span"] is False
    assert stats["nums_col"] == 1


def test_classify_charset():
    assert classify_charset("한국어 텍스트") == "korean"
    assert classify_charset("ひらがな") == "japanese"
    assert classify_charset("中文") == "chinese"
    assert classify_charset("plain english") == "english"


class TestBoilerplateStrip:
    """Readability-style block pruning (north-star text-density and
    region heuristics)."""

    def test_chrome_killed_content_kept(self):
        from donut_spark.core.htmlnorm import extract_main_content

        page = (
            '<html><body><nav><a href="/">Home</a> <a href="/a">About</a></nav>'
            '<div class="sidebar"><a href="/x">L1</a> <a href="/y">L2</a></div>'
            '<div id="main"><p>actual article body text</p></div>'
            '<div class="ads"><a href="/buy">BUY NOW</a></div>'
            '<footer>(c) 2026</footer></body></html>'
        )
        assert extract_main_content(page) == "actual article body text"

    def test_link_farm_density_pruned_without_class_hint(self):
        from donut_spark.core.htmlnorm import extract_main_content

        page = (
            "<div><a href=1>x</a> <a href=2>y</a> <a href=3>z</a></div>"
            "<div><p>real content stays</p></div>"
        )
        assert extract_main_content(page) == "real content stays"

    def test_long_article_with_links_survives(self):
        from donut_spark.core.htmlnorm import extract_main_content

        body = "word " * 60 + '<a href="/ref">citation link</a>'
        out = extract_main_content(f"<div>{body}</div>")
        assert out.startswith("word word") and "citation link" in out

    def test_nested_chrome_second_pass(self):
        from donut_spark.core.htmlnorm import extract_main_content

        page = (
            '<div class="wrapper"><nav><a>A</a></nav>'
            '<div class="menu"><div class="inner"><a>B</a> <a>C</a></div></div>'
            "<p>kept</p></div>"
        )
        assert extract_main_content(page) == "kept"

    def test_chrome_free_fragment_unchanged(self):
        from donut_spark.core.htmlnorm import (
            extract_main_content,
            extract_main_text,
        )

        frag = "<h1>Title</h1><p>body text</p><ul><li>item</li></ul>"
        assert extract_main_content(frag) == extract_main_text(frag)


def test_extraction_kernel_never_crashes_on_tag_soup():
    """The 'never fail the job' guarantee starts at the kernel: arbitrary
    malformed tag soup (unclosed tags, bogus entities, nested garbage,
    control chars, lone angle brackets) must flow through html_to_spans /
    extract_main_text without raising — anything recoverable yields
    spans, anything else yields empty output, never an exception."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from donut_spark.core.htmlnorm import extract_main_text, html_to_spans

    fragment = st.one_of(
        st.sampled_from(
            [
                "<p>", "</p>", "<div", ">", "<", "<!--", "-->", "<![CDATA[",
                "<img src=", "&amp;", "&#xZZ;", "<td colspan=>", "</",
                "<script>var x='</p>';</script>", "\x00", "\x1b[0m",
                '<a href="', "<p class=>", "<<<>>>", "<table><tr><td>",
            ]
        ),
        st.text(max_size=12),
    )
    soup = st.lists(fragment, max_size=25).map("".join)

    @settings(max_examples=150, deadline=None)
    @given(soup)
    def check(html):
        spans = html_to_spans(html)
        assert isinstance(spans, list)
        for kind, text, ref in spans:
            assert kind in ("text", "media")
            assert isinstance(text, str) and isinstance(ref, str)
        assert isinstance(extract_main_text(html), str)

    check()
