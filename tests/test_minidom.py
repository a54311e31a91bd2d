"""Byte-parity of the round-6 fast tokenizer in ``core.minidom`` against
the reference ``html.parser`` path (``_parse_html_slow``).

The fast path claims EXACT tree equality (tag, attrs, text-node payloads
AND boundaries — normalize_dom's block pass pads each direct text child,
so granularity is semantic) on its grammar subset, and whole-document
fallback outside it. These tests pin both halves: an adversarial corpus
of every construct class the stdlib parser treats specially, a seeded
random fuzz over mixed subset/non-subset fragments, and a
no-silent-fallback canary proving canonical fixture shapes really take
the fast path."""

import random

import pytest

from donut_spark.core import minidom
from donut_spark.core.minidom import _parse_html_slow, parse_html


def tree_eq(a, b):
    if a.tag != b.tag or a.attrs != b.attrs or a.data != b.data:
        return False
    if len(a.children) != len(b.children):
        return False
    return all(tree_eq(x, y) for x, y in zip(a.children, b.children))


ADVERSARIAL = [
    "", "plain text", "a < b", "<", "</", "</>", "<>", "<3>",
    "<!doctype html><p>x</p>", "<!-- c --><p>x</p>", "<?pi?>",
    "<div class='x'>t</div>", "<li type=a>x</li>",
    '<div class = "x">t</div>', '<div class == "x">t</div>',
    '<div class="a&amp;b">t</div>', '<div class="x"extra>t</div>',
    "<div/ >x</div>", '<div / class="x">x</div>',
    '<DIV CLASS="X">t</DIV>', '<div\nclass="x">t</div>', "<li\n>x",
    "<script>if (a<b) {}</script>", "<style>a>b{}</style>",
    "<ScRiPt>x</ScRiPt>", "<p>a&amp;b</p>", "&amp;", "a&nbsp;b",
    "&#65;", "&#x41;", "&bogus;", "a&b", "a&", "<p>x", "<p", "<p x",
    '<p x="', "<div><p>a</div>b</p>", "</p>stray",
    '<td colspan="2" rowspan="1">x</td>', '<img src="a.png"/>',
    '<img src="a.png">', "<br/><br /><br>", "<foo-bar>x</foo-bar>",
    "<foo:b>x</foo:b>", "<a.b>x</a.b>", "<di\x00v>x", "<p >x</p >",
    "</ p>x", "<p></P>", "<ul><li>a<li>b</ul>",
    '<table border="1"><tr><td>a</td></tr></table>', "<em/>text",
    '<p a="1" a="2">x</p>', '<p  a="1"  b="2" >x</p>', '<p a="">x</p>',
    "a<<b", "a<=b", "x</li attr>y", "<p>\r\n\t x </p>", "<wbr>a</wbr>",
    "<p>&#65;&#x41;&AMP;&amp</p>", '<input value="a&quot;b">',
]


@pytest.mark.parametrize("html", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_fast_parse_matches_reference_adversarial(html):
    assert tree_eq(parse_html(html), _parse_html_slow(html))


_TAGS = [
    "p", "div", "li", "ul", "ol", "td", "tr", "table", "b", "br",
    "img", "h1", "span", "scrip", "style2", "DIV", "foo-x",
]
_PIECES = [
    "text ", "a&amp;b", "&", "<", ">", "&#65;", " ", "\n", "x<y",
    "&bogus;", '"', "'", "=", "/",
]


def _rand_doc(r):
    out = []
    for _ in range(r.randint(0, 25)):
        c = r.random()
        if c < 0.35:
            out.append(r.choice(_PIECES))
        elif c < 0.6:
            t = r.choice(_TAGS)
            attrs = ""
            for _ in range(r.randint(0, 2)):
                q = r.choice(['"', "'", ""])
                attrs += (
                    f" {r.choice(['class', 'type', 'a b', 'x='])}="
                    f"{q}{r.choice(['v', 'a&amp;b', '<', ''])}{q}"
                )
            out.append(f"<{t}{attrs}{r.choice(['', '/', '/ ', ' '])}>")
        elif c < 0.85:
            out.append(f"</{r.choice(_TAGS)}{r.choice(['', ' ', '  x'])}>")
        else:
            out.append(
                r.choice(["<!-- c -->", "<!d>", "<?p?>", "</>", "<!", "<p", "</ p>"])
            )
    return "".join(out)


def test_fast_parse_matches_reference_fuzz():
    rng = random.Random(42)
    for _ in range(20000):
        doc = _rand_doc(rng)
        assert tree_eq(parse_html(doc), _parse_html_slow(doc)), repr(doc)


def test_subset_documents_do_not_fall_back(monkeypatch):
    """Canonical fixture shapes must take the fast tokenizer — if a
    regression sent everything through the fallback, the parity tests
    above would still pass while the speedup silently vanished."""

    def boom(html):  # pragma: no cover - should never run
        raise AssertionError("fast path fell back on a subset document")

    monkeypatch.setattr(minidom, "_parse_html_slow", boom)
    for doc in [
        '<div class="c5"><b>order</b> text</div>',
        '<ol type="A"><li>a</li><li>b</li></ol>',
        '<table border="1"><tr><td colspan="2">x<br/></td></tr></table>',
        "plain text only",
        '<p a="1">x &amp; y</p>',
    ]:
        root = parse_html(doc)
        assert root.tag == "[document]"


def test_fallback_documents_still_parse(monkeypatch):
    """Risky constructs must DELEGATE: comments, PIs, script CDATA."""
    calls = []
    real = minidom._parse_html_slow

    def spy(html):
        calls.append(html)
        return real(html)

    monkeypatch.setattr(minidom, "_parse_html_slow", spy)
    for doc in ["<!-- c --><p>x</p>", "<script>a<b</script>", "<p class='q'>x</p>"]:
        parse_html(doc)
    assert len(calls) == 3
