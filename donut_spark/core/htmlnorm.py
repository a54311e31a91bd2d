"""HTML normalization / boilerplate-strip kernels.

Semantics pinned to the reference:

* :func:`normalize_dom` / :func:`clean_table_html` — the DOM
  boilerplate strip of `thirdparty/synthtable/utils/html_util.py:116-187`
  (`_remove_tags` + `remove_tag_in_table_cell`): block tags get space
  padding, ``ol``/``ul`` list items become marker text, ``<br>`` becomes a
  space, table-tag attributes are cleared, ``td`` content is flattened to
  text (``<img>`` kept via a sentinel or dropped) and ``td`` attributes
  pruned to non-"1" ``colspan``/``rowspan``.
* :func:`repair_table_html` — the compact-grammar repair of
  `teds.py:112-133` (``postprocess_html_tag``).
* :func:`postprocess_sequence` — decoder-output cleanup of
  `test.py:110` + `donut/model.py:851-853`.
* regex helpers — `html_util.py:5-31,190-213`, `donut/util.py:505-517`,
  `test.py:28-41`.
* :func:`table_stats` — the sidecar-stat computation of
  `script/convert_crawled_data_to_synthtiger.py:80-110`.
* charset classifiers — `synth_table.py:20-31`.
* :func:`html_to_spans` — the flagship main-content extraction: a
  normalized DOM walked in reading order, emitting interleaved
  ``(kind, text, media_ref)`` spans (media anchored at ``<img src>``),
  generalizing the reference's in-cell ``<img>`` handling
  (`html_util.py:154-167`) to whole documents.

Everything is pure Python (no Spark) and vectorization-friendly: one call
per document, wrapped in Arrow-batched pandas UDFs by
`donut_spark.functions.udfs`.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from .minidom import HNode, parse_html

__all__ = [
    "BLOCK_TAGS",
    "normalize_dom",
    "clean_table_html",
    "extract_main_text",
    "extract_main_content",
    "strip_boilerplate_dom",
    "html_to_spans",
    "repair_table_html",
    "postprocess_sequence",
    "preprocess_label",
    "remove_html_tags",
    "remove_close_tags",
    "remove_thead_tbody",
    "collapse_whitespace",
    "normalize_compact_html",
    "table_stats",
    "CHARSET_PATTERNS",
    "classify_charset",
]

# html_util.py:44-63 — note "li" is intentionally absent (commented out
# in the reference); list items are handled by the ol/ul marker passes.
BLOCK_TAGS = (
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "textarea",
    "figcaption", "legend", "blockquote", "nav", "dt", "dd", "pre",
)
_NEWLINE_TAGS = ("br",)
_TABLE_TAGS = ("table", "thead", "tbody", "tr")
_IMG_SENTINEL = "[[[img]]]"

_MULTI_SPACE_RE = re.compile(r"\s+")
_TAG_RE = re.compile(r"<.*?>")
_CLOSE_TAG_RE = re.compile(r"</.*?>")
_THEAD_TBODY_RE = re.compile(r"(<tbody>|<thead>|</tbody>|</thead>)")
_SENTINEL_RE = re.compile(r"\[\[\[img\]\]\]")
_SPACE_TR_RE = re.compile(r"\s?<tr>\s?")
_SPACE_TD_RE = re.compile(r"\s?<td>\s?")
_SPACE_IMG_RE = re.compile(r"\s?<img>\s?")
_TR_TD_RE = re.compile(r"<tr>[ ]*</td>")
_SPAN_ATTR_SPACE_RE = re.compile(r'(span="[0-9]+">){1,2}[ ]')
_SEQ_SPACE_RE = re.compile(r"(?:(?<=>) | (?=</s_))")
_FIRST_TAG_RE = re.compile(r"<.*?>")

# synth_table.py:20-31 — unicode-range language classifiers.
CHARSET_PATTERNS = {
    "korean": re.compile(r"[가-힣ᄀ-ᇿㄱ-㆏]"),
    "japanese": re.compile(r"[぀-ゟ゠-ヿㇰ-ㇿ]"),
    "chinese": re.compile(
        r"[⺀-⻿㐀-䶿一-龿豈-﫿"
        r"\U00020000-\U0002A6DF\U0002F800-\U0002FA1F]"
    ),
    "english": re.compile(
        r"[\u0000-\u007E¡-¿Ⅰ-Ⅻⅰ-ⅻ"
        r"←-↙∀-⋿①-⑳Ⓐ-ⓩ"
        r"×÷※•]"
    ),
    "latin_number": re.compile(r"[0-9A-Za-z]"),
}


def collapse_whitespace(text: str) -> str:
    """``\\s+`` -> single space (html_util.py:18-19)."""
    return _MULTI_SPACE_RE.sub(" ", text)


def remove_html_tags(text: str) -> str:
    """Strip every tag (test.py:28-32)."""
    return _TAG_RE.sub("", text)


def remove_close_tags(text: str) -> str:
    """Strip only closing tags (html_util.py:21-25)."""
    return _CLOSE_TAG_RE.sub("", text)


def remove_thead_tbody(html: str) -> str:
    """Drop thead/tbody wrappers (html_util.py:196-197)."""
    return _THEAD_TBODY_RE.sub("", html)


def preprocess_label(html: str, remove_img_tag: bool = False) -> str:
    """Label preprocessing (donut/util.py:511-517): optionally drop
    ``<img>`` and collapse whitespace (only when dropping, as in the
    reference)."""
    if remove_img_tag:
        html = html.replace("<img>", "")
        html = collapse_whitespace(html)
    return html


def normalize_compact_html(html: str) -> str:
    """newline→space, collapse, and de-space ``<tr>/<td>/<img>`` seams
    (html_util.py:207-213)."""
    html = html.replace("\n", " ")
    html = collapse_whitespace(html).strip()
    html = _SPACE_TR_RE.sub("<tr>", html)
    html = _SPACE_TD_RE.sub("<td>", html)
    html = _SPACE_IMG_RE.sub("<img>", html)
    return html


def postprocess_sequence(seq: str, drop_first_task_token: bool = True) -> str:
    """Decoder-output cleanup: drop spaces after ``>`` / before ``</s_``
    (test.py:110) and remove the first ``<...>`` task token
    (donut/model.py:853)."""
    if drop_first_task_token:
        seq = _FIRST_TAG_RE.sub("", seq, count=1)
    return _SEQ_SPACE_RE.sub("", seq)


# --------------------------------------------------------------------------
# DOM normalization (html_util.py:116-187)
# --------------------------------------------------------------------------

_OL_MARKER_BASES = {"1": None, "a": 97, "A": 65, "i": 8560, "I": 8544}

# precomputed _index tag sets (per-call set construction was measurable)
_NEWLINE_SET = frozenset(_NEWLINE_TAGS)
_NORM_ALL_TAGS = frozenset(
    BLOCK_TAGS + ("ol", "ul") + _NEWLINE_TAGS + _TABLE_TAGS + ("td",)
)
_NORM_LATE_TAGS = frozenset(_NEWLINE_TAGS + _TABLE_TAGS + ("td",))


def _ol_marker(ol_type: str, idx: int) -> str:
    base = _OL_MARKER_BASES.get(ol_type)
    if ol_type == "1" or ol_type not in _OL_MARKER_BASES:
        return str(idx + 1)
    return chr(base + idx)


def _index(root: HNode, tags, parent_tags=()) -> tuple:
    """Single pre-order traversal → ({tag: [nodes]}, {id(node): parent}).

    The parent map records only children whose tag is in ``parent_tags``
    (the br pass is the sole reader; indexing every node's parent was
    one dict write per tree node for nothing).

    Mutation-sensitive: callers re-index after structural changes, at
    the same points the reference's repeated ``find_all`` calls would
    observe them (bs4 re-queries the live tree per pass)."""
    wanted = tags if isinstance(tags, frozenset) else frozenset(tags)
    need_parent = (
        parent_tags
        if isinstance(parent_tags, frozenset)
        else frozenset(parent_tags)
    )
    by_tag: dict = {}
    parent: dict = {}
    stack = [root]
    while stack:
        node = stack.pop()
        if node.tag in wanted:
            lst = by_tag.get(node.tag)
            if lst is None:
                by_tag[node.tag] = [node]
            else:
                lst.append(node)
        kids = node.children
        if kids:
            if need_parent:
                for c in kids:
                    if c.tag in need_parent:
                        parent[id(c)] = node
            stack.extend(reversed(kids))
    return by_tag, parent


def normalize_dom(root: HNode, remove_img_tag: bool = False) -> HNode:
    """Apply the reference's boilerplate-normalization passes in order.

    Mutates and returns ``root``. Pass order matters and follows
    `html_util.py:116-179`: block-tag spacing → ol markers → ul bullets →
    br → table-attr clearing → td flattening/attr pruning.
    """
    # one pre-order walk indexes EVERY pass's tags up front; the pass-4/6
    # tags are re-indexed below only when the list passes actually
    # detached nodes (round-6: most fragments have no lists, and the
    # second full-tree walk was ~17% of html_to_spans)
    by_tag, parents = _index(root, _NORM_ALL_TAGS, parent_tags=_NEWLINE_SET)

    # 1. block tags: pad with spaces; wrap direct text children in spaces
    # (text-only mutation — the index stays valid)
    for name in BLOCK_TAGS:
        for tag in by_tag.get(name, ()):
            tag.insert_text(0, " ")
            tag.append_text(" ")
            for child in list(tag.children):
                if child.is_text:
                    child.data = f" {child.data} "

    # 2. ordered lists: li → " N. text "
    ols = by_tag.get("ol", ())
    uls0 = by_tag.get("ul", ())
    for ol in ols:
        ol_type = ol.attrs.get("type")
        if ol_type not in _OL_MARKER_BASES:
            ol_type = "1"
        for idx, li in enumerate(list(ol.find_all("li"))):
            li.replace_with_text(ol, f" {_ol_marker(ol_type, idx)}. {li.text} ")

    # 3. unordered lists: li → " • text " (re-query when ol mutations may
    # have detached nested uls — mirrors bs4's live re-query)
    uls = root.find_all("ul") if ols and uls0 else uls0
    for ul in uls:
        for li in list(ul.find_all("li")):
            li.replace_with_text(ul, f" • {li.text} ")

    # fresh index ONLY when the list replacements above detached nodes;
    # pass 1 is text-only mutation (the comment there), so with no
    # ol/ul in the tree the up-front index is still exact for passes
    # 4-6 (added text nodes never appear in by_tag, and every element's
    # parent link is unchanged)
    if ols or uls0:
        by_tag, parents = _index(root, _NORM_LATE_TAGS, parent_tags=_NEWLINE_SET)

    # 4. line breaks → space
    for name in _NEWLINE_TAGS:
        for tag in by_tag.get(name, ()):
            p = parents.get(id(tag))
            if p is not None:
                p.replace_child(tag, HNode(None, data=" "))

    # 5. structural table tags lose all attributes
    for name in _TABLE_TAGS:
        for tag in by_tag.get(name, ()):
            tag.attrs = {}

    # 6. table cells: flatten to text (img → sentinel → <img>), prune attrs
    for td in by_tag.get("td", ()):
        imgs = td.find_all("img")
        if remove_img_tag:
            for img in imgs:
                img.replace_with_text(td, " ")
            text = td.text
        else:
            for img in imgs:
                img.replace_with_text(td, _IMG_SENTINEL)
            text = td.text
            if imgs:
                text = _SENTINEL_RE.sub("<img>", text)
        td.set_string(collapse_whitespace(text).strip())

        for key in list(td.attrs.keys()):
            if key not in ("colspan", "rowspan"):
                del td.attrs[key]
            elif td.attrs[key] == "1":
                del td.attrs[key]

    return root


def clean_table_html(html: str, remove_img_tag: bool = False) -> str:
    """String→string form of :func:`normalize_dom`
    (`remove_tag_in_table_cell`, html_util.py:181-187)."""
    return normalize_dom(parse_html(html), remove_img_tag).to_html()


def extract_main_text(html: str, keep_img: bool = False) -> str:
    """Main-content text of an HTML fragment: normalized DOM → descendant
    text → whitespace collapse. ``keep_img`` leaves an ``<img>`` marker
    per image (the reference's in-cell behavior, html_util.py:154-167),
    applied document-wide."""
    root = normalize_dom(parse_html(html), remove_img_tag=not keep_img)
    if keep_img:
        for img in list(root.find_all("img")):
            img.replace_with_text(root, f" {_IMG_SENTINEL} ")
        text = _SENTINEL_RE.sub("<img>", root.text)
    else:
        for img in list(root.find_all("img")):
            img.replace_with_text(root, " ")
        text = root.text
    return collapse_whitespace(text).strip()


def html_to_spans(html: str) -> List[Tuple[str, str, str]]:
    """Flagship extraction kernel: normalized DOM walked in reading order,
    emitting interleaved ``(kind, text, media_ref)`` pieces.

    Text between media anchors becomes one whitespace-collapsed text
    piece; each ``<img>`` (outside table cells, where the reference's td
    flattening already applied) becomes a media piece carrying its ``src``
    as ``media_ref``. Empty text pieces are dropped.
    """
    root = normalize_dom(parse_html(html), remove_img_tag=False)
    pieces: List[Tuple[str, str, str]] = []
    buf: List[str] = []

    def flush() -> None:
        text = collapse_whitespace("".join(buf)).strip()
        buf.clear()
        if text:
            pieces.append(("text", text, ""))

    def walk(node: HNode) -> None:
        for child in node.children:
            if child.is_text:
                buf.append(child.data)
            elif child.tag == "img":
                flush()
                pieces.append(("media", "", child.attrs.get("src", "")))
            else:
                walk(child)
                if child.tag in ("td", "tr"):
                    # cell/row boundaries are word boundaries in reading order
                    buf.append(" ")

    walk(root)
    flush()
    return pieces


# --------------------------------------------------------------------------
# Compact-grammar repair (teds.py:112-133)
# --------------------------------------------------------------------------


def repair_table_html(compact: str) -> str:
    """Repair the model's compact table grammar into valid HTML.

    Reference-exact replacement sequence (`postprocess_html_tag`,
    teds.py:115-133) — the order of the string replaces is semantic."""
    s = compact.replace("<td", "</td><td")
    s = _TR_TD_RE.sub("<tr>", s)
    s = s.replace("<tdrowspan", "<td rowspan")
    s = s.replace("<tdcolspan", "<td colspan")
    s = s.replace("<tr>", "</td></tr><tr>")
    if s.startswith("<thead>"):
        s = s.replace("<thead></td></tr>", "<thead>")
    else:
        s = s[10:]
    s = s.replace("<tbody></td></tr>", "</td></tr></thead><tbody>")
    if s.startswith("<thead>"):
        s += "</td></tr></tbody>"
    else:
        s += "</td></tr>"
    s = s.replace("<td> ", "<td>")
    s = _SPAN_ATTR_SPACE_RE.sub(r"\1", s)
    return "<table>{}</table>".format(s.replace(" </td>", "</td>"))


# --------------------------------------------------------------------------
# Table sidecar stats (convert_crawled_data_to_synthtiger.py:80-110)
# --------------------------------------------------------------------------


def table_stats(html: str) -> dict:
    """Compute the D6 sidecar struct for a table HTML string: row count,
    first-row column count (colspan-aware), max row/col span, has-span
    flags."""
    root = parse_html(html)
    trs = root.find_all("tr")
    nums_row = len(trs)
    nums_col = 0
    if trs:
        for td in trs[0].find_all("td"):
            nums_col += int(td.attrs.get("colspan", "1") or "1")

    max_row_span = 0
    max_col_span = 0
    for td in root.find_all("td"):
        if "rowspan" in td.attrs:
            max_row_span = max(max_row_span, int(td.attrs["rowspan"]))
        if "colspan" in td.attrs:
            max_col_span = max(max_col_span, int(td.attrs["colspan"]))

    return {
        "nums_row": nums_row,
        "nums_col": nums_col,
        "max_row_span": max_row_span,
        "max_col_span": max_col_span,
        "has_span": max_row_span > 1 or max_col_span > 1,
        "has_row_span": max_row_span > 1,
        "has_col_span": max_col_span > 1,
    }


def classify_charset(text: str) -> Optional[str]:
    """First matching charset class in priority order (ko/ja/zh/en), else
    None — mirrors the rejection-filter usage in synth_table.py:972-976."""
    for name in ("korean", "japanese", "chinese", "english"):
        if CHARSET_PATTERNS[name].search(text):
            return name
    return None


# ---------------------------------------------------------------------------
# Readability-style boilerplate block pruning (text-density heuristics)
# ---------------------------------------------------------------------------
#
# The reference's SynthDoG pipeline generates documents WITHOUT web chrome,
# so its normalization passes never face nav bars / footers / link farms.
# The deployment target (BASELINE.json north_star: "boilerplate/background
# stripping via text-density and region heuristics ... readability-style
# block scoring") DOES: crawled pages carry chrome that must not reach the
# extracted spans. This implements the public arc90-readability heuristic
# family: structural kill tags, boilerplate id/class names, and
# link-density pruning of low-text blocks.

_KILL_TAGS = ("nav", "footer", "aside", "script", "style", "form", "noscript")
_BLOCK_CANDIDATES = ("div", "section", "header", "ul", "ol", "table")
_BOILER_NAME_RE = re.compile(
    r"nav|menu|footer|header|sidebar|side-bar|banner|breadcrumb|advert|"
    r"\bads?\b|promo|cookie|share|social|comment|related|widget|popup",
    re.IGNORECASE,
)


def _block_text_stats(node: HNode) -> Tuple[int, int]:
    """(total text length, anchor-text length) of a block, collapsed."""
    total = len(collapse_whitespace(node.text).strip())
    link = sum(
        len(collapse_whitespace(a.text).strip()) for a in node.find_all("a")
    )
    return total, link


def strip_boilerplate_dom(
    root: HNode,
    max_link_density: float = 0.4,
    min_content_chars: int = 200,
) -> HNode:
    """Prune boilerplate blocks in place and return ``root``.

    Three passes (each a single traversal; document-size linear):
    1. kill structural chrome tags outright (nav/footer/aside/script/...);
    2. kill blocks whose id/class names boilerplate (menu, sidebar, ads…);
    3. kill low-text blocks dominated by links: link_density >
       ``max_link_density`` AND text shorter than ``min_content_chars``
       (a long article that happens to cite many links survives).
    """
    for _ in range(2):  # nested chrome: second pass catches re-parented text
        index, parents = _index(
            root,
            _KILL_TAGS + _BLOCK_CANDIDATES,
            parent_tags=_KILL_TAGS + _BLOCK_CANDIDATES,
        )
        changed = False
        for tag in _KILL_TAGS:
            for node in index.get(tag, []):
                p = parents.get(id(node))
                if p is not None and p.replace_child(node, HNode(None, data=" ")):
                    changed = True
        for tag in _BLOCK_CANDIDATES:
            for node in index.get(tag, []):
                name_blob = " ".join(
                    str(node.attrs.get(k, "")) for k in ("id", "class", "role")
                )
                boiler_name = bool(_BOILER_NAME_RE.search(name_blob))
                if not boiler_name:
                    total, link = _block_text_stats(node)
                    if total == 0:
                        continue
                    if link / total <= max_link_density or total >= min_content_chars:
                        continue
                p = parents.get(id(node))
                if p is not None and p.replace_child(node, HNode(None, data=" ")):
                    changed = True
        if not changed:
            break
    return root


def extract_main_content(html: str) -> str:
    """Main-content text of a full page: boilerplate block pruning
    (readability heuristics above) → reference normalization passes →
    collapsed descendant text. The crawl-facing entry point; for chrome-free
    reference-style fragments it degrades to :func:`extract_main_text`."""
    root = strip_boilerplate_dom(parse_html(html))
    root = normalize_dom(root, remove_img_tag=True)
    for img in list(root.find_all("img")):
        img.replace_with_text(root, " ")
    return collapse_whitespace(root.text).strip()
