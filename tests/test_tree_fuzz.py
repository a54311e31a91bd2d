"""Adversarial fuzz of token2json against a PINNED reference twin.

``_reference_token2json`` below is an independent, deliberately literal
transcription of the reference's control flow (`donut/model.py:1020-
1070`) — unescaped key in the end-tag regex, no DOTALL on the content
search, global start-token replace, sibling-list recursion on a
trailing ``<sep/>``, the ``text_sequence`` fallback. The production
kernel (`donut_spark/core/tree.py`) is structured differently; these
tests demand ZERO divergence between the two on adversarial token soup
— nested unmatched tags, ``<sep/>`` at boundaries, categorical
collisions, case-twisted tags, regex-metachar keys, newline content.
"""

import json
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from donut_spark.core.tree import json2token, roundtrip_ok, token2json

_VOCAB = frozenset({"yes", "no", "maybe"})
_WRAPPED = {f"<{t}/>" for t in _VOCAB}


def _reference_token2json(tokens, is_inner_value=False):
    """Literal transcription of donut/model.py:1020-1070 (the pinned
    behavioral twin; `get_added_vocab` replaced by the test vocab)."""
    output = dict()
    while tokens:
        start_token = re.search(r"<s_(.*?)>", tokens, re.IGNORECASE)
        if start_token is None:
            break
        key = start_token.group(1)
        end_token = re.search(rf"</s_{key}>", tokens, re.IGNORECASE)
        start_token = start_token.group()
        if end_token is None:
            tokens = tokens.replace(start_token, "")
        else:
            end_token = end_token.group()
            start_token_escaped = re.escape(start_token)
            end_token_escaped = re.escape(end_token)
            content = re.search(
                f"{start_token_escaped}(.*?){end_token_escaped}",
                tokens,
                re.IGNORECASE,
            )
            if content is not None:
                content = content.group(1).strip()
                if r"<s_" in content and r"</s_" in content:  # non-leaf
                    value = _reference_token2json(content, is_inner_value=True)
                    if value:
                        if len(value) == 1:
                            value = value[0]
                        output[key] = value
                else:  # leaf nodes
                    output[key] = []
                    for leaf in content.split(r"<sep/>"):
                        leaf = leaf.strip()
                        if leaf in _WRAPPED and leaf[0] == "<" and leaf[-2:] == "/>":
                            leaf = leaf[1:-2]
                        output[key].append(leaf)
                    if len(output[key]) == 1:
                        output[key] = output[key][0]
            tokens = tokens[tokens.find(end_token) + len(end_token):].strip()
            if tokens[:6] == r"<sep/>":
                return [output] + _reference_token2json(tokens[6:], is_inner_value=True)
    if len(output):
        return [output] if is_inner_value else output
    else:
        return [] if is_inner_value else {"text_sequence": tokens}


def _compilable_end_tag(key: str) -> bool:
    """Keys whose UNESCAPED end-tag pattern fails to compile crash the
    reference outright, and keys whose pattern is NULLABLE (matches the
    empty string — e.g. 'a||b') LIVELOCK it (the zero-width end match
    never advances the cursor). Our kernel deliberately survives both
    (see tree.py docstring), so they're excluded from the parity
    property and covered by the directed tests below."""
    try:
        pat = re.compile(f"</s_{key}>", re.IGNORECASE)
    except re.error:
        return False
    return pat.search("") is None  # nullable pattern -> reference livelocks


# adversarial fragments: tags with metachar/cased keys, stray ends,
# separators at boundaries, categorical tokens, garbage, newlines
_keys = st.text(alphabet="abcxyzAB_.|*?+0", min_size=1, max_size=5)
_frag = st.one_of(
    _keys.map(lambda k: f"<s_{k}>"),
    _keys.map(lambda k: f"</s_{k}>"),
    st.just("<sep/>"),
    st.sampled_from(sorted(_WRAPPED)),
    st.sampled_from(["<YES/>", "< yes/>", "<s_>", "</s_>", "\n", " ", "txt", "a b"]),
    st.text(alphabet="abc <>/_.", max_size=8),
)
_soups = st.lists(_frag, min_size=1, max_size=12).map("".join)


@settings(max_examples=400, deadline=None)
@given(_soups)
def test_zero_divergence_on_adversarial_soup(soup):
    keys = [m.group(1) for m in re.finditer(r"<s_(.*?)>", soup, re.IGNORECASE)]
    if not all(_compilable_end_tag(k) for k in keys):
        return  # reference would crash; covered separately
    assert token2json(soup, categorical_tokens=_VOCAB) == _reference_token2json(soup)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x2FF), max_size=50))
def test_zero_divergence_on_arbitrary_text(soup):
    keys = [m.group(1) for m in re.finditer(r"<s_(.*?)>", soup, re.IGNORECASE)]
    if not all(_compilable_end_tag(k) for k in keys):
        return
    assert token2json(soup, categorical_tokens=_VOCAB) == _reference_token2json(soup)


def test_metachar_key_quirk_is_reference_exact():
    """`<s_a.>x</s_ab>`: the unescaped end search treats `a.` as regex,
    so `</s_ab>` closes the pair — in the reference and here alike."""
    soup = "<s_a.>x</s_ab>"
    expect = _reference_token2json(soup)
    assert expect == {"a.": "x"}
    assert token2json(soup) == expect


def test_newline_content_quirk_is_reference_exact():
    """No DOTALL on the content search (model.py:1039): a newline inside
    the value kills the match, the key is dropped, scanning continues."""
    soup = "<s_k>a\nb</s_k><s_j>ok</s_j>"
    expect = _reference_token2json(soup)
    assert expect == {"j": "ok"}
    assert token2json(soup) == expect


def test_invalid_regex_key_survives():
    """A key like `(` makes the reference's end-tag pattern fail to
    compile — the reference CRASHES (re.error); the deliberate deviation:
    we degrade to literal matching and still parse."""
    import pytest

    soup = "<s_(>v</s_(>"
    with pytest.raises(re.error):
        _reference_token2json(soup)
    assert token2json(soup) == {"(": "v"}


def test_nullable_key_terminates():
    """A key whose unescaped end pattern matches the empty string (here
    'aB||y' — empty alternation branch) makes the reference LIVELOCK:
    the zero-width end match yields tokens[0 + 0:] forever. The
    deliberate deviation: we treat the zero-width match as unmatched,
    drop the start tag, and keep scanning — the call must terminate and
    still parse the rest (found by fuzzing; a scoring job must not spin
    on one malformed sequence)."""
    soup = "txttxt <s_aB||y>a b\ntxt<sep/></s_><s_><yes/></s_cxa>"
    out = token2json(soup, categorical_tokens=_VOCAB)  # must return
    assert isinstance(out, dict)
    # and in a clean tail-parse context the remainder still parses
    out2 = token2json("<s_a||b>x</s_a||b><s_k>v</s_k>")
    assert out2.get("k") == "v"


def test_categorical_collision_roundtrip():
    """A raw leaf that happens to EQUAL a wrapped categorical token is
    unwrapped on the way back (ambiguity inherited from the reference —
    `<yes/>` in text is indistinguishable from a wrapped 'yes')."""
    tree = {"a": "yes", "b": ["no", "plain"], "c": "<yes/>"}
    seq = json2token(tree, categorical_tokens=_VOCAB)
    back = token2json(seq, categorical_tokens=_VOCAB)
    assert back == _reference_token2json(seq)
    assert back["a"] == "yes" and back["c"] == "yes"  # collision collapses


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcxyz_", min_size=1, max_size=6),
        st.one_of(
            st.sampled_from(sorted(_VOCAB)),
            st.text(alphabet="abc 0", min_size=1, max_size=8).map(str.strip).filter(bool),
            st.lists(
                st.text(alphabet="abc0", min_size=1, max_size=5),
                min_size=1,
                max_size=3,
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_categorical_roundtrip_property(tree):
    """Round-trip with the categorical vocabulary enabled: linearize →
    both parsers agree AND the parse round-trips under normalization."""
    seq = json2token(tree, categorical_tokens=_VOCAB)
    assert token2json(seq, categorical_tokens=_VOCAB) == _reference_token2json(seq)
    assert roundtrip_ok(json.dumps(tree))