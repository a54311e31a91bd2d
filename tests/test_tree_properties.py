"""Property-based round-trip tests (hypothesis) for the tree kernels —
the reference's implicit contract (`donut/model.py:989-1070`) holds for
arbitrary generated trees, not just the hand-picked fixtures."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from donut_spark.core.metrics import nted_accuracy
from donut_spark.core.tree import json2token, normalize_tree, roundtrip_ok, token2json

# keys: token-safe identifiers (no regex metachars, no '>' '<' '/')
_keys = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
)
# leaf values: printable text without the reserved token syntax
_leaves = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=20,
).map(lambda s: s.strip()).filter(lambda s: s)

# Lists are HOMOGENEOUS (all leaves or all dicts) and never hold lists
# directly — the reference's actual data model (CORD/DocVQA gt_parse).
# Outside it, the reference's own json2token/token2json lose data:
# list-of-list flattens under "<sep/>".join while normalize_dict drops
# non-scalar items, and a scalar trailing a dict inside one list is
# swallowed by the sibling-list recursion (donut/model.py:1044-1067).
_trees = st.recursive(
    _leaves,
    lambda children: st.one_of(
        st.lists(_leaves, min_size=1, max_size=4),
        st.lists(
            st.dictionaries(_keys, children, min_size=1, max_size=4),
            min_size=1,
            max_size=4,
        ),
        st.dictionaries(_keys, children, min_size=1, max_size=4),
    ),
    max_leaves=12,
)
_doc_trees = st.dictionaries(_keys, _trees, min_size=1, max_size=4)


def _no_ancestor_key_repeat(tree, path=frozenset()):
    """The reference's token2json (donut/model.py:1028-1040) finds the
    FIRST matching close tag, so a key nested under the same key (at any
    ancestor depth) mis-parses — in the reference and here alike. The
    round-trip property holds on the complement."""
    if isinstance(tree, dict):
        return all(
            k not in path and _no_ancestor_key_repeat(v, path | {k})
            for k, v in tree.items()
        )
    if isinstance(tree, list):
        return all(_no_ancestor_key_repeat(x, path) for x in tree)
    return True


@settings(max_examples=150, deadline=None)
@given(_doc_trees.filter(_no_ancestor_key_repeat))
def test_roundtrip_property(tree):
    assert roundtrip_ok(json.dumps(tree))


def test_same_key_nesting_quirk_is_reference_exact():
    """Documented parity quirk: a key directly nesting the same key does
    NOT round-trip — token2json pairs the outer open tag with the inner
    close tag (reference-identical, donut/model.py:1028-1040)."""
    tree = {"k": {"k": "0"}}
    seq = json2token(tree)
    assert seq == "<s_k><s_k>0</s_k></s_k>"
    back = token2json(seq)
    assert back == {"k": "<s_k>0"}  # the reference produces exactly this
    assert not roundtrip_ok(json.dumps(tree))


@settings(max_examples=80, deadline=None)
@given(_doc_trees)
def test_nted_self_is_one(tree):
    assert nted_accuracy(tree, tree) == 1.0


@settings(max_examples=80, deadline=None)
@given(_doc_trees)
def test_normalize_stabilizes_after_two_passes(tree):
    # reference quirk (donut/util.py:305): list-of-dicts sort by their
    # PRE-normalized stringified items, so one pass is not idempotent —
    # a scalar that becomes a one-element list can re-order siblings on
    # the next pass. From the second pass on, values are fixed points and
    # the sort key is stable.
    twice = normalize_tree(normalize_tree(tree))
    assert normalize_tree(twice) == twice


def test_normalize_non_idempotence_quirk_is_reference_exact():
    tree = {"k": [{"k": "0"}, {"k": ["0", "0"]}]}
    once = normalize_tree(tree)
    twice = normalize_tree(once)
    # '0' sorts before ['0'] stringified → order flips after wrapping
    assert once == {"k": [{"k": ["0"]}, {"k": ["0", "0"]}]}
    assert twice == {"k": [{"k": ["0", "0"]}, {"k": ["0"]}]}


@settings(max_examples=80, deadline=None)
@given(_doc_trees)
def test_linearization_deterministic(tree):
    assert json2token(tree) == json2token(json.loads(json.dumps(tree)))


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(max_codepoint=0x2FF), max_size=60))
def test_token2json_never_crashes(garbage):
    # arbitrary garbage must parse to *something* (reference behavior:
    # unmatched tags dropped, remainder → text_sequence)
    out = token2json(garbage)
    assert isinstance(out, (dict, list))


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
    ).map(lambda s: s + "</s_x><s_y>")
)
def test_token2json_never_crashes_on_arbitrary_sequences(seq):
    """token2json over arbitrary token soup (unmatched tags, garbage
    text, stray separators) must always return a dict — a malformed
    model output can't take down a 10^12-doc scoring job (the reference
    falls back to {'text_sequence': ...}, donut/model.py:1070)."""
    out = token2json(seq)
    assert isinstance(out, dict)
