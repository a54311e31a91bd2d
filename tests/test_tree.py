"""Round-trip and edge-case tests for json2token/token2json/normalize_tree,
pinned to the reference semantics at donut/model.py:989-1070 and
donut/util.py:292-320."""

import json

import pytest

from donut_spark.core.tree import (
    json2token,
    json2token_str,
    normalize_tree,
    roundtrip_ok,
    token2json,
    token2json_str,
)

CORD_TREE = {
    "menu": [
        {"nm": "ICED AMERICANO", "cnt": "2", "price": "4,500"},
        {"nm": "LATTE", "cnt": "1", "price": "5,000"},
    ],
    "total": {"total_price": "14,000", "cashprice": "15,000", "changeprice": "1,000"},
}


def test_json2token_reverse_sorted_keys():
    out = json2token({"a": "1", "b": "2"})
    assert out == "<s_b>2</s_b><s_a>1</s_a>"


def test_json2token_insertion_order_when_unsorted():
    out = json2token({"a": "1", "b": "2"}, sort_keys=False)
    assert out == "<s_a>1</s_a><s_b>2</s_b>"


def test_json2token_text_sequence_passthrough():
    assert json2token({"text_sequence": "hello world"}) == "hello world"


def test_json2token_list_sep():
    assert json2token(["x", "y", "z"]) == "x<sep/>y<sep/>z"


def test_json2token_categorical_wrap():
    out = json2token({"answer": "yes"}, categorical_tokens=frozenset({"yes"}))
    assert out == "<s_answer><yes/></s_answer>"


def test_token2json_categorical_unwrap():
    tree = token2json("<s_answer><yes/></s_answer>", categorical_tokens=frozenset({"yes"}))
    assert tree == {"answer": "yes"}


def test_token2json_simple():
    assert token2json("<s_a>1</s_a>") == {"a": "1"}


def test_token2json_unmatched_start_tag_dropped():
    # model.py:1034-1035: start tags without a close are deleted
    assert token2json("<s_a>1</s_a><s_broken>zzz") == {"a": "1"}


def test_token2json_trailing_text_fallback():
    out = token2json("no tags at all")
    assert out == {"text_sequence": "no tags at all"}


def test_token2json_single_element_list_collapse():
    # a single leaf stays scalar; single <sep/>-free nested dict collapses
    assert token2json("<s_k>v</s_k>") == {"k": "v"}
    assert token2json("<s_k><s_a>1</s_a></s_k>") == {"k": {"a": "1"}}


def test_token2json_sibling_list_via_sep():
    tokens = "<s_menu><s_nm>A</s_nm><sep/><s_nm>B</s_nm></s_menu>"
    assert token2json(tokens) == {"menu": [{"nm": "A"}, {"nm": "B"}]}


def test_token2json_leaf_sep_list():
    assert token2json("<s_k>a<sep/>b<sep/>c</s_k>") == {"k": ["a", "b", "c"]}


def test_roundtrip_cord():
    assert roundtrip_ok(json.dumps(CORD_TREE))


def test_roundtrip_docvqa_style():
    tree = {"question": "what is the date?", "answer": "12/03/1999"}
    assert roundtrip_ok(json.dumps(tree))


def test_roundtrip_text_sequence():
    tree = {"text_sequence": "free form ocr output"}
    back = token2json(json2token(tree))
    assert back == tree


def test_roundtrip_deep_nesting():
    tree = {"a": {"b": {"c": [{"d": "1"}, {"d": "2"}], "e": "x"}}}
    assert roundtrip_ok(json.dumps(tree))


@pytest.mark.parametrize(
    "tree",
    [
        {"k": ""},
        {"k": ["only"]},
        {"menu": [{"nm": "solo"}]},
        {"z": "1", "a": "2", "m": "3"},
    ],
)
def test_roundtrip_edge_trees(tree):
    assert roundtrip_ok(json.dumps(tree))


def test_normalize_sorts_and_wraps():
    out = normalize_tree({"b": "2", "a": "1"})
    assert out == {"a": ["1"], "b": ["2"]}
    assert list(out.keys()) == ["a", "b"]


def test_normalize_drops_empty():
    assert normalize_tree({"a": "", "b": "x"}) == {"b": ["x"]}
    assert normalize_tree({}) == {}
    assert normalize_tree(None) == {}


def test_normalize_sorts_list_of_dicts():
    out = normalize_tree({"m": [{"n": "b"}, {"n": "a"}]})
    assert out == {"m": [{"n": ["a"]}, {"n": ["b"]}]}


def test_normalize_leaf_list_sorted_stringified():
    assert normalize_tree(["b", 3, "a", 2.5]) == ["2.5", "3", "a", "b"]


def test_str_wrappers():
    seq = json2token_str(json.dumps({"a": "1"}))
    assert seq == "<s_a>1</s_a>"
    assert json.loads(token2json_str(seq)) == {"a": "1"}
    # invalid json → passthrough
    assert json2token_str("raw text") == "raw text"


def test_eval_tree_one_matches_chained_primitives():
    """Round-6 optimization pin: the fused single-pass tree evaluation
    (`functions.udfs._eval_tree_one`) must be byte-identical to the
    convenience chain it replaced (json2token_str → token2json_str →
    roundtrip_ok → nted over _parse_or_empty) on valid, invalid, empty
    and adversarial gt strings."""
    from donut_spark.core import metrics, tree
    from donut_spark.functions.udfs import _eval_tree_one, _parse_or_empty

    cases = [
        json.dumps({"menu": [{"nm": "a", "cnt": "1"}, {"nm": "b"}]}),
        json.dumps({"a": {"b": ["1", "2"], "c": ""}, "d": "x"}),
        json.dumps({"text_sequence": "plain words"}),
        json.dumps({"z||y": "regex meta", "k.*": ["v"]}),
        json.dumps({"n": "line\nbreak"}),  # no-DOTALL quirk path
        json.dumps({}),
        json.dumps([1, 2, {"k": "v"}]),
        json.dumps("bare string"),
        json.dumps(0),
        "not json at all",
        "<s_a>1</s_a>",  # token-ish garbage
        "",
        None,
    ]
    for gt in cases:
        seq0 = tree.json2token_str(gt)
        pred0 = tree.token2json_str(seq0)
        ok0 = tree.roundtrip_ok(gt)
        nted0 = metrics.nted_accuracy(_parse_or_empty(pred0), _parse_or_empty(gt))
        seq1, pred1, ok1, nted1 = _eval_tree_one(gt)
        assert seq1 == seq0, gt
        assert pred1 == pred0, gt
        assert bool(ok1) == bool(ok0), gt
        assert nted1 == nted0, gt
