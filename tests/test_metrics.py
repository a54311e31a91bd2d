"""Metric self-tests for nTED accuracy and TEDS, pinned to
donut/util.py:371-404 and teds.py:185-206."""

from donut_spark.core.metrics import (
    build_parse_tree,
    nted_accuracy,
    teds,
    teds_struct,
)

CORD = {
    "menu": [
        {"nm": "americano", "cnt": "2", "price": "4500"},
        {"nm": "latte", "cnt": "1", "price": "5000"},
    ],
    "total": {"total_price": "14000"},
}


def test_nted_identity():
    assert nted_accuracy(CORD, CORD) == 1.0


def test_nted_empty_pred_is_zero():
    assert nted_accuracy({}, CORD) == 0.0


def test_nted_partial_between_zero_and_one():
    pred = {
        "menu": [
            {"nm": "americano", "cnt": "2", "price": "4500"},
            {"nm": "mocha", "cnt": "1", "price": "5000"},
        ],
        "total": {"total_price": "14000"},
    }
    score = nted_accuracy(pred, CORD)
    assert 0.0 < score < 1.0


def test_nted_order_insensitive_via_normalize():
    # list-of-dict order and key order are canonicalized before scoring
    pred = {
        "total": {"total_price": "14000"},
        "menu": [
            {"price": "5000", "cnt": "1", "nm": "latte"},
            {"nm": "americano", "cnt": "2", "price": "4500"},
        ],
    }
    assert nted_accuracy(pred, CORD) == 1.0


def test_nted_monotonic_in_damage():
    one_wrong = {
        "menu": [
            {"nm": "americano", "cnt": "2", "price": "4500"},
            {"nm": "latte", "cnt": "1", "price": "9999"},
        ],
        "total": {"total_price": "14000"},
    }
    very_wrong = {"menu": [{"nm": "zzz"}]}
    s1 = nted_accuracy(one_wrong, CORD)
    s2 = nted_accuracy(very_wrong, CORD)
    assert s1 > s2


def test_build_parse_tree_shape():
    tree = build_parse_tree(
        {"menu": [{"name": ["cake"], "count": ["2"]}, {"name": ["juice"]}]}
    )
    assert tree.label == "<root>"
    menu = tree.children[0]
    assert menu.label == "menu"
    assert [c.label for c in menu.children] == ["<subtree>", "<subtree>"]
    assert menu.children[0].children[0].children[0].label == "<leaf>cake"


GT_TABLE = (
    "<table><thead><tr><td>h1</td><td>h2</td></tr></thead>"
    "<tbody><tr><td>a</td><td>b</td></tr></tbody></table>"
)


def test_teds_identity():
    assert teds(GT_TABLE, GT_TABLE) == 1.0
    assert teds_struct(GT_TABLE, GT_TABLE) == 1.0


def test_teds_empty_inputs():
    assert teds("", GT_TABLE) == 0.0
    assert teds(GT_TABLE, "") == 0.0


def test_teds_content_change_partial():
    pred = GT_TABLE.replace("<td>a</td>", "<td>x</td>")
    score = teds(pred, GT_TABLE)
    assert 0.0 < score < 1.0
    # structure untouched → struct score stays perfect
    assert teds_struct(pred, GT_TABLE) == 1.0


def test_teds_structure_change_hits_both():
    pred = "<table><tbody><tr><td>a</td></tr></tbody></table>"
    assert teds(pred, GT_TABLE) < 1.0
    assert teds_struct(pred, GT_TABLE) < 1.0


def test_teds_colspan_matters():
    gt = '<table><tbody><tr><td colspan="2">a</td><td>b</td></tr></tbody></table>'
    pred = "<table><tbody><tr><td>a</td><td>b</td></tr></tbody></table>"
    assert teds_struct(pred, gt) < 1.0


def test_teds_cell_tokenization_keeps_markup():
    # inline <b> inside a cell participates in the content token stream
    gt = "<table><tbody><tr><td><b>a</b></td></tr></tbody></table>"
    pred = "<table><tbody><tr><td>a</td></tr></tbody></table>"
    score = teds(pred, gt)
    assert 0.0 < score < 1.0
