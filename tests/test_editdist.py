"""Levenshtein + Zhang-Shasha TED tests, including a brute-force
cross-check of the tree edit distance on random small trees."""

import random

from donut_spark.core.editdist import Node, levenshtein, tree_edit_distance


def test_levenshtein_basics():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2


def test_levenshtein_lists():
    assert levenshtein(list("abc"), list("adc")) == 1
    assert levenshtein(["<b>", "x"], ["x"]) == 1


# -- brute force reference implementation (exponential, tiny trees only) --


def _brute(f1, f2, ins, rem, upd):
    if not f1 and not f2:
        return 0.0
    if not f1:
        t = f2[-1]
        return _brute(f1, f2[:-1] + tuple(t.children), ins, rem, upd) + ins(t)
    if not f2:
        t = f1[-1]
        return _brute(f1[:-1] + tuple(t.children), f2, ins, rem, upd) + rem(t)
    r1, r2 = f1[-1], f2[-1]
    return min(
        _brute(f1[:-1] + tuple(r1.children), f2, ins, rem, upd) + rem(r1),
        _brute(f1, f2[:-1] + tuple(r2.children), ins, rem, upd) + ins(r2),
        _brute(f1[:-1], f2[:-1], ins, rem, upd)
        + _brute(tuple(r1.children), tuple(r2.children), ins, rem, upd)
        + upd(r1, r2),
    )


def _random_tree(rng, max_nodes):
    root = Node(rng.choice("abcd"))
    nodes = [root]
    for _ in range(rng.randint(0, max_nodes - 1)):
        parent = rng.choice(nodes)
        child = Node(rng.choice("abcd"))
        parent.add(child)
        nodes.append(child)
    return root


def _unit(_):
    return 1.0


def _upd(a, b):
    return 0.0 if a.label == b.label else 1.0


def test_ted_identical():
    t = Node("a", [Node("b"), Node("c", [Node("d")])])
    assert tree_edit_distance(t, t, _unit, _unit, _upd) == 0


def test_ted_single_rename():
    t1 = Node("a", [Node("b")])
    t2 = Node("a", [Node("x")])
    assert tree_edit_distance(t1, t2, _unit, _unit, _upd) == 1


def test_ted_insert_leaf():
    t1 = Node("a", [Node("b")])
    t2 = Node("a", [Node("b"), Node("c")])
    assert tree_edit_distance(t1, t2, _unit, _unit, _upd) == 1


def test_ted_vs_bruteforce_random():
    rng = random.Random(1234)
    for _ in range(60):
        t1 = _random_tree(rng, 6)
        t2 = _random_tree(rng, 6)
        fast = tree_edit_distance(t1, t2, _unit, _unit, _upd)
        slow = _brute((t1,), (t2,), _unit, _unit, _upd)
        assert fast == slow, f"mismatch: fast={fast} slow={slow}"


def test_ted_vs_bruteforce_weighted_costs():
    # nTED-style asymmetric costs: label length as indel cost
    def indel(n):
        return float(len(n.label))

    def upd(a, b):
        return float(levenshtein(a.label, b.label))

    rng = random.Random(99)
    for _ in range(40):
        t1 = _random_tree(rng, 5)
        t2 = _random_tree(rng, 5)
        # widen the label alphabet for varied costs
        for t in (t1, t2):
            for n in _collect(t):
                n.label = n.label * rng.randint(1, 3)
        fast = tree_edit_distance(t1, t2, indel, indel, upd)
        slow = _brute((t1,), (t2,), indel, indel, upd)
        assert fast == slow, f"mismatch: fast={fast} slow={slow}"


def _collect(root):
    out, stack = [], [root]
    while stack:
        n = stack.pop()
        out.append(n)
        stack.extend(n.children)
    return out
