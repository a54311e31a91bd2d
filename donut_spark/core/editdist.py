"""Edit distances: Levenshtein (string/sequence) and Zhang-Shasha tree
edit distance.

The reference delegates these to third-party libs (``nltk.edit_distance``
at `lightning_module.py:142`, ``zss.distance`` at `donut/util.py:371-404`,
``apted`` at `teds.py:200`). Those libs aren't available here, so both are
implemented from scratch from the published algorithms:

* Levenshtein — classic two-row DP.
* Tree edit distance — K. Zhang & D. Shasha, "Simple fast algorithms for
  the editing distance between trees and related problems", SIAM
  J. Comput. 18(6), 1989. Supports per-node insert/remove costs and a
  pairwise update cost, which is exactly the parameterization both ``zss``
  and ``apted``'s Config expose, so the reference's nTED and TEDS cost
  models plug in unchanged.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

__all__ = ["levenshtein", "Node", "tree_edit_distance"]


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Unit-cost Levenshtein distance between two sequences (str or list)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    if la < lb:  # keep the inner row short
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ai == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]


class Node:
    """Ordered labeled tree node for tree edit distance.

    ``label`` may be any hashable/comparable payload — the cost callables
    receive the whole node, so richer payloads (e.g. TEDS table cells)
    attach extra attributes.
    """

    __slots__ = ("label", "children", "colspan", "rowspan", "content")

    def __init__(self, label, children=None, colspan=None, rowspan=None, content=None):
        self.label = label
        self.children: List[Node] = children if children is not None else []
        self.colspan = colspan
        self.rowspan = rowspan
        self.content = content

    def add(self, child: "Node") -> "Node":
        self.children.append(child)
        return self

    def size(self) -> int:
        n, stack = 0, [self]
        while stack:
            node = stack.pop()
            n += 1
            stack.extend(node.children)
        return n

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Node({self.label!r}, {len(self.children)} kids)"


def _postorder(root: Node):
    """Iterative postorder traversal.

    Returns (nodes, lmld) where nodes[i] is the i-th node in postorder and
    lmld[i] is the postorder index of its leftmost leaf descendant.
    """
    nodes: List[Node] = []
    lmld: List[int] = []
    # (node, child_cursor, first_leaf_idx_placeholder)
    stack = [(root, 0, -1)]
    while stack:
        node, cursor, first_leaf = stack[-1]
        if cursor < len(node.children):
            stack[-1] = (node, cursor + 1, first_leaf)
            stack.append((node.children[cursor], 0, -1))
        else:
            stack.pop()
            idx = len(nodes)
            nodes.append(node)
            if node.children:
                my_lmld = first_leaf
            else:
                my_lmld = idx
            lmld.append(my_lmld)
            if stack and stack[-1][2] == -1:
                parent, pcursor, _ = stack[-1]
                stack[-1] = (parent, pcursor, my_lmld)
    return nodes, lmld


def _keyroots(lmld: List[int]) -> List[int]:
    """Keyroots: nodes with no proper ancestor sharing their lmld —
    equivalently the last (highest-postorder) node per distinct lmld."""
    seen = {}
    for i, l in enumerate(lmld):
        seen[l] = i
    return sorted(seen.values())


def tree_edit_distance(
    t1: Node,
    t2: Node,
    insert_cost: Callable[[Node], float],
    remove_cost: Callable[[Node], float],
    update_cost: Callable[[Node, Node], float],
) -> float:
    """Zhang-Shasha ordered tree edit distance with custom costs.

    ``remove_cost`` applies to nodes of ``t1``, ``insert_cost`` to nodes of
    ``t2`` (the direction `zss.distance(A, B)` uses).
    """
    an, al = _postorder(t1)
    bn, bl = _postorder(t2)
    m, n = len(an), len(bn)
    akr, bkr = _keyroots(al), _keyroots(bl)

    treedist = [[0.0] * n for _ in range(m)]

    for i in akr:
        for j in bkr:
            _compute_treedist(i, j, an, al, bn, bl, insert_cost, remove_cost, update_cost, treedist)

    return treedist[m - 1][n - 1]


def _compute_treedist(i, j, an, al, bn, bl, ins, rem, upd, treedist):
    """Fill treedist[x][y] for the subtree pair rooted at (i, j)."""
    ioff = al[i] - 1  # offset so forest indices start at 1
    joff = bl[j] - 1
    isz = i - al[i] + 2  # forest rows: 0..(i - lmld(i) + 1)
    jsz = j - bl[j] + 2

    fd = [[0.0] * jsz for _ in range(isz)]
    for x in range(1, isz):
        fd[x][0] = fd[x - 1][0] + rem(an[x + ioff])
    for y in range(1, jsz):
        fd[0][y] = fd[0][y - 1] + ins(bn[y + joff])

    for x in range(1, isz):
        node_a = an[x + ioff]
        for y in range(1, jsz):
            node_b = bn[y + joff]
            if al[i] == al[x + ioff] and bl[j] == bl[y + joff]:
                # both prefixes are whole trees
                fd[x][y] = min(
                    fd[x - 1][y] + rem(node_a),
                    fd[x][y - 1] + ins(node_b),
                    fd[x - 1][y - 1] + upd(node_a, node_b),
                )
                treedist[x + ioff][y + joff] = fd[x][y]
            else:
                p = al[x + ioff] - 1 - ioff
                q = bl[y + joff] - 1 - joff
                fd[x][y] = min(
                    fd[x - 1][y] + rem(node_a),
                    fd[x][y - 1] + ins(node_b),
                    fd[p][q] + treedist[x + ioff][y + joff],
                )
