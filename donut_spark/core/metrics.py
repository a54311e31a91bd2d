"""Golden-metric evaluators: nTED accuracy and TEDS.

* :func:`nted_accuracy` — normalized-tree-edit-distance accuracy, pinned
  to ``JSONParseEvaluator`` (`/root/reference/donut/util.py:253-404`):
  ``max(0, 1 - TED(norm(pred), norm(gold)) / TED({}, norm(gold)))`` with
  the reference's cost model (leaf↔leaf = string edit distance,
  leaf↔nonleaf = 1 + len(leaf), nonleaf↔nonleaf = label inequality;
  insert/remove = len(leaf) or 1).

* :func:`teds` — Tree-Edit-Distance-based Similarity for tables, pinned
  to `teds.py:70-220`: parse both HTMLs, build a TableTree where ``td``
  keeps colspan/rowspan + character-tokenized cell content, tree edit
  distance with rename cost = normalized Levenshtein on cell content,
  score ``1 - dist / max(node_count)``; ``structure_only`` ignores cell
  content (TEDS-struct).

The reference computes both with third-party libs (zss / apted); here the
same cost models run on our own Zhang-Shasha implementation
(`donut_spark.core.editdist`).
"""

from __future__ import annotations

from typing import Any, List, Optional

from .editdist import Node, levenshtein, tree_edit_distance
from .minidom import HNode, parse_html
from .tree import normalize_tree

__all__ = [
    "nted_accuracy",
    "nted_accuracy_normalized",
    "teds",
    "teds_struct",
    "build_parse_tree",
]

_LEAF = "<leaf>"


def build_parse_tree(data: Any, node_name: Optional[str] = None) -> Node:
    """Normalized dict/list → labeled tree (`donut/util.py:322-369`):
    ``<root>`` at top, dict keys as labels, list-of-dict items as
    ``<subtree>``, leaves as ``<leaf>VALUE``."""
    node = Node(node_name if node_name is not None else "<root>")
    if isinstance(data, dict):
        for key, value in data.items():
            node.add(build_parse_tree(value, key))
    elif isinstance(data, list):
        if all(isinstance(item, dict) for item in data):
            for item in data:
                node.add(build_parse_tree(item, "<subtree>"))
        else:
            for item in data:
                node.add(Node(f"{_LEAF}{item}"))
    else:
        raise ValueError(f"unexpected node payload: {data!r} ({node_name!r})")
    return node


def _nted_update(n1: Node, n2: Node) -> float:
    """`donut/util.py:260-278`."""
    l1, l2 = n1.label, n2.label
    leaf1, leaf2 = _LEAF in l1, _LEAF in l2
    if leaf1 and leaf2:
        return levenshtein(l1.replace(_LEAF, ""), l2.replace(_LEAF, ""))
    if leaf2 and not leaf1:
        return 1 + len(l2.replace(_LEAF, ""))
    if leaf1 and not leaf2:
        return 1 + len(l1.replace(_LEAF, ""))
    return int(l1 != l2)


def _nted_indel(node: Node) -> float:
    """`donut/util.py:280-290`."""
    if _LEAF in node.label:
        return len(node.label.replace(_LEAF, ""))
    return 1


def _nted_distance(a: Node, b: Node) -> float:
    return tree_edit_distance(a, b, _nted_indel, _nted_indel, _nted_update)


def nted_accuracy(pred: Any, gold: Any) -> float:
    """nTED-based accuracy between two parse trees (dicts/lists)."""
    return nted_accuracy_normalized(normalize_tree(pred), normalize_tree(gold))


def nted_accuracy_normalized(norm_pred: Any, norm_gold: Any) -> float:
    """:func:`nted_accuracy` on ALREADY-normalized trees — the fused
    evaluation kernel computes ``normalize_tree`` once per side and
    shares it between the round-trip compare and the nTED score
    (normalize_tree is ~1/3 of the eval half of the flagship kernel;
    byte-parity with the unfused chain is pinned by
    tests/test_tree.py::test_eval_tree_one_matches_chained_primitives)."""
    if norm_pred == norm_gold:
        # exact fast path: update cost is 0 only for equal labels, so
        # TED(t, t) == 0 and the score is exactly 1 — skip the O(n^2) DP
        # for the (common) perfect-prediction case
        return 1.0
    pred_tree = build_parse_tree(norm_pred)
    gold_tree = build_parse_tree(norm_gold)
    empty_tree = build_parse_tree(normalize_tree({}))
    denom = _nted_distance(empty_tree, gold_tree)
    if denom == 0:
        # gold normalizes to {} and pred differs → score 0
        return 0.0
    return max(0.0, 1.0 - _nted_distance(pred_tree, gold_tree) / denom)


# --------------------------------------------------------------------------
# TEDS (teds.py)
# --------------------------------------------------------------------------


def _tokenize_cell(node: HNode, tokens: List[str], is_root: bool) -> None:
    """Character-tokenize a td subtree (`teds.py:147-158`): open tag,
    chars of text, recurse, close tag (the root td's own open/close tags
    are stripped by the caller, matching ``__tokens__[1:-1]``)."""
    if not is_root:
        tokens.append(f"<{node.tag}>")
    for child in node.children:
        if child.is_text:
            tokens.extend(child.data)
        else:
            _tokenize_cell(child, tokens, False)
    if not is_root:
        tokens.append(f"</{node.tag}>")


def _load_table_tree(node: HNode, structure_only: bool) -> Node:
    """HTML element → TableTree (`teds.py:161-181`)."""
    if node.tag == "td":
        if structure_only:
            cell: List[str] = []
        else:
            cell = []
            _tokenize_cell(node, cell, True)
        return Node(
            "td",
            colspan=int(node.attrs.get("colspan", "1") or "1"),
            rowspan=int(node.attrs.get("rowspan", "1") or "1"),
            content=cell,
        )
    new_node = Node(node.tag)
    for child in node.children:
        if not child.is_text:
            new_node.add(_load_table_tree(child, structure_only))
    return new_node


def _teds_update(n1: Node, n2: Node) -> float:
    """CustomConfig.rename (`teds.py:91-109`)."""
    if (
        n1.label != n2.label
        or n1.colspan != n2.colspan
        or n1.rowspan != n2.rowspan
    ):
        return 1.0
    if n1.label == "td":
        a = n1.content or []
        b = n2.content or []
        if a or b:
            return levenshtein(a, b) / max(len(a), len(b))
    return 0.0


def _unit(_: Node) -> float:
    return 1.0


def _first_element(root: HNode) -> Optional[HNode]:
    for node in root.iter():
        if node is not root and not node.is_text:
            return node
    return None


def teds(pred_html: str, true_html: str, structure_only: bool = False) -> float:
    """TEDS score between two table HTML strings (`teds.py:185-206`).

    Node count = descendant elements of the root element (lxml's
    ``.//*``); empty or unparseable inputs score 0.
    """
    if not pred_html or not true_html:
        return 0.0
    pred_root = _first_element(parse_html(pred_html))
    true_root = _first_element(parse_html(true_html))
    if pred_root is None or true_root is None:
        return 0.0
    n_nodes = max(
        len(pred_root.descendant_elements()),
        len(true_root.descendant_elements()),
    )
    if n_nodes == 0:
        return 0.0
    tree_pred = _load_table_tree(pred_root, structure_only)
    tree_true = _load_table_tree(true_root, structure_only)
    dist = tree_edit_distance(tree_pred, tree_true, _unit, _unit, _teds_update)
    return 1.0 - dist / n_nodes


def teds_struct(pred_html: str, true_html: str) -> float:
    """TEDS-structure (cell content ignored)."""
    return teds(pred_html, true_html, structure_only=True)
