"""Tabular-document kernels: PubTabNet conversion, deterministic table
synthesis, token-sequence splitting, cell augmentation.

Semantics pinned to the reference:

* :func:`ptn_to_compact_html` — the PubTabNet token-stream → simplified
  table HTML converter (`script/convert_ptn_to_donut.py:22-68`, T12):
  structure tokens are walked with thead/tbody and close tags dropped
  per flags, ``<td`` merged with its span-attribute and ``>`` tokens,
  max row/col spans tracked, and tag-stripped cell texts interleaved
  after each ``<td``.
* :func:`synth_table_html` — the synthetic table structure generator
  (`thirdparty/synthtable/components/table/synth_table.py:999-1076`,
  T16): row-major emission with an occupancy matrix for rowspan/colspan
  sampling, optional thead block, deterministic via an explicit seed.
* :func:`tokenize_sequence` — the deterministic analogue of the trained
  tokenizer's special-token vocabulary (`train_tokenizer.py:38-64`,
  `donut/model.py:311-317`, T18): a token string splits into special
  tokens (``<...>``) and text pieces.
* :func:`swap_cells` — content augmentation swapping two ``td`` texts
  (`synth_table.py:1078-1121`, T15), optional bold wrap.
"""

from __future__ import annotations

import random
import re
from typing import List, Optional, Sequence, Tuple

from .htmlnorm import remove_html_tags
from .minidom import parse_html

__all__ = [
    "ptn_to_compact_html",
    "synth_table_html",
    "tokenize_sequence",
    "swap_cells",
]

_SPECIAL_TOKEN_RE = re.compile(r"(<[^<>]*>)")


def ptn_to_compact_html(
    structure_tokens: Sequence[str],
    cell_texts: Sequence[Sequence[str]],
    use_thead: bool = False,
    use_close_tag: bool = False,
) -> Tuple[List[str], List[str], int, int]:
    """PubTabNet annotation → compact table token list.

    ``structure_tokens`` is the PTN ``html.structure.tokens`` stream;
    ``cell_texts`` the per-cell token lists (``html.cells[i].tokens``).
    Returns (tags, texts, max_row_span, max_col_span) where ``tags`` is
    the compact token list with cell texts interleaved (the string form
    the compact grammar repair T4 accepts back).
    """
    tags: List[str] = []
    max_col_span = 0
    max_row_span = 0
    i = 0
    n = len(structure_tokens)
    while i < n:
        tok = structure_tokens[i].strip()
        i += 1
        if use_thead:
            if tok.startswith("</t") and not use_close_tag:
                continue
        else:
            if tok in ("<thead>", "</thead>", "<tbody>", "</tbody>") or (
                tok.startswith("</t") and not use_close_tag
            ):
                continue
        if tok == "<td":
            attr_tok = structure_tokens[i]
            parts = attr_tok.strip().split('"')
            span_n = int(parts[1])
            if "col" in parts[0]:
                max_col_span = max(max_col_span, span_n)
            else:
                max_row_span = max(max_row_span, span_n)
            tok = (tok + attr_tok + structure_tokens[i + 1]).strip()
            i += 2
        tags.append(tok)

    out: List[str] = []
    texts: List[str] = []
    cell_idx = 0
    for tag in tags:
        out.append(tag)
        if tag.startswith("<td"):
            text = remove_html_tags("".join(cell_texts[cell_idx])).strip()
            if text:
                out.append(text)
                texts.append(text)
            cell_idx += 1
    return out, texts, max_row_span, max_col_span


def synth_table_html(
    seed: int,
    nums_row: int,
    nums_col: int,
    words: Sequence[str],
    with_spans: bool = True,
    thead_rows: int = 0,
    empty_cell_prob: float = 0.1,
) -> str:
    """Deterministic synthetic table HTML (T16, occupancy-matrix spans).

    Row-major emission: cells already covered by an earlier row/col span
    are skipped; span extents are sampled within the free rectangle, the
    head block never spans into the body.
    """
    rng = random.Random(seed)
    occupied = [[False] * nums_col for _ in range(nums_row)]
    thead_rows = min(thead_rows, max(nums_row - 1, 0))

    tags = ["<table>"]
    for row in range(nums_row):
        if thead_rows:
            if row == 0:
                tags.append("<thead>")
            elif row == thead_rows:
                tags.append("<tbody>")
            is_head = row < thead_rows
        else:
            if row == 0:
                tags.append("<tbody>")
            is_head = False
        tags.append("<tr>")
        for col in range(nums_col):
            if occupied[row][col]:
                continue
            attrs = ""
            row_span = col_span = 1
            if with_spans:
                limit = thead_rows if is_head else nums_row
                max_rs = limit - row
                for k in range(1, max_rs):
                    if occupied[row + k][col]:
                        max_rs = k
                        break
                if max_rs > 1 and rng.random() < 0.25:
                    row_span = rng.randint(2, max_rs)
                    attrs += f' rowspan="{row_span}"'
                max_cs = nums_col - col
                for k in range(1, max_cs):
                    if occupied[row][col + k]:
                        max_cs = k
                        break
                if max_cs > 1 and rng.random() < 0.25:
                    col_span = rng.randint(2, max_cs)
                    attrs += f' colspan="{col_span}"'
                for r in range(row, row + row_span):
                    for c in range(col, col + col_span):
                        occupied[r][c] = True
            tags.append(f"<td{attrs}>")
            if rng.random() >= empty_cell_prob:
                k = rng.randint(1, 3)
                start = rng.randrange(len(words))
                tags.append(
                    " ".join(words[(start + j) % len(words)] for j in range(k))
                )
            tags.append("</td>")
        tags.append("</tr>")
        if thead_rows and row + 1 == thead_rows:
            tags.append("</thead>")
        if row == nums_row - 1:
            tags.append("</tbody>")
    tags.append("</table>")
    return "".join(tags)


def tokenize_sequence(seq: str) -> List[str]:
    """Split a linearized token string into special tokens + text pieces.

    Deterministic stand-in for the reference's trained tokenizer
    vocabulary: every ``<...>`` run is one token, text between runs is
    whitespace-split."""
    out: List[str] = []
    for piece in _SPECIAL_TOKEN_RE.split(seq):
        if not piece:
            continue
        if piece.startswith("<") and piece.endswith(">"):
            out.append(piece)
        else:
            out.extend(piece.split())
    return out


def swap_cells(
    html: str, first: int, second: int, bold: bool = False
) -> Optional[str]:
    """Swap the text content of the ``first``-th and ``second``-th td
    (document order); optionally bold both. Returns None when either
    index is out of range (reference retries with a new sample)."""
    root = parse_html(html)
    tds = root.find_all("td")
    if first >= len(tds) or second >= len(tds) or first == second:
        return None
    a, b = tds[first], tds[second]
    ta, tb = a.text, b.text
    if bold:
        ta, tb = f"<b>{ta}</b>", f"<b>{tb}</b>"
        a.set_string("")
        b.set_string("")
        a.children = parse_html(tb).children
        b.children = parse_html(ta).children
    else:
        a.set_string(tb)
        b.set_string(ta)
    return root.to_html()
