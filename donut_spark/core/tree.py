"""JSON-tree linearization / delinearization.

Semantics pinned to the reference implementation
(`/root/reference/donut/model.py:989-1070`, duplicated at 1280-1366):

* ``json2token`` turns an (ordered) JSON tree into a flat token string:
  - a dict whose only key is ``text_sequence`` passes its value through;
  - every other dict emits ``<s_KEY>`` ... ``</s_KEY>`` per key, keys
    iterated in **reverse-sorted** order when ``sort_keys`` is on
    (model.py:998-999);
  - a list joins its linearized items with ``<sep/>`` (model.py:1011-1013);
  - any other value is stringified; values registered as *categorical*
    tokens are wrapped ``<VALUE/>`` (model.py:1016-1018).

* ``token2json`` is the inverse with the reference's quirks preserved:
  - start tags without a matching end tag are deleted and scanning
    continues (model.py:1034-1035);
  - the end-tag search injects the key into the pattern UNESCAPED
    (model.py:1031 ``fr"</s_{key}>"``), so regex metacharacters in a
    key behave as regex — ``<s_a.>`` closes at ``</s_ab>`` — and the
    quirk is load-bearing for parity on adversarial tag soup. Two
    deviations, both about not dying: (a) a key that makes the pattern
    fail to COMPILE (e.g. an unbalanced paren) crashes the reference
    outright — we fall back to literal matching; (b) a key whose
    pattern is NULLABLE (e.g. ``a||b`` — empty alternative) makes the
    reference livelock (the zero-width end match never advances the
    cursor) — we treat it as unmatched and keep scanning. A 10^12-doc
    scoring job must not die or spin on one malformed sequence (same
    philosophy as the S11 quarantine);
  - the content regex runs WITHOUT DOTALL (model.py:1039), so a
    newline inside a value makes the content search fail and the key
    is dropped while scanning continues — reference-exact;
  - content containing both ``<s_`` and ``</s_`` recurses (non-leaf);
    otherwise it splits on ``<sep/>`` into stripped leaves, unwrapping
    categorical ``<x/>`` leaves (model.py:1047-1063);
  - a single-element list collapses to its element (model.py:1046-1047,
    1060-1061);
  - ``<sep/>`` immediately after a close tag continues a sibling list
    (model.py:1066-1067);
  - if nothing parsed at top level the raw remainder is returned as
    ``{"text_sequence": tokens}`` (model.py:1070).

  These quirks are pinned by tests/test_tree_fuzz.py: adversarial token
  soup is compared against an independent literal transcription of the
  reference control flow — zero divergence tolerated.

* ``normalize_tree`` canonicalizes a parse for comparison, pinned to
  ``JSONParseEvaluator.normalize_dict`` (`donut/util.py:292-320`).

All functions are pure and operate on plain Python objects; the Spark
layer wraps them in Arrow-batched pandas UDFs (`donut_spark.functions`).
"""

from __future__ import annotations

import json
import re
from functools import lru_cache
from typing import Any, FrozenSet, Iterable

__all__ = [
    "json2token",
    "token2json",
    "normalize_tree",
    "canonicalize",
    "json2token_str",
    "token2json_str",
    "roundtrip_ok",
]

_START_TAG_RE = re.compile(r"<s_(.*?)>", re.IGNORECASE)
_SEP = "<sep/>"


@lru_cache(maxsize=4096)
def _end_pattern(key: str) -> "re.Pattern":
    """Compiled end-tag pattern for ``key`` (reference-exact: the key is
    NOT regex-escaped, model.py:1031, so metacharacters act as regex);
    a key that fails to COMPILE degrades to literal matching (documented
    robustness deviation — module docstring). Cached because the same
    handful of keys repeats across every document of a corpus; the
    stdlib re cache would do the same lookup with more overhead and a
    smaller, evictable table."""
    try:
        return re.compile(f"</s_{key}>", re.IGNORECASE)
    except re.error:
        return re.compile(re.escape(f"</s_{key}>"), re.IGNORECASE)


@lru_cache(maxsize=4096)
def _content_pattern(start_tok: str, end_tok: str) -> "re.Pattern":
    """Compiled ``start(.*?)end`` content pattern — reference-exact:
    escaped literals, IGNORECASE, NO DOTALL (model.py:1039)."""
    return re.compile(
        re.escape(start_tok) + "(.*?)" + re.escape(end_tok), re.IGNORECASE
    )


def json2token(
    obj: Any,
    sort_keys: bool = True,
    categorical_tokens: FrozenSet[str] = frozenset(),
) -> str:
    """Linearize a JSON tree into a token string.

    ``categorical_tokens`` holds the *raw* values (e.g. ``"yes"``) that the
    reference registers as special tokens ``<yes/>``; matching leaves are
    wrapped on the way out and unwrapped by :func:`token2json`.
    """
    if isinstance(obj, dict):
        if len(obj) == 1 and "text_sequence" in obj:
            return str(obj["text_sequence"])
        keys: Iterable[str] = (
            sorted(obj.keys(), reverse=True) if sort_keys else obj.keys()
        )
        parts = []
        for k in keys:
            inner = json2token(obj[k], sort_keys, categorical_tokens)
            parts.append(f"<s_{k}>{inner}</s_{k}>")
        return "".join(parts)
    if isinstance(obj, list):
        return _SEP.join(
            json2token(item, sort_keys, categorical_tokens) for item in obj
        )
    text = str(obj)
    if text in categorical_tokens:
        return f"<{text}/>"
    return text


def token2json(
    tokens: str,
    categorical_tokens: FrozenSet[str] = frozenset(),
    _inner: bool = False,
) -> Any:
    """Parse a token string back into a JSON tree (reference-exact)."""
    wrapped = {f"<{t}/>" for t in categorical_tokens}
    return _token2json(tokens, wrapped, _inner)


def _token2json(tokens: str, wrapped_vocab: set, is_inner: bool) -> Any:
    output: dict = {}

    while tokens:
        start_m = _START_TAG_RE.search(tokens)
        if start_m is None:
            break
        key = start_m.group(1)
        start_tok = start_m.group()
        end_m = _end_pattern(key).search(tokens)
        if end_m is None or not end_m.group():
            # Unmatched start tag: drop it and keep scanning. The
            # zero-width case (e.g. key "a||b" — the empty alternative
            # makes the end pattern nullable) LIVELOCKS the reference:
            # tokens[find("") + 0:] never shrinks. Second documented
            # termination deviation (see module docstring) — treat it
            # as unmatched instead of spinning forever.
            tokens = tokens.replace(start_tok, "")
            continue
        end_tok = end_m.group()
        content_m = _content_pattern(start_tok, end_tok).search(tokens)
        if content_m is not None:
            content = content_m.group(1).strip()
            if "<s_" in content and "</s_" in content:  # non-leaf
                value = _token2json(content, wrapped_vocab, True)
                if value:
                    if isinstance(value, list) and len(value) == 1:
                        value = value[0]
                    output[key] = value
            else:  # leaf node(s)
                leaves = []
                for leaf in content.split(_SEP):
                    leaf = leaf.strip()
                    if (
                        leaf in wrapped_vocab
                        and leaf[:1] == "<"
                        and leaf[-2:] == "/>"
                    ):
                        leaf = leaf[1:-2]
                    leaves.append(leaf)
                output[key] = leaves[0] if len(leaves) == 1 else leaves

        tokens = tokens[tokens.find(end_tok) + len(end_tok) :].strip()
        if tokens[:6] == _SEP:  # sibling dict in a list
            sibling = _token2json(tokens[6:], wrapped_vocab, True)
            return [output] + (sibling if isinstance(sibling, list) else [sibling])

    if output:
        return [output] if is_inner else output
    return [] if is_inner else {"text_sequence": tokens}


def normalize_tree(data: Any) -> Any:
    """Canonicalize a parse tree for order-insensitive comparison.

    Pinned to `donut/util.py:292-320`: dict keys sorted ascending, empty
    values dropped, scalar dict-values wrapped in single-element lists,
    lists of dicts sorted by ``str(sorted(items))``, leaf lists reduced to
    sorted lists of non-empty strings, bare scalars to ``[str(x)]``.
    """
    if not data:
        return {}
    if isinstance(data, dict):
        out: dict = {}
        for key, value in sorted(data.items()):
            norm = normalize_tree(value)
            if norm:
                if not isinstance(norm, list):
                    norm = [norm]
                out[key] = norm
        return out
    if isinstance(data, list):
        if all(isinstance(item, dict) for item in data):
            result = []
            for item in sorted(data, key=lambda x: str(sorted(x.items()))):
                norm = normalize_tree(item)
                if norm:
                    result.append(norm)
            return result
        return sorted(
            str(item)
            for item in data
            if type(item) in {str, int, float} and str(item)
        )
    return [str(data)]


# ---- string-in / string-out convenience forms (UDF-friendly) ----


def json2token_str(tree_json: str, sort_keys: bool = True) -> str:
    """json string -> token string; invalid JSON passes through as
    ``text_sequence`` semantics (the raw string)."""
    try:
        tree = json.loads(tree_json)
    except (TypeError, ValueError):
        return tree_json if tree_json is not None else ""
    return json2token(tree, sort_keys=sort_keys)


def token2json_str(tokens: str) -> str:
    """token string -> canonical JSON string (sorted keys for stability)."""
    tree = token2json(tokens if tokens is not None else "")
    return json.dumps(tree, ensure_ascii=False, sort_keys=True)


def canonicalize(tree: Any) -> Any:
    """Fixed-point canonical form: ``normalize_tree`` applied twice.

    One pass is not idempotent in the reference (`donut/util.py:305`
    sorts list-of-dicts by their PRE-normalized stringified items, so
    wrapping a scalar into a list can reorder siblings on the next
    pass); after the second pass values are fixed points and the sort
    key is stable, so this is the canonical representative.
    """
    return normalize_tree(normalize_tree(tree))


def roundtrip_ok(tree_json: str) -> bool:
    """The core invariant: token2json(json2token(t)) ≡ t under the
    canonical (fixed-point normalized) form.

    Matches the reference's implicit contract between `donut/util.py:83-94`
    (linearize at dataset build) and `donut/model.py:855` (delinearize at
    inference), compared after `normalize_dict` canonicalization — taken
    at its fixed point so the comparison doesn't inherit the sort-key
    instability documented in :func:`canonicalize`.
    """
    try:
        tree = json.loads(tree_json)
    except (TypeError, ValueError):
        return False
    back = token2json(json2token(tree))
    return canonicalize(back) == canonicalize(tree)
