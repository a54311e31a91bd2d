"""Tests for the tabular kernels (T12/T15/T16/T18) and the split/sink
helpers (U3/S6/S7)."""

import json

from donut_spark.core.htmlnorm import repair_table_html, table_stats
from donut_spark.core.metrics import teds
from donut_spark.core.tabular import (
    ptn_to_compact_html,
    swap_cells,
    synth_table_html,
    tokenize_sequence,
)

PTN_STRUCTURE = [
    "<thead>", "<tr>", "<td>", "</td>", "<td", ' colspan="2"', ">", "</td>",
    "</tr>", "</thead>", "<tbody>", "<tr>", "<td>", "</td>", "<td>", "</td>",
    "<td", ' rowspan="3"', ">", "</td>", "</tr>", "</tbody>",
]
PTN_CELLS = [
    {"tokens": ["<b>", "H1", "</b>"]},
    {"tokens": ["H", "2"]},
    {"tokens": ["a"]},
    {"tokens": []},
    {"tokens": ["c"]},
]


def _cells():
    return [c["tokens"] for c in PTN_CELLS]


def test_ptn_conversion_drops_structure_and_merges_spans():
    tags, texts, max_rs, max_cs = ptn_to_compact_html(PTN_STRUCTURE, _cells())
    # thead/tbody and close tags dropped; <td + attr + > merged
    assert tags == ["<tr>", "<td>", "H1", '<td colspan="2">', "H2",
                    "<tr>", "<td>", "a", "<td>", '<td rowspan="3">', "c"]
    assert texts == ["H1", "H2", "a", "c"]
    assert (max_rs, max_cs) == (3, 2)


def test_ptn_use_thead_keeps_head_blocks():
    tags, _, _, _ = ptn_to_compact_html(PTN_STRUCTURE, _cells(), use_thead=True)
    assert "<thead>" in tags and "<tbody>" in tags


def test_ptn_roundtrips_through_grammar_repair():
    tags, _, _, _ = ptn_to_compact_html(PTN_STRUCTURE, _cells())
    compact = "".join(tags)
    html = repair_table_html(compact)
    stats = table_stats(html)
    assert stats["nums_row"] == 2
    assert stats["max_col_span"] == 2
    assert teds(html, html) == 1.0


def test_synth_table_deterministic_and_valid():
    words = "alpha beta gamma delta epsilon zeta".split()
    a = synth_table_html(7, 4, 3, words, thead_rows=1)
    b = synth_table_html(7, 4, 3, words, thead_rows=1)
    assert a == b
    c = synth_table_html(8, 4, 3, words, thead_rows=1)
    assert c != a
    stats = table_stats(a)
    assert stats["nums_row"] == 4
    assert teds(a, a) == 1.0


def test_synth_table_spans_respect_occupancy():
    words = ["w"]
    for seed in range(20):
        html = synth_table_html(seed, 5, 4, words, with_spans=True)
        stats = table_stats(html)
        # spans never exceed grid bounds
        assert stats["max_row_span"] <= 5
        assert stats["max_col_span"] <= 4


def test_tokenize_sequence():
    seq = "<s_menu><s_nm>iced coffee</s_nm><sep/></s_menu>"
    toks = tokenize_sequence(seq)
    assert toks == ["<s_menu>", "<s_nm>", "iced", "coffee", "</s_nm>", "<sep/>", "</s_menu>"]


def test_swap_cells():
    html = "<table><tbody><tr><td>a</td><td>b</td></tr></tbody></table>"
    out = swap_cells(html, 0, 1)
    assert "<td>b</td><td>a</td>" in out
    assert swap_cells(html, 0, 5) is None
    bold = swap_cells(html, 0, 1, bold=True)
    assert "<b>b</b>" in bold and "<b>a</b>" in bold


def test_deterministic_split(spark):
    from donut_spark.sources.catalog import deterministic_split

    df = spark.range(1000).selectExpr("cast(id as string) as doc_id")
    train, val, test = deterministic_split(df, [0.8, 0.1, 0.1])
    n = [train.count(), val.count(), test.count()]
    assert sum(n) == 1000
    assert 700 < n[0] < 900
    # stability across invocations
    train2, _, _ = deterministic_split(df, [0.8, 0.1, 0.1])
    assert train2.exceptAll(train).count() == 0


def test_jsonl_sinks(spark, tmp_path):
    from donut_spark.sources.catalog import write_jsonl, write_metadata_jsonl

    df = spark.createDataFrame(
        [("d1", '{"k": "v"}'), ("d2", '{"k": "w"}')], ["doc_id", "gt_parse"]
    )
    p1 = str(tmp_path / "results")
    write_jsonl(df, p1)
    lines = [json.loads(r.value) for r in spark.read.text(p1).collect()]
    assert {l["doc_id"] for l in lines} == {"d1", "d2"}

    p2 = str(tmp_path / "metadata")
    write_metadata_jsonl(df, p2)
    rows = [json.loads(r.value) for r in spark.read.text(p2).collect()]
    row = next(r for r in rows if r["file_name"] == "d1")
    # ground_truth is double-encoded: a JSON string holding gt_parse
    inner = json.loads(row["ground_truth"])
    assert inner == {"gt_parse": {"k": "v"}}


def test_read_documents_any_formats(spark, tmp_path):
    """JSONL and CSV document dumps round-trip through the dispatching
    reader with text content intact (embedded quotes/newlines in CSV)."""
    from donut_spark.sources.catalog import read_documents_any, write_jsonl

    rows = [
        (1, 'plain text'),
        (2, 'quoted "text" here'),
        (3, 'multi\nline text'),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    jl = str(tmp_path / "docs.jsonl")
    write_jsonl(df, jl)
    back = read_documents_any(spark, jl)
    assert {(r.doc_id, r.text) for r in back.collect()} == set(rows)

    cs = str(tmp_path / "docs.csv")
    df.coalesce(1).write.option("header", "true").option("escape", '"').csv(cs)
    back = read_documents_any(spark, cs + "/*.csv")
    assert {(int(r.doc_id), r.text) for r in back.collect()} == set(rows)

    pq = str(tmp_path / "docs.parquet")
    df.write.parquet(pq)
    back = read_documents_any(spark, pq)
    assert {(r.doc_id, r.text) for r in back.collect()} == set(rows)
