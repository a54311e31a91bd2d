"""Dump `.explain(formatted)` of the scale-critical plans to
BENCH/plans.md, with one-line verdicts of what each plan must show.

This is the artifact behind the scale claims: pushdown reached the scan,
UDF stages are single-eval Arrow nodes, LSH joins move ids not vectors,
the flagship is exchange-free.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    import __spark_entry__ as e
    from donut_spark.operators.extract import extract_and_evaluate
    from donut_spark.sources.fixtures import load_spans
    from donut_spark.sources.session import get_spark

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    sections = []

    flag = extract_and_evaluate(load_spans(spark, SF))
    sections.append(
        (
            "flagship extract_and_evaluate (fused)",
            "MUST show: one FileScan, one ArrowEvalPython (fused kernel), "
            "NO Exchange anywhere (map-only; scan splits provide "
            "parallelism).",
            plan_of(flag),
        )
    )

    from donut_spark.operators.extract import extract_documents

    span = extract_documents(load_spans(spark, SF), mode="span")
    sections.append(
        (
            "span-mode extract_documents (skew path)",
            "MUST show: the exploded side reads ONLY doc_id+spans "
            "(slim ReadSchema; the pass-through arrays re-attach via ONE "
            "doc_id join at the top, never riding the agg buffers — no "
            "first() aggregates anywhere); the extraction ArrowEvalPython "
            "sits BELOW an Exchange on (doc_id, _salt) so a 10k-span "
            "document's Python work spreads over its 16 salt buckets "
            "(AQE cannot see Python-time skew — it balances bytes); "
            "two-phase collect_list reassembly reuses that exchange. "
            "Measured on the committed 4x10k-span skew fixture "
            "(.fixtures/spans_skew_sf0.1, local[32]): span-mode beats "
            "doc-mode (BENCH_r05 skew_* rows; r5 session 2.64 s vs "
            "2.99 s) with exact_match_rate 1.0 in BOTH modes.",
            plan_of(span),
        )
    )

    q = e.queries()
    checks = {
        "q01_filter_project": "MUST show PushedFilters on l_shipdate/"
        "l_discount/l_quantity and a pruned ReadSchema (4 columns).",
        "q03_broadcast_join": "MUST show BroadcastHashJoin (customer dim "
        "broadcast), no SortMergeJoin.",
        "q24_minhash_dedup": "MUST show: the banded frame persisted "
        "(InMemoryTableScan / InMemoryRelation on BOTH join sides — the "
        "signature ArrowEvalPython runs once, not once per side), "
        "self-join keyed on (band, band_hash) only.",
        "q42_embedding_neardup": "MUST show: FlatMapCoGroupsInPandas "
        "(one float64 matmul per block pair), both block-pair joins "
        "BroadcastHashJoin, vectors shuffled once per side as "
        "(pid, _id, _v) — no pair-row explosion.",
        "q27_ann_topk": "MUST show TakeOrderedAndProject (per-partition "
        "heap top-k, no global sort).",
        "q50_ann_index_probe": "MUST show PartitionFilters on "
        "(band, bval) at the postings scan (planning-time dir pruning; "
        "no signature recompute anywhere in the plan).",
        "q53_ann_ivfadc": "MUST show PartitionFilters with _cell INSET "
        "at the index scan (this oracle query probes ALL 16 cells by "
        "design — the pruned-probe shape is plan-pinned in "
        "tests/test_dedup_similarity.py), ADC scoring as pure JVM "
        "expressions (zero Python eval nodes in the whole plan), and "
        "the rerank as a semi-join back to the base table by id.",
        "q26_jaccard_verify": "MUST show exactly ONE split(lower(...)) "
        "node per shingle subtree (the word array is projected once "
        "below each Generate; the transform lambda must NOT re-evaluate "
        "the split per shingle index — that would be O(words^2)/doc).",
        "q15_exact_dup_clusters": "MUST show (passage branch): the "
        "duplicated-shingle side joined back on the 8-byte xxhash64 key "
        "(join output <= position rows, no pair explosion), ONE "
        "Exchange on the doc key feeding the run-merge Window, and the "
        "final groupBy(doc, run) REUSING that exchange (HashAggregate "
        "directly above the Window, no second shuffle); exact branch: "
        "partial HashAggregate below its single Exchange.",
        "q23_lang_quality": "MUST show: the Gopher rule columns as pure "
        "JVM expressions (the ONLY Python nodes are the three legacy "
        "textstats UDF columns — exactly one ArrowEvalPython node; the "
        "rule sweep itself adds zero).",
        "q55_pdf_extract": "MUST show: pruned ReadSchema (doc_id + "
        "expected only — spans/gt_parse never read), pushed doc_id "
        "IsNotNull, the two MapInPandas kernels (synth, parse) stacked "
        "map-only with NO Exchange below them, partial ObjectHashAgg "
        "below exactly ONE Exchange on doc_id (the only shuffle, "
        "carrying per-doc partial aggregates).",
    }
    for name, check in checks.items():
        sections.append((name, check, plan_of(q[name](spark, SF))))

    with open("/root/repo/BENCH/plans.md", "w") as fh:
        fh.write(
            "# Physical-plan audit (generated by tools/plan_audit.py at "
            "sf0.01)\n\nEach section states what the plan MUST show for "
            "the 100 TB design point, followed by the actual "
            "`.explain(formatted)` output.\n"
        )
        for title, check, plan in sections:
            fh.write(f"\n## {title}\n\n{check}\n\n```\n{plan}```\n")
    print("wrote BENCH/plans.md")


if __name__ == "__main__":
    main()
