"""Deployment-shape test: the engine must actually ship via
``spark-submit --py-files dist/donut_spark.zip`` (north-rule run mode).

The subprocess runs with cwd OUTSIDE the repo and a scrubbed PYTHONPATH,
so ``import donut_spark`` can only be satisfied by the zip artifact —
this catches packaging regressions (missing module, non-zip-safe code).
"""

import json
import os
import subprocess
import sys

import pyspark
from pyspark.sql import functions as F

from donut_spark.sources.fixtures import build_spans_table
from tests.conftest import SF_SMALL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    # stage a small spans input with the session we already have
    src = str(tmp_path / "spans_in")
    build_spans_table(spark, SF_SMALL, limit=30).write.parquet(src)

    # build the shipping artifact
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "package.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("donut_spark.zip") and os.path.exists(zip_path)

    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    out_dir = str(tmp_path / "extract_out")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "submit", "run_extract.py"),
            "--input", src,
            "--output", out_dir,
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "extracted 30 documents" in proc.stdout
    # leak audit: the evaluated persist was released after consumption
    assert "residual cached rdds: 0" in proc.stdout, proc.stdout[-2000:]

    data = spark.read.parquet(f"{out_dir}/data")
    assert data.count() == 30
    agg = data.agg(
        F.avg("exact_match").alias("em"), F.avg("roundtrip_ok").alias("rt")
    ).first()
    assert agg.em == 1.0 and agg.rt == 1.0
    lineage = spark.read.parquet(f"{out_dir}/lineage")
    assert lineage.agg(F.sum("n_docs")).first()[0] == 30


def test_spark_submit_pdf_modality(spark, tmp_path):
    """--modality pdf deployment shape: native PDF bytes in, extracted
    span arrays + quarantined poison out, through the shipped zip."""
    from donut_spark.core.pdf import encode_pdf
    from donut_spark.operators.pdfparse import (
        PDF_TABLE_SCHEMA,
        synth_pdf_table,
    )

    spans = build_spans_table(spark, SF_SMALL, limit=20)
    poison = spark.createDataFrame(
        [("poison_doc", bytes(b"%PDF-1.4 no xref here"))],
        schema=PDF_TABLE_SCHEMA,
    )
    src = str(tmp_path / "pdf_in")
    synth_pdf_table(spark, spans).union(poison).write.parquet(src)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "package.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    out_dir = str(tmp_path / "pdf_out")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "submit", "run_extract.py"),
            "--input", src,
            "--output", out_dir,
            "--modality", "pdf",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "extracted 20 documents" in proc.stdout
    assert "residual cached rdds: 0" in proc.stdout, proc.stdout[-2000:]

    data = spark.read.parquet(f"{out_dir}/data")
    assert data.count() == 20
    # span sequences survive the round trip exactly
    joined = data.join(spans.select("doc_id", "expected"), "doc_id")
    assert joined.filter(F.col("extracted") == F.col("expected")).count() == 20
    bad = spark.read.parquet(f"{out_dir}/quarantine")
    assert [r["doc_id"] for r in bad.select("doc_id").collect()] == [
        "poison_doc"
    ]
    assert "startxref" in bad.first()["_error"]


def test_spark_submit_dedup_pipeline(spark, tmp_path):
    """The composed dedup job ships the same way: exact → LSH → verify →
    components → keepers, via spark-submit --py-files with a scrubbed
    PYTHONPATH. Planted exact dups AND near-dups must both be removed."""
    base = (
        "the quick brown fox jumps over the lazy dog while the river "
        "flows quietly past the old mill and the miller watches the "
        "water wheel turn through the long afternoon hours"
    )
    rows = [("d1", base), ("d2", base)]                       # exact dup
    rows += [("d3", base.replace("lazy", "sleepy"))]          # near dup
    rows += [(f"u{i}", f"unique document number {i} about topic {i*7} "
              f"with entirely distinct content tokens {i*13} {i*17} {i*19}")
             for i in range(8)]
    # two SURVIVORS sharing a 10-token boilerplate prefix but with long
    # distinct tails: Jaccard stays far below threshold (both are kept),
    # so only the passage audit can flag the shared run
    boiler = "copyright two thousand example industries incorporated every single right reserved"
    rows += [("p1", boiler + " " + " ".join(f"alpha{i} tale{i}" for i in range(15))),
             ("p2", boiler + " " + " ".join(f"beta{i} story{i}" for i in range(15)))]
    src = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "package.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    out_dir = str(tmp_path / "dedup_out")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "submit", "run_dedup.py"),
            "--input", src,
            "--output", out_dir,
            "--threshold", "0.5",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # cache hygiene: every stage released its persisted/checkpointed
    # blocks (banded LSH frame, CC localCheckpoints) — a long-lived
    # session running this job repeatedly must stay flat
    assert "residual cached rdds: 0" in proc.stdout, proc.stdout[-2000:]

    deduped = {r.doc_id for r in spark.read.parquet(f"{out_dir}/deduped").collect()}
    # d2 removed as exact dup of d1; d3 removed as near-dup (keeper d1)
    assert "d1" in deduped and "d2" not in deduped and "d3" not in deduped
    assert all(f"u{i}" in deduped for i in range(8))
    # the boilerplate-sharing pair is NOT a near-dup — both survive
    assert "p1" in deduped and "p2" in deduped
    exact = spark.read.parquet(f"{out_dir}/exact_dups").collect()
    assert len(exact) == 1 and exact[0].n_dups == 2
    pairs = spark.read.parquet(f"{out_dir}/pairs").collect()
    assert {(p.a, p.b) for p in pairs} == {("d1", "d3")}
    # ...but the survivor passage audit flags their shared 10-token run
    passages = spark.read.parquet(f"{out_dir}/passages").collect()
    assert {
        (p.doc_id, p.start_tok, p.end_tok, p.n_tokens) for p in passages
    } == {("p1", 0, 9, 10), ("p2", 0, 9, 10)}


def test_spark_submit_index_build(spark, tmp_path):
    """Index build ships via spark-submit too; the persisted layouts are
    probe-able and equal the online operators."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "package.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    out_dir = str(tmp_path / "index_out")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "submit", "run_index.py"),
            "--input", f"{SF_SMALL}/embeddings.parquet",
            "--output", out_dir,
            "--n-centroids", "8",
            "--kind", "all",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    from donut_spark.operators.ann_index import (
        probe_ivf_index,
        probe_ivfadc_index,
        probe_pq_index,
        probe_srp_index,
    )
    from donut_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = [1.0 if i == 0 else 0.0 for i in range(64)]
    got = probe_srp_index(spark, f"{out_dir}/srp", emb, q, k=10).collect()
    assert len(got) == 10
    ivf_full = probe_ivf_index(spark, f"{out_dir}/ivf", q, k=10, n_probe=8).collect()
    brute = cosine_topk(emb, q, k=10).collect()
    assert [r.vec_id for r in ivf_full] == [r.vec_id for r in brute]
    adc_full = probe_ivfadc_index(
        spark, f"{out_dir}/ivfadc", emb, q, k=10, n_probe=8, rerank=500
    ).collect()
    assert [r.vec_id for r in adc_full] == [r.vec_id for r in brute]
    # plain PQ layout: rerank window of the whole table == brute force
    pq_full = probe_pq_index(
        spark, f"{out_dir}/pq", emb, q, k=10, rerank=500
    ).collect()
    assert [r.vec_id for r in pq_full] == [r.vec_id for r in brute]
    # leak audit: builders strand no persisted/checkpointed blocks
    assert "residual cached rdds: 0" in proc.stdout, proc.stdout[-2000:]


def test_spark_submit_contamination_sweep(spark, tmp_path):
    """The contamination sweep ships via spark-submit --py-files too:
    planted verbatim excerpts are flagged (n_hits counts occurrences),
    clean docs are not, and --quarantine writes the release-ready table
    with every flagged doc removed."""
    leak = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliett kilo lima mike"
    )  # 13 words == the default n, so the doc must contain it verbatim
    corpus_rows = [
        ("c1", f"prefix text {leak} suffix text"),              # leaked
        ("c2", "totally unrelated corpus document with plenty of words "
               "that overlap nothing in the benchmark at all here"),
        ("c3", f"{leak} and then later once more {leak} end"),  # 2x quote
    ]
    bench_rows = [("b1", leak), ("b2", "another held out benchmark row")]
    src_c = str(tmp_path / "corpus_in")
    src_b = str(tmp_path / "bench_in")
    spark.createDataFrame(corpus_rows, ["doc_id", "text"]).write.parquet(src_c)
    spark.createDataFrame(bench_rows, ["doc_id", "text"]).write.parquet(src_b)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "package.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    out_dir = str(tmp_path / "contam_out")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "submit", "run_contamination.py"),
            "--corpus", src_c,
            "--benchmark", src_b,
            "--output", out_dir,
            "--quarantine",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    flagged = {
        r.doc_id: (r.n_hits, r.n_distinct_hits)
        for r in spark.read.parquet(f"{out_dir}/flagged").collect()
    }
    assert set(flagged) == {"c1", "c3"}
    assert flagged["c3"][0] == 2 * flagged["c3"][1] > 0  # occurrences
    clean = {r.doc_id for r in spark.read.parquet(f"{out_dir}/clean").collect()}
    assert clean == {"c2"}
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["corpus_docs"] == 3 and summary["flagged_docs"] == 2
    assert summary["clean_docs"] == 1
    assert summary["residual_cached_rdds"] == 0  # leak audit


def test_spark_submit_curate_pipeline(spark, tmp_path):
    """The composed curation job (PII redact → C4 clean → Gopher
    quality + repetition gates) ships via spark-submit with a scrubbed
    PYTHONPATH; each planted doc is kept or rejected by exactly the
    intended gate, and rejected rows carry every per-rule flag."""
    lines = [
        "The quick brown fox jumps over that lazy dog with style and grace today.",
        "Meanwhile the river flows quietly past an old mill near the village square.",
        "Every miller watches his water wheel turn through the long afternoon hours.",
        "Some travelers have stopped to rest beside the shaded path for a while.",
        "They will be of good cheer once the warm supper has finally arrived.",
    ]
    good = "\n".join(lines)
    rows = [
        ("good", good),
        ("pii", good.replace("today.", "today, email alice@example.com.")),
        ("shorty", "Too short to keep around."),
        ("loopy", " ".join(["spam ham"] * 40) + ". " + good),
        ("bracey", good + "\nA snippet { leaked } into the page here today."),
    ]
    src = str(tmp_path / "curate_in")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "package.py")],
        capture_output=True, text=True, check=True,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    spark_submit = os.path.join(
        os.path.dirname(pyspark.__file__), "bin", "spark-submit"
    )
    out_dir = str(tmp_path / "curate_out")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            os.path.join(REPO, "submit", "run_curate.py"),
            "--input", src,
            "--output", out_dir,
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert '"kept": 2' in proc.stdout, proc.stdout[-2000:]

    clean = {r.doc_id: r for r in spark.read.parquet(f"{out_dir}/clean").collect()}
    rej = {r.doc_id: r for r in spark.read.parquet(f"{out_dir}/rejected").collect()}
    assert set(clean) == {"good", "pii"} and set(rej) == {
        "shorty", "loopy", "bracey",
    }
    # the PII doc survives WITH its email redacted
    assert "<EMAIL>" in clean["pii"].text and clean["pii"].n_pii == 1
    assert "alice@example.com" not in clean["pii"].text
    # each rejection is attributed to its gate, rule-by-rule
    assert not rej["bracey"].c4_keep and rej["bracey"].gopher_pass
    assert not rej["loopy"].repetition_pass and rej["loopy"].c4_keep
    assert not rej["shorty"].ok_words
