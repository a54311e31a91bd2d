"""PDF layout parsing as a distributed operator (north-rule modality).

The north rule lists "PDF/layout parse" beside HTML boilerplate strip
and DOM heuristics as a main-content-extraction modality. The reference
repo has no PDF path (it consumes pre-rendered page images,
`donut/util.py:113`); this operator is the engine's native-document
twin: a table of ``(doc_id, content binary)`` PDFs is parsed by the
from-scratch subset codec in ``core/pdf.py`` into the SAME interleaved
span sequence ``(kind, text, media_ref, order)`` the rest of the
pipeline consumes — reading order recovered from device-space layout
(page, top-to-bottom line, left-to-right x), NOT stream emission order.

Scale shape: the parse is a ``mapInPandas`` Arrow kernel over the
binary column — map-only, zero shuffle, embarrassingly parallel; the
poison-row contract (any unsupported construct → a single ``error``
span row, never a dead stage) is the same one the PNG/JPEG/VP8 codecs
follow. The synth writer is deterministic in ``doc_id`` alone, so the
q55 oracle recomputes every page/coordinate/text value from the spans
fixture with closed-form SQL arithmetic — no PDF code on the SQL side.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "PDF_TABLE_SCHEMA",
    "PDF_SPANS_SCHEMA",
    "layout_slot",
    "doc_layout_pages",
    "synth_pdf_table",
    "extract_pdf_spans",
    "pdf_extract_documents",
    "pdf_documents_from_table",
]

PDF_TABLE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("content", BinaryType()),
    ]
)

PDF_SPANS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("seq", IntegerType()),
        StructField("page", IntegerType()),
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("size", DoubleType()),
    ]
)

# layout constants shared by the writer, the tests and the q55 oracle:
# slot i of a document's expected-span sequence lands in a two-column
# grid, K = 3 + num % 4 grid rows per page (num = int(doc_id)):
#   row = i // 2, col = i % 2
#   page = row // K,  y = 720 - 36 * (row % K),  x = 72 + 240 * col
#   size = 10 + i % 5 for text, 0 for media
_Y0, _DY, _X0, _DX = 720, 36, 72, 240


def _k_for(num: int) -> int:
    return 3 + num % 4


def layout_slot(num: int, i: int) -> Tuple[int, float, float]:
    """slot index → (page, x, y) for doc ``num`` (closed form)."""
    row, col = divmod(i, 2)
    k = _k_for(num)
    return row // k, float(_X0 + _DX * col), float(_Y0 - _DY * (row % k))


def doc_layout_pages(num: int, expected: List[tuple]) -> list:
    """A document's expected spans → per-page positioned span lists in
    the writer's input shape (core.pdf Span tuples, reading order)."""
    k = _k_for(num)
    n_slots = len(expected)
    n_rows = (n_slots + 1) // 2
    n_pages = max(1, (n_rows + k - 1) // k)
    pages: List[list] = [[] for _ in range(n_pages)]
    for i, sp in enumerate(expected):
        if isinstance(sp, dict):  # Arrow struct → dict under mapInPandas
            kind, text, media_ref = sp["kind"], sp["text"], sp["media_ref"]
        else:
            kind, text, media_ref = sp[0], sp[1], sp[2]
        page, x, y = layout_slot(num, i)
        if kind == "media":
            pages[page].append(("media", x, y, 0.0, media_ref))
        else:
            pages[page].append(("text", x, y, float(10 + i % 5), text))
    return pages


def synth_pdf_table(spark: SparkSession, spans_df: DataFrame) -> DataFrame:
    """Deterministic PDF table: one real PDF per document.

    Every document's *expected* interleaved span sequence (reading
    order ground truth) is laid out on the closed-form grid above and
    written by ``core/pdf.py``'s writer. Encoding variants rotate by
    ``num % 4`` (Tm/Td positioning, TJ kern splits, hex strings, a
    two-stream /Contents array), ``num % 7`` picks the content-stream
    filter chain (raw / FlateDecode / LZWDecode / RunLengthDecode /
    [ASCII85+Flate] / [ASCII85+RunLength] / [ASCIIHex+LZW]),
    ``num % 3 == 2`` docs get the PDF 1.5 file shape
    (object stream + Predictor-12 xref stream) instead of the classic
    1.4 table, ``num % 5 == 3`` docs swap the Type1 font for a
    Type0/Identity-H font with a /ToUnicode CMap (show strings become
    2-byte glyph codes only the CMap can decode), and ``num % 11 == 7``
    docs take the LEGACY text path instead — a simple font whose
    /Encoding /Differences array remaps every used byte code through
    uniXXXX glyph names (falling back deterministically when a doc's
    alphabet exceeds one byte), and ``num % 13`` ∈ {10, 11, 12} docs
    are ROTATED pages (/Rotate 90/180/270 with landscape /MediaBox,
    hoisted onto the /Pages node for odd seeds) whose content is
    pre-rotated in user space — reading order only comes out right
    through the display-space transform — every cross-reference,
    filter, text-encoding and page-geometry shape real generators emit
    flows through the same parse, and decoy BI…ID…EI inline images are
    sprinkled between operators. ``num % 17`` ∈ {4, 8, 12} docs are
    ENCRYPTED under the standard security handler with an empty user
    password (RC4-40 / RC4-128 / AES-128 crypt filters — the shapes
    legacy generators emit) and ``num % 53 == 17`` docs take the
    modern AES-256 / R6 shape (rarer in the rotation because its
    spec-mandated key derivation is deliberately expensive; the
    per-process memo in core/pdfcrypt.py amortizes it) — a parser
    that quarantines every /Encrypt document loses those rows and
    FAILS the oracle. Emission order inside each page
    is seed-shuffled so a parser that trusts stream order FAILS the
    oracle. Deterministic in doc_id alone — stable across partition
    layouts and cluster sizes.
    """
    src = spans_df.select("doc_id", "expected")

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..core.pdf import encode_pdf

        for pdf in batches:
            rows = []
            for doc_id, expected in zip(pdf["doc_id"], pdf["expected"]):
                num = int(doc_id)
                pages = doc_layout_pages(num, list(expected))
                kw = dict(
                    seed=num * 7919 + 13,
                    variant=num % 4,
                    rotate={10: 90, 11: 180, 12: 270}.get(num % 13, 0),
                    xref_stream=(num % 3 == 2),
                    cid_font=(num % 5 == 3),
                    stream_filter=(
                        None,
                        "flate",
                        "lzw",
                        "rl",
                        "a85flate",
                        "a85rl",
                        "ahxlzw",
                    )[num % 7],
                    encrypt=(
                        "aes256"
                        if num % 53 == 17
                        else {4: "rc4-40", 8: "rc4-128", 12: "aesv2"}.get(
                            num % 17
                        )
                    ),
                )
                if num % 11 == 7 and not kw["cid_font"]:
                    kw["simple_encoding"] = "differences"
                try:
                    content = encode_pdf(pages, **kw)
                except ValueError:
                    # >255 distinct chars: deterministic fallback to
                    # the text-string path for this doc
                    kw.pop("simple_encoding", None)
                    content = encode_pdf(pages, **kw)
                rows.append((doc_id, content))
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    return src.mapInPandas(gen, schema=PDF_TABLE_SCHEMA)


def extract_pdf_spans(pdf_df: DataFrame) -> DataFrame:
    """(doc_id, content) → interleaved spans in READING order.

    ``seq`` is the document-global reading-order index (page-major).
    Poison rows (encrypted, unsupported filter, truncated, malformed
    syntax or cross-reference) become a single ``kind='error'`` row carrying the
    reason in ``text`` — the stage never dies on one bad document; the
    caller routes those to quarantine exactly like the media codecs'
    contract (SURVEY §2.1 S11).
    """

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..core.pdf import parse_pdf_spans

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    pages = parse_pdf_spans(bytes(content))
                except ValueError as e:
                    rows.append(
                        (doc_id, -1, -1, "error", str(e), None, 0.0, 0.0, 0.0)
                    )
                    continue
                seq = 0
                for pg, spans in enumerate(pages):
                    for kind, x, y, size, payload in spans:
                        if kind == "media":
                            rows.append(
                                (doc_id, seq, pg, kind, None, payload, x, y, size)
                            )
                        else:
                            rows.append(
                                (doc_id, seq, pg, kind, payload, None, x, y, size)
                            )
                        seq += 1
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "seq",
                    "page",
                    "kind",
                    "text",
                    "media_ref",
                    "x",
                    "y",
                    "size",
                ],
            )

    return pdf_df.mapInPandas(parse, schema=PDF_SPANS_SCHEMA)


def pdf_extract_documents(
    spark: SparkSession, spans_df: DataFrame
) -> DataFrame:
    """Full PDF-modality round trip in the flagship's input shape.

    spans fixture → real PDF bytes → layout parse → per-document
    ``extracted`` arrays (kind, text, media_ref, offset — offsets dense
    in reading order, empty strings where the fixture uses them), joined
    back onto the input columns. The result is exactly what
    ``operators.extract.evaluate_extraction`` consumes, so the flagship
    metrics — span-sequence exact match, token round-trip, nTED — run
    UNCHANGED over the PDF path; a layout bug surfaces as
    ``exact_match = 0``, not a schema error.

    Scale shape: two map-only Arrow kernels, one per-doc aggregation,
    one equi-join back on ``doc_id`` — the join is doc_id↔doc_id on
    co-partitioned shuffle output, no broadcast needed and no skew
    (every PDF's span list is the document's own size).
    """
    parsed = extract_pdf_spans(synth_pdf_table(spark, spans_df))
    docs = _reassemble_documents(parsed)
    return spans_df.join(docs, "doc_id", "left")


def _reassemble_documents(parsed: DataFrame) -> DataFrame:
    """Parsed span rows → one row per doc with the ``extracted`` array
    in the fixture's exact span shape (dense reading-order offsets,
    empty strings where the fixture uses them)."""
    return (
        parsed.filter(F.col("kind") != "error")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("seq", "kind", "text", "media_ref")
                    )
                ),
                lambda s: F.struct(
                    s.kind.alias("kind"),
                    F.coalesce(s.text, F.lit("")).alias("text"),
                    F.coalesce(s.media_ref, F.lit("")).alias("media_ref"),
                    s.seq.alias("offset"),
                ),
            ).alias("extracted")
        )
    )


PDF_DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "extracted",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
        StructField("_error", StringType()),
    ]
)


def pdf_documents_from_table(pdf_df: DataFrame) -> DataFrame:
    """Production-input twin of :func:`pdf_extract_documents`: a table
    of REAL PDFs ``(doc_id, content binary [, passthrough cols])`` →
    one row per document with the extracted interleaved span array and
    an ``_error`` column (null = parsed; non-null = the poison reason)
    — exactly ``plans.lineage.quarantine_split``'s input shape, so
    ``submit/run_extract.py --modality pdf`` routes bad documents to
    quarantine/ and never dies on one (S11). Passthrough columns (e.g.
    the resume path's ``_bucket``) ride the doc_id join; the PDF bytes
    are dropped from the output.

    Scale/plan shape (round-6): ONE map-only Arrow kernel parses each
    document exactly once and emits the finished per-doc row — a PDF's
    spans already live in its own input row, so reading order is
    reassembled inside the kernel instead of through a
    collect_list/array_sort aggregation. The old shape branched the
    span-level parse into a reassembly agg AND an error-row filter,
    which re-evaluated the Python parse per branch (two MapInPandas
    nodes, every byte parsed twice) and paid a doc_id exchange for the
    agg; this one parses once with zero shuffles (plans/r06/
    pdf_parse_{before,after}.txt: 2 MapInPandas + 1 Exchange → 1
    MapInPandas + 0 Exchange).
    """

    def parse_docs(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..core.pdf import parse_pdf_spans

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    pages = parse_pdf_spans(bytes(content))
                except ValueError as e:
                    rows.append((doc_id, None, str(e)))
                    continue
                spans = []
                seq = 0
                for spanlist in pages:
                    for kind, _x, _y, _size, payload in spanlist:
                        if kind == "media":
                            spans.append(
                                {
                                    "kind": kind,
                                    "text": "",
                                    "media_ref": payload or "",
                                    "offset": seq,
                                }
                            )
                        else:
                            spans.append(
                                {
                                    "kind": kind,
                                    "text": payload or "",
                                    "media_ref": "",
                                    "offset": seq,
                                }
                            )
                        seq += 1
                rows.append((doc_id, spans, None))
            yield pd.DataFrame(rows, columns=["doc_id", "extracted", "_error"])

    parsed = pdf_df.select("doc_id", "content").mapInPandas(
        parse_docs, schema=PDF_DOCS_SCHEMA
    )
    extra = [c for c in pdf_df.columns if c not in ("doc_id", "content")]
    if not extra:
        return parsed
    return pdf_df.drop("content").join(parsed, "doc_id", "left")
