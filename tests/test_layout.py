"""Layout block path: NMS suppression, reading order, assembly goldens."""

import pytest


@pytest.fixture(scope="module")
def blocks(spark):
    rows = [
        # doc 1, page 1: header + two columns + a contained duplicate + footer
        (1, 1, 36.0, 0.0, 576.0, 40.0, "header", "HEADER"),
        (1, 1, 36.0, 50.0, 294.0, 760.0, "para", "left column"),
        (1, 1, 40.0, 60.0, 200.0, 200.0, "para", "CONTAINED"),
        (1, 1, 318.0, 50.0, 576.0, 760.0, "para", "right column"),
        (1, 1, 36.0, 770.0, 576.0, 792.0, "footer", "FOOTER"),
        # doc 1, page 2: single block
        (1, 2, 36.0, 50.0, 576.0, 760.0, "para", "second page"),
        # doc 2: out-of-order input (right col listed first)
        (2, 1, 318.0, 50.0, 576.0, 760.0, "para", "B"),
        (2, 1, 36.0, 50.0, 294.0, 760.0, "para", "A"),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id bigint, page int, x0 double, y0 double, x1 double, "
        "y1 double, kind string, text string",
    )


def test_suppress_contained(spark, blocks):
    from mindocr_spark.operators.layout import suppress_contained

    out = suppress_contained(blocks)
    texts = {r["text"] for r in out.collect()}
    assert "CONTAINED" not in texts
    assert {"left column", "right column", "second page"} <= texts
    # chrome untouched by NMS (separate concern)
    assert "HEADER" in texts


def test_reading_order_newspaper(spark, blocks):
    from mindocr_spark.operators.layout import reading_order

    content = blocks.where("kind = 'para' and text != 'CONTAINED'")
    ordered = {
        (r["doc_id"], r["rn"]): r["text"]
        for r in reading_order(content).collect()
    }
    assert ordered[(1, 1)] == "left column"
    assert ordered[(1, 2)] == "right column"
    assert ordered[(1, 3)] == "second page"     # page 2 after page 1
    assert ordered[(2, 1)] == "A"               # input order irrelevant
    assert ordered[(2, 2)] == "B"


def test_assemble_document_golden(spark, blocks):
    from mindocr_spark.operators.layout import assemble_document

    out = {r["doc_id"]: r for r in assemble_document(blocks).collect()}
    assert out[1]["doc_text"] == "left column\n\nright column\n\nsecond page"
    assert out[1]["n_blocks"] == 3              # chrome + contained dropped
    assert out[2]["doc_text"] == "A\n\nB"


def test_parse_pdf_is_real():
    """The codec entry point delegates to the real PDF parser (round
    trip + adversarial coverage in tests/test_pdf.py)."""
    from mindocr_spark.operators.layout import parse_pdf
    from mindocr_spark.pdf import build_pdf

    blocks = parse_pdf(build_pdf("entry point delegation text", "Report 0"))
    assert [b for b in blocks if b["kind"] == "para"]
    with pytest.raises(ValueError):
        parse_pdf(b"%PDF-1.4")  # header alone is not a parsable document


def test_synth_blocks_roundtrip(spark, sf_dir):
    """Assembled synthetic layout equals the source text re-joined from
    its quarters (the generate-then-recover pattern)."""
    from mindocr_spark.operators.layout import assemble_document, synth_layout_blocks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    sub = synth_layout_blocks(spark, sf_dir).join(
        docs.select("doc_id"), "doc_id"
    )
    out = {r["doc_id"]: r["doc_text"] for r in assemble_document(sub).collect()}
    for r in docs.select("doc_id", "text").collect():
        L = len(r["text"])
        q = L // 4
        expect = "\n\n".join(
            [r["text"][:q], r["text"][q:2 * q], r["text"][2 * q:3 * q],
             r["text"][3 * q:]]
        )
        assert out[r["doc_id"]] == expect


def test_assemble_markdown_decorates_by_kind(spark):
    """Each kind gets its markdown form, chrome drops, contained
    blocks suppress, and reading order holds — one golden doc."""
    from mindocr_spark.operators.layout import assemble_markdown

    rows = [
        (1, 1, 36.0, 0.0, 576.0, 40.0, "header", "CHROME"),
        (1, 1, 36.0, 50.0, 576.0, 90.0, "h1", "Title"),
        (1, 1, 36.0, 100.0, 576.0, 140.0, "h2", "Sec"),
        (1, 1, 36.0, 150.0, 576.0, 190.0, "para", "body"),
        (1, 1, 40.0, 155.0, 200.0, 180.0, "para", "CONTAINED"),
        (1, 1, 36.0, 200.0, 576.0, 240.0, "li", "item"),
        (1, 1, 36.0, 250.0, 576.0, 290.0, "code", "x = 1"),
        (1, 1, 36.0, 300.0, 576.0, 340.0, "quote", "said"),
        (1, 1, 36.0, 760.0, 576.0, 792.0, "footer", "CHROME"),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, page int, x0 double, y0 double, x1 double, "
        "y1 double, kind string, text string",
    )
    out = assemble_markdown(df).collect()
    assert len(out) == 1
    assert out[0]["n_blocks"] == 6
    assert out[0]["md_text"] == (
        "# Title\n\n## Sec\n\nbody\n\n- item\n\n```\nx = 1\n```\n\n> said"
    )


def test_assemble_markdown_unknown_kind_passes_through(spark):
    from mindocr_spark.operators.layout import assemble_markdown

    df = spark.createDataFrame(
        [(1, 1, 36.0, 50.0, 576.0, 90.0, "figure-caption", "cap")],
        "doc_id bigint, page int, x0 double, y0 double, x1 double, "
        "y1 double, kind string, text string",
    )
    assert assemble_markdown(df).collect()[0]["md_text"] == "cap"


def test_synth_rich_blocks_kinds_and_optional_arms(spark, sf_dir):
    """Optional arms appear exactly on their doc_id quotas; no NULL
    block rows leak through the conditional array."""
    from pyspark.sql import functions as F
    from mindocr_spark.operators.layout import synth_rich_layout_blocks

    b = synth_rich_layout_blocks(spark, sf_dir)
    counts = {r["kind"]: r["n"] for r in
              b.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    n_docs = b.select("doc_id").distinct().count()
    assert counts["h1"] == n_docs and counts["para"] == 2 * n_docs
    assert counts["li"] == 2 * n_docs
    assert 0 < counts["h2"] < n_docs  # the %3 quota
    assert b.where("text IS NULL OR kind IS NULL").count() == 0
