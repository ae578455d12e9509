"""Real PDF writer/parser round trip + the bytes→blocks Spark stage.

The writer and parser are independent code paths (struct-pack vs
xref-walk + tokenizer); these tests prove exact inversion on adversarial
content, not just happy-path strings.
"""

import pytest

from mindocr_spark.pdf import (
    LEADING,
    PAGE_H,
    WRAP,
    build_pdf,
    parse_pdf,
)


ADVERSARIAL = [
    "plain short text here for one line",
    "with (parens) and \\backslashes\\ and )stray( closers " * 4,
    "operators inside text: ET BT Tj Tm T* 1 0 0 1 50 700 Tm endstream " * 3,
    "unicode 中文內容 混排 and ümlauts €uro signs " * 5,
    "tabs\tand\rcarriage returns embedded " * 6,
    # structural keywords in content must not truncate/hijack the walk
    "see endobj for details and 4 0 obj references " * 4,
    "trailer says /Root 4 0 R then startxref 99 xref 0 8 stream " * 4,
]


def _expected_doc(text):
    q = len(text) // 4
    return "\n\n".join(
        [text[:q], text[q:2 * q], text[2 * q:3 * q], text[3 * q:]]
    )


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_pdf_roundtrip_exact(text):
    blocks = parse_pdf(build_pdf(text, "Report 1"))
    paras = [b for b in blocks if b["kind"] == "para"]
    # drop contained watermark, order newspaper-style
    def contained(a, b):
        return (a["page"] == b["page"] and a["x0"] >= b["x0"]
                and a["y0"] >= b["y0"] and a["x1"] <= b["x1"]
                and a["y1"] <= b["y1"]
                and (a["x1"] - a["x0"]) * (a["y1"] - a["y0"])
                < (b["x1"] - b["x0"]) * (b["y1"] - b["y0"]))
    kept = [a for a in paras if not any(contained(a, b) for b in paras)]
    kept.sort(key=lambda b: (b["page"], b["x0"] >= 306.0, b["y0"], b["x0"]))
    assert "\n\n".join(b["text"] for b in kept) == _expected_doc(text)


def test_pdf_structure_and_kinds():
    text = "x" * 200  # q = 50 > WRAP → watermark planted
    blocks = parse_pdf(build_pdf(text, "Report 9"))
    kinds = [(b["page"], b["kind"]) for b in blocks]
    assert kinds.count((1, "header")) == 1 and kinds.count((2, "header")) == 1
    assert kinds.count((1, "footer")) == 1 and kinds.count((2, "footer")) == 1
    assert kinds.count((1, "para")) == 3          # 2 body + watermark
    assert kinds.count((2, "para")) == 2
    # the watermark is geometrically inside body column 0
    wm = [b for b in blocks if b["text"] == "·"][0]
    body = [b for b in blocks if b["page"] == 1 and b["kind"] == "para"
            and b["x0"] == 36.0][0]
    assert (wm["x0"] >= body["x0"] and wm["y0"] >= body["y0"]
            and wm["x1"] <= body["x1"] and wm["y1"] <= body["y1"])
    # geometry derives from the pinned metrics
    assert body["y1"] == 50.0 + LEADING * -(-50 // WRAP)


def test_pdf_no_watermark_for_short_docs():
    text = "tiny"  # q = 1 → single-line chunks, no watermark
    blocks = parse_pdf(build_pdf(text, "Report 2"))
    assert not any(b["text"] == "·" for b in blocks)
    assert len([b for b in blocks if b["kind"] == "para"]) == 4


def test_pdf_rejects_non_pdf():
    with pytest.raises(ValueError):
        parse_pdf(b"<html>not a pdf</html>")
    with pytest.raises(ValueError):
        parse_pdf(b"%PDF-1.4\ngarbage without xref")


def test_pdf_xref_offsets_are_real():
    """The parser must consume the xref table (not scan for 'N 0 obj'):
    corrupting one xref offset breaks the walk."""
    pdf = bytearray(build_pdf("some body text for the xref test", "Report 3"))
    x = pdf.rfind(b"\nxref\n") + 1  # rfind(b"xref") would hit 'startxref'
    # entries start after 'xref\n0 8\n' + the free entry; redirect the
    # catalog (object 1) to the font object's offset — a parser ignoring
    # the xref would still find the real catalog, a real xref consumer
    # lands on a dict without /Pages
    head_end = pdf.index(b"\n", pdf.index(b"\n", x) + 1) + 1
    entry1, entry7 = head_end + 20 * 1, head_end + 20 * 7
    pdf[entry1:entry1 + 10] = pdf[entry7:entry7 + 10]
    with pytest.raises(Exception):
        parse_pdf(bytes(pdf))


def test_pdf_fused_equals_relational(spark):
    """The fused single-stage assembly must equal the relational
    suppress_contained → reading_order → assemble_document pipeline on
    identical parsed blocks (same NMS and ordering semantics)."""
    from mindocr_spark.operators.layout import assemble_document
    from mindocr_spark.pdf import pdf_blocks, pdf_extract_fused, build_pdf

    texts = {i: ADVERSARIAL[i % len(ADVERSARIAL)] + f" twin {i}"
             for i in range(10)}
    df = spark.createDataFrame(
        [(i, build_pdf(t, f"Report {i}")) for i, t in texts.items()],
        "doc_id bigint, pdf binary",
    )
    rel = {r["doc_id"]: (r["doc_text"], r["n_blocks"]) for r in
           assemble_document(pdf_blocks(df)).collect()}
    fused = {r["doc_id"]: (r["doc_text"], r["n_blocks"]) for r in
             pdf_extract_fused(df).collect()}
    assert rel == fused
    # failure path: junk payload flows through flagged, not crashing
    junk = spark.createDataFrame([(99, b"not a pdf")], "doc_id bigint, pdf binary")
    row = pdf_extract_fused(junk).collect()[0]
    assert row["failed"] and row["doc_text"] == "" and row["n_blocks"] == 0


def test_pdf_blocks_spark_stage(spark):
    """Distributed parse matches the driver-side parse, and the full
    layout pipeline assembles the exact document text."""
    from pyspark.sql import functions as F
    from mindocr_spark.operators.layout import assemble_document
    from mindocr_spark.pdf import pdf_blocks

    texts = {i: ADVERSARIAL[i % len(ADVERSARIAL)] + f" doc {i}"
             for i in range(8)}
    rows = [(i, build_pdf(t, f"Report {i}")) for i, t in texts.items()]
    df = spark.createDataFrame(rows, "doc_id bigint, pdf binary")
    out = {r["doc_id"]: r for r in
           assemble_document(pdf_blocks(df)).collect()}
    for i, t in texts.items():
        assert out[i]["doc_text"] == _expected_doc(t)
        assert out[i]["n_blocks"] == 4
