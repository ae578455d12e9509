"""layout — the PDF/layout block path: 2-D geometry → reading order.

The reference's layout capabilities re-expressed relationally:

- overlap suppression (`EASTPostprocess` lanms NMS, reference:
  mindocr/postprocess/det_east_postprocess.py:69-150; `validate_det_res`
  containment clipping, tools/infer/text/predict_det.py:151-207)
  → :func:`suppress_contained` — an anti-join on a geometric
  containment predicate, partitioned per (doc, page): never cross-doc,
  perfectly parallel.
- reading-order sort (`sorted_boxes` top-to-bottom/left-to-right,
  reference: tools/infer/text/utils.py:88-96, and the TODO at
  predict_det.py:205) → :func:`reading_order` — column assignment +
  window row_number over (page, column, y0, x0): newspaper order.
- span assembly (`CollectNode` + result sink, reference:
  deploy/py_infer/src/parallel/module/common/collect_node.py:67-110)
  → :func:`assemble_document` — groupBy(doc) sort_array concat.

The PDF *parse* itself (pdfminer/poppler) is an external codec like the
media decoders — stubbed (:func:`parse_pdf`); the geometry pipeline is
the real, tested scale path. `synth_layout_blocks` builds a
deterministic block table from the documents corpus with pure JVM
expressions so correctness has a SQL oracle.

Block schema: (doc_id, page, x0, y0, x1, y1, kind, text) in PDF points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

#: Page geometry constants of the synthetic layout (US-Letter points).
PAGE_W = 612.0
COL_SPLIT = PAGE_W / 2.0  # column boundary for the 2-column reading rule

#: Block kinds treated as page chrome (the boilerplate analog).
CHROME_KINDS = ("header", "footer", "pageno")


def parse_pdf(payload: bytes) -> list[dict]:
    """bytes → layout blocks. Real pure-python PDF 1.4-subset parser
    (xref walk + content-stream tokenizer) in :mod:`mindocr_spark.pdf`;
    kept here as the codec entry point the block pipeline consumes."""
    from mindocr_spark.pdf import parse_pdf as _parse

    return _parse(payload)


def suppress_contained(blocks: DataFrame) -> DataFrame:
    """Drop blocks geometrically contained in a strictly larger block on
    the same (doc, page) — the NMS/deduplicate-regions analog.

    Plan: self-join on (doc_id, page) with the containment predicate,
    then left-anti back onto the input. The join is key-partitioned;
    quadratic only within one page's blocks (bounded, like the
    reference's per-image NMS)."""
    a, b = blocks.alias("a"), blocks.alias("b")
    area = lambda p: (F.col(f"{p}.x1") - F.col(f"{p}.x0")) * (
        F.col(f"{p}.y1") - F.col(f"{p}.y0")
    )
    contained = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.page") == F.col("b.page"))
            & (F.col("a.x0") >= F.col("b.x0"))
            & (F.col("a.y0") >= F.col("b.y0"))
            & (F.col("a.x1") <= F.col("b.x1"))
            & (F.col("a.y1") <= F.col("b.y1"))
            & (area("a") < area("b")),
        )
        .select("a.doc_id", "a.page", "a.x0", "a.y0", "a.x1", "a.y1")
        .distinct()
    )
    return blocks.join(
        contained, on=["doc_id", "page", "x0", "y0", "x1", "y1"], how="left_anti"
    )


def reading_order(blocks: DataFrame, col_split: float = COL_SPLIT) -> DataFrame:
    """Assign the newspaper reading order: per doc, by (page, column,
    y0, x0) where column = 0 left of `col_split` else 1. Adds `rn`."""
    col = (F.col("x0") >= col_split).cast("int").alias("col_idx")
    # (y1, x1, kind, text) tie-breakers make the order TOTAL: two blocks
    # tied on the geometric keys would otherwise get nondeterministic
    # row_number, breaking byte-determinism of assemble_document
    w = Window.partitionBy("doc_id").orderBy(
        "page", "col_idx", "y0", "x0", "y1", "x1", "kind", "text"
    )
    return blocks.withColumn("col_idx", col).withColumn(
        "rn", F.row_number().over(w)
    )


def assemble_document(blocks: DataFrame, sep: str = "\n\n") -> DataFrame:
    """Chrome-filter → NMS → reading order → per-doc text assembly.
    One shuffle (the groupBy); ordering restored inside the group via
    sort_array over (rn, text) structs — no window re-shuffle."""
    content = suppress_contained(
        blocks.where(~F.col("kind").isin(*CHROME_KINDS))
    )
    ordered = reading_order(content)
    return (
        ordered.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rn"), F.col("text")))
                    ),
                    lambda s: s.getField("text"),
                ),
                sep,
            ).alias("doc_text"),
            F.count("*").alias("n_blocks"),
        )
    )


#: Markdown decoration per block kind — the training-corpus export
#: format (extracted layout → one markdown document). Kinds outside the
#: map (para and anything unknown) pass through undecorated.
MD_PREFIX_KINDS = {"h1": "# ", "h2": "## ", "h3": "### ",
                   "li": "- ", "quote": "> "}


def assemble_markdown(blocks: DataFrame, sep: str = "\n\n") -> DataFrame:
    """Layout blocks → one MARKDOWN document per doc: the same
    chrome-filter → NMS → reading-order → groupBy-assembly chain as
    :func:`assemble_document`, with each block decorated by kind before
    concatenation — headings to ``#``/``##``/``###``, list items to
    ``- ``, quotes to ``> ``, code to fenced blocks, paragraphs plain.
    Markdown is the lingua-franca export for LLM training corpora
    (structure survives as plain text); decoration is one codegen CASE
    on the block relation, so the markdown path costs exactly what the
    plain-text path costs: ONE shuffle (the per-doc groupBy).

    Reference lineage: the reference's result sink serializes assembled
    per-image predictions into its downstream format (reference:
    deploy/py_infer/src/parallel/module/common/collect_node.py:67-110,
    tools/infer/text/predict_system.py:77-109); markdown is that
    serialization re-targeted at corpus export."""
    content = suppress_contained(
        blocks.where(~F.col("kind").isin(*CHROME_KINDS))
    )
    k = F.col("kind")
    md = F.when(
        k == "code", F.concat(F.lit("```\n"), F.col("text"), F.lit("\n```"))
    )
    for kind, prefix in sorted(MD_PREFIX_KINDS.items()):
        md = md.when(k == kind, F.concat(F.lit(prefix), F.col("text")))
    md = md.otherwise(F.col("text"))
    ordered = reading_order(content).withColumn("__md", md)
    return (
        ordered.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rn"), F.col("__md")))
                    ),
                    lambda s: s.getField("__md"),
                ),
                sep,
            ).alias("md_text"),
            F.count("*").alias("n_blocks"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic synthetic layout corpus (pure JVM expressions)
# --------------------------------------------------------------------------


def synth_layout_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → a 2-page, 2-column layout-block table: 4 body chunks
    (quarters of `text`), header/footer chrome per page, and one planted
    contained-duplicate block (exercises NMS). All substring arithmetic
    is integral so the SQL oracle reproduces it exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", F.length("text").alias("L")
    )
    q = (F.col("L") / 4).cast("int")

    def body(page, colx, part):
        # part ∈ 1..4 → substring window; chunks 1,2 page 1; 3,4 page 2
        start = q * (part - 1) + 1
        length = F.when(F.lit(part) == 4, F.col("L") - q * 3).otherwise(q)
        x0 = F.lit(36.0) if colx == 0 else F.lit(318.0)
        x1 = F.lit(294.0) if colx == 0 else F.lit(576.0)
        return F.struct(
            F.lit(page).alias("page"), x0.alias("x0"), F.lit(50.0).alias("y0"),
            x1.alias("x1"), F.lit(760.0).alias("y1"),
            F.lit("para").alias("kind"),
            F.substring("text", start, length).alias("text"),
        )

    def chrome(page, kind, y0, y1, text_col):
        return F.struct(
            F.lit(page).alias("page"), F.lit(36.0).alias("x0"),
            F.lit(float(y0)).alias("y0"), F.lit(576.0).alias("x1"),
            F.lit(float(y1)).alias("y1"), F.lit(kind).alias("kind"),
            text_col.alias("text"),
        )

    dup = F.struct(  # strictly inside page-1 column-0 body → suppressed
        F.lit(1).alias("page"), F.lit(40.0).alias("x0"), F.lit(60.0).alias("y0"),
        F.lit(200.0).alias("x1"), F.lit(200.0).alias("y1"),
        F.lit("para").alias("kind"), F.lit("SHOULD BE SUPPRESSED").alias("text"),
    )
    head_txt = F.concat(F.lit("Report "), F.col("doc_id").cast("string"))
    blocks = F.array(
        chrome(1, "header", 0, 40, head_txt),
        body(1, 0, 1), body(1, 1, 2), dup,
        chrome(1, "footer", 770, 792, F.lit("page 1")),
        chrome(2, "header", 0, 40, head_txt),
        body(2, 0, 3), body(2, 1, 4),
        chrome(2, "footer", 770, 792, F.lit("page 2")),
    )
    return docs.select(
        "doc_id", F.explode(blocks).alias("b")
    ).select(
        "doc_id", "b.page", "b.x0", "b.y0", "b.x1", "b.y1", "b.kind", "b.text"
    )


def synth_rich_layout_blocks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """documents → a single-page RICH block table exercising every
    markdown kind: h1 title, optional h2 (doc_id %3==0), body para,
    two list items, optional code block (%4==1), optional quote
    (%5==2), closing para, plus header/footer chrome the assembler
    must drop. Disjoint y-ranges (no containment — NMS is exercised by
    `synth_layout_blocks`); all substring windows integral so the SQL
    oracle restates every block arithmetically."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", F.length("text").alias("L")
    )
    q = (F.col("L") / 4).cast("int")
    ds = F.col("doc_id").cast("string")

    def blk(y0: float, kind: str, text_col, when=None):
        s = F.struct(
            F.lit(1).alias("page"), F.lit(36.0).alias("x0"),
            F.lit(y0).alias("y0"), F.lit(576.0).alias("x1"),
            F.lit(y0 + 40.0).alias("y1"), F.lit(kind).alias("kind"),
            text_col.alias("text"),
        )
        return s if when is None else F.when(when, s)

    did = F.col("doc_id")
    blocks = F.array(
        blk(0.0, "header", F.concat(F.lit("draft "), ds)),
        blk(50.0, "h1", F.concat(F.lit("Report "), ds)),
        blk(100.0, "h2", F.concat(F.lit("Section "), ds),
            when=F.pmod(did, F.lit(3)) == 0),
        blk(150.0, "para", F.col("text").substr(F.lit(1), q)),
        blk(300.0, "li", F.col("text").substr(q + 1, F.lit(20))),
        blk(340.0, "li", F.col("text").substr(q + 21, F.lit(20))),
        blk(400.0, "code", F.col("text").substr(q * 2 + 1, F.lit(30)),
            when=F.pmod(did, F.lit(4)) == 1),
        blk(500.0, "quote", F.col("text").substr(q * 2 + 31, F.lit(25)),
            when=F.pmod(did, F.lit(5)) == 2),
        blk(600.0, "para", F.col("text").substr(q * 3 + 1, F.col("L") - q * 3)),
        blk(760.0, "footer", F.lit("page 1")),
    )
    return docs.select(
        "doc_id", F.explode(blocks).alias("b")
    ).where(F.col("b").isNotNull()).select(
        "doc_id", "b.page", "b.x0", "b.y0", "b.x1", "b.y1", "b.kind", "b.text"
    )
