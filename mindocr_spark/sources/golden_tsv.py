"""golden_tsv — the reference's canonical result-sink format as a Spark sink.

The reference writes one line per document: ``img_name \\t
json([{transcription, points}])`` (reference:
tools/infer/text/predict_system.py:131-152, save_det_res
tools/infer/text/predict_det.py:210-230) and its golden evaluation reads
that format back (reference: deploy/eval_utils/eval_pipeline.py:10-16).
Here: ``url \\t json({text, spans})`` — written/read distributed via the
csv source (tab separator), never through the driver."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

_SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("block_id", T.IntegerType()),
            T.StructField("node_start", T.IntegerType()),
            T.StructField("node_end", T.IntegerType()),
            T.StructField("char_start", T.LongType()),
            T.StructField("char_end", T.LongType()),
            T.StructField("src_start", T.LongType()),
            T.StructField("src_end", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
)

_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("spans", _SPAN_SCHEMA),
    ]
)


def write_golden_tsv(result: DataFrame, path: str) -> None:
    """extraction result → ``url \\t json({text, spans})`` lines."""
    (
        result.select(
            F.col("url"),
            F.to_json(
                F.struct(
                    F.col("extracted_text").alias("text"), F.col("spans")
                )
            ).alias("payload"),
        )
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("quote", "")  # disable quoting; payload JSON has no tabs
        .csv(path)
    )


def read_golden_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Read the golden TSV back into (url, extracted_text, spans) — the
    reference's label-file parse (``DetDataset._parse_annotation``,
    reference: mindocr/data/det_dataset.py:112-158) re-expressed as
    csv scan + ``from_json``."""
    raw = (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .schema("url string, payload string")
        .csv(path)
    )
    parsed = raw.select(
        "url", F.from_json("payload", _PAYLOAD_SCHEMA).alias("p")
    )
    return parsed.select(
        "url",
        F.col("p.text").alias("extracted_text"),
        F.col("p.spans").alias("spans"),
    )
