"""functions — column-level operators for large-scale text pipelines.

Everything here is built from `pyspark.sql.functions` (JVM-side,
whole-stage-codegen friendly); pandas UDFs appear only where built-ins
genuinely cannot express the semantics (minhash signatures, simhash bit
accumulation) and are always Arrow-batched — no per-row Python anywhere,
per the input_hint.
"""

from mindocr_spark.functions import dedup, similarity, text  # noqa: F401
