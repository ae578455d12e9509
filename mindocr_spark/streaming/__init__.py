"""streaming — incremental (re-)crawl ingestion via Structured Streaming.

The reference's executor is a bounded producer/consumer stream with a
sentinel terminator (reference:
deploy/py_infer/src/parallel/parallel_pipeline.py:29-37,109-123); its
Spark re-expression is `availableNow` triggered Structured Streaming:
process everything new since the last checkpoint, then stop.
"""

from mindocr_spark.streaming.incremental import (
    incremental_curate_stream,
    incremental_extract,
)

__all__ = ["incremental_curate_stream", "incremental_extract"]
