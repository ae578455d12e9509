"""sources — table readers/writers for the extraction engine.

The reference supports four source formats (folder+TSV, LMDB, SynthText
.mat, unlabeled folder — reference: mindocr/data/det_dataset.py:112-158,
mindocr/data/rec_lmdb_dataset.py:13-196, mindocr/data/predict_dataset.py:14-60)
and one canonical result sink (the ``img \\t json([...])`` TSV,
reference: tools/infer/text/predict_system.py:131-152). Here everything is
a DataFrame scan/write; the TSV golden contract survives as the
golden-fixture format.
"""

from mindocr_spark.sources.pages import (
    PAGES_TEMPLATE_ANCHOR,
    pages_from_documents,
    read_pages,
    write_pages_partitioned,
)
from mindocr_spark.sources.golden_tsv import read_golden_tsv, write_golden_tsv
from mindocr_spark.sources.lineage import (
    committed_partition_keys,
    resume_filter,
)

__all__ = [
    "PAGES_TEMPLATE_ANCHOR",
    "pages_from_documents",
    "read_pages",
    "write_pages_partitioned",
    "read_golden_tsv",
    "write_golden_tsv",
    "committed_partition_keys",
    "resume_filter",
]
