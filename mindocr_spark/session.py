"""SparkSession factory tuned for the extraction workload.

Local-mode testing uses ``local[N]``; the same config block is what a
cluster ``spark-submit`` would carry (AQE on, Arrow on, sensible batch
size). ``spark.sql.shuffle.partitions`` is sized to cores locally — on a
real cluster leave it to AQE's coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Arrow batch size — plays the role of the reference's dataset
#: ``batch_size`` (reference: mindocr/data/builder.py:186-195): each
#: mapInPandas invocation sees ≤ this many documents. Larger batches
#: amortize JVM↔python Arrow IPC (the dominant overhead at high
#: parallelism); smaller batches bound worker memory for huge pages.
ARROW_BATCH = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH", "256"))  # measured best (BENCH.md method)


def get_spark(
    app: str = "mindocr_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


_shipped: set = set()


def _ship_package(spark: SparkSession) -> None:
    """addPyFile the package zip so python workers can unpickle
    mindocr_spark closures regardless of the driver's cwd/PYTHONPATH
    (workers do not inherit driver sys.path mutations)."""
    sc = spark.sparkContext
    if id(sc) in _shipped:
        return
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join("/tmp", f"mindocr_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as z:
            pkg = os.path.join(root, "mindocr_spark")
            for dirpath, _dirs, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zip_path)
    _shipped.add(id(sc))
