"""End-to-end extraction jobs: plan → run → write, with skew handling,
metrics and resume.

The job shape (SURVEY §4): scan → fused narrow extraction → write.
Zero shuffles on the main path. Optional knobs for the 100 TB design
point:

- ``salt_partitions``: repartition by ``xxhash64(url)`` — breaks source
  skew (one giant warc bucket) before the CPU-heavy stage; on a real
  cluster the Iceberg table is already written bucketed by url-hash so
  this shuffle disappears (scan-time bucketing).
- ``size_ordered``: ``repartitionByRange(length(html))`` — co-batches
  similar-sized documents, the analog of the reference's gear batching
  (reference: deploy/py_infer/src/data_process/utils/gear_utils.py:11-35),
  so one multi-MB page doesn't stall an otherwise-tiny Arrow batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mindocr_spark import extract_core as core
from mindocr_spark.operators.stages import extract_stage
from mindocr_spark.operators.registry import build_pipeline


def prepare_input(
    pages: DataFrame,
    salt_partitions: int | None = None,
    size_ordered: bool = False,
) -> DataFrame:
    if salt_partitions:
        pages = pages.repartition(salt_partitions, F.xxhash64("url"))
    if size_ordered:
        n = pages.sparkSession.sparkContext.defaultParallelism * 2
        pages = pages.repartitionByRange(n, F.length("html"))
    return pages


def run_extraction(
    pages: DataFrame,
    params: core.ExtractParams = core.DEFAULT_PARAMS,
    staged: bool = False,
    salt_partitions: int | None = None,
    size_ordered: bool = False,
) -> DataFrame:
    """The flagship query: extract main content for every page."""
    pages = prepare_input(pages, salt_partitions, size_ordered)
    if staged:
        return build_pipeline(params=params)(pages)
    return extract_stage(pages, params)


def extraction_metrics(result: DataFrame, run_id: str) -> DataFrame:
    """Per-partition metrics — the partial+final aggregation shape of the
    reference's DetMetric/AllReduce (reference:
    mindocr/metrics/det_metrics.py:79-156) and its per-module profiling
    (deploy/py_infer/src/parallel/parallel_pipeline.py:89-104).

    Declarative: one groupBy over spark_partition_id — Catalyst does the
    map-side partial agg; no accumulator plumbing needed.
    """
    return (
        result.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("total_bytes").alias("bytes_in"),
            F.sum(F.length("extracted_text")).alias("chars_out"),
            F.avg("boilerplate_ratio").alias("boilerplate_ratio"),
            F.sum(F.col("failed").cast("long")).alias("failures"),
            F.sum("n_blocks").alias("blocks"),
        )
        .withColumn("run_id", F.lit(run_id))
    )


def write_results(
    result: DataFrame,
    path: str,
    metrics_path: str | None = None,
    run_id: str = "run-0",
    partition_by: tuple[str, ...] = (),
    metrics_granularity: str = "partition",
) -> None:
    """Sink. On a real cluster: Iceberg write-audit-publish (stage to a
    branch, validate metrics, then fast-forward) — here: parquet with an
    explicit metrics table alongside (same commit discipline, minus the
    catalog).

    metrics_granularity:
    - "partition": metrics re-aggregated from the WRITTEN data (one
      extra scan; per-partition rows — the audit that describes exactly
      what was committed);
    - "global": metrics harvested via ``DataFrame.observe`` DURING the
      write job itself — zero extra passes (the observed plan executes
      exactly once, so the counters are exact); one row with
      partition_id = -1. At 100 TB the free global row is the
      every-run default and the per-partition audit is the
      deep-inspection mode.
    """
    if metrics_granularity not in ("partition", "global"):
        raise ValueError(
            f"metrics_granularity must be 'partition' or 'global', "
            f"got {metrics_granularity!r}"
        )
    if metrics_path and metrics_granularity == "global":
        result, obs = _observe_metrics(result, run_id)
    w = result.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    if not metrics_path:
        return
    spark = result.sparkSession
    if metrics_granularity == "global":
        _append_metrics_row(spark, _harvest(obs), run_id, metrics_path)
    else:
        # metrics computed on the *written* data so they describe the commit
        written = spark.read.parquet(path)
        extraction_metrics(written, run_id).write.mode("append").parquet(
            metrics_path
        )


def _observe_metrics(result: DataFrame, run_id: str):
    """Attach the extraction-metrics observation (the single source of
    the audited counter list — write_results global mode and the WAP
    sink share it so the two can never drift). A relation WITHOUT the
    extraction columns (a generic or schema-evolved table) gets the
    count-only observation — docs is real, the extraction-specific
    counters are zero — so the WAP protocol serves ANY table, not only
    raw extraction output."""
    from pyspark.sql import Observation

    obs = Observation(f"extract_metrics_{run_id}")
    needed = {"total_bytes", "extracted_text", "boilerplate_ratio",
              "failed", "n_blocks"}
    if needed <= set(result.columns):
        return result.observe(
            obs,
            F.count(F.lit(1)).alias("docs"),
            F.sum("total_bytes").alias("bytes_in"),
            F.sum(F.length("extracted_text")).alias("chars_out"),
            F.avg("boilerplate_ratio").alias("boilerplate_ratio"),
            F.sum(F.col("failed").cast("long")).alias("failures"),
            F.sum("n_blocks").alias("blocks"),
        ), obs
    z = F.lit(0).cast("long")
    return result.observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.max(z).alias("bytes_in"),
        F.max(z).alias("chars_out"),
        F.max(F.lit(0.0)).alias("boilerplate_ratio"),
        F.max(z).alias("failures"),
        F.max(z).alias("blocks"),
    ), obs


def _harvest(obs) -> dict:
    return {k: (0 if v is None else v) for k, v in dict(obs.get).items()}


def _metrics_row_exists(spark, metrics_path: str, run_id: str) -> bool:
    """Whether the metrics sink already carries a row for run_id — one
    bookkeeping-sized filtered scan (run_id pushdown applies), used to
    make the WAP audit-record append idempotent under crash-retry."""
    if not _FS(spark, metrics_path).exists(metrics_path):
        return False
    return (
        spark.read.parquet(metrics_path)
        .where(F.col("run_id") == run_id).limit(1).count() > 0
    )


def _append_metrics_row(spark, g: dict, run_id: str,
                        metrics_path: str) -> None:
    spark.createDataFrame(
        [(
            -1, int(g["docs"]), int(g["bytes_in"]), int(g["chars_out"]),
            float(g["boilerplate_ratio"]), int(g["failures"]),
            int(g["blocks"]), run_id,
        )],
        "partition_id int, docs bigint, bytes_in bigint, chars_out bigint, "
        "boilerplate_ratio double, failures bigint, blocks bigint, "
        "run_id string",
    ).write.mode("append").parquet(metrics_path)


class _FS:
    """Thin wrapper over the Hadoop FileSystem API resolved for a URI —
    the same abstraction spark itself uses for every path, so the WAP
    commit protocol below works verbatim on file://, hdfs:// and
    s3a:// (any scheme the cluster's Hadoop conf knows). Only four
    primitives, all object-store-native: create-once small-file write,
    full small-file read, directory listing, recursive delete. NO
    renames anywhere — commit atomicity comes from single-file
    creation (an object-store PUT), not from rename."""

    def __init__(self, spark: "SparkSession", path: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._io = jvm.org.apache.commons.io.IOUtils
        self.fs = self._Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def write_bytes(self, path: str, data: bytes) -> None:
        out = self.fs.create(self._Path(path), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def read_bytes(self, path: str) -> bytes:
        stream = self.fs.open(self._Path(path))
        try:
            return bytes(self._io.toByteArray(stream))
        finally:
            stream.close()

    def list_names(self, path: str) -> list[str]:
        p = self._Path(path)
        if not self.fs.exists(p):
            return []
        return [s.getPath().getName() for s in self.fs.listStatus(p)]

    def list_sizes(self, path: str) -> list[tuple[str, int]]:
        p = self._Path(path)
        if not self.fs.exists(p):
            return []
        return [(s.getPath().getName(), int(s.getLen()))
                for s in self.fs.listStatus(p)]

    def list_sizes_recursive(self, path: str) -> list[tuple[str, int]]:
        """(path-relative-to-`path`, bytes) for every FILE under `path`,
        any depth — the inventory primitive a Hive-partitioned snapshot
        needs (its data files live under partition dirs). Object-store
        native: one listFiles(recursive) call, a flat-keyed LIST."""
        p = self._Path(path)
        if not self.fs.exists(p):
            return []
        base = self.fs.makeQualified(p).toString().rstrip("/") + "/"
        out = []
        it = self.fs.listFiles(p, True)
        while it.hasNext():
            s = it.next()
            full = s.getPath().toString()
            rel = full[len(base):] if full.startswith(base) else full
            out.append((rel, int(s.getLen())))
        return out

    def exists(self, path: str) -> bool:
        return self.fs.exists(self._Path(path))

    def delete(self, path: str) -> None:
        self.fs.delete(self._Path(path), True)


_MANIFEST_DIR = "_manifests"
_DATA_DIR = "_data"


def _manifest_seq(name: str) -> int | None:
    """manifest-<seq>-<run_id>.json → seq (None if not a manifest)."""
    if not (name.startswith("manifest-") and name.endswith(".json")):
        return None
    try:
        return int(name.split("-")[1])
    except (IndexError, ValueError):
        return None


#: Column types eligible for per-file min/max stats: orderable AND
#: JSON-exact (round-tripping the manifest cannot change a boundary
#: comparison). Floats/timestamps/dates are excluded on purpose —
#: their JSON round-trip / tz semantics are not bit-safe, and the
#: skipping contract must never be approximately right.
_STATS_TYPES = frozenset(
    {"string", "bigint", "int", "smallint", "tinyint", "boolean"})


def _collect_file_stats(spark: "SparkSession", data_dir: str) -> dict:
    """Per-data-file min/max column statistics for the committed
    snapshot — the Iceberg manifest data-skipping payload, recorded at
    commit time: {relative_file: {col: [min, max]}} for every
    stats-eligible column (`_STATS_TYPES`). Files where a column is
    all-NULL record [None, None] (an equality probe can then skip the
    file outright — the probe value is never NULL).

    Cost: one extra scan of the snapshot per publish, aggregated per
    input file (map-side combinable — one row per (file) survives).
    Iceberg reads the same numbers out of the parquet footers for
    free; the pointer-manifest emulation pays the scan instead of a
    footer parser. The manifest grows by O(files x stat columns) —
    the same cardinality Iceberg's own manifests carry."""
    df = spark.read.parquet(data_dir)
    cols = [f.name for f in df.schema.fields
            if f.dataType.simpleString() in _STATS_TYPES]
    if not cols:
        return {}
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__lo_{c}"))
        aggs.append(F.max(c).alias(f"__hi_{c}"))
    rows = df.groupBy(
        F.input_file_name().alias("__file")).agg(*aggs).collect()
    prefix = data_dir.rstrip("/") + "/"
    out: dict = {}
    for r in rows:
        f_uri = r["__file"]
        # input_file_name yields a URI (file:///...); key by the path
        # RELATIVE to the data dir so manifests survive a table move
        idx = f_uri.find(prefix.lstrip("/"))
        rel = f_uri[idx + len(prefix.lstrip("/")):] if idx >= 0 else f_uri
        out[rel] = {c: [r[f"__lo_{c}"], r[f"__hi_{c}"]] for c in cols}
    return out


def _stats_keep_file(cols_stats: dict, probes: dict,
                     range_probes: dict | None = None) -> bool:
    """Can a file with these [min,max] ranges contain EVERY equality
    probe value AND overlap every range probe? Missing column stats
    keep the file (skipping must never drop a row it cannot prove
    absent); a type-mismatched probe keeps the file for the same
    reason."""
    for c, v in probes.items():
        rng = cols_stats.get(c)
        if rng is None:
            continue
        lo, hi = rng
        if lo is None:  # all-NULL column: cannot contain a non-NULL v
            return False
        try:
            if not (lo <= v <= hi):
                return False
        except TypeError:
            continue
    for c, (plo, phi) in (range_probes or {}).items():
        rng = cols_stats.get(c)
        if rng is None:
            continue
        lo, hi = rng
        if lo is None:  # all-NULL column: disjoint from any interval
            return False
        try:
            if plo is not None and hi < plo:
                return False
            if phi is not None and lo > phi:
                return False
        except TypeError:
            continue
    return True


def _write_manifest(fs: _FS, path: str, run_id: str, fields: dict) -> int:
    """The single WRITE-side implementation of the manifest protocol:
    seq allocated as max over ALL manifest file names (valid or torn —
    so a torn file never collides with a retry's commit) + 1, body
    checksummed with a sorted-JSON md5, one create-once file named
    ``manifest-<seq>-<run_id>.json``. Every manifest writer (the WAP
    sink and the DedupLog) goes through here so the naming / seq /
    checksum scheme can never drift between writers; `_load_manifests`
    is the matching read side. Returns the allocated seq."""
    import hashlib
    import json

    mdir = f"{path}/{_MANIFEST_DIR}"
    seqs = [s for s in map(_manifest_seq, fs.list_names(mdir))
            if s is not None]
    seq = (max(seqs) + 1) if seqs else 1
    body = {"seq": seq, "run_id": run_id, **fields}
    body["md5"] = hashlib.md5(
        json.dumps(body, sort_keys=True).encode()
    ).hexdigest()
    fs.write_bytes(f"{mdir}/manifest-{seq:010d}-{run_id}.json",
                   json.dumps(body).encode())
    return seq


def _load_manifests(fs: _FS, path: str) -> list[dict]:
    """All VALID manifests under `path`, ascending seq. A manifest is
    valid iff it parses as JSON and its embedded md5 matches its body —
    a torn create (crash mid-write on a filesystem without atomic
    creates) fails the checksum and is treated as never-committed."""
    import hashlib
    import json

    out = []
    mdir = f"{path}/{_MANIFEST_DIR}"
    for name in fs.list_names(mdir):
        if _manifest_seq(name) is None:
            continue
        try:
            doc = json.loads(fs.read_bytes(f"{mdir}/{name}"))
            body = {k: v for k, v in doc.items() if k != "md5"}
            digest = hashlib.md5(
                json.dumps(body, sort_keys=True).encode()
            ).hexdigest()
            if digest == doc.get("md5"):
                out.append(doc)
        except Exception:
            continue  # torn or foreign file → not a commit
    return sorted(out, key=lambda d: d["seq"])


import re as _re

#: Hidden-partitioning spec grammar (the Iceberg transform family):
#: "col" (identity), "bucket(N, col)", "truncate(W, col)",
#: "years(col)" / "months(col)" / "days(col)" / "hours(col)".
_PART_FN_RE = _re.compile(
    r"^\s*(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)\s*$")
_PART_TIME_RE = _re.compile(
    r"^\s*(years|months|days|hours)\s*\(\s*(\w+)\s*\)\s*$")
_PART_ID_RE = _re.compile(r"^\s*(\w+)\s*$")

_TIME_FMT = {"years": "yyyy", "months": "yyyy-MM",
             "hours": "yyyy-MM-dd-HH"}


def parse_partition_spec(spec: str) -> dict:
    """One partition-spec entry → {kind, col, param, field}. `field`
    is the PHYSICAL partition column (Iceberg's hidden column): the
    source column itself for identity, a derived name otherwise."""
    m = _PART_FN_RE.match(spec)
    if m:
        kind, param, col = m.group(1), int(m.group(2)), m.group(3)
        if param < 1:
            raise ValueError(f"{kind} needs a positive width: {spec!r}")
        suffix = "bucket" if kind == "bucket" else "trunc"
        return {"kind": kind, "col": col, "param": param,
                "field": f"{col}_{suffix}"}
    m = _PART_TIME_RE.match(spec)
    if m:
        kind, col = m.group(1), m.group(2)
        return {"kind": kind, "col": col, "param": None,
                "field": f"{col}_{kind[:-1]}"}
    m = _PART_ID_RE.match(spec)
    if m:
        col = m.group(1)
        return {"kind": "identity", "col": col, "param": None,
                "field": col}
    raise ValueError(f"unparseable partition spec: {spec!r}")


def _transform_expr(sp: dict, src) -> "F.Column":
    """The transform applied to `src` (a column OR a literal — the
    same expression serves the write-side derived column and the
    read-side pruning predicate, so the two can never disagree).
    bucket() pins xxhash64 (Spark-native; Iceberg proper uses
    murmur3 — the CONTRACT, one pinned hash both sides, is what
    matters); truncate() is string-prefix; time transforms format in
    UTC-naive calendar grain (days yields a DATE so partition-type
    inference round-trips)."""
    kind = sp["kind"]
    if kind == "identity":
        return src
    if kind == "bucket":
        return F.pmod(F.xxhash64(src), F.lit(sp["param"]))
    if kind == "truncate":
        return F.substring(src, 1, sp["param"])
    if kind == "days":
        return F.to_date(src)
    return F.date_format(src, _TIME_FMT[kind])


def read_published_pruned(spark: "SparkSession", path: str,
                          prune: dict | None = None,
                          seq: int | None = None,
                          ranges: dict | None = None,
                          ) -> DataFrame:
    """Predicated read with HIDDEN-PARTITION pruning and per-file
    data skipping. ``prune`` maps DATA columns to EQUALITY values;
    ``ranges`` maps DATA columns to inclusive ``(lo, hi)`` bounds
    (either bound None = open) — the warc_ts time-slice read of the
    north rule. For each probe the reader composes, in order:

    1. partition-transform pruning — equality probes filter the
       PHYSICAL partition column through the recorded transform
       (Catalyst constant-folds the literal); range probes do the
       same for MONOTONE transforms (identity, truncate, time
       grains: lo <= x <= hi implies T(lo) <= T(x) <= T(hi)) and
       correctly skip the non-monotone bucket() transform;
    2. per-file MIN/MAX data skipping (the manifest's `file_stats`,
       recorded at commit): equality probes drop files whose range
       excludes the value, range probes drop files whose range does
       not OVERLAP the bounds;
    3. the exact residual predicate after the schema projection.

    Unknown probe keys raise (a silent superset is never returned).
    This is the Iceberg read semantic: callers predicate on DATA
    columns and never need to know the partition layout."""
    prune = dict(prune or {})
    ranges = dict(ranges or {})
    for c, b in ranges.items():
        if not (isinstance(b, (tuple, list)) and len(b) == 2):
            raise ValueError(
                f"ranges[{c!r}] must be a (lo, hi) pair, got {b!r}")
    # a fully-open (None, None) range constrains nothing — drop it
    # BEFORE stats skipping (an all-NULL file is skippable only when
    # some residual bound also excludes its NULL rows)
    ranges = {c: tuple(b) for c, b in ranges.items()
              if not (b[0] is None and b[1] is None)}
    overlap = set(prune) & set(ranges)
    if overlap:
        raise ValueError(
            f"columns in both prune and ranges: {sorted(overlap)}")
    manifests = _load_manifests(_FS(spark, path), path)
    if not manifests:
        raise FileNotFoundError(f"no committed WAP snapshot under {path}")
    if seq is None:
        snap = manifests[-1]
    else:
        by_seq = {m["seq"]: m for m in manifests}
        if seq not in by_seq:
            raise LookupError(
                f"no committed snapshot seq={seq} under {path} "
                f"(retained: {sorted(by_seq)})"
            )
        snap = by_seq[seq]
    specs = [parse_partition_spec(s)
             for s in (snap.get("partition_by") or [])]
    by_col = {sp["col"]: sp for sp in specs}
    cur_fields = manifests[-1].get("schema")
    snap_fields = snap.get("schema")
    # Field-ID rename resolution: a partition spec records its SOURCE
    # column under the SNAPSHOT-TIME name, while callers predicate in
    # the CURRENT schema. Map both directions by field id so a renamed
    # source keeps BOTH the partition-level prune and the exact filter
    # (previously a rename silently dropped one or the other).
    snap_of_cur: dict[str, str] = {}
    cur_of_snap: dict[str, str] = {}
    if cur_fields and snap_fields:
        by_id = {f["id"]: f["name"] for f in snap_fields}
        for f in cur_fields:
            old = by_id.get(f["id"])
            if old is not None:
                snap_of_cur[f["name"]] = old
                cur_of_snap[old] = f["name"]
    data_root = f"{path}/{_DATA_DIR}/{snap['data_dir']}"
    # DATA SKIPPING (Iceberg min/max file stats): before any scan,
    # drop every data file whose recorded [min, max] range proves the
    # probe absent (equality) or disjoint (range). Probes resolve to
    # snapshot-time column names (the stats were recorded under
    # them). File selection is driver-side over the manifest's stats
    # map — the same metadata-grain work Iceberg's planner does; the
    # scan then reads ONLY the surviving files (basePath keeps Hive
    # partition columns resolvable).
    stats = snap.get("file_stats") or {}
    probes = {snap_of_cur.get(c, c): v for c, v in prune.items()}
    range_probes = {snap_of_cur.get(c, c): b for c, b in ranges.items()}
    if stats:
        keep = [rel for rel, cols in stats.items()
                if _stats_keep_file(cols, probes, range_probes)]
        # Engage the explicit file list only when it prunes a
        # MEANINGFUL fraction: an N-path InMemoryFileIndex costs a
        # per-path driver round where the directory scan is one
        # listing, so "keep 250 of 256" is slower than not skipping
        # at all (measured: +0.2 s per probe at 256 files). When the
        # probe column doesn't correlate with file layout the stats
        # legitimately keep ~everything — fall back to the dir scan
        # and let partition pruning + the residual filter do the work.
        if not keep:
            df = spark.read.parquet(data_root).limit(0)
        elif len(keep) <= 0.75 * len(stats):
            df = spark.read.option("basePath", data_root).parquet(
                *[f"{data_root}/{rel}" for rel in keep])
        else:
            df = spark.read.parquet(data_root)
    else:
        df = spark.read.parquet(data_root)
    resolved: dict[str, dict | None] = {}
    for col, val in prune.items():
        # accept the current name (rename-aware) or the literal name
        sp = by_col.get(snap_of_cur.get(col, col)) or by_col.get(col)
        resolved[col] = sp
        if sp is not None:
            df = df.where(
                F.col(sp["field"]) == _transform_expr(sp, F.lit(val)))
    snap_types = {f["name"]: f["type"] for f in (snap_fields or [])}
    for col, (lo, hi) in ranges.items():
        sp = by_col.get(snap_of_cur.get(col, col)) or by_col.get(col)
        resolved[col] = sp
        # Only a MONOTONE transform maps a source interval into a
        # field interval: identity and the calendar grains always
        # are; truncate() is implemented as substring, which is
        # monotone for STRING sources but compares '10' < '9' for a
        # stringified numeric — so truncate prunes only when the
        # snapshot schema says the source is a string. bucket()
        # (hashing) never range-prunes. Skipped transforms still get
        # stats skipping + the exact residual — correct, just less
        # pruned.
        if sp is None:
            continue
        kind = sp["kind"]
        monotone = (
            kind in ("identity", "days", "months", "hours", "years")
            or (kind == "truncate"
                and snap_types.get(sp["col"]) == "string")
        )
        if monotone:
            fld = F.col(sp["field"])
            if lo is not None:
                df = df.where(fld >= _transform_expr(sp, F.lit(lo)))
            if hi is not None:
                df = df.where(fld <= _transform_expr(sp, F.lit(hi)))
    if cur_fields and snap_fields:
        df = _project_to_schema(df, snap_fields, cur_fields)
    residuals = [(col, "eq", val) for col, val in prune.items()]
    residuals += [(col, "range", b) for col, b in ranges.items()]
    for col, kind, val in residuals:
        cur_name = col if col in df.columns else cur_of_snap.get(col)
        sp = resolved[col]
        if cur_name is not None and cur_name in df.columns:
            c = F.col(cur_name)
            if kind == "eq":
                df = df.where(c == F.lit(val))
            else:
                lo, hi = val
                if lo is not None:
                    df = df.where(c >= F.lit(lo))
                if hi is not None:
                    df = df.where(c <= F.lit(hi))
        elif sp is None:
            # neither a spec source nor a projected column: a typo'd
            # or dropped key. Silently skipping would return the whole
            # table (a superset with no error) — fail loudly instead.
            raise KeyError(
                f"probe key {col!r} matches no partition-spec source "
                f"and no projected column of {path} (snapshot "
                f"seq={snap['seq']})")
        elif sp["kind"] != "identity":
            # transform pruning matched, but the exact source column
            # is gone from the projection: the partition filter alone
            # yields a superset. Refuse rather than silently
            # over-return.
            raise KeyError(
                f"probe key {col!r} resolves to {sp['kind']}() "
                f"partition transform but its source column is not in "
                f"the projected schema of {path} — exact row filter "
                f"impossible")
    return df


def schema_fields_of(df: DataFrame) -> list[dict]:
    """Initial field-ID assignment for a NEW table: sequential ids in
    dataframe order. Ids — not names — are a column's durable identity
    (the Iceberg rule), which is what makes rename/drop/add safe."""
    return [
        {"id": i + 1, "name": f.name, "type": f.dataType.simpleString()}
        for i, f in enumerate(df.schema.fields)
    ]


def evolve_schema(
    fields: list[dict],
    add: tuple = (),
    rename: dict | None = None,
    drop: tuple = (),
    retype: dict | None = None,
) -> list[dict]:
    """Iceberg-style schema evolution over the manifest's field list:

    - ``rename={"old": "new"}`` keeps the field ID (readers of old
      snapshots keep resolving the column by id, never by name);
    - ``drop=("name", ...)`` removes the field (its id is never
      reused — adds always allocate above the historical max);
    - ``add=(("name", "type"), ...)`` appends fresh-id fields (old
      snapshots surface them as NULL);
    - ``retype={"name": "bigint"}`` widens a type in place (same id —
      the promotion the read-side cast applies to old data).

    Returns a NEW field list; the input is not mutated. Raises on a
    rename/drop/retype of an unknown column or an add of an existing
    name — evolution typos must fail at evolve time, not read time."""
    rename = rename or {}
    retype = retype or {}
    names = {f["name"] for f in fields}
    for src in (*rename, *drop, *retype):
        if src not in names:
            raise KeyError(f"no such column to evolve: {src!r}")
    out = []
    for f in fields:
        if f["name"] in drop:
            continue
        g = dict(f)
        if f["name"] in rename:
            g["name"] = rename[f["name"]]
        if f["name"] in retype:
            g["type"] = retype[f["name"]]
        out.append(g)
    next_id = max((f["id"] for f in fields), default=0) + 1
    for name, typ in add:
        if name in names:
            raise ValueError(f"column already exists: {name!r}")
        out.append({"id": next_id, "name": name, "type": typ})
        next_id += 1
    seen = [f["name"] for f in out]
    if len(seen) != len(set(seen)):
        raise ValueError(f"evolution produced duplicate names: {seen}")
    return out


def current_schema(spark: "SparkSession", path: str) -> list[dict] | None:
    """The CURRENT committed schema of a WAP table (None when the
    table predates schema tracking or nothing is committed)."""
    manifests = _load_manifests(_FS(spark, path), path)
    return manifests[-1].get("schema") if manifests else None


def _project_to_schema(df: DataFrame, snap_fields: list[dict],
                       cur_fields: list[dict]) -> DataFrame:
    """Read-time name mapping: view a snapshot written under
    `snap_fields` through `cur_fields` — match by field ID, so renames
    resolve to the old physical column, added columns surface as
    typed NULLs, dropped columns vanish, and widened types cast. Pure
    projection: no data is rewritten (the Iceberg read path)."""
    by_id = {f["id"]: f for f in snap_fields}
    cols = []
    for f in cur_fields:
        old = by_id.get(f["id"])
        if old is None:
            cols.append(F.lit(None).cast(f["type"]).alias(f["name"]))
        else:
            cols.append(F.col(old["name"]).cast(f["type"]).alias(f["name"]))
    return df.select(*cols)


def list_snapshots(spark: "SparkSession", path: str) -> list[dict]:
    """Committed snapshots of a WAP table, ascending seq — each entry is
    the manifest body (seq, run_id, counters, …). Only snapshots whose
    data directories survive GC (`keep_snapshots`) are time-travelable;
    older manifests are swept with their data."""
    return _load_manifests(_FS(spark, path), path)


def resolve_published(spark: "SparkSession", path: str,
                      seq: int | None = None) -> str | None:
    """The committed data directory of a WAP table (None if nothing has
    ever been published). By default readers resolve through the
    highest-seq valid manifest — a publish in flight is invisible until
    its manifest file appears, so there is no window where the table is
    absent (the concurrent-reader hole of a rename-swap). Passing `seq`
    time-travels to that snapshot (it must be within the retained GC
    window)."""
    manifests = _load_manifests(_FS(spark, path), path)
    if not manifests:
        return None
    if seq is not None:
        for m in manifests:
            if m["seq"] == seq:
                return f"{path}/{_DATA_DIR}/{m['data_dir']}"
        raise LookupError(
            f"no committed snapshot seq={seq} under {path} "
            f"(retained: {[m['seq'] for m in manifests]})"
        )
    return f"{path}/{_DATA_DIR}/{manifests[-1]['data_dir']}"


def read_published(spark: "SparkSession", path: str,
                   seq: int | None = None,
                   as_written: bool = False) -> DataFrame:
    """Read a committed snapshot. When the table tracks schemas (every
    write_results_wap since schema fields landed), the read — current
    OR time-traveled — is viewed through the CURRENT schema via
    field-ID name mapping (the Iceberg read semantic): renamed columns
    resolve to old physical names, added columns surface as typed
    NULLs on pre-evolution snapshots, dropped columns vanish.
    ``as_written=True`` bypasses the mapping (snapshot archaeology);
    tables without recorded schemas read as-written always."""
    manifests = _load_manifests(_FS(spark, path), path)
    if not manifests:
        raise FileNotFoundError(f"no committed WAP snapshot under {path}")
    snap = manifests[-1]
    if seq is not None:
        by_seq = {m["seq"]: m for m in manifests}
        if seq not in by_seq:
            raise LookupError(
                f"no committed snapshot seq={seq} under {path} "
                f"(retained: {sorted(by_seq)})"
            )
        snap = by_seq[seq]
    df = spark.read.parquet(f"{path}/{_DATA_DIR}/{snap['data_dir']}")
    cur_fields = manifests[-1].get("schema")
    snap_fields = snap.get("schema")
    if as_written or not (cur_fields and snap_fields):
        return df
    return _project_to_schema(df, snap_fields, cur_fields)


def write_results_wap(
    result: DataFrame,
    path: str,
    metrics_path: str,
    run_id: str = "run-0",
    audit=None,
    keep_snapshots: int = 2,
    partition_by: tuple[str, ...] = (),
    schema_fields: list[dict] | None = None,
    collect_stats: bool = True,
) -> bool:
    """Write-audit-publish sink — the Iceberg WAP commit discipline
    (stage to a branch → validate → fast-forward main; SURVEY §1.4/§4)
    as a manifest-pointer protocol with NO renames, so it is
    object-store-safe (commit = the atomic appearance of one small
    immutable file, the same primitive Delta's _delta_log and Iceberg's
    metadata pointer rely on):

    1. WRITE the results to an immutable run-scoped data directory
       ``{path}/_data/{run_id}`` (observe() collects the audit counters
       in the same job — no extra scan);
    2. AUDIT: the `audit(metrics_dict) -> bool` hook inspects the
       counters (default: zero failed documents and ≥1 doc); a failed
       audit writes NO manifest — readers keep resolving the previous
       snapshot, and the staged directory is left for inspection (it is
       garbage-collected by the next successful publish);
    3. COMMIT: append the metrics row (audit record first — a crash
       after this point can at worst leave a metrics row for an
       uncommitted run, never committed data with no audit trail), then
       create ``{path}/_manifests/manifest-<seq>-<run_id>.json`` with an
       embedded md5 self-checksum. Readers (:func:`resolve_published`)
       take the highest-seq manifest whose checksum verifies, so a torn
       manifest write is simply not a commit;
    4. GC: data directories not referenced by the newest
       ``keep_snapshots`` manifests are deleted (the retained tail keeps
       in-flight readers of the previous snapshot alive), as are stale
       manifests beyond the tail.

    Contract: SINGLE WRITER — seq allocation is max-existing+1 with no
    compare-and-swap, so two concurrent writers could both claim a seq
    (a real catalog arbitrates this; one writer per table here).
    Readers are unrestricted and never block. Retrying a run_id is
    idempotent BOTH ways: a run_id that already COMMITTED returns True
    without touching storage (its data dir is live — rewriting it would
    yank bytes out from under readers of the current snapshot, and a
    second manifest would alias the same data_dir); a run_id that
    CRASHED before its manifest appeared left only an orphan stage dir,
    which the retry overwrites and commits under a fresh seq.

    Crash matrix: during stage → orphan data dir, no manifest, readers
    untouched, swept later; during manifest create → checksum fails,
    treated as never-committed, seq burned; after manifest create →
    committed. No intermediate state is ever visible to a reader.

    Returns True iff published.
    """
    path = path.rstrip("/")
    spark = result.sparkSession
    fs = _FS(spark, path)
    audit = audit or (lambda m: m["failures"] == 0 and m["docs"] > 0)

    # idempotent replay: a run_id with a committed manifest is done —
    # its data dir may be the one readers currently resolve, so the
    # retry must not restage (mode("overwrite") would delete live data)
    committed = _load_manifests(fs, path)
    if any(m["run_id"] == run_id for m in committed):
        return True

    # schema tracking (Iceberg field-id discipline): a NEW table gets
    # sequential ids from the result schema; an EXISTING table carries
    # its current schema forward. A result whose column set silently
    # diverges from the current schema is REJECTED — evolution must be
    # explicit (pass schema_fields=evolve_schema(current, ...)), never
    # an accident of a changed job.
    df_names = sorted(f.name for f in result.schema.fields)
    if schema_fields is None:
        cur_f = committed[-1].get("schema") if committed else None
        if cur_f is not None:
            if sorted(f["name"] for f in cur_f) != df_names:
                raise ValueError(
                    "result schema diverges from the table's current "
                    f"schema ({df_names} vs "
                    f"{sorted(f['name'] for f in cur_f)}); pass "
                    "schema_fields=evolve_schema(current_schema(...), ...)"
                )
            schema_fields = cur_f
        else:
            schema_fields = schema_fields_of(result)
    elif sorted(f["name"] for f in schema_fields) != df_names:
        raise ValueError(
            f"schema_fields names {sorted(f['name'] for f in schema_fields)} "
            f"do not match the result columns {df_names}"
        )

    data_dir = f"{path}/{_DATA_DIR}/{run_id}"
    observed, obs = _observe_metrics(result, run_id)
    staged = observed
    if partition_by:
        # Hive-layout partition dirs inside the immutable run dir: a
        # reader resolving through the manifest gets partition PRUNING
        # for free (the scan's PartitionFilters — plan-asserted in
        # tests), the Iceberg partition-spec analog. Transform specs
        # ("bucket(16, url)", "days(warc_ts)", ...) are HIDDEN
        # partitioning: the derived physical column is added here,
        # recorded in the manifest spec, and dropped again by the
        # schema projection on read — readers predicate on DATA
        # columns via read_published_pruned and never see the layout.
        specs = [parse_partition_spec(s) for s in partition_by]
        for sp in specs:
            if sp["kind"] != "identity":
                staged = staged.withColumn(
                    sp["field"], _transform_expr(sp, F.col(sp["col"])))
        w = staged.write.mode("overwrite").partitionBy(
            *[sp["field"] for sp in specs])
    else:
        w = staged.write.mode("overwrite")
    w.parquet(data_dir)
    g = _harvest(obs)
    if not audit(g):
        return False  # no manifest written; previous snapshot still live

    # audit record BEFORE the commit point, idempotent per run_id: the
    # retry of a crash that landed between this append and the manifest
    # create must not leave a duplicate metrics row (consumers count /
    # join metrics by run_id)
    if not _metrics_row_exists(spark, metrics_path, run_id):
        _append_metrics_row(spark, g, run_id, metrics_path)

    _write_manifest(fs, path, run_id, {
        "data_dir": run_id,
        "partition_by": list(partition_by),
        "schema": schema_fields,
        "counters": {k: (float(v) if k == "boilerplate_ratio" else int(v))
                     for k, v in g.items()},
        # per-file min/max (Iceberg data-skipping stats): consulted by
        # read_published_pruned to drop whole files before the scan
        "file_stats": (_collect_file_stats(spark, data_dir)
                       if collect_stats else {}),
    })
    mdir = f"{path}/{_MANIFEST_DIR}"

    # GC: drop data dirs not referenced by the newest keep_snapshots
    # manifests (orphans from crashed/rejected runs included) and stale
    # manifest files beyond the retained tail
    manifests = _load_manifests(fs, path)
    live = {m["data_dir"] for m in manifests[-keep_snapshots:]}
    for name in fs.list_names(f"{path}/{_DATA_DIR}"):
        if name not in live:
            fs.delete(f"{path}/{_DATA_DIR}/{name}")
    live_seqs = {m["seq"] for m in manifests[-keep_snapshots:]}
    for name in fs.list_names(mdir):
        s = _manifest_seq(name)
        if s is not None and s not in live_seqs:
            fs.delete(f"{mdir}/{name}")
    return True


def compact_published(
    spark: "SparkSession",
    path: str,
    run_id: str,
    target_bytes: int = 128 << 20,
    keep_snapshots: int = 2,
) -> bool:
    """Execute the compaction the planner prescribes (OPTIMIZE/binPack
    — SURVEY §4's small-file maintenance): inventory the CURRENT
    committed snapshot's files from FS metadata, feed
    `tuning.compaction_plan` (next-fit-decreasing bins at
    `target_bytes`), rewrite the snapshot coalesced to the planned bin
    count, and commit the rewrite as a NEW manifest seq through the
    same manifest-pointer protocol as `write_results_wap` — readers
    keep resolving the old snapshot until the new manifest appears,
    and the previous snapshot stays time-travelable inside the GC
    window (`keep_snapshots`).

    Partitioned snapshots (manifest `partition_by` non-empty) are
    compacted PER PARTITION DIRECTORY: the recursive file inventory
    keys each data file by its Hive partition path, the planner bins
    within each partition, and the rewrite coalesces each partition
    dir independently into the same relative layout — so the pruning
    contract survives compaction and the new manifest carries the
    same `partition_by` spec forward.

    Audit-before-commit: the rewritten data is re-read and its row
    count compared against the source snapshot — a short write (lost
    task, partial directory) writes NO manifest and leaves the
    previous snapshot live. Returns True iff a compaction committed
    (False when the table is already at or below the planned bin
    count — an idempotent no-op, no seq burned).

    100 TB shape: planning runs at file-metadata grain (~10^6 rows
    for a 100 TB table); each rewrite is one coalesce (narrow — no
    shuffle) sized by that partition's plan. Partitions rewrite as
    independent jobs here (driver loop); a real cluster submits them
    concurrently or rewrites only the partitions whose plan shrank —
    both fit the same per-partition-manifest protocol."""
    import os as _os

    from mindocr_spark.tuning import compaction_plan

    fs = _FS(spark, path)
    manifests = _load_manifests(fs, path)
    if not manifests:
        raise FileNotFoundError(f"no committed WAP snapshot under {path}")
    cur = manifests[-1]
    if any(m["run_id"] == run_id for m in manifests):
        return True  # idempotent replay of a committed compaction
    partition_by = list(cur.get("partition_by") or [])
    data = f"{path}/{_DATA_DIR}/{cur['data_dir']}"
    # recursive inventory keyed by Hive partition dir ("" = table root)
    inv = [
        (_os.path.dirname(rel), rel, sz)
        for rel, sz in fs.list_sizes_recursive(data)
        if rel.endswith(".parquet")
    ]
    if not inv:
        raise FileNotFoundError(f"snapshot {cur['seq']} has no data files")
    files_df = spark.createDataFrame(
        inv, "partition string, file string, bytes long",
    )
    plan = compaction_plan(files_df, target_bytes)
    bins = {
        r["partition"]: r["n_bins"]
        for r in plan.groupBy("partition")
        .agg(F.countDistinct("bin").alias("n_bins")).collect()
    }
    if sum(bins.values()) >= len(inv):
        return False  # nothing to gain — already compact
    src = spark.read.parquet(data)
    n_before = src.count()
    new_dir = f"{path}/{_DATA_DIR}/{run_id}"
    if partition_by:
        # per-partition coalesce into the SAME relative Hive layout —
        # readers' partition pruning keeps working on the new snapshot
        for part_rel, n_b in sorted(bins.items()):
            (
                spark.read.parquet(f"{data}/{part_rel}")
                .coalesce(max(1, int(n_b)))
                .write.mode("overwrite")
                .parquet(f"{new_dir}/{part_rel}")
            )
    else:
        src.coalesce(max(1, sum(bins.values()))).write.mode(
            "overwrite").parquet(new_dir)
    n_after = spark.read.parquet(new_dir).count()
    if n_after != n_before:
        fs.delete(new_dir)  # audit failed: no manifest, old snapshot live
        raise RuntimeError(
            f"compaction audit failed: {n_before} rows -> {n_after}")
    manifest_fields = {
        "data_dir": run_id,
        "partition_by": partition_by,
        "compaction_of": cur["seq"],
        "counters": {"rows": int(n_after), "files_before": len(inv),
                     "files_after": int(sum(bins.values()))},
    }
    if cur.get("schema") is not None:
        manifest_fields["schema"] = cur["schema"]  # spec carries forward
    # data-skipping stats follow the DATA, not the manifest: the
    # rewritten files get fresh min/max ranges (carrying the old map
    # forward would reference deleted files and skip nothing)
    manifest_fields["file_stats"] = _collect_file_stats(spark, new_dir)
    _write_manifest(fs, path, run_id, manifest_fields)
    manifests = _load_manifests(fs, path)
    live = {m["data_dir"] for m in manifests[-keep_snapshots:]}
    for name in fs.list_names(f"{path}/{_DATA_DIR}"):
        if name not in live:
            fs.delete(f"{path}/{_DATA_DIR}/{name}")
    live_seqs = {m["seq"] for m in manifests[-keep_snapshots:]}
    for name in fs.list_names(f"{path}/{_MANIFEST_DIR}"):
        s = _manifest_seq(name)
        if s is not None and s not in live_seqs:
            fs.delete(f"{path}/{_MANIFEST_DIR}/{name}")
    return True
