"""joins — join shapes Spark lacks as built-ins, re-expressed for a
shuffle engine.

The headline member is the backward as-of join (nearest earlier match
per key), the temporal-attribution primitive every event pipeline
needs: "which page view does this click belong to", "which snapshot
was live when this capture happened". Spark has no ASOF JOIN; the
naive theta-join (l.key = r.key AND l.ts >= r.ts → argmax) explodes
quadratically inside each key. The distributed plan here is the
union-and-carry trick:

    tag both sides → union → ONE shuffle on the key → ONE ordered
    window per key carrying the last right-side row forward →
    keep the left rows.

Cost is a single shuffle + sort of |L|+|R| rows — the same shape as
sessionization, linear at any scale, no per-key quadratic work.

Reference lineage: CollectNode re-associates asynchronous per-stage
results to their source record by id ordering
(reference: deploy/py_infer/src/parallel/module/common/collect_node.py:34-63);
the as-of carry is that re-association generalized to a temporal key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_matched",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``key`` (inclusive —
    a right row AT the left timestamp matches, DuckDB/pandas
    ``merge_asof`` semantics). Left rows with no earlier right row
    keep NULLs; no left row is ever dropped.

    CONTRACT: `right` must be unique per (key, right_ts) — dedup with
    a deterministic rule first (e.g. groupBy(key, ts).agg(max(id))),
    otherwise which same-timestamp row is carried would depend on
    partition order. All right columns except `key` come back with
    `suffix` appended.

    ``tolerance_sec`` bounds the lookback: matches older than
    ``left_ts − tolerance_sec`` are NULLed (standard attribution
    windows), applied AFTER the carry so the plan is unchanged.

    100 TB shape: one shuffle on the (uniform) key + one window sort
    of |L|+|R| rows per key — never a per-key quadratic theta join.
    Ties at identical timestamps order right-before-left so the
    inclusive semantic holds; determinism inside the window ordering
    comes from the uniqueness contract above.
    """
    rcols = [c for c in right.columns if c != key]
    lstruct = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    rstruct = F.struct(
        *[F.col(c) for c in rcols]
    ).alias("__r")
    lu = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        lstruct,
        F.lit(None).cast(
            right.select(rstruct).schema["__r"].dataType
        ).alias("__r"),
    )
    ru = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(lstruct).schema["__l"].dataType
        ).alias("__l"),
        rstruct,
    )
    u = lu.unionByName(ru)
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    out = u.withColumn("__m", carried).where(F.col("__side") == 1)
    if tolerance_sec is not None:
        in_window = (
            F.col("__m").isNotNull()
            & (
                F.col("__ts")
                <= F.col(f"__m.{right_ts}")
                + F.expr(f"INTERVAL {int(tolerance_sec)} SECOND")
            )
        )
        out = out.withColumn(
            "__m", F.when(in_window, F.col("__m"))
        )
    sel: list[Column] = [
        F.col(f"__l.{c}").alias(c) for c in left.columns
    ] + [
        F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in rcols
    ]
    return out.select(*sel)


def upsert_latest(
    target: DataFrame,
    updates: DataFrame,
    key: str = "url",
    broadcast_keys: bool = True,
) -> DataFrame:
    """MERGE INTO semantics for snapshot maintenance (the Iceberg
    upsert the north rule's committed-corpus discipline implies):
    rows from `updates` win on key collision, `target` rows without
    an update survive — "keep the latest capture per url".

    The scale-correct plan is NOT a full-outer join (that shuffles
    BOTH payload sides): survivors = target LEFT ANTI the update KEY
    SET (33-byte keys, broadcast when `broadcast_keys` — a recrawl
    increment is small next to the 10^12-row corpus, so the corpus is
    touched once, map-only), then one union. For full-recrawl-sized
    updates pass ``broadcast_keys=False`` to fall back to a shuffled
    anti-join — still keys-only on the wire, never page payloads.

    `updates` must carry every `target` column; extra update-side
    columns are dropped. Output is the merged corpus, ready for the
    WAP publish (`operators.pipeline.write_results_wap`).
    """
    keys = updates.select(key).dropDuplicates([key])
    if broadcast_keys:
        keys = F.broadcast(keys)
    survivors = target.join(keys, key, "left_anti")
    return survivors.unionByName(updates.select(*target.columns))


def fk_integrity_stats(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    child_name: str,
    parent_name: str,
) -> DataFrame:
    """ONE-row referential-integrity audit of a foreign-key
    relationship — the data-quality gate a warehouse runs before
    trusting a join: (child_table, fk, parent_table, n_child_rows,
    n_null_fk, n_orphan_rows, orphan_share, n_parent_rows,
    n_parent_dup_keys). Orphans are non-NULL child keys with no parent
    row; dup parent keys break join cardinality (a "1:N" silently
    becoming M:N multiplies facts).

    100 TB shape: the orphan check is ONE anti-join on the key (AQE
    broadcasts dimension-sized parents); every other statistic is a
    map-side-combinable aggregate; no payload column is ever carried —
    both sides project to the key first.

    Reference analog: eval re-aligns predictions to ground truth by
    key and counts the unmatched (reference:
    mindocr/metrics/det_metrics.py full-outer alignment); this is that
    alignment audit at warehouse grain."""
    ck = child.select(F.col(fk_col).alias("fk"))
    pk = parent.select(F.col(pk_col).alias("fk"))
    cstats = ck.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_child_rows"),
        F.sum(F.col("fk").isNull().cast("bigint"))
        .cast("bigint").alias("n_null_fk"),
    )
    orphans = (
        ck.where(F.col("fk").isNotNull())
        .join(pk.distinct(), "fk", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphan_rows"))
    )
    # n_parent_dup_keys = distinct non-NULL keys appearing >1 time:
    # count(*)-count_distinct would (a) count NULL pk rows, which never
    # multiply a join, as "duplicates" and (b) report excess rows, not
    # duplicated keys — both false alarms for the M:N verdict this
    # column exists for. Key-grain groupBy, map-side combinable.
    pstats = (
        pk.groupBy("fk")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum("c").cast("bigint").alias("n_parent_rows"),
            F.sum(
                ((F.col("c") > 1) & F.col("fk").isNotNull())
                .cast("bigint")
            ).cast("bigint").alias("n_parent_dup_keys"),
        )
    )
    return (
        cstats.crossJoin(orphans)
        .crossJoin(pstats)
        .select(
            F.lit(child_name).alias("child_table"),
            F.lit(fk_col).alias("fk"),
            F.lit(parent_name).alias("parent_table"),
            "n_child_rows",
            "n_null_fk",
            "n_orphan_rows",
            F.round(
                F.col("n_orphan_rows").cast("double")
                / F.col("n_child_rows").cast("double"),
                6,
            ).alias("orphan_share"),
            "n_parent_rows",
            "n_parent_dup_keys",
        )
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    sorted_by_key: bool = True,
    path: str | None = None,
) -> None:
    """Persist `df` as a BUCKETED (and by default bucket-sorted)
    catalog table: rows hash-partitioned on `key` into `buckets` files
    per write task, the layout recorded in catalog metadata. Two
    tables bucketed on their join keys with the same bucket count then
    join WITHOUT a shuffle on either side (and without a sort when
    bucket-sorted) — the co-located-join discipline for every
    repeated large⋈large join in a pipeline: pay the Exchange once at
    write time, never again per query. At 10^12 rows this is the
    difference between re-shuffling the corpus per join and a pure
    scan-side zip; Iceberg's bucket partition transform is the same
    idea at the table-format layer (our WAP emulation's
    ``bucket(N, col)`` spec covers the PRUNING half; this covers the
    JOIN half through Spark's native bucketing).

    Plan-asserted in tests: bucketed⋈bucketed shows ZERO Exchange;
    the same join over plain parquet shows two."""
    if buckets < 1:
        raise ValueError(f"need buckets >= 1, got {buckets}")
    w = (
        df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, key)
    )
    if path is not None:
        w = w.option("path", path)  # external table — caller-owned dir
    if sorted_by_key:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys —
    shuffle-free by construction (assert with .explain: no Exchange).
    Disables broadcast for the join so the plan demonstrably takes
    the sort-merge-over-buckets path even when one side is small
    (at production scale neither side broadcasts anyway)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    cond = left[left_key] == right[right_key]
    return left.hint("merge").join(right, cond, how)
