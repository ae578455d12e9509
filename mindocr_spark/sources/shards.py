"""shards — JSONL training-shard export / ingest (the last-mile
artifact).

Every LLM training stack consumes the curated corpus as numbered
JSONL shards (one JSON object per line, one file per shard) — the
handoff format between the curation engine and the trainer's data
loader. This module is that boundary, kept bit-reproducible:

* shard assignment is a pure function of the doc id (md5-prefix
  bucket — the ``stratified_sample`` determinism rule), so reruns,
  retries, and different cluster shapes produce the IDENTICAL shard
  layout;
* in-file order is pinned (md5(id), id), so each shard file is
  byte-stable;
* the writer is the one-group-per-file applyInPandas sink (no driver
  collect — the ``wet.write_wet_dir`` shape), the reader a binaryFile
  scan with per-file failure rows (skip-flag discipline, no job abort
  on one corrupt shard).

100 TB shape: one shuffle on the (uniform) shard key; file count is
16^prefix_len — at web scale you pick prefix_len 3-4 (4k-64k shards,
the Common-Crawl segment-count ballpark) so each file stays
loader-sized. The md5 bucket is uniform by construction: no hot shard.

Reference lineage: the reference's safe_list_writer persists per-rank
result shards that are later merged by name
(reference: mindocr/utils/evaluator.py + tools/eval.py:33-57); the
shard id here is the same rank-file discipline made content-addressed.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Ingest contract for shard-backed corpora.
SHARD_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, shard string, "
    "seq bigint, shard_file string"
)


def shard_key(id_col, prefix_len: int = 1):
    """md5-prefix shard bucket for an id column — a pure function of
    the id (engine-portable: DuckDB states the same expression), so
    shard layout is independent of partitioning, batching, and run
    count. 16^prefix_len buckets, uniform by construction."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, prefix_len)


def hrw_choice_sql(key_expr: str, shards) -> str:
    """Rendezvous (highest-random-weight) shard choice as ONE portable
    SQL expression (identical text runs in Spark and DuckDB — md5 /
    concat / greatest / substring are common dialect): each shard's
    weight is md5(key ∥ '|' ∥ shard), the winner the lexicographic max;
    appending '|shard' after the fixed-width 32-char digest makes
    greatest() carry the winner's name along (and break the
    cryptographically-impossible digest tie deterministically), and
    substring(…, 34) peels it back off.

    HRW is the stable-assignment primitive for shard/worker routing:
    unlike mod-N, resizing from S to S∪T moves ONLY keys whose new
    winner is in T (≈ |T|/|S∪T| of them) — no global reshuffle of the
    other 100 TB. Cost is O(|shards|) row-local work: right for
    dozens-to-hundreds of targets (executor pools, sink buckets); for
    100k+ virtual nodes use a ring instead.

    Reference lineage: the reference routes work to parallel infer
    processes by static device_id round-robin
    (reference: deploy/py_infer/src/parallel/framework/module_manager.py);
    HRW is that routing made resize-stable."""
    if not shards:
        raise ValueError("need at least one shard name")
    for s in shards:
        if "|" in s or "'" in s:
            raise ValueError(f"shard name must not contain | or ': {s}")
    if len(set(shards)) != len(shards):
        raise ValueError("duplicate shard names")
    terms = ", ".join(
        f"concat(md5(concat({key_expr}, '|{s}')), '|{s}')" for s in shards
    )
    if len(shards) == 1:
        return f"substring({terms}, 34)"
    return f"substring(greatest({terms}), 34)"


def hrw_resize_audit(
    df: DataFrame,
    key_col: str,
    shards_before,
    shards_added,
) -> DataFrame:
    """Minimal-movement evidence for an HRW resize: assign every key
    under the BEFORE shard set and under BEFORE ∪ ADDED, then report
    one row per shard — n_before, n_after, gained (arrivals that moved
    in), lost (departures), is_new. The rendezvous guarantee made
    checkable: every pre-existing shard must show gained = 0 (keys
    only ever move TO new shards), and each new shard drains ≈
    1/|after| of every old shard.

    100 TB shape: both assignments are row-local expressions on the
    scan (zero shuffle, no join between the two epochs — the key
    carries its own placement); the only shuffle is the final
    map-side-combinable groupBy at SHARD cardinality, reached through
    a 2-struct explode (role=before/after) so the scan runs once."""
    before = list(shards_before)
    after = before + list(shards_added)
    k = f"CAST({key_col} AS STRING)"
    assigned = df.select(
        F.expr(hrw_choice_sql(k, before)).alias("sb"),
        F.expr(hrw_choice_sql(k, after)).alias("sa"),
    ).select(
        "sb", "sa", (F.col("sb") != F.col("sa")).alias("moved"),
        F.explode(F.array(
            F.struct(F.lit("before").alias("role"), F.col("sb").alias("s")),
            F.struct(F.lit("after").alias("role"), F.col("sa").alias("s")),
        )).alias("rs"),
    )
    new_set = set(shards_added)
    return assigned.groupBy(F.col("rs.s").alias("shard")).agg(
        F.sum(F.when(F.col("rs.role") == "before", 1).otherwise(0))
        .cast("bigint").alias("n_before"),
        F.sum(F.when(F.col("rs.role") == "after", 1).otherwise(0))
        .cast("bigint").alias("n_after"),
        F.sum(F.when((F.col("rs.role") == "after") & F.col("moved"), 1)
              .otherwise(0)).cast("bigint").alias("gained"),
        F.sum(F.when((F.col("rs.role") == "before") & F.col("moved"), 1)
              .otherwise(0)).cast("bigint").alias("lost"),
    ).select(
        "shard", "n_before", "n_after", "gained", "lost",
        F.col("shard").isin(list(new_set)).alias("is_new"),
    )


def write_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    prefix_len: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> int:
    """docs → ``shard-<key>.jsonl`` files under out_dir, one file per
    md5-prefix bucket, written DISTRIBUTED (one group per file via
    applyInPandas). Lines are ``{"id":…,"text":…,"lang":…}`` with
    pinned key order and no-ASCII-escaping, sorted by (md5(id), id) —
    bit-reproducible files. Returns the number of docs written."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    src = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.col(lang_col).alias("lang"),
        shard_key(id_col, prefix_len).alias("shard"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    )

    def write_group(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        skey = str(key[0])
        name = f"shard-{skey}.jsonl"
        pdf = pdf.sort_values(["h", "doc_id"])
        lines = [
            json.dumps(
                {"id": int(r.doc_id), "text": r.text, "lang": r.lang},
                ensure_ascii=False,
                separators=(",", ":"),
            )
            for r in pdf.itertuples()
        ]
        tmp = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame({"shard": [skey], "n_docs": [len(pdf)]})

    written = (
        src.groupBy("shard")
        .applyInPandas(write_group, schema="shard string, n_docs bigint")
        .agg(F.sum("n_docs").alias("n"))
        .collect()[0]["n"]
    )
    return int(written or 0)


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic EPOCH-SEEDED global shuffle (the Megatron/T5 data-
    loader discipline): every training epoch must present the corpus in
    a different order, yet the order must be a pure function of
    (epoch, id) so a resumed or re-run job replays the identical
    sequence — an RNG shuffle breaks resume, a seedless hash gives
    every epoch the same order.

    Assignment: ``h = md5(epoch ':' id)``; ``shard = hexint(h[:8]) mod
    n_shards`` (uniform by construction — no hot shard); ``pos`` =
    rank within the shard by (h, id). Each epoch's permutation is
    independent because the seed participates in the hash, and the
    layout is engine-portable (md5 + hex arithmetic, stated verbatim
    by the SQL oracle).

    Rows with a NULL id are dropped (an unaddressable row cannot be
    scheduled — unlike the sampling gates there is no safe "keep"
    semantics for an ordering).

    100 TB shape: one shuffle on the uniform shard key + a
    sort-within-shard (the window below IS the physical
    repartition-and-sort a shard writer needs — no global sort, no
    driver collect). n_shards at web scale = the trainer's data-loader
    worker count × files-per-worker.

    Reference lineage: the per-epoch `shuffle` flag re-seeded from the
    epoch counter in dataset building
    (reference: mindocr/data/builder.py:42-78); here the permutation
    is content-addressed instead of RNG-state-dependent."""
    cid = F.col(id_col)
    h = F.md5(
        F.concat(F.lit(f"{int(epoch)}:"), cid.cast("string"))
        .cast("binary")
    )
    keyed = df.where(cid.isNotNull()).select(
        cid.alias(id_col),
        h.alias("_h"),
    )
    shard = F.pmod(
        F.conv(F.substring("_h", 1, 8), 16, 10).cast("bigint"),
        F.lit(int(n_shards)),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        keyed.select(id_col, "_h", shard.alias("shard"))
        .select(
            id_col,
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )


def parse_jsonl_shard(payload: bytes, path: str) -> list[dict]:
    """One shard file → row dicts with the shard key recovered from
    the file name and ``seq`` = 0-based line number."""
    shard = os.path.basename(path)
    if shard.startswith("shard-") and shard.endswith(".jsonl"):
        shard = shard[len("shard-"):-len(".jsonl")]
    out: list[dict] = []
    for i, line in enumerate(payload.decode("utf-8").splitlines()):
        if not line.strip():
            continue
        obj = json.loads(line)
        out.append(
            dict(doc_id=int(obj["id"]), text=obj.get("text"),
                 lang=obj.get("lang"), shard=shard, seq=i,
                 shard_file=path)
        )
    return out


def read_jsonl_shards(spark: SparkSession, path: str) -> DataFrame:
    """Ingest shard files into SHARD_DOCS_SCHEMA: binaryFile scan (one
    row per file — files are the parallelism unit, exactly how the
    trainer's loader shards work) → mapInPandas line parse. A corrupt
    shard yields ONE failure row (doc_id NULL, shard_file set) —
    no row loss elsewhere, no job abort."""
    import pandas as pd

    files_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.jsonl")
        .load(path)
    )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["doc_id", "text", "lang", "shard", "seq", "shard_file"]
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows.extend(parse_jsonl_shard(bytes(content), fpath))
                except Exception:
                    rows.append(dict(doc_id=None, text=None, lang=None,
                                     shard=None, seq=None,
                                     shard_file=fpath))
            yield pd.DataFrame(rows, columns=cols)

    return files_df.select("path", "content").mapInPandas(
        parse, schema=SHARD_DOCS_SCHEMA
    )


def synth_shard_dir(spark: SparkSession, sf_dir: str,
                    prefix_len: int = 1) -> str:
    """Idempotent fixture-shard synthesis: export the documents table
    as JSONL shards under /tmp (content-hash-keyed)."""
    from mindocr_spark.sources import content_keyed_fixture_dir

    def build(out_dir: str) -> None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        write_jsonl_shards(docs, out_dir, prefix_len=prefix_len)

    return content_keyed_fixture_dir(
        "mindocr_shards", sf_dir, (__file__,), build
    )
