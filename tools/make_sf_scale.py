"""make_sf_scale — synthesize a larger SF tier from an existing one.

The driver ships sf{0.001,0.01,0.1}; the sf1 REHEARSAL (VERDICT r2 #3)
needs a 10× tier to prove no query grows super-linearly. This tool
derives it deterministically from sf0.1 (no RNG, no external data):

- ``documents``: 10 replicas. Replica k>0 maps every word w → w~k — a
  per-replica VOCABULARY BIJECTION, so every shingle maps bijectively
  too: cross-replica Jaccard is exactly 0 while each replica's
  intra-corpus pair structure is EXACTLY the source tier's (pairs,
  Jaccards, cluster sizes all identical), i.e. every text operator's
  output grows exactly linearly. (A naive copy would clone every doc
  into a 10-dup cluster and square the LSH bucket work; a marker-
  interleaving scheme shrinks shingle entropy to 2 effective words and
  manufactures spurious low-Jaccard pairs — both measure synthetic
  pathologies, not scaling.)
- ``embeddings``: 10 replicas; replica k rotates each vector by k
  components (norm-preserving, neighbor-scrambling).
- ``events``: 10 replicas; ids offset, timestamps shifted k days.
- ``orders``/``lineitem``: 10 replicas with consistently offset order
  keys (FKs into the single-copy dimension tables stay valid).
- dimension tables (region nation customer supplier part): copied.

Usage: python tools/make_sf_scale.py [src_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

OFF = 10_000_000  # key offset per replica — far above any source key


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW reps AS SELECT range AS k FROM range({factor})")

    def emit(name: str, sql: str) -> None:
        out = f"{dst}/{name}.parquet"
        con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows")

    t = {n: f"'{src}/{n}.parquet'" for n in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings").split()}

    emit("documents", f"""
        WITH scaled AS (
          SELECT doc_id + k * {OFF} AS doc_id,
                 CASE WHEN k = 0 THEN text
                      ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> w || '~' || k),
                        ' ')
                 END AS text,
                 lang, source
          FROM {t['documents']} CROSS JOIN reps)
        SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM scaled
    """)
    emit("embeddings", f"""
        SELECT vec_id + k * {OFF} AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE (embedding[(k % len(embedding)) + 1:]
                          || embedding[:(k % len(embedding))])::FLOAT[]
               END AS embedding,
               label
        FROM {t['embeddings']} CROSS JOIN reps
    """)
    emit("events", f"""
        SELECT event_id + k * {OFF} AS event_id,
               ts + to_days(CAST(k AS INT)) AS ts,
               user_id + k * {OFF} AS user_id,
               event_type, "value", props
        FROM {t['events']} CROSS JOIN reps
    """)
    emit("orders", f"""
        SELECT o_orderkey + k * {OFF} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t['orders']} CROSS JOIN reps
    """)
    emit("lineitem", f"""
        SELECT l_orderkey + k * {OFF} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t['lineitem']} CROSS JOIN reps
    """)
    for dim in ("region", "nation", "customer", "supplier", "part"):
        emit(dim, f"SELECT * FROM {t[dim]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
