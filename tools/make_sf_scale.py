"""make_sf_scale — synthesize a larger SF tier from an existing one.

The driver ships sf{0.001,0.01,0.1}; the sf1 REHEARSAL (VERDICT r2 #3)
needs a 10× tier to prove no query grows super-linearly. This tool
derives it deterministically from sf0.1 (no RNG, no external data):

- ``documents``: 10 replicas. Replica k>0 interleaves a ``k<k>`` marker
  token before every 3rd word, so EVERY word-3-shingle contains a
  replica marker — cross-replica Jaccard is exactly 0 and the near-dup
  pair structure of each replica mirrors the source tier instead of
  exploding into 10-clone clusters (a naive copy would square the LSH
  bucket work and measure a synthetic pathology, not scaling).
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
        SELECT doc_id + k * {OFF} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE array_to_string(
                      list_transform(string_split(text, ' '),
                        (w, i) -> CASE WHEN i % 3 = 1
                                  THEN 'k' || k || ' ' || w ELSE w END),
                      ' ')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN k = 0 THEN text
                    ELSE array_to_string(
                      list_transform(string_split(text, ' '),
                        (w, i) -> CASE WHEN i % 3 = 1
                                  THEN 'k' || k || ' ' || w ELSE w END),
                      ' ') END) AS BIGINT) AS n_chars
        FROM {t['documents']} CROSS JOIN reps
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
