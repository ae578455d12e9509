"""Dev harness mimicking the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same sf dir, compare row count, column names, and exact values
(columns sorted by name, rows sorted by all columns).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v))
        else:
            df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    import __spark_entry__ as entrymod
    from mindocr_spark.session import get_spark

    # the driver's session tz / ansi mode are unknown — probe under
    # hostile settings with SPARK_GRAFT_ORACLE_TZ=Asia/Tokyo
    # SPARK_GRAFT_ORACLE_ANSI=true before shipping tz-sensitive queries
    extra = {}
    if os.environ.get("SPARK_GRAFT_ORACLE_TZ"):
        extra["spark.sql.session.timeZone"] = os.environ["SPARK_GRAFT_ORACLE_TZ"]
    if os.environ.get("SPARK_GRAFT_ORACLE_ANSI"):
        extra["spark.sql.ansi.enabled"] = os.environ["SPARK_GRAFT_ORACLE_ANSI"]
    spark = get_spark(app="oracle_check", cores=8, shuffle_partitions=16,
                      extra=extra)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL-SPARK] {name}: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"[ROWS-ONLY] {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL-ORACLE] {name}: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"[MISMATCH-ROWS] {name}: spark={len(sdf)} oracle={len(odf)}")
            failed.append(name)
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"[MISMATCH-COLS] {name}: spark={sorted(sdf.columns)} "
                f"oracle={sorted(odf.columns)}"
            )
            failed.append(name)
            continue
        cs, co = canon(sdf), canon(odf)
        if not cs.equals(co):
            neq = (cs != co).any(axis=1)
            idx = neq[neq].index[:3]
            print(f"[MISMATCH-VALS] {name}: {int(neq.sum())}/{len(cs)} rows differ")
            for i in idx:
                for c in cs.columns:
                    if cs.at[i, c] != co.at[i, c]:
                        print(f"    row {i} col {c}: spark={cs.at[i, c]!r} oracle={co.at[i, c]!r}")
            failed.append(name)
            continue
        print(f"[OK] {name}: {len(sdf)} rows")
    print(f"\n{'ALL OK' if not failed else 'FAILED: ' + ', '.join(failed)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
