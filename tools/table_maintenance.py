"""table_maintenance — operational CLI for WAP tables (spark-submit
entrypoint): inspect snapshots, time-travel-read a seq, or run the
binPack compaction — the OPTIMIZE/VACUUM surface an operator drives on
a schedule.

Usage:
    spark-submit tools/table_maintenance.py snapshots <table_path>
    spark-submit tools/table_maintenance.py read <table_path> [<seq>]
    spark-submit tools/table_maintenance.py compact <table_path> \
        <run_id> [<target_mb>]
    spark-submit tools/table_maintenance.py schema <table_path>

Exit code 0 on success; `compact` prints whether a new snapshot
committed (False = already compact, an idempotent no-op).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cmd, path = sys.argv[1], sys.argv[2]

    from mindocr_spark.session import get_spark
    from mindocr_spark.operators.pipeline import (
        compact_published,
        list_snapshots,
        read_published,
    )

    spark = get_spark(app="table_maintenance")
    if cmd == "snapshots":
        for m in list_snapshots(spark, path):
            print(json.dumps(m))
        return 0
    if cmd == "schema":
        from mindocr_spark.operators.pipeline import current_schema

        print(json.dumps({"schema": current_schema(spark, path)}))
        return 0
    if cmd == "read":
        seq = int(sys.argv[3]) if len(sys.argv) > 3 else None
        df = read_published(spark, path, seq=seq)
        print(json.dumps({
            "seq": seq if seq is not None else "latest",
            "rows": df.count(),
            "columns": df.columns,
        }))
        return 0
    if cmd == "compact":
        if len(sys.argv) < 4:
            print("compact needs a run_id", file=sys.stderr)
            return 2
        run_id = sys.argv[3]
        target_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 128
        committed = compact_published(
            spark, path, run_id=run_id, target_bytes=target_mb << 20)
        print(json.dumps({"committed": committed, "run_id": run_id}))
        return 0
    print(f"unknown command {cmd!r}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
