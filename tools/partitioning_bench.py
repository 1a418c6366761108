"""Partitioning-strategy benchmark — the engine-side replica of the
reference's partitioning experiment (``infra/partitioning_runs.sh`` +
``src/utils/partitioning_test.py``; numbers in BASELINE.md table 3).

The reference builds a ~9.58M-row SCD2 table three ways — unpartitioned,
partitioned by ``is_current``, partitioned by ``valid_from`` y/m/d —
then times two count queries:

  * Q1: ``year=Y AND month=M AND day=D AND is_current`` on a day with
    NO data (result 0) — the pruning best case;
  * Q2: the same shape on a day holding data (large result).

Reference results (6 workers): Q1 7.71 / 6.76 / 6.99 s, Q2 8.43 /
8.79 / 7.07 s — near-flat because their Delta scan still lists the
whole table. This engine's manifest-level pruning (``read_partitions``
/ data skipping) makes the y/m/d Q1 a metadata no-op, which is the
point of the layout at 100 TB.

Usage::

    python tools/partitioning_bench.py [rows]     (default 2_000_000)

Prints one JSON line per (strategy, query).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from delta_lake_pyspark_scd2_spark.pipeline.scd2_pipeline import (
        SCD2Spec,
        run_scd2_batch,
    )
    from delta_lake_pyspark_scd2_spark.session import get_spark
    from delta_lake_pyspark_scd2_spark.sources import generators as G
    from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable

    spark = get_spark("partitioning_bench")
    spec = SCD2Spec(
        key_cols=("user_id",),
        event_ts_col="ts",
        tracked_cols=("event_type", "value"),
        tiebreak_cols=("event_id",),
    )
    events = G.synthetic_events(spark, n_rows, n_keys=max(1, n_rows // 10), seed=1)

    with tempfile.TemporaryDirectory() as tmp:
        # Build ONE canonical SCD2 table (y/m/d), then re-lay it out.
        base = f"{tmp}/ymd"
        run_scd2_batch(spark, spec, events, base, batch_id="p1")
        t_ymd = VersionedParquetTable(spark, base)
        versions = t_ymd.read().persist()
        versions.count()

        t_none = VersionedParquetTable.create(
            spark, versions, f"{tmp}/none", partition_cols=[]
        )
        t_cur = VersionedParquetTable.create(
            spark, versions, f"{tmp}/is_current", partition_cols=["is_current"]
        )
        versions.unpersist()

        # A day holding current rows vs a day certainly absent.
        some = (
            t_ymd.read()
            .filter(F.col("is_current"))
            .groupBy("valid_from_year", "valid_from_month", "valid_from_day")
            .count()
            .orderBy(F.col("count").desc())
            .first()
        )
        q2 = (some["valid_from_year"], some["valid_from_month"], some["valid_from_day"])
        q1 = (some["valid_from_year"] + 30, 1, 1)

        def count_filtered(table: VersionedParquetTable, ymd, *, pruned: bool) -> int:
            y, m, d = ymd
            if pruned:
                # manifest-level skipping: partition values + file stats
                df = table.read_where(
                    [
                        ("valid_from_year", "=", y),
                        ("valid_from_month", "=", m),
                        ("valid_from_day", "=", d),
                        ("is_current", "=", True),
                    ]
                )
                return df.count()
            df = table.read()
            return df.filter(
                (F.col("valid_from_year") == y)
                & (F.col("valid_from_month") == m)
                & (F.col("valid_from_day") == d)
                & F.col("is_current")
            ).count()

        strategies = [
            ("none", t_none, False),
            ("is_current", t_cur, False),
            ("ymd", t_ymd, False),
            ("ymd+skipping", t_ymd, True),
        ]
        for qname, ymd in (("q1_empty_day", q1), ("q2_data_day", q2)):
            for sname, table, pruned in strategies:
                best, n = float("inf"), 0
                for _ in range(2):  # best-of-2: first run pays JIT
                    t0 = time.time()
                    n = count_filtered(table, ymd, pruned=pruned)
                    best = min(best, time.time() - t0)
                print(
                    json.dumps(
                        {
                            "query": qname,
                            "strategy": sname,
                            "rows": n,
                            "duration_s": round(best, 3),
                            "n_rows_table": n_rows,
                        }
                    )
                )


if __name__ == "__main__":
    main()
