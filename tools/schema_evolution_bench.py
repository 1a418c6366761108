"""Schema-evolution benchmark — the engine-side replica of the
reference's experiment (``schema_evolution_step1.py``; numbers in
BASELINE.md table 4: on a 9.58M-row / 148-file / 301 MB table, the
100-row mergeSchema append took 7.88 s, reading the previous version
1.55 s, the latest 0.39 s).

Sequence, matching the reference step for step:

  1. build an SCD2 table from synthetic events;
  2. take a 100-row sample, add a new nullable column ``risk_score``;
  3. ``mergeSchema`` append (timed);
  4. read the PREVIOUS version — time travel, old schema (timed);
  5. read the LATEST version — new column NULL for old rows (timed).

Usage::

    python tools/schema_evolution_bench.py [rows]   (default 2_000_000)

Prints ONE JSON line.
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

    spark = get_spark("schema_evolution_bench")
    spec = SCD2Spec(
        key_cols=("user_id",),
        event_ts_col="ts",
        tracked_cols=("event_type", "value"),
        tiebreak_cols=("event_id",),
    )
    events = G.synthetic_events(spark, n_rows, n_keys=max(1, n_rows // 10), seed=1)

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/t"
        run_scd2_batch(spark, spec, events, path, batch_id="b1")
        t = VersionedParquetTable(spark, path)
        v_prev = t.latest_version()
        detail = t.detail()

        sample = (
            t.read()
            .limit(100)
            .withColumn("risk_score", (F.col("user_id") % 100).cast("double"))
        )
        t0 = time.time()
        t.append(sample, merge_schema=True)
        append_s = round(time.time() - t0, 3)

        t1 = time.time()
        n_prev = t.read(v_prev).count()
        read_prev_s = round(time.time() - t1, 3)

        t2 = time.time()
        latest = t.read()
        n_latest = latest.count()
        read_latest_s = round(time.time() - t2, 3)
        assert "risk_score" in latest.columns

        print(
            json.dumps(
                {
                    "n_rows_table": detail["num_rows"],
                    "n_files": detail["num_files"],
                    "size_mb": round(detail["size_bytes"] / 1e6, 1),
                    "append_mergeschema_s": append_s,
                    "read_prev_version_s": read_prev_s,
                    "read_latest_s": read_latest_s,
                    "rows_prev": n_prev,
                    "rows_latest": n_latest,
                    "reference_6workers": {
                        "append_s": 7.88,
                        "read_prev_s": 1.55,
                        "read_latest_s": 0.39,
                    },
                }
            )
        )


if __name__ == "__main__":
    main()
