"""Volume-scaling benchmark CLI — the reference's
``infra/scale_size_runner.sh`` experiment (BASELINE.md table 1).

Usage::

    python tools/volume_bench.py 100000 1000000 10000000

Prints one JSON line per size: load/merge durations + merge throughput
for a batch2 run with 50% new keys, directly comparable to the
baseline's volume_scaling_metrics_all.csv rows.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from delta_lake_pyspark_scd2_spark.pipeline.etl_bench import (  # noqa: E402
    run_synthetic_volume_bench,
)
from delta_lake_pyspark_scd2_spark.session import get_spark  # noqa: E402


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000]
    spark = get_spark("volume_bench")
    for n in sizes:
        with tempfile.TemporaryDirectory() as d:
            out = run_synthetic_volume_bench(spark, n, f"{d}/scd2")
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
