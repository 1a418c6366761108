"""Benchmark harness (driver contract).

Runs the headline queries (registry entries flagged ``bench=True``) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed twice: a warm-up of the session on the first
query only (JVM/codegen warm-up is session-wide), then every query is
timed with a full materialization (count of a cached-free plan) so scan
+ shuffle + agg costs are all included.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from delta_lake_pyspark_scd2_spark.plans import REGISTRY
    from delta_lake_pyspark_scd2_spark.session import get_spark

    spark = get_spark("bench")
    bench_specs = {n: s for n, s in REGISTRY.items() if s.bench}

    # Session warm-up (JIT, codegen, parquet footer caches) + Python
    # worker pool spin-up (numpy/pandas import in each Arrow worker —
    # a one-time session cost, not a per-query cost; workers are reused).
    next(iter(bench_specs.values())).builder(spark, sf_dir).limit(1).count()
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def __warm(x: pd.Series) -> pd.Series:
        import numpy as np

        return x * np.float64(1.0)

    spark.range(0, 3200).repartition(32).select(
        __warm(F.col("id").cast("double"))
    ).count()

    # Per query: one untimed warm-up run (first execution of a heavy
    # plan pays one-time JIT/codegen compilation — measured 2-4x on the
    # higher-order-expression queries, session noise, not operator
    # cost), then N timed warm runs reported as the MEDIAN. This box
    # swings ±25% run-to-run, so a min-of-2 made round-over-round
    # deltas meaningless; medians over >=3 warm runs plus the full run
    # list give future rounds a real signal. Caches are cleared between
    # runs so data work is fully repeated.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name, spec in bench_specs.items():
        n = spec.builder(spark, sf_dir).count()  # warm-up, untimed
        spark.catalog.clearCache()
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            df = spec.builder(spark, sf_dir)
            n = df.count()
            runs.append(round(time.time() - t0, 3))
            # operators persist reusable intermediates; drop them so no
            # run is timed under another's cache
            spark.catalog.clearCache()
        all_runs[name] = runs
        timings[name] = sorted(runs)[len(runs) // 2]
        print(
            f"# {name}: median {timings[name]}s of {runs} ({n} rows)",
            file=sys.stderr,
        )

    # SCD2 ETL volume run (the reference's headline baseline: batch2
    # merge duration, BASELINE.md volume-scaling table).
    import tempfile

    from delta_lake_pyspark_scd2_spark.pipeline.etl_bench import run_volume_bench

    # Median of three full rebuilds (fresh table dir each): the ETL
    # numbers are the baseline-graded ones and single runs swing ±30%
    # with machine noise at this duration.
    etl_runs = []
    for _ in range(max(1, n_runs)):
        with tempfile.TemporaryDirectory() as tmp:
            etl_runs.append(run_volume_bench(spark, sf_dir, f"{tmp}/scd2_events"))
    etl_runs.sort(key=lambda r: r["scd2_etl_load"] + r["scd2_etl_merge"])
    etl = etl_runs[len(etl_runs) // 2]
    all_runs["scd2_etl_load"] = [r["scd2_etl_load"] for r in etl_runs]
    all_runs["scd2_etl_merge"] = [r["scd2_etl_merge"] for r in etl_runs]
    timings["scd2_etl_load"] = etl["scd2_etl_load"]
    timings["scd2_etl_merge"] = etl["scd2_etl_merge"]
    print(
        f"# scd2_etl: load {etl['scd2_etl_load']}s, merge {etl['scd2_etl_merge']}s "
        f"({etl['rows_batch2']} rows, {etl['merge_rows_per_s']} rows/s)",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": all_runs,  # every timed run, for spread analysis
                "sf": sf_val,
                # Measured noise floor of this box (BENCH_NOTES.md,
                # round-5 controlled re-measure): per-query medians-of-3
                # are only comparable round-over-round to ~±25%; the
                # run-time distribution is heavy-tailed even warm and
                # uncontended. Compare against the full `runs` spreads,
                # not single medians.
                "noise_floor": {
                    "single_query_band_pct": 25,
                    "detail": "BENCH_NOTES.md",
                },
                # Direct comparison to the reference's headline number
                # (BASELINE.md volume-scaling): full batch2 ETL run at
                # 100k rows took 43.96 s on its 6-worker cluster; ours
                # is the events-table load+merge at sf0.1 (= 100k rows)
                # on one local[32] node.
                "baseline": {
                    "scd2_etl_total_s": round(
                        etl["scd2_etl_load"] + etl["scd2_etl_merge"], 3
                    ),
                    # methodology, machine-readable: the local number is
                    # the median over fresh rebuilds; the reference
                    # figure is a single published run.
                    "selection": f"median_of_{len(etl_runs)}",
                    "reference_100k_6workers_s": 43.96,
                    "reference_selection": "single_run",
                    "merge_rows_per_s": etl["merge_rows_per_s"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
