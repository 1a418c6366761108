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


# Pinned quiet-box reference timings for the calibration probe
# (round-10, measured on this box under the round-5 quiet protocol).
# The probe is DATA-INDEPENDENT — same fixed workload every round — so
# probe_s / REF_S is a pure box-speed factor: divide each query's raw
# time by it to compare round-over-round numbers across host drift
# (rounds 8 and 9 each showed a box-wide ~25% shift on provably
# untouched code that had to be adjudicated by hand; see BENCH_NOTES.md
# round-10 notes for the normalization rule).
SHUFFLE_REF_S = 0.87   # 50M-row range → xxhash64 → 4096-key shuffle agg
CPU_REF_S = 0.105      # 2M-iteration driver-side integer loop


def _calibration_probe(spark, n_runs: int = 3) -> dict:
    """Fixed-seed, data-independent box-speed probe: one Spark
    scan+shuffle+agg workload (dominated by the same JVM codegen /
    shuffle machinery the bench queries use) and one pure-CPU driver
    loop (isolates host CPU contention from Spark overheads). Medians
    over ``n_runs`` warm runs; one untimed warm-up absorbs codegen."""
    from pyspark.sql import functions as F

    spark.sparkContext.setJobDescription("bench:calibration_probe")

    def shuffle_once() -> float:
        t0 = time.time()
        (
            spark.range(0, 50_000_000, 1, 32)
            .select((F.xxhash64("id") % 4096).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum("n").alias("t"))
            .collect()
        )
        return time.time() - t0

    def cpu_once() -> float:
        t0 = time.time()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        return time.time() - t0

    shuffle_once()  # codegen warm-up, untimed
    sh = sorted(round(shuffle_once(), 3) for _ in range(n_runs))
    cp = sorted(round(cpu_once(), 3) for _ in range(n_runs))
    spark.sparkContext.setJobDescription(None)
    return {
        "shuffle_s": sh[len(sh) // 2],
        "cpu_s": cp[len(cp) // 2],
        "shuffle_runs": sh,
        "cpu_runs": cp,
    }


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

    # Box-speed calibration, measured at the start AND the end of the
    # bench so drift WITHIN the run is visible too; the normalizer is
    # the mean of the two medians.
    cal_start = _calibration_probe(spark)
    print(f"# calibration(start): {cal_start}", file=sys.stderr)

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    sc = spark.sparkContext
    for name, spec in bench_specs.items():
        # label the jobs (guide §1.5) so the driver's event logs / UI
        # map stages back to queries without changing what is timed
        sc.setJobDescription(f"bench:{name}:warmup")
        n = spec.builder(spark, sf_dir).count()  # warm-up, untimed
        spark.catalog.clearCache()
        runs = []
        for i in range(n_runs):
            sc.setJobDescription(f"bench:{name}:run{i}")
            t0 = time.time()
            df = spec.builder(spark, sf_dir)
            n = df.count()
            runs.append(round(time.time() - t0, 3))
            # operators persist reusable intermediates; drop them so no
            # run is timed under another's cache
            spark.catalog.clearCache()
        sc.setJobDescription(None)
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
    for i in range(max(1, n_runs)):
        sc.setJobDescription(f"bench:scd2_etl:run{i}")
        with tempfile.TemporaryDirectory() as tmp:
            etl_runs.append(run_volume_bench(spark, sf_dir, f"{tmp}/scd2_events"))
    sc.setJobDescription(None)
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

    cal_end = _calibration_probe(spark)
    print(f"# calibration(end): {cal_end}", file=sys.stderr)
    shuffle_s = round((cal_start["shuffle_s"] + cal_end["shuffle_s"]) / 2, 3)
    cpu_s = round((cal_start["cpu_s"] + cal_end["cpu_s"]) / 2, 3)
    # box-speed factor: >1 = box slower than the pinned quiet-box
    # reference; divide raw query times by it for round-over-round
    # comparison (the bench queries are Spark-bound, so the shuffle
    # probe is the normalizer; cpu_factor disambiguates pure host-CPU
    # contention from JVM/IO effects)
    box_factor = round(shuffle_s / SHUFFLE_REF_S, 3)
    queries_normalized = {
        n: round(t / box_factor, 3) for n, t in timings.items()
    }

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
                # Box-drift calibration (round-9 directive #1): a pinned
                # data-independent probe timed in this same session.
                # normalized = raw / box_factor, where box_factor =
                # shuffle_s / shuffle_ref_s. Compare `queries_normalized`
                # across rounds; a shift that survives normalization is a
                # code regression, one that normalization removes is host
                # drift (the r8/r9 pattern).
                "calibration": {
                    "shuffle_s": shuffle_s,
                    "cpu_s": cpu_s,
                    "shuffle_ref_s": SHUFFLE_REF_S,
                    "cpu_ref_s": CPU_REF_S,
                    "box_factor": box_factor,
                    "cpu_factor": round(cpu_s / CPU_REF_S, 3),
                    "start": cal_start,
                    "end": cal_end,
                },
                "queries_normalized": queries_normalized,
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
