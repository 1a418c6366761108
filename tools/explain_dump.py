"""Dump ``explain("formatted")`` for benched queries to plans/<tag>/.

Optimization-round deliverable: ``plans/r10/<query>_before.txt`` /
``..._after.txt`` hold the formatted physical plan of every headline
query so plan claims in OPTIMIZATION_r10.md are checkable without
running Spark.

Usage:
    python tools/explain_dump.py <suffix> [sf_dir] [query ...]

e.g. ``python tools/explain_dump.py before /root/testdata/sf0.1`` writes
``plans/r10/<query>_before.txt`` for every bench=True registry entry.
Iterative operators (kmeans, label propagation, Bradley-Terry) execute
their training jobs while the DataFrame is being BUILT; the dumped plan
is the final query plan on top of the last checkpoint, which is the
right artifact for plan-shape review (the per-round shapes are pinned
separately by tools/plan_invariants.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_TAG", "r11"),
)


def main() -> None:
    args = sys.argv[1:]
    suffix = args[0] if args else "before"
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    only = set(args[2:])

    from delta_lake_pyspark_scd2_spark.functions.caching import release_tracked
    from delta_lake_pyspark_scd2_spark.plans import REGISTRY
    from delta_lake_pyspark_scd2_spark.session import get_spark

    spark = get_spark("explain-dump")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, spec in sorted(REGISTRY.items()):
        if not spec.bench or (only and name not in only):
            continue
        release_tracked()
        spark.catalog.clearCache()
        df = spec.builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
