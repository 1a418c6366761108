"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are derived from the engine's query
registry (``delta_lake_pyspark_scd2_spark/plans``): one entry per
implemented operator capability from SURVEY.md §2 plus the
training-data-pipeline extensions. Entries whose semantics are not
SQL-expressible (mapInPandas feature extraction, simhash) have no
oracle and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from delta_lake_pyspark_scd2_spark.plans import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return REGISTRY["q1_pricing_summary"].builder(spark, SF0001)


def _wrap(builder: Callable[[SparkSession, str], DataFrame]):
    """Release the previous query's tracked cache entries before
    building the next one: operators persist shared intermediates
    (dedup signature/shingle tables), and this bounds live cache to one
    query even when many queries run in a single session."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from delta_lake_pyspark_scd2_spark.functions.caching import release_tracked

        release_tracked()
        return builder(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(spec.builder) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
