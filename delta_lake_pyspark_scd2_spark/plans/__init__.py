"""Query library: every capability from SURVEY.md §2 as a named,
oracle-checkable query.

Importing this package populates ``REGISTRY``; ``__spark_entry__.py``
derives its ``queries()`` / ``oracle_sql()`` contract from it.
"""

from delta_lake_pyspark_scd2_spark.plans.registry import REGISTRY, QuerySpec, register

# Populate the registry (import order == presentation order).
from delta_lake_pyspark_scd2_spark.plans import relational  # noqa: E402,F401
from delta_lake_pyspark_scd2_spark.plans import tpch_shapes  # noqa: E402,F401
from delta_lake_pyspark_scd2_spark.plans import scd2_queries  # noqa: E402,F401
from delta_lake_pyspark_scd2_spark.plans import llm_ops  # noqa: E402,F401
from delta_lake_pyspark_scd2_spark.plans import generator_queries  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
