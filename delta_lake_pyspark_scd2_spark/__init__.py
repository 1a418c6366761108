"""delta_lake_pyspark_scd2_spark — a PySpark-native analytics engine.

A fresh, Spark-first re-implementation of the query and data-processing
capabilities of the reference repo ``SamueleCrispino/delta-lake-pyspark-scd2``
(see SURVEY.md), extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design (SURVEY.md §7):
  * No custom IR, no custom parser: the engine is a library of composable
    PySpark DataFrame operators plus declarative table/pipeline specs,
    executed by Catalyst/Tungsten.
  * Two layers: ``operators/`` are pure ``DataFrame -> DataFrame``
    functions (unit-testable, no I/O); ``sources/`` owns I/O including a
    Parquet-backed versioned table (``vtable``) that supplies the
    Delta-Lake-like semantics the reference relies on (ACID-ish manifest
    log, time travel, partition-scoped copy-on-write MERGE) without any
    non-public dependency.
  * ``plans/`` is the query library: every operator capability from
    SURVEY.md §2 is exposed as a named query with a DuckDB oracle.
"""

from delta_lake_pyspark_scd2_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
