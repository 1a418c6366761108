"""I/O layer: testdata loaders, batch CSV sources, versioned Parquet tables."""

from delta_lake_pyspark_scd2_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
