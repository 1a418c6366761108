"""Loaders for the driver-supplied TPC-H-ish parquet tables.

(TESTDATA.md: ``region nation customer supplier part orders lineitem
events documents embeddings`` under ``/root/testdata/sf*/``.)

Scale notes: these are plain ``spark.read.parquet`` scans so Catalyst
gets full predicate pushdown / column pruning / partition discovery.
``DIM_TABLES`` flags the small dimensions every query layer should feed
through ``F.broadcast`` when joined against a fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small enough to broadcast at any SF that fits a dimension in executor
#: memory (region/nation are fixed-size; supplier/part grow slowly).
DIM_TABLES = frozenset({"region", "nation", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Normalize events.ts to a session-TZ TIMESTAMP regardless of how the
    # driver generated the parquet: older corpora store TIMESTAMP(NANOS)
    # (surfaced as long nanos via spark.sql.legacy.parquet.nanosAsLong),
    # newer ones timestamp[us] without TZ (surfaced as TIMESTAMP_NTZ).
    # Session TZ is UTC, so the NTZ cast is epoch-identical to DuckDB's
    # naive-timestamp reading of the same file.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer div: epoch-ns exceeds double precision (2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view for the ``spark.sql`` surface
    (reference does the same per-test: ``test/items_etl_test.py:133``)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
