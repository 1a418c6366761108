"""Run-metrics sink: one flat record per pipeline run, appended to a
header'd CSV directory (reference S11/S13: ``src/utils/write_metrics.py``,
``src/header_etl.py:319-340`` — ``createDataFrame([Row(**run_metrics)])``
+ ``coalesce(1)`` single-file append).

Metrics are driver-side scalars, so the ``coalesce(1)`` the reference
worried about is the natural shape here (one row per run); reading the
directory back gives the full run history for the analysis notebook
use-case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession


def append_run_metrics(spark: SparkSession, metrics: dict, path: str) -> None:
    """Append one run's metrics record (S13 local-row source +
    S11 coalesced CSV sink)."""
    clean = {k: (str(v) if v is not None else None) for k, v in metrics.items()}
    df = spark.createDataFrame([Row(**clean)])
    df.coalesce(1).write.mode("append").option("header", True).csv(path)


def read_run_metrics(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("header", True).csv(path)
