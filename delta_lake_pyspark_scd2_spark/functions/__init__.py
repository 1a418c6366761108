from delta_lake_pyspark_scd2_spark.functions.scalars import (
    batch_date_from_filename,
    batch_id,
    parse_date_fallback,
    parse_ts_fallback,
    partition_cols_from,
)

__all__ = [
    "batch_date_from_filename",
    "batch_id",
    "parse_date_fallback",
    "parse_ts_fallback",
    "partition_cols_from",
]
