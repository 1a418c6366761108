"""Scalar function suite (SURVEY.md §2.8).

Timestamp/date parsing with fallback chains (reference
``src/header_etl.py:89-102``, ``:131-136``), filename batch metadata
(``src/utils/validations_utils.py:54-63``, ``src/items_etl.py:52``),
partition-column derivation (``src/header_etl.py:123-125``). ANSI-safe:
``try_to_timestamp`` instead of relying on lenient-mode NULLs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Reference's header fallback formats (src/header_etl.py:89-102).
DEFAULT_TS_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
)

DEFAULT_DATE_FORMATS = ("M/d/yyyy", "yyyy-MM-dd", "yyyyMMdd")


def parse_ts_fallback(
    col: Column | str, formats: Sequence[str] = DEFAULT_TS_FORMATS
) -> Column:
    """``coalesce(try_to_timestamp(c, fmt1), try_to_timestamp(c, fmt2), …)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats])


def parse_date_fallback(
    col: Column | str, formats: Sequence[str] = DEFAULT_DATE_FORMATS
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        *[F.try_to_timestamp(c, F.lit(fmt)).cast("date") for fmt in formats]
    )


def batch_date_from_filename(pattern: str = r".*_(\d{8})\.\w+$") -> Column:
    """Batch date from the input file name, e.g. ``header_20230121.csv``
    (reference ``date_regex``, src/header_etl.py:25). Returns a DATE."""
    raw = F.regexp_extract(F.input_file_name(), pattern, 1)
    return F.try_to_timestamp(raw, F.lit("yyyyMMdd")).cast("date")


def batch_id(clock: Column | None = None) -> Column:
    """Run identifier ``yyyyMMddHHmmss`` (reference src/header_etl.py:70).
    ``clock`` injectable for deterministic tests (SURVEY.md §7
    non-determinism hygiene)."""
    c = clock if clock is not None else F.current_timestamp()
    return F.date_format(c, "yyyyMMddHHmmss")


def partition_cols_from(
    df: DataFrame, ts_col: str, prefix: str = "valid_from"
) -> DataFrame:
    """Derive ``{prefix}_year/month/day`` partition columns
    (reference src/header_etl.py:123-125). Date-based layout won the
    reference's partitioning experiments (partitioning_strategies.md)
    and keeps partition counts bounded at 100 TB (days × ~suffix)."""
    c = F.col(ts_col)
    return (
        df.withColumn(f"{prefix}_year", F.year(c))
        .withColumn(f"{prefix}_month", F.month(c))
        .withColumn(f"{prefix}_day", F.dayofmonth(c))
    )
