"""Registry mapping query names to (Spark builder, DuckDB oracle) pairs.

Contract (driver's ``__spark_entry__.py``): for each name, the Spark
builder ``(spark, sf_dir) -> DataFrame`` and an equivalent ANSI-SQL
string DuckDB can run over the same parquet tables. Column names must
match exactly; computed columns are aliased identically on both sides.
``oracle=None`` marks genuinely non-SQL-expressible ops (weaker
rows-only driver check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", bench: bool = False):
    """Decorator: register a query builder with its DuckDB oracle."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, bench)
        return fn

    return deco
