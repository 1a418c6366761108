"""Strict dtype sweep over every registry oracle.

The driver's correctness gate canonicalizes both sides through pandas
before hashing.  Round 1 showed two failure classes that pass a
value-tolerant checker but fail a strict one:

  1. DuckDB types ``SUM(<integer>)`` as HUGEINT; pandas converts HUGEINT
     to float64, so the driver hashes ``2014.0`` against Spark's int64
     ``2014`` and reports a mismatch even though values are identical.
  2. Struct/map output columns arrive in pandas as dicts — unhashable,
     crashing the driver's canonicalizer outright (round-1
     ``f_struct_nested``).

This sweep catches both classes *statically*, without running a single
Spark job or oracle row: the Spark side is the analyzed plan's schema,
the oracle side is DuckDB's ``DESCRIBE`` of the SQL.  Violations:

  * any HUGEINT / UHUGEINT oracle column;
  * any STRUCT/MAP (either side) in the *output* schema;
  * numeric-class mismatch: one side integral, the other floating
    (or exactly one side DECIMAL) for the same column name;
  * column-name set mismatch (cheap to catch here too);
  * pandas-representability (pitfall class #7, round 3): any
    timestamp/date output value outside ``pandas.Timestamp`` ns bounds
    (e.g. a ``9999-12-31`` open-interval sentinel) crashes the driver's
    ``datetime64[ns]`` canonicalizer with ``OutOfBoundsDatetime``.
    Checked with one DuckDB MIN/MAX aggregate per oracle that outputs
    such a column — still zero Spark jobs (rows-only queries have no
    timestamp outputs; pinned in ``tests/test_dtype_sweep.py``).

Usage::

    python tools/dtype_sweep.py [sf_dir]

Exit code 0 iff no violations.  ``tests/test_dtype_sweep.py`` wires this
into pytest so the class can never regress.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB type name -> class
_DUCK_INTEGRAL = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT32 = {"FLOAT"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}
_DUCK_BAD = {"HUGEINT", "UHUGEINT"}

# Spark simpleString prefix -> class
_SPARK_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def _duck_class(t: str) -> str:
    t = t.upper()
    if t in _DUCK_BAD:
        return "HUGEINT"
    if t in _DUCK_INTEGRAL:
        return "integral"
    if t in _DUCK_FLOAT32:
        # float32 formats differently from float64 under repr/%.9g
        # (0.1f -> 0.100000001); keep the split visible.
        return "float32"
    if t in _DUCK_FLOAT:
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith("STRUCT") or t.startswith("MAP") or t.startswith("UNION"):
        return "nested"
    if t.endswith("[]") or t.startswith("LIST"):
        return "list"
    if t in {"VARCHAR", "CHAR", "TEXT"}:
        return "string"
    if t in {"TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP_MS", "TIMESTAMP WITH TIME ZONE"}:
        return "timestamp"
    if t == "DATE":
        return "date"
    return t.lower()  # date, boolean, blob, ...


def _spark_class(dt) -> str:
    s = dt.simpleString()
    base = re.split(r"[(<]", s, 1)[0]
    if base in _SPARK_INTEGRAL:
        return "integral"
    if base == "float":
        return "float32"
    if base in _SPARK_FLOAT:
        return "float"
    if base == "decimal":
        return "decimal"
    if base in {"struct", "map"}:
        return "nested"
    if base == "array":
        return "list"
    if base == "binary":
        return "blob"
    if base in {"timestamp", "timestamp_ntz"}:
        # parquet TIMESTAMPs read as ntz or ltz depending on writer
        # metadata; both canonicalize identically through pandas
        # (driver-green j5/q3 in round 1 had ntz-vs-TIMESTAMP pairs).
        return "timestamp"
    return base  # string, date, boolean


def sweep(sf_dir: str, only: set[str] | None = None) -> list[str]:
    """Return a list of human-readable violation strings (empty = clean)."""
    from delta_lake_pyspark_scd2_spark.plans import REGISTRY
    from delta_lake_pyspark_scd2_spark.session import get_spark

    spark = get_spark("dtype_sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    violations: list[str] = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            out = spec.builder(spark, sf_dir)  # lazy plan; no job
        except Exception as e:  # noqa: BLE001
            violations.append(f"{name}: builder raised: {str(e)[:200]}")
            continue
        spark_types = {f.name: _spark_class(f.dataType) for f in out.schema.fields}
        for col, cls in spark_types.items():
            if cls == "nested":
                violations.append(
                    f"{name}: spark output column {col!r} is struct/map "
                    "(unhashable dict in the driver's canonicalizer)"
                )
        if spec.oracle is None:
            continue
        try:
            desc = con.sql(f"DESCRIBE ({spec.oracle})").fetchall()
        except Exception as e:  # noqa: BLE001
            violations.append(f"{name}: oracle DESCRIBE failed: {str(e)[:200]}")
            continue
        duck_types = {row[0]: _duck_class(row[1]) for row in desc}
        if set(duck_types) != set(spark_types):
            violations.append(
                f"{name}: column sets differ: spark-only="
                f"{sorted(set(spark_types) - set(duck_types))} "
                f"oracle-only={sorted(set(duck_types) - set(spark_types))}"
            )
            continue
        for col, dcls in duck_types.items():
            scls = spark_types[col]
            if dcls == "HUGEINT":
                violations.append(
                    f"{name}: oracle column {col!r} is HUGEINT "
                    "(pandas converts to float64; CAST the SUM to BIGINT)"
                )
            elif dcls == "nested":
                violations.append(f"{name}: oracle column {col!r} is STRUCT/MAP")
            elif (
                ({dcls, scls} <= {"integral", "float", "float32", "decimal"})
                and dcls != scls
            ):
                violations.append(
                    f"{name}: numeric class mismatch on {col!r}: "
                    f"spark={scls} oracle={dcls}"
                )
            elif dcls != scls and "list" not in (dcls, scls):
                # string/timestamp/date/bool cross-mismatches: the driver
                # stringifies both sides, but e.g. timestamp-vs-string can
                # format differently — flag them.
                violations.append(
                    f"{name}: type class mismatch on {col!r}: "
                    f"spark={scls} oracle={dcls}"
                )
        violations.extend(_pandas_bounds_violations(con, name, spec, duck_types))
    return violations


def _pandas_bounds_violations(con, name: str, spec, duck_types: dict) -> list[str]:
    """Pitfall class #7: values a pandas ``datetime64[ns]`` cannot hold.

    The driver canonicalizes both result sides through pandas before
    hashing; any timestamp (or date, which some paths coerce to
    datetime64) outside ``pd.Timestamp.min``..``pd.Timestamp.max``
    (1677-09-21 .. 2262-04-11) raises ``OutOfBoundsDatetime`` there —
    round 3 lost ``scd2_intervalize``/``scd2_late_rebuild`` to the
    9999-12-31 open-interval sentinel this way.  One MIN/MAX aggregate
    per affected oracle proves the value range is representable.
    """
    from datetime import datetime

    temporal = [c for c, cls in duck_types.items() if cls in {"timestamp", "date"}]
    if not temporal:
        return []
    aggs = ", ".join(
        f'min("{c}") AS "min_{c}", max("{c}") AS "max_{c}"' for c in temporal
    )
    try:
        row = con.sql(f"SELECT {aggs} FROM ({spec.oracle}) q").fetchone()
    except Exception as e:  # noqa: BLE001
        return [f"{name}: temporal-bounds probe failed: {str(e)[:200]}"]
    out: list[str] = []
    # conservative inner bounds of pandas Timestamp (ns): true limits are
    # 1677-09-21 00:12:43 .. 2262-04-11 23:47:16; whole-day inner bounds
    # avoid the lossy to_pydatetime() warning and no real data sits there.
    lo, hi = datetime(1677, 9, 22), datetime(2262, 4, 11)
    for i, c in enumerate(temporal):
        for label, v in (("min", row[2 * i]), ("max", row[2 * i + 1])):
            if v is None:
                continue
            if hasattr(v, "hour"):  # datetime
                bad = not (lo <= v.replace(tzinfo=None) <= hi)
            else:  # datetime.date — midnight of both bounds is
                # representable, so the bounds themselves are valid
                bad = not (lo.date() <= v <= hi.date())
            if bad:
                out.append(
                    f"{name}: {label}({c!r}) = {v} exceeds pandas "
                    "datetime64[ns] bounds (driver canonicalizer would raise "
                    "OutOfBoundsDatetime; project as a formatted string or "
                    "NULL-when-open)"
                )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) or None
    violations = sweep(sf_dir, only)
    for v in violations:
        print(f"VIOLATION {v}")
    print(f"\n{len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
