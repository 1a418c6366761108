"""Pin the strict-dtype invariant for every registry oracle.

Round 1 lost two driver rows to DuckDB HUGEINT→float64 coercion and one
to an unhashable struct output (`VERDICT.md` What's wrong #1/#2).  This
test runs `tools/dtype_sweep.sweep` — a static schema/DESCRIBE check, no
Spark jobs — so the class cannot regress: no HUGEINT oracle columns, no
struct/map outputs, no integral-vs-float class splits between a query
and its oracle.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from dtype_sweep import sweep  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_registry_oracles_strict_dtypes():
    violations = sweep(SF_DIR)
    assert violations == [], "\n".join(violations)


def test_rows_only_queries_have_no_temporal_outputs():
    """The sweep's pandas-bounds probe (pitfall #7) runs on the ORACLE
    side only; that covers everything iff no rows-only query outputs a
    timestamp/date column. Pin that assumption."""
    from delta_lake_pyspark_scd2_spark.plans import REGISTRY
    from delta_lake_pyspark_scd2_spark.session import get_spark

    spark = get_spark("dtype_sweep_test")
    offenders = []
    for name, spec in REGISTRY.items():
        if spec.oracle is not None:
            continue
        out = spec.builder(spark, SF_DIR)
        temporal = [
            f.name
            for f in out.schema.fields
            if f.dataType.simpleString().startswith(("timestamp", "date"))
        ]
        if temporal:
            offenders.append((name, temporal))
    assert offenders == [], offenders


def test_bounds_probe_flags_sentinel():
    """The probe must go red if anyone re-projects the 9999-12-31
    open-interval sentinel as a raw TIMESTAMP (round-3 regression)."""
    from dtype_sweep import _pandas_bounds_violations

    import duckdb

    class FakeSpec:
        oracle = "SELECT TIMESTAMP '9999-12-31 00:00:00' AS valid_to"

    con = duckdb.connect()
    v = _pandas_bounds_violations(
        con, "fake", FakeSpec(), {"valid_to": "timestamp"}
    )
    assert len(v) == 2  # min and max both out of bounds
    assert "OutOfBoundsDatetime" in v[0]
