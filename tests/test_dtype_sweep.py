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
