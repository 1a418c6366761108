"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, column names, and
order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]

Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = (
                s.astype("datetime64[us]").astype(str).str.replace(".000000", "", regex=False)
            )
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(
                lambda v: "NaN"
                if v is None or (isinstance(v, float) and math.isnan(v))
                # fold signed zero (-0.0 vs 0.0) before rendering: the
                # engines disagree on abs(-0.0) but SQL `=` treats them
                # equal, so value comparison must too
                else f"{0.0 if v == 0 else v:.9g}"
            )
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: (str(v).replace(".000000", "") if v is not None else "\0NULL")
            )
        else:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from delta_lake_pyspark_scd2_spark.functions.caching import release_tracked
    from delta_lake_pyspark_scd2_spark.plans import REGISTRY
    from delta_lake_pyspark_scd2_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    failures: list[str] = []
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        release_tracked()  # previous query's shared intermediates
        try:
            out = spec.builder(spark, sf_dir)
            try:
                sdf = out.toPandas()
            except Exception:
                # Arrow can't represent far-future sentinels (9999-12-31)
                # in ns; fall back to a collect()-based object frame.
                rows = out.collect()
                sdf = pd.DataFrame(
                    {c: [str(r[c]) for r in rows] for c in out.columns},
                    dtype=object,
                )
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:400]}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:400]}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(
                f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            )
            continue
        cs, co = _canon(sdf), _canon(odf)
        if not cs.equals(co):
            neq = (cs != co).any(axis=0)
            bad_cols = list(neq[neq].index)
            failures.append(name)
            print(f"FAIL {name}: value mismatch in columns {bad_cols}")
            diff_mask = (cs != co).any(axis=1)
            print(
                pd.concat(
                    [cs[diff_mask].head(3).add_prefix("s_"), co[diff_mask].head(3).add_prefix("o_")],
                    axis=1,
                ).to_string()
            )
            continue
        print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
