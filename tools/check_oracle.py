"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, column names, and
order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
    python tools/check_oracle.py --tail --json=CORRECTNESS_TAIL_r06.json [sf_dir]

``--tail`` checks only registry entries past the driver's 50-query
correctness window; ``--json=PATH`` records per-query results in the
driver's CORRECTNESS format, publishing oracle-green status for
queries the driver window never reaches (round-5 ADVICE).
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
    args = list(sys.argv[1:])
    json_out = None
    tail_only = False
    if "--tail" in args:  # only registry entries past the driver's
        args.remove("--tail")  # 50-query correctness window
        tail_only = True
    for a in list(args):
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
            args.remove(a)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

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
    results: dict[str, dict] = {}

    def _rec(name, **kw):
        results[name] = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None, **kw,
        }

    names = list(REGISTRY)
    if tail_only:
        # the window is DEFINED by _PRIORITY's length, not a literal —
        # a future head resize must move this boundary with it
        from delta_lake_pyspark_scd2_spark.plans import _PRIORITY

        names = names[len(_PRIORITY):]
    for name in names:
        spec = REGISTRY[name]
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
            _rec(name, err=f"spark error: {str(e)[:400]}")
            print(f"FAIL {name}: spark error: {str(e)[:400]}")
            continue
        if spec.oracle is None:
            _rec(name, rows_match="rows_only", spark_rows=len(sdf))
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            _rec(name, err=f"duckdb error: {str(e)[:400]}")
            print(f"FAIL {name}: duckdb error: {str(e)[:400]}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            _rec(name, rows_match=False, spark_rows=len(sdf),
                 oracle_rows=len(odf))
            print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            _rec(name, rows_match=True, schema_match=False,
                 spark_rows=len(sdf), oracle_rows=len(odf))
            print(
                f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            )
            continue
        cs, co = _canon(sdf), _canon(odf)
        if not cs.equals(co):
            neq = (cs != co).any(axis=0)
            bad_cols = list(neq[neq].index)
            failures.append(name)
            _rec(name, rows_match=True, schema_match=True, hash_match=False,
                 spark_rows=len(sdf), oracle_rows=len(odf),
                 err=f"value mismatch in {bad_cols}")
            print(f"FAIL {name}: value mismatch in columns {bad_cols}")
            diff_mask = (cs != co).any(axis=1)
            print(
                pd.concat(
                    [cs[diff_mask].head(3).add_prefix("s_"), co[diff_mask].head(3).add_prefix("o_")],
                    axis=1,
                ).to_string()
            )
            continue
        _rec(name, rows_match=True, schema_match=True, hash_match=True,
             spark_rows=len(sdf), oracle_rows=len(odf))
        print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {json_out} ({len(results)} queries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
