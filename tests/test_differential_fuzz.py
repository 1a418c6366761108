"""Differential fuzzing: randomized filter/group-by/join queries built
from a small grammar, executed twice — once through this engine's
DataFrame composition and once as SQL in DuckDB over the same parquet —
and compared row-for-row.

This extends the oracle gate beyond the 100+ hand-written registry
queries: hypothesis explores the predicate/aggregate lattice (operator
interactions, empty groups, empty results, join + filter orderings)
that enumerated tests never cover. Floating aggregates compare with a
relative tolerance (summation order differs between engines); integer
and count aggregates compare exactly.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

# -- grammar ----------------------------------------------------------------

# (name, spark_builder, sql_fragment) per predicate; values chosen from
# the real column domains so every predicate is satisfiable-but-selective.
PREDICATES = [
    ("qty_lo", lambda: F.col("l_quantity") > 25, "l_quantity > 25"),
    ("qty_hi", lambda: F.col("l_quantity") <= 10, "l_quantity <= 10"),
    ("flag_a", lambda: F.col("l_returnflag") == "A", "l_returnflag = 'A'"),
    ("flag_ne", lambda: F.col("l_returnflag") != "N", "l_returnflag <> 'N'"),
    ("status_o", lambda: F.col("l_linestatus") == "O", "l_linestatus = 'O'"),
    ("disc", lambda: F.col("l_discount") >= 0.05, "l_discount >= 0.05"),
    ("tax", lambda: F.col("l_tax") < 0.04, "l_tax < 0.04"),
    (
        "ship",
        lambda: F.col("l_shipdate") >= "1995-06-01",
        "l_shipdate >= DATE '1995-06-01'",
    ),
    ("price", lambda: F.col("l_extendedprice") < 30000.0, "l_extendedprice < 30000.0"),
    ("part_mod", lambda: F.col("l_partkey") % 7 == 0, "l_partkey % 7 = 0"),
]

GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]

# (alias, spark_column_builder, sql_expr, exact?)
AGGREGATES = [
    ("n_rows", lambda: F.count(F.lit(1)), "COUNT(*)", True),
    ("sum_qty", lambda: F.sum("l_quantity"), "SUM(l_quantity)", False),
    ("avg_disc", lambda: F.avg("l_discount"), "AVG(l_discount)", False),
    ("min_price", lambda: F.min("l_extendedprice"), "MIN(l_extendedprice)", True),
    ("max_tax", lambda: F.max("l_tax"), "MAX(l_tax)", True),
    (
        "n_parts",
        lambda: F.count_distinct(F.col("l_partkey")),
        "COUNT(DISTINCT l_partkey)",
        True,
    ),
    ("min_ship", lambda: F.min("l_shipdate"), "MIN(l_shipdate)", True),
]

ORDER_PREDS = [
    ("urgent", lambda: F.col("o_orderpriority") == "1-URGENT", "o_orderpriority = '1-URGENT'"),
    ("open", lambda: F.col("o_orderstatus") == "O", "o_orderstatus = 'O'"),
    ("big", lambda: F.col("o_totalprice") > 100000.0, "o_totalprice > 100000.0"),
]

query_strategy = st.fixed_dictionaries(
    {
        "preds": st.lists(
            st.sampled_from(range(len(PREDICATES))), unique=True, max_size=3
        ),
        "groups": st.lists(
            st.sampled_from(GROUP_COLS), unique=True, max_size=2
        ),
        "aggs": st.lists(
            st.sampled_from(range(len(AGGREGATES))),
            unique=True,
            min_size=1,
            max_size=3,
        ),
        "join": st.one_of(
            st.none(),
            st.tuples(
                st.sampled_from(["inner", "left"]),
                st.sampled_from(range(len(ORDER_PREDS))),
            ),
        ),
    }
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
    )
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    yield con
    con.close()


def _approx_eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(q=query_strategy)
def test_random_query_matches_duckdb(q, spark, ddb):
    li = load_table(spark, SF, "lineitem")
    df = li
    where_sql: list[str] = []
    for i in q["preds"]:
        _, build, frag = PREDICATES[i]
        df = df.filter(build())
        where_sql.append(frag)
    from_sql = "lineitem"
    if q["join"] is not None:
        how, oi = q["join"]
        _, obuild, ofrag = ORDER_PREDS[oi]
        orders = load_table(spark, SF, "orders").filter(obuild())
        df = df.join(orders, df.l_orderkey == orders.o_orderkey, how)
        if how == "inner":
            from_sql = "lineitem JOIN orders ON l_orderkey = o_orderkey"
            where_sql.append(ofrag)
        else:
            # LEFT: the dim predicate must live in the ON clause — in
            # WHERE it would silently turn the join inner (the classic
            # outer-join trap; both engines must agree on null rows)
            from_sql = (
                "lineitem LEFT JOIN orders ON l_orderkey = o_orderkey "
                f"AND {ofrag}"
            )

    agg_cols = []
    agg_sql = []
    exact_flags = {}
    for i in q["aggs"]:
        alias, build, frag, exact = AGGREGATES[i]
        agg_cols.append(build().alias(alias))
        agg_sql.append(f"{frag} AS {alias}")
        exact_flags[alias] = exact

    groups = q["groups"]
    if groups:
        df = df.groupBy(*groups).agg(*agg_cols)
        sql = (
            f"SELECT {', '.join(groups + agg_sql)} FROM {from_sql}"
            + (f" WHERE {' AND '.join(where_sql)}" if where_sql else "")
            + f" GROUP BY {', '.join(groups)}"
        )
    else:
        df = df.agg(*agg_cols)
        sql = (
            f"SELECT {', '.join(agg_sql)} FROM {from_sql}"
            + (f" WHERE {' AND '.join(where_sql)}" if where_sql else "")
        )

    got = {
        tuple(str(r[g]) for g in groups): r
        for r in df.collect()
    }
    exp_rows = ddb.execute(sql).fetchall()
    exp_names = [d[0] for d in ddb.description]
    exp = {
        tuple(str(row[exp_names.index(g)]) for g in groups): row
        for row in exp_rows
    }

    # DuckDB's global COUNT over zero rows yields one row (0 / NULLs);
    # Spark's agg over zero rows does too — keys must line up either way.
    assert set(got) == set(exp), f"group keys diverge for:\n{sql}"
    for key, r in got.items():
        row = exp[key]
        for alias in exact_flags:
            a, b = r[alias], row[exp_names.index(alias)]
            if exact_flags[alias]:
                assert str(a) == str(b) or _approx_eq(a, b), (
                    f"{alias} mismatch for {key}: {a!r} != {b!r}\n{sql}"
                )
            else:
                assert _approx_eq(a, b), (
                    f"{alias} mismatch for {key}: {a!r} != {b!r}\n{sql}"
                )


# -- window-function fuzzing -------------------------------------------------

WINDOW_FNS = [
    # (alias, spark_builder(order?), sql_template, needs_order, exact?)
    (
        "rn",
        lambda: F.row_number(),
        "ROW_NUMBER() OVER ({ps} {os})",
        True,
        True,
    ),
    (
        "rnk",
        lambda: F.rank(),
        "RANK() OVER ({ps} {os})",
        True,
        True,
    ),
    (
        "prev_qty",
        lambda: F.lag("l_quantity"),
        "LAG(l_quantity) OVER ({ps} {os})",
        True,
        True,
    ),
    (
        "part_sum",
        lambda: F.sum("l_quantity"),
        "SUM(l_quantity) OVER ({ps})",
        False,
        False,
    ),
    (
        "run_sum",
        lambda: F.sum("l_quantity"),
        "SUM(l_quantity) OVER ({ps} {os} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        True,
        False,
    ),
]

WINDOW_PARTS = ["l_returnflag", "l_linestatus", "l_linenumber"]

window_strategy = st.fixed_dictionaries(
    {
        "part": st.sampled_from(WINDOW_PARTS),
        "fn": st.sampled_from(range(len(WINDOW_FNS))),
        "pred": st.one_of(st.none(), st.sampled_from(range(len(PREDICATES)))),
    }
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(q=window_strategy)
def test_random_window_query_matches_duckdb(q, spark, ddb):
    """Window functions compared as sorted multisets of output rows.

    The synthetic lineitem has no unique key — (l_orderkey,
    l_linenumber) collides — so the ORDER BY tie-breaks through every
    scalar column. Rows that still tie are full duplicates, and any
    permutation of identical rows yields the same output multiset, so
    multiset comparison is exact even where per-row attachment is
    engine-dependent. row_number/rank/lag compare exactly, frame sums
    with float tolerance."""
    from pyspark.sql import Window

    alias, build, tmpl, needs_order, exact = WINDOW_FNS[q["fn"]]
    part = q["part"]
    order_cols = [
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_partkey",
        "l_suppkey",
        "l_discount",
        "l_tax",
    ]
    ps = f"PARTITION BY {part}"
    os_ = "ORDER BY " + ", ".join(order_cols) if needs_order else ""

    li = load_table(spark, SF, "lineitem")
    where_sql = ""
    if q["pred"] is not None:
        _, pbuild, pfrag = PREDICATES[q["pred"]]
        li = li.filter(pbuild())
        where_sql = f" WHERE {pfrag}"

    w = Window.partitionBy(part)
    if needs_order:
        w = w.orderBy(*order_cols)
        if alias == "run_sum":
            w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = li.select(
        "l_orderkey", "l_linenumber", build().over(w).alias(alias)
    )
    sql = (
        f"SELECT l_orderkey, l_linenumber, {tmpl.format(ps=ps, os=os_)} AS {alias} "
        f"FROM lineitem{where_sql}"
    )

    def norm(rows):
        return sorted(
            ((a, b, v) for a, b, v in rows),
            key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0),
        )

    got = norm((r.l_orderkey, r.l_linenumber, r[alias]) for r in df.collect())
    exp = norm(ddb.execute(sql).fetchall())
    assert len(got) == len(exp), f"row counts diverge for:\n{sql}"
    for (ga, gb, gv), (ea, eb, ev) in zip(got, exp):
        assert (ga, gb) == (ea, eb), f"row keys diverge for:\n{sql}"
        if exact:
            assert gv == ev, f"{alias} mismatch at {(ga, gb)}: {gv!r} != {ev!r}\n{sql}"
        else:
            assert _approx_eq(gv, ev), (
                f"{alias} mismatch at {(ga, gb)}: {gv!r} != {ev!r}\n{sql}"
            )


# -- set-operation fuzzing ---------------------------------------------------

SETOP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]

SETOPS = [
    # (name, spark_combiner, sql_keyword)
    ("union_all", lambda a, b: a.unionAll(b), "UNION ALL"),
    ("union", lambda a, b: a.union(b).distinct(), "UNION"),
    ("intersect", lambda a, b: a.intersect(b), "INTERSECT"),
    ("intersect_all", lambda a, b: a.intersectAll(b), "INTERSECT ALL"),
    # NOTE: SQL EXCEPT is SET semantics (a row present in B at all is
    # removed), NOT exceptAll().distinct() (which keeps a row whose A
    # multiplicity exceeds its B multiplicity) — caught by this very fuzz.
    ("except", lambda a, b: a.subtract(b), "EXCEPT"),
    ("except_all", lambda a, b: a.exceptAll(b), "EXCEPT ALL"),
]

setop_strategy = st.fixed_dictionaries(
    {
        "op": st.sampled_from(range(len(SETOPS))),
        "p1": st.lists(
            st.sampled_from(range(len(PREDICATES))), unique=True, max_size=2
        ),
        "p2": st.lists(
            st.sampled_from(range(len(PREDICATES))), unique=True, max_size=2
        ),
    }
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(q=setop_strategy)
def test_random_setop_matches_duckdb(q, spark, ddb):
    """UNION/INTERSECT/EXCEPT (ALL and DISTINCT) of two filtered
    branches over the same table, compared as sorted row lists."""
    _, combine, kw = SETOPS[q["op"]]

    def branch(pred_ixs):
        df = load_table(spark, SF, "lineitem")
        frags = []
        for i in pred_ixs:
            _, build, frag = PREDICATES[i]
            df = df.filter(build())
            frags.append(frag)
        where = f" WHERE {' AND '.join(frags)}" if frags else ""
        cols = ", ".join(SETOP_COLS)
        return df.select(*SETOP_COLS), f"SELECT {cols} FROM lineitem{where}"

    a, sql_a = branch(q["p1"])
    b, sql_b = branch(q["p2"])
    df = combine(a, b)
    sql = f"({sql_a}) {kw} ({sql_b})"

    got = sorted(tuple(r) for r in df.collect())
    exp = sorted(tuple(r) for r in ddb.execute(sql).fetchall())
    assert got == exp, f"set-op rows diverge for:\n{sql}"


# -- subquery fuzzing (EXISTS / NOT EXISTS / scalar) -------------------------

subquery_strategy = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["exists", "not_exists", "scalar_gt", "in"]),
        "inner_pred": st.sampled_from(range(len(PREDICATES))),
        "outer_pred": st.one_of(st.none(), st.sampled_from(range(len(ORDER_PREDS)))),
    }
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(q=subquery_strategy)
def test_random_subquery_matches_duckdb(q, spark, ddb):
    """Correlated EXISTS / NOT EXISTS / IN over orders→lineitem (Spark:
    left_semi / left_anti), and an uncorrelated scalar-aggregate
    comparison (Spark: broadcast one-row agg). Output = count + a
    checksum-ish grouped count per orderstatus, exact."""
    _, ibuild, ifrag = PREDICATES[q["inner_pred"]]
    orders = load_table(spark, SF, "orders")
    owhere = ""
    if q["outer_pred"] is not None:
        _, obuild, ofrag = ORDER_PREDS[q["outer_pred"]]
        orders = orders.filter(obuild())
        owhere = f" AND {ofrag}"

    li = load_table(spark, SF, "lineitem").filter(ibuild())
    if q["kind"] in ("exists", "not_exists", "in"):
        how = "left_anti" if q["kind"] == "not_exists" else "left_semi"
        df = orders.join(li, orders.o_orderkey == li.l_orderkey, how)
        op = {
            "exists": "EXISTS",
            "not_exists": "NOT EXISTS",
            "in": "EXISTS",  # IN (SELECT key ...) ≡ correlated EXISTS here
        }[q["kind"]]
        sub = f"SELECT 1 FROM lineitem WHERE {ifrag} AND l_orderkey = o_orderkey"
        if q["kind"] == "in":
            sub = None
            sql_pred = f"o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE {ifrag})"
        else:
            sql_pred = f"{op} ({sub})"
        sql = (
            "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
            f"WHERE {sql_pred}{owhere} GROUP BY o_orderstatus"
        )
        out = df.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    else:  # scalar_gt: price above the filtered average
        avg = li.agg(F.avg("l_extendedprice").alias("__avg"))
        out = (
            orders.crossJoin(F.broadcast(avg))
            .filter(F.col("o_totalprice") > F.col("__avg"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        sql = (
            "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
            f"WHERE o_totalprice > (SELECT AVG(l_extendedprice) FROM lineitem "
            f"WHERE {ifrag}){owhere} GROUP BY o_orderstatus"
        )

    got = sorted((r.o_orderstatus, r.n) for r in out.collect())
    exp = sorted(tuple(r) for r in ddb.execute(sql).fetchall())
    assert got == exp, f"subquery result diverges for:\n{sql}"


# -- null-heavy aggregation fuzzing ------------------------------------------

EVENT_PREDS = [
    ("vnull", lambda: F.col("value").isNull(), "value IS NULL"),
    ("vnn", lambda: F.col("value").isNotNull(), "value IS NOT NULL"),
    ("vlow", lambda: F.col("value") < 10.0, "value < 10.0"),
    ("etype", lambda: F.col("event_type") == "error", "event_type = 'error'"),
    (
        "null_or_hi",
        lambda: F.col("value").isNull() | (F.col("value") > 90.0),
        "(value IS NULL OR value > 90.0)",
    ),
]

# (alias, spark, sql, exact) — COUNT(col) skips nulls, SUM of all-null
# is NULL, AVG ignores nulls: the exact semantics both engines must share.
EVENT_AGGS = [
    ("n_all", lambda: F.count(F.lit(1)), "COUNT(*)", True),
    ("n_val", lambda: F.count("value"), "COUNT(value)", True),
    ("sum_val", lambda: F.sum("value"), "SUM(value)", False),
    ("avg_val", lambda: F.avg("value"), "AVG(value)", False),
    ("min_val", lambda: F.min("value"), "MIN(value)", True),
    (
        "n_null",
        lambda: F.sum(F.col("value").isNull().cast("long")),
        "CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)",
        True,
    ),
    (
        "n_users_null_val",
        lambda: F.count_distinct(F.when(F.col("value").isNull(), F.col("user_id"))),
        "COUNT(DISTINCT CASE WHEN value IS NULL THEN user_id END)",
        True,
    ),
]

nullagg_strategy = st.fixed_dictionaries(
    {
        "preds": st.lists(
            st.sampled_from(range(len(EVENT_PREDS))), unique=True, max_size=2
        ),
        "aggs": st.lists(
            st.sampled_from(range(len(EVENT_AGGS))),
            unique=True,
            min_size=1,
            max_size=4,
        ),
        "group": st.booleans(),
    }
)


@pytest.fixture(scope="module")
def ddb_events():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    yield con
    con.close()


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(q=nullagg_strategy)
def test_random_nullheavy_agg_matches_duckdb(q, spark, ddb_events):
    """Aggregation over the null-bearing events.value column: NULL
    skipping in COUNT(col)/AVG, NULL results of SUM over empty/all-null
    groups, IS NULL predicates, conditional distinct counts."""
    ev = load_table(spark, SF, "events")
    where_sql: list[str] = []
    for i in q["preds"]:
        _, build, frag = EVENT_PREDS[i]
        ev = ev.filter(build())
        where_sql.append(frag)

    agg_cols, agg_sql, exact_flags = [], [], {}
    for i in q["aggs"]:
        alias, build, frag, exact = EVENT_AGGS[i]
        agg_cols.append(build().alias(alias))
        agg_sql.append(f"{frag} AS {alias}")
        exact_flags[alias] = exact

    where = f" WHERE {' AND '.join(where_sql)}" if where_sql else ""
    if q["group"]:
        df = ev.groupBy("event_type").agg(*agg_cols)
        sql = (
            f"SELECT event_type, {', '.join(agg_sql)} FROM events{where} "
            "GROUP BY event_type"
        )
        got = {r.event_type: r for r in df.collect()}
        rows = ddb_events.execute(sql).fetchall()
        names = [d[0] for d in ddb_events.description]
        exp = {row[0]: row for row in rows}
    else:
        df = ev.agg(*agg_cols)
        sql = f"SELECT {', '.join(agg_sql)} FROM events{where}"
        got = {None: df.collect()[0]}
        rows = ddb_events.execute(sql).fetchall()
        names = [d[0] for d in ddb_events.description]
        exp = {None: rows[0]}

    assert set(got) == set(exp), f"group keys diverge for:\n{sql}"
    for key, r in got.items():
        for alias, exact in exact_flags.items():
            a, b = r[alias], exp[key][names.index(alias)]
            if exact:
                assert str(a) == str(b) or _approx_eq(a, b), (
                    f"{alias} mismatch for {key}: {a!r} != {b!r}\n{sql}"
                )
            else:
                assert _approx_eq(a, b), (
                    f"{alias} mismatch for {key}: {a!r} != {b!r}\n{sql}"
                )
