"""Relational operator inventory (SURVEY.md §2.1-2.9) as named queries.

Each query = a Spark DataFrame builder + an exactly-equivalent DuckDB
oracle. Numeric determinism rules used throughout (so the driver's
value-hash matches):
  * money sums go through ``DECIMAL(18,2)`` (exact, order-independent)
    and are emitted as ``ROUND(..., 2)`` doubles on both sides;
  * ratios/products are rounded to a fixed scale;
  * every LIMIT/top-k has a total ordering (unique-key tiebreak);
  * timestamps ride UTC on both engines.

Scale annotations are inline; the general rules: filters/projections
push into the parquet scan, dimension sides of joins are broadcast,
aggregations keep map-side partials, windows shuffle once on their
partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_pyspark_scd2_spark.operators.ranking import (
    distributed_total_rank,
    ntile_from_rank,
    percent_rank_from_rank,
)
from delta_lake_pyspark_scd2_spark.plans.registry import register
from delta_lake_pyspark_scd2_spark.sources.tables import load_table


def dec_sum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent money sum: cast to decimal, sum exactly, round,
    emit double (matches ``CAST(ROUND(SUM(CAST(x AS DECIMAL(18,2))),2) AS
    DOUBLE)`` in DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.round(F.sum(c.cast(T.DecimalType(18, 2))), scale)
        .cast("double")
        .alias(alias)
    )


def _dsum(expr: str, alias: str) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,2))), 2) AS DOUBLE) AS {alias}"


# ---------------------------------------------------------------------------
# Aggregations (reference §2.4) — flagship TPC-H-Q1-shaped summary.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity', 'sum_qty')},
           {_dsum('l_extendedprice', 'sum_base_price')},
           CAST(ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(25,4))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,2))), 4) AS DOUBLE) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Hash aggregate with multiple metrics (A1-A4); filter pushed to scan.",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast(T.DecimalType(25, 4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.avg(F.col("l_quantity").cast(T.DecimalType(18, 2))), 4)
            .cast("double")
            .alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Scans / sources (reference §2.1).
# ---------------------------------------------------------------------------


@register(
    "s1_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="Pipe-delimited CSV sink + explicit-schema CSV scan "
    "(reference S1/S12, src/header_etl.py:64-66).",
)
def s1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from delta_lake_pyspark_scd2_spark.plans.scratch import scratch_path

    nation = load_table(spark, sf_dir, "nation")
    # hashlib, not hash(): str hash is salted per process, which leaked
    # one scratch dir per run
    out = scratch_path(
        f"s1_csv_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    )
    (
        nation.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("sep", "|")
        .csv(out)
    )
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return (
        spark.read.option("header", "true")
        .option("sep", "|")
        .schema(schema)
        .csv(out)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates (reference §2.2).
# ---------------------------------------------------------------------------


@register(
    "p1_projection_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 50000.0
    """,
    doc="Projection narrowing + compound predicate (P1/P4); both push "
    "into the parquet scan (PushedFilters + 3-column ReadSchema).",
)
def p1_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 50000.0)
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "p6_null_safe_compare",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN (CASE WHEN event_type = 'error' THEN NULL ELSE event_type END)
                         IS NOT DISTINCT FROM
                        (CASE WHEN value < 10.0 THEN NULL ELSE event_type END)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_null_safe_eq,
           COUNT(*) AS n_total
    FROM events
    GROUP BY event_type
    """,
    doc="Null-safe equality <=> (P6, src/header_etl.py:189-194): "
    "NULL==NULL counts as equal.",
)
def p6_null_safe_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = F.when(F.col("event_type") == "error", None).otherwise(F.col("event_type"))
    b = F.when(F.col("value") < 10.0, None).otherwise(F.col("event_type"))
    return ev.groupBy("event_type").agg(
        F.sum(a.eqNullSafe(b).cast("int")).alias("n_null_safe_eq"),
        F.count(F.lit(1)).alias("n_total"),
    )


@register(
    "p9_conditional_bucket",
    oracle="""
    SELECT CASE WHEN value < 10 THEN 'low'
                WHEN value < 50 THEN 'mid'
                ELSE 'high' END AS bucket,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="when/otherwise conditional column (P9) + aggregation.",
)
def p9_conditional_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 10, "low")
        .when(F.col("value") < 50, "mid")
        .otherwise("high")
    )
    return (
        ev.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("value", "sum_value"))
    )


# ---------------------------------------------------------------------------
# Joins (reference §2.3).
# ---------------------------------------------------------------------------


@register(
    "j1_join_agg",
    oracle=f"""
    SELECT c.c_mktsegment, COUNT(*) AS n_orders,
           {_dsum('o.o_totalprice', 'sum_price')}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Inner equi-join on business key (J1) + aggregate; Catalyst "
    "broadcasts the customer side under the 64MB threshold.",
    bench=True,
)
def j1_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), dec_sum("o_totalprice", "sum_price"))
    )


@register(
    "j2_theta_residual",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_late
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderpriority
    """,
    doc="Equi-join + theta residual predicate (J2, src/items_etl.py:97-100).",
)
def j2_theta_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


@register(
    "j4_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Anti-join / orphan detection (J4, test/items_etl_test.py:175-185) "
    "as idiomatic left_anti instead of LEFT JOIN + IS NULL.",
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "j7_semi_join",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Semi-join (EXISTS) — completes the join family beyond the reference.",
)
def j7_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


@register(
    "j5_multikey_join",
    oracle="""
    WITH firsts AS (
      SELECT l_orderkey, MIN(l_shipdate) AS first_ship FROM lineitem GROUP BY l_orderkey
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate
    FROM lineitem l
    JOIN firsts f ON l.l_orderkey = f.l_orderkey AND l.l_shipdate = f.first_ship
    """,
    doc="Composite-key equi-join (J5, test/items_etl_test.py:179-183): "
    "earliest-shipped line items per order.",
)
def j5_multikey_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").alias("l")
    firsts = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("f_orderkey"))
        .agg(F.min("l_shipdate").alias("first_ship"))
        .alias("f")
    )
    return li.join(
        firsts,
        (F.col("l.l_orderkey") == F.col("f.f_orderkey"))
        & (F.col("l.l_shipdate") == F.col("f.first_ship")),
    ).select("l.l_orderkey", "l.l_linenumber", "l.l_shipdate")


# ---------------------------------------------------------------------------
# More aggregation shapes (reference §2.4) + SQL surface (§2.9).
# ---------------------------------------------------------------------------


@register(
    "a1_groupby_min",
    oracle="""
    SELECT user_id, MIN(ts) AS first_seen, MAX(ts) AS last_seen, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
    doc="groupBy + MIN (A1, src/header_etl.py:199-200) — first event per key.",
)
def a1_groupby_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "a2_single_pass_metrics",
    oracle="""
    SELECT COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    """,
    doc="Single-pass multi-metric conditional aggregation (A2, "
    "src/utils/validations_utils.py:107-120) — one scan, not N counts.",
)
def a2_single_pass_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum((F.col("event_type") == "error").cast("int")).alias("n_error"),
        F.sum((F.col("value") > 50.0).cast("int")).alias("n_high_value"),
        F.sum(F.col("value").isNull().cast("int")).alias("n_null_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "a5_sql_count",
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    doc="spark.sql over a temp view (A5/§2.9, test/items_etl_test.py:151-161).",
)
def a5_sql_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type")


@register(
    "a6_distinct",
    oracle="""
    SELECT DISTINCT c.c_mktsegment, o.o_orderstatus
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="DISTINCT over a join (A6, notes.md:57-73).",
)
def a6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderstatus")
        .distinct()
    )


@register(
    "g_rollup",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           {_dsum('o_totalprice', 'sum_price')}
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP grouping sets — beyond the reference's flat groupBy.",
)
def g_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice", "sum_price")
    )


@register(
    "g_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE) AS sum_open,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE) AS sum_finished,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE) AS sum_pending
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot (conditional-sum formulation, portable across engines).",
)
def g_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def cond_sum(status: str, alias: str) -> Column:
        dec = F.col("o_totalprice").cast(T.DecimalType(18, 2))
        return (
            F.round(
                F.sum(F.when(F.col("o_orderstatus") == status, dec).otherwise(F.lit(0))),
                2,
            )
            .cast("double")
            .alias(alias)
        )

    return orders.groupBy("o_orderpriority").agg(
        cond_sum("O", "sum_open"), cond_sum("F", "sum_finished"), cond_sum("P", "sum_pending")
    )


# ---------------------------------------------------------------------------
# Windows (reference §2.5).
# ---------------------------------------------------------------------------


@register(
    "w2_rownum_latest",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Latest-wins dedup (W2, src/utils/validations_utils.py:75-78) "
    "with a total order (event_id tiebreak).",
)
def w2_rownum_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


@register(
    "w3_count_over_singletons",
    oracle="""
    SELECT event_id, user_id, event_type FROM (
      SELECT event_id, user_id, event_type,
             COUNT(*) OVER (PARTITION BY user_id, event_type,
                            CAST(ts AS DATE)) AS n_in_group
      FROM events
    ) WHERE n_in_group = 1
    """,
    doc="count(*) OVER partition, drop-all-duplicates semantics "
    "(W3, src/items_etl.py:56-64).",
)
def w3_count_over_singletons(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type", F.col("ts").cast("date"))
    return (
        ev.withColumn("n_in_group", F.count(F.lit(1)).over(w))
        .filter(F.col("n_in_group") == 1)
        .select("event_id", "user_id", "event_type")
    )


@register(
    "w4_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
      FROM orders
    ) WHERE rank <= 3
    """,
    doc="Top-k per group — the scalable ORDER BY+LIMIT, as a two-level "
    "tournament (round 6): the group key has cardinality ~5, so a "
    "single ranked window would sort each group's full slice in one "
    "task at corpus scale. Level 1 takes the top-3 of every (group, "
    "hash-chunk) in parallel (any superset-preserving split works — "
    "the group winners are necessarily among the 256 chunk winners); "
    "level 2 re-ranks the <=256*3 survivors per group. Identical "
    "output to the single-window form (same oracle).",
)
def w4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    order_cols = (F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    w_local = Window.partitionBy(
        "o_orderpriority", F.pmod(F.hash("o_orderkey"), F.lit(256))
    ).orderBy(*order_cols)
    survivors = (
        orders.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= 3)
        .drop("__lr")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(*order_cols)
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
    )


@register(
    "w5_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2)))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS running_value
    FROM events
    """,
    doc="Analytic frame (rowsBetween) running sum — frames beyond the "
    "reference's default-frame windows.",
)
def w5_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col("value").cast(T.DecimalType(18, 2))).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round(running, 2).cast("double").alias("running_value"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits (reference §2.6).
# ---------------------------------------------------------------------------


@register(
    "o1_top10_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    doc="ORDER BY + LIMIT top-k (O1/O3) with unique-key tiebreak; Spark "
    "plans TakeOrderedAndProject (no full sort materialization).",
)
def o1_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "o2_scalar_bounds",
    oracle="SELECT MIN(ts) AS first_ts, MAX(ts) AS last_ts FROM events",
    doc="Scalar fetch — replaces the reference's limit(1).collect() "
    "anti-pattern (O2, src/header_etl.py:72-73) with an aggregate.",
)
def o2_scalar_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))


# ---------------------------------------------------------------------------
# Set operations (reference §2.7) + completions.
# ---------------------------------------------------------------------------


@register(
    "u1_union_all",
    oracle="""
    SELECT event_id, user_id, 'click' AS tag FROM events WHERE event_type = 'click' AND value > 40
    UNION ALL
    SELECT event_id, user_id, 'purchase' AS tag FROM events WHERE event_type = 'purchase' AND value > 40
    """,
    doc="Positional union (U1, src/items_etl.py:106-110).",
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("value") > 40)).select(
        "event_id", "user_id", F.lit("click").alias("tag")
    )
    buys = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 40)).select(
        "event_id", "user_id", F.lit("purchase").alias("tag")
    )
    return clicks.union(buys)


@register(
    "u2_union_by_name",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="unionByName + distinct (U2, generate_header_datasets.py:185).",
)
def u2_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="INTERSECT — completes the set-op family (reference has none).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "signup").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="EXCEPT — viewers who never purchased.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.subtract(b)  # EXCEPT (distinct) semantics, unlike exceptAll


# ---------------------------------------------------------------------------
# Scalar function suite (reference §2.8).
# ---------------------------------------------------------------------------


@register(
    "f_string_suite",
    oracle="""
    SELECT c_custkey,
           CONCAT('cust_', LPAD(CAST(c_custkey AS VARCHAR), 10, '0')) AS padded_id,
           UPPER(TRIM(c_name)) AS name_upper,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits
    FROM customer
    """,
    doc="String functions: concat/lpad/trim/substr/length/regexp_extract "
    "(§2.8, src/header_etl.py:70, src/items_etl.py:52).",
)
def f_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat(
            F.lit("cust_"), F.lpad(F.col("c_custkey").cast("string"), 10, "0")
        ).alias("padded_id"),
        F.upper(F.trim(F.col("c_name"))).alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
    )


@register(
    "f_timestamp_fallback",
    oracle="""
    WITH formatted AS (
      SELECT event_id,
             CASE WHEN event_id % 2 = 0
                  THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
                  ELSE strftime(ts, '%Y/%m/%d %H:%M:%S') END AS ts_str
      FROM events
    )
    SELECT event_id,
           COALESCE(try_strptime(ts_str, '%Y-%m-%dT%H:%M:%S'),
                    try_strptime(ts_str, '%Y/%m/%d %H:%M:%S')) AS parsed_ts
    FROM formatted
    """,
    doc="Multi-format timestamp parsing with a coalesce fallback chain "
    "(§2.8, src/header_etl.py:89-102) — try_to_timestamp, ANSI-safe.",
)
def f_timestamp_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_str = F.when(
        F.col("event_id") % 2 == 0,
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
    ).otherwise(F.date_format("ts", "yyyy/MM/dd HH:mm:ss"))
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("ts_str"), F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(F.col("ts_str"), F.lit("yyyy/MM/dd HH:mm:ss")),
    )
    return (
        ev.withColumn("ts_str", ts_str)
        .select("event_id", parsed.alias("parsed_ts"))
    )


@register(
    "f_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(o_orderdate AS DATE) + 30 AS due_date
    FROM orders
    """,
    doc="Date-part extraction + date arithmetic (§2.8, "
    "src/header_etl.py:123-125 partition columns; date_add).",
)
def f_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


@register(
    "f_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
    FROM events
    """,
    doc="JSON field extraction from a string column (beyond the reference: "
    "no JSON functions there, §2.8 'no JSON functions').",
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@register(
    "f_variant_semi",
    oracle="""
    SELECT event_id,
           COALESCE(CASE WHEN event_id % 97 = 0 THEN NULL
                         ELSE CAST(json_extract(props, '$.k') AS INT) END,
                    -1) AS vk,
           event_id % 97 = 0 AS malformed,
           CAST(json_extract('{"outer": ' || props || ', "tags": ["alpha","beta"]}',
                             '$.outer.k') AS BIGINT) AS nested_k,
           json_extract_string('{"outer": ' || props || ', "tags": ["alpha","beta"]}',
                               '$.tags[1]') AS tag1
    FROM events
    """,
    doc="VARIANT semi-structured pipeline (Spark 4): parse_json once into "
    "the binary Variant encoding, then typed `variant_get` path access — "
    "object field, nested object, array index — plus `try_parse_json` "
    "null-on-malformed semantics (1 in 97 rows is truncated to invalid "
    "JSON). This is the log-ingestion shape at 100 TB: parse each props "
    "blob ONCE at scan time and do all downstream extraction against the "
    "pre-parsed binary (no re-tokenizing per path, unlike repeated "
    "get_json_object calls); typed extraction avoids string round-trips. "
    "Narrow per-row expressions, no shuffle. Missing-path int is "
    "COALESCE'd to -1 on both engines so the output column stays "
    "non-null int32 (nullable-int becomes float64 in pandas — the "
    "canonicalizer hazard class).",
)
def f_variant_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    corrupt = F.when(
        F.col("event_id") % 97 == 0,
        F.expr("substring(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    nested_js = F.concat(
        F.lit('{"outer": '), F.col("props"), F.lit(', "tags": ["alpha","beta"]}')
    )
    v = F.try_parse_json(corrupt)
    nested = F.parse_json(nested_js)
    return ev.select(
        "event_id",
        F.coalesce(F.variant_get(v, "$.k", "int"), F.lit(-1)).alias("vk"),
        v.isNull().alias("malformed"),
        F.variant_get(nested, "$.outer.k", "bigint").alias("nested_k"),
        F.variant_get(nested, "$.tags[1]", "string").alias("tag1"),
    )


# ---------------------------------------------------------------------------
# Multi-join analytical queries (SQL surface §2.9, bench headliners).
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(25,4))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC LIMIT 10
    """,
    doc="TPC-H-Q3-shaped 3-way join + agg + top-k; filters push below "
    "the joins, customer side broadcast.",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast(T.DecimalType(25, 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_region_volume",
    oracle="""
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4) AS DECIMAL(25,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H-Q5-shaped 6-way join; region/nation broadcast (bounded "
    "dims), supplier left to AQE (SF-proportional side), fact-fact "
    "join shuffles once on orderkey.",
    bench=True,
)
def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast(T.DecimalType(25, 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Subqueries / analytics / higher-order extensions (beyond the reference's
# inventory — a complete engine's query surface, SURVEY.md §7 M1 scope).
# ---------------------------------------------------------------------------


@register(
    "j8_salted_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS order_lineitem_total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    """,
    doc="Salted equi-join (operators/skew.py): shuffle key becomes "
    "(key, salt) so a hot key spreads over N tasks; the oracle is the "
    "PLAIN join's result — salting must change the plan, never the "
    "answer. AQE skew-join is the runtime default; salting is the "
    "planned fallback for keys too hot for partition splitting.",
)
def j8_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders.select("o_orderkey", "o_custkey"),
        on="o_orderkey",
        salt_buckets=4,
    )
    return joined.groupBy("o_orderkey", "o_custkey").agg(
        dec_sum("l_extendedprice", "order_lineitem_total")
    )


@register(
    "sub_exists_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
    doc="Correlated EXISTS (decorrelated by Catalyst to a left-semi "
    "join; the filter pushes into the orders scan).",
)
def sub_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust.createOrReplaceTempView("customer")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@register(
    "sub_scalar_avg",
    oracle="""
    SELECT o_orderkey, CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS total
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    doc="Scalar subquery (single-row broadcast result reused by the "
    "filter; one pass over orders for the average, one for the filter).",
)
def sub_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS total
        FROM orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@register(
    "g_cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets (extends the reference's plain group-by "
    "inventory; Spark expands to a single shuffle with grouping-id).",
)
def g_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "w_ntile_rank",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS spend_quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pr
    FROM (
      SELECT o_custkey AS c_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY o_custkey
    )
    WINDOW w AS (ORDER BY spend DESC, c_custkey ASC)
    """,
    doc="Global analytic ranking (ntile + percent_rank) over per-key "
    "aggregates — computed WITHOUT the single-task global sort window: "
    "operators/ranking.distributed_total_rank range-buckets on "
    "percentile_approx thresholds, ranks each bucket in parallel, and "
    "derives NTILE/PERCENT_RANK arithmetically from (rank, n). The SQL "
    "oracle keeps the textbook global-window form as the semantic twin.",
)
def w_ntile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.col("o_totalprice").cast(T.DecimalType(18, 2))).alias("spend")
    )
    ranked = distributed_total_rank(
        spend, "spend", ["c_custkey"], descending=True, n_buckets=64
    )
    r, n = F.col("__rank"), F.col("__n")
    return ranked.select(
        "c_custkey",
        ntile_from_rank(r, n, 4).alias("spend_quartile"),
        percent_rank_from_rank(r, n).alias("pr"),
    )


@register(
    "w_exact_quantiles",
    bench=True,  # round-8 verdict #3
    oracle="""
    WITH s AS (
      SELECT o_custkey AS c_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT spend, c_custkey,
             ROW_NUMBER() OVER (ORDER BY spend ASC, c_custkey ASC) AS rnk,
             COUNT(*) OVER () AS n
      FROM s
    )
    SELECT CAST(t.q AS DOUBLE) AS q,
           round(CAST(spend AS DOUBLE), 2) AS spend_at_q
    FROM r JOIN (VALUES (0.25), (0.5), (0.75), (0.9)) t(q)
      ON rnk = CEIL(CAST(t.q AS DOUBLE) * n)
    """,
    doc="EXACT global quantiles (discrete: value at rank ceil(q*n)) "
    "of per-customer spend — what percentile_approx cannot promise — "
    "without a single-task sort: operators/ranking."
    "distributed_total_rank range-buckets the spend domain, ranks "
    "each bucket in parallel, and the quantile rows fall out of a "
    "rank-set filter. Both engines compute ceil(q*n) in DOUBLE so the "
    "0.9*n ulp artifact lands identically. Scale: the only global "
    "structure is the <= n_buckets offsets table.",
)
def w_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.col("o_totalprice").cast(T.DecimalType(18, 2))).alias("spend")
    )
    ranked = distributed_total_rank(
        spend, "spend", ["c_custkey"], descending=False
    )
    qs = [0.25, 0.5, 0.75, 0.9]
    r, n = F.col("__rank"), F.col("__n")
    # one pass: each row carries the (possibly several, when n is
    # small) q's whose rank it owns; explode drops non-quantile rows
    hits = F.array(
        *[
            F.when(
                r == F.ceil(F.lit(float(q)) * n), F.lit(float(q))
            ).otherwise(F.lit(None).cast("double"))
            for q in qs
        ]
    )
    return ranked.select(
        F.explode(F.filter(hits, lambda x: x.isNotNull())).alias("q"),
        F.round(F.col("spend").cast("double"), 2).alias("spend_at_q"),
    )


@register(
    "f_higher_order_arrays",
    oracle="""
    SELECT o_orderkey,
           len(list_filter(parts, x -> x % 2 = 0)) AS n_even,
           list_reduce(list_transform(parts, x -> x * 2), (a, b) -> a + b)
             AS doubled_sum
    FROM (
      SELECT o_orderkey, list_sort(list(l_partkey)) AS parts
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderkey
    )
    """,
    doc="Higher-order array functions (transform/filter/aggregate) over "
    "collected per-order part lists — the array-programming surface the "
    "reference lacks entirely (SURVEY.md §2.8 'no higher-order array "
    "functions').",
)
def f_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    parts = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("parts"))
    )
    return parts.select(
        "o_orderkey",
        F.size(F.filter("parts", lambda x: x % 2 == 0)).alias("n_even"),
        F.aggregate(
            F.transform("parts", lambda x: x * 2),
            F.lit(0).cast("bigint"),
            lambda a, b: a + b,
        ).alias("doubled_sum"),
    )


# ---------------------------------------------------------------------------
# Shapes SURVEY.md §2.3/§2.5 lists as absent from the reference — added
# as first-class coverage: range join, analytic frames, percentile /
# distinct aggregates, deterministic hash sampling.
# ---------------------------------------------------------------------------


@register(
    "j9_range_join",
    oracle="""
    SELECT e.event_id AS err_event_id, COUNT(c.ts) AS n_clicks_5m
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id
     AND c.event_type = 'click'
     AND c.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
    doc="Range (interval) join: clicks within the 5 minutes preceding "
    "each error, per user (SURVEY.md §2.3 'not present: range joins'). "
    "Scale: the equi key (user_id) carries the shuffle, so this is a "
    "hash join with a range residual — per-user event lists stay small "
    "and the quadratic term is bounded within a key, not the table.",
    bench=True,
)
def j9_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("err_event_id"),
        F.col("ts").alias("err_ts"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts")
    )
    joined = err.join(
        clk,
        (err.user_id == clk.c_user_id)
        & (clk.click_ts >= err.err_ts - F.expr("INTERVAL 5 MINUTES"))
        & (clk.click_ts <= err.err_ts),
        "left",
    )
    return joined.groupBy("err_event_id").agg(
        F.count("click_ts").alias("n_clicks_5m")
    )


@register(
    "w6_moving_avg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w, 2)
             AS DOUBLE) AS msum_30d,
           COUNT(*) OVER w AS n_30d
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
    )
    """,
    doc="Analytic RANGE frame: 30-day moving order-value sum + count per "
    "customer (SURVEY.md §2.5 'no analytic frames' in the reference). "
    "Value-bounded frames are tie-stable (peers share a frame), so the "
    "result is deterministic without a unique-key tiebreak. One shuffle "
    "on o_custkey; frame evaluation is a per-partition sliding scan.",
)
def w6_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    epoch_days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_days)
        .rangeBetween(-30, 0)
    )
    # exact decimal SUM + count (a moving AVG divides cents by 2 and
    # lands on .xx5 halves, where double rounding diverges between
    # engines; sum/count carries the same information exactly)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum(F.col("o_totalprice").cast(T.DecimalType(18, 2))).over(w), 2
        )
        .cast("double")
        .alias("msum_30d"),
        F.count(F.lit(1)).over(w).alias("n_30d"),
    )


@register(
    "a7_percentile_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_cust,
           CAST(ROUND(quantile_cont(o_totalprice, 0.5), 2) AS DOUBLE)
             AS median_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact distinct count + interpolated median per group "
    "(aggregate families absent from the reference, SURVEY.md §2.4). "
    "Scale: COUNT(DISTINCT) expands to a two-stage partial-distinct "
    "plan; at 100 TB swap in approx_count_distinct (HLL) when 2% error "
    "is acceptable — exact kept here because the oracle is exact.",
)
def a7_percentile_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_cust"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2)
        .cast("double")
        .alias("median_price"),
    )


@register(
    "sample_hash",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE md5(CAST(l_orderkey AS VARCHAR) || '-' ||
              CAST(l_linenumber AS VARCHAR)) LIKE '0%'
    """,
    doc="Deterministic ~1/16 sample by content hash of the row key — "
    "the reproducible-sampling primitive a training-data pipeline needs "
    "(vs. nondeterministic df.sample). Pure narrow filter: pushes "
    "nothing to the driver, reshuffles nothing, and the same rows are "
    "selected on any cluster size or partitioning.",
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    key_hash = F.md5(
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    return li.filter(key_hash.startswith("0")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_custkey, o_orderkey
    """,
    doc="TPC-H Q18 shape: HAVING-filtered aggregate driving an IN "
    "semi-join back onto the fact. Scale: the HAVING side shrinks to "
    "a short key list at any SF but still grows with the data, so the "
    "hint is left to AQE (broadcast at bench scale, shuffle semi at "
    "web scale); only qualifying orders reach the 3-way join.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(dec_sum("l_quantity", "total_qty"))
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size >= 10
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type
    """,
    doc="TPC-H Q16 shape: NOT-IN anti-join + distinct count per "
    "attribute pair. Scale: the NOT-IN list (negative-balance "
    "suppliers) and the filtered part side both grow with SF, so the "
    "join strategy is AQE's call (broadcast at bench scale, SMJ at "
    "web scale); the distinct expands to a two-stage partial "
    "aggregate on (brand, type, suppkey).",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(
            part.filter((F.col("p_brand") != "Brand#1") & (F.col("p_size") >= 10)),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q14_promo_ratio",
    oracle="""
    SELECT CAST(ROUND(
             CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))
                  ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(25,6))) AS DOUBLE) * 100, 4)
           AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional-aggregate ratio (promo revenue "
    "share). Both sums are exact decimals; ONE double division on both "
    "engines keeps the rounded ratio hash-identical. part is "
    "SF-proportional so AQE picks the join strategy; the month filter "
    "prunes the fact scan.",
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        T.DecimalType(25, 6)
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast(T.DecimalType(25, 6))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(promo).cast("double") / F.sum(rev).cast("double") * 100, 4
            )
            .cast("double")
            .alias("promo_pct")
        )
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(25,4))), 2) AS DOUBLE) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: five-way join with the same dimension (nation) "
    "joined twice under different roles — alias disambiguation plus a "
    "cross-pair predicate. Both nation sides broadcast; the fact "
    "traverses supplier->lineitem->orders->customer with one shuffle "
    "per non-broadcast hop, then one grouped aggregation.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        T.DecimalType(25, 4)
    )
    return (
        supplier.join(li, supplier.s_suppkey == li.l_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(vol), 2).cast("double").alias("volume"))
    )


@register(
    "f_map_functions",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           list_extract(map_extract(m, 'O'), 1) AS n_open,
           CAST(cardinality(m) AS INT) AS n_statuses
    FROM (
      SELECT o_orderpriority,
             map_from_entries(
               list_sort(list(struct_pack(k := o_orderstatus, v := n)))
             ) AS m
      FROM per GROUP BY o_orderpriority
    )
    """,
    doc="Map-type surface (SURVEY.md §2.8 'no map functions' in the "
    "reference): build a status->count map per priority via "
    "map_from_entries over collected entries, then element_at lookup "
    "and size. Missing-key lookups are NULL on both engines.",
)
def f_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = per.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("m")
    )
    return m.select(
        "o_orderpriority",
        F.element_at("m", "O").alias("n_open"),
        F.size("m").cast("int").alias("n_statuses"),
    )


@register(
    "a9_collect_set",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
             AS statuses,
           CAST(COUNT(DISTINCT l_linestatus) AS INT) AS n_statuses
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="collect_set aggregation (the reference imports collect_set at "
    "src/header_etl.py:8 but never uses it — here it is as a real "
    "capability): per-group distinct-value set, sorted then joined so "
    "the value hash is order-independent across engines. One shuffle "
    "with map-side partial collect.",
)
def a9_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.count_distinct("l_linestatus").cast("int").alias("n_statuses"),
    )


@register(
    "f_struct_nested",
    oracle="""
    SELECT o_orderkey,
           order_info.status AS status_out,
           order_info.price AS price_out,
           round(order_info.price * 1.1, 2) AS taxed
    FROM (
      SELECT o_orderkey,
             {'status': o_orderstatus, 'price': o_totalprice} AS order_info
      FROM orders WHERE o_orderkey < 100
    )
    """,
    doc="Struct construction + field access (nested-type surface the "
    "reference never touches): build a struct column, read fields back "
    "out, compute through them — all codegen'd projections. Output is "
    "scalar-only: raw struct columns break pandas-side canonicalizers "
    "(unhashable dict), so the struct lives inside the plan and the "
    "fields are projected back out at the end.",
)
def f_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    d = o.select("o_orderkey", s.alias("order_info"))
    return d.select(
        "o_orderkey",
        F.col("order_info.status").alias("status_out"),
        F.col("order_info.price").alias("price_out"),
        F.round(F.col("order_info.price") * 1.1, 2).alias("taxed"),
    )


@register(
    "g_unpivot",
    oracle="""
    SELECT o_orderkey, metric, val FROM (
      SELECT o_orderkey,
             'totalprice' AS metric, o_totalprice AS val
      FROM orders WHERE o_orderkey < 200
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE)
      FROM orders WHERE o_orderkey < 200
    )
    """,
    doc="UNPIVOT/melt (wide -> long), the inverse of g_pivot_status: "
    "Spark's unpivot operator, a narrow per-row explode — no shuffle.",
)
def g_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "f_date_trunc",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(date_trunc('week', o_orderdate)) AS first_week
    FROM orders
    GROUP BY 1
    """,
    doc="date_trunc month/week bucketing — the time-rollup primitive "
    "under calendar aggregations (ISO week semantics match DuckDB).",
)
def f_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(
            F.date_trunc("week", F.col("o_orderdate")).cast("date")
        ).alias("first_week"),
    )


@register(
    "a10_stats_suite",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp,
           round(stddev_samp(l_discount), 6) AS sd_disc,
           round(var_samp(l_discount), 6) AS var_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregates (corr / covar / stddev / variance) — "
    "single-pass distributed moments with map-side partial combine; "
    "rounded so the cross-engine float hash is stable.",
)
def a10_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covs_qp"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qp"),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
    )


@register(
    "w7_value_windows",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)
             OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING) AS last_price,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Value/rank window surface beyond row_number: first_value, "
    "whole-partition last_value (explicit UNBOUNDED FOLLOWING frame — "
    "the default frame ends at CURRENT ROW, a classic silent-semantics "
    "trap), percent_rank, cume_dist; ORDER BY is made total with the "
    "key so both engines agree. This query demonstrates the window-"
    "FUNCTION surface on a low-cardinality partition key; the repo's "
    "scale-safe shapes for the same semantics are the chunked-rank "
    "pattern (sample_stratified), the tournament top-k "
    "(w4_topk_per_group) and the approx-threshold quantile gate "
    "(quality_filter_per_group).",
)
def w7_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "ts_gap_fill",
    oracle="""
    WITH spans AS (
      SELECT o_custkey, MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi
      FROM orders WHERE o_custkey < 50 GROUP BY o_custkey
    ),
    cal AS (
      SELECT o_custkey, UNNEST(generate_series(lo, hi,
                        INTERVAL 1 DAY)) AS d
      FROM spans
    ),
    daily AS (
      SELECT o_custkey, o_orderdate AS d,
             round(SUM(o_totalprice), 2) AS spend
      FROM orders WHERE o_custkey < 50 GROUP BY 1, 2
    )
    SELECT cal.o_custkey, cal.d, coalesce(daily.spend, 0.0) AS spend
    FROM cal LEFT JOIN daily
      ON cal.o_custkey = daily.o_custkey AND cal.d = daily.d
    """,
    doc="Time-series gap filling (calendar densification): per-key "
    "date spine via sequence+explode — a narrow 1-to-N generate, no "
    "shuffle for the spine itself — left-joined to the daily aggregate "
    "with zero-fill. The spine explode is how resampling scales: spine "
    "size ~ keys x days, built where the key already lives, never on "
    "the driver.",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    spans = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    cal = spans.select(
        "o_custkey",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 day"))
        ).alias("d"),
    )
    daily = o.groupBy("o_custkey", F.col("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    return cal.join(daily, on=["o_custkey", "d"], how="left").select(
        "o_custkey", "d", F.coalesce("spend", F.lit(0.0)).alias("spend")
    )


@register(
    "j10_full_outer",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 = 0
    ),
    o AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_custkey % 2 = 0 GROUP BY 1
    )
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_acctbal AS acctbal,
           COALESCE(o.n_orders, 0) AS n_orders,
           CASE WHEN c.c_custkey IS NULL THEN 'orders_only'
                WHEN o.o_custkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS side
    FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
    """,
    doc="FULL OUTER equi-join with coalesced key and side "
    "classification — the one join type the registry lacked. Shuffles "
    "both sides on the key (full outer cannot broadcast); AQE handles "
    "residual skew.",
)
def j10_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey", "c_acctbal")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 2 == 0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(F.col("c_custkey").isNull(), "orders_only")
        .when(F.col("o_custkey").isNull(), "customer_only")
        .otherwise("both")
        .alias("side"),
    )


@register(
    "a9_rollup",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(floor(sum(o_totalprice)) AS BIGINT) AS total,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP hierarchy aggregation (subtotals per priority and the "
    "grand total in ONE pass) with GROUPING() disambiguating real "
    "NULLs from subtotal rows — the OLAP drill-down shape. Spark "
    "expands grouping sets inside a single Expand+hash-aggregate "
    "plan: one scan, one shuffle, not one job per level.",
)
def a9_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sum("o_totalprice")).cast("long").alias("total"),
        F.grouping("o_orderpriority").cast("int").alias("g_pri"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
    )


@register(
    "a10_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS f_n,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS o_n,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS p_n,
           CAST(coalesce(floor(sum(o_totalprice)
                               FILTER (o_orderstatus = 'P')), 0) AS BIGINT)
             AS p_total
    FROM orders GROUP BY 1
    """,
    doc="PIVOT (long->wide): order counts per priority x status plus a "
    "pivoted sum, explicit pivot values so the plan is ONE pass "
    "(pivot without values costs an extra distinct-scan job to "
    "discover columns — never do that at 100 TB). Spark compiles "
    "pivot to conditional aggregates, same as the oracle's FILTER "
    "clauses.",
)
def a10_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.sum("o_totalprice")).cast("long").alias("total"),
        )
    )
    # Spark pivot yields NULL (not 0) for a missing (priority, status)
    # combination even on count aggregates — coalesce EVERY pivoted
    # column, not just the ones sparse at this SF
    return wide.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).alias("f_n"),
        F.coalesce("O_n", F.lit(0)).alias("o_n"),
        F.coalesce("P_n", F.lit(0)).alias("p_n"),
        F.coalesce("P_total", F.lit(0)).alias("p_total"),
    )


@register(
    "w5_window_frames",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS rows_sum,
           round(avg(value) OVER (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6)
             AS range_avg
    FROM events
    """,
    doc="Explicit window frames: a ROWS sliding sum (last 4 events per "
    "user) and a time-RANGE trailing average (events within the past "
    "hour) — the rolling-metric shapes the reference's fixed "
    "unbounded frames never exercise. One shuffle on the partition "
    "key serves both frames. Both engines order the RANGE frame on "
    "floored epoch seconds (Spark's timestamp->long cast truncates; "
    "DuckDB INTERVAL arithmetic would keep sub-second parts).",
)
def w5_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w_rows), 6).alias("rows_sum"),
        F.round(F.avg("value").over(w_range), 6).alias("range_avg"),
    )


@register(
    "u3_intersect_except",
    oracle="""
    WITH recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= DATE '1995-01-01'
    ),
    big AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 150000
    )
    SELECT o_custkey, 'both' AS bucket FROM (
      SELECT o_custkey FROM recent INTERSECT SELECT o_custkey FROM big
    )
    UNION ALL
    SELECT o_custkey, 'recent_only' AS bucket FROM (
      SELECT o_custkey FROM recent EXCEPT SELECT o_custkey FROM big
    )
    """,
    doc="Set operations INTERSECT / EXCEPT (distinct semantics) over "
    "two order cohorts, tagged and unioned — completes the U family "
    "beyond UNION/unionByName. Spark plans both as left-semi / "
    "left-anti hash joins over pre-aggregated distinct sides: one "
    "shuffle each, no sort.",
)
def u3_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        .select("o_custkey")
        .distinct()
    )
    big = (
        orders.filter(F.col("o_totalprice") > 150000)
        .select("o_custkey")
        .distinct()
    )
    both = recent.intersect(big).select(
        "o_custkey", F.lit("both").alias("bucket")
    )
    # subtract = distinct EXCEPT -> ReplaceExceptWithAntiJoin (the
    # documented plan); exceptAll would rewrite to a +1/-1 counted
    # union + aggregate + generate — an extra pass for nothing here
    only = recent.subtract(big).select(
        "o_custkey", F.lit("recent_only").alias("bucket")
    )
    return both.unionAll(only)


# ---------------------------------------------------------------------------
# Entity resolution (record linkage) — beyond-reference MDM family.
# ---------------------------------------------------------------------------

#: Shared DuckDB fragment: the blocked fuzzy-match pair set over
#: customer (same nation + same name prefix, edit distance <= 1,
#: account balances within 500). Used verbatim by er_blocked_matches
#: and er_golden_record so the two cannot drift.
_ER_PAIRS_CTE = """
    er_pairs AS (
      SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
             levenshtein(a.c_name, b.c_name) AS lev_dist,
             round(abs(a.c_acctbal - b.c_acctbal), 2) AS bal_gap
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey
       AND substr(a.c_name, 1, 17) = substr(b.c_name, 1, 17)
       AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
        AND abs(a.c_acctbal - b.c_acctbal) <= 500
    )
"""


def _er_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import entity

    cust = load_table(spark, sf_dir, "customer")
    pairs = entity.blocked_pairs(
        cust,
        "c_custkey",
        block_exprs=[F.col("c_nationkey"), F.substring("c_name", 1, 17)],
        compare_col="c_name",
        max_distance=1,
        carry_cols=["c_acctbal"],
    )
    gap = F.abs(F.col("c_acctbal_a") - F.col("c_acctbal_b"))
    return pairs.filter(gap <= 500).select(
        F.col("c_custkey_a").alias("custkey_a"),
        F.col("c_custkey_b").alias("custkey_b"),
        "lev_dist",
        F.round(gap, 2).alias("bal_gap"),
    )


@register(
    "er_blocked_matches",
    bench=True,  # round-8 verdict #3
    oracle=f"""
    WITH {_ER_PAIRS_CTE}
    SELECT * FROM er_pairs
    """,
    doc="Entity-resolution candidate matching (operators/entity.py "
    "blocked_pairs): blocking on (nation, name-prefix) turns the "
    "all-pairs O(N^2) comparison into an equi-join whose pair count "
    "is O(N x block-size); the bounded edit distance and balance "
    "residual run JVM-side inside the join's codegen stage. The "
    "reference has no fuzzy matching (its notes only flag key "
    "collisions); this is the MDM/record-linkage face of the dedup "
    "family. Scale: the join shuffles block key + compared columns "
    "only; blocks are bounded by construction, so no skewed key can "
    "go quadratic unseen (the block key is part of the shuffle key).",
)
def er_blocked_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er_pairs(spark, sf_dir)


@register(
    "er_golden_record",
    oracle=f"""
    WITH RECURSIVE {_ER_PAIRS_CTE},
    edges AS (
      SELECT custkey_a AS src, custkey_b AS dst FROM er_pairs
      UNION SELECT custkey_b, custkey_a FROM er_pairs
    ),
    reach(node, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS entity_id FROM reach GROUP BY node),
    labeled AS (
      SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
             COALESCE(p.entity_id, c.c_custkey) AS entity_id
      FROM customer c LEFT JOIN comp p ON c.c_custkey = p.node
    ),
    ranked AS (
      SELECT entity_id, c_acctbal, c_mktsegment,
             ROW_NUMBER() OVER (PARTITION BY entity_id
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
             COUNT(*) OVER (PARTITION BY entity_id) AS n_members
      FROM labeled
    )
    SELECT entity_id, n_members,
           round(c_acctbal, 2) AS top_bal,
           c_mktsegment AS top_segment
    FROM ranked WHERE rn = 1
    """,
    doc="Golden-record survivorship over transitive match clusters: "
    "the blocked pair set becomes an undirected graph, distributed "
    "connected components (operators/graph.py hash-min label "
    "propagation) assign every customer its cluster's min custkey as "
    "entity_id (singletons = themselves), and survivorship picks each "
    "entity's best attributes with ONE hash aggregation (max over a "
    "(acctbal, -custkey, segment) struct — no per-entity window, no "
    "second shuffle). Oracle recomputes components with a recursive "
    "CTE, proving the iterative Spark labeling exact. Scale: CC state "
    "is one row per matched vertex, O(log diameter) rounds; the final "
    "agg shuffles entity_id + three columns.",
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import entity

    cust = load_table(spark, sf_dir, "customer")
    labeled = entity.entity_ids(
        cust.select("c_custkey", "c_acctbal", "c_mktsegment"),
        "c_custkey",
        _er_pairs(spark, sf_dir),
        key_a="custkey_a",
        key_b="custkey_b",
    )
    best = F.max(
        F.struct(
            F.col("c_acctbal").alias("bal"),
            (-F.col("c_custkey")).alias("negkey"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    return (
        labeled.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            best.alias("__best"),
        )
        .select(
            "entity_id",
            "n_members",
            F.round(F.col("__best.bal"), 2).alias("top_bal"),
            F.col("__best.seg").alias("top_segment"),
        )
    )


@register(
    "g_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority))
    """,
    doc="GROUP BY GROUPING SETS with an arbitrary (non-lattice) set "
    "list — the third multi-dimensional aggregation surface next to "
    "g_rollup (prefix lattice) and g_cube_status_priority (full "
    "cross): exactly the requested grouping combinations, nothing "
    "more. Spark expands the sets with ONE Expand node over a single "
    "scan + one shuffle (grouping-id added to the key) — the same "
    "plan family as rollup/cube, cost ∝ sets x input, not one job "
    "per set. GROUPING() flags disambiguate real NULL keys from "
    "subtotal rows on both engines.",
)
def g_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [
                [F.col("o_orderstatus"), F.col("o_orderpriority")],
                [F.col("o_orderstatus")],
                [F.col("o_orderpriority")],
            ],
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", "total_price"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        )
    )


@register(
    "diag_key_skew",
    oracle="""
    WITH kc AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
    s AS (
      SELECT CAST(SUM(n) AS DOUBLE) AS total,
             AVG(n) AS avg_n
      FROM kc
    )
    SELECT k.user_id, k.n,
           round(k.n / s.total, 6) AS share,
           round(k.n / s.avg_n, 6) AS skew_ratio
    FROM kc k, s
    ORDER BY k.n DESC, k.user_id ASC LIMIT 10
    """,
    doc="Join/shuffle pre-flight skew profiler: per-key cardinalities "
    "of the prospective shuffle key, top-10 heaviest keys with their "
    "corpus share and ratio-to-mean. Pairs with sketch_join_size as "
    "the planning duo: join-size says HOW BIG, this says HOW LOPSIDED "
    "(whether to salt — j8_salted_join — or lean on AQE skew "
    "handling). One map-side-combined count agg + a broadcast scalar; "
    "the top-10 is TakeOrdered over key-count rows, never a global "
    "sort of the input.",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    s = kc.agg(
        F.sum("n").cast("double").alias("total"), F.avg("n").alias("avg_n")
    )
    return (
        kc.crossJoin(F.broadcast(s))
        .select(
            "user_id",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n") / F.col("avg_n"), 6).alias("skew_ratio"),
        )
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(10)
    )


@register(
    "er_incremental_attach",
    oracle="""
    WITH store AS (SELECT * FROM customer WHERE c_custkey < 1195),
    batch AS (SELECT * FROM customer WHERE c_custkey >= 1195),
    m AS (
      SELECT b.c_custkey AS batch_key, MIN(s.c_custkey) AS ent
      FROM batch b JOIN store s
        ON b.c_nationkey = s.c_nationkey
       AND substr(b.c_name, 1, 17) = substr(s.c_name, 1, 17)
       AND levenshtein(b.c_name, s.c_name) <= 1
       AND abs(b.c_acctbal - s.c_acctbal) <= 500
      GROUP BY 1
    )
    SELECT b.c_custkey, COALESCE(m.ent, b.c_custkey) AS entity_id,
           m.ent IS NOT NULL AS matched
    FROM batch b LEFT JOIN m ON b.c_custkey = m.batch_key
    """,
    doc="Incremental entity resolution (entity.attach_to_entities): a "
    "new record batch attaches to its best-matching STORED entity "
    "(min stored key among blocked fuzzy matches; stored corpus is "
    "canonical) or mints a new entity — the per-micro-batch ingest "
    "step, mirroring dedup_incremental_lsh's O(batch) shape: the "
    "block-key equi-join touches only the stored blocks the batch "
    "occupies, never rescans the store, and the attach is one "
    "min-aggregation + left join on the batch key.",
)
def er_incremental_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import entity

    cust = load_table(spark, sf_dir, "customer")
    store = cust.filter(F.col("c_custkey") < 1195)
    batch = cust.filter(F.col("c_custkey") >= 1195)

    def blocks(df):
        return [df["c_nationkey"], F.substring(df["c_name"], 1, 17)]

    return entity.attach_to_entities(
        batch,
        store,
        "c_custkey",
        blocks,
        "c_name",
        1,
        carry_cols=["c_acctbal"],
        pair_filter=(
            F.abs(F.col("c_acctbal_batch") - F.col("c_acctbal_store")) <= 500
        ),
    ).select("c_custkey", "entity_id", "matched")
