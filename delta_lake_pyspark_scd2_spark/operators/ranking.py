"""Distributed exact total-order ranking (scale path for global
analytic functions).

A plain ordered window with no ``partitionBy`` funnels the
whole input through ONE task — fine for bounded inputs, a scale-killer
at the 100 TB north star (~10^9 per-customer rows through a single
sort). This module computes the *exact* global ``row_number`` with a
two-level range-bucketed plan instead:

1. **Bucket split** — ``percentile_approx`` thresholds over the order
   value give ~equal-height buckets. Correctness does NOT depend on
   percentile accuracy: any *monotone* split of the value domain is
   order-consistent (every row in bucket ``i`` sorts before every row
   in bucket ``i+1``), because the bucket id is a monotone function of
   the value alone, and equal values always share a bucket. Accuracy
   only affects balance.
2. **Local rank** — ``row_number`` over ``Window.partitionBy(bucket)``
   sorts each bucket in parallel.
3. **Offsets** — per-bucket counts reduce to ≤ ``n_buckets`` rows; the
   exclusive prefix sum over that tiny table broadcasts back, and
   ``global rank = bucket offset + local rank``.

The same shape powers ``export.export_token_shards``'s chunked prefix
sum and ``llm_ops.sample_stratified``'s md5-chunked per-stratum rank;
this is the *ordered* variant (range buckets preserve sort order,
hash chunks do not).

``ntile_from_rank`` / ``percent_rank_from_rank`` derive the SQL
analytic functions from ``(rank, n)`` with their exact semantics, so
``NTILE(k) OVER (ORDER BY ...)`` and ``PERCENT_RANK()`` need no global
window at all.

Scale extension beyond the reference (its window inventory stops at
per-key ``lead`` chains: header_etl.py:104-111); cited in
SURVEY.md §2.5.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "bradley_terry",
    "bradley_terry_from_counts",
    "distributed_total_rank",
    "ntile_from_rank",
    "percent_rank_from_rank",
    "quantile_normalize",
]


def distributed_total_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    *,
    descending: bool = True,
    n_buckets: int | None = None,
    rank_col: str = "__rank",
    total_col: str = "__n",
) -> DataFrame:
    """Exact global ``row_number`` over ``(value_col, *tiebreak_cols)``
    without a single-task sort.

    Adds ``rank_col`` (1-based, dense, unique — the tiebreaks must make
    the order total) and ``total_col`` (the global row count) to ``df``.

    ``n_buckets`` bounds per-task sort size at ~rows/n_buckets (plus
    value skew: equal values share a bucket). The default tracks
    ``spark.sql.shuffle.partitions`` (min 64) so the per-bucket sorts
    match the session's parallelism; size it to rows/target-partition
    explicitly when ranking at the 100 TB end.

    ``value_col`` must be non-NULL: Spark and DuckDB disagree on the
    default NULL sort position under ``DESC``, so a NULL order key has
    no cross-engine contract here (callers aggregate it away first).
    """
    if not tiebreak_cols:
        raise ValueError(
            "distributed_total_rank needs >=1 tiebreak column to make "
            "the order total (rank must be unique per row)"
        )
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    # The input feeds THREE independent executions: the
    # percentile_approx threshold probe, the per-bucket offsets
    # aggregate, and the ranked output itself. Unpersisted, any
    # non-trivial upstream (w_exact_quantiles' per-customer spend
    # aggregation, text_vocab_coverage's term counts) recomputes 3× —
    # persist once (MEMORY_AND_DISK, released at the query boundary);
    # at production scale this frame is the rank operator's
    # materialized input table. (round-10 optimization)
    df = persist_tracked(df)
    if n_buckets is None:
        n_buckets = max(
            64,
            int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            ),
        )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # bounded collect: n_buckets - 1 scalars (the split thresholds)
    row = df.select(
        F.percentile_approx(F.col(value_col), probs, 10_000).alias("__t")
    ).first()
    raw = row["__t"] if row is not None else None
    thresholds = sorted({t for t in (raw or []) if t is not None})
    if descending:
        thresholds = list(reversed(thresholds))

    v = F.col(value_col)
    # monotone bucket id along the sort order: # thresholds that sort
    # strictly before v. A sum of literal comparisons stays inside
    # whole-stage codegen (an array HOF here is interpreted per element
    # AND trips attribute rebinding when the plan branches for the
    # offsets aggregate); cost is len(thresholds) comparisons per row.
    bucket = F.lit(0)
    for t in thresholds:
        hit = F.lit(t) > v if descending else F.lit(t) < v
        bucket = bucket + F.when(hit, 1).otherwise(0)

    order = [v.desc() if descending else v.asc()]
    order += [F.col(c).asc() for c in tiebreak_cols]

    chunked = df.withColumn("__bucket", bucket)
    w_local = Window.partitionBy("__bucket").orderBy(*order)
    # global-window-ok: offsets table is <= n_buckets rows by
    # construction (one row per bucket) — bounded input
    w_before = Window.orderBy("__obucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # global-window-ok: same <= n_buckets-row table
    w_all = Window.orderBy("__obucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        chunked.groupBy(F.col("__bucket").alias("__obucket"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__obucket",
            F.coalesce(F.sum("__cnt").over(w_before), F.lit(0)).alias(
                "__before"
            ),
            F.sum("__cnt").over(w_all).alias(total_col),
        )
    )
    return (
        chunked.join(
            F.broadcast(offsets), F.col("__bucket") == F.col("__obucket")
        )
        .withColumn(
            rank_col, F.col("__before") + F.row_number().over(w_local)
        )
        .drop("__bucket", "__obucket", "__before")
    )


def percent_rank_from_rank(rank: Column, n: Column) -> Column:
    """``PERCENT_RANK()`` from a unique 1-based rank: ``(r-1)/(n-1)``,
    0.0 for a single row (the SQL definition). Double division matches
    Spark's and DuckDB's internal percent_rank arithmetic exactly."""
    return (
        F.when(
            n > F.lit(1),
            (rank - F.lit(1)).cast("double") / (n - F.lit(1)).cast("double"),
        )
        .otherwise(F.lit(0.0))
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """``NTILE(k)`` from a unique 1-based rank.

    SQL semantics: the first ``n % k`` tiles hold ``ceil(n/k)`` rows,
    the rest ``floor(n/k)``. With ``q = n div k`` and
    ``cutoff = (n % k) * (q + 1)``::

        tile = floor((r-1) / (q+1)) + 1                 if r <= cutoff
             = (n % k) + floor((r-cutoff-1) / q) + 1    otherwise

    When ``n < k`` (``q == 0``) every row is ``r <= cutoff``, so the
    second branch never evaluates; ``greatest(q, 1)`` still guards the
    divisor for ANSI mode.
    """
    if k < 1:
        raise ValueError(f"ntile requires k >= 1, got {k}")
    q = F.floor(n / F.lit(k)).cast("long")
    big = (n % F.lit(k)).cast("long")
    cutoff = big * (q + F.lit(1))
    first = F.floor((rank - F.lit(1)) / (q + F.lit(1))) + F.lit(1)
    rest = (
        big
        + F.floor((rank - cutoff - F.lit(1)) / F.greatest(q, F.lit(1)))
        + F.lit(1)
    )
    return F.when(rank <= cutoff, first).otherwise(rest).cast("int")


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_cols: Sequence[str],
    *,
    out_col: str = "q_value",
    n_buckets: int | None = None,
) -> DataFrame:
    """Quantile normalization across groups: replace each row's value
    with the GLOBAL value at the same within-group percentile — the
    batch-effect correction that makes per-source quality scores
    comparable when sources score on different scales (microarray
    quantile normalization, Bolstad et al. 2003, at corpus scale).

    A row ranked at within-group percentile p (``(rk-1)/(n_g-1)``;
    0.5 for singleton groups) receives the global reference value at
    position ``floor(p * (N-1)) + 1`` of the full sorted column.

    Scale: within-group ranks are a window partitioned BY THE GROUP;
    the global reference positions come from
    :func:`distributed_total_rank` (range-bucketed, never a
    single-task sort); the lookup is an equi-join on the integer
    position. No global window anywhere.
    """
    tbs = list(tiebreak_cols)
    if not tbs:
        raise ValueError("quantile_normalize needs tiebreak columns")
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), *[F.col(c).asc() for c in tbs]
    )
    w_n = Window.partitionBy(group_col)
    ranked = df.withColumn("__grk", F.row_number().over(w)).withColumn(
        "__gn", F.count(F.lit(1)).over(w_n)
    )
    ref = distributed_total_rank(
        df.select(F.col(value_col), *[F.col(c) for c in tbs]),
        value_col,
        tbs,
        descending=False,
        n_buckets=n_buckets,
    ).select(
        F.col("__rank").alias("__pos"),
        F.col("__n").alias("__N"),
        F.col(value_col).alias(out_col),
    )
    # Global row count directly from the input: the rank output is
    # 1:1 with input rows, so count(df) == max(__N) by construction —
    # aggregating over `ref` instead re-executed the whole bucketed
    # rank chain just to read its constant row-count column.
    # (round-10 optimization)
    n_total = df.agg(F.count(F.lit(1)).alias("__N"))
    pr = F.when(F.col("__gn") == 1, F.lit(0.5)).otherwise(
        (F.col("__grk") - F.lit(1.0)) / (F.col("__gn") - F.lit(1.0))
    )
    pos = (F.floor(pr * (F.col("__N") - F.lit(1))) + F.lit(1)).cast("long")
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .withColumn("__pos", pos)
        .join(ref.drop("__N"), "__pos")
        .drop("__pos", "__grk", "__gn", "__N")
    )


def bradley_terry(
    duels: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    *,
    iters: int = 5,
) -> DataFrame:
    """Bradley-Terry preference ratings from a pairwise duel log via
    ``iters`` fixed rounds of the MM update (Hunter 2004) — the model
    behind RLHF preference aggregation and arena-style quality
    leaderboards, run where the duel log lives instead of collecting
    it: ``p_i' = W_i / Σ_j n_ij / (p_i + p_j)``, mean-normalized each
    round.

    Shape: the (possibly huge) duel log reduces ONCE to a directed
    pair-count table — one map-side-combinable aggregation keyed on
    (winner, loser); everything after runs on that aggregate, which is
    bounded by the number of dueling item pairs, not the number of
    duels. Per round: the symmetric pair table joins the current
    ratings on both endpoints (item-keyed shuffles AQE can reuse
    between rounds, like :func:`operators.graph.pagerank`) and one
    sum-aggregate per item; state is one (item, rating) row per item —
    nothing duel-log-sized ever reaches the driver.

    Zero-win items rate 0 (the MLE boundary). Division never sees
    0 + 0: two items that dueled cannot both be globally winless (one
    of them won that duel), so any pair present in the table has a
    positive denominator.

    Determinism contract (shared with the unrolled SQL oracle):
    per-item denominators round to 9 dp and the mean-normalized
    ratings to 6 dp after every round, so both engines feed identical
    literals into the next iteration regardless of summation order.
    Fixed ``iters`` (no convergence test) keeps the unrolled oracle
    exactly equivalent.
    """
    directed = duels.groupBy(
        F.col(winner_col).alias("a"), F.col(loser_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("__c"))
    return bradley_terry_from_counts(directed, iters=iters)


def bradley_terry_from_counts(
    directed: DataFrame,
    *,
    iters: int = 5,
    a_col: str = "a",
    b_col: str = "b",
    count_col: str = "__c",
) -> DataFrame:
    """:func:`bradley_terry` starting from an already-aggregated
    directed pair-count table ``(a_col=winner, b_col=loser,
    count_col=#duels)`` — the form a streaming maintainer persists, so
    live arena ratings re-fit from the stored aggregate at
    O(dueling pairs) cost, never re-reading the duel log."""
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    directed = directed.select(
        F.col(a_col).alias("a"),
        F.col(b_col).alias("b"),
        F.col(count_col).alias("__c"),
    )
    directed = persist_tracked(directed)
    sym = (
        directed.select("a", "b", "__c")
        .unionAll(
            directed.select(
                F.col("b").alias("a"), F.col("a").alias("b"), F.col("__c")
            )
        )
        .groupBy("a", "b")
        .agg(F.sum("__c").alias("__n"))
    )
    sym = persist_tracked(sym)
    wins = directed.groupBy("a").agg(F.sum("__c").alias("wins"))
    items = (
        sym.groupBy("a")
        .agg(F.sum("__n").alias("n_duels"))
        .join(wins, "a", "left")
        .select(
            F.col("a").alias("item"),
            F.coalesce(F.col("wins"), F.lit(0)).cast("long").alias("wins"),
            F.col("n_duels").cast("long").alias("n_duels"),
        )
    )
    items = persist_tracked(items)

    ratings = items.select("item", F.lit(1.0).alias("__p"))
    for _ in range(iters):
        pi = ratings.select(
            F.col("item").alias("a"), F.col("__p").alias("__pi")
        )
        pj = ratings.select(
            F.col("item").alias("b"), F.col("__p").alias("__pj")
        )
        denom = (
            sym.join(pi, "a")
            .join(pj, "b")
            .groupBy("a")
            .agg(
                F.round(
                    F.sum(F.col("__n") / (F.col("__pi") + F.col("__pj"))), 9
                ).alias("__d")
            )
        )
        # checkpoint RAW, not ratings (round-10 optimization): the mean
        # aggregate AND the normalized ratings both read this round's
        # join chain — checkpointing after the normalization made the
        # chain (2 joins + groupBy + items join) execute twice per
        # round, once for the mean broadcast and once for the next
        # round's checkpoint. Checkpointing raw halves the per-round
        # join work; ratings stays a narrow projection over it (the
        # broadcast exchange is shared by the pi/pj branches).
        raw = (
            items.join(denom, items["item"] == denom["a"])
            .select("item", (F.col("wins") / F.col("__d")).alias("__raw"))
            .localCheckpoint(eager=False)
        )
        mean = raw.agg(F.avg("__raw").alias("__mean"))
        ratings = raw.crossJoin(F.broadcast(mean)).select(
            "item",
            F.round(F.col("__raw") / F.col("__mean"), 6).alias("__p"),
        )
    return items.join(ratings, "item").select(
        "item", "wins", "n_duels", F.col("__p").alias("rating")
    )
