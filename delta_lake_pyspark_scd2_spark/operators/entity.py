"""Entity resolution (record linkage) operators.

Beyond the reference (its notes discuss key collisions but it has no
fuzzy matching): blocking + bounded-edit-distance candidate pairs,
transitive entity ids via distributed connected components, and
golden-record survivorship as a plain aggregation over ``entity_id``.

Scale notes: candidate generation is an equi-join on the block key —
NEVER an all-pairs comparison; with blocks bounded at B records the
pair count is O(N·B), and the join shuffles only the block key plus
the compared columns. Edit distance is JVM-side (``F.levenshtein``,
whole-stage codegen). Entity ids reuse
:func:`~delta_lake_pyspark_scd2_spark.operators.graph.connected_components`
(hash-min label propagation + pointer jumping, O(log diameter)
rounds). Survivorship is one hash aggregation on ``entity_id``. No
Python UDFs, no driver-side loops over records.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_pairs(
    records: DataFrame,
    key_col: str,
    block_exprs: Sequence[Column],
    compare_col: str,
    max_distance: int,
    *,
    carry_cols: Sequence[str] = (),
    dist_col: str = "lev_dist",
) -> DataFrame:
    """Candidate match pairs within blocks, filtered by edit distance.

    Self-joins ``records`` on the block expressions (equi-join — the
    scalable blocking step), keeps ordered pairs ``key_a < key_b`` with
    ``levenshtein(compare_a, compare_b) <= max_distance``. Output
    columns: ``{key}_a``, ``{key}_b``, ``dist_col``, plus each carry
    column suffixed ``_a`` / ``_b`` for residual scoring by the caller.
    """
    sides = {}
    for tag in ("a", "b"):
        sides[tag] = records.select(
            *[e.alias(f"__blk{i}") for i, e in enumerate(block_exprs)],
            F.col(key_col).alias(f"{key_col}_{tag}"),
            F.col(compare_col).alias(f"__cmp_{tag}"),
            *[F.col(c).alias(f"{c}_{tag}") for c in carry_cols],
        )
    nblk = len(block_exprs)
    a, b = sides["a"], sides["b"]
    b = b.select(
        *[F.col(f"__blk{i}").alias(f"__blk{i}_b") for i in range(nblk)],
        *[c for c in b.columns if not c.startswith("__blk")],
    )
    cond = [F.col(f"__blk{i}") == F.col(f"__blk{i}_b") for i in range(nblk)]
    cond.append(F.col(f"{key_col}_a") < F.col(f"{key_col}_b"))
    joined = a.join(b, cond, "inner")
    return joined.filter(
        F.levenshtein("__cmp_a", "__cmp_b") <= max_distance
    ).select(
        f"{key_col}_a",
        f"{key_col}_b",
        F.levenshtein("__cmp_a", "__cmp_b").alias(dist_col),
        *[f"{c}_{t}" for c in carry_cols for t in ("a", "b")],
    )


def entity_ids(
    records: DataFrame,
    key_col: str,
    pairs: DataFrame,
    *,
    key_a: str | None = None,
    key_b: str | None = None,
    entity_col: str = "entity_id",
) -> DataFrame:
    """Label every record with its transitive-closure entity id.

    Matched pairs become undirected edges; connected components assign
    each record the minimum key of its match cluster; records with no
    match are their own singleton entity.
    """
    from delta_lake_pyspark_scd2_spark.operators import graph

    ka = key_a or f"{key_col}_a"
    kb = key_b or f"{key_col}_b"
    comp = graph.connected_components(
        pairs.select(F.col(ka).alias("src"), F.col(kb).alias("dst"))
    )
    return (
        records.join(
            comp.select(
                F.col("node").alias(key_col), F.col("label").alias(entity_col)
            ),
            key_col,
            "left",
        )
        .withColumn(entity_col, F.coalesce(F.col(entity_col), F.col(key_col)))
    )


def blocked_pairs_between(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    block_exprs_fn,
    compare_col: str,
    max_distance: int,
    *,
    carry_cols: Sequence[str] = (),
    dist_col: str = "lev_dist",
) -> DataFrame:
    """Candidate pairs ACROSS two record sets (batch vs stored corpus):
    equi-join on the block key with a bounded edit distance. Output:
    ``{key}_batch``, ``{key}_store``, ``dist_col``, plus carry columns
    suffixed ``_batch`` / ``_store`` for residual filters by the caller.

    This is the incremental-ER ingest shape: cost is O(batch x
    block-size), never O(store) — the stored side is touched only in
    the blocks the batch occupies (partition/bucket pruning applies on
    the block-key join). ``block_exprs_fn(df) -> list[Column]`` builds
    the block key per side; each side is projected and renamed BEFORE
    the join, so batch and store may share lineage (e.g. two filters
    of one table) without ambiguous-column failures.
    """

    def _side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *[
                e.alias(f"__blk{i}_{tag}")
                for i, e in enumerate(block_exprs_fn(df))
            ],
            F.col(key_col).alias(f"{key_col}_{tag}"),
            F.col(compare_col).alias(f"__cmp_{tag}"),
            *[F.col(c).alias(f"{c}_{tag}") for c in carry_cols],
        )

    a = _side(left, "batch")
    b = _side(right, "store")
    nblk = len([c for c in a.columns if c.startswith("__blk")])
    cond = [
        F.col(f"__blk{i}_batch").eqNullSafe(F.col(f"__blk{i}_store"))
        for i in range(nblk)
    ]
    return (
        a.join(b, cond, "inner")
        .filter(F.levenshtein("__cmp_batch", "__cmp_store") <= max_distance)
        .select(
            f"{key_col}_batch",
            f"{key_col}_store",
            F.levenshtein("__cmp_batch", "__cmp_store").alias(dist_col),
            *[f"{c}_{t}" for c in carry_cols for t in ("batch", "store")],
        )
    )


def attach_to_entities(
    batch: DataFrame,
    store: DataFrame,
    key_col: str,
    block_exprs_fn,
    compare_col: str,
    max_distance: int,
    *,
    carry_cols: Sequence[str] = (),
    pair_filter=None,
    entity_col: str = "entity_id",
    matched_col: str = "matched",
) -> DataFrame:
    """Incremental entity resolution: attach each batch record to its
    best-matching stored entity (minimum stored key among blocked
    fuzzy matches — the stored corpus is canonical), or mint the
    record's own key as a new entity. ``pair_filter`` is an optional
    residual predicate over the suffixed pair columns (e.g.
    ``abs(col("bal_batch") - col("bal_store")) <= 500``).

    The batch-internal golden-record pass stays the caller's batch
    job (:func:`entity_ids`); this operator is the O(batch) attach
    step an ingest pipeline runs per micro-batch, mirroring
    dedup's incremental-LSH shape.
    """
    pairs = blocked_pairs_between(
        batch,
        store,
        key_col,
        block_exprs_fn,
        compare_col,
        max_distance,
        carry_cols=carry_cols,
    )
    if pair_filter is not None:
        pairs = pairs.filter(pair_filter)
    best = pairs.groupBy(f"{key_col}_batch").agg(
        F.min(f"{key_col}_store").alias("__ent")
    )
    return (
        batch.join(
            best.withColumnRenamed(f"{key_col}_batch", key_col),
            key_col,
            "left",
        )
        .withColumn(matched_col, F.col("__ent").isNotNull())
        .withColumn(entity_col, F.coalesce(F.col("__ent"), F.col(key_col)))
        .drop("__ent")
    )
