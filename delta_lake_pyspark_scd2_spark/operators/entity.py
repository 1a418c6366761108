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


def _blocked_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    block_exprs_fn,
    compare_col: str,
    max_distance: int,
    tag_l: str,
    tag_r: str,
    carry_cols: Sequence[str],
    dist_col: str,
    ordered: bool,
) -> DataFrame:
    """Shared blocking-join core: project/rename each side FIRST (so
    shared-lineage inputs never hit ambiguous columns), equi-join on
    the block key with null-safe equality (a NULL blocking attribute
    blocks with its own kind rather than silently matching nothing),
    compute the edit distance ONCE, filter, and emit suffixed pairs.
    ``ordered`` adds the ``key_l < key_r`` self-join dedup predicate.
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

    a = _side(left, tag_l)
    b = _side(right, tag_r)
    nblk = len([c for c in a.columns if c.startswith("__blk")])
    cond = [
        F.col(f"__blk{i}_{tag_l}").eqNullSafe(F.col(f"__blk{i}_{tag_r}"))
        for i in range(nblk)
    ]
    if ordered:
        cond.append(F.col(f"{key_col}_{tag_l}") < F.col(f"{key_col}_{tag_r}"))
    return (
        a.join(b, cond, "inner")
        .withColumn(
            dist_col, F.levenshtein(f"__cmp_{tag_l}", f"__cmp_{tag_r}")
        )
        .filter(F.col(dist_col) <= max_distance)
        .select(
            f"{key_col}_{tag_l}",
            f"{key_col}_{tag_r}",
            dist_col,
            *[f"{c}_{t}" for c in carry_cols for t in (tag_l, tag_r)],
        )
    )


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
    return _blocked_join(
        records,
        records,
        key_col,
        lambda _df: list(block_exprs),
        compare_col,
        max_distance,
        "a",
        "b",
        list(carry_cols),
        dist_col,
        ordered=True,
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
    return _blocked_join(
        left,
        right,
        key_col,
        block_exprs_fn,
        compare_col,
        max_distance,
        "batch",
        "store",
        list(carry_cols),
        dist_col,
        ordered=False,
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
