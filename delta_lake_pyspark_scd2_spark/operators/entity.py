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
