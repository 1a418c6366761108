"""Entity-resolution operators: blocking pins, transitive closure,
and deterministic survivorship on a hand-built fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import entity

ROWS = [
    # block X: a chain ann->ana->aba (transitive: one entity of 3)
    {"id": 1, "blk": "X", "name": "ann", "score": 10.0},
    {"id": 2, "blk": "X", "name": "ana", "score": 30.0},
    {"id": 3, "blk": "X", "name": "aba", "score": 30.0},
    # block X but too far from the chain (distance 2 from all)
    {"id": 4, "blk": "X", "name": "zzz", "score": 99.0},
    # block Y: identical names, pair entity
    {"id": 5, "blk": "Y", "name": "bob", "score": 7.0},
    {"id": 6, "blk": "Y", "name": "bob", "score": 5.0},
    # same name as the X chain but different block: never compared
    {"id": 7, "blk": "Z", "name": "ann", "score": 1.0},
]


def _pairs(spark):
    df = spark.createDataFrame(ROWS)
    return df, entity.blocked_pairs(
        df,
        "id",
        block_exprs=[F.col("blk")],
        compare_col="name",
        max_distance=1,
        carry_cols=["score"],
    )


def test_blocked_pairs_respect_blocks_and_distance(spark):
    _, pairs = _pairs(spark)
    got = {(r.id_a, r.id_b): r.lev_dist for r in pairs.collect()}
    # within-block, ordered, distance<=1; ann-aba is distance 2 => absent;
    # cross-block ann(1)-ann(7) absent despite distance 0
    assert got == {(1, 2): 1, (2, 3): 1, (5, 6): 0}


def test_entity_ids_transitive_and_singletons(spark):
    df, pairs = _pairs(spark)
    labeled = entity.entity_ids(df, "id", pairs)
    ids = {r.id: r.entity_id for r in labeled.collect()}
    # 1-2 and 2-3 matched => {1,2,3} one entity labeled min id 1,
    # even though 1-3 never matched directly
    assert ids == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_survivorship_is_deterministic_under_score_ties(spark):
    df, pairs = _pairs(spark)
    labeled = entity.entity_ids(df, "id", pairs)
    best = (
        labeled.groupBy("entity_id")
        .agg(
            F.max(
                F.struct(
                    F.col("score").alias("s"),
                    (-F.col("id")).alias("negkey"),
                    F.col("name").alias("nm"),
                )
            ).alias("b")
        )
        .select("entity_id", F.col("b.nm").alias("nm"))
    )
    got = {r.entity_id: r.nm for r in best.collect()}
    # entity 1: ids 2 and 3 tie on score 30.0 -> lower id (2, "ana") wins
    assert got[1] == "ana"
    assert got[5] == "bob"


def test_attach_to_entities_matches_or_mints(spark):
    store = spark.createDataFrame(
        [
            {"id": 1, "blk": "X", "name": "ann", "score": 1.0},
            {"id": 2, "blk": "X", "name": "ana", "score": 1.0},
            {"id": 3, "blk": "Y", "name": "zoe", "score": 1.0},
        ]
    )
    batch = spark.createDataFrame(
        [
            # matches both store 1 (ann) and 2 (ana) -> min store key 1
            {"id": 10, "blk": "X", "name": "ann", "score": 1.0},
            # right name, wrong block -> new entity
            {"id": 11, "blk": "Z", "name": "ann", "score": 1.0},
            # distance 2 from zoe -> new entity
            {"id": 12, "blk": "Y", "name": "zit", "score": 1.0},
        ]
    )
    out = entity.attach_to_entities(
        batch,
        store,
        "id",
        lambda df: [df["blk"]],
        "name",
        1,
    )
    got = {r.id: (r.entity_id, r.matched) for r in out.collect()}
    assert got == {10: (1, True), 11: (11, False), 12: (12, False)}


def test_attach_pair_filter_vetoes_blocked_matches(spark):
    store = spark.createDataFrame(
        [{"id": 1, "blk": "X", "name": "ann", "score": 100.0}]
    )
    batch = spark.createDataFrame(
        [{"id": 10, "blk": "X", "name": "ann", "score": 5.0}]
    )
    out = entity.attach_to_entities(
        batch,
        store,
        "id",
        lambda df: [df["blk"]],
        "name",
        1,
        carry_cols=["score"],
        pair_filter=(
            F.abs(F.col("score_batch") - F.col("score_store")) <= 10
        ),
    ).collect()
    assert out[0].matched is False and out[0].entity_id == 10
