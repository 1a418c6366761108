"""Count-min sketch: over-estimate guarantee, mergeability, probe
semantics — plus the embedding decontamination screen built next to it
this round.

Naive-reference strategy (SURVEY.md §5): exact counts computed with
plain Python dicts are the ground truth; the sketch must never
under-estimate any of them, and sketches of disjoint corpus halves
merged bucket-wise must be bit-identical to the whole-corpus sketch.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import sketches

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick blue hare sleeps under the old tree",
    "a dog and a fox share the quick meadow",
    "merge sort beats bubble sort on the big table",
    "the the the the repeated token stress row",
]


def _counts_df(spark, docs):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "id INT, text STRING")
    return (
        df.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def _exact(docs) -> Counter:
    c: Counter = Counter()
    for t in docs:
        c.update(w for w in t.split(" ") if w)
    return c


def test_cms_never_underestimates(spark):
    counts = _counts_df(spark, DOCS)
    cms = sketches.count_min_build(counts, "word", "c")
    est = {
        r["word"]: r["cms_estimate"]
        for r in sketches.count_min_estimate(
            cms, counts.select("word"), "word"
        ).collect()
    }
    exact = _exact(DOCS)
    assert set(est) == set(exact)
    for w, n in exact.items():
        assert est[w] >= n, f"under-estimate for {w!r}: {est[w]} < {n}"


def test_cms_exact_when_collision_free(spark):
    # 4x1024 cells vs ~30 distinct words: a collision in ALL 4 rows for
    # some word is (30/1024)^4-improbable; the MIN therefore recovers
    # the exact count for every word of this corpus.
    counts = _counts_df(spark, DOCS)
    cms = sketches.count_min_build(counts, "word", "c")
    est = sketches.count_min_estimate(cms, counts.select("word"), "word")
    joined = counts.join(est, "word").collect()
    assert all(r["cms_estimate"] == r["c"] for r in joined)


def test_cms_merge_equals_whole(spark):
    half_a, half_b = DOCS[:2], DOCS[2:]
    whole = sketches.count_min_build(_counts_df(spark, DOCS), "word", "c")
    merged = sketches.count_min_merge(
        sketches.count_min_build(_counts_df(spark, half_a), "word", "c"),
        sketches.count_min_build(_counts_df(spark, half_b), "word", "c"),
    )
    w = {(r["d"], r["bucket"]): r["cnt"] for r in whole.collect()}
    m = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert w == m


def test_cms_absent_item_estimates_zero_without_full_grid(spark):
    # Sparse representation: cells no item hashed to are absent rows;
    # a probe for a never-seen word must read them as 0 counters (the
    # left join + coalesce path), not fail or inflate.
    counts = _counts_df(spark, DOCS)
    cms = sketches.count_min_build(counts, "word", "c")
    items = spark.createDataFrame(
        [("zzz_never_seen_word_123",)], "word STRING"
    )
    [row] = sketches.count_min_estimate(cms, items, "word").collect()
    # With ~30 occupied cells of 4096, all-4-collisions is ~1e-6; the
    # fixed md5 hashing makes the outcome deterministic, so assert the
    # exact sketch answer.
    assert row["cms_estimate"] == 0


def test_cms_sketch_size_bounded(spark):
    counts = _counts_df(spark, DOCS)
    cms = sketches.count_min_build(counts, "word", "c", depth=2, width=8)
    rows = cms.collect()
    assert len(rows) <= 2 * 8
    assert all(0 <= r["bucket"] < 8 and r["d"] in (0, 1) for r in rows)
    # Every hash row sees every token occurrence exactly once: the
    # per-row column sums all equal the corpus token count.
    total = sum(_exact(DOCS).values())
    per_row = Counter()
    for r in rows:
        per_row[r["d"]] += r["cnt"]
    assert per_row[0] == per_row[1] == total


def test_embedding_contamination_flags_copies_and_clears_orthogonal(spark):
    from delta_lake_pyspark_scd2_spark.operators.decontam import (
        embedding_contamination,
    )

    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    ortho = [0.0] * (dim - 1) + [1.0]
    near = [0.9] + [0.1] * (dim - 1)  # cos vs e1 ≈ 0.93
    eval_vecs = spark.createDataFrame(
        [(0, e1), (1, e2)], "vec_id INT, embedding ARRAY<DOUBLE>"
    )
    corpus = spark.createDataFrame(
        [(10, e1), (11, near), (12, ortho)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    out = {
        r["vec_id"]: r
        for r in embedding_contamination(
            corpus, eval_vecs, threshold=0.9
        ).collect()
    }
    assert set(out) == {10, 11, 12}  # every corpus row labeled
    assert out[10]["contaminated"] and out[10]["max_eval_sim"] == 1.0
    assert out[11]["contaminated"] and out[11]["max_eval_sim"] >= 0.9
    assert not out[12]["contaminated"] and out[12]["max_eval_sim"] == 0.0


def test_embedding_contamination_plan_broadcasts_eval_side(spark):
    from delta_lake_pyspark_scd2_spark.operators.decontam import (
        embedding_contamination,
    )

    vecs = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=int(i)) for i in range(4)]).alias("embedding"),
    )
    plan = embedding_contamination(
        vecs.filter("vec_id >= 8"), vecs.filter("vec_id < 8")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_embedding_contamination_empty_eval_keeps_full_coverage(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from delta_lake_pyspark_scd2_spark.operators.decontam import (
        embedding_contamination,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    empty_eval = corpus.filter(F.lit(False))
    out = {
        r["vec_id"]: r
        for r in embedding_contamination(corpus, empty_eval).collect()
    }
    # nothing to screen still reports every corpus row, uncontaminated
    assert set(out) == {1, 2}
    assert all(not r["contaminated"] for r in out.values())
    assert all(r["max_eval_sim"] is None for r in out.values())


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORD = st.sampled_from(
    ["the", "fox", "dog", "spark", "merge", "a", "b", "zz", "längère", "0"]
)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=8))
def test_word_counts_matches_python_counter(spark, texts):
    from delta_lake_pyspark_scd2_spark.operators.text import (
        normalize_text,
        word_counts,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {r["word"]: r["c"] for r in word_counts(df).collect()}
    # reference applies the operator's own normalization contract
    normed = [
        r["nt"]
        for r in df.select(normalize_text(F.col("text")).alias("nt")).collect()
    ]
    want: Counter = Counter()
    for t in normed:
        want.update(w for w in t.split(" ") if w)
    assert got == dict(want)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=6))
def test_cms_never_underestimates_on_random_corpora(spark, texts):
    from delta_lake_pyspark_scd2_spark.operators.text import word_counts

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    counts = word_counts(df)
    if not counts.take(1):
        return  # all-empty corpus: nothing to probe
    # tiny width forces real collisions, exercising the over-count path
    cms = sketches.count_min_build(counts, "word", "c", depth=2, width=4)
    est = sketches.count_min_estimate(
        cms, counts.select("word"), "word", depth=2, width=4
    )
    joined = counts.join(est, "word").collect()
    assert joined and all(r["cms_estimate"] >= r["c"] for r in joined)


def test_embedding_health_flags_each_defect_class(spark):
    from delta_lake_pyspark_scd2_spark.operators.validation import (
        embedding_health,
    )

    rows = [
        (0, "a", [1.0, 2.0, 3.0]),            # healthy
        (1, "a", [0.0, 0.0, 0.0]),            # zero norm
        (2, "a", [1.0, 2.0]),                 # wrong dim
        (3, "b", [float("nan"), 1.0, 2.0]),   # NaN
        (4, "b", [float("inf"), 1.0, 2.0]),   # inf
        (5, "b", None),                       # missing vector
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    out = {
        r["label"]: r
        for r in embedding_health(df, dim=3, group_col="label").collect()
    }
    a, b = out["a"], out["b"]
    assert (a["n"], a["n_wrong_dim"], a["n_zero_norm"], a["n_nonfinite"]) == (
        3, 1, 1, 0,
    )
    assert (b["n"], b["n_wrong_dim"], b["n_zero_norm"], b["n_nonfinite"]) == (
        3, 1, 0, 2,
    )
    # global form: one row, defects add up
    [g] = embedding_health(df, dim=3).collect()
    assert (g["n"], g["n_wrong_dim"], g["n_zero_norm"], g["n_nonfinite"]) == (
        6, 2, 1, 2,
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _words_df(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "id INT, text STRING"
    )
    return (
        df.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )


def test_bloom_never_false_negative(spark):
    """Every true member probes as might_contain — the guarantee that
    makes the bloom a sound prefilter."""
    members = _words_df(spark, DOCS)
    bloom = sketches.bloom_build(members, "word")
    flags = {
        r["word"]: r["might_contain"]
        for r in sketches.bloom_might_contain(bloom, members, "word").collect()
    }
    assert flags and all(flags.values())


def test_bloom_merge_is_idempotent_union_and_matches_whole(spark):
    """Sketches of disjoint halves union-merge to exactly the
    whole-corpus sketch, and re-merging a half is a no-op (set union
    is idempotent — no replay guard needed, unlike the counters)."""
    a = sketches.bloom_build(_words_df(spark, DOCS[:2]), "word")
    b = sketches.bloom_build(_words_df(spark, DOCS[2:]), "word")
    whole = {
        r["pos"]
        for r in sketches.bloom_build(_words_df(spark, DOCS), "word").collect()
    }
    merged = {r["pos"] for r in sketches.bloom_merge(a, b).collect()}
    remerged = {r["pos"] for r in sketches.bloom_merge(a, b, a).collect()}
    assert merged == whole
    assert remerged == whole


def test_bloom_absent_items_mostly_rejected(spark):
    """At this geometry (4 x 16384 bits, tens of members) the FP rate
    is far below 1, so a batch of absent probes must be dominated by
    False flags — and any True among them is a collision, never an
    error the exact confirm can't absorb."""
    members = _words_df(spark, DOCS)
    bloom = sketches.bloom_build(members, "word")
    absent = spark.createDataFrame(
        [(f"absent-token-{i}",) for i in range(200)], "word STRING"
    )
    flags = [
        r["might_contain"]
        for r in sketches.bloom_might_contain(bloom, absent, "word").collect()
    ]
    assert len(flags) == 200
    assert sum(flags) <= 2  # expected ~0 at p ~ (kn/m)^k


def test_bloom_bitstring_expr_matches_join_probe(spark):
    """The zero-join literal-bitmap probe (bloom_hit_expr) and the
    broadcast-join probe (bloom_might_contain) are the same function."""
    members = _words_df(spark, DOCS[:3])
    bloom = sketches.bloom_build(members, "word")
    bitmap = sketches.bloom_bitstring(bloom)
    probes = _words_df(spark, DOCS)  # members + non-members
    via_join = {
        r["word"]: r["might_contain"]
        for r in sketches.bloom_might_contain(bloom, probes, "word").collect()
    }
    via_expr = {
        r["word"]: r["hit"]
        for r in probes.select(
            "word", sketches.bloom_hit_expr(F.col("word"), bitmap).alias("hit")
        ).collect()
    }
    assert via_expr == via_join
    member_words = {r["word"] for r in members.collect()}
    assert all(via_expr[w] for w in member_words)


def test_bloom_decontam_two_stage_matches_exact(spark):
    """contamination_bloom's exact flag == contamination's flag on
    every doc, and bloom_hit is a superset of contaminated (no false
    negatives); stage 2 only ever runs on bloom-hit docs."""
    from delta_lake_pyspark_scd2_spark.operators import decontam

    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today ok fine yes")],
        "doc_id LONG, text STRING",
    )
    corpus = spark.createDataFrame(
        [
            # shares a 13-gram window? n=5 here for short texts
            (1, "the quick brown fox jumps over the lazy dog today ok"),
            (2, "completely unrelated content about merge sort and tables"),
            (3, "another clean document with no overlap whatsoever here"),
        ],
        "doc_id LONG, text STRING",
    )
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontam.contamination(corpus, eval_docs, n=5).collect()
    }
    two_stage = {
        r["doc_id"]: (r["bloom_hit"], r["contaminated"])
        for r in decontam.contamination_bloom(corpus, eval_docs, n=5).collect()
    }
    assert set(two_stage) == set(exact)
    for doc_id, (bloom_hit, contaminated) in two_stage.items():
        assert contaminated == exact[doc_id]
        if contaminated:
            assert bloom_hit  # no false negatives
    assert two_stage[1][1] and not two_stage[2][1] and not two_stage[3][1]


def test_bloom_probe_tolerates_duplicate_pos_rows(spark):
    """A sketch frame with duplicate set-bit rows (raw union, never
    re-distincted) must not flip members to False via join fanout."""
    members = _words_df(spark, DOCS)
    bloom = sketches.bloom_build(members, "word")
    doubled = bloom.unionByName(bloom)  # every pos twice
    flags = {
        r["word"]: r["might_contain"]
        for r in sketches.bloom_might_contain(
            doubled, members, "word"
        ).collect()
    }
    assert flags and all(flags.values())


def test_bloom_hit_expr_plan_has_no_join_or_exchange(spark):
    """The literal-bitmap probe is the ZERO-JOIN path by contract: the
    membership test must compile to pure expressions (substr + conv on
    a literal), never a broadcast join or shuffle — that is the whole
    reason decontam_bloom's stage 1 can run inside the corpus scan."""
    df = spark.range(100).select(F.col("id").cast("string").alias("item"))
    bitmap = "01" * (sketches.BLOOM_BITS // 2)
    plan = (
        df.select(sketches.bloom_hit_expr(F.col("item"), bitmap).alias("h"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_cms_join_size_never_underestimates_and_exact_when_collision_free(spark):
    """Inner-product join-size estimate: >= the true equi-join
    cardinality always; == when no keys collide in any hash row."""
    a_counts = spark.createDataFrame(
        [("k1", 3), ("k2", 2), ("k3", 5)], "word STRING, c BIGINT"
    )
    b_counts = spark.createDataFrame(
        [("k1", 4), ("k3", 1), ("k9", 7)], "word STRING, c BIGINT"
    )
    exact = 3 * 4 + 5 * 1  # shared keys k1, k3
    cms_a = sketches.count_min_build(a_counts, "word", "c")
    cms_b = sketches.count_min_build(b_counts, "word", "c")
    est = sketches.count_min_join_size(cms_a, cms_b).collect()[0][0]
    assert est >= exact
    # 6 keys in 1024 buckets: collisions vanishingly unlikely with the
    # fixed md5 contract — pin exactness to catch hashing drift
    assert est == exact


def test_cms_self_join_size_is_f2(spark):
    counts = _counts_df(spark, DOCS)
    f2 = counts.selectExpr("sum(c * c) AS f2").collect()[0][0]
    cms = sketches.count_min_build(counts, "word", "c")
    est = sketches.count_min_join_size(cms, cms).collect()[0][0]
    assert est >= f2


def test_cms_join_size_merge_composes(spark):
    """Sketch of (A union B) inner-product C == merge(cms_A, cms_B)
    inner-product C: the estimator composes with shard merging."""
    a = spark.createDataFrame([("x", 2), ("y", 1)], "word STRING, c BIGINT")
    b = spark.createDataFrame([("x", 1), ("z", 4)], "word STRING, c BIGINT")
    c = spark.createDataFrame([("x", 3), ("z", 2)], "word STRING, c BIGINT")
    whole = spark.createDataFrame(
        [("x", 3), ("y", 1), ("z", 4)], "word STRING, c BIGINT"
    )
    cms_c = sketches.count_min_build(c, "word", "c")
    merged = sketches.count_min_merge(
        sketches.count_min_build(a, "word", "c"),
        sketches.count_min_build(b, "word", "c"),
    )
    est_merged = sketches.count_min_join_size(merged, cms_c).collect()[0][0]
    est_whole = sketches.count_min_join_size(
        sketches.count_min_build(whole, "word", "c"), cms_c
    ).collect()[0][0]
    assert est_merged == est_whole


def test_cms_join_size_disjoint_sketches_estimate_zero(spark):
    """Hash rows where the sketches share no bucket contribute inner
    product 0, so fully (or even partially) disjoint inputs must
    estimate 0 — never NULL, never a collisions-only positive."""
    a = spark.createDataFrame([("only-in-a", 5)], "word STRING, c BIGINT")
    b = spark.createDataFrame([("only-in-b", 7)], "word STRING, c BIGINT")
    est = sketches.count_min_join_size(
        sketches.count_min_build(a, "word", "c"),
        sketches.count_min_build(b, "word", "c"),
    ).collect()[0][0]
    assert est == 0


def test_bloom_packed_probe_matches_join_probe(spark):
    """bloom_hit_packed over the packed words must flag exactly the
    same values as bloom_might_contain over the sparse rows — same
    members, same false-positive collisions."""
    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(200)], "k string"
    )
    probes = spark.createDataFrame(
        [(f"m{i}",) for i in range(0, 400, 3)] + [(f"x{i}",) for i in range(300)],
        "k string",
    )
    bloom = sketches.bloom_build(members, "k", bits=4096)
    want = {
        r["k"]: r["might_contain"]
        for r in sketches.bloom_might_contain(
            bloom, probes, "k", bits=4096
        ).collect()
    }
    words = sketches.bloom_long_array(bloom, bits=4096)
    wdf = spark.createDataFrame([(words,)], "__bf array<long>")
    got = {
        r["k"]: r["hit"]
        for r in probes.crossJoin(F.broadcast(wdf))
        .select(
            "k",
            sketches.bloom_hit_packed(
                F.col("k"), F.col("__bf"), bits=4096
            ).alias("hit"),
        )
        .collect()
    }
    assert got == want
    assert all(got[f"m{i}"] for i in range(0, 200, 3)), "no false negatives"


def test_bloom_long_array_packs_every_set_bit(spark):
    members = spark.createDataFrame([(f"v{i}",) for i in range(50)], "k string")
    bloom = sketches.bloom_build(members, "k", bits=1024)
    words = sketches.bloom_long_array(bloom, bits=1024)
    set_bits = {int(r["pos"]) for r in bloom.select("pos").collect()}
    unpacked = set()
    for i, w in enumerate(words):
        w &= (1 << 64) - 1  # undo signed wrap
        for b in range(64):
            if (w >> b) & 1:
                unpacked.add(i * 64 + b)
    assert unpacked == set_bits
