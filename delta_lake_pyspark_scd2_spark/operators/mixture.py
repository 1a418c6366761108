"""Domain-mixture resampling: hit a target source distribution.

Pretraining corpora are mixed to target shares (e.g. The Pile's /
Llama's per-source weights): given per-domain target weights, keep a
deterministic subsample of each domain so the output matches the
target mixture at the largest size the data supports (no domain is
oversampled — this operator downsamples only).

Plan shape (100 TB story): per-domain counts are one map-side-combined
aggregation over the group column; the handful of (domain, keep
threshold) rows then ride a **broadcast** back onto the corpus, and
row selection is a narrow deterministic hash filter — same rows kept
on any cluster size, any partitioning, any run. No driver-side
``collect``, no ``ORDER BY rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.functions.hashing import keep_hash

#: Modulus for the deterministic keep-hash (md5-derived, engine-portable).
_MOD = 1_000_000


def _keep_hash(id_col: str):
    return keep_hash(F.col(id_col), _MOD)


def sample_to_mixture(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministically subsample ``df`` so the kept rows follow the
    ``weights`` mixture over ``group_col``.

    The output size is the largest N with ``share_g * N <= n_g`` for
    every weighted domain g (domains not in ``weights`` are dropped).
    Expected kept rows per domain = ``share_g * N``; membership is the
    stable md5 threshold test, so resampling is reproducible and
    monotone (a smaller target keeps a subset of a larger one).
    """
    spark = df.sparkSession
    tot = float(sum(weights.values()))
    w = spark.createDataFrame(
        [(g, float(wt) / tot) for g, wt in weights.items()],
        f"{group_col} string, share double",
    )
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    # persisted (tracked): feeds both the capacity scalar and the
    # threshold table — unpersisted, the corpus count aggregation ran
    # twice; the cache is domains-sized (round-10)
    counts = persist_tracked(
        df.join(F.broadcast(w), group_col)
        .groupBy(group_col, "share")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # capacity: the largest mixture size the scarcest domain supports
    cap = counts.select(F.min(F.col("n") / F.col("share")).alias("cap"))
    thr = counts.crossJoin(F.broadcast(cap)).select(
        group_col,
        (F.col("share") * F.col("cap") / F.col("n") * _MOD).alias("keep_thr"),
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(_keep_hash(id_col) < F.col("keep_thr"))
        .drop("keep_thr")
    )


def sample_to_temperature(
    df: DataFrame,
    alpha: float = 0.7,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture: target share of domain g is
    ``n_g**alpha / Σ n_h**alpha`` — the standard up-weighting of rare
    domains in multilingual/multi-source pretraining recipes
    (``alpha=1`` keeps the natural mixture, ``alpha→0`` approaches
    uniform). Downsamples only: output is the largest N every domain
    can serve at its tempered share.

    Same plan shape as :func:`sample_to_mixture` except the weights
    come from the data itself: ONE map-side-combined count per domain,
    a handful of (domain, threshold) rows broadcast back, then the
    narrow deterministic md5 keep-filter — reproducible on any cluster
    shape, no driver collect.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    # persisted (tracked): the domain-count table feeds three scalar
    # branches (tot, cap, thr) — unpersisted, each re-ran the full
    # corpus count aggregation; the cache is domains-sized (round-10)
    counts = persist_tracked(
        df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    )
    powed = counts.withColumn("npow", F.pow("n", F.lit(float(alpha))))
    tot = powed.agg(F.sum("npow").alias("tot"))
    shares = powed.crossJoin(F.broadcast(tot)).select(
        group_col, "n", (F.col("npow") / F.col("tot")).alias("share")
    )
    cap = shares.select(F.min(F.col("n") / F.col("share")).alias("cap"))
    thr = shares.crossJoin(F.broadcast(cap)).select(
        group_col,
        (F.col("share") * F.col("cap") / F.col("n") * _MOD).alias("keep_thr"),
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(_keep_hash(id_col) < F.col("keep_thr"))
        .drop("keep_thr")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    *,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES): each row draws ``u ∈ (0,1)`` from a keyed md5 hash
    of its id and ranks by ``u^(1/w)`` — the top ``k`` keys are an
    exact weighted sample, reproducible across engines, runs, and
    cluster shapes (no ``rand(seed)``, whose draw depends on row→
    partition placement).

    Ranking uses the order-equivalent ``w / -ln(u)`` (monotone in
    ``u^(1/w)``): its spread survives 6-dp rounding where the
    near-1.0 power key would collapse into ties. Map-side work is one
    hash + log per row; the only shuffle is the top-k over keys
    (TakeOrdered — k rows per partition reach the driver-side merge).
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"), F.col(id_col).cast("string")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    wkey = F.round(weight.cast("double") / -F.log(u), 6)
    return (
        df.withColumn("wkey", wkey)
        .orderBy(F.desc("wkey"), F.col(id_col).asc())
        .limit(k)
    )


def dsir_importance_scores(
    docs: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Importance-resampling scores for data selection (the DSIR
    recipe, Xie et al. 2023, arXiv:2302.03169, over unigram features):
    each corpus document scored by its mean per-token log-likelihood
    ratio between a small TARGET domain's unigram LM and the whole
    corpus' — rank high, and you select general-corpus text that reads
    like the target domain (the cheap pre-filter before training a
    quality classifier).

    ``score(d) = mean_w ln( p_target(w) / p_corpus(w) )`` with add-one
    smoothing over the CORPUS vocabulary for both models, so a word
    the target never saw contributes a finite negative ratio and
    out-of-vocabulary tokens cannot divide by zero. Output covers
    EVERY corpus row: a doc normalizing to zero tokens scores NULL
    (explicitly unrankable, never silently absent), and an empty
    target degrades to the uniform smoothed model.

    Plan shape: word stats are two vocab-sized aggregations (corpus,
    target) joined broadcast onto the corpus token stream — one
    corpus-sized explode, one per-doc mean; model sizes re-enter as a
    broadcast single-row cross join. Nothing iterative: the "trained
    models" ARE the count tables.

    Cross-engine float contract: per-token ratios are a single
    ``ln`` over exactly-equal doubles rounded to 9 dp; the per-doc
    mean rounds to 6 dp (sum-order error ~1e-12 ≪ 5e-7).
    """
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )
    from delta_lake_pyspark_scd2_spark.operators.text import (
        word_counts,
        word_tokens,
    )

    # ONE corpus tokenize pass (round-10 optimization): the per-doc
    # word counts are persisted once and feed BOTH the corpus LM
    # (Σ_doc is exact — integer counts) and the probe join, which
    # previously re-ran the normalize+split+explode over the whole
    # corpus as a raw token stream. The probe join now also shuffles
    # count-compressed (doc, word, c) rows instead of one row per
    # token occurrence (guide §2.3: shuffle fewer bytes).
    m = persist_tracked(
        word_tokens(docs, text_col, id_col)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    corpus_counts = persist_tracked(
        m.groupBy("word").agg(F.sum("__c").alias("__cw"))
    )
    # referenced twice below (size scalar + model join) — persist, or
    # the target side tokenizes twice per action
    target_counts = persist_tracked(
        word_counts(target, text_col).withColumnRenamed("c", "__tw")
    )
    # An EMPTY target degrades to the uniform smoothed model
    # (t_w = 0, n_t = 0 → p_t(w) = 1/V): scores stay defined instead
    # of the empty-sum NULL silently zeroing every ranking.
    sizes = corpus_counts.agg(
        F.sum("__cw").alias("__n_c"),
        F.count(F.lit(1)).alias("__v"),
    ).crossJoin(
        target_counts.agg(
            F.coalesce(F.sum("__tw"), F.lit(0)).alias("__n_t")
        )
    )
    model = (
        corpus_counts.join(target_counts, "word", "left")
        .crossJoin(F.broadcast(sizes))
        .select(
            "word",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("__tw"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        * (F.col("__n_c") + F.col("__v")).cast("double")
                    )
                    / (
                        (F.col("__cw") + 1).cast("double")
                        * (F.col("__n_t") + F.col("__v")).cast("double")
                    )
                ),
                9,
            ).alias("__llr"),
        )
    )
    # the shared tokenizer guarantees every token exists in the model
    # vocabulary (same split built corpus_counts), so the inner probe
    # join cannot drop occurrences.
    # the model IS the full corpus vocabulary — unbounded by
    # construction, so no forced broadcast hint (a web-scale corpus
    # has 10^8-10^9 unigrams; Spark hard-fails broadcasts at 8 GB).
    # model is already word-keyed from its aggregation, so AQE either
    # broadcasts it at runtime (when genuinely small) or falls back to
    # a word-keyed shuffle join for free. The principled fixed-size
    # variant is dsir_importance_scores_hashed below.
    # Per-doc mean as the count-weighted form over (doc, word, c):
    # every token row of a (doc, word) group carries the same 9-dp-
    # rounded __llr, so Σ_w c·llr / Σ_w c equals the token-level avg
    # exactly in ℝ; the FP summation-structure delta (~1e-15 relative)
    # sits twelve orders below the 6-dp rounding boundary — the same
    # sum-order contract the docstring already pins (oracle-verified
    # hash-identical at sf0.001/sf0.01/sf0.1).
    scored = (
        m.join(model, "word")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("__llr") * F.col("__c")) / F.sum("__c"), 6
            ).alias("dsir_score")
        )
    )
    # full coverage: a doc normalizing to zero tokens gets an explicit
    # NULL score rather than silently vanishing from a keep-list join
    return docs.select(id_col).join(scored, id_col, "left")


def dsir_importance_scores_hashed(
    docs: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10000,
) -> DataFrame:
    """DSIR importance scores over HASHED n-gram features — the actual
    Xie et al. 2023 recipe (§2.2: "hashed n-gram features" with a
    fixed bucket count) and the scale-correct sibling of
    :func:`dsir_importance_scores`.

    Every token is folded into one of ``n_buckets`` buckets via the
    engine's md5 hash convention (same as
    :func:`~..operators.text.hashed_tfidf_embedding`), so both unigram
    LMs are count tables of AT MOST ``n_buckets`` rows regardless of
    corpus vocabulary — the importance model stays broadcastable at
    any corpus size, where the exact-unigram variant's vocab-sized
    model cannot be (10^8-10^9 distinct unigrams at web scale).
    ``score(d) = mean_b ln( p_target(b) / p_corpus(b) )`` with add-one
    smoothing over the FIXED bucket space (denominators use
    ``n_buckets``, not the observed vocabulary).

    Same coverage contract as the exact variant: every corpus row is
    returned (zero-token docs score NULL), and an empty target
    degrades to the uniform smoothed model. Same float contract:
    9-dp ratio terms, 6-dp per-doc mean.
    """
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )
    from delta_lake_pyspark_scd2_spark.operators.text import word_tokens

    from delta_lake_pyspark_scd2_spark.operators.dedup import _md5_32

    def _bucket(col):
        # the ONE engine hash convention (dedup._md5_32) — a third
        # inlined copy would let the oracle contract drift silently
        return (_md5_32(col) % n_buckets).cast("int")

    # ONE corpus tokenize+hash pass (round-10 optimization, the exact
    # variant's pattern): per-doc bucket counts persist once and feed
    # both the corpus LM (Σ_doc, exact integers) and the probe join,
    # which now shuffles count-compressed (doc, bucket, c) rows.
    m = persist_tracked(
        word_tokens(docs, text_col, id_col)
        .select(id_col, _bucket(F.col("word")).alias("__b"))
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    corpus_counts = persist_tracked(
        m.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    )
    target_counts = persist_tracked(
        word_tokens(target, text_col)
        .select(_bucket(F.col("word")).alias("__b"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__tb"))
    )
    sizes = corpus_counts.agg(F.sum("__cb").alias("__n_c")).crossJoin(
        target_counts.agg(
            F.coalesce(F.sum("__tb"), F.lit(0)).alias("__n_t")
        )
    )
    model = (
        corpus_counts.join(target_counts, "__b", "left")
        .crossJoin(F.broadcast(sizes))
        .select(
            "__b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("__tb"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        * (F.col("__n_c") + n_buckets).cast("double")
                    )
                    / (
                        (F.col("__cb") + 1).cast("double")
                        * (F.col("__n_t") + n_buckets).cast("double")
                    )
                ),
                9,
            ).alias("__llr"),
        )
    )
    # the model is ≤ n_buckets rows BY CONSTRUCTION — this broadcast is
    # bounded, unlike the exact variant's vocab-sized model. Count-
    # weighted per-doc mean over (doc, bucket, c): identical in ℝ to
    # the token-level avg (same 9-dp __llr per bucket), FP delta far
    # below the 6-dp rounding (see the exact variant's note).
    scored = (
        m.join(F.broadcast(model), "__b")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("__llr") * F.col("__c")) / F.sum("__c"), 6
            ).alias("dsir_score")
        )
    )
    return docs.select(id_col).join(scored, id_col, "left")


def quality_filter_per_group(
    df: DataFrame,
    score: Column,
    *,
    keep_frac: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    exact: bool = False,
    accuracy: int = 1_000_000,
) -> DataFrame:
    """Per-group relative quality gate (the FineWeb-style recipe):
    keep each group's top ``keep_frac`` of rows by ``score`` — a
    per-LANGUAGE quantile, where a single global threshold would
    silently drop whole low-resource languages whose score
    distribution sits below the high-resource ones.

    Default (scale path, ``exact=False``): two-pass threshold —
    ``groupBy(group).agg(percentile_approx(score, 1-keep_frac))``
    (map-side combinable, bounded ``accuracy``-sized sketch state per
    group), broadcast the ≤|groups|-row threshold table, then filter
    ``score >= threshold``. NO per-group sort window anywhere, so the
    dominant language of a 100 TB corpus never lands in one task.
    Boundary semantics: every row tied with the threshold value is
    kept (deterministic, id-independent); for groups smaller than
    ``accuracy`` the sketch is exact and the threshold equals the
    discrete ascending quantile ``sorted[ceil((1-keep_frac)*n)-1]``
    (= DuckDB ``quantile_disc``), so the kept set is engine-stable.

    ``exact=True`` is the rank-based oracle twin: ``percent_rank``
    over (score desc, id asc) — exact ``keep_frac`` membership with an
    id tiebreak, at the cost of one sort task per group. Subset
    guarantee, scoped (round-6 ADVICE): for groups ≤ ``accuracy`` the
    sketch is exact, so the exact path's kept set is a SUBSET of the
    scale path's (the threshold form only adds boundary ties) —
    ``tests/test_broadcast_bounds.py`` pins that relationship at test
    sizes. For groups LARGER than ``accuracy`` the approximate
    threshold may sit up to the sketch's rank-error above the true
    quantile, so the scale path can drop rows the exact path keeps;
    raise ``accuracy`` (state is O(accuracy) per group) when the kept
    sets must nest at scale.
    """
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(
            score.desc(), F.col(id_col).asc()
        )
        return (
            df.withColumn("__pr", F.percent_rank().over(w))
            .filter(F.col("__pr") <= keep_frac)
            .drop("__pr")
        )
    thresholds = df.groupBy(F.col(group_col).alias("__tgrp")).agg(
        F.percentile_approx(score, F.lit(1.0 - keep_frac), F.lit(accuracy)).alias(
            "__thr"
        )
    )
    # null-safe group join: a NULL group (unclassified docs) is its own
    # quantile population, exactly as the percent_rank twin treats its
    # NULL window partition — a plain equi-join would silently drop it
    return (
        df.join(
            F.broadcast(thresholds),
            F.col(group_col).eqNullSafe(F.col("__tgrp")),
        )
        .filter(score >= F.col("__thr"))
        .drop("__tgrp", "__thr")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap_share: float,
    order_cols: list,
    *,
    rank_col: str | None = None,
) -> DataFrame:
    """Frequency capping: no group may exceed ``cap_share`` of the
    total — the web-corpus rule that stops one mega-domain/source from
    dominating a mixture (RefinedWeb/C4-style per-domain caps). Groups
    over budget keep their best ``floor(cap_share * N)`` rows by
    ``order_cols`` (pass a total ordering for determinism); groups
    under budget pass through whole.

    Scale: the budget ``floor(cap_share * N)`` is the SAME for every
    group, so it rides as one broadcast scalar row (never a
    one-row-per-group table — at millions of domains that broadcast
    would itself be the hazard); ranking is a window partitioned BY
    THE GROUP (never a global sort). One count aggregation + one
    group-keyed window shuffle at any corpus size. ``rank_col``
    optionally exposes the within-group rank.
    """
    if not 0 < cap_share <= 1:
        raise ValueError(f"cap_share must be in (0, 1], got {cap_share}")
    if not order_cols:
        raise ValueError("order_cols must be a non-empty total ordering")
    budget = df.agg(
        F.floor(F.lit(cap_share) * F.count(F.lit(1)))
        .cast("long")
        .alias("__budget")
    )
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    ranked = df.withColumn("__rk", F.row_number().over(w))
    out = ranked.crossJoin(F.broadcast(budget)).filter(
        F.col("__rk") <= F.col("__budget")
    )
    if rank_col:
        return out.withColumnRenamed("__rk", rank_col).drop("__budget")
    return out.drop("__rk", "__budget")


def loss_reweight(
    scored: DataFrame,
    group_col: str,
    nll_col: str,
    *,
    temperature: float = 0.5,
) -> DataFrame:
    """Loss-aware mixture reweighting (the DoReMi intuition, Xie et
    al. 2023, as a closed-form heuristic rather than the minimax
    training loop): upweight domains whose held-in language-model loss
    is high relative to the corpus — hard/underfit domains get more
    sampling mass — via an exponential-tilt softmax over per-domain
    mean NLL, anchored at the natural share:

        weight_g ∝ share_g * exp(mean_nll_g / temperature)

    ``scored`` is one row per document with ``group_col`` and
    ``nll_col`` (a per-doc negative log-likelihood, e.g.
    ``-avg_logp`` from :func:`operators.text.bigram_lm_scores`).

    Scale: one grouped aggregation to (group, n_docs, mean_nll) —
    map-side combinable — then all softmax arithmetic runs on the
    groups-sized table against two broadcast scalars. Determinism
    contract: per-group means round to 6 dp before the exp tilt,
    tilted masses to 6 dp before normalizing, final weights to 4 dp
    (the text_bigram_ppl precedent for cross-engine exp()).

    Returns ``(group, n_docs, base_share, mean_nll, excess_nll,
    weight)``; weights sum to 1 up to rounding.
    """
    # scored feeds TWO aggregations (per-group and corpus-wide);
    # unpersisted, a non-trivial upstream (the bigram-LM scorer in
    # mixture_loss_reweight) executes twice end to end. Persist once —
    # the frame is (doc, group, nll), narrow rows. (round-10
    # optimization; keeps both aggregates byte-identical, unlike
    # deriving the corpus mean from rounded group means)
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    scored = persist_tracked(scored.select(group_col, nll_col))
    g = scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col(nll_col)), 6).alias("mean_nll"),
    )
    totals = scored.agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(F.avg(F.col(nll_col)), 6).alias("__corpus_nll"),
    )
    tilted = (
        g.crossJoin(F.broadcast(totals))
        .withColumn(
            "base_share", F.round(F.col("n_docs") / F.col("__n"), 6)
        )
        .withColumn(
            "excess_nll",
            F.round(F.col("mean_nll") - F.col("__corpus_nll"), 6),
        )
        .withColumn(
            "__mass",
            F.round(
                F.col("base_share")
                * F.exp(F.col("mean_nll") / F.lit(temperature)),
                6,
            ),
        )
    )
    z = tilted.agg(F.sum("__mass").alias("__z"))
    return (
        tilted.crossJoin(F.broadcast(z))
        .select(
            group_col,
            F.col("n_docs").cast("long").alias("n_docs"),
            "base_share",
            "mean_nll",
            "excess_nll",
            F.round(F.col("__mass") / F.col("__z"), 4).alias("weight"),
        )
    )
