"""Eval-set decontamination: drop training documents that overlap a
held-out benchmark.

The standard LLM-corpus hygiene step (GPT-3 App. C / PaLM / Llama data
cards): a training document is *contaminated* if it shares at least one
word-``n``-gram with any evaluation document; contaminated docs are
removed (or flagged) before training so benchmark numbers measure
generalization, not memorization. Goes beyond the reference's surface
(SURVEY.md §2.10 — no text operators there); part of this engine's
LLM-pipeline extension alongside ``operators.dedup``.

Scale story (100 TB corpus, small eval set): eval benchmarks are
thousands of documents — their distinct n-gram set is MBs, so it rides
a **broadcast** semi-join. The corpus side is a narrow explode (1→~L
rows per doc, no shuffle) followed by the broadcast-hash probe; the
only shuffle is the per-doc count aggregation keyed on ``doc_id``
(map-side partial combine applies). Nothing all-pairs, nothing driver
side. If the eval side ever outgrows broadcast, the same plan degrades
gracefully to a shuffled semi-join on the gram key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators.dedup import word_shingles


def eval_ngrams(
    eval_docs: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """Distinct word-``n``-grams of the evaluation set, one per row
    (column ``gram``). Texts shorter than ``n`` words contribute their
    whole normalized text (exact short-text match)."""
    return (
        eval_docs.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )


def contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Label every corpus doc with its eval-set n-gram overlap.

    Returns ``(id_col, shared_grams, contaminated)`` covering every row
    of ``docs``: ``shared_grams`` = number of distinct n-grams the doc
    shares with the eval set, ``contaminated`` = shared_grams > 0.
    """
    grams = F.broadcast(eval_ngrams(eval_docs, n, text_col))
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    hits = (
        doc_grams.join(grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce("shared_grams", F.lit(0)).alias("shared_grams"),
        (F.coalesce("shared_grams", F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus rows that share NO word-``n``-gram with the eval set.

    Implemented as a broadcast **anti**-join of exploded doc grams —
    the survivors keep all their original columns. Equivalent to
    ``contamination(...).filter(~contaminated)`` but skips the count
    aggregation (no shuffle at all when the eval side broadcasts:
    explode → broadcast probe → semi-distinct on the already
    doc-partitioned id)."""
    grams = F.broadcast(eval_ngrams(eval_docs, n, text_col))
    contaminated_ids = (
        docs.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
        )
        .join(grams, "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(contaminated_ids, id_col, "left_anti")


def embedding_contamination(
    corpus: DataFrame,
    eval_vecs: DataFrame,
    *,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination: label every corpus vector with
    its maximum cosine similarity against the eval set.

    The semantic twin of n-gram :func:`contamination` — paraphrased or
    lightly reworded benchmark leakage that shares no 13-gram still
    lands near the eval item in embedding space (the screen run next to
    the n-gram one in modern data cards). Returns
    ``(id_col, max_eval_sim, contaminated)`` covering every corpus row:
    ``max_eval_sim`` = max rounded cosine vs any eval vector,
    ``contaminated`` = max_eval_sim ≥ threshold. An EMPTY eval set
    still returns every corpus row (``max_eval_sim`` NULL,
    ``contaminated`` false) — the screen reports nothing-to-screen
    rather than silently emptying a keep-list built on its output.

    Scale shape: the eval side is benchmarks — thousands of vectors —
    so it **broadcasts** pre-normalized; the corpus side streams
    through a narrow broadcast nested-loop scoring pass (pure JVM
    expressions) followed by one per-id max aggregation that combines
    map-side. Nothing corpus × corpus, nothing driver-side. If the eval
    set ever outgrows broadcast, the same plan degrades to scoring
    against an LSH/IVF-bucketed eval index (``operators.similarity``).
    """
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        cosine_prenormed,
        norm,
    )

    ev = F.broadcast(
        eval_vecs.select(
            F.col(vec_col).alias("__ev"),
        ).withColumn("__en", norm(F.col("__ev")))
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
        .withColumn("__cn", norm(F.col("__cv")))
        # LEFT on an always-true condition = cross product that still
        # KEEPS corpus rows when the eval side is empty (full-coverage
        # contract above); the broadcast right side makes it a
        # BroadcastNestedLoopJoin either way.
        .join(ev, F.lit(True), "left")
        .withColumn(
            "__sim",
            F.round(
                cosine_prenormed(
                    F.col("__cv"), F.col("__ev"), F.col("__cn"), F.col("__en")
                ),
                6,
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.max("__sim").alias("max_eval_sim"),
        F.coalesce(
            F.max("__sim") >= F.lit(threshold), F.lit(False)
        ).alias("contaminated"),
    )


def contamination_bloom(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bits: int | None = None,
    hashes: int | None = None,
) -> DataFrame:
    """Two-stage eval-set screen: Bloom prefilter, then exact confirm.

    The broadcast in :func:`contamination` carries the eval set's RAW
    distinct n-gram strings — fine for a benchmark suite, but a
    consolidated eval registry (every benchmark + their train splits)
    can reach GBs of grams, past comfortable per-executor broadcast.
    This variant compresses stage 1 to a FIXED-size Bloom bitmap
    (``bits`` bits — KBs at any member count, shipped as a plain
    string literal): every corpus doc probes its grams with pure JVM
    expressions (zero joins, zero extra shuffle —
    :func:`~delta_lake_pyspark_scd2_spark.operators.sketches.bloom_hit_expr`),
    and only the docs with at least one all-bits-set gram — the Bloom
    can false-positive but NEVER false-negative, so this set contains
    every truly contaminated doc — pay the stage-2 exact gram join.
    At a healthy FP rate stage 2 touches a sliver of the corpus.

    Returns ``(id_col, bloom_hit, contaminated)`` covering every row
    of ``docs``; ``contaminated`` is EXACT (identical to
    :func:`contamination`'s flag — the no-false-negative guarantee is
    what makes restricting stage 2 to ``bloom_hit`` lossless).
    """
    from delta_lake_pyspark_scd2_spark.operators import sketches

    bits = sketches.BLOOM_BITS if bits is None else bits
    hashes = sketches.BLOOM_HASHES if hashes is None else hashes
    bloom = sketches.bloom_build(
        eval_ngrams(eval_docs, n, text_col), "gram", bits=bits, hashes=hashes
    )
    bitmap = sketches.bloom_bitstring(bloom, bits)
    gram_hit = sketches.bloom_hit_expr(
        F.col("gram"), bitmap, bits=bits, hashes=hashes
    )
    per_doc = (
        docs.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
        )
        .select(F.col(id_col), gram_hit.alias("__h"))
        .groupBy(id_col)
        .agg(F.max("__h").alias("bloom_hit"))
    )
    # docs with no grams at all (empty text) never reach per_doc —
    # they are trivially clean.
    # Persisted (tracked): flagged embeds the FULL corpus gram-probe
    # pass and is referenced twice (the stage-2 survivor semi-join and
    # the final flag join) — unpersisted, the whole explode+probe ran
    # twice. The cached frame is (id, bool). (round-10 optimization)
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    flagged = persist_tracked(
        docs.select(id_col).join(per_doc, id_col, "left").select(
            F.col(id_col),
            F.coalesce("bloom_hit", F.lit(False)).alias("bloom_hit"),
        )
    )
    survivors_to_confirm = docs.join(
        flagged.filter(F.col("bloom_hit")).select(id_col), id_col, "left_semi"
    )
    exact = contamination(survivors_to_confirm, eval_docs, n, text_col, id_col)
    return flagged.join(
        exact.select(F.col(id_col), "contaminated"), id_col, "left"
    ).select(
        F.col(id_col),
        F.col("bloom_hit"),
        F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
    )
