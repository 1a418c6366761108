"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
  * Exact dedup is a hash-groupBy on the fingerprint — one shuffle,
    map-side partial aggregation, no driver involvement.
  * MinHash/LSH avoids the O(n²) pairwise comparison: shingles →
    k minhash signatures → banded buckets → equi-join *within buckets
    only*. The candidate join shuffles on the (band, bucket-hash) key,
    whose cardinality grows with corpus size, so it stays balanced.
  * All hashing is md5-based (not Spark's murmur3 ``F.hash``) so results
    are engine-reproducible and oracle-checkable in DuckDB.
  * Everything is built-in expressions + higher-order array functions —
    no Python in the hot path. Arithmetic stays under 2^63 (ANSI-safe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.functions.caching import persist_tracked
from delta_lake_pyspark_scd2_spark.operators.text import normalize_text

#: 61-bit Mersenne prime — modulus of the minhash permutation family.
#: Modulus of the MinHash permutation family. MUST be small enough
#: that the affine map actually WRAPS over the 32-bit base hash: the
#: original ``mod M61`` choice never engaged (``h < 2^32``, products
#: < 2^37), making every "permutation" monotone in the base hash — all
#: 16 signature slots picked the SAME argmin shingle, so the signature
#: carried one hash of information and minhash-agreement "Jaccard
#: estimates" were all-or-nothing (a 10-shingle excerpt of a 120-
#: shingle page verified at agreement 1.0 whenever it contained the
#: page's min shingle). With modulus 2^32 and odd multipliers the maps
#: are bijections on Z_2^32 — independent argmins, a real estimator.
HASH_MOD_32 = 1 << 32

#: Version tag of the minhash signature family. Stored signatures are
#: only comparable to signatures from the SAME family: changing the
#: base hash, permutation form, or modulus makes old and new
#: signatures never band-collide, which would SILENTLY disable every
#: cross-batch near-dup screen over a pre-existing fingerprint store.
#: Persistent signature stores stamp this tag and refuse mismatches
#: loudly (pipeline/corpus_ingest.py). Bump it whenever the family
#: changes (v2 = the 2^32-wrapping affine fix; v1's mod-M61 family
#: was order-preserving and is incompatible).
MINHASH_FAMILY = "md5-affine32-v2"


def _spread(df: DataFrame, key: str, *, jvm_only: bool = False) -> DataFrame:
    """Hash-repartition before expensive per-row compute: a small/compact
    upstream (one parquet row-group, a coalesced scan) would otherwise
    pin the whole shingle/hash pipeline to a couple of cores. No-op cost
    relative to the compute it unblocks; at 100 TB the scan is already
    wide and AQE coalesces right back.

    Width scales with the INPUT's partition count (4× fan-out, floor 4)
    up to the shuffle setting: a one-file table doesn't fan out to 32
    near-empty partitions — each would spin its own Python worker for
    the Arrow-batched UDFs downstream, and at small inputs that worker
    spin-up dwarfs the compute (measured 2× on the LSH path). A wide
    scan still hits the shuffle-partition cap, so cluster-scale
    behavior is unchanged.

    ``jvm_only=True`` (paths with no Arrow/pandas UDF downstream —
    the shingle/codegen pipelines) skips that restraint and uses the
    full shuffle width: higher-order expressions are interpreted
    per-element, so they are exactly the compute worth spreading, and
    JVM task startup is negligible (measured: the shingle explode at
    sf0.1 drops ~4× going from 4 to 32 partitions)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if jvm_only:
        return df.repartition(n, key)
    width = min(n, max(4, df.rdd.getNumPartitions() * 4))
    return df.repartition(width, key)

#: SimHash width (60 bits: the per-word hash is 60 bits, so every bit
#: position carries signal while staying inside a signed 64-bit long).
SIMHASH_BITS = 60


def _md5_32(col: Column) -> Column:
    """Deterministic 32-bit integer hash: first 8 hex chars of md5.

    Reproducible in DuckDB as ``('0x' || substr(md5(s),1,8))::BIGINT``.
    32-bit base hashes keep every downstream ``a*h + b`` permutation
    well inside int64 (no ANSI overflow).
    """
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def _md5_60(col: Column) -> Column:
    """60-bit variant (15 hex chars) for SimHash bit sampling."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of the normalized text, as an array.

    Built from ``split`` + ``transform``/``slice`` higher-order
    functions — stays inside codegen, no UDF. Degenerate texts shorter
    than ``n`` words fall back to one whole-text shingle.
    """
    words = F.split(normalize_text(col), " ")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.array_distinct(
        F.when(k > 0, shingles).otherwise(F.array(normalize_text(col)))
    )


def levenshtein_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_dist: int = 30,
    block_prefix: int = 12,
) -> DataFrame:
    """Fuzzy near-duplicate pairs by edit distance with prefix
    blocking — the record-linkage complement to the set-similarity
    dedups: catches small in-place edits (typo fixes, template fills)
    that shift every shingle.

    Scale story: the ``block_prefix``-char prefix of the normalized
    text is the blocking key, so the self-join touches only same-block
    rows (bucket sizes shrink as the corpus grows more diverse; AQE
    splits residual skew). The JVM ``levenshtein(l, r, threshold)``
    short-circuits its DP once ``max_dist`` is exceeded, so comparing
    long non-dup texts costs O(len·max_dist), not O(len²). Prefix
    blocking assumes edits are not concentrated in the first
    ``block_prefix`` chars — the standard trade; multi-pass with a
    suffix or mid-string key lifts recall when that assumption fails.
    """
    nt = normalize_text(F.col(text_col))
    base = df.select(F.col(id_col), nt.alias("__nt")).withColumn(
        "__blk", F.substring("__nt", 1, block_prefix)
    )
    a = base.select(F.col(id_col).alias("id_a"), F.col("__nt").alias("__na"), "__blk")
    b = base.select(F.col(id_col).alias("id_b"), F.col("__nt").alias("__nb"), "__blk")
    return (
        a.join(b, on="__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "edit_dist", F.levenshtein(F.col("__na"), F.col("__nb"), max_dist)
        )
        .filter(F.col("edit_dist") >= 0)  # threshold form returns -1 above it
        .select("id_a", "id_b", "edit_dist")
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint: keep the
    lowest id as canonical; report group size."""
    fp = F.md5(normalize_text(F.col(text_col)).cast("binary"))
    return (
        df.withColumn("fp", fp)
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature (array<long>, length
    ``num_hashes``) over word shingles.

    Permutation family ``h_i(x) = (a_i*x + b_i) mod 2^32`` with
    ``a_i = 2i+1`` (odd → bijective on Z_2^32), ``b_i = 1000003*(i+1)``
    over the 32-bit base hash — deterministic across engines and runs;
    max intermediate value ``2^32 * (2k+1)`` stays far below 2^63.
    The modulus must wrap (see :data:`HASH_MOD_32`): a too-large
    modulus silently degenerates every permutation to the identity
    ORDER, collapsing the signature to one effective hash.

    Plan shape: explode shingles → hash once per shingle → ONE hash
    aggregate with ``num_hashes`` MIN()s (map-side partial combine, so
    the exchange carries one row per doc per partition). The naive
    alternative — nested array ``transform`` per permutation — would
    re-evaluate the md5 base hash ``num_hashes`` times per shingle
    (Catalyst does not CSE across array branches): measured 120s vs 3s
    at sf0.1.
    """
    sh = _spread(df, id_col, jvm_only=True).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("__shingle"),
    ).withColumn("__h", _md5_32(F.col("__shingle")))
    aggs = [
        F.min(
            (F.col("__h") * F.lit(2 * i + 1) + F.lit(1000003 * (i + 1)))
            % F.lit(HASH_MOD_32)
        ).alias(f"__mh_{i}")
        for i in range(num_hashes)
    ]
    return (
        sh.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"__mh_{i}") for i in range(num_hashes)]).alias("minhash"),
        )
    )


def lsh_band_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    *,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band, bucket) rows: each signature split into ``bands``
    slices of ``rows_per_band`` hashes, bucketed by md5 of the slice.
    The shareable half of banded LSH — the incremental ingest pipeline
    joins NEW docs' buckets against STORED ones instead of
    self-joining a full corpus."""
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.array_join(
                            F.transform(
                                F.slice(
                                    F.col("minhash"),
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        ).cast("binary")
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    *,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded-LSH candidate pairs: split each signature into ``bands``
    bands of ``rows_per_band`` hashes, bucket by md5(band slice),
    self-join within (band, bucket) only.

    Output: distinct ``(id_a, id_b)`` with ``id_a < id_b``. The join key
    includes the band index so distinct bands never collide; skewed
    buckets (boilerplate-heavy corpora) are split by AQE's skew-join.
    """
    banded = lsh_band_buckets(
        signatures, id_col, bands=bands, rows_per_band=rows_per_band
    )
    # The self-join would otherwise recompute the whole shingle→hash→min
    # pipeline for both sides; persist the (small: 1 row per doc per
    # band) bucket table — tracked, so the harness releases it at the
    # query boundary (no session-lifetime cache leak). At production
    # scale this is a materialized signature table on storage.
    banded = persist_tracked(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=(
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_incremental_pairs(
    index_buckets: DataFrame,
    new_buckets: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an incoming batch against a STORED LSH index without
    rescanning the corpus: candidate pairs that involve at least one
    NEW doc, as distinct ``(id_a, id_b)`` with ``id_a < id_b``.

    Two joins, both sized by the batch, never by the corpus:
      * batch-vs-index — the batch's (band, bucket) rows probe the
        stored bucket table. The batch side is small by definition, so
        Spark broadcasts it and the index is read with bucket pruning
        (at scale the index table is written bucketed by its join key);
        the corpus text is never touched — the index carries only
        (id, band, bucket).
      * batch-vs-batch — the usual banded self-join within the batch.
    Appending the batch's bucket rows to the index table afterwards
    makes the next batch's dedup incremental too; ingest cost is
    O(batch) regardless of corpus size — the 100 TB shape, vs
    :func:`lsh_candidate_pairs`'s full self-join.

    Assumes index and batch id sets are disjoint (enforced upstream by
    the ingest pipeline; duplicate ids would self-pair and are dropped
    by the ``id_a < id_b`` guard).
    """
    nb = persist_tracked(new_buckets)
    on = ["band", "bucket"]
    vs_index = (
        F.broadcast(nb.alias("n"))
        .join(index_buckets.alias("s"), on=on)
        .select(
            F.least(
                F.col(f"n.{id_col}"), F.col(f"s.{id_col}")
            ).alias("id_a"),
            F.greatest(
                F.col(f"n.{id_col}"), F.col(f"s.{id_col}")
            ).alias("id_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    vs_self = (
        nb.alias("a")
        .join(
            nb.alias("b"),
            on=(
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    return vs_index.unionByName(vs_self).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity
    (shared-shingle join form).

    Explode per-doc-distinct shingles → self-join on the shingle
    (documents sharing ≥1 shingle are the only ones that ever meet) →
    count shared → ``J = shared / (|A| + |B| - shared)``. Returns
    ``(id_a, id_b, jaccard)`` with ``jaccard >= threshold``.

    Candidate volume is Θ(Σ df²) over shingle document frequencies —
    fine up to mid-size corpora and boilerplate-light data; beyond that
    use :func:`ngram_jaccard_pairs_prefix`, whose prefix filter bounds
    the join to rare shingles (crossover measured around ~10⁵ docs
    locally; earlier at 100 TB where df² explodes).
    """
    sh = persist_tracked(  # released at the query boundary
        _spread(df, id_col, jvm_only=True).select(
            F.col(id_col),
            # already (doc, shingle)-unique: word_shingles applies
            # array_distinct per document
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
        )
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("size_a") + F.col("size_b") - F.col("shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shingle_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT (Broder 1997):
    ``C(A ⊆ B) = |A∩B| / |A|`` — the excerpt/quote detector. A short
    document whose shingles all appear inside a longer one scores 1.0
    on containment but LOW on Jaccard (the union is dominated by the
    container), so the symmetric screens never see it; training
    corpora drop or down-weight such excerpts separately from true
    near-dups.

    Returns ``(contained_id, container_id, containment)`` with
    ``containment >= threshold``; both directions of every meeting
    pair are evaluated from ONE shared-shingle join (the asymmetry is
    in the scoring denominator, not the join). Same candidate-volume
    caveat as :func:`ngram_jaccard_pairs` — Θ(Σ df²) over shingle
    document frequencies; at scale, block on rare shingles exactly as
    the prefix emitter does and keep this scoring expression.
    """
    sh = persist_tracked(
        _spread(df, id_col, jvm_only=True).select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias(
                "shingle"
            ),
        )
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    joined = shared.join(sa, "id_a").join(sb, "id_b")
    ab = joined.select(
        F.col("id_a").alias("contained_id"),
        F.col("id_b").alias("container_id"),
        F.round(F.col("shared") / F.col("size_a"), 6).alias("containment"),
    )
    ba = joined.select(
        F.col("id_b").alias("contained_id"),
        F.col("id_a").alias("container_id"),
        F.round(F.col("shared") / F.col("size_b"), 6).alias("containment"),
    )
    return ab.unionByName(ba).filter(F.col("containment") >= threshold)


def shingle_containment_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle containment with **asymmetric prefix filtering**
    — the 100 TB path for the excerpt screen.

    If ``C(A ⊆ B) = |A∩B|/|A| ≥ t`` then ``|A∩B| ≥ ⌈t·|A|⌉``, so the
    intersection cannot avoid A's first ``|A| − ⌈t·|A|⌉ + 1`` rarest
    shingles — the SAME prefix bound as the Jaccard emitter, but only
    the CONTAINED side can be prefixed: containment places no lower
    bound on B's overlap *fraction*, so the container side joins its
    FULL shingle set. Candidate volume is Σ(prefix-df × df) over the
    prefix shingles — rare-first ordering keeps those keys low-df, so
    it stays far below the naive Θ(Σ df²) and skew-free. Candidates
    verify exactly on the full sets; output equals
    :func:`shingle_containment_pairs` (the registry oracle runs the
    unblocked form, proving the filter lossless).
    """
    # NOT persisted (round-11, same revert as the Jaccard prefix
    # emitter): the token-level exploded frame outweighs the saved
    # re-explode; only the df-sorted sets below are cached.
    sh = _spread(df, id_col, jvm_only=True).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias(
            "shingle"
        ),
    )
    doc_freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    docs = persist_tracked(
        sh.join(doc_freq, "shingle")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__df", "shingle"))),
                lambda x: x["shingle"],
            ).alias("__set")
        )
    )
    # prefix length n − ⌈t·n⌉ + 1 with the same epsilon-guarded ceil
    # as the Jaccard emitter (1−t is inexact in binary; a longer
    # prefix is always safe, a shorter one silently drops true pairs)
    size = F.size("__set")
    required = F.ceil(size * threshold - F.lit(1e-9))
    prefix = docs.select(
        F.col(id_col),
        F.explode(F.slice("__set", 1, (size - required + 1).cast("int"))).alias(
            "shingle"
        ),
    )
    full = docs.select(
        F.col(id_col).alias("__cid"), F.explode("__set").alias("shingle")
    )
    candidates = (
        prefix.join(full, "shingle")
        .filter(F.col(id_col) != F.col("__cid"))
        .select(
            F.col(id_col).alias("contained_id"),
            F.col("__cid").alias("container_id"),
        )
        .distinct()
    )
    sa = docs.select(
        F.col(id_col).alias("contained_id"), F.col("__set").alias("__sa")
    )
    sb = docs.select(
        F.col(id_col).alias("container_id"), F.col("__set").alias("__sb")
    )
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    return (
        candidates.join(sa, "contained_id")
        .join(sb, "container_id")
        .withColumn("containment", F.round(inter / F.size("__sa"), 6))
        .filter(F.col("containment") >= threshold)
        .select("contained_id", "container_id", "containment")
    )


def shingle_containment_vs_sets(
    batch: DataFrame,
    store_sets: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Excerpt screen of a NEW batch against ALREADY-SHINGLED documents
    — the incremental-ingest form of
    :func:`shingle_containment_pairs_prefix`.

    ``store_sets`` is ``(store_id, shingles array<string>)`` — the
    distinct shingle sets of previously accepted docs, stored once at
    THEIR ingest (``pipeline.corpus_ingest``), so the old corpus text
    is never re-shingled. Batch docs are the CONTAINED side and carry
    the prefix filter (lossless under any element order — pigeonhole
    on ``|A∩B| ≥ ⌈t·|A|⌉``; rare-first ordering by the STORE's shingle
    document frequencies minimizes candidates). The store side joins
    its full sets, per the containment asymmetry. Per-batch cost is
    O(batch shingling + one scan of the stored shingle arrays) — a
    signature-column scan, never corpus text.

    Returns ``(contained_id, container_id, containment)`` with
    ``containment >= threshold``, exact (candidates verify on the full
    sets with ``array_intersect``).
    """
    full = store_sets.select(
        F.col("store_id"), F.explode("shingles").alias("shingle")
    )
    doc_freq = full.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    bsets = persist_tracked(
        batch.select(
            F.col(id_col),
            word_shingles(F.col(text_col), shingle_n).alias("__raw"),
        )
    )
    bsh = bsets.select(F.col(id_col), F.explode("__raw").alias("shingle"))
    ordered = (
        bsh.join(doc_freq, "shingle", "left")
        .na.fill({"__df": 0})
        .groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__df", "shingle"))),
                lambda x: x["shingle"],
            ).alias("__set")
        )
    )
    size = F.size("__set")
    required = F.ceil(size * threshold - F.lit(1e-9))
    prefix = ordered.select(
        F.col(id_col),
        F.explode(
            F.slice("__set", 1, (size - required + 1).cast("int"))
        ).alias("shingle"),
    )
    candidates = (
        prefix.join(full, "shingle")
        .select(F.col(id_col).alias("contained_id"), "store_id")
        .distinct()
    )
    sa = bsets.select(
        F.col(id_col).alias("contained_id"), F.col("__raw").alias("__sa")
    )
    sb = store_sets.select(
        F.col("store_id").alias("container_id"),
        F.col("shingles").alias("__sb"),
    )
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    return (
        candidates.withColumnRenamed("store_id", "container_id")
        .join(sa, "contained_id")
        .join(sb, "container_id")
        .withColumn("containment", F.round(inter / F.size("__sa"), 6))
        .filter(F.col("containment") >= threshold)
        .select("contained_id", "container_id", "containment")
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with **prefix filtering**
    (SSJoin/PPJoin family) — the 100 TB path.

    Joining every shared shingle costs Θ(Σ df²) candidate rows; instead,
    order the shingle universe by global document frequency (rarest
    first) and join only each document's first ``⌊(1−t)·|A|⌋+1``
    shingles. Exact: if J(A,B) ≥ t then |A∩B| ≥ t·|A|, so the
    intersection cannot avoid A's prefix. Candidates are then verified
    exactly with ``array_intersect`` on the full (small) shingle sets —
    same output as :func:`ngram_jaccard_pairs`. Rare-first ordering
    makes the surviving join keys precisely the low-df shingles, so the
    blocking join is skew-free by construction.
    """
    # NOT persisted (round-11 revert of the round-10 persist): the
    # exploded shingle frame is token-level — strictly larger than the
    # corpus — and materializing it cost more than the narrow
    # re-explode it saved (driver bench 2.06 s → 2.75 s; the same §5
    # trade this package rejects for BM25's `words`). The two
    # consumers (document-frequency aggregate, ranked set build) each
    # recompute the narrow explode; the expensive product — the
    # df-sorted per-doc sets — is persisted once below.
    sh = _spread(df, id_col, jvm_only=True).select(
        F.col(id_col),
        # already (doc, shingle)-unique: word_shingles applies
        # array_distinct per document — no dedup shuffle
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias(
            "shingle"
        ),
    )
    doc_freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    # ONE per-doc aggregation produces the df-ranked set: sorting the
    # (df, shingle) structs array-side replaces two window passes
    # (row_number + count over the doc partition) AND the separate
    # full-set collect_list the verification step would need — the
    # exchange on id_col happens once. Persisted (tracked — released
    # at the query boundary): feeds both the prefix explode and the
    # two verification joins; at production scale this is a
    # materialized table.
    docs = persist_tracked(
        sh.join(doc_freq, "shingle")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__df", "shingle"))),
                lambda x: x["shingle"],
            ).alias("__set")
        )
    )
    # Prefix length = n - ceil(t*n) + 1. NOT floor((1-t)*n)+1: 1-t is
    # inexact in binary (1-0.8 = 0.19999...), so for n divisible by 5
    # the floor lands one short and a true pair whose earliest common
    # shingle sits exactly at the boundary is missed (found by the
    # sf0.1 oracle sweep: pair (1568, 2466), |B| = 10). The epsilon
    # guards ceil against t*n floating one ulp ABOVE an exact integer;
    # when in doubt the prefix gets longer, and the exact verification
    # step makes longer always safe (cost, never correctness).
    size = F.size("__set")
    required = F.ceil(size * threshold - F.lit(1e-9))
    prefix = docs.select(
        F.col(id_col),
        F.explode(F.slice("__set", 1, (size - required + 1).cast("int"))).alias(
            "shingle"
        ),
    )
    candidates = (
        prefix.alias("a")
        .join(prefix.alias("b"), on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = docs.select(F.col(id_col).alias("id_a"), F.col("__set").alias("__sa"))
    sb = docs.select(F.col(id_col).alias("id_b"), F.col("__set").alias("__sb"))
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                inter / (F.size("__sa") + F.size("__sb") - inter),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Exact embedding near-duplicate pairs: all ``(id_a, id_b)`` with
    rounded cosine similarity ≥ ``threshold``.

    Brute-force O(n²) scoring — the correctness baseline the LSH
    variant is judged against. Parallel and shuffle-light (one
    broadcast of the right side at test scale; a block-nested
    repartition join beyond broadcast size).
    """
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        cosine_prenormed,
        norm,
    )

    a = _spread(
        df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")),
        "id_a",
        jvm_only=True,
    ).withColumn("__na", norm(F.col("__va")))
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    ).withColumn("__nb", norm(F.col("__vb")))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenormed(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def _hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — engine- and
    run-reproducible (SURVEY.md §7 non-determinism hygiene)."""
    import hashlib

    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append((h % 2000001 - 1000000) / 1e6)
        planes.append(row)
    return planes


def embedding_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = 8,
    bits_per_band: int = 4,
    threshold: float = 0.35,
) -> DataFrame:
    """LSH-blocked embedding near-dup pairs — the 100 TB path.

    Random-hyperplane signatures (sign of ``v·h``): vectors at angle θ
    agree on one bit with prob p = 1−θ/π; banding (``bands`` bands of
    ``bits_per_band`` bits, candidates = same full band anywhere) makes
    recall ≈ 1−(1−p^r)^B while scoring only bucket-mates instead of n².
    Candidates are then *exactly* verified (cosine ≥ threshold), so
    precision is 1.0 and output ⊆ :func:`embedding_cosine_pairs`;
    recall < 1 is the documented trade. Tune r up / B down as the
    threshold rises: with the 8×4 default, recall ≈ 0.7 at cosine 0.35
    (p=0.61) and ≈ 0.99 at the realistic near-dup setting 0.9 (p=0.86).
    Blocking selectivity also rises with the threshold — near-dup
    corpora at 0.9 are where bucket-joins beat n² by orders of
    magnitude; low thresholds approach all-pairs no matter the scheme.

    Shuffle story: explode to (band, bucket) keys → self-join within
    buckets; bucket-count grows with corpus so the join stays balanced;
    AQE splits skewed buckets.
    """
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        cosine_prenormed,
        norm,
    )

    # Signature computation is a (batch × dim) @ (dim × planes) matmul —
    # exactly the shape where an Arrow-batched pandas UDF (one BLAS call
    # per batch) beats bands×bits giant fold expressions that overflow
    # whole-stage codegen's method limit and fall back to interpreted
    # evaluation. The UDF is deterministic: hyperplanes are md5-derived.
    from pyspark.sql.pandas.functions import pandas_udf

    planes_t = np.array(_hyperplanes(bands * bits_per_band, dim)).T  # dim × planes
    powers = np.array([1 << i for i in range(bits_per_band)], dtype=np.int64)

    @pandas_udf("array<long>")
    def band_buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # batch × dim
        bits = (mat @ planes_t >= 0).astype(np.int64)  # batch × planes
        buckets = bits.reshape(len(mat), bands, bits_per_band) @ powers
        return pd.Series(list(buckets))

    # The function IS deterministic (md5-derived hyperplanes), but the
    # optimizer must not know it: posexplode's implicit
    # size>0/notnull guard gets filter-pushed below the spread
    # exchange, and because it references the UDF column the plan
    # evaluated the matmul TWICE per vector (two ArrowEvalPython nodes
    # for one call — guide §4.4). Marking it non-deterministic forbids
    # the duplication; the guard is vacuous anyway (the UDF always
    # returns a bands-length array). (round-10 optimization)
    band_buckets = band_buckets.asNondeterministic()

    # Bucket join + pair-dedup carry IDS ONLY — hashing/shuffling the
    # vectors through the n-candidate distinct would dominate the cost;
    # vectors re-attach afterwards (|pairs| rows, not |candidates|).
    # Persisted (tracked): both join sides read the signatures — without
    # it the Arrow-batched matmul UDF runs twice.
    sigs = persist_tracked(
        _spread(df.select(id_col, vec_col), id_col)
        .withColumn("__bb", band_buckets(F.col(vec_col)))
        .select(id_col, F.posexplode("__bb").alias("band", "bucket"))
    )
    a = sigs.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = sigs.select(F.col(id_col).alias("id_b"), "band", "bucket")
    pairs = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    ).withColumn("__na", norm(F.col("__va")))
    vb = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    ).withColumn("__nb", norm(F.col("__vb")))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenormed(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def simhash(col: Column) -> Column:
    """60-bit SimHash over distinct words: for each bit position b, sum
    +1/-1 of bit b across the word hashes; set bit b iff the sum > 0.

    One pass over the word array with ``aggregate``/``zip_with`` — no
    shuffle, no UDF. Near-dup detection downstream = Hamming distance
    ``bit_count(x ^ y)`` over LSH-blocked candidate pairs.
    """
    words = F.array_distinct(F.split(normalize_text(col), " "))
    hashes = F.transform(words, lambda w: _md5_60(w))
    # shiftleft() needs a literal shift; use a powers-of-two lookup array
    # instead so the bit index can be a column (exact long arithmetic).
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(SIMHASH_BITS)])
    zero = F.array_repeat(F.lit(0), SIMHASH_BITS)
    counters = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
                lambda b: F.when(
                    h.bitwiseAND(F.element_at(powers, b + 1)) != 0, 1
                ).otherwise(-1),
            ),
            lambda a, d: a + d,
        ),
    )
    return F.aggregate(
        F.zip_with(
            counters,
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda cnt, b: F.when(cnt > 0, F.element_at(powers, b + 1)).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhashes."""
    return F.bit_count(a.bitwiseXOR(b))


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
) -> DataFrame:
    """Exact duplicate-span detection — per doc, how many of its
    ``window``-token spans occur elsewhere in the corpus (or repeat
    inside the doc itself). The substring-dedup signal of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better"),
    reduced to Spark relational shape: the suffix array becomes a
    sliding-window hash-shuffle.

    Two-pass design for 100 TB:
      1. tokenize → sliding windows (narrow 1→N ``posexplode``; window
         text is immediately collapsed to a 32-hex md5, so the shuffle
         carries (id, hash) — never the span text),
      2. groupBy hash with map-side partial counts → the duplicate-hash
         set (total occurrences ``>= 2`` — covers cross-doc and
         within-doc repeats alike),
      3. left-semi join the (id, hash) stream against it — Spark plans
         this as a shuffled semi with partial aggregation; the dup set
         is corpus-dependent so no broadcast assumption.

    Real pipelines use window≈50 tokens; small default keeps the
    synthetic corpus (tiny vocab, short docs) producing hits.

    Returns one row per qualifying doc (``n_tokens >= window``):
    ``n_windows``, ``n_dup_windows``, ``dup_frac``.
    """
    w = F.split(normalize_text(F.col(text_col)), " ")
    d = df.select(F.col(id_col), w.alias("_w")).filter(F.size("_w") >= window)
    # (id, hash) stream feeds three branches (dup set, per-doc totals,
    # per-doc dup counts) — tracked-persist it so the corpus text is
    # tokenized once, not three times; released at the query boundary.
    wins = persist_tracked(
        d.select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_w") - (window - 1)),
                    lambda i: F.md5(
                        F.array_join(F.slice(F.col("_w"), i, window), " ").cast(
                            "binary"
                        )
                    ),
                )
            ).alias("_wh"),
        )
    )
    # occurrences >= 2 covers both cross-doc and within-doc repeats (a
    # 2-doc window necessarily has 2 occurrences), so a plain count with
    # map-side partial aggregation suffices — no count_distinct pass.
    dup_hashes = (
        wins.groupBy("_wh")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") >= 2)
        .select("_wh")
    )
    totals = wins.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    dups = (
        wins.join(dup_hashes, "_wh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    return (
        totals.join(dups, id_col, "left")
        .fillna(0, ["n_dup_windows"])
        .select(
            id_col,
            "n_windows",
            "n_dup_windows",
            F.round(
                F.col("n_dup_windows") / F.col("n_windows"), 6
            ).alias("dup_frac"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
) -> DataFrame:
    """Substring-dedup CLEANING (the action to :func:`duplicate_spans`'
    report): cut every repeated ``window``-token span out of the corpus,
    keeping the globally-first occurrence — Lee et al. 2022's ExactSubstr
    policy ("keep one copy") in relational form.

    Plan shape (one corpus-wide shuffle + one narrow rebuild):
      1. tokenize → sliding windows keyed by md5 (narrow),
      2. ONE window-function pass partitioned by span hash: an
         occurrence is removed iff its span occurs >= 2 times and it is
         not the (doc_id, pos)-first occurrence — deterministic on any
         cluster shape,
      3. removed start-positions fold back per doc (groupBy id), and a
         higher-order filter drops tokens covered by any removed span —
         per-row array work, no further shuffle.

    Docs shorter than ``window`` (no spans) pass through with
    normalized text. Returns ``id_col``, ``n_tokens``, ``n_removed``
    (tokens dropped), ``clean_text``.
    """
    norm = normalize_text(F.col(text_col))
    base = df.select(F.col(id_col), F.split(norm, " ").alias("_w"))
    wins = base.filter(F.size("_w") >= window).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - (window - 1)),
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("_w"), i, window), " ").cast(
                        "binary"
                    )
                ),
            )
        ).alias("_p0", "_wh"),
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "_wh")
    by_span = Window.partitionBy("_wh")
    ordered = Window.partitionBy("_wh").orderBy(id_col, "pos")
    removed = (
        wins.withColumn("_cnt", F.count(F.lit(1)).over(by_span))
        .withColumn("_rn", F.row_number().over(ordered))
        .filter((F.col("_cnt") >= 2) & (F.col("_rn") > 1))
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("_rs"))
    )
    joined = base.join(removed, id_col, "left").withColumn(
        "_rs", F.coalesce(F.col("_rs"), F.array().cast("array<int>"))
    )
    keep_idx = F.filter(
        F.sequence(F.lit(1), F.size("_w")),
        lambda i: ~F.exists(
            F.col("_rs"),
            lambda p: (i >= p) & (i <= p + (window - 1)),
        ),
    )
    return joined.select(
        id_col,
        F.size("_w").alias("n_tokens"),
        (F.size("_w") - F.size(keep_idx)).alias("n_removed"),
        F.array_join(
            F.transform(keep_idx, lambda i: F.element_at("_w", i)), " "
        ).alias("clean_text"),
    )


def _semantic_membership(df, k, iters, dim, id_col, vec_col):
    """Shared front half of the SemDeDup family: train the kmeans
    contract on ``df`` and return ``(centroids, membership)`` where
    membership is ``(id_col, vec_col, centroid_id)``."""
    from delta_lake_pyspark_scd2_spark.operators.clustering import (
        kmeans_fit,
    )
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        assign_to_centroids,
    )

    cents = kmeans_fit(
        df, k=k, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col
    )
    # assign_to_centroids preserves the corpus columns, so membership
    # reads straight off its output — the old join of the corpus back
    # onto its own assignment was a second corpus scan plus an id-keyed
    # shuffle join for columns already present (round-10 optimization)
    memb = assign_to_centroids(
        df, cents, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col), F.col(vec_col), F.col("centroid_id"))
    # persisted: every SemDeDup consumer references membership 2-3
    # times (both pair-join sides + the survivor frame) — without this
    # each reference re-scans the corpus and re-runs the broadcast
    # centroid assignment (3 full scans instead of 1 at 100 TB)
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    return cents, persist_tracked(memb)


def _memb_pairs(memb, *, threshold, id_col, vec_col):
    """Within-cluster pairs (id_a < id_b, rounded cos >= threshold)
    from a membership frame — locally quadratic per cluster, shuffles
    on the cluster key only."""
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        cosine_prenormed,
        norm,
    )

    a = _spread(
        memb.select(
            F.col(id_col).alias("id_a"),
            F.col("centroid_id").alias("__ca"),
            F.col(vec_col).alias("__va"),
        ),
        "id_a",
        jvm_only=True,
    ).withColumn("__na", norm(F.col("__va")))
    b = memb.select(
        F.col(id_col).alias("id_b"),
        F.col("centroid_id").alias("__cb"),
        F.col(vec_col).alias("__vb"),
    ).withColumn("__nb", norm(F.col("__vb")))
    return (
        a.join(b, F.col("__ca") == F.col("__cb"))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenormed(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def semantic_pairs(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    dim: int,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Within-cluster semantic near-duplicate pairs under the kmeans
    contract — the pair emitter the SemDeDup family composes:
    :func:`semantic_dedup` derives drop flags from it,
    ``dedup_semantic_canonical`` feeds it to connected components.
    Output: ``(id_a, id_b, cos_sim)`` with ``id_a < id_b``."""
    _, memb = _semantic_membership(df, k, iters, dim, id_col, vec_col)
    return _memb_pairs(
        memb, threshold=threshold, id_col=id_col, vec_col=vec_col
    )


def semantic_dedup(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    dim: int,
    threshold: float = 0.3,
    keep: str = "lowest_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then search for
    near-duplicates ONLY within each cluster — the O(n²) cosine scan
    becomes k independent, locally-quadratic bucket joins shuffling on
    ``cluster_id``, the same blocked shape as every LSH dedup here (at
    100 TB, k scales with the corpus so clusters stay bounded, and the
    pair join never leaves a partition).

    Training reuses the :func:`~delta_lake_pyspark_scd2_spark.operators
    .clustering.kmeans_fit` cross-engine contract (6-dp rounded scores
    and means, lowest-id seeds, ties to the lower centroid) and the
    pair cosine uses the shared 6-dp rounding, so the WHOLE pipeline —
    iterative training included — is value-hash-oracle-able.

    ``keep`` picks the survivor inside a violating pair:

    - ``"lowest_id"`` (default): drop a row iff a LOWER-id member of
      its cluster matches at ``cos >= threshold``. Deterministic and
      id-stable — the oracle twin.
    - ``"centroid_far"``: the paper's rule — keep the member LESS
      similar to its centroid (they keep outliers to preserve
      diversity); ties fall back to the lower id.

    Output: ``(id_col, cluster_id, is_kept int)`` — one row per input
    row, survivors flagged 1 (callers filter; keeping the full frame
    makes drop-rate monitoring one aggregation away).
    """
    if keep not in ("lowest_id", "centroid_far"):
        raise ValueError(f"semantic_dedup: unknown keep rule {keep!r}")
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        cosine_prenormed,
        norm,
    )

    cents, memb = _semantic_membership(df, k, iters, dim, id_col, vec_col)
    if keep == "lowest_id":
        dropped = (
            _memb_pairs(
                memb, threshold=threshold, id_col=id_col, vec_col=vec_col
            )
            .select(F.col("id_b").alias(id_col), F.lit(1).alias("__drop"))
            .distinct()
        )
        return (
            memb.select(id_col, F.col("centroid_id").alias("cluster_id"))
            .join(dropped, id_col, "left")
            .select(
                id_col,
                "cluster_id",
                F.when(F.col("__drop").isNull(), 1)
                .otherwise(0)
                .cast("int")
                .alias("is_kept"),
            )
        )
    if keep == "centroid_far":
        # per-member similarity to its own centroid (the paper's
        # keep-outliers ordering key), via the broadcast centroid table
        csim = memb.join(
            F.broadcast(
                cents.select(
                    F.col(id_col).alias("centroid_id"),
                    F.col(vec_col).alias("__cv"),
                )
            ),
            "centroid_id",
        ).withColumn(
            "__csim",
            F.round(
                cosine_prenormed(
                    F.col(vec_col),
                    F.col("__cv"),
                    norm(F.col(vec_col)),
                    norm(F.col("__cv")),
                ),
                6,
            ),
        )
        side = csim.select(
            id_col, "centroid_id", vec_col, "__csim"
        )
    a = _spread(
        side.select(
            F.col(id_col).alias("id_a"),
            F.col("centroid_id").alias("__ca"),
            F.col(vec_col).alias("__va"),
            F.col("__csim").alias("__csa"),
        ),
        "id_a",
        jvm_only=True,
    ).withColumn("__na", norm(F.col("__va")))
    b = side.select(
        F.col(id_col).alias("id_b"),
        F.col("centroid_id").alias("__cb"),
        F.col(vec_col).alias("__vb"),
        F.col("__csim").alias("__csb"),
    ).withColumn("__nb", norm(F.col("__vb")))
    # a survives, b drops: a is FARTHER from the centroid (lower
    # __csim), ties to the lower id
    order = (F.col("__csa") < F.col("__csb")) | (
        (F.col("__csa") == F.col("__csb"))
        & (F.col("id_a") < F.col("id_b"))
    )
    pairs = (
        a.join(b, F.col("__ca") == F.col("__cb"))
        .filter(order)
        .withColumn(
            "__cos",
            F.round(
                cosine_prenormed(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ),
        )
        .filter(F.col("__cos") >= threshold)
    )
    dropped = pairs.select(
        F.col("id_b").alias(id_col), F.lit(1).alias("__drop")
    ).distinct()
    return (
        memb.select(id_col, F.col("centroid_id").alias("cluster_id"))
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.when(F.col("__drop").isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_kept"),
        )
    )


def build_semantic_index(
    df: DataFrame,
    centroids: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Materialize the stored half of incremental semantic dedup: the
    corpus' (id, vector, cluster_id) rows as a versioned table
    partitioned by ``cluster_id`` — the same layout the IVF probes
    use, so an incoming batch reads ONLY its own clusters' partitions
    (manifest-pruned) and the corpus is never rescanned."""
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        assign_to_centroids,
    )
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    # assignment output carries the corpus columns — no join-back
    # (one corpus pass instead of two + an id shuffle)
    rows = assign_to_centroids(
        df, centroids, id_col=id_col, vec_col=vec_col
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id").alias("cluster_id"),
    )
    return VersionedParquetTable.create(
        df.sparkSession,
        rows,
        path,
        partition_cols=["cluster_id"],
        metrics={"op": "SEMANTIC_INDEX_BUILD"},
    )


def semantic_dedup_incremental(
    index,
    batch: DataFrame,
    centroids: DataFrame,
    *,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental SemDeDup against a persisted cluster index (the
    semantic-family counterpart of the minhash
    ``incremental LSH`` path — dedup_incremental_lsh): assign ONLY the
    incoming batch to the stored centroids, read ONLY the batch's
    clusters' partitions from the index (manifest-pruned), and emit
    near-duplicate pairs involving a new vector — batch×stored AND
    batch×batch, both within-cluster. Ingest cost is O(batch + probed
    partitions); stored vectors are never re-clustered or rescanned
    corpus-wide.

    Output ``(id_a, id_b, cos_sim)`` with ``id_a < id_b`` — the
    oracle twin is the FULL semantic pair set (trained on the stored
    subset) restricted to pairs involving a new id, proving the index
    path finds exactly the same candidates.
    """
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        assign_to_centroids,
        cosine_prenormed,
        norm,
    )

    # assignment output carries the batch columns — no join-back.
    # Persisted (round-10 optimization): ba feeds the probed-cluster
    # collect, the stored side's replay-safety anti-join AND both arms
    # of the pair self-join — unpersisted, the batch assignment (a
    # batch scan + k-centroid argmax) re-executed up to five times.
    ba = persist_tracked(
        assign_to_centroids(
            batch, centroids, id_col=id_col, vec_col=vec_col
        )
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("centroid_id").alias("cluster_id"),
        )
        .withColumn("__new", F.lit(1))
    )
    # bounded collect: <= k cluster ids present in the batch
    probed = sorted(
        r["cluster_id"] for r in ba.select("cluster_id").distinct().collect()
    )
    stored = (
        index.read_partitions([{"cluster_id": str(c)} for c in probed])
        .select(id_col, vec_col, "cluster_id")
        # anti-join the batch's own ids out of the stored side: a no-op
        # when ids are disjoint (the normal flow), and it makes a
        # STREAMING replay safe when the batch's index append committed
        # but the pair emission did not — without it the replayed batch
        # would pair against its own stored copy and emit duplicates
        .join(ba.select(id_col), id_col, "left_anti")
        .withColumn("__new", F.lit(0))
    )
    # persisted: both arms of the pair self-join replay this frame —
    # without it the manifest-pruned index read + anti-join run twice.
    # Size is the per-batch working set (batch + probed partitions
    # only), never the whole index.
    both = persist_tracked(stored.unionByName(ba))
    a = _spread(
        both.select(
            F.col(id_col).alias("id_a"),
            F.col("cluster_id").alias("__ca"),
            F.col(vec_col).alias("__va"),
            F.col("__new").alias("__newa"),
        ),
        "id_a",
        jvm_only=True,
    ).withColumn("__na", norm(F.col("__va")))
    b = both.select(
        F.col(id_col).alias("id_b"),
        F.col("cluster_id").alias("__cb"),
        F.col(vec_col).alias("__vb"),
        F.col("__new").alias("__newb"),
    ).withColumn("__nb", norm(F.col("__vb")))
    return (
        a.join(b, F.col("__ca") == F.col("__cb"))
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((F.col("__newa") == 1) | (F.col("__newb") == 1))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenormed(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def line_dedup_corpus(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_chunk: int = 16,
) -> DataFrame:
    """Corpus-level duplicate-SEGMENT removal — the CCNet / Gopher
    preprocessing step (Wenzek et al. 2020; Rae et al. 2021): a text
    segment that appears anywhere else in the corpus survives only at
    its FIRST occurrence (lowest ``(doc_id, chunk_no)``); every later
    occurrence is cut out and the documents are reassembled from their
    surviving segments. This removes boilerplate (headers, cookie
    banners, licence blocks) that document-level dedup can never see,
    because the containing documents differ.

    Real corpora segment on newlines/paragraphs; this corpus is
    newline-free, so segments are non-overlapping ``words_per_chunk``
    word windows over the normalized text — swap the segmentation
    expression for ``split(text, '\\n')`` and everything downstream is
    unchanged.

    Plan shape (all relational, fully oracle-able): one ordered
    explode → per-(doc, chunk) reassembly agg → ONE shuffle on the
    segment's md5 (rows carry the segment text either way; hashing
    keeps the partition key 32 bytes) with a per-hash ``row_number``
    window (partitioned, never global) → doc-keyed reassembly with an
    order-stable sorted-struct concat. Cost ∝ corpus tokens, shuffle
    keys are hashes, no driver state.

    Output: one row per input document —
    ``(id_col, n_chunks, n_kept, text_deduped)`` (empty documents keep
    ``n_chunks = 0`` and an empty ``text_deduped``).
    """
    pos_w = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(normalize_text(F.col(text_col)), " ")
        ).alias("__pos", "__w"),
    ).filter(F.col("__w") != "")
    chunks = (
        pos_w.withColumn(
            "__chunk_no", (F.col("__pos") / words_per_chunk).cast("int")
        )
        .groupBy(id_col, "__chunk_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__w"))
                    ),
                    lambda x: x["__w"],
                ),
                " ",
            ).alias("__chunk")
        )
    )
    w = Window.partitionBy(F.md5(F.col("__chunk"))).orderBy(
        id_col, "__chunk_no"
    )
    kept = (
        chunks.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    totals = chunks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks")
    )
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__chunk_no", "__chunk"))),
                lambda x: x["__chunk"],
            ),
            " ",
        ).alias("text_deduped"),
    )
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        )
    )
