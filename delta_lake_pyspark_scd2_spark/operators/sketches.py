"""Mergeable count-min sketch over a distributed token stream.

The count-min sketch (Cormode & Muthukrishnan 2005) answers "roughly
how often does item *x* occur?" in ``depth × width`` counters — a few
KB regardless of corpus size. Each of ``depth`` hash rows maps an item
to one of ``width`` buckets and accumulates its count; the estimate
for an item is the MIN over its ``depth`` buckets, which can only
OVER-estimate (collisions add, never subtract). For a 100 TB corpus
that property is what matters: the sketch is a fixed-size, mergeable
(bucket-wise sum) summary, so per-partition / per-day sketches combine
by one ``depth×width``-row aggregation — no re-scan of history — and a
heavy-hitter probe touches ``depth`` rows per candidate.

Complements the HLL path (``sketch_mergeable_vocab``: how MANY
distinct tokens) with frequency estimates (how OFTEN each token), the
other half of the classic streaming-summary pair.

Engine-portable by construction: bucket assignment rides
:func:`~delta_lake_pyspark_scd2_spark.functions.hashing.md5_prefix_long`
(``md5(depth ':' item)``), the one cross-engine hash primitive, so the
DuckDB oracle rebuilds the identical sketch bit-for-bit.

Scale shape (goes beyond the reference — SURVEY.md §2.10 has no sketch
operators):

- The sketch is built from the per-item COUNT table (vocab-sized), not
  the raw token stream: tokens collapse in one map-side-combinable
  ``groupBy`` first, then the ``depth``-way explode multiplies rows of
  the *vocabulary*, not the corpus.
- Probing broadcasts the sketch (``depth × width`` rows — KBs), so
  estimating any number of candidate items is a narrow broadcast join;
  the item stream never shuffles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.functions.hashing import md5_prefix_long

#: Default geometry: 4 rows × 1024 buckets → ε ≈ 2.7e-3·N at δ ≈ 1.8%.
DEPTH = 4
WIDTH = 1024


def cms_bucket(item: Column, depth_row: Column, width: int = WIDTH) -> Column:
    """Bucket of ``item`` in hash row ``depth_row`` — the shared
    Spark/DuckDB contract: ``md5_prefix_long(d ':' item) % width``."""
    return (
        md5_prefix_long(
            F.concat(depth_row.cast("string"), F.lit(":"), item.cast("string"))
        )
        % width
    )


def count_min_build(
    counts: DataFrame,
    item_col: str = "word",
    count_col: str = "c",
    *,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Build the sketch ``(d, bucket, cnt)`` from an exact per-item
    count table (one row per distinct item).

    Input is the *counts* table on purpose: the caller's token
    ``groupBy`` already collapsed the corpus map-side, so the
    ``depth``-way explode here is vocab-sized. Output is exactly the
    non-empty cells of the ``depth × width`` counter grid.
    """
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    return (
        counts.select(F.col(item_col), F.col(count_col).alias("__c"), d)
        .select(
            F.col("d"),
            cms_bucket(F.col(item_col), F.col("d"), width).alias("bucket"),
            F.col("__c"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("__c").cast("long").alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same geometry: bucket-wise sum.

    This is the whole point of the structure — per-shard / per-day
    sketches combine associatively in one aggregation over
    ``depth × width``-row inputs, so maintaining a corpus-lifetime
    frequency summary never re-reads history.
    """
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return (
        unioned.groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    *,
    depth: int = DEPTH,
    width: int = WIDTH,
    estimate_col: str = "cms_estimate",
) -> DataFrame:
    """Estimated count per row of ``items``: MIN over the item's
    ``depth`` buckets. Never under the true count.

    The sketch side is broadcast (KBs); the probe explode is
    ``depth`` rows per item and the only aggregation is the per-item
    MIN — items with colliding buckets share sketch cells, which is
    the sketch's bias, not a join artifact.

    Items missing from the sketch entirely (all ``depth`` cells empty)
    estimate as 0 — the sketch's answer for a never-seen item.
    """
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    probes = items.select(F.col(item_col), d).withColumn(
        "bucket", cms_bucket(F.col(item_col), F.col("d"), width)
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias(estimate_col)
        )
    )


def histogram_bucket(value: Column) -> Column:
    """Log2 bucket of a non-negative integer value — the shared
    Spark/DuckDB contract: ``floor(log2(v + 1))`` computed EXACTLY as
    bit length (never float ``log``, whose boundary values differ by
    ulp across engines): bucket b covers ``[2^b - 1, 2^(b+1) - 2]``.
    NULL/negative values land in bucket -1 (an explicit "invalid" bin,
    never silently dropped)."""
    v = value.cast("long")
    # length(bin(v+1)) - 1 == floor(log2(v+1)) for v >= 0 — pure
    # integer/string arithmetic, identical in Spark and DuckDB (both
    # bin() forms have no leading zeros)
    return (
        F.when(v.isNull() | (v < 0), F.lit(-1))
        .otherwise((F.length(F.bin(v + 1)) - 1).cast("int"))
    )


def histogram_build(
    df: DataFrame,
    value: Column,
) -> DataFrame:
    """Mergeable log-histogram sketch of a value column: one row per
    occupied log2 bucket, ``(bucket, cnt)``. Fixed size (≤ 64 rows for
    int64 values) regardless of input size, mergeable by bucket-wise
    sum — the quantile-monitoring half of the sketch family (CMS =
    frequency, HLL = cardinality, histogram = distribution shape).
    One map-side-combinable aggregation; nothing else.
    """
    return (
        df.select(histogram_bucket(value).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Bucket-wise sum — sketches from any partitioning of the data
    merge to the sketch of the union (exact, not approximate: the
    histogram loses within-bucket detail, never counts)."""
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("cnt"))


def histogram_quantile(sketch: DataFrame, q: float) -> DataFrame:
    """Bucket containing the ``q``-quantile OF THE VALID VALUES:
    smallest bucket whose cumulative count reaches ``ceil(q * N)``,
    with the invalid bin (bucket -1: NULL/negative inputs) excluded
    from both the walk and N — a quantile over garbage rows is not a
    quantile of the distribution. Returns one row ``(bucket, lo, hi)``
    — the value range the quantile falls in (resolution = the log2
    bucket, the sketch's accuracy contract). Bounds use exact integer
    shifts (the bucketing contract), saturating at int64 max for the
    top buckets where ``2^(b+1) - 2`` is unrepresentable.
    """
    from pyspark.sql import Window

    valid = sketch.filter(F.col("bucket") >= 0)
    # global-window-ok: a log2 histogram has <= 64 buckets by
    # construction — bounded input
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = valid.agg(F.sum("cnt").alias("__n"))
    cum = valid.withColumn("__cum", F.sum("cnt").over(w)).crossJoin(
        F.broadcast(tot)
    )
    hit = cum.filter(
        F.col("__cum") >= F.ceil(F.lit(float(q)) * F.col("__n"))
    ).orderBy("bucket").limit(1)
    long_max = (1 << 63) - 1
    # SQL shiftleft takes a column shift amount (the pyspark wrapper
    # only accepts a literal int)
    lo = F.expr("shiftleft(CAST(1 AS BIGINT), bucket)") - 1
    hi = F.when(
        F.col("bucket") >= 62, F.lit(long_max)
    ).otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1)") - 2)
    return hit.select("bucket", lo.cast("long").alias("lo"), hi.alias("hi"))


def histogram_drift(
    df: DataFrame,
    value: Column,
    group_col: str,
) -> DataFrame:
    """Per-group LENGTH-distribution drift: total-variation (L1/2 up to
    a factor) distance between each group's log2-histogram shares and
    the corpus-wide shares — the shape-drift companion of the unigram
    KL monitor (KL sees *content* drift; a crawler that starts
    emitting truncated pages has identical vocabulary but a collapsed
    length histogram, which only this catches).

    Output: ``(group_col, n, l1_distance)``. Cost: ONE
    map-side-combinable (group, bucket) count — the per-group and
    corpus histograms and both totals all derive from it; the distance
    join is histogram-sized (groups × ≤65 buckets), never corpus-sized.

    Cross-engine float contract: shares are single divisions of exact
    int64 counts (bit-identical), per-bucket |p − q| terms round to
    9 dp, the ≤65-term sum rounds to 6 dp.
    """
    gb = (
        df.select(
            F.col(group_col), histogram_bucket(value).alias("bucket")
        )
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("__cgb"))
    )
    return histogram_drift_from_counts(gb, group_col)


def histogram_drift_from_counts(
    gb: DataFrame,
    group_col: str,
) -> DataFrame:
    """The scoring half of :func:`histogram_drift`, over an
    ALREADY-AGGREGATED ``(group_col, bucket, __cgb)`` count frame —
    shared with the streaming maintainer, whose persisted count table
    replaces the batch bucketing. Same plan and float contract.

    The invalid bin (bucket −1: NULL/negative inputs) is EXCLUDED,
    matching :func:`histogram_quantile` — drift measures the shape of
    the valid-value distribution, and garbage rows should surface via
    the ingest screens, not skew every group's shares. (Token counts
    are never NULL/negative, so for the length monitor this is purely
    a consistency contract.)"""
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    gb = persist_tracked(gb.filter(F.col("bucket") >= 0))
    gt = gb.groupBy(group_col).agg(F.sum("__cgb").cast("long").alias("__ng"))
    cb = gb.groupBy("bucket").agg(F.sum("__cgb").cast("long").alias("__cb"))
    n_total = cb.agg(F.sum("__cb").cast("long").alias("__n"))
    # every (group, bucket-with-corpus-mass) cell: groups missing a
    # bucket contribute |0 − q_b| — cross join is groups × ≤65 buckets,
    # histogram-sized by construction (broadcast-safe)
    cells = (
        gt.crossJoin(F.broadcast(cb))
        .join(gb, [group_col, "bucket"], "left")
        .crossJoin(F.broadcast(n_total))
    )
    term = F.round(
        F.abs(
            F.coalesce(F.col("__cgb"), F.lit(0)).cast("double")
            / F.col("__ng")
            - F.col("__cb").cast("double") / F.col("__n")
        ),
        9,
    )
    return (
        cells.select(F.col(group_col), F.col("__ng"), term.alias("__t"))
        .groupBy(group_col)
        .agg(
            F.min("__ng").cast("long").alias("n"),
            F.round(F.sum("__t"), 6).alias("l1_distance"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter — the membership sketch
# ---------------------------------------------------------------------------

#: Default geometry: 4 hashes x 16384 bits -> FP rate ~2.4% at 2,000
#: members, ~0.24% at 1,000 (p = (1 - e^(-kn/m))^k).
BLOOM_BITS = 16384
BLOOM_HASHES = 4


def bloom_bit(item: Column, hash_row: Column, bits: int = BLOOM_BITS) -> Column:
    """Bit position of ``item`` under hash row ``hash_row`` — the
    shared Spark/DuckDB contract:
    ``md5_prefix_long('b' || hash_row || ':' || item) % bits``.
    The ``'b'`` salt keeps the family disjoint from the count-min
    buckets (:func:`cms_bucket` hashes ``d || ':' || item``)."""
    return (
        md5_prefix_long(
            F.concat(
                F.lit("b"),
                hash_row.cast("string"),
                F.lit(":"),
                item.cast("string"),
            )
        )
        % bits
    )


def bloom_build(
    items: DataFrame,
    item_col: str,
    *,
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Build a Bloom filter over the item column: the SPARSE form, one
    row per SET bit position (``pos``) — at most ``bits`` rows (KBs)
    regardless of member-set size.

    Completes the mergeable-sketch family's classic quartet: HLL = how
    many distinct, CMS = how often, log2-histogram = distribution
    shape, Bloom = **is this one a member** — with the membership
    guarantee the others can't give: a probe may false-POSITIVE
    (collisions set shared bits) but never false-negative, so it is a
    sound PREFILTER for any expensive exact membership join.

    The ``hashes``-way explode multiplies rows of the *member set*
    (typically the small side — an eval suite, a blocklist, a seen-URL
    day), never a corpus.
    """
    d = F.explode(F.sequence(F.lit(0), F.lit(hashes - 1))).alias("d")
    return (
        items.select(F.col(item_col).alias("__i"), d)
        .select(bloom_bit(F.col("__i"), F.col("d"), bits).alias("pos"))
        .distinct()
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge Bloom filters built with the same geometry: bit-set UNION.

    Unlike the counter sketches (CMS/histogram), the fold is
    **idempotent** — re-merging a batch is a no-op, so streaming
    maintenance needs no writer-transaction replay guard; set union is
    exactly-once by construction."""
    u = reduce(lambda a, b: a.unionByName(b), blooms)
    return u.distinct()


def bloom_might_contain(
    bloom: DataFrame,
    items: DataFrame,
    item_col: str,
    *,
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Membership flag per DISTINCT item value: ``flag_col`` is true
    iff all ``hashes`` of the item's bit positions are set.

    The sketch side is broadcast (≤ ``bits`` rows); the probe explode
    is ``hashes`` rows per item and the only aggregation is the
    per-item match count. Never a false negative; a true flag means
    "member OR collision" at the geometry's FP rate.

    The match is counted as DISTINCT matched hash rows, so a sketch
    frame carrying duplicate ``pos`` rows (e.g. a raw union that was
    never re-distincted) degrades to a fanned-out join, never to a
    wrong flag — a plain count would exceed ``hashes`` there and flip
    a true member to False, the one error class a Bloom filter must
    never make.
    """
    d = F.explode(F.sequence(F.lit(0), F.lit(hashes - 1))).alias("d")
    probes = items.select(F.col(item_col), d).withColumn(
        "pos", bloom_bit(F.col(item_col), F.col("d"), bits)
    )
    marked = bloom.select("pos", F.lit(1).alias("__set"))
    matched_row = F.when(F.col("__set").isNotNull(), F.col("d"))
    return (
        probes.join(F.broadcast(marked), "pos", "left")
        .groupBy(item_col)
        .agg((F.countDistinct(matched_row) == hashes).alias(flag_col))
    )


def bloom_bitstring(bloom: DataFrame, bits: int = BLOOM_BITS) -> str:
    """Materialize the sparse Bloom rows as a ``bits``-character
    '0'/'1' string — character ``p`` (0-based) is bit ``p``.

    This is the ZERO-JOIN probe form: the string is KBs (16 KiB at
    the default geometry), so it ships to every task as a plain column
    LITERAL and membership becomes a pure JVM expression
    (:func:`bloom_hit_expr`) — no broadcast join, no extra shuffle on
    the probe side at all. The ``collect()`` here is bits-bounded (≤
    ``bits`` rows of one int) by construction, never data-sized.
    """
    chars = ["0"] * bits
    for row in bloom.select("pos").collect():
        chars[int(row["pos"])] = "1"
    return "".join(chars)


def bloom_hit_expr(
    item: Column,
    bitmap: str,
    *,
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> Column:
    """Pure-expression membership test against a bit-string from
    :func:`bloom_bitstring`: AND over the item's ``hashes`` bit
    lookups, each ONE ``substr`` on the literal — whole-stage-codegen
    friendly, zero joins.
    """
    lit_bitmap = F.lit(bitmap)
    hit = F.lit(True)
    for d in range(hashes):
        pos = bloom_bit(item, F.lit(d), bits)
        hit = hit & (
            F.substr(lit_bitmap, (pos + 1).cast("int"), F.lit(1)) == "1"
        )
    return hit


def count_min_join_size(
    cms_a: DataFrame, cms_b: DataFrame, *, depth: int = DEPTH
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches: the
    row-wise inner product, minimized over hash rows (AMS/CMS join-size
    estimator, Cormode & Muthukrishnan 2005 §4.2). With ``cms_a is
    cms_b`` this is the self-join size / second frequency moment F2.

    Like point estimates the result can only over-count (colliding
    keys add cross terms). Cost: one (d, bucket) equi-join over two
    depth x width grids — the sketches are the ONLY inputs, so a
    planner can price a petabyte join from kilobytes of summary.

    A hash row where the two sketches share NO occupied bucket has
    inner product 0, which must reach the MIN (the estimate for fully
    disjoint inputs IS 0) — hence the dense ``depth``-row spine rather
    than aggregating only rows the join happens to produce.
    """
    a = cms_a.select("d", "bucket", F.col("cnt").alias("__ca"))
    b = cms_b.select("d", "bucket", F.col("cnt").alias("__cb"))
    per_row = (
        a.join(b, ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    spark = cms_a.sparkSession
    spine = spark.range(depth).select(F.col("id").cast("int").alias("d"))
    dense = spine.join(per_row, "d", "left").select(
        F.coalesce(F.col("__ip"), F.lit(0)).alias("__ip")
    )
    return dense.agg(F.min("__ip").cast("long").alias("cms_join_size"))


def bloom_long_array(bloom: DataFrame, bits: int = BLOOM_BITS) -> list[int]:
    """Materialize the sparse Bloom rows as ``bits / 64`` packed
    signed-64-bit words (word ``i`` holds bits ``64*i .. 64*i+63``,
    bit ``b`` of a word = ``(w >> b) & 1``) — the PACKED probe form
    for filters too big for :func:`bloom_bitstring`'s string literal:
    a '0'/'1' string is probed with ``substr``, which rescans the
    literal on every evaluation (measured on 600k probes: 42 s at
    16 Kib, 81 s at 32 Kib, 322 s at 128 Kib — linear in the literal),
    while the packed words ride a one-row broadcast as an
    ``array<long>`` COLUMN probed by O(1) ``element_at`` + shifts
    (:func:`bloom_hit_packed`). The ``collect()`` is bits-bounded."""
    words = [0] * ((bits + 63) // 64)
    for row in bloom.select("pos").collect():
        p = int(row["pos"])
        words[p >> 6] |= 1 << (p & 63)
    # signed 64-bit wrap (Spark LongType)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_hit_packed(
    item: Column,
    words_col: Column,
    *,
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> Column:
    """Membership test against :func:`bloom_long_array` words carried
    in ``words_col`` (attach them once via a one-row broadcast
    ``crossJoin`` — an attribute, not a literal, so codegen stays
    compact no matter the filter size): AND over the item's ``hashes``
    positions of ``(word >> bit) & 1``. Arithmetic shift sign-extends,
    so bit 63 of a negative word still reads correctly. Per-row cost
    is ``hashes`` md5s plus O(1) array indexing — independent of
    ``bits``, unlike the string-literal probe."""
    hit = F.lit(True)
    for d in range(hashes):
        pos = bloom_bit(item, F.lit(d), bits)
        word = F.element_at(words_col, (pos / 64).cast("int") + 1)
        bit = (pos % 64).cast("int")
        # SQL shiftright accepts a column shift amount; the PySpark
        # wrapper F.shiftright insists on a Python int, hence
        # call_function
        shifted = F.call_function("shiftright", word, bit)
        hit = hit & (shifted.bitwiseAND(F.lit(1)) == 1)
    return hit


# ---------------------------------------------------------------------------
# Engine-portable HyperLogLog (md5 hash family)
# ---------------------------------------------------------------------------
# Spark's built-in HLL++ (approx_count_distinct / hll_sketch_agg) is
# the right tool when cross-engine reproducibility doesn't matter; its
# register layout is implementation-defined, so it can never value-hash
# against DuckDB. This HLL uses the shared md5 contract instead
# (Flajolet et al. 2007 estimator): bucket = first 8 hex chars % m,
# rho = leading-zero count of the NEXT 8 hex chars + 1 — pure
# string/integer arithmetic (never float log2 on the hot path), so
# both engines build bit-identical registers. The float discipline
# holds exactly: the harmonic sum's terms are powers of two spanning
# 2^0..2^-33 with partial sums < m = 2^8 — an exponent range of 41
# bits < 53, so EVERY partial sum is exactly representable and the
# result is order-independent with no rounding tricks.

#: Register count (2^8). rsd ~ 1.04 / sqrt(m) ~ 6.5%.
HLL_M = 256
#: alpha_m * m^2 for the raw estimate (Flajolet et al. 2007, m >= 128).
HLL_ALPHA_MM = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M


def hll_register(item: Column) -> tuple[Column, Column]:
    """``(bucket, rho)`` register coordinates of an item — the shared
    Spark/DuckDB contract (leading zeros counted on the hex string:
    4 per leading '0' char plus 0-3 from the first non-zero digit)."""
    hx = F.md5(item.cast("string"))
    bucket = (
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % HLL_M
    ).cast("int")
    rest = F.substring(hx, 9, 8)
    t = F.regexp_replace(rest, "^0+", "")
    fc = F.substring(t, 1, 1)
    extra = (
        F.when(fc == "1", F.lit(3))
        .when(fc.isin("2", "3"), F.lit(2))
        .when(fc.isin("4", "5", "6", "7"), F.lit(1))
        .otherwise(F.lit(0))
    )
    rho = (
        F.when(t == "", F.lit(33))
        .otherwise((F.lit(8) - F.length(t)) * 4 + extra + 1)
    ).cast("int")
    return bucket, rho


def hll_build(
    df: DataFrame, item: Column, group_cols: list[str] | None = None
) -> DataFrame:
    """Mergeable HLL registers: one row per occupied (group, bucket)
    with the max rho — ONE map-side-combinable aggregation; at most
    ``HLL_M`` rows per group regardless of input size. Merge = another
    max-groupBy (:func:`hll_merge`)."""
    groups = list(group_cols or [])
    bucket, rho = hll_register(item)
    return (
        df.select(*groups, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Register-wise max — sketches of any data partitioning merge to
    the sketch of the union (the HLL mergeability property, exact)."""
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    keys = [c for c in u.columns if c not in ("max_rho",)]
    return u.groupBy(*keys).agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(
    sketch: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate from the registers: harmonic mean with
    the small-range linear-counting correction (Flajolet et al. 2007).
    Every float op is engine-deterministic (exact power-of-two sums,
    one division, one multiply; ln only in the small-range branch,
    absorbed by the 4-dp round), so the estimate value-hashes."""
    groups = list(group_cols or [])
    agg = sketch.groupBy(*groups).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__z_occ"),
        F.count(F.lit(1)).alias("__nb"),
    )
    z = F.col("__z_occ") + (F.lit(HLL_M) - F.col("__nb"))
    v = (F.lit(HLL_M) - F.col("__nb")).cast("double")
    e_raw = F.lit(HLL_ALPHA_MM) / z
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(e_raw)
    return agg.select(*groups, F.round(est, 4).alias("approx_distinct"))
