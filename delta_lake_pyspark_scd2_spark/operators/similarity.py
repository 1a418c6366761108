"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how a 100 TB pipeline would deploy ANN:
  * :func:`cosine_topk` — exact brute-force top-k. The query set is
    broadcast (it is small by definition); each partition of the corpus
    scores locally and a single top-k-per-query aggregation follows.
    O(|corpus| × |queries|) work but embarrassingly parallel and
    shuffle-light: the only exchange carries ``|queries| × k`` rows.
  * :func:`ivf_topk` — IVF-style bucketed search: corpus vectors are
    assigned to their nearest centroid once (broadcast centroids);
    queries probe only their own centroid's bucket. At scale the
    assignment is persisted and bucketed-by-centroid on disk so a probe
    is a partition-pruned scan.

All arithmetic is double-precision via ``zip_with``/``aggregate``
higher-order functions (JVM codegen) — deterministic left-to-right
summation, so results are bit-reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# Adopted serving configs — the COVERAGE.md index-selection matrix
# winners, stamped here so deployments import ONE surface instead of
# re-reading the docs (round-6 VERDICT directive #6). Selection
# measurements: tools/pq_sweep.py (PQ grid, round 6) and
# tools/ivfpq_probe_sweep.py (composed probe sweep, round 8); the
# in-pipeline twins are the ann_*_adopted_recall_eval registry queries.
# tests/test_llm_operators.py pins these == the COVERAGE.md matrix.
ADOPTED_PQ = {"m_subspaces": 32, "k_codes": 256}  # 0.852 @10, 8x cut
ADOPTED_IVF = {"nprobe": 4}  # 0.712 @5 at ~4/8 scan, full vectors
ADOPTED_IVFPQ = {"n_centroids": 32, "nprobe": 12}  # 0.740 @10, ~38% scan


def adopted_defaults() -> dict:
    """The measured serving defaults as one dict: ``pq`` (compressed
    codes: pass to :func:`pq_train` / :func:`build_ivfpq_index`),
    ``ivf`` (uncompressed probing: :func:`ivf_topk` ``nprobe``), and
    ``ivfpq`` (composed index: coarse-quantizer size for
    :func:`~delta_lake_pyspark_scd2_spark.operators.clustering.kmeans_fit`
    plus ``nprobe`` for :func:`ivfpq_search_index`). Copies, so callers
    can tweak without mutating the adopted record."""
    return {
        "pq": dict(ADOPTED_PQ),
        "ivf": dict(ADOPTED_IVF),
        "ivfpq": dict(ADOPTED_IVFPQ),
    }


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition ahead of per-row-heavy vector math — a compact
    upstream scan (single row-group) would pin the scoring loop to one
    core; see operators.dedup._spread."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n, key)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with norms precomputed per *vector* (n work) instead of
    per *pair* (n² work): same doubles, same result, 3x less per-pair
    arithmetic — the difference between feasible and not at 100 TB.
    """
    return dot(a, b) / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Ties broken by neighbor id ascending for determinism.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
    ).withColumn("__qnorm", norm(F.col("__qvec")))
    c = _spread(corpus.select(F.col(id_col), F.col(vec_col)), id_col).withColumn(
        "__cnorm", norm(F.col(vec_col))
    )
    # Rank on the ROUNDED score (ties → neighbor id): rounding first makes
    # the ranking reproducible across engines/architectures.
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenormed(
                    F.col("__qvec"),
                    F.col(vec_col),
                    F.col("__qnorm"),
                    F.col("__cnorm"),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.col("cos_sim"),
        )
    )


def assign_to_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF assignment: nearest centroid (max cosine) per corpus vector.

    Centroids are broadcast; ties break toward the lower centroid id.
    At 100 TB this output is written bucketed by ``centroid_id`` so
    probes become partition-pruned scans.

    Shape (round-10 optimization): the k centroids collapse into ONE
    broadcast row holding an array of (id, vec, norm) structs, and the
    argmax is a per-row array reduction —
    ``array_max`` over ``struct(sim, -centroid_id)`` reproduces the
    previous ``row_number() OVER (PARTITION BY id ORDER BY sim DESC,
    centroid_id ASC) = 1`` pick exactly (max sim, ties to the lower
    id; a NULL sim sorts below any value in both forms). This removes
    the k× row explosion through the per-id Exchange + Sort that the
    window needed — per k-means iteration and per IVF build, the
    corpus now flows through zero assignment shuffles. Scores are the
    same 6-dp-rounded :func:`cosine_prenormed` doubles in the same
    argument order, so every oracle contract is bit-identical.
    """
    packed = (
        centroids.select(
            F.col(id_col).alias(centroid_id_col),
            F.col(vec_col).alias("__cvec"),
        )
        .withColumn("__centnorm", norm(F.col("__cvec")))
        .agg(
            F.collect_list(
                F.struct(centroid_id_col, "__cvec", "__centnorm")
            ).alias("__cents")
        )
    )
    best = F.array_max(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                F.round(
                    cosine_prenormed(
                        c["__cvec"],
                        F.col(vec_col),
                        c["__centnorm"],
                        F.col("__vnorm"),
                    ),
                    6,
                ).alias("__sim"),
                (-c[centroid_id_col]).alias("__negid"),
            ),
        )
    )
    return (
        _spread(corpus, id_col)
        .withColumn("__vnorm", norm(F.col(vec_col)))
        .crossJoin(F.broadcast(packed))
        .withColumn("__best", best)
        # empty centroid set: array_max([]) is NULL — match the old
        # crossJoin-with-zero-rows semantics (no output rows)
        .filter(F.col("__best").isNotNull())
        .withColumn(centroid_id_col, -F.col("__best")["__negid"])
        .drop("__best", "__cents", "__vnorm")
    )


def _centroid_scores(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_id_col: str,
) -> DataFrame:
    """(corpus row × centroid) cosine scores — THE rounding (6 dp) and
    column contract that every centroid-assignment consumer and its
    DuckDB oracle share; keep it in one place."""
    cents = centroids.select(
        F.col(id_col).alias(centroid_id_col), F.col(vec_col).alias("__cvec")
    ).withColumn("__centnorm", norm(F.col("__cvec")))
    return (
        _spread(corpus, id_col)
        .withColumn("__vnorm", norm(F.col(vec_col)))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "__sim",
            F.round(
                cosine_prenormed(
                    F.col("__cvec"),
                    F.col(vec_col),
                    F.col("__centnorm"),
                    F.col("__vnorm"),
                ),
                6,
            ),
        )
    )


def _nearest_centroid_window(id_col: str, centroid_id_col: str):
    """Max-cosine assignment tie-breaks toward the lower centroid id."""
    return Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col(centroid_id_col).asc()
    )


def ivf_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: search the query's ``nprobe`` nearest centroid buckets.
    Recall rises with ``nprobe`` (= exact when nprobe = |centroids|);
    cost ~ nprobe × corpus/|centroids| per query. Queries need not be
    corpus members — probes rank centroids against the query vector
    directly (identical bucket choice for corpus members, since
    assignment uses the same ranking).

    At 100 TB the assignment table is written once, bucketed by
    ``centroid_id``; each probe is then a partition-pruned scan instead
    of this in-flight join.

    Delegates to :func:`ivf_topk_sweep` with a single ``nprobe`` —
    there is exactly ONE implementation of the engine-exact ranking
    contract (6-dp rounding, centroid/neighbor-id tie-breaks), so the
    recall the sweep-based evaluation certifies is, by construction,
    the recall this operator delivers.
    """
    return ivf_topk_sweep(
        corpus,
        centroids,
        queries,
        k=k,
        nprobes=(nprobe,),
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "neighbor_id", "rank", "cos_sim")


def ivf_topk_sweep(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobes: tuple[int, ...] = (1, 2, 4),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`ivf_topk` at several ``nprobe`` settings in ONE pass —
    the recall/cost sweep an index-tuning evaluation runs before a
    pipeline adopts a configuration.

    Cost is that of a single ``ivf_topk`` at ``max(nprobes)``: the
    assignment and the candidate scoring run once, each candidate
    carrying its probe rank; the per-``nprobe`` result sets are then
    rank filters over the shared scored frame (a 3-row nprobe table
    broadcast-joined in — no second scoring pass, no second shuffle of
    the corpus). Buckets partition the corpus (each vector lives in
    exactly one), so no candidate appears twice within a sweep entry.

    Output: ``(nprobe, query_id, neighbor_id, rank, cos_sim)`` — the
    exact ``ivf_topk`` result for every requested ``nprobe``.
    """
    nps = sorted(set(int(n) for n in nprobes))
    if not nps or nps[0] < 1:
        raise ValueError(f"nprobes must be positive, got {nprobes!r}")
    max_np = nps[-1]
    assigned = assign_to_centroids(
        corpus, centroids, id_col=id_col, vec_col=vec_col
    )
    cents = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__cvec")
    ).withColumn("__centnorm", norm(F.col("__cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    ).withColumn("__qnorm", norm(F.col("__qvec")))
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "__sim",
        F.round(
            cosine_prenormed(
                F.col("__cvec"),
                F.col("__qvec"),
                F.col("__centnorm"),
                F.col("__qnorm"),
            ),
            6,
        ),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.withColumn("__prn", F.row_number().over(w_probe))
        .filter(F.col("__prn") <= max_np)
        .select("query_id", "__qvec", "__qnorm", "centroid_id", "__prn")
    )
    bucket = assigned.select(id_col, "centroid_id", vec_col).withColumn(
        "__cnorm", norm(F.col(vec_col))
    )
    scored = (
        bucket.join(F.broadcast(probes), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenormed(
                    F.col("__qvec"),
                    F.col(vec_col),
                    F.col("__qnorm"),
                    F.col("__cnorm"),
                ),
                6,
            ),
        )
        .select("query_id", "__prn", F.col(id_col).alias("neighbor_id"), "cos_sim")
    )
    np_df = corpus.sparkSession.createDataFrame(
        [(n,) for n in nps], "nprobe int"
    )
    fanned = scored.join(
        F.broadcast(np_df), scored["__prn"] <= F.col("nprobe")
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        fanned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("nprobe", "query_id", "neighbor_id", "rank", "cos_sim")
    )


def build_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Materialize the IVF index the in-flight :func:`ivf_topk` only
    simulates: centroid assignment + per-vector norm, committed as a
    :class:`VersionedParquetTable` PARTITIONED BY ``centroid_id``.

    This is the build/search split every production ANN system makes —
    the O(corpus × centroids) assignment runs once, searches amortize
    it. Because the table is partitioned on the centroid id, a probe
    is a manifest-level partition-pruned scan: at 100 TB a query that
    probes 2 of 4096 buckets lists 2/4096ths of the files, not the
    corpus. The index versions like any table (rebuild = new version,
    time travel to the old index for A/B comparison).
    """
    from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable

    assigned = assign_to_centroids(
        corpus, centroids, id_col=id_col, vec_col=vec_col
    ).withColumn("__vnorm", norm(F.col(vec_col)))
    return VersionedParquetTable.create(
        corpus.sparkSession,
        assigned,
        index_path,
        partition_cols=["centroid_id"],
        metrics={"op": "IVF_BUILD"},
    )


def ivf_search_index(
    index,
    centroids: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF index (:func:`build_ivf_index`): rank
    centroids per query, then read ONLY the probed buckets' partitions
    from the index table and score within them. Results are identical
    to :func:`ivf_topk` at the same ``(centroids, nprobe, k)`` — the
    difference is the probe cost: a partition-pruned scan of the
    prebuilt assignment instead of recomputing it per search.

    The probed-centroid list is collected to the driver first — it is
    ``|queries| × nprobe`` ids, small by definition, and knowing it at
    plan time is exactly what makes the scan prunable.
    """
    cents = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__cvec")
    ).withColumn("__centnorm", norm(F.col("__cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    ).withColumn("__qnorm", norm(F.col("__qvec")))
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "__sim",
        F.round(
            cosine_prenormed(
                F.col("__cvec"), F.col("__qvec"), F.col("__centnorm"), F.col("__qnorm")
            ),
            6,
        ),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "__qvec", "__qnorm", "centroid_id")
    )
    probed_ids = sorted(
        {r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()}
    )
    bucket = index.read_partitions(
        [{"centroid_id": str(c)} for c in probed_ids]
    )
    scored = (
        bucket.join(F.broadcast(probes), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenormed(
                    F.col("__qvec"),
                    F.col(vec_col),
                    F.col("__qnorm"),
                    F.col("__vnorm"),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "cos_sim")
    )


def linear_probe_scores(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    good_label: int = 0,
) -> DataFrame:
    """Quality-classifier scoring, fasttext/linear-probe style: train a
    linear separator on the corpus itself (weight vector = difference
    of the good-class and rest centroids — the LDA direction under
    isotropic covariance), then score every row with
    ``sigmoid(w · x)``. The standard shape for pretraining-data quality
    filters: a tiny trained model applied corpus-wide.

    Scale shape: training is ONE map-side-combined aggregation over
    (dim, value) pairs (posexplode is narrow; the groupBy carries
    |dims| groups); the learned ``w`` is a bounded driver collect
    (|dims| floats — the model), re-broadcast as a literal so scoring
    is a pure JVM zip_with/aggregate over each partition — no join, no
    shuffle, model-parallel exactly like a broadcast fasttext model.
    Weights round to 6 decimals so scores are reproducible bit-for-bit
    across engines and summation orders.
    """
    dims = df.select(
        F.col(label_col).alias("__l"),
        F.posexplode(F.col(vec_col)).alias("__d", "__x"),
    )
    w_rows = (
        dims.groupBy("__d")
        .agg(
            F.round(
                F.avg(F.when(F.col("__l") == good_label, F.col("__x")))
                - F.avg(F.when(F.col("__l") != good_label, F.col("__x"))),
                6,
            ).alias("__w")
        )
        .orderBy("__d")
        .collect()
    )
    if any(r["__w"] is None for r in w_rows):
        raise ValueError(
            "linear_probe_scores needs BOTH classes present: every row "
            f"has label {'==' if w_rows else '!='} good_label, so one "
            "class centroid is undefined"
        )
    w = F.array(*[F.lit(float(r["__w"])) for r in w_rows])
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot(F.col(vec_col), w)))
    return df.select(
        F.col(id_col),
        F.col(label_col),
        F.round(score, 6).alias("score"),
        (score >= 0.5).alias("predicted_good"),
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    per_cluster: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-capped sampling in embedding space (the SemDeDup /
    cluster-balance curation shape, Abbas et al. 2023): assign every
    vector to its nearest centroid (max cosine), then keep each
    cluster's ``per_cluster`` MOST CENTRAL members — no region of
    embedding space can dominate the kept set.

    Scale shape: centroids broadcast; vectors leave the plan right
    after scoring, so both window shuffles carry only
    ``(id, centroid_id, sim)`` triples; the per-cluster cap is a
    WindowGroupLimit (top-k per key, no full sort). Deterministic:
    cosine rounded to 6 with id tie-breaks, same rows on any cluster
    shape. Returns (id, centroid_id, rank, sim).
    """
    scored = _centroid_scores(
        corpus.select(id_col, vec_col), centroids, id_col, vec_col,
        "centroid_id",
    ).select(id_col, "centroid_id", "__sim")  # vectors leave the plan here
    wa = _nearest_centroid_window(id_col, "centroid_id")
    assigned = (
        scored.withColumn("__rn", F.row_number().over(wa))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("__sim", "sim")
    )
    wc = Window.partitionBy("centroid_id").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        assigned.withColumn("rank", F.row_number().over(wc))
        .filter(F.col("rank") <= per_cluster)
        .select(id_col, "centroid_id", F.col("rank").cast("int"), "sim")
    )


# -- product quantization (Jégou et al. 2011) --------------------------------


def pq_fixed_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    m_subspaces: int = 8,
    k_codes: int = 32,
) -> list:
    """Codebooks taken VERBATIM from the ``k_codes`` lowest-id vectors'
    subvector slices — no Lloyd iterations.

    Quantization quality is below :func:`pq_train`'s, but the codebook
    is a pure SQL-expressible function of the table, which makes the
    whole encode→LUT→ADC pipeline value-hash checkable against a
    DuckDB oracle (``ann_pq_adc_topk`` / ``ann_ivfpq_adc_topk``) — the
    oracle story k-means training can't have. Same
    ``codebooks[m][k][d_sub]`` shape as :func:`pq_train`, so it drops
    into :func:`pq_encode` / :func:`pq_topk` / :func:`ivfpq_topk`
    unchanged."""
    import numpy as np

    rows = df.select(id_col, vec_col).orderBy(id_col).limit(k_codes).collect()
    if len(rows) < k_codes:
        raise ValueError(f"need >= {k_codes} rows for fixed codebooks")
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    d_sub = dim // m_subspaces
    return [
        X[:, m * d_sub : (m + 1) * d_sub].tolist() for m in range(m_subspaces)
    ]


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    m_subspaces: int = 8,
    k_codes: int = 16,
    sample: int = 2048,
    iters: int = 8,
) -> list:
    """Train PQ codebooks: split vectors into ``m_subspaces`` equal
    slices, k-means each slice to ``k_codes`` centroids.

    Deterministic by construction (cluster-shape independent): the
    training sample is the ``sample`` LOWEST ids (an order-free
    predicate, not a random split), init is the first k distinct
    sample rows, and Lloyd iterations run driver-side in float64 on
    the collected sample — at any corpus size the sample is the
    bounded object, never the table. Returns
    ``codebooks[m][k][d_sub]`` (plain lists, serializable).
    """
    import numpy as np

    rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    n, dim = X.shape
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    d_sub = dim // m_subspaces
    books = []
    for m in range(m_subspaces):
        S = X[:, m * d_sub : (m + 1) * d_sub]
        # init: first k distinct rows of the slice
        seen, init = set(), []
        for row in S:
            t = tuple(row)
            if t not in seen:
                seen.add(t)
                init.append(row)
            if len(init) == k_codes:
                break
        C = np.array(init, dtype=np.float64)
        while C.shape[0] < k_codes:  # degenerate slice: pad
            C = np.vstack([C, C[-1] + 1e-9 * (C.shape[0] + 1)])
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k_codes):
                mask = assign == j
                if mask.any():
                    C[j] = S[mask].mean(axis=0)
        books.append(C.tolist())
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    carry_cols: "Sequence[str]" = (),
) -> DataFrame:
    """Encode each vector as ``m`` one-byte-ish codes (argmin centroid
    per subspace) — Arrow-batched numpy matmul per partition, the
    standard ||x−c||² = ||x||² − 2x·c + ||c||² trick. 64-dim float64
    → 8 int codes is an 8×…64× memory cut for the search structure.

    ``carry_cols`` pass through the Arrow hop unchanged (round-10
    optimization): IVF-PQ builds need ``(id, centroid_id, codes)`` and
    previously joined the encode output back onto the assignment on
    the id — a second corpus pass plus an id-keyed shuffle for a
    column the input row already had.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    carry = list(carry_cols)
    in_schema = df.select(id_col, vec_col, *carry).schema
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            *[in_schema[c] for c in carry],
            T.StructField("pq_codes", T.ArrayType(T.IntegerType())),
        ]
    )
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    bnorm2 = [(b * b).sum(axis=1) for b in books]

    def _enc(batches):
        for pdf in batches:
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(pdf), m_sub), dtype=np.int32)
            for m in range(m_sub):
                S = X[:, m * d_sub : (m + 1) * d_sub]
                d2 = bnorm2[m][None, :] - 2.0 * (S @ books[m].T)
                codes[:, m] = d2.argmin(axis=1)
            out = {id_col: pdf[id_col]}
            for c in carry:
                out[c] = pdf[c]
            out["pq_codes"] = list(codes)
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col, *carry).mapInPandas(
        _enc, schema=out_schema
    )


def pq_topk(
    codes_df: DataFrame,
    codebooks: list,
    query_vec: list,
    *,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance search: the query builds one tiny
    ``m × k_codes`` lookup table of exact sub-distances driver-side;
    each row's approximate distance is then a pure JVM fold over its
    codes (``aggregate`` + nested ``element_at`` on the broadcast LUT
    literal) — no vector math touches the corpus at query time, and
    the only exchange is the final top-k."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    lut = []
    for m in range(m_sub):
        C = np.asarray(codebooks[m], dtype=np.float64)
        qs = q[m * d_sub : (m + 1) * d_sub]
        lut.append(((C - qs[None, :]) ** 2).sum(axis=1).tolist())
    lut_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in lut]
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("pq_codes"),
            F.sequence(F.lit(0), F.lit(m_sub - 1)),
            lambda code, m: F.element_at(
                F.element_at(lut_lit, m.cast("int") + 1), code + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        codes_df.withColumn("pq_dist", F.round(dist, 6))
        .orderBy(F.col("pq_dist").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "pq_dist")
    )


def probe_centroids(
    query_vec: list,
    centroids: DataFrame,
    nprobe: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """The ``nprobe`` nearest centroid ids to a query vector,
    driver-side (centroids are small by definition) — THE cross-engine
    probe contract, in one place: dot/norm accumulate in strict
    left-to-right IEEE order (bit-identical to a SQL engine's
    sequential ``list_dot_product``; numpy's BLAS/pairwise order is
    NOT), the cosine rounds to 6 dp, and ties break to the lower
    centroid id — so an oracle cannot disagree on the probe-set
    boundary by a last-ulp difference. Shared by :func:`ivfpq_topk`
    and the trained-IVFPQ registry queries."""
    cent_rows = [
        (r[id_col], [float(x) for x in r[vec_col]])
        for r in centroids.select(id_col, vec_col).collect()
    ]
    return _probe_from_rows(query_vec, cent_rows, nprobe)


def _probe_from_rows(query_vec, cent_rows, nprobe: int) -> list:
    """The :func:`probe_centroids` contract over ALREADY-COLLECTED
    centroid rows — lets multi-query searchers collect the (small)
    centroid table once instead of once per query."""
    import math

    def _dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    q = [float(x) for x in query_vec]
    qn = math.sqrt(_dot(q, q)) or 1.0
    sims = sorted(
        (
            -_round_half_up(
                _dot(q, cv) / (qn * (math.sqrt(_dot(cv, cv)) or 1.0)), 6
            ),
            cid,
        )
        for cid, cv in cent_rows
    )
    return [cid for _, cid in sims[:nprobe]]


def ivfpq_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: list,
    query_vec: list,
    *,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the industry-standard composed index (FAISS's
    ``IVFx,PQy``): IVF restricts the search to the query's ``nprobe``
    nearest centroid buckets, PQ's asymmetric-distance LUT scores the
    surviving candidates without touching a single corpus vector.

    At 100 TB the assignment+codes table is written bucketed by
    ``centroid_id`` (see :func:`build_ivf_index`): a probe is a
    partition-pruned scan over rows of ~m bytes each — the resident
    working set shrinks by bucket selectivity × PQ compression
    multiplied together.

    Composition of existing pieces: :func:`assign_to_centroids` +
    :func:`pq_encode` + the :func:`pq_topk` LUT fold with a bucket
    pre-filter.
    """
    # ONE corpus pass: the assignment output (corpus cols +
    # centroid_id) feeds the encoder directly, with centroid_id
    # carried through the Arrow hop — the old shape encoded the corpus
    # in a second scan and joined it back onto the assignment by id
    codes = pq_encode(
        assign_to_centroids(
            corpus, centroids, id_col=id_col, vec_col=vec_col
        ),
        codebooks,
        vec_col,
        id_col,
        carry_cols=["centroid_id"],
    )
    probe_ids = probe_centroids(
        query_vec, centroids, nprobe, id_col=id_col, vec_col=vec_col
    )
    bucket = codes.filter(F.col("centroid_id").isin(probe_ids))
    return pq_topk(bucket, codebooks, query_vec, k=k, id_col=id_col)


def adc_lut_rows(
    q_rows: list, codebooks: list, *, round_dp: int | None = None
) -> list:
    """Driver-side ADC lookup tables for a (small) query set:
    ``(query_id, m, code, d2)`` rows, one per query x subspace x code
    — THE one place the per-subspace squared-L2 LUT math lives, shared
    by :func:`ivfpq_search_index` and the adopted-config recall evals
    so a contract change (e.g. rounding policy) cannot drift between
    the searcher and the eval harness. ``round_dp`` applies the eval
    contract's per-term rounding; the searcher keeps full precision.
    Sub-dimension comes from the books themselves, never a hardcoded
    embedding dim.
    """
    import numpy as np

    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    rows = []
    for qid, qv in q_rows:
        q = np.asarray(qv, dtype=np.float64)
        for m in range(m_sub):
            C = np.asarray(codebooks[m], dtype=np.float64)
            d2s = ((C - q[m * d_sub:(m + 1) * d_sub][None, :]) ** 2).sum(
                axis=1
            )
            rows.extend(
                (
                    qid,
                    m,
                    int(c),
                    float(v) if round_dp is None else float(round(v, round_dp)),
                )
                for c, v in enumerate(d2s)
            )
    return rows


def codebooks_tag(codebooks: list) -> str:
    """Content tag of a PQ codebook set. Stamped on a persisted index
    and REFUSED on mismatch at search time: codes are meaningless
    under any other codebooks, and a silent books/codes mismatch is
    the same failure family as the round-5 minhash hash-family bug —
    stored signatures must carry their family tag."""
    import hashlib
    import json

    return hashlib.md5(
        json.dumps(codebooks, separators=(",", ":")).encode()
    ).hexdigest()[:16]


def centroids_tag(
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Content tag of a coarse-centroid set (bounded collect — the
    centroid table is small by definition). Stamped at build and
    enforced on extend/search: bucket assignments are meaningless
    under a different centroid set, the same family-tag discipline as
    :func:`codebooks_tag`."""
    import hashlib
    import json

    rows = sorted(
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in centroids.select(id_col, vec_col).collect()
    )
    return hashlib.md5(
        json.dumps(rows, separators=(",", ":")).encode()
    ).hexdigest()[:16]


def _check_centroids_tag(props: dict, centroids, id_col, vec_col, op: str):
    stored = props.get("ivfpq.centroids_tag")
    if stored is not None and centroids_tag(
        centroids, id_col=id_col, vec_col=vec_col
    ) != stored:
        raise ValueError(
            f"{op}: supplied centroids do not match the index's "
            f"centroids_tag {stored} — stored bucket assignments were "
            "made against a different coarse-centroid set; rebuild the "
            "index or pass the original centroids"
        )


def build_ivfpq_index(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: list,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoder=None,
):
    """Materialize the COMPRESSED serving index: centroid assignment +
    PQ codes committed as a :class:`VersionedParquetTable` partitioned
    by ``centroid_id`` — no raw vectors stored, which IS the point:
    with the adopted PQ-32x256 config a 64-dim float32 corpus shrinks
    8x, and at 100 TB the probe working set shrinks by bucket
    selectivity x PQ compression multiplied (a 2-of-4096-bucket probe
    over 32-byte rows).

    The codebooks ride the table as properties (``ivfpq.codebooks``
    JSON + ``ivfpq.books_tag`` content hash), so the index is
    self-describing and :func:`ivfpq_search_index` can refuse
    mismatched books instead of silently scoring garbage. At real
    scale the books JSON (m x k x d_sub floats, ~300 KB at 32x256x2)
    stays manifest-sized — it does not grow with the corpus.

    ``encoder`` (default :func:`pq_encode`, the Arrow-batched matmul
    path) lets contract consumers build stored codes under the
    cross-engine trained-PQ arithmetic instead
    (:func:`pq_encode_expr`): raw-float argmin and 9-dp-rounded argmin
    can disagree on a near-tie, and stored codes must match whichever
    contract the caller's verification oracle unrolls. Signature:
    ``encoder(df, codebooks, vec_col, id_col) -> (id_col, pq_codes)``.
    """
    import json

    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    assigned = assign_to_centroids(
        corpus, centroids, id_col=id_col, vec_col=vec_col
    ).select(id_col, "centroid_id")
    enc = encoder if encoder is not None else pq_encode
    rows = enc(corpus, codebooks, vec_col, id_col).join(
        assigned, id_col
    )
    return VersionedParquetTable.create(
        corpus.sparkSession,
        rows,
        index_path,
        partition_cols=["centroid_id"],
        properties={
            "ivfpq.codebooks": json.dumps(codebooks),
            "ivfpq.books_tag": codebooks_tag(codebooks),
            "ivfpq.centroids_tag": centroids_tag(
                centroids, id_col=id_col, vec_col=vec_col
            ),
            "ivfpq.m": str(len(codebooks)),
            "ivfpq.k_codes": str(len(codebooks[0])),
        },
        metrics={"op": "IVFPQ_BUILD"},
    )


def extend_ivfpq_index(
    index,
    new_vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: tuple[str, int] | None = None,
) -> int:
    """Incremental index maintenance: assign + encode ONLY the newly
    arrived vectors under the index's OWN stored codebooks and append
    them — the index grows with the corpus at new-data cost, no
    retraining, no re-encoding of history, and the books/codes pairing
    cannot drift because the books come off the table itself. The
    append is a versioned commit: time travel compares the index
    before/after a batch, and vacuum retires old versions.

    (Quantization drift is the operational caveat: if the embedding
    distribution moves far from the training sample, recall decays —
    re-measure with ``ann_pq_adopted_recall_eval`` and rebuild when it
    drops.) Returns the new table version.

    ``txn=(app_id, txn_version)`` passes through to the versioned
    append (Delta ``txnAppId``/``txnVersion`` semantics): a replayed
    ingest batch — a streaming sink retry, a re-run backfill — becomes
    a no-op instead of double-inserting the same codes (round-6
    ADVICE: the index writer had no idempotency handle).
    """
    import json

    props = index.properties()
    if "ivfpq.codebooks" not in props:
        raise ValueError(
            "extend_ivfpq_index: index has no stored codebooks — "
            "build it with build_ivfpq_index first"
        )
    codebooks = json.loads(props["ivfpq.codebooks"])
    # mis-bucketing under a different centroid set is the silent twin
    # of the books mismatch — refuse it the same way
    _check_centroids_tag(
        props, centroids, id_col, vec_col, "extend_ivfpq_index"
    )
    # one batch pass: centroid_id carried through the encoder
    rows = pq_encode(
        assign_to_centroids(
            new_vectors, centroids, id_col=id_col, vec_col=vec_col
        ),
        codebooks,
        vec_col,
        id_col,
        carry_cols=["centroid_id"],
    )
    return index.append(rows, txn=txn)


def ivfpq_search_index(
    index,
    centroids: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    codebooks: list | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF-PQ index (:func:`build_ivfpq_index`):
    per-query probe sets via the shared :func:`probe_centroids`
    contract, a manifest-pruned partition read of ONLY the probed
    buckets, then one broadcast ADC-LUT join scores every query's
    candidates without touching a single raw vector. Results match
    :func:`ivfpq_topk` at the same ``(centroids, codebooks, nprobe,
    k)`` up to the 6-dp ADC rounding contract: the per-query distance
    is a float sum whose partition order differs between the two
    paths, so a sum landing within an ulp of a rounding boundary can
    round differently and flip an exact ``pq_dist`` tie (round-6
    ADVICE scoping — equality of the top-k SET is the contract the
    tests pin; rank order is deterministic within each path via the id
    tiebreak). The difference is the probe cost (pruned scan of
    ~m-byte rows vs recomputing assignment + codes per search).

    ``codebooks`` defaults to the books stored on the index; passing
    them explicitly cross-checks the content tag and raises on
    mismatch (stored codes are meaningless under other books). The
    query table is collected driver-side to build the LUTs — queries
    are small by definition, the same bounded contract as
    :func:`ivf_search_index`'s probe list.
    """
    import json

    props = index.properties()
    stored_tag = props.get("ivfpq.books_tag")
    if codebooks is None:
        if "ivfpq.codebooks" not in props:
            raise ValueError(
                "ivfpq_search_index: index has no stored codebooks — "
                "not an ivfpq index, or pass codebooks= explicitly"
            )
        codebooks = json.loads(props["ivfpq.codebooks"])
    elif stored_tag is not None and codebooks_tag(codebooks) != stored_tag:
        raise ValueError(
            "ivfpq_search_index: supplied codebooks do not match the "
            f"index's books_tag {stored_tag} — the stored codes were "
            "encoded under different books; rebuild the index or pass "
            "the original books"
        )
    _check_centroids_tag(
        props, centroids, id_col, vec_col, "ivfpq_search_index"
    )
    spark = queries.sparkSession
    q_rows = [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in queries.select(id_col, vec_col).collect()
    ]
    cent_rows = [
        (r[id_col], [float(x) for x in r[vec_col]])
        for r in centroids.select(id_col, vec_col).collect()
    ]
    probe_rows = [
        (qid, cid)
        for qid, qv in q_rows
        for cid in _probe_from_rows(qv, cent_rows, nprobe)
    ]
    lut_rows = adc_lut_rows(q_rows, codebooks)
    probes = spark.createDataFrame(
        probe_rows, "query_id long, centroid_id long"
    )
    lut = spark.createDataFrame(
        lut_rows, "query_id long, m int, code int, d2 double"
    )
    probed_ids = sorted({cid for _, cid in probe_rows})
    bucket = index.read_partitions(
        [{"centroid_id": str(c)} for c in probed_ids]
    )
    # no self-exclusion: identical candidate semantics to ivfpq_topk
    # (callers drop the query id themselves when they want it gone)
    cand = bucket.join(F.broadcast(probes), "centroid_id")
    adc = (
        cand.select(
            "query_id", id_col, F.posexplode("pq_codes").alias("m", "code")
        )
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("d2"), 6).alias("pq_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_dist").asc(), F.col(id_col).asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "rank", "pq_dist"
        )
    )


def hard_negatives_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    ``k`` MOST similar corpus vectors with a DIFFERENT label — the
    near-miss examples metric-learning batches are built from.

    Same plan as :func:`cosine_topk` (queries broadcast, corpus
    partition-parallel, only q×k rows shuffle); the label filter rides
    the broadcast join, so mismatched pairs are dropped before any
    window work.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.col(label_col).alias("__qlabel"),
    ).withColumn("__qnorm", norm(F.col("__qvec")))
    c = _spread(
        corpus.select(F.col(id_col), F.col(vec_col), F.col(label_col)),
        id_col,
    ).withColumn("__cnorm", norm(F.col(vec_col)))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(label_col) != F.col("__qlabel"))
        .withColumn(
            "cos_sim",
            F.round(
                cosine_prenormed(
                    F.col("__qvec"),
                    F.col(vec_col),
                    F.col("__qnorm"),
                    F.col("__cnorm"),
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            F.col(id_col).alias("negative_id"),
            F.col(label_col).alias("negative_label"),
            "rank",
            "cos_sim",
        )
    )


def _round_half_up(x: float, nd: int) -> float:
    """Spark/DuckDB ``round`` (HALF_UP) for driver-side contract math —
    Python's builtin banker's rounding diverges exactly at ties."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))


def _d2_contract(s, c) -> float:
    """Squared L2 in STRICT left-to-right IEEE order — the shared
    arithmetic contract of the trained-PQ oracle (the SQL side spells
    the same ``(s1-c1)² + (s2-c2)² + …`` left-associated expression, so
    both engines produce the bit-identical double before rounding)."""
    acc = 0.0
    for a, b in zip(s, c):
        acc = acc + (a - b) * (a - b)
    return acc


def pq_train_contract(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    m_subspaces: int = 8,
    k_codes: int = 16,
    sample: int = 64,
    iters: int = 2,
) -> list:
    """K-means PQ codebooks under the ORACLE-EXACT determinism
    contract (the :func:`~..operators.clustering.kmeans_fit` technique
    composed over per-subspace codebooks):

    * training sample = the ``sample`` lowest-id vectors;
    * init = the first ``k_codes`` DISTINCT slice rows in id order;
    * assignment by squared L2 in strict left-to-right IEEE order
      (:func:`_d2_contract`), ROUNDED TO 9 dp, ties to the lower code;
    * recentered means rounded to 6 dp (HALF_UP, like both engines'
      ``round``) — sum-order error ~1e-14 ≪ 5e-7, so either engine's
      accumulation order yields the same literal;
    * empty codes keep their previous centroid.

    Every step is expressible as unrolled SQL CTEs, which is what
    turns the trained-PQ pipeline from rows-only checked
    (:func:`pq_train`, free-form numpy Lloyd) into value-hash checked
    (``ann_pq_trained_topk``). Returns ``codebooks[m][k][d_sub]``.
    """
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    X = [[float(x) for x in r[1]] for r in rows]
    if not X:
        raise ValueError(
            "pq_train_contract: empty training sample (input frame has "
            "no rows) — a codebook needs at least one vector"
        )
    dim = len(X[0])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    d_sub = dim // m_subspaces
    books = []
    for m in range(m_subspaces):
        S = [x[m * d_sub : (m + 1) * d_sub] for x in X]
        seen: set = set()
        C: list[list[float]] = []
        for row in S:
            t = tuple(row)
            if t not in seen:
                seen.add(t)
                C.append(list(row))
            if len(C) == k_codes:
                break
        if len(C) < k_codes:
            raise ValueError(
                f"subspace {m}: only {len(C)} distinct slices < k={k_codes}"
            )
        for _ in range(iters):
            sums = [[0.0] * d_sub for _ in range(k_codes)]
            counts = [0] * k_codes
            for s in S:
                best, best_d = 0, None
                for j, c in enumerate(C):
                    d = _round_half_up(_d2_contract(s, c), 9)
                    if best_d is None or d < best_d:
                        best, best_d = j, d
                counts[best] += 1
                for t in range(d_sub):
                    sums[best][t] += s[t]
            C = [
                [
                    _round_half_up(sums[j][t] / counts[j], 6)
                    for t in range(d_sub)
                ]
                if counts[j]
                else C[j]  # empty code keeps its previous centroid
                for j in range(k_codes)
            ]
        books.append(C)
    return books


def pq_encode_expr(
    df: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode under the trained-PQ contract with pure JVM expressions —
    per subspace, an array of ``k`` explicit left-associated squared-L2
    expressions rounded to 9 dp, argmin via
    ``array_position(arr, array_min(arr))`` (first match = lowest code
    on ties). No Python worker in the path; at scale this is also the
    faster encode (no Arrow hop). Output: ``(id_col, pq_codes)``,
    drop-in for :func:`pq_topk`-style ADC folds."""
    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])

    def _d2_expr(m: int, c: list) -> "F.Column":
        acc = None
        for j in range(d_sub):
            x = F.col(vec_col)[m * d_sub + j]
            t = (x - F.lit(c[j])) * (x - F.lit(c[j]))
            acc = t if acc is None else acc + t
        return F.round(acc, 9)

    codes = []
    for m in range(m_sub):
        arr = F.array(*[_d2_expr(m, c) for c in codebooks[m]])
        codes.append(
            (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        )
    return df.select(F.col(id_col), F.array(*codes).alias("pq_codes"))


def pq_adc_topk_contract(
    codes_df: DataFrame,
    codebooks: list,
    query_vec: list,
    *,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k under the trained-PQ contract: the LUT's sub-distances
    use the same left-to-right arithmetic + 9-dp rounding as encode,
    and the per-row fold rounds to 6 dp — so the SQL oracle's
    ``round(sum(d2), 6)`` agrees regardless of either engine's
    summation order. Output: ``(id_col, pq_dist)`` ascending."""
    m_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    lut = [
        [
            _round_half_up(
                _d2_contract(
                    query_vec[m * d_sub : (m + 1) * d_sub], c
                ),
                9,
            )
            for c in codebooks[m]
        ]
        for m in range(m_sub)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in lut]
    )
    dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("pq_codes"),
                F.sequence(F.lit(0), F.lit(m_sub - 1)),
                lambda code, m: F.element_at(
                    F.element_at(lut_lit, m.cast("int") + 1), code + 1
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    return (
        codes_df.select(F.col(id_col), dist.alias("pq_dist"))
        .orderBy(F.col("pq_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
