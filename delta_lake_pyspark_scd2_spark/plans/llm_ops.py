"""LLM-training-data-pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing, streaming-equivalent window aggregation.

These go beyond the reference's own surface (SURVEY.md §2.10 notes the
reference has no UDF/streaming operators) and are first-class here per
the north star. Every oracle reproduces the md5-based hashing exactly
(DuckDB ``('0x' || substr(md5(s),1,8))::BIGINT`` == Spark
``conv(substr(md5(s),1,8),16,10)``), so even MinHash+LSH is value-hash
checked, not just row-counted.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_pyspark_scd2_spark.operators import dedup, multimodal, similarity, text
from delta_lake_pyspark_scd2_spark.operators.dedup import HASH_MOD_32
from delta_lake_pyspark_scd2_spark.plans.registry import register
from delta_lake_pyspark_scd2_spark.sources.tables import load_table

# Shared SQL fragments -------------------------------------------------------

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

#: Distinct word-3-gram shingles per doc (matches operators.dedup.word_shingles).
_SHINGLES_CTE = f"""
    words AS (
      SELECT doc_id, {_NORM} AS nt, string_split({_NORM}, ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
      FROM words, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(i)
      WHERE len(w) >= 3
      UNION
      SELECT doc_id, nt AS shingle FROM words WHERE len(w) < 3
    )
"""

#: Jaccard>=0.8 connected components over the shared shingle CTE —
#: used verbatim by dedup_cluster_canonical, dedup_keep_best, and
#: split_cluster_safe so the three cannot drift.
_CC_CLUSTER_CTES = """
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM shared
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE shared / (sa.set_size + sb.set_size - shared) >= 0.8
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS cluster_id FROM reach GROUP BY node)
"""

_NUM_HASHES = 16
_BANDS = 4
_ROWS_PER_BAND = 4

_MIN_EXPRS = ",\n           ".join(
    f"MIN((h * {2 * i + 1} + {1000003 * (i + 1)}) % {HASH_MOD_32}) AS m{i}"
    for i in range(_NUM_HASHES)
)
_BAND_SELECTS = "\n      UNION ALL\n".join(
    "      SELECT doc_id, {b} AS band, md5(array_to_string([{cols}], ',')) AS bucket FROM mins".format(
        b=b,
        cols=", ".join(f"m{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND)),
    )
    for b in range(_BANDS)
)

_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

# Hyperplane-LSH oracle fragments: the same md5-derived planes the
# Spark operator uses, inlined as literals (repr round-trips doubles
# exactly, so both engines take the sign of the identical dot product).
_LSH_BANDS, _LSH_BITS = 8, 8
_LSH_PLANES = dedup._hyperplanes(_LSH_BANDS * _LSH_BITS, 64)
_LSH_BIT_EXPRS = ",\n             ".join(
    "CASE WHEN list_dot_product(embedding::DOUBLE[], ["
    + ", ".join(repr(x) for x in p)
    + "]) >= 0 THEN 1 ELSE 0 END"
    for p in _LSH_PLANES
)
_LSH_BUCKET = " + ".join(
    f"bits[bb.b * {_LSH_BITS} + {r + 1}] * {1 << r}" for r in range(_LSH_BITS)
)


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_NORM}) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: hash-groupBy on normalized-text fingerprint; one "
    "shuffle with map-side partial agg.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


@register(
    "dedup_lines_corpus",
    oracle=f"""
    WITH wl AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS lst FROM documents
    ),
    wpos AS (
      SELECT doc_id, lst[t.i] AS w, t.i - 1 AS pos
      FROM wl, UNNEST(range(1, len(lst) + 1)) AS t(i)
      WHERE lst[t.i] <> ''
    ),
    ch AS (
      SELECT doc_id, CAST(pos // 16 AS INT) AS chunk_no,
             string_agg(w, ' ' ORDER BY pos) AS chunk
      FROM wpos GROUP BY 1, 2
    ),
    rk AS (
      SELECT doc_id, chunk_no, chunk,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, chunk_no) AS rn
      FROM ch
    ),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM ch GROUP BY 1
    ),
    ka AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(chunk, ' ' ORDER BY chunk_no) AS text_deduped
      FROM rk WHERE rn = 1 GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(t.n_chunks, 0) AS n_chunks,
           coalesce(k.n_kept, 0) AS n_kept,
           coalesce(k.text_deduped, '') AS text_deduped
    FROM documents d
    LEFT JOIN tot t USING (doc_id) LEFT JOIN ka k USING (doc_id)
    """,
    doc="Corpus-level duplicate-SEGMENT removal (CCNet, Wenzek et al. "
    "2020; Gopher, Rae et al. 2021): a segment appearing anywhere else "
    "in the corpus survives only at its first (doc_id, chunk_no) "
    "occurrence, and documents are reassembled from their surviving "
    "segments — the boilerplate cut that document-level dedup cannot "
    "see. Segments = non-overlapping 16-word windows (this corpus is "
    "newline-free; real corpora swap in split-on-newline and the rest "
    "is unchanged). One ordered explode, one shuffle on the segment "
    "md5 with a PARTITIONED row_number, one doc-keyed order-stable "
    "reassembly; full value-hash oracle including the reassembled "
    "text.",
)
def dedup_lines_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.line_dedup_corpus(docs, words_per_chunk=16)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(shared / (sa.set_size + sb.set_size - shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE shared / (sa.set_size + sb.set_size - shared) >= 0.8
    """,
    doc="N-gram Jaccard near-dup pairs: shingle-blocked self-join (only "
    "docs sharing a shingle meet); shuffle key = shingle. Θ(Σ df²) "
    "candidates — the correctness baseline; the benched scale path is "
    "dedup_ngram_jaccard_prefix.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.8)


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    joined AS (
      SELECT id_a, id_b, shared, sa.set_size AS size_a, sb.set_size AS size_b
      FROM shared
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
    ),
    dirs AS (
      SELECT id_a AS contained_id, id_b AS container_id,
             round(shared / size_a, 6) AS containment
      FROM joined
      UNION ALL
      SELECT id_b AS contained_id, id_a AS container_id,
             round(shared / size_b, 6) AS containment
      FROM joined
    )
    SELECT contained_id, container_id, containment
    FROM dirs WHERE containment >= 0.8
    """,
    doc="Asymmetric shingle containment (Broder 1997): |A intersect "
    "B| / |A| -- the excerpt/quote detector. A short doc fully inside "
    "a longer one scores 1.0 here but low on Jaccard (union dominated "
    "by the container), so symmetric screens never flag it. One "
    "shared-shingle join scores both directions; asymmetry lives in "
    "the denominator. Scale path: block on rare shingles like the "
    "prefix emitter, identical scoring.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.shingle_containment_pairs(docs, threshold=0.8)


@register(
    "dedup_containment_prefix",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    joined AS (
      SELECT id_a, id_b, shared, sa.set_size AS size_a, sb.set_size AS size_b
      FROM shared
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
    ),
    dirs AS (
      SELECT id_a AS contained_id, id_b AS container_id,
             round(shared / size_a, 6) AS containment
      FROM joined
      UNION ALL
      SELECT id_b AS contained_id, id_a AS container_id,
             round(shared / size_b, 6) AS containment
      FROM joined
    )
    SELECT contained_id, container_id, containment
    FROM dirs WHERE containment >= 0.8
    """,
    doc="Containment with asymmetric prefix filtering -- the excerpt "
    "screen's 100 TB path. Only the CONTAINED side explodes its "
    "|A|-ceil(t*|A|)+1 rarest shingles (containment bounds A's "
    "overlap, never B's, so the container joins its full set); "
    "candidates verify exactly on full sets. The oracle is the "
    "UNBLOCKED form: identical output proves the filter lossless.",
)
def dedup_containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.shingle_containment_pairs_prefix(docs, threshold=0.8)


@register(
    "dedup_ngram_jaccard_prefix",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(shared / (sa.set_size + sb.set_size - shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE shared / (sa.set_size + sb.set_size - shared) >= 0.8
    """,
    doc="Same exact Jaccard output via SSJoin/PPJoin prefix filtering "
    "(join only each doc's (1-t)|A|+1 rarest shingles, verify candidates "
    "with array_intersect) — the candidate-bounded 100 TB path; oracle "
    "is the full ground truth, proving the filter loses nothing.",
    bench=True,
)
def dedup_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs_prefix(docs, threshold=0.8)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
    ),
    mins AS (
      SELECT doc_id,
           {_MIN_EXPRS}
      FROM hashed GROUP BY doc_id
    ),
    banded AS (
{_BAND_SELECTS}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
    """,
    doc="MinHash+LSH candidate pairs (16 hashes, 4 bands × 4 rows): "
    "banded bucketing avoids the O(n²) pairwise scan; md5-derived "
    "permutations make it engine-reproducible.",
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        docs, num_hashes=_NUM_HASHES, shingle_n=3
    )
    return dedup.lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS_PER_BAND
    )


@register(
    "dedup_simhash",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(list_distinct(string_split({_NORM}, ' '))) AS w
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM words
    ),
    bits AS (
      SELECT doc_id, bb.b AS bit,
             SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hashed, (SELECT UNNEST(range(0, 60)) AS b) bb
      GROUP BY doc_id, bb.b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
    doc="SimHash fingerprint per doc: bit-majority over 60-bit "
    "md5-derived word hashes, one higher-order-function pass, no "
    "shuffle. Value-hash checked bit-for-bit against a per-bit "
    "unnest+majority SQL formulation.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", dedup.simhash(F.col("text")).alias("simhash"))


@register(
    "dq_contract_violations",
    oracle="""
    SELECT doc_id, 'lang' AS field, 'domain' AS rule FROM documents
    WHERE lang IS NOT NULL AND lang NOT IN ('en', 'de', 'fr')
    UNION ALL
    SELECT doc_id, 'text' AS field, 'max_length_400' AS rule FROM documents
    WHERE length(text) > 400
    """,
    doc="Declarative data-contract checker (promoted from the "
    "reference's test-only metadata dicts, test/header_etl_test.py:35-47): "
    "per-field rules evaluated in ONE pass (flag array + explode), not "
    "one scan per rule.",
)
def dq_contract_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.validation import (
        FieldContract,
        TableContract,
        contract_violations,
    )

    docs = load_table(spark, sf_dir, "documents")
    contract = TableContract(
        fields=(
            FieldContract("doc_id", nullable=False, key=True),
            FieldContract("lang", allowed=("en", "de", "fr")),
            FieldContract("text", max_length=400),
        )
    )
    return contract_violations(docs, contract).select("doc_id", "field", "rule")


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS.format(a='a.ve', b='b.ve')} AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_COS.format(a='a.ve', b='b.ve')} >= 0.35
    """,
    doc="Embedding-cosine near-duplicate pairs, exact brute force — the "
    "correctness baseline for the LSH-blocked variant.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_cosine_pairs(emb, threshold=0.35)


@register(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, [
             {_LSH_BIT_EXPRS}
      ] AS bits
      FROM embeddings
    ),
    banded AS (
      SELECT vec_id, bb.b AS band, {_LSH_BUCKET} AS bucket
      FROM sig, (SELECT UNNEST(range(0, {_LSH_BANDS})) AS b) bb
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           {_COS.format(a="ea.embedding::DOUBLE[]", b="eb.embedding::DOUBLE[]")}
             AS cos_sim
    FROM cands
    JOIN embeddings ea ON ea.vec_id = id_a
    JOIN embeddings eb ON eb.vec_id = id_b
    WHERE {_COS.format(a="ea.embedding::DOUBLE[]", b="eb.embedding::DOUBLE[]")} >= 0.9
    """,
    doc="Embedding near-dup pairs via random-hyperplane LSH blocking + "
    "exact cosine verification — the 100 TB path (scores bucket-mates "
    "only, never n²). Configured for the realistic near-dup regime "
    "(cosine ≥ 0.9, 8×8 banding → recall ≈ 0.94): this corpus has no "
    "such pairs, so the correct output is empty; semantics are pinned "
    "by tests/test_llm_operators.py on constructed near-dup clusters.",
    bench=True,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_lsh_pairs(
        emb, threshold=0.9, bands=8, bits_per_band=8
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT query_id, vec_id, {_COS.format(a='qv', b='cv')} AS cos_sim
      FROM c, q WHERE vec_id <> query_id
    )
    SELECT query_id, vec_id AS neighbor_id, rank, cos_sim FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc="Exact brute-force cosine top-k (queries broadcast, corpus "
    "partition-parallel; only q×k rows shuffle).",
    bench=True,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(emb, queries, k=10)


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, ve AS cv FROM v WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_COS.format(a='ve', b='cv')} DESC,
                                           c.centroid_id ASC) AS rn
        FROM v, cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT a.vec_id AS query_id, a.centroid_id, v.ve AS qv
      FROM assigned a JOIN v ON v.vec_id = a.vec_id
      WHERE a.vec_id >= 490
    ),
    scored AS (
      SELECT p.query_id, a.vec_id, {_COS.format(a='p.qv', b='v2.ve')} AS cos_sim
      FROM probes p
      JOIN assigned a ON a.centroid_id = p.centroid_id
      JOIN v v2 ON v2.vec_id = a.vec_id
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, rank, cos_sim FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    doc="IVF single-probe ANN: search only the query's centroid bucket; "
    "at scale the assignment is stored bucketed-by-centroid so probes "
    "are partition-pruned scans.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") >= 490)
    return similarity.ivf_topk(emb, centroids, queries, k=5)


@register(
    "ann_ivf_multiprobe_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, ve AS cv FROM v WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_COS.format(a='ve', b='cv')} DESC,
                                           c.centroid_id ASC) AS rn
        FROM v, cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, centroid_id, qv FROM (
        SELECT q.query_id, c.centroid_id, q.qv,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_COS.format(a='q.qv', b='c.cv')} DESC,
                                           c.centroid_id ASC) AS prn
        FROM (SELECT vec_id AS query_id, ve AS qv FROM v
              WHERE vec_id >= 490) q, cents c
      ) WHERE prn <= 4
    ),
    scored AS (
      SELECT p.query_id, a.vec_id, {_COS.format(a='p.qv', b='v2.ve')} AS cos_sim
      FROM probes p
      JOIN assigned a ON a.centroid_id = p.centroid_id
      JOIN v v2 ON v2.vec_id = a.vec_id
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, rank, cos_sim FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    doc="IVF multi-probe ANN (nprobe=4): search the query's 4 nearest "
    "centroid buckets -- the configuration ann_recall_eval's sweep "
    "certifies as adoptable (recall@5 >= 0.7, vs ~0.26 single-probe), "
    "at 4/|centroids| of the brute-force cost. At scale the probes "
    "are partition-pruned scans of the bucketed assignment table.",
)
def ann_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") >= 490)
    return similarity.ivf_topk(emb, centroids, queries, k=5, nprobe=4)


@register(
    "embed_label_stats",
    oracle="""
    SELECT label, COUNT(*) AS n,
           CAST(ROUND(CAST(SUM(CAST(round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_norm
    FROM embeddings GROUP BY label
    """,
    doc="Aggregate over array column: per-label vector-norm stats "
    "(F.aggregate higher-order function; order-exact decimal sum).",
)
def embed_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norm6 = F.round(similarity.norm(F.col("embedding")), 6).cast(
        T.DecimalType(18, 6)
    )
    return (
        emb.withColumn("__norm", norm6)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("__norm").cast("double") / F.count(F.lit(1)), 4)
            .cast("double")
            .alias("avg_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_fingerprint",
    oracle=f"SELECT doc_id, md5({_NORM}) AS fp FROM documents",
    doc="Document fingerprinting: md5 over normalized text.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp"))


@register(
    "text_token_stats",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
           CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = '' THEN 0
                ELSE len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) END AS n_word_tokens
    FROM documents
    """,
    doc="Token counting: whitespace tokens + alnum word pieces (BPE-ish "
    "deterministic proxy).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    wordish = F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))
    return docs.select(
        "doc_id",
        text.token_count_ws(c).alias("n_ws_tokens"),
        F.when(wordish == "", F.lit(0))
        .otherwise(F.size(F.split(wordish, " ")))
        .alias("n_word_tokens"),
    )


@register(
    "text_group_share",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(list_filter(string_split(text, ' '), x -> x <> '')) END
             AS token_n,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(list_filter(string_split(text, ' '), x -> x <> '')) END
             AS DOUBLE)
             / SUM(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(list_filter(string_split(text, ' '), x -> x <> '')) END)
               OVER (PARTITION BY lang) AS token_share
    FROM documents
    """,
    doc="Grouped applyInPandas (grouped-map Pandas surface): per-language "
    "token share. Exact int64 counts + one int/int IEEE division, so the "
    "Arrow path value-hashes against the SQL window formulation.",
)
def text_group_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.group_token_share(docs)


@register(
    "text_quality",
    oracle=r"""
    SELECT doc_id,
           length(text) AS n_chars_calc,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                 / greatest(length(text), 1), 4) AS alpha_ratio,
           round(len(regexp_extract_all(text, '(?i)\b(the|and|of|with|a|to|in|is)\b'))
                 / greatest(len(string_split_regex(trim(text), '\s+')), 1), 4) AS stopword_ratio
    FROM documents
    """,
    doc="Quality scoring: cheap pretraining filters (length, alpha "
    "ratio, stopword ratio) — all JVM expressions.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    toks = text.token_count_ws(c)
    stop_re = r"(?i)\b(the|and|of|with|a|to|in|is)\b"
    n_stop = F.size(F.regexp_extract_all(c, F.lit(stop_re)))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        toks.alias("n_tokens"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 4).alias("alpha_ratio"),
        F.round(n_stop / F.greatest(toks, F.lit(1)), 4).alias("stopword_ratio"),
    )


@register(
    "text_repetition",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) >= 2 THEN
               [array_to_string(ws[i:i+1], ' ') FOR i IN range(1, len(ws))]
             ELSE [] END AS g2,
             CASE WHEN len(ws) >= 3 THEN
               [array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws) - 1)]
             ELSE [] END AS g3
      FROM w
    )
    SELECT doc_id,
           len(ws) AS n_words,
           COALESCE(round((len(ws) - len(list_distinct(ws))) / nullif(len(ws), 0), 6), 0.0)
             AS dup_word_frac,
           COALESCE(round(
             list_max(list_transform(list_distinct(g2),
                                     d -> len(list_filter(g2, x -> x = d))))
             / nullif(len(g2), 0), 6), 0.0) AS top_bigram_share,
           COALESCE(round(
             list_sum(list_transform(list_distinct(g3),
               d -> CASE WHEN len(list_filter(g3, x -> x = d)) > 1
                         THEN len(list_filter(g3, x -> x = d)) * length(d)
                         ELSE 0 END))
             / nullif(list_sum(list_transform(g3, x -> length(x))), 0), 6), 0.0)
             AS dup_3gram_char_frac
    FROM g
    """,
    doc="Gopher repetition filters (dup-word fraction, top-bigram "
    "share, duplicate-trigram char fraction): pure higher-order "
    "expressions over the per-row token array — codegen'd map work, "
    "zero shuffles.",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_features(docs)


@register(
    "vocab_topk",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
    )
    SELECT word, COUNT(*) AS n
    FROM words WHERE word <> ''
    GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
    doc="Corpus vocabulary heavy hitters: explode words -> count -> "
    "top-k with a total-order tiebreak. One shuffle with map-side "
    "partial aggregation; the top-k is a TakeOrdered over |vocab| "
    "rows, not |corpus|.",
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(text.normalize_text(F.col("text")), " ")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


_MIX_WEIGHTS = {"src1": 3.0, "src2": 1.0, "src3": 1.0}


@register(
    "mixture_resample",
    oracle="""
    WITH w(source, share) AS (VALUES ('src1', 0.6), ('src2', 0.2), ('src3', 0.2)),
    counts AS (
      SELECT d.source, share, COUNT(*) AS n
      FROM documents d JOIN w USING (source) GROUP BY 1, 2
    ),
    cap AS (SELECT MIN(n / share) AS cap FROM counts),
    thr AS (
      SELECT source, share * cap / n * 1000000 AS keep_thr
      FROM counts CROSS JOIN cap
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN thr USING (source)
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
          < keep_thr
    """,
    doc="Domain-mixture resampling (60/20/20 over src1/src2/src3): "
    "per-domain counts -> broadcast keep-thresholds -> deterministic "
    "md5 keep-hash filter. Reproducible on any cluster shape; no "
    "ORDER BY rand().",
)
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import mixture

    docs = load_table(spark, sf_dir, "documents")
    return mixture.sample_to_mixture(docs, _MIX_WEIGHTS).select(
        "doc_id", "source"
    )


@register(
    "mixture_temperature",
    oracle="""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1
    ),
    shares AS (
      SELECT lang, n,
             pow(n, 0.7) / (SELECT sum(pow(n, 0.7)) FROM counts) AS share
      FROM counts
    ),
    cap AS (SELECT MIN(n / share) AS cap FROM shares),
    thr AS (
      SELECT lang, share * cap / n * 1000000 AS keep_thr
      FROM shares CROSS JOIN cap
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thr USING (lang)
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
          < keep_thr
    """,
    doc="Temperature-based language mixture (alpha=0.7 over the skewed "
    "lang column): target share of language g is n_g^alpha / "
    "sum(n^alpha) — the standard rare-language up-weighting of "
    "multilingual pretraining recipes; downsample-only at the largest "
    "size every language supports (the dominant language is cut, rare "
    "ones kept whole). One map-side-combined count per language, "
    "thresholds broadcast back, deterministic md5 keep-hash — no "
    "ORDER BY rand(), no collect.",
)
def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import mixture

    docs = load_table(spark, sf_dir, "documents")
    return mixture.sample_to_temperature(
        docs, alpha=0.7, group_col="lang"
    ).select("doc_id", "lang")


@register(
    "sample_cluster_balanced",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    cents AS (
      SELECT vec_id AS centroid_id, ve AS cv FROM v
      WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 12
    ),
    assigned AS (
      SELECT vec_id, centroid_id, sim FROM (
        SELECT v.vec_id, c.centroid_id,
               {_COS.format(a='v.ve', b='c.cv')} AS sim,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY {_COS.format(a='v.ve', b='c.cv')} DESC,
                          c.centroid_id ASC) AS rn
        FROM v, cents c
      ) WHERE rn = 1
    )
    SELECT vec_id, centroid_id, rank, sim FROM (
      SELECT vec_id, centroid_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY centroid_id
               ORDER BY sim DESC, vec_id ASC) AS INT) AS rank
      FROM assigned
    ) WHERE rank <= 15
    """,
    doc="Diversity-capped sampling in embedding space (SemDeDup / "
    "cluster-balance curation, Abbas et al. 2023): nearest-centroid "
    "assignment (12 broadcast centroids), then each cluster keeps its "
    "15 MOST CENTRAL members — no embedding-space region dominates "
    "the kept set. Vectors leave the plan after scoring; both window "
    "shuffles carry (id, centroid, sim) triples and the cap is a "
    "WindowGroupLimit top-k, not a full sort.",
)
def sample_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % 37 == 0).orderBy("vec_id").limit(12)
    return S.cluster_balanced_sample(emb, cents, per_cluster=15)


@register(
    "mm_phash_pairs",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, ('0x' || substr(md5({_NORM}), 1, 15))::BIGINT AS ph
      FROM documents
    ),
    banded AS (
      SELECT doc_id, ph, b.band, (ph >> (b.band * 15)) & 32767 AS bucket
      FROM h, (VALUES (0), (1), (2), (3)) b(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(bit_count(xor(a.ph, c.ph)) AS INT) AS hamming
    FROM banded a
    JOIN banded c ON a.band = c.band AND a.bucket = c.bucket
                 AND a.doc_id < c.doc_id
    WHERE bit_count(xor(a.ph, c.ph)) <= 6
    """,
    doc="Near-duplicate media pairs by banded pHash hamming (4x15-bit "
    "bands block, bit_count(xor) verifies — all JVM bit arithmetic, "
    "one band-keyed shuffle). The hash is md5-derived while decoding "
    "is stubbed, so exact-dup media detection is real and the banded "
    "plan is exactly what a DCT pHash rides at 100 TB.",
)
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # media ingestion canonicalizes bytes before hashing (here: the
    # normalized text as the deterministic payload stand-in), so the
    # exact-dup pairs the corpus genuinely contains surface at every SF
    canon = docs.withColumn("text", text.normalize_text(F.col("text")))
    payloads = multimodal.attach_binary_payload(canon)
    return multimodal.media_phash_pairs(payloads)


@register(
    "pack_sequences",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_toks,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 32
                  AS INT) AS pack_group
      FROM documents
    ),
    pref AS (
      SELECT doc_id, n_toks, pack_group,
             SUM(n_toks) OVER (PARTITION BY pack_group ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_toks AS s
      FROM base
    )
    SELECT doc_id, n_toks, pack_group,
           CAST(s // 512 AS INT) AS bin_ix,
           CAST(s % 512 AS INT) AS start_offset
    FROM pref
    """,
    doc="Deterministic sequence packing for trainer prep: docs hash-"
    "salted into 32 independent streams, first-fit packed in id order "
    "via one windowed prefix sum (bin = floor(prefix/512)); overflow "
    "carried, never split. One shuffle; parallelism = stream count; "
    "same doc -> same bin on any cluster shape.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.pack_sequences(docs, seq_len=512, n_groups=32)


def _hll_rho_sql(hx: str) -> str:
    """SQL mirror of operators/sketches.hll_register's rho: leading
    zeros of the 2nd 8-hex-char block, counted on the STRING (4 per
    leading '0' + 0-3 from the first non-zero digit) — never float
    log2."""
    t = f"regexp_replace(substr({hx}, 9, 8), '^0+', '')"
    return (
        f"CAST(CASE WHEN {t} = '' THEN 33 ELSE (8 - length({t})) * 4 + "
        f"(CASE substr({t}, 1, 1) WHEN '1' THEN 3 WHEN '2' THEN 2 "
        "WHEN '3' THEN 2 WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 "
        "WHEN '7' THEN 1 ELSE 0 END) + 1 END AS INT)"
    )


def _approx_sketches_oracle() -> str:
    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        HLL_ALPHA_MM,
        HLL_M,
    )

    e_raw = f"{HLL_ALPHA_MM!r} / (z_occ + ({HLL_M} - nb))"
    return f"""
    WITH words AS (
      SELECT source, unnest(string_split({_NORM}, ' ')) AS word
      FROM documents
    ),
    wf AS (SELECT source, word FROM words WHERE word <> ''),
    reg AS (
      SELECT source,
             CAST(('0x' || substr(md5(word), 1, 8))::BIGINT % {HLL_M} AS INT)
               AS bucket,
             {_hll_rho_sql('md5(word)')} AS rho
      FROM wf
    ),
    mx AS (SELECT source, bucket, max(rho) AS max_rho FROM reg GROUP BY 1, 2),
    est AS (
      SELECT source, sum(pow(2.0, -max_rho)) AS z_occ, count(*) AS nb
      FROM mx GROUP BY 1
    ),
    vocab AS (
      SELECT source,
             round(CASE WHEN {e_raw} <= {2.5 * HLL_M!r}
                         AND ({HLL_M} - nb) > 0
                   THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - nb))
                   ELSE {e_raw} END, 4) AS approx_vocab
      FROM est
    ),
    toks AS (
      SELECT source, len(string_split({_NORM}, ' ')) AS n_toks
      FROM documents
    ),
    tc AS (SELECT source, n_toks, count(*) AS c FROM toks GROUP BY 1, 2),
    cum AS (
      SELECT source, n_toks,
             sum(c) OVER (PARTITION BY source ORDER BY n_toks) AS cm,
             sum(c) OVER (PARTITION BY source) AS n
      FROM tc
    ),
    q AS (
      SELECT source,
             min(CASE WHEN cm >= ceil(5e-1 * n) THEN n_toks END) AS p50_toks,
             min(CASE WHEN cm >= ceil(9e-1 * n) THEN n_toks END) AS p90_toks,
             min(CASE WHEN cm >= ceil(9.9e-1 * n) THEN n_toks END) AS p99_toks
      FROM cum GROUP BY 1
    )
    SELECT v.source, v.approx_vocab,
           CAST(q.p50_toks AS BIGINT) AS p50_toks,
           CAST(q.p90_toks AS BIGINT) AS p90_toks,
           CAST(q.p99_toks AS BIGINT) AS p99_toks
    FROM vocab v JOIN q USING (source)
    """


@register(
    "approx_sketches",
    oracle=_approx_sketches_oracle(),
    doc="Approximate sketches over the corpus, ENGINE-PORTABLE (round-8 "
    "directive #8 — the md5 oracle attempt landed): distinct words per "
    "source via the md5-register HyperLogLog (operators/sketches."
    "hll_build/hll_estimate — m=256 mergeable registers, one map-side-"
    "combinable agg; the harmonic sum's power-of-two terms span an "
    "exponent range < 53 bits, so it is EXACT and order-independent, "
    "which is why this value-hashes where Spark's built-in HLL++ "
    "cannot), plus per-source token-count quantiles by the exact "
    "domain-compressed rank rule (groupBy distinct counts + cumulative "
    "window — bounded by the token-count domain, not corpus size). "
    "Spark's built-in HLL++/KLL sketches remain demonstrated and "
    "error-bound-pinned in tests/test_approx_sketches.py "
    "(approx_sketches_builtin below).",
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.explode(F.split(text.normalize_text(F.col("text")), " ")).alias("word"),
    ).filter(F.col("word") != "")
    vocab = hll_estimate(
        hll_build(words, F.col("word"), ["source"]), ["source"]
    ).withColumnRenamed("approx_distinct", "approx_vocab")
    # per-DOC token counts (aggregating after explode would weight each
    # document by its own length); quantiles by the exact rank rule
    # over the domain-compressed count table
    toks = docs.select(
        "source",
        F.size(F.split(text.normalize_text(F.col("text")), " ")).alias(
            "n_toks"
        ),
    )
    tc = toks.groupBy("source", "n_toks").agg(F.count(F.lit(1)).alias("__c"))
    w_cum = Window.partitionBy("source").orderBy("n_toks").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy("source")
    cum = tc.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__n", F.sum("__c").over(w_tot)
    )

    def _q(q: float, alias: str):
        return F.min(
            F.when(
                F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")),
                F.col("n_toks"),
            )
        ).cast("long").alias(alias)

    quants = cum.groupBy("source").agg(
        _q(0.5, "p50_toks"), _q(0.9, "p90_toks"), _q(0.99, "p99_toks")
    )
    return vocab.join(quants, "source")


def approx_sketches_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN sketches (HLL++ approx_count_distinct, KLL-style
    percentile_approx) over the same corpus — the right tool when
    cross-engine reproducibility doesn't matter (their register layouts
    are implementation-defined, so they can never value-hash against
    DuckDB). Not registered; error bounds vs exact answers pinned in
    tests/test_approx_sketches.py."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        F.explode(F.split(text.normalize_text(F.col("text")), " ")).alias("word"),
    )
    vocab = words.groupBy("source").agg(
        F.approx_count_distinct("word", rsd=0.02).alias("approx_vocab")
    )
    quants = (
        docs.select(
            "source",
            F.size(F.split(text.normalize_text(F.col("text")), " ")).alias(
                "n_toks"
            ),
        )
        .groupBy("source")
        .agg(
            F.percentile_approx("n_toks", [0.5, 0.9, 0.99], 10_000).alias("q")
        )
    )
    return vocab.join(quants, "source").select(
        "source",
        "approx_vocab",
        F.col("q")[0].alias("p50_toks"),
        F.col("q")[1].alias("p90_toks"),
        F.col("q")[2].alias("p99_toks"),
    )


def _stream_twin_feed(spark: SparkSession, sf_dir: str, name: str):
    """Shared harness for the streaming-maintainer batch-twin rows:
    the documents corpus split into 3 disjoint JSON micro-batches by
    ``doc_id % 3``, landed one at a time under a scratch source dir.
    Returns ``(root, feed)`` where ``feed(run)`` writes batch *i* and
    then invokes ``run(src)`` — one AvailableNow pass per landing, so
    the maintainer genuinely folds three separate micro-batches
    through its checkpointed file source and ``(app_id, batch_no)``
    writer transactions, exactly as a live crawl would."""
    import os

    from delta_lake_pyspark_scd2_spark.plans.scratch import scratch_path

    root = scratch_path(name)
    src = f"{root}/src"
    os.makedirs(src)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def feed(run) -> None:
        for i in range(3):
            docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
                "append"
            ).json(src)
            run(src)

    return root, feed


def _hll_stream_twin_oracle() -> str:
    from delta_lake_pyspark_scd2_spark.operators.sketches import HLL_M

    return f"""
    WITH words AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
    ),
    wf AS (SELECT word FROM words WHERE word <> ''),
    reg AS (
      SELECT CAST(('0x' || substr(md5(word), 1, 8))::BIGINT % {HLL_M} AS INT)
               AS bucket,
             {_hll_rho_sql('md5(word)')} AS rho
      FROM wf
    )
    SELECT bucket, CAST(max(rho) AS INT) AS max_rho FROM reg GROUP BY 1
    """


@register(
    "hll_stream_twin",
    oracle=_hll_stream_twin_oracle(),
    doc="Batch-twin proof for the streaming HLL maintainer "
    "(streaming/stream_jobs.hll_stream): the corpus lands as 3 "
    "disjoint JSON micro-batches, each folded into the persisted "
    "md5-register sketch by a real AvailableNow file-source stream "
    "(checkpointed discovery + writer txns), and the FINAL registers "
    "must be bit-identical to DuckDB's one-shot rebuild over the "
    "union — the HLL mergeability property proven end to end through "
    "the streaming path, not just in pytest. Register-wise MAX is "
    "order- and batching-independent, which is what makes the stream "
    "fold value-hashable at all.",
)
def hll_stream_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )
    from delta_lake_pyspark_scd2_spark.streaming import hll_stream

    root, feed = _stream_twin_feed(spark, sf_dir, "hll_stream_twin")
    feed(lambda src: hll_stream(spark, src, f"{root}/sketch", f"{root}/ckpt"))
    return (
        VersionedParquetTable(spark, f"{root}/sketch")
        .read()
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("max_rho").cast("int").alias("max_rho"),
        )
    )


def _cms_stream_twin_oracle() -> str:
    from delta_lake_pyspark_scd2_spark.operators.sketches import DEPTH, WIDTH

    return f"""
    WITH words AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
    ),
    wf AS (SELECT word FROM words WHERE word <> ''),
    wc AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM wf GROUP BY 1),
    cells AS (
      SELECT t.d,
             ('0x' || substr(md5(CAST(t.d AS VARCHAR) || ':' || word), 1, 8))
               ::BIGINT % {WIDTH} AS bucket,
             c
      FROM wc CROSS JOIN range({DEPTH}) t(d)
    )
    SELECT CAST(d AS INT) AS d, CAST(bucket AS BIGINT) AS bucket,
           CAST(sum(c) AS BIGINT) AS cnt
    FROM cells GROUP BY 1, 2
    """


@register(
    "cms_stream_twin",
    oracle=_cms_stream_twin_oracle(),
    doc="Batch-twin proof for the streaming count-min maintainer "
    "(streaming/stream_jobs.count_min_stream): 3 JSON micro-batches "
    "fold token counts into the persisted depth×width counter grid "
    "through the real AvailableNow stream, and the FINAL cells must "
    "equal DuckDB's one-shot sketch of the whole corpus. Counter "
    "ADDITION is order-independent but NOT idempotent — this row "
    "therefore also exercises the (app_id, batch_no) writer-txn "
    "exactly-once path for real: a double-applied replay would break "
    "the value hash.",
)
def cms_stream_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )
    from delta_lake_pyspark_scd2_spark.streaming import count_min_stream

    root, feed = _stream_twin_feed(spark, sf_dir, "cms_stream_twin")
    feed(
        lambda src: count_min_stream(
            spark, src, f"{root}/sketch", f"{root}/ckpt"
        )
    )
    return (
        VersionedParquetTable(spark, f"{root}/sketch")
        .read()
        .select(
            F.col("d").cast("int").alias("d"),
            F.col("bucket").cast("long").alias("bucket"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def _lang_oracle() -> str:
    score_exprs = []
    for lang, markers in text.LANG_MARKERS.items():
        if lang == "zh":
            pat = "(" + "|".join(markers) + ")"
        else:
            pat = r"\b(" + "|".join(markers) + r")\b"
        score_exprs.append(
            f"len(regexp_extract_all(lower(text), '{pat}')) AS score_{lang}"
        )
    langs = list(text.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {best} AND {best} > 0 THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return f"""
    WITH scored AS (
      SELECT doc_id, lang, {', '.join(score_exprs)} FROM documents
    )
    SELECT doc_id, lang, {case} AS lang_pred FROM scored
    """


@register(
    "text_lang_confusion",
    oracle=f"""
    WITH preds AS ({_lang_oracle()}),
    conf AS (
      SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
      FROM preds GROUP BY 1, 2
    )
    SELECT lang, lang_pred, n,
           round(n / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6)
             AS share_of_lang
    FROM conf
    """,
    doc="Classifier-quality evaluation as a query: the language-ID "
    "heuristic's confusion matrix against the table's lang labels, "
    "with each cell's share of its actual language -- the report that "
    "decides whether the cheap n-gram ID is good enough per language "
    "before it gates a corpus. Two aggregations over prediction-sized "
    "data; the label table never fans out.",
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    conf = (
        text.language_id(docs)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("lang")
    return conf.select(
        "lang",
        "lang_pred",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(w).cast("double"), 6
        ).alias("share_of_lang"),
    )


@register(
    "text_lang_id",
    oracle=_lang_oracle(),
    doc="Heuristic language ID: per-language stopword-marker counts, "
    "argmax with deterministic tie order.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.language_id(docs).select("doc_id", "lang", "lang_pred")


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5
    FROM documents
    """,
    doc="Binary-column metadata: payload size + content hash over an "
    "opaque binary column (multimodal plumbing, JVM-side).",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = multimodal.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


#: Deterministic PPM corpus CTEs shared by the real-decode oracles:
#: hash -> dims -> per-pixel value, mirroring multimodal._ppm_params /
#: generate_ppm (the rule the payload BYTES are generated from — the
#: Spark side parses the bytes; the oracle recomputes the pixels).
_PPM_DIMS_CTE = """
    h1 AS (
      SELECT doc_id,
             ('0x' || substr(md5('ppm:' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::BIGINT AS h
      FROM documents
    ),
    dims AS (
      SELECT doc_id, h,
             CAST(4 * (2 + h % 3) AS INT) AS width,
             CAST(4 * (2 + (h // 3) % 3) AS INT) AS height
      FROM h1
    )
"""
_PPM_PX = "(dm.doc_id * 7 + x.x * 13 + y.y * 31 + c.c * 97 + dm.h) % 256"
_PPM_SPINE = """
    FROM dims dm,
         UNNEST(range(0, dm.width)) AS x(x),
         UNNEST(range(0, dm.height)) AS y(y),
         (SELECT UNNEST(range(0, 3)) AS c) c
"""


@register(
    "mm_extract_features",
    oracle=f"""
    WITH {_PPM_DIMS_CTE}
    SELECT dm.doc_id, dm.width, dm.height, CAST(c.c AS INT) AS channel,
           round(sum({_PPM_PX}) / (dm.width * dm.height), 6) AS mean_value
    {_PPM_SPINE}
    GROUP BY 1, 2, 3, 4
    """,
    doc="Feature extraction with a REAL decode: deterministic VALID "
    "P6 PPM payloads (codec-free format — text header + raw RGB "
    "bytes) are parsed by a pure-numpy netpbm decoder inside the "
    "Arrow-batched mapInPandas path, emitting parsed dimensions and "
    "per-channel pixel means. The oracle recomputes the expected "
    "pixels from the generation rule (never touching binary in SQL), "
    "so a hash match proves the byte-level decode is exactly right — "
    "the codec guards for JPEG/video remain fail-loud stubs.",
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_ppm_payload(docs)
    return multimodal.ppm_channel_stats(payloads)


# ---------------------------------------------------------------------------
# Streaming-equivalent windowed aggregation
# ---------------------------------------------------------------------------


@register(
    "mm_resize",
    oracle=f"""
    WITH {_PPM_DIMS_CTE}
    SELECT doc_id, oy, ox, channel,
           CAST(sum(v) // min(bsz) AS INT) AS value
    FROM (
      SELECT dm.doc_id,
             CAST(y.y // (dm.height // 4) AS INT) AS oy,
             CAST(x.x // (dm.width // 4) AS INT) AS ox,
             CAST(c.c AS INT) AS channel,
             {_PPM_PX} AS v,
             (dm.width // 4) * (dm.height // 4) AS bsz
      {_PPM_SPINE}
    )
    GROUP BY 1, 2, 3, 4
    """,
    doc="Image resize with a REAL decode: parse the P6 payload bytes "
    "(pure-numpy netpbm decoder), box-filter each pixel block to its "
    "exact FLOOR-mean (integer block_sum // block_size; generated "
    "dims are multiples of 4 so 4x4 blocks tile exactly), emit one "
    "row per output pixel component. The oracle recomputes every "
    "resized pixel from the generation rule — decode + resize are "
    "value-hash verified end to end. Binary-in/binary-out plumbing "
    "for real codecs stays in multimodal.resize_images (stub, pytest).",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_ppm_payload(docs)
    return multimodal.ppm_resize_box(payloads)


@register(
    "mm_sample_frames",
    oracle=f"""
    WITH {_PPM_DIMS_CTE},
    pl AS (
      SELECT doc_id,
             9 + length(CAST(width AS VARCHAR))
               + length(CAST(height AS VARCHAR))
               + width * height * 3 AS n_bytes
      FROM dims
    ),
    nf AS (SELECT doc_id, least(8, 1 + (n_bytes % 8)) AS n FROM pl)
    SELECT doc_id, CAST(f.i AS INT) AS frame_no,
           CAST(f.i * 1000 AS INT) AS frame_ts_ms
    FROM nf, UNNEST(range(0, nf.n)) AS f(i)
    """,
    doc="Video frame sampling over mapInPandas (1->N exploding media "
    "op, still narrow — downstream repartition decides frame "
    "placement). Sampling runs on the REAL PPM payload bytes; the "
    "deterministic frame schedule (count from the actual byte length, "
    "dense numbering, every_ms timestamps) is value-hash verified by "
    "an oracle that recomputes the payload length from the generation "
    "rule (header = 9 + digits(w) + digits(h) bytes + w*h*3 raster). "
    "Per-frame pixel DECODE for codec formats stays a fail-loud stub.",
)
def mm_sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_ppm_payload(docs)
    return multimodal.sample_frames(payloads).select(
        "doc_id", "frame_no", "frame_ts_ms"
    )


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split({_NORM}, ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    weighted AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * LN(n.n_docs / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rn
      FROM weighted
    ) WHERE rn <= 3
    """,
    doc="TF-IDF document keywords (top-3 terms per doc): explode terms "
    "-> tf groupBy -> df groupBy -> weight join -> per-doc top-k window. "
    "The word explode happens ONCE: df(t) = COUNT(*) over the tf table "
    "(its rows are exactly the distinct (doc, term) pairs), so the df "
    "aggregation reads tf-compressed rows, not corpus tokens — no "
    "countDistinct, no second explode. The df table is "
    "corpus-vocabulary-sized and broadcastable.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    words = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("term"),
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    weighted = tf.join(df_t, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        weighted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS ns
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="Gap-based sessionization (30-min gap): lag-flag + running-sum "
    "session ids, one shuffle; streaming twin is the "
    "applyInPandasWithState operator in streaming/stream_jobs.py.",
    bench=True,
)
def sessionize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.sessions import sessionize

    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, "user_id", "ts", gap_seconds=1800, value_col="value")


@register(
    "session_window_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS ns
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="Spark's NATIVE session_window aggregation, oracle'd against "
    "the manual lag+running-sum construction — pinning that the "
    "built-in gap-merge semantics (new session at gap >= 30 min, "
    "window end = last event + gap) match the classical SQL form. One "
    "shuffle; the native operator also powers the streaming variant "
    "with state eviction for free.",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_window_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling-window aggregation — the batch equivalent of the "
    "Structured Streaming job in streaming/ (same F.window semantics; "
    "the streaming variant adds a watermark).",
    bench=True,
)
def stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(T.DecimalType(18, 2))), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# Custom-function matrix completion: grouped-agg Pandas UDAF + UDTF
# (reference §2.10 has *none* of the UDF/UDAF/UDTF surface).
# ---------------------------------------------------------------------------


@register(
    "a8_grouped_pandas_median",
    oracle="""
    SELECT event_type,
           CAST(quantile_cont(value, 0.5) AS DOUBLE) AS median_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Grouped-aggregate Pandas UDAF (Series -> scalar over Arrow): "
    "exact median per group. Median is order-independent (sort + "
    "midpoint), so the Python path value-hashes against quantile_cont "
    "exactly — chosen precisely because a sum-based UDAF would not. "
    "Scale: partial aggregation is impossible for exact medians; the "
    "group's values stream to one task — use approx_percentile when "
    "groups outgrow task memory.",
)
def a8_grouped_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("double")
    def pd_median(v: pd.Series) -> float:
        return float(v.median())

    # (pandas and JVM aggregates cannot mix in one agg — count rides a
    # second pandas UDAF)
    @pandas_udf("long")
    def pd_count(v: pd.Series) -> int:
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        pd_median("value").alias("median_value"),
        pd_count("value").alias("n"),
    )


@register(
    "udtf_sentence_split",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, '.') AS p FROM documents
    ),
    idx AS (
      SELECT doc_id, CAST(t.i AS BIGINT) AS i, trim(p[CAST(t.i AS BIGINT)]) AS s
      FROM parts, unnest(range(1, len(p) + 1)) AS t(i)
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INT)
             AS sentence_no,
           s AS sentence
    FROM idx WHERE s <> ''
    """,
    doc="Python UDTF (Spark 4): one row per sentence via lateral join — "
    "the table-function surface (1->N row expansion with typed output "
    "schema). Runs per-row in the Python worker; for hot paths prefer "
    "the equivalent posexplode(split(...)) which stays in codegen — "
    "registered here to pin the UDTF plumbing, with the JVM-side twin "
    "being the oracle-equivalent implementation choice at scale.",
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_no int, sentence string")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            n = 0
            for part in text.split("."):
                s = part.strip()
                if s:
                    yield n, s
                    n += 1

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        "SELECT doc_id, s.sentence_no, s.sentence "
        "FROM __udtf_docs, LATERAL sentence_split(text) AS s"
    )


@register(
    "arrow_group_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_bucket,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
    doc="Arrow-native custom-function pair (Spark 4 `mapInArrow` + "
    "grouped `applyInArrow`): a narrow per-batch RecordBatch transform "
    "derives an int64 bucket column without ever materializing pandas "
    "objects, then a grouped Arrow table function computes per-group "
    "stats. Completes the custom-operator matrix alongside pandas_udf / "
    "applyInPandas / UDTF / applyInPandasWithState: mapInArrow is the "
    "zero-copy batch surface for libraries that speak Arrow directly "
    "(no pandas conversion tax). Outputs are exact (count, int64 sum, "
    "min/max — no float summation), so the Arrow path value-hashes "
    "against the SQL aggregate. Scale: the grouped stage shuffles once "
    "on the group key; per-group state is O(1).",
)
def arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_bucket(batches):
        for batch in batches:
            # RecordBatch columns are contiguous Arrays — compute and
            # re-wrap directly, no Table/combine_chunks copies
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("event_type"),
                    batch.column("value"),
                    pc.cast(pc.floor(batch.column("value")), pa.int64()),
                ],
                names=["event_type", "value", "vbucket"],
            )

    def grp_stats(table: pa.Table) -> pa.Table:
        et = table.column("event_type")[0].as_py() if table.num_rows else None
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n": pa.array([table.num_rows], pa.int64()),
                "sum_bucket": pa.array(
                    [pc.sum(table.column("vbucket")).as_py()], pa.int64()
                ),
                "min_value": pa.array(
                    [pc.min(table.column("value")).as_py()], pa.float64()
                ),
                "max_value": pa.array(
                    [pc.max(table.column("value")).as_py()], pa.float64()
                ),
            }
        )

    ev = load_table(spark, sf_dir, "events")
    mapped = ev.select("event_type", "value").mapInArrow(
        add_bucket, "event_type string, value double, vbucket bigint"
    )
    return mapped.groupBy("event_type").applyInArrow(
        grp_stats,
        "event_type string, n bigint, sum_bucket bigint, "
        "min_value double, max_value double",
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT event_id, event_type
    FROM (
      SELECT event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    WHERE rn <= CAST(ceil(n * 0.1) AS BIGINT)
    """,
    doc="Deterministic stratified sample: exactly ceil(10%) of every "
    "stratum, rows chosen by content-hash order — reproducible on any "
    "cluster shape/partitioning (df.sampleBy is probabilistic per-row "
    "and seed+partitioning dependent). Scale (round 6): the rank is a "
    "two-level chunked computation, NOT one sort task per stratum — "
    "the md5 sort key's first two hex chars split each stratum into "
    "256 uniform, ORDER-PRESERVING chunks (the chunk key is a prefix "
    "of the sort key), chunk-local row_numbers run in parallel, and "
    "the rank offset comes from a bounded (<=256 rows/stratum) "
    "chunk-count scan broadcast back — identical ranks to the "
    "single-window form (same oracle), so the dominant event_type of "
    "a 100 TB stream never lands in one task.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string"))
    chunked = ev.select(
        "event_id",
        "event_type",
        h.alias("__h"),
        F.substring(h, 1, 2).alias("__chunk"),
    )
    # chunk counts: tiny by construction (strata x 256 rows)
    wc = (
        Window.partitionBy("__oet")
        .orderBy("__ochunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("__oet")
    offsets = (
        chunked.groupBy(
            F.col("event_type").alias("__oet"),
            F.col("__chunk").alias("__ochunk"),
        )
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__oet",
            "__ochunk",
            F.coalesce(F.sum("__cnt").over(wc), F.lit(0)).alias("__before"),
            F.sum("__cnt").over(wn).alias("n"),
        )
    )
    w_local = Window.partitionBy("event_type", "__chunk").orderBy(
        "__h", "event_id"
    )
    return (
        # null-safe stratum join: a NULL event_type is a stratum of its
        # own under the window form — a plain equi-join would drop it
        chunked.join(
            F.broadcast(offsets),
            F.col("event_type").eqNullSafe(F.col("__oet"))
            & F.col("__chunk").eqNullSafe(F.col("__ochunk")),
        )
        .select(
            "event_id",
            "event_type",
            (F.col("__before") + F.row_number().over(w_local)).alias("rn"),
            "n",
        )
        .filter(F.col("rn") <= F.ceil(F.col("n") * 0.1).cast("long"))
        .select("event_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering (connected components over the pair graph)
# ---------------------------------------------------------------------------


@register(
    "dedup_cluster_canonical",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_CLUSTER_CTES}
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           (cluster_id = doc_id) AS is_canonical
    FROM (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    """,
    doc="Near-dup clustering: Jaccard>=0.8 pairs become an undirected "
    "graph; distributed connected components (hash-min label "
    "propagation + pointer jumping, operators/graph.py) labels every "
    "document with its component's min doc_id; the canonical keeper "
    "is the label owner. The oracle recomputes components with a "
    "recursive CTE (min label over reachability), proving the "
    "iterative Spark algorithm exact. Scale: per-round state is one "
    "row per vertex hash-partitioned on node id; O(log diameter) "
    "rounds; lineage truncated by per-round localCheckpoint.",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import graph

    docs = load_table(spark, sf_dir, "documents")
    # Prefix-filtered emitter: identical pair set to the naive ground
    # truth (oracle-proven), candidate-bounded — the 100 TB path.
    pairs = dedup.ngram_jaccard_pairs_prefix(docs, threshold=0.8).select(
        "id_a", "id_b"
    )
    # the prefix emitter aggregates on (id_a, id_b): pairs are unique
    # by construction, so CC can skip its symmetrize-dedup shuffle
    return graph.cluster_documents(docs, pairs, pairs_unique=True)


# ---------------------------------------------------------------------------
# Eval-set decontamination (benchmark n-gram overlap removal)
# ---------------------------------------------------------------------------

_DECON_N = 13  # the customary 13-gram window (GPT-3 App. C)

#: Distinct word-13-grams per doc, with the same short-text whole-text
#: fallback as operators.dedup.word_shingles. `source = 'src0'` plays
#: the held-out benchmark; the rest of the corpus is training data.
_DECON_CTE = f"""
    dwords AS (
      SELECT doc_id, source, n_chars, {_NORM} AS nt, string_split({_NORM}, ' ') AS w
      FROM documents
    ),
    dgrams AS (
      SELECT DISTINCT doc_id, source, array_to_string(w[i:i+{_DECON_N - 1}], ' ') AS gram
      FROM dwords, UNNEST(range(1, greatest(len(w) - {_DECON_N} + 2, 1))) AS t(i)
      WHERE len(w) >= {_DECON_N}
      UNION
      SELECT DISTINCT doc_id, source, nt FROM dwords WHERE len(w) < {_DECON_N}
    ),
    egrams AS (SELECT DISTINCT gram FROM dgrams WHERE source = 'src0')
"""


@register(
    "decontam_report",
    oracle=f"""
    WITH {_DECON_CTE},
    hits AS (
      SELECT g.doc_id, COUNT(*) AS shared_grams
      FROM dgrams g JOIN egrams USING (gram)
      WHERE g.source <> 'src0'
      GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(h.shared_grams, 0) AS shared_grams,
           COALESCE(h.shared_grams, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.source <> 'src0'
    """,
    doc="Eval-set contamination report: per training doc, how many "
    "distinct 13-grams it shares with the benchmark slice (src0). "
    "Eval n-gram set rides a broadcast; corpus side is a narrow "
    "explode — the only shuffle is the per-doc count.",
)
def decontam_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    return decontam.contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=_DECON_N,
    )


@register(
    "decontam_survivors",
    oracle=f"""
    WITH {_DECON_CTE},
    bad AS (
      SELECT DISTINCT g.doc_id
      FROM dgrams g JOIN egrams USING (gram)
      WHERE g.source <> 'src0'
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d
    WHERE d.source <> 'src0' AND d.doc_id NOT IN (SELECT doc_id FROM bad)
    """,
    doc="Decontaminated corpus: training docs sharing no 13-gram with "
    "the benchmark slice. Broadcast semi-join marks contaminated ids; "
    "survivors keep all columns via anti-join.",
)
def decontam_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    return decontam.decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=_DECON_N,
    ).select("doc_id", "source", "n_chars")


# ---------------------------------------------------------------------------
# Document chunking (fixed-size overlapping token windows)
# ---------------------------------------------------------------------------


@register(
    "text_chunk",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(s // 40 AS INT) AS chunk_ix,
           array_to_string(t[s + 1 : s + 50], ' ') AS chunk,
           CAST(least(50, len(t) - s) AS INT) AS n_tokens
    FROM toks, UNNEST(range(0, len(t), 40)) AS u(s)
    """,
    doc="Training-data chunker: every document split into 50-token "
    "windows advancing by 40 (10-token overlap), via "
    "split/sequence/posexplode/slice built-ins only — a narrow 1→N "
    "explode, no shuffle, chunk count ∝ corpus tokens/step "
    "(operators/text.py chunk_tokens). Whitespace-normalized before "
    "splitting so Spark and the DuckDB oracle tokenize identically.",
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.chunk_tokens(docs, window=50, step=40)


# ---------------------------------------------------------------------------
# End-to-end corpus preparation (the composed training-data pipeline)
# ---------------------------------------------------------------------------


@register(
    "pipeline_corpus_prep",
    oracle=f"""
    WITH filtered AS (
      SELECT doc_id, text FROM documents
      WHERE lang = 'en'
        AND len(string_split_regex(trim(text), '\\s+')) >= 30
    ),
    keep AS (
      SELECT MIN(doc_id) AS doc_id
      FROM filtered GROUP BY md5({_NORM})
    ),
    toks AS (
      SELECT f.doc_id,
             string_split(trim(regexp_replace(f.text, '\\s+', ' ', 'g')), ' ') AS t
      FROM filtered f JOIN keep k USING (doc_id)
    )
    SELECT doc_id,
           CAST(s // 40 AS INT) AS chunk_ix,
           array_to_string(t[s + 1 : s + 50], ' ') AS chunk,
           CAST(least(50, len(t) - s) AS INT) AS n_tokens
    FROM toks, UNNEST(range(0, len(t), 40)) AS u(s)
    """,
    doc="The composed corpus-prep pipeline a pretraining run actually "
    "executes, as ONE declarative plan: language filter → length gate "
    "(token_count_ws) → exact dedup keeping the canonical lowest-id "
    "copy → 50/40 overlapping chunking. Everything stays JVM-side; "
    "Catalyst fuses the filters into the scan, the dedup is the only "
    "shuffle (hash agg on the text fingerprint + a semi join AQE turns "
    "into a broadcast when the survivor set is small), and the chunk "
    "explode is narrow. At 100 TB each stage drops data before the "
    "next pays for it — filter pushdown first, the shuffle only "
    "carries survivors, chunks never materialize for dropped docs.",
    bench=True,
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    filtered = docs.filter(
        (F.col("lang") == "en") & (text.token_count_ws(F.col("text")) >= 30)
    ).select("doc_id", "text")
    keep = dedup.exact_dedup(filtered).select(F.col("keep_id").alias("doc_id"))
    kept = filtered.join(keep, on="doc_id", how="left_semi")
    return text.chunk_tokens(kept, window=50, step=40)


@register(
    "pipeline_pretrain_recipe",
    oracle=f"""
    WITH {_DECON_CTE},
    gated AS (
      SELECT doc_id, source, n_chars, {_NORM} AS nt,
             string_split({_NORM}, ' ') AS ws
      FROM documents
      WHERE source <> 'src0' AND lang = 'en'
    ),
    quality AS (
      SELECT doc_id, source, n_chars, nt FROM gated
      WHERE len(ws) >= 20
        AND (len(ws) - len(list_distinct(ws))) / nullif(len(ws), 0) <= 0.5
    ),
    clean AS (
      SELECT q.* FROM quality q
      WHERE q.doc_id NOT IN (
        SELECT g.doc_id FROM dgrams g JOIN egrams USING (gram)
        WHERE g.source <> 'src0'
      )
    ),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM clean GROUP BY md5(nt))
    SELECT c.doc_id, c.source, c.n_chars
    FROM clean c JOIN keep USING (doc_id)
    """,
    doc="The full pretraining data recipe as ONE declarative plan: "
    "benchmark split-off -> language gate -> length gate -> "
    "repetition gate (dup-word fraction <= 0.5) -> 13-gram eval-set "
    "decontamination -> exact dedup keeping the canonical copy. "
    "Catalyst fuses every per-row gate into the scan; the broadcast "
    "decontamination semi-join and the dedup hash-agg are the only "
    "exchanges, and both run on already-gated survivors — at 100 TB "
    "each stage drops data before the next pays for it.",
)
def pipeline_pretrain_recipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0")
    eval_docs = docs.filter(F.col("source") == "src0")
    words = F.split(text.normalize_text(F.col("text")), " ")
    n_words = F.size(words)
    gated = train.filter(
        (F.col("lang") == "en")
        & (n_words >= 20)
        & (
            (n_words - F.size(F.array_distinct(words)))
            / F.nullif(n_words, F.lit(0))
            <= 0.5
        )
    )
    # persist the decontamination VERDICT (ids only), not the
    # text-bearing frame: `clean` feeds both the dedup pass and the
    # final semi-join, and unpersisted the gram-explode decontaminate
    # ran end to end twice; caching just the id set keeps the memory
    # footprint trivial while the corpus re-reads are pruned parquet
    # scans (round-10 optimization)
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    clean_ids = persist_tracked(
        decontam.decontaminate(gated, eval_docs, n=_DECON_N).select("doc_id")
    )
    clean = gated.join(clean_ids, "doc_id", "left_semi")
    keep = dedup.exact_dedup(clean).select(F.col("keep_id").alias("doc_id"))
    return clean.join(keep, "doc_id", "left_semi").select(
        "doc_id", "source", "n_chars"
    )


@register(
    "dedup_levenshtein",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, {_NORM} AS nt FROM documents
    ),
    b AS (SELECT doc_id, nt, substr(nt, 1, 12) AS blk FROM n)
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(levenshtein(a.nt, c.nt) AS INT) AS edit_dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
    WHERE levenshtein(a.nt, c.nt) <= 30
    """,
    doc="Edit-distance near-dup pairs with prefix blocking — the "
    "record-linkage complement to shingle/MinHash dedup (catches "
    "in-place edits that shift every shingle). The JVM "
    "levenshtein(l, r, threshold) short-circuits above the bound, so "
    "non-dup comparisons cost O(len*max_dist); the corpus genuinely "
    "contains sub-threshold pairs, so the oracle checks real matches.",
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.levenshtein_pairs(docs, max_dist=30, block_prefix=12)


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split({_NORM}, ' ')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY 1),
    qw AS (
      SELECT doc_id, term FROM words
      WHERE term IN ('merge', 'join', 'window', 'vector')
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qw GROUP BY 1, 2),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qw GROUP BY 1),
    s AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT AVG(dl) FROM dl) AS avgdl
    ),
    scored AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               LN(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN dft USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN s
      GROUP BY 1
    )
    SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """,
    doc="Okapi BM25 top-10 retrieval (k1=1.2, b=0.75, Lucene idf) for a "
    "4-term query: the isin(term) filter drops non-query tokens before "
    "any shuffle, df and the (N, avgdl) scalars broadcast, and the "
    "final ranking is a TakeOrdered top-k — never a full sort. The "
    "lexical complement to ann_cosine_topk's dense retrieval.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.bm25_topk(docs, ["merge", "join", "window", "vector"], k=10)


@register(
    "text_bigram_ppl",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
      WHERE len(string_split({_NORM}, ' ')) >= 2
    ),
    words AS (
      SELECT doc_id, UNNEST(t) AS w FROM toks
    ),
    big AS (
      SELECT doc_id,
             UNNEST(t[1:len(t)-1]) AS w1,
             UNNEST(t[2:len(t)]) AS w2
      FROM toks
    ),
    m AS (SELECT doc_id, w1, w2, COUNT(*) AS m FROM big GROUP BY 1, 2, 3),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM words)
    SELECT m.doc_id,
           CAST(SUM(m.m) AS BIGINT) AS n_bigrams,
           ROUND(SUM(m.m * LN((c2.c2 + 1.0) / (c1.c1 + v.v))) / SUM(m.m), 6)
             AS avg_logp,
           ROUND(EXP(-SUM(m.m * LN((c2.c2 + 1.0) / (c1.c1 + v.v))) / SUM(m.m)), 4)
             AS ppl
    FROM m JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY 1
    """,
    doc="Per-doc pseudo-perplexity under a corpus-trained add-one "
    "bigram LM (the KenLM-style quality filter signal). Bigrams built "
    "array-side (slice+zip, no positional window shuffle), then "
    "count-compressed before any join; c(w1,.) and V broadcast.",
)
def text_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.bigram_lm_scores(docs)


@register(
    "embed_quality_probe",
    oracle="""
    WITH dims AS (
      SELECT vec_id, label,
             UNNEST(embedding)::DOUBLE AS x,
             generate_subscripts(embedding, 1) AS d
      FROM embeddings
    ),
    w AS (
      SELECT d,
             ROUND(AVG(x) FILTER (label = 0)
                   - AVG(x) FILTER (label <> 0), 6) AS w
      FROM dims GROUP BY d
    ),
    scored AS (
      SELECT dims.vec_id,
             1.0 / (1.0 + EXP(-SUM(dims.x * w.w))) AS s
      FROM dims JOIN w USING (d)
      GROUP BY dims.vec_id
    )
    SELECT e.vec_id, e.label, ROUND(s.s, 6) AS score,
           s.s >= 0.5 AS predicted_good
    FROM embeddings e JOIN scored s USING (vec_id)
    """,
    doc="Linear-probe quality classifier (fasttext-style): weight "
    "vector trained ON the corpus as the good-vs-rest centroid "
    "difference (one map-side-combined aggregation), collected as the "
    "bounded model, re-broadcast as a literal, scored with a pure JVM "
    "zip_with sigmoid — no join or shuffle in the scoring pass. "
    "Weights rounded to 6dp for cross-engine bit-stability.",
)
def embed_quality_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.linear_probe_scores(emb)


@register(
    "text_boilerplate_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             md5(lower(array_to_string(t[s + 1 : s + 50], ' '))) AS chunk_fp
      FROM toks, UNNEST(range(0, len(t), 50)) AS u(s)
      WHERE least(50, len(t) - s) >= 20
    )
    SELECT chunk_fp,
           COUNT(*) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           MIN(doc_id) AS example_doc
    FROM chunks
    GROUP BY chunk_fp
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    doc="Boilerplate detection: non-overlapping 50-token chunks "
    "(runts under 20 tokens skipped) fingerprinted with md5-of-"
    "lowercased-text, grouped corpus-wide; a chunk shared by >= 2 "
    "distinct documents is repeated boilerplate (headers, footers, "
    "license blocks) — the paragraph-granularity complement of "
    "document-level dedup. One narrow explode + one hash groupBy with "
    "map-side combine; fingerprints (16 bytes) shuffle, never text.",
)
def text_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = text.chunk_tokens(docs, window=50, step=50).filter(
        F.col("n_tokens") >= 20
    )
    fp = F.md5(F.lower(F.col("chunk")).cast("binary"))
    return (
        chunks.select("doc_id", fp.alias("chunk_fp"))
        .groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@register(
    "pipeline_quality_gate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
      WHERE len(string_split({_NORM}, ' ')) >= 2
    ),
    words AS (SELECT doc_id, UNNEST(t) AS w FROM toks),
    big AS (
      SELECT doc_id,
             UNNEST(t[1:len(t)-1]) AS w1,
             UNNEST(t[2:len(t)]) AS w2
      FROM toks
    ),
    m AS (SELECT doc_id, w1, w2, COUNT(*) AS m FROM big GROUP BY 1, 2, 3),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM words),
    lm AS (
      SELECT m.doc_id,
             ROUND(EXP(-SUM(m.m * LN((c2.c2 + 1.0) / (c1.c1 + v.v)))
                       / SUM(m.m)), 4) AS ppl
      FROM m JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY 1
    ),
    q AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             round(len(regexp_extract_all(text,
                       '(?i)\\b(the|and|of|with|a|to|in|is)\\b'))
                   / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
                   4) AS stopword_ratio
      FROM documents
    )
    SELECT q.doc_id, q.n_tokens, q.stopword_ratio, lm.ppl
    FROM q JOIN lm USING (doc_id)
    WHERE q.n_tokens BETWEEN 30 AND 5000
      AND q.stopword_ratio >= 0.02
      AND lm.ppl <= 31.0
    """,
    doc="Composed quality gate — the filter stage a pretraining "
    "pipeline runs before dedup: heuristic features (token count, "
    "stopword ratio) AND the corpus-trained bigram-LM perplexity, one "
    "declarative plan. The heuristics are narrow per-row expressions; "
    "the LM join reuses bigram_lm_scores' count-compressed shape, so "
    "the gate's only corpus-wide shuffles are the LM count "
    "aggregations.",
)
def pipeline_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # the heuristics are text.quality_features' — one definition of the
    # stopword list / counting rule, shared with text_quality
    heur = text.quality_features(docs).select(
        "doc_id", "n_tokens", "stopword_ratio"
    )
    lm = text.bigram_lm_scores(docs).select("doc_id", "ppl")
    return (
        heur.join(lm, "doc_id")
        .filter(
            F.col("n_tokens").between(30, 5000)
            & (F.col("stopword_ratio") >= 0.02)
            & (F.col("ppl") <= 31.0)
        )
        .select("doc_id", "n_tokens", "stopword_ratio", "ppl")
    )


_EMAIL_RE = text.EMAIL_RE
_PHONE_RE = text.PHONE_RE


@register(
    "quality_auc_eval",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
      WHERE len(string_split({_NORM}, ' ')) >= 2
    ),
    words AS (SELECT doc_id, UNNEST(t) AS w FROM toks),
    big AS (
      SELECT doc_id,
             UNNEST(t[1:len(t)-1]) AS w1,
             UNNEST(t[2:len(t)]) AS w2
      FROM toks
    ),
    m AS (SELECT doc_id, w1, w2, COUNT(*) AS m FROM big GROUP BY 1, 2, 3),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM words),
    lm AS (
      SELECT m.doc_id,
             ROUND(EXP(-SUM(m.m * LN((c2.c2 + 1.0) / (c1.c1 + v.v)))
                       / SUM(m.m)), 4) AS ppl
      FROM m JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY 1
    ),
    q AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             round(len(regexp_extract_all(text,
                       '(?i)\\b(the|and|of|with|a|to|in|is)\\b'))
                   / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
                   4) AS stopword_ratio
      FROM documents
    ),
    j AS (
      SELECT q.doc_id, -lm.ppl AS score,
             CASE WHEN q.n_tokens BETWEEN 30 AND 5000
                   AND q.stopword_ratio >= 0.02
                  THEN 1 ELSE 0 END AS label
      FROM q JOIN lm USING (doc_id)
    ),
    r AS (
      SELECT doc_id, score, label,
             ROW_NUMBER() OVER (ORDER BY score ASC, doc_id ASC) AS rnk
      FROM j
    ),
    ar AS (
      SELECT label, AVG(rnk) OVER (PARTITION BY score) AS arnk FROM r
    )
    SELECT CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg,
           CASE WHEN sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) > 0
                 AND sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) > 0
                THEN round((sum(CASE WHEN label = 1 THEN arnk END)
                      - sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                        * (sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1)
                        / 2.0)
                     / (sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
                        * sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)), 6)
           END AS auc
    FROM ar
    """,
    doc="Model-eval operator: tie-aware ROC-AUC (Mann-Whitney rank "
    "form) of the corpus-trained bigram-LM quality signal (score = "
    "-ppl) against the heuristic quality label (token count in "
    "[30,5000] AND stopword ratio >= 0.02) — does the expensive "
    "signal agree with the cheap gate? Fully distributed: ranks via "
    "operators/ranking.distributed_total_rank (range-bucketed, no "
    "single-task sort), tie-averaging as one window over the score "
    "partition; a tie group's average of consecutive integer ranks "
    "is a multiple of 0.5, exactly representable, so the rank sums "
    "are summation-order-independent and the 6-dp rounding is "
    "engine-stable. Value-hash oracled end-to-end including the LM.",
)
def quality_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import classifier

    docs = load_table(spark, sf_dir, "documents")
    heur = text.quality_features(docs).select(
        "doc_id", "n_tokens", "stopword_ratio"
    )
    lm = text.bigram_lm_scores(docs).select("doc_id", "ppl")
    j = heur.join(lm, "doc_id").select(
        "doc_id",
        (-F.col("ppl")).alias("score"),
        F.when(
            F.col("n_tokens").between(30, 5000)
            & (F.col("stopword_ratio") >= 0.02),
            1,
        )
        .otherwise(0)
        .alias("label"),
    )
    return classifier.auc(j, score_col="score", label_col="label")


@register(
    "pii_redact",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 > 0
                  THEN ' contact user' || doc_id || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 2 = 0
                  THEN ' or call +1 (555) 0100-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS pt
      FROM documents
    ),
    e AS (
      SELECT doc_id, pt,
             regexp_replace(pt, '{_EMAIL_RE}', '[EMAIL]', 'g') AS em
      FROM t
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(pt, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(em, '{_PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(em, '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5
    FROM e
    """,
    doc="PII scrubbing (emails + phone-shaped digit runs) — the "
    "standard pretraining hygiene pass. Deterministic synthetic PII is "
    "seeded from doc_id (the corpus itself is PII-free), then "
    "operators.text.redact_pii runs: pure JVM regexp expressions, a "
    "narrow map with zero shuffles at any scale. The md5 of the "
    "redacted text value-checks the exact replacement positions.",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 > 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" or call +1 (555) 0100-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    red = text.redact_pii(seeded)
    return red.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.md5(F.col("redacted").cast("binary")).alias("redacted_md5"),
    )


@register(
    "dedup_span_exact",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
    ),
    wins AS (
      SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS win
      FROM w, UNNEST(range(1, len(ws) - 2)) AS t(i)
      WHERE len(ws) >= 4
    ),
    dup AS (
      SELECT win FROM wins GROUP BY win HAVING count(*) >= 2
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN win IN (SELECT win FROM dup)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
           round(CAST(sum(CASE WHEN win IN (SELECT win FROM dup)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_frac
    FROM wins GROUP BY doc_id
    """,
    doc="Exact duplicate-span detection (Lee et al. 2022 substring "
    "dedup, relational form): sliding 4-token windows hashed to md5, "
    "one count-aggregation finds spans occurring >= 2 times anywhere, "
    "a left-semi join scores each doc's duplicated fraction. The "
    "shuffle carries (id, 32-hex hash) only — never span text.",
)
def dedup_span_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_spans(docs, window=4)


@register(
    "dedup_span_clean",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents
    ),
    wins AS (
      SELECT doc_id, i AS pos, array_to_string(ws[i:i+3], ' ') AS win
      FROM w, UNNEST(range(1, len(ws) - 2)) AS t(i)
      WHERE len(ws) >= 4
    ),
    marked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY win) AS cnt,
             row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
      FROM wins
    ),
    rem AS (
      SELECT doc_id, list(pos) AS rs FROM marked
      WHERE cnt >= 2 AND rn > 1 GROUP BY doc_id
    ),
    j AS (
      SELECT w.doc_id, ws, COALESCE(rs, []) AS rs
      FROM w LEFT JOIN rem ON w.doc_id = rem.doc_id
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           CAST(len(ws) - len(list_filter(range(1, len(ws) + 1),
                i -> len(list_filter(rs, p -> i >= p AND i <= p + 3)) = 0))
                AS BIGINT) AS n_removed,
           -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is
           -- '' — an exact-duplicate doc loses every token, so pin ''
           md5(COALESCE(array_to_string(
                 list_transform(
                   list_filter(range(1, len(ws) + 1),
                     i -> len(list_filter(rs, p -> i >= p AND i <= p + 3)) = 0),
                   i -> ws[i]),
                 ' '), '')) AS clean_md5
    FROM j
    """,
    doc="Substring-dedup cleaning (Lee et al. 2022 ExactSubstr keep-"
    "first policy): repeated 4-token spans are cut from every "
    "occurrence except the (doc_id, pos)-first. One window-function "
    "pass over span hashes is the only corpus-wide shuffle; the token "
    "mask is per-row higher-order array work. md5(clean_text) "
    "value-checks the exact surviving token sequence per doc.",
)
def dedup_span_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.remove_duplicate_spans(docs, window=4)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


@register(
    "bpe_tokenize",
    oracle=None,  # 100-merge production run: rows-only because a
    # 100-round oracle unroll is impractical, NOT inexpressible — the
    # encode loop itself is value-hash proven at a 16-merge vocabulary
    # by bpe_encode_bounded (round-9 directive #7); training
    # determinism, golden merges and round-trip decode are pinned in
    # tests/test_bpe.py
    doc="Corpus-trained BPE tokenizer: training reads only the "
    "word-frequency table (one explode+groupBy shuffle compresses the "
    "corpus to <=max_words rows — driver-safe at any corpus size), the "
    "merge loop runs on that compressed dict, and encoding is a narrow "
    "Arrow-batched mapInPandas with per-batch word memoization. "
    "Returns per-doc subword counts and fertility (BPE tokens per "
    "whitespace word).",
)
def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, num_merges=100)
    enc = bpe.bpe_encode(docs, merges)
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return enc.select(
        "doc_id",
        "n_bpe_tokens",
        F.round(F.col("n_bpe_tokens") / n_words, 4).alias("fertility"),
    )


@register(
    "doc_embedding_hash",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split({_NORM}, ' ')) AS t FROM documents
    ),
    tf AS (
      SELECT doc_id, t, COUNT(*) AS tf FROM words WHERE t <> '' GROUP BY 1, 2
    ),
    dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id,
             CAST(('0x' || substr(md5(tf.t), 1, 8))::BIGINT % 64 AS INT)
               AS bucket,
             (CASE WHEN ('0x' || substr(md5(tf.t || '#s'), 1, 8))::BIGINT % 2 = 0
                   THEN 1.0 ELSE -1.0 END)
             * round(tf.tf * round(ln(n.n_docs / dfq.df), 6), 6) AS w
      FROM tf JOIN dfq USING (t) CROSS JOIN n
    )
    SELECT doc_id, bucket, round(sum(w), 6) AS weight
    FROM scored GROUP BY 1, 2
    """,
    doc="Feature-hashed TF-IDF document embeddings (hashing trick): "
    "text -> fixed-dim vector from corpus statistics alone, closing "
    "the raw-text -> ANN loop with no model artifact. One corpus "
    "explode; df counted over the tf-compressed table; md5 bucket/sign "
    "hashes reproduce bit-for-bit in the oracle. Sparse (doc, bucket, "
    "weight) form here; the dense array form feeds "
    "operators.similarity.",
)
def doc_embedding_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.hashed_tfidf_embedding(docs, dense=False, dim=64)


@register(
    "shard_plan",
    oracle=r"""
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                % 8 AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN trim(text) = '' THEN 0
                         ELSE len(string_split_regex(trim(text), '\s+'))
                    END) AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
    """,
    doc="Training-shard audit: the deterministic md5(id) %% n dealing "
    "that sources.export.export_shards publishes, as per-shard "
    "doc/token stats. Pure hash assignment — no global sort, identical "
    "on any cluster shape; export_shards writes the shards (one sorted "
    "file each, manifest-last crash contract through the FS shim).",
)
def shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.sources.export import (
        shard_plan as _plan,
    )

    docs = load_table(spark, sf_dir, "documents")
    return _plan(docs, n_shards=8)


def _logreg_oracle(
    dim: int, iters: int, lr: float, l2: float, sample_frac: float | None
) -> str:
    """Unrolled batch-gradient-descent logistic regression in SQL —
    the trainer ``operators/classifier.train_logreg`` runs, iteration
    by iteration, as DuckDB CTEs (the unrolled-Lloyd pattern that made
    ``dedup_semantic``'s k-means training hash-provable).

    Shared rounding contract with ``round_dp=6`` on the Spark side:
    per-row probability rounds at the logit and again after the
    sigmoid; summed gradients round before the parameter update; every
    updated weight and the bias round after it — so both engines chain
    bit-identical weight literals between iterations. ``lr``/``l2``
    are injected in e-notation so DuckDB parses them as DOUBLE, not
    DECIMAL."""
    lr_s, l2_s = f"{lr:e}", f"{l2:e}"
    draw = (
        "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        " / 4294967296.0)"
    )
    parts = [
        f"words AS (SELECT doc_id, UNNEST(string_split({_NORM}, ' ')) AS t "
        "FROM documents)",
        "tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM words WHERE t <> '' GROUP BY 1, 2)",
        "dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1)",
        "nd AS (SELECT COUNT(*) AS n_docs FROM documents)",
        "sc AS (SELECT tf.doc_id, "
        f"CAST(('0x' || substr(md5(tf.t), 1, 8))::BIGINT % {dim} AS INT) "
        "AS bucket, "
        "(CASE WHEN ('0x' || substr(md5(tf.t || '#s'), 1, 8))::BIGINT % 2 = 0 "
        "THEN 1.0 ELSE -1.0 END) "
        "* round(tf.tf * round(ln(nd.n_docs / dfq.df), 6), 6) AS w "
        "FROM tf JOIN dfq USING (t) CROSS JOIN nd)",
        "sparse AS (SELECT doc_id, bucket, round(sum(w), 6) AS weight "
        "FROM sc GROUP BY 1, 2)",
        "emb AS (SELECT s.doc_id, "
        "array_agg(coalesce(sp.weight, 0.0) ORDER BY d.i) AS x "
        "FROM (SELECT DISTINCT doc_id FROM sparse) s "
        f"CROSS JOIN (SELECT UNNEST(range(0, {dim})) AS i) d "
        "LEFT JOIN sparse sp ON sp.doc_id = s.doc_id AND sp.bucket = d.i "
        "GROUP BY s.doc_id)",
        # weak label: exact discrete median by the explicit rank rule
        # (smallest length whose cumulative count reaches ceil(n/2)) —
        # mirrors operators/classifier.exact_discrete_median
        "lens AS (SELECT doc_id, length(text) AS L FROM documents)",
        "medt AS (SELECT min(L) AS med FROM ("
        "SELECT L, sum(c) OVER (ORDER BY L) AS cum, n FROM "
        "(SELECT L, count(*) AS c FROM lens GROUP BY 1) "
        "CROSS JOIN (SELECT count(*) AS n FROM lens)"
        ") WHERE cum >= (n + 1) // 2)",
        "lab AS (SELECT l.doc_id, "
        "CAST(CASE WHEN l.L > m.med THEN 1 ELSE 0 END AS INT) AS label "
        "FROM lens l CROSS JOIN medt m)",
        "fullset AS (SELECT e.doc_id, e.x, lab.label "
        "FROM emb e JOIN lab USING (doc_id))",
    ]
    # MATERIALIZED: each w{it} is referenced twice (by p{it} and by
    # w{it+1}'s update) — with default CTE inlining DuckDB would expand
    # the chain 2^iters times; materializing keeps evaluation linear,
    # exactly like Spark's per-iteration collected weight literals
    if sample_frac is not None and sample_frac < 1.0:
        parts.append(
            "train AS MATERIALIZED "
            f"(SELECT * FROM fullset WHERE {draw} < {sample_frac!r})"
        )
    else:
        parts.append("train AS MATERIALIZED (SELECT * FROM fullset)")
    parts.append("ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM train)")
    zeros = ", ".join(["0.0"] * dim)
    parts.append(f"w0 AS (SELECT [{zeros}]::DOUBLE[] AS wv, 0.0 AS b)")
    prob = (
        "round(1.0 / (1.0 + "
        "exp(-round(list_dot_product({t}.x, w.wv) + w.b, 6))), 6)"
    )
    for it in range(iters):
        parts.append(
            f"p{it} AS MATERIALIZED (SELECT t.doc_id, t.x, t.label, "
            f"{prob.format(t='t')} AS p FROM train t CROSS JOIN w{it} w)"
        )
        parts.append(
            f"g{it} AS MATERIALIZED (SELECT d.i, "
            "round(sum((p.p - p.label) * p.x[d.i]), 6) AS g, "
            "round(sum(p.p - p.label), 6) AS gb "
            f"FROM p{it} p "
            f"CROSS JOIN (SELECT UNNEST(range(1, {dim + 1})) AS i) d "
            "GROUP BY 1)"
        )
        parts.append(
            f"w{it + 1} AS MATERIALIZED (SELECT "
            f"(SELECT array_agg(round(w.wv[g.i] - {lr_s} * "
            f"(g.g / ntr.n + {l2_s} * w.wv[g.i]), 6) ORDER BY g.i) "
            f"FROM g{it} g CROSS JOIN ntr CROSS JOIN w{it} w) AS wv, "
            f"(SELECT round(min(w.b) - {lr_s} * min(g.gb) / min(ntr.n), 6) "
            f"FROM g{it} g CROSS JOIN ntr CROSS JOIN w{it} w) AS b)"
        )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT doc_id, label, p AS score,
           CAST(CASE WHEN p > 0.5 THEN 1 ELSE 0 END AS INT) AS pred
    FROM (SELECT f.doc_id, f.label, {prob.format(t='f')} AS p
          FROM fullset f CROSS JOIN w{iters} w)
    """
    )


@register(
    "quality_classifier_scores",
    oracle=_logreg_oracle(dim=32, iters=12, lr=0.5, l2=1e-4, sample_frac=0.5),
    doc="TRAINED quality classifier (fasttext-style filter): hashed "
    "TF-IDF features -> distributed logistic regression where each GD "
    "iteration is ONE map-side-combined aggregation (per-row gradient "
    "is a JVM higher-order expression; driver holds only dim+1 "
    "floats) -> per-doc quality scores. Weak label = length above the "
    "EXACT corpus median (explicit rank rule, engine-portable); the "
    "model generalizes onto token content. The 100 TB shape: TRAIN on "
    "a deterministic hash-sample (each GD iteration scans only the "
    "sample), SCORE everything — sampled-vs-full model agreement "
    "pinned in tests/test_classifier.py. Value-hash oracled by fully "
    "unrolling the 12 GD iterations into SQL CTEs with the shared "
    "6-dp rounding contract — the training dynamics themselves are "
    "oracle-verified, not just the output shape.",
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.classifier import (
        quality_filter_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return quality_filter_scores(docs, dim=32, iters=12, sample_frac=0.5)


_GAPFILL_DENSE_CTE = """
    agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             round(sum(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT g.event_type, t.bucket_ts
      FROM (SELECT DISTINCT event_type FROM events) g
      CROSS JOIN bounds
      CROSS JOIN UNNEST(generate_series(bounds.lo, bounds.hi,
                                        INTERVAL 1 HOUR)) AS t(bucket_ts)
    ),
    dense AS (
      SELECT s.event_type, s.bucket_ts, a.v,
             CASE WHEN a.v IS NULL THEN 1 ELSE 0 END AS filled
      FROM spine s LEFT JOIN agg a USING (event_type, bucket_ts)
    )
"""


@register(
    "ts_gapfill_locf",
    oracle=f"""
    WITH {_GAPFILL_DENSE_CTE}
    SELECT event_type, bucket_ts,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           filled
    FROM dense
    """,
    doc="Hypertable rollup with gap-fill (TimescaleDB "
    "time_bucket_gapfill + locf): ONE corpus shuffle for the (group, "
    "hour) rollup; the dense bucket spine is sequence() x distinct "
    "groups (output-sized); last-observation-carried-forward is a "
    "single ignoreNulls window over the spine.",
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.timeseries import (
        time_bucket_gapfill,
    )

    events = load_table(spark, sf_dir, "events")
    return time_bucket_gapfill(
        events, "ts", "value", ["event_type"], bucket="hour", fill="locf"
    )


@register(
    "ts_gapfill_linear",
    oracle=f"""
    WITH {_GAPFILL_DENSE_CTE}
    SELECT event_type, bucket_ts,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                  AND next_t <> prev_t
               THEN prev_v + (next_v - prev_v)
                    * (CAST(epoch(bucket_ts) AS BIGINT) - prev_t)
                    / (next_t - prev_t)
             ELSE NULL
           END, 6) AS value,
           filled
    FROM (
      SELECT *,
        last_value(v IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY bucket_ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN v IS NOT NULL
                        THEN CAST(epoch(bucket_ts) AS BIGINT) END
                   IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY bucket_ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
        first_value(v IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY bucket_ts
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN v IS NOT NULL
                         THEN CAST(epoch(bucket_ts) AS BIGINT) END
                    IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY bucket_ts
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
      FROM dense
    )
    """,
    doc="Hypertable gap-fill with LINEAR interpolation (TimescaleDB "
    "interpolate()): neighboring observations come from two mirrored "
    "ignoreNulls window passes over the output-sized spine; "
    "leading/trailing gaps stay NULL. Same one-shuffle rollup as "
    "ts_gapfill_locf.",
)
def ts_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.timeseries import (
        time_bucket_gapfill,
    )

    events = load_table(spark, sf_dir, "events")
    return time_bucket_gapfill(
        events, "ts", "value", ["event_type"], bucket="hour", fill="linear"
    )


@register(
    "mv_incremental_refresh",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice) AS BIGINT) AS price
      FROM orders WHERE o_orderkey % 4 < 3
    ),
    final AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey % 5 = 0 THEN price * 2 ELSE price END
               AS price
      FROM base WHERE o_orderkey % 7 <> 0
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(price) AS BIGINT) AS sum_price
    FROM final GROUP BY 1
    """,
    doc="Incremental materialized-view maintenance, end to end: a base "
    "vtable takes an upsert+delete batch, the CDF (manifest diff — "
    "only changed files read) feeds a signed-delta fold, and ONE "
    "key-equi upsert refreshes the aggregate table. The oracle is the "
    "from-scratch aggregate of the final base state: the refreshed MV "
    "must equal it bit-for-bit (abelian-group aggregates over longs). "
    "Refresh cost is change-volume-proportional at any base size.",
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.plans.scratch import scratch_path

    from delta_lake_pyspark_scd2_spark.operators.incremental import (
        aggregate_of,
        incremental_agg_refresh,
    )
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    orders = load_table(spark, sf_dir, "orders")
    base0 = orders.filter(F.col("o_orderkey") % 4 < 3).select(
        "o_orderkey",
        "o_orderpriority",
        F.floor("o_totalprice").cast("long").alias("price"),
    )
    root = scratch_path("mv_incremental_refresh")
    base = VersionedParquetTable.create(spark, base0, f"{root}/base")
    agg = VersionedParquetTable.create(
        spark,
        aggregate_of(base0, ["o_orderpriority"], ["price"], "n"),
        f"{root}/agg",
    )
    updates = base0.filter(
        (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0)
    ).withColumn("price", F.col("price") * 2)
    deletes = base0.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    base.upsert(updates, ["o_orderkey"], deletes=deletes)
    incremental_agg_refresh(
        base, agg, ["o_orderkey"], ["o_orderpriority"], ["price"], 0,
        count_col="n",
    )
    return agg.read().select(
        "o_orderpriority",
        F.col("n").cast("long"),
        F.col("price").cast("long").alias("sum_price"),
    )


@register(
    "s8_update_where",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey < 2000
                THEN CAST(floor(o_totalprice) AS BIGINT) * 3
                ELSE CAST(floor(o_totalprice) AS BIGINT) END AS price
    FROM orders WHERE o_orderkey % 4 < 3
    """,
    doc="UPDATE ... SET ... WHERE (Delta UPDATE analogue) at file "
    "granularity: data skipping narrows the rewrite to files whose "
    "stats admit a match, SET expressions evaluate over the old row, "
    "every other file is carried by reference. Oracle is the "
    "equivalent CASE projection of the final state.",
)
def s8_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.plans.scratch import scratch_path

    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 4 < 3).select(
        "o_orderkey",
        "o_orderstatus",
        F.floor("o_totalprice").cast("long").alias("price"),
    )
    path = scratch_path("s8_update_where")
    t = VersionedParquetTable.create(spark, base, path)
    t.update([("o_orderkey", "<", 2000)], {"price": "price * 3"})
    return t.read()


# (retired, round 9: `ann_pq_topk` — the sampled-codebook PQ row was
# rows-only while its trained twin `ann_pq_trained_topk` is value-hash
# oracled end to end; the registry keeps exactly one row per verified
# contract, and the sampled-training operator itself stays pytest-
# pinned in tests/test_llm_operators.py.)


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_after_view,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_after_click
    """,
    doc="Ordered funnel analysis (view -> click -> purchase, strictly "
    "increasing timestamps per user): each stage is a min-aggregation "
    "keyed on user joined against the previous stage — three shuffles "
    "all on the SAME user key, so a user-bucketed layout runs the "
    "whole funnel co-located.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    # one job: three single-row aggregates broadcast-joined — no
    # driver-side counts baked in as literals
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_after_view"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
    return nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))


@register(
    "cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort
      FROM events GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events
    )
    SELECT first.cohort,
           CAST(date_diff('day', first.cohort, act.w) / 7 AS INT)
             AS weeks_since,
           CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_users
    FROM act JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: cohort = each user's first active "
    "week, cells = distinct users active N weeks later. Two "
    "user-keyed aggregations and one join — the classic product-"
    "analytics rollup as plain relational composition.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).cast("date").alias("cohort")
    )
    act = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("w")
    ).distinct()
    weeks_since = (F.datediff(F.col("w"), F.col("cohort")) / 7).cast("int")
    return (
        act.join(first, "user_id")
        .groupBy("cohort", weeks_since.alias("weeks_since"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "graph_triangles",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey % 10 = 0
    ),
    edges AS (
      SELECT DISTINCT a.p AS p1, b.p AS p2
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM
              (SELECT DISTINCT p FROM (SELECT p1 AS p FROM edges
                UNION ALL SELECT p2 FROM edges))) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM edges e1
            JOIN edges e2 ON e2.p1 = e1.p2
            JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2)
             AS n_triangles
    """,
    doc="Triangle counting on the co-order part graph — the standard "
    "ordered-edge formulation (p1 < p2 < p3 by construction, so every "
    "triangle counts exactly once): two hash joins over the "
    "deduplicated edge list. Degree-based node reordering is the "
    "classic skew fix at web scale; the ordering predicate here "
    "already bounds each edge's join fan-out to higher-id neighbors.",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_partkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .distinct()
    )
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    edges = persist_tracked(edges)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = (
        e1.join(e2, F.col("e2.p1") == F.col("e1.p2"))
        .join(
            e3,
            (F.col("e3.p1") == F.col("e1.p1"))
            & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("p1").alias("p"))
        .unionAll(edges.select(F.col("p2").alias("p")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    ne = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return nodes.crossJoin(F.broadcast(ne)).crossJoin(F.broadcast(tris))


# (retired, round 9: `ann_ivfpq_topk` — superseded by the value-hash
# oracled `ann_ivfpq_trained_topk` / `ann_ivfpq_index_topk` pair and
# the adopted-config recall evals; composition semantics stay pinned
# in tests/test_llm_operators.py::test_ivfpq_composes_and_recalls.)


# PQ ADC oracle fragments (round-3 verdict stretch #8): with FIXED
# codebooks — the 32 lowest-id vectors' subvector slices — the whole
# encode→LUT→asymmetric-distance pipeline is SQL-expressible, so the
# ADC scoring path gets full value-hash oracles (k-means training
# itself stays rows-only in ann_pq_topk/ann_ivfpq_topk: it is
# genuinely iterative). 64-dim vectors, m=8 subspaces of 8 dims,
# 32 codes.
_PQ_HEAD = """
    v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    cb AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, ve AS cv
      FROM (SELECT * FROM v ORDER BY vec_id LIMIT 32)
    ),
    q AS (SELECT ve AS qv FROM v ORDER BY vec_id LIMIT 1),
    ms AS (SELECT unnest(range(8)) AS m),
    lut AS (
      SELECT ms.m, cb.code,
             list_distance(q.qv[ms.m*8+1:ms.m*8+8],
                           cb.cv[ms.m*8+1:ms.m*8+8]) ** 2 AS d2
      FROM q, ms, cb
    )
"""

# assignment + ADC over a candidate CTE named `cand(vec_id, ve)`
_PQ_TAIL = """
    assign AS (
      SELECT vec_id, m, code FROM (
        SELECT cand.vec_id, ms.m, cb.code,
               ROW_NUMBER() OVER (PARTITION BY cand.vec_id, ms.m
                 ORDER BY list_distance(cand.ve[ms.m*8+1:ms.m*8+8],
                                        cb.cv[ms.m*8+1:ms.m*8+8]) ASC,
                          cb.code ASC) AS rn
        FROM cand, ms, cb
      ) WHERE rn = 1
    ),
    adc AS (
      SELECT a.vec_id, round(sum(l.d2), 6) AS pq_dist
      FROM assign a JOIN lut l ON a.m = l.m AND a.code = l.code
      GROUP BY 1
    )
    SELECT vec_id, pq_dist FROM adc ORDER BY pq_dist ASC, vec_id ASC LIMIT 10
"""


# Trained-PQ oracle fragments: per-subspace k-means (2 unrolled Lloyd
# rounds, the kmeans_cluster technique composed over codebooks) under
# the shared contract — explicit LEFT-ASSOCIATED squared-L2 terms (both
# engines produce the bit-identical double), 9-dp-rounded distances
# with ties to the lower code, 6-dp-rounded means, empty codes keep
# their previous centroid.
def _pqt_d2(a: str, b: str) -> str:
    return " + ".join(
        f"({a}[{j}] - {b}[{j}]) * ({a}[{j}] - {b}[{j}])" for j in range(1, 9)
    )


def _pqt_iter(prev: str, a: str, g: str, new: str) -> str:
    mean = ", ".join(f"round(avg(s[{j}]), 6)" for j in range(1, 9))
    return f"""
    {a} AS (
      SELECT vec_id, m, s, code FROM (
        SELECT sub.vec_id, sub.m, sub.s, p.code,
               ROW_NUMBER() OVER (PARTITION BY sub.m, sub.vec_id
                 ORDER BY round({_pqt_d2('sub.s', 'p.c')}, 9) ASC,
                          p.code ASC) AS rn
        FROM sub JOIN {prev} p ON sub.m = p.m
      ) WHERE rn = 1
    ),
    {g} AS (SELECT m, code, list_value({mean}) AS c FROM {a} GROUP BY 1, 2),
    {new} AS (
      SELECT p.m, p.code, COALESCE({g}.c, p.c) AS c
      FROM {prev} p LEFT JOIN {g} ON p.m = {g}.m AND p.code = {g}.code
    )"""


# training only: v/ms/samp -> c2 (the trained per-subspace codebooks)
_PQT_TRAIN = f"""
    v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    ms AS (SELECT CAST(unnest(range(8)) AS INTEGER) AS m),
    samp AS (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT 64),
    sub AS (
      SELECT samp.vec_id, ms.m, samp.ve[ms.m*8+1:ms.m*8+8] AS s
      FROM samp, ms
    ),
    dd AS (SELECT m, s, min(vec_id) AS fid FROM sub GROUP BY 1, 2),
    init AS (
      SELECT m, s AS c, rn - 1 AS code FROM (
        SELECT m, s, ROW_NUMBER() OVER (PARTITION BY m ORDER BY fid) AS rn
        FROM dd
      ) WHERE rn <= 16
    ),{_pqt_iter('init', 'a1', 'g1', 'c1')},{_pqt_iter('c1', 'a2', 'g2', 'c2')}
"""

# the lowest-id vector's LUT (single-query search form)
_PQT_QUERY_LUT = f"""
    q AS (SELECT ve AS qv FROM v ORDER BY vec_id LIMIT 1),
    qsub AS (SELECT ms.m, q.qv[ms.m*8+1:ms.m*8+8] AS s FROM q, ms),
    lut AS (
      SELECT c2.m, c2.code, round({_pqt_d2('qsub.s', 'c2.c')}, 9) AS d2
      FROM qsub JOIN c2 ON qsub.m = c2.m
    )
"""

_PQT_HEAD = f"""{_PQT_TRAIN},{_PQT_QUERY_LUT}"""

# assignment + ADC over a candidate CTE named `cand(vec_id, ve)`
_PQT_TAIL = f"""
    subc AS (
      SELECT cand.vec_id, ms.m, cand.ve[ms.m*8+1:ms.m*8+8] AS s
      FROM cand, ms
    ),
    assign AS (
      SELECT vec_id, m, code FROM (
        SELECT subc.vec_id, subc.m, c2.code,
               ROW_NUMBER() OVER (PARTITION BY subc.vec_id, subc.m
                 ORDER BY round({_pqt_d2('subc.s', 'c2.c')}, 9) ASC,
                          c2.code ASC) AS rn
        FROM subc JOIN c2 ON subc.m = c2.m
      ) WHERE rn = 1
    ),
    adc AS (
      SELECT a.vec_id, round(sum(l.d2), 6) AS pq_dist
      FROM assign a JOIN lut l ON a.m = l.m AND a.code = l.code
      GROUP BY 1
    )
    SELECT vec_id, pq_dist FROM adc ORDER BY pq_dist ASC, vec_id ASC LIMIT 10
"""


@register(
    "ann_pq_trained_topk",
    oracle=f"""
    WITH {_PQT_HEAD},
    cand AS (SELECT vec_id, ve FROM v),
    {_PQT_TAIL}
    """,
    doc="PQ ADC top-k with K-MEANS-TRAINED codebooks, fully value-hash "
    "checked (r3/r4 carried stretch closed): per-subspace Lloyd (2 "
    "rounds, 64-vector sample, k=16) runs under the kmeans_cluster "
    "determinism contract — left-associated squared-L2 terms are "
    "bit-identical across engines, distances round to 9 dp with ties "
    "to the lower code, means round to 6 dp, empty codes keep their "
    "previous centroid — so the DuckDB oracle unrolls the SAME "
    "training as CTEs. Encode is pure JVM expressions "
    "(pq_encode_expr), no Arrow hop.",
)
def ann_pq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    books = S.pq_train_contract(
        emb, m_subspaces=8, k_codes=16, sample=64, iters=2
    )
    codes = S.pq_encode_expr(emb, books)
    q = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    return S.pq_adc_topk_contract(codes, books, [float(x) for x in q], k=10)


# shared by ann_ivfpq_trained_topk (in-flight encode) and
# ann_ivfpq_index_topk (stored-codes read path): the persistent index
# at the same (cents, books, nprobe) must produce byte-identical
# results, so it shares the oracle verbatim
_IVFPQ_TRAINED_ORACLE = f"""
    WITH {_PQT_HEAD},
    cents AS (
      SELECT vec_id AS centroid_id, ve AS cv2 FROM v
      WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 12
    ),
    assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY {_COS.format(a='v.ve', b='c.cv2')} DESC,
                          c.centroid_id ASC) AS rn
        FROM v, cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT centroid_id FROM (
        SELECT c.centroid_id,
               ROW_NUMBER() OVER (ORDER BY
                 {_COS.format(a='q.qv', b='c.cv2')} DESC,
                 c.centroid_id ASC) AS rn
        FROM q, cents c
      ) WHERE rn <= 3
    ),
    cand AS (
      SELECT v.vec_id, v.ve FROM v
      JOIN assigned a USING (vec_id)
      JOIN probes p ON a.centroid_id = p.centroid_id
    ),
    {_PQT_TAIL}
    """


@register(
    "ann_ivfpq_trained_topk",
    oracle=_IVFPQ_TRAINED_ORACLE,
    doc="IVF-PQ ADC top-k with k-means-trained codebooks, value-hash "
    "checked end-to-end: nprobe=3 cosine bucket restriction over the "
    "trained-PQ scoring path — the FAISS IVFx,PQy shape with BOTH "
    "stages (training and search) oracle-verified.",
)
def ann_ivfpq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % 37 == 0).orderBy("vec_id").limit(12)
    books = S.pq_train_contract(
        emb, m_subspaces=8, k_codes=16, sample=64, iters=2
    )
    q = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    assigned = S.assign_to_centroids(emb, cents)
    # the ONE cross-engine probe contract (left-assoc IEEE dot, 6-dp
    # rounding, lower-id ties) lives in similarity.probe_centroids
    probe_ids = S.probe_centroids(list(q), cents, 3)
    # assignment output carries the corpus columns — filter it
    # directly instead of joining the corpus back on (round-10)
    bucket = assigned.filter(F.col("centroid_id").isin(probe_ids))
    codes = S.pq_encode_expr(bucket, books)
    return S.pq_adc_topk_contract(codes, books, [float(x) for x in q], k=10)


@register(
    "ann_ivfpq_index_topk",
    oracle=_IVFPQ_TRAINED_ORACLE,
    doc="Persistent IVF-PQ index READ path, value-hash checked "
    "(round-6 directive #4: ivfpq_search_index was pytest-proven but "
    "no oracle row ever exercised stored-codes search): builds the "
    "trained-contract index into process scratch (contract encoder "
    "pq_encode_expr — stored codes must match the arithmetic the "
    "oracle unrolls), then answers the query from the TABLE: "
    "manifest-pruned read of only the 3 probed centroid partitions, "
    "ADC fold over the stored codes, never touching a raw vector or "
    "re-encoding. Shares ann_ivfpq_trained_topk's oracle verbatim — "
    "the persisted index at the same (cents, books, nprobe) must be "
    "indistinguishable from the in-flight path.",
)
def ann_ivfpq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import similarity as S
    from delta_lake_pyspark_scd2_spark.plans.scratch import scratch_path

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % 37 == 0).orderBy("vec_id").limit(12)
    books = S.pq_train_contract(
        emb, m_subspaces=8, k_codes=16, sample=64, iters=2
    )
    index = S.build_ivfpq_index(
        emb,
        cents,
        books,
        scratch_path("ann_ivfpq_index_topk"),
        encoder=S.pq_encode_expr,
    )
    q = [
        float(x)
        for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    ]
    probe_ids = S.probe_centroids(q, cents, 3)
    stored = index.read_partitions(
        [{"centroid_id": str(c)} for c in sorted(probe_ids)]
    )
    return S.pq_adc_topk_contract(stored, books, q, k=10)


@register(
    "ann_pq_adc_topk",
    oracle=f"""
    WITH {_PQ_HEAD},
    cand AS (SELECT vec_id, ve FROM v),
    {_PQ_TAIL}
    """,
    doc="PQ asymmetric-distance top-k with FIXED codebooks (the 32 "
    "lowest-id vectors' slices): same Arrow-batched encode and JVM "
    "LUT-fold as ann_pq_topk, but the codebook is a deterministic "
    "function of the table, so the full encode->LUT->ADC pipeline is "
    "value-hash checked against the SQL oracle — the correctness "
    "proof for the scoring path the k-means variant reuses.",
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    books = S.pq_fixed_codebooks(emb, m_subspaces=8, k_codes=32)
    codes = S.pq_encode(emb, books)
    q = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    return S.pq_topk(codes, books, list(q), k=10)


@register(
    "ann_ivfpq_adc_topk",
    oracle=f"""
    WITH {_PQ_HEAD},
    cents AS (
      SELECT vec_id AS centroid_id, ve AS cv2 FROM v
      WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 12
    ),
    assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY {_COS.format(a='v.ve', b='c.cv2')} DESC,
                          c.centroid_id ASC) AS rn
        FROM v, cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT centroid_id FROM (
        SELECT c.centroid_id,
               ROW_NUMBER() OVER (ORDER BY
                 {_COS.format(a='q.qv', b='c.cv2')} DESC,
                 c.centroid_id ASC) AS rn
        FROM q, cents c
      ) WHERE rn <= 3
    ),
    cand AS (
      SELECT v.vec_id, v.ve FROM v
      JOIN assigned a USING (vec_id)
      JOIN probes p ON a.centroid_id = p.centroid_id
    ),
    {_PQ_TAIL}
    """,
    doc="IVF-PQ ADC top-k with fixed codebooks: nprobe=3 cosine "
    "bucket restriction times PQ LUT scoring, all value-hash checked "
    "— the composed index's oracle twin (ann_ivfpq_topk keeps k-means "
    "codebooks and the rows-only check).",
)
def ann_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % 37 == 0).orderBy("vec_id").limit(12)
    books = S.pq_fixed_codebooks(emb, m_subspaces=8, k_codes=32)
    q = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    return S.ivfpq_topk(emb, cents, books, list(q), k=10, nprobe=3)


@register(
    "text_novelty",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    first AS (
      SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN first.first_doc = sh.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           round(CAST(sum(CASE WHEN first.first_doc = sh.doc_id
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS novelty_frac
    FROM sh JOIN first USING (shingle)
    GROUP BY 1
    """,
    doc="Corpus novelty curve: per doc, the fraction of its distinct "
    "3-word shingles whose FIRST corpus occurrence (min doc_id) is "
    "this doc — the diversity signal curation pipelines use to rank "
    "marginal documents. First occurrence = window-min over the "
    "shingle partition: ONE shuffle of (doc_id, shingle) serves both "
    "the min and the novelty flag, then a doc-keyed aggregation — "
    "never corpus text on the wire.",
    bench=True,  # round-3 verdict #7: regressions on the round-3
    # analytics surface must show up in bench medians, not just
    # correctness
)
def text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # spread before the shingle HOF: transform/slice lambdas are
    # interpreted, not codegen'd, and a compact parquet scan would pin
    # them to a handful of cores (measured 4.3s -> 0.9s at sf0.1)
    grams = dedup._spread(docs, "doc_id", jvm_only=True).select(
        "doc_id",
        F.explode(dedup.word_shingles(F.col("text"), 3)).alias("shingle"),
    )
    # first occurrence as a window-min over the shingle partition: ONE
    # shuffle of the (doc_id, shingle) table serves both the min and
    # the per-row novelty flag — the groupBy+join-back form shuffled
    # the shingle table twice and needed a persist to share the explode
    first = F.min("doc_id").over(Window.partitionBy("shingle"))
    novel = (first == F.col("doc_id")).cast("int")
    return (
        grams.withColumn("__novel", novel)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("__novel").cast("long").alias("n_novel"),
            F.round(
                F.sum("__novel") / F.count(F.lit(1)), 6
            ).alias("novelty_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed clustering
# ---------------------------------------------------------------------------


def _kmeans_ctes(k: int, iters: int, dim: int, where: str = "") -> list:
    """Unrolled Lloyd's in SQL: one (score → assign → recenter) CTE
    block per iteration plus the final assignment — exactly the
    computation operators/clustering.py runs, with the shared 6-dp
    rounding on scores and means so both engines chain bit-identical
    centroid literals. Returns the CTE list (ending with centroids
    ``c{iters}`` and assignment ``a{iters}``) so compositions — e.g.
    the trained-IVF ANN oracle — can build on the trained model.
    ``where`` restricts the TRAINING corpus ``v`` (incremental
    variants train on the stored subset only); default trains on
    everything, byte-identical to the pre-parameter SQL."""
    cos = (
        "round(list_dot_product(v.ve, c.cv) / "
        "(sqrt(list_dot_product(v.ve, v.ve)) * "
        "sqrt(list_dot_product(c.cv, c.cv))), 6)"
    )
    parts = [
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings"
        + ((" " + where) if where else "")
        + ")",
        f"c0 AS (SELECT vec_id AS cid, ve AS cv FROM v ORDER BY vec_id LIMIT {k})",
    ]
    for it in range(iters + 1):
        parts.append(
            f"s{it} AS (SELECT v.vec_id, c.cid, {cos} AS sim "
            f"FROM v CROSS JOIN c{it} c)"
        )
        parts.append(
            f"a{it} AS (SELECT vec_id, cid FROM ("
            "SELECT vec_id, cid, row_number() OVER "
            "(PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn "
            f"FROM s{it}) WHERE rn = 1)"
        )
        if it < iters:
            parts.append(
                f"m{it} AS (SELECT a{it}.cid, t.i, round(avg(v.ve[t.i]), 6) AS m "
                f"FROM a{it} JOIN v USING (vec_id), "
                f"(SELECT UNNEST(range(1, {dim + 1})) AS i) t "
                f"GROUP BY a{it}.cid, t.i)"
            )
            parts.append(
                f"c{it + 1} AS (SELECT c{it}.cid, coalesce(mm.cv, c{it}.cv) AS cv "
                f"FROM c{it} LEFT JOIN (SELECT cid, array_agg(m ORDER BY i) AS cv "
                f"FROM m{it} GROUP BY cid) mm USING (cid))"
            )
    return parts


def _kmeans_oracle(k: int, iters: int, dim: int) -> str:
    parts = _kmeans_ctes(k, iters, dim)
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, cid AS cluster_id FROM a{iters}\n    "
    )


@register(
    "kmeans_cluster",
    oracle=_kmeans_oracle(k=8, iters=2, dim=64),
    doc="Distributed spherical k-means (k=8, 2 Lloyd rounds) over the "
    "full embeddings corpus: per iteration ONE broadcast-centroid "
    "assignment + ONE map-side-combined mean aggregation (shuffle "
    "volume O(partitions*k*dim), driver state = the k*dim model). "
    "Value-hash checked against a fully unrolled SQL Lloyd's — the "
    "iterative training itself is oracle-verified, not just the final "
    "assignment.",
)
def kmeans_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.kmeans_cluster(emb, k=8, iters=2, dim=64)


_SEMDEDUP_CTES = ",\n    ".join(_kmeans_ctes(8, 2, 64))


@register(
    "dedup_semantic",
    bench=True,  # round-8 verdict #3: track the heavy new families
    oracle=f"""
    WITH {_SEMDEDUP_CTES},
    dropd AS (
      SELECT DISTINCT b.vec_id AS drop_id
      FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN v va ON va.vec_id = a.vec_id
      JOIN v vb ON vb.vec_id = b.vec_id
      WHERE {_COS.format(a='va.ve', b='vb.ve')} >= 0.3
    )
    SELECT a2.vec_id, a2.cid AS cluster_id,
           CAST(CASE WHEN d.drop_id IS NULL THEN 1 ELSE 0 END AS INT)
             AS is_kept
    FROM a2 LEFT JOIN dropd d ON a2.vec_id = d.drop_id
    """,
    doc="SemDeDup-style semantic deduplication (Abbas et al. 2023): "
    "k-means-cluster the embeddings (the kmeans_cluster contract, "
    "training oracle-verified via the same unrolled Lloyd CTEs), then "
    "drop any row with a lower-id same-CLUSTER neighbor at rounded "
    "cosine >= 0.3 — the O(n^2) cosine scan becomes k locally-"
    "quadratic bucket joins shuffling on cluster_id, the blocked "
    "shape every LSH dedup here uses. One row per input with an "
    "is_kept flag, so drop-rate monitoring is one aggregation away. "
    "The paper-faithful keep-outliers rule (keep the member FARTHER "
    "from its centroid) ships as semantic_dedup(keep='centroid_far'), "
    "pytest-pinned.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.semantic_dedup(
        emb, k=8, iters=2, dim=64, threshold=0.3
    )


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
    ),
    tf AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c
      FROM words WHERE word <> '' GROUP BY 1
    ),
    r AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word ASC) AS rnk
      FROM tf
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
             CAST(count(*) AS BIGINT) AS vocab_size
      FROM tf
    )
    SELECT CAST(k.top_k AS BIGINT) AS top_k,
           tot.vocab_size, tot.total_tokens,
           round(CAST(sum(CASE WHEN r.rnk <= k.top_k THEN r.c ELSE 0 END)
                      AS DOUBLE) / min(tot.total_tokens), 6)
             AS covered_frac
    FROM r CROSS JOIN tot
    CROSS JOIN (VALUES (10), (100), (1000)) k(top_k)
    GROUP BY 1, 2, 3
    """,
    doc="Vocabulary coverage curve — the tokenizer-sizing signal a "
    "pretraining pipeline reads before fixing a vocab: the fraction "
    "of all token occurrences covered by the top-K most frequent "
    "terms (K = 10/100/1000). Term ranks via operators/ranking."
    "distributed_total_rank over the shared word_counts tokenizer "
    "contract — no single-task vocabulary sort (a web-scale corpus "
    "has a billion-term vocabulary); coverage at each K is one "
    "conditional aggregation over exact BIGINT sums, divided once, "
    "so the 6-dp rounding is engine-stable.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.ranking import (
        distributed_total_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    tf = text.word_counts(docs)
    ranked = distributed_total_rank(tf, "c", ["word"], descending=True)
    tot = tf.agg(
        F.sum("c").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    ks = spark.createDataFrame([(10,), (100,), (1000,)], "top_k long")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("top_k")
        .agg(
            F.sum(
                F.when(F.col("__rank") <= F.col("top_k"), F.col("c"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("__cov")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "top_k",
            "vocab_size",
            "total_tokens",
            F.round(
                F.col("__cov").cast("double") / F.col("total_tokens"), 6
            ).alias("covered_frac"),
        )
    )


@register(
    "dedup_semantic_canonical",
    oracle=f"""
    WITH RECURSIVE {_SEMDEDUP_CTES},
    sp AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN v va ON va.vec_id = a.vec_id
      JOIN v vb ON vb.vec_id = b.vec_id
      WHERE {_COS.format(a='va.ve', b='vb.ve')} >= 0.3
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM sp
      UNION SELECT id_b, id_a FROM sp
    ),
    reach(node, lab) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, MIN(lab) AS cluster_id FROM reach GROUP BY node)
    SELECT vec_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           (cluster_id = vec_id) AS is_canonical
    FROM (
      SELECT e.vec_id, COALESCE(c.cluster_id, e.vec_id) AS cluster_id
      FROM v e LEFT JOIN comp c ON e.vec_id = c.node
    )
    """,
    doc="Semantic near-dup CLUSTERING: the SemDeDup within-cluster "
    "pair graph (dedup.semantic_pairs — kmeans-bucketed, locally "
    "quadratic) feeds the same distributed connected-components used "
    "by dedup_cluster_canonical, labeling every vector with its "
    "component's min id; the canonical keeper is the label owner. "
    "Completes the semantic family to parity with the minhash family "
    "(pairs -> incremental -> streaming -> canonical clustering). "
    "Oracle recomputes components with a recursive CTE over the "
    "unrolled-Lloyd pair set — iterative training AND iterative "
    "clustering both value-hash proven.",
)
def dedup_semantic_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import graph

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.semantic_pairs(
        emb, k=8, iters=2, dim=64, threshold=0.3
    ).select("id_a", "id_b")
    return graph.cluster_documents(emb, pairs, id_col="vec_id")


_SEMINC_CTES = ",\n    ".join(
    _kmeans_ctes(8, 2, 64, where="WHERE vec_id % 5 < 3")
)


@register(
    "dedup_incremental_semantic",
    oracle=f"""
    WITH {_SEMINC_CTES},
    vall AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    sall AS (
      SELECT vall.vec_id, c.cid,
             {_COS.format(a='vall.ve', b='c.cv')} AS sim
      FROM vall CROSS JOIN c2 c
    ),
    aall AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER
          (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
        FROM sall
      ) WHERE rn = 1
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_COS.format(a='va.ve', b='vb.ve')} AS cos_sim
    FROM aall a
    JOIN aall b ON a.cid = b.cid AND a.vec_id < b.vec_id
    JOIN vall va ON va.vec_id = a.vec_id
    JOIN vall vb ON vb.vec_id = b.vec_id
    WHERE {_COS.format(a='va.ve', b='vb.ve')} >= 0.3
      AND (a.vec_id % 5 >= 3 OR b.vec_id % 5 >= 3)
    """,
    doc="Incremental SemDeDup against a PERSISTED cluster index (the "
    "semantic-family twin of dedup_incremental_lsh): the stored "
    "corpus (vec_id%5<3) lives as (id, vector, cluster_id) rows "
    "partitioned by cluster_id in a versioned table, centroids "
    "trained on the stored subset only (kmeans contract); an "
    "incoming batch (vec_id%5>=3) assigns itself to the stored "
    "centroids, reads ONLY its clusters' partitions (manifest-"
    "pruned), and emits within-cluster near-dup pairs involving a "
    "new vector — ingest cost O(batch + probed partitions). Oracle: "
    "the full stored-trained semantic pair set restricted to pairs "
    "with a new id, proving the index path finds exactly the same "
    "candidates.",
)
def dedup_incremental_semantic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.clustering import kmeans_fit
    from delta_lake_pyspark_scd2_spark.plans.scratch import scratch_path

    emb = load_table(spark, sf_dir, "embeddings")
    stored = emb.filter(F.col("vec_id") % 5 < 3)
    batch = emb.filter(F.col("vec_id") % 5 >= 3)
    cents = kmeans_fit(stored, k=8, iters=2, dim=64)
    index = dedup.build_semantic_index(
        stored, cents, scratch_path("dedup_incremental_semantic")
    )
    return dedup.semantic_dedup_incremental(
        index, batch, cents, threshold=0.3
    )


@register(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
    ),
    mins AS (
      SELECT doc_id,
           {_MIN_EXPRS}
      FROM hashed GROUP BY doc_id
    ),
    banded AS (
{_BAND_SELECTS}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id
    WHERE a.doc_id % 5 >= 3 OR b.doc_id % 5 >= 3
    """,
    doc="Incremental dedup against a PERSISTED LSH index: the corpus' "
    "bucket table (docs with doc_id%5<3) lives in a versioned table; "
    "an incoming batch (doc_id%5>=3) computes its own signatures and "
    "probes the stored buckets (batch side broadcast) plus itself -- "
    "ingest cost O(batch), corpus text never rescanned. Oracle: the "
    "full-corpus banded self-join restricted to pairs involving a new "
    "doc, proving the index path finds exactly the same candidates.",
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.plans.scratch import scratch_path
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    docs = load_table(spark, sf_dir, "documents")

    def buckets(d: DataFrame) -> DataFrame:
        return dedup.lsh_band_buckets(
            dedup.minhash_signatures(d, num_hashes=_NUM_HASHES, shingle_n=3),
            bands=_BANDS,
            rows_per_band=_ROWS_PER_BAND,
        )

    index = VersionedParquetTable.create(
        spark,
        buckets(docs.filter(F.col("doc_id") % 5 < 3)),
        scratch_path("dedup_incremental_lsh"),
    )
    return dedup.lsh_incremental_pairs(
        index.read(), buckets(docs.filter(F.col("doc_id") % 5 >= 3))
    )


@register(
    "text_pmi_topk",
    oracle=f"""
    WITH words AS (
      SELECT DISTINCT doc_id, w AS word FROM (
        SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w
        FROM documents)
      WHERE w <> ''
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM words),
    dfreq AS (SELECT word, COUNT(*) AS dfw FROM words GROUP BY word),
    pairs AS (
      SELECT a.word AS word_a, b.word AS word_b, COUNT(*) AS n_pair
      FROM words a JOIN words b
        ON a.doc_id = b.doc_id AND a.word < b.word
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    )
    SELECT word_a, word_b, n_pair,
           round(ln(CAST(n_pair AS DOUBLE) * n.n_docs
                    / (da.dfw * db.dfw)), 6) AS pmi
    FROM pairs
    JOIN dfreq da ON word_a = da.word
    JOIN dfreq db ON word_b = db.word
    CROSS JOIN n
    ORDER BY pmi DESC, word_a, word_b LIMIT 20
    """,
    doc="Top-k collocations by document-level PMI: explode -> distinct "
    "(doc, word), pair join pre-filtered to df>=5 words "
    "(correctness-preserving prune of the per-doc fan-out), document "
    "frequencies and corpus size re-enter as broadcast joins. Oracle "
    "is the unpruned pair join -- proving the frequent-word prefilter "
    "loses nothing.",
)
def text_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.pmi_collocations(docs, min_pair_docs=5, k=20)


@register(
    "text_pmi_window",
    oracle=f"""
    WITH ws AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
    ),
    tok AS (
      SELECT doc_id, t.i AS pos, w[t.i] AS word
      FROM ws, (SELECT UNNEST(range(1, (SELECT MAX(len(w)) + 1 FROM ws))) AS i) t
      WHERE t.i <= len(w) AND w[t.i] <> ''
    ),
    n AS (SELECT COUNT(*) AS n_toks FROM tok),
    counts AS (SELECT word, COUNT(*) AS cw FROM tok GROUP BY word),
    pairs AS (
      SELECT least(a.word, b.word) AS word_a,
             greatest(a.word, b.word) AS word_b,
             COUNT(*) AS n_pair
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id
       AND b.pos BETWEEN a.pos + 1 AND a.pos + 5
       AND a.word <> b.word
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    )
    SELECT word_a, word_b, n_pair,
           round(ln(CAST(n_pair AS DOUBLE) * n.n_toks
                    / (ca.cw * cb.cw)), 6) AS pmi
    FROM pairs
    JOIN counts ca ON word_a = ca.word
    JOIN counts cb ON word_b = cb.word
    CROSS JOIN n
    ORDER BY pmi DESC, word_a, word_b LIMIT 20
    """,
    doc="Position-window PMI collocations (w=5): the pairing is an "
    "EQUI-join on (doc, pos+d) after an offset explode -- fan-out "
    "exactly w x tokens at any document length, never the doc-level "
    "variant's quadratic blow-up; occurrence counts and corpus size "
    "re-enter broadcast. Oracle uses an unpruned BETWEEN join over "
    "token positions, proving the offset-equi-join formulation and "
    "the rare-word prefilter exact.",
)
def text_pmi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.pmi_collocations_window(docs, window=5, min_pair=5, k=20)


@register(
    "sketch_mergeable_vocab",
    oracle="""
    WITH words AS (
      SELECT source,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
      FROM documents
    )
    SELECT source, COUNT(DISTINCT word) AS exact_vocab,
           TRUE AS union_matches_whole, TRUE AS within_5pct
    FROM words WHERE word <> '' GROUP BY source
    """,
    doc="Mergeable-sketch maintenance: per-ingest-batch HLL sketches "
    "(datasketches hll_sketch_agg, lgK=12) whose hll_union must "
    "EXACTLY reproduce the whole-corpus sketch estimate -- the "
    "pattern that answers corpus-wide distinct counts from stored "
    "per-partition sketches without rescanning (the MV-refresh "
    "analogue for non-abelian stats). Sketch estimates are "
    "implementation-defined, so the oracle checks the REDUCED claims: "
    "exact distinct counts, union==whole, and estimate within 5% of "
    "exact -- a real value-hash gate over the merge property, unlike "
    "rows-only approx_sketches.",
)
def sketch_mergeable_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source",
        (F.col("doc_id") % 4).alias("__part"),
        F.explode(
            F.split(text.normalize_text(F.col("text")), " ")
        ).alias("word"),
    ).filter(F.col("word") != "")
    parts = words.groupBy("source", "__part").agg(
        F.hll_sketch_agg("word", F.lit(12)).alias("__sk")
    )
    union_est = parts.groupBy("source").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__est_u")
    )
    whole = words.groupBy("source").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("word", F.lit(12))).alias(
            "__est_w"
        ),
        F.countDistinct("word").alias("exact_vocab"),
    )
    return whole.join(union_est, "source").select(
        "source",
        "exact_vocab",
        (F.col("__est_u") == F.col("__est_w")).alias("union_matches_whole"),
        (
            F.abs(F.col("__est_u") - F.col("exact_vocab"))
            <= 0.05 * F.col("exact_vocab")
        ).alias("within_5pct"),
    )


def _pagerank_oracle(iters: int, damping: float = 0.85) -> str:
    """Unrolled power iteration: one contribution-sum CTE per round
    with the shared 6-dp rounding, over the same co-order part graph
    as graph_triangles."""
    parts = [
        """items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey % 10 = 0
    )""",
        """edges AS (
      SELECT DISTINCT a.p AS p1, b.p AS p2
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
    )""",
        "bi AS (SELECT p1 AS u, p2 AS v FROM edges "
        "UNION ALL SELECT p2 AS u, p1 AS v FROM edges)",
        "deg AS (SELECT u, COUNT(*) AS d FROM bi GROUP BY u)",
        "n AS (SELECT COUNT(DISTINCT u) AS n_nodes FROM bi)",
        "r0 AS (SELECT u AS node, round(1.0 / n.n_nodes, 6) AS rank "
        "FROM deg, n)",
    ]
    for it in range(iters):
        parts.append(
            f"r{it + 1} AS (SELECT b.v AS node, "
            f"round((1.0 - {damping}) / n.n_nodes + {damping} * "
            f"SUM(r.rank / deg.d), 6) AS rank "
            f"FROM bi b JOIN r{it} r ON b.u = r.node "
            "JOIN deg ON b.u = deg.u CROSS JOIN n "
            "GROUP BY b.v, n.n_nodes)"
        )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, rank FROM r{iters}\n    "
    )


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(iters=3),
    doc="PageRank (3 power-iteration rounds, d=0.85) on the co-order "
    "part graph: per round one vertex-keyed join + one dst-keyed "
    "map-side-combined sum -- state is a (node, rank) row per vertex, "
    "partitioning reused across rounds, nothing graph-sized on the "
    "driver. The oracle unrolls the full power iteration under the "
    "shared 6-dp rounding, so the iterative computation is value-hash "
    "checked like kmeans_cluster.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_partkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p"))
        )
        .select(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .distinct()
    )
    return pagerank(edges, "p1", "p2", iters=3)


@register(
    "source_overlap_matrix",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
    ),
    mins AS (
      SELECT doc_id,
           {_MIN_EXPRS}
      FROM hashed GROUP BY doc_id
    ),
    banded AS (
{_BAND_SELECTS}
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           COUNT(*) AS n_pairs
    FROM prs
    JOIN documents da ON id_a = da.doc_id
    JOIN documents db ON id_b = db.doc_id
    GROUP BY 1, 2
    """,
    doc="Cross-source near-duplicate overlap matrix: LSH candidate "
    "pairs labeled with each member's source, aggregated per "
    "unordered source pair -- the report a curation team reads before "
    "deciding which crawl to drop. The pair list carries ids only; "
    "source labels join in on the id key after candidate generation, "
    "so the metadata join is pair-sized, not corpus-sized.",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(docs, num_hashes=_NUM_HASHES, shingle_n=3),
        bands=_BANDS,
        rows_per_band=_ROWS_PER_BAND,
    )
    src = docs.select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("__sa")
    )
    sb = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("__sb")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least(F.col("__sa"), F.col("__sb")).alias("source_a"),
            F.greatest(F.col("__sa"), F.col("__sb")).alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def _ivf_trained_oracle(k: int, iters: int, dim: int) -> str:
    """kmeans-trained centroids (the unrolled Lloyd CTEs) feeding the
    single-probe IVF search — the composed index is end-to-end
    SQL-expressible, so training AND search are value-hash checked."""
    parts = _kmeans_ctes(k, iters, dim)
    parts += [
        f"""probes AS (
      SELECT a.vec_id AS query_id, a.cid AS centroid_id, v.ve AS qv
      FROM a{iters} a JOIN v ON v.vec_id = a.vec_id
      WHERE a.vec_id >= 490
    )""",
        f"""scored AS (
      SELECT p.query_id, a.vec_id, {_COS.format(a='p.qv', b='v2.ve')} AS cos_sim
      FROM probes p
      JOIN a{iters} a ON a.cid = p.centroid_id
      JOIN v v2 ON v2.vec_id = a.vec_id
      WHERE a.vec_id <> p.query_id
    )""",
    ]
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + """
    SELECT query_id, vec_id AS neighbor_id, rank, cos_sim FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """
    )


@register(
    "ann_ivf_trained_topk",
    oracle=_ivf_trained_oracle(k=8, iters=2, dim=64),
    doc="IVF ANN with a TRAINED coarse quantizer: distributed k-means "
    "(kmeans_cluster's exact computation) supplies the centroids, "
    "then the single-probe bucket search runs against them -- the "
    "FAISS IVF-train-then-search shape with both stages value-hash "
    "checked through one composed oracle (vs ann_ivf_topk's fixed "
    "lowest-id centroids and ann_ivfpq's rows-only k-means).",
)
def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    cents = clustering.kmeans_fit(emb, k=8, iters=2, dim=64)
    queries = emb.filter(F.col("vec_id") >= 490)
    return similarity.ivf_topk(emb, cents, queries, k=5)


@register(
    "split_leakage_audit",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
    ),
    mins AS (
      SELECT doc_id,
           {_MIN_EXPRS}
      FROM hashed GROUP BY doc_id
    ),
    banded AS (
{_BAND_SELECTS}
    ),
    splits AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 < 9
                  THEN 'train' ELSE 'test' END AS split
      FROM documents
    ),
    prs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id
    )
    SELECT sb.split AS split_a, sa.split AS split_b,
           COUNT(*) AS n_pairs
    FROM prs
    JOIN splits sa ON id_a = sa.doc_id
    JOIN splits sb ON id_b = sb.doc_id
    WHERE sa.split <> sb.split
    GROUP BY 1, 2
    UNION ALL
    SELECT 'total' AS split_a, 'cross' AS split_b, COUNT(*) AS n_pairs
    FROM prs
    JOIN splits sa ON id_a = sa.doc_id
    JOIN splits sb ON id_b = sb.doc_id
    WHERE sa.split <> sb.split
    """,
    doc="Train/test split leakage audit: docs deal into a 90/10 split "
    "by content-independent keyed hash (reproducible, cluster-shape "
    "independent), then LSH candidate pairs crossing the boundary are "
    "counted -- the eval-integrity check run before any held-out "
    "measurement (a test doc near-duplicating a train doc inflates "
    "eval). Pair list carries ids only; split labels join pair-sized. "
    "Ordered (split_a, split_b) kept separate so the report shows "
    "which side the lower-id member sits on.",
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("split:"), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
        < 9,
        F.lit("train"),
    ).otherwise(F.lit("test"))
    splits = docs.select("doc_id", split.alias("split"))
    pairs = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(docs, num_hashes=_NUM_HASHES, shingle_n=3),
        bands=_BANDS,
        rows_per_band=_ROWS_PER_BAND,
    )
    sa = splits.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("__pa")
    )
    sb = splits.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("__pb")
    )
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    cross = persist_tracked(
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("__pa") != F.col("__pb"))
    )
    per_dir = cross.groupBy(
        F.col("__pb").alias("split_a"), F.col("__pa").alias("split_b")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))
    total = cross.agg(F.count(F.lit(1)).alias("n_pairs")).select(
        F.lit("total").alias("split_a"),
        F.lit("cross").alias("split_b"),
        "n_pairs",
    )
    return per_dir.unionByName(total)


@register(
    "sample_weighted",
    oracle="""
    SELECT doc_id, n_chars, wkey FROM (
      SELECT doc_id, n_chars,
             round(CAST(n_chars AS DOUBLE) /
                   -ln((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                       / 4294967296.0), 6) AS wkey
      FROM documents
    ) ORDER BY wkey DESC, doc_id ASC LIMIT 50
    """,
    doc="Weighted sampling without replacement (Efraimidis-Spirakis "
    "A-ES, weight = n_chars): keyed md5 draw -> rank by the "
    "order-equivalent w/-ln(u) -- exact weighted sample, reproducible "
    "across engines and cluster shapes (rand(seed) is placement-"
    "dependent). One hash+log per row map-side; the only movement is "
    "the TakeOrdered top-k.",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.mixture import (
        weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(
        docs.select("doc_id", "n_chars"), F.col("n_chars"), k=50
    )


@register(
    "mine_hard_negatives",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
      FROM embeddings WHERE vec_id < 5
    ),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv, label FROM embeddings),
    scored AS (
      SELECT query_id, vec_id, label, {_COS.format(a='qv', b='cv')} AS cos_sim
      FROM c, q WHERE label <> ql
    )
    SELECT query_id, vec_id AS negative_id, label AS negative_label,
           rank, cos_sim FROM (
      SELECT query_id, vec_id, label, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    doc="Hard-negative mining for contrastive training: per query the "
    "5 most-similar vectors with a DIFFERENT label (the near-miss "
    "examples metric-learning batches want). Same plan as "
    "ann_cosine_topk -- queries broadcast, label filter rides the "
    "broadcast join, q x k rows shuffle.",
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.hard_negatives_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5
    )


@register(
    "sketch_count_min",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
    ),
    counts AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c
      FROM words WHERE word <> '' GROUP BY 1
    ),
    ds AS (SELECT unnest(range(4)) AS d),
    cms AS (
      SELECT d,
             ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || word), 1, 8))::BIGINT
               % 1024 AS bucket,
             CAST(sum(c) AS BIGINT) AS cnt
      FROM counts CROSS JOIN ds
      GROUP BY 1, 2
    ),
    topk AS (SELECT word, c FROM counts ORDER BY c DESC, word LIMIT 20),
    probes AS (
      SELECT t.word, t.c, ds.d,
             ('0x' || substr(md5(CAST(ds.d AS VARCHAR) || ':' || t.word), 1, 8))::BIGINT
               % 1024 AS bucket
      FROM topk t CROSS JOIN ds
    )
    SELECT p.word,
           CAST(min(p.c) AS BIGINT) AS exact_count,
           CAST(min(m.cnt) AS BIGINT) AS cms_estimate
    FROM probes p JOIN cms m ON m.d = p.d AND m.bucket = p.bucket
    GROUP BY 1
    """,
    doc="Count-min sketch frequency estimates (Cormode & Muthukrishnan "
    "2005) probed at the exact top-20 words: the sketch is a fixed "
    "4x1024 counter grid built from the vocab-sized count table (never "
    "the raw token stream), merges by bucket-wise sum across shards/"
    "days, and each estimate is the MIN over 4 broadcast-joined cells "
    "-- can only over-count. The frequency half of the streaming-"
    "summary pair next to sketch_mergeable_vocab's HLL cardinalities. "
    "Bucket hashing rides the shared md5 primitive, so the oracle "
    "rebuilds the identical sketch bit-for-bit.",
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )
    from delta_lake_pyspark_scd2_spark.operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    counts = persist_tracked(text.word_counts(docs))
    cms = sketches.count_min_build(counts, "word", "c")
    topk = counts.orderBy(F.desc("c"), "word").limit(20)
    est = sketches.count_min_estimate(cms, topk.select("word"), "word")
    return topk.join(est, "word").select(
        "word", F.col("c").alias("exact_count"), "cms_estimate"
    )


@register(
    "decontam_embedding",
    oracle=f"""
    WITH e AS (
      SELECT embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id < 16
    ),
    c AS (
      SELECT vec_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id >= 16
    ),
    scored AS (
      SELECT c.vec_id, {_COS.format(a='cv', b='ev')} AS s
      FROM c CROSS JOIN e
    )
    SELECT vec_id, max(s) AS max_eval_sim, max(s) >= 0.35 AS contaminated
    FROM scored GROUP BY 1
    """,
    doc="Embedding-space decontamination: every corpus vector labeled "
    "with its max cosine vs a broadcast eval set -- the semantic twin "
    "of the 13-gram screen (decontam_survivors), catching paraphrased "
    "benchmark leakage that shares no exact n-gram. Eval side "
    "broadcasts pre-normalized; corpus streams through a narrow "
    "JVM-expression scoring pass + one map-side-combined max. Rounded "
    "cosine makes the >= threshold boundary engine-stable (max of "
    "rounded == rounded max).",
)
def decontam_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.decontam import (
        embedding_contamination,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_contamination(
        emb.filter(F.col("vec_id") >= 16),
        emb.filter(F.col("vec_id") < 16),
        threshold=0.35,
    )


#: The ONE nprobe set of the recall sweep — the sweep call, the
#: join-base frame, and the oracle's unnest all derive from it, so the
#: three can't silently drift (a sweep-only extension would otherwise
#: drop rows in the inner join; a base-only one would report recall
#: 0.0 for a setting never evaluated).
_RECALL_NPROBES = (1, 2, 4)


@register(
    "ann_recall_eval",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, ve AS cv FROM v WHERE vec_id < 8),
    assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_COS.format(a='ve', b='cv')} DESC,
                                           c.centroid_id ASC) AS rn
        FROM v, cents c
      ) WHERE rn = 1
    ),
    nps AS (SELECT CAST(unnest([{', '.join(str(n) for n in _RECALL_NPROBES)}]) AS INTEGER) AS nprobe),
    pr AS (
      SELECT q.query_id, c.centroid_id, q.qv,
             ROW_NUMBER() OVER (PARTITION BY q.query_id
                                ORDER BY {_COS.format(a='q.qv', b='c.cv')} DESC,
                                         c.centroid_id ASC) AS prn
      FROM (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id >= 490) q,
           cents c
    ),
    iscored AS (
      SELECT p.query_id, p.prn, a.vec_id,
             {_COS.format(a='p.qv', b='v2.ve')} AS cs
      FROM pr p
      JOIN assigned a ON a.centroid_id = p.centroid_id
      JOIN v v2 ON v2.vec_id = a.vec_id
      WHERE a.vec_id <> p.query_id AND p.prn <= {max(_RECALL_NPROBES)}
    ),
    ivf AS (
      SELECT nprobe, query_id, vec_id FROM (
        SELECT n.nprobe, s.query_id, s.vec_id,
               ROW_NUMBER() OVER (PARTITION BY n.nprobe, s.query_id
                                  ORDER BY s.cs DESC, s.vec_id ASC) AS rank
        FROM iscored s JOIN nps n ON s.prn <= n.nprobe
      ) WHERE rank <= 5
    ),
    q AS (
      SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id >= 490
    ),
    escored AS (
      SELECT query_id, vec_id, {_COS.format(a='qv', b='ve')} AS cs
      FROM v, q WHERE vec_id <> query_id
    ),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, vec_id ASC) AS rank
        FROM escored
      ) WHERE rank <= 5
    ),
    hits AS (
      SELECT i.nprobe, e.query_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM exact e JOIN ivf i
        ON i.query_id = e.query_id AND i.vec_id = e.vec_id
      GROUP BY 1, 2
    )
    SELECT b.query_id, n.nprobe,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(COALESCE(h.n_hit, 0) / 5.0, 6) AS recall_at_5
    FROM (SELECT DISTINCT query_id FROM exact) b
    CROSS JOIN nps n
    LEFT JOIN hits h ON h.query_id = b.query_id AND h.nprobe = n.nprobe
    """,
    doc="Index-quality evaluation as a first-class query: recall@5 of "
    "the IVF index against exact brute-force cosine, per query and "
    "per nprobe in {{1, 2, 4}} -- the recall/cost sweep that decides "
    "which ANN configuration a pipeline adopts (round-4 verdict: "
    "single-probe recall ~0.26 was not one). One assignment + one "
    "candidate-scoring pass serves all three settings "
    "(similarity.ivf_topk_sweep). Both arms rank on the identical "
    "rounded-cosine/id contract, so recall is engine-exact.",
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    qs = emb.filter(F.col("vec_id") >= 490)
    exact = similarity.cosine_topk(emb, qs, k=5).select(
        "query_id", "neighbor_id"
    )
    sweep = similarity.ivf_topk_sweep(
        emb, centroids, qs, k=5, nprobes=_RECALL_NPROBES
    ).select("nprobe", "query_id", "neighbor_id")
    hits = (
        exact.join(sweep, ["query_id", "neighbor_id"])
        .groupBy("nprobe", "query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    np_df = spark.createDataFrame(
        [(int(n),) for n in _RECALL_NPROBES], "nprobe int"
    )
    base = exact.select("query_id").distinct().crossJoin(F.broadcast(np_df))
    return base.join(hits, ["nprobe", "query_id"], "left").select(
        "query_id",
        "nprobe",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(5.0), 6
        ).alias("recall_at_5"),
    )


@register(
    "dq_embedding_health",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN embedding IS NULL OR len(embedding) <> 64
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
           CAST(sum(CASE WHEN COALESCE(
                           list_dot_product(embedding::DOUBLE[],
                                            embedding::DOUBLE[]) = 0,
                           FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
           CAST(sum(CASE WHEN COALESCE(
                           len(list_filter(embedding,
                                           x -> isnan(x) OR isinf(x))) > 0,
                           FALSE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite
    FROM embeddings GROUP BY 1
    """,
    doc="Vector-table data quality, one pass: per label, counts of "
    "wrong-dimension, zero-norm, and non-finite vectors -- the gate an "
    "embedding pipeline runs before ANN indexing or training, where "
    "one NaN silently poisons every distance it touches. Pure JVM "
    "higher-order expressions, no explode (the corpus never fans "
    "out), map-side-combined agg.",
)
def dq_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.validation import (
        embedding_health,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_health(emb, dim=64, group_col="label")


@register(
    "select_dsir_topk",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
      FROM documents
    ),
    tok AS (SELECT doc_id, word FROM words WHERE word <> ''),
    cw AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    twords AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS word
      FROM documents WHERE source = 'src1'
    ),
    tw AS (
      SELECT word, CAST(count(*) AS BIGINT) AS t
      FROM twords WHERE word <> '' GROUP BY 1
    ),
    sizes AS (
      SELECT (SELECT sum(c) FROM cw) AS n_c,
             (SELECT count(*) FROM cw) AS v,
             (SELECT COALESCE(sum(t), 0) FROM tw) AS n_t
    ),
    model AS (
      SELECT cw.word,
             round(ln(
               (CAST(COALESCE(t, 0) + 1 AS DOUBLE)
                * CAST(n_c + v AS DOUBLE))
               / (CAST(c + 1 AS DOUBLE) * CAST(n_t + v AS DOUBLE))
             ), 9) AS __llr
      FROM cw LEFT JOIN tw USING (word) CROSS JOIN sizes
    )
    SELECT d.doc_id, s.dsir_score FROM documents d
    LEFT JOIN (
      SELECT doc_id, round(avg(__llr), 6) AS dsir_score
      FROM tok JOIN model USING (word) GROUP BY 1
    ) s USING (doc_id)
    ORDER BY dsir_score DESC NULLS LAST, doc_id ASC LIMIT 50
    """,
    doc="Data selection by importance resampling (the DSIR recipe, "
    "Xie et al. 2023, over unigram features): every corpus doc scored "
    "by its mean per-token log-likelihood ratio between the target "
    "domain's unigram LM (source='src1') and the corpus LM, add-one "
    "smoothed over the corpus vocabulary; top-50 reads most like the "
    "target. The 'trained models' ARE two vocab-sized count tables "
    "re-entering as broadcast joins -- nothing iterative, one corpus "
    "explode, one per-doc mean. 9-dp ratio terms under the shared "
    "float contract.",
)
def select_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.mixture import (
        dsir_importance_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    scores = dsir_importance_scores(
        docs, docs.filter(F.col("source") == "src1")
    )
    return scores.orderBy(
        F.col("dsir_score").desc_nulls_last(), F.asc("doc_id")
    ).limit(50)


@register(
    "select_dsir_hashed",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
      FROM documents
    ),
    tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(word), 1, 8))::BIGINT % 10000
                  AS INTEGER) AS b
      FROM words WHERE word <> ''
    ),
    cb AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    twords AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS word
      FROM documents WHERE source = 'src1'
    ),
    tb AS (
      SELECT CAST(('0x' || substr(md5(word), 1, 8))::BIGINT % 10000
                  AS INTEGER) AS b,
             CAST(count(*) AS BIGINT) AS t
      FROM twords WHERE word <> '' GROUP BY 1
    ),
    sizes AS (
      SELECT (SELECT sum(c) FROM cb) AS n_c,
             (SELECT COALESCE(sum(t), 0) FROM tb) AS n_t
    ),
    model AS (
      SELECT cb.b,
             round(ln(
               (CAST(COALESCE(t, 0) + 1 AS DOUBLE)
                * CAST(n_c + 10000 AS DOUBLE))
               / (CAST(c + 1 AS DOUBLE) * CAST(n_t + 10000 AS DOUBLE))
             ), 9) AS __llr
      FROM cb LEFT JOIN tb USING (b) CROSS JOIN sizes
    )
    SELECT d.doc_id, s.dsir_score FROM documents d
    LEFT JOIN (
      SELECT doc_id, round(avg(__llr), 6) AS dsir_score
      FROM tok JOIN model USING (b) GROUP BY 1
    ) s USING (doc_id)
    ORDER BY dsir_score DESC NULLS LAST, doc_id ASC LIMIT 50
    """,
    doc="DSIR over HASHED features -- the actual Xie et al. 2023 "
    "recipe and the 100-TB-safe sibling of select_dsir_topk: tokens "
    "fold into 10k md5 buckets, so both unigram LMs are <=10k-row "
    "count tables regardless of corpus vocabulary and the importance "
    "model stays broadcastable at any scale (the exact variant's "
    "vocab-sized model cannot be). Add-one smoothing over the FIXED "
    "bucket space; same coverage and float contract as the exact "
    "form.",
)
def select_dsir_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.mixture import (
        dsir_importance_scores_hashed,
    )

    docs = load_table(spark, sf_dir, "documents")
    scores = dsir_importance_scores_hashed(
        docs, docs.filter(F.col("source") == "src1")
    )
    return scores.orderBy(
        F.col("dsir_score").desc_nulls_last(), F.asc("doc_id")
    ).limit(50)


@register(
    "events_volume_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS s1,
             CAST(sum(n * n) AS BIGINT) AS s2
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, d.day, d.n,
           round((d.n - CAST(s1 AS DOUBLE) / k)
                 / sqrt(nullif(greatest(
                          CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE),
                          0.0), 0.0)
                        / (k * (k - 1))), 6) AS z,
           COALESCE(abs(round((d.n - CAST(s1 AS DOUBLE) / k)
                 / sqrt(nullif(greatest(
                          CAST(k AS DOUBLE) * CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE),
                          0.0), 0.0)
                        / (k * (k - 1))), 6)) >= 2.0, FALSE) AS is_anomaly
    FROM daily d JOIN stats USING (event_type)
    """,
    doc="Ingest-volume anomaly monitor: every (event_type, day) count "
    "z-scored against that type's own daily distribution -- flags a "
    "collapsed crawler or duplicate-feed day before the slice trains. "
    "One input-sized count, then output-sized window passes. Mean and "
    "variance derive from exact integer sums (k*sum(n^2) - sum(n)^2), "
    "so both engines divide bit-identical doubles -- no "
    "engine-ordered stddev accumulation.",
)
def events_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.timeseries import (
        daily_volume_anomaly,
    )

    events = load_table(spark, sf_dir, "events")
    return daily_volume_anomaly(events, "event_type")


@register(
    "retrieve_tfidf_topk",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split({_NORM}, ' ')) AS t FROM documents
    ),
    tf AS (
      SELECT doc_id, t, COUNT(*) AS tf FROM words WHERE t <> '' GROUP BY 1, 2
    ),
    dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    emb AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tf.t), 1, 8))::BIGINT % 64 AS INT)
               AS bucket,
             round(sum(
               (CASE WHEN ('0x' || substr(md5(tf.t || '#s'), 1, 8))::BIGINT % 2 = 0
                     THEN 1.0 ELSE -1.0 END)
               * round(tf.tf * round(ln(n.n_docs / dfq.df), 6), 6)), 6) AS w
      FROM tf JOIN dfq USING (t) CROSS JOIN n
      GROUP BY 1, 2
    ),
    norms AS (
      SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM emb GROUP BY 1
    ),
    dots AS (
      SELECT q.doc_id AS query_id, c.doc_id AS match_id,
             sum(q.w * c.w) AS dot
      FROM emb q JOIN emb c USING (bucket)
      WHERE q.doc_id < 3 AND c.doc_id >= 3
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, match_id,
             round(dot / (nq.nrm * nc.nrm), 6) AS cos_sim
      FROM dots
      JOIN norms nq ON nq.doc_id = query_id
      JOIN norms nc ON nc.doc_id = match_id
    )
    SELECT query_id, match_id, rank, cos_sim FROM (
      SELECT query_id, match_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, match_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    doc="Text-to-text retrieval with no model artifact: corpus docs "
    "embedded as sparse hashed TF-IDF (the doc_embedding_hash "
    "representation), query docs (id < 3) score the corpus by sparse "
    "cosine -- a broadcast bucket equi-join, i.e. a posting-list "
    "probe: only (query, doc) pairs sharing a non-zero bucket are "
    "ever scored, never all pairs. Norms and ranks over the "
    "6-dp-rounded weights keep both engines' floats identical.",
)
def retrieve_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = persist_tracked(
        text.hashed_tfidf_embedding(docs, dense=False, dim=64)
    )
    norms = emb.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("__nrm")
    )
    q = F.broadcast(
        emb.filter(F.col("doc_id") < 3).select(
            F.col("doc_id").alias("query_id"),
            "bucket",
            F.col("weight").alias("__qw"),
        )
    )
    dots = (
        emb.filter(F.col("doc_id") >= 3)
        .join(q, "bucket")
        .groupBy("query_id", F.col("doc_id").alias("match_id"))
        .agg(F.sum(F.col("__qw") * F.col("weight")).alias("__dot"))
    )
    # broadcast only the QUERY docs' norms — broadcasting the full
    # corpus-sized norms table would be an unbounded build side at
    # 100 TB (round-4 VERDICT #1a); the filter keeps it query-sized
    qn = F.broadcast(
        norms.filter(F.col("doc_id") < 3).select(
            F.col("doc_id").alias("query_id"), F.col("__nrm").alias("__nq")
        )
    )
    cn = norms.select(
        F.col("doc_id").alias("match_id"), F.col("__nrm").alias("__nc")
    )
    scored = (
        dots.join(qn, "query_id")
        .join(cn, "match_id")
        .select(
            "query_id",
            "match_id",
            F.round(F.col("__dot") / (F.col("__nq") * F.col("__nc")), 6)
            .alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("match_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "match_id", "rank", "cos_sim")
    )


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_CLUSTER_CTES},
    lab AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           (ROW_NUMBER() OVER (PARTITION BY cluster_id
                               ORDER BY n_chars DESC, doc_id ASC) = 1)
             AS is_kept
    FROM lab
    """,
    doc="Quality-aware near-dup survivor selection: same Jaccard>=0.8 "
    "clusters as dedup_cluster_canonical, but each cluster keeps its "
    "highest-n_chars member (ties to lowest id) instead of the lowest "
    "id -- when a stripped page near-duplicates its full twin, keep "
    "the better copy. Adds one score join + one cluster-keyed window "
    "to the distributed-CC plan; the keeper rule uses exact ints so "
    "the argmax is engine-stable.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import graph

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_prefix(docs, threshold=0.8).select(
        "id_a", "id_b"
    )
    # unique by construction (emitter aggregates on the pair) — skip
    # the CC symmetrize-dedup shuffle
    return graph.cluster_keep_best(docs, pairs, "n_chars", pairs_unique=True)


@register(
    "source_drift_kl",
    oracle=f"""
    WITH words AS (
      SELECT source, unnest(string_split({_NORM}, ' ')) AS word
      FROM documents
    ),
    w AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS n_gw
      FROM words WHERE word <> '' GROUP BY 1, 2
    ),
    tot AS (SELECT source, CAST(sum(n_gw) AS BIGINT) AS n_g FROM w GROUP BY 1),
    ov AS (SELECT word, CAST(sum(n_gw) AS BIGINT) AS n_w FROM w GROUP BY 1),
    nt AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_total FROM ov)
    SELECT w.source,
           CAST(min(t.n_g) AS BIGINT) AS n_tokens,
           round(sum(round(
             (CAST(n_gw AS DOUBLE) / n_g)
             * ln(CAST(n_gw AS DOUBLE) * n_total
                  / (CAST(n_g AS DOUBLE) * n_w)), 9)), 6) AS kl_divergence
    FROM w JOIN tot t USING (source) JOIN ov USING (word) CROSS JOIN nt
    GROUP BY 1
    """,
    doc="Distribution-drift monitor: KL(source-unigram-dist || corpus-"
    "unigram-dist) per crawl source -- flags a slice whose language "
    "diverged (new boilerplate, encoding break, topical shift) before "
    "it trains badly. Slice/corpus/total frequencies re-enter as "
    "broadcast joins after ONE token-collapse shuffle. KL terms are "
    "9-dp-rounded before the 6-dp sum so engine summation order "
    "cannot flip the reported value.",
    bench=True,  # this round's monitoring surface: one headline entry
    # so a regression shows up in BENCH medians, not just plan pins
)
def source_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.unigram_kl_drift(docs, "source")


@register(
    "vtable_version_diff",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS price
      FROM orders WHERE o_orderkey % 4 < 3
    ),
    ins AS (
      SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS price
      FROM orders WHERE o_orderkey % 4 = 3
    ),
    upd AS (
      SELECT * FROM base WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
    ),
    del AS (SELECT * FROM base WHERE o_orderkey % 7 = 0),
    feed AS (
      SELECT 'insert' AS change_type, price FROM ins
      UNION ALL SELECT 'update_preimage' AS change_type, price FROM upd
      UNION ALL SELECT 'update_postimage' AS change_type, price * 2 FROM upd
      UNION ALL SELECT 'delete' AS change_type, price FROM del
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(price) AS BIGINT) AS sum_price
    FROM feed GROUP BY 1
    """,
    doc="Version-to-version semantic diff of a versioned table, "
    "summarized per change class: create v0, apply one generic "
    "MERGE (inserts + updates + deletes), then read the change data "
    "feed across the whole span and aggregate rows/value-sums by "
    "_change_type. The oracle derives each class from the same "
    "deterministic predicates -- the CDF must reproduce it exactly. "
    "Scale: the manifest diff reads only files touched by the commit "
    "(immutable files shared by both versions can't hold changes), so "
    "diff cost tracks change volume, not table size.",
)
def vtable_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.plans.scratch import scratch_path
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 4 < 3).select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price"),
    )
    ins = orders.filter(F.col("o_orderkey") % 4 == 3).select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price"),
    )
    upd = base.filter(
        (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0)
    ).withColumn("price", F.col("price") * 2)
    dels = base.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    t = VersionedParquetTable.create(
        spark, base, scratch_path("vtable_version_diff")
    )
    t.upsert(upd.unionByName(ins), ["o_orderkey"], deletes=dels)
    return (
        t.table_changes(["o_orderkey"], 0)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("price").cast("long").alias("sum_price"),
        )
    )




@register(
    "split_cluster_safe",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_CC_CLUSTER_CTES},
    lab AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, cluster_id,
           CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT
                     % 1000000 < 800000 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT
                     % 1000000 < 900000 THEN 'val'
                ELSE 'test' END AS split
    FROM lab
    """,
    doc="Leakage-free train/val/test split (80/10/10): near-dup "
    "CLUSTERS (same Jaccard>=0.8 components as dedup_cluster_canonical) "
    "are the splitting unit, so a near-duplicate pair can never "
    "straddle a train/eval boundary -- the structural fix for what "
    "split_leakage_audit measures on doc-level random splits. Split "
    "choice is the deterministic md5 keep-hash over the cluster id: "
    "reproducible on any cluster shape; within one corpus version the "
    "no-straddle guarantee is absolute (a later doc that bridges two "
    "clusters merges them -- re-audit after growth). Bench headline "
    "since round 6: the heaviest corpus-scan query (pair emitter "
    "dominates, ~3 s Spark-arm median at sf0.1 -- BENCH_NOTES.md).",
    bench=True,
)
def split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import graph

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_prefix(docs, threshold=0.8).select(
        "id_a", "id_b"
    )
    # unique by construction (emitter aggregates on the pair) — skip
    # the CC symmetrize-dedup shuffle
    return graph.cluster_safe_split(
        docs, pairs, weights=(0.8, 0.1, 0.1), pairs_unique=True
    )


@register(
    "quality_filter_per_lang",
    oracle="""
    WITH thr AS (
      SELECT lang, quantile_disc(n_chars, 0.5) AS t
      FROM documents GROUP BY lang
    )
    SELECT doc_id, d.lang AS lang, n_chars
    FROM documents d JOIN thr ON d.lang IS NOT DISTINCT FROM thr.lang
    WHERE n_chars >= t
    """,
    doc="Per-language relative quality gate (the FineWeb-style recipe): "
    "keep each language's top half by content length -- a per-group "
    "quantile where one global threshold would silently drop whole "
    "low-resource languages whose score distribution sits below the "
    "high-resource ones. Scale path (round-5 VERDICT #2): two-pass "
    "threshold -- per-lang percentile_approx (map-side combinable, "
    "bounded sketch state) broadcast back as a |langs|-row table, "
    "then a filter; NO lang-partitioned sort window, so the dominant "
    "language never lands in one task. For groups under the sketch "
    "accuracy the threshold is the exact discrete quantile (= DuckDB "
    "quantile_disc), boundary ties all kept -- engine-stable. The "
    "rank-exact percent_rank form survives as the oracle twin "
    "(quality_filter_per_group(exact=True)).",
)
def quality_filter_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.mixture import (
        quality_filter_per_group,
    )

    docs = load_table(spark, sf_dir, "documents")
    return quality_filter_per_group(
        docs, F.col("n_chars"), keep_frac=0.5, group_col="lang"
    ).select("doc_id", "lang", "n_chars")


@register(
    "export_token_pack",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+'))
                  END AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY source
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS tok_before
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor(tok_before / 2000.0) AS INT) AS shard_no
    FROM c
    """,
    doc="Token-budget shard packing for training-data export: within "
    "each source, docs are packed in id order into shards of ~2000 "
    "whitespace tokens (shard = floor(cumulative-tokens-before / "
    "budget)) -- the deterministic assignment a sequence-packing "
    "export consumes. Scale (round-5 VERDICT #3): the per-source "
    "running sum is a TWO-LEVEL chunked prefix sum "
    "(sources.export.tokens_before) -- chunk-local windows in "
    "parallel plus a bounded (<= 4096 rows/source) chunk-offset scan "
    "broadcast back -- bit-identical to the single-window oracle "
    "shape (exact integer sums, same total order), so a 50 TB source "
    "packs across many tasks.",
)
def export_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.sources.export import tokens_before

    docs = load_table(spark, sf_dir, "documents")
    # shard assignment needs only (id, source, token count) — tokenize
    # once at the scan and keep the text column OUT of the prefix-sum
    # window's exchange (guide §2.3: shuffle keys and metadata, not
    # payloads; the packing decision is exactly such a decision)
    narrow = docs.select(
        "doc_id",
        "source",
        text.token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
    )
    return tokens_before(narrow, F.col("n_tokens")).select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(F.col("tok_before") / F.lit(2000.0)).cast("int").alias(
            "shard_no"
        ),
    )


@register(
    "sketch_token_histogram",
    oracle=r"""
    WITH t AS (
      SELECT CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+'))
                  END AS BIGINT) AS v
      FROM documents
    )
    SELECT CAST(COALESCE(length(bin(v + 1)) - 1, -1) AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM t GROUP BY 1
    """,
    doc="Mergeable log2-histogram sketch of per-doc token counts -- "
    "the distribution-shape member of the sketch family (CMS = "
    "frequency, HLL = cardinality): <= 64 rows regardless of corpus "
    "size, mergeable by bucket-wise sum (per-day / per-partition "
    "sketches combine without re-scanning history), quantile probes "
    "are a cumulative pass over the tiny sketch. Bucketing is EXACT "
    "integer arithmetic (length(bin(v+1)) - 1 == floor(log2(v+1))), "
    "never float log, so both engines bin boundary values "
    "identically. One map-side-combinable aggregation.",
)
def sketch_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        histogram_build,
    )

    docs = load_table(spark, sf_dir, "documents")
    return histogram_build(docs, text.token_count_ws(F.col("text")))


def _d2_terms(a: str, b: str, n: int) -> str:
    """Explicit LEFT-ASSOCIATED squared-L2 over ``n``-element lists —
    both engines produce the bit-identical double (shared contract
    with similarity._d2_contract)."""
    return " + ".join(
        f"({a}[{j}] - {b}[{j}]) * ({a}[{j}] - {b}[{j}])"
        for j in range(1, n + 1)
    )


# -- shared halves of the PQ recall evaluations ------------------------------
# per-query LUTs over the trained codebooks (all queries = vec_id >= 490)
_PQT_EVAL_LUTS = f"""
    qs AS (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id >= 490),
    qsubq AS (
      SELECT qs.query_id, ms.m, qs.qv[ms.m*8+1:ms.m*8+8] AS s
      FROM qs, ms
    ),
    lutq AS (
      SELECT q.query_id, c2.m, c2.code,
             round({_pqt_d2('q.s', 'c2.c')}, 9) AS d2
      FROM qsubq q JOIN c2 ON q.m = c2.m
    ),
    subv AS (
      SELECT v.vec_id, ms.m, v.ve[ms.m*8+1:ms.m*8+8] AS s FROM v, ms
    ),
    assign AS (
      SELECT vec_id, m, code FROM (
        SELECT subv.vec_id, subv.m, c2.code,
               ROW_NUMBER() OVER (PARTITION BY subv.vec_id, subv.m
                 ORDER BY round({_pqt_d2('subv.s', 'c2.c')}, 9) ASC,
                          c2.code ASC) AS rn
        FROM subv JOIN c2 ON subv.m = c2.m
      ) WHERE rn = 1
    )
"""

# ADC ranking + exact arm + recall join, over an `adc(query_id, vec_id,
# pq_dist)` CTE the caller provides
_PQT_EVAL_TAIL = f"""
    approx AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY pq_dist ASC, vec_id ASC) AS rank
        FROM adc
      ) WHERE rank <= 10
    ),
    escored AS (
      SELECT qs.query_id, v.vec_id,
             round({_d2_terms('v.ve', 'qs.qv', 64)}, 6) AS d2
      FROM v, qs WHERE v.vec_id <> qs.query_id
    ),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY d2 ASC, vec_id ASC) AS rank
        FROM escored
      ) WHERE rank <= 10
    ),
    hits AS (
      SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM exact e JOIN approx a
        ON a.query_id = e.query_id AND a.vec_id = e.vec_id
      GROUP BY 1
    )
    SELECT b.query_id,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(COALESCE(h.n_hit, 0) / 10.0, 6) AS recall_at_10
    FROM (SELECT DISTINCT query_id FROM exact) b
    LEFT JOIN hits h USING (query_id)
"""


def _pq_eval_parts(spark: SparkSession, sf_dir: str):
    """Spark-side shared halves: trained books, encoded corpus, query
    set, the (query_id, m, code, d2) LUT frame (one broadcast join
    scores ADC for every query), and the exact squared-L2 top-10 arm.
    Returns ``(codes, qs, lut, exact)``."""
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    books = S.pq_train_contract(
        emb, m_subspaces=8, k_codes=16, sample=64, iters=2
    )
    codes = persist_tracked(S.pq_encode_expr(emb, books))
    qs = emb.filter(F.col("vec_id") >= 490)
    q_rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in qs.collect()
    ]
    lut_rows = [
        (qid, m, code,
         S._round_half_up(
             S._d2_contract(qv[m * 8 : (m + 1) * 8], c), 9))
        for qid, qv in q_rows
        for m in range(8)
        for code, c in enumerate(books[m])
    ]
    lut = spark.createDataFrame(
        lut_rows, "query_id long, m int, code int, d2 double"
    )
    qdf = F.broadcast(
        qs.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qv"),
        )
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("__qv"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )
    escored = (
        emb.crossJoin(qdf)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", d2.alias("__d2"))
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc(), F.col("vec_id").asc()
    )
    exact = (
        escored.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id")
    )
    return codes, qs, lut, exact


def _pq_recall_output(exact: DataFrame, adc: DataFrame) -> DataFrame:
    """Rank the ADC scores, intersect with the exact arm, emit
    ``(query_id, n_hit, recall_at_10)`` — shared by both evals."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_dist").asc(), F.col("vec_id").asc()
    )
    approx = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id")
    )
    hits = (
        exact.join(approx, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    base = exact.select("query_id").distinct()
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(10.0), 6
        ).alias("recall_at_10"),
    )


@register(
    "ann_pq_recall_eval",
    oracle=f"""
    WITH {_PQT_TRAIN},
    {_PQT_EVAL_LUTS},
    adc AS (
      SELECT l.query_id, a.vec_id, round(sum(l.d2), 6) AS pq_dist
      FROM assign a JOIN lutq l ON a.m = l.m AND a.code = l.code
      WHERE a.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    {_PQT_EVAL_TAIL}
    """,
    doc="PQ index-quality evaluation as a query: per-query recall@10 "
    "of the trained-PQ ADC search against exact squared-L2 brute "
    "force -- extends the evaluation family (IVF recall, lang "
    "confusion, embedding health) to the compressed index, measuring "
    "exactly what 8x..64x memory compression costs in neighbor "
    "fidelity before a pipeline adopts it. Both arms share the "
    "left-associated/rounded distance contract, so recall is "
    "engine-exact; all query LUTs ride ONE broadcast join over the "
    "encoded corpus (no per-query pass).",
)
def ann_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes, _qs, lut, exact = _pq_eval_parts(spark, sf_dir)
    adc = (
        codes.select(
            "vec_id", F.posexplode("pq_codes").alias("m", "code")
        )
        .join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("pq_dist"))
    )
    return _pq_recall_output(exact, adc)


@register(
    "ann_ivfpq_recall_eval",
    oracle=f"""
    WITH {_PQT_TRAIN},
    cents AS (
      SELECT vec_id AS centroid_id, ve AS cv2 FROM v
      WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 12
    ),
    assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY {_COS.format(a='v.ve', b='c.cv2')} DESC,
                          c.centroid_id ASC) AS rn
        FROM v, cents c
      ) WHERE rn = 1
    ),
    {_PQT_EVAL_LUTS},
    probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT q.query_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 {_COS.format(a='q.qv', b='c.cv2')} DESC,
                 c.centroid_id ASC) AS rn
        FROM qs q, cents c
      ) WHERE rn <= 3
    ),
    adc AS (
      SELECT l.query_id, a.vec_id, round(sum(l.d2), 6) AS pq_dist
      FROM assign a
      JOIN assigned b ON a.vec_id = b.vec_id
      JOIN probes p ON b.centroid_id = p.centroid_id
      JOIN lutq l ON a.m = l.m AND a.code = l.code
                 AND l.query_id = p.query_id
      WHERE a.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    {_PQT_EVAL_TAIL}
    """,
    doc="IVF-PQ recall@10 vs exact squared-L2 -- completes the "
    "index-selection matrix (brute force = 1.0 by definition, IVF "
    "sweep per nprobe, bare PQ, composed IVF-PQ): the composed "
    "index's misses come from BOTH bucket restriction and code "
    "quantization, and only a measurement of the composition says "
    "whether their errors overlap or compound. Same engine-exact "
    "contracts as the other evaluation queries; per-query bucket "
    "restriction joins assignment to probes, then one broadcast LUT "
    "join scores the survivors.",
)
def ann_ivfpq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    codes, qs, lut, exact = _pq_eval_parts(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % 37 == 0).orderBy("vec_id").limit(12)
    assigned = S.assign_to_centroids(emb, cents).select(
        "vec_id", "centroid_id"
    )
    # per-query probe sets (top-3 centroids, rounded-cosine contract)
    cq = cents.select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("__cv"),
    ).withColumn("__cn", S.norm(F.col("__cv")))
    qn = qs.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__q")
    ).withColumn("__qn", S.norm(F.col("__q")))
    qc = qn.crossJoin(F.broadcast(cq)).withColumn(
        "__sim",
        F.round(
            S.cosine_prenormed(
                F.col("__q"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ),
            6,
        ),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= 3)
        .select("query_id", "centroid_id")
    )
    cand = (
        codes.join(assigned, "vec_id")
        .join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    adc = (
        cand.select(
            "query_id", "vec_id", F.posexplode("pq_codes").alias("m", "code")
        )
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("pq_dist"))
    )
    return _pq_recall_output(exact, adc)


@register(
    "ann_pq_adopted_recall_eval",
    oracle=None,  # rows-only by design — see doc
    doc="Recall@10 of the ADOPTED PQ configuration -- m=32 subspaces "
    "x k=256 codes, production-trained (numpy Lloyd on the bounded "
    "lowest-id sample, Arrow-batched encode) -- against exact squared "
    "L2. The round-5 matrix measured the oracle-contract config (m=8, "
    "k=16, 64-sample, 2-iter Lloyd -- sized for unrolled-CTE "
    "verifiability, not fidelity) at recall 0.120; the sweep "
    "(tools/pq_sweep.py, COVERAGE.md index matrix) shows recall is "
    "code-budget-bound on these embeddings: 0.392 at 8x256, 0.594 at "
    "16x256, 0.852 at 32x256 (8x memory cut at 64-dim float32), while "
    "IVF-residual encoding adds only ~0.03 -- so the shippable "
    "compressed index is raw PQ-32x256. Rows-only by design: the "
    "trained codebooks come from float64 BLAS whose accumulation "
    "order no SQL engine reproduces; the CONTRACT config twins "
    "(ann_pq_trained_topk / ann_pq_recall_eval) carry the value-hash "
    "proof that the ADC pipeline itself is engine-exact. Scale: 50 "
    "fixed queries, one broadcast LUT join over the encoded corpus; "
    "the eval is a sampled harness, the serving path stays "
    "pq_topk/ivfpq_topk.",
)
def ann_pq_adopted_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, _books, codes, _q_rows, lut, exact = _adopted_eval_parts(
        spark, sf_dir
    )
    adc = (
        codes.select(
            "vec_id", F.posexplode("pq_codes").alias("m", "code")
        )
        .join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("pq_dist"))
    )
    return _pq_recall_output(exact, adc)


def _adopted_eval_parts(spark: SparkSession, sf_dir: str):
    """Shared halves of the ADOPTED-config (PQ-32x256,
    production-trained) recall evals: embeddings, books, encoded
    corpus, the 50-highest-id query rows, the broadcast ADC LUT frame,
    and the exact squared-L2 top-10 arm."""
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    books = S.pq_train(
        emb, m_subspaces=32, k_codes=256, sample=2048, iters=8
    )
    codes = persist_tracked(S.pq_encode(emb, books))
    # 50 highest-id vectors are the query set (deterministic at any SF)
    mx = emb.agg(F.max("vec_id").alias("__mx"))
    qs = emb.crossJoin(F.broadcast(mx)).filter(
        F.col("vec_id") > F.col("__mx") - 50
    )
    q_rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in qs.select("vec_id", "embedding").collect()
    ]  # 50 rows by construction — bounded driver-side LUT build
    # shared LUT contract (similarity.adc_lut_rows); sub-dim comes from
    # the books, the eval keeps its 9-dp per-term rounding
    lut_rows = S.adc_lut_rows(q_rows, books, round_dp=9)
    lut = spark.createDataFrame(
        lut_rows, "query_id long, m int, code int, d2 double"
    )
    qdf = F.broadcast(
        qs.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qv"),
        )
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("__qv"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )
    escored = (
        emb.crossJoin(qdf)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", d2.alias("__d2"))
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc(), F.col("vec_id").asc()
    )
    exact = (
        escored.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id")
    )
    return emb, books, codes, q_rows, lut, exact


@register(
    "ann_ivfpq_adopted_recall_eval",
    oracle=None,  # rows-only by design, like the bare adopted eval
    doc="Recall@10 of the ADOPTED COMPOSED serving config -- "
    "kmeans-32 coarse quantizer, top-12 probes per query (~38% of the "
    "corpus scanned, measured), over ADOPTED PQ-32x256 codes -- "
    "against exact squared L2. Config selected by "
    "tools/ivfpq_probe_sweep.py (round-8 sweep, COVERAGE.md matrix): "
    "on these near-uniform synthetic embeddings recall tracks scanned "
    "fraction almost linearly for EVERY coarse quantizer, so "
    "kmeans32/nprobe12 is the cheapest composition clearing the 0.7 "
    "adoption bar (0.740 @10 at sf0.01 AND sf0.1 offline; the "
    "in-pipeline number this query measures uses the engine's "
    "deterministic lowest-id-seeded kmeans_fit). Same probe contract "
    "as the trained-IVFPQ oracle queries; one broadcast LUT join over "
    "the probed codes.",
)
def ann_ivfpq_adopted_recall_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import similarity as S
    from delta_lake_pyspark_scd2_spark.operators.clustering import kmeans_fit

    emb, _books, codes, q_rows, lut, exact = _adopted_eval_parts(
        spark, sf_dir
    )
    cents = kmeans_fit(
        emb, k=S.ADOPTED_IVFPQ["n_centroids"], iters=4, dim=64
    )
    assigned = S.assign_to_centroids(emb, cents).select(
        "vec_id", "centroid_id"
    )
    cent_rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in cents.select("vec_id", "embedding").collect()
    ]
    probes = spark.createDataFrame(
        [
            (qid, cid)
            for qid, qv in q_rows
            for cid in S._probe_from_rows(
                qv, cent_rows, S.ADOPTED_IVFPQ["nprobe"]
            )
        ],
        "query_id long, centroid_id long",
    )
    cand = (
        codes.join(assigned, "vec_id")
        .join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    adc = (
        cand.select(
            "query_id", "vec_id", F.posexplode("pq_codes").alias("m", "code")
        )
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("pq_dist"))
    )
    return _pq_recall_output(exact, adc)


@register(
    "source_length_drift",
    oracle=r"""
    WITH t AS (
      SELECT source,
             CAST(COALESCE(
               length(bin(CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+'))
                    END AS BIGINT) + 1)) - 1, -1) AS INT) AS bucket
      FROM documents
    ),
    gb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS cgb
           FROM t WHERE bucket >= 0 GROUP BY 1, 2),
    gt AS (SELECT source, CAST(sum(cgb) AS BIGINT) AS ng FROM gb GROUP BY 1),
    cb AS (SELECT bucket, CAST(sum(cgb) AS BIGINT) AS cb FROM gb GROUP BY 1),
    n AS (SELECT CAST(sum(cb) AS BIGINT) AS nt FROM cb)
    SELECT gt.source, CAST(min(gt.ng) AS BIGINT) AS n,
           round(sum(round(abs(
             CAST(COALESCE(gb.cgb, 0) AS DOUBLE) / gt.ng
             - CAST(cb.cb AS DOUBLE) / nt), 9)), 6) AS l1_distance
    FROM gt CROSS JOIN cb CROSS JOIN n
    LEFT JOIN gb ON gb.source = gt.source AND gb.bucket = cb.bucket
    GROUP BY 1
    """,
    doc="Per-source LENGTH-distribution drift: L1 distance between "
    "each source's log2 token-count histogram shares and the corpus "
    "shares -- the shape companion of source_drift_kl (KL sees "
    "content drift; a crawler that starts emitting truncated pages "
    "has identical vocabulary but a collapsed length histogram, which "
    "only this catches). One (source, bucket) count; the distance "
    "join is histogram-sized (sources x <=65 buckets). Exact-int "
    "shares, 9-dp terms, 6-dp sums.",
)
def source_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.sketches import (
        histogram_drift,
    )

    docs = load_table(spark, sf_dir, "documents")
    return histogram_drift(
        docs, text.token_count_ws(F.col("text")), "source"
    )


# ---------------------------------------------------------------------------
# Bloom filter: the membership sketch + its decontamination prefilter
# ---------------------------------------------------------------------------


@register(
    "sketch_bloom",
    oracle=f"""
    WITH words AS (
      SELECT source, unnest(string_split({_NORM}, ' ')) AS word FROM documents
    ),
    counts AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c
      FROM words WHERE word <> '' GROUP BY 1
    ),
    member AS (
      SELECT DISTINCT word FROM words WHERE source = 'src0' AND word <> ''
    ),
    ds AS (SELECT unnest(range(4)) AS d),
    bloom AS (
      SELECT DISTINCT
        ('0x' || substr(md5('b' || CAST(d AS VARCHAR) || ':' || word), 1, 8))::BIGINT
          % 16384 AS pos
      FROM member CROSS JOIN ds
    ),
    topk AS (SELECT word, c FROM counts ORDER BY c DESC, word LIMIT 20),
    probes AS (
      SELECT t.word, t.c, ds.d,
        ('0x' || substr(md5('b' || CAST(ds.d AS VARCHAR) || ':' || t.word), 1, 8))::BIGINT
          % 16384 AS pos
      FROM topk t CROSS JOIN ds
    )
    SELECT p.word,
           CAST(min(p.c) AS BIGINT) AS exact_count,
           count(b.pos) = 4 AS might_contain,
           CAST(max(CASE WHEN m.word IS NOT NULL THEN 1 ELSE 0 END) AS BOOLEAN)
             AS truly_present
    FROM probes p
    LEFT JOIN bloom b ON b.pos = p.pos
    LEFT JOIN member m ON m.word = p.word
    GROUP BY 1
    """,
    doc="Bloom filter membership sketch (Bloom 1970), completing the "
    "mergeable-sketch quartet (HLL = how many distinct, CMS = how "
    "often, log2-histogram = shape, Bloom = is this one a member): "
    "the src0 slice's vocabulary folds into a fixed 4x16384-bit "
    "filter (KBs at any member count, merge = idempotent bit union), "
    "probed here at the corpus top-20 words next to exact membership "
    "-- may false-positive, can never false-negative. Bit positions "
    "ride the shared md5 primitive, so the oracle rebuilds the "
    "identical filter bit-for-bit.",
)
def sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )
    from delta_lake_pyspark_scd2_spark.operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    counts = persist_tracked(text.word_counts(docs))
    # persisted: feeds the Bloom build AND the final membership join —
    # unpersisted, the src0 tokenize+count ran twice (round-10)
    member = persist_tracked(
        text.word_counts(docs.filter(F.col("source") == "src0")).select(
            "word"
        )
    )
    bloom = sketches.bloom_build(member, "word")
    topk = counts.orderBy(F.desc("c"), "word").limit(20)
    flags = sketches.bloom_might_contain(bloom, topk.select("word"), "word")
    return (
        topk.join(flags, "word")
        .join(
            F.broadcast(member.withColumn("__m", F.lit(1))), "word", "left"
        )
        .select(
            "word",
            F.col("c").alias("exact_count"),
            "might_contain",
            F.col("__m").isNotNull().alias("truly_present"),
        )
    )


@register(
    "decontam_bloom",
    oracle=f"""
    WITH {_DECON_CTE},
    ds AS (SELECT unnest(range(4)) AS d),
    bloom AS (
      SELECT DISTINCT
        ('0x' || substr(md5('b' || CAST(d AS VARCHAR) || ':' || gram), 1, 8))::BIGINT
          % 16384 AS pos
      FROM egrams CROSS JOIN ds
    ),
    tprobe AS (
      SELECT g.doc_id, g.gram, ds.d,
        ('0x' || substr(md5('b' || CAST(ds.d AS VARCHAR) || ':' || g.gram), 1, 8))::BIGINT
          % 16384 AS pos
      FROM dgrams g CROSS JOIN ds WHERE g.source <> 'src0'
    ),
    gram_hits AS (
      SELECT doc_id, gram, count(b.pos) = 4 AS hit
      FROM tprobe LEFT JOIN bloom b USING (pos)
      GROUP BY 1, 2
    ),
    doc_bloom AS (SELECT doc_id, max(hit) AS bloom_hit FROM gram_hits GROUP BY 1),
    exact AS (
      SELECT DISTINCT g.doc_id
      FROM dgrams g JOIN egrams USING (gram)
      WHERE g.source <> 'src0'
    )
    SELECT d.doc_id,
           COALESCE(b.bloom_hit, FALSE) AS bloom_hit,
           d.doc_id IN (SELECT doc_id FROM exact) AS contaminated
    FROM documents d LEFT JOIN doc_bloom b USING (doc_id)
    WHERE d.source <> 'src0'
    """,
    doc="Two-stage eval-set decontamination: the benchmark slice's "
    "13-grams fold into a fixed 4x16384-bit Bloom bitmap shipped as a "
    "STRING LITERAL (KBs at any eval-suite size -- the screen for a "
    "consolidated eval registry whose raw gram set outgrows "
    "broadcast), stage-1 probes are pure JVM bit expressions (zero "
    "joins), and only bloom-hit docs pay the stage-2 exact gram "
    "confirm. No false negatives, so restricting stage 2 to the "
    "prefilter survivors is lossless -- the oracle proves it by "
    "computing the exact flag unrestricted.",
)
def decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import decontam

    docs = load_table(spark, sf_dir, "documents")
    return decontam.contamination_bloom(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=_DECON_N,
    )


@register(
    "dedup_recall_eval",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT id_a, id_b
      FROM shared
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE shared / (sa.set_size + sb.set_size - shared) >= 0.8
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
    ),
    mins AS (
      SELECT doc_id,
           {_MIN_EXPRS}
      FROM hashed GROUP BY doc_id
    ),
    banded AS (
{_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id
    ),
    j AS (
      SELECT t.id_a AS t_mark, c.id_a AS c_mark
      FROM truth t FULL OUTER JOIN cand c
        ON t.id_a = c.id_a AND t.id_b = c.id_b
    ),
    agg AS (
      SELECT CAST(count(t_mark) AS BIGINT) AS n_truth,
             CAST(count(c_mark) AS BIGINT) AS n_candidates,
             CAST(count(CASE WHEN t_mark IS NOT NULL AND c_mark IS NOT NULL
                             THEN 1 END) AS BIGINT) AS n_hits
      FROM j
    )
    SELECT n_truth, n_candidates, n_hits,
           CASE WHEN n_truth > 0
                THEN round(CAST(n_hits AS DOUBLE) / n_truth, 6) END AS recall,
           CASE WHEN n_candidates > 0
                THEN round(CAST(n_hits AS DOUBLE) / n_candidates, 6)
           END AS candidate_precision
    FROM agg
    """,
    doc="Candidate-recall evaluation of the MinHash-LSH blocker vs the "
    "exact Jaccard>=0.8 ground truth -- the dedup family's twin of "
    "ann_recall_eval: recall = the fraction of true near-dup pairs the "
    "16-hash/4-band banding surfaces (what tunes bands x rows before a "
    "100 TB run), candidate_precision = how much of the candidate "
    "stream survives exact verification (the wasted-verify cost). "
    "Both arms are deterministic md5 constructions, so the whole "
    "evaluation value-hashes.",
)
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    truth = dedup.ngram_jaccard_pairs(docs, threshold=0.8).select(
        "id_a", "id_b"
    )
    sigs = dedup.minhash_signatures(docs, num_hashes=_NUM_HASHES, shingle_n=3)
    cand = dedup.lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS_PER_BAND
    )
    j = truth.withColumn("__t", F.lit(1)).join(
        cand.withColumn("__c", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    agg = j.agg(
        F.count("__t").cast("long").alias("n_truth"),
        F.count("__c").cast("long").alias("n_candidates"),
        F.count(
            F.when(F.col("__t").isNotNull() & F.col("__c").isNotNull(), 1)
        )
        .cast("long")
        .alias("n_hits"),
    )
    return agg.select(
        "n_truth",
        "n_candidates",
        "n_hits",
        F.when(
            F.col("n_truth") > 0,
            F.round(F.col("n_hits").cast("double") / F.col("n_truth"), 6),
        ).alias("recall"),
        F.when(
            F.col("n_candidates") > 0,
            F.round(
                F.col("n_hits").cast("double") / F.col("n_candidates"), 6
            ),
        ).alias("candidate_precision"),
    )


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split({_NORM}, ' ')) AS word FROM documents
    ),
    tf AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c
      FROM words WHERE word <> '' GROUP BY 1
    ),
    r AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word ASC) AS rnk
      FROM tf
    ),
    terms AS (
      SELECT round(ln(CAST(rnk AS DOUBLE)), 9) AS x,
             round(ln(CAST(c AS DOUBLE)), 9) AS y
      FROM r
    ),
    t2 AS (
      SELECT x, y,
             round(x * y, 9) AS xy,
             round(x * x, 9) AS xx,
             round(y * y, 9) AS yy
      FROM terms
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS vocab_size,
             round(sum(x), 6) AS sx,
             round(sum(y), 6) AS sy,
             round(sum(xy), 6) AS sxy,
             round(sum(xx), 6) AS sxx,
             round(sum(yy), 6) AS syy
      FROM t2
    ),
    fit AS (
      SELECT vocab_size, sx, sy, syy,
             CAST(vocab_size AS DOUBLE) * sxy - sx * sy AS num,
             CAST(vocab_size AS DOUBLE) * sxx - sx * sx AS den,
             CAST(vocab_size AS DOUBLE) * syy - sy * sy AS den_y
      FROM s
    ),
    sl AS (
      SELECT vocab_size, sx, sy, num, den, den_y,
             CASE WHEN den <> 0 THEN round(num / den, 6) END AS zipf_slope
      FROM fit
    )
    SELECT vocab_size, zipf_slope,
           CASE WHEN zipf_slope IS NOT NULL
                THEN round((sy - zipf_slope * sx) / vocab_size, 6)
           END AS intercept,
           CASE WHEN den <> 0 AND den_y <> 0
                THEN round((num * num) / (den * den_y), 6)
           END AS r2
    FROM sl
    """,
    doc="Zipf's-law fit of the corpus vocabulary: closed-form OLS of "
    "ln(frequency) on ln(rank) -- slope ~ -1 is the healthy-natural-"
    "text signature, a flattened slope flags template/boilerplate "
    "corpora and a steep one vocabulary collapse; with r2 as the "
    "power-law goodness. The corpus-health companion of "
    "text_vocab_coverage, sharing its machinery: exact ranks via "
    "distributed_total_rank (never a single-task vocabulary sort), "
    "then ONE map-side-combinable aggregation over the vocab-sized "
    "term table. Cross-engine float contract: ln terms and products "
    "at 9 dp, sums at 6 dp, the slope/intercept/r2 divisions computed "
    "from those rounded sums.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.ranking import (
        distributed_total_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    tf = text.word_counts(docs)
    ranked = distributed_total_rank(tf, "c", ["word"], descending=True)
    t2 = ranked.select(
        F.round(F.log(F.col("__rank").cast("double")), 9).alias("x"),
        F.round(F.log(F.col("c").cast("double")), 9).alias("y"),
    ).select(
        "x",
        "y",
        F.round(F.col("x") * F.col("y"), 9).alias("xy"),
        F.round(F.col("x") * F.col("x"), 9).alias("xx"),
        F.round(F.col("y") * F.col("y"), 9).alias("yy"),
    )
    s = t2.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.round(F.sum("x"), 6).alias("sx"),
        F.round(F.sum("y"), 6).alias("sy"),
        F.round(F.sum("xy"), 6).alias("sxy"),
        F.round(F.sum("xx"), 6).alias("sxx"),
        F.round(F.sum("yy"), 6).alias("syy"),
    )
    n_d = F.col("vocab_size").cast("double")
    fit = s.select(
        "vocab_size",
        "sx",
        "sy",
        "syy",
        (n_d * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (n_d * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
        (n_d * F.col("syy") - F.col("sy") * F.col("sy")).alias("den_y"),
    )
    sl = fit.select(
        "vocab_size",
        "sx",
        "sy",
        "num",
        "den",
        "den_y",
        F.when(
            F.col("den") != 0, F.round(F.col("num") / F.col("den"), 6)
        ).alias("zipf_slope"),
    )
    return sl.select(
        "vocab_size",
        "zipf_slope",
        F.when(
            F.col("zipf_slope").isNotNull(),
            F.round(
                (F.col("sy") - F.col("zipf_slope") * F.col("sx"))
                / F.col("vocab_size").cast("double"),
                6,
            ),
        ).alias("intercept"),
        F.when(
            (F.col("den") != 0) & (F.col("den_y") != 0),
            F.round(
                (F.col("num") * F.col("num"))
                / (F.col("den") * F.col("den_y")),
                6,
            ),
        ).alias("r2"),
    )


@register(
    "embed_diversity",
    oracle="""
    WITH e AS (
      SELECT label, embedding::DOUBLE[] AS ev,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ),
    comps AS (
      SELECT label, t.i AS idx, round(ev[t.i] / nrm, 9) AS c
      FROM e, UNNEST(range(1, len(ev) + 1)) AS t(i)
      WHERE nrm > 0
    ),
    n_per AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n FROM e WHERE nrm > 0
      GROUP BY 1
    ),
    sums AS (
      SELECT label, idx, round(sum(c), 6) AS s FROM comps GROUP BY 1, 2
    ),
    ssq AS (
      SELECT label, round(sum(round(s * s, 9)), 6) AS ssq
      FROM sums GROUP BY 1
    ),
    qsum AS (
      SELECT label, round(sum(round(c * c, 9)), 6) AS q
      FROM comps GROUP BY 1
    )
    SELECT n_per.label, n_per.n,
           CASE WHEN n_per.n > 1
                THEN round((ssq.ssq - qsum.q)
                           / (CAST(n_per.n AS DOUBLE) * (n_per.n - 1)), 6)
           END AS mean_pairwise_cos
    FROM n_per JOIN ssq USING (label) JOIN qsum USING (label)
    """,
    doc="Per-group embedding diversity WITHOUT a pair join: mean "
    "pairwise cosine of the unit-normalized vectors via the aggregate-"
    "vector identity sum_{i<>j} cos(vi,vj) = |sum v|^2 - sum |v|^2 -- "
    "O(n x d) component sums instead of the O(n^2) scan every "
    "pairwise-similarity formulation pays (at 10^9 vectors per group "
    "the pair join is impossible; this is one map-side-combinable "
    "aggregation). Low diversity = a collapsed/templated group worth "
    "down-weighting; the group-level companion of sample_cluster_"
    "balanced's per-item centrality. Float contract: 9-dp normalized "
    "components and term products, single-level 6-dp sums, divisions "
    "from rounded inputs; the algebraic identity itself is pinned "
    "against a brute-force pair mean in pytest.",
)
def embed_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dot = F.aggregate(
        F.zip_with("embedding", "embedding", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    e = emb.select("label", "embedding", F.sqrt(dot).alias("nrm")).filter(
        F.col("nrm") > 0
    )
    comps = persist_tracked(
        e.select(
            "label",
            F.posexplode("embedding").alias("idx", "x"),
            F.col("nrm"),
        ).select(
            "label",
            "idx",
            F.round(F.col("x").cast("double") / F.col("nrm"), 9).alias("c"),
        )
    )
    n_per = e.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sums = comps.groupBy("label", "idx").agg(
        F.round(F.sum("c"), 6).alias("s")
    )
    ssq = sums.groupBy("label").agg(
        F.round(F.sum(F.round(F.col("s") * F.col("s"), 9)), 6).alias("ssq")
    )
    qsum = comps.groupBy("label").agg(
        F.round(F.sum(F.round(F.col("c") * F.col("c"), 9)), 6).alias("q")
    )
    return (
        n_per.join(ssq, "label")
        .join(qsum, "label")
        .select(
            "label",
            "n",
            F.when(
                F.col("n") > 1,
                F.round(
                    (F.col("ssq") - F.col("q"))
                    / (F.col("n").cast("double") * (F.col("n") - 1)),
                    6,
                ),
            ).alias("mean_pairwise_cos"),
        )
    )


_EST_AGREE = " + ".join(
    f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(_NUM_HASHES)
)


@register(
    "dedup_estimate_eval",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
    ),
    mins AS (
      SELECT doc_id,
           {_MIN_EXPRS}
      FROM hashed GROUP BY doc_id
    ),
    banded AS (
{_BAND_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b,
             round(CAST({_EST_AGREE} AS DOUBLE) / {_NUM_HASHES}, 6)
               AS est_jaccard
      FROM cand c
      JOIN mins a ON a.doc_id = c.id_a
      JOIN mins b ON b.doc_id = c.id_b
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT id_a, id_b,
             round(shared / (sa.set_size + sb.set_size - shared), 6)
               AS exact_jaccard
      FROM shared
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
    )
    SELECT e.id_a, e.id_b, e.est_jaccard,
           COALESCE(x.exact_jaccard, 0.0) AS exact_jaccard,
           round(abs(e.est_jaccard - COALESCE(x.exact_jaccard, 0.0)), 6)
             AS abs_err
    FROM est e
    LEFT JOIN exact x ON x.id_a = e.id_a AND x.id_b = e.id_b
    """,
    doc="MinHash ESTIMATOR calibration over the LSH candidate pairs: "
    "per candidate, the signature-agreement Jaccard estimate "
    "(agreeing slots / 16) next to the exact shingle Jaccard and the "
    "absolute error -- the second half of the dedup evaluation story "
    "(dedup_recall_eval asks 'does the blocker surface true pairs'; "
    "this asks 'can the verify stage TRUST the signatures instead of "
    "re-shingling', which decides whether a 100 TB verify pass reads "
    "16-slot signatures or full text). Exact arm computed only over "
    "candidate-involved docs; a candidate sharing no shingle (hash "
    "collision) scores exact 0.",
)
def dedup_estimate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        persist_tracked,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = persist_tracked(
        dedup.minhash_signatures(docs, num_hashes=_NUM_HASHES, shingle_n=3)
    )
    cand = dedup.lsh_candidate_pairs(
        sigs, bands=_BANDS, rows_per_band=_ROWS_PER_BAND
    )
    agree = F.aggregate(
        F.zip_with(
            "__ma", "__mb", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = (
        cand.join(
            sigs.select(
                F.col("doc_id").alias("id_a"), F.col("minhash").alias("__ma")
            ),
            "id_a",
        )
        .join(
            sigs.select(
                F.col("doc_id").alias("id_b"), F.col("minhash").alias("__mb")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                agree.cast("double") / F.lit(float(_NUM_HASHES)), 6
            ).alias("est_jaccard"),
        )
    )
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    exact = dedup.ngram_jaccard_pairs(
        docs.join(ids, "doc_id", "left_semi"), threshold=0.0
    ).withColumnRenamed("jaccard", "exact_jaccard")
    return est.join(exact, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        "est_jaccard",
        F.coalesce("exact_jaccard", F.lit(0.0)).alias("exact_jaccard"),
        F.round(
            F.abs(
                F.col("est_jaccard")
                - F.coalesce("exact_jaccard", F.lit(0.0))
            ),
            6,
        ).alias("abs_err"),
    )


@register(
    "quality_calibration_curve",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
      WHERE len(string_split({_NORM}, ' ')) >= 2
    ),
    words AS (SELECT doc_id, UNNEST(t) AS w FROM toks),
    big AS (
      SELECT doc_id,
             UNNEST(t[1:len(t)-1]) AS w1,
             UNNEST(t[2:len(t)]) AS w2
      FROM toks
    ),
    m AS (SELECT doc_id, w1, w2, COUNT(*) AS m FROM big GROUP BY 1, 2, 3),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM words),
    lm AS (
      SELECT m.doc_id,
             ROUND(EXP(-SUM(m.m * LN((c2.c2 + 1.0) / (c1.c1 + v.v)))
                       / SUM(m.m)), 4) AS ppl
      FROM m JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY 1
    ),
    q AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             round(len(regexp_extract_all(text,
                       '(?i)\\b(the|and|of|with|a|to|in|is)\\b'))
                   / greatest(len(string_split_regex(trim(text), '\\s+')), 1),
                   4) AS stopword_ratio
      FROM documents
    ),
    j AS (
      SELECT q.doc_id, -lm.ppl AS score,
             CASE WHEN q.n_tokens BETWEEN 30 AND 5000
                   AND q.stopword_ratio >= 0.02
                  THEN 1 ELSE 0 END AS label
      FROM q JOIN lm USING (doc_id)
    ),
    r AS (
      SELECT doc_id, score, label,
             CAST(NTILE(10) OVER (ORDER BY score ASC, doc_id ASC) AS BIGINT)
               AS decile
      FROM j
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(label) AS BIGINT) AS n_pos,
           round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS pos_frac,
           round(avg(score), 6) AS mean_score
    FROM r GROUP BY 1
    """,
    doc="Reliability curve of the bigram-LM quality signal vs the "
    "heuristic gate label: score deciles (exact NTILE from "
    "distributed_total_rank + ntile_from_rank -- no global sort "
    "window) with per-decile positive fraction and mean score. The "
    "calibration companion of quality_auc_eval's single-number "
    "ranking check: AUC says whether the ordering agrees, this shows "
    "WHERE on the score axis it does -- a monotone pos_frac curve "
    "means thresholding works; the flat curve measured here is the "
    "per-decile view of the 0.499 AUC (the LM signal is uninformative "
    "on this synthetic corpus). Shares the LM/label contract with the "
    "AUC oracle verbatim.",
)
def quality_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.ranking import (
        distributed_total_rank,
        ntile_from_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    heur = text.quality_features(docs).select(
        "doc_id", "n_tokens", "stopword_ratio"
    )
    lm = text.bigram_lm_scores(docs).select("doc_id", "ppl")
    j = heur.join(lm, "doc_id").select(
        "doc_id",
        (-F.col("ppl")).alias("score"),
        F.when(
            F.col("n_tokens").between(30, 5000)
            & (F.col("stopword_ratio") >= 0.02),
            1,
        )
        .otherwise(0)
        .alias("label"),
    )
    ranked = distributed_total_rank(j, "score", ["doc_id"], descending=False)
    tiles = ranked.withColumn(
        "decile",
        ntile_from_rank(F.col("__rank"), F.col("__n"), 10).cast("long"),
    )
    return tiles.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
        F.round(
            F.sum("label").cast("double") / F.count(F.lit(1)), 6
        ).alias("pos_frac"),
        F.round(F.avg("score"), 6).alias("mean_score"),
    )


@register(
    "mixture_epochs",
    oracle=r"""
    WITH w(source, share) AS (VALUES ('src1', 0.6), ('src2', 0.2), ('src3', 0.2)),
    tok AS (
      SELECT source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
      FROM documents
    ),
    counts AS (
      SELECT t.source, w.share, CAST(sum(t.nt) AS BIGINT) AS n_tokens
      FROM tok t JOIN w USING (source) GROUP BY 1, 2
    ),
    budget AS (SELECT 2 * CAST(sum(n_tokens) AS BIGINT) AS b FROM counts)
    SELECT c.source, c.n_tokens,
           round(CAST(c.share AS DOUBLE), 6) AS target_share,
           round(CAST(budget.b AS DOUBLE) * c.share / c.n_tokens, 6)
             AS epochs,
           CAST(budget.b AS DOUBLE) * c.share / c.n_tokens > 4.0
             AS over_repeat_cap
    FROM counts c CROSS JOIN budget
    """,
    doc="Data-constrained epoch planning (Muennighoff et al. 2023): "
    "for a token budget (here 2x the weighted slices' corpus) and "
    "target mixture 60/20/20 over src1/src2/src3, the repeat factor "
    "each source must sustain -- epochs = budget x share / tokens -- "
    "with sources pushed past the ~4-epoch diminishing-returns cap "
    "flagged for weight rebalancing BEFORE the run burns compute. "
    "Completes the mixture family's planning side (resample/"
    "temperature act on rows; this answers whether the target weights "
    "are even FEASIBLE at the budget). One map-side-combined token "
    "sum per source; everything downstream is a sources-sized "
    "broadcast computation on exact BIGINTs divided once.",
)
def mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shares = {"src1": 0.6, "src2": 0.2, "src3": 0.2}
    w = spark.createDataFrame(
        list(shares.items()), "source string, share double"
    )
    counts = (
        docs.select("source", text.token_count_ws(F.col("text")).alias("nt"))
        .join(F.broadcast(w), "source")
        .groupBy("source", "share")
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
    )
    budget = counts.agg((F.lit(2) * F.sum("n_tokens")).cast("long").alias("b"))
    epochs = F.col("b").cast("double") * F.col("share") / F.col("n_tokens")
    return counts.crossJoin(F.broadcast(budget)).select(
        "source",
        "n_tokens",
        F.round(F.col("share"), 6).alias("target_share"),
        F.round(epochs, 6).alias("epochs"),
        (epochs > 4.0).alias("over_repeat_cap"),
    )


@register(
    "ts_ohlc_resample",
    oracle="""
    WITH ranked AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts ASC, event_id ASC) AS rf,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT user_id, bucket_ts,
           MAX(CASE WHEN rf = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rl = 1 THEN value END) AS close,
           COUNT(*) AS n_rows,
           round(AVG(value), 6) AS mean_value
    FROM ranked GROUP BY user_id, bucket_ts
    """,
    doc="OHLC downsampling (candlestick/metrics rollup) per (user, "
    "hour): operators/timeseries.py ohlc_resample. Open/close are "
    "argmin/argmax by (ts, event_id) carried as min/max over a "
    "lexicographic struct, so the WHOLE query is ONE map-side-combined "
    "aggregation (SortAggregate: struct min/max partials, single "
    "exchange) — no per-group window sort (the oracle's "
    "row_number formulation is exactly the plan this avoids; at 10^9 "
    "groups x wide buckets the window plan sorts the full input, the "
    "struct-agg plan only shuffles one partial state per group).",
)
def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.timeseries import ohlc_resample

    ev = load_table(spark, sf_dir, "events")
    out = ohlc_resample(
        ev, "ts", "value", ["user_id"], bucket="hour", tiebreak_cols=["event_id"]
    )
    return out.withColumn("mean_value", F.round("mean_value", 6))


@register(
    "retrieve_hybrid_rrf",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split({_NORM}, ' ')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY 1),
    qw AS (
      SELECT doc_id, term FROM words
      WHERE term IN ('merge', 'join', 'window', 'vector')
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qw GROUP BY 1, 2),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qw GROUP BY 1),
    s AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT AVG(dl) FROM dl) AS avgdl
    ),
    scored AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               LN(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
             ), 6) AS bm25
      FROM tf
      JOIN dft USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN s
      GROUP BY 1
    ),
    lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_lex
      FROM scored QUALIFY r_lex <= 20
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    cos AS (
      SELECT e.vec_id AS doc_id,
             round(list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[])
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                            e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(q.embedding::DOUBLE[],
                                              q.embedding::DOUBLE[]))),
                   6) AS cs
      FROM embeddings e, q WHERE e.vec_id <> 0
    ),
    vec AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id ASC) AS r_vec
      FROM cos QUALIFY r_vec <= 20
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec,
             round(COALESCE(1.0 / (60 + l.r_lex), 0)
                   + COALESCE(1.0 / (60 + v.r_vec), 0), 6) AS rrf_score
      FROM lex l FULL JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, r_lex, r_vec, rrf_score FROM fused
    ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
    """,
    doc="Hybrid retrieval with reciprocal-rank fusion (RRF, the "
    "Elasticsearch/Vespa default fusion rule, k=60): the lexical arm "
    "is BM25 top-20 (text.bm25_topk), the dense arm exact cosine "
    "top-20 for one query vector (similarity.cosine_topk), fused as "
    "sum(1/(60+rank)) with a full outer join over the two 20-row "
    "lists. Scale: both arms end in TakeOrdered top-k, so the fusion "
    "join and the rank windows run on 2x20 rows regardless of corpus "
    "size — rank-window cost is bounded by k, not the corpus.",
)
def retrieve_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    bm = text.bm25_topk(docs, ["merge", "join", "window", "vector"], k=20)
    # global-window-ok: bm25_topk returns at most k=20 rows — the rank
    # window's input is bounded by construction, not corpus-sized.
    w_lex = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex = bm.select(
        "doc_id", F.row_number().over(w_lex).cast("long").alias("r_lex")
    )
    dense = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=20)
    vec = dense.select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("r_vec"),
    )
    fused = lex.join(vec, "doc_id", "full_outer")
    score = F.coalesce(1.0 / (F.lit(60) + F.col("r_lex")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(60) + F.col("r_vec")), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id", "r_lex", "r_vec", F.round(score, 6).alias("rrf_score")
        )
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


@register(
    "sketch_join_size",
    oracle="""
    WITH counts AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1
    ),
    ds AS (SELECT unnest(range(4)) AS d),
    cms AS (
      SELECT d,
             ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' ||
                                 CAST(k AS VARCHAR)), 1, 8))::BIGINT
               % 1024 AS bucket,
             CAST(SUM(c) AS BIGINT) AS cnt
      FROM counts CROSS JOIN ds GROUP BY 1, 2
    ),
    ip AS (SELECT d, SUM(cnt * cnt) AS ip FROM cms GROUP BY 1),
    est AS (SELECT CAST(MIN(ip) AS BIGINT) AS cms_join_size FROM ip),
    ex AS (SELECT CAST(SUM(c * c) AS BIGINT) AS exact_pairs FROM counts)
    SELECT ex.exact_pairs, est.cms_join_size,
           round(CAST(est.cms_join_size AS DOUBLE) / ex.exact_pairs, 6)
             AS over_ratio
    FROM ex, est
    """,
    doc="Join-cardinality estimation from sketches alone (AMS/CMS "
    "inner product, Cormode & Muthukrishnan 2005 §4.2): the self-join "
    "size of lineitem on l_partkey (= F2, sum of squared key counts) "
    "estimated as the row-wise CMS inner product minimized over hash "
    "rows, next to the exact answer and the over-count ratio. This is "
    "the pre-flight a planner runs BEFORE a petabyte join: both "
    "inputs are kilobyte sketches (mergeable across shards/days), so "
    "pricing the join costs a 4x1024-cell product, not a scan. "
    "Estimate >= exact always (collision cross terms only add); the "
    "oracle rebuilds the identical sketch via the shared md5 bucket "
    "contract.",
)
def sketch_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.functions.caching import persist_tracked
    from delta_lake_pyspark_scd2_spark.operators import sketches

    li = load_table(spark, sf_dir, "lineitem")
    counts = persist_tracked(
        li.groupBy(F.col("l_partkey").alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    cms = sketches.count_min_build(counts, "k", "c")
    est = sketches.count_min_join_size(cms, cms)
    exact = counts.agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_pairs")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_pairs",
        "cms_join_size",
        F.round(
            F.col("cms_join_size").cast("double") / F.col("exact_pairs"), 6
        ).alias("over_ratio"),
    )


@register(
    "mixture_group_cap",
    oracle="""
    WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
    tot AS (SELECT SUM(n) AS t FROM counts),
    budgets AS (
      SELECT lang, CAST(FLOOR(0.25 * tot.t) AS BIGINT) AS b
      FROM counts, tot
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id ASC) AS rk
      FROM documents
    )
    SELECT r.doc_id, r.lang, r.n_chars
    FROM ranked r JOIN budgets USING (lang) WHERE r.rk <= b
    """,
    doc="Frequency capping (mixture.cap_per_group): no language may "
    "exceed 25% of the corpus — the RefinedWeb/C4-style per-domain "
    "cap that stops one mega-group from dominating a mixture; "
    "over-budget groups keep their best floor(share x N) docs by a "
    "total (n_chars, doc_id) ordering, under-budget groups pass "
    "through whole. The data-dependent per-group k distinguishes this "
    "from plain top-k-per-group: budgets come from one count agg "
    "crossed with the broadcast scalar total, ranking is a window "
    "partitioned BY THE GROUP — two shuffles on the group key at any "
    "corpus size, never a global sort. At sf0.01 only 'en' (43.6%) is "
    "trimmed, so the oracle exercises both branches.",
)
def mixture_group_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import mixture

    docs = load_table(spark, sf_dir, "documents")
    return mixture.cap_per_group(
        docs.select("doc_id", "lang", "n_chars"),
        "lang",
        0.25,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
    ).select("doc_id", "lang", "n_chars")


@register(
    "w_quantile_normalize",
    oracle="""
    WITH g AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars ASC, doc_id ASC) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS ng
      FROM documents
    ),
    ref AS (
      SELECT n_chars AS q_value,
             ROW_NUMBER() OVER (ORDER BY n_chars ASC, doc_id ASC) AS pos
      FROM documents
    ),
    n AS (SELECT COUNT(*) AS N FROM documents),
    p AS (
      SELECT doc_id, lang, n_chars,
             CAST(FLOOR((CASE WHEN ng = 1 THEN 0.5
                              ELSE (rk - 1.0) / (ng - 1.0) END)
                        * (n.N - 1)) AS BIGINT) + 1 AS pos
      FROM g, n
    )
    SELECT p.doc_id, p.lang, p.n_chars, r.q_value
    FROM p JOIN ref r USING (pos)
    """,
    doc="Quantile normalization across groups (Bolstad et al. 2003 at "
    "corpus scale; operators/ranking.py quantile_normalize): each "
    "doc's length score is replaced by the GLOBAL value at its "
    "within-language percentile, making per-group score scales "
    "comparable before mixture gates compare them. Scale: within-group "
    "ranks are group-partitioned windows; the global reference "
    "distribution rides distributed_total_rank (range-bucketed "
    "two-level rank, NO single-task sort — the oracle's global "
    "ROW_NUMBER is exactly the plan the engine avoids); the percentile "
    "lookup is an integer equi-join.",
)
def w_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.ranking import quantile_normalize

    docs = load_table(spark, sf_dir, "documents")
    return quantile_normalize(
        docs.select("doc_id", "lang", "n_chars"),
        "lang",
        "n_chars",
        ["doc_id"],
    ).select("doc_id", "lang", "n_chars", "q_value")


# ---------------------------------------------------------------------------
# Preference-based ranking (Bradley-Terry)
# ---------------------------------------------------------------------------


def _bradley_terry_oracle(iters: int) -> str:
    """Unrolled Bradley-Terry MM in SQL: one (denominator -> raw ->
    mean-normalize) CTE block per round — exactly the computation
    operators/ranking.bradley_terry runs, with the shared 9-dp
    denominator / 6-dp rating rounding so both engines feed identical
    literals into the next round (the kmeans/pagerank oracle
    contract). Every CTE is ``AS MATERIALIZED``: each round references
    the previous ratings TWICE (both duel endpoints), and DuckDB's
    default CTE inlining re-evaluates the whole chain per reference —
    measured ~20x blowup per round (8.6 s at 3 rounds, 168 s at 4);
    materialization makes the 5-round oracle 0.1 s."""
    parts = [
        "duels AS MATERIALIZED (SELECT CASE WHEN a.n_chars > b.n_chars THEN a.source "
        "ELSE b.source END AS winner, CASE WHEN a.n_chars > b.n_chars "
        "THEN b.source ELSE a.source END AS loser "
        "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
        "WHERE a.doc_id % 2 = 0 AND a.source <> b.source "
        "AND a.n_chars <> b.n_chars)",
        "directed AS MATERIALIZED (SELECT winner AS a, loser AS b, count(*) AS c "
        "FROM duels GROUP BY 1, 2)",
        "sym AS MATERIALIZED (SELECT a, b, CAST(sum(c) AS BIGINT) AS n FROM "
        "(SELECT a, b, c FROM directed "
        "UNION ALL SELECT b AS a, a AS b, c FROM directed) GROUP BY 1, 2)",
        "winst AS MATERIALIZED (SELECT a, CAST(sum(c) AS BIGINT) AS w "
        "FROM directed GROUP BY 1)",
        "items AS MATERIALIZED (SELECT s.item, CAST(coalesce(w.w, 0) AS BIGINT) AS wins, "
        "s.n_duels FROM (SELECT a AS item, CAST(sum(n) AS BIGINT) AS n_duels "
        "FROM sym GROUP BY 1) s LEFT JOIN winst w ON w.a = s.item)",
        "r0 AS MATERIALIZED (SELECT item, CAST(1.0 AS DOUBLE) AS p FROM items)",
    ]
    for t in range(iters):
        parts.append(
            f"d{t} AS MATERIALIZED (SELECT sym.a AS item, "
            "round(sum(n / (pi.p + pj.p)), 9) AS d "
            f"FROM sym JOIN r{t} pi ON pi.item = sym.a "
            f"JOIN r{t} pj ON pj.item = sym.b GROUP BY 1)"
        )
        parts.append(
            f"raw{t} AS MATERIALIZED (SELECT items.item, items.wins / d{t}.d AS raw "
            f"FROM items JOIN d{t} USING (item))"
        )
        parts.append(
            f"r{t + 1} AS MATERIALIZED (SELECT item, round(raw / "
            f"(SELECT avg(raw) FROM raw{t}), 6) AS p FROM raw{t})"
        )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT item, wins, n_duels, p AS rating"
        f"\n    FROM items JOIN r{iters} USING (item)\n    "
    )


@register(
    "rank_bradley_terry",
    bench=True,  # round-8 verdict #3
    oracle=_bradley_terry_oracle(iters=5),
    doc="Bradley-Terry preference ratings (Hunter 2004 MM, 5 fixed "
    "rounds) over a deterministic duel log — adjacent-doc-id pairs "
    "from different sources duel, longer document wins; the rating "
    "ranks SOURCES by how often their docs win, the aggregation "
    "behind RLHF preference models and arena leaderboards. Scale: the "
    "duel log reduces ONCE to a (winner, loser) pair-count aggregate "
    "(map-side combine); each MM round is two item-keyed joins plus "
    "one sum per item over that bounded pair table, state one row per "
    "item — nothing duel-sized reaches the driver. The iterative "
    "training itself is value-hash proven against a fully unrolled "
    "SQL MM (9-dp denominators / 6-dp ratings chain identical "
    "literals, the kmeans oracle contract).",
)
def rank_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.ranking import bradley_terry

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    even = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("__pair"),
        F.col("source").alias("__sa"),
        F.col("n_chars").alias("__ca"),
    )
    odd = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") - 1).alias("__pair"),
        F.col("source").alias("__sb"),
        F.col("n_chars").alias("__cb"),
    )
    duels = (
        even.join(odd, "__pair")
        .filter(
            (F.col("__sa") != F.col("__sb"))
            & (F.col("__ca") != F.col("__cb"))
        )
        .select(
            F.when(F.col("__ca") > F.col("__cb"), F.col("__sa"))
            .otherwise(F.col("__sb"))
            .alias("winner"),
            F.when(F.col("__ca") > F.col("__cb"), F.col("__sb"))
            .otherwise(F.col("__sa"))
            .alias("loser"),
        )
    )
    return bradley_terry(duels, iters=5)


def _kcenter_greedy_ctes(k: int, base: str = "v") -> tuple[list, str]:
    """Unrolled greedy k-center in SQL (one pick + best-sim update CTE
    pair per round) over the CTE named ``base`` — exactly
    operators/clustering.kcenter_select's computation: 6-dp-rounded
    cosines feed an incremental running max, so the oracle's
    ``greatest`` chain equals the engine's with no float-order drift.
    ``AS MATERIALIZED`` throughout (each round references the previous
    best-sim table more than once — the Bradley-Terry CTE-inlining
    lesson). Returns (cte_parts, final_select); parameterizing the
    base lets the oversampled variant reuse the identical greedy over
    its candidate set."""
    cos = (
        "round(list_dot_product(x.ve, {s}.ve) / "
        "(sqrt(list_dot_product(x.ve, x.ve)) * "
        "sqrt(list_dot_product({s}.ve, {s}.ve))), 6)"
    )
    parts = [
        f"p1 AS MATERIALIZED (SELECT vec_id, ve FROM {base} "
        "ORDER BY vec_id ASC LIMIT 1)",
        "sel1 AS MATERIALIZED (SELECT vec_id FROM p1)",
        f"b1 AS MATERIALIZED (SELECT x.vec_id, {cos.format(s='s')} AS best "
        f"FROM {base} x CROSS JOIN p1 s)",
    ]
    for t in range(2, k + 1):
        parts.append(
            f"p{t} AS MATERIALIZED (SELECT b{t - 1}.vec_id, "
            f"b{t - 1}.best, {base}.ve FROM b{t - 1} JOIN {base} USING (vec_id) "
            f"WHERE b{t - 1}.vec_id NOT IN (SELECT vec_id FROM sel{t - 1}) "
            "ORDER BY best ASC, vec_id ASC LIMIT 1)"
        )
        parts.append(
            f"sel{t} AS MATERIALIZED (SELECT vec_id FROM sel{t - 1} "
            f"UNION ALL SELECT vec_id FROM p{t})"
        )
        if t < k:
            parts.append(
                f"b{t} AS MATERIALIZED (SELECT x.vec_id, "
                f"greatest(b{t - 1}.best, {cos.format(s='s')}) AS best "
                f"FROM b{t - 1} JOIN {base} x USING (vec_id) CROSS JOIN p{t} s)"
            )
    finals = [
        "SELECT 1 AS sel_order, vec_id, CAST(NULL AS DOUBLE) "
        "AS coverage_sim FROM p1"
    ] + [
        f"SELECT {t} AS sel_order, vec_id, best AS coverage_sim FROM p{t}"
        for t in range(2, k + 1)
    ]
    return parts, "\n    UNION ALL ".join(finals)


def _kcenter_oracle(k: int) -> str:
    parts, final = _kcenter_greedy_ctes(k, base="v")
    parts = [
        "v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS ve "
        "FROM embeddings)"
    ] + parts
    return "\n    WITH " + ",\n    ".join(parts) + "\n    " + final + "\n    "


@register(
    "select_kcenter",
    oracle=_kcenter_oracle(k=8),
    doc="Greedy k-center / farthest-point selection (Gonzalez 1985, "
    "k=8) over the embeddings corpus — the coverage-maximizing subset "
    "behind coreset construction and diversity-first data selection; "
    "the greedy choice 2-approximates the optimal covering radius. "
    "Scale: per-point state is ONE double (max cosine to the selected "
    "set) updated against only the NEWEST center each round (broadcast "
    "literal, single map stage); each argmin is a distributed top-1 "
    "(TakeOrdered), driver state = k ids + one vector. The sequential "
    "greedy itself is value-hash proven against a fully unrolled SQL "
    "selection (6-dp cosine rounding makes the incremental running "
    "max equal the oracle's full max exactly).",
)
def select_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.kcenter_select(emb, k=8)


def _kcenter_oversampled_oracle(k: int, rounds: int, oversample: float) -> str:
    """Unrolled k-means||-style oversampled k-center: one
    (total → hash-draw → candidate-union → best-sim update) CTE block
    per sampling round, then the exact greedy unroll
    (:func:`_kcenter_greedy_ctes`) over the candidate set — exactly
    operators/clustering.kcenter_select_oversampled's computation.
    Determinism boundaries shared with the operator: cosines round to
    6 dp, the draw normalizer (a summation-order-dependent float SUM)
    rounds to 6 dp before the threshold division, and the draw itself
    is the md5 uniform contract."""
    l = float(max(1.0, oversample * k))
    cos_s = (
        "round(list_dot_product(x.ve, s.ve) / "
        "(sqrt(list_dot_product(x.ve, x.ve)) * "
        "sqrt(list_dot_product(s.ve, s.ve))), 6)"
    )
    cos_c = (
        "round(list_dot_product(x.ve, c.ve) / "
        "(sqrt(list_dot_product(x.ve, x.ve)) * "
        "sqrt(list_dot_product(c.ve, c.ve))), 6)"
    )
    parts = [
        "v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS ve "
        "FROM embeddings)",
        "s0 AS MATERIALIZED (SELECT vec_id, ve FROM v "
        "ORDER BY vec_id ASC LIMIT 1)",
        "cand0 AS MATERIALIZED (SELECT vec_id, ve FROM s0)",
        f"ob0 AS MATERIALIZED (SELECT x.vec_id, {cos_s} AS best "
        "FROM v x CROSS JOIN s0 s)",
    ]
    for r in range(rounds):
        draw = (
            f"(('0x' || substr(md5('kc{r}:' || CAST(b.vec_id AS VARCHAR)), "
            "1, 8))::BIGINT / 4294967296.0)"
        )
        parts.append(
            f"tot{r} AS (SELECT round(sum(1.0 - best), 6) AS t FROM ob{r})"
        )
        parts.append(
            f"new{r} AS MATERIALIZED (SELECT b.vec_id, v.ve "
            f"FROM ob{r} b JOIN v USING (vec_id) CROSS JOIN tot{r} "
            f"WHERE {draw} < {l!r} * (1.0 - b.best) / tot{r}.t "
            f"AND b.vec_id NOT IN (SELECT vec_id FROM cand{r}))"
        )
        parts.append(
            f"cand{r + 1} AS MATERIALIZED (SELECT * FROM cand{r} "
            f"UNION ALL SELECT * FROM new{r})"
        )
        parts.append(
            f"ob{r + 1} AS MATERIALIZED (SELECT b.vec_id, "
            "greatest(b.best, coalesce(mx.s, b.best)) AS best "
            f"FROM ob{r} b LEFT JOIN (SELECT x.vec_id, max({cos_c}) AS s "
            f"FROM v x CROSS JOIN new{r} c GROUP BY 1) mx USING (vec_id))"
        )
    gparts, final = _kcenter_greedy_ctes(k, base=f"cand{rounds}")
    return (
        "\n    WITH "
        + ",\n    ".join(parts + gparts)
        + "\n    "
        + final
        + "\n    "
    )


@register(
    "select_kcenter_oversampled",
    oracle=_kcenter_oversampled_oracle(k=8, rounds=3, oversample=2.0),
    doc="Approximate k-center for corpus-scale k (k-means|| pattern, "
    "Bahmani et al. 2012; k=8, 3 rounds, 2x oversample): a constant "
    "number of distance-proportional md5-draw sampling rounds replaces "
    "the exact greedy's k sequential corpus scans — each round is one "
    "rounded-total aggregation, one filtered draw, and one broadcast "
    "cross join + per-id max; the model-sized candidate set then "
    "reduces to k via the exact greedy. BOTH phases value-hash proven "
    "against a fully unrolled SQL replica (sampling rounds AND the "
    "final greedy chain bit-identical literals); radius-vs-exact "
    "quality pinned in tests/test_clustering.py via kcenter_coverage.",
)
def select_kcenter_oversampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    return clustering.kcenter_select_oversampled(
        emb, k=8, rounds=3, oversample=2.0
    )


@register(
    "text_fertility",
    oracle=r"""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END)
             AS BIGINT) AS n_ws_tokens,
           CAST(sum(CASE WHEN trim(regexp_replace(lower(text),
                         '[^a-z0-9]+', ' ', 'g')) = '' THEN 0
                ELSE len(string_split(trim(regexp_replace(lower(text),
                         '[^a-z0-9]+', ' ', 'g')), ' ')) END)
             AS BIGINT) AS n_word_tokens,
           round(CAST(sum(CASE WHEN trim(regexp_replace(lower(text),
                         '[^a-z0-9]+', ' ', 'g')) = '' THEN 0
                ELSE len(string_split(trim(regexp_replace(lower(text),
                         '[^a-z0-9]+', ' ', 'g')), ' ')) END) AS DOUBLE)
             / greatest(sum(CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END), 1), 6)
             AS fertility,
           round(CAST(sum(n_chars) AS DOUBLE)
             / greatest(sum(CASE WHEN trim(regexp_replace(lower(text),
                         '[^a-z0-9]+', ' ', 'g')) = '' THEN 0
                ELSE len(string_split(trim(regexp_replace(lower(text),
                         '[^a-z0-9]+', ' ', 'g')), ' ')) END), 1), 6)
             AS chars_per_token
    FROM documents
    GROUP BY 1, 2
    """,
    doc="Tokenizer fertility panel per (lang, source): subword-proxy "
    "tokens per whitespace token (the fertility metric tokenizer "
    "sizing optimizes) and chars per token (the compression proxy "
    "that predicts context-window cost per source). One map-side- "
    "combinable aggregation over exact BIGINT token sums — the "
    "per-doc token expressions are the value-hash-proven "
    "text_token_stats forms, so the whole panel oracles exactly.",
)
def text_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    ws = text.token_count_ws(c)
    wordish = F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))
    words = (
        F.when(wordish == "", F.lit(0))
        .otherwise(F.size(F.split(wordish, " ")))
    )
    return (
        docs.select("lang", "source", F.col("n_chars"),
                    ws.alias("__ws"), words.alias("__w"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__ws").cast("long").alias("n_ws_tokens"),
            F.sum("__w").cast("long").alias("n_word_tokens"),
            F.round(
                F.sum("__w").cast("double")
                / F.greatest(F.sum("__ws"), F.lit(1)),
                6,
            ).alias("fertility"),
            F.round(
                F.sum("n_chars").cast("double")
                / F.greatest(F.sum("__w"), F.lit(1)),
                6,
            ).alias("chars_per_token"),
        )
    )


@register(
    "export_curriculum",
    oracle="""
    WITH r AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars ASC, doc_id ASC)
               AS curriculum_pos,
             COUNT(*) OVER () AS n
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(curriculum_pos AS BIGINT) AS curriculum_pos,
           CAST(FLOOR((curriculum_pos - 1) * 8.0 / n) AS INT) AS shard
    FROM r
    """,
    doc="Curriculum-ordered export plan: every document gets a global "
    "easy-to-hard training position (difficulty proxy: n_chars, ties "
    "by doc_id) and a contiguous shard assignment (8 shards), so a "
    "trainer reading shards in order sees a monotone difficulty "
    "curriculum. The oracle's global ROW_NUMBER is exactly the "
    "single-task sort the engine avoids: positions come from "
    "ranking.distributed_total_rank (percentile-bucketed two-level "
    "rank), the shard id is arithmetic on (rank, n) — no global "
    "window anywhere on the scale path.",
)
def export_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.ranking import (
        distributed_total_rank,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = distributed_total_rank(
        docs, "n_chars", ["doc_id"], descending=False
    )
    return ranked.select(
        "doc_id",
        "n_chars",
        F.col("__rank").cast("long").alias("curriculum_pos"),
        F.floor((F.col("__rank") - 1) * 8.0 / F.col("__n"))
        .cast("int")
        .alias("shard"),
    )


def _label_prop_oracle(iters: int) -> str:
    """Unrolled semi-synchronous weighted LPA in SQL: per round two
    (vote -> argmax -> parity-gated update) CTE blocks — even-id nodes
    update first, then odd-id nodes against the half-updated labels,
    exactly operators/graph.label_propagation\'s computation (the
    parity schedule is what makes fixed-round LPA well-defined:
    fully synchronous LPA oscillates on bipartite-ish structure).
    Integer edge weights make every vote sum EXACT, so unlike the
    pagerank/kmeans oracles no rounding contract is needed; a node
    whose current label ties the max keeps it, else the lowest tied
    label wins — identical in both engines. ``AS MATERIALIZED``
    throughout (the Bradley-Terry CTE-inlining lesson)."""
    parts = [
        "items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
        "l_partkey AS p FROM lineitem WHERE l_partkey % 10 = 0)",
        "e AS MATERIALIZED (SELECT a.p AS p1, b.p AS p2, "
        "CAST(count(*) AS BIGINT) AS w FROM items a "
        "JOIN items b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)",
        "bo AS MATERIALIZED (SELECT p1 AS u, p2 AS v, w FROM e "
        "UNION ALL SELECT p2 AS u, p1 AS v, w FROM e)",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label "
        "FROM bo)",
    ]
    for t in range(2 * iters):
        parity = t % 2
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT bo.v AS node, l.label AS cand, "
            f"CAST(sum(bo.w) AS BIGINT) AS s FROM bo "
            f"JOIN l{t} l ON l.node = bo.u GROUP BY 1, 2)"
        )
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT node, max(s) AS mx "
            f"FROM c{t} GROUP BY 1)"
        )
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT c.node, min(c.cand) AS pick, "
            "max(CASE WHEN c.cand = l.label THEN 1 ELSE 0 END) AS own_tied "
            f"FROM c{t} c JOIN m{t} m USING (node) "
            f"JOIN l{t} l USING (node) WHERE c.s = m.mx GROUP BY c.node)"
        )
        parts.append(
            f"l{t + 1} AS MATERIALIZED (SELECT l.node, "
            f"CASE WHEN l.node % 2 = {parity} AND a.pick IS NOT NULL "
            "THEN (CASE WHEN a.own_tied = 1 THEN l.label ELSE a.pick END) "
            "ELSE l.label END AS label "
            f"FROM l{t} l LEFT JOIN a{t} a USING (node))"
        )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node AS part_key, label AS community "
        f"FROM l{2 * iters}\n    "
    )


@register(
    "graph_label_prop",
    bench=True,  # round-8 verdict #3
    oracle=_label_prop_oracle(iters=3),
    doc="Weighted semi-synchronous label propagation (Raghavan et al. "
    "2007; Cordasco & Gargano 2010 parity schedule + prefer-current-"
    "label ties, 3 rounds) on the co-order part graph, weight = "
    "co-occurrence "
    "count: community detection by incident-weight majority vote — "
    "the refinement that splits a connected component into dense "
    "communities, which connected_components cannot. Per round ONE "
    "vertex-keyed join + one (node, label)-keyed map-side-combined "
    "sum + a per-node argmax window (partitioned by node, never a "
    "global sort); state is one (node, label) row per vertex. Integer "
    "weights make the unrolled oracle exact with NO rounding "
    "contract — the iterative vote itself value-hashes.",
)
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.graph import (
        label_propagation,
    )

    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_partkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p"))
        )
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    out = label_propagation(edges, "p1", "p2", weight_col="w", iters=3)
    return out.select(
        F.col("node").alias("part_key"), F.col("label").alias("community")
    )


def _bpe_rounds_oracle(rounds: int) -> str:
    """Unrolled distributed BPE merge rounds in SQL — exactly
    operators/bpe.distributed_merge_rounds's computation on the shared
    SEP-wrapped string representation: adjacent-pair counts (1-based
    list indexing), argmax by (count desc, left asc, right asc), one
    literal replace per round (both engines' replace() scans left to
    right non-overlapping, which IS greedy BPE application on the
    wrapped form). Integer counts — no rounding contract.
    ``AS MATERIALIZED`` throughout (each round's state is referenced
    by both the pair CTE and the next round)."""
    sep = "\x1f"
    parts = [
        "w AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM (SELECT unnest(string_split({_NORM}, ' ')) AS word "
        "FROM documents) WHERE word <> '' GROUP BY 1)",
        f"r1 AS MATERIALIZED (SELECT cnt, '{sep}' || "
        f"array_to_string(regexp_extract_all(word, '.'), '{sep}{sep}') "
        f"|| '</w>{sep}' AS rep FROM w)",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT cnt, "
            f"string_split(trim(rep, '{sep}'), '{sep}{sep}') AS syms "
            f"FROM r{t})"
        )
        parts.append(
            f"g{t} AS MATERIALIZED (SELECT syms[i] AS l, syms[i + 1] AS r, "
            f"CAST(sum(cnt) AS BIGINT) AS s FROM s{t}, "
            "UNNEST(range(1, len(syms))) AS t(i) GROUP BY 1, 2)"
        )
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT l, r, s FROM g{t} "
            "ORDER BY s DESC, l ASC, r ASC LIMIT 1)"
        )
        if t < rounds:
            parts.append(
                f"r{t + 1} AS MATERIALIZED (SELECT cnt, "
                f"replace(rep, '{sep}' || m.l || '{sep}{sep}' || m.r || "
                f"'{sep}', '{sep}' || m.l || m.r || '{sep}') AS rep "
                f"FROM r{t} CROSS JOIN m{t} m)"
            )
    finals = [
        f"SELECT {t} AS round, l AS left_sym, r AS right_sym, "
        f"s AS pair_count FROM m{t}"
        for t in range(1, rounds + 1)
    ]
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(finals)
        + "\n    "
    )


@register(
    "bpe_merge_rounds",
    oracle=_bpe_rounds_oracle(rounds=3),
    doc="The first 3 BPE merge selections computed distributedly "
    "(operators/bpe.distributed_merge_rounds): per round one "
    "adjacent-symbol-pair explode + map-side-combined count, a "
    "distributed top-1 ((count desc, pair asc) TakeOrdered), and one "
    "literal-replace map over the SEP-wrapped symbol strings — whose "
    "left-to-right non-overlapping scan IS greedy BPE application. "
    "Driver state = one merge rule per round; the pair shuffle "
    "carries distinct adjacent pairs, never corpus text. Upgrades the "
    "BPE family's training head from rows-only to value-hash proven "
    "(the long driver-side merge loop on the compressed word dict "
    "stays rows-only by design).",
)
def bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    return bpe.distributed_merge_rounds(docs, rounds=3)


_BPE_ENC_ROUNDS = 16


def _bpe_encode_oracle(rounds: int) -> str:
    """The round-9 directive-#7 result: BPE ENCODING is SQL-expressible
    at a bounded merge count — without any per-word loop unroll. The
    enabling theorem (pinned in tests/test_bpe.py): a merge learned at
    rank r can never CREATE an occurrence of a pair learned at rank
    < r (new adjacencies always involve the symbol first formed at r,
    and any rule containing that symbol is learned later), so
    _encode_word's iterated lowest-rank-first loop equals applying the
    rules once each, in rank order, as greedy left-to-right
    non-overlapping replaces — exactly the SEP-wrapped ``replace``
    chain of _bpe_rounds_oracle. Training (rule derivation) and
    encoding therefore share ONE replace chain, carried per distinct
    word; per-doc token counts are an occurrence-weighted join. The
    word-length axis needs no cap at all; only the merge count is
    bounded (by the unroll depth)."""
    sep = "\x1f"
    parts = [
        "w AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM (SELECT unnest(string_split({_NORM}, ' ')) AS word "
        "FROM documents) WHERE word <> '' GROUP BY 1)",
        f"r1 AS MATERIALIZED (SELECT word, cnt, '{sep}' || "
        f"array_to_string(regexp_extract_all(word, '.'), '{sep}{sep}') "
        f"|| '</w>{sep}' AS rep FROM w)",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT cnt, "
            f"string_split(trim(rep, '{sep}'), '{sep}{sep}') AS syms "
            f"FROM r{t})"
        )
        parts.append(
            f"g{t} AS MATERIALIZED (SELECT syms[i] AS l, syms[i + 1] AS r, "
            f"CAST(sum(cnt) AS BIGINT) AS s FROM s{t}, "
            "UNNEST(range(1, len(syms))) AS t(i) GROUP BY 1, 2)"
        )
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT l, r, s FROM g{t} "
            "ORDER BY s DESC, l ASC, r ASC LIMIT 1)"
        )
        parts.append(
            f"r{t + 1} AS MATERIALIZED (SELECT word, cnt, "
            f"replace(rep, '{sep}' || m.l || '{sep}{sep}' || m.r || "
            f"'{sep}', '{sep}' || m.l || m.r || '{sep}') AS rep "
            f"FROM r{t} CROSS JOIN m{t} m)"
        )
    tail = f"""wt AS MATERIALIZED (
      SELECT word,
             CAST(len(string_split(trim(rep, '{sep}'), '{sep}{sep}'))
                  AS BIGINT) AS n
      FROM r{rounds + 1}
    ),
    dw AS (
      SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS word
      FROM documents
    ),
    pd AS (
      SELECT dw.doc_id, CAST(sum(wt.n) AS BIGINT) AS n
      FROM dw JOIN wt USING (word) WHERE dw.word <> '' GROUP BY 1
    )
    SELECT d.doc_id, CAST(coalesce(pd.n, 0) AS BIGINT) AS n_bpe_tokens
    FROM documents d LEFT JOIN pd USING (doc_id)
    """
    return "\n    WITH " + ",\n    ".join(parts) + ",\n    " + tail


@register(
    "bpe_encode_bounded",
    oracle=_bpe_encode_oracle(_BPE_ENC_ROUNDS),
    doc="BPE ENCODING value-hash proven at a 16-merge vocabulary "
    "(round-9 directive #7 — the encode loop was the family's last "
    "rows-only claim): merge rules come from the distributed trainer "
    "(operators/bpe.distributed_merge_rounds, fail-loud if the corpus "
    "yields fewer than 16), encoding runs through the REAL "
    "Arrow-batched bpe_encode mapInPandas, and the oracle re-derives "
    "the same rules by 16 unrolled replace-chain rounds then encodes "
    "every distinct word with the SAME chain — sound because rank-"
    "order replace-all application is provably identical to the "
    "encoder's lowest-rank-first loop (no merge can create a lower-"
    "ranked pair; property-fuzzed in tests/test_bpe.py). Per-doc "
    "counts are an occurrence-weighted word join; no word-length cap "
    "is needed, only the merge-count bound. The production row "
    "(bpe_tokenize, 100 merges) stays rows-only purely because a "
    "100-round unroll is impractical, not inexpressible.",
)
def bpe_encode_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    rounds = bpe.distributed_merge_rounds(
        docs, rounds=_BPE_ENC_ROUNDS
    ).collect()
    if len(rounds) < _BPE_ENC_ROUNDS:
        raise ValueError(
            f"corpus yields only {len(rounds)} BPE merges; "
            f"bpe_encode_bounded's oracle unrolls {_BPE_ENC_ROUNDS} "
            "rounds and would silently diverge"
        )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in sorted(rounds, key=lambda r: r["round"])
    ]
    enc = bpe.bpe_encode(docs, merges)
    return enc.select(
        "doc_id", F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens")
    )


_PACK_BUCKETS = [16, 32, 64, 128, 256, 512, 1024]
_PACK_OVERFLOW = 2048


def _bucket_case_sql(expr: str) -> str:
    cases = " ".join(
        f"WHEN {expr} <= {b} THEN {b}" for b in _PACK_BUCKETS
    )
    return f"CASE {cases} ELSE {_PACK_OVERFLOW} END"


@register(
    "pack_length_buckets",
    oracle=rf"""
    WITH t AS (
      SELECT CASE WHEN trim(text) = '' THEN 0
             ELSE len(string_split_regex(trim(text), '\s+')) END AS n
      FROM documents
    )
    SELECT {_bucket_case_sql('n')} AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS sum_tokens,
           CAST(count(*) * {_bucket_case_sql('n')} AS BIGINT)
             AS padded_tokens,
           round(1.0 - CAST(sum(n) AS DOUBLE)
                 / (count(*) * {_bucket_case_sql('n')}), 6) AS waste_frac
    FROM t
    GROUP BY 1
    """,
    doc="Sequence-length bucketing audit: every document lands in the "
    "smallest power-of-two length bucket that fits it (16..1024, "
    "overflow 2048 — an explicit threshold CASE, not float log2, so "
    "both engines bucket identically), and each bucket reports its "
    "padding waste (1 - real/padded tokens) — the number a trainer "
    "tunes batch-shape bucketing against, since waste is compute "
    "burned on pad tokens. One map-side-combinable aggregation over "
    "the value-hash-proven whitespace token count.",
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = text.token_count_ws(F.col("text"))
    bucket = F.lit(_PACK_OVERFLOW)
    for b in reversed(_PACK_BUCKETS):
        bucket = F.when(n <= b, F.lit(b)).otherwise(bucket)
    return (
        docs.select(bucket.alias("bucket"), n.alias("__n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").cast("long").alias("sum_tokens"),
            (F.count(F.lit(1)) * F.col("bucket"))
            .cast("long")
            .alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.sum("__n").cast("double")
                / (F.count(F.lit(1)) * F.col("bucket")),
                6,
            ).alias("waste_frac"),
        )
    )


@register(
    "ann_filtered_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5
    ),
    c AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS cv FROM embeddings
      WHERE label % 3 = 0
    ),
    scored AS (
      SELECT query_id, vec_id, label,
             {_COS.format(a='qv', b='cv')} AS cos_sim
      FROM c, q WHERE vec_id <> query_id
    )
    SELECT query_id, vec_id AS neighbor_id, label, rank, cos_sim FROM (
      SELECT query_id, vec_id, label, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc="FILTERED vector search (the label-predicate variant every "
    "retrieval stack needs): exact cosine top-k restricted to corpus "
    "rows passing a metadata predicate (label % 3 = 0). The predicate "
    "applies BEFORE any distance arithmetic — pre-filtering, pushed "
    "to the parquet scan, so cost scales with the filtered corpus and "
    "k is always filled; the broken alternative (post-filtering an "
    "unfiltered index probe) silently under-fills k at selective "
    "predicates. At 100 TB the corpus is partitioned/z-ordered on the "
    "filter columns so the predicate prunes files, and the same "
    "pre-filter composes with the IVF probe path (filter the "
    "assigned-bucket scan, not the result).",
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("label") % 3 == 0)
    hits = similarity.cosine_topk(corpus, queries, k=10)
    labels = emb.select("vec_id", "label")
    return (
        hits.join(
            labels, hits["neighbor_id"] == labels["vec_id"]
        )
        .select("query_id", "neighbor_id", "label", "rank", "cos_sim")
    )


@register(
    "events_value_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, med.med,
             abs(e.value - med.med) AS adev
      FROM events e JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.event_id, d.event_type, d.value,
           round(0.6745 * (d.value - d.med) / mad.mad, 6) AS mz
    FROM dev d JOIN mad USING (event_type)
    WHERE mad.mad > 0
      AND abs(round(0.6745 * (d.value - d.med) / mad.mad, 6)) > 3.5
    """,
    doc="Robust value-distribution outlier gate per event_type "
    "(operators/timeseries.robust_value_outliers; Iglewicz-Hoaglin "
    "modified z-score, |mz| > 3.5): median and MAD have a 50% "
    "breakdown point, so a burst of corrupt values cannot drag the "
    "gate open around itself — the failure mode the mean/stddev "
    "monitor (events_volume_anomaly) is blind to. Two exact-median "
    "grouped aggregations (Spark percentile == DuckDB quantile_cont "
    "double for double) with broadcast joins back; MAD = 0 groups "
    "excluded by convention.",
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.timeseries import (
        robust_value_outliers,
    )

    events = load_table(spark, sf_dir, "events")
    return robust_value_outliers(
        events, "event_type", "value", id_cols=["event_id"]
    )


@register(
    "retrieve_rerank",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split({_NORM}, ' ')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY 1),
    qw AS (
      SELECT doc_id, term FROM words
      WHERE term IN ('merge', 'join', 'window', 'vector')
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qw GROUP BY 1, 2),
    dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qw GROUP BY 1),
    s AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT AVG(dl) FROM dl) AS avgdl
    ),
    cand AS (
      SELECT doc_id, bm25 FROM (
        SELECT tf.doc_id,
               ROUND(SUM(
                 LN(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
               ), 6) AS bm25
        FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN s
        GROUP BY 1
      ) ORDER BY bm25 DESC, doc_id ASC LIMIT 50
    ),
    q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ),
    reranked AS (
      SELECT cand.doc_id, cand.bm25,
             {_COS.format(a='qv', b='cv')} AS cos_sim
      FROM cand
      JOIN (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) e
        ON e.vec_id = cand.doc_id
      CROSS JOIN q
    )
    SELECT doc_id, bm25, cos_sim, rank FROM (
      SELECT doc_id, bm25, cos_sim,
             ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS rank
      FROM reranked
    ) WHERE rank <= 10
    """,
    doc="Two-stage retrieval (the production RAG shape): BM25 top-50 "
    "lexical candidates, then dense rerank by embedding cosine to the "
    "query vector, top-10. Stage 1 is the proven bm25_topk plan "
    "(pre-shuffle term filter, broadcast scalars, TakeOrdered); stage "
    "2 touches ONLY the 50 candidates — the rerank join and cosine "
    "arithmetic are candidate-sized, never corpus-sized, which is the "
    "entire point of the cascade at 100 TB. The rank window is a "
    "bounded <=50-row input (global-window-ok).",
)
def retrieve_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    cand = text.bm25_topk(
        docs, ["merge", "join", "window", "vector"], k=50
    )
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][
        "embedding"
    ]
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    scored = (
        cand.join(emb, cand["doc_id"] == emb["vec_id"])
        .select(
            "doc_id",
            "bm25",
            F.round(similarity.cosine(F.col("embedding"), qlit), 6).alias(
                "cos_sim"
            ),
        )
    )
    # global-window-ok: bounded input (<= 50 candidate rows)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("doc_id", "bm25", "cos_sim", "rank")
    )


@register(
    "quality_winsorize",
    oracle="""
    WITH b AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents GROUP BY 1
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           round(least(greatest(CAST(d.n_chars AS DOUBLE), b.lo), b.hi), 6)
             AS w_value,
           CAST(d.n_chars < b.lo OR d.n_chars > b.hi AS BOOLEAN)
             AS was_clipped
    FROM documents d JOIN b USING (lang)
    """,
    doc="Per-group winsorization: clamp each document's length score "
    "to its language's exact [p05, p95] band — the standard tail "
    "taming before quality scores feed mixture weights or thresholds "
    "(a handful of megadocs would otherwise own a mean-based gate). "
    "Exact group quantiles as ONE grouped aggregation (Spark "
    "percentile == DuckDB quantile_cont double for double) broadcast "
    "back; pairs with w_quantile_normalize (cross-group alignment) "
    "and events_value_outliers (robust flagging) as the score-"
    "conditioning trio.",
)
def quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.groupBy("lang").agg(
        F.percentile(F.col("n_chars"), F.lit(0.05)).alias("__lo"),
        F.percentile(F.col("n_chars"), F.lit(0.95)).alias("__hi"),
    )
    v = F.col("n_chars").cast("double")
    return (
        docs.join(F.broadcast(bounds), "lang")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(
                F.least(F.greatest(v, F.col("__lo")), F.col("__hi")), 6
            ).alias("w_value"),
            ((v < F.col("__lo")) | (v > F.col("__hi"))).alias("was_clipped"),
        )
    )


@register(
    "ann_ivf_filtered_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS ve FROM embeddings
    ),
    f AS (SELECT vec_id, ve FROM v WHERE label % 3 = 0),
    cents AS (
      SELECT vec_id AS centroid_id, ve AS cv FROM v WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, centroid_id FROM (
        SELECT f.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY f.vec_id
                                  ORDER BY {_COS.format(a='f.ve', b='cv')} DESC,
                                           c.centroid_id ASC) AS rn
        FROM f, cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, centroid_id, qv FROM (
        SELECT q.vec_id AS query_id, c.centroid_id, q.ve AS qv,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS.format(a='q.ve', b='cv')} DESC,
                                           c.centroid_id ASC) AS prn
        FROM v q, cents c WHERE q.vec_id >= 490
      ) WHERE prn = 1
    ),
    scored AS (
      SELECT p.query_id, a.vec_id,
             {_COS.format(a='p.qv', b='f2.ve')} AS cos_sim
      FROM probes p
      JOIN assigned a ON a.centroid_id = p.centroid_id
      JOIN f f2 ON f2.vec_id = a.vec_id
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, rank, cos_sim FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    doc="Filtered IVF probe — the index-path half of filtered vector "
    "search (ann_filtered_topk is the exact half): the metadata "
    "predicate restricts the ASSIGNMENT table, so each probe scans "
    "only filtered rows of the query's nearest bucket and k fills "
    "from matching rows only. At 100 TB the assignment is stored "
    "bucketed by centroid_id and partitioned/z-ordered on the filter "
    "columns, making a filtered probe a doubly-pruned scan — the "
    "composition the pre-filter design enables and post-filtering "
    "cannot (it under-fills k at selective predicates).",
)
def ann_ivf_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("label") % 3 == 0)
    centroids = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") >= 490)
    return similarity.ivf_topk(corpus, centroids, queries, k=5)


@register(
    "mixture_loss_reweight",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
      WHERE len(string_split({_NORM}, ' ')) >= 2
    ),
    words AS (SELECT doc_id, UNNEST(t) AS w FROM toks),
    big AS (
      SELECT doc_id,
             UNNEST(t[1:len(t)-1]) AS w1,
             UNNEST(t[2:len(t)]) AS w2
      FROM toks
    ),
    m AS (SELECT doc_id, w1, w2, COUNT(*) AS m FROM big GROUP BY 1, 2, 3),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w) AS v FROM words),
    nll AS (
      SELECT m.doc_id,
             -ROUND(SUM(m.m * LN((c2.c2 + 1.0) / (c1.c1 + v.v)))
                    / SUM(m.m), 6) AS nll
      FROM m JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY 1
    ),
    s AS (
      SELECT d.source, n.nll FROM nll n JOIN documents d USING (doc_id)
    ),
    g AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             round(avg(nll), 6) AS mean_nll
      FROM s GROUP BY 1
    ),
    tot AS (
      SELECT count(*) AS n, round(avg(nll), 6) AS corpus_nll FROM s
    ),
    tilted AS (
      SELECT source, n_docs,
             round(CAST(n_docs AS DOUBLE) / tot.n, 6) AS base_share,
             mean_nll,
             round(mean_nll - tot.corpus_nll, 6) AS excess_nll,
             round(round(CAST(n_docs AS DOUBLE) / tot.n, 6)
                   * exp(mean_nll / 0.5), 6) AS mass
      FROM g CROSS JOIN tot
    )
    SELECT source, n_docs, base_share, mean_nll, excess_nll,
           round(mass / (SELECT sum(mass) FROM tilted), 4) AS weight
    FROM tilted
    """,
    doc="Loss-aware mixture reweighting (the DoReMi intuition as a "
    "closed-form heuristic; operators/mixture.loss_reweight): domains "
    "whose bigram-LM loss runs high relative to the corpus get more "
    "sampling mass via an exponential-tilt softmax over per-source "
    "mean NLL anchored at the natural share. The per-doc NLL is the "
    "value-hash-proven bigram_lm_scores signal; everything after is "
    "one map-side-combinable group aggregate plus softmax arithmetic "
    "on the 20-row source table (broadcast scalars). Weights round to "
    "4 dp under the text_bigram_ppl cross-engine exp() precedent.",
)
def mixture_loss_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.mixture import loss_reweight

    docs = load_table(spark, sf_dir, "documents")
    scored = text.bigram_lm_scores(docs).select(
        "doc_id", (-F.col("avg_logp")).alias("nll")
    )
    per_doc = scored.join(docs.select("doc_id", "source"), "doc_id")
    return loss_reweight(per_doc, "source", "nll", temperature=0.5)


@register(
    "export_interleaved",
    oracle="""
    WITH p AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY doc_id ASC) AS src_pos
      FROM documents
    )
    SELECT doc_id, source, CAST(src_pos AS BIGINT) AS src_pos,
           CAST(ROW_NUMBER() OVER (ORDER BY src_pos ASC, source ASC,
                                   doc_id ASC) AS BIGINT) AS interleave_pos
    FROM p
    """,
    doc="Fair source-interleaved export order (the anti-curriculum "
    "twin of export_curriculum): documents sort by their within-"
    "source position first, so a trainer reading in interleave_pos "
    "order sees sources round-robin — every window of the stream "
    "carries the full mixture instead of one source's contiguous "
    "block (the ordering bias that makes loss curves lie). "
    "Within-source positions are source-partitioned windows; the "
    "global order rides distributed_total_rank on (src_pos, source, "
    "doc_id) — the oracle's global ROW_NUMBER is exactly the "
    "single-task sort the engine avoids.",
)
def export_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators.ranking import (
        distributed_total_rank,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(F.col("doc_id").asc())
    positioned = docs.withColumn("src_pos", F.row_number().over(w))
    ranked = distributed_total_rank(
        positioned, "src_pos", ["source", "doc_id"], descending=False
    )
    return ranked.select(
        "doc_id",
        "source",
        F.col("src_pos").cast("long").alias("src_pos"),
        F.col("__rank").cast("long").alias("interleave_pos"),
    )


@register(
    "j11_bloom_join",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(25,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
    doc="Bloom-pruned join (explicit runtime-filter pattern): the "
    "urgent-orders build side folds into 2^19 packed filter words "
    "(sketches.bloom_long_array) riding a ONE-ROW broadcast as an "
    "array<long> column, the lineitem probe side drops non-matching "
    "rows with O(1) element_at+shift bit tests BEFORE the shuffle "
    "(bloom_hit_packed — per-row cost independent of filter size; "
    "the string-literal probe form rescans its literal per row and "
    "is disqualified above ~16 Kib, measured in bloom_long_array's "
    "docstring), and the real equi-join then removes the Bloom's "
    "~0.2% false positives. No false negatives makes the prune "
    "RESULT-NEUTRAL, so the oracle is the plain join — the "
    "optimization is verified exactly. At 100 TB this is the "
    "difference between shuffling the full fact table and shuffling "
    "only the ~selectivity fraction that can match (semi-join "
    "reduction with O(filter) coordination, no build-side "
    "broadcast).",
)
def j11_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_lake_pyspark_scd2_spark.operators import sketches

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    # size the filter to the build side: the default 16 Kib geometry
    # saturates at the ~30k urgent keys sf0.1 carries (measured: 598k
    # of 600k probe rows passed = no pruning); 2^19 bits puts m/n at
    # ~17 for ~0.2% FP
    bits = 1 << 19
    bloom = sketches.bloom_build(
        urgent.select(F.col("o_orderkey").cast("string").alias("k")),
        "k",
        bits=bits,
    )
    words = sketches.bloom_long_array(bloom, bits=bits)
    wdf = spark.createDataFrame([(words,)], "__bf array<long>")
    pruned = (
        li.crossJoin(F.broadcast(wdf))
        .filter(
            sketches.bloom_hit_packed(
                F.col("l_orderkey").cast("string"), F.col("__bf"), bits=bits
            )
        )
        .drop("__bf")
    )
    vol = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast(T.DecimalType(25, 4))
    return (
        pruned.join(urgent, pruned["l_orderkey"] == urgent["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(vol), 2).cast("double").alias("revenue"),
        )
    )
