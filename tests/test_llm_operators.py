"""Tests for dedup / similarity / text / multimodal operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture()
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="The  quick brown fox jumps over the lazy dog"),  # ws/case dup
        Row(doc_id=3, text="the quick brown fox jumps over the lazy cat"),  # near dup
        Row(doc_id=4, text="completely different content about spark engines"),
        Row(doc_id=5, text="tiny"),  # shorter than one shingle
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_groups(docs):
    out = dedup.exact_dedup(docs)
    groups = {r.keep_id: r.n_copies for r in out.collect()}
    assert groups[1] == 2  # docs 1+2 normalize to the same text
    assert groups[3] == 1 and groups[4] == 1 and groups[5] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got  # exact dup => jaccard 1.0
    assert (1, 3) in got and (2, 3) in got  # one-word difference
    assert all(4 not in p and 5 not in p for p in got)


def test_minhash_lsh_candidates(docs):
    sigs = dedup.minhash_signatures(docs)
    assert sigs.select(F.size("minhash")).distinct().collect()[0][0] == 16
    pairs = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in pairs  # identical signatures always collide
    # determinism: re-running produces identical signatures
    a = sorted(sigs.collect(), key=lambda r: r.doc_id)
    b = sorted(dedup.minhash_signatures(docs).collect(), key=lambda r: r.doc_id)
    assert [r.minhash for r in a] == [r.minhash for r in b]


def test_simhash_properties(docs):
    out = docs.select("doc_id", dedup.simhash(F.col("text")).alias("sh")).collect()
    sh = {r.doc_id: r.sh for r in out}
    assert sh[1] == sh[2]  # normalization-equal docs hash equal
    assert all(v >= 0 for v in sh.values())
    # near-dup should be closer than unrelated
    d_near = bin(sh[1] ^ sh[3]).count("1")
    d_far = bin(sh[1] ^ sh[4]).count("1")
    assert d_near < d_far


def test_cosine_topk_self_similarity(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),   # close to 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),   # orthogonal to 0
        Row(vec_id=3, embedding=[-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows)
    out = similarity.cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [1, 2, 3]
    assert all(r.neighbor_id != 0 for r in out)


def test_ivf_assignment(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[0.0, 1.0]),
        Row(vec_id=10, embedding=[0.9, 0.1]),
        Row(vec_id=11, embedding=[0.1, 0.9]),
    ]
    df = spark.createDataFrame(rows)
    cents = df.filter(F.col("vec_id") < 2)
    assigned = {r.vec_id: r.centroid_id for r in
                similarity.assign_to_centroids(df, cents).collect()}
    assert assigned[10] == 0 and assigned[11] == 1


def _near_dup_vectors():
    """60 deterministic 8-dim vectors in 20 clusters of 3 near-identical
    copies: intra-cluster cosine > 0.99, inter-cluster well below."""
    rows = []
    vid = 0
    for c in range(20):
        base = [((7 * c + 3 * d) % 17) - 8.0 for d in range(8)]
        for copy in range(3):
            vec = [x + 0.01 * copy * ((d + c) % 3 - 1) for d, x in enumerate(base)]
            rows.append(Row(vec_id=vid, embedding=[float(x) for x in vec]))
            vid += 1
    return rows


def test_embedding_lsh_subset_and_recall(spark):
    df = spark.createDataFrame(_near_dup_vectors())
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(df, threshold=0.95).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_lsh_pairs(df, dim=8, threshold=0.95).collect()
    }
    assert len(exact) >= 20  # the construction really makes near-dups
    assert lsh <= exact  # exact verification => precision 1.0
    assert len(lsh) / len(exact) >= 0.9  # banding recall at cos>0.95
    # determinism: hyperplanes are md5-derived, not RNG-seeded
    again = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_lsh_pairs(df, dim=8, threshold=0.95).collect()
    }
    assert again == lsh


def test_text_quality_and_langid(spark):
    rows = [
        Row(doc_id=1, text="the cat and the dog play with a ball", lang="en"),
        Row(doc_id=2, text="der Hund und die Katze spielen mit dem Ball", lang="de"),
        Row(doc_id=3, text="le chat et les chiens jouent avec une balle", lang="fr"),
    ]
    df = spark.createDataFrame(rows)
    pred = {r.doc_id: r.lang_pred for r in text.language_id(df).collect()}
    assert pred == {1: "en", 2: "de", 3: "fr"}
    q = text.quality_features(df).collect()[0]
    assert q.n_tokens == 9
    assert 0 < q.stopword_ratio <= 1


def test_multimodal_resize_and_frames(spark, docs):
    payloads = multimodal.attach_binary_payload(docs)
    resized = {r.doc_id: r for r in multimodal.resize_images(payloads).collect()}
    assert all(r.width == 224 and r.height == 224 for r in resized.values())
    assert len(resized[1].payload) == 16 + 4  # md5 + stamped geometry
    frames = multimodal.sample_frames(payloads, every_ms=500).collect()
    by_doc: dict = {}
    for f in frames:
        by_doc.setdefault(f.doc_id, []).append(f)
    assert set(by_doc) == {r.doc_id for r in docs.collect()}
    for doc_frames in by_doc.values():
        nos = sorted(f.frame_no for f in doc_frames)
        assert nos == list(range(len(nos)))  # dense frame numbering
        assert all(f.frame_ts_ms == f.frame_no * 500 for f in doc_frames)
    # deterministic across runs
    again = multimodal.sample_frames(payloads, every_ms=500).collect()
    assert {(f.doc_id, f.frame_no, bytes(f.frame)) for f in frames} == {
        (f.doc_id, f.frame_no, bytes(f.frame)) for f in again
    }


def test_multimodal_extract_features(spark, docs):
    payloads = multimodal.attach_binary_payload(docs)
    feats = multimodal.extract_features(payloads).collect()
    assert len(feats) == docs.count()
    by_id = {r.doc_id: r for r in feats}
    assert by_id[1].n_bytes == len("the quick brown fox jumps over the lazy dog")
    assert len(by_id[1].features) == 8
    assert 64 <= by_id[1].width <= 319 and 64 <= by_id[1].height <= 319
    # deterministic across runs
    again = {r.doc_id: r for r in multimodal.extract_features(payloads).collect()}
    assert again[1].content_md5 == by_id[1].content_md5
    assert again[1].features == by_id[1].features


def test_ivf_multiprobe_recall_monotone(spark):
    """nprobe=1 misses neighbors in adjacent buckets; raising nprobe
    recovers them, and at nprobe=|centroids| IVF equals exact search."""
    rows = _near_dup_vectors()
    df = spark.createDataFrame(rows)
    cents = df.filter(F.col("vec_id") % 3 == 0).limit(8)
    queries = df.filter(F.col("vec_id") < 6)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(df, queries, k=2).collect()
    }
    recalls = []
    for nprobe in (1, 2, 8):
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                df, cents, queries, k=2, nprobe=nprobe
            ).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls == sorted(recalls)  # recall monotone in nprobe
    assert recalls[-1] == 1.0  # probing every bucket == exact


def test_ivf_topk_sweep_matches_per_nprobe_runs(spark):
    """ivf_topk_sweep's one-pass fan-out is exactly ivf_topk run at
    each nprobe — same candidates, ranks, and similarities."""
    rows = _near_dup_vectors()
    df = spark.createDataFrame(rows)
    cents = df.filter(F.col("vec_id") % 3 == 0).limit(8)
    queries = df.filter(F.col("vec_id") < 6)
    sweep = similarity.ivf_topk_sweep(
        df, cents, queries, k=2, nprobes=(1, 2, 8)
    ).collect()
    for nprobe in (1, 2, 8):
        want = {
            (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
            for r in similarity.ivf_topk(
                df, cents, queries, k=2, nprobe=nprobe
            ).collect()
        }
        got = {
            (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
            for r in sweep
            if r.nprobe == nprobe
        }
        assert got == want, f"sweep diverges from ivf_topk at nprobe={nprobe}"


def test_prefix_jaccard_boundary_set_size_multiple_of_five(spark):
    """Regression (sf0.1 oracle sweep): with t=0.8 and |B| divisible by
    5, the old floor((1-t)*n)+1 prefix length lost one slot to binary
    rounding (1-0.8 = 0.19999...) and dropped a true pair whose first
    common shingle sat exactly at the boundary rank."""
    words = [f"w{i:02d}" for i in range(1, 13)]
    b_text = " ".join(words)        # 12 words -> 10 shingles
    a_text = " ".join(words[2:])    # 10 words -> 8 shingles, all in B
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=a_text), Row(doc_id=2, text=b_text)]
    )
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert full == {(1, 2, 0.8)}  # J = 8 / (8 + 10 - 8)
    pre = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs_prefix(docs, threshold=0.8).collect()
    }
    assert pre == full


def test_embedding_lsh_oracle_buckets_match_duckdb(spark):
    """The registered LSH oracle replicates Spark's hyperplane banding
    exactly — checked at threshold 0.2 where the corpus yields hundreds
    of pairs (the registered 0.9 query is empty on this corpus, which
    would let a broken bucket formula pass unnoticed)."""
    import duckdb

    from delta_lake_pyspark_scd2_spark.plans import llm_ops as L
    from delta_lake_pyspark_scd2_spark.plans.registry import REGISTRY
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    got = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in dedup.embedding_lsh_pairs(
            emb, threshold=0.2, bands=L._LSH_BANDS, bits_per_band=L._LSH_BITS
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    sql = REGISTRY["dedup_embedding_lsh"].oracle.replace(">= 0.9", ">= 0.2")
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got and got == want


def test_redact_pii_and_counts(spark):
    rows = [
        (1, "mail me at jo.doe+x@sub.example.org or call +1 (415) 555-0199 now"),
        (2, "two mails a@b.io c@d.co; digits 12345678 inline"),
        (3, "clean text, no pii at all"),
        (4, "edge: not-an-email @@ nor a phone 12 34"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.redacted, r.n_emails, r.n_phones)
           for r in text.redact_pii(df).collect()}
    assert got[1] == ("mail me at [EMAIL] or call [PHONE] now", 1, 1)
    assert got[2] == ("two mails [EMAIL] [EMAIL]; digits [PHONE] inline", 2, 1)
    assert got[3] == ("clean text, no pii at all", 0, 0)
    assert got[4] == ("edge: not-an-email @@ nor a phone 12 34", 0, 0)


def test_chunk_tokens_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(95))
    df = spark.createDataFrame(
        [(1, words), (2, "only three tokens"), (3, "  padded   spacing  ")],
        "doc_id int, text string",
    )
    from delta_lake_pyspark_scd2_spark.operators.text import chunk_tokens

    out = chunk_tokens(df, window=50, step=40).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_ix, r.chunk, r.n_tokens))
    # 95 tokens -> starts 0, 40, 80: full window, full window, 15-token tail
    c1 = sorted(by_doc[1])
    assert [(ix, n) for ix, _, n in c1] == [(0, 50), (1, 50), (2, 15)]
    assert c1[0][1].split(" ")[:2] == ["w0", "w1"]
    assert c1[1][1].split(" ")[0] == "w40"  # 10-token overlap with chunk 0
    assert c1[0][1].split(" ")[-10:] == c1[1][1].split(" ")[:10]
    assert by_doc[2] == [(0, "only three tokens", 3)]
    assert by_doc[3] == [(0, "padded spacing", 2)]  # whitespace normalized


def test_ivf_persisted_index_matches_inflight(spark, tmp_path):
    """build_ivf_index + ivf_search_index == ivf_topk at the same
    (centroids, nprobe, k), and the probe scan reads ONLY the probed
    buckets' files (manifest-level partition pruning)."""
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        build_ivf_index,
        ivf_search_index,
        ivf_topk,
    )
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id") < 5)

    index = build_ivf_index(emb, centroids, str(tmp_path / "ivf"))
    got = ivf_search_index(index, centroids, queries, k=5, nprobe=2)
    exp = ivf_topk(emb, centroids, queries, k=5, nprobe=2)
    key = lambda r: (r.query_id, r.rank)
    got_rows = {key(r): (r.neighbor_id, r.cos_sim) for r in got.collect()}
    exp_rows = {key(r): (r.neighbor_id, r.cos_sim) for r in exp.collect()}
    assert got_rows == exp_rows and got_rows

    # pruning pin: a probed-bucket read touches only those partitions
    bucket_df = index.read_partitions(
        [{"centroid_id": "0"}, {"centroid_id": "3"}]
    )
    for f in bucket_df.inputFiles():
        assert "centroid_id=0" in f or "centroid_id=3" in f

    # index versions like any table: rebuild commits a new version
    assert index.history()[0]["operation"] == "CREATE"


def test_media_phash_pairs_hamming_semantics(spark):
    from delta_lake_pyspark_scd2_spark.operators import multimodal

    # hand-built 60-bit hashes: b = a with 2 bits flipped (caught),
    # c = a with 20 bits flipped (rejected), d isolated
    a = 0b101010101010101010101010101010101010101010101010101010101010
    b = a ^ 0b11  # hamming 2
    c = a ^ ((1 << 20) - 1)  # hamming 20
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, 12345)], "doc_id long, phash long"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.media_phash_pairs(df, max_hamming=6).collect()
    }
    assert pairs == {(1, 2): 2}


def test_media_phash_identical_payloads_pair_at_zero(spark):
    from delta_lake_pyspark_scd2_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "same bytes"), (2, "same bytes"), (3, "other")],
        "doc_id long, text string",
    )
    out = multimodal.media_phash_pairs(
        multimodal.attach_binary_payload(docs)
    ).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 0)]


def test_duplicate_spans_hand_case(spark):
    """Window=2 over three tiny docs with a known shared span."""
    rows = [
        # "a b" occurs in docs 1 and 2; "b b" repeats inside doc 3
        (1, "a b c"),          # windows: "a b", "b c"
        (2, "x a b"),          # windows: "x a", "a b"
        (3, "b b b"),          # windows: "b b", "b b"  (self-repeat)
        (4, "q"),              # shorter than window -> excluded
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from delta_lake_pyspark_scd2_spark.operators.dedup import duplicate_spans

    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in duplicate_spans(df, window=2).collect()
    }
    assert got == {
        1: (2, 1, 0.5),
        2: (2, 1, 0.5),
        3: (2, 2, 1.0),
    }


def test_remove_duplicate_spans_keep_first(spark):
    """ExactSubstr keep-first policy: the (doc_id, pos)-earliest copy
    of a repeated span survives; all other copies are cut."""
    rows = [
        (1, "a b c d"),     # span "a b" (w=2) first occurs here at pos 1
        (2, "x a b y"),     # its copy at pos 2 is removed -> "x y"
        (3, "q r"),         # untouched
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from delta_lake_pyspark_scd2_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in remove_duplicate_spans(df, window=2).collect()
    }
    assert got[1] == (4, 0, "a b c d")
    assert got[2] == (4, 2, "x y")
    assert got[3] == (2, 0, "q r")


def test_remove_duplicate_spans_full_duplicate_doc(spark):
    """A verbatim copy of another doc loses every token."""
    rows = [(1, "a b c d e"), (2, "a b c d e")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from delta_lake_pyspark_scd2_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    got = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in remove_duplicate_spans(df, window=2).collect()
    }
    assert got[1] == (0, "a b c d e")
    assert got[2] == (5, "")


def test_hashed_embedding_dense_matches_sparse_and_feeds_ann(spark, sf_dir):
    from delta_lake_pyspark_scd2_spark.operators.text import (
        hashed_tfidf_embedding,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sparse = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in hashed_tfidf_embedding(docs, dense=False, dim=32).collect()
    }
    dense = hashed_tfidf_embedding(docs, dense=True, dim=32)
    for r in dense.collect():
        for j, v in enumerate(r["embedding"]):
            assert abs(v - sparse.get((r["doc_id"], j), 0.0)) < 1e-9
    # the dense form plugs straight into brute-force cosine top-k
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        cosine_topk,
    )

    top = cosine_topk(dense, dense.limit(2), k=3, id_col="doc_id")
    assert top.count() > 0


def test_time_bucket_gapfill_modes(spark):
    """Hand case across all four fill modes (TimescaleDB semantics:
    linear leaves leading/trailing gaps NULL, locf carries forward)."""
    import datetime as dt

    from delta_lake_pyspark_scd2_spark.operators.timeseries import (
        time_bucket_gapfill,
    )

    rows = [
        ("a", dt.datetime(2026, 1, 1, 0, 10), 1.0),
        ("a", dt.datetime(2026, 1, 1, 0, 40), 2.0),  # hour 0 -> 3.0
        ("a", dt.datetime(2026, 1, 1, 3, 5), 9.0),   # hours 1-2 gap
        ("b", dt.datetime(2026, 1, 1, 1, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, ["g", "ts", "v"])

    def run(mode):
        return sorted(
            (r["g"], r["bucket_ts"].hour, r["value"], r["filled"])
            for r in time_bucket_gapfill(
                df, "ts", "v", ["g"], bucket="hour", fill=mode
            ).collect()
        )

    assert run("none") == [
        ("a", 0, 3.0, 0), ("a", 1, None, 1), ("a", 2, None, 1),
        ("a", 3, 9.0, 0), ("b", 0, None, 1), ("b", 1, 5.0, 0),
        ("b", 2, None, 1), ("b", 3, None, 1),
    ]
    assert run("zero")[1] == ("a", 1, 0.0, 1)
    assert run("locf") == [
        ("a", 0, 3.0, 0), ("a", 1, 3.0, 1), ("a", 2, 3.0, 1),
        ("a", 3, 9.0, 0), ("b", 0, None, 1), ("b", 1, 5.0, 0),
        ("b", 2, 5.0, 1), ("b", 3, 5.0, 1),
    ]
    assert run("linear") == [
        ("a", 0, 3.0, 0), ("a", 1, 5.0, 1), ("a", 2, 7.0, 1),
        ("a", 3, 9.0, 0), ("b", 0, None, 1), ("b", 1, 5.0, 0),
        ("b", 2, None, 1), ("b", 3, None, 1),
    ]


def test_pq_quantization_recall_and_determinism(spark):
    """PQ on clustered vectors: the query's own vector ranks first,
    recall@5 is high within clusters, training is deterministic, and
    codes are m small ints (the 8x+ memory cut)."""
    import numpy as np

    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    rows = _near_dup_vectors()  # 20 clusters x 3 near-copies, 8-dim
    df = spark.createDataFrame(rows)
    books = S.pq_train(df, m_subspaces=4, k_codes=16, sample=60)
    again = S.pq_train(df, m_subspaces=4, k_codes=16, sample=60)
    assert books == again  # deterministic training

    codes = S.pq_encode(df, books)
    got = codes.collect()
    assert all(len(r["pq_codes"]) == 4 for r in got)
    assert all(0 <= c < 16 for r in got for c in r["pq_codes"])

    # query with vec 0: itself first; its 2 cluster siblings in top-5
    # (16 codes over 20 clusters means some cells are shared — ADC can
    # tie a sibling with a cell-mate, so top-3 would be flaky-strict)
    q = rows[0].embedding
    top = [r["vec_id"] for r in S.pq_topk(codes, books, q, k=5).collect()]
    assert top[0] == 0  # self-match exact under ADC too
    assert {1, 2} <= set(top)

    # exact-vs-ADC recall@5 across several queries
    X = np.asarray([r.embedding for r in rows])
    hits = tot = 0
    for qi in (0, 9, 30, 45):
        qv = X[qi]
        exact = list(np.argsort(((X - qv) ** 2).sum(axis=1))[:5])
        adc = [
            r["vec_id"]
            for r in S.pq_topk(codes, books, list(qv), k=5).collect()
        ]
        hits += len(set(exact) & set(adc))
        tot += 5
    assert hits / tot >= 0.8  # clustered data: PQ keeps most neighbors


def test_ivfpq_composes_and_recalls(spark):
    """IVF-PQ: bucket restriction + ADC scoring still finds the
    query's cluster siblings; probing all buckets converges to plain
    PQ's answer."""
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    rows = _near_dup_vectors()
    df = spark.createDataFrame(rows)
    cents = df.filter(F.col("vec_id") % 3 == 0).limit(8)
    books = S.pq_train(df, m_subspaces=4, k_codes=16, sample=60)
    q = rows[0].embedding

    got = [
        r["vec_id"]
        for r in S.ivfpq_topk(df, cents, books, q, k=3, nprobe=2).collect()
    ]
    assert got[0] == 0  # self in the probed bucket, exact under ADC
    assert {1, 2} & set(got)  # at least one sibling survives bucketing

    # probing every bucket == plain PQ over the whole corpus
    codes = S.pq_encode(df, books)
    full_pq = [r["vec_id"] for r in S.pq_topk(codes, books, q, k=5).collect()]
    all_probe = [
        r["vec_id"]
        for r in S.ivfpq_topk(df, cents, books, q, k=5, nprobe=8).collect()
    ]
    assert all_probe == full_pq


def test_cluster_balanced_sample_caps_and_centrality(spark):
    """Diversity cap: no cluster exceeds per_cluster, the kept members
    of each cluster are its MOST central (every kept sim >= every
    dropped sim within the cluster), and the op is deterministic
    across partitionings."""
    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    rows = _near_dup_vectors()
    df = spark.createDataFrame(rows)
    cents = df.filter(F.col("vec_id") % 3 == 0).limit(4)

    kept = S.cluster_balanced_sample(df, cents, per_cluster=2)
    per = {
        r["centroid_id"]: r["n"]
        for r in kept.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    assert per and all(n <= 2 for n in per.values())
    assert kept.count() < df.count()  # it actually prunes

    # centrality: within a cluster, kept sims dominate dropped sims
    full = S.cluster_balanced_sample(df, cents, per_cluster=10**6)
    kept_rows = {(r["vec_id"]): r for r in kept.collect()}
    for r in full.collect():
        if r["vec_id"] not in kept_rows:
            kept_in_cluster = [
                k for k in kept_rows.values()
                if k["centroid_id"] == r["centroid_id"]
            ]
            assert all(k["sim"] >= r["sim"] for k in kept_in_cluster)

    again = S.cluster_balanced_sample(df.repartition(7), cents, per_cluster=2)
    assert sorted((r["vec_id"], r["rank"]) for r in again.collect()) == sorted(
        (r["vec_id"], r["rank"]) for r in kept.collect()
    )


def test_containment_catches_excerpt_jaccard_misses(spark):
    from delta_lake_pyspark_scd2_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_containment_pairs,
    )

    container = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    excerpt = "alpha beta gamma delta epsilon zeta"  # prefix excerpt
    other = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, container), (2, excerpt), (3, other)],
        "doc_id long, text string",
    )
    cont = shingle_containment_pairs(docs, threshold=0.9).collect()
    assert [(r["contained_id"], r["container_id"], r["containment"])
            for r in cont] == [(2, 1, 1.0)]
    # the symmetric screen never sees it: union dominated by container
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0
    # direction matters: the container is NOT contained in the excerpt
    loose = {
        (r["contained_id"], r["container_id"])
        for r in shingle_containment_pairs(docs, threshold=0.2).collect()
    }
    assert (2, 1) in loose and (1, 2) in loose  # low threshold: both dirs
    tight = {
        (r["contained_id"], r["container_id"])
        for r in shingle_containment_pairs(docs, threshold=0.9).collect()
    }
    assert (1, 2) not in tight


def test_containment_prefix_equals_naive(spark):
    from delta_lake_pyspark_scd2_spark.operators.dedup import (
        shingle_containment_pairs,
        shingle_containment_pairs_prefix,
    )

    texts = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta"),  # excerpt of 1
        (3, "one two three four five six seven eight"),
        (4, "three four five six seven eight nine ten"),  # overlaps 3
        (5, "alpha beta gamma delta epsilon zeta"),  # duplicate of 2
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    for t in (0.5, 0.8, 1.0):
        naive = {
            (r["contained_id"], r["container_id"], r["containment"])
            for r in shingle_containment_pairs(docs, threshold=t).collect()
        }
        blocked = {
            (r["contained_id"], r["container_id"], r["containment"])
            for r in shingle_containment_pairs_prefix(
                docs, threshold=t
            ).collect()
        }
        assert blocked == naive, f"threshold {t}"
    assert naive  # t=1.0 still catches the exact duplicate both ways


def test_pq_trained_contract_jvm_encode_matches_python_reference(spark):
    """pq_encode_expr (pure JVM expressions) must agree exactly with a
    row-by-row Python evaluation of the shared trained-PQ contract
    (left-to-right squared L2, 9-dp rounding, ties to the lower code) —
    the same contract the DuckDB oracle unrolls."""
    from delta_lake_pyspark_scd2_spark.operators.similarity import (
        _d2_contract,
        _round_half_up,
        pq_encode_expr,
        pq_train_contract,
    )
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    books = pq_train_contract(
        emb, m_subspaces=8, k_codes=16, sample=64, iters=2
    )
    # training is deterministic end-to-end
    books2 = pq_train_contract(
        emb, m_subspaces=8, k_codes=16, sample=64, iters=2
    )
    assert books == books2
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq_encode_expr(emb.filter(F.col("vec_id") < 40), books)
        .collect()
    }
    for r in emb.filter(F.col("vec_id") < 40).collect():
        v = [float(x) for x in r["embedding"]]
        want = []
        for m in range(8):
            s = v[m * 8 : (m + 1) * 8]
            dists = [
                _round_half_up(_d2_contract(s, c), 9) for c in books[m]
            ]
            want.append(dists.index(min(dists)))  # first min = lowest code
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_adopted_pq_config_clears_recall_bar(spark):
    """The shippable compressed-index config (PQ m=32 x k=256, the
    round-6 adoption answer to the round-5 'PQ measures itself out of
    contention' finding) must hold recall@10 well above the 0.5
    adoption bar on the real embeddings (measured: 0.898 at sf0.01,
    0.850 at sf0.1 — the sweep matrix is tools/pq_sweep.py)."""
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        release_tracked,
    )
    from delta_lake_pyspark_scd2_spark.plans import REGISTRY

    rows = REGISTRY["ann_pq_adopted_recall_eval"].builder(
        spark, "/root/testdata/sf0.01"
    ).collect()
    release_tracked()
    assert len(rows) == 50
    mean = sum(r["recall_at_10"] for r in rows) / len(rows)
    assert mean >= 0.6, mean


def test_adopted_ivfpq_composed_clears_recall_bar(spark):
    """The adopted COMPOSED serving config (kmeans-32 coarse, top-12
    probes, PQ-32x256 — round-8 sweep answer to the round-6 'no
    measured composed config >= 0.7' finding) must hold recall@10
    above the adoption bar in-pipeline (measured: 0.700 at sf0.01,
    0.718 at sf0.1; offline sweep 0.740 at both —
    tools/ivfpq_probe_sweep.py)."""
    from delta_lake_pyspark_scd2_spark.functions.caching import (
        release_tracked,
    )
    from delta_lake_pyspark_scd2_spark.plans import REGISTRY

    rows = REGISTRY["ann_ivfpq_adopted_recall_eval"].builder(
        spark, "/root/testdata/sf0.01"
    ).collect()
    release_tracked()
    assert len(rows) == 50
    mean = sum(r["recall_at_10"] for r in rows) / len(rows)
    assert mean >= 0.65, mean


def test_adopted_defaults_match_coverage_matrix():
    """similarity.adopted_defaults() is the one serving surface; it
    must stay in lockstep with the COVERAGE.md index matrix (round-6
    directive #6). The values here ARE the matrix winners — change
    either only with a re-measured sweep."""
    import pathlib

    from delta_lake_pyspark_scd2_spark.operators import similarity as S

    d = S.adopted_defaults()
    assert d == {
        "pq": {"m_subspaces": 32, "k_codes": 256},
        "ivf": {"nprobe": 4},
        "ivfpq": {"n_centroids": 32, "nprobe": 12},
    }
    d["pq"]["m_subspaces"] = 1  # returned dicts are copies
    assert S.ADOPTED_PQ["m_subspaces"] == 32
    cov = (
        pathlib.Path(__file__).resolve().parents[1] / "COVERAGE.md"
    ).read_text()
    assert "kmeans-32 coarse, nprobe=12, PQ-32×256 (ADOPTED COMPOSED" in cov
    assert "PQ m=32 × k=256 (ADOPTED" in cov


def test_ivfpq_persisted_index_matches_inflight(spark, tmp_path):
    """build_ivfpq_index + ivfpq_search_index == ivfpq_topk at the
    same (centroids, codebooks, nprobe, k); the probe reads only the
    probed buckets' files; mismatched codebooks are REFUSED via the
    stored books tag (stored codes carry their family tag — the
    round-5 minhash lesson applied to PQ)."""
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators import similarity as S
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id").between(10, 13))
    books = S.pq_train(emb, m_subspaces=8, k_codes=16, sample=64)

    index = S.build_ivfpq_index(emb, centroids, books, str(tmp_path / "pq"))
    got = S.ivfpq_search_index(index, centroids, queries, k=5, nprobe=2)
    rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.pq_dist)
        for r in got.collect()
    }
    assert rows
    for qrow in queries.collect():
        exp = S.ivfpq_topk(
            emb, centroids, books, list(qrow["embedding"]), k=5, nprobe=2
        ).collect()
        for rank, e in enumerate(exp, start=1):
            assert rows[(qrow["vec_id"], rank)] == (
                e["vec_id"], e["pq_dist"]
            ), (qrow["vec_id"], rank)

    # no raw vectors stored — codes + assignment only
    assert set(index.read().columns) == {"vec_id", "pq_codes", "centroid_id"}

    # books-tag refusal: different codebooks must not score stored codes
    other = S.pq_train(emb, m_subspaces=8, k_codes=16, sample=32)
    assert S.codebooks_tag(other) != S.codebooks_tag(books)
    import pytest

    with pytest.raises(ValueError, match="books_tag"):
        S.ivfpq_search_index(
            index, centroids, queries, k=5, nprobe=2, codebooks=other
        )

    # stored-books default path works and matches the explicit one
    again = S.ivfpq_search_index(
        index, centroids, queries, k=5, nprobe=2, codebooks=books
    )
    assert {
        (r.query_id, r.rank): (r.neighbor_id, r.pq_dist)
        for r in again.collect()
    } == rows


def test_ivfpq_index_extends_incrementally(spark, tmp_path):
    """extend_ivfpq_index appends new vectors encoded under the
    index's stored books: the extended index searches identically to
    one built on the full corpus at once, and the append is a
    versioned commit (time travel sees the pre-extension index)."""
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators import similarity as S
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    queries = emb.filter(F.col("vec_id").between(10, 12))
    books = S.pq_train(emb, m_subspaces=8, k_codes=16, sample=64)

    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    grown = S.build_ivfpq_index(old, centroids, books, str(tmp_path / "g"))
    v0_rows = grown.read().count()
    v1 = S.extend_ivfpq_index(grown, new, centroids)
    full = S.build_ivfpq_index(emb, centroids, books, str(tmp_path / "f"))

    key = lambda df: {
        (r.query_id, r.rank): (r.neighbor_id, r.pq_dist)
        for r in df.collect()
    }
    got = key(S.ivfpq_search_index(grown, centroids, queries, k=5, nprobe=2))
    want = key(S.ivfpq_search_index(full, centroids, queries, k=5, nprobe=2))
    assert got == want and got
    # versioned: the pre-extension index is still addressable
    assert v1 >= 1
    assert grown.read(version=0).count() == v0_rows == old.count()
    assert grown.read().count() == emb.count()


def test_ivfpq_index_extend_txn_idempotent(spark, tmp_path):
    """extend_ivfpq_index(txn=...) lands exactly once: a replayed
    batch (sink retry, re-run backfill) is a no-op returning the
    current version instead of double-inserting codes (round-6
    ADVICE: the index writer had no idempotency handle)."""
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators import similarity as S
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    books = S.pq_train(emb, m_subspaces=8, k_codes=16, sample=64)
    idx = S.build_ivfpq_index(
        emb.filter(F.col("vec_id") < 400), cents, books, str(tmp_path / "i")
    )
    new = emb.filter(F.col("vec_id") >= 400)
    v1 = S.extend_ivfpq_index(idx, new, cents, txn=("ingest", 1))
    n = idx.read().count()
    v2 = S.extend_ivfpq_index(idx, new, cents, txn=("ingest", 1))
    assert v2 == v1 and idx.read().count() == n  # replay was a no-op
    v3 = S.extend_ivfpq_index(
        idx, new.limit(3), cents, txn=("ingest", 2)
    )  # a NEW batch still lands
    assert v3 > v1 and idx.read().count() == n + 3


def test_ivfpq_index_refuses_foreign_centroids(spark, tmp_path):
    """extend/search against a different coarse-centroid set must fail
    loud (centroids_tag): appended vectors would otherwise land in
    buckets the searcher never probes — silent recall decay."""
    import pytest
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators import similarity as S
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    other = emb.filter(F.col("vec_id").between(1, 8))
    books = S.pq_train(emb, m_subspaces=8, k_codes=16, sample=64)
    index = S.build_ivfpq_index(emb, cents, books, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="centroids_tag"):
        S.extend_ivfpq_index(index, emb.limit(5), other)
    with pytest.raises(ValueError, match="centroids_tag"):
        S.ivfpq_search_index(index, other, emb.limit(2), k=3, nprobe=1)


def test_semantic_dedup_keep_rules(spark):
    """semantic_dedup invariants for both survivor rules: with
    threshold=-1 (everything within a cluster pairs) exactly one row
    per cluster survives — the lowest id under "lowest_id", the
    (centroid_sim, id)-minimal member under "centroid_far" (the
    SemDeDup paper keeps outliers); with threshold > 1 nothing pairs
    and every row survives. One output row per input row always."""
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.operators import similarity as S
    from delta_lake_pyspark_scd2_spark.operators.clustering import kmeans_fit
    from delta_lake_pyspark_scd2_spark.operators.dedup import semantic_dedup
    from delta_lake_pyspark_scd2_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()

    out_all = semantic_dedup(emb, k=4, iters=1, dim=64, threshold=1.1)
    rows = out_all.collect()
    assert len(rows) == n and all(r["is_kept"] == 1 for r in rows)

    out_low = semantic_dedup(emb, k=4, iters=1, dim=64, threshold=-1.0)
    kept = [r for r in out_low.collect() if r["is_kept"] == 1]
    by_cluster = {}
    for r in out_low.collect():
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert len(kept) == len(by_cluster)  # exactly one per cluster
    for cid, members in by_cluster.items():
        lo = min(m["vec_id"] for m in members)
        assert [m["vec_id"] for m in members if m["is_kept"] == 1] == [lo]

    out_far = semantic_dedup(
        emb, k=4, iters=1, dim=64, threshold=-1.0, keep="centroid_far"
    )
    # survivor per cluster = (rounded centroid-sim, id)-minimal member
    cents = kmeans_fit(emb, k=4, iters=1, dim=64)
    csim = (
        S.assign_to_centroids(emb, cents)
        .join(
            cents.select(
                F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("__cv"),
            ),
            "centroid_id",
        )
        .select(
            "vec_id",
            "centroid_id",
            F.round(
                S.cosine(F.col("embedding"), F.col("__cv")), 6
            ).alias("cs"),
        )
    )
    want = {}
    for r in csim.collect():
        key = r["centroid_id"]
        cand = (r["cs"], r["vec_id"])
        if key not in want or cand < want[key]:
            want[key] = cand
    got = {
        r["cluster_id"]: r["vec_id"]
        for r in out_far.collect()
        if r["is_kept"] == 1
    }
    assert got == {cid: vid for cid, (_, vid) in want.items()}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep rule"):
        semantic_dedup(emb, k=4, iters=1, dim=64, keep="nope")


def test_ppm_decoder_is_a_real_parser():
    """decode_ppm parses BYTES, not metadata: header variants
    (comments, padding whitespace) decode to identical pixels, and
    malformed input fails loud."""
    import numpy as np
    import pytest

    from delta_lake_pyspark_scd2_spark.operators.multimodal import (
        decode_ppm,
        generate_ppm,
    )

    # hand-built 2x2 image, known bytes
    raw = bytes(range(12))
    w, h, px = decode_ppm(b"P6\n2 2\n255\n" + raw)
    assert (w, h) == (2, 2)
    assert px[0, 1, 0] == 3 and px[1, 1, 2] == 11
    # comment + crlf-ish whitespace in the header, same raster
    w2, h2, px2 = decode_ppm(b"P6 # comment\n 2\t2 # dims\n255\n" + raw)
    assert (w2, h2) == (2, 2) and np.array_equal(px, px2)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + raw)  # wrong magic
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + raw)  # 16-bit unsupported
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n" + raw)  # truncated raster
    # the generated corpus round-trips through the parser
    payload = generate_ppm(7)
    w3, h3, px3 = decode_ppm(payload)
    assert w3 % 4 == 0 and h3 % 4 == 0 and px3.shape == (h3, w3, 3)


def test_ppm_resize_box_known_values(spark):
    """Box-filter resize on the generated corpus: every output pixel
    equals the exact floor-mean of its block, recomputed in numpy."""
    import numpy as np

    from delta_lake_pyspark_scd2_spark.operators.multimodal import (
        attach_ppm_payload,
        decode_ppm,
        generate_ppm,
        ppm_channel_stats,
        ppm_resize_box,
    )

    ids = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    payloads = attach_ppm_payload(ids)
    out = ppm_resize_box(payloads).collect()
    assert len(out) == 5 * 4 * 4 * 3
    got = {(r.doc_id, r.oy, r.ox, r.channel): r.value for r in out}
    for i in range(1, 6):
        w, h, px = decode_ppm(generate_ppm(i))
        bw, bh = w // 4, h // 4
        blocks = px.astype("int64").reshape(4, bh, 4, bw, 3)
        exp = blocks.sum(axis=(1, 3)) // (bw * bh)
        for oy in range(4):
            for ox in range(4):
                for c in range(3):
                    assert got[(i, oy, ox, c)] == exp[oy, ox, c]
    stats = {
        (r.doc_id, r.channel): r for r in ppm_channel_stats(payloads).collect()
    }
    w, h, px = decode_ppm(generate_ppm(3))
    s = px.sum(axis=(0, 1), dtype="int64")
    for c in range(3):
        r = stats[(3, c)]
        assert (r.width, r.height) == (w, h)
        assert r.mean_value == round(float(s[c]) / (w * h), 6)


def test_line_dedup_corpus_removes_cross_doc_boilerplate(spark):
    """A 16-word boilerplate block shared by three docs survives only
    at its first (doc_id, chunk_no) occurrence; unique segments are
    untouched; reassembly preserves within-doc order; empty docs come
    back with zero chunks."""
    boiler = " ".join(f"b{i}" for i in range(16))
    u = lambda tag: " ".join(f"{tag}{i}" for i in range(16))
    rows = [
        (1, boiler + " " + u("x")),          # first occurrence (chunk 0)
        (2, u("y") + " " + boiler),          # dup at chunk 1 -> cut
        (3, boiler),                         # dup at chunk 0 -> whole doc cut
        (4, u("z")),                         # untouched
        (5, ""),                             # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.line_dedup_corpus(df).collect()}
    assert (out[1].n_chunks, out[1].n_kept) == (2, 2)
    assert out[1].text_deduped == boiler + " " + u("x")
    assert (out[2].n_chunks, out[2].n_kept) == (2, 1)
    assert out[2].text_deduped == u("y")
    assert (out[3].n_chunks, out[3].n_kept) == (1, 0)
    assert out[3].text_deduped == ""
    assert out[4].text_deduped == u("z")
    assert (out[5].n_chunks, out[5].n_kept) == (0, 0)
    assert out[5].text_deduped == ""


def test_bm25_duplicate_query_terms_score_as_term_set(spark):
    # BM25 is defined over the query's term set: a duplicated term must
    # not double its contribution or inflate df (round-10 ADVICE).
    rows = [
        Row(doc_id=1, text="merge join shuffle"),
        Row(doc_id=2, text="merge merge join"),
        Row(doc_id=3, text="broadcast join"),
        Row(doc_id=4, text="shuffle sort merge join"),
        Row(doc_id=5, text="plain text row"),
    ]
    df = spark.createDataFrame(rows)
    dup = text.bm25_topk(df, ["merge", "merge", "join"]).collect()
    uniq = text.bm25_topk(df, ["merge", "join"]).collect()
    assert dup == uniq


def test_bm25_empty_query_returns_empty_topk(spark):
    # the pre-round-10 isin([]) path returned an empty frame; the stack
    # form must not raise WRONG_NUM_ARGS (round-10 ADVICE)
    df = spark.createDataFrame([Row(doc_id=1, text="merge join")])
    out = text.bm25_topk(df, [])
    assert out.columns == ["doc_id", "bm25"]
    assert out.count() == 0
