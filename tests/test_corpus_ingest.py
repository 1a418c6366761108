"""Incremental corpus ingestion (pipeline/corpus_ingest.py): batch
dedup against the fingerprint store, never against corpus text."""

from __future__ import annotations

import pytest

from delta_lake_pyspark_scd2_spark.pipeline.corpus_ingest import CorpusIngest

_B1 = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "one two three four five six seven eight nine ten"),
    (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact dup of 1
    (4, "totally different content about spark query planning and shuffles"),
]
_B2 = [
    (10, "one two three four five six seven eight nine ten"),  # exact dup of 2
    (11, "alpha beta gamma delta epsilon zeta eta theta iota KAPPA EDITED"),  # near-dup of 1
    (12, "fresh unseen text with brand new words entirely unrelated here"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def store(spark, tmp_path):
    return CorpusIngest(spark, str(tmp_path / "corpus_store"))


def test_first_batch_dedups_in_batch_only(spark, store):
    m = store.ingest(_df(spark, _B1))
    assert m.n_in == 4
    assert m.exact_in_batch == 1  # doc 3
    assert m.exact_vs_store == 0 and m.near_vs_store == 0
    assert m.accepted == 3
    assert sorted(r["doc_id"] for r in store.corpus().collect()) == [1, 2, 4]


def test_second_batch_dedups_against_store(spark, store):
    store.ingest(_df(spark, _B1))
    m = store.ingest(_df(spark, _B2))
    assert m.exact_vs_store == 1  # doc 10 == doc 2
    assert m.near_vs_store == 1  # doc 11 ~ doc 1
    assert m.accepted == 1
    assert sorted(r["doc_id"] for r in store.corpus().collect()) == [1, 2, 4, 12]


def test_reingesting_same_batch_accepts_nothing(spark, store):
    store.ingest(_df(spark, _B1))
    m = store.ingest(_df(spark, _B1))
    assert m.accepted == 0
    assert m.exact_vs_store == 3  # the 3 accepted docs all match the store
    assert store.corpus().count() == 3


def test_in_batch_near_dup_keeps_lowest_id(spark, store):
    rows = [
        (20, "the quick brown fox jumps over the lazy dog today friends"),
        (21, "the quick brown fox jumps over the lazy dog today FRIENDS!!"),
    ]
    m = store.ingest(_df(spark, rows))
    assert m.near_in_batch == 1
    assert [r["doc_id"] for r in store.corpus().collect()] == [20]


def test_store_check_reads_no_text_column(spark, store):
    # the cross-batch plan must touch only fp/minhash of the store —
    # ingest a batch, then assert the fingerprint table has exactly the
    # compact columns (no text ever stored there)
    store.ingest(_df(spark, _B1))
    fp_df = store._fingerprints()
    assert set(fp_df.columns) == {"doc_id", "fp", "minhash"}


def test_streaming_ingest_matches_batch(spark, tmp_path):
    # two micro-batches delivered as files; the second one's dups (vs
    # batch 1 and the store) must be dropped exactly as in batch mode
    import json

    from delta_lake_pyspark_scd2_spark.streaming import corpus_ingest_stream

    src = tmp_path / "in"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for i, t in _B1:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    base, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    seen = []
    corpus_ingest_stream(
        spark, str(src), base, ck, on_batch=lambda n, m: seen.append(m)
    )
    assert sum(m.accepted for m in seen) == 3

    with open(src / "b2.json", "w") as f:
        for i, t in _B2:
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    seen.clear()
    corpus_ingest_stream(
        spark, str(src), base, ck, on_batch=lambda n, m: seen.append(m)
    )
    assert sum(m.accepted for m in seen) == 1  # only the fresh doc
    got = sorted(
        r["doc_id"]
        for r in CorpusIngest(spark, base).corpus().collect()
    )
    assert got == [1, 2, 4, 12]


def test_txn_heals_corpus_committed_fp_crashed_window(spark, store):
    """Crash between the corpus commit and the fingerprint commit, then
    replay the same micro-batch with the same (app, batch) txn: the
    corpus append is skipped at the committed watermark (no duplicate
    rows) and the missing fingerprint commit is healed."""
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    store.ingest(_df(spark, _B1), txn=("ing", 0))
    n_corpus = CorpusIngest(spark, store.corpus_path.rsplit("/corpus", 1)[0]).corpus().count()

    # batch 1: crash the fingerprint append AFTER the corpus append
    orig_append = VersionedParquetTable.append
    def crashing_append(self, df, **kw):
        if self.path == store.fp_path:
            raise RuntimeError("simulated crash before fp commit")
        return orig_append(self, df, **kw)

    VersionedParquetTable.append = crashing_append
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            store.ingest(_df(spark, _B2), txn=("ing", 1))
    finally:
        VersionedParquetTable.append = orig_append

    corpus_mid = store.corpus().count()
    assert corpus_mid > n_corpus  # batch-1 survivors landed pre-crash
    fp_t = VersionedParquetTable(spark, store.fp_path)
    assert fp_t.last_txn_version("ing") == 0  # fp commit did NOT land

    # replay of batch 1 (what the checkpointed stream would do)
    m = store.ingest(_df(spark, _B2), txn=("ing", 1))
    assert store.corpus().count() == corpus_mid  # no duplicate corpus rows
    assert fp_t.last_txn_version("ing") == 1  # fingerprints healed
    # a third replay is a full no-op on both tables
    c_v = VersionedParquetTable(spark, store.corpus_path).latest_version()
    store.ingest(_df(spark, _B2), txn=("ing", 1))
    assert VersionedParquetTable(spark, store.corpus_path).latest_version() == c_v
    assert fp_t.last_txn_version("ing") == 1


def test_containment_rejects_excerpt_against_stored_corpus(spark, tmp_path):
    """The excerpt screen (opt-in containment): a short quote whose
    shingles all live inside an already-accepted long doc is rejected
    cross-batch, even though its Jaccard vs the container is far below
    the minhash screen's reach."""
    ing = CorpusIngest(
        spark, str(tmp_path / "c"), containment=True,
    )
    long_words = " ".join(f"w{i}" for i in range(120))
    m1 = ing.ingest(_df(spark, [(1, long_words),
                                (2, "entirely different content here now")]))
    assert m1.accepted == 2
    # excerpt: a 10-word contiguous slice of doc 1 (containment 1.0,
    # jaccard ~ 8/118 << minhash verify_frac)
    excerpt = " ".join(f"w{i}" for i in range(5, 15))
    m2 = ing.ingest(_df(spark, [(10, excerpt),
                                (11, "more fresh text with novel words only")]))
    assert m2.contained_vs_store == 1
    assert m2.near_vs_store == 0  # minhash alone would have let it in
    assert m2.accepted == 1
    got = sorted(r["doc_id"] for r in ing.corpus().collect())
    assert got == [1, 2, 11]


def test_containment_rejects_excerpt_within_batch(spark, tmp_path):
    ing = CorpusIngest(spark, str(tmp_path / "c"), containment=True)
    long_words = " ".join(f"v{i}" for i in range(40))
    excerpt = " ".join(f"v{i}" for i in range(20, 30))
    m = ing.ingest(_df(spark, [(1, long_words), (2, excerpt)]))
    assert m.contained_in_batch == 1
    assert m.accepted == 1
    assert [r["doc_id"] for r in ing.corpus().collect()] == [1]


def test_keep_best_survivor_is_higher_quality_twin(spark, tmp_path):
    """keep='best': the LONGER near-dup twin survives even though it
    has the higher id (the min-id rule would keep the worse copy)."""
    base = "the quick brown fox jumps over the lazy dog today friends"
    ing = CorpusIngest(spark, str(tmp_path / "c"), keep="best")
    m = ing.ingest(_df(spark, [
        (20, base),
        # same text plus extra content: near-dup, higher quality
        (21, base + " with extra unique closing commentary appended"),
        (22, "unrelated filler text about completely other topics"),
    ]))
    assert m.near_in_batch == 1
    got = sorted(r["doc_id"] for r in ing.corpus().collect())
    assert got == [21, 22], "higher-quality twin must survive"


def test_containment_store_exactly_once_under_replay(spark, tmp_path):
    """The fingerprint store (now carrying shingle sets) stays
    exactly-once when a batch is replayed with the same txn."""
    ing = CorpusIngest(spark, str(tmp_path / "c"), containment=True)
    batch = _df(spark, [(1, " ".join(f"u{i}" for i in range(30))),
                        (2, "other novel words completely distinct")])
    ing.ingest(batch, txn=("app", 0))
    ing.ingest(batch, txn=("app", 0))  # replay: txn short-circuits
    assert ing.corpus().count() == 2
    fp = ing._fingerprints()
    assert fp.count() == 2
    assert "shingles" in fp.columns
    # and a THIRD ingest without txn is caught by the dedup screens
    m = ing.ingest(batch)
    assert m.accepted == 0


def test_containment_on_legacy_store_fails_loud(spark, tmp_path):
    """A store built without shingle sets cannot silently skip the
    containment screen."""
    plain = CorpusIngest(spark, str(tmp_path / "c"))
    plain.ingest(_df(spark, [(1, "some words in a stored corpus doc")]))
    ing = CorpusIngest(spark, str(tmp_path / "c"), containment=True)
    with pytest.raises(ValueError, match="shingle"):
        ing.ingest(_df(spark, [(2, "a new batch needing the screen")]))


def test_mismatched_minhash_family_store_fails_loud(spark, tmp_path):
    """Signatures from a different minhash family can never band-collide
    with this engine's — a mismatched (or legacy, pre-stamp) store must
    refuse loudly instead of silently accepting every near-duplicate."""
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    ing = CorpusIngest(spark, str(tmp_path / "c"))
    ing.ingest(_df(spark, _B1))
    fp = VersionedParquetTable(spark, ing.fp_path)
    fp.set_property("minhash.family", "md5-affine-m61-v1")  # legacy tag
    with pytest.raises(RuntimeError, match="minhash family"):
        CorpusIngest(spark, str(tmp_path / "c")).ingest(_df(spark, _B2))
    # untagged store (pre-versioning build) refuses too
    fp.unset_property("minhash.family")
    with pytest.raises(RuntimeError, match="minhash family"):
        CorpusIngest(spark, str(tmp_path / "c")).ingest(_df(spark, _B2))


def test_plain_ingest_into_containment_store_keeps_shingles(spark, tmp_path):
    """A containment=False ingest appending to a store that carries
    shingle sets must still write them — a NULL-shingled row would pass
    the column guard yet silently never serve as a container."""
    ing1 = CorpusIngest(spark, str(tmp_path / "c"), containment=True)
    long_words = " ".join(f"x{i}" for i in range(120))
    ing1.ingest(_df(spark, [(1, "unrelated seed content entirely")]))
    # plain ingest (no containment flag) adds the long doc
    CorpusIngest(spark, str(tmp_path / "c")).ingest(
        _df(spark, [(2, long_words)])
    )
    fp = CorpusIngest(spark, str(tmp_path / "c"))._fingerprints()
    assert fp.filter("doc_id = 2 AND shingles IS NULL").count() == 0
    # and the containment screen sees doc 2 as a container
    ing3 = CorpusIngest(spark, str(tmp_path / "c"), containment=True)
    excerpt = " ".join(f"x{i}" for i in range(30, 40))
    m = ing3.ingest(_df(spark, [(10, excerpt)]))
    assert m.contained_vs_store == 1 and m.accepted == 0


_B3_FRESH = [
    (20, "entirely novel narrative about distributed ranking and buckets"),
    (21, "walrus penguin albatross migrate across frozen southern oceans"),
]


def test_bloom_prefilter_matches_exact_path_and_skips_fresh_batches(
    spark, tmp_path
):
    """bloom_prefilter=True accepts/rejects exactly what the exact path
    does, and an all-fresh batch skips BOTH store scans (the fast
    path); a batch holding a stored dup keeps the scans and still
    rejects it."""
    plain = CorpusIngest(spark, str(tmp_path / "plain"))
    bloom = CorpusIngest(spark, str(tmp_path / "bloom"), bloom_prefilter=True)
    for batch in (_B1, _B2, _B3_FRESH):
        mp = plain.ingest(_df(spark, batch))
        mb = bloom.ingest(_df(spark, batch))
        assert (mp.exact_in_batch, mp.exact_vs_store, mp.near_in_batch,
                mp.near_vs_store, mp.accepted) == (
            mb.exact_in_batch, mb.exact_vs_store, mb.near_in_batch,
            mb.near_vs_store, mb.accepted)
    assert sorted(r["doc_id"] for r in bloom.corpus().collect()) == sorted(
        r["doc_id"] for r in plain.corpus().collect()
    )
    # the all-fresh third batch provably shared nothing with the store
    mb3 = bloom.ingest(_df(spark, [(30, "completely new words never before seen anywhere around")]))
    assert mb3.store_exact_scan_skipped and mb3.store_near_scan_skipped
    assert mb3.accepted == 1
    # a dup-bearing batch keeps the store scans and rejects the dup
    mb4 = bloom.ingest(_df(spark, [(40, _B1[0][1])]))
    assert not mb4.store_exact_scan_skipped
    assert mb4.exact_vs_store == 1 and mb4.accepted == 0


def test_bloom_prefilter_heals_stale_bloom_from_cdf(spark, tmp_path):
    """A bloom left behind the fp store -- the crash window between the
    fp and bloom commits, reproduced for real by advancing the store
    through a NON-prefilter writer -- is healed from the fp table's
    change feed before any probe trusts it: a dup of the un-bloomed
    batch is still rejected."""
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    base = str(tmp_path / "c")
    ing = CorpusIngest(spark, base, bloom_prefilter=True)
    ing.ingest(_df(spark, _B1))
    stamped = VersionedParquetTable(spark, ing.bloom_path).properties()[
        "bloom.fp_version"
    ]
    # a writer without the prefilter advances the store past the bloom
    CorpusIngest(spark, base).ingest(_df(spark, _B3_FRESH))
    fp_head = VersionedParquetTable(spark, ing.fp_path).latest_version()
    assert int(stamped) < fp_head  # the bloom is genuinely stale
    # dup of the UN-bloomed batch: a trusted-stale bloom would skip the
    # store scan and accept it; the version check forces the heal first
    m = ing.ingest(_df(spark, [(50, _B3_FRESH[0][1])]))
    assert m.exact_vs_store == 1 and m.accepted == 0
    assert not m.store_exact_scan_skipped
    assert int(
        VersionedParquetTable(spark, ing.bloom_path).properties()[
            "bloom.fp_version"
        ]
    ) >= fp_head
