"""Incremental corpus ingestion: dedup each new batch against
EVERYTHING already accepted, without ever re-scanning corpus text.

The production shape of training-data collection: crawls arrive in
batches; a document is accepted only if it is neither an exact nor a
near duplicate of (a) an earlier doc in its own batch nor (b) any doc
accepted in ANY previous batch. One-shot dedup operators
(``operators.dedup``) can't express (b) without reprocessing the whole
corpus per batch — this pipeline keeps a *fingerprint store* beside
the corpus so cross-batch checks touch only compact signatures:

  * ``corpus/``        — accepted documents (VersionedParquetTable)
  * ``fingerprints/``  — one row per accepted doc:
      ``(doc_id, fp md5, minhash array<long>)``

Batch cost (the 100 TB argument): exact check is a semi-join of the
batch's md5s against the store's ``fp`` column (columnar scan of ONE
string column — no text); the near-dup check joins the batch's LSH
band buckets against buckets derived from the store's stored
signatures (transform over an array column — the shingling/hashing
pipeline never reruns for old docs). Both joins are candidate-bounded;
both sides prune to the joined columns. Per-batch work is
O(batch + store-signature-scan), never O(corpus text).

Near-dup verification is signature agreement: candidates from a
shared band are confirmed when ≥ ``verify_frac`` of their minhashes
agree (an unbiased Jaccard estimate — banding alone over-fires on
single-band collisions).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators import dedup
from delta_lake_pyspark_scd2_spark.operators.text import fingerprint
from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable

_NUM_HASHES = 16
_BANDS = 4
_ROWS = 4
_SHINGLE_N = 3

#: Seen-content Bloom geometry (`bloom_prefilter=True`): 4 hashes over
#: 2^17 bits holds ~10k members at ~1% FP; past saturation every probe
#: reads as maybe-seen and the prefilter degrades to the exact path
#: (never to a wrong answer — Bloom filters have no false negatives).
_BLOOM_BITS = 1 << 17
_BLOOM_HASHES = 4


@dataclass
class IngestMetrics:
    n_in: int = 0
    exact_in_batch: int = 0
    exact_vs_store: int = 0
    near_in_batch: int = 0
    near_vs_store: int = 0
    contained_in_batch: int = 0
    contained_vs_store: int = 0
    accepted: int = 0
    #: bloom_prefilter=True and the batch provably contained no stored
    #: fingerprint / band bucket: the corresponding store scan was
    #: skipped outright (the all-fresh-batch fast path).
    store_exact_scan_skipped: bool = False
    store_near_scan_skipped: bool = False


class CorpusIngest:
    """Batch-ingest endpoint over a corpus + fingerprint-store pair.

    Opt-in screens beyond the exact + minhash-LSH core:

    * ``containment=True`` — the EXCERPT screen: a batch doc whose
      shingles are ≥ ``containment_threshold`` contained in another
      batch doc or any stored doc is rejected (Broder asymmetric
      containment; symmetric Jaccard/minhash never sees a short quote
      inside a long page). The fingerprint store then also keeps each
      accepted doc's distinct shingle set, so cross-batch containment
      scans stored ARRAYS — corpus text is shingled exactly once, at
      its own ingest (``dedup.shingle_containment_vs_sets``).
    * ``keep="best"`` — quality-aware in-batch dedup: within a
      verified near-dup cluster keep the highest-``score_col`` doc
      (default: text length) instead of the lowest id
      (``graph.cluster_keep_best``); the boilerplate-stripped copy
      survives its full-chrome twin regardless of arrival order.
      Cross-store near-dups still reject the batch side — accepted
      history is immutable at ingest.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        *,
        verify_frac: float = 0.5,
        containment: bool = False,
        containment_threshold: float = 0.8,
        keep: str = "first",
        score_col: str | None = None,
        bloom_prefilter: bool = False,
    ):
        if keep not in ("first", "best"):
            raise ValueError(f"keep must be 'first' or 'best', got {keep!r}")
        self.spark = spark
        self.corpus_path = os.path.join(base_path, "corpus")
        self.fp_path = os.path.join(base_path, "fingerprints")
        self.bloom_path = os.path.join(base_path, "bloom")
        self.bloom_prefilter = bloom_prefilter
        self.verify_frac = verify_frac
        self.containment = containment
        self.containment_threshold = containment_threshold
        self.keep = keep
        self.score_col = score_col

    # -- store access -----------------------------------------------------

    def corpus(self) -> DataFrame:
        return VersionedParquetTable(self.spark, self.corpus_path).read()

    def _fingerprints(self) -> DataFrame | None:
        if not VersionedParquetTable.is_table(self.fp_path):
            return None
        t = VersionedParquetTable(self.spark, self.fp_path)
        family = t.properties().get("minhash.family")
        if family != dedup.MINHASH_FAMILY:
            # a store whose signatures come from a DIFFERENT hash
            # family can never band-collide with this engine's batch
            # signatures — the cross-batch screen would silently stop
            # firing; fail loudly instead
            raise RuntimeError(
                f"fingerprint store at {self.fp_path} was built with "
                f"minhash family {family!r}, this engine uses "
                f"{dedup.MINHASH_FAMILY!r}; signatures are not "
                "comparable across families — rebuild the store by "
                "re-ingesting the corpus"
            )
        return t.read()

    # -- seen-content Bloom prefilter --------------------------------------

    def _bloom_positions(self, fp_rows: DataFrame, id_col: str) -> DataFrame:
        """``(kind, pos)`` Bloom set-bit rows for a fingerprint frame:
        kind ``fp`` over the exact md5 fingerprints, kind ``bucket``
        over the ``band:bucket`` LSH strings — the two store probes the
        prefilter can rule out."""
        from delta_lake_pyspark_scd2_spark.operators import sketches

        fp_pos = sketches.bloom_build(
            fp_rows.select("fp"), "fp",
            bits=_BLOOM_BITS, hashes=_BLOOM_HASHES,
        ).select(F.lit("fp").alias("kind"), "pos")
        bkt = dedup.lsh_band_buckets(
            fp_rows.select(F.col(id_col), "minhash"), id_col,
            bands=_BANDS, rows_per_band=_ROWS,
        ).select(
            F.concat(
                F.col("band").cast("string"), F.lit(":"), F.col("bucket")
            ).alias("bb")
        )
        b_pos = sketches.bloom_build(
            bkt, "bb", bits=_BLOOM_BITS, hashes=_BLOOM_HASHES
        ).select(F.lit("bucket").alias("kind"), "pos")
        return fp_pos.unionByName(b_pos)

    def _sync_bloom(self, id_col: str) -> None:
        """Bring the Bloom table up to the fingerprint store's head.

        The bloom is DERIVED state, stamped with the fp-table version
        it covers (``bloom.fp_version``). The normal advance after a
        commit and the crash-window heal (fp committed, bloom not) are
        the same operation: fold the CDF inserts since the stamped
        version — never a full re-scan, and a stale bloom can only
        ever be MISSING bits it hasn't folded yet, which the version
        check catches before any probe trusts it.
        """
        fp_t = VersionedParquetTable(self.spark, self.fp_path)
        v = fp_t.latest_version()
        geometry = {
            "bloom.bits": str(_BLOOM_BITS),
            "bloom.hashes": str(_BLOOM_HASHES),
        }
        if not VersionedParquetTable.is_table(self.bloom_path):
            pos = self._bloom_positions(fp_t.read(), id_col).distinct()
            VersionedParquetTable.create(
                self.spark, pos, self.bloom_path,
                properties={**geometry, "bloom.fp_version": str(v)},
            )
            return
        bl = VersionedParquetTable(self.spark, self.bloom_path)
        props = bl.properties()
        have_geom = {k: props.get(k) for k in geometry}
        if have_geom != geometry:
            raise RuntimeError(
                f"bloom table at {self.bloom_path} has geometry "
                f"{have_geom}, this engine uses {geometry}: bit layouts "
                "are incompatible — drop the bloom table to rebuild"
            )
        have = int(props["bloom.fp_version"])
        if have >= v:
            return
        delta = fp_t.table_changes([id_col], version_from=have, version_to=v)
        ins = delta.filter(F.col("_change_type") == "insert")
        new = self._bloom_positions(ins, id_col).distinct().join(
            bl.read().select("kind", "pos"), ["kind", "pos"], "left_anti"
        )
        bl.append(new)
        bl.set_property("bloom.fp_version", str(v))

    def _seen_bitmaps(self, id_col: str) -> tuple[str, str] | None:
        """'0'/'1' bitstrings ``(fp_bitmap, bucket_bitmap)`` covering
        the CURRENT fingerprint store, healing a stale bloom first;
        ``None`` when there is no store yet. The read is geometry-
        bounded (≤ 2 × bits rows), never store-sized."""
        if not VersionedParquetTable.is_table(self.fp_path):
            return None
        self._sync_bloom(id_col)
        fp_chars = ["0"] * _BLOOM_BITS
        b_chars = ["0"] * _BLOOM_BITS
        rows = (
            VersionedParquetTable(self.spark, self.bloom_path)
            .read().select("kind", "pos").collect()
        )
        for r in rows:
            (fp_chars if r["kind"] == "fp" else b_chars)[int(r["pos"])] = "1"
        return "".join(fp_chars), "".join(b_chars)

    # -- ingest -----------------------------------------------------------

    def ingest(
        self,
        batch: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        txn: tuple[str, int] | None = None,
    ) -> IngestMetrics:
        """Accept the non-duplicate subset of ``batch``; returns counts.

        Counts ride ``Observation``-free aggregate actions on compact
        frames (ids only); the accepted rows and their fingerprints are
        committed to the two tables in that order. ``txn`` (an
        ``(app_id, batch_version)`` writer transaction) makes a replayed
        batch exactly-once PER TABLE: without it, a crash between the
        corpus commit and the fingerprint commit would let a replay
        re-append the same docs to the corpus (their fingerprints are
        not in the store yet, so dedup cannot catch them). With it, the
        corpus append is skipped at the committed watermark and only
        the missing fingerprint commit is healed.
        """
        m = IngestMetrics(n_in=batch.count())

        sigs = dedup.minhash_signatures(
            batch, text_col, id_col, num_hashes=_NUM_HASHES
        )
        fps = batch.select(
            F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
        ).join(sigs, id_col)
        # the shingle→hash→min pipeline is referenced by every later
        # stage (counts, band buckets twice, final joins) — materialize
        # it once; unpersisted after the commits (clear job boundary)
        # the containment emitters persist_tracked their shingle
        # frames; a long-running ingest loop must not accumulate them —
        # scoped, so a surrounding caller's tracked frames survive
        from delta_lake_pyspark_scd2_spark.functions.caching import (
            tracked_scope,
        )

        cached = fps.persist()
        try:
            with tracked_scope():
                return self._ingest_deduped(
                    cached, batch, m, id_col, text_col, txn
                )
        finally:
            cached.unpersist()

    def _ingest_deduped(
        self,
        fps: DataFrame,
        batch: DataFrame,
        m: IngestMetrics,
        id_col: str,
        text_col: str = "text",
        txn: tuple[str, int] | None = None,
    ) -> IngestMetrics:
        # in-batch exact: keep the lowest id per fingerprint
        w = Window.partitionBy("fp").orderBy(id_col)
        fps = fps.withColumn("__rn", F.row_number().over(w))
        in_batch_exact = fps.filter(F.col("__rn") > 1).select(id_col)
        fps = fps.filter(F.col("__rn") == 1).drop("__rn")

        store = self._fingerprints()
        bitmaps = (
            self._seen_bitmaps(id_col)
            if self.bloom_prefilter and store is not None
            else None
        )
        if store is not None and bitmaps is not None:
            from delta_lake_pyspark_scd2_spark.operators import sketches

            fp_hit = sketches.bloom_hit_expr(
                F.col("fp"), bitmaps[0],
                bits=_BLOOM_BITS, hashes=_BLOOM_HASHES,
            )
            maybe = fps.filter(fp_hit)
            # a batch with ZERO maybe-seen fingerprints provably shares
            # nothing with the store (no false negatives) — skip the
            # store's fp scan outright; otherwise probe only the
            # maybe-seen side (sound restriction, smaller join)
            if maybe.limit(1).count() == 0:
                cross_exact = fps.limit(0).select(id_col)
                m.store_exact_scan_skipped = True
            else:
                cross_exact = maybe.join(
                    store.select(F.col("fp")).distinct(), "fp", "left_semi"
                ).select(id_col)
        elif store is not None:
            cross_exact = (
                fps.join(
                    store.select(F.col("fp")).distinct(), "fp", "left_semi"
                ).select(id_col)
            )
        else:
            cross_exact = fps.limit(0).select(id_col)
        fps = fps.join(cross_exact, id_col, "left_anti")

        # near-dup candidates via shared LSH band buckets, verified by
        # minhash agreement
        batch_bb = dedup.lsh_band_buckets(
            fps.select(id_col, "minhash"), id_col, bands=_BANDS, rows_per_band=_ROWS
        )

        def _verified(cands: DataFrame, left_sig, right_sig) -> DataFrame:
            agree = F.size(
                F.filter(
                    F.zip_with(left_sig, right_sig, lambda a, b: a == b),
                    lambda x: x,
                )
            ) / F.lit(_NUM_HASHES)
            return cands.filter(agree >= F.lit(self.verify_frac))

        # (a) within the batch: drop the higher id of each verified pair
        a, b = batch_bb.alias("a"), batch_bb.alias("b")
        in_pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("keep_id"),
                F.col(f"b.{id_col}").alias("drop_id"),
            )
            .distinct()
        )
        sig_by_id = fps.select(F.col(id_col), F.col("minhash"))
        in_pairs = in_pairs.join(
            sig_by_id.select(
                F.col(id_col).alias("keep_id"), F.col("minhash").alias("sig_a")
            ),
            "keep_id",
        ).join(
            sig_by_id.select(
                F.col(id_col).alias("drop_id"), F.col("minhash").alias("sig_b")
            ),
            "drop_id",
        )
        verified_in = _verified(in_pairs, F.col("sig_a"), F.col("sig_b"))
        if self.keep == "best":
            # quality-aware canonical choice: connected components over
            # the verified pairs, keep the highest-scoring doc of each
            # cluster (default score: text length)
            from delta_lake_pyspark_scd2_spark.operators.graph import (
                cluster_keep_best,
            )

            score = (
                F.col(self.score_col)
                if self.score_col
                else F.length(F.col(text_col))
            )
            alive = batch.join(fps.select(id_col), id_col, "left_semi")
            kb = cluster_keep_best(
                alive.select(F.col(id_col), score.alias("__score")),
                verified_in.select("keep_id", "drop_id"),
                "__score",
                id_col,
                pair_a="keep_id",
                pair_b="drop_id",
            )
            near_in_batch = (
                kb.filter(~F.col("is_kept")).select(id_col).distinct()
            )
        else:
            near_in_batch = (
                verified_in.select(F.col("drop_id").alias(id_col)).distinct()
            )
        fps = fps.join(near_in_batch, id_col, "left_anti")

        # (b) against the store: bucket the STORED signatures (array
        # transform only — no text, no shingling) and join
        probe_bb = None
        if store is not None and bitmaps is not None:
            from delta_lake_pyspark_scd2_spark.operators import sketches

            bkt_hit = sketches.bloom_hit_expr(
                F.concat(
                    F.col("band").cast("string"), F.lit(":"), F.col("bucket")
                ),
                bitmaps[1],
                bits=_BLOOM_BITS, hashes=_BLOOM_HASHES,
            )
            probe_bb = dedup.lsh_band_buckets(
                fps.select(id_col, "minhash"),
                id_col, bands=_BANDS, rows_per_band=_ROWS,
            ).filter(bkt_hit)
            if probe_bb.limit(1).count() == 0:
                # no batch band bucket can exist in the store: the
                # near-dup store scan is provably fruitless (the
                # containment screen below is NOT bloom-covered and
                # still sees the store)
                probe_bb = probe_bb.limit(0)
                m.store_near_scan_skipped = True
        if store is not None and not m.store_near_scan_skipped:
            store_bb = dedup.lsh_band_buckets(
                store.select(F.col(id_col), "minhash"),
                id_col,
                bands=_BANDS,
                rows_per_band=_ROWS,
            ).select(
                F.col(id_col).alias("store_id"), "band", "bucket"
            )
            store_sig = store.select(
                F.col(id_col).alias("store_id"), F.col("minhash").alias("sig_b")
            )
            batch_probe = (
                probe_bb
                if probe_bb is not None
                else dedup.lsh_band_buckets(
                    fps.select(id_col, "minhash"),
                    id_col,
                    bands=_BANDS,
                    rows_per_band=_ROWS,
                )
            )
            cand = (
                batch_probe
                .join(store_bb, ["band", "bucket"])
                .select(id_col, "store_id")
                .distinct()
                .join(sig_by_id.select(F.col(id_col), F.col("minhash").alias("sig_a")), id_col)
                .join(store_sig, "store_id")
            )
            near_cross = (
                _verified(cand, F.col("sig_a"), F.col("sig_b"))
                .select(id_col)
                .distinct()
            )
        else:
            near_cross = fps.limit(0).select(id_col)
        fps = fps.join(near_cross, id_col, "left_anti")

        # opt-in EXCERPT screen: asymmetric shingle containment —
        # catches a quote/excerpt whose Jaccard vs its container is far
        # below the minhash screen's reach
        contained_in_batch = fps.limit(0).select(id_col)
        contained_cross = fps.limit(0).select(id_col)
        if self.containment:
            alive = batch.join(fps.select(id_col), id_col, "left_semi")
            pairs_c = dedup.shingle_containment_pairs_prefix(
                alive,
                text_col,
                id_col,
                shingle_n=_SHINGLE_N,
                threshold=self.containment_threshold,
            )
            # mutual containment (near-identical sets the minhash
            # screen missed): keep the lowest id instead of both dying
            rev = pairs_c.select(
                F.col("container_id").alias("contained_id"),
                F.col("contained_id").alias("container_id"),
                F.lit(True).alias("__mutual"),
            )
            contained_in_batch = (
                pairs_c.join(rev, ["contained_id", "container_id"], "left")
                .filter(
                    F.col("__mutual").isNull()
                    | (F.col("contained_id") > F.col("container_id"))
                )
                .select(F.col("contained_id").alias(id_col))
                .distinct()
            )
            fps = fps.join(contained_in_batch, id_col, "left_anti")

            if store is not None:
                if "shingles" not in store.columns:
                    raise ValueError(
                        "containment=True needs the fingerprint store to "
                        "carry each accepted doc's shingle set; this store "
                        "predates the screen — rebuild it (re-ingest) with "
                        "containment enabled"
                    )
                alive = batch.join(fps.select(id_col), id_col, "left_semi")
                pairs_s = dedup.shingle_containment_vs_sets(
                    alive,
                    store.select(F.col(id_col).alias("store_id"), "shingles"),
                    text_col,
                    id_col,
                    shingle_n=_SHINGLE_N,
                    threshold=self.containment_threshold,
                )
                contained_cross = (
                    pairs_s.select(F.col("contained_id").alias(id_col))
                    .distinct()
                )
                fps = fps.join(contained_cross, id_col, "left_anti")

        m.exact_in_batch = in_batch_exact.count()
        m.exact_vs_store = cross_exact.count()
        m.near_in_batch = near_in_batch.count()
        m.near_vs_store = near_cross.count()
        m.contained_in_batch = contained_in_batch.count()
        m.contained_vs_store = contained_cross.count()

        accepted_ids = fps.select(id_col)
        accepted = batch.join(accepted_ids, id_col, "left_semi")
        new_fps = fps.select(id_col, "fp", "minhash")
        # shingle sets are stored ONCE, at acceptance — future batches
        # screen against these arrays, never corpus text. Also written
        # when a containment=False ingest appends to a store that HAS
        # the column: a NULL-shingled row would pass the column guard
        # but silently never serve as a containment container.
        if self.containment or (
            store is not None and "shingles" in store.columns
        ):
            new_fps = new_fps.join(
                batch.select(
                    F.col(id_col),
                    dedup.word_shingles(
                        F.col(text_col), _SHINGLE_N
                    ).alias("shingles"),
                ),
                id_col,
            )

        if VersionedParquetTable.is_table(self.corpus_path):
            VersionedParquetTable(self.spark, self.corpus_path).append(
                accepted, txn=txn
            )
        else:
            VersionedParquetTable.create(
                self.spark, accepted, self.corpus_path, txn=txn,
                # high-frequency micro-batch appends: bound the
                # small-file accumulation at the storage layer
                properties={"autoCompact": "true",
                            "autoCompact.minFiles": "16"},
            )
        if VersionedParquetTable.is_table(self.fp_path):
            VersionedParquetTable(self.spark, self.fp_path).append(
                new_fps, txn=txn
            )
        else:
            VersionedParquetTable.create(
                self.spark, new_fps, self.fp_path, txn=txn,
                properties={"autoCompact": "true",
                            "autoCompact.minFiles": "16",
                            # signatures are family-specific; the read
                            # path refuses a mismatched store loudly
                            "minhash.family": dedup.MINHASH_FAMILY},
            )
        if self.bloom_prefilter:
            # fold this batch's accepted fingerprints into the bloom
            # (CDF-driven: same path heals a crash between the fp and
            # bloom commits — a stale bloom is caught by its version
            # stamp before any probe trusts it)
            self._sync_bloom(id_col)
        m.accepted = (
            m.n_in
            - m.exact_in_batch
            - m.exact_vs_store
            - m.near_in_batch
            - m.near_vs_store
            - m.contained_in_batch
            - m.contained_vs_store
        )
        return m
