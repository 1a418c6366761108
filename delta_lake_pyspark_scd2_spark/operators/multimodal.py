"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode step is STUBBED (no imaging/audio libraries in this
container — see ``decode_image_stub``); everything Spark-side — schema,
Arrow batch shape, ``mapInPandas`` signature, partitioning — is real
and tested, so swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the feature extractor (what a real image decoder
#: would emit: dimensions + a compact feature vector).
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Make a documents-like table multimodal: a ``binary`` payload
    column (UTF-8 bytes of the text — a deterministic stand-in for real
    image bytes) plus typed metadata columns."""
    return (
        df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
        .withColumn("media_type", F.lit("application/octet-stream"))
        .withColumn("n_bytes", F.octet_length("payload"))
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decoder: a real implementation would use PIL/libvips/ffmpeg
    (not present in this container). Returns a deterministic fake:
    pseudo width/height from the payload hash, and an 8-dim feature
    vector from the digest bytes. Raises on empty payloads like a real
    decoder would on corrupt input."""
    if not payload:
        raise NotImplementedError("empty payload — real decoder unavailable")
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    features = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, features


def extract_features(df: DataFrame, *, batch_limit: int | None = None) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` —
    the Arrow-batched slow path reserved for genuinely non-relational
    work. One Python worker per partition; batch size bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"].astype("int32"),
                "content_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
            decoded = pdf["payload"].map(lambda b: decode_image_stub(bytes(b)))
            out["width"] = decoded.map(lambda d: d[0]).astype("int32")
            out["height"] = decoded.map(lambda d: d[1]).astype("int32")
            out["features"] = decoded.map(lambda d: d[2])
            yield pd.DataFrame(out)

    cols = ["doc_id", "media_type", "n_bytes", "payload"]
    return df.select(*cols).mapInPandas(_extract, FEATURE_SCHEMA)


#: Output schema of the resize stage: payload replaced by the resized
#: bytes, dimensions updated, provenance kept.
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("orig_md5", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame, *, target_width: int = 224, target_height: int = 224
) -> DataFrame:
    """Image resize over ``mapInPandas`` — plumbing real, pixel work
    STUBBED (a real implementation calls PIL/libvips per payload; this
    container has neither, so the stub emits a deterministic
    size-stamped payload). The Spark-side contract a real decoder slots
    into: binary in → binary out, per-row transformation, Arrow
    batches, no shuffle (narrow op — resizes run where the bytes live).
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # stub: a real resize re-encodes pixels; we stamp the
                    # target geometry over the content hash
                    "payload": payloads.map(
                        lambda b: hashlib.md5(b).digest()
                        + target_width.to_bytes(2, "big")
                        + target_height.to_bytes(2, "big")
                    ),
                    "width": target_width,
                    "height": target_height,
                    "orig_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_resize, RESIZE_SCHEMA)


#: One row per sampled frame.
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, *, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling over ``mapInPandas`` — a 1→N exploding
    media op (each payload yields several frame rows). Decode STUBBED
    (real: ffmpeg seeks); the fake derives a deterministic frame count
    from the payload and hashes per-frame bytes. Spark contract shown:
    output cardinality > input, still narrow (no shuffle) — the
    downstream repartition decides frame distribution for training.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_ts_ms": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = min(max_frames, 1 + (len(b) % max_frames))
                for i in range(n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame"].append(
                        hashlib.md5(b + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(_sample, FRAME_SCHEMA)


def media_phash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """60-bit perceptual-hash stand-in per media payload.

    A real pHash is a DCT over the decoded image; with decoding stubbed
    (codec libs absent by design) the hash is md5-derived from the raw
    bytes — WRONG for true perceptual similarity but byte-exact for
    identical payloads, so exact-duplicate media dedup is real while
    the near-dup machinery below exercises the genuine banded-hamming
    plan shape a real pHash would ride unchanged.
    """
    return df.withColumn(
        "phash",
        F.conv(F.substring(F.md5(F.col(payload_col)), 1, 15), 16, 10).cast(
            "long"
        ),
    )


def media_phash_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bands: int = 4,
    band_bits: int = 15,
) -> DataFrame:
    """Near-duplicate media pairs by pHash hamming distance.

    Banded exact-match blocking (pigeonhole: two hashes within
    ``max_hamming < bands`` bit flips of each other MUST agree on at
    least one band when flips < bands — with 4 bands this is complete
    for hamming <= 3 and high-recall above), then an exact
    ``bit_count(xor)`` verify. All JVM bit arithmetic: no UDFs, one
    band-keyed shuffle, candidate-bounded join — the identical plan a
    real 64-bit DCT pHash would use at 100 TB.
    """
    # a precomputed phash column (e.g. from a real DCT decoder) plugs
    # straight in; otherwise derive the md5 stand-in from the payload
    hashed = (
        df.select(F.col(id_col), "phash")
        if "phash" in df.columns
        else media_phash(df).select(F.col(id_col), "phash")
    )
    banded = hashed.select(
        id_col,
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftrightunsigned(F.col("phash"), b * band_bits)
                            .bitwiseAND(F.lit((1 << band_bits) - 1))
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "phash", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
