"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata.
Two decode tiers:

* REAL: netpbm P6 (PPM) — a codec-free format this container can
  decode in pure numpy (``decode_ppm``). Feature extraction and
  box-filter resize over PPM payloads are value-hash verified against
  a DuckDB oracle that recomputes the expected pixels.
* STUBBED: codec formats (JPEG/audio/video — PIL/libvips/ffmpeg absent
  by design; see ``decode_image_stub``). The Spark-side plumbing —
  schema, Arrow batch shape, ``mapInPandas`` signature, partitioning —
  is real and tested, so swapping in a real codec is a one-function
  change, and the guards fail loud rather than fake pixels.
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


# ---------------------------------------------------------------------------
# Codec-free REAL decode path: PPM (netpbm P6)
# ---------------------------------------------------------------------------
# The stubbed decoders above stand in for codecs this container lacks
# (JPEG/video). PPM needs no codec library — the P6 format is a text
# header plus raw RGB bytes — so the decode step below is a REAL
# parser (pure numpy), making the multimodal family value-hash
# provable end-to-end: payload bytes -> parsed pixels -> features /
# box-filter resize, checked against a DuckDB oracle that recomputes
# the same pixels from the deterministic generation rule.

#: Pixel-generation rule shared with the SQL oracle (plans/llm_ops.py):
#:   h    = md5_prefix("ppm:" + doc_id)
#:   w    = 4 * (2 + h % 3)          in {8, 12, 16}
#:   hgt  = 4 * (2 + (h // 3) % 3)   in {8, 12, 16}
#:   px(y, x, c) = (doc_id*7 + x*13 + y*31 + c*97 + h) % 256
PPM_MEDIA_TYPE = "image/x-portable-pixmap"


def _ppm_params(doc_id: int) -> tuple[int, int, int]:
    h = int(hashlib.md5(f"ppm:{doc_id}".encode()).hexdigest()[:8], 16)
    return h, 4 * (2 + h % 3), 4 * (2 + (h // 3) % 3)


def generate_ppm(doc_id: int) -> bytes:
    """Deterministic, VALID P6 payload for a doc id (the synthetic
    image corpus). A real pipeline reads camera/scraped bytes; the
    generation rule here exists so the oracle can recompute expected
    pixels without parsing binary in SQL."""
    import numpy as np

    h, w, hgt = _ppm_params(doc_id)
    y, x, c = np.ogrid[0:hgt, 0:w, 0:3]
    px = (doc_id * 7 + x * 13 + y * 31 + c * 97 + h) % 256
    header = f"P6\n{w} {hgt}\n255\n".encode()
    return header + px.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes):
    """REAL P6 decoder in pure numpy: tokenizes the netpbm header
    (whitespace-separated magic/width/height/maxval, ``#`` comments
    allowed per spec), then views the raw RGB bytes as an (h, w, 3)
    array. Raises ValueError on malformed input — fail-loud like the
    codec guards."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header tokenizer: 4 tokens, comments run to end-of-line
    tokens: list[bytes] = []
    i = 2
    n = len(payload)
    while len(tokens) < 3 and i < n:
        ch = payload[i : i + 1]
        if ch == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif ch.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 3 or i >= n:
        raise ValueError("truncated PPM header")
    w, hgt, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    i += 1  # exactly ONE whitespace byte separates maxval from raster
    raster = payload[i : i + w * hgt * 3]
    if len(raster) != w * hgt * 3:
        raise ValueError("truncated PPM raster")
    return w, hgt, np.frombuffer(raster, dtype=np.uint8).reshape(hgt, w, 3)


#: Output schema of the PPM channel-stats extractor.
PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("mean_value", T.DoubleType()),
    ]
)


def ppm_channel_stats(df: DataFrame) -> DataFrame:
    """Feature extraction with a REAL decode: parse each P6 payload's
    bytes, emit per-channel pixel means (6 dp — integer pixel sums
    divide exactly in float64, so the rounding is engine-stable).
    Same Spark contract as :func:`extract_features` — Arrow-batched
    ``mapInPandas``, narrow (features computed where the bytes live)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in PPM_STATS_SCHEMA}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, hgt, px = decode_ppm(bytes(payload))
                sums = px.sum(axis=(0, 1), dtype="int64")
                for c in range(3):
                    rows["doc_id"].append(doc_id)
                    rows["width"].append(w)
                    rows["height"].append(hgt)
                    rows["channel"].append(c)
                    rows["mean_value"].append(
                        round(float(sums[c]) / (w * hgt), 6)
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(_stats, PPM_STATS_SCHEMA)


#: One row per resized output pixel component.
PPM_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("oy", T.IntegerType()),
        T.StructField("ox", T.IntegerType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("value", T.IntegerType()),
    ]
)


def ppm_resize_box(
    df: DataFrame, *, out_w: int = 4, out_h: int = 4
) -> DataFrame:
    """REAL image resize: decode the P6 bytes, box-filter each
    (h/out_h, w/out_w) pixel block to its FLOOR mean (exact integer
    arithmetic — ``block_sum // block_size`` — so the DuckDB oracle
    reproduces every output pixel bit-for-bit; generated dims are
    multiples of 4 so blocks tile exactly). Emits one row per output
    pixel component rather than re-encoded bytes: scalar columns are
    what the value-hash gate can verify, and downstream training
    pipelines consume tensors, not PPM files."""
    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in PPM_RESIZE_SCHEMA}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, hgt, px = decode_ppm(bytes(payload))
                bw, bh = w // out_w, hgt // out_h
                blocks = px.astype("int64").reshape(out_h, bh, out_w, bw, 3)
                vals = blocks.sum(axis=(1, 3)) // (bw * bh)  # (out_h,out_w,3)
                oy, ox, c = np.meshgrid(
                    np.arange(out_h), np.arange(out_w), np.arange(3),
                    indexing="ij",
                )
                k = out_h * out_w * 3
                rows["doc_id"].extend([doc_id] * k)
                rows["oy"].extend(oy.ravel())
                rows["ox"].extend(ox.ravel())
                rows["channel"].extend(c.ravel())
                rows["value"].extend(vals.ravel())
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(_resize, PPM_RESIZE_SCHEMA)


def attach_ppm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic VALID P6 payload per row — the synthetic
    image corpus for the real-decode path (``mapInPandas``: payload
    construction is byte work, not relational work)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "media_type": PPM_MEDIA_TYPE,
                    "payload": ids.map(lambda i: generate_ppm(int(i))),
                }
            )

    return df.select(id_col).mapInPandas(_gen, schema)
