"""Training-shard export — the last mile of a corpus pipeline: deal a
cleaned corpus into ``n_shards`` deterministic shards and publish them
as one parquet file each plus a machine-readable manifest.

Scale design:

* **Assignment is a pure hash** (``md5(id) mod n_shards``) — no global
  ordering, no driver involvement, identical on any cluster shape, and
  balanced to ~1/sqrt(docs-per-shard) by the law of large numbers
  (the trainer's shuffle buffer absorbs that variance; tight balancing
  would cost a global sort for no benefit).
* **One shuffle**: repartition on the shard key doubles as the write
  layout (one file per shard), and the per-shard stats ride the same
  pass.
* **Manifest before data is the crash contract**: data files land
  first, the manifest (shard → rows/tokens/path) is written LAST via
  the Hadoop FS shim — a missing manifest marks an incomplete export,
  so consumers never read a half-dealt corpus.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.operators.text import token_count_ws

MANIFEST_NAME = "_shard_manifest.json"


def shard_assignment(id_col: str, n_shards: int) -> "F.Column":
    """Deterministic shard id: md5 of the stringified id, mod n_shards —
    reproducible in any engine (DuckDB:
    ``('0x' || substr(md5(CAST(id AS VARCHAR)),1,8))::BIGINT % n``)."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    return (h % n_shards).cast("int").alias("shard")


def shard_plan(
    df: DataFrame,
    *,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard statistics of the would-be export (shard, n_docs,
    n_tokens) — the dry-run / audit view."""
    return (
        df.select(shard_assignment(id_col, n_shards), token_count_ws(F.col(text_col)).alias("__t"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
        )
    )


def export_training_shards(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Write the corpus as ``path/shard=K/`` parquet (one file per
    shard) + ``path/_shard_manifest.json``; returns the manifest."""
    from delta_lake_pyspark_scd2_spark.sources import fsio

    out = df.withColumn("shard", shard_assignment(id_col, n_shards))
    (
        out.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    stats = shard_plan(
        df, n_shards=n_shards, text_col=text_col, id_col=id_col
    ).collect()
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "assignment": "md5(id) % n_shards",
        "shards": {
            str(r["shard"]): {
                "path": f"shard={r['shard']}",
                "n_docs": int(r["n_docs"]),
                "n_tokens": int(r["n_tokens"]),
            }
            for r in stats
        },
    }
    fs = fsio.get_fs(path, spark)
    fs.write_text(f"{path}/{MANIFEST_NAME}", json.dumps(manifest, indent=1))
    return manifest
