"""Training-export sink: deterministic sharded corpus dumps.

The last step of a data pipeline is handing the corpus to a trainer,
which wants N equal-ish shards it can map to data-loader workers —
stable across re-runs (resumable training), balanced (no straggler
shard), and self-describing (a manifest with per-shard counts).

Shard assignment is a content hash of the id (md5-derived, the same
engine-portable hash family as ``operators.mixture``), NOT
``spark.write``'s task numbering: the same row lands in the same shard
on any cluster size, any input partitioning, any run. Within a shard,
rows are written sorted by id, so a re-export of identical data is
byte-identical payload-wise.

Scale: one repartition on the shard key (the unavoidable placement
shuffle), then a narrow per-partition sort and write; per-shard counts
ride the same job as an ``Observation``-style groupBy on the compact
shard column. At 100 TB, ``num_shards`` is thousands; each shard is
one file written by one task — also the small-files answer.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_of(id_col: str, num_shards: int):
    """Deterministic shard id: first 8 md5 hex chars of the string id,
    mod ``num_shards``."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % num_shards
    ).cast("int")


def export_shards(
    df: DataFrame,
    path: str,
    num_shards: int = 8,
    *,
    fmt: str = "json",
    id_col: str = "doc_id",
) -> dict[str, Any]:
    """Write ``df`` as ``num_shards`` hash shards under ``path`` and a
    ``manifest.json`` beside them; returns the manifest.

    Layout: ``path/shard=K/part-*.{json,parquet}`` — one file per
    shard (each shard's rows are repartitioned onto one task), rows
    sorted by ``id_col`` inside the file.
    """
    if fmt not in ("json", "parquet"):
        raise ValueError(f"unsupported export format: {fmt}")
    sharded = df.withColumn("shard", shard_of(id_col, num_shards))
    (
        sharded.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
    counts = {
        int(r["shard"]): r["n"]
        for r in sharded.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "format": fmt,
        "num_shards": num_shards,
        "total_rows": int(sum(counts.values())),
        "rows_per_shard": {str(k): int(v) for k, v in sorted(counts.items())},
        "columns": [c for c in df.columns],
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_shards(spark, path: str, *, shards: list[int] | None = None) -> DataFrame:
    """Read an export back (optionally a subset of shards — partition
    pruning makes the subset read touch only those directories)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    df = spark.read.format(manifest["format"]).load(path)
    if shards is not None:
        df = df.filter(F.col("shard").isin(shards))
    return df
