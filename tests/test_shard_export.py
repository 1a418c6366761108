"""Shard export: deterministic dealing, manifest-last contract,
round-trip completeness."""

from __future__ import annotations

import json

from delta_lake_pyspark_scd2_spark.pipeline.shard_export import (
    MANIFEST_NAME,
    export_training_shards,
    shard_plan,
)


def test_export_round_trips_and_manifest_matches(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = export_training_shards(spark, docs, out, n_shards=4)

    # manifest stats match a fresh plan
    plan = {
        r["shard"]: (r["n_docs"], r["n_tokens"])
        for r in shard_plan(docs, n_shards=4).collect()
    }
    assert len(manifest["shards"]) == len(plan)
    for k, v in manifest["shards"].items():
        assert plan[int(k)] == (v["n_docs"], v["n_tokens"])

    # no doc lost or duplicated; sidecar is valid JSON on disk
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    disk = json.loads((tmp_path / "shards" / MANIFEST_NAME).read_text())
    assert disk == manifest

    # dealing is deterministic: re-export to a second path, same shards
    out2 = str(tmp_path / "shards2")
    m2 = export_training_shards(spark, docs, out2, n_shards=4)
    assert m2["shards"] == manifest["shards"]


def test_shards_are_reasonably_balanced(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = shard_plan(docs, n_shards=4).collect()
    counts = [r["n_docs"] for r in rows]
    assert len(counts) == 4
    assert max(counts) < 2 * min(counts)  # hash balance at 500 docs
