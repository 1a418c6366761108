"""Streaming mini-batch k-means: the model table after N micro-batches
must equal a sequential in-memory fold of the same update rule, and a
replayed batch must not fold its vectors in twice."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable
from delta_lake_pyspark_scd2_spark.streaming import kmeans_model_stream

DIM = 4
K = 4


def _batches(rng, n_batches=3, per=40):
    dirs = np.eye(DIM)
    out, vid = [], 0
    for _ in range(n_batches):
        rows = []
        for _ in range(per):
            lab = vid % K
            v = dirs[lab] * 10 + rng.normal(size=DIM) * 0.2
            rows.append((vid, [float(x) for x in v], lab))
            vid += 1
        out.append(rows)
    return out


def _naive_fold(batches):
    """Sequential reference with the stream's exact contract: seed =
    first batch's K lowest ids (weight 0), 6-dp-rounded cosine
    assignment (ties to lower centroid id), 6-dp-rounded running
    mean."""
    seed = sorted(batches[0], key=lambda r: r[0])[:K]
    cents = {r[0]: (list(r[1]), 0.0) for r in seed}
    for rows in batches:
        stats = {}
        for vid, vec, _ in rows:
            best = None
            for cid in sorted(cents):
                c = cents[cid][0]
                sim = round(
                    float(np.dot(vec, c))
                    / (np.linalg.norm(vec) * np.linalg.norm(c)),
                    6,
                )
                if best is None or sim > best[0]:
                    best = (sim, cid)
            s, n = stats.setdefault(best[1], (np.zeros(DIM), 0))
            stats[best[1]] = (s + np.array(vec), n + 1)
        for cid, (s, n) in stats.items():
            vec, w = cents[cid]
            cents[cid] = (
                [round((vec[i] * w + s[i]) / (w + n), 6) for i in range(DIM)],
                w + n,
            )
    return cents


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return src, str(tmp_path / "model"), str(tmp_path / "ckpt")


def test_stream_matches_sequential_fold(spark, stream_dirs):
    src, model_path, ckpt = stream_dirs
    rng = np.random.default_rng(21)
    batches = _batches(rng)
    for i, rows in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for vid, vec, _ in rows:
                f.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
        kmeans_model_stream(
            spark, str(src), model_path, ckpt, k=K, dim=DIM
        )
    got = {
        r["vec_id"]: ([round(x, 6) for x in r["embedding"]], r["weight"])
        for r in VersionedParquetTable(spark, model_path).read().collect()
    }
    want = _naive_fold(batches)
    assert set(got) == set(want)
    for cid in got:
        assert got[cid][1] == want[cid][1]
        assert got[cid][0] == pytest.approx(want[cid][0], abs=2e-6)
    # all batch vectors seen exactly once
    assert sum(w for _, w in got.values()) == sum(len(b) for b in batches)
    # each cone owns one centroid: centroids' dominant axes are distinct
    axes = {int(np.argmax(vec)) for vec, _ in got.values()}
    assert axes == set(range(K))


def test_overwrite_txn_replay_is_noop(spark, tmp_path):
    t = VersionedParquetTable.create(
        spark,
        spark.createDataFrame([(1, 10.0)], "id long, v double"),
        str(tmp_path / "t"),
    )
    v1 = t.overwrite(
        spark.createDataFrame([(1, 20.0)], "id long, v double"), txn=("app", 0)
    )
    v2 = t.overwrite(
        spark.createDataFrame([(1, 99.0)], "id long, v double"), txn=("app", 0)
    )
    assert v2 == v1  # replay short-circuits
    assert t.read().collect()[0]["v"] == 20.0
    v3 = t.overwrite(
        spark.createDataFrame([(1, 30.0)], "id long, v double"), txn=("app", 1)
    )
    assert v3 == v1 + 1 and t.read().collect()[0]["v"] == 30.0


def test_kmeans_stream_checkpoint_reset_fails_loud(spark, tmp_path):
    """A fresh checkpoint against a kept model table restarts batch ids
    at 0; silently skipping until they pass the old watermark and then
    double-folding would corrupt the running means (the fold is not
    idempotent) — the watermark guard must abort the stream instead
    (round-4 ADVICE)."""
    src = tmp_path / "src"
    src.mkdir()
    model_path = str(tmp_path / "model")
    rng = np.random.default_rng(7)
    for i, rows in enumerate(_batches(rng)):
        with open(src / f"b{i}.json", "w") as f:
            for vid, vec, _ in rows:
                f.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
        kmeans_model_stream(
            spark, str(src), model_path, str(tmp_path / "ckpt1"), k=K, dim=DIM
        )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        (RuntimeError, StreamingQueryException, Py4JJavaError),
        match="checkpoint appears reset",
    ):
        kmeans_model_stream(
            spark, str(src), model_path, str(tmp_path / "ckpt2"), k=K, dim=DIM
        )
