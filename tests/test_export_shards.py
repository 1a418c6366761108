"""Sharded training export (sources/export.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.sources.export import (
    export_shards,
    read_shards,
    shard_of,
)
from delta_lake_pyspark_scd2_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_export_roundtrip_and_manifest(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    n = docs.count()
    man = export_shards(docs, str(tmp_path / "exp"), num_shards=4)
    assert man["total_rows"] == n
    assert sum(man["rows_per_shard"].values()) == n
    assert len(man["rows_per_shard"]) == 4
    back = read_shards(spark, str(tmp_path / "exp"))
    assert back.count() == n
    assert back.select("doc_id").distinct().count() == n


def test_one_file_per_shard_sorted(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    export_shards(docs, str(tmp_path / "exp"), num_shards=4)
    for d in glob.glob(str(tmp_path / "exp" / "shard=*")):
        files = [f for f in os.listdir(d) if f.startswith("part-")]
        assert len(files) == 1, d
        ids = [
            int(line.split('"doc_id":')[1].split(",")[0])
            for line in open(os.path.join(d, files[0]))
            if '"doc_id"' in line
        ]
        assert ids == sorted(ids)


def test_assignment_is_content_stable(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    a = export_shards(docs, str(tmp_path / "a"), num_shards=4)
    # different input partitioning, same shard counts and membership
    b = export_shards(docs.repartition(13), str(tmp_path / "b"), num_shards=4)
    assert a["rows_per_shard"] == b["rows_per_shard"]
    ra = read_shards(spark, str(tmp_path / "a")).select("doc_id", "shard")
    rb = read_shards(spark, str(tmp_path / "b")).select("doc_id", "shard")
    assert ra.exceptAll(rb).count() == 0


def test_subset_read_prunes_partitions(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    export_shards(docs, str(tmp_path / "exp"), num_shards=4)
    sub = read_shards(spark, str(tmp_path / "exp"), shards=[1])
    # inputFiles() reports pre-pruning; the files actually READ are
    # visible per-row via input_file_name()
    files = {
        os.path.dirname(r["f"])
        for r in sub.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files and all(p.endswith("shard=1") for p in files)
    expected = (
        load_table(spark, SF, "documents")
        .filter(shard_of("doc_id", 4) == 1)
        .count()
    )
    assert sub.count() == expected


def test_balance_no_empty_shards(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    man = export_shards(docs, str(tmp_path / "exp"), num_shards=4)
    counts = list(man["rows_per_shard"].values())
    assert min(counts) > 0
    assert max(counts) < 2 * (sum(counts) / len(counts))  # rough balance


# ---------------------------------------------------------------------------
# tokens_before: the two-level chunked prefix sum (round-5 VERDICT #3)
# ---------------------------------------------------------------------------


def test_tokens_before_matches_single_window_form(spark):
    """The distributed two-level prefix sum must be bit-identical to
    the naive per-source running-sum window (the oracle shape) —
    same exact integer sums, same id total order."""
    from pyspark.sql import Window

    from delta_lake_pyspark_scd2_spark.operators.text import token_count_ws
    from delta_lake_pyspark_scd2_spark.sources.export import tokens_before

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    )
    toks = token_count_ws(F.col("text")).cast("long")
    got = {
        r["doc_id"]: r["tok_before"]
        # tiny n_chunks so level 2 (chunk offsets) is actually exercised
        for r in tokens_before(docs, toks, n_chunks=7).collect()
    }
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["doc_id"]: r["tb"]
        for r in docs.select(
            "doc_id",
            F.coalesce(F.sum(toks).over(w), F.lit(0)).alias("tb"),
        ).collect()
    }
    assert got == want


def test_tokens_before_has_no_per_source_doc_window(spark):
    """Scale pin: NO window over doc rows is partitioned by source
    alone — doc-level windows must include the chunk key (parallel
    within a source); the only source-partitioned window runs over the
    bounded chunk-totals aggregate."""
    import re

    from delta_lake_pyspark_scd2_spark.operators.text import token_count_ws
    from delta_lake_pyspark_scd2_spark.sources.export import tokens_before

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    )
    out = tokens_before(docs, token_count_ws(F.col("text")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # old weak shape: windowspecdefinition(source, doc_id ASC ...)
    assert not re.search(
        r"windowspecdefinition\(source#\d+, doc_id#\d+L? ASC", plan
    ), plan
    # new shape: the doc-level window keys on (source, __chunk)
    assert re.search(
        r"windowspecdefinition\(source#\d+, __chunk#\d+L?, doc_id#\d+L? ASC",
        plan,
    ), plan
