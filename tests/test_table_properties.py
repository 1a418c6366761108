"""Table properties (TBLPROPERTIES analogue) and autoCompact: streaming
appends never accumulate a small-file problem; compaction cost scales
with the append's touched partitions, not the table."""

import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable


def _batch(spark, lo, part, n=5):
    return spark.createDataFrame(
        [(lo + i, part, (lo + i) * 2) for i in range(n)],
        "id long, part string, val long",
    ).coalesce(1)


def test_set_unset_property_roundtrip(spark, tmp_path):
    t = VersionedParquetTable.create(
        spark, _batch(spark, 0, "a"), str(tmp_path / "t")
    )
    t.set_property("autoCompact", "true")
    t.set_property("autoCompact.minFiles", "4")
    assert t.properties() == {"autoCompact": "true", "autoCompact.minFiles": "4"}
    assert t.detail()["properties"]["autoCompact"] == "true"
    t.unset_property("autoCompact.minFiles")
    assert t.properties() == {"autoCompact": "true"}
    with pytest.raises(KeyError):
        t.unset_property("nope")
    # properties survive unrelated commits
    t.append(_batch(spark, 100, "a"))
    assert t.properties(version=None).get("autoCompact") == "true"


def test_auto_compact_bounds_file_count(spark, tmp_path):
    t = VersionedParquetTable.create(
        spark, _batch(spark, 0, "a"), str(tmp_path / "t"),
        partition_cols=["part"],
    )
    t.set_property("autoCompact", "true")
    t.set_property("autoCompact.minFiles", "4")
    for i in range(1, 10):
        t.append(_batch(spark, i * 10, "a"))
        n_files = len(t._current()["files"])
        assert n_files < 4, f"append {i}: {n_files} files accumulated"
    assert t.read().count() == 50
    assert "COMPACT" in [h["operation"] for h in t.history()]


def test_auto_compact_only_touches_appended_partition(spark, tmp_path):
    t = VersionedParquetTable.create(
        spark, _batch(spark, 0, "a"), str(tmp_path / "t"),
        partition_cols=["part"],
    )
    # partition b accumulates 5 small files BEFORE autoCompact is on
    for i in range(5):
        t.append(_batch(spark, 100 + i * 10, "b"))
    b_files = {
        f["path"] for f in t._current()["files"] if f["partition"]["part"] == "b"
    }
    assert len(b_files) == 5
    t.set_property("autoCompact", "true")
    t.set_property("autoCompact.minFiles", "4")
    # appends to partition a never trigger a rewrite of partition b
    for i in range(1, 6):
        t.append(_batch(spark, i * 10, "a"))
    after = {
        f["path"] for f in t._current()["files"] if f["partition"]["part"] == "b"
    }
    assert after == b_files  # untouched partition carried by reference
    a_files = [
        f for f in t._current()["files"] if f["partition"]["part"] == "a"
    ]
    assert len(a_files) < 4


def test_auto_compact_off_accumulates(spark, tmp_path):
    t = VersionedParquetTable.create(
        spark, _batch(spark, 0, "a"), str(tmp_path / "t")
    )
    for i in range(1, 6):
        t.append(_batch(spark, i * 10, "a"))
    assert len(t._current()["files"]) == 6  # no property, no compaction


def test_upsert_sync_deletes_mirrors_source(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: the table becomes an
    exact mirror of the source snapshot."""
    t = VersionedParquetTable.create(
        spark,
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
            "id long, part string, val long",
        ),
        str(tmp_path / "t"),
        partition_cols=["part"],
    )
    src = spark.createDataFrame(
        [(1, "a", 11), (4, "b", 40)], "id long, part string, val long"
    )
    out = t.upsert(src, ["id"], sync_deletes=True)
    got = {(r["id"], r["val"]) for r in t.read().collect()}
    assert got == {(1, 11), (4, 40)}
    assert out["n_deleted"] == 2  # ids 2 and 3 vanished from source
    assert out["n_updated"] == 1 and out["n_inserted"] == 1
    with pytest.raises(ValueError, match="not both"):
        t.upsert(src, ["id"], deletes=src.select("id"), sync_deletes=True)


def test_zorder_scoped_to_partitions(spark, tmp_path):
    """OPTIMIZE ... WHERE analogue: z-order rewrite of only the named
    partitions; the rest are carried by reference."""
    rows = [(i, "a" if i < 50 else "b", i % 10, i // 10) for i in range(100)]
    t = VersionedParquetTable.create(
        spark,
        spark.createDataFrame(rows, "id long, part string, x long, y long"),
        str(tmp_path / "t"),
        partition_cols=["part"],
    )
    b_files = {
        f["path"] for f in t._current()["files"] if f["partition"]["part"] == "b"
    }
    t.compact(zorder_by=["x", "y"], only_partitions=[{"part": "a"}])
    m = t._current()
    after_b = {f["path"] for f in m["files"] if f["partition"]["part"] == "b"}
    assert after_b == b_files  # partition b untouched
    assert t.read().count() == 100
    assert [h["operation"] for h in t.history()][0] == "ZORDER"
