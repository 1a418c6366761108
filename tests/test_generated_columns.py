"""GENERATED ALWAYS AS columns (Delta generated-columns analogue):
derived when omitted, validated on the write job when supplied, and
usable as partition columns so layout derivation is table-enforced."""

import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable

GEN = {"y": "year(ts)", "m": "month(ts)"}


def _events(spark, rows):
    return spark.createDataFrame(rows, "id long, ts timestamp")


def _row(i, ts):
    import datetime

    return (i, datetime.datetime.fromisoformat(ts))


def test_create_derives_and_partitions_on_generated(spark, tmp_path):
    df = _events(spark, [_row(1, "2023-01-21T10:00:00"), _row(2, "2023-02-05T09:00:00")])
    t = VersionedParquetTable.create(
        spark, df, str(tmp_path / "t"),
        partition_cols=["y", "m"], generated_cols=GEN,
    )
    got = t.read()
    assert set(got.columns) == {"id", "ts", "y", "m"}
    assert {(r["y"], r["m"]) for r in got.collect()} == {(2023, 1), (2023, 2)}
    assert t.generated_columns() == GEN
    assert t.detail()["generated_cols"] == GEN
    # partition layout really is derived: manifest partition values
    parts = {tuple(sorted(p.items())) for p in t.partitions_of()}
    assert (("m", "1"), ("y", "2023")) in parts


def test_append_omitting_generated_derives_them(spark, tmp_path):
    df = _events(spark, [_row(1, "2023-01-21T10:00:00")])
    t = VersionedParquetTable.create(
        spark, df, str(tmp_path / "t"),
        partition_cols=["y", "m"], generated_cols=GEN,
    )
    t.append(_events(spark, [_row(2, "2024-03-09T12:00:00")]))
    got = t.read().filter(F.col("id") == 2).collect()[0]
    assert (got["y"], got["m"]) == (2024, 3)


def test_write_supplying_wrong_generated_value_is_rejected(spark, tmp_path):
    df = _events(spark, [_row(1, "2023-01-21T10:00:00")])
    t = VersionedParquetTable.create(
        spark, df, str(tmp_path / "t"),
        partition_cols=["y", "m"], generated_cols=GEN,
    )
    bad = _events(spark, [_row(2, "2024-03-09T12:00:00")]).withColumn(
        "y", F.lit(1999)
    )  # contradicts year(ts)
    with pytest.raises(ValueError, match="__generated_y"):
        t.append(bad)
    assert t.read().count() == 1  # table untouched
    ok = _events(spark, [_row(3, "2024-03-09T12:00:00")]).withColumn(
        "y", F.lit(2024)
    )
    t.append(ok)  # correct supplied value passes validation
    assert t.read().count() == 2


def test_upsert_derives_generated_partition_values(spark, tmp_path):
    df = _events(spark, [_row(1, "2023-01-21T10:00:00")])
    t = VersionedParquetTable.create(
        spark, df, str(tmp_path / "t"),
        partition_cols=["y", "m"], generated_cols=GEN,
    )
    t.upsert(_events(spark, [_row(1, "2025-06-01T00:00:00")]), ["id"])
    got = t.read().collect()
    assert len(got) == 1 and (got[0]["y"], got[0]["m"]) == (2025, 6)


def test_rename_drop_guards_for_generated(spark, tmp_path):
    df = _events(spark, [_row(1, "2023-01-21T10:00:00")])
    t = VersionedParquetTable.create(
        spark, df, str(tmp_path / "t"), generated_cols={"y": "year(ts)"}
    )
    with pytest.raises(ValueError, match="generated column"):
        t.rename_column("ts", "event_ts")  # source of y
    with pytest.raises(ValueError, match="generated column"):
        t.drop_column("y")
    t.rename_column("id", "doc_id")  # unrelated columns still fine
    assert "doc_id" in t.read().columns
