"""Ingestion-path tests: pipe-CSV extract → filename batch date →
validation (mismatch + quarantine) → SCD2 merge; items-style drop_all
dedup; plan-quality regression guards (pushdown / broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_pyspark_scd2_spark.functions import batch_date_from_filename
from delta_lake_pyspark_scd2_spark.pipeline import SCD2Spec, run_scd2_batch
from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable

CSV_SCHEMA = T.StructType(
    [
        T.StructField("contract", T.StringType(), False),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("status", T.StringType()),
    ]
)

SPEC = SCD2Spec(
    key_cols=("contract",), event_ts_col="event_time", tracked_cols=("status",)
)


def _write_pipe_csv(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("contract|event_time|status\n" + "\n".join(lines) + "\n")
    return str(p)


def test_csv_extract_to_scd2_with_batch_date_validation(spark, tmp_path):
    # reference E1 lifecycle (src/header_etl.py:62-82): pipe CSV with
    # explicit schema, batch date from the filename, mismatch quarantined
    path = _write_pipe_csv(
        tmp_path,
        "header_20230121.csv",
        [
            "A|2023-01-21 10:00:00|Draft",
            "B|2023-01-22 09:00:00|Draft",  # date != filename date => discard
            "|2023-01-21 11:00:00|Draft",   # null key => discard
        ],
    )
    df = (
        spark.read.option("header", "true")
        .option("sep", "|")
        .schema(CSV_SCHEMA)
        .csv(path)
        .withColumn("batch_date", batch_date_from_filename())
    )
    table = str(tmp_path / "table")
    quarantine = str(tmp_path / "quarantine")
    m = run_scd2_batch(
        spark, SPEC, df, table, batch_id="20230121",
        batch_date_col="batch_date", quarantine_path=quarantine,
    )
    assert m["n_kept"] == 1
    assert m["n_null_key"] == 1 and m["n_batch_date_mismatch"] == 1
    rows = VersionedParquetTable(spark, table).read().collect()
    assert len(rows) == 1 and rows[0].contract == "A"
    q = spark.read.parquet(f"{quarantine}/batch=20230121")
    reasons = {r.discard_reason for r in q.collect()}
    assert reasons == {"NULL_KEY", "BATCH_DATE_MISMATCH"}


def test_drop_all_dedup_mode(spark, tmp_path):
    # items W3 semantics (src/items_etl.py:56-64): a duplicated
    # (key, event_time) group is dropped ENTIRELY, not keep-one
    df = spark.createDataFrame(
        [
            ("A", "2023-01-21 10:00:00", "Draft"),
            ("A", "2023-01-21 10:00:00", "Signed"),  # same key+ts => both go
            ("B", "2023-01-21 11:00:00", "Draft"),
        ],
        "contract string, event_time string, status string",
    ).withColumn("event_time", F.col("event_time").cast("timestamp"))
    spec = SCD2Spec(
        key_cols=("contract",), event_ts_col="event_time",
        tracked_cols=("status",), dedup_mode="drop_all",
    )
    table = str(tmp_path / "t")
    m = run_scd2_batch(spark, spec, df, table, batch_id="b1")
    rows = VersionedParquetTable(spark, table).read().collect()
    assert [r.contract for r in rows] == ["B"]
    assert m["n_duplicate_older"] == 2


def test_plan_quality_pushdown_and_broadcast(spark):
    # regression guard for the .explain audit: filters reach the parquet
    # scan, projection prunes columns, dimension joins broadcast
    from delta_lake_pyspark_scd2_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    q1 = REGISTRY["q1_pricing_summary"].builder(spark, sf)
    plan = q1._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "l_comment" not in plan  # column pruning reached the scan
    q5 = REGISTRY["q5_region_volume"].builder(spark, sf)
    plan5 = q5._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastHashJoin" in plan5
    assert "CartesianProduct" not in plan5


def test_cli_end_to_end(tmp_path, spark):
    """E1 CLI contract: <read_path> <base_write_path> produces the
    reference's landing/discarded/metrics layout and prints metrics."""
    import json

    from delta_lake_pyspark_scd2_spark.pipeline import cli

    path = _write_pipe_csv(
        tmp_path,
        "header_20230121.csv",
        [
            "A|2023-01-21 10:00:00|Draft",
            "A|2023-01-21 12:00:00|Signed",
            "B|2023-01-22 09:00:00|Draft",  # batch-date mismatch => quarantined
        ],
    )
    base = str(tmp_path / "out")
    m = cli.main([path, base])
    assert m["batch_id"] == "20230121"
    assert m["n_kept"] == 2 and m["n_batch_date_mismatch"] == 1
    t = VersionedParquetTable(spark, f"{base}/landing")
    rows = sorted(t.read().collect(), key=lambda r: r.valid_from)
    assert [r.status for r in rows] == ["Draft", "Signed"]
    assert rows[1].is_current and not rows[0].is_current
    q = spark.read.parquet(f"{base}/discarded/batch=20230121")
    assert q.count() == 1
    hist = spark.read.option("header", True).csv(f"{base}/metrics")
    assert hist.count() == 1


def test_cli_items_variant_drop_all(tmp_path, spark):
    from delta_lake_pyspark_scd2_spark.pipeline import cli

    path = _write_pipe_csv(
        tmp_path,
        "items_20230121.csv",
        [
            "A|2023-01-21 10:00:00|Draft",
            "A|2023-01-21 10:00:00|Signed",  # same key+ts: drop_all kills both
            "B|2023-01-21 11:00:00|Draft",
        ],
    )
    base = str(tmp_path / "out")
    m = cli.main([path, base, "--dedup-mode", "drop_all"])
    assert m["n_kept"] == 1
    rows = VersionedParquetTable(spark, f"{base}/landing").read().collect()
    assert [r.contract for r in rows] == ["B"]
