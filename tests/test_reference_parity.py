"""Behavioral parity against the reference's OWN committed fixtures.

Runs this engine's SCD2 pipeline over the reference's
``data/header/header_2023012{1,5,6}.csv`` batches (read-only) and
asserts the same golden history its test suite asserts for contract
``Y02103210`` (``test/header_etl_test.py:75-131``): version counts,
unique current row, close timestamps, and tracked-field values — with
this engine's timestamp-granularity intervals (the reference's old
fixtures asserted date granularity; the *shape* of the history is the
contract).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_lake_pyspark_scd2_spark.functions import parse_ts_fallback
from delta_lake_pyspark_scd2_spark.pipeline import SCD2Spec, run_scd2_batch
from delta_lake_pyspark_scd2_spark.sources.vtable import VersionedParquetTable

REF_DATA = "/root/reference/data/header"

SPEC = SCD2Spec(
    key_cols=("contratto_cod",),
    event_ts_col="event_time_ts",
    # the reference's tracked columns, src/header_etl.py:189-194
    tracked_cols=("status_quote", "codice_agente", "codice_ordine_sap"),
)


def _load_batch(spark, name):
    raw = (
        spark.read.option("header", "true")
        .option("sep", "|")
        .csv(os.path.join(REF_DATA, name))
    )
    # multi-format fallback chain (reference src/header_etl.py:89-102)
    return raw.withColumn("event_time_ts", parse_ts_fallback("event_time"))


@pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not present"
)
def test_reference_golden_history_Y02103210(spark, tmp_path):
    table = str(tmp_path / "header_scd2")

    run_scd2_batch(spark, SPEC, _load_batch(spark, "header_20230121.csv"),
                   table, batch_id="20230121")
    run_scd2_batch(spark, SPEC, _load_batch(spark, "header_20230125.csv"),
                   table, batch_id="20230125")

    hist = (
        VersionedParquetTable(spark, table)
        .read()
        .filter(F.col("contratto_cod") == "Y02103210")
    )
    rows = sorted(hist.collect(), key=lambda r: r.valid_from)
    # reference asserts: 2 versions, 1 current, old closed on the 25th
    assert len(rows) == 2
    assert [r.is_current for r in rows] == [False, True]
    assert rows[1].status_quote == "Other"          # current value
    assert rows[0].status_quote == "Accepted"
    # closed at the changing event's time: 2023-01-25T15:00+01:00 = 14:00 UTC
    assert str(rows[0].valid_to) == "2023-01-25 14:00:00"
    assert rows[0].valid_to == rows[1].valid_from   # contiguous

    run_scd2_batch(spark, SPEC, _load_batch(spark, "header_20230126.csv"),
                   table, batch_id="20230126")
    rows = sorted(
        VersionedParquetTable(spark, table)
        .read()
        .filter(F.col("contratto_cod") == "Y02103210")
        .collect(),
        key=lambda r: r.valid_from,
    )
    # reference asserts: 3 versions; current from the 26th carries the
    # new codice_ordine_sap; previous closed on the 26th
    assert len(rows) == 3
    assert [r.is_current for r in rows] == [False, False, True]
    assert rows[2].codice_ordine_sap == "3014210222"
    assert str(rows[1].valid_to) == "2023-01-26 13:00:00"  # 14:00+01:00
    assert rows[1].valid_to == rows[2].valid_from
    # engine invariants hold on the full table too
    from delta_lake_pyspark_scd2_spark.operators import scd2

    full = VersionedParquetTable(spark, table).read()
    assert scd2.check_invariants(full, "contratto_cod").count() == 0


REF_ITEMS = "/root/reference/crm/items"

ITEMS_SPEC = SCD2Spec(
    key_cols=("contratto_cod", "numero_annuncio"),
    event_ts_col="batch_ts",
    # the reference's items change columns (src/items_etl.py:100,118);
    # null-safe here by default (the reference's `<>` was its known bug)
    tracked_cols=("contracted_price", "total_discount", "data_fine_prestazione"),
    dedup_mode="drop_all",
)


def _load_items(spark, name):
    import re

    batch_date = re.search(r"(\d{8})", name).group(1)
    raw = (
        spark.read.option("header", "true")
        .option("sep", "|")
        .csv(os.path.join(REF_ITEMS, name))
    )
    return (
        raw.withColumn(
            "contracted_price", F.col("contracted_price").cast("decimal(18,2)")
        )
        .withColumn("total_discount", F.col("total_discount").cast("decimal(18,2)"))
        .withColumn(
            "data_fine_prestazione",
            F.coalesce(
                F.try_to_timestamp(
                    F.col("data_fine_prestazione"), F.lit("M/d/yyyy")
                ).cast("date"),
            ),
        )
        # date granularity: valid_from is the batch file's date
        # (reference src/items_etl.py:52, regex on input_file_name)
        .withColumn(
            "batch_ts",
            F.to_timestamp(F.lit(batch_date), "yyyyMMdd"),
        )
    )


@pytest.mark.skipif(
    not os.path.isdir(REF_ITEMS), reason="reference fixtures not present"
)
def test_reference_items_golden_history(spark, tmp_path):
    # reference test/items_etl_test.py:84-117: after the 20230123 and
    # 20230125 batches, item (Y06119362, 10) has two versions; the old
    # one closes on the 25th; the current one carries price 500.00
    table = str(tmp_path / "items_scd2")
    run_scd2_batch(spark, ITEMS_SPEC, _load_items(spark, "items_20230123.txt"),
                   table, batch_id="20230123")
    run_scd2_batch(spark, ITEMS_SPEC, _load_items(spark, "items_20230125.txt"),
                   table, batch_id="20230125")
    rows = sorted(
        VersionedParquetTable(spark, table)
        .read()
        .filter(
            (F.col("contratto_cod") == "Y06119362")
            & (F.col("numero_annuncio") == "10")
        )
        .collect(),
        key=lambda r: r.valid_from,
    )
    assert len(rows) == 2
    assert [r.is_current for r in rows] == [False, True]
    assert str(rows[0].valid_to) == "2023-01-25 00:00:00"
    assert str(rows[1].valid_from) == "2023-01-25 00:00:00"
    assert float(rows[1].contracted_price) == 500.00


@pytest.mark.skipif(
    not os.path.isdir(REF_ITEMS), reason="reference fixtures not present"
)
def test_reference_items_full_batch_counts(spark, tmp_path):
    """Items-variant parity across ALL FIVE committed daily batches
    (the reference's ``test_items_queries`` flow,
    ``test/items_etl_test.py:127-187``): per-batch history invariants,
    the variation-count query it asserts after four batches, and the
    header↔items orphan LEFT JOIN shape on the partition columns."""
    table = str(tmp_path / "items_scd2")
    batches = [f"items_2023012{d}.txt" for d in range(1, 6)]
    seen_keys = None

    def _variations(key2: str) -> int:
        return (
            VersionedParquetTable(spark, table)
            .read()
            .filter(
                (F.col("contratto_cod") == "Y06119362")
                & (F.col("numero_annuncio") == key2)
                & ~F.col("is_current")
            )
            .count()
        )

    for name in batches:
        if name == "items_20230125.txt":
            # the reference's checkpoint after batches 21-24
            # (test/items_etl_test.py:150-160): exactly ONE closed
            # variation for (Y06119362, 10)
            assert _variations("10") == 1
        b = _load_items(spark, name)
        bid = name[6:14]
        run_scd2_batch(spark, ITEMS_SPEC, b, table, batch_id=bid)
        keys = b.select("contratto_cod", "numero_annuncio").distinct()
        seen_keys = keys if seen_keys is None else seen_keys.unionByName(keys).distinct()
        t = VersionedParquetTable(spark, table)
        cur = t.read().filter(F.col("is_current"))
        cur_keys = cur.select("contratto_cod", "numero_annuncio")
        # drop_all dedup (the items-variant contract) may drop keys
        # whose batch rows conflict — so current keys are a SUBSET of
        # keys ever seen, never beyond, and at most one open row each
        assert cur_keys.join(seen_keys, on=list(cur_keys.columns), how="left_anti").count() == 0
        assert (
            cur.groupBy("contratto_cod", "numero_annuncio")
            .count()
            .filter(F.col("count") > 1)
            .count()
            == 0
        )
    full = VersionedParquetTable(spark, table).read()
    from delta_lake_pyspark_scd2_spark.operators import scd2

    assert (
        scd2.check_invariants(full, ["contratto_cod", "numero_annuncio"]).count()
        == 0
    )
    # after all 5 batches the 25th's price change adds a second closed
    # version on top of the one the reference asserted at its checkpoint
    assert _variations("10") == 2
    # the change lands with the 2023-01-25 batch, price moves to 500.00
    cur_row = (
        full.filter(
            (F.col("contratto_cod") == "Y06119362")
            & (F.col("numero_annuncio") == "10")
            & F.col("is_current")
        )
        .collect()[0]
    )
    assert str(cur_row.valid_from) == "2023-01-25 00:00:00"
    assert float(cur_row.contracted_price) == 500.00

    # orphan LEFT JOIN shape (test/items_etl_test.py:175-187): headers
    # whose (contract, valid_from day) has no items row that day
    header_table = str(tmp_path / "header_scd2")
    header_spec = SCD2Spec(
        key_cols=("contratto_cod",),
        event_ts_col="batch_ts",
        tracked_cols=("status_quote", "codice_agente", "codice_ordine_sap"),
        dedup_mode="drop_all",
    )
    for d in range(1, 5):  # the reference runs header batches 21-24
        name = f"header_2023012{d}.txt"
        raw = (
            spark.read.option("header", "true")
            .option("sep", "|")
            .csv(os.path.join("/root/reference/crm/header", name))
            .withColumn(
                "batch_ts", F.to_timestamp(F.lit(name[7:15]), "yyyyMMdd")
            )
        )
        run_scd2_batch(spark, header_spec, raw, header_table, batch_id=name[7:15])
    header = VersionedParquetTable(spark, header_table).read()
    items = full
    orphans = header.join(
        items,
        on=[
            "contratto_cod",
            "valid_from_year",
            "valid_from_month",
            "valid_from_day",
        ],
        how="left_anti",
    )
    # anti-join property: no orphan key/day appears in items
    both = orphans.select(
        "contratto_cod", "valid_from_year", "valid_from_month", "valid_from_day"
    ).join(
        items,
        on=[
            "contratto_cod",
            "valid_from_year",
            "valid_from_month",
            "valid_from_day",
        ],
        how="left_semi",
    )
    assert both.count() == 0
    # and every non-orphan header day DOES have an items row
    matched = header.join(
        items,
        on=[
            "contratto_cod",
            "valid_from_year",
            "valid_from_month",
            "valid_from_day",
        ],
        how="left_semi",
    )
    assert matched.count() + orphans.count() == header.count()


@pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not present"
)
def test_reference_full_batch_counts(spark, tmp_path):
    # batch1 loads every contract as one open version; idempotent re-run
    # of the same file moves nothing (reference TEST 5 semantics)
    table = str(tmp_path / "header_scd2")
    b1 = _load_batch(spark, "header_20230121.csv")
    n_keys = b1.select("contratto_cod").distinct().count()
    m1 = run_scd2_batch(spark, SPEC, b1, table, batch_id="b1")
    # change-only semantics: value-identical consecutive events collapse,
    # so inserted ≤ kept but every key gets at least its first version
    assert n_keys <= m1["n_inserted"] <= m1["n_kept"]
    t = VersionedParquetTable(spark, table)
    assert t.read().filter(F.col("is_current")).count() == n_keys
    m_rerun = run_scd2_batch(spark, SPEC, b1, table, batch_id="b1_again")
    assert m_rerun["n_inserted"] == 0 and m_rerun["n_closed"] == 0
