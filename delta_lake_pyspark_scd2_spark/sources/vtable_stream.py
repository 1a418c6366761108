"""Versioned table as a Structured Streaming SOURCE (Delta's
``spark.readStream.format("delta")`` parity) via Spark 4's Python
DataSource API.

Offsets are table versions: each micro-batch delivers the change rows
(``table_changes``) of the versions committed since the last batch, so
a downstream pipeline can incrementally consume a table other jobs
keep writing — the storage-level CDC feed that powers incremental
materialized views, replication, and audit sinks. Exactly-once comes
from the offset log: on restart the stream resumes from the last
committed version, and replaying a version yields byte-identical
change rows (commits are immutable).

Registration (per session)::

    from delta_lake_pyspark_scd2_spark.sources.vtable_stream import (
        VTableChangesDataSource,
    )
    spark.dataSource.register(VTableChangesDataSource)
    stream = (spark.readStream.format("vtable_changes")
              .option("path", table_path).load())

Scale note: the Python DataSource read path streams rows through
Python workers — right for CDC volumes (bounded by change size, not
table size). Full-snapshot consumers should use the native
``VersionedParquetTable.read()`` parquet scan instead; this source
deliberately carries only deltas.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_META_COLS = ("_change_type", "_commit_version")


def _changes_schema(path: str) -> StructType:
    # computed driver-side at stream start
    from delta_lake_pyspark_scd2_spark.session import get_spark
    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    spark = get_spark("vtable_stream_schema")
    t = VersionedParquetTable(spark, path)
    base = t.read().schema
    out = StructType(base.fields)
    return out.add("_change_type", "string").add("_commit_version", "long")


class _VTableChangesReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.schema_ = schema
        # start offset: deliver history from version 1 (the CREATE
        # commit's rows are inserts of version 0 -> start_version=0
        # replays the initial snapshot as inserts too)
        self.from_start = (
            str(options.get("startingversion", "0")).lower() != "latest"
        )
        kc = options.get("keycols", "")
        #: update pairing keys for table_changes; empty -> all columns
        #: (updates then surface as delete+insert, still exactly-once)
        self.key_cols = [c for c in kc.split(",") if c]

    def _table(self):
        from delta_lake_pyspark_scd2_spark.session import get_spark
        from delta_lake_pyspark_scd2_spark.sources.vtable import (
            VersionedParquetTable,
        )

        return VersionedParquetTable(get_spark("vtable_stream"), self.path)

    def initialOffset(self) -> dict:
        if self.from_start:
            return {"version": -1}
        return {"version": self._table().latest_version()}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        t = self._table()
        latest = t.latest_version()
        lo = start["version"]
        if latest <= lo:
            return iter(()), {"version": lo}
        rows = self._rows_between(t, lo + 1, latest)
        return rows, {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # replay for recovery: same immutable commits, same rows
        if end["version"] <= start["version"]:
            return iter(())
        return self._rows_between(
            self._table(), start["version"] + 1, end["version"]
        )

    def _rows_between(self, t, lo: int, hi: int) -> Iterator[Tuple]:
        names = [
            f for f in self.schema_.fieldNames() if f not in _META_COLS
        ]
        out = []
        for v in range(lo, hi + 1):
            if v == 0:
                df = t.read(0)
                for r in df.collect():
                    out.append(
                        tuple(r[n] for n in names) + ("insert", 0)
                    )
                continue
            ch = t.table_changes(self.key_cols or names, v - 1, v)
            for r in ch.collect():
                out.append(
                    tuple(r[n] for n in names)
                    + (r["_change_type"], r["_commit_version"])
                )
        return iter(out)


class VTableChangesDataSource(DataSource):
    """``format("vtable_changes")`` — streaming CDC over a
    VersionedParquetTable."""

    @classmethod
    def name(cls) -> str:
        return "vtable_changes"

    def schema(self) -> StructType:
        return _changes_schema(self.options["path"])

    def simpleStreamReader(self, schema: StructType):
        return _VTableChangesReader(schema, self.options)


def replicate_stream(
    spark,
    src_path: str,
    dst_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
):
    """Continuously replicate a versioned table via its CDC stream —
    the cross-region-replica / disaster-recovery consumer.

    Each micro-batch applies its change rows to the replica in commit
    order: inserts/update-postimages MERGE in, deletes drop their
    keys. Exactly-once end to end: the stream checkpoint dedups
    deliveries and the replica's MERGE is idempotent per key, so a
    replayed batch converges instead of double-applying. The replica
    is a normal table (readable, time-travelable) whose history is the
    APPLIED sequence — version numbers differ from the source, row
    content converges.
    """
    from pyspark.sql import functions as F

    from delta_lake_pyspark_scd2_spark.sources.vtable import (
        VersionedParquetTable,
    )

    def _apply(batch, _n: int) -> None:
        if batch.isEmpty():
            return
        meta = list(_META_COLS)
        versions = sorted(
            r["_commit_version"]
            for r in batch.select("_commit_version").distinct().collect()
        )
        for v in versions:
            b = batch.filter(F.col("_commit_version") == v)
            ups = b.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            ).drop(*meta)
            dels = (
                b.filter(F.col("_change_type") == "delete")
                .drop(*meta)
                .select(*key_cols)
            )
            if not VersionedParquetTable.is_table(dst_path):
                VersionedParquetTable.create(spark, ups, dst_path)
                continue
            t = VersionedParquetTable(spark, dst_path)
            t.upsert(
                ups,
                key_cols,
                deletes=dels if dels.limit(1).count() else None,
                operation="REPLICATE",
            )

    q = (
        spark.readStream.format("vtable_changes")
        .option("path", src_path)
        .option("keycols", ",".join(key_cols))
        .load()
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
