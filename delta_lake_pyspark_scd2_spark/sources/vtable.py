"""Versioned Parquet table — the storage layer under the SCD2 pipeline.

The reference relies on Delta Lake for: table-exists checks, partitioned
initial writes, MERGE upserts, ``mergeSchema`` appends, time travel and
history (SURVEY.md §2.1 S3-S10). delta-spark is not available in this
environment, so this module supplies the same *capabilities* natively:

  * data files are plain Parquet under ``<path>/data/<k=v>/...`` —
    written once, never mutated (the same contract object stores give);
  * every commit writes a JSON **manifest** ``_manifest/v{N}.json``
    listing the complete live file set (like a Delta checkpoint),
    the table schema, partition columns and operation metrics;
  * readers pin a manifest version → snapshot isolation + time travel;
  * partition-scoped copy-on-write: an update rewrites only the files
    of touched partitions and commits a manifest that swaps them —
    untouched partitions are carried by reference. At 100 TB a merge
    touching one day of data costs one day of data, not the table.

Concurrency: single-writer (manifest commit is an atomic rename;
optimistic writers would retry on version collision — documented,
not needed for batch ETL).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"


@dataclass(frozen=True)
class ManifestEntry:
    """One live data file: path relative to ``data/`` + its partition
    values (empty dict for unpartitioned tables)."""

    path: str
    partition: dict[str, str]


class VersionedParquetTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- existence / versions ------------------------------------------------

    @classmethod
    def is_table(cls, path: str) -> bool:
        """Reference: ``DeltaTable.isDeltaTable`` (src/header_etl.py:157)."""
        d = os.path.join(path, MANIFEST_DIR)
        return os.path.isdir(d) and any(f.endswith(".json") for f in os.listdir(d))

    def versions(self) -> list[int]:
        d = os.path.join(self.path, MANIFEST_DIR)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
        )

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no manifest under {self.path}")
        return vs[-1]

    def history(self) -> list[dict]:
        """Commit log, newest first (reference S6: ``DeltaTable.history``)."""
        out = []
        for v in reversed(self.versions()):
            m = self._load_manifest(v)
            out.append(
                {
                    "version": v,
                    "timestamp": m["timestamp"],
                    "operation": m["operation"],
                    "num_files": len(m["files"]),
                    "metrics": m.get("metrics", {}),
                }
            )
        return out

    # -- manifest I/O --------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, MANIFEST_DIR, f"v{version:010d}.json")

    def _load_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _commit(
        self,
        version: int,
        files: list[ManifestEntry],
        schema: T.StructType,
        partition_cols: list[str],
        operation: str,
        metrics: "dict | Callable[[], dict] | None" = None,
    ) -> None:
        os.makedirs(os.path.join(self.path, MANIFEST_DIR), exist_ok=True)
        manifest = {
            "version": version,
            "timestamp": time.time(),
            "operation": operation,
            "schema": schema.json(),
            "partition_cols": partition_cols,
            "files": [{"path": e.path, "partition": e.partition} for e in files],
            "metrics": (metrics() if callable(metrics) else metrics) or {},
        }
        tmp = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        target = self._manifest_path(version)
        if os.path.exists(target):  # optimistic-concurrency guard
            os.remove(tmp)
            raise RuntimeError(f"version {version} already committed (concurrent writer?)")
        os.rename(tmp, target)

    # -- data-file staging ---------------------------------------------------

    def _write_files(
        self, df: DataFrame, partition_cols: list[str]
    ) -> list[ManifestEntry]:
        """Write df once via Spark (partitioned layout), then move the
        produced parquet files into ``data/`` under their partition
        dirs. Filenames carry Spark's task UUIDs → never collide with
        live files; a failed write leaves only unreferenced garbage
        (never a corrupt table) exactly like Delta."""
        staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(staging)
        entries: list[ManifestEntry] = []
        data_root = os.path.join(self.path, DATA_DIR)
        for root, _dirs, fnames in os.walk(staging):
            for fname in fnames:
                if not fname.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(root, staging)
                rel_dir = "" if rel_dir == "." else rel_dir
                partition: dict[str, str] = {}
                for comp in rel_dir.split(os.sep):
                    if "=" in comp:
                        k, v = comp.split("=", 1)
                        partition[k] = v
                dest_dir = os.path.join(data_root, rel_dir)
                os.makedirs(dest_dir, exist_ok=True)
                os.rename(
                    os.path.join(root, fname), os.path.join(dest_dir, fname)
                )
                entries.append(
                    ManifestEntry(os.path.join(rel_dir, fname), partition)
                )
        shutil.rmtree(staging)
        return entries

    # -- public write API ----------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        df: DataFrame,
        path: str,
        *,
        partition_cols: list[str] | None = None,
        metrics: "dict | Callable[[], dict] | None" = None,
    ) -> "VersionedParquetTable":
        """Initial partitioned write (reference S7,
        ``src/header_etl.py:159-162``)."""
        t = cls(spark, path)
        if cls.is_table(path):
            raise FileExistsError(path)
        pc = partition_cols or []
        files = t._write_files(df, pc)
        t._commit(0, files, df.schema, pc, "CREATE", metrics)
        return t

    def _current(self) -> dict:
        return self._load_manifest(self.latest_version())

    def append(self, df: DataFrame, *, merge_schema: bool = False,
               metrics: "dict | Callable[[], dict] | None" = None) -> int:
        """Append-only commit (reference S9 ``mergeSchema`` append,
        ``schema_evolution_step1.py:144``): adds files, never rewrites.
        With ``merge_schema`` the committed schema is the union; old
        files simply lack the new columns (read as NULL)."""
        m = self._current()
        pc = list(m["partition_cols"])
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if merge_schema:
            new_fields = {f.name for f in schema.fields}
            for f in df.schema.fields:
                if f.name not in new_fields:
                    schema = schema.add(f.name, f.dataType, True)
        df = _align(df, schema)
        files = [ManifestEntry(f["path"], f["partition"]) for f in m["files"]]
        files += self._write_files(df, pc)
        v = m["version"] + 1
        self._commit(v, files, schema, pc, "APPEND", metrics)
        return v

    def overwrite(self, df: DataFrame, *, metrics: "dict | Callable[[], dict] | None" = None) -> int:
        m = self._current()
        pc = list(m["partition_cols"])
        files = self._write_files(df, pc)
        v = m["version"] + 1
        self._commit(v, files, df.schema, pc, "OVERWRITE", metrics)
        return v

    def replace_partitions(
        self,
        df: DataFrame,
        partitions: list[dict[str, str]],
        *,
        operation: str = "REPLACE_PARTITIONS",
        merge_schema: bool = False,
        metrics: "dict | Callable[[], dict] | None" = None,
    ) -> int:
        """Partition-scoped copy-on-write: swap the files of exactly
        ``partitions`` for ``df``'s files; every other partition is
        carried by reference. This is the engine's MERGE rewrite
        primitive — cost proportional to touched data, not table size.
        ``merge_schema`` widens the committed schema with ``df``'s new
        nullable columns (untouched partitions read them as NULL).
        """
        m = self._current()
        pc = list(m["partition_cols"])
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if merge_schema:
            have = {f.name for f in schema.fields}
            for f in df.schema.fields:
                if f.name not in have:
                    schema = schema.add(f.name, f.dataType, True)
        touched = {tuple(sorted(p.items())) for p in partitions}
        kept = [
            ManifestEntry(f["path"], f["partition"])
            for f in m["files"]
            if tuple(sorted(f["partition"].items())) not in touched
        ]
        new_files = self._write_files(_align(df, schema), pc)
        stray = [
            e for e in new_files if tuple(sorted(e.partition.items())) not in touched
        ]
        if stray:
            raise ValueError(
                f"replacement data writes outside the declared partitions: {stray[:3]}"
            )
        v = m["version"] + 1
        self._commit(v, kept + new_files, schema, pc, operation, metrics)
        return v

    def upsert(
        self,
        updates: DataFrame,
        key_cols: "Sequence[str]",
        *,
        operation: str = "UPSERT",
        metrics: "dict | Callable[[], dict] | None" = None,
    ) -> dict:
        """Generic MERGE (reference S8's ``whenMatchedUpdate`` +
        ``whenNotMatchedInsert``, src/header_etl.py:205-215 shape, made
        table-generic): rows of ``updates`` replace same-key rows and
        insert otherwise. ``updates`` must be unique per key (classic
        MERGE multiple-source-rows-match error, left to the caller).

        Partition-scoped: only partitions holding a matched key's old
        row or receiving a new row are rewritten — including the move
        case where an update changes its own partition values. Cost ∝
        touched partitions, never table size.
        """
        keys = list(key_cols)
        m = self._current()
        pc = list(m["partition_cols"])
        cur = self.read()
        upd_keys = updates.select(*keys).distinct()
        n_matched = cur.join(upd_keys, on=keys, how="left_semi").count()
        n_updates = updates.count()
        if pc:
            old_parts = (
                cur.join(upd_keys, on=keys, how="left_semi").select(*pc).distinct()
            )
            parts = old_parts.unionByName(updates.select(*pc).distinct()).distinct()
            touched = [{k: str(r[k]) for k in pc} for r in parts.collect()]
            base = self.read_partitions(touched)
        else:
            touched = [{}]
            base = cur
        survivors = base.join(upd_keys, on=keys, how="left_anti")
        merged = survivors.unionByName(updates.select(*base.columns))
        out = {"n_updated": n_matched, "n_inserted": n_updates - n_matched}
        self.replace_partitions(
            merged, touched, operation=operation, metrics=metrics or out
        )
        return out

    def compact(self, *, max_files_per_partition: int = 1) -> int:
        """Small-file compaction (Delta ``OPTIMIZE`` analogue — the
        reference flags small files as the partitioning hazard,
        ``partitioning_strategies.md:27``): rewrite every partition
        holding more than ``max_files_per_partition`` files into
        coalesced files, committing one COMPACT snapshot. Readers of
        older versions still see the old files (never deleted here —
        a VACUUM-style retention sweep would remove unreferenced ones).
        At 100 TB this runs per-partition-subset, not whole-table.
        """
        m = self._current()
        per_part: dict[tuple, int] = {}
        for f in m["files"]:
            k = tuple(sorted(f["partition"].items()))
            per_part[k] = per_part.get(k, 0) + 1
        crowded = [
            dict(k) for k, n in per_part.items() if n > max_files_per_partition
        ]
        if not crowded:
            return m["version"]
        pc = list(m["partition_cols"])
        df = self.read_partitions(crowded)
        if pc:
            df = df.repartition(*[F.col(c) for c in pc])
        else:
            df = df.coalesce(1)
        return self.replace_partitions(
            df, crowded, operation="COMPACT",
            metrics={"n_partitions": len(crowded)},
        )

    def vacuum(self, *, keep_versions: int = 1) -> dict:
        """Retention sweep (Delta ``VACUUM`` analogue): delete data
        files referenced ONLY by manifests older than the newest
        ``keep_versions``, then drop those manifests. Time travel is
        retained for the kept versions; older versions become
        unreadable — the same trade Delta makes. Never touches files
        the live manifests still reference, so concurrent readers of
        kept versions are safe.
        """
        keep_versions = max(1, keep_versions)
        vs = self.versions()
        kept_vs, dropped_vs = vs[-keep_versions:], vs[:-keep_versions]
        live = {
            f["path"]
            for v in kept_vs
            for f in self._load_manifest(v)["files"]
        }
        data_root = os.path.join(self.path, DATA_DIR)
        n_deleted = 0
        for v in dropped_vs:
            for f in self._load_manifest(v)["files"]:
                if f["path"] not in live:
                    p = os.path.join(data_root, f["path"])
                    if os.path.exists(p):
                        os.remove(p)
                        n_deleted += 1
        for v in dropped_vs:
            os.remove(self._manifest_path(v))
        # prune emptied partition dirs so listings stay honest
        for root, dirs, files in os.walk(data_root, topdown=False):
            if root != data_root and not dirs and not files:
                os.rmdir(root)
        return {
            "n_files_deleted": n_deleted,
            "n_versions_dropped": len(dropped_vs),
            "oldest_kept_version": kept_vs[0],
        }

    # -- read API ------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read (S3) / time travel (S4, ``versionAsOf``)."""
        m = self._load_manifest(
            self.latest_version() if version is None else version
        )
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        data_root = os.path.join(self.path, DATA_DIR)
        paths = [os.path.join(data_root, f["path"]) for f in m["files"]]
        if not paths:
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read.option("basePath", data_root).schema(schema)
        return reader.parquet(*paths)

    def read_partitions(
        self, partitions: list[dict[str, str]], version: int | None = None
    ) -> DataFrame:
        """Manifest-level partition pruning: only the named partitions'
        files are even listed — the scan never sees the rest."""
        m = self._load_manifest(
            self.latest_version() if version is None else version
        )
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        wanted = {tuple(sorted(p.items())) for p in partitions}
        data_root = os.path.join(self.path, DATA_DIR)
        paths = [
            os.path.join(data_root, f["path"])
            for f in m["files"]
            if tuple(sorted(f["partition"].items())) in wanted
        ]
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.option("basePath", data_root).schema(schema).parquet(*paths)

    def partitions_of(self, version: int | None = None) -> list[dict[str, str]]:
        m = self._load_manifest(
            self.latest_version() if version is None else version
        )
        seen: dict[tuple, dict[str, str]] = {}
        for f in m["files"]:
            seen[tuple(sorted(f["partition"].items()))] = f["partition"]
        return list(seen.values())


def _align(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project df onto the table schema: missing columns become NULL,
    order normalized (positional parquet safety)."""
    cols = []
    names = set(df.columns)
    for f in schema.fields:
        if f.name in names:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
