"""Write-side Delta Lake interop — no delta-spark required.

The reader (``sources/delta_reader.py``) lets a user bring their
existing Delta tables IN; this module lets them take results OUT as a
real Delta table any Delta reader (delta-spark, Trino, DuckDB's delta
extension, our own reader) can consume. Same public protocol
(github.com/delta-io/delta PROTOCOL.md), writer side: per-commit
newline-delimited JSON with ``commitInfo`` / ``protocol`` /
``metaData`` / ``add`` / ``remove`` actions; data files are plain
partitioned parquet in the table root.

Conservative writer: protocol (1, 2), no advanced writer features —
the widest-compatibility subset (every Delta reader since 2019 reads
protocol (1, 2) tables). Partition values are string-encoded per the
protocol (readers re-type them from ``schemaString``); per-file
``stats`` carry ``numRecords`` so downstream readers can answer
metadata-only counts.

Scale: the commit is O(files touched) driver-side JSON — identical to
the vtable manifest trade; the data write is a normal distributed
partitioned-parquet job. Commits are atomically published with the
same ``os.link`` rename-free pattern the vtable uses, so two writers
cannot silently clobber a version (the loser gets a clean collision
error; Delta proper gets this from the storage layer's
put-if-absent).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession

from delta_lake_pyspark_scd2_spark.sources.delta_reader import (
    LOG_DIR,
    DeltaTableReader,
)

_PROTOCOL = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _commit_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, LOG_DIR, f"{version:020d}.json")


def _write_commit(table_path: str, version: int, actions: list[dict]) -> None:
    os.makedirs(os.path.join(table_path, LOG_DIR), exist_ok=True)
    target = _commit_path(table_path, version)
    fd, tmp = tempfile.mkstemp(dir=os.path.join(table_path, LOG_DIR), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    try:
        os.link(tmp, target)  # atomic put-if-absent: EEXIST on collision
    except FileExistsError:
        raise RuntimeError(
            f"delta commit collision at version {version} of {table_path}"
        ) from None
    finally:
        os.unlink(tmp)


def _stage_files(
    df: DataFrame, table_path: str, partition_cols: list[str]
) -> list[dict]:
    """Write ``df``'s parquet files into the table root (partition
    subdirs per the Delta layout) and return their add-action facts."""
    import pyarrow.parquet as pq

    stage = tempfile.mkdtemp(prefix="_delta_stage_", dir=table_path)
    try:
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        w.parquet(os.path.join(stage, "out"))
        adds: list[dict] = []
        root = os.path.join(stage, "out")
        for dirpath, _dirs, files in os.walk(root):
            for name in files:
                if not name.endswith(".parquet"):
                    continue
                src = os.path.join(dirpath, name)
                rel_dir = os.path.relpath(dirpath, root)
                # partitionValues from the hive-style path (Spark
                # URL-encodes special chars; __HIVE_DEFAULT_PARTITION__
                # encodes NULL per the shared convention)
                pvals: dict[str, str | None] = {}
                if rel_dir != ".":
                    for part in rel_dir.split(os.sep):
                        k, _, v = part.partition("=")
                        # Spark Hive-escapes special chars in dir names
                        # with %xx — partitionValues carry the LOGICAL
                        # value, so unescape here
                        pvals[k] = (
                            None
                            if v == "__HIVE_DEFAULT_PARTITION__"
                            else unquote(v)
                        )
                dest_dir = (
                    os.path.join(table_path, rel_dir)
                    if rel_dir != "."
                    else table_path
                )
                os.makedirs(dest_dir, exist_ok=True)
                fname = f"part-{uuid.uuid4().hex}.snappy.parquet"
                dest = os.path.join(dest_dir, fname)
                os.link(src, dest)
                rel_path = (
                    "/".join([*rel_dir.split(os.sep), fname])
                    if rel_dir != "."
                    else fname
                )
                adds.append(
                    {
                        "add": {
                            "path": quote(rel_path, safe="/=-"),
                            "partitionValues": pvals,
                            "size": os.path.getsize(dest),
                            "modificationTime": int(
                                os.path.getmtime(dest) * 1000
                            ),
                            "dataChange": True,
                            "stats": json.dumps(
                                {
                                    "numRecords": pq.ParquetFile(
                                        dest
                                    ).metadata.num_rows
                                }
                            ),
                        }
                    }
                )
        return adds
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _metadata_action(
    df: DataFrame, partition_cols: list[str], table_id: str
) -> dict:
    return {
        "metaData": {
            "id": table_id,
            "format": {"provider": "parquet", "options": {}},
            # Delta schemaString IS Spark's StructType JSON
            "schemaString": df.schema.json(),
            "partitionColumns": list(partition_cols),
            "configuration": {},
            "createdTime": 0,
        }
    }


def _commit_info(op: str) -> dict:
    return {
        "commitInfo": {
            "operation": op,
            "engineInfo": "delta_lake_pyspark_scd2_spark delta_writer",
        }
    }


def write_delta(
    frame: DataFrame,
    path: str,
    *,
    partition_cols: list[str] | None = None,
    mode: str = "create",
) -> int:
    """Write ``frame`` to ``path`` as a Delta table; returns the
    committed version.

    ``mode``: ``create`` (fail if the table exists), ``append`` (new
    commit adding files), ``overwrite`` (new commit removing every
    live file and adding the new ones — time travel to older versions
    still works).
    """
    pc = list(partition_cols or [])
    os.makedirs(path, exist_ok=True)
    exists = DeltaTableReader.is_delta_table(path)
    if mode == "create":
        if exists:
            raise FileExistsError(f"delta table already exists at {path}")
        adds = _stage_files(frame, path, pc)
        _write_commit(
            path,
            0,
            [
                _commit_info("WRITE"),
                _PROTOCOL,
                _metadata_action(frame, pc, str(uuid.uuid4())),
                *adds,
            ],
        )
        return 0
    if not exists:
        raise FileNotFoundError(f"no delta table at {path}")
    reader = DeltaTableReader(frame.sparkSession, path)
    snap = reader.snapshot()
    if [f.name for f in snap.schema.fields] != frame.columns:
        raise ValueError(
            f"schema mismatch: table has {[f.name for f in snap.schema.fields]}, "
            f"df has {frame.columns}"
        )
    version = snap.version + 1
    if mode == "append":
        adds = _stage_files(frame, path, pc or snap.partition_columns)
        _write_commit(path, version, [_commit_info("WRITE"), *adds])
        return version
    if mode == "overwrite":
        removes = [
            {"remove": {"path": p, "dataChange": True}} for p in snap.files
        ]
        adds = _stage_files(frame, path, pc or snap.partition_columns)
        _write_commit(
            path, version, [_commit_info("OVERWRITE"), *removes, *adds]
        )
        return version
    raise ValueError(f"unknown mode {mode!r}")


def export_vtable_as_delta(table, dest: str) -> int:
    """Export a ``VersionedParquetTable``'s CURRENT snapshot as a new
    Delta table (deletion vectors are materialized by the read, so the
    export is exact)."""
    df = table.read()
    return write_delta(
        df, dest, partition_cols=table.partition_columns(), mode="create"
    )


def write_checkpoint(path: str) -> int:
    """Write a Delta parquet checkpoint of the latest version (+
    ``_last_checkpoint`` pointer); returns the checkpointed version.

    The checkpoint carries the RAW latest ``protocol`` / ``metaData``
    actions and the latest ``add`` action of every live file, verbatim
    from the log (sizes/stats preserved — spec-faithful, not a lossy
    re-derivation), one action per row with null other columns, as
    readers expect. After a checkpoint, older JSON commits are
    replay-redundant and can be dropped with :func:`clean_log`.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    log = os.path.join(path, LOG_DIR)
    versions = sorted(
        int(f[:20])
        for f in os.listdir(log)
        if f.endswith(".json") and f[:20].isdigit()
    )
    if not versions:
        raise FileNotFoundError(f"no delta log at {path}")
    latest = versions[-1]
    protocol = metadata = None
    live: dict[str, dict] = {}
    # replay from an existing checkpoint if the early commits are gone
    cps = sorted(
        int(f[:20])
        for f in os.listdir(log)
        if f.endswith(".checkpoint.parquet") and f[:20].isdigit()
    )
    start = 0
    if cps and (versions[0] > 0 or cps[-1] >= versions[0]):
        cp_rows = pq.read_table(
            os.path.join(log, f"{cps[-1]:020d}.checkpoint.parquet")
        ).to_pylist()
        for row in cp_rows:
            a = {k: v for k, v in row.items() if v is not None}
            if "protocol" in a:
                protocol = a["protocol"]
            elif "metaData" in a:
                metadata = a["metaData"]
            elif "add" in a:
                add = dict(a["add"])
                if not isinstance(add.get("partitionValues"), dict):
                    add["partitionValues"] = dict(add.get("partitionValues") or {})
                live[add["path"]] = add
        start = cps[-1] + 1
    for v in range(start, latest + 1):
        with open(_commit_path(path, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                a = json.loads(line)
                if "protocol" in a:
                    protocol = a["protocol"]
                elif "metaData" in a:
                    metadata = a["metaData"]
                elif "add" in a:
                    live[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    live.pop(a["remove"]["path"], None)
    if protocol is None or metadata is None:
        raise ValueError(f"log at {path} has no protocol/metaData action")
    def _scrub(obj):
        # empty dicts infer as zero-field structs, which parquet cannot
        # write; readers treat absent and empty alike, so drop them
        if isinstance(obj, dict):
            return {
                k: _scrub(v)
                for k, v in obj.items()
                if not (isinstance(v, dict) and not v)
            }
        return obj

    protocol, metadata = _scrub(protocol), _scrub(metadata)
    live = {p: _scrub(a) for p, a in live.items()}
    # one action per row, ALL columns present (pyarrow infers the
    # unified schema across rows only when every row carries every key)
    rows = (
        [
            {"protocol": protocol, "metaData": None, "add": None},
            {"protocol": None, "metaData": metadata, "add": None},
        ]
        + [
            {"protocol": None, "metaData": None, "add": add}
            for add in live.values()
        ]
    )
    tbl = pa.Table.from_pylist(rows)
    pq.write_table(tbl, os.path.join(log, f"{latest:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": latest, "size": len(rows)}, f)
    return latest


def clean_log(path: str, *, keep_from: int | None = None) -> int:
    """Delete JSON commits made redundant by the newest checkpoint
    (Delta's metadata log cleanup); returns how many were removed.
    Commits AT or AFTER the checkpoint (or ``keep_from``) are kept —
    time travel to older versions becomes unavailable, exactly as in
    Delta after ``delta.logRetentionDuration`` expiry."""
    log = os.path.join(path, LOG_DIR)
    cps = [
        int(f[:20])
        for f in os.listdir(log)
        if f.endswith(".checkpoint.parquet") and f[:20].isdigit()
    ]
    if not cps:
        return 0
    cutoff = max(cps) if keep_from is None else keep_from
    n = 0
    for f in sorted(os.listdir(log)):
        if f.endswith(".json") and f[:20].isdigit() and int(f[:20]) < cutoff:
            os.unlink(os.path.join(log, f))
            n += 1
    return n
