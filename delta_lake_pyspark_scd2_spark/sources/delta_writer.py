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

All filesystem access goes through the Hadoop FileSystem shim
(``sources/fsio.py``): staging, listing, the commit publish — so the
writer targets ``file:``/HDFS/``s3a://``/``abfss://`` paths alike.
Commits are atomically published with ``fsio.put_if_absent``: the
``os.link`` pattern on local filesystems, namenode-arbitrated
``create(overwrite=false)`` on HDFS, and on object stores the
documented conditional-PUT story (see ``fsio.py`` module docstring) —
the same storage-layer contract Delta proper requires.

Scale: the commit is O(files touched) driver-side JSON — identical to
the vtable manifest trade; the data write is a normal distributed
partitioned-parquet job.
"""

from __future__ import annotations

import io
import json
import os
import tempfile
import uuid
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame

from delta_lake_pyspark_scd2_spark.sources import fsio
from delta_lake_pyspark_scd2_spark.sources.delta_reader import (
    LOG_DIR,
    DeltaTableReader,
)

_PROTOCOL = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _commit_path(table_path: str, version: int) -> str:
    return fsio.join(table_path, LOG_DIR, f"{version:020d}.json")


def _write_commit(
    fs, table_path: str, version: int, actions: list[dict]
) -> None:
    fs.mkdirs(fsio.join(table_path, LOG_DIR))
    payload = "".join(json.dumps(a) + "\n" for a in actions).encode("utf-8")
    try:
        fs.put_if_absent(_commit_path(table_path, version), payload)
    except FileExistsError:
        raise RuntimeError(
            f"delta commit collision at version {version} of {table_path}"
        ) from None


def _num_records(fs, path: str) -> int:
    """numRecords from the parquet footer. Local files use pyarrow's
    footer-only read; remote files are fetched through the shim (one
    extra read of a file this writer just produced — acceptable for a
    commit-time stat; a connector-native footer range-read is the
    optimization if it ever shows up in a profile)."""
    import pyarrow.parquet as pq

    lp = fsio.local_path(path)
    if lp is not None:
        return pq.ParquetFile(lp).metadata.num_rows
    return pq.ParquetFile(io.BytesIO(fs.read_bytes(path))).metadata.num_rows


def _stage_files(
    df: DataFrame, table_path: str, partition_cols: list[str], fs
) -> list[dict]:
    """Write ``df``'s parquet files into the table root (partition
    subdirs per the Delta layout) and return their add-action facts."""
    stage = fsio.join(table_path, f"_delta_stage_{uuid.uuid4().hex}")
    try:
        w = df.write.mode("overwrite")
        if partition_cols:
            w = w.partitionBy(*partition_cols)
        root = fsio.join(stage, "out")
        w.parquet(root)
        adds: list[dict] = []
        for rel in fs.walk_files(root):
            name = rel.rsplit("/", 1)[-1]
            if not name.endswith(".parquet"):
                continue
            rel_dir = rel.rsplit("/", 1)[0] if "/" in rel else ""
            # partitionValues from the hive-style path (Spark
            # URL-encodes special chars; __HIVE_DEFAULT_PARTITION__
            # encodes NULL per the shared convention)
            pvals: dict[str, str | None] = {}
            for part in rel_dir.split("/") if rel_dir else []:
                k, _, v = part.partition("=")
                # Spark Hive-escapes special chars in dir names with
                # %xx — partitionValues carry the LOGICAL value, so
                # unescape here
                pvals[k] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
                )
            dest_dir = (
                fsio.join(table_path, rel_dir) if rel_dir else table_path
            )
            fs.mkdirs(dest_dir)
            fname = f"part-{uuid.uuid4().hex}.snappy.parquet"
            dest = fsio.join(dest_dir, fname)
            fs.rename(fsio.join(root, rel), dest)
            rel_path = f"{rel_dir}/{fname}" if rel_dir else fname
            adds.append(
                {
                    "add": {
                        "path": quote(rel_path, safe="/=-"),
                        "partitionValues": pvals,
                        "size": fs.size(dest),
                        "modificationTime": fs.mtime_ms(dest),
                        "dataChange": True,
                        "stats": json.dumps(
                            {"numRecords": _num_records(fs, dest)}
                        ),
                    }
                }
            )
        return adds
    finally:
        fs.delete(stage, recursive=True)


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
    fs = fsio.get_fs(path, frame.sparkSession)
    fs.mkdirs(path)
    exists = DeltaTableReader.is_delta_table(path)
    if mode == "create":
        if exists:
            raise FileExistsError(f"delta table already exists at {path}")
        adds = _stage_files(frame, path, pc, fs)
        _write_commit(
            fs,
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
        adds = _stage_files(frame, path, pc or snap.partition_columns, fs)
        _write_commit(fs, path, version, [_commit_info("WRITE"), *adds])
        return version
    if mode == "overwrite":
        removes = [
            {"remove": {"path": p, "dataChange": True}} for p in snap.files
        ]
        adds = _stage_files(frame, path, pc or snap.partition_columns, fs)
        _write_commit(
            fs, path, version, [_commit_info("OVERWRITE"), *removes, *adds]
        )
        return version
    raise ValueError(f"unknown mode {mode!r}")


def export_vtable_as_delta(table, dest: str, *, preserve_dvs: bool = False) -> int:
    """Export a ``VersionedParquetTable``'s CURRENT snapshot as a new
    Delta table.

    Default mode re-writes through a read (deletion vectors are
    materialized by the scan, so the export is exact and stays on the
    widest-compatibility protocol (1,2)).

    ``preserve_dvs=True`` is the **zero-rewrite** path: data files are
    byte-copied as-is under their existing relative layout (vtable uses
    hive-style partition dirs, which IS Delta's layout), and each
    vtable DV reference is re-serialized as a native Delta deletion
    vector (z85-uuid ``storageType "u"`` RoaringBitmapArray sidecar,
    ``delta_dv.write_dv_file``). The commit declares protocol (3,7)
    with the ``deletionVectors`` reader/writer feature exactly when a
    DV exists — otherwise it stays (1,2). O(data bytes copied +
    deleted rows); no Spark job at all.
    """
    if not preserve_dvs:
        df = table.read()
        return write_delta(
            df, dest, partition_cols=table.partition_columns(), mode="create"
        )

    import tempfile as _tf

    from delta_lake_pyspark_scd2_spark.sources import delta_dv
    from delta_lake_pyspark_scd2_spark.sources.vtable import DATA_DIR, DV_DIR

    m = table._current()
    if m.get("column_mapping"):
        raise ValueError(
            "preserve_dvs export cannot carry a column-mapped table "
            "(physical file schemas differ from the logical schema); "
            "use the default materializing export"
        )
    fs = fsio.get_fs(dest, table.spark)
    if fs.exists(fsio.join(dest, LOG_DIR)):
        raise FileExistsError(f"Delta table already exists at {dest}")
    src_fs = fsio.get_fs(table.path, table.spark)

    # dead positions per file, read once from the parquet sidecars
    dv_positions: dict[str, list[int]] = {}
    dv_paths = sorted(
        {p for f in m["files"] for p in ((f.get("dv") or {}).get("paths", []))}
    )
    if dv_paths:
        from pyspark.sql import functions as F

        dead = table.spark.read.parquet(
            *[os.path.join(table.path, DV_DIR, p) for p in dv_paths]
        )
        for r in (
            dead.groupBy("__file")
            .agg(F.collect_set("__pos").alias("ps"))
            .collect()
        ):
            dv_positions[r["__file"]] = sorted(int(p) for p in r["ps"])

    def _copy(src: str, dst: str) -> None:
        lp = fsio.local_path(src)
        if lp is not None:
            fs.put_file(lp, dst)
            return
        with _tf.NamedTemporaryFile(delete=False) as tmp:
            tmp.write(src_fs.read_bytes(src))
            name = tmp.name
        try:
            fs.put_file(name, dst)
        finally:
            os.unlink(name)

    adds: list[dict] = []
    has_dv = False
    for f in m["files"]:
        rel = f["path"]
        src = fsio.join(table.path, DATA_DIR, rel)
        dst = fsio.join(dest, rel)
        if "/" in rel:
            fs.mkdirs(fsio.join(dest, rel.rsplit("/", 1)[0]))
        else:
            fs.mkdirs(dest)
        _copy(src, dst)
        add = {
            "path": quote(rel, safe="/=-"),
            "partitionValues": dict(f.get("partition") or {}),
            "size": fs.size(dst),
            "modificationTime": fs.mtime_ms(dst),
            "dataChange": True,
            "stats": json.dumps({"numRecords": int(f.get("rows") or 0)}),
        }
        positions = dv_positions.get(rel) if f.get("dv") else None
        if positions:
            has_dv = True
            u = uuid.uuid4()
            with _tf.NamedTemporaryFile(delete=False) as tmp:
                name = tmp.name
            desc = delta_dv.write_dv_file(positions, name)
            try:
                fs.put_file(name, fsio.join(dest, f"deletion_vector_{u}.bin"))
            finally:
                os.unlink(name)
            add["deletionVector"] = {
                "storageType": "u",
                "pathOrInlineDv": delta_dv.z85_encode(u.bytes),
                "offset": desc["offset"],
                "sizeInBytes": desc["sizeInBytes"],
                "cardinality": desc["cardinality"],
            }
        adds.append({"add": add})

    schema_json = m["schema"]
    protocol = (
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        }
        if has_dv
        else _PROTOCOL
    )
    actions = [
        _commit_info("EXPORT_VTABLE"),
        protocol,
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": list(m["partition_cols"]),
                "configuration": (
                    {"delta.enableDeletionVectors": "true"} if has_dv else {}
                ),
                "createdTime": 0,
            }
        },
        *adds,
    ]
    _write_commit(fs, dest, 0, actions)
    return 0


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

    fs = fsio.get_fs(path)
    log = fsio.join(path, LOG_DIR)
    names = fs.list_names(log)
    versions = sorted(
        int(f[:20]) for f in names if f.endswith(".json") and f[:20].isdigit()
    )
    if not versions:
        raise FileNotFoundError(f"no delta log at {path}")
    latest = versions[-1]
    protocol = metadata = None
    live: dict[str, dict] = {}
    # replay from an existing checkpoint if the early commits are gone
    cps = sorted(
        int(f[:20])
        for f in names
        if f.endswith(".checkpoint.parquet") and f[:20].isdigit()
    )
    start = 0
    if cps and (versions[0] > 0 or cps[-1] >= versions[0]):
        cp_rows = pq.read_table(
            io.BytesIO(
                fs.read_bytes(
                    fsio.join(log, f"{cps[-1]:020d}.checkpoint.parquet")
                )
            )
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
        for line in fs.read_text(_commit_path(path, v)).splitlines():
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
    fd, tmp = tempfile.mkstemp(suffix=".checkpoint.parquet")
    os.close(fd)
    try:
        pq.write_table(tbl, tmp)
        fs.put_file(tmp, fsio.join(log, f"{latest:020d}.checkpoint.parquet"))
    finally:
        os.unlink(tmp)
    fs.write_text(
        fsio.join(log, "_last_checkpoint"),
        json.dumps({"version": latest, "size": len(rows)}),
    )
    return latest


def clean_log(path: str, *, keep_from: int | None = None) -> int:
    """Delete JSON commits made redundant by the newest checkpoint
    (Delta's metadata log cleanup); returns how many were removed.
    Commits AT or AFTER the checkpoint (or ``keep_from``) are kept —
    time travel to older versions becomes unavailable, exactly as in
    Delta after ``delta.logRetentionDuration`` expiry."""
    fs = fsio.get_fs(path)
    log = fsio.join(path, LOG_DIR)
    names = fs.list_names(log)
    cps = [
        int(f[:20])
        for f in names
        if f.endswith(".checkpoint.parquet") and f[:20].isdigit()
    ]
    if not cps:
        return 0
    cutoff = max(cps) if keep_from is None else keep_from
    n = 0
    for f in sorted(names):
        if f.endswith(".json") and f[:20].isdigit() and int(f[:20]) < cutoff:
            fs.delete(fsio.join(log, f))
            n += 1
    return n
