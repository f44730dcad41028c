"""Minimal Delta Lake transaction log — the real protocol, pure Python.

The image has no delta-spark jars, but the Delta transaction-log
PROTOCOL is public and simple: a table is parquet data files plus a
``_delta_log/`` directory of JSON commits, each a list of actions
(``protocol``, ``metaData``, ``add``, ``remove``, ``commitInfo``) one
per line, named ``<version:020d>.json``. This module implements the
subset the reference uses (reference ``DeltaOP/delta_time_travel.py:
14-19``, ``DeltaOP/delta_audit_read.py:19``, ``glue_jobs/
scd2_delta_vendors.py:143-155``): versioned overwrite/append commits,
snapshot reads, ``versionAsOf`` time travel, and history — producing a
log layout that real delta-spark readers understand for these basic
actions (minReaderVersion=1: no deletion vectors, no column mapping).

Scale notes:
- Data files are written by Spark (parallel, one file per task) and
  promoted into the table root by a driver-side rename — rename count
  equals file count, a metadata-only O(files) step, the same contract
  a real Delta commit has. The JSON commit is one small driver-side
  file append; readers replay the log (O(total actions)) and then
  scan ONLY the active files — time travel never copies data.
- Parquet checkpoints (the log-compaction optimization for
  1000+-commit tables) are out of scope here; the replay loop is the
  documented fallback every Delta reader implements.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

LOG_DIR = "_delta_log"
PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


class DeltaLogError(RuntimeError):
    pass


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, LOG_DIR)


def _commit_path(table_path: str, version: int) -> str:
    return os.path.join(_log_dir(table_path), f"{version:020d}.json")


def latest_version(table_path: str) -> int | None:
    """Highest committed version, or None for a non-Delta directory."""
    d = _log_dir(table_path)
    if not os.path.isdir(d):
        return None
    versions = [
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json") and f[:-5].isdigit()
    ]
    return max(versions) if versions else None


def is_delta_table(table_path: str) -> bool:
    return latest_version(table_path) is not None


def _read_commit(table_path: str, version: int) -> list[dict]:
    with open(_commit_path(table_path, version)) as f:
        return [json.loads(line) for line in f if line.strip()]


def _replay(table_path: str, version_as_of: int | None = None) -> tuple[list[str], StructType]:
    """Replay the log up to ``version_as_of`` (inclusive; latest if
    None) → (active data file paths, schema)."""
    latest = latest_version(table_path)
    if latest is None:
        raise DeltaLogError(f"not a Delta table (no {LOG_DIR}): {table_path}")
    upto = latest if version_as_of is None else version_as_of
    if upto > latest or upto < 0:
        raise DeltaLogError(
            f"versionAsOf {upto} out of range [0, {latest}] for {table_path}"
        )
    active: dict[str, bool] = {}
    schema: StructType | None = None
    for v in range(upto + 1):
        for action in _read_commit(table_path, v):
            if "metaData" in action:
                schema = StructType.fromJson(
                    json.loads(action["metaData"]["schemaString"])
                )
            elif "add" in action:
                active[action["add"]["path"]] = True
            elif "remove" in action:
                active.pop(action["remove"]["path"], None)
    if schema is None:
        raise DeltaLogError(f"no metaData action in log of {table_path}")
    return [os.path.join(table_path, p) for p in active], schema


def read_delta_log(
    spark: SparkSession, table_path: str, version_as_of: int | None = None
) -> DataFrame:
    """Snapshot / time-travel read (S3/S4): replay the log, scan only
    the active files with the committed schema. An empty snapshot
    (everything removed) yields an empty DataFrame with the schema."""
    files, schema = _replay(table_path, version_as_of)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def delta_log_history(table_path: str) -> list[dict]:
    """S5: one record per commit (newest first), from commitInfo."""
    latest = latest_version(table_path)
    if latest is None:
        raise DeltaLogError(f"not a Delta table: {table_path}")
    out = []
    for v in range(latest, -1, -1):
        info = next(
            (a["commitInfo"] for a in _read_commit(table_path, v) if "commitInfo" in a),
            {},
        )
        out.append({"version": v, **info})
    return out


def _promote_staged_files(staging: str, table_path: str) -> list[dict]:
    """Move Spark-written part files from the staging dir into the
    table root; return their add-action dicts. Part names carry a task
    UUID, so collisions are impossible."""
    adds = []
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        src, dst = os.path.join(staging, name), os.path.join(table_path, name)
        os.replace(src, dst)
        st = os.stat(dst)
        adds.append(
            {
                "path": name,
                "partitionValues": {},
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
            }
        )
    return adds


def _write_commit(table_path: str, version: int, actions: list[dict]) -> None:
    os.makedirs(_log_dir(table_path), exist_ok=True)
    path = _commit_path(table_path, version)
    if os.path.exists(path):
        raise DeltaLogError(f"concurrent commit: version {version} already exists")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
    os.replace(tmp, path)  # atomic publish — the Delta commit contract


def write_delta(df: DataFrame, table_path: str, mode: str = "overwrite") -> int:
    """S9/S10: versioned Delta sink. ``overwrite`` commits remove
    actions for every previously-active file plus adds for the new
    ones (logical replace — old versions stay readable); ``append``
    commits adds only. Returns the committed version."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"write_delta mode must be overwrite|append, got {mode!r}")
    prior = latest_version(table_path)
    version = 0 if prior is None else prior + 1
    if prior is not None:
        _, prior_schema = _replay(table_path)
        # Compare names + types, not nullability: a parquet read-back
        # relaxes every field to nullable, and Delta treats that as the
        # same table schema (real writers do the same containment check).
        def _shape(s: StructType) -> list[tuple[str, str]]:
            return [(f.name, f.dataType.simpleString()) for f in s.fields]

        if _shape(prior_schema) != _shape(df.schema):
            raise DeltaLogError(
                "schema mismatch vs table metaData; evolve the table explicitly "
                f"(table={prior_schema.simpleString()}, df={df.schema.simpleString()})"
            )

    os.makedirs(table_path, exist_ok=True)
    staging = os.path.join(table_path, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    adds = _promote_staged_files(staging, table_path)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)

    now_ms = int(time.time() * 1000)
    actions: list[dict] = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
            }
        }
    ]
    if version == 0:
        actions.append({"protocol": dict(PROTOCOL)})
    if version == 0 or mode == "overwrite":
        # Delta re-emits metaData on REPLACE; cheap and keeps replay simple.
        actions.append(
            {
                "metaData": {
                    "id": uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    if mode == "overwrite" and prior is not None:
        prior_files, _ = _replay(table_path, prior)
        for p in prior_files:
            actions.append(
                {
                    "remove": {
                        "path": os.path.relpath(p, table_path),
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
    actions.extend({"add": a} for a in adds)
    _write_commit(table_path, version, actions)
    return version


def compact_delta(
    spark: SparkSession, table_path: str, target_files: int = 1
) -> int:
    """OPTIMIZE: rewrite the current snapshot's files into
    ``target_files`` larger ones and commit remove+add with
    ``dataChange: false`` (readers see identical rows; the commit only
    swaps the file layout — the small-file compaction every streaming
    ingest eventually needs). Returns the committed version."""
    prior = latest_version(table_path)
    if prior is None:
        raise DeltaLogError(f"not a Delta table: {table_path}")
    files, schema = _replay(table_path)
    if not files:
        raise DeltaLogError("nothing to compact: empty snapshot")
    df = spark.read.schema(schema).parquet(*files).coalesce(target_files)
    staging = os.path.join(table_path, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    adds = _promote_staged_files(staging, table_path)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    now_ms = int(time.time() * 1000)
    actions: list[dict] = [
        {"commitInfo": {"timestamp": now_ms, "operation": "OPTIMIZE",
                        "operationParameters": {"targetFiles": target_files}}}
    ]
    for p in files:
        actions.append({"remove": {"path": os.path.relpath(p, table_path),
                                   "deletionTimestamp": now_ms, "dataChange": False}})
    for a in adds:
        a["dataChange"] = False
        actions.append({"add": a})
    version = prior + 1
    _write_commit(table_path, version, actions)
    return version


def vacuum_delta(table_path: str, keep_last: int = 1) -> list[str]:
    """VACUUM: physically delete data files not referenced by any of
    the last ``keep_last`` snapshots. Time travel older than the
    retention window stops working afterwards — the same trade real
    Delta VACUUM makes (default 7-day retention there; version-based
    here because the tests need determinism). Returns deleted paths."""
    latest = latest_version(table_path)
    if latest is None:
        raise DeltaLogError(f"not a Delta table: {table_path}")
    keep: set[str] = set()
    for v in range(max(0, latest - keep_last + 1), latest + 1):
        files, _ = _replay(table_path, v)
        keep |= {os.path.relpath(p, table_path) for p in files}
    deleted = []
    for name in sorted(os.listdir(table_path)):
        if name.endswith(".parquet") and name not in keep:
            os.remove(os.path.join(table_path, name))
            deleted.append(name)
    return deleted
