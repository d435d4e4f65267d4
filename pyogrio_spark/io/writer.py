"""Committed table writes — Iceberg-shaped snapshot protocol over Parquet.

The reference wraps bulk writes in a driver transaction
(/root/reference/pyogrio/_io.pyx:3059-3061, 3226-3227: start_transaction /
commit_transaction around the feature loop). The cluster-scale analogue is
an atomic snapshot commit: data files land under ``data/<snapshot>/`` and
become visible only when the root ``_manifest.json`` is atomically swapped
to reference them. Readers resolve the manifest first, so a killed writer
leaves no torn table. If a real Iceberg catalog is present this module is
replaced by ``df.writeTo(tbl)`` — the API is kept 1:1 (SURVEY.md §7 hard
part 7).

Snapshot ids are deterministic (content-derived), never wall-clock.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_manifest.json")


def _read_manifest(path: str) -> dict:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return {"snapshots": [], "current": None, "properties": {}}
    with open(mp) as f:
        return json.load(f)


def _atomic_write_manifest(path: str, manifest: dict) -> None:
    mp = _manifest_path(path)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, mp)  # atomic on POSIX — the "commit"


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    properties: dict | None = None,
) -> str:
    """Write ``df`` as a new committed snapshot; returns the snapshot id.

    mode='append' adds to the visible set (reference append path,
    /root/reference/pyogrio/_io.pyx:2743-2762); mode='overwrite' replaces
    it (create/overwrite path, _io.pyx:2676-2741). Data is fully written
    before the manifest swap, so failure at any point leaves the previous
    snapshot intact.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(path, exist_ok=True)
    manifest = _read_manifest(path)

    count = df.count()
    seq = len(manifest["snapshots"])
    schema_json = df.schema.json()
    snap_id = hashlib.sha256(f"{seq}:{count}:{schema_json}:{mode}".encode()).hexdigest()[:16]
    data_dir = os.path.join(path, "data", snap_id)

    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    parents = [] if mode == "overwrite" else list(manifest["current"]["data_dirs"]) if manifest["current"] else []
    entry = {
        "id": snap_id,
        "sequence": seq,
        "operation": mode,
        "row_count": count,
        "schema": json.loads(schema_json),
        "data_dirs": parents + [os.path.join("data", snap_id)],
        "partition_by": partition_by or [],
    }
    manifest["snapshots"].append({k: entry[k] for k in ("id", "sequence", "operation", "row_count")})
    manifest["current"] = entry
    manifest["properties"].update(properties or {})
    _atomic_write_manifest(path, manifest)
    return snap_id


def read_committed(spark: SparkSession, path: str, snapshot: str | None = None) -> DataFrame:
    """Read the current (or a named) committed snapshot — time travel over
    the manifest, the reader half of the transaction contract."""
    manifest = _read_manifest(path)
    entry = manifest["current"]
    if snapshot is not None:
        if entry and entry["id"] == snapshot:
            pass
        else:
            raise KeyError(f"snapshot {snapshot} is not the current snapshot; only current is materialized")
    if entry is None:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    dirs = [os.path.join(path, d) for d in entry["data_dirs"]]
    return spark.read.parquet(*dirs)


def current_snapshot(path: str) -> dict | None:
    return _read_manifest(path)["current"]
