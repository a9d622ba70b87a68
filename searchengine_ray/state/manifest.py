"""Per-partition lineage manifests + atomic partition writes.

The resumability layer required by ``BASELINE.json`` ``north_rule``
("resumable from checkpoint with per-partition lineage + metrics") —
the done-right analog of the reference's in-merge byte-offset resume map
(``/root/reference/indexer.py:33,336-338,371``):

- every output partition is written to a temp file then ``os.replace``d
  into place (atomic on POSIX), so a crashed run never leaves a torn
  partition;
- next to each partition lands ``<name>.manifest.json`` recording rows,
  bytes, a content fingerprint, and the *input fingerprint* (config +
  source signature), so a rerun skips a partition only when both the
  output is intact and the inputs are unchanged;
- ``completed_partitions`` is the resume query: phase drivers filter
  finished partitions out of the shuffle input, so skipped work costs
  one cheap predicate, not a re-execution.

Ray task retries handle *within-run* failures via lineage; this layer
handles *cross-run* resume, which Ray does not persist.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


def write_partition_atomic(table: pa.Table, path: str | Path, *, kind: str,
                           partition: int, fingerprint: str,
                           extra: dict | None = None,
                           row_group_size: int | None = None,
                           compression=None) -> dict:
    """Write one parquet partition atomically + its manifest. Returns the
    manifest dict (also usable as a lineage row). ``row_group_size``
    bounds row groups so downstream map tasks can split a partition
    without re-decoding the whole file. ``compression`` is passed to
    ``pq.write_table`` (per-leaf dict or codec name) — used to skip
    snappy on columns that are already entropy-coded."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + f".tmp.{os.getpid()}")
    kw = {}
    if row_group_size:
        kw["row_group_size"] = row_group_size
    if compression is not None:
        kw["compression"] = compression
    pq.write_table(table, tmp, **kw)
    os.replace(tmp, path)
    manifest = {
        "kind": kind,
        "partition": int(partition),
        "file": path.name,
        "rows": table.num_rows,
        "bytes": os.path.getsize(path),
        "fingerprint": fingerprint,
        "schema": [f"{f.name}:{f.type}" for f in table.schema],
        "written_at": time.time(),  # informational only — not part of data identity
        **(extra or {}),
    }
    mtmp = path.with_name(path.name + f".manifest.tmp.{os.getpid()}")
    mtmp.write_text(json.dumps(manifest, indent=1))
    os.replace(mtmp, path.with_name(path.stem + ".manifest.json"))
    return manifest


def write_empty_partition_manifest(directory: str | Path, *, kind: str,
                                   partition: int, fingerprint: str) -> dict:
    """Record a legitimately-empty partition so resume treats it as done."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    manifest = {"kind": kind, "partition": int(partition), "file": None,
                "rows": 0, "bytes": 0, "fingerprint": fingerprint,
                "written_at": time.time()}
    tmp = directory / f"part-{partition:05d}.manifest.tmp.{os.getpid()}"
    tmp.write_text(json.dumps(manifest, indent=1))
    os.replace(tmp, directory / f"part-{partition:05d}.manifest.json")
    return manifest


def completed_partitions(directory: str | Path, *, fingerprint: str) -> set[int]:
    """Partitions whose manifest validates against the current inputs."""
    directory = Path(directory)
    done: set[int] = set()
    if not directory.is_dir():
        return done
    for mf in directory.glob("*.manifest.json"):
        try:
            m = json.loads(mf.read_text())
        except (json.JSONDecodeError, OSError):
            continue
        if m.get("fingerprint") != fingerprint:
            continue
        if m.get("rows") == 0 and not m.get("file"):
            done.add(int(m["partition"]))
            continue
        f = directory / (m.get("file") or "")
        if f.is_file() and os.path.getsize(f) == m.get("bytes"):
            done.add(int(m["partition"]))
    return done


def load_manifests(directory: str | Path) -> list[dict]:
    directory = Path(directory)
    out = []
    if directory.is_dir():
        for mf in sorted(directory.glob("*.manifest.json")):
            try:
                out.append(json.loads(mf.read_text()))
            except (json.JSONDecodeError, OSError):
                pass
    return out


def write_json_atomic(obj: dict, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + f".tmp.{os.getpid()}")
    tmp.write_text(json.dumps(obj, indent=1, default=str))
    os.replace(tmp, path)
