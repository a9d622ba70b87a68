"""Phase 1 — normalize: sha256, first-wins dedup, deterministic doc ids.

Replaces the reference's "tweet_id straight from the file" identity
(``/root/reference/indexer.py:107``, ``reader.py:22-23``) with a
deterministic, shuffle-friendly scheme over the ``(repo, path, commit)``
key (SURVEY §1.3 / §7):

    part   = blake2b64(repo \\0 path \\0 commit) % num_doc_parts
    doc_id = (part << doc_id_part_bits) | rank-of-key-in-sorted-part

- one hash-partitioned shuffle, no global sort, no sampling — any run
  on any cluster size produces identical ids (parallelism-invariance
  test relies on this);
- ids are dense *within* a partition, so per-term doc-id deltas stay
  tiny for VByte; the cross-partition gaps cost one ~5-byte delta per
  partition per term;
- exact first-wins dedup of duplicate keys happens inside the same
  groupby (SURVEY §2.7 — the one dedup the reference lacks);
- ``sha256(content)`` is computed per row — the per-row invariant
  demanded by ``BASELINE.json`` ``input_hint``;
- each partition is written atomically, sorted by doc_id, with a
  lineage manifest → the first checkpoint/resume unit.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.config import IndexConfig
from searchengine_ray.state.manifest import write_partition_atomic

DOCS_SCHEMA_COLS = ["doc_id", "repo", "path", "commit", "lang", "sha256", "content"]


def add_part_column(batch: pa.Table, num_doc_parts: int) -> pa.Table:
    """Vectorized-ish key hash: per-row blake2b (C code per row — the same
    cost class as the mandatory per-row sha256)."""
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    parts = np.empty(len(repo), dtype=np.int64)
    for i, (r, p, c) in enumerate(zip(repo, path, commit)):
        h = hashlib.blake2b(f"{r}\x00{p}\x00{c}".encode(), digest_size=8)
        parts[i] = int.from_bytes(h.digest(), "big") % num_doc_parts
    return batch.append_column("part", pa.array(parts, pa.int64()))


def sha256_column(contents: list[str]) -> pa.Array:
    return pa.array([hashlib.sha256(c.encode("utf-8")).hexdigest() for c in contents],
                    pa.string())


def tie_break_int64(col) -> pa.ChunkedArray | pa.Array:
    """Normalize the recency tie-break column to int64 (timestamps →
    epoch microseconds) so the searcher's lexsort key is uniform."""
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64())
    return col.cast(pa.int64())


class NormalizePartWriter:
    """``groupby("part").map_groups`` body: one call per doc partition.

    Receives every row of one hash partition, sorts by key, drops
    duplicate keys (first-wins), assigns ``(part << bits) | rank`` ids,
    computes sha256, writes ``docs/part-XXXXX.parquet`` atomically and
    returns the lineage/manifest row. Group size = corpus/num_doc_parts
    — size ``num_doc_parts`` so a group fits one worker's heap.
    """

    def __init__(self, docs_dir: str, config: IndexConfig, fingerprint: str):
        self.__name__ = 'NormalizePartWriter'  # ray map_groups wants a __name__
        self.docs_dir = docs_dir
        self.config = config
        self.fingerprint = fingerprint

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        # group is a zero-copy concat of exchange slices — sort_indices
        # and take handle chunked columns; combining first would add a
        # full extra pass over the (bandwidth-bound) content payload
        order = pc.sort_indices(group, sort_keys=[("repo", "ascending"),
                                                  ("path", "ascending"),
                                                  ("commit", "ascending")])
        group = group.take(order)
        # first-wins dedup on the key triple (vectorized adjacent compare
        # over the sorted rows — no Python tuples)
        keep = np.ones(group.num_rows, dtype=bool)
        if group.num_rows > 1:
            same = None
            for col in ("repo", "path", "commit"):
                c = group.column(col).combine_chunks()
                eq = pc.equal(c.slice(1), c.slice(0, len(c) - 1))
                same = eq if same is None else pc.and_(same, eq)
            keep[1:] = ~same.to_numpy(zero_copy_only=False)
        n_dropped = int((~keep).sum())
        if n_dropped:
            group = group.filter(pa.array(keep))
        n = group.num_rows
        if n >= (1 << self.config.doc_id_part_bits):
            raise ValueError(
                f"doc partition {part} holds {n} rows >= 2^"
                f"{self.config.doc_id_part_bits}; ids would collide with the "
                f"next partition's range — raise doc_id_part_bits or "
                f"num_doc_parts")
        base = part << self.config.doc_id_part_bits
        doc_ids = pa.array(base + np.arange(n, dtype=np.int64), pa.int64())
        # sha256 normally arrives precomputed from the map side (scales
        # with input files); compute here only for non-exchange callers
        sha = (group.column("sha256") if "sha256" in group.column_names
               else sha256_column(group.column("content").to_pylist()))
        cols = {
            "doc_id": doc_ids,
            "repo": group.column("repo"),
            "path": group.column("path"),
            "commit": group.column("commit"),
            "lang": group.column("lang"),
            "sha256": sha,
            "content": group.column("content"),
        }
        tb = self.config.tie_break_column
        if tb:
            if tb not in group.column_names:
                raise ValueError(f"tie_break_column {tb!r} missing from corpus")
            cols[tb] = tie_break_int64(group.column(tb))
        out = pa.table(cols)
        manifest = write_partition_atomic(
            out, Path(self.docs_dir) / f"part-{part:05d}.parquet",
            kind="docs", partition=part, fingerprint=self.fingerprint,
            extra={"dups_dropped": n_dropped}, row_group_size=8192)
        return pa.table({"partition": pa.array([part], pa.int64()),
                         "rows": pa.array([manifest["rows"]], pa.int64()),
                         "dups_dropped": pa.array([n_dropped], pa.int64())})
