"""Index-build orchestration — the Ray-Data rewrite of the reference's
``run_engine`` driver loop (``/root/reference/search_engine.py:18-59``).

The reference streams one doc at a time through a single process and
hand-manages spill/merge; here the build is three streamed Dataset
pipelines, each ending in atomically-written, manifest-tracked
partitions (the checkpoint/resume units):

  phase 1  normalize   read corpus -> hash-part shuffle -> docs/part-*.parquet
                        (sha256, first-wins dedup, deterministic doc ids)
  phase 2  doc_meta    read docs   -> map_batches(DocMetaStage) -> doc_meta/
                        + integer-sum stats (N, total_len -> avgdl)
  phase 3  postings    read docs   -> map_batches(PartialPostings)
                        -> groupby(term-hash part)  [THE one all-to-all]
                        -> postings/part-*.parquet + dictionary/part-*.parquet

Scale notes:
- the only full shuffle moves already-compressed posting segments;
- resume filters completed partitions out *before* the shuffle, so a
  restarted build pays one predicate, not a re-execution;
- nothing materializes the corpus: every phase is read -> transform ->
  write with streaming execution and object-store backpressure.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from searchengine_ray.config import IndexConfig
from searchengine_ray.stages.docmeta import DocMetaStage
from searchengine_ray.stages.normalize import NormalizePartWriter, add_part_column
from searchengine_ray.stages.postings import MergePostingsPartWriter, PartialPostings
from searchengine_ray.state.manifest import (completed_partitions, load_manifests,
                                             write_json_atomic)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str: return str(Path(self.root) / "docs")
    @property
    def doc_meta(self) -> str: return str(Path(self.root) / "doc_meta")
    @property
    def postings(self) -> str: return str(Path(self.root) / "postings")
    @property
    def dictionary(self) -> str: return str(Path(self.root) / "dictionary")
    @property
    def meta_path(self) -> str: return str(Path(self.root) / "index_meta.json")

    def meta(self) -> dict:
        return json.loads(Path(self.meta_path).read_text())


def _config_fingerprint(config: IndexConfig, source_tag: str) -> str:
    payload = json.dumps({
        "analyzer": config.analyzer, "lowercase": config.lowercase,
        "split_identifiers": config.split_identifiers,
        "keep_compound": config.keep_compound, "stemming": config.stemming,
        "use_stopwords": config.use_stopwords,
        "stopwords": sorted(config.stopword_set()),
        "min_token_len": config.min_token_len, "max_token_len": config.max_token_len,
        "min_df": config.min_df, "block_size": config.block_size,
        "doc_bucket_size": config.doc_bucket_size,
        "num_term_parts": config.num_term_parts,
        "num_doc_parts": config.num_doc_parts,
        "doc_id_part_bits": config.doc_id_part_bits,
        "source": source_tag,
    }, sort_keys=True)
    return hashlib.blake2b(payload.encode(), digest_size=16).hexdigest()


def _source_dataset(source) -> tuple[ray.data.Dataset, str]:
    if isinstance(source, (str, Path)):
        p = Path(source)
        files = sorted(p.rglob("*.parquet")) if p.is_dir() else [p]
        tag = hashlib.blake2b(
            json.dumps([(f.name, f.stat().st_size) for f in files]).encode(),
            digest_size=8).hexdigest()
        return ray.data.read_parquet([str(f) for f in files]), f"{source}:{tag}"
    return source, "dataset"


def _filter_done_parts(ds: ray.data.Dataset, col: str, done: set[int]) -> ray.data.Dataset:
    if not done:
        return ds
    done_arr = np.array(sorted(done), dtype=np.int64)

    def drop(batch: pa.Table) -> pa.Table:
        mask = ~np.isin(batch.column(col).to_numpy(zero_copy_only=False), done_arr)
        return batch.filter(pa.array(mask))

    return ds.map_batches(drop, batch_format="pyarrow")


def build_index(source, out_root: str | Path, config: IndexConfig | None = None,
                *, id_column: str | None = None, resume: bool = True,
                source_tag: str | None = None) -> IndexPaths:
    """Build the full index at ``out_root``. ``source`` is a parquet
    path/dir or a ``ray.data.Dataset`` with the corpus schema
    ``(repo, path, commit, lang, content)``; pass ``id_column`` when the
    source already carries stable integer doc ids (e.g. the
    ``documents`` table) to skip key-hash id assignment."""
    config = config or IndexConfig()
    paths = IndexPaths(str(out_root))
    Path(paths.root).mkdir(parents=True, exist_ok=True)
    ds, auto_tag = _source_dataset(source)
    fingerprint = _config_fingerprint(config, source_tag or auto_tag)

    # ---- phase 1: normalize (ids, sha256, dedup) -> docs/ ----
    done = completed_partitions(paths.docs, fingerprint=fingerprint) if resume else set()
    n_parts = config.num_doc_parts
    if len(done) < n_parts:
        if id_column is not None:
            # pre-assigned ids: range-partition so files hold disjoint sorted id ranges
            max_id = ds.max(id_column)
            span = (int(max_id) + n_parts) // n_parts

            def add_part(batch: pa.Table) -> pa.Table:
                ids = batch.column(id_column).to_numpy(zero_copy_only=False)
                part = (ids // span).astype(np.int64)
                cols = {n: batch.column(n) for n in batch.column_names}
                if id_column != "doc_id":
                    cols["doc_id"] = pa.array(ids.astype(np.int64), pa.int64())
                cols["part"] = pa.array(part, pa.int64())
                return pa.table(cols)

            labeled = ds.map_batches(add_part, batch_format="pyarrow")
            writer = PrelabeledPartWriter(paths.docs, config, fingerprint)
        else:
            labeled = ds.map_batches(add_part_column, batch_format="pyarrow",
                                     fn_kwargs={"num_doc_parts": n_parts})
            writer = NormalizePartWriter(paths.docs, config, fingerprint)
        labeled = _filter_done_parts(labeled, "part", done)
        # consume: one manifest row per partition (tiny)
        labeled.groupby("part").map_groups(
            writer, batch_format="pyarrow").materialize()

    # ---- phase 2: doc_meta + stats ----
    meta_done = Path(paths.doc_meta, "_DONE.json")
    if not (resume and meta_done.is_file()
            and json.loads(meta_done.read_text()).get("fingerprint") == fingerprint):
        docs = ray.data.read_parquet(paths.docs, columns=["doc_id", "content"],
                                     file_extensions=["parquet"])
        out_dir = Path(paths.doc_meta)
        out_dir.mkdir(parents=True, exist_ok=True)
        for old in out_dir.glob("*.parquet"):
            old.unlink()
        docs.map_batches(DocMetaStage(config), batch_format="pyarrow",
                         batch_size=config.tokenize_batch_size
                         ).write_parquet(paths.doc_meta)
        write_json_atomic({"fingerprint": fingerprint}, meta_done)

    # ---- phase 3: postings + dictionary ----
    done = completed_partitions(paths.postings, fingerprint=fingerprint) if resume else set()
    if len(done) < config.num_term_parts:
        docs = ray.data.read_parquet(paths.docs, columns=["doc_id", "content"],
                                     file_extensions=["parquet"])
        segments = docs.map_batches(PartialPostings(config), batch_format="pyarrow",
                                    batch_size=config.tokenize_batch_size)
        segments = _filter_done_parts(segments, "part", done)
        merger = MergePostingsPartWriter(paths.postings, paths.dictionary,
                                         config, fingerprint)
        segments.groupby("part").map_groups(merger, batch_format="pyarrow").materialize()

    # ---- phase 4: global stats -> index_meta.json ----
    meta_ds = ray.data.read_parquet(paths.doc_meta, columns=["doc_len"],
                                    file_extensions=["parquet"])
    agg = meta_ds.map_batches(
        lambda t: pa.table({"n": [t.num_rows],
                            "total": [int(pc.sum(t.column("doc_len")).as_py() or 0)]}),
        batch_format="pyarrow").to_pandas()
    N = int(agg["n"].sum())
    total_len = int(agg["total"].sum())
    post_manifests = load_manifests(paths.postings)
    write_json_atomic({
        "N": N, "total_len": total_len,
        "avgdl": total_len / N if N else 1.0,
        "n_terms": sum(m.get("n_terms", 0) for m in post_manifests),
        "n_postings": sum(m.get("n_postings", 0) for m in post_manifests),
        "num_term_parts": config.num_term_parts,
        "num_doc_parts": config.num_doc_parts,
        "fingerprint": fingerprint,
        "config": {"analyzer": config.analyzer, "k1": config.k1, "b": config.b,
                   "min_df": config.min_df, "block_size": config.block_size,
                   "doc_bucket_size": config.doc_bucket_size,
                   "stemming": config.stemming},
    }, paths.meta_path)
    return paths


class PrelabeledPartWriter:
    """Phase-1 writer for sources with pre-assigned integer doc ids:
    sorts the partition by doc_id, computes sha256, writes atomically.
    (Used for the driver's ``documents`` table mapped into the corpus
    schema — ids are kept so results can be compared against SQL.)"""

    def __init__(self, docs_dir: str, config: IndexConfig, fingerprint: str):
        self.__name__ = 'PrelabeledPartWriter'  # ray map_groups wants a __name__
        self.docs_dir = docs_dir
        self.config = config
        self.fingerprint = fingerprint

    def __call__(self, group: pa.Table) -> pa.Table:
        from searchengine_ray.stages.normalize import sha256_column
        from searchengine_ray.state.manifest import write_partition_atomic

        part = int(group.column("part")[0].as_py())
        group = group.combine_chunks()
        group = group.take(pc.sort_indices(group, sort_keys=[("doc_id", "ascending")]))
        cols = {"doc_id": group.column("doc_id")}
        names = group.column_names
        for c in ("repo", "path", "commit", "lang"):
            cols[c] = (group.column(c) if c in names
                       else pa.array([""] * group.num_rows, pa.string()))
        cols["sha256"] = sha256_column(group.column("content").to_pylist())
        cols["content"] = group.column("content")
        out = pa.table(cols)
        write_partition_atomic(out, Path(self.docs_dir) / f"part-{part:05d}.parquet",
                               kind="docs", partition=part,
                               fingerprint=self.fingerprint)
        return pa.table({"partition": pa.array([part], pa.int64()),
                         "rows": pa.array([out.num_rows], pa.int64())})
