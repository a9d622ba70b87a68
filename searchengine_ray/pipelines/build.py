"""Index-build orchestration — the Ray-Data rewrite of the reference's
``run_engine`` driver loop (``/root/reference/search_engine.py:18-59``).

The reference streams one doc at a time through a single process and
hand-manages spill/merge; here the build is three streamed Dataset
pipelines, each ending in atomically-written, manifest-tracked
partitions (the checkpoint/resume units):

  phase 1  normalize   read corpus -> hash-part shuffle -> docs/part-*.parquet
                        (sha256, first-wins dedup, deterministic doc ids)
  phase 2  index       read docs   -> map_batches(PartialPostings)
                        -> groupby(part)  [THE one all-to-all]
                        -> postings/ + dictionary/ + doc_meta/ partitions
                        (doc-meta rows piggyback on the posting segments:
                         the corpus is read and tokenized exactly ONCE)
  phase 3  stats       integer sums over doc_meta -> index_meta.json

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
        "normalize_numbers": config.normalize_numbers,
        "use_stopwords": config.use_stopwords,
        "stopwords": sorted(config.stopword_set()),
        "min_token_len": config.min_token_len, "max_token_len": config.max_token_len,
        "min_df": config.min_df, "block_size": config.block_size,
        "doc_bucket_size": config.doc_bucket_size,
        "num_term_parts": config.num_term_parts,
        "num_doc_parts": config.num_doc_parts,
        "doc_id_part_bits": config.doc_id_part_bits,
        "store_positions": config.store_positions,
        "source": source_tag,
        "layout_version": 4,   # v4: +pos_sizes/pos_bytes (positional postings)
    }, sort_keys=True)
    return hashlib.blake2b(payload.encode(), digest_size=16).hexdigest()


def _analyzer_fingerprint(config: IndexConfig) -> str:
    """Hash of every tokenization-relevant option — recorded in
    index_meta and compared on incremental ingest so generations can
    never mix incompatible analyses."""
    payload = json.dumps({
        "analyzer": config.analyzer, "lowercase": config.lowercase,
        "split_identifiers": config.split_identifiers,
        "keep_compound": config.keep_compound, "stemming": config.stemming,
        "normalize_numbers": config.normalize_numbers,
        "use_stopwords": config.use_stopwords,
        "stopwords": sorted(config.stopword_set()),
        "min_token_len": config.min_token_len,
        "max_token_len": config.max_token_len,
    }, sort_keys=True)
    return hashlib.blake2b(payload.encode(), digest_size=8).hexdigest()


def _source_tag(source, files: list[str]) -> str:
    """Content tag for a parquet file/dir source — the ONE shared
    identity both build_index and add_documents fingerprint against.

    Includes a hash of each file's TAIL (up to 64 KiB — the parquet
    footer: schema, row-group offsets and column stats) alongside
    (name, size): add_documents uses this tag as a permanent generation
    registry key, and a different corpus whose files coincidentally
    share names+sizes must NOT collide (it would be silently skipped as
    'already ingested' — data loss, not just a stale resume). The tag
    deliberately does NOT use mtime: a copied/rsynced corpus or a
    crash-retried ingest after a touch must still resolve to the SAME
    generation (re-running a completed ingest stays a no-op)."""
    def sig(f: str):
        st = Path(f).stat()
        with open(f, "rb") as fh:
            fh.seek(max(0, st.st_size - 65536))
            tail = hashlib.blake2b(fh.read(), digest_size=8).hexdigest()
        return (Path(f).name, st.st_size, tail)

    h = hashlib.blake2b(
        json.dumps([sig(f) for f in files]).encode(), digest_size=8).hexdigest()
    return f"{source}:{h}"


def _legacy_source_tags(source, files: list[str]) -> list[str]:
    """Earlier tag formats this repo has shipped, oldest last.

    The tag participates in the PERMANENT generation-registry key, so
    any format change silently un-recognizes corpora ingested under the
    old format — ``add_documents`` would re-ingest a completed source as
    a duplicate generation. Whenever ``_source_tag`` changes, the prior
    format MUST be appended here so the registry lookup keeps matching
    old completed generations (the current format is frozen; extend,
    don't edit)."""
    def sig_v1(f: str):               # (name, size) only — pre-tail-hash
        st = Path(f).stat()
        return [Path(f).name, st.st_size]

    h = hashlib.blake2b(
        json.dumps([sig_v1(f) for f in files]).encode(), digest_size=8).hexdigest()
    return [f"{source}:{h}"]


def _source_files(source) -> list[str]:
    p = Path(source)
    return sorted(str(f)
                  for f in (p.rglob("*.parquet") if p.is_dir() else [p]))


def _source_dataset(source) -> tuple[ray.data.Dataset, str, int]:
    if isinstance(source, (str, Path)):
        files = _source_files(source)
        total = sum(Path(f).stat().st_size for f in files)
        return (ray.data.read_parquet(files),
                _source_tag(source, files), total)
    return source, "dataset", 0


class _BlockSizeForRun:
    """Scope-limited ``target_max_block_size`` tuned to the input.

    Ray's sort-based groupby emits reduce blocks of ~target block size
    and ``map_groups`` schedules ONE TASK PER BLOCK — with the default
    128 MiB blocks a small-corpus shuffle collapses to 2-3 tasks and the
    build stops scaling with CPUs. Sizing blocks to
    ``input_bytes / (4 x cpus)`` (clamped to [4 MiB, 128 MiB]) keeps
    every core busy at small scale while leaving the default untouched
    at 100 TB scale, where 128 MiB already yields millions of blocks.
    """

    def __init__(self, input_bytes: int):
        self.input_bytes = input_bytes
        self.prev = None

    def __enter__(self):
        from ray.data import DataContext

        ctx = DataContext.get_current()
        self.prev = ctx.target_max_block_size
        if self.input_bytes > 0:
            import ray as _ray

            cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
            size = self.input_bytes * 3 // (4 * cpus)   # parquet->arrow inflation ~3x
            ctx.target_max_block_size = max(4 << 20, min(128 << 20, size))
        return self

    def __exit__(self, *exc):
        from ray.data import DataContext

        DataContext.get_current().target_max_block_size = self.prev
        return False


def _clean_stale_partitions(directory: str, fingerprint: str) -> None:
    """Remove partition files whose manifest is missing or from another
    config/source generation — a rerun never mixes index generations."""
    d = Path(directory)
    if not d.is_dir():
        d.mkdir(parents=True, exist_ok=True)
        return
    valid = {f"part-{p:05d}" for p in
             completed_partitions(d, fingerprint=fingerprint)}
    for f in list(d.glob("*.parquet")):
        if f.stem not in valid:
            f.unlink()
            mf = f.with_name(f.stem + ".manifest.json")
            if mf.is_file():
                mf.unlink()


def _row_group_jobs(doc_files: list[str]) -> list[tuple[str, int, int]]:
    """Phase-2 map jobs: consecutive row-group ranges per docs file.

    Granularity targets ~2 jobs per core (floor 32 jobs so small
    clusters still pipeline): each map task returns ``total_parts``
    objects, and measured at 32 cpus the per-task/per-object overhead
    dominates below ~64 jobs' worth of work (2M docs: 128 jobs -> 16.4 s
    phase-2 vs 64 jobs -> 13.5 s), while 256 jobs' 32k slices inflated
    the reduce arg resolution 13x. ``GRAFT_RG_STEP`` overrides."""
    import os

    import pyarrow.parquet as _pqm
    import ray as _ray

    per_file = [(_f, _pqm.ParquetFile(_f).metadata.num_row_groups)
                for _f in doc_files]
    total_rgs = sum(n for _, n in per_file)
    env = os.environ.get("GRAFT_RG_STEP")
    if env:
        step = max(1, int(env))
    else:
        cpus = (int(_ray.cluster_resources().get("CPU", 8))
                if _ray.is_initialized() else 8)
        step = max(1, total_rgs // max(2 * cpus, 32))
    jobs = []
    for f, n_rg in per_file:
        for lo in range(0, n_rg, step):
            jobs.append((f, lo, min(lo + step, n_rg)))
    return jobs


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
    import os as _os
    import sys as _sys
    import time as _time

    _trace = _os.environ.get("GRAFT_BUILD_TIMINGS")
    _t0 = _time.time()
    _phase_seconds: dict[str, float] = {}

    def _mark(phase):
        nonlocal _t0
        _phase_seconds[phase] = round(_time.time() - _t0, 3)
        if _trace:
            print(f"[build] {phase}: {_phase_seconds[phase]:.2f}s", file=_sys.stderr)
        _t0 = _time.time()

    config = config or IndexConfig()
    paths = IndexPaths(str(out_root))
    Path(paths.root).mkdir(parents=True, exist_ok=True)
    ds, auto_tag, input_bytes = _source_dataset(source)
    fingerprint = _config_fingerprint(config, source_tag or auto_tag)

    # ---- phase 1: normalize (ids, sha256, dedup) -> docs/ ----
    done = completed_partitions(paths.docs, fingerprint=fingerprint) if resume else set()
    n_parts = config.num_doc_parts
    if len(done) < n_parts and id_column is None and isinstance(source, (str, Path)):
        # file source: direct low-cardinality partition exchange (raw Ray
        # tasks — no sort barrier; see stages/exchange.py)
        from searchengine_ray.stages.exchange import run_partition_exchange, split_by_part

        p = Path(source)
        files = sorted(str(f) for f in (p.rglob("*.parquet") if p.is_dir() else [p]))
        writer = NormalizePartWriter(paths.docs, config, fingerprint)

        def _map_norm(path):
            import pyarrow.parquet as _pq

            from searchengine_ray.stages.normalize import sha256_column

            t = add_part_column(_pq.read_table(path), n_parts)
            # sha256 on the MAP side: one task per input file scales with
            # the corpus; computing it in the num_doc_parts reducers is a
            # fixed-width bottleneck (16 tasks regardless of cluster size)
            t = t.append_column("sha256",
                                sha256_column(t.column("content").to_pylist()))
            return split_by_part(t, n_parts)

        def _reduce_norm(part, tables):
            if not tables:
                from searchengine_ray.state.manifest import write_empty_partition_manifest

                return write_empty_partition_manifest(
                    paths.docs, kind="docs", partition=part, fingerprint=fingerprint)
            return writer(pa.concat_tables(tables))

        _x1: dict = {}
        run_partition_exchange(files, n_parts, _map_norm, _reduce_norm,
                               skip_parts=done, timings=_x1 if _trace else None)
        for k, v in _x1.items():
            _phase_seconds[f"phase1_{k.removesuffix('_sec')}"] = v
    elif len(done) < n_parts:
      with _BlockSizeForRun(input_bytes):
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
    _mark("phase1_normalize")
    del ds

    # ---- phase 2: postings + dictionary + doc_meta (ONE pass, ONE shuffle)
    # Doc-meta rows piggyback on the posting segments: the tokenizer
    # already computes per-doc stats, so the corpus is read and
    # tokenized exactly once (the naive layout tokenized twice).
    done = (completed_partitions(paths.postings, fingerprint=fingerprint)
            if resume else set())
    done |= (completed_partitions(paths.doc_meta, fingerprint=fingerprint)
             if resume else set())
    total_parts = config.num_term_parts + config.num_doc_parts
    if len(done) < total_parts:
        # drop stale/invalid partition files (old config/layout) so the
        # query loader never mixes generations
        for d in (paths.postings, paths.dictionary, paths.doc_meta):
            _clean_stale_partitions(d, fingerprint)
        from searchengine_ray.stages.exchange import run_partition_exchange, split_by_part

        # phase-2 inputs come from the CURRENT generation's manifests,
        # never a blind glob: a rerun after a config change (e.g. fewer
        # num_doc_parts) must not tokenize leftover higher-numbered docs
        # partitions from the previous generation
        _clean_stale_partitions(paths.docs, fingerprint)
        doc_parts_done = completed_partitions(paths.docs, fingerprint=fingerprint)
        doc_files = sorted(str(Path(paths.docs) / f"part-{p:05d}.parquet")
                           for p in doc_parts_done
                           if (Path(paths.docs) / f"part-{p:05d}.parquet").is_file())
        merger = MergePostingsPartWriter(paths.postings, paths.dictionary,
                                         config, fingerprint,
                                         doc_meta_dir=paths.doc_meta)
        bs = config.tokenize_batch_size

        # map granularity = a few parquet row groups (not a whole file):
        # fine-grained tasks balance the tokenize wave at any CPU count
        import pyarrow.parquet as _pqm

        jobs = _row_group_jobs(doc_files)

        def _map_postings(job):
            import pyarrow.parquet as _pq

            path, rg_lo, rg_hi = job
            t = _pq.ParquetFile(path).read_row_groups(
                list(range(rg_lo, rg_hi)), columns=["doc_id", "content"])
            # one PartialPostings per WORKER PROCESS, not per task: Ray
            # reuses workers, so the analyzer's token-expansion cache and
            # term-hash cache stay warm across the whole map wave
            import searchengine_ray.stages.postings as _sp

            pp = getattr(_sp, "_worker_pp", None)
            if pp is None or pp._fingerprint != fingerprint:
                pp = PartialPostings(config)
                pp._fingerprint = fingerprint
                _sp._worker_pp = pp
            outs = [pp(t.slice(i, bs)) for i in range(0, t.num_rows, bs)]
            seg = pa.concat_tables(outs) if outs else None
            if seg is None or seg.num_rows == 0:
                return [None] * total_parts
            return split_by_part(seg, total_parts)

        def _reduce_postings(part, tables):
            if not tables:
                from searchengine_ray.state.manifest import write_empty_partition_manifest

                target = (paths.doc_meta if part >= config.num_term_parts
                          else paths.postings)
                kind = "doc_meta" if part >= config.num_term_parts else "postings"
                return write_empty_partition_manifest(
                    target, kind=kind, partition=part, fingerprint=fingerprint)
            return merger(pa.concat_tables(tables))

        _x2: dict = {}
        out2 = run_partition_exchange(jobs, total_parts, _map_postings,
                                      _reduce_postings, skip_parts=done,
                                      timings=_x2 if _trace else None)
        if _trace:
            # decompose in-task reduce seconds: sort/merge vs final write
            sort_s = write_s = 0.0
            for r in out2:
                if isinstance(r, pa.Table) and "sort_sec" in r.column_names:
                    sort_s += float(r.column("sort_sec")[0].as_py())
                    write_s += float(r.column("write_sec")[0].as_py())
            _x2["reduce_sort_sum_sec"] = round(sort_s, 3)
            _x2["reduce_write_sum_sec"] = round(write_s, 3)
        for k, v in _x2.items():
            _phase_seconds[f"phase2_{k.removesuffix('_sec')}"] = v
    _mark("phase2_postings")

    # ---- phase 3: global stats -> index_meta.json (from manifests —
    # integer sums, no extra pass over data) ----
    meta_manifests = [m for m in load_manifests(paths.doc_meta)
                      if m.get("fingerprint") == fingerprint]
    N = sum(m.get("rows", 0) for m in meta_manifests)
    total_len = sum(m.get("total_len", 0) for m in meta_manifests)
    post_manifests = [m for m in load_manifests(paths.postings)
                      if m.get("fingerprint") == fingerprint]
    write_json_atomic({
        "N": N, "total_len": total_len,
        "avgdl": total_len / N if N else 1.0,
        "n_terms": sum(m.get("n_terms", 0) for m in post_manifests),
        "n_postings": sum(m.get("n_postings", 0) for m in post_manifests),
        "num_term_parts": config.num_term_parts,
        "num_doc_parts": config.num_doc_parts,
        "generation": 1,
        "doc_parts_used": config.num_doc_parts,
        # how docs/ maps doc_id -> partition: "part_bits" = key-hash ids
        # carry their partition in the high bits; "preassigned" = range
        # split by ids // span (fetch_docs must not bit-address these)
        "id_layout": "preassigned" if id_column is not None else "part_bits",
        # generation registry: which (config, source) fingerprints own
        # which doc-part ranges — add_documents appends, compact_index
        # trusts ONLY docs partitions whose manifest fingerprint is here
        "generations": [{"gen": 1, "base": 0, "fingerprint": fingerprint}],
        "doc_id_part_bits": config.doc_id_part_bits,
        "fingerprint": fingerprint,
        "build_phase_seconds": _phase_seconds,
        "config": {"analyzer": config.analyzer, "k1": config.k1, "b": config.b,
                   "min_df": config.min_df, "block_size": config.block_size,
                   "doc_bucket_size": config.doc_bucket_size,
                   "stemming": config.stemming,
                   "store_positions": config.store_positions,
                   "tie_break_column": config.tie_break_column,
                   "analyzer_fp": _analyzer_fingerprint(config)},
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
        tb = self.config.tie_break_column
        if tb:
            from searchengine_ray.stages.normalize import tie_break_int64

            if tb not in names:
                raise ValueError(f"tie_break_column {tb!r} missing from corpus")
            cols[tb] = tie_break_int64(group.column(tb))
        out = pa.table(cols)
        write_partition_atomic(out, Path(self.docs_dir) / f"part-{part:05d}.parquet",
                               kind="docs", partition=part,
                               fingerprint=self.fingerprint, row_group_size=8192)
        return pa.table({"partition": pa.array([part], pa.int64()),
                         "rows": pa.array([out.num_rows], pa.int64())})


def add_documents(source, out_root: str | Path,
                  config: IndexConfig | None = None,
                  source_tag: str | None = None) -> IndexPaths:
    """Incremental ingest: append a new GENERATION of documents to an
    existing index without rebuilding it.

    The new docs normalize into FRESH doc partitions (numbered above
    every earlier generation's), so their ids are strictly higher than
    all existing ids; each term-part reducer then reads its EXISTING
    merged partition, re-admits it as segment rows
    (``segments_from_existing``) and reruns the ordinary merge with the
    new generation's segments — postings stay docid-ascending by
    byte concat, doc_meta shards re-sort, the dictionary rewrites.
    Ingest cost scales with the NEW data (plus one rewrite of each
    touched partition), not the corpus.

    Constraints (by design, enforced/documented):
    - the config must match the base index (same analyzer/stemming/
      min_df/block layout — checked against ``index_meta.json``);
    - ``min_df`` must be 1: a term pruned in an earlier generation lost
      its segments and cannot be resurrected by a later one;
    - key dedup is per-generation (append-only corpora): re-ingesting
      an existing ``(repo, path, commit)`` yields a second doc id.
    - resume: rerunning the same ingest skips completed partitions
      (per-generation fingerprints); partitions without new segments
      are left untouched.
    """
    import pyarrow.parquet as _pqm

    from searchengine_ray.stages.exchange import run_partition_exchange, split_by_part
    from searchengine_ray.stages.postings import segments_from_existing
    from searchengine_ray.state.manifest import (completed_partitions,
                                                 load_manifests,
                                                 write_empty_partition_manifest,
                                                 write_json_atomic)

    config = config or IndexConfig()
    paths = IndexPaths(str(out_root))
    meta = paths.meta()
    if not meta:
        raise ValueError(f"no index at {out_root} — build_index first")
    if config.min_df != 1:
        raise ValueError("incremental ingest requires min_df == 1 "
                         "(pruned terms cannot recover earlier segments)")
    mc = meta.get("config", {})
    unrecorded = []
    for field_, got in (("analyzer", config.analyzer),
                        ("stemming", config.stemming),
                        ("min_df", config.min_df),
                        ("block_size", config.block_size),
                        ("doc_bucket_size", config.doc_bucket_size),
                        ("store_positions", config.store_positions),
                        ("tie_break_column", config.tie_break_column),
                        ("analyzer_fp", _analyzer_fingerprint(config))):
        if field_ not in mc:
            unrecorded.append(field_)
        elif mc[field_] != got:
            raise ValueError(f"config mismatch vs index: {field_}: "
                             f"index={mc[field_]} vs {got}")
    if unrecorded:
        # a legacy (pre-upgrade) meta can't prove these settings match;
        # silently passing would let a mismatched analyzer or positions
        # setting mix incompatible analyses across generations — the
        # exact failure the fingerprint exists to prevent
        import warnings

        warnings.warn(
            f"index meta at {out_root} does not record "
            f"{unrecorded}; incremental ingest is proceeding on the "
            f"UNVERIFIED assumption that the current config matches — "
            f"compact_index to upgrade the meta", stacklevel=2)
    if meta.get("num_term_parts") != config.num_term_parts:
        raise ValueError("num_term_parts must match the base index")

    if meta.get("num_doc_parts") != config.num_doc_parts:
        raise ValueError("num_doc_parts must match the base index")
    if ("doc_id_part_bits" in meta
            and meta["doc_id_part_bits"] != config.doc_id_part_bits):
        raise ValueError("doc_id_part_bits must match the base index — a "
                         "smaller value would break the strictly-higher-"
                         "doc-id invariant the posting merge relies on")
    P = config.num_doc_parts
    if not isinstance(source, (str, Path)):
        raise ValueError("add_documents takes a parquet file/dir source")
    files = _source_files(source)
    if "generations" not in meta:
        # pre-registry index: it was produced by exactly one build, so
        # its recorded fingerprint IS generation 1 — synthesize the
        # record rather than leaving gen 1 unregistered (compact_index
        # and the orphan check below both trust the registry)
        meta["generations"] = [{"gen": 1, "base": 0,
                                "fingerprint": meta.get("fingerprint")}]
    # generation identity = (config, source content) — NOT a call counter:
    # re-running a completed ingest is a NO-OP (a generation record is
    # written only at successful completion, and later ingests may have
    # re-stamped this generation's partition manifests, so a re-merge
    # would duplicate its postings); a CRASHED ingest has no record yet
    # and recomputes the same gen/base, resuming its own partitions.
    fingerprint = _config_fingerprint(config, source_tag
                                      or _source_tag(source, files))
    # migration: generations ingested before the tag format grew its
    # footer-tail hash are registered under the (name, size)-only tag —
    # re-running such a COMPLETED ingest must still resolve to "already
    # ingested", not silently re-ingest the corpus as a new generation
    legacy_fps = ([] if source_tag else
                  [_config_fingerprint(config, t)
                   for t in _legacy_source_tags(source, files)])
    gens = meta.get("generations", [])
    known = {meta.get("fingerprint")} | {g["fingerprint"] for g in gens}
    if fingerprint in known:
        return paths                       # this source is already ingested
    if any(fp in known for fp in legacy_fps):
        return paths                       # completed under a legacy tag — no-op
    if legacy_fps:
        # a CRASHED legacy-tag ingest of this source left partitions
        # stamped with the old fingerprint; adopt that identity so the
        # rerun resumes and completes the old ingest instead of
        # refusing it as an orphan (or duplicating it under the new tag)
        stamped = {m.get("fingerprint")
                   for d in (paths.docs, paths.postings, paths.doc_meta)
                   for m in load_manifests(d)}
        for fp in legacy_fps:
            if fp in stamped:
                fingerprint = fp
                break
    gen = int(meta.get("generation", 1)) + 1
    base = int(meta.get("doc_parts_used", config.num_doc_parts))

    # a DIFFERENT crashed ingest may have already merged its segments
    # into postings/doc_meta partitions (stamped with its fingerprint);
    # those merges cannot be rolled back, so starting another source
    # now would fuse two corpora into one id range. Refuse loudly.
    allowed_fps = ({meta.get("fingerprint"), fingerprint}
                   | {g["fingerprint"] for g in gens})
    orphans = {m.get("fingerprint")
               for d in (paths.postings, paths.doc_meta)
               for m in load_manifests(d)} - allowed_fps
    if orphans:
        raise RuntimeError(
            "index has partitions from an UNFINISHED ingest of a "
            "different source (fingerprints "
            f"{sorted(x[:8] for x in orphans if x)}): finish that ingest "
            "by re-running add_documents with ITS source, or rebuild via "
            "compact_index, before ingesting new sources")

    # ---- phase 1: normalize new docs -> docs/part-{base..base+P-1} ----
    new_parts = set(range(base, base + P))
    done1 = completed_partitions(paths.docs, fingerprint=fingerprint) & new_parts
    if len(done1) < P:
        writer = NormalizePartWriter(paths.docs, config, fingerprint)

        def _map_norm(path):
            from searchengine_ray.stages.normalize import sha256_column

            t = add_part_column(_pqm.read_table(path), P)
            rel = t.column("part")
            t = t.remove_column(t.column_names.index("part"))
            t = t.append_column("rel", rel)
            t = t.append_column(
                "part", pa.array(rel.to_numpy(zero_copy_only=False) + base,
                                 pa.int64()))
            t = t.append_column("sha256",
                                sha256_column(t.column("content").to_pylist()))
            return split_by_part(t, P, part_col="rel")

        def _reduce_norm(rel, tables):
            if not tables:
                return write_empty_partition_manifest(
                    paths.docs, kind="docs", partition=rel + base,
                    fingerprint=fingerprint)
            return writer(pa.concat_tables(tables))

        run_partition_exchange(files, P, _map_norm, _reduce_norm,
                               skip_parts={q - base for q in done1})

    # ---- phase 2: tokenize the new generation, merge into existing ----
    total_parts = config.num_term_parts + config.num_doc_parts
    done2 = (completed_partitions(paths.postings, fingerprint=fingerprint)
             | completed_partitions(paths.doc_meta, fingerprint=fingerprint))
    if len(done2) < total_parts:
        gen_parts = completed_partitions(paths.docs, fingerprint=fingerprint)
        doc_files = sorted(str(Path(paths.docs) / f"part-{q:05d}.parquet")
                           for q in gen_parts
                           if (Path(paths.docs) / f"part-{q:05d}.parquet").is_file())
        merger = MergePostingsPartWriter(paths.postings, paths.dictionary,
                                         config, fingerprint,
                                         doc_meta_dir=paths.doc_meta)
        bs = config.tokenize_batch_size
        jobs = _row_group_jobs(doc_files)

        def _map_postings(job):
            import pyarrow.parquet as _pq

            import searchengine_ray.stages.postings as _sp

            path, rg_lo, rg_hi = job
            t = _pq.ParquetFile(path).read_row_groups(
                list(range(rg_lo, rg_hi)), columns=["doc_id", "content"])
            pp = getattr(_sp, "_worker_pp", None)
            if pp is None or pp._fingerprint != fingerprint:
                pp = PartialPostings(config)
                pp._fingerprint = fingerprint
                _sp._worker_pp = pp
            outs = [pp(t.slice(i, bs)) for i in range(0, t.num_rows, bs)]
            seg = pa.concat_tables(outs) if outs else None
            if seg is None or seg.num_rows == 0:
                return [None] * total_parts
            return split_by_part(seg, total_parts)

        def _reduce_postings(part, tables):
            target = (paths.doc_meta if part >= config.num_term_parts
                      else paths.postings)
            kind = ("doc_meta" if part >= config.num_term_parts
                    else "postings")
            existing = Path(target) / f"part-{part:05d}.parquet"
            if not tables:
                if existing.is_file():
                    return None            # untouched: keep old file+manifest
                return write_empty_partition_manifest(
                    target, kind=kind, partition=part, fingerprint=fingerprint)
            if existing.is_file():
                old = _pqm.read_table(existing)
                if old.num_rows:
                    tables = [segments_from_existing(
                        part, old, config.num_term_parts)] + list(tables)
            return merger(pa.concat_tables(tables))

        run_partition_exchange(jobs, total_parts, _map_postings,
                               _reduce_postings, skip_parts=done2)

    # ---- phase 3: stats across ALL generations (mixed fingerprints:
    # untouched partitions keep their old manifest, which is correct
    # because the config is pinned identical above) ----
    meta_manifests = load_manifests(paths.doc_meta)
    N = sum(m.get("rows", 0) for m in meta_manifests)
    total_len = sum(m.get("total_len", 0) for m in meta_manifests)
    post_manifests = load_manifests(paths.postings)
    out = dict(meta)
    out.update({
        "N": N, "total_len": total_len,
        "avgdl": total_len / N if N else 1.0,
        "n_terms": sum(m.get("n_terms", 0) for m in post_manifests),
        "n_postings": sum(m.get("n_postings", 0) for m in post_manifests),
        "generation": max(gen, int(meta.get("generation", 1))),
        "doc_parts_used": max(base + P,
                              int(meta.get("doc_parts_used", P))),
        "fingerprint": fingerprint,
    })
    # the generation record is appended exactly once, at completion —
    # completed re-runs returned early above
    out["generations"] = gens + [{"gen": gen, "base": base,
                                  "fingerprint": fingerprint}]
    write_json_atomic(out, paths.meta_path)
    return paths


def delete_documents(out_root: str | Path, doc_ids) -> int:
    """Tombstone documents: they stop appearing in every query path
    (BM25, phrase, proximity) from the next searcher/actor construction
    on. Lucene-style semantics — postings are NOT rewritten, so corpus
    stats (N/avgdl/df) stay those of the full corpus until
    ``compact_index`` rebuilds without the dead docs. The tombstone
    list is a tiny sorted parquet at the index root, replaced
    atomically; repeated deletes union. Returns the total tombstone
    count."""
    import os

    import pyarrow.parquet as _pqm

    paths = IndexPaths(str(out_root))
    dead = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    dp = Path(paths.root) / "deletes.parquet"
    # single-node read-modify-write guard: concurrent deleters must not
    # lose each other's tombstones (atomic replace alone only prevents
    # torn files). Cross-NODE delete coordination is the caller's job —
    # document-level deletes are control-plane operations, not data-path.
    import fcntl

    lock_path = Path(paths.root) / ".deletes.lock"
    with open(lock_path, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if dp.is_file():
            old = _pqm.read_table(dp).column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            dead = np.unique(np.concatenate([old, dead]))
        tmp = dp.with_name(dp.name + f".tmp.{os.getpid()}")
        _pqm.write_table(pa.table({"doc_id": pa.array(dead, pa.int64())}), tmp)
        os.replace(tmp, dp)
    return int(len(dead))


def compact_index(out_root: str | Path, new_root: str | Path,
                  config: IndexConfig | None = None) -> IndexPaths:
    """Rebuild the index at ``new_root`` from the live documents only:
    drops tombstones, restores exact corpus stats (N/avgdl/df), and
    folds every generation into one. Doc ids are PRESERVED (the
    pre-assigned-id build path), so existing result references stay
    valid. The old index directory is left untouched."""
    import ray.data as _rd

    paths = IndexPaths(str(out_root))
    meta = paths.meta()
    mc = meta.get("config", {}) if meta else {}
    if config is None:
        # default the analyzer-relevant settings from the SOURCE index:
        # compacting is a pure fold of generations, and a bare
        # IndexConfig() on a stemmed/positions index would silently
        # rebuild with a different analyzer (the CLI hydrates from meta;
        # the library path must too). k1/b/tie_break_column ride along:
        # they change RANKING, not analysis, and a compact must not
        # silently alter either
        kw = {k: mc[k] for k in ("analyzer", "stemming", "min_df",
                                 "block_size", "doc_bucket_size",
                                 "store_positions", "k1", "b",
                                 "tie_break_column")
              if k in mc and mc[k] is not None}
        for k in ("num_term_parts", "num_doc_parts", "doc_id_part_bits"):
            if k in meta:
                kw[k] = meta[k]
        config = IndexConfig(**kw)
    elif ("analyzer_fp" in mc
            and mc["analyzer_fp"] != _analyzer_fingerprint(config)):
        raise ValueError(
            "compact_index config analyzes text differently from the "
            f"source index (analyzer_fp {mc['analyzer_fp']} vs "
            f"{_analyzer_fingerprint(config)}); pass a matching config "
            "or None to inherit the index's settings")
    # trust ONLY docs partitions whose manifest fingerprint belongs to a
    # COMPLETED generation (meta's registry) — a crashed ingest leaves
    # orphaned docs partitions the index never served, and a blind glob
    # would resurrect them into the compacted index
    from searchengine_ray.state.manifest import load_manifests

    if "generations" in meta:
        allowed = {meta.get("fingerprint")}
        allowed |= {g["fingerprint"] for g in meta["generations"]}
        manifests = [m for m in load_manifests(paths.docs)
                     if m.get("fingerprint") in allowed]
    else:
        # pre-registry index (older meta): the base build's fingerprint
        # was overwritten by later ingests, so the registry filter would
        # silently DROP generation 1 — accept every manifest-backed
        # partition instead (still no blind glob of orphan files)
        manifests = load_manifests(paths.docs)
    by_part = {m["partition"]: m for m in manifests}
    doc_files = sorted(
        str(Path(paths.docs) / f"part-{q:05d}.parquet")
        for q, m in by_part.items() if m.get("rows", 0) > 0
        and (Path(paths.docs) / f"part-{q:05d}.parquet").is_file())
    if not doc_files:
        raise ValueError(f"no completed docs partitions under {paths.docs}")
    ds = _rd.read_parquet(doc_files)
    dp = Path(paths.root) / "deletes.parquet"
    if dp.is_file():
        import pyarrow.parquet as _pqm

        dead = _pqm.read_table(dp).column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        dead.sort()

        def drop(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(ids, dead)))

        ds = ds.map_batches(drop, batch_format="pyarrow")

    def strip(batch: pa.Table) -> pa.Table:
        keep = [c for c in batch.column_names if c != "sha256"]
        return batch.select(keep)

    ds = ds.map_batches(strip, batch_format="pyarrow")
    return build_index(ds, new_root, config, id_column="doc_id",
                       source_tag=f"compact:{paths.root}")


def merge_indexes(a_root: str | Path, b_root: str | Path,
                  out_root: str | Path) -> IndexPaths:
    """Merge two INDEPENDENTLY BUILT indexes into one without
    re-tokenizing anything — the Lucene segment-merge capability beside
    ``add_documents`` (which re-tokenizes a new corpus) and
    ``compact_index`` (which rebuilds from stored text).

    B's doc ids shift by a constant ``C = A.doc_parts_used <<
    doc_id_part_bits`` (its doc partitions renumber above A's), which
    preserves every within-block delta: only block heads and the
    last_docs metadata rewrite (``shifted_segments``), while tf and
    positions streams are reused byte-for-byte. Each output term
    partition is then the ORDINARY merge of A's partition (re-admitted
    first, ``first_doc = -1``) with B's shifted rows — postings stay
    docid-ascending by byte concat because every shifted id exceeds
    every A id. Global stats (df, N, avgdl) come out exact, so the
    merged index scores bit-identically to one built over the union.

    Scale shape: one task per output partition (term parts + both
    sides' doc/docs parts), zero shuffle — every task reads exactly the
    partition files it merges (partition-aligned by construction since
    both indexes share num_term_parts). Resumable per partition via
    the usual manifests.

    Constraints (same family as ``add_documents``): identical analyzer
    fingerprint / layout config on both sides, min_df == 1, and no
    pending tombstones (compact first — a merge must not silently
    resurrect deleted docs into a fresh index)."""
    import hashlib

    import pyarrow.parquet as _pqm
    import ray

    from searchengine_ray.stages.postings import (MergePostingsPartWriter,
                                                  segments_from_existing,
                                                  shifted_segments)
    from searchengine_ray.state.manifest import (completed_partitions,
                                                 load_manifests,
                                                 write_empty_partition_manifest,
                                                 write_json_atomic,
                                                 write_partition_atomic)

    pa_, pb_ = IndexPaths(str(a_root)), IndexPaths(str(b_root))
    out = IndexPaths(str(out_root))
    meta_a, meta_b = pa_.meta(), pb_.meta()
    if not meta_a or not meta_b:
        raise ValueError("both inputs must be built indexes with meta")
    for root in (pa_.root, pb_.root):
        if (Path(root) / "deletes.parquet").is_file():
            raise ValueError(f"{root} has pending tombstones — "
                             "compact_index it before merging")
    ca, cb = meta_a.get("config", {}), meta_b.get("config", {})
    for f in ("analyzer_fp", "analyzer", "stemming", "min_df", "block_size",
              "doc_bucket_size", "store_positions", "tie_break_column"):
        if ca.get(f) != cb.get(f):
            raise ValueError(f"config mismatch: {f}: {ca.get(f)} vs {cb.get(f)}")
    if ca.get("min_df", 1) != 1:
        raise ValueError("merge requires min_df == 1 (pruned terms lost "
                         "their segments; df cannot be re-derived)")
    for f in ("num_term_parts", "doc_id_part_bits"):
        if meta_a.get(f) != meta_b.get(f):
            raise ValueError(f"{f} must match: {meta_a.get(f)} vs {meta_b.get(f)}")
    T = int(meta_a["num_term_parts"])
    bits = int(meta_a["doc_id_part_bits"])
    base = int(meta_a.get("doc_parts_used", meta_a["num_doc_parts"]))
    b_parts = int(meta_b.get("doc_parts_used", meta_b["num_doc_parts"]))
    C = base << bits
    bucket_size = int(ca.get("doc_bucket_size", 1 << 22))
    if C % bucket_size:
        raise ValueError("doc shift is not bucket-aligned: doc_bucket_size "
                         "must divide doc_parts_used << doc_id_part_bits")
    bucket_shift = C // bucket_size
    block_size = int(ca.get("block_size", 128))
    cfg_kw = {k: ca[k] for k in ("analyzer", "stemming", "min_df",
                                 "block_size", "doc_bucket_size",
                                 "store_positions", "k1", "b",
                                 "tie_break_column")
              if k in ca and ca[k] is not None}
    config = IndexConfig(num_term_parts=T,
                         num_doc_parts=int(meta_a["num_doc_parts"]),
                         doc_id_part_bits=bits, **cfg_kw)
    fingerprint = hashlib.blake2b(
        f"merge|{meta_a.get('fingerprint')}|{meta_b.get('fingerprint')}"
        .encode(), digest_size=16).hexdigest()

    def _shard(d: str | Path, q: int) -> Path:
        return Path(d) / f"part-{q:05d}.parquet"

    @ray.remote
    def merge_term_part(k: int) -> None:
        tables = []
        fa = _shard(pa_.postings, k)
        if fa.is_file():
            old = _pqm.read_table(fa)
            if old.num_rows:
                tables.append(segments_from_existing(k, old, T))
        fb = _shard(pb_.postings, k)
        if fb.is_file():
            nb = _pqm.read_table(fb)
            if nb.num_rows:
                tables.append(shifted_segments(k, nb, C, bucket_shift,
                                               block_size))
        if not tables:
            write_empty_partition_manifest(out.postings, kind="postings",
                                           partition=k, fingerprint=fingerprint)
            return
        merger = MergePostingsPartWriter(out.postings, out.dictionary,
                                         config, fingerprint)
        merger(pa.concat_tables(tables))

    @ray.remote
    def copy_docs(q_src: int, q_out: int, shift: int) -> None:
        f = _shard(pb_.docs if shift else pa_.docs, q_src)
        if not f.is_file():
            write_empty_partition_manifest(out.docs, kind="docs",
                                           partition=q_out,
                                           fingerprint=fingerprint)
            return
        t = _pqm.read_table(f)
        if shift:
            ids = t.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64) + shift
            t = t.set_column(t.column_names.index("doc_id"), "doc_id",
                             pa.array(ids, pa.int64()))
        write_partition_atomic(t, _shard(out.docs, q_out), kind="docs",
                               partition=q_out, fingerprint=fingerprint,
                               row_group_size=8192)

    @ray.remote
    def merge_doc_meta(q: int) -> None:
        # doc_meta shards are per REL part (fixed T..T+P-1 files that
        # grow with generations — the add_documents layout): fold B's
        # shifted shard into A's, id-sorted
        parts = []
        fa = _shard(pa_.doc_meta, T + q)
        if fa.is_file():
            parts.append(_pqm.read_table(fa))
        fb = _shard(pb_.doc_meta, T + q)
        if fb.is_file():
            t = _pqm.read_table(fb)
            ids = t.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64) + C
            parts.append(t.set_column(t.column_names.index("doc_id"),
                                      "doc_id", pa.array(ids, pa.int64())))
        if not parts:
            write_empty_partition_manifest(out.doc_meta, kind="doc_meta",
                                           partition=T + q,
                                           fingerprint=fingerprint)
            return
        t = pa.concat_tables(parts).combine_chunks()
        order = np.argsort(t.column("doc_id").to_numpy(
            zero_copy_only=False), kind="stable")
        t = t.take(pa.array(order))
        total_len = int(t.column("doc_len").to_numpy(
            zero_copy_only=False).astype(np.int64).sum())
        write_partition_atomic(t, _shard(out.doc_meta, T + q),
                               kind="doc_meta", partition=T + q,
                               fingerprint=fingerprint,
                               extra={"total_len": total_len})

    P = int(meta_a["num_doc_parts"])
    jobs = []
    done_p = completed_partitions(out.postings, fingerprint=fingerprint)
    for k in range(T):
        if k not in done_p:
            jobs.append(merge_term_part.remote(k))
    done_d = completed_partitions(out.docs, fingerprint=fingerprint)
    done_m = completed_partitions(out.doc_meta, fingerprint=fingerprint)
    for q in range(base):
        if q not in done_d:
            jobs.append(copy_docs.remote(q, q, 0))
    for q in range(b_parts):
        if (base + q) not in done_d:
            jobs.append(copy_docs.remote(q, base + q, C))
    for q in range(P):
        if (T + q) not in done_m:
            jobs.append(merge_doc_meta.remote(q))
    ray.get(jobs)

    meta_manifests = load_manifests(out.doc_meta)
    post_manifests = load_manifests(out.postings)
    N = sum(m.get("rows", 0) for m in meta_manifests)
    total_len = sum(m.get("total_len", 0) for m in meta_manifests)
    merged = dict(meta_a)
    merged.update({
        "N": N, "total_len": total_len,
        "avgdl": total_len / N if N else 1.0,
        "n_terms": sum(m.get("n_terms", 0) for m in post_manifests),
        "n_postings": sum(m.get("n_postings", 0) for m in post_manifests),
        "generation": 2,
        "doc_parts_used": base + b_parts,
        "fingerprint": fingerprint,
        "generations": [
            {"gen": 1, "base": 0, "fingerprint": meta_a.get("fingerprint")},
            {"gen": 2, "base": base,
             "fingerprint": meta_b.get("fingerprint")}],
    })
    write_json_atomic(merged, out.meta_path)
    return out
