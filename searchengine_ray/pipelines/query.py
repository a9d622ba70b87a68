"""Query engine: BM25 top-k over the compressed index.

The Ray-native replacement of the reference query path
(``/root/reference/searcher.py`` + ``ranker.py``):

- ``IndexSearcher`` — the stateful core. Loads the dictionary and doc
  lengths once, then lazily loads/caches posting partitions (the
  scalable analog of the searcher's LRU-of-1 posting-file cache,
  ``searcher.py:25-26,65-67``). Partition pruning: a query only touches
  ``postings/part-<hash(term)>`` files, and within a part only the
  matched term rows (parquet filter pushdown on the sorted ``term``
  column).
- scoring methods:
    * ``"vectorized"`` (default): decode all matched postings, score
      every candidate with numpy, accumulating per doc in ascending
      term order (canonical float order -> bit-identical to the
      oracle).
    * ``"bmw"``: vectorized block-max pruning (Ding & Suel 2011's
      block upper bounds, applied segment-wise instead of a per-doc
      Python loop): exact-scores only doc ranges whose summed block
      UBs can beat a k-th-score lower bound. Tested rank-identical.
      Measured on the bench index: 15x vectorized on selective
      (rare+hot) queries, ~0.65x on stop-word-only queries (uniform
      synthetic docs make block maxima uninformative — nothing prunes,
      and the segment bookkeeping is pure overhead). ``"impact"``
      remains the production default: posting-granular impact ordering
      strictly dominates block-granular pruning on both profiles.
- ``QueryExecutorStage`` — the actor-pool ``map_batches`` wrapper
  (stateful stage T3/T4 of SURVEY §2.3): index loaded once per actor in
  ``__init__``, batches of queries scored in ``__call__``.

Scale note: doc lengths are held as (sorted doc_id array, len array)
and probed with searchsorted. At 10^12 docs this table would be
sharded with the postings (doc-bucket-aligned) instead of loaded whole;
the lookup API is already bucket-local so only the loader changes.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from searchengine_ray.bm25 import bm25_term_scores, idf as bm25_idf, top_k_indices
from searchengine_ray.codec import PostingBlocks
from searchengine_ray.config import IndexConfig
from searchengine_ray.pipelines.build import IndexPaths
from searchengine_ray.stages.postings import term_part
from searchengine_ray.tokenizer import Analyzer

RESULTS_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("rank", pa.int32()),
    ("doc_id", pa.int64()), ("score", pa.float64()),
])

# Dirichlet smoothing parameter for the LM query-likelihood scorer
# (Zhai & Lafferty 2001; the value Lucene's LMDirichletSimilarity
# defaults to as well).
LM_MU = 2000.0


def _flat_list(col) -> tuple[np.ndarray, np.ndarray]:
    """(values, row offsets) of a large_list column — zero-copy flatten."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vals = arr.flatten().to_numpy(zero_copy_only=False)
    lens = arr.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return vals, offs


def _flat_bin(col) -> tuple[np.ndarray, np.ndarray]:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                         count=len(arr) + 1, offset=arr.offset * 8).copy()
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(offs[-1]))[offs[0]:]
    return data, offs - offs[0]


def term_hash64(term: str) -> int:
    """Full 64-bit term hash; ``term_part`` == this value mod num_parts."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(term.encode("utf-8"), digest_size=8).digest(), "big")


class PartData:
    """One posting partition flattened to plain numpy arrays — cheap to
    load (no per-row python beyond term hashing), plasma-friendly
    (``ray.put`` ships the arrays zero-copy to every query actor; actor
    init is microseconds because there are no dicts to unpickle).

    Term lookup is by sorted 64-bit blake2b hash (same hash that chose
    the partition). A cross-term collision within a part would merge two
    posting lists; at 2^64 that needs ~10^9 distinct terms per part to
    reach odds of 1e-2 — and the oracle-parity test would catch it.
    """

    __slots__ = ("hashes", "buckets", "dfs", "counts", "blk_offs",
                 "last_docs", "max_tfs", "doc_sizes", "tf_sizes",
                 "doc_data", "doc_offs", "tf_data", "tf_offs",
                 "pos_sizes", "pos_data", "pos_offs", "has_positions")

    def __init__(self, tbl: pa.Table):
        tbl = tbl.combine_chunks()
        if "term_hash" in tbl.column_names:
            hashes = tbl.column("term_hash").to_numpy(zero_copy_only=False)
        else:   # pre-v3 index: hash the dictionary on load
            terms = tbl.column("term").to_pylist()
            hashes = np.fromiter((term_hash64(t) for t in terms),
                                 dtype=np.uint64, count=len(terms))
        buckets = tbl.column("bucket").to_numpy(zero_copy_only=False)
        order = np.lexsort((buckets, hashes))
        tbl = tbl.take(pa.array(order)).combine_chunks()
        self.hashes = hashes[order]
        self.buckets = buckets[order].astype(np.int64)
        self.dfs = tbl.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        self.counts, self.blk_offs = _flat_list(tbl.column("counts"))
        self.counts = self.counts.astype(np.int32, copy=False)
        self.last_docs, _ = _flat_list(tbl.column("last_docs"))
        self.max_tfs, _ = _flat_list(tbl.column("max_tfs"))
        self.doc_sizes, _ = _flat_list(tbl.column("doc_sizes"))
        self.tf_sizes, _ = _flat_list(tbl.column("tf_sizes"))
        self.doc_data, self.doc_offs = _flat_bin(tbl.column("doc_bytes"))
        self.tf_data, self.tf_offs = _flat_bin(tbl.column("tf_bytes"))
        self.has_positions = False
        self.pos_sizes = self.pos_data = self.pos_offs = None
        if "pos_bytes" in tbl.column_names:     # layout v4+
            self.pos_sizes, _ = _flat_list(tbl.column("pos_sizes"))
            self.pos_data, self.pos_offs = _flat_bin(tbl.column("pos_bytes"))
            self.has_positions = self.pos_data.size > 0

    def row_range(self, h: int) -> tuple[int, int]:
        h = np.uint64(h)
        return (int(np.searchsorted(self.hashes, h, side="left")),
                int(np.searchsorted(self.hashes, h, side="right")))

    def df_of(self, h: int) -> int:
        lo, hi = self.row_range(h)
        return int(self.dfs[lo:hi].sum()) if hi > lo else 0

    def blocks_for_hash(self, h: int) -> list[PostingBlocks]:
        lo, hi = self.row_range(h)
        out = []
        for i in range(lo, hi):                # rows already bucket-ascending
            b0, b1 = self.blk_offs[i], self.blk_offs[i + 1]
            dsz = self.doc_sizes[b0:b1]
            tsz = self.tf_sizes[b0:b1]
            doc_offsets = np.zeros(len(dsz) + 1, dtype=np.int64)
            tf_offsets = np.zeros(len(tsz) + 1, dtype=np.int64)
            np.cumsum(dsz, out=doc_offsets[1:])
            np.cumsum(tsz, out=tf_offsets[1:])
            pos_bytes = pos_offsets = None
            if self.has_positions:
                psz = self.pos_sizes[b0:b1]
                pos_offsets = np.zeros(len(psz) + 1, dtype=np.int64)
                np.cumsum(psz, out=pos_offsets[1:])
                pos_bytes = self.pos_data[self.pos_offs[i]:self.pos_offs[i + 1]]
            out.append(PostingBlocks(
                self.doc_data[self.doc_offs[i]:self.doc_offs[i + 1]],
                self.tf_data[self.tf_offs[i]:self.tf_offs[i + 1]],
                self.counts[b0:b1],
                self.last_docs[b0:b1].astype(np.int64, copy=False),
                self.max_tfs[b0:b1].astype(np.int32, copy=False),
                doc_offsets, tf_offsets, pos_bytes, pos_offsets))
        return out


class _DocPos:
    """doc_id -> row position in the sorted doc-length table.

    For the gapped-dense ``part_bits`` id layout (id = part << bits |
    rank, ranks dense per part — ``stages/normalize.py``), positions are
    pure ARITHMETIC: part-base offset + rank, verified with one gather
    (``dl_ids[pos] == docs``) — ~2 memory ops per posting instead of a
    ~21-probe binary search over the whole doc table. This lookup runs
    once per posting during the hot-term precompute, so it dominates
    spin-up; any mismatch (foreign layout, sparse ranks) falls back to
    searchsorted, which is always correct."""

    def __init__(self, dl_ids: np.ndarray, meta: dict):
        self.dl_ids = dl_ids
        self.bits = 0
        if (meta.get("id_layout") == "part_bits"
                and int(meta.get("doc_id_part_bits", 0)) and len(dl_ids)):
            bits = int(meta["doc_id_part_bits"])
            parts = (dl_ids >> bits).astype(np.int64)
            change = np.empty(len(parts), dtype=bool)
            change[0] = True
            change[1:] = parts[1:] != parts[:-1]
            starts = np.flatnonzero(change)
            pids = parts[starts]
            base = np.full(int(pids.max()) + 1, -1, dtype=np.int64)
            mask = (np.int64(1) << bits) - 1
            base[pids] = starts - (dl_ids[starts] & mask)
            self.bits, self.mask, self.base = bits, mask, base

    def __call__(self, docs: np.ndarray) -> np.ndarray:
        if self.bits:
            p = docs >> self.bits
            ok = (p >= 0) & (p < len(self.base))
            b = self.base[np.where(ok, p, 0)]
            pos = b + (docs & self.mask)
            ok &= (b >= 0) & (pos >= 0) & (pos < len(self.dl_ids))
            if ok.all():
                pos = pos.astype(np.int64, copy=False)
                if np.array_equal(self.dl_ids[pos], docs):
                    return pos
        return np.searchsorted(self.dl_ids, docs)


def _precompute_hot_terms(part: PartData, dl_ids: np.ndarray, dl: np.ndarray,
                          N: int, avgdl: float, k1: float, b: float,
                          postings_budget: int, doc_pos=None) -> dict:
    """Decode + score + impact-order this part's heaviest terms, largest
    df first, until ``postings_budget`` postings are spent. Returns
    hash -> (pos, contrib, iorder).

    Hot terms are exactly the ones every query actor would otherwise
    decode cold for itself (hundreds of ms each at millions of
    postings); precomputing the heavy tail once into the plasma-shared
    image makes actor warm-up near-free while keeping the image size
    bounded (~24 bytes/posting: int32 positions, float64 contribs —
    contribs stay float64 so shared-path scores are bit-identical to
    the exhaustive oracle path).

    Why generous budgets win: the head of the Zipf curve is tiny in
    terms but huge in postings (measured on the bench corpus: terms
    with df >= 1024 are 0.2% of the vocabulary but 96% of all
    postings). Decoding them per-actor is duplicated, memory-bandwidth
    -bound work that ANTI-scales with pool size (measured 2.9 s with 1
    actor -> 25 s with 16 actors for the same 40 warm-up queries),
    while this precompute runs once, in parallel over part-load tasks,
    and scales WITH cpus.

    The impact order ships MATERIALIZED as (ipos, icontrib) — shipping
    only an iorder permutation and gathering per actor was measured to
    re-create the duplicated memory-bound warm-up this image exists to
    kill (warm-up 1.5 s -> 58 s at 16 actors), so the extra 12
    bytes/posting of plasma is the right trade.

    Budget semantics at scale: the loop stops AFTER the term that
    crosses the budget, so each part overshoots by at most one term —
    and when single head terms exceed the per-part budget, the head
    drives the image size, not the knob (measured at sf1/20M docs: a
    256M-posting budget yields a ~740M-posting / 17.8 GB image because
    per-part budget is 2.7M postings while head terms hold 5-10M).
    That is intentional: the head terms are precisely the ones whose
    per-actor cold decode anti-scales; the budget bounds the TAIL.
    Size the budget to the node's plasma store, and expect
    ~24 B x max(budget, sum of per-part heaviest-term dfs) of image."""
    from searchengine_ray.codec import concat_blocks, decode_blocks

    out: dict = {}
    if len(part.hashes) == 0 or postings_budget <= 0:
        return out
    if doc_pos is None:
        doc_pos = _DocPos(dl_ids, {})
    change = np.empty(len(part.hashes), dtype=bool)
    change[0] = True
    change[1:] = part.hashes[1:] != part.hashes[:-1]
    starts = np.flatnonzero(change)
    dfs_per_term = np.add.reduceat(part.dfs, starts)
    spent = 0
    for i in np.argsort(-dfs_per_term, kind="stable"):
        df = int(dfs_per_term[i])
        if df < 1024 or spent >= postings_budget:
            break           # heaviest-first; overshoot by at most one term
        spent += df
        h = int(part.hashes[starts[i]])
        docs, tfs = decode_blocks(concat_blocks(part.blocks_for_hash(h)))
        pos = doc_pos(docs)
        idf_t = float(bm25_idf(N, df))
        contrib = bm25_term_scores(tfs, dl[pos], idf_t=idf_t, avgdl=avgdl,
                                   k1=k1, b=b)
        iorder = np.argsort(-contrib, kind="stable")
        # positions index the per-node doc table: int32 halves the
        # shared image's index-array footprint (guarded for >2^31 docs)
        if len(dl_ids) < 2**31:
            pos = pos.astype(np.int32)
        out[h] = (pos, contrib, pos[iorder], contrib[iorder])
    return out


_HOT_CACHE_VERSION = 1


def _hot_cache_key(part_file: Path, N: int, avgdl: float, k1: float,
                   b: float, budget: int) -> str | None:
    """Content key for a part's persisted hot image.

    Derived from the part's write manifest (build fingerprint + exact
    content counts/bytes — any rebuild that changes the part's bytes
    changes the key) plus every scoring input the precompute depends on
    (N, avgdl, k1, b and the postings budget). ``None`` when the
    manifest is missing: no safe key means no caching."""
    mf = part_file.with_name(part_file.stem + ".manifest.json")
    try:
        man = json.loads(mf.read_text())
    except (OSError, ValueError):
        return None
    return json.dumps([_HOT_CACHE_VERSION, man.get("fingerprint"),
                       man.get("rows"), man.get("bytes"),
                       man.get("n_postings"), man.get("n_terms"),
                       int(N), float(avgdl), float(k1), float(b),
                       int(budget)])


def _hot_slabs_from_dict(hot: dict) -> tuple:
    """Flatten a hash -> (pos, contrib, ipos, icontrib) dict into six
    flat slabs (hashes, offsets, pos, contrib, ipos, icontrib).

    Slabs are the SHIPPING format: one plasma buffer per slab instead
    of four per term means ~7 object-store buffers per part instead of
    ~100, so every query actor's zero-copy attach unpickles thousands
    fewer headers (the measured 'actors' spin-up component)."""
    items = sorted(hot.items())
    hashes = np.array([h for h, _ in items], dtype=np.uint64)
    lens = np.array([len(v[0]) for _, v in items], dtype=np.int64)
    offs = np.zeros(len(items) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])

    def cat(idx, empty_dtype):
        return (np.concatenate([v[idx] for _, v in items]) if items
                else np.array([], dtype=empty_dtype))

    return (hashes, offs, cat(0, np.int32), cat(1, np.float64),
            cat(2, np.int32), cat(3, np.float64))


def _hot_dict_from_slabs(slabs: tuple) -> dict:
    """Per-term zero-copy views over the slabs — consumer-side only."""
    hashes, offs, pos, contrib, ipos, icontrib = slabs
    out = {}
    for i in range(len(hashes)):
        lo, hi = offs[i], offs[i + 1]
        out[int(hashes[i])] = (pos[lo:hi], contrib[lo:hi],
                               ipos[lo:hi], icontrib[lo:hi])
    return out


def _hot_cache_read(cache_file: Path, key: str) -> tuple | None:
    """mmap a persisted hot image into slabs; ``None`` on any
    mismatch/corruption.

    Arrays are zero-copy views into the memory map (Arrow buffers keep
    the map alive); they are read-only, exactly like the plasma-shared
    arrays every consumer already handles."""
    try:
        source = pa.memory_map(str(cache_file))
        t = pa.ipc.open_file(source).read_all()
        md = t.schema.metadata or {}
        if md.get(b"hot_cache_key", b"").decode() != key:
            return None
        if t.num_rows == 0:
            # an empty hot image (tiny index / budget 0) is a valid
            # cache hit — without this, every serve of such an index
            # recomputes and rewrites forever
            return _hot_slabs_from_dict({})
        hashes = t.column("hash").to_numpy(zero_copy_only=False)
        slabs, offs = [], np.zeros(1, dtype=np.int64)
        for c in ("pos", "contrib", "ipos", "icontrib"):
            arr = t.column(c).combine_chunks()
            offs = arr.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False)
            slabs.append(arr.values.to_numpy(zero_copy_only=False))
        return (hashes, offs, *slabs)
    except (OSError, KeyError, IndexError, pa.ArrowInvalid,
            pa.ArrowIOError):
        return None


def _hot_cache_write(cache_file: Path, key: str, slabs: tuple) -> None:
    """Persist a part's hot image atomically (tmp + rename); best-effort
    — a read-only index directory just means every serve recomputes."""
    import os

    tmp = None
    try:
        hashes, offs, pos, contrib, ipos, icontrib = slabs
        offs_arr = pa.array(offs, pa.int64())

        def col(vals):
            return pa.LargeListArray.from_arrays(offs_arr, pa.array(vals))

        t = pa.table({
            "hash": pa.array(hashes), "pos": col(pos),
            "contrib": col(contrib), "ipos": col(ipos),
            "icontrib": col(icontrib),
        }).replace_schema_metadata({b"hot_cache_key": key.encode()})
        cache_file.parent.mkdir(parents=True, exist_ok=True)
        tmp = cache_file.with_name(f"{cache_file.name}.tmp-{os.getpid()}")
        with pa.OSFile(str(tmp), "wb") as f:
            with pa.ipc.new_file(f, t.schema) as w:
                w.write_table(t)
        tmp.rename(cache_file)
    except OSError:
        if tmp is not None and tmp.exists():
            try:
                tmp.unlink()
            except OSError:
                pass


def _hot_cache_file(part_file: Path) -> Path:
    return part_file.parent.parent / "hot_cache" / (part_file.stem + ".arrow")


def _hot_slabs_for_part_deferred(part_file: Path, pd_: PartData, dl_ids, dl,
                                 meta: dict, N: int, avgdl: float, k1: float,
                                 b: float, budget: int,
                                 use_cache: bool = True
                                 ) -> tuple[tuple, str | None]:
    """Hot-image slabs for one part WITHOUT the persist step: returns
    (slabs, pending_key). pending_key is non-None exactly when the
    slabs were computed fresh and still need `_hot_cache_write` — the
    caller decides whether to write inline (serial path) or hand it to
    a write-behind task off the first-serve critical path.

    The precompute is DRAM-bound (decode + gather + argsort: measured
    47 core-s single-threaded but 184 core-s at 32-way parallelism on
    the bench index — memory bandwidth, not ALU), so re-serves replace
    it with a sequential ~24 B/posting read keyed on the part manifest."""
    if budget <= 0:
        return _hot_slabs_from_dict({}), None
    key = _hot_cache_key(part_file, N, avgdl, k1, b, budget) if use_cache else None
    if key is not None:
        slabs = _hot_cache_read(_hot_cache_file(part_file), key)
        if slabs is not None:
            return slabs, None
    slabs = _hot_slabs_from_dict(_precompute_hot_terms(
        pd_, dl_ids, dl, N, avgdl, k1, b, budget,
        doc_pos=_DocPos(dl_ids, meta)))
    return slabs, key


def _hot_slabs_for_part(part_file: Path, pd_: PartData, dl_ids, dl,
                        meta: dict, N: int, avgdl: float, k1: float,
                        b: float, budget: int, use_cache: bool = True
                        ) -> tuple:
    """Hot-image slabs for one part: persisted-cache hit, else compute
    + save inline (the serial / non-Ray path)."""
    slabs, key = _hot_slabs_for_part_deferred(
        part_file, pd_, dl_ids, dl, meta, N, avgdl, k1, b, budget,
        use_cache=use_cache)
    if key is not None:
        _hot_cache_write(_hot_cache_file(part_file), key, slabs)
    return slabs


def _load_doc_meta(paths: IndexPaths):
    """(meta dict, sorted doc_id array, doc_len array, N, avgdl, k1, b)."""
    meta = json.loads(Path(paths.meta_path).read_text())
    meta_tbl = pq.read_table(sorted(Path(paths.doc_meta).glob("*.parquet")),
                             columns=["doc_id", "doc_len"])
    ids = meta_tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    lens = meta_tbl.column("doc_len").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    c = meta.get("config", {})
    return (meta, ids[order], lens[order], int(meta["N"]),
            float(meta["avgdl"]), float(c.get("k1", 1.2)),
            float(c.get("b", 0.75)))


def load_index_shared(paths: IndexPaths | str, *, precompute_hot: bool = True,
                      hot_postings_budget: int = 256_000_000,
                      hot_cache: bool = True) -> dict:
    """Driver-light parallel index load.

    Part tables + hot-term precompute are produced BY Ray tasks and stay
    in plasma as the tasks' return objects — exactly ONE copy of every
    big array in the object store, never materialized on the driver
    heap, never re-``ray.put`` (the old path built the whole multi-GB
    image on the driver, then serialized it a second time into plasma).

    Returns a small dict (json meta + ``ObjectRef``s). Ship it to each
    query actor verbatim (nested refs inside containers are NOT
    auto-resolved by Ray) and call ``assemble_index_data`` there — the
    actor unpickles only array headers; data pages stay shared.
    """
    import ray

    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(str(paths))
    meta = json.loads(Path(paths.meta_path).read_text())
    c = meta.get("config", {})
    N, avgdl = int(meta["N"]), float(meta["avgdl"])
    k1, b = float(c.get("k1", 1.2)), float(c.get("b", 0.75))
    part_files = sorted(Path(paths.postings).glob("part-*.parquet"))
    per_part_budget = (hot_postings_budget // max(1, len(part_files))
                       if precompute_hot else 0)
    root = paths.root

    # the doc-length table loads in a TASK (sorted-array build over N
    # rows was the one serial driver step left in spin-up); its two
    # returns land once in the object store and arrive at the part-load
    # tasks as ARGS (auto-dereferenced, zero-copy) — capturing arrays
    # in the task closure would re-ship them with every task spec
    @ray.remote(num_returns=2)
    def _load_dl(r):
        _, dl_ids, dl, *_ = _load_doc_meta(IndexPaths(r))
        return dl_ids, dl

    dl_ids_ref, dl_ref = _load_dl.remote(str(root))

    @ray.remote
    def _load(f, _dl_ids, _dl):
        from searchengine_ray.stages.postings import part_id_of

        pd_ = PartData(pq.read_table(f))
        slabs, pending_key = _hot_slabs_for_part_deferred(
            Path(f), pd_, _dl_ids, _dl, meta, N, avgdl, k1, b,
            per_part_budget, use_cache=hot_cache)
        return part_id_of(f), pd_, slabs, pending_key

    part_refs = [_load.remote(str(f), dl_ids_ref, dl_ref)
                 for f in part_files]

    # WRITE-BEHIND persist: first serve returns as soon as the hot
    # image is computed; saving it for the next serve's mmap fast-path
    # happens in num_cpus=0 tasks (pure disk I/O on a plasma borrow of
    # the already-loaded tuple) that overlap actor attach + warm-up +
    # serving instead of sitting on the spin-up critical path (r4:
    # first-serve 38.9 s of which ~half was this persist). Atomic
    # tmp+rename keeps a killed writer from ever corrupting the cache.
    @ray.remote(num_cpus=0)
    def _persist(f, loaded):
        _part, _pd, slabs, pending_key = loaded
        if pending_key is None:
            return False
        _hot_cache_write(_hot_cache_file(Path(f)), pending_key, slabs)
        return True

    persist_refs = ([_persist.remote(str(f), r)
                     for f, r in zip(part_files, part_refs)]
                    if hot_cache else [])

    return {"meta": meta, "dl_ids_ref": dl_ids_ref, "dl_ref": dl_ref,
            "part_refs": part_refs, "persist_refs": persist_refs}


def assemble_index_data(shared: dict) -> dict:
    """Materialize a searcher-ready view from ``load_index_shared``'s
    refs — numpy arrays are zero-copy views onto the shared plasma
    objects, so per-consumer cost is header unpickling only."""
    import ray

    parts: dict[int, PartData] = {}
    hot: dict = {}
    for p, pd_, slabs, _pending in ray.get(shared["part_refs"]):
        parts[p] = pd_
        hot.update(_hot_dict_from_slabs(slabs))
    return {"meta": shared["meta"], "dl_ids": ray.get(shared["dl_ids_ref"]),
            "dl": ray.get(shared["dl_ref"]), "parts": parts, "hot": hot}


def load_index_data(paths: IndexPaths | str, *, precompute_hot: bool = True,
                    hot_postings_budget: int = 256_000_000) -> dict:
    """Load the whole index into a flat, shareable structure.

    With Ray initialized this delegates to ``load_index_shared`` +
    ``assemble_index_data`` (parallel part loads, single plasma copy);
    otherwise it loads serially in-process. Hot terms additionally
    carry shared precomputed score/impact arrays so no actor ever
    decodes them cold (see ``_precompute_hot_terms``).
    """
    paths = paths if isinstance(paths, IndexPaths) else IndexPaths(str(paths))
    part_files = sorted(Path(paths.postings).glob("part-*.parquet"))
    use_ray = False
    try:
        import ray

        use_ray = ray.is_initialized() and len(part_files) > 4
    except ImportError:
        pass
    if use_ray:
        return assemble_index_data(load_index_shared(
            paths, precompute_hot=precompute_hot,
            hot_postings_budget=hot_postings_budget))
    from searchengine_ray.stages.postings import part_id_of

    meta, dl_ids, dl, N, avgdl, k1, b = _load_doc_meta(paths)
    parts: dict[int, PartData] = {}
    hot: dict = {}
    per_part_budget = (hot_postings_budget // max(1, len(part_files))
                       if precompute_hot else 0)
    for f in part_files:
        pd_ = PartData(pq.read_table(f))
        parts[part_id_of(f)] = pd_
        hot.update(_hot_dict_from_slabs(_hot_slabs_for_part(
            f, pd_, dl_ids, dl, meta, N, avgdl, k1, b, per_part_budget)))
    return {"meta": meta, "dl_ids": dl_ids, "dl": dl, "parts": parts,
            "hot": hot}


class _SharedDecodeCache:
    """Pool-shared registry of decoded COLD term postings.

    The plasma-shared hot image (``_precompute_hot_terms``) covers each
    part's heaviest terms; the tier just below it (df in the ~1e5..1e7
    range at 20 M docs) is still hundreds of ms of decode+argsort per
    term — and without sharing, every actor in the pool repeats that
    work on first touch. Measured at sf1/20 M docs, 32 actors: that
    duplicated, memory-bandwidth-bound warm-up is ~200 s of wall and
    ~2.3 GB of duplicated heap per actor.

    This actor stores only {term_hash: ([ObjectRef], n_postings)} — the
    decoded arrays themselves live in plasma (one copy, published with
    ``ray.put`` by whichever query actor decodes first; refs are
    wrapped in a list so Ray never inlines the payload through this
    registry). LRU-evicted on a postings budget so the shared tail
    stays bounded. Run it ``num_cpus=0``: get/put are dict ops.

    Races are benign: simultaneous first-touch decodes waste one
    duplicate decode per racer (the registry keeps the first ref and
    tells later publishers no); ``QueryService.warmup`` avoids even
    that with a term-OWNERSHIP pre-pass (``warm_publish``: each actor
    decodes + publishes only the warm-up terms it owns by hash, in
    parallel across the pool)."""

    def __init__(self, postings_budget: int = 256_000_000):
        self._entries: dict[int, tuple[list, int]] = {}
        self._budget = int(postings_budget)
        self._spent = 0

    def get(self, h: int):
        e = self._entries.pop(h, None)
        if e is None:
            return None
        self._entries[h] = e               # re-insert: dict order is LRU
        return e[0]

    def put(self, h: int, wrapped: list, n_postings: int) -> bool:
        if h in self._entries:
            return False                   # first publisher wins
        self._entries[h] = (wrapped, int(n_postings))
        self._spent += int(n_postings)
        while self._spent > self._budget and len(self._entries) > 1:
            old = next(iter(self._entries))
            _, n = self._entries.pop(old)
            self._spent -= n
        return True

    def stats(self) -> dict:
        return {"terms": len(self._entries), "postings": self._spent}


class IndexSearcher:
    """Answers BM25 top-k over an index built by ``build_index``.

    ``data``: optionally pass a preloaded/shared ``load_index_data``
    result (or a ``ray.ObjectRef`` to one) — used by the actor pool so
    the index is materialized once per node, not once per actor.

    ``pool_cache``: optional ``_SharedDecodeCache`` actor handle — cold
    terms with df >= ``pool_cache_min_df`` are decoded once per pool
    and shared through plasma instead of once per actor.
    """

    def __init__(self, index: IndexPaths | str, config: IndexConfig | None = None,
                 preload: bool = False, data: dict | None = None,
                 pool_cache=None, pool_cache_min_df: int = 65536,
                 stats_override: dict | None = None):
        self.paths = index if isinstance(index, IndexPaths) else IndexPaths(str(index))
        if data is None:
            data = load_index_data(self.paths)
        self.data = data
        self.meta = data["meta"]
        self.config = config or IndexConfig()
        # scoring params come from the built index, not the caller
        c = self.meta.get("config", {})
        self.k1 = float(c.get("k1", 1.2))
        self.b = float(c.get("b", 0.75))
        self.N = int(self.meta["N"])
        self.avgdl = float(self.meta["avgdl"])
        self.num_term_parts = int(self.meta["num_term_parts"])
        self.analyzer = Analyzer(self.config)
        self._dl_ids = data["dl_ids"]
        self._dl = data["dl"]
        self._doc_pos = _DocPos(self._dl_ids, self.meta)
        self._parts = data["parts"]
        self._hot = data.get("hot", {})
        self._decode_cache: dict[str, tuple] = {}
        self._decode_cache_cap = 1024
        self._pool_cache = pool_cache
        self._pool_min_df = int(pool_cache_min_df)
        self._pool_local: dict[str, tuple] = {}
        self._term_info_cache: dict[str, tuple[int, int]] = {}
        self._score_buf: np.ndarray | None = None
        self._mark_buf: np.ndarray | None = None
        self._impact_cache: dict[str, tuple] = {}
        self._pos_cache: dict[str, tuple] = {}
        self._dirichlet_cache: dict[str, tuple] = {}
        self._cosine_cache: dict[str, tuple] = {}
        self._sumsq_buf: np.ndarray | None = None
        # tombstones: tiny sorted id list read fresh per searcher (NOT
        # part of the plasma-shared image, so deletes take effect on
        # the next actor/searcher without re-sharing the index)
        # opt-in recency tie-break: values come from the docs partitions
        # (a pruned 2-column read), NOT the plasma-shared image, so the
        # option works on any index whose build carried the column
        self._tie: np.ndarray | None = None
        tb = self.config.tie_break_column
        if tb:
            tie_tbl = pq.read_table(
                sorted(Path(self.paths.docs).glob("part-*.parquet")),
                columns=["doc_id", tb])
            tids = tie_tbl.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            tvals = tie_tbl.column(tb).to_numpy(
                zero_copy_only=False).astype(np.int64)
            # guard the scatter like the deletes loader below: orphaned
            # docs partitions (crashed ingest) can hold doc_ids the
            # served index never merged — an unguarded searchsorted
            # would IndexError past the end or silently write an
            # orphan's ts into another doc's slot
            tie = np.zeros(len(self._dl_ids), dtype=np.int64)
            pos = np.searchsorted(self._dl_ids, tids)
            ok = pos < len(self._dl_ids)
            pos, tids, tvals = pos[ok], tids[ok], tvals[ok]
            hit = self._dl_ids[pos] == tids
            tie[pos[hit]] = tvals[hit]
            self._tie = tie
        self._alive: np.ndarray | None = None
        dp = Path(self.paths.root) / "deletes.parquet"
        if dp.is_file():
            dead = pq.read_table(dp).column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(self._dl_ids, dead)
            ok = idx < len(self._dl_ids)
            idx, dead = idx[ok], dead[ok]
            hit = idx[self._dl_ids[idx] == dead]
            if len(hit):
                alive = np.ones(len(self._dl_ids), dtype=bool)
                alive[hit] = False
                self._alive = alive
        # federated serving: score THIS shard with GLOBAL collection
        # stats {"N", "avgdl", "df": {term: global_df}} so shard-local
        # idf skew can't bend ranks. The hot plasma image and the pool
        # cache bake the LOCAL stats into their precomputed contribs,
        # so both are disabled — every term takes the cold-decode path,
        # which reads the override.
        self._df_override: dict[str, int] | None = None
        if stats_override is not None:
            self.N = int(stats_override["N"])
            self.avgdl = float(stats_override["avgdl"])
            self._df_override = dict(stats_override.get("df") or {})
            self._hot = {}
            self._pool_cache = None

    # ---- posting access ----

    def _term_info(self, term: str) -> tuple[int, int]:
        """(hash64, df) for a term; df==0 -> not indexed."""
        got = self._term_info_cache.get(term)
        if got is None:
            h = term_hash64(term)
            pd_ = self._parts.get(h % self.num_term_parts)
            got = (h, pd_.df_of(h) if pd_ is not None else 0)
            self._term_info_cache[term] = got
        return got

    def term_df(self, term: str) -> int:
        return self._term_info(term)[1]

    def df_map(self) -> dict[str, int]:
        """Full term -> df map, read from the dictionary table (test /
        inspection path — the hot path never materializes this)."""
        tbl = pq.read_table(sorted(Path(self.paths.dictionary).glob("*.parquet")),
                            columns=["term", "df"])
        out: dict[str, int] = {}
        for t, d in zip(tbl.column("term").to_pylist(),
                        tbl.column("df").to_pylist()):
            out[t] = out.get(t, 0) + d
        return out

    def postings_for(self, term: str) -> list[PostingBlocks]:
        """All bucket slices of a term, ascending doc-range order."""
        h, df = self._term_info(term)
        if df == 0:
            return []
        pd_ = self._parts.get(h % self.num_term_parts)
        return pd_.blocks_for_hash(h) if pd_ is not None else []

    def doc_lens(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self._dl_ids, doc_ids)
        return self._dl[idx]

    def _tie_at(self, idx: np.ndarray):
        """Recency values aligned to _dl_ids positions, or None."""
        return None if self._tie is None else self._tie[idx]

    # ---- scoring ----

    def _query_terms(self, text: str, spell_correct: bool = False
                     ) -> list[tuple[str, int]]:
        """Unique analyzed terms with query-tf, ascending unicode order
        (the canonical float-summation order — SURVEY §7). With
        ``spell_correct``, unknown terms fall back to their best
        edit-distance-1 dictionary match (reference searcher.py:76-119)."""
        from collections import Counter

        qt = Counter(self.analyzer.terms(text))
        if spell_correct:
            from searchengine_ray.functions.spell import correct

            fixed: Counter = Counter()
            for t, c in qt.items():
                t2 = correct(t, self.term_df)
                if t2 is not None:
                    fixed[t2] += c
            qt = fixed
        return [(t, qt[t]) for t in sorted(qt) if self.term_df(t) > 0]

    def search(self, text: str, k: int = 10, method: str = "vectorized",
               spell_correct: bool = False) -> list[tuple[int, float]]:
        qterms = self._query_terms(text, spell_correct=spell_correct)
        if not qterms:
            return []
        if method == "bmw":
            return self._search_bmw(qterms, k)
        if method == "impact":
            return self._search_impact(qterms, k)
        if method == "dirichlet":
            return self._search_dirichlet(qterms, k)
        if method == "cosine":
            return self._search_cosine(qterms, k)
        if method == "rescore":
            return self._search_rescore(qterms, k)
        return self._search_vectorized(qterms, k)

    def _decoded(self, term: str
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """(positions-into-doc-table, tfs, contrib_base) for a term,
        LRU-cached.

        Positions replace raw doc ids downstream; ``contrib_base`` is
        the precomputed per-posting BM25 contribution for qtf=1 (it only
        depends on tf, doc_len, df — all fixed per index), so repeat
        queries touch one array instead of recomputing the kernel."""
        got = self._decode_cache.get(term)
        if got is None:
            h, df = self._term_info(term)
            if df == 0:
                return None
            shared = self._hot.get(h)
            if shared is not None:             # plasma-shared precompute
                return (shared[0], None, shared[1])
            pooled = self._pool_cached(term, h, df)
            if pooled is not None:             # pool-shared cold decode
                return (pooled[0], pooled[1], pooled[2])
            got = self._decode_cold(term, df)
            if got is None:
                return None
            if len(self._decode_cache) >= self._decode_cache_cap:
                self._decode_cache.pop(next(iter(self._decode_cache)))
            self._decode_cache[term] = got
        return got

    def _decode_cold(self, term: str, df: int) -> tuple | None:
        """Local decode + score of one term's postings (no caching)."""
        slices = self.postings_for(term)
        if not slices:
            return None
        from searchengine_ray.codec import concat_blocks, decode_blocks

        docs, tfs = decode_blocks(concat_blocks(slices))
        pos = self._doc_pos(docs)
        if self._df_override is not None:
            df = self._df_override.get(term, df)
        idf_t = float(bm25_idf(self.N, df))
        contrib = bm25_term_scores(tfs, self._dl[pos], idf_t=idf_t,
                                   avgdl=self.avgdl, k1=self.k1, b=self.b)
        if len(self._dl_ids) < 2**31:
            # same int32 positions as the shared hot arrays: mixed
            # dtypes would make every _full_scores searchsorted
            # promote-and-copy the big array per query
            pos = pos.astype(np.int32)
        return (pos, tfs, contrib)

    def _pool_cached(self, term: str, h: int, df: int) -> tuple | None:
        """(pos, tfs, contrib, ipos, icontrib) via the pool-shared cold
        cache — zero-copy plasma views; first toucher decodes, computes
        the impact order, publishes, everyone else attaches. ``None``
        when no pool cache is attached or the term is below the df
        threshold (small terms aren't worth the registry round-trip)."""
        if self._pool_cache is None or df < self._pool_min_df:
            return None
        got = self._pool_local.get(term)
        if got is None:
            import ray

            try:
                wrapped = ray.get(self._pool_cache.get.remote(int(h)))
                got = ray.get(wrapped[0]) if wrapped is not None else None
            except Exception:
                # registry actor or publisher gone: serve locally from
                # here on rather than paying a failing RPC per term
                self._pool_cache = None
                return None
            if got is None:
                base = self._decode_cold(term, df)
                if base is None:
                    return None
                pos, tfs, contrib = base
                order = np.argsort(-contrib, kind="stable")
                got = (pos, tfs, contrib, pos[order], contrib[order])
                try:
                    self._pool_cache.put.remote(
                        int(h), [ray.put(got)], int(len(pos)))
                except Exception:
                    self._pool_cache = None
            if len(self._pool_local) >= self._decode_cache_cap:
                self._pool_local.pop(next(iter(self._pool_local)))
            self._pool_local[term] = got
        return got

    def warm_publish(self, queries: list[tuple[int, str]], rank: int,
                     n: int) -> int:
        """Pool warm-up pre-pass: decode + publish to the pool cache
        ONLY the cold terms this rank OWNS (crc32(term) % n == rank).
        Run on every actor of an n-actor pool, the pre-pass covers each
        warm-up term's decode exactly ONCE across the pool — no serial
        single-actor bottleneck, and no race on the stop-word-scale
        terms every warm-up query shares (scattering whole QUERIES
        still races those: disjoint query sets overlap in terms).
        Query parsing is repeated per actor, but that is string work —
        the decode+argsort it guards is the DRAM-bound cost. Returns
        the number of terms published."""
        from zlib import crc32

        if self._pool_cache is None:
            return 0
        done = 0
        seen: set[str] = set()
        for _, text in queries:
            for term, _qtf in self._query_terms(text):
                if term in seen:
                    continue
                seen.add(term)
                if crc32(term.encode()) % n != rank:
                    continue
                h, df = self._term_info(term)
                if df < self._pool_min_df or self._hot.get(h) is not None:
                    continue
                if self._pool_cached(term, h, df) is not None:
                    done += 1
        if done and self._pool_cache is not None:
            # barrier: actor-task order is FIFO per (caller, callee)
            # pair, so one awaited registry call after the fire-and-
            # forget put.remote()s guarantees THIS actor's publishes
            # are applied before the driver starts the pool-wide pass
            # (otherwise that pass can miss and re-decode).
            import ray

            try:
                ray.get(self._pool_cache.get.remote(0))
            except Exception:
                pass
        return done

    def _search_vectorized(self, qterms: list[tuple[str, int]], k: int
                           ) -> list[tuple[int, float]]:
        # Reused dense score buffer + scatter-add: memory traffic is
        # proportional to the POSTINGS touched, not N-docs-per-term (a
        # per-term bincount allocates and scans the whole doc space,
        # which saturates memory bandwidth when many query actors share
        # a socket). Per-doc accumulation order is still ascending-term
        # — the canonical float order shared with the oracle.
        decoded = []
        for term, qtf in qterms:               # ascending term order: canonical
            got = self._decoded(term)
            if got is not None:
                decoded.append((got[0], got[2], qtf))
        if not decoded:
            return []
        if len(decoded) == 1:
            # single-term fast path: no scatter at all — top-k straight
            # off the cached contribution vector (sequential reads only)
            pos, contrib, qtf = decoded[0]
            scores = contrib if qtf == 1 else qtf * contrib
            if self._alive is not None:
                m = self._alive[pos]
                pos, scores = pos[m], scores[m]
            top = top_k_indices(scores, self._dl_ids[pos], k,
                                tie=self._tie_at(pos))
            return [(int(self._dl_ids[pos[i]]), float(scores[i])) for i in top]
        n = len(self._dl_ids)
        buf = self._score_buf
        if buf is None or len(buf) != n:
            buf = self._score_buf = np.zeros(n, dtype=np.float64)
            self._mark_buf = np.zeros(n, dtype=np.uint8)
        mark = self._mark_buf
        for pos, contrib, qtf in decoded:
            np.add.at(buf, pos, contrib if qtf == 1 else qtf * contrib)
            mark[pos] = 1
        # candidate union via the byte-mark buffer: a linear flatnonzero
        # scan instead of sorting concatenated position arrays (the sort
        # dominated per-query time for stop-word-heavy queries)
        cand = np.flatnonzero(mark)
        live = (cand if self._alive is None
                else cand[self._alive[cand]])
        cand_scores = buf[live].copy()
        buf[cand] = 0.0                        # reset only what we touched
        mark[cand] = 0
        top = top_k_indices(cand_scores, self._dl_ids[live], k,
                            tie=self._tie_at(live))
        return [(int(self._dl_ids[live[i]]), float(cand_scores[i])) for i in top]

    def _dirichlet_decoded(self, term: str, mu: float
                           ) -> tuple[np.ndarray, np.ndarray] | None:
        """(positions, per-posting LM-Dirichlet contribution for qtf=1),
        LRU-cached beside the BM25 caches (separate cache: the kernel
        differs — ctf/total_len replace df/avgdl).

        The index is term-partitioned, so ONE decode yields a term's
        complete posting list and ctf = sum(tf) is the exact corpus
        term frequency — no extra statistic needs to live in the
        dictionary. Arithmetic mirrors the SQL oracle expression shape
        exactly (same division order, ln(1+x) not log1p) so bp-rounded
        scores replay bit-for-bit."""
        got = self._dirichlet_cache.get(term)
        if got is None:
            slices = self.postings_for(term)
            if not slices:
                return None
            from searchengine_ray.codec import concat_blocks, decode_blocks

            docs, tfs = decode_blocks(concat_blocks(slices))
            pos = self._doc_pos(docs)
            total_len = float(self.meta.get("total_len",
                                            self.avgdl * self.N))
            ctf = float(np.int64(tfs.astype(np.int64).sum()))
            dl = self._dl[pos].astype(np.float64)
            contrib = (np.log(1.0 + tfs.astype(np.float64)
                              / (mu * ctf / total_len))
                       + np.log(mu / (dl + mu)))
            if len(self._dl_ids) < 2**31:
                pos = pos.astype(np.int32)
            if len(self._dirichlet_cache) >= self._decode_cache_cap:
                self._dirichlet_cache.pop(next(iter(self._dirichlet_cache)))
            got = (pos, contrib)
            self._dirichlet_cache[term] = got
        return got

    def _search_dirichlet(self, qterms: list[tuple[str, int]], k: int,
                          mu: float = LM_MU) -> list[tuple[int, float]]:
        """LM Dirichlet query-likelihood ranking (Zhai & Lafferty 2001;
        Lucene's LMDirichletSimilarity) over the same index image — the
        second relevance model beside BM25. Per matched term:
        qtf * (ln(1 + tf / (mu * ctf / total_len)) + ln(mu / (dl + mu))).
        Unmatched query terms contribute nothing (Lucene semantics — a
        pure generative LM would also charge the smoothed background for
        missing terms; that constant shift per (query, doc-length) is
        the documented difference). Scores can be negative; the shared
        scatter-add + top-k machinery is sign-agnostic."""
        decoded = []
        for term, qtf in qterms:               # ascending term order: canonical
            got = self._dirichlet_decoded(term, mu)
            if got is not None:
                decoded.append((got[0], got[1], qtf))
        if not decoded:
            return []
        if len(decoded) == 1:
            pos, contrib, qtf = decoded[0]
            scores = contrib if qtf == 1 else qtf * contrib
            if self._alive is not None:
                m = self._alive[pos]
                pos, scores = pos[m], scores[m]
            top = top_k_indices(scores, self._dl_ids[pos], k,
                                tie=self._tie_at(pos))
            return [(int(self._dl_ids[pos[i]]), float(scores[i])) for i in top]
        n = len(self._dl_ids)
        buf = self._score_buf
        if buf is None or len(buf) != n:
            buf = self._score_buf = np.zeros(n, dtype=np.float64)
            self._mark_buf = np.zeros(n, dtype=np.uint8)
        mark = self._mark_buf
        for pos, contrib, qtf in decoded:
            np.add.at(buf, pos, contrib if qtf == 1 else qtf * contrib)
            mark[pos] = 1
        cand = np.flatnonzero(mark)
        live = (cand if self._alive is None
                else cand[self._alive[cand]])
        cand_scores = buf[live].copy()
        buf[cand] = 0.0
        mark[cand] = 0
        top = top_k_indices(cand_scores, self._dl_ids[live], k,
                            tie=self._tie_at(live))
        return [(int(self._dl_ids[live[i]]), float(cand_scores[i])) for i in top]

    def _cosine_decoded(self, term: str
                        ) -> tuple[np.ndarray, np.ndarray] | None:
        """(positions, per-posting tf-idf weight ``log10(N/df) * tf``),
        LRU-cached beside the BM25/Dirichlet caches — the doc-vector
        component of the reference's OWN ranking model.

        The reference scores cosine similarity between the query vector
        and the doc's tf-idf vector RESTRICTED to the matched query
        terms (``/root/reference/ranker.py:27``: ``relevant_docs[doc]``
        holds only the matched-term components,
        ``searcher.py:143-159``). Because the doc norm is taken over
        that same sub-vector, every per-doc scalar cancels — the
        reference's ``tf / max_freq_term`` normalization
        (``indexer.py:107``) and the query's ``qtf / max_qtf``
        (``searcher.py:161-175``) both divide out of
        ``dot(d, q) / (|d| * |q|)``. What remains needs only matched
        postings: no per-doc statistic beyond what one decode yields."""
        got = self._cosine_cache.get(term)
        if got is None:
            h, df = self._term_info(term)
            if df == 0:
                return None
            slices = self.postings_for(term)
            if not slices:
                return None
            from searchengine_ray.codec import concat_blocks, decode_blocks

            docs, tfs = decode_blocks(concat_blocks(slices))
            pos = self._doc_pos(docs)
            if self._df_override is not None:
                df = self._df_override.get(term, df)
            idf10 = np.log10(float(self.N) / float(df))
            w = idf10 * tfs.astype(np.float64)
            if len(self._dl_ids) < 2**31:
                pos = pos.astype(np.int32)
            if len(self._cosine_cache) >= self._decode_cache_cap:
                self._cosine_cache.pop(next(iter(self._cosine_cache)))
            got = (pos, w)
            self._cosine_cache[term] = got
        return got

    def _search_cosine(self, qterms: list[tuple[str, int]], k: int
                       ) -> list[tuple[int, float]]:
        """Classic tf-idf cosine ranking — the reference's ranking model
        (``/root/reference/ranker.py:14-48``), third relevance model
        beside BM25 and LM Dirichlet over the same index image. Per
        candidate doc: ``sum(w_t * qtf_t) / (sqrt(sum(w_t^2)) * |q|)``
        with ``w_t = log10(N/df_t) * tf_td`` over matched terms only and
        ``|q| = sqrt(sum qtf_t^2)`` over the df>0 query terms (the
        reference's max-frequency normalizations cancel — see
        ``_cosine_decoded``). Two scatter-add passes (dot and sum of
        squares) reuse the shared score/mark buffers. Returned scores
        are basis-point quantized (int-valued floats, 10000 = cos 1.0)
        so the top-k cut is deterministic across replays."""
        decoded = []
        qnorm_sq = 0.0
        for term, qtf in qterms:               # ascending term order: canonical
            got = self._cosine_decoded(term)
            if got is not None:
                decoded.append((got[0], got[1], qtf))
                qnorm_sq += float(qtf) * float(qtf)
        if not decoded:
            return []
        qnorm = float(np.sqrt(qnorm_sq))
        n = len(self._dl_ids)
        buf = self._score_buf
        if buf is None or len(buf) != n:
            buf = self._score_buf = np.zeros(n, dtype=np.float64)
            self._mark_buf = np.zeros(n, dtype=np.uint8)
        ssq = self._sumsq_buf
        if ssq is None or len(ssq) != n:
            ssq = self._sumsq_buf = np.zeros(n, dtype=np.float64)
        mark = self._mark_buf
        for pos, w, qtf in decoded:
            np.add.at(buf, pos, w if qtf == 1 else qtf * w)
            np.add.at(ssq, pos, w * w)
            mark[pos] = 1
        cand = np.flatnonzero(mark)
        live = (cand if self._alive is None
                else cand[self._alive[cand]])
        cand_scores = buf[live] / (np.sqrt(ssq[live]) * qnorm)
        # Quantize to basis points BEFORE the top-k cut: cosine packs
        # proportional-tf docs into exact mathematical ties (tf=(1,1)
        # and (2,2) have the same angle) whose float realizations
        # differ only by summation-association noise — ranking on raw
        # floats would cut tie clusters nondeterministically vs any
        # replay. Scores are in [0,1]; 1e-4 resolution is the signal.
        cand_scores = np.floor(cand_scores * 10000.0 + 0.5)
        buf[cand] = 0.0
        ssq[cand] = 0.0
        mark[cand] = 0
        top = top_k_indices(cand_scores, self._dl_ids[live], k,
                            tie=self._tie_at(live))
        return [(int(self._dl_ids[live[i]]), float(cand_scores[i])) for i in top]

    RESCORE_WINDOW = 30

    def _search_rescore(self, qterms: list[tuple[str, int]], k: int,
                        window: int | None = None
                        ) -> list[tuple[int, float]]:
        """Window rescoring (the Elasticsearch ``rescore`` block,
        query_weight = rescore_query_weight = 1, combine = total):
        BM25 retrieves the top ``window`` candidates, then ONLY that
        window is rescored by the tf-idf cosine model and re-ranked on
        ``bm25_bp + cosine_bp``. The expensive second model touches a
        CONSTANT number of docs per query regardless of corpus size —
        the standard serving shape for costly rerankers. Both scores
        come from the same term-partitioned decode caches; the cosine
        side gathers just the window docs' postings via searchsorted
        (the ``_full_scores`` shape), no second scatter over the
        candidate space. The combine runs on basis-point INTEGERS so
        the final order replays exactly in SQL."""
        window = self.RESCORE_WINDOW if window is None else window
        base = self._search_vectorized(qterms, window)
        if not base:
            return []
        docs = np.array([d for d, _ in base], dtype=np.int64)
        bm_bp = np.floor(np.array([s for _, s in base], dtype=np.float64)
                         * 10000.0 + 0.5)
        pos_w = self._doc_pos(docs)
        dot = np.zeros(len(docs), dtype=np.float64)
        ssq = np.zeros(len(docs), dtype=np.float64)
        qnorm_sq = 0.0
        for term, qtf in qterms:               # ascending term order: canonical
            got = self._cosine_decoded(term)
            if got is None:
                continue
            qnorm_sq += float(qtf) * float(qtf)
            pos, w = got
            needles = pos_w if pos_w.dtype == pos.dtype \
                else pos_w.astype(pos.dtype)
            idx = np.searchsorted(pos, needles)
            idx_c = np.minimum(idx, len(pos) - 1)
            valid = pos[idx_c] == needles
            wv = w[idx_c[valid]]
            dot[valid] += wv if qtf == 1 else qtf * wv
            ssq[valid] += wv * wv
        cos_bp = np.zeros(len(docs), dtype=np.float64)
        hit = ssq > 0.0
        cos_bp[hit] = np.floor(dot[hit] / (np.sqrt(ssq[hit])
                                           * np.sqrt(qnorm_sq))
                               * 10000.0 + 0.5)
        combined = bm_bp + cos_bp
        top = top_k_indices(combined, docs, k, tie=self._tie_at(pos_w))
        return [(int(docs[i]), float(combined[i])) for i in top]

    def _impact_ordered(self, term: str):
        """Impact-ordered view of a term's postings: (positions, contribs)
        sorted by contribution DESC (stable; ties keep position order) —
        cached alongside the ascending view."""
        got = self._impact_cache.get(term)
        if got is None:
            h, df = self._term_info(term)
            shared = self._hot.get(h) if df else None
            if shared is not None:
                return (shared[2], shared[3])
            pooled = self._pool_cached(term, h, df) if df else None
            if pooled is not None:
                return (pooled[3], pooled[4])
            base = self._decoded(term)
            if base is None:
                return None
            pos, _, contrib = base
            order = np.argsort(-contrib, kind="stable")
            got = (pos[order], contrib[order])
            if len(self._impact_cache) >= self._decode_cache_cap:
                self._impact_cache.pop(next(iter(self._impact_cache)))
            self._impact_cache[term] = got
        return got

    def _full_scores(self, qterms_dec: list, S: np.ndarray) -> np.ndarray:
        """Exact scores for candidate positions S — ascending-term-order
        gather, so floats match the exhaustive path bit-for-bit."""
        scores = np.zeros(len(S), dtype=np.float64)
        for pos, contrib, qtf in qterms_dec:
            # cast the SMALL side on dtype mismatch — searchsorted with
            # mixed int widths promote-copies the big postings array
            idx = np.searchsorted(pos, S if S.dtype == pos.dtype
                                  else S.astype(pos.dtype))
            idx_c = np.minimum(idx, len(pos) - 1)
            valid = pos[idx_c] == S
            add = np.zeros(len(S), dtype=np.float64)
            add[valid] = contrib[idx_c[valid]] if qtf == 1 \
                else qtf * contrib[idx_c[valid]]
            scores += add
        return scores

    def _search_impact(self, qterms: list[tuple[str, int]], k: int,
                       chunk: int = 4096) -> list[tuple[int, float]]:
        """Impact-ordered early termination (Buckley & Lewit 1985 /
        impact-sorted lists): consume each term's postings in descending
        contribution order; stop as soon as k candidates' EXACT scores
        beat the sum of every list's next-best contribution — no unseen
        doc can exceed that bound. Returns exactly the exhaustive
        result (tested), usually after touching a small prefix of each
        hot term's postings."""
        decoded = []
        impact = []
        for term, qtf in qterms:               # ascending term order
            got = self._decoded(term)
            if got is None:
                continue
            ipos, icontrib = self._impact_ordered(term)
            decoded.append((got[0], got[2], qtf))
            impact.append((ipos, icontrib if qtf == 1 else qtf * icontrib))
        if not decoded:
            return []
        if len(decoded) == 1:
            pos, contrib, qtf = decoded[0]
            scores = contrib if qtf == 1 else qtf * contrib
            if self._alive is not None:
                m = self._alive[pos]
                pos, scores = pos[m], scores[m]
            top = top_k_indices(scores, self._dl_ids[pos], k,
                                tie=self._tie_at(pos))
            return [(int(self._dl_ids[pos[i]]), float(scores[i])) for i in top]
        cursors = [0] * len(impact)
        seen_chunks: list[np.ndarray] = []
        S = None
        scores = None
        budget = 1                             # geometric: recompute rarely
        while True:
            bound = sum(ic[c] for (_, ic), c in zip(impact, cursors) if c < len(ic))
            if S is not None and len(S) >= k:
                kth = np.partition(scores, len(scores) - k)[len(scores) - k]
                # strict >: an unseen doc scoring EXACTLY kth could still
                # win the (score desc, doc_id asc) tie-break, so kth==bound
                # must keep consuming (rare float-equality edge)
                if kth > bound:
                    break
            consumed = False
            for _ in range(budget):
                live = [i for i, ((_, ic), c) in enumerate(zip(impact, cursors))
                        if c < len(ic)]
                if not live:
                    break
                # consume a chunk from the list with the highest next impact
                i = max(live, key=lambda j: impact[j][1][cursors[j]])
                ip, _ = impact[i]
                c = cursors[i]
                seen_chunks.append(ip[c:c + chunk])
                cursors[i] = c + chunk
                consumed = True
            if not consumed:
                break
            budget *= 2
            S = np.unique(np.concatenate(seen_chunks))
            if self._alive is not None:
                S = S[self._alive[S]]
            scores = self._full_scores(decoded, S)
        if S is None or len(S) == 0:
            return []
        top = top_k_indices(scores, self._dl_ids[S], k, tie=self._tie_at(S))
        return [(int(self._dl_ids[S[i]]), float(scores[i])) for i in top]

    def _search_bmw(self, qterms: list[tuple[str, int]], k: int
                    ) -> list[tuple[int, float]]:
        """Block-max WAND pruning, VECTORIZED (r4 — replaces the per-doc
        DAAT Python loop).

        Same pruning primitive as Ding & Suel 2011 — per-block score
        upper bounds — applied segment-wise instead of doc-at-a-time:

        1. theta: a lower bound on the final k-th score, from the k-th
           best single-term contribution of the highest-impact term
           (every doc's full score >= its single-term score, so the
           true k-th >= theta).
        2. Merge all terms' block edges into segments; each segment has
           a CONSTANT per-term block UB, so the summed UB per segment is
           one vectorized pass over ~postings/block_size block entries.
           Segments with total UB < theta cannot contain a top-k doc
           (score <= UB < theta <= true k-th), ties kept conservatively.
        3. Exact-score ONLY the surviving doc ranges: postings arrays
           are doc-sorted, so each range is two searchsorted probes and
           a zero-copy slice — work is O(postings in surviving
           segments), not O(all postings).

        Exact by construction (tested rank-identical incl. tombstones
        and the recency tie-break); per-doc float accumulation order is
        the same ascending-term order as the exhaustive path, so scores
        are bit-identical."""
        from searchengine_ray.codec import concat_blocks

        decoded = []        # (pos, contrib, qtf) ascending term order
        blocks = []         # (last_docs, block_ubs) per term
        term_names = []
        for term, qtf in qterms:
            got = self._decoded(term)
            if got is None:
                continue
            term_names.append(term)
            pb = concat_blocks(self.postings_for(term))
            mt = pb.max_tfs.astype(np.float64)
            idf_t = float(bm25_idf(self.N, self.term_df(term)))
            ubs = qtf * idf_t * mt * (self.k1 + 1.0) / (mt + self.k1 * (1.0 - self.b))
            decoded.append((got[0], got[2], qtf))
            blocks.append((pb.last_docs, ubs))
        if not decoded:
            return []
        if len(decoded) == 1:
            pos, contrib, qtf = decoded[0]
            scores = contrib if qtf == 1 else qtf * contrib
            if self._alive is not None:
                m = self._alive[pos]
                pos, scores = pos[m], scores[m]
            top = top_k_indices(scores, self._dl_ids[pos], k,
                                tie=self._tie_at(pos))
            return [(int(self._dl_ids[pos[i]]), float(scores[i])) for i in top]

        # --- theta: EXACT full scores of the best term's top impact-
        # order candidates (k * terms searchsorted probes — cheap). The
        # k-th of any candidate subset's exact scores is a valid lower
        # bound of the final k-th, and far tighter than a single-term
        # bound when several terms contribute ---
        best_i = int(np.argmax([float(u.max(initial=0.0)) for _, u in blocks]))
        ipos, _ = self._impact_ordered(term_names[best_i])
        S0 = np.unique(ipos[:4 * k]).astype(np.int64)
        if self._alive is not None:
            S0 = S0[self._alive[S0]]
        theta = -np.inf
        if len(S0) >= k:
            s_exact = self._full_scores(decoded, S0)
            theta = float(np.partition(s_exact, len(s_exact) - k)[len(s_exact) - k])

        # --- segments: merged block edges; per-segment summed UB. A
        # term contributes its covering block's UB only to segments
        # where it actually HAS postings (two searchsorted probes per
        # segment) — without the presence mask, one sparse block
        # spanning the whole doc range leaks its UB into every segment
        # and nothing ever prunes ---
        edges = np.unique(np.concatenate([ld for ld, _ in blocks]))
        pos_edges = np.searchsorted(self._dl_ids, edges, side="right")
        seg_bounds = np.concatenate([[0], pos_edges])
        tot_ub = np.zeros(len(edges), dtype=np.float64)
        for (ld, ubs), (pos, _, _) in zip(blocks, decoded):
            j = np.searchsorted(ld, edges)            # block covering each edge
            valid = j < len(ld)
            if len(pos) < 8 * len(edges):
                # sparse term: presence probe per segment; a dense term
                # (>= 8 postings/segment on average) is everywhere, and
                # present=True is conservative — skip the probes
                cnt = np.diff(np.searchsorted(pos, seg_bounds.astype(pos.dtype)))
                valid &= cnt > 0
            tot_ub[valid] += ubs[j[valid]]
        surv = tot_ub >= theta                        # ties kept (conservative)
        if not surv.any():
            surv[np.argmax(tot_ub)] = True            # can't happen; safety
        # segment j covers docs (edges[j-1], edges[j]] -> positions in the
        # sorted doc table; merge adjacent survivors into maximal ranges
        starts_m = surv & ~np.concatenate([[False], surv[:-1]])
        ends_m = surv & ~np.concatenate([surv[1:], [False]])
        lo_idx = np.flatnonzero(starts_m)
        hi_idx = np.flatnonzero(ends_m)
        range_lo = np.where(lo_idx > 0, pos_edges[lo_idx - 1], 0)
        range_hi = pos_edges[hi_idx]                  # exclusive

        n = len(self._dl_ids)
        buf = self._score_buf
        if buf is None or len(buf) != n:
            buf = self._score_buf = np.zeros(n, dtype=np.float64)
            self._mark_buf = np.zeros(n, dtype=np.uint8)
        mark = self._mark_buf
        any_touched = False
        for pos, contrib, qtf in decoded:             # ascending term order
            lo = np.searchsorted(pos, range_lo.astype(pos.dtype))
            hi = np.searchsorted(pos, range_hi.astype(pos.dtype))
            if len(lo) == 1 and lo[0] == 0 and hi[0] == len(pos):
                p, c = pos, contrib                   # no pruning: zero-copy
            else:
                keep_idx = (np.concatenate(
                    [np.arange(a, b) for a, b in zip(lo, hi) if b > a])
                    if len(lo) else np.empty(0, np.int64))
                if not len(keep_idx):
                    continue
                p, c = pos[keep_idx], contrib[keep_idx]
            np.add.at(buf, p, c if qtf == 1 else qtf * c)
            mark[p] = 1
            any_touched = True
        if not any_touched:
            return []
        cand = np.flatnonzero(mark)
        live = cand if self._alive is None else cand[self._alive[cand]]
        cand_scores = buf[live].copy()
        buf[cand] = 0.0
        mark[cand] = 0
        top = top_k_indices(cand_scores, self._dl_ids[live], k,
                            tie=self._tie_at(live))
        return [(int(self._dl_ids[live[i]]), float(cand_scores[i])) for i in top]

    def _doc_len_scalar(self, doc_id: int) -> int:
        i = int(np.searchsorted(self._dl_ids, doc_id))
        return int(self._dl[i])

    # ---- phrase search (positional postings) ----

    def _positions_for(self, term: str):
        """(docs, pos_values, per-posting offsets) for a term, cached.
        Requires an index built with ``store_positions=True``."""
        got = self._pos_cache.get(term)
        if got is None:
            h, df = self._term_info(term)
            if df == 0:
                return None
            from searchengine_ray.codec import (concat_blocks, decode_blocks,
                                                decode_positions)

            pb = concat_blocks(self.postings_for(term))
            docs, _ = decode_blocks(pb)
            pos, offs = decode_positions(pb)
            got = (docs, pos, offs)
            if len(self._pos_cache) >= self._decode_cache_cap:
                self._pos_cache.pop(next(iter(self._pos_cache)))
            self._pos_cache[term] = got
        return got

    def boolean_search(self, text: str) -> np.ndarray:
        """Boolean conjunctive retrieval: doc ids (ascending) containing
        EVERY positive query term and NONE of the ``-``-prefixed ones —
        the classic unranked AND/NOT query over the inverted index (the
        set-retrieval face of the reference's candidate assembly,
        ``searcher.py:36-74``, before any scoring). Works on any index
        (positions not required); respects delete tombstones.

        Intersections run over the same decoded posting arrays BM25
        uses (hot plasma-shared, pool-shared, or cold LRU decode), so
        on a served pool the query costs set ops only."""
        must: list[str] = []
        must_not: list[str] = []
        for w in text.split():
            neg = w.startswith("-")
            for t in self.analyzer.terms(w[1:] if neg else w):
                (must_not if neg else must).append(t)
        if not must or set(must) & set(must_not):
            # no positive terms, or t AND NOT t: provably empty
            return np.empty(0, np.int64)
        pos: np.ndarray | None = None
        # rarest-first: each intersection is bounded by the smallest df
        for t in sorted(set(must), key=self.term_df):
            d = self._decoded(t)
            if d is None:
                return np.empty(0, np.int64)
            p = d[0].astype(np.int64)
            pos = p if pos is None else np.intersect1d(
                pos, p, assume_unique=True)
            if len(pos) == 0:
                return np.empty(0, np.int64)
        for t in sorted(set(must_not)):
            d = self._decoded(t)
            if d is not None:
                pos = np.setdiff1d(pos, d[0].astype(np.int64),
                                   assume_unique=True)
        if self._alive is not None:
            pos = pos[self._alive[pos]]
        return self._dl_ids[pos]

    def terms_union(self, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Disjunctive (OR) retrieval over pre-expanded index terms:
        ``(doc_ids ascending, n_terms)`` where ``n_terms`` counts how
        many DISTINCT query terms each doc contains. The retrieval body
        of wildcard/prefix queries — the dictionary expansion happens
        upstream (``docsearch._expand_prefixes``), this just unions the
        decoded posting arrays BM25 already shares (hot plasma image,
        pool cache, or cold LRU), so on a served pool a multi-term
        union costs one ``np.unique`` over concatenated positions.
        Respects delete tombstones like every other retrieval path."""
        pos_list = []
        for t in sorted(set(terms)):
            d = self._decoded(t)
            if d is not None:
                pos_list.append(d[0].astype(np.int64))
        if not pos_list:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        pos, counts = np.unique(np.concatenate(pos_list), return_counts=True)
        if self._alive is not None:
            keep = self._alive[pos]
            pos, counts = pos[keep], counts[keep]
        return self._dl_ids[pos], counts

    def span_first(self, text: str, limit: int) -> list[tuple[int, int]]:
        """Docs whose FIRST occurrence of the (analyzed) query term is
        at raw-token position < ``limit`` (Lucene's SpanFirstQuery —
        'term near the start of the field', the title/lead-paragraph
        heuristic). Returns ``[(doc_id, first_pos)]`` ascending by
        doc_id. Requires a positions-enabled index; the first position
        of posting ``j`` is ``pos[offs[j]]`` — positions are stored
        ascending per posting, so no scan of the tail is needed."""
        raws = self.analyzer.raw_tokens(text)
        if not raws:
            return []
        exp = self.analyzer.expand(raws[0])
        if not exp:
            return []
        got = self._positions_for(exp[0])
        if got is None:
            return []
        docs, pos, offs = got
        first = pos[offs[:-1]]
        keep = first < int(limit)
        docs, first = docs[keep], first[keep]
        if self._alive is not None and len(docs):
            alive = self._alive[np.searchsorted(self._dl_ids, docs)]
            docs, first = docs[alive], first[alive]
        return list(zip(docs.tolist(), first.tolist()))

    def phrase_search(self, text: str) -> list[tuple[int, int]]:
        """Exact phrase match via positional postings: docs containing the
        query tokens at consecutive RAW-token positions. Returns
        ``[(doc_id, n_matches)]`` ascending by doc_id; ``n_matches``
        counts every start position (overlapping occurrences included).

        The reference keeps per-doc word locations (``parser_module.py:
        222-241``) but never shipped a phrase operator; this is the
        capability those positions exist for.
        """
        raws = self.analyzer.raw_tokens(text)
        seq: list[str] = []
        for r in raws:
            exp = self.analyzer.expand(r)
            if not exp:
                return []          # unindexable token inside the phrase
            seq.append(exp[0])     # compound form carries the raw position
        if not seq:
            return []
        per_term = {}
        for t in set(seq):
            got = self._positions_for(t)
            if got is None:
                return []
            per_term[t] = got
        # candidate docs: intersect ascending doc arrays, rarest first
        doc_sets = sorted((per_term[t][0] for t in set(seq)), key=len)
        cand = doc_sets[0]
        for d in doc_sets[1:]:
            cand = cand[np.isin(cand, d, assume_unique=True)]
            if len(cand) == 0:
                return []
        if self._alive is not None:
            cand = cand[self._alive[np.searchsorted(self._dl_ids, cand)]]
        out: list[tuple[int, int]] = []
        for doc in cand.tolist():
            starts = None
            for i, t in enumerate(seq):
                docs_t, pos_t, offs_t = per_term[t]
                j = int(np.searchsorted(docs_t, doc))
                p = pos_t[offs_t[j]:offs_t[j + 1]]
                if starts is None:
                    starts = p
                else:
                    # no assume_unique: identifier splitting can place the
                    # same term twice at one raw position
                    keep = np.isin(starts + i, p)
                    starts = starts[keep]
                if len(starts) == 0:
                    break
            if starts is not None and len(starts):
                out.append((doc, int(len(starts))))
        return out

    def fetch_docs(self, doc_ids) -> dict[int, str]:
        """doc_id -> content for result hydration (the reference GUI
        shows full tweet text per hit; this is that capability over the
        partitioned docs/ layout). Key-hash indexes address the owning
        partition directly (``id >> doc_id_part_bits``); other layouts
        fall back to a filtered read over all parts, where the
        per-partition doc_id sort makes parquet row-group pruning
        effective."""
        import pyarrow.compute as _pc

        ids = sorted({int(i) for i in doc_ids})
        if not ids:
            return {}
        docs_dir = Path(self.paths.docs)
        files: list[str] = []
        # bit-addressing is only valid for the key-hash id layout; the
        # preassigned/compacted layout range-partitions by ids // span.
        # A meta WITHOUT id_layout (older index) falls back to the
        # filtered full read — slower hydration, never wrong.
        bits = (int(self.meta.get("doc_id_part_bits", 0))
                if self.meta.get("id_layout") == "part_bits" else 0)
        if bits:
            cand = sorted({i >> bits for i in ids})
            files = [str(docs_dir / f"part-{p:05d}.parquet") for p in cand]
            if not all(Path(f).is_file() for f in files):
                files = []
        if not files:
            files = sorted(str(f) for f in docs_dir.glob("part-*.parquet"))
        tbl = pq.read_table(files, columns=["doc_id", "content"],
                            filters=_pc.field("doc_id").isin(
                                pa.array(ids, pa.int64())))
        return dict(zip(tbl.column("doc_id").to_pylist(),
                        tbl.column("content").to_pylist()))

    def search_with_snippets(self, text: str, k: int = 10,
                             method: str = "vectorized",
                             window_chars: int = 160,
                             spell_correct: bool = False
                             ) -> list[tuple[int, float, str]]:
        """BM25 top-k hydrated with a contextual snippet: a ~window_chars
        slice of the document around the earliest query-term occurrence
        (whole-word, case-insensitive), trimmed to whitespace bounds."""
        import re

        hits = self.search(text, k, method=method,
                           spell_correct=spell_correct)
        if not hits:
            return []
        texts = self.fetch_docs([d for d, _ in hits])
        raws = [re.escape(r) for r in self.analyzer.raw_tokens(text)]
        pat = re.compile(r"(?<!\w)(" + "|".join(raws) + r")(?!\w)",
                         re.IGNORECASE) if raws else None
        out = []
        for doc, score in hits:
            body = texts.get(doc, "")
            m = pat.search(body) if pat else None
            if m is None:
                snip = body[:window_chars]
            else:
                lo = max(0, m.start() - window_chars // 2)
                hi = min(len(body), m.end() + window_chars // 2)
                snip = body[lo:hi]
                if lo > 0:
                    snip = snip.split(" ", 1)[-1]
                if hi < len(body):
                    snip = snip.rsplit(" ", 1)[0]
            out.append((doc, score, snip.strip()))
        return out

    def proximity_search(self, text: str, window: int = 8
                         ) -> list[tuple[int, int]]:
        """Ordered within-window co-occurrence over positional postings:
        docs containing the query tokens at positions ``p_0 < p_1 < ...``
        with ``p_i - p_{i-1} <= window``. Returns ``[(doc_id, n_chains)]``
        ascending by doc_id, where ``n_chains`` counts every qualifying
        position tuple — exactly what the oracle's m-way positional
        self-join counts. ``window=1`` degenerates to the phrase chain.

        Per doc the count is a vectorized DP over the per-term position
        lists: chains ending at position q of term i = sum of chains of
        term i-1 ending in ``[q-window, q)`` (prefix-sum + two
        searchsorted per consecutive term pair — no tuple enumeration,
        so a combinatorial blowup of qualifying tuples stays O(positions)).
        """
        raws = self.analyzer.raw_tokens(text)
        seq: list[str] = []
        for r in raws:
            exp = self.analyzer.expand(r)
            if not exp:
                return []
            seq.append(exp[0])
        if not seq:
            return []
        per_term = {}
        for t in set(seq):
            got = self._positions_for(t)
            if got is None:
                return []
            per_term[t] = got
        doc_sets = sorted((per_term[t][0] for t in set(seq)), key=len)
        cand = doc_sets[0]
        for d in doc_sets[1:]:
            cand = cand[np.isin(cand, d, assume_unique=True)]
            if len(cand) == 0:
                return []
        if self._alive is not None:
            cand = cand[self._alive[np.searchsorted(self._dl_ids, cand)]]
        out: list[tuple[int, int]] = []
        for doc in cand.tolist():
            prev_pos = prev_cnt = None
            for i, t in enumerate(seq):
                docs_t, pos_t, offs_t = per_term[t]
                j = int(np.searchsorted(docs_t, doc))
                p = pos_t[offs_t[j]:offs_t[j + 1]].astype(np.int64)
                if i == 0:
                    prev_pos, prev_cnt = p, np.ones(len(p), dtype=np.int64)
                else:
                    lo = np.searchsorted(prev_pos, p - window, side="left")
                    hi = np.searchsorted(prev_pos, p, side="left")
                    csum = np.concatenate([[0], np.cumsum(prev_cnt)])
                    cnt = csum[hi] - csum[lo]
                    keep = cnt > 0
                    prev_pos, prev_cnt = p[keep], cnt[keep]
                if len(prev_pos) == 0:
                    break
            if prev_pos is not None and len(prev_pos):
                out.append((doc, int(prev_cnt.sum())))
        return out


def _scalar_contrib(tf: int, dl: int, idf_t: float, avgdl: float,
                    k1: float, b: float) -> float:
    tf_f = float(tf)
    denom = tf_f + k1 * (1.0 - b + b * float(dl) / avgdl)
    return idf_t * tf_f * (k1 + 1.0) / denom


def _resolve_shared(data_ref):
    """Resolve a stage's index argument: a ``load_index_shared`` struct
    (assembled here, zero-copy), a plain ``ObjectRef`` to a full data
    dict (legacy), or ``None`` (each actor loads for itself)."""
    if data_ref is None:
        return None
    if isinstance(data_ref, dict) and "part_refs" in data_ref:
        return assemble_index_data(data_ref)
    import ray

    return ray.get(data_ref)


class QueryExecutorStage:
    """Actor-pool stage: ``map_batches(QueryExecutorStage, concurrency=N,
    batch_format="pyarrow")`` over a queries dataset ``(query_id, text)``.
    Index loaded ONCE per actor in ``__init__`` (reference loads its
    pickled index once per process, ``search_engine.py:62-71``)."""

    def __init__(self, index_root: str, config: IndexConfig | None = None,
                 k: int = 10, method: str = "vectorized", data_ref=None,
                 spell_correct: bool = False):
        self.searcher = IndexSearcher(index_root, config,
                                      data=_resolve_shared(data_ref))
        self.k = k
        self.method = method
        self.spell_correct = bool(spell_correct)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in zip(batch.column("query_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for rank, (doc, score) in enumerate(
                    self.searcher.search(text, self.k, self.method,
                                         spell_correct=self.spell_correct),
                    start=1):
                qids.append(qid); ranks.append(rank)
                docs.append(doc); scores.append(score)
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "rank": pa.array(ranks, pa.int32()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "score": pa.array(scores, pa.float64())},
                        schema=RESULTS_SCHEMA)


class PhraseExecutorStage:
    """Actor-pool stage for phrase queries: ``map_batches(PhraseExecutorStage,
    ...)`` over (query_id, text) batches; emits (query_id, doc_id,
    n_matches). Index (with positions) loaded once per actor."""

    def __init__(self, index_root: str, config: IndexConfig | None = None,
                 data_ref=None):
        self.searcher = IndexSearcher(index_root, config,
                                      data=_resolve_shared(data_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, counts = [], [], []
        for qid, text in zip(batch.column("query_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for doc, n in self.searcher.phrase_search(text):
                qids.append(qid); docs.append(doc); counts.append(n)
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "n_matches": pa.array(counts, pa.int64())})


class BooleanExecutorStage:
    """Actor-pool stage for boolean AND/NOT queries over (query_id,
    text) batches; emits (query_id, doc_id). Index loaded once per
    actor (positions not needed)."""

    def __init__(self, index_root: str, config: IndexConfig | None = None,
                 data_ref=None):
        self.searcher = IndexSearcher(index_root, config,
                                      data=_resolve_shared(data_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs = [], []
        for qid, text in zip(batch.column("query_id").to_pylist(),
                             batch.column("text").to_pylist()):
            hits = self.searcher.boolean_search(text)
            qids.extend([qid] * len(hits))
            docs.extend(hits.tolist())
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "doc_id": pa.array(docs, pa.int64())})


class TermsUnionExecutorStage:
    """Actor-pool stage for disjunctive (OR) retrieval over
    pre-expanded terms: batches of (query_id, terms) where ``terms`` is
    the space-joined expansion of a wildcard/prefix query; emits
    (query_id, doc_id, n_terms). Index loaded once per actor."""

    def __init__(self, index_root: str, config: IndexConfig | None = None,
                 data_ref=None):
        self.searcher = IndexSearcher(index_root, config,
                                      data=_resolve_shared(data_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, counts = [], [], []
        for qid, terms in zip(batch.column("query_id").to_pylist(),
                              batch.column("terms").to_pylist()):
            hits, n = self.searcher.terms_union(terms.split())
            qids.extend([qid] * len(hits))
            docs.extend(hits.tolist())
            counts.extend(n.tolist())
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "n_terms": pa.array(counts, pa.int64())})


class SpanFirstExecutorStage:
    """Actor-pool stage for span-first queries: batches of (query_id,
    text, limit); emits (query_id, doc_id, first_pos) for docs whose
    first occurrence of the term is before raw position ``limit``.
    Index (with positions) loaded once per actor."""

    def __init__(self, index_root: str, config: IndexConfig | None = None,
                 data_ref=None):
        self.searcher = IndexSearcher(index_root, config,
                                      data=_resolve_shared(data_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, fps = [], [], []
        for qid, text, lim in zip(batch.column("query_id").to_pylist(),
                                  batch.column("text").to_pylist(),
                                  batch.column("limit").to_pylist()):
            for doc, fp in self.searcher.span_first(text, int(lim)):
                qids.append(qid); docs.append(doc); fps.append(fp)
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "first_pos": pa.array(fps, pa.int64())})


def span_first_queries(index_root: str | IndexPaths, queries, *,
                       config: IndexConfig | None = None,
                       concurrency: int | tuple = 4, share_index: bool = True):
    """Run span-first queries through the actor pool; Dataset of
    (query_id, doc_id, first_pos). ``queries``: list[(query_id, text,
    limit)] or a Dataset with (query_id, text, limit)."""
    import ray
    import ray.data

    root = index_root.root if isinstance(index_root, IndexPaths) else str(index_root)
    data_ref = (load_index_shared(root, precompute_hot=False)
                if share_index else None)
    if not hasattr(queries, "map_batches"):
        queries = ray.data.from_items(
            [{"query_id": int(q), "text": t, "limit": int(lim)}
             for q, t, lim in queries])
    return queries.map_batches(
        SpanFirstExecutorStage, fn_constructor_args=(root, config, data_ref),
        batch_format="pyarrow", batch_size=8, concurrency=concurrency)


class FederatedPartialStage:
    """Scatter half of document-partitioned scatter-gather serving
    (Lucene MultiReader / every sharded web index): batches of
    (query_id, text, shard) rows, each scored against THAT shard only,
    with GLOBAL collection stats (N, avgdl, per-term df) injected via
    ``stats_override`` so shard-local idf skew can't bend ranks; emits
    per-shard partial top-k (query_id, doc_id, score). Shard searchers
    open lazily on first touch and persist per actor — an actor only
    ever pays for the shards its rows route to (on a real cluster the
    pool is sized per shard-host and rows arrive pre-bucketed)."""

    def __init__(self, shard_roots: list[str], config: IndexConfig | None,
                 stats_ref, k: int = 10):
        import ray

        self.roots = list(shard_roots)
        self.config = config
        self.k = int(k)
        self.stats = (ray.get(stats_ref)
                      if isinstance(stats_ref, ray.ObjectRef) else stats_ref)
        self._searchers: dict[int, IndexSearcher] = {}

    def _shard(self, s: int) -> "IndexSearcher":
        got = self._searchers.get(s)
        if got is None:
            got = IndexSearcher(self.roots[s], self.config,
                                stats_override=self.stats)
            self._searchers[s] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, scores = [], [], []
        for qid, text, shard in zip(batch.column("query_id").to_pylist(),
                                    batch.column("text").to_pylist(),
                                    batch.column("shard").to_pylist()):
            for doc, score in self._shard(int(shard)).search(text, self.k):
                qids.append(qid); docs.append(doc); scores.append(score)
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "score": pa.array(scores, pa.float64())})


class ProximityExecutorStage:
    """Actor-pool stage for within-window co-occurrence queries; emits
    (query_id, doc_id, n_chains). Index (with positions) loaded once
    per actor."""

    def __init__(self, index_root: str, window: int = 8,
                 config: IndexConfig | None = None, data_ref=None):
        self.searcher = IndexSearcher(index_root, config,
                                      data=_resolve_shared(data_ref))
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, counts = [], [], []
        windows = (batch.column("window").to_pylist()
                   if "window" in batch.column_names
                   else [self.window] * batch.num_rows)
        for qid, text, w in zip(batch.column("query_id").to_pylist(),
                                batch.column("text").to_pylist(), windows):
            for doc, n in self.searcher.proximity_search(text, int(w)):
                qids.append(qid); docs.append(doc); counts.append(n)
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "n_chains": pa.array(counts, pa.int64())})


def phrase_queries(index_root: str | IndexPaths, queries, *,
                   config: IndexConfig | None = None,
                   concurrency: int | tuple = 4, share_index: bool = True):
    """Run phrase queries through the actor pool; Dataset of
    (query_id, doc_id, n_matches)."""
    import ray
    import ray.data

    root = index_root.root if isinstance(index_root, IndexPaths) else str(index_root)
    data_ref = (load_index_shared(root, precompute_hot=False)
                if share_index else None)
    if not hasattr(queries, "map_batches"):
        queries = ray.data.from_items(
            [{"query_id": int(q), "text": t} for q, t in queries])
    return queries.map_batches(
        PhraseExecutorStage, fn_constructor_args=(root, config, data_ref),
        batch_format="pyarrow", batch_size=8, concurrency=concurrency)


def boolean_queries(index_root: str | IndexPaths, queries, *,
                    config: IndexConfig | None = None,
                    concurrency: int | tuple = 4, share_index: bool = True):
    """Run boolean AND/NOT queries through the actor pool; Dataset of
    (query_id, doc_id)."""
    import ray
    import ray.data

    root = index_root.root if isinstance(index_root, IndexPaths) else str(index_root)
    data_ref = (load_index_shared(root, precompute_hot=False)
                if share_index else None)
    if not hasattr(queries, "map_batches"):
        queries = ray.data.from_items(
            [{"query_id": int(q), "text": t} for q, t in queries])
    return queries.map_batches(
        BooleanExecutorStage, fn_constructor_args=(root, config, data_ref),
        batch_format="pyarrow", batch_size=8, concurrency=concurrency)


def terms_union_queries(index_root: str | IndexPaths, queries, *,
                        config: IndexConfig | None = None,
                        concurrency: int | tuple = 4,
                        share_index: bool = True):
    """Run pre-expanded OR queries through the actor pool; Dataset of
    (query_id, doc_id, n_terms). ``queries``: list[(query_id,
    space_joined_terms)] or a Dataset with (query_id, terms)."""
    import ray
    import ray.data

    root = index_root.root if isinstance(index_root, IndexPaths) else str(index_root)
    data_ref = (load_index_shared(root, precompute_hot=False)
                if share_index else None)
    if not hasattr(queries, "map_batches"):
        queries = ray.data.from_items(
            [{"query_id": int(q), "terms": t} for q, t in queries])
    return queries.map_batches(
        TermsUnionExecutorStage, fn_constructor_args=(root, config, data_ref),
        batch_format="pyarrow", batch_size=8, concurrency=concurrency)


def proximity_queries(index_root: str | IndexPaths, queries, *,
                      window: int = 8, config: IndexConfig | None = None,
                      concurrency: int | tuple = 4, share_index: bool = True):
    """Run proximity queries through the actor pool; Dataset of
    (query_id, doc_id, n_chains). ``queries`` rows may carry a
    per-query ``window`` (3-tuples), else ``window`` applies to all."""
    import ray
    import ray.data

    root = index_root.root if isinstance(index_root, IndexPaths) else str(index_root)
    data_ref = (load_index_shared(root, precompute_hot=False)
                if share_index else None)
    if not hasattr(queries, "map_batches"):
        items = []
        for q in queries:
            if len(q) == 3:
                items.append({"query_id": int(q[0]), "text": q[1],
                              "window": int(q[2])})
            else:
                items.append({"query_id": int(q[0]), "text": q[1],
                              "window": int(window)})
        queries = ray.data.from_items(items)
    return queries.map_batches(
        ProximityExecutorStage,
        fn_constructor_args=(root, window, config, data_ref),
        batch_format="pyarrow", batch_size=8, concurrency=concurrency)


def search_queries(index_root: str | IndexPaths, queries, *, k: int = 10,
                   config: IndexConfig | None = None, method: str = "vectorized",
                   concurrency: int | tuple = 4, share_index: bool = True,
                   spell_correct: bool = False):
    """Run a query set through the actor-pool executors.

    ``queries``: list[(query_id, text)] or a Dataset with (query_id, text).
    Returns a Dataset of (query_id, rank, doc_id, score).

    ``share_index=True`` loads the index once on the driver and ships it
    through the object store — actors start instantly instead of each
    re-reading the postings parquet.
    """
    import ray
    import ray.data

    root = index_root.root if isinstance(index_root, IndexPaths) else str(index_root)
    data_ref = load_index_shared(root) if share_index else None
    if not hasattr(queries, "map_batches"):
        queries = ray.data.from_items(
            [{"query_id": int(q), "text": t} for q, t in queries])
    return queries.map_batches(
        QueryExecutorStage,
        fn_constructor_args=(root, config, k, method, data_ref, spell_correct),
        batch_format="pyarrow", batch_size=8, concurrency=concurrency)


class QueryService:
    """Persistent query-serving pool — explicit Ray actors.

    The ``map_batches`` stage (``QueryExecutorStage``) is the batch API;
    this is the serving shape (the reference served queries
    interactively through its GUI / ``search_and_rank_query`` loop,
    ``search_engine.py:74-81``): N long-lived actors each attach to the
    plasma-shared index once, then answer query batches round-robin.
    Used by ``bench.py`` to measure steady-state query throughput with
    pool spin-up reported separately from per-query cost.
    """

    def __init__(self, index_root: str | IndexPaths, config: IndexConfig | None = None,
                 num_actors: int = 4, k: int = 10, method: str = "vectorized",
                 hot_postings_budget: int = 256_000_000,
                 pool_cache_min_df: int = 65536):
        # budget sizing: ~24 B/posting of shared image (6 GiB at the
        # default) — size to the node's plasma store, NOT to the query
        # volume: per-actor cold decoding of head terms is duplicated
        # memory-bound work that anti-scales with pool size, while this
        # precompute parallelizes across part-load tasks (see
        # _precompute_hot_terms). 256M postings covers the entire
        # df>=1024 head of the bench corpus index with room to spare.
        import time

        import ray

        root = index_root.root if isinstance(index_root, IndexPaths) else str(index_root)
        self.spinup_breakdown: dict[str, float] = {}
        t0 = time.time()
        shared = load_index_shared(root, hot_postings_budget=hot_postings_budget)
        self.k = k

        @ray.remote
        class _QueryActor:
            def __init__(self, root, config, shared, method, pool_cache,
                         pool_min_df):
                # nested refs inside the dict are NOT auto-resolved;
                # every actor attaches to the one plasma copy per part
                self.searcher = IndexSearcher(root, config,
                                              data=assemble_index_data(shared),
                                              pool_cache=pool_cache,
                                              pool_cache_min_df=pool_min_df)
                self.method = method

            def warm_publish(self, queries, rank, n):
                return self.searcher.warm_publish(queries, rank, n)

            def search_batch(self, queries, k):
                # columnar return: four numpy arrays serialize as flat
                # buffers — per-row Python tuples cost a pickle op per
                # HIT and a driver-side row loop, a constant overhead
                # that eats the wall gains of a bigger pool
                qids, ranks, docs, scores = [], [], [], []
                for qid, text in queries:
                    hits = self.searcher.search(text, k, self.method)
                    qids.extend([qid] * len(hits))
                    ranks.extend(range(1, len(hits) + 1))
                    for doc, score in hits:
                        docs.append(doc)
                        scores.append(score)
                return (np.asarray(qids, dtype=np.int64),
                        np.asarray(ranks, dtype=np.int32),
                        np.asarray(docs, dtype=np.int64),
                        np.asarray(scores, dtype=np.float64))

        # actor processes spawn WHILE the part-load/precompute tasks run
        # (each actor's assemble blocks on the part refs inside __init__
        # anyway): process start-up is hidden behind the load wall.
        # "load" = parallel part-load + hot-precompute task wall; the
        # old driver-heap materialize + multi-GB re-ray.put is gone, so
        # "put" (kept for bench-key continuity) measures only ref plumbing
        # pool-shared cold-decode registry: one decode per POOL for the
        # df>=65536 tier the hot image doesn't cover (num_cpus=0 — the
        # registry only does dict ops; payloads live in plasma)
        self._pool_cache = (ray.remote(_SharedDecodeCache)
                            .options(num_cpus=0).remote()
                            if num_actors > 1 else None)
        self.actors = [_QueryActor.remote(root, config, shared, method,
                                          self._pool_cache, pool_cache_min_df)
                       for _ in range(num_actors)]
        # pin the write-behind persist tasks for the pool's lifetime
        # (dropping their refs could cancel an unscheduled persist)
        self._persist_refs = shared.get("persist_refs", [])
        ray.wait(shared["part_refs"], num_returns=len(shared["part_refs"]),
                 fetch_local=False)
        self.spinup_breakdown["load"] = round(time.time() - t0, 3)
        self.spinup_breakdown["put"] = 0.0
        t0 = time.time()
        ray.get([a.search_batch.remote([], self.k) for a in self.actors])
        self.spinup_breakdown["actors"] = round(time.time() - t0, 3)

    def warmup(self, queries: list[tuple[int, str]]):
        import time

        import ray

        t0 = time.time()
        if self._pool_cache is not None and len(self.actors) > 1:
            # term-OWNERSHIP pre-pass: every actor parses all warm-up
            # queries but decodes + publishes only the cold terms it
            # owns by hash (warm_publish), so each term's DRAM-bound
            # decode happens exactly once across the pool, in parallel —
            # no serial single-actor bottleneck (36 s of the 52 s sf1
            # re-serve), and no race on the shared stop-word-scale
            # terms that scattering whole queries would still duplicate.
            n = len(self.actors)
            ray.get([self.actors[i].warm_publish.remote(queries, i, n)
                     for i in range(n)])
        ray.get([a.search_batch.remote(queries, self.k) for a in self.actors])
        self.spinup_breakdown["warmup"] = round(time.time() - t0, 3)

    def search_batch(self, queries: list[tuple[int, str]], k: int | None = None,
                     chunk: int = 64, depth: int = 2):
        """Dispatch the query list over the pool with DYNAMIC load
        balancing; returns a pandas DataFrame (query_id, rank, doc_id,
        score).

        Static round-robin pre-assignment gates the whole batch on the
        slowest actor (co-tenant CPU steal makes actor speeds uneven on
        a shared box; on a real cluster, node heterogeneity does): each
        actor keeps ``depth`` chunks in flight and receives the next one
        only when it finishes, so fast actors absorb the tail."""
        import pandas as pd
        import ray

        k = k or self.k
        chunks = [queries[i:i + chunk] for i in range(0, len(queries), chunk)]
        chunks.reverse()                      # pop() consumes in order
        in_flight: dict = {}
        parts = []
        for a in self.actors:
            for _ in range(depth):
                if chunks:
                    in_flight[a.search_batch.remote(chunks.pop(), k)] = a
        while in_flight:
            done, _ = ray.wait(list(in_flight), num_returns=1)
            for r in done:
                a = in_flight.pop(r)
                parts.append(ray.get(r))
                if chunks:
                    in_flight[a.search_batch.remote(chunks.pop(), k)] = a
        if not parts:
            return pd.DataFrame(columns=["query_id", "rank", "doc_id", "score"])
        return pd.DataFrame({
            "query_id": np.concatenate([p[0] for p in parts]),
            "rank": np.concatenate([p[1] for p in parts]),
            "doc_id": np.concatenate([p[2] for p in parts]),
            "score": np.concatenate([p[3] for p in parts]),
        })

    def drain_persist(self, timeout: float | None = None) -> int:
        """Block until the write-behind hot-image persists finish;
        returns how many parts were actually written this serve (0 on
        a full cache hit). Tests and benchmarks call this before
        measuring a re-serve; production never needs to."""
        import ray

        if not self._persist_refs:
            return 0
        done = ray.get(self._persist_refs, timeout=timeout)
        return sum(1 for d in done if d)

    def shutdown(self, wait_persist: bool = True):
        import ray

        if wait_persist:
            # let in-flight cache writes finish so the next serve's
            # mmap fast-path sees them (they are cheap I/O tasks)
            try:
                self.drain_persist(timeout=120)
            except Exception:
                pass
        for a in self.actors:
            ray.kill(a)
        self.actors = []
        if self._pool_cache is not None:
            ray.kill(self._pool_cache)
            self._pool_cache = None
