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
    * ``"bmw"``: document-at-a-time block-max WAND (Ding & Suel 2011)
      — skips blocks whose summed upper bounds can't beat the k-th
      score. Tested rank-identical to exhaustive.
- ``QueryExecutorStage`` — the actor-pool ``map_batches`` wrapper
  (stateful stage T3/T4 of SURVEY §2.3): index loaded once per actor in
  ``__init__``, batches of queries scored in ``__call__``.

Scale note: doc lengths are held as (sorted doc_id array, len array)
and probed with searchsorted. At 10^12 docs this table would be
sharded with the postings (doc-bucket-aligned) instead of loaded whole;
the lookup API is already bucket-local so only the loader changes.
"""

from __future__ import annotations

import heapq
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


def _blocks_from_row(row: dict) -> PostingBlocks:
    doc_sizes = np.asarray(row["doc_sizes"], dtype=np.int64)
    tf_sizes = np.asarray(row["tf_sizes"], dtype=np.int64)
    doc_offsets = np.zeros(len(doc_sizes) + 1, dtype=np.int64)
    tf_offsets = np.zeros(len(tf_sizes) + 1, dtype=np.int64)
    np.cumsum(doc_sizes, out=doc_offsets[1:])
    np.cumsum(tf_sizes, out=tf_offsets[1:])
    return PostingBlocks(row["doc_bytes"], row["tf_bytes"],
                         np.asarray(row["counts"], dtype=np.int32),
                         np.asarray(row["last_docs"], dtype=np.int64),
                         np.asarray(row["max_tfs"], dtype=np.int32),
                         doc_offsets, tf_offsets)


class IndexSearcher:
    """Loads an index built by ``build_index`` and answers BM25 top-k."""

    def __init__(self, index: IndexPaths | str, config: IndexConfig | None = None,
                 preload: bool = False):
        self.paths = index if isinstance(index, IndexPaths) else IndexPaths(str(index))
        self.meta = json.loads(Path(self.paths.meta_path).read_text())
        self.config = config or IndexConfig()
        # scoring params come from the built index, not the caller
        c = self.meta.get("config", {})
        self.k1 = float(c.get("k1", 1.2))
        self.b = float(c.get("b", 0.75))
        self.N = int(self.meta["N"])
        self.avgdl = float(self.meta["avgdl"])
        self.num_term_parts = int(self.meta["num_term_parts"])
        self.analyzer = Analyzer(self.config)
        # dictionary: term -> (df_total, [(part, bucket, df)])
        dict_tbl = pq.read_table(sorted(Path(self.paths.dictionary).glob("*.parquet")))
        self._df: dict[str, int] = {}
        self._rows: dict[str, list[tuple[int, int]]] = {}
        terms = dict_tbl.column("term").to_pylist()
        parts = dict_tbl.column("part").to_pylist()
        buckets = dict_tbl.column("bucket").to_pylist()
        dfs = dict_tbl.column("df").to_pylist()
        for t, p, bk, df in zip(terms, parts, buckets, dfs):
            self._df[t] = self._df.get(t, 0) + df
            self._rows.setdefault(t, []).append((p, bk))
        # doc lengths (sorted by doc_id for searchsorted probing)
        meta_tbl = pq.read_table(sorted(Path(self.paths.doc_meta).glob("*.parquet")),
                                 columns=["doc_id", "doc_len"])
        ids = meta_tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lens = meta_tbl.column("doc_len").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        self._dl_ids = ids[order]
        self._dl = lens[order]
        self._part_cache: dict[int, dict[tuple[str, int], dict]] = {}
        if preload:
            for p in range(self.num_term_parts):
                self._load_part(p)

    # ---- posting access ----

    def _load_part(self, part: int) -> dict[tuple[str, int], dict]:
        got = self._part_cache.get(part)
        if got is None:
            f = Path(self.paths.postings) / f"part-{part:05d}.parquet"
            got = {}
            if f.is_file():
                tbl = pq.read_table(f)
                for row in tbl.to_pylist():
                    got[(row["term"], row["bucket"])] = row
            self._part_cache[part] = got
        return got

    def postings_for(self, term: str) -> list[PostingBlocks]:
        """All bucket slices of a term, ascending doc-range order."""
        rows = self._rows.get(term)
        if not rows:
            return []
        out = []
        for part, bucket in sorted(rows, key=lambda pb: pb[1]):
            row = self._load_part(part).get((term, bucket))
            if row is not None:
                out.append(_blocks_from_row(row))
        return out

    def doc_lens(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self._dl_ids, doc_ids)
        return self._dl[idx]

    # ---- scoring ----

    def _query_terms(self, text: str) -> list[tuple[str, int]]:
        """Unique analyzed terms with query-tf, ascending unicode order
        (the canonical float-summation order — SURVEY §7)."""
        from collections import Counter

        qt = Counter(self.analyzer.terms(text))
        return [(t, qt[t]) for t in sorted(qt) if t in self._df]

    def search(self, text: str, k: int = 10, method: str = "vectorized"
               ) -> list[tuple[int, float]]:
        qterms = self._query_terms(text)
        if not qterms:
            return []
        if method == "bmw":
            return self._search_bmw(qterms, k)
        return self._search_vectorized(qterms, k)

    def _search_vectorized(self, qterms: list[tuple[str, int]], k: int
                           ) -> list[tuple[int, float]]:
        per_term: list[tuple[np.ndarray, np.ndarray, float]] = []
        for term, qtf in qterms:
            slices = self.postings_for(term)
            if not slices:
                continue
            from searchengine_ray.codec import concat_blocks, decode_blocks

            docs, tfs = decode_blocks(concat_blocks(slices))
            idf_t = float(bm25_idf(self.N, self._df[term]))
            contrib = qtf * bm25_term_scores(
                tfs, self.doc_lens(docs), idf_t=idf_t, avgdl=self.avgdl,
                k1=self.k1, b=self.b)
            per_term.append((docs, contrib, idf_t))
        if not per_term:
            return []
        cand = np.unique(np.concatenate([d for d, _, _ in per_term]))
        scores = np.zeros(len(cand), dtype=np.float64)
        for docs, contrib, _ in per_term:      # ascending term order preserved
            scores[np.searchsorted(cand, docs)] += contrib
        top = top_k_indices(scores, cand, k)
        return [(int(cand[i]), float(scores[i])) for i in top]

    def _search_bmw(self, qterms: list[tuple[str, int]], k: int
                    ) -> list[tuple[int, float]]:
        """Block-max WAND, document-at-a-time with block skipping."""
        cursors = []
        for term, qtf in qterms:
            slices = self.postings_for(term)
            if not slices:
                continue
            from searchengine_ray.codec import concat_blocks

            pb = concat_blocks(slices)
            idf_t = float(bm25_idf(self.N, self._df[term]))
            cursors.append(_TermCursor(term, qtf, idf_t, pb, self.k1, self.b))
        if not cursors:
            return []
        heap: list[tuple[float, int]] = []   # min-heap of (score, -doc_id)
        theta = -np.inf
        while True:
            live = [c for c in cursors if not c.exhausted]
            if not live:
                break
            live.sort(key=lambda c: c.cur_doc)
            # pivot: first term where cumulative global UB exceeds theta
            acc = 0.0
            pivot_i = None
            for i, c in enumerate(live):
                acc += c.global_ub
                if acc > theta:
                    pivot_i = i
                    break
            if pivot_i is None:
                break
            pivot_doc = live[pivot_i].cur_doc
            if live[0].cur_doc == pivot_doc:
                # block-max check: refine with the actual block maxima at pivot_doc
                block_ub = sum(c.block_ub(pivot_doc) for c in live
                               if c.cur_doc <= pivot_doc and not c.exhausted)
                if block_ub > theta:
                    score = 0.0
                    # canonical order: ascending term
                    for c in sorted((c for c in live if c.cur_doc == pivot_doc),
                                    key=lambda c: c.term):
                        score += c.score_current(self.avgdl, self._doc_len_scalar(pivot_doc))
                    if len(heap) < k:
                        heapq.heappush(heap, (score, -pivot_doc))
                    elif (score, -pivot_doc) > heap[0]:
                        heapq.heapreplace(heap, (score, -pivot_doc))
                    if len(heap) == k:
                        theta = heap[0][0]
                for c in live:
                    if c.cur_doc == pivot_doc:
                        c.advance()
            else:
                for c in live:
                    if c.cur_doc < pivot_doc:
                        c.seek_geq(pivot_doc)
        out = sorted(((-d, s) for s, d in heap), key=lambda t: (-t[1], t[0]))
        return [(d, s) for d, s in out[:k]]

    def _doc_len_scalar(self, doc_id: int) -> int:
        i = int(np.searchsorted(self._dl_ids, doc_id))
        return int(self._dl[i])


class _TermCursor:
    """Posting cursor with per-block decode + block-max upper bounds."""

    def __init__(self, term: str, qtf: int, idf_t: float, pb: PostingBlocks,
                 k1: float, b: float):
        self.term = term
        self.qtf = qtf
        self.idf = idf_t
        self.pb = pb
        self.k1 = k1
        self.b = b
        # UB with dl -> 0 (denominator lower bound): monotone in tf
        mt = pb.max_tfs.astype(np.float64)
        self.block_ubs = qtf * idf_t * mt * (k1 + 1.0) / (mt + k1 * (1.0 - b))
        self.global_ub = float(self.block_ubs.max(initial=0.0))
        self.block_i = 0
        self.in_block = 0
        self.exhausted = pb.n_blocks == 0
        self._docs: np.ndarray | None = None
        self._tfs: np.ndarray | None = None
        if not self.exhausted:
            self._decode_block()

    def _decode_block(self):
        from searchengine_ray.codec import decode_single_block

        self._docs, self._tfs = decode_single_block(self.pb, self.block_i)
        self.in_block = 0

    @property
    def cur_doc(self) -> int:
        return int(self._docs[self.in_block]) if not self.exhausted else 1 << 62

    def block_ub(self, doc: int) -> float:
        """Upper bound of the block that would contain ``doc``."""
        if self.exhausted:
            return 0.0
        j = int(np.searchsorted(self.pb.last_docs, doc))
        if j >= self.pb.n_blocks:
            return 0.0
        return float(self.block_ubs[j])

    def score_current(self, avgdl: float, dl: int) -> float:
        tf = int(self._tfs[self.in_block])
        # same float op order as the oracle/vectorized path
        return self.qtf * _scalar_contrib(tf, dl, self.idf, avgdl, self.k1, self.b)

    def advance(self):
        self.in_block += 1
        if self.in_block >= len(self._docs):
            self.block_i += 1
            if self.block_i >= self.pb.n_blocks:
                self.exhausted = True
            else:
                self._decode_block()

    def seek_geq(self, doc: int):
        if self.exhausted:
            return
        j = int(np.searchsorted(self.pb.last_docs, doc))
        if j >= self.pb.n_blocks:
            self.exhausted = True
            return
        if j != self.block_i:
            self.block_i = j
            self._decode_block()
        self.in_block = int(np.searchsorted(self._docs, doc))
        if self.in_block >= len(self._docs):   # can't happen given last_docs >= doc
            self.advance()


def _scalar_contrib(tf: int, dl: int, idf_t: float, avgdl: float,
                    k1: float, b: float) -> float:
    tf_f = float(tf)
    denom = tf_f + k1 * (1.0 - b + b * float(dl) / avgdl)
    return idf_t * tf_f * (k1 + 1.0) / denom


class QueryExecutorStage:
    """Actor-pool stage: ``map_batches(QueryExecutorStage, concurrency=N,
    batch_format="pyarrow")`` over a queries dataset ``(query_id, text)``.
    Index loaded ONCE per actor in ``__init__`` (reference loads its
    pickled index once per process, ``search_engine.py:62-71``)."""

    def __init__(self, index_root: str, config: IndexConfig | None = None,
                 k: int = 10, method: str = "vectorized", preload: bool = True):
        self.searcher = IndexSearcher(index_root, config, preload=preload)
        self.k = k
        self.method = method

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text in zip(batch.column("query_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for rank, (doc, score) in enumerate(
                    self.searcher.search(text, self.k, self.method), start=1):
                qids.append(qid); ranks.append(rank)
                docs.append(doc); scores.append(score)
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "rank": pa.array(ranks, pa.int32()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "score": pa.array(scores, pa.float64())},
                        schema=RESULTS_SCHEMA)


def search_queries(index_root: str | IndexPaths, queries, *, k: int = 10,
                   config: IndexConfig | None = None, method: str = "vectorized",
                   concurrency: int = 4):
    """Run a query set through the actor-pool executors.

    ``queries``: list[(query_id, text)] or a Dataset with (query_id, text).
    Returns a Dataset of (query_id, rank, doc_id, score).
    """
    import ray.data

    root = index_root.root if isinstance(index_root, IndexPaths) else str(index_root)
    if not hasattr(queries, "map_batches"):
        queries = ray.data.from_items(
            [{"query_id": int(q), "text": t} for q, t in queries])
    return queries.map_batches(
        QueryExecutorStage, fn_constructor_args=(root, config, k, method),
        batch_format="pyarrow", batch_size=32, concurrency=concurrency)
