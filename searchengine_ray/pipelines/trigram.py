"""Trigram-indexed substring / regex retrieval — the Google-CodeSearch
/ Zoekt layer the code-search north star implies.

``regex_search`` (textstats.py) is the honest full-scan grep; at
10^12 files the production answer is a CHARACTER-TRIGRAM inverted
index (R. Cox, "Regular Expression Matching with a Trigram Index",
swtch.com/~rsc/regexp/regexp4.html; Zoekt): a substring query must
contain every trigram of the needle, so intersecting tiny trigram
posting lists yields a candidate set, and only candidates' texts are
read for exact verification. A regex query is accelerated the same way
through a conservatively-extracted REQUIRED LITERAL.

Shapes (all 100-TB-safe). The index is DOC-SHARDED, exactly like
Zoekt: every shard file holds the COMPLETE gram set of its document
range, gram-sorted. Two earlier layouts were built and measured out
at the 500k rehearsal: a gram-partitioned global posting exchange
(build 108s — the all-to-all dominates) and the same layout
segment-flushed (build 9s, but substring candidates then need a
cross-part (query, doc) groupby to intersect — 41s of sort-aggregate
over the hot-gram posting mass). Doc-sharding removes both: a doc's
grams never leave their shard, so intersection is SHARD-LOCAL
vectorized numpy and the whole query plan has zero shuffle.
- build: one map_batches pass extracts per-doc distinct trigram codes
  (vectorized utf-32 -> packed int64) and flushes one gram-sorted
  shard file per batch; `compact_trigram_index` folds shard groups
  into fewer files, Lucene-merge style (doc-range completeness is
  preserved by construction);
- query: one task per shard file opens it with a scanner predicate on
  the needed grams (gram-sorted row groups -> statistics pruning),
  intersects locally (docs holding ALL needle grams), and emits only
  candidate (query, doc) pairs; verification routes candidates to
  hash partitions whose tasks read ONLY the texts they reference (the
  JaccardVerifyGroup discipline, dedup.py:233-268);
- nothing text-scale ever broadcasts or lands on the driver.

Trigram semantics are UNICODE CODE POINTS (3 consecutive characters),
matching DuckDB ``substr`` character arithmetic exactly, so the whole
family is SQL-hash-verifiable: the index face replays via
``generate_series`` shingling, the search faces via ``position()`` /
``regexp_extract_all`` over the raw corpus.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.common import int64_col, read, table_path

_MASK21 = (1 << 21) - 1
_N_VERIFY_PARTS = 8
_ROW_GROUP = 1 << 16


def _gram_codes(text: str) -> np.ndarray:
    """Distinct packed trigram codes of one text: 3 consecutive code
    points packed (a<<42)|(b<<21)|c into int64 (21 bits covers all of
    Unicode). Vectorized over the utf-32 view; O(len) no Python loop."""
    if len(text) < 3:
        return np.empty(0, dtype=np.int64)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    grams = (cp[:-2] << 42) | (cp[1:-1] << 21) | cp[2:]
    return np.unique(grams)


def _code_to_str(code: int) -> str:
    return (chr((code >> 42) & _MASK21) + chr((code >> 21) & _MASK21)
            + chr(code & _MASK21))


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


class _ShardFlush:
    """Extract + sort + WRITE in one shuffle-free pass: each batch of
    documents flushes ONE gram-sorted shard file
    (``shard_<gen>_<first doc id>.parquet``) holding the COMPLETE gram
    set of every doc in the batch, and returns only a tiny
    (shard, n_rows) stats row. Doc-sharding is the Zoekt layout: a
    doc's grams never leave their shard, so substring intersection is
    shard-local (see `_ShardCandidates`) and no stage of the build or
    the query plan shuffles. ``batch_size`` is the shard-size knob; at
    10^12 files each corpus partition flushes its own shard set."""

    def __init__(self, root: str, gen: str):
        self.root = root
        self.gen = gen

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        per_doc = [_gram_codes(t) for t in texts]
        empty = pa.table({"shard": pa.array([], pa.string()),
                          "n_rows": pa.array([], pa.int64())})
        if not per_doc:
            return empty
        grams = np.concatenate(per_doc)
        if len(grams) == 0:
            return empty
        docs = np.repeat(ids, [len(g) for g in per_doc])
        order = np.lexsort((docs, grams))
        name = f"shard_{self.gen}_{int(ids[0])}.parquet"
        tbl = pa.table({"gram": int64_col(grams[order]),
                        "doc_id": int64_col(docs[order])})
        pq.write_table(tbl, os.path.join(self.root, name),
                       row_group_size=_ROW_GROUP)
        return pa.table({"shard": pa.array([name], pa.string()),
                         "n_rows": int64_col([len(grams)])})


def _flush_shards(docs_ds, root: str, gen: str) -> list[tuple[str, int]]:
    stats = docs_ds.map_batches(
        _ShardFlush, fn_constructor_args=(root, gen),
        batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 8)).take_all()        # bounded: one row per shard
    return sorted((r["shard"], int(r["n_rows"])) for r in stats)


def _shard_files(root: str) -> list[str]:
    import glob as _glob

    return sorted(_glob.glob(os.path.join(root, "shard_*.parquet")))


def ensure_trigram_index(sf_dir: str) -> str:
    """Build (once per sf_dir, cached under /tmp) the doc-sharded
    trigram index: gram-sorted shard files flushed with zero shuffle
    (`_ShardFlush`), then compacted into at most `_COMPACT_FILES`
    larger shards so query-time row-group statistics prune effectively
    (a big sorted file's row groups each cover a narrow gram range; a
    small shard's row groups span the whole gram space and defeat
    pushdown)."""
    # Cache tag folds a corpus fingerprint (size+mtime of every
    # documents parquet) alongside the path, so regenerating different
    # content at the same sf_dir invalidates the cache instead of
    # serving a stale index (the build_index source_tag discipline).
    fp = _corpus_fingerprint(sf_dir)
    tag = hashlib.blake2b(f"{sf_dir}|{fp}".encode(),
                          digest_size=6).hexdigest()
    root = f"/tmp/graft_trigram_index/{tag}"
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fp:
            return root
        os.remove(marker)   # same tag, different content: rebuild
    os.makedirs(root, exist_ok=True)
    _wipe_shards(root)   # a crashed build's orphans would duplicate docs
    stats = _flush_shards(
        read(sf_dir, "documents", ["doc_id", "text"]), root, "1")
    compact_trigram_index(root)
    with open(marker, "w") as f:
        json.dump({"shards": stats, "fingerprint": fp}, f)
    return root


def _corpus_fingerprint(sf_dir: str) -> str:
    """size+mtime_ns of the documents table file(s) — cheap, no read."""
    import glob as _glob

    path = os.path.join(sf_dir, "documents.parquet")
    files = sorted(_glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True)) if os.path.isdir(path) \
        else ([path] if os.path.exists(path) else [])
    parts = []
    for f in files:
        st = os.stat(f)
        parts.append(f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.blake2b("|".join(parts).encode(),
                           digest_size=8).hexdigest()


def _wipe_shards(root: str) -> None:
    """Remove any shard files left by a crashed (marker-less) build:
    Ray batch boundaries differ between runs, so a rerun's shard names
    need not overwrite a partial run's — stale shards would hold
    duplicate doc gram sets and break the one-shard-per-doc invariant."""
    for f in _shard_files(root):
        os.remove(f)


_COMPACT_FILES = 8


def compact_trigram_index(root: str, k: int = _COMPACT_FILES) -> None:
    """Fold the shard files into at most ``k`` larger shards — the
    Lucene merge — PURGING any pending tombstones (a compaction must
    leave no trace of deleted docs; the tombstone file is dropped once
    every shard has been rewritten without them). Each merge task
    concatenates a GROUP of whole shards and re-sorts by gram, so the
    merged file still holds the complete gram set of every doc inside
    it (the invariant `_ShardCandidates` relies on). One Ray task per
    group."""
    import ray

    files = _shard_files(root)
    tomb = _tombstones(root)
    if len(files) <= k and len(tomb) == 0:
        return
    tomb_ref = ray.put(tomb)

    @ray.remote
    def _compact(idx: int, group: list[str], _tomb_ref) -> str:
        import pyarrow.parquet as pq

        tomb_ids = _tomb_ref          # ObjectRef arg auto-dereferenced
        tbl = pa.concat_tables([pq.read_table(f) for f in group])
        if len(tomb_ids):
            d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(tomb_ids, d),
                             len(tomb_ids) - 1)
            tbl = tbl.filter(pa.array(tomb_ids[pos] != d))
        tbl = tbl.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        dest = os.path.join(root, f"shard_c{idx}.parquet")
        tmp = dest + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=_ROW_GROUP)
        for f in group:
            os.remove(f)
        os.rename(tmp, dest)
        return dest

    groups = [files[i::k] for i in range(k)]
    ray.get([_compact.remote(i, g, tomb_ref)
             for i, g in enumerate(groups) if g])
    dp = os.path.join(root, "deletes.parquet")
    if os.path.exists(dp):
        os.remove(dp)


# ---- index face: trigram document frequency ----


class _TrigramDfPartial:
    """Per-batch (gram, df_p) partials — docs per gram within the batch
    (per-doc grams are distinct, so a bincount over the unique-inverse
    is the distinct-doc count). The `term_df` pre-aggregation shape."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        per_doc = [_gram_codes(t) for t in texts]
        per_doc = [g for g in per_doc if len(g)]
        if not per_doc:
            return pa.table({"gram": pa.array([], pa.int64()),
                             "df_p": pa.array([], pa.int64())})
        grams = np.concatenate(per_doc)
        uniq, counts = np.unique(grams, return_counts=True)
        return pa.table({"gram": int64_col(uniq), "df_p": int64_col(counts)})


def trigram_df(sf_dir: str):
    """(gram, df) — the trigram index dictionary: every distinct
    character trigram in the corpus with its document frequency. The
    SQL-checkable face of the trigram posting build (the posting lists
    themselves are exercised end-to-end by `trigram_substring_search` /
    `trigram_prune_stats`, whose candidate algebra only works if the
    lists are exact).

    Shape: pre-aggregated per-batch partials -> one trigram-key groupby
    sum; only (gram, df_p) integers ride the shuffle, never text."""

    def decode(batch: pa.Table) -> pa.Table:
        codes = batch.column("gram").to_numpy(zero_copy_only=False)
        return pa.table({
            "gram": pa.array([_code_to_str(int(c)) for c in codes], pa.string()),
            "df": batch.column("sum(df_p)").cast(pa.int64()),
        })

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _TrigramDfPartial, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4)).groupby("gram").sum("df_p").map_batches(
        decode, batch_format="pyarrow")


def trigram_df_sql() -> str:
    return """
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text) - 2)) AS p
  FROM documents WHERE length(text) >= 3),
g AS (SELECT DISTINCT doc_id, substr(text, p, 3) AS gram FROM pos)
SELECT gram, CAST(count(*) AS BIGINT) AS df FROM g GROUP BY gram
"""


# ---- substring retrieval through the index ----

SUBSTRING_QUERIES: list[tuple[int, str]] = [
    (1, "merge batch"),     # multi-word substring (crosses a space)
    (2, "table part"),
    (3, "customer"),        # single word, many docs
    (4, "zzznope"),         # no match anywhere
    (5, "agg"),             # length exactly 3: one gram, zero false positives
    (6, "slow query"),
]


def _needle_grams(needle: str) -> np.ndarray:
    return _gram_codes(needle)


class _ShardCandidates:
    """One task per SHARD FILE: open it with a scanner predicate on the
    union of needed grams (gram-sorted row groups -> statistics skip
    most of the file), then per query count each doc's distinct needle
    grams and keep docs holding ALL of them. Because a doc's complete
    gram set lives in this one shard, the intersection is final here —
    no cross-shard aggregation exists in the plan (the r4 rehearsal
    measured the gram-partitioned alternative spending 41s in exactly
    that (query, doc) sort-aggregate)."""

    def __init__(self, queries: list[tuple[int, str]]):
        self.qgrams = {qid: _needle_grams(n) for qid, n in queries}
        self.needed = np.unique(np.concatenate(list(self.qgrams.values())))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out_q, out_d = [], []
        for path in batch.column("path").to_pylist():
            t = pq.read_table(path, columns=["gram", "doc_id"],
                              filters=pc.field("gram").isin(
                                  pa.array(self.needed)))
            grams = t.column("gram").to_numpy(zero_copy_only=False)
            docs = t.column("doc_id").to_numpy(zero_copy_only=False)
            for qid, g in self.qgrams.items():
                m = np.isin(grams, g)
                if not m.any():
                    continue
                ud, cnt = np.unique(docs[m], return_counts=True)
                hit = ud[cnt == len(g)]
                out_q.append(np.full(len(hit), qid, np.int64))
                out_d.append(hit.astype(np.int64))
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({"query_id": int64_col(np.concatenate(out_q)),
                         "doc_id": int64_col(np.concatenate(out_d))})


def delete_trigram_docs(root: str, doc_ids) -> int:
    """Tombstone docs in a trigram index: queries drop them at
    candidate time; ``compact_trigram_index`` purges them physically
    (the Lucene delete->merge lifecycle, mirroring the full-text
    index's ``delete_documents`` at build.py). Repeated deletes union
    under a lock (single-node read-modify-write guard; cross-node
    delete coordination is control-plane, the caller's job). Returns
    the total tombstone count."""
    import pyarrow.parquet as pq

    ids = np.unique(np.asarray(list(doc_ids), np.int64))
    dp = os.path.join(root, "deletes.parquet")
    lock = os.path.join(root, ".deletes.lock")
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    try:
        import fcntl

        fcntl.flock(fd, fcntl.LOCK_EX)
        if os.path.exists(dp):
            old = pq.read_table(dp).column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            ids = np.unique(np.concatenate([old, ids]))
        tmp = dp + f".tmp-{os.getpid()}"
        pq.write_table(pa.table({"doc_id": int64_col(ids)}), tmp)
        os.replace(tmp, dp)
    finally:
        os.close(fd)
    return int(len(ids))


def _tombstones(root: str) -> np.ndarray:
    """Sorted tombstoned doc_ids of a trigram index ([] if none)."""
    import pyarrow.parquet as pq

    dp = os.path.join(root, "deletes.parquet")
    if not os.path.exists(dp):
        return np.empty(0, np.int64)
    return np.unique(pq.read_table(dp).column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64))


class _DropTombstoned:
    """map_batches filter: drop candidate rows whose doc_id is
    tombstoned (sorted-array membership via searchsorted; the
    tombstone list rides the object store once per pool)."""

    def __init__(self, tomb_ref):
        import ray

        self.tomb = ray.get(tomb_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(self.tomb, d),
                         len(self.tomb) - 1)
        return batch.filter(pa.array(self.tomb[pos] != d))


def _drop_tombstoned(ds, root: str):
    """Apply the tombstone filter to a candidate Dataset (no-op when
    the index has no pending deletes)."""
    import ray

    tomb = _tombstones(root)
    if len(tomb) == 0:
        return ds
    tomb_ref = ray.put(tomb)
    return ds.map_batches(_DropTombstoned, fn_constructor_args=(tomb_ref,),
                          batch_format="pyarrow", concurrency=(1, 2))


def _candidate_pairs(root: str, queries: list[tuple[int, str]]):
    """Dataset of (query_id, doc_id) candidates: docs containing ALL
    trigrams of each query's needle — shard-local intersection, zero
    shuffle (`_ShardCandidates`), minus any tombstoned docs. Queries
    shorter than 3 chars are rejected (no trigram evidence -> would
    need the full-scan path)."""
    import ray

    if any(len(_needle_grams(n)) == 0 for _, n in queries):
        raise ValueError("substring queries must be >= 3 chars")
    files = _shard_files(root)
    if not files:
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64())}))
    ds = ray.data.from_arrow(
        pa.table({"path": pa.array(files, pa.string())})) \
        .map_batches(_ShardCandidates, fn_constructor_args=(queries,),
                     batch_format="pyarrow", batch_size=1,
                     concurrency=(1, 8))
    return _drop_tombstoned(ds, root)


class _SubstrVerifyGroup:
    """groupby(vpart).map_groups body: exact substring verification for
    one hash partition of candidate (query, doc) pairs. Reads ONLY the
    texts its pairs reference (parquet doc_id filter). Emits one row
    per pair with the non-overlapping occurrence count and 1-based
    first position (0 occurrences = trigram false positive — kept so
    `trigram_prune_stats` can account for pruning selectivity)."""

    def __init__(self, docs_path: str, queries: list[tuple[int, str]]):
        self.__name__ = "_SubstrVerifyGroup"
        self.docs_path = docs_path
        self.needles = dict(queries)

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        q = group.column("query_id").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        needed = np.unique(d)
        tbl = pq.read_table(self.docs_path, columns=["doc_id", "text"],
                            filters=pc.field("doc_id").isin(pa.array(needed)))
        text_of = dict(zip(tbl.column("doc_id").to_pylist(),
                           tbl.column("text").to_pylist()))
        n = np.empty(len(q), np.int64)
        pos = np.empty(len(q), np.int64)
        for i, (qid, did) in enumerate(zip(q.tolist(), d.tolist())):
            t = text_of.get(int(did), "")
            needle = self.needles[int(qid)]
            n[i] = t.count(needle)
            pos[i] = t.find(needle) + 1        # 1-based; 0 = absent
        return pa.table({"query_id": int64_col(q.astype(np.int64)),
                         "doc_id": int64_col(d.astype(np.int64)),
                         "n_matches": int64_col(n),
                         "first_pos": int64_col(pos)})


def _verified(sf_dir: str, queries: list[tuple[int, str]]):
    root = ensure_trigram_index(sf_dir)
    cand = _candidate_pairs(root, queries)

    def add_vpart(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "vpart", int64_col(d % _N_VERIFY_PARTS))

    return cand.map_batches(add_vpart, batch_format="pyarrow") \
        .groupby("vpart").map_groups(
            _SubstrVerifyGroup(table_path(sf_dir, "documents"), queries),
            batch_format="pyarrow")


def trigram_substring_search(sf_dir: str,
                             queries: list[tuple[int, str]] | None = None):
    """(query_id, doc_id, n_matches, first_pos) — substring search
    SERVED FROM THE TRIGRAM INDEX: posting-intersection candidates,
    then exact verification reading only candidate texts. Matches the
    full-scan answer exactly (hash oracle = position()/replace()
    arithmetic over the raw corpus); the index path touches only the
    posting parts and the candidate docs — at 10^12 files that is the
    difference between a grep of everything and a few list reads.
    ``queries`` overrides the fixed registry set (the CLI ``grep``
    face passes a single user needle)."""
    return _verified(sf_dir, queries or SUBSTRING_QUERIES) \
        .filter(expr="n_matches > 0")


def trigram_substring_search_sql() -> str:
    values = ",\n        ".join(f"({qid}, '{_sql_quote(s)}')"
                                for qid, s in SUBSTRING_QUERIES)
    return f"""
WITH q(query_id, needle) AS (VALUES
        {values})
SELECT CAST(q.query_id AS BIGINT) AS query_id, d.doc_id,
       CAST((length(d.text) - length(replace(d.text, q.needle, '')))
            // length(q.needle) AS BIGINT) AS n_matches,
       CAST(position(q.needle IN d.text) AS BIGINT) AS first_pos
FROM documents d JOIN q ON position(q.needle IN d.text) > 0
"""


def trigram_prune_stats(sf_dir: str):
    """(query_id, n_grams, n_candidates, n_matches) — the selectivity
    ledger of the trigram prefilter: how many grams the needle
    contributed, how many docs survived posting intersection, and how
    many actually match. Hash-verified against SQL that recomputes the
    SAME candidate algebra (docs containing every gram) from raw text —
    i.e. the oracle proves the posting lists are exact, not just the
    final answers. Queries with zero candidates still emit a row. The
    counting is a distributed per-query aggregate — only |q| summary
    rows reach the driver, so hot needles with corpus-scale candidate
    sets stay off it."""
    from ray.data.aggregate import Sum

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.column("n_matches").to_numpy(zero_copy_only=False)
        return pa.table({
            "query_id": batch.column("query_id").cast(pa.int64()),
            "c_p": int64_col(np.ones(len(n), np.int64)),
            "m_p": int64_col((n > 0).astype(np.int64))})

    agg: dict[int, list[int]] = {qid: [0, 0] for qid, _ in SUBSTRING_QUERIES}
    rows = _verified(sf_dir, SUBSTRING_QUERIES) \
        .map_batches(tag, batch_format="pyarrow") \
        .groupby("query_id").aggregate(Sum("c_p"), Sum("m_p")) \
        .take_all()                                # bounded: |q| rows
    for r in rows:
        agg[int(r["query_id"])] = [int(r["sum(c_p)"]), int(r["sum(m_p)"])]
    qids = sorted(agg)
    return pa.table({
        "query_id": int64_col(qids),
        "n_grams": int64_col([len(_needle_grams(dict(SUBSTRING_QUERIES)[q]))
                              for q in qids]),
        "n_candidates": int64_col([agg[q][0] for q in qids]),
        "n_matches": int64_col([agg[q][1] for q in qids]),
    })


def trigram_prune_stats_sql() -> str:
    values = ",\n        ".join(f"({qid}, '{_sql_quote(s)}')"
                                for qid, s in SUBSTRING_QUERIES)
    return f"""
WITH q(query_id, needle) AS (VALUES
        {values}),
g AS (
  SELECT query_id, needle,
         unnest(generate_series(1, length(needle) - 2)) AS i
  FROM q),
qg AS (SELECT DISTINCT query_id, substr(needle, i, 3) AS gram FROM g),
ng AS (SELECT query_id, count(*) AS n_grams FROM qg GROUP BY query_id),
cand AS (
  SELECT qg.query_id, d.doc_id
  FROM qg JOIN documents d ON position(qg.gram IN d.text) > 0
  GROUP BY qg.query_id, d.doc_id
  HAVING count(*) = (SELECT n_grams FROM ng WHERE ng.query_id = qg.query_id)),
m AS (
  SELECT q.query_id, d.doc_id
  FROM q JOIN documents d ON position(q.needle IN d.text) > 0)
SELECT CAST(q.query_id AS BIGINT) AS query_id,
       CAST(ng.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_candidates,
       CAST(coalesce(mm.n, 0) AS BIGINT) AS n_matches
FROM q
JOIN ng ON ng.query_id = q.query_id
LEFT JOIN (SELECT query_id, count(*) AS n FROM cand GROUP BY query_id) c
  ON c.query_id = q.query_id
LEFT JOIN (SELECT query_id, count(*) AS n FROM m GROUP BY query_id) mm
  ON mm.query_id = q.query_id
"""


# ---- regex retrieval through the index ----

TRI_REGEX_QUERIES: list[tuple[int, str]] = [
    (1, "[a-z]+ merge batch"),       # required literal ' merge batch'
    (2, "slow query[a-z ]{0,10}"),   # required literal 'slow query'
    (3, "customer (?:order|line)"),  # alternation -> honest full-scan fallback
    (4, "zzz[0-9]+never"),           # required 'never' but nothing matches
    (5, "val[a-z]*ue"),              # required 'val' (quantified tail dropped)
]

_LITERAL_CHARS = frozenset("abcdefghijklmnopqrstuvwxyz0123456789 _")


def required_literal(pat: str) -> str | None:
    """Conservative required-literal extraction (the heart of Cox's
    RegexpQuery, restricted): the longest run of plain literal chars
    every match must contain, or None when the pattern uses groups /
    alternation (full scan is then the only safe plan). A char followed
    by a quantifier may repeat or vanish, so it is dropped from its
    run; character classes and escapes break runs. Sound by
    construction: we only ever SHRINK the evidence, never invent it."""
    if "(" in pat or "|" in pat:
        return None
    runs: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            runs.append("".join(cur))
            cur.clear()

    i = 0
    while i < len(pat):
        c = pat[i]
        if c == "\\":
            flush()
            # Multi-char escapes (\xHH, \uXXXX, \UXXXXXXXX, \N{...},
            # octal/backref digits) would leave their hex digits / name
            # tail in the literal run if we only skipped 2 chars —
            # required_literal(r'\x4141abc') must NOT yield '4141abc'
            # (the actual match is 'A41abc').  Soundness over power:
            # fall back to full scan for these forms.
            if i + 1 < len(pat) and (pat[i + 1] in "xuUN" or pat[i + 1].isdigit()):
                return None
            i += 2
            continue
        if c == "[":
            flush()
            j = i + 1
            if j < len(pat) and pat[j] == "^":
                j += 1
            if j < len(pat) and pat[j] == "]":
                j += 1
            while j < len(pat) and pat[j] != "]":
                j += 1
            i = j + 1
            continue
        if c in "*+?{":
            if cur:
                cur.pop()          # the quantified atom is not mandatory
            flush()
            if c == "{":
                while i < len(pat) and pat[i] != "}":
                    i += 1
            i += 1
            continue
        if c in _LITERAL_CHARS:
            cur.append(c)
            i += 1
            continue
        flush()                     # any other metachar (. ^ $ ...)
        i += 1
    flush()
    best = max((r for r in runs if len(r) >= 3), key=len, default=None)
    return best


class _RegexVerifyGroup:
    """Per-hash-partition exact regex verification over candidate
    (query, doc) pairs; reads only referenced texts. Same contract as
    regex_search: non-overlapping count + first match text."""

    def __init__(self, docs_path: str, queries: list[tuple[int, str]]):
        import re

        self.__name__ = "_RegexVerifyGroup"
        self.docs_path = docs_path
        self.pats = {qid: re.compile(p) for qid, p in queries}

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        q = group.column("query_id").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        needed = np.unique(d)
        tbl = pq.read_table(self.docs_path, columns=["doc_id", "text"],
                            filters=pc.field("doc_id").isin(pa.array(needed)))
        text_of = dict(zip(tbl.column("doc_id").to_pylist(),
                           tbl.column("text").to_pylist()))
        out_q, out_d, out_n, out_f = [], [], [], []
        for qid, did in zip(q.tolist(), d.tolist()):
            t = text_of.get(int(did), "")
            it = self.pats[int(qid)].finditer(t)
            first = next(it, None)
            if first is None:
                continue
            out_q.append(int(qid))
            out_d.append(int(did))
            out_n.append(1 + sum(1 for _ in it))
            out_f.append(first.group(0))
        return pa.table({"query_id": int64_col(out_q),
                         "doc_id": int64_col(out_d),
                         "n_matches": int64_col(out_n),
                         "first_match": pa.array(out_f, pa.string())})


class _FallbackScan:
    """Full-scan regex stage for patterns with no extractable required
    literal — compiled once per actor, the `regex_search` discipline."""

    def __init__(self, queries: list[tuple[int, str]]):
        import re

        self.pats = [(qid, re.compile(p)) for qid, p in queries]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        out_q, out_d, out_n, out_f = [], [], [], []
        for qid, pat in self.pats:
            for i, t in enumerate(texts):
                it = pat.finditer(t)
                first = next(it, None)
                if first is None:
                    continue
                out_q.append(qid)
                out_d.append(int(ids[i]))
                out_n.append(1 + sum(1 for _ in it))
                out_f.append(first.group(0))
        return pa.table({"query_id": int64_col(out_q),
                         "doc_id": int64_col(out_d),
                         "n_matches": int64_col(out_n),
                         "first_match": pa.array(out_f, pa.string())})


def trigram_regex_search(sf_dir: str,
                         queries: list[tuple[int, str]] | None = None):
    """(query_id, doc_id, n_matches, first_match) — regex retrieval
    ACCELERATED by the trigram index: each pattern's required literal
    (see `required_literal`) prefilters candidates through posting
    intersection, and only candidate texts run the compiled regex;
    patterns with no extractable literal take the honest full-scan
    path (query 3 exercises it). Answers are exactly the full-scan
    `regex_search` semantics — the oracle replays every pattern over
    the raw corpus with RE2, blind to the acceleration. ``queries``
    overrides the fixed registry set (the CLI ``egrep`` face)."""
    accel = [(qid, p, required_literal(p))
             for qid, p in (queries or TRI_REGEX_QUERIES)]
    indexed = [(qid, p, lit) for qid, p, lit in accel if lit is not None]
    fallback = [(qid, p) for qid, p, lit in accel if lit is None]

    pieces = []
    if indexed:
        root = ensure_trigram_index(sf_dir)
        cand = _candidate_pairs(root, [(qid, lit) for qid, _, lit in indexed])

        def add_vpart(batch: pa.Table) -> pa.Table:
            d = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.append_column("vpart",
                                       int64_col(d % _N_VERIFY_PARTS))

        pieces.append(
            cand.map_batches(add_vpart, batch_format="pyarrow")
            .groupby("vpart").map_groups(
                _RegexVerifyGroup(table_path(sf_dir, "documents"),
                                  [(qid, p) for qid, p, _ in indexed]),
                batch_format="pyarrow"))
    if fallback:
        pieces.append(read(sf_dir, "documents", ["doc_id", "text"])
                      .map_batches(_FallbackScan,
                                   fn_constructor_args=(fallback,),
                                   batch_format="pyarrow",
                                   batch_size=1024, concurrency=(1, 4)))
    if len(pieces) == 1:
        return pieces[0]
    return pieces[0].union(*pieces[1:])


def trigram_regex_search_sql() -> str:
    values = ",\n        ".join(f"({qid}, '{_sql_quote(p)}')"
                                for qid, p in TRI_REGEX_QUERIES)
    return f"""
WITH pats(query_id, pat) AS (VALUES
        {values})
SELECT CAST(p.query_id AS BIGINT) AS query_id, d.doc_id,
       CAST(len(regexp_extract_all(d.text, p.pat)) AS BIGINT) AS n_matches,
       regexp_extract(d.text, p.pat) AS first_match
FROM documents d CROSS JOIN pats p
WHERE len(regexp_extract_all(d.text, p.pat)) > 0
"""


# ---- incremental (append-only) index growth ----

_INC_MOD = 2


class _ModFilter:
    """Keep rows with doc_id % mod == rem — the deterministic corpus
    split the incremental lifecycle tests use (dedup.py's _INC_MOD
    discipline); one vectorized modulo, no join."""

    def __init__(self, rem: int):
        self.rem = rem

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _INC_MOD == self.rem))


def ensure_trigram_incremental(sf_dir: str) -> str:
    """Two-generation trigram index: base build over doc_id % 2 == 0,
    then an APPEND-ONLY increment over doc_id % 2 == 1 flushing
    generation-2 shards (`shard_2_*.parquet`) beside the base —
    no base file is rewritten (the Lucene segment model; queries read
    every segment and never notice). Cached once per sf_dir."""
    fp = _corpus_fingerprint(sf_dir)
    tag = hashlib.blake2b(f"{sf_dir}#incr|{fp}".encode(),
                          digest_size=6).hexdigest()
    root = f"/tmp/graft_trigram_index/{tag}"
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fp:
            return root
        os.remove(marker)
    os.makedirs(root, exist_ok=True)
    _wipe_shards(root)
    docs = read(sf_dir, "documents", ["doc_id", "text"])
    s1 = _flush_shards(
        docs.map_batches(_ModFilter, fn_constructor_args=(0,),
                         batch_format="pyarrow", concurrency=(1, 2)),
        root, "1")
    s2 = _flush_shards(
        docs.map_batches(_ModFilter, fn_constructor_args=(1,),
                         batch_format="pyarrow", concurrency=(1, 2)),
        root, "2")
    with open(marker, "w") as f:
        json.dump({"base": s1, "g2": s2, "fingerprint": fp}, f)
    return root


def trigram_incremental(sf_dir: str):
    """(query_id, doc_id, n_matches, first_pos) — the substring query
    set served from the TWO-GENERATION index (base + append segment):
    must be hash-identical to the one-shot build's answers, proving
    segment-granular growth loses and invents nothing. Same oracle SQL
    as `trigram_substring_search` — the oracle is blind to how many
    segments served it."""
    root = ensure_trigram_incremental(sf_dir)
    cand = _candidate_pairs(root, SUBSTRING_QUERIES)

    def add_vpart(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", int64_col(d % _N_VERIFY_PARTS))

    return cand.map_batches(add_vpart, batch_format="pyarrow") \
        .groupby("vpart").map_groups(
            _SubstrVerifyGroup(table_path(sf_dir, "documents"),
                               SUBSTRING_QUERIES),
            batch_format="pyarrow").filter(expr="n_matches > 0")


def trigram_incremental_sql() -> str:
    return trigram_substring_search_sql()


# ---- filtered retrieval: substring filter /\ BM25 ranking ----

FILTERED_QUERIES: list[tuple[int, str, str]] = [
    # (query_id, substring filter, BM25 ranking text)
    (1, "merge batch", "hash join table"),
    (2, "table part", "window agg group"),
    (3, "customer", "slow query scan"),
    (4, "zzznope", "value row"),        # empty filter -> no results
    (5, "agg", "big small data value table row"),
]
_FS_K = 10


_FS_CONTRIB_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("doc_id", pa.int64()), ("c", pa.int64())])


class _FilteredScoreDecode:
    """Postings-parquet decode → per-(query, candidate) BM25
    contribution rows, the candidate-set SEMI-JOIN done INSIDE the
    decode stage (the `_full_scores` gather shape of query.py): each
    decoded posting list is immediately restricted to the broadcast
    verified candidate ids via searchsorted, doc lengths come from the
    broadcast candidate-aligned array (read once, candidate-scale),
    and contributions are factorized numpy — so the rows this stage
    emits (and everything shuffled after it) scale with CANDIDATE
    count, never corpus size, even for stop-word-scale query terms.

    Float discipline: the contribution is evaluated in the oracle's
    exact association order ((((qtf*idf)*tf)*(k1+1))/denom)*1e4, with
    denom = tf + k1*((1-b)+((b*dl)/avgdl)) — IEEE +,*,/ are exactly
    specified, so numpy float64 replays DuckDB bitwise and the bp
    quantization is order-free."""

    def __init__(self, state_ref):
        import ray

        st = ray.get(state_ref)
        self.term_info = st["term_info"]   # term -> (idf, [(qid, qtf)...])
        self.all_cand = st["all_cand"]     # sorted int64 candidate ids
        self.dl = st["dl"]                 # float64 doc_len aligned w/ all_cand
        self.cand_by_qid = st["cand_by_qid"]  # qid -> sorted int64 ids
        self.k1 = st["k1"]
        self.b = st["b"]
        self.avgdl = st["avgdl"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from searchengine_ray.codec import PostingBlocks, decode_blocks

        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        nc = len(self.all_cand)
        for i in range(batch.num_rows):
            term = batch.column("term")[i].as_py()
            info = self.term_info.get(term)
            if info is None or nc == 0:
                continue
            idf, quse = info
            counts = np.asarray(batch.column("counts")[i].as_py(), np.int32)
            dsz = np.asarray(batch.column("doc_sizes")[i].as_py(), np.int64)
            tsz = np.asarray(batch.column("tf_sizes")[i].as_py(), np.int64)
            doc_offsets = np.zeros(len(dsz) + 1, np.int64)
            tf_offsets = np.zeros(len(tsz) + 1, np.int64)
            np.cumsum(dsz, out=doc_offsets[1:])
            np.cumsum(tsz, out=tf_offsets[1:])
            pb = PostingBlocks(
                batch.column("doc_bytes")[i].as_py(),
                batch.column("tf_bytes")[i].as_py(),
                counts,
                np.asarray(batch.column("last_docs")[i].as_py(), np.int64),
                np.asarray(batch.column("max_tfs")[i].as_py(), np.int32),
                doc_offsets, tf_offsets)
            ids, tfs = decode_blocks(pb)
            # semi-join to the verified candidate union (sorted gather)
            pos = np.searchsorted(self.all_cand, ids)
            posc = np.minimum(pos, nc - 1)
            keep = self.all_cand[posc] == ids
            if not keep.any():
                continue
            ids_c = ids[keep]
            tf_c = tfs[keep].astype(np.float64)
            dl_c = self.dl[posc[keep]]
            denom = tf_c + self.k1 * (1.0 - self.b
                                      + self.b * dl_c / self.avgdl)
            for qid, qtf in quse:
                cs = self.cand_by_qid.get(qid)
                if cs is None or len(cs) == 0:
                    continue
                p2 = np.minimum(np.searchsorted(cs, ids_c), len(cs) - 1)
                m2 = cs[p2] == ids_c
                if not m2.any():
                    continue
                contrib = np.floor(
                    float(qtf) * idf * tf_c[m2] * (self.k1 + 1.0)
                    / denom[m2] * 10000 + 0.5).astype(np.int64)
                out_q.append(np.full(int(m2.sum()), qid, np.int64))
                out_d.append(ids_c[m2])
                out_c.append(contrib)
        if not out_q:
            return _FS_CONTRIB_SCHEMA.empty_table()
        return pa.table({"query_id": int64_col(np.concatenate(out_q)),
                         "doc_id": int64_col(np.concatenate(out_d)),
                         "c": int64_col(np.concatenate(out_c))})


def filtered_search(sf_dir: str, _stats: dict | None = None):
    """(query_id, rank, doc_id, score_bp) — FILTERED retrieval, the
    Lucene FilteredQuery class composing BOTH index structures: the
    trigram index supplies the exact substring-match docset, the
    full-text index ranks it with BM25 (global df/avgdl — a filter
    narrows candidates, never the statistics, matching Lucene/ES
    filter-context semantics). Per-term contributions are bp-quantized
    then integer-summed (the `search_explain` discipline), so scores
    are order-free and SQL-replayable exactly.

    Shape (r5, candidate-scale end to end): substring candidates come
    from trigram posting intersection + verification (text read only
    for candidates) and are collected to the driver — BOUNDED: the
    verified docset of a selective filter, the quantity a filtered
    query is about (a filter matching a corpus-scale docset is a scan,
    not a filtered search). Doc lengths are fetched for candidate ids
    only via doc-part direct addressing (`doc_id % num_doc_parts` —
    the `fetch_docs` convention). Both are broadcast ONCE via
    `ray.put`; `_FilteredScoreDecode` then decodes ONLY the query
    terms' posting slices (J2-pruned part files), semi-joins each list
    to the candidates with searchsorted and emits factorized-numpy bp
    contributions. The only shuffle after the trigram verify is the
    final query-key groupby over candidate-scale contribution rows —
    nothing corpus-scale moves, for any term df."""
    import math
    from collections import Counter as _Counter
    from pathlib import Path

    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    from searchengine_ray.pipelines.docsearch import (
        doc_index_config,
        ensure_doc_index,
    )
    from searchengine_ray.stages.postings import (
        part_file_name,
        part_id_of,
        term_hash64,
    )
    from searchengine_ray.tokenizer import Analyzer

    paths = ensure_doc_index(sf_dir)
    cfg = doc_index_config()
    analyzer = Analyzer(cfg)
    qterms = {qid: dict(_Counter(analyzer.terms(text)))
              for qid, _, text in FILTERED_QUERIES}
    terms = sorted({t for c in qterms.values() for t in c})

    # bounded: |terms| rows off the dictionary partitions
    dict_files = sorted(str(f) for f in Path(paths.dictionary).glob("*.parquet"))
    dtbl = pads.dataset(dict_files).to_table(
        columns=["term", "df"],
        filter=pads.field("term").isin(terms))
    df_map: dict[str, int] = {}
    for t, d in zip(dtbl.column("term").to_pylist(),
                    dtbl.column("df").to_pylist()):
        df_map[t] = df_map.get(t, 0) + int(d)      # fold block splits

    meta = paths.meta()
    n_docs, avgdl = meta["N"], meta["total_len"] / meta["N"]
    k1, b = cfg.k1, cfg.b
    idf = {t: math.log((n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5) + 1.0)
           for t in terms if t in df_map}

    def _empty_result():
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "score_bp": pa.array([], pa.int64())}))

    # --- candidate docsets from the trigram index (bounded driver
    # materialization: the verified matches of the substring filter) ---
    cand_rows = _verified(sf_dir, [(qid, needle)
                                   for qid, needle, _ in FILTERED_QUERIES]) \
        .filter(expr="n_matches > 0") \
        .select_columns(["query_id", "doc_id"]).take_all()
    if not cand_rows or not idf:
        return _empty_result()
    cand_by_qid: dict[int, np.ndarray] = {}
    _tmp: dict[int, list[int]] = {}
    for r in cand_rows:
        _tmp.setdefault(int(r["query_id"]), []).append(int(r["doc_id"]))
    for qid, ids in _tmp.items():
        cand_by_qid[qid] = np.unique(np.asarray(ids, np.int64))
    all_cand = np.unique(np.concatenate(list(cand_by_qid.values())))

    # --- doc lengths for CANDIDATE ids only, via doc-part direct
    # addressing (doc_meta part = num_term_parts + doc_id % P) with a
    # row-group-pruned fallback for nonstandard layouts ---
    dm_dir = Path(paths.doc_meta)
    ntp = int(meta["num_term_parts"])
    P = int(meta.get("num_doc_parts", 0))
    meta_files: list[str] = []
    if P and int(meta.get("doc_parts_used", P)) == P:
        need_dm = sorted({ntp + int(d) % P for d in all_cand.tolist()})
        meta_files = [str(dm_dir / part_file_name(pt)) for pt in need_dm]
        if not all(Path(f).is_file() for f in meta_files):
            meta_files = []
    if not meta_files:
        meta_files = sorted(str(f) for f in dm_dir.glob("part-*.parquet"))
    dl_tbl = pq.read_table(
        meta_files, columns=["doc_id", "doc_len"],
        filters=pc.field("doc_id").isin(pa.array(all_cand, pa.int64())))
    dl_ids = dl_tbl.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    dl_vals = dl_tbl.column("doc_len").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    dl = np.zeros(len(all_cand), np.float64)
    posm = np.searchsorted(all_cand, dl_ids)
    dl[posm] = dl_vals                      # all_cand ⊆ indexed docs

    term_info = {t: (idf[t],
                     [(qid, c[t]) for qid, c in sorted(qterms.items())
                      if t in c])
                 for t in idf}
    state_ref = ray.put({
        "term_info": term_info, "all_cand": all_cand, "dl": dl,
        "cand_by_qid": cand_by_qid, "k1": k1, "b": b, "avgdl": avgdl})

    # --- contribution rows from the postings layout (query terms only,
    # J2 part pruning: only the terms' hash parts are opened) ---
    need_parts = sorted({term_hash64(t) % ntp for t in idf})
    posting_files = []
    for f in sorted(Path(paths.postings).glob("part-*.parquet")):
        try:
            if part_id_of(f) in need_parts:
                posting_files.append(str(f))
        except ValueError:
            continue
    if not posting_files:
        # every needed part was an empty-manifest partition: no
        # postings → no scores (read_parquet([]) would raise)
        return _empty_result()
    contrib = ray.data.read_parquet(
        posting_files,
        columns=["term", "counts", "last_docs", "max_tfs",
                 "doc_sizes", "tf_sizes", "doc_bytes", "tf_bytes"],
    ).map_batches(_FilteredScoreDecode, fn_constructor_args=(state_ref,),
                  batch_format="pyarrow", concurrency=(1, 2))

    if _stats is not None:
        # rehearsal instrumentation: everything shuffled after the
        # decode is exactly these contribution rows — record them so
        # 100x runs can prove candidate-scale (not corpus-scale) volume
        contrib = contrib.materialize()
        _stats["n_candidates_union"] = int(len(all_cand))
        _stats["n_candidates_by_qid"] = {int(q): int(len(v))
                                         for q, v in cand_by_qid.items()}
        _stats["contrib_rows_shuffled"] = int(contrib.count())
        _stats["doc_len_rows_read"] = int(len(dl_ids))
        _stats["posting_parts_opened"] = len(posting_files)

    def topk(g: "pd.DataFrame") -> pa.Table:
        # candidate-scale group: integer-sum per doc, then cut top-k
        docs = g["doc_id"].to_numpy(np.int64)
        cs = g["c"].to_numpy(np.int64)
        uniq, inv = np.unique(docs, return_inverse=True)
        score = np.bincount(inv, weights=cs).astype(np.int64)
        order = np.lexsort((uniq, -score))[:_FS_K]
        qid = np.full(len(order), int(g["query_id"].iloc[0]), np.int64)
        return pa.table({
            "query_id": int64_col(qid),
            "rank": int64_col(np.arange(1, len(order) + 1)),
            "doc_id": int64_col(uniq[order]),
            "score_bp": int64_col(score[order])})

    return contrib.groupby("query_id") \
        .map_groups(topk, batch_format="pandas") \
        .select_columns(["query_id", "rank", "doc_id", "score_bp"])



def filtered_search_sql(k1: float = 1.2, b: float = 0.75) -> str:
    from collections import Counter as _Counter

    from searchengine_ray.pipelines.docsearch import doc_index_config
    from searchengine_ray.tokenizer import Analyzer

    analyzer = Analyzer(doc_index_config())
    qvalues = ",\n        ".join(
        f"({qid}, '{_sql_quote(needle)}')"
        for qid, needle, _ in FILTERED_QUERIES)
    tvalues = []
    for qid, _, text in FILTERED_QUERIES:
        for term, qtf in sorted(_Counter(analyzer.terms(text)).items()):
            tvalues.append(f"({qid}, '{term}', {qtf})")
    tvalues_sql = ",\n        ".join(tvalues)
    return f"""
WITH q(query_id, needle) AS (VALUES
        {qvalues}),
queries(query_id, qterm, qtf) AS (VALUES
        {tvalues_sql}),
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
matches AS (
  SELECT q.query_id, d.doc_id
  FROM documents d JOIN q ON position(q.needle IN d.text) > 0),
contrib AS (
  SELECT m.query_id, m.doc_id,
         CAST(floor(qq.qtf * ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                    * tf.tf * ({k1} + 1.0)
                    / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))
                    * 10000 + 0.5) AS BIGINT) AS c
  FROM matches m
  JOIN queries qq ON qq.query_id = m.query_id
  JOIN tf ON tf.doc_id = m.doc_id AND tf.term = qq.qterm
  JOIN df ON df.term = qq.qterm
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s),
scores AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_bp
           FROM contrib GROUP BY query_id, doc_id),
ranked AS (
  SELECT query_id, doc_id, score_bp,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_bp DESC, doc_id ASC) AS rnk
  FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank,
       doc_id, score_bp
FROM ranked WHERE rnk <= {_FS_K}
"""


def trigram_snapshot_search(sf_dir: str):
    """(query_id, doc_id, n_matches, first_pos) — the substring query
    set answered AT A COMMIT POINT: only generation-1 shards of the
    two-generation index are opened (the Lucene commit-point / snapshot
    read — an append-only index can serve any past state by choosing
    which segment set to open; nothing else changes). The oracle
    restricts the corpus to the base generation's documents, so a hash
    match proves the snapshot sees exactly the pre-append state."""
    import ray

    root = ensure_trigram_incremental(sf_dir)
    gen1 = [f for f in _shard_files(root)
            if os.path.basename(f).startswith("shard_1_")]
    if not gen1:
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n_matches": pa.array([], pa.int64()),
            "first_pos": pa.array([], pa.int64())}))
    cand = _drop_tombstoned(
        ray.data.from_arrow(
            pa.table({"path": pa.array(gen1, pa.string())}))
        .map_batches(_ShardCandidates,
                     fn_constructor_args=(SUBSTRING_QUERIES,),
                     batch_format="pyarrow", batch_size=1,
                     concurrency=(1, 8)), root)

    def add_vpart(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", int64_col(d % _N_VERIFY_PARTS))

    return cand.map_batches(add_vpart, batch_format="pyarrow") \
        .groupby("vpart").map_groups(
            _SubstrVerifyGroup(table_path(sf_dir, "documents"),
                               SUBSTRING_QUERIES),
            batch_format="pyarrow").filter(expr="n_matches > 0")


def trigram_snapshot_search_sql() -> str:
    values = ",\n        ".join(f"({qid}, '{_sql_quote(s)}')"
                                for qid, s in SUBSTRING_QUERIES)
    return f"""
WITH q(query_id, needle) AS (VALUES
        {values})
SELECT CAST(q.query_id AS BIGINT) AS query_id, d.doc_id,
       CAST((length(d.text) - length(replace(d.text, q.needle, '')))
            // length(q.needle) AS BIGINT) AS n_matches,
       CAST(position(q.needle IN d.text) AS BIGINT) AS first_pos
FROM documents d JOIN q ON position(q.needle IN d.text) > 0
WHERE d.doc_id % {_INC_MOD} = 0
"""


# ---- delete -> compact lifecycle over the trigram index ----

_TRI_DEL_MOD = 5       # tombstone every doc_id % 5 == 0


def ensure_trigram_deleted(sf_dir: str, compacted: bool) -> str:
    """Dedicated trigram index copy for ``sf_dir`` with every
    ``doc_id % _TRI_DEL_MOD == 0`` tombstoned — left PENDING
    (``compacted=False``: queries must drop the docs at candidate
    time) or COMPACTED (``compacted=True``: the merge physically
    purged them and dropped the tombstone file). Two separate cached
    roots so both lifecycle states stay reproducible. The delete list
    comes from a single-column pruned read of the documents table
    (deletes are control-plane input; at corpus scale the caller
    supplies ids, it doesn't scan for them)."""
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.common import table_path

    fp = _corpus_fingerprint(sf_dir)
    kind = "delc" if compacted else "del"
    tag = hashlib.blake2b(f"{sf_dir}#{kind}{_TRI_DEL_MOD}|{fp}".encode(),
                          digest_size=6).hexdigest()
    root = f"/tmp/graft_trigram_index/{tag}"
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("fingerprint") == fp:
                return root
        os.remove(marker)
    os.makedirs(root, exist_ok=True)
    _wipe_shards(root)
    for leftover in ("deletes.parquet",):
        lp = os.path.join(root, leftover)
        if os.path.exists(lp):
            os.remove(lp)
    stats = _flush_shards(
        read(sf_dir, "documents", ["doc_id", "text"]), root, "1")
    compact_trigram_index(root)
    ids = pq.read_table(table_path(sf_dir, "documents"),
                        columns=["doc_id"]).column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    delete_trigram_docs(root, ids[ids % _TRI_DEL_MOD == 0])
    if compacted:
        compact_trigram_index(root)       # purges tombstones physically
    with open(marker, "w") as f:
        json.dump({"shards": stats, "fingerprint": fp,
                   "compacted": compacted}, f)
    return root


def _delete_search(sf_dir: str, compacted: bool):
    root = ensure_trigram_deleted(sf_dir, compacted)
    cand = _candidate_pairs(root, SUBSTRING_QUERIES)

    def add_vpart(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", int64_col(d % _N_VERIFY_PARTS))

    return cand.map_batches(add_vpart, batch_format="pyarrow") \
        .groupby("vpart").map_groups(
            _SubstrVerifyGroup(table_path(sf_dir, "documents"),
                               SUBSTRING_QUERIES),
            batch_format="pyarrow").filter(expr="n_matches > 0")


def trigram_delete_search(sf_dir: str):
    """(query_id, doc_id, n_matches, first_pos) — the substring query
    set answered from an index with PENDING tombstones: candidates are
    filtered against the delete list at query time (the Lucene live-
    docs bitset). The oracle restricts the corpus to surviving docs,
    so a hash match proves tombstoned docs are invisible to every
    query while still physically present in the shards."""
    return _delete_search(sf_dir, compacted=False)


def trigram_delete_compact_search(sf_dir: str):
    """Same query set AFTER ``compact_trigram_index`` purged the
    tombstones — same oracle as `trigram_delete_search`: a hash match
    here plus there proves delete->compact changes no answer while
    physically removing the dead postings (test_trigram asserts the
    shards no longer contain the doc ids at all)."""
    return _delete_search(sf_dir, compacted=True)


def trigram_delete_search_sql() -> str:
    values = ",\n        ".join(f"({qid}, '{_sql_quote(s)}')"
                                for qid, s in SUBSTRING_QUERIES)
    return f"""
WITH q(query_id, needle) AS (VALUES
        {values})
SELECT CAST(q.query_id AS BIGINT) AS query_id, d.doc_id,
       CAST((length(d.text) - length(replace(d.text, q.needle, '')))
            // length(q.needle) AS BIGINT) AS n_matches,
       CAST(position(q.needle IN d.text) AS BIGINT) AS first_pos
FROM documents d JOIN q ON position(q.needle IN d.text) > 0
WHERE d.doc_id % {_TRI_DEL_MOD} <> 0
"""
