"""Full-text search over the driver's ``documents`` table — the
SQL-checkable face of the flagship engine.

Maps ``documents(doc_id, text, ...)`` into the corpus schema, builds the
full compressed index (simple analyzer, no stopwords — semantics a SQL
oracle can express exactly), and answers a fixed reference query set
with BM25 top-k. The DuckDB oracle recomputes BM25 from scratch in SQL;
scores travel as integer basis points so float formatting can't drift.

The index is built once per (sf_dir, config) under /tmp and reused —
rebuilds are skipped via the manifest/resume machinery, so repeated
driver calls don't pay the build.
"""

from __future__ import annotations

import hashlib
from collections import Counter
from pathlib import Path

import numpy as np
import pyarrow as pa

from searchengine_ray.config import IndexConfig
from searchengine_ray.pipelines.build import IndexPaths, build_index
from searchengine_ray.pipelines.common import int64_col, read
from searchengine_ray.tokenizer import Analyzer

# fixed reference query set over the documents vocabulary
DOC_QUERIES: list[tuple[int, str]] = [
    (1, "hash join table"),
    (2, "window agg group"),
    (3, "stream batch filter"),
    (4, "customer order line"),
    (5, "slow query scan fast"),
    (6, "spark data column"),
    (7, "merge sort part"),
    (8, "value row"),
    (9, "zzznosuchterm"),
    (10, "big small data value table row"),
]

K = 10


def doc_index_config() -> IndexConfig:
    return IndexConfig(analyzer="simple", use_stopwords=False, min_df=1,
                       num_doc_parts=4, num_term_parts=8)


def _docs_as_corpus(sf_dir: str):
    ds = read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def remap(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "repo": batch.column("source"),
            "path": pa.array([f"doc_{i}.txt" for i in ids.tolist()], pa.string()),
            "commit": pa.array([""] * n, pa.string()),
            "lang": batch.column("lang"),
            "content": batch.column("text"),
        })

    return ds.map_batches(remap, batch_format="pyarrow")


def ensure_doc_index(sf_dir: str) -> IndexPaths:
    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    root = f"/tmp/graft_doc_index/{tag}"
    return build_index(_docs_as_corpus(sf_dir), root, doc_index_config(),
                       id_column="doc_id", resume=True, source_tag=sf_dir)


def bm25_topk(sf_dir: str, method: str = "vectorized"):
    """(query_id, rank, doc_id, score_bp) — BM25 top-10 for DOC_QUERIES
    via the actor-pool query executors over the compressed index."""
    from searchengine_ray.pipelines.query import search_queries

    paths = ensure_doc_index(sf_dir)
    res = search_queries(paths, DOC_QUERIES, k=K, config=doc_index_config(),
                         method=method, concurrency=(1, 2)).to_pandas()
    res["score_bp"] = np.floor(res["score"].to_numpy() * 10000 + 0.5).astype(np.int64)
    res["rank"] = res["rank"].astype(np.int64)
    out = res[["query_id", "rank", "doc_id", "score_bp"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def bm25_topk_wand(sf_dir: str):
    """Same result set via block-max WAND — proves the pruned scorer is
    rank-identical through the SQL oracle as well."""
    return bm25_topk(sf_dir, method="bmw")


def bm25_topk_sql(k1: float = 1.2, b: float = 0.75) -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in DOC_QUERIES:
        for term, qtf in sorted(Counter(analyzer.terms(text)).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    values_sql = ",\n        ".join(values)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
queries(query_id, qterm, qtf) AS (VALUES
        {values_sql}),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.qtf * ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM queries q
  JOIN df ON df.term = q.qterm
  JOIN tf ON tf.term = q.qterm
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scores)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rnk <= {K}
"""


# ---- boolean (AND / NOT) retrieval ----

BOOL_QUERIES: list[tuple[int, str]] = [
    (1, "hash join -window"),
    (2, "data table row"),
    (3, "query -scan"),
    (4, "zzznosuchterm join"),        # AND with an absent term: empty
    (5, "value -zzznosuchterm"),      # NOT of an absent term: no-op
    (6, "merge sort part -limit"),
    (7, "data -data"),                # t AND NOT t: provably empty
]


def boolean_search(sf_dir: str):
    """(query_id, doc_id) — unranked boolean AND/NOT retrieval over the
    compressed index (``-`` prefixes negate a term). The classic
    set-retrieval query class beside the ranked BM25 path; the oracle
    replays it as a HAVING count(DISTINCT term) conjunction minus an
    EXISTS on the negated terms."""
    from searchengine_ray.pipelines.query import boolean_queries

    paths = ensure_doc_index(sf_dir)
    return boolean_queries(paths, BOOL_QUERIES, config=doc_index_config(),
                           concurrency=(1, 2))


def boolean_search_sql() -> str:
    analyzer = Analyzer(doc_index_config())
    selects = []
    for qid, text in BOOL_QUERIES:
        must: set[str] = set()
        must_not: set[str] = set()
        for w in text.split():
            neg = w.startswith("-")
            for t in analyzer.terms(w[1:] if neg else w):
                (must_not if neg else must).add(t)
        if not must or (must & must_not):
            continue                    # provably empty: emit nothing
        m_list = ", ".join(f"'{t}'" for t in sorted(must))
        sel = (f"SELECT CAST({qid} AS BIGINT) AS query_id, doc_id FROM tf "
               f"WHERE term IN ({m_list}) GROUP BY doc_id "
               f"HAVING count(DISTINCT term) = {len(must)}")
        if must_not:
            n_list = ", ".join(f"'{t}'" for t in sorted(must_not))
            sel += (f" AND doc_id NOT IN (SELECT doc_id FROM tf "
                    f"WHERE term IN ({n_list}))")
        selects.append(sel)
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> '')
{union}
"""


# ---- prefix (wildcard) queries: dictionary expansion + OR retrieval ----

PREFIX_QUERIES: list[tuple[int, str]] = [
    (1, "s"),       # 6 matches at gate scale — exercises the expansion cap
    (2, "qu"),      # single term
    (3, "c"),       # two terms
    (4, "zzz"),     # no match: empty
    (5, "d"),       # rare + common term under one prefix
    (6, "ta"),      # single term
]

# Lucene-style bound on wildcard expansion; selection is deterministic
# (df DESC, term ASC) so engine and oracle agree on WHICH terms survive
PREFIX_MAX_EXPANSIONS = 4


# ---- sorted dictionary projections: the 100-TB wildcard path ----
#
# The dictionary is hash-partitioned for point lookups (J1), so a
# prefix/suffix expansion over it is a full vocabulary scan. The scale
# path (Lucene's reversed-term field) is a key-SORTED projection of
# (term, df) persisted beside the dictionary, built once per index
# generation: sorted by term for prefixes, by reversed term for
# suffixes. Row groups then carry tight min/max key statistics, so an
# expansion reads only the row groups overlapping [key, upper(key)) —
# dictionary I/O scales with the matched vocabulary bucket, not the
# vocabulary.

_SORTED_DICT_VERSION = 1
_SORTED_DICT_ROW_GROUP = 16384


def _projection_fingerprint(meta: dict) -> str:
    return (f'{meta.get("fingerprint")}|gen{meta.get("generation")}'
            f'|v{_SORTED_DICT_VERSION}')


class _SortedDictFlush:
    """Write one sorted block of the projection as one parquet file
    (small row groups -> fine-grained min/max pruning). File name keys
    on the block's first sort key, so reruns overwrite deterministically
    for identical block boundaries and `_DONE` gates visibility anyway."""

    def __init__(self, out_dir: str, reverse: bool):
        self.__name__ = "_SortedDictFlush"
        self.out_dir = out_dir
        self.reverse = reverse

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        if batch.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        keys = batch.column("key").to_pylist()
        terms = [k[::-1] for k in keys] if self.reverse else keys
        dfs = batch.column("sum(df)").cast(pa.int64())
        tbl = pa.table({"key": pa.array(keys, pa.string()),
                        "term": pa.array(terms, pa.string()),
                        "df": dfs})
        tag = hashlib.blake2b(keys[0].encode(), digest_size=8).hexdigest()
        name = f"sorted_{tag}.parquet"
        pq.write_table(tbl, str(Path(self.out_dir) / name),
                       row_group_size=_SORTED_DICT_ROW_GROUP)
        return pa.table({"file": pa.array([name], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})


def ensure_sorted_dictionary(paths: IndexPaths, reverse: bool):
    """Build (once per index generation, persisted in the index root)
    the key-sorted dictionary projection. Returns its directory, or
    None when the dictionary has no parts. Build shape: one
    vocabulary-scale groupby (folds block-split df, exactly the fold
    every expansion would otherwise redo) + one sort — both on the
    (term, df) columns only; the corpus is never touched."""
    import json as _json
    import shutil

    import ray.data

    name = "rev_dictionary" if reverse else "sorted_dictionary"
    out = Path(paths.root) / name
    marker = out / "_DONE"
    meta = paths.meta()
    fp = _projection_fingerprint(meta)
    if marker.exists():
        try:
            if _json.loads(marker.read_text()).get("fingerprint") == fp:
                return out
        except (OSError, ValueError):
            pass
    files = sorted(str(f) for f in Path(paths.dictionary).glob("*.parquet"))
    if not files:
        return None
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)

    def add_key(b: pa.Table) -> pa.Table:
        terms = b.column("term").to_pylist()
        keys = [t[::-1] for t in terms] if reverse else terms
        return pa.table({"key": pa.array(keys, pa.string()),
                         "df": b.column("df").cast(pa.int64())})

    from ray.data.aggregate import Sum

    stats = (ray.data.read_parquet(files, columns=["term", "df"])
             .map_batches(add_key, batch_format="pyarrow")
             .groupby("key").aggregate(Sum("df"))
             .sort("key")
             .map_batches(_SortedDictFlush(str(out), reverse),
                          batch_format="pyarrow", batch_size=None)
             .take_all())                    # bounded: one row per file
    with open(marker, "w") as f:
        _json.dump({"fingerprint": fp,
                    "files": sorted(r["file"] for r in stats)}, f)
    return out


def _key_upper_bound(key: str) -> str | None:
    """Smallest string greater than every string with prefix ``key``
    (increment last code point with carry); None when no finite bound
    exists (key is all U+10FFFF — never for analyzer tokens)."""
    k = list(key)
    while k:
        c = ord(k[-1])
        if c < 0x10FFFF:
            k[-1] = chr(c + 1)
            return "".join(k)
        k.pop()
    return None


def _expand_sorted(paths: IndexPaths, queries, cap: int, mode: str,
                   _stats: dict | None = None):
    """Prefix/suffix expansion served from the sorted projection:
    driver touches row-group METADATA only; matched row groups are read
    by Ray tasks that return per-query partial top-caps (cap rows per
    query per task — merging partial top-caps is exact because each
    key occurs once globally). Returns the `_expand_prefixes` contract,
    or None when the projection is unavailable."""
    import pyarrow.parquet as pq
    import ray

    proj = ensure_sorted_dictionary(paths, reverse=(mode == "suffix"))
    if proj is None:
        return None
    ranges = []
    for qid, pat in queries:
        lo = pat[::-1] if mode == "suffix" else pat
        ranges.append((int(qid), lo, _key_upper_bound(lo)))
    files = sorted(str(f) for f in Path(proj).glob("sorted_*.parquet"))
    sel: dict[str, list[int]] = {}
    total_rgs = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        key_idx = md.schema.names.index("key")
        picked = []
        for rg in range(md.num_row_groups):
            total_rgs += 1
            st = md.row_group(rg).column(key_idx).statistics
            if st is None or not st.has_min_max:
                picked.append(rg)                 # no stats: must read
                continue
            for _, lo, hi in ranges:
                if st.max >= lo and (hi is None or st.min < hi):
                    picked.append(rg)
                    break
        if picked:
            sel[f] = picked
    if _stats is not None:
        _stats["proj_row_groups_total"] = total_rgs
        _stats["proj_row_groups_read"] = sum(len(v) for v in sel.values())
        _stats["proj_files_total"] = len(files)
        _stats["proj_files_read"] = len(sel)

    @ray.remote
    def _scan(f: str, rgs: list[int], rng, cap: int):
        import pyarrow.parquet as _pq

        t = _pq.ParquetFile(f).read_row_groups(
            rgs, columns=["key", "term", "df"])
        keys = np.asarray(t.column("key").to_pylist(), dtype=str)
        terms = np.asarray(t.column("term").to_pylist(), dtype=str)
        dfs = t.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        out = []
        for qid, lo, _hi in rng:
            m = np.char.startswith(keys, lo)
            if not m.any():
                continue
            ts, ds = terms[m], dfs[m]
            order = np.lexsort((ts, -ds))[:cap]   # df desc, term asc
            out.extend((qid, str(ts[i]), int(ds[i])) for i in order)
        return out

    parts = ray.get([_scan.remote(f, rgs, ranges, cap)
                     for f, rgs in sorted(sel.items())])
    per_qid: dict[int, list[tuple[int, str]]] = {}
    for chunk in parts:
        for qid, term, df in chunk:
            per_qid.setdefault(qid, []).append((df, term))
    expanded = []
    for qid in sorted(per_qid):
        rows = sorted(per_qid[qid], key=lambda r: (-r[0], r[1]))[:cap]
        expanded.append((qid, " ".join(sorted(t for _, t in rows))))
    return expanded


def _expand_prefixes(paths: IndexPaths, prefix_queries, cap: int,
                     mode: str = "prefix", _stats: dict | None = None):
    """Expand each prefix (or suffix, ``mode="suffix"``; or regex,
    ``mode="regex"``) to its top-``cap`` matching index terms as
    ``[(query_id, "t1 t2 ...")]``.

    Prefix and suffix modes serve from the persisted key-sorted
    dictionary projection (``ensure_sorted_dictionary``): row-group
    statistics prune the read to the matched key range, so expansion
    I/O scales with the matched vocabulary bucket, not the vocabulary
    — with the distributed full scan below as fallback when the
    projection can't be built (read-only index root). Regex patterns
    have no key range and always take the scan: one pass over the
    vocabulary-scale (term, df) columns answers ALL patterns; matched
    rows (not the vocabulary) flow through two tiny shuffles (df
    re-sum for block-split terms, per-query top-cap) and the take_all
    is bounded at cap x n_queries rows."""
    if mode in ("prefix", "suffix"):
        try:
            res = _expand_sorted(paths, prefix_queries, cap, mode, _stats)
            if res is not None:
                return res
        except OSError:
            pass    # unwritable/corrupt projection dir -> scan fallback

    import ray.data

    files = sorted(str(f) for f in Path(paths.dictionary).glob("*.parquet"))
    prefixes = [(int(q), p) for q, p in prefix_queries]
    def match(batch: pa.Table) -> pa.Table:
        # resolve kernels HERE: np.char functions don't pickle as
        # closure captures (module-alias import failure in workers)
        import re

        if mode == "prefix":
            def kern(ts, p): return np.char.startswith(ts, p)
        elif mode == "suffix":
            def kern(ts, p): return np.char.endswith(ts, p)
        else:                                  # regex (RE2-safe subset)
            def kern(ts, p):
                rx = re.compile(p)
                return np.fromiter((rx.search(t) is not None for t in ts),
                                   bool, len(ts))
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        dfs = batch.column("df").to_numpy(zero_copy_only=False)
        qids_out, terms_out, dfs_out = [], [], []
        for qid, pre in prefixes:
            hit = kern(terms.astype(str), pre)
            qids_out.append(np.full(int(hit.sum()), qid, np.int64))
            terms_out.append(terms[hit])
            dfs_out.append(dfs[hit].astype(np.int64))
        return pa.table({
            "query_id": pa.array(np.concatenate(qids_out), pa.int64()),
            "term": pa.array(np.concatenate(terms_out).astype(str)),
            "df": pa.array(np.concatenate(dfs_out), pa.int64())})

    def top_cap(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["df", "term"], ascending=[False, True],
                          kind="stable").head(cap)
        return g[["query_id", "term"]]

    import pandas as pd  # noqa: F401  (map_groups batch type)

    rows = (ray.data.read_parquet(files, columns=["term", "df"])
            .map_batches(match, batch_format="pyarrow")
            .groupby(["query_id", "term"]).sum("df")
            .map_batches(lambda b: pa.table(
                {"query_id": b.column("query_id"), "term": b.column("term"),
                 "df": b.column("sum(df)")}), batch_format="pyarrow")
            .groupby("query_id").map_groups(top_cap, batch_format="pandas")
            .take_all())
    expanded: dict[int, list[str]] = {}
    for r in rows:
        expanded.setdefault(int(r["query_id"]), []).append(str(r["term"]))
    return [(qid, " ".join(sorted(ts))) for qid, ts in
            sorted(expanded.items())]


def prefix_search(sf_dir: str):
    """(query_id, doc_id, n_terms) — wildcard/prefix retrieval: each
    prefix expands to its top-``PREFIX_MAX_EXPANSIONS`` dictionary
    terms (df DESC, term ASC — the deterministic analog of Lucene's
    expansion bound), then docs containing ANY surviving term return
    with the count of distinct matching terms. The oracle replays
    expansion (QUALIFY over the SQL-computed dictionary) and union in
    SQL. The reference has no wildcard path; this is the standard
    dictionary capability its hash-based term lookup cannot express."""
    from searchengine_ray.pipelines.query import terms_union_queries

    paths = ensure_doc_index(sf_dir)
    expanded = _expand_prefixes(paths, PREFIX_QUERIES, PREFIX_MAX_EXPANSIONS)
    return terms_union_queries(paths, expanded, config=doc_index_config(),
                               concurrency=(1, 2))


def prefix_search_sql() -> str:
    values = ",\n        ".join(f"({qid}, '{p}')" for qid, p in PREFIX_QUERIES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
prefixes(query_id, prefix) AS (VALUES
        {values}),
expanded AS (
  SELECT p.query_id, d.term
  FROM prefixes p JOIN dict d ON starts_with(d.term, p.prefix)
  QUALIFY row_number() OVER (PARTITION BY p.query_id
                             ORDER BY d.df DESC, d.term ASC)
          <= {PREFIX_MAX_EXPANSIONS})
SELECT CAST(e.query_id AS BIGINT) AS query_id, tf.doc_id,
       CAST(count(*) AS BIGINT) AS n_terms
FROM expanded e JOIN tf ON tf.term = e.term
GROUP BY e.query_id, tf.doc_id
"""


# ---- phrase queries (positional postings) ----

PHRASE_QUERIES: list[tuple[int, str]] = [
    (1, "table scan"),
    (2, "hash join"),
    (3, "batch batch"),            # periodic: overlapping starts count
    (4, "merge part window"),
    (5, "group query row"),
    (6, "slow query scan"),
    (7, "zzznosuchterm scan"),     # miss
    (8, "data line join sort"),
]


def phrase_index_config() -> IndexConfig:
    cfg = doc_index_config()
    cfg.store_positions = True
    return cfg


def ensure_phrase_index(sf_dir: str) -> IndexPaths:
    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    root = f"/tmp/graft_phrase_index/{tag}"
    return build_index(_docs_as_corpus(sf_dir), root, phrase_index_config(),
                       id_column="doc_id", resume=True, source_tag=sf_dir)


def phrase_search(sf_dir: str):
    """(query_id, doc_id, n_matches) — exact positional phrase match over
    the positions-enabled index, through the phrase actor pool. The
    oracle recomputes it in SQL from token ordinals (a positional
    self-join), so adjacency semantics are checked exactly — including
    overlapping occurrences of periodic phrases."""
    from searchengine_ray.pipelines.query import phrase_queries

    paths = ensure_phrase_index(sf_dir)
    return phrase_queries(paths, PHRASE_QUERIES, config=phrase_index_config(),
                          concurrency=(1, 2))


PROX_QUERIES = [
    (1, "hash join", 4),
    (2, "query scan", 6),
    (3, "merge window", 8),
    (4, "batch batch", 5),          # repeated term: ordered chains only
    (5, "group row limit", 8),
    (6, "zzznosuchterm join", 4),   # miss
]


def proximity_search(sf_dir: str):
    """(query_id, doc_id, n_chains) — ordered within-window
    co-occurrence over the positions-enabled index: tuples of positions
    ``p_0 < p_1 < ...`` with each gap <= the query's window. The oracle
    counts the same tuples with an m-way positional self-join, so the
    chain-count DP is checked exactly (including repeated-term
    queries)."""
    from searchengine_ray.pipelines.query import proximity_queries

    paths = ensure_phrase_index(sf_dir)
    return proximity_queries(paths, PROX_QUERIES,
                             config=phrase_index_config(), concurrency=(1, 2))


def proximity_search_sql() -> str:
    analyzer = Analyzer(phrase_index_config())
    selects = []
    for qid, text, window in PROX_QUERIES:
        toks = analyzer.raw_tokens(text)
        joins = []
        for i, t in enumerate(toks[1:], start=1):
            joins.append(
                f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id "
                f"AND t{i}.pos > t{i - 1}.pos "
                f"AND t{i}.pos <= t{i - 1}.pos + {window} "
                f"AND t{i}.term = '{t}'")
        selects.append(f"""
SELECT CAST({qid} AS BIGINT) AS query_id, t0.doc_id,
       CAST(count(*) AS BIGINT) AS n_chains
FROM toks t0 {' '.join(joins)}
WHERE t0.term = '{toks[0]}' GROUP BY t0.doc_id""")
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term,
         generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), 1) AS raw_pos
  FROM documents),
toks AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1 AS pos
  FROM raw WHERE term <> '')
{union}
"""


def phrase_search_sql() -> str:
    analyzer = Analyzer(phrase_index_config())
    selects = []
    for qid, text in PHRASE_QUERIES:
        toks = analyzer.raw_tokens(text)
        joins = []
        for i, t in enumerate(toks[1:], start=1):
            joins.append(f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id "
                         f"AND t{i}.pos = t0.pos + {i} AND t{i}.term = '{t}'")
        selects.append(f"""
SELECT CAST({qid} AS BIGINT) AS query_id, t0.doc_id,
       CAST(count(*) AS BIGINT) AS n_matches
FROM toks t0 {' '.join(joins)}
WHERE t0.term = '{toks[0]}' GROUP BY t0.doc_id""")
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term,
         generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), 1) AS raw_pos
  FROM documents),
toks AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1 AS pos
  FROM raw WHERE term <> '')
{union}
"""


def index_dictionary(sf_dir: str):
    """(term, df) of the real compressed index over documents — checkable
    against SQL df because the simple analyzer == the SQL tokenizer.

    Streams: per-partition pre-aggregation inside ``map_batches`` (a
    term's bucket slices all live in ONE dictionary partition, so the
    per-batch sum is already the global sum — blocks never split a
    partition's term because each dictionary file is one block at gate
    scale, and at vocabulary scale the final tiny groupby below folds
    any block-split remainders). No driver-side full-dictionary pandas."""
    from pathlib import Path

    import ray.data

    paths = ensure_doc_index(sf_dir)
    files = sorted(str(f) for f in Path(paths.dictionary).glob("*.parquet"))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("term").aggregate([("df", "sum")])
        return pa.table({"term": g.column("term"),
                         "df": g.column("df_sum").cast(pa.int64())})

    ds = ray.data.read_parquet(files, columns=["term", "df"]) \
                 .map_batches(partial, batch_format="pyarrow")
    # second fold: terms split across blocks/partitions (vocabulary-scale
    # safety); input rows here are the already-collapsed partials. The
    # result stays a Dataset — never materialized on the driver.
    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"term": batch.column("term"),
                         "df": batch.column("sum(df)").cast(pa.int64())})

    return ds.groupby("term").sum("df").map_batches(
        rename, batch_format="pyarrow")


def index_dictionary_sql() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents)
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM toks WHERE term <> '' GROUP BY term
"""


# ---- more-like-this: document-similarity retrieval via the index ----

MLT_SEED_DOCS = [3, 57, 123, 404]
MLT_TERMS = 5          # tf-idf-selected query terms per seed doc
MLT_K = 5              # neighbours returned per seed


def more_like_this(sf_dir: str):
    """(query_id, rank, doc_id, score_bp) — "find documents like this
    one": for each seed doc, select its MLT_TERMS strongest terms by
    tf x BM25-idf (basis-pointed, term-asc ties — deterministic on
    both sides), run them as a BM25 query through the actor-pool
    executors, and return the top MLT_K neighbours excluding the seed
    itself. The reference-class relevance-feedback feature (Lucene
    MoreLikeThis), composed entirely from the engine's own pieces.

    Scale shape: seed texts are a predicate-pushdown filter + bounded
    take (|seeds| rows); seed-term df resolves from the dictionary
    parquet by column-pruned isin read (only the candidate terms'
    row groups decode — at scale the hash partitioning means only the
    owning parts are touched); scoring runs through the shared-index
    query pool exactly like bm25_topk. query_id IS the seed doc_id."""
    import math

    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.query import search_queries

    paths = ensure_doc_index(sf_dir)
    cfg = doc_index_config()
    analyzer = Analyzer(cfg)
    n_docs = paths.meta()["N"]
    seed_set = set(MLT_SEED_DOCS)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mask = np.isin(ids, list(seed_set))
        return batch.filter(pa.array(mask))

    seeds = read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    seed_tf = {int(r["doc_id"]): Counter(analyzer.terms(r["text"]))
               for r in seeds}

    cand_terms = sorted({t for c in seed_tf.values() for t in c})
    from pathlib import Path as _P

    dict_files = sorted(str(f) for f in _P(paths.dictionary).glob("*.parquet"))
    dtab = pq.read_table(dict_files, columns=["term", "df"],
                         filters=[("term", "in", cand_terms)])
    df_map = dict(zip(dtab.column("term").to_pylist(),
                      (int(x) for x in dtab.column("df").to_pylist())))

    queries = []
    for seed in MLT_SEED_DOCS:
        scored = []
        for term, tf in seed_tf[seed].items():
            idf = math.log((n_docs - df_map[term] + 0.5)
                           / (df_map[term] + 0.5) + 1.0)
            scored.append((-int(np.floor(tf * idf * 10000 + 0.5)), term))
        top = [t for _, t in sorted(scored)[:MLT_TERMS]]
        queries.append((seed, " ".join(top)))

    res = search_queries(paths, queries, k=MLT_K + 1, config=cfg,
                         concurrency=(1, 2)).to_pandas()
    res = res[res["doc_id"] != res["query_id"]]
    res = res.sort_values(["query_id", "rank"]).groupby(
        "query_id", as_index=False).head(MLT_K)
    res["rank"] = res.groupby("query_id").cumcount() + 1
    res["score_bp"] = np.floor(
        res["score"].to_numpy() * 10000 + 0.5).astype(np.int64)
    out = res[["query_id", "rank", "doc_id", "score_bp"]] \
        .astype({"rank": np.int64})
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def more_like_this_sql(k1: float = 1.2, b: float = 0.75) -> str:
    seeds_sql = ",".join(f"({s})" for s in MLT_SEED_DOCS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
seeds(seed) AS (VALUES {seeds_sql}),
cand AS (
  SELECT s.seed, tf.term,
         CAST(floor(tf.tf * ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                    * 10000 + 0.5) AS BIGINT) AS sel_bp
  FROM seeds s
  JOIN tf ON tf.doc_id = s.seed
  JOIN df ON df.term = tf.term
  CROSS JOIN stats st),
top_terms AS (
  SELECT seed, term FROM (
    SELECT seed, term,
           row_number() OVER (PARTITION BY seed
                              ORDER BY sel_bp DESC, term ASC) AS rn
    FROM cand) WHERE rn <= {MLT_TERMS}),
scores AS (
  SELECT t.seed AS query_id, tf.doc_id,
         sum(ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / st.avgdl)))
           AS score
  FROM top_terms t
  JOIN df ON df.term = t.term
  JOIN tf ON tf.term = t.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats st
  WHERE tf.doc_id <> t.seed
  GROUP BY t.seed, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scores)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rnk <= {MLT_K}
"""


# ---- pseudo-relevance feedback (RM3-style query expansion) ----

PRF_FB_K = 5       # feedback depth: round-1 docs mined per query
PRF_FB_TERMS = 5   # expansion terms appended per query


def prf_search(sf_dir: str):
    """(query_id, rank, doc_id, score_bp) — two-round BM25 with
    pseudo-relevance feedback (Rocchio 1971 / RM3): round 1 retrieves
    each DOC_QUERIES query's top PRF_FB_K docs, the feedback docs'
    terms are scored sum-tf x BM25-idf (basis-pointed, term-asc ties
    — the more_like_this selection rule), the top PRF_FB_TERMS terms
    NOT already in the query are appended with weight 1, and round 2
    ranks the expanded bag. Queries with no round-1 hits pass through
    unexpanded (and stay empty).

    Scale shape: both retrieval rounds run through the shared-index
    actor pool exactly like bm25_topk; the only driver-side state is
    bounded at |queries| x PRF_FB_K feedback texts (predicate-pushdown
    pick) and their candidate terms' dictionary rows (column-pruned
    isin read) — corpus-size-independent, the more_like_this shape."""
    import math

    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.query import search_queries

    paths = ensure_doc_index(sf_dir)
    cfg = doc_index_config()
    analyzer = Analyzer(cfg)
    n_docs = paths.meta()["N"]

    r1 = search_queries(paths, DOC_QUERIES, k=PRF_FB_K, config=cfg,
                        concurrency=(1, 2)).to_pandas()
    fb_ids = sorted({int(d) for d in r1["doc_id"]})

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, fb_ids)))

    fb = read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    fb_tf = {int(r["doc_id"]): Counter(analyzer.terms(r["text"]))
             for r in fb}

    cand_terms = sorted({t for c in fb_tf.values() for t in c})
    from pathlib import Path as _P

    dict_files = sorted(str(f) for f in _P(paths.dictionary).glob("*.parquet"))
    dtab = pq.read_table(dict_files, columns=["term", "df"],
                         filters=[("term", "in", cand_terms)])
    df_map = dict(zip(dtab.column("term").to_pylist(),
                      (int(x) for x in dtab.column("df").to_pylist())))

    expanded = []
    for qid, text in DOC_QUERIES:
        orig = set(analyzer.terms(text))
        agg: Counter = Counter()
        for d in r1.loc[r1["query_id"] == qid, "doc_id"]:
            agg.update(fb_tf[int(d)])
        scored = []
        for term, tf in agg.items():
            if term in orig:
                continue
            idf = math.log((n_docs - df_map[term] + 0.5)
                           / (df_map[term] + 0.5) + 1.0)
            scored.append((-int(np.floor(tf * idf * 10000 + 0.5)), term))
        top = [t for _, t in sorted(scored)[:PRF_FB_TERMS]]
        expanded.append((qid, " ".join([text] + top)))

    res = search_queries(paths, expanded, k=K, config=cfg,
                         concurrency=(1, 2)).to_pandas()
    res["score_bp"] = np.floor(
        res["score"].to_numpy() * 10000 + 0.5).astype(np.int64)
    res["rank"] = res["rank"].astype(np.int64)
    out = res[["query_id", "rank", "doc_id", "score_bp"]]
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def prf_search_sql(k1: float = 1.2, b: float = 0.75) -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in DOC_QUERIES:
        for term, qtf in sorted(Counter(analyzer.terms(text)).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    values_sql = ",\n        ".join(values)
    idf = "ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0)"
    bm25 = (f"sum(q.qtf * ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1.0)"
            f" * tf.tf * ({k1} + 1.0)"
            f" / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / st.avgdl)))")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
queries(query_id, qterm, qtf) AS (VALUES
        {values_sql}),
scores1 AS (
  SELECT q.query_id, tf.doc_id, {bm25} AS score
  FROM queries q
  JOIN df ON df.term = q.qterm
  JOIN tf ON tf.term = q.qterm
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats st
  GROUP BY q.query_id, tf.doc_id),
fbdocs AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rnk
    FROM scores1) WHERE rnk <= {PRF_FB_K}),
fbterm AS (
  SELECT f.query_id, tf.term,
         CAST(floor(sum(tf.tf) * {idf} * 10000 + 0.5) AS BIGINT) AS sel_bp
  FROM fbdocs f
  JOIN tf ON tf.doc_id = f.doc_id
  JOIN df ON df.term = tf.term
  CROSS JOIN stats st
  WHERE NOT EXISTS (SELECT 1 FROM queries q
                    WHERE q.query_id = f.query_id AND q.qterm = tf.term)
  GROUP BY f.query_id, tf.term, df.df, st.n),
expterms AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sel_bp DESC, term ASC) AS rn
    FROM fbterm) WHERE rn <= {PRF_FB_TERMS}),
q2 AS (
  SELECT query_id, qterm, qtf FROM queries
  UNION ALL
  SELECT query_id, term AS qterm, 1 AS qtf FROM expterms),
scores2 AS (
  SELECT q.query_id, tf.doc_id, {bm25} AS score
  FROM q2 q
  JOIN df ON df.term = q.qterm
  JOIN tf ON tf.term = q.qterm
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats st
  GROUP BY q.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scores2)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rnk <= {K}
"""


# ---- percolation: standing queries over a document stream ----

PERC_QUERIES: list[tuple[int, str]] = [
    (1, "hash join"),
    (2, "customer order line"),
    (3, "window agg"),
    (4, "zzznosuchterm stream"),      # can never match
    (5, "value"),
]


class _PercolateStage:
    """Zero-shuffle standing-query matcher: the bounded query set
    compiles once per actor into (term -> query bitmask) over the
    SHARED analyzer; each batch tokenizes once and a doc matches query
    q iff q's term mask is a subset of the doc's. The reverse-search /
    alerting primitive (Elasticsearch percolator) in batch form."""

    def __init__(self, queries: list[tuple[int, str]]):
        self.analyzer = Analyzer(doc_index_config())
        self.qids: list[int] = []
        self.masks: list[frozenset] = []
        for qid, text in queries:
            terms = frozenset(self.analyzer.terms(text))
            if terms:
                self.qids.append(qid)
                self.masks.append(terms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = batch.column("text").to_pylist()
        codes, docs, tfs, info = self.analyzer.tokenize_batch(
            texts, np.arange(len(texts), dtype=np.int64))
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        if len(codes):
            vidx = {t: i for i, t in enumerate(info["vocab"])}
            for qid, mask in zip(self.qids, self.masks):
                qcodes = [vidx[t] for t in mask if t in vidx]
                if len(qcodes) != len(mask):
                    continue          # a term absent from the batch vocab
                sel = np.isin(codes, qcodes)
                cnt = np.bincount(docs[sel], minlength=len(texts))
                hit = ids[cnt == len(qcodes)]
                out_q.append(np.full(len(hit), qid, np.int64))
                out_d.append(hit)
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({"query_id": int64_col(np.concatenate(out_q)),
                         "doc_id": int64_col(np.concatenate(out_d))})


def percolate(sf_dir: str, queries: list[tuple[int, str]] | None = None):
    """(query_id, doc_id) — every standing query each document matches
    (all of the query's analyzed terms present): the percolator /
    alerting primitive that routes a document STREAM against a bounded
    registered-query set. ONE zero-shuffle map_batches scan — the
    query masks compile once per actor, documents never leave their
    blocks, so this composes with any ingest pipeline as a side tap.
    Queries with unindexable or absent terms simply never match."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _PercolateStage, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4),
        fn_constructor_args=(queries or PERC_QUERIES,))


def percolate_sql(queries: list[tuple[int, str]] | None = None) -> str:
    analyzer = Analyzer(doc_index_config())
    values, nterms = [], []
    for qid, text in (queries or PERC_QUERIES):
        terms = sorted(set(analyzer.terms(text)))
        for t in terms:
            values.append(f"({qid}, '{t}')")
        if terms:
            nterms.append(f"({qid}, {len(terms)})")
    values_sql = ",\n        ".join(values)
    nterms_sql = ",".join(nterms)
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
q(query_id, term) AS (VALUES
        {values_sql}),
qn(query_id, n_terms) AS (VALUES {nterms_sql})
SELECT q.query_id, toks.doc_id
FROM q JOIN toks USING (term) JOIN qn USING (query_id)
WHERE term <> ''
GROUP BY q.query_id, toks.doc_id, qn.n_terms
HAVING count(DISTINCT term) = qn.n_terms
"""


# ---- index fsck: distributed integrity check ----


def _fsck_batch(batch: pa.Table) -> pa.Table:
    """One postings-parquet row group -> violation rows. Per term row:
    rebuild the PostingBlocks, decode, and check every structural
    invariant the query path RELIES on instead of re-verifying."""
    from searchengine_ray.codec import PostingBlocks, decode_blocks

    terms: list[str] = []
    kinds: list[str] = []
    df_col = batch.column("df").to_numpy(zero_copy_only=False)
    for i in range(batch.num_rows):
        term = batch.column("term")[i].as_py()
        df = int(df_col[i])
        counts = np.asarray(batch.column("counts")[i].as_py(), np.int32)
        last_docs = np.asarray(batch.column("last_docs")[i].as_py(), np.int64)
        max_tfs = np.asarray(batch.column("max_tfs")[i].as_py(), np.int32)
        dsz = np.asarray(batch.column("doc_sizes")[i].as_py(), np.int64)
        tsz = np.asarray(batch.column("tf_sizes")[i].as_py(), np.int64)
        doc_offsets = np.zeros(len(dsz) + 1, np.int64)
        tf_offsets = np.zeros(len(tsz) + 1, np.int64)
        np.cumsum(dsz, out=doc_offsets[1:])
        np.cumsum(tsz, out=tf_offsets[1:])
        pb = PostingBlocks(batch.column("doc_bytes")[i].as_py(),
                           batch.column("tf_bytes")[i].as_py(),
                           counts, last_docs, max_tfs,
                           doc_offsets, tf_offsets)

        def flag(kind: str) -> None:
            terms.append(term)
            kinds.append(kind)

        try:
            doc_ids, tfs = decode_blocks(pb)
        except Exception:
            flag("decode_error")
            continue
        if int(counts.sum()) != df:
            flag("block_count_mismatch")
        if len(doc_ids) != df:
            flag("df_mismatch")
        if len(doc_ids) > 1 and not bool(np.all(np.diff(doc_ids) > 0)):
            flag("docs_not_ascending")
        if len(tfs) and int(tfs.min()) < 1:
            flag("nonpositive_tf")
        ends = np.cumsum(counts) - 1
        if len(doc_ids) == df and len(ends) and (
                len(last_docs) != len(counts)
                or not bool(np.array_equal(doc_ids[ends], last_docs))):
            flag("last_doc_mismatch")
        if len(tfs) == df and len(ends):
            starts = np.r_[0, np.cumsum(counts)[:-1]]
            bmax = np.maximum.reduceat(tfs, starts) if len(tfs) else max_tfs
            if not bool(np.array_equal(bmax.astype(np.int64),
                                       max_tfs.astype(np.int64))):
                flag("blockmax_mismatch")
    return pa.table({"term": pa.array(terms, pa.string()),
                     "kind": pa.array(kinds, pa.string())})


def index_fsck(sf_dir: str):
    """(term, kind) — structural-integrity violations across the whole
    compressed index, expected EMPTY: every posting row must decode,
    carry exactly df docid-ascending postings, and agree with its block
    metadata (per-block counts, last-doc fences, WAND block maxima —
    the fields the pruned scorers TRUST without re-checking). The
    distributed fsck every long-lived index deployment runs after
    compactions/migrations; one map_batches pass over the postings
    parquet, no shuffle, violations-only output (the
    window_user_hll_violations convention — a corrupt index
    hash-mismatches the gate by producing rows)."""
    from pathlib import Path as _P

    import ray.data

    paths = ensure_doc_index(sf_dir)
    # the dir holds per-part resume manifests beside the parquet
    files = sorted(str(f) for f in _P(paths.postings).glob("*.parquet"))
    ds = ray.data.read_parquet(
        files,
        columns=["term", "df", "counts", "last_docs", "max_tfs",
                 "doc_sizes", "tf_sizes", "doc_bytes", "tf_bytes"])
    out = ds.map_batches(_fsck_batch, batch_format="pyarrow",
                         batch_size=512)
    # materialize with an EXPLICIT schema: the expected result is empty
    # and an all-empty Dataset loses column types on to_pandas (the
    # *_violations precedent); take_all is bounded by violation count
    rows = out.take_all()
    return pa.table({
        "term": pa.array([r["term"] for r in rows], pa.string()),
        "kind": pa.array([r["kind"] for r in rows], pa.string())})


def index_fsck_sql() -> str:
    """A healthy index yields no violations: empty set."""
    return """
SELECT CAST(NULL AS VARCHAR) AS term, CAST(NULL AS VARCHAR) AS kind
WHERE FALSE
"""


# ---- MMR diversified re-ranking ----

MMR_M = 5          # diversified results returned per query
MMR_LAMBDA10 = 7   # relevance weight x10 (lambda = 0.7)


def mmr_rerank(sf_dir: str, m: int = MMR_M):
    """(query_id, rank, doc_id, mmr_bp) — Maximal Marginal Relevance
    re-ranking (Carbonell & Goldstein 1998) of the BM25 top-K: greedily
    pick the doc maximizing 7·relevance − 3·max-similarity-to-selected
    (λ=0.7 in integer tenths), where similarity is the bp'd Jaccard of
    the two docs' distinct term sets — the standard redundancy-killer
    for template-heavy corpora. All-integer scoring with
    (mmr desc, doc_id asc) ties, so the greedy trajectory is exact on
    both sides; the oracle unrolls the m selection rounds as CTEs.

    Scale shape: candidates are the bounded |queries|×K BM25 result
    (the pool-scored path), their term sets a predicate-pushdown read —
    the greedy loop runs on K=10 candidates per query, driver-side by
    design (MMR is sequential; its input is already top-k-small)."""
    ex = bm25_topk(sf_dir).to_pandas()
    cand_ids = sorted({int(d) for d in ex["doc_id"]})
    analyzer = Analyzer(doc_index_config())

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, cand_ids)))

    rows = read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    tsets = {int(r["doc_id"]): frozenset(analyzer.terms(r["text"]))
             for r in rows}

    def sim_bp(a: int, b: int) -> int:
        sa, sb = tsets[a], tsets[b]
        i = len(sa & sb)
        return i * 10000 // (len(sa) + len(sb) - i) if i else 0

    out_q: list[int] = []
    out_r: list[int] = []
    out_d: list[int] = []
    out_s: list[int] = []
    for qid, g in ex.groupby("query_id"):
        cands = list(zip(g["doc_id"].astype(int), g["score_bp"].astype(int)))
        selected: list[int] = []
        for rank in range(1, min(m, len(cands)) + 1):
            best = None
            for did, score in cands:
                if did in selected:
                    continue
                ms = max((sim_bp(did, s) for s in selected), default=0)
                mmr = MMR_LAMBDA10 * score - (10 - MMR_LAMBDA10) * ms
                key = (-mmr, did)
                if best is None or key < best[0]:
                    best = (key, did, mmr)
            selected.append(best[1])
            out_q.append(int(qid))
            out_r.append(rank)
            out_d.append(best[1])
            out_s.append(best[2])
    return pa.table({"query_id": int64_col(out_q),
                     "rank": int64_col(out_r),
                     "doc_id": int64_col(out_d),
                     "mmr_bp": int64_col(out_s)})


def mmr_rerank_sql(m: int = MMR_M) -> str:
    lam, mu = MMR_LAMBDA10, 10 - MMR_LAMBDA10
    rounds = []
    for r in range(2, m + 1):
        rounds.append(f"""
p{r} AS (
  SELECT e.query_id, e.doc_id, e.score_bp,
         {lam} * e.score_bp - {mu} * COALESCE(mx.ms, 0) AS mmr_bp
  FROM ex e
  LEFT JOIN (SELECT s.query_id, sim.db AS doc_id,
                    max(sim.sim_bp) AS ms
             FROM sel{r - 1} s
             JOIN sim ON sim.query_id = s.query_id AND sim.da = s.doc_id
             GROUP BY s.query_id, sim.db) mx
    ON mx.query_id = e.query_id AND mx.doc_id = e.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM sel{r - 1} s2
                    WHERE s2.query_id = e.query_id
                      AND s2.doc_id = e.doc_id)),
s{r} AS (
  SELECT query_id, doc_id, score_bp, mmr_bp, {r} AS rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY mmr_bp DESC, doc_id ASC) AS rn
    FROM p{r}) WHERE rn = 1),
sel{r} AS MATERIALIZED (SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM s{r})""")
    rounds_sql = ",".join(rounds)
    return f"""
WITH ex AS MATERIALIZED ({bm25_topk_sql()}),
toks2 AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
cterms AS MATERIALIZED (
  SELECT DISTINCT e.query_id, e.doc_id, t.term
  FROM (SELECT DISTINCT query_id, doc_id FROM ex) e
  JOIN toks2 t USING (doc_id) WHERE t.term <> ''),
sz AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n
       FROM cterms GROUP BY query_id, doc_id),
inter AS (
  SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
         CAST(count(*) AS BIGINT) AS i
  FROM cterms a
  JOIN cterms b ON b.query_id = a.query_id AND b.term = a.term
               AND b.doc_id <> a.doc_id
  GROUP BY a.query_id, a.doc_id, b.doc_id),
sim AS MATERIALIZED (
  SELECT i.query_id, i.da, i.db,
         CAST(i.i * 10000 // (sa.n + sb.n - i.i) AS BIGINT) AS sim_bp
  FROM inter i
  JOIN sz sa ON sa.query_id = i.query_id AND sa.doc_id = i.da
  JOIN sz sb ON sb.query_id = i.query_id AND sb.doc_id = i.db),
s1 AS (
  SELECT query_id, doc_id, score_bp,
         CAST({lam} * score_bp AS BIGINT) AS mmr_bp, 1 AS rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_bp DESC, doc_id ASC) AS rn
    FROM ex) WHERE rn = 1),
sel1 AS MATERIALIZED (SELECT query_id, doc_id, score_bp, mmr_bp, rank FROM s1),
{rounds_sql}
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(mmr_bp AS BIGINT) AS mmr_bp
FROM sel{m}
"""


# ---- faceted search: per-query facet counts over the match set ----

_FACET_JPARTS = 32


def facet_search(sf_dir: str):
    """(query_id, facet, value, n_docs) — faceted retrieval: for every
    DOC_QUERY, the distribution of its OR-match set (docs containing at
    least one query term) over the ``lang`` and ``source`` doc-value
    dimensions — the Lucene-facets / e-commerce-sidebar capability the
    reference's ranked-only path has no analog for.

    Scale shape: the match set comes from the same actor-pool union
    executors as ``prefix_search`` (``terms_union_queries``), so postings
    decode once per query term; facet values are a two-narrow-column
    projection of the corpus (the doc-values file of a real index — never
    the text). Matches and doc values co-locate via ONE metadata-only
    ``groupby(doc_id % _FACET_JPARTS)`` exchange (the ``dedup_apply``
    anti-join shape, here as an inner join), each group emits bounded
    (query_id, facet, value) partials, and a tiny final groupby folds
    them. Nothing query-scale or corpus-scale ever lands on the driver.
    """
    import pandas as pd

    from searchengine_ray.pipelines.query import terms_union_queries

    paths = ensure_doc_index(sf_dir)
    analyzer = Analyzer(doc_index_config())
    expanded = [(qid, " ".join(sorted(set(analyzer.terms(text)))))
                for qid, text in DOC_QUERIES]
    matches = terms_union_queries(paths, [(q, t) for q, t in expanded if t],
                                  config=doc_index_config(),
                                  concurrency=(1, 2))

    def match_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        return pa.table({
            "jpart": int64_col(ids % _FACET_JPARTS),
            "doc_id": int64_col(ids),
            "query_id": batch.column("query_id").cast(pa.int64()),
            "lang": pa.array([""] * n, pa.string()),
            "source": pa.array([""] * n, pa.string()),
            "side": int64_col(np.ones(n, np.int64))})

    def value_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        return pa.table({
            "jpart": int64_col(ids % _FACET_JPARTS),
            "doc_id": int64_col(ids),
            "query_id": int64_col(np.zeros(n, np.int64)),
            "lang": batch.column("lang"),
            "source": batch.column("source"),
            "side": int64_col(np.zeros(n, np.int64))})

    def facet_group(df: "pd.DataFrame") -> pa.Table:
        vals = df[df["side"] == 0]
        hits = df[df["side"] == 1]
        if vals.empty or hits.empty:
            return pa.table({"query_id": int64_col([]),
                             "facet": pa.array([], pa.string()),
                             "value": pa.array([], pa.string()),
                             "n_p": int64_col([])})
        j = hits[["query_id", "doc_id"]].merge(
            vals[["doc_id", "lang", "source"]], on="doc_id")
        parts = []
        for facet in ("lang", "source"):
            g = j.groupby(["query_id", facet], as_index=False) \
                 .agg(n_p=("doc_id", "size"))
            g["facet"] = facet
            parts.append(g.rename(columns={facet: "value"}))
        out = pd.concat(parts, ignore_index=True)
        return pa.table({
            "query_id": int64_col(out["query_id"].to_numpy(np.int64)),
            "facet": pa.array(out["facet"].astype(str), pa.string()),
            "value": pa.array(out["value"].astype(str), pa.string()),
            "n_p": int64_col(out["n_p"].to_numpy(np.int64))})

    m = matches.map_batches(match_side, batch_format="pyarrow")
    v = read(sf_dir, "documents", ["doc_id", "lang", "source"]).map_batches(
        value_side, batch_format="pyarrow", batch_size=65536)
    partial = m.union(v).groupby("jpart").map_groups(
        facet_group, batch_format="pandas")
    from ray.data.aggregate import Sum

    return partial.groupby(["query_id", "facet", "value"]).aggregate(
        Sum("n_p", alias_name="n_docs"))


def facet_search_sql() -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in DOC_QUERIES:
        for term in sorted(set(analyzer.terms(text))):
            values.append(f"({qid}, '{term}')")
    values_sql = ",\n        ".join(values)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
queries(query_id, term) AS (VALUES
        {values_sql}),
matches AS (
  SELECT DISTINCT q.query_id, tf.doc_id
  FROM queries q JOIN tf ON tf.term = q.term)
SELECT CAST(m.query_id AS BIGINT) AS query_id, f.facet, f.value,
       CAST(count(*) AS BIGINT) AS n_docs
FROM matches m
JOIN documents d ON d.doc_id = m.doc_id
CROSS JOIN LATERAL (VALUES ('lang', d.lang), ('source', d.source))
  AS f(facet, value)
GROUP BY m.query_id, f.facet, f.value
"""


# ---- index merge: two half-corpus indexes fold into one ----


def ensure_merged_doc_index(sf_dir: str) -> IndexPaths:
    """Build (once) two INDEPENDENT indexes over the even/odd halves of
    the documents table, then ``merge_indexes`` them — the Lucene
    segment-merge lifecycle op, exercised end to end. Cached per
    sf_dir; the halves and the merged index live under /tmp."""
    import json
    from pathlib import Path

    from searchengine_ray.pipelines.build import merge_indexes

    from searchengine_ray.pipelines.trigram import _corpus_fingerprint

    tag = hashlib.blake2b(
        f"{sf_dir}|merge|{_corpus_fingerprint(sf_dir)}".encode(),
        digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_merge_index/{tag}")
    merged = root / "merged"
    marker = root / "_DONE.json"
    if marker.is_file():
        return IndexPaths(str(merged))
    corpus = _docs_as_corpus(sf_dir)

    def half(side: int):
        def pick(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            out = batch.filter(pa.array(ids % 2 == side))
            return out.drop_columns(["doc_id"])

        return corpus.map_batches(pick, batch_format="pyarrow")

    for side in (0, 1):
        d = root / f"half{side}"
        if not d.is_dir():
            half(side).write_parquet(str(d))
    ia = build_index(str(root / "half0"), root / "ia", doc_index_config(),
                     resume=True, source_tag=f"{sf_dir}|half0")
    ib = build_index(str(root / "half1"), root / "ib", doc_index_config(),
                     resume=True, source_tag=f"{sf_dir}|half1")
    out = merge_indexes(ia.root, ib.root, merged)
    marker.write_text(json.dumps({"sf_dir": sf_dir}))
    return out


def index_merge_dictionary(sf_dir: str):
    """(term, df) of the MERGED index over the two half-corpus builds —
    the merge's correctness gate: global document frequencies must come
    out identical to a single whole-corpus analysis (the same SQL
    oracle as ``index_dictionary``), which only holds if the shifted
    postings, per-(term,bucket) byte concat and dictionary rewrite are
    all exact."""
    from pathlib import Path

    import ray.data

    paths = ensure_merged_doc_index(sf_dir)
    files = sorted(str(f) for f in Path(paths.dictionary).glob("*.parquet"))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("term").aggregate([("df", "sum")])
        return pa.table({"term": g.column("term"),
                         "df": g.column("df_sum").cast(pa.int64())})

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"term": batch.column("term"),
                         "df": batch.column("sum(df)").cast(pa.int64())})

    return ray.data.read_parquet(files, columns=["term", "df"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("term").sum("df") \
        .map_batches(rename, batch_format="pyarrow")


# ---- hybrid retrieval: reciprocal-rank fusion of BM25 + ANN ----

RRF_K = 60            # the canonical RRF damping constant
RRF_SCALE = 1_000_000  # integer milli-ish units: 10^6 // (k + rank)
RRF_N_QUERIES = 5      # hybrid query i pairs DOC_QUERIES[i] with vec i


def hybrid_search(sf_dir: str, k: int = 10):
    """(query_id, rank, doc_id, rrf_u) — hybrid retrieval: reciprocal
    rank fusion (Cormack, Clarke & Büttcher 2009) of the lexical BM25
    top-k and the embedding ANN top-k, ``score = Σ 1e6 // (60 + rank)``
    over the lists a doc appears in — the standard lexical+semantic
    fusion of a modern search stack, composed entirely from the
    engine's own retrieval paths (query i fuses DOC_QUERIES[i] with
    embedding vector i; the driver tables share the dense doc-id
    space). All-integer scores with (rrf desc, doc_id asc) ties.

    Scale shape: both inputs are the already-distributed retrieval ops;
    fusion runs on their bounded top-k output (≤ queries × 2k rows) —
    the MMR/driver-side-by-design pattern."""
    import pandas as pd

    from searchengine_ray.pipelines import ann

    lex = bm25_topk(sf_dir).to_pandas()
    lex = lex[lex["query_id"] <= RRF_N_QUERIES]
    sem = ann.ann_topk(sf_dir, query_ids=list(range(RRF_N_QUERIES)),
                       k=K).to_pandas()
    sem["query_id"] = sem["query_vec_id"].astype(np.int64) + 1
    sem = sem.rename(columns={"vec_id": "doc_id"})
    both = pd.concat([lex[["query_id", "doc_id", "rank"]],
                      sem[["query_id", "doc_id", "rank"]]],
                     ignore_index=True)
    both["rrf_u"] = RRF_SCALE // (RRF_K + both["rank"].astype(np.int64))
    fused = both.groupby(["query_id", "doc_id"], as_index=False)["rrf_u"] \
        .sum()
    fused = fused.sort_values(["query_id", "rrf_u", "doc_id"],
                              ascending=[True, False, True],
                              kind="stable")
    fused["rank"] = fused.groupby("query_id").cumcount() + 1
    fused = fused[fused["rank"] <= k]
    return pa.table({
        "query_id": int64_col(fused["query_id"].to_numpy(np.int64)),
        "rank": int64_col(fused["rank"].to_numpy(np.int64)),
        "doc_id": int64_col(fused["doc_id"].to_numpy(np.int64)),
        "rrf_u": int64_col(fused["rrf_u"].to_numpy(np.int64))})


def hybrid_search_sql(k: int = 10) -> str:
    from searchengine_ray.pipelines import ann

    ann_sql = ann.ann_topk_sql(query_ids=list(range(RRF_N_QUERIES)), k=K)
    return f"""
WITH lex AS MATERIALIZED ({bm25_topk_sql()}),
sem AS MATERIALIZED ({ann_sql}),
both_lists AS (
  SELECT query_id, doc_id, rank FROM lex WHERE query_id <= {RRF_N_QUERIES}
  UNION ALL
  SELECT query_vec_id + 1 AS query_id, vec_id AS doc_id, rank FROM sem),
fused AS (
  SELECT query_id, doc_id,
         CAST(sum({RRF_SCALE} // ({RRF_K} + rank)) AS BIGINT) AS rrf_u
  FROM both_lists GROUP BY query_id, doc_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_u DESC, doc_id ASC) AS rnk
  FROM fused)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, rrf_u
FROM ranked WHERE rnk <= {k}
"""


def suggest_terms(sf_dir: str, cap: int = PREFIX_MAX_EXPANSIONS):
    """(query_id, rank, term, df) — query autocomplete: each prefix's
    top-``cap`` index terms by (df desc, term asc), with df. The
    user-facing suggest/typeahead endpoint over the same distributed
    dictionary scan as ``prefix_search`` (one pruned-column pass over
    every dictionary partition matches ALL prefixes; matched rows —
    never the vocabulary — flow through a re-sum and a per-query
    top-cap)."""
    from pathlib import Path

    import pandas as pd
    import ray.data

    paths = ensure_doc_index(sf_dir)
    files = sorted(str(f) for f in Path(paths.dictionary).glob("*.parquet"))
    prefixes = [(int(q), p) for q, p in PREFIX_QUERIES]

    def match(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        dfs = batch.column("df").to_numpy(zero_copy_only=False)
        qids_out, terms_out, dfs_out = [], [], []
        for qid, pre in prefixes:
            hit = np.char.startswith(terms.astype(str), pre)
            qids_out.append(np.full(int(hit.sum()), qid, np.int64))
            terms_out.append(terms[hit])
            dfs_out.append(dfs[hit].astype(np.int64))
        return pa.table({
            "query_id": pa.array(np.concatenate(qids_out), pa.int64()),
            "term": pa.array(np.concatenate(terms_out).astype(str)),
            "df": pa.array(np.concatenate(dfs_out), pa.int64())})

    def top_cap(g: "pd.DataFrame") -> pd.DataFrame:
        g = g.sort_values(["df", "term"], ascending=[False, True],
                          kind="stable").head(cap).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "term", "df"]].astype(
            {"query_id": np.int64, "df": np.int64})

    return (ray.data.read_parquet(files, columns=["term", "df"])
            .map_batches(match, batch_format="pyarrow")
            .groupby(["query_id", "term"]).sum("df")
            .map_batches(lambda b: pa.table(
                {"query_id": b.column("query_id"), "term": b.column("term"),
                 "df": b.column("sum(df)").cast(pa.int64())}),
                batch_format="pyarrow")
            .groupby("query_id").map_groups(top_cap, batch_format="pandas"))


def suggest_terms_sql(cap: int = PREFIX_MAX_EXPANSIONS) -> str:
    values = ",\n        ".join(f"({qid}, '{p}')" for qid, p in PREFIX_QUERIES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
prefixes(query_id, prefix) AS (VALUES
        {values}),
matched AS (
  SELECT p.query_id, d.term, d.df,
         row_number() OVER (PARTITION BY p.query_id
                            ORDER BY d.df DESC, d.term ASC) AS rnk
  FROM prefixes p JOIN dict d ON starts_with(d.term, p.prefix))
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS BIGINT) AS rank,
       term, df
FROM matched WHERE rnk <= {cap}
"""


# ---- fuzzy retrieval: edit-distance-1 term expansion + OR union ----

FUZZY_QUERIES: list[tuple[int, str]] = [
    (1, "hashh joim"),      # two misspellings
    (2, "tabel"),           # transpose
    (3, "strean batch"),    # one misspelling + one exact
    (4, "zzznope"),         # nothing within distance 1
    (5, "scann"),           # insert
    (6, "windo merge"),     # delete + exact
]

FUZZY_MAX_EXPANSIONS = 8


def fuzzy_search(sf_dir: str, cap: int = FUZZY_MAX_EXPANSIONS):
    """(query_id, doc_id, n_terms) — fuzzy retrieval: every query term
    expands to the index terms within Damerau-Levenshtein distance 1
    (top-``cap`` by df desc, term asc — the deterministic expansion
    bound, like ``prefix_search``), then docs containing ANY surviving
    term return with their distinct-match count. Expansion is the
    Norvig variant-set of ``functions/spell.py`` (deletes, transposes,
    replaces, inserts over the analyzer alphabet == DL ≤ 1 exactly,
    since index terms only contain that alphabet) checked by
    vectorized membership against the distributed dictionary scan —
    the same one-pass, matched-rows-only shape as the prefix scan.
    Oracle replays expansion with DuckDB ``damerau_levenshtein``."""
    from pathlib import Path

    import pandas as pd
    import ray.data

    from searchengine_ray.functions.spell import edits1
    from searchengine_ray.pipelines.query import terms_union_queries

    paths = ensure_doc_index(sf_dir)
    analyzer = Analyzer(doc_index_config())
    qterms: list[tuple[int, str, np.ndarray]] = []
    for qid, text in FUZZY_QUERIES:
        for t in sorted(set(analyzer.terms(text))):
            qterms.append((qid, t, np.array(sorted(edits1(t)), dtype=object)))

    files = sorted(str(f) for f in Path(paths.dictionary).glob("*.parquet"))

    def match(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        dfs = batch.column("df").to_numpy(zero_copy_only=False)
        qid_out, qt_out, t_out, d_out = [], [], [], []
        for qid, qt, variants in qterms:
            hit = np.isin(terms, variants)
            n = int(hit.sum())
            qid_out.append(np.full(n, qid, np.int64))
            qt_out.extend([qt] * n)
            t_out.append(terms[hit])
            d_out.append(dfs[hit].astype(np.int64))
        return pa.table({
            "query_id": pa.array(np.concatenate(qid_out), pa.int64()),
            "qterm": pa.array(qt_out, pa.string()),
            "term": pa.array(np.concatenate(t_out).astype(str)),
            "df": pa.array(np.concatenate(d_out), pa.int64())})

    def top_cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["df", "term"], ascending=[False, True],
                          kind="stable").head(cap)
        return g[["query_id", "term"]]

    rows = (ray.data.read_parquet(files, columns=["term", "df"])
            .map_batches(match, batch_format="pyarrow")
            .groupby(["query_id", "qterm", "term"]).sum("df")
            .map_batches(lambda b: pa.table(
                {"query_id": b.column("query_id"),
                 "qterm": b.column("qterm"), "term": b.column("term"),
                 "df": b.column("sum(df)")}), batch_format="pyarrow")
            .groupby(["query_id", "qterm"]).map_groups(
                top_cap, batch_format="pandas")
            .take_all())
    expanded: dict[int, set] = {}
    for r in rows:
        expanded.setdefault(int(r["query_id"]), set()).add(str(r["term"]))
    pairs = [(qid, " ".join(sorted(ts))) for qid, ts in
             sorted(expanded.items())]
    return terms_union_queries(paths, pairs, config=doc_index_config(),
                               concurrency=(1, 2))


def fuzzy_search_sql(cap: int = FUZZY_MAX_EXPANSIONS) -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in FUZZY_QUERIES:
        for t in sorted(set(analyzer.terms(text))):
            values.append(f"({qid}, '{t}')")
    values_sql = ",\n        ".join(values)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
queries(query_id, qterm) AS (VALUES
        {values_sql}),
expanded AS (
  SELECT DISTINCT query_id, term FROM (
    SELECT q.query_id, q.qterm, d.term, d.df,
           row_number() OVER (PARTITION BY q.query_id, q.qterm
                              ORDER BY d.df DESC, d.term ASC) AS rnk
    FROM queries q JOIN dict d
      ON damerau_levenshtein(d.term, q.qterm) <= 1)
  WHERE rnk <= {cap})
SELECT CAST(e.query_id AS BIGINT) AS query_id, tf.doc_id,
       CAST(count(*) AS BIGINT) AS n_terms
FROM expanded e JOIN tf ON tf.term = e.term
GROUP BY e.query_id, tf.doc_id
"""


# ---- field collapsing: at most one result per source ----

COLLAPSE_M = 5


def collapse_search(sf_dir: str, m: int = COLLAPSE_M):
    """(query_id, rank, doc_id, source, score_bp) — field-collapsed
    retrieval: within each query's BM25 top-K pool, keep only the
    best-ranked doc per ``source`` value (the dedupe-by-site /
    one-hit-per-repo result presentation), then re-rank the survivors
    and return the top ``m``. Deterministic everywhere: collapse picks
    by (score_bp desc, doc_id asc) inside each (query, source) group.

    Scale shape: candidates are the bounded pool-scored top-K; their
    source values come from a predicate-pushdown doc-values read of
    exactly those ids (the MMR pattern — the collapse itself runs on
    ≤ queries × K rows by construction)."""
    import pandas as pd

    ex = bm25_topk(sf_dir).to_pandas()
    cand_ids = sorted({int(d) for d in ex["doc_id"]})

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, cand_ids)))

    rows = read(sf_dir, "documents", ["doc_id", "source"]) \
        .map_batches(pick, batch_format="pyarrow").take_all()
    src = {int(r["doc_id"]): str(r["source"]) for r in rows}
    ex["source"] = ex["doc_id"].map(src)
    ex = ex.sort_values(["query_id", "score_bp", "doc_id"],
                        ascending=[True, False, True], kind="stable")
    best = ex.groupby(["query_id", "source"], as_index=False).first()
    best = best.sort_values(["query_id", "score_bp", "doc_id"],
                            ascending=[True, False, True], kind="stable")
    best["rank"] = best.groupby("query_id").cumcount() + 1
    best = best[best["rank"] <= m]
    return pa.table({
        "query_id": int64_col(best["query_id"].to_numpy(np.int64)),
        "rank": int64_col(best["rank"].to_numpy(np.int64)),
        "doc_id": int64_col(best["doc_id"].to_numpy(np.int64)),
        "source": pa.array(best["source"].astype(str), pa.string()),
        "score_bp": int64_col(best["score_bp"].to_numpy(np.int64))})


def collapse_search_sql(m: int = COLLAPSE_M) -> str:
    return f"""
WITH ex AS MATERIALIZED ({bm25_topk_sql()}),
with_src AS (
  SELECT e.query_id, e.doc_id, e.score_bp, d.source
  FROM ex e JOIN documents d ON d.doc_id = e.doc_id),
collapsed AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id, source
                                 ORDER BY score_bp DESC, doc_id ASC) AS rs
    FROM with_src) WHERE rs = 1),
ranked AS (
  SELECT query_id, doc_id, source, score_bp,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_bp DESC, doc_id ASC) AS rnk
  FROM collapsed)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, source, score_bp
FROM ranked WHERE rnk <= {m}
"""


# ---- retrieval evaluation: NDCG@10 under AND-match relevance ----


def _ndcg_coeffs(k: int = K) -> list[int]:
    """Integer DCG coefficients: round(1e6 / log2(rank + 1)) — fixed
    constants, identical literals on both sides, so the whole NDCG
    computation is exact integer arithmetic."""
    import math

    return [int(math.floor(1_000_000 / math.log2(i + 1) + 0.5))
            for i in range(1, k + 1)]


def search_eval_ndcg(sf_dir: str):
    """(query_id, n_rel, ndcg_bp) — retrieval-quality evaluation:
    NDCG@10 of the BM25 ranking under binary AND-match relevance (a doc
    is relevant iff it contains EVERY query term — the deterministic
    stand-in for editorial labels). DCG uses an integer coefficient
    table (µ-units of 1/log2(rank+1)); ndcg_bp = dcg·10⁴ // idcg —
    truncating division on both sides. Queries with zero relevant docs
    emit nothing. The eval harness every search stack runs after a
    ranker change, composed from the engine's own retrieval paths.

    Scale shape: the relevant set comes from the distributed boolean
    AND executors; the driver sees only per-query counts plus the
    bounded (query × 10) membership flags."""
    import pandas as pd

    from searchengine_ray.pipelines.query import boolean_queries

    paths = ensure_doc_index(sf_dir)
    ranked = bm25_topk(sf_dir).to_pandas()
    cand = {(int(q), int(d)) for q, d in
            zip(ranked["query_id"], ranked["doc_id"])}
    matches = boolean_queries(paths, DOC_QUERIES, config=doc_index_config(),
                              concurrency=(1, 2))

    def tag(batch: pa.Table) -> pa.Table:
        qs = batch.column("query_id").to_numpy(zero_copy_only=False)
        ds_ = batch.column("doc_id").to_numpy(zero_copy_only=False)
        inpool = np.fromiter(((int(a), int(b)) in cand
                              for a, b in zip(qs, ds_)), bool, len(qs))
        return pa.table({"query_id": int64_col(qs.astype(np.int64)),
                         "doc_id": int64_col(ds_.astype(np.int64)),
                         "inpool": pa.array(inpool)})

    rows = matches.map_batches(tag, batch_format="pyarrow").to_pandas()
    n_rel = rows.groupby("query_id").size()
    rel_pairs = {(int(q), int(d)) for q, d in
                 zip(rows[rows["inpool"]]["query_id"],
                     rows[rows["inpool"]]["doc_id"])}
    coeffs = _ndcg_coeffs()
    out_q, out_n, out_s = [], [], []
    for qid, g in ranked.groupby("query_id"):
        r = int(n_rel.get(qid, 0))
        if r == 0:
            continue
        g = g.sort_values("rank")
        dcg = sum(coeffs[i] for i, d in enumerate(g["doc_id"].astype(int))
                  if i < K and (int(qid), d) in rel_pairs)
        idcg = sum(coeffs[:min(r, K)])
        out_q.append(int(qid))
        out_n.append(r)
        out_s.append(dcg * 10_000 // idcg)
    return pa.table({"query_id": int64_col(out_q),
                     "n_rel": int64_col(out_n),
                     "ndcg_bp": int64_col(out_s)})


def search_eval_ndcg_sql() -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    n_terms_of = {}
    for qid, text in DOC_QUERIES:
        terms = sorted(set(analyzer.terms(text)))
        n_terms_of[qid] = len(terms)
        for t in terms:
            values.append(f"({qid}, '{t}')")
    values_sql = ",\n        ".join(values)
    nt_sql = ",".join(f"({q}, {n})" for q, n in n_terms_of.items())
    coeffs = _ndcg_coeffs()
    coeff_sql = ",".join(f"({i + 1}, {c})" for i, c in enumerate(coeffs))
    return f"""
WITH ex AS MATERIALIZED ({bm25_topk_sql()}),
toks2 AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf2 AS (SELECT DISTINCT doc_id, term FROM toks2 WHERE term <> ''),
queries(query_id, term) AS (VALUES
        {values_sql}),
nterms(query_id, n) AS (VALUES {nt_sql}),
coeff(rank, c) AS (VALUES {coeff_sql}),
rel AS (
  SELECT q.query_id, tf2.doc_id
  FROM queries q JOIN tf2 ON tf2.term = q.term
  GROUP BY q.query_id, tf2.doc_id
  HAVING count(DISTINCT q.term)
         = (SELECT n FROM nterms WHERE query_id = q.query_id)),
nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
         FROM rel GROUP BY query_id),
dcg AS (
  SELECT e.query_id, CAST(sum(co.c) AS BIGINT) AS dcg_u
  FROM ex e
  JOIN rel r ON r.query_id = e.query_id AND r.doc_id = e.doc_id
  JOIN coeff co ON co.rank = e.rank
  GROUP BY e.query_id),
idcg AS (
  SELECT n.query_id,
         CAST((SELECT sum(c) FROM coeff
               WHERE rank <= least(n.n_rel, {K})) AS BIGINT) AS idcg_u
  FROM nrel n)
SELECT n.query_id, n.n_rel,
       CAST(COALESCE(d.dcg_u, 0) * 10000 // i.idcg_u AS BIGINT) AS ndcg_bp
FROM nrel n
JOIN idcg i ON i.query_id = n.query_id
LEFT JOIN dcg d ON d.query_id = n.query_id
"""


def search_eval_map(sf_dir: str):
    """(query_id, n_rel, ap_u) — average precision @10 beside
    ``search_eval_ndcg``: ap_u = (Σ over relevant ranked docs of
    1e6·relcnt@k // k) // n_rel, truncating division in the same order
    on both sides. Same distributed AND-match relevance machinery."""
    import pandas as pd

    from searchengine_ray.pipelines.query import boolean_queries

    paths = ensure_doc_index(sf_dir)
    ranked = bm25_topk(sf_dir).to_pandas()
    matches = boolean_queries(paths, DOC_QUERIES, config=doc_index_config(),
                              concurrency=(1, 2)).to_pandas()
    n_rel = matches.groupby("query_id").size()
    rel_pairs = {(int(q), int(d)) for q, d in
                 zip(matches["query_id"], matches["doc_id"])}
    out_q, out_n, out_s = [], [], []
    for qid, g in ranked.groupby("query_id"):
        r = int(n_rel.get(qid, 0))
        if r == 0:
            continue
        g = g.sort_values("rank")
        relcnt, total = 0, 0
        for kk, d in enumerate(g["doc_id"].astype(int), start=1):
            if (int(qid), d) in rel_pairs:
                relcnt += 1
                total += 1_000_000 * relcnt // kk
        out_q.append(int(qid))
        out_n.append(r)
        out_s.append(total // r)
    return pa.table({"query_id": int64_col(out_q),
                     "n_rel": int64_col(out_n),
                     "ap_u": int64_col(out_s)})


def search_eval_map_sql() -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    n_terms_of = {}
    for qid, text in DOC_QUERIES:
        terms = sorted(set(analyzer.terms(text)))
        n_terms_of[qid] = len(terms)
        for t in terms:
            values.append(f"({qid}, '{t}')")
    values_sql = ",\n        ".join(values)
    nt_sql = ",".join(f"({q}, {n})" for q, n in n_terms_of.items())
    return f"""
WITH ex AS MATERIALIZED ({bm25_topk_sql()}),
toks2 AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf2 AS (SELECT DISTINCT doc_id, term FROM toks2 WHERE term <> ''),
queries(query_id, term) AS (VALUES
        {values_sql}),
nterms(query_id, n) AS (VALUES {nt_sql}),
rel AS (
  SELECT q.query_id, tf2.doc_id
  FROM queries q JOIN tf2 ON tf2.term = q.term
  GROUP BY q.query_id, tf2.doc_id
  HAVING count(DISTINCT q.term)
         = (SELECT n FROM nterms WHERE query_id = q.query_id)),
nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
         FROM rel GROUP BY query_id),
flags AS (
  SELECT e.query_id, e.rank,
         CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
  FROM ex e LEFT JOIN rel r
    ON r.query_id = e.query_id AND r.doc_id = e.doc_id),
prec AS (
  SELECT query_id, rank, is_rel,
         sum(is_rel) OVER (PARTITION BY query_id ORDER BY rank
                           ROWS UNBOUNDED PRECEDING) AS relcnt
  FROM flags),
ap AS (
  SELECT query_id,
         CAST(sum(CASE WHEN is_rel = 1
                       THEN 1000000 * relcnt // rank ELSE 0 END)
              AS BIGINT) AS total
  FROM prec GROUP BY query_id)
SELECT n.query_id, n.n_rel,
       CAST(COALESCE(a.total, 0) // n.n_rel AS BIGINT) AS ap_u
FROM nrel n LEFT JOIN ap a ON a.query_id = n.query_id
"""


# ---- score explanation (the Lucene-explain class) ----


class _ExplainDecode:
    """map_batches over the POSTINGS parquet: rows whose term is in the
    (broadcast, query-scale) term set decode their compressed doc/tf
    streams (the same `decode_blocks` kernel the query actors run) and
    emit (term, doc_id, tf) for the (broadcast, k-scale) result docs
    only, plus one (term, -1, df_slice) row per slice so global df
    reassembles by sum — never a full posting list leaves the stage."""

    def __init__(self, terms_ref, docs_ref):
        import ray

        self.terms = ray.get(terms_ref)              # set[str]
        self.docs = ray.get(docs_ref)                # sorted int64 array

    def __call__(self, batch: pa.Table) -> pa.Table:
        from searchengine_ray.codec import PostingBlocks, decode_blocks

        keep = [i for i, t in enumerate(batch.column("term").to_pylist())
                if t in self.terms]
        out_t: list[str] = []
        out_d: list[np.ndarray] = []
        out_tf: list[np.ndarray] = []
        for i in keep:
            term = batch.column("term")[i].as_py()
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
            hit = np.isin(ids, self.docs)
            out_t.extend([term] * (int(hit.sum()) + 1))
            out_d.append(np.r_[ids[hit], np.int64(-1)])
            out_tf.append(np.r_[tfs[hit].astype(np.int64),
                                np.int64(batch.column("df")[i].as_py())])
        if not out_t:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "doc_id": int64_col(np.concatenate(out_d)),
                         "tf": int64_col(np.concatenate(out_tf))})


def search_explain(sf_dir: str):
    """(query_id, doc_id, term, qtf, tf, df, score_bp) — per-TERM BM25
    contribution breakdown for every top-10 result of DOC_QUERIES: the
    Lucene-`explain` class (relevance debugging — why did this doc rank
    here, which term carried it). score_bp values sum per (query, doc)
    to the `bm25_topk` score by construction (same formula, same libm
    ln — cf. reference ranker at search_engine.py:62-71, which exposes
    only the summed score).

    Shape: the top-k pairs and the analyzed query terms are QUERY-scale
    and broadcast; one distributed pass over the postings parquet
    decodes ONLY matching terms' slices and keeps ONLY result docs
    (`_ExplainDecode`); one filtered doc_meta pass recovers their
    lengths. Driver state is bounded at k x |queries| pairs + |terms|
    rows end to end."""
    import math

    import pandas as pd
    import ray

    paths = ensure_doc_index(sf_dir)
    cfg = doc_index_config()
    top = bm25_topk(sf_dir).to_pandas()               # bounded: K x queries
    analyzer = Analyzer(cfg)
    qcounts = {qid: Counter(analyzer.terms(text)) for qid, text in DOC_QUERIES}
    terms = sorted({t for c in qcounts.values() for t in c})
    docs = np.unique(top["doc_id"].to_numpy(np.int64))
    terms_ref, docs_ref = ray.put(set(terms)), ray.put(docs)

    from pathlib import Path

    from searchengine_ray.stages.postings import part_id_of, term_hash64

    # J2 part pruning: open only the posting parts that can hold a
    # query term (term_hash64 % num_term_parts is direct addressing)
    ntp = paths.meta()["num_term_parts"]
    need_parts = {term_hash64(t) % ntp for t in terms}
    posting_files = []
    for p in sorted(Path(paths.postings).glob("part-*.parquet")):
        try:
            if part_id_of(p) in need_parts:
                posting_files.append(str(p))
        except ValueError:
            continue
    if not posting_files:
        # every needed part was an empty-manifest partition with no
        # parquet file: no postings → no explanations (read_parquet([])
        # would raise)
        decoded = pd.DataFrame(columns=["term", "doc_id", "tf"])
    else:
        decoded = ray.data.read_parquet(
            posting_files,
            columns=["term", "df", "counts", "last_docs", "max_tfs",
                     "doc_sizes", "tf_sizes", "doc_bytes", "tf_bytes"],
        ).map_batches(_ExplainDecode,
                      fn_constructor_args=(terms_ref, docs_ref),
                      batch_format="pyarrow",
                      concurrency=(1, 2)).to_pandas()

    def _pick_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        m = np.isin(ids, docs)
        return pa.table({"doc_id": int64_col(ids[m].astype(np.int64)),
                         "dl": int64_col(
                             batch.column("doc_len").to_numpy(
                                 zero_copy_only=False)[m].astype(np.int64))})

    meta_files = [str(p) for p in sorted(Path(paths.doc_meta).glob("*.parquet"))]
    dl_rows = ray.data.read_parquet(
        meta_files, columns=["doc_id", "doc_len"]).map_batches(
        _pick_docs, batch_format="pyarrow").take_all()     # bounded: k x queries
    dl = {int(r["doc_id"]): int(r["dl"]) for r in dl_rows}

    df = decoded[decoded["doc_id"] < 0].groupby("term")["tf"].sum().to_dict()
    tf_of = {(t, int(d)): int(v) for t, d, v in
             decoded[decoded["doc_id"] >= 0][["term", "doc_id", "tf"]]
             .itertuples(index=False)}
    meta = paths.meta()
    n_docs, avgdl = meta["N"], meta["total_len"] / meta["N"]
    k1, b = cfg.k1, cfg.b

    rows = []
    for qid, doc in top[["query_id", "doc_id"]].itertuples(index=False):
        for term, qtf in sorted(qcounts[int(qid)].items()):
            tf = tf_of.get((term, int(doc)))
            if tf is None:
                continue
            idf = math.log((n_docs - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            s = (qtf * idf * tf * (k1 + 1.0)
                 / (tf + k1 * (1.0 - b + b * dl[int(doc)] / avgdl)))
            rows.append((int(qid), int(doc), term, int(qtf), tf,
                         int(df[term]), int(math.floor(s * 10000 + 0.5))))
    arr = list(zip(*rows)) if rows else [[]] * 7
    return pa.table({"query_id": int64_col(np.array(arr[0], np.int64)),
                     "doc_id": int64_col(np.array(arr[1], np.int64)),
                     "term": pa.array(list(arr[2]), pa.string()),
                     "qtf": int64_col(np.array(arr[3], np.int64)),
                     "tf": int64_col(np.array(arr[4], np.int64)),
                     "df": int64_col(np.array(arr[5], np.int64)),
                     "score_bp": int64_col(np.array(arr[6], np.int64))})


def search_explain_sql(k1: float = 1.2, b: float = 0.75) -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in DOC_QUERIES:
        for term, qtf in sorted(Counter(analyzer.terms(text)).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    values_sql = ",\n        ".join(values)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
queries(query_id, qterm, qtf) AS (VALUES
        {values_sql}),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.qtf * ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM queries q
  JOIN df ON df.term = q.qterm
  JOIN tf ON tf.term = q.qterm
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id),
top AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scores QUALIFY rnk <= {K})
SELECT t.query_id, t.doc_id, q.qterm AS term,
       CAST(q.qtf AS BIGINT) AS qtf, tf.tf, df.df,
       CAST(floor(q.qtf * ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                  * tf.tf * ({k1} + 1.0)
                  / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))
                  * 10000 + 0.5) AS BIGINT) AS score_bp
FROM top t
JOIN queries q ON q.query_id = t.query_id
JOIN tf ON tf.doc_id = t.doc_id AND tf.term = q.qterm
JOIN df ON df.term = q.qterm
JOIN dl ON dl.doc_id = t.doc_id
CROSS JOIN stats s
"""


# ---- full index export (every posting, bit-checked) ----


class _PostingsExport:
    """map_batches over the POSTINGS parquet: decode every slice's
    compressed doc/tf streams back to (term, doc_id, tf) rows. Each
    output block is bounded by the input slice sizes; nothing joins,
    nothing shuffles — the export IS the pipeline."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from searchengine_ray.codec import PostingBlocks, decode_blocks

        out_t, out_d, out_tf = [], [], []
        for i in range(batch.num_rows):
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
            out_t.extend([batch.column("term")[i].as_py()] * len(ids))
            out_d.append(ids)
            out_tf.append(tfs.astype(np.int64))
        if not out_t:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "doc_id": int64_col(np.concatenate(out_d)),
                         "tf": int64_col(np.concatenate(out_tf))})


def index_postings_export(sf_dir: str):
    """(term, doc_id, tf) — the ENTIRE compressed index decoded back to
    rows: the index-as-a-table scan (Lucene's index reader / CheckIndex
    view). The oracle recomputes tokenization from the raw corpus, so a
    hash match proves EVERY posting survived analyze -> shuffle ->
    delta+VByte encode -> merge -> persist -> decode bit-for-bit —
    the strongest whole-index correctness statement the registry can
    make (`index_dictionary` checks per-term df sums; `index_fsck`
    checks structural invariants; this checks every cell).

    Shape: embarrassingly parallel map over posting slices — decode is
    the same kernel the query actors run; no join, no shuffle. Output
    is postings-scale by definition (an EXPORT streams to a sink at
    100 TB; the driver gate hashes it at sf scale)."""
    import ray
    from pathlib import Path

    paths = ensure_doc_index(sf_dir)
    files = [str(p) for p in sorted(Path(paths.postings).glob("*.parquet"))]
    return ray.data.read_parquet(
        files, columns=["term", "counts", "last_docs", "max_tfs",
                        "doc_sizes", "tf_sizes", "doc_bytes", "tf_bytes"],
    ).map_batches(_PostingsExport, batch_format="pyarrow",
                  concurrency=(1, 4))


def index_postings_export_sql() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents)
SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
FROM toks WHERE term <> '' GROUP BY term, doc_id
"""


# ---- suffix (reverse-wildcard) queries ----

SUFFIX_QUERIES: list[tuple[int, str]] = [
    (1, "er"),      # customer, filter, order
    (2, "w"),       # row, slow, window
    (3, "rt"),      # part, sort
    (4, "zzz"),     # no match: empty
    (5, "e"),       # 5 matches at gate scale — exercises the cap
    (6, "a"),       # data, a
]


def suffix_search(sf_dir: str, _stats: dict | None = None):
    """(query_id, doc_id, n_terms) — suffix (`*term`) wildcard
    retrieval: the reverse-wildcard query class, served from the
    REVERSED-term-sorted dictionary projection (Lucene's reversed-term
    field, `ensure_sorted_dictionary(reverse=True)`): each suffix
    becomes a reversed-prefix key range, row-group statistics prune
    the dictionary read to the matched bucket, and the distributed
    endswith scan remains only as the fallback for read-only index
    roots. Expansion is capped + deterministically ordered (df desc,
    term asc) exactly like prefixes, then OR retrieval through the
    same executors."""
    from searchengine_ray.pipelines.query import terms_union_queries

    paths = ensure_doc_index(sf_dir)
    expanded = _expand_prefixes(paths, SUFFIX_QUERIES,
                                PREFIX_MAX_EXPANSIONS, mode="suffix",
                                _stats=_stats)
    return terms_union_queries(paths, expanded, config=doc_index_config(),
                               concurrency=(1, 2))


def suffix_search_sql() -> str:
    values = ",\n        ".join(f"({qid}, '{s}')" for qid, s in SUFFIX_QUERIES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
suffixes(query_id, sfx) AS (VALUES
        {values}),
expanded AS (
  SELECT s.query_id, d.term,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY d.df DESC, d.term ASC) AS rnk
  FROM suffixes s JOIN dict d ON suffix(d.term, s.sfx)),
surviving AS (SELECT query_id, term FROM expanded
              WHERE rnk <= {PREFIX_MAX_EXPANSIONS})
SELECT CAST(e.query_id AS BIGINT) AS query_id, tf.doc_id,
       CAST(count(DISTINCT tf.term) AS BIGINT) AS n_terms
FROM surviving e JOIN tf ON tf.term = e.term
GROUP BY e.query_id, tf.doc_id
"""


# ---- regex term queries (the general wildcard) ----

REGEX_TERM_QUERIES: list[tuple[int, str]] = [
    (1, "^.a"),            # 'a' in second position — exercises the cap
    (2, "^(join|key)$"),   # exact alternation
    (3, "^s.*t$"),         # s...t
    (4, "^zzz"),           # no match: empty
    (5, "^[ab]"),          # character class
    (6, "er$"),            # suffix-equivalent (cross-family check)
]


def term_regex_search(sf_dir: str):
    """(query_id, doc_id, n_terms) — regex term queries (Lucene's
    RegexpQuery, ES `regexp`): the GENERAL wildcard — each pattern
    expands against the distributed dictionary scan (one pass over the
    vocabulary-scale columns for ALL patterns, the prefix/suffix
    machinery with a compiled-re kernel), capped + deterministically
    ordered, then OR retrieval. Patterns are restricted to the
    RE2-compatible subset (no lookaround/backrefs) so python `re` and
    DuckDB `regexp_matches` agree; both sides use SEARCH (unanchored)
    semantics — anchor with ^$ in the pattern."""
    from searchengine_ray.pipelines.query import terms_union_queries

    paths = ensure_doc_index(sf_dir)
    expanded = _expand_prefixes(paths, REGEX_TERM_QUERIES,
                                PREFIX_MAX_EXPANSIONS, mode="regex")
    return terms_union_queries(paths, expanded, config=doc_index_config(),
                               concurrency=(1, 2))


def term_regex_search_sql() -> str:
    values = ",\n        ".join(f"({qid}, '{p}')"
                                for qid, p in REGEX_TERM_QUERIES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
pats(query_id, pat) AS (VALUES
        {values}),
expanded AS (
  SELECT p.query_id, d.term,
         row_number() OVER (PARTITION BY p.query_id
                            ORDER BY d.df DESC, d.term ASC) AS rnk
  FROM pats p JOIN dict d ON regexp_matches(d.term, p.pat)),
surviving AS (SELECT query_id, term FROM expanded
              WHERE rnk <= {PREFIX_MAX_EXPANSIONS})
SELECT CAST(e.query_id AS BIGINT) AS query_id, tf.doc_id,
       CAST(count(DISTINCT tf.term) AS BIGINT) AS n_terms
FROM surviving e JOIN tf ON tf.term = e.term
GROUP BY e.query_id, tf.doc_id
"""


# ---- phrase-prefix queries (match_phrase_prefix) ----

PHRASE_PREFIX_QUERIES: list[tuple[int, str]] = [
    (1, "hash jo"),        # -> hash join
    (2, "slow query s"),   # 3-term body, expanded tail
    (3, "batch ba"),       # periodic phrase through expansion
    (4, "merge zz"),       # tail expands to nothing: empty
    (5, "data s"),         # many s-terms — exercises the expansion cap
    (6, "the t"),          # stop-word-scale lead term
]


def phrase_prefix_search(sf_dir: str):
    """(query_id, doc_id, n_matches) — phrase-PREFIX match (the
    as-you-type phrase query: Elasticsearch `match_phrase_prefix`,
    Lucene MultiPhraseQuery over an expanded last position): the last
    token is a prefix whose top-``PREFIX_MAX_EXPANSIONS`` dictionary
    expansions (df desc, term asc) each complete the phrase; a doc's
    n_matches counts exact positional occurrences across ALL surviving
    completions.

    Shape: ONE distributed dictionary scan expands every query's tail
    (the `prefix_search` machinery against the positional index's
    dictionary), then the expanded phrase set — at most queries x cap
    phrases — runs through the SAME phrase actor pool, and a bounded
    (query, doc) groupby folds completions back together. The oracle
    replays expansion (QUALIFY over the SQL dictionary) and the
    positional self-join per completion."""
    import pandas as pd

    from searchengine_ray.pipelines.query import phrase_queries

    paths = ensure_phrase_index(sf_dir)
    tails = [(qid, text.rsplit(" ", 1)[1])
             for qid, text in PHRASE_PREFIX_QUERIES]
    expanded = dict(_expand_prefixes(paths, tails, PREFIX_MAX_EXPANSIONS))
    phrases = []
    for qid, text in PHRASE_PREFIX_QUERIES:
        body = text.rsplit(" ", 1)[0]
        for j, term in enumerate(sorted(expanded.get(qid, "").split())):
            if term:
                phrases.append((qid * 1000 + j, f"{body} {term}"))
    if not phrases:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "n_matches": pa.array([], pa.int64())})
    res = phrase_queries(paths, phrases, config=phrase_index_config(),
                         concurrency=(1, 2))

    def fold(batch: pa.Table) -> pa.Table:
        q = batch.column("query_id").to_numpy(zero_copy_only=False)
        return batch.set_column(0, "query_id", int64_col(q // 1000))

    def regroup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["query_id", "doc_id"], as_index=False)["n_matches"] \
            .sum()
        return out

    return res.map_batches(fold, batch_format="pyarrow") \
        .groupby("query_id").map_groups(regroup, batch_format="pandas")


def phrase_prefix_search_sql() -> str:
    analyzer = Analyzer(phrase_index_config())
    selects = []
    for qid, text in PHRASE_PREFIX_QUERIES:
        body, tail = text.rsplit(" ", 1)
        toks = analyzer.raw_tokens(body)
        joins = []
        for i, t in enumerate(toks[1:], start=1):
            joins.append(f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id "
                         f"AND t{i}.pos = t0.pos + {i} AND t{i}.term = '{t}'")
        n = len(toks)
        joins.append(
            f"JOIN toks t{n} ON t{n}.doc_id = t0.doc_id "
            f"AND t{n}.pos = t0.pos + {n} AND t{n}.term IN "
            f"(SELECT term FROM surviving WHERE query_id = {qid})")
        selects.append(f"""
SELECT CAST({qid} AS BIGINT) AS query_id, t0.doc_id,
       CAST(count(*) AS BIGINT) AS n_matches
FROM toks t0 {' '.join(joins)}
WHERE t0.term = '{toks[0]}' GROUP BY t0.doc_id""")
    union = "\nUNION ALL\n".join(selects)
    values = ",\n        ".join(
        f"({qid}, '{text.rsplit(' ', 1)[1]}')"
        for qid, text in PHRASE_PREFIX_QUERIES)
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term,
         generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), 1) AS raw_pos
  FROM documents),
toks AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1 AS pos
  FROM raw WHERE term <> ''),
dict AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         FROM toks GROUP BY term),
prefixes(query_id, prefix) AS (VALUES
        {values}),
surviving AS (
  SELECT p.query_id, d.term FROM prefixes p
  JOIN dict d ON d.term LIKE p.prefix || '%'
  QUALIFY row_number() OVER (PARTITION BY p.query_id
                             ORDER BY d.df DESC, d.term ASC)
          <= {PREFIX_MAX_EXPANSIONS})
{union}
"""


# ---- LM Dirichlet ranking (second relevance model) ----

def lm_dirichlet_topk(sf_dir: str):
    """(query_id, rank, doc_id, score_bp) — LM Dirichlet
    query-likelihood top-10 for DOC_QUERIES over the SAME index image
    that serves BM25: the second relevance model (Zhai & Lafferty 2001;
    Lucene ships LMDirichletSimilarity beside BM25Similarity over one
    index — the reference hardcodes its one ranker,
    ``/root/reference/ranker.py:14-48``). Per matched term the score is
    ``qtf * (ln(1 + tf / (mu*ctf/total_len)) + ln(mu / (dl + mu)))``;
    ctf comes free from the term-partitioned decode (all postings of a
    term live in one part), total_len from the index meta — no new
    statistic is indexed. Scale shape identical to ``bm25_topk``: the
    actor-pool executors decode only matched terms."""
    from searchengine_ray.pipelines.query import search_queries

    paths = ensure_doc_index(sf_dir)
    res = search_queries(paths, DOC_QUERIES, k=K, config=doc_index_config(),
                         method="dirichlet", concurrency=(1, 2)).to_pandas()
    res["score_bp"] = np.floor(res["score"].to_numpy() * 10000 + 0.5).astype(np.int64)
    res["rank"] = res["rank"].astype(np.int64)
    out = res[["query_id", "rank", "doc_id", "score_bp"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def lm_dirichlet_sql(mu: float = 2000.0) -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in DOC_QUERIES:
        for term, qtf in sorted(Counter(analyzer.terms(text)).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    values_sql = ",\n        ".join(values)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(sum(dl) AS DOUBLE) AS total_len FROM dl),
ctf AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS ctf FROM tf GROUP BY term),
queries(query_id, qterm, qtf) AS (VALUES
        {values_sql}),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.qtf * (ln(1.0 + tf.tf / ({mu} * ctf.ctf / s.total_len))
                      + ln({mu} / (dl.dl + {mu})))) AS score
  FROM queries q
  JOIN ctf ON ctf.term = q.qterm
  JOIN tf ON tf.term = q.qterm
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scores)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rnk <= {K}
"""


# ---- tf-idf cosine ranking (the reference's own model) ----

def tfidf_cosine_topk(sf_dir: str):
    """(query_id, rank, doc_id, score_bp) — classic tf-idf COSINE top-10
    for DOC_QUERIES over the same index image that serves BM25: the
    reference's OWN ranking model (``/root/reference/ranker.py:14-48``
    scores ``dot(d, q) / (|d| * |q|)`` over the doc's tf-idf vector
    restricted to the matched query terms, ``searcher.py:143-159``;
    the north rule replaces it with BM25, and this row keeps the
    original model available beside BM25/Dirichlet as Lucene keeps
    ClassicSimilarity beside BM25Similarity). Per-doc-scalar
    normalizations in the reference (``tf/max_tf`` doc-side,
    ``qtf/max_qtf`` query-side) cancel inside the cosine, so the score
    is ``sum(w*qtf) / (sqrt(sum(w^2)) * |q|)`` with
    ``w = log10(N/df) * tf`` — two scatter-adds over matched postings,
    the exact scale shape of ``bm25_topk``."""
    from searchengine_ray.pipelines.query import search_queries

    paths = ensure_doc_index(sf_dir)
    res = search_queries(paths, DOC_QUERIES, k=K, config=doc_index_config(),
                         method="cosine", concurrency=(1, 2)).to_pandas()
    # the cosine method already returns basis-point-quantized scores
    # (ranking must happen on the quantized value: proportional-tf docs
    # are exact math ties whose raw floats differ only by association
    # order — see _search_cosine)
    res["score_bp"] = res["score"].to_numpy().astype(np.int64)
    res["rank"] = res["rank"].astype(np.int64)
    out = res[["query_id", "rank", "doc_id", "score_bp"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def tfidf_cosine_sql() -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in DOC_QUERIES:
        for term, qtf in sorted(Counter(analyzer.terms(text)).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    values_sql = ",\n        ".join(values)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
queries(query_id, qterm, qtf) AS (VALUES
        {values_sql}),
matched AS (
  SELECT q.query_id, q.qterm, q.qtf, df.df
  FROM queries q JOIN df ON df.term = q.qterm),
qnorm AS (SELECT query_id, sqrt(sum(CAST(qtf AS DOUBLE) * qtf)) AS qn
          FROM matched GROUP BY query_id),
scores AS (
  SELECT m.query_id, tf.doc_id,
         sum(log10(s.n / m.df) * tf.tf * m.qtf)
         / (sqrt(sum(pow(log10(s.n / m.df) * tf.tf, 2))) * qn.qn) AS score
  FROM matched m
  JOIN tf ON tf.term = m.qterm
  JOIN qnorm qn ON qn.query_id = m.query_id
  CROSS JOIN stats s
  GROUP BY m.query_id, tf.doc_id, qn.qn),
-- rank on the basis-point-quantized score: proportional-tf docs are
-- exact mathematical cosine ties whose raw floats differ only by
-- summation order between engines (see _search_cosine)
bp AS (SELECT query_id, doc_id,
              CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
       FROM scores),
ranked AS (
  SELECT query_id, doc_id, score_bp,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_bp DESC, doc_id ASC) AS rnk
  FROM bp)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, score_bp
FROM ranked WHERE rnk <= {K}
"""


# ---- window rescoring (two-phase ranking over one index) ----

# ONE source of truth for the window: the engine's phase-1 cut
# (query.py IndexSearcher.RESCORE_WINDOW) and the oracle's
# ``rnk <= window`` cut must agree or rescore_search silently diverges
# from its SQL replay.
from searchengine_ray.pipelines.query import IndexSearcher as _IS  # noqa: E402

RESCORE_WINDOW = _IS.RESCORE_WINDOW


def rescore_search(sf_dir: str):
    """(query_id, rank, doc_id, combined_bp) — two-phase ranking: BM25
    retrieves the top-``RESCORE_WINDOW`` candidates, then ONLY that
    window is rescored by the tf-idf cosine model (the reference's own
    ranker) and re-ranked on ``bm25_bp + cosine_bp`` — the
    Elasticsearch ``rescore`` block with query_weight =
    rescore_query_weight = 1 and combine = total. The serving shape for
    expensive rerankers: phase 2 cost is CONSTANT per query (window
    docs only) no matter the corpus size, and both models read the same
    index image inside the same actor pool (see
    ``query.py::_search_rescore``). The oracle replays the exact same
    two phases: the float-exact BM25 window cut, then the integer-bp
    combine."""
    from searchengine_ray.pipelines.query import search_queries

    paths = ensure_doc_index(sf_dir)
    res = search_queries(paths, DOC_QUERIES, k=K, config=doc_index_config(),
                         method="rescore", concurrency=(1, 2)).to_pandas()
    # combined scores are already integer-valued bp floats
    res["combined_bp"] = res["score"].to_numpy().astype(np.int64)
    res["rank"] = res["rank"].astype(np.int64)
    out = res[["query_id", "rank", "doc_id", "combined_bp"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def rescore_search_sql(k1: float = 1.2, b: float = 0.75) -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in DOC_QUERIES:
        for term, qtf in sorted(Counter(analyzer.terms(text)).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    values_sql = ",\n        ".join(values)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
queries(query_id, qterm, qtf) AS (VALUES
        {values_sql}),
bm AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.qtf * ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM queries q
  JOIN df ON df.term = q.qterm
  JOIN tf ON tf.term = q.qterm
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id),
-- phase 1: the float-exact BM25 window cut (same order contract as
-- bm25_topk: score desc, doc_id asc)
win AS (
  SELECT query_id, doc_id,
         CAST(floor(score * 10000 + 0.5) AS BIGINT) AS bm_bp
  FROM (SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id ASC) AS rnk
        FROM bm)
  WHERE rnk <= {RESCORE_WINDOW}),
-- phase 2: tf-idf cosine over ONLY the window docs' matched terms
matched AS (
  SELECT q.query_id, q.qterm, q.qtf, df.df
  FROM queries q JOIN df ON df.term = q.qterm),
qnorm AS (SELECT query_id, sqrt(sum(CAST(qtf AS DOUBLE) * qtf)) AS qn
          FROM matched GROUP BY query_id),
cosw AS (
  SELECT m.query_id, w.doc_id,
         CAST(floor(sum(log10(s.n / m.df) * tf.tf * m.qtf)
                    / (sqrt(sum(pow(log10(s.n / m.df) * tf.tf, 2))) * qn.qn)
                    * 10000 + 0.5) AS BIGINT) AS cos_bp
  FROM win w
  JOIN matched m ON m.query_id = w.query_id
  JOIN tf ON tf.doc_id = w.doc_id AND tf.term = m.qterm
  JOIN qnorm qn ON qn.query_id = m.query_id
  CROSS JOIN stats s
  GROUP BY m.query_id, w.doc_id, qn.qn),
combined AS (
  SELECT w.query_id, w.doc_id,
         w.bm_bp + COALESCE(c.cos_bp, 0) AS combined_bp
  FROM win w
  LEFT JOIN cosw c ON c.query_id = w.query_id AND c.doc_id = w.doc_id),
ranked AS (
  SELECT query_id, doc_id, combined_bp,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY combined_bp DESC, doc_id ASC) AS rnk
  FROM combined)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(combined_bp AS BIGINT) AS combined_bp
FROM ranked WHERE rnk <= {K}
"""


# ---- spell-corrected search (the reference's spellchecker path) ----

# typos with a unique edit-distance-1 dictionary correction, a known
# query (no-op), an uncorrectable term (dropped), and a merge case
# where the corrected term collides with a term already in the query
SPELL_QUERIES: list[tuple[int, str]] = [
    (1, "hashh join"),        # insert:   hashh -> hash
    (2, "windwo agg"),        # transpose: windwo -> window
    (3, "valeu row"),         # transpose: valeu -> value
    (4, "tabel"),             # transpose: tabel -> table
    (5, "qzwxqz data"),       # no distance-1 candidate: term dropped
    (6, "join table"),        # all known: spell path is a no-op
    (7, "hash hashh"),        # correction merges into existing qtf
]


def spell_search(sf_dir: str):
    """(query_id, rank, doc_id, score_bp) — BM25 top-10 with the
    engine's spell-correction enabled: unknown query terms fall back to
    their best Damerau-distance-1 dictionary match (max df, ties
    lexicographic) — the reference's spellchecker integration
    (``/root/reference/searcher.py:32,76-119``) as a query-parse step
    inside the actor-pool executors. The oracle replays the CORRECTION
    itself (DuckDB ``damerau_levenshtein`` over the dictionary), not
    just the corrected search, so the candidate-choice policy is what
    the hash verifies."""
    from searchengine_ray.pipelines.query import search_queries

    paths = ensure_doc_index(sf_dir)
    res = search_queries(paths, SPELL_QUERIES, k=K, config=doc_index_config(),
                         concurrency=(1, 2), spell_correct=True).to_pandas()
    res["score_bp"] = np.floor(res["score"].to_numpy() * 10000 + 0.5).astype(np.int64)
    res["rank"] = res["rank"].astype(np.int64)
    out = res[["query_id", "rank", "doc_id", "score_bp"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def spell_search_sql(k1: float = 1.2, b: float = 0.75) -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in SPELL_QUERIES:
        for term, qtf in sorted(Counter(analyzer.terms(text)).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    values_sql = ",\n        ".join(values)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
raw_queries(query_id, rterm, qtf) AS (VALUES
        {values_sql}),
-- the spell step: known terms stay; unknown terms take the best
-- Damerau-distance-1 dictionary candidate (max df, ties lexicographic)
-- or drop; corrections then MERGE with any existing identical term
corrected AS (
  SELECT rq.query_id,
         CASE WHEN EXISTS (SELECT 1 FROM df WHERE df.term = rq.rterm)
              THEN rq.rterm
              ELSE (SELECT c.term FROM df c
                    WHERE damerau_levenshtein(c.term, rq.rterm) <= 1
                    ORDER BY c.df DESC, c.term ASC LIMIT 1)
         END AS qterm,
         rq.qtf
  FROM raw_queries rq),
queries AS (
  SELECT query_id, qterm, CAST(sum(qtf) AS BIGINT) AS qtf
  FROM corrected WHERE qterm IS NOT NULL GROUP BY query_id, qterm),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.qtf * ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM queries q
  JOIN df ON df.term = q.qterm
  JOIN tf ON tf.term = q.qterm
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scores)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rnk <= {K}
"""


# ---- BM25F: field-aware ranking over two field indexes ----

# BM25F weights/normalization (Robertson, Zaragoza & Taylor, CIKM 2004
# "Simple BM25 extension to multiple weighted fields"): per-field
# length-normalized tf is WEIGHT-COMBINED BEFORE the k1 saturation —
# what distinguishes BM25F from naively summing per-field BM25 scores.
BM25F_W_TEXT = 1.0
BM25F_W_SOURCE = 2.5       # short field boosted, like ES boosting "title"
BM25F_B_TEXT = 0.75
BM25F_B_SOURCE = 0.75
BM25F_K1 = 1.2

# mixes source-field tokens (src0..src19) with text-vocabulary terms:
# field routing, pure-text, pure-source and absent-term cases
BM25F_QUERIES: list[tuple[int, str]] = [
    (1, "src3 hash join"),
    (2, "src17 window agg"),
    (3, "value row"),                 # text-only terms
    (4, "src5 src9"),                 # source-only terms
    (5, "data src0 table"),
    (6, "zzznosuchterm src1"),
    (7, "merge sort src12 part"),
]


def ensure_source_index(sf_dir: str) -> IndexPaths:
    """Second field index: same doc_ids, content = the ``source``
    column (one short token per doc — the 'title-ish' field)."""
    ds = read(sf_dir, "documents", ["doc_id", "source"])

    def remap(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "repo": batch.column("source"),
            "path": pa.array([f"doc_{i}.txt" for i in ids.tolist()], pa.string()),
            "commit": pa.array([""] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "content": batch.column("source"),
        })

    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    root = f"/tmp/graft_src_index/{tag}"
    return build_index(ds.map_batches(remap, batch_format="pyarrow"), root,
                       doc_index_config(), id_column="doc_id", resume=True,
                       source_tag=sf_dir + "#source")


class _BM25FStage:
    """Actor-pool stage scoring BM25F from TWO per-field indexes.

    Per query term both fields' postings are decoded once (term-
    partitioned indexes: one decode per field yields the complete
    lists), idf comes from the UNION df (a term counts as 'in the
    document' if it is in any field), and the per-field normalized tfs
    ``tf_f / (1 - b_f + b_f * dl_f/avgdl_f)`` are weight-summed before
    one shared k1 saturation. Scores are bp-quantized before the top-k
    cut (same determinism argument as ``_search_cosine``)."""

    def __init__(self, text_root: str, source_root: str,
                 config: IndexConfig, k: int = K):
        from searchengine_ray.pipelines.query import IndexSearcher

        self.text = IndexSearcher(text_root, config)
        self.src = IndexSearcher(source_root, config)
        self.analyzer = Analyzer(config)
        self.k = k

    def _field_postings(self, searcher, term: str):
        """(doc_ids, normalized tf) for one field, or None."""
        slices = searcher.postings_for(term)
        if not slices:
            return None
        from searchengine_ray.codec import concat_blocks, decode_blocks

        docs, tfs = decode_blocks(concat_blocks(slices))
        b = BM25F_B_TEXT if searcher is self.text else BM25F_B_SOURCE
        dl = searcher.doc_lens(docs).astype(np.float64)
        norm = 1.0 - b + b * dl / searcher.avgdl
        return docs, tfs.astype(np.float64) / norm

    def _score_query(self, text: str) -> list[tuple[int, float]]:
        qt = Counter(self.analyzer.terms(text))
        terms = []                     # ascending term order: canonical
        for term in sorted(qt):
            pt = self._field_postings(self.text, term)
            ps = self._field_postings(self.src, term)
            if pt is None and ps is None:
                continue
            docs_t = pt[0] if pt is not None else np.empty(0, np.int64)
            docs_s = ps[0] if ps is not None else np.empty(0, np.int64)
            union = np.union1d(docs_t, docs_s)
            terms.append((term, qt[term], pt, ps, union))
        if not terms:
            return []
        cand = np.union1d(
            np.concatenate([u for *_, u in terms]), np.empty(0, np.int64))
        N = float(self.text.N)
        scores = np.zeros(len(cand), dtype=np.float64)
        for _term, qtf, pt, ps, union in terms:
            tfn = np.zeros(len(cand), dtype=np.float64)
            if pt is not None:
                idx = np.searchsorted(cand, pt[0])
                tfn[idx] += BM25F_W_TEXT * pt[1]
            if ps is not None:
                idx = np.searchsorted(cand, ps[0])
                tfn[idx] += BM25F_W_SOURCE * ps[1]
            df = float(len(union))
            idf = np.log((N - df + 0.5) / (df + 0.5) + 1.0)
            scores += qtf * idf * tfn * (BM25F_K1 + 1.0) / (BM25F_K1 + tfn)
        bp = np.floor(scores * 10000.0 + 0.5)
        order = np.lexsort((cand, -bp))[:self.k]
        return [(int(cand[i]), float(bp[i])) for i in order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, bps = [], [], [], []
        for qid, text in zip(batch.column("query_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for rank, (doc, bp) in enumerate(self._score_query(text), start=1):
                qids.append(qid); ranks.append(rank)
                docs.append(doc); bps.append(int(bp))
        return pa.table({
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score_bp": pa.array(bps, pa.int64()),
        })


def bm25f_topk(sf_dir: str):
    """(query_id, rank, doc_id, score_bp) — BM25F top-10 for
    BM25F_QUERIES over TWO per-field indexes (text + source), the
    field-aware ranking class (Robertson et al. 2004; Lucene's
    multi-field scoring): per-field length-normalized tfs are
    weight-combined BEFORE saturation, idf uses the union df. The
    reference is single-field (tweet text only) — this is the
    capability a (repo, path, content) code corpus needs, where a path
    hit should outweigh a body hit. Scale shape: each actor opens both
    field indexes once; per term ONE decode per field (term-partitioned
    indexes), everything vectorized over the candidate union."""
    import ray.data

    text_paths = ensure_doc_index(sf_dir)
    src_paths = ensure_source_index(sf_dir)
    queries = ray.data.from_items(
        [{"query_id": int(q), "text": t} for q, t in BM25F_QUERIES])
    res = queries.map_batches(
        _BM25FStage, fn_constructor_args=(text_paths.root, src_paths.root,
                                          doc_index_config(), K),
        batch_format="pyarrow", concurrency=(1, 2), batch_size=64,
    ).to_pandas()
    res = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(res, preserve_index=False)


def bm25f_sql() -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in BM25F_QUERIES:
        for term, qtf in sorted(Counter(analyzer.terms(text)).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    values_sql = ",\n        ".join(values)
    k1 = BM25F_K1
    return f"""
WITH tokt AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(source), '[^a-z0-9_]+')) AS term
  FROM documents),
tft AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM tokt WHERE term <> '' GROUP BY doc_id, term),
tfs AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term),
dlt AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tft GROUP BY doc_id),
dls AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tfs GROUP BY doc_id),
statt AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 sum(dl) / count(*) AS avgdl FROM dlt),
stats AS (SELECT sum(dl) / count(*) AS avgdl FROM dls),
dfu AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
          SELECT doc_id, term FROM tft
          UNION SELECT doc_id, term FROM tfs) GROUP BY term),
queries(query_id, qterm, qtf) AS (VALUES
        {values_sql}),
fields AS (
  SELECT coalesce(t.term, s.term) AS term,
         coalesce(t.doc_id, s.doc_id) AS doc_id,
         coalesce({BM25F_W_TEXT} * t.tf
                  / (1.0 - {BM25F_B_TEXT} + {BM25F_B_TEXT} * dlt.dl / st.avgdl), 0.0)
         + coalesce({BM25F_W_SOURCE} * s.tf
                  / (1.0 - {BM25F_B_SOURCE} + {BM25F_B_SOURCE} * dls.dl / ss.avgdl), 0.0)
           AS tfn
  FROM tft t
  FULL JOIN tfs s ON s.term = t.term AND s.doc_id = t.doc_id
  LEFT JOIN dlt ON dlt.doc_id = t.doc_id
  LEFT JOIN dls ON dls.doc_id = s.doc_id
  CROSS JOIN statt st CROSS JOIN stats ss),
scores AS (
  SELECT q.query_id, f.doc_id,
         sum(q.qtf * ln((st.n - dfu.df + 0.5) / (dfu.df + 0.5) + 1.0)
             * f.tfn * ({k1} + 1.0) / ({k1} + f.tfn)) AS score
  FROM queries q
  JOIN fields f ON f.term = q.qterm
  JOIN dfu ON dfu.term = q.qterm
  CROSS JOIN statt st
  GROUP BY q.query_id, f.doc_id),
bp AS (SELECT query_id, doc_id,
              CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
       FROM scores),
ranked AS (
  SELECT query_id, doc_id, score_bp,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_bp DESC, doc_id ASC) AS rnk
  FROM bp)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, score_bp
FROM ranked WHERE rnk <= {K}
"""


# ---- query-time synonym expansion ----

# Synonym table — CONFIG, exactly as Lucene's SynonymGraphFilter reads
# synonyms.txt: the groups are an input to the engine, not derived from
# the corpus. Directed (term -> added synonyms); absent-in-vocabulary
# expansions ("large", "quick") are deliberate edge cases — they must
# be dropped by df=0 filtering on both sides.
SYNONYMS: dict[str, list[str]] = {
    "sort": ["order"],
    "order": ["sort"],
    "row": ["line"],
    "agg": ["group"],
    "big": ["large"],      # "large" not in vocab: expansion no-op
    "fast": ["quick"],     # "quick" not in vocab: expansion no-op
}

SYN_QUERIES: list[tuple[int, str]] = [
    (1, "fast scan"),      # expansion adds only an absent term
    (2, "sort table"),     # sort -> +order
    (3, "big data"),       # big -> +large (absent)
    (4, "row filter"),     # row -> +line
    (5, "agg window"),     # agg -> +group
    (6, "order sort"),     # both directions fire: qtf 2 for each
]


def _expand_synonyms(text: str, analyzer: Analyzer) -> "Counter":
    """Expanded query-term multiset: each analyzed occurrence also
    contributes one copy of each of its configured synonyms (Lucene
    expand=true semantics — synonyms score as independent terms with
    their own df/tf statistics)."""
    toks = analyzer.terms(text)
    expanded = list(toks)
    for t in toks:
        expanded.extend(SYNONYMS.get(t, []))
    return Counter(expanded)


def synonym_search(sf_dir: str):
    """(query_id, rank, doc_id, score_bp) — BM25 top-10 under
    query-time synonym expansion (Lucene SynonymGraphFilter with
    expand=true: each occurrence also emits its synonyms, which then
    score as ordinary terms). Expansion happens at query-parse time —
    the index is untouched, so synonym-table changes never re-index;
    the engine path rewrites the query text (single alphanumeric tokens
    are fixpoints of the analyzer) and reuses the whole BM25 serving
    stack unchanged."""
    from searchengine_ray.pipelines.query import search_queries

    analyzer = Analyzer(doc_index_config())
    rewritten = []
    for qid, text in SYN_QUERIES:
        qt = _expand_synonyms(text, analyzer)
        rewritten.append(
            (qid, " ".join(t for t, c in sorted(qt.items()) for _ in range(c))))
    paths = ensure_doc_index(sf_dir)
    res = search_queries(paths, rewritten, k=K, config=doc_index_config(),
                         concurrency=(1, 2)).to_pandas()
    res["score_bp"] = np.floor(res["score"].to_numpy() * 10000 + 0.5).astype(np.int64)
    res["rank"] = res["rank"].astype(np.int64)
    out = res[["query_id", "rank", "doc_id", "score_bp"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def synonym_search_sql(k1: float = 1.2, b: float = 0.75) -> str:
    """Oracle: the expansion runs through the SAME Python helper as the
    engine, so the VALUES list IS the contract; the BM25 body is the
    bm25_topk oracle's."""
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in SYN_QUERIES:
        for term, qtf in sorted(_expand_synonyms(text, analyzer).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    values_sql = ",\n        ".join(values)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
queries(query_id, qterm, qtf) AS (VALUES
        {values_sql}),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.qtf * ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM queries q
  JOIN df ON df.term = q.qterm
  JOIN tf ON tf.term = q.qterm
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scores)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_bp
FROM ranked WHERE rnk <= {K}
"""


# ---- result highlighting (snippets) ----

SNIPPET_W = 5  # tokens of context on each side of the first hit


def search_snippets(sf_dir: str, w: int = SNIPPET_W):
    """(query_id, rank, doc_id, score_bp, snippet) — BM25 top-k hydrated
    with a contextual snippet: the ``2w+1``-token window centred on the
    FIRST query-term occurrence in the document (result highlighting —
    the reference GUI shows the matched tweet text per hit,
    ``GUI.py:60-78``; Lucene calls this the highlighter/fragmenter).

    Shape: the hit set is tiny (<= |queries| * k rows), so it is
    broadcast once via ``ray.put`` and the documents table streams
    through ONE ``map_batches`` that filters to hit docs and slices the
    token window — no shuffle, no driver text materialization; at
    100 TB the text column is touched exactly once, pruned to two
    columns at the read."""
    import ray

    hits = bm25_topk(sf_dir)
    analyzer = Analyzer(doc_index_config())
    qterms = {qid: frozenset(analyzer.terms(text)) for qid, text in DOC_QUERIES}
    by_doc: dict[int, list[tuple[int, int, int]]] = {}
    for qid, rank, doc, sbp in zip(*(hits.column(c).to_pylist()
                                     for c in ("query_id", "rank",
                                               "doc_id", "score_bp"))):
        by_doc.setdefault(int(doc), []).append((int(qid), int(rank), int(sbp)))
    ref = ray.put((by_doc, qterms))

    def hydrate(batch: pa.Table) -> pa.Table:
        bd, qt = ray.get(ref)
        out = {"query_id": [], "rank": [], "doc_id": [],
               "score_bp": [], "snippet": []}
        for did, txt in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
            entries = bd.get(int(did))
            if not entries:
                continue
            toks = txt.split(" ")
            for qid, rank, sbp in entries:
                terms = qt[qid]
                pos = next((i for i, t in enumerate(toks) if t in terms), None)
                # a BM25 hit always contains >= 1 query term, so pos is
                # never None on real hits; the guard keeps malformed
                # input from crashing the stage
                snip = ("" if pos is None else
                        " ".join(toks[max(0, pos - w):pos + w + 1]))
                out["query_id"].append(qid)
                out["rank"].append(rank)
                out["doc_id"].append(int(did))
                out["score_bp"].append(sbp)
                out["snippet"].append(snip)
        return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                         "rank": pa.array(out["rank"], pa.int64()),
                         "doc_id": pa.array(out["doc_id"], pa.int64()),
                         "score_bp": pa.array(out["score_bp"], pa.int64()),
                         "snippet": pa.array(out["snippet"], pa.string())})

    res = (read(sf_dir, "documents", ["doc_id", "text"])
           .map_batches(hydrate, batch_format="pyarrow")
           .to_pandas())
    res = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(res, preserve_index=False)


def search_snippets_sql(w: int = SNIPPET_W) -> str:
    analyzer = Analyzer(doc_index_config())
    values = []
    for qid, text in DOC_QUERIES:
        for term in sorted(set(analyzer.terms(text))):
            values.append(f"({qid}, '{term}')")
    values_sql = ",\n        ".join(values)
    return f"""
WITH ex AS MATERIALIZED ({bm25_topk_sql()}),
qterms(query_id, term) AS (VALUES
        {values_sql}),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS arr FROM documents
  WHERE doc_id IN (SELECT DISTINCT doc_id FROM ex)),
firstpos AS (
  SELECT e.query_id, e.doc_id,
         min(CAST(list_position(t.arr, q.term) AS BIGINT)) AS p
  FROM ex e
  JOIN qterms q ON q.query_id = e.query_id
  JOIN toks t ON t.doc_id = e.doc_id
  WHERE list_position(t.arr, q.term) > 0
  GROUP BY e.query_id, e.doc_id)
SELECT e.query_id, e.rank, e.doc_id, e.score_bp,
       array_to_string(list_slice(t.arr, greatest(1, f.p - {w}), f.p + {w}),
                       ' ') AS snippet
FROM ex e
JOIN firstpos f ON f.query_id = e.query_id AND f.doc_id = e.doc_id
JOIN toks t ON t.doc_id = e.doc_id
"""


# ---- minimum_should_match (m-of-n) retrieval ----

MSM_QUERIES: list[tuple[int, str, int]] = [
    (1, "hash join window agg", 3),        # 3-of-4
    (2, "customer order line", 2),         # 2-of-3
    (3, "stream batch filter scan", 3),
    (4, "big small data value table", 4),  # 4-of-5
    (5, "zzznosuchterm hash join", 2),     # absent term can't count
    (6, "merge sort", 2),                  # m = n: degenerates to AND
]


def msm_search(sf_dir: str):
    """(query_id, doc_id, n_terms) — minimum_should_match retrieval
    (Lucene/ES ``minimum_should_match`` / terms_set query): docs
    containing at least ``m`` of the query's distinct terms, with the
    matched-term count. Sits between pure OR (m=1) and pure AND (m=n)
    — the partial-conjunction query class neither `boolean_search` nor
    BM25 exercises.

    Shape: the same disjunctive actor-pool stage wildcard queries use
    (`terms_union` — one np.unique over decoded posting arrays the
    BM25 pool already shares), then a vectorized threshold filter; the
    per-query m map is a handful of ints captured in the closure, not
    a shuffle."""
    from searchengine_ray.pipelines.query import terms_union_queries

    paths = ensure_doc_index(sf_dir)
    analyzer = Analyzer(doc_index_config())
    expanded = [(qid, " ".join(sorted(set(analyzer.terms(text)))))
                for qid, text, _m in MSM_QUERIES]
    m_by_qid = {qid: int(m) for qid, _t, m in MSM_QUERIES}
    res = terms_union_queries(paths, expanded, config=doc_index_config(),
                              concurrency=(1, 2))

    def threshold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        qids = batch.column("query_id").to_numpy(zero_copy_only=False)
        mins = np.array([m_by_qid[int(q)] for q in qids], np.int64)
        keep = pc.greater_equal(
            batch.column("n_terms"), pa.array(mins, pa.int64()))
        return batch.filter(keep)

    return res.map_batches(threshold, batch_format="pyarrow")


def msm_search_sql() -> str:
    analyzer = Analyzer(doc_index_config())
    qterm_vals, qm_vals = [], []
    for qid, text, m in MSM_QUERIES:
        qm_vals.append(f"({qid}, {m})")
        for t in sorted(set(analyzer.terms(text))):
            qterm_vals.append(f"({qid}, '{t}')")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
dtoks AS (SELECT DISTINCT doc_id, term FROM toks WHERE term <> ''),
qterms(query_id, term) AS (VALUES
        {', '.join(qterm_vals)}),
qm(query_id, m) AS (VALUES {', '.join(qm_vals)}),
hits AS (
  SELECT q.query_id, t.doc_id, CAST(count(*) AS BIGINT) AS n_terms
  FROM qterms q JOIN dtoks t ON t.term = q.term
  GROUP BY q.query_id, t.doc_id)
SELECT h.query_id, h.doc_id, h.n_terms
FROM hits h JOIN qm ON qm.query_id = h.query_id
WHERE h.n_terms >= qm.m
"""


# ---- span-first queries (term near the start of the field) ----

SPAN_FIRST_QUERIES: list[tuple[int, str, int]] = [
    (1, "hash", 5),
    (2, "customer", 10),
    (3, "the", 3),
    (4, "zzznosuchterm", 50),    # miss
    (5, "window", 1),            # doc must START with the term
    (6, "data", 20),
]


def span_first_search(sf_dir: str):
    """(query_id, doc_id, first_pos) — span-first retrieval over the
    positions-enabled index: docs whose FIRST occurrence of the term
    is at raw-token position < the query's limit (Lucene
    SpanFirstQuery — the 'matches near the start of the document'
    class used for title/lead boosts). The oracle recomputes it from
    token ordinals, so the positional decode path is checked from a
    third angle (phrase = adjacency, proximity = windowed chains, this
    = absolute position)."""
    from searchengine_ray.pipelines.query import span_first_queries

    paths = ensure_phrase_index(sf_dir)
    return span_first_queries(paths, SPAN_FIRST_QUERIES,
                              config=phrase_index_config(),
                              concurrency=(1, 2))


def span_first_search_sql() -> str:
    analyzer = Analyzer(phrase_index_config())
    selects = []
    for qid, text, limit in SPAN_FIRST_QUERIES:
        terms = analyzer.terms(text)
        if not terms:
            continue
        selects.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, doc_id, "
            f"CAST(min(pos) AS BIGINT) AS first_pos FROM toks "
            f"WHERE term = '{terms[0]}' GROUP BY doc_id "
            f"HAVING min(pos) < {int(limit)}")
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term,
         generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), 1) AS raw_pos
  FROM documents),
toks AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1 AS pos
  FROM raw WHERE term <> '')
{union}
"""


# ---- federated (document-partitioned) scatter-gather search ----

FED_SHARDS = 3


def ensure_fed_shards(sf_dir: str, n_shards: int = FED_SHARDS
                      ) -> list[IndexPaths]:
    """Build (once, resumable) ``n_shards`` INDEPENDENT indexes over a
    doc_id-hash partition of the documents table — the document-
    partitioned layout every sharded web index uses (each node owns a
    slice of the corpus and a full dictionary over it). Original
    doc_ids are kept so shard results are globally addressable."""
    roots = []
    tag = hashlib.blake2b(f"{sf_dir}|fed{n_shards}".encode(),
                          digest_size=6).hexdigest()
    corpus = _docs_as_corpus(sf_dir)
    for s in range(n_shards):
        def pick(batch: pa.Table, _s=s) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(ids % n_shards == _s))

        shard_corpus = corpus.map_batches(pick, batch_format="pyarrow")
        roots.append(build_index(
            shard_corpus, f"/tmp/graft_fed_shards/{tag}/shard{s}",
            doc_index_config(), id_column="doc_id", resume=True,
            source_tag=f"{sf_dir}|fed{s}"))
    return roots


def _fed_shard_df(dict_dir: str, terms: list[str]) -> dict[str, int]:
    """Per-shard df for the query vocabulary: a filtered 2-column read
    of that shard's dictionary — O(|query terms|) rows leave the node."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq
    from pathlib import Path as _Path

    files = sorted(str(f) for f in _Path(dict_dir).glob("*.parquet"))
    tbl = _pq.read_table(files, columns=["term", "df"],
                         filters=_pc.field("term").isin(
                             pa.array(terms, pa.string())))
    out: dict[str, int] = {}
    for t, d in zip(tbl.column("term").to_pylist(),
                    tbl.column("df").to_pylist()):
        out[t] = out.get(t, 0) + int(d)
    return out


def federated_search(sf_dir: str, n_shards: int = FED_SHARDS):
    """(query_id, rank, doc_id, score_bp) — BM25 top-k over ``n_shards``
    document-partitioned indexes via scatter-gather: global stats
    (N = sum N_s, avgdl = sum total_len_s / N, df = sum df_s over the
    query vocabulary) are folded from the shard metas/dictionaries and
    broadcast; every (query, shard) pair scores a partial top-k on its
    shard with those stats injected; a per-query gather merges the
    partials. The oracle is the SAME single-index BM25 SQL — a hash
    match proves document-partitioned serving is rank- AND score-
    identical to one monolithic index (the MultiReader/distributed-IDF
    equivalence, the core correctness claim of sharded serving).

    Scale shape: stats fold moves O(shards x |query terms|) rows; the
    scatter is the existing actor-pool search per shard; the gather
    shuffles only k rows per (query, shard). Nothing touches a second
    shard's postings."""
    import pandas as pd
    import ray
    import ray.data

    from searchengine_ray.pipelines.query import FederatedPartialStage

    shards = ensure_fed_shards(sf_dir, n_shards)
    metas = [s.meta() for s in shards]
    n_total = sum(int(m["N"]) for m in metas)
    total_len = sum(int(m["total_len"]) for m in metas)
    analyzer = Analyzer(doc_index_config())
    qvocab = sorted({t for _qid, text in DOC_QUERIES
                     for t in analyzer.terms(text)})
    df_task = ray.remote(_fed_shard_df)
    df_maps = ray.get([df_task.remote(s.dictionary, qvocab) for s in shards])
    gdf: dict[str, int] = {}
    for m in df_maps:
        for t, d in m.items():
            gdf[t] = gdf.get(t, 0) + d
    stats = {"N": n_total, "avgdl": total_len / n_total if n_total else 1.0,
             "df": gdf}
    stats_ref = ray.put(stats)

    scatter = ray.data.from_items(
        [{"query_id": int(qid), "text": text, "shard": s}
         for qid, text in DOC_QUERIES for s in range(n_shards)])
    partials = scatter.map_batches(
        FederatedPartialStage,
        fn_constructor_args=([s.root for s in shards], doc_index_config(),
                             stats_ref, K),
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2))

    def merge(df: "pd.DataFrame") -> pd.DataFrame:
        df = df.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(K)
        return pd.DataFrame({
            "query_id": df["query_id"].to_numpy(np.int64),
            "rank": np.arange(1, len(df) + 1, dtype=np.int64),
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "score_bp": np.floor(df["score"].to_numpy() * 10000
                                 + 0.5).astype(np.int64)})

    out = partials.groupby("query_id").map_groups(
        merge, batch_format="pandas").to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def federated_search_sql() -> str:
    # the WHOLE point: sharded serving must equal the monolithic index
    return bm25_topk_sql()


# ---- search_after: stateless deep paging over the federated path ----

class _SearchAfterPartialStage:
    """Scatter half of cursor paging (Elasticsearch ``search_after``):
    each shard returns its top-k among hits strictly AFTER the
    broadcast per-query cursor ``(score, doc_id)`` in (score desc,
    doc_id asc) order. The shard searches ``k + K`` then filters — a
    sound bound because at most K hits GLOBALLY sort before the
    page-1 cursor, so no shard can hold more than K of them. This is
    the point of search_after at scale: a shard never ships
    ``offset + k`` hits to the gather the way offset paging must;
    the cursor filter caps every shard's contribution at k."""

    def __init__(self, shard_roots, config, stats_ref, cursors, k: int = K):
        from searchengine_ray.pipelines.query import FederatedPartialStage

        self._inner = FederatedPartialStage(shard_roots, config, stats_ref,
                                            k=k + K)
        self.cursors = dict(cursors)
        self.k = int(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, scores = [], [], []
        for qid, text, shard in zip(batch.column("query_id").to_pylist(),
                                    batch.column("text").to_pylist(),
                                    batch.column("shard").to_pylist()):
            cur = self.cursors.get(int(qid))
            if cur is None:            # page 1 was short: no page 2
                continue
            c_score, c_doc = cur
            kept = 0
            for doc, score in self._inner._shard(int(shard)).search(
                    text, self.k + K):
                # strictly after the cursor in (score desc, doc_id asc)
                if score > c_score or (score == c_score and doc <= c_doc):
                    continue
                qids.append(qid); docs.append(doc); scores.append(score)
                kept += 1
                if kept >= self.k:
                    break
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "score": pa.array(scores, pa.float64())})


def search_after_federated(sf_dir: str, n_shards: int = FED_SHARDS):
    """(query_id, rank, doc_id, score_bp) — PAGE TWO (ranks 11..20) of
    DOC_QUERIES via cursor paging over the document-partitioned
    federated index: page 1's last hit (score, doc_id) is the cursor;
    shards score with global stats injected and keep only hits strictly
    after the cursor; the gather merges k-row partials and renumbers
    from 11. Hash-checked against ranks 11..20 of the monolithic BM25
    SQL window — cursor paging over shards must equal deep paging over
    one index. Queries with <=10 total hits produce no page 2 on
    either side (the short-page degenerate case rides along)."""
    import pandas as pd
    import ray
    import ray.data

    from searchengine_ray.pipelines.query import search_queries

    shards = ensure_fed_shards(sf_dir, n_shards)
    metas = [s.meta() for s in shards]
    n_total = sum(int(m["N"]) for m in metas)
    total_len = sum(int(m["total_len"]) for m in metas)
    analyzer = Analyzer(doc_index_config())
    qvocab = sorted({t for _qid, text in DOC_QUERIES
                     for t in analyzer.terms(text)})
    df_task = ray.remote(_fed_shard_df)
    df_maps = ray.get([df_task.remote(s.dictionary, qvocab) for s in shards])
    gdf: dict[str, int] = {}
    for m in df_maps:
        for t, d in m.items():
            gdf[t] = gdf.get(t, 0) + d
    stats = {"N": n_total, "avgdl": total_len / n_total if n_total else 1.0,
             "df": gdf}
    stats_ref = ray.put(stats)

    # page-1 cursors: the k-th hit per query (federated scoring is
    # score-identical to monolithic — the federated_search hash row —
    # so the cheap single-index pass provides the exact cursor floats)
    page1 = search_queries(ensure_doc_index(sf_dir), DOC_QUERIES, k=K,
                           config=doc_index_config(),
                           concurrency=(1, 2)).to_pandas()
    cursors = {int(qid): (float(g.iloc[-1]["score"]), int(g.iloc[-1]["doc_id"]))
               for qid, g in page1.groupby("query_id")
               if len(g) == K}

    scatter = ray.data.from_items(
        [{"query_id": int(qid), "text": text, "shard": s}
         for qid, text in DOC_QUERIES for s in range(n_shards)])
    partials = scatter.map_batches(
        _SearchAfterPartialStage,
        fn_constructor_args=([s.root for s in shards], doc_index_config(),
                             stats_ref, cursors, K),
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2))

    def merge(df: "pd.DataFrame") -> pd.DataFrame:
        df = df.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(K)
        return pd.DataFrame({
            "query_id": df["query_id"].to_numpy(np.int64),
            "rank": np.arange(K + 1, K + len(df) + 1, dtype=np.int64),
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "score_bp": np.floor(df["score"].to_numpy() * 10000
                                 + 0.5).astype(np.int64)})

    out = partials.groupby("query_id").map_groups(
        merge, batch_format="pandas").to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def search_after_sql() -> str:
    base = bm25_topk_sql()
    return base.replace(f"WHERE rnk <= {K}",
                        f"WHERE rnk > {K} AND rnk <= {2 * K}")


# ---- delete -> compact lifecycle, dictionary-verified ----

DEL_MOD = 7            # tombstone every doc_id % 7 == 0


def _dictionary_df(paths: IndexPaths):
    """(term, df) Dataset over an index's dictionary partitions — the
    shared distributed fold `index_dictionary` / `index_merge_dictionary`
    use (pre-aggregate per batch, tiny groupby folds block splits)."""
    from pathlib import Path

    import ray.data

    files = sorted(str(f) for f in Path(paths.dictionary).glob("*.parquet"))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("term").aggregate([("df", "sum")])
        return pa.table({"term": g.column("term"),
                         "df": g.column("df_sum").cast(pa.int64())})

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"term": batch.column("term"),
                         "df": batch.column("sum(df)").cast(pa.int64())})

    return (ray.data.read_parquet(files, columns=["term", "df"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("term").sum("df")
            .map_batches(rename, batch_format="pyarrow"))


def ensure_compacted_index(sf_dir: str) -> IndexPaths:
    """Build (once, marker-gated) a dedicated index copy, tombstone
    every doc_id % DEL_MOD == 0, and ``compact_index`` it — the full
    Lucene delete->merge lifecycle, exercised end to end on real build
    output. The delete list comes from a single-column pruned read of
    the documents table (deletes are control-plane input; at corpus
    scale the caller supplies ids, it doesn't scan for them)."""
    import json
    from pathlib import Path

    import pyarrow.parquet as _pq

    from searchengine_ray.pipelines.build import (compact_index,
                                                  delete_documents)
    from searchengine_ray.pipelines.common import table_path

    from searchengine_ray.pipelines.trigram import _corpus_fingerprint

    tag = hashlib.blake2b(
        f"{sf_dir}|del{DEL_MOD}|{_corpus_fingerprint(sf_dir)}".encode(),
        digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_del_index/{tag}")
    marker = root / "_DONE.json"
    compacted = root / "compacted"
    if marker.is_file():
        return IndexPaths(str(compacted))
    base = build_index(_docs_as_corpus(sf_dir), root / "base",
                       doc_index_config(), id_column="doc_id", resume=True,
                       source_tag=f"{sf_dir}|delbase")
    ids = _pq.read_table(table_path(sf_dir, "documents"),
                         columns=["doc_id"]).column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    delete_documents(base.root, ids[ids % DEL_MOD == 0])
    out = compact_index(base.root, compacted)
    marker.write_text(json.dumps({"sf_dir": sf_dir, "mod": DEL_MOD}))
    return out


def index_delete_dictionary(sf_dir: str):
    """(term, df) of the COMPACTED index after tombstoning every
    doc_id % 7 == 0 — the delete->compact lifecycle's correctness gate:
    the oracle recomputes df over only the surviving documents, so a
    hash match proves tombstones fully left the postings, df/N stats
    were rebuilt exactly, and no live posting was lost in the fold
    (`index_merge_dictionary` proves the same for segment merges;
    together they cover the index lifecycle's two mutation paths)."""
    return _dictionary_df(ensure_compacted_index(sf_dir))


def index_delete_dictionary_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents WHERE doc_id % {DEL_MOD} <> 0)
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM toks WHERE term <> '' GROUP BY term
"""


# ---- champion lists (impact-ordered posting heads) ----

CHAMPION_C = 3


class _ChampionPartial:
    """map_batches over the POSTINGS parquet: decode each slice and
    emit only its top-C (tf desc, doc_id asc) postings per term — the
    per-slice partial of the champion list (any global top-C member is
    top-C within its slice, so the partial prune is lossless). The
    decode plumbing is `_PostingsExport`'s; the output is C rows per
    (term, slice) instead of the whole list."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from searchengine_ray.codec import PostingBlocks, decode_blocks

        out_t, out_d, out_tf = [], [], []
        for i in range(batch.num_rows):
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
            top = np.lexsort((ids, -tfs.astype(np.int64)))[:CHAMPION_C]
            out_t.extend([batch.column("term")[i].as_py()] * len(top))
            out_d.append(ids[top])
            out_tf.append(tfs[top].astype(np.int64))
        if not out_t:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "doc_id": int64_col(np.concatenate(out_d)),
                         "tf": int64_col(np.concatenate(out_tf))})


def champion_lists(sf_dir: str):
    """(term, doc_id, tf, rnk) — the top-C highest-tf docs of every
    term's posting list, rank-ordered (tf desc, doc_id asc): Lucene/
    WAND-era CHAMPION LISTS (a.k.a. impact-ordered posting heads),
    the static pruning structure that serves approximate top-k from a
    fraction of each list. Reference analog: the ranker's
    tf-weighted scoring (search_engine.py:62-71) — this face
    precomputes who could ever win it per term.

    Shape: one decode pass over the postings parquet emits per-slice
    top-C partials (lossless prune, C x slices rows per term); one
    term-key groupby merges slices. Postings stay term-partitioned,
    so the groupby moves only champion-head rows — never a full list."""
    import ray
    from pathlib import Path

    paths = ensure_doc_index(sf_dir)
    files = [str(p) for p in sorted(Path(paths.postings).glob("*.parquet"))]

    def final_top(g: "pd.DataFrame") -> pa.Table:
        g = g.sort_values(["tf", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(CHAMPION_C)
        return pa.table({
            "term": pa.array(g["term"].tolist(), pa.string()),
            "doc_id": int64_col(g["doc_id"].to_numpy(np.int64)),
            "tf": int64_col(g["tf"].to_numpy(np.int64)),
            "rnk": int64_col(np.arange(1, len(g) + 1)),
        })

    return ray.data.read_parquet(
        files, columns=["term", "counts", "last_docs", "max_tfs",
                        "doc_sizes", "tf_sizes", "doc_bytes", "tf_bytes"],
    ).map_batches(_ChampionPartial, batch_format="pyarrow",
                  concurrency=(1, 4)) \
        .groupby("term").map_groups(final_top, batch_format="pandas")


def champion_lists_sql(c: int = CHAMPION_C) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT term, doc_id, count(*) AS tf
       FROM toks WHERE term <> '' GROUP BY term, doc_id),
ranked AS (
  SELECT term, doc_id, CAST(tf AS BIGINT) AS tf,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf DESC, doc_id ASC) AS rnk
  FROM tf)
SELECT term, doc_id, tf, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {c}
"""
