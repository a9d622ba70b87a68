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

Shapes (all 100-TB-safe):
- index build: one map_batches pass extracts per-doc distinct trigram
  codes (vectorized utf-32 -> packed int64), ONE hash-partitioned
  groupby writes gram-sorted posting partitions (`part_<p>.parquet`,
  64 Ki row groups) — the same exchange shape as the term index;
- query: file-level partition pruning (only parts holding the query's
  grams are opened) + an `np.isin` gram filter per batch; candidate
  counting is a pre-aggregated (query, doc) partial -> one small
  groupby; verification routes candidates to hash partitions whose
  tasks read ONLY the texts they reference (the JaccardVerifyGroup
  discipline, dedup.py:233-268);
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

_TRI_PARTS = 8
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


class _TrigramExtract:
    """(gram, doc_id, part) rows — per-doc distinct trigrams."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        per_doc = [_gram_codes(t) for t in texts]
        if per_doc:
            grams = np.concatenate(per_doc)
            docs = np.repeat(ids, [len(g) for g in per_doc])
        else:
            grams = np.empty(0, np.int64)
            docs = np.empty(0, np.int64)
        return pa.table({"gram": int64_col(grams),
                         "doc_id": int64_col(docs),
                         "part": int64_col(grams % _TRI_PARTS)})


def _build_parts(rows, root: str, suffix: str = "") -> list[tuple[int, int]]:
    """One hash-partitioned groupby over (gram, doc_id, part) rows
    writing gram-sorted ``part_<p><suffix>.parquet`` segments. Returns
    bounded (part, n_rows) stats."""

    def write_part(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        p = int(g.column("part")[0].as_py())
        g = g.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        g = g.drop_columns(["part"])
        pq.write_table(g, os.path.join(root, f"part_{p}{suffix}.parquet"),
                       row_group_size=_ROW_GROUP)
        return pa.table({"part": int64_col([p]),
                         "n_rows": int64_col([g.num_rows])})

    stats = rows.groupby("part").map_groups(
        write_part, batch_format="pyarrow").take_all()   # bounded: P rows
    return sorted((int(r["part"]), int(r["n_rows"])) for r in stats)


def ensure_trigram_index(sf_dir: str) -> str:
    """Build (once per sf_dir, cached under /tmp) the partitioned
    trigram posting index: ``part_<p>.parquet`` holding (gram, doc_id)
    sorted by (gram, doc_id) with small row groups, so query-time reads
    prune at file level (gram % P) and at row-group level (gram-sorted
    statistics). One extraction pass + one groupby — the identical
    exchange shape as the main term index (build.py:304-396)."""
    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    root = f"/tmp/graft_trigram_index/{tag}"
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)
    rows = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _TrigramExtract, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4))
    stats = _build_parts(rows, root)
    with open(marker, "w") as f:
        json.dump({"parts": stats}, f)
    return root


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


def _candidate_pairs(root: str, queries: list[tuple[int, str]]):
    """Dataset of (query_id, doc_id) candidates: docs containing ALL
    trigrams of each query's needle.

    Only index parts holding a needed gram are opened (file-level
    pruning via gram % P — the J2 partition-pruning discipline); each
    batch filters to needed grams with one `np.isin`, emits per-(query,
    doc) partial counts, and a small groupby-sum compares against the
    per-query gram count. Queries shorter than 3 chars are rejected
    (no trigram evidence -> would need the full-scan path)."""
    import ray

    qgrams = {qid: _needle_grams(n) for qid, n in queries}
    if any(len(g) == 0 for g in qgrams.values()):
        raise ValueError("substring queries must be >= 3 chars")
    needed = np.unique(np.concatenate(list(qgrams.values())))
    nreq = {qid: len(g) for qid, g in qgrams.items()}
    import glob as _glob

    parts = sorted({int(p) for p in np.unique(needed % _TRI_PARTS)})
    files = []
    for p in parts:           # base segment + any incremental generations
        files.extend(sorted(_glob.glob(
            os.path.join(root, f"part_{p}.parquet"))))
        files.extend(sorted(_glob.glob(
            os.path.join(root, f"part_{p}_g*.parquet"))))
    if not files:
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()), "n_p": pa.array([], pa.int64())}))

    def partial(batch: pa.Table) -> pa.Table:
        grams = batch.column("gram").to_numpy(zero_copy_only=False)
        docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.isin(grams, needed)
        grams, docs = grams[keep], docs[keep]
        out_q, out_d, out_n = [], [], []
        for qid, g in qgrams.items():
            m = np.isin(grams, g)
            if not m.any():
                continue
            ud, cnt = np.unique(docs[m], return_counts=True)
            out_q.append(np.full(len(ud), qid, np.int64))
            out_d.append(ud.astype(np.int64))
            out_n.append(cnt.astype(np.int64))
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64())})
        return pa.table({"query_id": int64_col(np.concatenate(out_q)),
                         "doc_id": int64_col(np.concatenate(out_d)),
                         "n_p": int64_col(np.concatenate(out_n))})

    def keep_full(batch: pa.Table) -> pa.Table:
        q = batch.column("query_id").to_numpy(zero_copy_only=False)
        n = batch.column("sum(n_p)").to_numpy(zero_copy_only=False)
        want = np.array([nreq[int(x)] for x in q.tolist()], np.int64)
        m = n == want
        return pa.table({"query_id": int64_col(q[m].astype(np.int64)),
                         "doc_id": batch.column("doc_id").cast(pa.int64())
                         .filter(pa.array(m))})

    return ray.data.read_parquet(files, columns=["gram", "doc_id"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["query_id", "doc_id"]).sum("n_p") \
        .map_batches(keep_full, batch_format="pyarrow")


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


def trigram_substring_search(sf_dir: str):
    """(query_id, doc_id, n_matches, first_pos) — substring search
    SERVED FROM THE TRIGRAM INDEX: posting-intersection candidates,
    then exact verification reading only candidate texts. Matches the
    full-scan answer exactly (hash oracle = position()/replace()
    arithmetic over the raw corpus); the index path touches only the
    posting parts and the candidate docs — at 10^12 files that is the
    difference between a grep of everything and a few list reads."""
    return _verified(sf_dir, SUBSTRING_QUERIES).filter(expr="n_matches > 0")


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
    final answers. Queries with zero candidates still emit a row."""
    agg: dict[int, list[int]] = {qid: [0, 0] for qid, _ in SUBSTRING_QUERIES}
    for row in _verified(sf_dir, SUBSTRING_QUERIES).take_all():  # bounded:
        # candidate pairs are result-scale for selective needles (the
        # only kind an index serves); the aggregate itself is |q| rows
        a = agg[int(row["query_id"])]
        a[0] += 1
        a[1] += int(row["n_matches"] > 0)
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


def trigram_regex_search(sf_dir: str):
    """(query_id, doc_id, n_matches, first_match) — regex retrieval
    ACCELERATED by the trigram index: each pattern's required literal
    (see `required_literal`) prefilters candidates through posting
    intersection, and only candidate texts run the compiled regex;
    patterns with no extractable literal take the honest full-scan
    path (query 3 exercises it). Answers are exactly the full-scan
    `regex_search` semantics — the oracle replays every pattern over
    the raw corpus with RE2, blind to the acceleration."""
    accel = [(qid, p, required_literal(p)) for qid, p in TRI_REGEX_QUERIES]
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
    then an APPEND-ONLY increment over doc_id % 2 == 1 writing
    ``part_<p>_g2.parquet`` beside the base segments — no base file is
    rewritten (the Lucene segment model; queries read base + all
    generations and never notice). Cached once per sf_dir."""
    tag = hashlib.blake2b((sf_dir + "#incr").encode(),
                          digest_size=6).hexdigest()
    root = f"/tmp/graft_trigram_index/{tag}"
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)
    docs = read(sf_dir, "documents", ["doc_id", "text"])
    base = docs.map_batches(_ModFilter, fn_constructor_args=(0,),
                            batch_format="pyarrow", concurrency=(1, 2)) \
        .map_batches(_TrigramExtract, batch_format="pyarrow",
                     batch_size=512, concurrency=(1, 4))
    s1 = _build_parts(base, root)
    incr = docs.map_batches(_ModFilter, fn_constructor_args=(1,),
                            batch_format="pyarrow", concurrency=(1, 2)) \
        .map_batches(_TrigramExtract, batch_format="pyarrow",
                     batch_size=512, concurrency=(1, 4))
    s2 = _build_parts(incr, root, suffix="_g2")
    with open(marker, "w") as f:
        json.dump({"base": s1, "g2": s2}, f)
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
