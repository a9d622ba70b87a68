"""Text-analysis pipelines over the ``documents`` table (training-data ops).

All shaped the same scale-first way: a vectorized ``map_batches`` stage
computes exact per-batch partials (a document is wholly contained in its
batch), then a small ``groupby`` merges partials — the wide shuffle only
ever sees one row per (key, batch), not one per token.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from searchengine_ray.config import IndexConfig
from searchengine_ray.pipelines.common import bp, int64_col, read
from searchengine_ray.tokenizer import Analyzer


class _SimpleTokenStage:
    """Per-worker analyzer state (compiled regex) — actor/task reuse."""

    def __init__(self):
        self.analyzer = Analyzer(IndexConfig(analyzer="simple"))


class TermDFPartial(_SimpleTokenStage):
    """batch -> one row per term: partial df + total tf (pre-aggregation
    before the term groupby — reference A2/A3,
    /root/reference/indexer.py:79-92, as a two-stage aggregate)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = np.arange(len(texts), dtype=np.int64)
        codes, docs, tfs, info = self.analyzer.tokenize_batch(texts, ids)
        if len(codes) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df_p": pa.array([], pa.int64()),
                             "tf_p": pa.array([], pa.int64())})
        n_terms = len(info["vocab"])
        df_p = np.bincount(codes, minlength=n_terms)
        tf_p = np.bincount(codes, weights=tfs, minlength=n_terms).astype(np.int64)
        return pa.table({"term": pa.array(info["vocab"], pa.string()),
                         "df_p": int64_col(df_p), "tf_p": int64_col(tf_p)})


def term_df(sf_dir: str):
    """(term, df, total_tf) — the dictionary/df computation over documents."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    partial = ds.map_batches(TermDFPartial, batch_format="pyarrow", batch_size=512,
                            concurrency=(1, 4))
    out = partial.groupby("term").aggregate(Sum("df_p", alias_name="df"),
                                            Sum("tf_p", alias_name="total_tf"))
    return out


def term_df_sql() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
FROM tf GROUP BY term
"""


class DocTokenStats(_SimpleTokenStage):
    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        _, _, _, info = self.analyzer.tokenize_batch(texts, ids)
        return pa.table({"doc_id": int64_col(ids),
                         "n_tokens": int64_col(info["doc_len"]),
                         "n_distinct": int64_col(info["n_terms"]),
                         "max_tf": int64_col(info["max_tf"])})


def doc_token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_distinct, max_tf) — per-doc, zero shuffles
    (reference A4, parser_module.py:204-241/321)."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        DocTokenStats, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))


def doc_token_stats_sql() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(tf) AS BIGINT) AS max_tf
FROM tf GROUP BY doc_id
"""


def _quality_batch(batch: pa.Table) -> pa.Table:
    s = pd.Series(batch.column("text").to_pylist())
    n = s.str.len().to_numpy(dtype=np.int64)
    alpha = s.str.count(r"[A-Za-z]").to_numpy(dtype=np.float64)
    digit = s.str.count(r"[0-9]").to_numpy(dtype=np.float64)
    ws = s.str.count(r"\s").to_numpy(dtype=np.float64)
    safe_n = np.maximum(n, 1).astype(np.float64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": int64_col(n),
        "alpha_bp": int64_col(bp(alpha / safe_n)),
        "digit_bp": int64_col(bp(digit / safe_n)),
        "ws_bp": int64_col(bp(ws / safe_n)),
    })


def text_quality(sf_dir: str):
    """Quality-scoring features per doc (length / char-class ratios as
    integer basis points) — vectorized pandas string kernels."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _quality_batch, batch_format="pyarrow", batch_size=2048)


def text_quality_sql() -> str:
    def ratio(cls: str) -> str:
        return (f"CAST(floor((CAST(length(regexp_replace(text, '[^{cls}]', '', 'g')) AS DOUBLE)"
                f" / CAST(greatest(length(text), 1) AS DOUBLE)) * 10000 + 0.5) AS BIGINT)")
    return f"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       {ratio('A-Za-z')} AS alpha_bp,
       {ratio('0-9')} AS digit_bp,
       {ratio(chr(92) + 's')} AS ws_bp
FROM documents
"""


class TokenCountByLangPartial(_SimpleTokenStage):
    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        ids = np.arange(len(texts), dtype=np.int64)
        _, _, _, info = self.analyzer.tokenize_batch(texts, ids)
        agg: dict[str, list[int]] = {}
        for lang, dl in zip(langs, info["doc_len"]):
            e = agg.setdefault(lang, [0, 0])
            e[0] += 1
            e[1] += int(dl)
        keys = sorted(agg)
        return pa.table({"lang": pa.array(keys, pa.string()),
                         "docs_p": int64_col([agg[k][0] for k in keys]),
                         "tok_p": int64_col([agg[k][1] for k in keys])})


def token_count_by_lang(sf_dir: str):
    """(lang, n_docs, total_tokens) — partial per batch, tiny groupby."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text", "lang"])
    partial = ds.map_batches(TokenCountByLangPartial, batch_format="pyarrow",
                             batch_size=1024, concurrency=(1, 4))
    return partial.groupby("lang").aggregate(Sum("docs_p", alias_name="n_docs"),
                                             Sum("tok_p", alias_name="total_tokens"))


def _repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-doc line-repetition metrics (the Gopher repetition filters,
    Rae et al. 2021 §A1.1, restricted to the SQL-expressible line
    family): duplicate-line fraction, duplicate-line CHARACTER
    fraction, and most-frequent-line fraction, as integer basis points.
    All pandas C kernels: split -> explode -> two groupbys; no Python
    loop over rows."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    s = pd.Series(batch.column("text").to_pylist())
    lines = s.str.split("\n").explode()
    lines = lines[lines != ""]
    out = pd.DataFrame({
        "n_lines": np.zeros(len(s), dtype=np.int64),
        "dup_line_bp": np.zeros(len(s), dtype=np.int64),
        "dup_char_bp": np.zeros(len(s), dtype=np.int64),
        "top_line_bp": np.zeros(len(s), dtype=np.int64),
    }, index=s.index)
    if len(lines):
        per = (pd.DataFrame({"row": lines.index, "line": lines.to_numpy()})
               .groupby(["row", "line"], sort=False).size().rename("c")
               .reset_index())
        per["len"] = per["line"].str.len().to_numpy(dtype=np.int64)
        g = per.groupby("row", sort=False)
        n_lines = g["c"].sum()
        n_distinct = g["c"].size()
        chars_all = (per["c"] * per["len"]).groupby(per["row"]).sum()
        chars_distinct = g["len"].sum()
        max_c = g["c"].max()
        nl = n_lines.to_numpy(dtype=np.float64)
        ca = np.maximum(chars_all.to_numpy(dtype=np.float64), 1.0)
        out.loc[n_lines.index, "n_lines"] = n_lines.to_numpy(dtype=np.int64)
        out.loc[n_lines.index, "dup_line_bp"] = bp(
            (nl - n_distinct.to_numpy(dtype=np.float64)) / nl)
        out.loc[n_lines.index, "dup_char_bp"] = bp(
            (chars_all.to_numpy(dtype=np.float64)
             - chars_distinct.to_numpy(dtype=np.float64)) / ca)
        out.loc[n_lines.index, "top_line_bp"] = bp(
            max_c.to_numpy(dtype=np.float64) / nl)
    return pa.table({"doc_id": int64_col(ids),
                     "n_lines": int64_col(out["n_lines"].to_numpy()),
                     "dup_line_bp": int64_col(out["dup_line_bp"].to_numpy()),
                     "dup_char_bp": int64_col(out["dup_char_bp"].to_numpy()),
                     "top_line_bp": int64_col(out["top_line_bp"].to_numpy())})


def repetition_quality(sf_dir: str):
    """(doc_id, n_lines, dup_line_bp, dup_char_bp, top_line_bp) — the
    repetition family of training-data quality filters. Per-doc, zero
    shuffles; a filter threshold (e.g. dup_line_bp > 3000 -> drop) is a
    one-line ``ds.filter`` downstream."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pyarrow", batch_size=2048)


def repetition_quality_sql() -> str:
    return """
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
per_line AS (
  SELECT doc_id, line, count(*) AS c, length(line) AS len
  FROM lines WHERE line <> '' GROUP BY doc_id, line),
agg AS (
  SELECT doc_id, sum(c) AS n_lines, count(*) AS n_distinct,
         sum(c * len) AS chars_all, sum(len) AS chars_distinct, max(c) AS max_c
  FROM per_line GROUP BY doc_id)
SELECT d.doc_id,
  CAST(coalesce(a.n_lines, 0) AS BIGINT) AS n_lines,
  CAST(floor(coalesce((a.n_lines - a.n_distinct) / CAST(a.n_lines AS DOUBLE), 0)
             * 10000 + 0.5) AS BIGINT) AS dup_line_bp,
  CAST(floor(coalesce((a.chars_all - a.chars_distinct)
                      / CAST(greatest(a.chars_all, 1) AS DOUBLE), 0)
             * 10000 + 0.5) AS BIGINT) AS dup_char_bp,
  CAST(floor(coalesce(a.max_c / CAST(a.n_lines AS DOUBLE), 0)
             * 10000 + 0.5) AS BIGINT) AS top_line_bp
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def token_count_by_lang_sql() -> str:
    return """
WITH t AS (
  SELECT lang, len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                               x -> x <> '')) AS n_tok
  FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM t GROUP BY lang
"""


# ---- non-SQL-expressible ops (rows-only driver check) ----

_LANG_PROFILES = {
    # tiny char-trigram prototype profiles (public-knowledge heuristic:
    # cosine over character n-gram frequency, cf. Cavnar & Trenkle 1994)
    "en": ["the", "and", "ing", "ion", "ent"],
    "es": ["que", "de_", "la_", "ión", "os_"],
    "de": ["der", "ein", "ich", "sch", "und"],
    "fr": ["les", "de_", "ent", "ion", "que"],
    "zh": [],  # non-latin scripts detected by codepoint class instead
}


class LangIdStage:
    """n-gram language-ID heuristic (stateful: profiles built once)."""

    def __init__(self):
        self.profiles = {k: set(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for text in batch.column("text").to_pylist():
            t = ("_" + text.lower().replace(" ", "_") + "_")[:4000]
            grams = {t[i:i + 3] for i in range(len(t) - 2)}
            if any(ord(c) > 0x2E7F for c in t[:200]):
                preds.append("zh"); scores.append(10_000)
                continue
            best, best_s = "en", -1
            for lang, prof in self.profiles.items():
                if not prof:
                    continue
                s = len(grams & prof)
                if s > best_s:
                    best, best_s = lang, s
            preds.append(best)
            scores.append(int(best_s))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "pred_lang": pa.array(preds, pa.string()),
                         "ngram_hits": int64_col(scores)})


def lang_id(sf_dir: str):
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangIdStage, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))


def lang_id_sql() -> str:
    """The same fixed trigram heuristic in SQL (profiles inlined), so the
    driver can hash-check lang_id instead of a rows-only pass. Tie-break
    mirrors the first-wins dict order (en, es, de, fr): a later language
    wins only with a STRICTLY greater hit count."""
    def prof(lang: str) -> str:
        return "[" + ",".join(f"'{g}'" for g in _LANG_PROFILES[lang]) + "]"

    return f"""
WITH t AS (
  SELECT doc_id,
         substr('_' || replace(lower(text), ' ', '_') || '_', 1, 4000) AS s
  FROM documents),
g AS (
  SELECT doc_id, s,
         list_distinct([substr(s, i, 3)
                        for i in generate_series(1, length(s) - 2)]) AS grams
  FROM t),
sc AS (
  SELECT doc_id, s,
         len(list_intersect(grams, {prof('en')})) AS s_en,
         len(list_intersect(grams, {prof('es')})) AS s_es,
         len(list_intersect(grams, {prof('de')})) AS s_de,
         len(list_intersect(grams, {prof('fr')})) AS s_fr
  FROM g)
SELECT doc_id,
       CASE WHEN regexp_matches(substr(s, 1, 200), '[\\x{{2E80}}-\\x{{10FFFF}}]') THEN 'zh'
            WHEN s_fr > greatest(s_en, s_es, s_de) THEN 'fr'
            WHEN s_de > greatest(s_en, s_es) THEN 'de'
            WHEN s_es > s_en THEN 'es'
            ELSE 'en' END AS pred_lang,
       CASE WHEN regexp_matches(substr(s, 1, 200), '[\\x{{2E80}}-\\x{{10FFFF}}]')
            THEN CAST(10000 AS BIGINT)
            ELSE CAST(greatest(s_en, s_es, s_de, s_fr) AS BIGINT) END AS ngram_hits
FROM sc
"""


_M61 = np.uint64((1 << 61) - 1)
_FP_BASE = 1_000_003


def _modmul61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * b) mod 2^61-1, vectorized in uint64 without 128-bit ints.

    Classic Mersenne-prime trick: split both operands into 32-bit
    halves; 2^64 ≡ 8 and 2^61 ≡ 1 (mod M) collapse every partial
    product back under 2^61 before any uint64 overflow.
    """
    a = a.astype(np.uint64, copy=False)
    b = b.astype(np.uint64, copy=False)
    a1, a0 = a >> np.uint64(32), a & np.uint64(0xFFFFFFFF)
    b1, b0 = b >> np.uint64(32), b & np.uint64(0xFFFFFFFF)
    hi = (a1 * b1) << np.uint64(3)                      # *2^64 ≡ *8
    mid = a1 * b0 + a0 * b1                             # < 2^62
    m1, m0 = mid >> np.uint64(29), mid & np.uint64((1 << 29) - 1)
    lo = a0 * b0
    lo = (lo >> np.uint64(61)) + (lo & _M61)
    s = hi + m1 + (m0 << np.uint64(32)) + lo            # < 2^63
    s = (s >> np.uint64(61)) + (s & _M61)
    return np.where(s >= _M61, s - _M61, s)


def _modsum61(v: np.ndarray) -> int:
    """Sum mod 2^61-1 by pairwise folding (each fold stays < 2^62)."""
    M = _M61
    while len(v) > 1:
        k = len(v) // 2
        head = v[:k] + v[k:2 * k]
        head = np.where(head >= M, head - M, head)
        if len(v) % 2:
            tail = head[:1] + v[-1:]
            head[:1] = np.where(tail >= M, tail - M, tail)
        v = head
    return int(v[0]) if len(v) else 0


class FingerprintStage:
    """Rabin-Karp rolling-hash document fingerprint, vectorized.

    h = sum(codepoint_j * B^(n-1-j)) mod 2^61-1 over UNICODE CODEPOINTS
    (== Horner's rule left-to-right), so DuckDB can recompute it exactly
    with list_reduce over ord(char) in HUGEINT. Powers of B are extended
    once per actor and sliced per doc; per-doc work is one vectorized
    modmul + a log(n) folding sum — no per-character Python.
    """

    def __init__(self):
        self._pw = np.ones(1, dtype=np.uint64)

    def _powers(self, n: int) -> np.ndarray:
        if len(self._pw) < n:
            old = len(self._pw)
            grown = np.empty(max(n, old * 2), dtype=np.uint64)
            grown[:old] = self._pw
            M, B = (1 << 61) - 1, _FP_BASE
            p = int(self._pw[old - 1])
            for i in range(old, len(grown)):       # once per actor, amortized
                p = (p * B) % M
                grown[i] = p
            self._pw = grown
        return self._pw

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = []
        for text in batch.column("text").to_pylist():
            cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
            n = len(cp)
            if n == 0:
                fps.append(0)
                continue
            pw = self._powers(n)
            terms = _modmul61(cp.astype(np.uint64), pw[n - 1::-1])
            fps.append(_modsum61(terms))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fingerprint": int64_col(fps)})


def doc_fingerprint(sf_dir: str):
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        FingerprintStage, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4))


# GPT-2-style pre-tokenizer, ASCII approximation shared verbatim with
# the SQL oracle (both 're' and RE2 compile it identically): a leading
# space attaches to the following word/number/punct run.
_BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


class BpeTokenCountStage:
    """(doc_id, n_bpe_tokens, n_ws_tokens) — BPE-ish regex token count
    next to the whitespace count (the two token-budget estimators a
    training-data pipeline runs per document). Regex compiled once per
    actor."""

    def __init__(self):
        import re

        self.bpe = re.compile(_BPE_PATTERN)
        self.ws = re.compile(r"\S+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        bpe_n, ws_n = [], []
        for text in batch.column("text").to_pylist():
            bpe_n.append(len(self.bpe.findall(text)))
            ws_n.append(len(self.ws.findall(text)))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_bpe_tokens": int64_col(bpe_n),
                         "n_ws_tokens": int64_col(ws_n)})


def token_count_bpe(sf_dir: str):
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        BpeTokenCountStage, batch_format="pyarrow", batch_size=2048,
        concurrency=(1, 2))


def token_count_bpe_sql() -> str:
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_ws_tokens
FROM documents
"""


class NumericLiteralsPartial:
    """Per-batch partial counts of CANONICALIZED numeric literals
    (tokenizer.canonicalize_number — reference P6's number rules as
    opt-in lexical canonicalization), extracted from customer names
    ("Customer#000000042" — real leading zeros to strip)."""

    def __init__(self):
        from searchengine_ray.tokenizer import NUM_RE, canonicalize_number

        self.num_re = NUM_RE
        self.canon = canonicalize_number

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for s in batch.column("c_name").to_pylist():
            for tok in self.num_re.findall(s):
                counts[self.canon(tok)] += 1
        keys = sorted(counts)
        return pa.table({"literal": pa.array(keys, pa.string()),
                         "n_p": int64_col([counts[k] for k in keys])})


def numeric_literals(sf_dir: str):
    """(literal, n_occurrences) — canonicalized numeric literals over
    customer.c_name: partial Counter per batch, tiny groupby merge."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "customer", ["c_name"])
    partial = ds.map_batches(NumericLiteralsPartial, batch_format="pyarrow",
                             batch_size=4096, concurrency=(1, 2))
    return partial.groupby("literal").aggregate(
        Sum("n_p", alias_name="n_occurrences"))


def numeric_literals_sql() -> str:
    """The identical lexical rule chain in SQL — the oracle for the
    analyzer's normalize_numbers option."""
    return r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(c_name, '[0-9][0-9_]*(?:\.[0-9_]+)?')) AS t
  FROM customer),
canon AS (
  SELECT regexp_replace(
           CASE WHEN contains(replace(t, '_', ''), '.')
                THEN regexp_replace(regexp_replace(replace(t, '_', ''),
                                                   '0+$', ''), '\.$', '')
                ELSE replace(t, '_', '') END,
           '^0+([0-9])', '\1') AS literal
  FROM toks)
SELECT literal, CAST(count(*) AS BIGINT) AS n_occurrences
FROM canon GROUP BY literal
"""


class TermsByLangPartial(_SimpleTokenStage):
    """batch -> one row per (lang, term): partial total tf. Same
    pre-aggregation shape as TermDFPartial with the language as a
    second group key carried from the document row."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "term": pa.array([], pa.string()),
                          "tf_p": pa.array([], pa.int64())})
        texts = batch.column("text").to_pylist()
        langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        ids = np.arange(len(texts), dtype=np.int64)
        codes, docs, tfs, info = self.analyzer.tokenize_batch(texts, ids)
        if len(codes) == 0:
            return empty
        n_terms = len(info["vocab"])
        lang_codes, lang_vals = pd.factorize(langs[docs])
        combined = lang_codes.astype(np.int64) * n_terms + codes
        tf = np.bincount(combined, weights=tfs,
                         minlength=len(lang_vals) * n_terms).astype(np.int64)
        nz = np.flatnonzero(tf)
        vocab = np.asarray(info["vocab"], dtype=object)
        return pa.table({
            "lang": pa.array(lang_vals[nz // n_terms], pa.string()),
            "term": pa.array(vocab[nz % n_terms], pa.string()),
            "tf_p": int64_col(tf[nz]),
        })


def top_terms_per_lang(sf_dir: str, k: int = 10):
    """Grouped top-k: the k most frequent tokens per language,
    tie-broken (tf desc, term asc). The wide shuffle carries one row
    per (lang, term, batch); the per-lang top-k runs over the already
    tiny merged vocabulary slice."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["lang", "text"])
    partial = ds.map_batches(TermsByLangPartial, batch_format="pyarrow",
                             batch_size=512, concurrency=(1, 4))
    tf = partial.groupby(["lang", "term"]).aggregate(
        Sum("tf_p", alias_name="total_tf"))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["total_tf", "term"], ascending=[False, True],
                            kind="mergesort").head(k)
        return pd.DataFrame({
            "lang": df["lang"].to_numpy(),
            "rank": np.arange(1, len(df) + 1, dtype=np.int64),
            "term": df["term"].to_numpy(),
            "total_tf": df["total_tf"].to_numpy(dtype=np.int64),
        })

    return tf.groupby("lang").map_groups(topk, batch_format="pandas")


def top_terms_per_lang_sql(k: int = 10) -> str:
    return f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT lang, term, count(*) AS total_tf FROM toks
       WHERE term <> '' GROUP BY lang, term),
ranked AS (SELECT *, row_number() OVER
             (PARTITION BY lang ORDER BY total_tf DESC, term) AS rank
           FROM tf)
SELECT lang, CAST(rank AS BIGINT) AS rank, term,
       CAST(total_tf AS BIGINT) AS total_tf
FROM ranked WHERE rank <= {k}
"""


def _split_of(hmod: np.ndarray) -> np.ndarray:
    return np.where(hmod < 98, "train", np.where(hmod < 99, "val", "test"))


def dataset_split(sf_dir: str):
    """Deterministic 98/1/1 train/val/test split by md5(doc_id) — the
    standard reproducible-split idiom for training corpora (hash the
    stable id, never row order, so the assignment survives repartition
    and incremental ingest). Output: per (split, lang) doc counts and
    char volume; the split column itself is a pure per-row map, so the
    only shuffle carries (split, lang) partials."""
    import hashlib

    from ray.data.aggregate import Sum

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        h = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
             for i in ids), dtype=np.int64, count=len(ids))
        df = pd.DataFrame({
            "split": _split_of(h),
            "lang": batch.column("lang").to_pylist(),
            "n_chars": batch.column("n_chars").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["split", "lang"], as_index=False).agg(
            n_docs_p=("n_chars", "size"), sum_chars_p=("n_chars", "sum"))
        return pa.table({"split": pa.array(g["split"], pa.string()),
                         "lang": pa.array(g["lang"], pa.string()),
                         "n_docs_p": int64_col(g["n_docs_p"]),
                         "sum_chars_p": int64_col(g["sum_chars_p"])})

    ds = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    partial = ds.map_batches(assign, batch_format="pyarrow")
    return partial.groupby(["split", "lang"]).aggregate(
        Sum("n_docs_p", alias_name="n_docs"),
        Sum("sum_chars_p", alias_name="sum_chars"))


def dataset_split_sql() -> str:
    return """
WITH h AS (
  SELECT lang, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 100 AS hh
  FROM documents)
SELECT CASE WHEN hh < 98 THEN 'train' WHEN hh < 99 THEN 'val'
            ELSE 'test' END AS split,
       lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM h GROUP BY 1, 2
"""


def doc_fingerprint_sql() -> str:
    return f"""
SELECT doc_id,
       CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(list_reduce(
                   list_transform(
                     [substr(text, i, 1) for i in generate_series(1, length(text))],
                     c -> CAST(ord(c) AS HUGEINT)),
                   (a, x) -> (a * {_FP_BASE} + x) % {(1 << 61) - 1}) AS BIGINT)
       END AS fingerprint
FROM documents
"""


# ---- approximate distinct-count sketch (HyperLogLog) ----

_HLL_P = 12                       # 4096 registers -> ~1.6% std error
_HLL_Q = 50                       # rank bits (mantissa-exact for log2)


class DistinctTermsHLLPartial(_SimpleTokenStage):
    """batch -> ONE row holding a 2^p-byte HyperLogLog register array
    (Flajolet et al. 2007) over the batch's distinct terms.

    The mergeable-sketch shape for counts that are too big to groupby:
    the shuffle carries one fixed-size (4 KiB) row per batch instead of
    one row per distinct term — at 100 TB the merge input is MBs where
    ``term_df`` would shuffle the whole vocabulary. Registers merge by
    elementwise max, so any tree/driver merge order is exact."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        texts = batch.column("text").to_pylist()
        ids = np.arange(len(texts), dtype=np.int64)
        _, _, _, info = self.analyzer.tokenize_batch(texts, ids)
        regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
        vocab = info["vocab"]
        if len(vocab):
            # md5 low 64 (little-endian) == DuckDB md5_number_lower: the
            # register construction is exactly SQL-replayable (see
            # distinct_terms_hll_registers)
            h = np.fromiter(
                (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:16],
                                "little")
                 for t in vocab), dtype=np.uint64, count=len(vocab))
            idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
            w = (h & np.uint64((1 << _HLL_Q) - 1)).astype(np.float64)
            # rank from the integer bit length (frexp exponent — exact
            # for w < 2^53): float log2 misrounds at w = 2^k - 1 for
            # k >= 49, where it returns k instead of k-1
            exp = np.frexp(np.maximum(w, 1))[1]
            rank = np.where(w > 0, _HLL_Q + 1 - exp,
                            _HLL_Q + 1).astype(np.uint8)
            np.maximum.at(regs, idx, rank)
        return pa.table({"registers": pa.array([regs.tobytes()], pa.binary())})


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    est = (0.7213 / (1.0 + 1.079 / m)) * m * m / np.sum(
        np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)          # linear-counting small range
    return float(est)


def _merged_hll_registers(sf_dir: str) -> np.ndarray:
    """Per-batch 4 KiB sketches; the final elementwise-max merge of the
    per-batch rows is a small driver reduce (num_batches x 4 KiB), NOT
    a materialization of data rows."""
    partial = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        DistinctTermsHLLPartial, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4))
    regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
    for b in partial.iter_batches(batch_format="pyarrow"):
        for buf in b.column("registers").to_pylist():
            np.maximum(regs, np.frombuffer(buf, dtype=np.uint8), out=regs)
    return regs


def distinct_terms_hll(sf_dir: str):
    """One-row (n_distinct_est, n_registers): approximate distinct-term
    count. Error bound vs the exact ``term_df`` count is asserted in
    tests."""
    regs = _merged_hll_registers(sf_dir)
    return pa.table({"n_distinct_est": int64_col([int(round(_hll_estimate(regs)))]),
                     "n_registers": int64_col([len(regs)])})


# ---- frequent-terms sketch (Misra-Gries heavy hitters) ----

_MG_K = 512


class TopTermsMGPartial(_SimpleTokenStage):
    """batch -> ONE row holding a k-entry Misra-Gries summary (terms,
    residual counts, total decrement) of the batch's term frequencies.

    The second mergeable-sketch family beside the HLL: the shuffle
    carries one bounded row per batch (k terms max) instead of the
    vocabulary, and summaries merge by count-sum + re-compression. The
    classic guarantee survives merging (Agarwal et al. 2012): for every
    term, true_tf - total_decrement <= est_tf <= true_tf, so any term
    with true_tf > total_decrement is guaranteed present."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = np.arange(len(texts), dtype=np.int64)
        codes, _, tfs, info = self.analyzer.tokenize_batch(texts, ids)
        vocab = np.asarray(info["vocab"])
        if len(vocab) == 0:
            terms, counts, dec = [], np.empty(0, np.int64), 0
        else:
            counts = np.bincount(codes, weights=tfs.astype(np.float64),
                                 minlength=len(vocab)).astype(np.int64)
            terms, counts, dec = _mg_compress(vocab, counts, _MG_K)
        return pa.table({
            "terms": pa.array([list(terms)], pa.list_(pa.string())),
            "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
            "dec": int64_col([dec]),
        })


def _mg_compress(terms: np.ndarray, counts: np.ndarray, k: int):
    """Compress an exact (terms, counts) vector to <= k entries by the
    Misra-Gries rule: subtract the (k+1)-th largest count everywhere,
    keep what stays positive. Returns (terms, counts, decrement)."""
    if len(counts) <= k:
        return terms, counts, 0
    thr = int(np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1])
    keep = counts > thr
    return terms[keep], counts[keep] - thr, thr


def _mg_merged(sf_dir: str) -> tuple[dict, int]:
    """Merged Misra-Gries summary: (term -> est_tf, total decrement).
    The driver folds one bounded row per batch (like the HLL), never
    the vocabulary."""
    partial = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TopTermsMGPartial, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4))
    acc: dict[str, int] = {}
    total_dec = 0
    for b in partial.iter_batches(batch_format="pyarrow"):
        for terms, counts, dec in zip(b.column("terms").to_pylist(),
                                      b.column("counts").to_pylist(),
                                      b.column("dec").to_pylist()):
            total_dec += int(dec)
            for t, c in zip(terms, counts):
                acc[t] = acc.get(t, 0) + int(c)
            if len(acc) > 16 * _MG_K:
                ts = np.array(list(acc.keys()))
                cs = np.array(list(acc.values()), dtype=np.int64)
                ts, cs, d = _mg_compress(ts, cs, _MG_K)
                total_dec += int(d)
                acc = dict(zip(ts.tolist(), cs.tolist()))
    return acc, total_dec


def top_terms_sketch(sf_dir: str, k: int = 10):
    """(term, est_tf, err_bound) — approximate top-k corpus terms from
    merged per-batch Misra-Gries summaries; ``err_bound`` is the summed
    decrement: est_tf is exact to within it (one-sided:
    est <= true <= est + err_bound)."""
    acc, total_dec = _mg_merged(sf_dir)
    top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "term": pa.array([t for t, _ in top], pa.string()),
        "est_tf": int64_col([c for _, c in top]),
        "err_bound": int64_col([total_dec] * len(top)),
    })


def top_terms_sketch_violations(sf_dir: str):
    """(term, total_tf, est_tf) rows where the Misra-Gries guarantee is
    VIOLATED against exact per-term counts — expected (and oracled)
    EMPTY. The companion row that makes the sketch driver-checkable:
    ``top_terms_sketch`` itself is partitioning-dependent (which terms
    survive the summary depends on batch order), so its output has no
    SQL replay; the GUARANTEE does not depend on partitioning:

      - every summarized term: est <= true_tf <= est + err_bound
      - every term with true_tf > err_bound must be in the summary

    Both are checked here per term, joining the merged summary
    (broadcast, bounded at 16*k entries) against the exact counts from
    the pre-aggregated term_df shuffle — streaming, vocabulary never on
    the driver. Any violation emits a row and hash-mismatches the empty
    oracle, failing the correctness gate."""
    import ray

    acc, total_dec = _mg_merged(sf_dir)
    acc_ref = ray.put(acc)
    exact = term_df(sf_dir)

    def check(batch: pa.Table) -> pa.Table:
        a = ray.get(acc_ref) if not isinstance(acc_ref, dict) else acc_ref
        terms = batch.column("term").to_pylist()
        tt = batch.column("total_tf").to_numpy(zero_copy_only=False).astype(np.int64)
        est = np.fromiter((a.get(t, -1) for t in terms), np.int64, len(terms))
        in_s = est >= 0
        viol = (in_s & ((est > tt) | (tt > est + total_dec))) \
            | (~in_s & (tt > total_dec))
        idx = np.flatnonzero(viol)
        return pa.table({
            "term": pa.array([terms[i] for i in idx], pa.string()),
            "total_tf": int64_col(tt[idx]),
            "est_tf": int64_col(est[idx])})

    out = exact.map_batches(check, batch_format="pyarrow")
    # materialize with an EXPLICIT schema: the expected result is empty,
    # and an all-empty Dataset loses its column types on to_pandas,
    # which would fail the driver's schema compare for the wrong reason.
    # take_all is bounded by the violation count (0 when the sketch is
    # correct), not the vocabulary.
    rows = out.take_all()
    return pa.table({
        "term": pa.array([r["term"] for r in rows], pa.string()),
        "total_tf": int64_col(np.array([r["total_tf"] for r in rows],
                                       np.int64)),
        "est_tf": int64_col(np.array([r["est_tf"] for r in rows], np.int64))})


def top_terms_sketch_violations_sql() -> str:
    """The guarantee holds for any input and any partitioning, so the
    oracle is the empty set with the matching schema — a Ray-side
    violation row breaks the hash compare and fails the gate."""
    return """
SELECT CAST(NULL AS VARCHAR) AS term, CAST(NULL AS BIGINT) AS total_tf,
       CAST(NULL AS BIGINT) AS est_tf
WHERE FALSE
"""


def distinct_terms_hll_registers(sf_dir: str):
    """(register, rank) for every NONZERO HyperLogLog register — the
    integer-exact face of the sketch. The estimate is a pure float
    function of these registers (tested against the exact count in
    ``test_distinct_terms_hll_error_bound``); verifying the registers
    verifies the whole sketch construction bit-for-bit without putting
    a float harmonic mean through a hash compare."""
    regs = _merged_hll_registers(sf_dir)
    nz = np.flatnonzero(regs)
    return pa.table({"register": int64_col(nz),
                     "rank": int64_col(regs[nz].astype(np.int64))})


def distinct_terms_hll_registers_sql() -> str:
    """Replay: per distinct term, h = md5 low-64; register = high p bits;
    rank = q+1 - bit_length(low-q-bits of h) (q+1 when they are zero);
    per-register max. printf('%b') length is the integer-exact
    bit_length — no float log2 anywhere."""
    return f"""
WITH terms AS (
  SELECT DISTINCT unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
h AS (
  SELECT CAST(md5_number_lower(term) AS UHUGEINT) AS hv
  FROM terms WHERE term <> ''),
parts AS (
  SELECT CAST(hv // {1 << (64 - _HLL_P)}::UHUGEINT AS BIGINT) AS register,
         CAST(hv % {1 << _HLL_Q}::UHUGEINT AS BIGINT) AS w
  FROM h)
SELECT register,
       CAST(max(CASE WHEN w = 0 THEN {_HLL_Q + 1}
                     ELSE {_HLL_Q + 1} - length(printf('%b', w)) END)
            AS BIGINT) AS rank
FROM parts GROUP BY register
"""


# ---- Count-Min sketch (term-frequency point queries) ----

_CMS_D = 4                        # depth (independent hash rows)
_CMS_W = 1024                     # width (columns per row)
_CMS_PROBES = ["data", "join", "query", "row", "scan", "table",
               "value", "window", "zzznosuchterm"]


def _cms_col(j: int, term: str) -> int:
    """Column of ``term`` in sketch row ``j``: md5 low-64 of the
    row-salted term (bit-identical to DuckDB
    ``md5_number_lower(j || ':' || term)``) mod the sketch width."""
    import hashlib

    h = hashlib.md5(f"{j}:{term}".encode("utf-8")).digest()
    return int.from_bytes(h[8:16], "little") % _CMS_W


class TermCountsCMSPartial(_SimpleTokenStage):
    """batch -> ONE row holding a d x w Count-Min sketch (Cormode &
    Muthukrishnan 2005) of the batch's exact term frequencies.

    Third member of the mergeable-sketch family: HLL registers merge by
    elementwise max, Misra-Gries summaries by count-sum + re-compress,
    CMS cells by elementwise SUM. The sum is fully order-independent,
    so — unlike the MG summary — the merged sketch is bit-identical on
    any partitioning and the whole construction replays exactly in SQL
    (``term_counts_cms_cells``). The shuffle carries one fixed 32 KiB
    row per batch instead of the vocabulary. Point-estimate guarantee
    (one-sided, deterministic): for every term,
    ``true_tf <= est_tf = min_j cells[j][h_j(term)]`` — driver-verified
    per term against exact counts in ``term_counts_cms_violations``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = np.arange(len(texts), dtype=np.int64)
        codes, _, tfs, info = self.analyzer.tokenize_batch(texts, ids)
        cells = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        vocab = info["vocab"]
        if len(vocab):
            counts = np.bincount(codes, weights=tfs,
                                 minlength=len(vocab)).astype(np.int64)
            for j in range(_CMS_D):
                cols = np.fromiter((_cms_col(j, t) for t in vocab),
                                   dtype=np.int64, count=len(vocab))
                np.add.at(cells[j], cols, counts)
        return pa.table({"cells": pa.array([cells.tobytes()], pa.binary())})


def _merged_cms_cells(sf_dir: str) -> np.ndarray:
    """Summed d x w sketch; the driver folds one bounded 32 KiB row per
    batch (like the HLL merge), never the vocabulary."""
    partial = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TermCountsCMSPartial, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4))
    cells = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for b in partial.iter_batches(batch_format="pyarrow"):
        for buf in b.column("cells").to_pylist():
            cells += np.frombuffer(buf, dtype=np.int64).reshape(_CMS_D, _CMS_W)
    return cells


def term_counts_cms_cells(sf_dir: str):
    """(row, col, count) for every nonzero Count-Min cell — the
    integer-exact face of the sketch, hash-verified cell for cell
    against a SQL replay of the salted-md5 placement + exact sums."""
    cells = _merged_cms_cells(sf_dir)
    rows, cols = np.nonzero(cells)
    return pa.table({"row": int64_col(rows.astype(np.int64)),
                     "col": int64_col(cols.astype(np.int64)),
                     "count": int64_col(cells[rows, cols])})


def term_counts_cms_cells_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
ttf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS ttf
  FROM toks WHERE term <> '' GROUP BY term),
placed AS (
  SELECT j.j AS row,
         CAST(CAST(md5_number_lower(CAST(j.j AS VARCHAR) || ':' || term)
                   AS UHUGEINT) % {_CMS_W} AS BIGINT) AS col,
         ttf
  FROM ttf CROSS JOIN range(0, {_CMS_D}) j(j))
SELECT row, col, CAST(sum(ttf) AS BIGINT) AS count
FROM placed GROUP BY row, col
"""


def term_counts_cms(sf_dir: str):
    """(term, est_tf) point estimates for a fixed probe-term set —
    ``est = min_j cells[j][h_j(term)]``. Because the cells are exact
    integer sums, the estimates themselves are partitioning-independent
    and hash-verified against the SQL replay (the MG sketch can't say
    that — its summary depends on batch order; the CMS estimate does
    not)."""
    cells = _merged_cms_cells(sf_dir)
    ests = [int(min(cells[j][_cms_col(j, t)] for j in range(_CMS_D)))
            for t in _CMS_PROBES]
    return pa.table({"term": pa.array(_CMS_PROBES, pa.string()),
                     "est_tf": int64_col(np.array(ests, np.int64))})


def term_counts_cms_sql() -> str:
    probes = ", ".join(f"('{t}')" for t in _CMS_PROBES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
ttf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS ttf
  FROM toks WHERE term <> '' GROUP BY term),
placed AS (
  SELECT j.j AS row,
         CAST(CAST(md5_number_lower(CAST(j.j AS VARCHAR) || ':' || term)
                   AS UHUGEINT) % {_CMS_W} AS BIGINT) AS col,
         ttf
  FROM ttf CROSS JOIN range(0, {_CMS_D}) j(j)),
cells AS (
  SELECT row, col, CAST(sum(ttf) AS BIGINT) AS count
  FROM placed GROUP BY row, col),
probes(term) AS (VALUES {probes}),
probe_cells AS (
  SELECT p.term, j.j AS row,
         CAST(CAST(md5_number_lower(CAST(j.j AS VARCHAR) || ':' || p.term)
                   AS UHUGEINT) % {_CMS_W} AS BIGINT) AS col
  FROM probes p CROSS JOIN range(0, {_CMS_D}) j(j))
SELECT pc.term, CAST(min(COALESCE(c.count, 0)) AS BIGINT) AS est_tf
FROM probe_cells pc
LEFT JOIN cells c ON c.row = pc.row AND c.col = pc.col
GROUP BY pc.term
"""


def term_counts_cms_violations(sf_dir: str):
    """(term, total_tf, est_tf) rows where the CMS guarantee
    ``true_tf <= est_tf`` is VIOLATED against exact per-term counts —
    expected (and oracled) EMPTY. Checked streaming over the
    pre-aggregated ``term_df`` shuffle with the 32 KiB merged sketch
    broadcast; the vocabulary never lands on the driver."""
    import ray

    cells = _merged_cms_cells(sf_dir)
    cells_ref = ray.put(cells)

    def check(batch: pa.Table) -> pa.Table:
        c = ray.get(cells_ref)
        terms = batch.column("term").to_pylist()
        tt = batch.column("total_tf").to_numpy(
            zero_copy_only=False).astype(np.int64)
        est = np.fromiter(
            (min(c[j][_cms_col(j, t)] for j in range(_CMS_D)) for t in terms),
            dtype=np.int64, count=len(terms))
        idx = np.flatnonzero(est < tt)
        return pa.table({
            "term": pa.array([terms[i] for i in idx], pa.string()),
            "total_tf": int64_col(tt[idx]),
            "est_tf": int64_col(est[idx])})

    rows = term_df(sf_dir).map_batches(
        check, batch_format="pyarrow").take_all()
    # explicit schema: the expected result is empty (see the MG
    # violations row for why an all-empty Dataset can't be returned raw)
    return pa.table({
        "term": pa.array([r["term"] for r in rows], pa.string()),
        "total_tf": int64_col(np.array([r["total_tf"] for r in rows],
                                       np.int64)),
        "est_tf": int64_col(np.array([r["est_tf"] for r in rows], np.int64))})


def term_counts_cms_violations_sql() -> str:
    """The one-sided bound holds for any input and any partitioning, so
    the oracle is the empty set with the matching schema."""
    return """
SELECT CAST(NULL AS VARCHAR) AS term, CAST(NULL AS BIGINT) AS total_tf,
       CAST(NULL AS BIGINT) AS est_tf
WHERE FALSE
"""


# ---------------- text cleaning (normalization for training data) ----

_WS_RUN = None    # compiled per process, not per batch


def _clean_one(text: str) -> str:
    """Canonical whitespace normalization: horizontal-whitespace runs
    collapse to one space, 3+ newlines squeeze to a paragraph break,
    spaces around newlines drop, leading/trailing whitespace trims.
    Every regex uses EXPLICIT ASCII classes so python re and DuckDB's
    RE2 agree byte-for-byte (\\s differs between the two engines)."""
    global _WS_RUN
    if _WS_RUN is None:
        import re

        _WS_RUN = (re.compile(r"[ \t\f\v]+"), re.compile(r"[ ]*\n[ ]*"),
                   re.compile(r"\n{3,}"))
    h, nl, para = _WS_RUN
    t = h.sub(" ", text)
    t = nl.sub("\n", t)
    t = para.sub("\n\n", t)
    return t.strip(" \t\f\v\n")


class CleanTextStage:
    """map_batches: (doc_id, text) -> (doc_id, text_clean,
    n_chars_clean, n_chars_removed). Pure per-row C-regex work — no
    shuffle, embarrassingly parallel at any corpus size."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        clean = [_clean_one(t) for t in texts]
        n_clean = np.fromiter((len(c) for c in clean), np.int64, len(clean))
        n_orig = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text_clean": pa.array(clean, pa.string()),
            "n_chars_clean": int64_col(n_clean),
            "n_chars_removed": int64_col(n_orig - n_clean),
        })


def clean_text(sf_dir: str):
    """Whitespace-canonicalized text + removal accounting, per document."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        CleanTextStage, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 4))


def clean_text_sql() -> str:
    """DuckDB replay with the same explicit ASCII whitespace classes;
    trim() gets the same strip set as python's str.strip arguments."""
    return r"""
WITH c AS (
  SELECT doc_id, length(text) AS n_orig,
         trim(regexp_replace(regexp_replace(regexp_replace(
                text, '[ \t\f\v]+', ' ', 'g'),
                ' *\n *', chr(10), 'g'),
                '\n{3,}', chr(10) || chr(10), 'g'),
              ' ' || chr(9) || chr(12) || chr(11) || chr(10)) AS text_clean
  FROM documents)
SELECT doc_id, text_clean,
       CAST(length(text_clean) AS BIGINT) AS n_chars_clean,
       CAST(n_orig - length(text_clean) AS BIGINT) AS n_chars_removed
FROM c
"""


# ---------------- PII redaction (training-data scrubbing) ----------

# Explicit ASCII classes only, no alternation whose branches could pick
# different winners under python re (leftmost-first backtracking) vs
# DuckDB RE2 (leftmost-longest) — greedy character-class repetitions
# agree byte-for-byte between the two engines.
_PII_PATTERNS = (
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<PHONE>", r"\+1 [0-9]{3}-[0-9]{3}-[0-9]{4}"),
    ("<IP>", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
)


class PiiScrubStage:
    """map_batches: (doc_id, text) -> (doc_id, text_redacted, n_emails,
    n_phones, n_ipv4). Redacts emails, ``+1`` phone numbers and IPv4
    addresses with typed placeholders and counts each per document.
    Counts come from the ORIGINAL text; replacements run in the fixed
    order email -> phone -> ip (placeholders contain no digits or dots,
    so later passes never re-match earlier redactions). Pure per-row
    C-regex work — no shuffle, embarrassingly parallel at any scale."""

    def __init__(self):
        import re

        self.pats = [(rep, re.compile(pat)) for rep, pat in _PII_PATTERNS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        counts = np.zeros((len(self.pats), n), dtype=np.int64)
        red = []
        for i, t in enumerate(texts):
            for j, (rep, pat) in enumerate(self.pats):
                t, counts[j, i] = pat.subn(rep, t)
            red.append(t)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text_redacted": pa.array(red, pa.string()),
            "n_emails": int64_col(counts[0]),
            "n_phones": int64_col(counts[1]),
            "n_ipv4": int64_col(counts[2]),
        })


class _PiiAugmentStage:
    """TEST-HARNESS pre-stage: the synthetic corpus contains no PII, so
    the registry row appends deterministic doc_id-derived PII (email on
    doc_id%3==0, phone on %5==0, IPv4 on %7==0) before scrubbing —
    exactly mirrored in the oracle SQL, the same seeded-literal trick
    the ANN oracles use. Production callers run PiiScrubStage directly
    on their own text column; this stage exists so the driver compare
    actually exercises the detection regexes."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out = []
        for i, t in zip(ids.astype(np.int64), texts):
            i = int(i)
            if i % 3 == 0:
                tld = "com" if i % 2 == 0 else "org"
                t += f" contact user{i}@example.{tld}"
            if i % 5 == 0:
                t += (f" call +1 {200 + i % 700}-{100 + i % 900}"
                      f"-{1000 + i % 9000}")
            if i % 7 == 0:
                t += (f" host {10 + i % 90}.{i % 256}"
                      f".{i * 7 % 256}.{i * 13 % 256}")
            out.append(t)  # always emitted, so row count is stable
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(out, pa.string())})


def pii_scrub(sf_dir: str):
    """Per-document PII redaction + detection counts over the documents
    table (with deterministic synthetic PII injected — see
    ``_PiiAugmentStage``)."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _PiiAugmentStage, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 4)).map_batches(
        PiiScrubStage, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 4))


def pii_scrub_sql() -> str:
    """DuckDB replay: identical augmentation arithmetic, identical
    regexes (RE2 and python re agree on these — see _PII_PATTERNS),
    identical email -> phone -> ip replace order; counts via
    regexp_extract_all on the pre-scrub text."""
    email, phone, ip = (p for _, p in _PII_PATTERNS)
    return rf"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id
         || '@example.' || CASE WHEN doc_id % 2 = 0 THEN 'com'
                                ELSE 'org' END
       ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' call +1 '
         || (200 + doc_id % 700) || '-' || (100 + doc_id % 900)
         || '-' || (1000 + doc_id % 9000)
       ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' host '
         || (10 + doc_id % 90) || '.' || (doc_id % 256)
         || '.' || (doc_id * 7 % 256) || '.' || (doc_id * 13 % 256)
       ELSE '' END AS text
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
      '{email}', '<EMAIL>', 'g'),
      '{phone}', '<PHONE>', 'g'),
      '{ip}', '<IP>', 'g') AS text_redacted,
  CAST(length(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
  CAST(length(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
  CAST(length(regexp_extract_all(text, '{ip}')) AS BIGINT) AS n_ipv4
FROM aug
"""


# ---------------- deterministic per-group sampling ----------------


class _SampleHashPartial:
    """map_batches: keep only each batch's LOCAL best-n rows per lang
    by (md5(doc_id), doc_id) order, so the lang shuffle carries at most
    n x n_batches rows instead of the corpus. md5 of the DECIMAL doc_id
    string is the SQL-replayable deterministic 'random' order."""

    def __init__(self, n: int):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
        df = pd.DataFrame({"lang": batch.column("lang").to_pylist(),
                           "doc_id": ids.astype(np.int64), "h": h})
        df = df.sort_values(["lang", "h", "doc_id"]).groupby(
            "lang", as_index=False).head(self.n)
        return pa.table({"lang": pa.array(df["lang"].tolist(), pa.string()),
                         "doc_id": int64_col(df["doc_id"].to_numpy()),
                         "h": pa.array(df["h"].tolist(), pa.string())})


def _make_sample_final(n: int):
    def sample_final(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["h", "doc_id"]).head(n)
        return pa.table({
            "lang": pa.array(df["lang"].tolist(), pa.string()),
            "doc_id": int64_col(df["doc_id"].to_numpy(np.int64)),
            "sample_rank": int64_col(np.arange(1, len(df) + 1)),
        })

    sample_final.__name__ = "sample_final"
    return sample_final


def sample_per_group(sf_dir: str, n: int = 20):
    """(lang, doc_id, sample_rank) — a deterministic 'random' sample of
    ``n`` documents PER LANGUAGE (the balanced-subset op a training-data
    pipeline uses to downsample dominant groups).

    Order within a group is md5(doc_id) — uniform, seedless,
    reproducible on any cluster shape, and exactly replayable in SQL.
    Shape: per-batch local top-n prune BEFORE the one lang groupby, so
    the shuffle moves O(n x batches) rows, never the corpus."""
    partial = read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        _SampleHashPartial(n), batch_format="pyarrow", batch_size=65536)
    return partial.groupby("lang").map_groups(
        _make_sample_final(n), batch_format="pandas")


def sample_per_group_sql(n: int = 20) -> str:
    return f"""
WITH ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS sample_rank
  FROM documents)
SELECT lang, doc_id, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= {n}
"""


# ---------------- per-doc TF-IDF keywords ----------------


_TFIDF_TAGGED_SCHEMA = pa.schema([
    ("k1", pa.int64()), ("src", pa.int64()), ("term", pa.string()),
    ("doc_id", pa.int64()), ("tf", pa.int64()), ("tfidf_bp", pa.int64()),
])


class _TfidfScoreOrTag(_SimpleTokenStage):
    """Tokenize + attach idf WITHOUT co-locating a hot term's rows.

    Head terms (df >= head_df) are scored inline from a broadcast
    term->idf dict (``ray.put`` once, one plasma copy per node, read in
    every task — the same df>=1024 treatment the query path gives hot
    postings); their rows leave this stage already scored (src=2),
    spread by doc so NO downstream group ever holds a hot term's full
    row set. Cold rows (src=0) are tagged with a term-hash gkey for the
    bounded cold co-group. The broadcast head is small by construction:
    at most total_rows / head_df entries (the Zipf head)."""

    def __init__(self, head_ref, n_docs: int, dparts: int, n_groups: int):
        super().__init__()
        import math

        import ray

        head = ray.get(head_ref) if not isinstance(head_ref, dict) else head_ref
        self.idf = {t: math.log(n_docs / int(d)) for t, d in head.items()}
        self.dparts = dparts
        self.n_groups = n_groups

    def __call__(self, batch: pa.Table) -> pa.Table:
        from zlib import crc32

        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        codes, docs, tfs, info = self.analyzer.tokenize_batch(texts, ids)
        if len(codes) == 0:
            return _TFIDF_TAGGED_SCHEMA.empty_table()
        vocab = info["vocab"]
        # per-UNIQUE-term work (vocabulary-level, not row-level)
        vidf = np.fromiter((self.idf.get(t, 0.0) for t in vocab),
                           np.float64, len(vocab))
        vgk = np.fromiter((crc32(t.encode()) % self.n_groups for t in vocab),
                          np.int64, len(vocab))
        idf = vidf[codes]
        hot = idf != 0.0
        terms = np.asarray(vocab, dtype=object)[codes]
        score = np.zeros(len(codes), dtype=np.int64)
        score[hot] = bp(tfs[hot].astype(np.float64) * idf[hot])
        k1 = np.where(hot, self.n_groups + (docs % (8 * self.dparts)),
                      vgk[codes])
        return pa.table({"k1": int64_col(k1),
                         "src": int64_col(np.where(hot, 2, 0)),
                         "term": pa.array(terms, pa.string()),
                         "doc_id": int64_col(docs),
                         "tf": int64_col(tfs),
                         "tfidf_bp": int64_col(score)},
                        schema=_TFIDF_TAGGED_SCHEMA)


def _make_tfidf_score_cold(n_docs: int, dparts: int):
    def tfidf_score_cold(df: pd.DataFrame) -> pa.Table:
        """k1 co-group body. Hot groups (src=2, k1 spread by doc) pass
        through already scored. Cold groups join src=1 rows — (term,
        exact global df) from the partial-df aggregate, df carried in
        the tf column — against src=0 (doc, term, tf) rows of the same
        gkey. Max group size is bounded: cold terms have df < head_df,
        so no term contributes more than head_df rows — the
        stopword-scale concentration the old per-term co-group had is
        gone. idf via scalar math.log per DISTINCT term (np.log differs
        from libm by 1 ulp on some inputs — the same bit-parity rule
        bm25.idf documents)."""
        import math

        rows = df[df["src"] == 0]
        if len(rows):
            dfe = df[df["src"] == 1]
            idf_map = {t: math.log(n_docs / int(d))
                       for t, d in zip(dfe["term"], dfe["tf"])}
            idf = rows["term"].map(idf_map).to_numpy(np.float64)
            score = bp(rows["tf"].to_numpy(np.float64) * idf)
            terms = rows["term"].tolist()
            did = rows["doc_id"].to_numpy(np.int64)
        else:                                   # hot pass-through group
            hot = df[df["src"] == 2]
            score = hot["tfidf_bp"].to_numpy(np.int64)
            terms = hot["term"].tolist()
            did = hot["doc_id"].to_numpy(np.int64)
        return pa.table({"dkey": int64_col(did % dparts),
                         "doc_id": int64_col(did),
                         "term": pa.array(terms, pa.string()),
                         "tfidf_bp": int64_col(score)})

    tfidf_score_cold.__name__ = "tfidf_score_cold"
    return tfidf_score_cold


def _make_tfidf_topk_group(k: int):
    def tfidf_topk_group(df: pd.DataFrame) -> pa.Table:
        """Doc co-group: per-doc top-k by (bp desc, term asc) + rank."""
        df = df.sort_values(["doc_id", "tfidf_bp", "term"],
                            ascending=[True, False, True])
        top = df.groupby("doc_id").head(k)
        rank = top.groupby("doc_id").cumcount().to_numpy() + 1
        return pa.table({"doc_id": int64_col(top["doc_id"].to_numpy(np.int64)),
                         "rank": int64_col(rank),
                         "term": pa.array(top["term"].tolist(), pa.string()),
                         "tfidf_bp": int64_col(top["tfidf_bp"].to_numpy(np.int64))})

    tfidf_topk_group.__name__ = "tfidf_topk_group"
    return tfidf_topk_group


def tfidf_keywords(sf_dir: str, k: int = 5, head_df: int = 1024,
                   n_groups: int = 256, dparts: int = 64):
    """(doc_id, rank, term, tfidf_bp) — top-k TF-IDF keywords per doc
    (keyword extraction / doc summarization for training-data curation).

    Skew-safe shape (r4 — replaces the hot-term co-group the r3 review
    flagged): exact global df comes from a PRE-AGGREGATED partial
    shuffle (one (term, df_p) row per block — the term_df shape), whose
    vocabulary-scale result is split at ``head_df``:

    - head terms (df >= head_df, at most rows/head_df of the vocabulary)
      broadcast as a term->df dict; their rows are scored INLINE in the
      tokenize stage and spread by doc — a stopword-scale term never
      co-locates;
    - cold terms join rows<->df in a gkey co-group whose max group is
      bounded by rows_cold/n_groups + vocab/n_groups + head_df slack
      (measured at sf0.1, defaults: max group ~180k rows / ~8 MB vs the
      old shape's ~1.9M-row hot bucket).

    Then one doc-bucket groupby takes each doc's top-k. score =
    bp(tf * ln(N/df)) with scalar libm ln per distinct term in every
    path — bit-identical to the SQL oracle. N from parquet metadata."""
    import ray
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    # pass 1: exact df, pre-aggregated per block; the result is
    # vocabulary-scale (one row per term) — materializing it is the
    # documented bounded exception, NOT a corpus materialization
    dfs = ds.map_batches(TermDFPartial, batch_format="pyarrow",
                         batch_size=512, concurrency=(1, 4)) \
            .groupby("term").aggregate(Sum("df_p", alias_name="df")) \
            .materialize()

    def to_entry(batch: pa.Table) -> pa.Table:
        from zlib import crc32

        terms = batch.column("term").to_pylist()
        d = batch.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        cold = d < head_df
        terms = np.asarray(terms, dtype=object)[cold]
        gk = np.fromiter((crc32(t.encode()) % n_groups for t in terms),
                         np.int64, len(terms))
        z = np.zeros(len(terms), np.int64)
        return pa.table({"k1": int64_col(gk), "src": int64_col(z + 1),
                         "term": pa.array(terms, pa.string()),
                         "doc_id": int64_col(z), "tf": int64_col(d[cold]),
                         "tfidf_bp": int64_col(z)}, schema=_TFIDF_TAGGED_SCHEMA)

    cold_entries = dfs.map_batches(to_entry, batch_format="pyarrow")
    head = {r["term"]: int(r["df"])
            for b in dfs.iter_batches(batch_format="pandas")
            for r in b[b["df"] >= head_df].to_dict("records")}
    head_ref = ray.put(head)
    # pass 2: tokenize once more, score head rows inline, tag cold rows
    tagged = ds.map_batches(
        _TfidfScoreOrTag, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4),
        fn_constructor_args=(head_ref, n_docs, dparts, n_groups))
    scored = cold_entries.union(tagged).groupby("k1").map_groups(
        _make_tfidf_score_cold(n_docs, dparts), batch_format="pandas")
    return scored.groupby("dkey").map_groups(
        _make_tfidf_topk_group(k), batch_format="pandas")


def tfidf_keywords_sql(k: int = 5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
       GROUP BY doc_id, term),
dfv AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents),
sc AS (
  SELECT tf.doc_id, tf.term,
         CAST(floor(tf.tf * ln(n.nn / dfv.df) * 10000 + 0.5) AS BIGINT)
           AS tfidf_bp
  FROM tf JOIN dfv ON dfv.term = tf.term CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_bp DESC, term ASC) AS rnk
  FROM sc)
SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, tfidf_bp
FROM ranked WHERE rnk <= {k}
"""


# ---------------- training-mixture sampling / packing / sharding ----
#
# The three output-side ops of a training-data pipeline: weight the
# mixture, pack documents into context windows, and lay the result out
# as deterministically shuffled shards. All three key on md5 of the
# stable doc_id (never row order), so every assignment is reproducible
# on any cluster shape and exactly replayable in SQL.


def _md5mod(ids: np.ndarray, salt: str, mod: int) -> np.ndarray:
    """md5('<salt><decimal id>') first-8-hex as int64 % mod — the
    shared SQL-replayable uniform hash (matches DuckDB
    ``CAST(('0x' || substr(md5('<salt>' || CAST(doc_id AS VARCHAR)),
    1, 8)) AS BIGINT) % mod``)."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(f"{salt}{int(i)}".encode()).hexdigest()[:8], 16)
         % mod for i in ids), dtype=np.int64, count=len(ids))


class _MixtureFilter:
    """map_batches filter: keep doc iff md5('mix:'||doc_id)%1000 <
    threshold(source), threshold = 200 + md5('w:'||source)%601 — a
    per-source keep-rate in [20%, 80%) derived from the source NAME, so
    the mixture recipe needs no side table and no shuffle. Pure
    per-row arithmetic: the op is embarrassingly parallel at any corpus
    size (the 100-TB-safe way to downweight a dominant source is a
    hash threshold, not a count-then-sample pass). Per-source
    thresholds are memoized per actor."""

    def __init__(self):
        self._thresh: dict[str, int] = {}

    def _t(self, source: str) -> int:
        import hashlib

        t = self._thresh.get(source)
        if t is None:
            t = 200 + int(hashlib.md5(
                f"w:{source}".encode()).hexdigest()[:8], 16) % 601
            self._thresh[source] = t
        return t

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = batch.column("source").to_pylist()
        h = _md5mod(ids, "mix:", 1000)
        th = np.fromiter((self._t(s) for s in src), dtype=np.int64,
                         count=len(src))
        return batch.filter(pa.array(h < th))


def dataset_mixture(sf_dir: str):
    """(doc_id, source, lang) — the documents kept by a deterministic
    per-source mixture weighting (hash-threshold subsampling)."""
    return read(sf_dir, "documents", ["doc_id", "source", "lang"]).map_batches(
        _MixtureFilter, batch_format="pyarrow", batch_size=65536,
        concurrency=(1, 4))


def dataset_mixture_sql() -> str:
    return """
SELECT doc_id, source, lang FROM documents
WHERE CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 1000
    < 200 + CAST(('0x' || substr(md5('w:' || source), 1, 8))
                 AS BIGINT) % 601
"""


class _PackTokenCount:
    """map_batches: (doc_id, part, n_tokens) — whitespace token budget
    plus the md5 pack-partition key. Text is dropped HERE, so the one
    shuffle that follows carries three int64s per document, never the
    corpus."""

    def __init__(self, nparts: int):
        import re

        self.ws = re.compile(r"\S+")
        self.nparts = nparts

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = [len(self.ws.findall(t))
             for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": int64_col(ids),
                         "part": int64_col(_md5mod(ids, "pack:", self.nparts)),
                         "n_tokens": int64_col(n)})


def _make_pack_group(seq_len: int):
    def pack_group(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values("doc_id")
        n = df["n_tokens"].to_numpy(np.int64)
        off = np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table({
            "doc_id": int64_col(df["doc_id"].to_numpy(np.int64)),
            "part": int64_col(df["part"].to_numpy(np.int64)),
            "n_tokens": int64_col(n),
            "tok_offset": int64_col(off),
            "seq_start": int64_col(off // seq_len),
            "seq_end": int64_col((off + np.maximum(n, 1) - 1) // seq_len),
        })

    pack_group.__name__ = "pack_group"
    return pack_group


def pack_sequences(sf_dir: str, seq_len: int = 2048, nparts: int = 64):
    """Context-window packing plan: concatenate each pack-partition's
    documents in doc_id order and split the token stream every
    ``seq_len`` tokens (the GPT-style pack-then-chunk layout). Output
    per doc: its partition, token offset in the partition stream, and
    the first/last training sequence it lands in.

    Shape: one metadata-only hash shuffle (three int64s per doc — the
    text NEVER moves), then a vectorized cumsum per partition. A
    partition holds corpus/nparts rows of 24-byte metadata; size
    ``nparts`` so that stays in one task's heap (at 100 TB / ~1e11
    docs, nparts=4096 puts ~600 MB of metadata per group — raise it
    with corpus size; the cumsum itself is O(rows))."""
    counted = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _PackTokenCount, fn_constructor_args=(nparts,),
        batch_format="pyarrow", batch_size=8192, concurrency=(1, 4))
    return counted.groupby("part").map_groups(
        _make_pack_group(seq_len), batch_format="pandas")


def pack_sequences_sql(seq_len: int = 2048, nparts: int = 64) -> str:
    return f"""
WITH counted AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {nparts} AS part,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents),
packed AS (
  SELECT doc_id, part, n_tokens,
         -- window SUM over BIGINT yields HUGEINT, which fetchdf()
         -- floats; cast back so the compare sees int64 on both sides
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY part ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS tok_offset
  FROM counted)
SELECT doc_id, part, n_tokens, tok_offset,
       CAST(tok_offset // {seq_len} AS BIGINT) AS seq_start,
       CAST((tok_offset + greatest(n_tokens, 1) - 1) // {seq_len} AS BIGINT)
         AS seq_end
FROM packed
"""


class _ShardAssign:
    """map_batches: (doc_id, shard, h) — 60-bit md5 prefix as the
    shuffle order key (int64-safe in both numpy and DuckDB's
    hex-literal cast; ties broken by doc_id so collisions stay
    deterministic)."""

    def __init__(self, nshards: int):
        self.nshards = nshards

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = np.fromiter(
            (int(hashlib.md5(f"shuf:{int(i)}".encode()).hexdigest()[:15], 16)
             for i in ids), dtype=np.int64, count=len(ids))
        return pa.table({"doc_id": int64_col(ids),
                         "shard": int64_col(h % self.nshards),
                         "h": int64_col(h)})


def _shard_rank_group(df: pd.DataFrame) -> pa.Table:
    df = df.sort_values(["h", "doc_id"])
    return pa.table({
        "doc_id": int64_col(df["doc_id"].to_numpy(np.int64)),
        "shard": int64_col(df["shard"].to_numpy(np.int64)),
        "pos": int64_col(np.arange(1, len(df) + 1)),
    })


def shard_shuffle(sf_dir: str, nshards: int = 32):
    """(doc_id, shard, pos) — the deterministic global-shuffle layout
    for training output: every document gets a shard (md5 % nshards)
    and a position within the shard (rank by the md5 order key), so a
    writer can emit shuffled, evenly-sized training shards without a
    random_shuffle of the corpus.

    Shape: one metadata-only shuffle of (doc_id, shard, h) int64
    triples — text never moves; the actual payload write joins this
    plan back by doc_id (or runs the write inside the same map_groups).
    Per-shard rank needs the shard's rows co-located: one group =
    corpus/nshards 24-byte rows, so scale nshards with the corpus the
    same way pack_sequences scales nparts."""
    assigned = read(sf_dir, "documents", ["doc_id"]).map_batches(
        _ShardAssign, fn_constructor_args=(nshards,),
        batch_format="pyarrow", batch_size=65536, concurrency=(1, 4))
    return assigned.groupby("shard").map_groups(
        _shard_rank_group, batch_format="pandas")


def shard_shuffle_sql(nshards: int = 32) -> str:
    return f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents)
SELECT doc_id, CAST(h % {nshards} AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % {nshards}
                               ORDER BY h, doc_id) AS BIGINT) AS pos
FROM h
"""


# ---------------- unigram-LM log-probability scoring ----------------
#
# Perplexity-style quality scoring: score each document by the mean
# log-probability of its tokens under the corpus's own unigram language
# model (p(t) = total_tf(t) / T). Low scorers are the "surprising"
# documents — gibberish, boilerplate-free noise, wrong-language
# fragments — the score modern training-data pipelines threshold on.


_ULP_TAGGED_SCHEMA = pa.schema([
    ("k1", pa.int64()), ("src", pa.int64()), ("term", pa.string()),
    ("doc_id", pa.int64()), ("tf", pa.int64()), ("lp_bp", pa.int64()),
])


class _UnigramScoreOrTag(_SimpleTokenStage):
    """Tokenize + score WITHOUT co-locating a hot term's rows.

    Same skew-safe split as ``_TfidfScoreOrTag``, but leaner: because
    the final per-doc reduction is an associative integer SUM (not a
    top-k), head-term contributions (ttf >= head_tf, looked up in the
    broadcast term->logp dict) are pre-summed per DOC inside this very
    stage — one (doc, tf_sum, lp_bp_sum) row per doc per batch reaches
    the shuffle for the entire hot mass, which by Zipf is most of the
    token volume. Only cold rows (src=0) carry terms into the bounded
    gkey co-group. NaN is the cold sentinel (0.0 is a legal logp when
    one term IS the corpus)."""

    def __init__(self, head_ref, total_tokens: int, dparts: int,
                 n_groups: int):
        super().__init__()
        import math

        import ray

        head = ray.get(head_ref) if not isinstance(head_ref, dict) else head_ref
        T = float(total_tokens)
        self.logp = {t: math.log(int(c) / T) for t, c in head.items()}
        self.dparts = dparts
        self.n_groups = n_groups

    def __call__(self, batch: pa.Table) -> pa.Table:
        from zlib import crc32

        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        codes, docs, tfs, info = self.analyzer.tokenize_batch(texts, ids)
        if len(codes) == 0:
            return _ULP_TAGGED_SCHEMA.empty_table()
        vocab = info["vocab"]
        vlp = np.fromiter((self.logp.get(t, np.nan) for t in vocab),
                          np.float64, len(vocab))
        vgk = np.fromiter((crc32(t.encode()) % self.n_groups for t in vocab),
                          np.int64, len(vocab))
        lp = vlp[codes]
        hot = ~np.isnan(lp)
        did = docs.astype(np.int64)        # tokenize_batch maps to real ids
        out = {"k1": [], "src": [], "term": [], "doc_id": [], "tf": [],
               "lp_bp": []}
        if hot.any():
            # pre-sum the hot mass per doc: bp per (doc,term) row FIRST
            # (the int contract), then exact integer sums
            hb = bp(tfs[hot].astype(np.float64) * lp[hot])
            hd = did[hot]
            uniq, inv = np.unique(hd, return_inverse=True)
            tf_sum = np.bincount(inv, weights=tfs[hot]).astype(np.int64)
            bp_sum = np.bincount(inv, weights=hb).astype(np.int64)
            out["k1"].append(self.n_groups + uniq % (8 * self.dparts))
            out["src"].append(np.full(len(uniq), 2, np.int64))
            out["term"].append(np.full(len(uniq), "", object))
            out["doc_id"].append(uniq)
            out["tf"].append(tf_sum)
            out["lp_bp"].append(bp_sum)
        cold = ~hot
        if cold.any():
            terms = np.asarray(vocab, dtype=object)[codes[cold]]
            out["k1"].append(vgk[codes[cold]])
            out["src"].append(np.zeros(cold.sum(), np.int64))
            out["term"].append(terms)
            out["doc_id"].append(did[cold])
            out["tf"].append(tfs[cold].astype(np.int64))
            out["lp_bp"].append(np.zeros(cold.sum(), np.int64))
        return pa.table(
            {"k1": int64_col(np.concatenate(out["k1"])),
             "src": int64_col(np.concatenate(out["src"])),
             "term": pa.array(np.concatenate(out["term"]), pa.string()),
             "doc_id": int64_col(np.concatenate(out["doc_id"])),
             "tf": int64_col(np.concatenate(out["tf"])),
             "lp_bp": int64_col(np.concatenate(out["lp_bp"]))},
            schema=_ULP_TAGGED_SCHEMA)


def _make_ulp_score_cold(total_tokens: int):
    def ulp_score_cold(df: pd.DataFrame) -> pa.Table:
        """k1 co-group body: join cold rows against (term, ttf) entries
        of the same gkey, score, pre-sum per doc. Hot groups (src=2)
        pass through already summed. Max cold group is bounded: every
        cold term has ttf < head_tf, so no term contributes more than
        head_tf rows. math.log per DISTINCT term (libm bit-parity rule,
        see bm25.idf)."""
        import math

        T = float(total_tokens)
        rows = df[df["src"] == 0]
        if len(rows):
            ent = df[df["src"] == 1]
            lp_map = {t: math.log(int(c) / T)
                      for t, c in zip(ent["term"], ent["tf"])}
            lp = rows["term"].map(lp_map).to_numpy(np.float64)
            lb = bp(rows["tf"].to_numpy(np.float64) * lp)
            g = pd.DataFrame({"doc_id": rows["doc_id"].to_numpy(np.int64),
                              "tf": rows["tf"].to_numpy(np.int64),
                              "lp_bp": lb}).groupby("doc_id", as_index=False).sum()
            return pa.table({"doc_id": int64_col(g["doc_id"].to_numpy()),
                             "tf": int64_col(g["tf"].to_numpy()),
                             "lp_bp": int64_col(g["lp_bp"].to_numpy())})
        hot = df[df["src"] == 2]
        return pa.table({"doc_id": int64_col(hot["doc_id"].to_numpy(np.int64)),
                         "tf": int64_col(hot["tf"].to_numpy(np.int64)),
                         "lp_bp": int64_col(hot["lp_bp"].to_numpy(np.int64))})

    ulp_score_cold.__name__ = "ulp_score_cold"
    return ulp_score_cold


def _ulp_add_avg(batch: pa.Table) -> pa.Table:
    lp = batch.column("logprob_bp").to_numpy(zero_copy_only=False).astype(np.float64)
    n = batch.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    avg = np.floor(lp / n + 0.5).astype(np.int64)
    return batch.append_column("avg_logprob_bp", int64_col(avg))


def unigram_logprob(sf_dir: str, head_tf: int = 4096, n_groups: int = 256,
                    dparts: int = 64):
    """(doc_id, n_tokens, logprob_bp, avg_logprob_bp) — each document
    scored by its tokens' log-probability under the corpus unigram LM
    (CCNet/Gopher-style perplexity filtering, reduced to the unigram
    model so the score is exactly SQL-replayable).

    logprob_bp = sum over (doc,term) of floor(tf*ln(ttf/T)*1e4 + 0.5)
    — bp'd per row BEFORE summing, so the distributed sum is exact
    integer arithmetic, order-independent on any cluster shape.

    Scale shape (the de-skewed tfidf_keywords pattern, leaner because
    the final reduce is a SUM): pass 1 pre-aggregated (term, ttf)
    partials; head terms (ttf >= head_tf — at most T/head_tf of the
    vocabulary, but most of the token MASS) broadcast as term->logp and
    scored inline with per-doc pre-summing, so the shuffle sees ONE row
    per doc per batch for the hot mass; cold terms co-group under a
    gkey whose max group is bounded by rows_cold/n_groups + head_tf
    slack. Final per-doc Sum is an Arrow aggregate over int64 partials."""
    import ray
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    tt = ds.map_batches(TermDFPartial, batch_format="pyarrow",
                        batch_size=512, concurrency=(1, 4)) \
           .groupby("term").aggregate(Sum("tf_p", alias_name="ttf")) \
           .materialize()                 # vocabulary-scale, bounded

    head: dict[str, int] = {}
    total_tokens = 0
    for b in tt.iter_batches(batch_format="pandas"):
        total_tokens += int(b["ttf"].sum())
        hb = b[b["ttf"] >= head_tf]
        head.update(zip(hb["term"], hb["ttf"].astype(int)))
    head_ref = ray.put(head)

    def to_entry(batch: pa.Table) -> pa.Table:
        from zlib import crc32

        terms = batch.column("term").to_pylist()
        c = batch.column("ttf").to_numpy(zero_copy_only=False).astype(np.int64)
        coldm = c < head_tf
        terms = np.asarray(terms, dtype=object)[coldm]
        gk = np.fromiter((crc32(t.encode()) % n_groups for t in terms),
                         np.int64, len(terms))
        z = np.zeros(len(terms), np.int64)
        return pa.table({"k1": int64_col(gk), "src": int64_col(z + 1),
                         "term": pa.array(terms, pa.string()),
                         "doc_id": int64_col(z), "tf": int64_col(c[coldm]),
                         "lp_bp": int64_col(z)}, schema=_ULP_TAGGED_SCHEMA)

    cold_entries = tt.map_batches(to_entry, batch_format="pyarrow")
    tagged = ds.map_batches(
        _UnigramScoreOrTag, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4),
        fn_constructor_args=(head_ref, total_tokens, dparts, n_groups))
    summed = cold_entries.union(tagged).groupby("k1").map_groups(
        _make_ulp_score_cold(total_tokens), batch_format="pandas")
    out = summed.groupby("doc_id").aggregate(
        Sum("tf", alias_name="n_tokens"),
        Sum("lp_bp", alias_name="logprob_bp"))
    return out.map_batches(_ulp_add_avg, batch_format="pyarrow")


def unigram_logprob_sql() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
       GROUP BY doc_id, term),
ttf AS (SELECT term, sum(tf) AS ttf FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(ttf) AS DOUBLE) AS T FROM ttf),
sc AS (
  SELECT tf.doc_id, tf.tf,
         CAST(floor(tf.tf * ln(ttf.ttf / tot.T) * 10000 + 0.5) AS BIGINT)
           AS lp_bp
  FROM tf JOIN ttf ON ttf.term = tf.term CROSS JOIN tot),
agg AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         CAST(sum(lp_bp) AS BIGINT) AS logprob_bp
  FROM sc GROUP BY doc_id)
SELECT doc_id, n_tokens, logprob_bp,
       CAST(floor(CAST(logprob_bp AS DOUBLE) / n_tokens + 0.5) AS BIGINT)
         AS avg_logprob_bp
FROM agg
"""


# ---------------- composed quality filter ----------------


QF_TOO_SHORT = 1        # n_chars < min_chars
QF_LOW_ALPHA = 2        # alpha ratio below threshold
QF_HIGH_DIGIT = 4       # digit-heavy (tables / logs / minified data)
QF_LOW_WS = 8           # too few separators (one giant token)
QF_DUP_LINES = 16       # Gopher duplicate-line fraction
QF_TOP_LINE = 32        # one line dominates (boilerplate), multi-line only


def _quality_filter_batch(batch: pa.Table) -> pa.Table:
    q = _quality_batch(batch)
    r = _repetition_batch(batch)
    n = q.column("n_chars").to_numpy(zero_copy_only=False)
    alpha = q.column("alpha_bp").to_numpy(zero_copy_only=False)
    digit = q.column("digit_bp").to_numpy(zero_copy_only=False)
    ws = q.column("ws_bp").to_numpy(zero_copy_only=False)
    n_lines = r.column("n_lines").to_numpy(zero_copy_only=False)
    dup = r.column("dup_line_bp").to_numpy(zero_copy_only=False)
    top = r.column("top_line_bp").to_numpy(zero_copy_only=False)
    mask = (np.where(n < 100, QF_TOO_SHORT, 0)
            | np.where(alpha < 8100, QF_LOW_ALPHA, 0)
            | np.where(digit > 2000, QF_HIGH_DIGIT, 0)
            | np.where(ws < 1700, QF_LOW_WS, 0)
            | np.where(dup > 3000, QF_DUP_LINES, 0)
            | np.where((n_lines >= 5) & (top > 5000), QF_TOP_LINE, 0))
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_chars": int64_col(n),
                     "reject_mask": int64_col(mask),
                     "keep": int64_col((mask == 0).astype(np.int64))})


def quality_filter(sf_dir: str):
    """(doc_id, n_chars, reject_mask, keep) — the composed training-data
    quality gate: every heuristic family this module computes (length,
    char-class ratios, Gopher line-repetition), folded into one keep
    decision with a reject-reason BITMASK so downstream curation can
    report per-filter drop rates from the same pass.

    Shape: a single vectorized map_batches over the corpus — zero
    shuffles, embarrassingly parallel at any scale; production callers
    chain ``.filter(keep == 1)`` (or feed ``reject_mask`` to a stats
    sink) without re-reading the text."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _quality_filter_batch, batch_format="pyarrow", batch_size=2048)


def quality_filter_sql() -> str:
    def ratio(cls: str) -> str:
        return (f"CAST(floor((CAST(length(regexp_replace(text, '[^{cls}]', '', 'g')) AS DOUBLE)"
                f" / CAST(greatest(length(text), 1) AS DOUBLE)) * 10000 + 0.5) AS BIGINT)")
    return f"""
WITH q AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         {ratio('A-Za-z')} AS alpha_bp,
         {ratio('0-9')} AS digit_bp,
         {ratio(chr(92) + 's')} AS ws_bp
  FROM documents),
lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
per_line AS (
  SELECT doc_id, line, count(*) AS c FROM lines WHERE line <> ''
  GROUP BY doc_id, line),
rep AS (
  SELECT doc_id, sum(c) AS n_lines,
         CAST(floor((sum(c) - count(*)) / CAST(sum(c) AS DOUBLE) * 10000 + 0.5)
              AS BIGINT) AS dup_line_bp,
         CAST(floor(max(c) / CAST(sum(c) AS DOUBLE) * 10000 + 0.5)
              AS BIGINT) AS top_line_bp
  FROM per_line GROUP BY doc_id),
m AS (
  SELECT q.doc_id, q.n_chars,
         (CASE WHEN q.n_chars < 100 THEN {QF_TOO_SHORT} ELSE 0 END
          | CASE WHEN q.alpha_bp < 8100 THEN {QF_LOW_ALPHA} ELSE 0 END
          | CASE WHEN q.digit_bp > 2000 THEN {QF_HIGH_DIGIT} ELSE 0 END
          | CASE WHEN q.ws_bp < 1700 THEN {QF_LOW_WS} ELSE 0 END
          | CASE WHEN coalesce(r.dup_line_bp, 0) > 3000
                 THEN {QF_DUP_LINES} ELSE 0 END
          | CASE WHEN coalesce(r.n_lines, 0) >= 5
                      AND coalesce(r.top_line_bp, 0) > 5000
                 THEN {QF_TOP_LINE} ELSE 0 END) AS reject_mask
  FROM q LEFT JOIN rep r USING (doc_id))
SELECT doc_id, n_chars, CAST(reject_mask AS BIGINT) AS reject_mask,
       CAST(CASE WHEN reject_mask = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m
"""


# ---------------- n-gram (bigram) statistics ----------------


class _BigramPartial:
    """Per-batch partial bigram counts: ordered tokens via one compiled
    findall per doc (the documents-table simple tokenization), adjacent
    pairs counted as factorized integer codes (np.unique). One (bigram, c_p) row
    per distinct bigram per batch reaches the shuffle — and because the
    partials are already unique per batch, no group downstream can
    exceed n_batches rows even for 'of the'-scale hot bigrams."""

    def __init__(self):
        import re

        self.tok = re.compile(r"[a-z0-9_]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for text in batch.column("text").to_pylist():
            toks.extend(self.tok.findall(text.lower()))
            toks.append("\n")                   # doc boundary sentinel
            # (newline can never be a [a-z0-9_]+ token; NUL would be
            # truncated by numpy's C-string compare and never match)
        if len(toks) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        # factorize once, count integer pair codes with np.unique, and
        # build strings only for the DISTINCT pairs (the per-occurrence
        # " ".join Counter this replaces measured ~equal at 500k docs —
        # regex tokenization dominates either way — but integer pair
        # counting keeps the kernel allocation-free per occurrence)
        codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
        sent = np.flatnonzero(uniq == "\n")[0]
        a, b = codes[:-1], codes[1:]
        mask = (a != sent) & (b != sent)
        v = len(uniq)
        pair_codes, counts = np.unique(
            a[mask].astype(np.int64) * v + b[mask], return_counts=True)
        bigrams = [f"{uniq[p // v]} {uniq[p % v]}" for p in pair_codes.tolist()]
        return pa.table({"bigram": pa.array(bigrams, pa.string()),
                         "c_p": int64_col(counts.astype(np.int64))})


def _make_bigram_topk(k: int):
    def bigram_topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["count", "bigram"],
                            ascending=[False, True]).head(k)
        return pa.table({
            "rank": int64_col(np.arange(1, len(df) + 1)),
            "bigram": pa.array(df["bigram"].tolist(), pa.string()),
            "count": int64_col(df["count"].to_numpy(np.int64))})

    bigram_topk.__name__ = "bigram_topk"
    return bigram_topk


def top_bigrams(sf_dir: str, k: int = 100):
    """(rank, bigram, count) — the corpus's k most frequent bigrams
    (collocation mining / n-gram-LM vocabulary selection), ties broken
    (count desc, bigram asc) so the cut is deterministic.

    Shape: per-batch partial counts -> bigram groupby Sum (each group
    holds at most n_batches partial rows) -> per-block LOCAL top-k
    (exact, since after the Sum every bigram is a single row) -> one
    bounded k x n_blocks final merge. The bigram-vocabulary-scale table
    is never collected; only k-sized prefixes move."""
    from ray.data.aggregate import Sum

    partial = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _BigramPartial, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4))
    summed = partial.groupby("bigram").aggregate(Sum("c_p", alias_name="count"))

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["count", "bigram"],
                                       ascending=[False, True]).head(k)
        return pa.table({"g": int64_col(np.zeros(len(df), np.int64)),
                         "bigram": pa.array(df["bigram"].tolist(), pa.string()),
                         "count": int64_col(df["count"].to_numpy(np.int64))})

    pruned = summed.map_batches(local_topk, batch_format="pyarrow")
    return pruned.groupby("g").map_groups(
        lambda df: _make_bigram_topk(k)(df), batch_format="pandas") \
        .select_columns(["rank", "bigram", "count"])


def top_bigrams_sql(k: int = 100) -> str:
    return f"""
WITH s AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                     x -> x <> '') AS t
  FROM documents),
b AS (
  SELECT unnest([t[i] || ' ' || t[i + 1]
                 for i in generate_series(1, len(t) - 1)]) AS bigram
  FROM s),
c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS count FROM b GROUP BY bigram),
r AS (SELECT *, row_number() OVER (ORDER BY count DESC, bigram ASC) AS rnk
      FROM c)
SELECT CAST(rnk AS BIGINT) AS rank, bigram, count FROM r WHERE rnk <= {k}
"""


# ---- BPE merge-round pair counts (tokenizer training primitive) -----


class _BpePairPartial:
    """Per-batch partial adjacent-character-pair counts over word
    OCCURRENCES — the counting step of one BPE merge round (Sennrich
    et al. 2016 "Neural Machine Translation of Rare Words with Subword
    Units"): the argmax pair is the next merge. Fully vectorized: the
    batch's words join into one ascii byte buffer on a separator,
    adjacent byte pairs become one int vector (hi*256+lo), np.unique
    counts them with separator-adjacent positions masked — no per-word
    Python loop. The [a-z0-9_] alphabet bounds DISTINCT pairs at ~1.4k,
    so every batch emits a tiny fixed-vocabulary partial and the
    downstream groupby is trivially skew-free at any corpus size."""

    def __init__(self):
        import re

        self.tok = re.compile(r"[a-z0-9_]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for text in batch.column("text").to_pylist():
            words.extend(self.tok.findall(text.lower()))
        if not words:
            return pa.table({"pair": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        buf = np.frombuffer("\n".join(words).encode("ascii"), np.uint8)
        a = buf[:-1].astype(np.int32)
        b = buf[1:].astype(np.int32)
        mask = (a != 10) & (b != 10)                # 10 = \n separator
        codes = a[mask] * 256 + b[mask]
        uniq, counts = np.unique(codes, return_counts=True)
        pairs = [chr(u >> 8) + chr(u & 255) for u in uniq.tolist()]
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "c_p": int64_col(counts.astype(np.int64))})


def bpe_pair_counts(sf_dir: str, k: int = 50):
    """(rank, pair, count) — the corpus's k most frequent adjacent
    character pairs inside words: one BPE merge-round count (rank 1 is
    the merge a BPE trainer would perform next). Ties (count desc,
    pair asc) are deterministic.

    Shape: vectorized per-batch partials (bounded at ~1.4k distinct
    pairs by the ascii alphabet) -> one tiny pair groupby -> one
    single-group rank task over <=1.4k rows. Nothing here scales with
    corpus size except the embarrassingly-parallel counting pass."""
    from ray.data.aggregate import Sum

    partial = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _BpePairPartial, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4))
    summed = partial.groupby("pair").aggregate(Sum("c_p", alias_name="count"))

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("g", int64_col(np.zeros(len(b), np.int64)))

    def rank_group(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["count", "pair"],
                            ascending=[False, True]).head(k)
        return pa.table({
            "rank": int64_col(np.arange(1, len(df) + 1)),
            "pair": pa.array(df["pair"].tolist(), pa.string()),
            "count": int64_col(df["count"].to_numpy(np.int64))})

    rank_group.__name__ = "bpe_rank_group"
    return summed.map_batches(tag, batch_format="pyarrow") \
        .groupby("g").map_groups(rank_group, batch_format="pandas") \
        .select_columns(["rank", "pair", "count"])


def bpe_pair_counts_sql(k: int = 50) -> str:
    return f"""
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word
  FROM documents),
p AS (
  SELECT unnest([substr(word, i, 2)
                 for i in generate_series(1, length(word) - 1)]) AS pair
  FROM w),
c AS (SELECT pair, CAST(count(*) AS BIGINT) AS count FROM p GROUP BY pair)
SELECT CAST(row_number() OVER (ORDER BY count DESC, pair) AS BIGINT)
         AS rank, pair, count
FROM c
QUALIFY rank <= {k}
"""


# ---- composed curation pipeline (flagship end-to-end flow) ----------


class _CurationScan:
    """THE single text pass of the composed curation flow: quality
    bitmask + mixture hash-threshold + whitespace token budget + pack
    partition, all computed in one ``map_batches`` over (doc_id,
    source, text) — text is dropped HERE, so everything downstream
    (anti-join, packing) shuffles three int64s + a source string per
    surviving doc, never the corpus."""

    def __init__(self, nparts: int, n_jparts: int):
        import re

        self.ws = re.compile(r"\S+")
        self.nparts = nparts
        self.n_jparts = n_jparts
        self._thresh: dict[str, int] = {}

    def _t(self, source: str) -> int:
        import hashlib

        t = self._thresh.get(source)
        if t is None:
            t = 200 + int(hashlib.md5(
                f"w:{source}".encode()).hexdigest()[:8], 16) % 601
            self._thresh[source] = t
        return t

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = _quality_filter_batch(batch)
        keep_q = q.column("keep").to_numpy(zero_copy_only=False) == 1
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        src = batch.column("source").to_pylist()
        th = np.fromiter((self._t(s) for s in src), dtype=np.int64,
                         count=len(src))
        keep_m = _md5mod(ids, "mix:", 1000) < th
        keep = keep_q & keep_m
        texts = batch.column("text").to_pylist()
        n_tok = np.fromiter(
            (len(self.ws.findall(t)) for t in texts), dtype=np.int64,
            count=len(texts))
        return pa.table({
            "jpart": int64_col(ids[keep] % self.n_jparts),
            "doc_id": int64_col(ids[keep]),
            "part": int64_col(_md5mod(ids[keep], "pack:", self.nparts)),
            "n_tokens": int64_col(n_tok[keep]),
            "side": int64_col(np.zeros(int(keep.sum()), np.int64))})


def curation_pipeline(sf_dir: str, seq_len: int = 2048,
                      nparts: int = 64, dedup_threshold_bp: int = 5000):
    """(doc_id, part, n_tokens, tok_offset, seq_start, seq_end) — the
    composed end-to-end curation flow a training-data pipeline runs
    before tokenization, as ONE streaming Ray Data job:

      quality gate AND mixture weighting AND token budget
        (one text pass, ``_CurationScan`` — text dropped at the scan)
      -> MinHash-LSH near-dup survivor anti-join
        (the ``dedup_apply`` co-located groupby(jpart) shape;
         drop-list is pair-scale, shuffle is metadata-only)
      -> GPT-style pack-then-chunk layout
        (one part groupby, vectorized cumsum per partition)

    This row exists to prove the operators COMPOSE as one lazy
    streaming flow — no intermediate materialization, one text scan
    for three filters, every exchange metadata-sized. The oracle
    nests the exact same generator SQL (quality keep, recursive-CTE
    survivors, mixture threshold) around the pack window."""
    from searchengine_ray.pipelines.dedup import dedup_survivors

    n_jparts = 64
    scanned = read(sf_dir, "documents", ["doc_id", "source", "text"]) \
        .map_batches(_CurationScan, fn_constructor_args=(nparts, n_jparts),
                     batch_format="pyarrow", batch_size=2048,
                     concurrency=(1, 8))

    def drop_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("keep"), 0))
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(ids), np.int64)
        return pa.table({"jpart": int64_col(ids % n_jparts),
                         "doc_id": int64_col(ids), "part": int64_col(z),
                         "n_tokens": int64_col(z),
                         "side": int64_col(np.ones(len(ids), np.int64))})

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["side"] == 0]
        dead = set(df.loc[df["side"] == 1, "doc_id"].to_numpy())
        return docs[~docs["doc_id"].isin(dead)]

    drops = dedup_survivors(sf_dir, dedup_threshold_bp).map_batches(
        drop_side, batch_format="pyarrow")
    live = scanned.union(drops).groupby("jpart").map_groups(
        anti, batch_format="pandas")
    return live.groupby("part").map_groups(
        _make_pack_group(seq_len), batch_format="pandas")


def curation_pipeline_sql(seq_len: int = 2048, nparts: int = 64,
                          dedup_threshold_bp: int = 5000) -> str:
    from searchengine_ray.pipelines.dedup import dedup_survivors_sql

    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {nparts} AS part,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE doc_id IN (
      SELECT doc_id FROM ({quality_filter_sql()}) qf WHERE qf.keep = 1)
    AND CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
             AS BIGINT) % 1000
        < 200 + CAST(('0x' || substr(md5('w:' || source), 1, 8))
                     AS BIGINT) % 601
    AND doc_id NOT IN (
      SELECT doc_id FROM ({dedup_survivors_sql(dedup_threshold_bp)}) s
      WHERE s.keep = 0)),
packed AS (
  SELECT doc_id, part, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY part ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS tok_offset
  FROM base)
SELECT doc_id, part, n_tokens, tok_offset,
       CAST(tok_offset // {seq_len} AS BIGINT) AS seq_start,
       CAST((tok_offset + greatest(n_tokens, 1) - 1) // {seq_len} AS BIGINT)
         AS seq_end
FROM packed
"""


# ---- full BPE trainer: R merge rounds over the word vocabulary -------

_BPE_TRAIN_ROUNDS = 4


class _WordCountPartial:
    """Per-batch (word, c_p) partial counts — the corpus-scale pass of
    the BPE trainer. Words are ``[a-z0-9_]+`` matches of the lowercased
    text; counting is a pandas C-kernel value_counts per batch, so the
    one corpus-wide shuffle carries (word, partial) rows bounded by the
    batch vocabulary, never token occurrences."""

    def __init__(self):
        import re

        self.tok = re.compile(r"[a-z0-9_]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for text in batch.column("text").to_pylist():
            words.extend(self.tok.findall(text.lower()))
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        vc = pd.Series(words).value_counts()
        return pa.table({"word": pa.array(vc.index.tolist(), pa.string()),
                         "c_p": int64_col(vc.to_numpy(np.int64))})


def _flat_symbols(syms_col: list[str]) -> tuple[list[list[str]], np.ndarray,
                                                np.ndarray]:
    """Split space-joined symbol strings; returns (per-word token lists,
    flat word-id per token, flat token index)."""
    toks_per = [s.split(" ") for s in syms_col]
    lens = np.fromiter((len(t) for t in toks_per), dtype=np.int64,
                       count=len(toks_per))
    wid = np.repeat(np.arange(len(toks_per), dtype=np.int64), lens)
    return toks_per, wid, lens


class _BpePairCount:
    """Per-batch weighted pair partials over the CURRENT symbol state:
    (l, r, c_p) where c_p sums the word counts of every adjacent
    occurrence (overlaps included — Sennrich et al. 2016 get_stats
    semantics). Aggregation is one pandas groupby over the flattened
    (l, r, weight) arrays — C kernels over vocabulary-scale rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        syms = batch.column("syms").to_pylist()
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        toks_per, wid, lens = _flat_symbols(syms)
        flat = np.array([t for ts in toks_per for t in ts], dtype=object)
        if len(flat) == 0:
            return pa.table({"l": pa.array([], pa.string()),
                             "r": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        same = wid[:-1] == wid[1:]
        df = pd.DataFrame({"l": flat[:-1][same], "r": flat[1:][same],
                           "c_p": np.repeat(cnt, lens)[:-1][same]})
        g = df.groupby(["l", "r"], as_index=False, sort=False)["c_p"].sum()
        return pa.table({"l": pa.array(g["l"].tolist(), pa.string()),
                         "r": pa.array(g["r"].tolist(), pa.string()),
                         "c_p": int64_col(g["c_p"].to_numpy(np.int64))})


class _BpeApplyMerge:
    """Apply ONE merge (l, r) to the symbol state with exact greedy
    left-to-right non-overlap semantics via the island-parity rule:
    among maximal runs of CONSECUTIVE candidate positions (which only
    arise for l == r, e.g. ``a a a a``), every even-offset candidate
    merges — provably the positions a sequential left-to-right scan
    picks. Candidate detection and selection are vectorized over the
    flattened token array; only the final per-word string rebuild walks
    the (vocabulary-scale) word list."""

    def __init__(self, left: str, right: str):
        self.left, self.right = left, right

    def __call__(self, batch: pa.Table) -> pa.Table:
        syms = batch.column("syms").to_pylist()
        cnt = batch.column("cnt")
        toks_per, wid, _ = _flat_symbols(syms)
        flat = np.array([t for ts in toks_per for t in ts], dtype=object)
        if len(flat) < 2:
            return pa.table({"syms": pa.array(syms, pa.string()),
                             "cnt": cnt})
        cand = np.flatnonzero(
            (flat[:-1] == self.left) & (flat[1:] == self.right)
            & (wid[:-1] == wid[1:]))
        if len(cand):
            run_start = np.r_[True, np.diff(cand) != 1]
            offset = np.arange(len(cand)) - \
                np.maximum.accumulate(np.where(run_start,
                                               np.arange(len(cand)), -1))
            sel = cand[offset % 2 == 0]
            merged = np.zeros(len(flat), dtype=bool)
            dropped = np.zeros(len(flat), dtype=bool)
            merged[sel] = True
            dropped[sel + 1] = True
            out: list[str] = []
            i = 0
            for ts in toks_per:
                n = len(ts)
                parts = [flat[j] + self.right if merged[j] else flat[j]
                         for j in range(i, i + n) if not dropped[j]]
                out.append(" ".join(parts))
                i += n
            syms = out
        return pa.table({"syms": pa.array(syms, pa.string()), "cnt": cnt})


def _bpe_train_core(sf_dir: str, rounds: int):
    """Shared trainer body: returns ``(merge rows, final symbol state)``
    — ``bpe_train`` reports the merges; ``bpe_apply`` encodes the
    corpus under the final state. See ``bpe_train`` for semantics."""
    from ray.data.aggregate import Sum

    vocab = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _WordCountPartial, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4)).groupby("word").aggregate(
        Sum("c_p", alias_name="cnt"))

    def init_syms(b: pa.Table) -> pa.Table:
        words = b.column("word").to_pylist()
        return pa.table({"syms": pa.array([" ".join(w) for w in words],
                                          pa.string()),
                         "cnt": b.column("cnt").cast(pa.int64())})

    state = vocab.map_batches(init_syms, batch_format="pyarrow").materialize()

    def local_top1(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["count", "l", "r"],
                                       ascending=[False, True, True]).head(1)
        return pa.table({"g": int64_col(np.zeros(len(df), np.int64)),
                         "l": pa.array(df["l"].tolist(), pa.string()),
                         "r": pa.array(df["r"].tolist(), pa.string()),
                         "count": int64_col(df["count"].to_numpy(np.int64))})

    def final_top1(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["count", "l", "r"],
                              ascending=[False, True, True]).head(1)[
            ["l", "r", "count"]]

    final_top1.__name__ = "bpe_final_top1"

    out_rounds: list[tuple[int, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        summed = state.map_batches(_BpePairCount, batch_format="pyarrow",
                                   concurrency=(1, 4)) \
            .groupby(["l", "r"]).aggregate(Sum("c_p", alias_name="count"))
        best = summed.map_batches(local_top1, batch_format="pyarrow") \
            .groupby("g").map_groups(final_top1, batch_format="pandas") \
            .take_all()
        if not best:
            break                       # no pairs left: state is stable
        l, r, c = str(best[0]["l"]), str(best[0]["r"]), int(best[0]["count"])
        out_rounds.append((rnd, l, r, c))
        state = state.map_batches(
            _BpeApplyMerge, fn_constructor_args=(l, r),
            batch_format="pyarrow", concurrency=(1, 4)).materialize()
    return out_rounds, state


def bpe_train(sf_dir: str, rounds: int = _BPE_TRAIN_ROUNDS):
    """(round, merge_left, merge_right, pair_count) — ``rounds`` full
    BPE merge iterations over the corpus word vocabulary (Sennrich et
    al. 2016): each round counts weighted adjacent symbol pairs, merges
    the argmax pair (count DESC, left ASC, right ASC — deterministic),
    and rewrites the symbol state. Extends ``bpe_pair_counts`` (round 1
    only) to the full iterative trainer.

    Scale shape: the corpus is touched ONCE (word-count partials ->
    word groupby); every iteration then runs over the VOCABULARY-scale
    (syms, cnt) state — per-batch pair partials bounded by the batch's
    symbol vocabulary, one tiny (l, r) groupby, a two-stage local/global
    top-1 whose driver take is ONE row (the kmeans-style bounded pull),
    one broadcast-free merge map_batches (the winning pair rides the
    task closure), and a vocabulary-scale materialize between rounds.
    Exact integer counts + deterministic tie-break => the unrolled-CTE
    DuckDB oracle (island-parity merge replay, no loops) matches
    bit-for-bit. If a round finds no pairs left, the state is passed
    through unchanged and the round emits nothing (mirrored by the
    oracle's empty CTE)."""
    out_rounds, _ = _bpe_train_core(sf_dir, rounds)
    return pa.table({
        "round": pa.array([t[0] for t in out_rounds], pa.int64()),
        "merge_left": pa.array([t[1] for t in out_rounds], pa.string()),
        "merge_right": pa.array([t[2] for t in out_rounds], pa.string()),
        "pair_count": pa.array([t[3] for t in out_rounds], pa.int64())})


def _bpe_sql_chain(rounds: int) -> tuple[str, list[str]]:
    """Shared unrolled-CTE chain for the BPE oracles: per round,
    explode the symbol state with ordinals, count weighted pairs, pick
    the argmax with the same tie order, select merge positions via the
    island-parity rule (windowed gaps-and-islands — the loop-free
    equivalent of the greedy scan), and rebuild the state. Returns the
    WITH-body (``w`` carries doc_id so consumers can join back to
    documents; the final state is ``s{rounds}``) and the per-round
    merge SELECTs. Every CTE is MATERIALIZED: DuckDB inlines plain
    CTEs per reference, and x{i} is referenced ~5x per round, so a
    consumer of s{rounds} would otherwise expand the chain ~5^rounds
    times (measured: 0.1 s materialized vs >480 s inlined at
    sf0.001)."""
    blocks = []
    outs = []
    for i in range(1, rounds + 1):
        p = i - 1
        blocks.append(f"""
x{i} AS MATERIALIZED (
  SELECT word, cnt, generate_subscripts(syms, 1) AS pos, unnest(syms) AS sym
  FROM s{p}),
b{i} AS MATERIALIZED (
  SELECT a.sym AS l, b.sym AS r, CAST(sum(a.cnt) AS BIGINT) AS c
  FROM x{i} a JOIN x{i} b ON b.word = a.word AND b.pos = a.pos + 1
  GROUP BY a.sym, b.sym
  ORDER BY c DESC, l ASC, r ASC LIMIT 1),
cand{i} AS MATERIALIZED (
  SELECT a.word, a.pos
  FROM x{i} a JOIN x{i} b ON b.word = a.word AND b.pos = a.pos + 1
  CROSS JOIN b{i} WHERE a.sym = b{i}.l AND b.sym = b{i}.r),
sel{i} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos,
           row_number() OVER (PARTITION BY word, isl ORDER BY pos) AS off
    FROM (SELECT word, pos,
                 pos - row_number() OVER (PARTITION BY word ORDER BY pos)
                   AS isl
          FROM cand{i}))
  WHERE off % 2 = 1),
s{i} AS MATERIALIZED (
  SELECT x.word AS word, x.cnt AS cnt,
         list(CASE WHEN sf.pos IS NOT NULL
                   THEN x.sym || xn.sym ELSE x.sym END
              ORDER BY x.pos) AS syms
  FROM x{i} x
  LEFT JOIN sel{i} sf ON sf.word = x.word AND sf.pos = x.pos
  LEFT JOIN sel{i} sd ON sd.word = x.word AND sd.pos = x.pos - 1
  LEFT JOIN x{i} xn ON xn.word = x.word AND xn.pos = x.pos + 1
  WHERE sd.pos IS NULL
  GROUP BY x.word, x.cnt)""")
        outs.append(f"SELECT {i} AS round, l AS merge_left, r AS merge_right,"
                    f" c AS pair_count FROM b{i}")
    chain = f"""w AS MATERIALIZED (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word
  FROM documents),
w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY word),
s0 AS MATERIALIZED (
  SELECT word, cnt,
         [substr(word, i, 1) for i in generate_series(1, length(word))]
           AS syms
  FROM w0),
{",".join(blocks)}"""
    return chain, outs


def bpe_train_sql(rounds: int = _BPE_TRAIN_ROUNDS) -> str:
    chain, outs = _bpe_sql_chain(rounds)
    union = "\nUNION ALL\n".join(outs)
    return f"""
WITH {chain}
SELECT CAST(round AS BIGINT) AS round, merge_left, merge_right, pair_count
FROM ({union}) ORDER BY round
"""


# ---- BPE apply: encode the corpus under the trained merge table ------


_BPA_TAGGED_SCHEMA = pa.schema([
    ("k1", pa.int64()), ("src", pa.int64()), ("word", pa.string()),
    ("doc_id", pa.int64()), ("tf", pa.int64()), ("pieces", pa.int64()),
])


class _BpeEncodeOrTag:
    """Tokenize + encode WITHOUT co-locating a hot word's rows — the
    ``_UnigramScoreOrTag`` skew-safe split, exact-integer variant.
    Head words (corpus count >= head_cnt, looked up in the broadcast
    word -> n_pieces dict) are pre-summed per DOC inside this stage, so
    one (doc, tf_sum, pieces_sum) row per doc per batch reaches the
    shuffle for the hot mass (by Zipf, most of the token volume); only
    cold words carry (word, doc_id, tf) into the bounded gkey
    co-group."""

    def __init__(self, head_ref, dparts: int, n_groups: int):
        import re

        import ray

        self.tok = re.compile(r"[a-z0-9_]+")
        self.head = ray.get(head_ref) if not isinstance(head_ref, dict) \
            else head_ref
        self.dparts = dparts
        self.n_groups = n_groups

    def __call__(self, batch: pa.Table) -> pa.Table:
        from zlib import crc32

        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        words: list[str] = []
        docs: list[int] = []
        for did, text in zip(ids, texts):
            ws = self.tok.findall(text.lower())
            words.extend(ws)
            docs.extend([int(did)] * len(ws))
        if not words:
            return _BPA_TAGGED_SCHEMA.empty_table()
        g = pd.DataFrame({"doc_id": np.asarray(docs, np.int64),
                          "word": words}) \
            .groupby(["doc_id", "word"], as_index=False, sort=False).size()
        w = g["word"].to_numpy(object)
        did = g["doc_id"].to_numpy(np.int64)
        tf = g["size"].to_numpy(np.int64)
        npc = np.fromiter((self.head.get(t, -1) for t in w), np.int64,
                          len(w))
        hot = npc >= 0
        out = {k: [] for k in ("k1", "src", "word", "doc_id", "tf",
                               "pieces")}
        if hot.any():
            uniq, inv = np.unique(did[hot], return_inverse=True)
            tf_sum = np.bincount(inv, weights=tf[hot]).astype(np.int64)
            pc_sum = np.bincount(inv, weights=tf[hot] * npc[hot]) \
                .astype(np.int64)
            out["k1"].append(self.n_groups + uniq % (8 * self.dparts))
            out["src"].append(np.full(len(uniq), 2, np.int64))
            out["word"].append(np.full(len(uniq), "", object))
            out["doc_id"].append(uniq)
            out["tf"].append(tf_sum)
            out["pieces"].append(pc_sum)
        cold = ~hot
        if cold.any():
            cw = w[cold]
            gk = np.fromiter((crc32(t.encode()) % self.n_groups
                              for t in cw), np.int64, len(cw))
            out["k1"].append(gk)
            out["src"].append(np.zeros(cold.sum(), np.int64))
            out["word"].append(cw)
            out["doc_id"].append(did[cold])
            out["tf"].append(tf[cold])
            out["pieces"].append(np.zeros(cold.sum(), np.int64))
        return pa.table(
            {"k1": int64_col(np.concatenate(out["k1"])),
             "src": int64_col(np.concatenate(out["src"])),
             "word": pa.array(np.concatenate(out["word"]), pa.string()),
             "doc_id": int64_col(np.concatenate(out["doc_id"])),
             "tf": int64_col(np.concatenate(out["tf"])),
             "pieces": int64_col(np.concatenate(out["pieces"]))},
            schema=_BPA_TAGGED_SCHEMA)


def _bpa_encode_cold(df: pd.DataFrame) -> pa.Table:
    """k1 co-group body: join cold doc rows against the (word,
    n_pieces) entries of the same gkey (src=1), multiply, pre-sum per
    doc. Hot groups (src=2) pass through already summed. Every cold
    word is guaranteed an entry — the vocabulary is trained on the
    same corpus — so a missing lookup is a real bug and raises."""
    rows = df[df["src"] == 0]
    if len(rows):
        ent = df[df["src"] == 1]
        pmap = dict(zip(ent["word"], ent["pieces"].astype(np.int64)))
        p = rows["word"].map(pmap).to_numpy(np.int64)
        tf = rows["tf"].to_numpy(np.int64)
        g = pd.DataFrame({"doc_id": rows["doc_id"].to_numpy(np.int64),
                          "tf": tf, "pieces": tf * p}) \
            .groupby("doc_id", as_index=False).sum()
        return pa.table({"doc_id": int64_col(g["doc_id"].to_numpy()),
                         "tf": int64_col(g["tf"].to_numpy(np.int64)),
                         "pieces": int64_col(g["pieces"].to_numpy(np.int64))})
    hot = df[df["src"] == 2]
    return pa.table({"doc_id": int64_col(hot["doc_id"].to_numpy(np.int64)),
                     "tf": int64_col(hot["tf"].to_numpy(np.int64)),
                     "pieces": int64_col(hot["pieces"].to_numpy(np.int64))})


def _bpa_add_ratio(batch: pa.Table) -> pa.Table:
    p = batch.column("n_pieces").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    w = batch.column("n_words").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    r = np.floor(p * 10000 / w + 0.5).astype(np.int64)
    return batch.append_column("pieces_per_word_bp", int64_col(r))


def bpe_apply(sf_dir: str, rounds: int = _BPE_TRAIN_ROUNDS,
              head_cnt: int = 4096, n_groups: int = 256,
              dparts: int = 64):
    """(doc_id, n_words, n_pieces, pieces_per_word_bp) — encode every
    document with the BPE merge table ``bpe_train`` learns, completing
    the tokenizer-training loop (train on the corpus, then tokenize the
    corpus). n_pieces sums, over the doc's words, the piece count of
    each word under the final symbol state; pieces_per_word_bp is the
    compression ratio in basis points — the fertility statistic
    tokenizer evaluations threshold on.

    Scale shape: the trainer's corpus pass + vocabulary-scale rounds
    (see ``_bpe_train_core``), then ONE more corpus pass to encode.
    The word -> n_pieces mapping is vocabulary-scale, never joined by
    an all-to-all on raw tokens: hot words (corpus cnt >= head_cnt —
    at most T/head_cnt entries, but most of the token mass) broadcast
    once via ray.put and are pre-summed per doc inside the map stage;
    cold words co-group under a gkey whose max group is bounded by
    rows_cold / n_groups with every word contributing < head_cnt rows.
    All-integer arithmetic end-to-end, so the shared unrolled-CTE
    oracle (``_bpe_sql_chain``) replays it bit-for-bit."""
    import ray
    from ray.data.aggregate import Sum

    _, state = _bpe_train_core(sf_dir, rounds)

    def to_entry(b: pa.Table) -> pa.Table:
        from zlib import crc32

        syms = b.column("syms").to_pylist()
        cnt = b.column("cnt").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        coldm = cnt < head_cnt
        words = np.asarray([s.replace(" ", "") for s in syms],
                           dtype=object)[coldm]
        npc = np.fromiter((s.count(" ") + 1
                           for s, m in zip(syms, coldm) if m),
                          np.int64, int(coldm.sum()))
        gk = np.fromiter((crc32(t.encode()) % n_groups for t in words),
                         np.int64, len(words))
        z = np.zeros(len(words), np.int64)
        return pa.table({"k1": int64_col(gk), "src": int64_col(z + 1),
                         "word": pa.array(words, pa.string()),
                         "doc_id": int64_col(z), "tf": int64_col(z),
                         "pieces": int64_col(npc)},
                        schema=_BPA_TAGGED_SCHEMA)

    head: dict[str, int] = {}
    for b in state.iter_batches(batch_format="pandas"):
        hb = b[b["cnt"] >= head_cnt]
        for s in hb["syms"]:
            head[s.replace(" ", "")] = s.count(" ") + 1
    head_ref = ray.put(head)

    entries = state.map_batches(to_entry, batch_format="pyarrow")
    tagged = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _BpeEncodeOrTag, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4),
        fn_constructor_args=(head_ref, dparts, n_groups))
    summed = entries.union(tagged).groupby("k1").map_groups(
        _bpa_encode_cold, batch_format="pandas")
    out = summed.groupby("doc_id").aggregate(
        Sum("tf", alias_name="n_words"),
        Sum("pieces", alias_name="n_pieces"))
    return out.map_batches(_bpa_add_ratio, batch_format="pyarrow")


def bpe_apply_sql(rounds: int = _BPE_TRAIN_ROUNDS) -> str:
    """Replay: the shared merge-round chain yields the final symbol
    state s{rounds}; piece counts are list lengths; encoding is a
    (doc, word) tf join against the mapping."""
    chain, _ = _bpe_sql_chain(rounds)
    return f"""
WITH {chain},
pieces AS (
  SELECT word, CAST(len(syms) AS BIGINT) AS n_pieces FROM s{rounds}),
dt AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM w
  GROUP BY doc_id, word),
agg AS (
  SELECT dt.doc_id, CAST(sum(dt.tf) AS BIGINT) AS n_words,
         CAST(sum(dt.tf * p.n_pieces) AS BIGINT) AS n_pieces
  FROM dt JOIN pieces p ON p.word = dt.word
  GROUP BY dt.doc_id)
SELECT doc_id, n_words, n_pieces,
       CAST(floor(CAST(n_pieces AS DOUBLE) * 10000 / n_words + 0.5)
         AS BIGINT) AS pieces_per_word_bp
FROM agg
"""


# ---- PMI collocations: bigrams scored against unigram independence ---


_PMI_TAGGED_SCHEMA = pa.schema([
    ("k1", pa.int64()), ("src", pa.int64()), ("word", pa.string()),
    ("l", pa.string()), ("r", pa.string()), ("count", pa.int64()),
    ("c_l", pa.int64()), ("c_r", pa.int64()),
])


class _PmiAttachTag:
    """Route filtered bigram rows toward the unigram-count join on
    ``key_col`` WITHOUT co-locating a hot word's bigrams: stopword-led
    bigrams are exactly the skewed keys, and stopwords are exactly the
    head words, so hot keys resolve inline from the broadcast dict and
    bypass the co-group (src=2, spread by a bigram hash); only
    cold-keyed rows (src=0) enter the bounded gkey groups."""

    def __init__(self, head_ref, key_col: str, out_col: str,
                 n_groups: int, spread: int = 512):
        import ray

        self.head = ray.get(head_ref) if not isinstance(head_ref, dict) \
            else head_ref
        self.key_col = key_col
        self.out_col = out_col
        self.n_groups = n_groups
        self.spread = spread

    def __call__(self, batch: pa.Table) -> pa.Table:
        from zlib import crc32

        df = batch.to_pandas()
        if not len(df):
            return _PMI_TAGGED_SCHEMA.empty_table()
        vals = df[self.key_col].map(self.head)
        hot = vals.notna().to_numpy()
        df = df.assign(word="", src=0, k1=0)
        if hot.any():
            df.loc[hot, self.out_col] = vals[hot].astype(np.int64)
            df.loc[hot, "src"] = 2
            df.loc[hot, "k1"] = self.n_groups + np.fromiter(
                (crc32(b.encode()) % self.spread
                 for b in (df.loc[hot, "l"] + " " + df.loc[hot, "r"])),
                np.int64, int(hot.sum()))
        cold = ~hot
        if cold.any():
            df.loc[cold, "k1"] = np.fromiter(
                (crc32(t.encode()) % self.n_groups
                 for t in df.loc[cold, self.key_col]),
                np.int64, int(cold.sum()))
        return pa.table(
            {"k1": int64_col(df["k1"].to_numpy(np.int64)),
             "src": int64_col(df["src"].to_numpy(np.int64)),
             "word": pa.array(df["word"].tolist(), pa.string()),
             "l": pa.array(df["l"].tolist(), pa.string()),
             "r": pa.array(df["r"].tolist(), pa.string()),
             "count": int64_col(df["count"].to_numpy(np.int64)),
             "c_l": int64_col(df["c_l"].to_numpy(np.int64)),
             "c_r": int64_col(df["c_r"].to_numpy(np.int64))},
            schema=_PMI_TAGGED_SCHEMA)


def _make_pmi_attach(key_col: str, out_col: str):
    def pmi_attach(df: pd.DataFrame) -> pa.Table:
        """k1 co-group body: fill ``out_col`` from the (word, count)
        entries (src=1) sharing the gkey; hot rows (src=2) pass
        through already filled. Every word in a kept bigram occurs in
        the corpus, so a missing lookup raises."""
        rows = df[df["src"] == 0]
        if not len(rows):
            rows = df[df["src"] == 2]
        else:
            ent = df[df["src"] == 1]
            m = dict(zip(ent["word"], ent["count"].astype(np.int64)))
            rows = rows.assign(
                **{out_col: rows[key_col].map(m).to_numpy(np.int64)})
        return pa.table({
            "l": pa.array(rows["l"].tolist(), pa.string()),
            "r": pa.array(rows["r"].tolist(), pa.string()),
            "count": int64_col(rows["count"].to_numpy(np.int64)),
            "c_l": int64_col(rows["c_l"].to_numpy(np.int64)),
            "c_r": int64_col(rows["c_r"].to_numpy(np.int64))})

    pmi_attach.__name__ = f"pmi_attach_{key_col}"
    return pmi_attach


def bigram_pmi(sf_dir: str, min_count: int = 5, k: int = 100,
               head_cnt: int = 4096, n_groups: int = 256):
    """(rank, bigram, count, pmi_bp) — the corpus's k strongest
    collocations by pointwise mutual information among bigrams with
    count >= min_count: pmi = ln(p(l,r) / (p(l)·p(r))) with unigram
    probabilities from the same token stream, reported in basis
    points. The classic collocation-extraction / phrase-vocabulary
    operator (Church & Hanks 1990).

    Shape: ONE corpus scan feeds both the bigram partials and the
    unigram partials (two vocabulary-scale groupbys); bigrams filter
    to count >= min_count post-Sum; unigram counts attach via two
    skew-safe joins (hot words — the stopwords that head every skewed
    bigram — broadcast once and resolve inline; cold words co-group
    under a bounded gkey); per-block local top-k then one k-sized
    merge. The bp'd PMI uses a fixed left-to-right double chain
    (ln c + 2 ln T − ln W − ln c_l − ln c_r) so numpy and DuckDB libm
    agree bit-for-bit (the bm25.idf parity rule)."""
    import math

    import ray
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    big = ds.map_batches(_BigramPartial, batch_format="pyarrow",
                         batch_size=1024, concurrency=(1, 4)) \
        .groupby("bigram").aggregate(Sum("c_p", alias_name="count")) \
        .materialize()
    uni = ds.map_batches(_WordCountPartial, batch_format="pyarrow",
                         batch_size=1024, concurrency=(1, 4)) \
        .groupby("word").aggregate(Sum("c_p", alias_name="cnt")) \
        .materialize()

    head: dict[str, int] = {}
    T = 0
    for b in uni.iter_batches(batch_format="pandas"):
        T += int(b["cnt"].sum())
        hb = b[b["cnt"] >= head_cnt]
        head.update(zip(hb["word"], hb["cnt"].astype(int)))
    head_ref = ray.put(head)
    W = int(big.sum("count"))

    def to_entry(b: pa.Table) -> pa.Table:
        from zlib import crc32

        words = b.column("word").to_pylist()
        cnt = b.column("cnt").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        coldm = cnt < head_cnt
        words = np.asarray(words, dtype=object)[coldm]
        gk = np.fromiter((crc32(t.encode()) % n_groups for t in words),
                         np.int64, len(words))
        z = np.zeros(len(words), np.int64)
        e = np.full(len(words), "", object)
        return pa.table({"k1": int64_col(gk), "src": int64_col(z + 1),
                         "word": pa.array(words, pa.string()),
                         "l": pa.array(e, pa.string()),
                         "r": pa.array(e, pa.string()),
                         "count": int64_col(cnt[coldm]),
                         "c_l": int64_col(z), "c_r": int64_col(z)},
                        schema=_PMI_TAGGED_SCHEMA)

    entries = uni.map_batches(to_entry, batch_format="pyarrow")

    def split_filter(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["count"] >= min_count]
        lr = df["bigram"].str.partition(" ")
        z = np.zeros(len(df), np.int64)
        return pa.table({"l": pa.array(lr[0].tolist(), pa.string()),
                         "r": pa.array(lr[2].tolist(), pa.string()),
                         "count": int64_col(df["count"].to_numpy(np.int64)),
                         "c_l": int64_col(z), "c_r": int64_col(z)})

    rows = big.map_batches(split_filter, batch_format="pyarrow")
    for key_col, out_col in (("l", "c_l"), ("r", "c_r")):
        tagged = rows.map_batches(
            _PmiAttachTag, batch_format="pyarrow", concurrency=(1, 4),
            fn_constructor_args=(head_ref, key_col, out_col, n_groups))
        rows = entries.union(tagged).groupby("k1").map_groups(
            _make_pmi_attach(key_col, out_col), batch_format="pandas")

    lnT2 = 2 * math.log(float(T))
    lnW = math.log(float(W))

    def score_local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        if not len(df):
            return pa.table({"g": pa.array([], pa.int64()),
                             "bigram": pa.array([], pa.string()),
                             "count": pa.array([], pa.int64()),
                             "pmi_bp": pa.array([], pa.int64())})
        pmi = np.log(df["count"].to_numpy(np.float64)) + lnT2 - lnW \
            - np.log(df["c_l"].to_numpy(np.float64)) \
            - np.log(df["c_r"].to_numpy(np.float64))
        df = df.assign(
            bigram=df["l"] + " " + df["r"],
            pmi_bp=np.floor(pmi * 10000 + 0.5).astype(np.int64))
        df = df.sort_values(["pmi_bp", "bigram"],
                            ascending=[False, True]).head(k)
        return pa.table({"g": int64_col(np.zeros(len(df), np.int64)),
                         "bigram": pa.array(df["bigram"].tolist(),
                                            pa.string()),
                         "count": int64_col(df["count"].to_numpy(np.int64)),
                         "pmi_bp": int64_col(df["pmi_bp"].to_numpy(np.int64))})

    def final_topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["pmi_bp", "bigram"],
                            ascending=[False, True]).head(k)
        return pa.table({
            "rank": int64_col(np.arange(1, len(df) + 1)),
            "bigram": pa.array(df["bigram"].tolist(), pa.string()),
            "count": int64_col(df["count"].to_numpy(np.int64)),
            "pmi_bp": int64_col(df["pmi_bp"].to_numpy(np.int64))})

    final_topk.__name__ = "pmi_final_topk"
    return rows.map_batches(score_local_topk, batch_format="pyarrow") \
        .groupby("g").map_groups(final_topk, batch_format="pandas") \
        .select_columns(["rank", "bigram", "count", "pmi_bp"])


def bigram_pmi_sql(min_count: int = 5, k: int = 100) -> str:
    return f"""
WITH s AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                     x -> x <> '') AS t
  FROM documents),
b AS (
  SELECT unnest([t[i] || ' ' || t[i + 1]
                 for i in generate_series(1, len(t) - 1)]) AS bigram
  FROM s),
bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS count FROM b
       GROUP BY bigram),
uc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
       FROM (SELECT unnest(t) AS word FROM s) GROUP BY word),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS T FROM uc),
wtot AS (SELECT CAST(sum(count) AS DOUBLE) AS W FROM bc),
f AS (SELECT bigram, count, split_part(bigram, ' ', 1) AS l,
             split_part(bigram, ' ', 2) AS r
      FROM bc WHERE count >= {min_count}),
p AS (
  SELECT f.bigram, f.count,
         CAST(floor((ln(CAST(f.count AS DOUBLE)) + 2 * ln(tot.T)
                     - ln(wtot.W) - ln(CAST(ul.cnt AS DOUBLE))
                     - ln(CAST(ur.cnt AS DOUBLE))) * 10000 + 0.5)
           AS BIGINT) AS pmi_bp
  FROM f JOIN uc ul ON ul.word = f.l JOIN uc ur ON ur.word = f.r
  CROSS JOIN tot CROSS JOIN wtot),
r AS (SELECT *, row_number() OVER (ORDER BY pmi_bp DESC, bigram ASC)
        AS rnk
      FROM p)
SELECT CAST(rnk AS BIGINT) AS rank, bigram, count, pmi_bp
FROM r WHERE rnk <= {k}
"""


# ---- character entropy: compressibility-style quality signal ---------


def _char_entropy_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    if not len(texts) or int(lens.sum()) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_chars": pa.array([], pa.int64()),
                         "entropy_bp": pa.array([], pa.int64())})
    # one utf-32 decode of the concatenated batch = exact code points,
    # no per-character Python; codes pack (doc index, code point)
    cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                       dtype=np.uint32).astype(np.int64)
    didx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    codes = didx * (1 << 21) + cp           # code points < 2^21
    uq, cnt = np.unique(codes, return_counts=True)
    udoc = (uq >> 21).astype(np.int64)
    cf = cnt.astype(np.float64)
    ebp = np.floor(cf * np.log(cf) * 10000 + 0.5).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
    s = np.add.reduceat(ebp, starts)
    present = udoc[starts]
    n = lens[present]
    ent = np.floor(np.log(n.astype(np.float64)) * 10000 + 0.5) \
        .astype(np.int64) - s // n
    return pa.table({"doc_id": int64_col(ids[present]),
                     "n_chars": int64_col(n),
                     "entropy_bp": int64_col(ent)})


def char_entropy(sf_dir: str):
    """(doc_id, n_chars, entropy_bp) — Shannon entropy of each doc's
    character distribution in basis-point nats: the compressibility
    quality signal (near-zero for repeated-char spam, high for
    base64/binary junk) that complements the ratio-based filters.

    The score is the DETERMINISTIC integer quantization
    floor(ln(L)·1e4 + 0.5) − (Σ_c floor(c·ln(c)·1e4 + 0.5)) // L —
    per-(doc, char) terms are basis-pointed BEFORE the sum, so the
    value is an exact function of integer counts (no float sum order
    anywhere) and the SQL replay matches bit-for-bit. Zero shuffle:
    one vectorized map_batches (a single utf-32 decode per batch, one
    np.unique, reduceat per-doc sums). Docs with empty text emit
    nothing on both sides."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _char_entropy_batch, batch_format="pyarrow", batch_size=1024)


def char_entropy_sql() -> str:
    return """
WITH cc AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
        FROM documents WHERE length(text) > 0)
  WHERE ch <> ''
  GROUP BY doc_id, ch),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
         CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                             * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM cc GROUP BY doc_id)
SELECT doc_id, n_chars,
       CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
         - s // n_chars AS entropy_bp
FROM agg
"""


# ---- DSIR importance weights: hashed-ngram domain selection ----------


_DSIR_B = 4096        # hashed-bigram feature buckets (paper uses ~1e4)
_DSIR_TARGET_MOD = 7  # target slice = doc_id % 7 == 0 — deterministic
# stand-in for the separate target-domain table (the decontaminate
# _EVAL_MOD convention); production callers pass their own target
# Dataset and the slice predicate drops out.


class _DsirNgramKernel:
    """Shared per-actor state for the hashed-bigram feature extraction:
    compiled tokenizer + a capped bigram->bucket md5 cache (the dedup
    _TOKEN_HASH_CACHE pattern — Zipf means the distinct-bigram working
    set is tiny relative to occurrences).

    ``occurrences(texts)`` returns (doc_index, bucket) per bigram
    OCCURRENCE, fully vectorized: one factorize over the batch's token
    stream (the _BigramPartial trick, newline sentinel between docs),
    integer pair codes, md5 only for DISTINCT pairs, gathered back per
    occurrence through np.unique's inverse. bucket = md5 low-64
    (little-endian, == DuckDB ``md5_number_lower``) mod B."""

    def __init__(self, n_buckets: int = _DSIR_B):
        import re

        self.tok = re.compile(r"[a-z0-9_]+")
        self.B = n_buckets
        self._cache: dict[str, int] = {}

    def occurrences(self, texts: list[str]):
        import hashlib

        toks: list[str] = []
        lens = np.empty(len(texts), np.int64)
        for i, text in enumerate(texts):
            t = self.tok.findall(text.lower())
            lens[i] = len(t)
            toks.extend(t)
            toks.append("\n")           # doc boundary sentinel
        if len(toks) < 2:
            z = np.array([], np.int64)
            return z, z
        codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
        sent = np.flatnonzero(uniq == "\n")[0]
        a, b = codes[:-1], codes[1:]
        mask = (a != sent) & (b != sent)
        v = len(uniq)
        pair = a[mask].astype(np.int64) * v + b[mask]
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens + 1)
        dococc = doc_of[:-1][mask]
        upair, inv = np.unique(pair, return_inverse=True)
        if len(self._cache) > (1 << 20):
            self._cache.clear()
        bks = np.empty(len(upair), np.int64)
        cache = self._cache
        for i, p in enumerate(upair.tolist()):
            s = f"{uniq[p // v]} {uniq[p % v]}"
            bk = cache.get(s)
            if bk is None:
                bk = int.from_bytes(
                    hashlib.md5(s.encode("utf-8")).digest()[8:16],
                    "little") % self.B
                cache[s] = bk
            bks[i] = bk
        return dococc, bks[inv]


class _DsirBucketPartial(_DsirNgramKernel):
    """batch -> one row per PRESENT bucket: (bucket, ct_p, cr_p) —
    target-slice and raw (all-docs) occurrence counts. Bounded at
    min(distinct_pairs, B) <= 4096 rows per batch regardless of corpus
    size: the canonical mergeable-partial layout, so the one groupby
    only ever sees (bucket, batch) rows."""

    def __init__(self, n_buckets: int = _DSIR_B,
                 target_mod: int = _DSIR_TARGET_MOD):
        super().__init__(n_buckets)
        self.mod = target_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dococc, bkocc = self.occurrences(batch.column("text").to_pylist())
        if not len(dococc):
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "ct_p": pa.array([], pa.int64()),
                             "cr_p": pa.array([], pa.int64())})
        istgt = (ids % self.mod == 0)[dococc].astype(np.int64)
        ub, inv = np.unique(bkocc, return_inverse=True)
        cr = np.bincount(inv, minlength=len(ub)).astype(np.int64)
        ct = np.bincount(inv, weights=istgt,
                         minlength=len(ub)).astype(np.int64)
        return pa.table({"bucket": int64_col(ub), "ct_p": int64_col(ct),
                         "cr_p": int64_col(cr)})


class _DsirScore(_DsirNgramKernel):
    """batch -> (doc_id, n_ngrams, dsir_bp): per-doc importance weight
    under the broadcast bucket model. One lam gather per occurrence,
    one bincount per doc — integer-valued float64 partial sums stay
    exact below 2^53, cast back to int64."""

    def __init__(self, lam_ref, n_buckets: int = _DSIR_B):
        import ray

        super().__init__(n_buckets)
        self.lam = ray.get(lam_ref) if not isinstance(lam_ref, np.ndarray) \
            else lam_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dococc, bkocc = self.occurrences(batch.column("text").to_pylist())
        n = np.bincount(dococc, minlength=len(ids)).astype(np.int64)
        s = np.bincount(dococc, weights=self.lam[bkocc] if len(bkocc)
                        else None, minlength=len(ids)).astype(np.int64)
        keep = n > 0
        return pa.table({"doc_id": int64_col(ids[keep]),
                         "n_ngrams": int64_col(n[keep]),
                         "dsir_bp": int64_col(s[keep])})


def _dsir_lam(sf_dir: str, n_buckets: int, target_mod: int) -> np.ndarray:
    """Train the hashed-bigram importance model: ONE corpus scan of
    bounded bucket partials, one <=B-row groupby, a B-row driver pull
    (corpus-size-independent — the legit take_all). lam[b] is the
    add-one-smoothed log-probability ratio in basis points, every ln
    floor-quantized SEPARATELY so lam is an exact function of integer
    counts (the char_entropy rule) and DuckDB replays it bit-for-bit."""
    import math

    from ray.data.aggregate import Sum

    rows = read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(_DsirBucketPartial, batch_format="pyarrow",
                     batch_size=1024, concurrency=(1, 4),
                     fn_constructor_args=(n_buckets, target_mod)) \
        .groupby("bucket").aggregate(Sum("ct_p", alias_name="ct"),
                                     Sum("cr_p", alias_name="cr")) \
        .take_all()

    def flq(x: float) -> int:
        return int(math.floor(x * 10000 + 0.5))

    tt = sum(r["ct"] for r in rows)
    tr = sum(r["cr"] for r in rows)
    base = flq(math.log(tr + n_buckets)) - flq(math.log(tt + n_buckets))
    lam = np.zeros(n_buckets, np.int64)
    for r in rows:
        lam[r["bucket"]] = flq(math.log(r["ct"] + 1)) \
            - flq(math.log(r["cr"] + 1)) + base
    return lam


def dsir_weights(sf_dir: str, n_buckets: int = _DSIR_B,
                 target_mod: int = _DSIR_TARGET_MOD):
    """(doc_id, n_ngrams, dsir_bp) — DSIR importance weights (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): each document scored by how much more likely its
    hashed-bigram bag is under the TARGET domain's unigram-over-buckets
    model than under the raw corpus's, dsir_bp = sum over bigram
    occurrences of lam[bucket] with lam the bp'd add-one-smoothed
    log ratio. High scores = target-like documents; feeding the top
    slice to training is the paper's domain-selection recipe.

    Shape for 100 TB: scan 1 trains the model (per-batch bucket
    partials bounded at B=4096 rows, one B-key groupby, one B-row
    driver pull); the B-int64 lam array broadcasts ONCE via ray.put;
    scan 2 scores every doc with zero shuffle. Exact int64 sums of
    pre-quantized per-occurrence terms -> identical on any cluster
    shape. Docs with no bigram (len < 2 tokens) emit nothing on both
    sides."""
    import ray

    lam_ref = ray.put(_dsir_lam(sf_dir, n_buckets, target_mod))
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _DsirScore, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4), fn_constructor_args=(lam_ref, n_buckets))


def dsir_select(sf_dir: str, m: int = 100, n_buckets: int = _DSIR_B,
                target_mod: int = _DSIR_TARGET_MOD):
    """(rank, doc_id, dsir_bp) — the top-m most target-like documents
    by DSIR weight, ties broken (dsir_bp desc, doc_id asc): the
    selection step of importance resampling. Per-block LOCAL top-m
    then one m x n_blocks merge — the corpus-scale score table never
    collects anywhere."""
    scores = dsir_weights(sf_dir, n_buckets, target_mod)

    def local_topm(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["dsir_bp", "doc_id"], ascending=[False, True]).head(m)
        return pa.table({"g": int64_col(np.zeros(len(df), np.int64)),
                         "doc_id": int64_col(df["doc_id"].to_numpy(np.int64)),
                         "dsir_bp": int64_col(df["dsir_bp"].to_numpy(np.int64))})

    def final_topm(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["dsir_bp", "doc_id"],
                            ascending=[False, True]).head(m)
        return pa.table({
            "rank": int64_col(np.arange(1, len(df) + 1)),
            "doc_id": int64_col(df["doc_id"].to_numpy(np.int64)),
            "dsir_bp": int64_col(df["dsir_bp"].to_numpy(np.int64))})

    final_topm.__name__ = "dsir_final_topm"
    return scores.map_batches(local_topm, batch_format="pyarrow") \
        .groupby("g").map_groups(final_topm, batch_format="pandas") \
        .select_columns(["rank", "doc_id", "dsir_bp"])


def _dsir_scores_cte(n_buckets: int, target_mod: int) -> str:
    return f"""
s AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                     x -> x <> '') AS t
  FROM documents),
b AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i + 1]
                         for i in generate_series(1, len(t) - 1)]) AS bigram
  FROM s),
h AS (
  SELECT doc_id,
         CAST(CAST(md5_number_lower(bigram) AS UHUGEINT) % {n_buckets}
              AS BIGINT) AS bucket
  FROM b),
bc AS (
  SELECT bucket,
         CAST(sum(CASE WHEN doc_id % {target_mod} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS ct,
         CAST(count(*) AS BIGINT) AS cr
  FROM h GROUP BY bucket),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
               CAST(sum(cr) AS BIGINT) AS tr FROM bc),
lam AS (
  SELECT bucket,
         CAST(floor(ln(CAST(ct + 1 AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
         - CAST(floor(ln(CAST(tt + {n_buckets} AS DOUBLE)) * 10000 + 0.5)
                AS BIGINT)
         - CAST(floor(ln(CAST(cr + 1 AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
         + CAST(floor(ln(CAST(tr + {n_buckets} AS DOUBLE)) * 10000 + 0.5)
                AS BIGINT) AS lam_bp
  FROM bc CROSS JOIN tot),
sc AS (
  SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(lam.lam_bp) AS BIGINT) AS dsir_bp
  FROM h JOIN lam USING (bucket) GROUP BY h.doc_id)"""


def dsir_weights_sql(n_buckets: int = _DSIR_B,
                     target_mod: int = _DSIR_TARGET_MOD) -> str:
    return f"""
WITH {_dsir_scores_cte(n_buckets, target_mod)}
SELECT doc_id, n_ngrams, dsir_bp FROM sc
"""


def dsir_select_sql(m: int = 100, n_buckets: int = _DSIR_B,
                    target_mod: int = _DSIR_TARGET_MOD) -> str:
    return f"""
WITH {_dsir_scores_cte(n_buckets, target_mod)},
r AS (SELECT doc_id, dsir_bp,
             row_number() OVER (ORDER BY dsir_bp DESC, doc_id ASC) AS rnk
      FROM sc)
SELECT CAST(rnk AS BIGINT) AS rank, doc_id, dsir_bp
FROM r WHERE rnk <= {m}
"""


# ---- per-source KL divergence: corpus drift / mixture monitoring ----


class _SourceBucketPartial(_DsirNgramKernel):
    """batch -> (source, bucket, c_p) hashed-bigram occurrence counts —
    bounded at n_sources x min(distinct_pairs, B) rows per batch, the
    mergeable-partial layout again."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs = np.asarray(batch.column("source").to_pylist(), dtype=object)
        dococc, bkocc = self.occurrences(batch.column("text").to_pylist())
        if not len(dococc):
            return pa.table({"source": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "c_p": pa.array([], pa.int64())})
        scodes, svals = pd.factorize(srcs[dococc])
        key = scodes.astype(np.int64) * self.B + bkocc
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "source": pa.array(svals[(uk // self.B)].tolist(), pa.string()),
            "bucket": int64_col(uk % self.B),
            "c_p": int64_col(cnt.astype(np.int64))})


def source_divergence(sf_dir: str, n_buckets: int = _DSIR_B):
    """(source, n_ngrams, kl_bp) — KL divergence of each source's
    hashed-bigram distribution from the whole corpus's, in basis-point
    nats: the mixture-drift monitor a multi-source training pipeline
    watches (a source whose KL jumps changed its content mix).
    kl_bp = (sum_b c_sb * [ln c_sb - ln T_s - ln c_b + ln T]_bp) // T_s
    with every ln floor-quantized separately, so the statistic is an
    exact integer function of occurrence counts (the char_entropy /
    DSIR rule) — present buckets only, and c_b >= c_sb > 0 means no
    smoothing is needed.

    Shape for 100 TB: one scan of (source, bucket) partials (bounded
    n_sources x B=4096 rows per batch), ONE groupby, and a driver pull
    bounded at n_sources x B rows — corpus-size-independent given the
    curated-handful-of-sources assumption every mixture pipeline makes
    (dataset_mixture documents the same)."""
    import math

    from ray.data.aggregate import Sum

    rows = read(sf_dir, "documents", ["doc_id", "text", "source"]) \
        .map_batches(_SourceBucketPartial, batch_format="pyarrow",
                     batch_size=1024, concurrency=(1, 4),
                     fn_constructor_args=(n_buckets,)) \
        .groupby(["source", "bucket"]) \
        .aggregate(Sum("c_p", alias_name="c")).take_all()

    def flq(x: float) -> int:
        return int(math.floor(x * 10000 + 0.5))

    tot = sum(r["c"] for r in rows)
    ts: dict[str, int] = {}
    cg: dict[int, int] = {}
    for r in rows:
        ts[r["source"]] = ts.get(r["source"], 0) + r["c"]
        cg[r["bucket"]] = cg.get(r["bucket"], 0) + r["c"]
    acc: dict[str, int] = {s: 0 for s in ts}
    lq_tot = flq(math.log(tot))
    for r in rows:
        c = r["c"]
        acc[r["source"]] += c * (flq(math.log(c))
                                 - flq(math.log(ts[r["source"]]))
                                 - flq(math.log(cg[r["bucket"]])) + lq_tot)
    srcs = sorted(ts)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_ngrams": int64_col(np.array([ts[s] for s in srcs], np.int64)),
        "kl_bp": int64_col(np.array([acc[s] // ts[s] for s in srcs],
                                    np.int64))})


def source_divergence_sql(n_buckets: int = _DSIR_B) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                     x -> x <> '') AS t
  FROM documents),
b AS (
  SELECT source, unnest([t[i] || ' ' || t[i + 1]
                         for i in generate_series(1, len(t) - 1)]) AS bigram
  FROM s),
h AS (
  SELECT source,
         CAST(CAST(md5_number_lower(bigram) AS UHUGEINT) % {n_buckets}
              AS BIGINT) AS bucket
  FROM b),
sb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS c
       FROM h GROUP BY source, bucket),
ts AS (SELECT source, CAST(sum(c) AS BIGINT) AS t FROM sb GROUP BY source),
g AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cg FROM sb GROUP BY bucket),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM sb),
terms AS (
  SELECT sb.source,
         sb.c * (CAST(floor(ln(CAST(sb.c AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
                 - CAST(floor(ln(CAST(ts.t AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
                 - CAST(floor(ln(CAST(g.cg AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
                 + CAST(floor(ln(CAST(tot.tt AS DOUBLE)) * 10000 + 0.5)
                        AS BIGINT)) AS term,
         ts.t
  FROM sb JOIN ts USING (source) JOIN g USING (bucket) CROSS JOIN tot)
SELECT source, CAST(any_value(t) AS BIGINT) AS n_ngrams,
       CAST(sum(term) // any_value(t) AS BIGINT) AS kl_bp
FROM terms GROUP BY source
ORDER BY source
"""


# ---- per-language doc-length quantiles (histogram-exact) -------------


class _LangLenPartial:
    """batch -> (lang, n_tokens, c_p) histogram partials — the bins ARE
    the integer token counts, so the downstream selection is exact, and
    partials are bounded at langs x distinct-lengths per batch."""

    def __init__(self):
        import re

        self.tok = re.compile(r"[a-z0-9_]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        n = np.fromiter((len(self.tok.findall(t.lower()))
                         for t in batch.column("text").to_pylist()),
                        np.int64, len(langs))
        lcodes, lvals = pd.factorize(langs)
        width = int(n.max()) + 1 if len(n) else 1
        key = lcodes.astype(np.int64) * width + n
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "lang": pa.array(lvals[(uk // width)].tolist(), pa.string()),
            "n_tokens": int64_col(uk % width),
            "c_p": int64_col(cnt.astype(np.int64))})


def _make_len_quantile_group(qs: tuple[float, ...]):
    def body(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("n_tokens")
        c = df["count"].to_numpy(np.int64)
        v = df["n_tokens"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        out = {"lang": [df["lang"].iloc[0]], "n": np.array([n], np.int64)}
        for q in qs:
            # quantile_disc: the element at rank ceil(q*n) of the
            # value multiset == first bin whose cumulative count
            # reaches that rank
            r = min(int(np.ceil(q * n)), n)
            out[f"p{int(q * 100)}_tokens"] = np.array(
                [v[int(np.searchsorted(cum, r))]], np.int64)
        return pd.DataFrame(out)

    body.__name__ = "len_quantile_group"
    return body


def doclen_quantiles_by_lang(sf_dir: str,
                             qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """(lang, n, p50/p90/p99_tokens) — exact discrete quantiles of
    document token length per language: the length-profile read every
    curation dashboard carries (and the knob source for pack_sequences
    budgets). This is the two-pass histogram-refine selection the
    event_value_quantiles docstring promises for 100 TB, collapsed to
    one pass because token counts ARE small integers: per-batch
    (lang, n_tokens) histogram partials (bounded langs x distinct
    lengths), ONE groupby sum, then a per-lang cumulative-count
    selection over bin rows — nothing ever sorts or holds a
    corpus-scale group, and quantile_disc's rank rule on the multiset
    is replayed exactly."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["text", "lang"])
    hist = ds.map_batches(_LangLenPartial, batch_format="pyarrow",
                          batch_size=1024, concurrency=(1, 4)) \
        .groupby(["lang", "n_tokens"]) \
        .aggregate(Sum("c_p", alias_name="count"))
    return hist.groupby("lang").map_groups(
        _make_len_quantile_group(qs), batch_format="pandas")


def doclen_quantiles_by_lang_sql(
        qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> str:
    picks = ",\n       ".join(
        f"CAST(quantile_disc(n_tokens, {q}) AS BIGINT)"
        f" AS p{int(q * 100)}_tokens" for q in qs)
    return f"""
WITH lens AS (
  SELECT lang,
         CAST(len(list_filter(regexp_split_to_array(lower(text),
                                                    '[^a-z0-9_]+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n,
       {picks}
FROM lens GROUP BY lang
"""


# ---- multinomial Naive Bayes lang classifier (train + apply) ---------


class _LangBucketPartial(_DsirNgramKernel):
    """batch -> (lang, bucket, c_p) hashed-bigram counts per LABEL —
    the Naive Bayes sufficient statistics, bounded at
    n_langs x B rows per batch (the _SourceBucketPartial shape keyed
    by the label column)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        labs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        dococc, bkocc = self.occurrences(batch.column("text").to_pylist())
        if not len(dococc):
            return pa.table({"lang": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "c_p": pa.array([], pa.int64())})
        lcodes, lvals = pd.factorize(labs[dococc])
        key = lcodes.astype(np.int64) * self.B + bkocc
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "lang": pa.array(lvals[(uk // self.B)].tolist(), pa.string()),
            "bucket": int64_col(uk % self.B),
            "c_p": int64_col(cnt.astype(np.int64))})


class _NbApply(_DsirNgramKernel):
    """batch -> (lang, pred_lang, n_p) confusion partials: per doc,
    score per class = prior_bp + sum lam_c[bucket] over its bigram
    occurrences (exact int64), argmax with (score desc, lang asc)
    ties. Docs without bigrams emit nothing (both sides)."""

    def __init__(self, model_ref, n_buckets: int = _DSIR_B):
        import ray

        super().__init__(n_buckets)
        langs, priors, lam = ray.get(model_ref) \
            if not isinstance(model_ref, tuple) else model_ref
        self.langs = langs                   # sorted class names
        self.priors = priors                 # int64[c]
        self.lam = lam                       # int64[c, B]

    def __call__(self, batch: pa.Table) -> pa.Table:
        labs = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        dococc, bkocc = self.occurrences(batch.column("text").to_pylist())
        if not len(dococc):
            return pa.table({"lang": pa.array([], pa.string()),
                             "pred_lang": pa.array([], pa.string()),
                             "n_p": pa.array([], pa.int64())})
        nd = len(labs)
        scores = np.empty((len(self.langs), nd), np.int64)
        for ci in range(len(self.langs)):
            scores[ci] = self.priors[ci] + np.bincount(
                dococc, weights=self.lam[ci][bkocc],
                minlength=nd).astype(np.int64)
        # argmax, ties to the lexicographically-smallest lang: classes
        # iterate in sorted order, strict > keeps the first maximum
        pred = np.zeros(nd, np.int64)
        best = scores[0].copy()
        for ci in range(1, len(self.langs)):
            m = scores[ci] > best
            pred[m] = ci
            best[m] = scores[ci][m]
        has = np.zeros(nd, bool)
        has[np.unique(dococc)] = True
        tl = labs[has]
        pl = np.asarray(self.langs, dtype=object)[pred[has]]
        tcodes, tvals = pd.factorize(tl)
        pcodes, pvals = pd.factorize(pl)
        key = tcodes.astype(np.int64) * len(pvals) + pcodes
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "lang": pa.array(tvals[(uk // len(pvals))].tolist(),
                             pa.string()),
            "pred_lang": pa.array(pvals[(uk % len(pvals))].tolist(),
                                  pa.string()),
            "n_p": int64_col(cnt.astype(np.int64))})


def nb_lang_confusion(sf_dir: str, n_buckets: int = _DSIR_B):
    """(lang, pred_lang, n_docs) — confusion matrix of a multinomial
    Naive Bayes language classifier trained ON the corpus's own lang
    labels over hashed-bigram features and applied back to every
    document: the distributed train-a-model-then-score-the-corpus
    loop (label auditing / weak-label bootstrapping; self-train
    self-eval is the documented simplification — split the read by
    dataset_split for a held-out variant).

    Train = ONE scan of (lang, bucket) count partials (bounded
    n_langs x B=4096) + a tiny per-lang doc-count aggregate; the model
    (priors + per-class add-one log-likelihood over buckets, every ln
    floor-quantized to bp separately — exact integers) broadcasts once
    via ray.put; apply = ONE zero-shuffle scan emitting <=n_langs²-row
    confusion partials. Ties break to the lexicographically smallest
    class on both sides."""
    import math

    import ray
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text", "lang"])
    rows = ds.map_batches(_LangBucketPartial, batch_format="pyarrow",
                          batch_size=1024, concurrency=(1, 4),
                          fn_constructor_args=(n_buckets,)) \
        .groupby(["lang", "bucket"]) \
        .aggregate(Sum("c_p", alias_name="c")).take_all()
    ndocs = {r["lang"]: r["n"] for r in
             ds.groupby("lang").count().rename_columns(
                 {"count()": "n"}).take_all()}

    def flq(x: float) -> int:
        return int(math.floor(x * 10000 + 0.5))

    langs = sorted(ndocs)
    n_total = sum(ndocs.values())
    priors = np.array([flq(math.log(ndocs[c])) - flq(math.log(n_total))
                       for c in langs], np.int64)
    tc = {c: 0 for c in langs}
    for r in rows:
        tc[r["lang"]] += r["c"]
    lam = np.empty((len(langs), n_buckets), np.int64)
    for ci, c in enumerate(langs):
        lam[ci, :] = -flq(math.log(tc[c] + n_buckets))
    for r in rows:
        ci = langs.index(r["lang"])
        lam[ci, r["bucket"]] = flq(math.log(r["c"] + 1)) \
            - flq(math.log(tc[r["lang"]] + n_buckets))
    model_ref = ray.put((langs, priors, lam))
    return ds.map_batches(_NbApply, batch_format="pyarrow",
                          batch_size=1024, concurrency=(1, 4),
                          fn_constructor_args=(model_ref, n_buckets)) \
        .groupby(["lang", "pred_lang"]) \
        .aggregate(Sum("n_p", alias_name="n_docs"))


def nb_lang_confusion_sql(n_buckets: int = _DSIR_B) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                     x -> x <> '') AS t
  FROM documents),
b AS (
  SELECT doc_id, lang, unnest([t[i] || ' ' || t[i + 1]
                               for i in generate_series(1, len(t) - 1)])
           AS bigram
  FROM s),
h AS (
  SELECT doc_id, lang,
         CAST(CAST(md5_number_lower(bigram) AS UHUGEINT) % {n_buckets}
              AS BIGINT) AS bucket
  FROM b),
nd AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
       GROUP BY lang),
ntot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM nd),
pri AS (
  SELECT lang,
         CAST(floor(ln(CAST(nd.n AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
         - CAST(floor(ln(CAST(ntot.n AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
           AS prior_bp
  FROM nd CROSS JOIN ntot),
cb AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS c
       FROM h GROUP BY lang, bucket),
tc AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM cb GROUP BY lang),
-- per-(doc, class) score: prior + sum over the doc's occurrences of
-- lam_c[bucket], where absent (class, bucket) cells contribute the
-- smoothing floor -ln(T_c + B)
docc AS (SELECT doc_id, lang, bucket, CAST(count(*) AS BIGINT) AS k
         FROM h GROUP BY doc_id, lang, bucket),
sc AS (
  SELECT d.doc_id, d.lang AS true_lang, tc.lang AS cls,
         any_value(p.prior_bp)
         + CAST(sum(d.k * (
             CAST(floor(ln(CAST(COALESCE(cb.c, 0) + 1 AS DOUBLE))
                        * 10000 + 0.5) AS BIGINT)
             - CAST(floor(ln(CAST(tc.t + {n_buckets} AS DOUBLE))
                          * 10000 + 0.5) AS BIGINT))) AS BIGINT) AS score
  FROM docc d
  CROSS JOIN tc
  JOIN pri p ON p.lang = tc.lang
  LEFT JOIN cb ON cb.lang = tc.lang AND cb.bucket = d.bucket
  GROUP BY d.doc_id, d.lang, tc.lang),
pred AS (
  SELECT doc_id, true_lang, cls FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cls ASC) AS rn
    FROM sc) WHERE rn = 1)
SELECT true_lang AS lang, cls AS pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY true_lang, cls
"""


# ---- Bloom filter: mergeable term-membership sketch ------------------

_BLOOM_K = 4                      # hash functions (salted md5 rows)
_BLOOM_M = 8192                   # bits


def _bloom_bit(j: int, term: str) -> int:
    """Bit of ``term`` under hash ``j`` — the _cms_col construction
    (salted md5 low-64, == DuckDB ``md5_number_lower(j || ':' || t)``)
    mod the filter size."""
    import hashlib

    h = hashlib.md5(f"{j}:{term}".encode("utf-8")).digest()
    return int.from_bytes(h[8:16], "little") % _BLOOM_M


class TermBloomPartial(_SimpleTokenStage):
    """batch -> ONE fixed m-bit row: the batch's distinct-term Bloom
    filter (Bloom 1970). Fourth member of the mergeable-sketch family:
    HLL merges by max, Misra-Gries by count-sum, CMS by cell sum,
    Bloom by bitwise OR — order-independent, so the merged filter is
    bit-identical on any partitioning and replays exactly in SQL. The
    shuffle carries one m/8-byte row per batch, never the vocabulary.
    Guarantee: NO false negatives — every indexed term probes all-ones
    (false positives bounded by (1-e^{-kn/m})^k)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = np.arange(len(texts), dtype=np.int64)
        codes, _, tfs, info = self.analyzer.tokenize_batch(texts, ids)
        bits = np.zeros(_BLOOM_M, dtype=bool)
        for t in info["vocab"]:
            for j in range(_BLOOM_K):
                bits[_bloom_bit(j, t)] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()],
                                          pa.binary())})


def _merged_bloom(sf_dir: str) -> np.ndarray:
    partial = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TermBloomPartial, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4))
    acc = np.zeros(_BLOOM_M // 8, dtype=np.uint8)
    for b in partial.iter_batches(batch_format="pyarrow"):
        for buf in b.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8)
    return np.unpackbits(acc).astype(bool)


def term_bloom_bits(sf_dir: str):
    """(bit,) — every set position of the corpus's merged term Bloom
    filter: the integer-exact face of the sketch, hash-verified
    position for position against the SQL replay of the salted-md5
    placement over distinct terms."""
    bits = _merged_bloom(sf_dir)
    return pa.table({"bit": int64_col(np.flatnonzero(bits).astype(np.int64))})


def term_bloom_bits_sql() -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
terms AS (SELECT DISTINCT term FROM toks WHERE term <> '')
SELECT DISTINCT
       CAST(CAST(md5_number_lower(CAST(j.j AS VARCHAR) || ':' || term)
                 AS UHUGEINT) % {_BLOOM_M} AS BIGINT) AS bit
FROM terms CROSS JOIN range(0, {_BLOOM_K}) j(j)
"""


def term_bloom_check(sf_dir: str):
    """(term, maybe_present) for the fixed probe set — a term is
    maybe-present iff ALL k probe bits are set. Present probes MUST
    read true (the no-false-negative guarantee); the absent probe's
    answer is a deterministic function of the data, so even it
    hash-verifies against the SQL replay."""
    bits = _merged_bloom(sf_dir)
    vals = [bool(all(bits[_bloom_bit(j, t)] for j in range(_BLOOM_K)))
            for t in _CMS_PROBES]
    return pa.table({"term": pa.array(_CMS_PROBES, pa.string()),
                     "maybe_present": pa.array(vals, pa.bool_())})


def term_bloom_check_sql() -> str:
    probes = ", ".join(f"('{t}')" for t in _CMS_PROBES)
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
terms AS (SELECT DISTINCT term FROM toks WHERE term <> ''),
bits AS (
  SELECT DISTINCT
         CAST(CAST(md5_number_lower(CAST(j.j AS VARCHAR) || ':' || term)
                   AS UHUGEINT) % {_BLOOM_M} AS BIGINT) AS bit
  FROM terms CROSS JOIN range(0, {_BLOOM_K}) j(j)),
probes(term) AS (VALUES {probes}),
pb AS (
  SELECT p.term,
         CAST(CAST(md5_number_lower(CAST(j.j AS VARCHAR) || ':' || p.term)
                   AS UHUGEINT) % {_BLOOM_M} AS BIGINT) AS bit
  FROM probes p CROSS JOIN range(0, {_BLOOM_K}) j(j))
SELECT pb.term,
       bool_and(bits.bit IS NOT NULL) AS maybe_present
FROM pb LEFT JOIN bits USING (bit)
GROUP BY pb.term
"""


# ---- Zipf slope: corpus rank-frequency exponent ----------------------

_ZIPF_K = 500      # head terms fitted


def zipf_slope(sf_dir: str, k: int = _ZIPF_K):
    """One row (n_terms, slope_bp) — the least-squares slope of
    ln(count) against ln(rank) over the k most frequent terms: the
    corpus's Zipf exponent (natural text sits near −1; templated or
    synthetic corpora drift toward 0) — a one-number corpus-health
    read beside the sketch family. Per-term ln values floor-quantize
    to bp BEFORE the sums and the slope is the n²-scaled all-integer
    form (n·Σxy − ΣxΣy) · 10⁴ // (n·Σx² − (Σx)²), so no float ever
    forms on either side. Shape: the pre-aggregated term_df shuffle,
    per-block local top-k, one k-row merge — vocabulary never
    collects."""
    import math

    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    summed = ds.map_batches(TermDFPartial, batch_format="pyarrow",
                            batch_size=512, concurrency=(1, 4)) \
        .groupby("term").aggregate(Sum("tf_p", alias_name="tf"))

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["tf", "term"],
                                       ascending=[False, True]).head(k)
        return pa.table({"g": int64_col(np.zeros(len(df), np.int64)),
                         "term": pa.array(df["term"].tolist(), pa.string()),
                         "tf": int64_col(df["tf"].to_numpy(np.int64))})

    rows = summed.map_batches(local_topk, batch_format="pyarrow") \
        .groupby("g").map_groups(
            lambda df: df.sort_values(["tf", "term"],
                                      ascending=[False, True]).head(k),
            batch_format="pandas").take_all()
    rows.sort(key=lambda r: (-r["tf"], r["term"]))

    def flq(v: float) -> int:
        return int(math.floor(v * 10000 + 0.5))

    n = len(rows)
    x = np.array([flq(math.log(i + 1)) for i in range(n)], np.int64)
    y = np.array([flq(math.log(r["tf"])) for r in rows], np.int64)
    num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    den = n * int((x * x).sum()) - int(x.sum()) ** 2
    # TRUNCATING division toward zero: DuckDB's integer `//` truncates
    # on negative numerators (-7 // 2 == -3) while Python floors (-4);
    # the slope is negative, so this is the one registry op where the
    # distinction bites — mirror DuckDB explicitly
    scaled = num * 10000
    slope = abs(scaled) // den * (1 if scaled >= 0 else -1)
    return pa.table({"n_terms": int64_col([n]),
                     "slope_bp": int64_col([slope])})


def zipf_slope_sql(k: int = _ZIPF_K) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS tf
          FROM toks WHERE term <> '' GROUP BY term),
head AS (
  SELECT tf, row_number() OVER (ORDER BY tf DESC, term ASC) AS rnk
  FROM tfreq QUALIFY rnk <= {k}),
pts AS (
  SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(tf AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS y
  FROM head),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM pts)
SELECT n AS n_terms,
       CAST((n * sxy - sx * sy) * 10000 // (n * sxx - sx * sx) AS BIGINT)
         AS slope_bp
FROM sums
"""


# ---- winnowing fingerprints (MOSS document fingerprinting) ----

_WIN_K = 8    # k-gram width (chars)
_WIN_W = 4    # winnowing window (k-gram hashes per window)


def _winnow_select(texts: list[str], k: int = _WIN_K, w: int = _WIN_W):
    """Core winnowing selection over a batch of texts: returns
    (doc_idx, hash) per distinct selected position — one vectorized
    pass over the batch-concatenated codepoint array, boundary-crossing
    windows masked. Shared by the pipeline stage and the guarantee
    property test."""
    from searchengine_ray.pipelines.dedup import _span_hashes

    cps = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
           for t in texts]
    lens = np.fromiter((len(c) for c in cps), np.int64, len(cps))
    n = int(lens.sum())
    if n < k + w - 1:
        return np.array([], np.int64), np.array([], np.uint64)
    cp = np.concatenate(cps).astype(np.uint64)
    h = _span_hashes(cp, k)
    doc_of = np.repeat(np.arange(len(cps), dtype=np.int64), lens)
    m = len(h) - w + 1               # window starts over the h array
    if m <= 0:
        return np.array([], np.int64), np.array([], np.uint64)
    # full window: chars s .. s+w+k-2 must stay inside one doc
    valid = doc_of[:m] == doc_of[w + k - 2:]
    starts = np.flatnonzero(valid)
    if len(starts) == 0:
        return np.array([], np.int64), np.array([], np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(h, w)[starts]
    # rightmost min: argmin over the reversed window finds the FIRST
    # min there, i.e. the LAST in the original order
    idx = w - 1 - np.argmin(win[:, ::-1], axis=1)
    sel = np.unique(starts + idx)    # distinct selected positions
    return doc_of[sel], h[sel]


def winnow_fingerprints(sf_dir: str, k: int = _WIN_K, w: int = _WIN_W):
    """(doc_id, n_fp, fp_sum) — winnowing fingerprint selection
    (Schleimer, Wilkerson & Aiken 2003, the MOSS algorithm): every
    ``w``-window of consecutive ``k``-gram rolling hashes selects its
    minimum hash (rightmost on ties), the classic guarantee-bearing
    document fingerprint (any shared substring of length >= k + w - 1
    yields a shared fingerprint). Emits the distinct-selection count
    and the order-free mod-2^61-1 hash sum per doc, so the SELECTED SET
    itself is value-verified, not just its size. Docs with fewer than
    ``w`` k-grams emit nothing (no full window exists).

    Scale shape: one embarrassingly-parallel ``map_batches`` pass, zero
    shuffle — each batch concatenates its docs into a single codepoint
    array, computes all rolling hashes in k vectorized modmul passes
    (shared with ``dedup_spans``), and the window min runs as ONE
    sliding-window argmin over the batch with boundary-crossing windows
    masked. Fingerprint density is ~2/(w+1) per char — the downstream
    index volume knob."""
    M = np.uint64((1 << 61) - 1)

    class WinnowStage:
        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            ids = batch.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            d, hv = _winnow_select(texts, k, w)
            if len(d) == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_fp": pa.array([], pa.int64()),
                                 "fp_sum": pa.array([], pa.int64())})
            uniq_d, inv = np.unique(d, return_inverse=True)
            n_fp = np.bincount(inv).astype(np.int64)
            # order-free exact checksum: per-doc sum of selected hashes
            # mod 2^61-1. h < 2^61 would overflow a uint64 running sum,
            # so the vectorized path splits each h into 32-bit halves,
            # group-sums both exactly in int64 (hi < 2^29, lo < 2^32 per
            # element — no overflow below 2^35 selections per doc), and
            # folds the mod per DOC in Python ints (a #docs-bounded loop,
            # not a #selections one)
            hi = np.zeros(len(uniq_d), dtype=np.int64)
            lo = np.zeros(len(uniq_d), dtype=np.int64)
            np.add.at(hi, inv, (hv >> np.uint64(32)).astype(np.int64))
            np.add.at(lo, inv, (hv & np.uint64(0xFFFFFFFF)).astype(np.int64))
            mod = int(M)
            fp_sum = np.fromiter(
                (((int(a) << 32) + int(b)) % mod for a, b in zip(hi, lo)),
                np.int64, len(uniq_d))
            return pa.table({"doc_id": int64_col(ids[uniq_d]),
                             "n_fp": int64_col(n_fp),
                             "fp_sum": int64_col(fp_sum)})

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        WinnowStage, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4))


def winnow_fingerprints_sql(k: int = _WIN_K, w: int = _WIN_W) -> str:
    """SQL twin: same rolling hash as ``dedup_spans``; the rightmost-min
    tie-break packs (h, reversed pos) into one HUGEINT so a plain
    frame MIN replays the selection exactly."""
    from searchengine_ray.pipelines.dedup import _SPAN_B, _SPAN_M

    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {k} + 1)) AS p
  FROM documents WHERE length(text) >= {k}),
hashes AS (
  SELECT doc_id, p - 1 AS pos,
         CAST(list_reduce(
                list_transform(
                  [substr(text, p + j, 1) for j in generate_series(0, {k - 1})],
                  c -> CAST(ord(c) AS HUGEINT)),
                (a, x) -> (a * {_SPAN_B} + x) % {_SPAN_M}) AS BIGINT) AS h
  FROM pos),
m AS (SELECT doc_id, count(*) AS n_h FROM hashes GROUP BY doc_id),
keys AS (
  SELECT h.doc_id, h.pos, h.h,
         CAST(h.h AS HUGEINT) * 4294967296
           + (4294967295 - h.pos) AS key,
         m.n_h
  FROM hashes h JOIN m ON m.doc_id = h.doc_id),
wins AS (
  SELECT doc_id, pos, n_h,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS min_key
  FROM keys),
sel AS (
  SELECT DISTINCT doc_id,
         4294967295 - CAST(min_key % 4294967296 AS BIGINT) AS sel_pos,
         CAST(min_key // 4294967296 AS BIGINT) AS sel_h
  FROM wins WHERE pos <= n_h - {w})
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
       CAST(sum(CAST(sel_h AS HUGEINT)) % {_SPAN_M} AS BIGINT) AS fp_sum
FROM sel GROUP BY doc_id
"""


_WIN_FP_CAP = 256      # boilerplate cutoff: fingerprints shared by more
                       # than this many docs are dropped (oracle-replicated)
_WIN_MIN_SHARED = 8    # pair survives with >= this many shared fingerprints
_WDP_K = 16            # pair-detection k-gram width: 8-char shingles of
                       # common words make the pair graph near-complete on
                       # template-heavy corpora (measured: k=8 emitted 20%
                       # of ALL doc pairs at sf0.001; k=16 emits the ~27
                       # true near-dups) — guarantee span k + w - 1 = 23
_WDP_W = 8


def winnow_dup_pairs(sf_dir: str, k: int = _WDP_K, w: int = _WDP_W,
                     fp_cap: int = _WIN_FP_CAP,
                     min_shared: int = _WIN_MIN_SHARED):
    """(doc_a, doc_b, n_shared) — MOSS-style similarity pairs: docs
    sharing >= ``min_shared`` distinct winnowing fingerprints, with the
    shared-fingerprint count (the winnowing guarantee makes this a
    sound detector for shared substrings >= k + w - 1 chars). The
    consumer of ``winnow_fingerprints``'s selection — the plagiarism /
    template-detection operator of the fingerprint family, at ~2/(w+1)
    the anchor density of ``dedup_spans``.

    Scale shape: selection is the same zero-shuffle vectorized pass;
    (fingerprint, doc) rows — already per-doc DISTINCT, so volume is
    bounded by fingerprint density — hash-bucket into ONE groupby where
    per-fingerprint doc lists self-join into pairs (boilerplate
    fingerprints above ``fp_cap`` docs dropped, same cutoff in the
    oracle); a second pair-keyed groupby folds shared counts. No
    all-pairs step anywhere."""
    empty = pa.table({"gkey": pa.array([], pa.int64()),
                      "h": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64())})

    class WinnowFpStage:
        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            ids = batch.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            d, hv = _winnow_select(texts, k, w)
            if len(d) == 0:
                return empty
            # distinct (doc, fingerprint): repeated in-doc content
            # selects the same hash at several positions
            pairs = np.unique(np.stack([ids[d], hv.astype(np.int64)],
                                       axis=1), axis=0)
            return pa.table({"gkey": int64_col(pairs[:, 1] % 64),
                             "h": int64_col(pairs[:, 1]),
                             "doc_id": int64_col(pairs[:, 0])})

    def fp_pairs(df: pd.DataFrame) -> pa.Table:
        sizes = df.groupby("h")["doc_id"].transform("size")
        df = df[sizes <= fp_cap]
        m = df.merge(df, on="h")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return pa.table({"jkey": pa.array([], pa.int64()),
                             "doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64())})
        g = m.groupby(["doc_id_x", "doc_id_y"], as_index=False).size()
        a = g["doc_id_x"].to_numpy(np.int64)
        b = g["doc_id_y"].to_numpy(np.int64)
        return pa.table({"jkey": int64_col((a * np.int64(1_000_003) + b) % 64),
                         "doc_a": int64_col(a), "doc_b": int64_col(b),
                         "n_p": int64_col(g["size"].to_numpy(np.int64))})

    def fold_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # pair-keyed co-group: fold per-fingerprint partial counts and
        # trim below min_shared IN the group (a generic two-key Ray
        # Aggregate over the pair partials measured ~20 s at sf0.1;
        # this jkey co-group + pandas C fold is ~1 s for the same rows)
        g = df.groupby(["doc_a", "doc_b"], as_index=False)["n_p"].sum()
        g = g[g["n_p"] >= min_shared]
        return pd.DataFrame({"doc_a": g["doc_a"].to_numpy(np.int64),
                             "doc_b": g["doc_b"].to_numpy(np.int64),
                             "n_shared": g["n_p"].to_numpy(np.int64)})

    fps = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        WinnowFpStage, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4))
    pairs = fps.groupby("gkey").map_groups(fp_pairs, batch_format="pandas")
    return pairs.groupby("jkey").map_groups(fold_pairs, batch_format="pandas")


def winnow_dup_pairs_sql(k: int = _WDP_K, w: int = _WDP_W,
                         fp_cap: int = _WIN_FP_CAP,
                         min_shared: int = _WIN_MIN_SHARED) -> str:
    from searchengine_ray.pipelines.dedup import _SPAN_B, _SPAN_M

    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {k} + 1)) AS p
  FROM documents WHERE length(text) >= {k}),
hashes AS (
  SELECT doc_id, p - 1 AS pos,
         CAST(list_reduce(
                list_transform(
                  [substr(text, p + j, 1) for j in generate_series(0, {k - 1})],
                  c -> CAST(ord(c) AS HUGEINT)),
                (a, x) -> (a * {_SPAN_B} + x) % {_SPAN_M}) AS BIGINT) AS h
  FROM pos),
m AS (SELECT doc_id, count(*) AS n_h FROM hashes GROUP BY doc_id),
keys AS (
  SELECT h.doc_id, h.pos, h.h,
         CAST(h.h AS HUGEINT) * 4294967296
           + (4294967295 - h.pos) AS key,
         m.n_h
  FROM hashes h JOIN m ON m.doc_id = h.doc_id),
wins AS (
  SELECT doc_id, pos, n_h,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS min_key
  FROM keys),
sel AS (
  SELECT DISTINCT doc_id,
         CAST(min_key // 4294967296 AS BIGINT) AS h
  FROM wins WHERE pos <= n_h - {w}),
capped AS (
  SELECT * FROM sel QUALIFY count(*) OVER (PARTITION BY h) <= {fp_cap})
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM capped x JOIN capped y ON x.h = y.h AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
HAVING count(*) >= {min_shared}
"""


# ---- regex scan ("distributed grep") ----

REGEX_QUERIES: list[tuple[int, str]] = [
    (1, "[a-z]+ing"),                 # suffix class
    (2, "(?:data|table) [a-z]+"),     # alternation + following word
    (3, "ba[a-z]*"),                  # prefix expansion
    (4, "[a-z]{6,} scan"),            # bounded repetition + literal
    (5, "zzz[0-9]{3}"),               # no match anywhere
]


def regex_search(sf_dir: str):
    """(query_id, doc_id, n_matches, first_match) — regex scan over the
    corpus: per (pattern, doc), the non-overlapping match count and the
    first match text; only matching docs emit. The distributed-grep
    operator — the ad-hoc scan path beside the indexed retrieval
    family (an index can't answer arbitrary regexes; a full scan with
    compiled patterns per worker is the honest plan, and at 100 TB it
    is one embarrassingly-parallel pruned-column pass, zero shuffle).

    Patterns use explicit ASCII classes and non-capturing groups only,
    so Python ``re`` and DuckDB RE2 agree byte-for-byte (the
    ``pii_scrub`` portability discipline); both sides count
    non-overlapping matches (``finditer`` == ``regexp_extract_all``)."""
    import re

    class RegexScanStage:
        def __init__(self):
            self.pats = [(qid, re.compile(p)) for qid, p in REGEX_QUERIES]

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

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        RegexScanStage, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4))


def regex_search_sql() -> str:
    values = ",\n        ".join(f"({qid}, '{p}')" for qid, p in REGEX_QUERIES)
    return f"""
WITH pats(query_id, pat) AS (VALUES
        {values})
SELECT CAST(p.query_id AS BIGINT) AS query_id, d.doc_id,
       CAST(len(regexp_extract_all(d.text, p.pat)) AS BIGINT) AS n_matches,
       regexp_extract(d.text, p.pat) AS first_match
FROM documents d CROSS JOIN pats p
WHERE len(regexp_extract_all(d.text, p.pat)) > 0
"""


# ---- term burstiness: exact tf moments per term ----


class _BurstinessPartial(_SimpleTokenStage):
    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = np.arange(len(texts), dtype=np.int64)
        codes, docs, tfs, info = self.analyzer.tokenize_batch(texts, ids)
        if len(codes) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df_p": pa.array([], pa.int64()),
                             "tf_p": pa.array([], pa.int64()),
                             "tf2_p": pa.array([], pa.int64())})
        n_terms = len(info["vocab"])
        tfs64 = tfs.astype(np.int64)
        df_p = np.bincount(codes, minlength=n_terms)
        tf_p = np.bincount(codes, weights=tfs64, minlength=n_terms)
        tf2_p = np.bincount(codes, weights=tfs64 * tfs64, minlength=n_terms)
        return pa.table({"term": pa.array(info["vocab"], pa.string()),
                         "df_p": int64_col(df_p),
                         "tf_p": int64_col(tf_p.astype(np.int64)),
                         "tf2_p": int64_col(tf2_p.astype(np.int64))})


def term_burstiness(sf_dir: str):
    """(term, df, tf_sum, tf_sq_sum) — exact per-term tf moments over
    occurring docs: the raw material of burstiness statistics (Church &
    Gale 1995 — content words repeat within a doc far more than a
    Poisson model predicts; variance/mean from these integer sums
    separates topical terms from function words). Pre-aggregated
    per-batch partials, one term groupby; the moments stay exact
    integers so the row is value-verified, not approximated.

    (bincount weights are float64 — exact here since per-batch sums
    stay far under 2^53.)"""
    from ray.data.aggregate import Sum

    partial = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _BurstinessPartial, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4))
    out = partial.groupby("term").aggregate(
        Sum("df_p", alias_name="df"), Sum("tf_p", alias_name="tf_sum"),
        Sum("tf2_p", alias_name="tf_sq_sum"))

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({"term": batch.column("term"),
                         "df": batch.column("df").cast(pa.int64()),
                         "tf_sum": batch.column("tf_sum").cast(pa.int64()),
                         "tf_sq_sum": batch.column("tf_sq_sum").cast(
                             pa.int64())})

    return out.map_batches(cast, batch_format="pyarrow")


def term_burstiness_sql() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
    AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks WHERE term <> '' GROUP BY doc_id, term)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS tf_sum,
       CAST(sum(tf * tf) AS BIGINT) AS tf_sq_sum
FROM tf GROUP BY term
"""


# ---- regex extraction: one row per match (the flat_map/unnest class) ----

EXTRACT_PATTERN = "s[a-z]{3,}"


def regex_extract(sf_dir: str, pattern: str = EXTRACT_PATTERN):
    """(doc_id, match_no, match) — regex EXTRACTION: one output row per
    non-overlapping match, numbered in document order. The flat_map /
    unnest operator class (rows out ≠ rows in) beside the per-doc
    ``regex_search`` counts — the shape of every field-harvesting pass
    (log mining, link extraction, citation harvesting). Zero shuffle;
    compiled pattern per worker; same RE2/re portability discipline."""
    import re

    class ExtractStage:
        def __init__(self):
            self.pat = re.compile(pattern)

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            ids = batch.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            out_d, out_n, out_m = [], [], []
            for i, t in enumerate(texts):
                for j, mt in enumerate(self.pat.finditer(t), start=1):
                    out_d.append(int(ids[i]))
                    out_n.append(j)
                    out_m.append(mt.group(0))
            return pa.table({"doc_id": int64_col(out_d),
                             "match_no": int64_col(out_n),
                             "match": pa.array(out_m, pa.string())})

    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        ExtractStage, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4))


def regex_extract_sql(pattern: str = EXTRACT_PATTERN) -> str:
    return f"""
SELECT doc_id,
       CAST(generate_subscripts(regexp_extract_all(text, '{pattern}'), 1)
            AS BIGINT) AS match_no,
       unnest(regexp_extract_all(text, '{pattern}')) AS match
FROM documents
WHERE len(regexp_extract_all(text, '{pattern}')) > 0
"""


# ---- per-language relative quality filtering (CCNet-style) ----


def _entropy_with_lang(batch: pa.Table) -> pa.Table:
    """(doc_id, lang, entropy_bp) per non-empty doc — the char_entropy
    kernel with the language carried through (empty docs drop on both
    sides, matching the SQL join)."""
    ent = _char_entropy_batch(batch)
    if not ent.num_rows:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "lang": pa.array([], pa.string()),
                         "entropy_bp": pa.array([], pa.int64())})
    lang_of = dict(zip(
        batch.column("doc_id").to_numpy(zero_copy_only=False).tolist(),
        batch.column("lang").to_pylist()))
    ids = ent.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table({"doc_id": ent.column("doc_id"),
                     "lang": pa.array([lang_of[i] for i in ids.tolist()],
                                      pa.string()),
                     "entropy_bp": ent.column("entropy_bp")})


def _entropy_hist_partial(batch: pa.Table) -> pa.Table:
    """Bounded (lang, v, c_p) histogram partials: distinct entropy_bp
    values are capped by the value space (<= ln(max_doc_len)*1e4 —
    corpus-size-INDEPENDENT), so the histogram never grows with docs."""
    t = _entropy_with_lang(batch)
    if not t.num_rows:
        return pa.table({"lang": pa.array([], pa.string()),
                         "v": pa.array([], pa.int64()),
                         "c_p": pa.array([], pa.int64())})
    df = t.to_pandas().groupby(["lang", "entropy_bp"]).size().reset_index()
    return pa.table({"lang": pa.array(df["lang"].tolist(), pa.string()),
                     "v": int64_col(df["entropy_bp"].to_numpy(np.int64)),
                     "c_p": int64_col(df[0].to_numpy(np.int64))})


class _PercentileScore:
    """Second scan: entropy per doc + percentile lookup against the
    broadcast per-lang cumulative histogram — zero shuffle."""

    def __init__(self, hist_ref, keep_u: int):
        import ray

        self.hist = ray.get(hist_ref)   # lang -> (vals sorted, cum_le, n_l)
        self.keep_u = keep_u

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = _entropy_with_lang(batch)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        langs = t.column("lang").to_pylist()
        v = t.column("entropy_bp").to_numpy(zero_copy_only=False)
        pct = np.zeros(len(ids), np.int64)
        for lang in set(langs):
            vals, cum, n_l = self.hist[lang]
            sel = np.fromiter((la == lang for la in langs), bool, len(langs))
            pos = np.searchsorted(vals, v[sel], side="right")
            cnt_le = np.where(pos > 0, cum[pos - 1], 0)
            pct[sel] = 1_000_000 * cnt_le // n_l
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang": t.column("lang"),
                         "entropy_bp": t.column("entropy_bp"),
                         "pct_u": int64_col(pct),
                         "keep": int64_col(
                             (pct >= self.keep_u).astype(np.int64))})


def quality_percentile_by_lang(sf_dir: str, keep_u: int = 700_000):
    """(doc_id, lang, entropy_bp, pct_u, keep) — each document's quality
    PERCENTILE within its own language, plus the relative keep decision
    (top 30% by default): CCNet's per-language relative filtering — an
    absolute threshold over-prunes low-resource languages whose whole
    score distribution sits lower, so production filters threshold the
    within-language rank, not the raw score. Metric here = char
    entropy (already exact-integer); the mechanism is metric-agnostic.

    pct_u = 1e6 * |{docs in lang with value <= v}| // n_lang — exact
    integer cume_dist, bit-identical to the SQL window replay. Shape:
    scan 1 emits BOUNDED (lang, value) histogram partials (value space
    is corpus-size-independent) -> one (lang, value) groupby -> a
    bounded driver pull broadcast once via ray.put; scan 2 scores with
    ZERO shuffle (the DSIR two-scan pattern). No doc-scale sort, no
    per-lang windowing over corpus-scale groups."""
    import ray
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text", "lang"])
    hist_rows = ds.map_batches(_entropy_hist_partial, batch_format="pyarrow",
                               batch_size=1024) \
        .groupby(["lang", "v"]).aggregate(Sum("c_p", alias_name="c")) \
        .take_all()                       # bounded: langs x value-space
    hist: dict[str, tuple] = {}
    by_lang: dict[str, list] = {}
    for r in hist_rows:
        by_lang.setdefault(r["lang"], []).append((int(r["v"]), int(r["c"])))
    for lang, vc in by_lang.items():
        vc.sort()
        vals = np.array([v for v, _ in vc], np.int64)
        cum = np.cumsum(np.array([c for _, c in vc], np.int64))
        hist[lang] = (vals, cum, int(cum[-1]))
    hist_ref = ray.put(hist)
    return ds.map_batches(_PercentileScore,
                          fn_constructor_args=(hist_ref, keep_u),
                          batch_format="pyarrow", batch_size=1024,
                          concurrency=(1, 4))


def quality_percentile_by_lang_sql(keep_u: int = 700_000) -> str:
    return f"""
WITH cc AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS ch
        FROM documents WHERE length(text) > 0)
  WHERE ch <> ''
  GROUP BY doc_id, ch),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
         CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                             * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM cc GROUP BY doc_id),
e AS (
  SELECT doc_id,
         CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
           - s // n_chars AS entropy_bp
  FROM agg),
d AS (SELECT e.doc_id, doc.lang, e.entropy_bp
      FROM e JOIN documents doc USING (doc_id)),
w AS (
  SELECT *,
         count(*) OVER (PARTITION BY lang ORDER BY entropy_bp
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cnt_le,
         count(*) OVER (PARTITION BY lang) AS n_l
  FROM d)
SELECT doc_id, lang, entropy_bp,
       CAST(1000000 * cnt_le // n_l AS BIGINT) AS pct_u,
       CAST(CASE WHEN 1000000 * cnt_le // n_l >= {keep_u}
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM w
"""


# ---- corpus-frequency boilerplate-line removal (CCNet-style) ----

_BP_HEADER = "LICENSE: sample header boilerplate"
_BP_FOOTER = "-- generated footer; do not edit"


def _bp_inject(ids: np.ndarray, texts: list[str]) -> list[str]:
    """Deterministic doc_id-derived boilerplate lines (header on %3,
    footer on %4), mirrored EXACTLY in the oracle SQL — the pii_scrub
    seeded-literal convention: the synthetic corpus has no multi-line
    boilerplate, so the registry row plants some; production callers
    run the scrub stages on their real lines and this injection drops
    out."""
    out = []
    for i, t in zip(ids.tolist(), texts):
        if i % 3 == 0:
            t = _BP_HEADER + "\n" + t
        if i % 4 == 0:
            t = t + "\n" + _BP_FOOTER
        out.append(t)
    return out


def _bp_line_counts(batch: pa.Table) -> pa.Table:
    """(line, c_p) per-batch partial occurrence counts over non-empty
    lines — the TermDFPartial shape at line granularity."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    s = pd.Series(_bp_inject(ids, batch.column("text").to_pylist()))
    lines = s.str.split("\n").explode()
    lines = lines[lines != ""]
    vc = lines.value_counts()
    return pa.table({"line": pa.array(vc.index.tolist(), pa.string()),
                     "c_p": int64_col(vc.to_numpy(np.int64))})


class _BoilerplateScrub:
    """Second scan: drop corpus-hot lines per doc, emit the kept-content
    digest — the broadcast hot set is bounded at total_lines/min_count
    entries by construction."""

    def __init__(self, hot_ref):
        import ray

        self.hot = ray.get(hot_ref)                  # set[str]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = _bp_inject(ids, batch.column("text").to_pylist())
        n_lines = np.zeros(len(texts), np.int64)
        n_drop = np.zeros(len(texts), np.int64)
        digests = []
        for j, t in enumerate(texts):
            lines = [ln for ln in t.split("\n") if ln != ""]
            kept = [ln for ln in lines if ln not in self.hot]
            n_lines[j] = len(lines)
            n_drop[j] = len(lines) - len(kept)
            digests.append(hashlib.md5("\n".join(kept).encode()).hexdigest())
        return pa.table({"doc_id": int64_col(ids),
                         "n_lines": int64_col(n_lines),
                         "n_dropped": int64_col(n_drop),
                         "kept_md5": pa.array(digests, pa.string())})


def boilerplate_lines(sf_dir: str, min_count: int = 50):
    """(doc_id, n_lines, n_dropped, kept_md5) — corpus-frequency
    boilerplate-LINE removal: any line occurring >= min_count times
    corpus-wide (license headers, generated-file banners, nav chrome)
    is scrubbed from every document; kept_md5 digests the surviving
    content so the gate hash-checks the EXACT post-scrub text of every
    doc. This is CCNet's duplicated-paragraph removal at line
    granularity — the other classic text-level curation pass beside
    the per-doc Gopher filters (`repetition_quality` measures
    WITHIN-doc repetition; this removes ACROSS-doc repetition).

    Shape: scan 1 emits (line, count) partials -> ONE line groupby ->
    the hot set (bounded at total_lines/min_count rows — raise
    min_count with corpus size, or swap the set for a Bloom filter at
    extreme scale) broadcasts via ray.put; scan 2 scrubs zero-shuffle.
    The gate row plants deterministic doc_id-derived header/footer
    lines (the pii_scrub seeded-literal convention) because the
    synthetic corpus is single-line."""
    import ray
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    counts = ds.map_batches(_bp_line_counts, batch_format="pyarrow",
                            batch_size=1024) \
        .groupby("line").aggregate(Sum("c_p", alias_name="c"))

    def only_hot(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(c >= min_count))

    hot_rows = counts.map_batches(only_hot, batch_format="pyarrow").take_all()
    hot_ref = ray.put({r["line"] for r in hot_rows})
    return ds.map_batches(_BoilerplateScrub, fn_constructor_args=(hot_ref,),
                          batch_format="pyarrow", batch_size=1024,
                          concurrency=(1, 4))


def boilerplate_lines_sql(min_count: int = 50) -> str:
    return f"""
WITH d AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN '{_BP_HEADER}' || chr(10)
               ELSE '' END)
         || text ||
         (CASE WHEN doc_id % 4 = 0 THEN chr(10) || '{_BP_FOOTER}'
               ELSE '' END) AS text
  FROM documents),
ln AS (
  SELECT doc_id, ord, line FROM (
    SELECT doc_id, CAST(generate_subscripts(ls, 1) AS BIGINT) AS ord,
           unnest(ls) AS line
    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d))
  WHERE line <> ''),
hot AS (SELECT line FROM ln GROUP BY line HAVING count(*) >= {min_count}),
kept AS (SELECT * FROM ln WHERE line NOT IN (SELECT line FROM hot)),
ka AS (SELECT doc_id, count(*) AS n_kept,
              md5(string_agg(line, chr(10) ORDER BY ord)) AS kept_md5
       FROM kept GROUP BY doc_id),
la AS (SELECT doc_id, count(*) AS n_lines FROM ln GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(la.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(COALESCE(la.n_lines, 0) - COALESCE(ka.n_kept, 0) AS BIGINT)
         AS n_dropped,
       COALESCE(ka.kept_md5, md5('')) AS kept_md5
FROM d LEFT JOIN la USING (doc_id) LEFT JOIN ka USING (doc_id)
"""


# ---- composed release pipeline (session-4 curation family) ----


class _ReleaseScan:
    """ONE text pass computing the quality keep bit AND the boilerplate
    scrub per doc — train-side survivors leave as metadata rows (text
    dropped at the scan, the _CurationScan discipline)."""

    def __init__(self, hot_ref, n_jparts: int):
        import ray

        self.hot = ray.get(hot_ref)
        self.n_jparts = n_jparts

    def __call__(self, batch: pa.Table) -> pa.Table:
        from searchengine_ray.pipelines.dedup import _EVAL_MOD

        q = _quality_filter_batch(batch)
        sc = _BoilerplateScrub.__call__(self, batch)   # shares self.hot
        ids = sc.column("doc_id").to_numpy(zero_copy_only=False)
        keepq = q.column("keep").to_numpy(zero_copy_only=False)
        m = (keepq == 1) & (ids % _EVAL_MOD != 0)
        sc = sc.filter(pa.array(m))
        ids = ids[m]
        return pa.table({
            "jpart": int64_col(ids % self.n_jparts),
            "doc_id": sc.column("doc_id"),
            "n_lines": sc.column("n_lines"),
            "n_dropped": sc.column("n_dropped"),
            "kept_md5": sc.column("kept_md5"),
            "side": int64_col(np.zeros(len(ids), np.int64))})


def release_pipeline(sf_dir: str, min_count: int = 50):
    """(doc_id, n_lines, n_dropped, kept_md5) — the composed RELEASE
    flow over the session-4 curation family, as one lazy streaming job:

      quality gate AND boilerplate-line scrub (ONE text pass,
        `_ReleaseScan` — metadata out, text dropped at the scan)
      -> exact-span decontamination anti-join (`ngram_contamination`
        drop-list through the co-located groupby(jpart) shape)

    The second composition row beside `curation_pipeline`: that one
    proves the quality/mixture/MinHash/packing family composes; this
    proves the NEWER family (composed quality bitmask, corpus-frequency
    scrub, verbatim-overlap decontamination) does too, sharing one
    scan and metadata-only exchanges. The oracle nests the exact
    generator SQL of each piece; a composition-invariant test asserts
    the result equals the intersection of the standalone ops."""
    import ray
    from ray.data.aggregate import Sum

    n_jparts = 64
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    counts = ds.map_batches(_bp_line_counts, batch_format="pyarrow",
                            batch_size=1024) \
        .groupby("line").aggregate(Sum("c_p", alias_name="c"))

    def only_hot(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(c >= min_count))

    hot_ref = ray.put({r["line"] for r in counts.map_batches(
        only_hot, batch_format="pyarrow").take_all()})

    scanned = ds.map_batches(_ReleaseScan,
                             fn_constructor_args=(hot_ref, n_jparts),
                             batch_format="pyarrow", batch_size=1024,
                             concurrency=(1, 4))

    from searchengine_ray.pipelines.dedup import ngram_contamination

    def drop_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        z = np.zeros(len(ids), np.int64)
        return pa.table({"jpart": int64_col(ids % n_jparts),
                         "doc_id": int64_col(ids), "n_lines": int64_col(z),
                         "n_dropped": int64_col(z),
                         "kept_md5": pa.array([""] * len(ids), pa.string()),
                         "side": int64_col(np.ones(len(ids), np.int64))})

    drops = ngram_contamination(sf_dir).map_batches(
        drop_side, batch_format="pyarrow")

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["side"] == 0]
        dead = set(df.loc[df["side"] == 1, "doc_id"].to_numpy())
        live = docs[~docs["doc_id"].isin(dead)]
        return live[["doc_id", "n_lines", "n_dropped", "kept_md5"]]

    return scanned.union(drops).groupby("jpart").map_groups(
        anti, batch_format="pandas")


def release_pipeline_sql(min_count: int = 50) -> str:
    from searchengine_ray.pipelines.dedup import (_EVAL_MOD,
                                                  ngram_contamination_sql)

    return f"""
SELECT b.doc_id, b.n_lines, b.n_dropped, b.kept_md5
FROM ({boilerplate_lines_sql(min_count)}) b
WHERE b.doc_id % {_EVAL_MOD} <> 0
  AND b.doc_id IN (SELECT doc_id FROM ({quality_filter_sql()}) q
                   WHERE q.keep = 1)
  AND b.doc_id NOT IN (SELECT doc_id FROM ({ngram_contamination_sql()}) c)
"""


# ---------------- context-window chunking (training prep) ----------------


class _ChunkDocs:
    """map_batches: explode each doc into fixed-size token windows.

    Pure per-row map — zero shuffle, streams at any corpus size; the
    chunk text itself leaves the task only as an md5 digest, so the
    output is metadata-scale even when chunks overlap (stride <
    chunk_len re-emits the overlap region once per window)."""

    def __init__(self, chunk_len: int, stride: int):
        import re

        self.ws = re.compile(r"\S+")
        self.chunk_len, self.stride = chunk_len, stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        o_d, o_c, o_s, o_n, o_m = [], [], [], [], []
        for did, text in zip(ids.tolist(), batch.column("text").to_pylist()):
            toks = self.ws.findall(text)
            starts = list(range(0, len(toks), self.stride)) or [0]
            for ci, st in enumerate(starts):
                w = toks[st:st + self.chunk_len]
                o_d.append(did)
                o_c.append(ci)
                o_s.append(st)
                o_n.append(len(w))
                o_m.append(hashlib.md5(" ".join(w).encode()).hexdigest())
        return pa.table({"doc_id": int64_col(np.asarray(o_d, np.int64)),
                         "chunk_id": int64_col(np.asarray(o_c, np.int64)),
                         "tok_start": int64_col(np.asarray(o_s, np.int64)),
                         "n_tokens": int64_col(np.asarray(o_n, np.int64)),
                         "chunk_md5": pa.array(o_m, pa.string())})


def chunk_documents(sf_dir: str, chunk_len: int = 64, stride: int = 48):
    """(doc_id, chunk_id, tok_start, n_tokens, chunk_md5) — split every
    document's whitespace-token stream into ``chunk_len``-token windows
    every ``stride`` tokens (stride < chunk_len overlaps neighbours by
    chunk_len - stride tokens): the context-window chunking pass that
    prepares long documents for a fixed-context trainer or a passage
    retriever. The complement of ``pack_sequences`` (that op
    concatenates SHORT docs into windows; this one splits LONG docs),
    and the digest column hash-checks the EXACT text of every chunk.
    Empty docs emit one empty chunk so no document silently vanishes.

    Shape: a pure per-row map over one corpus scan — zero shuffle,
    nothing driver-side, output rows are 40-byte metadata + one digest
    per chunk."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _ChunkDocs, fn_constructor_args=(chunk_len, stride),
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))


def chunk_documents_sql(chunk_len: int = 64, stride: int = 48) -> str:
    return f"""
WITH s AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t
           FROM documents),
c AS (
  SELECT doc_id, t,
         unnest(generate_series(0, greatest(len(t) - 1, 0), {stride}))
           AS tok_start
  FROM s)
SELECT doc_id,
       CAST(tok_start // {stride} AS BIGINT) AS chunk_id,
       CAST(tok_start AS BIGINT) AS tok_start,
       CAST(len(list_slice(t, tok_start + 1, tok_start + {chunk_len}))
            AS BIGINT) AS n_tokens,
       md5(array_to_string(
           list_slice(t, tok_start + 1, tok_start + {chunk_len}), ' '))
         AS chunk_md5
FROM c
"""


# ------------- windowed co-occurrence counts (word2vec prep) -------------


class _CooccurPartial:
    """Per-batch partial windowed-pair counts: tokens factorize to
    LEXICOGRAPHIC integer codes (np.unique), each distance d in 1..w
    is one vectorized shifted compare over the code array (pairs never
    span documents — a per-token doc index array gates every shift),
    and np.unique counts unordered (min,max) code pairs. Strings are
    built only for the distinct pairs, so the shuffle sees one
    (pair, c_p) row per distinct pair per batch — n_batches rows per
    group downstream at worst, hot pairs included."""

    def __init__(self, window: int):
        import re

        self.tok = re.compile(r"[a-z0-9_]+")
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        docix: list[int] = []
        for i, text in enumerate(batch.column("text").to_pylist()):
            t = self.tok.findall(text.lower())
            toks.extend(t)
            docix.extend([i] * len(t))
        if len(toks) < 2:
            return pa.table({"pair": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        uniq, codes = np.unique(np.asarray(toks, dtype=object),
                                return_inverse=True)
        codes = codes.astype(np.int64)
        dix = np.asarray(docix, np.int64)
        v = len(uniq)
        pieces = []
        for d in range(1, self.window + 1):
            if d >= len(codes):
                break
            a, b = codes[:-d], codes[d:]
            same = dix[:-d] == dix[d:]
            lo = np.minimum(a, b)[same]
            hi = np.maximum(a, b)[same]
            pieces.append(lo * v + hi)
        if not pieces:
            return pa.table({"pair": pa.array([], pa.string()),
                             "c_p": pa.array([], pa.int64())})
        pair_codes, counts = np.unique(np.concatenate(pieces),
                                       return_counts=True)
        pairs = [f"{uniq[p // v]} {uniq[p % v]}" for p in pair_codes.tolist()]
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "c_p": int64_col(counts.astype(np.int64))})


def cooccur_window(sf_dir: str, window: int = 4, k: int = 100):
    """(rank, pair, count) — the corpus's k most frequent UNORDERED
    token pairs co-occurring within ``window`` positions in the same
    document (counted per occurrence): the skip-gram co-occurrence
    statistic behind word2vec negative sampling, GloVe's X matrix and
    PMI-based embedding methods. ``top_bigrams``/``bigram_pmi`` count
    ADJACENT pairs only; this is the general windowed class. Ties break
    (count desc, pair asc) so the cut is deterministic.

    Shape: identical to ``top_bigrams`` — per-batch distinct partials
    (the window multiplies per-batch work by w but NOT group fan-in),
    one pair-key groupby Sum, per-block local top-k, one bounded
    k x n_blocks merge. Pair-vocabulary scale never leaves the
    cluster; only k-sized prefixes reach the driver path."""
    from ray.data.aggregate import Sum

    partial = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _CooccurPartial, fn_constructor_args=(window,),
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))
    summed = partial.groupby("pair").aggregate(Sum("c_p", alias_name="count"))

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["count", "pair"],
                                       ascending=[False, True]).head(k)
        return pa.table({"g": int64_col(np.zeros(len(df), np.int64)),
                         "pair": pa.array(df["pair"].tolist(), pa.string()),
                         "count": int64_col(df["count"].to_numpy(np.int64))})

    def final_topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["count", "pair"],
                            ascending=[False, True]).head(k)
        return pa.table({
            "rank": int64_col(np.arange(1, len(df) + 1)),
            "pair": pa.array(df["pair"].tolist(), pa.string()),
            "count": int64_col(df["count"].to_numpy(np.int64))})

    pruned = summed.map_batches(local_topk, batch_format="pyarrow")
    return pruned.groupby("g").map_groups(final_topk, batch_format="pandas") \
        .select_columns(["rank", "pair", "count"])


def cooccur_window_sql(window: int = 4, k: int = 100) -> str:
    return f"""
WITH s AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                     x -> x <> '') AS t
  FROM documents),
p AS (
  SELECT doc_id, unnest(t) AS tok,
         unnest(generate_series(1, len(t))) AS pos
  FROM s),
pairs AS (
  SELECT least(p1.tok, p2.tok) || ' ' || greatest(p1.tok, p2.tok) AS pair
  FROM p p1 JOIN p p2
    ON p1.doc_id = p2.doc_id
   AND p2.pos > p1.pos AND p2.pos <= p1.pos + {window}),
c AS (SELECT pair, CAST(count(*) AS BIGINT) AS count FROM pairs GROUP BY pair),
r AS (SELECT *, row_number() OVER (ORDER BY count DESC, pair ASC) AS rnk
      FROM c)
SELECT CAST(rnk AS BIGINT) AS rank, pair, count FROM r WHERE rnk <= {k}
"""


# ---- significant terms: result-set analytics (ES significant_terms) ----

SIGTERM_FILTERS: tuple[str, ...] = ("hash", "window", "dup")
SIGTERM_TOPK = 15


class _SigTermsPartial(_SimpleTokenStage):
    """batch -> per-term partials: background df + per-filter foreground
    df (distinct docs containing the term AMONG docs that contain the
    filter term). One tokenize pass yields all columns; a sentinel
    ``term=''`` row carries the batch's doc count (the tokenizer can
    never emit the empty string, so the channel is collision-free)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = np.arange(len(texts), dtype=np.int64)
        codes, docs, tfs, info = self.analyzer.tokenize_batch(texts, ids)
        vocab = list(info["vocab"])
        n_terms = len(vocab)
        if n_terms == 0:
            cols = {"term": pa.array([], pa.string()),
                    "bg_p": pa.array([], pa.int64())}
            for j in range(len(SIGTERM_FILTERS)):
                cols[f"fg{j}_p"] = pa.array([], pa.int64())
            return pa.table(cols)
        bg_p = np.bincount(codes, minlength=n_terms).astype(np.int64)
        code_of = {t: i for i, t in enumerate(vocab)}
        fg_cols = []
        for f in SIGTERM_FILTERS:
            fc = code_of.get(f)
            member = np.zeros(len(texts), dtype=bool)
            if fc is not None:
                member[docs[codes == fc]] = True
            sel = member[docs]
            fg_cols.append(np.bincount(codes[sel], minlength=n_terms)
                           .astype(np.int64))
        # sentinel row: term='' carries #docs with >=1 token in batch
        terms = vocab + [""]
        bg = np.concatenate([bg_p, [np.unique(docs).size]])
        cols = {"term": pa.array(terms, pa.string()), "bg_p": int64_col(bg)}
        for j, fg in enumerate(fg_cols):
            cols[f"fg{j}_p"] = int64_col(np.concatenate([fg, [0]]))
        return pa.table(cols)


def significant_terms(sf_dir: str):
    """(filter_term, term, fg_n, bg_n, score_mp) — Elasticsearch-class
    ``significant_terms`` result-set analytics: for each foreground
    filter (docs containing the filter term) the top-15 terms by JLH
    significance ``(fg% - bg%) * (fg% / bg%)`` against the whole-corpus
    background (scores in millionths; negative/zero significance -> 0).

    Scale shape: ONE tokenize pass emits per-batch exact partials
    (term, bg_df, per-filter fg_df) — the term groupby only moves one
    row per (term, batch); the global stats the scorer needs (corpus
    doc count via the sentinel row, foreground sizes = the filter
    terms' own bg rows) are a BOUNDED ``len(filters)+1``-row fetch
    broadcast to a vectorized scoring stage; each scoring batch
    locally prunes to its top-15 per filter before the final
    len(filters)-group selection — vocabulary-scale rows never
    concentrate in one task."""
    import ray
    from ray.data.aggregate import Sum

    nf = len(SIGTERM_FILTERS)
    partial = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _SigTermsPartial, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4))
    aggs = [Sum("bg_p", alias_name="bg_n")] + [
        Sum(f"fg{j}_p", alias_name=f"fg{j}_n") for j in range(nf)]
    summed = partial.groupby("term").aggregate(*aggs)

    # bounded stats fetch: sentinel + one row per filter term
    import pyarrow.compute as pc

    keys = pa.array(("",) + SIGTERM_FILTERS, pa.string())

    def pick_stats(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("term"), value_set=keys))

    stat_rows = summed.map_batches(
        pick_stats, batch_format="pyarrow").take_all()
    by_term = {r["term"]: r for r in stat_rows}
    n_docs = float(by_term[""]["bg_n"])
    n_fg = [float(by_term[f]["bg_n"]) if f in by_term else 0.0
            for f in SIGTERM_FILTERS]

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        df = df[df["term"] != ""]
        outs = []
        for j, f in enumerate(SIGTERM_FILTERS):
            if n_fg[j] == 0:
                continue
            fgp = df[f"fg{j}_n"].to_numpy(np.float64) / n_fg[j]
            bgp = df["bg_n"].to_numpy(np.float64) / n_docs
            jlh = np.where(fgp > bgp, (fgp - bgp) * (fgp / bgp), 0.0)
            mp = np.floor(jlh * 1000000.0 + 0.5).astype(np.int64)
            part = pd.DataFrame({
                "filter_term": f, "term": df["term"].to_numpy(),
                "fg_n": df[f"fg{j}_n"].to_numpy(np.int64),
                "bg_n": df["bg_n"].to_numpy(np.int64), "score_mp": mp})
            part = part[part.fg_n > 0]
            part = part.sort_values(
                ["score_mp", "term"], ascending=[False, True]
            ).head(SIGTERM_TOPK)          # local prune before the groupby
            outs.append(part)
        if outs:
            cat = pd.concat(outs, ignore_index=True)
        else:
            cat = pd.DataFrame({"filter_term": [], "term": [], "fg_n": [],
                                "bg_n": [], "score_mp": []})
        return pa.table({
            "filter_term": pa.array(cat["filter_term"], pa.string()),
            "term": pa.array(cat["term"], pa.string()),
            "fg_n": pa.array(cat["fg_n"].astype(np.int64), pa.int64()),
            "bg_n": pa.array(cat["bg_n"].astype(np.int64), pa.int64()),
            "score_mp": pa.array(cat["score_mp"].astype(np.int64), pa.int64())})

    def top(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.sort_values(["score_mp", "term"],
                             ascending=[False, True]).head(SIGTERM_TOPK)

    return summed.map_batches(score, batch_format="pyarrow") \
                 .groupby("filter_term").map_groups(top, batch_format="pandas")


def significant_terms_sql() -> str:
    filt = ", ".join(f"('{f}')" for f in SIGTERM_FILTERS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term FROM toks WHERE term <> '' GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS bg_n FROM tf GROUP BY term),
nstat AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
filters(fterm) AS (VALUES {filt}),
fgdocs AS (SELECT f.fterm, t.doc_id FROM filters f JOIN tf t ON t.term = f.fterm),
nfg AS (SELECT fterm, CAST(count(*) AS DOUBLE) AS n_fg FROM fgdocs GROUP BY fterm),
fg AS (SELECT fd.fterm, t.term, CAST(count(*) AS BIGINT) AS fg_n
       FROM fgdocs fd JOIN tf t ON t.doc_id = fd.doc_id
       GROUP BY fd.fterm, t.term),
scored AS (
  SELECT fg.fterm AS filter_term, fg.term, fg.fg_n, df.bg_n,
         CAST(floor(CASE WHEN fg.fg_n / nfg.n_fg > df.bg_n / s.n
                         THEN (fg.fg_n / nfg.n_fg - df.bg_n / s.n)
                              * ((fg.fg_n / nfg.n_fg) / (df.bg_n / s.n))
                         ELSE 0.0 END * 1000000 + 0.5) AS BIGINT) AS score_mp
  FROM fg JOIN df ON df.term = fg.term
  JOIN nfg ON nfg.fterm = fg.fterm
  CROSS JOIN nstat s),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY filter_term
                               ORDER BY score_mp DESC, term ASC) AS rnk
  FROM scored)
SELECT filter_term, term, fg_n, bg_n, score_mp
FROM ranked WHERE rnk <= {SIGTERM_TOPK}
"""


# ---- bigram LM doc log-probability (context-dependent perplexity) ----

_DLS_TAGGED_SCHEMA = pa.schema([
    ("k1", pa.int64()), ("src", pa.int64()), ("key", pa.string()),
    ("doc_id", pa.int64()), ("n", pa.int64()), ("s_bp", pa.int64()),
])


class _DocBigramRows:
    """batch -> pre-aggregated (doc_id, key='x y', n) rows: each doc's
    adjacent-pair multiset, one row per distinct (doc, bigram)."""

    def __init__(self, firsts_only: bool = False):
        import re

        self.tok = re.compile(r"[a-z0-9_]+")
        self.firsts_only = firsts_only

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        out_d, out_k, out_n = [], [], []
        for did, text in zip(ids.tolist(), batch.column("text").to_pylist()):
            t = self.tok.findall(text.lower())
            if len(t) < 2:
                continue
            if self.firsts_only:
                keys = t[:-1]                       # bigram FIRST tokens
            else:
                keys = [f"{a} {b}" for a, b in zip(t[:-1], t[1:])]
            uniq, counts = np.unique(np.asarray(keys, dtype=object),
                                     return_counts=True)
            out_d.append(np.full(len(uniq), did, np.int64))
            out_k.append(uniq)
            out_n.append(counts.astype(np.int64))
        if not out_d:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "key": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"doc_id": int64_col(np.concatenate(out_d)),
                         "key": pa.array(np.concatenate(out_k), pa.string()),
                         "n": int64_col(np.concatenate(out_n))})


class _LogSumScoreOrTag:
    """(doc_id, key, n) rows -> tagged union rows for the head/cold
    split (the unigram_logprob pattern generalized to any key->count
    table): head keys (count >= head_cnt, broadcast) score inline with
    ``s_bp = floor(n * ln(count) * 1e4 + 0.5)`` PRE-SUMMED per doc;
    cold rows co-group with count entries under a bounded gkey."""

    def __init__(self, head_ref, dparts: int, n_groups: int):
        import math

        import ray

        head = ray.get(head_ref) if not isinstance(head_ref, dict) else head_ref
        self.lp = {k: math.log(int(c)) for k, c in head.items()}
        self.dparts = dparts
        self.n_groups = n_groups

    def __call__(self, batch: pa.Table) -> pa.Table:
        from zlib import crc32

        if batch.num_rows == 0:
            return _DLS_TAGGED_SCHEMA.empty_table()
        keys = np.asarray(batch.column("key").to_pylist(), dtype=object)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        lp = np.fromiter((self.lp.get(k, np.nan) for k in keys),
                         np.float64, len(keys))
        hot = ~np.isnan(lp)
        out = {"k1": [], "src": [], "key": [], "doc_id": [], "n": [], "s_bp": []}
        if hot.any():
            hb = bp(n[hot].astype(np.float64) * lp[hot])
            uniq, inv = np.unique(did[hot], return_inverse=True)
            n_sum = np.bincount(inv, weights=n[hot]).astype(np.int64)
            s_sum = np.bincount(inv, weights=hb).astype(np.int64)
            out["k1"].append(self.n_groups + uniq % (8 * self.dparts))
            out["src"].append(np.full(len(uniq), 2, np.int64))
            out["key"].append(np.full(len(uniq), "", object))
            out["doc_id"].append(uniq)
            out["n"].append(n_sum)
            out["s_bp"].append(s_sum)
        cold = ~hot
        if cold.any():
            ck = keys[cold]
            gk = np.fromiter((crc32(k.encode()) % self.n_groups for k in ck),
                             np.int64, len(ck))
            z = np.zeros(cold.sum(), np.int64)
            out["k1"].append(gk)
            out["src"].append(z)
            out["key"].append(ck)
            out["doc_id"].append(did[cold])
            out["n"].append(n[cold])
            out["s_bp"].append(z)
        return pa.table(
            {"k1": int64_col(np.concatenate(out["k1"])),
             "src": int64_col(np.concatenate(out["src"])),
             "key": pa.array(np.concatenate(out["key"]), pa.string()),
             "doc_id": int64_col(np.concatenate(out["doc_id"])),
             "n": int64_col(np.concatenate(out["n"])),
             "s_bp": int64_col(np.concatenate(out["s_bp"]))},
            schema=_DLS_TAGGED_SCHEMA)


def _logsum_score_cold(df: pd.DataFrame) -> pa.Table:
    """k1 co-group body: cold rows join count entries of the same gkey
    (max group bounded — every cold key has count < head_cnt), score,
    pre-sum per doc; hot groups (src=2) pass through summed."""
    import math

    rows = df[df["src"] == 0]
    if len(rows):
        ent = df[df["src"] == 1]
        lp_map = {k: math.log(int(c)) for k, c in zip(ent["key"], ent["n"])}
        lp = rows["key"].map(lp_map).to_numpy(np.float64)
        lb = bp(rows["n"].to_numpy(np.float64) * lp)
        g = pd.DataFrame({"doc_id": rows["doc_id"].to_numpy(np.int64),
                          "n": rows["n"].to_numpy(np.int64),
                          "s_bp": lb}).groupby("doc_id", as_index=False).sum()
        return pa.table({"doc_id": int64_col(g["doc_id"].to_numpy()),
                         "n": int64_col(g["n"].to_numpy()),
                         "s_bp": int64_col(g["s_bp"].to_numpy())})
    hot = df[df["src"] == 2]
    return pa.table({"doc_id": int64_col(hot["doc_id"].to_numpy(np.int64)),
                     "n": int64_col(hot["n"].to_numpy(np.int64)),
                     "s_bp": int64_col(hot["s_bp"].to_numpy(np.int64))})


def _doc_log_sum(sf_dir: str, counts_ds, firsts_only: bool, head_cnt: int,
                 n_groups: int, dparts: int):
    """Dataset (doc_id, n, s_bp) with s_bp = Σ_rows floor(n·ln(count)·1e4
    + 0.5) over a doc's bigram (or bigram-first-token) rows."""
    import ray
    from zlib import crc32

    head: dict[str, int] = {}
    for b in counts_ds.iter_batches(batch_format="pandas"):
        hb = b[b["cnt"] >= head_cnt]
        head.update(zip(hb["key"], hb["cnt"].astype(int)))
    head_ref = ray.put(head)

    def to_entry(b: pa.Table) -> pa.Table:
        ks = np.asarray(b.column("key").to_pylist(), dtype=object)
        c = b.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        coldm = c < head_cnt
        ks = ks[coldm]
        gk = np.fromiter((crc32(k.encode()) % n_groups for k in ks),
                         np.int64, len(ks))
        z = np.zeros(len(ks), np.int64)
        return pa.table({"k1": int64_col(gk), "src": int64_col(z + 1),
                         "key": pa.array(ks, pa.string()),
                         "doc_id": int64_col(z), "n": int64_col(c[coldm]),
                         "s_bp": int64_col(z)}, schema=_DLS_TAGGED_SCHEMA)

    entries = counts_ds.map_batches(to_entry, batch_format="pyarrow")
    rows = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _DocBigramRows, fn_constructor_args=(firsts_only,),
        batch_format="pyarrow", batch_size=512, concurrency=(1, 4))
    tagged = rows.map_batches(
        _LogSumScoreOrTag, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 4),
        fn_constructor_args=(head_ref, dparts, n_groups))
    return entries.union(tagged).groupby("k1").map_groups(
        _logsum_score_cold, batch_format="pandas")


def bigram_logprob(sf_dir: str, head_cnt: int = 4096, n_groups: int = 256,
                   dparts: int = 64):
    """(doc_id, n_bigrams, logprob_bp, avg_logprob_bp) — each document
    scored by its log-probability under the corpus BIGRAM MLE language
    model: Σ ln P(w_i | w_{i-1}) with P(b|a) = c(ab)/c(a·) — the
    context-dependent upgrade of ``unigram_logprob`` (CCNet/Wenzek 2020
    filter documents by LM perplexity; a bigram model penalizes
    improbable TRANSITIONS, not just rare words). Scoring the training
    corpus under its own counts means no unseen event, so no smoothing
    term muddies the SQL replay.

    Exact-integer contract: the score decomposes as
    Σ floor(n·ln c(ab)·1e4 + .5) − Σ floor(n·ln c(a·)·1e4 + .5), each
    sum bp'd per (doc, key) row BEFORE summing — order-independent on
    any cluster shape, and each sum joins docs to ONE count table so
    the skew-safe head/cold split applies unchanged: head keys (the
    Zipf mass) broadcast and pre-sum per doc inside the map stage; cold
    keys co-group under a bounded gkey (max group < head_cnt rows per
    key). c(a·) derives from the bigram count table (Σ_b c(ab)), a
    vocabulary-scale fold — the corpus is scanned 3×: counts, bigram
    rows, first-token rows; nothing corpus-scale ever materializes."""
    from ray.data.aggregate import Sum

    cb = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _BigramPartial, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4)) \
        .groupby("bigram").aggregate(Sum("c_p", alias_name="cnt")) \
        .map_batches(lambda b: pa.table(
            {"key": b.column("bigram"), "cnt": b.column("cnt")}),
            batch_format="pyarrow") \
        .materialize()                       # bigram-vocabulary scale

    def first_partial(b: pa.Table) -> pa.Table:
        ks = b.column("key").to_pylist()
        firsts = [k.split(" ", 1)[0] for k in ks]
        return pa.table({"key": pa.array(firsts, pa.string()),
                         "cnt": b.column("cnt")})

    ca = cb.map_batches(first_partial, batch_format="pyarrow") \
           .groupby("key").aggregate(Sum("cnt", alias_name="cnt2")) \
           .map_batches(lambda b: pa.table(
               {"key": b.column("key"), "cnt": b.column("cnt2")}),
               batch_format="pyarrow") \
           .materialize()                    # unigram-vocabulary scale

    # Materialize each branch's per-(doc, gkey) partial sums BEFORE the
    # union: each branch holds two actor pools (min 1 actor each), so a
    # lazy union would run all four concurrently and on a small worker
    # (e.g. the 4-cpu test session) the pinned pool actors starve the
    # shuffle tasks — a scheduling deadlock. The materialized state is
    # doc-metadata scale (<= docs x n_groups int rows, no text).
    sa = _doc_log_sum(sf_dir, cb, False, head_cnt, n_groups, dparts) \
        .materialize()
    sb = _doc_log_sum(sf_dir, ca, True, head_cnt, n_groups, dparts) \
        .materialize()

    def neg(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            "s_bp": pa.array(-b.column("s_bp").to_numpy(zero_copy_only=False),
                             pa.int64())})

    combined = sa.union(sb.map_batches(neg, batch_format="pyarrow")) \
                 .groupby("doc_id").aggregate(
                     Sum("n", alias_name="n_bigrams"),
                     Sum("s_bp", alias_name="logprob_bp"))

    def add_avg(b: pa.Table) -> pa.Table:
        lp = b.column("logprob_bp").to_numpy(zero_copy_only=False).astype(np.float64)
        n = b.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.float64)
        avg = np.floor(lp / n + 0.5).astype(np.int64)
        return b.append_column("avg_logprob_bp", int64_col(avg))

    return combined.map_batches(add_avg, batch_format="pyarrow")


def bigram_logprob_sql() -> str:
    return """
WITH raw AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+')) AS term,
         generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), 1)
           AS raw_pos
  FROM documents),
toks AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) AS pos
  FROM raw WHERE term <> ''),
big AS (
  SELECT a.doc_id, a.term AS x, b.term AS y
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
cb AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cnt FROM big GROUP BY x, y),
ca AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM big GROUP BY x),
docb AS (SELECT doc_id, x, y, CAST(count(*) AS BIGINT) AS n
         FROM big GROUP BY doc_id, x, y),
doca AS (SELECT doc_id, x, CAST(count(*) AS BIGINT) AS n
         FROM big GROUP BY doc_id, x),
sa AS (SELECT d.doc_id, CAST(sum(d.n) AS BIGINT) AS n_bigrams,
              sum(CAST(floor(d.n * ln(cb.cnt) * 10000 + 0.5) AS BIGINT)) AS s
       FROM docb d JOIN cb ON cb.x = d.x AND cb.y = d.y GROUP BY d.doc_id),
sb AS (SELECT d.doc_id,
              sum(CAST(floor(d.n * ln(ca.cnt) * 10000 + 0.5) AS BIGINT)) AS s
       FROM doca d JOIN ca ON ca.x = d.x GROUP BY d.doc_id)
SELECT sa.doc_id, sa.n_bigrams,
       CAST(sa.s - sb.s AS BIGINT) AS logprob_bp,
       CAST(floor(CAST(sa.s - sb.s AS DOUBLE) / sa.n_bigrams + 0.5) AS BIGINT)
         AS avg_logprob_bp
FROM sa JOIN sb ON sb.doc_id = sa.doc_id
"""


# ---- range partitioner (sorted-output layout plan) -------------------

_RPP_NPARTS = 8
_RPP_SAMPLE_MOD = 4


def range_partition_plan(sf_dir: str, nparts: int = _RPP_NPARTS,
                         sample_mod: int = _RPP_SAMPLE_MOD):
    """(part, n_rows, min_key, max_key) — the SORTED complement of
    ``shard_shuffle``'s hash layout: the Spark-RangePartitioner shape
    that backs every distributed sort / sorted-parquet write. A
    deterministic BOUNDED sample (docs whose salted md5 is 0 mod
    ``sample_mod`` — scale the modulus with the corpus exactly like
    ``ngram_contamination``'s anchor_mod) is sorted once; ``nparts-1``
    boundary keys are cut at the pure-integer ranks ``i*len // nparts``;
    every doc then gets ``part = #{boundaries <= key}`` via a broadcast
    searchsorted — no corpus-scale sort anywhere, one metadata-only
    aggregate over (part, key) int rows. The plan's invariant (proved
    in tests and by the SQL replay): part ranges are contiguous and
    non-overlapping — ``max_key[p] < min_key[p+1]`` OR they meet only
    at a boundary value, because equal keys always land in the same
    part. Key = ``n_chars`` (skewed doc length)."""
    import hashlib

    import ray
    from ray.data.aggregate import Max, Min, Sum

    def sample_batch(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keys = b.column("n_chars").to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (int.from_bytes(hashlib.md5(f"rps:{d}".encode()).digest()[8:16],
                            "little") % sample_mod == 0
             for d in ids.tolist()), dtype=bool, count=len(ids))
        return pa.table({"key": int64_col(keys[keep].astype(np.int64))})

    sample = [b.column("key").to_numpy(zero_copy_only=False)
              for b in read(sf_dir, "documents", ["doc_id", "n_chars"])
              .map_batches(sample_batch, batch_format="pyarrow",
                           batch_size=65536)
              .iter_batches(batch_format="pyarrow") if b.num_rows]
    s = np.sort(np.concatenate(sample)) if sample else np.array([], np.int64)
    # empty sample (possible at tiny corpora with a large modulus):
    # no boundaries -> every row lands in part 0, matching the SQL side
    bounds = (np.array([s[(i * len(s)) // nparts]
                        for i in range(1, nparts)], dtype=np.int64)
              if len(s) else np.array([], dtype=np.int64))
    bounds_ref = ray.put(bounds)

    def assign(batch: pa.Table) -> pa.Table:
        bd = ray.get(bounds_ref)
        k = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.int64)
        part = np.searchsorted(bd, k, side="right").astype(np.int64)
        uniq, inv = np.unique(part, return_inverse=True)
        return pa.table({
            "part": int64_col(uniq),
            "n_p": int64_col(np.bincount(inv).astype(np.int64)),
            "min_p": int64_col(np.array(
                [k[part == p].min() for p in uniq.tolist()], np.int64)),
            "max_p": int64_col(np.array(
                [k[part == p].max() for p in uniq.tolist()], np.int64))})

    agg = read(sf_dir, "documents", ["n_chars"]).map_batches(
        assign, batch_format="pyarrow", batch_size=65536) \
        .groupby("part").aggregate(Sum("n_p", alias_name="n_rows"),
                                   Min("min_p", alias_name="min_key"),
                                   Max("max_p", alias_name="max_key"))
    return agg


def range_partition_plan_sql(nparts: int = _RPP_NPARTS,
                             sample_mod: int = _RPP_SAMPLE_MOD) -> str:
    return f"""
WITH samp AS (
  SELECT n_chars AS key
  FROM documents
  WHERE CAST(md5_number_lower('rps:' || CAST(doc_id AS VARCHAR))
             AS UHUGEINT) % {sample_mod} = 0),
ordered AS (
  SELECT key, row_number() OVER (ORDER BY key) AS rn,
         count(*) OVER () AS cnt
  FROM samp),
bounds AS (
  SELECT o.key
  FROM range(1, {nparts}) i(i)
  JOIN ordered o ON o.rn = (i.i * o.cnt) // {nparts} + 1),
assigned AS (
  SELECT d.n_chars AS key,
         (SELECT count(*) FROM bounds b WHERE b.key <= d.n_chars) AS part
  FROM documents d)
SELECT CAST(part AS BIGINT) AS part,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(key) AS BIGINT) AS min_key,
       CAST(max(key) AS BIGINT) AS max_key
FROM assigned GROUP BY part
"""


# ---- weighted bottom-k sample (PPS sampling + subset-sum estimate) ---
#
# Weighted sampling is the mixture-building staple (sample documents
# proportional to length/quality for a training mix). This is the
# bottom-k sketch with weighted ranks (Cohen & Kaplan 2007, "Summarizing
# data using bottom-k sketches"): rank r_i = h_i // w_i over a 63-bit
# md5 draw — small rank <=> large weight, so the k smallest ranks form
# a probability-proportional-to-size-ish sample WITHOUT replacement,
# mergeable exactly like KMV (union + re-truncate; the fold is the same
# bounded per-batch top-(k+1) shape). The companion estimator face uses
# the (k+1)-th rank tau as the inclusion threshold: inclusion prob
# p_i = min(1, tau * w_i / 2^63), so the Horvitz-Thompson contribution
# w_i / p_i = max(w_i, 2^63/tau) — integerized as
# ``max(w_i * 10^6, (2^63 * 10^6) // tau)`` so the total-weight estimate
# is an ORDER-FREE exact-integer sum that replays bit-for-bit in SQL.

_WBK_K = 64


def _wbk_rows(sf_dir: str, k: int) -> pd.DataFrame:
    """Global (r, doc_id, w) bottom-(k+1) — per-batch bounded partials,
    driver fold (the KMV merge shape; k+1 rows per batch max)."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(b.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64), 1)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(f"ws:{d}".encode()).digest()[8:16],
                            "little") & ((1 << 63) - 1)
             for d in ids.tolist()), dtype=np.int64, count=len(ids))
        r = h // w
        order = np.lexsort((ids, r))[:k + 1]
        return pa.table({"r": int64_col(r[order]),
                         "doc_id": int64_col(ids[order]),
                         "w": int64_col(w[order])})

    parts = read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    return parts.sort_values(["r", "doc_id"]).head(k + 1).reset_index(drop=True)


def weighted_sample(sf_dir: str, k: int = _WBK_K):
    """(rank, doc_id, weight, r) — the k documents with the smallest
    weighted ranks (ties by doc_id): a deterministic weighted sample
    whose inclusion probability rises with ``n_chars``. Hash-verified
    against the SQL replay of the same md5 // weight order."""
    rows = _wbk_rows(sf_dir, k).head(k)
    return pa.table({
        "rank": int64_col(np.arange(1, len(rows) + 1, dtype=np.int64)),
        "doc_id": int64_col(rows["doc_id"].to_numpy(np.int64)),
        "weight": int64_col(rows["w"].to_numpy(np.int64)),
        "r": int64_col(rows["r"].to_numpy(np.int64))})


def weighted_sample_sql(k: int = _WBK_K) -> str:
    return f"""
WITH h AS (
  SELECT doc_id, GREATEST(n_chars, 1) AS w,
         CAST(CAST(md5_number_lower('ws:' || CAST(doc_id AS VARCHAR))
                   AS UHUGEINT) % 9223372036854775808::UHUGEINT
              AS BIGINT) AS hv
  FROM documents),
r AS (SELECT doc_id, w, hv // w AS r FROM h),
ordered AS (
  SELECT doc_id, w, r,
         row_number() OVER (ORDER BY r, doc_id) AS rank
  FROM r)
SELECT CAST(rank AS BIGINT) AS rank, doc_id,
       CAST(w AS BIGINT) AS weight, CAST(r AS BIGINT) AS r
FROM ordered WHERE rank <= {k}
"""


def weighted_sample_est(sf_dir: str, k: int = _WBK_K):
    """(k_used, tau, est_total_w_micro) — the subset-sum estimator over
    the bottom-k sample: Horvitz-Thompson with threshold tau = the
    (k+1)-th rank, contribution ``max(w*10^6, (2^63*10^6) // tau)`` per
    sampled doc (exact integers, order-free sum). When the corpus has
    <= k docs the sample is exhaustive and the estimate is the EXACT
    total weight. Deterministic -> hash-verified; accuracy (~1/sqrt(k))
    is asserted against the exact total in tests."""
    rows = _wbk_rows(sf_dir, k)
    if len(rows) <= k:                       # exhaustive: exact total
        est = int(rows["w"].sum()) * 10**6
        return pa.table({"k_used": int64_col(np.array([len(rows)], np.int64)),
                         "tau": int64_col(np.array([0], np.int64)),
                         "est_total_w_micro": int64_col(
                             np.array([est], np.int64))})
    tau = int(rows["r"].iloc[k])
    samp = rows.head(k)
    base = ((1 << 63) * 10**6) // tau
    est = int(sum(max(int(w) * 10**6, base) for w in samp["w"]))
    return pa.table({"k_used": int64_col(np.array([k], np.int64)),
                     "tau": int64_col(np.array([tau], np.int64)),
                     "est_total_w_micro": int64_col(
                         np.array([est], np.int64))})


def weighted_sample_est_sql(k: int = _WBK_K) -> str:
    return f"""
WITH h AS (
  SELECT doc_id, GREATEST(n_chars, 1) AS w,
         CAST(CAST(md5_number_lower('ws:' || CAST(doc_id AS VARCHAR))
                   AS UHUGEINT) % 9223372036854775808::UHUGEINT
              AS BIGINT) AS hv
  FROM documents),
r AS (SELECT doc_id, w, hv // w AS r FROM h),
ordered AS (
  SELECT doc_id, w, r,
         row_number() OVER (ORDER BY r, doc_id) AS rank
  FROM r),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
tau AS (SELECT r AS tau FROM ordered WHERE rank = {k} + 1),
exhaustive AS (
  SELECT CAST(n.n AS BIGINT) AS k_used, CAST(0 AS BIGINT) AS tau,
         CAST((SELECT sum(w) FROM r) * 1000000 AS BIGINT)
           AS est_total_w_micro
  FROM n WHERE n.n <= {k}),
estimated AS (
  SELECT CAST({k} AS BIGINT) AS k_used, CAST(t.tau AS BIGINT) AS tau,
         CAST((SELECT sum(GREATEST(
                   CAST(o.w AS HUGEINT) * 1000000,
                   CAST(9223372036854775808 AS HUGEINT) * 1000000 // t.tau))
               FROM ordered o WHERE o.rank <= {k}) AS BIGINT)
           AS est_total_w_micro
  FROM tau t, n WHERE n.n > {k})
SELECT * FROM exhaustive UNION ALL SELECT * FROM estimated
"""


# ---- Kneser-Ney continuation counts (n-gram LM smoothing primitive) --


class _KNPairTypesPartial:
    """Per-batch DISTINCT adjacent-token pairs ('prev cur' strings) —
    the bigram TYPE partial behind Kneser-Ney continuation counts.
    Tokenization and the integer pair-code kernel are `_BigramPartial`'s
    (doc-boundary sentinel, factorize + np.unique); emitting types
    instead of counts makes every downstream group at most
    n_batches rows, hot pairs included."""

    def __init__(self):
        import re

        self.tok = re.compile(r"[a-z0-9_]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for text in batch.column("text").to_pylist():
            toks.extend(self.tok.findall(text.lower()))
            toks.append("\n")
        if len(toks) < 2:
            return pa.table({"bigram": pa.array([], pa.string())})
        codes, uniq = pd.factorize(np.asarray(toks, dtype=object))
        sent = np.flatnonzero(uniq == "\n")[0]
        a, b = codes[:-1], codes[1:]
        mask = (a != sent) & (b != sent)
        v = len(uniq)
        pair_codes = np.unique(a[mask].astype(np.int64) * v + b[mask])
        bigrams = [f"{uniq[p // v]} {uniq[p % v]}" for p in pair_codes.tolist()]
        return pa.table({"bigram": pa.array(bigrams, pa.string())})


def kneser_ney_counts(sf_dir: str):
    """(term, n_left_types, n_right_types) — Kneser-Ney continuation
    counts over the corpus bigram graph: for each term, how many
    DISTINCT left neighbors (N1+(·w), the numerator of the KN unigram
    continuation probability — Kneser & Ney 1995; Chen & Goodman 1999)
    and distinct right neighbors (N1+(w·), the discount normalizer).
    Completes the n-gram LM family beside `unigram_logprob` /
    `bigram_logprob`, which use raw counts where smoothing wants types.

    Shape: per-batch distinct-pair partials -> one pair-key groupby
    (global type dedup; groups bounded by n_batches) -> each pair row
    re-tagged as one left-type and one right-type contribution -> one
    term-key groupby summing both tags. Only bigram-type strings ride
    the shuffles, never text."""
    from ray.data.aggregate import Count, Sum

    pairs = read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _KNPairTypesPartial, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4))
    uniq = pairs.groupby("bigram").aggregate(Count(alias_name="_n"))

    def tag(batch: pa.Table) -> pa.Table:
        bi = batch.column("bigram").to_pylist()
        prev = [s.split(" ", 1)[0] for s in bi]
        cur = [s.split(" ", 1)[1] for s in bi]
        n = len(bi)
        return pa.table({
            "term": pa.array(cur + prev, pa.string()),
            "l_p": int64_col(np.r_[np.ones(n, np.int64), np.zeros(n, np.int64)]),
            "r_p": int64_col(np.r_[np.zeros(n, np.int64), np.ones(n, np.int64)]),
        })

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "term": batch.column("term"),
            "n_left_types": batch.column("sum(l_p)").cast(pa.int64()),
            "n_right_types": batch.column("sum(r_p)").cast(pa.int64()),
        })

    return uniq.map_batches(tag, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("l_p"), Sum("r_p")) \
        .map_batches(rename, batch_format="pyarrow")


def kneser_ney_counts_sql() -> str:
    return """
WITH s AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                     x -> x <> '') AS t
  FROM documents),
b AS (
  SELECT DISTINCT unnest([t[i] || ' ' || t[i + 1]
                          for i in generate_series(1, len(t) - 1)]) AS bigram
  FROM s),
u AS (SELECT split_part(bigram, ' ', 1) AS prev,
             split_part(bigram, ' ', 2) AS cur
      FROM (SELECT DISTINCT bigram FROM b)),
l AS (SELECT cur AS term, count(*) AS n FROM u GROUP BY cur),
r AS (SELECT prev AS term, count(*) AS n FROM u GROUP BY prev)
SELECT coalesce(l.term, r.term) AS term,
       CAST(coalesce(l.n, 0) AS BIGINT) AS n_left_types,
       CAST(coalesce(r.n, 0) AS BIGINT) AS n_right_types
FROM l FULL JOIN r ON l.term = r.term
"""


# ---- global total-order rank (the sort-materialization primitive) ----


def global_rank(sf_dir: str, nparts: int = _RPP_NPARTS,
                sample_mod: int = _RPP_SAMPLE_MOD):
    """(doc_id, rnk) — the GLOBAL total-order rank of every document
    under (n_chars asc, doc_id asc): `range_partition_plan` carried to
    completion, i.e. the distributed sort-materialization primitive
    behind sorted-parquet writes and rank features. Same
    sampled-boundary machinery (salted-md5 bounded sample, pure-integer
    boundary ranks, broadcast searchsorted — equal keys always land in
    one part so cross-part order is total); then

    1. one metadata-only pass counts rows per part (bounded P-row
       aggregate -> driver cumsum -> broadcast offsets);
    2. one part-key groupby sorts each contiguous range locally and
       emits rank = offset[part] + local rank.

    No corpus-scale sort, no driver materialization beyond P integers;
    the oracle is a plain `row_number()` window."""
    import hashlib as _hl

    import ray
    from ray.data.aggregate import Sum

    def sample_batch(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        keys = b.column("n_chars").to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (int.from_bytes(_hl.md5(f"rps:{d}".encode()).digest()[8:16],
                            "little") % sample_mod == 0
             for d in ids.tolist()), dtype=bool, count=len(ids))
        return pa.table({"key": int64_col(keys[keep].astype(np.int64))})

    docs = read(sf_dir, "documents", ["doc_id", "n_chars"])
    sample = [b.column("key").to_numpy(zero_copy_only=False)
              for b in docs.map_batches(sample_batch, batch_format="pyarrow",
                                        batch_size=65536)
              .iter_batches(batch_format="pyarrow") if b.num_rows]
    s = np.sort(np.concatenate(sample)) if sample else np.array([], np.int64)
    bounds = (np.array([s[(i * len(s)) // nparts]
                        for i in range(1, nparts)], dtype=np.int64)
              if len(s) else np.array([], dtype=np.int64))
    bounds_ref = ray.put(bounds)

    def count_parts(batch: pa.Table) -> pa.Table:
        bd = ray.get(bounds_ref)
        k = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.int64)
        part = np.searchsorted(bd, k, side="right").astype(np.int64)
        uniq, cnt = np.unique(part, return_counts=True)
        return pa.table({"part": int64_col(uniq),
                         "n_p": int64_col(cnt.astype(np.int64))})

    counts = docs.map_batches(count_parts, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("part").aggregate(Sum("n_p", alias_name="n_rows")) \
        .take_all()                                  # bounded: P rows
    sizes = {int(r["part"]): int(r["n_rows"]) for r in counts}
    offsets = {}
    acc = 0
    for p in sorted(sizes):
        offsets[p] = acc
        acc += sizes[p]
    off_ref = ray.put(offsets)

    def assign(batch: pa.Table) -> pa.Table:
        bd = ray.get(bounds_ref)
        k = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "key": int64_col(k),
            "part": int64_col(np.searchsorted(bd, k, side="right"))})

    def rank_part(g: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        p = int(g.column("part")[0].as_py())
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        k = g.column("key").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, k))
        return pa.table({
            "doc_id": int64_col(ids[order].astype(np.int64)),
            "rnk": int64_col(off[p] + 1 + np.arange(len(ids), dtype=np.int64)),
        })

    return docs.map_batches(assign, batch_format="pyarrow",
                            batch_size=65536) \
        .groupby("part").map_groups(rank_part, batch_format="pyarrow")


def global_rank_sql() -> str:
    return """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rnk
FROM documents
"""
