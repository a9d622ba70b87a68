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


def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Rolling-hash (Rabin-Karp style) 63-bit document fingerprint."""
    fps = []
    MOD = (1 << 61) - 1
    B = 1_000_003
    for text in batch.column("text").to_pylist():
        h = 0
        for ch in text.encode("utf-8"):
            h = (h * B + ch) % MOD
        fps.append(h)
    return pa.table({"doc_id": batch.column("doc_id"), "fingerprint": int64_col(fps)})


def doc_fingerprint(sf_dir: str):
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _fingerprint_batch, batch_format="pyarrow", batch_size=1024)
