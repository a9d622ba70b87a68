"""BM25 scoring math — shared by the oracle and the distributed engine.

Replaces the reference's tf-idf + cosine ranker
(``/root/reference/searcher.py:133-159`` builds ``log10(N/df) *
tf/max_tf`` vectors, ``ranker.py:14-34`` does the cosine) with
Okapi BM25 per ``BASELINE.json`` ``north_star``:

    idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
    s(d,q)  = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Rank identity under parallelism (SURVEY §7 "what's hard"): the per-doc
sum is accumulated in ascending-unicode term order on BOTH sides, so
float summation order is canonical. Tie-break is (score desc, doc_id
asc) — the reference's recency tie-break (``ranker.py:32``) depends on
wall-clock ``datetime.now()`` (``indexer.py:170-178``) and is
nondeterministic, so it is deliberately replaced.
"""

from __future__ import annotations

import math

import numpy as np


def idf(N: int, df) -> float | np.ndarray:
    """Okapi BM25 idf with the +1 floor (always positive).

    Scalars go through ``math.log`` — the same libm call the oracle's
    scalar path uses. (``np.log`` differs from ``math.log`` by 1 ulp on
    some inputs, which would break bit-identical rank parity.)
    """
    if np.isscalar(df) or getattr(df, "ndim", 0) == 0:
        dff = float(df)
        return math.log((N - dff + 0.5) / (dff + 0.5) + 1.0)
    return np.log((N - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5) + 1.0)


def bm25_term_scores(tf: np.ndarray, doc_len: np.ndarray, *, idf_t: float,
                     avgdl: float, k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    """Vectorized per-posting BM25 contribution of one term."""
    tf = tf.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * doc_len.astype(np.float64) / avgdl)
    return idf_t * tf * (k1 + 1.0) / denom


def bm25_score_single(tf: int, dl: int, *, N: int, df: int, avgdl: float,
                      k1: float = 1.2, b: float = 0.75) -> float:
    """Scalar path (oracle) — must match ``bm25_term_scores`` bit-for-bit,
    so it uses the same float64 ops in the same order."""
    i = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
    tf_f = float(tf)
    denom = tf_f + k1 * (1.0 - b + b * float(dl) / avgdl)
    return i * tf_f * (k1 + 1.0) / denom


def top_k_indices(scores: np.ndarray, doc_ids: np.ndarray, k: int,
                  tie: np.ndarray | None = None) -> np.ndarray:
    """Indices of the top-k by (score desc[, tie desc], doc_id asc) —
    deterministic. ``tie`` is the optional recency column (int64): newer
    wins among rounded-equal scores, doc_id asc breaks exact ts ties.

    For large candidate sets, pre-filter with ``np.partition`` (O(n))
    down to everything >= the k-th score (ties included, so the
    tie-break stays exact), then lexsort only the survivors.
    """
    n = len(scores)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    k = min(k, n)
    if n > max(1024, 4 * k):
        kth = np.partition(scores, n - k)[n - k]
        keep = np.flatnonzero(scores >= kth)
        keys = ((doc_ids[keep], -scores[keep]) if tie is None
                else (doc_ids[keep], -tie[keep], -scores[keep]))
        order = np.lexsort(keys)
        return keep[order[:k]]
    keys = ((doc_ids, -scores) if tie is None
            else (doc_ids, -tie, -scores))
    order = np.lexsort(keys)
    return order[:k]
