"""Single-process pure-Python oracle (SURVEY §5 strategy #2).

A ~150-line reference implementation of the whole engine semantics —
tokenize → doc-id assignment → postings/df → BM25 top-k — sharing the
*same* analyzer (``tokenizer.Analyzer``), the same doc-id scheme
(``doc_key_hash`` / part-rank ids) and the same scalar BM25 math
(``bm25.bm25_score_single``) as the distributed Ray pipeline. Because
the code paths are shared, rank identity between oracle and engine is
by construction; the tests then verify the *distributed mechanics*
(shuffle, partial-postings concat, compression, WAND) preserved them.

The reference repo ships no tests at all (SURVEY §5); this oracle is
the replacement for its eyeball-the-CSV verification culture.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

from searchengine_ray.bm25 import bm25_score_single
from searchengine_ray.config import IndexConfig
from searchengine_ray.tokenizer import Analyzer


def doc_key_hash(repo: str, path: str, commit: str) -> int:
    """Stable 64-bit hash of the document key — the doc partitioner."""
    h = hashlib.blake2b(f"{repo}\x00{path}\x00{commit}".encode(), digest_size=8)
    return int.from_bytes(h.digest(), "big")


def content_sha256(content: str) -> str:
    """The per-row invariant of BASELINE.json input_hint."""
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


def assign_doc_ids(keys: list[tuple[str, str, str]], config: IndexConfig
                   ) -> dict[tuple[str, str, str], int]:
    """Deterministic gapped-dense doc ids: ``(part << bits) | rank``.

    ``part`` = key-hash partition; ``rank`` = position of the key in the
    ascending sort of that partition's unique keys. One shuffle in the
    distributed build, fully order-independent — any process computes
    the same ids. (Replaces the reference's ``tweet_id`` pass-through,
    ``indexer.py:107``.)
    """
    parts: dict[int, set] = {}
    for k in keys:
        parts.setdefault(doc_key_hash(*k) % config.num_doc_parts, set()).add(k)
    out: dict[tuple[str, str, str], int] = {}
    for p, ks in parts.items():
        base = p << config.doc_id_part_bits
        for rank, k in enumerate(sorted(ks)):
            out[k] = base | rank
    return out


class OracleIndex:
    """In-memory reference index over a small corpus table."""

    def __init__(self, table: pa.Table, config: IndexConfig | None = None,
                 id_column: str | None = None):
        self.config = config or IndexConfig()
        self.analyzer = Analyzer(self.config)
        cols = table.column_names
        rows = table.to_pylist()
        if id_column is not None:
            # pre-assigned ids (e.g. the documents.parquet table)
            docs = {}
            for r in rows:
                docs.setdefault(int(r[id_column]), r)
        else:
            keys = [(r["repo"], r["path"], r["commit"]) for r in rows]
            ids = assign_doc_ids(keys, self.config)
            docs = {}
            for r in rows:  # first-wins dedup (duplicates are exact copies)
                did = ids[(r["repo"], r["path"], r["commit"])]
                docs.setdefault(did, r)
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.doc_len: dict[int, int] = {}
        self.doc_meta: dict[int, dict] = {}
        total_len = 0
        for did in sorted(docs):
            r = docs[did]
            content = r.get("content", r.get("text", ""))
            terms = Counter(self.analyzer.terms(content))
            dl = sum(terms.values())
            self.doc_len[did] = dl
            total_len += dl
            self.doc_meta[did] = {
                "doc_id": did, "doc_len": dl,
                "max_tf": max(terms.values()) if terms else 0,
                "sha256": content_sha256(content),
                **{k: r[k] for k in ("repo", "path", "commit", "lang") if k in cols},
            }
            tb = self.config.tie_break_column
            if tb:
                v = r[tb]
                if hasattr(v, "timestamp"):
                    # integer-exact epoch µs — the engine casts
                    # timestamp->int64 µs in Arrow (tz-aware values keep
                    # their UTC instant), so tz-aware datetimes convert
                    # to UTC FIRST; a float .timestamp() would be
                    # local-tz-dependent and lose sub-µs bits
                    import datetime as _dt

                    if v.tzinfo is not None:
                        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                    v = ((v - _dt.datetime(1970, 1, 1))
                         // _dt.timedelta(microseconds=1))
                self.doc_meta[did]["_tie"] = int(v)
            for t, tf in terms.items():
                self.postings.setdefault(t, []).append((did, tf))
        for t in self.postings:
            self.postings[t].sort()
        if self.config.min_df > 1:
            self.postings = {t: p for t, p in self.postings.items()
                             if len(p) >= self.config.min_df}
        self.N = len(docs)
        self.avgdl = total_len / self.N if self.N else 1.0
        self.df = {t: len(p) for t, p in self.postings.items()}

    def search(self, text: str, k: int = 10,
               spell_correct: bool = False) -> list[tuple[int, float]]:
        """BM25 top-k: [(doc_id, score)] by (score desc, doc_id asc).

        Scores accumulate per doc in ascending-unique-term order with a
        query-tf multiplier — the engine's vectorized scorer follows the
        identical order, so floats match bit-for-bit.
        """
        qterms = Counter(self.analyzer.terms(text))
        if spell_correct:
            from searchengine_ray.functions.spell import correct

            fixed: Counter = Counter()
            for t, c in qterms.items():
                t2 = correct(t, lambda w: self.df.get(w, 0))
                if t2 is not None:
                    fixed[t2] += c
            qterms = fixed
        scores: dict[int, float] = {}
        for term in sorted(qterms):
            plist = self.postings.get(term)
            if not plist:
                continue
            df = self.df[term]
            qtf = qterms[term]
            for did, tf in plist:
                contrib = bm25_score_single(
                    tf, self.doc_len[did], N=self.N, df=df, avgdl=self.avgdl,
                    k1=self.config.k1, b=self.config.b)
                scores[did] = scores.get(did, 0.0) + qtf * contrib
        if self.config.tie_break_column:
            # (score desc, recency desc, doc_id asc) — the deterministic
            # replacement for the reference's wall-clock tie-break
            ranked = sorted(scores.items(),
                            key=lambda kv: (-kv[1],
                                            -self.doc_meta[kv[0]]["_tie"],
                                            kv[0]))
        else:
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
