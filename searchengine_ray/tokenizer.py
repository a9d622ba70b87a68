"""Text analysis: tokenization, identifier splitting, stopwords, stemming.

Re-expresses the reference's tweet parser (``/root/reference/
parser_module.py``: ``parse_doc`` 271-329, ``parse_sentence`` 58-241,
hashtag split 384-394, hyphen split 338-360, stopword filter 24-34,
stemming 195-202) as a *code analyzer* for the source-code corpus of
``BASELINE.json`` ``input_hint``:

- hashtag/camel decomposition (reference P4, ``parse_hashtag``) becomes
  snake_case / camelCase identifier splitting — the compound token AND
  its parts are both emitted, exactly like ``#StayAtHome`` emitted the
  joined tag plus its words;
- the twitter stopword list (reference P3) becomes a code-keyword
  stopword list (configurable);
- optional Porter stemming of alphabetic tokens stands in for the
  reference's Snowball stemmer (``stemmer.py:1-14``) — the container has
  no nltk, and the Porter algorithm (Porter 1980) is public;
- per-doc tf / doc_len / max_tf accumulation (reference P20,
  ``parser_module.py:204-241``) happens vectorized per batch.

Two layers:

1. pure-Python token functions (shared verbatim with the oracle in
   ``oracle.py`` so distributed-vs-oracle rank identity holds by
   construction, not by luck);
2. a vectorized batch path (``tokenize_batch``): raw tokens are
   extracted per doc with one C-level ``findall``, then normalization
   runs only over the batch's *unique* raw tokens (the vocabulary is
   orders of magnitude smaller than the token stream) and is broadcast
   back with numpy ragged-gather — no per-token Python in the hot loop.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np

# identifiers (incl. leading _), integers, decimals — the code-corpus
# analog of the reference's word/number token classes (parser P2/P6/P7).
TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+(?:\.[0-9]+)?")
# normalize_numbers variant: numeric literals may carry _ separators
# (1_000_000) — the code-corpus analog of the reference's K/M/B number
# canonicalization (parser_module.py:412-522)
TOKEN_RE_NUMNORM = re.compile(
    r"[A-Za-z_][A-Za-z0-9_]*|[0-9][0-9_]*(?:\.[0-9_]+)?")
NUM_RE = re.compile(r"[0-9][0-9_]*(?:\.[0-9_]+)?")
_TRAIL_ZEROS = re.compile(r"0+$")
_TRAIL_DOT = re.compile(r"\.$")
_LEAD_ZEROS = re.compile(r"^0+([0-9])")


def canonicalize_number(tok: str) -> str:
    """Purely-lexical numeric canonicalization (opt-in, reference P6):
    strip ``_`` separators, trailing fractional zeros, a bare trailing
    dot, and leading zeros — ``01_000.50`` -> ``1000.5``. Every rule is
    a regex DuckDB applies identically, so indexes built with
    ``normalize_numbers`` stay oracle-checkable."""
    t = tok.replace("_", "")
    if "." in t:
        t = _TRAIL_ZEROS.sub("", t)
        t = _TRAIL_DOT.sub("", t)
    return _LEAD_ZEROS.sub(r"\1", t)
# boundaries inside identifiers: aB | ABc transitions and underscores.
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9_]+")

# Code-keyword stopwords: the analog of the reference's
# english-stopwords + custom junk list (parser_module.py:24-34).
CODE_STOPWORDS = frozenset("""
the a an and or not is in of to for if else elif return def class import
from as with while do end begin then fn func function var let const
new this self true false none null nil pub use mod impl package void
int str bool float public private static final
""".split())

ENGLISH_STOPWORDS = frozenset("""
i me my we our you your he him his she her it its they them their what
which who this that these those am is are was were be been being have
has had having do does did doing a an the and but if or because as
until while of at by for with about against between into through
during before after above below to from up down in out on off over
under again further then once here there when where why how all any
both each few more most other some such no nor not only own same so
than too very s t can will just don should now
""".split())


@lru_cache(maxsize=None)
def _porter_stem(word: str) -> str:
    """Minimal Porter-style suffix stripper (public algorithm, Porter 1980).

    Deliberately a light subset (step-1 style suffixes) — deterministic
    and shared by oracle and engine, which is what rank identity needs.
    """
    if len(word) <= 3:
        return word
    for suf, rep in (("sses", "ss"), ("ies", "i"), ("ing", ""), ("edly", ""),
                     ("ed", ""), ("ly", ""), ("s", "")):
        if word.endswith(suf) and len(word) - len(suf) >= 3:
            return word[: len(word) - len(suf)] + rep
    return word


def split_identifier(token: str) -> list[str]:
    """``parseHTTPResponse_v2`` -> ``['parse', 'http', 'response', 'v2']``.

    The code analog of the reference's hashtag decomposition
    (``parser_module.py:384-394``).
    """
    parts: list[str] = []
    for piece in token.split("_"):
        if not piece:
            continue
        for sub in _CAMEL_RE.split(piece):
            if sub:
                parts.append(sub.lower())
    return parts


def expand_token(raw: str, *, split_identifiers: bool = True, keep_compound: bool = True,
                 lowercase: bool = True, stopwords: frozenset = CODE_STOPWORDS,
                 stemming: bool = False, min_len: int = 1, max_len: int = 64) -> list[str]:
    """Normalize one raw token into zero or more index terms.

    THE single normalization function — both the Ray tokenizer stage and
    the pure-Python oracle call this, so their term streams are
    identical by construction (SURVEY §5 strategy).
    """
    out: list[str] = []
    low = raw.lower() if lowercase else raw
    parts = split_identifier(raw) if split_identifiers else []
    compound_is_simple = len(parts) <= 1
    # the compound form (always for simple tokens; optionally for multi-part identifiers)
    if compound_is_simple or keep_compound:
        if low not in stopwords and min_len <= len(low) <= max_len:
            out.append(_porter_stem(low) if stemming and low.isalpha() else low)
    if not compound_is_simple:
        for p in parts:
            if p in stopwords or not (min_len <= len(p) <= max_len):
                continue
            out.append(_porter_stem(p) if stemming and p.isalpha() else p)
    return out


class Analyzer:
    """Configured tokenizer: text -> final term list (pure Python path).

    Used directly by the oracle and for query parsing (reference
    ``parse_query``, ``parser_module.py:250-269`` — queries go through
    the *same* analyzer as documents, as in the reference).
    """

    def __init__(self, config=None):
        from searchengine_ray.config import IndexConfig

        self.config = config or IndexConfig()
        c = self.config
        self.simple = c.analyzer == "simple"
        self.stop = c.stopword_set() if not self.simple else frozenset()
        self._expand_cache: dict[str, list[str]] = {}

    def raw_tokens(self, text: str) -> list[str]:
        if self.simple:
            return SIMPLE_TOKEN_RE.findall(text.lower())
        if getattr(self.config, "normalize_numbers", False):
            return TOKEN_RE_NUMNORM.findall(text)
        return TOKEN_RE.findall(text)

    def expand(self, raw: str) -> list[str]:
        if self.simple:
            return [raw]
        got = self._expand_cache.get(raw)
        if got is None:
            c = self.config
            if getattr(c, "normalize_numbers", False) and NUM_RE.fullmatch(raw):
                got = [canonicalize_number(raw)]
                self._expand_cache[raw] = got
                return got
            got = expand_token(raw, split_identifiers=c.split_identifiers,
                               keep_compound=c.keep_compound, lowercase=c.lowercase,
                               stopwords=self.stop, stemming=c.stemming,
                               min_len=c.min_token_len, max_len=c.max_token_len)
            self._expand_cache[raw] = got
        return got

    def terms(self, text: str) -> list[str]:
        out: list[str] = []
        for raw in self.raw_tokens(text):
            out.extend(self.expand(raw))
        return out

    # ---- vectorized batch path ----

    def tokenize_batch(self, texts: list[str], doc_ids: np.ndarray,
                       with_positions: bool = False
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
        """Tokenize a batch of documents, vectorized.

        Returns ``(term_codes, out_doc_ids, tfs, info)`` where
        ``info['vocab']`` is the np.ndarray of term strings indexed by
        ``term_codes``, and ``info['doc_len']``/``info['max_tf']``/
        ``info['n_terms']`` are per-input-doc arrays (reference A4:
        per-doc stats computed without any shuffle, since a doc is fully
        contained in its batch).

        With ``with_positions``, ``info['positions']`` holds the ragged
        per-posting position lists flattened in output-row order (posting
        ``i`` owns ``positions[cumsum(tfs)[i-1]:cumsum(tfs)[i]]``,
        ascending). A position is the RAW-token index within the doc —
        every expansion of raw token ``j`` (compound + identifier parts)
        shares position ``j``, mirroring the reference's word-location
        semantics (``parser_module.py:222-241``).
        """
        raw_lists = [self.raw_tokens(t) for t in texts]
        raw_counts = np.fromiter((len(r) for r in raw_lists), dtype=np.int64,
                                 count=len(raw_lists))
        n_docs = len(texts)
        if raw_counts.sum() == 0:
            empty = np.empty(0, dtype=np.int64)
            return (empty, empty.copy(), empty.copy(),
                    {"vocab": np.empty(0, dtype=object),
                     "doc_len": np.zeros(n_docs, np.int32),
                     "max_tf": np.zeros(n_docs, np.int32),
                     "n_terms": np.zeros(n_docs, np.int32),
                     "positions": np.empty(0, np.int64)})
        all_raw = np.concatenate([np.asarray(r, dtype=object) if r else
                                  np.empty(0, dtype=object) for r in raw_lists])
        # factorize the raw-token stream: C-speed unique + codes
        raw_codes, raw_vocab = _factorize(all_raw)
        # normalize only the unique raw tokens (vocabulary-level work)
        final_vocab_index: dict[str, int] = {}
        flat_exp: list[int] = []
        exp_offsets = np.zeros(len(raw_vocab) + 1, dtype=np.int64)
        for i, raw in enumerate(raw_vocab):
            for term in self.expand(raw):
                tid = final_vocab_index.setdefault(term, len(final_vocab_index))
                flat_exp.append(tid)
            exp_offsets[i + 1] = len(flat_exp)
        flat_exp_arr = np.asarray(flat_exp, dtype=np.int64)
        exp_lens = np.diff(exp_offsets)
        # ragged gather: expand the raw-token stream through the per-raw expansions
        starts = exp_offsets[:-1][raw_codes]
        lens = exp_lens[raw_codes]
        total = int(lens.sum())
        if total == 0:
            empty = np.empty(0, dtype=np.int64)
            return (empty, empty.copy(), empty.copy(),
                    {"vocab": np.empty(0, dtype=object),
                     "doc_len": np.zeros(n_docs, np.int32),
                     "max_tf": np.zeros(n_docs, np.int32),
                     "n_terms": np.zeros(n_docs, np.int32),
                     "positions": np.empty(0, np.int64)})
        rep_starts = np.repeat(starts, lens)
        cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
        within = np.arange(total) - np.repeat(cum, lens)
        term_stream = flat_exp_arr[rep_starts + within]
        doc_local_per_raw = np.repeat(np.arange(n_docs, dtype=np.int64), raw_counts)
        doc_local_stream = np.repeat(doc_local_per_raw, lens)
        # tf per (doc, term): combine into one key, count uniques
        n_terms_total = len(final_vocab_index)
        combined = doc_local_stream * n_terms_total + term_stream
        pos_flat = None
        if with_positions:
            # raw-token index within each doc, inherited by every expansion
            cum_raw = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(raw_counts[:-1], out=cum_raw[1:])
            pos_raw = (np.arange(len(all_raw), dtype=np.int64)
                       - np.repeat(cum_raw, raw_counts))
            pos_stream = np.repeat(pos_raw, lens)
            # stable sort keeps positions ascending within each (doc, term)
            order2 = np.argsort(combined, kind="stable")
            sc = combined[order2]
            change2 = np.empty(len(sc), dtype=bool)
            change2[0] = True
            change2[1:] = sc[1:] != sc[:-1]
            starts2 = np.flatnonzero(change2)
            uniq = sc[starts2]
            tf = np.diff(np.concatenate([starts2, [len(sc)]]))
            pos_flat = pos_stream[order2]
        else:
            uniq, tf = np.unique(combined, return_counts=True)
        out_doc_local = uniq // n_terms_total
        out_term = uniq % n_terms_total
        doc_len = np.bincount(doc_local_stream, minlength=n_docs).astype(np.int32)
        max_tf = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(max_tf, out_doc_local, tf)
        n_terms = np.bincount(out_doc_local, minlength=n_docs).astype(np.int32)
        vocab_arr = np.empty(n_terms_total, dtype=object)
        for term, tid in final_vocab_index.items():
            vocab_arr[tid] = term
        return (out_term, np.asarray(doc_ids, dtype=np.int64)[out_doc_local],
                tf.astype(np.int64),
                {"vocab": vocab_arr, "doc_len": doc_len,
                 "max_tf": max_tf.astype(np.int32), "n_terms": n_terms,
                 "doc_local": out_doc_local, "positions": pos_flat})


def _factorize(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """codes, uniques — pandas.factorize without importing pandas here."""
    import pandas as pd

    codes, uniques = pd.factorize(arr, sort=False)
    return codes.astype(np.int64), np.asarray(uniques, dtype=object)
