"""Engine configuration.

Replaces the reference's ``ConfigClass`` + hardcoded sizing constants
(``/root/reference/configuration.py:1-12``, ``indexer.py:19`` spill
threshold, ``indexer.py:551`` 2M-entry shard cut) with one explicit,
scale-aware dataclass.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class IndexConfig:
    """All knobs for the index build + query pipelines.

    Scale notes (the defaults are sized for a multi-node cluster; tests
    shrink them):

    - ``num_term_parts``: hash partitions of the dictionary/postings
      layout. Rule of thumb: ~4x total cores, so the term shuffle and
      the query-time partition pruning both parallelize.
    - ``doc_bucket_size``: postings of one term are split into
      independent index rows per ``doc_id // doc_bucket_size`` bucket.
      This is the explicit skew-split (SURVEY §4): a stop-word-heavy
      term ("def", "return") never forms a single shuffle group larger
      than one bucket's worth of postings — the analog of the
      reference's 2M-entry shard cut (``indexer.py:551-554``), done as
      a shuffle key instead of a file cut.
    - ``block_size``: postings per compressed block; 128 is the classic
      block-max WAND granularity.
    """

    # --- analysis ---
    analyzer: str = "code"          # "code" | "simple"
    lowercase: bool = True
    split_identifiers: bool = True  # snake_case / camelCase sub-token emission
    keep_compound: bool = True      # also emit the whole (lowercased) identifier
    stopwords: frozenset[str] | None = None  # None -> analyzer default set
    use_stopwords: bool = True
    stemming: bool = False          # porter stemming of alpha tokens (off by default)
    normalize_numbers: bool = False  # opt-in numeric canonicalization (ref P6):
                                     # strip _ separators / trailing frac zeros /
                                     # leading zeros; see tokenizer.canonicalize_number
    min_token_len: int = 1
    max_token_len: int = 64

    # --- index shape ---
    store_positions: bool = False   # per-posting token positions (phrase queries);
                                    # reference stores them in location_dict
                                    # (parser_module.py:222-241, indexer.py:108)
    tie_break_column: str | None = None
    # opt-in recency tie-break: name of an int64/timestamp column in the
    # source corpus; ranking becomes (score desc, column desc, doc_id
    # asc). Deterministic replacement for the reference's wall-clock
    # doc-age tie-break (ranker.py:30-32 via indexer.py:170-178's
    # datetime.now()) — a DATA column instead of ingest time.
    min_df: int = 1                 # singleton prune: reference indexer.py:604-615 (min_df=2 there)
    block_size: int = 128
    doc_bucket_size: int = 1 << 22  # 4M docs per posting bucket (skew cap)
    num_term_parts: int = 32
    num_doc_parts: int = 16         # hash partitions for doc-id assignment / doc_meta
    doc_id_part_bits: int = 34      # doc_id = part << bits | rank  (gapped-dense ids)

    # --- BM25 ---
    k1: float = 1.2
    b: float = 0.75

    # --- execution ---
    tokenize_batch_size: int = 1024
    query_concurrency: int = 4

    extra: dict = field(default_factory=dict)

    def stopword_set(self) -> frozenset[str]:
        if not self.use_stopwords:
            return frozenset()
        if self.stopwords is not None:
            return self.stopwords
        from searchengine_ray.tokenizer import CODE_STOPWORDS, ENGLISH_STOPWORDS

        return CODE_STOPWORDS if self.analyzer == "code" else ENGLISH_STOPWORDS
