"""Doc-metadata stage: per-doc length / max-tf / term-count.

Replaces the reference's ``docs_dict: tweet_id -> [doc_length,
doc_age_minutes, max_freq_term]`` (``/root/reference/indexer.py:122-128``)
— minus the wall-clock ``doc_age_minutes`` (nondeterministic, see
SURVEY §7; the recency tie-break it fed is replaced by
``(score desc, doc_id asc)``).

Per-doc stats need NO shuffle (reference A4): a document is wholly
contained in its batch, so ``map_batches`` computes them exactly.
``avgdl`` for BM25 is derived downstream from integer sums, so it is
bit-identical regardless of partitioning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from searchengine_ray.config import IndexConfig
from searchengine_ray.tokenizer import Analyzer

DOC_META_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("doc_len", pa.int32()),
    ("max_tf", pa.int32()), ("n_terms", pa.int32()),
])


class DocMetaStage:
    """map_batches callable: (doc_id, content) -> per-doc stats rows."""

    def __init__(self, config: IndexConfig | None = None):
        self.config = config or IndexConfig()
        self.analyzer = Analyzer(self.config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("content").to_pylist()
        doc_ids = np.asarray(batch.column("doc_id").to_numpy(zero_copy_only=False),
                             dtype=np.int64)
        _, _, _, info = self.analyzer.tokenize_batch(texts, doc_ids)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "doc_len": pa.array(info["doc_len"], pa.int32()),
            "max_tf": pa.array(info["max_tf"], pa.int32()),
            "n_terms": pa.array(info["n_terms"], pa.int32()),
        }, schema=DOC_META_SCHEMA)
