"""searchengine_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch rebuild of the *capabilities* of guy94/SearchEngine
(reference at /root/reference, studied structurally in SURVEY.md) on an
idiomatic Ray Data architecture:

- tokenization / term-frequency extraction as ``map_batches`` over
  zero-copy Arrow batches (reference: per-row Python loop,
  ``search_engine.py:31-39``),
- posting-list construction as a per-batch partial-postings stage plus a
  single ``groupby(term-shard)`` sort-shuffle (reference: in-heap dict +
  hand-rolled pickle spill / k-way merge, ``indexer.py:130-554``),
- delta + variable-byte compressed, block-sliced posting lists with
  block-max metadata for WAND pruning,
- BM25 top-k retrieval in stateful actor-pool query executors
  (reference: tf-idf + cosine, ``searcher.py``/``ranker.py``),
- per-partition lineage manifests and checkpointed resume.

Everything here derives from public knowledge only: the Ray Data and
pyarrow public APIs, and classic IR literature (BM25, VByte, block-max
WAND).
"""

from searchengine_ray.config import IndexConfig

__all__ = ["IndexConfig"]
__version__ = "0.1.0"
