"""JSONL / CSV corpus sources.

The reference ingests a directory of raw text files
(/root/reference/search_engine.py:21-39 walks a corpus dir); parquet is
this repo's native layout, and these readers widen ingestion to the two
interchange formats corpora actually arrive in — newline-delimited JSON
and CSV — by normalizing either into the corpus schema
``(repo, path, commit, lang, content)`` that ``build_index`` consumes.
Both build on Ray Data's parallel file readers, so ingestion streams
and shards exactly like the parquet path; missing metadata columns are
filled with deterministic defaults, extra columns are dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CORPUS_COLS = ("repo", "path", "commit", "lang", "content")


def _normalize_factory(content_column: str, source_name: str):
    def normalize(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        names = set(batch.column_names)
        if content_column not in names:
            raise ValueError(
                f"corpus source needs a '{content_column}' column; "
                f"got {sorted(names)}")
        cols: dict[str, pa.Array] = {}
        for c in _CORPUS_COLS:
            if c == "content":
                cols[c] = batch.column(content_column).cast(pa.large_string())
            elif c in names:
                cols[c] = batch.column(c).cast(pa.string())
            elif c == "repo":
                cols[c] = pa.array([source_name] * n, pa.string())
            elif c == "path":
                # a per-row key is required for stable identity: prefer
                # an explicit id-ish column, else fall back to the row's
                # content hash (identical rows collapse to one key —
                # exactly the dedup_exact first-wins contract)
                if "doc_id" in names:
                    ids = batch.column("doc_id").cast(pa.string()).to_pylist()
                    cols[c] = pa.array([f"doc_{i}.txt" for i in ids],
                                       pa.string())
                else:
                    import hashlib

                    texts = batch.column(content_column).to_pylist()
                    cols[c] = pa.array(
                        [f"sha_{hashlib.sha1(t.encode()).hexdigest()}.txt"
                         for t in texts], pa.string())
            else:
                cols[c] = pa.array([""] * n, pa.string())
        return pa.table(cols)

    return normalize


def corpus_from_jsonl(path, content_column: str = "content"):
    """Newline-delimited JSON file(s) -> corpus Dataset. Accepts a file
    or directory; parallel read via ``ray.data.read_json``. ``.gz``
    members read transparently (corpora usually arrive compressed) —
    detection is by extension, directory-wide."""
    from pathlib import Path

    import ray.data

    p = Path(str(path))
    files = sorted(p.rglob("*")) if p.is_dir() else [p]
    gz = [f for f in files if f.suffix == ".gz"]
    kw = {}
    if gz:
        if any(f.is_file() and f.suffix != ".gz" for f in files):
            raise ValueError("mixed .gz and plain JSONL in one source "
                             "directory — split them into two builds")
        kw["arrow_open_stream_args"] = {"compression": "gzip"}
    ds = ray.data.read_json(str(path), **kw)
    return ds.map_batches(_normalize_factory(content_column, "jsonl"),
                          batch_format="pyarrow")


def corpus_from_csv(path, content_column: str = "content"):
    """CSV file(s) -> corpus Dataset, same normalization contract."""
    import ray.data

    ds = ray.data.read_csv(str(path))
    return ds.map_batches(_normalize_factory(content_column, "csv"),
                          batch_format="pyarrow")
