"""Query-file source and results sink.

Reference parity:
- ``read_queries_file`` parses the reference's ``queries.txt`` format —
  lines like ``"3. some query text"`` (``/root/reference/
  search_engine.py:84-98``); lines without a numeric prefix get
  sequential ids, blank lines are skipped.
- ``write_results`` replaces the reference's ``results.csv`` writer
  (``search_engine.py:113-123``: ``[Query_num, Tweet_id, Rank]``) with a
  partitioned CSV/Parquet sink of the results Dataset.
"""

from __future__ import annotations

import re
from pathlib import Path

_LINE_RE = re.compile(r"^\s*(\d+)\s*[.)]\s*(.*\S)\s*$")


def parse_queries_text(text: str) -> list[tuple[int, str]]:
    out: list[tuple[int, str]] = []
    next_id = 1
    for line in text.splitlines():
        if not line.strip():
            continue
        m = _LINE_RE.match(line)
        if m:
            qid, qtext = int(m.group(1)), m.group(2)
        else:
            qid, qtext = next_id, line.strip()
        out.append((qid, qtext))
        next_id = max(next_id, qid) + 1
    return out


def read_queries_file(path: str | Path) -> list[tuple[int, str]]:
    """Driver-side small read (a query file is tiny; no Dataset needed —
    the reference reads it the same way)."""
    return parse_queries_text(Path(path).read_text(encoding="utf-8"))


def queries_dataset(path: str | Path):
    """The same file as a (query_id, text) Dataset when the caller wants
    to fan out through ``search_queries`` directly."""
    import ray.data

    return ray.data.from_items(
        [{"query_id": q, "text": t} for q, t in read_queries_file(path)])


def write_results(results_ds, out_dir: str | Path, fmt: str = "csv"):
    """Write a results Dataset (query_id, rank, doc_id, score) —
    partitioned files, resumable by rerun-and-overwrite."""
    out_dir = str(out_dir)
    if fmt == "csv":
        results_ds.write_csv(out_dir)
    else:
        results_ds.write_parquet(out_dir)
    return out_dir
