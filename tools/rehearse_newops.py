"""100x rehearsal for the late-round-4 ops (pair_pagerank, bpe_train)
over a deterministic 500k-doc synthetic table — the same table recipe
as BENCH/r4_ops_500k.json (60-word vocabulary, ~45 words/doc, exact dup
every 50th doc) so numbers are comparable.

Usage: python tools/rehearse_newops.py [n_docs] [out_json]
Writes the table under /tmp/graft_rehearsal/, runs each op end-to-end
at num_cpus from RAY_GRAFT_CPUS (default 32), prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [f"w{i:02d}" for i in range(40)] + [
    "data", "table", "query", "join", "hash", "scan", "sort", "merge",
    "batch", "stream", "filter", "group", "window", "value", "row",
    "column", "spark", "fast", "slow", "key"]


def synth(n_docs: int, out_dir: Path, rows_per_file: int = 50_000) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    prev_text = None
    for base in range(0, n_docs, rows_per_file):
        n = min(rows_per_file, n_docs - base)
        lens = rng.integers(35, 56, size=n)
        texts = []
        for i in range(n):
            did = base + i
            if did % 50 == 49 and prev_text is not None:
                texts.append(prev_text)          # exact dup chain seed
            else:
                idx = rng.integers(0, len(VOCAB), size=int(lens[i]))
                t = " ".join(VOCAB[j] for j in idx)
                texts.append(t)
                prev_text = t
        ids = np.arange(base, base + n, dtype=np.int64)
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([["en", "de", "fr", "es", "zh"][d % 5]
                              for d in ids.tolist()], pa.string()),
            "source": pa.array([f"src{d % 7}" for d in ids.tolist()],
                               pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })
        pq.write_table(tbl, out_dir / f"documents-{base:08d}.parquet")
    # the read() helper expects <sf_dir>/documents.parquet; a dataset
    # directory named documents.parquet works for pyarrow/ray readers
    agg = out_dir / "documents.parquet"
    if not agg.exists():
        agg.mkdir()
        for f in sorted(out_dir.glob("documents-*.parquet")):
            f.rename(agg / f.name)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r4_newops.json"
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf_dir = Path("/tmp/graft_rehearsal") / f"docs_{n_docs}"
    if not (sf_dir / "documents.parquet").exists():
        t0 = time.time()
        synth(n_docs, sf_dir)
        print(f"synth: {time.time() - t0:.1f}s", file=sys.stderr)

    from searchengine_ray.pipelines.dedup import pair_pagerank
    from searchengine_ray.pipelines.textstats import bpe_train

    results: dict[str, dict] = {}
    for name, fn in [("pair_pagerank", pair_pagerank),
                     ("bpe_train", bpe_train)]:
        t0 = time.time()
        res = fn(str(sf_dir))
        n_rows = (res.num_rows if hasattr(res, "num_rows")
                  else res.count())
        sec = round(time.time() - t0, 2)
        results[name] = {"sec": sec, "rows": int(n_rows),
                         "docs_per_sec": int(n_docs / sec)}
        print(f"{name}: {sec}s rows={n_rows}", file=sys.stderr)

    out = {"n_docs": n_docs, "num_cpus": cpus, "ops": results,
           "table": ("synthetic 500k-doc table (60-word vocabulary, "
                     "~45 words/doc, exact dup every 50th)")}
    Path(out_json).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
