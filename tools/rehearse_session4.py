"""100x rehearsal for the session-4 ops over the deterministic 500k-doc
table (rehearse_newops recipe) plus a 500k x 64 embeddings table with
16 planted label clusters — catches scale bugs the 500-row gate tables
can't (skewed anchors, oversized candidate sets, quadratic groups).

Usage: python tools/rehearse_session4.py [n_docs] [n_vecs] [out_json]
Tables land under /tmp/graft_rehearsal/; prints one JSON line.
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

from tools.rehearse_newops import synth  # noqa: E402  (same doc recipe)


def synth_embeddings(n_vecs: int, out_file: Path, d: int = 64,
                     n_labels: int = 16) -> None:
    """16 gaussian clusters, float32, labels = cluster id — one parquet
    file (row-grouped) because the duckdb query-matrix helpers read the
    literal path."""
    out_file.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    cents = rng.normal(0, 1.0, size=(n_labels, d))
    writer = None
    step = 100_000
    for base in range(0, n_vecs, step):
        n = min(step, n_vecs - base)
        labs = rng.integers(0, n_labels, size=n)
        mat = (cents[labs] + rng.normal(0, 0.35, size=(n, d))).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(np.arange(base, base + n, dtype=np.int64)),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            "label": pa.array(labs.astype(np.int32), pa.int32()),
        })
        if writer is None:
            writer = pq.ParquetWriter(out_file, tbl.schema)
        writer.write_table(tbl)
    if writer is not None:
        writer.close()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    out_json = sys.argv[3] if len(sys.argv) > 3 else "/tmp/r4_session4.json"
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
        print(f"synth docs: {time.time() - t0:.1f}s", file=sys.stderr)
    emb = sf_dir / "embeddings.parquet"
    if not emb.exists():
        t0 = time.time()
        synth_embeddings(n_vecs, emb)
        print(f"synth embeddings: {time.time() - t0:.1f}s", file=sys.stderr)

    from searchengine_ray.pipelines import ann, dedup, docsearch, events

    results: dict[str, dict] = {}

    def run(name, fn, scale):
        t0 = time.time()
        res = fn()
        n_rows = res.num_rows if hasattr(res, "num_rows") else res.count()
        sec = round(time.time() - t0, 2)
        results[name] = {"sec": sec, "rows": int(n_rows),
                         "items_per_sec": int(scale / sec)}
        print(f"{name}: {sec}s rows={n_rows}", file=sys.stderr)

    s = str(sf_dir)
    run("ann_sq8_topk", lambda: ann.ann_sq8_topk(s), n_vecs)
    run("ann_filtered_topk", lambda: ann.ann_filtered_topk(s), n_vecs)
    run("doc_outlier_score", lambda: ann.doc_outlier_score(s), n_vecs)
    # exact-span contamination at the documented 100-TB knobs (k=30,
    # content-defined anchors) — same setting the dedup_spans rehearsal
    # proved tractable on this boilerplate-heavy vocabulary
    run("ngram_contamination_k30_mod8",
        lambda: dedup.ngram_contamination(s, k=30, anchor_mod=8), n_docs)
    # flagship index over the 500k table, then the whole-index export
    # and per-term explain through it
    t0 = time.time()
    docsearch.ensure_doc_index(s)
    results["doc_index_build"] = {"sec": round(time.time() - t0, 2)}
    print(f"doc_index_build: {results['doc_index_build']['sec']}s",
          file=sys.stderr)
    run("index_postings_export", lambda: docsearch.index_postings_export(s),
        n_docs)
    run("search_explain", lambda: docsearch.search_explain(s), n_docs)
    run("event_topk_paths_sf01",
        lambda: events.event_topk_paths("/root/testdata/sf0.1"), 100_000)

    out = {"n_docs": n_docs, "n_vecs": n_vecs, "num_cpus": cpus,
           "ops": results,
           "table": ("rehearse_newops 500k-doc recipe + 500k x 64 "
                     "float32 embeddings, 16 clusters, sigma 0.35")}
    Path(out_json).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
