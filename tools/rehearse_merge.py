"""100x rehearsal for merge_indexes: build two 250k-doc indexes, merge
them, and compare the merge wall against a full 500k rebuild — the
evidence that merging costs byte I/O, not re-tokenization. Uses the
same synthetic table recipe as rehearse_newops.py.

Usage: python tools/rehearse_merge.py [n_docs] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rehearse_newops import synth  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/merge_rehearsal.json"
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from searchengine_ray.config import IndexConfig
    from searchengine_ray.pipelines.build import build_index, merge_indexes

    sf_dir = Path("/tmp/graft_rehearsal") / f"docs_{n_docs}"
    if not (sf_dir / "documents.parquet").exists():
        synth(n_docs, sf_dir)
    files = sorted((sf_dir / "documents.parquet").glob("*.parquet"))
    half = len(files) // 2
    work = Path("/tmp/graft_merge_rehearsal")
    shutil.rmtree(work, ignore_errors=True)
    (work / "halfA").mkdir(parents=True)
    (work / "halfB").mkdir(parents=True)
    for f in files[:half]:
        os.symlink(f, work / "halfA" / f.name)
    for f in files[half:]:
        os.symlink(f, work / "halfB" / f.name)

    # the documents table is (doc_id, text, ...); remap to corpus schema
    # via parquet rewrite? build_index takes the corpus schema — the
    # rehearsal table lacks repo/path/commit, so map through a Dataset.
    import pyarrow as pa
    import ray.data as rd

    def remap(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        n = batch.num_rows
        return pa.table({
            "repo": batch.column("source"),
            "path": pa.array([f"doc_{i}.txt" for i in ids], pa.string()),
            "commit": pa.array([""] * n, pa.string()),
            "lang": batch.column("lang"),
            "content": batch.column("text"),
        })

    def corpus(d: Path):
        fs = sorted(str(f) for f in d.glob("*.parquet"))
        return rd.read_parquet(fs).map_batches(remap, batch_format="pyarrow")

    cfg = IndexConfig(num_doc_parts=16, num_term_parts=32)
    results: dict[str, float] = {}

    t0 = time.time()
    full = build_index(corpus(work / "halfA").union(corpus(work / "halfB")),
                       work / "full", cfg)
    results["build_full_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    ia = build_index(corpus(work / "halfA"), work / "ia", cfg)
    results["build_a_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    ib = build_index(corpus(work / "halfB"), work / "ib", cfg)
    results["build_b_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    merged = merge_indexes(ia.root, ib.root, work / "merged")
    results["merge_sec"] = round(time.time() - t0, 2)

    mf, mm = full.meta(), merged.meta()
    for k in ("N", "total_len", "n_terms", "n_postings"):
        assert mf[k] == mm[k], (k, mf[k], mm[k])
    out = {"n_docs": n_docs, "num_cpus": cpus, **results,
           "merge_vs_rebuild_speedup": round(
               results["build_full_sec"] / results["merge_sec"], 1),
           "stats_verified": ["N", "total_len", "n_terms", "n_postings"]}
    Path(out_json).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
