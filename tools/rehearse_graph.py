"""100x+ rehearsal for the navigable-graph ANN layer: synthesize a
clustered embedding table (the regime that defeats naive entry
selection — near-zero inter-cluster cosine gradient), build the
symmetric kNN graph, and serve the default query set through the NSW
beam search, recording build/search wall, visited fraction and
recall@10 vs the exact scan.

Usage: python tools/rehearse_graph.py [n_vecs] [out_json]
Corpus lands under /tmp/graft_rehearsal/; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DIM = 32
_N_CLUSTERS = 25


def synth_embeddings(n_vecs: int, out_dir: Path) -> None:
    """Deterministic clustered vectors: 25 near-orthogonal cluster
    directions + small in-cluster noise (what real doc embeddings look
    like after topic clustering, and the shape that capped flat-graph
    recall at 0.4 before md5-rank entries)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((_N_CLUSTERS, _DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    ids = np.arange(n_vecs, dtype=np.int64)
    labels = ids % _N_CLUSTERS
    noise = rng.standard_normal((n_vecs, _DIM)) * 0.25
    mat = centers[labels] + noise
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int64()),
    }), out_dir / "embeddings.parquet")


def main() -> None:
    import ray

    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH/r5_graph_100k.json"

    base = Path("/tmp/graft_rehearsal") / f"vecs_{n_vecs}"
    if not (base / "embeddings.parquet").exists():
        synth_embeddings(n_vecs, base)

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from searchengine_ray.pipelines import ann

    res: dict = {"n_vecs": n_vecs, "dim": _DIM, "n_clusters": _N_CLUSTERS}

    # fresh graph build (drop any cached layout for this corpus)
    import hashlib

    fp = ann._fingerprint_of(str(base))
    tag = hashlib.blake2b(f"{base}|graph{ann._GRAPH_K}|{fp}".encode(),
                          digest_size=6).hexdigest()
    shutil.rmtree(f"/tmp/graft_graph_index/{tag}", ignore_errors=True)
    t0 = time.perf_counter()
    root = ann.ensure_graph_index(str(base))
    res["graph_build_sec"] = round(time.perf_counter() - t0, 2)
    res["graph_vecs_per_sec"] = round(n_vecs / res["graph_build_sec"])
    res["edge_bytes"] = sum(p.stat().st_size
                            for p in Path(root).glob("edges_*.parquet"))

    t0 = time.perf_counter()
    exact = ann.ann_topk(str(base)).to_pandas()
    res["exact_scan_sec"] = round(time.perf_counter() - t0, 2)

    # two serving configs: the gate constants the SQL oracle unrolls,
    # and the scale config (rounds ~ log N, wider beam — HNSW's ef)
    configs = {"gate": {}, "scaled": {"rounds": 8, "beam": 48}}
    for name, kw in configs.items():
        st: dict = {}
        t0 = time.perf_counter()
        got = ann.ann_graph_topk(str(base), _stats=st, **kw)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        recalls = []
        for q in sorted(got.query_vec_id.unique()):
            g = set(got[got.query_vec_id == q].vec_id)
            e = set(exact[exact.query_vec_id == q].vec_id)
            recalls.append(round(len(g & e) / len(e), 3))
        res[name] = {
            "config": kw,
            "search_sec": round(time.perf_counter() - t0, 2),
            "visited_per_query": st["visited_per_query"],
            "visited_frac": round(max(st["visited_per_query"]) / n_vecs, 5),
            "edge_rows_read": st["edge_rows_read"],
            "recall_at_10": recalls,
            "recall_mean": round(sum(recalls) / len(recalls), 3),
        }

    line = json.dumps(res)
    print(line)
    with open(out_json, "w") as f:
        f.write(line + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
