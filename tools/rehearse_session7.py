"""100x rehearsal for the session-7 ops: a deterministic 5M-row events
table (for the dyadic quantile sketch and the KMV overlap sketch) plus
the 500k-doc table (for the bigram LM scorer and window rescoring) —
catches scale bugs the 1k-row gate tables can't (sketch fold volume,
bigram-vocabulary growth, window-rescore latency over a real index).

Usage: python tools/rehearse_session7.py [n_events] [n_docs] [out_json]
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

_TYPES = ["click", "view", "purchase", "signup", "error"]


def synth_events(n_events: int, out_file: Path, n_users: int = 50_000
                 ) -> None:
    """Deterministic events table in the gate schema: lognormal values
    (a realistic long tail for the quantile sketch), zipf-ish user
    popularity, and per-type user-universe offsets so the KMV pairwise
    Jaccards differ per pair instead of all being 1.0."""
    out_file.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(11)
    t0 = 1_700_000_000_000_000
    writer = None
    step = 500_000
    for base in range(0, n_events, step):
        n = min(step, n_events - base)
        tix = rng.integers(0, len(_TYPES), size=n)
        # type i draws users from [i * n_users/10, i * n_users/10 + n_users)
        # so adjacent types share ~90% of their universe, distant ones less
        uid = (tix * (n_users // 10)
               + rng.integers(0, n_users, size=n)).astype(np.int64)
        val = np.round(np.exp(rng.normal(3.0, 1.2, size=n)), 2)
        tbl = pa.table({
            "event_id": pa.array(np.arange(base, base + n, dtype=np.int64)),
            "ts": pa.array(t0 + rng.integers(0, 30 * 86_400_000_000, size=n),
                           pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array([_TYPES[i] for i in tix], pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })
        if writer is None:
            writer = pq.ParquetWriter(out_file, tbl.schema)
        writer.write_table(tbl)
    if writer is not None:
        writer.close()


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    out_json = sys.argv[3] if len(sys.argv) > 3 else "/tmp/r4_session7.json"
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    doc_dir = Path("/tmp/graft_rehearsal") / f"docs_{n_docs}"
    if not (doc_dir / "documents.parquet").exists():
        t0 = time.time()
        synth(n_docs, doc_dir)
        print(f"synth docs: {time.time() - t0:.1f}s", file=sys.stderr)
    ev_dir = Path("/tmp/graft_rehearsal") / f"events_{n_events}"
    if not (ev_dir / "events.parquet").exists():
        t0 = time.time()
        synth_events(n_events, ev_dir / "events.parquet")
        print(f"synth events: {time.time() - t0:.1f}s", file=sys.stderr)

    from searchengine_ray.pipelines import docsearch, events, textstats

    results: dict[str, dict] = {}

    def run(name, fn, scale):
        t0 = time.time()
        res = fn()
        n_rows = res.num_rows if hasattr(res, "num_rows") else res.count()
        sec = round(time.time() - t0, 2)
        results[name] = {"sec": sec, "rows": int(n_rows),
                         "items_per_sec": int(scale / max(sec, 0.01))}
        print(f"{name}: {sec}s rows={n_rows}", file=sys.stderr)

    e, d = str(ev_dir), str(doc_dir)
    run("value_quantiles_sketch",
        lambda: events.value_quantiles_sketch(e), n_events)
    run("value_quantiles_sketch_violations",
        lambda: events.value_quantiles_sketch_violations(e), n_events)
    run("user_kmv_registers", lambda: events.user_kmv_registers(e), n_events)
    run("user_overlap_kmv", lambda: events.user_overlap_kmv(e), n_events)
    run("bigram_logprob", lambda: textstats.bigram_logprob(d), n_docs)
    t0 = time.time()
    docsearch.ensure_doc_index(d)
    results["doc_index_build"] = {"sec": round(time.time() - t0, 2)}
    print(f"doc_index_build: {results['doc_index_build']['sec']}s",
          file=sys.stderr)
    run("rescore_search", lambda: docsearch.rescore_search(d), n_docs)

    out = {"n_events": n_events, "n_docs": n_docs, "num_cpus": cpus,
           "ops": results,
           "table": ("rehearse_newops 500k-doc recipe + 5M lognormal "
                     "events, 5 types, offset user universes")}
    Path(out_json).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
