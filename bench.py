"""Benchmark harness.

Plain run: executes the headline pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) plus a full index build + query phase on
the deterministic synthetic bench corpus (100k source-code docs), and
prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ..., "queries_per_sec": ...}

``--scaling``: runs the same job in two FRESH processes at
``num_cpus=8`` and ``num_cpus=32`` on identical input and reports both
throughputs + scaling efficiency (the in-sandbox evidence for the
north_rule's two-cluster-size criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from searchengine_ray.config import IndexConfig
    from searchengine_ray.corpus import corpus_queries, ensure_corpus
    from searchengine_ray.pipelines import ann, dedup, docsearch
    from searchengine_ray.pipelines import relational as rel
    from searchengine_ray.pipelines import textstats as ts
    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.pipelines.query import search_queries

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # host-state marker: this box's sustained throughput drifts up to 7x
    # between burst and throttled phases (BENCH/host_ceiling_r2.json);
    # a fixed no-Ray ALU pool timed beside the run lets any reader
    # normalize this JSON against the host state it was measured in
    extra["host_calib_sec"] = host_calibration(num_cpus)

    # ---- flagship: full index build over the synthetic bench corpus ----
    from searchengine_ray.corpus import TIER_SIZES

    corpus_dir = ensure_corpus("bench")          # cached across runs
    n_docs = TIER_SIZES["bench"]
    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.parquet as pq
    from pathlib import Path

    for f in Path(corpus_dir).glob("*.parquet"):
        pq.read_table(f)

    # IDENTICAL config at every parallelism level — the scaling
    # comparison must run the same logical job, only with more workers.
    # 96 term parts: fine enough that the reduce wave bin-packs well at
    # 32 cpus (4 waves, ~88% occupancy) instead of quantizing at 1.5
    # ragged waves with 32 parts.
    cfg = IndexConfig(num_doc_parts=32, num_term_parts=96,
                      tokenize_batch_size=2048)
    os.environ.setdefault("GRAFT_BUILD_TIMINGS", "1")
    out_root = f"/tmp/graft_bench_index/{num_cpus}"
    import shutil

    # best-of-2 builds: a single sample lands wherever the host's
    # burst/throttle cycle happens to be (7x drift measured on identical
    # runs); the faster build is the one that reflects the code
    best_sec, best_paths = None, None
    for _ in range(2):
        shutil.rmtree(out_root, ignore_errors=True)
        t0 = time.time()
        paths = build_index(corpus_dir, out_root, cfg, resume=False)
        dt = time.time() - t0
        if best_sec is None or dt < best_sec:
            best_sec, best_paths = dt, paths
            best_phases = paths.meta().get("build_phase_seconds", {})
    paths = best_paths
    timings["index_build"] = best_sec
    extra["docs_per_sec"] = round(n_docs / timings["index_build"], 1)

    for ph, sec in best_phases.items():
        extra[f"build_{ph}_sec"] = sec

    # fresh Ray session between phases: the build leaves ~100+ worker
    # processes and object-store residue that measurably degrade and
    # destabilize the query pool on this single shared box
    ray.shutdown()
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")

    # ---- query phase: persistent actor pool, warm-up excluded,
    # best-of-2 passes (the sandbox shows heavy co-tenant noise) ----
    from searchengine_ray.pipelines.query import QueryService

    # one actor per cpu: each _QueryActor is a single-threaded 1-CPU
    # process, so num_cpus//2 left half the machine idle in steady state
    # (measured at 32 cpus: 16 actors 1081 q/s vs 32 actors 1888 q/s,
    # and at 8 cpus: 4 actors 286 vs 8 actors 573) AND broke N->4N
    # proportionality at narrow widths (max(2, 2//2)=2 actors at 2 cpus
    # vs 4 at 8 cpus = a 2x pool for a 4x cluster, capping the measured
    # queries efficiency at ~0.53 by construction). Spin-up also improves
    # with more actors (attach is overlapped): 12.6 s -> 5.9 s at 32.
    n_actors = max(2, num_cpus)
    t0 = time.time()
    svc = QueryService(paths, cfg, num_actors=n_actors, k=10, method="impact")
    svc.warmup(corpus_queries(n=40))
    extra["query_pool_spinup_sec"] = round(time.time() - t0, 3)
    for ph, sec in svc.spinup_breakdown.items():
        extra[f"spinup_{ph}_sec"] = sec
    qs = corpus_queries(n=40) * 300
    qs = [(i + 1, t) for i, (_, t) in enumerate(qs)]
    best = None
    for _ in range(2):
        t0 = time.time()
        res = svc.search_batch(qs)
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    timings["bm25_queries"] = best
    extra["queries_per_sec"] = round(len(qs) / best, 1)
    svc.shutdown()
    assert len(res) > 0

    # re-serve spin-up: the first QueryService above computed + persisted
    # the hot-term image (<index>/hot_cache); serving the SAME index again
    # — the production restart/redeploy path — must hit that cache instead
    # of redoing the bandwidth-bound precompute
    t0 = time.time()
    svc = QueryService(paths, cfg, num_actors=n_actors, k=10, method="impact")
    svc.warmup(corpus_queries(n=8))
    extra["spinup_reserve_sec"] = round(time.time() - t0, 3)
    svc.shutdown()

    # ---- sf_dir pipelines (documents/embeddings/lineitem tables) ----
    def timed(name, fn):
        t0 = time.time()
        r = fn(sf_dir)
        if hasattr(r, "to_pandas"):
            r = r.to_pandas()
        timings[name] = time.time() - t0

    # the scaling harness measures only the build + query phases; the
    # sf-side pipeline sweep adds minutes per sample at narrow widths
    # without feeding any scaling metric
    if not os.environ.get("GRAFT_BENCH_SCALING_ONLY"):
        timed("term_df", ts.term_df)
        timed("doc_token_stats", ts.doc_token_stats)
        timed("dedup_exact", dedup.dedup_exact)
        timed("minhash_lsh", dedup.minhash_lsh_dedup)
        timed("ann_topk", ann.ann_topk)
        timed("pricing_summary", rel.pricing_summary)
        timed("events_daily", rel.events_daily)
        timed("bm25_docs_table", docsearch.bm25_topk)
        from searchengine_ray.pipelines import trigram as tg

        timed("trigram_substring", tg.trigram_substring_search)
        # r5 rows: candidate-scale filtered retrieval (trigram /\ BM25)
        # and navigable-graph ANN (first call builds the kNN graph)
        timed("filtered_search", tg.filtered_search)
        timed("ann_graph", ann.ann_graph_topk)

    total = sum(timings.values())
    return {
        "metric": "index-build + BM25 query throughput + sf pipelines",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **extra,
    }


def _calib_task(i: int) -> float:
    """Fixed, cache-resident integer work — no Ray, no shared memory, no
    disk. 64 of these in a pool of N measure how well THIS HOST scales
    embarrassingly-parallel compute from 8 to 32 workers right now."""
    import numpy as np

    a = np.arange(20_000, dtype=np.int64) + i
    s = 0
    for _ in range(20_000):
        a = a * 6364136223846793005 + 1442695040888963407
        s ^= int(a[0])
    return float(s % 2)


def host_calibration(n: int) -> float:
    """Wall seconds for 64 fixed ALU tasks in a ``n``-process pool."""
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(n) as pool:
        pool.map(_calib_task, range(64))
    return round(time.time() - t0, 3)


def _fork_ctx():
    """The query calibration's shared-pages premise (parent builds the
    array, children read the same physical pages) only holds under
    fork; fail fast where fork is unavailable rather than crashing in
    the workers with _QCAL_ARR=None under spawn."""
    import multiprocessing as mp

    return mp.get_context("fork")


_QCAL_ARR = None


def _query_calib_init():
    # built in the PARENT before fork: children share the physical pages
    # read-only — the same one-copy-many-readers memory shape as the
    # plasma-shared index image the query actors gather from
    global _QCAL_ARR
    import numpy as np

    if _QCAL_ARR is None:
        _QCAL_ARR = (np.arange(8_000_000, dtype=np.int64) * 2654435761
                     % 1_000_003).astype(np.float64)


def _query_calib_task(i: int) -> float:
    """Fixed query-shaped work: strided gathers from the big SHARED
    read-only array + BM25-ish float math + a small lexsort — the
    memory-access profile of one scored query (posting gather, score,
    top-k), with zero Ray/IPC. How a pool of these scales 8->32 is the
    host's ceiling for the QUERY phase specifically (the ALU task
    measures pure compute; queries are gather-bound)."""
    import numpy as np

    a = _QCAL_ARR
    n = len(a)
    acc = 0
    idx_base = np.arange(400_000, dtype=np.int64)
    for r in range(48):
        idx = (idx_base * (2654435761 + 9176 * i + r)) % n
        tf = a[idx]
        score = tf * 2.2 / (tf + 0.3 + 0.9 * (r + 1))
        top = np.lexsort((idx[:2048], -score[:2048]))[:10]
        acc ^= int(score.sum()) ^ int(top[0])
    return float(acc % 2)


def query_calibration(n: int) -> float:
    """Wall seconds for 64 fixed query-shaped tasks in an ``n``-process
    pool over one shared read-only array."""
    _query_calib_init()
    t0 = time.time()
    with _fork_ctx().Pool(n) as pool:
        pool.map(_query_calib_task, range(64))
    return round(time.time() - t0, 3)


def run_scaling(repeats: int = 3, levels: tuple[int, int] = (8, 32)) -> dict:
    """Same job, fresh processes, ``levels[0]`` vs ``levels[1]`` cpus ->
    scaling efficiency (the brief's "N and 4N CPUs" evidence).

    Each level runs ``repeats`` times INTERLEAVED (8,32,8,32,...) and
    keeps the fastest core (build+queries) run per level — the sandbox
    shows bursts of co-tenant CPU steal (identical runs vary up to 3x;
    load swings 0.4-18 with zero local processes) that would otherwise
    dominate a single sample, and the drift is time-correlated, so
    alternating levels decorrelates it. A no-Ray multiprocessing ALU
    calibration (``host_calibration``) runs beside each sample pair: it
    measures the host's OWN ceiling for embarrassingly-parallel compute
    at the two widths, so job efficiency can be read against what the
    hardware actually offers (32 advertised cpus on this box do NOT
    deliver 4x the sustained throughput of 8; see
    ``host_parallel_ceiling`` in the output). Besides the best-of
    summary, ``per_rep`` records every interleaved pair's raw
    efficiencies so a single invocation documents run-to-run spread."""
    lo, hi = levels
    ratio = hi / lo
    results: dict[int, tuple] = {}
    failures = {lo: 0, hi: 0}
    loads: dict[int, list] = {lo: [], hi: []}
    calib: dict[int, list] = {lo: [], hi: []}
    qcalib: dict[int, list] = {lo: [], hi: []}
    per_rep: list[dict] = []
    rep_samples: dict[int, dict] = {}
    for rep in range(repeats):
        rep_samples = {}
        for n in (lo, hi):
            calib[n].append(host_calibration(n))
            qcalib[n].append(query_calibration(n))
            loads[n].append(round(os.getloadavg()[0], 2))
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, capture_output=True, text=True,
                                 cwd=os.path.dirname(os.path.abspath(__file__)))
            if out.returncode != 0:
                # co-tenant OOM/timeout bursts can kill one sample; report
                # it and keep sampling rather than aborting the harness
                failures[n] += 1
                print(f"[scaling] sample failed (num_cpus={n}):\n"
                      + out.stderr[-2000:], file=sys.stderr)
                continue
            r = json.loads(out.stdout.strip().splitlines()[-1])
            core = r["queries"]["index_build"] + r["queries"]["bm25_queries"]
            rep_samples[n] = r
            if n not in results or core < results[n][0]:
                results[n] = (core, r)
        if lo in rep_samples and hi in rep_samples:
            rl, rh = rep_samples[lo], rep_samples[hi]

            def _e(tl, th):
                return round((tl / th) / ratio, 3) if th else None

            per_rep.append({
                "rep": rep,
                "build_eff": _e(rl.get("build_phase2_postings_sec", 0.0),
                                rh.get("build_phase2_postings_sec", 0.0)),
                "queries_eff": _e(rl["queries"]["bm25_queries"],
                                  rh["queries"]["bm25_queries"]),
                "overall_eff": _e(
                    rl["queries"]["index_build"] + rl["queries"]["bm25_queries"],
                    rh["queries"]["index_build"] + rh["queries"]["bm25_queries"]),
                "alu_ceiling": round((calib[lo][-1] / calib[hi][-1]) / ratio, 3),
            })
    for n in (lo, hi):
        if n not in results:
            raise RuntimeError(f"all scaling samples failed at num_cpus={n}")
        results[n] = results[n][1]
        results[n]["failed_samples"] = failures[n]
    def eff(name, getter):
        tl, th = getter(results[lo]), getter(results[hi])
        return {f"{name}_sec_{lo}": round(tl, 3), f"{name}_sec_{hi}": round(th, 3),
                f"{name}_efficiency": round((tl / th) / ratio, 3)}

    out = {
        "metric": f"scaling efficiency ({lo} -> {hi} cpus, fresh processes, "
                  "same input+config)",
        "levels": [lo, hi],
        **eff("overall", lambda r: r["queries"]["index_build"]
              + r["queries"]["bm25_queries"]),
        # the compute-bound phases (ingest/normalize is single-disk-I/O
        # bound in this sandbox; on a real cluster it is per-node I/O):
        **eff("postings_build", lambda r: r.get("build_phase2_postings_sec",
                                                r["queries"]["index_build"])),
        # decomposition: the tokenize map wave (pure compute) vs the
        # merge/write reduce wave (object-store + disk bound on one box)
        **eff("postings_map", lambda r: r.get("build_phase2_map_wall_sec", 0.0)
              or r.get("build_phase2_postings_sec", 0.0)),
        **eff("postings_reduce", lambda r: r.get("build_phase2_reduce_wall_sec", 0.0)
              or r.get("build_phase2_postings_sec", 0.0)),
        **eff("queries", lambda r: r["queries"]["bm25_queries"]),
        f"docs_per_sec_{lo}": results[lo]["docs_per_sec"],
        f"docs_per_sec_{hi}": results[hi]["docs_per_sec"],
        f"queries_per_sec_{lo}": results[lo]["queries_per_sec"],
        f"queries_per_sec_{hi}": results[hi]["queries_per_sec"],
        "load_avg_before_runs": loads,
        "per_rep": per_rep,
        f"full_{lo}": results[lo], f"full_{hi}": results[hi],
    }
    # host ceiling: how a zero-shared-state ALU pool scales on this box
    # right now (1.0 = the hardware really has `ratio`x the throughput
    # at the wide level)
    c8, c32 = min(calib[lo]), min(calib[hi])
    out[f"host_calib_sec_{lo}"] = c8
    out[f"host_calib_sec_{hi}"] = c32
    out["host_parallel_ceiling"] = round((c8 / c32) / ratio, 3)
    # query-phase ceiling: gather-bound work over ONE shared read-only
    # array — what the hardware offers the query pool's access pattern
    # (distinct from the ALU ceiling; see _query_calib_task)
    q8, q32 = min(qcalib[lo]), min(qcalib[hi])
    out[f"query_calib_sec_{lo}"] = q8
    out[f"query_calib_sec_{hi}"] = q32
    out["query_host_ceiling"] = round((q8 / q32) / ratio, 3)
    out["queries_efficiency_vs_ceiling"] = round(
        out["queries_efficiency"] / out["query_host_ceiling"], 3)
    out["scaling_efficiency"] = out["overall_efficiency"]
    out["overall_efficiency_vs_host_ceiling"] = round(
        out["overall_efficiency"] / out["host_parallel_ceiling"], 3)
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        levels = (8, 32)
        if "--levels" in sys.argv:
            a, b = sys.argv[sys.argv.index("--levels") + 1].split(",")
            levels = (int(a), int(b))
        print(json.dumps(run_scaling(levels=levels)))
    else:
        out = run_bench()
        import ray

        ray.shutdown()
        print(json.dumps(out))
