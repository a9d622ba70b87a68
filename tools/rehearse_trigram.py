"""100x rehearsal for the trigram (codesearch) layer + champion lists:
builds the trigram posting index over a 500k-doc corpus and serves the
substring / regex query sets through it, then decodes champion lists
off the full-text index. Catches what the 500-doc gate can't: posting
shuffle volume, part-file sizes, candidate-set scale on common
needles, and the verify stage's referenced-text read pattern against a
multi-file corpus.

Usage: python tools/rehearse_trigram.py [n_docs] [out_json]
Corpus lands under /tmp/graft_rehearsal/; prints one JSON line.
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
    import ray

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH/r4_trigram_500k.json"

    base = Path("/tmp/graft_rehearsal") / f"docs_{n_docs}"
    if not (base / "documents.parquet").exists():
        synth(n_docs, base)

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from searchengine_ray.pipelines import docsearch, trigram

    res: dict = {"n_docs": n_docs}

    # fresh trigram build (drop any cached layout for this corpus) —
    # the cache tag now folds in the corpus fingerprint, so compute it
    # the same way ensure_trigram_index does
    import hashlib

    fp = trigram._corpus_fingerprint(str(base))
    tag = hashlib.blake2b(f"{base}|{fp}".encode(), digest_size=6).hexdigest()
    shutil.rmtree(f"/tmp/graft_trigram_index/{tag}", ignore_errors=True)
    t0 = time.perf_counter()
    root = trigram.ensure_trigram_index(str(base))
    res["trigram_build_sec"] = round(time.perf_counter() - t0, 2)
    res["trigram_docs_per_sec"] = round(n_docs / res["trigram_build_sec"])
    res["index_bytes"] = sum(p.stat().st_size
                             for p in Path(root).glob("shard_*.parquet"))

    t0 = time.perf_counter()
    n = trigram.trigram_substring_search(str(base)).count()
    res["substring_search_sec"] = round(time.perf_counter() - t0, 2)
    res["substring_hits"] = int(n)

    t0 = time.perf_counter()
    stats = trigram.trigram_prune_stats(str(base)).to_pandas()
    res["prune_stats_sec"] = round(time.perf_counter() - t0, 2)
    res["prune_stats"] = {
        int(r.query_id): {"cand": int(r.n_candidates), "match": int(r.n_matches)}
        for r in stats.itertuples()}

    t0 = time.perf_counter()
    n = trigram.trigram_regex_search(str(base)).count()
    res["regex_search_sec"] = round(time.perf_counter() - t0, 2)
    res["regex_hits"] = int(n)

    t0 = time.perf_counter()
    n = docsearch.champion_lists(str(base)).count()
    res["champion_sec_incl_index_build"] = round(time.perf_counter() - t0, 2)
    res["champion_rows"] = int(n)

    # filtered retrieval: the r5 candidate-scale claim — rows shuffled
    # into the ranking stage must track candidate count, not corpus
    # size (pre-r5 this decoded full posting lists + the entire
    # doc_meta table per call)
    fstats: dict = {}
    t0 = time.perf_counter()
    n = trigram.filtered_search(str(base), _stats=fstats).count()
    res["filtered_search_sec"] = round(time.perf_counter() - t0, 2)
    res["filtered_search_rows"] = int(n)
    res["filtered_search_stats"] = fstats
    res["filtered_contrib_per_candidate"] = round(
        fstats["contrib_rows_shuffled"]
        / max(1, fstats["n_candidates_union"]), 2)
    res["filtered_contrib_vs_corpus"] = round(
        fstats["contrib_rows_shuffled"] / n_docs, 4)

    # suffix wildcard via the reversed-term-sorted projection (r5):
    # dictionary row groups read must be a small fraction of the total
    sstats: dict = {}
    t0 = time.perf_counter()
    n = docsearch.suffix_search(str(base), _stats=sstats).count()
    res["suffix_search_sec"] = round(time.perf_counter() - t0, 2)
    res["suffix_search_rows"] = int(n)
    res["suffix_search_stats"] = sstats
    if sstats.get("proj_row_groups_total"):
        res["suffix_rg_read_frac"] = round(
            sstats["proj_row_groups_read"]
            / sstats["proj_row_groups_total"], 4)

    line = json.dumps(res)
    print(line)
    with open(out_json, "w") as f:
        f.write(line + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
