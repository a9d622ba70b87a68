"""Parallelism/batching invariance + crash-resume (SURVEY §5 #3/#4).

The build must produce LOGICALLY identical indexes regardless of how
work was batched or how many workers ran — doc ids are order-free by
construction, postings decode to the same arrays however segments were
cut — and a build killed mid-flight must resume to the same answers.
"""

import os
import signal
import subprocess
import sys
import time
import pathlib

import numpy as np

from searchengine_ray.codec import concat_blocks, decode_blocks
from searchengine_ray.config import IndexConfig
from searchengine_ray.corpus import corpus_queries
from searchengine_ray.oracle import OracleIndex
from searchengine_ray.pipelines.build import build_index
from searchengine_ray.pipelines.query import IndexSearcher


def test_batching_invariance(ray_session, t1_corpus_dir, t1_oracle, tmp_path):
    """Different tokenize batch sizes cut different posting segments —
    the decoded index and every search result must be identical."""
    cfg_a = IndexConfig(num_doc_parts=4, num_term_parts=8,
                        tokenize_batch_size=2048)
    cfg_b = IndexConfig(num_doc_parts=4, num_term_parts=8,
                        tokenize_batch_size=97)   # awkward on purpose
    pa_ = build_index(t1_corpus_dir, tmp_path / "a", cfg_a, resume=False)
    pb_ = build_index(t1_corpus_dir, tmp_path / "b", cfg_b, resume=False)
    sa = IndexSearcher(pa_, cfg_a)
    sb = IndexSearcher(pb_, cfg_b)
    assert sa.df_map() == sb.df_map() == t1_oracle.df
    for term in list(t1_oracle.postings)[:100]:
        da, ta = decode_blocks(concat_blocks(sa.postings_for(term)))
        db, tb = decode_blocks(concat_blocks(sb.postings_for(term)))
        assert np.array_equal(da, db) and np.array_equal(ta, tb), term
    for qid, text in corpus_queries(n=20):
        assert sa.search(text, 10) == sb.search(text, 10) \
            == t1_oracle.search(text, 10)


_KILL_BUILD_SCRIPT = """
import sys
sys.path.insert(0, "/root/repo")   # script lives in tmp; package lives here
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
from searchengine_ray.config import IndexConfig
from searchengine_ray.pipelines.build import build_index
cfg = IndexConfig(num_doc_parts=4, num_term_parts=8)
build_index(sys.argv[1], sys.argv[2], cfg, resume=True)
print("BUILD_DONE", flush=True)
"""


def test_kill_mid_build_then_resume(ray_session, t1_corpus_dir, t1_oracle,
                                    tmp_path):
    """SIGKILL the build process mid-flight; a resumed build must finish
    from the surviving manifests and match the oracle exactly."""
    root = tmp_path / "killed"
    script = tmp_path / "kill_build.py"
    script.write_text(_KILL_BUILD_SCRIPT)
    proc = subprocess.Popen([sys.executable, str(script), t1_corpus_dir,
                             str(root)], cwd="/root/repo",
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    # wait until at least one partition manifest lands, then kill hard
    deadline = time.time() + 120
    while time.time() < deadline:
        if list(pathlib.Path(root).rglob("*.manifest.json")):
            break
        if proc.poll() is not None:
            break                       # finished before we could kill: fine
        time.sleep(0.2)
    if proc.poll() is None:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()

    # resume in a fresh subprocess (own Ray session, like a real rerun)
    out = subprocess.run([sys.executable, str(script), t1_corpus_dir,
                          str(root)], cwd="/root/repo", capture_output=True,
                         text=True, timeout=300)
    assert "BUILD_DONE" in out.stdout, out.stderr[-500:]

    cfg = IndexConfig(num_doc_parts=4, num_term_parts=8)
    s = IndexSearcher(str(root), cfg)
    assert s.df_map() == t1_oracle.df
    for qid, text in corpus_queries(n=10):
        assert s.search(text, 10) == t1_oracle.search(text, 10)
