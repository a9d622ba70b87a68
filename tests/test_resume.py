"""Checkpointed resume (SURVEY §5 strategy #3): completed partitions are
skipped; a damaged partition is rebuilt; final index is identical.
Also: skew-split multi-bucket postings stay correct."""

import os
import pathlib

from searchengine_ray.config import IndexConfig
from searchengine_ray.corpus import corpus_queries, ensure_corpus
from searchengine_ray.oracle import OracleIndex
from searchengine_ray.pipelines.build import build_index
from searchengine_ray.pipelines.query import IndexSearcher


def test_resume_skips_completed_and_rebuilds_damaged(ray_session, t1_corpus_dir,
                                                     small_config, tmp_path):
    root = tmp_path / "idx_resume"
    build_index(t1_corpus_dir, root, small_config, resume=False)
    post_dir = pathlib.Path(root) / "postings"
    files = sorted(post_dir.glob("part-*.parquet"))
    assert len(files) == small_config.num_term_parts
    mtimes_before = {f.name: f.stat().st_mtime_ns for f in files}

    # damage one partition: remove its parquet (manifest now invalid)
    victim = files[2]
    victim_name = victim.name
    os.unlink(victim)

    paths = build_index(t1_corpus_dir, root, small_config, resume=True)

    files_after = sorted(post_dir.glob("part-*.parquet"))
    assert [f.name for f in files_after] == [f.name for f in files]
    for f in files_after:
        if f.name == victim_name:
            continue
        # untouched partitions were skipped (same file, not rewritten)
        assert f.stat().st_mtime_ns == mtimes_before[f.name], f.name

    # rebuilt index still matches the oracle
    import pyarrow.parquet as pq

    tbl = pq.read_table(sorted(pathlib.Path(t1_corpus_dir).glob("*.parquet")))
    o = OracleIndex(tbl, small_config)
    s = IndexSearcher(paths, small_config)
    assert s.df_map() == o.df
    for qid, text in corpus_queries(n=10):
        assert s.search(text, 10) == o.search(text, 10)


def test_skew_split_multi_bucket(ray_session, t1_corpus_dir, tmp_path):
    """Tiny doc_bucket_size forces every common term into many bucket
    rows; merge + query must stitch them back identically."""
    cfg = IndexConfig(num_doc_parts=4, num_term_parts=8, doc_bucket_size=64)
    paths = build_index(t1_corpus_dir, tmp_path / "idx_skew", cfg, resume=False)
    import pyarrow.parquet as pq

    tbl = pq.read_table(sorted(pathlib.Path(t1_corpus_dir).glob("*.parquet")))
    o = OracleIndex(tbl, cfg)
    s = IndexSearcher(paths, cfg)
    assert s.df_map() == o.df
    # a hot term must actually be split across buckets
    hot = max(o.df, key=o.df.get)
    assert len(s.postings_for(hot)) > 1
    for qid, text in corpus_queries(n=15):
        assert s.search(text, 10) == o.search(text, 10)
        assert s.search(text, 10, method="bmw") == o.search(text, 10)


def test_min_df_prune(ray_session, t1_corpus_dir, tmp_path):
    """min_df=2 drops singleton terms (reference indexer.py:604-615)."""
    cfg = IndexConfig(num_doc_parts=4, num_term_parts=8, min_df=2)
    paths = build_index(t1_corpus_dir, tmp_path / "idx_mindf", cfg, resume=False)
    import pyarrow.parquet as pq

    tbl = pq.read_table(sorted(pathlib.Path(t1_corpus_dir).glob("*.parquet")))
    o = OracleIndex(tbl, cfg)
    s = IndexSearcher(paths, cfg)
    assert s.df_map() == o.df
    assert all(df >= 2 for df in s.df_map().values())
