"""Query engine: oracle rank identity (exact floats), BMW == exhaustive,
actor-pool stage, edge cases."""

import numpy as np

from searchengine_ray.corpus import corpus_queries
from searchengine_ray.pipelines.query import IndexSearcher, search_queries


def test_rank_identity_vs_oracle(t1_index, t1_oracle, small_config):
    s = IndexSearcher(t1_index, small_config)
    nonzero = 0
    for qid, text in corpus_queries(n=40):
        got = s.search(text, 10)
        want = t1_oracle.search(text, 10)
        assert got == want, (qid, text)  # exact doc ids AND exact float scores
        nonzero += bool(got)
    assert nonzero >= 30  # the query set must actually hit the corpus


def test_bmw_equals_exhaustive(t1_index, t1_oracle, small_config):
    s = IndexSearcher(t1_index, small_config)
    for qid, text in corpus_queries(n=40):
        assert s.search(text, 10, method="bmw") == s.search(text, 10)


def test_impact_equals_exhaustive(t1_index, small_config):
    """Impact-ordered early termination is EXACT: same docs, same floats."""
    s = IndexSearcher(t1_index, small_config)
    for qid, text in corpus_queries(n=40):
        assert s.search(text, 10, method="impact") == s.search(text, 10)
        assert s.search(text, 3, method="impact") == s.search(text, 3)


def test_unknown_terms_empty(t1_index, small_config):
    s = IndexSearcher(t1_index, small_config)
    assert s.search("zzzznotindexedanywhere") == []
    assert s.search("") == []
    assert s.search("def return if") == []  # pure-stopword query


def test_k_limits(t1_index, small_config):
    s = IndexSearcher(t1_index, small_config)
    r1 = s.search("parse", 1)
    r250 = s.search("parse", 250)
    assert len(r1) == 1
    assert len(r250) <= 250
    assert r1[0] == r250[0]
    scores = [sc for _, sc in r250]
    assert scores == sorted(scores, reverse=True)


def test_actor_pool_stage(ray_session, t1_index, t1_oracle, small_config):
    """search_queries = the stateful actor-pool map_batches path."""
    qs = corpus_queries(n=12)
    out = search_queries(t1_index, qs, k=5, config=small_config,
                         concurrency=2).to_pandas()
    for qid, text in qs:
        want = t1_oracle.search(text, 5)
        sub = out[out.query_id == qid].sort_values("rank")
        assert list(sub.doc_id) == [d for d, _ in want]
        assert np.allclose(list(sub.score), [s for _, s in want], rtol=0, atol=0)


def test_fetch_docs_and_snippets(ray_session, t1_index, small_config):
    """Result hydration: fetch_docs returns exactly the stored content
    (direct-partition path), and snippets contain a query term."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from searchengine_ray.pipelines.query import IndexSearcher

    s = IndexSearcher(t1_index, small_config)
    hits = s.search("parse buffer", k=5)
    assert hits
    ids = [d for d, _ in hits]
    got = s.fetch_docs(ids)
    assert set(got) == set(ids)
    # parity with the docs/ parquet itself
    docs_dir = Path(t1_index.docs if hasattr(t1_index, "docs")
                    else str(t1_index) + "/docs")
    tbl = pq.read_table(sorted(docs_dir.glob("part-*.parquet")),
                        columns=["doc_id", "content"])
    want = dict(zip(tbl.column("doc_id").to_pylist(),
                    tbl.column("content").to_pylist()))
    for i in ids:
        assert got[i] == want[i]

    snips = s.search_with_snippets("parse buffer", k=5)
    assert [(d, sc) for d, sc, _ in snips] == hits
    for _, _, snip in snips:
        low = snip.lower()
        assert "parse" in low or "buffer" in low
        assert 0 < len(snip) <= 400


def test_recency_tie_break(ray_session, tmp_path):
    """Opt-in (score desc, ts desc, doc_id asc) ordering from a data
    column: engine == oracle for every method, and among exact-score
    ties the NEWER doc wins (the default would rank lower doc_id
    first). Deterministic replacement for reference ranker.py:30-32."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.config import IndexConfig
    from searchengine_ray.oracle import OracleIndex
    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.pipelines.query import IndexSearcher

    # 3 identical docs (guaranteed score ties) at ts 10 < 30 < 20, plus
    # distinct filler docs so df/N are non-trivial
    texts = (["shared identical query text alpha"] * 3
             + [f"filler document body number {i} beta" for i in range(5)])
    ts = [10, 30, 20, 1, 2, 3, 4, 5]
    n = len(texts)
    tbl = pa.table({
        "repo": [f"r{i}" for i in range(n)],
        "path": [f"p{i}.py" for i in range(n)],
        "commit": ["c"] * n,
        "lang": ["py"] * n,
        "content": texts,
        "ts": pa.array(ts, pa.int64()),
    })
    src = tmp_path / "corpus"; src.mkdir()
    pq.write_table(tbl, src / "part-0.parquet")
    cfg = IndexConfig(num_doc_parts=2, num_term_parts=4,
                      tie_break_column="ts")
    paths = build_index(str(src), tmp_path / "idx", cfg)
    searcher = IndexSearcher(paths, cfg)
    oracle = OracleIndex(tbl, cfg)

    q = "shared identical alpha"
    want = oracle.search(q, k=5)
    by_doc_ts = {did: m["_tie"] for did, m in oracle.doc_meta.items()}
    for method in ("vectorized", "impact", "bmw"):
        got = searcher.search(q, k=5, method=method)
        assert got == want, method
    # the three tied docs must come back in ts-desc order (30, 20, 10)
    tied = [d for d, _ in want[:3]]
    assert [by_doc_ts[d] for d in tied] == [30, 20, 10]
    # sanity: the default ordering WOULD differ (doc_id asc != ts desc)
    default = IndexConfig(num_doc_parts=2, num_term_parts=4)
    paths2 = build_index(str(src), tmp_path / "idx2", default)
    got_default = IndexSearcher(paths2, default).search(q, k=3)
    assert [d for d, _ in got_default] == sorted(tied)


def test_recency_tie_break_timestamp_column(ray_session, tmp_path):
    """Timestamp-typed tie column: the build casts to epoch µs in Arrow
    and the oracle must convert integer-exactly (float .timestamp()
    would be tz-dependent and lose sub-µs bits) — ranks must agree for
    ties 1 µs apart."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.config import IndexConfig
    from searchengine_ray.oracle import OracleIndex
    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.pipelines.query import IndexSearcher

    base = dt.datetime(2025, 6, 1, 12, 0, 0)
    texts = ["tie breaker micro text"] * 3 + ["other doc entirely"]
    ts = [base, base + dt.timedelta(microseconds=2),
          base + dt.timedelta(microseconds=1), base]
    n = len(texts)
    tbl = pa.table({
        "repo": [f"r{i}" for i in range(n)],
        "path": [f"p{i}.py" for i in range(n)],
        "commit": ["c"] * n, "lang": ["py"] * n,
        "content": texts,
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    src = tmp_path / "corpus"; src.mkdir()
    pq.write_table(tbl, src / "part-0.parquet")
    cfg = IndexConfig(num_doc_parts=2, num_term_parts=4,
                      tie_break_column="ts")
    paths = build_index(str(src), tmp_path / "idx", cfg)
    got = IndexSearcher(paths, cfg).search("tie breaker", k=3)
    want = OracleIndex(tbl, cfg).search("tie breaker", k=3)
    assert got == want
    meta = OracleIndex(tbl, cfg).doc_meta
    ranked_ties = [meta[d]["_tie"] for d, _ in want]
    assert ranked_ties == sorted(ranked_ties, reverse=True)
    assert ranked_ties[0] - ranked_ties[2] == 2     # µs-exact ordering


def test_doc_pos_direct_and_fallback():
    """_DocPos: arithmetic fast path for gapped-dense part_bits ids,
    verified-gather fallback for foreign/sparse layouts."""
    import numpy as np

    from searchengine_ray.pipelines.query import _DocPos

    bits = 10
    dl_ids = np.concatenate([
        (1 << bits) + np.arange(5), (3 << bits) + np.arange(7)]).astype(np.int64)
    meta = {"id_layout": "part_bits", "doc_id_part_bits": bits}
    dp = _DocPos(dl_ids, meta)
    assert dp.bits == bits
    probe = np.array([dl_ids[0], dl_ids[4], dl_ids[5], dl_ids[-1]])
    assert np.array_equal(dp(probe), np.searchsorted(dl_ids, probe))
    # sparse ranks (a hole) -> arithmetic mismatches -> fallback must win
    sparse = np.concatenate([[1 << bits], (1 << bits) + np.arange(2, 6)]).astype(np.int64)
    dp2 = _DocPos(sparse, meta)
    probe2 = sparse.copy()
    assert np.array_equal(dp2(probe2), np.searchsorted(sparse, probe2))
    # preassigned layout -> direct path disabled
    dp3 = _DocPos(dl_ids, {"id_layout": "preassigned"})
    assert dp3.bits == 0
    assert np.array_equal(dp3(probe), np.searchsorted(dl_ids, probe))


def test_query_service_pool_cache_parity(ray_session, t1_index, t1_oracle,
                                         small_config):
    """The pool-shared cold-decode path (one decode per pool, plasma
    refs through the _SharedDecodeCache registry) returns EXACTLY the
    single-searcher results — same docs, same float scores — and the
    registry actually gets populated (min_df=1 forces every cold term
    through it)."""
    import ray

    from searchengine_ray.pipelines.query import QueryService

    svc = QueryService(t1_index, small_config, num_actors=3, k=10,
                       method="impact", pool_cache_min_df=1)
    try:
        qs = corpus_queries(n=25)
        svc.warmup(qs)
        out = svc.search_batch(qs)
        stats = ray.get(svc._pool_cache.stats.remote())
        assert stats["terms"] > 0 and stats["postings"] > 0
        for qid, text in qs:
            want = t1_oracle.search(text, 10)
            sub = out[out.query_id == qid].sort_values("rank")
            assert list(sub.doc_id) == [d for d, _ in want]
            assert np.allclose(sub.score.to_numpy(),
                               [s for _, s in want], rtol=0, atol=0)
    finally:
        svc.shutdown()


def test_query_service_pool_cache_eviction():
    """LRU eviction keeps the registry's postings budget; first
    publisher wins on double put."""
    from searchengine_ray.pipelines.query import _SharedDecodeCache

    c = _SharedDecodeCache(postings_budget=100)
    assert c.put(1, ["r1"], 60)
    assert c.put(2, ["r2"], 60)          # over budget: evicts h=1
    assert c.get(1) is None
    assert c.get(2) == ["r2"]
    assert not c.put(2, ["r2b"], 60)     # first publisher wins
    assert c.put(3, ["r3"], 60)          # evicts h=2 (LRU)
    assert c.get(2) is None
    assert c.get(3) == ["r3"]
    assert c.stats()["postings"] <= 120


def test_write_behind_hot_cache(ray_session, tmp_path):
    """First serve of a fresh index computes the hot image and persists
    it OFF the critical path (write-behind tasks): drain_persist()
    reports >0 parts written and the hot_cache dir is populated; a
    second serve of the same index is a full cache hit (0 pending
    writes) and answers identically."""
    from searchengine_ray import IndexConfig
    from searchengine_ray.corpus import corpus_queries, generate_corpus
    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.pipelines.query import QueryService

    corpus = generate_corpus(400, tmp_path / "corpus", seed=11)
    cfg = IndexConfig(num_doc_parts=2, num_term_parts=4)
    paths = build_index(corpus, tmp_path / "index", cfg)

    qs = corpus_queries(n=8)
    svc = QueryService(paths, cfg, num_actors=2, k=5, method="impact")
    try:
        svc.warmup(qs)
        out1 = svc.search_batch(qs)
        written = svc.drain_persist()
        assert written > 0                     # fresh index: cache miss
    finally:
        svc.shutdown()
    cache_files = sorted((tmp_path / "index" / "hot_cache").glob("*.arrow"))
    assert len(cache_files) == written

    svc = QueryService(paths, cfg, num_actors=2, k=5, method="impact")
    try:
        svc.warmup(qs)
        out2 = svc.search_batch(qs)
        assert svc.drain_persist() == 0        # re-serve: full cache hit
    finally:
        svc.shutdown()
    import pandas as pd
    pd.testing.assert_frame_equal(out1.reset_index(drop=True),
                                  out2.reset_index(drop=True))
