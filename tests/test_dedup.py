"""Near-dup family: exact-Jaccard verification correctness, pair
dedup/caps, and bucketed-vs-exact embedding recall."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def test_grouped_pairs_cap_star():
    from searchengine_ray.pipelines.dedup import _BUCKET_CAP, _make_grouped_pairs

    fn = _make_grouped_pairs(["band", "band_hash"], _BUCKET_CAP, hot="star")
    small = pd.DataFrame({"band": [0] * 4, "band_hash": [7] * 4,
                          "doc_id": [3, 1, 2, 1]})
    got = fn(small).to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == [(1, 2), (1, 3), (2, 3)]
    big = pd.DataFrame({"band": 0, "band_hash": 7,
                        "doc_id": np.arange(_BUCKET_CAP + 10)})
    got = fn(big).to_pandas()
    # star pairs: bounded m-1 rows, all anchored at the min id
    assert len(got) == _BUCKET_CAP + 9
    assert (got["doc_a"] == 0).all()
    # hot="drop": an over-cap key emits nothing
    fn_drop = _make_grouped_pairs(["shingle"], 3, hot="drop")
    df = pd.DataFrame({"shingle": ["x"] * 5 + ["y"] * 2,
                       "doc_id": [1, 2, 3, 4, 5, 8, 9]})
    got = fn_drop(df).to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == [(8, 9)]


def test_grouped_pairs_matches_bruteforce():
    """Vectorized self-merge pair emission == per-key brute force on a
    random multi-key frame (the two keys deliberately collide across
    values so the multi-key merge is exercised)."""
    from itertools import combinations

    from searchengine_ray.pipelines.dedup import _make_grouped_pairs

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"band": rng.integers(0, 3, 400),
                       "band_hash": rng.integers(0, 5, 400),
                       "doc_id": rng.integers(0, 60, 400)})
    cap = 8
    fn = _make_grouped_pairs(["band", "band_hash"], cap, hot="star")
    got = sorted(map(tuple, fn(df).to_pandas().values.tolist()))
    want = []
    for _, g in df.drop_duplicates().groupby(["band", "band_hash"]):
        ids = sorted(g["doc_id"].unique().tolist())
        if len(ids) < 2:
            continue
        if len(ids) <= cap:
            want.extend(combinations(ids, 2))
        else:
            want.extend((ids[0], x) for x in ids[1:])
    assert got == sorted(want)


def test_minhash_jaccard_is_exact(ray_session):
    """Every verified pair's jaccard_bp must equal the brute-force
    token-shingle Jaccard recomputed from the raw texts."""
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.dedup import _shingles, minhash_lsh_dedup

    got = minhash_lsh_dedup(SF_DIR).to_pandas()
    assert len(got) > 0
    assert not got.duplicated(["doc_a", "doc_b"]).any()
    texts = dict(zip(*[
        pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"]).column(c).to_pylist()
        for c in ("doc_id", "text")]))
    for _, r in got.iterrows():
        sa = set(_shingles(texts[r.doc_a]).tolist())
        sb = set(_shingles(texts[r.doc_b]).tolist())
        want = int(np.floor(len(sa & sb) / (len(sa | sb) or 1) * 10000 + 0.5))
        assert int(r.jaccard_bp) == want
        assert r.jaccard_bp >= 5000


def test_simhash_pairs_unique(ray_session):
    from searchengine_ray.pipelines.dedup import simhash_near_dups

    got = simhash_near_dups(SF_DIR).to_pandas()
    assert len(got) > 0
    assert not got.duplicated(["doc_a", "doc_b"]).any()
    assert (got.doc_a < got.doc_b).all()


def test_embedding_lsh_subset_of_exact(ray_session):
    """Bucketed pairs must be a subset of the exact N^2 pair set with
    identical cosine values, at usable recall."""
    from searchengine_ray.pipelines.dedup import (embedding_near_dups,
                                                  embedding_near_dups_lsh)

    exact = embedding_near_dups(SF_DIR).to_pandas()
    approx = embedding_near_dups_lsh(SF_DIR).to_pandas()
    ex = {(a, b): c for a, b, c in
          exact[["vec_a", "vec_b", "cosine_bp"]].values.tolist()}
    for a, b, c in approx[["vec_a", "vec_b", "cosine_bp"]].values.tolist():
        assert (a, b) in ex and ex[(a, b)] == c
    if len(ex):
        assert len(approx) / len(ex) >= 0.5


def test_hash_to_min_group_step():
    """One vectorized Hash-to-Min step == the per-node definition:
    for each node u, m=min(C(u)); emit (v,m) and (m,v) for v in C(u)."""
    import pyarrow as pa

    from searchengine_ray.pipelines.dedup import _HashToMinGroup

    # two nodes in one gkey bucket: C(5)={5,9,2}, C(9)={9,5}
    g = pa.table({"u": [5, 5, 5, 9, 9], "v": [5, 9, 2, 9, 5]})
    got = sorted(map(tuple, _HashToMinGroup()(g).to_pandas().values.tolist()))
    want = set()
    for u, c in [(5, [5, 9, 2]), (9, [9, 5])]:
        m = min(c)
        for v in c:
            want.add((v, m))
            want.add((m, v))
    assert got == sorted(want)


def test_connected_components_chain(ray_session):
    """A long chain is the propagation worst case: Hash-to-Min must
    still converge to min-id labels in O(log n) rounds, and isolated
    pairs keep their own components."""
    import pyarrow as pa
    import ray.data

    from searchengine_ray.pipelines.dedup import connected_components

    # chain 0-1-2-...-19, plus separate pair (100,101)
    a = list(range(19)) + [100]
    b = list(range(1, 20)) + [101]
    pairs = ray.data.from_arrow(pa.table({"doc_a": a, "doc_b": b}))
    got = connected_components(pairs).to_pandas().sort_values("doc_id")
    assert got.doc_id.tolist() == list(range(20)) + [100, 101]
    assert got.component.tolist() == [0] * 20 + [100, 100]
    assert got.keep.tolist() == [1] + [0] * 19 + [1, 0]


def test_dedup_survivors_consistency(ray_session):
    """Survivor table must be consistent with the verified pair stream:
    every pair's two docs share a component; every component's rep is
    its min doc_id and the only keep=1 row."""
    from searchengine_ray.pipelines.dedup import dedup_survivors, minhash_lsh_dedup

    pairs = minhash_lsh_dedup(SF_DIR).to_pandas()
    surv = dedup_survivors(SF_DIR).to_pandas()
    comp = dict(zip(surv.doc_id, surv.component))
    for _, r in pairs.iterrows():
        assert comp[r.doc_a] == comp[r.doc_b]
    g = surv.groupby("component")
    assert (g.doc_id.min() == g.doc_id.min().index).all()
    assert (surv.keep == (surv.doc_id == surv.component).astype(int)).all()


def test_dedup_spans_exact_vs_bruteforce(ray_session):
    """Every reported span must be a REAL shared substring of that exact
    length, and the longest true shared span (>= k) of a seeded pair
    must be found exactly."""
    import duckdb

    from searchengine_ray.pipelines.dedup import _SPAN_K, dedup_spans

    sf = "/root/testdata/sf0.001"
    out = dedup_spans(sf).to_pandas()
    assert len(out) and (out.span_len >= _SPAN_K).all()
    con = duckdb.connect()
    texts = dict(con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')")
        .fetchall())

    def true_longest(a, b):
        ta, tb = texts[a], texts[b]
        best = 0
        # O(n^2) DP is fine at ~300 chars
        prev = [0] * (len(tb) + 1)
        for i in range(1, len(ta) + 1):
            cur = [0] * (len(tb) + 1)
            for j in range(1, len(tb) + 1):
                if ta[i - 1] == tb[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    top = out.sort_values("span_len", ascending=False).head(3)
    for r in top.itertuples():
        assert true_longest(int(r.doc_a), int(r.doc_b)) == int(r.span_len)


def test_dedup_spans_anchor_mod_lower_bound(ray_session):
    """The 100-TB anchor-sampled path must report a SUBSET of the exact
    pairs with span estimates that never exceed the exact span."""
    from searchengine_ray.pipelines.dedup import dedup_spans

    sf = "/root/testdata/sf0.001"
    exact = dedup_spans(sf).to_pandas()
    approx = dedup_spans(sf, anchor_mod=4).to_pandas()
    m = approx.merge(exact, on=["doc_a", "doc_b"], how="left",
                     suffixes=("_s", "_e"))
    assert not m.span_len_e.isna().any()          # subset of exact pairs
    assert (m.span_len_s <= m.span_len_e).all()   # lower-bound estimates


def test_decontaminate_matches_oracle(ray_session):
    """Cross-corpus contamination pairs: the Ray LSH pipeline must equal
    the full DuckDB replay exactly, every pair must be cross-side
    (train % 5 != 0, eval % 5 == 0), and each jaccard_bp must equal the
    brute-force shingle Jaccard."""
    import duckdb
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.dedup import (_shingles, decontaminate,
                                                  decontaminate_sql)

    got = decontaminate(SF_DIR).to_pandas()
    got = got.sort_values(["train_doc", "eval_doc"]).reset_index(drop=True)
    assert len(got) > 0
    assert (got.train_doc % 5 != 0).all()
    assert (got.eval_doc % 5 == 0).all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    want = con.execute(decontaminate_sql()).df()
    want = want.sort_values(["train_doc", "eval_doc"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))

    texts = dict(zip(*[
        pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"]).column(c).to_pylist()
        for c in ("doc_id", "text")]))
    for _, r in got.iterrows():
        sa = set(_shingles(texts[r.train_doc]).tolist())
        sb = set(_shingles(texts[r.eval_doc]).tolist())
        want_bp = int(np.floor(len(sa & sb) / (len(sa | sb) or 1) * 10000 + 0.5))
        assert int(r.jaccard_bp) == want_bp >= 5000


def test_cross_pairs_hot_bucket_policy():
    """Eval-star policy: a bucket above cap pairs every eval member with
    the bucket's min TRAIN member only; small buckets emit the full
    cross product; single-side buckets emit nothing."""
    from searchengine_ray.pipelines.dedup import _make_cross_pairs

    fn = _make_cross_pairs(["k"], cap=3)
    # small bucket: train {1,2}, eval {5,10} -> full cross product
    small = pd.DataFrame({"k": ["a"] * 3, "doc_id": [1, 2, 5]})
    out = fn(small).to_pandas()
    assert sorted(zip(out.doc_a, out.doc_b)) == [(1, 5), (2, 5)]
    # hot bucket (6 > cap): evals {5, 10} pair with min train 2 only
    hot = pd.DataFrame({"k": ["b"] * 6, "doc_id": [2, 3, 4, 5, 10, 6]})
    out = fn(hot).to_pandas()
    assert sorted(zip(out.doc_a, out.doc_b)) == [(2, 5), (2, 10)]
    # all-train bucket -> nothing
    out = fn(pd.DataFrame({"k": ["c"] * 2, "doc_id": [1, 2]})).to_pandas()
    assert len(out) == 0


def test_decontaminate_apply_matches_oracle(ray_session):
    """Clean-train-set anti-join: equals the SQL replay, contains only
    train-side docs, and drops exactly the contaminated train docs."""
    import duckdb

    from searchengine_ray.pipelines.dedup import (decontaminate,
                                                  decontaminate_apply,
                                                  decontaminate_apply_sql)

    got = decontaminate_apply(SF_DIR).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert len(got) > 0
    assert (got.doc_id % 5 != 0).all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    want = con.execute(decontaminate_apply_sql()).df()
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))

    contaminated = set(decontaminate(SF_DIR).to_pandas().train_doc)
    assert contaminated and not (set(got.doc_id) & contaminated)


def test_pair_pagerank_matches_naive(ray_session):
    """Distributed integer PageRank == a naive per-node Python replay
    over the same SimHash pair graph (exact int equality, every node)."""
    from searchengine_ray.pipelines.dedup import (_PR_DDEN, _PR_DNUM,
                                                  _PR_ROUNDS, _PR_SCALE,
                                                  _PR_TELEPORT,
                                                  pair_pagerank,
                                                  simhash_near_dups)

    pairs = simhash_near_dups(SF_DIR).to_pandas()
    nbrs: dict[int, list[int]] = {}
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        nbrs.setdefault(int(a), []).append(int(b))
        nbrs.setdefault(int(b), []).append(int(a))
    r = {v: _PR_SCALE for v in nbrs}
    for _ in range(_PR_ROUNDS):
        nxt = {v: _PR_TELEPORT for v in nbrs}
        for u, vs in nbrs.items():
            c = (_PR_DNUM * r[u]) // (_PR_DDEN * len(vs))
            for v in vs:
                nxt[v] += c
        r = nxt
    got = pair_pagerank(SF_DIR).to_pandas()
    assert len(got) == len(r)
    for doc, rank in zip(got["doc_id"], got["rank_ppm"]):
        assert int(rank) == r[int(doc)], int(doc)


def test_pagerank_group_body_segments():
    """Group body handles multi-node buckets: per-source degree split,
    rank lookup, and in-group target pre-aggregation."""
    import pyarrow as pa

    from searchengine_ray.pipelines.dedup import (_PR_DDEN, _PR_DNUM,
                                                  _PageRankContribGroup)

    # nodes 1 (deg 2 -> 10, 20) and 2 (deg 1 -> 10); ranks 1000, 500
    g = pa.table({
        "u": pa.array([1, 1, 2, 1, 2], pa.int64()),
        "v": pa.array([10, 20, 10, -1, -1], pa.int64()),
        "r": pa.array([-1, -1, -1, 1000, 500], pa.int64()),
        "gkey": pa.array([0] * 5, pa.int64())})
    out = _PageRankContribGroup()(g).to_pandas().set_index("v")["c"]
    c1 = (_PR_DNUM * 1000) // (_PR_DDEN * 2)
    c2 = (_PR_DNUM * 500) // (_PR_DDEN * 1)
    assert out[10] == c1 + c2 and out[20] == c1


def test_pair_triangles_crafted_graph(ray_session, monkeypatch):
    """Distributed degree-oriented wedge counting vs brute force on an
    adversarial graph: a hub star (wedge blow-up if oriented by id), a
    4-clique, two triangles sharing an edge, degree ties, and isolated
    edges (degree rows with zero triangles)."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray

    from searchengine_ray.pipelines import dedup

    edges = set()
    edges |= {(0, h) for h in range(1, 9)}            # hub 0, leaves 1..8
    edges |= {(1, 2)}                                 # one hub triangle
    edges |= set(itertools.combinations([10, 11, 12, 13], 2))  # 4-clique
    edges |= {(20, 21), (21, 22), (20, 22), (21, 23), (20, 23)}  # shared edge
    edges |= {(30, 31)}                               # isolated edge
    tbl = pa.table({"doc_a": pa.array([a for a, b in sorted(edges)],
                                      pa.int64()),
                    "doc_b": pa.array([b for a, b in sorted(edges)],
                                      pa.int64())})
    monkeypatch.setattr(dedup, "simhash_near_dups",
                        lambda sf_dir: ray.data.from_arrow(tbl))
    got = dedup.pair_triangles("unused").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute force
    nodes = sorted({n for e in edges for n in e})
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            tri[x] += 1
            tri[y] += 1
            tri[z] += 1
    assert got.doc_id.tolist() == nodes
    assert got.degree.tolist() == [len(adj[n]) for n in nodes]
    assert got.triangles.tolist() == [tri[n] for n in nodes]
    d = np.array([len(adj[n]) for n in nodes], np.int64)
    t = np.array([tri[n] for n in nodes], np.int64)
    want_lcc = np.where(d >= 2, (20000 * t) // np.maximum(d * (d - 1), 1), 0)
    assert got.lcc_bp.tolist() == want_lcc.tolist()


def test_ngram_contamination_vs_dedup_spans(ray_session):
    """The cross-side contamination rollup must be derivable from
    `dedup_spans` exactly: filter its pairs to train x eval, orient by
    side, group by train doc — counts, max span and matched positions
    all agree (same anchors, same boilerplate cutoff, same islands)."""
    from searchengine_ray.pipelines.dedup import (_EVAL_MOD,
                                                  dedup_spans,
                                                  ngram_contamination)

    sf = "/root/testdata/sf0.001"
    got = ngram_contamination(sf).to_pandas()
    assert len(got) and (got.doc_id % _EVAL_MOD != 0).all()

    sp = dedup_spans(sf).to_pandas()
    ea = sp.doc_a % _EVAL_MOD == 0
    eb = sp.doc_b % _EVAL_MOD == 0
    cross = sp[ea != eb].copy()
    cross["train"] = cross.doc_a.where(~ea, cross.doc_b)
    want = cross.groupby("train").agg(
        n_eval_docs=("train", "size"), max_span=("span_len", "max"),
        n_pos=("n_pos", "sum")).reset_index()
    m = got.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("train").reset_index(drop=True)
    assert m.doc_id.tolist() == w.train.tolist()
    assert m.n_eval_docs.tolist() == w.n_eval_docs.tolist()
    assert m.max_span.tolist() == w.max_span.tolist()
    assert m.n_pos.tolist() == w.n_pos.tolist()


def test_ngram_contamination_anchor_mod_lower_bound(ray_session):
    """The sampled contamination path reports a SUBSET of contaminated
    train docs, with per-doc span/partner/position counts that never
    exceed the exact run's."""
    from searchengine_ray.pipelines.dedup import ngram_contamination

    sf = "/root/testdata/sf0.001"
    exact = ngram_contamination(sf).to_pandas().set_index("doc_id")
    approx = ngram_contamination(sf, anchor_mod=4).to_pandas()
    assert len(approx)
    for r in approx.itertuples():
        e = exact.loc[int(r.doc_id)]
        assert r.max_span <= e.max_span
        assert r.n_eval_docs <= e.n_eval_docs
        assert r.n_pos <= e.n_pos
