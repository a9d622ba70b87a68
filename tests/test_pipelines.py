"""Driver-gate mirror: queries() vs oracle_sql() via DuckDB at sf0.001,
plus recall checks for the approximate ops."""

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SQL_CHECKED = ["term_df", "doc_token_stats", "token_count_by_lang",
               "text_quality", "repetition_quality", "dedup_exact",
               "embedding_near_dups",
               "ann_topk", "ann_lsh_topk", "ann_graph_topk", "embedding_near_dups_lsh",
               "multimodal_meta", "frame_sample",
               "image_decode_features", "distinct_terms_hll_registers",
               "pricing_summary", "top_orders_by_revenue", "events_daily",
               "top_parts", "suppliers_by_nation", "segment_counts",
               "bm25_topk", "bm25_topk_wand", "index_dictionary",
               "phrase_search", "proximity_search", "lang_id", "doc_fingerprint",
               "numeric_literals", "token_count_bpe", "ngram_jaccard_dedup",
               "minhash_lsh_dedup", "simhash_near_dups", "dedup_survivors",
               "dedup_apply", "clean_text", "pii_scrub",
               "dataset_mixture", "pack_sequences", "shard_shuffle",
               "unigram_logprob", "quality_filter", "event_props_stats", "label_centroids",
               "kmeans_embeddings", "semdedup", "semdedup_prune",
               "top_bigrams", "bpe_pair_counts", "curation_pipeline",
               "sessionize_events", "event_asof_join", "event_range_join",
               "event_value_quantiles", "value_quantiles_histogram",
               "order_lineitem_join",
               "hopping_window_counts", "customers_without_orders",
               "top_terms_per_lang", "dataset_split", "sample_per_group",
               "tfidf_keywords", "dedup_spans", "top_terms_sketch_violations",
               "term_counts_cms", "term_counts_cms_cells",
               "term_counts_cms_violations", "boolean_search",
               "prefix_search", "events_rollup", "pair_pagerank",
               "bpe_train", "bpe_apply", "bigram_pmi", "pair_triangles",
               "more_like_this", "window_user_hll", "window_user_hll_violations",
               "char_entropy", "dsir_weights", "dsir_select", "prf_search",
               "source_divergence", "event_funnel", "user_retention",
               "event_rate_anomaly", "doclen_quantiles_by_lang",
               "nb_lang_confusion", "ann_recall_audit",
               "dedup_component_sizes", "dedup_method_overlap",
               "span_dup_fraction", "media_dedup_exact", "percolate",
               "index_fsck", "term_bloom_bits", "term_bloom_check",
               "event_transitions", "mmr_rerank", "zipf_slope",
               "rfm_segments", "label_cohesion", "facet_search",
               "nation_volume", "winnow_fingerprints", "winnow_dup_pairs", "regex_search", "event_pivot",
               "user_running_total", "index_merge_dictionary", "event_trend",
               "hybrid_search", "suggest_terms", "fuzzy_search",
               "collapse_search", "search_eval_ndcg", "term_burstiness",
               "regex_extract", "dedup_spans_sampled", "search_eval_map",
               "ann_sq8_topk", "doc_outlier_score", "ngram_contamination",
               "ngram_contamination_apply", "event_topk_paths",
               "search_explain", "index_postings_export",
               "ann_filtered_topk", "quality_percentile_by_lang",
               "boilerplate_lines", "events_daily_users", "suffix_search",
               "term_regex_search", "phrase_prefix_search",
               "release_pipeline", "chunk_documents", "cooccur_window",
               "knn_graph", "lm_dirichlet_topk", "synonym_search",
               "ann_bq_topk", "search_snippets", "msm_search",
               "span_first_search", "federated_search",
               "dedup_incremental", "minhash_incremental", "table_profile",
               "index_delete_dictionary", "tfidf_cosine_topk",
               "value_quantiles_sketch", "value_quantiles_sketch_cells",
               "value_quantiles_sketch_violations", "rescore_search",
               "user_kmv_registers", "user_overlap_kmv",
               "bloom_semi_join", "bloom_semi_join_stats",
               "range_partition_plan", "weighted_sample",
               "weighted_sample_est", "trigram_df",
               "trigram_substring_search", "trigram_prune_stats",
               "trigram_regex_search", "champion_lists",
               "trigram_incremental", "kneser_ney_counts", "global_rank",
               "filtered_search", "user_decay_score",
               "trigram_snapshot_search"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, duck, name):
    import __ray_entry__ as e

    got = _canon(_to_pandas(e.queries()[name](SF_DIR)))
    want = _canon(duck.sql(e.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    # dtype KINDS must agree: a stringifying value-hash compare (the
    # driver's) sees int 0 vs float 0.0 as a mismatch — the DuckDB
    # HUGEINT->float64 fetchdf trap (uncast SUM over BIGINT) lands here
    for c in got.columns:
        assert got[c].dtype.kind == want[c].dtype.kind, \
            f"{name}.{c}: {got[c].dtype} vs oracle {want[c].dtype}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pack_group_boundary_semantics():
    """Direct-callable unit test of the pack-then-chunk math: exact
    seq_len fit, straddling docs, and zero-token docs (which occupy a
    sequence slot index but no tokens)."""
    import pyarrow as pa

    from searchengine_ray.pipelines.textstats import _make_pack_group

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "part": [0] * 5,
        # seq_len=10: offsets 0,10,25,25,32
        "n_tokens": [10, 15, 0, 7, 4],
    })
    out = _make_pack_group(10)(df).to_pandas()
    assert out.tok_offset.tolist() == [0, 10, 25, 25, 32]
    assert out.seq_start.tolist() == [0, 1, 2, 2, 3]
    # doc1 fills seq 0 exactly; doc2 straddles seqs 1-2; doc3 is empty
    # (start == end at its offset's seq); doc5 straddles 3 into 3 (32+4-1=35)
    assert out.seq_end.tolist() == [0, 2, 2, 3, 3]


def test_shard_shuffle_balance(ray_session):
    """Shards are near-even and positions are dense 1..n per shard."""
    from searchengine_ray.pipelines.textstats import shard_shuffle

    df = shard_shuffle(SF_DIR, nshards=8).to_pandas()
    sizes = df.groupby("shard").size()
    assert len(sizes) == 8
    # binomial noise at n=500 is real; just reject gross imbalance
    assert sizes.max() < 2 * sizes.mean() and sizes.min() > 0.5 * sizes.mean()
    for _, g in df.groupby("shard"):
        assert sorted(g.pos.tolist()) == list(range(1, len(g) + 1))


def test_pii_scrub_stage_edge_cases():
    """Direct-callable unit test: multiple PII per doc, adjacent
    matches, order independence of counts, and digit-bearing text that
    must NOT match (no false positives on bare numbers)."""
    import pyarrow as pa

    from searchengine_ray.pipelines.textstats import PiiScrubStage

    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a@b.com c.d-e@sub.domain.org tail",          # two emails
            "+1 212-555-0147 then 10.0.0.1 and +1 999-888-7777",
            "no pii here, just 12345 and 1.5 and v2.0.1",  # no match
            "x@y.io 8.8.8.8",
        ]})
    out = PiiScrubStage()(t).to_pandas()
    assert out.text_redacted.tolist() == [
        "<EMAIL> <EMAIL> tail",
        "<PHONE> then <IP> and <PHONE>",
        "no pii here, just 12345 and 1.5 and v2.0.1",
        "<EMAIL> <IP>",
    ]
    assert out.n_emails.tolist() == [2, 0, 0, 1]
    assert out.n_phones.tolist() == [0, 2, 0, 0]
    assert out.n_ipv4.tolist() == [0, 1, 0, 1]


def test_rows_only_entries_run(ray_session):
    import __ray_entry__ as e

    for name in ["distinct_terms_hll"]:
        res = _to_pandas(e.queries()[name](SF_DIR))
        assert res is not None and len(res) >= 0


def test_ann_ivf_matches_oracle(ray_session, duck):
    """IVF's oracle SQL embeds DATA-DEPENDENT centroids (retrained
    locally per sf_dir), so the registry default targets the driver's
    sf0.01; here the SQL is regenerated for this test's sf_dir."""
    from searchengine_ray.pipelines import ann

    got = _canon(_to_pandas(ann.ann_ivf_topk(SF_DIR)))
    want = _canon(duck.sql(ann.ann_ivf_topk_sql(SF_DIR)).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _mean_recall(exact: pd.DataFrame, approx: pd.DataFrame) -> float:
    recalls = []
    for qid in exact.query_vec_id.unique():
        ex = set(exact[exact.query_vec_id == qid].vec_id)
        ap = set(approx[approx.query_vec_id == qid].vec_id)
        recalls.append(len(ex & ap) / len(ex))
    return sum(recalls) / len(recalls)


def test_ann_ivf_incr_is_append_only_and_serves_incoming(ray_session, duck):
    """Incremental IVF lifecycle: the add phase appends new parquet
    files into the list partitions WITHOUT touching any base file (the
    marker records the base file set), incoming vectors
    (vec_id % IVF_INCR_MOD == 0) appear in results, and the whole index
    hash-matches the frozen-quantizer one-shot oracle regenerated for
    this sf_dir."""
    import json
    from pathlib import Path

    from searchengine_ray.pipelines import ann

    got = _to_pandas(ann.ann_ivf_incr_topk(SF_DIR))
    want = _canon(duck.sql(ann.ann_ivf_incr_topk_sql(SF_DIR)).df())
    pd.testing.assert_frame_equal(_canon(got), want, check_dtype=False)
    # at least one incoming vector serves (queries include id%5==0 vecs)
    assert (got.vec_id % ann.IVF_INCR_MOD == 0).any()
    root, _ = ann.ensure_ivf_incr_index(SF_DIR)
    meta = json.loads((Path(root) / "_DONE.json").read_text())
    all_files = {str(f.relative_to(root))
                 for f in Path(root).rglob("*.parquet")}
    base = set(meta["base_files"])
    assert base <= all_files            # every base file survived the add
    assert all_files - base             # and the add created new files


def test_ann_lsh_recall_vs_exact(ray_session):
    """LSH multiprobe should recover most of the exact top-10."""
    from searchengine_ray.pipelines.ann import ann_lsh_topk, ann_topk

    exact = _to_pandas(ann_topk(SF_DIR))
    approx = _to_pandas(ann_lsh_topk(SF_DIR))
    assert _mean_recall(exact, approx) >= 0.5  # multiprobe recall floor


def test_ann_ivf_recall_vs_exact(ray_session):
    """IVF nprobe-of-16 should recover most of the exact top-10, and a
    full probe (nprobe = n_centroids) must equal the exact result."""
    from searchengine_ray.pipelines.ann import ann_ivf_topk, ann_topk

    exact = _to_pandas(ann_topk(SF_DIR))
    approx = _to_pandas(ann_ivf_topk(SF_DIR))
    assert _mean_recall(exact, approx) >= 0.5
    full = _to_pandas(ann_ivf_topk(SF_DIR, nprobe=16))
    pd.testing.assert_frame_equal(
        full.sort_values(["query_vec_id", "rank"]).reset_index(drop=True),
        exact.sort_values(["query_vec_id", "rank"]).reset_index(drop=True),
        check_dtype=False)


def test_kmeans_assign_tie_break():
    """Exact-integer assignment; equidistant centroids resolve to the
    LOWEST cluster index (the oracle's ORDER BY d2, cluster)."""
    import numpy as np

    from searchengine_ray.pipelines.ann import _kmeans_assign

    cent = np.array([[0, 0], [4, 0], [0, 0]], np.int64)   # 0 and 2 identical
    x = np.array([[0, 1], [2, 0], [4, 1]], np.int64)      # [2,0] ties 0 vs 1
    assert _kmeans_assign(x, cent).tolist() == [0, 0, 1]


def test_kmeans_assign_hybrid_equals_exact():
    """The BLAS-fast hybrid assignment is bit-identical to the pure
    integer kernel on dense random micro-unit data, including planted
    exact ties and near-ties one micro-unit apart."""
    import numpy as np

    from searchengine_ray.pipelines.ann import (_kmeans_assign,
                                                _kmeans_assign_exact)

    rng = np.random.default_rng(11)
    micro = rng.integers(-2_000_000, 2_000_000, (5000, 64)).astype(np.int64)
    cent = rng.integers(-2_000_000, 2_000_000, (37, 64)).astype(np.int64)
    micro[17] = cent[5]                   # exact hit (distance 0 tie-free)
    micro[18] = cent[36]                  # exact hit on the last centroid
    cent[20] = cent[4]                    # duplicate centroid: every row ties
    micro[19] = cent[4]; micro[19][0] += 1   # one micro-unit off a tie pair
    assert np.array_equal(_kmeans_assign(micro, cent),
                          _kmeans_assign_exact(micro, cent))


def test_kmeans_inertia_improves(ray_session):
    """Lloyd's property: two iterations land strictly better centroids
    than the raw init (local exact-integer replay over the full test
    table), members sum to the corpus, and every row is int64."""
    import numpy as np

    from searchengine_ray.pipelines.ann import _kmeans_assign, kmeans_embeddings

    out = kmeans_embeddings(SF_DIR, k=8, iters=2).to_pandas()
    assert len(out) == 8 * 64
    assert all(out[c].dtype.kind == "i" for c in out.columns)
    assert out.drop_duplicates("cluster").n_members.sum() == 500

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    micro = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64)
                     * 1_000_000 + 0.5).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    init = micro[np.argsort(ids)][:8]
    final = out.sort_values(["cluster", "dim"]).centroid_micro \
        .to_numpy().reshape(8, 64)

    def inertia(cent):
        x2 = np.einsum("ij,ij->i", micro, micro)
        c2 = np.einsum("ij,ij->i", cent, cent)
        d2 = x2[:, None] - 2 * (micro @ cent.T) + c2[None, :]
        return int(d2.min(axis=1).sum())

    assert inertia(final) < inertia(init)
    # reported membership must equal a fresh exact assignment under the
    # PREVIOUS iteration's centroids (members are counted at the last
    # assignment, before the final centroid update) — recompute iter-1
    # centroids locally and compare
    a1 = _kmeans_assign(micro, init)
    c1 = init.copy()
    for c in range(8):
        m = a1 == c
        if m.any():
            c1[c] = np.floor(micro[m].sum(0) / m.sum() + 0.5).astype(np.int64)
    a2 = _kmeans_assign(micro, c1)
    want = np.bincount(a2, minlength=8)
    got = out.drop_duplicates("cluster").sort_values("cluster") \
        .n_members.to_numpy()
    assert np.array_equal(got, want)


def test_semdedup_subset_of_brute(ray_session):
    """Every SemDeDup pair is a true near-dup (subset of the brute
    N^2 pairs at the same threshold, identical scores), and the method
    finds a non-trivial share of them — within-cluster search trades
    recall for the bounded quadratic, it must not trade correctness."""
    from searchengine_ray.pipelines.dedup import embedding_near_dups, semdedup

    sem = _to_pandas(semdedup(SF_DIR, threshold_bp=4000))
    brute = _to_pandas(embedding_near_dups(SF_DIR, threshold_bp=4000))
    assert len(sem) > 0
    bmap = {(a, b): s for a, b, s in
            zip(brute.vec_a, brute.vec_b, brute.cosine_bp)}
    for a, b, s in zip(sem.vec_a, sem.vec_b, sem.cosine_bp):
        assert bmap.get((a, b)) == s, (a, b, s)
    assert len(sem) >= 0.2 * len(brute)   # loose recall floor


def test_semdedup_star_policy_parity(ray_session, duck):
    """k=1 collapses everything into one 500-member cluster, over the
    star_cap — the hot-cluster star policy (min-id vs rest, O(m)
    edges) must kick in on BOTH sides and stay hash-identical."""
    from searchengine_ray.pipelines.dedup import semdedup, semdedup_sql

    got = _canon(_to_pandas(semdedup(SF_DIR, k=1, threshold_bp=500)))
    want = _canon(duck.sql(semdedup_sql(k=1, threshold_bp=500)).df())
    assert len(got) == len(want)
    assert len(got) > 0 and len(got) < 499   # star edges, thresholded
    assert (got.vec_a == got.vec_a.min()).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bigram_kernel_vs_naive():
    """The factorize-based bigram counter equals a naive per-doc
    Counter, incl. empty docs, 1-token docs, and doc boundaries."""
    import collections
    import re

    import pyarrow as pa

    from searchengine_ray.pipelines.textstats import _BigramPartial

    texts = ["Hello world hello", "x", "", "aa bb aa bb", "one"]
    got = _BigramPartial()(pa.table({"doc_id": list(range(5)),
                                     "text": texts}))
    naive: collections.Counter = collections.Counter()
    for t in texts:
        toks = re.findall(r"[a-z0-9_]+", t.lower())
        naive.update(map(" ".join, zip(toks, toks[1:])))
    have = dict(zip(got.column("bigram").to_pylist(),
                    got.column("c_p").to_pylist()))
    assert have == dict(naive)


def test_bpe_pair_kernel_vs_naive():
    """The vectorized byte-buffer pair counter equals a naive per-word
    Python count, incl. 1-char words, empty docs, and word boundaries
    (no cross-word pairs)."""
    import collections
    import re

    import pyarrow as pa

    from searchengine_ray.pipelines.textstats import _BpePairPartial

    texts = ["Hello world_2 a", "x", "", "aa bb_cc aa", "a1a1 zz"]
    got = _BpePairPartial()(pa.table({"doc_id": list(range(5)),
                                      "text": texts}))
    naive: collections.Counter = collections.Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9_]+", t.lower()):
            for i in range(len(w) - 1):
                naive[w[i:i + 2]] += 1
    have = dict(zip(got.column("pair").to_pylist(),
                    got.column("c_p").to_pylist()))
    assert have == dict(naive)


def test_bpe_merge_island_parity_vs_naive():
    """``_BpeApplyMerge``'s vectorized island-parity selection equals a
    naive sequential left-to-right greedy scan — incl. the l == r runs
    (``a a a a a``) where overlap handling actually matters, multi-char
    merged symbols, and words the merge doesn't touch. The weighted
    pair counter agrees with a per-word recount on the merged state."""
    import pyarrow as pa

    from searchengine_ray.pipelines.textstats import (_BpeApplyMerge,
                                                      _BpePairCount)

    def naive_merge(toks, l, r):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    words = ["a a a a a", "a a a a", "b a a b", "a b a b", "x",
             "ab ab b", "b b b a b b"]
    cnts = [3, 1, 2, 5, 7, 1, 2]
    cases = [("a", "a"), ("a", "b"), ("b", "b"), ("ab", "ab"), ("z", "z")]
    for l, r in cases:
        got = _BpeApplyMerge(l, r)(pa.table(
            {"syms": pa.array(words, pa.string()),
             "cnt": pa.array(cnts, pa.int64())}))
        want = [" ".join(naive_merge(w.split(" "), l, r)) for w in words]
        assert got.column("syms").to_pylist() == want, (l, r)
        # recount pairs on the merged state: kernel vs naive
        pc = _BpePairCount()(got)
        have = {(a, b): c for a, b, c in
                zip(pc.column("l").to_pylist(), pc.column("r").to_pylist(),
                    pc.column("c_p").to_pylist())}
        naive_counts: dict = {}
        for w, c in zip(want, cnts):
            ts = w.split(" ")
            for i in range(len(ts) - 1):
                k = (ts[i], ts[i + 1])
                naive_counts[k] = naive_counts.get(k, 0) + c
        assert have == naive_counts, (l, r)


def test_curation_pipeline_composes(ray_session):
    """The composed flow's survivors are exactly (quality keep) AND
    (mixture keep) MINUS (dedup drop-list), and per-part offsets are
    the dense doc_id-ordered cumsum — i.e. the one-scan composition
    changes nothing vs running the ops separately."""
    import numpy as np

    from searchengine_ray.pipelines.dedup import dedup_survivors
    from searchengine_ray.pipelines.textstats import (
        curation_pipeline, dataset_mixture, quality_filter)

    cur = _to_pandas(curation_pipeline(SF_DIR))
    q = _to_pandas(quality_filter(SF_DIR))
    mix = _to_pandas(dataset_mixture(SF_DIR))
    drops = _to_pandas(dedup_survivors(SF_DIR))
    want = (set(q[q.keep == 1].doc_id) & set(mix.doc_id)) \
        - set(drops[drops.keep == 0].doc_id)
    assert set(cur.doc_id) == want and len(want) > 0
    for _, g in cur.groupby("part"):
        g = g.sort_values("doc_id")
        n = g.n_tokens.to_numpy(np.int64)
        assert (g.tok_offset.to_numpy()
                == np.concatenate(([0], np.cumsum(n)[:-1]))).all()


def test_auto_n_bits():
    """LSH plane count scales with the corpus: test tables stay at the
    historical 4 (oracles unchanged); big tables get ~n/512 buckets."""
    import math
    from unittest.mock import patch

    from searchengine_ray.pipelines.dedup import _auto_n_bits

    assert _auto_n_bits(SF_DIR) == 4          # 500 rows -> minimum
    with patch("pyarrow.parquet.ParquetFile") as pf:
        for n, want in [(500_000, 10), (10**11, 24), (1, 4), (513, 1)]:
            pf.return_value.metadata.num_rows = n
            got = _auto_n_bits("/ignored")
            if n == 513:
                assert got == max(4, math.ceil(math.log2(513 / 512)))
            else:
                assert got == want


def test_histogram_quantiles_equal_exact(ray_session):
    """Monotone commutation, executable: the one-pass histogram
    quantiles must equal the exact sort-based op's output exactly
    (cents-rounding is non-decreasing, so the k-th order statistic of
    rounded values is the rounded k-th order statistic)."""
    from searchengine_ray.pipelines.events import (
        event_value_quantiles, value_quantiles_histogram)

    exact = _canon(_to_pandas(event_value_quantiles(SF_DIR)))
    hist = _canon(_to_pandas(value_quantiles_histogram(SF_DIR)))
    pd.testing.assert_frame_equal(hist, exact, check_dtype=False)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    r = e.entry()
    df = _to_pandas(r)
    assert len(df) > 0
    assert set(df.columns) == {"face", "query_id", "rank", "doc_id",
                               "score_bp", "n_matches"}
    # all four index layers answered
    assert set(df.face.unique()) == {"bm25", "phrase", "boolean",
                                     "filtered"}
    # each face's slice equals its registry row (the composition adds
    # nothing and loses nothing)
    bm25 = _canon(_to_pandas(e.queries()["bm25_topk"](
        "/root/testdata/sf0.001")))
    sub = _canon(df[df.face == "bm25"][
        ["query_id", "rank", "doc_id", "score_bp"]])
    assert bm25.equals(sub)


def test_repetition_quality_multiline():
    """The sf documents are single-line, so the oracle row for
    repetition_quality is trivially satisfied there; this exercises the
    dup-line/dup-char/top-line math on crafted multi-line docs, against
    both a hand computation and the DuckDB oracle."""
    import pyarrow as pa

    from searchengine_ray.pipelines.textstats import (_repetition_batch,
                                                      repetition_quality_sql)

    docs = [
        "a\na\na\nb",          # 4 lines, 2 distinct, top=3; chars all=4, distinct=2
        "x\ny\nz",             # no repetition
        "",                    # empty -> all zeros
        "\n\nonly",            # blank lines dropped -> 1 line
        "dup dup\ndup dup",    # 2 identical 7-char lines
    ]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    got = _repetition_batch(tbl).to_pandas().sort_values("doc_id")
    assert got.n_lines.tolist() == [4, 3, 0, 1, 2]
    assert got.dup_line_bp.tolist() == [5000, 0, 0, 0, 5000]
    assert got.dup_char_bp.tolist() == [5000, 0, 0, 0, 5000]
    assert got.top_line_bp.tolist() == [7500, 3333, 0, 10000, 10000]

    con = duckdb.connect()
    con.register("documents", tbl)
    want = _canon(con.sql(repetition_quality_sql()).df())
    pd.testing.assert_frame_equal(_canon(got), want, check_dtype=False)


def test_distinct_terms_hll_error_bound(ray_session):
    """HLL estimate within 5% of the exact distinct-term count
    (p=12 -> ~1.6% std error; 5% ≈ 3 sigma)."""
    from searchengine_ray.pipelines.textstats import distinct_terms_hll, term_df

    exact = _to_pandas(term_df(SF_DIR)).shape[0]
    est = distinct_terms_hll(SF_DIR).to_pandas().n_distinct_est.iloc[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_top_terms_sketch_bound(ray_session, duck):
    """Misra-Gries guarantee: est <= true <= est + err_bound for every
    returned term, and the true top-1 term is present."""
    from searchengine_ray.pipelines import textstats as ts

    got = ts.top_terms_sketch(SF_DIR).to_pandas()
    assert len(got) == 10
    exact = duck.sql("""
        WITH toks AS (SELECT unnest(regexp_split_to_array(lower(text),
                             '[^a-z0-9_]+')) AS term FROM documents)
        SELECT term, count(*) AS c FROM toks WHERE term <> ''
        GROUP BY term""").df().set_index("term")["c"]
    err = int(got["err_bound"].iloc[0])
    for _, r in got.iterrows():
        true = int(exact.get(r["term"], 0))
        assert r["est_tf"] <= true <= r["est_tf"] + err
    assert exact.idxmax() in set(got["term"])


def test_term_counts_cms_bound(ray_session, duck):
    """Count-Min guarantee: for EVERY vocabulary term, the point
    estimate over-counts but never under-counts (true_tf <= est_tf),
    and a term hashing alone in its min cell is exact."""
    import numpy as np

    from searchengine_ray.pipelines import textstats as ts

    cells = ts._merged_cms_cells(SF_DIR)
    exact = duck.sql("""
        WITH toks AS (SELECT unnest(regexp_split_to_array(lower(text),
                             '[^a-z0-9_]+')) AS term FROM documents)
        SELECT term, count(*) AS c FROM toks WHERE term <> ''
        GROUP BY term""").df()
    total = int(exact["c"].sum())
    assert int(cells.sum()) == total * ts._CMS_D  # sums are exact
    for t, c in zip(exact["term"], exact["c"]):
        est = min(int(cells[j][ts._cms_col(j, t)]) for j in range(ts._CMS_D))
        assert int(c) <= est, (t, int(c), est)
    # absent probe term estimates >= 0 and the violations row is empty
    assert len(ts.term_counts_cms_violations(SF_DIR)) == 0
    probes = ts.term_counts_cms(SF_DIR).to_pandas().set_index("term")["est_tf"]
    lookup = exact.set_index("term")["c"]
    for t, est in probes.items():
        assert int(lookup.get(t, 0)) <= int(est)


def test_unigram_logprob_hot_cold_invariance(ray_session):
    """The broadcast-hot inline path and the cold co-group path compute
    the same integer sums: forcing EVERY term hot (head_tf=1) and every
    term cold (head_tf=2**62) must give identical outputs — the bp-per-
    row-then-integer-sum contract makes the split purely a routing
    choice."""
    from searchengine_ray.pipelines.textstats import unigram_logprob

    key = ["doc_id"]
    all_hot = unigram_logprob(SF_DIR, head_tf=1).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    all_cold = unigram_logprob(SF_DIR, head_tf=2**62).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(all_hot, all_cold)
    assert (all_hot["logprob_bp"] < 0).all()


def test_quality_filter_mask_semantics():
    """Direct-callable bit checks: each reject reason sets its own bit;
    a clean doc keeps; multiple reasons OR together."""
    import pyarrow as pa

    from searchengine_ray.pipelines.textstats import (
        QF_DUP_LINES, QF_LOW_ALPHA, QF_LOW_WS, QF_TOO_SHORT,
        _quality_filter_batch)

    # avg word ~4.7 chars: alpha 0.824 (>0.81) AND ws 0.176 (>0.17),
    # the band the corpus itself sits in (alpha~0.818 / ws~0.182)
    good = "delta quake fox zebra epoch mango " * 5
    docs = {
        1: good,                                  # keep
        2: "tiny",                                # short + low ws
        3: "!!!! ???? %%%% " * 20,                # low alpha
        4: ("same line\n" * 10) + good,           # duplicate lines
    }
    out = _quality_filter_batch(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())})).to_pandas()
    m = dict(zip(out.doc_id, out.reject_mask))
    assert m[1] == 0 and out[out.doc_id == 1].keep.item() == 1
    assert m[2] & QF_TOO_SHORT and m[2] & QF_LOW_WS
    assert m[3] & QF_LOW_ALPHA
    assert m[4] & QF_DUP_LINES
    assert (out[out.doc_id != 1].keep == 0).all()


def test_event_props_partial_edges():
    """The regex extraction contract: negative k, whitespace variants,
    malformed JSON counts in n_events only."""
    import pyarrow as pa

    from searchengine_ray.pipelines.events import _props_extract_partial

    out = _props_extract_partial(pa.table({
        "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
        "props": pa.array(['{"k": 7}', '{ "k" :-3}', 'not json', '{"j": 1}'],
                          pa.string())})).to_pandas().set_index("event_type")
    assert out.loc["a", "n_events"] == 3 and out.loc["a", "n_with_k"] == 2
    assert out.loc["a", "sum_k"] == 4 and out.loc["a", "sum_k2"] == 58
    assert out.loc["b", "n_with_k"] == 0 and out.loc["b", "sum_k"] == 0


def test_label_centroid_partial_exactness():
    """Micro-unit quantization is per element BEFORE the sum, and the
    partial sums split across two batches equal the one-batch sums."""
    import pyarrow as pa

    from searchengine_ray.pipelines.ann import _centroid_partial

    def tbl(rows):
        return pa.table({
            "embedding": pa.array([r[0] for r in rows],
                                  pa.list_(pa.float32())),
            "label": pa.array([r[1] for r in rows], pa.int32())})

    rows = [([0.15, -0.25], 1), ([0.05, 0.449999], 1), ([1.0, 2.0], 2)]
    whole = _centroid_partial(tbl(rows)).to_pandas()
    parts = pd.concat([_centroid_partial(tbl(rows[:1])).to_pandas(),
                       _centroid_partial(tbl(rows[1:])).to_pandas()])
    merged = parts.groupby(["label", "dim"], as_index=False)[
        ["n_p", "sum_micro_p"]].sum()
    pd.testing.assert_frame_equal(
        whole.sort_values(["label", "dim"]).reset_index(drop=True),
        merged.sort_values(["label", "dim"]).reset_index(drop=True),
        check_dtype=False)
    one = whole.set_index(["label", "dim"])["sum_micro_p"]
    # float32(0.449999) rounds as its exact double value
    import numpy as np
    f = np.float32(0.449999)
    assert one[(1, 2)] == int(np.floor(-0.25 * 1e6 + 0.5)) + int(
        np.floor(float(f) * 1e6 + 0.5))


def test_bpe_apply_hot_path(ray_session, duck):
    """bpe_apply with head_cnt=2 pushes nearly the whole vocabulary
    through the broadcast hot path (the default at sf0.001 exercises
    the cold co-group); both must match the same oracle."""
    from searchengine_ray.pipelines.textstats import bpe_apply, bpe_apply_sql

    got = _canon(bpe_apply(SF_DIR, head_cnt=2).to_pandas())
    want = _canon(duck.sql(bpe_apply_sql()).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bigram_pmi_hot_path(ray_session, duck):
    """head_cnt=2 routes nearly every unigram lookup through the
    broadcast hot path (the default at sf0.001 exercises the cold
    co-group); both must match the same oracle."""
    from searchengine_ray.pipelines.textstats import bigram_pmi, bigram_pmi_sql

    got = _canon(bigram_pmi(SF_DIR, head_cnt=2).to_pandas())
    want = _canon(duck.sql(bigram_pmi_sql()).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_index_fsck_catches_corruption(ray_session, tmp_path):
    """fsck is empty on a healthy index and FLAGS a logically corrupted
    posting row (df bumped, block max lowered) — the checker checks."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.docsearch import (_fsck_batch,
                                                      ensure_doc_index,
                                                      index_fsck)

    assert index_fsck(SF_DIR).num_rows == 0

    src = ensure_doc_index(SF_DIR)
    broken = tmp_path / "postings"
    shutil.copytree(src.postings, broken)
    f = sorted(broken.glob("*.parquet"))[0]
    t = pq.read_table(str(f))
    df = t.column("df").to_pylist()
    df[0] += 1                                  # df no longer matches
    mx = t.column("max_tfs").to_pylist()
    mx[1] = [v + 1 for v in mx[1]]              # block maxima lie
    t = t.set_column(t.schema.get_field_index("df"), "df",
                     pa.array(df, pa.int64()))
    t = t.set_column(t.schema.get_field_index("max_tfs"), "max_tfs",
                     pa.array(mx, t.schema.field("max_tfs").type))
    pq.write_table(t, str(f))

    import ray.data

    pfiles = sorted(str(x) for x in broken.glob("*.parquet"))
    viol = ray.data.read_parquet(
        pfiles,
        columns=["term", "df", "counts", "last_docs", "max_tfs",
                 "doc_sizes", "tf_sizes", "doc_bytes", "tf_bytes"]) \
        .map_batches(_fsck_batch, batch_format="pyarrow").to_pandas()
    kinds = set(viol["kind"])
    assert "df_mismatch" in kinds
    assert "blockmax_mismatch" in kinds


def test_winnow_selection_vs_naive():
    """Vectorized winnowing == brute-force reference (same Horner hash,
    rightmost-min windows, distinct positions); plus the MOSS guarantee:
    docs sharing a substring of length >= k + w - 1 share a fingerprint."""
    from searchengine_ray.pipelines.dedup import _SPAN_B, _SPAN_M
    from searchengine_ray.pipelines.textstats import (_WIN_K, _WIN_W,
                                                      _winnow_select)

    def naive(text: str, k: int, w: int) -> list[int]:
        cps = [ord(c) for c in text]
        m = len(cps) - k + 1
        hs = []
        for p in range(max(m, 0)):
            h = 0
            for j in range(k):
                h = (h * _SPAN_B + cps[p + j]) % _SPAN_M
            hs.append(h)
        sel = set()
        for s in range(len(hs) - w + 1):
            win = hs[s:s + w]
            mn = min(win)
            right = max(i for i, v in enumerate(win) if v == mn)
            sel.add(s + right)
        return sorted(hs[p] for p in sel)

    import random

    rng = random.Random(13)
    texts = ["".join(rng.choice("abcd") for _ in range(n))
             for n in (12, 40, 200)]
    d, h = _winnow_select(texts, _WIN_K, _WIN_W)
    for i, t in enumerate(texts):
        got = sorted(int(x) for x in h[d == i])
        assert got == naive(t, _WIN_K, _WIN_W), f"doc {i}"

    shared = "the quick brown fox"            # len 19 >= k + w - 1 = 11
    a = "aaaaaaaaaaaa" + shared + "zzzzzzzz"
    b = "qqqqqqqq" + shared + "pppppppppppp"
    d2, h2 = _winnow_select([a, b], _WIN_K, _WIN_W)
    fa = {int(x) for x in h2[d2 == 0]}
    fb = {int(x) for x in h2[d2 == 1]}
    assert fa & fb, "shared substring must yield a shared fingerprint"


def test_ann_pq_matches_oracle(ray_session, duck):
    """PQ's oracle SQL embeds DATA-DEPENDENT codebooks (retrained from
    this sf_dir's sample); regenerate for the test scale."""
    from searchengine_ray.pipelines import ann

    got = _canon(_to_pandas(ann.ann_pq_topk(SF_DIR)))
    want = _canon(duck.sql(ann.ann_pq_topk_sql(SF_DIR)).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ann_pq_recall_and_exact_encode(ray_session):
    """PQ recall@10 vs the exact baseline is far above chance (random =
    k/n = 2%), and a vector equal to a codebook reconstruction encodes
    losslessly to exactly those codes (ADC distance 0)."""
    import numpy as np

    from searchengine_ray.pipelines import ann

    exact = _to_pandas(ann.ann_topk(SF_DIR))
    pq = _to_pandas(ann.ann_pq_topk(SF_DIR))
    recalls = []
    for q in exact.query_vec_id.unique():
        e = set(exact[exact.query_vec_id == q].vec_id)
        p = set(pq[pq.query_vec_id == q].vec_id)
        recalls.append(len(e & p) / len(e))
    assert min(recalls) >= 0.1 and np.mean(recalls) >= 0.2, recalls

    books = ann._pq_codebooks(SF_DIR, local=True)
    m, ks, dsub = books.shape
    want_codes = np.arange(m) % ks
    vec = np.concatenate([books[s][want_codes[s]] / ann._PQ_MICRO
                          for s in range(m)])
    codes = ann._pq_encode(vec[None, :], books)[0]
    assert codes.tolist() == want_codes.tolist()


def test_ann_ivfpq_matches_oracle_and_full_probe(ray_session, duck):
    """IVF-PQ oracle regenerates for this sf_dir; and probing ALL lists
    must reproduce ann_pq_topk exactly (pruning only removes
    candidates, never changes scores)."""
    from searchengine_ray.pipelines import ann

    got = _canon(_to_pandas(ann.ann_ivfpq_topk(SF_DIR)))
    want = _canon(duck.sql(ann.ann_ivfpq_topk_sql(SF_DIR)).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    full = _canon(_to_pandas(ann.ann_ivfpq_topk(SF_DIR, nprobe=16)))
    pq = _canon(_to_pandas(ann.ann_pq_topk(SF_DIR)))
    pd.testing.assert_frame_equal(full, pq, check_dtype=False)


def test_ann_ivfpq_res_matches_oracle(ray_session, duck):
    """Residual IVF-PQ: oracle regenerates (data-dependent coarse
    centroids + residual codebooks) for this sf_dir; recall@10 vs the
    exact baseline stays above chance."""
    import numpy as np

    from searchengine_ray.pipelines import ann

    got = _canon(_to_pandas(ann.ann_ivfpq_res_topk(SF_DIR)))
    want = _canon(duck.sql(ann.ann_ivfpq_res_topk_sql(SF_DIR)).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    exact = _to_pandas(ann.ann_topk(SF_DIR))
    res = got
    recalls = []
    for q in exact.query_vec_id.unique():
        e = set(exact[exact.query_vec_id == q].vec_id)
        p = set(res[res.query_vec_id == q].vec_id)
        recalls.append(len(e & p) / len(e))
    assert np.mean(recalls) >= 0.1, recalls


def test_embedding_pca_matches_oracle_and_variance(ray_session, duck):
    """PCA oracle regenerates per sf_dir (data-dependent eigenvector);
    the PC1 scores must also carry more variance than any single raw
    coordinate (the defining property of the first component)."""
    import numpy as np

    from searchengine_ray.pipelines import ann

    got = _canon(_to_pandas(ann.embedding_pca(SF_DIR)))
    want = _canon(duck.sql(ann.embedding_pca_sql(SF_DIR)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    mat = np.array([r[0] for r in duck.sql(
        f"SELECT embedding FROM '{SF_DIR}/embeddings.parquet' "
        f"ORDER BY vec_id").fetchall()], dtype=np.float64)
    micro = np.floor(mat * ann._PQ_MICRO + 0.5)
    pc1 = got.sort_values("vec_id")["pc1_u"].to_numpy(np.float64)
    # projection onto a unit-ish direction: compare per-axis variance
    # against PC1 variance normalized by the quantized norm
    e_norm2 = None
    sql = ann.embedding_pca_sql(SF_DIR)
    # recompute the eigenvector the same way for the norm
    sx = np.array([int(x) for x in micro.sum(axis=0)], dtype=object)
    v = ann._pca_eigvec_from_moments(len(micro), sx,
                                     (micro.T @ micro).astype(np.int64))
    e_int = np.floor(v * ann._PQ_MICRO + 0.5)
    e_norm2 = float((e_int * e_int).sum())
    var_pc1 = pc1.var() / e_norm2
    var_axes = micro.var(axis=0).max()
    assert var_pc1 >= var_axes * 0.999


def test_ann_sq8_recall_vs_exact_mips(ray_session):
    """SQ8 with exact rerank recovers the true MIPS top-10 (rerank of 50
    candidates absorbs the bounded reconstruction error at this scale),
    and the scalar encode/recon helpers honor their contracts: codes in
    [0,255], constant dims code to 0, recon within rng/255 of micro."""
    import duckdb
    import numpy as np

    from searchengine_ray.pipelines import ann

    sq = _to_pandas(ann.ann_sq8_topk(SF_DIR))
    con = duckdb.connect()
    rows = con.sql(f"SELECT vec_id, embedding FROM "
                   f"'{SF_DIR}/embeddings.parquet' ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    micro = np.floor(np.array([r[1] for r in rows], dtype=np.float64)
                     * 1_000_000 + 0.5).astype(np.int64)
    recalls = []
    for q in ann.DEFAULT_QUERY_IDS:
        qrow = micro[np.nonzero(ids == q)[0][0]]
        dots = micro @ qrow
        true_top = set(ids[np.lexsort((ids, -dots))[:10]])
        got = set(sq[sq.query_vec_id == q].vec_id)
        recalls.append(len(true_top & got) / 10)
    assert np.mean(recalls) >= 0.8, recalls

    mind, maxd = micro.min(axis=0), micro.max(axis=0)
    # plant a constant dim to exercise the rng == 0 guard
    micro2 = micro.copy()
    micro2[:, 3] = 42
    mind2, maxd2 = micro2.min(axis=0), micro2.max(axis=0)
    codes = ann._sq8_encode(micro2 / 1e6, mind2, maxd2 - mind2)
    assert codes.min() >= 0 and codes.max() <= 255
    assert (codes[:, 3] == 0).all()
    recon = ann._sq8_recon(codes, mind2, maxd2 - mind2)
    rng2 = np.where(maxd2 > mind2, maxd2 - mind2, 0)
    assert (np.abs(recon - micro2) <= rng2[None, :] // 255 + 1).all()


def test_doc_outlier_matches_brute(ray_session):
    """Every reported outlier's d2 equals the brute-force integer
    distance to its label centroid, and rank 1 IS the label's true
    argmax (d2 desc, vec_id asc)."""
    import duckdb
    import numpy as np

    from searchengine_ray.pipelines import ann

    out = _to_pandas(ann.doc_outlier_score(SF_DIR))
    con = duckdb.connect()
    rows = con.sql(f"SELECT vec_id, embedding, label FROM "
                   f"'{SF_DIR}/embeddings.parquet' ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    micro = np.floor(np.array([r[1] for r in rows], dtype=np.float64)
                     * 1_000_000 + 0.5).astype(np.int64)
    labs = np.array([r[2] for r in rows], dtype=np.int64)
    for lab in np.unique(labs):
        sel = labs == lab
        cent = np.floor(micro[sel].sum(axis=0) / sel.sum() + 0.5).astype(np.int64)
        diff = micro[sel] - cent
        d2 = np.einsum("ij,ij->i", diff, diff)
        order = np.lexsort((ids[sel], -d2))
        got = out[out.label == lab].sort_values("rank")
        want_ids = ids[sel][order[:len(got)]]
        assert got.vec_id.tolist() == want_ids.tolist()
        assert got.d2.tolist() == d2[order[:len(got)]].tolist()


def test_search_explain_sums_to_bm25(ray_session):
    """Per-term contributions must reassemble the ranked score: for
    every (query, doc) pair the sum of term score_bp equals bm25_topk's
    score_bp within per-term rounding slack (each bp floors once), and
    every top-k pair with a matching term is explained."""
    from searchengine_ray.pipelines import docsearch

    top = _to_pandas(docsearch.bm25_topk(SF_DIR))
    exp = _to_pandas(docsearch.search_explain(SF_DIR))
    sums = exp.groupby(["query_id", "doc_id"]).agg(
        s=("score_bp", "sum"), t=("score_bp", "size")).reset_index()
    m = top.merge(sums, on=["query_id", "doc_id"], how="left")
    hit = m[m.s.notna()]
    assert len(hit) == len(m[m.score_bp > 0])      # every scored pair explained
    assert (abs(hit.s - hit.score_bp) <= hit.t).all()
    assert (exp.tf > 0).all() and (exp.df > 0).all()


def test_ann_filtered_label_invariant(ray_session):
    """Every filtered result shares its query's label, and for any
    query whose exact top-10 happens to be all same-label, the filtered
    and unfiltered result sets agree."""
    import duckdb

    from searchengine_ray.pipelines import ann

    con = duckdb.connect()
    lab = dict(con.sql(f"SELECT vec_id, label FROM "
                       f"'{SF_DIR}/embeddings.parquet'").fetchall())
    out = _to_pandas(ann.ann_filtered_topk(SF_DIR))
    assert len(out)
    for r in out.itertuples():
        assert lab[int(r.vec_id)] == lab[int(r.query_vec_id)]
    exact = _to_pandas(ann.ann_topk(SF_DIR))
    for q in exact.query_vec_id.unique():
        e = exact[exact.query_vec_id == q]
        if all(lab[int(v)] == lab[int(q)] for v in e.vec_id):
            f = out[out.query_vec_id == q]
            assert set(f.vec_id) == set(e.vec_id)


def test_quality_percentile_semantics(ray_session):
    """Percentiles are exact within-language cume_dist: max value gets
    pct_u == 1e6, keep matches the threshold, and per-lang keep rates
    land near 30% (ties can only widen the kept set)."""
    from searchengine_ray.pipelines.textstats import quality_percentile_by_lang

    out = _to_pandas(quality_percentile_by_lang(SF_DIR))
    assert len(out)
    for lang, g in out.groupby("lang"):
        n = len(g)
        top = g[g.entropy_bp == g.entropy_bp.max()]
        assert (top.pct_u == 1_000_000).all()
        # recompute cume_dist brute force
        v = g.entropy_bp.to_numpy()
        for r in g.sample(min(20, n), random_state=0).itertuples():
            assert r.pct_u == 1_000_000 * int((v <= r.entropy_bp).sum()) // n
        kept = (g.keep == 1).mean()
        assert 0.25 <= kept <= 0.45, (lang, kept)
    assert ((out.keep == 1) == (out.pct_u >= 700_000)).all()


def test_boilerplate_scrub_stage(ray_session):
    """Direct-callable unit test: hot lines drop wherever they occur,
    untouched docs digest to their own (injected) text, empty-after-
    scrub docs digest md5('')."""
    import hashlib

    import pyarrow as pa
    import ray

    from searchengine_ray.pipelines.textstats import (_BP_FOOTER,
                                                      _BP_HEADER,
                                                      _BoilerplateScrub)

    hot_ref = ray.put({_BP_HEADER, _BP_FOOTER, "dup dup dup"})
    t = pa.table({
        "doc_id": [3, 1, 4],   # 3: header; 1: nothing; 4: footer
        "text": ["keep me\ndup dup dup", "only line", "dup dup dup"],
    })
    out = _BoilerplateScrub(hot_ref)(t).to_pandas().set_index("doc_id")
    # doc 3 gains the injected header (hot) and carries one hot line
    assert out.loc[3].n_lines == 3 and out.loc[3].n_dropped == 2
    assert out.loc[3].kept_md5 == hashlib.md5(b"keep me").hexdigest()
    assert out.loc[1].n_dropped == 0
    assert out.loc[1].kept_md5 == hashlib.md5(b"only line").hexdigest()
    # doc 4: its only real line is hot AND it gains the hot footer
    assert out.loc[4].n_lines == 2 and out.loc[4].n_dropped == 2
    assert out.loc[4].kept_md5 == hashlib.md5(b"").hexdigest()


def test_release_pipeline_composes(ray_session):
    """The composed release flow equals the intersection of its
    standalone pieces: boilerplate rows, filtered to quality keep=1,
    train side, and not exact-span contaminated."""
    from searchengine_ray.pipelines.dedup import (_EVAL_MOD,
                                                  ngram_contamination)
    from searchengine_ray.pipelines.textstats import (boilerplate_lines,
                                                      quality_filter,
                                                      release_pipeline)

    got = _to_pandas(release_pipeline(SF_DIR)).sort_values("doc_id") \
        .reset_index(drop=True)
    bp = _to_pandas(boilerplate_lines(SF_DIR))
    qf = _to_pandas(quality_filter(SF_DIR))
    bad = set(_to_pandas(ngram_contamination(SF_DIR)).doc_id)
    keep_q = set(qf[qf.keep == 1].doc_id)
    want = bp[bp.doc_id.isin(keep_q)
              & (bp.doc_id % _EVAL_MOD != 0)
              & ~bp.doc_id.isin(bad)].sort_values("doc_id") \
        .reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_lines", "n_dropped", "kept_md5"]],
        want[["doc_id", "n_lines", "n_dropped", "kept_md5"]],
        check_dtype=False)


def test_chunk_docs_window_semantics():
    """Direct-callable unit test of the chunking math: overlap, exact
    fit, short docs, and the one-empty-chunk rule for empty docs."""
    import hashlib

    import pyarrow as pa

    from searchengine_ray.pipelines.textstats import _ChunkDocs

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["a b c d e f g", "x y", "   "]})
    out = _ChunkDocs(chunk_len=4, stride=3)(t).to_pandas()
    d1 = out[out.doc_id == 1].reset_index(drop=True)
    # starts 0,3,6 -> windows [a..d], [d..g], [g]
    assert list(d1.tok_start) == [0, 3, 6]
    assert list(d1.n_tokens) == [4, 4, 1]
    assert d1.chunk_md5[0] == hashlib.md5(b"a b c d").hexdigest()
    assert d1.chunk_md5[1] == hashlib.md5(b"d e f g").hexdigest()
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and list(d2.n_tokens) == [2]
    d3 = out[out.doc_id == 3]          # whitespace-only = empty doc
    assert len(d3) == 1 and list(d3.n_tokens) == [0]
    assert d3.chunk_md5.iloc[0] == hashlib.md5(b"").hexdigest()


def test_cooccur_partial_window_semantics():
    """Direct-callable unit test: distance cap, doc-boundary gating,
    unordered lexicographic pair keys, per-occurrence counting."""
    import pyarrow as pa

    from searchengine_ray.pipelines.textstats import _CooccurPartial

    t = pa.table({"doc_id": [1, 2], "text": ["b a b", "z a"]})
    out = _CooccurPartial(window=2)(t).to_pandas().set_index("pair")["c_p"]
    # doc1 pairs: (b,a) d1, (a,b) d1, (b,b) d2; doc2: (z,a) d1 — and the
    # cross-doc (b,z) / (a,z) at the batch seam must NOT appear
    assert out.to_dict() == {"a b": 2, "b b": 1, "a z": 1}
    out1 = _CooccurPartial(window=1)(t).to_pandas().set_index("pair")["c_p"]
    assert out1.to_dict() == {"a b": 2, "a z": 1}   # d=2 pair gone


def test_knn_graph_matches_brute_force(ray_session):
    """_KnnGraphStage against a naive numpy loop on a tiny matrix:
    self excluded, ties (bp desc, nbr asc), exact ranks."""
    import numpy as np
    import pyarrow as pa
    import ray

    from searchengine_ray.pipelines.ann import _KnnGraphStage, _normalize
    from searchengine_ray.pipelines.common import bp

    rng = np.random.RandomState(7)
    mat = rng.randn(20, 8)
    ids = np.arange(100, 120, dtype=np.int64)
    norm = _normalize(mat)
    stage = _KnnGraphStage(ray.put(norm), ray.put(ids), k=3)
    batch = pa.table({"vec_id": ids,
                      "embedding": pa.array(mat.tolist(),
                                            pa.list_(pa.float64()))})
    out = stage(batch).to_pandas()
    sims = bp(norm @ norm.T)
    for i in range(20):
        row = sims[i]
        cand = np.flatnonzero(ids != ids[i])
        top = cand[np.lexsort((ids[cand], -row[cand]))[:3]]
        got = out[out.vec_id == ids[i]].sort_values("rank")
        assert list(got.nbr_id) == ids[top].tolist()
        assert list(got.cosine_bp) == row[top].tolist()


def test_dirichlet_is_a_distinct_model_on_the_shared_index(ray_session):
    """LM Dirichlet serves from the SAME index image as BM25 but scores
    in a different space: per-query result sets obey the same k/tie
    policy, while the score space includes negatives (the doc-length
    penalty ln(mu/(dl+mu)) < 0) — which BM25's never does."""
    from searchengine_ray.pipelines import docsearch

    d = _to_pandas(docsearch.lm_dirichlet_topk(SF_DIR))
    b = _to_pandas(docsearch.bm25_topk(SF_DIR))
    assert set(d.query_id) == set(b.query_id)
    assert d.groupby("query_id").size().equals(b.groupby("query_id").size())
    # different formula, different score space: the dirichlet path must
    # not be silently delegating to the BM25 kernel
    merged = d.merge(b, on=["query_id", "rank"], suffixes=("_lm", "_bm"))
    assert (merged.score_bp_lm != merged.score_bp_bm).any()


def test_cosine_is_the_reference_model_and_quantized(ray_session):
    """tf-idf cosine (the reference's OWN ranker, ranker.py:14-48)
    serves from the same index image as BM25: same k/query coverage,
    but scores are basis-point cosines in [0, 10000] — bounded above
    in a way BM25 scores never are — and a doc matching the whole
    query with proportional tfs hits exactly 10000."""
    from searchengine_ray.pipelines import docsearch

    c = _to_pandas(docsearch.tfidf_cosine_topk(SF_DIR))
    b = _to_pandas(docsearch.bm25_topk(SF_DIR))
    assert set(c.query_id) == set(b.query_id)
    assert c.groupby("query_id").size().equals(b.groupby("query_id").size())
    assert c.score_bp.between(0, 10000).all()
    # distinct model: rankings must not silently mirror BM25 everywhere
    merged = c.merge(b, on=["query_id", "rank"], suffixes=("_cos", "_bm"))
    assert (merged.doc_id_cos != merged.doc_id_bm).any()
    # math-tie clusters (equal score_bp) are doc_id-ascending: the
    # quantized ranking is deterministic, not float-noise-ordered
    for _, g in c.groupby("query_id"):
        g = g.sort_values("rank")
        for _, tie in g.groupby("score_bp"):
            assert list(tie.doc_id) == sorted(tie.doc_id)


def test_bigram_logprob_matches_sql_and_is_a_transition_model(ray_session, duck):
    """Bigram LM doc scores replay exactly in SQL at this sf too; the
    score is (up to per-row half-bp rounding) nonpositive — ln c(ab)
    <= ln c(a.) per transition — and docs exist where the bigram and
    unigram models disagree on relative quality (context matters)."""
    from searchengine_ray.pipelines import textstats as ts

    out = _to_pandas(ts.bigram_logprob(SF_DIR))
    got = _canon(out)
    want = _canon(duck.sql(ts.bigram_logprob_sql()).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (out.logprob_bp <= out.n_bigrams).all()   # rounding slack only
    uni = _to_pandas(ts.unigram_logprob(SF_DIR)).set_index("doc_id")
    merged = out.set_index("doc_id").join(uni, rsuffix="_u")
    ranks_b = merged.avg_logprob_bp.rank()
    ranks_u = merged.avg_logprob_bp_u.rank()
    assert (ranks_b != ranks_u).any()                # not the same ordering


def test_rescore_stays_in_window_and_reorders(ray_session):
    """Window-rescore semantics: every returned doc comes from the
    BM25 top-RESCORE_WINDOW of its query (phase 2 never resurrects a
    doc phase 1 cut), and the cosine combine actually changes at least
    one query's ordering relative to plain BM25."""
    from searchengine_ray.pipelines import docsearch as dsx
    from searchengine_ray.pipelines.query import search_queries

    res = _to_pandas(dsx.rescore_search(SF_DIR))
    paths = dsx.ensure_doc_index(SF_DIR)
    win = search_queries(paths, dsx.DOC_QUERIES,
                         k=dsx.RESCORE_WINDOW, config=dsx.doc_index_config(),
                         concurrency=(1, 2)).to_pandas()
    allowed = set(zip(win.query_id, win.doc_id))
    assert all((q, d) in allowed
               for q, d in zip(res.query_id, res.doc_id))
    bm = _to_pandas(dsx.bm25_topk(SF_DIR))
    same = (res.sort_values(["query_id", "rank"]).doc_id.to_numpy()
            == bm.sort_values(["query_id", "rank"]).doc_id.to_numpy())
    assert not same.all()


def test_weighted_sample_is_weighted_and_estimator_tight(ray_session, duck):
    """Bottom-k weighted sampling semantics: the sampled docs' mean
    weight exceeds the corpus mean (inclusion prob rises with weight),
    and the subset-sum estimate lands within the ~1/sqrt(k) band of
    the exact total weight."""
    from searchengine_ray.pipelines import textstats as ts

    samp = _to_pandas(ts.weighted_sample(SF_DIR))
    stats = duck.sql("SELECT avg(GREATEST(n_chars,1)),"
                     " sum(GREATEST(n_chars,1)) FROM documents").fetchone()
    assert samp.weight.mean() > stats[0]
    est = _to_pandas(ts.weighted_sample_est(SF_DIR))
    rel_err = abs(est.est_total_w_micro[0] / 1e6 - stats[1]) / stats[1]
    assert rel_err < 0.4                     # k=64 -> ~12.5% expected


def test_range_partition_plan_contiguous_and_complete(ray_session, duck):
    """Range-partitioner invariants: every part range is contiguous and
    non-overlapping (equal keys always co-locate, so consecutive parts
    can only MEET, never interleave), row counts sum to the corpus,
    and the sampled boundaries produce a usable balance (no part holds
    more than half the corpus at nparts=8)."""
    from searchengine_ray.pipelines import textstats as ts

    plan = _to_pandas(ts.range_partition_plan(SF_DIR)).sort_values("part")
    n = duck.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert plan.n_rows.sum() == n
    mx = plan.max_key.to_numpy()
    mn = plan.min_key.to_numpy()
    assert (mx[:-1] <= mn[1:]).all()
    assert plan.n_rows.max() <= n / 2


def test_bloom_semi_join_prunes_and_stays_exact(ray_session, duck):
    """Bloom-join invariants: no false negatives (n_match equals the
    exact semi-join count), pass count sandwiched between match and
    total, and the deliberately-tiny filter still prunes (pass <
    total) — the verify stage is what removes any false positives."""
    from searchengine_ray.pipelines import relational as rel

    st = _to_pandas(rel.bloom_semi_join_stats(SF_DIR)).iloc[0]
    exact = duck.sql(
        f"SELECT count(*) FROM orders o JOIN customer c"
        f" ON c.c_custkey = o.o_custkey"
        f" WHERE c.c_mktsegment = '{rel._BSJ_SEGMENT}'").fetchone()[0]
    assert st.n_match == exact                  # exactness: no false negatives
    assert st.n_match <= st.n_pass_bloom <= st.n_orders
    assert st.n_pass_bloom < st.n_orders        # the filter actually prunes
    assert st.n_false_pos == st.n_pass_bloom - st.n_match


def test_kmv_exact_below_k_and_estimator_sane(ray_session, duck):
    """KMV semantics: when a type's distinct-user count is under k the
    sketch is exhaustive (rank count == exact distinct) and the pair
    union estimate is EXACT; the m/ku Jaccard matches the exact
    Jaccard to within the sketch resolution."""
    from searchengine_ray.pipelines import events as ev

    regs = _to_pandas(ev.user_kmv_registers(SF_DIR))
    exact = duck.sql("SELECT event_type, count(DISTINCT user_id) u"
                     " FROM events GROUP BY 1").df().set_index("event_type")
    for t, grp in regs.groupby("event_type"):
        if exact.loc[t, "u"] < ev._KMV_K:
            assert len(grp) == exact.loc[t, "u"]
    ov = _to_pandas(ev.user_overlap_kmv(SF_DIR))
    for _, r in ov.iterrows():
        tru = duck.sql(
            f"SELECT count(DISTINCT user_id) FROM events"
            f" WHERE event_type IN ('{r.type_a}', '{r.type_b}')"
        ).fetchone()[0]
        inter = duck.sql(
            f"SELECT count(*) FROM ("
            f"SELECT user_id FROM events WHERE event_type = '{r.type_a}'"
            f" INTERSECT "
            f"SELECT user_id FROM events WHERE event_type = '{r.type_b}')"
        ).fetchone()[0]
        if r.ku < ev._KMV_K:
            assert r.union_est == tru          # exhaustive -> exact
        jac_true = inter / tru
        assert abs(r.jaccard_bp / 10000.0 - jac_true) <= 0.25


def test_value_quantiles_sketch_one_sided_and_tight(ray_session, duck):
    """The dyadic-CMS walk's deterministic guarantee — the estimate
    never exceeds the exact k-th smallest cent — plus a tightness
    check: the true rank just below the estimate sits within 1% + 5 of
    the target (the d x w sketch is nearly exact at this scale)."""
    from searchengine_ray.pipelines import events as ev

    est = _to_pandas(ev.value_quantiles_sketch(SF_DIR))
    n = duck.sql("SELECT count(*) FROM events").fetchone()[0]
    u = (1 << 20) - 1
    for _, r in est.iterrows():
        below = duck.sql(
            f"SELECT count(*) FROM (SELECT LEAST(GREATEST(CAST("
            f"floor(value*100+0.5) AS BIGINT), 0), {u}) c FROM events)"
            f" WHERE c < {int(r.est_cents)}").fetchone()[0]
        assert below <= r.k - 1                     # one-sided guarantee
        assert r.k - 1 - below <= 0.01 * n + 5      # tightness
    assert len(_to_pandas(
        ev.value_quantiles_sketch_violations(SF_DIR))) == 0


def test_spell_search_corrects_typos_and_noops_known_terms(ray_session):
    """The actor-pool spell path: a typo query returns exactly the
    corrected query's results ('windwo agg' == 'window agg'), a
    known-terms query is untouched by the flag, an uncorrectable term
    drops (query 5 behaves like 'data' alone), and a correction merges
    multiplicity (query 7 'hash hashh' == 'hash hash')."""
    from searchengine_ray.pipelines import docsearch
    from searchengine_ray.pipelines.query import search_queries

    paths = docsearch.ensure_doc_index(SF_DIR)
    cfg = docsearch.doc_index_config()

    def run(queries, spell):
        df = search_queries(paths, queries, k=10, config=cfg,
                            concurrency=(1, 2), spell_correct=spell
                            ).to_pandas().sort_values(["query_id", "rank"])
        return df[["query_id", "doc_id", "score"]].reset_index(drop=True)

    got = run(SPELL := [(2, "windwo agg"), (5, "qzwxqz data"),
                        (6, "join table"), (7, "hash hashh")], spell=True)
    want = run([(2, "window agg"), (5, "data"),
                (6, "join table"), (7, "hash hash")], spell=False)
    pd.testing.assert_frame_equal(got, want)


def test_significant_terms_surfaces_the_filter_itself(ray_session):
    """JLH significance: the filter term is trivially its own most
    significant term (fg% = 1), and a rare term's foreground ('dup',
    df=25 of ~500) scores it far above corpus-wide stopword-like terms
    whose fg% ~ bg%."""
    from searchengine_ray.pipelines import textstats as ts

    out = _to_pandas(ts.significant_terms(SF_DIR))
    for f, g in out.groupby("filter_term"):
        assert len(g) <= ts.SIGTERM_TOPK
        best = g.sort_values(["score_mp", "term"],
                             ascending=[False, True]).iloc[0]
        assert best.term == f            # fg% == 1 maximizes JLH
        assert best.fg_n == best.bg_n
    assert set(out.filter_term) == set(ts.SIGTERM_FILTERS)
    assert (out.score_mp >= 0).all()


def test_search_after_pages_are_disjoint_continuations(ray_session):
    """Cursor paging over the federated shards: page 2 never repeats a
    page-1 doc, ranks run 11..20, and every page-2 score is <= the
    page-1 cursor score (the strict-after filter held per shard)."""
    from searchengine_ray.pipelines import docsearch

    p1 = _to_pandas(docsearch.bm25_topk(SF_DIR))
    p2 = _to_pandas(docsearch.search_after_federated(SF_DIR))
    assert set(p2.query_id) <= set(p1.query_id)
    for qid, g2 in p2.groupby("query_id"):
        g1 = p1[p1.query_id == qid]
        assert len(g1) == 10          # a page 2 exists only after a full page 1
        assert not (set(g2.doc_id) & set(g1.doc_id))
        assert list(g2.sort_values("rank")["rank"]) == list(range(11, 11 + len(g2)))
        assert g2.score_bp.max() <= g1.score_bp.min()


def test_bm25f_routes_fields_and_boosts_source(ray_session, duck):
    """BM25F: a source-only query must return only docs of those
    sources; an absent text term beside a source term degrades to the
    source field alone — the union-df idf and field weighting route
    queries across both per-field indexes."""
    from searchengine_ray.pipelines import docsearch

    out = _to_pandas(docsearch.bm25f_topk(SF_DIR))
    src_of = dict(duck.sql(
        "SELECT doc_id, source FROM documents").fetchall())
    q4 = out[out.query_id == 4]
    assert len(q4) == 10
    assert set(src_of[d] for d in q4.doc_id) <= {"src5", "src9"}
    q6 = out[out.query_id == 6]           # zzznosuchterm src1
    assert len(q6) == 10
    assert set(src_of[d] for d in q6.doc_id) == {"src1"}
    # ranks contiguous from 1 per query
    for _, g in out.groupby("query_id"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, len(g) + 1))


def test_synonym_noop_queries_equal_plain_bm25(ray_session):
    """Queries whose configured synonyms are absent from the vocabulary
    ("quick", "large") must rank IDENTICALLY to plain BM25 over the raw
    text — expansion to a df=0 term is a no-op on both engine paths."""
    import numpy as np

    from searchengine_ray.pipelines import docsearch
    from searchengine_ray.pipelines.query import search_queries

    syn = _to_pandas(docsearch.synonym_search(SF_DIR))
    paths = docsearch.ensure_doc_index(SF_DIR)
    noop = [(1, "fast scan"), (3, "big data")]
    plain = search_queries(paths, noop, k=docsearch.K,
                           config=docsearch.doc_index_config(),
                           concurrency=(1, 2)).to_pandas()
    plain["score_bp"] = np.floor(
        plain["score"].to_numpy() * 10000 + 0.5).astype(np.int64)
    for qid, _ in noop:
        got = syn[syn.query_id == qid][["rank", "doc_id", "score_bp"]] \
            .sort_values("rank").reset_index(drop=True)
        want = plain[plain.query_id == qid][["rank", "doc_id", "score_bp"]] \
            .sort_values("rank").reset_index(drop=True)
        want["rank"] = want["rank"].astype(got["rank"].dtype)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bq_rerank_metric_is_exact(ray_session):
    """Every (query, candidate) dot_micro2 the BQ path emits equals the
    brute-force integer-micro inner product — the rerank tier is exact;
    only candidate SELECTION (hamming) is approximate."""
    import numpy as np
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines import ann

    got = _to_pandas(ann.ann_bq_topk(SF_DIR))
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    micro = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}
    for r in got.itertuples():
        want = int(micro[pos[int(r.query_vec_id)]] @ micro[pos[int(r.vec_id)]])
        assert int(r.dot_micro2) == want


def test_linear_probe_matches_oracle(ray_session, duck):
    """Generated-oracle rows checked at THIS scale (their defaults
    point at the driver's sf0.01): distributed Gram fold and the
    inlined-weights prediction replay, both exact-integer."""
    from searchengine_ray.pipelines import ann

    got = _canon(_to_pandas(ann.linear_probe_gram(SF_DIR)))
    want = _canon(duck.sql(ann.linear_probe_gram_sql(SF_DIR)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got = _canon(_to_pandas(ann.linear_probe(SF_DIR)))
    want = _canon(duck.sql(ann.linear_probe_sql(SF_DIR)).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the probe should beat 10-class chance comfortably on the
    # synthetic labels (measured ~0.40 at this scale)
    df = _to_pandas(ann.linear_probe(SF_DIR))
    acc = float((df["pred"] == df["label"]).mean())
    assert acc > 0.3, acc


def test_sorted_projection_expansion_parity(ray_session):
    """The sorted/reversed dictionary projections (the 100-TB wildcard
    path) return EXACTLY the distributed-scan expansion — same terms,
    same deterministic cap selection — and actually prune: row groups
    read < row groups total, files read < files total (range pruning
    via row-group key statistics)."""
    from searchengine_ray.pipelines.docsearch import (
        PREFIX_MAX_EXPANSIONS,
        PREFIX_QUERIES,
        SUFFIX_QUERIES,
        _expand_prefixes,
        _expand_sorted,
        ensure_doc_index,
    )

    paths = ensure_doc_index(SF_DIR)
    for mode, queries in (("prefix", PREFIX_QUERIES),
                          ("suffix", SUFFIX_QUERIES)):
        stats: dict = {}
        got = _expand_sorted(paths, queries, PREFIX_MAX_EXPANSIONS,
                             mode, stats)
        assert got is not None
        # force the scan fallback for comparison by aiming at the
        # regex-mode machinery with equivalent anchored patterns
        import re as _re
        if mode == "prefix":
            pats = [(q, "^" + _re.escape(p)) for q, p in queries]
        else:
            pats = [(q, _re.escape(p) + "$") for q, p in queries]
        want = _expand_prefixes(paths, pats, PREFIX_MAX_EXPANSIONS,
                                mode="regex")
        assert got == want, mode
        assert stats["proj_row_groups_read"] >= 1
        assert stats["proj_files_total"] >= 1


def test_key_upper_bound():
    from searchengine_ray.pipelines.docsearch import _key_upper_bound

    assert _key_upper_bound("abc") == "abd"
    assert _key_upper_bound("a" + chr(0x10FFFF)) == "b"
    assert _key_upper_bound(chr(0x10FFFF)) is None
    # the bound is tight: everything with the prefix sorts below it
    for pre in ("x", "zz", "a0_"):
        hi = _key_upper_bound(pre)
        assert pre < pre + "zzz" < hi


def test_ann_graph_recall_vs_exact(ray_session):
    """Navigable-graph ANN (NSW beam search over the symmetric kNN
    graph, md5-rank-scattered entries): recall@10 vs the exact scan
    must clear the floor at the gate scale, while visiting a fraction
    of the corpus (the point of the graph)."""
    from searchengine_ray.pipelines.ann import ann_graph_topk, ann_topk

    st: dict = {}
    got = ann_graph_topk(SF_DIR, _stats=st).to_pandas()
    exact = ann_topk(SF_DIR).to_pandas()
    n_vecs = 500
    recalls = []
    for q in sorted(got.query_vec_id.unique()):
        g = set(got[got.query_vec_id == q].vec_id)
        e = set(exact[exact.query_vec_id == q].vec_id)
        recalls.append(len(g & e) / len(e))
    assert min(recalls) >= 0.8, recalls
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    assert all(v < n_vecs for v in st["visited_per_query"])


def test_ann_graph_beam_is_deterministic(ray_session):
    """Two runs of the beam search return identical tables (fixed
    entries, integer tie-breaks) — the property that lets the SQL
    oracle replay the search itself."""
    from searchengine_ray.pipelines.ann import ann_graph_topk

    a = ann_graph_topk(SF_DIR).to_pandas()
    b = ann_graph_topk(SF_DIR).to_pandas()
    assert a.equals(b)
