"""Distributed build vs pure-Python oracle (SURVEY §5 strategy #2):
sha256 invariant, dictionary/df set-equality, postings byte-exactness,
doc_meta stats, dedup."""

import json
import pathlib

import numpy as np
import pyarrow.parquet as pq

from searchengine_ray.codec import concat_blocks, decode_blocks
from searchengine_ray.oracle import content_sha256
from searchengine_ray.pipelines.query import IndexSearcher


def test_meta_stats_match_oracle(t1_index, t1_oracle):
    meta = t1_index.meta()
    assert meta["N"] == t1_oracle.N
    assert meta["avgdl"] == t1_oracle.avgdl  # integer-sum derived -> exact
    assert meta["n_terms"] == len(t1_oracle.postings)
    assert meta["n_postings"] == sum(len(p) for p in t1_oracle.postings.values())


def test_sha256_invariant(t1_index, t1_oracle):
    """Per-row content sha256 equality (BASELINE.json input_hint)."""
    docs = pq.read_table(
        sorted(pathlib.Path(t1_index.docs).glob("*.parquet")),
        columns=["doc_id", "sha256", "content"])
    by_id = {m["doc_id"]: m["sha256"] for m in t1_oracle.doc_meta.values()}
    assert docs.num_rows == t1_oracle.N
    for did, sha, content in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("sha256").to_pylist(),
                                 docs.column("content").to_pylist()):
        assert sha == content_sha256(content)
        assert by_id[did] == sha


def test_dictionary_df_set_equality(t1_index, t1_oracle, small_config):
    s = IndexSearcher(t1_index, small_config)
    assert s.df_map() == t1_oracle.df


def test_postings_exact(t1_index, t1_oracle, small_config):
    s = IndexSearcher(t1_index, small_config)
    for term, want in t1_oracle.postings.items():
        docs, tfs = decode_blocks(concat_blocks(s.postings_for(term)))
        assert list(zip(docs.tolist(), tfs.tolist())) == want, term


def test_doc_ids_sorted_and_docids_strictly_increasing(t1_index, small_config):
    s = IndexSearcher(t1_index, small_config)
    for term in list(s.df_map())[:200]:
        docs, _ = decode_blocks(concat_blocks(s.postings_for(term)))
        assert np.all(np.diff(docs) > 0), term


def test_dedup_dropped_duplicates(t1_index):
    """The generator injects ~0.5% duplicate rows; normalize must drop them."""
    manifests = [json.loads(p.read_text()) for p in
                 pathlib.Path(t1_index.docs).glob("*.manifest.json")]
    assert sum(m.get("dups_dropped", 0) for m in manifests) > 0


def test_doc_meta_matches_oracle(t1_index, t1_oracle):
    tbl = pq.read_table(sorted(pathlib.Path(t1_index.doc_meta).glob("*.parquet")))
    got = {d: (l, m) for d, l, m in zip(tbl.column("doc_id").to_pylist(),
                                        tbl.column("doc_len").to_pylist(),
                                        tbl.column("max_tf").to_pylist())}
    want = {m["doc_id"]: (m["doc_len"], m["max_tf"])
            for m in t1_oracle.doc_meta.values()}
    assert got == want
