"""Incremental ingest (add_documents): generation append + merge.

Correctness bar: after ingesting a second corpus into an existing
index, the index must behave EXACTLY like an index over the union —
verified by rank/score parity against OracleIndex over the docs the
index itself holds, plus meta/doc_meta invariants and idempotent
re-ingest."""

import json
import shutil
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from searchengine_ray.config import IndexConfig
from searchengine_ray.corpus import generate_corpus
from searchengine_ray.oracle import OracleIndex
from searchengine_ray.pipelines.build import add_documents, build_index
from searchengine_ray.pipelines.query import IndexSearcher

QUERIES = ["parse buffer", "merge sort window", "hash", "zzznosuchterm",
           "data query line"]


@pytest.fixture(scope="module")
def inc_index(ray_session, tmp_path_factory):
    work = tmp_path_factory.mktemp("inc")
    c1 = generate_corpus(1500, work / "c1", seed=7, n_files=4)
    c2 = generate_corpus(700, work / "c2", seed=1234, n_files=3)
    cfg = IndexConfig(num_doc_parts=4, num_term_parts=8,
                      store_positions=True)
    paths = build_index(c1, work / "idx", cfg)
    n1 = paths.meta()["N"]
    paths = add_documents(c2, work / "idx", cfg)
    return paths, cfg, n1


def _all_docs(paths):
    import pyarrow as pa

    tables = [pq.read_table(f) for f in sorted(
        Path(paths.docs).glob("part-*.parquet"))]
    return pa.concat_tables(tables)


def test_meta_counts(inc_index):
    paths, cfg, n1 = inc_index
    meta = paths.meta()
    docs = _all_docs(paths)
    assert meta["N"] == docs.num_rows > n1
    assert meta["generation"] == 2
    assert meta["doc_parts_used"] == 2 * cfg.num_doc_parts
    # doc_meta holds every doc exactly once
    dm = sum(pq.read_table(f).num_rows
             for f in Path(paths.doc_meta).glob("part-*.parquet"))
    assert dm == meta["N"]


def test_generation_ids_disjoint(inc_index):
    paths, cfg, n1 = inc_index
    docs = _all_docs(paths)
    ids = sorted(docs.column("doc_id").to_pylist())
    assert len(set(ids)) == len(ids)
    gen2_floor = cfg.num_doc_parts << cfg.doc_id_part_bits
    assert sum(1 for i in ids if i >= gen2_floor) > 0
    assert sum(1 for i in ids if i < gen2_floor) == n1


def test_rank_parity_after_ingest(inc_index):
    """BM25 results over the merged index == OracleIndex over the very
    docs the index holds (bit-identical scores)."""
    paths, cfg, _ = inc_index
    oracle = OracleIndex(_all_docs(paths), cfg, id_column="doc_id")
    s = IndexSearcher(paths.root, cfg)
    for q in QUERIES:
        got = s.search(q, k=10)
        want = oracle.search(q, k=10)
        assert got == want, q


def test_reingest_is_noop(inc_index, tmp_path):
    paths, cfg, _ = inc_index
    before = json.loads(Path(paths.meta_path).read_text())
    # identical source content -> same generation fingerprint -> no-op
    p2 = add_documents(Path(paths.root).parent / "c2", paths.root, cfg)
    after = json.loads(Path(p2.meta_path).read_text())
    assert after == before


def test_min_df_guard(inc_index):
    paths, cfg, _ = inc_index
    bad = IndexConfig(num_doc_parts=4, num_term_parts=8, min_df=2)
    with pytest.raises(ValueError, match="min_df"):
        add_documents("/tmp/nonexistent", paths.root, bad)


def test_boolean_search_parity(inc_index, tmp_path):
    """Boolean AND/NOT retrieval == brute-force set algebra over the
    analyzed docs (incl. absent terms, t AND NOT t, and tombstones)."""
    paths, cfg, _ = inc_index
    from searchengine_ray.tokenizer import Analyzer

    an = Analyzer(cfg)
    docs = _all_docs(paths)
    term_sets = {d: set(an.terms(t))
                 for d, t in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("content").to_pylist())}
    s = IndexSearcher(paths.root, cfg)
    cases = ["parse buffer -window", "hash -zzznosuchterm",
             "data query line", "zzznosuchterm hash", "hash -hash", "-hash"]
    for q in cases:
        must: set = set()
        must_not: set = set()
        for w in q.split():
            neg = w.startswith("-")
            for t in an.terms(w[1:] if neg else w):
                (must_not if neg else must).add(t)
        if not must or (must & must_not):
            want = []
        else:
            want = sorted(d for d, ts in term_sets.items()
                          if must <= ts and not (must_not & ts))
        assert s.boolean_search(q).tolist() == want, q

    base = s.boolean_search("parse buffer").tolist()
    assert base, "fixture corpus should match the base query"
    work = tmp_path / "idx_bool"
    shutil.copytree(paths.root, work)
    from searchengine_ray.pipelines.build import delete_documents

    delete_documents(work, {base[0]})
    s1 = IndexSearcher(str(work), cfg)
    assert s1.boolean_search("parse buffer").tolist() == base[1:]


def test_terms_union_parity(inc_index, tmp_path):
    """Disjunctive retrieval (the wildcard/prefix body) == brute-force
    distinct-term counting over the analyzed docs, incl. unknown terms,
    duplicate query terms, empty expansion, and tombstones."""
    paths, cfg, _ = inc_index
    from searchengine_ray.tokenizer import Analyzer

    an = Analyzer(cfg)
    docs = _all_docs(paths)
    term_sets = {d: set(an.terms(t))
                 for d, t in zip(docs.column("doc_id").to_pylist(),
                                 docs.column("content").to_pylist())}
    s = IndexSearcher(paths.root, cfg)
    cases = [["parse", "buffer"], ["hash"], ["zzznosuchterm"],
             ["data", "query", "line", "zzznosuchterm"],
             ["hash", "hash", "merge"], []]
    for terms in cases:
        want = sorted((d, len(ts & set(terms)))
                      for d, ts in term_sets.items() if ts & set(terms))
        ids, counts = s.terms_union(terms)
        assert list(zip(ids.tolist(), counts.tolist())) == want, terms

    base_ids, base_counts = s.terms_union(["parse", "buffer"])
    assert len(base_ids), "fixture corpus should match the base terms"
    work = tmp_path / "idx_union"
    shutil.copytree(paths.root, work)
    from searchengine_ray.pipelines.build import delete_documents

    delete_documents(work, {int(base_ids[0])})
    s1 = IndexSearcher(str(work), cfg)
    ids1, counts1 = s1.terms_union(["parse", "buffer"])
    assert ids1.tolist() == base_ids[1:].tolist()
    assert counts1.tolist() == base_counts[1:].tolist()


def test_delete_and_compact(inc_index, tmp_path):
    """Tombstones drop docs from every query path without changing the
    surviving docs' (stale-stats) scores; compaction rebuilds exact."""
    paths, cfg, _ = inc_index
    work = tmp_path / "idx_copy"
    shutil.copytree(paths.root, work)
    from searchengine_ray.pipelines.build import (compact_index,
                                                  delete_documents)

    s0 = IndexSearcher(str(work), cfg)
    q = "parse buffer"
    pre = s0.search(q, k=10)
    assert len(pre) == 10
    victims = {pre[0][0], pre[3][0]}
    n = delete_documents(work, victims)
    assert n == 2

    s1 = IndexSearcher(str(work), cfg)   # fresh searcher picks up deletes
    for method in ("vectorized", "impact", "bmw"):
        post = s1.search(q, k=10, method=method)
        assert all(d not in victims for d, _ in post), method
        want = [r for r in pre if r[0] not in victims]
        assert post[:len(want)] == want, method

    # phrase path also excludes tombstones
    ph_all = {d for d, _ in s0.phrase_search("parse buffer")}
    if ph_all & victims:
        ph_live = {d for d, _ in s1.phrase_search("parse buffer")}
        assert not (ph_live & victims)

    # compact: tombstones gone for good, stats exact again
    new_root = tmp_path / "idx_compact"
    p2 = compact_index(work, new_root, cfg)
    assert p2.meta()["N"] == paths.meta()["N"] - 2
    assert not (Path(p2.root) / "deletes.parquet").is_file()
    s2 = IndexSearcher(p2.root, cfg)
    oracle = OracleIndex(_all_docs(p2), cfg, id_column="doc_id")
    for qq in QUERIES:
        assert s2.search(qq, k=10) == oracle.search(qq, k=10), qq
    # compacted layout is range-partitioned (preassigned ids): fetch_docs
    # must NOT bit-address partitions (regression: review finding)
    assert p2.meta().get("id_layout") == "preassigned"
    hits2 = s2.search("parse buffer", k=5)
    docs_map = s2.fetch_docs([d for d, _ in hits2])
    all_docs = dict(zip(_all_docs(p2).column("doc_id").to_pylist(),
                        _all_docs(p2).column("content").to_pylist()))
    for d, _ in hits2:
        assert docs_map[d] == all_docs[d]


def test_readd_base_corpus_is_noop(inc_index):
    """The base build is generation 1 in the registry: re-adding the
    ORIGINAL corpus must not duplicate it (review finding)."""
    paths, cfg, _ = inc_index
    before = json.loads(Path(paths.meta_path).read_text())
    p2 = add_documents(Path(paths.root).parent / "c1", paths.root, cfg)
    after = json.loads(Path(p2.meta_path).read_text())
    assert after == before


def test_partcount_mismatch_guard(inc_index):
    paths, cfg, _ = inc_index
    bad = IndexConfig(num_doc_parts=8, num_term_parts=8,
                      store_positions=True)
    with pytest.raises(ValueError, match="num_doc_parts"):
        add_documents("/tmp/nonexistent", paths.root, bad)
    bad2 = IndexConfig(num_doc_parts=4, num_term_parts=8,
                       store_positions=True, doc_id_part_bits=20)
    with pytest.raises(ValueError, match="doc_id_part_bits"):
        add_documents("/tmp/nonexistent", paths.root, bad2)
    # ranking config rides with the index too: a generation ingested
    # with a different tie_break_column would rank inconsistently
    bad3 = IndexConfig(num_doc_parts=4, num_term_parts=8,
                       store_positions=True, tie_break_column="ts")
    with pytest.raises(ValueError, match="tie_break_column"):
        add_documents("/tmp/nonexistent", paths.root, bad3)


def test_crashed_ingest_resumes(ray_session, tmp_path):
    """An ingest that dies mid-merge leaves SOME partitions merged (new
    fingerprint) and others still pre-ingest, with index_meta not yet
    rewritten. Reconstruct exactly that state from snapshots, then
    re-run the ingest: it must merge ONLY the unfinished partitions and
    converge bit-for-bit with a never-crashed ingest."""
    c1 = generate_corpus(900, tmp_path / "c1", seed=11, n_files=3)
    c2 = generate_corpus(400, tmp_path / "c2", seed=2222, n_files=2)
    cfg = IndexConfig(num_doc_parts=4, num_term_parts=8)

    crashy = build_index(c1, tmp_path / "crashy", cfg)
    snap = tmp_path / "snap"
    shutil.copytree(crashy.root, snap)          # pre-ingest snapshot
    add_documents(c2, tmp_path / "crashy", cfg)
    done = tmp_path / "done"
    shutil.copytree(crashy.root, done)          # clean post-ingest state

    # crash state: roll back 3 postings parts + 1 doc_meta shard + meta
    for sub, parts in (("postings", (1, 5)), ("dictionary", (1, 5)),
                       ("doc_meta", (9,))):
        for q in parts:
            for suffix in (f"part-{q:05d}.parquet",
                           f"part-{q:05d}.manifest.json"):
                shutil.copy2(snap / sub / suffix,
                             Path(crashy.root) / sub / suffix)
    shutil.copy2(snap / "index_meta.json",
                 Path(crashy.root) / "index_meta.json")
    assert json.loads(Path(crashy.meta_path).read_text())["generation"] == 1

    merged_before = {
        f.name: f.stat().st_mtime_ns
        for f in (Path(crashy.root) / "postings").glob("part-*.parquet")}
    add_documents(c2, tmp_path / "crashy", cfg)            # resume
    merged_after = {
        f.name: f.stat().st_mtime_ns
        for f in (Path(crashy.root) / "postings").glob("part-*.parquet")}
    rewritten = {n for n in merged_after
                 if merged_after[n] != merged_before[n]}
    assert rewritten == {"part-00001.parquet", "part-00005.parquet"}

    m_clean = json.loads((done / "index_meta.json").read_text())
    m_crash = json.loads(Path(crashy.meta_path).read_text())
    for key in ("N", "total_len", "n_terms", "n_postings", "generation"):
        assert m_clean[key] == m_crash[key], key
    s_clean = IndexSearcher(str(done), cfg)
    s_crash = IndexSearcher(crashy.root, cfg)
    for q in QUERIES:
        assert s_clean.search(q, k=10) == s_crash.search(q, k=10), q
    assert s_clean.df_map() == s_crash.df_map()


def test_orphan_ingest_detected(inc_index, tmp_path):
    """Partitions stamped by an unfinished ingest of ANOTHER source must
    block new ingests (their merged segments cannot be rolled back)."""
    paths, cfg, _ = inc_index
    work = tmp_path / "idx_orphan"
    shutil.copytree(paths.root, work)
    mf = sorted((work / "postings").glob("part-*.manifest.json"))[0]
    m = json.loads(mf.read_text())
    m["fingerprint"] = "deadbeef" * 4
    mf.write_text(json.dumps(m))
    c3 = generate_corpus(50, tmp_path / "c3", seed=9, n_files=1)
    with pytest.raises(RuntimeError, match="UNFINISHED"):
        add_documents(c3, work, cfg)


def test_legacy_source_tag_reingest_is_noop(inc_index):
    """Generations registered before the source tag grew its footer
    hash carry (name, size)-only fingerprints; re-adding such a source
    must resolve to 'already ingested', not re-ingest (ADVICE r3)."""
    from searchengine_ray.pipelines.build import (_config_fingerprint,
                                                  _legacy_source_tags,
                                                  _source_files)

    paths, cfg, _ = inc_index
    src = Path(paths.root).parent / "c2"
    meta = json.loads(Path(paths.meta_path).read_text())
    # rewrite the c2 generation's registry entry to its LEGACY fingerprint,
    # exactly what an index ingested under the old tag format records
    legacy_fp = _config_fingerprint(
        cfg, _legacy_source_tags(src, _source_files(src))[0])
    rewritten = dict(meta)
    rewritten["generations"] = [
        dict(g, fingerprint=legacy_fp) if g["gen"] == 2 else g
        for g in meta["generations"]]
    rewritten["fingerprint"] = legacy_fp
    Path(paths.meta_path).write_text(json.dumps(rewritten))
    try:
        before_docs = sorted(p.name for p in Path(paths.docs).glob("*.parquet"))
        p2 = add_documents(src, paths.root, cfg)
        after = json.loads(Path(p2.meta_path).read_text())
        assert after["generation"] == 2          # no third generation
        assert sorted(p.name for p in Path(paths.docs).glob("*.parquet")) \
            == before_docs
    finally:
        Path(paths.meta_path).write_text(json.dumps(meta))
