"""Queries-file source, results sink, spell correction, CLI."""

import subprocess
import sys

from searchengine_ray.functions.spell import correct, edits1
from searchengine_ray.sources.queries_file import parse_queries_text


def test_parse_queries_text():
    text = "1. hash join\n\n3) window agg\nplain text query\n"
    assert parse_queries_text(text) == [
        (1, "hash join"), (3, "window agg"), (4, "plain text query")]


def test_edits1_contains_classic_edits():
    e = edits1("parse")
    assert "parse" not in e or True
    assert "parxe" in e      # replace
    assert "pars" in e       # delete
    assert "parsee" in e     # insert
    assert "prase" in e      # transpose


def test_correct_picks_highest_frequency():
    freq = {"parse": 100, "sparse": 40}.get
    assert correct("parse", lambda w: freq(w, 0)) == "parse"   # known: unchanged
    assert correct("parze", lambda w: freq(w, 0)) == "parse"   # dist-1 fix
    assert correct("zzzzzzz", lambda w: freq(w, 0)) is None


def test_spell_correct_search(t1_index, t1_oracle, small_config):
    from searchengine_ray.pipelines.query import IndexSearcher

    s = IndexSearcher(t1_index, small_config)
    # misspell a common identifier; corrected search == oracle corrected
    got = s.search("parze buffer", 10, spell_correct=True)
    want = t1_oracle.search("parze buffer", 10, spell_correct=True)
    assert got == want
    assert got  # the correction actually found docs


def test_cli_search(ray_session, t1_index, tmp_path):
    """CLI runs in a fresh process (its own ray session)."""
    out = subprocess.run(
        [sys.executable, "-m", "searchengine_ray", "--num-cpus", "2",
         "search", str(t1_index.root), "parse buffer", "-k", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180)
    assert out.returncode == 0, out.stderr[-500:]
    lines = [ln for ln in out.stdout.splitlines() if "\t" in ln]
    assert 1 <= len(lines) <= 3
    assert lines[0].split("\t")[0] == "1"


def test_cli_bool(ray_session, t1_index, small_config):
    """`bool` subcommand == in-process boolean_search, doc for doc."""
    from searchengine_ray.pipelines.query import IndexSearcher

    want = [int(d) for d in
            IndexSearcher(t1_index, small_config).boolean_search(
                "parse -buffer")]
    out = subprocess.run(
        [sys.executable, "-m", "searchengine_ray", "--num-cpus", "2",
         "bool", str(t1_index.root), "parse -buffer"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180)
    assert out.returncode == 0, out.stderr[-500:]
    got = [int(ln) for ln in out.stdout.split()]
    assert got == want


def test_cli_prefix(ray_session, t1_index, small_config):
    """`prefix` subcommand == distributed expansion + OR retrieval."""
    from searchengine_ray.pipelines.docsearch import _expand_prefixes
    from searchengine_ray.pipelines.query import IndexSearcher

    expanded = _expand_prefixes(t1_index, [(0, "pa")], 3)
    docs, n_terms = IndexSearcher(t1_index, small_config).terms_union(
        expanded[0][1].split() if expanded else [])
    want = [(int(d), int(n)) for d, n in zip(docs, n_terms)]
    out = subprocess.run(
        [sys.executable, "-m", "searchengine_ray", "--num-cpus", "2",
         "prefix", str(t1_index.root), "pa", "--max-expansions", "3"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180)
    assert out.returncode == 0, out.stderr[-500:]
    got = [tuple(int(x) for x in ln.split("\t"))
           for ln in out.stdout.splitlines() if "\t" in ln]
    assert got == want
    assert got  # prefix actually matched something at test scale


def test_corpus_file_sources_build_parity(ray_session, tmp_path):
    """An index built from a JSONL dump and from a CSV dump of the same
    rows answers queries identically to one built from the in-memory
    corpus: the format readers are pure ingestion, invisible to
    ranking."""
    import json

    import pandas as pd
    import ray.data

    from searchengine_ray import IndexConfig
    from searchengine_ray.corpus import generate_corpus
    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.pipelines.query import search_queries
    from searchengine_ray.sources.corpus_files import (corpus_from_csv,
                                                       corpus_from_jsonl)

    corpus_dir = generate_corpus(300, tmp_path / "corpus", seed=11,
                                 n_files=2)
    rows = ray.data.read_parquet(corpus_dir).take_all()
    for r in rows:
        r["content"] = r["content"]
    with open(tmp_path / "docs.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    pd.DataFrame(rows).to_csv(tmp_path / "docs.csv", index=False)

    cfg = IndexConfig(num_doc_parts=2, num_term_parts=4)
    qs = [(1, "parse buffer"), (2, "table scan merge")]
    results = {}
    for name, src in (
            ("parquet", ray.data.read_parquet(corpus_dir)),
            ("jsonl", corpus_from_jsonl(tmp_path / "docs.jsonl")),
            ("csv", corpus_from_csv(tmp_path / "docs.csv"))):
        paths = build_index(src, tmp_path / f"idx_{name}", cfg,
                            source_tag=f"test-{name}")
        assert paths.meta()["N"] == len(
            {(r["repo"], r["path"], r["commit"]) for r in rows})
        res = search_queries(paths, qs, k=5, config=cfg,
                             concurrency=(1, 2)).to_pandas()
        results[name] = res.reset_index(drop=True)
    pd.testing.assert_frame_equal(results["parquet"], results["jsonl"])
    pd.testing.assert_frame_equal(results["parquet"], results["csv"])


def test_corpus_jsonl_gzip_parity(ray_session, tmp_path):
    """A gzip-compressed JSONL dump builds an index identical in query
    behavior to the plain JSONL one; mixed gz/plain dirs are refused."""
    import gzip
    import json

    import pandas as pd
    import pytest
    import ray.data

    from searchengine_ray import IndexConfig
    from searchengine_ray.corpus import generate_corpus
    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.pipelines.query import search_queries
    from searchengine_ray.sources.corpus_files import corpus_from_jsonl

    corpus_dir = generate_corpus(200, tmp_path / "corpus", seed=13,
                                 n_files=1)
    rows = ray.data.read_parquet(corpus_dir).take_all()
    gz_dir = tmp_path / "gz"
    gz_dir.mkdir()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with gzip.open(gz_dir / f"docs{i}.jsonl.gz", "wt") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
    with open(tmp_path / "docs.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    cfg = IndexConfig(num_doc_parts=2, num_term_parts=4)
    qs = [(1, "parse buffer"), (2, "table scan merge")]
    results = {}
    for name, src in (("plain", corpus_from_jsonl(tmp_path / "docs.jsonl")),
                      ("gz", corpus_from_jsonl(gz_dir))):
        paths = build_index(src, tmp_path / f"idx_{name}", cfg,
                            source_tag=f"gz-test-{name}")
        res = search_queries(paths, qs, k=5, config=cfg,
                             concurrency=(1, 2)).to_pandas()
        results[name] = res.reset_index(drop=True)
    pd.testing.assert_frame_equal(results["plain"], results["gz"])

    (gz_dir / "extra.jsonl").write_text('{"content": "plain row"}\n')
    with pytest.raises(ValueError, match="mixed"):
        corpus_from_jsonl(gz_dir)


def test_cli_grep_egrep(ray_session):
    """`grep`/`egrep` == a DuckDB recompute over the raw corpus, row
    for row (the trigram index path must be invisible to answers)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = subprocess.run(
        [sys.executable, "-m", "searchengine_ray", "--num-cpus", "2",
         "grep", sf, "merge batch"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr[-500:]
    got = [tuple(map(int, ln.split("\t")))
           for ln in out.stdout.splitlines() if "\t" in ln]
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT doc_id,
               (length(text) - length(replace(text, 'merge batch', '')))
                 // length('merge batch') AS n,
               position('merge batch' IN text) AS pos
        FROM '{sf}/documents.parquet'
        WHERE position('merge batch' IN text) > 0 ORDER BY doc_id
    """).fetchall()
    assert got == [(int(d), int(n), int(p)) for d, n, p in want]
    assert len(got) > 0

    out = subprocess.run(
        [sys.executable, "-m", "searchengine_ray", "--num-cpus", "2",
         "egrep", sf, "slow query[a-z ]{0,10}"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr[-500:]
    rows = [ln.split("\t") for ln in out.stdout.splitlines() if "\t" in ln]
    want = con.sql(f"""
        SELECT doc_id, len(regexp_extract_all(text, 'slow query[a-z ]{{0,10}}')),
               regexp_extract(text, 'slow query[a-z ]{{0,10}}')
        FROM '{sf}/documents.parquet'
        WHERE len(regexp_extract_all(text, 'slow query[a-z ]{{0,10}}')) > 0
        ORDER BY doc_id
    """).fetchall()
    assert [(int(r[0]), int(r[1]), r[2]) for r in rows] == \
        [(int(d), int(n), m) for d, n, m in want]
    assert len(rows) > 0
