"""merge_indexes: two independently built indexes fold into one that is
identical to the add_documents incremental path — postings bytes, block
metadata, dictionary, doc_meta, meta stats and query results."""

import shutil
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from searchengine_ray.config import IndexConfig
from searchengine_ray.corpus import generate_corpus
from searchengine_ray.pipelines.build import (add_documents, build_index,
                                              merge_indexes)

QUERIES = ["parse buffer", "table index", "stream write fast", "zzznope"]


def _cfg():
    return IndexConfig(num_doc_parts=2, num_term_parts=4,
                       store_positions=True)


@pytest.fixture(scope="module")
def merged_pair(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("merge")
    corp_a = generate_corpus(700, tmp / "corpA", seed=11, n_files=3)
    corp_b = generate_corpus(450, tmp / "corpB", seed=22, n_files=2)
    ia = build_index(corp_a, tmp / "ia", _cfg())
    ib = build_index(corp_b, tmp / "ib", _cfg())
    merged = merge_indexes(ia.root, ib.root, tmp / "im")
    # reference: the incremental path over a COPY of A
    ref_root = tmp / "iref"
    shutil.copytree(ia.root, ref_root)
    ref = add_documents(corp_b, ref_root, _cfg())
    return merged, ref


def _read_dir(d):
    files = sorted(Path(d).glob("*.parquet"))
    return {f.name: pq.read_table(f) for f in files}


@pytest.mark.parametrize("section", ["postings", "dictionary", "doc_meta",
                                     "docs"])
def test_merge_sections_bit_identical(merged_pair, section):
    merged, ref = merged_pair
    got = _read_dir(getattr(merged, section))
    want = _read_dir(getattr(ref, section))
    assert sorted(got) == sorted(want)
    for name in want:
        g, w = got[name], want[name]
        assert g.schema.names == w.schema.names, name
        assert g.num_rows == w.num_rows, name
        for col in w.schema.names:
            if col == "sha256" and section == "docs":
                pass
            assert g.column(col).equals(w.column(col)), f"{name}.{col}"


def test_merge_meta_stats(merged_pair):
    merged, ref = merged_pair
    m, r = merged.meta(), ref.meta()
    for k in ("N", "total_len", "avgdl", "n_terms", "n_postings",
              "doc_parts_used"):
        assert m[k] == r[k], k


def test_merge_query_parity(merged_pair):
    from searchengine_ray.pipelines.query import IndexSearcher

    merged, ref = merged_pair
    sm = IndexSearcher(merged.root, _cfg())
    sr = IndexSearcher(ref.root, _cfg())
    for q in QUERIES:
        assert sm.search(q, 10) == sr.search(q, 10), q
    # positions survived the byte-reuse: phrase results identical
    for q in ["parse buffer", "table index"]:
        assert sm.phrase_search(q) == sr.phrase_search(q), q


def test_merge_refuses_mismatched_config(ray_session, tmp_path):
    corp = generate_corpus(120, tmp_path / "c", seed=3, n_files=1)
    ia = build_index(corp, tmp_path / "a", _cfg())
    other = IndexConfig(num_doc_parts=2, num_term_parts=4,
                        store_positions=False)
    ib = build_index(corp, tmp_path / "b", other)
    with pytest.raises(ValueError, match="store_positions"):
        merge_indexes(ia.root, ib.root, tmp_path / "m")


def test_merge_resume_is_noop(merged_pair, tmp_path):
    """Re-running the merge skips every completed partition (manifest
    fingerprints validate) and leaves files untouched."""
    import os

    merged, _ = merged_pair
    before = {str(f): os.path.getmtime(f)
              for f in Path(merged.postings).glob("*.parquet")}
    merge_indexes(Path(merged.root).parent / "ia",
                  Path(merged.root).parent / "ib", merged.root)
    after = {str(f): os.path.getmtime(f)
             for f in Path(merged.postings).glob("*.parquet")}
    assert before == after


def test_ingest_after_merge(merged_pair, tmp_path):
    """A merged index accepts further incremental ingest: the
    synthesized generation registry carries both sources, and a third
    corpus lands as generation 3 with ids above both."""
    from searchengine_ray.pipelines.build import IndexPaths
    from searchengine_ray.pipelines.query import IndexSearcher

    merged, _ = merged_pair
    work = tmp_path / "m3"
    shutil.copytree(merged.root, work)
    corp_c = generate_corpus(150, tmp_path / "corpC", seed=33, n_files=1)
    out = add_documents(corp_c, work, _cfg())
    m = out.meta()
    assert m["N"] == merged.meta()["N"] + 150
    assert m["doc_parts_used"] == merged.meta()["doc_parts_used"] + 2
    assert len(m["generations"]) == 3
    # queries still answer over the full merged+ingested corpus
    s = IndexSearcher(out.root, _cfg())
    assert len(s.search("parse buffer", 10)) > 0
