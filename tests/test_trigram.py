"""Unit tests for the trigram (codesearch) layer: the required-literal
extractor's soundness, gram packing, and the index's pruning
invariants. End-to-end oracle parity runs in test_pipelines.py."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.pipelines.trigram import (
    _code_to_str,
    _gram_codes,
    required_literal,
)


def test_gram_codes_roundtrip():
    text = "hash join"
    codes = _gram_codes(text)
    grams = {text[i:i + 3] for i in range(len(text) - 2)}
    assert {_code_to_str(int(c)) for c in codes} == grams
    # distinct + sorted
    assert len(codes) == len(set(codes.tolist()))
    assert (np.diff(codes) > 0).all()


def test_gram_codes_short_and_unicode():
    assert len(_gram_codes("ab")) == 0
    codes = _gram_codes("héllo")          # non-ASCII code points round-trip
    assert _code_to_str(int(codes[0])) in {"hél", "éll", "llo"}
    assert {_code_to_str(int(c)) for c in codes} == {"hél", "éll", "llo"}


@pytest.mark.parametrize("pat,want", [
    ("[a-z]+ merge batch", " merge batch"),
    ("slow query[a-z ]{0,10}", "slow query"),
    ("customer (?:order|line)", None),        # groups -> no safe literal
    ("a|b", None),                            # alternation
    ("zzz[0-9]+never", "never"),              # longest mandatory run wins
    ("val[a-z]*ue", "val"),                   # 'ue' too short
    ("abc*def", "def"),                       # 'c' quantified: run 'ab' < 3
    ("ab\\dcd", None),                        # escape breaks runs, both < 3
    ("exact literal", "exact literal"),
    ("x{2,3}yzw", "yzw"),
    ("[abc]+", None),                         # nothing literal at all
    # multi-char escapes: \xHH/\uXXXX/\UXXXXXXXX/\N{..}/backref digits
    # would poison the literal run with their hex digits / name tail —
    # the extractor must fall back to full scan (r5 soundness fix).
    ("\\x4141abc", None),
    ("abc\\u0041def", None),
    ("pre\\N{LATIN SMALL LETTER A}post", None),
    ("dup(\\w+)\\1", None),                   # group already bails
    ("oct\\101tal", None),
    ("ab\\ncd", None),                        # single-char escape still breaks runs
    ("left\\nmerge batch", "merge batch"),    # ...but later runs survive
])
def test_required_literal(pat, want):
    assert required_literal(pat) == want


@pytest.mark.parametrize("pat", [
    "[a-z]+ merge batch", "slow query[a-z ]{0,10}", "zzz[0-9]+never",
    "val[a-z]*ue", "abc*def", "x{2,3}yzw",
])
def test_required_literal_is_sound(pat):
    """Every string matching the pattern must CONTAIN the extracted
    literal — the property that makes trigram prefiltering lossless."""
    lit = required_literal(pat)
    assert lit is not None
    rng = np.random.default_rng(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    # fuzz: embed pattern-shaped strings into random noise and check
    hits = 0
    for _ in range(300):
        noise = "".join(rng.choice(list(alphabet), size=30))
        probe = noise[:10] + _example_match(pat, rng) + noise[10:]
        m = re.search(pat, probe)
        if m is None:
            continue
        hits += 1
        assert lit in probe, (pat, lit, probe)
    assert hits > 0


def _example_match(pat: str, rng) -> str:
    """Generate a concrete matching string for the fixed test patterns."""
    if pat == "[a-z]+ merge batch":
        return "xy merge batch"
    if pat == "slow query[a-z ]{0,10}":
        return "slow query" + "ab"[: int(rng.integers(0, 3))]
    if pat == "zzz[0-9]+never":
        return "zzz42never"
    if pat == "val[a-z]*ue":
        return "val" + "x" * int(rng.integers(0, 3)) + "ue"
    if pat == "abc*def":
        return "ab" + "c" * int(rng.integers(0, 4)) + "def"
    if pat == "x{2,3}yzw":
        return "x" * int(rng.integers(2, 4)) + "yzw"
    raise AssertionError(pat)


def test_trigram_shard_invariants(ray_session, tmp_path):
    """The doc-sharded layout's two invariants: every document's grams
    live in exactly ONE shard file (what makes intersection
    shard-local and final), and each shard is gram-sorted (what makes
    scanner row-group statistics prune)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.trigram import ensure_trigram_index

    root = ensure_trigram_index("/root/testdata/sf0.001")
    files = sorted(glob.glob(os.path.join(root, "shard_*.parquet")))
    assert files
    seen: dict[int, str] = {}
    for f in files:
        t = pq.read_table(f, columns=["gram", "doc_id"])
        g = t.column("gram").to_numpy()
        assert (np.diff(g) >= 0).all()        # gram-sorted for row-group stats
        for d in np.unique(t.column("doc_id").to_numpy()).tolist():
            assert d not in seen, (d, f, seen[d])
            seen[d] = f
    assert len(seen) > 0


def test_trigram_cache_invalidation(ray_session, tmp_path):
    """Regenerating DIFFERENT corpus content at the same sf_dir must
    not serve a stale cached index: the cache tag folds in a corpus
    fingerprint (size+mtime), so changed content lands in a new root
    and an unchanged corpus re-serves the same root (r5 ADVICE fix)."""
    import os
    import time

    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.trigram import ensure_trigram_index

    d = tmp_path / "sfx"
    d.mkdir()
    t1 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": pa.array(["alpha beta", "gamma delta"])})
    pq.write_table(t1, str(d / "documents.parquet"))
    root1 = ensure_trigram_index(str(d))
    root1b = ensure_trigram_index(str(d))
    assert root1 == root1b                       # unchanged corpus: cache hit

    time.sleep(0.01)                             # ensure mtime_ns moves
    t2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": pa.array(["epsilon zeta", "ETA theta!!"])})
    pq.write_table(t2, str(d / "documents.parquet"))
    root2 = ensure_trigram_index(str(d))
    assert root2 != root1                        # changed content: new root
    assert os.path.exists(os.path.join(root2, "_DONE"))


def test_trigram_compaction_equivalence(ray_session, tmp_path):
    """Lucene-merge compaction: folding the two-generation shard set
    into ONE file must not change any query answer, and removes the
    raw shards (proving generation folds preserve doc completeness)."""
    import glob
    import os
    import shutil

    from searchengine_ray.pipelines.trigram import (
        compact_trigram_index,
        ensure_trigram_incremental,
        trigram_incremental,
    )

    sf = "/root/testdata/sf0.001"
    before = trigram_incremental(sf).to_pandas().sort_values(
        ["query_id", "doc_id"]).reset_index(drop=True)
    # compact a COPY of the cached two-generation index so other tests
    # still see its per-generation shards
    root = ensure_trigram_incremental(sf)
    work = str(tmp_path / "tri")
    shutil.copytree(root, work)
    assert len(glob.glob(os.path.join(work, "shard_*.parquet"))) >= 2
    compact_trigram_index(work, k=1)      # force the fold at tiny scale
    files = glob.glob(os.path.join(work, "shard_*.parquet"))
    assert files == [os.path.join(work, "shard_c0.parquet")]
    # drive the query path against the compacted layout
    from searchengine_ray.pipelines import trigram as tg

    cand = tg._candidate_pairs(work, tg.SUBSTRING_QUERIES)

    def add_vpart(batch):
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        from searchengine_ray.pipelines.common import int64_col

        return batch.append_column(
            "vpart", int64_col(d % tg._N_VERIFY_PARTS))

    from searchengine_ray.pipelines.common import table_path

    after = cand.map_batches(add_vpart, batch_format="pyarrow") \
        .groupby("vpart").map_groups(
            tg._SubstrVerifyGroup(table_path(sf, "documents"),
                                  tg.SUBSTRING_QUERIES),
            batch_format="pyarrow").filter(expr="n_matches > 0") \
        .to_pandas().sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    assert before.equals(after)


def test_trigram_delete_lifecycle(ray_session):
    """Tombstone deletes: (a) pending tombstones are invisible to
    queries but still physically present in the shards; (b) compaction
    purges them physically and drops the tombstone file; (c) answers
    before and after compaction are identical."""
    import glob
    import os

    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.trigram import (
        _TRI_DEL_MOD,
        ensure_trigram_deleted,
        trigram_delete_compact_search,
        trigram_delete_search,
    )

    sf = "/root/testdata/sf0.001"
    pending = ensure_trigram_deleted(sf, compacted=False)
    assert os.path.exists(os.path.join(pending, "deletes.parquet"))
    # physically present in the pending index
    docs_in_pending = set()
    for f in glob.glob(os.path.join(pending, "shard_*.parquet")):
        docs_in_pending.update(
            pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist())
    assert any(d % _TRI_DEL_MOD == 0 for d in docs_in_pending)

    compacted = ensure_trigram_deleted(sf, compacted=True)
    assert not os.path.exists(os.path.join(compacted, "deletes.parquet"))
    for f in glob.glob(os.path.join(compacted, "shard_*.parquet")):
        ids = pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
        assert all(d % _TRI_DEL_MOD != 0 for d in ids), f

    a = trigram_delete_search(sf).to_pandas() \
        .sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    b = trigram_delete_compact_search(sf).to_pandas() \
        .sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    assert a.equals(b)
    assert (a.doc_id % _TRI_DEL_MOD != 0).all()


def test_trigram_deletes_honored_by_all_faces(ray_session, tmp_path):
    """Every query face sharing `_candidate_pairs` (substring, regex,
    filtered) and the snapshot face must drop tombstoned docs — delete
    a doc from a tiny index and check it vanishes from candidates."""
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.trigram import (
        _candidate_pairs,
        compact_trigram_index,
        delete_trigram_docs,
        ensure_trigram_index,
    )

    d = tmp_path / "sfd"
    d.mkdir()
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["alpha target beta", "target gamma",
                                    "delta epsilon"])})
    pq.write_table(t, str(d / "documents.parquet"))
    root = ensure_trigram_index(str(d))
    pairs = _candidate_pairs(root, [(1, "target")]).take_all()
    assert {r["doc_id"] for r in pairs} == {1, 2}
    n = delete_trigram_docs(root, [2])
    assert n == 1
    pairs = _candidate_pairs(root, [(1, "target")]).take_all()
    assert {r["doc_id"] for r in pairs} == {1}
    # repeated deletes union
    delete_trigram_docs(root, [1, 2])
    pairs = _candidate_pairs(root, [(1, "target")]).take_all()
    assert pairs == []
    # compaction purges and the answers stay identical
    compact_trigram_index(root)
    pairs = _candidate_pairs(root, [(1, "target")]).take_all()
    assert pairs == []
