"""Positional postings: codec roundtrip, tokenizer position semantics,
phrase-search correctness vs a brute-force Python oracle."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from searchengine_ray.codec import (PostingBlocks, concat_blocks,
                                    decode_blocks, decode_positions,
                                    encode_segments)
from searchengine_ray.config import IndexConfig
from searchengine_ray.tokenizer import Analyzer


def _blocks_from_enc(enc, seg_i):
    b0, b1 = enc["seg_block_offsets"][seg_i], enc["seg_block_offsets"][seg_i + 1]
    return PostingBlocks(
        enc["doc_stream"][enc["doc_boffsets"][b0]:enc["doc_boffsets"][b1]].tobytes(),
        enc["tf_stream"][enc["tf_boffsets"][b0]:enc["tf_boffsets"][b1]].tobytes(),
        enc["counts"][b0:b1], enc["last_docs"][b0:b1], enc["max_tfs"][b0:b1],
        enc["doc_boffsets"][b0:b1 + 1] - enc["doc_boffsets"][b0],
        enc["tf_boffsets"][b0:b1 + 1] - enc["tf_boffsets"][b0],
        enc["pos_stream"][enc["pos_boffsets"][b0]:enc["pos_boffsets"][b1]].tobytes(),
        enc["pos_boffsets"][b0:b1 + 1] - enc["pos_boffsets"][b0])


def test_codec_positions_roundtrip():
    rng = np.random.default_rng(3)
    # two segments, ragged positions, block_size small to force blocks
    docs = np.concatenate([np.sort(rng.choice(5000, 700, replace=False)),
                           np.sort(rng.choice(5000, 300, replace=False))]).astype(np.int64)
    tfs = rng.integers(1, 6, size=1000).astype(np.int64)
    seg_starts = np.array([0, 700], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(tfs)])
    positions = np.concatenate([np.sort(rng.integers(0, 10_000, size=int(t)))
                                for t in tfs]).astype(np.int64)
    enc = encode_segments(docs, tfs, seg_starts, block_size=64, positions=positions)
    for seg_i, (lo, hi) in enumerate([(0, 700), (700, 1000)]):
        pb = _blocks_from_enc(enc, seg_i)
        d2, t2 = decode_blocks(pb)
        assert np.array_equal(d2, docs[lo:hi])
        assert np.array_equal(t2, tfs[lo:hi])
        p2, o2 = decode_positions(pb)
        assert np.array_equal(p2, positions[offs[lo]:offs[hi]])
        assert np.array_equal(np.diff(o2), tfs[lo:hi])


def test_codec_positions_concat():
    rng = np.random.default_rng(4)
    parts = []
    all_docs, all_pos = [], []
    base = 0
    for _ in range(3):
        n = 50
        docs = (base + np.sort(rng.choice(1000, n, replace=False))).astype(np.int64)
        tfs = rng.integers(1, 4, size=n).astype(np.int64)
        pos = np.concatenate([np.sort(rng.integers(0, 500, size=int(t)))
                              for t in tfs]).astype(np.int64)
        enc = encode_segments(docs, tfs, np.array([0]), block_size=16,
                              positions=pos)
        parts.append(_blocks_from_enc(enc, 0))
        all_docs.append(docs)
        all_pos.append(pos)
        base += 2000
    pb = concat_blocks(parts)
    d2, _ = decode_blocks(pb)
    p2, _ = decode_positions(pb)
    assert np.array_equal(d2, np.concatenate(all_docs))
    assert np.array_equal(p2, np.concatenate(all_pos))


@pytest.mark.parametrize("analyzer", ["simple", "code"])
def test_tokenizer_positions_match_python(analyzer):
    cfg = IndexConfig(analyzer=analyzer, use_stopwords=False)
    a = Analyzer(cfg)
    texts = ["the quick brown fox the quick",
             "parseHTTPResponse_v2 foo_bar foo_bar baz",
             "", "one one one one"]
    ids = np.arange(len(texts), dtype=np.int64)
    codes, docs, tfs, info = a.tokenize_batch(texts, ids, with_positions=True)
    pos = info["positions"]
    offs = np.concatenate([[0], np.cumsum(tfs)])
    # python oracle: raw-token index for every expansion
    want: dict[tuple[int, str], list[int]] = {}
    for d, text in enumerate(texts):
        for j, raw in enumerate(a.raw_tokens(text)):
            for term in a.expand(raw):
                want.setdefault((d, term), []).append(j)
    vocab = info["vocab"]
    for i in range(len(codes)):
        got = pos[offs[i]:offs[i + 1]].tolist()
        assert got == want[(int(docs[i]), vocab[codes[i]])]
        assert len(got) == tfs[i]


def test_phrase_search_end_to_end(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from searchengine_ray.pipelines.build import build_index
    from searchengine_ray.pipelines.query import IndexSearcher

    texts = {
        100: "alpha beta gamma alpha beta",
        101: "beta alpha beta gamma",
        102: "gamma gamma gamma",
        103: "alpha beta",
    }
    tbl = pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "repo": pa.array(["r"] * 4), "path": pa.array([f"{i}" for i in texts]),
        "commit": pa.array([""] * 4), "lang": pa.array(["x"] * 4),
        "content": pa.array(list(texts.values())),
    })
    cfg = IndexConfig(analyzer="simple", use_stopwords=False,
                      store_positions=True, num_doc_parts=2, num_term_parts=4,
                      block_size=2)
    paths = build_index(ray.data.from_arrow(tbl), tmp_path / "idx", cfg,
                        id_column="doc_id", resume=False, source_tag="t")
    s = IndexSearcher(paths, cfg)
    assert s.phrase_search("alpha beta") == [(100, 2), (101, 1), (103, 1)]
    assert s.phrase_search("beta gamma") == [(100, 1), (101, 1)]
    assert s.phrase_search("gamma gamma") == [(102, 2)]      # overlapping
    assert s.phrase_search("alpha beta gamma alpha") == [(100, 1)]
    assert s.phrase_search("gamma alpha") == [(100, 1)]
    assert s.phrase_search("nosuch beta") == []
    assert s.phrase_search("beta alpha beta gamma") == [(101, 1)]
