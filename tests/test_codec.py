"""VByte / block codec round-trips (SURVEY §5 unit strategy #1)."""

import numpy as np
import pytest

from searchengine_ray.codec import (PostingBlocks, concat_blocks, decode_blocks,
                                    decode_single_block, encode_blocks,
                                    encode_segments, vbyte_decode, vbyte_encode)


def test_vbyte_roundtrip_edge_values():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**62, 2**63 + 5],
                 dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(v)), v)


def test_vbyte_empty():
    assert vbyte_encode(np.empty(0, np.uint64)) == b""
    assert len(vbyte_decode(b"")) == 0


@pytest.mark.parametrize("seed", range(5))
def test_block_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 700))
    docs = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 1000, size=n).astype(np.int64)
    bs = int(rng.integers(1, 200))
    pb = encode_blocks(docs, tfs, bs)
    d2, t2 = decode_blocks(pb)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs.astype(np.int32))
    for i in range(pb.n_blocks):
        db, tb = decode_single_block(pb, i)
        s, e = i * bs, min((i + 1) * bs, n)
        assert np.array_equal(db, docs[s:e])
        assert np.array_equal(tb, tfs[s:e].astype(np.int32))


def test_concat_equals_whole():
    rng = np.random.default_rng(99)
    docs = np.sort(rng.choice(10**7, size=500, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 9, size=500).astype(np.int64)
    a = encode_blocks(docs[:256], tfs[:256], 128)
    b = encode_blocks(docs[256:], tfs[256:], 128)
    d, t = decode_blocks(concat_blocks([a, b]))
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs.astype(np.int32))


def test_encode_segments_matches_per_segment_encoding():
    rng = np.random.default_rng(3)
    segs = []
    for _ in range(40):
        n = int(rng.integers(1, 300))
        docs = np.sort(rng.choice(10**6, n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 40, n).astype(np.int64)
        segs.append((docs, tfs))
    all_docs = np.concatenate([s[0] for s in segs])
    all_tfs = np.concatenate([s[1] for s in segs])
    seg_starts = np.concatenate(
        [[0], np.cumsum([len(s[0]) for s in segs])[:-1]]).astype(np.int64)
    enc = encode_segments(all_docs, all_tfs, seg_starts, block_size=64)
    sbo = enc["seg_block_offsets"]
    for i, (docs, tfs) in enumerate(segs):
        b0, b1 = sbo[i], sbo[i + 1]
        d0, d1 = enc["doc_boffsets"][b0], enc["doc_boffsets"][b1]
        t0, t1 = enc["tf_boffsets"][b0], enc["tf_boffsets"][b1]
        pb = PostingBlocks(
            enc["doc_stream"][d0:d1].tobytes(), enc["tf_stream"][t0:t1].tobytes(),
            enc["counts"][b0:b1], enc["last_docs"][b0:b1], enc["max_tfs"][b0:b1],
            enc["doc_boffsets"][b0:b1 + 1] - d0, enc["tf_boffsets"][b0:b1 + 1] - t0)
        dd, tt = decode_blocks(pb)
        assert np.array_equal(dd, docs)
        assert np.array_equal(tt, tfs.astype(np.int32))
        ref = encode_blocks(docs, tfs, 64)
        assert ref.doc_bytes == pb.doc_bytes
        assert ref.tf_bytes == pb.tf_bytes
