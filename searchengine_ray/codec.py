"""Posting-list compression: delta + variable-byte (VByte), block-sliced.

Replaces the reference's pickled Python-list posting lists
(``/root/reference/indexer.py:105-120``, ``indexer.py:564-578``) with the
classic compressed layout from the IR literature:

- doc ids are sorted ascending per term, delta-encoded, and VByte
  compressed (7 data bits per byte, high bit = continuation, little-
  endian groups);
- postings are cut into independent *blocks* of ``block_size`` entries.
  Every block is self-contained (its first delta is the absolute first
  doc id), so a block can be decoded — or skipped — without touching its
  neighbours. Per-block side arrays (entry count, last doc id, max tf,
  byte offsets) are exactly the skip + block-max metadata that block-max
  WAND needs (Ding & Suel, "Faster top-k document retrieval using
  block-max indexes", SIGIR 2011).

All encode/decode paths are vectorized numpy — no per-posting Python
loops. The layout is designed so that blocks from *different* pipeline
segments (different Arrow batches, different doc-bucket shards) can be
concatenated byte-wise without re-encoding: merging partial postings is
pure bytes concatenation plus side-array concatenation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def vbyte_encode_with_sizes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """VByte-encode an array; return (byte_stream:uint8[], nbytes_per_value:int64[])."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    maxlen = int(nbytes.max())
    for j in range(maxlen):
        mask = nbytes > j
        idx = starts[mask] + j
        byte = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte.astype(np.uint8) | cont
    return out, nbytes


def vbyte_encode(values: np.ndarray) -> bytes:
    """VByte-encode an array of non-negative integers (vectorized)."""
    out, _ = vbyte_encode_with_sizes(values)
    return out.tobytes()


def vbyte_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a VByte stream back to a uint64 array.

    Fully vectorized, no masked-assignment loop: every byte's payload is
    shifted by 7x its rank within its value, then per-value sums come
    from one ``np.add.reduceat`` (bit ranges are disjoint, so sum ==
    bitwise-or). ~15x faster than the per-byte-position masked loop on
    multi-million-posting lists.
    """
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(b < 128)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    ranks = (np.arange(len(b), dtype=np.int64)
             - np.repeat(starts, lengths)).astype(np.uint64)
    contrib = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * ranks)
    return np.add.reduceat(contrib, starts)


@dataclass
class PostingBlocks:
    """Block-sliced compressed postings for one (term, doc-bucket) slice.

    ``doc_bytes`` / ``tf_bytes`` are the concatenated per-block VByte
    streams; the parallel arrays describe each block. Blocks are
    independent: ``doc_bytes[doc_offsets[i]:doc_offsets[i+1]]`` decodes
    on its own (first delta is absolute).
    """

    doc_bytes: bytes
    tf_bytes: bytes
    counts: np.ndarray       # int32  — postings per block
    last_docs: np.ndarray    # int64  — last (max) doc id per block
    max_tfs: np.ndarray      # int32  — max tf per block (block-max for WAND)
    doc_offsets: np.ndarray  # int64  — start byte of each block in doc_bytes (+ end sentinel)
    tf_offsets: np.ndarray   # int64  — start byte of each block in tf_bytes (+ end sentinel)
    # optional positions stream (store_positions indexes): per posting,
    # its tf positions, delta+VByte, first position absolute per posting
    pos_bytes: bytes | None = None
    pos_offsets: np.ndarray | None = None  # int64 — per-block byte starts (+ sentinel)

    @property
    def n_postings(self) -> int:
        return int(self.counts.sum())

    @property
    def n_blocks(self) -> int:
        return len(self.counts)


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray, block_size: int = 128) -> PostingBlocks:
    """Compress a docid-sorted posting slice into independent blocks.

    ``doc_ids`` must be strictly increasing (one posting per doc per
    term — the reference enforces the same uniqueness via its per-doc
    term dict, ``parser_module.py:204-241``).
    """
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    if n == 0:
        z64 = np.zeros(1, dtype=np.int64)
        return PostingBlocks(b"", b"", np.zeros(0, np.int32), np.zeros(0, np.int64),
                             np.zeros(0, np.int32), z64, z64.copy())
    n_blocks = (n + block_size - 1) // block_size
    # deltas: within-block diffs; each block's first value is absolute.
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
    block_starts = np.arange(0, n, block_size)
    deltas[block_starts] = doc_ids[block_starts].astype(np.uint64)  # absolute block heads

    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    counts = np.empty(n_blocks, dtype=np.int32)
    last_docs = np.empty(n_blocks, dtype=np.int64)
    max_tfs = np.empty(n_blocks, dtype=np.int32)
    for i, s in enumerate(block_starts):
        e = min(s + block_size, n)
        doc_chunks.append(vbyte_encode(deltas[s:e]))
        tf_chunks.append(vbyte_encode(tfs[s:e]))
        counts[i] = e - s
        last_docs[i] = doc_ids[e - 1]
        max_tfs[i] = tfs[s:e].max()
    doc_offsets = np.zeros(n_blocks + 1, dtype=np.int64)
    tf_offsets = np.zeros(n_blocks + 1, dtype=np.int64)
    np.cumsum([len(c) for c in doc_chunks], out=doc_offsets[1:])
    np.cumsum([len(c) for c in tf_chunks], out=tf_offsets[1:])
    return PostingBlocks(b"".join(doc_chunks), b"".join(tf_chunks),
                         counts, last_docs, max_tfs, doc_offsets, tf_offsets)


def decode_blocks(pb: PostingBlocks) -> tuple[np.ndarray, np.ndarray]:
    """Decode all blocks back to (doc_ids:int64, tfs:int32), sorted ascending."""
    if pb.n_postings == 0:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    deltas = vbyte_decode(pb.doc_bytes).astype(np.int64)
    tfs = vbyte_decode(pb.tf_bytes).astype(np.int32)
    starts = np.cumsum(pb.counts.astype(np.int64)) - pb.counts
    return _segmented_cumsum(deltas, starts), tfs


def _segmented_cumsum(deltas: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Cumulative sum restarted at each block start (vectorized).

    Block heads are absolute values, so a global cumsum double-counts.
    Standard segmented-cumsum trick: take the global cumsum, then at each
    segment head subtract (going forward) the prefix accumulated before
    that head.
    """
    g = np.cumsum(deltas.astype(np.int64))
    carry = np.zeros(len(deltas), dtype=np.int64)
    if len(starts) > 1:
        heads = starts[1:]
        # prefix before each head, minus prefix already cancelled by earlier carries
        prev = g[heads - 1]
        carry[heads] = np.diff(np.concatenate([[0], prev]))
    return g - np.cumsum(carry)


def decode_single_block(pb: PostingBlocks, i: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block independently (the WAND skip path)."""
    db = pb.doc_bytes[pb.doc_offsets[i]:pb.doc_offsets[i + 1]]
    tb = pb.tf_bytes[pb.tf_offsets[i]:pb.tf_offsets[i + 1]]
    deltas = vbyte_decode(db).astype(np.int64)
    return np.cumsum(deltas), vbyte_decode(tb).astype(np.int32)


def concat_blocks(parts: list[PostingBlocks]) -> PostingBlocks:
    """Merge block sets with ascending, non-overlapping doc ranges.

    This is the whole "multi-way posting merge": because blocks are
    self-contained, merging partial postings produced by different
    pipeline segments is byte concatenation — the reference's 230-line
    k-way pickle merge (``indexer.py:329-554``) collapses into this.
    Callers guarantee range order (segments are keyed by their first doc
    id before concatenation).
    """
    parts = [p for p in parts if p.n_blocks > 0]
    if not parts:
        return encode_blocks(np.empty(0, np.int64), np.empty(0, np.int64))
    if len(parts) == 1:
        return parts[0]
    doc_sizes = np.array([len(p.doc_bytes) for p in parts], dtype=np.int64)
    tf_sizes = np.array([len(p.tf_bytes) for p in parts], dtype=np.int64)
    doc_bases = np.concatenate([[0], np.cumsum(doc_sizes)[:-1]])
    tf_bases = np.concatenate([[0], np.cumsum(tf_sizes)[:-1]])
    doc_offsets = np.concatenate(
        [p.doc_offsets[:-1] + doc_bases[i] for i, p in enumerate(parts)]
        + [np.array([doc_sizes.sum()], dtype=np.int64)])
    tf_offsets = np.concatenate(
        [p.tf_offsets[:-1] + tf_bases[i] for i, p in enumerate(parts)]
        + [np.array([tf_sizes.sum()], dtype=np.int64)])
    def _cat(chunks):
        if any(isinstance(c, np.ndarray) for c in chunks):
            return np.concatenate([np.frombuffer(c, dtype=np.uint8)
                                   if not isinstance(c, np.ndarray) else c
                                   for c in chunks])
        return b"".join(chunks)

    pos_bytes = None
    pos_offsets = None
    if all(p.pos_bytes is not None for p in parts):
        pos_sizes = np.array([len(p.pos_bytes) for p in parts], dtype=np.int64)
        pos_bases = np.concatenate([[0], np.cumsum(pos_sizes)[:-1]])
        pos_offsets = np.concatenate(
            [p.pos_offsets[:-1] + pos_bases[i] for i, p in enumerate(parts)]
            + [np.array([pos_sizes.sum()], dtype=np.int64)])
        pos_bytes = _cat([p.pos_bytes for p in parts])
    return PostingBlocks(
        _cat([p.doc_bytes for p in parts]),
        _cat([p.tf_bytes for p in parts]),
        np.concatenate([p.counts for p in parts]),
        np.concatenate([p.last_docs for p in parts]),
        np.concatenate([p.max_tfs for p in parts]),
        doc_offsets, tf_offsets, pos_bytes, pos_offsets)


def decode_positions(pb: PostingBlocks) -> tuple[np.ndarray, np.ndarray]:
    """Decode the positions stream: (flat positions, per-posting offsets).

    Posting ``i`` (in ascending doc order across all blocks) owns
    ``positions[offs[i]:offs[i+1]]``, ascending. Requires the index to
    have been built with ``store_positions=True``.
    """
    if pb.pos_bytes is None:
        raise ValueError("index was built without store_positions")
    if pb.n_postings == 0:
        return np.empty(0, np.int64), np.zeros(1, np.int64)
    tfs = vbyte_decode(pb.tf_bytes).astype(np.int64)
    offs = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=offs[1:])
    pdeltas = vbyte_decode(pb.pos_bytes).astype(np.int64)
    return _segmented_cumsum(pdeltas, offs[:-1]), offs


def encode_segments(doc_ids: np.ndarray, tfs: np.ndarray, seg_starts: np.ndarray,
                    block_size: int = 128, positions: np.ndarray | None = None
                    ) -> dict:
    """Compress MANY posting segments in one vectorized pass.

    ``doc_ids``/``tfs`` hold the postings of a whole tokenizer batch,
    sorted by (segment, doc_id); ``seg_starts`` marks where each
    (term, doc-bucket) segment begins. Blocks restart at every segment
    boundary; each block's first delta is absolute (self-contained).

    Returns a dict of numpy arrays describing, per segment:
      seg_block_offsets  — [n_seg+1] block-index range of the segment
    and per block: counts, last_docs, max_tfs, plus the two shared byte
    streams ``doc_stream``/``tf_stream`` with per-block byte offsets
    ``doc_boffsets``/``tf_boffsets`` ([n_blocks+1], global).

    This is the per-batch "partial postings" producer: the reference's
    in-heap postingDict + spill (``indexer.py:130-168``) becomes this
    single numpy pass, and its k-way merge becomes byte concatenation of
    these segments downstream.
    """
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    seg_starts = np.ascontiguousarray(seg_starts, dtype=np.int64)
    n_seg = len(seg_starts)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return {"seg_block_offsets": np.zeros(n_seg + 1, np.int64),
                "counts": z.astype(np.int32), "last_docs": z.copy(),
                "max_tfs": z.astype(np.int32),
                "doc_stream": np.empty(0, np.uint8), "tf_stream": np.empty(0, np.uint8),
                "doc_boffsets": np.zeros(1, np.int64), "tf_boffsets": np.zeros(1, np.int64),
                "pos_stream": np.empty(0, np.uint8), "pos_boffsets": np.zeros(1, np.int64)}
    seg_ends = np.empty(n_seg, dtype=np.int64)
    seg_ends[:-1] = seg_starts[1:]
    seg_ends[-1] = n
    seg_lens = seg_ends - seg_starts
    nblocks_per_seg = (seg_lens + block_size - 1) // block_size
    total_blocks = int(nblocks_per_seg.sum())
    # ragged arange: block starts within each segment
    seg_block_offsets = np.zeros(n_seg + 1, dtype=np.int64)
    np.cumsum(nblocks_per_seg, out=seg_block_offsets[1:])
    rep_seg_start = np.repeat(seg_starts, nblocks_per_seg)
    within = (np.arange(total_blocks) -
              np.repeat(seg_block_offsets[:-1], nblocks_per_seg))
    block_starts = rep_seg_start + within * block_size
    block_ends = np.minimum(block_starts + block_size, np.repeat(seg_ends, nblocks_per_seg))
    counts = (block_ends - block_starts).astype(np.int32)
    # deltas with absolute block heads
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = doc_ids[0]
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
    deltas[block_starts] = doc_ids[block_starts].astype(np.uint64)
    doc_stream, doc_nbytes = vbyte_encode_with_sizes(deltas)
    tf_stream, tf_nbytes = vbyte_encode_with_sizes(tfs)
    doc_bsizes = np.add.reduceat(doc_nbytes, block_starts)
    tf_bsizes = np.add.reduceat(tf_nbytes, block_starts)
    doc_boffsets = np.zeros(total_blocks + 1, dtype=np.int64)
    tf_boffsets = np.zeros(total_blocks + 1, dtype=np.int64)
    np.cumsum(doc_bsizes, out=doc_boffsets[1:])
    np.cumsum(tf_bsizes, out=tf_boffsets[1:])
    out = {"seg_block_offsets": seg_block_offsets,
           "counts": counts,
           "last_docs": doc_ids[block_ends - 1],
           "max_tfs": np.maximum.reduceat(tfs, block_starts).astype(np.int32),
           "doc_stream": doc_stream, "tf_stream": tf_stream,
           "doc_boffsets": doc_boffsets, "tf_boffsets": tf_boffsets}
    if positions is not None:
        # per-posting delta encoding: first position absolute, so any
        # posting (and hence any block) decodes independently
        positions = np.ascontiguousarray(positions, dtype=np.int64)
        posting_pos_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs, out=posting_pos_offs[1:])
        pdeltas = np.empty(len(positions), dtype=np.uint64)
        if len(positions):
            pdeltas[0] = positions[0]
            pdeltas[1:] = (positions[1:] - positions[:-1]).astype(np.uint64)
            heads = posting_pos_offs[:-1]
            pdeltas[heads] = positions[heads].astype(np.uint64)
        pos_stream, pos_nbytes = vbyte_encode_with_sizes(pdeltas)
        pos_block_starts = posting_pos_offs[block_starts]
        pos_bsizes = np.add.reduceat(pos_nbytes, pos_block_starts) \
            if len(pos_nbytes) else np.zeros(total_blocks, np.int64)
        pos_boffsets = np.zeros(total_blocks + 1, dtype=np.int64)
        np.cumsum(pos_bsizes, out=pos_boffsets[1:])
        out["pos_stream"] = pos_stream
        out["pos_boffsets"] = pos_boffsets
    return out
