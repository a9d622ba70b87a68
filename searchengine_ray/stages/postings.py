"""Phases 2+3 — tokenize, partial postings, and the posting merge.

The reference builds postings with an in-heap ``postingDict`` spilled to
term-sorted pickle segments every 200K terms (``/root/reference/
indexer.py:19,130-168``) and then a 230-line k-way external merge
(``indexer.py:329-554``). Here the same computation is two Ray Data
stages:

1. ``PartialPostings`` (``map_batches``, stateless-per-batch but with
   per-worker analyzer state): tokenize a batch of docs, sort the
   (term, doc) triplets, and compress each (term, doc-bucket) run into
   self-contained VByte blocks — ONE vectorized numpy pass
   (``codec.encode_segments``). Output rows are already-compressed
   posting *segments*, so the shuffle that follows moves compressed
   bytes, not raw triplets.

2. ``MergePostingsPartWriter`` (``groupby("part").map_groups``): the
   single all-to-all exchange. ``part = hash(term) % num_term_parts``,
   so each group holds complete postings for its term subset. Because
   every segment covers a disjoint ascending doc-id range (batches are
   contiguous slices of doc-sorted partition files), merging is a sort
   by (term, bucket, first_doc) + byte concatenation — no decode.

Skew (SURVEY §4): a stop-word-heavy term's postings are split across
``doc_id // doc_bucket_size`` buckets into separate index rows, so no
single row/group exceeds one bucket of postings; partitions stay
balanced because each part holds many terms.
"""

from __future__ import annotations

import hashlib
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from searchengine_ray.codec import encode_segments
from searchengine_ray.config import IndexConfig
from searchengine_ray.state.manifest import write_partition_atomic
from searchengine_ray.tokenizer import Analyzer


def term_hash64(term: str) -> int:
    """Stable 64-bit term hash — stored in the index so query-time
    loaders never re-hash the dictionary (it dominates load time at
    long-tail vocabularies)."""
    return int.from_bytes(
        hashlib.blake2b(term.encode("utf-8"), digest_size=8).digest(), "big")


def term_part(term: str, num_parts: int) -> int:
    return term_hash64(term) % num_parts


def part_file_name(part: int) -> str:
    """Canonical partition file name — the single definition every
    writer AND reader uses, so direct part addressing (J2 pruning)
    can never drift from the on-disk naming."""
    return f"part-{part:05d}.parquet"


def part_id_of(path) -> int:
    """Inverse of ``part_file_name`` for a path-like; raises ValueError
    on files that do not follow the convention (callers should skip
    or fall back to an unpruned read, never guess)."""
    stem = Path(path).stem
    prefix, sep, num = stem.partition("-")
    if prefix != "part" or not sep or not num.isdigit():
        raise ValueError(f"not a part file: {path}")
    return int(num)


def _large_binary_from(stream: np.ndarray, offsets: np.ndarray) -> pa.LargeBinaryArray:
    """Zero-copy large_binary column from a byte stream + row offsets."""
    return pa.Array.from_buffers(
        pa.large_binary(), len(offsets) - 1,
        [None, pa.py_buffer(np.ascontiguousarray(offsets, dtype=np.int64)),
         pa.py_buffer(stream)])


def _large_list(values: pa.Array, offsets: np.ndarray) -> pa.LargeListArray:
    return pa.LargeListArray.from_arrays(
        pa.array(np.ascontiguousarray(offsets, dtype=np.int64), pa.int64()), values)


SEGMENT_SCHEMA = pa.schema([
    ("part", pa.int64()), ("term", pa.string()), ("term_hash", pa.uint64()),
    ("bucket", pa.int64()),
    ("first_doc", pa.int64()), ("df", pa.int64()),
    ("counts", pa.large_list(pa.int32())), ("last_docs", pa.large_list(pa.int64())),
    ("max_tfs", pa.large_list(pa.int32())),
    ("doc_sizes", pa.large_list(pa.int64())), ("tf_sizes", pa.large_list(pa.int64())),
    ("pos_sizes", pa.large_list(pa.int64())),
    ("doc_bytes", pa.large_binary()), ("tf_bytes", pa.large_binary()),
    ("pos_bytes", pa.large_binary()),
])


class PartialPostings:
    """Callable class for ``map_batches`` — analyzer state built once per
    worker (reference T1: regexes/stopwords/stemmer per ``Parse()``,
    ``parser_module.py:20-56``)."""

    def __init__(self, config: IndexConfig | None = None):
        self.config = config or IndexConfig()
        self.analyzer = Analyzer(self.config)
        self._part_cache: dict[str, int] = {}

    def _meta_rows(self, doc_ids: np.ndarray, info: dict) -> pa.Table:
        """Per-doc stats as piggyback rows (part >= num_term_parts).

        The tokenizer already computed doc_len/max_tf/n_terms for every
        doc in this batch (a doc is wholly contained in its batch), so
        doc_meta costs ZERO extra tokenization — the rows ride the same
        shuffle and are routed to doc-meta writers by part id. Replaces
        the separate doc-meta pass (2x tokenize) of the naive design.
        """
        P = self.config.num_doc_parts
        # shard PER DOC (not per batch): resume must route a doc to the
        # same meta shard regardless of how batches were sliced
        shards = doc_ids % P
        order = np.argsort(shards, kind="stable")
        sh_sorted = shards[order]
        starts = np.flatnonzero(np.concatenate([[True], sh_sorted[1:] != sh_sorted[:-1]]))
        offs = np.concatenate([starts, [len(doc_ids)]]).astype(np.int64)
        n_rows = len(starts)
        ids_s = doc_ids[order]
        return pa.table({
            "part": pa.array(self.config.num_term_parts + sh_sorted[starts], pa.int64()),
            "term": pa.array([""] * n_rows, pa.string()),
            "term_hash": pa.array(np.zeros(n_rows, np.uint64), pa.uint64()),
            "bucket": pa.array(np.full(n_rows, -1), pa.int64()),
            "first_doc": pa.array(ids_s[starts], pa.int64()),
            "df": pa.array(np.diff(offs), pa.int64()),
            "counts": _large_list(pa.array(info["doc_len"][order], pa.int32()), offs),
            "last_docs": _large_list(pa.array(ids_s, pa.int64()), offs),
            "max_tfs": _large_list(pa.array(info["max_tf"][order], pa.int32()), offs),
            "doc_sizes": _large_list(
                pa.array(info["n_terms"][order].astype(np.int64), pa.int64()), offs),
            "tf_sizes": _large_list(
                pa.array(np.zeros(len(doc_ids), np.int64), pa.int64()), offs),
            "pos_sizes": _large_list(
                pa.array(np.zeros(len(doc_ids), np.int64), pa.int64()), offs),
            "doc_bytes": pa.array([b""] * n_rows, pa.large_binary()),
            "tf_bytes": pa.array([b""] * n_rows, pa.large_binary()),
            "pos_bytes": pa.array([b""] * n_rows, pa.large_binary()),
        }, schema=SEGMENT_SCHEMA)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("content").to_pylist()
        doc_ids = np.asarray(batch.column("doc_id").to_numpy(zero_copy_only=False),
                             dtype=np.int64)
        store_pos = self.config.store_positions
        codes, docs, tfs, info = self.analyzer.tokenize_batch(
            texts, doc_ids, with_positions=store_pos)
        if len(codes) == 0:
            if len(doc_ids) > 0:
                return self._meta_rows(doc_ids, info)
            return SEGMENT_SCHEMA.empty_table()
        vocab = info["vocab"]
        order = np.lexsort((docs, codes))
        positions = None
        if store_pos:
            # ragged gather: permute per-posting position groups to the
            # same (term, doc) order as the postings
            pos_flat = info["positions"]
            offs = np.zeros(len(tfs) + 1, dtype=np.int64)
            np.cumsum(tfs, out=offs[1:])
            starts_g = offs[:-1][order]
            lens_g = tfs[order]
            total = int(lens_g.sum())
            cum = np.zeros(len(lens_g), dtype=np.int64)
            np.cumsum(lens_g[:-1], out=cum[1:])
            within = np.arange(total, dtype=np.int64) - np.repeat(cum, lens_g)
            positions = pos_flat[np.repeat(starts_g, lens_g) + within]
        codes, docs, tfs = codes[order], docs[order], tfs[order]
        buckets = docs // self.config.doc_bucket_size
        change = np.empty(len(codes), dtype=bool)
        change[0] = True
        change[1:] = (codes[1:] != codes[:-1]) | (buckets[1:] != buckets[:-1])
        seg_starts = np.flatnonzero(change)
        enc = encode_segments(docs, tfs, seg_starts, self.config.block_size,
                              positions=positions)
        seg_codes = codes[seg_starts]
        seg_terms = vocab[seg_codes]
        nparts = self.config.num_term_parts
        cache = self._part_cache
        seg_hashes = np.fromiter((cache.get(t) if t in cache else
                                  cache.setdefault(t, term_hash64(t))
                                  for t in seg_terms),
                                 dtype=np.uint64, count=len(seg_terms))
        parts = (seg_hashes % np.uint64(nparts)).astype(np.int64)
        seg_ends = np.concatenate([seg_starts[1:], [len(codes)]])
        sbo = enc["seg_block_offsets"]
        doc_row_offsets = enc["doc_boffsets"][sbo]
        tf_row_offsets = enc["tf_boffsets"][sbo]
        doc_sizes = np.diff(enc["doc_boffsets"])
        tf_sizes = np.diff(enc["tf_boffsets"])
        n_blocks = len(doc_sizes)
        if store_pos:
            pos_row_offsets = enc["pos_boffsets"][sbo]
            pos_sizes = np.diff(enc["pos_boffsets"])
            pos_stream = enc["pos_stream"]
        else:
            pos_row_offsets = np.zeros(len(sbo), dtype=np.int64)
            pos_sizes = np.zeros(n_blocks, dtype=np.int64)
            pos_stream = np.empty(0, dtype=np.uint8)
        segments = pa.table({
            "part": pa.array(parts, pa.int64()),
            "term": pa.array(seg_terms, pa.string()),
            "term_hash": pa.array(seg_hashes, pa.uint64()),
            "bucket": pa.array(buckets[seg_starts], pa.int64()),
            "first_doc": pa.array(docs[seg_starts], pa.int64()),
            "df": pa.array(seg_ends - seg_starts, pa.int64()),
            "counts": _large_list(pa.array(enc["counts"], pa.int32()), sbo),
            "last_docs": _large_list(pa.array(enc["last_docs"], pa.int64()), sbo),
            "max_tfs": _large_list(pa.array(enc["max_tfs"], pa.int32()), sbo),
            "doc_sizes": _large_list(pa.array(doc_sizes, pa.int64()), sbo),
            "tf_sizes": _large_list(pa.array(tf_sizes, pa.int64()), sbo),
            "pos_sizes": _large_list(pa.array(pos_sizes, pa.int64()), sbo),
            "doc_bytes": _large_binary_from(enc["doc_stream"], doc_row_offsets),
            "tf_bytes": _large_binary_from(enc["tf_stream"], tf_row_offsets),
            "pos_bytes": _large_binary_from(pos_stream, pos_row_offsets),
        }, schema=SEGMENT_SCHEMA)
        return pa.concat_tables([segments, self._meta_rows(doc_ids, info)])


def _flat_binary(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data bytes, per-row offsets rebased to 0) of a large_binary column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                         count=len(arr) + 1, offset=arr.offset * 8).copy()
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(offs[-1]))[offs[0]:]
    return data, offs - offs[0]


POSTINGS_SCHEMA = pa.schema([
    ("term", pa.string()), ("term_hash", pa.uint64()), ("bucket", pa.int64()),
    ("df", pa.int64()),
    ("counts", pa.large_list(pa.int32())), ("last_docs", pa.large_list(pa.int64())),
    ("max_tfs", pa.large_list(pa.int32())),
    ("doc_sizes", pa.large_list(pa.int64())), ("tf_sizes", pa.large_list(pa.int64())),
    ("pos_sizes", pa.large_list(pa.int64())),
    ("doc_bytes", pa.large_binary()), ("tf_bytes", pa.large_binary()),
    ("pos_bytes", pa.large_binary()),
])


def segments_from_existing(part: int, table: pa.Table,
                           num_term_parts: int) -> pa.Table:
    """Re-admit an already-merged partition file as segment rows so the
    incremental-ingest reducer can concat it with a new generation's
    segments and rerun the SAME merge. ``first_doc = -1`` sorts the old
    rows before every new segment of the same (term, bucket) — a new
    generation's doc ids are strictly higher (fresh doc parts are the
    high bits), so byte concat keeps postings docid-ascending."""
    n = table.num_rows
    if part >= num_term_parts:
        # doc_meta shard (doc_id, doc_len, max_tf, n_terms) -> ONE
        # synthetic piggyback row in the _meta_rows layout
        offs = np.array([0, n], dtype=np.int64)
        zeros = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "term": pa.array([""], pa.string()),
            "term_hash": pa.array(np.zeros(1, np.uint64), pa.uint64()),
            "bucket": pa.array([-1], pa.int64()),
            "first_doc": pa.array([-1], pa.int64()),
            "df": pa.array([n], pa.int64()),
            "counts": _large_list(
                table.column("doc_len").combine_chunks().cast(pa.int32()), offs),
            "last_docs": _large_list(
                table.column("doc_id").combine_chunks().cast(pa.int64()), offs),
            "max_tfs": _large_list(
                table.column("max_tf").combine_chunks().cast(pa.int32()), offs),
            "doc_sizes": _large_list(
                table.column("n_terms").combine_chunks().cast(pa.int64()), offs),
            "tf_sizes": _large_list(zeros, offs),
            "pos_sizes": _large_list(zeros, offs),
            "doc_bytes": pa.array([b""], pa.large_binary()),
            "tf_bytes": pa.array([b""], pa.large_binary()),
            "pos_bytes": pa.array([b""], pa.large_binary()),
        }, schema=SEGMENT_SCHEMA)
    cols = {name: table.column(name) for name in POSTINGS_SCHEMA.names}
    cols["part"] = pa.array(np.full(n, part), pa.int64())
    cols["first_doc"] = pa.array(np.full(n, -1), pa.int64())
    return pa.table({f.name: cols[f.name] for f in SEGMENT_SCHEMA},
                    schema=SEGMENT_SCHEMA)


class MergePostingsPartWriter:
    """``groupby("part").map_groups`` body: merge one term partition and
    write its postings + dictionary files atomically.

    The entire reference merge (``indexer.py:329-554``) reduces to:
    sort segment rows by (term, bucket, first_doc), concatenate bytes
    and block metadata per (term, bucket), apply the min_df prune
    (reference ``remove_redundant_terms``, ``indexer.py:604-615``).
    """

    def __init__(self, postings_dir: str, dictionary_dir: str,
                 config: IndexConfig, fingerprint: str,
                 doc_meta_dir: str | None = None):
        self.__name__ = 'MergePostingsPartWriter'  # ray map_groups wants a __name__
        self.postings_dir = postings_dir
        self.dictionary_dir = dictionary_dir
        self.doc_meta_dir = doc_meta_dir
        self.config = config
        self.fingerprint = fingerprint

    def _write_doc_meta(self, part: int, group: pa.Table) -> pa.Table:
        """Piggybacked doc-meta rows (part >= num_term_parts): flatten the
        per-batch stat lists into the doc_meta table for this shard."""
        doc_ids = group.column("last_docs").combine_chunks().flatten() \
                       .to_numpy(zero_copy_only=False).astype(np.int64)
        doc_len = group.column("counts").combine_chunks().flatten() \
                       .to_numpy(zero_copy_only=False).astype(np.int32)
        max_tf = group.column("max_tfs").combine_chunks().flatten() \
                      .to_numpy(zero_copy_only=False).astype(np.int32)
        n_terms = group.column("doc_sizes").combine_chunks().flatten() \
                       .to_numpy(zero_copy_only=False).astype(np.int32)
        order = np.argsort(doc_ids, kind="stable")
        out = pa.table({
            "doc_id": pa.array(doc_ids[order], pa.int64()),
            "doc_len": pa.array(doc_len[order], pa.int32()),
            "max_tf": pa.array(max_tf[order], pa.int32()),
            "n_terms": pa.array(n_terms[order], pa.int32()),
        })
        t_w = time.time()
        write_partition_atomic(
            out, Path(self.doc_meta_dir) / part_file_name(part),
            kind="doc_meta", partition=part, fingerprint=self.fingerprint,
            extra={"total_len": int(doc_len.sum())})
        return pa.table({"partition": pa.array([part], pa.int64()),
                         "rows": pa.array([out.num_rows], pa.int64()),
                         "n_terms": pa.array([0], pa.int64()),
                         "n_postings": pa.array([0], pa.int64()),
                         "sort_sec": pa.array([0.0], pa.float64()),
                         "write_sec": pa.array([time.time() - t_w], pa.float64())})

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        if self.doc_meta_dir is not None and part >= self.config.num_term_parts:
            return self._write_doc_meta(part, group.combine_chunks())
        # NOTE: group arrives as a zero-copy concat of the map slices
        # (chunked columns referencing plasma buffers). Do NOT
        # combine_chunks here — that is a full extra pass over the
        # payload, and the reduce wave is memory-bandwidth-bound (the
        # one `take` below is the single gather that materializes rows).
        t_sort = time.time()
        # sort by (term_hash, bucket, first_doc) — an integer lexsort.
        # The 64-bit hash is a bijection-in-practice stand-in for the term
        # string here (same collision budget the query side already
        # accepts), and sorting ints is ~10x cheaper than Arrow's string
        # sort at millions of segment rows per reducer.
        hashes_in = group.column("term_hash").to_numpy(zero_copy_only=False)
        buckets_in = group.column("bucket").to_numpy(zero_copy_only=False)
        first_in = group.column("first_doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((first_in, buckets_in, hashes_in))
        group = group.take(pa.array(order)).combine_chunks()
        hashes = hashes_in[order]
        buckets = buckets_in[order]
        n = len(hashes)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (hashes[1:] != hashes[:-1]) | (buckets[1:] != buckets[:-1])
        row_starts = np.flatnonzero(change)                      # output (term,bucket) rows
        df_seg = group.column("df").to_numpy(zero_copy_only=False)
        df_out = np.add.reduceat(df_seg, row_starts)

        def merge_list(col_name: str, dtype: pa.DataType) -> pa.LargeListArray:
            col = group.column(col_name).combine_chunks()
            values = col.flatten()                                # concatenated in row order
            seg_lens = np.asarray(col.value_lengths().to_numpy(zero_copy_only=False),
                                  dtype=np.int64)
            seg_offs = np.concatenate([[0], np.cumsum(seg_lens)])
            out_offs = np.concatenate([seg_offs[row_starts], [seg_offs[-1]]])
            return _large_list(values, out_offs)

        def merge_binary(col_name: str) -> pa.LargeBinaryArray:
            data, offs = _flat_binary(group.column(col_name))
            out_offs = np.concatenate([offs[row_starts], [offs[-1]]])
            return _large_binary_from(data, out_offs)

        row_starts_arr = pa.array(row_starts)
        out = pa.table({
            "term": group.column("term").take(row_starts_arr),
            "term_hash": pa.array(hashes[row_starts], pa.uint64()),
            "bucket": pa.array(buckets[row_starts], pa.int64()),
            "df": pa.array(df_out, pa.int64()),
            "counts": merge_list("counts", pa.int32()),
            "last_docs": merge_list("last_docs", pa.int64()),
            "max_tfs": merge_list("max_tfs", pa.int32()),
            "doc_sizes": merge_list("doc_sizes", pa.int64()),
            "tf_sizes": merge_list("tf_sizes", pa.int64()),
            "pos_sizes": merge_list("pos_sizes", pa.int64()),
            "doc_bytes": merge_binary("doc_bytes"),
            "tf_bytes": merge_binary("tf_bytes"),
            "pos_bytes": merge_binary("pos_bytes"),
        }, schema=POSTINGS_SCHEMA)

        h_out = hashes[row_starts]
        tchange = np.empty(len(h_out), dtype=bool)
        tchange[0] = True
        tchange[1:] = h_out[1:] != h_out[:-1]
        if self.config.min_df > 1:
            # df per TERM (across buckets) — all of a term's buckets are in this part
            tstarts = np.flatnonzero(tchange)
            term_df = np.add.reduceat(df_out, tstarts)
            term_ok = term_df >= self.config.min_df
            row_ok = np.repeat(term_ok, np.diff(np.concatenate([tstarts, [len(h_out)]])))
            out = out.filter(pa.array(row_ok))
            n_terms = int(term_ok.sum())
            n_postings = int(term_df[term_ok].sum())
        else:
            n_terms = int(tchange.sum())
            n_postings = int(df_out.sum())

        t_write = time.time()
        # the three *_bytes streams are already delta+VByte entropy-coded:
        # snappy over them is a full extra pass of the reduce payload for
        # ~no size win. Keep snappy on the string/metadata leaves.
        comp = {"doc_bytes": "NONE", "tf_bytes": "NONE", "pos_bytes": "NONE",
                "term": "snappy", "term_hash": "snappy", "bucket": "snappy",
                "df": "snappy"}
        for c in ("counts", "last_docs", "max_tfs", "doc_sizes", "tf_sizes",
                  "pos_sizes"):
            comp[f"{c}.list.element"] = "snappy"
        manifest = write_partition_atomic(
            out, Path(self.postings_dir) / part_file_name(part),
            kind="postings", partition=part, fingerprint=self.fingerprint,
            extra={"n_postings": n_postings, "n_terms": n_terms},
            compression=comp)
        dictionary = out.select(["term", "bucket", "df"]).append_column(
            "part", pa.array(np.full(out.num_rows, part), pa.int64()))
        write_partition_atomic(
            dictionary, Path(self.dictionary_dir) / part_file_name(part),
            kind="dictionary", partition=part, fingerprint=self.fingerprint)
        return pa.table({"partition": pa.array([part], pa.int64()),
                         "rows": pa.array([out.num_rows], pa.int64()),
                         "n_terms": pa.array([manifest["n_terms"]], pa.int64()),
                         "n_postings": pa.array([manifest["n_postings"]], pa.int64()),
                         "sort_sec": pa.array([t_write - t_sort], pa.float64()),
                         "write_sec": pa.array([time.time() - t_write], pa.float64())})


def shifted_segments(part: int, table: pa.Table, doc_shift: int,
                     bucket_shift: int, block_size: int) -> pa.Table:
    """Re-admit a FOREIGN index's merged postings partition as segment
    rows with every doc id shifted by ``doc_shift`` (the index-merge
    primitive). Blocks are self-contained (absolute heads, within-block
    deltas), so a constant shift changes ONLY the doc stream's block
    heads and the ``last_docs`` metadata: the tf and positions streams,
    block structure, counts and max_tfs are reused verbatim. The doc
    stream is decoded and re-encoded in one vectorized pass over the
    whole partition with the ORIGINAL block boundaries (each block
    becomes one encode segment), so byte layout stays block-aligned
    with the untouched pos/tf side arrays.

    ``bucket_shift`` must equal doc_shift // doc_bucket_size with
    doc_shift a multiple of the bucket size — then every (term, bucket)
    row maps to exactly one shifted bucket (callers assert this)."""
    from searchengine_ray.codec import (_segmented_cumsum, encode_segments,
                                        vbyte_decode)

    n = table.num_rows
    if n == 0:
        return SEGMENT_SCHEMA.empty_table()
    table = table.combine_chunks()
    counts_col = table.column("counts").combine_chunks()
    all_counts = counts_col.flatten().to_numpy(
        zero_copy_only=False).astype(np.int64)
    row_nblocks = counts_col.value_lengths().to_numpy(
        zero_copy_only=False).astype(np.int64)
    row_block_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_nblocks, out=row_block_offs[1:])
    data, _ = _flat_binary(table.column("doc_bytes"))
    deltas = vbyte_decode(data).astype(np.int64)
    block_post_offs = np.cumsum(all_counts) - all_counts
    ids = _segmented_cumsum(deltas, block_post_offs) + doc_shift
    enc = encode_segments(ids, np.zeros(len(ids), np.int64),
                          block_post_offs, block_size)
    new_doc_sizes = np.diff(enc["doc_boffsets"])
    row_byte_offs = enc["doc_boffsets"][row_block_offs]
    last_col = table.column("last_docs").combine_chunks()
    new_last = pa.array(last_col.flatten().to_numpy(
        zero_copy_only=False).astype(np.int64) + doc_shift, pa.int64())
    first_doc = ids[block_post_offs[row_block_offs[:-1]]]
    return pa.table({
        "part": pa.array(np.full(n, part), pa.int64()),
        "term": table.column("term"),
        "term_hash": table.column("term_hash"),
        "bucket": pa.array(table.column("bucket").to_numpy(
            zero_copy_only=False).astype(np.int64) + bucket_shift, pa.int64()),
        "first_doc": pa.array(first_doc, pa.int64()),
        "df": table.column("df"),
        "counts": table.column("counts"),
        "last_docs": _large_list(new_last, row_block_offs),
        "max_tfs": table.column("max_tfs"),
        "doc_sizes": _large_list(pa.array(new_doc_sizes, pa.int64()),
                                 row_block_offs),
        "tf_sizes": table.column("tf_sizes"),
        "pos_sizes": table.column("pos_sizes"),
        "doc_bytes": _large_binary_from(enc["doc_stream"], row_byte_offs),
        "tf_bytes": table.column("tf_bytes"),
        "pos_bytes": table.column("pos_bytes"),
    }, schema=SEGMENT_SCHEMA)
