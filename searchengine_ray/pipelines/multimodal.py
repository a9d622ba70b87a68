"""Multimodal columns: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode kernel* is a
deterministic stub (clearly marked), but the Ray-side plumbing is real
and tested: binary columns stay in ``batch_format="pyarrow"`` end to
end (zero-copy, never through pandas object dtype), decode runs in an
actor pool sized for heavy per-item work, batches are small because
rows are wide.

Layout contract: a multimodal table is ``(item_id:int64,
payload:binary, media_type:string, meta:string-json)``. Here we
synthesize payloads from the documents table (utf-8 bytes) so the
pipeline has real data to move.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from searchengine_ray.pipelines.common import int64_col, read


def _to_payload(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "item_id": batch.column("doc_id"),
        "payload": pa.array([t.encode("utf-8") for t in texts], pa.large_binary()),
        "media_type": pa.array(["application/octet-stream"] * len(texts), pa.string()),
    })


def multimodal_table(sf_dir: str):
    """documents -> the opaque-binary multimodal layout."""
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _to_payload, batch_format="pyarrow", batch_size=256)


def _meta_batch(batch: pa.Table) -> pa.Table:
    payloads = batch.column("payload").to_pylist()
    return pa.table({
        "item_id": batch.column("item_id"),
        "n_bytes": int64_col([len(p) for p in payloads]),
        "sha256": pa.array([hashlib.sha256(p).hexdigest() for p in payloads],
                           pa.string()),
    })


def multimodal_meta(sf_dir: str):
    """(item_id, n_bytes, sha256) over binary payloads — the metadata
    extraction stage every multimodal pipeline starts with."""
    return multimodal_table(sf_dir).map_batches(_meta_batch,
                                                batch_format="pyarrow",
                                                batch_size=256)


def multimodal_meta_sql() -> str:
    # payload == utf-8 bytes of text; strlen() is DuckDB's BYTE length
    # (length() counts characters and would diverge on multibyte text)
    return """
SELECT doc_id AS item_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256
FROM documents
"""


class FakeImageDecoder:
    """Actor-pool decode stage — STUB KERNEL.

    A real deployment replaces ``_decode`` with PIL/ffmpeg/torchvision;
    the actor signature, batch sizing, zero-copy binary input and typed
    output schema are the production shape. The stub derives
    deterministic "dimensions" and a feature vector from the payload
    hash so downstream stages are testable.
    """

    def __init__(self, feature_dim: int = 8, strict: bool = False):
        self.feature_dim = feature_dim
        self.strict = strict

    def _decode(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        if self.strict:
            raise NotImplementedError(
                "image decode requires a codec library not present in this "
                "container; run with strict=False for the deterministic stub")
        # md5 (not blake2b): DuckDB can compute it, so even the STUB
        # kernel is replayed end-to-end by the SQL oracle
        h = hashlib.md5(payload).digest()
        width = 64 + h[0]
        height = 64 + h[1]
        feat = np.frombuffer(h, dtype=np.uint8).astype(np.float64)[: self.feature_dim]
        return width, height, feat / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, feats = [], [], [], []
        for iid, payload in zip(batch.column("item_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            w, h, f = self._decode(payload)
            ids.append(iid); ws.append(w); hs.append(h); feats.append(f)
        return pa.table({
            "item_id": int64_col(ids),
            "width": int64_col(ws),
            "height": int64_col(hs),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float64())),
        })


def image_decode_features(sf_dir: str):
    """The decode/feature-extract pipeline: binary in, typed features
    out, actor pool with small batches (wide rows)."""
    return multimodal_table(sf_dir).map_batches(
        FakeImageDecoder, fn_constructor_args=(8, False),
        batch_format="pyarrow", batch_size=64, concurrency=(1, 2))


class FrameSampler:
    """'Video' frame-sampling stage shape: one input row -> N sampled
    frame rows (flat-map as map_batches). Deterministic stub sampling."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, offs = [], [], []
        for iid, payload in zip(batch.column("item_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            size = max(len(payload), 1)
            for k in range(self.n_frames):
                off = (k * size) // self.n_frames
                ids.append(iid)
                frames.append(k)
                offs.append(off)
        return pa.table({"item_id": int64_col(ids),
                         "frame": int64_col(frames),
                         "byte_offset": int64_col(offs)})


def frame_sample(sf_dir: str, n_frames: int = 4):
    return multimodal_table(sf_dir).map_batches(
        FrameSampler, fn_constructor_args=(n_frames,),
        batch_format="pyarrow", batch_size=128, concurrency=(1, 2))


def frame_sample_sql(n_frames: int = 4) -> str:
    return f"""
SELECT doc_id AS item_id, CAST(k AS BIGINT) AS frame,
       CAST((k * greatest(strlen(text), 1)) // {n_frames} AS BIGINT) AS byte_offset
FROM documents, generate_series(0, {n_frames - 1}) AS t(k)
"""


def image_decode_features_checked(sf_dir: str):
    """The decode pipeline flattened to scalar basis-point feature
    columns — the SQL-comparable face of ``image_decode_features``
    (float-list columns do not hash stably across result frameworks;
    the bp integers do). Proves the WHOLE stub path — payload bytes →
    md5 → dims + features — matches the oracle bit-for-bit."""
    from searchengine_ray.pipelines.common import bp, int64_col

    dim = 8
    ds = image_decode_features(sf_dir)

    def flatten(batch: pa.Table) -> pa.Table:
        feats = batch.column("features").combine_chunks()
        flat = feats.flatten().to_numpy(zero_copy_only=False)
        n = batch.num_rows
        cols = {
            "item_id": batch.column("item_id"),
            "width": batch.column("width"),
            "height": batch.column("height"),
        }
        # fixed dim (not derived from the batch): an EMPTY block must
        # still emit all f*_bp columns or schema unification breaks
        m = flat.reshape(n, dim) if n else np.zeros((0, dim))
        for i in range(dim):
            cols[f"f{i}_bp"] = int64_col(bp(m[:, i]))
        return pa.table(cols)

    return ds.map_batches(flatten, batch_format="pyarrow")


def image_decode_features_sql(feature_dim: int = 8) -> str:
    bytes_exprs = [
        f"CAST(('0x' || substr(md5(text), {2 * i + 1}, 2)) AS BIGINT)"
        for i in range(16)]
    feat_cols = ",\n       ".join(
        f"CAST(floor(CAST({bytes_exprs[i]} AS DOUBLE) / 255.0 * 10000 + 0.5)"
        f" AS BIGINT) AS f{i}_bp" for i in range(feature_dim))
    return f"""
SELECT doc_id AS item_id,
       CAST(64 + {bytes_exprs[0]} AS BIGINT) AS width,
       CAST(64 + {bytes_exprs[1]} AS BIGINT) AS height,
       {feat_cols}
FROM documents
"""


_MEDIA_DUP_MOD = 97      # registry-row dup injection: the synthetic
_MEDIA_DUP_PAYLOAD = b"MEDIA-DUP-SENTINEL"  # pure ASCII: utf-8 == raw bytes
# corpus has no byte-identical payloads at gate scale, so every
# doc_id % 97 == 0 item carries the same sentinel payload (mirrored in
# the oracle — the pii_scrub seeded-injection convention); production
# callers run the digest groupby over their real payload column.


def media_dedup_exact(sf_dir: str):
    """(item_id, n_copies) — exact dedup over the opaque BINARY payload
    column: payloads group by content digest, the min item_id survives
    and carries the copy count. The dedup_exact policy extended to
    multimodal tables — byte-identical images/audio collapse without
    any decode (the first pass every media pipeline runs before
    perceptual hashing). One digest-keyed groupby over (digest,
    item_id) metadata rows; payload bytes never ride the shuffle."""
    import hashlib as _hl

    from ray.data.aggregate import Count, Min

    sent = _hl.sha256(_MEDIA_DUP_PAYLOAD).hexdigest()

    def digest(batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hs = [sent if i % _MEDIA_DUP_MOD == 0
              else _hl.sha256(p).hexdigest()
              for i, p in zip(ids.tolist(),
                              batch.column("payload").to_pylist())]
        return pa.table({"item_id": int64_col(ids),
                         "sha256": pa.array(hs, pa.string())})

    meta = multimodal_table(sf_dir).map_batches(digest,
                                                batch_format="pyarrow",
                                                batch_size=256)
    surv = meta.groupby("sha256").aggregate(
        Min("item_id", alias_name="item_id"),
        Count(alias_name="n_copies"))
    return surv.select_columns(["item_id", "n_copies"])


def media_dedup_exact_sql() -> str:
    return f"""
SELECT CAST(min(doc_id) AS BIGINT) AS item_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY sha256(CASE WHEN doc_id % {_MEDIA_DUP_MOD} = 0
                     THEN '{_MEDIA_DUP_PAYLOAD.decode("latin-1")}'
                     ELSE text END)
"""
