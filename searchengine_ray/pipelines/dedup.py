"""Deduplication family — training-data ops at 100 TB shape.

Exact dedup and three near-dup detectors, each expressed Ray-Data-first:

- exact:      hash column in map_batches -> groupby(hash) keep-min
              (hash-partition + per-group first; SQL-checkable via md5)
- MinHash+LSH: shingle -> 64 minhashes -> band rows -> groupby(band,
              band_hash) emits candidate pairs -> exact-Jaccard verify
              (the classic Broder 1997 / LSH pipeline; the shuffle only
              moves (band_hash, doc_id) rows, never text)
- SimHash:    64-bit Charikar 2002 fingerprint per doc; near-dups =
              same value in any of 4 16-bit bands (hamming<=3 heuristic)
- embedding:  cosine near-dup over the embeddings table via block-wise
              numpy matmul against a broadcast (ray.put) matrix
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

from searchengine_ray.pipelines.common import bp, int64_col, read

# ---------------- exact dedup ----------------


def _md5_batch(batch: pa.Table) -> pa.Table:
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in batch.column("text").to_pylist()]
    return pa.table({"text_md5": pa.array(hashes, pa.string()),
                     "doc_id": batch.column("doc_id")})


def dedup_exact(sf_dir: str):
    """(text_md5, doc_id=min surviving id, n_copies) — exact dedup via
    hash-partitioned groupby; first-wins == min(doc_id)."""
    from ray.data.aggregate import Count, Min

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    hashed = ds.map_batches(_md5_batch, batch_format="pyarrow", batch_size=2048)
    return hashed.groupby("text_md5").aggregate(Min("doc_id", alias_name="doc_id"),
                                                Count(alias_name="n_copies"))


def dedup_exact_sql() -> str:
    return """
SELECT md5(text) AS text_md5, CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
"""


# ---------------- MinHash + LSH ----------------

_N_HASH = 64
_BANDS = 8          # 8 bands x 8 rows
_ROWS = _N_HASH // _BANDS
_MERSENNE = (1 << 61) - 1


def _minhash_params(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=_N_HASH, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=_N_HASH, dtype=np.int64).astype(np.uint64)
    return a, b


_TOKEN_HASH_CACHE: dict[str, int] = {}
_SHINGLE_C = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio odd multiplier


def _token_hash(tok: str) -> int:
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                           "big")
        _TOKEN_HASH_CACHE[tok] = h
    return h


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Unique 64-bit hashes of k-token shingles.

    Hash = order-sensitive polynomial over per-token hashes (tokens are
    hashed once per process via a cache), so shingling costs one rolling
    numpy pass instead of one blake2b per shingle."""
    toks = text.lower().split()
    n = len(toks)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64, count=n)
    if n < k:
        out = th[:1].copy()
        for j in range(1, n):
            out = out * _SHINGLE_C + th[j:j + 1]
        return out >> np.uint64(3)
    m = n - k + 1
    out = th[:m].copy()
    for j in range(1, k):
        out = out * _SHINGLE_C + th[j:j + m]      # uint64 wraparound is the mix
    return np.unique(out >> np.uint64(3))


class MinHashStage:
    """map_batches: doc -> (doc_id, band, band_hash) rows, one per band."""

    def __init__(self, seed: int = 42):
        self.a, self.b = _minhash_params(seed)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text)
        if len(sh) == 0:
            return np.zeros(_N_HASH, dtype=np.uint64)
        # (n_hash, n_shingle) permutation-hash min — vectorized
        v = (np.outer(self.a, sh) + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, band_hashes = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sig = self.signature(text)
            for bnd in range(_BANDS):
                chunk = sig[bnd * _ROWS:(bnd + 1) * _ROWS]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                doc_ids.append(did)
                bands.append(bnd)
                band_hashes.append(int.from_bytes(h, "big") >> 3)
        return pa.table({"doc_id": int64_col(doc_ids),
                         "band": int64_col(bands),
                         "band_hash": int64_col(band_hashes)})


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(group["doc_id"].tolist()))
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []})
    pairs = list(combinations(ids, 2))
    return pd.DataFrame({"doc_a": [a for a, _ in pairs],
                         "doc_b": [b for _, b in pairs]})


_bucket_pairs.__name__ = "lsh_bucket_pairs"


class JaccardVerify:
    """Actor stage: exact token-shingle Jaccard for candidate pairs.
    Loads the text column once per actor (broadcast via ray.put) —
    the small-side lookup pattern, no shuffle join."""

    def __init__(self, texts_ref):
        import ray

        texts = ray.get(texts_ref)
        self.shingles = {did: set(_shingles(t).tolist())
                         for did, t in texts.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_pylist()
        b = batch.column("doc_b").to_pylist()
        jac = []
        for x, y in zip(a, b):
            sa, sb = self.shingles.get(x, set()), self.shingles.get(y, set())
            inter = len(sa & sb)
            union = len(sa | sb) or 1
            jac.append(inter / union)
        return pa.table({"doc_a": int64_col(a), "doc_b": int64_col(b),
                         "jaccard_bp": int64_col(bp(np.array(jac)))})


def minhash_lsh_dedup(sf_dir: str, threshold_bp: int = 5000):
    """Near-dup candidate pairs with exact-Jaccard verification.

    Scale shape: the LSH shuffle moves only (band, band_hash, doc_id)
    rows; candidate verification re-reads only candidate texts. At test
    scale the text map is broadcast whole; at 10^12 docs the verify
    stage would read texts by id from the docs partitions instead.
    """
    import ray

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    bands = ds.map_batches(MinHashStage, batch_format="pyarrow", batch_size=512,
                           concurrency=(1, 4))
    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas")
    # candidate pairs are few -> dedup on the driver, verify distributed
    pdf = pairs.to_pandas().drop_duplicates()
    if len(pdf) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard_bp": pa.array([], pa.int64())})
    texts = {r["doc_id"]: r["text"] for r in
             read(sf_dir, "documents", ["doc_id", "text"]).take_all()}
    ref = ray.put(texts)
    cand = ray.data.from_pandas(pdf.astype({"doc_a": "int64", "doc_b": "int64"}))
    import ray.data

    verified = cand.map_batches(JaccardVerify, fn_constructor_args=(ref,),
                                batch_format="pyarrow", batch_size=4096,
                                concurrency=(1, 2))
    out = verified.to_pandas()
    out = out[out.jaccard_bp >= threshold_bp].sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---------------- SimHash ----------------


class SimHashStage:
    """64-bit SimHash over token unigrams (Charikar 2002) — vectorized:
    per doc, token hashes expand to a (n_tokens, 64) sign matrix in one
    numpy broadcast; the per-bit sums decide the fingerprint bits."""

    _SHIFTS = np.arange(64, dtype=np.uint64)
    _WEIGHTS = (np.uint64(1) << np.arange(63, dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            toks = text.lower().split()
            if not toks:
                out.append(0)
                continue
            th = np.fromiter((_token_hash(t) for t in toks), dtype=np.uint64,
                             count=len(toks))
            bits = ((th[:, None] >> self._SHIFTS) & np.uint64(1)).astype(np.int64)
            acc = (bits * 2 - 1).sum(axis=0)
            sig = (acc[:63] > 0).astype(np.uint64)   # 63 bits -> int64-positive
            out.append(int((sig * self._WEIGHTS).sum()))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": int64_col(out)})


def simhash(sf_dir: str):
    return read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        SimHashStage, batch_format="pyarrow", batch_size=512, concurrency=(1, 4))


def simhash_near_dups(sf_dir: str):
    """Pairs sharing any 16-bit simhash band (hamming-distance bucketing):
    band shuffle exactly like LSH."""
    sig = simhash(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        out_ids, bands, keys = [], [], []
        for bnd in range(4):
            part = (h >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
            out_ids.append(ids)
            bands.append(np.full(len(ids), bnd, dtype=np.int64))
            keys.append(part.astype(np.int64))
        return pa.table({"doc_id": int64_col(np.concatenate(out_ids)),
                         "band": int64_col(np.concatenate(bands)),
                         "band_hash": int64_col(np.concatenate(keys))})

    pairs = sig.map_batches(explode, batch_format="pyarrow").groupby(
        ["band", "band_hash"]).map_groups(_bucket_pairs, batch_format="pandas")
    pdf = pairs.to_pandas().drop_duplicates().sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(pdf.reset_index(drop=True).astype("int64"),
                                preserve_index=False)


# ---------------- n-gram Jaccard (all-pairs over shared buckets) ------


def ngram_jaccard_pairs(sf_dir: str, threshold_bp: int = 3000):
    """Exact n-gram Jaccard near-dups: candidates from LSH (cheap),
    verified exactly — returns pairs >= threshold."""
    return minhash_lsh_dedup(sf_dir, threshold_bp=threshold_bp)


# ---------------- embedding cosine near-dup ----------------


class EmbeddingNearDupStage:
    """Block-wise cosine vs a broadcast matrix: each batch computes
    batch x all sims with one matmul; emits pairs above threshold.
    The matrix ships via ray.put once, not per batch."""

    def __init__(self, mat_ref, ids_ref, threshold_bp: int):
        import ray

        self.mat = ray.get(mat_ref)          # (N, d) float64, L2-normalized
        self.ids = ray.get(ids_ref)          # (N,) int64
        self.threshold = threshold_bp

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.maximum(norms, 1e-12)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sims = emb @ self.mat.T                                  # (b, N)
        sims_bp = bp(sims)
        keep = sims_bp >= self.threshold
        rows, cols = np.nonzero(keep)
        a = ids[rows]
        b = self.ids[cols]
        mask = a < b                                             # each pair once
        return pa.table({"vec_a": int64_col(a[mask]),
                         "vec_b": int64_col(b[mask]),
                         "cosine_bp": int64_col(sims_bp[rows[mask], cols[mask]])})


def embedding_near_dups(sf_dir: str, threshold_bp: int = 4000):
    """(vec_a, vec_b, cosine_bp) for cosine >= threshold — brute-force
    blockwise matmul (the N^2 baseline; the LSH-bucketed scale path is
    ``ann.ann_lsh``-style bucketing)."""
    import ray

    tbl = read(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(tbl["vec_id"].to_numpy().astype(np.int64))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ds.map_batches(EmbeddingNearDupStage,
                          fn_constructor_args=(mat_ref, ids_ref, threshold_bp),
                          batch_format="pyarrow", batch_size=512, concurrency=(1, 2))


def embedding_near_dups_sql(threshold_bp: int = 4000) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(floor(list_cosine_similarity(a.embedding, b.embedding) * 10000 + 0.5) AS BIGINT)
         AS cosine_bp
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE floor(list_cosine_similarity(a.embedding, b.embedding) * 10000 + 0.5) >= {threshold_bp}
"""
