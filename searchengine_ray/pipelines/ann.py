"""Similarity search over the embeddings table.

- ``ann_topk``: brute-force cosine top-k — the exact baseline. Query
  matrix is broadcast once with ``ray.put``; every batch does one numpy
  matmul (batch x d) @ (d x q) and emits its local top-k per query;
  a final tiny groupby merges local top-ks. Scale: compute is
  embarrassingly parallel over row blocks, no all-to-all.
- ``ann_lsh_topk``: the approximate scale path — random-hyperplane LSH
  (Charikar 2002) buckets vectors; only the query's bucket (and its
  neighbor probes) is scanned. Recall is tested against the exact
  baseline in tests.
- ``ann_ivf_topk``: IVF (inverted-file) variant — a deterministic
  spherical k-means coarse quantizer (trained on a bounded,
  hash-chosen sample, so training cost is independent of corpus size)
  partitions vectors into ``list=<c>/`` parquet directories; queries
  read only their ``nprobe`` closest lists. Recall tested vs exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from searchengine_ray.pipelines.common import bp, emb_matrix, int64_col, read


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _query_matrix(sf_dir: str, query_ids: list[int]) -> tuple[np.ndarray, np.ndarray]:
    import duckdb

    con = duckdb.connect()
    tbl = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id IN ({','.join(map(str, query_ids))}) ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in tbl], dtype=np.int64)
    mat = np.array([r[1] for r in tbl], dtype=np.float64)
    return ids, mat


DEFAULT_QUERY_IDS = [0, 1, 2, 3, 4]


class BruteCosineTopK:
    """Per-batch exact cosine: one matmul, local top-k per query."""

    def __init__(self, qids_ref, qmat_ref, k: int):
        import ray

        self.qids = ray.get(qids_ref)
        self.qmat = _normalize(ray.get(qmat_ref))     # (q, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = emb_matrix(batch.column("embedding"))
        emb = _normalize(emb)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sims_bp = bp(self.qmat @ emb.T)                           # (q, b) integer bp
        out_q, out_v, out_s = [], [], []
        k = min(self.k, sims_bp.shape[1])
        for qi in range(len(self.qids)):
            row = sims_bp[qi]
            # local selection uses the SAME (bp desc, vec_id asc) order as
            # the final merge/SQL oracle, so rounded-equal ties resolve
            # identically everywhere
            top = np.lexsort((ids, -row))[:k]
            out_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            out_v.append(ids[top])
            out_s.append(row[top])
        return pa.table({"query_vec_id": int64_col(np.concatenate(out_q)),
                         "vec_id": int64_col(np.concatenate(out_v)),
                         "cosine_bp": int64_col(np.concatenate(out_s))})


def _merge_topk_factory(k: int):
    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine_bp", "vec_id"],
                          ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_vec_id", "rank", "vec_id", "cosine_bp"]]

    merge_topk.__name__ = "merge_topk"
    return merge_topk


def ann_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10):
    """(query_vec_id, rank, vec_id, cosine_bp) exact top-k per query."""
    import ray

    qids_list = query_ids or DEFAULT_QUERY_IDS
    qids, qmat = _query_matrix(sf_dir, qids_list)
    qids_ref, qmat_ref = ray.put(qids), ray.put(qmat)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    local = ds.map_batches(BruteCosineTopK,
                           fn_constructor_args=(qids_ref, qmat_ref, k),
                           batch_format="pyarrow", batch_size=1024, concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")


def ann_topk_sql(query_ids: list[int] | None = None, k: int = 10) -> str:
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    return f"""
WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qe FROM embeddings
           WHERE vec_id IN ({ids})),
sims AS (
  SELECT q.query_vec_id, e.vec_id,
         CAST(floor(list_cosine_similarity(q.qe, e.embedding) * 10000 + 0.5) AS BIGINT)
           AS cosine_bp
  FROM q CROSS JOIN embeddings e),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY cosine_bp DESC, vec_id ASC) AS rnk
  FROM sims)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, cosine_bp
FROM ranked WHERE rnk <= {k}
"""


_SF_ORACLE_DEFAULT = "/root/testdata/sf0.01"   # the driver's gate scale


def _sql_vec(v: np.ndarray) -> str:
    """Exact DOUBLE[] literal: shortest round-trip repr of each float64
    parses back bit-identically, so the SQL side sees the same planes/
    centroids the Ray actors received via ray.put."""
    return "[" + ",".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


from functools import lru_cache


@lru_cache(maxsize=64)
def _table_dim(sf_dir: str) -> int:
    import duckdb

    return duckdb.sql(
        f"SELECT len(embedding) FROM '{sf_dir}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]


class LshBucketStage:
    """Random-hyperplane signatures: vec -> (bucket, vec_id, embedding)."""

    def __init__(self, planes_ref):
        import ray

        self.planes = ray.get(planes_ref)     # (n_bits, d)

    def bucket_of(self, emb: np.ndarray) -> np.ndarray:
        bits = (emb @ self.planes.T) > 0      # (n, n_bits)
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
        return bits.astype(np.int64) @ weights

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = emb_matrix(batch.column("embedding"))
        return batch.append_column("bucket", int64_col(self.bucket_of(_normalize(emb))))


def _lsh_planes(n_bits: int, d: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_bits, d))


def ensure_ann_index(sf_dir: str, n_bits: int = 6, seed: int = 42) -> str:
    """Build (once) the PERSISTED bucketed ANN layout: the embeddings
    table hash-partitioned by LSH bucket into
    ``bucket=<b>/...parquet`` directories. Queries then READ only the
    probed buckets — I/O pruning, not just compute pruning. The write is
    a one-pass ``map_batches`` + partitioned ``write_parquet`` and is
    resumable by its done-marker."""
    import hashlib
    import json
    from pathlib import Path

    import ray

    tag = hashlib.blake2b(f"{sf_dir}|{n_bits}|{seed}|{_fingerprint_of(sf_dir)}".encode(),
                          digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_ann_index/{tag}")
    marker = root / "_DONE.json"
    if marker.is_file():
        return str(root)
    if root.exists():
        import shutil

        shutil.rmtree(root)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    d = len(ds.take(1)[0]["embedding"])
    planes_ref = ray.put(_lsh_planes(n_bits, d, seed))
    bucketed = ds.map_batches(LshBucketStage, fn_constructor_args=(planes_ref,),
                              batch_format="pyarrow", batch_size=1024,
                              concurrency=(1, 2))
    bucketed.write_parquet(str(root), partition_cols=["bucket"])
    marker.write_text(json.dumps({"sf_dir": sf_dir, "n_bits": n_bits,
                                  "seed": seed, "d": d}))
    return str(root)


def ann_lsh_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10,
                 n_bits: int = 6, seed: int = 42):
    """Approximate top-k over the PERSISTED bucket layout: only the
    query buckets (plus all 1-bit neighbor probes) are read from disk —
    observable in the read task count — then scanned exactly like the
    brute-force path. Recall vs the exact baseline is tested."""
    import ray

    from pathlib import Path

    qids_list = query_ids or DEFAULT_QUERY_IDS
    qids, qmat = _query_matrix(sf_dir, qids_list)
    root = ensure_ann_index(sf_dir, n_bits=n_bits, seed=seed)
    planes = _lsh_planes(n_bits, qmat.shape[1], seed)

    bits = (_normalize(qmat) @ planes.T) > 0
    weights = (1 << np.arange(n_bits, dtype=np.int64))
    qbuckets = bits.astype(np.int64) @ weights
    probe = set()
    for qb in qbuckets.tolist():
        probe.add(int(qb))
        for i in range(n_bits):
            probe.add(int(qb) ^ (1 << i))
    paths = [str(f) for b in sorted(probe)
             for p in [Path(root) / f"bucket={b}"] if p.is_dir()
             for f in sorted(p.glob("*.parquet"))]
    if not paths:
        return pa.table({"query_vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine_bp": pa.array([], pa.int64())})
    qids_ref, qmat_ref = ray.put(qids), ray.put(qmat)
    pruned = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    local = pruned.map_batches(BruteCosineTopK,
                               fn_constructor_args=(qids_ref, qmat_ref, k),
                               batch_format="pyarrow", batch_size=1024,
                               concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")


def ann_lsh_topk_sql(sf_dir: str = _SF_ORACLE_DEFAULT,
                     query_ids: list[int] | None = None, k: int = 10,
                     n_bits: int = 6, seed: int = 42) -> str:
    """Exact DuckDB replay of the LSH path: the seeded hyperplanes are
    inlined as DOUBLE[] literals; bucket bits come from the raw dot-
    product sign (normalization never changes a sign MATHEMATICALLY —
    in float64 the two can disagree only when |dot| is within a few ulps
    of zero, a measure-zero slice of random data accepted as residual
    oracle risk; so the SQL skips the unit-scaling the Ray side
    applies); the candidate set is the
    union of every query's bucket plus all 1-bit neighbor probes — the
    same union of probed partitions the Ray side reads from disk."""
    planes = _lsh_planes(n_bits, _table_dim(sf_dir), seed)
    plane_rows = ",".join(f"({i},{_sql_vec(planes[i])})" for i in range(n_bits))
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    return f"""
WITH planes(i, p) AS (VALUES {plane_rows}),
vb AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN list_dot_product(e.embedding, pl.p) > 0
                       THEN (1::BIGINT << pl.i) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id),
q AS (
  SELECT e.vec_id AS query_vec_id, e.embedding AS qe, v.bucket
  FROM embeddings e JOIN vb v ON v.vec_id = e.vec_id
  WHERE e.vec_id IN ({ids})),
probe AS (
  SELECT DISTINCT pb FROM (
    SELECT bucket AS pb FROM q
    UNION ALL
    SELECT xor(q.bucket, 1::BIGINT << pl.i) AS pb
    FROM q CROSS JOIN planes pl) u),
cand AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e JOIN vb v ON v.vec_id = e.vec_id
  WHERE v.bucket IN (SELECT pb FROM probe)),
sims AS (
  SELECT q.query_vec_id, c.vec_id,
         CAST(floor(list_cosine_similarity(q.qe, c.embedding) * 10000 + 0.5)
              AS BIGINT) AS cosine_bp
  FROM q CROSS JOIN cand c),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY cosine_bp DESC, vec_id ASC) AS rnk
  FROM sims)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, cosine_bp
FROM ranked WHERE rnk <= {k}
"""


def _spherical_kmeans(sample: np.ndarray, n_centroids: int, seed: int,
                      iters: int = 12) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd's on the unit sphere).

    Cosine assignment == argmax dot product after normalization. Empty
    clusters are reseeded to the currently worst-covered sample point
    (deterministic), so every list ends non-degenerate."""
    x = _normalize(sample.astype(np.float64))
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ c.T                               # (n, k)
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(x)), assign]
        new_c = np.zeros_like(c)
        np.add.at(new_c, assign, x)
        counts = np.bincount(assign, minlength=len(c))
        worst = np.argsort(best, kind="stable")      # least-covered first
        wi = 0
        for j in np.flatnonzero(counts == 0):
            new_c[j] = x[worst[wi]]                  # deterministic reseed
            wi += 1
        c = _normalize(new_c)
    return c


def _ivf_sample(sf_dir: str, sample_size: int = 4096) -> np.ndarray:
    """Bounded deterministic training sample: every vec_id ≡ 0 (mod m)
    with m sized from the table's row count — order-independent, so the
    same sample comes back no matter how blocks are scanned. At 100 TB
    the sample (and therefore training cost) stays this size."""
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()                                   # parquet metadata, no scan
    m = max(1, n // sample_size)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return batch.take(pa.array(np.flatnonzero(ids % m == 0)))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


class IvfAssignStage:
    """vec -> nearest-centroid list id (one matmul per batch)."""

    def __init__(self, centroids_ref):
        import ray

        self.centroids = ray.get(centroids_ref)      # (k, d), unit rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = emb_matrix(batch.column("embedding"))
        assign = np.argmax(_normalize(emb) @ self.centroids.T, axis=1)
        return batch.append_column("list", int64_col(assign.astype(np.int64)))


def ensure_ivf_index(sf_dir: str, n_centroids: int = 16, seed: int = 42
                     ) -> tuple[str, np.ndarray]:
    """Build (once) the persisted IVF layout: embeddings partitioned by
    nearest-centroid into ``list=<c>/...parquet``; centroids saved next
    to the data. Returns (root, centroids). Resumable via done-marker."""
    import hashlib
    import json
    from pathlib import Path

    import ray

    tag = hashlib.blake2b(f"{sf_dir}|ivf|{n_centroids}|{seed}|{_fingerprint_of(sf_dir)}".encode(),
                          digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_ivf_index/{tag}")
    marker = root / "_DONE.json"
    if marker.is_file():
        return str(root), np.load(root / "centroids.npy")
    if root.exists():
        import shutil

        shutil.rmtree(root)
    centroids = _spherical_kmeans(_ivf_sample(sf_dir), n_centroids, seed)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cref = ray.put(centroids)
    assigned = ds.map_batches(IvfAssignStage, fn_constructor_args=(cref,),
                              batch_format="pyarrow", batch_size=1024,
                              concurrency=(1, 2))
    assigned.write_parquet(str(root), partition_cols=["list"])
    np.save(root / "centroids.npy", centroids)
    marker.write_text(json.dumps({"sf_dir": sf_dir, "n_centroids": n_centroids,
                                  "seed": seed}))
    return str(root), centroids


def ann_ivf_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10,
                 n_centroids: int = 16, nprobe: int = 4, seed: int = 42):
    """Approximate top-k over the persisted IVF layout: each query reads
    only its ``nprobe`` nearest inverted lists (I/O pruning observable
    in the read task count), then scans them exactly like the
    brute-force path. Recall vs the exact baseline is tested."""
    import ray

    from pathlib import Path

    qids_list = query_ids or DEFAULT_QUERY_IDS
    qids, qmat = _query_matrix(sf_dir, qids_list)
    root, centroids = ensure_ivf_index(sf_dir, n_centroids=n_centroids, seed=seed)
    sims = _normalize(qmat) @ centroids.T            # (q, k)
    nprobe = min(nprobe, sims.shape[1])
    probe = set()
    for qi in range(len(qids)):
        for c in np.argsort(-sims[qi], kind="stable")[:nprobe]:
            probe.add(int(c))
    paths = [str(f) for c in sorted(probe)
             for p in [Path(root) / f"list={c}"] if p.is_dir()
             for f in sorted(p.glob("*.parquet"))]
    if not paths:
        return pa.table({"query_vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine_bp": pa.array([], pa.int64())})
    qids_ref, qmat_ref = ray.put(qids), ray.put(qmat)
    pruned = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    local = pruned.map_batches(BruteCosineTopK,
                               fn_constructor_args=(qids_ref, qmat_ref, k),
                               batch_format="pyarrow", batch_size=1024,
                               concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")


def _ivf_sample_local(sf_dir: str, sample_size: int = 4096) -> np.ndarray:
    """No-Ray twin of ``_ivf_sample`` for oracle-SQL generation: same
    ``vec_id % m == 0`` rule, same vec_id order, same float32->float64
    widening — so ``_spherical_kmeans`` reproduces the Ray-side
    centroids bit-for-bit."""
    import duckdb

    con = duckdb.connect()
    n = con.sql(f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
                ).fetchone()[0]
    m = max(1, n // sample_size)
    rows = con.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id % {m} = 0 ORDER BY vec_id").fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


from functools import lru_cache as _lru


@_lru(maxsize=16)
def _oracle_centroids(sf_dir: str, n_centroids: int, seed: int) -> np.ndarray:
    """Memoized: the retrain is deterministic per (sf_dir, params), and
    callers (the test suite re-reads oracle_sql() per case) must not pay
    the sample scan + 12 k-means iterations every time."""
    return _spherical_kmeans(_ivf_sample_local(sf_dir), n_centroids, seed)


def ann_ivf_topk_sql(sf_dir: str = _SF_ORACLE_DEFAULT,
                     query_ids: list[int] | None = None, k: int = 10,
                     n_centroids: int = 16, nprobe: int = 4,
                     seed: int = 42) -> str:
    """Exact DuckDB replay of the IVF path. The coarse quantizer is
    data-dependent, so this generator RETRAINS it locally (DuckDB sample
    + the same numpy k-means — bit-identical to ``ensure_ivf_index``)
    and inlines the centroids as DOUBLE[] literals. List assignment =
    argmax of the raw dot product (scale-invariant, ties to the lowest
    centroid id exactly like ``np.argmax``); each query probes its
    ``nprobe`` best lists; candidates = vectors in ANY probed list (the
    union of partitions the Ray side reads)."""
    centroids = _oracle_centroids(sf_dir, n_centroids, seed)
    cent_rows = ",".join(f"({c},{_sql_vec(centroids[c])})"
                         for c in range(len(centroids)))
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    nprobe = min(nprobe, len(centroids))
    return f"""
WITH cents(c, v) AS (VALUES {cent_rows}),
asg AS (
  SELECT e.vec_id, ct.c,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, ct.v) DESC, ct.c ASC) AS rn
  FROM embeddings e CROSS JOIN cents ct),
vl AS (SELECT vec_id, c AS list FROM asg WHERE rn = 1),
qp AS (
  SELECT e.vec_id AS query_vec_id, ct.c,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, ct.v) DESC, ct.c ASC) AS rn
  FROM embeddings e CROSS JOIN cents ct WHERE e.vec_id IN ({ids})),
probe AS (SELECT DISTINCT c FROM qp WHERE rn <= {nprobe}),
cand AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e JOIN vl ON vl.vec_id = e.vec_id
  WHERE vl.list IN (SELECT c FROM probe)),
q AS (SELECT vec_id AS query_vec_id, embedding AS qe FROM embeddings
      WHERE vec_id IN ({ids})),
sims AS (
  SELECT q.query_vec_id, c.vec_id,
         CAST(floor(list_cosine_similarity(q.qe, c.embedding) * 10000 + 0.5)
              AS BIGINT) AS cosine_bp
  FROM q CROSS JOIN cand c),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY cosine_bp DESC, vec_id ASC) AS rnk
  FROM sims)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, cosine_bp
FROM ranked WHERE rnk <= {k}
"""


# ---- per-label centroid statistics ----


def _centroid_partial(batch: pa.Table) -> pa.Table:
    """One (label, dim) partial row per batch: element values are
    quantized to integer MICRO-units (floor(v*1e6+0.5)) BEFORE summing,
    so the distributed sum is exact integer arithmetic — order- and
    cluster-shape-independent, per the common.py parity contract (float
    partial sums would drift in the low bits between shuffle orders).
    float32 -> float64 cast is exact, so both sides quantize the same
    doubles."""
    mat = emb_matrix(batch.column("embedding"))
    labels = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    micro = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
    uniq, inv = np.unique(labels, return_inverse=True)
    d = mat.shape[1]
    sums = np.zeros((len(uniq), d), np.int64)
    np.add.at(sums, inv, micro)
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    return pa.table({
        "label": int64_col(np.repeat(uniq, d)),
        "dim": int64_col(np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq))),
        "n_p": int64_col(np.repeat(counts, d)),
        "sum_micro_p": int64_col(sums.reshape(-1))})


def _centroid_finalize(batch: pa.Table) -> pa.Table:
    s = batch.column("sum_micro").to_numpy(zero_copy_only=False).astype(np.float64)
    n = batch.column("n_vecs").to_numpy(zero_copy_only=False).astype(np.float64)
    return batch.append_column(
        "mean_micro", int64_col(np.floor(s / n + 0.5).astype(np.int64)))


def label_centroids(sf_dir: str):
    """(label, dim, n_vecs, sum_micro, mean_micro) — the per-class mean
    embedding (class-balance audit, centroid init for clustering,
    nearest-class-mean classification), one row per (label, dimension).

    Shape: vectorized per-batch partials (labels x d int64 rows — tiny
    vs the vector data), then a labels x d groupby of partials; the
    embeddings themselves never shuffle. At 100 TB this is the
    canonical mergeable-aggregate layout: every block contributes a
    fixed-size summary regardless of row count."""
    from ray.data.aggregate import Sum

    partial = read(sf_dir, "embeddings", ["embedding", "label"]).map_batches(
        _centroid_partial, batch_format="pyarrow", batch_size=4096)
    out = partial.groupby(["label", "dim"]).aggregate(
        Sum("n_p", alias_name="n_vecs"),
        Sum("sum_micro_p", alias_name="sum_micro"))
    return out.map_batches(_centroid_finalize, batch_format="pyarrow")


def label_centroids_sql() -> str:
    return """
WITH u AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS micro
  FROM embeddings),
agg AS (
  SELECT label, dim, CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(sum(micro) AS BIGINT) AS sum_micro
  FROM u GROUP BY label, dim)
SELECT label, dim, n_vecs, sum_micro,
       CAST(floor(CAST(sum_micro AS DOUBLE) / n_vecs + 0.5) AS BIGINT)
         AS mean_micro
FROM agg
"""


# ---- distributed k-means (Lloyd's iterations) ----


def _kmeans_assign_exact(micro: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest centroid per row by EXACT integer squared distance
    (d2 = x.x - 2 x.c + c.c, all int64 — no float accumulation, so
    assignment is bit-identical on any cluster shape); ties resolve to
    the lowest cluster index (np.argmin first-min == the SQL oracle's
    ORDER BY d2, cluster). Magnitudes: |micro| <= ~2e6 per element, so
    per-pair d2 <= 4e12 * d — far inside int64 at any realistic dim."""
    x2 = np.einsum("ij,ij->i", micro, micro)            # (b,)
    c2 = np.einsum("ij,ij->i", cent, cent)              # (k,)
    cross = micro @ cent.T                              # (b, k) int64
    d2 = x2[:, None] - 2 * cross + c2[None, :]
    return np.argmin(d2, axis=1)


def _kmeans_assign(micro: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """``_kmeans_assign_exact`` semantics at BLAS speed: distances run
    in float64 (one dgemm — numpy's int64 matmul is a naive C loop,
    measured ~15x slower at k=2048, BENCH/r4_emb_500k.json), then rows
    whose best/runner-up margin falls inside a conservative float
    error bound — including all exact ties — are re-assigned by the
    exact integer kernel. The bound is ~20x the worst-case dgemm
    rounding (eps * terms * magnitudes), so the recheck set is empty
    on real data but provably covers every row where float64 could
    disagree with the integer argmin; the result is bit-identical to
    the exact path by construction."""
    xf = micro.astype(np.float64)
    cf = cent.astype(np.float64)
    x2 = np.einsum("ij,ij->i", xf, xf)
    c2 = np.einsum("ij,ij->i", cf, cf)
    d2 = x2[:, None] - 2.0 * (xf @ cf.T) + c2[None, :]
    best = np.argmin(d2, axis=1)
    rows = np.arange(len(d2))
    d2best = d2[rows, best]
    d2[rows, best] = np.inf
    margin = d2.min(axis=1) - d2best
    # |float_d2 - int_d2| <= ~4 * d * eps * max-term-magnitude; use a
    # per-row 20x-slack bound so near-ties (and exact ties, margin<=0)
    # always fall through to the integer kernel
    err = 1e-12 * (x2 + float(c2.max()) + 2.0 * np.sqrt(x2 * c2.max()) + 1.0)
    risky = margin <= err
    if risky.any():
        best[risky] = _kmeans_assign_exact(micro[risky], cent)
    return best


class _KMeansPartial:
    """map_batches stage of one Lloyd iteration: assign each vector to
    its nearest broadcast centroid, emit one (cluster, dim, n_p, sum_p)
    partial row per PRESENT cluster-dim — the embeddings themselves
    never shuffle. The assignment matmul runs in row chunks so the
    (chunk x k) distance matrix stays ~64 MB however large the batch,
    which lets ``_kmeans_centroids`` scale batch_size WITH k: partial
    volume is (clusters-present x d) per batch, so bigger batches at
    bigger k keep partial rows per input vector bounded instead of
    k*d/b exploding (measured 32 rows/vec at k=2048, b=4096).
    Centroids arrive once per actor via ray.put (zero re-ship per
    batch)."""

    _CHUNK = 4096

    def __init__(self, cent_ref):
        import ray

        self.cent = ray.get(cent_ref)                   # (k, d) int64 micro

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = emb_matrix(batch.column("embedding"))
        micro = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
        k, d = self.cent.shape
        sums = np.zeros((k, d), np.int64)
        counts = np.zeros(k, np.int64)
        for lo in range(0, len(micro), self._CHUNK):
            sub = micro[lo:lo + self._CHUNK]
            assign = _kmeans_assign(sub, self.cent)
            np.add.at(sums, assign, sub)
            counts += np.bincount(assign, minlength=k)
        present = np.flatnonzero(counts)
        return pa.table({
            "cluster": int64_col(np.repeat(present, d)),
            "dim": int64_col(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                     len(present))),
            "n_p": int64_col(np.repeat(counts[present], d)),
            "sum_p": int64_col(sums[present].reshape(-1))})


def _kmeans_centroids(sf_dir: str, k: int, iters: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Run ``iters`` Lloyd's iterations; returns (centroids int64 micro
    (k, d), last-assignment member counts (k,)). Shared by
    ``kmeans_embeddings`` and ``dedup.semdedup``."""
    import ray
    from ray.data.aggregate import Sum

    init = read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .filter(expr=f"vec_id < {k}").take_all()
    assert len(init) == k, f"init expects dense vec_ids 0..{k-1}"
    init.sort(key=lambda r: r["vec_id"])
    cent = np.floor(np.asarray([r["embedding"] for r in init], np.float64)
                    * 1_000_000 + 0.5).astype(np.int64)    # (k, d)

    counts = np.zeros(k, np.int64)
    # scale batch with k so partial rows per vec stay <= d/16; the
    # stage chunks its matmul internally, so memory is flat in b
    bsize = int(max(4096, min(65536, 16 * k)))
    for _ in range(iters):
        cent_ref = ray.put(cent)
        partial = read(sf_dir, "embeddings", ["embedding"]).map_batches(
            _KMeansPartial, fn_constructor_args=(cent_ref,),
            batch_format="pyarrow", batch_size=bsize, concurrency=(1, 8))
        agg = partial.groupby(["cluster", "dim"]).aggregate(
            Sum("n_p", alias_name="n"), Sum("sum_p", alias_name="s"))
        rows = agg.take_all()                       # bounded: k*d rows
        new = cent.copy()
        counts = np.zeros(k, np.int64)
        for r in rows:
            c, dd = int(r["cluster"]), int(r["dim"]) - 1
            n = int(r["n"])
            if n > 0:
                new[c, dd] = np.int64(np.floor(float(r["s"]) / n + 0.5))
                counts[c] = n
        cent = new
    return cent, counts


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 2):
    """(cluster, dim, centroid_micro, n_members) — ``iters`` full
    Lloyd's iterations of k-means over the embeddings table (semantic
    clustering for curation/SemDeDup-style dedup, IVF coarse quantizer
    training at full-corpus fidelity).

    Iterative-algorithm shape on Ray Data: per iteration, ONE broadcast
    of the k x d centroid matrix (``ray.put``, read once per actor), one
    ``map_batches`` pass emitting fixed-size integer partials, one
    (cluster, dim) groupby of those partials, and a driver ``take_all``
    bounded at k*d rows (512 here — never corpus-scale). Exactness: all
    arithmetic is integer micro-units; the mean uses the same
    floor(s/n + 0.5) double op on both sides (label_centroids contract),
    so the unrolled-CTE DuckDB oracle reproduces every iteration
    bit-for-bit. Empty clusters keep their previous centroid (mirrored
    by the oracle's LEFT JOIN + CASE).

    Init: centroid j = the vector with vec_id == j (the synthetic
    table's ids are dense from 0; production would point this at any k
    deterministic rows). The init read is predicate-pruned, not a scan.
    """
    cent, counts = _kmeans_centroids(sf_dir, k, iters)
    d = cent.shape[1]
    return pa.table({
        "cluster": int64_col(np.repeat(np.arange(k, dtype=np.int64), d)),
        "dim": int64_col(np.tile(np.arange(1, d + 1, dtype=np.int64), k)),
        "centroid_micro": int64_col(cent.reshape(-1)),
        "n_members": int64_col(np.repeat(counts, d))})


def _kmeans_ctes(k: int, iters: int, final_assign: bool = False
                 ) -> list[str]:
    """The unrolled Lloyd CTE chain: c0 = init centroids, then per
    iteration (a_i distances -> s_i argmin assignment -> g_i integer
    group sums -> c_i updated centroids with empty-cluster carry).
    With ``final_assign``, appends one more a/s pair — the assignment
    under the FINAL centroids (what semdedup clusters by). d2 stays in
    DuckDB's HUGEINT only for ORDER BY — never fetched, so the
    HUGEINT->float64 fetchdf trap can't bite. Shared by the kmeans
    and semdedup oracles."""
    ctes = [f"""u AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS x
  FROM embeddings)""", f"""c0 AS (
  SELECT vec_id AS cluster, dim, x AS c FROM u WHERE vec_id < {k})"""]
    last = iters + 1 if final_assign else iters
    for i in range(1, last + 1):
        p = i - 1
        ctes.append(f"""a{i} AS (
  SELECT u.vec_id, c{p}.cluster,
         SUM((u.x - c{p}.c) * (u.x - c{p}.c)) AS d2
  FROM u JOIN c{p} USING (dim)
  GROUP BY u.vec_id, c{p}.cluster)""")
        ctes.append(f"""s{i} AS (
  SELECT vec_id, cluster FROM a{i}
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY d2, cluster) = 1)""")
        if i > iters:
            break                     # final assignment only: no update
        ctes.append(f"""g{i} AS (
  SELECT s{i}.cluster, u.dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(u.x) AS BIGINT) AS s
  FROM u JOIN s{i} USING (vec_id)
  GROUP BY s{i}.cluster, u.dim)""")
        ctes.append(f"""c{i} AS (
  SELECT c{p}.cluster, c{p}.dim,
         CASE WHEN g{i}.n IS NULL THEN c{p}.c
              ELSE CAST(floor(CAST(g{i}.s AS DOUBLE) / g{i}.n + 0.5)
                        AS BIGINT) END AS c
  FROM c{p} LEFT JOIN g{i}
    ON c{p}.cluster = g{i}.cluster AND c{p}.dim = g{i}.dim)""")
    return ctes


def kmeans_embeddings_sql(k: int = 8, iters: int = 2) -> str:
    joined = ",\n".join(_kmeans_ctes(k, iters))
    return f"""
WITH {joined}
SELECT c{iters}.cluster, c{iters}.dim, c{iters}.c AS centroid_micro,
       CAST(COALESCE(m.n_members, 0) AS BIGINT) AS n_members
FROM c{iters} LEFT JOIN (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
  FROM s{iters} GROUP BY cluster) m USING (cluster)
"""


def ann_recall_audit(sf_dir: str, k: int = 10):
    """(query_vec_id, n_exact, n_approx, n_hits) — recall@k audit of
    the LSH-bucketed ANN path against the exact brute-force top-k:
    n_hits / n_exact IS recall@k, the acceptance metric every
    approximate index ships with. Composes the two existing pipelines
    unchanged; both results are |queries| x k rows, so the comparison
    is driver-side on bounded data (never corpus-scale). The oracle
    nests both generated SQLs and replays the same join-count."""
    import pandas as pd

    ex = ann_topk(sf_dir, k=k).to_pandas()
    ap = ann_lsh_topk(sf_dir, k=k).to_pandas()
    ne = ex.groupby("query_vec_id", as_index=False).size() \
        .rename(columns={"size": "n_exact"})
    na = ap.groupby("query_vec_id", as_index=False).size() \
        .rename(columns={"size": "n_approx"})
    hits = ex.merge(ap, on=["query_vec_id", "vec_id"]) \
        .groupby("query_vec_id", as_index=False).size() \
        .rename(columns={"size": "n_hits"})
    out = ne.merge(na, on="query_vec_id", how="left") \
        .merge(hits, on="query_vec_id", how="left")
    for c in ("n_approx", "n_hits"):
        out[c] = out[c].fillna(0).astype(np.int64)
    out["n_exact"] = out["n_exact"].astype(np.int64)
    out["query_vec_id"] = out["query_vec_id"].astype(np.int64)
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


def ann_recall_audit_sql(k: int = 10) -> str:
    return f"""
WITH ex AS ({ann_topk_sql(k=k)}),
ap AS ({ann_lsh_topk_sql(k=k)}),
ne AS (SELECT query_vec_id, CAST(count(*) AS BIGINT) AS n_exact
       FROM ex GROUP BY query_vec_id),
na AS (SELECT query_vec_id, CAST(count(*) AS BIGINT) AS n_approx
       FROM ap GROUP BY query_vec_id),
hits AS (SELECT ex.query_vec_id, CAST(count(*) AS BIGINT) AS n_hits
         FROM ex JOIN ap ON ap.query_vec_id = ex.query_vec_id
                        AND ap.vec_id = ex.vec_id
         GROUP BY ex.query_vec_id)
SELECT ne.query_vec_id, ne.n_exact,
       CAST(COALESCE(na.n_approx, 0) AS BIGINT) AS n_approx,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
FROM ne LEFT JOIN na USING (query_vec_id) LEFT JOIN hits h USING (query_vec_id)
"""


def label_cohesion(sf_dir: str):
    """(label, n_vecs, resultant2_micro2) — per-class cohesion as the
    SQUARED resultant length: the squared L2 norm of the class's mean
    embedding in micro²-units. For unit-norm embeddings this is the
    circular-statistics concentration read — a tight class has
    ||mean|| near 1 (resultant2 near 1e12), a label whose vectors
    scatter has it near 0 — the class-quality audit beside
    label_centroids and nb_lang_confusion. Reported SQUARED so the
    whole statistic stays exact integer arithmetic on the already
    hash-verified mean_micro values (a bp'd root would hang parity on
    float sqrt rounding). Shape: the label_centroids partial flow plus
    one bounded labels×d reduction."""
    from ray.data.aggregate import Max, Sum

    cent = label_centroids(sf_dir)

    def sq(batch: pa.Table) -> pa.Table:
        m = batch.column("mean_micro").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"label": batch.column("label"),
                         "n_vecs": batch.column("n_vecs"),
                         "sq_p": int64_col(m * m)})

    return cent.map_batches(sq, batch_format="pyarrow") \
        .groupby("label").aggregate(
            Max("n_vecs", alias_name="n_vecs"),
            Sum("sq_p", alias_name="resultant2_micro2"))


def label_cohesion_sql() -> str:
    return f"""
WITH cent AS ({label_centroids_sql()})
SELECT label, CAST(max(n_vecs) AS BIGINT) AS n_vecs,
       CAST(sum(mean_micro * mean_micro) AS BIGINT) AS resultant2_micro2
FROM cent GROUP BY label
"""


# ---- product quantization (PQ) with asymmetric-distance queries ----

_PQ_M = 8        # subspaces
_PQ_KS = 16      # codes per subspace (4-bit codebooks)
_PQ_SEED = 42
_PQ_MICRO = 1_000_000


def _pq_train(sample: np.ndarray, m: int, ks: int, seed: int,
              iters: int = 12) -> np.ndarray:
    """Deterministic per-subspace Lloyd's k-means over integer-micro
    data (Jégou, Douze & Schmid 2011). Input vectors quantize to
    floor(v * 1e6 + 0.5) BEFORE training and the trained centroids
    round back to integers, so every distance the encoder or the ADC
    scorer ever computes is exact integer arithmetic — bit-replayable
    in SQL with no float summation-order hazard. Returns (m, ks, dsub)
    int64 codebooks."""
    n, d = sample.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    micro = np.floor(sample * _PQ_MICRO + 0.5)        # int-valued float64
    rng = np.random.default_rng(seed)
    books = np.zeros((m, ks, dsub), np.int64)
    for s in range(m):
        x = micro[:, s * dsub:(s + 1) * dsub]
        c = x[rng.choice(n, size=min(ks, n), replace=False)].copy()
        for _ in range(iters):
            # exact: products/sums of int-valued f64 stay < 2^53 here
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            best = d2[np.arange(n), assign]
            new_c = np.zeros_like(c)
            np.add.at(new_c, assign, x)
            counts = np.bincount(assign, minlength=len(c))
            worst = np.argsort(-best, kind="stable")  # worst-covered first
            wi = 0
            nz = counts > 0
            new_c[nz] = np.floor(new_c[nz] / counts[nz, None] + 0.5)
            for j in np.flatnonzero(~nz):
                new_c[j] = x[worst[wi]]               # deterministic reseed
                wi += 1
            c = new_c
        books[s] = c.astype(np.int64)
    return books


@_lru(maxsize=16)
def _pq_codebooks(sf_dir: str, m: int = _PQ_M, ks: int = _PQ_KS,
                  seed: int = _PQ_SEED, local: bool = False) -> np.ndarray:
    sample = (_ivf_sample_local(sf_dir) if local else _ivf_sample(sf_dir))
    return _pq_train(sample, m, ks, seed)


def _pq_encode(emb: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) raw float embeddings -> (n, m) uint8 codes: per subspace,
    argmin integer L2 to the codebook (ties -> lowest code, np.argmin).
    Distances expand to ||x||^2 - 2 x.c + ||c||^2 via float64 BLAS —
    exact, every term an integer < 2^53 at micro scale."""
    m, ks, dsub = books.shape
    micro = np.floor(emb * _PQ_MICRO + 0.5)
    codes = np.zeros((len(emb), m), np.uint8)
    for s in range(m):
        x = micro[:, s * dsub:(s + 1) * dsub]
        c = books[s].astype(np.float64)
        d2 = ((x * x).sum(axis=1, keepdims=True)
              - 2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :])
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


class PqEncodeStage:
    """vec -> m-byte PQ code row (one exact-int assignment per batch)."""

    def __init__(self, books_ref):
        import ray

        self.books = ray.get(books_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = emb_matrix(batch.column("embedding"))
        codes = _pq_encode(emb, self.books)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "codes": pa.array(list(codes), pa.list_(pa.uint8()))})


def ensure_pq_index(sf_dir: str, m: int = _PQ_M, ks: int = _PQ_KS,
                    seed: int = _PQ_SEED) -> tuple[str, np.ndarray]:
    """Build (once) the persisted PQ layout: every embedding compressed
    to m uint8 codes (64x smaller than the 64-dim float payload here;
    the point of PQ at 100 TB — the scan set becomes codes, not
    vectors). Codebooks train on the bounded deterministic sample
    (corpus-size-independent) and persist beside the codes. Resumable
    via done-marker."""
    import hashlib
    import json
    from pathlib import Path

    import ray

    tag = hashlib.blake2b(f"{sf_dir}|pq|{m}|{ks}|{seed}|{_fingerprint_of(sf_dir)}".encode(),
                          digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_pq_index/{tag}")
    marker = root / "_DONE.json"
    if marker.is_file():
        return str(root), np.load(root / "codebooks.npy")
    if root.exists():
        import shutil

        shutil.rmtree(root)
    books = _pq_codebooks(sf_dir, m, ks, seed)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    bref = ray.put(books)
    encoded = ds.map_batches(PqEncodeStage, fn_constructor_args=(bref,),
                             batch_format="pyarrow", batch_size=1024,
                             concurrency=(1, 2))
    root.mkdir(parents=True, exist_ok=True)
    encoded.write_parquet(str(root / "codes"))
    np.save(root / "codebooks.npy", books)
    marker.write_text(json.dumps({"sf_dir": sf_dir, "m": m, "ks": ks,
                                  "seed": seed}))
    return str(root), books


class AdcTopK:
    """Asymmetric-distance top-k per batch: each query's subspace
    distance table (m x ks integers, built ONCE from the broadcast
    codebooks) scores a code row as m table lookups — the scan never
    touches a float or a full vector."""

    def __init__(self, qids_ref, dtab_ref, k: int):
        import ray

        self.qids = ray.get(qids_ref)
        self.dtab = ray.get(dtab_ref)       # (q, m, ks) int64
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        codes = np.stack(batch.column("codes").to_numpy(
            zero_copy_only=False)).astype(np.int64)     # (b, m)
        q, m, _ = self.dtab.shape
        dist = np.zeros((q, len(ids)), np.int64)
        for s in range(m):
            dist += self.dtab[:, s, :][:, codes[:, s]]
        out_q, out_v, out_d = [], [], []
        k = min(self.k, len(ids))
        for qi in range(q):
            row = dist[qi]
            top = np.lexsort((ids, row))[:k]     # (dist asc, vec_id asc)
            out_q.append(np.full(k, self.qids[qi], np.int64))
            out_v.append(ids[top])
            out_d.append(row[top])
        return pa.table({"query_vec_id": int64_col(np.concatenate(out_q)),
                         "vec_id": int64_col(np.concatenate(out_v)),
                         "adc_d": int64_col(np.concatenate(out_d))})


def _merge_topk_asc_factory(k: int):
    def merge_topk_asc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc_d", "vec_id"],
                          ascending=[True, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_vec_id", "rank", "vec_id", "adc_d"]]

    merge_topk_asc.__name__ = "merge_topk_asc"
    return merge_topk_asc


def ann_pq_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10,
                m: int = _PQ_M, ks: int = _PQ_KS, seed: int = _PQ_SEED):
    """(query_vec_id, rank, vec_id, adc_d) — approximate top-k by
    asymmetric PQ distance over the persisted code layout: queries stay
    full-precision, the corpus is scanned as m-byte codes with
    table-lookup scoring (the memory-bandwidth path that makes
    billion-vector scans feasible). All-integer micro-unit distances,
    (adc_d asc, vec_id asc) ties — exact SQL replay; recall vs the
    exact baseline is tested."""
    import ray

    qids_list = query_ids or DEFAULT_QUERY_IDS
    qids, qmat = _query_matrix(sf_dir, qids_list)
    root, books = ensure_pq_index(sf_dir, m, ks, seed)
    qmicro = np.floor(qmat * _PQ_MICRO + 0.5)
    mm, kss, dsub = books.shape
    dtab = np.zeros((len(qids), mm, kss), np.int64)
    for s in range(mm):
        qs = qmicro[:, s * dsub:(s + 1) * dsub]        # (q, dsub)
        diff = qs[:, None, :] - books[s][None, :, :].astype(np.float64)
        dtab[:, s, :] = (diff * diff).sum(axis=2).astype(np.int64)
    qids_ref, dtab_ref = ray.put(qids), ray.put(dtab)
    from pathlib import Path

    files = sorted(str(f) for f in (Path(root) / "codes").glob("*.parquet"))
    local = ray.data.read_parquet(files).map_batches(
        AdcTopK, fn_constructor_args=(qids_ref, dtab_ref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _merge_topk_asc_factory(k), batch_format="pandas")


def ann_pq_topk_sql(sf_dir: str = _SF_ORACLE_DEFAULT,
                    query_ids: list[int] | None = None, k: int = 10,
                    m: int = _PQ_M, ks: int = _PQ_KS,
                    seed: int = _PQ_SEED) -> str:
    """Exact DuckDB replay: codebooks retrain from the same
    deterministic sample (no-Ray twin) and inline as BIGINT[] literals;
    encoding = per-subspace integer-L2 argmin (ties to the lowest code
    like np.argmin); ADC = the same m table lookups, summed."""
    books = _pq_codebooks(sf_dir, m, ks, seed, local=True)
    mm, kss, dsub = books.shape
    cent_rows = ",".join(
        f"({s},{c},[{','.join(str(int(x)) for x in books[s][c])}]::BIGINT[])"
        for s in range(mm) for c in range(kss))
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    return f"""
WITH cents(sub, code, v) AS (VALUES {cent_rows}),
sub_d AS (
  SELECT e.vec_id, ct.sub, ct.code,
         list_sum(list_transform(generate_series(1, {dsub}), j ->
           (CAST(floor(CAST(e.embedding[ct.sub * {dsub} + j] AS DOUBLE) * {_PQ_MICRO} + 0.5)
                 AS BIGINT) - ct.v[j])
           * (CAST(floor(CAST(e.embedding[ct.sub * {dsub} + j] AS DOUBLE) * {_PQ_MICRO} + 0.5)
                   AS BIGINT) - ct.v[j]))) AS d2
  FROM embeddings e CROSS JOIN cents ct),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY d2 ASC, code ASC) AS rn
    FROM sub_d) WHERE rn = 1),
qd AS (
  SELECT e.vec_id AS query_vec_id, ct.sub, ct.code,
         list_sum(list_transform(generate_series(1, {dsub}), j ->
           (CAST(floor(CAST(e.embedding[ct.sub * {dsub} + j] AS DOUBLE) * {_PQ_MICRO} + 0.5)
                 AS BIGINT) - ct.v[j])
           * (CAST(floor(CAST(e.embedding[ct.sub * {dsub} + j] AS DOUBLE) * {_PQ_MICRO} + 0.5)
                   AS BIGINT) - ct.v[j]))) AS d2
  FROM embeddings e CROSS JOIN cents ct WHERE e.vec_id IN ({ids})),
adc AS (
  SELECT qd.query_vec_id, c.vec_id, CAST(sum(qd.d2) AS BIGINT) AS adc_d
  FROM codes c JOIN qd ON qd.sub = c.sub AND qd.code = c.code
  GROUP BY qd.query_vec_id, c.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY adc_d ASC, vec_id ASC) AS rnk
  FROM adc)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, adc_d
FROM ranked WHERE rnk <= {k}
"""


# ---- IVF + PQ: coarse lists for I/O pruning, codes for scan bandwidth ----


def ensure_ivfpq_index(sf_dir: str, n_centroids: int = 16, m: int = _PQ_M,
                       ks: int = _PQ_KS, seed: int = _PQ_SEED
                       ) -> tuple[str, np.ndarray, np.ndarray]:
    """Build (once) the persisted IVF-PQ layout (the FAISS IVFPQ shape,
    ``by_residual=False``): every embedding assigned to its nearest
    coarse centroid AND compressed to m uint8 codes, written as
    ``list=<c>/`` parquet of code rows. Queries then prune I/O to
    ``nprobe`` lists and scan only m-byte codes — both levers of the
    billion-vector layout at once. Coarse centroids and codebooks train
    on the same bounded deterministic sample. Resumable via marker."""
    import hashlib
    import json
    from pathlib import Path

    import ray

    tag = hashlib.blake2b(
        f"{sf_dir}|ivfpq|{n_centroids}|{m}|{ks}|{seed}|{_fingerprint_of(sf_dir)}".encode(),
        digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_ivfpq_index/{tag}")
    marker = root / "_DONE.json"
    if marker.is_file():
        return (str(root), np.load(root / "centroids.npy"),
                np.load(root / "codebooks.npy"))
    if root.exists():
        import shutil

        shutil.rmtree(root)
    sample = _ivf_sample(sf_dir)
    centroids = _spherical_kmeans(sample, n_centroids, seed)
    books = _pq_train(sample, m, ks, seed)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cref, bref = ray.put(centroids), ray.put(books)

    class AssignEncode:
        def __init__(self, cref, bref):
            self.centroids = ray.get(cref)
            self.books = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = emb_matrix(batch.column("embedding"))
            assign = np.argmax(_normalize(emb) @ self.centroids.T, axis=1)
            codes = _pq_encode(emb, self.books)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "list": int64_col(assign.astype(np.int64)),
                "codes": pa.array(list(codes), pa.list_(pa.uint8()))})

    encoded = ds.map_batches(AssignEncode, fn_constructor_args=(cref, bref),
                             batch_format="pyarrow", batch_size=1024,
                             concurrency=(1, 2))
    encoded.write_parquet(str(root), partition_cols=["list"])
    np.save(root / "centroids.npy", centroids)
    np.save(root / "codebooks.npy", books)
    marker.write_text(json.dumps({"sf_dir": sf_dir, "n_centroids": n_centroids,
                                  "m": m, "ks": ks, "seed": seed}))
    return str(root), centroids, books


def ann_ivfpq_topk(sf_dir: str, query_ids: list[int] | None = None,
                   k: int = 10, n_centroids: int = 16, nprobe: int = 4,
                   m: int = _PQ_M, ks: int = _PQ_KS, seed: int = _PQ_SEED):
    """(query_vec_id, rank, vec_id, adc_d) — IVF-pruned, PQ-compressed
    approximate top-k: each query reads only its ``nprobe`` nearest
    lists' CODE rows (I/O pruning on top of the 32x payload compression)
    and scores them by integer ADC lookups. ``nprobe = n_centroids``
    reproduces ``ann_pq_topk`` exactly (tested)."""
    from pathlib import Path

    import ray

    qids_list = query_ids or DEFAULT_QUERY_IDS
    qids, qmat = _query_matrix(sf_dir, qids_list)
    root, centroids, books = ensure_ivfpq_index(sf_dir, n_centroids, m, ks,
                                                seed)
    sims = _normalize(qmat) @ centroids.T
    nprobe = min(nprobe, sims.shape[1])
    probe = set()
    for qi in range(len(qids)):
        for c in np.argsort(-sims[qi], kind="stable")[:nprobe]:
            probe.add(int(c))
    paths = [str(f) for c in sorted(probe)
             for p in [Path(root) / f"list={c}"] if p.is_dir()
             for f in sorted(p.glob("*.parquet"))]
    if not paths:
        return pa.table({"query_vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "adc_d": pa.array([], pa.int64())})
    qmicro = np.floor(qmat * _PQ_MICRO + 0.5)
    mm, kss, dsub = books.shape
    dtab = np.zeros((len(qids), mm, kss), np.int64)
    for s in range(mm):
        qs = qmicro[:, s * dsub:(s + 1) * dsub]
        diff = qs[:, None, :] - books[s][None, :, :].astype(np.float64)
        dtab[:, s, :] = (diff * diff).sum(axis=2).astype(np.int64)
    qids_ref, dtab_ref = ray.put(qids), ray.put(dtab)
    local = ray.data.read_parquet(paths, columns=["vec_id", "codes"]) \
        .map_batches(AdcTopK, fn_constructor_args=(qids_ref, dtab_ref, k),
                     batch_format="pyarrow", batch_size=4096,
                     concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _merge_topk_asc_factory(k), batch_format="pandas")


def ann_ivfpq_topk_sql(sf_dir: str = _SF_ORACLE_DEFAULT,
                       query_ids: list[int] | None = None, k: int = 10,
                       n_centroids: int = 16, nprobe: int = 4,
                       m: int = _PQ_M, ks: int = _PQ_KS,
                       seed: int = _PQ_SEED) -> str:
    """Exact replay: the IVF probe CTEs (inlined DOUBLE[] coarse
    centroids, argmax via DESC/ties-ASC row_number) restrict the
    candidate set; the PQ CTEs (inlined BIGINT[] codebooks) encode and
    ADC-score it — both retrained from the same deterministic sample."""
    centroids = _oracle_centroids(sf_dir, n_centroids, seed)
    books = _pq_codebooks(sf_dir, m, ks, seed, local=True)
    mm, kss, dsub = books.shape
    cent_rows = ",".join(f"({c},{_sql_vec(centroids[c])})"
                         for c in range(len(centroids)))
    book_rows = ",".join(
        f"({s},{c},[{','.join(str(int(x)) for x in books[s][c])}]::BIGINT[])"
        for s in range(mm) for c in range(kss))
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    nprobe = min(nprobe, len(centroids))
    return f"""
WITH cents(c, v) AS (VALUES {cent_rows}),
books(sub, code, v) AS (VALUES {book_rows}),
asg AS (
  SELECT e.vec_id, ct.c,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, ct.v) DESC, ct.c ASC) AS rn
  FROM embeddings e CROSS JOIN cents ct),
vl AS (SELECT vec_id, c AS list FROM asg WHERE rn = 1),
qp AS (
  SELECT e.vec_id AS query_vec_id, ct.c,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, ct.v) DESC, ct.c ASC) AS rn
  FROM embeddings e CROSS JOIN cents ct WHERE e.vec_id IN ({ids})),
probe AS (SELECT DISTINCT c FROM qp WHERE rn <= {nprobe}),
cand AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e JOIN vl ON vl.vec_id = e.vec_id
  WHERE vl.list IN (SELECT c FROM probe)),
sub_d AS (
  SELECT e.vec_id, ct.sub, ct.code,
         list_sum(list_transform(generate_series(1, {dsub}), j ->
           (CAST(floor(CAST(e.embedding[ct.sub * {dsub} + j] AS DOUBLE)
                       * {_PQ_MICRO} + 0.5) AS BIGINT) - ct.v[j])
           * (CAST(floor(CAST(e.embedding[ct.sub * {dsub} + j] AS DOUBLE)
                         * {_PQ_MICRO} + 0.5) AS BIGINT) - ct.v[j]))) AS d2
  FROM cand e CROSS JOIN books ct),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY d2 ASC, code ASC) AS rn
    FROM sub_d) WHERE rn = 1),
qd AS (
  SELECT e.vec_id AS query_vec_id, ct.sub, ct.code,
         list_sum(list_transform(generate_series(1, {dsub}), j ->
           (CAST(floor(CAST(e.embedding[ct.sub * {dsub} + j] AS DOUBLE)
                       * {_PQ_MICRO} + 0.5) AS BIGINT) - ct.v[j])
           * (CAST(floor(CAST(e.embedding[ct.sub * {dsub} + j] AS DOUBLE)
                         * {_PQ_MICRO} + 0.5) AS BIGINT) - ct.v[j]))) AS d2
  FROM embeddings e CROSS JOIN books ct WHERE e.vec_id IN ({ids})),
adc AS (
  SELECT qd.query_vec_id, c.vec_id, CAST(sum(qd.d2) AS BIGINT) AS adc_d
  FROM codes c JOIN qd ON qd.sub = c.sub AND qd.code = c.code
  GROUP BY qd.query_vec_id, c.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY adc_d ASC, vec_id ASC) AS rnk
  FROM adc)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, adc_d
FROM ranked WHERE rnk <= {k}
"""


# ---- IVF-PQ with RESIDUAL encoding (the full FAISS IVFPQ shape) ----


def _micro(m: np.ndarray) -> np.ndarray:
    return np.floor(m * _PQ_MICRO + 0.5)


def ensure_ivfpq_res_index(sf_dir: str, n_centroids: int = 16,
                           m: int = _PQ_M, ks: int = _PQ_KS,
                           seed: int = _PQ_SEED
                           ) -> tuple[str, np.ndarray, np.ndarray]:
    """IVF-PQ with residual encoding (``by_residual=True``): each vector
    stores PQ codes of ``micro(x) − micro(centroid[list])`` — residuals
    concentrate near zero, so the same 4-bit budget spends on a far
    smaller cube than raw coordinates. Residuals are integer
    differences of micro-quantized values, so encoding and ADC stay
    exact integer arithmetic (SQL-replayable) like the plain PQ path.
    Codebooks train on the SAMPLE's residuals under the same coarse
    assignment rule."""
    import hashlib
    import json
    from pathlib import Path

    import ray

    tag = hashlib.blake2b(
        f"{sf_dir}|ivfpqres|{n_centroids}|{m}|{ks}|{seed}|{_fingerprint_of(sf_dir)}".encode(),
        digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_ivfpq_res_index/{tag}")
    marker = root / "_DONE.json"
    if marker.is_file():
        return (str(root), np.load(root / "centroids.npy"),
                np.load(root / "codebooks.npy"))
    if root.exists():
        import shutil

        shutil.rmtree(root)
    sample = _ivf_sample(sf_dir)
    centroids = _spherical_kmeans(sample, n_centroids, seed)
    cmicro = _micro(centroids)
    assign = np.argmax(_normalize(sample) @ centroids.T, axis=1)
    residuals = (_micro(sample) - cmicro[assign]) / _PQ_MICRO
    books = _pq_train(residuals, m, ks, seed)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cref, bref = ray.put(centroids), ray.put(books)

    class AssignEncodeRes:
        def __init__(self, cref, bref):
            self.centroids = ray.get(cref)
            self.cmicro = _micro(self.centroids)
            self.books = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = emb_matrix(batch.column("embedding"))
            a = np.argmax(_normalize(emb) @ self.centroids.T, axis=1)
            res = (_micro(emb) - self.cmicro[a]) / _PQ_MICRO
            codes = _pq_encode(res, self.books)
            # "lst" duplicates the partition key as a DATA column so
            # queries read probed dirs in ONE read_parquet call (hive
            # partition columns vanish when leaf files are read
            # directly, and per-list tagged reads build a union chain
            # whose scheduling overhead dwarfs the scan)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "list": int64_col(a.astype(np.int64)),
                "lst": int64_col(a.astype(np.int64)),
                "codes": pa.array(list(codes), pa.list_(pa.uint8()))})

    ds.map_batches(AssignEncodeRes, fn_constructor_args=(cref, bref),
                   batch_format="pyarrow", batch_size=1024,
                   concurrency=(1, 2)).write_parquet(
        str(root), partition_cols=["list"])
    np.save(root / "centroids.npy", centroids)
    np.save(root / "codebooks.npy", books)
    marker.write_text(json.dumps({"sf_dir": sf_dir}))
    return str(root), centroids, books


def ann_ivfpq_res_topk(sf_dir: str, query_ids: list[int] | None = None,
                       k: int = 10, n_centroids: int = 16, nprobe: int = 4,
                       m: int = _PQ_M, ks: int = _PQ_KS,
                       seed: int = _PQ_SEED):
    """(query_vec_id, rank, vec_id, adc_d) — residual IVF-PQ top-k: the
    query builds ONE distance table per PROBED LIST (its residual
    against that list's centroid), then scans that list's code rows.
    All-integer ADC; probed lists read from the ``list=<c>/`` layout."""
    from pathlib import Path

    import ray

    qids_list = query_ids or DEFAULT_QUERY_IDS
    qids, qmat = _query_matrix(sf_dir, qids_list)
    root, centroids, books = ensure_ivfpq_res_index(sf_dir, n_centroids,
                                                    m, ks, seed)
    cmicro = _micro(centroids)
    sims = _normalize(qmat) @ centroids.T
    nprobe = min(nprobe, sims.shape[1])
    probe_per_q = [set(np.argsort(-sims[qi], kind="stable")[:nprobe]
                       .tolist()) for qi in range(len(qids))]
    probe = sorted(set().union(*probe_per_q))
    mm, kss, dsub = books.shape
    qmicro = _micro(qmat)
    # per (probed list, query): the residual distance table — m x ks ints
    dtabs = {}
    for c in probe:
        rq = (qmicro - cmicro[c])                      # (q, d) ints
        dt = np.zeros((len(qids), mm, kss), np.int64)
        for s in range(mm):
            qs = rq[:, s * dsub:(s + 1) * dsub]
            diff = qs[:, None, :] - books[s][None, :, :].astype(np.float64)
            dt[:, s, :] = (diff * diff).sum(axis=2).astype(np.int64)
        dtabs[c] = dt
    # a query only scores lists IT probed: mask others to +inf
    big = np.int64(2 ** 62)
    for c in probe:
        for qi in range(len(qids)):
            if c not in probe_per_q[qi]:
                dtabs[c][qi, :, :] = big // mm
    paths = [str(f) for c in probe
             for p in [Path(root) / f"list={c}"] if p.is_dir()
             for f in sorted(p.glob("*.parquet"))]
    if not paths:
        return pa.table({"query_vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "adc_d": pa.array([], pa.int64())})
    pruned = ray.data.read_parquet(paths, columns=["vec_id", "lst", "codes"])
    qids_ref = ray.put(qids)
    dtabs_ref = ray.put(dtabs)

    class ResAdcTopK:
        def __init__(self, qids_ref, dtabs_ref, k):
            self.qids = ray.get(qids_ref)
            self.dtabs = ray.get(dtabs_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            lists = batch.column("lst").to_numpy(
                zero_copy_only=False).astype(np.int64)
            codes = np.stack(batch.column("codes").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            q = len(self.qids)
            dist = np.zeros((q, len(ids)), np.int64)
            for c in np.unique(lists):
                sel = np.flatnonzero(lists == c)
                dt = self.dtabs[int(c)]
                for s in range(dt.shape[1]):
                    dist[:, sel] += dt[:, s, :][:, codes[sel, s]]
            out_q, out_v, out_d = [], [], []
            kk = min(self.k, len(ids))
            for qi in range(q):
                row = dist[qi]
                ok = np.flatnonzero(row < big)
                top = ok[np.lexsort((ids[ok], row[ok]))[:kk]]
                out_q.append(np.full(len(top), self.qids[qi], np.int64))
                out_v.append(ids[top])
                out_d.append(row[top])
            return pa.table({
                "query_vec_id": int64_col(np.concatenate(out_q)),
                "vec_id": int64_col(np.concatenate(out_v)),
                "adc_d": int64_col(np.concatenate(out_d))})

    local = pruned.map_batches(
        ResAdcTopK, fn_constructor_args=(qids_ref, dtabs_ref, k),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _merge_topk_asc_factory(k), batch_format="pandas")


def ann_ivfpq_res_topk_sql(sf_dir: str = _SF_ORACLE_DEFAULT,
                           query_ids: list[int] | None = None, k: int = 10,
                           n_centroids: int = 16, nprobe: int = 4,
                           m: int = _PQ_M, ks: int = _PQ_KS,
                           seed: int = _PQ_SEED) -> str:
    """Exact replay: coarse centroids inline twice (DOUBLE[] for the
    float argmax assignment, BIGINT[] micro for the integer residuals);
    residual codebooks retrain from the same sample. A candidate scores
    against a query ONLY through lists that query probed."""
    centroids = _oracle_centroids(sf_dir, n_centroids, seed)
    cmicro = _micro(centroids).astype(np.int64)
    sample = _ivf_sample_local(sf_dir)
    assign = np.argmax(_normalize(sample) @ centroids.T, axis=1)
    residuals = (_micro(sample) - cmicro[assign]) / _PQ_MICRO
    books = _pq_train(residuals, m, ks, seed)
    mm, kss, dsub = books.shape
    cent_rows = ",".join(f"({c},{_sql_vec(centroids[c])},"
                         f"[{','.join(str(int(x)) for x in cmicro[c])}]::BIGINT[])"
                         for c in range(len(centroids)))
    book_rows = ",".join(
        f"({s},{c},[{','.join(str(int(x)) for x in books[s][c])}]::BIGINT[])"
        for s in range(mm) for c in range(kss))
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    nprobe = min(nprobe, len(centroids))
    micro_expr = ("CAST(floor(CAST(e.embedding[{i}] AS DOUBLE) * "
                  f"{_PQ_MICRO} + 0.5) AS BIGINT)")
    res_j = (micro_expr.format(i=f"ct.sub * {dsub} + j")
             + " - cm.vm[ct.sub * {d} + j]".format(d=dsub))
    return f"""
WITH cents(c, v, vm) AS (VALUES {cent_rows}),
books(sub, code, v) AS (VALUES {book_rows}),
asg AS (
  SELECT e.vec_id, ct.c,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, ct.v) DESC, ct.c ASC) AS rn
  FROM embeddings e CROSS JOIN cents ct),
vl AS (SELECT vec_id, c AS list FROM asg WHERE rn = 1),
qp AS (
  SELECT e.vec_id AS query_vec_id, ct.c,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, ct.v) DESC, ct.c ASC) AS rn
  FROM embeddings e CROSS JOIN cents ct WHERE e.vec_id IN ({ids})),
probe AS (SELECT query_vec_id, c FROM qp WHERE rn <= {nprobe}),
sub_d AS (
  SELECT e.vec_id, ct.sub, ct.code,
         list_sum(list_transform(generate_series(1, {dsub}), j ->
           ({res_j} - ct.v[j]) * ({res_j} - ct.v[j]))) AS d2
  FROM embeddings e
  JOIN vl ON vl.vec_id = e.vec_id
  JOIN cents cm ON cm.c = vl.list
  CROSS JOIN books ct
  WHERE vl.list IN (SELECT DISTINCT c FROM probe)),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY d2 ASC, code ASC) AS rn
    FROM sub_d) WHERE rn = 1),
qd AS (
  SELECT e.vec_id AS query_vec_id, p.c AS list, ct.sub, ct.code,
         list_sum(list_transform(generate_series(1, {dsub}), j ->
           ({res_j} - ct.v[j]) * ({res_j} - ct.v[j]))) AS d2
  FROM embeddings e
  JOIN probe p ON p.query_vec_id = e.vec_id
  JOIN cents cm ON cm.c = p.c
  CROSS JOIN books ct
  WHERE e.vec_id IN ({ids})),
adc AS (
  SELECT qd.query_vec_id, c.vec_id, CAST(sum(qd.d2) AS BIGINT) AS adc_d
  FROM vl
  JOIN codes c ON c.vec_id = vl.vec_id
  JOIN qd ON qd.list = vl.list AND qd.sub = c.sub AND qd.code = c.code
  GROUP BY qd.query_vec_id, c.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY adc_d ASC, vec_id ASC) AS rnk
  FROM adc)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, adc_d
FROM ranked WHERE rnk <= {k}
"""


# ---- embedding PCA: distributed covariance + first principal score ----

_PCA_ITERS = 100


def _pca_eigvec_from_moments(n: int, sx: np.ndarray, sxx: np.ndarray
                             ) -> np.ndarray:
    """First eigenvector of the integer scatter matrix
    ``n·Σxxᵀ − Σx Σxᵀ`` (python-int exact, then float-normalized) via
    ``_PCA_ITERS`` deterministic power iterations from the all-ones
    vector; sign fixed so the largest-|component| entry is positive.
    Both the engine and the oracle generator call THIS function on the
    same integer moments, so the eigenvector is bit-identical."""
    d = len(sx)
    c = [[n * int(sxx[i, j]) - int(sx[i]) * int(sx[j]) for j in range(d)]
         for i in range(d)]
    mx = max(max(abs(v) for v in row) for row in c) or 1
    cf = np.array(c, dtype=np.float64) / mx
    v = np.ones(d) / np.sqrt(d)
    for _ in range(_PCA_ITERS):
        v = cf @ v
        v = v / np.linalg.norm(v)
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return v


def embedding_pca(sf_dir: str):
    """(vec_id, pc1_u) — every embedding's coordinate along the corpus's
    first principal component, in exact integer µ²-units: the
    distributed-linear-algebra operator class (one pass of integer
    covariance partials → a d×d driver eigenproblem → one vectorized
    projection pass). Vectors quantize to micro ints; per-batch moment
    partials (Σx and the upper triangle of Σxxᵀ) are exact int64 rows
    keyed by flattened position, folded by ONE bounded groupby (≤
    d(d+3)/2 + 1 keys — corpus-size-independent); the scatter matrix
    assembles in python ints (no overflow), the eigenvector comes from
    deterministic power iteration, quantizes to micro ints, and the
    projection Σ micro(x)·E is pure integer arithmetic — SQL-replayable
    with the eigenvector inlined."""
    from ray.data.aggregate import Sum

    first = read(sf_dir, "embeddings", ["embedding"]).take(1)
    d = len(first[0]["embedding"])
    tri_i, tri_j = np.triu_indices(d)

    class CovPartial:
        def __call__(self, batch: pa.Table) -> pa.Table:
            v = np.floor(emb_matrix(batch.column("embedding"))
                         * _PQ_MICRO + 0.5)
            n = len(v)
            # exact: micro² products ≤ ~3e11, summed over ≤1024 rows
            # stays far under 2^53 in the float64 BLAS
            m = v.T @ v
            s = v.sum(axis=0)
            keys = np.concatenate([
                np.array([0], np.int64),
                1 + np.arange(d, dtype=np.int64),
                1 + d + (tri_i * d + tri_j).astype(np.int64)])
            vals = np.concatenate([
                np.array([n], np.int64),
                s.astype(np.int64),
                m[tri_i, tri_j].astype(np.int64)])
            return pa.table({"k": int64_col(keys), "v_p": int64_col(vals)})

    rows = read(sf_dir, "embeddings", ["embedding"]).map_batches(
        CovPartial, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 2)).groupby("k").aggregate(
        Sum("v_p", alias_name="v")).take_all()
    byk = {int(r["k"]): int(r["v"]) for r in rows}
    n = byk[0]
    sx = np.array([byk[1 + i] for i in range(d)], dtype=object)
    sxx = np.zeros((d, d), dtype=object)
    for i, j in zip(tri_i, tri_j):
        sxx[i, j] = sxx[j, i] = byk[1 + d + i * d + j]
    v = _pca_eigvec_from_moments(n, sx, sxx)
    e_int = np.floor(v * _PQ_MICRO + 0.5).astype(np.int64)

    import ray

    eref = ray.put(e_int)

    class Project:
        def __init__(self, eref):
            self.e = ray.get(eref).astype(np.float64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            micro = np.floor(emb_matrix(batch.column("embedding"))
                             * _PQ_MICRO + 0.5)
            score = (micro @ self.e).astype(np.int64)
            return pa.table({
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "pc1_u": int64_col(score)})

    return read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        Project, fn_constructor_args=(eref,), batch_format="pyarrow",
        batch_size=1024, concurrency=(1, 2))


def embedding_pca_sql(sf_dir: str = _SF_ORACLE_DEFAULT) -> str:
    """Replays the projection with the eigenvector inlined: the
    generator recomputes the SAME integer moments from the table
    locally and runs the same power iteration."""
    import duckdb

    con = duckdb.connect()
    mat = np.array(
        [r[0] for r in con.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
            f"ORDER BY vec_id").fetchall()], dtype=np.float64)
    micro = np.floor(mat * _PQ_MICRO + 0.5)
    d = micro.shape[1]
    sx = np.array([int(x) for x in micro.sum(axis=0)], dtype=object)
    sxx = (micro.T @ micro)
    v = _pca_eigvec_from_moments(len(micro), sx, sxx.astype(np.int64))
    e_int = np.floor(v * _PQ_MICRO + 0.5).astype(np.int64)
    e_sql = "[" + ",".join(str(int(x)) for x in e_int) + "]::BIGINT[]"
    return f"""
SELECT vec_id,
       CAST(list_sum(list_transform(generate_series(1, {d}), j ->
            CAST(floor(CAST(embedding[j] AS DOUBLE) * {_PQ_MICRO} + 0.5)
                 AS BIGINT) * ({e_sql})[j])) AS BIGINT) AS pc1_u
FROM embeddings
"""


# ---- scalar-quantized (SQ8) ANN with exact rerank ----


def _sq8_minmax(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension global [min, max] of the integer-micro embedding
    values — the SQ8 codebook. One pass of bounded per-batch partials
    (d rows each, corpus-size-independent) folded by ONE d-key groupby;
    the d-row driver pull is the documented bounded exception, like the
    IVF training sample (`_ivf_sample`)."""
    from ray.data.aggregate import Max, Min

    def minmax_partial(batch: pa.Table) -> pa.Table:
        mat = emb_matrix(batch.column("embedding"))
        micro = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
        d = micro.shape[1]
        return pa.table({
            "dim": int64_col(np.arange(1, d + 1, dtype=np.int64)),
            "min_p": int64_col(micro.min(axis=0)),
            "max_p": int64_col(micro.max(axis=0))})

    agg = read(sf_dir, "embeddings", ["embedding"]).map_batches(
        minmax_partial, batch_format="pyarrow", batch_size=4096
    ).groupby("dim").aggregate(Min("min_p", alias_name="mind"),
                               Max("max_p", alias_name="maxd"))
    rows = sorted(agg.take_all(), key=lambda r: r["dim"])
    mind = np.array([r["mind"] for r in rows], dtype=np.int64)
    maxd = np.array([r["maxd"] for r in rows], dtype=np.int64)
    return mind, maxd


def _sq8_encode(mat: np.ndarray, mind: np.ndarray, rng: np.ndarray) -> np.ndarray:
    """uint8 codes via EXACT integer floor division — both operands are
    non-negative, so numpy's int64 ``//`` and DuckDB's ``//`` agree
    bit-for-bit (no float quotient anywhere). Constant dims code to 0."""
    micro = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
    safe = np.where(rng > 0, rng, 1)
    codes = (micro - mind[None, :]) * 255 // safe[None, :]
    return np.where(rng[None, :] > 0, codes, 0)


def _sq8_recon(codes: np.ndarray, mind: np.ndarray, rng: np.ndarray) -> np.ndarray:
    """Dequantized micro values: mind + code*rng // 255 — exact integer,
    within rng/255 of the true micro per element (FAISS-style SQ
    reconstruction, integerized)."""
    return mind[None, :] + codes * rng[None, :] // 255


def _int_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,d) @ (m,d).T with EXACT int64 results: runs as one float64
    dgemm when every possible sum fits 2^53 (|micro| <= ~4e6 keeps
    d <= ~500 safe), else falls back to the exact-but-slow int64
    matmul — same guard philosophy as `_kmeans_assign`."""
    bound = float(max(np.abs(a).max(initial=1), 1)) * \
        float(max(np.abs(b).max(initial=1), 1)) * a.shape[1]
    if bound < 2.0 ** 53:
        return (a.astype(np.float64) @ b.astype(np.float64).T).astype(np.int64)
    return a @ b.T


class _Sq8TopK:
    """Per-batch SQ8 scan: dequantized-code integer dot products (the
    4x-smaller scan a production SQ index runs), then EXACT integer
    rerank of only the local candidate set — blocks emit at most
    q x n_cand rows, never vectors."""

    def __init__(self, qids_ref, qmat_ref, mind_ref, rng_ref,
                 n_cand: int):
        import ray

        self.qids = ray.get(qids_ref)
        qmat = ray.get(qmat_ref)
        self.mind = ray.get(mind_ref)
        self.rng = ray.get(rng_ref)
        self.qmicro = np.floor(qmat * 1_000_000 + 0.5).astype(np.int64)
        qcodes = _sq8_encode(qmat, self.mind, self.rng)
        self.qrecon = _sq8_recon(qcodes, self.mind, self.rng)
        self.n_cand = n_cand

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = emb_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _sq8_encode(emb, self.mind, self.rng)
        recon = _sq8_recon(codes, self.mind, self.rng)
        sq = _int_dot(self.qrecon, recon)                         # (q, b)
        micro = np.floor(emb * 1_000_000 + 0.5).astype(np.int64)
        out_q, out_v, out_s, out_d = [], [], [], []
        c = min(self.n_cand, sq.shape[1])
        for qi in range(len(self.qids)):
            row = sq[qi]
            top = np.lexsort((ids, -row))[:c]
            exact = np.einsum("j,ij->i", self.qmicro[qi], micro[top])
            out_q.append(np.full(c, self.qids[qi], dtype=np.int64))
            out_v.append(ids[top])
            out_s.append(row[top])
            out_d.append(exact)
        return pa.table({"query_vec_id": int64_col(np.concatenate(out_q)),
                         "vec_id": int64_col(np.concatenate(out_v)),
                         "sq_score": int64_col(np.concatenate(out_s)),
                         "dot_micro2": int64_col(np.concatenate(out_d))})


def _sq8_merge_factory(k: int, n_cand: int):
    def merge_sq8(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sq_score", "vec_id"],
                          ascending=[False, True]).head(n_cand)
        g = g.sort_values(["dot_micro2", "vec_id"],
                          ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_vec_id", "rank", "vec_id", "sq_score", "dot_micro2"]]

    merge_sq8.__name__ = "merge_sq8"
    return merge_sq8


def ann_sq8_topk(sf_dir: str, query_ids: list[int] | None = None,
                 k: int = 10, n_cand: int = 50):
    """(query_vec_id, rank, vec_id, sq_score, dot_micro2) — top-k
    MAX-INNER-PRODUCT retrieval via int8 SCALAR QUANTIZATION with exact
    rerank: the memory-tier ANN layout beside PQ (`ann_pq_topk`) — 4x
    smaller scans, one dgemm over dequantized codes per block, and only
    the global top-``n_cand`` candidates per query are ever rescored at
    full precision.

    EXACT-INTEGER end to end: codebook = per-dim global [min,max] of
    integer-micro values (one bounded-partial pass);
    code = (micro-min)*255 // (max-min) and recon = min + code*rng//255
    are pure integer floor arithmetic, so the proxy score
    sq_score = <recon_q, recon_c> and the rerank metric
    dot_micro2 = <micro_q, micro_c> (inner product in micro^2 units —
    the MIPS objective) are identical on any cluster shape and replay
    bit-for-bit in SQL, with no float anywhere a knife-edge could
    live. Candidates = global top-n_cand by (sq_score desc, vec_id
    asc); output = those reranked by (dot_micro2 desc, vec_id asc).
    Local top-n_cand per block covers the global candidate set; blocks
    emit q x n_cand rows, never vectors. Recall vs the exact MIPS
    top-k is bounded by the reconstruction error d*rng/255*|micro| and
    tested (`test_ann_sq8_recall_vs_exact_mips`)."""
    import ray

    qids_list = query_ids or DEFAULT_QUERY_IDS
    qids, qmat = _query_matrix(sf_dir, qids_list)
    mind, maxd = _sq8_minmax(sf_dir)
    rng = maxd - mind
    refs = (ray.put(qids), ray.put(qmat), ray.put(mind), ray.put(rng))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    local = ds.map_batches(_Sq8TopK, fn_constructor_args=(*refs, n_cand),
                           batch_format="pyarrow", batch_size=1024,
                           concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _sq8_merge_factory(k, n_cand), batch_format="pandas")


def ann_sq8_topk_sql(query_ids: list[int] | None = None, k: int = 10,
                     n_cand: int = 50) -> str:
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    return f"""
WITH u AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS micro
  FROM embeddings),
mm AS (SELECT dim, min(micro) AS mind, max(micro) AS maxd FROM u GROUP BY dim),
c AS (
  SELECT u.vec_id, u.dim, u.micro,
         mm.mind + (CASE WHEN mm.maxd > mm.mind
                         THEN (u.micro - mm.mind) * 255 // (mm.maxd - mm.mind)
                         ELSE 0 END) * (mm.maxd - mm.mind) // 255 AS recon
  FROM u JOIN mm USING (dim)),
qc AS (SELECT vec_id AS query_vec_id, dim, micro AS qmicro, recon AS qrecon
       FROM c WHERE vec_id IN ({ids})),
sq AS (
  SELECT qc.query_vec_id, c.vec_id,
         CAST(sum(qc.qrecon * c.recon) AS BIGINT) AS sq_score,
         CAST(sum(qc.qmicro * c.micro) AS BIGINT) AS dot_micro2
  FROM qc JOIN c USING (dim)
  GROUP BY qc.query_vec_id, c.vec_id),
cand AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY sq_score DESC, vec_id ASC) AS crnk
  FROM sq),
ranked AS (
  SELECT query_vec_id, vec_id, sq_score, dot_micro2,
         row_number() OVER (PARTITION BY query_vec_id
                            ORDER BY dot_micro2 DESC, vec_id ASC) AS rnk
  FROM cand WHERE crnk <= {n_cand})
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, sq_score, dot_micro2
FROM ranked WHERE rnk <= {k}
"""


# ---- label-centroid outlier audit ----


class _OutlierScan:
    """Zero-shuffle scan: d2 to the own-label centroid in exact integer
    micro^2 units, per-block local top-m per label (blocks emit at most
    labels x m rows, never vectors)."""

    def __init__(self, cent_ref, m: int):
        import ray

        labels, cmat = ray.get(cent_ref)
        self.lab_sorted = labels                       # (L,) int64 sorted
        self.cmat = cmat                               # (L, d) int64
        self.m = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = emb_matrix(batch.column("embedding"))
        micro = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        labs = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(self.lab_sorted, labs)
        diff = micro - self.cmat[pos]
        d2 = np.einsum("ij,ij->i", diff, diff)         # |diff|<=4e6 => <2^54*d, int64-safe
        out_l, out_v, out_d = [], [], []
        for lab in np.unique(labs):
            sel = np.nonzero(labs == lab)[0]
            top = sel[np.lexsort((vids[sel], -d2[sel]))[:self.m]]
            out_l.append(labs[top])
            out_v.append(vids[top])
            out_d.append(d2[top])
        return pa.table({"label": int64_col(np.concatenate(out_l)),
                         "vec_id": int64_col(np.concatenate(out_v)),
                         "d2": int64_col(np.concatenate(out_d))})


def _outlier_merge_factory(m: int):
    def merge_outliers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["d2", "vec_id"], ascending=[False, True]).head(m).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["label", "rank", "vec_id", "d2"]]

    merge_outliers.__name__ = "merge_outliers"
    return merge_outliers


def doc_outlier_score(sf_dir: str, m: int = 20):
    """(label, rank, vec_id, d2) — the top-m embeddings FURTHEST from
    their own label's centroid, per label: the mislabeled-example /
    outlier audit a curation pipeline runs before training (cf. the
    class-concentration view in `label_cohesion`; this names the
    individual suspects).

    Centroids come from the bounded `label_centroids` aggregate
    (labels x d integer rows — the driver pull is corpus-size-
    independent) and broadcast ONCE via ray.put; the scan is one
    zero-shuffle map_batches computing exact integer squared distance
    to the own-label mean (micro units — no float accumulates, so d2
    is identical on any cluster shape). Per-block local top-m per
    label bounds the merge groupby at labels x m x blocks rows."""
    import ray

    rows = sorted(label_centroids(sf_dir).take_all(),
                  key=lambda r: (r["label"], r["dim"]))
    labels = np.array(sorted({r["label"] for r in rows}), dtype=np.int64)
    d = max(r["dim"] for r in rows)
    cmat = np.zeros((len(labels), d), dtype=np.int64)
    lpos = {int(l): i for i, l in enumerate(labels)}
    for r in rows:
        cmat[lpos[int(r["label"])], int(r["dim"]) - 1] = int(r["mean_micro"])
    cent_ref = ray.put((labels, cmat))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    local = ds.map_batches(_OutlierScan, fn_constructor_args=(cent_ref, m),
                           batch_format="pyarrow", batch_size=4096,
                           concurrency=(1, 2))
    return local.groupby("label").map_groups(
        _outlier_merge_factory(m), batch_format="pandas")


def doc_outlier_score_sql(m: int = 20) -> str:
    return f"""
WITH u AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS micro
  FROM embeddings),
agg AS (
  SELECT label, dim, count(*) AS n_vecs, sum(micro) AS sum_micro
  FROM u GROUP BY label, dim),
cent AS (
  SELECT label, dim,
         CAST(floor(CAST(sum_micro AS DOUBLE) / n_vecs + 0.5) AS BIGINT)
           AS mean_micro
  FROM agg),
d2v AS (
  SELECT u.vec_id, u.label,
         CAST(sum((u.micro - cent.mean_micro) * (u.micro - cent.mean_micro))
              AS BIGINT) AS d2
  FROM u JOIN cent USING (label, dim)
  GROUP BY u.vec_id, u.label),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY label
                               ORDER BY d2 DESC, vec_id ASC) AS rnk
  FROM d2v)
SELECT label, CAST(rnk AS BIGINT) AS rank, vec_id, d2
FROM ranked WHERE rnk <= {m}
"""


# ---- metadata-filtered ANN (the vector-DB filter clause) ----


class _FilteredCosineTopK:
    """Per-batch exact cosine under a PER-QUERY label predicate: rows
    matching no query's label drop before the matmul (the pushdown),
    then each query's top-k selects only same-label columns. Blocks
    emit q x k rows."""

    def __init__(self, qids_ref, qmat_ref, qlab_ref, k: int):
        import ray

        self.qids = ray.get(qids_ref)
        self.qmat = _normalize(ray.get(qmat_ref))
        self.qlabs = ray.get(qlab_ref)               # (q,) int64
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        labs = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        want = np.isin(labs, self.qlabs)
        if not want.any():
            return pa.table({"query_vec_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine_bp": pa.array([], pa.int64())})
        batch = batch.filter(pa.array(want))
        labs = labs[want]
        emb = _normalize(emb_matrix(batch.column("embedding")))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sims_bp = bp(self.qmat @ emb.T)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qids)):
            sel = np.nonzero(labs == self.qlabs[qi])[0]
            if not len(sel):
                continue
            k = min(self.k, len(sel))
            row = sims_bp[qi][sel]
            top = sel[np.lexsort((ids[sel], -row))[:k]]
            out_q.append(np.full(k, self.qids[qi], dtype=np.int64))
            out_v.append(ids[top])
            out_s.append(sims_bp[qi][top])
        if not out_q:
            return pa.table({"query_vec_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine_bp": pa.array([], pa.int64())})
        return pa.table({"query_vec_id": int64_col(np.concatenate(out_q)),
                         "vec_id": int64_col(np.concatenate(out_v)),
                         "cosine_bp": int64_col(np.concatenate(out_s))})


def ann_filtered_topk(sf_dir: str, query_ids: list[int] | None = None,
                      k: int = 10):
    """(query_vec_id, rank, vec_id, cosine_bp) — top-k nearest neighbors
    RESTRICTED to each query's own label: metadata-filtered vector
    search, the filter-clause pattern every production vector store
    supports (filtered retrieval / same-class nearest neighbors).

    Shape: the per-query label predicate broadcasts with the query
    matrix; non-matching rows drop BEFORE the matmul (predicate
    pushdown — at a selective filter the scan cost falls
    proportionally); per-block top-k + the bounded merge of
    `ann_topk`. Post-filtering a plain top-k would UNDER-fill k when
    matches are rare — this filters first, so k is exact whenever the
    label has >= k members."""
    import ray

    qids_list = query_ids or DEFAULT_QUERY_IDS
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id IN ({','.join(map(str, qids_list))}) ORDER BY vec_id"
    ).fetchall()
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qmat = np.array([r[1] for r in rows], dtype=np.float64)
    qlabs = np.array([r[2] for r in rows], dtype=np.int64)
    refs = (ray.put(qids), ray.put(qmat), ray.put(qlabs))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    local = ds.map_batches(_FilteredCosineTopK, fn_constructor_args=(*refs, k),
                           batch_format="pyarrow", batch_size=1024,
                           concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")


def ann_filtered_topk_sql(query_ids: list[int] | None = None,
                          k: int = 10) -> str:
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    return f"""
WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qe, label
           FROM embeddings WHERE vec_id IN ({ids})),
sims AS (
  SELECT q.query_vec_id, e.vec_id,
         CAST(floor(list_cosine_similarity(q.qe, e.embedding) * 10000 + 0.5)
              AS BIGINT) AS cosine_bp
  FROM q JOIN embeddings e ON e.label = q.label),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY cosine_bp DESC, vec_id ASC) AS rnk
  FROM sims)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, cosine_bp
FROM ranked WHERE rnk <= {k}
"""


# ------------------- exact k-NN graph over embeddings -------------------


class _KnnGraphStage:
    """map_batches: each block's rows vs the broadcast corpus matrix —
    one matmul, per-row top-k excluding self, ties (bp desc, nbr asc).
    Every row's FULL comparison set lives in this one task, so the
    result is final per row: no downstream merge groupby at all."""

    def __init__(self, mat_ref, ids_ref, k: int):
        import ray

        self.mat = ray.get(mat_ref)             # (N, d), L2-normalized
        self.ids = ray.get(ids_ref)             # (N,)
        self.k = k

    def _topk(self, row: np.ndarray, self_id: int) -> np.ndarray:
        """Exact top-k candidate indices by (bp DESC, vec_id ASC),
        self excluded. O(N) argpartition pre-select (a full per-row
        lexsort is O(N log N) PER ROW — measured intractable at 100k
        vectors): everything strictly above the k-th value is in;
        boundary ties resolve by the same lexsort over the small
        >= -threshold set, so results are bit-identical to the naive
        sort (the hash oracle's order)."""
        cand = np.flatnonzero(self.ids != self_id)
        if len(cand) > 4 * self.k:
            r = cand_r = row[cand]
            kth = min(self.k, len(cand)) - 1
            thr = r[np.argpartition(-r, kth)[kth]]
            keep = cand[cand_r >= thr]          # ties included; small
        else:
            keep = cand
        return keep[np.lexsort((self.ids[keep], -row[keep]))[:self.k]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(emb_matrix(batch.column("embedding")))
        ids = batch.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sims_bp = bp(emb @ self.mat.T)                    # (b, N) int64
        out_v, out_r, out_n, out_s = [], [], [], []
        for i in range(len(ids)):
            row = sims_bp[i]
            top = self._topk(row, int(ids[i]))
            kk = len(top)
            out_v.append(np.full(kk, ids[i], np.int64))
            out_r.append(np.arange(1, kk + 1, dtype=np.int64))
            out_n.append(self.ids[top])
            out_s.append(row[top])
        return pa.table({
            "vec_id": int64_col(np.concatenate(out_v) if out_v else
                                np.empty(0, np.int64)),
            "rank": int64_col(np.concatenate(out_r) if out_r else
                              np.empty(0, np.int64)),
            "nbr_id": int64_col(np.concatenate(out_n) if out_n else
                                np.empty(0, np.int64)),
            "cosine_bp": int64_col(np.concatenate(out_s) if out_s else
                                   np.empty(0, np.int64))})


def knn_graph(sf_dir: str, k: int = 5):
    """(vec_id, rank, nbr_id, cosine_bp) — every vector's exact k
    nearest neighbours by cosine (self excluded): the k-NN GRAPH that
    seeds HNSW construction, UMAP/t-SNE layouts, label propagation and
    graph-based dedup clustering. ``ann_topk`` answers a bounded query
    set; this materializes the all-vectors graph.

    Shape: the corpus matrix broadcasts ONCE (``ray.put``, zero-copy
    into every task) and each block does one (b x d) @ (d x N) matmul;
    a row's whole comparison set sits in its own task, so rows finalize
    locally — zero shuffle, no merge stage. This is the exact
    O(N^2/cluster) baseline, same contract as ``embedding_near_dups``;
    at 100 TB the scale path is the bucketed approximate graph (IVF
    lists / LSH buckets as in ``semdedup`` / ``ann_lsh_topk``:
    within-bucket exact, recall audited against this baseline on a
    sample)."""
    import pyarrow.parquet as pq
    import ray

    from searchengine_ray.pipelines.common import table_path

    tbl = pq.read_table(table_path(sf_dir, "embeddings"),
                        columns=["vec_id", "embedding"])
    mat_ref = ray.put(_normalize(emb_matrix(tbl.column("embedding"))))
    ids_ref = ray.put(tbl.column("vec_id").to_numpy(zero_copy_only=False)
                      .astype(np.int64))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ds.map_batches(_KnnGraphStage,
                          fn_constructor_args=(mat_ref, ids_ref, k),
                          batch_format="pyarrow", batch_size=512,
                          concurrency=(1, 2))


def knn_graph_sql(k: int = 5) -> str:
    return f"""
WITH sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         -- DOUBLE[] casts force float64 arithmetic (bare FLOAT[] input
         -- runs the float32 kernel, whose ~1e-7 noise flips ~1-in-60k
         -- cells across a bp rounding edge vs the engine's float64)
         CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))
                    * 10000 + 0.5) AS BIGINT) AS cosine_bp
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cosine_bp DESC, nbr_id ASC) AS rnk
  FROM sims)
SELECT vec_id, CAST(rnk AS BIGINT) AS rank, nbr_id, cosine_bp
FROM ranked WHERE rnk <= {k}
"""


# ---- navigable-graph ANN (NSW-class beam search over the kNN graph) ----

_GRAPH_K = 8          # graph degree (kNN edges per vertex, pre-symmetrize)
_GRAPH_BEAM = 16      # beam width (HNSW's ef)
_GRAPH_ROUNDS = 3     # expansion rounds (unrolled in the SQL oracle)
_GRAPH_ENTRIES = 64   # entry set size: the E smallest md5 orders


class _GraphEdgeFlush:
    """Write one src-sorted block of the adjacency as one parquet file
    (small row groups -> src-range pruning at query time, the trigram
    `_ShardFlush` discipline)."""

    def __init__(self, out_dir: str):
        self.__name__ = "_GraphEdgeFlush"
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        if batch.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        first = int(batch.column("src")[0].as_py())
        name = f"edges_{first:012d}_{batch.num_rows}.parquet"
        pq.write_table(batch.select(["src", "dst"]),
                       os.path.join(self.out_dir, name),
                       row_group_size=16384)
        return pa.table({"file": pa.array([name], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})


def ensure_graph_index(sf_dir: str, k: int = _GRAPH_K) -> str:
    """Build (once per sf_dir, cached under /tmp) the navigable graph:
    the exact kNN edges (``knn_graph``) SYMMETRIZED (undirected
    navigability — reverse edges let the walk climb back toward a
    query vertex's own neighborhood) and persisted src-sorted so a
    beam's adjacency fetch reads only the row groups covering its
    frontier ids. Edge duplicates after symmetrize are kept
    (query-time np.unique / SQL DISTINCT dedups) — one sort, no extra
    shuffle. The NSW search design (Malkov et al. 2014: beam search
    over a navigable small-world graph from multiple entry points)
    fits a data-parallel engine better than incremental HNSW
    insertion: the graph is one batch kNN build, and the hierarchy is
    replaced by a bounded md5-rank-scattered entry set (clustered
    embeddings have near-zero inter-cluster cosine gradient, so no
    graph walk can cross clusters — entry coverage, not hierarchy
    depth, is what buys recall; measured on the gate sets)."""
    import hashlib
    import json as _json
    import os
    from pathlib import Path

    fp = _fingerprint_of(sf_dir)
    tag = hashlib.blake2b(f"{sf_dir}|graph{k}|{fp}".encode(),
                          digest_size=6).hexdigest()
    root = f"/tmp/graft_graph_index/{tag}"
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)
    for f in Path(root).glob("*.parquet"):
        f.unlink()

    def both_ways(batch: pa.Table) -> pa.Table:
        v = batch.column("vec_id").to_numpy(zero_copy_only=False)
        n = batch.column("nbr_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": int64_col(np.concatenate([v, n]).astype(np.int64)),
            "dst": int64_col(np.concatenate([n, v]).astype(np.int64))})

    stats = (knn_graph(sf_dir, k=k)
             .map_batches(both_ways, batch_format="pyarrow")
             .sort("src")
             .map_batches(_GraphEdgeFlush(root), batch_format="pyarrow",
                          batch_size=None)
             .take_all())                    # bounded: one row per file
    with open(marker, "w") as f:
        _json.dump({"fingerprint": fp, "k": k,
                    "files": sorted(r["file"] for r in stats)}, f)
    return root


def _fingerprint_of(sf_dir: str) -> str:
    """size+mtime fingerprint of the embeddings table (cache key)."""
    import os
    from pathlib import Path

    p = Path(sf_dir) / "embeddings.parquet"
    if not p.exists():
        return "absent"
    st = os.stat(p)
    return f"{st.st_size}:{st.st_mtime_ns}"


def _fetch_rows(path, id_col: str, ids: np.ndarray, columns: list[str]):
    """Filtered parquet read for a bounded id set — row-group statistics
    prune the scan when the file is id-sorted (testdata and the
    persisted edge files both are)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns,
                         filters=pc.field(id_col).isin(
                             pa.array(ids, pa.int64())))


def ann_graph_topk(sf_dir: str, query_ids: list[int] | None = None,
                   k: int = 10, _stats: dict | None = None,
                   rounds: int | None = None, beam: int | None = None,
                   n_entries: int | None = None):
    """(query_vec_id, rank, vec_id, cosine_bp) — navigable-graph ANN
    (NSW-class): score a fixed md5-rank-scattered ENTRY set (the
    ``_GRAPH_ENTRIES`` smallest ``(md5(vec_id), vec_id)`` orders —
    deterministic, data-size-adaptive cluster coverage), then
    ``_GRAPH_ROUNDS`` beam rounds over the persisted symmetric kNN
    graph with the beam kept by (cosine_bp DESC, vec_id ASC). Every
    step is integer-tie-broken, so the SQL oracle replays the SEARCH
    itself via unrolled round CTEs — not just the result.

    Shape: pointer-chasing is inherently sequential per query, so the
    driver runs the (bounded: queries x beam x degree) round loop and
    each round issues ONE batched filtered read for all queries'
    frontier adjacency + candidate vectors (row-group-pruned by the
    src-sorted edge layout). Corpus-scale work — the kNN edge build
    and the one-time md5-rank entry selection — happens in
    ``ensure_graph_index`` / at build; at serving scale the graph
    shards across an actor pool by vec-id range and the same rounds
    become ray.get fan-outs to the owning actors."""
    from pathlib import Path

    import duckdb

    from searchengine_ray.pipelines.common import table_path

    # rounds/beam/entries are SERVING-QUALITY knobs (HNSW's ef): the
    # defaults are the gate-scale constants the SQL oracle unrolls; at
    # larger corpora size them with the graph diameter (rounds ~ log N,
    # beam up) — tools/rehearse_graph.py measures the recall/visited
    # trade-off at 100k
    rounds = _GRAPH_ROUNDS if rounds is None else rounds
    beam = _GRAPH_BEAM if beam is None else beam
    n_entries = _GRAPH_ENTRIES if n_entries is None else n_entries

    root = ensure_graph_index(sf_dir)
    qids_list = sorted(query_ids or DEFAULT_QUERY_IDS)
    qids, qmat = _query_matrix(sf_dir, qids_list)
    qn = _normalize(qmat)                                  # (q, d)
    emb_path = table_path(sf_dir, "embeddings")
    edge_files = sorted(str(f) for f in Path(root).glob("edges_*.parquet"))

    # md5-rank entries: deterministic AND scattered across clusters
    # (the smallest-vec_ids choice landed every entry in one cluster —
    # measured recall@10 0.4 on a gate query); at 10^12 vectors this
    # rank selection is a one-time build step persisted with the index
    _con = duckdb.connect()
    entries = np.array([r[0] for r in _con.sql(
        f"SELECT vec_id FROM '{emb_path}' "
        f"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id "
        f"LIMIT {n_entries}").fetchall()], dtype=np.int64)
    _con.close()

    visited: list[dict[int, int]] = [dict() for _ in qids]
    reads = {"edge_rows": 0}

    def score_ids(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        t = _fetch_rows(emb_path, "vec_id", ids, ["vec_id", "embedding"])
        got = t.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        en = _normalize(emb_matrix(t.column("embedding")))
        return got, bp(qn @ en.T)                          # (q, m)

    got, sims = score_ids(entries)
    for qi in range(len(qids)):
        for j, v in enumerate(got.tolist()):
            visited[qi][v] = int(sims[qi, j])

    for _ in range(rounds):
        frontier: list[np.ndarray] = []
        for qi in range(len(qids)):
            vs = np.fromiter(visited[qi].keys(), np.int64,
                             len(visited[qi]))
            bps = np.fromiter(visited[qi].values(), np.int64, len(vs))
            frontier.append(vs[np.lexsort((vs, -bps))[:beam]])
        need_src = np.unique(np.concatenate(frontier))
        adj = _fetch_rows(edge_files, "src", need_src, ["src", "dst"])
        reads["edge_rows"] += adj.num_rows
        src = adj.column("src").to_numpy(zero_copy_only=False)
        dst = adj.column("dst").to_numpy(zero_copy_only=False)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        new_per_q: list[np.ndarray] = []
        for qi in range(len(qids)):
            lo = np.searchsorted(src, frontier[qi], side="left")
            hi = np.searchsorted(src, frontier[qi], side="right")
            nbrs = np.unique(np.concatenate(
                [dst[a:b] for a, b in zip(lo, hi)] or
                [np.empty(0, np.int64)]))
            seen = visited[qi]
            new_per_q.append(np.array(
                [v for v in nbrs.tolist() if v not in seen], np.int64))
        need = (np.unique(np.concatenate(new_per_q))
                if any(len(x) for x in new_per_q)
                else np.empty(0, np.int64))
        if len(need) == 0:
            break
        got, sims = score_ids(need)
        pos = {int(v): j for j, v in enumerate(got.tolist())}
        for qi in range(len(qids)):
            for v in new_per_q[qi].tolist():
                visited[qi][v] = int(sims[qi, pos[v]])
    if _stats is not None:
        _stats["visited_per_query"] = [len(v) for v in visited]
        _stats["edge_rows_read"] = int(reads["edge_rows"])

    out_q, out_r, out_v, out_s = [], [], [], []
    for qi in range(len(qids)):
        vs = np.fromiter(visited[qi].keys(), np.int64, len(visited[qi]))
        bps = np.fromiter(visited[qi].values(), np.int64, len(vs))
        top = np.lexsort((vs, -bps))[:k]
        out_q.append(np.full(len(top), qids[qi], np.int64))
        out_r.append(np.arange(1, len(top) + 1, dtype=np.int64))
        out_v.append(vs[top])
        out_s.append(bps[top])
    return pa.table({
        "query_vec_id": int64_col(np.concatenate(out_q)),
        "rank": int64_col(np.concatenate(out_r)),
        "vec_id": int64_col(np.concatenate(out_v)),
        "cosine_bp": int64_col(np.concatenate(out_s))})


def ann_graph_topk_sql(query_ids: list[int] | None = None,
                       k: int = 10) -> str:
    """Replays the beam SEARCH itself: kNN edges + symmetrize,
    md5-rank entries, then ``_GRAPH_ROUNDS`` unrolled (beam ->
    neighbors -> score -> union) CTE rounds with the same
    (cosine_bp DESC, vec_id ASC) ordering."""
    ids = ",".join(map(str, sorted(query_ids or DEFAULT_QUERY_IDS)))
    rounds = []
    for r in range(1, _GRAPH_ROUNDS + 1):
        p = r - 1
        rounds.append(f"""
b{p} AS (
  SELECT query_vec_id, vec_id FROM (
    SELECT v{p}.*, row_number() OVER (PARTITION BY query_vec_id
           ORDER BY cosine_bp DESC, vec_id ASC) AS rnk FROM v{p})
  WHERE rnk <= {_GRAPH_BEAM}),
n{r} AS (
  SELECT DISTINCT b.query_vec_id, g.dst AS vec_id
  FROM b{p} b JOIN edges g ON g.src = b.vec_id),
s{r} AS (
  SELECT n.query_vec_id, n.vec_id,
         CAST(floor(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                           CAST(e.embedding AS DOUBLE[]))
                    * 10000 + 0.5) AS BIGINT) AS cosine_bp
  FROM n{r} n
  JOIN q ON q.query_vec_id = n.query_vec_id
  JOIN embeddings e ON e.vec_id = n.vec_id),
v{r} AS (
  SELECT DISTINCT * FROM
    (SELECT * FROM v{p} UNION ALL SELECT * FROM s{r}))""")
    rounds_sql = ",".join(rounds)
    return f"""
WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qe FROM embeddings
           WHERE vec_id IN ({ids})),
sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))
                    * 10000 + 0.5) AS BIGINT) AS cosine_bp
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
knn AS (
  SELECT vec_id, nbr_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
           ORDER BY cosine_bp DESC, nbr_id ASC) AS rnk FROM sims)
  WHERE rnk <= {_GRAPH_K}),
edges AS (SELECT vec_id AS src, nbr_id AS dst FROM knn
          UNION SELECT nbr_id, vec_id FROM knn),
e0 AS (SELECT vec_id FROM embeddings
       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       LIMIT {_GRAPH_ENTRIES}),
v0 AS (
  SELECT q.query_vec_id, e.vec_id,
         CAST(floor(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                           CAST(e.embedding AS DOUBLE[]))
                    * 10000 + 0.5) AS BIGINT) AS cosine_bp
  FROM q CROSS JOIN e0 JOIN embeddings e ON e.vec_id = e0.vec_id),
{rounds_sql}
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, cosine_bp
FROM (SELECT v{_GRAPH_ROUNDS}.*,
             row_number() OVER (PARTITION BY query_vec_id
                    ORDER BY cosine_bp DESC, vec_id ASC) AS rnk
      FROM v{_GRAPH_ROUNDS})
WHERE rnk <= {k}
"""


# ---- binary quantization (1 bit/dim) + exact rerank ----

class _BqTopK:
    """Per-batch binary-quantization scan: 1-bit sign codes (32x
    smaller than SQ8's bytes — the layout Faiss calls binary IVF /
    Lucene 10 ships as quantized HNSW tiers), Hamming-distance
    candidate selection, then EXACT integer-micro rerank of only the
    local candidate set. Blocks emit at most q x n_cand rows."""

    def __init__(self, qids_ref, qmat_ref, n_cand: int):
        import ray

        self.qids = ray.get(qids_ref)
        qmat = ray.get(qmat_ref)
        self.qmicro = np.floor(qmat * 1_000_000 + 0.5).astype(np.int64)
        self.qbits = self.qmicro > 0                              # (q, d)
        self.n_cand = n_cand

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = emb_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        micro = np.floor(emb * 1_000_000 + 0.5).astype(np.int64)
        bits = micro > 0                                          # (b, d)
        # Hamming via one int matmul pair instead of a (q, b, d) xor
        # cube: ham = q1 @ (1-b) + (1-q1) @ b
        qb = self.qbits.astype(np.int64)
        eb = bits.astype(np.int64)
        ham = qb @ (1 - eb).T + (1 - qb) @ eb.T                   # (q, b)
        out_q, out_v, out_h, out_d = [], [], [], []
        c = min(self.n_cand, ham.shape[1])
        for qi in range(len(self.qids)):
            row = ham[qi]
            top = np.lexsort((ids, row))[:c]                      # ham ASC
            exact = np.einsum("j,ij->i", self.qmicro[qi], micro[top])
            out_q.append(np.full(c, self.qids[qi], dtype=np.int64))
            out_v.append(ids[top])
            out_h.append(row[top])
            out_d.append(exact)
        return pa.table({"query_vec_id": int64_col(np.concatenate(out_q)),
                         "vec_id": int64_col(np.concatenate(out_v)),
                         "hamming": int64_col(np.concatenate(out_h)),
                         "dot_micro2": int64_col(np.concatenate(out_d))})


def _bq_merge_factory(k: int, n_cand: int):
    def merge_bq(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["hamming", "vec_id"],
                          ascending=[True, True]).head(n_cand)
        g = g.sort_values(["dot_micro2", "vec_id"],
                          ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_vec_id", "rank", "vec_id", "hamming", "dot_micro2"]]

    merge_bq.__name__ = "merge_bq"
    return merge_bq


def ann_bq_topk(sf_dir: str, query_ids: list[int] | None = None,
                k: int = 10, n_cand: int = 50):
    """(query_vec_id, rank, vec_id, hamming, dot_micro2) — top-k MIPS
    via BINARY QUANTIZATION with exact rerank: sign-bit codes (d bits
    per vector — the smallest quantization tier, 8x below SQ8, 256x
    below float32) proxy-rank by Hamming distance; only the global
    top-``n_cand`` per query are rescored at full integer precision.

    EXACT-INTEGER end to end like the SQ8/PQ rows: bit = (micro > 0)
    with micro = floor(x*1e6 + 0.5) on both sides, Hamming and the
    rerank dot are integer arithmetic, so every cell replays
    bit-for-bit in SQL on any cluster shape. Candidates = global
    top-n_cand by (hamming asc, vec_id asc); output = those reranked
    by (dot_micro2 desc, vec_id asc). Local top-n_cand per block
    covers the global candidate set; blocks emit q x n_cand rows,
    never vectors. At 100 TB the scan reads d/8 bytes per vector and
    the rerank touches only candidates — the memory-bandwidth floor of
    the ANN family."""
    import ray

    qids_list = query_ids or DEFAULT_QUERY_IDS
    qids, qmat = _query_matrix(sf_dir, qids_list)
    refs = (ray.put(qids), ray.put(qmat))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    local = ds.map_batches(_BqTopK, fn_constructor_args=(*refs, n_cand),
                           batch_format="pyarrow", batch_size=1024,
                           concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _bq_merge_factory(k, n_cand), batch_format="pandas")


def ann_bq_topk_sql(query_ids: list[int] | None = None, k: int = 10,
                    n_cand: int = 50) -> str:
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    return f"""
WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qe FROM embeddings
           WHERE vec_id IN ({ids})),
qd AS (SELECT query_vec_id, generate_subscripts(qe, 1) AS dim,
              CAST(floor(CAST(unnest(qe) AS DOUBLE) * 1000000 + 0.5)
                   AS BIGINT) AS qm
       FROM q),
ed AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                   AS BIGINT) AS em
       FROM embeddings),
pair AS (
  SELECT qd.query_vec_id, ed.vec_id,
         CAST(sum(CASE WHEN (qd.qm > 0) <> (ed.em > 0) THEN 1 ELSE 0 END)
              AS BIGINT) AS hamming,
         CAST(sum(qd.qm * ed.em) AS BIGINT) AS dot_micro2
  FROM qd JOIN ed USING (dim)
  GROUP BY qd.query_vec_id, ed.vec_id),
cand AS (
  SELECT *, row_number() OVER (PARTITION BY query_vec_id
                               ORDER BY hamming ASC, vec_id ASC) AS crnk
  FROM pair),
rer AS (
  SELECT query_vec_id, vec_id, hamming, dot_micro2,
         row_number() OVER (PARTITION BY query_vec_id
                            ORDER BY dot_micro2 DESC, vec_id ASC) AS rnk
  FROM cand WHERE crnk <= {n_cand})
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, hamming, dot_micro2
FROM rer WHERE rnk <= {k}
"""


# ---- supervised linear probe (distributed ridge fit + inference) ----

_PROBE_MICRO = 1_000_000
_PROBE_LAMBDA = 1e-3
_PROBE_CLASSES = 10      # labels are dense 0..9 in the synthetic table


def _probe_micro(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(vec_ids, micro int64 (n,d), labels int64) for one batch — the
    shared exact-integer quantization (floor(x*1e6+0.5), the bp
    contract at micro scale; float32 -> float64 cast is exact, so the
    ints match DuckDB's CAST(el AS DOUBLE) replay bit-for-bit)."""
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = emb_matrix(batch.column("embedding")).astype(np.float64)
    micro = np.floor(mat * _PROBE_MICRO + 0.5).astype(np.int64)
    labels = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    return ids, micro, labels


def _probe_gram_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial of the AUGMENTED Gram matrix G = Z^T Z where
    Z = [X_micro | onehot(label)*1e6] — one fixed-size (d+C)^2 int64
    summary per batch regardless of row count (the sufficient
    statistics of the ridge fit; exact integer sums are order-free, so
    the distributed fold is bit-identical to any serial replay)."""
    _ids, micro, labels = _probe_micro(batch)
    n, d = micro.shape
    z = np.zeros((n, d + _PROBE_CLASSES), dtype=np.int64)
    z[:, :d] = micro
    z[np.arange(n), d + labels] = _PROBE_MICRO
    g = z.T @ z
    m = d + _PROBE_CLASSES
    ii = np.repeat(np.arange(m, dtype=np.int64), m)
    jj = np.tile(np.arange(m, dtype=np.int64), m)
    # off-diagonal label x label cells are STRUCTURALLY absent (no row
    # carries two labels): the SQL self-join never emits them, and
    # including always-zero rows here would make the fold's row set
    # differ from the oracle's
    keep = ~((ii >= d) & (jj >= d) & (ii != jj))
    return pa.table({"i": int64_col(ii[keep]),
                     "j": int64_col(jj[keep]),
                     "g": int64_col(g.reshape(-1)[keep])})


def linear_probe_gram(sf_dir: str):
    """(i, j, g) — the exact augmented Gram matrix of the embeddings
    table (X^T X, X^T Y and class counts in one (d+C)^2 block): the
    SUFFICIENT STATISTICS of a ridge / linear-probe fit, computed as a
    distributed mergeable aggregate (fixed-size integer partial per
    batch -> one tiny groupby). Hash-verified cell-for-cell, this row
    proves the distributed half of `linear_probe`'s training is exact;
    the driver-side solve is a (d+C)-sized dense op on this output."""
    from ray.data.aggregate import Sum

    partial = read(sf_dir, "embeddings",
                   ["vec_id", "embedding", "label"]).map_batches(
        _probe_gram_partial, batch_format="pyarrow", batch_size=4096)
    out = partial.groupby(["i", "j"]).aggregate(Sum("g", alias_name="g"))

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({"i": batch.column("i").cast(pa.int64()),
                         "j": batch.column("j").cast(pa.int64()),
                         "g": batch.column("g").cast(pa.int64())})

    return out.map_batches(cast, batch_format="pyarrow")


def linear_probe_gram_sql(sf_dir: str = _SF_ORACLE_DEFAULT) -> str:
    d = _table_dim(sf_dir)
    return f"""
WITH u AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_PROBE_MICRO}
                    + 0.5) AS BIGINT) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id, {d} + CAST(label AS BIGINT) AS i,
         CAST({_PROBE_MICRO} AS BIGINT) AS v
  FROM embeddings)
SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS g
FROM u a JOIN u b ON a.vec_id = b.vec_id
GROUP BY a.i, b.i
"""


def _probe_solve(gram: np.ndarray, d: int) -> np.ndarray:
    """Ridge solve from the exact integer Gram block: W = (XtX/s + lam I)^-1
    (XtY/s), s = micro^2 — float64 on EXACT integer inputs, so engine
    and oracle generator produce bit-identical weights from their
    independently computed (but integer-equal) Gram matrices. Returns
    w_micro int64 (d x C)."""
    s = float(_PROBE_MICRO) ** 2
    xtx = gram[:d, :d].astype(np.float64) / s
    xty = gram[:d, d:].astype(np.float64) / s
    w = np.linalg.solve(xtx + _PROBE_LAMBDA * np.eye(d), xty)
    return np.floor(w * _PROBE_MICRO + 0.5).astype(np.int64)


def _probe_weights_from_ray(sf_dir: str) -> np.ndarray:
    import ray

    tbl = linear_probe_gram(sf_dir).to_pandas()
    m = int(tbl["i"].max()) + 1
    gram = np.zeros((m, m), dtype=np.int64)
    gram[tbl["i"].to_numpy(np.int64), tbl["j"].to_numpy(np.int64)] = \
        tbl["g"].to_numpy(np.int64)
    return _probe_solve(gram, m - _PROBE_CLASSES)


def _probe_weights_from_duckdb(sf_dir: str) -> np.ndarray:
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{sf_dir}/embeddings.parquet'")
    rows = con.sql(linear_probe_gram_sql(sf_dir)).fetchall()
    m = max(r[0] for r in rows) + 1
    gram = np.zeros((m, m), dtype=np.int64)
    for i, j, g in rows:
        gram[i, j] = g
    return _probe_solve(gram, m - _PROBE_CLASSES)


def linear_probe(sf_dir: str):
    """(vec_id, label, pred, score_micro) — supervised linear-probe
    classification over the embeddings table: a one-vs-rest ridge
    model FIT DISTRIBUTED (exact-integer Gram partials folded by one
    groupby — `linear_probe_gram` is that fold's own registry row),
    solved on the driver at (d+C) size, then scored back over the
    table in one broadcast map (exact int64 dot products; argmax ties
    resolve to the lowest class). The quality-classifier shape of
    modern data curation (fastText/linear-probe filtering), expressed
    as mergeable-aggregate + broadcast-inference — no shuffle touches
    a vector.

    The SQL oracle recomputes predictions with the weights inlined as
    integer literals (the ANN-hyperplane pattern); the weights
    themselves are reproducible because both sides solve from
    integer-identical Gram matrices."""
    import ray

    w_micro = _probe_weights_from_ray(sf_dir)      # (d, C) int64
    w_ref = ray.put(w_micro)

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        w = _ray.get(w_ref)
        ids, micro, labels = _probe_micro(batch)
        scores = micro @ w                          # (n, C) exact int64
        pred = np.argmax(scores, axis=1).astype(np.int64)  # first-max tie
        best = scores[np.arange(len(ids)), pred]
        return pa.table({"vec_id": int64_col(ids),
                         "label": int64_col(labels),
                         "pred": int64_col(pred),
                         "score_micro": int64_col(best)})

    return read(sf_dir, "embeddings",
                ["vec_id", "embedding", "label"]).map_batches(
        score, batch_format="pyarrow", batch_size=4096)


def linear_probe_sql(sf_dir: str = _SF_ORACLE_DEFAULT) -> str:
    w_micro = _probe_weights_from_duckdb(sf_dir)    # (d, C) int64
    d, c = w_micro.shape
    vals = ",".join(f"({cls},{dim + 1},{int(w_micro[dim, cls])})"
                    for cls in range(c) for dim in range(d))
    return f"""
WITH w(cls, dim, wm) AS (VALUES {vals}),
u AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_PROBE_MICRO}
                    + 0.5) AS BIGINT) AS v
  FROM embeddings),
s AS (
  SELECT u.vec_id, any_value(u.label) AS label, w.cls,
         CAST(sum(u.v * w.wm) AS BIGINT) AS score
  FROM u JOIN w ON w.dim = u.dim
  GROUP BY u.vec_id, w.cls),
r AS (
  SELECT vec_id, label, cls, score,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY score DESC, cls ASC) AS rnk
  FROM s)
SELECT vec_id, label, CAST(cls AS BIGINT) AS pred, score AS score_micro
FROM r WHERE rnk = 1
"""


# ---- incremental IVF: add a vector batch without retraining ----

IVF_INCR_MOD = 5          # incoming batch = vec_id % 5 == 0, base = the rest


def _mod_filter(keep_incoming: bool):
    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = (ids % IVF_INCR_MOD == 0) if keep_incoming \
            else (ids % IVF_INCR_MOD != 0)
        return batch.take(pa.array(np.flatnonzero(m)))
    pick.__name__ = "pick_incoming" if keep_incoming else "pick_base"
    return pick


def _ivf_sample_base(sf_dir: str, sample_size: int = 4096) -> np.ndarray:
    """Bounded deterministic training sample drawn from the BASE rows
    only (vec_id % IVF_INCR_MOD != 0) — the quantizer must be trained
    before the incoming batch exists. Same ``id % m == 0`` rule and
    ordering as ``_ivf_sample``."""
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()                                   # parquet metadata, no scan
    m = max(1, n // sample_size)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        keep = (ids % m == 0) & (ids % IVF_INCR_MOD != 0)
        return batch.take(pa.array(np.flatnonzero(keep)))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def _ivf_sample_base_local(sf_dir: str, sample_size: int = 4096) -> np.ndarray:
    """No-Ray twin of ``_ivf_sample_base`` for oracle generation."""
    import duckdb

    con = duckdb.connect()
    n = con.sql(f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
                ).fetchone()[0]
    m = max(1, n // sample_size)
    rows = con.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id % {m} = 0 AND vec_id % {IVF_INCR_MOD} != 0 "
        f"ORDER BY vec_id").fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


@_lru(maxsize=16)
def _oracle_centroids_incr(sf_dir: str, n_centroids: int,
                           seed: int) -> np.ndarray:
    return _spherical_kmeans(_ivf_sample_base_local(sf_dir), n_centroids, seed)


def ensure_ivf_incr_index(sf_dir: str, n_centroids: int = 16, seed: int = 42
                          ) -> tuple[str, np.ndarray]:
    """IVF index grown INCREMENTALLY: the quantizer is trained on the
    base corpus only; the base build writes ``list=<c>/`` partitions;
    the incoming batch (vec_id % IVF_INCR_MOD == 0) is then ADDED by
    assigning against the FROZEN centroids and appending new parquet
    files into the same list partitions — no retraining, no rewrite of
    any base file (the Faiss ``add``-after-``train`` lifecycle; at
    100 TB an ingest tick appends its own files per list and queries
    see them on the next directory listing). Resumable via done-marker;
    the add phase records the base file set so the test can prove
    append-only growth."""
    import hashlib
    import json
    from pathlib import Path

    import ray

    tag = hashlib.blake2b(f"{sf_dir}|ivfincr|{n_centroids}|{seed}|{_fingerprint_of(sf_dir)}".encode(),
                          digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_ivf_incr_index/{tag}")
    marker = root / "_DONE.json"
    if marker.is_file():
        return str(root), np.load(root / "centroids.npy")
    if root.exists():
        import shutil

        shutil.rmtree(root)
    centroids = _spherical_kmeans(_ivf_sample_base(sf_dir), n_centroids, seed)
    cref = ray.put(centroids)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    base = ds.map_batches(_mod_filter(False), batch_format="pyarrow") \
             .map_batches(IvfAssignStage, fn_constructor_args=(cref,),
                          batch_format="pyarrow", batch_size=1024,
                          concurrency=(1, 2))
    base.write_parquet(str(root), partition_cols=["list"])
    base_files = sorted(str(f.relative_to(root))
                        for f in root.rglob("*.parquet"))
    # the incremental add: frozen quantizer, append-only
    incoming = ds.map_batches(_mod_filter(True), batch_format="pyarrow") \
                 .map_batches(IvfAssignStage, fn_constructor_args=(cref,),
                              batch_format="pyarrow", batch_size=1024,
                              concurrency=(1, 2))
    incoming.write_parquet(str(root), partition_cols=["list"])
    np.save(root / "centroids.npy", centroids)
    marker.write_text(json.dumps({"sf_dir": sf_dir,
                                  "n_centroids": n_centroids, "seed": seed,
                                  "base_files": base_files}))
    return str(root), centroids


def ann_ivf_incr_topk(sf_dir: str, query_ids: list[int] | None = None,
                      k: int = 10, n_centroids: int = 16, nprobe: int = 4,
                      seed: int = 42):
    """(query_vec_id, rank, vec_id, cosine_bp) — IVF top-k over the
    INCREMENTALLY grown index: results must include incoming vectors
    exactly as if the whole corpus had been assigned in one pass under
    the same frozen quantizer (which is what the SQL oracle computes).
    Probing/scan shape identical to ``ann_ivf_topk``."""
    from pathlib import Path

    import ray

    qids_list = query_ids or DEFAULT_QUERY_IDS
    qids, qmat = _query_matrix(sf_dir, qids_list)
    root, centroids = ensure_ivf_incr_index(sf_dir, n_centroids=n_centroids,
                                            seed=seed)
    sims = _normalize(qmat) @ centroids.T
    nprobe = min(nprobe, sims.shape[1])
    probe = set()
    for qi in range(len(qids)):
        for c in np.argsort(-sims[qi], kind="stable")[:nprobe]:
            probe.add(int(c))
    paths = [str(f) for c in sorted(probe)
             for p in [Path(root) / f"list={c}"] if p.is_dir()
             for f in sorted(p.glob("*.parquet"))]
    if not paths:
        return pa.table({"query_vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine_bp": pa.array([], pa.int64())})
    qids_ref, qmat_ref = ray.put(qids), ray.put(qmat)
    import ray.data

    pruned = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    local = pruned.map_batches(BruteCosineTopK,
                               fn_constructor_args=(qids_ref, qmat_ref, k),
                               batch_format="pyarrow", batch_size=1024,
                               concurrency=(1, 2))
    return local.groupby("query_vec_id").map_groups(
        _merge_topk_factory(k), batch_format="pandas")


def ann_ivf_incr_topk_sql(sf_dir: str = _SF_ORACLE_DEFAULT,
                          query_ids: list[int] | None = None, k: int = 10,
                          n_centroids: int = 16, nprobe: int = 4,
                          seed: int = 42) -> str:
    """Replay: retrain the quantizer from the BASE-only sample
    (bit-identical to the engine), then assign ALL vectors — base and
    incoming alike — probe, and scan. A hash match proves the
    append-only add is indistinguishable from a one-shot build under
    the frozen quantizer."""
    centroids = _oracle_centroids_incr(sf_dir, n_centroids, seed)
    cent_rows = ",".join(f"({c},{_sql_vec(centroids[c])})"
                         for c in range(len(centroids)))
    ids = ",".join(map(str, query_ids or DEFAULT_QUERY_IDS))
    nprobe = min(nprobe, len(centroids))
    return f"""
WITH cents(c, v) AS (VALUES {cent_rows}),
asg AS (
  SELECT e.vec_id, ct.c,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, ct.v) DESC, ct.c ASC) AS rn
  FROM embeddings e CROSS JOIN cents ct),
vl AS (SELECT vec_id, c AS list FROM asg WHERE rn = 1),
qp AS (
  SELECT e.vec_id AS query_vec_id, ct.c,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.embedding, ct.v) DESC, ct.c ASC) AS rn
  FROM embeddings e CROSS JOIN cents ct WHERE e.vec_id IN ({ids})),
probe AS (SELECT DISTINCT c FROM qp WHERE rn <= {nprobe}),
cand AS (
  SELECT e.vec_id, e.embedding
  FROM embeddings e JOIN vl ON vl.vec_id = e.vec_id
  WHERE vl.list IN (SELECT c FROM probe)),
q AS (SELECT vec_id AS query_vec_id, embedding AS qe FROM embeddings
      WHERE vec_id IN ({ids})),
sims AS (
  SELECT q.query_vec_id, c.vec_id,
         CAST(floor(list_cosine_similarity(q.qe, c.embedding) * 10000 + 0.5)
              AS BIGINT) AS cosine_bp
  FROM q CROSS JOIN cand c),
ranked AS (
  SELECT query_vec_id, vec_id, cosine_bp,
         row_number() OVER (PARTITION BY query_vec_id
             ORDER BY cosine_bp DESC, vec_id ASC) AS rnk
  FROM sims)
SELECT query_vec_id, CAST(rnk AS BIGINT) AS rank, vec_id, cosine_bp
FROM ranked WHERE rnk <= {k}
"""
