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

import numpy as np
import pandas as pd
import pyarrow as pa

from searchengine_ray.pipelines.common import bp, emb_matrix, int64_col, read

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
_TOKEN_HASH_CACHE_CAP = 1 << 20   # bounded: open vocabulary at 100 TB would
                                  # otherwise grow this per-worker dict forever
_SHINGLE_C = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio odd multiplier


def _token_hash(tok: str) -> int:
    """Low 64 bits of md5, little-endian — bit-identical to DuckDB's
    ``md5_number_lower``, which is what makes every hash in the MinHash/
    SimHash family replayable by the SQL oracles below."""
    h = _TOKEN_HASH_CACHE.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[8:16],
                           "little")
        if len(_TOKEN_HASH_CACHE) >= _TOKEN_HASH_CACHE_CAP:
            _TOKEN_HASH_CACHE.pop(next(iter(_TOKEN_HASH_CACHE)))
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
        band_idx = np.arange(_BANDS, dtype=np.int64)
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sig = self.signature(text).reshape(_BANDS, _ROWS)
            # band hash = wraparound polynomial fold of the band's rows
            # (SQL-replayable via UHUGEINT list_reduce, unlike a digest)
            h = np.zeros(_BANDS, dtype=np.uint64)
            for j in range(_ROWS):
                h = h * _SHINGLE_C + sig[:, j]
            doc_ids.append(np.full(_BANDS, did, dtype=np.int64))
            bands.append(band_idx)
            band_hashes.append((h >> np.uint64(3)).astype(np.int64))
        if not doc_ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "band": pa.array([], pa.int64()),
                             "band_hash": pa.array([], pa.int64())})
        return pa.table({"doc_id": int64_col(np.concatenate(doc_ids)),
                         "band": int64_col(np.concatenate(bands)),
                         "band_hash": int64_col(np.concatenate(band_hashes))})


_BUCKET_CAP = 256     # all-pairs only below this; star pairs above
_PAIR_GROUPS = 64     # map_groups granularity: 64 vectorized calls total


def _make_grouped_pairs(keys: list[str], cap: int, hot: str = "star"):
    """Vectorized pair emission for ``groupby(gkey).map_groups``.

    The groupby key is a HASH BUCKET of the real key(s) (``gkey = hash %
    _PAIR_GROUPS``), so map_groups makes only ``_PAIR_GROUPS`` Python
    calls instead of one per distinct bucket/shingle — the per-group-call
    overhead of one call per key is what made the naive version spend
    ~1 ms/key. All rows of a real key land in one gkey group, so per-key
    member counts computed inside the group are GLOBAL counts; semantics
    are identical to grouping by the real key.

    Inside one group, pairs come from a pandas self-merge on the real
    key(s) — C-speed, no itertools. Skew policy for keys with more than
    ``cap`` members:

    - ``hot="star"``  — emit star edges (min_id, other): m-1 rows that
      keep every member connected to a representative (union-find over
      star edges yields the same components as over all edges).
    - ``hot="drop"``  — emit nothing (used by the exact n-gram path,
      whose SQL oracle applies the same df cutoff).
    """
    assert hot in ("star", "drop")

    def grouped_pairs(df: pd.DataFrame) -> pa.Table:
        # pandas in (the self-merge needs it), ARROW out: downstream
        # groupbys over pandas blocks fall into a ~10x slower aggregate
        # path, so pair blocks must enter the shuffle as Arrow.
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        df = df.drop_duplicates(keys + ["doc_id"])
        if len(df) < 2:
            return empty
        sizes = df.groupby(keys)["doc_id"].transform("size")
        out_a, out_b = [], []
        small = df[(sizes >= 2) & (sizes <= cap)]
        if len(small):
            m = small.merge(small, on=keys)
            m = m[m["doc_id_x"] < m["doc_id_y"]]
            out_a.append(m["doc_id_x"].to_numpy(np.int64))
            out_b.append(m["doc_id_y"].to_numpy(np.int64))
        if hot == "star":
            big = df[sizes > cap]
            if len(big):
                mins = big.groupby(keys)["doc_id"].transform("min")
                sel = big["doc_id"].to_numpy() > mins.to_numpy()
                out_a.append(mins.to_numpy(np.int64)[sel])
                out_b.append(big["doc_id"].to_numpy(np.int64)[sel])
        if not out_a:
            return empty
        return pa.table({"doc_a": int64_col(np.concatenate(out_a)),
                         "doc_b": int64_col(np.concatenate(out_b))})

    grouped_pairs.__name__ = "grouped_pairs"
    return grouped_pairs


def _add_gkey(batch: pa.Table) -> pa.Table:
    """Hash-bucket key over (band, band_hash): all rows of one LSH bucket
    share a gkey, and there are only ``_PAIR_GROUPS`` distinct gkeys."""
    bh = batch.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
    bnd = batch.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    gkey = ((bh + bnd) % np.uint64(_PAIR_GROUPS)).astype(np.int64)
    return batch.append_column("gkey", int64_col(gkey))


def _distinct_pairs(pairs):
    """Distributed pair dedup: hash-partitioned groupby, never a driver
    ``to_pandas`` of the raw (band-duplicated) pair stream."""
    from ray.data.aggregate import Count

    uniq = pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="_n"))

    def drop_n(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_a", "doc_b"])

    return uniq.map_batches(drop_n, batch_format="pyarrow")


class JaccardVerifyGroup:
    """``groupby(vpart).map_groups`` body: exact token-shingle Jaccard
    for one hash-partition of candidate pairs.

    Reads ONLY the texts this group's pairs reference (parquet filter on
    doc_id) — the distributed replacement for broadcasting every document
    text to every verifier. At 10^12 docs the same group key routes the
    read to the docs partition holding the ids.

    ``string_shingles=True`` computes the sets over the literal k-token
    shingle strings (SQL-replicable, used by ``ngram_jaccard_dedup``)
    instead of the 61-bit rolling hashes.
    """

    def __init__(self, docs_path: str, threshold_bp: int,
                 string_shingles: bool = False, k: int = 3):
        self.__name__ = "JaccardVerifyGroup"
        self.docs_path = docs_path
        self.threshold_bp = threshold_bp
        self.string_shingles = string_shingles
        self.k = k

    def _set(self, text: str) -> set:
        if self.string_shingles:
            return _shingle_strings(text, self.k)
        return set(_shingles(text, self.k).tolist())

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        a = group.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = group.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        needed = np.unique(np.concatenate([a, b]))
        tbl = pq.read_table(self.docs_path, columns=["doc_id", "text"],
                            filters=pc.field("doc_id").isin(pa.array(needed)))
        shingles = {did: self._set(t)
                    for did, t in zip(tbl.column("doc_id").to_pylist(),
                                      tbl.column("text").to_pylist())}
        jac = np.empty(len(a), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a.tolist(), b.tolist())):
            sa, sb = shingles.get(x, set()), shingles.get(y, set())
            jac[i] = len(sa & sb) / (len(sa | sb) or 1)
        jbp = bp(jac)
        keep = jbp >= self.threshold_bp
        return pa.table({"doc_a": int64_col(a[keep]), "doc_b": int64_col(b[keep]),
                         "jaccard_bp": int64_col(jbp[keep])})


_N_VERIFY_PARTS = 8


def minhash_lsh_dedup(sf_dir: str, threshold_bp: int = 5000):
    """Near-dup pairs with exact-Jaccard verification — fully distributed.

    Shape: the LSH shuffle moves only (band, band_hash, doc_id) rows;
    pair dedup is a hash-partitioned groupby over pair keys; verification
    routes each pair to a hash partition whose task reads ONLY the texts
    its pairs reference. Nothing materializes texts or unfiltered pair
    sets on the driver.
    """
    from searchengine_ray.pipelines.common import table_path

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    bands = ds.map_batches(MinHashStage, batch_format="pyarrow", batch_size=512,
                           concurrency=(1, 4))
    pairs = bands.map_batches(_add_gkey, batch_format="pyarrow").groupby(
        "gkey").map_groups(
        _make_grouped_pairs(["band", "band_hash"], _BUCKET_CAP, hot="star"),
        batch_format="pandas")
    uniq = _distinct_pairs(pairs)

    def add_vpart(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", int64_col(a % _N_VERIFY_PARTS))

    routed = uniq.map_batches(add_vpart, batch_format="pyarrow")
    verify = JaccardVerifyGroup(table_path(sf_dir, "documents"), threshold_bp)
    return routed.groupby("vpart").map_groups(verify, batch_format="pyarrow")


_SQL_W64 = "18446744073709551616::UHUGEINT"     # 2^64 (wraparound modulus)


def _sql_tokens_cte() -> str:
    """Tokens + 1-based positions matching ``str.lower().split()``."""
    return """
t0 AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(lower(text), '\\s+'), 1)
           AS raw_pos
  FROM documents
),
toks AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) AS pos
  FROM t0 WHERE tok <> ''
)"""


def _minhash_sig_ctes() -> str:
    """Shared CTE chain of the MinHash SQL replay — tokens -> shingle
    hashes -> 64 permutation minhashes -> band folds (through ``bh``),
    plus the per-doc shingle sets (``shl``) the Jaccard verify reads.
    All integer arithmetic is UHUGEINT mod 2^64, so every value is
    bit-identical to numpy's uint64 wraparound. Used by both the dedup
    (``minhash_lsh_dedup_sql``) and decontamination
    (``decontaminate_sql``) oracles."""
    a, b = _minhash_params()
    params = ",".join(f"({i},{int(a[i])}::UHUGEINT,{int(b[i])}::UHUGEINT)"
                      for i in range(_N_HASH))
    c = f"{_SHINGLE_C}::UHUGEINT"
    return f"""{_sql_tokens_cte()},
th AS (
  SELECT doc_id, pos, CAST(md5_number_lower(tok) AS UHUGEINT) AS h FROM toks
),
tl AS (
  SELECT doc_id, list(h ORDER BY pos) AS hs, count(*) AS n FROM th GROUP BY doc_id
),
shraw AS (
  SELECT doc_id,
         list_reduce(hs[i : i + least(n, 3) - 1],
                     (x, y) -> (x * {c} + y) % {_SQL_W64}) AS sraw
  FROM tl, unnest(generate_series(1, CAST(n - least(n, 3) + 1 AS BIGINT))) AS g(i)
),
sh AS (SELECT DISTINCT doc_id, sraw // 8 AS s FROM shraw),
params(i, a, b) AS (VALUES {params}),
mh AS (
  SELECT sh.doc_id, p.i,
         min(((p.a * sh.s) % {_SQL_W64} + p.b) % {_SQL_W64}
             % {_MERSENNE}::UHUGEINT) AS v
  FROM sh CROSS JOIN params p GROUP BY sh.doc_id, p.i
),
sig AS (
  SELECT d.doc_id, COALESCE(m.vs, [0::UHUGEINT FOR x IN range({_N_HASH})]) AS vs
  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN (
    SELECT doc_id, list(v ORDER BY i) AS vs FROM mh GROUP BY doc_id) m
  USING (doc_id)
),
bh AS (
  SELECT doc_id, bnd,
         list_reduce(vs[bnd * {_ROWS} + 1 : bnd * {_ROWS} + {_ROWS}],
                     (x, y) -> (x * {c} + y) % {_SQL_W64}) // 8 AS band_hash
  FROM sig, unnest(generate_series(0, {_BANDS - 1})) AS u(bnd)
),
shl AS (SELECT doc_id, list(s) AS ss FROM sh GROUP BY doc_id)"""


def _sql_jaccard_verify(threshold_bp: int, a_alias: str = "doc_a",
                        b_alias: str = "doc_b") -> str:
    """Exact-Jaccard verification tail over a ``pairs(doc_a, doc_b)``
    CTE and the ``shl`` shingle sets — shared by both MinHash oracles."""
    return f"""
jac AS (
  SELECT p.doc_a, p.doc_b,
         CAST(floor(CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE)
                    / greatest(len(sa.ss) + len(sb.ss)
                               - len(list_intersect(sa.ss, sb.ss)), 1)
                    * 10000 + 0.5) AS BIGINT) AS jaccard_bp
  FROM pairs p
  LEFT JOIN shl sa ON sa.doc_id = p.doc_a
  LEFT JOIN shl sb ON sb.doc_id = p.doc_b
)
SELECT doc_a AS {a_alias}, doc_b AS {b_alias}, jaccard_bp
FROM jac WHERE jaccard_bp >= {threshold_bp}
"""


def minhash_lsh_dedup_sql(threshold_bp: int = 5000) -> str:
    """Exact DuckDB replay of the WHOLE MinHash-LSH pipeline — token
    md5 hashes (``md5_number_lower`` == the Python side's low-64-le
    md5), wraparound shingle polynomial, the 64 (a,b) permutation
    hashes mod the Mersenne prime, band folds, the bucket-cap/star pair
    policy, pair dedup, and exact-Jaccard verification over the hashed
    shingle sets."""
    return f"""
WITH {_minhash_sig_ctes()},
sized AS (
  SELECT doc_id, bnd, band_hash,
         count(*) OVER (PARTITION BY bnd, band_hash) AS m,
         min(doc_id) OVER (PARTITION BY bnd, band_hash) AS mn
  FROM bh
),
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM sized x JOIN sized y
    ON x.bnd = y.bnd AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id AND x.m <= {_BUCKET_CAP}
  UNION
  SELECT DISTINCT mn AS doc_a, doc_id AS doc_b
  FROM sized WHERE m > {_BUCKET_CAP} AND doc_id > mn
),{_sql_jaccard_verify(threshold_bp)}"""


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

    pairs = sig.map_batches(explode, batch_format="pyarrow").map_batches(
        _add_gkey, batch_format="pyarrow").groupby("gkey").map_groups(
        _make_grouped_pairs(["band", "band_hash"], _BUCKET_CAP, hot="star"),
        batch_format="pandas")
    # distributed dedup of band-duplicated pairs; stays a Dataset
    return _distinct_pairs(pairs)


def simhash_near_dups_sql() -> str:
    """DuckDB replay of the SimHash pipeline: per-occurrence token md5
    hashes vote +-1 per bit (63 low bits kept, matching the int64-safe
    fingerprint), band split into 4x16 bits, same bucket-cap/star pair
    policy and pair dedup as the Ray side. ``sum`` runs over HUGEINT —
    a DOUBLE sum would round away the low fingerprint bits."""
    pows = ",".join(f"({k},{1 << k}::UHUGEINT)" for k in range(63))
    return f"""
WITH pows(k, p) AS (VALUES {pows}),
{_sql_tokens_cte()},
th AS (
  SELECT doc_id, CAST(md5_number_lower(tok) AS UHUGEINT) AS h FROM toks
),
votes AS (
  SELECT doc_id, k, p,
         sum(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN pows
  GROUP BY doc_id, k, p
),
sim0 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0 THEN CAST(p AS HUGEINT)
                       ELSE 0::HUGEINT END) AS BIGINT) AS v
  FROM votes GROUP BY doc_id
),
sim AS (
  SELECT d.doc_id, COALESCE(s.v, 0) AS v
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN sim0 s USING (doc_id)
),
bh AS (
  SELECT doc_id, u.bnd, (v // u.q) % 65536 AS band_hash
  FROM sim, (VALUES (0, 1::BIGINT), (1, 65536::BIGINT),
                    (2, 4294967296::BIGINT),
                    (3, 281474976710656::BIGINT)) AS u(bnd, q)
),
sized AS (
  SELECT doc_id, bnd, band_hash,
         count(*) OVER (PARTITION BY bnd, band_hash) AS m,
         min(doc_id) OVER (PARTITION BY bnd, band_hash) AS mn
  FROM bh
)
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM sized x JOIN sized y
  ON x.bnd = y.bnd AND x.band_hash = y.band_hash
 AND x.doc_id < y.doc_id AND x.m <= {_BUCKET_CAP}
UNION
SELECT DISTINCT mn AS doc_a, doc_id AS doc_b
FROM sized WHERE m > {_BUCKET_CAP} AND doc_id > mn
"""


# ---------------- n-gram Jaccard (exact, shingle inverted index) ------


def _shingle_strings(text: str, k: int = 3) -> set[str]:
    """Distinct k-token shingle STRINGS (whole doc if shorter than k) —
    the SQL-replicable twin of ``_shingles``."""
    toks = text.lower().split()
    if not toks:
        return set()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


class NgramShingleStage:
    """map_batches: doc -> one (doc_id, shingle, gkey) row per DISTINCT
    k-token shingle string; ``gkey = crc32(shingle) % _PAIR_GROUPS`` is
    the hash-bucket group key. The downstream ``groupby(gkey)`` carries
    the shingle inverted index; the shuffle moves shingle strings + ids,
    never full texts."""

    def __init__(self, k: int = 3):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from zlib import crc32

        doc_ids: list[int] = []
        shingles: list[str] = []
        gkeys: list[int] = []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for g in _shingle_strings(text, self.k):
                doc_ids.append(did)
                shingles.append(g)
                gkeys.append(crc32(g.encode()) % _PAIR_GROUPS)
        return pa.table({"doc_id": int64_col(doc_ids),
                         "shingle": pa.array(shingles, pa.string()),
                         "gkey": int64_col(gkeys)})


def ngram_jaccard_dedup(sf_dir: str, threshold_bp: int = 3000, k: int = 3,
                        max_shingle_df: int = 100):
    """Exact n-gram Jaccard near-dup pairs — no hashing anywhere, so the
    result is hash-checkable against a pure-SQL oracle.

    Shape: shingle inverted index (hash-bucketed groupby over shingle
    strings, vectorized self-merge per bucket) emits candidate pairs from
    rare shingles only (df <= ``max_shingle_df``; all-pairs per shingle
    is bounded by df^2 <= 10^4 rows); pair dedup
    is a hash-partitioned groupby; exact Jaccard over the full distinct
    shingle sets runs in verify partitions that read only the texts their
    pairs reference. Same distributed shape as ``minhash_lsh_dedup`` with
    the probabilistic candidate stage swapped for a deterministic one.
    """
    from searchengine_ray.pipelines.common import table_path

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    rows = ds.map_batches(NgramShingleStage, fn_constructor_args=(k,),
                          batch_format="pyarrow", batch_size=512,
                          concurrency=(1, 4))
    pairs = rows.groupby("gkey").map_groups(
        _make_grouped_pairs(["shingle"], max_shingle_df, hot="drop"),
        batch_format="pandas")
    uniq = _distinct_pairs(pairs)

    def add_vpart(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", int64_col(a % _N_VERIFY_PARTS))

    routed = uniq.map_batches(add_vpart, batch_format="pyarrow")
    verify = JaccardVerifyGroup(table_path(sf_dir, "documents"), threshold_bp,
                                string_shingles=True, k=k)
    return routed.groupby("vpart").map_groups(verify, batch_format="pyarrow")


def ngram_jaccard_dedup_sql(threshold_bp: int = 3000, k: int = 3,
                            max_shingle_df: int = 100) -> str:
    """The exact SQL twin: same tokenization (lowercase, whitespace
    split), same k-token shingles, same rare-shingle candidate cutoff,
    same bp rounding."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i:i+{k - 1}], ' ') AS shingle
  FROM toks, unnest(range(1, greatest(len(t) - {k - 1}, 1) + 1)) AS u(i)
  WHERE len(t) > 0
), rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {max_shingle_df}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id AND shingle IN (SELECT shingle FROM rare)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST(floor(10000.0 * i.i / (sa.n + sb.n - i.i) + 0.5) AS BIGINT) AS jaccard_bp
FROM cand c
JOIN inter i USING (doc_a, doc_b)
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE floor(10000.0 * i.i / (sa.n + sb.n - i.i) + 0.5) >= {threshold_bp}
"""


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
        emb = emb_matrix(batch.column("embedding"))
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
    import pyarrow.parquet as pq
    import ray

    from searchengine_ray.pipelines.common import table_path

    # the broadcast side of the N^2 baseline, loaded once (NOT via a
    # Dataset materialization); the scale path is embedding_near_dups_lsh
    tbl = pq.read_table(table_path(sf_dir, "embeddings"),
                        columns=["vec_id", "embedding"])
    mat = emb_matrix(tbl.column("embedding"))
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(tbl.column("vec_id").to_numpy(zero_copy_only=False)
                      .astype(np.int64))
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ds.map_batches(EmbeddingNearDupStage,
                          fn_constructor_args=(mat_ref, ids_ref, threshold_bp),
                          batch_format="pyarrow", batch_size=512, concurrency=(1, 2))


class _BucketPairsCosine:
    """``groupby(bucket).map_groups``: exact cosine pairs within one LSH
    bucket — one chunked matmul per group, emits only rows >= threshold.
    No broadcast matrix: each task sees only its bucket's vectors."""

    def __init__(self, threshold_bp: int):
        self.__name__ = "bucket_pairs_cosine"
        self.threshold_bp = threshold_bp

    def __call__(self, group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        emb = emb_matrix(group.column("embedding"))
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        order = np.argsort(ids, kind="stable")
        ids, emb = ids[order], emb[order]
        out_a, out_b, out_s = [], [], []
        chunk = 1024                       # memory cap: chunk x m sims at once
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            sims_bp = bp(emb[lo:hi] @ emb.T)            # (c, m)
            keep = sims_bp >= self.threshold_bp
            rows, cols = np.nonzero(keep)
            a, b = ids[rows + lo], ids[cols]
            mask = a < b                                 # each pair once
            out_a.append(a[mask]); out_b.append(b[mask])
            out_s.append(sims_bp[rows[mask], cols[mask]])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        s = np.concatenate(out_s) if out_s else np.empty(0, np.int64)
        return pa.table({"vec_a": int64_col(a), "vec_b": int64_col(b),
                         "cosine_bp": int64_col(s)})


class _MultiTableLshStage:
    """ONE pass over the vectors emitting (bucket, vec_id, embedding)
    rows for every LSH table at once (table t's buckets live in the
    id range ``t << n_bits``) — a single actor pool instead of one
    unioned pool per table, which would reserve a CPU each and can
    deadlock a small cluster."""

    def __init__(self, planes_ref, n_bits: int):
        import ray

        self.planes = ray.get(planes_ref)      # (n_tables, n_bits, d)
        self.n_bits = n_bits
        self.weights = (1 << np.arange(n_bits, dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = emb_matrix(batch.column("embedding"))
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        chunks = []
        for t, planes in enumerate(self.planes):
            bits = (emb @ planes.T) > 0
            bucket = bits.astype(np.int64) @ self.weights + (t << self.n_bits)
            chunks.append(batch.append_column("bucket", int64_col(bucket)))
        return pa.concat_tables(chunks)


def _auto_n_bits(sf_dir: str, target_bucket: int = 512) -> int:
    """Hyperplane count sized so a bucket holds ~``target_bucket``
    vectors: ceil(log2(n / target)), clamped to [4, 24]. Reads only
    parquet METADATA (row count), never the table — deterministic and
    shared by the Ray path and the SQL oracle generator, so both sides
    derive the same plane set for the same table. Measured motivation:
    a fixed n_bits=4 at 500k vectors makes 31k-vector buckets and the
    within-bucket quadratic dominates (BENCH/r4_emb_500k.json)."""
    import math

    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.common import table_path

    n = pq.ParquetFile(table_path(sf_dir, "embeddings")).metadata.num_rows
    if n <= target_bucket:
        return 4
    return max(4, min(24, math.ceil(math.log2(n / target_bucket))))


def embedding_near_dups_lsh(sf_dir: str, threshold_bp: int = 4000,
                            n_bits: int | None = None, n_tables: int = 4,
                            seed: int = 7):
    """Bucketed near-dup path: random-hyperplane LSH buckets the vectors
    (``n_tables`` independent bucketings so near pairs split by one
    hyperplane still co-bucket in another), exact cosine runs only
    WITHIN buckets, and pair rows from different tables are deduped by a
    hash-partitioned groupby keeping the max observed score. The shuffle
    carries (bucket, vec) rows and candidate pairs — never an N x d
    broadcast matrix, never a driver materialization. ``n_bits=None``
    auto-sizes from the table's row count (``_auto_n_bits``) so bucket
    size stays ~constant as the corpus grows."""
    import ray
    from ray.data.aggregate import Max

    if n_bits is None:
        n_bits = _auto_n_bits(sf_dir)
    rng = np.random.default_rng(seed)
    ds = read(sf_dir, "embeddings", ["vec_id", "embedding"])
    d = len(ds.take(1)[0]["embedding"])
    planes_ref = ray.put(rng.standard_normal((n_tables, n_bits, d)))
    bucketed = ds.map_batches(_MultiTableLshStage,
                              fn_constructor_args=(planes_ref, n_bits),
                              batch_format="pyarrow", batch_size=1024,
                              concurrency=(1, 2))
    pairs = bucketed.groupby("bucket").map_groups(
        _BucketPairsCosine(threshold_bp), batch_format="pyarrow")
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Max("cosine_bp", alias_name="cosine_bp"))


def embedding_near_dups_lsh_sql(threshold_bp: int = 4000,
                                n_bits: int | None = None,
                                n_tables: int = 4, seed: int = 7,
                                sf_dir: str | None = None) -> str:
    """Exact DuckDB replay of the bucketed path: the seeded hyperplanes
    (all ``n_tables`` tables) are inlined as DOUBLE[] literals; bucket
    bits come from the raw dot-product sign (normalization never flips a
    sign mathematically; float64 can disagree only for |dot| within ulps
    of zero — accepted residual risk; so the SQL skips the Ray side's
    unit scaling); a pair
    qualifies iff the two vectors share a bucket in ANY table; the
    per-pair max over tables equals the single exact cosine."""
    from searchengine_ray.pipelines.ann import (_SF_ORACLE_DEFAULT, _sql_vec,
                                                _table_dim)

    if n_bits is None:
        n_bits = _auto_n_bits(sf_dir or _SF_ORACLE_DEFAULT)
    d = _table_dim(sf_dir or _SF_ORACLE_DEFAULT)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_bits, d))
    rows = ",".join(f"({t},{i},{_sql_vec(planes[t, i])})"
                    for t in range(n_tables) for i in range(n_bits))
    return f"""
WITH planes(t, i, p) AS (VALUES {rows}),
vb AS (
  SELECT e.vec_id, pl.t,
         CAST(sum(CASE WHEN list_dot_product(e.embedding, pl.p) > 0
                       THEN (1::BIGINT << pl.i) ELSE 0 END) AS BIGINT) AS bucket
  FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id, pl.t),
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM vb a JOIN vb b ON a.t = b.t AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id)
SELECT p.vec_a, p.vec_b,
       CAST(floor(list_cosine_similarity(ea.embedding, eb.embedding)
                  * 10000 + 0.5) AS BIGINT) AS cosine_bp
FROM pairs p
JOIN embeddings ea ON ea.vec_id = p.vec_a
JOIN embeddings eb ON eb.vec_id = p.vec_b
WHERE floor(list_cosine_similarity(ea.embedding, eb.embedding)
            * 10000 + 0.5) >= {threshold_bp}
"""


def embedding_near_dups_sql(threshold_bp: int = 4000) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(floor(list_cosine_similarity(a.embedding, b.embedding) * 10000 + 0.5) AS BIGINT)
         AS cosine_bp
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE floor(list_cosine_similarity(a.embedding, b.embedding) * 10000 + 0.5) >= {threshold_bp}
"""


# ---------------- survivor selection (connected components) ----------


class _HashToMinGroup:
    """``groupby(gkey).map_groups`` body for one hash-to-min round.

    State rows are (u, v) meaning "v is in u's known component set".
    Per node u with set C(u) (self-loops guarantee u in C(u)) and
    m = min(C(u)), emit (v, m) for every v in C(u) and (m, v) for every
    v in C(u) — the classic Hash-to-Min step (Rastogi et al. 2013,
    "Finding Connected Components in Map-Reduce in Logarithmic Rounds"),
    which converges in O(log d) shuffle rounds.

    Vectorized: the group is ONE hash bucket of many nodes (same gkey
    trick as ``_make_grouped_pairs``); per-node mins come from one sort
    + ``np.minimum.reduceat``, never a Python loop over nodes.
    """

    __name__ = "hash_to_min_group"

    def __call__(self, group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        m_per_seg = np.minimum.reduceat(v, starts)          # min over C(u)
        seg_id = np.cumsum(np.r_[False, u[1:] != u[:-1]])
        m = m_per_seg[seg_id]                               # row-aligned min
        out_u = np.concatenate([v, m])                      # (v, m) ∪ (m, v)
        out_v = np.concatenate([m, v])
        # in-group dedup bounds row growth before the distinct groupby
        key = np.lexsort((out_v, out_u))
        out_u, out_v = out_u[key], out_v[key]
        keep = np.r_[True, (out_u[1:] != out_u[:-1]) | (out_v[1:] != out_v[:-1])]
        return pa.table({"u": int64_col(out_u[keep]), "v": int64_col(out_v[keep])})


_CC_C = np.uint64(0x9E3779B97F4A7C15)


def _cc_round_tables(state):
    """One hash-to-min round: bucket-by-node shuffle + distinct pairs.
    Returns the new state plus a (count, checksum) convergence signature
    computed distributively (never a driver materialization of rows)."""
    from ray.data.aggregate import Count, Sum

    def add_gkey(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        g = ((u * _CC_C) >> np.uint64(48)) % np.uint64(_PAIR_GROUPS)
        return batch.append_column("gkey", int64_col(g.astype(np.int64)))

    stepped = state.map_batches(add_gkey, batch_format="pyarrow").groupby(
        "gkey").map_groups(_HashToMinGroup(), batch_format="pyarrow")
    uniq = stepped.groupby(["u", "v"]).aggregate(Count(alias_name="_n"))

    def finish(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        chk = ((u * _CC_C + v) >> np.uint64(3)).astype(np.int64)
        return pa.table({"u": int64_col(u.astype(np.int64)),
                         "v": int64_col(v.astype(np.int64)),
                         "chk": int64_col(chk)})

    new_state = uniq.map_batches(finish, batch_format="pyarrow").materialize()
    sig = new_state.aggregate(Count(alias_name="n"), Sum("chk", alias_name="s"))
    return new_state.select_columns(["u", "v"]), (sig["n"], sig["s"])


def connected_components(pairs, max_rounds: int = 64):
    """(doc_id, component) for every node in the pair graph — distributed
    union-find via iterative Hash-to-Min label propagation.

    Each round is ONE hash-partitioned groupby over (node, member) rows
    plus a distinct groupby; the per-round state is pair-scale (edges +
    component closures), never corpus-scale, so the between-round
    ``materialize()`` holds only the small shuffle product. Convergence
    is detected by a distributed (count, wraparound-checksum) signature —
    Hash-to-Min reaches an exact fixpoint, so an unchanged signature two
    rounds running is the stop condition. Partitioning assumption: one
    component's closure fits a map_groups task (near-dup clusters; the
    star-edge cap in ``_make_grouped_pairs`` keeps hot buckets bounded).
    """
    from ray.data.aggregate import Min

    def to_state(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        # C(u) = {u} ∪ neighbors(u): both orientations + self-loops
        return pa.table({"u": int64_col(np.concatenate([a, b, a, b])),
                         "v": int64_col(np.concatenate([b, a, a, b]))})

    state = pairs.map_batches(to_state, batch_format="pyarrow")
    prev_sig = None
    for _ in range(max_rounds):
        state, sig = _cc_round_tables(state)
        if sig == prev_sig:
            break
        prev_sig = sig
    labels = state.groupby("u").aggregate(Min("v", alias_name="component"))

    def name_cols(batch: pa.Table) -> pa.Table:
        did = batch.column("u")
        comp = batch.column("component")
        import pyarrow.compute as pc

        keep = pc.cast(pc.equal(did, comp), pa.int64())
        return pa.table({"doc_id": did, "component": comp, "keep": keep})

    return labels.map_batches(name_cols, batch_format="pyarrow")


def dedup_survivors(sf_dir: str, threshold_bp: int = 5000):
    """(doc_id, component, keep) over the MinHash-LSH verified pair
    stream — the survivor-selection op a training-data pipeline consumes.

    ``component`` is the min doc_id reachable through verified near-dup
    pairs; ``keep=1`` iff the doc IS its component representative
    (min-id-wins policy, matching ``dedup_exact``'s first-wins). Output
    covers only docs that appear in >=1 verified pair — i.e. the
    drop-list form: any doc absent from this table is trivially a
    survivor, so downstream consumes it as an anti-join, which keeps the
    result pair-scale instead of corpus-scale."""
    return connected_components(minhash_lsh_dedup(sf_dir, threshold_bp))


def dedup_survivors_sql(threshold_bp: int = 5000) -> str:
    """DuckDB replay: recursive CTE transitive closure over the exact
    MinHash-LSH pair replay, min reachable id per node."""
    return f"""
WITH RECURSIVE
p AS (SELECT doc_a, doc_b FROM ({minhash_lsh_dedup_sql(threshold_bp)}) mp),
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION SELECT doc_b AS a, doc_a AS b FROM p),
n AS (SELECT DISTINCT a AS node FROM e),
walk(node, front) AS (
  SELECT node, node FROM n
  UNION
  SELECT w.node, e.b FROM walk w JOIN e ON e.a = w.front
)
SELECT node AS doc_id, min(front) AS component,
       CAST(node = min(front) AS BIGINT) AS keep
FROM walk GROUP BY node
"""


def dedup_apply(sf_dir: str, threshold_bp: int = 5000):
    """(doc_id, lang, n_chars) of documents SURVIVING near-dup removal —
    the terminal consumer of ``dedup_survivors``: its keep=0 rows become
    a drop-list that anti-joins the documents table.

    Shape: at scale neither side broadcasts (the drop-list is
    pair-graph-sized, the corpus is the corpus), so both hash-partition
    on doc_id and ONE ``groupby(jpart)`` co-locates them — the same
    distributed anti-join shape as ``customers_without_orders``. Only
    metadata columns ride the shuffle, never text."""
    surv = dedup_survivors(sf_dir, threshold_bp)
    n_jparts = 64

    def drop_side(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("keep"), 0))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"jpart": int64_col(ids % n_jparts),
                         "doc_id": int64_col(ids),
                         "lang": pa.array([""] * len(ids), pa.string()),
                         "n_chars": int64_col(np.zeros(len(ids), np.int64)),
                         "side": int64_col(np.ones(len(ids), np.int64))})

    def doc_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"jpart": int64_col(ids % n_jparts),
                         "doc_id": int64_col(ids),
                         "lang": batch.column("lang"),
                         "n_chars": batch.column("n_chars").cast(pa.int64()),
                         "side": int64_col(np.zeros(len(ids), np.int64))})

    def anti(df: pd.DataFrame) -> pa.Table:
        docs = df[df["side"] == 0]
        dead = set(df.loc[df["side"] == 1, "doc_id"].to_numpy())
        live = docs[~docs["doc_id"].isin(dead)]
        return pa.table({"doc_id": int64_col(live["doc_id"].to_numpy(np.int64)),
                         "lang": pa.array(live["lang"].tolist(), pa.string()),
                         "n_chars": int64_col(live["n_chars"].to_numpy(np.int64))})

    drops = surv.map_batches(drop_side, batch_format="pyarrow")
    docs = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        doc_side, batch_format="pyarrow", batch_size=65536)
    return docs.union(drops).groupby("jpart").map_groups(
        anti, batch_format="pandas")


def dedup_apply_sql(threshold_bp: int = 5000) -> str:
    return f"""
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM ({dedup_survivors_sql(threshold_bp)}) s WHERE s.keep = 0)
"""


# ---------------- exact substring (duplicate-span) dedup ----------------
#
# Lee et al., "Deduplicating Training Data Makes Language Models Better"
# (ACL 2022) deduplicate exact SUBSTRINGS, not whole documents, via a
# suffix array. The distributed re-expression: every character position
# becomes a (rolling-hash-of-k-chars, doc, pos) anchor row; anchors are
# hash-bucketed (ONE shuffle of fixed-width rows, never text); docs
# sharing an anchor yield matched positions; per (pair, diagonal),
# consecutive runs of matched positions are exact shared spans of
# length run+k-1 — the suffix array's duplicate spans, found by
# grouping instead of sorting suffixes.

_SPAN_K = 20                  # minimum detectable span (chars)
_SPAN_POS_CAP = 256           # boilerplate cutoff: a k-gram occurring at
                              # more than this many positions corpus-wide
                              # is dropped (replicated in the SQL oracle)
_SPAN_B = 1_000_003           # polynomial base — same as doc_fingerprint
_SPAN_M = (1 << 61) - 1


def _span_hashes(cp: np.ndarray, k: int) -> np.ndarray:
    """Rolling k-gram hashes over a codepoint array: Horner left-to-right,
    h[p] = sum(cp[p+j] * B^(k-1-j)) mod 2^61-1 — vectorized across all
    positions (k modmul passes), bit-identical to the SQL list_reduce."""
    from searchengine_ray.pipelines.textstats import _modmul61

    M = np.uint64(_SPAN_M)
    B = np.uint64(_SPAN_B)
    m = len(cp) - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = _modmul61(h, B) + cp[j:j + m]
        h = np.where(h >= M, h - M, h)
    return h


class SpanAnchorStage:
    """map_batches: docs -> (gkey, h, doc_id, pos) anchor rows, one per
    character position (minus the last k-1 per doc). Fully vectorized:
    the batch's docs are concatenated into ONE codepoint array, hashed
    in k numpy passes, and windows crossing doc boundaries are masked.

    ``anchor_mod`` > 1 keeps only content-defined anchors
    (h % anchor_mod == 0, Manber 1994): density drops ~anchor_mod-fold
    — the 100-TB knob, since anchors-per-char is this operator's
    inherent volume (the suffix array pays it too). Content-defined
    positions align in both copies of a span automatically, unlike
    fixed-stride sampling. Spans then report diagonal EXTENT between
    matched anchors (a lower bound on the true span); anchor_mod=1 is
    the exact setting the registry entry and oracle run."""

    def __init__(self, k: int = _SPAN_K, anchor_mod: int = 1):
        self.k = k
        self.anchor_mod = anchor_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cps = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) for t in texts]
        lens = np.fromiter((len(c) for c in cps), np.int64, len(cps))
        empty = pa.table({"gkey": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        n = int(lens.sum())
        if n < k:
            return empty
        cp = np.concatenate(cps).astype(np.uint64)
        h = _span_hashes(cp, k)
        starts = np.zeros(len(cps), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        doc_of = np.repeat(np.arange(len(cps), dtype=np.int64), lens)
        m = len(h)
        valid = doc_of[:m] == doc_of[k - 1:]
        if self.anchor_mod > 1:
            valid &= (h % np.uint64(self.anchor_mod)) == 0
        p = np.flatnonzero(valid)
        if len(p) == 0:
            return empty
        d = doc_of[p]
        hv = h[p].astype(np.int64)
        return pa.table({"gkey": int64_col(hv % _PAIR_GROUPS),
                         "h": int64_col(hv),
                         "doc_id": int64_col(ids[d]),
                         "pos": int64_col(p - starts[d])})


def _make_span_pairs(pos_cap: int, n_jparts: int = 64):
    def span_pairs(df: pd.DataFrame) -> pa.Table:
        """gkey co-group: per-h position counts here are GLOBAL (all rows
        of an h share its gkey); k-grams above ``pos_cap`` positions are
        boilerplate and dropped (same cutoff in the oracle); the rest
        self-merge into matched position pairs."""
        empty = pa.table({"jkey": pa.array([], pa.int64()),
                          "doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "pa_": pa.array([], pa.int64()),
                          "pb_": pa.array([], pa.int64())})
        sizes = df.groupby("h")["doc_id"].transform("size")
        df = df[sizes <= pos_cap]
        if len(df) < 2:
            return empty
        m = df.merge(df, on="h")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if not len(m):
            return empty
        a = m["doc_id_x"].to_numpy(np.int64)
        b = m["doc_id_y"].to_numpy(np.int64)
        jkey = (a * np.int64(1_000_003) + b) % np.int64(n_jparts)
        return pa.table({"jkey": int64_col(jkey),
                         "doc_a": int64_col(a), "doc_b": int64_col(b),
                         "pa_": int64_col(m["pos_x"].to_numpy(np.int64)),
                         "pb_": int64_col(m["pos_y"].to_numpy(np.int64))})

    span_pairs.__name__ = "span_pairs"
    return span_pairs


def _make_span_islands(k: int, exact: bool, min_span: int):
    def span_islands(df: pd.DataFrame) -> pa.Table:
        """Pair co-group: per (pair, diagonal pa-pb), runs of consecutive
        matched positions are exact shared spans (every window inside a
        duplicated region matches, so runs advance by exactly 1; any
        mismatch breaks the hash with probability 1 - 2^-61). Emits one
        row per pair: the longest span and the matched-position count."""
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        pa_v = df["pa_"].to_numpy(np.int64)
        pb_v = df["pb_"].to_numpy(np.int64)
        diag = pa_v - pb_v
        order = np.lexsort((pa_v, diag, b, a))
        a, b, pa_v, diag = a[order], b[order], pa_v[order], diag[order]
        new_grp = np.empty(len(a), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = ((a[1:] != a[:-1]) | (b[1:] != b[:-1])
                       | (diag[1:] != diag[:-1]))
        if exact:
            brk = new_grp.copy()
            brk[1:] |= pa_v[1:] != pa_v[:-1] + 1
            isl = np.cumsum(brk) - 1
            isl_len = np.bincount(isl)
            isl_span = isl_len + (k - 1)
        else:       # anchor-sampled: span = diagonal extent between anchors
            brk = new_grp
            isl = np.cumsum(brk) - 1
            isl_start = pa_v[np.flatnonzero(brk)]
            isl_end = np.maximum.reduceat(pa_v, np.flatnonzero(brk))
            isl_span = isl_end - isl_start + k
            isl_len = np.bincount(isl)
        pair_of_isl = np.cumsum(new_grp) - 1
        pair_first = np.flatnonzero(new_grp)
        n_pairs = len(pair_first)
        isl_pair = pair_of_isl[np.flatnonzero(brk)]
        span = np.zeros(n_pairs, dtype=np.int64)
        np.maximum.at(span, isl_pair, isl_span)
        n_pos_d = np.bincount(pair_of_isl, minlength=n_pairs)
        # n_pos per PAIR (across diagonals): fold diag-level rows.
        # 2-column unique (no packed-int encode — doc ids may exceed 31
        # bits under the part-bits id layout)
        pair_cols = np.stack([a[pair_first], b[pair_first]], axis=1)
        uniq, inv = np.unique(pair_cols, axis=0, return_inverse=True)
        span_p = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(span_p, inv, span)
        npos_p = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(npos_p, inv, n_pos_d)
        keep = span_p >= min_span
        return pa.table({
            "doc_a": int64_col(uniq[keep, 0]),
            "doc_b": int64_col(uniq[keep, 1]),
            "span_len": int64_col(span_p[keep]),
            "n_pos": int64_col(npos_p[keep])})

    span_islands.__name__ = "span_islands"
    return span_islands


def dedup_spans(sf_dir: str, k: int = _SPAN_K, pos_cap: int = _SPAN_POS_CAP,
                min_span: int = 0, anchor_mod: int = 1):
    """(doc_a, doc_b, span_len, n_pos) — exact duplicate-substring pairs:
    docs sharing a verbatim character span >= k (>= min_span if set),
    with the longest shared span length and the matched-window count.

    Scale shape: anchor rows are fixed-width (hash, doc, pos) — the one
    corpus-scale shuffle, hash-bucketed with NO per-key skew beyond
    ``pos_cap`` (the boilerplate cutoff, replicated in the oracle);
    matched pairs co-group by pair key; island detection is vectorized
    numpy. Anchors-per-character volume is inherent to exact substring
    dedup (Lee et al.'s suffix array pays the same); ``anchor_mod``
    thins it ~anchor_mod-fold via content-defined sampling for the
    100-TB setting (detects spans that contain >= 1 sampled anchor,
    reporting anchor-extent lower-bound lengths)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])
    anchors = ds.map_batches(SpanAnchorStage, fn_constructor_args=(k, anchor_mod),
                             batch_format="pyarrow", batch_size=512,
                             concurrency=(1, 4))
    pairs = anchors.groupby("gkey").map_groups(
        _make_span_pairs(pos_cap), batch_format="pandas")
    return pairs.groupby("jkey").map_groups(
        _make_span_islands(k, anchor_mod == 1, min_span),
        batch_format="pandas")


def dedup_spans_sql(k: int = _SPAN_K, pos_cap: int = _SPAN_POS_CAP,
                    min_span: int = 0, anchor_mod: int = 1) -> str:
    """SQL twin: same codepoint rolling hash (HUGEINT Horner), same
    boilerplate cutoff, same diagonal-island span lengths."""
    anchor_filter = (f"WHERE h % {anchor_mod} = 0" if anchor_mod > 1 else "")
    if anchor_mod == 1:
        span_expr = f"count(*) + {k - 1}"
        grp_expr = ("pa - row_number() OVER (PARTITION BY doc_a, doc_b, "
                    "pa - pb ORDER BY pa)")
    else:
        # sampled anchors are NOT consecutive: the whole diagonal is one
        # island (anchor-extent lower bound), matching the engine's
        # exact=False branch — consecutive-position islanding would
        # fragment it
        span_expr = f"max(pa) - min(pa) + {k}"
        grp_expr = "0"
    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {k} + 1)) AS p
  FROM documents WHERE length(text) >= {k}),
hashes AS (
  SELECT doc_id, p - 1 AS pos,
         CAST(list_reduce(
                list_transform(
                  [substr(text, p + j, 1) for j in generate_series(0, {k - 1})],
                  c -> CAST(ord(c) AS HUGEINT)),
                (a, x) -> (a * {_SPAN_B} + x) % {_SPAN_M}) AS BIGINT) AS h
  FROM pos),
anchors AS (
  SELECT * FROM (
    SELECT * FROM hashes {anchor_filter}
  ) QUALIFY count(*) OVER (PARTITION BY h) <= {pos_cap}),
matched AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.pos AS pa, y.pos AS pb
  FROM anchors x JOIN anchors y ON x.h = y.h AND x.doc_id < y.doc_id),
islands AS (
  SELECT doc_a, doc_b, pa,
         {grp_expr} AS grp,
         pa - pb AS diag
  FROM matched),
spans AS (
  SELECT doc_a, doc_b, {span_expr} AS span, count(*) AS npos
  FROM islands GROUP BY doc_a, doc_b, diag, grp)
SELECT doc_a, doc_b, CAST(max(span) AS BIGINT) AS span_len,
       CAST(sum(npos) AS BIGINT) AS n_pos
FROM spans GROUP BY doc_a, doc_b
HAVING max(span) >= {min_span}
"""


# ---------------- train/eval decontamination ----------------

_EVAL_MOD = 5   # eval side = doc_id % 5 == 0 — a deterministic 20%
                # "held-out benchmark" slice of the documents table. In
                # production the eval side is its own (small) table; the
                # pipeline below only needs a per-row side predicate, so
                # swapping the modulus test for a membership column or a
                # second read() is a one-line change.


def _make_cross_pairs(keys: list[str], cap: int):
    """Cross-side variant of ``_make_grouped_pairs`` for contamination
    checks: emits only (train_doc, eval_doc) candidate pairs.

    Small buckets (<= ``cap`` members) emit the full train x eval
    product. Hot buckets emit each EVAL member against the bucket's MIN
    TRAIN member only: decontamination needs every eval doc *checked*,
    not every pair enumerated, and a >cap MinHash bucket is a
    near-identical cluster whose min train member is as good a witness
    as any — O(m) edges instead of m^2, same bound as the star policy.
    Same gkey-bucketed ``map_groups`` shape as ``_make_grouped_pairs``
    (all rows of a real bucket land in one group, so in-group counts
    are global).
    """

    def cross_pairs(df: pd.DataFrame) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        df = df.drop_duplicates(keys + ["doc_id"])
        if len(df) < 2:
            return empty
        sizes = df.groupby(keys)["doc_id"].transform("size")
        out_a, out_b = [], []
        small = df[sizes <= cap]
        if len(small):
            ie = (small["doc_id"] % _EVAL_MOD) == 0
            tr, ev = small[~ie], small[ie]
            if len(tr) and len(ev):
                m = tr.merge(ev, on=keys)
                out_a.append(m["doc_id_x"].to_numpy(np.int64))
                out_b.append(m["doc_id_y"].to_numpy(np.int64))
        big = df[sizes > cap]
        if len(big):
            ie = (big["doc_id"] % _EVAL_MOD) == 0
            tr, ev = big[~ie], big[ie]
            if len(tr) and len(ev):
                mins = tr.groupby(keys, as_index=False)["doc_id"].min()
                m = mins.merge(ev, on=keys)
                out_a.append(m["doc_id_x"].to_numpy(np.int64))
                out_b.append(m["doc_id_y"].to_numpy(np.int64))
        if not out_a:
            return empty
        return pa.table({"doc_a": int64_col(np.concatenate(out_a)),
                         "doc_b": int64_col(np.concatenate(out_b))})

    cross_pairs.__name__ = "cross_pairs"
    return cross_pairs


def decontaminate(sf_dir: str, threshold_bp: int = 5000):
    """Train/eval contamination pairs (train_doc, eval_doc, jaccard_bp)
    — the cross-corpus MinHash check a training-data pipeline runs
    before every release (is any eval/benchmark document near-duplicated
    in the training set?).

    Same fully-distributed LSH shape as ``minhash_lsh_dedup`` (and
    reuses its band stage, pair-dedup groupby, and Jaccard verifier
    verbatim): the shuffle moves only (band, band_hash, doc_id) rows;
    candidates are CROSS-SIDE only; hot buckets use the eval-star policy
    (see ``_make_cross_pairs``); verification routes each pair to a hash
    partition that reads only the texts its pairs reference."""
    from searchengine_ray.pipelines.common import table_path

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    bands = ds.map_batches(MinHashStage, batch_format="pyarrow", batch_size=512,
                           concurrency=(1, 4))
    pairs = bands.map_batches(_add_gkey, batch_format="pyarrow").groupby(
        "gkey").map_groups(
        _make_cross_pairs(["band", "band_hash"], _BUCKET_CAP),
        batch_format="pandas")
    uniq = _distinct_pairs(pairs)

    def add_vpart(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", int64_col(a % _N_VERIFY_PARTS))

    routed = uniq.map_batches(add_vpart, batch_format="pyarrow")
    verify = JaccardVerifyGroup(table_path(sf_dir, "documents"), threshold_bp)
    out = routed.groupby("vpart").map_groups(verify, batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"train_doc": batch.column("doc_a"),
                         "eval_doc": batch.column("doc_b"),
                         "jaccard_bp": batch.column("jaccard_bp")})

    return out.map_batches(rename, batch_format="pyarrow")


def decontaminate_sql(threshold_bp: int = 5000) -> str:
    """Exact DuckDB replay of ``decontaminate``: the shared MinHash CTE
    chain, cross-side-only candidates with the eval-star hot-bucket
    policy, and the shared exact-Jaccard verification tail."""
    return f"""
WITH {_minhash_sig_ctes()},
sized AS (
  SELECT doc_id, bnd, band_hash,
         count(*) OVER (PARTITION BY bnd, band_hash) AS m,
         min(doc_id) FILTER (WHERE doc_id % {_EVAL_MOD} <> 0)
             OVER (PARTITION BY bnd, band_hash) AS mn_train
  FROM bh
),
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM sized x JOIN sized y
    ON x.bnd = y.bnd AND x.band_hash = y.band_hash
   AND x.doc_id % {_EVAL_MOD} <> 0 AND y.doc_id % {_EVAL_MOD} = 0
   AND x.m <= {_BUCKET_CAP}
  UNION
  SELECT DISTINCT mn_train AS doc_a, doc_id AS doc_b
  FROM sized
  WHERE m > {_BUCKET_CAP} AND doc_id % {_EVAL_MOD} = 0
    AND mn_train IS NOT NULL
),{_sql_jaccard_verify(threshold_bp, "train_doc", "eval_doc")}"""


def _train_droplist_apply(sf_dir: str, drops_ds, id_col: str):
    """Shared terminal consumer for contamination drop-lists: anti-join
    dropped TRAIN ids (column ``id_col`` of ``drops_ds``) against the
    train slice of the documents table via ONE co-located
    ``groupby(jpart)`` — the `dedup_apply` shape: neither side
    broadcasts; only metadata columns ride the shuffle, never text."""
    n_jparts = 64

    def drop_side(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({"jpart": int64_col(ids % n_jparts),
                         "doc_id": int64_col(ids),
                         "lang": pa.array([""] * len(ids), pa.string()),
                         "n_chars": int64_col(np.zeros(len(ids), np.int64)),
                         "side": int64_col(np.ones(len(ids), np.int64))})

    def doc_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tr = (ids % _EVAL_MOD) != 0
        batch = batch.filter(pa.array(tr))
        ids = ids[tr]
        return pa.table({"jpart": int64_col(ids % n_jparts),
                         "doc_id": int64_col(ids),
                         "lang": batch.column("lang"),
                         "n_chars": batch.column("n_chars").cast(pa.int64()),
                         "side": int64_col(np.zeros(len(ids), np.int64))})

    def anti(df: pd.DataFrame) -> pa.Table:
        docs = df[df["side"] == 0]
        dead = set(df.loc[df["side"] == 1, "doc_id"].to_numpy())
        live = docs[~docs["doc_id"].isin(dead)]
        return pa.table({"doc_id": int64_col(live["doc_id"].to_numpy(np.int64)),
                         "lang": pa.array(live["lang"].tolist(), pa.string()),
                         "n_chars": int64_col(live["n_chars"].to_numpy(np.int64))})

    drops = drops_ds.map_batches(drop_side, batch_format="pyarrow")
    docs = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        doc_side, batch_format="pyarrow", batch_size=65536)
    return docs.union(drops).groupby("jpart").map_groups(
        anti, batch_format="pandas")


def decontaminate_apply(sf_dir: str, threshold_bp: int = 5000):
    """(doc_id, lang, n_chars) of TRAIN documents surviving MinHash
    decontamination — the terminal consumer of ``decontaminate``: train
    docs with any verified eval near-dup become a drop-list that
    anti-joins the train slice of the documents table (shared
    `_train_droplist_apply` shape)."""
    return _train_droplist_apply(
        sf_dir, decontaminate(sf_dir, threshold_bp), "train_doc")


def ngram_contamination_apply(sf_dir: str, k: int = _SPAN_K,
                              pos_cap: int = _SPAN_POS_CAP):
    """(doc_id, lang, n_chars) of TRAIN documents surviving EXACT-span
    decontamination — the terminal consumer of ``ngram_contamination``:
    any train doc sharing a verbatim >= k-char span with an eval doc is
    dropped (the GPT-3-style release policy), via the same co-located
    anti-join as ``decontaminate_apply``. The two applies compose: a
    release pipeline runs both and intersects survivors."""
    return _train_droplist_apply(
        sf_dir, ngram_contamination(sf_dir, k, pos_cap), "doc_id")


def ngram_contamination_apply_sql(k: int = _SPAN_K,
                                  pos_cap: int = _SPAN_POS_CAP) -> str:
    return f"""
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id % {_EVAL_MOD} <> 0 AND d.doc_id NOT IN (
  SELECT doc_id FROM ({ngram_contamination_sql(k, pos_cap)}) p)
"""


def decontaminate_apply_sql(threshold_bp: int = 5000) -> str:
    return f"""
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d
WHERE d.doc_id % {_EVAL_MOD} <> 0 AND d.doc_id NOT IN (
  SELECT train_doc FROM ({decontaminate_sql(threshold_bp)}) p)
"""


# ---------------- SemDeDup (within-kmeans-cluster near-dups) ---------


class _SemAssign:
    """map_batches: append the nearest-final-centroid cluster id to
    each (vec_id, embedding) row — exact int64 distance against the
    ray.put-broadcast centroid matrix (one fetch per actor)."""

    def __init__(self, cent_ref):
        import ray

        self.cent = ray.get(cent_ref)               # (k, d) int64 micro

    def __call__(self, batch: pa.Table) -> pa.Table:
        from searchengine_ray.pipelines.ann import _kmeans_assign

        micro = np.floor(emb_matrix(batch.column("embedding"))
                         * 1_000_000 + 0.5).astype(np.int64)
        return batch.append_column(
            "cluster", int64_col(_kmeans_assign(micro, self.cent)))


class _ClusterPairsCosine(_BucketPairsCosine):
    """Within-CLUSTER exact cosine pairs, cluster id carried through
    (same chunked-matmul body as the LSH bucket stage). Clusters above
    ``star_cap`` members switch to the STAR policy the LSH dedup uses
    on hot buckets: each member pairs with the cluster's min vec_id
    only — O(m) edges instead of O(m²), connectivity for survivor
    selection preserved — so a degenerate cluster (an all-near-same
    corpus collapsing into one centroid) cannot make one group task
    emit quadratic rows."""

    def __init__(self, threshold_bp: int, star_cap: int):
        super().__init__(threshold_bp)
        self.__name__ = "cluster_pairs_cosine"
        self.star_cap = star_cap

    def __call__(self, group: pa.Table) -> pa.Table:
        cluster = (int(group.column("cluster")[0].as_py())
                   if len(group) else 0)
        if len(group) > self.star_cap:
            ids = group.column("vec_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            emb = emb_matrix(group.column("embedding"))
            emb = emb / np.maximum(
                np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
            mn = int(ids.argmin())
            sims_bp = bp(emb[mn] @ emb.T)               # (m,)
            keep = (sims_bp >= self.threshold_bp) & (ids != ids[mn])
            out = pa.table({
                "vec_a": int64_col(np.full(int(keep.sum()), ids[mn],
                                           np.int64)),
                "vec_b": int64_col(ids[keep]),
                "cosine_bp": int64_col(sims_bp[keep])})
        else:
            out = super().__call__(group)
        return pa.table({
            "cluster": int64_col(np.full(len(out), cluster, np.int64)),
            "vec_a": out.column("vec_a"), "vec_b": out.column("vec_b"),
            "cosine_bp": out.column("cosine_bp")})


def semdedup(sf_dir: str, k: int = 8, iters: int = 2,
             threshold_bp: int = 4000, star_cap: int = 256):
    """(cluster, vec_a, vec_b, cosine_bp) — semantic near-dup pairs
    WITHIN k-means clusters (SemDeDup, Abbas et al. 2023 "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space, then run exact
    cosine only within each cluster, so the quadratic work is bounded
    by cluster size (~n/k per task), never N².

    Shape: ``ann._kmeans_centroids`` (iters broadcast+partial-sum
    passes) -> one assignment ``map_batches`` under the FINAL
    centroids -> ONE groupby(cluster) whose map_groups does a chunked
    matmul per cluster. SIZE k ~ n/star_cap: clusters above
    ``star_cap`` fall back to star pairs (min-id vs rest — O(m) edges,
    the LSH hot-bucket policy) so no group task is ever quadratic, but
    star pairs only surface min-id edges — measured at 500k vecs
    (BENCH/r4_emb_500k.json), k=16 emits 0 of 5,000 planted pairs
    (31k-vector clusters, all star) while k=2048 (~244/cluster)
    recovers them at the method's cross-cluster-miss rate; survivors
    follow via the existing ``connected_components`` + anti-join
    apply. Pairs emit once (vec_a < vec_b) with the shared bp
    float->int contract, so the oracle (kmeans CTE chain + final
    assignment + within-cluster self-join on list_cosine_similarity,
    star policy mirrored via a per-cluster size CTE) replays it
    exactly."""
    import ray

    from searchengine_ray.pipelines.ann import _kmeans_centroids

    cent, _ = _kmeans_centroids(sf_dir, k, iters)
    cent_ref = ray.put(cent)
    assigned = read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .map_batches(_SemAssign, fn_constructor_args=(cent_ref,),
                     batch_format="pyarrow", batch_size=4096,
                     concurrency=(1, 4))
    return assigned.groupby("cluster").map_groups(
        _ClusterPairsCosine(threshold_bp, star_cap),
        batch_format="pyarrow")


def semdedup_sql(k: int = 8, iters: int = 2,
                 threshold_bp: int = 4000, star_cap: int = 256) -> str:
    from searchengine_ray.pipelines.ann import _kmeans_ctes

    joined = ",\n".join(_kmeans_ctes(k, iters, final_assign=True))
    f = iters + 1
    return f"""
WITH {joined},
z AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n,
         CAST(min(vec_id) AS BIGINT) AS mn
  FROM s{f} GROUP BY cluster)
SELECT sa.cluster, ea.vec_id AS vec_a, eb.vec_id AS vec_b,
       CAST(floor(list_cosine_similarity(ea.embedding, eb.embedding)
                  * 10000 + 0.5) AS BIGINT) AS cosine_bp
FROM s{f} sa
JOIN s{f} sb ON sa.cluster = sb.cluster AND sa.vec_id < sb.vec_id
JOIN z ON z.cluster = sa.cluster
JOIN embeddings ea ON ea.vec_id = sa.vec_id
JOIN embeddings eb ON eb.vec_id = sb.vec_id
WHERE (z.n <= {star_cap} OR sa.vec_id = z.mn)
  AND floor(list_cosine_similarity(ea.embedding, eb.embedding)
            * 10000 + 0.5) >= {threshold_bp}
"""


def semdedup_prune(sf_dir: str, k: int = 8, iters: int = 2,
                   threshold_bp: int = 4000, star_cap: int = 256):
    """(vec_id, component, keep) — SemDeDup survivor selection: the
    within-cluster pair stream through the generic Hash-to-Min
    ``connected_components``; keep=1 iff the vector IS its component's
    min-id representative (the same min-wins policy as
    ``dedup_survivors``). Drop-list form: vectors absent from this
    table are trivially survivors, so downstream consumes it as an
    anti-join and the result stays pair-scale, never corpus-scale."""

    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table({"doc_a": b.column("vec_a"),
                         "doc_b": b.column("vec_b")})

    def to_vec_cols(b: pa.Table) -> pa.Table:
        return pa.table({"vec_id": b.column("doc_id"),
                         "component": b.column("component"),
                         "keep": b.column("keep")})

    pairs = semdedup(sf_dir, k, iters, threshold_bp, star_cap)
    labels = connected_components(
        pairs.map_batches(to_edges, batch_format="pyarrow"))
    return labels.map_batches(to_vec_cols, batch_format="pyarrow")


def semdedup_prune_sql(k: int = 8, iters: int = 2,
                       threshold_bp: int = 4000,
                       star_cap: int = 256) -> str:
    return f"""
WITH RECURSIVE
p AS (SELECT vec_a, vec_b
      FROM ({semdedup_sql(k, iters, threshold_bp, star_cap)}) sp),
e AS (SELECT vec_a AS a, vec_b AS b FROM p
      UNION SELECT vec_b AS a, vec_a AS b FROM p),
n AS (SELECT DISTINCT a AS node FROM e),
walk(node, front) AS (
  SELECT node, node FROM n
  UNION
  SELECT w.node, e.b FROM walk w JOIN e ON e.a = w.front
)
SELECT node AS vec_id, min(front) AS component,
       CAST(node = min(front) AS BIGINT) AS keep
FROM walk GROUP BY node
"""


# ---------------- graph centrality over the near-dup graph -----------

_PR_SCALE = 1_000_000           # rank fixed-point: parts-per-million
_PR_TELEPORT = 150_000          # floor(0.15 * _PR_SCALE)
_PR_DNUM, _PR_DDEN = 85, 100    # damping 0.85 as an exact rational
_PR_ROUNDS = 3


class _PageRankContribGroup:
    """``groupby(gkey).map_groups`` body for one power-iteration round.

    The group is one hash bucket of source nodes holding BOTH row
    kinds: edge rows ``(u, v, r=-1)`` and rank rows ``(u, -1, r)`` —
    co-located by ``gkey = hash(u) % G``, so every node's out-edges and
    its current rank meet in one task. Emits per-target contribution
    partials ``(v, c)`` with ``c = (85 * r(u)) // (100 * deg(u))`` —
    exact int64 arithmetic, so the distributed sum is order-independent
    and the unrolled-CTE oracle replays it bit-for-bit. Fully
    vectorized: segment bounds via flatnonzero, per-segment rank lookup
    via searchsorted, in-group pre-aggregation by target via reduceat
    (a node's many in-bucket neighbors collapse to one shuffle row).
    """

    __name__ = "pagerank_contrib_group"

    def __call__(self, group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        r = group.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
        em = r < 0                                 # edge rows
        eu, ev = u[em], v[em]
        ru, rv = u[~em], r[~em]
        ro = np.argsort(ru, kind="stable")
        ru, rv = ru[ro], rv[ro]
        eo = np.argsort(eu, kind="stable")
        eu, ev = eu[eo], ev[eo]
        starts = np.flatnonzero(np.r_[True, eu[1:] != eu[:-1]])
        deg = np.diff(np.r_[starts, len(eu)])
        rank_seg = rv[np.searchsorted(ru, eu[starts])]
        contrib_seg = (_PR_DNUM * rank_seg) // (_PR_DDEN * deg)
        seg_id = np.cumsum(np.r_[False, eu[1:] != eu[:-1]])
        c = contrib_seg[seg_id]
        vo = np.argsort(ev, kind="stable")
        ev, c = ev[vo], c[vo]
        vstarts = np.flatnonzero(np.r_[True, ev[1:] != ev[:-1]])
        return pa.table({"v": int64_col(ev[vstarts]),
                         "c": int64_col(np.add.reduceat(c, vstarts))})


def _pr_gkey(col: np.ndarray) -> np.ndarray:
    g = (col.astype(np.uint64) * _CC_C) >> np.uint64(48)
    return (g % np.uint64(_PAIR_GROUPS)).astype(np.int64)


def pair_pagerank(sf_dir: str):
    """(doc_id, rank_ppm) — PageRank centrality over the undirected
    SimHash near-dup graph after ``_PR_ROUNDS`` power iterations.

    The curation use: inside a duplicate cluster the highest-centrality
    member is the best canonical representative (most corroborated by
    near-dup evidence) — a principled alternative to min-id-wins
    survivor selection, and the third member of the graph-op family
    beside Hash-to-Min connected components and the survivor anti-join.

    Scale shape: the static edge table (both orientations, gkey'd by
    source, degree derived IN the co-group — all of u's edges share its
    bucket) is materialized once at pair scale; each iteration is ONE
    co-located groupby(gkey) emitting pre-summed (target, contribution)
    partials plus ONE groupby(v) sum — never corpus-scale state, no
    driver materialization. Ranks are integer ppm with floor division
    (r' = 150000 + sum((85*r)//(100*deg))): exact on any cluster shape,
    replayed bit-for-bit by the unrolled-CTE DuckDB oracle. Fixed
    iteration count (no convergence test) keeps engine and oracle in
    lockstep; hub damping is inherited from the pair stream's star-cap
    policy, which bounds any node's degree growth on hot buckets.
    """
    from ray.data.aggregate import Sum

    pairs = simhash_near_dups(sf_dir)

    def orient(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        uu = np.concatenate([a, b])
        vv = np.concatenate([b, a])
        return pa.table({"u": int64_col(uu), "v": int64_col(vv),
                         "r": int64_col(np.full(len(uu), -1)),
                         "gkey": int64_col(_pr_gkey(uu))})

    edges = pairs.map_batches(orient, batch_format="pyarrow").materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        nodes = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(nodes)
        return pa.table({"u": int64_col(nodes),
                         "v": int64_col(np.full(n, -1)),
                         "r": int64_col(np.full(n, _PR_SCALE)),
                         "gkey": int64_col(_pr_gkey(nodes))})

    from ray.data.aggregate import Count

    ranks = edges.groupby("u").aggregate(Count(alias_name="_d")) \
                 .map_batches(init_ranks, batch_format="pyarrow")

    def next_ranks(batch: pa.Table) -> pa.Table:
        nodes = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        summed = batch.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": int64_col(nodes),
                         "v": int64_col(np.full(len(nodes), -1)),
                         "r": int64_col(_PR_TELEPORT + summed),
                         "gkey": int64_col(_pr_gkey(nodes))})

    for _ in range(_PR_ROUNDS):
        contrib = edges.union(ranks).groupby("gkey").map_groups(
            _PageRankContribGroup(), batch_format="pyarrow")
        ranks = contrib.groupby("v").sum("c").map_batches(
            next_ranks, batch_format="pyarrow")

    return ranks.map_batches(lambda b: pa.table(
        {"doc_id": b.column("u"), "rank_ppm": b.column("r")}),
        batch_format="pyarrow")


def pair_pagerank_sql() -> str:
    """Unrolled-CTE replay: same edges (both orientations of the exact
    SimHash pair replay), same integer floor-division update, one CTE
    block per iteration."""
    rounds = []
    prev = "r0"
    for i in range(1, _PR_ROUNDS + 1):
        rounds.append(f"""
r{i} AS (
  SELECT e.b AS v,
         {_PR_TELEPORT} + CAST(sum(({_PR_DNUM} * {prev}.r)
                                   // ({_PR_DDEN} * deg.d)) AS BIGINT) AS r
  FROM e JOIN deg ON deg.a = e.a JOIN {prev} ON {prev}.v = e.a
  GROUP BY e.b)""")
        prev = f"r{i}"
    blocks = ",".join(rounds)
    return f"""
WITH p AS ({simhash_near_dups_sql()}),
e AS (SELECT doc_a AS a, doc_b AS b FROM p
      UNION ALL SELECT doc_b AS a, doc_a AS b FROM p),
deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY a),
r0 AS (SELECT a AS v, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg),
{blocks}
SELECT v AS doc_id, r AS rank_ppm FROM {prev}
"""


# ---- triangle counting over the near-dup graph -----------------------


def _tri_pair_gkey(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    g = (x.astype(np.uint64) * _CC_C + y.astype(np.uint64)) >> np.uint64(48)
    return (g % np.uint64(_PAIR_GROUPS)).astype(np.int64)


_TRI_AB_SCHEMA = pa.schema([
    ("gkey", pa.int64()), ("kind", pa.int64()),
    ("a", pa.int64()), ("b", pa.int64()),
])
_TRI_WEDGE_SCHEMA = pa.schema([
    ("gkey", pa.int64()), ("tag", pa.int64()),
    ("x", pa.int64()), ("y", pa.int64()), ("c", pa.int64()),
])


def _tri_deg_src(df: pd.DataFrame) -> pa.Table:
    """gkey(u) co-group: all of u's edge rows share the bucket, so
    deg(u) is a value_counts inside it — no degree join ever ships."""
    u = df["a"].to_numpy(np.int64)
    v = df["b"].to_numpy(np.int64)
    du = df["a"].map(df["a"].value_counts()).to_numpy(np.int64)
    return pa.table({"gkey": int64_col(_pr_gkey(v)),
                     "kind": int64_col(np.zeros(len(df), np.int64)),
                     "a": int64_col(u), "b": int64_col(v),
                     "du": int64_col(du)})


def _tri_orient_dst(df: pd.DataFrame) -> pa.Table:
    """gkey(v) co-group: derive deg(v) the same way, then orient each
    undirected edge from its (deg, id)-smaller endpoint — every edge
    appears here in both orientations, so exactly one row survives.
    Also emits one (node, degree) row per distinct v (kind=1)."""
    u = df["a"].to_numpy(np.int64)
    v = df["b"].to_numpy(np.int64)
    du = df["du"].to_numpy(np.int64)
    dv = df["b"].map(df["b"].value_counts()).to_numpy(np.int64)
    keep = (du < dv) | ((du == dv) & (u < v))
    nodes, idx = np.unique(v, return_index=True)
    out_g = np.concatenate([_pr_gkey(u[keep]), _pr_gkey(nodes)])
    out_k = np.concatenate([np.zeros(int(keep.sum()), np.int64),
                            np.ones(len(nodes), np.int64)])
    out_a = np.concatenate([u[keep], nodes])
    out_b = np.concatenate([v[keep], dv[idx]])
    return pa.table({"gkey": int64_col(out_g), "kind": int64_col(out_k),
                     "a": int64_col(out_a), "b": int64_col(out_b)},
                    schema=_TRI_AB_SCHEMA)


def _tri_wedges(df: pd.DataFrame) -> pa.Table:
    """gkey(src) co-group over ORIENTED edges: per source node, emit
    every unordered pair of its out-neighbors as a wedge keyed by the
    pair. Degree orientation bounds out-degree at O(sqrt(m)), so the
    per-node triu blow-up is bounded even at a hub (the min-id center
    of a star-capped hot bucket), which plain id-orientation would
    square."""
    df = df.sort_values("a", kind="stable")
    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    xs, ys, cs = [], [], []
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    bounds = np.r_[starts, len(a)]
    for i in range(len(starts)):
        nb = np.sort(b[bounds[i]:bounds[i + 1]])
        if len(nb) < 2:
            continue
        ii, jj = np.triu_indices(len(nb), 1)
        xs.append(nb[ii])
        ys.append(nb[jj])
        cs.append(np.full(len(ii), a[bounds[i]], np.int64))
    if not xs:
        return _TRI_WEDGE_SCHEMA.empty_table()
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    c = np.concatenate(cs)
    return pa.table({"gkey": int64_col(_tri_pair_gkey(x, y)),
                     "tag": int64_col(np.zeros(len(x), np.int64)),
                     "x": int64_col(x), "y": int64_col(y),
                     "c": int64_col(c)}, schema=_TRI_WEDGE_SCHEMA)


def _tri_match(df: pd.DataFrame) -> pa.Table:
    """gkey(x, y) co-group: wedges whose (x, y) pair IS an edge close a
    triangle; credit all three corners with pre-summed partials."""
    edges = df[df["tag"] == 1]
    wedges = df[df["tag"] == 0]
    hit = wedges.merge(edges[["x", "y"]], on=["x", "y"])
    if not len(hit):
        return pa.table({"node": pa.array([], pa.int64()),
                         "t_p": pa.array([], pa.int64()),
                         "d_p": pa.array([], pa.int64())})
    nodes = np.concatenate([hit["x"].to_numpy(np.int64),
                            hit["y"].to_numpy(np.int64),
                            hit["c"].to_numpy(np.int64)])
    uniq, counts = np.unique(nodes, return_counts=True)
    return pa.table({"node": int64_col(uniq),
                     "t_p": int64_col(counts.astype(np.int64)),
                     "d_p": int64_col(np.zeros(len(uniq), np.int64))})


def pair_triangles(sf_dir: str):
    """(doc_id, degree, triangles, lcc_bp) — per-node triangle count
    and local clustering coefficient (basis points, exact integer
    floor division) over the undirected SimHash near-dup graph. The
    curation read: high-lcc nodes sit inside tight duplicate cliques
    (template families, mirror sets); low-lcc high-degree nodes are
    hub-like false-positive magnets — the standard graph-quality
    signal beside PageRank centrality and connected components.

    Scale shape (Suri & Vassilvitskii 2011 degree-ordered wedges):
    degrees derive inside two node-keyed co-groups (never a join);
    each edge orients from its (deg, id)-smaller endpoint, bounding
    out-degree at O(sqrt m); wedges (out-neighbor pairs) meet canonical
    edges in ONE pair-keyed co-group; per-corner counts pre-sum in the
    group and one final Sum aggregate merges them with the degree
    rows. Everything is pair-scale or wedge-scale — no corpus-scale
    state, no driver materialization. Exact counting (orientation is
    only an efficiency device), so the set-algebra DuckDB oracle
    matches bit-for-bit."""
    from ray.data.aggregate import Sum

    pairs = simhash_near_dups(sf_dir)

    def orient_both(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uu = np.concatenate([a, b])
        vv = np.concatenate([b, a])
        return pa.table({"gkey": int64_col(_pr_gkey(uu)),
                         "kind": int64_col(np.zeros(len(uu), np.int64)),
                         "a": int64_col(uu), "b": int64_col(vv)},
                        schema=_TRI_AB_SCHEMA)

    def canon_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = np.minimum(a, b)
        y = np.maximum(a, b)
        return pa.table({"gkey": int64_col(_tri_pair_gkey(x, y)),
                         "tag": int64_col(np.ones(len(x), np.int64)),
                         "x": int64_col(x), "y": int64_col(y),
                         "c": int64_col(np.full(len(x), -1, np.int64))},
                        schema=_TRI_WEDGE_SCHEMA)

    und = pairs.map_batches(orient_both, batch_format="pyarrow") \
        .materialize()
    with_du = und.groupby("gkey").map_groups(_tri_deg_src,
                                             batch_format="pandas")
    oriented = with_du.groupby("gkey").map_groups(_tri_orient_dst,
                                                  batch_format="pandas") \
        .materialize()

    deg_rows = oriented.filter(expr="kind == 1").map_batches(
        lambda t: pa.table({"node": t.column("a"),
                            "t_p": pa.array(np.zeros(len(t), np.int64),
                                            pa.int64()),
                            "d_p": t.column("b")}),
        batch_format="pyarrow")
    wedges = oriented.filter(expr="kind == 0").groupby("gkey").map_groups(
        _tri_wedges, batch_format="pandas")
    edges = pairs.map_batches(canon_edges, batch_format="pyarrow")
    matched = wedges.union(edges).groupby("gkey").map_groups(
        _tri_match, batch_format="pandas")

    summed = matched.union(deg_rows).groupby("node").aggregate(
        Sum("t_p", alias_name="triangles"),
        Sum("d_p", alias_name="degree"))

    def finish(b: pa.Table) -> pa.Table:
        t = b.column("triangles").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = b.column("degree").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lcc = np.where(d >= 2, (20000 * t) // np.maximum(d * (d - 1), 1),
                       0).astype(np.int64)
        return pa.table({"doc_id": b.column("node"),
                         "degree": int64_col(d),
                         "triangles": int64_col(t),
                         "lcc_bp": int64_col(lcc)})

    return summed.map_batches(finish, batch_format="pyarrow")


def pair_triangles_sql() -> str:
    """Set-algebra replay: triangles are ordered triples x<y<z with all
    three canonical edges present; per-node counts via corner unions."""
    return f"""
WITH p AS ({simhash_near_dups_sql()}),
e AS (SELECT LEAST(doc_a, doc_b) AS a, GREATEST(doc_a, doc_b) AS b FROM p),
und AS (SELECT a AS u FROM e UNION ALL SELECT b FROM e),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
tn AS (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
       UNION ALL SELECT z FROM tri),
tc AS (SELECT n, CAST(count(*) AS BIGINT) AS t FROM tn GROUP BY n)
SELECT deg.u AS doc_id, deg.d AS degree,
       COALESCE(tc.t, 0) AS triangles,
       CASE WHEN deg.d >= 2
            THEN (20000 * COALESCE(tc.t, 0)) // (deg.d * (deg.d - 1))
            ELSE 0 END AS lcc_bp
FROM deg LEFT JOIN tc ON tc.n = deg.u
"""


def dedup_component_sizes(sf_dir: str, threshold_bp: int = 5000):
    """(size, n_components) — the size histogram of the verified
    near-dup connected components: the duplication-structure read
    (a heavy tail of giant components means template families /
    mirrors; all-2 components mean isolated pairs) that sizes the
    star-cap and Hash-to-Min round-count knobs. Two pair-scale
    groupbys over the `dedup_survivors` labels; the histogram is at
    most max-component-size rows. Oracle nests the recursive-CTE
    closure."""
    cc = connected_components(minhash_lsh_dedup(sf_dir, threshold_bp))
    sizes = cc.groupby("component").count() \
        .rename_columns({"count()": "size"})

    def hist_partial(batch: pa.Table) -> pa.Table:
        s = batch.column("size").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uq, cnt = np.unique(s, return_counts=True)
        return pa.table({"size": int64_col(uq),
                         "n_p": int64_col(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum

    return sizes.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("size").aggregate(Sum("n_p", alias_name="n_components"))


def dedup_component_sizes_sql(threshold_bp: int = 5000) -> str:
    return f"""
WITH s AS ({dedup_survivors_sql(threshold_bp)}),
g AS (SELECT component, CAST(count(*) AS BIGINT) AS size
      FROM s GROUP BY component)
SELECT size, CAST(count(*) AS BIGINT) AS n_components
FROM g GROUP BY size
"""


def dedup_method_overlap(sf_dir: str):
    """One row (n_minhash, n_simhash, n_both) — agreement audit of the
    two syntactic near-dup detectors over their canonical pair sets:
    the go/no-go read when choosing (or cross-checking) a dedup method
    on a new corpus. Both pair streams stay distributed — canonical
    (min, max) keys union under side tags into ONE pair-keyed groupby,
    each group collapses to membership flags, and per-batch partial
    counts sum to the single report row; nothing pair-scale ever
    reaches the driver."""
    import ray
    from ray.data.aggregate import Max, Sum

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            a = batch.column("doc_a").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            b = batch.column("doc_b").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            m = np.full(len(a), 1 - side, np.int64)
            s = np.full(len(a), side, np.int64)
            return pa.table({"a": int64_col(np.minimum(a, b)),
                             "b": int64_col(np.maximum(a, b)),
                             "m": int64_col(m), "s": int64_col(s)})

        f.__name__ = f"tag_side{side}"
        return f

    mh = minhash_lsh_dedup(sf_dir).map_batches(tag(0),
                                               batch_format="pyarrow")
    sh = simhash_near_dups(sf_dir).map_batches(tag(1),
                                               batch_format="pyarrow")
    flags = mh.union(sh).groupby(["a", "b"]).aggregate(
        Max("m", alias_name="in_m"), Max("s", alias_name="in_s"))

    def count_partial(batch: pa.Table) -> pa.Table:
        im = batch.column("in_m").to_numpy(zero_copy_only=False)
        isv = batch.column("in_s").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_minhash_p": int64_col(np.array([int(im.sum())], np.int64)),
            "n_simhash_p": int64_col(np.array([int(isv.sum())], np.int64)),
            "n_both_p": int64_col(np.array([int((im & isv).sum())],
                                           np.int64))})

    from ray.data.aggregate import Sum as _Sum

    out = flags.map_batches(count_partial, batch_format="pyarrow") \
        .aggregate(_Sum("n_minhash_p", alias_name="n_minhash"),
                   _Sum("n_simhash_p", alias_name="n_simhash"),
                   _Sum("n_both_p", alias_name="n_both"))
    return pa.table({"n_minhash": int64_col([out["n_minhash"]]),
                     "n_simhash": int64_col([out["n_simhash"]]),
                     "n_both": int64_col([out["n_both"]])})


def dedup_method_overlap_sql() -> str:
    return f"""
WITH m AS (SELECT LEAST(doc_a, doc_b) AS a, GREATEST(doc_a, doc_b) AS b
           FROM ({minhash_lsh_dedup_sql()}) mm),
s AS (SELECT LEAST(doc_a, doc_b) AS a, GREATEST(doc_a, doc_b) AS b
      FROM ({simhash_near_dups_sql()}) ss),
u AS (SELECT a, b, max(im) AS in_m, max(isv) AS in_s FROM (
        SELECT a, b, 1 AS im, 0 AS isv FROM m
        UNION ALL SELECT a, b, 0, 1 FROM s)
      GROUP BY a, b)
SELECT CAST(sum(in_m) AS BIGINT) AS n_minhash,
       CAST(sum(in_s) AS BIGINT) AS n_simhash,
       CAST(sum(in_m * in_s) AS BIGINT) AS n_both
FROM u
"""


def _span_frac_group(df: pd.DataFrame) -> pa.Table:
    """gkey co-group body: a position is duplicated iff its k-gram hash
    occurs in >= 2 DISTINCT docs (cross-doc verbatim copy — intra-doc
    repeats belong to repetition_quality). O(group) work: membership
    only, never pair enumeration, so boilerplate-scale hashes cost
    linear time here (no pos_cap needed)."""
    d = df.groupby("h")["doc_id"].nunique()
    dup = df["h"].map(d).ge(2)
    out = df.assign(dup=dup.astype(np.int64)).groupby(
        "doc_id", as_index=False).agg(n_pos_p=("pos", "size"),
                                      n_dup_p=("dup", "sum"))
    return pa.table({"doc_id": int64_col(out["doc_id"].to_numpy(np.int64)),
                     "n_pos_p": int64_col(out["n_pos_p"].to_numpy(np.int64)),
                     "n_dup_p": int64_col(out["n_dup_p"].to_numpy(np.int64))})


def span_dup_fraction(sf_dir: str, k: int = _SPAN_K):
    """(doc_id, n_windows, n_dup_windows, dup_frac_bp) — per-document
    duplicated-text fraction: the share of the doc's length-k character
    windows that appear VERBATIM in at least one other document, in
    basis points — the Lee et al. 2022 policy signal ("drop or trim
    docs that are mostly copies") as a per-doc score, the terminal
    read of the dedup_spans machinery.

    Shape: the same anchor stage and ONE gkey-bucketed shuffle as
    dedup_spans, but the group body is membership-counting (linear),
    not pair enumeration — so no boilerplate cutoff is needed and the
    result is exact at any skew; per-doc partials then sum under one
    doc-keyed groupby and the fraction is integer floor-division.
    Docs shorter than k emit nothing on both sides."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    anchors = ds.map_batches(SpanAnchorStage, fn_constructor_args=(k, 1),
                             batch_format="pyarrow", batch_size=512,
                             concurrency=(1, 4))
    per = anchors.groupby("gkey").map_groups(
        _span_frac_group, batch_format="pandas") \
        .groupby("doc_id").aggregate(Sum("n_pos_p", alias_name="n_windows"),
                                     Sum("n_dup_p",
                                         alias_name="n_dup_windows"))

    def frac(batch: pa.Table) -> pa.Table:
        n = batch.column("n_windows").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch.column("n_dup_windows").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.append_column(
            "dup_frac_bp", pa.array(d * 10000 // n, pa.int64()))

    return per.map_batches(frac, batch_format="pyarrow")


def span_dup_fraction_sql(k: int = _SPAN_K) -> str:
    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {k} + 1)) AS p
  FROM documents WHERE length(text) >= {k}),
hashes AS (
  SELECT doc_id, p - 1 AS pos,
         CAST(list_reduce(
                list_transform(
                  [substr(text, p + j, 1) for j in generate_series(0, {k - 1})],
                  c -> CAST(ord(c) AS HUGEINT)),
                (a, x) -> (a * {_SPAN_B} + x) % {_SPAN_M}) AS BIGINT) AS h
  FROM pos),
hd AS (SELECT h, count(DISTINCT doc_id) AS nd FROM hashes GROUP BY h)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN hd.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_windows,
       CAST(sum(CASE WHEN hd.nd >= 2 THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS dup_frac_bp
FROM hashes JOIN hd USING (h)
GROUP BY doc_id
"""


def dedup_spans_sampled(sf_dir: str, anchor_mod: int = 4):
    """The 100-TB setting of ``dedup_spans``: content-defined anchor
    sampling (``h % anchor_mod == 0``, Manber 1994) thins anchor volume
    ~anchor_mod-fold; detected spans report anchor-extent lower-bound
    lengths. Registered separately so the SCALE KNOB itself is
    hash-verified by the driver, not only pytest-checked."""
    return dedup_spans(sf_dir, anchor_mod=anchor_mod)


def dedup_spans_sampled_sql(anchor_mod: int = 4) -> str:
    return dedup_spans_sql(anchor_mod=anchor_mod)


# ---------------- exact n-gram (span) contamination ----------------


def _make_cross_span_pairs(pos_cap: int, n_jparts: int = 64):
    """Cross-side variant of ``_make_span_pairs``: matched positions
    oriented TRAIN (doc_a) x EVAL (doc_b) only — the contamination
    check never enumerates train x train or eval x eval pairs. Same
    global-per-h boilerplate cutoff (all rows of an h share its gkey,
    so in-group counts are global), same bounded jkey fan-out."""

    def cross_span_pairs(df: pd.DataFrame) -> pa.Table:
        empty = pa.table({"jkey": pa.array([], pa.int64()),
                          "doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "pa_": pa.array([], pa.int64()),
                          "pb_": pa.array([], pa.int64())})
        sizes = df.groupby("h")["doc_id"].transform("size")
        df = df[sizes <= pos_cap]
        if len(df) < 2:
            return empty
        ie = (df["doc_id"] % _EVAL_MOD) == 0
        tr, ev = df[~ie], df[ie]
        if not len(tr) or not len(ev):
            return empty
        m = tr.merge(ev, on="h")
        if not len(m):
            return empty
        a = m["doc_id_x"].to_numpy(np.int64)
        b = m["doc_id_y"].to_numpy(np.int64)
        jkey = (a * np.int64(1_000_003) + b) % np.int64(n_jparts)
        return pa.table({"jkey": int64_col(jkey),
                         "doc_a": int64_col(a), "doc_b": int64_col(b),
                         "pa_": int64_col(m["pos_x"].to_numpy(np.int64)),
                         "pb_": int64_col(m["pos_y"].to_numpy(np.int64))})

    cross_span_pairs.__name__ = "cross_span_pairs"
    return cross_span_pairs


def ngram_contamination(sf_dir: str, k: int = _SPAN_K,
                        pos_cap: int = _SPAN_POS_CAP, anchor_mod: int = 1):
    """(doc_id, n_eval_docs, max_span, n_pos) — per contaminated TRAIN
    document: how many eval documents it shares a verbatim >= k-char
    span with, the longest such span, and the matched-window count.
    This is the EXACT-overlap decontamination audit (the GPT-3 appendix
    -C / Lee et al. n-gram-collision method) beside the MinHash
    near-dup check (`decontaminate`): fuzzy catches paraphrase-level
    leaks, exact catches verbatim benchmark strings the fuzzy
    threshold can miss inside long documents.

    Shape: reuses `SpanAnchorStage` (one vectorized Horner pass per
    batch, fixed-width anchor rows, ONE hash-bucketed shuffle) and the
    diagonal-island span detector of `dedup_spans`; only the pair stage
    differs (train x eval orientation, never same-side). The final
    per-train-doc rollup is a pair-scale groupby — three integers per
    (train, eval) pair, corpus text never moves. Eval side =
    doc_id % {mod} == 0, the `decontaminate` stand-in convention (a
    separate eval table is a one-line swap). ``anchor_mod`` > 1 is the
    same content-defined-sampling 100-TB knob as `dedup_spans_sampled`
    (detects spans containing >= 1 sampled anchor; max_span becomes an
    anchor-extent lower bound); the registry row runs exact
    (anchor_mod=1)."""
    from ray.data.aggregate import Count, Max, Sum

    ds = read(sf_dir, "documents", ["doc_id", "text"])
    anchors = ds.map_batches(SpanAnchorStage,
                             fn_constructor_args=(k, anchor_mod),
                             batch_format="pyarrow", batch_size=512,
                             concurrency=(1, 4))
    pairs = anchors.groupby("gkey").map_groups(
        _make_cross_span_pairs(pos_cap), batch_format="pandas")
    spans = pairs.groupby("jkey").map_groups(
        _make_span_islands(k, anchor_mod == 1, 0), batch_format="pandas")
    agg = spans.groupby("doc_a").aggregate(
        Count(alias_name="n_eval_docs"),
        Max("span_len", alias_name="max_span"),
        Sum("n_pos", alias_name="n_pos"))

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["doc_id" if c == "doc_a" else c for c in batch.column_names])

    return agg.map_batches(rename, batch_format="pyarrow")


ngram_contamination.__doc__ = ngram_contamination.__doc__.format(mod=_EVAL_MOD)


def ngram_contamination_sql(k: int = _SPAN_K,
                            pos_cap: int = _SPAN_POS_CAP) -> str:
    """SQL twin of `dedup_spans_sql` with a train x eval side predicate
    in place of the doc_a < doc_b orientation, plus the per-train-doc
    rollup."""
    return f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {k} + 1)) AS p
  FROM documents WHERE length(text) >= {k}),
hashes AS (
  SELECT doc_id, p - 1 AS pos,
         CAST(list_reduce(
                list_transform(
                  [substr(text, p + j, 1) for j in generate_series(0, {k - 1})],
                  c -> CAST(ord(c) AS HUGEINT)),
                (a, x) -> (a * {_SPAN_B} + x) % {_SPAN_M}) AS BIGINT) AS h
  FROM pos),
anchors AS (
  SELECT * FROM hashes
  QUALIFY count(*) OVER (PARTITION BY h) <= {pos_cap}),
matched AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.pos AS pa, y.pos AS pb
  FROM anchors x JOIN anchors y ON x.h = y.h
  WHERE x.doc_id % {_EVAL_MOD} != 0 AND y.doc_id % {_EVAL_MOD} = 0),
islands AS (
  SELECT doc_a, doc_b, pa,
         pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                 ORDER BY pa) AS grp,
         pa - pb AS diag
  FROM matched),
spans AS (
  SELECT doc_a, doc_b, count(*) + {k - 1} AS span, count(*) AS npos
  FROM islands GROUP BY doc_a, doc_b, diag, grp),
pair_spans AS (
  SELECT doc_a, doc_b, max(span) AS span_len, sum(npos) AS n_pos
  FROM spans GROUP BY doc_a, doc_b)
SELECT doc_a AS doc_id, CAST(count(*) AS BIGINT) AS n_eval_docs,
       CAST(max(span_len) AS BIGINT) AS max_span,
       CAST(sum(n_pos) AS BIGINT) AS n_pos
FROM pair_spans GROUP BY doc_a
"""


# ---------------- incremental (snapshot-vs-batch) exact dedup ----------------

_INC_MOD = 3          # incoming = doc_id % _INC_MOD == 0 (deterministic split)
_INC_SENTINEL = 1 << 62


def _ensure_sig_store(sf_dir: str) -> str:
    """Persist (once, marker-gated) the BASE corpus's exact-dedup
    signature table — (text_md5, doc_id) parquet, no text. This is the
    artifact an incremental pipeline keeps between snapshots: the next
    batch dedups against it without ever re-reading base text (at
    100 TB the signature store is ~1/2000th of the corpus)."""
    import json
    from pathlib import Path

    import ray.data

    from searchengine_ray.pipelines.trigram import _corpus_fingerprint

    tag = hashlib.blake2b(
        f"{sf_dir}|sig|{_corpus_fingerprint(sf_dir)}".encode(),
        digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_sig_store/{tag}")
    marker = root / "_DONE.json"
    out = root / "sigs"
    if marker.is_file():
        return str(out)

    def base_sig(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ids % _INC_MOD != 0
        sub = batch.filter(pa.array(keep))
        return _md5_batch(sub)

    (read(sf_dir, "documents", ["doc_id", "text"])
     .map_batches(base_sig, batch_format="pyarrow", batch_size=2048)
     .write_parquet(str(out)))
    marker.write_text(json.dumps({"sf_dir": sf_dir, "mod": _INC_MOD}))
    return str(out)


def dedup_incremental(sf_dir: str):
    """(text_md5, doc_id, n_incoming) — incremental exact dedup: the
    INCOMING batch (doc_id % 3 == 0) deduped against the persisted BASE
    signature store (doc_id % 3 != 0) AND within itself (first-wins =
    min doc_id), without touching base text. The snapshot-lifecycle op:
    at 100 TB you never re-dedup the corpus, you fold each new crawl
    against the signature table and append the survivors' signatures.

    Shape: base side streams (hash, id) rows from the signature store;
    incoming side hashes its text once; ONE hash-partitioned groupby
    folds min-base-id / min-incoming-id / incoming-count per hash;
    survivors are hashes with no base hit. Nothing ships text, nothing
    materializes on the driver."""
    from ray.data.aggregate import Min, Sum

    import ray.data

    sig_dir = _ensure_sig_store(sf_dir)

    def tag_base(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "text_md5": batch.column("text_md5"),
            "base_min": batch.column("doc_id").cast(pa.int64()),
            "inc_min": pa.array([_INC_SENTINEL] * n, pa.int64()),
            "n_inc": pa.array([0] * n, pa.int64())})

    def tag_incoming(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % _INC_MOD == 0))
        h = _md5_batch(sub)
        n = h.num_rows
        return pa.table({
            "text_md5": h.column("text_md5"),
            "base_min": pa.array([_INC_SENTINEL] * n, pa.int64()),
            "inc_min": h.column("doc_id").cast(pa.int64()),
            "n_inc": pa.array([1] * n, pa.int64())})

    base = ray.data.read_parquet(sig_dir).map_batches(
        tag_base, batch_format="pyarrow")
    incoming = (read(sf_dir, "documents", ["doc_id", "text"])
                .map_batches(tag_incoming, batch_format="pyarrow",
                             batch_size=2048))
    agg = (base.union(incoming)
           .groupby("text_md5")
           .aggregate(Min("base_min", alias_name="base_min"),
                      Min("inc_min", alias_name="inc_min"),
                      Sum("n_inc", alias_name="n_incoming")))

    def survivors(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.equal(batch.column("base_min"), pa.scalar(_INC_SENTINEL)),
            pc.not_equal(batch.column("inc_min"), pa.scalar(_INC_SENTINEL)))
        sub = batch.filter(keep)
        return pa.table({"text_md5": sub.column("text_md5"),
                         "doc_id": sub.column("inc_min").cast(pa.int64()),
                         "n_incoming": sub.column("n_incoming").cast(pa.int64())})

    return agg.map_batches(survivors, batch_format="pyarrow")


def dedup_incremental_sql() -> str:
    return f"""
WITH h AS (
  SELECT doc_id, md5(text) AS text_md5, doc_id % {_INC_MOD} = 0 AS inc
  FROM documents),
agg AS (
  SELECT text_md5,
         min(CASE WHEN NOT inc THEN doc_id END) AS base_min,
         min(CASE WHEN inc THEN doc_id END) AS inc_min,
         count(CASE WHEN inc THEN 1 END) AS n_incoming
  FROM h GROUP BY text_md5)
SELECT text_md5, CAST(inc_min AS BIGINT) AS doc_id,
       CAST(n_incoming AS BIGINT) AS n_incoming
FROM agg WHERE inc_min IS NOT NULL AND base_min IS NULL
"""


# ---------------- incremental MinHash (snapshot-vs-batch near-dup) ----------


def _ensure_band_store(sf_dir: str) -> str:
    """Persist (once, marker-gated) the BASE corpus's LSH band rows —
    (doc_id, band, band_hash) parquet. The near-dup analog of the
    exact-dedup signature store: between snapshots the base corpus is
    never re-shingled or re-minhashed (the dominant cost of the LSH
    pipeline); a new batch folds its own band rows against this table."""
    import json
    from pathlib import Path

    from searchengine_ray.pipelines.trigram import _corpus_fingerprint

    tag = hashlib.blake2b(
        f"{sf_dir}|bands|{_corpus_fingerprint(sf_dir)}".encode(),
        digest_size=6).hexdigest()
    root = Path(f"/tmp/graft_band_store/{tag}")
    marker = root / "_DONE.json"
    out = root / "bands"
    if marker.is_file():
        return str(out)

    def pick_base(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _INC_MOD != 0))

    (read(sf_dir, "documents", ["doc_id", "text"])
     .map_batches(pick_base, batch_format="pyarrow")
     .map_batches(MinHashStage, batch_format="pyarrow", batch_size=512,
                  concurrency=(1, 4))
     .write_parquet(str(out)))
    marker.write_text(json.dumps({"sf_dir": sf_dir, "mod": _INC_MOD}))
    return str(out)


def minhash_incremental(sf_dir: str, threshold_bp: int = 5000):
    """(doc_a, doc_b, jaccard_bp) — incremental MinHash-LSH near-dup:
    the INCOMING batch (doc_id % 3 == 0) minhashed fresh, bucketed
    against the persisted BASE band store (doc_id % 3 != 0), keeping
    only pairs that touch an incoming doc; exact-Jaccard verified by
    the same distributed verifier as the full pipeline. Incoming-vs-
    incoming dups are caught too (a new crawl duplicates itself as
    often as it duplicates the archive).

    Shape: identical to ``minhash_lsh_dedup`` except the base side
    streams precomputed (doc_id, band, band_hash) rows from parquet —
    no base text is read until a verify task references a specific
    doc_id. The membership test is arithmetic on the id, so the pair
    filter costs one vectorized modulo, not a join."""
    import ray.data

    from searchengine_ray.pipelines.common import table_path

    band_store = _ensure_band_store(sf_dir)

    def pick_incoming(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % _INC_MOD == 0))

    base = ray.data.read_parquet(band_store)
    incoming = (read(sf_dir, "documents", ["doc_id", "text"])
                .map_batches(pick_incoming, batch_format="pyarrow")
                .map_batches(MinHashStage, batch_format="pyarrow",
                             batch_size=512, concurrency=(1, 4)))
    pairs = (base.union(incoming)
             .map_batches(_add_gkey, batch_format="pyarrow")
             .groupby("gkey").map_groups(
                 _make_grouped_pairs(["band", "band_hash"], _BUCKET_CAP,
                                     hot="star"),
                 batch_format="pandas"))

    def touch_incoming(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        keep = (a % _INC_MOD == 0) | (b % _INC_MOD == 0)
        return batch.filter(pa.array(keep))

    uniq = _distinct_pairs(pairs.map_batches(touch_incoming,
                                             batch_format="pyarrow"))

    def add_vpart(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", int64_col(a % _N_VERIFY_PARTS))

    routed = uniq.map_batches(add_vpart, batch_format="pyarrow")
    verify = JaccardVerifyGroup(table_path(sf_dir, "documents"), threshold_bp)
    return routed.groupby("vpart").map_groups(verify, batch_format="pyarrow")


def minhash_incremental_sql(threshold_bp: int = 5000) -> str:
    # base ∪ incoming is the whole corpus and the band/star policies are
    # shared, so the incremental pair set is EXACTLY the full replay
    # restricted to pairs touching an incoming doc
    return f"""
SELECT doc_a, doc_b, jaccard_bp
FROM ({minhash_lsh_dedup_sql(threshold_bp)})
WHERE doc_a % {_INC_MOD} = 0 OR doc_b % {_INC_MOD} = 0
"""
