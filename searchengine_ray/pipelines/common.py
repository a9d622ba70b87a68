"""Shared helpers for the sf_dir pipelines (driver correctness gate).

Conventions that make Ray results hash-identical to DuckDB oracles:

- no raw float columns in outputs — ratios/money go out as integer
  basis points / cents via ``floor(x * scale + 0.5)`` computed with the
  *same* double-precision expression on both sides;
- money sums are summed AS integer cents (exact, order-independent),
  never as floats;
- every aggregate column is explicitly named to match the SQL ``AS``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

SIMPLE_SPLIT_SQL = "regexp_split_to_array(lower({col}), '[^a-z0-9_]+')"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read(sf_dir: str, name: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns)


def bp(x: np.ndarray, scale: int = 10_000) -> np.ndarray:
    """floor(x*scale + 0.5) as int64 — the shared float->int contract."""
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5).astype(np.int64)


def cents(x: np.ndarray) -> np.ndarray:
    return bp(x, 100)


def sql_bp(expr: str, scale: int = 10_000) -> str:
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"


def int64_col(values) -> pa.Array:
    return pa.array(np.asarray(values, dtype=np.int64), pa.int64())


def emb_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column — zero-copy
    flatten + reshape instead of a per-row ``to_pylist`` Python loop
    (embeddings are fixed-dimension, so the flat buffer reshapes
    exactly; raises if a ragged row sneaks in)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if flat.size % n:
        raise ValueError("ragged embedding column")
    return flat.reshape(n, flat.size // n).astype(np.float64, copy=False)
