"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the ``(repo, path, commit, lang, content)`` Parquet table of
``BASELINE.json`` ``input_hint`` — seeded, pure-python/numpy
deterministic, no wall clock, no external data. Stands in for the
reference's tweet corpus (14-col layout,
``/root/reference/parser_module.py:277-290``).

Engineered properties (so the fixtures exercise the hard paths):
- Zipf-skewed repo sizes (shuffle skew source #1);
- code-stopword-heavy lines hitting most docs ("def", "return", ... —
  skew source #2, exercises the doc-bucket skew split);
- rare terms appearing in exactly one doc (min_df / singleton-prune
  path, reference ``indexer.py:604-615``);
- UPPER/lower casing collision pairs;
- ~0.5% exact duplicate rows (first-wins dedup path);
- written as >= 8 parquet files so parallelism tests have partitions.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["python", "rust", "javascript", "go", "java", "markdown"]
EXT = {"python": ".py", "rust": ".rs", "javascript": ".js", "go": ".go",
       "java": ".java", "markdown": ".md"}

_IDENT_ROOTS = [
    "parse", "read", "write", "buffer", "stream", "index", "token", "query",
    "score", "merge", "block", "batch", "shard", "cache", "hash", "config",
    "result", "value", "count", "total", "offset", "length", "vector",
    "matrix", "client", "server", "request", "response", "handler", "worker",
    "engine", "search", "rank", "filter", "sort", "group", "join", "split",
]
_STOPLINE = "def return if else for while import from class with"
_LITERALS = ["foo", "bar", "baz", "qux", "alpha", "beta", "gamma", "delta"]


def _rng_for(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.PCG64(seed * 1_000_003 + i))


def _make_content(rng: np.random.Generator, doc_idx: int) -> str:
    n_lines = int(rng.integers(5, 60))
    lines = []
    for _ in range(n_lines):
        kind = rng.random()
        if kind < 0.25:
            lines.append(_STOPLINE)
        elif kind < 0.75:
            k = int(rng.integers(2, 7))
            idx = rng.integers(0, len(_IDENT_ROOTS), size=k)
            styles = rng.integers(0, 3, size=k)
            toks = []
            for j in range(k):
                a = _IDENT_ROOTS[int(idx[j])]
                b = _IDENT_ROOTS[int(rng.integers(0, len(_IDENT_ROOTS)))]
                if styles[j] == 0:
                    toks.append(f"{a}_{b}")
                elif styles[j] == 1:
                    toks.append(a + b.capitalize())
                else:
                    toks.append(a)
            lines.append(" = ".join(toks[:2]) + "(" + ", ".join(toks[2:]) + ")")
        elif kind < 0.85:
            lines.append(f"x{int(rng.integers(0, 100))} = "
                         f"{int(rng.integers(0, 10**6))} + {rng.random():.3f}")
        elif kind < 0.93:
            lit = _LITERALS[int(rng.integers(0, len(_LITERALS)))]
            lines.append(f'name = "{lit}{int(rng.integers(0, 50))}"')
        elif kind < 0.97:
            # casing collision pair: same letters, alternating case
            w = _IDENT_ROOTS[int(rng.integers(0, len(_IDENT_ROOTS)))]
            lines.append(w.upper() if rng.random() < 0.5 else w)
        else:
            # a rare singleton term unique to this doc
            lines.append(f"rareterm{doc_idx}unique")
    return "\n".join(lines)


def generate_corpus(n_docs: int, out_dir: str | Path, *, seed: int = 42,
                    n_files: int = 8, dup_frac: float = 0.005,
                    force: bool = False) -> str:
    """Write the corpus as ``n_files`` parquet files under ``out_dir``.

    Idempotent + cached: if the directory already holds a complete
    marker for the same (n_docs, seed, n_files), generation is skipped.
    Returns ``str(out_dir)``.
    """
    out_dir = Path(out_dir)
    marker = out_dir / f".complete-{n_docs}-{seed}-{n_files}"
    if marker.exists() and not force:
        return str(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for old in out_dir.glob("*.parquet"):
        old.unlink()
    for old in out_dir.glob(".complete-*"):
        old.unlink()

    n_repos = max(4, min(200, n_docs // 50))
    # Zipf-ish repo weights
    w = 1.0 / np.arange(1, n_repos + 1, dtype=np.float64)
    w /= w.sum()

    per_file = [n_docs // n_files + (1 if i < n_docs % n_files else 0)
                for i in range(n_files)]
    starts = [sum(per_file[:i]) for i in range(n_files)]

    jobs = [(fi, per_file[fi], starts[fi], n_repos, w, seed, dup_frac,
             str(out_dir)) for fi in range(n_files)]
    # parallelize file generation when a Ray session exists (generation
    # is deterministic PER FILE, so parallel == sequential output)
    try:
        import ray

        use_ray = ray.is_initialized()
    except ImportError:
        use_ray = False
    if use_ray and n_files > 1:
        import ray

        gen = ray.remote(_generate_one_file)
        ray.get([gen.remote(*j) for j in jobs])
    else:
        for j in jobs:
            _generate_one_file(*j)
    marker.touch()
    return str(out_dir)


def _generate_one_file(fi: int, count: int, start_idx: int, n_repos: int,
                       w: np.ndarray, seed: int, dup_frac: float,
                       out_dir: str) -> str:
    rng = _rng_for(seed, fi)
    doc_idx = start_idx
    repos, paths, commits, langs, contents = [], [], [], [], []
    for _ in range(count):
        r = int(rng.choice(n_repos, p=w))
        repo = f"org{r % 7}/project{r}"
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        depth = int(rng.integers(1, 5))
        parts = [f"d{int(rng.integers(0, 9))}" for _ in range(depth - 1)]
        path = "/".join(parts + [f"file_{doc_idx}{EXT[lang]}"])
        commit = hashlib.sha1(f"{repo}/{path}#{seed}".encode()).hexdigest()
        content = _make_content(rng, doc_idx)
        repos.append(repo); paths.append(path); commits.append(commit)
        langs.append(lang); contents.append(content)
        doc_idx += 1
        if rng.random() < dup_frac and repos:
            # exact duplicate row (same key + content) — dedup path
            repos.append(repo); paths.append(path); commits.append(commit)
            langs.append(lang); contents.append(content)
    tbl = pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.large_string()),
    })
    out = Path(out_dir) / f"part-{fi:05d}.parquet"
    pq.write_table(tbl, out)
    return str(out)


def corpus_queries(seed: int = 42, n: int = 40) -> list[tuple[int, str]]:
    """Deterministic reference query set (FIXTURES.md §3): mixes common
    identifiers, stopword-heavy, rare-singleton, unknown and mixed-case
    queries. Returns [(query_id, text)]."""
    rng = np.random.default_rng(seed + 777)
    out = []
    for qid in range(1, n + 1):
        kind = qid % 5
        if kind == 0:
            out.append((qid, f"rareterm{int(rng.integers(0, 500))}unique"))
        elif kind == 1:
            k = int(rng.integers(1, 4))
            out.append((qid, " ".join(
                _IDENT_ROOTS[int(rng.integers(0, len(_IDENT_ROOTS)))] for _ in range(k))))
        elif kind == 2:
            a = _IDENT_ROOTS[int(rng.integers(0, len(_IDENT_ROOTS)))]
            b = _IDENT_ROOTS[int(rng.integers(0, len(_IDENT_ROOTS)))]
            out.append((qid, f"{a}_{b} {a}{b.capitalize()}"))
        elif kind == 3:
            out.append((qid, f"def return {_IDENT_ROOTS[int(rng.integers(0, len(_IDENT_ROOTS)))]}"))
        else:
            out.append((qid, f"zzznosuchterm{qid} {_IDENT_ROOTS[int(rng.integers(0, len(_IDENT_ROOTS)))].upper()}"))
    return out


def default_corpus_dir(tier: str) -> str:
    """Cache location for generated corpora (scratch under /tmp)."""
    return os.path.join("/tmp", "graft_corpus", tier)


TIER_SIZES = {"t1": 1_000, "t2": 10_000, "bench": 2_000_000}
TIER_FILES = {"t1": 8, "t2": 8, "bench": 64}


def ensure_corpus(tier: str = "t2", seed: int = 42) -> str:
    n = TIER_SIZES[tier]
    return generate_corpus(n, default_corpus_dir(tier), seed=seed,
                           n_files=TIER_FILES[tier])
