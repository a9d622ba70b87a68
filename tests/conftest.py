"""Session-scoped Ray + shared fixtures (one ray.init per pytest session)."""

from __future__ import annotations

import pathlib

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_corpus_dir():
    from searchengine_ray.corpus import ensure_corpus

    return ensure_corpus("t1")


@pytest.fixture(scope="session")
def t1_table(t1_corpus_dir):
    return pq.read_table(sorted(pathlib.Path(t1_corpus_dir).glob("*.parquet")))


@pytest.fixture(scope="session")
def small_config():
    from searchengine_ray.config import IndexConfig

    return IndexConfig(num_doc_parts=4, num_term_parts=8)


@pytest.fixture(scope="session")
def t1_index(ray_session, t1_corpus_dir, small_config, tmp_path_factory):
    from searchengine_ray.pipelines.build import build_index

    root = tmp_path_factory.mktemp("idx") / "t1"
    return build_index(t1_corpus_dir, root, small_config, resume=False)


@pytest.fixture(scope="session")
def t1_oracle(t1_table, small_config):
    from searchengine_ray.oracle import OracleIndex

    return OracleIndex(t1_table, small_config)
