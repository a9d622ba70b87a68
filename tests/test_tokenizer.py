"""Analyzer unit cases (table-driven) + batch path == pure path."""

from collections import Counter

import numpy as np
import pytest

from searchengine_ray.config import IndexConfig
from searchengine_ray.tokenizer import Analyzer, expand_token, split_identifier


@pytest.mark.parametrize("token,parts", [
    ("parseHTTPResponse_v2", ["parse", "http", "response", "v2"]),
    ("__init__", ["init"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("XMLHttpRequest", ["xml", "http", "request"]),
    ("simple", ["simple"]),
    ("x", ["x"]),
    ("UPPER", ["upper"]),
])
def test_split_identifier(token, parts):
    assert split_identifier(token) == parts


def test_expand_emits_compound_and_parts():
    assert expand_token("fooBar") == ["foobar", "foo", "bar"]
    # stopwords dropped (code keywords)
    assert expand_token("def") == []
    assert expand_token("Return") == []


def test_stemming_path():
    assert expand_token("parsing", stemming=True) == ["pars"]
    assert expand_token("xs", stemming=True) == ["xs"]  # too short to strip


@pytest.mark.parametrize("analyzer", ["code", "simple"])
def test_batch_equals_pure(analyzer):
    cfg = IndexConfig(analyzer=analyzer)
    a = Analyzer(cfg)
    texts = [
        "def parseHTTPResponse_v2(self): return fooBar + foo_bar",
        "x = 12.5 # fooBar FOO foo",
        "",
        "RAREUNIQUE only here",
        "a a a a b",
    ]
    ids = np.arange(100, 100 + len(texts), dtype=np.int64)
    codes, docs, tfs, info = a.tokenize_batch(texts, ids)
    vocab = info["vocab"]
    for local, did in enumerate(ids):
        want = Counter(a.terms(texts[local]))
        got = {vocab[c]: int(t) for c, d, t in zip(codes, docs, tfs) if d == did}
        assert dict(want) == got
        assert info["doc_len"][local] == sum(want.values())
        assert info["max_tf"][local] == (max(want.values()) if want else 0)
        assert info["n_terms"][local] == len(want)


def test_simple_analyzer_matches_sql_semantics():
    """simple analyzer == lower + split on [^a-z0-9_]+ (the DuckDB oracle)."""
    a = Analyzer(IndexConfig(analyzer="simple"))
    assert a.terms("Hello World_x1 FOO-bar 12") == \
        ["hello", "world_x1", "foo", "bar", "12"]
