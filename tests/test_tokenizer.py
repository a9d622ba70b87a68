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


@pytest.mark.parametrize("tok,want", [
    ("1_000", "1000"), ("01_000.50", "1000.5"), ("0.500", "0.5"),
    ("007", "7"), ("0.000", "0"), ("10.", "10"), ("1.0", "1"),
    ("000", "0"), ("123", "123"), ("00.5", "0.5"), ("3.14159", "3.14159"),
])
def test_canonicalize_number(tok, want):
    from searchengine_ray.tokenizer import canonicalize_number

    assert canonicalize_number(tok) == want


def test_normalize_numbers_analyzer():
    from searchengine_ray.config import IndexConfig
    from searchengine_ray.tokenizer import Analyzer

    on = Analyzer(IndexConfig(normalize_numbers=True, use_stopwords=False))
    assert on.terms("x = 1_000.50 + offset_2") == \
        ["x", "1000.5", "offset_2", "offset", "2"]
    off = Analyzer(IndexConfig(use_stopwords=False))
    # without the option, 1_000 is not one numeric token
    assert "1000.5" not in off.terms("x = 1_000.50")
