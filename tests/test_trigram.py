"""Unit tests for the trigram (codesearch) layer: the required-literal
extractor's soundness, gram packing, and the index's pruning
invariants. End-to-end oracle parity runs in test_pipelines.py."""

from __future__ import annotations

import re

import numpy as np
import pytest

from searchengine_ray.pipelines.trigram import (
    _code_to_str,
    _gram_codes,
    required_literal,
)


def test_gram_codes_roundtrip():
    text = "hash join"
    codes = _gram_codes(text)
    grams = {text[i:i + 3] for i in range(len(text) - 2)}
    assert {_code_to_str(int(c)) for c in codes} == grams
    # distinct + sorted
    assert len(codes) == len(set(codes.tolist()))
    assert (np.diff(codes) > 0).all()


def test_gram_codes_short_and_unicode():
    assert len(_gram_codes("ab")) == 0
    codes = _gram_codes("héllo")          # non-ASCII code points round-trip
    assert _code_to_str(int(codes[0])) in {"hél", "éll", "llo"}
    assert {_code_to_str(int(c)) for c in codes} == {"hél", "éll", "llo"}


@pytest.mark.parametrize("pat,want", [
    ("[a-z]+ merge batch", " merge batch"),
    ("slow query[a-z ]{0,10}", "slow query"),
    ("customer (?:order|line)", None),        # groups -> no safe literal
    ("a|b", None),                            # alternation
    ("zzz[0-9]+never", "never"),              # longest mandatory run wins
    ("val[a-z]*ue", "val"),                   # 'ue' too short
    ("abc*def", "def"),                       # 'c' quantified: run 'ab' < 3
    ("ab\\dcd", None),                        # escape breaks runs, both < 3
    ("exact literal", "exact literal"),
    ("x{2,3}yzw", "yzw"),
    ("[abc]+", None),                         # nothing literal at all
])
def test_required_literal(pat, want):
    assert required_literal(pat) == want


@pytest.mark.parametrize("pat", [
    "[a-z]+ merge batch", "slow query[a-z ]{0,10}", "zzz[0-9]+never",
    "val[a-z]*ue", "abc*def", "x{2,3}yzw",
])
def test_required_literal_is_sound(pat):
    """Every string matching the pattern must CONTAIN the extracted
    literal — the property that makes trigram prefiltering lossless."""
    lit = required_literal(pat)
    assert lit is not None
    rng = np.random.default_rng(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    # fuzz: embed pattern-shaped strings into random noise and check
    hits = 0
    for _ in range(300):
        noise = "".join(rng.choice(list(alphabet), size=30))
        probe = noise[:10] + _example_match(pat, rng) + noise[10:]
        m = re.search(pat, probe)
        if m is None:
            continue
        hits += 1
        assert lit in probe, (pat, lit, probe)
    assert hits > 0


def _example_match(pat: str, rng) -> str:
    """Generate a concrete matching string for the fixed test patterns."""
    if pat == "[a-z]+ merge batch":
        return "xy merge batch"
    if pat == "slow query[a-z ]{0,10}":
        return "slow query" + "ab"[: int(rng.integers(0, 3))]
    if pat == "zzz[0-9]+never":
        return "zzz42never"
    if pat == "val[a-z]*ue":
        return "val" + "x" * int(rng.integers(0, 3)) + "ue"
    if pat == "abc*def":
        return "ab" + "c" * int(rng.integers(0, 4)) + "def"
    if pat == "x{2,3}yzw":
        return "x" * int(rng.integers(2, 4)) + "yzw"
    raise AssertionError(pat)


def test_trigram_index_parts_prune(ray_session, tmp_path):
    """The index layout supports file-level pruning: every gram lands
    in part gram % P, so a needle's parts are exactly the files a
    query must open."""
    import pyarrow.parquet as pq

    from searchengine_ray.pipelines.trigram import (
        _TRI_PARTS,
        ensure_trigram_index,
    )

    root = ensure_trigram_index("/root/testdata/sf0.001")
    import glob
    import os

    files = sorted(glob.glob(os.path.join(root, "part_*.parquet")))
    assert files
    for f in files:
        p = int(os.path.basename(f)[len("part_"):-len(".parquet")])
        t = pq.read_table(f, columns=["gram"])
        g = t.column("gram").to_numpy()
        assert (g % _TRI_PARTS == p).all()
        assert (np.diff(g) >= 0).all()        # gram-sorted for row-group stats
