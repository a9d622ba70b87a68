"""Hypothesis property tests (SURVEY §5): the codec and analyzer
invariants that every distributed path leans on, checked over
generated inputs instead of fixed seeds. No Ray session needed —
these are the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_ray.codec import (concat_blocks, decode_blocks,
                                    encode_blocks, vbyte_decode, vbyte_encode)
from searchengine_ray.tokenizer import Analyzer, canonicalize_number

settings.register_profile("repo", deadline=None, max_examples=60)
settings.load_profile("repo")


@given(st.lists(st.integers(0, 2**64 - 1), max_size=300))
def test_vbyte_roundtrip_any_uint64(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(v)), v)


postings = st.integers(1, 400).flatmap(lambda n: st.tuples(
    st.lists(st.integers(0, 2**40), min_size=n, max_size=n, unique=True),
    st.lists(st.integers(1, 10**6), min_size=n, max_size=n),
    st.integers(1, 200)))


@given(postings)
def test_blocks_roundtrip_and_split_invariance(p):
    doc_list, tf_list, bs = p
    docs = np.sort(np.array(doc_list, dtype=np.int64))
    tfs = np.array(tf_list, dtype=np.int64)
    pb = encode_blocks(docs, tfs, bs)
    d, t = decode_blocks(pb)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs.astype(np.int32))
    # encode in two arbitrary halves, concat — must equal the whole
    # (the exact invariant the merge reducers' byte concat relies on)
    cut = len(docs) // 2
    if 0 < cut < len(docs):
        joined = concat_blocks([encode_blocks(docs[:cut], tfs[:cut], bs),
                                encode_blocks(docs[cut:], tfs[cut:], bs)])
        d2, t2 = decode_blocks(joined)
        assert np.array_equal(d2, docs)
        assert np.array_equal(t2, tfs.astype(np.int32))


@given(st.text(max_size=400))
def test_analyzer_terms_invariants(text):
    az = Analyzer()
    terms = az.terms(text)
    # deterministic
    assert terms == az.terms(text)
    # every term survives its own re-analysis head (normalization is
    # stable: feeding a produced term back yields a non-empty analysis
    # whose first token is itself) — the query-side/index-side parity
    # the whole engine rests on (both sides call the same analyzer)
    for t in set(terms):
        again = az.terms(t)
        assert again and again[0] == t
    # all lowercase, bounded length
    for t in terms:
        assert t == t.lower() and 1 <= len(t) <= 64


# Domain = NUM_RE matches ([0-9][0-9_]*(\.[0-9_]+)?) — the only
# strings the analyzer ever feeds canonicalize_number. Outside that
# domain the rule chain is NOT a fixed point ('..' -> '.' -> ''), and
# hardening it would have to change the SQL oracle's identical chain
# for inputs that cannot occur.
@given(st.from_regex(r"[0-9][0-9_]*(?:\.[0-9_]+)?", fullmatch=True))
def test_canonicalize_number_idempotent(tok):
    once = canonicalize_number(tok)
    assert canonicalize_number(once) == once


# ---- trigram (codesearch) layer invariants ----

from searchengine_ray.pipelines.trigram import (  # noqa: E402
    _code_to_str,
    _gram_codes,
    required_literal,
)

_texts = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
                 min_size=0, max_size=80)


@given(_texts)
def test_gram_codes_roundtrip_any_unicode(t):
    codes = _gram_codes(t)
    want = {t[i:i + 3] for i in range(max(0, len(t) - 2))}
    assert {_code_to_str(int(c)) for c in codes} == want


@given(_texts, _texts)
def test_trigram_prefilter_is_sound(hay, needle):
    """The candidate algebra: needle in hay  =>  every trigram of the
    needle is a trigram of hay — the losslessness of trigram pruning
    for any unicode text, not just the fixed query sets."""
    if len(needle) < 3 or needle not in hay:
        return
    hg = set(_gram_codes(hay).tolist())
    for c in _gram_codes(needle).tolist():
        assert c in hg


_pat_atoms = st.sampled_from(
    ["abc", "de", " ", "xyz9", "[a-z]", "[0-9]", ".", "q+", "r*", "s?",
     "t{1,3}", "data", "merge batch",
     # escape forms, incl. the multi-char ones that must trigger the
     # full-scan bailout rather than poisoning the literal run (r5 fix)
     "\\d", "\\x41", "\\u0042", "\\n"])


@given(st.lists(_pat_atoms, min_size=1, max_size=6))
def test_required_literal_sound_on_generated_patterns(atoms):
    """For generated patterns built from literal runs, classes and
    quantifiers: any string matching the pattern must contain the
    extracted literal (soundness of the conservative extractor)."""
    import re as _re

    pat = "".join(atoms)
    lit = required_literal(pat)
    if lit is None:
        return
    # build candidate matching strings by replacing metachar atoms
    subs = {"[a-z]": "m", "[0-9]": "7", ".": "z", "q+": "qq", "r*": "",
            "s?": "", "t{1,3}": "tt",
            "\\d": "5", "\\x41": "A", "\\u0042": "B", "\\n": "\n"}
    probe = "".join(subs.get(a, a) for a in atoms)
    m = _re.search(pat, probe)
    if m is not None:
        assert lit in probe, (pat, lit, probe)
