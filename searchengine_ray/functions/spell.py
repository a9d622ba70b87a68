"""Edit-distance-1 spell correction against the index dictionary.

Reference parity: the searcher spell-corrects unknown query terms with
a frequency dictionary at edit distance 1 (``/root/reference/
searcher.py:32,76-119`` uses the ``spellchecker`` package with the
corpus ``spell_dict.json``). Rebuilt from first principles (the classic
Norvig approach — public knowledge): generate all distance-1 edits of
the unknown term, keep those present in the index, pick the one with
the highest corpus frequency (document frequency here; ties break
lexicographically for determinism).

The "dictionary" is any ``term -> frequency`` lookup — the query
executors pass a closure over their hash-indexed dictionary, so no
extra state is loaded.
"""

from __future__ import annotations

from collections.abc import Callable

_LETTERS = "abcdefghijklmnopqrstuvwxyz0123456789_"


def edits1(word: str) -> set[str]:
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = {a + b[1:] for a, b in splits if b}
    transposes = {a + b[1] + b[0] + b[2:] for a, b in splits if len(b) > 1}
    replaces = {a + c + b[1:] for a, b in splits if b for c in _LETTERS}
    inserts = {a + c + b for a, b in splits for c in _LETTERS}
    return deletes | transposes | replaces | inserts


def correct(term: str, freq_of: Callable[[str], int]) -> str | None:
    """Best known distance-1 correction, or None if nothing matches.
    A term that is itself known needs no correction."""
    if freq_of(term) > 0:
        return term
    best, best_freq = None, 0
    for cand in edits1(term):
        f = freq_of(cand)
        if f > best_freq or (f == best_freq and f > 0
                             and (best is None or cand < best)):
            best, best_freq = cand, f
    return best
