"""Language identification — n-gram/stopword heuristic (pure Python data,
vectorized by the caller's pandas UDF; no external models).

``detect_lang_batch`` is the production path: pandas ``.str.count`` with one
whole-token regex per language + NumPy argmax — no per-row Python anywhere.
``detect_lang`` is the scalar spec the batch path must match exactly
(differential-tested in tests/test_textops.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the and of to in is it for on with as was that this are be at by".split()
    ),
    "es": frozenset(
        "el la de que y en los se un por las del con una para es al como".split()
    ),
    "de": frozenset(
        "der die und das ist nicht von mit den ein eine zu im für auf dem".split()
    ),
    "fr": frozenset(
        "le la les de et des un une est dans que pour qui sur avec pas au".split()
    ),
}


def _cjk_ratio(t: str) -> float:
    if not t:
        return 0.0
    cjk = sum(1 for c in t if "一" <= c <= "鿿")
    return cjk / len(t)


def detect_lang(t: str) -> str:
    """Deterministic: CJK char ratio → zh; else stopword-hit argmax with
    alphabetical tiebreak; nothing scores → 'und'."""
    if _cjk_ratio(t) > 0.05:
        return "zh"
    toks = [w for w in t.lower().split() if w]
    if not toks:
        return "und"
    scores = {
        lang: sum(1 for w in toks if w in prof) / len(toks)
        for lang, prof in PROFILES.items()
    }
    best = max(scores.items(), key=lambda kv: (kv[1], -ord(kv[0][0])))
    if best[1] <= 0.0:
        return "und"
    # deterministic tiebreak: alphabetical among max scorers
    top = min(l for l, s in scores.items() if s == best[1])
    return top


_LANGS = sorted(PROFILES)  # alphabetical → np.argmax's first-max IS the tiebreak
# a token equals a stopword iff the word appears with no adjacent non-space;
# \S/\s use the same Unicode whitespace predicate as str.split()
_TOKEN_PATTERNS = {
    lang: r"(?<!\S)(?:" + "|".join(sorted(PROFILES[lang])) + r")(?!\S)"
    for lang in _LANGS
}


def detect_lang_batch(texts: pd.Series) -> pd.Series:
    """Vectorized ``detect_lang`` over a pandas Series (NULL → 'und' unless
    CJK/empty rules say otherwise — callers pass fillna('')). All four
    stopword scores share one denominator (the token count), so the argmax
    compares integer hit counts; ``np.argmax`` returns the FIRST maximum,
    which over alphabetically-ordered languages reproduces the scalar
    spec's alphabetical-min tiebreak."""
    t = texts.fillna("")
    n_chars = t.str.len().to_numpy()
    cjk = t.str.count("[一-鿿]").to_numpy()
    low = t.str.lower()
    n_toks = low.str.count(r"\S+").to_numpy()
    hits = np.stack(
        [low.str.count(_TOKEN_PATTERNS[lang]).to_numpy() for lang in _LANGS]
    )
    pred = np.asarray(_LANGS, dtype=object)[hits.argmax(axis=0)]
    pred = np.where((n_toks == 0) | (hits.max(axis=0) == 0), "und", pred)
    pred = np.where(cjk > 0.05 * n_chars, "zh", pred)
    return pd.Series(pred, index=texts.index, dtype=object)
