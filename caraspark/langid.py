"""Language identification — n-gram/stopword heuristic (pure Python data,
vectorized by the caller's pandas UDF; no external models)."""

from __future__ import annotations

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
