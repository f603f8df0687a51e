"""COS object model + canonical serialization.

Mirrors the data abstractions of caradoc's ``src/data/directobject.ml`` /
``indirectobject.ml`` [P] (SURVEY.md §1.1): the recursive DirectObject
variant and the stream-bearing IndirectObject. Spark can't hold a recursive
StructType, so the tree is persisted as canonical JSON (SURVEY.md §1.2):

    null        → null
    bool        → true / false
    int         → JSON number (always within 2^63, enforced by the lexer)
    real        → {"$r": "<verbatim lexeme>"}   (byte-faithful re-serialization)
    string      → {"$s": "<hex of raw bytes>"}
    name        → {"$n": "<decoded name>"}
    array       → [ ... ]
    dict        → {"$d": {"<name>": ..., sorted by key}}
    reference   → {"$ref": [num, gen]}

Dict keys are canonicalized by sorting — deterministic output is what makes
byte-identical goldens possible under arbitrary partitioning.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


@dataclass(frozen=True, slots=True)
class Name:
    v: str


@dataclass(frozen=True, slots=True)
class Real:
    lexeme: str  # verbatim PDF lexeme, e.g. "-.002"; no exponent form exists

    def value(self) -> float:
        return float(self.lexeme)


@dataclass(frozen=True, slots=True)
class Ref:
    num: int
    gen: int


@dataclass(slots=True)
class Stream:
    d: dict  # stream dictionary (str keys → DirectObject)
    raw: bytes  # undecoded payload as sliced from the file
    decoded: bytes | None = None  # after filter chain; None if decode failed


@dataclass(frozen=True, slots=True)
class PdfError:
    """Validation error — the north_rule taxonomy record (SURVEY.md C27)."""

    code: str
    pos: int = -1
    obj: tuple[int, int] | None = None
    path: str = ""
    msg: str = ""

    def sort_key(self):
        return (self.pos, self.code, self.path, self.msg)


# DirectObject = None | bool | int | Real | bytes | Name | list | dict
# dict maps str (name key) → DirectObject; streams only at indirect level.


def to_canonical(obj) -> object:
    """DirectObject → JSON-serializable canonical form."""
    if obj is None or isinstance(obj, bool) or isinstance(obj, int):
        return obj
    if isinstance(obj, Real):
        return {"$r": obj.lexeme}
    if isinstance(obj, bytes):
        return {"$s": obj.hex()}
    if isinstance(obj, Name):
        return {"$n": obj.v}
    if isinstance(obj, Ref):
        return {"$ref": [obj.num, obj.gen]}
    if isinstance(obj, list):
        return [to_canonical(x) for x in obj]
    if isinstance(obj, dict):
        return {"$d": {k: to_canonical(v) for k, v in sorted(obj.items())}}
    raise TypeError(f"not a DirectObject: {type(obj)}")


def canonical_json(obj) -> str:
    return json.dumps(to_canonical(obj), sort_keys=True, separators=(",", ":"))


def from_canonical(j) -> object:
    """Inverse of to_canonical (used by exploded-objects consumers)."""
    if j is None or isinstance(j, bool) or isinstance(j, int):
        return j
    if isinstance(j, list):
        return [from_canonical(x) for x in j]
    if isinstance(j, dict):
        if "$r" in j:
            return Real(j["$r"])
        if "$s" in j:
            return bytes.fromhex(j["$s"])
        if "$n" in j:
            return Name(j["$n"])
        if "$ref" in j:
            return Ref(*j["$ref"])
        return {k: from_canonical(v) for k, v in j["$d"].items()}
    raise TypeError(f"bad canonical form: {type(j)}")
