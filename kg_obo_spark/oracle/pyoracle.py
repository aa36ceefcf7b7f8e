"""Pure-Python single-node reference implementation ("the oracle").

Implements the SAME extraction / linking / canonicalization / materialization
spec as the Spark engine, but with a deliberately different algorithm
(brute-force substring scan instead of trie-regex; union-find instead of
star-contraction) so the triple P/R >= 0.95 comparison
(BASELINE.json metric) is a genuine cross-implementation check, not a tautology.

Small-data only — used by pytest and the bench's correctness preamble.
"""

from __future__ import annotations

import re
from collections import defaultdict

from kg_obo_spark.datagen.ontology import Ontology

_WORD = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


def _boundary_ok(text: str, start: int, end: int) -> bool:
    if start > 0 and text[start - 1] in _WORD:
        return False
    if end < len(text) and (text[end] in _WORD or text[end] == "-"):
        return False
    return True


def oracle_mentions(text: str, onto: Ontology) -> list[tuple[int, int, str, str, float]]:
    """Brute-force mention scan; same spec as dictionary.TermMatcher.find(best_only=True)."""
    known_ids = {t["id"] for t in onto.terms}
    known_prefixes = {t["id"].split(":")[0] for t in onto.terms}
    cands: list[tuple[int, int, int, str, str, float]] = []

    # explicit-id patterns (priority 0)
    for m in re.finditer(r"OBO:(?:[A-Za-z]+\.OWL#)?([A-Za-z]+)_(\d{7})(?!\d)", text):
        if m.start() > 0 and text[m.start() - 1] in _WORD | {":"}:
            continue
        tid = f"{m.group(1).upper()}:{m.group(2)}"
        if tid in known_ids:
            cands.append((m.start(), m.end(), 0, m.group(0), tid, 0.98))
    for m in re.finditer(
        r"http://purl\.obolibrary\.org/obo/([A-Za-z]+)_(\d{7})(?!\d)", text
    ):
        tid = f"{m.group(1).upper()}:{m.group(2)}"
        if tid in known_ids:
            cands.append((m.start(), m.end(), 0, m.group(0), tid, 0.98))
    for m in re.finditer(r"([A-Za-z]+):(\d{7})(?!\d)", text):
        if m.start() > 0 and text[m.start() - 1] in _WORD | {":"}:
            continue
        pfx = m.group(1)
        if pfx.upper() in known_prefixes and pfx != "OBO":
            tid = f"{pfx.upper()}:{m.group(2)}"
            if tid in known_ids:
                cands.append(
                    (m.start(), m.end(), 0, m.group(0), tid, 1.0 if pfx.isupper() else 0.97)
                )

    # dictionary surfaces: brute-force lowercase substring scan (priority 1)
    low = text.lower()
    for t in onto.terms:
        for surf, base in [(t["name"], 1.0)] + [(s, 0.9) for s in t["synonyms"]]:
            sl = surf.lower()
            pos = low.find(sl)
            while pos != -1:
                end = pos + len(sl)
                if _boundary_ok(text, pos, end):
                    actual = text[pos:end]
                    score = base if actual == surf else base - 0.05
                    cands.append((pos, end, 1, actual, t["id"], score))
                pos = low.find(sl, pos + 1)

    # leftmost-longest sweep, best-only (same ordering spec as TermMatcher.find)
    cands.sort(key=lambda c: (c[0], -c[1], c[2], -c[5], c[4]))
    out = []
    last_end = -1
    for start, end, _p, surf, tid, score in cands:
        if start >= last_end:
            out.append((start, end, surf, tid, score))
            last_end = end
    return out


def oracle_canonical_map(onto: Ontology) -> dict[str, str]:
    """Union-find over the xref equivalence graph; canonical = min CURIE."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    for a, b in onto.xrefs:
        union(a, b)
    return {t["id"]: find(t["id"]) for t in onto.terms}


def oracle_triples(
    rows: list[tuple[str, int, str]], onto: Ontology, include_isa: bool = True
) -> set[tuple[str, str, str]]:
    """(subject, predicate, object) set for transcript rows [(conv_id, turn_idx, text)].

    Same materialization spec as operators.materialize.build_edges."""
    canon = oracle_canonical_map(onto)
    per_turn: dict[tuple[str, int], set[str]] = defaultdict(set)
    for conv_id, turn_idx, text in rows:
        for _s, _e, _surf, tid, _score in oracle_mentions(text, onto):
            per_turn[(conv_id, turn_idx)].add(canon.get(tid, tid))
    triples: set[tuple[str, str, str]] = set()
    mentioned: set[str] = set()
    for terms in per_turn.values():
        ordered = sorted(terms)
        mentioned.update(ordered)
        for i, a in enumerate(ordered):
            for b in ordered[i + 1 :]:
                triples.add((a, "biolink:related_to", b))
    if include_isa:
        for child, parent_id in onto.is_a:
            if child in mentioned and parent_id in mentioned:
                triples.add((child, "biolink:subclass_of", parent_id))
    return triples


def precision_recall(
    got: set[tuple[str, str, str]], expected: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not got or not expected:
        return (float(not expected), float(not got))
    tp = len(got & expected)
    return tp / len(got), tp / len(expected)
