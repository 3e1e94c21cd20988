"""Pure-Python reference extractor — the P/R oracle at test scale.

Independent (non-Spark) implementation of the extraction + canonicalization
semantics, run row-by-row on the same deterministic corpus; the Spark
pipeline must match its emitted (subj, pred, obj) set with P/R >= 0.95
(BASELINE.json). Mirrors the *semantics* of RDFRules ingestion: one statement
per sentence; ``aka`` statements are owl:sameAs and never become triples —
they merge the object's identity into the subject's
(reference core:index/TripleItemHashIndex.scala:68-82).
"""

from __future__ import annotations

import re

from rdfrules_spark.corpus import AKA, iri

STMT_RE = re.compile(r"<([A-Za-z0-9]+)> ([a-z_]+) <([A-Za-z0-9]+)> \.")


def extract_statements(spans: list) -> list[tuple[str, str, str]]:
    """All (subject_surface, predicate, object_surface) statements of a doc."""
    out = []
    for span in spans:
        kind = span["kind"] if isinstance(span, dict) else span.kind
        text = span["text"] if isinstance(span, dict) else span.text
        if kind == "text":
            out.extend(STMT_RE.findall(text))
    return out


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # min-lexicographic representative == subject-side canonical in our
        # grammar (canonical "ent:E17" < alias "ent:E17x"), matching the
        # reference's subject-wins merge semantics.
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo


def reference_triples(docs: list[tuple[str, list]]) -> set[tuple[str, str, str]]:
    """Canonicalized triple set for a list of (doc_id, spans) documents."""
    relations: list[tuple[str, str, str]] = []
    uf = UnionFind()
    for _, spans in docs:
        for s_surf, pred, o_surf in extract_statements(spans):
            s, o = iri(s_surf), iri(o_surf)
            if pred == AKA:
                uf.union(s, o)
            else:
                relations.append((s, pred, o))
    return {(uf.find(s), p, uf.find(o)) for s, p, o in relations}


def precision_recall(
    got: set[tuple], expected: set[tuple]
) -> tuple[float, float]:
    if not got or not expected:
        return (float(not expected), float(not got))
    tp = len(got & expected)
    return tp / len(got), tp / len(expected)
