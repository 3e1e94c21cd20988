"""Prefix operations (reference core:data/ops/PrefixesOps.scala:18-144,
core:data/Prefix.scala): attach namespace maps, compact full IRIs to
prefixed form, and expand prefixed names back.

The prefix map is a plain dict (prefix -> namespace IRI). Compaction uses
LONGEST-namespace-first matching like Jena; both directions are pure
column expressions (a chain of when()s over the broadcast-small map — no
UDF, whole-stage codegen), so they cost one projection at any scale.

`read_prefix_file` parses the @prefix lines of a Turtle/SPARQL-style file
(the reference loads prefixes from bundled TTL, GraphSpec.scala:122-127).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def read_prefix_file(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            m = re.match(
                r"\s*(?:@prefix|PREFIX)\s+([\w.-]*):\s*<([^>]*)>", line
            )
            if m:
                out[m.group(1)] = m.group(2)
    return out


def _ordered(prefixes: dict[str, str]) -> list[tuple[str, str]]:
    # longest namespace first: the most specific prefix wins
    return sorted(prefixes.items(), key=lambda kv: -len(kv[1]))


def with_prefixed_uris(col: Column | str, prefixes: dict[str, str]) -> Column:
    """Compact a full-IRI column to 'pfx:local' where a namespace matches
    (PrefixesOps.withPrefixedUris:93)."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    expr = None
    for pfx, ns in _ordered(prefixes):
        cond = c.startswith(ns)
        repl = F.concat(F.lit(pfx + ":"), F.substring(c, len(ns) + 1, 1 << 20))
        expr = F.when(cond, repl) if expr is None else expr.when(cond, repl)
    return out if expr is None else expr.otherwise(c)


def resolve_prefixes(col: Column | str, prefixes: dict[str, str]) -> Column:
    """Expand 'pfx:local' back to the full IRI
    (PrefixesOps.resolvePrefixes:144)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for pfx, ns in prefixes.items():
        cond = c.startswith(pfx + ":")
        repl = F.concat(F.lit(ns), F.substring(c, len(pfx) + 2, 1 << 20))
        expr = F.when(cond, repl) if expr is None else expr.when(cond, repl)
    return c if expr is None else expr.otherwise(c)


def compact_graph(df: DataFrame, prefixes: dict[str, str]) -> DataFrame:
    """Apply withPrefixedUris to the s/p/o columns of a triple table."""
    out = df
    for c in ("s", "p", "o"):
        if c in df.columns:
            out = out.withColumn(c, with_prefixed_uris(c, prefixes))
    return out


def expand_graph(df: DataFrame, prefixes: dict[str, str]) -> DataFrame:
    """Apply resolvePrefixes to the s/p/o columns of a triple table."""
    out = df
    for c in ("s", "p", "o"):
        if c in df.columns:
            out = out.withColumn(c, resolve_prefixes(c, prefixes))
    return out
