"""Quad filtering / mapping (reference http:task/data/{FilterQuads,MapQuads}
and http:task/{QuadMatcher,QuadMapper,TripleItemMatcher,TripleItemMapper}).

A *matcher* is a per-position predicate: regex on strings, numeric
comparison/range on numbers, set membership. FilterQuads keeps rows matching
ANY of N (matcher, inverse) conjunctions (QuadMatcher.scala:10-44). MapQuads
rewrites matched positions with regex capture-group substitution
(TripleItemMapper semantics via regexp_replace).

Everything compiles to Catalyst expressions — filters push down to the
parquet scan (verify with .explain: PushedFilters for simple comparisons).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Matcher:
    """Predicate for one column: any combination of conditions is ANDed."""

    col: str
    rlike: str | None = None
    eq: object | None = None
    isin: list | None = None
    lo: float | None = None          # inclusive lower bound (numbers)
    hi: float | None = None          # inclusive upper bound
    inverse: bool = False

    def to_column(self) -> Column:
        c = F.col(self.col)
        conds = []
        if self.rlike is not None:
            conds.append(c.rlike(self.rlike))
        if self.eq is not None:
            conds.append(c == F.lit(self.eq))
        if self.isin is not None:
            conds.append(c.isin(self.isin))
        if self.lo is not None:
            conds.append(c >= F.lit(self.lo))
        if self.hi is not None:
            conds.append(c <= F.lit(self.hi))
        expr = conds[0] if conds else F.lit(True)
        for x in conds[1:]:
            expr = expr & x
        return ~expr if self.inverse else expr


@dataclass
class QuadMatcher:
    """Conjunction of per-position matchers (one quad pattern)."""

    matchers: list[Matcher] = field(default_factory=list)

    def to_column(self) -> Column:
        expr = F.lit(True)
        for m in self.matchers:
            expr = expr & m.to_column()
        return expr


def filter_quads(df: DataFrame, *patterns: QuadMatcher) -> DataFrame:
    """Keep rows matching ANY pattern (OR of conjunctions),
    FilterQuads.scala:10-17 semantics."""
    if not patterns:
        return df
    expr = patterns[0].to_column()
    for p in patterns[1:]:
        expr = expr | p.to_column()
    return df.where(expr)


def map_quads(
    df: DataFrame, col: str, pattern: str, replacement: str,
    where: QuadMatcher | None = None,
) -> DataFrame:
    """Regex capture-group rewrite of one column, optionally only on rows
    matching ``where`` (MapQuads.scala:10-24)."""
    new = F.regexp_replace(F.col(col), pattern, replacement)
    if where is not None:
        new = F.when(where.to_column(), new).otherwise(F.col(col))
    return df.withColumn(col, new)
