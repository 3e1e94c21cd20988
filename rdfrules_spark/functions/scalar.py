"""Scalar functions of the reference's mapper/matcher surface (SURVEY §2.10).

uri_explode        URI -> (name_space, local_name) split on the LAST '/' or
                   '#' (reference core:data/TripleItem.scala:53-65 `explode`:
                   greedy "(.+[/#])(.+)" with ("", uri) fallback).
parse_interval     interval literal "[a;b)" -> struct(l_incl, lv, rv, r_incl)
                   (TripleItem.scala:164-183 Interval.apply: a FULL-string
                   match of "(\\[|\\()\\s*(.+?)\\s*;\\s*(.+?)\\s*(\\]|\\))";
                   anything else — including quote-wrapped text, which the
                   reference's full-string pattern also rejects — is null).
interval_contains  membership of a numeric value in a parsed interval
                   (TripleItem.scala:147-158 Number.compare semantics).
arithmetic_eval    driver-side arithmetic expression evaluator with the
                   reference's exact grammar (http:util/ArithmeticEval.scala):
                   '+'/'-'/'*'/'/' are operators only straight after a number,
                   so "-3" and "2*-3" parse the '-' into the literal; '*' and
                   '/' bind tighter; '(' ')' group; an unmatched ')' collapses
                   the whole accumulated prefix. Used by map-task mappers to
                   rewrite number literals (http:task/TripleItemMapper.scala:
                   38-40) — it runs per mapper CONFIG on the driver, never
                   per row, so a Python implementation is the right altitude.

All column helpers are pure `pyspark.sql.functions` expressions (JVM-side,
whole-stage codegen); no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_URI_RE = r"^(.+[/#])(.+)$"
# full-string interval pattern, faithful to TripleItem.scala:170
_IVL_RE = r"^(\[|\()\s*(.+?)\s*;\s*(.+?)\s*(\]|\))$"


def uri_explode(col: Column | str) -> Column:
    """struct(name_space, local_name); ("", uri) when no '/' or '#' splits."""
    c = F.col(col) if isinstance(col, str) else col
    ns = F.regexp_extract(c, _URI_RE, 1)
    local = F.regexp_extract(c, _URI_RE, 2)
    return F.struct(
        ns.alias("name_space"),
        F.when(local == "", c).otherwise(local).alias("local_name"),
    )


def parse_interval(col: Column | str) -> Column:
    """struct(l_incl, lv, rv, r_incl) or NULL for non-interval text.

    Bounds that fail the numeric cast (e.g. "[a;b]") yield null, matching
    the reference's AnyToDouble guard.
    """
    c = F.col(col) if isinstance(col, str) else col
    lb = F.regexp_extract(c, _IVL_RE, 1)
    # try_cast: non-numeric bounds (e.g. "[a;b]") must yield null, not an
    # ANSI cast error (reference AnyToDouble guard)
    lv = F.regexp_extract(c, _IVL_RE, 2).try_cast("double")
    rv = F.regexp_extract(c, _IVL_RE, 3).try_cast("double")
    rb = F.regexp_extract(c, _IVL_RE, 4)
    ok = (lb != "") & lv.isNotNull() & rv.isNotNull()
    return F.when(
        ok,
        F.struct(
            (lb == "[").alias("l_incl"),
            lv.alias("lv"),
            rv.alias("rv"),
            (rb == "]").alias("r_incl"),
        ),
    )


def interval_contains(interval: Column, value: Column | str) -> Column:
    """True when `value` lies inside the parsed interval; NULL for a null
    interval (reference TripleItem.Interval within-bounds comparison)."""
    v = F.col(value) if isinstance(value, str) else value
    lo = F.when(interval["l_incl"], v >= interval["lv"]).otherwise(
        v > interval["lv"]
    )
    hi = F.when(interval["r_incl"], v <= interval["rv"]).otherwise(
        v < interval["rv"]
    )
    return F.when(interval.isNotNull(), lo & hi)


# -------------------------------------------------------------------------
# ArithmeticEval — driver-side, reference-exact grammar
# -------------------------------------------------------------------------

_NUM_RE = re.compile(r"^[-]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?")


def _next_token(s: str, prev_is_number: bool):
    """-> (token, rest) | None; token is float | one of '( ) + - * /'."""
    s = s.lstrip()
    if not s:
        return None
    head = s[0]
    if head == "(":
        return "(", s[1:]
    if head == ")":
        return ")", s[1:]
    if head in "+-*/" and prev_is_number:
        return head, s[1:]
    m = _NUM_RE.match(s)
    if m:
        return float(m.group(0)), s[len(m.group(0)):]
    return None


def _eval_flat(tokens: list) -> float:
    """Evaluate a bracket-free token list: '*'/'/' first (left-to-right fold,
    ArithmeticEval.scala evalExps), then '+'/'-'."""
    res: list = []
    rel: list = []
    for tok in tokens:
        rel.append(tok)
        if (
            len(rel) == 3
            and isinstance(rel[0], float)
            and rel[1] in ("*", "/")
            and isinstance(rel[2], float)
        ):
            if rel[1] == "*":
                rel = [rel[0] * rel[2]]
            elif rel[2] == 0.0:  # IEEE semantics like Scala's Double './'
                rel = [
                    float("nan") if rel[0] == 0.0
                    else float("inf") if rel[0] > 0 else float("-inf")
                ]
            else:
                rel = [rel[0] / rel[2]]
        elif len(rel) == 3:
            res.extend(rel[:2])
            rel = rel[2:]
    seq = ["+"] + res + rel
    total = 0.0
    for i in range(0, len(seq) - 1, 2):
        op, num = seq[i], seq[i + 1]
        if isinstance(num, float):
            if op == "+":
                total += num
            elif op == "-":
                total -= num
    return total


def arithmetic_eval(expr: str) -> float | None:
    """Reference-exact ArithmeticEval: None for unparseable input."""
    stack: list[list] = []
    rest = expr
    while True:
        rest_stripped = rest.lstrip()
        if not rest_stripped:
            break
        prev_is_number = bool(stack) and bool(stack[0]) and isinstance(
            stack[0][-1], float
        )
        nxt = _next_token(rest, prev_is_number)
        if nxt is None:
            return None
        tok, rest = nxt
        if tok == "(":
            stack.insert(0, [])
        elif tok == ")":
            if len(stack) >= 2:
                inner = stack.pop(0)
                stack[0].append(_eval_flat(inner))
            elif len(stack) == 1:
                stack = [[_eval_flat(stack[0])]]
            else:
                return None
        else:
            if not stack:
                stack = [[]]
            stack[0].append(tok)
    if not stack:
        return None
    return _eval_flat(stack[0])
