"""Cross-engine deterministic hashing.

The DuckDB oracle must reproduce every hash-dependent operator bit-for-bit,
so the shared primitive is a 60-bit integer from md5 (md5 is identical in
Spark, DuckDB, and Python's hashlib — xxhash64/murmur differ across engines):

  Spark : conv(substring(md5(x), 1, 15), 16, 10) :: bigint
  DuckDB: cast(concat('0x', substr(md5(x), 1, 15)) as bigint)
  Python: int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

Derived k-wise hash family (for MinHash): h_i(x) = (a_i * H(x) + b_i) mod P
with fixed odd constants — affine over the 60-bit base hash, computed with
modular arithmetic kept under 2^62 so ANSI-mode Spark never overflows.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: products a_i * (H % P) stay < 2^61.
P = 2_147_483_647


def h60(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def h60_sql(expr: str) -> str:
    """DuckDB-side equivalent of :func:`h60`."""
    return f"cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint)"


def h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _coeffs(i: int) -> tuple[int, int]:
    return (2 * i + 1, 2_654_435_761 * (i + 1) % P)


def hk(col: Column | str, i: int) -> Column:
    """i-th MinHash family member, value in [0, P)."""
    a, b = _coeffs(i)
    return (h60(col) % P * a + b) % P


def hk_from_base(base_mod_p: Column, i: int) -> Column:
    """i-th family member from an ALREADY-computed ``h60(x) % P`` column.

    Identical value to :func:`hk`; use when k members are derived from one
    input so the md5 base hash is computed once per row instead of k times
    (Catalyst does not CSE expressions across separate aggregates)."""
    a, b = _coeffs(i)
    return (base_mod_p * a + b) % P


def hk_sql(expr: str, i: int) -> str:
    a, b = _coeffs(i)
    return f"(({h60_sql(expr)} % {P}) * {a} + {b}) % {P}"


def hk_py(s: str, i: int) -> int:
    a, b = _coeffs(i)
    return (h60_py(s) % P * a + b) % P
