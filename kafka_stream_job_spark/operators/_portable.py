"""Engine-portable rounding.

``ROUND(x, 2)`` is NOT portable between Spark and DuckDB: Spark's Round on
doubles goes through ``BigDecimal.valueOf`` (the double's shortest decimal
repr) with HALF_UP, while DuckDB rounds the binary value — so a true value
of exactly 4.475 (whose nearest double prints as "4.475" but is
4.47499999…) rounds to 4.48 in Spark and 4.47 in DuckDB. Ratios of small
integers hit such boundaries constantly.

Round-to-INTEGER is portable: every half-integer (…446.5, 447.5…) is
exactly representable in binary, so "shortest repr lands on .5" ⇔ "binary
value is exactly .5", and both engines round it away from zero. Hence:

    portable_round(x, s) = ROUND(x * 10^s) / 10^s + 0.0

computed with identical double ops on both sides. The trailing ``+ 0.0``
normalizes IEEE negative zero: DuckDB's ROUND preserves ``-0.0`` where
Spark's returns ``0.0``, and the driver's value hash distinguishes them;
``x + 0.0`` is the identity for every double except ``-0.0 → +0.0``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, scale: int) -> Column:
    """Spark side of the portable round."""
    if isinstance(col, str):
        col = F.col(col)
    factor = F.lit(float(10**scale))
    return F.round(col * factor, 0) / factor + F.lit(0.0)


def sql_round(expr: str, scale: int) -> str:
    """DuckDB side — identical arithmetic, term for term."""
    factor = float(10**scale)
    return f"ROUND(({expr}) * {factor}) / {factor} + 0.0"


def idiv(a: Column | str, b: Column | int) -> Column:
    """Exact integer division on longs, TRUNCATING toward zero — Spark's
    ``div`` operator (DuckDB twin: ``//``, which also truncates). NOT
    floor division: for a negative numerator, ``idiv(-1, 16) == 0``
    while floor would give -1 — gate sign-sensitive expressions (e.g.
    "count of strided positions") on the numerator being non-negative.
    NOT ``(a / b).cast('long')`` either: double division loses exactness
    past 2^53, which matters for the 100 TB row-count arithmetic in
    ntile/share-of-total computations."""
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, int):
        b = F.lit(b)
    return F.call_function("div", a, b)
