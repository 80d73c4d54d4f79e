"""HALF_UP rounding for test expected-value models.

Spark's ``F.round`` on DOUBLE is ``BigDecimal.valueOf(d).setScale(n,
HALF_UP)`` — ``BigDecimal.valueOf`` goes through ``Double.toString``'s
shortest decimal representation, which Python's ``repr`` also produces.
So ``Decimal(repr(x)).quantize(10**-n, ROUND_HALF_UP)`` is the exact
model of the engine's rounding. Python's builtin ``round`` is banker's
(HALF_EVEN) and disagrees at exact halves: round-13 judge found
Hypothesis input sizes=[1,1,1,2,9,9,9] where max_share = 9/32 = 0.28125
rounds to 0.2813 in Spark/DuckDB but 0.2812 under builtin ``round`` —
the engine was right and the test model was the buggy side. Every test
expected value therefore uses ``rhalf``, never bare ``round``.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def rhalf(x: float, nd: int = 0) -> float:
    """Round ``x`` to ``nd`` decimals, halves away from zero, matching
    Spark ``F.round`` / DuckDB ``round`` on DOUBLE."""
    if x != x or x in (float("inf"), float("-inf")):
        return x
    q = Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
    )
    return float(q)
