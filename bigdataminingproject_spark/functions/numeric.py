"""Cross-engine-stable numeric helpers.

``round(double, d)`` is implementation-defined at decimal half-way points:
Spark rounds the shortest decimal rendering (BigDecimal.valueOf) while
DuckDB rounds the binary value — at an exact midpoint like 4201.315 they
disagree. ``stable_avg`` instead expresses half-up rounding as pure double
arithmetic (floor(x·10^d + 0.5)/10^d), which is a deterministic function
of the input double and therefore bit-identical on any engine.

Sums of fixed-decimal money columns are themselves (near-)exact decimal
values, so plain round() on sums is safe; the hazard is division (avg),
which lands on midpoints whenever a d-decimal sum divides a small count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round_div(numer: Column, denom: Column, decimals: int) -> Column:
    """Half-up round(numer/denom, decimals) as engine-stable double math."""
    scale = float(10**decimals)
    return F.floor(numer * F.lit(scale) / denom + F.lit(0.5)) / F.lit(scale)


def stable_avg(col: Column, decimals: int, sum_decimals: int | None = None) -> Column:
    """Aggregate: avg(col) rounded half-up at ``decimals``, engine-stable.

    The inner sum is rounded at ``sum_decimals`` (default: same) first so
    shuffle-order ulp noise in the double sum can't move the quotient
    across a rounding boundary.
    """
    sd = decimals if sum_decimals is None else sum_decimals
    return stable_round_div(
        F.round(F.sum(col), sd), F.count(F.lit(1)), decimals
    )


def stable_avg_sql(expr: str, decimals: int, sum_decimals: int | None = None) -> str:
    """DuckDB SQL twin of ``stable_avg`` (identical double operations)."""
    sd = decimals if sum_decimals is None else sum_decimals
    scale = float(10**decimals)
    return (
        f"floor(round(sum({expr}), {sd}) * {scale} / count(*) + 0.5) / {scale}"
    )
