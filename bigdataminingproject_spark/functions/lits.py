"""Literal-array construction without per-element py4j round trips.

``F.array(*[F.lit(x) for x in values])`` costs one Python->JVM round
trip per element (plus one per wrapping expression). Plans that inline
data-derived constants — PQ codebooks (8 subs x 16 centroids x 8 dims),
IVF hyperplanes (n_planes x 64), ADC lookup tables, k-means centroids,
range-bucket bounds, stopword lists — were spending SECONDS per
DataFrame *construction* on the driver before any job ran (measured
6.0 s for one PQ assignment expression at sf0.1; guide §1: the wall
clock charged to a "query" includes driver-side planning).

``lit_array`` renders the whole array as one SQL string and hands it to
the parser in a single ``F.expr`` call. Value fidelity:

- floats use ``repr`` (shortest round-trip text, exactly re-parsed to
  the same IEEE double by the SQL parser) with the ``D`` suffix, so the
  resulting literal is bit-identical to ``F.lit(float(x))``;
- ints use the ``L`` suffix (PySpark ``F.lit(int)`` makes LongType);
- strings are single-quote literals with backslash/quote escaping
  (Spark's default escapedStringLiterals=false dialect).

Non-finite floats, mixed element types, and anything else fall back to
the per-element form — correctness first, speed when safe.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fallback(values) -> Column:
    return F.array(*[F.lit(v) for v in values])


def lit_array(values) -> Column:
    """One-parse literal array for a homogeneous list of float / int /
    str (bool counts as neither). Empty lists and anything unusual fall
    back to ``F.array(*map(F.lit, ...))``."""
    vals = list(values)
    if not vals:
        return _fallback(vals)
    if all(type(v) is float for v in vals):
        if not all(math.isfinite(v) for v in vals):
            return _fallback(vals)
        body = ",".join(f"{v!r}D" for v in vals)
    elif all(type(v) is int for v in vals):
        if not all(-(2**63) <= v < 2**63 for v in vals):
            return _fallback(vals)
        body = ",".join(f"{v}L" for v in vals)
    elif all(type(v) is str for v in vals):
        body = ",".join(
            "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
            for v in vals
        )
    else:
        return _fallback(vals)
    return F.expr(f"array({body})")


def lit_double_array(values) -> Column:
    """``lit_array`` with every element coerced to float first — the
    drop-in for ``F.array(*[F.lit(float(x)) for x in xs])``."""
    return lit_array([float(v) for v in values])
