"""Skew mitigation for fact-to-fact joins: key salting.

Broadcast handles small sides and AQE's skew-join splits oversized
partitions at runtime (both on by default in session.py). Salting is the
remaining tool for heavy-hitter keys in shuffle joins where neither
applies — e.g. a fact-fact join where one key holds 10% of all rows.

``salted_join`` replicates the (smaller) right side ``salt`` ways and
scatters the left side's hot keys uniformly across the replicas: the
shuffle key becomes (key, salt_bucket), bounding any task's share of a
hot key to 1/salt of its rows. Semantics are exactly those of the plain
inner join (each left row meets each right row once, because the right
replica index enumerates every bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join on ``on`` with ``salt``-way hot-key scattering.

    left gets a random-but-deterministic bucket (xxhash of its full row
    via monotonically_increasing_id is NOT reproducible across runs, so
    the bucket derives from a hash of all join-independent columns —
    here simply a per-row uniform from rand(seed) is enough because the
    result is bucket-agnostic after the join).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    lsalted = left.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    replicas = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    out = lsalted.join(replicas, [on, "_salt"], how)
    return out.drop("_salt")
