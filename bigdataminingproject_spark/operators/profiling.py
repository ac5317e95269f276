"""Column-dependence profiling: mutual information between columns
and functional-dependency (FD) discovery metrics — the Metanome /
data-profiling family.

No reference counterpart (SURVEY.md §2 has no profiling surface);
these are the operators a 100-TB data catalog runs to decide join
keys, detect denormalization, and rank feature columns:

- ``mutual_information``: MI (and normalized MI) between two discrete
  columns from the exact contingency counts. One hash-agg scan to
  O(|X|·|Y|) cells, then the information fold happens on that tiny
  relation. All counts are exact bigints; ln() enters only in the
  final per-cell expression (the repo's NLL precedent), rounded.
- ``fd_profile``: for candidate determinant→dependent pairs, the
  exact violation metrics: #distinct determinants, #distinct
  (det, dep) pairs (FD holds iff equal), and the g3 error — the
  minimum number of rows to delete for the FD to hold
  (Kivinen & Mannila '95), computed distributed as
  N - Σ_det max_dep count(det, dep): two stacked hash aggregations,
  no row ever leaves the executors.

Scale shape: every metric is aggregation-only (no joins, no windows
over raw rows); candidate pairs each cost one column-pruned scan —
at cluster scale you'd stack them over one cached projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.trends import hour_index
from bigdataminingproject_spark.sources.tables import load_table


def contingency_cells(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """Exact contingency counts (x, y, nxy) — the sufficient state for
    every information metric below. Closed under per-cell addition
    (the streaming twin folds exactly these counters), bounded by
    |X|·|Y| regardless of corpus size."""
    return (
        df.select(x.alias("x"), y.alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("nxy"))
    )


def mi_from_cells(cells: DataFrame) -> DataFrame:
    """One row (n_rows, h_x, h_y, mi_nats, nmi) from a contingency-cell
    relation (x, y, nxy): exact-count entropies H(X), H(Y), mutual
    information I(X;Y) in nats, and the sqrt-normalized
    NMI = I / sqrt(H(X)·H(Y)).

    Identity used (integer-count form, one ln per cell/margin):
      H(X)  = ln N - Σ_x n_x ln n_x / N
      I     = Σ_xy (n_xy/N) ln(N·n_xy / (n_x·n_y))
    """
    cells = cells.localCheckpoint(eager=True)
    mx = cells.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").alias("ny"))
    tot = cells.agg(F.sum("nxy").alias("n")).collect()[0]["n"]
    nd = F.lit(float(tot))
    joined = cells.join(F.broadcast(mx), "x").join(F.broadcast(my), "y")
    mi = joined.agg(
        F.sum(
            (F.col("nxy").cast("double") / nd)
            * F.log(
                nd
                * F.col("nxy").cast("double")
                / (F.col("nx").cast("double") * F.col("ny").cast("double"))
            )
        ).alias("mi")
    )
    hx = mx.agg(
        (
            F.log(nd)
            - F.sum(
                F.col("nx").cast("double")
                * F.log(F.col("nx").cast("double"))
            )
            / nd
        ).alias("h")
    ).collect()[0]["h"]
    hy = my.agg(
        (
            F.log(nd)
            - F.sum(
                F.col("ny").cast("double")
                * F.log(F.col("ny").cast("double"))
            )
            / nd
        ).alias("h")
    ).collect()[0]["h"]
    denom = (float(hx) * float(hy)) ** 0.5
    return mi.select(
        F.lit(int(tot)).cast("bigint").alias("n_rows"),
        F.round(F.lit(float(hx)), 6).alias("h_x"),
        F.round(F.lit(float(hy)), 6).alias("h_y"),
        F.round(F.col("mi"), 6).alias("mi_nats"),
        (
            F.round(F.col("mi") / F.lit(denom), 6)
            if denom > 0
            else F.lit(None).cast("double")
        ).alias("nmi"),
    )


def mutual_information(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """MI profile of two columns: contingency counts, then the
    information fold on that tiny relation."""
    return mi_from_cells(contingency_cells(df, x, y))


def fold_contingency_cells(parts: DataFrame) -> DataFrame:
    """LSM merge-operator: stacked cell partials collapse by per-cell
    integer addition."""
    return parts.groupBy("x", "y").agg(F.sum("nxy").alias("nxy"))


def q_events_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does knowing the event type tell you about WHEN it
    happens? MI between event_type and UTC hour-of-day (0-23)."""
    ev = load_table(spark, sf_dir, "events")
    return mutual_information(
        ev, F.col("event_type"), hour_index() % F.lit(24)
    )


def fd_profile(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Exact FD-discovery metrics for each candidate det→dep pair:

      n_rows, n_det (distinct determinants), n_pairs (distinct
      det,dep combos), holds (n_pairs == n_det), g3_rows (min row
      deletions for the FD to hold), g3_err (g3_rows / n_rows).

    g3 via two stacked aggregations: count per (det, dep), max per
    det, then N - Σ max."""
    outs = []
    for det, dep in pairs:
        cnt = (
            df.select(F.col(det).alias("d"), F.col(dep).alias("e"))
            .groupBy("d", "e")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        per_det = cnt.groupBy("d").agg(
            F.max("c").alias("keep"),
            F.sum("c").alias("rows"),
            F.count(F.lit(1)).alias("combos"),
        )
        agg = per_det.agg(
            F.sum("rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_det"),
            F.sum("combos").alias("n_pairs"),
            (F.sum("rows") - F.sum("keep")).alias("g3_rows"),
        )
        outs.append(
            agg.select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_rows",
                "n_det",
                "n_pairs",
                (F.col("n_pairs") == F.col("n_det")).alias("holds"),
                "g3_rows",
                F.round(
                    F.col("g3_rows").cast("double")
                    / F.col("n_rows").cast("double"),
                    6,
                ).alias("g3_err"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("determinant", "dependent")


ORDERS_FD_CANDIDATES = [
    ("o_orderkey", "o_custkey"),      # key -> anything: holds
    ("o_custkey", "o_orderstatus"),   # violated: customers mix statuses
    ("o_custkey", "o_orderpriority"),  # violated: customers mix priorities
    ("o_orderdate", "o_orderstatus"),  # violated: dates mix statuses
]


def q_orders_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which candidate FDs hold on orders, and how badly do the rest
    fail? Exact g3 violation metrics for four canonical candidates."""
    orders = load_table(spark, sf_dir, "orders")
    return fd_profile(orders, ORDERS_FD_CANDIDATES)
