"""Histogram-Based Outlier Score (HBOS) — multi-feature density
anomaly scoring in two scans.

HBOS (Goldstein & Dengel, KI 2012) scores each row by the NEGATIVE
LOG-DENSITY of its features under independent per-feature histograms:
rare (feature-bucket, category) combinations score high. It is the
density-estimation complement of the repo's distance-based outlier
family — kth-NN distance (operators/similarity.py) prices isolation in
embedding space at O(N·probe) per point, while HBOS prices it from
O(buckets + categories) GLOBAL state, making it the 100-TB screening
pass: one hash-agg scan builds every feature histogram, one map-side
broadcast join scores all rows, nothing shuffles on row count.

Feature model here (events table): one continuous feature (``value``,
equi-WIDTH histogram — unlike the equi-depth statistics histogram in
operators/histogram.py, HBOS needs buckets whose occupancy varies, and
the classic formulation is fixed-width over [min, max]) and one
categorical feature (``event_type``, frequency estimate). Both
marginals are exact counts, so the only floats are the two final
ln() calls — quantized at 6 dp (the NLL precedent) so cross-engine
libm ulp differences cannot reorder the ranking.

Determinism contract: bucket id = least(B, floor((v - lo)·B/(hi - lo))
+ 1) is a pure function of (v, lo, hi) computed with the identical
IEEE expression on both engines; NULL value / NULL type rows are
excluded from N and both marginals (the one-population rule, ADVICE
r9). No reference counterpart (the reference has no anomaly surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataminingproject_spark.sources.tables import load_table

HBOS_BUCKETS = 8
HBOS_TOP_K = 20


def hbos_scores(
    df: DataFrame,
    value_col: str = "value",
    cat_col: str = "event_type",
    buckets: int = HBOS_BUCKETS,
) -> DataFrame:
    """Per-row HBOS over one continuous + one categorical feature:
    score = round(-ln(n_bucket/N) - ln(n_cat/N), 6). Returns the input
    rows (NULL-feature rows dropped) with ``score`` appended.

    Plan: one bounds aggregate (3 scalars to the driver), one scan
    building both marginals (bucket counts: ≤ B rows; category
    counts: domain-sized), then one scan scoring via two broadcast
    joins — whole-stage-codegen arithmetic, no UDFs, no row-count
    shuffle anywhere."""
    vals = df.filter(
        F.col(value_col).isNotNull() & F.col(cat_col).isNotNull()
    )
    g = vals.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if g["n"] == 0:
        return vals.withColumn("score", F.lit(0.0)).withColumn(
            "bucket", F.lit(1)
        )
    lo, hi, n = float(g["lo"]), float(g["hi"]), int(g["n"])
    v = F.col(value_col).cast("double")
    bucket = (
        F.lit(1)
        if hi == lo
        else F.least(
            F.lit(buckets),
            (
                F.floor((v - F.lit(lo)) * F.lit(float(buckets)) / F.lit(hi - lo))
                + F.lit(1)
            ).cast("int"),
        )
    )
    scored = vals.withColumn("bucket", bucket)
    vb = scored.groupBy("bucket").agg(F.count(F.lit(1)).alias("nb"))
    tb = scored.groupBy(cat_col).agg(F.count(F.lit(1)).alias("nt"))
    nd = F.lit(float(n))
    return (
        scored.join(F.broadcast(vb), "bucket")
        .join(F.broadcast(tb), cat_col)
        .withColumn(
            "score",
            F.round(
                -F.ln(F.col("nb").cast("double") / nd)
                - F.ln(F.col("nt").cast("double") / nd),
                6,
            ),
        )
        .drop("nb", "nt")
    )


def q_events_hbos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 anomalous events by HBOS over (value, event_type) — the
    density-based screening complement of MAD (robust-scale) and
    kth-NN (embedding-distance) outliers."""
    ev = load_table(spark, sf_dir, "events")
    scored = hbos_scores(ev, "value", "event_type", HBOS_BUCKETS)
    top = scored.orderBy(
        F.desc("score"), F.asc("event_id")
    ).limit(HBOS_TOP_K)
    w = Window.orderBy(F.desc("score"), F.asc("event_id"))
    return top.select(
        "event_id", "event_type", F.col("bucket").cast("int").alias("bucket"), "score"
    ).withColumn("rank", F.row_number().over(w).cast("int")).orderBy("rank")


def hbos_oracle_sql(
    buckets: int = HBOS_BUCKETS, top_k: int = HBOS_TOP_K
) -> str:
    """DuckDB mirror of ``q_events_hbos`` — identical bucket
    expression, exact integer marginals, the same 6-dp quantized
    two-term ln score, ranking on the ROUNDED score."""
    return f"""
WITH ev AS (
    SELECT event_id, event_type, CAST(value AS DOUBLE) AS v
    FROM events
    WHERE value IS NOT NULL AND event_type IS NOT NULL
),
g AS (SELECT min(v) AS lo, max(v) AS hi, count(*) AS n FROM ev),
b AS (
    SELECT event_id, event_type,
           CASE WHEN hi = lo THEN 1
                ELSE least({buckets},
                           CAST(floor((v - lo) * {buckets}.0 / (hi - lo))
                                AS INT) + 1)
           END AS bucket
    FROM ev, g
),
vb AS (SELECT bucket, count(*) AS nb FROM b GROUP BY bucket),
tb AS (SELECT event_type, count(*) AS nt FROM b GROUP BY event_type),
scored AS (
    SELECT b.event_id, b.event_type, b.bucket,
           round(-ln(CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
                 - ln(CAST(nt AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               AS score
    FROM b
    JOIN vb USING (bucket)
    JOIN tb USING (event_type), g
)
SELECT event_id, event_type, bucket, score,
       CAST(row_number() OVER (ORDER BY score DESC, event_id)
            AS INT) AS rank
FROM scored
ORDER BY score DESC, event_id
LIMIT {top_k}"""
