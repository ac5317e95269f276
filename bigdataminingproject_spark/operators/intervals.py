"""Point-in-interval (range) joins via time-bucket co-partitioning.

Spark has no native band/interval join for batch relations: a naive
``points JOIN intervals ON p BETWEEN s AND e`` plans as a broadcast
nested loop (or worse, a cartesian product) — quadratic work the
moment neither side is broadcast-able. The standard distributed fix
(the "binning" range join — what Databricks' range-join hints and
GeoSpark-style spatial joins do under the hood) turns the inequality
into an EQUI-join:

  * pick a bucket width W on the join axis;
  * each point lands in exactly ONE bucket (its quotient);
  * each interval EXPLODES to every bucket it overlaps
    (ceil(len/W) + 1 rows — a small constant when W ~ interval
    length);
  * equi-join on (key, bucket), then apply the exact range predicate
    as a cheap post-filter.

Every matching (interval, point) pair meets in exactly one bucket (the
point's), so no dedup pass is needed; the shuffle is a plain hash
exchange on (key, bucket), AQE-splittable under skew; and the work is
|points| + |intervals| x fanout + |true matches| — never |points| x
|intervals|.

No reference counterpart (the reference joins nothing); north-star
relational family alongside the stream-stream interval join
(streaming/pipeline.py::q_stream_join_attribution), which is the same
semantics under watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataminingproject_spark.sources.tables import load_table

INT_WINDOW_SECS = 1800  # incident window length (and bucket width)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_us: str,
    start_us: str,
    end_us: str,
    bucket_us: int,
) -> DataFrame:
    """Inner point-in-interval join: rows pairing every interval with
    every point sharing ``key`` and ``start_us <= point_us <= end_us``
    (closed interval). Both inputs must already carry epoch-micros
    LONG columns; output keeps all columns of both sides minus the
    helper bucket.

    Bucket fanout per interval is (end DIV W) - (start DIV W) + 1 —
    callers pick ``bucket_us`` on the order of the typical interval
    length so the fanout stays a small constant.
    """
    ib = intervals.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start_us} DIV {bucket_us}"),
                F.expr(f"{end_us} DIV {bucket_us}"),
            )
        ),
    )
    pb = points.withColumn("bucket", F.expr(f"{point_us} DIV {bucket_us}"))
    return (
        pb.join(ib, [key, "bucket"])
        .filter(
            (F.col(point_us) >= F.col(start_us))
            & (F.col(point_us) <= F.col(end_us))
        )
        .drop("bucket")
    )


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident-window analysis: for every error event, the count /
    distinct-type count / value sum of that user's OTHER events inside
    [error_ts, error_ts + 30min] — one output row per error event
    (anchors with an empty window report zeros).

    The window length equals the bucket width, so each anchor explodes
    to exactly 2 buckets; the join is a co-partitioned hash join on
    (user_id, half-hour bucket).
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("p_us"),
    )
    w_us = INT_WINDOW_SECS * 1_000_000
    anchors = (
        base.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("anchor_id"),
            "user_id",
            F.col("p_us").alias("start_us"),
            (F.col("p_us") + F.lit(w_us)).alias("end_us"),
        )
    )
    points = base.select(
        "user_id",
        F.col("event_id").alias("point_id"),
        F.col("event_type").alias("p_type"),
        F.col("value").alias("p_value"),
        "p_us",
    )
    matched = interval_join(
        points, anchors, "user_id", "p_us", "start_us", "end_us", w_us
    ).filter(F.col("point_id") != F.col("anchor_id"))
    agg = matched.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("p_type").alias("n_types"),
        F.round(F.sum("p_value"), 2).alias("sum_value"),
    )
    return (
        anchors.select("anchor_id")
        .join(agg, "anchor_id", "left")
        .select(
            "anchor_id",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("n_types"), F.lit(0)).alias("n_types"),
            F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("anchor_id")
    )
