"""Output sinks (reference S6-S8) and the bump-chart rank table (O5/O6).

The reference prints a nested summary dict as JSON (run_detectors.py:
227-245), renders a matplotlib bump chart of bursting terms
(plot/bump_chart.py), and logs progress to stderr. Spark-first:

- the summary is already a small dict (plans/pipeline.py) — S6 writes it
  as JSON text or a single-row DataFrame to any Spark sink;
- the bump chart's *data* is a rank table (pandas rank(method='first')
  ⇒ row_number, plot/bump_chart.py:16-19) computed distributed; the
  matplotlib rendering is driver-side and optional (import-gated — the
  engine never requires a display);
- progress logging becomes a StreamingQueryListener (S8).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def write_summary_json(
    summary: dict[str, Any], path: str | None = None
) -> str:
    """S6: nested summary → pretty JSON (stdout and/or file)."""
    text = json.dumps(summary, ensure_ascii=False, indent=2, default=str)
    if path is not None:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
    return text


def summary_as_dataframe(spark: SparkSession, summary: dict[str, Any]) -> DataFrame:
    """S6 (table form): one-row DataFrame for writing to any Spark sink."""
    return spark.createDataFrame([(json.dumps(summary, default=str),)], "summary string")


def bump_chart_table(
    bursts: DataFrame,
    top_k: int = 5,
    time_col: str = "boundary",
    key_col: str = "token",
    score_col: str = "ratio",
) -> DataFrame:
    """O5/O6: per-time-point rank table feeding the bump chart.

    pandas ``rank(axis=0, ascending=False, method="first")``
    (plot/bump_chart.py:16-19) is exactly ``row_number`` over
    (score desc, key) per time point; ``top_k`` keeps the plotted series.
    """
    w = Window.partitionBy(time_col).orderBy(F.desc(score_col), key_col)
    return (
        bursts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(time_col, key_col, score_col, "rank")
        .orderBy(time_col, "rank")
    )


def plot_bump_chart(rank_rows: list, out_path: str | None = None):
    """S7: optional matplotlib rendering of the rank table (driver-side).

    Import-gated — returns None when matplotlib is unavailable (this
    engine's containers are headless); the rank *data* from
    ``bump_chart_table`` is the portable artifact.
    """
    try:  # pragma: no cover - environment dependent
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover
        return None
    series: dict[str, list[tuple[Any, int]]] = {}
    for r in rank_rows:
        series.setdefault(r[1], []).append((r[0], r[3]))
    fig, ax = plt.subplots(figsize=(10, 5))
    for key, pts in series.items():
        pts.sort()
        ax.plot([p[0] for p in pts], [p[1] for p in pts], marker="o", label=key)
    ax.invert_yaxis()
    ax.set_xlabel("time point")
    ax.set_ylabel("rank")
    ax.legend(loc="best", fontsize=8)
    if out_path:
        fig.savefig(out_path, bbox_inches="tight")
    return fig


class ProgressLogListener:
    """S8: stream progress → logger (reference logs processed/excluded to
    stderr, run_detectors.py:250-252). Attach with
    ``spark.streams.addListener(ProgressLogListener())``."""

    def onQueryStarted(self, event):  # pragma: no cover - passthrough
        print(f"[stream] started: {event.id}")

    def onQueryProgress(self, event):  # pragma: no cover
        p = event.progress
        print(f"[stream] {p.name or p.id}: {p.numInputRows} rows in batch")

    def onQueryTerminated(self, event):  # pragma: no cover
        print(f"[stream] terminated: {event.id}")
