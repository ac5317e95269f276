"""Command-line entry point — the reference CLI re-expressed
(run_detectors.py:38-126 option surface, Spark execution underneath).

A user of the reference runs::

    python run_detectors.py --data-dir data --split test \
        --max-messages 200 --update-interval 100 --exclude-duplicates

The equivalent here::

    python -m bigdataminingproject_spark.cli --data-dir data --split test \
        --max-messages 200 --update-interval 100 --exclude-duplicates

Output: the same summary JSON on stdout (S6), optional bump-chart PNG
(S7, when matplotlib is present), progress counts on stderr (S8).
"""

from __future__ import annotations


import click

from bigdataminingproject_spark.plans.pipeline import run_detector_pipeline
from bigdataminingproject_spark.session import get_spark
from bigdataminingproject_spark.sources.conversations import (
    LoaderConfig,
    load_or_build_messages,
    ordered_message_stream,
)
from bigdataminingproject_spark.sources.sinks import write_summary_json


@click.command()
@click.option("--data-dir", required=True, help="Conversation JSON corpus root.")
@click.option("--split", default="test", show_default=True)
@click.option("--max-messages", default=200, show_default=True, type=int)
@click.option("--update-interval", default=100, show_default=True, type=int)
@click.option("--top-frequency", default=10, show_default=True, type=int)
@click.option(
    "--freq-queries",
    default=None,
    help="Comma-separated terms for point frequency estimates.",
)
@click.option("--exclude-duplicates", is_flag=True, default=False)
@click.option("--sample-size", default=None, type=int)
@click.option("--use-skipwords/--no-use-skipwords", default=True, show_default=True)
@click.option("--random-state", default=42, show_default=True, type=int)
@click.option("--force-reload", is_flag=True, default=False)
@click.option(
    "--cache-dir",
    default="/tmp/bdmp_spark_cache",
    show_default=True,
    help="Config-hashed parquet cache root (S2/S3).",
)
@click.option("--summary-out", default=None, help="Also write summary JSON here.")
@click.option("--chart-out", default=None, help="Bump-chart PNG path (needs matplotlib).")
def main(
    data_dir: str,
    split: str,
    max_messages: int,
    update_interval: int,
    top_frequency: int,
    freq_queries: str | None,
    exclude_duplicates: bool,
    sample_size: int | None,
    use_skipwords: bool,
    random_state: int,
    force_reload: bool,
    cache_dir: str,
    summary_out: str | None,
    chart_out: str | None,
) -> None:
    """Stream a conversation corpus through the duplicate / frequency /
    burst detectors and print the summary JSON."""
    spark = get_spark("bdmp-cli")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = LoaderConfig(
        data_dir=data_dir,
        sample_size=sample_size,
        use_skipwords=use_skipwords,
        random_state=random_state,
    )
    messages = load_or_build_messages(
        spark, cfg, cache_dir, force_reload=force_reload
    )
    selected = messages.filter(messages.split == split)
    stream = ordered_message_stream(selected, limit=max_messages)
    queries = (
        [t.strip() for t in freq_queries.split(",") if t.strip()]
        if freq_queries
        else None
    )
    summary = run_detector_pipeline(
        stream,
        update_interval=update_interval,
        top_frequency=top_frequency,
        freq_queries=queries,
        exclude_duplicates=exclude_duplicates,
    )
    summary["split"] = split
    print(write_summary_json(summary, summary_out))
    if chart_out:
        from bigdataminingproject_spark.sources.sinks import plot_bump_chart

        rank_rows = [
            (i, b["token"], b["ratio"], rank + 1)
            for i, snap in enumerate(summary["periodic_snapshots"])
            for rank, b in enumerate(snap["burst"][:5])
        ]
        fig = plot_bump_chart(rank_rows, chart_out)
        if fig is None:
            click.echo("matplotlib unavailable; chart skipped", err=True)
    click.echo(
        f"Processed {summary['processed']} messages from split '{split}'.",
        err=True,
    )


if __name__ == "__main__":
    main()
