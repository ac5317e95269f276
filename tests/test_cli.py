"""CLI surface (reference run_detectors.py option parity)."""

from __future__ import annotations

import json

import pytest
from click.testing import CliRunner

from bigdataminingproject_spark.cli import main


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    for i in range(8):
        msgs = [
            {
                "body": f"send the payment code {i % 2}",
                "time": i * 10 + j,
                "medium": "Email",
                "is_inbound": True,
            }
            for j in range(5)
        ]
        (root / f"c{i}.json").write_text(json.dumps({"messages": msgs}))
    return str(root)


def test_cli_end_to_end(spark, corpus, tmp_path):
    runner = CliRunner()
    out_file = tmp_path / "summary.json"
    result = runner.invoke(
        main,
        [
            "--data-dir", corpus,
            "--split", "train",
            "--max-messages", "15",
            "--update-interval", "10",
            "--freq-queries", "payment,missing",
            "--cache-dir", str(tmp_path / "cache"),
            "--summary-out", str(out_file),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    summary = json.loads(out_file.read_text())
    # the deterministic 70/30 split keeps >=15 train messages of the 40
    assert summary["processed"] == 15
    assert summary["split"] == "train"
    assert summary["frequency_estimates"]["payment"] == 15
    assert summary["frequency_estimates"]["missing"] == 0
    assert len(summary["periodic_snapshots"]) == 2  # at 10 and final 15
    assert "Processed 15 messages" in result.output
