"""bench.py machine-line contract (VERDICT r7 #1).

The driver records the last 2000 chars of bench stdout and parses the
final JSON line; round 7's line overflowed that window and left
``"parsed": null``. These tests pin the budget-capped compact line: it
must stay under the tail window at any realistic registry size, stay
valid JSON, keep the driver contract fields, and drop only the
cheapest queries (heaviest-first retention — the rows regression
adjudication actually needs).
"""

from __future__ import annotations

import json

import bench


def _fake_timings(n: int) -> dict[str, float]:
    return {
        f"q_some_quite_long_query_name_{i:03d}": 0.4 + (i % 23) * 1.7
        for i in range(n)
    }


def test_machine_line_fits_driver_tail_window():
    for n in (10, len(bench.HEADLINE), 150, 400):
        t = _fake_timings(n)
        line = bench._machine_line(round(sum(t.values()), 3), 0.1, 1.4, t)
        assert len(line) <= 1950, (n, len(line))
        # the driver's parse: last line of the 2000-char tail
        tail = (line + "\n")[-2000:]
        rec = json.loads(tail.strip().splitlines()[-1])
        assert rec["metric"] == "headline_query_runtime"
        assert rec["unit"] == "sec"
        assert rec["sf"] == 0.1
        assert rec["omitted"] == n - len(rec["queries"])


def test_machine_line_keeps_heaviest_queries():
    t = _fake_timings(300)
    line = bench._machine_line(round(sum(t.values()), 3), 0.1, 1.4, t)
    rec = json.loads(line)
    kept = set(rec["queries"])
    assert rec["omitted"] > 0  # 300 long names cannot all fit
    dropped_max = max(v for k, v in t.items() if k not in kept)
    kept_min = min(v for k, v in t.items() if k in kept)
    assert dropped_max <= kept_min  # heaviest-first retention


def test_machine_line_real_headline_fits_with_full_map_or_cap():
    t = {name: 9.9 for name in bench.HEADLINE}
    line = bench._machine_line(712.8, 0.1, 1.4, t)
    rec = json.loads(line)
    assert len(rec["queries"]) + rec["omitted"] == len(bench.HEADLINE)
    assert len(line) <= 1950
