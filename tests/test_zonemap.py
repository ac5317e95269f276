"""Zone-map effectiveness report invariants
(operators/zonemap.py); q_lineitem_zonemap carries the DuckDB gate."""

from __future__ import annotations

from bigdataminingproject_spark.operators.zonemap import (
    q_lineitem_zonemap,
)


def test_zone_report_invariants(spark, sf_dir):
    rows = {r["layout"]: r for r in q_lineitem_zonemap(spark, sf_dir).collect()}
    nat, clu = rows["natural"], rows["clustered"]
    # scanning can never miss a matching row (no false pruning)
    for r in (nat, clu):
        assert r["rows_scanned"] >= r["rows_matched"]
        assert r["n_scanned_chunks"] <= r["n_chunks"]
        assert r["rows_total"] == nat["rows_total"]
    # the clustered-by-predicate-column layout prunes at least as well
    # as the natural layout — the point of the report
    assert clu["scan_fraction"] <= nat["scan_fraction"]
    # the predicate spans whole months, so month-chunk pruning is
    # EXACT: the clustered layout scans precisely the matching rows
    assert clu["rows_scanned"] == clu["rows_matched"]
