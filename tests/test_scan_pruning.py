"""Plan-level scan-pruning pins (tools/scan_audit.py is the full
report; these assert the headline contracts so a regression fails CI,
not a 1000-executor cluster)."""

from __future__ import annotations

import sys

sys.path.insert(0, "tools")

from scan_audit import audit_query  # noqa: E402

from kafka_stream_aggregator_spark.queries import REGISTRY  # noqa: E402


def _scans(spark, sf_dir, name):
    return audit_query(spark, sf_dir, name, REGISTRY[name].fn)


def test_q6_reads_four_columns_with_pushed_range(spark, sf_dir):
    scans = _scans(spark, sf_dir, "q6_forecast_revenue")
    li = [s for s in scans if s[0] == "lineitem"]
    assert li, scans
    tbl, ncols, filters = li[0]
    assert ncols <= 4, f"q6 must read <= 4 lineitem columns, got {ncols}"
    assert "l_shipdate" in filters and "l_discount" in filters


def test_q1_prunes_lineitem_and_pushes_shipdate(spark, sf_dir):
    scans = _scans(spark, sf_dir, "q1_pricing_summary")
    li = [s for s in scans if s[0] == "lineitem"]
    assert li and li[0][1] <= 7
    assert "l_shipdate" in li[0][2]


def test_ewma_flagship_prunes_events(spark, sf_dir):
    scans = _scans(spark, sf_dir, "ewma_5min")
    ev = [s for s in scans if s[0] == "events"]
    assert ev and ev[0][1] <= 4  # ts, value, (seq, type) at most


def test_no_bench_query_scans_full_wide_table(spark, sf_dir):
    """No bench query may read every column of a >4-column table —
    the suite-wide version of the column-pruning contract."""
    import re

    from kafka_stream_aggregator_spark.tables import load_table

    widths = {
        t: len(load_table(spark, sf_dir, t).columns)
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    names = [n for n, s in REGISTRY.items() if getattr(s, "bench", False)]
    names += ["q1_pricing_summary", "q3_revenue_topk", "q5_regional_revenue"]
    offenders = []
    for name in names:
        try:
            for tbl, ncols, _ in _scans(spark, sf_dir, name):
                w = widths.get(tbl)
                if w and w > 4 and ncols == w:
                    offenders.append((name, tbl, ncols))
        except Exception:
            continue  # streaming/generator queries have no batch plan
    assert not offenders, offenders
