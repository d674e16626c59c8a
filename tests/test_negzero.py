"""Registry-wide negative-zero guard (VERDICT r10 items 1c + 4).

Spark round(-eps, 6) emits +0.0 while DuckDB emits -0.0, and the
driver's typed value hash is sign-aware — the agg_atkinson_index
r8/r10 red-row class. Policy: no registered oracle emits -0.0 in any
output cell at the driver gate tiers; a query that does is one
engine-version change away from a cross-engine sign disagreement.
The Spark side of the same invariant is enforced by tools/parity.py's
sign-aware canonicalizer (floats compared via repr) across the full
sweeps; tools/negzero_scan.py --spark runs the direct Spark scan for
round audits.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from negzero_scan import scan_oracles, scan_rows  # noqa: E402


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_no_negative_zero_in_any_oracle(sf_dir):
    bad = scan_oracles(sf_dir)
    assert not bad, (
        "-0.0 emitted by oracle(s) — clamp (greatest(0, x)) or "
        "normalize (x + 0.0) on BOTH engines:\n" + "\n".join(bad)
    )


def test_scan_detects_negative_zero():
    """The scanner itself must see -0.0 (it is easy to write a
    sign-blind check: -0.0 == 0.0 in Python)."""
    hits = scan_rows([(1, -0.0, [0.0, -0.0])], ["a", "b", "c"])
    assert [p for p, _ in hits] == ["b", "c[1]"]
    assert scan_rows([(0.0, 1.5, None)], ["a", "b", "c"]) == []


def test_atkinson_spark_side_clamped(spark, sf_dir):
    """Direct pin of the r8/r10 red row: the Spark emission is
    clamped non-negative and never -0.0."""
    import math

    from kafka_stream_aggregator_spark.queries import REGISTRY

    df = REGISTRY["agg_atkinson_index"].fn(spark, sf_dir)
    for r in df.collect():
        v = r["atkinson_1"]
        assert v >= 0.0
        if v == 0.0:
            assert math.copysign(1.0, v) > 0
