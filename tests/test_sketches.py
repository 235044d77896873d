"""Sketch-operator tolerance floors: HLL distinct counts within the
configured rsd of exact, GK percentiles within rank tolerance — the
approximate aggregates carry no SQL oracle, so these tests ARE their
correctness gate."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


def test_hll_within_tolerance(spark):
    rows = E.queries()["daily_uniques_hll"](spark, SF).collect()
    assert rows
    for r in rows:
        exact, approx = r["uniques_exact"], r["uniques_hll"]
        assert exact > 0
        rel_err = abs(approx - exact) / exact
        assert rel_err <= 0.10, f"day {r['day']}: HLL {approx} vs exact {exact}"


def test_percentile_sketch_within_tolerance(spark):
    rows = E.queries()["value_percentiles"](spark, SF).collect()
    assert rows
    for r in rows:
        for a, e in zip(r["approx_pcts"], r["exact_pcts"]):
            # GK with accuracy 10000 is near-exact at this scale;
            # allow 1% relative slack (values are positive doubles)
            assert abs(a - e) <= max(0.01 * abs(e), 1e-9), (r["event_type"], a, e)
