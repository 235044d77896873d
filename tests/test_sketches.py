"""Sketch-operator tolerance floors: HLL distinct counts within the
configured rsd of exact, GK percentiles within rank tolerance — the
approximate aggregates carry no SQL oracle, so these tests ARE their
correctness gate (exactness comes from the hash-verified
daily_uniques_exact / value_percentiles_exact counterparts)."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


def test_hll_within_tolerance(spark):
    approx = {
        r["day"]: r["uniques_hll"]
        for r in E.queries()["daily_uniques_hll"](spark, SF).collect()
    }
    exact = {
        r["day"]: r["uniques"]
        for r in E.queries()["daily_uniques_exact"](spark, SF).collect()
    }
    assert approx and set(approx) == set(exact)
    for day, e in exact.items():
        assert e > 0
        rel_err = abs(approx[day] - e) / e
        assert rel_err <= 0.10, f"day {day}: HLL {approx[day]} vs exact {e}"


def test_percentile_sketch_within_tolerance(spark):
    approx = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in E.queries()["value_percentiles"](spark, SF).collect()
    }
    exact = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in E.queries()["value_percentiles_exact"](spark, SF).collect()
    }
    assert approx and set(approx) == set(exact)
    for et, pcts in exact.items():
        for a, e in zip(approx[et], pcts):
            # GK with accuracy 10000 is near-exact at this scale;
            # allow 1% relative slack (values are positive doubles)
            assert abs(a - e) <= max(0.01 * abs(e), 1e-9), (et, a, e)
