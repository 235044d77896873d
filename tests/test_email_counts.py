"""Email + counts pipelines: the two remaining dataset configs
(import_email_events.py, import_counts.py) through the generic
driver."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.plans.incremental import ImportJob, run_counts_import
from fxa_activity_metrics_spark.schemas import EMAIL
from fxa_activity_metrics_spark.sources.lake import Lake
from tests.fixtures import epoch, hex_id, write_csv

D1 = dt.date(2024, 3, 1)
D2 = dt.date(2024, 3, 2)


def _email_rows(day):
    rows = []
    for c in (5, 30, 80):
        fid = hex_id(c, f"f{c}")
        rows.append([epoch(day, 8), fid, "gmail.com", "verify", "sent", "", "", "en-US"])
        rows.append([epoch(day, 9), fid, "gmail.com", "verify", "bounced", "true", "", ""])
    return rows


@pytest.fixture(scope="module")
def email_lake(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("email_src"))
    for day in (D1, D2):
        write_csv(src, "email_events", day, _email_rows(day))
    lake = Lake(spark, str(tmp_path_factory.mktemp("email_lake")))
    ImportJob(spark=spark, lake=lake, dataset=EMAIL, source_dir=src).run()
    return lake


def test_email_import_sampled_by_flow_id(email_lake):
    full = email_lake.read("email_events")
    assert full.count() == 12
    f10 = {r["flow_id"] for r in email_lake.read("email_events_sampled_10").select("flow_id").distinct().collect()}
    assert f10 == {hex_id(5, "f5")}, "sampled by flow_id (import_email_events.py:24)"
    # empty-string semantics survive
    assert full.filter(F.col("bounced") == "").count() == 6


def test_counts_import(spark, tmp_path):
    src = str(tmp_path / "counts_src")
    days = [dt.date(2024, 3, 1) + dt.timedelta(days=i) for i in range(3)]
    for i, day in enumerate(days):
        write_csv(src, "fxa-basic-metrics", day, [[day.isoformat(), 1000 + i, 900 + i]])
    # a pre-COUNTS_BEGIN day must be dropped (import_counts.py:43)
    old = dt.date(2017, 1, 1)
    write_csv(src, "fxa-basic-metrics", old, [[old.isoformat(), 1, 1]])

    lake = Lake(spark, str(tmp_path / "counts_lake"))
    assert run_counts_import(spark, lake, src) == 3, "pre-2017-05-30 file skipped"
    got = {r["day"]: (r["accounts"], r["verified_accounts"]) for r in lake.read("counts").collect()}
    assert set(got) == set(days), "day UNIQUE; pre-2017-05-30 dropped"
    assert got[days[2]] == (1002, 902)
    # idempotent: nothing new to do
    assert run_counts_import(spark, lake, src) == 0
    # force_reload (C5) converges to the same table
    assert run_counts_import(spark, lake, src, force_reload=True) == 3
    again = {r["day"]: (r["accounts"], r["verified_accounts"]) for r in lake.read("counts").collect()}
    assert again == got


def test_counts_maxerror_10(spark, tmp_path):
    """Counts loads under MAXERROR=10, tighter than events' 100
    (import_counts.py:78): 11 unparseable rows fail the load, 10 are
    tolerated (and dropped)."""
    day = dt.date(2024, 4, 1)
    good = [[day.isoformat(), 500, 450]]

    bad_src = str(tmp_path / "bad_src")
    bad_rows = good + [[f"2024-04-01", "not_a_number", i] for i in range(11)]
    write_csv(bad_src, "fxa-basic-metrics", day, bad_rows)
    lake = Lake(spark, str(tmp_path / "lake_a"))
    with pytest.raises(ValueError, match="MAXERROR=10"):
        run_counts_import(spark, lake, bad_src)

    ok_src = str(tmp_path / "ok_src")
    ok_rows = good + [[f"2024-04-01", "not_a_number", i] for i in range(10)]
    write_csv(ok_src, "fxa-basic-metrics", day, ok_rows)
    lake2 = Lake(spark, str(tmp_path / "lake_b"))
    assert run_counts_import(spark, lake2, ok_src) == 1
    got = {r["day"]: (r["accounts"], r["verified_accounts"]) for r in lake2.read("counts").collect()}
    assert got == {day: (500, 450)}, "bad rows dropped, good row loaded"
