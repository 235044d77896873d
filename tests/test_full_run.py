"""The `make import` parity driver: all four datasets + summaries in
one call (Makefile:17-22), and its CLI."""

from __future__ import annotations

import datetime as dt

from fxa_activity_metrics_spark.run import main, run_full_import
from fxa_activity_metrics_spark.sources.lake import Lake
from tests.fixtures import (
    flow_rows_day1,
    flow_rows_day2,
    write_activity_days,
    write_csv,
)

D1 = dt.date(2024, 3, 1)
D2 = dt.date(2024, 3, 2)


def _write_all(src: str) -> None:
    write_activity_days(src, [D1, D2])
    write_csv(src, "flow_events", D1, flow_rows_day1(D1))
    write_csv(src, "flow_events", D2, flow_rows_day2(D2))
    write_csv(src, "email_events", D1, [[1709280000, "a" * 64, "gmail.com", "verify", "sent", "", "", "en"]])
    write_csv(src, "fxa-basic-metrics", D1, [[D1.isoformat(), 100, 90]])


def test_run_full_import(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_all(src)
    lake = Lake(spark, str(tmp_path / "lake"))
    report = run_full_import(spark, lake, src)
    assert report.activity_days == [D2, D1]
    assert report.flow_days == [D2, D1]
    assert report.email_days == [D1]
    assert report.counts_files == 1
    assert report.summary_ranges["_full"] == (D1, D2)
    for tbl in (
        "activity_events", "flow_events", "flow_metadata", "email_events",
        "counts", "daily_activity_per_device", "daily_multi_device_users",
    ):
        assert lake.exists(tbl) or tbl == "daily_multi_device_users", tbl
    # second run: everything is a no-op
    again = run_full_import(spark, lake, src)
    assert again.activity_days == [] and again.flow_days == [] and again.counts_files == 0


def test_cli_smoke(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    _write_all(src)
    main(["--lake", str(tmp_path / "lake"), "--source", src], spark=spark)
    out = capsys.readouterr().out
    assert "activity=2d" in out and "counts=1" in out
