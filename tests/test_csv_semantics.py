"""S1/P8/P9 semantics: MAXERROR tolerance, TRUNCATECOLUMNS,
empty-string sentinel, injection + field-count cleaning — the
reference's COPY/shell-sanitizer contract (import_events.py:87-100,
clean-flow-data.sh, pad-flow-data.sh)."""

from __future__ import annotations

import pytest

from fxa_activity_metrics_spark.schemas import ACTIVITY_CSV_SCHEMA
from fxa_activity_metrics_spark.sources.csv import (
    clean_raw_lines,
    pad_short_lines,
    read_day_csv,
)


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


GOOD = "1709280000,Firefox,57,Windows 10,{uid},account.login,sync,dev1".format(
    uid="a" * 64
)


def test_maxerror_tolerates_then_fails(spark, tmp_path):
    p = str(tmp_path / "d.csv")
    # 3 good rows + 2 corrupt (non-numeric timestamp fails LongType)
    _write(p, [GOOD, "notanumber,x,x,x,u,t,s,d", GOOD, "also_bad,,,,,,,", GOOD])
    df = read_day_csv(spark, p, ACTIVITY_CSV_SCHEMA, max_errors=2)
    assert df.count() == 3, "corrupt rows within MAXERROR are dropped, load succeeds"
    with pytest.raises(ValueError, match="MAXERROR"):
        read_day_csv(spark, p, ACTIVITY_CSV_SCHEMA, max_errors=1)


def test_truncatecolumns(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    long_service = "s" * 100
    _write(p, [GOOD.replace(",sync,", f",{long_service},")])
    df = read_day_csv(
        spark, p, ACTIVITY_CSV_SCHEMA, max_lengths={"service": 40}
    )
    [row] = df.collect()
    assert row["service"] == "s" * 40, "over-length values truncate, not reject"


def test_short_rows_rejected_then_repairable(spark, tmp_path):
    """Short rows count as errors (Redshift COPY rejects them); the
    pad-flow-data.sh repair utility pads them back to loadable."""
    p = str(tmp_path / "s.csv")
    short = "1709280000,Firefox,57,Windows 10," + "a" * 64 + ",account.login"
    _write(p, [short, GOOD])
    df = read_day_csv(spark, p, ACTIVITY_CSV_SCHEMA, max_errors=1)
    assert df.count() == 1, "short row dropped under MAXERROR"

    # repair path: pad, rewrite, reload — the short row survives with
    # '' (not NULL) in the padded trailing fields
    lines = pad_short_lines(spark.read.text(p), n_fields=8)
    repaired = str(tmp_path / "s_padded.csv")
    _write(repaired, [r["value"] for r in lines.collect()])
    df2 = read_day_csv(spark, repaired, ACTIVITY_CSV_SCHEMA, max_errors=0)
    assert df2.count() == 2
    row = df2.filter(df2["device_id"] == "").collect()[0]
    assert row["service"] == "" and row["timestamp"] == 1709280000


def test_clean_raw_lines_rejects_injection_and_bad_field_counts(spark, tmp_path):
    p = str(tmp_path / "raw.csv")
    lines = [
        "a,b,c",
        "a,b;rm -rf,c",          # injection: ;
        'a,"quoted",c',          # injection: "
        "a,select x,c",          # injection: select<space>
        "a,b",                   # too few fields
        "a,b,c,d",               # too many fields
        "x,y,z",
    ]
    _write(p, lines)
    kept = [r["value"] for r in clean_raw_lines(spark, p, n_fields=3).collect()]
    assert sorted(kept) == ["a,b,c", "x,y,z"]
