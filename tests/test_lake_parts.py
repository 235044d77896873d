"""Direct unit coverage for the partition-granular Lake API
(ADVICE r2): write_parts on a non-'day' column, drop_part on
existing/missing/malformed values, and schema-evolution reads."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fxa_activity_metrics_spark.sources.lake import Lake

D1 = dt.date(2024, 6, 1)
D2 = dt.date(2024, 6, 2)


@pytest.fixture()
def lake(spark, tmp_path):
    return Lake(spark, str(tmp_path / "lake"))


def _frame(spark, rows):
    return spark.createDataFrame(rows, "export_date date, k string, v long")


def test_write_parts_non_day_column(lake, spark):
    df = _frame(spark, [(D1, "a", 1), (D1, "b", 2), (D2, "c", 3)])
    lake.write_parts("t", df, "export_date")
    assert lake.part_days("t", "export_date") == [D1, D2]
    got = {(r["export_date"], r["k"], r["v"]) for r in lake.read("t").collect()}
    assert got == {(D1, "a", 1), (D1, "b", 2), (D2, "c", 3)}


def test_write_parts_dynamic_overwrite_leaves_other_parts(lake, spark):
    lake.write_parts("t", _frame(spark, [(D1, "a", 1), (D2, "c", 3)]), "export_date")
    # overwrite only D1
    lake.write_parts("t", _frame(spark, [(D1, "a2", 10)]), "export_date")
    got = {(r["export_date"], r["k"]) for r in lake.read("t").collect()}
    assert got == {(D1, "a2"), (D2, "c")}


def test_write_parts_requires_partition_column(lake, spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError, match="export_date"):
        lake.write_parts("t", df, "export_date")


def test_drop_part_existing_and_missing(lake, spark):
    lake.write_parts("t", _frame(spark, [(D1, "a", 1), (D2, "c", 3)]), "export_date")
    lake.drop_part("t", "export_date", D1)
    assert lake.part_days("t", "export_date") == [D2]
    # missing partition: a no-op, not an error
    lake.drop_part("t", "export_date", D1)
    assert lake.part_days("t", "export_date") == [D2]
    # string form accepted
    lake.drop_part("t", "export_date", str(D2))
    assert lake.part_days("t", "export_date") == []


def test_drop_part_rejects_malformed_day(lake, spark):
    lake.write_parts("t", _frame(spark, [(D1, "a", 1)]), "export_date")
    os.makedirs(os.path.join(lake.path("t"), "export_date=evil"), exist_ok=True)
    with pytest.raises(ValueError):
        lake.drop_part("t", "export_date", "../t")
    with pytest.raises(ValueError):
        lake.drop_part("t", "export_date", "evil")
    assert lake.part_days("t", "export_date") == [D1]


def test_read_schema_missing_field_null_filled(lake, spark):
    lake.write_parts("t", _frame(spark, [(D1, "a", 1)]), "export_date")
    evolved = T.StructType(
        [
            T.StructField("export_date", T.DateType()),
            T.StructField("k", T.StringType()),
            T.StructField("v", T.LongType()),
            T.StructField("new_col", T.StringType()),
        ]
    )
    df = lake.read("t", evolved)
    assert df.columns == ["export_date", "k", "v", "new_col"]
    assert df.schema["new_col"].dataType == T.StringType()
    row = df.collect()[0]
    assert row["new_col"] is None and row["v"] == 1


def test_read_schema_mostly_missing_raises(lake, spark):
    lake.write_parts("t", _frame(spark, [(D1, "a", 1)]), "export_date")
    wrong = T.StructType(
        [
            T.StructField("export_date", T.DateType()),
            T.StructField("flow_id", T.StringType()),
            T.StructField("begin_time", T.TimestampType()),
            T.StructField("duration", T.LongType()),
        ]
    )
    with pytest.raises(ValueError, match="missing most declared fields"):
        lake.read("t", wrong)
