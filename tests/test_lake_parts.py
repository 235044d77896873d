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


def test_overwrite_swap_leftovers_ignored_and_recovered(lake, spark):
    """Crash-recovery contract of Lake.overwrite's rotate-swap: a
    leftover ._old_swap/._tmp_swap staging dir is not listed as a
    table, and the next overwrite cleans it up."""
    import os
    import shutil

    from fxa_activity_metrics_spark.sources.lake import _hidden_sibling

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    lake.overwrite("t_swap", df)
    # simulate a crash that left both (hidden) staging dirs behind
    trash = _hidden_sibling(lake.path("t_swap"), "._old_swap")
    tmp = _hidden_sibling(lake.path("t_swap"), "._tmp_swap")
    shutil.copytree(lake.path("t_swap"), trash)
    shutil.copytree(lake.path("t_swap"), tmp)
    assert lake.tables("t_swap") == ["t_swap"], "staging dirs are not tables"
    assert lake.tables() == ["t_swap"], "hidden dirs are not tables"
    # recovery: the next overwrite succeeds and clears the leftovers
    lake.overwrite("t_swap", spark.createDataFrame([(2, "b")], "id long, v string"))
    assert [r.id for r in lake.read("t_swap").collect()] == [2]
    assert not os.path.exists(trash)
    assert lake.tables("t_swap") == ["t_swap"]


def test_overwrite_old_data_survives_until_promote(lake, spark, monkeypatch):
    """If the promote step fails, the previous table data still
    exists on disk (under the trash name) — nothing was rmtree'd
    before the new data was in place."""
    import os

    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    lake.overwrite("t_crash", df1)
    real_replace = os.replace
    calls = {"n": 0}

    def failing_replace(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the promote (tmp -> dest)
            raise OSError("simulated crash at promote")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", failing_replace)
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    with pytest.raises(OSError, match="simulated crash"):
        lake.overwrite("t_crash", df2)
    monkeypatch.undo()
    # old data is recoverable from the trash dir
    from fxa_activity_metrics_spark.sources.lake import _hidden_sibling

    trash = _hidden_sibling(lake.path("t_crash"), "._old_swap")
    assert os.path.isdir(trash)
    recovered = spark.read.parquet(trash)
    assert [r.id for r in recovered.collect()] == [1]


def test_write_days_sort_survives_to_the_files(spark, tmp_path):
    """write_days' SORTKEY analogue must actually reach the parquet
    files: FileFormatWriter requires its input ordered by the
    partition columns and silently inserts its own NON-STABLE sort
    when it isn't — which used to destroy the timestamp order and
    leave every row group spanning the whole day (zone maps useless).
    write_parts now leads the sort with the partition column, so the
    per-file timestamp order is the pinned contract here."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    lake = Lake(spark, str(tmp_path))
    df = (
        spark.range(40_000)
        .withColumn("day", F.date_add(F.lit("2021-03-01"),
                                      (F.col("id") % 2).cast("int")))
        .withColumn(
            "timestamp",
            (F.unix_timestamp(F.col("day").cast("timestamp"))
             + F.pmod(F.hash(F.col("id") * 5 + 3), F.lit(86_400))
             ).cast("timestamp"),
        )
        .repartition(8)
    )
    lake.write_days("t", df)
    files = glob.glob(os.path.join(lake.path("t"), "day=*", "*.parquet"))
    assert files
    for f in files:
        ts = pq.read_table(f, columns=["timestamp"])["timestamp"].to_pylist()
        assert ts == sorted(ts), f"{f} not timestamp-sorted"


def test_merge_replace_returns_partition_pruned_row_delta(spark, tmp_path):
    """merge_replace returns the table's row-count delta (inserted
    minus replaced/removed), computed from partition-pruned counts —
    the arithmetic the ivf/ivfpq upserts use to maintain the
    manifest's n_vectors without an O(corpus) count per call."""
    from fxa_activity_metrics_spark.sources.lake import Lake

    lake = Lake(spark, str(tmp_path / "mr_lake"))
    df = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b"), (1, 3, "c")], "cell int, id int, v string"
    )
    # create: every row is new
    assert lake.merge_replace("t", df, "cell", "id") == 3
    # pure insert into an existing partition
    ins = spark.createDataFrame([(0, 4, "d")], "cell int, id int, v string")
    assert lake.merge_replace("t", ins, "cell", "id") == 1
    # in-place replace: delta 0
    rep = spark.createDataFrame([(0, 1, "a2")], "cell int, id int, v string")
    assert lake.merge_replace("t", rep, "cell", "id") == 0
    # key moves partitions: still delta 0 (one removed, one added)
    mv = spark.createDataFrame([(2, 3, "c2")], "cell int, id int, v string")
    assert lake.merge_replace("t", mv, "cell", "id") == 0
    # widened delete set (keys=) with no new rows: negative delta
    keys = spark.createDataFrame([(4,)], "id int")
    empty = spark.createDataFrame([], "cell int, id int, v string")
    assert lake.merge_replace("t", empty, "cell", "id", keys=keys) == -1
    assert lake.read("t").count() == 3
