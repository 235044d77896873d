"""Activity-event import: typed projection of one day's raw CSV (EP1).

Reference lifecycle: import_events.py:107-127 (staging→perm typed
insert with epoch→timestamp conversion, day filter, cohort sampling,
at-insert retention gate).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.functions.core import day_of, sample_cohort, ts_from_epoch


def typed_day_events(
    raw: DataFrame,
    day: dt.date | str,
    id_column: str,
    percent: int,
    retention_cutoff: dt.date | str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Staging → typed day slice (P1/P2/P5/P6 + F1/F2).

    Reproduces the INSERT..SELECT at import_events.py:107-127:
    - `timestamp` epoch-seconds → TimestampType (F1);
    - keep only rows whose UTC day equals ``day`` — the raw file may
      contain stragglers from day±1 (import_events.py:118);
    - deterministic cohort sampling on ``id_column`` (P6);
    - optional at-insert retention gate: drop rows older than the
      cutoff (import_events.py:118-119);
    - emit the `day` partition column.
    """
    ts = ts_from_epoch("timestamp")
    df = (
        raw.withColumn("timestamp", ts)
        .withColumn("day", day_of("timestamp"))
        .filter(F.col("day") == F.lit(str(day)).cast("date"))
        .filter(sample_cohort(id_column, percent))
    )
    if retention_cutoff is not None:
        df = df.filter(F.col("day") >= F.lit(str(retention_cutoff)).cast("date"))
    if columns:
        df = df.select(*columns, "day")
    return df
