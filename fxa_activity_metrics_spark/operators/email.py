"""Email-event import (import_email_events.py).

Identical pipeline shape to activity events but sampled by flow_id
(import_email_events.py:24) and with its own 8-column schema
(import_email_events.py:6-16). The generic typed-day projection in
operators.activity covers it; this module just pins the dataset
binding for clarity.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame

from fxa_activity_metrics_spark.operators.activity import typed_day_events

EMAIL_COLUMNS = [
    "timestamp",
    "flow_id",
    "domain",
    "template",
    "type",
    "bounced",
    "complaint",
    "locale",
]


def typed_email_day(
    raw: DataFrame,
    day: dt.date | str,
    percent: int,
    retention_cutoff: dt.date | str | None = None,
) -> DataFrame:
    return typed_day_events(
        raw,
        day,
        id_column="flow_id",
        percent=percent,
        retention_cutoff=retention_cutoff,
        columns=EMAIL_COLUMNS,
    )
