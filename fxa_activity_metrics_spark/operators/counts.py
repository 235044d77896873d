"""Daily account-counts import (import_counts.py).

One tiny CSV per day: (day, accounts, verified_accounts); table is
UNIQUE on day (import_counts.py:47-53) with history starting
2017-05-30 (COUNTS_BEGIN, import_counts.py:43).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COUNTS_BEGIN = dt.date(2017, 5, 30)


def typed_counts(raw: DataFrame) -> DataFrame:
    """Staging → typed counts rows (import_counts.py:82-86): CHAR(10)
    ISO day → DATE, keep days ≥ COUNTS_BEGIN, one row per day (UNIQUE
    enforced by construction — max wins deterministically)."""
    typed = raw.select(
        F.to_date("day").alias("day"),
        F.col("accounts").cast("long").alias("accounts"),
        F.col("verified_accounts").cast("long").alias("verified_accounts"),
    ).filter(F.col("day") >= F.lit(str(COUNTS_BEGIN)).cast("date"))
    return typed.groupBy("day").agg(
        F.max("accounts").alias("accounts"),
        F.max("verified_accounts").alias("verified_accounts"),
    )
