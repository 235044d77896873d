"""Reader for the driver's synthetic parquet tables.

`events.ts` is written as parquet TIMESTAMP(NANOS), which Spark does
not read natively (SPARK-40819): with
`spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as a LongType
of nanoseconds. This reader normalizes it back to a microsecond
TimestampType via integer division (truncation — exactly what DuckDB
does when it narrows ns → µs), keeping both engines bit-identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# columns known to be TIMESTAMP(NANOS) in the driver testdata
_NANO_TS_COLS = {"events": ["ts"]}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Runtime-set so a vanilla SparkSession (e.g. the correctness driver's,
    # built without session.get_spark) can read TIMESTAMP(NANOS) parquet.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df
