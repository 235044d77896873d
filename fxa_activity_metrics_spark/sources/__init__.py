"""Sources & sinks: CSV ingestion and the day-partitioned Parquet lake."""

from fxa_activity_metrics_spark.sources.csv import (
    clean_raw_lines,
    read_day_csv,
    validate_field_count,
)
from fxa_activity_metrics_spark.sources.lake import Lake

__all__ = ["Lake", "clean_raw_lines", "read_day_csv", "validate_field_count"]
