"""Engine scalar-function surface (SURVEY §2.8 F1-F11 + §2.2 P6)."""

from fxa_activity_metrics_spark.functions.core import (
    cohort_bucket,
    day_of,
    empty_backfill,
    experiment_cohort,
    experiment_name,
    hex_to_long,
    parse_continued_from,
    sample_cohort,
    truncate_columns,
    ts_from_epoch,
)

__all__ = [
    "cohort_bucket",
    "day_of",
    "empty_backfill",
    "experiment_cohort",
    "experiment_name",
    "hex_to_long",
    "parse_continued_from",
    "sample_cohort",
    "truncate_columns",
    "ts_from_epoch",
]
