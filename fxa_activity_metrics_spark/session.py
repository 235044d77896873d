"""SparkSession factory with engine defaults.

The reference pins all date semantics to UTC (epoch-seconds BIGINT →
`'epoch'::TIMESTAMP + ...` in Redshift, import_events.py:113), so the
session timezone is pinned to UTC (SURVEY §7 trap 7).

Defaults are scale-oriented: AQE on (runtime join selection, skew
splitting, partition coalescing) and zstd parquet compression
(reference `ENCODE zstd`, import_flow_events.py:10-26).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_NAME = "fxa-activity-metrics-spark"


def get_spark(
    app_name: str = ENGINE_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    config=None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster the deploy environment sets the master and these
    defaults still apply (they are all cluster-safe).

    ``config`` (an :class:`~fxa_activity_metrics_spark.config.
    EngineConfig`) supplies the same knobs as one object with
    explicit-beats-env precedence (C6), including the storage
    credential chain; per-argument values beat the config object.
    """
    if config is not None:
        app_name = app_name if app_name != ENGINE_NAME else (config.app_name or app_name)
        master = master or config.master
        if shuffle_partitions is None:
            shuffle_partitions = config.shuffle_partitions
        merged = config.spark_conf()
        merged.update(extra_conf or {})
        extra_conf = merged
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Idempotent day sink: overwrite only the partitions present in
        # the written frame (reference clear-day+insert,
        # import_events.py:102-105).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # write timestamps as TIMESTAMP_MICROS, not legacy INT96:
        # INT96 columns carry NO parquet min/max statistics, so the
        # lake's SORTKEY analogue (sortWithinPartitions("timestamp")
        # + footer-stat row-group pruning) silently never prunes on
        # timestamp for any reader (Spark, DuckDB, Trino). Found by
        # tools/zorder_activity_bench.py reading back None stats.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # read TIMESTAMP(NANOS) parquet columns as long (converted to
        # microsecond timestamps by sources.testdata.read_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
