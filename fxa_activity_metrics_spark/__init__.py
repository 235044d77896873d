"""fxa_activity_metrics_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of mozilla/fxa-activity-metrics (reference studied at
/root/reference, cited by file:line in docstrings throughout) as an
idiomatic Spark DataFrame/SQL engine:

- day-partitioned Parquet lake with dynamic-partition-overwrite
  idempotent sinks (reference: delete-day-then-insert,
  import_events.py:102-105)
- deterministic cohort sampling (import_events.py:114)
- flow sessionization (import_flow_events.py:109-304)
- daily summaries incl. the 7-day multi-device range join
  (calculate_daily_summary.py:92-105)
- incremental newest-first day driver (import_events.py:238-258)
- a Structured Streaming variant of the flow session pipeline
- LLM-training-data extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text analysis,
  multimodal column plumbing.

Everything is DataFrame-first: Catalyst handles pushdown, pruning,
join selection, and AQE; no RDDs, no row-at-a-time Python UDFs in any
hot path.
"""

__version__ = "0.1.0"
