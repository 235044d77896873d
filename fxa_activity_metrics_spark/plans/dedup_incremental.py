"""Incremental dedup over a persisted MinHash signature table.

The one-shot LSH path (operators.dedup.minhash_lsh_candidates)
re-shingles and re-hashes the WHOLE corpus per run — fine for a
single query, wrong for a lake where documents arrive daily and the
corpus is 100 TB. The lake answer is the same split every production
dedup system makes:

- **build/append**: each arriving day computes signatures for ITS
  documents only (shingle + md5 cost proportional to the increment)
  and appends them to a day-partitioned ``dedup_signatures`` table
  via the idempotent day sink (re-importing a day replaces exactly
  that partition);
- **query**: candidate pairs touching the new day come from banding
  the persisted signatures — a slice+concat over 8 stored hex chunks,
  NO re-shingling — and bucket-joining the day's bands against the
  full table's bands on (band_idx, band_key). The shuffle carries
  (band, id) rows only; history is never re-tokenized.

Invariant (pinned by tests/test_dedup_incremental.py): running the
initial build plus each day's incremental candidates yields exactly
the one-shot candidate set over the unioned corpus — dedup never
misses a pair for having arrived incrementally.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.dedup import (
    minhash_signature,
    signature_bands,
)
from fxa_activity_metrics_spark.sources.lake import Lake

from fxa_activity_metrics_spark import cacheutil

SIGNATURE_TABLE = "dedup_signatures"


def append_signatures(
    lake: Lake,
    docs: DataFrame,
    day: dt.date,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
    table: str = SIGNATURE_TABLE,
) -> None:
    """Signature build for one arriving day — cost proportional to
    the increment, idempotent per day (dynamic partition overwrite)."""
    sigs = minhash_signature(docs, id_col, text_col, num_hashes, shingle_n)
    lake.write_days(table, sigs.withColumn("day", F.lit(day)), sort_cols=["id"])


def incremental_candidates(
    lake: Lake,
    day: dt.date,
    num_hashes: int = 8,
    band_size: int = 2,
    table: str = SIGNATURE_TABLE,
) -> DataFrame:
    """Candidate pairs involving ``day``'s documents: the day's bands
    bucket-join the FULL signature table's bands (history included,
    never re-shingled). Pairs are (id_a < id_b) distinct; pairs whose
    BOTH sides predate ``day`` are excluded — they were emitted when
    their own day arrived, so the union over days reconstructs the
    one-shot candidate set exactly.
    """
    all_bands = signature_bands(lake.read(table), num_hashes, band_size)
    day_ids = lake.read_days(table, day, day).select("id")
    new_bands = all_bands.join(F.broadcast(day_ids), "id").select(
        F.col("id").alias("new_id"), "band_idx", "band_key"
    )
    pairs = new_bands.join(all_bands, ["band_idx", "band_key"]).filter(
        F.col("new_id") != F.col("id")
    )
    return (
        pairs.select(
            F.least("new_id", "id").alias("id_a"),
            F.greatest("new_id", "id").alias("id_b"),
        )
        .distinct()
    )


def backfill(
    spark: SparkSession,
    lake: Lake,
    docs_by_day: dict[dt.date, DataFrame],
    band_size: int = 2,
    **kwargs,
) -> DataFrame:
    """Replay a document history day by day (in day order) and return
    the union of incremental candidate sets (driver convenience for
    tests/backfills; each step is the two calls above).

    Each day's candidates are MATERIALIZED (localCheckpoint) before
    the next append. Without it the union silently loses pairs:
    FileSourceScan canonicalization keys on the table's root path,
    not the captured file listing, so the per-day scans of the
    growing signature table canonicalize EQUAL and ReuseExchange
    substitutes the first day's banding exchange into every later
    branch — day N's candidates get joined against day 1's snapshot.
    The checkpoint severs the reusable lineage (same reason the
    streaming merge sink checkpoints its micro-batch).
    """
    out: DataFrame | None = None
    for day in sorted(docs_by_day):
        append_signatures(lake, docs_by_day[day], day, **kwargs)
        cands = incremental_candidates(
            lake,
            day,
            num_hashes=kwargs.get("num_hashes", 8),
            band_size=band_size,
            table=kwargs.get("table", SIGNATURE_TABLE),
        ).transform(cacheutil.local_checkpoint)
        out = cands if out is None else out.unionByName(cands)
    assert out is not None, "docs_by_day must be non-empty"
    return out.distinct()
