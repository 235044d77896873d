"""dropDuplicatesWithinWatermark streaming dedup: within-delay
duplicates collapse to the first arrival; far-apart copies are both
kept; checkpoint restart is clean."""

from __future__ import annotations

import datetime as dt
import json
import os
import time

import pytest

from fxa_activity_metrics_spark.streaming.native_dedup_stream import (
    run_native_dedup_stream,
)

T0 = dt.datetime(2024, 6, 1, 9, 0, 0)


def _row(doc_id, text, seconds):
    return {
        "doc_id": doc_id,
        "text": text,
        "ts": (T0 + dt.timedelta(seconds=seconds)).isoformat(sep=" "),
    }


FILE1 = [
    _row(1, "alpha text", 0),
    _row(2, "alpha text", 60),        # dup 60s later -> dropped
    _row(3, "beta text", 10),
    _row(4, "beta text", 200),        # dup within delay -> dropped
    _row(5, "gamma text", 30),
]
# advances the watermark to 4000s - 30min = 2200s, past alpha's
# state expiry (0s + 30min) -> its dedup state is evicted
FILE_ADVANCE = [_row(8, "epsilon text", 4000)]
FILE2 = [
    _row(6, "alpha text", 7200),      # far beyond delay -> kept
    _row(7, "delta text", 7300),
]


def _write(dirpath, name, rows, mtime):
    p = os.path.join(dirpath, name)
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(p, (mtime, mtime))


@pytest.fixture()
def src(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    _write(str(d), "f1.json", FILE1, time.time() - 3600)
    return str(d)


def _ids(spark, out_dir):
    return sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())


def test_within_delay_dups_collapse_to_first(spark, src, tmp_path):
    out = str(tmp_path / "out")
    q = run_native_dedup_stream(spark, src, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _ids(spark, out) == [1, 3, 5]


def test_beyond_delay_copy_is_kept_and_restart_is_clean(
    spark, src, tmp_path
):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_native_dedup_stream(spark, src, out, ckpt).awaitTermination(120)
    first = _ids(spark, out)
    # restart with no new data: nothing re-emitted
    run_native_dedup_stream(spark, src, out, ckpt).awaitTermination(120)
    assert _ids(spark, out) == first
    # eviction is lazy: the state drops only once the WATERMARK
    # passes first-arrival + delay, so advance it with an unrelated
    # doc first...
    _write(src, "f_adv.json", FILE_ADVANCE, time.time() - 2400)
    run_native_dedup_stream(spark, src, out, ckpt).awaitTermination(120)
    assert _ids(spark, out) == [1, 3, 5, 8]
    # ...then the far-apart copy of "alpha text" is KEPT — the
    # bounded-state contract (near-in-time dups collapse, distant
    # re-occurrences survive)
    _write(src, "f2.json", FILE2, time.time() - 1800)
    run_native_dedup_stream(spark, src, out, ckpt).awaitTermination(120)
    assert _ids(spark, out) == [1, 3, 5, 6, 7, 8]
