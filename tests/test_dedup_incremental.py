"""Persisted-signature incremental dedup: the union of per-day
incremental candidate sets must reconstruct the one-shot LSH
candidate set over the full corpus, without ever re-shingling
history."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.dedup import minhash_lsh_candidates
from fxa_activity_metrics_spark.plans.dedup_incremental import (
    append_signatures,
    backfill,
    incremental_candidates,
)
from fxa_activity_metrics_spark.sources.lake import Lake

D1 = dt.date(2024, 7, 1)
D2 = dt.date(2024, 7, 2)
D3 = dt.date(2024, 7, 3)

# Near-dup clusters spanning arrival days: docs 1/101/201 share text,
# 2/102 share, the rest are unique filler.
_TEXTS = {
    1: "the quick brown fox jumps over the lazy dog tonight",
    2: "pack my box with five dozen liquor jugs right now ok",
    3: "sphinx of black quartz judge my vow said the king",
    101: "the quick brown fox jumps over the lazy dog tonight",
    102: "pack my box with five dozen liquor jugs right now ok",
    103: "how vexingly quick daft zebras jump over fences daily",
    201: "the quick brown fox jumps over the lazy dog tonight",
    202: "jived fox nymph grabs quick waltz in the dark night",
}
_DAYS = {D1: [1, 2, 3], D2: [101, 102, 103], D3: [201, 202]}


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, _TEXTS[i]) for i in ids], "doc_id long, text string"
    )


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_incremental_union_equals_oneshot(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    got = _pairs(
        backfill(
            spark,
            lake,
            {d: _docs(spark, ids) for d, ids in _DAYS.items()},
            shingle_n=2,
        )
    )
    full = _docs(spark, [i for ids in _DAYS.values() for i in ids])
    want = _pairs(minhash_lsh_candidates(full, shingle_n=2))
    assert got == want
    assert want, "fixture must produce at least one candidate pair"


def test_incremental_day_emits_only_new_pairs(spark, tmp_path):
    """A day's incremental set touches that day's docs only — history
    pairs are never re-emitted."""
    lake = Lake(spark, str(tmp_path / "lake"))
    append_signatures(lake, _docs(spark, _DAYS[D1]), D1, shingle_n=2)
    append_signatures(lake, _docs(spark, _DAYS[D2]), D2, shingle_n=2)
    day2 = _pairs(incremental_candidates(lake, D2))
    assert day2, "cross-day near-dups must surface"
    new_ids = set(_DAYS[D2])
    for a, b in day2:
        assert a in new_ids or b in new_ids


def test_signature_append_is_idempotent(spark, tmp_path):
    """Re-importing a day replaces its partition: signature rows are
    not duplicated and the candidate set is unchanged."""
    lake = Lake(spark, str(tmp_path / "lake"))
    append_signatures(lake, _docs(spark, _DAYS[D1]), D1, shingle_n=2)
    append_signatures(lake, _docs(spark, _DAYS[D2]), D2, shingle_n=2)
    before = _pairs(incremental_candidates(lake, D2))
    n_before = lake.read("dedup_signatures").count()
    append_signatures(lake, _docs(spark, _DAYS[D2]), D2, shingle_n=2)
    assert lake.read("dedup_signatures").count() == n_before
    assert _pairs(incremental_candidates(lake, D2)) == before


def test_incremental_invariant_randomized(spark, tmp_path):
    """Seeded random corpora (shared phrase pools → organic near-dups,
    plus sub-shingle short docs and an empty day) still reconstruct
    the one-shot candidate set incrementally."""
    import random

    rng = random.Random(42)
    words = [f"w{i}" for i in range(30)]
    phrases = [" ".join(rng.choices(words, k=8)) for _ in range(12)]

    def mk(n, id0):
        rows = []
        for i in range(n):
            if rng.random() < 0.3:
                text = rng.choice(phrases)  # exact/near dup of a pool phrase
            elif rng.random() < 0.15:
                text = rng.choice(words)  # shorter than shingle_n → ineligible
            else:
                base = rng.choice(phrases).split()
                base[rng.randrange(len(base))] = rng.choice(words)
                text = " ".join(base)
            rows.append((id0 + i, text))
        return rows

    day_rows = {
        D1: mk(15, 1000),
        D2: mk(15, 2000),
        D3: [],  # empty drop: must not break the replay
    }
    day_rows[dt.date(2024, 7, 4)] = mk(10, 4000)

    lake = Lake(spark, str(tmp_path / "lake"))
    frames = {
        d: spark.createDataFrame(rows, "doc_id long, text string")
        if rows
        else spark.createDataFrame([], "doc_id long, text string")
        for d, rows in day_rows.items()
    }
    got = _pairs(backfill(spark, lake, frames, shingle_n=3))
    full = spark.createDataFrame(
        [r for rows in day_rows.values() for r in rows], "doc_id long, text string"
    )
    want = _pairs(minhash_lsh_candidates(full, shingle_n=3))
    assert got == want
    assert want, "random fixture must produce candidate pairs"
