"""Dataset-assembly operators (operators/assembly.py): semantics,
determinism invariants, and the physical-plan scale contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from fxa_activity_metrics_spark.operators import assembly

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_exact_windows(spark):
    # 10 tokens, size 4, stride 3 -> starts 0,3,6 (ceil((10-4)/3)=2 extra)
    docs = _mkdocs(spark, [(1, "a b c d e f g h i j", "s")])
    out = assembly.chunk_documents(docs, chunk_size=4, stride=3)
    got = {
        r.chunk_id: (r.chunk_text, r.n_chunk_tokens)
        for r in out.collect()
    }
    assert got == {
        0: ("a b c d", 4),
        1: ("d e f g", 4),
        2: ("g h i j", 4),
    }


def test_chunk_short_and_empty_docs(spark):
    docs = _mkdocs(spark, [(1, "one two", "s"), (2, "   ", "s")])
    out = assembly.chunk_documents(docs, chunk_size=4, stride=3).collect()
    # short doc -> exactly one partial chunk; empty doc -> none
    assert len(out) == 1
    assert out[0].doc_id == 1 and out[0].n_chunk_tokens == 2


def test_chunk_last_window_reaches_end(spark):
    # n=9, size 4, stride 3 -> starts 0,3,6? ceil((9-4)/3)=2 -> last
    # start 6 covers tokens 7..9; no chunk starts past the end
    docs = _mkdocs(spark, [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9", "s")])
    rows = assembly.chunk_documents(docs, chunk_size=4, stride=3).collect()
    starts = sorted((r.chunk_id, r.n_chunk_tokens) for r in rows)
    assert starts == [(0, 4), (1, 4), (2, 3)]


def test_chunk_exact_boundary_no_extra_window(spark):
    # n == chunk_size -> exactly one chunk
    docs = _mkdocs(spark, [(1, "a b c d", "s")])
    rows = assembly.chunk_documents(docs, chunk_size=4, stride=3).collect()
    assert len(rows) == 1 and rows[0].n_chunk_tokens == 4


def test_chunk_overlap_tokens_shared(spark):
    docs = _mkdocs(spark, [(1, " ".join(f"w{i}" for i in range(20)), "s")])
    rows = assembly.chunk_documents(docs, chunk_size=8, stride=4).collect()
    by_id = {r.chunk_id: r.chunk_text.split(" ") for r in rows}
    for i in range(len(by_id) - 1):
        assert by_id[i][4:] == by_id[i + 1][:4], "stride-4 overlap"


def test_chunk_plan_no_shuffle(spark):
    docs = _mkdocs(spark, [(1, "a b c", "s")])
    plan = _plan(assembly.chunk_documents(docs))
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate posexplode" in plan


def test_chunk_gapped_sampling_no_phantom_chunk(spark):
    """stride > chunk_size (gapped sampling): the ceil-count alone
    would start a window past the end (5 tokens, size 4, stride 9 →
    phantom empty chunk with negative n_chunk_tokens); the floor
    clamp must suppress it."""
    docs = _mkdocs(spark, [(1, "a b c d e", "s")])
    rows = assembly.chunk_documents(docs, chunk_size=4, stride=9).collect()
    assert [(r.chunk_id, r.chunk_text, r.n_chunk_tokens) for r in rows] == [
        (0, "a b c d", 4)
    ]
    # and a start that IS in range still fires (10 tokens → start 9)
    docs = _mkdocs(spark, [(1, "a b c d e f g h i j", "s")])
    rows = sorted(
        (r.chunk_id, r.chunk_text, r.n_chunk_tokens)
        for r in assembly.chunk_documents(
            docs, chunk_size=4, stride=9
        ).collect()
    )
    assert rows == [(0, "a b c d", 4), (1, "j", 1)]


def test_chunk_invalid_params(spark):
    docs = _mkdocs(spark, [(1, "a", "s")])
    with pytest.raises(ValueError):
        assembly.chunk_documents(docs, chunk_size=0)
    with pytest.raises(ValueError):
        assembly.chunk_documents(docs, stride=0)


# ---------------------------------------------------------------------------
# train_split
# ---------------------------------------------------------------------------


def test_split_fractions_and_stability(spark):
    docs = _mkdocs(spark, [(i, "x", "s") for i in range(2000)])
    out = assembly.train_split(docs)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 2000 == pytest.approx(0.9, abs=0.03)
    # deterministic: re-running on a repartitioned input is identical
    again = assembly.train_split(docs.repartition(7))
    assert out.exceptAll(again).count() == 0


def test_split_cohort_containment(spark):
    """Shrinking train 90 -> 80 keeps the smaller train a subset —
    the property randomSplit loses on repartition."""
    docs = _mkdocs(spark, [(i, "x", "s") for i in range(1000)])
    t90 = {
        r.doc_id
        for r in assembly.train_split(docs).where("split = 'train'").collect()
    }
    t80 = {
        r.doc_id
        for r in assembly.train_split(
            docs, thresholds=(("train", 8000), ("val", 9000), ("test", 10000))
        )
        .where("split = 'train'")
        .collect()
    }
    assert t80 <= t90


def test_split_plan_no_shuffle(spark):
    docs = _mkdocs(spark, [(1, "x", "s")])
    plan = _plan(assembly.train_split(docs))
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# source_mixture
# ---------------------------------------------------------------------------


def test_mixture_upweights_small_sources(spark):
    rows = [(i, "x", "big") for i in range(900)] + [
        (1000 + i, "x", "small") for i in range(100)
    ]
    out = assembly.source_mixture(_mkdocs(spark, rows), sample_frac=0.5)
    rates = {
        r.source: r.mix_rate for r in out.select("source", "mix_rate").distinct().collect()
    }
    # sqrt damping: the small source keeps a larger fraction
    assert rates["small"] > rates["big"]
    # overall kept fraction lands near sample_frac
    kept = out.where("keep").count()
    assert kept / 1000 == pytest.approx(0.5, abs=0.1)


def test_mixture_rate_caps_at_one(spark):
    rows = [(i, "x", "big") for i in range(990)] + [(2000, "x", "tiny")]
    out = assembly.source_mixture(_mkdocs(spark, rows), sample_frac=0.9)
    tiny = out.where("source = 'tiny'").first()
    assert tiny.mix_rate == 1.0 and tiny.keep


def test_mixture_corpus_never_shuffles(spark):
    """The corpus side joins the broadcast rate table without an
    exchange; the only hash exchange is the tiny per-source agg."""
    docs = _mkdocs(spark, [(i, "x", f"s{i % 3}") for i in range(30)])
    plan = _plan(assembly.source_mixture(docs))
    assert plan.count("BroadcastHashJoin") >= 1
    # the corpus side must only broadcast-join — never a sort-merge
    # join (which would shuffle the corpus). The only allowed hash
    # exchange is the tiny per-source stats agg (keyed on `source`),
    # now visible inside the persisted stats InMemoryRelation (it was
    # hidden behind the former localCheckpoint's lineage cut; the
    # exchange node can print twice — both stats consumers reuse it).
    assert "SortMergeJoin" not in plan
    import re
    for m in re.finditer(r"Exchange hashpartitioning\((\w+)#", plan):
        assert m.group(1) == "source", plan


# ---------------------------------------------------------------------------
# shard_shuffle
# ---------------------------------------------------------------------------


def test_shard_shuffle_is_permutation(spark):
    docs = _mkdocs(spark, [(i, "x", "s") for i in range(500)])
    out = assembly.shard_shuffle(docs, n_shards=4).collect()
    assert len(out) == 500
    # positions within each shard are 1..n_shard
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.position)
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_shard_shuffle_seed_changes_order(spark):
    docs = _mkdocs(spark, [(i, "x", "s") for i in range(300)])
    a = {
        (r.doc_id, r.shard, r.position)
        for r in assembly.shard_shuffle(docs, seed="epoch0").collect()
    }
    b = {
        (r.doc_id, r.shard, r.position)
        for r in assembly.shard_shuffle(docs, seed="epoch1").collect()
    }
    assert a != b, "new seed must produce a different order"
    c = {
        (r.doc_id, r.shard, r.position)
        for r in assembly.shard_shuffle(docs, seed="epoch0").collect()
    }
    assert a == c, "same seed must reproduce the order exactly"


def test_shard_shuffle_single_exchange(spark):
    docs = _mkdocs(spark, [(i, "x", "s") for i in range(50)])
    plan = _plan(assembly.shard_shuffle(docs, n_shards=4))
    assert plan.count("Exchange hashpartitioning") == 1, (
        "one exchange on the shard key; sorts are per-shard, no global order"
    )
    assert "Exchange rangepartitioning" not in plan


def test_shard_shuffle_invalid(spark):
    with pytest.raises(ValueError):
        assembly.shard_shuffle(_mkdocs(spark, [(1, "x", "s")]), n_shards=0)


# ---------------------------------------------------------------------------
# quality_classifier
# ---------------------------------------------------------------------------


def test_classifier_orders_quality(spark):
    good = " ".join(
        ["the quick brown fox jumps over a lazy dog near the old river bank"]
        * 8
    )
    bad = "#### !!!! @@@@ %%%% ^^^^ &&&& **** (((( )))) ____"
    docs = _mkdocs(spark, [(1, good, "s"), (2, bad, "s")])
    rows = {r.doc_id: r for r in assembly.quality_classifier(docs).collect()}
    assert rows[1].score > rows[2].score
    assert rows[1].label and not rows[2].label


def test_classifier_score_bounds_and_fixed_point(spark):
    docs = E.queries()["quality_classifier"](spark, SF)
    agg = docs.agg(
        F.min("score").alias("lo"),
        F.max("score").alias("hi"),
        F.max(
            (F.col("score_micro") < 0) | (F.col("score_micro") > 1_000_000)
        ).alias("oob"),
    ).first()
    assert 0.0 <= agg.lo <= agg.hi <= 1.0
    assert not agg.oob


def test_classifier_plan_shuffle_free(spark):
    df = E.queries()["quality_classifier"](spark, SF)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only exchange allowed is _docs()'s round-robin repartition
    assert "Exchange hashpartitioning" not in plan


def test_extra_cols_reserved_names_rejected(spark):
    docs = _mkdocs(spark, [(1, "a b c", "s")])
    with pytest.raises(ValueError, match="collide"):
        assembly.chunk_documents(docs, extra_cols=["n"])
    with pytest.raises(ValueError, match="collide"):
        assembly.quality_classifier(docs, extra_cols=["score"])


# ---------------------------------------------------------------------------
# curriculum_order
# ---------------------------------------------------------------------------


def test_curriculum_orders_quality_first_within_shard(spark):
    good = " ".join(
        ["the quick brown fox jumps over a lazy dog near the old river"] * 8
    )
    bad = "#### !!!! @@@@ %%%%"
    docs = _mkdocs(
        spark,
        [(i, good if i % 2 == 0 else bad, "s") for i in range(100)],
    )
    out = assembly.curriculum_order(docs, n_shards=4).collect()
    assert len(out) == 100
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.position)
        bands = [r.quality_band for r in rows]
        assert bands == sorted(bands, reverse=True), (
            "within a shard, quality bands must be non-increasing"
        )
        assert sorted(r.position for r in rows) == list(
            range(1, len(rows) + 1)
        )


def test_curriculum_single_exchange(spark):
    docs = _mkdocs(spark, [(i, "a b c", "s") for i in range(30)])
    plan = _plan(assembly.curriculum_order(docs, n_shards=4))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
    with pytest.raises(ValueError):
        assembly.curriculum_order(docs, n_shards=0)


# ---------------------------------------------------------------------------
# write_training_shards
# ---------------------------------------------------------------------------


def test_training_shards_layout_and_determinism(spark, tmp_path):
    import json
    import os

    docs = _mkdocs(spark, [(i, f"text {i}", "s") for i in range(200)])
    out1 = str(tmp_path / "e1")
    assembly.write_training_shards(docs, out1, n_shards=4)
    shard_dirs = sorted(
        d for d in os.listdir(out1) if d.startswith("shard=")
    )
    assert shard_dirs == [f"shard={i}" for i in range(4)]

    def read_shards(base):
        out = {}
        for d in sorted(os.listdir(base)):
            if not d.startswith("shard="):
                continue
            rows = []
            for f in sorted(os.listdir(os.path.join(base, d))):
                if f.endswith(".json"):
                    with open(os.path.join(base, d, f)) as fh:
                        rows.extend(json.loads(line) for line in fh)
            out[d] = rows
        return out

    got1 = read_shards(out1)
    assert sum(len(v) for v in got1.values()) == 200
    # deterministic: a second export is byte-identical in content+order
    out2 = str(tmp_path / "e2")
    assembly.write_training_shards(docs, out2, n_shards=4)
    assert read_shards(out2) == got1
    # membership matches shard_shuffle's scheme
    want = {
        r.doc_id: r.shard
        for r in assembly.shard_shuffle(docs, n_shards=4).collect()
    }
    for d, rows in got1.items():
        k = int(d.split("=")[1])
        for row in rows:
            assert want[row["doc_id"]] == k


def test_training_shards_rerun_overwrites_idempotently(spark, tmp_path):
    import os

    docs = _mkdocs(spark, [(i, "x", "s") for i in range(50)])
    out = str(tmp_path / "e")
    assembly.write_training_shards(docs, out, n_shards=2)
    assembly.write_training_shards(docs, out, n_shards=2)
    df = spark.read.json(os.path.join(out))
    assert df.count() == 50
    with pytest.raises(ValueError):
        assembly.write_training_shards(docs, out, n_shards=0)


def test_training_shards_reserved_columns_rejected(spark, tmp_path):
    docs = _mkdocs(spark, [(1, "x", "s")]).withColumn("shard", F.lit(9))
    with pytest.raises(ValueError, match="collide"):
        assembly.write_training_shards(docs, str(tmp_path / "e"))


# ---- cross-split near-dup leakage (split_leakage) -------------------


def _py_bucket(i: int, salt: str = "split") -> int:
    import hashlib

    return int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:7], 16) % 10_000


def test_split_leakage_matches_python_twin(spark):
    """Pairs spanning the train boundary must surface exactly the
    non-train side, with the correct split label, partner count, and
    min train partner — replayed against a pure-python twin of the
    md5 bucket rule over a synthetic pair set."""
    ids = list(range(1, 300))
    train = {i for i in ids if _py_bucket(i) < 9000}
    evals = [i for i in ids if i not in train]
    # build pairs: each eval doc paired with 2 train docs; plus some
    # train-train and eval-eval pairs that must NOT surface
    t = sorted(train)
    pairs = []
    want = {}
    for n, e in enumerate(evals[:8]):
        partners = [t[2 * n], t[2 * n + 1]]
        pairs += [(min(e, p), max(e, p)) for p in partners]
        want[e] = (len(partners), min(partners))
    pairs += [(t[40], t[41]), (evals[10], evals[11])]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = {r.doc_id: r for r in assembly.split_leakage(pdf).collect()}
    assert set(out) == set(want)
    for e, (n, mn) in want.items():
        assert out[e].n_train_dups == n and out[e].min_train_dup == mn
        assert out[e].split == ("val" if _py_bucket(e) < 9500 else "test")


def test_split_leakage_plan_has_no_join(spark):
    """The split of BOTH pair sides is a pure id expression, so the
    registry plan must contain no join of any kind — one orientation
    union over the persisted pair table, one aggregate."""
    df = E.queries()["split_leakage"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan


# ---- decontaminated split assignment (split_decontam) ----------------


def test_split_decontam_policies_match_python_twin(spark):
    """Every doc surfaces exactly once; leaked eval docs resolve per
    policy (drop -> 'dropped', rehome -> 'train'); train-side pair
    members and clean docs keep their split; n_train_dups counts the
    eval doc's train partners and is 0 for clean docs."""
    ids = list(range(1, 200))
    train = {i for i in ids if _py_bucket(i) < 9000}
    evals = [i for i in ids if i not in train]
    t = sorted(train)
    leaked_eval = evals[0]
    clean_eval = evals[1]
    pairs = [
        (min(leaked_eval, t[0]), max(leaked_eval, t[0])),
        (min(leaked_eval, t[1]), max(leaked_eval, t[1])),
        (t[2], t[3]),  # train-train: must not flag anyone
    ]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    for policy, resolved in (("drop", "dropped"), ("rehome", "train")):
        out = {
            r.doc_id: r
            for r in assembly.split_decontam(docs, pdf, policy=policy).collect()
        }
        assert set(out) == set(ids)
        r = out[leaked_eval]
        assert r.n_train_dups == 2 and r.final_split == resolved
        assert r.split == ("val" if _py_bucket(leaked_eval) < 9500 else "test")
        for i in (clean_eval, t[0], t[1], t[2], t[3]):
            assert out[i].n_train_dups == 0
            assert out[i].final_split == out[i].split


def test_split_decontam_rejects_unknown_policy(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    pdf = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="policy"):
        assembly.split_decontam(docs, pdf, policy="purge")


def test_split_decontam_plan_broadcasts_leaked_set(spark):
    """The corpus side must not shuffle: the only join is a broadcast
    of the (tiny) leaked aggregate onto the per-row split projection."""
    df = E.queries()["split_decontam"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
