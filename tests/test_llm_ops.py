"""Unit semantics for the round-3 LLM-pipeline operators: duplicate
cluster resolution (connected components), n-gram decontamination,
and PII scrubbing. Oracle hash-parity is covered by
test_oracle_parity.py; these pin the operator contracts directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.dedup import (
    duplicate_clusters,
    ngram_decontaminate,
)
from fxa_activity_metrics_spark.operators.textstats import pii_scrub


def _clusters(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = duplicate_clusters(df).collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_clusters_transitive_chain(spark):
    # 1-2, 2-3, 3-4 form ONE cluster rooted at 1; 10-11 a second
    got = _clusters(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_clusters_direction_irrelevant(spark):
    assert _clusters(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}


def test_clusters_long_path_converges(spark):
    # a 12-node path needs ~diameter rounds of propagation
    path = [(i, i + 1) for i in range(12)]
    got = _clusters(spark, path)
    assert set(got.values()) == {0}


def test_clusters_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(12)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        duplicate_clusters(df, max_iter=2)


def test_decontaminate_finds_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon unrelated tail"),
            (2, "totally different words here nothing shared"),
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta epsilon suffix")],
        "doc_id long, text string",
    )
    rows = ngram_decontaminate(corpus, probe, n=4).collect()
    assert len(rows) == 1
    r = rows[0]
    # shared distinct 4-grams: "alpha beta gamma delta" and
    # "beta gamma delta epsilon"
    assert (r["doc_id"], r["probe_id"], r["n_shared"]) == (1, 100, 2)


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d+x@e.org ip 10.0.0.7 acct 123456789 ok"),
            (2, "clean text with short 12345 digits and no at-signs"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    r1 = rows[1]
    assert r1["n_email"] == 2 and r1["n_ipv4"] == 1 and r1["n_long_digits"] == 1
    assert (
        r1["clean_text"]
        == "mail <EMAIL> and <EMAIL> ip <IPV4> acct <LONG_DIGITS> ok"
    )
    r2 = rows[2]
    assert r2["n_email"] == 0 and r2["n_ipv4"] == 0 and r2["n_long_digits"] == 0
    assert r2["clean_text"] == "clean text with short 12345 digits and no at-signs"


def test_pack_sequences_respects_capacity(spark):
    from fxa_activity_metrics_spark.operators.textstats import pack_sequences

    # doc i has i+1 tokens
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, capacity=10, block_size=16).collect()
    assert len(out) == 40
    bins: dict[int, list[tuple[int, int]]] = {}
    for r in out:
        bins.setdefault(r["bin_id"], []).append((r["doc_id"], r["n_tokens"]))
    for bin_id, members in bins.items():
        total = sum(n for _, n in members)
        # a bin only exceeds capacity when a single overlong doc owns it
        assert total <= 10 or len(members) == 1
    # next-fit in doc_id order: members of one bin are contiguous ids
    for members in bins.values():
        ids = sorted(i for i, _ in members)
        assert ids == list(range(ids[0], ids[-1] + 1))
    # bin ids never collide across blocks: doc 0-15 and 16-31 disjoint bins
    b0 = {r["bin_id"] for r in out if r["doc_id"] < 16}
    b1 = {r["bin_id"] for r in out if 16 <= r["doc_id"] < 32}
    assert not (b0 & b1)


def test_pack_sequences_overlong_doc_alone(spark):
    from fxa_activity_metrics_spark.operators.textstats import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b"), (1, " ".join(["x"] * 50)), (2, "c d")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, capacity=10).collect()}
    assert out[1]["bin_id"] not in (out[0]["bin_id"], out[2]["bin_id"]), (
        "an overlong doc must occupy its own bin"
    )
    assert out[0]["bin_id"] != out[2]["bin_id"], (
        "the doc after an overlong one starts a fresh bin"
    )


def test_operators_handle_empty_input(spark):
    """Every round-3 operator must accept an empty frame (empty Arrow
    batches, zero groups, zero pairs) without erroring."""
    from fxa_activity_metrics_spark.operators.textstats import (
        pack_sequences,
        winnow_fingerprint,
        winnow_fingerprint_rk,
    )

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert duplicate_clusters(empty_pairs).count() == 0
    assert ngram_decontaminate(empty_docs, empty_docs, n=4).count() == 0
    assert pii_scrub(empty_docs).count() == 0
    assert pack_sequences(empty_docs).count() == 0
    assert winnow_fingerprint(empty_docs).count() == 0
    assert winnow_fingerprint_rk(empty_docs).count() == 0


def test_winnow_null_and_short_text(spark):
    from fxa_activity_metrics_spark.operators.textstats import (
        winnow_fingerprint,
        winnow_fingerprint_rk,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "abcd"), (4, "abcdefgh")],
        "doc_id long, text string",
    )
    for op in (winnow_fingerprint, winnow_fingerprint_rk):
        got = {r["doc_id"]: list(r["fps"]) for r in op(docs).collect()}
        assert got[1] == [] and got[2] == [] and got[3] == []
        assert len(got[4]) >= 1, "8 chars -> 4 k-grams -> 1 window"


def test_neardup_gemm_empty_corpus(spark):
    from fxa_activity_metrics_spark.operators.similarity import (
        embedding_neardup_pairs_gemm,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = embedding_neardup_pairs_gemm(empty)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "cosine"]


def test_neardup_gemm_driver_budget_guard(spark):
    """The broadcast formulation is driver-bound by design: a corpus
    whose matrix estimate exceeds max_driver_bytes must refuse loudly
    and point at the formulations that scale."""
    import pytest

    from fxa_activity_metrics_spark.operators.similarity import (
        embedding_neardup_pairs_gemm,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="embedding_neardup_lsh"):
        embedding_neardup_pairs_gemm(vecs, max_driver_bytes=64)


def test_clusters_boundary_diameter_converges(spark):
    """A component whose last label change lands exactly on round
    max_iter must return the correct result, not raise — the
    post-loop probe confirms convergence."""
    chain = [(i, i + 1) for i in range(6)]  # diameter 6 path
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(df, max_iter=6).collect()}
    assert set(got.values()) == {0}


def test_pack_sequences_exact_blocks_above_2_53(spark):
    """Block sharding must use integer division — doubles lose exact
    integers above 2^53 and would mis-shard hash-derived doc ids."""
    from fxa_activity_metrics_spark.operators.textstats import pack_sequences

    big = (1 << 55) + 63
    docs = spark.createDataFrame(
        [(big, "a b c"), (big + 1, "d e")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["bin_id"] for r in pack_sequences(docs, capacity=10, block_size=64).collect()}
    # big is the LAST id of its block; big+1 starts the next block
    assert out[big] // 64 == big // 64
    assert out[big + 1] // 64 == (big + 1) // 64
    assert out[big] != out[big + 1]


def test_repetition_stats_flags_repeats(spark):
    from fxa_activity_metrics_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "each word here appears exactly once today"),
            (3, "one"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert rows[1]["repetitive"] is True
    assert rows[1]["dup_2gram_frac"] == 0.8  # 5 grams, 1 distinct
    assert rows[2]["repetitive"] is False
    assert rows[2]["dup_2gram_frac"] == 0.0
    assert rows[3]["dup_2gram_frac"] == 0.0 and rows[3]["repetitive"] is False


def test_stratified_sample_rates_and_determinism(spark):
    from fxa_activity_metrics_spark.operators.textstats import stratified_sample

    # many docs with crafted quality extremes: short junk (low band)
    # and long varied prose (high band)
    rows = []
    for i in range(200):
        rows.append((i, "!!! ###"))  # low quality
        rows.append((1000 + i, " ".join(f"word{j}x{i}" for j in range(120)) + " the of and to in is a"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = stratified_sample(docs).collect()
    by_band = {}
    for r in out:
        by_band.setdefault(r["quality_band"], []).append(r)
    bands = sorted(by_band)
    assert bands[0] <= 1 and bands[-1] >= 3, "both extremes must appear"
    # top band keeps everything (rate 100)
    top = by_band[bands[-1]]
    assert all(r["keep"] for r in top)
    # bottom band keeps roughly its rate (5% or 10%), never all
    bottom = by_band[bands[0]]
    kept = sum(1 for r in bottom if r["keep"])
    assert 0 < kept < len(bottom) * 0.3
    # deterministic: second run identical
    again = stratified_sample(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_bpe_real_known_encodings(spark):
    """Hand-checked greedy merges: 'the' collapses via t+h -> th,
    th+e -> the (rank order 0 then 6); 'aaa' has no merges; digits
    and punctuation stay single tokens; words memoize per batch."""
    from fxa_activity_metrics_spark.operators.textstats import (
        BPE_MERGES,
        _bpe_encode,
        token_count_bpe_real,
    )

    ranks = {p: i for i, p in enumerate(BPE_MERGES)}
    assert _bpe_encode("the", ranks) == 1
    assert _bpe_encode("and", ranks) == 1
    assert _bpe_encode("aaa", ranks) == 3
    assert _bpe_encode("x", ranks) == 1
    assert _bpe_encode("", ranks) == 0

    docs = spark.createDataFrame(
        [
            (1, "The thing!"),      # the=1, thing=2, !=1  -> 4
            (2, "and and AND"),     # 1+1+1 -> 3
            (3, ""),                # -> 0
            (4, None),              # null text -> 0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_bpe_real"] for r in token_count_bpe_real(docs).collect()}
    assert got == {
        1: 1 + _bpe_encode("thing", ranks) + 1,
        2: 3,
        3: 0,
        4: 0,
    }


def test_clean_corpus_removes_all_three_hazards(spark):
    """The composed cleaner (the SAME assembly.clean_corpus the
    registry query runs) must drop (a) low-quality docs, (b) exact
    duplicates (keep the smallest id), (c) benchmark-contaminated
    docs — and keep everything else."""
    good = (
        "the quick brown fox jumps over a lazy dog and runs to the "
        "old river bank where the water is cold "
    ) * 3
    probe_text = "secret benchmark phrase alpha beta gamma delta " * 3
    docs = spark.createDataFrame(
        [
            (1, good + " one"),                       # keep
            (2, good + " one"),                       # exact dup of 1: drop
            (3, "#### !!!! @@@@ %%%%"),               # low quality: drop
            (4, good + " " + probe_text),             # contaminated: drop
            (5, good + " five"),                      # keep
            (20, probe_text),                         # probe slice (id%20==0)
        ],
        "doc_id long, text string",
    )
    from fxa_activity_metrics_spark.operators import assembly

    kept = assembly.clean_corpus(docs)
    assert {r.doc_id for r in kept.collect()} == {1, 5}


def _py_bpe_train(texts, n_merges):
    """Pure-Python reference: classic BPE learning over pre-token
    word counts — overlapping pair counts, leftmost-non-overlapping
    apply, ties by (count desc, (l, r) asc)."""
    import re
    from collections import Counter

    from fxa_activity_metrics_spark.operators.textstats import (
        BPE_SPLIT_PATTERN,
    )

    pat = re.compile(BPE_SPLIT_PATTERN)
    words = Counter()
    for t in texts:
        for w in pat.findall((t or "").lower()):
            words[w] += 1
    state = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_state = Counter()
        for syms, c in state.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] += c
        state = dict(new_state)
    return merges


def test_bpe_train_matches_pure_python(spark):
    from fxa_activity_metrics_spark.operators.textstats import bpe_train

    texts = [
        "the theme of the thesis is the theory",
        "low lower lowest slow slower",
        "aaa aaaa aa a",
        "numbers 11 111 1111 and punct !!",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = bpe_train(docs, n_merges=8)
    want = _py_bpe_train(texts, 8)
    assert got == want


def test_bpe_train_feeds_the_encoder(spark):
    """Learned merges drop the corpus token count vs. raw chars, and
    the trained-encode count matches a pure-Python encode with the
    same table."""
    from fxa_activity_metrics_spark.operators.textstats import (
        bpe_train,
        token_count_bpe_real,
    )

    texts = ["the the the theme", "lower slower the"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=6)
    assert merges, "corpus has repeated pairs to learn"
    out = {
        r.doc_id: r.n_bpe_real
        for r in token_count_bpe_real(docs, merges=merges).collect()
    }
    # "the" must have been collapsed by the learned merges:
    # doc 0 has 4 words, 14 letters; trained count must be well
    # under the raw char count and >= the word count
    assert 4 <= out[0] < 14


def test_chunk_pack_bins_respect_capacity(spark):
    """The chunk→pack composition: every bin holds ≤ capacity tokens
    (chunks are ≤ 64 ≪ 512, so no overlong-doc exception applies),
    and every chunk lands in exactly one bin."""
    import __spark_entry__ as E
    from collections import defaultdict

    rows = E.queries()["chunk_pack"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    fills = defaultdict(int)
    seen = set()
    for r in rows:
        assert 1 <= r.n_tokens <= 64
        assert r.chunk_uid not in seen
        seen.add(r.chunk_uid)
        fills[r.bin_id] += r.n_tokens
    assert max(fills.values()) <= 512


# ---------------------------------------------------------------------------
# Duplicated-substring spans / removal (Lee et al. 2021-style)
# ---------------------------------------------------------------------------

from fxa_activity_metrics_spark.operators.dedup import (  # noqa: E402
    duplicated_spans,
    substring_dedup,
)


def _span_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_planted_duplicate_found_and_merged(spark):
    # a 6-token phrase shared by two docs, different surroundings;
    # k=4 -> three overlapping dup 4-grams per doc merge to ONE span
    shared = "the quick brown fox jumps high"
    rows = [
        (1, "alpha beta " + shared + " gamma delta"),
        (2, "one two three " + shared + " four"),
    ]
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_grams"])
        for r in duplicated_spans(_span_docs(spark, rows), k=4).collect()
    }
    # doc 1: shared phrase at token positions 3..8; doc 2: 4..9
    assert got == {1: (3, 8, 3), 2: (4, 9, 3)}


def test_spans_disjoint_regions_stay_separate(spark):
    # two shared phrases separated by a > k unique gap -> two islands
    a = "aa bb cc dd"
    b = "ww xx yy zz"
    rows = [
        (1, a + " u1 u2 u3 u4 u5 " + b),
        (2, a + " v1 v2 v3 v4 v5 " + b),
    ]
    spans = duplicated_spans(_span_docs(spark, rows), k=4).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert sorted(per_doc[1]) == [(1, 4), (10, 13)]
    assert sorted(per_doc[2]) == [(1, 4), (10, 13)]


def test_spans_within_doc_repeat_counts(spark):
    # min_count counts TOTAL occurrences, so a phrase repeated inside
    # one doc is duplicated even with a single-doc corpus
    rows = [(1, "p q r s x y z p q r s")]
    spans = duplicated_spans(_span_docs(spark, rows), k=4).collect()
    assert sorted((r["span_start"], r["span_end"]) for r in spans) == [
        (1, 4),
        (8, 11),
    ]


def test_spans_short_doc_and_unique_doc_empty(spark):
    rows = [(1, "only three tokens"), (2, "totally unique words here now ok")]
    assert duplicated_spans(_span_docs(spark, rows), k=4).count() == 0


def test_substring_dedup_removes_only_the_span(spark):
    shared = "the quick brown fox jumps high"
    rows = [
        (1, "alpha beta " + shared + " gamma delta"),
        (2, "one two three " + shared + " four"),
        (3, "nothing shared in this doc at all"),
    ]
    got = {
        r["doc_id"]: r
        for r in substring_dedup(_span_docs(spark, rows), k=4).collect()
    }
    assert got[1]["clean_text"] == "alpha beta gamma delta"
    assert got[1]["n_removed"] == 6
    assert got[2]["clean_text"] == "one two three four"
    assert got[3]["clean_text"] == "nothing shared in this doc at all"
    assert got[3]["n_removed"] == 0


def test_substring_dedup_fully_duplicated_doc_empties(spark):
    rows = [(1, "a b c d e f"), (2, "a b c d e f")]
    got = {
        r["doc_id"]: r
        for r in substring_dedup(_span_docs(spark, rows), k=4).collect()
    }
    for d in (1, 2):
        assert got[d]["clean_text"] == ""
        assert got[d]["n_removed"] == 6
        assert got[d]["n_tokens"] == 6


def test_substring_dedup_min_count_threshold(spark):
    # the phrase occurs twice: min_count=3 must leave it alone
    rows = [(1, "m n o p tail"), (2, "m n o p other")]
    df = substring_dedup(_span_docs(spark, rows), k=4, min_count=3)
    assert {r["n_removed"] for r in df.collect()} == {0}


# --- bloom-filter decontamination prefilter ------------------------------


def _bloom_fixture(spark):
    from fxa_activity_metrics_spark.operators.dedup import bloom_decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 4-grams with probe
            (2, "zeta eta theta iota kappa"),       # clean
            (3, "alpha beta gamma delta unrelated tail words here"),
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon extra")],
        "doc_id long, text string",
    )
    # fallback_grams=0 forces the bloom bitset path — these tests pin
    # its superset/false-positive semantics, which the exact-join
    # fallback (the default at small probe sizes) makes vacuous.
    return (
        bloom_decontaminate(corpus, probe, n=4, m_bits=1 << 12, fallback_grams=0),
        corpus,
        probe,
    )


def test_bloom_no_false_negatives(spark):
    """Every exactly-contaminated doc must surface with n_exact equal
    to its true shared-gram count: bloom candidates are a SUPERSET of
    exact hits by construction."""
    out, _, _ = _bloom_fixture(spark)
    rows = {r["doc_id"]: r for r in out.collect()}
    # doc 1: grams "a b g d" and "b g d e" both in probe -> n_exact=2
    assert rows[1]["n_exact"] == 2
    # doc 3: only "alpha beta gamma delta" shared -> n_exact=1
    assert rows[3]["n_exact"] == 1
    for r in rows.values():
        assert r["n_bloom"] >= r["n_exact"]


def test_bloom_matches_exact_decontam_counts(spark):
    """n_exact must equal ngram_decontaminate's per-doc shared-gram
    total over the same inputs — the bloom gate may only ADD
    candidates, never change the exact answer."""
    from fxa_activity_metrics_spark.operators.dedup import ngram_decontaminate

    out, corpus, probe = _bloom_fixture(spark)
    exact = (
        ngram_decontaminate(corpus, probe, n=4)
        .groupBy("doc_id")
        .agg(F.sum("n_shared").alias("n"))
    )
    got = {r["doc_id"]: r["n_exact"] for r in out.collect()}
    want = {r["doc_id"]: r["n"] for r in exact.collect()}
    assert {k: v for k, v in got.items() if v > 0} == want


def test_bloom_tiny_filter_produces_false_positives_only(spark):
    """Squeezing m_bits forces collisions: candidates grow, exact
    stays fixed — the documented FP-only failure mode."""
    from fxa_activity_metrics_spark.operators.dedup import bloom_decontaminate

    corpus = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(1, 60)],
        "doc_id long, text string",
    )
    # enough probe grams that a 64-bit filter saturates (~70% bit
    # density -> ~1/3 of corpus grams false-positive) while 2^12 bits
    # stay sparse
    probe = spark.createDataFrame(
        [(100, " ".join(f"p{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    wide = bloom_decontaminate(corpus, probe, n=4, m_bits=1 << 12, fallback_grams=0)
    tiny = bloom_decontaminate(corpus, probe, n=4, m_bits=64, fallback_grams=0)
    assert wide.agg(F.sum("n_exact")).first()[0] in (None, 0)
    assert tiny.agg(F.sum("n_exact")).first()[0] in (None, 0)
    n_wide = wide.agg(F.sum("n_bloom")).first()[0] or 0
    n_tiny = tiny.agg(F.sum("n_bloom")).first()[0] or 0
    assert n_tiny > n_wide


def test_bloom_fallback_below_crossover_equals_exact(spark):
    """Default mode at a small probe size takes the crossover fallback:
    the prefilter IS the exact digest join — output rows are exactly
    the exactly-contaminated docs, n_bloom == n_exact everywhere, and
    the counts equal ngram_decontaminate's per-doc totals."""
    from fxa_activity_metrics_spark.operators.dedup import (
        bloom_decontaminate,
        ngram_decontaminate,
    )

    _, corpus, probe = _bloom_fixture(spark)
    out = bloom_decontaminate(corpus, probe, n=4).collect()
    assert out, "fallback mode dropped the contaminated docs"
    assert all(r["n_bloom"] == r["n_exact"] for r in out)
    want = {
        r["doc_id"]: r["n"]
        for r in ngram_decontaminate(corpus, probe, n=4)
        .groupBy("doc_id")
        .agg(F.sum("n_shared").alias("n"))
        .collect()
    }
    assert {r["doc_id"]: r["n_exact"] for r in out} == want


def test_bloom_crossover_measurement_brackets_threshold():
    """BLOOM_CROSSOVER.json (tools/bloom_crossover.py, sf0.1) must
    bracket the committed threshold: exact wins at some measured size
    below it, bloom wins at the threshold and above — the constant is
    measured, not asserted (VERDICT r10 item 5)."""
    import json
    from pathlib import Path

    from fxa_activity_metrics_spark.operators import dedup

    path = Path(__file__).resolve().parents[1] / "BLOOM_CROSSOVER.json"
    data = json.loads(path.read_text())
    assert data["threshold_constant"] == dedup.BLOOM_FALLBACK_GRAMS
    below = [r for r in data["results"]
             if r["probe_grams"] < dedup.BLOOM_FALLBACK_GRAMS]
    at_or_above = [r for r in data["results"]
                   if r["probe_grams"] >= dedup.BLOOM_FALLBACK_GRAMS]
    assert below and at_or_above, "measurement must straddle the threshold"
    assert any(not r["bloom_wins"] for r in below), (
        "exact never won below the threshold — lower it")
    assert all(r["bloom_wins"] for r in at_or_above), (
        "bloom lost at/above the threshold — raise it")


def test_bloom_fallback_threshold_is_documented_constant(spark):
    """The registry docstrings and the oracle SQL hardcode 2^20 — pin
    the module constant so a drift is caught here, not by a driver
    hash-mismatch on the CASE branch."""
    from fxa_activity_metrics_spark.operators import dedup

    assert dedup.BLOOM_FALLBACK_GRAMS == 1 << 20
    import __spark_entry__ as E

    assert "1048576" in E.oracle_sql()["bloom_decontam"]


# ---- C4-style boilerplate removal (remove_boilerplate) -------------


def _boiler(spark, rows, width=2, min_docs=2):
    from fxa_activity_metrics_spark.operators.dedup import remove_boilerplate

    got = remove_boilerplate(
        _span_docs(spark, rows), width=width, min_docs=min_docs
    ).collect()
    return {r["doc_id"]: r for r in got}


def test_boilerplate_shared_segment_removed_from_every_doc(spark):
    got = _boiler(
        spark,
        [(1, "a b C D e f"), (2, "x y C D z w"), (3, "all unique here ok")],
    )
    assert got[1]["clean_text"] == "a b e f"
    assert got[1]["n_removed"] == 1 and got[1]["n_segments"] == 3
    assert got[2]["clean_text"] == "x y z w"
    assert got[3]["clean_text"] == "all unique here ok"
    assert got[3]["n_removed"] == 0


def test_boilerplate_internal_repeat_is_not_boilerplate(spark):
    # frequency is DISTINCT-DOC frequency: a doc repeating its own
    # segment stays intact
    got = _boiler(spark, [(1, "p q p q r s"), (2, "t u v w x y")])
    assert got[1]["clean_text"] == "p q p q r s"
    assert got[1]["n_removed"] == 0


def test_boilerplate_fully_duplicated_doc_empties(spark):
    got = _boiler(spark, [(1, "a b"), (2, "a b")])
    for d in (1, 2):
        assert got[d]["clean_text"] == ""
        assert got[d]["n_removed"] == 1 and got[d]["n_segments"] == 1


def test_boilerplate_tail_segment_participates(spark):
    # trailing sub-width segments hash and match like any other
    got = _boiler(spark, [(1, "a b c"), (2, "z z c")])
    assert got[1]["clean_text"] == "a b"
    assert got[2]["clean_text"] == "z z"


def test_boilerplate_min_docs_threshold(spark):
    got = _boiler(
        spark, [(1, "a b x"), (2, "a b y"), (3, "c d z")], min_docs=3
    )
    assert got[1]["n_removed"] == 0 and got[2]["n_removed"] == 0


def test_boilerplate_empty_and_whitespace_docs(spark):
    # Zero-length / whitespace-only docs produce NO segment rows; both
    # the operator and the DuckDB oracle (anchored on `documents` with
    # coalesce) must keep them as (doc_id, 0, 0, '') — the VERDICT r9
    # item-6 parity pin, exercised against the registry oracle too
    # (tools/oracle_type_parity + a direct replay here).
    import duckdb
    import pandas as pd

    import __spark_entry__ as E

    rows = [
        (1, "a b c d e f g h tail one"),
        (2, "a b c d e f g h tail two"),
        (3, ""),
        (4, "   "),
    ]
    got = _boiler(spark, rows, width=8, min_docs=2)
    for d in (3, 4):
        assert got[d]["n_segments"] == 0
        assert got[d]["n_removed"] == 0
        assert got[d]["clean_text"] == ""

    pdf = pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM pdf")
    oracle = sorted(
        con.execute(E.oracle_sql()["boilerplate_removal"]).fetchall()
    )
    con.close()
    spark_rows = sorted(
        (r["doc_id"], r["n_segments"], r["n_removed"], r["clean_text"])
        for r in got.values()
    )
    assert oracle == spark_rows


# ---- deterministic weighted reservoir sampling (A-ES) --------------


def _wrs(spark, rows, k, **kw):
    from fxa_activity_metrics_spark.operators.assembly import weighted_sample

    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    return weighted_sample(df, k=k, **kw)


def test_weighted_sample_matches_pure_python_twin(spark):
    import hashlib
    import math

    rows = [(i, (i * 37) % 900 + 1) for i in range(200)]
    got = {r["doc_id"]: r for r in _wrs(spark, rows, k=20).collect()}

    def prio(i, w):
        h = int(hashlib.md5(f"fxa-wrs:{i}".encode()).hexdigest()[:15], 16)
        key = 41_588_831 - round(math.log(h + 1) * 1e6)
        return (key * 1_000_000) // w

    expect = sorted(((prio(i, w), i, w) for i, w in rows))[:20]
    assert sorted(got) == sorted(i for _, i, _ in expect)
    for p, i, w in expect:
        assert got[i]["priority"] == p and got[i]["weight"] == w


def test_weighted_sample_partitioning_invariant(spark):
    rows = [(i, i % 50 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    from fxa_activity_metrics_spark.operators.assembly import weighted_sample

    a = sorted(weighted_sample(df.repartition(1), k=25).collect())
    b = sorted(weighted_sample(df.repartition(7), k=25).collect())
    c = sorted(weighted_sample(df.repartition(32), k=25, n_salts=5).collect())
    assert a == b == c


def test_weighted_sample_heavy_item_wins(spark):
    # k=1 over one weight-100000 item among 99 weight-1 items: the
    # heavy item's key is ~1e5 smaller in expectation; pinned for
    # this seed
    rows = [(i, 1) for i in range(99)] + [(999, 100_000)]
    got = _wrs(spark, rows, k=1).collect()
    assert [r["doc_id"] for r in got] == [999]


def test_weighted_sample_nonpositive_weights_excluded(spark):
    rows = [(1, 0), (2, -5), (3, 10), (4, 10)]
    got = _wrs(spark, rows, k=4).collect()
    assert sorted(r["doc_id"] for r in got) == [3, 4]


# ---- edit-distance verify / source overlap / novelty ---------------


def test_editdist_exact_dup_passes_unrelated_absent(spark):
    from fxa_activity_metrics_spark.operators.dedup import neardup_editdist

    dup = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, dup), (2, dup), (3, "completely different content with nothing shared here at all")],
        "doc_id long, text string",
    )
    got = neardup_editdist(docs).collect()
    assert [(r["id_a"], r["id_b"], r["edit_dist"]) for r in got] == [(1, 2, 0)]
    assert got[0]["len_a"] == len(dup)


def test_editdist_gate_filters_far_candidates(spark):
    from fxa_activity_metrics_spark.operators.dedup import neardup_editdist

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    far = base + " " + "x" * 60  # shares all base shingles; >30% longer
    docs = spark.createDataFrame(
        [(1, base), (2, far)], "doc_id long, text string"
    )
    strict = neardup_editdist(docs, max_pct=30).collect()
    loose = neardup_editdist(docs, max_pct=100).collect()
    assert strict == []  # candidate found but gate rejects
    assert [(r["id_a"], r["id_b"]) for r in loose] == [(1, 2)]


def test_source_overlap_counts_and_orders_pairs(spark):
    from fxa_activity_metrics_spark.operators.dedup import source_overlap

    dup = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, dup, "zsrc"), (2, dup, "asrc"), (3, dup, "asrc")],
        "doc_id long, text string, source string",
    )
    got = {(r["source_a"], r["source_b"]): r["n_pairs"] for r in source_overlap(docs).collect()}
    # pairs: (1,2) cross, (1,3) cross, (2,3) within asrc
    assert got == {("asrc", "zsrc"): 2, ("asrc", "asrc"): 1}


def test_novelty_counts_shared_grams(spark):
    from fxa_activity_metrics_spark.operators.textstats import novelty_score

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x b c d"), (3, "q r")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in novelty_score(docs, n=3).collect()}
    assert got[1]["n_grams"] == 2 and got[1]["n_shared"] == 1
    assert got[1]["novelty_micro"] == 500_000
    assert got[2]["n_grams"] == 2 and got[2]["n_shared"] == 1
    assert got[3]["n_grams"] == 0 and got[3]["novelty_micro"] is None


def test_bpe_train_capped_sample_is_deterministic(spark):
    """max_train_docs gates the training corpus through the P6 md5
    cohort — the capped run must reproduce, exactly, a pure-Python
    train over the SAME deterministically-selected doc subset
    (VERDICT r8 item 7), at sf0.01 scale; and a cap >= corpus size is
    the identity."""
    import hashlib

    from fxa_activity_metrics_spark.operators.textstats import bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    total = docs.count()
    cap = total // 4
    keep = -(-cap * 10000 // total)  # ceil — mirror the operator

    rows = docs.select("doc_id", "text").collect()
    sampled = [
        r.text
        for r in rows
        if int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:7], 16) % 10000
        < keep
    ]
    assert 0 < len(sampled) < total

    got = bpe_train(docs, n_merges=5, max_train_docs=cap)
    want = _py_bpe_train(sampled, 5)
    assert got == want

    # run twice: same merges (deterministic, not sample()-dependent)
    assert bpe_train(docs, n_merges=5, max_train_docs=cap) == got


def test_bpe_train_cap_noop_when_corpus_small(spark):
    from fxa_activity_metrics_spark.operators.textstats import bpe_train

    texts = ["the theme of the thesis", "low lower lowest"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    assert bpe_train(docs, n_merges=4, max_train_docs=100) == bpe_train(
        docs, n_merges=4
    )
