"""Dataset-assembly operators: the steps that turn a curated corpus
into training-ready data — fixed-window chunking, deterministic
train/val/test splits, temperature-based source mixing, sharded
training-order shuffling, and a linear quality-gate classifier.

Design rules shared by every operator here:

- deterministic: every random-looking decision (split, sample, order)
  is an md5-derived hash of the row id, so re-runs and re-shards are
  reproducible and the DuckDB oracle computes the identical result;
- bit-exact oracles: float thresholds are built only from IEEE
  correctly-rounded ops (+ - * / sqrt) over exact integers, never
  pow/exp/log whose last-ulp varies across libm builds;
- scale-shaped: chunking/splitting/classifying are per-row
  projections (zero shuffle — cost at 100 TB is one scan); mixture
  needs one tiny per-source aggregate broadcast back; shard-shuffle
  is one exchange on the shard key with per-shard local sorts (never
  a global total order).

Reference parity: the deterministic-cohort machinery extends the
reference's 7-hex sampling rule (import_events.py:114) from "keep a
cohort" to splits/mixtures/orderings; the reference itself has no
dataset-assembly surface, so these are the LLM-pipeline extension
ops the brief calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.functions.core import hex_to_long
from fxa_activity_metrics_spark.operators.dedup import tokens
from fxa_activity_metrics_spark.operators.textstats import text_stats

from fxa_activity_metrics_spark import cacheutil


def _hash_bucket(id_col: F.Column, mod: int, salt: str = "") -> F.Column:
    """Deterministic bucket in [0, mod) from md5 of the row id.

    The engine's 7-hex rule (functions/core.py:41, the reference's
    P6 sampling trap) applied to an md5 of the id — 7 hex chars
    (28 bits) so the conv() stays far inside BIGINT, salted so
    independent decisions (split vs. sample vs. order) decorrelate.
    """
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return hex_to_long(F.substring(h, 1, 7)) % mod


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    stride: int = 48,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Split each document's token stream into fixed-length training
    windows with overlap (stride < chunk_size ⇒ consecutive chunks
    share chunk_size - stride tokens).

    Chunk count is exact-integer:
    1 + min(ceil((n - chunk_size)/stride), floor((n - 1)/stride))
    when n > chunk_size else 1 — the last chunk reaches the end of
    the document and no start ever falls past the last token (the
    floor term clamps the gapped-sampling regime stride > chunk_size,
    where the ceil alone would emit a phantom empty chunk). Empty
    documents produce no chunks.

    Scale: a per-row generate + explode — no shuffle, no window; at
    100 TB this is one scan whose output is ~n/stride rows per doc.
    The token array is materialized once per row (not per chunk) and
    sliced per start offset JVM-side.

    Output: (id, chunk_id, chunk_text, n_chunk_tokens[, extra_cols])
    — ``extra_cols`` are input columns replicated onto every chunk
    (carried through the explode, no join).
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    passthrough = list(extra_cols or [])
    reserved = {
        "toks", "n", "n_chunks", "chunk_id", "start",
        "chunk_text", "n_chunk_tokens", id_col,
    }
    clash = reserved.intersection(passthrough)
    if clash:
        raise ValueError(
            f"extra_cols collide with internal columns: {sorted(clash)}"
        )
    toks = tokens(text_col)
    base = (
        docs.select(
            F.col(id_col), toks.alias("toks"), *[F.col(c) for c in passthrough]
        )
        .withColumn("n", F.size("toks"))
        .where(F.col("n") > 0)
    )
    # integer ceil-div, clamped so no start exceeds n-1: exact at any
    # doc length (no float floor); both operands are non-negative so
    # truncating and flooring integer division agree
    extra = F.when(
        F.col("n") > chunk_size,
        F.least(
            F.expr(f"(n - {chunk_size} + {stride - 1}) div {stride}"),
            F.expr(f"(n - 1) div {stride}"),
        ),
    ).otherwise(F.lit(0))
    e = base.withColumn("n_chunks", (F.lit(1) + extra).cast("int")).select(
        F.col(id_col),
        F.col("toks"),
        F.col("n"),
        *[F.col(c) for c in passthrough],
        F.posexplode(
            F.sequence(
                F.lit(0), (F.col("n_chunks") - 1) * stride, F.lit(stride)
            )
        ).alias("chunk_id", "start"),
    )
    return e.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.array_join(
            F.slice("toks", F.col("start") + 1, F.lit(chunk_size)), " "
        ).alias("chunk_text"),
        F.least(F.lit(chunk_size), F.col("n") - F.col("start"))
        .cast("int")
        .alias("n_chunk_tokens"),
        *[F.col(c) for c in passthrough],
    )


# cumulative split thresholds in ten-thousandths of the id space:
# [0, 9000) train, [9000, 9500) val, [9500, 10000) test
SPLIT_THRESHOLDS: tuple[tuple[str, int], ...] = (
    ("train", 9000),
    ("val", 9500),
    ("test", 10000),
)


def split_col(
    id_col: F.Column | str,
    thresholds: tuple[tuple[str, int], ...] = SPLIT_THRESHOLDS,
    salt: str = "split",
) -> F.Column:
    """The split-assignment expression alone (per-row, join-free) —
    for callers that want to tag a frame in place (e.g. the streaming
    training-chunks pipeline) rather than produce an assignment
    table."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = _hash_bucket(c, 10_000, salt=salt)
    assign = F.lit(thresholds[-1][0])
    for name, upper in reversed(thresholds[:-1]):
        assign = F.when(bucket < upper, F.lit(name)).otherwise(assign)
    return assign


def train_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    thresholds: tuple[tuple[str, int], ...] = SPLIT_THRESHOLDS,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by md5 id bucket.

    Hash-based, NOT randomSplit: the assignment is a pure function of
    the id, so it is stable across runs, engines, repartitions, and
    incremental corpus growth (a doc never migrates between splits
    when new data arrives — the property randomSplit loses the moment
    the input partitioning changes). Cohort containment also holds:
    shrinking train from 90% to 80% keeps the 80% a subset.

    Per-row projection: zero shuffle, one scan at any scale.

    Output: (id, split_bucket, split).
    """
    bucket = _hash_bucket(F.col(id_col), 10_000, salt=salt)
    return docs.select(
        F.col(id_col),
        bucket.cast("long").alias("split_bucket"),
        split_col(id_col, thresholds=thresholds, salt=salt).alias("split"),
    )


def split_leakage(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    thresholds: tuple[tuple[str, int], ...] = SPLIT_THRESHOLDS,
    salt: str = "split",
) -> DataFrame:
    """Cross-split near-duplicate leakage: eval (val/test) documents
    that have a near-duplicate in train — the contamination a
    hash-based split cannot prevent (the split is independent per id,
    so near-identical docs land in different splits at the base
    rate), and the reason eval numbers go soft on duplicated corpora
    (Lee et al. 2021 §6.2). Run it after dedup/split and either drop
    the flagged eval docs or re-home them to train.

    ZERO corpus joins: the split assignment is a pure md5 function of
    the id (train_split's contract), so both sides of every candidate
    pair are classified inside the pair scan — the only plan is one
    union of the two pair orientations and one aggregate. At 100 TB
    the candidate pair table (already persisted/bucketed by the LSH
    build) is the ONLY input touched.

    ``thresholds[0]`` must be the train band (train_split's
    convention). Output: (doc_id, split, n_train_dups,
    min_train_dup) — one row per leaked NON-train doc, counting its
    distinct train-side near-duplicates.
    """
    train_name, train_upper = thresholds[0]
    ori = pairs.select(
        F.col(id_a).alias("eid"), F.col(id_b).alias("tid")
    ).unionByName(
        pairs.select(F.col(id_b).alias("eid"), F.col(id_a).alias("tid"))
    )
    eb = _hash_bucket(F.col("eid"), 10_000, salt=salt)
    tb = _hash_bucket(F.col("tid"), 10_000, salt=salt)
    return (
        ori.filter((eb >= train_upper) & (tb < train_upper))
        .withColumn("split", split_col(F.col("eid"), thresholds, salt))
        .groupBy(F.col("eid").alias("doc_id"), F.col("split"))
        .agg(
            F.count(F.lit(1)).alias("n_train_dups"),
            F.min("tid").alias("min_train_dup"),
        )
    )


def split_decontam(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    policy: str = "drop",
    thresholds: tuple[tuple[str, int], ...] = SPLIT_THRESHOLDS,
    salt: str = "split",
    broadcast_leaked: bool = True,
) -> DataFrame:
    """Decontaminated split assignment — the actionable twin of the
    ``split_leakage`` audit. Assigns every document its hash split,
    flags the eval (val/test) docs that have a train-side
    near-duplicate among the candidate ``pairs``, and resolves them
    per ``policy``: ``"drop"`` marks the leaked eval doc's
    ``final_split`` as ``'dropped'`` (keep eval clean, lose the doc);
    ``"rehome"`` moves it to the train band (keep the doc, shrink
    eval). Train-side docs are never touched — the contamination is
    the EVAL doc's problem (its score is inflated by a train twin),
    so the fix is applied on the eval side only (Lee et al. 2021
    §6.2's mitigation).

    Plan shape: the leaked set is derived entirely inside the
    (persisted, bucketed) pair-table scan — one orientation union,
    one cross-split filter on pure md5 id expressions, one aggregate
    — then LEFT-joined onto the corpus's per-row split projection.
    The leaked side is bounded by the eval fraction times the leakage
    base rate (tiny vs the corpus), so it broadcasts by default; pass
    ``broadcast_leaked=False`` on a pathologically duplicated corpus
    and let AQE pick the strategy. The corpus itself is scanned once
    and never shuffled.

    Output: (id, split, n_train_dups, final_split) — one row per doc;
    ``n_train_dups`` is 0 for clean docs.
    """
    if policy not in ("drop", "rehome"):
        raise ValueError(f"split_decontam: unknown policy {policy!r}")
    train_name, train_upper = thresholds[0]
    ori = pairs.select(
        F.col(id_a).alias("eid"), F.col(id_b).alias("tid")
    ).unionByName(
        pairs.select(F.col(id_b).alias("eid"), F.col(id_a).alias("tid"))
    )
    eb = _hash_bucket(F.col("eid"), 10_000, salt=salt)
    tb = _hash_bucket(F.col("tid"), 10_000, salt=salt)
    leaked = (
        ori.filter((eb >= train_upper) & (tb < train_upper))
        .groupBy("eid")
        .agg(F.count(F.lit(1)).alias("n_train_dups"))
    )
    if broadcast_leaked:
        leaked = F.broadcast(leaked)
    assigned = docs.select(
        F.col(id_col),
        split_col(id_col, thresholds=thresholds, salt=salt).alias("split"),
    )
    resolved = F.lit("dropped") if policy == "drop" else F.lit(train_name)
    return assigned.join(
        leaked, assigned[id_col] == leaked["eid"], "left"
    ).select(
        F.col(id_col),
        F.col("split"),
        F.coalesce(F.col("n_train_dups"), F.lit(0))
        .cast("bigint")
        .alias("n_train_dups"),
        F.when(F.col("eid").isNotNull(), resolved)
        .otherwise(F.col("split"))
        .alias("final_split"),
    )


def source_mixture(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    sample_frac: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based source mixing (alpha = 0.5): sample the
    corpus down to ~sample_frac of its rows with per-source rates
    proportional to sqrt(count) — the standard multi-source LLM
    recipe that up-weights small sources and damps head sources
    (multilingual-BERT / T5-style exponent 0.5).

    Exactness: the rate is built ONLY from correctly-rounded IEEE ops
    over exact integers — per-source weight w = round(sqrt(c)·1e6) as
    BIGINT (sqrt is correctly rounded; the integer sum W is
    order-independent), then rate = min(1, w/W · (frac·N)/c) — so the
    DuckDB oracle reproduces it bit-for-bit; no pow(), whose last ulp
    is libm-specific. The keep decision compares the id's md5
    ten-thousandths bucket against the rate.

    Scale: one map-side-combining aggregate over the source key
    (output rows = #sources, i.e. tiny), rates broadcast-joined back;
    the corpus itself never shuffles.

    Output: (id, source, n_source_docs, mix_rate, keep).
    """
    stats = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("c"))
    stats = stats.withColumn(
        "w", F.round(F.sqrt(F.col("c").cast("double")) * 1e6).cast("bigint")
    )
    # materialize the per-source stats ONCE (rows = #sources, tiny):
    # both the totals agg and the rate join reuse it, so the corpus
    # is scanned twice total (stats + tagging), not three times.
    # A tracked lazy persist (not a lazy localCheckpoint): same
    # laziness — plan construction triggers no corpus scan — but the
    # blocks are releasable by the caller; a lazy checkpoint's blocks
    # sit outside the CacheManager until the JVM ContextCleaner
    # notices (the one residue source the registry-wide
    # test_cache_residue sweep caught).
    stats = cacheutil.track(stats.persist())
    totals = stats.agg(
        F.sum("w").alias("w_total"), F.sum("c").alias("n_total")
    )
    rates = stats.crossJoin(F.broadcast(totals)).select(
        F.col(source_col),
        F.col("c").alias("n_source_docs"),
        F.least(
            F.lit(1.0),
            F.col("w").cast("double")
            / F.col("w_total").cast("double")
            * (sample_frac * F.col("n_total").cast("double"))
            / F.col("c").cast("double"),
        ).alias("mix_rate"),
    )
    bucket = _hash_bucket(F.col(id_col), 10_000, salt=salt)
    return (
        docs.select(F.col(id_col), F.col(source_col))
        .join(F.broadcast(rates), on=source_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col("n_source_docs"),
            F.col("mix_rate"),
            (bucket.cast("double") / 10_000.0 < F.col("mix_rate")).alias(
                "keep"
            ),
        )
    )


def shard_key_cols(
    id_col: str, n_shards: int, seed: str
) -> tuple[F.Column, F.Column]:
    """THE single definition of the md5 shard scheme — (shard,
    order_key) from md5(seed + ':' + id) — shared by shard_shuffle,
    curriculum_order, and write_training_shards so 'same seed ⇒ same
    layout' holds across operators by construction."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    shard = (hex_to_long(F.substring(h, 1, 7)) % n_shards).cast("int")
    return shard, F.substring(h, 8, 25)


def shard_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic global training-order shuffle without a global
    sort: md5(seed, id) assigns each row a shard (hash % n_shards)
    and an order key (the remaining digest hex); position is the
    row's rank within its shard under that key.

    This is how you shuffle 100 TB for training: a single exchange on
    the shard key plus per-shard local sorts that run in parallel —
    never a total order (one straggler partition) and never a
    driver-side permutation. Changing `seed` re-shuffles every epoch
    reproducibly; a fixed seed makes order stable across reruns for
    checkpoint-resume.

    Output: (id, shard, position) — position is 1-based within shard.
    """
    shard, order_key = shard_key_cols(id_col, n_shards, seed)
    w = Window.partitionBy("shard").orderBy("order_key", id_col)
    return (
        docs.select(
            F.col(id_col), shard.alias("shard"), order_key.alias("order_key")
        )
        .withColumn("position", F.row_number().over(w))
        .select(id_col, "shard", "position")
    )


# quality-gate linear model: hand-set INTEGER weights over the
# text_stats features; frozen literals so the classifier is a pure
# projection (a trained model would ship its coefficients the same
# way). Integer weights keep the logit within float error of an
# exact 6-decimal value (the features are 6dp-rounded), so no
# downstream rounding ever lands on a half-way tie.
QUALITY_WEIGHTS: dict[str, int] = {
    "bias": -1,
    "len_score": 2,  # saturating length feature, see below
    "punct_ratio": -3,
    "stopword_ratio": 2,
    "uniq_token_ratio": 1,
}


def quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Linear quality-gate classifier over text_stats features with a
    hard-sigmoid link, evaluated in FIXED POINT:
    z = w·(len_score, punct_ratio, stopword_ratio, uniq_ratio) + b,
    score = clip(0.25·z + 0.5, 0, 1) computed in integer micro-units.

    Cross-engine reproducibility is the design driver. A logistic
    link (exp) differs in the last ulp across libm builds, and even a
    piecewise-linear sigmoid evaluated in doubles creates exact
    decimal half-way ties (0.25 of a 6-decimal value has 8 decimals)
    where Spark's HALF_UP and DuckDB's float rounding disagree. So:
    integer weights keep z within float error of a 6-decimal value;
    z_micro = round(z·1e6) snaps it to an exact BIGINT (never near a
    tie); the sigmoid is integer arithmetic — clip z_micro+2e6 into
    [0, 4e6] FIRST, then divide by 4 (so the truncating/flooring
    integer-div dialects agree: the operand is never negative).
    score = score_micro/1e6 is then one correctly-rounded division in
    both engines. Semantics match a fasttext-style linear gate.

    Per-row projection over one scan — the same single-pass shape as
    text_stats (whose rounded features it consumes, so engine and
    oracle see identical inputs).
    Output: (id, logit, score_micro, score, label[, extra_cols]) —
    ``extra_cols`` are input columns carried through both projections
    (no join, same single scan).
    """
    w = QUALITY_WEIGHTS
    passthrough = list(extra_cols or [])
    reserved = {
        "zv", "z_micro", "logit", "score_micro", "score", "label", id_col,
        # text_stats output columns the classifier projects over
        "n_chars", "n_tokens", "avg_token_len", "punct_ratio",
        "stopword_ratio", "uniq_token_ratio", "quality_score",
    }
    clash = reserved.intersection(passthrough)
    if clash:
        raise ValueError(
            f"extra_cols collide with internal columns: {sorted(clash)}"
        )
    feats = text_stats(
        docs,
        id_col=id_col,
        text_col=text_col,
        extra=[F.col(c) for c in passthrough],
    )
    len_score = F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
    z = (
        F.lit(float(w["bias"]))
        + F.lit(float(w["len_score"])) * len_score
        + F.lit(float(w["punct_ratio"])) * F.col("punct_ratio")
        + F.lit(float(w["stopword_ratio"])) * F.col("stopword_ratio")
        + F.lit(float(w["uniq_token_ratio"])) * F.col("uniq_token_ratio")
    )
    z_micro = F.round(z * 1e6).cast("bigint")
    score_micro = F.expr(
        "greatest(0L, least(4000000L, z_micro + 2000000L)) div 4L"
    )
    return feats.select(
        F.col(id_col),
        z.alias("zv"),
        z_micro.alias("z_micro"),
        *[F.col(c) for c in passthrough],
    ).select(
        F.col(id_col),
        F.round(F.col("zv"), 6).alias("logit"),
        score_micro.alias("score_micro"),
        (score_micro.cast("double") / 1_000_000.0).alias("score"),
        (score_micro >= 500_000).alias("label"),
        *[F.col(c) for c in passthrough],
    )


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_mod: int = 20,
    min_score_micro: int = 500_000,
    ngram_n: int = 4,
) -> DataFrame:
    """End-to-end corpus cleaning — the decontamination counterpart
    of the training-manifest composition: fixed-point quality gate →
    exact-dedup keepers among survivors → drop anything sharing a
    word n-gram with the benchmark slice (id % probe_mod == 0).

    Plan shape: the quality gate is an INLINE filter (the classifier
    is a per-row projection over these same rows — joining a derived
    id-list back would be a corpus-sized SortMergeJoin for nothing),
    the dedup keeper is a window-min over the content hash (one
    exchange, no groupBy + re-join), and the decontam anti-join's
    probe side broadcasts — no big-big join anywhere.

    Output: (id, content_hash) — the documents safe to train on.
    """
    from fxa_activity_metrics_spark.operators.dedup import (
        ngram_decontaminate,
    )

    corpus = docs.filter(F.col(id_col) % probe_mod != 0)
    probe = docs.filter(F.col(id_col) % probe_mod == 0)
    gated = quality_classifier(
        corpus, id_col=id_col, text_col=text_col, extra_cols=[text_col]
    ).filter(F.col("score_micro") >= min_score_micro)
    contaminated = (
        ngram_decontaminate(
            corpus,
            probe,
            n=ngram_n,
            id_col=id_col,
            text_col=text_col,
            probe_id_col=id_col,
            probe_text_col=text_col,
        )
        .select(id_col)
        .distinct()
    )
    w = Window.partitionBy("content_hash")
    return (
        gated.select(F.col(id_col), F.md5(text_col).alias("content_hash"))
        .withColumn("keeper_id", F.min(id_col).over(w))
        .filter(F.col("keeper_id") == F.col(id_col))
        .join(contaminated, id_col, "left_anti")
        .select(id_col, "content_hash")
    )


def curriculum_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    seed: str = "epoch0",
) -> DataFrame:
    """Curriculum training order: like shard_shuffle, but within each
    shard documents are ordered best-quality-first (descending
    quality band from the text_stats score), with the md5 order key
    breaking ties INSIDE a band — so training sees high-quality data
    early in every shard while staying shuffled within each quality
    tier. The standard curriculum/anti-curriculum knob expressed as a
    deterministic sort key.

    Same scale shape as shard_shuffle: ONE exchange on the shard key
    and per-shard local sorts — the quality band is a per-row
    projection, never a global quantile sort.

    Output: (id, shard, quality_band, position) — position 1-based
    within shard, band 4 (best) first.
    """
    feats = text_stats(docs, id_col=id_col, text_col=text_col)
    band = F.least(F.floor(F.col("quality_score") * 5), F.lit(4)).cast("int")
    shard, order_key = shard_key_cols(id_col, n_shards, seed)
    keyed = feats.select(
        F.col(id_col),
        shard.alias("shard"),
        band.alias("quality_band"),
        order_key.alias("order_key"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("quality_band").desc(), F.col("order_key"), F.col(id_col)
    )
    return keyed.withColumn("position", F.row_number().over(w)).select(
        id_col, "shard", "quality_band", "position"
    )


def global_rank(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rank",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global row_number over a TOTAL order — the
    scale-correct form of ``row_number() OVER (ORDER BY ...)``, which
    as a bare window collapses to a single task.

    Classic three-step distributed rank: range-repartition on the
    order keys (eagerly materialized so the boundary sample is
    computed once), count rows per range partition (one lightweight
    job; nparts rows collected — metadata-scale), then rank = within-
    partition row_number + the preceding partitions' total, applied
    as a broadcast map literal. Partition-parallel end to end; the
    global sort is the one range exchange.

    ``order_cols`` MUST define a total order (append a unique id as
    the last key): with ties, range boundaries could split a tie
    group across partitions and make the rank assignment
    partition-dependent. ``total_col`` optionally attaches the total
    row count as a literal column (known driver-side for free —
    saves callers a count job).
    """
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = df.repartitionByRange(nparts, *order_cols).transform(cacheutil.local_checkpoint)
    sizes = {
        r["_pid"]: r["n"]
        for r in part.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(sizes.values())
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    if offsets:
        off_map = F.create_map(
            *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
        )
        off = F.coalesce(off_map[F.col("_pid")], F.lit(0))
    else:
        off = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        part.withColumn("_pid", F.spark_partition_id())
        .withColumn(out_col, (F.row_number().over(w) + off).cast("long"))
        .drop("_pid")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(total).cast("long"))
    return out


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    order_within_shard: bool = True,
) -> None:
    """The pipeline's last mile: land a training-ready frame as
    shard-partitioned JSONL (`shard=K/part-*.json`) — the hand-off
    format a training job's data loader consumes, one directory per
    shard so loader workers each own a file set.

    Sharding and in-shard order reuse shard_shuffle's deterministic
    md5 scheme, so the written layout is reproducible across runs
    and engines: same seed → byte-stable shard membership and row
    order (order is applied via repartition + sortWithinPartitions —
    partition-local sorts, never a global order).

    At 100 TB: one exchange on the shard key; each shard writes in
    parallel. Re-running overwrites in place (idempotent export).
    """
    clash = {"shard", "_ord"}.intersection(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with export internals: {sorted(clash)}"
        )
    shard, order_key = shard_key_cols(id_col, n_shards, seed)
    keyed = df.withColumn("shard", shard).withColumn("_ord", order_key)
    keyed = keyed.repartition(n_shards, "shard")
    if order_within_shard:
        keyed = keyed.sortWithinPartitions("shard", "_ord", id_col)
    (
        keyed.drop("_ord")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(out_dir)
    )


# ln(2^60) in micro-nats: the -ln(u) offset for 60-bit hash draws
# (u = (h+1)/2^60). Shared verbatim by the DuckDB oracle.
_LN_2_60_MICRO = 41_588_831


def weighted_sample(
    docs: DataFrame,
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "fxa-wrs",
    n_salts: int = 32,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, algorithm A-ES): item i draws
    u_i = (h_i + 1) / 2^60 from the first 15 hex chars of
    md5(seed:id) and wins a reservoir slot iff its key
    -ln(u_i) / w_i is among the k smallest — inclusion probability
    rises with the integer weight, and the selected SET is exactly
    the A-ES reservoir for these u draws. Re-runs, re-partitions,
    and the DuckDB oracle all select the identical set.

    Integer keys (the LM-family micro-nat trick, one deliberate
    departure from this module's no-log rule — documented because
    the quantized key feeds a TOP-K, so a last-ulp ln flip at a .5
    rounding boundary would swap a selection; 60-bit inputs make
    that measure-zero in practice and the oracle replays the same
    rounding):

        priority = (ln(2^60)·1e6 − round(ln(h+1)·1e6)) · 1e6 div w

    All BIGINT; non-negative (h+1 ≤ 2^60), so DuckDB's flooring //
    and Spark's truncating div agree. Ties (same priority) break on
    the id.

    Distributed top-k with no global sort (the KMV two-level rank):
    bottom-k within each of n_salts hash-salt groups prunes to
    ≤ n_salts·k candidates, and only that bounded set meets the
    final single-task rank. Rows with weight < 1 are excluded (a
    zero/negative weight has no A-ES key).

    Output: (doc_id, weight, priority) — the k selected rows.
    """
    h = hex_to_long(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
            1,
            15,
        )
    )
    scored = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(weight_col).cast("bigint").alias("weight"),
            h.alias("_h"),
        )
        .filter(F.col("weight") >= 1)
        .select(
            "doc_id",
            "weight",
            F.expr(
                f"({_LN_2_60_MICRO}L - cast(round(ln(_h + 1) * 1000000) as bigint))"
                " * 1000000L div weight"
            ).alias("priority"),
        )
    )
    salted = scored.withColumn(
        "_s", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts))
    )
    w_local = Window.partitionBy("_s").orderBy("priority", "doc_id")
    w_glob = Window.partitionBy().orderBy("priority", "doc_id")
    return (
        salted.withColumn("_rl", F.row_number().over(w_local))
        .filter(F.col("_rl") <= k)
        .withColumn("_r", F.row_number().over(w_glob))
        .filter(F.col("_r") <= k)
        .select("doc_id", "weight", "priority")
    )
