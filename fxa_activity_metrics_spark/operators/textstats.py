"""Text analysis operators: quality scoring, language ID, token
counting, fingerprinting.

All built-in Spark SQL expressions over the token array — JVM-side,
one pass over the text column, no shuffle (per-row projections), so
the cost at 100 TB is exactly one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fxa_activity_metrics_spark.operators.dedup import tokens

from fxa_activity_metrics_spark import cacheutil

# tiny function-word profiles for the n-gram/stopword language
# heuristic; deliberately small and deterministic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "que"),
    "es": ("el", "la", "los", "y", "es", "una", "que"),
}

STOPWORDS = LANG_PROFILES["en"]


def text_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra: list[F.Column] | None = None,
) -> DataFrame:
    """Per-document quality stats:

    n_chars, n_tokens, avg_token_len, punct_ratio (non-alnum,
    non-space chars / chars), stopword_ratio, uniq_token_ratio, and a
    composite quality_score in [0,1] (simple monotone blend — long
    enough, not too punctuation-heavy, some stopwords, lexical
    variety).

    ``extra``: additional columns evaluated in the SAME projection
    (passthroughs or other per-row expressions over the input) — lets
    callers enrich without a join, keeping one scan and no dup-key
    fan-out.
    """
    toks = tokens(text_col)
    n_chars = F.length(text_col)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", ""))
    uniq = F.size(F.array_distinct(toks))
    avg_len = F.when(
        n_tokens > 0,
        (n_chars - (n_tokens - 1)).cast("double") / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        uniq > 0, n_stop.cast("double") / uniq.cast("double")
    ).otherwise(F.lit(0.0))
    uniq_ratio = F.when(
        n_tokens > 0, uniq.cast("double") / n_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.2
        + uniq_ratio * 0.2
    )
    return docs.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("uniq_token_ratio"),
        F.round(quality, 6).alias("quality_score"),
        *(extra or []),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count function-word hits per language
    profile over distinct tokens; highest hit-count wins (ties broken
    by language code order); zero hits everywhere → 'und'.
    """
    toks = F.array_distinct(tokens(text_col))
    langs = sorted(LANG_PROFILES)
    hit_cols = [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_PROFILES[lang]]))
        ).alias(f"hits_{lang}")
        for lang in langs
    ]
    scored = docs.select(F.col(id_col), *hit_cols)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    # earliest language (alphabetical) with the max hit count wins ties
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        id_col, *[f"hits_{lang}" for lang in langs], pred.alias("lang_pred")
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the normalized token stream
    (lowercased, whitespace-collapsed) + a 32-bit integer bucket of it
    — a content-defined key robust to whitespace/case jitter."""
    norm = F.concat_ws(" ", F.transform(tokens(text_col), F.lower))
    fp = F.md5(norm)
    return docs.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 8), 16, 10).cast("long").alias("fp_bucket32"),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
# marks — the usual pre-split BPE vocabularies are trained over.
# Escape-free so the Java-regex (Spark) and RE2 (DuckDB oracle)
# readings are identical.
BPE_SPLIT_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_modes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token counts under both tokenizers: whitespace
    words and BPE-ish regex pieces, plus their ratio (a cheap
    tokens-per-word estimator for LLM-budget accounting). One scan,
    no shuffle."""
    n_ws = F.size(tokens(text_col))
    n_bpe = F.regexp_count(F.col(text_col), F.lit(BPE_SPLIT_PATTERN))
    return docs.select(
        F.col(id_col),
        n_ws.cast("long").alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        F.round(
            F.when(n_ws > 0, n_bpe.cast("double") / n_ws.cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("pieces_per_word"),
    )


# Deterministic BPE merge table, rank-ordered (rank = list index).
# A REAL byte-pair-encoding vocabulary in miniature: each entry
# merges an adjacent token pair, later entries may reference tokens
# earlier merges create ("th"+"e", "ti"+"on"). Shipped as a literal
# to both the Arrow kernel and the SQL oracle, which replays the
# identical greedy algorithm — so the per-document counts are
# hash-comparable across engines. Production swaps this literal for
# a learned vocabulary (e.g. a GPT-2 merges.txt) broadcast the same
# way; the algorithm below is the standard one.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("i", "n"), ("a", "n"), ("r", "e"), ("o", "n"),
    ("e", "r"), ("th", "e"), ("e", "s"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("a", "l"), ("s", "t"), ("a", "r"), ("in", "g"),
    ("i", "s"), ("o", "u"), ("i", "t"), ("l", "e"), ("e", "d"),
    ("an", "d"), ("t", "o"), ("c", "h"), ("r", "o"), ("o", "f"),
    ("e", "l"), ("l", "l"), ("b", "e"), ("m", "e"), ("w", "h"),
    ("v", "e"), ("s", "e"), ("c", "o"), ("d", "e"), ("u", "r"),
    ("h", "a"), ("h", "e"), ("u", "s"), ("n", "o"), ("i", "c"),
    ("p", "a"), ("m", "a"), ("d", "i"), ("t", "i"), ("ti", "on"),
    ("w", "i"), ("f", "o"), ("l", "i"),
]


def _bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Greedy BPE encode of one pre-token; returns the token count.

    Standard algorithm: repeatedly merge the lowest-rank adjacent
    pair present, each pass replacing its occurrences left-to-right
    non-overlapping, until no pair in the table remains. The SQL
    oracle replays this exactly (the fold-based pass in
    _BPE_ORACLE_SQL is provably equivalent to the left-to-right
    scan: a merge's output token never equals the pair's left side,
    so a fold can't chain merges within one pass)."""
    toks = list(word)
    while len(toks) > 1:
        best = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, toks[i], toks[i + 1])
        if best is None:
            break
        _, left, right = best
        merged: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                merged.append(left + right)
                i += 2
            else:
                merged.append(toks[i])
                i += 1
        toks = merged
    return len(toks)


def token_count_bpe_real(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Per-document token count under a REAL greedy BPE encode
    against the deterministic merge table — not the regex-piece
    proxy of ``token_count_modes``.

    Arrow mapInPandas kernel (the winnow_fingerprint precedent):
    lowercase, pre-split with BPE_SPLIT_PATTERN, encode each word
    against the broadcast-as-closure merge table. A per-batch word
    memo collapses the Zipfian repeat mass — each distinct word is
    encoded once per batch. One scan, zero shuffle; at 100 TB the
    cost is the text scan plus C-speed string handling.
    """
    import re as _re

    import pandas as pd

    table = merges if merges is not None else BPE_MERGES
    ranks = {pair: i for i, pair in enumerate(table)}
    pat = _re.compile(BPE_SPLIT_PATTERN)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            memo: dict[str, int] = {}
            counts = []
            for text in pdf[text_col]:
                n = 0
                for w in pat.findall((text or "").lower()):
                    c = memo.get(w)
                    if c is None:
                        c = _bpe_encode(w, ranks)
                        memo[w] = c
                    n += c
                counts.append(n)
            yield pd.DataFrame({id_col: pdf[id_col], "n_bpe_real": counts})

    return docs.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} long, n_bpe_real long"
    )


def winnow_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprint (rolling-hash selection, as in
    MOSS): hash every char k-gram, keep the minimum hash of each
    sliding window of ``window`` consecutive k-grams, return the
    sorted distinct selection. Near-identical documents share most
    selected hashes, and the selection is position-robust.

    Evaluated as an Arrow-batched ``mapInPandas`` kernel (the
    ``brute_force_topk_gemm`` precedent): Catalyst's higher-order
    lambdas run interpreted (never codegen'd), so an md5 + hex-slice +
    base-conversion per character position costs ~15× a vectorized
    evaluation. Here hashlib.md5 (C) hashes each k-gram and numpy's
    ``sliding_window_view`` takes the window minima — same digests,
    same selection, so the DuckDB oracle is byte-identical. Per-row
    projection, zero shuffle; each partition streams through as Arrow
    batches, so the cost at 100 TB is one scan at C speed.

    Hash = first 8 hex chars of md5(utf-8 bytes of the lowercased
    k-gram) read base-16 (equivalently: first 4 digest bytes
    big-endian). Docs shorter than k, or with fewer than ``window``
    k-grams, select nothing (empty fps) — matching the slice/zip_with
    formulation this kernel replaced.
    """
    import hashlib

    import numpy as np
    from pyspark.sql import types as T

    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField("fps", T.ArrayType(T.LongType()), True)]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            fps_out: list[list[int]] = []
            for text in pdf[text_col]:
                t = ("" if text is None else str(text)).lower()
                n = len(t) - (k - 1)
                if n < window:
                    fps_out.append([])
                    continue
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.md5(t[i : i + k].encode("utf-8")).digest()[:4],
                            "big",
                        )
                        for i in range(n)
                    ),
                    dtype=np.int64,
                    count=n,
                )
                mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
                fps_out.append(np.unique(mins).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "fps": fps_out})

    return docs.select(id_col, text_col).mapInPandas(kernel, out_schema)


def winnow_fingerprint_rk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    base: int = 31,
    mod: int = 1 << 32,
) -> DataFrame:
    """Winnowing fingerprint over a polynomial (Rabin-Karp) k-gram
    hash instead of md5: hash(c_1..c_k) = sum(c_i * base^(k-i)) mod
    2^32 over Unicode code points of the lowercased text.

    The polynomial hash is O(1) amortized per position (vs md5's O(k)
    digest per gram) and is exactly expressible in ANSI-ish SQL (a
    sum of ord()*base^j terms per position), so the DuckDB oracle
    computes the byte-identical selection. md5 winnowing
    (``winnow_fingerprint``) is kept for MOSS-digest compatibility;
    this variant is the cheaper default for fingerprint-only use.

    Vectorized the same way as the md5 kernel: utf-32 decode gives
    the code-point array for free, Horner's rule over k shifted
    slices builds all gram hashes in k vector ops (max value
    ~2^41 < 2^63, so one trailing mod suffices), then
    sliding_window_view minima + unique. Zero shuffle, one scan.
    """
    import numpy as np
    from pyspark.sql import types as T

    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField("fps", T.ArrayType(T.LongType()), True)]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            fps_out: list[list[int]] = []
            for text in pdf[text_col]:
                t = ("" if text is None else str(text)).lower()
                n = len(t) - (k - 1)
                if n < window:
                    fps_out.append([])
                    continue
                codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.uint64
                )
                hs = np.zeros(n, dtype=np.uint64)
                for j in range(k):
                    hs = hs * np.uint64(base) + codes[j : j + n]
                hs = (hs % np.uint64(mod)).astype(np.int64)
                mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
                fps_out.append(np.unique(mins).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "fps": fps_out})

    return docs.select(id_col, text_col).mapInPandas(kernel, out_schema)


def token_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus token histogram: explode tokens → count per token.
    Map-side partial aggregation makes this one light shuffle."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


# PII patterns restricted to syntax shared verbatim by Java regex
# (Spark) and RE2 (DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "long_digits": r"\b[0-9]{9,}\b",  # phone/SSN/account-shaped runs
}


def pii_count_cols(text_col: str = "text") -> list[F.Column]:
    """Per-category PII match counts over the ORIGINAL text — shared
    by pii_scrub and the streaming stats sink (pure per-row
    expressions, safe to evaluate inside any projection)."""
    return [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction for training corpora: replace email addresses,
    IPv4 addresses, and long digit runs with typed placeholder tokens
    (``<EMAIL>`` etc.), and count each category per document.

    Pure JVM regexp_replace/regexp_count projections — one scan, no
    shuffle, whole-stage codegen'd; patterns are in the dialect
    intersection of Java regex and RE2 so the DuckDB oracle computes
    the byte-identical scrubbed text. Order matters: emails are
    redacted before digit runs so an address containing digits isn't
    double-redacted; counts are taken on the ORIGINAL text.
    """
    out = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return docs.select(
        F.col(id_col), out.alias("clean_text"), *pii_count_cols(text_col)
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    block_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Greedy next-fit sequence packing: assign documents to packed
    training sequences (bins) of at most ``capacity`` tokens — the
    token-budget batching step of a pretraining data pipeline.

    Packing is sequential by nature, so it is made distributed the
    way production packers are: documents are sharded into
    deterministic BLOCKS (``doc_id // block_size``), each block packs
    independently with next-fit in doc_id order, and bin ids are
    globally unique by construction (``grp * block_size + local``,
    local < block items). Blocks are embarrassingly parallel — each
    block's tiny sequential fold runs as a JVM ``aggregate`` over the
    block's collected (id, n) list (bounded by ``block_size`` items;
    formerly an ``applyInPandas`` loop, but per-block pandas framing
    and the row-at-a-time Python loop cost ~2x the whole stage —
    guide §4: stay in the JVM when a built-in fold exists), one
    shuffle on the block key; at 100 TB block packing is the standard
    trade (a ≤1-bin-per-block fragmentation cost for linear scaling).

    Next-fit recurrence (also the SQL oracle's recursive CTE): a doc
    opens a new bin when the current bin's fill plus its tokens would
    exceed ``capacity``; docs longer than ``capacity`` occupy a bin
    alone (the recurrence needs no special case: their fill then
    forces the next doc into a fresh bin).

    Output: (doc_id, n_tokens, bin_id).

    ``n_tokens_col``: use a pre-computed token count instead of
    re-tokenizing ``text_col`` — for inputs whose producer already
    knows the count (chunk_documents emits ``n_chunk_tokens`` =
    len(token slice), provably equal to size(tokens(chunk_text))
    since chunk_text is the " "-join of those tokens). Skipping the
    text column here also lets the scan prune it entirely.
    """
    from fxa_activity_metrics_spark.operators.dedup import tokens

    n_expr = (
        F.col(n_tokens_col)
        if n_tokens_col is not None
        else F.size(tokens(text_col))
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_expr.cast("long").alias("n_tokens"),
    ).withColumn(
        # integer DIV, not float floor-division: doubles lose exact
        # integers above 2^53, which would mis-shard hash-derived
        # 64-bit doc ids (the oracle's `doc_id // 64` is exact)
        "grp",
        F.expr(f"doc_id DIV {int(block_size)}"),
    )

    # One collected (id, n) list per block (array_sort's struct order
    # = doc_id order; ids are unique), folded by the next-fit
    # recurrence entirely in the JVM. The lambda touches only its
    # bound vars (acc, x) — nothing upstream re-evaluates per element
    # (the r13 HOF projection-boundary rule).
    cap = int(capacity)
    packed = (
        base.groupBy("grp")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "n_tokens"))
            ).alias("_lst")
        )
        .select(
            "grp",
            F.aggregate(
                "_lst",
                F.expr(
                    "named_struct('bin', cast(-1 as long),"
                    " 'fill', cast(0 as long),"
                    " 'out', cast(array() as"
                    " array<struct<doc_id: long, n_tokens: long,"
                    " bin_local: long>>))"
                ),
                lambda acc, x: F.struct(
                    F.when(
                        (acc["bin"] < 0)
                        | (acc["fill"] + x["n_tokens"] <= cap),
                        F.greatest(acc["bin"], F.lit(0).cast("long")),
                    )
                    .otherwise(acc["bin"] + 1)
                    .alias("bin"),
                    F.when(
                        (acc["bin"] < 0)
                        | (acc["fill"] + x["n_tokens"] > cap),
                        x["n_tokens"],
                    )
                    .otherwise(acc["fill"] + x["n_tokens"])
                    .alias("fill"),
                    F.array_append(
                        acc["out"],
                        F.struct(
                            x["doc_id"].alias("doc_id"),
                            x["n_tokens"].alias("n_tokens"),
                            F.when(
                                (acc["bin"] < 0)
                                | (acc["fill"] + x["n_tokens"] <= cap),
                                F.greatest(
                                    acc["bin"], F.lit(0).cast("long")
                                ),
                            )
                            .otherwise(acc["bin"] + 1)
                            .alias("bin_local"),
                        ),
                    ).alias("out"),
                ),
            ).alias("_acc"),
        )
    )
    return packed.select(
        "grp", F.explode(F.col("_acc.out")).alias("_e")
    ).select(
        F.col("_e.doc_id").alias("doc_id"),
        F.col("_e.n_tokens").alias("n_tokens"),
        (F.col("grp") * block_size + F.col("_e.bin_local")).alias("bin_id"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition signals for quality filtering (the duplicate-n-gram
    family of Gopher/RefinedWeb-style curation rules): the fraction
    of word 2-grams and 3-grams that are duplicates of an earlier
    gram in the same document, and a composite `repetitive` flag.

    A document that repeats itself has many non-distinct n-grams;
    natural prose rarely exceeds ~0.2. Pure JVM array expressions —
    the shared shingle machinery with ``distinct=False`` (the
    duplicate fraction needs the raw positional gram list) — one
    scan, no shuffle.
    """
    from fxa_activity_metrics_spark.operators.dedup import shingles

    # The gram arrays are zip_with chains — CodegenFallback, so
    # repeated references re-evaluate them (no codegen, no
    # subexpression elimination; the simhash 10× lesson, r13).
    # Materialize each array ONCE behind a projection boundary
    # (expensive + multi-referenced blocks CollapseProject), reduce to
    # four ints, then the fractions are cheap arithmetic. Previously
    # each dup_frac inlined its shingle chain into four reference
    # sites (round + flag, × size + array_distinct) per n.
    grams = docs.select(
        F.col(id_col),
        shingles(text_col, 2, distinct=False).alias("_z2"),
        shingles(text_col, 3, distinct=False).alias("_z3"),
    )
    counts = grams.select(
        id_col,
        F.size("_z2").alias("_t2"),
        F.size(F.array_distinct("_z2")).alias("_u2"),
        F.size("_z3").alias("_t3"),
        F.size(F.array_distinct("_z3")).alias("_u3"),
    )

    def dup_frac(total, uniq):
        return F.when(
            total > 0, (total - uniq).cast("double") / total.cast("double")
        ).otherwise(F.lit(0.0))

    d2 = dup_frac(F.col("_t2"), F.col("_u2"))
    d3 = dup_frac(F.col("_t3"), F.col("_u3"))
    return counts.select(
        F.col(id_col),
        F.round(d2, 6).alias("dup_2gram_frac"),
        F.round(d3, 6).alias("dup_3gram_frac"),
        ((d2 > 0.4) | (d3 > 0.3)).alias("repetitive"),
    )


# keep-rates per quality band [0,.2) [.2,.4) [.4,.6) [.6,.8) [.8,1]:
# low-quality strata are downsampled hard, top strata kept whole
STRATA_KEEP_PCT: tuple[int, ...] = (5, 10, 25, 50, 100)


def stratified_sample(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Quality-stratified deterministic sampling — the corpus-balance
    step of a curation pipeline: band documents by quality_score into
    five fixed strata and keep a deterministic id-cohort percentage
    per band (``STRATA_KEEP_PCT``), downsampling low-quality text
    while keeping the best stratum whole.

    Fixed score bands, NOT quantiles: a global ntile would need a
    total sort (one partition at 100 TB); fixed bands are a per-row
    projection. The keep decision reuses the engine's 7-hex md5
    cohort rule (functions/core.py, import_events.py:114) on the doc
    id, so sampling is reproducible across runs and engines — the
    DuckDB oracle computes the identical cohort. One scan, no
    shuffle.

    Output: (doc_id, quality_band, cohort, keep).
    """
    from fxa_activity_metrics_spark.functions.core import cohort_bucket

    q = text_stats(docs, id_col=id_col, text_col=text_col).select(
        id_col, "quality_score"
    )
    band = F.least(F.floor(F.col("quality_score") * 5), F.lit(4)).cast("int")
    # the engine's 7-hex cohort rule (functions/core.py guards the
    # 7-vs-8-char fidelity trap) over the id's md5
    cohort = cohort_bucket(F.md5(F.col(id_col).cast("string"))).cast("long")
    rate = F.element_at(
        F.array(*[F.lit(p) for p in STRATA_KEEP_PCT]), band + 1
    )
    return q.select(
        F.col(id_col),
        band.alias("quality_band"),
        cohort.alias("cohort"),
        (cohort < rate).alias("keep"),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_train_docs: int | None = None,
) -> list[tuple[str, str]]:
    """Distributed BPE merge LEARNING — the tokenizer-training side
    of the BPE story whose encoder is ``token_count_bpe_real``:
    learn the ``n_merges`` highest-count adjacent-symbol merges from
    the corpus, deterministically (ties break on count desc, then
    lexicographic (left, right) asc — so the result is reproducible
    across runs, partitionings, and engines).

    Scale shape: the corpus collapses ONCE to distinct pre-token
    words with counts (one shuffle; Zipf makes this frame tiny
    relative to the corpus) and every round then runs on that frame
    only — a zip_with pair explode + one map-side-combining groupBy
    to find the top pair (overlapping occurrences counted, the
    reference semantics), and a JVM aggregate() fold applying the
    merge leftmost-non-overlapping. localCheckpoint per round keeps
    the iterative lineage flat (the dedup_clusters precedent). The
    driver sees only n_merges single-row tops.

    Returns the merge list, directly consumable by
    ``token_count_bpe_real(docs, merges=...)``.

    COST CONTRACT: each merge round is one full aggregate over the
    distinct-word frame plus a 1-row driver collect — inherent to BPE
    (round r's pair counts depend on round r-1's merge). At 100 TB
    with a real vocabulary (30k merges) that is 30k shuffles of the
    word frame; the standard practice (and this function's scale
    path) is to train on a bounded sample. ``max_train_docs`` caps
    the training corpus with a DETERMINISTIC md5 cohort over the doc
    id (the P6 sampling trap's 7-hex-char arithmetic — stable across
    runs, partitionings, and engines, unlike ``DataFrame.sample``):
    docs whose cohort-of-10000 falls under ceil(max/total·10000)
    train the merges, every doc still encodes with them.  One count
    job resolves the fraction — negligible against the merge rounds.
    """
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    if max_train_docs is not None:
        total = docs.count()
        if total > max_train_docs:
            n_buckets = 10000
            keep = -(-max_train_docs * n_buckets // total)  # ceil
            docs = docs.filter(
                F.pmod(
                    F.conv(
                        F.substring(F.md5(F.col(id_col).cast("string")), 1, 7),
                        16,
                        10,
                    ).cast("long"),
                    F.lit(n_buckets),
                )
                < keep
            )
    words = (
        docs.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}),"
                    f" '{BPE_SPLIT_PATTERN}', 0)"
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    state = words.select(
        F.expr("filter(split(w, ''), x -> x <> '')").alias("syms"),
        F.col("cnt"),
    ).transform(cacheutil.local_checkpoint)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = state.select(
            F.explode(
                F.zip_with(
                    F.expr("slice(syms, 1, size(syms) - 1)"),
                    F.expr("slice(syms, 2, size(syms) - 1)"),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            F.col("cnt"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        apply = F.aggregate(
            "syms",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(left + right)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        state = state.select(apply.alias("syms"), "cnt").transform(cacheutil.local_checkpoint)
    return merges


def novelty_score(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty: what fraction of a doc's DISTINCT
    n-grams appear in no other document. The corpus-curation signal
    between exact dedup (whole-text) and substring dedup (span
    surgery): a low-novelty doc is assembled from corpus-common
    phrasing even when no single span crosses the removal threshold.

    Integer output (novelty_micro = (n_grams − n_shared)·1e6 div
    n_grams) — exact-hash oracle. Plan: one shingle explode, one
    gram-keyed doc-frequency shuffle (map-side combinable — grams
    are md5-narrowed before the exchange), re-join df onto the gram
    rows, ONE groupBy(doc_id). Docs with fewer than n tokens surface
    with n_grams = 0 and NULL novelty (left join from the corpus).

    Output: (doc_id, n_grams, n_shared, novelty_micro).
    """
    from fxa_activity_metrics_spark.operators.dedup import shingles

    grams = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(shingles(text_col, n=n)).alias("gram"),
        )
        .select("doc_id", F.md5("gram").alias("gh"))
        # persisted: the df branch re-aggregates THIS frame — without
        # the cache Catalyst re-scans and re-shingles the corpus for
        # the second join branch
        .persist()
    )
    grams = cacheutil.track(grams)
    dfreq = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        grams.join(dfreq, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.expr("(n_grams - n_shared) * 1000000L div n_grams"),
            ).alias("novelty_micro"),
        )
    )
