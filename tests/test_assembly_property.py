"""Property-based checks for chunk_documents: the Spark windows must
agree with a direct pure-Python chunker on arbitrary token streams
and parameter combinations, and disjoint chunking (stride ==
chunk_size) must reconstruct the document exactly."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fxa_activity_metrics_spark.operators.assembly import chunk_documents


def _py_chunks(text: str, size: int, stride: int) -> list[tuple[int, str, int]]:
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    if n == 0:
        return []
    extra = (
        min((n - size + stride - 1) // stride, (n - 1) // stride)
        if n > size
        else 0
    )
    return [
        (i, " ".join(toks[i * stride : i * stride + size]),
         min(size, n - i * stride))
        for i in range(1 + extra)
    ]


CASES = st.tuples(
    st.lists(
        st.text(alphabet="abcxyz", min_size=0, max_size=3), max_size=40
    ),
    st.integers(min_value=1, max_value=9),   # chunk_size
    st.integers(min_value=1, max_value=9),   # stride
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(case=CASES)
def test_chunks_match_pure_python(spark, case):
    words, size, stride = case
    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r.chunk_id, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(
            docs, chunk_size=size, stride=stride
        ).collect()
    )
    assert got == _py_chunks(text, size, stride)
    # invariants INDEPENDENT of the shared count formula: every chunk
    # is non-empty and in-bounds; no start falls past the last token;
    # with stride <= size the last chunk reaches the document end
    toks = [t for t in text.split(" ") if t]
    for cid, ctext, ntok in got:
        assert 1 <= ntok <= size, (cid, ntok)
        assert ctext != ""
        assert cid * stride < len(toks)
        assert ctext.split(" ") == toks[cid * stride : cid * stride + size]
    if toks and stride <= size:
        last_cid = max(c for c, _, _ in got)
        assert last_cid * stride + size >= len(toks), "must reach the end"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    words=st.lists(st.sampled_from(["aa", "bb", "cc", "d"]), min_size=1, max_size=50),
    size=st.integers(min_value=1, max_value=8),
)
def test_disjoint_chunking_reconstructs_document(spark, words, size):
    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_text)
        for r in chunk_documents(
            docs, chunk_size=size, stride=size
        ).collect()
    )
    rebuilt = " ".join(t for _, t in rows)
    assert rebuilt == text
    # token coverage is exact and non-overlapping
    assert sum(len(t.split(" ")) for _, t in rows) == len(words)


# ---- split_decontam: the full partition law on arbitrary pair sets ----


def _py_split(i: int) -> str:
    import hashlib

    b = int(hashlib.md5(f"split{i}".encode()).hexdigest()[:7], 16) % 10_000
    return "train" if b < 9000 else ("val" if b < 9500 else "test")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=80),
            st.integers(min_value=1, max_value=80),
        ).filter(lambda p: p[0] != p[1]),
        max_size=25,
    ),
    policy=st.sampled_from(["drop", "rehome"]),
)
def test_split_decontam_law(spark, pairs, policy):
    """For ANY candidate pair set: (1) every doc appears exactly once;
    (2) a doc is resolved (dropped/rehomed) iff it is non-train AND
    has a cross-split partner in pairs; (3) train docs and clean docs
    keep their split; (4) n_train_dups counts the doc's pair rows
    whose partner is train-side."""
    from fxa_activity_metrics_spark.operators.assembly import split_decontam

    ids = list(range(1, 81))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pdf = spark.createDataFrame(
        pairs or [(0, 0)], "id_a long, id_b long"
    )
    if not pairs:
        pdf = pdf.filter("id_a <> id_b")  # empty frame, schema kept
    out = {r.doc_id: r for r in split_decontam(docs, pdf, policy=policy).collect()}
    assert sorted(out) == ids
    want_dups: dict[int, int] = {}
    for a, b in pairs:
        for e, t in ((a, b), (b, a)):
            if _py_split(e) != "train" and _py_split(t) == "train":
                want_dups[e] = want_dups.get(e, 0) + 1
    resolved = "dropped" if policy == "drop" else "train"
    for i in ids:
        r = out[i]
        assert r.split == _py_split(i)
        assert r.n_train_dups == want_dups.get(i, 0)
        assert r.final_split == (resolved if i in want_dups else r.split)
