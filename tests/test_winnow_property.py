"""Property-based checks for the winnowing kernels: the Arrow-batched
mapInPandas implementations must agree with a direct pure-Python
winnow on arbitrary text (unicode included), and satisfy the
winnowing guarantees (selection ⊆ k-gram hashes; near-identical
documents share fingerprints)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fxa_activity_metrics_spark.operators.textstats import (
    winnow_fingerprint,
    winnow_fingerprint_rk,
)

K, W = 5, 4


def _py_winnow_md5(text: str) -> list[int]:
    t = text.lower()
    n = len(t) - (K - 1)
    if n < W:
        return []
    hs = [
        int.from_bytes(hashlib.md5(t[i : i + K].encode("utf-8")).digest()[:4], "big")
        for i in range(n)
    ]
    return sorted({min(hs[i : i + W]) for i in range(n - W + 1)})


def _py_winnow_rk(text: str) -> list[int]:
    t = text.lower()
    n = len(t) - (K - 1)
    if n < W:
        return []
    hs = [
        sum(ord(c) * 31 ** (K - 1 - j) for j, c in enumerate(t[i : i + K])) % (1 << 32)
        for i in range(n)
    ]
    return sorted({min(hs[i : i + W]) for i in range(n - W + 1)})


TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(texts=TEXTS)
@pytest.mark.parametrize(
    "op,ref",
    [(winnow_fingerprint, _py_winnow_md5), (winnow_fingerprint_rk, _py_winnow_rk)],
    ids=["md5", "rk"],
)
def test_kernel_matches_pure_python(spark, op, ref, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: list(r["fps"]) for r in op(docs, k=K, window=W).collect()}
    want = {i: ref(t) for i, t in enumerate(texts)}
    assert got == want


def test_near_identical_docs_share_fingerprints(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = base.replace("lazy", "idle", 1)
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    fps = {r["doc_id"]: set(r["fps"]) for r in winnow_fingerprint(docs).collect()}
    inter = fps[1] & fps[2]
    union = fps[1] | fps[2]
    assert len(inter) / len(union) > 0.5, (
        "a one-word edit must leave most winnow fingerprints shared"
    )


def _py_next_fit(counts, capacity, block_size):
    """Pure-Python reference of the block-sharded next-fit packer."""
    out = {}
    by_grp = {}
    for doc_id, n in counts:
        by_grp.setdefault(doc_id // block_size, []).append((doc_id, n))
    for grp, items in by_grp.items():
        items.sort()
        bin_local, fill = 0, 0
        for i, (doc_id, n) in enumerate(items):
            if i == 0:
                fill = n
            elif fill + n > capacity:
                bin_local += 1
                fill = n
            else:
                fill += n
            out[doc_id] = grp * block_size + bin_local
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40),
    capacity=st.integers(min_value=1, max_value=25),
)
def test_pack_matches_pure_python(spark, sizes, capacity):
    from fxa_activity_metrics_spark.operators.textstats import pack_sequences

    rows = [(i * 7, " ".join(["w"] * n) if n else "") for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bin_id"]
        for r in pack_sequences(docs, capacity=capacity, block_size=16).collect()
    }
    want = _py_next_fit([(i * 7, n) for i, n in enumerate(sizes)], capacity, 16)
    assert got == want
