"""Persisted IVF index: build-once/query-many at storage level.
Queries against the lake-persisted index must return exactly what
the in-session ivf_topk computes with the same centroids, and the
cells read must be partition-PRUNED to the probed cells."""

from __future__ import annotations

import os

import pytest

from fxa_activity_metrics_spark.operators.similarity import (
    ivf_build_index,
    ivf_query_index,
    ivf_topk,
)
from fxa_activity_metrics_spark.sources.lake import Lake
from fxa_activity_metrics_spark.sources.testdata import read_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    lake = Lake(spark, str(tmp_path_factory.mktemp("ivf_lake")))
    emb = read_table(spark, SF, "embeddings")
    ivf_build_index(lake, emb, name="ivf", n_cells=16)
    return lake, emb


def test_index_layout(env):
    lake, _ = env
    assert lake.read("ivf_centroids").count() == 16
    cells_root = lake.path("ivf_cells")
    parts = [d for d in os.listdir(cells_root) if d.startswith("cell=")]
    assert len(parts) > 1, "assignments must be cell-partition directories"


def test_persisted_query_equals_fresh(env, spark):
    lake, emb = env
    queries = emb.filter("vec_id < 20")
    fresh = ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4)
    persisted = ivf_query_index(lake, queries, name="ivf", k=5, n_probe=4)
    a = sorted(map(tuple, fresh.collect()))
    b = sorted(map(tuple, persisted.collect()))
    assert a == b


def test_query_scan_is_partition_pruned(env, spark):
    lake, emb = env
    queries = emb.filter("vec_id < 3")
    df = ivf_query_index(lake, queries, name="ivf", k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0], (
        "the probed-cell isin must prune cell partitions at the scan"
    )


def test_rebuild_drops_stale_cells(spark, tmp_path):
    """Rebuilding an index must not leave partitions from the prior
    build: a cell emptied by the new corpus/centroids would otherwise
    keep stale rows (dynamic overwrite only touches written cells)."""
    lake = Lake(spark, str(tmp_path / "rebuild_lake"))
    emb = read_table(spark, SF, "embeddings")
    ivf_build_index(lake, emb, name="r", n_cells=16)
    first_cells = set(os.listdir(lake.path("r_cells")))
    # rebuild on a much smaller corpus with fewer cells: many old
    # cell partitions receive no rows
    small = emb.filter("vec_id < 40")
    ivf_build_index(lake, small, name="r", n_cells=4)
    cells_now = {
        d for d in os.listdir(lake.path("r_cells")) if d.startswith("cell=")
    }
    assert all(int(c.split("=")[1]) < 4 for c in cells_now), (
        f"stale cell partitions survived the rebuild: {sorted(cells_now)}"
    )
    # and the persisted query matches a fresh computation on the new corpus
    queries = small.filter("vec_id < 5")
    fresh = ivf_topk(small, queries, k=3, n_cells=4, n_probe=2)
    persisted = ivf_query_index(lake, queries, name="r", k=3, n_probe=2)
    assert sorted(map(tuple, fresh.collect())) == sorted(
        map(tuple, persisted.collect())
    )
    assert first_cells  # sanity: the first build did create partitions
