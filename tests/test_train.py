"""Unit tests for the iterative trainers (llm/train.py): k-means and the
full-batch logreg classifier — degenerate-input contracts, the
empty-cluster carry-over branch, sign-correct learning on a separable
toy, and config validation for the new knobs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinejobs_indexer_spark.config import EngineConfig  # noqa: E402
from pipelinejobs_indexer_spark.llm.train import (  # noqa: E402
    kmeans_plan,
    logreg_plan,
)

_SCHEMA = "vec_id long, label int, embedding array<float>"


def test_kmeans_rejects_fewer_rows_than_k(spark):
    df = spark.createDataFrame([(0, 1, [0.1, 0.2])], _SCHEMA)
    with pytest.raises(ValueError, match="at least k"):
        kmeans_plan(df)


def test_kmeans_rejects_sparse_vec_ids(spark):
    # 4 rows but ids 0,1,2,9: max != n-1, caught by the density agg
    rows = [(i, 0, [float(i), 0.0]) for i in (0, 1, 2, 9)]
    with pytest.raises(ValueError, match="dense vec_ids"):
        kmeans_plan(spark.createDataFrame(rows, _SCHEMA))


def test_kmeans_rejects_duplicate_vec_ids(spark):
    # ids 0,1,1,3 pass the (count, min, max) density agg but leave seed
    # position 2 unoccupied — the seed-fetch guard must still fire
    rows = [(i, 0, [float(j), 0.0]) for j, i in enumerate((0, 1, 1, 3))]
    with pytest.raises(ValueError, match="dense vec_ids"):
        kmeans_plan(spark.createDataFrame(rows, _SCHEMA))


def test_kmeans_identical_vectors_collapse_to_cluster_zero(spark):
    """All-identical corpus: every seed centroid is the same point, all
    distances tie, the index tiebreak sends every row to cluster 0, and
    clusters 1..k-1 go empty — exercising the carry-over branch (the
    COALESCE arm of the oracle) without diverging from it."""
    rows = [(i, 1, [0.25, -0.5]) for i in range(6)]
    out = kmeans_plan(spark.createDataFrame(rows, _SCHEMA)).collect()
    assert len(out) == 6
    assert {r["cluster"] for r in out} == {0}
    assert all(r["dist"] == 0 for r in out)


def test_kmeans_separates_two_obvious_blobs(spark):
    """Two tight blobs far apart must not share a cluster after Lloyd
    iterations, whatever the seed assignment looked like."""
    lo = [(i, 0, [0.0, float(i % 2) / 100.0]) for i in range(4)]
    hi = [(4 + i, 1, [8.0, float(i % 2) / 100.0]) for i in range(4)]
    out = kmeans_plan(spark.createDataFrame(lo + hi, _SCHEMA)).collect()
    lo_clusters = {r["cluster"] for r in out if r["vec_id"] < 4}
    hi_clusters = {r["cluster"] for r in out if r["vec_id"] >= 4}
    assert lo_clusters.isdisjoint(hi_clusters)


def test_logreg_rejects_empty_corpus(spark):
    df = spark.createDataFrame([], _SCHEMA)
    with pytest.raises(ValueError, match="non-empty"):
        logreg_plan(df)


def test_logreg_learns_sign_on_separable_toy(spark):
    """1-feature separable data (positive coordinate <=> positive class):
    after the default sweeps the score must sit on the correct side of
    the 0.5 grid point for every row."""
    rows = [
        (0, 9, [0.5]),
        (1, 8, [0.4]),
        (2, 0, [-0.5]),
        (3, 1, [-0.4]),
    ]
    out = logreg_plan(spark.createDataFrame(rows, _SCHEMA)).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert by_id[0]["pred"] == 1 and by_id[1]["pred"] == 1
    assert by_id[2]["pred"] == 0 and by_id[3]["pred"] == 0
    assert all(r["y"] == (1 if r["label"] >= 5 else 0) for r in out)


def test_config_rejects_bad_trainer_knobs():
    with pytest.raises(ValueError, match="kmeans_k"):
        EngineConfig(kmeans_k=1)
    with pytest.raises(ValueError, match="kmeans_k"):
        EngineConfig(kmeans_k=65)
    with pytest.raises(ValueError, match="kmeans_iters"):
        EngineConfig(kmeans_iters=51)
    with pytest.raises(ValueError, match="kmeans_iters"):
        EngineConfig(kmeans_iters=0)
    with pytest.raises(ValueError, match="logreg_iters"):
        EngineConfig(logreg_iters=51)
    with pytest.raises(ValueError, match="logreg_iters"):
        EngineConfig(logreg_iters=0)
    # in-range values construct fine
    EngineConfig(kmeans_k=64, kmeans_iters=50, logreg_iters=50)
