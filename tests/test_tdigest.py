"""t-digest-style mergeable quantile sketch (r6 verdict next-round #8):
bounded-state contract, rank-error bound, and merge validity under
different partitionings."""

from __future__ import annotations

import bisect

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_numba_spark.operators.sketch import (
    _compress,
    _k1_boundaries,
    tdigest_partials,
    tdigest_quantiles,
)

SF = "/root/testdata/sf0.001"
PROBS = [0.05, 0.5, 0.9, 0.99]
C = 128


def _rank_errors(rows, values_by_group):
    errs = []
    for r in rows:
        v = values_by_group[r["event_type"]]
        rank = bisect.bisect_left(v, r["quantile_est"]) / len(v)
        errs.append(abs(rank - r["prob"]))
    return errs


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def exact_values(events):
    vals = {}
    for row in events.select("event_type", "value").collect():
        vals.setdefault(row["event_type"], []).append(row["value"])
    for k in vals:
        vals[k].sort()
    return vals


def test_rank_error_within_bound(events, exact_values):
    """Every estimated quantile must land within 1/C rank of its target —
    twice the k1 bucket half-width, the documented accuracy contract."""
    rows = tdigest_quantiles(events, "value", "event_type", PROBS, C).collect()
    assert len(rows) == len(exact_values) * len(PROBS)
    assert max(_rank_errors(rows, exact_values)) <= 1.0 / C


def test_partial_stage_is_bounded(events):
    """≤ C centroid rows per group per input partition reach the shuffle —
    the merge property that makes the sketch a two-level aggregate."""
    spread = events.repartition(8)
    partials = tdigest_partials(spread, "value", ["event_type"], C)
    n_groups = events.select("event_type").distinct().count()
    assert partials.count() <= C * 8 * n_groups


def test_estimates_stable_across_partitionings(events, exact_values):
    """A digest of digests is a valid digest: different partitionings give
    different merge orders, but every partitioning's estimate must stay
    within the rank bound (bit-identity is NOT promised)."""
    for parts in (1, 7, 32):
        rows = tdigest_quantiles(
            events.repartition(parts), "value", "event_type", PROBS, C
        ).collect()
        assert max(_rank_errors(rows, exact_values)) <= 1.0 / C


def test_tail_accuracy_beats_midrange_budget(events, exact_values):
    """The k1 scale function's reason to exist: extreme quantiles get
    narrower buckets. p=0.99 on a long-tailed value column must attain
    rank error ≤ 1/(2C) even though an equal-weight strip of C buckets
    could only promise 1/(2C) MID-bucket — i.e. the tails are not worse
    than the global bound despite covering far fewer rows."""
    rows = tdigest_quantiles(events, "value", "event_type", [0.99], C).collect()
    assert max(_rank_errors(rows, exact_values)) <= 1.0 / (2 * C)


def test_compress_preserves_total_weight_and_bounds_count():
    rng = np.random.RandomState(7)
    m = np.sort(rng.lognormal(0, 2, size=5000))
    w = np.ones_like(m)
    cm, cw = _compress(m, w, 64)
    assert len(cm) <= 64
    assert cw.sum() == pytest.approx(5000.0)
    assert (np.diff(cm) >= 0).all()


def test_k1_boundaries_are_tail_dense():
    b = _k1_boundaries(100)
    assert b[0] == pytest.approx(0.0) and b[-1] == pytest.approx(1.0)
    # first/last buckets far narrower than the middle one
    assert (b[1] - b[0]) < (b[51] - b[50]) / 10
