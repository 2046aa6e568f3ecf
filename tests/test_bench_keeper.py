"""Keeper-integrity + keeper-write-path guards (VERDICT r12 #7, ADVICE r12).

The r11→r12 driver run once silently clobbered the committed
BENCH_LOCAL.json keeper; bench.py now (a) refuses --keeper combined with a
subset env var, and (b) runs a startup integrity check against the
committed keeper so any clobber fails loudly at the NEXT bench run. The
suite-level test against the REAL committed keeper also catches "catalog
changed but keeper not re-earned" before the driver ever runs bench.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402


def _write_keeper(tmp_path, payload) -> str:
    p = tmp_path / "BENCH_LOCAL.json"
    p.write_text(json.dumps(payload))
    return str(p)


def _healthy(n=239, value=350.0):
    return {
        "metric": "full_catalog_total_wall",
        "value": value,
        "unit": "sec",
        "queries": {},
        "sf": 0.1,
        "n_queries": n,
    }


def test_absent_keeper_is_legal(tmp_path):
    assert bench.check_keeper_integrity(239, str(tmp_path / "nope.json")) == []


def test_healthy_keeper_passes(tmp_path):
    p = _write_keeper(tmp_path, _healthy())
    assert bench.check_keeper_integrity(239, p) == []


def test_partial_snapshot_flagged(tmp_path):
    k = _healthy()
    k["partial"] = True
    p = _write_keeper(tmp_path, k)
    problems = bench.check_keeper_integrity(239, p)
    assert any("partial" in m for m in problems)


def test_error_run_flagged(tmp_path):
    k = _healthy()
    k["n_errors"] = 2
    k["errors"] = {"q": "boom", "r": "boom"}
    p = _write_keeper(tmp_path, k)
    problems = bench.check_keeper_integrity(239, p)
    assert any("errors" in m for m in problems)


def test_subset_clobber_flagged(tmp_path):
    # a subset run has the wrong n_queries — the classic clobber signature
    p = _write_keeper(tmp_path, _healthy(n=12, value=20.0))
    problems = bench.check_keeper_integrity(239, p)
    assert any("n_queries" in m for m in problems)
    assert any("sanity band" in m for m in problems)


def test_out_of_band_value_flagged(tmp_path):
    p = _write_keeper(tmp_path, _healthy(value=5000.0))
    problems = bench.check_keeper_integrity(239, p)
    assert problems and any("sanity band" in m for m in problems)


def test_unparseable_keeper_flagged(tmp_path):
    p = tmp_path / "BENCH_LOCAL.json"
    p.write_text("{not json")
    problems = bench.check_keeper_integrity(239, str(p))
    assert problems and "unparseable" in problems[0]


def test_committed_keeper_matches_catalog():
    """The suite-level staleness gate: the COMMITTED keeper must match the
    CURRENT catalog size and sit in the sanity band. Fails the test suite
    (not just the next bench run) when the catalog changes without
    re-earning the keeper via `python bench.py --keeper`."""
    if os.environ.get("PNS_KEEPER_CHECK") == "warn":
        pytest.skip("keeper staleness acknowledged for this mid-round run")
    from polars_numba_spark.queries import catalog

    n = len(catalog.spark_queries())
    problems = bench.check_keeper_integrity(n)
    assert problems == [], f"committed BENCH_LOCAL.json is stale/clobbered: {problems}"


def test_keeper_plus_subset_env_refused():
    """ADVICE r12: --keeper with SPARK_GRAFT_BENCH_QUERIES must exit loudly
    (a subset run can never be a valid keeper). Subprocess because the
    guard runs at bench.py import/arg-parse time."""
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_QUERIES"] = "q6_revenue_forecast"
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"), "--keeper"],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0
    assert "cannot be combined" in (proc.stderr + proc.stdout)


# ---------------------------------------------------------------------------
# Contention self-description (VERDICT r13 #2): the r13 driver capture read
# 839.6s for an engine whose quiet-host floor is 327.2s and the judge had to
# re-time faces by hand. These pin the pure helpers behind the fix: the
# worst-k retry candidate pick and the loadavg/ratio contention report.
# ---------------------------------------------------------------------------


def test_retry_candidates_are_k_slowest():
    timings = {"a": 1.0, "b": 9.0, "c": 3.0, "d": 7.0, "e": 0.5}
    assert bench.pick_retry_candidates(timings, k=3) == ["b", "d", "c"]
    # k larger than the map returns everything, slowest first
    assert bench.pick_retry_candidates({"a": 1.0}, k=10) == ["a"]


def test_retry_candidates_include_keeper_ratio_outliers():
    """A face spiked far above its OWN keeper floor is retried even when
    its inflated wall is not top-k (the r14 second-session observation:
    an 18x spike on a 0.5s face sat just under the k=10 cutoff)."""
    timings = {"big1": 9.0, "big2": 8.0, "spiked": 6.0, "quiet": 1.0}
    keeper = {"big1": 8.5, "big2": 8.0, "spiked": 0.5, "quiet": 1.0}
    picks = bench.pick_retry_candidates(timings, k=2, keeper_queries=keeper)
    assert picks[:2] == ["big1", "big2"]  # the k slowest, unchanged
    assert "spiked" in picks  # 12x its keeper floor -> retried
    assert "quiet" not in picks  # 1.0x its floor -> not retried


def test_retry_candidate_extras_are_capped_and_ordered_by_excess():
    timings = {f"q{i}": 10.0 for i in range(40)}
    timings["worst"] = 50.0
    keeper = {n: 1.0 for n in timings}  # everything reads 10-50x its floor
    picks = bench.pick_retry_candidates(timings, k=1, keeper_queries=keeper)
    assert picks[0] == "worst"
    assert len(picks) == 1 + bench._RETRY_EXTRA_CAP  # extras bounded
    assert len(picks) == len(set(picks))  # no duplicates


def test_retry_candidates_skip_subsecond_keeper_noise():
    # a 0.05s-keeper face reading 0.4s is 8x but absolute noise, not a spike
    timings = {"slow": 9.0, "tiny": 0.4}
    keeper = {"slow": 8.8, "tiny": 0.05}
    picks = bench.pick_retry_candidates(timings, k=1, keeper_queries=keeper)
    assert picks == ["slow"]


def test_retry_candidates_quiet_run_adds_no_extras():
    timings = {f"q{i}": 1.1 for i in range(30)}
    keeper = {n: 1.0 for n in timings}  # everything within the quiet band
    picks = bench.pick_retry_candidates(timings, k=10, keeper_queries=keeper)
    assert len(picks) == 10


def test_steal_pct_math_and_missing_samples():
    assert bench.steal_pct((100, 1000), (150, 2000)) == 5.0
    assert bench.steal_pct(None, (150, 2000)) is None
    assert bench.steal_pct((100, 1000), None) is None
    assert bench.steal_pct((100, 1000), (100, 1000)) is None  # no elapsed time


def test_read_cpu_jiffies_on_this_host():
    """On Linux the sampler returns monotone (steal, total) pairs; the
    report helpers must accept them end to end."""
    a = bench.read_cpu_jiffies()
    if a is None:
        return  # non-Linux: sampler degrades to None, steal_pct to None
    steal, total = a
    assert 0 <= steal <= total
    rep = bench.contention_report(
        {f"q{i}": 1.0 for i in range(12)},
        {f"q{i}": 1.0 for i in range(12)},
        {},
        {"q0": 1.5, "q1": None, "q2": 0.0},
    )
    assert rep["steal_median_pct"] == 0.75  # median of [1.5, 0.0]; None skipped
    assert rep["steal_max_pct"] == 1.5


def test_contention_report_flags_hot_capture():
    keeper = {f"q{i}": 1.0 for i in range(20)}
    hot = {f"q{i}": 2.0 for i in range(20)}  # uniformly 2x the keeper floor
    rep = bench.contention_report(hot, keeper, {"q0": [33.0, 35.0]})
    assert rep["contended"] is True
    assert rep["median_ratio_vs_keeper"] == 2.0
    assert rep["n_vs_keeper"] == 20
    assert rep["loadavg_max"] == 35.0


def test_contention_report_quiet_capture_is_not_flagged():
    keeper = {f"q{i}": 1.0 for i in range(20)}
    quiet = {f"q{i}": 1.05 for i in range(20)}
    rep = bench.contention_report(quiet, keeper, {})
    assert rep["contended"] is False
    assert rep["median_ratio_vs_keeper"] == 1.05


def test_contention_report_single_outlier_does_not_flag():
    """One transient spike must not mark the whole capture contended —
    that is the retry pass's job to heal, not the flag's job to report."""
    keeper = {f"q{i}": 1.0 for i in range(20)}
    timings = {f"q{i}": 1.0 for i in range(20)}
    timings["q7"] = 40.0
    rep = bench.contention_report(timings, keeper, {})
    assert rep["contended"] is False


def test_contention_report_without_keeper_is_unknown():
    rep = bench.contention_report({"a": 1.0}, {}, {})
    assert rep["contended"] is None
    assert rep["median_ratio_vs_keeper"] is None


def test_contention_report_needs_min_overlap():
    # 5 comparable faces < _MIN_KEEPER_OVERLAP -> unknown, not a verdict
    keeper = {f"q{i}": 1.0 for i in range(5)}
    rep = bench.contention_report({f"q{i}": 5.0 for i in range(5)}, keeper, {})
    assert rep["contended"] is None
