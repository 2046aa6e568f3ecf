"""Third-eye fixtures for the statistical faces.

The mirrored-oracle blind spot (ADVICE r10, runs test; round-11 audit,
dow-seasonality outlier rule): when the Spark expression and the DuckDB
oracle share a formula error, the cross-engine hash gate is structurally
blind to it.  Each test here recomputes a face's statistic INDEPENDENTLY
in pure Python/numpy from the same synthetic parquet rows — a third
implementation derived from the textbook definition, not from either
engine spelling — so a formula regression fails a unit test even though
the mirrored pair still agrees with itself.

Shared fixture: one deterministic events table (48 users, 35 days, four
event types, purchase values) + one orders table, written once per
session.  Every comparison carries a 1e-7-ish tolerance: the faces round
libm terms to 9 decimals with HALF_UP before decimal accumulation, and
the third eye deliberately does NOT replicate that discipline (replicating
it would re-mirror the thing under test).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
from decimal import Decimal

import numpy as np
import pytest

EPOCH = dt.date(1970, 1, 1)
BASE = dt.date(2024, 1, 1)
N_DAYS = 35
N_USERS = 48
TYPES = ["view", "click", "purchase", "signup"]


def _md5_arm(user_id: int, salt: str) -> int:
    """The portable arm-assignment recipe (first 15 hex chars of md5)."""
    h = hashlib.md5((str(user_id) + salt).encode()).hexdigest()
    return int(h[:15], 16) % 2


def _gen_events():
    rng = np.random.RandomState(7)
    rows = []
    eid = 0

    def add(day, user, etype, value):
        nonlocal eid
        ts = dt.datetime.combine(BASE + dt.timedelta(days=int(day)),
                                 dt.time(12, 0)) + dt.timedelta(
            minutes=int(rng.randint(0, 360)))
        rows.append((eid, ts, int(user), etype, float(value)))
        eid += 1

    for u in range(1, N_USERS + 1):
        add(rng.randint(0, 10), u, "signup", 0.0)
        # ~70% of users purchase 1..6 times with heavy-tailed values
        if rng.rand() < 0.7:
            for _ in range(rng.randint(1, 7)):
                add(rng.randint(0, N_DAYS), u, "purchase",
                    round(float(np.exp(rng.normal(3.0, 1.0))), 2))
        for _ in range(rng.randint(2, 12)):
            add(rng.randint(0, N_DAYS), u, "view", 0.0)
        for _ in range(rng.randint(0, 6)):
            add(rng.randint(0, N_DAYS), u, "click", 0.0)
    # a deliberate traffic spike (outlier day for dow/chisq interest)
    for _ in range(60):
        add(20, int(rng.randint(1, N_USERS + 1)), "view", 0.0)
    return rows


def _gen_orders():
    rng = np.random.RandomState(11)
    rows = []
    for i in range(400):
        # log-uniform totals: spans several decades so Benford is non-degenerate
        total = round(float(10 ** rng.uniform(0.5, 4.5)) / 100.0, 2)
        rows.append((i, int(rng.randint(1, 49)), total,
                     BASE + dt.timedelta(days=int(rng.randint(0, N_DAYS))),
                     "O"))
    return rows


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("thirdeye")
    ev = spark.createDataFrame(
        _gen_events(),
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    ev.coalesce(1).write.parquet(str(d / "events.parquet"))
    od = spark.createDataFrame(
        _gen_orders(),
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate date, o_orderstatus string",
    )
    od.coalesce(1).write.parquet(str(d / "orders.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def events_pd():
    import pandas as pd

    return pd.DataFrame(
        _gen_events(),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )


def _day_idx(ts: dt.datetime) -> int:
    return (ts.date() - EPOCH).days


# --------------------------------------------------------------------- #
# events_dow_seasonality — the round-11 audit fix: |y - ȳ| > 3σ_dow     #
# --------------------------------------------------------------------- #
def test_dow_seasonality_three_sigma(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import events_dow_seasonality

    got = {
        (r["event_type"], r["dow"]): r
        for r in events_dow_seasonality(spark, sf_dir).collect()
    }

    df = events_pd.copy()
    df["day_idx"] = df["ts"].map(_day_idx)
    daily = (
        df.groupby(["event_type", "day_idx"]).size().rename("y").reset_index()
    )
    daily["dow"] = (daily["day_idx"] + 4) % 7
    for etype, g in daily.groupby("event_type"):
        overall = g["y"].mean()
        for dow, gd in g.groupby("dow"):
            y = gd["y"].to_numpy(dtype=float)
            idx = y.mean() / overall
            sigma = y.std()  # population sd — the documented 3σ_dow rule
            n_out = int(np.sum(np.abs(y - y.mean()) > 3.0 * sigma))
            row = got[(etype, dow)]
            assert row["n_dow_days"] == len(y)
            assert row["seasonal_index"] == pytest.approx(idx, rel=1e-12)
            assert row["n_outlier_days"] == n_out, (etype, dow)


def test_dow_outlier_rule_is_sigma_not_stderr(spark, tmp_path):
    """Regression pin for the round-11 fix: with 9 same-dow days of counts
    [40]*8 + [55], the deviation is ~2.96σ — NOT an outlier under 3σ, but
    14.6 standard errors (the pre-fix rule would flag it)."""
    from polars_numba_spark.queries.relational import events_dow_seasonality

    rows = []
    eid = 0
    counts = [40] * 8 + [55]
    for wk, c in enumerate(counts):
        day = BASE + dt.timedelta(days=7 * wk)  # same weekday each week
        for _ in range(c):
            rows.append((eid, dt.datetime.combine(day, dt.time(12)), 1,
                         "view", 0.0))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    out = events_dow_seasonality(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["n_outlier_days"] == 0  # 2.96σ: inside the 3σ fence
    # and the pre-fix stderr rule WOULD have flagged it:
    y = np.array(counts, dtype=float)
    assert abs(y[-1] - y.mean()) > 3 * y.std() / math.sqrt(len(y))


# --------------------------------------------------------------------- #
# ab_conversion_ztest                                                    #
# --------------------------------------------------------------------- #
def _conversion_frame(events_pd):
    users = sorted(events_pd.loc[events_pd.user_id.notna(), "user_id"]
                   .unique())
    pc = (
        events_pd[events_pd.event_type == "purchase"]
        .groupby("user_id").size()
    )
    med = float(np.percentile(pc.to_numpy(dtype=float), 50,
                              method="linear"))
    rows = []
    for u in users:
        n_p = pc.get(u, None)
        rows.append((
            int(u),
            _md5_arm(int(u), "#ab"),
            bool(n_p is not None and float(n_p) > med),
        ))
    return rows


def test_ab_conversion_ztest(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import ab_conversion_ztest

    row = ab_conversion_ztest(spark, sf_dir).collect()[0]
    arms = _conversion_frame(events_pd)
    n_a = sum(1 for _, v, _ in arms if v == 0)
    n_b = sum(1 for _, v, _ in arms if v == 1)
    c_a = sum(1 for _, v, c in arms if v == 0 and c)
    c_b = sum(1 for _, v, c in arms if v == 1 and c)
    assert (row["n_a"], row["n_b"], row["c_a"], row["c_b"]) == (
        n_a, n_b, c_a, c_b)
    p = (c_a + c_b) / (n_a + n_b)
    se = math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
    z = (c_a / n_a - c_b / n_b) / se
    assert row["z_score"] == pytest.approx(z, rel=1e-12)
    assert row["significant"] == (abs(z) > 1.959963984540054)


# --------------------------------------------------------------------- #
# ab_value_mannwhitney — tie-corrected variance                          #
# --------------------------------------------------------------------- #
def test_ab_value_mannwhitney(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import ab_value_mannwhitney

    row = ab_value_mannwhitney(spark, sf_dir).collect()[0]

    users = sorted(events_pd.loc[events_pd.user_id.notna(), "user_id"]
                   .unique())
    cents = (
        events_pd[events_pd.event_type == "purchase"]
        .assign(c=lambda d: (d["value"] * 100).round().astype(np.int64))
        .groupby("user_id")["c"].sum()
    )
    vals = np.array([int(cents.get(u, 0)) for u in users], dtype=np.int64)
    arm = np.array([_md5_arm(int(u), "#mw") for u in users])
    # midranks over the pooled sample
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), dtype=float)
    sorted_vals = vals[order]
    i = 0
    tie_sum = 0
    while i < len(sorted_vals):
        j = i
        while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
            j += 1
        t = j - i
        midrank = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        ranks[order[i:j]] = midrank
        tie_sum += t ** 3 - t
        i = j
    n_a = int(np.sum(arm == 0))
    n_b = int(np.sum(arm == 1))
    r_a = float(np.sum(ranks[arm == 0]))
    u_a = r_a - n_a * (n_a + 1) / 2.0
    n = n_a + n_b
    var = n_a * n_b / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2.0) / math.sqrt(var)

    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    assert row["u_a"] == pytest.approx(u_a, rel=1e-12)
    assert row["z_score"] == pytest.approx(z, rel=1e-12)


# --------------------------------------------------------------------- #
# ab_value_cuped                                                         #
# --------------------------------------------------------------------- #
def test_ab_value_cuped(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import ab_value_cuped

    row = ab_value_cuped(spark, sf_dir).collect()[0]

    split = dt.datetime(2024, 1, 15)
    users = sorted(events_pd.loc[events_pd.user_id.notna(), "user_id"]
                   .unique())
    p = events_pd[events_pd.event_type == "purchase"].assign(
        c=lambda d: (d["value"] * 100).round().astype(np.int64))
    pre = p[p.ts < split].groupby("user_id")["c"].sum()
    post = p[p.ts >= split].groupby("user_id")["c"].sum()
    x = np.array([int(pre.get(u, 0)) for u in users], dtype=float)
    y = np.array([int(post.get(u, 0)) for u in users], dtype=float)
    arm = np.array([_md5_arm(int(u), "#ab") for u in users])

    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    adj = y - theta * x
    a, b = adj[arm == 0], adj[arm == 1]
    se = np.var(a) / len(a) + np.var(b) / len(b)  # population form
    z_cuped = (a.mean() - b.mean()) / math.sqrt(se)
    ya, yb = y[arm == 0], y[arm == 1]
    se0 = np.var(ya) / len(ya) + np.var(yb) / len(yb)
    z_raw = (ya.mean() - yb.mean()) / math.sqrt(se0)
    rho2 = (np.cov(x, y, bias=True)[0, 1] ** 2
            / (np.var(x) * np.var(y)))

    assert row["theta"] == pytest.approx(theta, rel=1e-10)
    assert row["adj_diff_cents"] == pytest.approx(a.mean() - b.mean(),
                                                  rel=1e-10)
    assert row["z_cuped"] == pytest.approx(z_cuped, rel=1e-10)
    assert row["z_raw"] == pytest.approx(z_raw, rel=1e-10)
    assert row["rho2"] == pytest.approx(rho2, rel=1e-10)


# --------------------------------------------------------------------- #
# events_chisq_independence                                              #
# --------------------------------------------------------------------- #
def test_events_chisq_independence(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import (
        events_chisq_independence,
    )

    row = events_chisq_independence(spark, sf_dir).collect()[0]

    df = events_pd.copy()
    df["dow"] = df["ts"].map(lambda t: t.isoweekday())
    tab = df.groupby(["event_type", "dow"]).size().unstack(fill_value=0)
    o = tab.to_numpy(dtype=float)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = float(((o - e) ** 2 / e).sum())
    dof = (o.shape[0] - 1) * (o.shape[1] - 1)
    v = math.sqrt(chi2 / (n * min(o.shape[0] - 1, o.shape[1] - 1)))

    assert row["n"] == int(n)
    assert row["dof"] == dof
    assert row["chi2"] == pytest.approx(chi2, abs=5e-6)  # 9dp term rounding
    assert row["cramers_v"] == pytest.approx(v, rel=1e-6)


# --------------------------------------------------------------------- #
# events_ols_trend / events_daily_acf                                    #
# --------------------------------------------------------------------- #
def test_events_ols_trend(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import events_ols_trend

    got = {r["event_type"]: r for r in events_ols_trend(spark, sf_dir)
           .collect()}
    df = events_pd.copy()
    df["day_idx"] = df["ts"].map(_day_idx)
    daily = (
        df.groupby(["event_type", "day_idx"]).size().rename("y")
        .reset_index()
    )
    for etype, g in daily.groupby("event_type"):
        x = (g["day_idx"] - g["day_idx"].min()).to_numpy(dtype=float)
        y = g["y"].to_numpy(dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = got[etype]
        assert row["n_days"] == len(x)
        assert row["slope"] == pytest.approx(slope, rel=1e-9)
        assert row["intercept"] == pytest.approx(intercept, rel=1e-9)
        assert row["r2"] == pytest.approx(r * r, rel=1e-9)


def test_events_daily_acf(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import events_daily_acf

    got = {(r["event_type"], r["lag"]): r
           for r in events_daily_acf(spark, sf_dir).collect()}
    df = events_pd.copy()
    df["day_idx"] = df["ts"].map(_day_idx)
    daily = (
        df.groupby(["event_type", "day_idx"]).size().rename("y")
        .reset_index()
    )
    for etype, g in daily.groupby("event_type"):
        ybar = g["y"].mean()
        dev = {int(d): c - ybar for d, c in zip(g["day_idx"], g["y"])}
        den = sum(v * v for v in dev.values())
        for lag in range(1, 8):
            num = sum(dev[d] * dev[d + lag] for d in dev if d + lag in dev)
            pairs = sum(1 for d in dev if d + lag in dev)
            if (etype, lag) not in got:
                assert pairs == 0
                continue
            row = got[(etype, lag)]
            assert row["n_pairs"] == pairs
            assert row["acf"] == pytest.approx(num / den, rel=1e-9)


# --------------------------------------------------------------------- #
# signup_survival_km                                                     #
# --------------------------------------------------------------------- #
def test_signup_survival_km(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import signup_survival_km

    got = {r["latency_days"]: r
           for r in signup_survival_km(spark, sf_dir).collect()}

    t_max = events_pd["ts"].max().date()
    s = (events_pd[events_pd.event_type == "signup"]
         .groupby("user_id")["ts"].min())
    subjects = []
    for u, t_s in s.items():
        after = events_pd[
            (events_pd.event_type == "purchase")
            & (events_pd.user_id == u)
            & (events_pd.ts >= t_s)
        ]
        if len(after):
            t_p = after["ts"].min()
            subjects.append(((t_p.date() - t_s.date()).days, True))
        else:
            subjects.append(((t_max - t_s.date()).days, False))

    days = sorted({d for d, _ in subjects})
    n_total = len(subjects)
    removed = 0
    log_s = 0.0
    for day in days:
        d_cnt = sum(1 for t, ev in subjects if t == day and ev)
        c_cnt = sum(1 for t, ev in subjects if t == day and not ev)
        n_risk = n_total - removed
        if d_cnt > 0:
            log_s += math.log(max(1.0 - d_cnt / n_risk, 1e-12))
        removed += d_cnt + c_cnt
        row = got[day]
        assert row["n_at_risk"] == n_risk
        assert row["n_events"] == d_cnt
        assert row["n_censored"] == c_cnt
        assert row["log_survival"] == pytest.approx(log_s, abs=1e-6)
        assert row["survival"] == pytest.approx(math.exp(log_s), abs=2e-6)


# --------------------------------------------------------------------- #
# events_entropy_rate                                                    #
# --------------------------------------------------------------------- #
def test_events_entropy_rate(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import events_entropy_rate

    got = {r["prev_type"]: r
           for r in events_entropy_rate(spark, sf_dir).collect()}

    df = events_pd.sort_values(["user_id", "ts", "event_id"])
    trans = {}
    for _, g in df.groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    n_all = sum(trans.values())
    from collections import defaultdict

    by_src = defaultdict(dict)
    for (a, b), c in trans.items():
        by_src[a][b] = c
    total_h = 0.0
    for src, nxt in by_src.items():
        n_from = sum(nxt.values())
        h = -sum((c / n_from) * math.log(c / n_from) for c in nxt.values())
        pi = n_from / n_all
        row = got[src]
        assert row["n_from"] == n_from
        assert row["h_cond_nats"] == pytest.approx(h, abs=1e-7)
        assert row["pi"] == pytest.approx(pi, rel=1e-12)
        assert row["contribution_nats"] == pytest.approx(pi * h, abs=1e-7)
        total_h += pi * h
    # aggregate entropy rate bounded by ln(k)
    assert 0.0 <= total_h <= math.log(len(by_src)) + 1e-9


# --------------------------------------------------------------------- #
# orders_benford_audit                                                   #
# --------------------------------------------------------------------- #
def test_orders_benford_audit(spark, sf_dir):
    from polars_numba_spark.queries.relational import orders_benford_audit

    rows = orders_benford_audit(spark, sf_dir).collect()
    got = {r["digit"]: r for r in rows}

    obs = {d: 0 for d in range(1, 10)}
    for _, _, total, _, _ in _gen_orders():
        if total > 0:
            first = int(str(int(round(total * 100)))[0])
            obs[first] += 1
    n = sum(obs.values())
    chi2 = 0.0
    for d in range(1, 10):
        exp_share = math.log10(1 + 1 / d)
        e = n * exp_share
        chi2 += (obs[d] - e) ** 2 / e
        row = got[d]
        assert row["observed"] == obs[d]
        assert row["observed_share"] == pytest.approx(obs[d] / n, rel=1e-12)
        assert row["expected_share"] == pytest.approx(exp_share, rel=1e-12)
    for r in rows:
        assert r["chi2"] == pytest.approx(chi2, abs=5e-5)


# --------------------------------------------------------------------- #
# ab_bootstrap_ci — round-11 audit fix: weights need Var[w] = 1          #
# --------------------------------------------------------------------- #
def _bs_weight(m8: int) -> int:
    return 0 if m8 < 3 else (1 if m8 < 6 else (2 if m8 < 7 else 3))


def test_bootstrap_weight_ladder_moments():
    """The generalized reweighting bootstrap is first-order correct only
    when E[w] = 1 and Var[w] = 1.  The pre-fix mod-3 uniform had
    Var[w] = 2/3 (CIs √(2/3)≈0.82× too narrow); the mod-8 ladder
    {0,0,0,1,1,1,2,3} hits both moments exactly."""
    ws = [_bs_weight(m) for m in range(8)]
    mean = sum(ws) / 8.0
    var = sum(w * w for w in ws) / 8.0 - mean * mean
    assert mean == 1.0
    assert var == 1.0
    # the old recipe, for the record:
    old = [m % 3 for m in range(3)]
    assert sum(w * w for w in old) / 3.0 - 1.0 == pytest.approx(2.0 / 3.0)


def test_ab_bootstrap_ci(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import ab_bootstrap_ci

    got = {r["variant"]: r for r in ab_bootstrap_ci(spark, sf_dir)
           .collect()}

    p = events_pd[(events_pd.event_type == "purchase")
                  & events_pd.user_id.notna()].assign(
        c=lambda d: (d["value"] * 100).round().astype(np.int64))
    cents = p.groupby("user_id")["c"].sum()
    for variant in (0, 1):
        users = [int(u) for u in cents.index
                 if _md5_arm(int(u), "#ab") == variant]
        vals = np.array([int(cents[u]) for u in users], dtype=float)
        means = []
        for b in range(1, 101):
            wts = np.array([
                _bs_weight(int(hashlib.md5(
                    (str(u) + "#bs" + str(b)).encode()
                ).hexdigest()[:15], 16) % 8)
                for u in users
            ], dtype=float)
            if wts.sum() > 0:
                means.append(((wts * vals).sum() / wts.sum(), b))
        ordered = sorted(means)
        nb = len(ordered)
        lo = ordered[math.ceil(0.025 * nb) - 1][0]
        hi = ordered[math.ceil(0.975 * nb) - 1][0]
        row = got[variant]
        assert row["n_resamples"] == nb
        assert row["ci_lo"] == pytest.approx(lo, rel=1e-12)
        assert row["ci_hi"] == pytest.approx(hi, rel=1e-12)
        # calibration: sd of resample means must track σ/√n (Var[w]=1).
        # Deterministic given the fixed hashes; the pre-fix Var[w]=2/3
        # weights put this ratio at ~0.82.
        ratio = (np.std([m for m, _ in means])
                 / (vals.std() / math.sqrt(len(vals))))
        assert 0.85 < ratio < 1.2, ratio


# --------------------------------------------------------------------- #
# ab_sequential_sprt                                                     #
# --------------------------------------------------------------------- #
def test_ab_sequential_sprt(spark, sf_dir, events_pd):
    from polars_numba_spark.queries.relational import ab_sequential_sprt

    got = {r["variant"]: r for r in ab_sequential_sprt(spark, sf_dir)
           .collect()}

    up = Decimal("0.223143551314")
    dn = Decimal("-0.182321556794")
    hi = Decimal("2.944438979166")
    arms = _conversion_frame(events_pd)  # (user_id, variant, converted)
    for variant in (0, 1):
        seq = sorted((u, c) for u, v, c in arms if v == variant)
        cum = Decimal(0)
        decision, rn_at, llr_at = "continue", None, None
        for i, (_, conv) in enumerate(seq, start=1):
            cum += up if conv else dn
            if cum >= hi:
                decision, rn_at, llr_at = "accept_h1", i, cum
                break
            if cum <= -hi:
                decision, rn_at, llr_at = "accept_h0", i, cum
                break
        row = got[variant]
        assert row["n_users"] == len(seq)
        assert row["decision"] == decision
        assert row["n_at_decision"] == rn_at
        if llr_at is None:
            assert row["llr_at_decision"] is None
        else:
            assert row["llr_at_decision"] == pytest.approx(float(llr_at),
                                                           abs=1e-9)
