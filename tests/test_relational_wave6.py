"""Invariant unit tests for the sixth relational/analytics wave:
TPC-H Q10/Q14 shapes, inter-arrival gaps, per-type OLS trend, weekly
churn, and source-vocabulary Jaccard. Exact-value parity vs DuckDB is
covered by tests/test_oracle_parity.py; these pin the structural
invariants that parity alone would not explain on a regression."""

import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_q10_topk_is_sorted_and_bounded(ray_session):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q10_returns

    out = q_tpch_q10_returns(SF)
    assert len(out) <= 20
    rev = out["revenue_cents"].to_numpy()
    assert (np.diff(rev) <= 0).all()  # revenue descending
    # custkey ascending within equal revenue
    for _, g in out.groupby("revenue_cents"):
        ck = g["c_custkey"].to_numpy()
        assert (np.diff(ck) > 0).all()
    assert (out["n_lines"] > 0).all()
    assert out["n_name"].notna().all()


def test_q14_promo_share_within_bounds(ray_session):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q14_promo

    out = q_tpch_q14_promo(SF)
    assert len(out) > 0
    assert (out["promo_cents"] <= out["total_cents"]).all()
    assert ((out["promo_pct"] >= 0) & (out["promo_pct"] <= 100)).all()
    assert list(out["month"]) == sorted(out["month"])


def test_interarrival_gaps_nonnegative_and_single_event_users_absent(
    ray_session,
):
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_events_interarrival

    out = q_events_interarrival(SF)
    assert (out["n_gaps"] >= 1).all()
    assert (out["avg_gap_sec"] >= 0).all()
    assert (out["max_gap_sec"] >= out["avg_gap_sec"] - 1e-9).all()
    ev = pq.read_table(
        os.path.join(SF, "events.parquet"), columns=["user_id"]
    ).to_pandas()
    vc = ev["user_id"].value_counts()
    single = set(vc[vc == 1].index)
    assert single.isdisjoint(set(out["user_id"]))
    # every multi-event user has exactly (n_events - 1) gaps
    multi = vc[vc > 1]
    got = dict(zip(out["user_id"], out["n_gaps"]))
    assert all(got[u] == n - 1 for u, n in multi.items())


def test_type_trend_matches_numpy_polyfit(ray_session):
    """The exact-integer slope must agree with float least squares to
    well inside rounding noise (they differ only in summation order)."""
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_events_type_trend

    out = q_events_type_trend(SF)
    ev = pq.read_table(
        os.path.join(SF, "events.parquet"),
        columns=["ts", "event_type", "value"],
    ).to_pandas()
    ev = ev.dropna(subset=["ts", "value"])
    us = ev["ts"].astype("int64")
    hr = np.floor(us.to_numpy(np.float64) / 3.6e9).astype(np.int64) % 24
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    for _, row in out.iterrows():
        m = (ev["event_type"] == row["event_type"]).to_numpy()
        slope, icept = np.polyfit(hr[m], cents[m], 1)
        assert abs(slope - row["slope_cents_per_hour"]) < 1e-6
        assert abs(icept - row["intercept_cents"]) < 1e-5


def test_weekly_churn_bounds_and_trailing_week(ray_session):
    from mysql_log_parser_ray.pipelines.queries import q_users_weekly_churn

    out = q_users_weekly_churn(SF)
    assert len(out) > 0
    assert (out["n_churned"] <= out["n_active"]).all()
    # the last observed week has no successor: everyone churns
    last = out.iloc[-1]
    assert last["n_churned"] == last["n_active"]
    assert last["churn_pct"] == 100.0


def test_source_vocab_jaccard_bounds_and_symmetric_sizes(ray_session):
    from mysql_log_parser_ray.training.registry import q_source_vocab_jaccard

    out = q_source_vocab_jaccard(SF)
    assert len(out) > 0
    assert (out["src_a"] < out["src_b"]).all()
    assert (out["n_inter"] <= np.minimum(out["n_a"], out["n_b"])).all()
    assert ((out["jaccard"] > 0) & (out["jaccard"] <= 1)).all()
    # a source's vocabulary size must be reported identically wherever
    # it appears (diagonal fold consistency)
    sizes = {}
    for _, r in out.iterrows():
        for s, n in ((r["src_a"], r["n_a"]), (r["src_b"], r["n_b"])):
            assert sizes.setdefault(s, n) == n


def test_dormant_rich_threshold_and_antijoin(ray_session):
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_customers_dormant_rich

    out = q_customers_dormant_rich(SF)
    cust = pq.read_table(os.path.join(SF, "customer.parquet")).to_pandas()
    cents = np.floor(cust["c_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
    pos = cents[cents > 0]
    n_rich = int((cents * len(pos) > pos.sum()).sum())
    # the anti-join can only shrink the above-average population
    assert 0 < out["n_cust"].sum() <= n_rich
    assert (out["acctbal_cents"] > 0).all()


def test_pctrank_exactness_per_type(ray_session):
    from mysql_log_parser_ray.pipelines.queries import q_events_value_pctrank

    out = q_events_value_pctrank(SF)
    assert ((out["pct_rank"] >= 0) & (out["pct_rank"] <= 1)).all()
    for _, g in out.groupby("event_type"):
        # strictly increasing value -> non-decreasing rank; first is 0,
        # max is (n_type - n_last)/(n_type - 1) <= 1
        assert g["value_cents"].is_monotonic_increasing
        assert g["pct_rank"].iloc[0] == 0.0
        assert g["pct_rank"].is_monotonic_increasing


def test_rolling_wau_dominates_daily_distinct(ray_session):
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_events_rolling_wau

    out = q_events_rolling_wau(SF)
    ev = pq.read_table(
        os.path.join(SF, "events.parquet"), columns=["ts", "user_id"]
    ).to_pandas().dropna()
    day = np.floor(
        ev["ts"].astype("int64").to_numpy(np.float64) / 86400e6
    ).astype(np.int64)
    got = dict(zip(out["day"], out["n_active_7d"]))
    # a trailing-window count can never be below that single day's
    # distinct users, and never above the global distinct-user count
    n_users = ev["user_id"].nunique()
    import pandas as pd
    dd = pd.DataFrame({"u": ev["user_id"].to_numpy(), "d": day}).drop_duplicates()
    for d, n in dd.groupby("d").size().items():
        assert got[d] >= n
        assert got[d] <= n_users
