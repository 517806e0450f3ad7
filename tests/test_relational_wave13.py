"""Unit tests for the wave-13 time-series screens: Mann-Kendall trend
and Wald-Wolfowitz runs test on daily event volume (hand-computed
expectations on planted daily series)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, day_counts):
    """day_counts: list of (day_index, n_events) — builds ts values."""
    ts, eid = [], []
    k = 0
    for d, n in day_counts:
        for _ in range(n):
            ts.append(d * 86400_000_000 + k)  # us, within the day
            eid.append(k)
            k += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1] * k, pa.int64()),
                "event_type": pa.array(["view"] * k),
                "value": pa.array([0.0] * k),
                "props": pa.array(["{}"] * k),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def test_mann_kendall_increasing(ray_session, tmp_path):
    # counts 1, 2, 3 over three consecutive days: S = +3, no ties
    _write_events(tmp_path, [(0, 1), (1, 2), (2, 3)])
    from mysql_log_parser_ray.pipelines.queries import q_events_mann_kendall

    out = q_events_mann_kendall(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_days"], r["s_stat"]) == (3, 3)
    assert r["var18"] == 3 * 2 * 11  # n(n-1)(2n+5), tie term 0
    assert r["z"] == round(2.0 / np.sqrt(66.0 / 18.0), 6)


def test_mann_kendall_gap_day_counts_zero(ray_session, tmp_path):
    # days 0 and 2 observed, day 1 absent -> dense series [2, 0, 2]
    # pairs: (2,0) -1, (2,2) 0, (0,2) +1 -> S = 0, z = 0
    _write_events(tmp_path, [(0, 2), (2, 2)])
    from mysql_log_parser_ray.pipelines.queries import q_events_mann_kendall

    out = q_events_mann_kendall(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_days"], r["s_stat"], r["z"]) == (3, 0, 0.0)
    # ties: the two 2s -> t=2 term 2*1*9=18; var18 = 66 - 18 = 48
    assert r["var18"] == 48


def test_runs_test_alternating(ray_session, tmp_path):
    # daily counts [5, 1, 5, 1, 5, 2]: nearest-rank median (rank 3 of
    # sorted [1,1,2,5,5,5]) = 2; the day equal to 2 drops out, leaving
    # sides [1,0,1,0,1] -> 5 runs, n_above=3, n_below=2
    _write_events(
        tmp_path, [(0, 5), (1, 1), (2, 5), (3, 1), (4, 5), (5, 2)]
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_runs_test

    out = q_events_runs_test(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_used"], r["n_above"], r["n_below"], r["runs"]) == (
        5, 3, 2, 5)
    assert r["expected_runs"] == round((5 + 12) / 5.0, 6)
    assert r["ratio"] == round(25.0 / 17.0, 6)


def test_runs_test_one_sided_is_empty(ray_session, tmp_path):
    # constant series: every day equals the median -> nothing to test
    _write_events(tmp_path, [(0, 3), (1, 3), (2, 3)])
    from mysql_log_parser_ray.pipelines.queries import q_events_runs_test

    out = q_events_runs_test(str(tmp_path))
    assert len(out) == 0


def _write_docs(tmp_path, texts, sources=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(sources or ["s0"] * n),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_skipgram_window2_counts(ray_session, tmp_path):
    # "a b c" repeated 5x in one doc each: within each doc the pairs are
    # (a,b), (b,c) at d=1 and (a,c) at d=2 — all reach min_count=5
    _write_docs(tmp_path, ["a b c"] * 5)
    from mysql_log_parser_ray.training.registry import q_word_skipgram_topk

    out = q_word_skipgram_topk(str(tmp_path))
    got = {(r["word_a"], r["word_b"]): r["n"] for _, r in out.iterrows()}
    assert got == {("a", "b"): 5, ("b", "c"): 5, ("a", "c"): 5}
    # ordering: ties at n=5 break (word_a, word_b) ascending
    assert out["word_a"].tolist() == ["a", "a", "b"]


def test_burrows_delta_two_identical_sources_zero(ray_session, tmp_path):
    # two sources with IDENTICAL word distributions -> every fu matches,
    # all pair terms 0 -> but V=0 for every word too (no dispersion) ->
    # no usable words -> empty
    _write_docs(tmp_path, ["x y", "x y"], sources=["s0", "s1"])
    from mysql_log_parser_ray.training.registry import q_source_burrows_delta

    out = q_source_burrows_delta(str(tmp_path))
    assert len(out) == 0


def test_burrows_delta_hand_computed(ray_session, tmp_path):
    # s0: "a a b" (T=3), s1: "a b b" (T=3)
    # fu(a): s0 = 2e9//3, s1 = 1e9//3; fu(b): mirrored
    _write_docs(tmp_path, ["a a b", "a b b"], sources=["s0", "s1"])
    from mysql_log_parser_ray.training.registry import q_source_burrows_delta

    out = q_source_burrows_delta(str(tmp_path))
    assert len(out) == 1
    import math

    fa0, fa1 = 2 * 10**9 // 3, 1 * 10**9 // 3
    v = 2 * (fa0 * fa0 + fa1 * fa1) - (fa0 + fa1) ** 2
    term = math.floor(2.0 * abs(fa0 - fa1) / math.sqrt(float(v))
                      * 1e6 + 0.5)
    su = 2 * term  # words a and b are symmetric
    r = out.iloc[0]
    assert (r["src_a"], r["src_b"], r["n_words"], r["sum_units"]) == (
        "s0", "s1", 2, su)
    assert r["delta"] == round(su / (1e6 * 2), 6)


def test_anova_two_groups_matches_t_squared(ray_session, tmp_path):
    # classic identity: with 2 groups, F == t^2 (pooled-variance t).
    # groups: a = [1, 2, 3], b = [5, 6, 7] (dollars -> cents x100)
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [1.0, 2.0, 3.0, 5.0, 6.0, 7.0]
    types = ["a"] * 3 + ["b"] * 3
    n = len(vals)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([0] * n, pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array(vals),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_value_anova

    out = q_events_value_anova(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_groups"], r["n_total"]) == (2, 6)
    # exact decomposition in cents: means 200, 600; grand 400;
    # SSB = 3*(200^2) + 3*(200^2) = 240000; SSW = 20000 + 20000 = 40000
    # F = (SSB/1) / (SSW/4) = 240000 / 10000 = 24
    assert r["f_stat"] == 24.0


def test_perm_entropy_monotone_series_is_zero(ray_session, tmp_path):
    # strictly increasing daily counts -> every triple is the same
    # pattern -> H = 0
    _write_events(tmp_path, [(d, d + 1) for d in range(6)])
    from mysql_log_parser_ray.pipelines.queries import q_events_perm_entropy

    out = q_events_perm_entropy(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_triples"], r["perm_entropy"]) == (4, 0.0)


def test_perm_entropy_two_patterns(ray_session, tmp_path):
    # counts [1,2,1,2,1,2]: triples (1,2,1),(2,1,2),(1,2,1),(2,1,2) ->
    # two patterns x2 each -> H = ln 2
    import numpy as np

    _write_events(
        tmp_path, [(0, 1), (1, 2), (2, 1), (3, 2), (4, 1), (5, 2)]
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_perm_entropy

    out = q_events_perm_entropy(str(tmp_path))
    r = out.iloc[0]
    assert r["n_triples"] == 4
    lnu = lambda v: int(np.floor(np.log(np.float64(v)) * 1e6 + 0.5))
    su = 4 * lnu(4) - 2 * (2 * lnu(2))
    assert r["sum_units"] == su
    assert r["perm_entropy"] == round(su / 4e6, 6)


def test_embed_norm_histogram_hand_buckets(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # vec of all 1.0 over 64 dims: units 1e6 each -> sq = 64e12 ->
    # bucket 64; vec of all 0.5: units 5e5 -> sq = 64*25e10=16e12 ->
    # bucket 16; zero vec -> bucket 0
    vecs = [[1.0] * 64, [0.5] * 64, [0.0] * 64, [1.0] * 64]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * 4, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_embed_norm_histogram

    out = q_embed_norm_histogram(str(tmp_path))
    got = {r["bucket"]: r["n_vecs"] for _, r in out.iterrows()}
    assert got == {0: 1, 16: 1, 64: 2}
    assert out["bucket"].tolist() == [0, 16, 64]  # sorted


def test_transition_predictor_majority(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # one user, stream: a b a b a c  -> transitions a->b(2), b->a(2),
    # a->c(1); majority rule: after a predict b (2 of 3 correct),
    # after b predict a (2 of 2) -> correct = 4 of 5
    types = ["a", "b", "a", "b", "a", "c"]
    n = len(types)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(range(n), pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array([0.0] * n),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_transition_predictor_acc,
    )

    out = q_transition_predictor_acc(str(tmp_path))
    r = out.iloc[0]
    assert (r["total_transitions"], r["n_correct"]) == (5, 4)
    assert r["accuracy"] == 0.8


def test_quiet_hours_planted_gap(ray_session, tmp_path):
    # events in hours 0, 1, 5, 6 -> grid 0..6 (7 hours), zeros at
    # 2,3,4 -> 3 zero hours, longest run 3
    import pyarrow as pa
    import pyarrow.parquet as pq

    hrs = [0, 1, 5, 6]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array([h * 3600_000_000 for h in hrs],
                               pa.timestamp("us")),
                "user_id": pa.array([1] * 4, pa.int64()),
                "event_type": pa.array(["view"] * 4),
                "value": pa.array([0.0] * 4),
                "props": pa.array(["{}"] * 4),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_quiet_hours

    out = q_events_quiet_hours(str(tmp_path))
    assert out.iloc[0].tolist() == [7, 3, 3]


def test_lock_contention_hand_computed(ray_session, tmp_path):
    # docs with n_chars 40 and 80, both db = 'db' || n%3:
    # 40 -> db1: lock units 40%32=8, qt units 40%128=40
    # 80 -> db2: lock 80%32=16, qt 80
    import pyarrow as pa
    import pyarrow.parquet as pq

    nc = [40, 80]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(2), pa.int64()),
                "text": pa.array(["x" * c for c in nc]),
                "lang": pa.array(["en"] * 2),
                "source": pa.array(["s0"] * 2),
                "n_chars": pa.array(nc, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_slowlog_lock_contention,
    )

    out = q_slowlog_lock_contention(str(tmp_path))
    got = {r["db"]: (r["n_queries"], r["su_lock"], r["su_qt"],
                     r["contention"]) for _, r in out.iterrows()}
    assert got == {
        "db1": (1, 8, 40, 0.1),       # 8 / (2*40)
        "db2": (1, 16, 80, 0.1),      # 16 / (2*80)
    }


def test_cohort_revenue_two_cohorts(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # cust 1: first order 2024-01 (10.00), then 2024-03 (20.00) ->
    #   cohort 2024-01 offsets 0 and 2
    # cust 2: single order 2024-02 (5.00) -> cohort 2024-02 offset 0
    def _ts(y, m):
        import datetime

        return int(datetime.datetime(y, m, 15).timestamp() * 1_000_000)

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([1, 1, 2], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_totalprice": pa.array([10.0, 20.0, 5.0]),
                "o_orderdate": pa.array(
                    [_ts(2024, 1), _ts(2024, 3), _ts(2024, 2)],
                    pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 3),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_orders_cohort_revenue

    out = q_orders_cohort_revenue(str(tmp_path))
    got = {(r["cohort"], r["mo_offset"]): (r["n_orders"],
                                           r["revenue_cents"])
           for _, r in out.iterrows()}
    assert got == {
        ("2024-01", 0): (1, 1000),
        ("2024-01", 2): (1, 2000),
        ("2024-02", 0): (1, 500),
    }


def test_funnel_windowed_late_click_excluded(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    H = 3_600_000_000
    # user 1: view@0, click@H (inside), purchase@H+10 (inside) -> full
    # user 2: view@0, click@H+1 (late) -> view only
    # user 3: view@0, click@10, purchase@10+H+1 (late) -> view+click
    rows = [
        (1, 0, "view"), (1, H, "click"), (1, H + 10, "purchase"),
        (2, 0, "view"), (2, H + 1, "click"),
        (3, 0, "view"), (3, 10, "click"), (3, 10 + H + 1, "purchase"),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_users_funnel_windowed

    out = q_users_funnel_windowed(str(tmp_path))
    assert out.iloc[0].tolist() == [3, 2, 1]


def test_trigram_match_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # "blue bolt" vs "blue boat": trigrams of "blue bolt" = {blu, lue,
    # ue , e b,  bo, bol, olt} (7); "blue boat" = {blu, lue, ue , e b,
    #  bo, boa, oat} (7); inter = 5, union = 9 -> jaccard 0.555556.
    # "red rod" shares nothing with either at >= 0.25.
    pq.write_table(
        pa.table({
            "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
            "p_name": pa.array(["blue bolt", "blue boat", "red rod",
                                "blue bolt"]),
            "p_type": pa.array(["t"] * 4),
            "p_retailprice": pa.array([1.0] * 4),
        }),
        str(tmp_path / "part.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_parts_name_trigram_match,
    )

    out = q_parts_name_trigram_match(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["name_a"], r["name_b"]) == ("blue boat", "blue bolt")
    assert (r["n_inter"], r["n_union"]) == (5, 9)
    assert r["jaccard"] == 0.555556


def test_lineitem_flag_ols_exact_line(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # flag A lies exactly on y = 200x + 50 cents: qty 1..4,
    # price dollars 2.5, 4.5, 6.5, 8.5 -> slope 200, intercept 50.
    # flag B has a single x value -> zero denominator, dropped.
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 5.0]),
            "l_extendedprice": pa.array([2.5, 4.5, 6.5, 8.5, 1.0, 2.0]),
            "l_returnflag": pa.array(["A", "A", "A", "A", "B", "B"]),
        }),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_lineitem_flag_ols

    out = q_lineitem_flag_ols(str(tmp_path))
    assert out["l_returnflag"].tolist() == ["A"]
    r = out.iloc[0]
    assert r["n"] == 4
    assert r["slope_cents_per_qty"] == 200.0
    assert r["intercept_cents"] == 50.0


def test_session_pctl_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    M = 60_000_000  # one minute in us
    # user 1: events at 0, 10m, 50m -> gap 40m > 30m splits: sessions
    #   [0,10m] (600 s) and [50m] (0 s)
    # user 2: single event -> one 0 s session
    rows = [(1, 0), (1, 10 * M), (1, 50 * M), (2, 0)]
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_session_pctl

    out = q_events_session_pctl(str(tmp_path))
    # durations sorted: [0, 0, 600]; n=3, r50=1 -> 0, r90=2 -> 0
    assert out.iloc[0].tolist() == [3, 0, 0]


def test_balance_spend_corr_perfect_line(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # nation 0: spend = 2 * balance exactly -> r = 1.0 (cust 3 has no
    # orders: balance 0, spend 0 keeps the line exact through COALESCE)
    pq.write_table(
        pa.table({
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_name": pa.array(["a", "b", "c"]),
            "c_nationkey": pa.array([0, 0, 0], pa.int32()),
            "c_acctbal": pa.array([10.0, 20.0, 0.0]),
        }),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([1, 2, 2], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 3),
            "o_totalprice": pa.array([20.0, 30.0, 10.0]),
            "o_orderdate": pa.array([0, 0, 0], pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 3),
        }),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array([0], pa.int32()),
            "n_name": pa.array(["ALGERIA"]),
            "n_regionkey": pa.array([0], pa.int32()),
        }),
        str(tmp_path / "nation.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_nation_balance_spend_corr,
    )

    out = q_nation_balance_spend_corr(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_name"] == "ALGERIA"
    assert r["n_customers"] == 3
    assert r["corr_bal_spend"] == 1.0


def test_priority_median_lines_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # URGENT orders have 1, 2, 5 lines -> median 2 (nearest-rank r=1 at
    # n=3 -> (50*3)//100 = 1 -> first value... actually r50 = max(1,1)=1
    # -> cumwalk hits 1 at n_lines=1). LOW order has 0 lines (no
    # lineitem rows) -> median 0.
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 1], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 4),
            "o_totalprice": pa.array([1.0] * 4),
            "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
            "o_orderpriority": pa.array(
                ["1-URGENT", "1-URGENT", "1-URGENT", "5-LOW"]),
        }),
        str(tmp_path / "orders.parquet"),
    )
    lk = [1] * 1 + [2] * 2 + [3] * 5
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(lk, pa.int64()),
            "l_quantity": pa.array([1.0] * len(lk)),
            "l_extendedprice": pa.array([1.0] * len(lk)),
        }),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_priority_median_lines,
    )

    out = q_orders_priority_median_lines(str(tmp_path))
    got = {r["o_orderpriority"]: (r["n_orders"], r["p50_lines"])
           for _, r in out.iterrows()}
    assert got == {"1-URGENT": (3, 1), "5-LOW": (1, 0)}


def test_dau_mau_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    D = 86_400_000_000
    # 2 present days; day0: users {1,2}, day1: {1}; MAU = {1,2} = 2
    # stickiness = (2+1) / (2*2) = 0.75
    rows = [(1, 0), (2, 0), (1, D), (1, D + 5)]  # dup (1, day1) collapses
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_dau_mau

    out = q_events_dau_mau(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["month"] == "1970-01"
    assert (r["n_days"], r["sum_dau"], r["mau"]) == (2, 3, 2)
    assert r["stickiness"] == 0.75


def test_ewma_daily_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    D = 86_400_000_000
    # daily counts: day0=4, day1=2, day2=8
    # s0=4; resid1 = 2-4 = -2, s1 = 3; resid2 = 8-3 = 5, s2 = 5.5
    counts = {0: 4, 1: 2, 2: 8}
    ts = []
    for d, n in counts.items():
        ts += [d * D + i for i in range(n)]
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "event_type": pa.array(["view"] * len(ts)),
            "value": pa.array([0.0] * len(ts)),
            "props": pa.array(["{}"] * len(ts)),
        }),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_ewma_daily

    out = q_events_ewma_daily(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_days"], r["last_ewma"]) == (3, 5.5)
    assert (r["peak_day"], r["peak_resid"]) == (2, 5.0)


def test_above_cust_avg_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # cust 1: 10, 20, 30 -> avg 20, only 30 is above (20 is NOT >)
    # cust 2: single order -> never above its own avg
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 4),
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 5.0]),
            "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_above_cust_avg,
    )

    out = q_orders_above_cust_avg(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_orders"], r["n_above"]) == (4, 1)
    assert r["share"] == 0.25


def test_rev_7d_range_sparse_calendar(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    D = 86_400_000_000
    # days 0 (100), 5 (200), 8 (400): day 8's RANGE window covers days
    # 2..8 -> includes day 5 only -> 600 (a 3-ROWS frame would wrongly
    # include day 0)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([1, 1, 1], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 3),
            "o_totalprice": pa.array([1.0, 2.0, 4.0]),
            "o_orderdate": pa.array([0, 5 * D, 8 * D],
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 3),
        }),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_orders_rev_7d_range

    out = q_orders_rev_7d_range(str(tmp_path))
    got = {int(r["day"]): (r["rev_cents"], r["rev_7d_cents"])
           for _, r in out.iterrows()}
    assert got == {0: (100, 100), 5: (200, 300), 8: (400, 600)}


def test_top_days_ties_dense_rank(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    D = 86_400_000_000
    # counts: day0=5, day1=5, day2=3, day3=2, day4=1
    # distinct counts desc: 5,3,2 -> ranks; day4 (count 1) excluded
    counts = {0: 5, 1: 5, 2: 3, 3: 2, 4: 1}
    ts = []
    for d, n in counts.items():
        ts += [d * D + i for i in range(n)]
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "event_type": pa.array(["view"] * len(ts)),
            "value": pa.array([0.0] * len(ts)),
            "props": pa.array(["{}"] * len(ts)),
        }),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_top_days_ties

    out = q_events_top_days_ties(str(tmp_path))
    got = [(int(r["day"]), int(r["n_events"]), int(r["rnk"]))
           for _, r in out.iterrows()]
    assert got == [(0, 5, 1), (1, 5, 1), (2, 3, 2), (3, 2, 3)]


def test_word_length_hist_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["ab cde ab", "  x \t yz  ", ""]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s0"] * 3),
            "n_chars": pa.array([9, 10, 0], pa.int64()),
        }),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.training.registry import q_word_length_hist

    out = q_word_length_hist(str(tmp_path))
    got = {int(r["wlen"]): int(r["n_words"]) for _, r in out.iterrows()}
    # words: ab, cde, ab, x, yz -> len 1:1, 2:3, 3:1; empty doc adds none
    assert got == {1: 1, 2: 3, 3: 1}


def test_supplier_quartiles_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # nation 0 balances (cents): 100..400; cnt=4 ->
    # p25 idx (25*4)//100 = 1 -> 200; p50 idx 2 -> 300; p75 idx 3 -> 400
    pq.write_table(
        pa.table({
            "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
            "s_name": pa.array(["a", "b", "c", "d"]),
            "s_nationkey": pa.array([0, 0, 0, 0], pa.int32()),
            "s_acctbal": pa.array([1.0, 2.0, 3.0, 4.0]),
        }),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array([0], pa.int32()),
            "n_name": pa.array(["ALGERIA"]),
            "n_regionkey": pa.array([0], pa.int32()),
        }),
        str(tmp_path / "nation.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_supplier_balance_quartiles,
    )

    out = q_supplier_balance_quartiles(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_name"], r["p25_cents"], r["p50_cents"],
            r["p75_cents"]) == ("ALGERIA", 200, 300, 400)


def test_repeat_rate_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # seg A: cust 1 (2 orders, repeat), cust 2 (1 order), cust 3 (0) ->
    #   rate 1/3; seg B: cust 4 (3 orders) -> rate 1.0
    pq.write_table(
        pa.table({
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_name": pa.array(["a", "b", "c", "d"]),
            "c_nationkey": pa.array([0] * 4, pa.int32()),
            "c_acctbal": pa.array([0.0] * 4),
            "c_mktsegment": pa.array(["A", "A", "A", "B"]),
        }),
        str(tmp_path / "customer.parquet"),
    )
    ok = [1, 1, 2, 4, 4, 4]
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(range(len(ok)), pa.int64()),
            "o_custkey": pa.array(ok, pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(ok)),
            "o_totalprice": pa.array([1.0] * len(ok)),
            "o_orderdate": pa.array([0] * len(ok), pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * len(ok)),
        }),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_customers_repeat_rate,
    )

    out = q_customers_repeat_rate(str(tmp_path))
    got = {r["c_mktsegment"]: (r["n_customers"], r["n_repeat"],
                               r["repeat_rate"])
           for _, r in out.iterrows()}
    assert got == {"A": (3, 1, 0.333333), "B": (1, 1, 1.0)}


def test_value_cv_hand_computed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import numpy as np

    # values 1.00 and 3.00 (100, 300 cents): mean 200, pop std 100
    # -> cv = 0.5 exactly; sqrt path: sqrt(2*100000 - 400^2)... n*ss =
    # 2*(100^2+300^2)=200000 wait: ss=10000+90000=100000, n*ss=200000,
    # s^2=160000 -> sqrt(40000)=200, /400 = 0.5
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_custkey": pa.array([1, 1], pa.int64()),
            "o_orderstatus": pa.array(["O"] * 2),
            "o_totalprice": pa.array([1.0, 3.0]),
            "o_orderdate": pa.array([0] * 2, pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 2),
        }),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_orders_value_cv

    out = q_orders_value_cv(str(tmp_path))
    r = out.iloc[0]
    assert (r["o_orderpriority"], r["n"], r["cv"]) == ("1-URGENT", 2, 0.5)
