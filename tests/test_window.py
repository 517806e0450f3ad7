"""Tumbling windows + gap sessionization unit semantics."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events(rows):
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


ROWS = [
    (0, "2024-01-01T00:10:00", 1, "click", 1.00),
    (1, "2024-01-01T00:50:00", 1, "click", 2.00),   # same hour; 40min gap -> new session
    (2, "2024-01-01T01:25:00", 1, "buy", 0.50),     # next hour, gap 35min > 30
    (3, "2024-01-01T01:40:00", 1, "click", 0.25),   # gap 15min, same session
    (4, "2024-01-01T00:10:00", 2, "click", 10.00),
    (5, "2024-01-01T09:00:00", 2, "click", 1.00),   # huge gap, new session
]


@pytest.fixture(scope="module")
def ev_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_events(ROWS))


def test_tumbling_window(ev_ds):
    from mysql_log_parser_ray.stages.window import tumbling_window_agg

    out = tumbling_window_agg(ev_ds, window_sec=3600)
    base = 1704067200  # 2024-01-01T00:00:00Z epoch
    got = {
        (int(r.window_start), r.event_type): (int(r.n), int(r.value_cents))
        for r in out.itertuples()
    }
    assert got[(base, "click")] == (3, 1300)
    assert got[(base + 3600, "click")] == (1, 25)
    assert got[(base + 3600, "buy")] == (1, 50)
    assert got[(base + 9 * 3600, "click")] == (1, 100)


def test_sessionize_gap_semantics(ev_ds):
    from mysql_log_parser_ray.stages.window import sessionize

    out = sessionize(ev_ds, gap_sec=1800)
    u1 = out[out["user_id"] == 1]
    # user 1: events at 00:10, 00:50 (40min gap -> NEW session since > 30min),
    # 01:25 (35min -> new), 01:40 (15min -> same)
    assert list(u1["session_seq"]) == [1, 2, 3]
    assert list(u1["n_events"]) == [1, 1, 2]
    assert int(u1.iloc[2]["duration_us"]) == 15 * 60 * 1_000_000
    u2 = out[out["user_id"] == 2]
    assert list(u2["n_events"]) == [1, 1]


def test_sessionize_exact_gap_boundary(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.stages.window import sessionize

    rows = [
        (0, "2024-01-01T00:00:00", 7, "a", 0.0),
        (1, "2024-01-01T00:30:00", 7, "a", 0.0),  # exactly the gap: SAME session
        (2, "2024-01-01T01:00:00.000001", 7, "a", 0.0),  # 1us over: new
    ]
    out = sessionize(rd.from_arrow(_events(rows)), gap_sec=1800)
    assert list(out["n_events"]) == [2, 1]


def test_asof_join_broadcast(ray_session):
    import pandas as pd
    import ray.data as rd

    from mysql_log_parser_ray.stages.asof import asof_join_broadcast

    facts = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [np.datetime64(x, "us") for x in
                 ("2024-01-05", "2024-01-08", "2024-01-20", "2023-12-01")],
                pa.timestamp("us"),
            ),
            "k": pa.array([7, 7, 7, 7], pa.int64()),
        }
    )
    dim = pd.DataFrame(
        {
            "k": [7, 7],
            "valid_from": pd.to_datetime(["2024-01-01", "2024-01-08"]).astype(
                "datetime64[us]"
            ),
            "v": ["old", "new"],
        }
    )
    out = (
        asof_join_broadcast(
            rd.from_arrow(facts), dim, on="ts", by="k", dim_on="valid_from",
            columns=["id", "v"],
        )
        .to_pandas()
        .sort_values("id")
    )
    got = dict(zip(out["id"], out["v"]))
    assert got[1] == "old"
    assert got[2] == "new"      # boundary: ts == valid_from takes the new row
    assert got[3] == "new"
    assert pd.isna(got[4])      # before any version -> null (left join)


def test_asof_join_partitioned_matches_broadcast(ray_session):
    """Big-dim co-partitioned as-of join must reproduce the broadcast
    variant exactly (many keys, many versions, facts before first
    version, ties on the boundary)."""
    import pandas as pd
    import ray.data as rd

    from mysql_log_parser_ray.stages.asof import (
        asof_join_broadcast,
        asof_join_partitioned,
    )

    rng = np.random.default_rng(11)
    n_facts, n_keys = 3000, 40
    base = np.datetime64("2024-01-01", "us")
    facts = pa.table(
        {
            "id": pa.array(np.arange(n_facts), pa.int64()),
            "ts": pa.array(
                base + rng.integers(-5, 120, n_facts) * np.timedelta64(1, "D"),
                pa.timestamp("us"),
            ),
            "k": pa.array(rng.integers(0, n_keys, n_facts), pa.int64()),
            "payload": pa.array(rng.standard_normal(n_facts), pa.float64()),
        }
    )
    dim = pd.DataFrame(
        [
            {
                "k": k,
                "valid_from": pd.Timestamp("2024-01-01")
                + pd.Timedelta(days=14 * v),
                "v": f"v{k}-{v}",
                "weight": k * 10 + v,
            }
            for k in range(n_keys)
            for v in range(5)
        ]
    )
    dim["valid_from"] = dim["valid_from"].astype("datetime64[us]")
    cols = ["id", "k", "v", "weight"]
    want = (
        asof_join_broadcast(
            rd.from_arrow(facts), dim, on="ts", by="k", dim_on="valid_from",
            columns=cols,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    got = (
        asof_join_partitioned(
            rd.from_arrow(facts), rd.from_pandas(dim), on="ts", by="k",
            dim_on="valid_from", columns=cols, n_parts=8,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # facts older than every dim version must carry nulls
    assert want["v"].isna().sum() > 0


def test_sessionize_as_dataset_matches_dataframe(ray_session):
    """as_dataset=True (the scale path) must yield exactly the DataFrame
    path's rows."""
    import pandas as pd
    import ray.data as rd

    from mysql_log_parser_ray.stages.window import sessionize

    rng = np.random.default_rng(5)
    n = 5000
    base = np.datetime64("2024-03-01", "us")
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 400, n), pa.int64()),
        "ts": pa.array(
            base + rng.integers(0, 6 * 86400, n) * np.timedelta64(1_000_000, "us"),
            pa.timestamp("us"),
        ),
    }))
    df = sessionize(ev, gap_sec=900)
    ds = (
        sessionize(ev, gap_sec=900, as_dataset=True)
        .to_pandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ds, df)


def test_sessionize_invariant_to_partition_count(ray_session):
    """Bucketing must not change results: n_parts=1 (everything in one
    partition = the plain reference pass) vs n_parts=64."""
    import pandas as pd
    import ray.data as rd

    from mysql_log_parser_ray.stages.window import sessionize

    rng = np.random.default_rng(17)
    n = 4000
    base = np.datetime64("2024-02-01", "us")
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 300, n), pa.int64()),
        "ts": pa.array(
            base + rng.integers(0, 3 * 86400, n) * np.timedelta64(1_000_000, "us"),
            pa.timestamp("us"),
        ),
    }))
    a = sessionize(ev, gap_sec=1200, n_parts=1)
    b = sessionize(ev, gap_sec=1200, n_parts=64)
    pd.testing.assert_frame_equal(a, b)


def test_sessionize_hot_user_skew(ray_session):
    """Skew bound: one user owning half the events must neither break
    correctness nor land outside its single hash bucket (the documented
    partitioning assumption: busiest PARTITION fits one task)."""
    import ray.data as rd

    from mysql_log_parser_ray.stages.window import sessionize

    rng = np.random.default_rng(23)
    n = 20000
    users = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 500, n))
    base = np.datetime64("2024-04-01", "us")
    ev = rd.from_arrow(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(
            base + rng.integers(0, 10 * 86400, n) * np.timedelta64(1_000_000, "us"),
            pa.timestamp("us"),
        ),
    }))
    out = sessionize(ev, gap_sec=600)
    hot = out[out["user_id"] == 7]
    assert hot["n_events"].sum() == int((users == 7).sum())
    # sessions are disjoint, ordered, and gap-consistent for the hot user
    assert (hot["session_seq"].to_numpy() == np.arange(1, len(hot) + 1)).all()
    starts = hot["start_us"].to_numpy()
    ends = hot["end_us"].to_numpy()
    assert (starts[1:] - ends[:-1] > 600 * 1_000_000).all()
    assert out["n_events"].sum() == n


def test_asof_join_partitioned_null_keys(ray_session):
    """Review fix: a null 'by' key in a facts batch must neither re-route
    the other keys (dtype promotion) nor crash merge_asof; null-keyed
    facts come back with null dim columns."""
    import pandas as pd
    import ray.data as rd

    from mysql_log_parser_ray.stages.asof import (
        asof_join_broadcast,
        asof_join_partitioned,
    )

    base = np.datetime64("2024-01-10", "us")
    facts = pa.table({
        "id": pa.array(np.arange(8), pa.int64()),
        "ts": pa.array([base + np.timedelta64(i, "D") for i in range(8)],
                       pa.timestamp("us")),
        "k": pa.array([7, 7, None, 9, 9, None, 7, 9], pa.int64()),
    })
    dim = pd.DataFrame({
        "k": [7, 9],
        "valid_from": pd.to_datetime(["2024-01-01", "2024-01-01"]).astype(
            "datetime64[us]"),
        "v": ["seven", "nine"],
    })
    got = (
        asof_join_partitioned(
            rd.from_arrow(facts), rd.from_pandas(dim), on="ts", by="k",
            dim_on="valid_from", columns=["id", "v"], n_parts=4,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    want = (
        asof_join_broadcast(
            rd.from_arrow(facts), dim, on="ts", by="k",
            dim_on="valid_from", columns=["id", "v"],
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got.loc[got["id"].isin([2, 5]), "v"].isna().all()
    assert (got.loc[got["id"].isin([0, 1, 6]), "v"] == "seven").all()
    pd.testing.assert_frame_equal(got, want)


def test_stable_partition_null_immune():
    """Review fix root cause: the partition of a key must not depend on
    whether its batch happened to contain a null."""
    from mysql_log_parser_ray.partition import stable_partition

    clean = pa.chunked_array([pa.array([1, 2, 3, 42], pa.int64())])
    dirty = pa.chunked_array([pa.array([1, 2, None, 42], pa.int64())])
    pc_ = stable_partition(clean, 64)
    pd_ = stable_partition(dirty, 64)
    assert pc_[0] == pd_[0] and pc_[1] == pd_[1] and pc_[3] == pd_[3]
    assert pd_[2] == 0  # nulls deterministically in partition 0


def test_hopping_window(ev_ds):
    """1h windows hopping every 15min: an event at minute m lands in the 4
    hop-aligned windows covering it; counts/sums match a brute-force
    per-event check."""
    from mysql_log_parser_ray.stages.window import hopping_window_agg

    out = hopping_window_agg(ev_ds, window_sec=3600, hop_sec=900)
    base = 1704067200

    # brute force over ROWS
    want = {}
    for _eid, ts, _uid, etype, val in ROWS:
        us = int(np.datetime64(ts, "us").astype(np.int64))
        sec = us // 1_000_000
        k_hi = sec // 900
        for j in range(4):
            key = ((k_hi - j) * 900, etype)
            n, cents = want.get(key, (0, 0))
            want[key] = (n + 1, cents + int(np.floor(val * 100 + 0.5)))
    got = {
        (int(r.window_start), r.event_type): (int(r.n), int(r.value_cents))
        for r in out.itertuples()
    }
    assert got == want
    # spot check: the 00:10 events (users 1+2) share windows 23:15..00:00
    assert got[(base - 900, "click")] == (2, 1100)
    assert got[(base, "click")][0] >= 2


def test_hopping_window_validates_hop(ev_ds):
    from mysql_log_parser_ray.stages.window import hopping_window_agg

    with pytest.raises(ValueError):
        hopping_window_agg(ev_ds, window_sec=3600, hop_sec=1000)


def test_hopping_window_drops_null_ts(ray_session):
    import ray.data as rd
    from mysql_log_parser_ray.stages.window import hopping_window_agg

    t = pa.table(
        {
            "ts": pa.array([np.datetime64("2024-01-01T00:00:00", "us"), None],
                           pa.timestamp("us")),
            "event_type": pa.array(["a", "a"]),
            "value": pa.array([1.0, 1.0]),
        }
    )
    out = hopping_window_agg(rd.from_arrow(t), window_sec=3600, hop_sec=1800)
    assert int(out["n"].sum()) == 2  # one valid event x 2 covering windows


def test_window_null_value_skipped_in_cents(ray_session):
    """SQL SUM semantics on a null VALUE: counted in n, skipped by the
    cents sum (a raw NaN->int64 cast used to poison the sum with
    INT64_MIN)."""
    import ray.data as rd
    from mysql_log_parser_ray.stages.window import (
        hopping_window_agg,
        tumbling_window_agg,
    )

    ts = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table(
        {
            "ts": pa.array([ts, ts, ts], pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "a"]),
            "value": pa.array([1.5, None, 2.0], pa.float64()),
        }
    )
    out = tumbling_window_agg(rd.from_arrow(t), window_sec=3600)
    assert len(out) == 1
    assert int(out["n"].iloc[0]) == 3
    assert int(out["value_cents"].iloc[0]) == 350

    hop = hopping_window_agg(rd.from_arrow(t), window_sec=3600, hop_sec=1800)
    assert int(hop["n"].sum()) == 6  # 3 events x 2 covering windows
    assert int(hop["value_cents"].sum()) == 700


# ---------------------------------------------------------------------------
# Interval (range) join — stages/interval.py
# ---------------------------------------------------------------------------

def _facts_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(
                    [np.datetime64(ts, "us") for ts, _ in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([et for _, et in rows]),
            }
        )
    )


def test_interval_join_overlap_and_boundaries(ray_session):
    """An event inside two overlapping windows counts in both; start is
    inclusive, end exclusive; window_id refers to the ORIGINAL (unsorted)
    window positions."""
    from mysql_log_parser_ray.stages.interval import interval_join_counts

    h = 3_600_000_000
    base = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
    # window 0: [02:00, 04:00) ; window 1: [00:00, 03:00)  (unsorted input)
    starts = np.array([base + 2 * h, base], dtype=np.int64)
    ends = np.array([base + 4 * h, base + 3 * h], dtype=np.int64)
    facts = _facts_ds(
        [
            ("2024-01-01T02:30:00", "a"),  # in both windows
            ("2024-01-01T00:00:00", "a"),  # start-inclusive (window 1 only)
            ("2024-01-01T04:00:00", "a"),  # end-exclusive -> no window
            ("2024-01-01T03:30:00", "b"),  # window 0 only
        ]
    )
    out = interval_join_counts(facts, starts, ends)
    got = {
        (int(r.window_id), r.event_type): int(r.n_events)
        for r in out.itertuples()
    }
    assert got == {(0, "a"): 1, (0, "b"): 1, (1, "a"): 2}


def test_interval_join_duplicate_starts_fallback(ray_session):
    """Duplicate window starts break the min-gap layout bound; the probe
    must fall back to checking every window, not silently drop matches."""
    from mysql_log_parser_ray.stages.interval import interval_join_counts

    h = 3_600_000_000
    base = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
    starts = np.array([base, base, base + h], dtype=np.int64)
    ends = np.array([base + h, base + 2 * h, base + 2 * h], dtype=np.int64)
    facts = _facts_ds([("2024-01-01T00:30:00", "a"), ("2024-01-01T01:30:00", "a")])
    out = interval_join_counts(facts, starts, ends)
    got = {
        (int(r.window_id), r.event_type): int(r.n_events)
        for r in out.itertuples()
    }
    assert got == {(0, "a"): 1, (1, "a"): 2, (2, "a"): 1}


def test_interval_join_no_matches(ray_session):
    from mysql_log_parser_ray.stages.interval import interval_join_counts

    h = 3_600_000_000
    base = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
    starts = np.array([base], dtype=np.int64)
    ends = np.array([base + h], dtype=np.int64)
    facts = _facts_ds([("2024-06-01T00:00:00", "a")])
    out = interval_join_counts(facts, starts, ends)
    assert len(out) == 0
    assert list(out.columns) == ["window_id", "event_type", "n_events"]


def test_interval_join_partitioned_matches_broadcast(ray_session):
    """The co-partitioned big-window path must agree with the broadcast
    path on an adversarial layout: windows spanning multiple buckets,
    duplicate starts, and facts on bucket boundaries."""
    import ray.data as rd
    from mysql_log_parser_ray.stages.interval import (
        interval_join_counts,
        interval_join_counts_partitioned,
    )

    rng = np.random.default_rng(7)
    h = 3_600_000_000
    base = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
    # 40 windows: stride 1h, widths 1-9h (span up to 3 4h-buckets); two
    # duplicate starts
    k = np.arange(40, dtype=np.int64)
    starts = base + k * h
    ends = starts + (1 + k % 9) * h
    starts[7] = starts[6]  # duplicate start
    ts = base + rng.integers(-2 * h, 45 * h, size=3000)
    et = rng.choice(["a", "b", "c"], size=3000)
    facts = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(et, pa.string()),
            }
        )
    ).repartition(6)
    want = interval_join_counts(facts, starts, ends)
    windows = rd.from_arrow(
        pa.table(
            {
                "window_id": pa.array(np.arange(40), pa.int64()),
                "start_us": pa.array(starts, pa.int64()),
                "end_us": pa.array(ends, pa.int64()),
            }
        )
    ).repartition(3)
    got = interval_join_counts_partitioned(
        facts, windows, bucket_us=4 * h, n_parts=8
    )
    assert got.equals(want)
    assert len(got) > 50  # layout actually produced matches


def test_conversion_attribution_edges(ray_session, monkeypatch, tmp_path):
    """Boundary semantics: same-ts click counts, exactly-30min click
    counts (inclusive), older click does not, clicks never leak across
    users, click AFTER purchase does not attribute."""
    import pyarrow.parquet as pq
    from mysql_log_parser_ray.pipelines.queries import q_conversion_attribution

    m = 60 * 1_000_000
    base = int(np.datetime64("2024-01-05T12:00:00", "us").astype(np.int64))
    rows = [
        # u1: click at t, purchase at t -> converted (same-ts inclusive)
        (1, base, "click"), (1, base, "purchase"),
        # u2: click exactly 30min before -> converted (inclusive)
        (2, base - 30 * m, "click"), (2, base, "purchase"),
        # u3: click 31min before -> NOT converted
        (3, base - 31 * m, "click"), (3, base, "purchase"),
        # u4: click AFTER purchase -> NOT converted
        (4, base + m, "click"), (4, base, "purchase"),
        # u5: no click at all; u1's click must not leak -> NOT converted
        (5, base, "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_conversion_attribution(str(tmp_path))
    assert out["n_purchases"].tolist() == [5]
    assert out["n_converted"].tolist() == [2]


@pytest.mark.skipif(
    os.environ.get("MLPR_BIG_TESTS") != "1",
    reason="~5 min at the 4-CPU test session; run with MLPR_BIG_TESTS=1 "
    "(measured run recorded in BASELINE.md round 3)",
)
def test_interval_join_partitioned_at_scale(ray_session):
    """5M facts x 50k overlapping windows through the co-partitioned path:
    identical counts to the broadcast probe, and the driver's Python heap
    stays bounded by the OUTPUT (windows x keys) cardinality — nothing
    fact-cardinality is ever collected."""
    import tracemalloc

    import ray.data as rd
    from mysql_log_parser_ray.stages.interval import (
        interval_join_counts,
        interval_join_counts_partitioned,
    )

    rng = np.random.default_rng(11)
    minute = 60_000_000
    base = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
    n_win, n_facts = 50_000, 5_000_000
    k = np.arange(n_win, dtype=np.int64)
    starts = base + k * 10 * minute              # stride 10 min
    ends = starts + (5 + k % 26) * minute        # widths 5-30 min
    ts = base + rng.integers(0, n_win * 10 * minute, size=n_facts)
    et = rng.choice(["a", "b", "c"], size=n_facts)
    facts = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(et, pa.string()),
            }
        )
    ).repartition(32).materialize()
    windows = rd.from_arrow(
        pa.table(
            {
                "window_id": pa.array(k, pa.int64()),
                "start_us": pa.array(starts, pa.int64()),
                "end_us": pa.array(ends, pa.int64()),
            }
        )
    ).repartition(8)

    want = interval_join_counts(facts, starts, ends)

    tracemalloc.start()
    got = interval_join_counts_partitioned(
        facts, windows, bucket_us=3_600_000_000, n_parts=64
    )
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    assert got.equals(want)
    assert len(got) > 100_000  # output really is windows x keys sized
    # peak driver PYTHON heap bounded by a small multiple of the output
    # frame (5M facts would be ~120MB+ as a single int64 column alone)
    out_bytes = got.memory_usage(deep=True).sum()
    assert peak < 6 * out_bytes + 64 * 1024 * 1024


def test_rolling_max3_hot_key_skew(ray_session, tmp_path):
    """One user owning 97% of all events (the hot-key regime): the
    bucketed kernel must stay correct — verified against a pandas
    rolling reference — and the hot user's rows all land in one
    vectorized pass, not a per-user loop."""
    import pandas as pd
    import pyarrow.parquet as pq
    from mysql_log_parser_ray.pipelines.queries import q_events_rolling_max3

    rng = np.random.default_rng(3)
    n_hot, n_cold = 150_000, 5_000
    user = np.concatenate(
        [np.zeros(n_hot, np.int64), rng.integers(1, 50, n_cold)]
    )
    n = len(user)
    secs = rng.integers(0, 10 * 86400, n)
    vals = rng.integers(0, 50000, n) / 100.0
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(1704067200_000_000 + secs * 1_000_000,
                           pa.timestamp("us")),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(
                np.where(np.arange(n) % 2 == 0, "click", "view"), pa.string()
            ),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array([""] * n, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = q_events_rolling_max3(str(tmp_path))

    df = t.to_pandas()
    df["cents"] = np.floor(df["value"] * 100 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"])
    rm = (
        df.groupby("user_id")["cents"]
        .rolling(3, min_periods=1)
        .max()
        .reset_index(level=0, drop=True)
        .astype(np.int64)
    )
    df["rm"] = rm
    want = (
        df.groupby("event_type", as_index=False)
        .agg(n=("rm", "size"), rollmax_cents=("rm", "sum"))
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    got2 = got[["event_type", "n", "rollmax_cents"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want)


def test_validate_stage_kinds(ray_session):
    """Rule semantics: nulls, range bounds inclusive, set membership,
    regex full-match, and a missing column counting every row."""
    import ray.data as rd
    from mysql_log_parser_ray.stages.validate import validate

    t = pa.table(
        {
            "a": pa.array([1.0, 5.0, None, -1.0], pa.float64()),
            "k": pa.array(["x", "y", "z", "x"], pa.string()),
            "s": pa.array(["ab", "a", "abb", ""], pa.string()),
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    out = validate(
        ds,
        [
            ("null_a", "not_null", ("a",)),
            ("range_a", "in_range", ("a", 1.0, 5.0)),  # null + (-1) violate
            ("set_k", "in_set", ("k", ("x", "y"))),
            ("re_s", "regex", ("s", r"ab*")),  # "" violates (no fullmatch)
            ("missing", "not_null", ("zzz",)),
        ],
    )
    got = dict(zip(out["rule"], out["n_violations"]))
    assert got == {"null_a": 1, "range_a": 2, "set_k": 1, "re_s": 1, "missing": 4}
    assert set(out["n_rows"]) == {4}


def test_validate_stage_empty_input(ray_session):
    import ray.data as rd
    from mysql_log_parser_ray.stages.validate import validate

    ds = rd.from_arrow(pa.table({"a": pa.array([], pa.float64())}))
    out = validate(ds, [("null_a", "not_null", ("a",))])
    assert out["rule"].tolist() == ["null_a"]
    assert out["n_rows"].tolist() == [0]
    assert out["n_violations"].tolist() == [0]


def test_latest_value_update_chain(ray_session, tmp_path):
    """Keep-newest compaction: three updates to one key keep only the last
    (ts, then event_id tiebreak); a second key with one event survives."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_events_latest_value

    ts = np.array(
        ["2024-01-01T00:00:00", "2024-01-01T00:05:00", "2024-01-01T00:05:00",
         "2024-01-01T00:01:00"],
        dtype="datetime64[us]",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([10, 11, 12, 20], pa.int64()),
                "ts": pa.array(ts),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "event_type": pa.array(["click"] * 3 + ["view"], pa.string()),
                "value": pa.array([1.0, 2.0, 3.0, 9.5], pa.float64()),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = q_events_latest_value(str(tmp_path))
    # user 1 / click: ts tie between event 11 and 12 -> higher event_id (12)
    assert out[out["event_type"] == "click"]["latest_value_cents"].tolist() == [300]
    assert out[out["event_type"] == "click"]["n_keys"].tolist() == [1]
    assert out[out["event_type"] == "view"]["latest_value_cents"].tolist() == [950]
