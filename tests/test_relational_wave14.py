"""Unit tests for the wave-14 pair: event-type triple supports (Apriori
k=3) and lag-1 lead-lag cross-correlation of two types' daily volumes
(hand-computed expectations on planted fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    """rows: list of (user_id, event_type, day_index)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [d * 86400_000_000 + i for i, (_, _, d) in enumerate(rows)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
                "event_type": pa.array([t for _, t, _ in rows]),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def test_triples_hand_computed(ray_session, tmp_path):
    # u1 {view, click, purchase}; u2 {view, click};
    # u3 {view, click, purchase, signup}; repeats must not double-count
    rows = [
        (1, "view", 0), (1, "click", 0), (1, "purchase", 0),
        (1, "view", 1),  # repeat
        (2, "view", 0), (2, "click", 0),
        (3, "view", 0), (3, "click", 0), (3, "purchase", 0),
        (3, "signup", 0),
    ]
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import q_event_type_triples

    out = q_event_type_triples(str(tmp_path))
    got = {
        (r.type_a, r.type_b, r.type_c): r.n_users for r in out.itertuples()
    }
    assert got == {
        ("click", "purchase", "signup"): 1,
        ("click", "purchase", "view"): 2,
        ("click", "signup", "view"): 1,
        ("purchase", "signup", "view"): 1,
    }


def test_triples_fewer_than_three_types(ray_session, tmp_path):
    _write_events(tmp_path, [(1, "view", 0), (1, "click", 0), (2, "view", 1)])
    from mysql_log_parser_ray.pipelines.queries import q_event_type_triples

    out = q_event_type_triples(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["type_a", "type_b", "type_c", "n_users"]


def test_xcorr_perfect_lead(ray_session, tmp_path):
    # views per day [1, 2, 3]; purchases [0, 1, 3]
    # pairs x=[1,2], y=[1,3]: n=2 sx=3 sy=4 sxy=7 sxx=5 syy=10
    # num=2, d1=1, d2=4 -> r = 2 / (1*2) = 1.0
    rows = (
        [(1, "view", 0)]
        + [(u, "view", 1) for u in (1, 2)]
        + [(u, "view", 2) for u in (1, 2, 3)]
        + [(1, "purchase", 1)]
        + [(u, "purchase", 2) for u in (1, 2, 3)]
    )
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import q_events_xcorr_lag1

    out = q_events_xcorr_lag1(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_pairs"], r["xcorr"]) == (2, 1.0)


def test_xcorr_gap_days_count_zero(ray_session, tmp_path):
    # views on days 0 and 2, purchase on day 1: dense x=[1,0], y=[1,0]
    # -> r = 1.0 (the day-1 view gap MUST read as 0, not be dropped)
    rows = [(1, "view", 0), (2, "purchase", 1), (3, "view", 2)]
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import q_events_xcorr_lag1

    out = q_events_xcorr_lag1(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_pairs"], r["xcorr"]) == (2, 1.0)


def test_xcorr_zero_variance_drops(ray_session, tmp_path):
    # views constant [2, 2] -> d1 = 0 -> no row (oracle WHERE clause)
    rows = [
        (1, "view", 0), (2, "view", 0), (1, "view", 1), (2, "view", 1),
        (1, "purchase", 0), (1, "purchase", 1), (2, "purchase", 1),
    ]
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import q_events_xcorr_lag1

    out = q_events_xcorr_lag1(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_pairs", "xcorr"]
