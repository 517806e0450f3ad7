"""Unit tests for the wave-17 pair: weekly median value per type
(grouped nearest-rank over a composite key) and user activity-mix
entropy histogram (hand-computed expectations)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    """rows: (user_id, event_type, day_index, value)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [d * 86_400_000_000 + i
                     for i, (_, _, d, _) in enumerate(rows)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for u, _, _, _ in rows], pa.int64()),
                "event_type": pa.array([t for _, t, _, _ in rows]),
                "value": pa.array([v for _, _, _, v in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def test_weekly_p50_hand_computed(ray_session, tmp_path):
    # week 0 (days 0-6): view values 1/2/3 -> cnt 3, rank (150//100)=1
    #   (0-based) -> 200 cents; week 1 (day 7): 5/7 -> even count takes
    #   the UPPER nearest-rank value (700)
    rows = [
        (1, "view", 0, 1.0), (1, "view", 3, 2.0), (2, "view", 6, 3.0),
        (1, "view", 7, 5.0), (2, "view", 8, 7.0),
    ]
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_weekly_value_p50,
    )

    out = q_events_weekly_value_p50(str(tmp_path))
    got = {(r.event_type, r.week): (r.n, r.p50_cents)
           for r in out.itertuples()}
    assert got == {("view", 0): (3, 200), ("view", 1): (2, 700)}


def test_weekly_p50_groups_are_independent(ray_session, tmp_path):
    # two types in the same week must rank separately
    rows = [(1, "view", 0, 10.0), (1, "click", 0, 99.0),
            (2, "view", 1, 30.0)]
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_weekly_value_p50,
    )

    out = q_events_weekly_value_p50(str(tmp_path))
    got = {(r.event_type, r.week): r.p50_cents for r in out.itertuples()}
    assert got == {("view", 0): 3000, ("click", 0): 9900}


def test_activity_entropy_hand_computed(ray_session, tmp_path):
    # u1: 4x one type -> ent 0 -> bin 0
    # u2: 1 view + 1 click -> ln2 = 0.693147 -> bin 6
    # u3: 2 view + 1 click + 1 purchase -> ln4 - 2ln2/4 = 1.039721 -> 10
    rows = (
        [(1, "view", 0, 0.0)] * 4
        + [(2, "view", 0, 0.0), (2, "click", 0, 0.0)]
        + [(3, "view", 0, 0.0), (3, "view", 1, 0.0),
           (3, "click", 0, 0.0), (3, "purchase", 0, 0.0)]
    )
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import (
        q_user_activity_entropy,
    )

    out = q_user_activity_entropy(str(tmp_path))
    got = dict(zip(out["bin"], out["n_users"]))
    assert got == {0: 1, 6: 1, 10: 1}
    # pin the bin arithmetic itself
    assert int(np.floor(round(float(np.log(2.0)), 6) * 10)) == 6
