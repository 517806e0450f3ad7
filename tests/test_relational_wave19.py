"""Unit tests for the wave-19 pair: per-user median inter-event gap
histogram and daily-volume capacity bands (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    """rows: (user_id, ts_seconds)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([s * 1_000_000 for _, s in rows],
                               pa.timestamp("us")),
                "user_id": pa.array([u for u, _ in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def test_gap_median_hand_computed(ray_session, tmp_path):
    # u1 at 0, 10, 30: gaps [10, 20] -> median (50*2//100=1 0-based) 20
    #   -> bin floor(log2(21)) = 4
    # u2 at 0, 100: gap [100] -> median 100 -> floor(log2(101)) = 6
    # u3 single event -> excluded
    rows = [(1, 0), (1, 10), (1, 30), (2, 0), (2, 100), (3, 5)]
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import q_user_gap_median_hist

    out = q_user_gap_median_hist(str(tmp_path))
    got = dict(zip(out["bin"], out["n_users"]))
    assert got == {4: 1, 6: 1}


def test_gap_zero_gaps_bin_zero(ray_session, tmp_path):
    # simultaneous events: gaps [0, 0] -> median 0 -> log2(1) = 0 -> bin 0
    rows = [(1, 7), (1, 7), (1, 7)]
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import q_user_gap_median_hist

    out = q_user_gap_median_hist(str(tmp_path))
    assert out.iloc[0].tolist() == [0, 1]


def test_daily_bands_hand_computed(ray_session, tmp_path):
    # days 0..4 with counts [5, 1, 0(gap), 3, 1]: sorted [0,1,1,3,5]
    # p10 idx 0 -> 0; p50 idx 2 -> 1; p90 idx 4 -> 5
    rows = ([(1, 0)] * 5
            + [(1, 86400)]
            + [(1, 3 * 86400)] * 3
            + [(1, 4 * 86400)])
    _write_events(tmp_path, rows)
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_daily_volume_bands,
    )

    out = q_events_daily_volume_bands(str(tmp_path))
    assert out.iloc[0].tolist() == [5, 0, 1, 5]
