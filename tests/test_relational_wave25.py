"""Unit tests for the wave-25 pair: sessions-per-user histogram
(composition over the distributed sessionizer) and the fingerprint
collision audit."""

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


def test_sessions_hist_hand_computed(ray_session, tmp_path):
    # u1: events at 0, 100 (one session), 4000 (gap 3900 > 1800 -> new)
    # u2: single event -> 1 session
    _write_events(tmp_path, [(1, 0), (1, 100), (1, 4000), (2, 7)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_sessions_per_user_hist,
    )

    out = q_events_sessions_per_user_hist(str(tmp_path))
    got = dict(zip(out["n_sessions"], out["n_users"]))
    assert got == {1: 1, 2: 1}


def test_sessions_hist_gap_boundary_is_strict(ray_session, tmp_path):
    # gap of exactly 1800 s stays ONE session (the sessionizer breaks on
    # strictly-greater gaps)
    _write_events(tmp_path, [(1, 0), (1, 1800)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_sessions_per_user_hist,
    )

    out = q_events_sessions_per_user_hist(str(tmp_path))
    assert out.iloc[0].tolist() == [1, 1]


def test_fingerprint_collisions_zero_on_clean_corpus(ray_session,
                                                     tmp_path):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(["x" * n for n in range(4)]),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["src0"] * 4),
                "n_chars": pa.array([0, 1, 2, 3], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_slowlog_fingerprint_collisions,
    )

    out = q_slowlog_fingerprint_collisions(str(tmp_path))
    assert out.iloc[0].tolist() == [4, 4, 4, 0, 0]
