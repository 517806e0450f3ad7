"""Unit tests for the wave-38 pair: per-class lock-pressure ratio and
the weekend-effect read."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_lock_ratio_hand_computed(ray_session, tmp_path):
    # one class (n_chars % 4 == 3 for both docs): n_chars 7, 11
    # qt quarters: 7 + 11 = 18 -> sum_qt 4.5
    # lock eighths: 7 + 11 = 18 -> sum_lock 2.25 -> ratio 18/36 = 0.5
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["x" * 7, "x" * 11]),
                "lang": pa.array(["en"] * 2),
                "source": pa.array(["src0"] * 2),
                "n_chars": pa.array([7, 11], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_slowlog_lock_ratio_by_class,
    )

    out = q_slowlog_lock_ratio_by_class(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_queries"], r["sum_qt"], r["sum_lock"],
            r["lock_ratio"]) == (2, 4.5, 2.25, 0.5)


def _write_events(tmp_path, rows):
    """rows: (day, value)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([d * 86_400_000_000 + i
                                for i, (d, _) in enumerate(rows)],
                               pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([v for _, v in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def test_weekend_effect_hand_computed(ray_session, tmp_path):
    # day 0 = Thursday (weekday), day 2 = Saturday, day 3 = Sunday
    # weekday: 2 events $1+$2; weekend: 2 events $5+$5
    # ratio = (2*5) / (2*2) = 2.5
    _write_events(tmp_path, [(0, 1.0), (0, 2.0), (2, 5.0), (3, 5.0)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_weekend_effect,
    )

    out = q_events_weekend_effect(str(tmp_path))
    got = {r.bucket: (r.n_events, r.value_cents, r.per_day_ratio)
           for r in out.itertuples()}
    assert got == {"weekday": (2, 300, 2.5), "weekend": (2, 1000, 2.5)}


def test_weekend_effect_single_bucket(ray_session, tmp_path):
    # only weekday traffic: one row, ratio sentinel 0.0
    _write_events(tmp_path, [(0, 1.0), (1, 1.0)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_weekend_effect,
    )

    out = q_events_weekend_effect(str(tmp_path))
    assert out.iloc[0].tolist() == ["weekday", 2, 200, 0.0]
    assert len(out) == 1
