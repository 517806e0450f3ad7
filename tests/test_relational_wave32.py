"""Unit tests for the wave-32 pair: top-1% whale share of event value
and per-user slow-log Query_time percentiles."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_top1pct_share_hand_computed(ray_session, tmp_path):
    # values $1..$200: cut = (99*200)//100 = 198 (0-based) -> p99 =
    # 199th value = 19900 cents; top mass = the single $200 event;
    # total = 2_010_000 cents -> share = 0.009950
    vals = [float(i) for i in range(1, 201)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(200), pa.int64()),
                "ts": pa.array([0] * 200, pa.timestamp("us")),
                "user_id": pa.array([1] * 200, pa.int64()),
                "event_type": pa.array(["view"] * 200),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * 200),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_value_top1pct_share,
    )

    out = q_events_value_top1pct_share(str(tmp_path))
    assert out.iloc[0].tolist() == [200, 19900, 20000, 0.00995]


def test_top1pct_all_equal_has_empty_tail(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array([0] * 4, pa.timestamp("us")),
                "user_id": pa.array([1] * 4, pa.int64()),
                "event_type": pa.array(["view"] * 4),
                "value": pa.array([5.0] * 4),
                "props": pa.array(["{}"] * 4),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_value_top1pct_share,
    )

    out = q_events_value_top1pct_share(str(tmp_path))
    assert out.iloc[0].tolist() == [4, 500, 0, 0.0]


def test_user_qt_p95_hand_computed(ray_session, tmp_path):
    # n_chars [0, 1, 2, 3, 5]: users u0{0,5}, u1{1}, u2{2}, u3{3}
    # u0: sorted [0,5] -> p50 idx (100//100)=1 -> 5; p95 idx 1 -> 5
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(["x" * n for n in (0, 1, 2, 3, 5)]),
                "lang": pa.array(["en"] * 5),
                "source": pa.array(["src0"] * 5),
                "n_chars": pa.array([0, 1, 2, 3, 5], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_slowlog_user_qt_p95

    out = q_slowlog_user_qt_p95(str(tmp_path))
    got = {r.user: (r.p50_q, r.p95_q) for r in out.itertuples()}
    assert got == {"u0": (5, 5), "u1": (1, 1), "u2": (2, 2),
                   "u3": (3, 3)}
