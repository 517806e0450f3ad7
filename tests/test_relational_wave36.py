"""Unit tests for the wave-36 pair: MODE aggregate per flag and
day-1 onboarding intensity deciles."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_qty_mode_tie_breaks_low(ray_session, tmp_path):
    # flag A: qty 5 x2, qty 3 x2, qty 9 x1 -> tie between 3 and 5 at
    # count 2 -> mode 3; share 2/5 = 0.4
    qtys = [5.0, 5.0, 3.0, 3.0, 9.0]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(5), pa.int64()),
                "l_partkey": pa.array([1] * 5, pa.int64()),
                "l_suppkey": pa.array([1] * 5, pa.int64()),
                "l_quantity": pa.array(qtys),
                "l_extendedprice": pa.array([1.0] * 5),
                "l_discount": pa.array([0.0] * 5),
                "l_tax": pa.array([0.0] * 5),
                "l_returnflag": pa.array(["A"] * 5),
                "l_shipdate": pa.array([0] * 5, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_lineitem_qty_mode

    out = q_lineitem_qty_mode(str(tmp_path))
    assert out.iloc[0].tolist() == ["A", 3, 2, 5, 0.4]


def test_day1_intensity_bins(ray_session, tmp_path):
    # u1: 4 events all on day 0 -> bin 10 (single-day user)
    # u2: 1 of 4 events on first day -> bin (10*1)//4 = 2
    rows = [(1, 0)] * 4 + [(2, 0), (2, 1), (2, 1), (2, 2)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([d * 86_400_000_000 + i
                                for i, (_, d) in enumerate(rows)],
                               pa.timestamp("us")),
                "user_id": pa.array([u for u, _ in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_users_day1_intensity

    out = q_users_day1_intensity(str(tmp_path))
    got = dict(zip(out["decile_bin"], out["n_users"]))
    assert got == {10: 1, 2: 1}
