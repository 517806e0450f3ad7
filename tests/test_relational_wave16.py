"""Unit tests for the wave-16 pair: dow x hour traffic heatmap and
first-vs-last order spend trajectory (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_heatmap_dow_anchor_and_shares(ray_session, tmp_path):
    # epoch day 0 = Thursday -> dow (Sunday=0) = 4; day 3 = Sunday -> 0
    # Thursday: two events at hour 0, one at hour 5; Sunday: one at 23
    us = [0, 1_000, 5 * 3_600_000_000,
          3 * 86_400_000_000 + 23 * 3_600_000_000]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array(us, pa.timestamp("us")),
                "user_id": pa.array([1, 2, 3, 4], pa.int64()),
                "event_type": pa.array(["view"] * 4),
                "value": pa.array([0.0] * 4),
                "props": pa.array(["{}"] * 4),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_dow_hour_heatmap,
    )

    out = q_events_dow_hour_heatmap(str(tmp_path))
    got = {(r.dow, r.hod): (r.n_events, r.dow_share)
           for r in out.itertuples()}
    assert got == {
        (4, 0): (2, 0.666667),
        (4, 5): (1, 0.333333),
        (0, 23): (1, 1.0),
    }


def _write_orders(tmp_path, rows):
    """rows: (okey, cust, day, price)."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([r[3] for r in rows],
                                         pa.float64()),
                "o_orderdate": pa.array(
                    [r[2] * 86_400_000_000 for r in rows],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )


def test_first_last_delta_hand_computed(ray_session, tmp_path):
    # cust 1: day0 $10 -> day5 $20 (grew); cust 2: day0 $30 -> day1 $5
    # (shrank); cust 3: single order (excluded); cust 4: same-day tie ->
    # orderkey breaks it: okey 40 $7 first, okey 41 $7 last (flat)
    _write_orders(tmp_path, [
        (10, 1, 0, 10.0), (11, 1, 5, 20.0),
        (20, 2, 0, 30.0), (21, 2, 1, 5.0),
        (30, 3, 0, 99.0),
        (40, 4, 2, 7.0), (41, 4, 2, 7.0),
    ])
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_first_last_delta,
    )

    out = q_orders_first_last_delta(str(tmp_path))
    assert out.iloc[0].tolist() == [3, 1, 1, 0.333333]


def test_first_last_delta_tie_breaks_on_orderkey(ray_session, tmp_path):
    # same-day orders, different prices: okey order decides first/last
    _write_orders(tmp_path, [(2, 1, 0, 50.0), (1, 1, 0, 10.0)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_first_last_delta,
    )

    out = q_orders_first_last_delta(str(tmp_path))
    # first = okey 1 ($10), last = okey 2 ($50) -> grew
    assert out.iloc[0].tolist() == [1, 1, 0, 1.0]
