"""Unit tests for the wave-24 pair: basket-size~value correlation and
per-type hour-of-day entropy (hand-computed fixtures)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_basket_corr_perfect_line(ray_session, tmp_path):
    # price = $10 x lines exactly, including a zero-line $0 order
    # (LEFT JOIN semantics) -> r = 1.0
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                "o_custkey": pa.array([1] * 4, pa.int64()),
                "o_orderstatus": pa.array(["O"] * 4),
                "o_totalprice": pa.array([10.0, 20.0, 30.0, 0.0]),
                "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 4),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    okeys = [1, 2, 2, 3, 3, 3]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array([1] * 6, pa.int64()),
                "l_suppkey": pa.array([1] * 6, pa.int64()),
                "l_quantity": pa.array([1.0] * 6),
                "l_extendedprice": pa.array([1.0] * 6),
                "l_discount": pa.array([0.0] * 6),
                "l_tax": pa.array([0.0] * 6),
                "l_returnflag": pa.array(["N"] * 6),
                "l_shipdate": pa.array([0] * 6, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_orders_basket_corr

    out = q_orders_basket_corr(str(tmp_path))
    assert out.iloc[0].tolist() == [4, 1.0]


def test_type_hour_entropy_hand_computed(ray_session, tmp_path):
    # type A: hours 0,0,1,1 -> entropy ln2, peak tie -> hour 0
    # type B: single hour 23 -> entropy 0, peak 23
    us = [0, 1, 3_600_000_000, 3_600_000_001, 23 * 3_600_000_000]
    types = ["A", "A", "A", "A", "B"]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(5), pa.int64()),
                "ts": pa.array(us, pa.timestamp("us")),
                "user_id": pa.array([1] * 5, pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array([0.0] * 5),
                "props": pa.array(["{}"] * 5),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_type_hour_entropy,
    )

    out = q_events_type_hour_entropy(str(tmp_path))
    got = {r.event_type: (r.n_events, r.peak_hod, r.hour_entropy)
           for r in out.itertuples()}
    assert got == {"A": (4, 0, round(float(np.log(2.0)), 6)),
                   "B": (1, 23, 0.0)}
