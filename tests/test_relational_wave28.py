"""Unit tests for the wave-28 pair: per-segment customer-revenue HHI
and the daily surge factor (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_segment_hhi_hand_computed(ray_session, tmp_path):
    # SEG1: customers spend $3 and $1 -> tot 400 cents,
    #   ssq = 300^2 + 100^2 = 100000 -> hhi = 100000/160000 = 0.625
    # SEG2: one customer -> hhi 1.0; orderless customer drops
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_name": pa.array(["a", "b", "c", "d"]),
                "c_nationkey": pa.array([0] * 4, pa.int32()),
                "c_acctbal": pa.array([0.0] * 4),
                "c_mktsegment": pa.array(["SEG1", "SEG1", "SEG2",
                                          "SEG1"]),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(4), pa.int64()),
                "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 4),
                "o_totalprice": pa.array([1.0, 2.0, 1.0, 9.0]),
                "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 4),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_orders_segment_hhi

    out = q_orders_segment_hhi(str(tmp_path))
    got = {r.c_mktsegment: (r.n_customers, r.total_cents, r.hhi)
           for r in out.itertuples()}
    assert got == {"SEG1": (2, 400, 0.625), "SEG2": (1, 900, 1.0)}


def test_surge_factor_hand_computed(ray_session, tmp_path):
    # daily counts [2, 6, 0(gap), 2]: sorted [0,2,2,6] -> p50 idx 2 = 2
    # peak 6 on day 1 -> surge 3.0
    rows = [(0, 2), (1, 6), (3, 2)]
    ts, k = [], 0
    for d, n in rows:
        for _ in range(n):
            ts.append(d * 86_400_000_000 + k)
            k += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(k), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1] * k, pa.int64()),
                "event_type": pa.array(["view"] * k),
                "value": pa.array([0.0] * k),
                "props": pa.array(["{}"] * k),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_surge_factor

    out = q_events_surge_factor(str(tmp_path))
    assert out.iloc[0].tolist() == [4, 1, 6, 2, 3.0]
