"""Unit tests for the wave-34 pair: nation market activation and
lines-per-order yearly trend (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_market_activation_hand_computed(ray_session, tmp_path):
    # nation 0: customers 1 (ordered), 2 (orderless) -> share 0.5
    # nation 1: customer 3 ordered twice (still ONE active) -> 1.0
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_name": pa.array(["a", "b", "c"]),
                "c_nationkey": pa.array([0, 0, 1], pa.int32()),
                "c_acctbal": pa.array([0.0] * 3),
                "c_mktsegment": pa.array(["S"] * 3),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["ALPHA", "BETA"]),
                "n_regionkey": pa.array([0, 0], pa.int32()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([1, 3, 3], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_totalprice": pa.array([1.0] * 3),
                "o_orderdate": pa.array([0] * 3, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 3),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_nation_market_activation,
    )

    out = q_nation_market_activation(str(tmp_path))
    got = {r.n_name: (r.n_customers, r.n_active, r.active_share)
           for r in out.itertuples()}
    assert got == {"ALPHA": (2, 1, 0.5), "BETA": (1, 1, 1.0)}


def test_avg_lines_trend_hand_computed(ray_session, tmp_path):
    # 1970: order 1 with 2 lines, order 2 with 0 lines -> avg 1.0
    # 1971 (day 400): order 3 with 3 lines -> avg 3.0
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([1, 1, 1], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_totalprice": pa.array([1.0] * 3),
                "o_orderdate": pa.array(
                    [0, 0, 400 * 86_400_000_000], pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 3),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    okeys = [1, 1, 3, 3, 3]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array([1] * 5, pa.int64()),
                "l_suppkey": pa.array([1] * 5, pa.int64()),
                "l_quantity": pa.array([1.0] * 5),
                "l_extendedprice": pa.array([1.0] * 5),
                "l_discount": pa.array([0.0] * 5),
                "l_tax": pa.array([0.0] * 5),
                "l_returnflag": pa.array(["N"] * 5),
                "l_shipdate": pa.array([0] * 5, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_avg_lines_trend,
    )

    out = q_orders_avg_lines_trend(str(tmp_path))
    got = {r.o_year: (r.n_orders, r.n_lines, r.avg_lines)
           for r in out.itertuples()}
    assert got == {1970: (2, 2, 1.0), 1971: (1, 3, 3.0)}
