"""Unit tests for the wave-22 pair: CLV deciles (NTILE revenue shares)
and the discount-effectiveness grid (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_clv_deciles_hand_computed(ray_session, tmp_path):
    # 4 customers spending $40/$30/$20/$10 -> NTILE(10) over 4 rows
    # puts one customer per decile 1..4; shares 0.4/0.3/0.2/0.1
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(5), pa.int64()),
                "o_custkey": pa.array([1, 2, 3, 4, 1], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 5),
                "o_totalprice": pa.array([20.0, 30.0, 20.0, 10.0, 20.0],
                                         pa.float64()),
                "o_orderdate": pa.array([0] * 5, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 5),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_customers_clv_deciles

    out = q_customers_clv_deciles(str(tmp_path))
    assert out["decile"].tolist() == [1, 2, 3, 4]
    assert out["n_customers"].tolist() == [1, 1, 1, 1]
    assert out["revenue_cents"].tolist() == [4000, 3000, 2000, 1000]
    assert out["rev_share"].tolist() == [0.4, 0.3, 0.2, 0.1]


def test_discount_grid_hand_computed(ray_session, tmp_path):
    # pct 0: one line $10 qty 2 -> disc_c100 = 1000 * 100 = 100000
    # pct 10: two lines $5 qty 1+3 -> gross 1000, disc 1000 * 90 = 90000
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(3), pa.int64()),
                "l_partkey": pa.array([1] * 3, pa.int64()),
                "l_suppkey": pa.array([1] * 3, pa.int64()),
                "l_quantity": pa.array([2.0, 1.0, 3.0]),
                "l_extendedprice": pa.array([10.0, 5.0, 5.0]),
                "l_discount": pa.array([0.0, 0.1, 0.1]),
                "l_tax": pa.array([0.0] * 3),
                "l_returnflag": pa.array(["N"] * 3),
                "l_shipdate": pa.array([0] * 3, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_lineitem_discount_grid,
    )

    out = q_lineitem_discount_grid(str(tmp_path))
    got = {r.discount_pct: (r.n_lines, r.sum_qty, r.gross_cents,
                            r.disc_c100) for r in out.itertuples()}
    assert got == {0: (1, 2, 1000, 100000), 10: (2, 4, 1000, 90000)}
