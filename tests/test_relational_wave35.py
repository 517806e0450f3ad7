"""Unit tests for the wave-35 pair: order-regularity cv^2 bins (pure
integer arithmetic) and per-source doc-length Gini."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_orders(tmp_path, rows):
    """rows: (okey, cust, day)."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([1.0] * len(rows)),
                "o_orderdate": pa.array(
                    [r[2] * 86_400_000_000 for r in rows],
                    pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )


def test_regularity_bins_hand_computed(ray_session, tmp_path):
    # cust 1: days 0, 10, 20 -> gaps [10, 10]: n*ss - s^2 = 0 -> bin 0
    # cust 2: days 0, 1, 21 -> gaps [1, 20]: n=2 s=21 ss=401,
    #   n*ss - s^2 = 361 -> (3610)//441 = 8
    # cust 3: two orders only (one gap) -> excluded
    _write_orders(tmp_path, [
        (1, 1, 0), (2, 1, 10), (3, 1, 20),
        (4, 2, 0), (5, 2, 1), (6, 2, 21),
        (7, 3, 0), (8, 3, 9),
    ])
    from mysql_log_parser_ray.pipelines.queries import (
        q_customers_order_regularity,
    )

    out = q_customers_order_regularity(str(tmp_path))
    got = dict(zip(out["cv2_bin"], out["n_customers"]))
    assert got == {0: 1, 8: 1}


def test_regularity_same_day_orders_drop(ray_session, tmp_path):
    # three same-day orders: gaps [0, 0], s = 0 -> cv undefined -> drop
    _write_orders(tmp_path, [(1, 1, 5), (2, 1, 5), (3, 1, 5)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_customers_order_regularity,
    )

    out = q_customers_order_regularity(str(tmp_path))
    assert len(out) == 0


def test_source_len_gini_hand_computed(ray_session, tmp_path):
    # srcA lengths [1, 1, 2]: n=3 sx=4, sorted rank-sum = 1+2+6 = 9
    #   gini = (18 - 16) / 12 = 0.166667; srcB single doc -> 0
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(["x", "y", "zz", "qqq"]),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["srcA", "srcA", "srcA", "srcB"]),
                "n_chars": pa.array([1, 1, 2, 3], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_source_len_gini

    out = q_source_len_gini(str(tmp_path))
    got = {r.source: (r.n_docs, r.total_chars, r.gini)
           for r in out.itertuples()}
    assert got == {"srcA": (3, 4, 0.166667), "srcB": (1, 3, 0.0)}
