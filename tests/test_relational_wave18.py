"""Unit tests for the wave-18 pair: equi-depth price histogram (NTILE
semantics) and per-class log2 latency histogram over the real slow-log
parse (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_orders(tmp_path, prices):
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(prices)), pa.int64()),
                "o_custkey": pa.array([1] * len(prices), pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(prices)),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array([0] * len(prices),
                                        pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(prices)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )


def test_equidepth_uneven_split(ray_session, tmp_path):
    # 10 orders, k=8: NTILE sizes 2,2,1,1,1,1,1,1; prices 1..10 dollars
    _write_orders(tmp_path, [float(i) for i in range(1, 11)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_price_equidepth,
    )

    out = q_orders_price_equidepth(str(tmp_path))
    assert out["n_orders"].tolist() == [2, 2, 1, 1, 1, 1, 1, 1]
    assert out["lo_cents"].tolist() == [100, 300, 500, 600, 700, 800,
                                        900, 1000]
    assert out["hi_cents"].tolist() == [200, 400, 500, 600, 700, 800,
                                        900, 1000]


def test_equidepth_fewer_rows_than_tiles(ray_session, tmp_path):
    # 3 orders, k=8 -> NTILE emits tiles 1..3 with one row each
    _write_orders(tmp_path, [5.0, 1.0, 3.0])
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_price_equidepth,
    )

    out = q_orders_price_equidepth(str(tmp_path))
    assert out["tile"].tolist() == [1, 2, 3]
    assert out["lo_cents"].tolist() == [100, 300, 500]
    assert out["n_orders"].tolist() == [1, 1, 1]


def test_equidepth_ties_stay_adjacent(ray_session, tmp_path):
    # four equal prices + four distinct: tie rows split across tiles but
    # min/max per tile remain value-deterministic
    _write_orders(tmp_path, [2.0, 2.0, 2.0, 2.0, 1.0, 3.0, 4.0, 5.0])
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_price_equidepth,
    )

    out = q_orders_price_equidepth(str(tmp_path))
    # sorted cents: 100,200,200,200,200,300,400,500 -> 8 tiles of 1
    assert out["n_orders"].tolist() == [1] * 8
    assert out["lo_cents"].tolist() == [100, 200, 200, 200, 200, 300,
                                        400, 500]


def test_qt_log2_histogram_buckets(ray_session):
    # derivation: qt_q = n_chars % 128; bucket -1 for 0, else floor(log2)
    import numpy as np

    for qt_q, want in [(0, -1), (1, 0), (2, 1), (3, 1), (4, 2),
                       (127, 6)]:
        got = (-1 if qt_q == 0
               else int(np.floor(np.log2(np.float64(qt_q)))))
        assert got == want, (qt_q, got, want)


def test_qt_log2_histogram_engine_counts(ray_session, tmp_path):
    # documents with n_chars 0, 1, 2, 4, 4 -> qt_q same -> buckets
    # -1, 0, 1, 2, 2 for the per-template class of each doc
    texts = ["x" * n for n in (0, 1, 2, 4, 4)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 5),
                "source": pa.array(["src0"] * 5),
                "n_chars": pa.array([0, 1, 2, 4, 4], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_slowlog_qt_log2_histogram,
    )

    out = q_slowlog_qt_log2_histogram(str(tmp_path))
    # class identity varies by template (n_chars % 4); check the bucket
    # multiset instead of class ids
    got = sorted(
        (int(b), int(n)) for b, n in zip(out["bucket"], out["n_queries"])
    )
    assert got == [(-1, 1), (0, 1), (1, 1), (2, 2)]
