"""Unit tests for the wave-20 pair: CUBE grouping sets over
(type, dow) and top-k supplier revenue concentration."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_cube_all_four_grouping_sets(ray_session, tmp_path):
    # Thursday (day 0, dow 4): 2 view + 1 click; Friday (day 1, dow 5):
    # 1 view
    us = [0, 1, 2, 86_400_000_000]
    types = ["view", "view", "click", "view"]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array(us, pa.timestamp("us")),
                "user_id": pa.array([1, 2, 3, 4], pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array([0.0] * 4),
                "props": pa.array(["{}"] * 4),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_cube_type_dow

    out = q_events_cube_type_dow(str(tmp_path))
    got = {(r.event_type, r.dow): r.n for r in out.itertuples()}
    assert got == {
        ("view", "4"): 2, ("click", "4"): 1, ("view", "5"): 1,
        ("view", "<all>"): 3, ("click", "<all>"): 1,
        ("<all>", "4"): 3, ("<all>", "5"): 1,
        ("<all>", "<all>"): 4,
    }


def _write_lineitem(tmp_path, rows):
    """rows: (suppkey, price)."""
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(len(rows)), pa.int64()),
                "l_partkey": pa.array([1] * len(rows), pa.int64()),
                "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_quantity": pa.array([1.0] * len(rows)),
                "l_extendedprice": pa.array([r[1] for r in rows],
                                            pa.float64()),
                "l_discount": pa.array([0.0] * len(rows)),
                "l_tax": pa.array([0.0] * len(rows)),
                "l_returnflag": pa.array(["N"] * len(rows)),
                "l_shipdate": pa.array([0] * len(rows),
                                       pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )


def test_supplier_topk_ranks_and_shares(ray_session, tmp_path):
    # supp 1: $6, supp 2: $3, supp 3: $1 -> total 1000 cents
    _write_lineitem(tmp_path, [(1, 2.0), (1, 4.0), (2, 3.0), (3, 1.0)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_supplier_revenue_topk,
    )

    out = q_supplier_revenue_topk(str(tmp_path))
    assert out["s_suppkey"].tolist() == [1, 2, 3]
    assert out["rnk"].tolist() == [1, 2, 3]
    assert out["revenue_cents"].tolist() == [600, 300, 100]
    assert out["cum_share"].tolist() == [0.6, 0.9, 1.0]


def test_supplier_topk_tie_breaks_on_suppkey(ray_session, tmp_path):
    # equal revenue: lower suppkey ranks first
    _write_lineitem(tmp_path, [(9, 5.0), (2, 5.0)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_supplier_revenue_topk,
    )

    out = q_supplier_revenue_topk(str(tmp_path))
    assert out["s_suppkey"].tolist() == [2, 9]
    assert out["cum_share"].tolist() == [0.5, 1.0]
