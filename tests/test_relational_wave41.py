"""Unit tests for the wave-41 pair: conversion rate by day-of-week and
the status x priority contingency matrix."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_cvr_by_dow_hand_computed(ray_session, tmp_path):
    # Thursday (day 0): 2 views 1 purchase -> 0.5
    # Friday (day 1): 1 view 0 purchases -> 0.0
    # Saturday (day 2): purchase only -> dropped (no views)
    rows = [(0, "view"), (0, "view"), (0, "purchase"),
            (1, "view"), (2, "purchase"), (0, "click")]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([d * 86_400_000_000 + i
                                for i, (d, _) in enumerate(rows)],
                               pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([t for _, t in rows]),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_cvr_by_dow

    out = q_events_cvr_by_dow(str(tmp_path))
    got = {r.dow: (r.n_views, r.n_purchases, r.cvr)
           for r in out.itertuples()}
    assert got == {4: (2, 1, 0.5), 5: (1, 0, 0.0)}


def test_status_priority_matrix_row_shares(ray_session, tmp_path):
    # URGENT: O x2, F x1 -> shares 0.666667 / 0.333333; LOW: F x1 -> 1.0
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(4), pa.int64()),
                "o_custkey": pa.array([1] * 4, pa.int64()),
                "o_orderstatus": pa.array(["O", "O", "F", "F"]),
                "o_totalprice": pa.array([1.0] * 4),
                "o_orderdate": pa.array([0] * 4, pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "1-URGENT", "1-URGENT", "5-LOW"]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_status_priority_matrix,
    )

    out = q_orders_status_priority_matrix(str(tmp_path))
    got = {(r.o_orderpriority, r.o_orderstatus): (r.n_orders, r.row_share)
           for r in out.itertuples()}
    assert got == {
        ("1-URGENT", "F"): (1, 0.333333),
        ("1-URGENT", "O"): (2, 0.666667),
        ("5-LOW", "F"): (1, 1.0),
    }
