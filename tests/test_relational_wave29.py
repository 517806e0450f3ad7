"""Unit tests for the wave-29 pair: time-to-first-purchase histogram
and per-brand markup audit (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_ttfp_hand_computed(ray_session, tmp_path):
    # u1: first event day 0, first purchase day 2 -> 2
    # u2: first event IS a purchase -> 0; u3: never purchases -> absent
    rows = [
        (1, "view", 0), (1, "purchase", 2 * 86400), (1, "purchase", 3 * 86400),
        (2, "purchase", 86400), (2, "view", 2 * 86400),
        (3, "view", 0),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([s * 1_000_000 for _, _, s in rows],
                               pa.timestamp("us")),
                "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
                "event_type": pa.array([t for _, t, _ in rows]),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_users_time_to_first_purchase,
    )

    out = q_users_time_to_first_purchase(str(tmp_path))
    got = dict(zip(out["days"], out["n_users"]))
    assert got == {0: 1, 2: 1}


def test_brand_markup_hand_computed(ray_session, tmp_path):
    # part 1 (BrandA, retail $2): sold $3 qty 1 -> retail 200
    # part 2 (BrandA, retail $1): sold $1 qty 2 -> retail 200
    # BrandA: sold 400, retail 400 -> 100.0; unknown part dropped
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_name": pa.array(["x", "y"]),
                "p_type": pa.array(["t", "t"]),
                "p_brand": pa.array(["BrandA", "BrandA"]),
                "p_size": pa.array([1, 1], pa.int64()),
                "p_retailprice": pa.array([2.0, 1.0]),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(3), pa.int64()),
                "l_partkey": pa.array([1, 2, 99], pa.int64()),
                "l_suppkey": pa.array([1] * 3, pa.int64()),
                "l_quantity": pa.array([1.0, 2.0, 5.0]),
                "l_extendedprice": pa.array([3.0, 1.0, 9.0]),
                "l_discount": pa.array([0.0] * 3),
                "l_tax": pa.array([0.0] * 3),
                "l_returnflag": pa.array(["N"] * 3),
                "l_shipdate": pa.array([0] * 3, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_part_brand_markup

    out = q_part_brand_markup(str(tmp_path))
    assert out.iloc[0].tolist() == ["BrandA", 2, 400, 400, 100.0]
