"""Unit tests for the wave-31 pair: per-brand return-rate audit and
dormancy-revival counts (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_brand_returns_hand_computed(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_name": pa.array(["x", "y"]),
                "p_type": pa.array(["t", "t"]),
                "p_brand": pa.array(["BrandA", "BrandB"]),
                "p_size": pa.array([1, 1], pa.int64()),
                "p_retailprice": pa.array([1.0, 1.0]),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    flags = ["R", "N", "R", "A"]
    keys = [1, 1, 2, 2]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(4), pa.int64()),
                "l_partkey": pa.array(keys, pa.int64()),
                "l_suppkey": pa.array([1] * 4, pa.int64()),
                "l_quantity": pa.array([1.0] * 4),
                "l_extendedprice": pa.array([1.0] * 4),
                "l_discount": pa.array([0.0] * 4),
                "l_tax": pa.array([0.0] * 4),
                "l_returnflag": pa.array(flags),
                "l_shipdate": pa.array([0] * 4, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_lineitem_brand_returns,
    )

    out = q_lineitem_brand_returns(str(tmp_path))
    got = {r.p_brand: (r.n_lines, r.n_returned, r.return_rate)
           for r in out.itertuples()}
    assert got == {"BrandA": (2, 1, 0.5), "BrandB": (2, 1, 0.5)}


def test_dormancy_revival_hand_computed(ray_session, tmp_path):
    # u1 active days 0, 20, 40 -> two >14d gaps (two revivals)
    # u2 active days 0, 5 -> no revival; u3 single day -> no revival
    rows = [(1, 0), (1, 20), (1, 40), (2, 0), (2, 5), (3, 9)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([d * 86_400_000_000 + i
                                for i, (_, d) in enumerate(rows)],
                               pa.timestamp("us")),
                "user_id": pa.array([u for u, _ in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([0.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_users_dormancy_revival,
    )

    out = q_users_dormancy_revival(str(tmp_path))
    assert out.iloc[0].tolist() == [3, 1, 2]


def test_dormancy_boundary_is_strict(ray_session, tmp_path):
    # a gap of exactly 14 days is NOT dormancy (strictly greater)
    rows = [(1, 0), (1, 14)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(2), pa.int64()),
                "ts": pa.array([d * 86_400_000_000 for _, d in rows],
                               pa.timestamp("us")),
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": pa.array(["view"] * 2),
                "value": pa.array([0.0] * 2),
                "props": pa.array(["{}"] * 2),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_users_dormancy_revival,
    )

    out = q_users_dormancy_revival(str(tmp_path))
    assert out.iloc[0].tolist() == [1, 0, 0]
