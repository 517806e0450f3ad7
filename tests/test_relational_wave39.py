"""Unit tests for the wave-39 pair: priority-mix yearly trend and
class-conditional embedding norms."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_priority_mix_trend_hand_computed(ray_session, tmp_path):
    # 1970: URGENT, LOW -> hot 1/2; 1971: HIGH -> 1/1
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(3), pa.int64()),
                "o_custkey": pa.array([1] * 3, pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_totalprice": pa.array([1.0] * 3),
                "o_orderdate": pa.array(
                    [0, 86_400_000_000, 400 * 86_400_000_000],
                    pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "5-LOW", "2-HIGH"]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_priority_mix_trend,
    )

    out = q_orders_priority_mix_trend(str(tmp_path))
    got = {r.o_year: (r.n_orders, r.n_hot, r.hot_share)
           for r in out.itertuples()}
    assert got == {1970: (2, 1, 0.5), 1971: (1, 1, 1.0)}


def test_label_norms_hand_computed(ray_session, tmp_path):
    # label 0: unit vector (1,0,...) -> sq norm 1e12 units^2
    # label 1: (0.5, 0.5, 0, ...) twice -> sq 5e11 each, mean 5e11
    vecs = [
        [1.0] + [0.0] * 63,
        [0.5, 0.5] + [0.0] * 62,
        [0.5, 0.5] + [0.0] * 62,
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(3), pa.int64()),
                "embedding": pa.array(
                    [np.array(v, np.float32) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 1, 1], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_embed_label_norms

    out = q_embed_label_norms(str(tmp_path))
    got = {r.label: (r.n_vectors, r.sumsq_units_str, r.mean_sq)
           for r in out.itertuples()}
    assert got == {
        0: (1, str(10 ** 12), 1.0e12),
        1: (2, str(10 ** 12), 5.0e11),
    }
