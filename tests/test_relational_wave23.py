"""Unit tests for the wave-23 pair: day-k return-rate curve and
variance-ranked embedding dimensions (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_return_curve_hand_computed(ray_session, tmp_path):
    # u1 active days {0, 1, 3}; u2 active {0} -> user-days = 4
    # k=1 pairs: u1 (0->1) = 1; k=2: u1 (1->3) = 1; k=3: u1 (0->3) = 1
    # duplicates within a day must not double-count
    rows = [(1, 0), (1, 0), (1, 1), (1, 3), (2, 0)]
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
    from mysql_log_parser_ray.pipelines.queries import q_events_return_curve

    out = q_events_return_curve(str(tmp_path))
    assert out["k"].tolist() == [1, 2, 3, 4, 5, 6, 7]
    assert out["n_pairs"].tolist() == [1, 1, 1, 0, 0, 0, 0]
    assert out["n_user_days"].tolist() == [4] * 7
    assert out["rate"].tolist() == [0.25, 0.25, 0.25, 0.0, 0.0, 0.0, 0.0]


def test_topvar_ranks_constant_dim_last(ray_session, tmp_path):
    # dim 1 constant (var 0), dim 2 alternating -1/+1 (max var),
    # dim 3 mild: ranks must be [2, 3, 1]
    import numpy as np

    vecs = [
        [0.5, 1.0, 0.1] + [0.0] * 61,
        [0.5, -1.0, 0.2] + [0.0] * 61,
        [0.5, 1.0, 0.1] + [0.0] * 61,
        [0.5, -1.0, 0.2] + [0.0] * 61,
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(
                    [np.array(v, np.float32) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * 4, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_embed_dim_topvar

    out = q_embed_dim_topvar(str(tmp_path), k=3)
    assert out["rnk"].tolist() == [1, 2, 3]
    assert out["dim"].tolist()[:2] == [2, 3]
    # dim 2: units +-1e6, mean 0 -> var = 1e12 exactly
    assert out.iloc[0]["var_units"] == 1.0e12
    # dim 3: units alternating 1e5/2e5 -> var = 2.5e9
    assert out.iloc[1]["var_units"] == 2.5e9
