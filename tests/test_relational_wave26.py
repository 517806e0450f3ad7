"""Unit tests for the wave-26 pair: first-touch attribution and
per-dimension Fisher discriminant score (hand-computed fixtures)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_first_touch_hand_computed(ray_session, tmp_path):
    # u1: first event view, 2 purchases; u2: first event click,
    # 1 purchase; u3: views only -> excluded
    rows = [
        (1, "view", 0), (1, "purchase", 1), (1, "purchase", 2),
        (2, "click", 0), (2, "purchase", 5),
        (3, "view", 0), (3, "view", 1),
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
        q_user_first_touch_attribution,
    )

    out = q_user_first_touch_attribution(str(tmp_path))
    got = {r.first_type: (r.n_purchases, r.n_users)
           for r in out.itertuples()}
    assert got == {"view": (2, 1), "click": (1, 1)}


def test_first_touch_tie_breaks_on_event_id(ray_session, tmp_path):
    # two events at the SAME ts: lower event_id wins the first-touch
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([5, 2, 9], pa.int64()),
                "ts": pa.array([0, 0, 1_000_000], pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "event_type": pa.array(["click", "view", "purchase"]),
                "value": pa.array([0.0] * 3),
                "props": pa.array(["{}"] * 3),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_user_first_touch_attribution,
    )

    out = q_user_first_touch_attribution(str(tmp_path))
    assert out.iloc[0].tolist() == ["view", 1, 1]


def test_fisher_separating_vs_noise_dim(ray_session, tmp_path):
    # dim 2 separates labels perfectly (0 within-variance) -> dropped;
    # dim 3 has within- and between-variance -> finite score;
    # dim 1 identical across labels (0 between, positive within) -> 0.0
    vecs = [
        [1.0, 0.0, 0.1] + [0.0] * 61,
        [2.0, 0.0, 0.2] + [0.0] * 61,
        [1.0, 1.0, 0.3] + [0.0] * 61,
        [2.0, 1.0, 0.6] + [0.0] * 61,
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(
                    [np.array(v, np.float32) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0, 0, 1, 1], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_embed_dim_fisher

    out = q_embed_dim_fisher(str(tmp_path))
    by_dim = {int(r.dim): r.fisher for r in out.itertuples()}
    assert 2 not in by_dim  # zero within-variance drops
    assert by_dim[1] == 0.0
    # dim 3: label0 mean 0.15e6 units, label1 mean 0.45e6; between =
    # 2*(0.15e6)^2*2 = 9e10; within = 2*(0.05e6)^2 + 2*(0.15e6)^2 = 5e10
    assert by_dim[3] == 1.8
