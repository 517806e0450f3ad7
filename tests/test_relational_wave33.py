"""Unit tests for the wave-33 pair: actions-before-first-purchase
percentiles and the catalog size x price-band heatmap."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_actions_before_purchase_hand_computed(ray_session, tmp_path):
    # u1: view, view, purchase -> 2 actions before
    # u2: purchase first -> 0; u3 never purchases -> excluded
    rows = [
        (1, "view", 0), (1, "view", 1), (1, "purchase", 2),
        (2, "purchase", 0), (2, "view", 1),
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
        q_users_actions_before_purchase,
    )

    out = q_users_actions_before_purchase(str(tmp_path))
    # sorted counts [0, 2]: p50 idx (100//100)=1 -> 2; p90 idx 1 -> 2
    assert out.iloc[0].tolist() == [2, 2, 2]


def test_catalog_heatmap_hand_computed(ray_session, tmp_path):
    # size 1: prices $100/$150/$900 -> bands 0, 0, 4 (20000-cent bands);
    # median cents 15000. size 2: single $250 -> band 1, median 25000
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(4), pa.int64()),
                "p_name": pa.array(["a"] * 4),
                "p_type": pa.array(["t"] * 4),
                "p_brand": pa.array(["B"] * 4),
                "p_size": pa.array([1, 1, 1, 2], pa.int64()),
                "p_retailprice": pa.array([100.0, 150.0, 900.0, 250.0]),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_parts_catalog_heatmap,
    )

    out = q_parts_catalog_heatmap(str(tmp_path))
    got = {(r.p_size, r.band): (r.n_parts, r.size_p50_cents)
           for r in out.itertuples()}
    assert got == {(1, 0): (2, 15000), (1, 4): (1, 15000),
                   (2, 1): (1, 25000)}
