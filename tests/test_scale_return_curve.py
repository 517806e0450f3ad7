"""Env-gated scale checks for the wave-19/23 user-bucket kernels:
2M events / 200k users — results must match the planted closed form and
the driver heap must stay cell-bounded (never user-cardinality)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.skipif(
    os.environ.get("MLPR_BIG_TESTS") != "1",
    reason="~1 min; run with MLPR_BIG_TESTS=1 for the 2M-row user-bucket scale check",
)
def test_return_curve_and_gap_hist_at_scale(ray_session, tmp_path):
    import tracemalloc

    n_users = 200_000
    users = np.arange(n_users, dtype=np.int64)
    day1 = users % 300
    day2 = day1 + 2  # every user active on exactly d and d+2
    uid = np.concatenate([users, users])
    day = np.concatenate([day1, day2])
    ts = day * 86_400_000_000 + uid  # unique within-day offsets
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(2 * n_users), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(["view"] * (2 * n_users)),
                "value": pa.array(np.zeros(2 * n_users)),
                "props": pa.array(["{}"] * (2 * n_users)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_return_curve,
        q_user_gap_median_hist,
    )

    tracemalloc.start()
    curve = q_events_return_curve(str(tmp_path))
    hist = q_user_gap_median_hist(str(tmp_path))
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    # every user contributes exactly one k=2 pair; user-days = 2 * users
    got = {int(r.k): (int(r.n_pairs), r.rate) for r in curve.itertuples()}
    assert got[2] == (n_users, 0.5)
    for k in (1, 3, 4, 5, 6, 7):
        assert got[k] == (0, 0.0)
    assert (curve["n_user_days"] == 2 * n_users).all()

    # each user's single gap is 2 days = 172800 s -> bin log2(172801)=17
    assert hist["bin"].tolist() == [17]
    assert hist["n_users"].tolist() == [n_users]

    # driver folds are cell-bounded: (k x buckets) + (bin x buckets)
    # rows, never 200k users on the driver heap
    assert peak < 64 * 1024 * 1024, peak
