"""Windowed aggregation and gap sessionization (event-time operators).

The reference has no windows (its stream is one finite file; SURVEY.md
§2.6), but a log/telemetry engine at scale needs them. Both operators are
Ray-Data-first:

* ``tumbling_window_agg``: the window key is a pure row function (epoch //
  width), so assignment is vectorized inside ``map_batches``, each batch
  pre-aggregates (combiner), and one small ``groupby`` merges partials -
  the same partial-then-shuffle shape as the class aggregation. Late data
  is a non-issue: event time is a column, not arrival time, so windows are
  simply keys and re-runs are deterministic.
* ``sessionize``: gap-based sessions need per-user event-time ordering, so
  the one shuffle is ``groupby(user)`` and the ordering is established
  INSIDE each group (sort of one user's events), never globally. Skew
  bound: the busiest single user's events must fit in one group task.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _epoch_us(col: "pa.ChunkedArray") -> np.ndarray:
    """timestamp[us] (or s/ms/ns) column -> int64 microseconds."""
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64()).to_numpy(
        zero_copy_only=False
    )


def tumbling_window_agg(
    events_ds,
    window_sec: int = 3600,
    ts_col: str = "ts",
    key_col: Optional[str] = "event_type",
    value_col: Optional[str] = "value",
):
    """Tumbling event-time windows: count + exact integer-cents value sum
    per (window_start, key). Returns a pandas DataFrame with
    ``window_start`` as epoch seconds (int64).
    """
    width_us = int(window_sec) * 1_000_000

    def _partial(batch: pa.Table) -> pa.Table:
        us = _epoch_us(batch[ts_col])
        win = (us // width_us) * window_sec  # window start, epoch SECONDS
        cols = {"window_start": win}
        if key_col is not None:
            cols[key_col] = batch[key_col].to_pandas()
        df = pd.DataFrame(cols)
        if value_col is not None:
            v = batch[value_col].to_numpy(zero_copy_only=False)
            df["value_cents"] = np.floor(v * 100 + 0.5).astype(np.int64)
        keys = ["window_start"] + ([key_col] if key_col else [])
        agg = {"n": ("window_start", "size")}
        if value_col is not None:
            agg["value_cents"] = ("value_cents", "sum")
        g = df.groupby(keys, as_index=False).agg(**agg)
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    keys = ["window_start"] + ([key_col] if key_col else [])
    aggs = [Sum("n", alias_name="n")]
    if value_col is not None:
        aggs.append(Sum("value_cents", alias_name="value_cents"))
    out = (
        events_ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(*aggs)
        .to_pandas()
    )
    out["window_start"] = out["window_start"].astype("int64")
    out["n"] = out["n"].astype("int64")
    if value_col is not None:
        out["value_cents"] = out["value_cents"].astype("int64")
    return out.sort_values(keys).reset_index(drop=True)


def sessionize(
    events_ds,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
):
    """Gap-based sessions per user. A new session starts when the gap to
    the previous event (per user, ordered by (ts, order_col)) exceeds
    ``gap_sec``. Returns one row per session:
    (user_id, session_seq, n_events, start_us, end_us, duration_us),
    microsecond-exact int64s so the result hashes deterministically.
    """
    gap_us = int(gap_sec) * 1_000_000

    def _narrow(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch[user_col],
                "_us": pa.array(_epoch_us(batch[ts_col]), pa.int64()),
                order_col: batch[order_col],
            }
        )

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g[order_col].to_numpy(), g["_us"].to_numpy()))
        us = g["_us"].to_numpy()[order]
        new_s = np.ones(len(us), dtype=np.int64)
        new_s[1:] = (us[1:] - us[:-1]) > gap_us
        sid = np.cumsum(new_s)
        df = pd.DataFrame({"sid": sid, "us": us})
        s = df.groupby("sid", as_index=False).agg(
            n_events=("us", "size"), start_us=("us", "min"), end_us=("us", "max")
        )
        return pd.DataFrame(
            {
                user_col: g[user_col].iloc[0],
                "session_seq": s["sid"].astype(np.int64),
                "n_events": s["n_events"].astype(np.int64),
                "start_us": s["start_us"],
                "end_us": s["end_us"],
                "duration_us": (s["end_us"] - s["start_us"]).astype(np.int64),
            }
        )

    out = (
        events_ds.map_batches(_narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(user_col)
        .map_groups(_sessions, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values([user_col, "session_seq"]).reset_index(drop=True)
