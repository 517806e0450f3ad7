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
* ``sessionize``: gap-based sessions need per-user event-time ordering.
  A ``groupby(user)`` would dispatch one Python callback per user — death
  by dispatch at 10^8 users — so the shuffle key is ``hash(user) % n_parts``
  (~64 coarse buckets) and ONE vectorized pass sessionizes every user in a
  partition: lexsort by (user, ts, order), session breaks = user-change OR
  gap, per-session reduce via break-index arithmetic. Skew bound: the
  busiest PARTITION (not user) must fit in one task; n_parts tunes that.

Null handling (explicit, documented): rows with a null event-time are
dropped at the stage boundary (the us-int64 arithmetic is undefined on
null; a SQL oracle would keep a NULL group — divergence only for corpora
with null timestamps). Null KEYS are kept as groups (dropna=False /
factorize(use_na_sentinel=False)), matching SQL GROUP BY. Null VALUES are
skipped by the cents sum (SQL SUM semantics) but still counted in ``n``;
a group whose values are ALL null sums to 0 here vs SQL NULL.
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


def _cents_f64(col) -> np.ndarray:
    """value column -> half-up cents as float64 with NaN for nulls.

    Null-safe (arrow kernels propagate null -> NaN on to_numpy); the
    pandas groupby sum then SKIPS NaN, matching SQL SUM over NULLs. A raw
    ``.astype(int64)`` on a NaN is undefined (typically INT64_MIN) and was
    silently corrupting sums on null-valued corpora.
    """
    return pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)).to_numpy(
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
        batch = batch.filter(pc.is_valid(batch[ts_col]))  # null event-time
        us = _epoch_us(batch[ts_col])
        win = (us // width_us) * window_sec  # window start, epoch SECONDS
        cols = {"window_start": win}
        if key_col is not None:
            cols[key_col] = batch[key_col].to_pandas()
        df = pd.DataFrame(cols)
        if value_col is not None:
            df["value_cents"] = _cents_f64(batch[value_col])
        keys = ["window_start"] + ([key_col] if key_col else [])
        agg = {"n": ("window_start", "size")}
        if value_col is not None:
            agg["value_cents"] = ("value_cents", "sum")
        g = df.groupby(keys, as_index=False, dropna=False).agg(**agg)
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


def hopping_window_agg(
    events_ds,
    window_sec: int = 3600,
    hop_sec: int = 900,
    ts_col: str = "ts",
    key_col: Optional[str] = "event_type",
    value_col: Optional[str] = "value",
):
    """Hopping (sliding) event-time windows: width ``window_sec``, advance
    ``hop_sec`` (must divide the width). Every event belongs to exactly
    ``window_sec // hop_sec`` windows; window starts are hop-aligned epoch
    seconds. Count + exact integer-cents sum per (window_start, key).

    Scale shape: the per-event window explode happens INSIDE the batch
    combiner — each batch first replicates rows arithmetically (numpy
    repeat/tile, no joins) and immediately pre-aggregates, so what
    shuffles is at most ``n_covers``x the tumbling partial rows (distinct
    (window, key) pairs per batch), never ``n_covers``x the events. The
    final merge is the same small groupby as the tumbling path.
    """
    if window_sec % hop_sec != 0:
        raise ValueError("hop_sec must divide window_sec")
    n_covers = window_sec // hop_sec
    hop_us = int(hop_sec) * 1_000_000

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[ts_col]))  # null event-time
        us = _epoch_us(batch[ts_col])
        k_hi = us // hop_us
        # event i covers window starts (k_hi[i] - j) * hop_sec, j < n_covers
        win = (
            (k_hi[None, :] - np.arange(n_covers, dtype=np.int64)[:, None])
            * hop_sec
        ).ravel()
        cols = {"window_start": win}
        if key_col is not None:
            cols[key_col] = np.tile(
                batch[key_col].to_numpy(zero_copy_only=False), n_covers
            )
        df = pd.DataFrame(cols)
        if value_col is not None:
            df["value_cents"] = np.tile(_cents_f64(batch[value_col]), n_covers)
        keys = ["window_start"] + ([key_col] if key_col else [])
        agg = {"n": ("window_start", "size")}
        if value_col is not None:
            agg["value_cents"] = ("value_cents", "sum")
        g = df.groupby(keys, as_index=False, dropna=False).agg(**agg)
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
    n_parts: int = 64,
    as_dataset: bool = False,
):
    """Gap-based sessions per user. A new session starts when the gap to
    the previous event (per user, ordered by (ts, order_col)) exceeds
    ``gap_sec``. Returns one row per session:
    (user_id, session_seq, n_events, start_us, end_us, duration_us),
    microsecond-exact int64s so the result hashes deterministically.

    ``as_dataset=True`` keeps the result distributed (one row per
    session is user-cardinality-sized; collecting it to the driver is the
    caller's choice, not the operator's cost) - the scale path.

    Scale shape: users are hash-partitioned into ``n_parts`` coarse
    buckets (one shuffle on a ~64-ary key, never per-user groups) and each
    partition sessionizes ALL of its users in one vectorized pass —
    lexsort by (user, ts, order), break detection, reduce by break-index
    arithmetic. No per-user Python dispatch anywhere.
    """
    gap_us = int(gap_sec) * 1_000_000

    def _narrow(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[ts_col]))  # null event-time
        from ..partition import stable_partition

        # dtype/null-stable: a null user in the batch must not re-hash the
        # other users (int->float promotion would split a user's events
        # across buckets and fabricate extra sessions)
        part = pa.array(stable_partition(batch[user_col], n_parts), pa.int64())
        return pa.table(
            {
                "_part": part,
                user_col: batch[user_col],
                "_us": pa.array(_epoch_us(batch[ts_col]), pa.int64()),
                order_col: batch[order_col],
            }
        )

    empty = pd.DataFrame(
        {
            user_col: pd.Series([], dtype="object"),
            "session_seq": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "start_us": pd.Series([], dtype="int64"),
            "end_us": pd.Series([], dtype="int64"),
            "duration_us": pd.Series([], dtype="int64"),
        }
    )

    def _sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        # every user of this hash bucket, one vectorized pass
        if len(g) == 0:
            return empty
        codes, uniques = pd.factorize(g[user_col], use_na_sentinel=False)
        us = g["_us"].to_numpy()
        order_v = g[order_col].to_numpy()
        o = np.lexsort((order_v, us, codes))
        codes, us = codes[o], us[o]
        new_user = np.ones(len(us), dtype=bool)
        new_user[1:] = codes[1:] != codes[:-1]
        brk = new_user | np.r_[True, (us[1:] - us[:-1]) > gap_us]
        gsid = np.cumsum(brk)  # global (partition-wide) session id, 1-based
        user_first = np.where(new_user, gsid, 0)
        np.maximum.accumulate(user_first, out=user_first)
        seq = gsid - user_first + 1
        b = np.flatnonzero(brk)
        e = np.r_[b[1:], len(us)] - 1
        return pd.DataFrame(
            {
                user_col: np.asarray(uniques)[codes[b]],
                "session_seq": seq[b].astype(np.int64),
                "n_events": (e - b + 1).astype(np.int64),
                "start_us": us[b],
                "end_us": us[e],
                "duration_us": (us[e] - us[b]).astype(np.int64),
            }
        )

    ds = (
        events_ds.map_batches(_narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(_sessions_part, batch_format="pandas")
    )
    if as_dataset:
        return ds
    out = ds.to_pandas()
    if out.empty:
        return empty
    return out.sort_values([user_col, "session_seq"]).reset_index(drop=True)
