"""Interval (range) join: a fact stream probed against a windows table.

The broadcast variant: the windows side is dimension-cardinality (ship
once with ``ray.put``, read through the bounded per-worker
``broadcast_get`` cache) and every fact batch probes it vectorized. The
containment predicate ``start <= ts < end`` over VARYING window widths is
a genuine non-equi join — no equality bucketing reduces it — so the probe
exploits a layout bound instead: with window starts sorted, an event at
``ts`` can only match windows whose start lies in ``(ts - max_width, ts]``.
When the windows are laid out with a minimum start-to-start gap
``min_gap``, that span holds at most ``max_width // min_gap + 1``
candidates, so the per-batch probe is that many vectorized passes instead
of O(n_windows) — the partitioning assumption this operator relies on
(document per use; typical telemetry maintenance/campaign windows easily
satisfy it).

At 100 TB the fact side streams; only (window_id, key) count partials —
windows x keys cardinality — ever shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..broadcast import broadcast_get


def _max_candidates(starts_us: np.ndarray, ends_us: np.ndarray) -> int:
    """Upper bound on windows whose start lies within max_width of a ts."""
    if len(starts_us) < 2:
        return max(1, len(starts_us))
    gaps = np.diff(starts_us)
    min_gap = int(gaps.min())
    max_w = int((ends_us - starts_us).max())
    if min_gap <= 0:  # duplicate starts: no layout bound, probe all
        return len(starts_us)
    return int(max_w // min_gap) + 1


def interval_join_counts(
    facts,
    starts_us: np.ndarray,
    ends_us: np.ndarray,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> pd.DataFrame:
    """Count facts per (window_id, key) for windows [start, end).

    ``starts_us``/``ends_us``: int64 microsecond bounds, starts sorted
    ascending (window_id is the position in that order). Returns a pandas
    frame (windows x keys cardinality).
    """
    import ray
    from ray.data.aggregate import Sum

    order = np.argsort(starts_us, kind="stable")
    starts = np.ascontiguousarray(starts_us[order], dtype=np.int64)
    ends = np.ascontiguousarray(ends_us[order], dtype=np.int64)
    wids = order.astype(np.int64)  # position -> original window_id
    n_cand = _max_candidates(starts, ends)
    ref = ray.put((starts, ends, wids, n_cand))

    def probe(b: pa.Table) -> pa.Table:
        s, e, w, k = broadcast_get(ref)
        ts = b[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # hi = first window index whose start is > ts
        hi = np.searchsorted(s, ts, side="right")
        out_win, out_key = [], []
        keys = b[key_col].to_pandas()
        for c in range(k):
            idx = hi - 1 - c
            ok = idx >= 0
            safe = np.where(ok, idx, 0)
            ok &= (ts >= s[safe]) & (ts < e[safe])
            if not ok.any():
                continue
            out_win.append(w[safe[ok]])
            out_key.append(keys[ok])
        if not out_win:
            return pa.table(
                {
                    "window_id": pa.array([], pa.int64()),
                    key_col: pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame(
            {
                "window_id": np.concatenate(out_win),
                key_col: pd.concat(out_key, ignore_index=True),
            }
        )
        g = df.groupby(["window_id", key_col], as_index=False).size()
        g = g.rename(columns={"size": "n_events"})
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        facts.map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby(["window_id", key_col])
        .aggregate(Sum("n_events", alias_name="n_events"))
        .to_pandas()
    )
    if "window_id" not in out.columns:  # no fact matched any window
        out = pd.DataFrame(
            {
                "window_id": pd.Series([], dtype="int64"),
                key_col: pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype="int64"),
            }
        )
    for c in ("window_id", "n_events"):
        out[c] = out[c].astype("int64")
    return out[["window_id", key_col, "n_events"]].sort_values(
        ["window_id", key_col]
    ).reset_index(drop=True)
