"""Dtype- and null-stable hash partitioning for Arrow key columns.

The naive ``pd.util.hash_array(col.to_numpy())`` is NOT stable across
batches: an int64 column batch that contains a null is promoted to
float64 by ``to_numpy(zero_copy_only=False)``, and
``hash_array(int64 5) != hash_array(float64 5.0)`` — so the same key can
land in different partitions depending on which rows it happens to share
a batch with (silently breaking any "all rows of a key in one partition"
invariant). ``stable_partition`` hashes the column's logical values
independent of per-batch null promotion:

* integer columns: nulls filled with 0 BEFORE to_numpy (dtype preserved),
  null rows then routed to partition 0 deterministically
* floating columns: never promoted; NaN/null rows routed to partition 0
* everything else (string/binary/bool): object path with nulls replaced
  by a sentinel, routed to partition 0

Partition 0 for nulls matches SQL GROUP BY semantics (all NULLs are one
group) for the bucketed operators built on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def stable_partition(col, n_parts: int) -> np.ndarray:
    """(chunked) Arrow array -> int64 partition ids in [0, n_parts)."""
    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.chunked_array([pa.array(col)])
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False).astype(bool)
    t = col.type
    if pa.types.is_integer(t):
        vals = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.ascontiguousarray(vals))
    elif pa.types.is_floating(t):
        vals = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        vals = np.where(null_mask, 0.0, vals)
        h = pd.util.hash_array(vals)
    elif pa.types.is_timestamp(t):
        vals = pc.fill_null(pc.cast(col, pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        h = pd.util.hash_array(np.ascontiguousarray(vals))
    else:
        vals = col.to_numpy(zero_copy_only=False).astype(object)
        if null_mask.any():
            vals = np.where(null_mask, "", vals)
        h = pd.util.hash_array(vals)
    part = (h % np.uint64(n_parts)).astype(np.int64)
    if null_mask.any():
        part[null_mask] = 0
    return part


def stable_pair_partition(a, b, n_parts: int) -> np.ndarray:
    """Partition ids for (a, b) key pairs of ANY dtype (numpy arrays or
    pandas Series); dtype-stable because both sides are hashed, never
    arithmetically combined."""
    ha = pd.util.hash_array(np.asarray(a))
    hb = pd.util.hash_array(np.asarray(b))
    return ((ha * np.uint64(31) + hb) % np.uint64(n_parts)).astype(np.int64)
