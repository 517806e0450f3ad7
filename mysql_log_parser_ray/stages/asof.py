"""As-of (point-in-time) join: each fact row joins the LATEST dimension
version at or before its event time.

Ray Data has no asof join; the reference has no joins at all (SURVEY.md
§2.5). This is the broadcast implementation: the versioned dim table is
``ray.put`` once (sorted by the time key, as ``pandas.merge_asof``
requires), every task resolves it once per worker process, and each batch
runs one C-implemented ``merge_asof``. No shuffle - right whenever the dim
side fits in memory (the common case for config/metadata history).

Partitioning assumption for the big-dim variant (documented, not built):
hash-partition BOTH sides by the `by` key, sort each partition by time,
then the same merge_asof per co-partition - one all-to-all each side.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
import pyarrow as pa

from ..broadcast import broadcast_get as _resolve


def asof_join_broadcast(
    facts_ds,
    dim: pd.DataFrame,
    on: str,
    by: Optional[str] = None,
    dim_on: Optional[str] = None,
    columns: Optional[List[str]] = None,
):
    """Left as-of join facts->dim (backward: latest dim row with
    ``dim_on <= on`` per ``by`` group). Facts with no matching version get
    nulls, like merge_asof."""
    import ray

    dim_on = dim_on or on
    dim_sorted = dim.sort_values(dim_on).reset_index(drop=True)
    ref = ray.put(dim_sorted)

    def _join(batch: pa.Table) -> pa.Table:
        d = _resolve(ref)
        df = batch.to_pandas().sort_values(on, kind="mergesort")
        out = pd.merge_asof(
            df,
            d,
            left_on=on,
            right_on=dim_on,
            by=by,
            direction="backward",
        )
        if columns is not None:
            out = out[columns]
        return pa.Table.from_pandas(out, preserve_index=False)

    return facts_ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)
