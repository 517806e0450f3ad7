"""Enrich stage: broadcast lookup join against the source dimension table.

The reference has no joins (single input); the north star adds a
source -> metadata lookup. Semantics: LEFT JOIN on ``source`` with
``"unknown"`` for misses. Implementation is the canonical broadcast
pattern: the dim table is ``ray.put`` ONCE on the driver; each actor
resolves it ONCE in ``__init__`` and builds plain dict indexes; per batch
the lookup is a vectorized ``pandas.Series.map``. No shuffle, nothing
re-shipped per batch.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import pandas as pd
import pyarrow as pa

DEFAULT_MISS = "unknown"


class Enrich:
    """Actor-pool callable for map_batches (stateful stage: dim index)."""

    def __init__(self, dim, join_key: str = "source"):
        import ray

        if isinstance(dim, ray.ObjectRef):
            dim = ray.get(dim)
        if isinstance(dim, pa.Table):
            dim = dim.to_pandas()
        self.join_key = join_key
        self.maps = {
            col: dict(zip(dim[join_key], dim[col]))
            for col in dim.columns
            if col != join_key
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = pd.Series(batch[self.join_key].to_pandas())
        for col, m in self.maps.items():
            vals = src.map(m)
            batch = batch.append_column(
                col, pa.array(vals.fillna(DEFAULT_MISS), pa.string())
            )
        return batch


def enrich_events(
    ds,
    dim: Union[pa.Table, "pd.DataFrame"],
    join_key: str = "source",
    concurrency: Union[int, Tuple[int, int]] = (1, 8),
    batch_size: Optional[int] = 8192,
    **map_kwargs,
):
    """Attach dim columns to an event Dataset via a broadcast actor pool."""
    import ray

    ref = ray.put(dim)
    return ds.map_batches(
        Enrich,
        fn_constructor_args=(ref, join_key),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        **map_kwargs,
    )
