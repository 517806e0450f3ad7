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


# Per-worker-process cache of resolved dim indexes, keyed by ObjectRef hex:
# the broadcast object is fetched from the object store once per worker, not
# once per batch, without pinning an actor pool.
_DIM_CACHE: dict = {}


def _dim_maps(ref, join_key: str):
    key = (ref.hex() if hasattr(ref, "hex") else id(ref), join_key)
    maps = _DIM_CACHE.get(key)
    if maps is None:
        import ray

        dim = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if isinstance(dim, pa.Table):
            dim = dim.to_pandas()
        maps = {
            col: dict(zip(dim[join_key], dim[col]))
            for col in dim.columns
            if col != join_key
        }
        _DIM_CACHE[key] = maps
    return maps


def make_enrich_fn(ref, join_key: str = "source"):
    """Stateless-task enrich: broadcast dict fetched once per worker."""

    def _enrich(batch: pa.Table) -> pa.Table:
        maps = _dim_maps(ref, join_key)
        src = pd.Series(batch[join_key].to_pandas())
        for col, m in maps.items():
            batch = batch.append_column(
                col, pa.array(src.map(m).fillna(DEFAULT_MISS), pa.string())
            )
        return batch

    return _enrich


def enrich_events(
    ds,
    dim: Union[pa.Table, "pd.DataFrame"],
    join_key: str = "source",
    mode: str = "tasks",
    concurrency: Union[None, int, Tuple[int, int]] = None,
    batch_size: Optional[int] = 8192,
    **map_kwargs,
):
    """Attach dim columns to an event Dataset via a broadcast lookup.

    mode="tasks" (default): stateless tasks + per-worker dim cache. Elastic,
    no reserved CPUs, fuses freely with neighboring stages - right for a
    small dim table.

    mode="actors": an explicit actor pool holding the index (the pattern to
    use when per-actor state is heavy - a model, a large index). Pool size
    defaults to CPUs-2 so the fused pipeline never starves read/write
    tasks.
    """
    import ray

    ref = ray.put(dim)
    if mode == "tasks":
        return ds.map_batches(
            make_enrich_fn(ref, join_key),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            **map_kwargs,
        )
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(2, ncpu - 2)
    return ds.map_batches(
        Enrich,
        fn_constructor_args=(ref, join_key),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        **map_kwargs,
    )
