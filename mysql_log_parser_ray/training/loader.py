"""Epoch data loading: deterministic two-level shuffle.

The training-loop consumption pattern at corpus scale: a FULL
``random_shuffle`` is an all-to-all over every byte of the corpus per
epoch — the standard substitute is two-level shuffling, (1) permute the
order blocks are consumed in, (2) permute rows inside each block, both
from a seeded RNG. No data moves between blocks; the only cost is the
in-memory permutation of each block as it streams. This is the
documented trade: global-uniformity is approximate (rows can never leave
their block), which is why block assignment upstream should already be
content-independent (hash-partitioned, as every write path here is).

Determinism: the same (dataset layout, seed) yields the same epoch
order — reproducible across runs, which is what makes training
restartable mid-epoch. Different seeds (e.g. seed+epoch) decorrelate
epochs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def epoch_dataset(ds, seed: int):
    """Return a Dataset in two-level-shuffled epoch order: seeded block
    order + a seeded row permutation inside every block."""
    shuffled = ds.randomize_block_order(seed=seed)
    # the streaming executor consults the DataContext SNAPSHOT the dataset
    # carries (copied at creation) — flipping the global context at
    # consumption time is a no-op. Without preserve_order, blocks yield in
    # task-COMPLETION order and the epoch order would vary run to run
    # even with a fixed seed (the row set would not).
    shuffled.context.execution_options.preserve_order = True

    def _permute(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= 1:
            return batch
        # per-block seed: mix the epoch seed with a content-stable tag so
        # every block gets a distinct permutation that is reproducible
        # across runs AND worker processes (python hash() is salted per
        # process — crc32 is not)
        import zlib

        first = batch.column(0)[0].as_py()
        tag = zlib.crc32(f"{first}|{batch.num_rows}".encode())
        rng = np.random.default_rng((seed * 1_000_003 + tag) & 0x7FFFFFFF)
        return batch.take(pa.array(rng.permutation(batch.num_rows)))

    return shuffled.map_batches(
        _permute, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def epoch_batches(ds, seed: int, batch_size: int = 1024):
    """Iterate an epoch's batches in two-level-shuffled order (the
    driver-side consumption endpoint; training workers would instead
    split the shuffled dataset with ``streaming_split``).

    Exact epoch-order reproducibility comes from epoch_dataset setting
    ``preserve_order`` on the dataset's own context snapshot."""
    yield from epoch_dataset(ds, seed).iter_batches(
        batch_size=batch_size, batch_format="pyarrow"
    )
