"""Flatten dynamic metric maps into typed columns (vectorized helper).

The Arrow map columns preserve the reference's dynamic metric discovery;
relational consumers (oracle comparisons, sinks, BI) want flat columns for
the well-known metrics. One pass per batch, nulls for absent metrics.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import pyarrow as pa

DEFAULT_TIME = ("Query_time", "Lock_time")
DEFAULT_NUMBER = ("Rows_sent", "Rows_examined", "Thread_id")


def flatten_metrics(
    batch: pa.Table,
    time_metrics: Sequence[str] = DEFAULT_TIME,
    number_metrics: Sequence[str] = DEFAULT_NUMBER,
) -> pa.Table:
    tm = [dict(x) for x in batch["time_metrics"].to_pylist()]
    nm = [dict(x) for x in batch["number_metrics"].to_pylist()]
    for name in time_metrics:
        batch = batch.append_column(
            name.lower(), pa.array([d.get(name) for d in tm], pa.float64())
        )
    for name in number_metrics:
        batch = batch.append_column(
            name.lower(), pa.array([d.get(name) for d in nm], pa.int64())
        )
    return batch


def flatten_events(ds, time_metrics=DEFAULT_TIME, number_metrics=DEFAULT_NUMBER):
    def _f(b: pa.Table) -> pa.Table:
        return flatten_metrics(b, time_metrics, number_metrics)

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
