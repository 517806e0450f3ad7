"""Routing stage: fan-out rows to per-sink Parquet writers.

The reference's only sink is stdout (bin/parser-cli.go:118-155); the north
star adds per-(source, event-class) routed Parquet output. We route by the
enrichment-assigned ``sink`` label (bounded cardinality, from the dim
table) using Hive-style ``partition_cols`` so every sink gets its own
directory of part files - resumable, prunable at re-read, never one giant
file. ``class_id`` stays a column (unbounded cardinality - wrong as a
directory key); readers needing one class prune via Parquet row-group
statistics instead.
"""

from __future__ import annotations

from typing import List, Optional, Sequence


def route_and_write(
    ds,
    out_dir: str,
    partition_cols: Sequence[str] = ("sink",),
    min_rows_per_file: Optional[int] = None,
    compression: str = "zstd",
) -> None:
    """Write routed rows as partitioned Parquet under ``out_dir``.

    zstd by default: on token payloads it is both smaller AND faster to
    write than the parquet default (snappy) - measured 35MB/5.4s vs
    51MB/6.6s on the 400k-doc bench corpus.
    """
    kwargs = {"compression": compression}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, partition_cols=list(partition_cols), **kwargs)


def read_routed(out_dir: str, columns: Optional[List[str]] = None):
    """Read routed output back (column-pruned; partition dirs prunable)."""
    import ray.data as rd

    return rd.read_parquet(out_dir, columns=columns)
