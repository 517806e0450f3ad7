"""Distributed SHARED MUTABLE key index — the one semantics the Dataset
API genuinely cannot express (every streaming task must consult/update
one global set), so this is the repo's deliberate raw-actor escape hatch.

Reference parity: the Go engine keeps a single-process global class map
that every parsed event consults (mysql-log-parser class registry used
by the aggregate step); at cluster scale that map becomes N shard
actors, each the unique home of a key-hash range.

Partitioning assumption (documented per the build rules): a key's home
shard is a PURE FUNCTION of the key (first md5 byte mod n_shards), so
every copy of a key lands on the same actor and set semantics make the
final per-shard cardinality independent of arrival order, batch
boundaries and parallelism. Actors process their mailbox serially, which
also guarantees exactly-one-survivor for the streaming dedup filter even
when two concurrent batches race on the same brand-new key.

md5 is used (not pd.util.hash_array) because it is the repo's only
SQL-replicable hash (docs_weighted_sample precedent) — the DuckDB oracle
reproduces the shard routing bit-for-bit. The md5 loop runs over the
per-batch UNIQUE texts only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

_DIG = 16  # md5 digest width in bytes


@ray.remote(num_cpus=0.05)
class _IndexShard:
    """One home shard: an exact set of 16-byte md5 digests.

    num_cpus=0.05 keeps 8 shards under half a core so the pool can NEVER
    starve upstream map tasks on a small CPU budget (the actor-floor
    deadlock documented in CLAUDE.md)."""

    def __init__(self):
        self._seen: set[bytes] = set()

    def add(self, blob: bytes) -> int:
        """Insert concatenated digests; returns how many were new."""
        seen = self._seen
        before = len(seen)
        for i in range(0, len(blob), _DIG):
            seen.add(blob[i : i + _DIG])
        return len(seen) - before

    def check_and_add(self, blob: bytes) -> bytes:
        """Insert digests; returns one byte per digest: 1 if the digest
        was ALREADY present (a duplicate), 0 if this call inserted it."""
        seen = self._seen
        out = bytearray(len(blob) // _DIG)
        for j, i in enumerate(range(0, len(blob), _DIG)):
            d = blob[i : i + _DIG]
            if d in seen:
                out[j] = 1
            else:
                seen.add(d)
        return bytes(out)

    def size(self) -> int:
        return len(self._seen)


def _digests(texts):
    """md5 digests for a list of strings (loop bounded by batch size;
    callers pre-unique where semantics allow)."""
    return [hashlib.md5(t.encode("utf-8")).digest() for t in texts]


def shard_distinct_counts(ds, text_col: str = "text", n_shards: int = 8):
    """Stream ``ds`` through a sharded mutable index and return the exact
    per-shard distinct-text cardinality as a pandas frame
    ``(shard, n_distinct)`` — always ``n_shards`` rows, zeros included.

    Each batch digests its UNIQUE texts, routes digests to their home
    shards and ray.get()s the adds before returning (bounding in-flight
    actor mail to one round per running task — streaming backpressure is
    preserved; nothing corpus-sized ever sits on the driver or in any
    one actor beyond its own key range)."""
    shards = [_IndexShard.remote() for _ in range(n_shards)]

    def _feed(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or text_col not in b.column_names:
            return pa.table({"_fed": pa.array([], pa.int64())})
        uniq = set(b[text_col].to_pylist())
        by: dict[int, list[bytes]] = {}
        for d in _digests(uniq):
            by.setdefault(d[0] % n_shards, []).append(d)
        ray.get([shards[k].add.remote(b"".join(v)) for k, v in by.items()])
        return pa.table({"_fed": pa.array([b.num_rows], pa.int64())})

    ds.map_batches(
        _feed, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).count()  # drives the stream to completion
    sizes = ray.get([sh.size.remote() for sh in shards])
    return pd.DataFrame(
        {
            "shard": np.arange(n_shards, dtype=np.int64),
            "n_distinct": np.asarray(sizes, dtype=np.int64),
        }
    )


def streaming_dedup_filter(ds, text_col: str = "text", n_shards: int = 8):
    """Online exact-dedup filter: returns a Dataset holding exactly ONE
    row per distinct ``text_col`` value, decided against the shared index
    AS THE STREAM FLOWS (no shuffle, no second pass — the alternative to
    dedup.py's hash-partition batch dedup when rows must keep flowing).

    Caveat (documented, inherent): WHICH copy survives follows arrival
    order, so survivor identity is not run-deterministic — the survivor
    COUNT and the surviving text SET are (actor mailboxes serialize
    check_and_add, so two racing batches can never both keep a key).
    Rows duplicated WITHIN a batch keep their first occurrence."""
    shards = [_IndexShard.remote() for _ in range(n_shards)]

    def _filter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or text_col not in b.column_names:
            return b
        texts = b[text_col].to_pylist()
        digs = _digests(texts)
        first_idx: dict[bytes, int] = {}
        for i, d in enumerate(digs):
            first_idx.setdefault(d, i)
        by: dict[int, list[bytes]] = {}
        for d in first_idx:
            by.setdefault(d[0] % n_shards, []).append(d)
        keys = sorted(by)
        masks = ray.get(
            [shards[k].check_and_add.remote(b"".join(by[k])) for k in keys]
        )
        dup_digest = {
            d
            for k, m in zip(keys, masks)
            for d, flag in zip(by[k], m)
            if flag
        }
        keep = np.zeros(b.num_rows, dtype=bool)
        for d, i in first_idx.items():
            if d not in dup_digest:
                keep[i] = True
        return b.filter(pa.array(keep))

    return ds.map_batches(
        _filter, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
