"""HyperLogLog: mergeable approximate distinct-count sketch.

Exact distinct (pipelines/queries.q_distinct_users_per_type) shuffles every
unique pair; at 10^12 rows an approximate mergeable sketch is the scalable
path: each batch folds its values into a 2^p-register sketch, registers
max-merge across batches/nodes, one final estimate. Standard bias-corrected
HLL (Flajolet et al. 2007) with the small-range linear-counting correction;
p=12 -> ~1.6% relative error, 4 KiB per sketch.

Deterministic: vectorized 64-bit value hashing (pandas hash_array =
SipHash-1-3 with a fixed key; numeric columns hash without any per-element
Python, string/bytes columns loop only in cython), no RNG.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(values: Iterable) -> np.ndarray:
        import pandas as pd

        arr = np.asarray(values)
        if arr.dtype.kind not in "iufbmM":  # strings/bytes/mixed -> object
            arr = arr.astype(object)
        # categorize folds duplicate-heavy columns down to one hash per
        # distinct value before the SipHash pass
        return pd.util.hash_array(arr, categorize=True).astype(np.uint64)

    def add_many(self, values) -> "HyperLogLog":
        h = self._hash64(values)
        if h.size == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits + 1, vectorized via
        # bit-length: lz = 64 - bit_length(rest)
        bl = np.zeros(h.size, dtype=np.int64)
        r = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r >= (np.uint64(1) << np.uint64(shift))
            bl[mask] += shift
            r[mask] >>= np.uint64(shift)
        bl += 1  # bit_length
        rank = (64 - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        h = cls(data[0])
        h.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return h


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Distributed approximate distinct-count of a Dataset column: one
    sketch per batch, registers merged on the driver (4 KiB each)."""
    import pyarrow as pa

    def _sketch(batch: pa.Table) -> pa.Table:
        # drop_null BEFORE to_numpy: COUNT DISTINCT ignores nulls, and an
        # int64 column batch containing a null would otherwise be promoted
        # to float64, giving the same value a different hash than in
        # null-free batches (double-counting it across sketches)
        col = batch[column].combine_chunks().drop_null()
        h = HyperLogLog(p).add_many(col.to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for b in ds.map_batches(
        _sketch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b["sketch"].to_pylist():
            merged.merge(HyperLogLog.from_bytes(blob))
    return merged.estimate()
