"""Greenwald-Khanna epsilon-approximate quantile summary, mergeable.

The reference keeps one GK sketch (eps=0.01) per time metric per class as
the approximate counterpart of its exact sorted-array percentiles
(/root/reference/log/stats.go:24,65,72,130; the gkquantile dep's QueryRank /
Histo surface is used by the CLI at bin/parser-cli.go:130-148). At 10^12
rows the exact path (retain every value) is impossible, so this sketch is
the scalable percentile path in our engine.

Implementation is from public knowledge: Greenwald & Khanna,
"Space-Efficient Online Computation of Quantile Summaries" (SIGMOD'01), plus
the standard mergeability treatment (Agarwal et al., "Mergeable Summaries",
PODS'12): summaries built per batch from sorted numpy arrays, merged
associatively across batches/partitions, then compressed. Rank error is
bounded by eps*n_total because per-part rank uncertainties are additive and
each part's is <= eps*n_part; compression adds at most another eps*n. We
build parts at eps/4 and compress at eps/4, keeping total error comfortably
under eps.

Tuples are (v, g, delta): g = rank gap to the previous tuple, delta = rank
uncertainty. rmin(i) = sum(g[:i+1]), rmax(i) = rmin(i) + delta(i).
"""

from __future__ import annotations

import pickle
from typing import List, Optional, Tuple

import numpy as np


class GKSummary:
    __slots__ = ("eps", "n", "_vals", "_g", "_delta", "_buf")

    def __init__(self, eps: float = 0.01):
        self.eps = eps
        self.n = 0
        self._vals = np.empty(0, dtype=np.float64)
        self._g = np.empty(0, dtype=np.int64)
        self._delta = np.empty(0, dtype=np.int64)
        self._buf: List[float] = []

    # ---- building ------------------------------------------------------

    def add(self, v: float) -> None:
        """Single-value insert (buffered; flushed on query/merge/compress)."""
        self._buf.append(float(v))
        if len(self._buf) >= 4096:
            self._flush()

    def add_many(self, values: np.ndarray) -> None:
        """Bulk insert: sort once, summarize, merge. The vectorized hot path."""
        values = np.asarray(values, dtype=np.float64)
        if values.size == 0:
            return
        self._merge_sorted(np.sort(values))

    def _flush(self) -> None:
        if self._buf:
            vals = np.sort(np.array(self._buf, dtype=np.float64))
            self._buf.clear()
            self._merge_sorted(vals)

    def _merge_sorted(self, vals: np.ndarray) -> None:
        """Merge a sorted value array: summarize at eps/2, then merge tuples."""
        m = vals.size
        step = max(1, int(self.eps * m / 4))
        # Sample every `step`-th order statistic; tuple i covers `g` ranks
        # exactly (delta=0 within the part: ranks are known from sorting).
        idx = np.arange(step - 1, m, step)
        if idx.size == 0 or idx[-1] != m - 1:
            idx = np.append(idx, m - 1)
        g = np.diff(np.concatenate(([-1], idx)))
        delta = np.zeros(idx.size, dtype=np.int64)
        # delta within a part: value at sampled index has exact rank in the
        # part, but values *between* samples are unrepresented; standard GK
        # accounting puts the gap in g. Uncertainty for queries comes from
        # g>1 tuples, which the rank-search below handles.
        self._merge_tuples(vals[idx], g.astype(np.int64), delta)
        self.n += m

    def _merge_tuples(self, vals, g, delta) -> None:
        if self._vals.size == 0:
            self._vals, self._g, self._delta = vals, g, delta
            return
        # Standard summary merge: interleave by value; delta of an element
        # from summary A gains the local uncertainty of its neighbors in B.
        order = np.argsort(np.concatenate([self._vals, vals]), kind="mergesort")
        self._vals = np.concatenate([self._vals, vals])[order]
        self._g = np.concatenate([self._g, g])[order]
        self._delta = np.concatenate([self._delta, delta])[order]
        if self._vals.size > max(64, int(16 / self.eps)):
            self._compress()

    def merge(self, other: "GKSummary") -> "GKSummary":
        """Merge another summary into this one (associative, in-place)."""
        other._flush()
        if other.n:
            self._flush()
            self._merge_tuples(other._vals, other._g, other._delta)
            self.n += other.n
        return self

    @classmethod
    def merge_all(cls, summaries) -> "GKSummary":
        """Merge many summaries with ONE concatenation + sort + compress.

        O(total log total) instead of repeated pairwise re-sorts; the batch
        path for reducing hundreds of per-batch partials per class.
        """
        summaries = [s for s in summaries if s is not None]
        if not summaries:
            return cls()
        for s in summaries:
            s._flush()
        out = cls(min(s.eps for s in summaries))
        out.n = sum(s.n for s in summaries)
        vals = np.concatenate([s._vals for s in summaries])
        g = np.concatenate([s._g for s in summaries])
        delta = np.concatenate([s._delta for s in summaries])
        order = np.argsort(vals, kind="mergesort")
        out._vals, out._g, out._delta = vals[order], g[order], delta[order]
        out._compress()
        return out

    def compress(self) -> None:
        """Public compression, mirroring GKq.Compress() (stats.go:130)."""
        self._flush()
        self._compress()

    def _compress(self) -> None:
        if self._vals.size <= 2:
            return
        cap = max(1, int(self.eps * self.n / 4))
        # Vectorized grid-merge: keep the first tuple whose cumulative rank
        # crosses each multiple of `cap` (plus endpoints). Gaps between kept
        # tuples stay <= cap + max(g), preserving the eps/2 budget.
        cumg = np.cumsum(self._g)
        grid = np.arange(cap, int(cumg[-1]), cap, dtype=np.int64)
        idx = np.searchsorted(cumg, grid, side="left")
        keep_idx = np.unique(np.concatenate(([0], idx, [self._vals.size - 1])))
        new_g = np.diff(np.concatenate(([0], cumg[keep_idx])))
        self._vals = self._vals[keep_idx]
        self._g = new_g
        self._delta = self._delta[keep_idx]

    # ---- querying ------------------------------------------------------

    def query(self, phi: float) -> float:
        """Value at quantile phi in [0, 1]."""
        v, _, _ = self.query_rank(phi)
        return v

    def query_rank(self, phi: float) -> Tuple[float, int, int]:
        """(value, rmin, rmax) at quantile phi, like gkquantile.QueryRank
        (bin/parser-cli.go:131)."""
        self._flush()
        if self.n == 0:
            return (float("nan"), 0, 0)
        phi = min(max(phi, 0.0), 1.0)
        target = max(1, int(np.ceil(phi * self.n)))
        rmin = np.cumsum(self._g)
        rmax = rmin + self._delta
        i = int(np.searchsorted(rmin, target, side="left"))
        i = min(i, self._vals.size - 1)
        return (float(self._vals[i]), int(rmin[i]), int(rmax[i]))

    def histo(self, nbuckets: int = 20) -> List[Tuple[float, float, int]]:
        """Equal-width histogram (lo, hi, approx_count), like GKq.Histo(20)
        (bin/parser-cli.go:137)."""
        self._flush()
        if self.n == 0:
            return []
        lo, hi = float(self._vals[0]), float(self._vals[-1])
        if hi == lo:
            return [(lo, hi, self.n)]
        edges = np.linspace(lo, hi, nbuckets + 1)
        rmin = np.cumsum(self._g)
        ranks = np.interp(edges, self._vals, rmin)
        counts = np.diff(ranks).round().astype(int)
        return [(float(edges[i]), float(edges[i + 1]), int(counts[i])) for i in range(nbuckets)]

    # ---- serialization (for Arrow binary columns) -----------------------

    def to_bytes(self) -> bytes:
        self._flush()
        return pickle.dumps(
            (self.eps, self.n, self._vals, self._g, self._delta), protocol=4
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "GKSummary":
        s = cls.__new__(cls)
        s.eps, s.n, s._vals, s._g, s._delta = pickle.loads(data)
        s._buf = []
        return s

    def __len__(self) -> int:
        self._flush()
        return int(self._vals.size)
