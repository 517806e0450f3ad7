"""Event statistics with the reference's exact conventions.

Mirrors /root/reference/log/stats.go and class.go:

* ``TimeStats``/``NumberStats``: Cnt, Sum, Min, Avg, Pct95, Med, Max.
  Percentiles use the reference's integer-index nearest-rank convention on
  the ascending-sorted value array: ``Pct95 = vals[(95*Cnt)//100]``,
  ``Med = vals[(50*Cnt)//100]``, ``Max = vals[Cnt-1]`` (stats.go:124-141).
* Number stats are uint64 throughout; ``Avg = Sum // Cnt`` is INTEGER
  division and Sum wraps modulo 2^64 (stats.go:84,137).
* Time metric values are float32 at parse time (slow.go:201); sums
  accumulate in float64 of the float32 values (stats.go:70).
* ``BoolStats``: Cnt / True counters (stats.go:39-42,88-106).
* ``GlobalClass`` / ``QueryClass`` aggregation incl. the example-query
  argmax on strictly-greater Query_time (class.go:96-117) and the
  mixed-rate-limit error (class.go:41-59).

Two accumulation modes:
* exact (default): retains all values per metric - the test/golden path,
  also used per-group at moderate group sizes;
* sketch: cnt/sum/min/max exact + GK sketch for percentiles - the
  mergeable, bounded-memory path for 10^12-row scale.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..state.gk import GKSummary
from .ts import format_example_ts

_U64 = 1 << 64


class MetricStats:
    """One metric's accumulator (time or number flavor)."""

    __slots__ = ("is_time", "cnt", "sum", "min", "max", "vals", "gk")

    def __init__(self, is_time: bool, exact: bool = True, eps: float = 0.01):
        self.is_time = is_time
        self.cnt = 0
        self.sum = 0.0 if is_time else 0
        self.min: Optional[float] = None
        self.max: Optional[float] = None
        self.vals: Optional[List] = [] if exact else None
        self.gk: Optional[GKSummary] = None if exact else GKSummary(eps)

    def add(self, val) -> None:
        self.cnt += 1
        if self.is_time:
            self.sum += float(val)
        else:
            self.sum = (self.sum + int(val)) % _U64
        if self.min is None or val < self.min:
            self.min = val
        if self.max is None or val > self.max:
            self.max = val
        if self.vals is not None:
            self.vals.append(val)
        else:
            self.gk.add(float(val))

    def add_array(self, arr: np.ndarray) -> None:
        """Vectorized bulk add."""
        if arr.size == 0:
            return
        self.cnt += int(arr.size)
        if self.is_time:
            self.sum += float(arr.sum(dtype=np.float64))
        else:
            # numpy uint64 addition wraps mod 2^64, matching Go's uint64 Sum.
            self.sum = (self.sum + int(arr.astype(np.uint64).sum())) % _U64
        lo, hi = arr.min(), arr.max()
        if self.min is None or lo < self.min:
            self.min = lo
        if self.max is None or hi > self.max:
            self.max = hi
        if self.vals is not None:
            self.vals.extend(arr.tolist())
        else:
            self.gk.add_many(arr)

    def merge(self, other: "MetricStats") -> "MetricStats":
        self.cnt += other.cnt
        if self.is_time:
            self.sum += other.sum
        else:
            self.sum = (self.sum + other.sum) % _U64
        for v in (other.min,):
            if v is not None and (self.min is None or v < self.min):
                self.min = v
        for v in (other.max,):
            if v is not None and (self.max is None or v > self.max):
                self.max = v
        if self.vals is not None and other.vals is not None:
            self.vals.extend(other.vals)
        else:
            if self.gk is None:  # exact -> sketch downgrade on mixed merge
                self.gk = GKSummary()
                self.gk.add_many(np.asarray(self.vals, dtype=np.float64))
                self.vals = None
            if other.vals is not None:
                self.gk.add_many(np.asarray(other.vals, dtype=np.float64))
            else:
                self.gk.merge(other.gk)
        return self

    def current(self) -> Dict:
        """Finalize, reproducing stats.go:120-143 exactly in exact mode."""
        if self.cnt == 0:
            return {}
        if self.is_time:
            avg = self.sum / self.cnt
        else:
            avg = self.sum // self.cnt
        if self.vals is not None:
            vals = sorted(self.vals)
            pct95 = vals[(95 * self.cnt) // 100]
            med = vals[(50 * self.cnt) // 100]
            mx = vals[self.cnt - 1]
            mn = vals[0]
        else:
            pct95 = self.gk.query(0.95)
            med = self.gk.query(0.50)
            mx = self.max
            mn = self.min
            if not self.is_time:
                pct95, med = int(pct95), int(med)
        return {
            "cnt": self.cnt,
            "sum": self.sum,
            "min": mn,
            "avg": avg,
            "pct95": pct95,
            "med": med,
            "max": mx,
        }


def merge_metric_stats(stats_list: List["MetricStats"]) -> "MetricStats":
    """Batch-merge many MetricStats (one GK merge_all instead of pairwise)."""
    first = stats_list[0]
    out = MetricStats(first.is_time, exact=all(s.vals is not None for s in stats_list))
    out.cnt = sum(s.cnt for s in stats_list)
    if first.is_time:
        out.sum = sum(s.sum for s in stats_list)
    else:
        out.sum = sum(s.sum for s in stats_list) % _U64
    mins = [s.min for s in stats_list if s.min is not None]
    maxs = [s.max for s in stats_list if s.max is not None]
    out.min = min(mins) if mins else None
    out.max = max(maxs) if maxs else None
    if out.vals is not None:
        for s in stats_list:
            out.vals.extend(s.vals)
    else:
        sketches = []
        for s in stats_list:
            if s.vals is not None:
                g = GKSummary()
                g.add_many(np.asarray(s.vals, dtype=np.float64))
                sketches.append(g)
            else:
                sketches.append(s.gk)
        out.gk = GKSummary.merge_all(sketches)
    return out


class BoolStats:
    __slots__ = ("cnt", "true")

    def __init__(self):
        self.cnt = 0
        self.true = 0

    def add(self, val: bool) -> None:
        self.cnt += 1
        if val:
            self.true += 1

    def merge(self, other: "BoolStats") -> "BoolStats":
        self.cnt += other.cnt
        self.true += other.true
        return self

    def current(self) -> Dict:
        return {"cnt": self.cnt, "true": self.true}


class EventStats:
    """Per-metric-name stats maps, mirroring log.EventStats (stats.go:8-12)."""

    def __init__(self, exact: bool = True, eps: float = 0.01):
        self.exact = exact
        self.eps = eps
        self.time: Dict[str, MetricStats] = {}
        self.number: Dict[str, MetricStats] = {}
        self.bool: Dict[str, BoolStats] = {}

    def add(self, event: Dict) -> None:
        for name, val in event["time_metrics"].items():
            s = self.time.get(name)
            if s is None:
                s = self.time[name] = MetricStats(True, self.exact, self.eps)
            s.add(float(val))
        for name, val in event["number_metrics"].items():
            s = self.number.get(name)
            if s is None:
                s = self.number[name] = MetricStats(False, self.exact, self.eps)
            s.add(int(val))
        for name, val in event["bool_metrics"].items():
            s = self.bool.get(name)
            if s is None:
                s = self.bool[name] = BoolStats()
            s.add(bool(val))

    def merge(self, other: "EventStats") -> "EventStats":
        for kind in ("time", "number", "bool"):
            mine, theirs = getattr(self, kind), getattr(other, kind)
            for name, s in theirs.items():
                if name in mine:
                    mine[name].merge(s)
                else:
                    mine[name] = s
        return self

    def current(self) -> Dict:
        return {
            "time_metrics": {k: v.current() for k, v in self.time.items()},
            "number_metrics": {k: v.current() for k, v in self.number.items()},
            "bool_metrics": {k: v.current() for k, v in self.bool.items()},
        }


class MixedRateLimitsError(Exception):
    """class.go:20-30."""


class GlobalClass:
    """Run-level aggregate, mirroring log.GlobalClass (class.go:12-64)."""

    def __init__(self, exact: bool = True):
        self.total_queries = 0
        self.unique_queries = 0
        self.rate_type = ""
        self.rate_limit = 0
        self.metrics = EventStats(exact=exact)

    def add_event(self, event: Dict) -> Optional[MixedRateLimitsError]:
        err = None
        if event["rate_type"]:
            if not self.rate_type:
                self.rate_type = event["rate_type"]
                self.rate_limit = event["rate_limit"]
            elif (
                self.rate_type != event["rate_type"]
                and self.rate_limit != event["rate_limit"]
            ):
                err = MixedRateLimitsError(
                    f"Mixed rate limits: have {self.rate_type}:{self.rate_limit}, "
                    f"got {event['rate_type']}:{event['rate_limit']}"
                )
        self.total_queries += 1
        self.metrics.add(event)
        return err

    def finalize(self, unique_queries: int) -> None:
        self.unique_queries = unique_queries


class QueryClass:
    """Per-fingerprint aggregate, mirroring log.QueryClass (class.go:70-121)."""

    def __init__(self, class_id: str, fingerprint: str, example: bool = True,
                 exact: bool = True):
        self.id = class_id
        self.fingerprint = fingerprint
        self.metrics = EventStats(exact=exact)
        self.total_queries = 0
        self.example = example
        self.example_query_time = 0.0
        self.example_query = ""
        self.example_ts = ""

    def add_event(self, event: Dict) -> None:
        self.total_queries += 1
        self.metrics.add(event)
        if self.example:
            qt = event["time_metrics"].get("Query_time")
            if qt is not None and float(qt) > self.example_query_time:
                self.example_query_time = float(qt)
                self.example_query = event["query"]
                self.example_ts = format_example_ts(event["ts"])
