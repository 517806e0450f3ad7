"""Aggregation stages: per-class and global statistics, grouped counts.

The reference aggregates through one shared in-memory map guarded by a
single goroutine (bin/parser-cli.go:64,72-88). Distributed equivalent:

  events --map_batches--> per-(batch, class) PARTIAL rows (pickled
  mergeable stats: cnt/sum/min/max + GK sketch or exact value list)
        --groupby(class_id).map_groups--> merged + finalized class rows

The per-batch partial step is the skew treatment: a hot class contributes
ONE partial row per input batch regardless of how many events hit it, so
the groupby shuffles |classes| x |batches| small rows instead of 10^12
events - pre-aggregation acts as the salt, and no single reducer ever sees
the raw event stream.

Global stats are a tree reduction over the same partials (map_batches
combine -> tiny driver merge), never a driver-side event loop.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ..functions.stats import BoolStats, EventStats, MetricStats
from ..functions.ts import format_example_ts

PARTIAL_SCHEMA = pa.schema(
    [
        ("class_id", pa.string()),
        ("fingerprint", pa.string()),
        ("blob", pa.binary()),
    ]
)

STATS_STRUCT = pa.struct(
    [
        ("cnt", pa.uint64()),
        ("sum", pa.float64()),
        ("min", pa.float64()),
        ("avg", pa.float64()),
        ("pct95", pa.float64()),
        ("med", pa.float64()),
        ("max", pa.float64()),
    ]
)
BOOL_STRUCT = pa.struct([("cnt", pa.uint64()), ("true", pa.uint64())])

CLASS_STATS_SCHEMA = pa.schema(
    [
        ("class_id", pa.string()),
        ("fingerprint", pa.string()),
        ("total_queries", pa.uint64()),
        ("example_query", pa.string()),
        ("example_query_time", pa.float64()),
        ("example_ts", pa.string()),
        ("time_stats", pa.map_(pa.string(), STATS_STRUCT)),
        ("number_stats", pa.map_(pa.string(), STATS_STRUCT)),
        ("bool_stats", pa.map_(pa.string(), BOOL_STRUCT)),
    ]
)


class _ClassPartial:
    """Mergeable per-class accumulator shipped between stages as a pickle."""

    __slots__ = ("count", "stats", "example", "rate_pairs")

    def __init__(self, exact: bool):
        self.count = 0
        self.stats = EventStats(exact=exact)
        # (query_time, query, ts_raw, doc_id) of the argmax event; ties break
        # toward the smallest doc_id for distributed determinism (the serial
        # reference keeps the first-seen strictly-greater event,
        # class.go:100-116 - identical when Query_time values are unique).
        self.example: Optional[Tuple[float, str, str, str]] = None
        self.rate_pairs: set = set()

    def add_event(self, ev: Dict) -> None:
        self.count += 1
        self.stats.add(ev)
        if ev["rate_type"]:
            self.rate_pairs.add((ev["rate_type"], ev["rate_limit"]))
        qt = ev["time_metrics"].get("Query_time")
        if qt is not None:
            cand = (float(qt), ev["query"], ev["ts"], ev["doc_id"])
            if self.example is None or _example_wins(cand, self.example):
                self.example = cand

    def merge(self, other: "_ClassPartial") -> "_ClassPartial":
        self.count += other.count
        self.stats.merge(other.stats)
        self.rate_pairs |= other.rate_pairs
        if other.example is not None and (
            self.example is None or _example_wins(other.example, self.example)
        ):
            self.example = other.example
        return self


def _example_wins(cand, incumbent) -> bool:
    if cand[0] != incumbent[0]:
        return cand[0] > incumbent[0]
    return cand[3] < incumbent[3]  # smaller doc_id wins ties


def _batch_events(batch: pa.Table):
    """Iterate event dicts from an Arrow batch (only the columns stats need)."""
    cols = {
        name: batch[name].to_pylist()
        for name in (
            "class_id",
            "fingerprint",
            "doc_id",
            "query",
            "ts",
            "rate_type",
            "rate_limit",
            "time_metrics",
            "number_metrics",
            "bool_metrics",
        )
    }
    n = batch.num_rows
    for i in range(n):
        yield {
            "class_id": cols["class_id"][i],
            "fingerprint": cols["fingerprint"][i],
            "doc_id": cols["doc_id"][i],
            "query": cols["query"][i],
            "ts": cols["ts"][i],
            "rate_type": cols["rate_type"][i],
            "rate_limit": cols["rate_limit"][i],
            "time_metrics": dict(cols["time_metrics"][i]),
            "number_metrics": dict(cols["number_metrics"][i]),
            "bool_metrics": dict(cols["bool_metrics"][i]),
        }


def make_class_partials_fn(exact: bool = False):
    """map_batches fn: events batch -> one partial row per class in batch."""

    def _partials(batch: pa.Table) -> pa.Table:
        acc: Dict[str, _ClassPartial] = {}
        fps: Dict[str, str] = {}
        for ev in _batch_events(batch):
            cid = ev["class_id"]
            p = acc.get(cid)
            if p is None:
                p = acc[cid] = _ClassPartial(exact)
                fps[cid] = ev["fingerprint"]
            p.add_event(ev)
        return pa.Table.from_arrays(
            [
                pa.array(list(acc.keys()), pa.string()),
                pa.array([fps[c] for c in acc], pa.string()),
                pa.array([pickle.dumps(acc[c], protocol=4) for c in acc], pa.binary()),
            ],
            schema=PARTIAL_SCHEMA,
        )

    return _partials


def _finalize_class(cid: str, fp: str, p: _ClassPartial) -> Dict:
    cur = p.stats.current()

    def smap(d, keys):
        return [
            (m, {k: float(s.get(k, 0)) if k != "cnt" else int(s["cnt"]) for k in keys})
            for m, s in d.items()
        ]

    keys = ("cnt", "sum", "min", "avg", "pct95", "med", "max")
    ex = p.example or (0.0, "", "", "")
    return {
        "class_id": cid,
        "fingerprint": fp,
        "total_queries": p.count,
        "example_query": ex[1],
        "example_query_time": float(ex[0]),
        "example_ts": format_example_ts(ex[2]),
        "time_stats": smap(cur["time_metrics"], keys),
        "number_stats": smap(cur["number_metrics"], keys),
        "bool_stats": [
            (m, {"cnt": s["cnt"], "true": s["true"]})
            for m, s in cur["bool_metrics"].items()
        ],
    }


def _merge_group(group: pa.Table) -> pa.Table:
    cid = group["class_id"][0].as_py()
    fp = group["fingerprint"][0].as_py()
    merged: Optional[_ClassPartial] = None
    for blob in group["blob"].to_pylist():
        p = pickle.loads(blob)
        merged = p if merged is None else merged.merge(p)
    row = _finalize_class(cid, fp, merged)
    return pa.Table.from_pylist([row], schema=CLASS_STATS_SCHEMA)


def class_stats(events_ds, exact: bool = False):
    """Dataset of events -> Dataset of finalized per-class stats rows.

    exact=True retains all metric values (test scale, reproduces the
    reference's nearest-rank percentiles bit-for-bit); exact=False uses the
    mergeable GK sketch path (eps=0.01), the only viable mode at 10^12 rows.
    """
    partials = events_ds.map_batches(
        make_class_partials_fn(exact), batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("class_id").map_groups(
        _merge_group, batch_format="pyarrow"
    )


class GlobalStats:
    """Finalized run-level aggregate (GlobalClass equivalent)."""

    def __init__(self, total_queries, unique_queries, rate_type, rate_limit,
                 metrics, mixed_rate_limits):
        self.total_queries = total_queries
        self.unique_queries = unique_queries
        self.rate_type = rate_type
        self.rate_limit = rate_limit
        self.metrics = metrics
        self.mixed_rate_limits = mixed_rate_limits

    def as_dict(self) -> Dict:
        return {
            "total_queries": self.total_queries,
            "unique_queries": self.unique_queries,
            "rate_type": self.rate_type,
            "rate_limit": self.rate_limit,
            "mixed_rate_limits": self.mixed_rate_limits,
            "metrics": self.metrics,
        }


def global_stats(events_ds, exact: bool = False) -> GlobalStats:
    """Tree-reduced global EventStats + rate-limit consistency check.

    Single-row-per-batch partials, combined once more on the driver: the
    driver never loops over events, only over batch partials.
    """
    partial_fn = make_class_partials_fn(exact)

    def _combine(batch: pa.Table) -> pa.Table:
        per_class = partial_fn(batch)
        merged: Optional[_ClassPartial] = None
        classes: set = set()
        for cid, blob in zip(
            per_class["class_id"].to_pylist(), per_class["blob"].to_pylist()
        ):
            classes.add(cid)
            p = pickle.loads(blob)
            merged = p if merged is None else merged.merge(p)
        payload = pickle.dumps((merged, classes), protocol=4)
        return pa.table({"blob": pa.array([payload], pa.binary())})

    rows = events_ds.map_batches(
        _combine, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()

    merged: Optional[_ClassPartial] = None
    classes: set = set()
    for row in rows:
        p, cls = pickle.loads(row["blob"])
        if p is not None:
            merged = p if merged is None else merged.merge(p)
        classes |= cls
    if merged is None:
        return GlobalStats(0, 0, "", 0, {}, False)
    rate_type, rate_limit = "", 0
    if merged.rate_pairs:
        rate_type, rate_limit = sorted(merged.rate_pairs)[0]
    return GlobalStats(
        total_queries=merged.count,
        unique_queries=len(classes),
        rate_type=rate_type,
        rate_limit=rate_limit,
        metrics=merged.stats.current(),
        mixed_rate_limits=len(merged.rate_pairs) > 1,
    )


def grouped_counts(ds, keys: List[str], sum_col: Optional[str] = "n_tok"):
    """Pre-aggregated grouped counts: per-batch pandas combine, then a small
    groupby-sum shuffle over partials (never over raw rows)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        sel = keys + ([sum_col] if sum_col else [])
        df = batch.select(sel).to_pandas()
        if sum_col:
            g = df.groupby(keys, as_index=False).agg(
                n_rows=(sum_col, "size"), n_tokens=(sum_col, "sum")
            )
        else:
            g = df.groupby(keys, as_index=False).size().rename(columns={"size": "n_rows"})
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Sum("n_rows", alias_name="n_rows")]
    if sum_col:
        aggs.append(Sum("n_tokens", alias_name="n_tokens"))
    return partials.groupby(keys).aggregate(*aggs)
