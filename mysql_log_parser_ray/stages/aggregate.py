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
import pyarrow.compute as pc

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

# NumberStats is uint64 THROUGHOUT in the reference (stats.go:27-37); a
# float64 struct would silently round sums past 2^53 (a class summing
# Rows_examined at 10^12-row scale gets there easily).
NUMBER_STATS_STRUCT = pa.struct(
    [
        ("cnt", pa.uint64()),
        ("sum", pa.uint64()),
        ("min", pa.uint64()),
        ("avg", pa.uint64()),
        ("pct95", pa.uint64()),
        ("med", pa.uint64()),
        ("max", pa.uint64()),
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
        ("number_stats", pa.map_(pa.string(), NUMBER_STATS_STRUCT)),
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


def merge_partials(parts: List[_ClassPartial]) -> _ClassPartial:
    """Batch-merge many partials: one GK merge_all per metric, not pairwise."""
    from ..functions.stats import merge_metric_stats

    if len(parts) == 1:
        return parts[0]
    out = _ClassPartial(exact=False)
    out.count = sum(p.count for p in parts)
    for kind in ("time", "number"):
        names = set()
        for p in parts:
            names.update(getattr(p.stats, kind))
        for name in names:
            lst = [
                getattr(p.stats, kind)[name]
                for p in parts
                if name in getattr(p.stats, kind)
            ]
            getattr(out.stats, kind)[name] = merge_metric_stats(lst)
    bool_names = set()
    for p in parts:
        bool_names.update(p.stats.bool)
    for name in bool_names:
        bs = BoolStats()
        for p in parts:
            s = p.stats.bool.get(name)
            if s is not None:
                bs.cnt += s.cnt
                bs.true += s.true
        out.stats.bool[name] = bs
    for p in parts:
        out.rate_pairs |= p.rate_pairs
        if p.example is not None and (
            out.example is None or _example_wins(p.example, out.example)
        ):
            out.example = p.example
    return out


def _explode_map(col):
    """MapArray column -> (keys, items, row_idx) with slicing normalized.

    ``.keys``/``.items`` are the FULL child arrays; ``.offsets`` index into
    them absolutely (pyarrow semantics), so slice by the offset base.
    """
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy().astype(np.int64)
    base = int(offs[0])
    rel = offs - base
    total = int(rel[-1])
    keys = arr.keys.slice(base, total)
    items = arr.items.slice(base, total)
    row_idx = np.repeat(np.arange(len(arr), dtype=np.int64), np.diff(rel))
    return keys, items, row_idx


def make_class_partials_fn(exact: bool = False, example_queries: bool = True):
    """map_batches fn: events batch -> one partial row per class in batch.

    ``example_queries=False`` mirrors Options.ExampleQueries off
    (options.go:5, class.go:100): no literal query examples are retained.

    Fully vectorized: class/metric keys are factorized once, metric maps are
    exploded via Arrow offsets, and per-(class, metric) segments are carved
    out of ONE stable argsort - no per-event Python in this stage.
    """
    import numpy as np
    import pandas as pd

    def _segments(group_key, order):
        sk = group_key[order]
        bounds = np.flatnonzero(np.diff(sk)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sk)]))
        return sk, starts, ends

    def _partials(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.string()),
                 pa.array([], pa.binary())],
                schema=PARTIAL_SCHEMA,
            )
        codes, uniques = pd.factorize(pd.Series(batch["class_id"].to_pandas()))
        codes = codes.astype(np.int64)
        ncls = len(uniques)
        parts = [_ClassPartial(exact) for _ in range(ncls)]
        for p, c in zip(parts, np.bincount(codes, minlength=ncls)):
            p.count = int(c)
        first_idx = np.unique(codes, return_index=True)[1]
        fps = batch["fingerprint"].take(pa.array(first_idx)).to_pylist()

        # time + number metrics
        for kind, attr, is_time in (
            ("time_metrics", "time", True),
            ("number_metrics", "number", False),
        ):
            keys, items, rows = _explode_map(batch[kind])
            if len(rows) == 0:
                if kind == "time_metrics":
                    qt_rows = np.empty(0, np.int64)
                    qt_vals = np.empty(0, np.float64)
                continue
            kcodes, kuniq = pd.factorize(pd.Series(keys.to_pandas()))
            kcodes = kcodes.astype(np.int64)
            vals = items.to_numpy(zero_copy_only=False)
            vals = vals.astype(np.float64) if is_time else vals.astype(np.uint64)
            gkey = codes[rows] * len(kuniq) + kcodes
            order = np.argsort(gkey, kind="stable")
            sk, starts, ends = _segments(gkey, order)
            sv = vals[order]
            for s0, e0 in zip(starts, ends):
                g = int(sk[s0])
                c, k = g // len(kuniq), kuniq[g % len(kuniq)]
                ms = MetricStats(is_time, exact)
                ms.add_array(sv[s0:e0])
                getattr(parts[c].stats, attr)[k] = ms
            if kind == "time_metrics":
                qt_mask = np.asarray(kuniq) == "Query_time"
                if qt_mask.any():
                    qcode = int(np.flatnonzero(qt_mask)[0])
                    m = kcodes == qcode
                    qt_rows, qt_vals = rows[m], vals[m]
                else:
                    qt_rows = np.empty(0, np.int64)
                    qt_vals = np.empty(0, np.float64)

        # bool metrics: cnt/true via bincount
        keys, items, rows = _explode_map(batch["bool_metrics"])
        if len(rows):
            kcodes, kuniq = pd.factorize(pd.Series(keys.to_pandas()))
            kcodes = kcodes.astype(np.int64)
            bvals = items.to_numpy(zero_copy_only=False).astype(np.int64)
            gkey = codes[rows] * len(kuniq) + kcodes
            size = ncls * len(kuniq)
            cnts = np.bincount(gkey, minlength=size)
            trues = np.bincount(gkey, weights=bvals, minlength=size).astype(np.int64)
            for g in np.flatnonzero(cnts):
                bs = BoolStats()
                bs.cnt = int(cnts[g])
                bs.true = int(trues[g])
                parts[g // len(kuniq)].stats.bool[kuniq[g % len(kuniq)]] = bs

        # example argmax: (Query_time desc, doc_id asc) per class
        if example_queries and len(qt_rows):
            docs = batch["doc_id"].take(pa.array(qt_rows)).to_pylist()
            df = pd.DataFrame({"c": codes[qt_rows], "qt": qt_vals, "i": qt_rows,
                               "doc": docs})
            df = df.sort_values(["c", "qt", "doc"], ascending=[True, False, True],
                                kind="mergesort")
            top = df.drop_duplicates("c")
            idx = pa.array(top["i"].to_numpy())
            queries = batch["query"].take(idx).to_pylist()
            tss = batch["ts"].take(idx).to_pylist()
            for (c, qt, doc), q, ts in zip(
                zip(top["c"], top["qt"], top["doc"]), queries, tss
            ):
                parts[int(c)].example = (float(qt), q, ts, doc)

        # rate-limit pairs (rarely present; operate on the filtered subset)
        rtypes = batch["rate_type"].to_pylist()
        if any(rtypes):
            rlimits = batch["rate_limit"].to_pylist()
            for i, rt in enumerate(rtypes):
                if rt:
                    parts[codes[i]].rate_pairs.add((rt, rlimits[i]))

        return pa.Table.from_arrays(
            [
                pa.array(list(uniques), pa.string()),
                pa.array(fps, pa.string()),
                pa.array([pickle.dumps(p, protocol=4) for p in parts], pa.binary()),
            ],
            schema=PARTIAL_SCHEMA,
        )

    return _partials


def _finalize_class(cid: str, fp: str, p: _ClassPartial) -> Dict:
    cur = p.stats.current()

    def smap(d, keys, cast=float):
        return [
            (m, {k: cast(s.get(k, 0)) if k != "cnt" else int(s["cnt"]) for k in keys})
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
        # sketch-mode percentiles come back as float64; float64 rounding of
        # values near MaxUint64 can land on exactly 2^64, which overflows
        # the uint64 struct - clamp
        "number_stats": smap(
            cur["number_metrics"], keys,
            cast=lambda v: min(int(v), (1 << 64) - 1),
        ),
        "bool_stats": [
            (m, {"cnt": s["cnt"], "true": s["true"]})
            for m, s in cur["bool_metrics"].items()
        ],
    }


def _merge_group(group: pa.Table) -> pa.Table:
    cid = group["class_id"][0].as_py()
    fp = group["fingerprint"][0].as_py()
    merged = merge_partials([pickle.loads(b) for b in group["blob"].to_pylist()])
    row = _finalize_class(cid, fp, merged)
    return pa.Table.from_pylist([row], schema=CLASS_STATS_SCHEMA)


def class_partials(events_ds, exact: bool = False, batch_size: int = 65536,
                   example_queries: bool = True):
    """Events Dataset -> per-(batch, class) partials Dataset (tiny rows).

    Large batches on purpose: fewer partial blobs -> cheaper class merge.
    """
    return events_ds.map_batches(
        make_class_partials_fn(exact, example_queries),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def class_stats_from_partials(partials_ds, n_parts: int = 64):
    """Distributed class merge: hash-bucket classes into ``n_parts`` coarse
    partitions (ONE shuffle on a small key, never per-class ray dispatch)
    and merge+finalize every class of a partition in one callback. The
    worker-side loop is per class over tiny partial blobs, not per event.
    """
    import numpy as np
    import pandas as pd

    def _with_part(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            batch["class_id"].to_numpy(zero_copy_only=False)
        )
        part = (h % np.uint64(n_parts)).astype(np.int64)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def _merge_partition(g: pa.Table) -> pa.Table:
        cids = g["class_id"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(cids)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        blobs = g["blob"].to_pylist()
        fps = g["fingerprint"].to_pylist()
        starts = np.r_[0, np.flatnonzero(np.diff(codes_s)) + 1]
        ends = np.r_[starts[1:], len(codes_s)]
        rows = []
        for s0, e0 in zip(starts, ends):
            merged = merge_partials(
                [pickle.loads(blobs[order[i]]) for i in range(s0, e0)]
            )
            rows.append(
                _finalize_class(uniq[codes_s[s0]], fps[order[s0]], merged)
            )
        return pa.Table.from_pylist(rows, schema=CLASS_STATS_SCHEMA)

    return (
        partials_ds.map_batches(
            _with_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("part")
        .map_groups(_merge_partition, batch_format="pyarrow")
    )


def class_stats(events_ds, exact: bool = False):
    """Dataset of events -> Dataset of finalized per-class stats rows.

    exact=True retains all metric values (test scale, reproduces the
    reference's nearest-rank percentiles bit-for-bit); exact=False uses the
    mergeable GK sketch path (eps=0.01), the only viable mode at 10^12 rows.
    """
    return class_stats_from_partials(class_partials(events_ds, exact))


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


def global_stats_from_partials(partials_ds) -> GlobalStats:
    """Tree-reduced global EventStats + rate-limit consistency check.

    Combines per-(batch, class) partial rows within each partials batch,
    then merges the handful of survivors on the driver: the driver never
    loops over events, only over batch-level partials.
    """

    def _combine(batch: pa.Table) -> pa.Table:
        classes = set(batch["class_id"].to_pylist())
        parts = [pickle.loads(b) for b in batch["blob"].to_pylist()]
        merged = merge_partials(parts) if parts else None
        payload = pickle.dumps((merged, classes), protocol=4)
        return pa.table({"blob": pa.array([payload], pa.binary())})

    rows = partials_ds.map_batches(
        _combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()

    survivors = []
    classes: set = set()
    for row in rows:
        p, cls = pickle.loads(row["blob"])
        if p is not None:
            survivors.append(p)
        classes |= cls
    merged = merge_partials(survivors) if survivors else None
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


def global_stats(events_ds, exact: bool = False) -> GlobalStats:
    return global_stats_from_partials(class_partials(events_ds, exact))


MIXED_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = class partial, 1 = sink-count partial
        ("class_id", pa.string()),
        ("fingerprint", pa.string()),
        ("blob", pa.binary()),
        ("source", pa.string()),
        ("n_rows", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)


class DriverFoldOverflow(RuntimeError):
    """Raised when a driver-side fold sees more distinct keys than its
    bound; callers switch to the distributed (shuffle) reduction."""


def collect_partials(agg_src, exact: bool = False, batch_size=None,
                     example_queries: bool = True,
                     max_driver_classes: Optional[int] = 100_000):
    """ONE pass over the events: merged per-class partials + sink counts.

    batch_size=None on purpose: partials are computed per BLOCK as it
    streams by. Rebatching blocks to a fixed row count forces a buffering
    fence and block concatenation that measured ~2x slower end-to-end on
    the bench corpus; per-block partial blobs are tiny either way.

    The combined map_batches emits per-batch class partials AND per-batch
    (source, class_id) count partials; the tiny mixed rows are folded on the
    driver (classes x batches blobs + distinct-pair count rows - both far
    smaller than the event stream). For key spaces too large for a driver
    fold, use class_partials + class_stats_from_partials +
    grouped_counts(final="shuffle") instead - same partial machinery,
    distributed reduction.

    Raises DriverFoldOverflow once more than ``max_driver_classes``
    distinct classes accumulate (pass None to disable): the driver fold is
    only safe when class cardinality is modest (slow-log fingerprints:
    10^3-10^5); aggregate_events catches it and re-runs distributed.

    Returns ({class_id: (fingerprint, merged _ClassPartial)}, sink_counts_df).
    """
    import pandas as pd

    pfn = make_class_partials_fn(exact, example_queries)

    def _agg(batch: pa.Table) -> pa.Table:
        parts = pfn(batch)
        k = parts.num_rows
        cdf = (
            batch.select(["source", "class_id", "n_tok"])
            .to_pandas()
            .groupby(["source", "class_id"], as_index=False)
            .agg(n_rows=("n_tok", "size"), n_tokens=("n_tok", "sum"))
        )
        m = len(cdf)
        return pa.Table.from_arrays(
            [
                pa.array([0] * k + [1] * m, pa.int8()),
                pa.concat_arrays(
                    [parts["class_id"].combine_chunks(),
                     pa.array(cdf["class_id"], pa.string())]
                ),
                pa.concat_arrays(
                    [parts["fingerprint"].combine_chunks(),
                     pa.nulls(m, pa.string())]
                ),
                pa.concat_arrays(
                    [parts["blob"].combine_chunks(), pa.nulls(m, pa.binary())]
                ),
                pa.concat_arrays(
                    [pa.nulls(k, pa.string()), pa.array(cdf["source"], pa.string())]
                ),
                pa.concat_arrays(
                    [pa.nulls(k, pa.int64()),
                     pa.array(cdf["n_rows"].astype("int64"), pa.int64())]
                ),
                pa.concat_arrays(
                    [pa.nulls(k, pa.int64()),
                     pa.array(cdf["n_tokens"].astype("int64"), pa.int64())]
                ),
            ],
            schema=MIXED_SCHEMA,
        )

    by_class: Dict[str, list] = {}
    fps: Dict[str, str] = {}
    count_frames = []
    for b in agg_src.map_batches(
        _agg, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        kinds = b["kind"].to_numpy(zero_copy_only=False)
        cls_rows = b.filter(pa.array(kinds == 0))
        for cid, fp, blob in zip(
            cls_rows["class_id"].to_pylist(),
            cls_rows["fingerprint"].to_pylist(),
            cls_rows["blob"].to_pylist(),
        ):
            by_class.setdefault(cid, []).append(pickle.loads(blob))
            fps.setdefault(cid, fp)
        if max_driver_classes is not None and len(by_class) > max_driver_classes:
            raise DriverFoldOverflow(
                f"{len(by_class)} distinct classes exceed the driver-fold "
                f"bound ({max_driver_classes}); use the distributed path"
            )
        cnt_rows = b.filter(pa.array(kinds == 1))
        if cnt_rows.num_rows:
            count_frames.append(
                cnt_rows.select(["source", "class_id", "n_rows", "n_tokens"]).to_pandas()
            )

    if count_frames:
        counts = (
            pd.concat(count_frames, ignore_index=True)
            .groupby(["source", "class_id"], as_index=False)
            .sum()
        )
    else:
        counts = pd.DataFrame(columns=["source", "class_id", "n_rows", "n_tokens"])
    merged_by_class = {
        cid: (fps[cid], merge_partials(parts)) for cid, parts in by_class.items()
    }
    return merged_by_class, counts


def finalize_partials(merged_by_class: Dict, counts):
    """Merged per-class partials -> (class_stats_table, GlobalStats, counts)."""
    import pandas as pd

    cls_rows_out = []
    all_parts = []
    for cid, (fp, merged) in merged_by_class.items():
        all_parts.append(merged)
        cls_rows_out.append(_finalize_class(cid, fp, merged))
    cls_table = pa.Table.from_pylist(cls_rows_out, schema=CLASS_STATS_SCHEMA)

    if all_parts:
        g = merge_partials(all_parts)
        rate_type, rate_limit = "", 0
        if g.rate_pairs:
            rate_type, rate_limit = sorted(g.rate_pairs)[0]
        glob = GlobalStats(
            total_queries=g.count,
            unique_queries=len(merged_by_class),
            rate_type=rate_type,
            rate_limit=rate_limit,
            metrics=g.stats.current(),
            mixed_rate_limits=len(g.rate_pairs) > 1,
        )
    else:
        glob = GlobalStats(0, 0, "", 0, {}, False)
    return cls_table, glob, counts


def aggregate_events(agg_src, exact: bool = False, batch_size=None,
                     example_queries: bool = True,
                     max_driver_classes: Optional[int] = 100_000):
    """(class_stats_table, GlobalStats, sink_counts_df).

    ONE streaming pass with a driver fold while class cardinality stays
    under ``max_driver_classes``; past that the fold aborts mid-stream and
    the job re-runs through the distributed reduction (hash-bucketed class
    merge + shuffle counts) with bounded driver memory. The re-execution
    costs one extra source pass — only ever paid on corpora whose key
    space was never driver-foldable to begin with.
    """
    try:
        merged_by_class, counts = collect_partials(
            agg_src, exact, batch_size, example_queries, max_driver_classes
        )
    except DriverFoldOverflow:
        return _aggregate_events_distributed(agg_src, exact, example_queries)
    return finalize_partials(merged_by_class, counts)


def _aggregate_events_distributed(agg_src, exact: bool, example_queries: bool):
    """High-cardinality path: distributed class merge + shuffle counts.

    The partials Dataset is materialized once (object store, spillable)
    and feeds both the class-stats shuffle and the global fold; sink
    counts take their own shuffle pass over the source.
    """
    import ray

    parts_ds = class_partials(
        agg_src, exact, example_queries=example_queries
    ).materialize()
    cls_ds = class_stats_from_partials(parts_ds)
    refs = cls_ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    cls_table = (
        pa.concat_tables([t.select(CLASS_STATS_SCHEMA.names) for t in tables])
        if tables
        else pa.Table.from_pylist([], schema=CLASS_STATS_SCHEMA)
    )
    glob = global_stats_from_partials(parts_ds)
    glob.unique_queries = cls_table.num_rows
    counts = grouped_counts(
        agg_src, keys=["source", "class_id"], sum_col="n_tok", final="shuffle"
    ).to_pandas()
    return cls_table, glob, counts


def grouped_counts(
    ds,
    keys: List[str],
    sum_col: Optional[str] = "n_tok",
    final: str = "driver",
    max_driver_keys: Optional[int] = 200_000,
    fold_rows: int = 262_144,
):
    """Pre-aggregated grouped counts.

    Per-batch pandas combine first (each block reduces to its distinct key
    set), then:
      final="driver" (default): stream the tiny partial rows to the driver
        and fold INCREMENTALLY (re-grouping every ~256k buffered rows, so
        driver memory is bounded by the distinct-key count, not by
        blocks x keys) - no shuffle; right when the key cardinality is
        modest (sinks, sources, classes). If distinct keys exceed
        ``max_driver_keys`` the fold aborts mid-stream and the job
        transparently re-runs through the shuffle path (pass None to pin
        the driver fold).
      final="shuffle": ray groupby-sum over the partials - right when the
        key space itself is huge (e.g. grouping by doc_id).
    """
    import pandas as pd

    def _partial(batch: pa.Table) -> pa.Table:
        sel = keys + ([sum_col] if sum_col else [])
        df = batch.select(sel).to_pandas()
        if sum_col:
            g = df.groupby(keys, as_index=False, dropna=False).agg(
                n_rows=(sum_col, "size"), n_tokens=(sum_col, "sum")
            )
        else:
            g = (
                df.groupby(keys, as_index=False, dropna=False)
                .size()
                .rename(columns={"size": "n_rows"})
            )
        return pa.Table.from_pandas(g, preserve_index=False)

    def make_partials():
        return ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    if final == "driver":
        frames: List = []
        buffered = 0
        overflow = False

        def _fold() -> "pd.DataFrame":
            return (
                pd.concat(frames, ignore_index=True)
                .groupby(keys, as_index=False, dropna=False)
                .sum()
            )

        for b in make_partials().iter_batches(
            batch_size=None, batch_format="pandas"
        ):
            frames.append(b)
            buffered += len(b)
            if buffered >= fold_rows:
                frames = [_fold()]
                buffered = len(frames[0])
                if max_driver_keys is not None and buffered > max_driver_keys:
                    overflow = True
                    break  # stops the stream; fall through to shuffle
        if not overflow:
            if not frames:
                cols = keys + ["n_rows"] + (["n_tokens"] if sum_col else [])
                return pd.DataFrame(columns=cols)
            # the stream is fully consumed and buffered rows are bounded
            # (< fold threshold + folded keys): the final fold is already
            # the complete answer, so return it even above max_driver_keys
            # - re-running through the shuffle would pay a second source
            # pass only to rebuild the same DataFrame on the driver
            return _fold()

    from ray.data.aggregate import Sum

    aggs = [Sum("n_rows", alias_name="n_rows")]
    if sum_col:
        aggs.append(Sum("n_tokens", alias_name="n_tokens"))
    shuffled = make_partials().groupby(keys).aggregate(*aggs)
    if final == "driver":
        # overflow fallback: the REDUCTION ran distributed; the final
        # result (one row per distinct key) still lands as the DataFrame
        # this mode's callers expect
        return shuffled.to_pandas()
    return shuffled


def nearest_rank_by_key(
    ds,
    key: str,
    val: str,
    pcts: Dict[str, int],
    max_distinct_per_key: int = 5_000_000,
):
    """EXACT nearest-rank percentiles per key from a bounded histogram fold.

    Reproduces the reference's ``vals[(p*cnt)//100]`` convention
    (stats.go:124-129) without any task ever materializing a whole key's
    raw values: metric values at parse time come from a finite token set
    (float32-precision strings), so a per-(key, value) count histogram is
    an exact, lossless compression of the sorted array.

      1. map_batches partial: groupby (key, val) size per block
      2. ONE coarse shuffle on ``hash(key) % 64`` (a raw Ray groupby on
         the (key, value) composite costs seconds of fixed sort/actor
         overhead for the same answer — the measured bucket-collapse rule,
         same shape as ``interpolated_quantile_by_key`` below)
      3. per bucket: collapse partials to global (key, val) counts, then
         nearest-rank over each key's sorted cumulative histogram (every
         copy of a key lands in exactly one bucket)

    Per-task memory in step 3 is the bucket's PARTIAL-row count — at most
    #blocks x the bucket's distinct-pair count, event count never — and
    the collapsed histogram a key ranks over is its distinct-value count.
    ``max_distinct_per_key`` is the guard for pathological cardinality (a
    truly continuous metric, where the partial rows grow toward event
    count): the reducer fails fast with the remedy named instead of
    silently OOMing - switch that metric to ``gk_percentiles_by_key``
    (eps-approximate, O(1/eps) memory).

    Returns a Dataset of one row per key: (key, *pcts.keys()).
    """
    import numpy as np
    import pandas as pd

    n_parts = 64

    def _partial_tagged(b: pa.Table) -> pa.Table:
        from ..partition import stable_partition

        key_type = b.schema.field(key).type
        df = b.select([key, val]).to_pandas()
        g = df.groupby([key, val], as_index=False, dropna=False).size()
        g = g.rename(columns={"size": "n"})
        # restore the key's ARROW type before hashing AND shipping:
        # to_pandas promotes a null-bearing int block to float64, so (a)
        # hash_array(5) != hash_array(5.0) would split a key across
        # buckets depending on which block its rows shared with a null
        # (the stable_partition null-promotion rule), and (b) a float64
        # key column from one block vs int64 from the rest breaks Arrow
        # schema unification at the shuffle
        key_arr = pa.array(g[key], type=key_type, from_pandas=True)
        g["_part"] = stable_partition(key_arr, n_parts)
        t = pa.Table.from_pandas(g, preserve_index=False)
        return t.set_column(t.column_names.index(key), key, key_arr)

    def _rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # per-block partials for a (key, val) pair all carry the key's
        # bucket tag, so the in-bucket sum IS the global count
        h = g.groupby([key, val], as_index=False, dropna=False)["n"].sum()
        out = []
        for kv, gg in h.groupby(key, dropna=False, sort=True):
            if len(gg) > max_distinct_per_key:
                raise DriverFoldOverflow(
                    f"nearest_rank_by_key: key {kv!r} has "
                    f"{len(gg)} distinct {val!r} values "
                    f"(> {max_distinct_per_key}); this metric is effectively "
                    "continuous - use gk_percentiles_by_key for it"
                )
            gg = gg.sort_values(val)
            cum = gg["n"].cumsum().to_numpy()
            cnt = int(cum[-1])
            vals = gg[val].to_numpy()
            row = {key: [kv]}
            for name, p in pcts.items():
                # nearest-rank: value at 0-based index (p*cnt)//100 of the
                # conceptual sorted array == first value with cum > index
                row[name] = [vals[np.searchsorted(cum, (p * cnt) // 100 + 1)]]
            out.append(pd.DataFrame(row))
        if not out:
            # dtype-stable empty: key and pct columns take the incoming
            # frame's dtypes (an object/float64 hardcode breaks schema
            # unification for integer keys or integer metrics)
            empty = {key: g[key].head(0)}
            empty.update(
                {name: pd.Series([], dtype=g[val].dtype) for name in pcts}
            )
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)

    return (
        ds.map_batches(
            _partial_tagged, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("_part")
        .map_groups(_rank_bucket, batch_format="pandas")
    )


def interpolated_quantile_by_key(
    ds,
    key: str,
    val: str,
    qs: Dict[str, float],
    max_distinct_per_key: int = 5_000_000,
):
    """EXACT linear-interpolated quantiles per key (the type-7 /
    ``quantile_cont`` convention: h = (cnt-1)*q, result =
    v[floor(h)] + (h - floor(h)) * (v[floor(h)+1] - v[floor(h)]) over the
    conceptual sorted array) from the same bounded (key, value)-count
    histogram fold as ``nearest_rank_by_key`` — no task ever holds a key's
    raw values, only its distinct-value histogram. NULL values are dropped
    before the fold (SQL aggregate semantics). Results round to 6 decimals
    (both interpolation operand orders agree far below that grain).

    Returns a Dataset of one row per key: (key, *qs.keys())."""
    import numpy as np
    import pandas as pd

    def _partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[val]))
        df = b.select([key, val]).to_pandas()
        g = df.groupby([key, val], as_index=False, dropna=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    n_parts = 64

    def _partial_tagged(b: pa.Table) -> pa.Table:
        t = _partial(b)
        from ..partition import stable_pair_partition

        df = t.to_pandas()
        df["_part"] = stable_pair_partition(df[key], df[val], n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        # every copy of a (key, val) pair lands in this one bucket, so the
        # per-bucket sum IS the global count for the pair
        return g.groupby([key, val], as_index=False, dropna=False)["n"].sum()

    # collapse per-block partials to one row per distinct (key, value)
    # pair with ONE coarse shuffle on a 64-ary bucket tag — the
    # distinct_users_per_type shape; a Ray groupby on the raw
    # (string key, float value) pair costs seconds of sort/actor overhead
    # for the same result (measured 3.5 s -> ~0.5 s at sf0.1 / 32 CPUs)
    hist = (
        ds.map_batches(
            _partial_tagged, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("_part")
        .map_groups(_collapse, batch_format="pandas")
    )

    # finish on the driver: what streams back is distinct-cardinality
    # (guarded below), never event-cardinality
    parts = [
        b.to_pandas()
        for b in hist.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    import ray.data as rd

    if not parts:
        empty = {key: pd.Series([], dtype="object")}
        empty.update({name: pd.Series([], dtype="float64") for name in qs})
        return rd.from_pandas(pd.DataFrame(empty))
    h = pd.concat(parts, ignore_index=True)

    rows = []
    for kv, g in h.groupby(key, dropna=False, sort=True):
        if len(g) > max_distinct_per_key:
            raise DriverFoldOverflow(
                f"interpolated_quantile_by_key: key {kv!r} has "
                f"{len(g)} distinct {val!r} values "
                f"(> {max_distinct_per_key}); this metric is effectively "
                "continuous - use gk_percentiles_by_key for it"
            )
        g = g.sort_values(val)
        cum = g["n"].cumsum().to_numpy()
        cnt = int(cum[-1])
        vals = g[val].to_numpy()

        def at(i: int) -> float:
            return float(vals[np.searchsorted(cum, i + 1)])

        row = {key: kv}
        for name, q in qs.items():
            hq = (cnt - 1) * float(q)
            lo = int(np.floor(hq))
            hi = min(lo + 1, cnt - 1)
            v_lo = at(lo)
            row[name] = round(v_lo + (hq - lo) * (at(hi) - v_lo), 6)
        rows.append(row)
    return rd.from_pandas(pd.DataFrame(rows))


def gk_percentiles_by_key(
    ds,
    key: str,
    val: str,
    pcts: Dict[str, int],
    eps: float = 0.01,
):
    """eps-APPROXIMATE percentiles per key via mergeable GK sketches - the
    fallback for metrics whose distinct-value cardinality breaks the exact
    histogram fold (see nearest_rank_by_key). Per-task memory is O(1/eps)
    per key regardless of event or distinct-value counts.

    Shape: per-(block, key) GK partial blobs -> groupby(key) merge ->
    query. What shuffles is sketch blobs (KBs per key per block).
    """
    import numpy as np
    import pandas as pd

    from ..state.gk import GKSummary

    def _partial(b: pa.Table) -> pa.Table:
        df = b.select([key, val]).to_pandas()
        rows_k, rows_b = [], []
        for k, g in df.groupby(key, dropna=False):
            gk = GKSummary(eps)
            gk.add_many(g[val].to_numpy(dtype=np.float64))
            rows_k.append(k)
            rows_b.append(gk.to_bytes())
        return pa.table(
            {key: pa.array(rows_k), "blob": pa.array(rows_b, pa.binary())}
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        gk = GKSummary.merge_all(
            [GKSummary.from_bytes(b) for b in g["blob"]]
        )
        row = {key: [g[key].iloc[0]]}
        for name, p in pcts.items():
            row[name] = [gk.query(p / 100.0)]
        return pd.DataFrame(row)

    return (
        ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby(key)
        .map_groups(_merge, batch_format="pandas")
    )
