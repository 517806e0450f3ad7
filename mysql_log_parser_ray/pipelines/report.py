"""Driver-side run report: the reference CLI's output surface.

Reproduces what bin/parser-cli.go:118-155 prints after a run — totals and
events/sec, the GK quantile table at 5% steps (``QueryRank``), the exact
nearest-rank 95pct/median, sketch size, the 20-bucket histogram
(``Histo(20)``), and the hot-class drill-down (classes with more than
total/10 events, parser-cli.go:139) — from the merged per-class partials of
the distributed aggregation instead of a shared in-process map.

The report is a driver-side reduction over the tiny partials Dataset (one
row per (input batch, class)); no event-level data ever reaches the driver.
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional, Tuple

from ..functions.stats import MetricStats
from ..stages.aggregate import _ClassPartial, class_partials, merge_partials

QUANTILE_STEPS = [round(i * 0.05, 2) for i in range(21)]  # 0.00 .. 1.00


def collect_partials(
    events_ds, exact: bool = False
) -> Tuple[Optional[_ClassPartial], Dict[str, Tuple[str, _ClassPartial]]]:
    """Merge the partials Dataset into (global, {class_id: (fp, partial)}).

    The partials rows are batch-level accumulator blobs (bounded by
    #blocks x #classes), so the driver loop is over partials, never events.
    """
    per_class: Dict[str, list] = {}
    fps: Dict[str, str] = {}
    for batch in class_partials(events_ds, exact=exact).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        for cid, fp, blob in zip(
            batch["class_id"].to_pylist(),
            batch["fingerprint"].to_pylist(),
            batch["blob"].to_pylist(),
        ):
            per_class.setdefault(cid, []).append(blob)
            fps[cid] = fp
    # canonical merge order: blocks arrive in task-completion order (varies
    # run to run), and GK merge is order-sensitive in its tie-breaking —
    # sorting each class's partial BLOBS bytewise (and the classes by id)
    # makes the merged sketch a pure function of the partial multiset, so
    # report values are run-invariant and pinnable
    merged = {
        cid: (fps[cid], merge_partials([pickle.loads(b) for b in sorted(parts)]))
        for cid, parts in sorted(per_class.items())
    }
    glob = merge_partials([p for _, p in merged.values()]) if merged else None
    return glob, merged


def _quantile_rank(s: MetricStats, phi: float) -> Tuple[float, int, int]:
    """GKq.QueryRank(phi) in sketch mode; exact nearest-rank otherwise."""
    if s.gk is not None:
        return s.gk.query_rank(phi)
    vals = sorted(s.vals or [])
    if not vals:
        return 0.0, 0, 0
    # integer arithmetic like the reference's (95*Cnt)//100 nearest-rank
    # convention (stats.go:124-129): int(phi*n) in floats undershoots for
    # e.g. phi=0.70, n=90 (0.7*90 == 62.999... in IEEE754)
    idx = min((round(phi * 100) * len(vals)) // 100, len(vals) - 1)
    return float(vals[idx]), idx + 1, idx + 1


def _metric_report(s: MetricStats, lines: list, indent: str = "") -> None:
    for phi in QUANTILE_STEPS:
        val, rmin, rmax = _quantile_rank(s, phi)
        lines.append(f"{indent}{phi:.6f} pct query time : {val:f}, ({rmin}-{rmax})")
    cur = s.current()
    lines.append(
        f"{indent}Real 95pct {cur.get('pct95', 0.0):f}, med: {cur.get('med', 0.0):f}"
    )
    lines.append(f"{indent}GK length: {len(s.gk) if s.gk is not None else s.cnt}")
    if s.gk is not None:
        for lo, hi, cnt in s.gk.histo(20):
            lines.append(f"{indent}histo [{lo:f} - {hi:f}): {cnt}")


def format_report(
    glob: Optional[_ClassPartial],
    classes: Dict[str, Tuple[str, _ClassPartial]],
    elapsed_sec: float,
    metric: str = "Query_time",
) -> str:
    """parser-cli-parity text report."""
    lines: list = []
    total = glob.count if glob else 0
    rate = total / elapsed_sec if elapsed_sec > 0 else 0.0
    lines.append(f"Events: {total}, time: {elapsed_sec:f} sec, rate: {rate:f}")
    if glob is not None and metric in glob.stats.time:
        _metric_report(glob.stats.time[metric], lines)
    # Hot classes: TotalQueries > total/10 (parser-cli.go:139).
    for cid in sorted(classes):
        fp, p = classes[cid]
        if p.count > total // 10:
            lines.append(f"Query ID {cid}, Events: {p.count}")
            if metric in p.stats.time:
                _metric_report(p.stats.time[metric], lines, indent="  ")
    return "\n".join(lines)
