"""Command-line entry point — the engine's ``ray job submit`` surface.

The reference ships ``bin/parser-cli`` (parser-cli.go:118-155): parse one
slow-log file, print totals + the GK quantile/histogram report. This CLI is
the cluster equivalent over tokenized-sequence Parquet:

    # local
    python -m mysql_log_parser_ray run /data/sequences --routed-dir /out
    python -m mysql_log_parser_ray report /data/sequences
    python -m mysql_log_parser_ray synth /tmp/corpus --docs 1000000

    # on a Ray cluster (the driver-less production path)
    ray job submit --working-dir . -- \
        python -m mysql_log_parser_ray run s3://bucket/sequences \
            --routed-dir s3://bucket/routed

Only this module owns a Ray session (guarded init; the library never calls
ray.init, per the driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray(num_cpus: int | None) -> bool:
    """Init Ray if nobody has; returns True iff this call owned the init
    (so main() only shuts down a session it started)."""
    import ray

    owned = not ray.is_initialized()
    if owned:
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus is not None:
            kwargs.update(address="local", num_cpus=num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return owned


def _cmd_run(args: argparse.Namespace) -> int:
    from .pipelines.flagship import run_flagship

    t0 = time.perf_counter()
    if args.resume_dir:
        from .pipelines.resumable import run_flagship_resumable

        res = run_flagship_resumable(
            args.input, args.resume_dir, exact=args.exact,
            files_per_shard=args.files_per_shard,
        )
    else:
        res = run_flagship(
            args.input, routed_dir=args.routed_dir, exact=args.exact
        )
    elapsed = time.perf_counter() - t0
    total = int(res.global_stats.total_queries)
    out = {
        "events": total,
        "unique_classes": int(res.global_stats.unique_queries),
        "time_sec": round(elapsed, 3),
        "events_per_sec": round(total / elapsed, 1) if elapsed else 0.0,
        "sinks": res.sink_counts.num_rows,
        "routed_dir": res.routed_dir,
        "mixed_rate_limits": bool(res.global_stats.mixed_rate_limits),
    }
    if args.json:
        print(json.dumps(out))
    else:
        print(
            f"Events: {out['events']}, time: {out['time_sec']:f} sec, "
            f"rate: {out['events_per_sec']:f}"
        )
        print(
            f"Classes: {out['unique_classes']}, sinks: {out['sinks']}, "
            f"routed: {out['routed_dir'] or '-'}"
        )
    return 0


def _cmd_report(args: argparse.Namespace) -> int:
    from .pipelines.flagship import run_flagship  # noqa: F401 (shared deps)
    from .pipelines.report import collect_partials, format_report
    from .sources.sequences import read_log_files, read_sequences
    from .stages.parse import parse_events

    t0 = time.perf_counter()
    seqs = (
        read_log_files(args.input)
        if getattr(args, "raw_logs", False)
        else read_sequences(args.input)
    )
    events = parse_events(seqs, fmt=args.fmt)
    glob, classes = collect_partials(events, exact=args.exact)
    elapsed = time.perf_counter() - t0
    print(format_report(glob, classes, elapsed, metric=args.metric))
    return 0


def _cmd_dump(args: argparse.Namespace) -> int:
    """Parse -> emit events as JSONL (the reference test harness's event
    dump, test/test.go:196-199): the first tool for debugging a log."""
    from .options import Options
    from .sources.sequences import read_log_files, read_sequences
    from .stages.parse import parse_events

    opt = Options(debug=args.debug)
    seqs = (
        read_log_files(args.input)
        if getattr(args, "raw_logs", False)
        else read_sequences(args.input)
    )
    events = parse_events(seqs, fmt=args.fmt, opt=opt)
    if args.limit:
        events = events.limit(args.limit)
    sink = open(args.out, "w") if args.out else sys.stdout
    n = 0
    try:
        for b in events.iter_batches(batch_size=4096, batch_format="pyarrow"):
            for row in b.to_pylist():
                for m in ("time_metrics", "number_metrics", "bool_metrics"):
                    row[m] = dict(row[m] or ())
                sink.write(json.dumps(row, separators=(",", ":")) + "\n")
                n += 1
    finally:
        if args.out:
            sink.close()
            print(json.dumps({"events": n, "out": args.out}))
    return 0


def _cmd_synth(args: argparse.Namespace) -> int:
    from .sources.synth import generate_corpus

    generate_corpus(
        args.docs, seed=args.seed, n_sources=args.sources, out_path=args.out
    )
    print(json.dumps({"out": args.out, "docs": args.docs}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="mysql_log_parser_ray",
        description="Ray-Data-native slow-log pipeline (see module docstring "
        "for ray job submit usage)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="full parse->enrich->route->aggregate")
    p_run.add_argument("input", help="sequences Parquet file/dir")
    p_run.add_argument("--routed-dir", default=None, help="fan-out sink dir")
    p_run.add_argument(
        "--resume-dir",
        default=None,
        help="checkpointed output dir: shard-level lineage manifests; "
        "re-running skips committed shards (resumable mode)",
    )
    p_run.add_argument("--files-per-shard", type=int, default=8)
    p_run.add_argument("--exact", action="store_true", help="exact percentiles")
    p_run.add_argument("--num-cpus", type=int, default=None)
    p_run.add_argument("--json", action="store_true")
    p_run.set_defaults(fn=_cmd_run)

    p_rep = sub.add_parser("report", help="parser-cli-style quantile report")
    p_rep.add_argument("input", help="sequences Parquet file/dir")
    p_rep.add_argument(
        "--raw-logs", action="store_true",
        help="input is raw log file(s) (.log / .log.gz), not Parquet",
    )
    p_rep.add_argument("--exact", action="store_true")
    p_rep.add_argument("--metric", default="Query_time")
    p_rep.add_argument(
        "--fmt", default="slowlog", help="registered log format (slowlog|genlog)"
    )
    p_rep.add_argument("--num-cpus", type=int, default=None)
    p_rep.set_defaults(fn=_cmd_report)

    p_dmp = sub.add_parser("dump", help="parse and emit events as JSONL")
    p_dmp.add_argument("input", help="sequences Parquet file/dir")
    p_dmp.add_argument(
        "--raw-logs", action="store_true",
        help="input is raw log file(s) (.log / .log.gz), not Parquet",
    )
    p_dmp.add_argument(
        "--fmt", default="slowlog",
        help="registered log format (slowlog|genlog|jsonlog)",
    )
    p_dmp.add_argument("--limit", type=int, default=0, help="0 = all events")
    p_dmp.add_argument("--out", default=None, help="JSONL path (default stdout)")
    p_dmp.add_argument(
        "--debug", action="store_true",
        help="Options.Debug: per-line parser state traces (worker stdout)",
    )
    p_dmp.add_argument("--num-cpus", type=int, default=None)
    p_dmp.set_defaults(fn=_cmd_dump)

    p_syn = sub.add_parser("synth", help="generate a deterministic corpus")
    p_syn.add_argument("out")
    p_syn.add_argument("--docs", type=int, required=True)
    p_syn.add_argument("--sources", type=int, default=64)
    p_syn.add_argument("--seed", type=int, default=42)
    p_syn.add_argument("--num-cpus", type=int, default=None)
    p_syn.set_defaults(fn=_cmd_synth)

    args = ap.parse_args(argv)
    owned = _ensure_ray(getattr(args, "num_cpus", None))
    rc = args.fn(args)

    if owned:
        import ray

        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
