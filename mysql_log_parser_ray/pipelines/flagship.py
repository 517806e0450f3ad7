"""The flagship pipeline: read -> parse -> enrich -> route -> aggregate.

Logical DAG (same shape as the reference's ParseSlowLog wiring,
bin/parser-cli.go:43-116, re-expressed Ray-Data-first; SURVEY.md §3.1):

  read_parquet(sequences)                         # row groups = shards
    -> map_batches(parse+fingerprint)             # stateless tasks, Arrow
    -> map_batches(Enrich, actor pool)            # broadcast dim lookup
    -> write_parquet(partition_cols=[sink])       # routed fan-out sink
    \\-> per-(batch,class) partials -> groupby(class_id) merge   # class stats
    \\-> batch partials -> tiny driver merge                     # global stats
    \\-> pre-aggregated groupby(source, class_id) counts         # sink counts

When ``routed_dir`` is set, the routed write runs FIRST and the aggregates
are computed by re-reading the routed Parquet with column pruning - one
parse of the raw tokens, aggregation reads only the thin columns it needs.
Without a routed dir (small/test runs) each consumer re-executes the lazy
parse, which is fine at test scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import pyarrow as pa

from ..options import Options
from ..sources.sequences import read_sequences
from ..sources.synth import dim_for_sources
from ..stages.aggregate import GlobalStats, class_stats, global_stats, grouped_counts
from ..stages.enrich import enrich_events
from ..stages.parse import parse_events
from ..stages.route import read_routed, route_and_write

AGG_COLUMNS = [
    "doc_id",
    "source",
    "n_tok",
    "class_id",
    "fingerprint",
    "query",
    "ts",
    "rate_type",
    "rate_limit",
    "time_metrics",
    "number_metrics",
    "bool_metrics",
]


@dataclass
class FlagshipResult:
    class_stats: "pa.Table"
    global_stats: GlobalStats
    sink_counts: "pa.Table"
    routed_dir: Optional[str] = None


def run_flagship(
    seq_path_or_ds,
    dim: Optional[pa.Table] = None,
    routed_dir: Optional[str] = None,
    opt: Options = Options(),
    exact: bool = False,
    include_tokens_in_routed: bool = True,
    parse_batch_size=None,
    min_parallelism: Optional[int] = None,
) -> FlagshipResult:
    """Run the full pipeline; returns small materialized aggregate tables.

    With a ``routed_dir``, the token payload is parsed ONCE (pass 1 writes
    the routed output) and the aggregations re-read the routed Parquet with
    column pruning. The per-(batch, class) partials Dataset is materialized
    once (it is tiny) and shared by the class-stats groupby and the global
    tree reduction.
    """
    import ray
    import ray.data as rd

    from ..stages.aggregate import aggregate_events

    # Guard against an under-partitioned input: the parse stage parallelizes
    # across blocks, so ensure at least ~2 read tasks per CPU. A real 100TB
    # corpus has thousands of files/row groups and never takes these
    # branches (override_num_blocks would then LIMIT parallelism, so it is
    # only applied when the file count is small).
    if min_parallelism is None:
        # ~4 blocks per CPU: enough task waves that stragglers and wave
        # quantization don't idle cores (48 tasks on 32 CPUs = 1.5 waves).
        min_parallelism = int(ray.cluster_resources().get("CPU", 8)) * 4
    if isinstance(seq_path_or_ds, rd.Dataset):
        # Dataset inputs are the test-scale path; pass a file path at scale.
        ds = seq_path_or_ds.repartition(min_parallelism)
    else:
        import glob as _glob
        import os as _os

        path = seq_path_or_ds
        n_files = (
            len(_glob.glob(_os.path.join(path, "*.parquet")))
            if isinstance(path, str) and _os.path.isdir(path)
            else 1
        )
        kwargs = {}
        if n_files < min_parallelism:
            kwargs["override_num_blocks"] = min_parallelism
        ds = read_sequences(path, **kwargs)

    if dim is None:
        # Derive the dim table from the distinct sources (small side).
        dim = dim_for_sources(ds.unique("source"))

    events = parse_events(
        ds, opt=opt, include_tokens=include_tokens_in_routed and routed_dir is not None,
        batch_size=parse_batch_size,
    )
    enriched = enrich_events(events, dim)

    if routed_dir is not None:
        # Write-through: routed files are written inside the flow, so the
        # write AND all aggregates happen in one streaming execution.
        from ..stages.route import make_write_through_fn

        agg_src = enriched.map_batches(
            make_write_through_fn(routed_dir, keep_columns=AGG_COLUMNS),
            batch_format="pyarrow",
            batch_size=None,
        )
    else:
        agg_src = enriched

    cls_table, glob, counts_table = aggregate_events(
        agg_src, exact=exact, example_queries=opt.example_queries
    )

    return FlagshipResult(
        class_stats=cls_table,
        global_stats=glob,
        sink_counts=pa.Table.from_pandas(counts_table, preserve_index=False),
        routed_dir=routed_dir,
    )
