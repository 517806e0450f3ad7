"""Checkpointed flagship: shard-level resume with per-partition lineage.

Each shard (group of input files) runs the full parse -> enrich ->
write-through-route -> partial-aggregate pipeline; its routed output, its
merged per-class stat partials, and its sink counts are persisted UNDER THE
SHARD DIRECTORY, and a lineage manifest commits the shard atomically
(state/checkpoint.py). A killed run resumes by skipping committed shards;
final class/global stats are assembled by merging the persisted per-shard
partials - aggregation is exactly-once across resumes, not recomputed.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from ..options import Options
from ..sources.synth import dim_for_sources
from ..state.checkpoint import read_manifests, run_resumable
from ..stages.aggregate import (
    PARTIAL_SCHEMA,
    collect_partials,
    finalize_partials,
    merge_partials,
)
from ..stages.enrich import enrich_events
from ..stages.parse import parse_events
from ..stages.route import make_write_through_fn
from .flagship import AGG_COLUMNS, FlagshipResult


def _process_shard_factory(dim, opt: Options, exact: bool, min_parallelism: int):
    def process_shard(files: List[str], shard_out: str) -> Dict:
        import ray.data as rd

        os.makedirs(shard_out, exist_ok=True)
        kwargs = {}
        if len(files) < min_parallelism:
            kwargs["override_num_blocks"] = min_parallelism
        ds = rd.read_parquet(files, **kwargs)
        events = parse_events(ds, opt=opt, include_tokens=True)
        enriched = enrich_events(events, dim)
        agg_src = enriched.map_batches(
            make_write_through_fn(
                os.path.join(shard_out, "routed"), keep_columns=AGG_COLUMNS
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        # Per-SHARD class cardinality bounds this fold (a shard is a few
        # files); collect_partials raises DriverFoldOverflow loudly past
        # 1e5 classes rather than exhausting driver memory - a corpus that
        # trips it needs the checkpoint blobs re-keyed by class bucket,
        # not a bigger driver.
        merged_by_class, counts = collect_partials(agg_src, exact=exact)

        # Persist the shard's mergeable aggregation state.
        pq.write_table(
            pa.Table.from_arrays(
                [
                    pa.array(list(merged_by_class.keys()), pa.string()),
                    pa.array([v[0] for v in merged_by_class.values()], pa.string()),
                    pa.array(
                        [pickle.dumps(v[1], protocol=4) for v in merged_by_class.values()],
                        pa.binary(),
                    ),
                ],
                schema=PARTIAL_SCHEMA,
            ),
            os.path.join(shard_out, "_class_partials.parquet"),
        )
        pq.write_table(
            pa.Table.from_pandas(counts, preserve_index=False),
            os.path.join(shard_out, "_sink_counts.parquet"),
        )
        return {
            # additive across shards (summed by run_resumable's fold)
            "events": int(counts["n_rows"].sum()) if len(counts) else 0,
            "tokens": int(counts["n_tokens"].sum()) if len(counts) else 0,
            # shard_-prefixed = per-shard detail, NOT additive (distinct
            # classes/sink-groups overlap between shards); excluded from
            # the merged fold
            "shard_classes": len(merged_by_class),
            "shard_sink_groups": len(counts),
        }

    return process_shard


def assemble_results(out_dir: str) -> FlagshipResult:
    """Merge all committed shards' persisted partials into final results."""
    import pandas as pd

    by_class: Dict[str, list] = {}
    fps: Dict[str, str] = {}
    count_frames = []
    for shard_id in sorted(read_manifests(out_dir)):
        shard_out = os.path.join(out_dir, shard_id)
        t = pq.read_table(os.path.join(shard_out, "_class_partials.parquet"))
        for cid, fp, blob in zip(
            t["class_id"].to_pylist(), t["fingerprint"].to_pylist(),
            t["blob"].to_pylist(),
        ):
            by_class.setdefault(cid, []).append(pickle.loads(blob))
            fps.setdefault(cid, fp)
        count_frames.append(
            pq.read_table(os.path.join(shard_out, "_sink_counts.parquet")).to_pandas()
        )
    merged = {cid: (fps[cid], merge_partials(ps)) for cid, ps in by_class.items()}
    counts = (
        pd.concat(count_frames, ignore_index=True)
        .groupby(["source", "class_id"], as_index=False)
        .sum()
        if count_frames
        else pd.DataFrame(columns=["source", "class_id", "n_rows", "n_tokens"])
    )
    cls_table, glob, counts = finalize_partials(merged, counts)
    return FlagshipResult(
        class_stats=cls_table,
        global_stats=glob,
        sink_counts=pa.Table.from_pandas(counts, preserve_index=False),
        routed_dir=out_dir,
    )


def run_flagship_resumable(
    input_dir: str,
    out_dir: str,
    dim: Optional[pa.Table] = None,
    opt: Options = Options(),
    exact: bool = False,
    files_per_shard: int = 8,
    fail_after_shards: Optional[int] = None,
) -> FlagshipResult:
    """Checkpointed flagship over a directory of sequence Parquet files."""
    import ray
    import ray.data as rd

    if dim is None:
        srcs = rd.read_parquet(input_dir, columns=["source"]).unique("source")
        dim = dim_for_sources(srcs)
    min_par = int(ray.cluster_resources().get("CPU", 8)) * 4
    run_resumable(
        input_dir,
        out_dir,
        _process_shard_factory(dim, opt, exact, min_par),
        files_per_shard=files_per_shard,
        fail_after_shards=fail_after_shards,
    )
    return assemble_results(out_dir)
