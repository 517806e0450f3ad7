"""Corpus curation: the composite filter -> dedup -> keep-list pipeline.

The canonical training-data preparation flow, expressed Ray-Data-first and
streaming end-to-end:

  documents
    -> map_batches(quality counters)           # vectorized (training/text.py)
    -> filter by quality thresholds            # predicate inside the batch fn
    -> exact-dedup survivors (hash groupby, keep min doc_id)
    -> optional near-dup pair removal          # drop the higher doc_id of
                                               # each near-dup pair
    -> keep-list (doc_id) or curated Parquet

Only (hash, doc_id) pairs shuffle; text moves once, at the final write.
Every rule is deterministic, so the keep-list is reproducible across runs
and cluster sizes - and SQL-expressible for the oracle (minus the
heuristic near-dup stage, which is off in the oracle-checked query).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from .text import quality_batch


def curate_keep_list(
    docs_ds,
    min_words: int = 10,
    max_punct_ratio: float = 0.2,
    near_dup_threshold: Optional[float] = None,
    keep_broadcast_limit: Optional[int] = 1_000_000,
    cluster_removal: bool = False,
):
    """Return a Dataset of surviving (doc_id) rows.

    Rules (deterministic, documented for the oracle):
      1. n_words >= min_words
      2. n_punct <= max_punct_ratio * n_words
      3. exact dedup on text: keep the smallest doc_id per distinct text
      4. (optional) near-dup removal at ``near_dup_threshold`` n-gram
         jaccard: the LARGER doc_id of each surviving pair is dropped.
         With ``cluster_removal=True`` the pair graph is first closed
         under transitive connectivity (graph.connected_components) and
         exactly ONE doc — the minimum id — survives per near-dup
         CLUSTER (pairs a-c, b-c then keep {a}, where the pairwise rule
         keeps {a, b}). Heuristic stage - excluded from the
         oracle-checked query.

    The near-dup branch is output-cardinality-sized: when the exact-dedup
    keep-list exceeds ``keep_broadcast_limit`` it is NOT collected/broadcast
    — survivors are selected by a hash semi-join against the keep Dataset
    and near-dup losers are removed with an anti-join, so nothing
    survivor-sized ever lands on the driver (set the limit to None to force
    the broadcast path).
    """
    from .dedup import exact_dedup, ngram_jaccard_pairs

    def _quality_filter(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        words = q["n_words"]
        keep = pc.and_(
            pc.greater_equal(words, min_words),
            pc.less_equal(
                pc.cast(q["n_punct"], pa.float64()),
                pc.multiply(pc.cast(words, pa.float64()), max_punct_ratio),
            ),
        )
        return batch.filter(keep)

    filtered = docs_ds.map_batches(
        _quality_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    keep = exact_dedup(filtered).select_columns(["keep_doc_id"])

    def _rename(b: pa.Table) -> pa.Table:
        if "keep_doc_id" not in b.column_names:
            # zero survivors: an all-empty groupby loses the schema
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return pa.table({"doc_id": pc.cast(b["keep_doc_id"], pa.int64())})

    import ray
    import ray.data as rd

    def _empty_keep():
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))

    if near_dup_threshold is None:
        # stays lazy; _rename emits the typed empty schema if the dedup
        # groupby produced a schema-less empty block (zero survivors)
        return keep.map_batches(_rename, batch_format="pyarrow")

    # numeric batch_size: bundling coalesces schema-less empty blocks the
    # dedup groupby can emit (map_batches passes untouched empties through,
    # and keep_ds feeds joins, which reject schema-less blocks)
    keep_ds = keep.map_batches(
        _rename, batch_format="pyarrow", batch_size=1 << 16
    ).materialize()
    n_keep = keep_ds.count()
    if n_keep == 0:
        return _empty_keep()
    if keep_broadcast_limit is not None and n_keep > keep_broadcast_limit:
        return _near_dup_removal_joined(
            docs_ds, keep_ds, near_dup_threshold, cluster_removal
        )

    # Near-dup removal among the exact-dedup survivors, broadcast mode
    # (keep-list within the explicit size bound). The keep-list is the
    # curated OUTPUT id set; ship it once via ray.put and resolve per
    # worker (broadcast_get), filter with the vectorized pc.is_in kernel.
    keep_ints = sorted(int(x) for x in keep_ds.to_pandas()["doc_id"])
    keep_ref = ray.put(pa.array(keep_ints, pa.int64()))

    from ..broadcast import broadcast_get

    def _survivors_only(b: pa.Table) -> pa.Table:
        keep_set = broadcast_get(keep_ref)
        mask = pc.is_in(pc.cast(b["doc_id"], pa.int64()), value_set=keep_set)
        return b.filter(mask)

    survivors = docs_ds.map_batches(
        _survivors_only, batch_format="pyarrow", zero_copy_batch=True
    )
    if cluster_removal:
        from .graph import connected_components

        pairs_ds = ngram_jaccard_pairs(
            survivors, threshold=near_dup_threshold, as_dataset=True
        )
        comps = connected_components(pairs_ds).to_pandas()
        if "node" in comps.columns and len(comps):
            drop = set(
                int(n)
                for n, r in zip(comps["node"], comps["cluster_rep"])
                if int(n) != int(r)
            )
        else:
            drop = set()
    else:
        pairs = ngram_jaccard_pairs(survivors, threshold=near_dup_threshold)
        drop = set(int(x) for x in pairs["doc_b"].tolist())
    final = sorted(set(keep_ints) - drop)

    # same contract as the fast path: a (doc_id:int64) Dataset
    return rd.from_arrow(pa.table({"doc_id": pa.array(final, pa.int64())}))


def _cast_id_int64(b: pa.Table) -> pa.Table:
    i = b.column_names.index("doc_id")
    return b.set_column(i, "doc_id", pc.cast(b["doc_id"], pa.int64()))


def _near_dup_removal_joined(
    docs_ds, keep_ds, threshold: float, cluster_removal: bool = False
):
    """Scale path for rule 4: survivor selection and loser removal as hash
    joins — the keep-list never leaves the cluster.

      docs  --left_semi join keep--> survivors     (text ships once, only
                                                    for exact-dedup winners)
      survivors -> ngram_jaccard_pairs(as_dataset) (pairs stay distributed)
      keep  --left_anti join pairs.doc_b--> final

    With ``cluster_removal`` the drop set is every non-representative of
    a connected component of the pair graph (graph.connected_components,
    itself distributed) instead of every pair's doc_b. Identical output
    set to the broadcast path (equality pinned in tests); row order is
    join-partition order rather than sorted.
    """
    import ray

    from .dedup import ngram_jaccard_pairs

    # joins reserve aggregator actors proportional to the partition count;
    # size to the session so they coexist with upstream map tasks
    n_parts = min(64, max(8, int(ray.cluster_resources().get("CPU", 8))))
    # numeric batch_size on join-feeding maps: bundles coalesce any
    # schema-less empty blocks before the join's hash partitioner sees them
    _coalesce = 1 << 16

    survivors = (
        docs_ds.select_columns(["doc_id", "text"])
        .map_batches(
            _cast_id_int64,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=_coalesce,
        )
        .join(keep_ds, "left_semi", num_partitions=n_parts, on=("doc_id",))
    )

    pairs_ds = ngram_jaccard_pairs(
        survivors, threshold=threshold, as_dataset=True
    )

    if cluster_removal:
        from .graph import connected_components

        comps = connected_components(pairs_ds)

        def _losers(b: pa.Table) -> pa.Table:
            if "node" not in b.column_names:
                return pa.table({"doc_id": pa.array([], pa.int64())})
            keep = pc.not_equal(b["node"], b["cluster_rep"])
            return pa.table(
                {"doc_id": pc.cast(b.filter(keep)["node"], pa.int64())}
            )

        drop = comps.map_batches(
            _losers, batch_format="pyarrow", batch_size=_coalesce
        ).materialize()
    else:

        def _drop_ids(b: pa.Table) -> pa.Table:
            if "doc_b" not in b.column_names:  # all-empty bundle (no near-dups)
                return pa.table({"doc_id": pa.array([], pa.int64())})
            return pa.table({"doc_id": pc.cast(b["doc_b"], pa.int64())})

        drop = pairs_ds.map_batches(
            _drop_ids, batch_format="pyarrow", batch_size=_coalesce
        ).materialize()
    if drop.count() == 0:
        # zero pairs means every block is a schema-less empty the bundler
        # never touches (no rows to coalesce) — and the anti-join is a
        # no-op anyway
        return keep_ds
    return keep_ds.join(drop, "left_anti", num_partitions=n_parts, on=("doc_id",))


def write_curated(
    docs_ds,
    out_dir: str,
    keep_ids_ds,
    partition_col: str = "source",
    keep_broadcast_limit: Optional[int] = 1_000_000,
):
    """Write surviving docs as partitioned Parquet (resumable layout).

    Past ``keep_broadcast_limit`` survivors the selection is a hash
    semi-join against the keep Dataset instead of a driver-collected
    broadcast filter.
    """
    import ray

    from ..broadcast import broadcast_get

    ids = keep_ids_ds
    if keep_broadcast_limit is not None and hasattr(ids, "count"):
        if ids.count() > keep_broadcast_limit:
            n_parts = min(64, max(8, int(ray.cluster_resources().get("CPU", 8))))

            def _id_schema(b: pa.Table) -> pa.Table:
                # joins reject schema-less empty blocks (e.g. an upstream
                # anti-join's empty partitions); coalesce + retype them
                if "doc_id" not in b.column_names:
                    return pa.table({"doc_id": pa.array([], pa.int64())})
                return pa.table({"doc_id": pc.cast(b["doc_id"], pa.int64())})

            ids_j = ids.map_batches(
                _id_schema, batch_format="pyarrow", batch_size=1 << 16
            ).materialize()  # consumed twice: bloom build + exact join
            # bloom-join: docs failing a broadcast bloom of the keep-ids
            # are proven non-survivors and drop BEFORE the shuffle — their
            # text never moves; the exact semi-join still runs on every
            # maybe-row, so output is identical (state/bloom.py)
            from ..state.bloom import bloom_prefilter

            docs_j = bloom_prefilter(
                docs_ds.map_batches(
                    _cast_id_int64,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=1 << 16,
                ),
                ids_j,
            )
            docs_j.join(
                ids_j, "left_semi", num_partitions=n_parts, on=("doc_id",)
            ).write_parquet(out_dir, partition_cols=[partition_col])
            return
    if hasattr(ids, "to_pandas"):
        ids = ids.to_pandas()
    if "doc_id" not in getattr(ids, "columns", []) or len(ids) == 0:
        return  # zero survivors: nothing to write
    keep_ref = ray.put(
        pa.array(sorted(int(x) for x in ids["doc_id"]), pa.int64())
    )

    def _keep_only(b: pa.Table) -> pa.Table:
        keep_set = broadcast_get(keep_ref)
        mask = pc.is_in(pc.cast(b["doc_id"], pa.int64()), value_set=keep_set)
        return b.filter(mask)

    docs_ds.map_batches(
        _keep_only, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out_dir, partition_cols=[partition_col])
