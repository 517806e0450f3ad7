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
):
    """Return a Dataset of surviving (doc_id) rows.

    Rules (deterministic, documented for the oracle):
      1. n_words >= min_words
      2. n_punct <= max_punct_ratio * n_words
      3. exact dedup on text: keep the smallest doc_id per distinct text
      4. (optional) near-dup removal at ``near_dup_threshold`` n-gram
         jaccard: the LARGER doc_id of each surviving pair is dropped.
         Heuristic stage - excluded from the oracle-checked query.
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

    # Near-dup removal among the exact-dedup survivors. The keep-list is
    # the curated OUTPUT id set; ship it once via ray.put and resolve per
    # worker (broadcast_get), filter with the vectorized pc.is_in kernel.
    keep_df = keep.to_pandas()
    if "keep_doc_id" not in keep_df.columns or keep_df.empty:
        return _empty_keep()
    keep_ints = sorted(int(x) for x in keep_df["keep_doc_id"])
    keep_ref = ray.put(pa.array(keep_ints, pa.int64()))

    from ..broadcast import broadcast_get

    def _survivors_only(b: pa.Table) -> pa.Table:
        keep_set = broadcast_get(keep_ref)
        mask = pc.is_in(pc.cast(b["doc_id"], pa.int64()), value_set=keep_set)
        return b.filter(mask)

    survivors = docs_ds.map_batches(
        _survivors_only, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = ngram_jaccard_pairs(survivors, threshold=near_dup_threshold)
    drop = set(int(x) for x in pairs["doc_b"].tolist())
    final = sorted(set(keep_ints) - drop)

    # same contract as the fast path: a (doc_id:int64) Dataset
    return rd.from_arrow(pa.table({"doc_id": pa.array(final, pa.int64())}))


def write_curated(
    docs_ds,
    out_dir: str,
    keep_ids_ds,
    partition_col: str = "source",
):
    """Write surviving docs as partitioned Parquet (resumable layout)."""
    import ray

    from ..broadcast import broadcast_get

    ids = keep_ids_ds
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
