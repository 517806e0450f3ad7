"""As-of (point-in-time) join: each fact row joins the LATEST dimension
version at or before its event time.

Ray Data has no asof join; the reference has no joins at all (SURVEY.md
§2.5). This is the broadcast implementation: the versioned dim table is
``ray.put`` once (sorted by the time key, as ``pandas.merge_asof``
requires), every task resolves it once per worker process, and each batch
runs one C-implemented ``merge_asof``. No shuffle - right whenever the dim
side fits in memory (the common case for config/metadata history).

``asof_join_partitioned`` is the big-dim variant: hash-partition BOTH
sides by the ``by`` key (tagged-union shuffle - the standard way to
express a join in a groupby-only engine), sort each co-partition by time,
same merge_asof per co-partition. One all-to-all over each side; use it
when the dim history outgrows broadcast. Partitioning assumption: all
versions of one ``by`` key and all facts for it land in the same
partition (guaranteed by the hash), and the largest single partition
fits a worker.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..broadcast import broadcast_get as _resolve


def asof_join_broadcast(
    facts_ds,
    dim: pd.DataFrame,
    on: str,
    by: Optional[str] = None,
    dim_on: Optional[str] = None,
    columns: Optional[List[str]] = None,
):
    """Left as-of join facts->dim (backward: latest dim row with
    ``dim_on <= on`` per ``by`` group). Facts with no matching version get
    nulls, like merge_asof."""
    import ray

    dim_on = dim_on or on
    dim_sorted = dim.sort_values(dim_on).reset_index(drop=True)
    ref = ray.put(dim_sorted)

    def _join(batch: pa.Table) -> pa.Table:
        d = _resolve(ref)
        df = batch.to_pandas()
        # null key / null event time rows match nothing; split them out so
        # the int->float null promotion can't poison the merge key dtype
        # (merge_asof raises on mismatched 'by' dtypes) and restore the
        # survivors' dtype
        null_rows = df[on].isna()
        if by is not None:
            null_rows |= df[by].isna()
        df_null = df.loc[null_rows]
        df = df.loc[~null_rows]
        if by is not None and df[by].dtype != d[by].dtype:
            try:
                df[by] = df[by].astype(d[by].dtype)
            except (ValueError, TypeError):
                pass
        df = df.sort_values(on, kind="mergesort")
        out = pd.merge_asof(
            df,
            d,
            left_on=on,
            right_on=dim_on,
            by=by,
            direction="backward",
        )
        if len(df_null):
            out = pd.concat(
                [out, df_null.reindex(columns=out.columns)], ignore_index=True
            )
        if columns is not None:
            out = out[columns]
        return pa.Table.from_pandas(out, preserve_index=False)

    return facts_ds.map_batches(_join, batch_format="pyarrow", zero_copy_batch=True)


def asof_join_partitioned(
    facts_ds,
    dim_ds,
    on: str,
    by: str,
    dim_on: Optional[str] = None,
    columns: Optional[List[str]] = None,
    n_parts: int = 64,
):
    """Big-dim as-of join: co-partition facts and dim on ``by``, then run
    ``merge_asof`` inside each partition. Matches asof_join_broadcast's
    output (modulo row order) without ever materializing the dim table in
    one place.

    Mechanics: both datasets are tagged (``_side``) and null-padded to a
    common schema, hash-bucketed on ``by`` into ``n_parts`` coarse
    partitions, and unioned - ONE shuffle moves both sides. Each group
    callback splits by side, restores each side's own columns, sorts by
    its time key and merges. No per-key dispatch: a partition holds many
    keys and merge_asof(by=...) handles them in one C call.
    """
    dim_on = dim_on or on

    def _arrow_type(t) -> pa.DataType:
        # ray Schema.types are arrow for arrow blocks but numpy/python for
        # pandas blocks (from_pandas etc.) - normalize
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()  # pandas object columns: strings

    fact_schema = facts_ds.schema()
    dim_schema = dim_ds.schema()
    fact_cols = list(fact_schema.names)
    dim_cols = list(dim_schema.names)
    fact_types = {
        n: _arrow_type(t) for n, t in zip(fact_schema.names, fact_schema.types)
    }
    dim_types = {
        n: _arrow_type(t) for n, t in zip(dim_schema.names, dim_schema.types)
    }
    for name in set(fact_cols) & set(dim_cols):
        if fact_types[name] != dim_types[name]:
            raise TypeError(
                f"shared column {name!r} differs: {fact_types[name]} vs "
                f"{dim_types[name]} (cast one side first)"
            )
    merged: List[tuple] = [(n, fact_types[n]) for n in fact_cols]
    merged += [(n, dim_types[n]) for n in dim_cols if n not in fact_types]
    ordered = [n for n, _ in merged]

    from ..partition import stable_partition

    def _tagger(side: int):
        def _tag(batch: pa.Table) -> pa.Table:
            # dtype/null-stable: a null in the batch must not change how
            # the other keys hash (int->float promotion would split a key
            # across partitions and silently null out its joins)
            part = stable_partition(batch[by], n_parts)
            n = batch.num_rows
            cols = {}
            for name, typ in merged:
                cols[name] = (
                    batch[name] if name in batch.column_names
                    else pa.nulls(n, typ)
                )
            cols["_part"] = pa.array(part, pa.int64())
            cols["_side"] = pa.array(np.full(n, side, np.int8), pa.int8())
            return pa.table(cols)

        return _tag

    tagged = facts_ds.map_batches(
        _tagger(1), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        dim_ds.map_batches(_tagger(0), batch_format="pyarrow", zero_copy_batch=True)
    )

    def _restore_dtypes(df: pd.DataFrame, types: dict) -> pd.DataFrame:
        # null-padding the OTHER side demotes this side's ints/bools to
        # float/object in the unioned block; values are non-null within
        # the proper side, so cast back to the arrow-declared dtype
        for name, typ in types.items():
            if name not in df.columns:
                continue
            try:
                want = np.dtype(typ.to_pandas_dtype())
            except (NotImplementedError, TypeError):
                continue
            if df[name].dtype != want:
                try:
                    df[name] = df[name].astype(want)
                except (ValueError, TypeError):
                    pass
        return df

    def _join_part(g: pd.DataFrame) -> pd.DataFrame:
        side = g["_side"].to_numpy()
        fac = g.loc[side == 1, fact_cols]
        # facts with a null key or null event time match no dim version
        # (merge_asof forbids them and they'd block the int-dtype restore);
        # split them out and re-attach with null dim columns
        null_rows = fac[by].isna() | fac[on].isna()
        # restore dtypes on each half separately: the null half's key stays
        # float (NaN has no int representation) but its OTHER columns must
        # come back (id etc. were promoted by the union's null padding)
        fac_null = _restore_dtypes(fac.loc[null_rows].copy(), fact_types)
        fac = _restore_dtypes(fac.loc[~null_rows].copy(), fact_types).sort_values(
            on, kind="mergesort"
        )
        dimp = g.loc[side == 0, dim_cols]
        dimp = _restore_dtypes(
            dimp.loc[~(dimp[by].isna() | dimp[dim_on].isna())], dim_types
        ).sort_values(dim_on, kind="mergesort")
        out = pd.merge_asof(
            fac, dimp, left_on=on, right_on=dim_on, by=by,
            direction="backward",
        )
        if len(fac_null):
            out = pd.concat(
                [out, fac_null.reindex(columns=out.columns)],
                ignore_index=True,
            )
        return out[columns] if columns is not None else out

    return (
        tagged.groupby("_part").map_groups(_join_part, batch_format="pandas")
    )
