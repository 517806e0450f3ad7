"""Source-mixture sampling: rebalance a multi-source corpus for training.

The LLM-pipeline "temperature mixing" op (sample source s with
probability ∝ n_s^alpha): at alpha=1 the corpus is unchanged, at
alpha=0 every source contributes ~equally. This module implements the
deterministic, engine-portable core — per-source integer CUTOFFS applied
to ``id % denom`` — so the same sample reproduces across runs, cluster
sizes, and engines (the SQL oracle recomputes the identical cutoffs).

``alpha=0`` (the default, equal-per-source) uses PURE INTEGER arithmetic
(``cutoff_s = denom * min_n // n_s``): no float rate exists whose
rounding could flip a cutoff boundary between numpy and the oracle.
Other alphas compute ``cutoff_s = floor(denom * (n_s / max_n) ** (alpha
- 1))`` in float64 — documented as carrying a measure-zero boundary-tie
risk across math libraries (keep oracles on the alpha=0 path).

Scale shape: pass 1 is a per-batch combiner -> source-cardinality
groupby (tiny rows); the cutoff table is source-cardinality and ships
broadcast; pass 2 filters batches vectorized and reduces to per-source
(n_docs, n_sampled) partials. Document text never moves; nothing
doc-cardinality reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def source_mixture_sample(
    docs_ds,
    alpha: float = 0.0,
    denom: int = 10_000,
    id_col: str = "doc_id",
    key_col: str = "source",
):
    """Returns one row per source: (source, n_docs, n_sampled, cutoff).

    A doc is sampled iff ``id % denom < cutoff_source``. The input must
    be re-readable (it is consumed twice: count pass + filter pass);
    readers are, and a pipeline input should be materialize()d by the
    caller first (CLAUDE.md consumed-twice rule).
    """
    from ray.data.aggregate import Sum

    def _counts(b: pa.Table) -> pa.Table:
        if key_col not in b.column_names:
            return pa.table({key_col: pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = (
            pd.Series(b[key_col].to_pandas())
            .value_counts(dropna=False)
            .rename_axis(key_col)
            .reset_index(name="n")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        docs_ds.map_batches(
            _counts, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if counts.empty or key_col not in counts.columns:
        return pd.DataFrame({
            key_col: pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_sampled": pd.Series([], dtype="int64"),
            "cutoff": pd.Series([], dtype="int64"),
        })
    counts["n"] = counts["n"].astype("int64")
    n_by_src = dict(zip(counts[key_col], counts["n"]))
    if alpha == 0.0:
        min_n = int(counts["n"].min())
        cutoffs = {s: min(denom, denom * min_n // int(n))
                   for s, n in n_by_src.items()}
    else:
        max_n = float(counts["n"].max())
        cutoffs = {
            s: min(denom, int(np.floor(denom * (float(n) / max_n) ** (alpha - 1.0))))
            for s, n in n_by_src.items()
        }

    import ray

    from ..broadcast import broadcast_get

    ref = ray.put(cutoffs)

    def _sampled(b: pa.Table) -> pa.Table:
        if key_col not in b.column_names:
            return pa.table({key_col: pa.array([], pa.string()),
                             "n_sampled": pa.array([], pa.int64())})
        cut = broadcast_get(ref)
        src = pd.Series(b[key_col].to_pandas())
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        thr = src.map(cut).fillna(0).to_numpy(dtype=np.int64)
        keep = (ids % denom) < thr
        g = (
            src[keep].value_counts(dropna=False)
            .rename_axis(key_col).reset_index(name="n_sampled")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    sampled = (
        docs_ds.map_batches(
            _sampled, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby(key_col)
        .aggregate(Sum("n_sampled", alias_name="n_sampled"))
        .to_pandas()
    )
    out = counts.rename(columns={"n": "n_docs"}).merge(
        sampled, on=key_col, how="left"
    )
    out["n_sampled"] = out["n_sampled"].fillna(0).astype("int64")
    out["cutoff"] = out[key_col].map(cutoffs).astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)
