"""Misra-Gries heavy hitters: sketch-accelerated EXACT top-k.

The one-pass bounded-memory replacement for ``groupby(key).count`` when only
the heavy tail matters (top users / domains / templates at 10^12 rows).
Two passes, both streaming:

  1. Each block reduces its rows to an exact histogram, MG-compressed to at
     most ``k`` (key, est) counters — compression subtracts the (k+1)-th
     largest count from all counters and keeps the positive ones, so
     ``true_block - block_n/(k+1) <= est <= true_block``. Summing the
     per-block sketches preserves the bound corpus-wide:
     ``true - n/(k+1) <= est <= true``.
  2. The candidate set {est + n/(k+1) >= 10th-largest est} provably
     contains the true top-``topn`` (any key outside it has
     ``true <= est + n/(k+1) < est_topn <= true_topn``); an exact count of
     ONLY those candidates (broadcast filter + small groupby) recovers the
     exact answer. Keys absent from every block sketch have
     ``true <= n/(k+1)``; when the threshold does not clear that floor the
     superset argument fails and the caller must fall back to the exact
     full groupby — ``topk_exact_via_sketch`` does so automatically.

No reference counterpart (the reference aggregates every class in RAM,
bin/parser-cli.go:72-88); this is the engine-side scale path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def mg_compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Exact (key, count) histogram -> MG sketch of at most k counters."""
    if len(keys) <= k:
        return keys, counts
    order = np.argsort(counts, kind="stable")[::-1]
    cut = counts[order[k]]
    keep = counts > cut
    return keys[keep], counts[keep] - cut


def topk_exact_via_sketch(
    ds,
    col: str,
    topn: int = 10,
    k: int = 1024,
    candidate_limit: int = 100_000,
    n_total: Optional[int] = None,
):
    """Exact top-``topn`` of ``ds[col]`` by count, via an MG candidate pass.

    Returns a DataFrame (col, n_rows) sorted (n_rows desc, col asc) —
    identical to the full-groupby answer (q_top_users contract). Falls back
    to the exact full groupby when the sketch threshold cannot clear the
    absent-key floor or the candidate set explodes (uniform-ish data, k too
    small) — correctness never depends on the data shape, only speed does.
    """
    import ray

    from ..broadcast import broadcast_get

    if n_total is None:
        n_total = ds.count()  # parquet metadata fast path on raw reads
    slack = n_total // (k + 1) + 1

    def _partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[col]))
        vals = b[col].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(vals, return_counts=True)
        keys, counts = mg_compress(keys, counts.astype(np.int64), k)
        return pa.table(
            {
                col: pa.array(keys),
                "est": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    est_ds = (
        ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby(col)
        .aggregate(Sum("est", alias_name="est"))
    )
    head = est_ds.sort("est", descending=True).limit(topn).to_pandas()
    if len(head) < topn:
        return _exact_topk(ds, col, topn)
    est_cut = int(head["est"].min())
    if est_cut <= slack:  # absent-key floor not cleared: sketch inconclusive
        return _exact_topk(ds, col, topn)
    thresh = est_cut - slack
    cand = est_ds.map_batches(
        lambda b: b.filter(pc.greater_equal(b["est"], thresh)),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()
    if len(cand) > candidate_limit:
        return _exact_topk(ds, col, topn)
    ref = ray.put(np.sort(cand[col].to_numpy()))

    def _exact_cand(b: pa.Table) -> pa.Table:
        want = broadcast_get(ref)
        b = b.filter(pc.is_valid(b[col]))
        vals = b[col].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(vals[np.isin(vals, want)], return_counts=True)
        return pa.table(
            {
                col: pa.array(keys),
                "n_rows": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    out = (
        ds.map_batches(
            _exact_cand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby(col)
        .aggregate(Sum("n_rows", alias_name="n_rows"))
        .to_pandas()
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    out = out.sort_values(["n_rows", col], ascending=[False, True]).head(topn)
    return out.reset_index(drop=True)


def _exact_topk(ds, col: str, topn: int) -> pd.DataFrame:
    """Full exact fallback: per-block histogram partials + one groupby."""
    from ray.data.aggregate import Sum

    def _counts(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[col]))
        vals = b[col].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(vals, return_counts=True)
        return pa.table(
            {
                col: pa.array(keys),
                "n_rows": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    out = (
        ds.map_batches(
            _counts, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby(col)
        .aggregate(Sum("n_rows", alias_name="n_rows"))
        .to_pandas()
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    out = out.sort_values(["n_rows", col], ascending=[False, True]).head(topn)
    return out.reset_index(drop=True)
