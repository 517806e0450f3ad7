"""Vector-column aggregates over embedding tables.

``vector_centroids``: per-key mean embedding (the k-means "M step" /
class-prototype primitive). Combiner shape: each batch reduces its rows to
one (key, n, sum-vector) partial — the sum is computed by sorting the
zero-copy (rows x dim) matrix view by key code and one
``np.add.reduceat`` (no per-row Python) — so what shuffles is
#keys x #blocks tiny partial rows, never vectors. The per-key merge is a
``map_groups`` over those partials (groups = keys, each holding a handful
of rows — not the tiny-groups hazard).

Float determinism: partials accumulate in float64 and the final centroid
is rounded to 6 decimals, absorbing the ~1e-13 relative reordering error
of distributed summation (the same convention as the money-cents rule in
pipelines/queries.py, applied to means).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_matrix(col: "pa.ChunkedArray") -> np.ndarray:
    """list<float> column -> (rows, dim) float64 matrix, zero-copy flatten."""
    arr = col.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    if len(arr) == 0:
        return flat.reshape(0, 0)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    dim = int(widths[0])
    if not (widths == dim).all():
        raise ValueError("ragged embedding column (expected fixed dim)")
    return flat[offsets[0] : offsets[-1]].reshape(-1, dim)


def vector_centroids(
    emb_ds,
    key_col: str = "label",
    vec_col: str = "embedding",
):
    """Per-key centroid, long format: (key, pos, centroid) rows with
    ``centroid`` rounded to 6 decimals, sorted by (key, pos)."""

    def _partial(b: pa.Table) -> pa.Table:
        mat = _batch_matrix(b[vec_col])
        keys = b[key_col].to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(keys, use_na_sentinel=False)
        order = np.argsort(codes, kind="stable")
        starts = np.flatnonzero(np.r_[True, np.diff(codes[order]) != 0])
        sums = np.add.reduceat(mat[order], starts, axis=0)
        counts = np.diff(np.r_[starts, len(codes)])
        return pa.table(
            {
                key_col: pa.array(np.asarray(uniques)[codes[order][starts]]),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
            }
        )

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        sums = np.stack(g["vsum"].to_numpy())
        total = sums.sum(axis=0)
        n = int(g["n"].sum())
        dim = total.shape[0]
        return pd.DataFrame(
            {
                key_col: np.repeat(g[key_col].iloc[0], dim),
                "pos": np.arange(dim, dtype=np.int64),
                "centroid": np.round(total / n, 6),
            }
        )

    out = (
        emb_ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values([key_col, "pos"]).reset_index(drop=True)
