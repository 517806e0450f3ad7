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
    if key_col not in out.columns:  # zero rows: groupby drops the schema
        return pd.DataFrame(
            {
                key_col: pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
                "centroid": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values([key_col, "pos"]).reset_index(drop=True)


def kmeans(
    emb_ds,
    init_centroids: np.ndarray,
    n_iter: int = 5,
    vec_col: str = "embedding",
    as_dataset: bool = False,
):
    """Distributed Lloyd's k-means (the iterative-algorithm shape).

    Each iteration broadcasts the (k x dim) centroid matrix once
    (``ray.put`` + per-worker cache) and runs ONE pass over the vectors:
    every batch assigns its rows by a vectorized distance argmin and
    reduces to per-cluster (n, sum) partials — k x #blocks tiny rows reach
    the driver fold (k x dim floats), vectors never move or materialize.
    Centroids are rounded to 6 decimals per iteration, which makes the
    whole trajectory — and therefore the assignments — deterministic
    across partitionings and cluster sizes (the reordering error of
    distributed float sums is ~1e-13, far below the rounding grain).
    Empty clusters keep their previous centroid.

    Returns a summary DataFrame (cluster, n_vecs, inertia) with inertia
    rounded to 6 decimals; ``as_dataset=True`` instead returns the final
    per-row assignment Dataset (vec-cardinality — collecting is the
    caller's choice) with an added int64 ``cluster`` column.
    """
    import ray

    from ..broadcast import broadcast_get

    cents = np.round(np.asarray(init_centroids, dtype=np.float64), 6)
    k, dim = cents.shape

    def _assign(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
        # per-cluster elementwise (x-c)^2 row sums, NOT a BLAS matmul: the
        # axis-1 pairwise reduction depends only on dim, so every row's
        # distance (and its argmin) is bit-identical regardless of how
        # rows are batched — assignments never flip across partitionings
        d = np.empty((mat.shape[0], c.shape[0]), dtype=np.float64)
        for j in range(c.shape[0]):
            diff = mat - c[j]
            d[:, j] = (diff * diff).sum(axis=1)
        return d.argmin(axis=1)

    for _ in range(n_iter):
        ref = ray.put(cents)

        def _partial(b: pa.Table) -> pa.Table:
            c = broadcast_get(ref)
            mat = _batch_matrix(b[vec_col])
            if mat.shape[0] == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            a = _assign(mat, c)
            order = np.argsort(a, kind="stable")
            starts = np.flatnonzero(np.r_[True, np.diff(a[order]) != 0])
            sums = np.add.reduceat(mat[order], starts, axis=0)
            counts = np.diff(np.r_[starts, len(a)])
            return pa.table(
                {
                    "cluster": pa.array(a[order][starts].astype(np.int64)),
                    "n": pa.array(counts.astype(np.int64), pa.int64()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        parts = (
            emb_ds.map_batches(
                _partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .to_pandas()
        )  # k x #blocks tiny rows — the bounded driver fold
        new = cents.copy()
        for cl, g in parts.groupby("cluster"):
            s = np.stack(g["vsum"].to_numpy()).sum(axis=0)
            new[int(cl)] = s / int(g["n"].sum())
        cents = np.round(new, 6)

    ref = ray.put(cents)

    def _final(b: pa.Table) -> pa.Table:
        c = broadcast_get(ref)
        mat = _batch_matrix(b[vec_col])
        if mat.shape[0] == 0:
            a = np.array([], dtype=np.int64)
        else:
            a = _assign(mat, c).astype(np.int64)
        return b.append_column("cluster", pa.array(a, pa.int64()))

    assigned = emb_ds.map_batches(
        _final, batch_format="pyarrow", zero_copy_batch=True
    )
    if as_dataset:
        return assigned

    def _inertia(b: pa.Table) -> pa.Table:
        c = broadcast_get(ref)
        mat = _batch_matrix(b[vec_col])
        a = b["cluster"].to_numpy(zero_copy_only=False)
        if mat.shape[0] == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "n_vecs": pa.array([], pa.int64()),
                    "inertia_micro": pa.array([], pa.int64()),
                }
            )
        # per-ROW squared distance quantized to int64 micros BEFORE any
        # summation: integer sums are order-independent, so the reported
        # inertia is bit-identical across partitionings (the exact-cents
        # convention from pipelines/queries.py applied to distances)
        sq = ((mat - c[a]) ** 2).sum(axis=1)
        micro = np.floor(sq * 1e6 + 0.5).astype(np.int64)
        order = np.argsort(a, kind="stable")
        starts = np.flatnonzero(np.r_[True, np.diff(a[order]) != 0])
        return pa.table(
            {
                "cluster": pa.array(a[order][starts].astype(np.int64)),
                "n_vecs": pa.array(
                    np.diff(np.r_[starts, len(a)]).astype(np.int64), pa.int64()
                ),
                "inertia_micro": pa.array(
                    np.add.reduceat(micro[order], starts), pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        assigned.map_batches(_inertia, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(
            Sum("n_vecs", alias_name="n_vecs"),
            Sum("inertia_micro", alias_name="inertia_micro"),
        )
        .to_pandas()
    )
    out["cluster"] = out["cluster"].astype("int64")
    out["n_vecs"] = out["n_vecs"].astype("int64")
    out["inertia"] = out["inertia_micro"] / 1e6
    out = out.drop(columns=["inertia_micro"])
    return out.sort_values("cluster").reset_index(drop=True)
