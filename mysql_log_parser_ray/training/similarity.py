"""Similarity search over an embedding column (list<float>).

* brute_force_topk: the exact baseline - the query matrix is broadcast via
  ray.put once; each batch computes one numpy matmul against it and emits
  its local top-k; the driver merges per-batch top-k partials (k x batches
  rows, never the full score matrix).
* ivf_topk: the scale path - k-means-ish coarse centroids (sampled, fixed
  seed), vectors bucketed by nearest centroid (one shuffle), queries probe
  the nprobe nearest buckets only. Recall measured in tests.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _to_matrix(col) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float64 matrix, vectorized.

    flatten() respects list offsets so this is one buffer copy, no per-row
    Python. Falls back to the row-wise path only for ragged/null layouts
    (never the case for embedding columns).
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(
            flat.astype(np.float64, copy=False).reshape(len(arr), -1)
        )
    except (ValueError, pa.ArrowInvalid):
        return np.array(arr.to_pylist(), dtype=np.float64)


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def brute_force_topk(
    emb_ds,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k per query. Returns (query_id, vec_id, cosine),
    ties broken by vec_id ascending."""
    import ray

    qn = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    qref = ray.put(qn)

    def _scores(batch: pa.Table) -> pa.Table:
        import ray as _ray

        q = _ray.get(qref) if isinstance(qref, _ray.ObjectRef) else qref
        x = _normalize(_to_matrix(batch[vec_col]))
        sims = x @ q.T  # (n, nq)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        frames = []
        for qi in range(q.shape[0]):
            s = sims[:, qi]
            top = min(k, len(s))
            # local top-k: argpartition then exact sort with vec_id tiebreak
            idx = np.argpartition(-s, top - 1)[:top]
            order = np.lexsort((ids[idx], -s[idx]))
            sel = idx[order]
            frames.append(
                pd.DataFrame(
                    {"query_id": qi, "vec_id": ids[sel], "cosine": s[sel]}
                )
            )
        return pa.Table.from_pandas(pd.concat(frames), preserve_index=False)

    parts = emb_ds.map_batches(
        _scores, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out = (
        parts.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def _sampled_centroids(
    emb_ds, n_centroids: int, sample: int, seed: int, vec_col: str
) -> Optional[np.ndarray]:
    """Driver-side centroid seed sample + a few deterministic Lloyd steps.

    The sample takes limit(sample) over a SEEDED RANDOM BLOCK ORDER
    (randomize_block_order is a metadata-only permutation — still no
    count() pass and no full-dataset scan, and the block list is a
    function of the file layout, so the draw is identical at any
    num_cpus). A plain limit() read the first blocks only, which seeds
    every centroid from one source when the corpus is source-ordered;
    random blocks restore coverage at the same cost. The
    recall-vs-brute-force invariant is pinned in tests. Returns None for
    an empty dataset.
    """
    samp = emb_ds.randomize_block_order(seed=seed).limit(sample).to_pandas()
    if len(samp) == 0:
        return None
    xs = _normalize(np.array(samp[vec_col].tolist(), dtype=np.float64))
    rng = np.random.default_rng(seed)
    cents = xs[rng.choice(len(xs), size=min(n_centroids, len(xs)), replace=False)]
    # a few Lloyd iterations, deterministic
    for _ in range(5):
        assign = np.argmax(xs @ cents.T, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = xs[m].mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-12)
    return cents


def build_ivf(
    emb_ds,
    n_centroids: int = 16,
    sample: int = 2048,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 1_000_000,
):
    """Sampled centroid table + bucketed vectors (one shuffle by centroid).

    Returns (centroids ndarray, bucketed pandas DataFrame with 'bucket').
    SMALL-DATA variant: the bucketed frame materializes on the caller for
    interactive probing, guarded by ``max_rows`` (fail-fast with the
    remedy named, never a silent driver OOM); the input must be
    re-readable (reader-backed or materialized — it is consumed by the
    centroid sample, the guard count and the bucketing pass). At real
    scale use
    ``ivf_topk_distributed``, which keeps the vectors a Dataset end to
    end; the driver query uses that path.
    """
    cents = _sampled_centroids(emb_ds, n_centroids, sample, seed, vec_col)
    if cents is None:
        return np.zeros((0, 0)), pd.DataFrame()
    n = emb_ds.count()
    if n > max_rows:
        raise ValueError(
            f"build_ivf: {n} vectors exceed max_rows={max_rows} - this "
            "variant materializes the bucketed table on the driver; use "
            "ivf_topk_distributed for corpus-scale probing"
        )

    import ray

    cref = ray.put(cents)

    def _bucket(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cs = _ray.get(cref) if isinstance(cref, _ray.ObjectRef) else cref
        x = _normalize(_to_matrix(batch[vec_col]))
        bucket = np.argmax(x @ cs.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket, pa.int32()))

    bucketed = emb_ds.map_batches(
        _bucket, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return cents, bucketed


def ivf_topk_distributed(
    emb_ds,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    n_centroids: int = 16,
    sample: int = 2048,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    collect_limit: int = 200_000,
) -> pd.DataFrame:
    """IVF top-k that never materializes the vector table.

    Centroids come from a driver-side SAMPLE (small by construction); the
    probe set per query is computed on the driver (tiny); then ONE
    distributed pass over the embeddings scores each batch's rows only
    against the queries probing that row's bucket and emits local top-k
    rows. Small candidate sets (<= ``collect_limit`` rows, counted before
    any collect) merge directly on the driver; past that a bucket-collapse
    keyed on query_id (each query's candidates land in one bucket, which
    keeps only that query's global top-k) bounds the driver frame at
    nq x k rows regardless of block count. Vectors never materialize.
    This is the 10^12-row path; ivf_topk keeps the materialized variant
    for small data.
    """
    import ray

    cents = _sampled_centroids(emb_ds, n_centroids, sample, seed, vec_col)
    if cents is None:  # empty dataset: typed-empty result, no crash
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )

    qn = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    # per-bucket list of probing query indices (driver-side, tiny)
    probes = np.argsort(-(cents @ qn.T), axis=0)[:nprobe]  # (nprobe, nq)
    bucket_queries: dict = {}
    for qi in range(qn.shape[0]):
        for b in probes[:, qi]:
            bucket_queries.setdefault(int(b), []).append(qi)
    cref = ray.put((cents, qn, bucket_queries))

    def _local_topk(batch: pa.Table) -> pa.Table:
        cs, q, bq = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        x = _normalize(_to_matrix(batch[vec_col]))
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        buckets = np.argmax(x @ cs.T, axis=1)
        frames = []
        for b in np.unique(buckets):
            qis = bq.get(int(b))
            if not qis:
                continue
            m = buckets == b
            sub, sub_ids = x[m], ids[m]
            sims = sub @ q[qis].T  # (nb, len(qis))
            for col, qi in enumerate(qis):
                s = sims[:, col]
                top = min(k, len(s))
                idx = np.argpartition(-s, top - 1)[:top]
                order = np.lexsort((sub_ids[idx], -s[idx]))
                sel = idx[order]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qi, "vec_id": sub_ids[sel], "cosine": s[sel]}
                    )
                )
        if not frames:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.Table.from_pandas(pd.concat(frames), preserve_index=False)

    cand_ds = emb_ds.map_batches(
        _local_topk, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_cand = cand_ds.count()
    if n_cand == 0:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        # per-bucket global top-k per query (top-k is associative over
        # block-local top-k candidates); identical ordering to the
        # direct driver merge, so both paths are value-equal
        if not len(g) or "query_id" not in g.columns:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        return (
            g.sort_values(["query_id", "cosine", "vec_id"],
                          ascending=[True, False, True])
            .groupby("query_id", as_index=False)
            .head(k)[["query_id", "vec_id", "cosine"]]
        )

    if n_cand > collect_limit:
        # bucket-collapse: tag by query_id (dense small ints) so each
        # query's candidate rows co-locate; the driver then sees at most
        # nq x k rows however many blocks produced candidates
        def _tag(b: pa.Table) -> pa.Table:
            part = pc.cast(
                pc.bit_wise_and(b["query_id"], pa.scalar(63, pa.int64())),
                pa.int64(),
            ) if b.num_rows else pa.array([], pa.int64())
            return b.append_column("_part", part)

        cand_ds = (
            cand_ds.map_batches(_tag, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("_part").map_groups(_fold, batch_format="pandas")
        )
    parts = cand_ds.to_pandas()
    if parts.empty or "query_id" not in parts.columns:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "vec_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    return _fold(parts).reset_index(drop=True)


def ivf_topk(
    centroids: np.ndarray,
    bucketed: pd.DataFrame,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Probe the nprobe nearest buckets per query; exact cosine within."""
    qn = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    by_bucket = {
        b: (
            np.asarray(g[id_col].tolist()),
            _normalize(np.array(g[vec_col].tolist(), dtype=np.float64)),
        )
        for b, g in bucketed.groupby("bucket")
    }
    frames = []
    for qi in range(qn.shape[0]):
        probes = np.argsort(-(centroids @ qn[qi]))[:nprobe]
        ids_all, sims_all = [], []
        for b in probes:
            if b not in by_bucket:
                continue
            ids, x = by_bucket[b]
            ids_all.append(ids)
            sims_all.append(x @ qn[qi])
        if not ids_all:
            continue
        ids = np.concatenate(ids_all)
        sims = np.concatenate(sims_all)
        order = np.lexsort((ids, -sims))[:k]
        frames.append(
            pd.DataFrame({"query_id": qi, "vec_id": ids[order], "cosine": sims[order]})
        )
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        {"query_id": [], "vec_id": [], "cosine": []}
    )


def nn_join_broadcast(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    max_broadcast_rows: int = 2_000_000,
) -> pd.DataFrame:
    """Each vector's single nearest neighbour (cosine, self excluded)
    against a BROADCAST candidate matrix — the corpus-x-corpus NN join in
    its baseline shape: the candidate side ships once via ``ray.put``,
    every batch of query rows does one ``(n_batch, d) @ (d, N)`` matmul
    and keeps its own winner, so the join streams over the query side.

    Winner selection ranks by (cosine ROUNDED to ``round_dp``, neighbour
    id ascending), making the result invariant to summation order across
    engines — the SQL oracle ranks identically. The candidate matrix must
    fit a worker (the broadcast contract, same bound as every broadcast
    join here); past that use the tile cross-product pattern
    (dedup.embedding_dup_pairs_tiles shape) or IVF.
    """
    import ray

    n = emb_ds.count()
    if n > max_broadcast_rows:
        raise ValueError(
            f"nn_join_broadcast: {n} candidate vectors exceed "
            f"max_broadcast_rows={max_broadcast_rows} - the broadcast "
            "baseline would hold the whole corpus per worker; use the "
            "tile cross-product pattern (embedding_dup_pairs_tiles shape) "
            "or ivf_topk_distributed instead"
        )
    cand = emb_ds.select_columns([id_col, vec_col]).to_pandas()
    cand = cand.sort_values(id_col).reset_index(drop=True)
    cand_ids = cand[id_col].to_numpy(dtype=np.int64)
    X = _normalize(
        np.ascontiguousarray(
            np.stack(cand[vec_col].to_numpy()).astype(np.float64)
        )
    )
    ref = ray.put((cand_ids, X))

    from ..broadcast import broadcast_get

    def _nn(batch: pa.Table) -> pa.Table:
        ids_c, Xc = broadcast_get(ref)
        x = _normalize(_to_matrix(batch[vec_col]))
        ids_b = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sims = np.round(x @ Xc.T, round_dp)
        sims[ids_b[:, None] == ids_c[None, :]] = -np.inf  # mask self
        # argmax over candidates sorted by id: first maximum == smallest id
        best = np.argmax(sims, axis=1)
        best_sim = sims[np.arange(len(best)), best]
        # a row with NO valid neighbour (single-vector corpus: every
        # candidate is self-masked) has best_sim == -inf; the oracle's
        # a.vec_id <> b.vec_id join emits nothing for it — drop, don't
        # fabricate a self-match at index 0
        ok = np.isfinite(best_sim)
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": ids_b[ok].astype(np.int64),
                    "nn_id": ids_c[best[ok]],
                    "cos": best_sim[ok],
                }
            ),
            preserve_index=False,
        )

    out = emb_ds.map_batches(
        _nn, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if "vec_id" not in out.columns:  # all batches empty -> schema dropped
        out = pd.DataFrame({
            "vec_id": pd.Series([], dtype="int64"),
            "nn_id": pd.Series([], dtype="int64"),
            "cos": pd.Series([], dtype="float64"),
        })
    out["vec_id"] = out["vec_id"].astype("int64")
    out["nn_id"] = out["nn_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


def embedding_decontam(
    emb_ds,
    eval_ds,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    max_eval_rows: int = 2_000_000,
    as_dataset: bool = False,
):
    """Embedding-space decontamination: every training vector whose best
    cosine against the BROADCAST eval/benchmark matrix reaches
    ``threshold``, with the offending eval id.

    The semantic twin of the 13-gram text decontamination
    (training/decontam.py) in embedding space: the eval set is the small
    side by construction, ships once via ``ray.put``, and the training
    corpus streams through one ``(n_batch, d) @ (d, n_eval)`` matmul per
    batch — nothing corpus-sized ever sits on the driver or a worker.
    Ranking and the threshold test use the ROUNDED cosine (the
    nn_join_broadcast convention) so the result is engine-invariant;
    eval-id ties break ascending. The eval matrix must fit a worker
    (fail-fast guard); a larger eval side would go through the tile
    cross-product pattern instead.

    Output cardinality is the CONTAMINATED row count — corpus-sized at a
    loose threshold. ``as_dataset=True`` keeps the hits a Dataset
    (unsorted) for callers that feed them into a downstream filter/join
    instead of collecting; the default pandas collect is the
    driver-contract convenience.
    """
    import ray

    ev = eval_ds.select_columns([id_col, vec_col]).materialize()
    n_eval = ev.count()
    if n_eval > max_eval_rows:
        raise ValueError(
            f"embedding_decontam: {n_eval} eval vectors exceed "
            f"max_eval_rows={max_eval_rows} - the broadcast eval matrix "
            "would not fit a worker; use the tile cross-product pattern "
            "(embedding_dup_pairs_tiles shape) instead"
        )
    empty = pd.DataFrame(
        {
            "vec_id": pd.Series([], dtype="int64"),
            "eval_id": pd.Series([], dtype="int64"),
            "cos": pd.Series([], dtype="float64"),
        }
    )
    if n_eval == 0:
        return empty
    cand = ev.to_pandas().sort_values(id_col).reset_index(drop=True)
    cand_ids = cand[id_col].to_numpy(dtype=np.int64)
    X = _normalize(
        np.ascontiguousarray(np.stack(cand[vec_col].to_numpy()).astype(np.float64))
    )
    ref = ray.put((cand_ids, X))

    from ..broadcast import broadcast_get

    def _hits(batch: pa.Table) -> pa.Table:
        ids_c, Xc = broadcast_get(ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "eval_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        x = _normalize(_to_matrix(batch[vec_col]))
        ids_b = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        sims = np.round(x @ Xc.T, round_dp)
        # candidates are sorted by id: first maximum == smallest eval_id
        best = np.argmax(sims, axis=1)
        best_sim = sims[np.arange(len(best)), best]
        hit = best_sim >= threshold
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": ids_b[hit].astype(np.int64),
                    "eval_id": ids_c[best[hit]],
                    "cos": best_sim[hit],
                }
            ),
            preserve_index=False,
        )

    hits = emb_ds.map_batches(
        _hits, batch_format="pyarrow", zero_copy_batch=True
    )
    if as_dataset:
        return hits
    out = hits.to_pandas()
    if "vec_id" not in out.columns:  # all batches empty -> schema dropped
        return empty
    out["vec_id"] = out["vec_id"].astype("int64")
    out["eval_id"] = out["eval_id"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)
