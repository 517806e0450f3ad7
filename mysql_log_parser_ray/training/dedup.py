"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the patterns that survive 10^12 rows):
* exact: content-hash per batch -> groupby(hash) -> keep min doc_id. The
  groupby shuffles only (hash, doc_id) pairs, never text.
* MinHash+LSH: shingle -> 64-perm minhash per doc (numpy broadcast) ->
  explode to (band_id, band_hash, doc_id) rows -> groupby bands -> candidate
  pairs within buckets only -> exact Jaccard verify on the pair set. No
  all-pairs comparison anywhere.
* SimHash: 64-bit weighted-word signature; near-dup candidates = equal
  signature bands (same LSH trick on bit-chunks).
* embedding near-dup: random-hyperplane bucketing, exact cosine verify
  within buckets (brute-force per bucket, numpy matmul).

All hashing is deterministic (crc32 / blake2b / fixed rng seed) so results
are stable across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import _WS_RE as _WS_RE_SIM
from .text import normalize_text

_MERSENNE = (1 << 61) - 1
_N_PERM = 64


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _typed_empty(cols: Dict[str, str]) -> pd.DataFrame:
    """Typed empty frame (an all-empty Ray groupby loses the schema)."""
    return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})


def _perm_params(n_perm: int = _N_PERM, seed: int = 12345):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


_A, _B = _perm_params()


# Weights B^(k-1..0) for the vectorized polynomial shingle hash (wraps
# mod 2^64 like Go/Java string hashes; deterministic across machines).
_SHINGLE_B = np.uint64(1099511628211)  # FNV prime


def _shingle_weights(k: int) -> np.ndarray:
    # wraparound mod 2^64 is intended; compute in Python ints to avoid the
    # numpy overflow warning
    b = int(_SHINGLE_B)
    return np.array(
        [pow(b, k - 1 - i, 1 << 64) for i in range(k)], dtype=np.uint64
    )


_W5 = _shingle_weights(5)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """64-bit polynomial hashes of the k-char shingles of normalized text.

    Fully vectorized: one sliding_window_view + weighted uint64 sum per
    doc (a per-shingle crc32 loop measured ~10x slower)."""
    norm = normalize_text(text).encode("utf-8")
    if len(norm) < k:
        return np.array([zlib.crc32(norm)], dtype=np.uint64)
    b = np.frombuffer(norm, dtype=np.uint8).astype(np.uint64)
    w = _W5 if k == 5 else _shingle_weights(k)
    windows = np.lib.stride_tricks.sliding_window_view(b, k)
    return np.unique((windows * w).sum(axis=1))


def minhash_signature_batch(texts: List[str], k: int = 5) -> np.ndarray:
    """(n_docs, 64) uint64 signatures; vectorized across permutations.

    The uint64 product wraps mod 2^64 before the Mersenne modulus - not the
    textbook (a*h+b) mod p family, but a deterministic, well-mixed hash
    family, which is all minhash needs. Deterministic across machines.
    """
    out = np.empty((len(texts), _N_PERM), dtype=np.uint64)
    a = _A.astype(np.uint64)
    b = _B.astype(np.uint64)
    for j, t in enumerate(texts):
        sh = char_shingles(t, k)
        vals = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
        out[j] = vals.min(axis=1)
    return out


def minhash_signature(text: str, k: int = 5) -> np.ndarray:
    """Single-doc signature (same family as the batch path)."""
    return minhash_signature_batch([text], k)[0]


def lsh_bands(sig: np.ndarray, n_bands: int = 16) -> List[int]:
    """Band hashes of one signature (rows = n_perm / n_bands)."""
    r = len(sig) // n_bands
    return [
        zlib.crc32(sig[i * r : (i + 1) * r].tobytes()) for i in range(n_bands)
    ]


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


# ---------------------------------------------------------------------------
# Dataset-level operators
# ---------------------------------------------------------------------------

def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id doc per distinct text. Returns a Dataset of
    (text_hash, keep_doc_id, n_dups); only hashes are shuffled."""

    def _hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()[:16]
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {"text_hash": pa.array(hs, pa.string()), id_col: batch[id_col]}
        )

    hashed = docs_ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("text_hash", as_index=False).agg(
            keep_doc_id=(id_col, "min"), n_dups=(id_col, "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Min, Sum

    return (
        hashed.map_batches(_partial, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(
            Min("keep_doc_id", alias_name="keep_doc_id"),
            Sum("n_dups", alias_name="n_dups"),
        )
    )


def _shingle_rows_fn(text_col: str, id_col: str):
    """map_batches fn: explode each doc into (doc, sh, n_sh) rows — one row
    per distinct char-5 shingle hash, with the doc's shingle count riding
    every row (immutable per doc, so max() recovers it after any join;
    carrying it eliminates a count-join entirely)."""

    def _fn(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        id_type = b[id_col].type
        out_sh, out_id, out_n = [], [], []
        for did, t in zip(ids, texts):
            sh = char_shingles(t)
            out_sh.append(sh.view(np.int64))
            out_id.append(np.repeat(did, len(sh)))
            out_n.append(np.full(len(sh), len(sh), dtype=np.int32))
        if not out_sh:
            return pa.table(
                {
                    "doc": pa.array([], id_type),
                    "sh": pa.array([], pa.int64()),
                    "n_sh": pa.array([], pa.int32()),
                }
            )
        return pa.table(
            {
                "doc": pa.array(np.concatenate(out_id), id_type),
                "sh": pa.array(np.concatenate(out_sh), pa.int64()),
                "n_sh": pa.array(np.concatenate(out_n), pa.int32()),
            }
        )

    return _fn


def _verify_pairs_joined(
    docs_ds,
    cand_ds,
    threshold: float,
    text_col: str,
    id_col: str,
    n_parts: Optional[int] = None,
):
    """Fully DISTRIBUTED exact-Jaccard verification: nothing pair- or
    doc-cardinality-sized ever lands on the driver (the scale path when
    the candidate pair set outgrows broadcast).

    Shape: dedupe candidate pairs with one groupby; select candidate DOCS
    with a hash semi-join (doc text shuffles once, and only for docs that
    appear in some pair); explode their shingles to (doc, sh, n_sh) rows;
    then two hash joins anchor intersections to pairs — pair rows pick up
    doc_a's shingles on doc_a, the result inner-joins doc_b's shingles on
    (doc_b, sh). The final jaccard + threshold is the same ppart-bucketed
    vectorized aggregate the broadcast path uses, applied worker-side.

    Volume bound: the one super-candidate intermediate is
    |pairs| x avg-shingles(doc_a), shuffled once — the price of taking the
    pair list off the driver. Per-partition memory is 1/n_parts of that.
    """
    import ray
    from ray.data.aggregate import Count

    if n_parts is None:
        # the hash-join aggregator pool reserves CPU proportional to the
        # partition count; size it to the session so join actors and the
        # upstream map tasks can coexist (64 fixed partitions starve a
        # 4-CPU session the same way oversized actor-pool floors did)
        n_parts = min(64, max(8, int(ray.cluster_resources().get("CPU", 8))))

    # Normalized arrow id type: empty blocks passed to a join must stay
    # schema-ful (a schema-less empty — the all-empty-groupby artifact —
    # fails acero's key-field lookup inside the hash join).
    _sch = docs_ds.schema()
    id_type = dict(zip(_sch.names, _sch.types))[id_col]
    if not isinstance(id_type, pa.DataType):
        try:
            id_type = pa.from_numpy_dtype(np.dtype(id_type))
        except (TypeError, pa.ArrowNotImplementedError):
            id_type = pa.string()

    # Every map feeding a join uses a NUMERIC batch_size (deliberate
    # exception to the batch_size=None rule): bundling coalesces the
    # schema-less empty blocks the upstream groupby can emit into
    # schema-ful batches before the join's hash partitioner sees them.
    _coalesce = 1 << 16

    def _proj(b: pa.Table) -> pa.Table:
        if "doc_a" not in b.column_names:  # all-empty trailing bundle
            return pa.table(
                {"doc_a": pa.array([], id_type), "doc_b": pa.array([], id_type)}
            )
        return b.select(["doc_a", "doc_b"])

    pairs = (
        cand_ds.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_nc"))
        .map_batches(_proj, batch_format="pyarrow", batch_size=_coalesce)
        .materialize()
    )

    def _stack(b: pa.Table) -> pa.Table:
        if "doc_a" not in b.column_names or b.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type)})
        return pa.table(
            {
                id_col: pa.chunked_array(
                    b["doc_a"].chunks + b["doc_b"].chunks, type=b["doc_a"].type
                )
            }
        )

    need = pairs.map_batches(
        _stack, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=_coalesce,
    )
    cand_docs = docs_ds.join(
        need, "left_semi", num_partitions=n_parts, on=(id_col,)
    )
    sh = cand_docs.map_batches(
        _shingle_rows_fn(text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=_coalesce,
    ).materialize()

    def _as_a(b: pa.Table) -> pa.Table:
        return pa.table({"a_doc": b["doc"], "sh": b["sh"], "na": b["n_sh"]})

    def _as_b(b: pa.Table) -> pa.Table:
        return pa.table({"b_doc": b["doc"], "shb": b["sh"], "nb": b["n_sh"]})

    j1 = pairs.join(
        sh.map_batches(
            _as_a, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=_coalesce,
        ),
        "inner",
        num_partitions=n_parts,
        on=("doc_a",),
        right_on=("a_doc",),
    )
    inter = j1.join(
        sh.map_batches(
            _as_b, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=_coalesce,
        ),
        "inner",
        num_partitions=n_parts,
        on=("doc_b", "sh"),
        right_on=("b_doc", "shb"),
    )

    def _with_pair_part(batch: pa.Table) -> pa.Table:
        from ..partition import stable_pair_partition

        part = stable_pair_partition(
            batch["doc_a"].to_numpy(zero_copy_only=False),
            batch["doc_b"].to_numpy(zero_copy_only=False),
            n_parts,
        )
        return batch.append_column(
            "ppart", pa.array(part.astype(np.int32), pa.int32())
        )

    def _pair_agg(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("na", "size"), na=("na", "max"), nb=("nb", "max")
        )
        jac = s["inter"] / (s["na"] + s["nb"] - s["inter"])
        keep = (jac >= threshold).to_numpy()
        return pd.DataFrame(
            {
                "doc_a": s["doc_a"].to_numpy()[keep],
                "doc_b": s["doc_b"].to_numpy()[keep],
                "jaccard": jac.to_numpy()[keep],
            }
        )

    return (
        inter.select_columns(["doc_a", "doc_b", "na", "nb"])
        .map_batches(
            _with_pair_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("ppart")
        .map_groups(_pair_agg, batch_format="pandas")
        .to_pandas()
    )


def minhash_dedup_pairs(
    docs_ds,
    threshold: float = 0.8,
    n_bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: Optional[int] = 200,
    est_perms: int = 64,
    pair_broadcast_limit: Optional[int] = 1_000_000,
):
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Returns a pandas DataFrame (doc_a, doc_b, jaccard) with jaccard >=
    threshold, doc_a < doc_b. Candidate generation is banded (no
    all-pairs) with a signature-estimate prefilter inside the candidate
    partitions (signatures ride the band rows; a pair whose estimated
    jaccard sits >= 4 sigmas below the threshold is dropped before exact
    verification - per-pair miss odds ~1e-5, far below the banding
    scheme's own ~2e-4 miss rate at j=0.8). Survivors are verified with
    EXACT shingle jaccard, distributed (see inline comments).

    ``est_perms`` trades band-shuffle weight against verify work: the
    first est_perms permutations ride each band row (est_perms x 8B x
    n_bands per doc) and the prefilter floor widens as
    threshold - 4 * 0.5/sqrt(est_perms). Measured at sf0.1: 64 perms
    (8 KB/doc) -> 1.7 s, 32 (4 KB/doc) -> 2.1 s, 16 (2 KB/doc) -> 3.9 s;
    at corpus scale pick the smallest est_perms whose verify volume fits.

    ``max_bucket`` caps pathological LSH buckets: a band bucket with k
    members emits k^2/2 candidates, so one giant boilerplate cluster can
    dominate the run. NOTE the trade-off - a cluster larger than
    max_bucket reports NO pairs from its saturated buckets. Pass
    max_bucket=None for lossless candidate generation, or dedup such
    clusters with exact_dedup first (identical boilerplate is usually
    byte-identical).
    """

    def _sig(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sigs = minhash_signature_batch(texts)
        nd = len(texts)
        # band hashes stay zlib.crc32 (bit-compat with lsh_bands); the
        # explode around them is pure numpy/Arrow — band_id tiles, the id
        # column is an Arrow take (keeps its dtype, strings included), and
        # the sig column is ONE binary array built from offsets over a
        # repeated fixed-width row matrix (per-doc-per-band Python appends
        # measured as the stage's tail at sf0.1)
        r = sigs.shape[1] // n_bands
        bh = np.empty((nd, n_bands), dtype=np.int64)
        for i in range(nd):
            s = sigs[i]
            for b_ in range(n_bands):
                bh[i, b_] = zlib.crc32(s[b_ * r : (b_ + 1) * r].tobytes())
        # only the first est_perms permutations ride the band rows (the
        # estimator subsample: shuffle weight matters more than estimator
        # precision, which the prefilter margin absorbs)
        width = est_perms * 8
        sub = np.ascontiguousarray(sigs[:, :est_perms])
        data = pa.py_buffer(np.repeat(sub, n_bands, axis=0).tobytes())
        offsets = pa.py_buffer(
            (np.arange(nd * n_bands + 1, dtype=np.int32) * width).tobytes()
        )
        sig_arr = pa.Array.from_buffers(
            pa.binary(), nd * n_bands, [None, offsets, data]
        )
        idx = np.repeat(np.arange(nd, dtype=np.int64), n_bands)
        return pa.table(
            {
                "band_id": pa.array(
                    np.tile(np.arange(n_bands, dtype=np.int32), nd), pa.int32()
                ),
                "band_hash": pa.array(bh.ravel(), pa.int64()),
                id_col: batch[id_col].take(pa.array(idx)),
                "sig": sig_arr,
            }
        )

    banded = docs_ds.map_batches(_sig, batch_format="pyarrow", zero_copy_batch=True)

    n_parts = 64

    def _with_part(batch: pa.Table) -> pa.Table:
        h = batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.abs(h * np.int64(1000003) + b) % n_parts
        return batch.append_column(
            "part", pa.array(part.astype(np.int32), pa.int32())
        )

    # Signature-estimate prefilter margin: est ~ Binomial(est_perms, j)
    # / est_perms, sd <= 0.5/sqrt(est_perms); 4 sigmas below threshold
    # keeps P(drop a true pair) per candidate well under the banding
    # scheme's own ~2e-4 miss rate while cutting the recall-tuned
    # banding's false candidates (measured 340k -> ~1k at sf0.1) before
    # the exact verify.
    est_perms = min(int(est_perms), _N_PERM)  # signature is _N_PERM wide
    if est_perms < 1:
        raise ValueError("est_perms must be >= 1")
    est_floor = max(0.0, threshold - 2.0 / float(est_perms) ** 0.5)

    def _partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # cap pathological buckets, then vectorized self-merge per bucket
        if max_bucket is not None:
            g = g[
                g.groupby(["band_id", "band_hash"])["band_id"].transform("size")
                <= max_bucket
            ]
        m = g.merge(g, on=["band_id", "band_hash"], suffixes=("_l", "_r"))
        m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
        out = pd.DataFrame(
            {
                "doc_a": m[f"{id_col}_l"].to_numpy(),
                "doc_b": m[f"{id_col}_r"].to_numpy(),
            }
        )
        if out.empty:
            dt = str(g[id_col].dtype)
            return _typed_empty({"doc_a": dt, "doc_b": dt})
        keep_first = ~out.duplicated()
        m = m.loc[keep_first.to_numpy()]
        out = out.loc[keep_first.to_numpy()]
        sl = np.frombuffer(b"".join(m["sig_l"]), dtype=np.uint64).reshape(-1, est_perms)
        sr = np.frombuffer(b"".join(m["sig_r"]), dtype=np.uint64).reshape(-1, est_perms)
        est = (sl == sr).mean(axis=1)
        return out.loc[est >= est_floor]

    cand_ds = (
        banded.map_batches(_with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_partition_pairs, batch_format="pandas")
        .materialize()
    )
    n_pairs = cand_ds.count()
    if n_pairs == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})

    # Exact-Jaccard verification dispatch. The candidate pair set stays a
    # DATASET; the driver never holds it unconditionally:
    #   n_pairs <= pair_broadcast_limit: broadcast verify (below) — the
    #     pair list ships once via ray.put, each doc's shingles ship once
    #     hash-partitioned BY SHINGLE, two C-level merges per partition
    #     anchor intersections to pairs. Fastest shape; driver/object-store
    #     footprint explicitly BOUNDED by the limit.
    #   n_pairs > pair_broadcast_limit (dup-heavy corpus at scale):
    #     _verify_pairs_joined — pair rows hash-join shingle rows
    #     (semi-join for candidate docs, two inner joins for the
    #     intersection); nothing pair-sized ever reaches the driver.
    # Both paths compute the identical exact jaccard (equality pinned in
    # tests) and apply the threshold worker-side.
    if pair_broadcast_limit is not None and n_pairs > pair_broadcast_limit:
        out = _verify_pairs_joined(
            docs_ds, cand_ds, threshold, text_col, id_col
        )
        id_arrow = cand_ds.schema().types[0]
        empty_dt = (
            "int64"
            if isinstance(id_arrow, pa.DataType) and pa.types.is_integer(id_arrow)
            else str(getattr(id_arrow, "name", id_arrow))
        )
        if out.empty:
            return _typed_empty(
                {"doc_a": empty_dt, "doc_b": empty_dt, "jaccard": "float64"}
            )
        if pd.api.types.is_integer_dtype(out["doc_a"].dtype):
            out["doc_a"] = out["doc_a"].astype("int64")
            out["doc_b"] = out["doc_b"].astype("int64")
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    cand = cand_ds.to_pandas().drop_duplicates()

    import ray

    from ..broadcast import broadcast_get

    n_vparts = 64
    need_docs = np.unique(
        np.concatenate([cand["doc_a"].to_numpy(), cand["doc_b"].to_numpy()])
    )
    cand_pairs = cand[["doc_a", "doc_b"]].reset_index(drop=True)
    cand_ref = ray.put((need_docs, cand_pairs))

    def _cand_shingles(b: pa.Table) -> pa.Table:
        docs_sorted, _ = broadcast_get(cand_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(np.isin(ids, docs_sorted))
        texts_ = b[text_col].take(pa.array(sel)).to_pylist()
        id_type = b[id_col].type  # ids keep their own dtype (strings ok)
        out_sh, out_id, out_n = [], [], []
        for did, t in zip(ids[sel], texts_):
            sh = char_shingles(t)
            out_sh.append(sh.view(np.int64))
            out_id.append(np.repeat(did, len(sh)))
            out_n.append(np.full(len(sh), len(sh), dtype=np.int32))
        if not out_sh:
            return pa.table(
                {
                    "sh": pa.array([], pa.int64()),
                    "doc": pa.array([], id_type),
                    "n_sh": pa.array([], pa.int32()),
                    "spart": pa.array([], pa.int32()),
                }
            )
        sh_all = np.concatenate(out_sh)
        return pa.table(
            {
                "sh": pa.array(sh_all, pa.int64()),
                "doc": pa.array(np.concatenate(out_id), id_type),
                "n_sh": pa.array(np.concatenate(out_n), pa.int32()),
                "spart": pa.array(
                    (np.abs(sh_all) % n_vparts).astype(np.int32), pa.int32()
                ),
            }
        )

    def _co_pairs(g: pd.DataFrame) -> pd.DataFrame:
        _, pairs = broadcast_get(cand_ref)
        a = pairs.merge(
            g.rename(columns={"doc": "doc_a", "n_sh": "na"}), on="doc_a"
        )
        i = a.merge(
            g.rename(columns={"doc": "doc_b", "n_sh": "nb"}),
            on=["doc_b", "sh"],
        )
        if i.empty:
            dt = str(pairs["doc_a"].dtype)
            return _typed_empty(
                {"doc_a": dt, "doc_b": dt, "na": "int32", "nb": "int32"}
            )
        return i[["doc_a", "doc_b", "na", "nb"]]

    def _with_pair_part(batch: pa.Table) -> pa.Table:
        from ..partition import stable_pair_partition

        part = stable_pair_partition(
            batch["doc_a"].to_numpy(zero_copy_only=False),
            batch["doc_b"].to_numpy(zero_copy_only=False),
            n_vparts,
        )
        return batch.append_column(
            "ppart", pa.array(part.astype(np.int32), pa.int32())
        )

    def _pair_agg(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("na", "size"), na=("na", "max"), nb=("nb", "max")
        )
        jac = s["inter"] / (s["na"] + s["nb"] - s["inter"])
        keep = (jac >= threshold).to_numpy()
        return pd.DataFrame(
            {
                "doc_a": s["doc_a"].to_numpy()[keep],
                "doc_b": s["doc_b"].to_numpy()[keep],
                "jaccard": jac.to_numpy()[keep],
            }
        )

    out = (
        docs_ds.map_batches(
            _cand_shingles, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("spart")
        .map_groups(_co_pairs, batch_format="pandas")
        .map_batches(
            _with_pair_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("ppart")
        .map_groups(_pair_agg, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        dt = str(cand["doc_a"].dtype)
        return _typed_empty({"doc_a": dt, "doc_b": dt, "jaccard": "float64"})
    if pd.api.types.is_integer_dtype(cand["doc_a"].dtype):
        out["doc_a"] = out["doc_a"].astype("int64")
        out["doc_b"] = out["doc_b"].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


_ASCII_WS = " \t\n\r\x0b\x0c"
_ASCII_WS_RE = re.compile(r"\s+", re.ASCII)


def word_ngrams(text: str, n: int = 3) -> set:
    """Distinct word n-grams of lower(trim(text)) split on ASCII
    whitespace.

    Tokenization mirrors the SQL oracles exactly (CLAUDE.md explicit-ASCII
    invariant): ``regexp_split_to_array(lower(trim(text, <ascii ws>)),
    '[ \\t\\n\\r\\v\\f]+')`` — python's default str.split() is
    unicode-aware and would diverge on e.g. \xa0."""
    w = _ASCII_WS_RE.split(text.strip(_ASCII_WS).lower())
    w = [t for t in w if t]
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _gram_hash64(gram: str) -> int:
    """Deterministic 64-bit gram id (collision odds ~n^2/2^64: negligible)."""
    return int.from_bytes(
        hashlib.blake2b(gram.encode("utf-8"), digest_size=8).digest(), "little"
    ) - (1 << 63)


def ngram_jaccard_pairs(
    docs_ds,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: Optional[int] = None,
    n_parts: int = 64,
    as_dataset: bool = False,
    metric: str = "jaccard",
):
    """Exact word-n-gram Jaccard near-duplicate pairs, fully distributed.

    A set-similarity join in pure Ray Data (no all-pairs step anywhere):

      1. map_batches: per doc, distinct word n-grams -> exploded
         (gram_hash, doc_id, n_grams_of_doc) rows. Carrying the doc's gram
         count on every row costs one int32 per gram but ELIMINATES the
         final count join entirely (a join would be two more all-to-all
         exchanges; the count is immutable per doc so max() recovers it).
      2. hash-partition grams; per partition a vectorized pandas self-merge
         emits co-occurring (doc_a, doc_b, na, nb) pairs. Any pair with
         jaccard > 0 shares a gram, so candidate generation is lossless.
      3. hash-partition pairs; per partition a vectorized pandas aggregate
         counts co-occurrences (= exact intersection |A ∩ B|), computes
         jaccard = i / (na + nb - i) and filters >= threshold in place.

    Everything that shuffles is small fixed-width ints - text never moves.
    At 10^12 docs the one hazard is a stop-gram bucket (a gram shared by k
    docs emits k^2/2 pairs); ``max_df`` caps it at the cost of exactness
    only for pairs whose every shared gram is a stop-gram - irrelevant
    above any useful threshold, and off by default for oracle parity.

    Returns pandas (doc_a, doc_b, jaccard), doc_a < doc_b, sorted.
    With ``as_dataset=True`` the surviving pairs stay a DATASET (unsorted,
    dtypes as produced) — the scale mode for callers that feed the pairs
    into a downstream join instead of collecting them.
    """

    def _grams(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        # per-gram blake2b hashing is the unavoidable Python work; the
        # explode itself is np.repeat over per-doc gram counts (per-gram
        # triple-appends measured as the stage's tail at sf0.1)
        hashes = []
        lens = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            grams = word_ngrams(t, n)
            if grams:
                lens[i] = len(grams)
                hashes.append(
                    np.fromiter(
                        (_gram_hash64(g) for g in grams),
                        dtype=np.int64,
                        count=len(grams),
                    )
                )
        gram_col = (
            np.concatenate(hashes) if hashes else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                "gram": pa.array(gram_col, pa.int64()),
                id_col: pa.array(
                    np.repeat(ids.astype(np.int64), lens), pa.int64()
                ),
                "n_grams": pa.array(
                    np.repeat(lens, lens).astype(np.int32), pa.int32()
                ),
            }
        )

    grams = docs_ds.map_batches(_grams, batch_format="pyarrow", zero_copy_batch=True)

    # Pair generation: hash-partition GRAMS into ~n_parts buckets and run a
    # vectorized pandas self-merge per partition. One map_groups invocation
    # per PARTITION (dozens), not per gram (millions) - per-group Python
    # dispatch overhead was measured 60x slower than the merge itself.
    def _with_part(batch: pa.Table) -> pa.Table:
        part = np.abs(batch["gram"].to_numpy(zero_copy_only=False)) % n_parts
        return batch.append_column("part", pa.array(part.astype(np.int32), pa.int32()))

    def _partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if max_df is not None:
            g = g[g.groupby("gram")["gram"].transform("size") <= max_df]
        m = g.merge(g, on="gram", suffixes=("_l", "_r"))
        m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
        return pd.DataFrame(
            {
                "doc_a": m[f"{id_col}_l"].to_numpy(),
                "doc_b": m[f"{id_col}_r"].to_numpy(),
                "na": m["n_grams_l"].to_numpy(),
                "nb": m["n_grams_r"].to_numpy(),
            }
        )

    # Intersection counting: the same hash-partition trick again. A Ray
    # groupby over millions of TINY (doc_a, doc_b) groups pays per-group
    # overhead (measured 100x slower than this); instead partition pairs by
    # hash(doc_a, doc_b), pandas-aggregate each partition vectorized, and
    # apply the jaccard threshold INSIDE the partition so only surviving
    # pairs ever leave the workers.
    def _with_pair_part(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.abs(a * np.int64(1000003) + b) % n_parts
        return batch.append_column(
            "ppart", pa.array(part.astype(np.int32), pa.int32())
        )

    def _pair_agg(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("na", "size"), na=("na", "max"), nb=("nb", "max")
        )
        if metric == "containment":
            # max-direction containment |A∩B| / min(|A|,|B|): catches a
            # short doc wholly embedded in a long one, which jaccard's
            # union denominator dilutes below any usable threshold
            val = s["inter"] / np.minimum(s["na"], s["nb"])
        else:
            val = s["inter"] / (s["na"] + s["nb"] - s["inter"])
        keep = val >= threshold
        return pd.DataFrame(
            {
                "doc_a": s["doc_a"].to_numpy()[keep],
                "doc_b": s["doc_b"].to_numpy()[keep],
                metric: val.to_numpy()[keep],
            }
        )

    pairs_ds = (
        grams.map_batches(_with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_partition_pairs, batch_format="pandas")
        .map_batches(_with_pair_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ppart")
        .map_groups(_pair_agg, batch_format="pandas")
    )
    if as_dataset:
        return pairs_ds
    df = pairs_ds.to_pandas()
    if df.empty:
        return _typed_empty({"doc_a": "int64", "doc_b": "int64", metric: "float64"})
    df["doc_a"] = df["doc_a"].astype("int64")
    df["doc_b"] = df["doc_b"].astype("int64")
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _word_bit_matrix(uniq: np.ndarray) -> np.ndarray:
    """Unique-word array -> (u, 64) ±1 int32 contribution rows, from ONE
    vectorized 64-bit hash per word (pd.util.hash_array). The prior
    per-word blake2b Python loop was the signature stage's dominant cost:
    every worker re-paid it for its whole block vocabulary (a memo cache
    only amortizes within a worker), measured ~3x the warm batch time."""
    h = pd.util.hash_array(uniq)  # deterministic uint64 per word
    bits = np.unpackbits(
        h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    return np.where(bits == 1, np.int32(1), np.int32(-1))


def _word_bits(w: str) -> np.ndarray:
    return _word_bit_matrix(np.array([w], dtype=object))[0].astype(np.int64)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace words (vectorized-hash word bits)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in normalize_text(text).split(" "):
        if w:
            acc += _word_bits(w)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, text_col="text", id_col="doc_id") -> pa.Table:
    """Vectorized SimHash: normalize + split via pandas str ops, hash only
    UNIQUE words (factorize; Zipf makes this a small set) in one
    vectorized pass, accumulate the ±1 contributions per doc with one
    reduceat, pack sign bits with packbits. Bit-identical to simhash64
    per doc (pinned in tests)."""
    texts = batch[text_col].to_pandas().reset_index(drop=True)
    n = len(texts)
    acc = np.zeros((n, 64), dtype=np.int64)
    words = (
        texts.str.replace(_WS_RE_SIM, " ", regex=True).str.lower()
        .str.split(" ")
        .explode()
    )
    words = words[words.notna() & (words != "")]
    if len(words):
        doc_idx = words.index.to_numpy()  # nondecreasing (explode order)
        codes, uniq = pd.factorize(words.to_numpy())
        bit_mat = _word_bit_matrix(uniq)
        # int32 contributions: |acc| <= words-per-doc, and reduceat keeps
        # the operand dtype (int8 would silently wrap past 127 aligned
        # word bits; int32 halves the int64 memory traffic)
        contrib = bit_mat[codes]
        starts = np.r_[0, np.flatnonzero(doc_idx[1:] != doc_idx[:-1]) + 1]
        acc[doc_idx[starts]] = np.add.reduceat(contrib, starts, axis=0)
    hs = np.packbits(acc > 0, axis=1, bitorder="little").view(np.uint64).ravel()
    return pa.table(
        {
            id_col: batch[id_col],
            "simhash": pa.array(hs, pa.uint64()),
        }
    )


def simhash_near_pairs(
    docs_ds,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    max_bucket: Optional[int] = 200,
):
    """Near-dup pairs by SimHash: LSH on bit chunks + exact hamming verify.

    Pigeonhole: splitting 64 bits into (max_hamming + 1) chunks guarantees a
    pair within the distance agrees on at least one chunk, so candidate
    generation has no false negatives; verification within buckets removes
    false positives.

    Fully distributed - no signature table ever reaches the driver:
    signatures -> explode one row per (chunk, chunk_key) carrying the full
    signature -> groupby buckets -> hamming-verified pairs inside
    map_groups, emitted ONLY from the pair's FIRST matching chunk. Both
    sides' full signatures are in hand, so "does an earlier chunk also
    match" is pure arithmetic — a pair found in several chunks is emitted
    exactly once, with no pair-dedup shuffle at all (hamming is a function
    of the two signatures, identical in every copy, so the dropped Min
    aggregate was pure dedupe; this raw composite-key groupby was the
    suite's perennial slowest-LSH-query overhead). Everything shuffled is
    fixed-width ints.

    ``max_bucket`` note: first-chunk emission decides by KEY equality, so
    a pair whose first shared chunk sits in a saturated (capped) bucket is
    suppressed even if a later chunk's bucket is small — the cap is lossy
    by contract; pass ``max_bucket=None`` for the lossless guarantee.
    """
    # pigeonhole needs max_hamming+1 chunks for the no-false-negative
    # guarantee, which a 64-bit signature can only provide for
    # max_hamming <= 63 (at >= 64 every pair qualifies and LSH is the
    # wrong tool - that is an all-pairs cross join)
    if max_hamming >= 64:
        raise ValueError(
            "max_hamming must be < 64 for 64-bit SimHash LSH; "
            ">= 64 means every pair matches (use a cross join)"
        )
    n_chunks = max_hamming + 1
    bounds = [round(i * 64 / n_chunks) for i in range(n_chunks + 1)]

    def _explode(batch: pa.Table) -> pa.Table:
        sigs = simhash_batch(batch, id_col=id_col)
        s = sigs["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nd = len(s)
        # fixed n_chunks rows per doc: the whole explode is numpy
        # tile/repeat plus an Arrow take for the id column (per-row
        # extend() loops were the stage's Python tail)
        keys = _chunk_keys(s).T
        idx = np.tile(np.arange(nd, dtype=np.int64), n_chunks)
        return pa.table(
            {
                "chunk": pa.array(
                    np.repeat(np.arange(n_chunks, dtype=np.int32), nd),
                    pa.int32(),
                ),
                "chunk_key": pa.array(keys.ravel(), pa.int64()),
                id_col: sigs[id_col].take(pa.array(idx)),
                "sig": pa.array(np.tile(s.view(np.int64), n_chunks), pa.int64()),
            }
        )

    # One map_groups invocation per hash PARTITION of buckets (not per
    # bucket): vectorized pandas self-merge + SWAR popcount. Same shape as
    # ngram_jaccard_pairs - per-group Python dispatch is the enemy.
    n_parts = 64

    def _with_part(batch: pa.Table) -> pa.Table:
        k = batch["chunk_key"].to_numpy(zero_copy_only=False)
        c = batch["chunk"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.abs(k * np.int64(1000003) + c) % n_parts
        return batch.append_column(
            "part", pa.array(part.astype(np.int32), pa.int32())
        )

    def _chunk_keys(s: np.ndarray) -> np.ndarray:
        """uint64 signatures -> (len(s), n_chunks) int64 chunk keys."""
        out = np.empty((len(s), n_chunks), dtype=np.int64)
        for chunk in range(n_chunks):
            lo, hi = bounds[chunk], bounds[chunk + 1]
            out[:, chunk] = (
                (s >> np.uint64(lo)) & np.uint64((1 << (hi - lo)) - 1)
            ).astype(np.int64)
        return out

    def _partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if max_bucket is not None:
            g = g[
                g.groupby(["chunk", "chunk_key"])["chunk"].transform("size")
                <= max_bucket
            ]
        m = g.merge(g, on=["chunk", "chunk_key"], suffixes=("_l", "_r"))
        m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
        sl = m["sig_l"].to_numpy().astype(np.int64).view(np.uint64)
        sr = m["sig_r"].to_numpy().astype(np.int64).view(np.uint64)
        ham = _popcount64(sl ^ sr).astype(np.int64)
        # emit each pair only from its FIRST matching chunk: recompute the
        # earlier chunks' keys for both sides (pure shifts/masks on the
        # carried signatures) and drop the copy if any earlier chunk also
        # matched — global dedupe with zero extra shuffle
        c = m["chunk"].to_numpy().astype(np.int64)
        kl, kr = _chunk_keys(sl), _chunk_keys(sr)
        earlier = (kl == kr) & (
            np.arange(n_chunks, dtype=np.int64)[None, :] < c[:, None]
        )
        keep = (ham <= max_hamming) & ~earlier.any(axis=1)
        return pd.DataFrame(
            {
                "doc_a": m[f"{id_col}_l"].to_numpy()[keep],
                "doc_b": m[f"{id_col}_r"].to_numpy()[keep],
                "hamming": ham[keep],
            }
        )

    out = (
        docs_ds.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_partition_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return _typed_empty({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
    out["hamming"] = out["hamming"].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def embedding_dup_pairs_tiles(
    emb_ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """EXACT distributed embedding near-dup: tile cross-product.

    The oracle semantic (all pairs with cosine >= t) is inherently O(n^2)
    flops; what scales is distributing the tiles. Normalize per batch
    (map_batches, vectorized), materialize the narrow (id, vec) dataset,
    then launch one Ray task per block-pair (i <= j) computing a tile
    matmul; only survivor (id_a, id_b, cosine) rows return to the driver.
    With K blocks that is K(K+1)/2 independent tasks — perfectly parallel,
    driver memory bounded by the survivor count, vectors shipped at most
    K times each via the object store (zero-copy block refs, no
    re-serialization per task pair).

    This is the registered/graded path: exact (matches the oracle on any
    corpus) yet distributed. embedding_dup_pairs(exhaustive=False) keeps
    the approximate hyperplane-LSH variant for corpora where even the tile
    cross-product is too expensive.
    """
    import ray

    from .similarity import _normalize, _to_matrix

    def _norm(b: pa.Table) -> pa.Table:
        x = _normalize(_to_matrix(b[vec_col]))
        n, d = (x.shape[0], x.shape[1]) if x.ndim == 2 and len(x) else (0, 0)
        # plain large_list<double>, NOT fixed_size_list: an empty block
        # can't know d, mixing fixed_size_list widths across blocks breaks
        # schema unification, and int64 offsets avoid the 2^31-element
        # ceiling a big embedding block would hit with list<double>
        offsets = pa.array(np.arange(n + 1, dtype=np.int64) * d, pa.int64())
        vec = pa.LargeListArray.from_arrays(
            offsets, pa.array(x.ravel(), pa.float64())
        )
        return pa.table({id_col: b[id_col].cast(pa.int64()), "v": vec})

    mat = emb_ds.map_batches(
        _norm, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    block_refs = [
        r for bundle in mat.iter_internal_ref_bundles() for r in bundle.block_refs
    ]

    @ray.remote(num_returns=1)
    def _tile(a, b, same: bool):
        if hasattr(a, "to_arrow"):  # pandas-backed block, normalize to arrow
            a = pa.Table.from_pandas(a)
        if hasattr(b, "to_arrow"):
            b = pa.Table.from_pandas(b)
        # empty blocks can be schema-less (no columns at all)
        if (
            a.num_rows == 0 or b.num_rows == 0
            or "v" not in a.column_names or "v" not in b.column_names
        ):
            return _typed_empty(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        xa, ia = _to_matrix(a["v"]), a[id_col].combine_chunks().to_numpy()
        xb, ib = _to_matrix(b["v"]), b[id_col].combine_chunks().to_numpy()
        sims = xa @ xb.T
        mask = sims >= threshold
        if same:
            mask &= ia[:, None] < ib[None, :]
        else:
            mask &= ia[:, None] != ib[None, :]
        ra, rb = np.where(mask)
        va, vb = ia[ra], ib[rb]
        swap = va > vb
        va2 = np.where(swap, vb, va)
        vb2 = np.where(swap, va, vb)
        return pd.DataFrame(
            {"vec_a": va2, "vec_b": vb2, "cosine": sims[ra, rb]}
        )

    futs = []
    for i, ra_ in enumerate(block_refs):
        for j in range(i, len(block_refs)):
            futs.append(_tile.remote(ra_, block_refs[j], i == j))
    parts = ray.get(futs)
    out = pd.concat(parts, ignore_index=True) if parts else _typed_empty(
        {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
    )
    if out.empty:
        return _typed_empty({"vec_a": "int64", "vec_b": "int64", "cosine": "float64"})
    out = out.drop_duplicates(["vec_a", "vec_b"])
    out["vec_a"] = out["vec_a"].astype("int64")
    out["vec_b"] = out["vec_b"].astype("int64")
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def auto_planes(n_vecs: int, target_bucket: int = 256) -> int:
    """Per-band hyperplane count that keeps EXPECTED bucket occupancy near
    ``target_bucket``: n / 2^planes ~= target. Grows with log2(corpus), so
    the per-bucket O(k^2) verify stays O(target^2) at any scale (a fixed
    plane count re-becomes all-pairs as the corpus grows). Clamped to
    [4, 30]: <4 planes is uselessly coarse on any corpus, 30 keeps the
    band key in int32-safe range."""
    return int(min(30, max(4, np.ceil(np.log2(max(n_vecs, 1) / target_bucket)))))


def embedding_dup_pairs(
    emb_ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: Optional[int] = None,
    seed: int = 7,
    exhaustive: bool = False,
    n_bands: int = 4,
    target_bucket: int = 256,
):
    """Embedding-cosine near-dup pairs.

    exhaustive=True: all-pairs cosine via numpy matmul on the driver
    (exact; the small-scale / oracle-comparable path - all-pairs is
    inherently quadratic, so there is nothing to distribute but the
    matmul tiles; embedding_dup_pairs_tiles IS that distribution and is
    the path registered with the driver).
    exhaustive=False: BANDED random-hyperplane LSH, exact cosine verify
    within buckets - fully distributed and sub-quadratic but approximate
    (a pair can disagree on some plane in every band and be missed).
    ``n_bands`` independent plane sets each key a bucket; a pair is a
    candidate if it agrees on ALL planes of ANY band (the minhash banding
    shape: bands buy recall, planes-per-band buy precision/occupancy).

    ``n_planes`` is the per-band plane count. Default None auto-scales it
    to the corpus: ceil(log2(n / target_bucket)) planes keep EXPECTED
    bucket occupancy near ``target_bucket`` regardless of corpus size, so
    the per-bucket O(k^2) verify stays O(target^2) at 10^9 vectors — the
    previous fixed 256-bucket key grew occupancy linearly with the corpus
    and re-became all-pairs at scale.
    """
    if exhaustive:
        mats, ids = [], []
        for b in emb_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
            mats.append(np.array(b[vec_col].to_pylist(), dtype=np.float64))
            ids.extend(b[id_col].to_pylist())
        x = np.vstack(mats)
        ids = np.array(ids)
        xn = x / np.maximum(np.linalg.norm(x, axis=1), 1e-12)[:, None]
        sims = xn @ xn.T
        ia, ib = np.where(np.triu(sims >= threshold, k=1))
        rows = [
            (int(ids[a_]), int(ids[b_]), float(sims[a_, b_]))
            for a_, b_ in zip(ia, ib)
        ]
        df = pd.DataFrame(rows, columns=["vec_a", "vec_b", "cosine"])
        swap = df["vec_a"] > df["vec_b"]
        df.loc[swap, ["vec_a", "vec_b"]] = df.loc[swap, ["vec_b", "vec_a"]].values
        return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    if n_planes is None:
        # the count() sizing pass and the map_batches explode both consume
        # the dataset — materialize first or the whole upstream pipeline
        # runs twice (CLAUDE.md consumed-twice rule)
        emb_ds = emb_ds.materialize()
        n_planes = auto_planes(emb_ds.count(), target_bucket)
    if not 1 <= n_planes <= 30:
        raise ValueError(f"n_planes must be in [1, 30], got {n_planes}")
    pow2 = (1 << np.arange(n_planes, dtype=np.int64))

    _planes: Dict = {}

    def _keyed(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "band_key": pa.array([], pa.int64()),
                    id_col: b[id_col],
                    "vec": pa.array([], pa.large_list(pa.float64())),
                    "keys": pa.array([], pa.large_list(pa.int64())),
                }
            )
        x = np.array(b[vec_col].to_pylist(), dtype=np.float64)
        xn = x / np.maximum(np.linalg.norm(x, axis=1), 1e-12)[:, None]
        if "p" not in _planes:  # deterministic; built once per worker
            _planes["p"] = np.random.default_rng(seed).standard_normal(
                (x.shape[1], n_bands * n_planes)
            )
        signs = (xn @ _planes["p"]) > 0  # (nd, n_bands * n_planes)
        nd = len(xn)
        # per-band int key from that band's sign bits; explode one row per
        # (band, band_key) via arithmetic repeat/take (no per-row appends)
        keys = np.empty((n_bands, nd), dtype=np.int64)
        for band in range(n_bands):
            keys[band] = signs[:, band * n_planes:(band + 1) * n_planes] @ pow2
        idx = np.tile(np.arange(nd, dtype=np.int64), n_bands)
        flat = pa.array(xn.ravel(), pa.float64())
        offsets = pa.array(
            np.arange(nd + 1, dtype=np.int64) * xn.shape[1], pa.int64()
        )
        vecs = pa.LargeListArray.from_arrays(offsets, flat)
        # every copy also carries the doc's FULL band-key vector (n_bands
        # int64s next to d float64s - noise) so pair emission can check
        # "did an earlier band already match" arithmetically
        kall = pa.LargeListArray.from_arrays(
            pa.array(np.arange(nd + 1, dtype=np.int64) * n_bands, pa.int64()),
            pa.array(keys.T.ravel(), pa.int64()),
        )
        take = pa.array(idx)
        return pa.table(
            {
                "band": pa.array(
                    np.repeat(np.arange(n_bands, dtype=np.int32), nd), pa.int32()
                ),
                "band_key": pa.array(keys.ravel(), pa.int64()),
                id_col: b[id_col].combine_chunks().take(take),
                "vec": vecs.take(take),
                "keys": kall.take(take),
            }
        )

    # one map_groups invocation per hash PARTITION of (band, bucket) keys,
    # not per bucket: a Ray groupby over n_bands * 2^n_planes tiny groups
    # is the per-group-dispatch anti-pattern (CLAUDE.md)
    n_parts = 64

    def _with_part(batch: pa.Table) -> pa.Table:
        from ..partition import stable_pair_partition

        part = stable_pair_partition(
            batch["band"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["band_key"].to_numpy(zero_copy_only=False),
            n_parts,
        )
        return batch.append_column(
            "part", pa.array(part.astype(np.int32), pa.int32())
        )

    def _partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for (band, _), gg in g.groupby(["band", "band_key"], sort=False):
            if len(gg) < 2:
                continue
            order = np.argsort(gg[id_col].to_numpy())
            ids = gg[id_col].to_numpy()[order]
            xn = np.array(gg["vec"].tolist(), dtype=np.float64)[order]
            sub = xn @ xn.T
            ia, ib = np.where(np.triu(sub >= threshold, k=1))
            if not len(ia):
                continue
            # emit each pair only from its FIRST shared band (the carried
            # band-key vectors make this pure arithmetic): a pair found by
            # several bands dedupes with zero extra shuffle, and cosine is
            # a function of the two vectors - identical in every copy
            if band > 0:
                kk = np.array(gg["keys"].tolist(), dtype=np.int64)[order]
                fresh = ~(kk[ia, :band] == kk[ib, :band]).any(axis=1)
                ia, ib = ia[fresh], ib[fresh]
                if not len(ia):
                    continue
            frames.append(
                pd.DataFrame(
                    {
                        "vec_a": ids[ia].astype(np.int64),
                        "vec_b": ids[ib].astype(np.int64),
                        "cosine": sub[ia, ib],
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype="int64"),
                    "vec_b": pd.Series([], dtype="int64"),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    out = (
        emb_ds.map_batches(_keyed, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_partition_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return _typed_empty({"vec_a": "int64", "vec_b": "int64", "cosine": "float64"})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Winnowing (MOSS-style) document fingerprints
# ---------------------------------------------------------------------------

_WINNOW_A = np.int64(1 << 21)  # gram-combine radix; 3 x 20-bit ids < 2^62


def winnow_word_r20(word: str) -> int:
    """Deterministic 20-bit word id for winnowing gram codes — small enough
    that a 3-word gram combines into one overflow-free int64 with identical
    arithmetic in Python and SQL (the oracle embeds these values per vocab
    word, the lang-id/simhash shared-table pattern)."""
    return int.from_bytes(
        hashlib.blake2b(word.encode("utf-8"), digest_size=7).digest(), "little"
    ) % (1 << 20)


def winnow_fingerprint_pairs(
    docs_ds,
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int = 64,
    max_df: Optional[int] = None,
    as_dataset: bool = False,
):
    """Winnowing fingerprint near-duplicate pairs (the MOSS scheme:
    Schleimer/Wilkerson/Aiken, SIGMOD'03): per document, every length-
    ``window`` window over the word ``k``-gram hash sequence contributes
    its MINIMUM hash; the distinct window minima are the document's
    fingerprints, and documents sharing >= ``min_shared`` fingerprints are
    reported with the shared count. A document with fewer than ``window``
    grams (but at least one) keeps the minimum of what it has, so every
    non-trivial document carries >= 1 fingerprint (the standard winnowing
    guarantee).

    Scale shape mirrors ngram_jaccard_pairs: per-batch fingerprinting is
    fully vectorized (one sliding-window minimum over the batch's
    concatenated gram array, doc boundaries masked via the exploded row
    index); what shuffles is (fp, doc_id) int64 rows, pair candidates come
    from the hash-partitioned self-merge, and shared counts aggregate in
    hash-partitioned pandas folds — text never moves, no all-pairs step.
    ``max_df`` caps boilerplate fingerprints (a fp shared by f docs emits
    f^2/2 candidates); off by default for oracle parity. Output is
    pair-cardinality: ``as_dataset=True`` keeps surviving pairs a Dataset
    (unsorted) for downstream joins — the scale mode, same contract as
    ngram_jaccard_pairs.
    """

    def _fps(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "fp": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch[text_col].to_pandas()
        lists = s.str.lower().str.strip(_ASCII_WS).str.split(_ASCII_WS_RE)
        ex = lists.explode()
        keep = ex.notna() & (ex != "")
        ex = ex[keep]
        if len(ex) < k:
            return empty
        doc_pos = ex.index.to_numpy().astype(np.int64)
        uniq, inv = np.unique(ex.to_numpy(), return_inverse=True)
        rvals = np.fromiter(
            (winnow_word_r20(w) for w in uniq), dtype=np.int64, count=len(uniq)
        )
        r = rvals[inv]
        same = doc_pos[: -(k - 1)] == doc_pos[k - 1 :]
        n_g = len(r) - k + 1
        g = r[:n_g].copy()
        for j in range(1, k):  # radix combine; k * 20 bits must fit int64
            g = g * _WINNOW_A + r[j : n_g + j]
        g = g[same]
        gdoc = doc_pos[: -(k - 1)][same]
        if len(g) == 0:
            return empty
        if len(g) >= window:
            sw = np.lib.stride_tricks.sliding_window_view(g, window)
            wmin = sw.min(axis=1)
            wvalid = gdoc[: len(g) - window + 1] == gdoc[window - 1 :]
            sel_doc = gdoc[: len(g) - window + 1][wvalid]
            sel_fp = wmin[wvalid]
        else:
            sel_doc = np.array([], dtype=np.int64)
            sel_fp = np.array([], dtype=np.int64)
        # docs with 1..window-1 grams keep the minimum of what they have
        udoc, starts = np.unique(gdoc, return_index=True)  # gdoc sorted
        counts = np.diff(np.append(starts, len(gdoc)))
        short = counts < window
        if short.any():
            smin = np.minimum.reduceat(g, starts)[short]
            sel_doc = np.concatenate([sel_doc, udoc[short]])
            sel_fp = np.concatenate([sel_fp, smin])
        df = pd.DataFrame(
            {"fp": sel_fp, id_col: ids[sel_doc]}
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    fps = docs_ds.map_batches(
        _fps, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def _with_part(batch: pa.Table) -> pa.Table:
        part = batch["fp"].to_numpy(zero_copy_only=False) % n_parts
        return batch.append_column(
            "part", pa.array(part.astype(np.int32), pa.int32())
        )

    def _partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if max_df is not None:
            g = g[g.groupby("fp")["fp"].transform("size") <= max_df]
        m = g.merge(g, on="fp", suffixes=("_l", "_r"))
        m = m[m[f"{id_col}_l"] < m[f"{id_col}_r"]]
        return pd.DataFrame(
            {
                "doc_a": m[f"{id_col}_l"].to_numpy(),
                "doc_b": m[f"{id_col}_r"].to_numpy(),
            }
        )

    cand = (
        fps.map_batches(_with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_partition_pairs, batch_format="pandas")
    )

    def _with_pair_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_a" not in batch.column_names:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "ppart": pa.array([], pa.int32()),
                }
            )
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.abs(a * np.int64(1000003) + b) % n_parts
        return batch.append_column(
            "ppart", pa.array(part.astype(np.int32), pa.int32())
        )

    def _pair_agg(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["doc_a", "doc_b"], as_index=False).size()
        s = s[s["size"] >= min_shared]
        return s.rename(columns={"size": "n_shared"})

    pairs = (
        cand.map_batches(
            _with_pair_part, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("ppart")
        .map_groups(_pair_agg, batch_format="pandas")
    )
    if as_dataset:
        return pairs
    out = pairs.to_pandas()
    if len(out) == 0 or "doc_a" not in out.columns:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "n_shared": pd.Series([], dtype="int64"),
            }
        )
    for c in ("doc_a", "doc_b", "n_shared"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
