"""Benchmark decontamination: n-gram overlap flagging.

The standard pre-training hygiene pass (GPT-3 appendix C shape: a doc is
contaminated if it shares any 13-gram with an evaluation set): build the
gram set of a SMALL benchmark side once, broadcast it, and stream the
corpus through a vectorized membership pass — per-source contaminated
counts come out of the usual partial-fold.

Gram semantics are CHARACTER windows (``substring`` in the oracle SQL),
computed over UTF-32 code points so python and SQL agree on any text.
Windows never cross document boundaries (same offsets masking as the
token-bigram stage).

Scale notes: the benchmark side is collected and broadcast — that is the
contract (eval sets are tiny versus the corpus); a benchmark too big to
broadcast would go behind a bloom prefilter (state/bloom.py) with an
exact verify on maybes. The corpus side only ever streams; what shuffles
is per-block (source, n, n_hit) partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _gram_views(texts: list, gram: int):
    """Per-block (windows_void, doc_idx) for all length-``gram`` character
    windows, boundary-masked. Returns (None, None) when no window fits."""
    if not texts:
        return None, None
    bufs = [t.encode("utf-32-le") for t in texts]
    lens = np.fromiter((len(b) // 4 for b in bufs), dtype=np.int64, count=len(bufs))
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint32)
    if len(flat) < gram:
        return None, None
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    wins = np.lib.stride_tricks.sliding_window_view(flat, gram)
    starts = np.arange(len(wins))
    # a window starting at s belongs to doc d iff s+gram <= offsets[d+1]
    doc_of_start = np.searchsorted(offsets, starts, side="right") - 1
    valid = (starts + gram) <= offsets[doc_of_start + 1]
    wins = np.ascontiguousarray(wins[valid])
    void = wins.view(np.dtype((np.void, gram * 4))).ravel()
    return void, doc_of_start[valid]


def contamination_counts(
    docs_ds,
    bench_mod: int = 97,
    gram: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    max_bench_grams: int = 50_000_000,
) -> pd.DataFrame:
    """Per-``group_col`` (n_docs, n_contaminated) over the non-benchmark
    corpus, where benchmark docs are ``doc_id % bench_mod == 0`` and a doc
    is contaminated iff it shares any ``gram``-character window with any
    benchmark doc."""
    import ray

    from ..broadcast import broadcast_get

    def _is_bench(b: pa.Table):
        ids = pc.cast(b[id_col], pa.int64())
        # ids % mod == 0, via pc (no arithmetic in Ray's filter-expr parser)
        return pc.equal(
            pc.subtract(
                ids, pc.multiply(pc.divide(ids, bench_mod), bench_mod)
            ),
            0,
        )

    bench = docs_ds.map_batches(
        lambda b: b.filter(_is_bench(b)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _bench_grams(b: pa.Table) -> pa.Table:
        void, _ = _gram_views(b[text_col].to_pylist(), gram)
        if void is None:
            return pa.table({"g": pa.array([], pa.binary())})
        u = np.unique(void)
        return pa.table({"g": pa.array([bytes(x) for x in u], pa.binary())})

    parts = [
        b.to_pandas()
        for b in bench.map_batches(
            _bench_grams, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if parts:
        allg = pd.concat(parts, ignore_index=True)["g"]
        bench_sorted = np.sort(
            np.frombuffer(b"".join(allg), dtype=np.dtype((np.void, gram * 4)))
        ) if len(allg) else None
        if bench_sorted is not None:
            bench_sorted = np.unique(bench_sorted)
            if len(bench_sorted) > max_bench_grams:
                raise ValueError(
                    f"contamination_counts: benchmark gram set has "
                    f"{len(bench_sorted)} entries (> {max_bench_grams}) - "
                    "too big to broadcast; put the gram set behind a bloom "
                    "prefilter (state/bloom.py) with an exact verify on "
                    "the maybes"
                )
    else:
        bench_sorted = None
    ref = ray.put(bench_sorted)

    def _flag(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (ids % bench_mod) != 0
        b = b.filter(pa.array(keep))
        texts = b[text_col].to_pylist()
        n = len(texts)
        hit = np.zeros(n, dtype=bool)
        bs = broadcast_get(ref)
        if bs is not None and n:
            void, doc_idx = _gram_views(texts, gram)
            if void is not None and len(void):
                pos = np.searchsorted(bs, void)
                pos = np.minimum(pos, len(bs) - 1)
                m = bs[pos] == void
                if m.any():
                    hit[np.unique(doc_idx[m])] = True
        df = pd.DataFrame(
            {group_col: b[group_col].to_pandas(), "hit": hit.astype(np.int64)}
        )
        g = df.groupby(group_col, as_index=False).agg(
            n_docs=("hit", "size"), n_contaminated=("hit", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = pd.concat(
        [
            b.to_pandas()
            for b in docs_ds.map_batches(
                _flag, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        ],
        ignore_index=True,
    )
    out = folded.groupby(group_col, as_index=False)[
        ["n_docs", "n_contaminated"]
    ].sum()
    for c in ("n_docs", "n_contaminated"):
        out[c] = out[c].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)
