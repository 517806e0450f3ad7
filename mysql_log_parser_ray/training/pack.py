"""Sequence packing: deterministic assignment of documents to
fixed-token-budget training packs.

Semantics (offset binning — the streaming-concatenation convention):
within each key (source shard), documents ordered by id are laid
head-to-tail on a token tape; a document's pack is the bin its FIRST
token falls in (``tok_offset // budget``). Documents may span bin
boundaries — the loader splits them at materialization time; what this
operator pins down is the deterministic (doc -> pack, offset) map, which
is what resumable pack-writing and run-to-run reproducibility need.
Fully order-defined, so it is SQL-expressible (a windowed cumulative sum)
and identical across runs and cluster sizes.

Scale shape (the sessionize pattern, stages/window.py): token counts are
computed per input batch with the shared vectorized ``ws_token_counts``,
so only (key, id, n_tok) int rows shuffle — text never moves. Keys
hash-partition into ``n_parts`` coarse buckets (null/dtype-stable
``stable_partition``) and each partition packs ALL of its keys in one
lexsort + grouped-cumsum pass (break-index arithmetic, no per-key Python
dispatch). Output is doc-cardinality: ``as_dataset=True`` keeps it
distributed; collecting is the caller's choice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_sequences(
    docs_ds,
    budget_tokens: int = 2048,
    key_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
    as_dataset: bool = False,
):
    """Returns (key, doc_id, n_tok, tok_offset, pack_id) rows — one per
    doc. ``tok_offset`` is the doc's starting position on its key's token
    tape; ``pack_id = tok_offset // budget_tokens``."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")

    from ..partition import stable_partition
    from .text import ws_token_counts

    def _narrow(batch: pa.Table) -> pa.Table:
        n = ws_token_counts(pd.Series(batch[text_col].to_pandas()))
        part = pa.array(stable_partition(batch[key_col], n_parts), pa.int64())
        return pa.table(
            {
                "_part": part,
                key_col: batch[key_col],
                id_col: batch[id_col],
                "n_tok": pa.array(n, pa.int64()),
            }
        )

    empty = pd.DataFrame(
        {
            key_col: pd.Series([], dtype="object"),
            id_col: pd.Series([], dtype="int64"),
            "n_tok": pd.Series([], dtype="int64"),
            "tok_offset": pd.Series([], dtype="int64"),
            "pack_id": pd.Series([], dtype="int64"),
        }
    )

    def _pack_part(g: pd.DataFrame) -> pd.DataFrame:
        # every key of this hash bucket, one vectorized pass
        if len(g) == 0:
            return empty
        codes, uniques = pd.factorize(g[key_col], use_na_sentinel=False)
        ids = g[id_col].to_numpy()
        n_tok = g["n_tok"].to_numpy()
        o = np.lexsort((ids, codes))
        codes, ids, n_tok = codes[o], ids[o], n_tok[o]
        excl = np.cumsum(n_tok) - n_tok  # partition-wide exclusive cumsum
        new_key = np.ones(len(codes), dtype=bool)
        new_key[1:] = codes[1:] != codes[:-1]
        # per-key tape offset = exclusive cumsum minus the key's base
        base = np.where(new_key, excl, 0)
        np.maximum.accumulate(base, out=base)
        off = (excl - base).astype(np.int64)
        return pd.DataFrame(
            {
                key_col: np.asarray(uniques)[codes],
                id_col: ids,
                "n_tok": n_tok.astype(np.int64),
                "tok_offset": off,
                "pack_id": off // budget_tokens,
            }
        )

    ds = (
        docs_ds.map_batches(_narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_part")
        .map_groups(_pack_part, batch_format="pandas")
    )
    if as_dataset:
        return ds
    out = ds.to_pandas()
    if out.empty:
        return empty
    return out.sort_values([key_col, id_col]).reset_index(drop=True)


def chunk_documents(
    docs_ds,
    chunk_tokens: int = 16,
    overlap: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_text: bool = False,
):
    """Sliding-window chunking for training prep: whitespace tokens,
    window ``chunk_tokens``, stride ``chunk_tokens - overlap``. A doc with
    n <= chunk_tokens tokens is one chunk; otherwise chunks start at
    0, stride, 2*stride, ... with ``n_chunks = 1 + ceil((n - chunk) /
    stride)`` — every token is covered and the final chunk may be short
    (always > 0 tokens by construction). Fully order-defined arithmetic,
    so it is SQL-expressible and partitioning-invariant.

    Scale shape: counts come from the shared vectorized
    ``ws_token_counts``; the explode is numpy repeat/arange (no joins, no
    shuffle — chunk rows stay in their producing block). Default output
    is the numeric (doc_id, chunk_seq, n_chunk_tokens) map; with_text=True
    additionally materializes each chunk's text (a per-row slice loop —
    at real scale the loader slices the pre-tokenized int arrays instead,
    and the numeric map here is what makes that slicing deterministic).

    Returns a Dataset (chunk-cardinality; collecting is the caller's
    choice).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    from .text import _WS_RE, ws_token_counts

    def _chunks(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # np.repeat crashes on 0-row blocks
            cols = {
                id_col: b[id_col],
                "chunk_seq": pa.array([], pa.int64()),
                "n_chunk_tokens": pa.array([], pa.int64()),
            }
            if with_text:
                cols["chunk_text"] = pa.array([], pa.string())
            return pa.table(cols)
        s = pd.Series(b[text_col].to_pandas())
        n = ws_token_counts(s).to_numpy()
        nch = np.where(
            n <= chunk_tokens,
            1,
            1 + np.ceil((n - chunk_tokens) / stride),
        ).astype(np.int64)
        rep = np.repeat(np.arange(len(n), dtype=np.int64), nch)
        seq = np.arange(rep.size, dtype=np.int64) - np.repeat(
            np.cumsum(nch) - nch, nch
        )
        ntok = np.minimum(chunk_tokens, n[rep] - seq * stride)
        ids = b[id_col].combine_chunks().take(pa.array(rep))
        cols = {
            id_col: ids,
            "chunk_seq": pa.array(seq, pa.int64()),
            "n_chunk_tokens": pa.array(ntok, pa.int64()),
        }
        if with_text:
            words = s.str.strip(" \t\n\r\x0b\x0c").str.split(_WS_RE)
            texts = [
                " ".join(words.iloc[d][q * stride: q * stride + chunk_tokens])
                for d, q in zip(rep, seq)
            ]
            cols["chunk_text"] = pa.array(texts, pa.string())
        return pa.table(cols)

    return docs_ds.map_batches(
        _chunks, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
