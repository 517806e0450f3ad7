"""queries()/oracle_sql() registrations for the training-data operators."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    from ..pipelines.queries import _blocks_for

    path = os.path.join(sf_dir, f"{table}.parquet")
    return rd.read_parquet(
        path, columns=columns, override_num_blocks=_blocks_for(path)
    )


# ---------------------------------------------------------------------------
# Ray implementations
# ---------------------------------------------------------------------------

def q_doc_token_counts(sf_dir: str):
    from ..stages.aggregate import grouped_counts
    from .text import ws_token_counts

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def _tok(batch: pa.Table) -> pa.Table:
        n = ws_token_counts(pd.Series(batch["text"].to_pandas()))
        return pa.table(
            {"source": batch["source"], "n_tok": pa.array(n, pa.int64())}
        )

    toks = ds.map_batches(_tok, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_counts(toks, keys=["source"], sum_col="n_tok")
    out = out.rename(columns={"n_rows": "n_docs", "n_tokens": "n_ws_tokens"})
    for c in ("n_docs", "n_ws_tokens"):
        out[c] = out[c].astype("int64")
    return out


def q_doc_chunks(sf_dir: str):
    """Sliding-window chunking (training/pack.py:chunk_documents): the
    deterministic (doc_id, chunk_seq, n_chunk_tokens) map at window 16 /
    overlap 4 — pure arithmetic over whitespace token counts, so the
    oracle recomputes it in closed form."""
    from .pack import chunk_documents

    from ..util import typed_empty

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = chunk_documents(ds, chunk_tokens=16, overlap=4).to_pandas()
    if "doc_id" not in out.columns or not len(out):
        return typed_empty(
            doc_id="int64", chunk_seq="int64", n_chunk_tokens="int64"
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "chunk_seq"]).reset_index(drop=True)


def q_docs_mixture_sample(sf_dir: str):
    """Equal-per-source mixture sampling (training/mix.py, alpha=0):
    integer-exact per-source cutoffs on doc_id % 10000, so the oracle
    recomputes the identical sample."""
    from .mix import source_mixture_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return source_mixture_sample(ds, alpha=0.0, denom=10_000)


def q_docs_near_dedup(sf_dir: str, drop_broadcast_limit: int = 5_000_000):
    """END-TO-END near-dup curation composite: n-gram-jaccard near-dup
    pair graph (threshold 0.5) -> connected components -> keep each
    cluster's minimum doc_id -> per-source (n_docs, n_kept). Pairs stay a
    Dataset into the label-propagation rounds; what collects is the
    CLUSTERED-doc map (dup-cardinality), and the drop set broadcasts with
    a fail-fast bound (past it, route the drop set through the
    curate-style left_anti join instead of a broadcast)."""
    from ..util import typed_empty
    from .dedup import ngram_jaccard_pairs
    from .graph import connected_components

    text_ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(text_ds, threshold=0.5, as_dataset=True)
    cc_ds = connected_components(pairs)
    n_clustered = cc_ds.count()
    if n_clustered > drop_broadcast_limit:
        raise ValueError(
            f"docs_near_dedup: {n_clustered} clustered docs exceed "
            f"drop_broadcast_limit={drop_broadcast_limit}; route the drop "
            "set through a left_anti join (curate.py shape) instead"
        )
    cc = cc_ds.to_pandas()
    if "node" in cc.columns and len(cc):
        drop = set(cc.loc[cc["node"] != cc["cluster_rep"], "node"].tolist())
    else:
        drop = set()

    import ray

    from ..broadcast import broadcast_get

    ref = ray.put(drop)

    def _partial(b: pa.Table) -> pa.Table:
        if "source" not in b.column_names:
            return pa.table({
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
            })
        dr = broadcast_get(ref)
        src = pd.Series(b["source"].to_pandas())
        ids = b["doc_id"].to_pandas()
        kept = ~ids.isin(dr)
        g = pd.DataFrame({"source": src, "kept": kept.astype("int64")})
        out = g.groupby("source", as_index=False).agg(
            n_docs=("kept", "size"), n_kept=("kept", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "documents", columns=["doc_id", "source"])
        .map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_kept", alias_name="n_kept"))
        .to_pandas()
    )
    if "source" not in out.columns or not len(out):
        return typed_empty(source="object", n_docs="int64", n_kept="int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_kept"] = out["n_kept"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_doc_pack_stats(sf_dir: str):
    """Sequence packing (training/pack.py) rolled up per pack: the
    deterministic doc->pack map aggregated to (source, pack_id, n_docs,
    pack_tokens). The per-doc pack rows stay a Dataset; only pack-level
    partials reach the groupby."""
    from .pack import pack_sequences

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    packs = pack_sequences(ds, budget_tokens=2048, as_dataset=True)

    def _partial(b: pa.Table) -> pa.Table:
        df = b.select(["source", "pack_id", "n_tok"]).to_pandas()
        g = df.groupby(["source", "pack_id"], as_index=False).agg(
            n_docs=("n_tok", "size"), pack_tokens=("n_tok", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        packs.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["source", "pack_id"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("pack_tokens", alias_name="pack_tokens"),
        )
        .to_pandas()
    )
    for c in ("pack_id", "n_docs", "pack_tokens"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["source", "pack_id"]).reset_index(drop=True)


def q_doc_bpe_tokens(sf_dir: str):
    from .text import token_count_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def q_doc_quality(sf_dir: str):
    from .text import quality_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)


def q_doc_fingerprint(sf_dir: str):
    from .text import fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(
        fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return out.select_columns(["doc_id", "fp"])


def q_dedup_exact(sf_dir: str):
    from .dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()
    out["keep_doc_id"] = out["keep_doc_id"].astype("int64")
    out["n_dups"] = out["n_dups"].astype("int64")
    return out


def q_lang_id_counts(sf_dir: str):
    from ..stages.aggregate import grouped_counts
    from .text import lang_id_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    preds = ds.map_batches(lang_id_batch, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_counts(preds, keys=["pred_lang"], sum_col=None)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def _query_vecs(sf_dir: str, n: int = 2) -> np.ndarray:
    """Fetch the first n query vectors with a parquet row-filter pushdown
    (predicate evaluated at the read — no per-row Python filter pass)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    qdf = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < n,
    ).to_pandas()
    if not len(qdf) or "vec_id" not in qdf.columns:
        # to_pandas drops the schema over zero rows (CLAUDE.md hygiene
        # rule) — an empty embeddings table must yield an empty matrix,
        # not a KeyError on the sort below
        return np.empty((0, 0), dtype=np.float64)
    qdf = qdf.sort_values("vec_id")
    return np.array(qdf["embedding"].tolist(), dtype=np.float64)


def q_ann_topk(sf_dir: str):
    from .similarity import brute_force_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(emb, _query_vecs(sf_dir), k=10)
    out["cosine"] = out["cosine"].round(6)
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out


def q_ann_ivf_topk(sf_dir: str):
    """Distributed IVF ANN. Approximate (probe subset) but deterministic
    by design — centroid sample, probe set, and 6dp-rounded top-k are
    run/CPU-invariant — so the rows are value-pinned per embeddings-table
    size (reproducibility oracle); recall-vs-brute is pinned in tests."""
    from .similarity import ivf_topk_distributed

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk_distributed(emb, _query_vecs(sf_dir), k=10)
    out["cosine"] = out["cosine"].round(6)
    out["query_id"] = out["query_id"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out


def q_embed_centroids(sf_dir: str):
    """Per-label mean embedding (vector aggregate) in long (label, pos,
    centroid) form - combiner partials shuffle, vectors never do."""
    from .vectors import vector_centroids

    emb = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    out = vector_centroids(emb, key_col="label", vec_col="embedding")
    out["label"] = out["label"].astype("int64")
    return out


def q_label_centroid_sim(sf_dir: str):
    """Cluster-similarity matrix: pairwise cosine between the per-label
    mean embeddings (upper triangle, label_a < label_b).

    Scale shape: the distributed part is the vector_centroids combiner
    fold (per-block (label, n, vsum) partials; vectors never shuffle);
    the pairwise step runs on the driver over the label-cardinality
    centroid table — labels are a model-class dimension (tens), never
    corpus-sized. Cosines are computed over the 6dp-ROUNDED centroids
    (what vector_centroids emits and the oracle reconstructs), so both
    engines dot identical inputs."""
    from .vectors import vector_centroids

    emb = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    long = vector_centroids(emb, key_col="label", vec_col="embedding")
    empty = pd.DataFrame(
        {
            "label_a": pd.Series([], dtype="int64"),
            "label_b": pd.Series([], dtype="int64"),
            "cos": pd.Series([], dtype="float64"),
        }
    )
    if len(long) == 0:
        return empty
    wide = long.pivot(index="label", columns="pos", values="centroid")
    labels = wide.index.to_numpy(dtype=np.int64)
    M = wide.to_numpy(dtype=np.float64)
    if len(labels) < 2:
        return empty
    nrm = np.sqrt((M * M).sum(axis=1))
    dots = M @ M.T
    ia, ib = np.triu_indices(len(labels), k=1)
    cos = np.round(dots[ia, ib] / (nrm[ia] * nrm[ib]), 6)
    out = pd.DataFrame(
        {"label_a": labels[ia], "label_b": labels[ib], "cos": cos}
    )
    return out.sort_values(["label_a", "label_b"]).reset_index(drop=True)


def q_embed_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means summary. Iterative, but the 6dp
    centroid rounding per iteration makes the whole trajectory
    partitioning-invariant (vectors.py), so the summary is value-pinned
    per embeddings-table size (reproducibility oracle); the
    trajectory-equals-local-reference property is pinned in tests. Init
    centroids are the first 8 vectors by vec_id (deterministic, parquet
    row-filter pushdown)."""
    from .vectors import kmeans

    emb = _read(sf_dir, "embeddings", columns=["embedding"])
    return kmeans(emb, _query_vecs(sf_dir, n=8), n_iter=5)


def q_embed_dup_pairs(sf_dir: str):
    """Exact distributed path (tile cross-product) — matches the all-pairs
    oracle on any corpus while the O(n^2) flops run in parallel tasks."""
    from .dedup import embedding_dup_pairs_tiles

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = embedding_dup_pairs_tiles(emb, threshold=0.95)
    out["cosine"] = out["cosine"].round(6).astype("float64")
    for c in ("vec_a", "vec_b"):
        out[c] = out[c].astype("int64")
    return out


def q_minhash_pairs(sf_dir: str):
    from .dedup import minhash_dedup_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = minhash_dedup_pairs(ds, threshold=0.8)
    out["jaccard"] = out["jaccard"].round(6)
    return out


def q_ngram_jaccard_pairs(sf_dir: str):
    from .dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ngram_jaccard_pairs(ds, threshold=0.5)
    out["jaccard"] = out["jaccard"].round(6)
    for c in ("doc_a", "doc_b"):
        out[c] = out[c].astype("int64")
    return out


def q_pii_redaction(sf_dir: str):
    """PII scrubbing over a deterministically PII-augmented corpus: each
    doc gains doc_id%3 planted emails and doc_id%2 planted IPs (the oracle
    derives the identical text in SQL), then the vectorized redaction pass
    (training/text.py redact_batch) replaces and counts them. Output is
    per-source (n_docs, n_emails, n_ips, chars_after) — chars_after pins
    the actual replacement, not just the counts."""
    from .text import redact_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def _derive(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pandas()
        s = b["text"].to_pandas()
        email = " contact u" + ids.astype(str) + "@mail.example.com now"
        t = (
            s
            + email * (ids % 3)
            + pd.Series([" from 10.1.2.3"] * len(s)) * (ids % 2)
        )
        return pa.table(
            {
                "source": b["source"],
                "text": pa.array(t.tolist(), pa.string()),
            }
        )

    def _partial(b: pa.Table) -> pa.Table:
        r = redact_batch(b)
        df = pd.DataFrame(
            {
                "source": r["source"].to_pandas(),
                "n_emails": r["n_email"].to_pandas(),
                "n_ips": r["n_ipv4"].to_pandas(),
                "chars_after": r["text"].to_pandas().str.len().astype("int64"),
            }
        )
        g = df.groupby("source", as_index=False).agg(
            n_docs=("chars_after", "size"),
            n_emails=("n_emails", "sum"),
            n_ips=("n_ips", "sum"),
            chars_after=("chars_after", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(_derive, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_emails", alias_name="n_emails"),
            Sum("n_ips", alias_name="n_ips"),
            Sum("chars_after", alias_name="chars_after"),
        )
        .to_pandas()
    )
    for c in ("n_docs", "n_emails", "n_ips", "chars_after"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_contamination_counts(sf_dir: str):
    """Benchmark decontamination: per-source counts of docs sharing any
    13-character gram with the deterministic benchmark subset
    (doc_id % 97 == 0); see training/decontam.py."""
    from .decontam import contamination_counts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return contamination_counts(ds)


def q_embed_nn_join(sf_dir: str):
    """Nearest-neighbour JOIN over the embeddings table: every vector's
    top-1 cosine neighbour (self excluded), broadcast-candidate baseline
    shape (training/similarity.py nn_join_broadcast)."""
    from .similarity import nn_join_broadcast

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return nn_join_broadcast(ds)


def q_embed_decontam(sf_dir: str):
    """Embedding-space decontamination: training vectors (vec_id % 97 != 0,
    the decontam benchmark-subset convention) whose best rounded cosine
    against the broadcast eval subset (vec_id % 97 == 0) reaches 0.3; see
    training/similarity.py embedding_decontam."""
    from .similarity import embedding_decontam

    def _mod_filter(keep_eval: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
            m = (ids % 97 == 0) if keep_eval else (ids % 97 != 0)
            return b.filter(pa.array(m))

        return f

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    train = emb.map_batches(
        _mod_filter(False), batch_format="pyarrow", zero_copy_batch=True
    )
    ev = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        _mod_filter(True), batch_format="pyarrow", zero_copy_batch=True
    )
    return embedding_decontam(train, ev, threshold=0.3)


def q_dup_clusters(sf_dir: str):
    """Duplicate clusters: the ngram-jaccard near-dup pair graph
    (threshold 0.5, the q_ngram_jaccard_pairs edge set) closed under
    transitive connectivity — every paired doc mapped to its component's
    minimum doc_id (the canonical representative used to keep one copy
    per cluster). Pairs stay a Dataset end-to-end into the
    label-propagation rounds (training/graph.py)."""
    from .dedup import ngram_jaccard_pairs
    from .graph import connected_components

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, threshold=0.5, as_dataset=True)
    out = connected_components(pairs).to_pandas()
    if "node" not in out.columns:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "cluster_rep": pd.Series([], dtype="int64"),
            }
        )
    out = out.rename(columns={"node": "doc_id"})
    for c in ("doc_id", "cluster_rep"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_simhash_pairs(sf_dir: str):
    """SimHash LSH near-dup pairs, lossless (max_bucket=None) so the output
    equals exact all-pairs Hamming <= 3 over the deterministic signatures —
    which IS SQL-expressible (the embedded word->bits table in
    _simhash_oracle_sql reconstructs the signatures). The production
    bucket cap is covered by its own pytest contract."""
    from .dedup import simhash_near_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_pairs(ds, max_hamming=3, max_bucket=None)


def q_doc_winnow_dups(sf_dir: str):
    """Winnowing (MOSS) fingerprint near-dup pairs: distinct window-minima
    of the word-3-gram hash sequence per doc; pairs sharing >= 2
    fingerprints, with the shared count (training/dedup.py
    winnow_fingerprint_pairs). Lossless (max_df=None) so the result is
    SQL-expressible via the embedded word->r20 table."""
    from .dedup import winnow_fingerprint_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return winnow_fingerprint_pairs(ds, k=3, window=4, min_shared=2)


def _winnow_oracle_sql() -> str:
    """Rebuild the winnowing pipeline in SQL: the word->20-bit-id table is
    embedded as VALUES generated by the SAME winnow_word_r20 the engine
    uses (the lang-id/simhash shared-table oracle pattern); gram codes,
    window minima and the short-doc fallback are then pure SQL."""
    from .dedup import winnow_word_r20

    vals = ", ".join(
        f"('{w}', CAST({winnow_word_r20(w)} AS BIGINT))" for w in _SIMHASH_VOCAB
    )
    a = 1 << 21
    return rf"""
            WITH wmap(word, r) AS (VALUES {vals}),
            toks AS (
              SELECT doc_id, regexp_split_to_array(
                  trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                  '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), pos AS (
              SELECT doc_id, CAST(i AS BIGINT) AS i, w[i] AS word
              FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)
              WHERE w[i] <> ''
            ), wr AS (
              SELECT p.doc_id, p.i, m.r FROM pos p JOIN wmap m ON m.word = p.word
            ), g AS (
              SELECT a.doc_id, a.i, (a.r * {a} + b.r) * {a} + c.r AS gram
              FROM wr a
              JOIN wr b ON b.doc_id = a.doc_id AND b.i = a.i + 1
              JOIN wr c ON c.doc_id = a.doc_id AND c.i = a.i + 2
            ), fp AS (
              SELECT DISTINCT doc_id,
                     MIN(gram) OVER (PARTITION BY doc_id ORDER BY i
                                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
              FROM g
              QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) >= 4
              UNION
              SELECT doc_id, MIN(gram) AS fp FROM g
              GROUP BY doc_id HAVING COUNT(*) < 4
            )
            SELECT doc_a, doc_b, n_shared FROM (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 2
            )
            ORDER BY doc_a, doc_b
        """


def q_docs_curated(sf_dir: str):
    """Composite curation keep-list: quality filter -> exact dedup. The
    optional near-dup stage is off here so the result is SQL-expressible."""
    from .curate import curate_keep_list

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = curate_keep_list(ds).to_pandas()
    if "doc_id" not in out.columns:  # zero survivors, schema-less empty
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    out = out.sort_values("doc_id")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.reset_index(drop=True)


def q_docs_stratified_sample(sf_dir: str, k: int = 5):
    """Stratified deterministic sample: the k docs per source with the
    smallest (md5(doc_id), doc_id) rank — the per-source/per-language
    quota primitive for corpus balancing.

    Scale shape: the rank is a pure function of the row key, so each block
    reduces to its OWN per-source top-k candidates (<= k x n_sources rows
    leave a block regardless of block size) and only those shuffle into a
    source-cardinality groupby that keeps the global k. No sampling state,
    reproducible across runs, partitionings and cluster sizes. md5 is the
    rank key so the DuckDB oracle computes the identical order
    (md5(CAST(doc_id AS VARCHAR))); the per-row digest costs ~1us and is
    charged to the candidate rows only, never the text payload."""
    import hashlib

    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def _rank(ids) -> list:
        return [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]

    def _cand(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "source": b["source"],
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
            }
        ).to_pandas()
        df["rk"] = _rank(df["doc_id"])
        df = df.sort_values(["rk", "doc_id"]).groupby("source").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["rk", "doc_id"]).head(k)[["source", "doc_id"]]

    out = (
        ds.map_batches(
            _cand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby("source")
        .map_groups(_final, batch_format="pandas")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


def q_word_doc_freq(sf_dir: str, topn: int = 30):
    """Document-frequency / IDF table: the 30 corpus-wide words appearing
    in the most documents (lowercased, ASCII-whitespace split — the same
    parity convention as doc_token_counts), with idf = ln(n_docs/df).

    Scale shape: a document lives wholly inside one row/one block, so
    per-block distinct-(doc, word) counting is EXACT — each block emits
    (word, df_partial) rows bounded by its own vocabulary, tagged
    hash(word) % 64; the only shuffle is on that coarse bucket key (a
    groupby over per-word groups is the banned tiny-groups shape at
    web-scale vocabularies). Every copy of a word lands in one bucket, so
    the per-bucket sum is the global df and each bucket's top-``topn``
    candidates provably contain the global head — the driver folds
    64 x topn rows, never the vocabulary. idf comes from the parquet
    metadata row count."""
    from .text import _ASCII_WS, _WS_RE

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_parts = 64

    def _partial(b: pa.Table) -> pa.Table:
        from ..partition import stable_partition

        s = b["text"].to_pandas()
        words = (
            s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        )
        df = words[words.notna() & (words != "")].reset_index()
        df.columns = ["doc", "word"]
        part = (
            df.drop_duplicates()
            .groupby("word", as_index=False)
            .size()
            .rename(columns={"size": "df"})
        )
        part["_part"] = stable_partition(part["word"], n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("word", as_index=False)["df"].sum()
        return tot.sort_values(["df", "word"], ascending=[False, True]).head(topn)

    agg = (
        ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby("_part")
        .map_groups(_bucket_top, batch_format="pandas")
        .to_pandas()
    )
    n_docs = ds.count()  # parquet metadata count, no scan
    agg["df"] = agg["df"].astype("int64")
    out = agg.sort_values(["df", "word"], ascending=[False, True]).head(topn)
    out = out.reset_index(drop=True)
    out["idf"] = np.round(np.log(float(n_docs) / out["df"].to_numpy()), 6)
    return out[["word", "df", "idf"]]


def q_word_pmi_topk(sf_dir: str, topk: int = 20, min_count: int = 5):
    """Top-``topk`` adjacent-word pairs by pointwise mutual information —
    the collocation / multi-word-expression mining stage of a tokenizer /
    vocab pipeline. pmi = ln((c_xy/N_bi) / ((c_x/N_uni)*(c_y/N_uni))),
    pairs with c_xy < ``min_count`` dropped, ties (rounded pmi, then pair)
    ascending words.

    Scale shape: unigram and bigram counts are separate bucket-collapsed
    folds (stable_partition / stable_pair_partition % 64 — every copy of a
    key lands in one bucket, so per-bucket sums are global); the bigram
    payload never shuffles raw, only (w1, w2, partial_n) rows. The PMI
    join needs global unigram counts per bigram endpoint: the unigram
    table is vocabulary-sized, broadcast-bounded with a fail-fast guard
    (the idf-broadcast convention) — past the bound this becomes two word
    -keyed joins. The final head folds vocabulary²-bounded scored rows,
    never corpus-sized data."""
    from ..partition import stable_pair_partition, stable_partition
    from .text import _ASCII_WS, _WS_RE

    ds = _read(sf_dir, "documents", columns=["text"])
    n_parts = 64

    def _words(s: pd.Series) -> pd.Series:
        return s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE)

    def _uni_partial(b: pa.Table) -> pa.Table:
        w = _words(b["text"].to_pandas()).explode()
        w = w[w.notna() & (w != "")]
        part = w.value_counts().rename_axis("word").reset_index(name="n")
        part["_part"] = stable_partition(part["word"], n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _bi_partial(b: pa.Table) -> pa.Table:
        lists = _words(b["text"].to_pandas())
        ex = lists.explode()
        ex = ex[ex.notna() & (ex != "")]
        df = ex.reset_index()
        df.columns = ["doc", "w"]
        nxt = df["w"].shift(-1)
        same_doc = df["doc"].shift(-1) == df["doc"]
        pairs = pd.DataFrame(
            {"word_a": df["w"][same_doc], "word_b": nxt[same_doc]}
        )
        part = (
            pairs.groupby(["word_a", "word_b"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        part["_part"] = stable_pair_partition(
            part["word_a"], part["word_b"], n_parts
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    def _collapse_uni(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False)["n"].sum()

    empty = pd.DataFrame(
        {
            "word_a": pd.Series([], dtype="object"),
            "word_b": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
            "pmi": pd.Series([], dtype="float64"),
        }
    )
    uni_ds = (
        ds.map_batches(
            _uni_partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("_part")
        .map_groups(_collapse_uni, batch_format="pandas")
        .materialize()  # consumed three times: bound-count, sum, collect
    )
    max_vocab_broadcast = 20_000_000
    n_vocab = uni_ds.count()
    if n_vocab == 0:
        return empty
    if n_vocab > max_vocab_broadcast:
        raise ValueError(
            f"word_pmi_topk: vocabulary {n_vocab} exceeds the broadcast "
            f"bound {max_vocab_broadcast}; the PMI endpoint lookup must "
            "become two word-keyed joins past this size"
        )
    uni = uni_ds.to_pandas()
    n_uni = float(uni["n"].sum())
    import ray

    cx_ref = ray.put(uni.set_index("word")["n"])

    # bigram partials materialize once (vocab^2-bounded per block), feeding
    # both the total-bigram sum and the bucket collapse below.
    bi_parts = ds.map_batches(
        _bi_partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    from ray.data.aggregate import Sum

    tot = bi_parts.aggregate(Sum("n", alias_name="n"))
    n_bi = float(tot["n"] or 0)
    if n_bi == 0:
        return empty

    from ..broadcast import broadcast_get

    def _bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        # every copy of a (word_a, word_b) pair lands in this one bucket,
        # so the per-bucket sum is the global pair count and the bucket's
        # rounded-pmi top-k provably contains its share of the global head
        cx = broadcast_get(cx_ref)
        tot = g.groupby(["word_a", "word_b"], as_index=False)["n"].sum()
        tot = tot[tot["n"] >= min_count]
        if len(tot) == 0:
            return empty
        ca = cx.reindex(tot["word_a"]).to_numpy(dtype=np.float64)
        cb = cx.reindex(tot["word_b"]).to_numpy(dtype=np.float64)
        c = tot["n"].to_numpy(dtype=np.float64)
        # exact SQL expression order: (c/nb) / ((ca/nu) * (cb/nu))
        tot["pmi"] = np.round(
            np.log((c / n_bi) / ((ca / n_uni) * (cb / n_uni))), 6
        )
        tot["n"] = tot["n"].astype("int64")
        return tot.sort_values(
            ["pmi", "word_a", "word_b"], ascending=[False, True, True]
        ).head(topk)

    cand = (
        bi_parts.groupby("_part")
        .map_groups(_bucket_top, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0 or "word_a" not in cand.columns:
        return empty
    out = cand.sort_values(
        ["pmi", "word_a", "word_b"], ascending=[False, True, True]
    ).head(topk)
    return out[["word_a", "word_b", "n", "pmi"]].reset_index(drop=True)


def q_media_decode(sf_dir: str):
    """Derive media payloads from documents — REAL bytes for two of the
    three types (PCM16 WAV and P6 PPM, built from the text bytes and
    parsed back by decode_real's native numpy/struct codecs) plus the
    deterministic fake format — and run the actor-pool decode stage.
    Every payload decodes to width = byte length of the text (WAV: one
    sample per byte; PPM: w x 1 RGB; fake: declared), height = 1."""
    import struct

    from .multimodal import decode_features, encode_ppm, encode_wav_pcm16

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        payloads, mids, mtypes = [], [], []
        for did, t in zip(ids, texts):
            body = t.encode("utf-8")
            arr = np.frombuffer(body, dtype=np.uint8)
            if did % 3 == 0:  # real WAV: one int16 sample per text byte
                payloads.append(
                    encode_wav_pcm16(arr.astype("<i2"), channels=1)
                )
                mtypes.append("audio/wav")
            elif did % 3 == 1:  # real PPM: len(body) x 1, grey RGB
                payloads.append(encode_ppm(len(body), 1, np.repeat(arr, 3)))
                mtypes.append("image/ppm")
            else:
                payloads.append(
                    b"FAKE" + struct.pack("<II", len(body), 1) + body
                )
                mtypes.append("image/fake")
            mids.append(f"m{did}")
        return pa.table(
            {
                "media_id": pa.array(mids, pa.string()),
                "media_type": pa.array(mtypes, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = docs.map_batches(_to_media, batch_format="pyarrow", zero_copy_batch=True)
    # pool floor of 2: a floor of 1 serializes warm-up behind a single
    # actor, but a higher floor can starve the upstream map tasks on small
    # CPU budgets (the 4-CPU test session deadlocks at floor 4); the pool
    # autoscales to 8 when CPUs allow, bounding per-node codec state
    out = decode_features(media, concurrency=(2, 8), batch_size=256)
    return out.select_columns(
        ["media_id", "media_type", "decoded_width", "decoded_height"]
    )




def q_docs_gopher_rules(sf_dir: str):
    """Gopher-style quality rules (text.py:gopher_rules_batch) folded to
    per-source pass counts: per-doc flags reduce to source-cardinality
    partials INSIDE the batch fn, then one tiny Sum groupby."""
    import pandas as pd
    import pyarrow as pa

    from .text import gopher_rules_batch

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        flags = gopher_rules_batch(b).to_pandas()
        g = flags.groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ..pipelines.queries import _fold_partials

    cols = ["n_docs", "n_wc_ok", "n_mwl_ok", "n_uniq_ok", "n_stop_ok", "n_pass"]
    out = _fold_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["source"], cols,
    )
    if out is None:  # empty corpus
        from ..util import typed_empty

        return typed_empty(source=object, **{c: "int64" for c in cols})
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)




def q_gram_source_except(sf_dir: str):
    """Distributed set DIFFERENCE (EXCEPT) on word 3-grams: grams that
    occur in even-numbered sources but NEVER in odd ones, counted per
    leading word (vocabulary-cardinality output).

    Scale shape: per doc the distinct grams reduce to
    (head_word, gram_hash64, odd_flag) fixed-width rows with a per-batch
    max(odd) combine; gram-hash buckets (stable_partition, 64) make the
    per-bucket max the GLOBAL max, so the even-only filter runs
    worker-side and only per-head counts shuffle afterwards. Gram text
    never moves - only its 64-bit hash does.
    """
    import re as _re

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..partition import stable_partition
    from .dedup import _gram_hash64, word_ngrams

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    _DIGITS = _re.compile(r"[^0-9]")

    def _grams(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        sources = b["source"].to_pylist()
        heads, hashes, odds = [], [], []
        for t, s in zip(texts, sources):
            odd = int(_DIGITS.sub("", s) or 0) % 2
            for g in word_ngrams(t, 3):
                heads.append(g.split(" ", 1)[0])
                hashes.append(_gram_hash64(g))
                odds.append(odd)
        df = pd.DataFrame(
            {
                "head": np.array(heads, dtype=object),
                "gh": np.array(hashes, dtype=np.int64),
                "odd": np.array(odds, dtype=np.int64),
            }
        )
        g = df.groupby("gh", as_index=False).agg(
            head=("head", "first"), odd=("odd", "max")
        )
        g["_part"] = stable_partition(g["gh"], 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        m = g.groupby("gh", as_index=False).agg(head=("head", "first"), odd=("odd", "max"))
        m = m[m["odd"] == 0]
        out = m.groupby("head", as_index=False).size()
        return out.rename(columns={"size": "n_exclusive_grams", "head": "word"})

    from ..pipelines.queries import _fold_partials

    out = _fold_partials(
        ds.map_batches(_grams, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_collapse, batch_format="pandas"),
        ["word"], ["n_exclusive_grams"],
    )
    if out is None:  # empty corpus
        from ..util import typed_empty

        return typed_empty(word=object, n_exclusive_grams="int64")
    out["n_exclusive_grams"] = out["n_exclusive_grams"].astype("int64")
    return out.sort_values("word").reset_index(drop=True)


def q_docs_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): doc i gets key -ln(u_i)/w_i with u_i a
    seeded uniform from md5(doc_id) and weight w_i = n_chars; the global
    20 smallest keys ARE the weighted sample. Keys are rounded to 9 dp
    (engine-invariant ranking, the embed_nn_join convention) with doc_id
    tiebreak.

    Scale shape: each batch computes keys vectorized and keeps only its
    local top-20 candidates; the driver folds blocks x 20 candidate rows,
    never the corpus."""
    import hashlib as _hl

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def _keys(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        w = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.fromiter(
            (int(_hl.md5(str(d).encode()).hexdigest()[:8], 16) for d in ids),
            dtype=np.int64,
            count=len(ids),
        )
        u = (v.astype(np.float64) + 1.0) / 4294967296.0
        key = np.round(-np.log(u) / w, 9)
        df = pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64), "samp_key": key})
        df = df.sort_values(["samp_key", "doc_id"]).head(20)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = ds.map_batches(
        _keys, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).to_pandas()
    if "samp_key" not in cand.columns:  # zero-block empty input
        from ..util import typed_empty

        return typed_empty(doc_id="int64", samp_key="float64")
    out = cand.sort_values(["samp_key", "doc_id"]).head(20).reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["samp_key"] = out["samp_key"].astype("float64")
    return out




def q_doc_top_terms(sf_dir: str):
    """Per-document TF-IDF top terms (keyword extraction): the global
    document-frequency table is folded distributed (bucket-collapse, never
    a raw vocabulary-cardinality groupby), broadcast as an idf lookup, and
    each doc-hash bucket scores its docs locally - score = tf * ln(N/df),
    rounded to 6 dp for engine-invariant ranking (word-asc tiebreak),
    top 3 per doc.

    Split-safety: ranking runs per doc-hash bucket (stable_partition), so
    Ray's dynamic block splitting of the exploded (doc, word, tf) rows can
    never cut a document's rows across two ranking tasks. The df fold is
    split-safe by construction ((doc, word) rows are globally unique, so
    row counts per word ARE df regardless of block boundaries).

    Scale note: the idf table is VOCABULARY-cardinality and is broadcast;
    the fail-fast guard (a count() BEFORE any driver collect) names the
    remedy - a hash-partitioned join of (doc, word, tf) rows against the
    df table (the gram_source_except shape) - if a corpus outgrows it."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    from ..broadcast import broadcast_get
    from ..partition import stable_partition
    from .text import _ASCII_WS, _WS_RE

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _tf(b: pa.Table) -> pa.Table:
        s = pd.Series(b["text"].to_pandas())
        s.index = pd.Index(b["doc_id"].to_pandas())
        ex = s.str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        ex = ex[ex != ""]
        g = ex.groupby([ex.index, ex]).size()
        g.index.names = ["doc_id", "word"]
        out = g.reset_index(name="tf")
        out["_part"] = stable_partition(out["doc_id"], 64)
        return pa.Table.from_pandas(out, preserve_index=False)

    tf_ds = ds.map_batches(
        _tf, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()

    def _df_partial(b: pa.Table) -> pa.Table:
        # (doc, word) rows are globally unique, so per-batch row counts per
        # word are exact df partials even if a doc's rows were block-split
        df = pa.table({"word": b["word"]}).to_pandas()
        g = df.groupby("word", as_index=False).size()
        g = g.rename(columns={"size": "df"})
        g["_wpart"] = stable_partition(g["word"], 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _df_collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.groupby("word", as_index=False)["df"].sum()

    dft_ds = (
        tf_ds.map_batches(_df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("_wpart")
        .map_groups(_df_collapse, batch_format="pandas")
        .materialize()
    )
    n_vocab = dft_ds.count()
    if n_vocab > 5_000_000:
        # fail BEFORE any vocabulary-cardinality driver collect
        raise ValueError(
            f"doc_top_terms: vocabulary {n_vocab} exceeds the broadcast "
            "bound; switch to a hash-partitioned join of (doc, word, tf) "
            "rows against the df table (the gram_source_except shape)"
        )
    if n_vocab == 0:  # empty corpus: zero blocks would reach the rankers
        # (and Dataset.to_pandas drops the schema over zero rows)
        from ..util import typed_empty

        return typed_empty(doc_id="int64", word=object, score="float64", rank="int64")
    dft = dft_ds.to_pandas()
    n_docs = ds.count()
    idf = dict(
        zip(dft["word"], np.log(float(n_docs) / dft["df"].to_numpy(np.float64)))
    )
    ref = ray.put(idf)

    def _score(g: "pd.DataFrame") -> "pd.DataFrame":
        lookup = broadcast_get(ref)
        df = g[["doc_id", "word", "tf"]].copy()
        df["score"] = np.round(
            df["tf"].to_numpy(np.float64)
            * df["word"].map(lookup).to_numpy(np.float64),
            6,
        )
        df = df.sort_values(
            ["doc_id", "score", "word"], ascending=[True, False, True]
        )
        df["rank"] = df.groupby("doc_id").cumcount() + 1
        out = df[df["rank"] <= 3][["doc_id", "word", "score", "rank"]]
        return out

    def _dtypes(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        if "doc_id" not in b.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": _pc.cast(b["doc_id"], pa.int64()),
                "word": b["word"],
                "score": _pc.cast(b["score"], pa.float64()),
                "rank": _pc.cast(b["rank"], pa.int64()),
            }
        )

    # doc-cardinality output: stays a Dataset (the driver/compare layer
    # collects only at the comparison scale it chooses)
    return (
        tf_ds.groupby("_part")
        .map_groups(_score, batch_format="pandas")
        .map_batches(_dtypes, batch_format="pyarrow", batch_size=None)
    )



class _HashScoreModel:
    """Stand-in model for the actor-pool scoring shape: 'weights' (a salt)
    load ONCE per actor in __init__ (where a real perplexity/quality model
    would load its checkpoint), __call__ scores batches vectorized. The
    scorer itself is a deterministic md5-derived uniform so the DuckDB
    oracle can reproduce it bit-exactly (the docs_weighted_sample hex
    polynomial); swap __call__'s body for real model inference and the
    Ray plumbing (pool sizing, batch flow, schema) is unchanged."""

    def __init__(self, salt: str = ""):
        import hashlib

        self._md5 = hashlib.md5
        self.salt = salt.encode()

    def __call__(self, b: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        texts = b["text"].to_pylist()
        v = np.fromiter(
            (
                int(self._md5(self.salt + t.encode("utf-8")).hexdigest()[:8], 16)
                for t in texts
            ),
            dtype=np.int64,
            count=len(texts),
        )
        df = pd.DataFrame(
            {
                "source": b["source"].to_pandas(),
                "score_units": v,
                "keep": (v > (1 << 31)).astype(np.int64),
            }
        )
        g = df.groupby("source", as_index=False).agg(
            n_docs=("keep", "size"),
            n_keep=("keep", "sum"),
            sum_score_units=("score_units", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)


def q_docs_model_score(sf_dir: str):
    """Model-scoring curation stage as an actor pool: per-doc quality
    scores from a model held per-actor (__init__-loaded), folded to
    per-source keep counts + integer-exact score sums. Pool floor 2 /
    ceiling 8 per the 4-CPU-deadlock rule (CLAUDE.md)."""
    import pandas as pd

    from ..pipelines.queries import _fold_partials

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    out = _fold_partials(
        ds.map_batches(
            _HashScoreModel,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
            concurrency=(2, 8),
        ),
        ["source"], ["n_docs", "n_keep", "sum_score_units"],
    )
    if out is None:  # empty corpus
        from ..util import typed_empty

        return typed_empty(source=object, n_docs="int64", n_keep="int64",
                           sum_score_units="int64")
    for c in ("n_docs", "n_keep", "sum_score_units"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)




def q_doc_prefix_editsim(sf_dir: str):
    """Record-linkage (string-similarity) join: document pairs whose
    24-char prefixes are within edit distance 4, blocked on the first 4
    characters (the blocking IS part of the operator's definition and the
    oracle applies the identical key — the standard linkage trade of
    recall for tractability, documented here).

    Scale shape: docs reduce to (block_key, 24-byte prefix) rows
    hash-partitioned by block key; each bucket self-merges its blocks into
    candidate pairs and scores them ALL AT ONCE with the
    vectorized-across-pairs Levenshtein kernel (text.py:levenshtein_pairs
    — loop count fixed at the prefix width, never per pair). Only
    matching (doc_a, doc_b, dist) rows leave the buckets. ASCII corpus
    assumed (byte == character, matching DuckDB's character semantics)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..partition import stable_partition
    from .text import levenshtein_pairs

    W, K = 24, 4
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # Volume-scaled partition count (the join-partition-cap convention):
    # the DP kernel's per-bucket cost is ~576 numpy calls regardless of
    # bucket size, so at small corpora MORE buckets just multiplies fixed
    # kernel overhead (64 parts at sf0.1 measured 2.4 s; the work itself
    # is ~0.3 s). count() is parquet metadata, no scan.
    n_parts = int(min(64, max(4, ds.count() // 1024)))

    def _prefixes(b: pa.Table) -> pa.Table:
        s = b["text"].to_pandas().str.slice(0, W)
        df = pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_pandas(),
                "pfx": s,
                "key": s.str.slice(0, 4),
            }
        )
        df["_part"] = stable_partition(df["key"], n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    MAX_BLOCK = 100_000  # stop-prefix guard: a block of k docs emits
    # k(k-1)/2 pairs; past this bound fail fast with the remedy rather
    # than silently going quadratic (the ngram max_df convention)

    def _pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        top = g.groupby("key").size().max()
        if top > MAX_BLOCK:
            raise ValueError(
                f"doc_prefix_editsim: a prefix block holds {top} docs "
                f"(> {MAX_BLOCK}); lengthen the blocking key or add a "
                "second blocking attribute before re-running"
            )
        # encode each ROW's prefix once (n iterations), then the pair
        # matrices are pure fancy-indexing — never a per-PAIR loop
        g = g.reset_index(drop=True)
        n = len(g)
        M = np.zeros((n, W), np.uint8)
        L = np.zeros(n, np.int64)
        for i, s_ in enumerate(g["pfx"].to_numpy(dtype=object)):
            b_ = s_.encode("ascii", "replace")
            M[i, : len(b_)] = np.frombuffer(b_, np.uint8)
            L[i] = len(b_)
        g["_row"] = np.arange(n)
        m = g.merge(g, on="key", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if not len(m):
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "dist": pd.Series([], dtype="int64"),
                }
            )
        ia = m["_row_a"].to_numpy()
        ib = m["_row_b"].to_numpy()
        # banded kernel: distances <= 4 are exact, larger ones only need
        # to stay > 4 for the filter below (text.py levenshtein_pairs)
        dist = levenshtein_pairs(M[ia], M[ib], L[ia], L[ib], max_dist=4)
        keep = dist <= 4
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_a"].to_numpy()[keep].astype(np.int64),
                "doc_b": m["doc_id_b"].to_numpy()[keep].astype(np.int64),
                "dist": dist[keep],
            }
        )

    out = (
        ds.map_batches(_prefixes, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_pairs, batch_format="pandas")
        .to_pandas()
    )
    if "doc_a" not in out.columns:
        from ..util import typed_empty

        return typed_empty(doc_a="int64", doc_b="int64", dist="int64")
    for c in ("doc_a", "doc_b", "dist"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_docs_rep_bigram(sf_dir: str):
    """Gopher-style intra-doc REPETITION rule (Rae et al. 2021 §A1.1:
    "fraction of characters in the most frequent word 2-gram"), restated
    integer-exact so the DuckDB oracle evaluates identical arithmetic:
    a doc is flagged when its top adjacent-word-bigram count covers at
    least 1/16 of its bigrams (``16 * top_cnt >= n_bigrams``; 1/16 sits
    inside the measured corpus ratio band 0.02-0.11, so the flag
    discriminates).

    Scale shape: a document lives wholly inside one row/one block, so the
    per-doc top-bigram count is block-local — bigram text NEVER leaves the
    batch fn; blocks emit source-cardinality partial count rows and one
    driver fold sums them (`_fold_partials`, bounded by sources x blocks).
    """
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    cols = ["n_docs", "n_bigram_docs", "n_flagged", "sum_top_cnt"]

    def _partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 **{c: pa.array([], pa.int64()) for c in cols}}
            )
        s = b["text"].to_pandas()
        words = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE)
        ex = words.explode()
        nxt = ex.groupby(level=0).shift(-1)
        bg = ex + " " + nxt  # NaN at each doc's last word
        valid = bg.notna()
        cnt = (
            pd.DataFrame({"doc": bg.index[valid], "bg": bg[valid].to_numpy()})
            .groupby(["doc", "bg"], sort=False)
            .size()
        )
        per_doc = cnt.groupby(level=0)
        top = per_doc.max().reindex(s.index)
        n_bg = per_doc.sum().reindex(s.index)
        has = top.notna()
        out = pd.DataFrame(
            {
                "source": b["source"].to_pandas(),
                "n_docs": np.ones(len(s), dtype=np.int64),
                "n_bigram_docs": has.to_numpy().astype(np.int64),
                "n_flagged": ((16 * top >= n_bg) & has)
                .to_numpy()
                .astype(np.int64),
                "sum_top_cnt": top.fillna(0).to_numpy().astype(np.int64),
            }
        ).groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    out = _fold_partials(
        ds.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["source"], cols,
    )
    if out is None:
        return typed_empty(source=object, **{c: "int64" for c in cols})
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_docs_len_trim(sf_dir: str):
    """Global length-percentile trim: keep docs whose n_chars sits inside
    the corpus-wide nearest-rank [P5, P95] band, report per-source kept
    counts/chars plus the thresholds.

    Scale shape: pass 1 folds per-block (n_chars -> count) HISTOGRAM
    partials on the driver (bounded by distinct document lengths x blocks
    — doc lengths are generator-bounded; for unbounded value domains use
    the GK sketch in state/gk.py instead) and derives both nearest-rank
    thresholds from one cumsum; pass 2 re-reads only (source, n_chars),
    filters worker-side against the two broadcast scalars and folds
    source-cardinality partials. The text column never leaves storage."""
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty

    out_cols = ["n_docs", "n_kept", "kept_chars"]

    def _hist(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n_chars": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        v, c = np.unique(b["n_chars"].to_numpy(), return_counts=True)
        return pa.table({"n_chars": v, "cnt": c.astype(np.int64)})

    hist = _fold_partials(
        _read(sf_dir, "documents", columns=["n_chars"]).map_batches(
            _hist, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["n_chars"], ["cnt"],
    )
    if hist is None:
        return typed_empty(
            source=object, **{c: "int64" for c in out_cols},
            p05="int64", p95="int64",
        )
    hist = hist.sort_values("n_chars")
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum()
    p05 = int(hist.loc[cum >= max(1, (5 * n) // 100), "n_chars"].iloc[0])
    p95 = int(hist.loc[cum >= max(1, (95 * n) // 100), "n_chars"].iloc[0])

    def _partial(b: pa.Table) -> pa.Table:
        t = b.to_pandas()
        keep = t["n_chars"].between(p05, p95)
        out = pd.DataFrame(
            {
                "source": t["source"],
                "n_docs": np.ones(len(t), dtype=np.int64),
                "n_kept": keep.to_numpy().astype(np.int64),
                "kept_chars": np.where(keep, t["n_chars"], 0).astype(np.int64),
            }
        ).groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    out = _fold_partials(
        _read(sf_dir, "documents", columns=["source", "n_chars"]).map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        ["source"], out_cols,
    )
    if out is None:  # unreachable once hist was non-empty; typed anyway
        return typed_empty(
            source=object, **{c: "int64" for c in out_cols},
            p05="int64", p95="int64",
        )
    for c in out_cols:
        out[c] = out[c].astype("int64")
    out["p05"] = np.int64(p05)
    out["p95"] = np.int64(p95)
    return out.sort_values("source").reset_index(drop=True)


def q_source_word_kl(sf_dir: str, max_fold_rows: int = 2_000_000):
    """Per-source unigram KL-divergence TERMS vs the corpus distribution:
    for every (source, word), p_s(w) * ln(p_s(w) / p_c(w)) — the
    summands of KL(source || corpus) — plus the exact integer counts
    they derive from. Per-term rows keep the oracle float-exact (no
    order-dependent double SUM on either side; each row is independent
    divide/ln arithmetic evaluated identically by numpy and DuckDB,
    rounded at 6dp like doc_top_terms' idf).

    Scale shape: blocks emit (source, word, count) partials combined
    per-batch (bounded by sources x block vocabulary); the output itself
    is sources x vocabulary rows, so the driver fold is output-cardinality.
    The partial Dataset is materialized once and count()-guarded BEFORE
    the collect (CLAUDE.md fail-fast rule); web-scale vocabularies should
    bucket by word hash first (word_doc_freq's shape)."""
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def _partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "word": pa.array([], pa.string()),
                 "c_sw": pa.array([], pa.int64())}
            )
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        part = (
            pd.DataFrame(
                {
                    "source": b["source"].to_pandas()
                    .reindex(ex.index[mask])
                    .to_numpy(),
                    "word": ex[mask].to_numpy(),
                }
            )
            .groupby(["source", "word"], as_index=False)
            .size()
            .rename(columns={"size": "c_sw"})
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    parts = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    n_part_rows = parts.count()
    if n_part_rows > max_fold_rows:
        raise ValueError(
            f"source_word_kl: {n_part_rows} partial rows exceed the driver "
            f"fold bound {max_fold_rows}; bucket by word hash "
            "(word_doc_freq's stable_partition shape) before folding"
        )
    agg = _fold_partials(parts, ["source", "word"], ["c_sw"])
    if agg is None:
        return typed_empty(
            source=object, word=object, c_sw="int64", c_s="int64",
            c_w="int64", log_ratio="float64", kl_term="float64",
        )
    agg["c_sw"] = agg["c_sw"].astype("int64")
    c_s = agg.groupby("source")["c_sw"].transform("sum").to_numpy(np.float64)
    c_w = agg.groupby("word")["c_sw"].transform("sum").to_numpy(np.float64)
    c_tot = float(agg["c_sw"].sum())
    p_s = agg["c_sw"].to_numpy(np.float64) / c_s
    ratio = p_s / (c_w / c_tot)
    agg["c_s"] = c_s.astype(np.int64)
    agg["c_w"] = c_w.astype(np.int64)
    agg["log_ratio"] = np.round(np.log(ratio), 6)
    agg["kl_term"] = np.round(p_s * np.log(ratio), 6)
    return agg.sort_values(["source", "word"]).reset_index(drop=True)


def q_streaming_shard_distinct(sf_dir: str):
    """Shared-mutable-index driver surface: exact per-shard distinct-text
    cardinality computed ONLINE against the sharded index actors
    (state/shard_index.py — the repo's documented raw-actor escape hatch
    for semantics map_batches can't express). Routing is the first md5
    byte mod 8, so the DuckDB oracle replicates the sharding bit-for-bit
    and the result is arrival-order / parallelism invariant by set
    semantics."""
    from ..state.shard_index import shard_distinct_counts

    ds = _read(sf_dir, "documents", columns=["text"])
    out = shard_distinct_counts(ds, "text", n_shards=8)
    out["shard"] = out["shard"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out.sort_values("shard").reset_index(drop=True)


def q_source_vocab_jaccard(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources: for every source pair
    (a < b), |vocab_a ∩ vocab_b| / |vocab_a ∪ vocab_b| over distinct
    lowercased ASCII-whitespace words.

    Scale shape: batches pre-reduce to distinct (source, word) pairs, words
    hash-bucket (64) via stable_partition so ALL copies of a word land in
    one task, and the per-bucket kernel is one self-merge on word (rows per
    word <= n_sources**2 — sources are a handful by construction). Only
    (src_a, src_b, n) partial rows leave the buckets — including the
    (s, s) diagonal carrying per-source vocabulary sizes — so the driver
    folds 64 x pairs rows and the Jaccard is a ratio of exact integers
    rounded half-up like the oracle's round()."""
    from ..partition import stable_partition
    from ..util import round_half_up, typed_empty
    from .text import _ASCII_WS, _WS_RE

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def _pairs(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "word": pa.array([], pa.string()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        d = pd.DataFrame(
            {
                "source": b["source"].to_pandas().reindex(ex.index[mask]).to_numpy(),
                "word": ex[mask].to_numpy(),
            }
        ).drop_duplicates()
        d["_part"] = stable_partition(
            pa.array(d["word"], type=pa.string()), 64
        )
        return pa.Table.from_pandas(d, preserve_index=False)

    def _inter(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g[["source", "word"]].drop_duplicates()
        if not len(g):
            return pd.DataFrame(
                {
                    "src_a": pd.Series([], dtype="object"),
                    "src_b": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        m = g.merge(g, on="word", suffixes=("_a", "_b"))
        m = m[m["source_a"] <= m["source_b"]]  # keep (s, s) diagonal = size
        out = (
            m.groupby(["source_a", "source_b"], as_index=False)
            .size()
            .rename(columns={"source_a": "src_a", "source_b": "src_b",
                             "size": "n"})
        )
        return out

    parts = (
        ds.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_inter, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "src_a" not in parts.columns:
        return typed_empty(src_a=object, src_b=object, n_a="int64",
                           n_b="int64", n_inter="int64", jaccard="float64")
    folded = parts.groupby(["src_a", "src_b"], as_index=False)["n"].sum()
    sizes = dict(
        zip(
            folded.loc[folded["src_a"] == folded["src_b"], "src_a"],
            folded.loc[folded["src_a"] == folded["src_b"], "n"],
        )
    )
    out = folded[folded["src_a"] < folded["src_b"]].copy()
    if not len(out):
        return typed_empty(src_a=object, src_b=object, n_a="int64",
                           n_b="int64", n_inter="int64", jaccard="float64")
    out["n_a"] = out["src_a"].map(sizes).astype("int64")
    out["n_b"] = out["src_b"].map(sizes).astype("int64")
    out = out.rename(columns={"n": "n_inter"})
    out["n_inter"] = out["n_inter"].astype("int64")
    union = (out["n_a"] + out["n_b"] - out["n_inter"]).to_numpy(np.float64)
    out["jaccard"] = round_half_up(
        out["n_inter"].to_numpy(np.float64) / union, 6
    )
    return (
        out[["src_a", "src_b", "n_a", "n_b", "n_inter", "jaccard"]]
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )


def q_ngram_containment_pairs(sf_dir: str):
    """Asymmetric near-dup detection: word-3-gram CONTAINMENT pairs
    (|A∩B| / min(|A|,|B|) >= 0.8) — catches a short doc wholly embedded in
    a long one, which jaccard's union denominator dilutes below any usable
    threshold. Same joinless two-stage hash-partition shape as
    ngram_jaccard_pairs (text never shuffles; only int rows move)."""
    from .dedup import ngram_jaccard_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ngram_jaccard_pairs(ds, threshold=0.8, metric="containment")
    out["containment"] = out["containment"].round(6)
    for c in ("doc_a", "doc_b"):
        out[c] = out[c].astype("int64")
    return out


def q_docs_score_deciles(sf_dir: str, shift: int = 20,
                         max_fold_rows: int = 2_000_000):
    """Quality-score calibration: global decile thresholds of the
    (deterministic) model score, then per-(source, decile) doc counts —
    the diagnostic behind perplexity-filter threshold picking.

    Exactness contract: scores quantize to 4096 coarse bins (score >>
    ``shift``), so the fold is (source x 4096)-bounded at ANY corpus size
    and every threshold / bucket assignment is pure integer arithmetic on
    both sides (rank r_k = max(1, k*n//10), threshold = r_k-th smallest
    bin, decile = #thresholds <= bin, duplicates kept)."""
    from ..partition import stable_pair_partition
    from ..util import typed_empty

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    n_parts = 64

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "q": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "text" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        import hashlib

        texts = b["text"].to_pylist()
        v = np.fromiter(
            (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
             for t in texts),
            dtype=np.int64, count=len(texts),
        )
        part = (
            pd.DataFrame({"source": b["source"].to_pandas(),
                          "q": v >> shift})
            .groupby(["source", "q"], as_index=False)
            .size().rename(columns={"size": "n"})
        )
        part["_part"] = stable_pair_partition(part["source"], part["q"],
                                              n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _collapse(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "source" not in g.columns:
            return pd.DataFrame(
                {"source": pd.Series([], dtype="object"),
                 "q": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        return g.groupby(["source", "q"], as_index=False)["n"].sum()

    hist_ds = (
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_collapse, batch_format="pandas")
        .materialize()
    )
    n_rows = hist_ds.count()
    if n_rows > max_fold_rows:
        raise ValueError(
            f"docs_score_deciles: {n_rows} histogram rows exceed the fold "
            f"bound {max_fold_rows}; raise `shift` to coarsen the bins"
        )
    hist = hist_ds.to_pandas()
    if not len(hist) or "source" not in hist.columns:
        return typed_empty(source=object, decile="int64", n_docs="int64")
    hist["n"] = hist["n"].astype("int64")
    # global thresholds from the (q -> count) histogram cumsum
    gq = hist.groupby("q", as_index=False)["n"].sum().sort_values("q")
    cum = gq["n"].cumsum().to_numpy(np.int64)
    qv = gq["q"].to_numpy(np.int64)
    n_total = int(cum[-1])
    ranks = np.maximum(1, (np.arange(1, 10) * n_total) // 10)
    th = qv[np.searchsorted(cum, ranks, side="left")]  # r-th smallest bin
    dec = np.searchsorted(np.sort(th), hist["q"].to_numpy(np.int64),
                          side="right")  # = #thresholds <= q
    out = (
        hist.assign(decile=dec.astype(np.int64))
        .groupby(["source", "decile"], as_index=False)["n"].sum()
        .rename(columns={"n": "n_docs"})
        .sort_values(["source", "decile"]).reset_index(drop=True)
    )
    out["decile"] = out["decile"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out[["source", "decile", "n_docs"]]


def q_docs_temperature_alloc(sf_dir: str, alpha: float = 0.5,
                             budget: int = 10_000):
    """Temperature-scaled source mixing (the multilingual-LM sampling
    rule p_s ∝ n_s^alpha): allocate a fixed sampling budget across
    sources with largest-remainder rounding.

    Exactness contract: each source's weight n^alpha is quantized ONCE
    to integer micro-units (the DSIR pattern); base = budget*wu // sum_wu
    and the leftover goes to the largest integer remainders (ties by
    source name) — every comparison after the single pow() is exact
    int64 on both sides.

    Scale shape: one count fold (source-cardinality partials per block,
    driver folds blocks x sources rows); the allocation itself is
    output-sized driver math."""
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty

    ds = _read(sf_dir, "documents", columns=["source"])

    def _partial(b: pa.Table) -> pa.Table:
        if "source" not in b.column_names or b.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64())})
        part = (
            pd.DataFrame({"source": b["source"].to_pandas()})
            .groupby("source", as_index=False)
            .size().rename(columns={"size": "n_docs"})
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    out = _fold_partials(
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["source"], ["n_docs"],
    )
    if out is None:
        return typed_empty(source=object, n_docs="int64", alloc="int64")
    out = out.sort_values("source").reset_index(drop=True)
    n = out["n_docs"].to_numpy(np.int64)
    wu = np.floor(1e6 * np.power(n.astype(np.float64), alpha) + 0.5) \
        .astype(np.int64)
    den = int(wu.sum())
    num = budget * wu
    base = num // den
    rem = num % den
    leftover = budget - int(base.sum())
    # largest remainder, ties by source name ascending (out is name-sorted)
    order = np.lexsort((np.arange(len(rem)), -rem))
    bonus = np.zeros(len(rem), np.int64)
    bonus[order[:leftover]] = 1
    out["n_docs"] = out["n_docs"].astype("int64")
    out["alloc"] = (base + bonus).astype("int64")
    return out[["source", "n_docs", "alloc"]]


def q_docs_dsir_weights(sf_dir: str, target_source: str = "src0",
                        max_fold_rows: int = 2_000_000):
    """DSIR-style data selection (importance resampling with unigram
    bag-of-words features, Xie et al. 2023): per-document importance
    weight log p_target(doc)/p_raw(doc) under add-1-smoothed unigram LMs,
    where target = the ``target_source`` docs and raw = everything else;
    reported as per-source selection aggregates.

    Float parity strategy: the per-word log-ratio is quantized ONCE into
    integer micro-nats (floor(1e6 * lr + 0.5)) — the only float op in the
    whole query, evaluated by numpy here and by DuckDB ln() in the oracle
    on the same exact integer counts — and every downstream sum
    (per-doc, per-source) is exact int64 arithmetic on both sides.

    Scale shape: one bucket-collapsed word-count fold (word-hash % 64, so
    per-bucket sums are global; vocabulary-sized output, count()-guarded
    BEFORE the collect), the (word -> units) table broadcast once via
    ray.put, then a single scoring pass in which documents never shuffle:
    each block emits source-cardinality (n_docs, n_selected, sum_units)
    partials and the driver folds blocks x sources rows."""
    import ray

    from ..broadcast import broadcast_get
    from ..partition import stable_partition
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    n_parts = 64

    def _count_partial(b: pa.Table) -> pa.Table:
        cols = {
            "word": pa.array([], pa.string()),
            "c_tgt": pa.array([], pa.int64()),
            "c_raw": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "text" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        if not mask.any():
            return pa.table(cols)
        is_tgt = (
            b["source"].to_pandas().reindex(ex.index[mask]).to_numpy()
            == target_source
        )
        part = (
            pd.DataFrame({"word": ex[mask].to_numpy(),
                          "t": is_tgt.astype(np.int64)})
            .groupby("word", as_index=False)
            .agg(c_tgt=("t", "sum"), c_raw=("t", lambda v: len(v) - v.sum()))
        )
        part["_part"] = stable_partition(part["word"], n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _collapse(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "word" not in g.columns:
            return pd.DataFrame(
                {"word": pd.Series([], dtype="object"),
                 "c_tgt": pd.Series([], dtype="int64"),
                 "c_raw": pd.Series([], dtype="int64")}
            )
        return g.groupby("word", as_index=False)[["c_tgt", "c_raw"]].sum()

    counts_ds = (
        ds.map_batches(_count_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part")
        .map_groups(_collapse, batch_format="pandas")
        .materialize()
    )
    n_vocab = counts_ds.count()
    if n_vocab > max_fold_rows:
        raise ValueError(
            f"docs_dsir_weights: vocabulary {n_vocab} exceeds the broadcast "
            f"bound {max_fold_rows}; switch the units lookup to a "
            "co-partitioned word join (word_doc_freq's shape)"
        )
    vocab = counts_ds.to_pandas()
    if len(vocab) and "word" in vocab.columns:
        vocab = vocab.sort_values("word").reset_index(drop=True)
        v = len(vocab)
        t_tgt = int(vocab["c_tgt"].sum())
        t_raw = int(vocab["c_raw"].sum())
        lr = np.log(
            (vocab["c_tgt"].to_numpy(np.float64) + 1.0) / float(t_tgt + v)
        ) - np.log(
            (vocab["c_raw"].to_numpy(np.float64) + 1.0) / float(t_raw + v)
        )
        units = np.floor(1e6 * lr + 0.5).astype(np.int64)
        units_ref = ray.put((vocab["word"].to_numpy(object), units))
    else:
        units_ref = ray.put(
            (np.array([], dtype=object), np.array([], dtype=np.int64))
        )

    def _score_partial(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_selected": pa.array([], pa.int64()),
            "sum_units": pa.array([], pa.int64()),
        }
        if "text" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        words, u = broadcast_get(units_ref)
        logw = np.zeros(b.num_rows, np.int64)
        if mask.any() and len(words):
            wv = ex[mask].to_numpy(object)
            idx = np.searchsorted(words, wv)
            idx[idx >= len(words)] = 0
            uu = np.where(words[idx] == wv, u[idx], 0)
            per_doc = (
                pd.Series(uu, index=ex.index[mask]).groupby(level=0).sum()
            )
            logw[per_doc.index.to_numpy()] = per_doc.to_numpy(np.int64)
        part = (
            pd.DataFrame({"source": b["source"].to_pandas(), "logw": logw})
            .groupby("source", as_index=False)
            .agg(
                n_docs=("logw", "size"),
                n_selected=("logw", lambda x: int((x > 0).sum())),
                sum_units=("logw", "sum"),
            )
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    parts = ds.map_batches(
        _score_partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()
    if not len(parts) or "source" not in parts.columns:
        return typed_empty(source=object, n_docs="int64",
                           n_selected="int64", sum_units="int64")
    out = (
        parts.groupby("source", as_index=False)[
            ["n_docs", "n_selected", "sum_units"]
        ].sum().sort_values("source").reset_index(drop=True)
    )
    for c in ("n_docs", "n_selected", "sum_units"):
        out[c] = out[c].astype("int64")
    return out[["source", "n_docs", "n_selected", "sum_units"]]


def q_docs_stopword_trim(sf_dir: str, stop_broadcast_limit: int = 1_000_000):
    """Corpus-adaptive stopword removal (the C4-style "too common to
    carry signal" trim): words appearing in MORE THAN HALF the documents
    (2*df > n_docs, integer-exact) form the stoplist; report per-source
    post-trim token counts.

    Scale shape: pass 1 is the word_doc_freq bucket-collapsed df fold
    (only (word, df_partial) rows shuffle, every copy of a word in one
    bucket); the bucket kernel ALSO applies the threshold worker-side, so
    only actual stopwords leave the buckets — the stoplist Dataset is
    count()-guarded (fail-fast BEFORE the collect) then broadcast once
    via ray.put. Pass 2 re-reads (source, text) and splits kept/removed
    per token against the broadcast set, folding source-cardinality
    partials. The vocabulary never lands on the driver."""
    import ray

    from ..broadcast import broadcast_get
    from ..partition import stable_partition
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    out_cols = ["n_docs", "kept_tokens", "removed_tokens"]
    empty = typed_empty(source=object, **{c: "int64" for c in out_cols},
                        n_stopwords="int64")
    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    n_docs_total = docs.count()  # parquet metadata, no scan
    if n_docs_total == 0:
        return empty
    n_parts = 64

    def _df_partial(b: pa.Table) -> pa.Table:
        cols = {"word": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if "text" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        s = b["text"].to_pandas()
        words = (
            s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        )
        df = words[words.notna() & (words != "")].reset_index()
        df.columns = ["doc", "word"]
        part = (
            df.drop_duplicates()
            .groupby("word", as_index=False)
            .size()
            .rename(columns={"size": "df"})
        )
        part["_part"] = stable_partition(part["word"], n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _bucket_stop(g: pd.DataFrame) -> pd.DataFrame:
        out = {"word": pd.Series([], dtype="object")}
        if not len(g) or "word" not in g.columns:
            return pd.DataFrame(out)
        tot = g.groupby("word", as_index=False)["df"].sum()
        stop = tot[2 * tot["df"] > n_docs_total]
        return pd.DataFrame({"word": stop["word"].to_numpy()})

    stop_ds = (
        docs.map_batches(_df_partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_bucket_stop, batch_format="pandas")
        .materialize()  # consumed twice: bound-count then collect
    )
    n_stop = stop_ds.count()
    if n_stop > stop_broadcast_limit:
        raise ValueError(
            f"docs_stopword_trim: {n_stop} stopwords exceed the broadcast "
            f"bound {stop_broadcast_limit}; route the trim through a "
            "co-partitioned word join (word_doc_freq's shape) instead"
        )
    sp = stop_ds.to_pandas()
    stop_set = (
        frozenset(sp["word"].tolist()) if "word" in sp.columns
        else frozenset()
    )
    stop_ref = ray.put(stop_set)

    def _trim_partial(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "kept_tokens": pa.array([], pa.int64()),
            "removed_tokens": pa.array([], pa.int64()),
        }
        if "text" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        stop = broadcast_get(stop_ref)
        s = b["text"].to_pandas()
        src = b["source"].to_pandas()
        words = (
            s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        )
        words = words[words.notna() & (words != "")]
        wsrc = src.reindex(words.index)
        removed = words.isin(stop)
        tok = (
            pd.DataFrame(
                {
                    "source": wsrc.to_numpy(),
                    "kept_tokens": (~removed).to_numpy().astype(np.int64),
                    "removed_tokens": removed.to_numpy().astype(np.int64),
                }
            )
            .groupby("source", as_index=False).sum()
        )
        nd = (
            pd.DataFrame({"source": src.to_numpy()})
            .groupby("source", as_index=False).size()
            .rename(columns={"size": "n_docs"})
        )
        out = nd.merge(tok, on="source", how="left").fillna(0)
        for c in ("n_docs", "kept_tokens", "removed_tokens"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    out = _fold_partials(
        docs.map_batches(_trim_partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None),
        ["source"], out_cols,
    )
    if out is None:
        return empty
    for c in out_cols:
        out[c] = out[c].astype("int64")
    out["n_stopwords"] = np.int64(len(stop_set))
    return out.sort_values("source").reset_index(drop=True)


def q_docs_unigram_surprisal(sf_dir: str,
                             vocab_broadcast_limit: int = 5_000_000):
    """Unigram language-model surprisal screen: score each document by
    the mean negative log corpus-probability of its tokens (the classic
    cheap LM-quality proxy), then report how many docs of each source
    land in each 0.1-nat surprisal bin.

    Scale shape: pass 1 is a bucket-collapsed corpus unigram fold (the
    word_pmi shape — only (word, n_partial) rows shuffle); the
    vocabulary-sized count table broadcasts once behind a fail-fast
    bound (the idf convention). Pass 2 re-reads (source, text), maps
    tokens to -ln(p) via one vectorized merge per block, means per doc
    (a doc lives wholly in one row), and folds (source, bin) partials —
    bounded by sources x bins, never corpus-sized. Scores round to 6dp
    before binning (ln-derived: both sides' float paths agree to ~1 ulp,
    so the 6dp round makes them bit-identical; exact bin-edge ties are
    measure-zero)."""
    import ray

    from ..broadcast import broadcast_get
    from ..partition import stable_partition
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(source=object, bin="int64", n_docs="int64")
    docs = _read(sf_dir, "documents", columns=["source", "text"])
    n_parts = 64

    def _words(s: pd.Series) -> pd.Series:
        w = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        return w[w.notna() & (w != "")]

    def _uni_partial(b: pa.Table) -> pa.Table:
        cols = {"word": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if "text" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        w = _words(b["text"].to_pandas())
        part = w.value_counts().rename_axis("word").reset_index(name="n")
        part["_part"] = stable_partition(part["word"], n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _collapse(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "word" not in g.columns:
            return pd.DataFrame({"word": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        return g.groupby("word", as_index=False)["n"].sum()

    uni_ds = (
        docs.map_batches(_uni_partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_collapse, batch_format="pandas")
        .materialize()  # consumed twice: bound-count then collect
    )
    n_vocab = uni_ds.count()
    if n_vocab == 0:
        return empty
    if n_vocab > vocab_broadcast_limit:
        raise ValueError(
            f"docs_unigram_surprisal: {n_vocab} vocabulary rows exceed the "
            f"broadcast bound {vocab_broadcast_limit}; route the score "
            "through a co-partitioned word join (word_doc_freq's shape)"
        )
    uni = uni_ds.to_pandas()
    total = int(uni["n"].sum())
    lp = pd.Series(
        -np.log(uni["n"].to_numpy(np.float64) / float(total)),
        index=uni["word"].to_numpy(),
    )
    lp_ref = ray.put(lp)

    def _score_partial(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "bin": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
        }
        if "text" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        lpw = broadcast_get(lp_ref)
        src = b["source"].to_pandas()
        w = _words(b["text"].to_pandas())
        if not len(w):
            return pa.table(cols)
        sc = (
            pd.DataFrame({"doc": w.index, "lp": lpw.reindex(w).to_numpy()})
            .groupby("doc")["lp"].mean()
        )
        bins = np.floor(np.round(sc.to_numpy(np.float64), 6) * 10.0)
        out = (
            pd.DataFrame(
                {
                    "source": src.reindex(sc.index).to_numpy(),
                    "bin": bins.astype(np.int64),
                }
            )
            .groupby(["source", "bin"], as_index=False).size()
            .rename(columns={"size": "n_docs"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    out = _fold_partials(
        docs.map_batches(_score_partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None),
        ["source", "bin"], ["n_docs"],
    )
    if out is None:
        return empty
    out["bin"] = out["bin"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["source", "bin"]).reset_index(drop=True)


def register_queries():
    return {
        "doc_token_counts": q_doc_token_counts,
        "doc_pack_stats": q_doc_pack_stats,
        "doc_chunks": q_doc_chunks,
        "docs_mixture_sample": q_docs_mixture_sample,
        "docs_near_dedup": q_docs_near_dedup,
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "doc_quality": q_doc_quality,
        "doc_fingerprint": q_doc_fingerprint,
        "dedup_exact": q_dedup_exact,
        "lang_id_counts": q_lang_id_counts,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embed_dup_pairs": q_embed_dup_pairs,
        "embed_centroids": q_embed_centroids,
        "embed_kmeans": q_embed_kmeans,
        "minhash_pairs": q_minhash_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "dup_clusters": q_dup_clusters,
        "embed_nn_join": q_embed_nn_join,
        "contamination_counts": q_contamination_counts,
        "pii_redaction": q_pii_redaction,
        "simhash_pairs": q_simhash_pairs,
        "media_decode": q_media_decode,
        "docs_curated": q_docs_curated,
        "docs_stratified_sample": q_docs_stratified_sample,
        "word_doc_freq": q_word_doc_freq,
        "docs_gopher_rules": q_docs_gopher_rules,
        "gram_source_except": q_gram_source_except,
        "docs_weighted_sample": q_docs_weighted_sample,
        "doc_top_terms": q_doc_top_terms,
        "docs_model_score": q_docs_model_score,
        "doc_prefix_editsim": q_doc_prefix_editsim,
        "docs_rep_bigram": q_docs_rep_bigram,
        "docs_len_trim": q_docs_len_trim,
        "source_word_kl": q_source_word_kl,
        "streaming_shard_distinct": q_streaming_shard_distinct,
        "embed_decontam": q_embed_decontam,
        "word_pmi_topk": q_word_pmi_topk,
        "doc_winnow_dups": q_doc_winnow_dups,
        "label_centroid_sim": q_label_centroid_sim,
        "source_vocab_jaccard": q_source_vocab_jaccard,
        "docs_dsir_weights": q_docs_dsir_weights,
        "ngram_containment_pairs": q_ngram_containment_pairs,
        "docs_score_deciles": q_docs_score_deciles,
        "docs_temperature_alloc": q_docs_temperature_alloc,
        "docs_stopword_trim": q_docs_stopword_trim,
        "docs_unigram_surprisal": q_docs_unigram_surprisal,
        "hashed_vocab_counts": q_hashed_vocab_counts,
        "doc_word_entropy": q_doc_word_entropy,
        "source_top_p_vocab": q_source_top_p_vocab,
        "source_zipf_slope": q_source_zipf_slope,
        "source_len_lognormal": q_source_len_lognormal,
        "doc_dup_spans": q_doc_dup_spans,
        "source_dup_rate": q_source_dup_rate,
        "source_overlap_matrix": q_source_overlap_matrix,
        "doc_novelty_frac": q_doc_novelty_frac,
        "source_len_mad": q_source_len_mad,
        "embed_quantize_error": q_embed_quantize_error,
        "lang_source_mi": q_lang_source_mi,
        "source_simpson": q_source_simpson,
        "doc_pagerank": q_doc_pagerank,
        "docs_bm25_topk": q_docs_bm25_topk,
        "lang_confusion": q_lang_confusion,
        "embed_semdedup": q_embed_semdedup,
        "source_fertility": q_source_fertility,
        "doc_continuation_pairs": q_doc_continuation_pairs,
        "dup_cluster_sizes": q_dup_cluster_sizes,
        "source_ngram_diversity": q_source_ngram_diversity,
        "corpus_version_diff": q_corpus_version_diff,
        "heaps_vocab_growth": q_heaps_vocab_growth,
        "corpus_drift_psi": q_corpus_drift_psi,
        "docs_score_auc": q_docs_score_auc,
        "events_spearman_daily": q_events_spearman_daily,
        "source_len_ks": q_source_len_ks,
        "source_bigram_cond_entropy": q_source_bigram_cond_entropy,
        "source_yule_k": q_source_yule_k,
        "source_hapax_ratio": q_source_hapax_ratio,
        "source_g2_keywords": q_source_g2_keywords,
        "word_skipgram_topk": q_word_skipgram_topk,
        "source_burrows_delta": q_source_burrows_delta,
        "word_length_hist": q_word_length_hist,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (SQL-expressible subset; the rest are rows-only checks)
# ---------------------------------------------------------------------------

# shared by ngram_jaccard_pairs and dup_clusters (its edge set)
def _lnu_sql(expr: str) -> str:
    """Per-factor 1e-6-unit quantized ln (lang_source_mi convention);
    GREATEST(x, 1) keeps vectorized ln(0) finite in dead CASE branches."""
    return (f"CAST(floor(ln(CAST(GREATEST({expr}, 1) AS DOUBLE)) "
            f"* 1000000 + 0.5) AS BIGINT)")


_G2_KEYWORDS_SQL = rf"""
            WITH w AS (
              SELECT source,
                     unnest(regexp_split_to_array(
                         trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                         '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), f AS (
              SELECT source, word, CAST(COUNT(*) AS BIGINT) AS a
              FROM w WHERE word <> '' GROUP BY 1, 2
            ), col AS (
              SELECT source, CAST(SUM(a) AS BIGINT) AS cs FROM f GROUP BY 1
            ), rw AS (
              SELECT word, CAST(SUM(a) AS BIGINT) AS r FROM f GROUP BY 1
            ), nn AS (
              SELECT CAST(SUM(a) AS BIGINT) AS n FROM f
            ), g AS (
              SELECT f.source, f.word, f.a,
                     rw.r - f.a AS b, col.cs - f.a AS c,
                     nn.n - rw.r - col.cs + f.a AS d,
                     rw.r AS r, col.cs AS cs, nn.n AS n
              FROM f
              JOIN col USING (source) JOIN rw USING (word) CROSS JOIN nn
              WHERE f.a >= 5
            ), t AS (
              SELECT source, word, a, b,
                     (CASE WHEN a > 0 THEN CAST(a AS HUGEINT)
                           * ({_lnu_sql('a')} + {_lnu_sql('n')}
                              - {_lnu_sql('r')} - {_lnu_sql('cs')})
                           ELSE 0 END
                      + CASE WHEN b > 0 THEN CAST(b AS HUGEINT)
                           * ({_lnu_sql('b')} + {_lnu_sql('n')}
                              - {_lnu_sql('r')} - {_lnu_sql('n - cs')})
                           ELSE 0 END
                      + CASE WHEN c > 0 THEN CAST(c AS HUGEINT)
                           * ({_lnu_sql('c')} + {_lnu_sql('n')}
                              - {_lnu_sql('n - r')} - {_lnu_sql('cs')})
                           ELSE 0 END
                      + CASE WHEN d > 0 THEN CAST(d AS HUGEINT)
                           * ({_lnu_sql('d')} + {_lnu_sql('n')}
                              - {_lnu_sql('n - r')} - {_lnu_sql('n - cs')})
                           ELSE 0 END) AS units
              FROM g
            )
            SELECT source, word, a AS n_source, b AS n_rest,
                   CAST(units AS BIGINT) AS g2_units,
                   round(CAST(2 * units AS DOUBLE) / 1000000.0, 6) AS g2
            FROM t
            QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY units DESC, word ASC) <= 10
            ORDER BY source, units DESC, word
        """


_NGRAM_PAIRS_SQL = r"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), grams AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
              FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
              WHERE len(w) >= 3
            ), counts AS (
              SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
              FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = doc_a
            JOIN counts cb ON cb.doc_id = doc_b
            WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
        """

# The synthetic documents corpus draws from this fixed 31-word vocabulary
# at every scale factor (verified at sf0.001/0.01/0.1); the simhash oracle
# embeds each word's ±1 bit contributions so DuckDB can reconstruct the
# signatures exactly. An out-of-vocabulary word would silently drop from
# the oracle's inner join — tests/test_oracle_parity pins vocab coverage.
_SIMHASH_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def _simhash_oracle_sql() -> str:
    r"""Exact all-pairs Hamming <= 3 over the deterministic SimHash
    signatures, reconstructed IN SQL from an embedded word -> ±1-bits
    table generated by the SAME hash kernel the engine uses
    (dedup._word_bit_matrix — the lang-id shared-table precedent). The
    tokenization mirrors simhash_batch exactly: ASCII-whitespace collapse,
    lower, split on ' ', drop empties. Signatures are carried as two
    32-bit halves (a 64-bit signed SUM of 1<<63 would overflow);
    hamming = popcount(xor) summed over halves. The engine side runs
    max_bucket=None, so LSH output == this brute force by the pigeonhole
    guarantee."""
    import numpy as np

    from .dedup import _word_bit_matrix

    bits = _word_bit_matrix(np.array(_SIMHASH_VOCAB, dtype=object))
    rows = ", ".join(
        "('%s', [%s])" % (w, ",".join(str(int(v)) for v in bits[i]))
        for i, w in enumerate(_SIMHASH_VOCAB)
    )
    return f"""
        WITH wb(word, bits) AS (VALUES {rows}),
        tok AS (
          SELECT doc_id,
                 unnest(string_split(lower(regexp_replace(
                   text, '[ \t\n\r\v\f]+', ' ', 'g')), ' ')) AS word
          FROM documents
        ), tf AS (SELECT doc_id, word FROM tok WHERE word <> ''),
        acc AS (
          SELECT tf.doc_id, r.i AS bit,
                 SUM(wb.bits[CAST(r.i AS INTEGER) + 1]) AS s
          FROM tf JOIN wb USING (word) CROSS JOIN range(64) r(i)
          GROUP BY 1, 2
        ),
        sig0 AS (
          SELECT doc_id,
            SUM(CASE WHEN bit < 32 AND s > 0
                THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
                ELSE 0 END) AS lo,
            SUM(CASE WHEN bit >= 32 AND s > 0
                THEN (CAST(1 AS BIGINT) << CAST(bit - 32 AS INTEGER))
                ELSE 0 END) AS hi
          FROM acc GROUP BY 1
        ),
        -- a doc with ZERO (in-vocabulary) words has signature 0 on the
        -- engine side (packbits of an all-zero accumulator); LEFT JOIN +
        -- COALESCE keeps it in the pair space instead of dropping it
        sig AS (
          SELECT d.doc_id, COALESCE(s.lo, 0) AS lo, COALESCE(s.hi, 0) AS hi
          FROM documents d LEFT JOIN sig0 s USING (doc_id)
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                   AS hamming
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
        FROM pairs WHERE hamming <= 3
    """


def _lang_vote_parts() -> tuple:
    """(intersection-count select list, winner CASE) generated from the
    SAME stopword tables the Ray heuristic uses
    (training/text.py:_LANG_STOPWORDS), so the two sides cannot drift.
    Tie semantics mirror the Python loop: first language (dict order)
    achieving the maximum wins; all-zero -> 'und'. list_intersect is
    set-semantics like the Python set &."""
    from .text import _LANG_STOPWORDS

    inter = ",\n                   ".join(
        f"len(list_intersect(words, [{', '.join(repr(w) for w in sorted(sw))}])) AS n_{lang}"
        for lang, sw in _LANG_STOPWORDS.items()
    )
    langs = list(_LANG_STOPWORDS)
    greatest = "greatest(" + ", ".join(f"n_{l}" for l in langs) + ")"
    case = f"CASE WHEN {greatest} = 0 THEN 'und' "
    case += " ".join(f"WHEN n_{l} = {greatest} THEN '{l}'" for l in langs)
    case += " END"
    return inter, case


def _lang_id_sql() -> str:
    inter, case = _lang_vote_parts()
    return rf"""
            WITH w AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(text), '[ \t\n\r\v\f]+') AS words
              FROM documents
            ), c AS (
              SELECT doc_id,
                   {inter}
              FROM w
            )
            SELECT {case} AS pred_lang, COUNT(*) AS n_rows FROM c GROUP BY 1
        """


def _lang_confusion_sql() -> str:
    inter, case = _lang_vote_parts()
    return rf"""
            WITH w AS (
              SELECT doc_id, lang,
                     regexp_split_to_array(lower(text), '[ \t\n\r\v\f]+') AS words
              FROM documents
            ), c AS (
              SELECT doc_id, lang,
                   {inter}
              FROM w
            ), p AS (
              SELECT lang, {case} AS pred_lang FROM c
            ), cells AS (
              SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
              FROM p GROUP BY 1, 2
            )
            SELECT lang, pred_lang, n,
                   CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT)
                       AS n_lang,
                   round(CAST(n AS DOUBLE)
                         / SUM(n) OVER (PARTITION BY lang), 6) AS share
            FROM cells ORDER BY 1, 2
        """


def _pii_sql() -> str:
    """Generated from the SAME pattern table the Ray redaction uses
    (training/text.py PII_PATTERNS) so the two sides cannot drift; the
    per-kind counts are taken at the same point in the replacement chain
    as redact_batch's loop (email counted on the raw text, ipv4 counted
    after the email pass)."""
    from .text import PII_PATTERNS

    (_, email_re, email_repl), (_, ip_re, ip_repl) = PII_PATTERNS
    return rf"""
            WITH p AS (
              SELECT source,
                     text
                     || repeat(' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.com now',
                               CAST(doc_id % 3 AS INTEGER))
                     || repeat(' from 10.1.2.3', CAST(doc_id % 2 AS INTEGER)) AS t
              FROM documents
            ), r AS (
              SELECT source,
                     len(regexp_extract_all(t, '{email_re}')) AS n_emails,
                     len(regexp_extract_all(regexp_replace(t, '{email_re}', '{email_repl}', 'g'), '{ip_re}')) AS n_ips,
                     length(regexp_replace(regexp_replace(t, '{email_re}', '{email_repl}', 'g'), '{ip_re}', '{ip_repl}', 'g')) AS chars_after
              FROM p
            )
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_emails) AS BIGINT) AS n_emails,
                   CAST(SUM(n_ips) AS BIGINT) AS n_ips,
                   CAST(SUM(chars_after) AS BIGINT) AS chars_after
            FROM r GROUP BY 1
        """


_SCORE_UNITS_SQL = (
    "CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 268435456"
    " + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 16777216"
    " + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1) * 1048576"
    " + (strpos('0123456789abcdef', substring(h, 4, 1)) - 1) * 65536"
    " + (strpos('0123456789abcdef', substring(h, 5, 1)) - 1) * 4096"
    " + (strpos('0123456789abcdef', substring(h, 6, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substring(h, 7, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substring(h, 8, 1)) - 1) * 1 AS BIGINT)"
)


def _pagerank_step(prev: str, cur: str) -> str:
    """One unrolled integer PageRank step (same floor arithmetic as
    training/graph.py pagerank_integer: contrib = (17*r)//(20*deg),
    base = 150000000 at scale 1e9)."""
    return f"""
            {cur} AS (
              SELECT d.node, d.d,
                     150000000 + COALESCE(c.s, 0) AS r
              FROM deg d LEFT JOIN (
                SELECT e.dst AS node,
                       SUM((17 * p.r) // (20 * p.d)) AS s
                FROM sym e JOIN {prev} p ON p.node = e.src
                GROUP BY 1
              ) c ON c.node = d.node
            )"""


def register_oracles():
    _PR_STEPS = ",".join(
        _pagerank_step(f"it{i}", f"it{i + 1}") for i in range(5)
    )
    _BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return {
        "docs_bm25_topk": rf"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text, ' ' || chr(9)
                         || chr(10) || chr(13) || chr(11) || chr(12))),
                         '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), words AS (
              SELECT doc_id, w[i] AS word
              FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)
              WHERE w[i] <> ''
            ), dl AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
              FROM words GROUP BY 1
            ), g AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n,
                     (SELECT SUM(dl) FROM dl) AS tt
            ), df AS (
              SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM words WHERE word IN ({_BM25_IN}) GROUP BY 1
            ), idf AS (
              SELECT word,
                     CAST(floor(ln(
                         CAST(2 * (SELECT n FROM g) - 2 * df + 1 AS DOUBLE)
                         / (2 * df + 1)) * 1000000 + 0.5) AS BIGINT) AS u
              FROM df
            ), tf AS (
              SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
              FROM words WHERE word IN ({_BM25_IN}) GROUP BY 1, 2
            ), sc AS (
              SELECT t.doc_id, d.dl,
                     CAST(floor(
                         CAST(i.u AS DOUBLE) * (22 * t.tf)
                         / ((10 * t.tf + 3)
                            + ((9.0 * d.dl) * (SELECT n FROM g))
                              / (SELECT tt FROM g))
                         + 0.5) AS BIGINT) AS su
              FROM tf t JOIN idf i USING (word) JOIN dl d USING (doc_id)
            ), agg AS (
              SELECT doc_id, CAST(MAX(dl) AS BIGINT) AS n_tokens,
                     CAST(SUM(su) AS BIGINT) AS score_units
              FROM sc GROUP BY 1
            )
            SELECT CAST(ROW_NUMBER() OVER (
                       ORDER BY score_units DESC, doc_id) AS BIGINT)
                       AS rank,
                   doc_id, n_tokens, score_units
            FROM agg
            ORDER BY score_units DESC, doc_id
            LIMIT 20
        """,
        "doc_pagerank": rf"""
            WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_SQL}),
            sym AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL
              SELECT doc_b, doc_a FROM pairs
            ), deg AS (
              SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
              FROM sym GROUP BY 1
            ), nn AS (SELECT COUNT(*) AS n FROM deg),
            it0 AS (
              SELECT node, d, 1000000000 // (SELECT n FROM nn) AS r
              FROM deg
            ),
            {_PR_STEPS}
            SELECT node AS doc_id,
                   CAST(d AS BIGINT) AS out_degree,
                   CAST(r AS BIGINT) AS pr_units
            FROM it5 ORDER BY 1
        """,
        "lang_source_mi": r"""
            WITH cells AS (
              SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY 1, 2
            ), m AS (
              SELECT lang, source, n,
                     SUM(n) OVER (PARTITION BY lang) AS r,
                     SUM(n) OVER (PARTITION BY source) AS c,
                     SUM(n) OVER () AS t
              FROM cells
            ), u AS (
              SELECT lang, source, n, r, c, t,
                     CAST(round(ln(CAST(n AS DOUBLE)) * 1000000, 0)
                          AS BIGINT)
                     + CAST(round(ln(CAST(t AS DOUBLE)) * 1000000, 0)
                            AS BIGINT)
                     - CAST(round(ln(CAST(r AS DOUBLE)) * 1000000, 0)
                            AS BIGINT)
                     - CAST(round(ln(CAST(c AS DOUBLE)) * 1000000, 0)
                            AS BIGINT) AS lnr
              FROM m
            )
            SELECT lang, source, n,
                   CAST(r AS BIGINT) AS lang_total,
                   CAST(c AS BIGINT) AS source_total,
                   CAST(t AS BIGINT) AS grand_total,
                   lnr AS ln_ratio_units,
                   round(CAST(n AS DOUBLE) * lnr / (t * 1000000.0), 6)
                       AS mi_term
            FROM u ORDER BY 1, 2
        """,
        "source_simpson": r"""
            WITH toks AS (
              SELECT source,
                     regexp_split_to_array(lower(trim(text, ' ' || chr(9)
                         || chr(10) || chr(13) || chr(11) || chr(12))),
                         '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), words AS (
              SELECT source, w[i] AS word
              FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)
              WHERE w[i] <> ''
            ), c AS (
              SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
              FROM words GROUP BY 1, 2
            )
            SELECT source,
                   CAST(SUM(n) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_vocab,
                   CAST(SUM(n * n) AS BIGINT) AS sumsq_tokens,
                   round(CAST(SUM(n * n) AS DOUBLE)
                         / (CAST(SUM(n) AS DOUBLE) * SUM(n)), 6)
                       AS simpson
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "source_overlap_matrix": r"""
            WITH d AS (
              SELECT DISTINCT source, substr(md5(text), 1, 16) AS h
              FROM documents
            ), sz AS (
              SELECT source, COUNT(*) AS n FROM d GROUP BY 1
            ), m AS (
              SELECT a.source AS src_a, b.source AS src_b,
                     COUNT(*) AS n
              FROM d a JOIN d b USING (h)
              WHERE a.source < b.source
              GROUP BY 1, 2
            )
            SELECT sa.source AS src_a, sb.source AS src_b,
                   CAST(sa.n AS BIGINT) AS n_a,
                   CAST(sb.n AS BIGINT) AS n_b,
                   CAST(COALESCE(m.n, 0) AS BIGINT) AS n_shared,
                   round(CAST(COALESCE(m.n, 0) AS DOUBLE)
                         / least(sa.n, sb.n), 6) AS overlap
            FROM sz sa
            JOIN sz sb ON sa.source < sb.source
            LEFT JOIN m ON m.src_a = sa.source AND m.src_b = sb.source
            ORDER BY 1, 2
        """,
        "doc_novelty_frac": r"""
            WITH f AS (
              SELECT source,
                     CASE WHEN doc_id = min(doc_id) OVER (
                              PARTITION BY substr(md5(text), 1, 16))
                          THEN 1 ELSE 0 END AS novel
              FROM documents
            )
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(novel) AS BIGINT) AS n_novel,
                   round(CAST(SUM(novel) AS DOUBLE) / COUNT(*), 6)
                       AS novelty
            FROM f GROUP BY 1 ORDER BY 1
        """,
        "source_len_mad": r"""
            WITH m AS (
              SELECT source, median(n_chars) AS med
              FROM documents GROUP BY 1
            )
            SELECT d.source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(m.med AS DOUBLE) AS med_len,
                   CAST(median(abs(CAST(d.n_chars AS DOUBLE) - m.med))
                        AS DOUBLE) AS mad_len
            FROM documents d JOIN m USING (source)
            GROUP BY d.source, m.med
            ORDER BY d.source
        """,
        "embed_quantize_error": r"""
            WITH x AS (
              SELECT t.i AS dim,
                     CAST(floor(CAST(embedding[CAST(t.i AS INTEGER)]
                                     AS DOUBLE) * 1000000 + 0.5)
                          AS BIGINT) AS xq
              FROM embeddings,
                   (SELECT unnest(range(1, 65)) AS i) t
            ), s AS (
              SELECT dim, MAX(abs(xq)) AS ma FROM x GROUP BY 1
            ), q AS (
              SELECT x.dim, xq, ma,
                     CAST(floor(127.0 * xq / ma + 0.5) AS BIGINT) AS qv
              FROM x JOIN s USING (dim) WHERE ma > 0
            )
            SELECT CAST(dim AS BIGINT) AS dim,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MAX(ma) AS BIGINT) AS max_abs_units,
                   CAST(MAX(abs(127 * xq - qv * ma)) AS BIGINT)
                       AS max_err_units,
                   CAST(SUM(abs(127 * xq - qv * ma)) AS BIGINT)
                       AS sum_err_units,
                   round(CAST(SUM(abs(127 * xq - qv * ma)) AS DOUBLE)
                         / (COUNT(*) * 127000000.0), 6) AS mean_abs_err
            FROM q GROUP BY 1 ORDER BY 1
        """,
        "source_dup_rate": r"""
            WITH toks AS (
              SELECT doc_id, source,
                     regexp_split_to_array(lower(trim(text, ' ' || chr(9)
                         || chr(10) || chr(13) || chr(11) || chr(12))),
                         '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), docs5 AS (
              SELECT doc_id, source, len(w) - 4 AS n_windows, w
              FROM toks WHERE len(w) >= 5
            ), wins AS (
              SELECT doc_id, source, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                     || ' ' || w[i+3] || ' ' || w[i+4] AS gram
              FROM docs5, UNNEST(range(1, n_windows + 1)) AS t(i)
            ), dup AS (
              SELECT gram FROM wins
              GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
            ), dc AS (
              SELECT source, COUNT(*) AS n_dup
              FROM wins JOIN dup USING (gram) GROUP BY 1
            ), tot AS (
              SELECT source, SUM(n_windows) AS n_windows
              FROM docs5 GROUP BY 1
            )
            SELECT t.source, CAST(t.n_windows AS BIGINT) AS n_windows,
                   CAST(COALESCE(dc.n_dup, 0) AS BIGINT) AS n_dup_windows,
                   round(CAST(COALESCE(dc.n_dup, 0) AS DOUBLE)
                         / t.n_windows, 6) AS dup_rate
            FROM tot t LEFT JOIN dc ON dc.source = t.source
            ORDER BY t.source
        """,
        "doc_dup_spans": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text, ' ' || chr(9)
                         || chr(10) || chr(13) || chr(11) || chr(12))),
                         '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), docs5 AS (
              SELECT doc_id, len(w) - 4 AS n_windows, w
              FROM toks WHERE len(w) >= 5
            ), wins AS (
              SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                     || w[i+3] || ' ' || w[i+4] AS gram
              FROM docs5, UNNEST(range(1, n_windows + 1)) AS t(i)
            ), dup AS (
              SELECT gram FROM wins
              GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
            ), dc AS (
              SELECT doc_id, COUNT(*) AS n_dup
              FROM wins JOIN dup USING (gram) GROUP BY 1
            )
            SELECT d.doc_id, CAST(d.n_windows AS BIGINT) AS n_windows,
                   CAST(COALESCE(dc.n_dup, 0) AS BIGINT) AS n_dup_windows,
                   round(CAST(COALESCE(dc.n_dup, 0) AS DOUBLE)
                         / d.n_windows, 6) AS dup_frac
            FROM docs5 d LEFT JOIN dc ON dc.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        "source_len_lognormal": r"""
            WITH u AS (
              SELECT source,
                     CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000, 0)
                          AS BIGINT) AS u
              FROM documents WHERE n_chars > 0
            )
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(u) AS BIGINT) AS sum_ln_units,
                   CAST(SUM(u * u) AS BIGINT) AS sumsq_ln_units
            FROM u GROUP BY 1
        """,
        "source_zipf_slope": r"""
            WITH w AS (
              SELECT source,
                     unnest(regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), sw AS (
              SELECT source, word, COUNT(*) AS n FROM w
              WHERE word <> '' GROUP BY 1, 2
            ), r AS (
              SELECT source, n,
                     ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY n DESC, word
                     ) AS rnk
              FROM sw
            ), u AS (
              SELECT source,
                     CAST(round(ln(CAST(rnk AS DOUBLE)) * 1000000, 0)
                          AS BIGINT) AS xu,
                     CAST(round(ln(CAST(n AS DOUBLE)) * 1000000, 0)
                          AS BIGINT) AS yu
              FROM r
            ), s AS (
              SELECT source, CAST(COUNT(*) AS HUGEINT) AS v,
                     CAST(SUM(xu) AS HUGEINT) AS sx,
                     CAST(SUM(yu) AS HUGEINT) AS sy,
                     CAST(SUM(xu * xu) AS HUGEINT) AS sxx,
                     CAST(SUM(xu * yu) AS HUGEINT) AS sxy
              FROM u GROUP BY 1 HAVING COUNT(*) >= 2
            )
            SELECT source, CAST(v AS BIGINT) AS n_vocab,
                   CAST(sx AS BIGINT) AS sx_units,
                   CAST(sy AS BIGINT) AS sy_units,
                   CAST(sxx AS BIGINT) AS sxx_units,
                   CAST(sxy AS BIGINT) AS sxy_units,
                   round(CAST(v * sxy - sx * sy AS DOUBLE)
                         / CAST(v * sxx - sx * sx AS DOUBLE), 6)
                     AS zipf_slope
            FROM s
        """,
        "source_top_p_vocab": r"""
            WITH w AS (
              SELECT source,
                     unnest(regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), sw AS (
              SELECT source, word, COUNT(*) AS n FROM w
              WHERE word <> '' GROUP BY 1, 2
            ), tot AS (
              SELECT source, CAST(SUM(n) AS BIGINT) AS total FROM sw
              GROUP BY 1
            ), r AS (
              SELECT source, word, n,
                     SUM(n) OVER (
                       PARTITION BY source ORDER BY n DESC, word
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS cum,
                     ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY n DESC, word
                     ) AS rn
              FROM sw
            )
            SELECT r.source, r.word, CAST(r.n AS BIGINT) AS n,
                   CAST(r.rn AS BIGINT) AS rnk
            FROM r JOIN tot USING (source)
            WHERE (r.cum - r.n) * 10 < tot.total * 9
        """,
        "hashed_vocab_counts": r"""
            WITH w AS (
              SELECT source,
                     unnest(regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), wf AS (SELECT source, word FROM w WHERE word <> ''),
            h AS (SELECT source, md5(word) AS hx FROM wf),
            b AS (
              SELECT source,
                     CAST(((strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substring(hx, 2, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substring(hx, 3, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substring(hx, 4, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substring(hx, 5, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substring(hx, 6, 1)) - 1) * 256 + (strpos('0123456789abcdef', substring(hx, 7, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(hx, 8, 1)) - 1) * 1) % 32 AS BIGINT) AS bucket
              FROM h
            )
            SELECT source, bucket, COUNT(*) AS n_tokens
            FROM b GROUP BY 1, 2
        """,
        "doc_word_entropy": r"""
            WITH w AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), tf AS (
              SELECT doc_id, word, COUNT(*) AS c FROM w
              WHERE word <> '' GROUP BY 1, 2
            ), t AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nw,
                     CAST(COUNT(*) AS BIGINT) AS nt
              FROM tf GROUP BY 1
            ), ent AS (
              SELECT tf.doc_id,
                     round(SUM(-(CAST(tf.c AS DOUBLE) / t.nw)
                               * ln(CAST(tf.c AS DOUBLE) / t.nw)), 6) AS entropy
              FROM tf JOIN t USING (doc_id) GROUP BY 1
            )
            SELECT d.doc_id,
                   COALESCE(t.nw, 0) AS n_words,
                   COALESCE(t.nt, 0) AS n_types,
                   CASE WHEN t.nw IS NULL THEN 0.0
                        ELSE round(CAST(t.nt AS DOUBLE) / t.nw, 6) END AS ttr,
                   COALESCE(ent.entropy, 0.0) AS entropy
            FROM documents d
            LEFT JOIN t USING (doc_id) LEFT JOIN ent USING (doc_id)
        """,
        "docs_unigram_surprisal": r"""
            WITH w AS (
              SELECT doc_id, source, word FROM (
                SELECT doc_id, source,
                       unnest(regexp_split_to_array(
                           trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                           '[ \t\n\r\v\f]+')) AS word
                FROM documents
              ) WHERE word <> ''
            ), cnt AS (
              SELECT word, COUNT(*) AS c FROM w GROUP BY 1
            ), tot AS (SELECT COUNT(*) AS t FROM w),
            sc AS (
              SELECT w.doc_id, any_value(w.source) AS source,
                     AVG(-ln(CAST(cnt.c AS DOUBLE) / tot.t)) AS score
              FROM w JOIN cnt USING (word), tot
              GROUP BY w.doc_id
            )
            SELECT source,
                   CAST(floor(round(score, 6) * 10) AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM sc GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "docs_stopword_trim": r"""
            WITH w AS (
              SELECT doc_id, source, word FROM (
                SELECT doc_id, source,
                       unnest(regexp_split_to_array(
                           trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                           '[ \t\n\r\v\f]+')) AS word
                FROM documents
              ) WHERE word <> ''
            ), n AS (SELECT COUNT(*) AS n_total FROM documents),
            stop AS (
              SELECT word
              FROM (SELECT word, COUNT(DISTINCT doc_id) AS df
                    FROM w GROUP BY 1), n
              WHERE 2 * df > n_total
            ), tok AS (
              SELECT source,
                     SUM(CASE WHEN word IN (SELECT word FROM stop)
                         THEN 0 ELSE 1 END) AS kept_tokens,
                     SUM(CASE WHEN word IN (SELECT word FROM stop)
                         THEN 1 ELSE 0 END) AS removed_tokens
              FROM w GROUP BY 1
            ), d AS (
              SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
            )
            SELECT d.source, CAST(d.n_docs AS BIGINT) AS n_docs,
                   CAST(COALESCE(tok.kept_tokens, 0) AS BIGINT)
                       AS kept_tokens,
                   CAST(COALESCE(tok.removed_tokens, 0) AS BIGINT)
                       AS removed_tokens,
                   CAST((SELECT COUNT(*) FROM stop) AS BIGINT)
                       AS n_stopwords
            FROM d LEFT JOIN tok ON d.source = tok.source
            ORDER BY 1
        """,
        "doc_winnow_dups": _winnow_oracle_sql(),
        "ngram_containment_pairs": r"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), grams AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
              FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
              WHERE len(w) >= 3
            ), counts AS (
              SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
              FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(CAST(i AS DOUBLE) / LEAST(ca.n, cb.n), 6)
                       AS containment
            FROM inter
            JOIN counts ca ON ca.doc_id = doc_a
            JOIN counts cb ON cb.doc_id = doc_b
            WHERE CAST(i AS DOUBLE) / LEAST(ca.n, cb.n) >= 0.8
        """,
        "docs_score_deciles": f"""
            WITH m AS (SELECT source, md5(text) AS h FROM documents),
            v AS (SELECT source, {_SCORE_UNITS_SQL} AS units FROM m),
            qs AS (SELECT source, units // 1048576 AS q FROM v),
            nn AS (SELECT COUNT(*) AS n FROM qs),
            ord AS (SELECT q, ROW_NUMBER() OVER (ORDER BY q) AS rn FROM qs),
            th AS (
              SELECT t.k,
                     MAX(CASE WHEN o.rn = GREATEST(1, (t.k * nn.n) // 10)
                              THEN o.q END) AS thr
              FROM (SELECT unnest(range(1, 10)) AS k) t, nn, ord o
              GROUP BY t.k
            ), b AS (
              SELECT qs.source,
                     (SELECT COUNT(*) FROM th WHERE th.thr <= qs.q) AS decile
              FROM qs
            )
            SELECT source, CAST(decile AS BIGINT) AS decile,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM b GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "docs_temperature_alloc": """
            WITH c AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY 1
            ), w AS (
              SELECT source, n_docs,
                     CAST(floor(1000000.0 * pow(n_docs, 0.5) + 0.5)
                          AS BIGINT) AS wu
              FROM c
            ), t AS (SELECT SUM(wu) AS den FROM w),
            b AS (
              SELECT source, n_docs, (10000 * wu) // den AS base,
                     (10000 * wu) % den AS rem
              FROM w, t
            ), l AS (SELECT 10000 - SUM(base) AS leftover FROM b),
            r AS (
              SELECT source, n_docs, base,
                     ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
              FROM b
            )
            SELECT source, n_docs,
                   CAST(base + CASE WHEN rk <= (SELECT leftover FROM l)
                                    THEN 1 ELSE 0 END AS BIGINT) AS alloc
            FROM r ORDER BY source
        """,
        "docs_dsir_weights": r"""
            WITH tok AS (
              SELECT doc_id, source,
                     unnest(regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), tf AS (SELECT doc_id, source, word FROM tok WHERE word <> ''),
            cnt AS (
              SELECT word,
                     SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c_tgt,
                     SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS c_raw
              FROM tf GROUP BY 1
            ), tot AS (
              SELECT COUNT(*) AS v, SUM(c_tgt) AS t_tgt, SUM(c_raw) AS t_raw
              FROM cnt
            ), wu AS (
              SELECT word,
                     CAST(floor(1000000.0 * (
                         ln((c_tgt + 1.0) / (t_tgt + v))
                       - ln((c_raw + 1.0) / (t_raw + v))) + 0.5) AS BIGINT)
                         AS units
              FROM cnt, tot
            ), docw AS (
              SELECT tf.doc_id,
                     CAST(SUM(COALESCE(wu.units, 0)) AS BIGINT) AS logw
              FROM tf LEFT JOIN wu USING (word) GROUP BY 1
            )
            SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COALESCE(SUM(CASE WHEN COALESCE(w.logw, 0) > 0
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_selected,
                   CAST(COALESCE(SUM(COALESCE(w.logw, 0)), 0) AS BIGINT)
                       AS sum_units
            FROM documents d LEFT JOIN docw w ON w.doc_id = d.doc_id
            GROUP BY 1 ORDER BY 1
        """,
        "docs_rep_bigram": r"""
            WITH toks AS (
              SELECT doc_id, source,
                     regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), bg AS (
              SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
              FROM toks, UNNEST(range(1, len(w))) AS t(i)
              WHERE len(w) >= 2
            ), cnt AS (
              SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2
            ), top AS (
              SELECT doc_id, MAX(c) AS top_cnt,
                     CAST(SUM(c) AS BIGINT) AS n_bg
              FROM cnt GROUP BY 1
            )
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN top_cnt IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bigram_docs,
                   CAST(SUM(CASE WHEN 16 * top_cnt >= n_bg THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
                   CAST(COALESCE(SUM(top_cnt), 0) AS BIGINT) AS sum_top_cnt
            FROM toks LEFT JOIN top USING (doc_id)
            GROUP BY 1
        """,
        "docs_len_trim": r"""
            WITH nn AS (SELECT COUNT(*) AS n FROM documents),
            ord AS (
              SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) AS rn
              FROM documents
            ), th AS (
              SELECT CAST(MAX(CASE WHEN rn = GREATEST(1, (5 * n) // 100) THEN n_chars END) AS BIGINT) AS p05,
                     CAST(MAX(CASE WHEN rn = GREATEST(1, (95 * n) // 100) THEN n_chars END) AS BIGINT) AS p95
              FROM ord, nn
            )
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN n_chars BETWEEN p05 AND p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                   CAST(SUM(CASE WHEN n_chars BETWEEN p05 AND p95 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
                   MAX(p05) AS p05, MAX(p95) AS p95
            FROM documents, th GROUP BY 1
        """,
        "source_vocab_jaccard": r"""
            WITH w AS (
              SELECT source,
                     unnest(regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), wf AS (SELECT DISTINCT source, word FROM w WHERE word <> ''),
            sz AS (SELECT source, COUNT(*) AS n FROM wf GROUP BY 1),
            ix AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS ni
                   FROM wf a JOIN wf b ON a.word = b.word AND a.source < b.source
                   GROUP BY 1, 2)
            SELECT src_a, src_b, CAST(za.n AS BIGINT) AS n_a,
                   CAST(zb.n AS BIGINT) AS n_b, CAST(ni AS BIGINT) AS n_inter,
                   round(CAST(ni AS DOUBLE) / (za.n + zb.n - ni), 6) AS jaccard
            FROM ix JOIN sz za ON za.source = src_a
                    JOIN sz zb ON zb.source = src_b
        """,
        "streaming_shard_distinct": r"""
            WITH h AS (
              SELECT ((strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1)) % 8 AS shard,
                     text
              FROM documents
            ), c AS (
              SELECT shard, COUNT(DISTINCT text) AS n_distinct FROM h GROUP BY 1
            )
            SELECT CAST(g.s AS BIGINT) AS shard,
                   CAST(COALESCE(c.n_distinct, 0) AS BIGINT) AS n_distinct
            FROM (SELECT unnest(range(8)) AS s) g
            LEFT JOIN c ON c.shard = g.s
        """,
        "source_word_kl": r"""
            WITH w AS (
              SELECT source,
                     unnest(regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), wf AS (SELECT source, word FROM w WHERE word <> ''),
            sw AS (SELECT source, word, COUNT(*) AS c_sw FROM wf GROUP BY 1, 2),
            s AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS c_s FROM sw GROUP BY 1),
            cw AS (SELECT word, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY 1),
            tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS c_tot FROM cw)
            SELECT sw.source, sw.word, sw.c_sw, s.c_s, cw.c_w,
                   round(ln((CAST(sw.c_sw AS DOUBLE) / s.c_s) / (CAST(cw.c_w AS DOUBLE) / c_tot)), 6) AS log_ratio,
                   round((CAST(sw.c_sw AS DOUBLE) / s.c_s) * ln((CAST(sw.c_sw AS DOUBLE) / s.c_s) / (CAST(cw.c_w AS DOUBLE) / c_tot)), 6) AS kl_term
            FROM sw JOIN s USING (source) JOIN cw USING (word), tot
        """,





        "doc_prefix_editsim": """
            WITH p AS (
              SELECT doc_id, substring(text, 1, 24) AS pfx FROM documents
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
            FROM p a JOIN p b
              ON substring(a.pfx, 1, 4) = substring(b.pfx, 1, 4)
             AND a.doc_id < b.doc_id
            WHERE levenshtein(a.pfx, b.pfx) <= 4
        """,
        "docs_model_score": """
            WITH m AS (
              SELECT source, md5(text) AS h FROM documents
            ), v AS (
              SELECT source, CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substring(h, 4, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substring(h, 5, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substring(h, 6, 1)) - 1) * 256 + (strpos('0123456789abcdef', substring(h, 7, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(h, 8, 1)) - 1) * 1 AS BIGINT) AS units FROM m
            )
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN units > 2147483648 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
                   CAST(SUM(units) AS BIGINT) AS sum_score_units
            FROM v GROUP BY 1
        """,
        "doc_top_terms": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), tf AS (
              SELECT doc_id, word, COUNT(*) AS tf FROM (
                SELECT doc_id, unnest(w) AS word FROM toks
              ) WHERE word <> '' GROUP BY 1, 2
            ), df AS (
              SELECT word, COUNT(*) AS df FROM tf GROUP BY 1
            ), n AS (SELECT COUNT(*) AS nd FROM documents),
            s AS (
              SELECT tf.doc_id, tf.word,
                     round(tf.tf * ln(CAST(n.nd AS DOUBLE) / df.df), 6) AS score
              FROM tf JOIN df USING (word), n
            ), r AS (
              SELECT doc_id, word, score,
                     ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY score DESC, word ASC
                     ) AS rn
              FROM s
            )
            SELECT doc_id, word, score, CAST(rn AS BIGINT) AS rank
            FROM r WHERE rn <= 3
        """,
        "gram_source_except": r"""
            WITH toks AS (
              SELECT CAST(COALESCE(NULLIF(regexp_replace(source, '[^0-9]', '', 'g'), ''), '0') AS BIGINT) % 2 AS odd,
                     regexp_split_to_array(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))), '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), grams AS (
              SELECT DISTINCT odd, w[i] AS head,
                     w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
              FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
              WHERE len(w) >= 3
            ), ex AS (
              SELECT head, gram FROM grams GROUP BY head, gram HAVING MAX(odd) = 0
            )
            SELECT head AS word, COUNT(*) AS n_exclusive_grams
            FROM ex GROUP BY 1
        """,
        "docs_weighted_sample": """
            WITH m AS (
              SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
              FROM documents
            ), k AS (
              SELECT doc_id,
                     round(-ln((CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substring(h, 4, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substring(h, 5, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substring(h, 6, 1)) - 1) * 256 + (strpos('0123456789abcdef', substring(h, 7, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(h, 8, 1)) - 1) * 1 AS BIGINT) + 1) / 4294967296.0)
                           / n_chars, 9) AS samp_key
              FROM m
            )
            SELECT doc_id, samp_key FROM k ORDER BY samp_key, doc_id LIMIT 20
        """,
        "docs_gopher_rules": r"""
            WITH w AS (
              SELECT source,
                     regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+') AS ws,
                     length(regexp_replace(text, '[ \t\n\r\v\f]+', '', 'g')) AS n_wchars
              FROM documents
            ), m AS (
              SELECT source,
                     len(ws) AS n_words,
                     len(list_distinct(ws)) AS n_uniq,
                     n_wchars,
                     len(list_filter(ws, x -> x IN ('the','a','and','of','to','in','is','that','for','it'))) AS n_stop
              FROM w
            ), f AS (
              SELECT source,
                     CAST(n_words BETWEEN 20 AND 90 AS BIGINT) AS wc_ok,
                     CAST(n_wchars >= 4 * n_words AS BIGINT) AS mwl_ok,
                     CAST(20 * n_uniq >= 11 * n_words AS BIGINT) AS uniq_ok,
                     CAST(n_stop >= 2 AS BIGINT) AS stop_ok
              FROM m
            )
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(wc_ok) AS BIGINT) AS n_wc_ok,
                   CAST(SUM(mwl_ok) AS BIGINT) AS n_mwl_ok,
                   CAST(SUM(uniq_ok) AS BIGINT) AS n_uniq_ok,
                   CAST(SUM(stop_ok) AS BIGINT) AS n_stop_ok,
                   CAST(SUM(wc_ok * mwl_ok * uniq_ok * stop_ok) AS BIGINT) AS n_pass
            FROM f GROUP BY 1
        """,
        "docs_stratified_sample": r"""
            SELECT source, doc_id FROM (
                SELECT source, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rk
                FROM documents
            ) WHERE rk <= 5
        """,
        "embed_decontam": r"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), ev AS (
              SELECT * FROM e WHERE vec_id % 97 = 0
            ), tr AS (
              SELECT * FROM e WHERE vec_id % 97 <> 0
            ), s AS (
              SELECT tr.vec_id, ev.vec_id AS eval_id,
                     round(list_cosine_similarity(tr.v, ev.v), 6) AS cos,
                     ROW_NUMBER() OVER (
                         PARTITION BY tr.vec_id
                         ORDER BY round(list_cosine_similarity(tr.v, ev.v), 6) DESC,
                                  ev.vec_id ASC
                     ) AS rk
              FROM tr JOIN ev ON true
            )
            SELECT vec_id, eval_id, cos FROM s
            WHERE rk = 1 AND cos >= 0.3
            ORDER BY vec_id
        """,
        "word_pmi_topk": r"""
            WITH toks AS (
              SELECT regexp_split_to_array(
                  trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                  '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), uni AS (
              SELECT word, COUNT(*) AS c FROM (
                SELECT unnest(w) AS word FROM toks
              ) WHERE word <> '' GROUP BY 1
            ), nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
            bi AS (
              SELECT w[i] AS word_a, w[i+1] AS word_b, COUNT(*) AS c
              FROM toks, UNNEST(range(1, len(w))) AS t(i)
              GROUP BY 1, 2
            ), nb AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM bi)
            SELECT word_a, word_b, bi.c AS n,
                   round(ln((bi.c / nb.n) /
                            ((ua.c / nu.n) * (ub.c / nu.n))), 6) AS pmi
            FROM bi
            JOIN uni ua ON ua.word = word_a
            JOIN uni ub ON ub.word = word_b, nu, nb
            WHERE bi.c >= 5
            ORDER BY pmi DESC, word_a ASC, word_b ASC
            LIMIT 20
        """,
        "word_doc_freq": r"""
            WITH w AS (
              SELECT DISTINCT doc_id, word FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(
                           trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                           '[ \t\n\r\v\f]+')) AS word
                FROM documents
              ) WHERE word <> ''
            ), d AS (
              SELECT word, COUNT(*) AS df FROM w GROUP BY 1
            ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
            SELECT word, df, ROUND(LN(CAST(n_docs AS DOUBLE) / df), 6) AS idf
            FROM d, n
            ORDER BY df DESC, word ASC LIMIT 30
        """,
        "doc_token_counts": r"""
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+'))) AS BIGINT) AS n_ws_tokens
            FROM documents GROUP BY 1
        """,
        "doc_chunks": r"""
            WITH d AS (
              SELECT doc_id,
                     len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+')) AS n
              FROM documents
            ), c AS (
              SELECT doc_id, n,
                     CASE WHEN n <= 16 THEN 1
                          ELSE 1 + CAST(ceil((n - 16) / 12.0) AS BIGINT)
                     END AS n_chunks
              FROM d
            )
            SELECT doc_id,
                   CAST(u.i AS BIGINT) AS chunk_seq,
                   CAST(least(16, n - u.i * 12) AS BIGINT) AS n_chunk_tokens
            FROM c, UNNEST(range(0, n_chunks)) AS u(i)
        """,
        "docs_mixture_sample": """
            WITH c AS (
              SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
            ), m AS (SELECT MIN(n_docs) AS mn FROM c),
            k AS (
              SELECT source, n_docs,
                     LEAST(10000, 10000 * m.mn // n_docs) AS cutoff
              FROM c, m
            )
            SELECT k.source,
                   CAST(k.n_docs AS BIGINT) AS n_docs,
                   CAST(COALESCE(SUM(CASE WHEN d.doc_id % 10000 < k.cutoff
                                     THEN 1 ELSE 0 END), 0) AS BIGINT)
                     AS n_sampled,
                   CAST(k.cutoff AS BIGINT) AS cutoff
            FROM k JOIN documents d USING (source)
            GROUP BY 1, 2, k.cutoff
        """,
        "doc_pack_stats": r"""
            WITH t AS (
              SELECT source, doc_id,
                     len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+')) AS n_tok
              FROM documents
            ), c AS (
              SELECT source, doc_id, n_tok,
                     COALESCE(SUM(n_tok) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS tok_offset
              FROM t
            )
            SELECT source, CAST(tok_offset // 2048 AS BIGINT) AS pack_id,
                   COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
            FROM c GROUP BY 1, 2
        """,
        "label_centroid_sim": r"""
            WITH u AS (
              SELECT label,
                     unnest(embedding) AS x,
                     unnest(range(len(embedding))) AS pos
              FROM embeddings
            ), c AS (
              SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
                     round(avg(CAST(x AS DOUBLE)), 6) AS v
              FROM u GROUP BY 1, 2
            ), nr AS (
              SELECT label, sqrt(SUM(v * v)) AS nrm FROM c GROUP BY 1
            ), d AS (
              SELECT a.label AS label_a, b.label AS label_b, SUM(a.v * b.v) AS dot
              FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
              GROUP BY 1, 2
            )
            SELECT label_a, label_b,
                   round(dot / (na.nrm * nb.nrm), 6) AS cos
            FROM d
            JOIN nr na ON na.label = label_a
            JOIN nr nb ON nb.label = label_b
            ORDER BY label_a, label_b
        """,
        "embed_centroids": r"""
            WITH u AS (
              SELECT label,
                     unnest(embedding) AS x,
                     unnest(range(len(embedding))) AS pos
              FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(pos AS BIGINT) AS pos,
                   round(avg(CAST(x AS DOUBLE)), 6) AS centroid
            FROM u GROUP BY 1, 2
        """,
        "doc_bpe_tokens": r"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+')) AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       ' ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+')) AS n_bpe_pieces
            FROM documents
        """,
        "doc_quality": r"""
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+')) AS n_words,
                   length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
                   length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
                   length(text) < 100 AS is_short
            FROM documents
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
                   substring(md5(lower(regexp_replace(text, '\s+', ' ', 'g'))), 1, 16) AS fp
            FROM documents
        """,
        "dedup_exact": """
            SELECT substring(md5(text), 1, 16) AS text_hash,
                   MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "ann_topk": """
            WITH q AS (
              SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id IN (0, 1)
            ), s AS (
              SELECT q.qid AS query_id, e.vec_id,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.qid
                       ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC,
                                e.vec_id ASC
                     ) AS rn
              FROM embeddings e, q
            )
            SELECT query_id, vec_id, round(sim, 6) AS cosine FROM s WHERE rn <= 10
        """,
        "embed_dup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.95
        """,
        "pii_redaction": _pii_sql(),
        "contamination_counts": r"""
            WITH bench AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
            ), bg AS (
              SELECT DISTINCT substring(b.text, CAST(i AS INTEGER), 13) AS g
              FROM bench b, UNNEST(range(1, length(b.text) - 11)) t(i)
            ), dg AS (
              SELECT DISTINCT d.doc_id, substring(d.text, CAST(i AS INTEGER), 13) AS g
              FROM documents d, UNNEST(range(1, length(d.text) - 11)) t(i)
              WHERE d.doc_id % 97 <> 0
            ), hits AS (
              SELECT DISTINCT dg.doc_id FROM dg JOIN bg USING (g)
            )
            SELECT d.source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
            FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
            WHERE d.doc_id % 97 <> 0
            GROUP BY 1
        """,
        "embed_nn_join": r"""
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            )
            SELECT vec_id, nn_id, cos FROM (
                SELECT a.vec_id, b.vec_id AS nn_id,
                       round(list_cosine_similarity(a.v, b.v), 6) AS cos,
                       ROW_NUMBER() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                                    b.vec_id ASC
                       ) AS rk
                FROM e a JOIN e b ON a.vec_id <> b.vec_id
            ) WHERE rk = 1
        """,
        "ngram_jaccard_pairs": _NGRAM_PAIRS_SQL,
        "dup_clusters": rf"""
            WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_SQL}),
            und AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            nodes AS (SELECT DISTINCT u AS node FROM und),
            walk(node, label) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT und.v, walk.label FROM walk JOIN und ON und.u = walk.node
            )
            SELECT node AS doc_id, MIN(label) AS cluster_rep
            FROM walk GROUP BY 1
        """,
        "docs_near_dedup": rf"""
            WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_SQL}),
            und AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            nodes AS (SELECT DISTINCT u AS node FROM und),
            walk(node, label) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT und.v, walk.label FROM walk JOIN und ON und.u = walk.node
            ),
            cc AS (SELECT node, MIN(label) AS rep FROM walk GROUP BY 1),
            dropped AS (SELECT node AS doc_id FROM cc WHERE node <> rep)
            SELECT d.source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept
            FROM documents d LEFT JOIN dropped dr USING (doc_id)
            GROUP BY 1
        """,
        "docs_curated": r"""
            WITH q AS (
              SELECT doc_id, text,
                     len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+')) AS n_words,
                     length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct
              FROM documents
            ), f AS (
              SELECT * FROM q
              WHERE n_words >= 10 AND n_punct <= 0.2 * n_words
            )
            SELECT MIN(doc_id) AS doc_id FROM f GROUP BY text
        """,
        "media_decode": """
            SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'audio/wav'
                        WHEN doc_id % 3 = 1 THEN 'image/ppm'
                        ELSE 'image/fake' END AS media_type,
                   CAST(strlen(text) AS INTEGER) AS decoded_width,
                   1 AS decoded_height
            FROM documents
        """,
        "lang_id_counts": _lang_id_sql(),
        "lang_confusion": _lang_confusion_sql(),
        # SemDeDup summary: assignment = argmax of 6dp-rounded cosine to the
        # first-8 vectors (lowest-cid tie-break), augmented corpus = base +
        # planted near-copies (dim 1 shifted +0.25, an exact binary fraction)
        # for vec_id % 4 == 0 under id 1_000_000 + vec_id; dup = EXISTS a
        # lower-id same-cluster vector at rounded cosine >= 0.95.
        "embed_semdedup": r"""
            WITH base AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), aug AS (
              SELECT vec_id, v FROM base
              UNION ALL
              SELECT 1000000 + vec_id,
                     list_transform(range(1, len(v) + 1),
                         i -> CASE WHEN i = 1 THEN v[1] + 0.25
                                   ELSE v[i] END) AS v
              FROM base WHERE vec_id % 4 = 0
            ), c AS (
              SELECT vec_id AS cid, v AS cv FROM base WHERE vec_id < 8
            ), sim AS (
              SELECT a.vec_id, c.cid,
                     round(list_cosine_similarity(a.v, c.cv), 6) AS s
              FROM aug a, c
            ), assign AS (
              SELECT vec_id, cid AS cluster FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY s DESC, cid ASC) AS rk
                FROM sim
              ) WHERE rk = 1
            ), av AS (
              SELECT a.vec_id, s.cluster, a.v
              FROM aug a JOIN assign s USING (vec_id)
            ), dups AS (
              SELECT DISTINCT b.vec_id AS dup_id
              FROM av a JOIN av b
                ON b.cluster = a.cluster AND b.vec_id > a.vec_id
              WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.95
            )
            SELECT s.cluster, COUNT(*) AS n_vecs,
                   CAST(SUM(CASE WHEN d.dup_id IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dups
            FROM assign s LEFT JOIN dups d ON d.dup_id = s.vec_id
            GROUP BY 1
        """,
        # tail->head boundary-shingle join over the augmented corpus
        # (planted continuations: last-5-words + first-3-words under
        # id 2_000_000 + doc_id for doc_id % 7 == 0, derived identically
        # in both engines)
        "doc_continuation_pairs": r"""
            WITH w AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+') AS a
              FROM documents
            ), aug AS (
              SELECT doc_id, a FROM w
              UNION ALL
              SELECT 2000000 + doc_id, a[len(a)-4:len(a)] || a[1:3]
              FROM w WHERE doc_id % 7 = 0 AND len(a) >= 5
            ), h AS (
              SELECT doc_id,
                     array_to_string(a[1:5], ' ') AS head5,
                     array_to_string(a[len(a)-4:len(a)], ' ') AS tail5
              FROM aug WHERE len(a) >= 5
            )
            SELECT t.doc_id AS doc_a, b.doc_id AS doc_b
            FROM h t JOIN h b
              ON t.tail5 = b.head5 AND t.doc_id <> b.doc_id
        """,
        "dup_cluster_sizes": rf"""
            WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_SQL}),
            und AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            nodes AS (SELECT DISTINCT u AS node FROM und),
            walk(node, label) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT und.v, walk.label FROM walk JOIN und ON und.u = walk.node
            ),
            cc AS (SELECT node, MIN(label) AS rep FROM walk GROUP BY 1),
            sizes AS (SELECT rep, COUNT(*) AS sz FROM cc GROUP BY 1)
            SELECT sz AS cluster_size, COUNT(*) AS n_clusters
            FROM sizes GROUP BY 1
        """,
        # version B derived in both engines: %13 removed, else %11 edited
        # (' v2' appended), %17 planted as new under 3_000_000 + doc_id;
        # the diff is a real md5 outer join on doc_id
        "corpus_version_diff": r"""
            WITH a AS (
              SELECT doc_id, source, md5(text) AS h FROM documents
            ), b AS (
              SELECT doc_id, source,
                     CASE WHEN doc_id % 11 = 0 THEN md5(text || ' v2')
                          ELSE md5(text) END AS h
              FROM documents WHERE doc_id % 13 <> 0
              UNION ALL
              SELECT 3000000 + doc_id, source, md5('new ' || text)
              FROM documents WHERE doc_id % 17 = 0
            )
            SELECT COALESCE(a.source, b.source) AS source,
                   CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                                  AND a.h = b.h THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_same,
                   CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                                  AND a.h <> b.h THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_changed,
                   CAST(SUM(CASE WHEN b.h IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_removed,
                   CAST(SUM(CASE WHEN a.h IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_added
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
            GROUP BY 1
        """,
        "source_ngram_diversity": r"""
            WITH w AS (
              SELECT source,
                     regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+') AS a
              FROM documents
            ), g AS (
              SELECT source, n,
                     array_to_string(a[CAST(i AS INTEGER):CAST(i + n - 1 AS INTEGER)], ' ') AS gram
              FROM w, UNNEST([1, 2, 3]) AS tn(n),
                   UNNEST(range(1, len(a) - n + 2)) AS ti(i)
            )
            SELECT source, CAST(n AS BIGINT) AS n,
                   COUNT(*) AS n_grams,
                   CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
                   round(CAST(COUNT(DISTINCT gram) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE), 6) AS diversity
            FROM g GROUP BY 1, 2
        """,
        "heaps_vocab_growth": r"""
            WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
            ks AS (
              SELECT CAST(t.k AS BIGINT) AS k,
                     CAST((mx.m * t.k) // 10 AS BIGINT) AS doc_cut
              FROM mx, UNNEST([1, 2, 3, 4, 5, 6, 7, 8, 9, 10]) AS t(k)
              WHERE mx.m IS NOT NULL
            ), w AS (
              SELECT doc_id,
                     UNNEST(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), fs AS (
              SELECT word, MIN(doc_id) AS fd FROM w GROUP BY 1
            ), dn AS (
              SELECT doc_id,
                     len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+')) AS nw
              FROM documents
            ), dd AS (
              SELECT ks.k, CAST(COUNT(dn.doc_id) AS BIGINT) AS n_docs,
                     CAST(COALESCE(SUM(dn.nw), 0) AS BIGINT) AS n_tokens
              FROM ks LEFT JOIN dn ON dn.doc_id <= ks.doc_cut GROUP BY 1
            ), vv AS (
              SELECT ks.k, CAST(COUNT(fs.word) AS BIGINT) AS vocab
              FROM ks LEFT JOIN fs ON fs.fd <= ks.doc_cut GROUP BY 1
            )
            SELECT ks.k, ks.doc_cut, dd.n_docs, dd.n_tokens, vv.vocab
            FROM ks JOIN dd ON dd.k = ks.k JOIN vv ON vv.k = ks.k
        """,
        "corpus_drift_psi": r"""
            WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
            c AS (
              SELECT source, LEAST(9, n_chars // 100) AS bucket,
                     CAST(SUM(CASE WHEN doc_id <= mx.m // 2
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                     CAST(SUM(CASE WHEN doc_id > mx.m // 2
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_b
              FROM documents, mx GROUP BY 1, 2
            ), t AS (
              SELECT source, bucket, n_a, n_b,
                     SUM(n_a) OVER (PARTITION BY source) AS ta,
                     SUM(n_b) OVER (PARTITION BY source) AS tb
              FROM c
            ), u AS (
              SELECT source, bucket, n_a, n_b, ta, tb,
                CASE WHEN n_a > 0 AND n_b > 0 THEN
                  CAST(round(ln(CAST(n_a AS DOUBLE)) * 1000000, 0) AS BIGINT)
                  + CAST(round(ln(CAST(tb AS DOUBLE)) * 1000000, 0) AS BIGINT)
                  - CAST(round(ln(CAST(n_b AS DOUBLE)) * 1000000, 0) AS BIGINT)
                  - CAST(round(ln(CAST(ta AS DOUBLE)) * 1000000, 0) AS BIGINT)
                ELSE 0 END AS lnr
              FROM t
            )
            SELECT source, CAST(bucket AS BIGINT) AS bucket, n_a, n_b,
                   CAST(ta AS BIGINT) AS total_a,
                   CAST(tb AS BIGINT) AS total_b,
                   lnr AS ln_ratio_units,
                   CASE WHEN n_a > 0 AND n_b > 0 THEN
                     round((CAST(n_a AS DOUBLE) / ta
                            - CAST(n_b AS DOUBLE) / tb)
                           * lnr / 1000000.0, 6)
                   ELSE 0.0 END AS psi_term
            FROM u ORDER BY 1, 2
        """,
        "docs_score_auc": r"""
            WITH d AS (
              SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p,
                     len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+')) AS score
              FROM documents
            ), h AS (
              SELECT score, SUM(p) AS pos, SUM(1 - p) AS neg
              FROM d GROUP BY 1
            ), c AS (
              SELECT score, pos, neg,
                     COALESCE(SUM(neg) OVER (ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_neg
              FROM h
            )
            SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
                   CAST(SUM(neg) AS BIGINT) AS n_neg,
                   CAST(SUM(pos * (2 * cum_neg + neg)) AS BIGINT) AS u2,
                   round(CAST(SUM(pos * (2 * cum_neg + neg)) AS DOUBLE)
                         / CAST(2 * SUM(pos) * SUM(neg) AS BIGINT),
                         6) AS auc
            FROM c HAVING SUM(pos) > 0 AND SUM(neg) > 0
        """,
        "source_bigram_cond_entropy": r"""
            WITH toks AS (
              SELECT source, regexp_split_to_array(
                  trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                  '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), bi AS (
              SELECT source, w[i] AS wa, w[i+1] AS wb, COUNT(*) AS n
              FROM toks, UNNEST(range(1, len(w))) AS t(i)
              WHERE w[i] <> '' AND w[i+1] <> ''
              GROUP BY 1, 2, 3
            ), m AS (
              SELECT source, n,
                     SUM(n) OVER (PARTITION BY source, wa) AS nm
              FROM bi
            ), s AS (
              SELECT source, SUM(n) AS total,
                     SUM(n * (CAST(round(ln(CAST(nm AS DOUBLE))
                                * 1000000, 0) AS BIGINT)
                              - CAST(round(ln(CAST(n AS DOUBLE))
                                * 1000000, 0) AS BIGINT))) AS su
              FROM m GROUP BY 1
            )
            SELECT source, CAST(total AS BIGINT) AS total_bigrams,
                   CAST(su AS BIGINT) AS sum_units,
                   round(CAST(su AS DOUBLE) / CAST(total AS BIGINT)
                         / 1000000.0, 6) AS cond_entropy
            FROM s ORDER BY source
        """,
        "events_spearman_daily": r"""
            WITH d AS (
              SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)
                       AS day,
                     COUNT(*) AS x, COUNT(DISTINCT user_id) AS y
              FROM events WHERE ts IS NOT NULL GROUP BY 1
            ), r AS (
              SELECT 2 * RANK() OVER (ORDER BY x)
                       + COUNT(*) OVER (PARTITION BY x) - 1 AS x2,
                     2 * RANK() OVER (ORDER BY y)
                       + COUNT(*) OVER (PARTITION BY y) - 1 AS y2
              FROM d
            ), s AS (
              SELECT COUNT(*) AS n, SUM(x2) AS sx, SUM(y2) AS sy,
                     SUM(x2 * x2) AS sxx, SUM(y2 * y2) AS syy,
                     SUM(x2 * y2) AS sxy
              FROM r
            )
            SELECT CAST(n AS BIGINT) AS n_days,
                   CAST(n * sxy - sx * sy AS BIGINT) AS num,
                   CAST(n * sxx - sx * sx AS BIGINT) AS dx,
                   CAST(n * syy - sy * sy AS BIGINT) AS dy,
                   round(CAST(n * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                * CAST(n * syy - sy * sy AS DOUBLE)),
                         6) AS rho
            FROM s WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        """,
        "source_len_ks": r"""
            WITH h AS (
              SELECT source, n_chars AS v, COUNT(*) AS c
              FROM documents GROUP BY 1, 2
            ), tot AS (
              SELECT source, SUM(c) AS n FROM h GROUP BY 1
            ), grid AS (
              SELECT s.source, g.v
              FROM (SELECT DISTINCT source FROM h) s
              CROSS JOIN (SELECT DISTINCT v FROM h) g
            ), cum AS (
              SELECT grid.source, grid.v,
                     SUM(COALESCE(h.c, 0)) OVER (
                       PARTITION BY grid.source ORDER BY grid.v) AS cc
              FROM grid LEFT JOIN h
                ON h.source = grid.source AND h.v = grid.v
            ), pairs AS (
              SELECT a.source AS source_a, b.source AS source_b,
                     ta.n AS n_a, tb.n AS n_b,
                     MAX(ABS(a.cc * tb.n - b.cc * ta.n)) AS d_num
              FROM cum a
              JOIN cum b ON a.v = b.v AND a.source < b.source
              JOIN tot ta ON ta.source = a.source
              JOIN tot tb ON tb.source = b.source
              GROUP BY 1, 2, 3, 4
            )
            SELECT source_a, source_b,
                   CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                   CAST(d_num AS BIGINT) AS d_num,
                   round(CAST(d_num AS DOUBLE)
                         / CAST(n_a * n_b AS BIGINT), 6) AS ks
            FROM pairs ORDER BY 1, 2
        """,
        "source_fertility": r"""
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS n_chars,
                   CAST(SUM(len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+'))) AS BIGINT) AS n_ws_tokens,
                   CAST(SUM(len(regexp_extract_all(text,
                       ' ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'))) AS BIGINT) AS n_bpe_pieces,
                   round(CAST(SUM(length(text)) AS DOUBLE)
                         / CAST(SUM(len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)), '[ \t\n\r\v\f]+'))) AS DOUBLE), 6) AS chars_per_word,
                   CASE WHEN SUM(len(regexp_extract_all(text,
                       ' ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'))) = 0
                        THEN NULL
                        ELSE round(CAST(SUM(length(text)) AS DOUBLE)
                             / CAST(SUM(len(regexp_extract_all(text,
                       ' ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+'))) AS DOUBLE), 6)
                   END AS chars_per_piece
            FROM documents GROUP BY 1
        """,
        # minhash_pairs: on a corpus where the recall-guard test proves the
        # banding + signature prefilter lossless (tests/test_training_ops),
        # the LSH output EQUALS exact char-5-shingle jaccard >= 0.8 - which
        # IS SQL-expressible. Verified identical at sf0.01 (25 pairs) and
        # sf0.1 (256 pairs). Shingles here are the literal 5-char windows of
        # the normalized text; the engine hashes them (64-bit polynomial,
        # dedup.py:char_shingles) - collision odds ~(n_shingles^2)/2^64 per
        # doc, far below any observable effect on the set sizes.
        "minhash_pairs": r"""
            WITH n AS (
              SELECT doc_id,
                     lower(regexp_replace(text, '[ \t\n\r\v\f]+', ' ', 'g')) AS t
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id, substring(t, CAST(i AS INT), 5) AS s
              FROM n, UNNEST(range(1, length(t) - 3)) AS u(i)
              WHERE length(t) >= 5
              UNION
              SELECT doc_id, t FROM n WHERE length(t) < 5
            ), cnt AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
              FROM sh a JOIN sh b USING (s)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 6) AS jaccard
            FROM inter
            JOIN cnt ca ON ca.doc_id = doc_a
            JOIN cnt cb ON cb.doc_id = doc_b
            WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.8
        """,
        "simhash_pairs": _simhash_oracle_sql(),
        # Determinism pins for the two remaining approximate/iterative
        # surfaces: both are designed run/CPU/partitioning-invariant
        # (kmeans rounds centroids to 6dp per iteration so the trajectory
        # is exact; IVF's centroid sample, probe set, and rounded top-k
        # are deterministic), verified identical across num_cpus 4/32 and
        # repeated runs, and pinned per embeddings-table size. These are
        # REPRODUCIBILITY oracles (the values are algorithm-defined, not
        # SQL-recomputable); accuracy/recall invariants are pinned in
        # pytest (trajectory-equals-local-reference, recall-vs-brute).
        "embed_kmeans": """
            WITH c(cnt) AS (SELECT COUNT(*) FROM embeddings),
            v(cluster, n_vecs, inertia, corpus) AS (VALUES
            (0, 53, '48.90105', 500),
            (1, 63, '58.130336', 500),
            (2, 56, '51.771936', 500),
            (3, 66, '61.573218', 500),
            (4, 55, '51.012298', 500),
            (5, 73, '68.028737', 500),
            (6, 74, '68.978827', 500),
            (7, 60, '55.371386', 500),
            (0, 238, '226.259503', 2000),
            (1, 255, '243.027946', 2000),
            (2, 271, '258.116736', 2000),
            (3, 258, '245.248963', 2000),
            (4, 238, '225.820831', 2000),
            (5, 254, '242.182232', 2000),
            (6, 263, '250.382731', 2000),
            (7, 223, '211.663906', 2000)
            )
            SELECT CAST(cluster AS BIGINT) AS cluster,
                   CAST(n_vecs AS BIGINT) AS n_vecs,
                   CAST(inertia AS DOUBLE) AS inertia
            FROM v JOIN c ON v.corpus = c.cnt
        """,
        "ann_ivf_topk": """
            WITH c(cnt) AS (SELECT COUNT(*) FROM embeddings),
            v(query_id, vec_id, cosine, corpus) AS (VALUES
            (0, 0, '1.0', 500),
            (0, 387, '0.331139', 500),
            (0, 423, '0.296934', 500),
            (0, 73, '0.295434', 500),
            (0, 190, '0.281795', 500),
            (0, 388, '0.276301', 500),
            (0, 344, '0.252487', 500),
            (0, 257, '0.248127', 500),
            (0, 229, '0.2302', 500),
            (0, 99, '0.204141', 500),
            (1, 1, '1.0', 500),
            (1, 407, '0.32701', 500),
            (1, 195, '0.322744', 500),
            (1, 64, '0.316374', 500),
            (1, 124, '0.30275', 500),
            (1, 402, '0.292322', 500),
            (1, 472, '0.292109', 500),
            (1, 220, '0.289782', 500),
            (1, 203, '0.268155', 500),
            (1, 363, '0.263306', 500),
            (0, 0, '1.0', 2000),
            (0, 1204, '0.406472', 2000),
            (0, 291, '0.391932', 2000),
            (0, 1020, '0.375988', 2000),
            (0, 1511, '0.328782', 2000),
            (0, 142, '0.311258', 2000),
            (0, 794, '0.310833', 2000),
            (0, 1841, '0.309887', 2000),
            (0, 633, '0.309559', 2000),
            (0, 1033, '0.296046', 2000),
            (1, 1, '1.0', 2000),
            (1, 1950, '0.386131', 2000),
            (1, 1580, '0.366762', 2000),
            (1, 260, '0.34666', 2000),
            (1, 1832, '0.33121', 2000),
            (1, 173, '0.310885', 2000),
            (1, 665, '0.306598', 2000),
            (1, 134, '0.306412', 2000),
            (1, 732, '0.302915', 2000),
            (1, 1159, '0.298389', 2000)
            )
            SELECT CAST(query_id AS BIGINT) AS query_id,
                   CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(cosine AS DOUBLE) AS cosine
            FROM v JOIN c ON v.corpus = c.cnt
        """,
        "source_yule_k": r"""
            WITH w AS (
              SELECT source,
                     unnest(regexp_split_to_array(
                         trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                         '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), f AS (
              SELECT source, word, COUNT(*) AS n
              FROM w WHERE word <> '' GROUP BY 1, 2
            ), s AS (
              SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
                     CAST(SUM(n * n) AS BIGINT) AS sum_freq_sq
              FROM f GROUP BY 1
            )
            SELECT source, n_tokens, sum_freq_sq,
                   round(CAST(CAST(10000 AS HUGEINT)
                              * (sum_freq_sq - n_tokens) AS DOUBLE)
                         / CAST(CAST(n_tokens AS HUGEINT) * n_tokens
                                AS DOUBLE), 6) AS yule_k
            FROM s ORDER BY source
        """,
        "source_hapax_ratio": r"""
            WITH w AS (
              SELECT source,
                     unnest(regexp_split_to_array(
                         trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                         '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), f AS (
              SELECT source, word, COUNT(*) AS n
              FROM w WHERE word <> '' GROUP BY 1, 2
            ), s AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vocab,
                     CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hapax
              FROM f GROUP BY 1
            )
            SELECT source, n_vocab, n_hapax,
                   round(CAST(n_hapax AS DOUBLE) / CAST(n_vocab AS DOUBLE),
                         6) AS hapax_ratio
            FROM s ORDER BY source
        """,
        "source_g2_keywords": _G2_KEYWORDS_SQL,
        "word_skipgram_topk": r"""
            WITH toks AS (
              SELECT regexp_split_to_array(
                  trim(lower(text), ' ' || chr(9) || chr(10) || chr(13)
                       || chr(11) || chr(12)),
                  '[ \t\n\r\v\f]+') AS w
              FROM documents
            ), sg AS (
              SELECT w[i] AS word_a, w[i + d] AS word_b, COUNT(*) AS n
              FROM toks, UNNEST(range(1, len(w))) AS t(i),
                   UNNEST([1, 2]) AS dd(d)
              WHERE i + d <= len(w)
              GROUP BY 1, 2
            )
            SELECT word_a, word_b, CAST(n AS BIGINT) AS n
            FROM sg WHERE n >= 5
            ORDER BY n DESC, word_a ASC, word_b ASC LIMIT 20
        """,
        "word_length_hist": r"""
            WITH w AS (
              SELECT unnest(regexp_split_to_array(
                       trim(text, ' ' || chr(9) || chr(10) || chr(13)
                            || chr(11) || chr(12)),
                       '[ \t\n\r\v\f]+')) AS w
              FROM documents WHERE text IS NOT NULL
            )
            SELECT CAST(length(w) AS BIGINT) AS wlen,
                   CAST(COUNT(*) AS BIGINT) AS n_words
            FROM w WHERE w != '' GROUP BY 1 ORDER BY 1
        """,
        "source_burrows_delta": r"""
            WITH w AS (
              SELECT source,
                     unnest(regexp_split_to_array(
                         trim(lower(text), ' ' || chr(9) || chr(10)
                              || chr(13) || chr(11) || chr(12)),
                         '[ \t\n\r\v\f]+')) AS word
              FROM documents
            ), sw AS (
              SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
              FROM w WHERE word <> '' GROUP BY 1, 2
            ), top AS (
              SELECT word FROM (
                SELECT word, SUM(c) AS n FROM sw GROUP BY 1
              ) ORDER BY n DESC, word ASC LIMIT 30
            ), ts AS (
              SELECT source, CAST(SUM(c) AS BIGINT) AS t
              FROM sw GROUP BY 1
            ), sc AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS s FROM ts
            ), f AS (
              SELECT ts.source, top.word,
                     CAST(CAST(COALESCE(sw.c, 0) AS HUGEINT)
                          * 1000000000 // ts.t AS BIGINT) AS fu
              FROM ts CROSS JOIN top
              LEFT JOIN sw ON sw.source = ts.source
                          AND sw.word = top.word
            ), v AS (
              SELECT word,
                     (SELECT s FROM sc)
                       * SUM(CAST(fu AS HUGEINT) * fu)
                       - SUM(CAST(fu AS HUGEINT))
                         * SUM(CAST(fu AS HUGEINT)) AS vv
              FROM f GROUP BY 1
            ), vg AS (
              SELECT word, vv FROM v WHERE vv > 0
            ), k AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_words FROM vg
            ), p AS (
              SELECT fa.source AS sa, fb.source AS sb,
                     ABS(fa.fu - fb.fu) AS dfu, vg.vv
              FROM f fa
              JOIN f fb ON fa.word = fb.word AND fa.source < fb.source
              JOIN vg ON vg.word = fa.word
            ), u AS (
              SELECT sa, sb,
                     CAST(SUM(CAST(floor(
                         CAST((SELECT s FROM sc) * dfu AS DOUBLE)
                         / sqrt(CAST(vv AS DOUBLE)) * 1000000 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sum_units
              FROM p GROUP BY 1, 2
            )
            SELECT sa AS src_a, sb AS src_b,
                   (SELECT n_words FROM k) AS n_words, sum_units,
                   round(CAST(sum_units AS DOUBLE)
                         / CAST(1000000 * (SELECT n_words FROM k)
                                AS DOUBLE), 6) AS delta
            FROM u ORDER BY 1, 2
        """,
    }


def q_hashed_vocab_counts(sf_dir: str, n_buckets: int = 32):
    """Feature-hashing (hashing-trick) vocabulary projection: every token
    maps to md5(word)[:8] as int mod n_buckets, and the output is the
    per-(source, bucket) token count — the sufficient statistics for a
    hashed bag-of-words featurizer, computed without materializing the
    vocabulary anywhere.

    Scale shape: the md5 runs once per DISTINCT word per block (value
    counts first, hash the index), so per-block hashing cost is
    vocabulary-bounded, not token-bounded; only (source, bucket, n)
    partials (<= sources x n_buckets per block) leave the map tasks for
    the driver fold. The oracle reconstructs the identical bucket id in
    SQL via the md5-hex -> integer expansion (docs_model_score's shared
    kernel pattern)."""
    import hashlib

    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(source=object, bucket="int64", n_tokens="int64")
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        if not mask.any():
            return pa.table(cols)
        df = pd.DataFrame(
            {
                "source": b["source"].to_pandas()
                .reindex(ex.index[mask]).to_numpy(),
                "word": ex[mask].to_numpy(),
            }
        )
        uniq = pd.unique(df["word"])
        bucket_of = {
            w: int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n_buckets
            for w in uniq
        }
        df["bucket"] = df["word"].map(bucket_of).astype(np.int64)
        out = (
            df.groupby(["source", "bucket"], as_index=False)
            .size().rename(columns={"size": "n_tokens"})
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    out = _fold_partials(
        docs.map_batches(_partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None),
        ["source", "bucket"], ["n_tokens"],
    )
    if out is None:
        return empty
    out["bucket"] = out["bucket"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values(["source", "bucket"]).reset_index(drop=True)


def q_doc_word_entropy(sf_dir: str):
    """Per-document lexical diversity: whitespace-token count, distinct
    type count, type-token ratio, and the Shannon entropy (nats) of the
    document's word distribution — the classic cheap diversity/quality
    screen for training-corpus filtering.

    Scale shape: each document is one row, so the whole computation is
    block-local (explode -> per-(row, word) counts -> vectorized per-row
    entropy inside one map_batches); the result streams back as a
    Dataset, never materializing more than doc-cardinality rows. The
    type-token RATIO (small-int ratio) rounds HALF-UP (round_half_up,
    the CLAUDE.md tie rule); entropy is ln-derived so np.round's ties
    are measure-zero (the surprisal precedent)."""
    from ..util import round_half_up, typed_empty
    from .text import _ASCII_WS, _WS_RE

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _entropy(b: pa.Table) -> pa.Table:
        cols = {
            "doc_id": pa.array([], pa.int64()),
            "n_words": pa.array([], pa.int64()),
            "n_types": pa.array([], pa.int64()),
            "ttr": pa.array([], pa.float64()),
            "entropy": pa.array([], pa.float64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        doc_ids = b["doc_id"].to_pandas()
        wc = (
            pd.DataFrame({"row": ex.index[mask], "word": ex[mask].to_numpy()})
            .groupby(["row", "word"]).size()
        )
        n_words = wc.groupby(level=0).sum()
        n_types = wc.groupby(level=0).size()
        p = wc / n_words.reindex(wc.index.get_level_values(0)).to_numpy()
        ent = (-p * np.log(p)).groupby(level=0).sum()
        # docs whose text is all-whitespace have zero words: emit 0 rows
        # of stats for them is wrong - they ARE documents; report zeros.
        all_rows = pd.RangeIndex(len(s))
        n_words = n_words.reindex(all_rows, fill_value=0)
        n_types = n_types.reindex(all_rows, fill_value=0)
        ent = ent.reindex(all_rows, fill_value=0.0)
        nw = n_words.to_numpy(np.int64)
        nt = n_types.to_numpy(np.int64)
        ttr = np.where(
            nw > 0, round_half_up(nt / np.maximum(nw, 1), 6), 0.0
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids.to_numpy(np.int64), pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "n_types": pa.array(nt, pa.int64()),
                "ttr": pa.array(ttr, pa.float64()),
                "entropy": pa.array(
                    np.round(ent.to_numpy(np.float64), 6), pa.float64()
                ),
            }
        )

    out = docs.map_batches(
        _entropy, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    df = out.to_pandas()
    if "doc_id" not in df.columns or not len(df):
        return typed_empty(doc_id="int64", n_words="int64", n_types="int64",
                           ttr="float64", entropy="float64")
    return df.sort_values("doc_id").reset_index(drop=True)


def q_source_top_p_vocab(sf_dir: str, p_num: int = 9, p_den: int = 10,
                         max_fold_rows: int = 2_000_000):
    """Nucleus (top-p) vocabulary truncation per source: the smallest
    prefix of words, ordered by frequency descending, covering p (=90%)
    of the source's token mass — the vocabulary-pruning step of a
    tokenizer/featurizer build. The cutoff is pure integer arithmetic
    ((cum - n) * p_den < total * p_num), so engine and oracle agree
    bit-for-bit with no float threshold anywhere.

    Scale shape: the same (source, word, count) partial fold as
    source_word_kl (bounded by sources x vocabulary, count()-guarded
    before the collect); ranking/cumsum run per source on that
    vocabulary-sized frame only."""
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(source=object, word=object, n="int64", rnk="int64")
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "word": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        if not mask.any():
            return pa.table(cols)
        part = (
            pd.DataFrame(
                {
                    "source": b["source"].to_pandas()
                    .reindex(ex.index[mask]).to_numpy(),
                    "word": ex[mask].to_numpy(),
                }
            )
            .groupby(["source", "word"], as_index=False)
            .size().rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    parts = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    if parts.count() > max_fold_rows:
        raise ValueError(
            f"source_top_p_vocab: partial rows exceed {max_fold_rows}; "
            "bucket by word hash (word_doc_freq's shape) before folding"
        )
    agg = _fold_partials(parts, ["source", "word"], ["n"])
    if agg is None:
        return empty
    agg["n"] = agg["n"].astype("int64")
    agg = agg.sort_values(
        ["source", "n", "word"], ascending=[True, False, True]
    ).reset_index(drop=True)
    g = agg.groupby("source")
    cum = g["n"].cumsum().to_numpy(np.int64)
    total = g["n"].transform("sum").to_numpy(np.int64)
    keep = (cum - agg["n"].to_numpy(np.int64)) * p_den < total * p_num
    agg["rnk"] = g.cumcount().to_numpy(np.int64) + 1
    out = agg.loc[keep, ["source", "word", "n", "rnk"]]
    out["rnk"] = out["rnk"].astype("int64")
    return out.reset_index(drop=True)


def q_source_zipf_slope(sf_dir: str, max_vocab_per_source: int = 100_000,
                        max_fold_rows: int = 2_000_000):
    """Zipf-law fit per source: OLS slope of ln(word frequency) against
    ln(frequency rank) — the classic corpus-health diagnostic (natural
    text sits near -1; templated/spammy text drifts shallow).

    Exactness: ln(rank) and ln(count) quantize to 1e-6-unit int64s
    (both engines' ln agree to ~1 ulp, so the half-up unit round is
    bit-stable), every OLS sum then runs in EXACT integer arithmetic
    (Python ints here, HUGEINT in the oracle), and the final slope is
    the identical correctly-rounded double division float(num)/float(den)
    on both sides. Sources with fewer than 2 distinct words are dropped
    (degenerate fit, zero denominator).

    Scale shape: the source_word_kl partial fold (sources x vocabulary,
    count()-guarded); the OLS runs per source on that vocabulary-sized
    frame with a fail-fast vocab bound."""
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_away, typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(
        source=object, n_vocab="int64", sx_units="int64", sy_units="int64",
        sxx_units="int64", sxy_units="int64", zipf_slope="float64",
    )
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "word": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        if not mask.any():
            return pa.table(cols)
        part = (
            pd.DataFrame(
                {
                    "source": b["source"].to_pandas()
                    .reindex(ex.index[mask]).to_numpy(),
                    "word": ex[mask].to_numpy(),
                }
            )
            .groupby(["source", "word"], as_index=False)
            .size().rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    parts = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    if parts.count() > max_fold_rows:
        raise ValueError(
            f"source_zipf_slope: partial rows exceed {max_fold_rows}; "
            "bucket by word hash (word_doc_freq's shape) before folding"
        )
    agg = _fold_partials(parts, ["source", "word"], ["n"])
    if agg is None:
        return empty
    agg["n"] = agg["n"].astype("int64")
    agg = agg.sort_values(
        ["source", "n", "word"], ascending=[True, False, True]
    ).reset_index(drop=True)
    agg["rnk"] = agg.groupby("source").cumcount().to_numpy(np.int64) + 1
    # unit-quantized logs: half-up round (values are non-negative)
    agg["xu"] = np.floor(
        np.log(agg["rnk"].to_numpy(np.float64)) * 1e6 + 0.5
    ).astype(np.int64)
    agg["yu"] = np.floor(
        np.log(agg["n"].to_numpy(np.float64)) * 1e6 + 0.5
    ).astype(np.int64)
    rows = []
    for src, g in agg.groupby("source"):
        v = len(g)
        if v < 2:
            continue
        if v > max_vocab_per_source:
            raise ValueError(
                f"source_zipf_slope: {v} words in {src!r} exceed "
                f"{max_vocab_per_source}; fit on a rank-capped prefix"
            )
        # exact integer OLS sums (Python ints: no int64 overflow at any
        # vocab the guard admits; the oracle uses HUGEINT)
        xs = [int(x) for x in g["xu"]]
        ys = [int(y) for y in g["yu"]]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        num = v * sxy - sx * sy
        den = v * sxx - sx * sx
        slope = float(round_half_away(
            np.array([float(num) / float(den)]), 6
        )[0])
        rows.append((src, v, sx, sy, sxx, sxy, slope))
    if not rows:
        return empty
    out = pd.DataFrame(
        rows,
        columns=["source", "n_vocab", "sx_units", "sy_units", "sxx_units",
                 "sxy_units", "zipf_slope"],
    )
    for c in ("n_vocab", "sx_units", "sy_units", "sxx_units", "sxy_units"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_source_len_lognormal(sf_dir: str):
    """Log-normal document-length fit per source: exact integer first and
    second moments of ln(n_chars) quantized to 1e-6-unit int64s (the
    embed_dim_moments convention) — the sufficient statistics for the
    mu/sigma of the classic log-normal length model used in length-prior
    quality filtering. Docs with n_chars <= 0 are excluded on both sides
    (ln undefined).

    Scale shape: each block folds to one row per source (sources x
    blocks partials, driver fold); no float ever sums. Overflow
    hygiene: u*u is ~1.3e14 per doc (u = ln(n_chars)*1e6), so a plain
    int64 SUM silently wraps past ~7e4 qualifying docs while the
    oracle's HUGEINT SUM keeps going — partials therefore carry the
    square sum as two int64 LIMBS (hi = uu>>30, lo = uu&(2^30-1);
    per-block limb sums can't wrap below ~1e8 rows/block) and the
    driver recombines them in Python ints. The final int64 cast
    fail-fasts exactly when the oracle's CAST(... AS BIGINT) would
    raise, so the two engines never silently diverge."""
    from ..util import typed_empty

    empty = typed_empty(source=object, n_docs="int64", sum_ln_units="int64",
                        sumsq_ln_units="int64")
    docs = _read(sf_dir, "documents", columns=["source", "n_chars"])
    _LO_BITS, _LO_MASK = 30, (1 << 30) - 1

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "sum_ln_units": pa.array([], pa.int64()),
            "sumsq_hi": pa.array([], pa.int64()),
            "sumsq_lo": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "n_chars" not in b.column_names:
            return pa.table(cols)
        nc = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = b["source"].to_pandas()
        ok = nc > 0
        if not ok.any():
            return pa.table(cols)
        u = np.floor(
            np.log(nc[ok].astype(np.float64)) * 1e6 + 0.5
        ).astype(np.int64)
        uu = u * u  # per-element exact: u <= ~4.4e7 even at n_chars=2^63
        part = (
            pd.DataFrame({"source": src[ok].to_numpy(), "u": u,
                          "uu_hi": uu >> _LO_BITS, "uu_lo": uu & _LO_MASK})
            .groupby("source", as_index=False)
            .agg(n_docs=("u", "size"), sum_ln_units=("u", "sum"),
                 sumsq_hi=("uu_hi", "sum"), sumsq_lo=("uu_lo", "sum"))
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    parts = docs.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()
    if not len(parts) or "source" not in parts.columns:
        return empty
    # driver fold in Python ints (object dtype): the corpus-total limb
    # and first-moment sums exceed int64 long before the per-block ones
    for c in ("sum_ln_units", "sumsq_hi", "sumsq_lo"):
        parts[c] = parts[c].map(int)
    g = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), sum_ln_units=("sum_ln_units", "sum"),
        sumsq_hi=("sumsq_hi", "sum"), sumsq_lo=("sumsq_lo", "sum"),
    )
    sumsq = [
        (int(h) << _LO_BITS) + int(lo)
        for h, lo in zip(g["sumsq_hi"], g["sumsq_lo"])
    ]
    i64max = (1 << 63) - 1
    if any(v > i64max for v in sumsq) or any(
        int(v) > i64max for v in g["sum_ln_units"]
    ):
        raise ValueError(
            "source_len_lognormal: a per-source moment exceeds BIGINT - "
            "the oracle's CAST(SUM(...) AS BIGINT) raises on the same "
            "corpus; widen the output to a hi/lo limb pair"
        )
    out = pd.DataFrame({
        "source": g["source"],
        "n_docs": g["n_docs"].astype("int64"),
        "sum_ln_units": g["sum_ln_units"].map(int).astype("int64"),
        "sumsq_ln_units": np.array(sumsq, dtype=np.int64),
    })
    return out.sort_values("source").reset_index(drop=True)


def q_doc_dup_spans(sf_dir: str, k: int = 5):
    """Cross-document duplicated-span detection (the exact-substring
    dedup diagnostic of Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", word-granular): for every doc, the
    count and fraction of its k-word windows whose exact text also
    appears in at least one OTHER document. High dup_frac = boilerplate
    / templated / copied content the dedup stage should cut.

    Scale shape: each doc's windows reduce batch-locally to
    (gram_hash64, doc_id, cnt) fixed-width rows (gram TEXT never
    shuffles); gram-hash buckets (stable_partition, 64) see every
    occurrence of a gram, decide cross-doc duplication locally
    (distinct-doc count >= 2), and emit per-doc (windows-seen,
    dup-windows) partials. Every window lands in exactly one bucket, so
    the folded windows-seen IS the doc's window count — one documents
    pass, no second read, and the driver fold is doc-cardinality (the
    output's own size). The ratio is integer/integer with half-up
    rounding (CLAUDE.md ratio rule)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..partition import stable_partition
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_up, typed_empty
    from .dedup import _ASCII_WS, _ASCII_WS_RE, _gram_hash64

    empty = typed_empty(doc_id="int64", n_windows="int64",
                        n_dup_windows="int64", dup_frac="float64")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _wins(b: pa.Table) -> pa.Table:
        cols = {
            "gh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "text" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        ids, ghs, = [], []
        for did, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            w = [x for x in _ASCII_WS_RE.split(t.strip(_ASCII_WS).lower())
                 if x]
            for i in range(len(w) - k + 1):
                ids.append(did)
                ghs.append(_gram_hash64(" ".join(w[i:i + k])))
        if not ids:
            return pa.table(cols)
        g = (
            pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                          "gh": np.array(ghs, dtype=np.int64)})
            .groupby(["gh", "doc_id"], as_index=False).size()
            .rename(columns={"size": "cnt"})
        )
        g["cnt"] = g["cnt"].astype("int64")
        g["_part"] = stable_partition(g["gh"], 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"doc_id": "int64", "n_windows": "int64",
                    "n_dup_windows": "int64"}
        if not len(g) or "gh" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        per_gram = g.groupby(["gh", "doc_id"], as_index=False)["cnt"].sum()
        ndocs = per_gram.groupby("gh")["doc_id"].transform("nunique")
        per_gram["dup"] = np.where(
            ndocs.to_numpy() >= 2, per_gram["cnt"].to_numpy(np.int64), 0
        )
        out = per_gram.groupby("doc_id", as_index=False).agg(
            n_windows=("cnt", "sum"), n_dup_windows=("dup", "sum")
        )
        return out.astype(out_cols)

    parts = (
        ds.map_batches(_wins, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
    )
    out = _fold_partials(parts, ["doc_id"], ["n_windows", "n_dup_windows"])
    if out is None:
        return empty
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_windows"] = out["n_windows"].astype("int64")
    out["n_dup_windows"] = out["n_dup_windows"].astype("int64")
    out["dup_frac"] = round_half_up(
        out["n_dup_windows"].to_numpy(np.float64)
        / out["n_windows"].to_numpy(np.float64), 6
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def q_source_dup_rate(sf_dir: str, k: int = 5):
    """Per-source boilerplate rate: the fraction of each source's k-word
    windows whose exact text appears in >= 2 distinct documents
    (corpus-wide) — the source-level rollup of doc_dup_spans, the number
    a curation pipeline thresholds to drop templated/mirrored sources.

    Scale shape: identical gram-hash bucketing to doc_dup_spans, but the
    bucket kernel needs only (gh, doc distinct count) to decide
    duplication and folds straight to SOURCE-cardinality (windows, dup)
    partials — the driver sees 64 x sources rows, never docs. Window
    counts carry the source string on the (gh, doc) rows (sources are a
    bounded dimension; gram text still never shuffles)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..partition import stable_partition
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_up, typed_empty
    from .dedup import _ASCII_WS, _ASCII_WS_RE, _gram_hash64

    empty = typed_empty(source=object, n_windows="int64",
                        n_dup_windows="int64", dup_rate="float64")
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def _wins(b: pa.Table) -> pa.Table:
        cols = {
            "gh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "text" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        ids, srcs, ghs = [], [], []
        for did, src, t in zip(b["doc_id"].to_pylist(),
                               b["source"].to_pylist(),
                               b["text"].to_pylist()):
            w = [x for x in _ASCII_WS_RE.split(t.strip(_ASCII_WS).lower())
                 if x]
            for i in range(len(w) - k + 1):
                ids.append(did)
                srcs.append(src)
                ghs.append(_gram_hash64(" ".join(w[i:i + k])))
        if not ids:
            return pa.table(cols)
        g = (
            pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                          "source": np.array(srcs, dtype=object),
                          "gh": np.array(ghs, dtype=np.int64)})
            .groupby(["gh", "doc_id", "source"], as_index=False).size()
            .rename(columns={"size": "cnt"})
        )
        g["cnt"] = g["cnt"].astype("int64")
        g["_part"] = stable_partition(g["gh"], 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"source": "object", "n_windows": "int64",
                    "n_dup_windows": "int64"}
        if not len(g) or "gh" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        per = g.groupby(["gh", "doc_id", "source"],
                        as_index=False)["cnt"].sum()
        ndocs = per.groupby("gh")["doc_id"].transform("nunique")
        per["dup"] = np.where(
            ndocs.to_numpy() >= 2, per["cnt"].to_numpy(np.int64), 0
        )
        out = per.groupby("source", as_index=False).agg(
            n_windows=("cnt", "sum"), n_dup_windows=("dup", "sum")
        )
        return out.astype(out_cols)

    parts = (
        ds.map_batches(_wins, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
    )
    out = _fold_partials(parts, ["source"], ["n_windows", "n_dup_windows"])
    if out is None:
        return empty
    out["n_windows"] = out["n_windows"].astype("int64")
    out["n_dup_windows"] = out["n_dup_windows"].astype("int64")
    out["dup_rate"] = round_half_up(
        out["n_dup_windows"].to_numpy(np.float64)
        / out["n_windows"].to_numpy(np.float64), 6
    )
    return out.sort_values("source").reset_index(drop=True)


def q_source_overlap_matrix(sf_dir: str):
    """Cross-source mirror detection: for every source pair (a < b), the
    number of distinct document texts both sources carry, and the overlap
    fraction n_shared / min(n_a, n_b) — the number a curation pipeline
    thresholds to drop a source that is a partial mirror of another.

    Scale shape: the vocab-jaccard two-stage (batches pre-reduce to
    distinct (source, text_hash) pairs; hashes bucket via stable_partition
    so ALL copies of a text land in one task; the per-bucket kernel is one
    self-merge on hash with rows-per-hash <= n_sources) — only
    (src_a, src_b, n) partials reach the driver, including the (s, s)
    diagonal carrying per-source distinct-text counts. Text never
    shuffles; identity is md5[:16] on BOTH sides (oracle uses
    substr(md5(text),1,16)) so any collision is shared, not a divergence."""
    import hashlib

    from ..partition import stable_partition
    from ..util import round_half_up, typed_empty

    empty = typed_empty(src_a=object, src_b=object, n_a="int64",
                        n_b="int64", n_shared="int64", overlap="float64")
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def _pairs(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "h": pa.array([], pa.string()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest()[:16]
              for t in b["text"].to_pylist()]
        d = pd.DataFrame({"source": b["source"].to_pandas().to_numpy(),
                          "h": hs}).drop_duplicates()
        d["_part"] = stable_partition(pa.array(d["h"], pa.string()), 64)
        return pa.Table.from_pandas(d, preserve_index=False)

    def _inter(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"src_a": "object", "src_b": "object", "n": "int64"}
        if not len(g) or "h" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        g = g[["source", "h"]].drop_duplicates()
        m = g.merge(g, on="h", suffixes=("_a", "_b"))
        m = m[m["source_a"] <= m["source_b"]]  # keep diagonal = sizes
        out = (m.groupby(["source_a", "source_b"], as_index=False).size()
               .rename(columns={"source_a": "src_a", "source_b": "src_b",
                                "size": "n"}))
        return out.astype(out_cols)

    parts = (
        ds.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_inter, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "src_a" not in parts.columns:
        return empty
    folded = parts.groupby(["src_a", "src_b"], as_index=False)["n"].sum()
    sizes = dict(zip(
        folded.loc[folded["src_a"] == folded["src_b"], "src_a"],
        folded.loc[folded["src_a"] == folded["src_b"], "n"],
    ))
    # Full matrix: every (a < b) pair appears, zero-overlap included —
    # a 0-shared pair is exactly the signal the threshold consumer reads.
    srcs = sorted(sizes)
    out = pd.DataFrame(
        [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]],
        columns=["src_a", "src_b"])
    if not len(out):
        return empty
    shared = folded[folded["src_a"] < folded["src_b"]]
    out = out.merge(shared, on=["src_a", "src_b"], how="left")
    out["n_a"] = out["src_a"].map(sizes).astype("int64")
    out["n_b"] = out["src_b"].map(sizes).astype("int64")
    out = out.rename(columns={"n": "n_shared"})
    out["n_shared"] = out["n_shared"].fillna(0).astype("int64")
    out["overlap"] = round_half_up(
        out["n_shared"].to_numpy(np.float64)
        / np.minimum(out["n_a"].to_numpy(np.float64),
                     out["n_b"].to_numpy(np.float64)), 6)
    return (out[["src_a", "src_b", "n_a", "n_b", "n_shared", "overlap"]]
            .sort_values(["src_a", "src_b"]).reset_index(drop=True))


def q_doc_novelty_frac(sf_dir: str):
    """Per-source novelty rate: the fraction of a source's documents whose
    exact text is globally FIRST-SEEN there (no document with a smaller
    doc_id carries the same text) — the streaming keep-first dedup survival
    rate, per source, without running the dedup.

    Scale shape: rows reduce to (text_hash, doc_id, source) — text never
    shuffles — and hash-bucket via stable_partition so each hash's global
    min doc_id is computable inside one task; buckets fold straight to
    SOURCE-cardinality (n_docs, n_novel) partials, so the driver sees
    64 x sources rows. Identity is md5[:16] on both sides (oracle:
    min(doc_id) OVER (PARTITION BY substr(md5(text),1,16)))."""
    import hashlib

    import pyarrow.compute as pc

    from ..partition import stable_partition
    from ..util import round_half_up, typed_empty

    empty = typed_empty(source=object, n_docs="int64", n_novel="int64",
                        novelty="float64")
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def _rows(b: pa.Table) -> pa.Table:
        cols = {
            "h": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        hs = pa.array(
            [hashlib.md5(t.encode("utf-8")).hexdigest()[:16]
             for t in b["text"].to_pylist()], pa.string())
        return pa.table({
            "h": hs,
            "doc_id": pc.cast(b["doc_id"], pa.int64()),
            "source": b["source"],
            "_part": pa.array(stable_partition(hs, 64), pa.int64()),
        })

    def _bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"source": "object", "n_docs": "int64",
                    "n_novel": "int64"}
        if not len(g) or "h" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        novel = g["doc_id"].to_numpy() == g.groupby("h")["doc_id"].transform(
            "min").to_numpy()
        out = pd.DataFrame({"source": g["source"].to_numpy(),
                            "novel": novel.astype(np.int64)})
        out = out.groupby("source", as_index=False).agg(
            n_docs=("novel", "size"), n_novel=("novel", "sum"))
        return out.astype(out_cols)

    from ..pipelines.queries import _fold_partials

    parts = (
        ds.map_batches(_rows, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
    )
    out = _fold_partials(parts, ["source"], ["n_docs", "n_novel"])
    if out is None:
        return empty
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_novel"] = out["n_novel"].astype("int64")
    out["novelty"] = round_half_up(
        out["n_novel"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64), 6)
    return out.sort_values("source").reset_index(drop=True)


def q_source_len_mad(sf_dir: str):
    """Robust per-source length statistics: exact median and exact MAD
    (median absolute deviation) of n_chars — the outlier-resistant center/
    spread pair a length-trim stage uses when means are skew-poisoned.

    Exactness: medians interpolate halves, so everything is integer
    half-units — med2 = (lo + hi) where lo/hi are the two middle values
    (equal when n is odd), and the MAD works on d2 = |2*v - med2| integer
    half-unit deviations whose own median is mad4 quarter-units. The
    emitted doubles med2/2.0 and mad4/4.0 are exact binary fractions,
    bit-identical to DuckDB's interpolating median().

    Scale shape: batches fold to (source, n_chars, cnt) value-count
    histograms — bounded by the length DOMAIN x sources, not by rows — and
    the driver computes both medians from cumulative counts; no shuffle at
    all."""
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty

    empty = typed_empty(source=object, n_docs="int64", med_len="float64",
                        mad_len="float64")
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def _hist(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "n_chars" not in b.column_names:
            return pa.table(cols)
        g = (b.select(["source", "n_chars"]).to_pandas()
             .groupby(["source", "n_chars"], as_index=False).size()
             .rename(columns={"size": "cnt"}))
        g["cnt"] = g["cnt"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(_hist, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    hist = _fold_partials(parts, ["source", "n_chars"], ["cnt"])
    if hist is None:
        return empty

    def _med2(vals: np.ndarray, cnts: np.ndarray) -> int:
        """lo + hi of the interpolating median over a sorted value-count
        histogram (positions (n+1)//2 and n//2 + 1, 1-indexed)."""
        order = np.argsort(vals, kind="mergesort")
        v, c = vals[order], cnts[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo = v[np.searchsorted(cum, (n + 1) // 2)]
        hi = v[np.searchsorted(cum, n // 2 + 1)]
        return int(lo) + int(hi)

    rows = []
    for src, g in hist.groupby("source"):
        vals = g["n_chars"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        med2 = _med2(vals, cnts)
        d2 = np.abs(2 * vals - med2)
        dd = pd.DataFrame({"d2": d2, "cnt": cnts}).groupby(
            "d2", as_index=False)["cnt"].sum()
        mad4 = _med2(dd["d2"].to_numpy(np.int64),
                     dd["cnt"].to_numpy(np.int64))
        rows.append((src, int(cnts.sum()), med2 / 2.0, mad4 / 4.0))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "med_len",
                                      "mad_len"])
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_embed_quantize_error(sf_dir: str):
    """Int8 vector-compression audit: per dimension, the max and mean
    absolute error of symmetric int8 quantization (scale = max|x| / 127)
    — the go/no-go numbers before shipping a quantized ANN index.

    Exactness: components quantize once to 1e-6 units (exact f32->f64
    widening on both sides); the int8 code is qv = floor(127*xq/ma + 0.5)
    where both sides run the SAME double division (identical IEEE ops, no
    round()-convention hazard), and the per-row error |127*xq - qv*ma| is
    an exact int64. max is order-independent; sums fold per block in int64
    (safe below ~1e10 rows/block at err<=ma/2~2.5e6) and recombine
    driver-side in Python ints with the oracle-mirroring int64 fail-fast
    (CAST(SUM(..) AS BIGINT) raises past int64; so do we).

    Scale shape: pass 1 folds each block to 64 (dim, max|xq|) rows; pass 2
    carries the 64 maxima in the task closure and folds each block to 64
    (dim, n, max_err, sum_err) partials — vectors never shuffle, never
    collect. Dims with ma == 0 are dropped (oracle WHERE ma > 0)."""
    from ..util import round_half_up, typed_empty

    empty = typed_empty(dim="int64", n="int64", max_abs_units="int64",
                        max_err_units="int64", sum_err_units="int64",
                        mean_abs_err="float64")

    def _mat(b: pa.Table):
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // b.num_rows
        x = flat.astype(np.float64).reshape(b.num_rows, d)
        return np.floor(x * 1e6 + 0.5).astype(np.int64)

    def _maxabs(b: pa.Table) -> pa.Table:
        cols = {"dim": pa.array([], pa.int64()),
                "ma": pa.array([], pa.int64())}
        if "embedding" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        xq = _mat(b)
        return pa.table({
            "dim": pa.array(np.arange(1, xq.shape[1] + 1, dtype=np.int64)),
            "ma": pa.array(np.abs(xq).max(axis=0)),
        })

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    p1 = ds.map_batches(_maxabs, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None).to_pandas()
    if not len(p1) or "dim" not in p1.columns:
        return empty
    ma_by_dim = p1.groupby("dim")["ma"].max()
    ma_vec = ma_by_dim.reindex(
        np.arange(1, ma_by_dim.index.max() + 1)).to_numpy(np.int64)

    def _err(b: pa.Table) -> pa.Table:
        cols = {"dim": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "max_err": pa.array([], pa.int64()),
                "sum_err": pa.array([], pa.int64())}
        if "embedding" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        xq = _mat(b)
        ma = ma_vec[: xq.shape[1]]
        live = ma > 0
        qv = np.floor((127.0 * xq[:, live]) / ma[live] + 0.5).astype(
            np.int64)
        err = np.abs(127 * xq[:, live] - qv * ma[live])
        dims = np.arange(1, xq.shape[1] + 1, dtype=np.int64)[live]
        return pa.table({
            "dim": pa.array(dims),
            "n": pa.array(np.full(live.sum(), b.num_rows, np.int64)),
            "max_err": pa.array(err.max(axis=0)),
            "sum_err": pa.array(err.sum(axis=0)),
        })

    p2 = ds.map_batches(_err, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=None).to_pandas()
    if not len(p2) or "dim" not in p2.columns:
        return empty
    rows = []
    for dim, g in p2.groupby("dim"):
        n = int(g["n"].sum())
        sum_err = sum(int(v) for v in g["sum_err"])  # Python ints: no wrap
        if sum_err > np.iinfo(np.int64).max:
            raise OverflowError(
                f"sum_err_units for dim {dim} exceeds int64 "
                f"({sum_err}); oracle CAST(... AS BIGINT) raises here too")
        rows.append((int(dim), n, int(ma_by_dim.loc[dim]),
                     int(g["max_err"].max()), sum_err))
    out = pd.DataFrame(rows, columns=["dim", "n", "max_abs_units",
                                      "max_err_units", "sum_err_units"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    out["mean_abs_err"] = round_half_up(
        out["sum_err_units"].to_numpy(np.float64)
        / (out["n"].to_numpy(np.float64) * 127000000.0), 6)
    return out.sort_values("dim").reset_index(drop=True)


def q_lang_source_mi(sf_dir: str):
    """Pointwise mutual information cells for lang x source — the
    corpus-composition dependence screen (is a source mono-lingual? is a
    language concentrated in a few sources?). Emitted per OBSERVED cell
    (zero cells contribute nothing to MI) with exact integer marginals
    and a per-factor-quantized log-ratio, plus the cell's MI term.

    Exactness: ln quantizes PER FACTOR to 1e-6-unit int64s (the zipf
    convention; both engines' ln agree bitwise on this box) and
    ln_ratio_units = ln(n) + ln(T) - ln(r) - ln(c) is then exact int
    arithmetic — no n*T/(r*c) product that would overflow BIGINT at
    corpus scale. mi_term = (n/T) * lnr runs as the identical IEEE
    (n_d * lnr) / (T * 1e6) on both sides, sign-aware half-away round.

    Scale shape: one (lang, source) cell-count fold (langs x sources,
    bounded by the dimension domains); marginals derive on the driver."""
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_away, typed_empty

    empty = typed_empty(lang=object, source=object, n="int64",
                        lang_total="int64", source_total="int64",
                        grand_total="int64", ln_ratio_units="int64",
                        mi_term="float64")
    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "lang" not in b.column_names:
            return pa.table(cols)
        g = (b.select(["lang", "source"]).to_pandas()
             .groupby(["lang", "source"], as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["lang", "source"], ["n"],
    )
    if cells is None:
        return empty
    cells["n"] = cells["n"].astype("int64")
    r = cells.groupby("lang")["n"].transform("sum").to_numpy(np.int64)
    c = cells.groupby("source")["n"].transform("sum").to_numpy(np.int64)
    t = int(cells["n"].sum())
    n = cells["n"].to_numpy(np.int64)

    def _lnu(v) -> np.ndarray:
        return np.floor(
            np.log(np.asarray(v, dtype=np.float64)) * 1e6 + 0.5
        ).astype(np.int64)

    lnr = _lnu(n) + _lnu(np.full(len(n), t, np.int64)) - _lnu(r) - _lnu(c)
    out = pd.DataFrame({
        "lang": cells["lang"].to_numpy(),
        "source": cells["source"].to_numpy(),
        "n": n, "lang_total": r, "source_total": c,
        "grand_total": np.full(len(n), t, np.int64),
        "ln_ratio_units": lnr,
    })
    out["mi_term"] = round_half_away(
        (n.astype(np.float64) * lnr) / (t * 1e6), 6)
    for col in ("n", "lang_total", "source_total", "grand_total",
                "ln_ratio_units"):
        out[col] = out[col].astype("int64")
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def q_source_simpson(sf_dir: str):
    """Per-source word-distribution Simpson concentration index:
    sum_w c_w^2 / n_tokens^2 — the repeated-phrase/templating screen that
    complements Shannon entropy (Simpson weights the HEAD of the
    distribution; a source dominated by one boilerplate token scores near
    1 even when its tail looks diverse).

    Exactness: every c_w is a complete per-(source, word) int64 count
    inside its hash bucket; c^2 sums run in Python ints and ship per
    bucket as DECIMAL STRINGS (c^2 itself exceeds int64 once a word
    passes ~3e9 occurrences — a shifted-limb transport of an already
    overflowed int64 would be garbage), recombining driver-side in Python
    ints with the oracle-mirroring BIGINT fail-fast. One rounded division
    at the end.

    Scale shape: batches pre-reduce (source, word) counts, words
    hash-bucket via stable_partition (all copies of a word in one task),
    buckets fold to source-cardinality rows — the driver sees
    64 x sources rows, never vocabulary."""
    from ..partition import stable_partition
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_up, typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(source=object, n_tokens="int64", n_vocab="int64",
                        sumsq_tokens="int64", simpson="float64")
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def _counts(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "word": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        d = pd.DataFrame({
            "source": b["source"].to_pandas().reindex(
                ex.index[mask]).to_numpy(),
            "word": ex[mask].to_numpy(),
        }).groupby(["source", "word"], as_index=False).size().rename(
            columns={"size": "n"})
        d["n"] = d["n"].astype("int64")
        d["_part"] = stable_partition(pa.array(d["word"], pa.string()), 64)
        return pa.Table.from_pandas(d, preserve_index=False)

    def _bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"source": "object", "n_tokens": "int64",
                    "n_vocab": "int64", "sumsq_str": "object"}
        if not len(g) or "word" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        per = g.groupby(["source", "word"], as_index=False)["n"].sum()
        rows = []
        for src, gg in per.groupby("source"):
            cs = [int(v) for v in gg["n"]]
            rows.append((src, sum(cs), len(cs),
                         str(sum(v * v for v in cs))))
        out = pd.DataFrame(rows, columns=list(out_cols))
        return out.astype(out_cols)

    parts = (
        ds.map_batches(_counts, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "source" not in parts.columns:
        return empty
    i64 = np.iinfo(np.int64).max
    rows = []
    for src, g in parts.groupby("source"):
        n = int(g["n_tokens"].sum())
        v = int(g["n_vocab"].sum())
        ssq = sum(int(s) for s in g["sumsq_str"])
        if ssq > i64:
            raise OverflowError(
                f"source_simpson: sumsq for {src!r} exceeds int64; "
                "oracle CAST(... AS BIGINT) raises here too")
        simpson = float(round_half_up(
            np.array([float(ssq) / (float(n) * n)]), 6)[0])
        rows.append((src, n, v, ssq, simpson))
    out = pd.DataFrame(rows, columns=["source", "n_tokens", "n_vocab",
                                      "sumsq_tokens", "simpson"])
    for c in ("n_tokens", "n_vocab", "sumsq_tokens"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_doc_pagerank(sf_dir: str):
    """PageRank centrality over the near-dup graph (the dup_clusters edge
    set: ngram-jaccard >= 0.5 pairs, symmetrized) — ranks the docs a
    curation pass should LOOK AT first: high-rank nodes sit at the center
    of large duplicate families, low-rank leaves are one-off copies.

    Fixed 5 iterations in EXACT integer 1e-9 units (floor-damped
    contributions, integer base) so the values are bit-identical across
    runs, num_cpus and engines — the oracle unrolls the same five integer
    steps in SQL. See training/graph.py pagerank_integer for the
    two-stage-per-round shuffle shape and the int64 overflow fail-fast."""
    from .dedup import ngram_jaccard_pairs
    from .graph import pagerank_integer

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, threshold=0.5, as_dataset=True)
    out = pagerank_integer(pairs, n_iter=5).to_pandas()
    if "node" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "out_degree": pd.Series([], dtype="int64"),
            "pr_units": pd.Series([], dtype="int64"),
        })
    out = out.rename(columns={"node": "doc_id"})
    for c in ("doc_id", "out_degree", "pr_units"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_BM25_TERMS = ("hash", "join", "scan", "stream")


def q_docs_bm25_topk(sf_dir: str, k: int = 20):
    """BM25 retrieval (k1=1.2, b=0.75) for a fixed query term set — the
    top-k most relevant documents, the IR scoring baseline a training-data
    search/inspection surface needs.

    Exactness: idf = ln((2N-2df+1)/(2df+1)) quantizes half-up to 1e-6
    units once per term; each (doc, term) contribution is the IDENTICAL
    IEEE expression tree idf_f * (22*tf) / ((10*tf+3) + ((9.0*dl)*N)/T)
    on both sides (exact-int operands, correctly-rounded double ops, no
    round()-convention hazard — floor(x+0.5) everywhere, sign-safe for
    the negative idf of a term in more than half the corpus), quantized
    to int64 units so the per-doc sum over matched terms is
    order-independent. Ties break on doc_id.

    Scale shape: pass 1 folds per-block (n_docs, total_tokens, df per
    term) partials — terms are a constant; pass 2 carries (N, T, idf) in
    the closure, scores docs block-locally (a doc's terms never leave its
    row), and emits per-block top-k candidates — the driver folds
    blocks x k rows, never the corpus."""
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(rank="int64", doc_id="int64", n_tokens="int64",
                        score_units="int64")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _words(b: pa.Table):
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        return (b["doc_id"].to_pandas().reindex(ex.index[mask]).to_numpy(),
                ex[mask].to_numpy())

    def _glob(b: pa.Table) -> pa.Table:
        cols = {"n_docs": pa.array([], pa.int64()),
                "total_tokens": pa.array([], pa.int64())}
        cols.update({f"df_{t}": pa.array([], pa.int64())
                     for t in _BM25_TERMS})
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        ids, words = _words(b)
        d = pd.DataFrame({"doc_id": ids, "word": words})
        row = {"n_docs": [b.num_rows], "total_tokens": [len(d)]}
        for t in _BM25_TERMS:
            row[f"df_{t}"] = [
                d.loc[d["word"] == t, "doc_id"].nunique()]
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in row.items()})

    g = ds.map_batches(_glob, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None).to_pandas()
    if not len(g) or "n_docs" not in g.columns:
        return empty
    n = int(g["n_docs"].sum())
    t_total = int(g["total_tokens"].sum())
    if n == 0 or t_total == 0:
        return empty
    idf = {
        t: int(np.floor(np.log(
            float(2 * n - 2 * int(g[f"df_{t}"].sum()) + 1)
            / (2 * int(g[f"df_{t}"].sum()) + 1)) * 1e6 + 0.5))
        for t in _BM25_TERMS
    }

    def _score(b: pa.Table) -> pa.Table:
        cols = {"doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "score_units": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        ids, words = _words(b)
        d = pd.DataFrame({"doc_id": ids, "word": words})
        dl = d.groupby("doc_id").size().rename("dl")
        tf = (d[d["word"].isin(_BM25_TERMS)]
              .groupby(["doc_id", "word"], as_index=False).size()
              .rename(columns={"size": "tf"}))
        if not len(tf):
            return pa.table(cols)
        tf = tf.join(dl, on="doc_id")
        tfa = tf["tf"].to_numpy(np.int64)
        dla = tf["dl"].to_numpy(np.int64)
        idf_f = tf["word"].map({t: float(u) for t, u in idf.items()}
                               ).to_numpy(np.float64)
        su = np.floor(
            idf_f * (22.0 * tfa)
            / ((10 * tfa + 3) + ((9.0 * dla) * n) / t_total)
            + 0.5
        ).astype(np.int64)
        per_doc = (pd.DataFrame({"doc_id": tf["doc_id"].to_numpy(np.int64),
                                 "n_tokens": dla, "score_units": su})
                   .groupby(["doc_id", "n_tokens"], as_index=False)
                   ["score_units"].sum())
        cand = per_doc.sort_values(
            ["score_units", "doc_id"], ascending=[False, True]).head(k)
        cand["score_units"] = cand["score_units"].astype("int64")
        return pa.Table.from_pandas(
            cand[["doc_id", "n_tokens", "score_units"]],
            preserve_index=False)

    parts = ds.map_batches(_score, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    if not len(parts) or "doc_id" not in parts.columns:
        return empty
    out = parts.sort_values(["score_units", "doc_id"],
                            ascending=[False, True]).head(k).copy()
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    for c in ("doc_id", "n_tokens", "score_units"):
        out[c] = out[c].astype("int64")
    return out[["rank", "doc_id", "n_tokens", "score_units"]].reset_index(
        drop=True)


def q_lang_confusion(sf_dir: str):
    """Classifier-evaluation confusion matrix: labeled lang x predicted
    lang (the stopword-vote heuristic of lang_id_counts) with per-label
    row totals and shares — the eval surface that tells a curation
    pipeline WHICH languages the cheap classifier is safe to route on.

    Exactness: the prediction reuses lang_id_batch verbatim (row order is
    preserved within a batch, so the label zips back on positionally);
    shares are half-up ratios of exact counts. Scale shape: per-block
    (lang, pred) cell counts fold driver-side — bounded by the language
    domain squared, never rows."""
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_up, typed_empty
    from .text import lang_id_batch

    empty = typed_empty(lang=object, pred_lang=object, n="int64",
                        n_lang="int64", share="float64")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {
            "lang": pa.array([], pa.string()),
            "pred_lang": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        preds = lang_id_batch(b)
        g = (pd.DataFrame({"lang": b["lang"].to_pandas().to_numpy(),
                           "pred_lang": preds["pred_lang"].to_pandas()
                           .to_numpy()})
             .groupby(["lang", "pred_lang"], as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["lang", "pred_lang"], ["n"],
    )
    if cells is None:
        return empty
    cells["n"] = cells["n"].astype("int64")
    cells["n_lang"] = cells.groupby("lang")["n"].transform("sum").astype(
        "int64")
    cells["share"] = round_half_up(
        cells["n"].to_numpy(np.float64)
        / cells["n_lang"].to_numpy(np.float64), 6)
    return cells.sort_values(["lang", "pred_lang"]).reset_index(drop=True)


def q_embed_semdedup(sf_dir: str, tau: float = 0.95, k: int = 8):
    """SemDeDup-style semantic dedup summary (Abbas et al. 2023,
    arXiv:2303.09540 shape): cluster the embedding space, then mark a
    vector a semantic duplicate if an EARLIER (lower-id) vector in the
    SAME cluster has cosine >= tau — pairwise search never leaves a
    cluster, which is the paper's trick for avoiding the corpus-wide
    all-pairs scan. The raw synthetic embeddings have no natural
    near-dups (max pairwise cosine ~0.51), so the corpus is
    deterministically AUGMENTED in both engines: every vec_id % 4 == 0
    vector gains a planted near-copy (dim 0 shifted by +0.25 — an exact
    binary fraction, so the float arithmetic is bit-identical in numpy
    and DuckDB) with id 1_000_000 + vec_id; planted copies land at
    cosine ~0.968-0.978 to their source, far above every natural pair.

    Exactness: cluster assignment is argmax over 6dp-rounded cosines to
    the first-k (vec_id < k) vectors with lowest-cid tie-break (ties
    measure-zero, the embed_nn_join precedent); the dup predicate
    compares 6dp-rounded cosines to tau on both sides.

    Scale shape: assignment + augmentation are one vectorized matmul per
    block against a closure-carried (k, d) centroid matrix; the pair
    scan runs inside groupby(cluster).map_groups with CHUNKED cosine
    tiles (memory O(chunk x m), never O(m^2)), and only k (cluster,
    n_vecs, n_dups) rows reach the driver. At real scale k grows with
    the corpus (the paper uses k ~ n/expected-cluster-size), keeping the
    per-cluster quadratic term bounded — exactly the auto_planes logic
    dedup.py applies to LSH keys."""
    from ..util import typed_empty
    from .similarity import _to_matrix

    empty = typed_empty(cluster="int64", n_vecs="int64", n_dups="int64")
    cents = _query_vecs(sf_dir, n=k)
    if not len(cents):
        return empty
    cnorm = np.linalg.norm(cents, axis=1)

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vec_id" not in b.column_names:
            return pa.table({
                "cluster": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "v": pa.array([], pa.large_list(pa.float64())),
            })
        X = _to_matrix(b["embedding"])
        ids = b["vec_id"].to_numpy().astype(np.int64)
        plant = ids % 4 == 0
        Xp = X[plant].copy()
        if len(Xp):
            Xp[:, 0] += 0.25
        Xa = np.vstack([X, Xp])
        ida = np.concatenate([ids, 1_000_000 + ids[plant]])
        S = np.round(
            (Xa @ cents.T) / np.outer(np.linalg.norm(Xa, axis=1), cnorm), 6
        )
        cl = np.argmax(S, axis=1).astype(np.int64)  # first max = lowest cid
        n, d = Xa.shape
        offs = pa.array(np.arange(n + 1, dtype=np.int64) * d, pa.int64())
        vec = pa.LargeListArray.from_arrays(
            offs, pa.array(Xa.ravel(), pa.float64())
        )
        return pa.table({
            "cluster": pa.array(cl, pa.int64()),
            "vec_id": pa.array(ida, pa.int64()),
            "v": vec,
        })

    def _cluster_dups(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"cluster": pd.Series([], dtype="int64"),
                    "n_vecs": pd.Series([], dtype="int64"),
                    "n_dups": pd.Series([], dtype="int64")}
        if not len(g) or "vec_id" not in g.columns:
            return pd.DataFrame(out_cols)
        g = g.sort_values("vec_id")
        X = np.stack(g["v"].to_numpy())
        nrm = np.linalg.norm(X, axis=1)
        m = len(g)
        dup = np.zeros(m, dtype=bool)
        cols = np.arange(m)
        ch = 1024
        for s0 in range(1, m, ch):
            e0 = min(s0 + ch, m)
            C = np.round(
                (X[s0:e0] @ X.T) / np.outer(nrm[s0:e0], nrm), 6
            )
            mask = cols[None, :] < np.arange(s0, e0)[:, None]
            dup[s0:e0] = ((C >= tau) & mask).any(axis=1)
        return pd.DataFrame({
            "cluster": pd.array([int(g["cluster"].iloc[0])], dtype="int64"),
            "n_vecs": pd.array([m], dtype="int64"),
            "n_dups": pd.array([int(dup.sum())], dtype="int64"),
        })

    parts = (
        emb.map_batches(_assign, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None)
        .groupby("cluster")
        .map_groups(_cluster_dups, batch_format="pandas")
    )
    df = parts.to_pandas()
    if not len(df) or "cluster" not in df.columns:
        return empty
    for c in ("cluster", "n_vecs", "n_dups"):
        df[c] = df[c].astype("int64")
    return df.sort_values("cluster").reset_index(drop=True)


def q_source_fertility(sf_dir: str):
    """Tokenizer-fertility rollup per source: characters per whitespace
    word and per BPE-ish piece — the compression diagnostic that sizes a
    token budget per corpus slice (high fertility = expensive slice).

    Exactness: all three counters are exact integer per-block partials
    (the shared ws_token_counts / _BPE_RE kernels, pinned to the same
    regexes the doc_token_counts / doc_bpe_tokens oracles use); the two
    ratios are ratio-of-integers, so they round with half-up (DuckDB
    round semantics), per the repo's ratio rule. Scale shape: partials
    are source-cardinality per block; the driver fold never sees rows.
    Per-block int64 char sums are safe below ~1e14 chars/block and the
    corpus total fits int64 up to ~9e18 chars (the BIGINT oracle cast
    raises past that on both sides)."""
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_up, typed_empty
    from .text import _BPE_RE, ws_token_counts

    empty = typed_empty(source=object, n_docs="int64", n_chars="int64",
                        n_ws_tokens="int64", n_bpe_pieces="int64",
                        chars_per_word="float64", chars_per_piece="float64")
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
            "n_ws_tokens": pa.array([], pa.int64()),
            "n_bpe_pieces": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = pd.Series(b["text"].to_pandas())
        df = pd.DataFrame({
            "source": b["source"].to_pandas().to_numpy(),
            "n_chars": s.str.len().astype("int64"),
            "n_ws": ws_token_counts(s),
            "n_bpe": s.str.findall(_BPE_RE).str.len().fillna(0)
            .astype("int64"),
        })
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), n_chars=("n_chars", "sum"),
            n_ws_tokens=("n_ws", "sum"), n_bpe_pieces=("n_bpe", "sum"))
        for c in ("n_docs", "n_chars", "n_ws_tokens", "n_bpe_pieces"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = _fold_partials(
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["source"], ["n_docs", "n_chars", "n_ws_tokens", "n_bpe_pieces"],
    )
    if out is None:
        return empty
    for c in ("n_docs", "n_chars", "n_ws_tokens", "n_bpe_pieces"):
        out[c] = out[c].astype("int64")
    chars = out["n_chars"].to_numpy(np.float64)
    out["chars_per_word"] = round_half_up(
        chars / out["n_ws_tokens"].to_numpy(np.float64), 6)
    bpe = out["n_bpe_pieces"].to_numpy(np.float64)
    out["chars_per_piece"] = np.where(
        bpe == 0, np.nan, round_half_up(chars / np.maximum(bpe, 1.0), 6))
    return out.sort_values("source").reset_index(drop=True)


def q_doc_continuation_pairs(sf_dir: str):
    """Split-document re-join candidates: pairs (doc_a, doc_b) where
    doc_a's LAST five words exactly equal doc_b's FIRST five words — the
    boundary-shingle screen a curation pipeline runs to re-assemble
    documents a crawler chunked mid-paragraph. The raw synthetic corpus
    has zero natural tail->head matches, so the corpus is
    deterministically AUGMENTED in both engines (the pii_redaction /
    embed_semdedup pattern): every doc_id % 7 == 0 doc with >= 5 words
    gains a planted continuation (its last 5 words + its first 3) under
    id 2_000_000 + doc_id.

    Exactness: shingles are literal space-joined word lists under the
    shared ASCII trim/split convention; the join key is the string
    itself (no hashing on the compare path). Scale shape: tagged
    (key, side, doc) rows hash-bucket on the shingle via
    stable_partition — each key's rows land in one task and only
    matched pairs leave the bucket; document text never shuffles."""
    from ..partition import stable_partition
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(doc_a="int64", doc_b="int64")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {
            "key": pa.array([], pa.string()),
            "side": pa.array([], pa.int64()),
            "doc": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = pd.Series(b["text"].to_pandas())
        ids = b["doc_id"].to_pandas().to_numpy()
        words = s.str.strip(_ASCII_WS).str.split(_WS_RE)
        ok = (words.str.len().fillna(0) >= 5).to_numpy()
        head5 = words.str[:5].str.join(" ")
        tail5 = words.str[-5:].str.join(" ")
        pm = ok & (ids % 7 == 0)
        pw = (words.str[-5:] + words.str[:3])[pm]
        ph = pw.str[:5].str.join(" ").to_numpy()
        pt = pw.str[-5:].str.join(" ").to_numpy()
        pids = 2_000_000 + ids[pm]
        bh = head5[ok].to_numpy()
        bt = tail5[ok].to_numpy()
        bids = ids[ok]
        key = np.concatenate([bt, pt, bh, ph])
        doc = np.concatenate([bids, pids, bids, pids]).astype(np.int64)
        side = np.concatenate([
            np.zeros(len(bt) + len(pt), np.int64),
            np.ones(len(bh) + len(ph), np.int64),
        ])
        df = pd.DataFrame({"key": key, "side": side, "doc": doc})
        df["_part"] = stable_partition(df["key"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64")}
        if not len(g) or "key" not in g.columns:
            return pd.DataFrame(out_cols)
        t = g[g["side"] == 0][["key", "doc"]]
        h = g[g["side"] == 1][["key", "doc"]]
        m = t.merge(h, on="key", suffixes=("_a", "_b"))
        m = m[m["doc_a"] != m["doc_b"]]
        if not len(m):
            return pd.DataFrame(out_cols)
        return pd.DataFrame({"doc_a": m["doc_a"].astype("int64"),
                             "doc_b": m["doc_b"].astype("int64")})

    parts = (
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
    )
    df = parts.to_pandas()
    if not len(df) or "doc_a" not in df.columns:
        return empty
    for c in ("doc_a", "doc_b"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_dup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size histogram: how many transitive duplicate
    clusters exist at each size — the summary that turns the dup graph
    into a curation decision (a fat tail of giant clusters means
    boilerplate/mirror domains, many pairs means true near-dups).

    Rides the exact q_dup_clusters machinery (ngram-jaccard edge set ->
    distributed min-label propagation); sizes fold as per-block
    (cluster_rep, n) partials (the CC output is dup-graph-nodes-sized,
    not corpus-sized), and the final histogram is bounded by the size
    DOMAIN."""
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty
    from .dedup import ngram_jaccard_pairs
    from .graph import connected_components

    empty = typed_empty(cluster_size="int64", n_clusters="int64")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, threshold=0.5, as_dataset=True)
    cc = connected_components(pairs)

    def _part(b: pa.Table) -> pa.Table:
        cols = {"cluster_rep": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "cluster_rep" not in b.column_names:
            return pa.table(cols)
        g = (b.select(["cluster_rep"]).to_pandas()
             .groupby("cluster_rep", as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    sizes = _fold_partials(
        cc.map_batches(_part, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["cluster_rep"], ["n"],
    )
    if sizes is None or not len(sizes):
        return empty
    hist = (sizes.groupby("n", as_index=False).size()
            .rename(columns={"n": "cluster_size", "size": "n_clusters"}))
    for c in ("cluster_size", "n_clusters"):
        hist[c] = hist[c].astype("int64")
    return hist.sort_values("cluster_size").reset_index(drop=True)


def q_source_ngram_diversity(sf_dir: str, max_n: int = 3):
    """N-gram diversity per source (distinct n-grams / total n-grams for
    n = 1..max_n) — the Self-BLEU-adjacent memorization/templating
    screen: low diversity at n=2/3 flags sources whose documents repeat
    the same phrasing.

    Exactness: counts are exact integers under the shared ASCII
    trim/split convention; diversity is ratio-of-ints half-up. Scale
    shape: totals are per-block integer partials (no shuffle); distinct
    counts shuffle only (source, n, gram) rows hash-bucketed on the gram
    string via stable_partition — a gram lands in exactly one bucket, so
    per-bucket nunique partials SUM to the global distinct count; text
    never shuffles and the driver fold is bounded by sources x max_n x
    buckets."""
    from ..partition import stable_partition
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_up, typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(source=object, n="int64", n_grams="int64",
                        n_distinct="int64", diversity="float64")
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def _grams(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "gram": pa.array([], pa.string()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = pd.Series(b["text"].to_pandas()).reset_index(drop=True)
        src = pd.Series(b["source"].to_pandas()).reset_index(drop=True)
        words = s.str.strip(_ASCII_WS).str.split(_WS_RE)
        ex = words.explode()
        f0 = pd.DataFrame({
            "source": src.to_numpy()[ex.index.to_numpy()],
            "w": ex.to_numpy(),
        })
        # position within doc + doc length, vectorized; a global shift(-k)
        # is safe because rows of one doc are consecutive and the
        # pos <= len - n mask excludes every window that would cross a
        # document boundary
        pos = f0.groupby(ex.index.to_numpy()).cumcount().to_numpy()
        lens = words.str.len().fillna(0).astype("int64").to_numpy()
        doclen = lens[ex.index.to_numpy()]
        w = f0["w"].astype(str)
        frames = []
        gram = w.copy()
        for n in range(1, max_n + 1):
            if n > 1:
                gram = gram + " " + w.shift(-(n - 1)).fillna("")
            mask = pos <= doclen - n
            f = pd.DataFrame({"source": f0["source"].to_numpy()[mask],
                              "gram": gram.to_numpy()[mask]})
            f = f.drop_duplicates()
            f["n"] = n
            frames.append(f)
        df = pd.concat(frames, ignore_index=True)
        # block-local distinct first: one row per (source, n, gram) seen
        # in this block (a pure reduction; global distinct happens in the
        # buckets)
        df = df.drop_duplicates()
        df["_part"] = stable_partition(df["gram"], 64)
        return pa.Table.from_pandas(
            df[["source", "n", "gram", "_part"]], preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"source": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                    "n_distinct": pd.Series([], dtype="int64")}
        if not len(g) or "gram" not in g.columns:
            return pd.DataFrame(out_cols)
        out = (g.drop_duplicates(["source", "n", "gram"])
               .groupby(["source", "n"], as_index=False).size()
               .rename(columns={"size": "n_distinct"}))
        for c in ("n", "n_distinct"):
            out[c] = out[c].astype("int64")
        return out

    dist = _fold_partials(
        ds.map_batches(_grams, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["source", "n"], ["n_distinct"],
    )

    def _totals(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "n_grams": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = pd.Series(b["text"].to_pandas())
        src = pd.Series(b["source"].to_pandas())
        nw = s.str.strip(_ASCII_WS).str.split(_WS_RE).str.len().fillna(0) \
            .astype("int64")
        frames = []
        for n in range(1, max_n + 1):
            cnt = (nw - (n - 1)).clip(lower=0)
            f = pd.DataFrame({"source": src, "n_grams": cnt})
            f = f.groupby("source", as_index=False)["n_grams"].sum()
            f["n"] = n
            frames.append(f)
        df = pd.concat(frames, ignore_index=True)
        for c in ("n", "n_grams"):
            df[c] = df[c].astype("int64")
        return pa.Table.from_pandas(
            df[["source", "n", "n_grams"]], preserve_index=False)

    tot = _fold_partials(
        ds.map_batches(_totals, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["source", "n"], ["n_grams"],
    )
    if tot is None or dist is None or not len(tot):
        return empty
    out = tot.merge(dist, on=["source", "n"], how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out["n_grams"] = out["n_grams"].astype("int64")
    out = out[out["n_grams"] > 0]
    if not len(out):
        return empty
    out["diversity"] = round_half_up(
        out["n_distinct"].to_numpy(np.float64)
        / out["n_grams"].to_numpy(np.float64), 6)
    return out.sort_values(["source", "n"]).reset_index(drop=True)


def q_corpus_version_diff(sf_dir: str):
    """Dataset-versioning diff report: per source, how many documents
    are unchanged / changed / removed / added between corpus version A
    (the documents table) and version B (a deterministically derived
    next release: doc_id % 13 == 0 removed, else % 11 == 0 edited by
    appending ' v2', plus new docs under id 3_000_000 + doc_id for
    doc_id % 17 == 0) — the audit a data-lake diff runs before
    retraining on a refreshed crawl. Both engines derive B identically
    (the pii_redaction pattern), and the diff itself runs as a REAL
    content-hash outer join, not a shortcut on the shared lineage.

    Exactness: identity is md5(text) — equal-by-construction on both
    sides. Scale shape: both versions reduce to (doc_id, source, h,
    side) hash rows (text never shuffles), hash-bucket by doc_id via
    stable_partition so each id's A/B rows meet in one task; buckets
    emit per-source counter partials only."""
    import hashlib

    from ..partition import stable_partition
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty

    empty = typed_empty(source=object, n_same="int64", n_changed="int64",
                        n_removed="int64", n_added="int64")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def _md5s(texts) -> np.ndarray:
        return np.fromiter(
            (hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts),
            dtype=object, count=len(texts))

    def _tag(b: pa.Table) -> pa.Table:
        cols = {
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "h": pa.array([], pa.string()),
            "side": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        src = b["source"].to_pandas().to_numpy()
        txt = b["text"].to_pylist()
        ha = _md5s(txt)
        keep = ids % 13 != 0
        edit = keep & (ids % 11 == 0)
        hb = ha.copy()
        if edit.any():
            hb[edit] = _md5s([t + " v2" for t, e in zip(txt, edit) if e])
        new = ids % 17 == 0
        hn = _md5s(["new " + t for t, m in zip(txt, new) if m])
        doc = np.concatenate([ids, ids[keep], 3_000_000 + ids[new]])
        source = np.concatenate([src, src[keep], src[new]])
        h = np.concatenate([ha, hb[keep], hn])
        side = np.concatenate([
            np.zeros(len(ids), np.int64),
            np.ones(int(keep.sum()) + int(new.sum()), np.int64),
        ])
        df = pd.DataFrame({"doc_id": doc, "source": source, "h": h,
                           "side": side})
        df["_part"] = stable_partition(df["doc_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"source": pd.Series([], dtype=object),
                    "n_same": pd.Series([], dtype="int64"),
                    "n_changed": pd.Series([], dtype="int64"),
                    "n_removed": pd.Series([], dtype="int64"),
                    "n_added": pd.Series([], dtype="int64")}
        if not len(g) or "doc_id" not in g.columns:
            return pd.DataFrame(out_cols)
        a = g[g["side"] == 0][["doc_id", "source", "h"]]
        bb = g[g["side"] == 1][["doc_id", "source", "h"]]
        m = a.merge(bb, on="doc_id", how="outer", suffixes=("_a", "_b"))
        in_a = m["h_a"].notna()
        in_b = m["h_b"].notna()
        m["source"] = m["source_a"].where(in_a, m["source_b"])
        m["n_same"] = (in_a & in_b & (m["h_a"] == m["h_b"])).astype("int64")
        m["n_changed"] = (in_a & in_b & (m["h_a"] != m["h_b"])) \
            .astype("int64")
        m["n_removed"] = (in_a & ~in_b).astype("int64")
        m["n_added"] = (~in_a & in_b).astype("int64")
        out = m.groupby("source", as_index=False)[
            ["n_same", "n_changed", "n_removed", "n_added"]].sum()
        for c in ("n_same", "n_changed", "n_removed", "n_added"):
            out[c] = out[c].astype("int64")
        return out

    out = _fold_partials(
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["source"], ["n_same", "n_changed", "n_removed", "n_added"],
    )
    if out is None:
        return empty
    for c in ("n_same", "n_changed", "n_removed", "n_added"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_heaps_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary-growth curve: cumulative corpus statistics
    at ten doc_id-value checkpoints T_k = (max_doc * k) // 10 — document
    count, running token total, and distinct-vocabulary size after
    ingesting every doc with doc_id <= T_k. The scaling diagnostic a
    corpus-growth plan reads before committing to a bigger crawl
    (V(n) ~ K * n^beta: sublinear vocab growth means new crawl volume
    mostly repeats known vocabulary).

    Exactness: all counters are exact integers under the shared ASCII
    trim/split convention; checkpoints are pure integer arithmetic.
    Scale shape: docs/tokens fold as 10-counter per-block partials via a
    searchsorted prefix (no shuffle); vocabulary shuffles only
    block-distinct (word, min doc_id) pairs hash-bucketed on the word
    via stable_partition — a word lands in exactly one bucket, so
    per-bucket counts of first-seen <= T_k SUM to the global vocab.
    Text never shuffles; the driver fold is bounded by
    10 x (blocks + buckets) rows."""
    from ..partition import stable_partition
    from ..pipelines.queries import _fold_partials
    from ..util import typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(k="int64", doc_cut="int64", n_docs="int64",
                        n_tokens="int64", vocab="int64")

    def _mx(b: pa.Table) -> pa.Table:
        cols = {"m": pa.array([], pa.int64())}
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table(cols)
        return pa.table({"m": pa.array(
            [int(b["doc_id"].to_numpy().max())], pa.int64())})

    mparts = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(_mx, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .to_pandas()
    )
    if not len(mparts) or "m" not in mparts.columns:
        return empty
    mdoc = int(mparts["m"].max())
    cuts = np.array([(mdoc * k) // 10 for k in range(1, 11)], dtype=np.int64)
    ks = np.arange(1, 11, dtype=np.int64)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _doc_partials(b: pa.Table) -> pa.Table:
        cols = {
            "k": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        s = pd.Series(b["text"].to_pandas())
        nw = (s.str.strip(_ASCII_WS).str.split(_WS_RE).str.len().fillna(0)
              .astype("int64").to_numpy())
        order = np.argsort(ids, kind="stable")
        sids = ids[order]
        cum = np.concatenate([[0], np.cumsum(nw[order])])
        idx = np.searchsorted(sids, cuts, side="right")
        return pa.table({
            "k": pa.array(ks, pa.int64()),
            "n_docs": pa.array(idx.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(cum[idx].astype(np.int64), pa.int64()),
        })

    def _first_seen(b: pa.Table) -> pa.Table:
        cols = {
            "w": pa.array([], pa.string()),
            "fd": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        s = pd.Series(b["text"].to_pandas()).reset_index(drop=True)
        ex = s.str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        f = (pd.DataFrame({"w": ex.to_numpy().astype(str),
                           "fd": ids[ex.index.to_numpy()]})
             .groupby("w", as_index=False)["fd"].min())
        f["_part"] = stable_partition(f["w"], 64)
        return pa.Table.from_pandas(f[["w", "fd", "_part"]],
                                    preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"k": pd.Series([], dtype="int64"),
                    "vocab": pd.Series([], dtype="int64")}
        if not len(g) or "w" not in g.columns:
            return pd.DataFrame(out_cols)
        fd = np.sort(g.groupby("w")["fd"].min().to_numpy(np.int64))
        idx = np.searchsorted(fd, cuts, side="right")
        return pd.DataFrame({"k": ks, "vocab": idx.astype("int64")})

    dt = _fold_partials(
        ds.map_batches(_doc_partials, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["k"], ["n_docs", "n_tokens"],
    )
    voc = _fold_partials(
        ds.map_batches(_first_seen, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["k"], ["vocab"],
    )
    if dt is None or voc is None:
        return empty
    out = dt.merge(voc, on="k", how="left")
    out["doc_cut"] = cuts[out["k"].to_numpy(np.int64) - 1]
    for c in ("k", "doc_cut", "n_docs", "n_tokens", "vocab"):
        out[c] = out[c].fillna(0).astype("int64")
    return (out[["k", "doc_cut", "n_docs", "n_tokens", "vocab"]]
            .sort_values("k").reset_index(drop=True))


def q_corpus_drift_psi(sf_dir: str):
    """Per-source corpus-drift PSI (population stability index) between
    the first and second half of the corpus (doc_id <= max//2 vs the
    rest) over ten fixed document-length buckets (min(9, n_chars//100))
    — the standard distribution-shift audit a pipeline runs on a
    refreshed crawl before retraining (PSI > 0.2 flags actionable
    drift). Cells observed on only one side contribute 0 by the
    exclusion convention (documented; smoothing would make the value
    estimator-dependent).

    Exactness: counts are exact integer folds; ln quantizes PER FACTOR
    to 1e-6-unit int64s (the lang_source_mi convention — all four
    factors are lns of positive ints, so half-up floor(x*1e6+0.5)
    equals the oracle's half-away round) and
    ln_ratio_units = ln(n_a) + ln(T_b) - ln(n_b) - ln(T_a) is exact int
    arithmetic with no cross-products that could overflow BIGINT at
    corpus scale. psi_term runs as the identical IEEE
    (n_a/T_a - n_b/T_b) * lnr / 1e6 on both sides, half-away round.

    Scale shape: ONE (source, bucket, half) counter fold bounded by
    sources x 10 x 2 (text never leaves the workers; no shuffle at
    all); the half split needs only a max(doc_id) pre-pass over the
    pruned id column. Marginals and PSI terms derive on the driver
    from the folded cells."""
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_away, typed_empty

    empty = typed_empty(source=object, bucket="int64", n_a="int64",
                        n_b="int64", total_a="int64", total_b="int64",
                        ln_ratio_units="int64", psi_term="float64")

    def _mx(b: pa.Table) -> pa.Table:
        cols = {"m": pa.array([], pa.int64())}
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table(cols)
        return pa.table({"m": pa.array(
            [int(b["doc_id"].to_numpy().max())], pa.int64())})

    mparts = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(_mx, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .to_pandas()
    )
    if not len(mparts) or "m" not in mparts.columns:
        return empty
    mid = int(mparts["m"].max()) // 2

    def _cells(b: pa.Table) -> pa.Table:
        cols = {
            "source": pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "doc_id" not in b.column_names:
            return pa.table(cols)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        nc = b["n_chars"].to_numpy().astype(np.int64)
        g = (pd.DataFrame({
            "source": b["source"].to_pandas().to_numpy(),
            "bucket": np.minimum(9, nc // 100),
            "n_a": (ids <= mid).astype(np.int64),
            "n_b": (ids > mid).astype(np.int64),
        }).groupby(["source", "bucket"], as_index=False)[["n_a", "n_b"]]
          .sum())
        for c in ("bucket", "n_a", "n_b"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["source", "bucket"], ["n_a", "n_b"],
    )
    if cells is None:
        return empty
    na = cells["n_a"].to_numpy(np.int64)
    nb = cells["n_b"].to_numpy(np.int64)
    ta = cells.groupby("source")["n_a"].transform("sum").to_numpy(np.int64)
    tb = cells.groupby("source")["n_b"].transform("sum").to_numpy(np.int64)
    both = (na > 0) & (nb > 0)

    def _lnu(v) -> np.ndarray:
        x = np.asarray(v, dtype=np.float64)
        return np.floor(
            np.log(np.where(x > 0, x, 1.0)) * 1e6 + 0.5).astype(np.int64)

    lnr = np.where(both, _lnu(na) + _lnu(tb) - _lnu(nb) - _lnu(ta), 0)
    pa_frac = np.divide(na.astype(np.float64), ta,
                        out=np.zeros(len(na)), where=ta > 0)
    pb_frac = np.divide(nb.astype(np.float64), tb,
                        out=np.zeros(len(nb)), where=tb > 0)
    psi = np.where(
        both, round_half_away((pa_frac - pb_frac) * lnr / 1e6, 6), 0.0)
    out = pd.DataFrame({
        "source": cells["source"].to_numpy(),
        "bucket": cells["bucket"].to_numpy(np.int64),
        "n_a": na, "n_b": nb, "total_a": ta, "total_b": tb,
        "ln_ratio_units": lnr.astype(np.int64),
        "psi_term": psi,
    })
    for c in ("bucket", "n_a", "n_b", "total_a", "total_b",
              "ln_ratio_units"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["source", "bucket"]).reset_index(drop=True)


def q_docs_score_auc(sf_dir: str):
    """Mann-Whitney AUC of the whitespace word count as a separator of
    English vs non-English documents — the rank statistic (= ROC area)
    a pipeline computes to validate ANY per-doc score against a binary
    label before trusting it as a curation filter. Ties take the
    standard half credit: AUC = P(score_en > score_other)
    + P(tie)/2.

    Exactness: AUC is a pure function of the (word_count -> n_pos,
    n_neg) HISTOGRAM — with scores sorted ascending,
    u2 = 2*U = sum_s pos_s * (2*cum_neg_below(s) + neg_s). All sums run
    in Python ints (HUGEINT oracle-side) with the int64 fail-fast the
    oracle's CAST(... AS BIGINT) mirrors, and ONE float division at the
    end (float(u2) / float(2*n_pos*n_neg), half-up round — identical to
    the oracle's CAST-CAST-divide). A one-class corpus yields the typed
    empty frame on both sides (oracle HAVING).

    Scale shape: one (score, pos, neg) counter fold bounded by distinct
    word counts (<= max doc words); text never leaves the workers; the
    driver sees only the histogram and folds it sequentially in Python
    ints."""
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_up, typed_empty
    from .text import ws_token_counts

    empty = typed_empty(n_pos="int64", n_neg="int64", u2="int64",
                        auc="float64")

    def _hist(b: pa.Table) -> pa.Table:
        cols = {"score": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "neg": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        wc = ws_token_counts(b["text"].to_pandas()).to_numpy(np.int64)
        is_en = b["lang"].to_pandas().to_numpy() == "en"
        g = (pd.DataFrame({"score": wc,
                           "pos": is_en.astype(np.int64),
                           "neg": (~is_en).astype(np.int64)})
             .groupby("score", as_index=False)[["pos", "neg"]].sum())
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _fold_partials(
        _read(sf_dir, "documents", columns=["text", "lang"])
        .map_batches(_hist, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["score"], ["pos", "neg"],
    )
    if hist is None:
        return empty
    hist = hist.sort_values("score")
    n_pos = int(hist["pos"].astype(object).sum())
    n_neg = int(hist["neg"].astype(object).sum())
    if n_pos == 0 or n_neg == 0:
        return empty
    u2, cum_neg = 0, 0
    for p_s, n_s in zip(hist["pos"].tolist(), hist["neg"].tolist()):
        u2 += int(p_s) * (2 * cum_neg + int(n_s))
        cum_neg += int(n_s)
    denom = 2 * n_pos * n_neg
    if u2 > 2**63 - 1 or denom > 2**63 - 1:
        # the oracle's CAST(... AS BIGINT) raises here; silent wrap is
        # the divergence class CLAUDE.md's big-int rule exists for
        raise OverflowError(
            "docs_score_auc: u2/denominator exceed BIGINT at this corpus "
            "size; widen the output type on both sides")
    auc = float(round_half_up(
        np.array([float(u2) / float(denom)]), 6)[0])
    return pd.DataFrame({"n_pos": pd.Series([n_pos], dtype="int64"),
                         "n_neg": pd.Series([n_neg], dtype="int64"),
                         "u2": pd.Series([u2], dtype="int64"),
                         "auc": pd.Series([auc], dtype="float64")})


def q_events_spearman_daily(sf_dir: str):
    """Spearman rank correlation between a day's event volume and its
    distinct active users — the standard "is traffic growth real users
    or bot bursts" monotonic-association check, robust to the heavy
    right tail that makes Pearson useless on volume data.

    Exactness: average ranks over days are exact half-integers, so
    BOTH rank vectors are carried as 2*avg_rank ints
    (2*RANK() + COUNT(*) OVER (PARTITION BY value) - 1 oracle-side, the
    identical integers). Spearman rho is Pearson over those ints:
    num = n*Sxy - Sx*Sy, dx = n*Sxx - Sx^2, dy = n*Syy - Sy^2, all in
    Python ints (HUGEINT oracle-side; bounded by 4*n_days^4 — int64-safe
    past 10^4 days, fail-fast beyond), one float expression at the end
    (num / sqrt(dx_float * dy_float), half-away round) identical to the
    oracle. Zero-variance sides yield the typed empty frame (oracle
    WHERE dx > 0 AND dy > 0).

    Scale shape: x folds from (day, n) counter partials; y reuses the
    events_hourly_distinct bucket shape (distinct (day, user) pairs
    hash-bucketed by user so each user's copies dedupe in one task; only
    (day, n_users) cells leave the buckets). The driver frame is
    day-cardinality by construction (~365 rows/year at any corpus
    size)."""
    import math

    import pyarrow.compute as pc

    from ..partition import stable_partition
    from ..pipelines.queries import _day_from_us, _fold_partials, _read as _r
    from ..util import round_half_away, typed_empty

    empty = typed_empty(n_days="int64", num="int64", dx="int64",
                        dy="int64", rho="float64")

    def _day_counts(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "x": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        g = (pd.DataFrame({"day": _day_from_us(
                pc.cast(b["ts"], pa.int64())).to_numpy(
                    zero_copy_only=False)})
             .groupby("day", as_index=False).size()
             .rename(columns={"size": "x"}))
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def _day_users(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["ts"]),
                             pc.is_valid(b["user_id"])))
        df = pd.DataFrame({
            "day": _day_from_us(pc.cast(b["ts"], pa.int64())).to_numpy(
                zero_copy_only=False),
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _count_users(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "day" not in g.columns:
            return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64")})
        out = (g.drop_duplicates(["day", "user_id"])
               .groupby("day", as_index=False).size()
               .rename(columns={"size": "y"}))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    ev = sf_dir  # alias for clarity below
    xf = _fold_partials(
        _r(ev, "events", columns=["ts"])
        .map_batches(_day_counts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None),
        ["day"], ["x"],
    )
    if xf is None:
        return empty
    yf = (
        _r(ev, "events", columns=["ts", "user_id"])
        .map_batches(_day_users, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_count_users, batch_format="pandas")
        .to_pandas()
    )
    if len(yf) and "day" in yf.columns:
        yf = yf.groupby("day", as_index=False)["y"].sum()
        d = xf.merge(yf, on="day", how="left")
        d["y"] = d["y"].fillna(0)
    else:
        d = xf.assign(y=0)
    n = len(d)
    # 2*average-rank is always an integer; rank() floats are exact at
    # day cardinality (n < 2^52)
    x2 = (d["x"].rank(method="average") * 2).astype("int64").tolist()
    y2 = (d["y"].rank(method="average") * 2).astype("int64").tolist()
    sx, sy = sum(x2), sum(y2)
    sxx = sum(v * v for v in x2)
    syy = sum(v * v for v in y2)
    sxy = sum(a * b for a, b in zip(x2, y2))
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    if max(abs(num), dx, dy) > 2**63 - 1:
        raise OverflowError(
            "events_spearman_daily: rank sums exceed BIGINT (n_days > "
            "~10^4); widen the output type on both sides")
    if dx == 0 or dy == 0:
        return empty
    rho = float(round_half_away(
        np.array([float(num) / math.sqrt(float(dx) * float(dy))]), 6)[0])
    return pd.DataFrame({"n_days": pd.Series([n], dtype="int64"),
                         "num": pd.Series([num], dtype="int64"),
                         "dx": pd.Series([dx], dtype="int64"),
                         "dy": pd.Series([dy], dtype="int64"),
                         "rho": pd.Series([rho], dtype="float64")})


def q_source_len_ks(sf_dir: str):
    """Pairwise two-sample Kolmogorov-Smirnov distance between sources'
    document-length distributions — the ECDF sup-norm audit that ranks
    which source pairs differ most in length profile (complements
    corpus_drift_psi's bucketed within-source drift with an unbucketed
    between-source test).

    Exactness: over the union grid of observed lengths,
    D = max_v |F_a(v) - F_b(v)| = max_v |c_a(v)*n_b - c_b(v)*n_a|
    / (n_a*n_b); the numerator is exact int64 (|.| <= n_a*n_b, with the
    oracle-mirroring BIGINT fail-fast), the single division is the
    identical CAST-CAST-divide with half-up round.

    Scale shape: one (source, n_chars) counter fold bounded by
    sources x distinct lengths; the driver pivots that small cell frame
    to per-source cumulative counts (numpy int64 cumsum) and sweeps all
    pairs vectorized — documents never shuffle, nothing row-scale
    reaches the driver."""
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_up, typed_empty

    empty = typed_empty(source_a=object, source_b=object, n_a="int64",
                        n_b="int64", d_num="int64", ks="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"source": pa.array([], pa.string()),
                "v": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64())}
        if b.num_rows == 0 or "source" not in b.column_names:
            return pa.table(cols)
        g = (pd.DataFrame({
                "source": b["source"].to_pandas().to_numpy(),
                "v": b["n_chars"].to_numpy(zero_copy_only=False)
                      .astype(np.int64)})
             .groupby(["source", "v"], as_index=False).size()
             .rename(columns={"size": "c"}))
        g["v"] = g["v"].astype("int64")
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "documents", columns=["source", "n_chars"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["source", "v"], ["c"],
    )
    if cells is None:
        return empty
    # pivot: rows = sources (sorted), cols = union length grid (sorted)
    piv = (cells.pivot(index="source", columns="v", values="c")
           .fillna(0).astype(np.int64).sort_index())
    srcs = list(piv.index)
    cum = piv.to_numpy().cumsum(axis=1)          # (S, V) int64
    tot = cum[:, -1]                              # per-source n
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            n_a, n_b = int(tot[i]), int(tot[j])
            if n_a * n_b > 2**63 - 1:
                raise OverflowError(
                    "source_len_ks: n_a*n_b exceeds BIGINT; widen the "
                    "output type on both sides")
            d_num = int(np.abs(cum[i] * n_b - cum[j] * n_a).max())
            ks = float(round_half_up(
                np.array([float(d_num) / float(n_a * n_b)]), 6)[0])
            rows.append((srcs[i], srcs[j], n_a, n_b, d_num, ks))
    out = pd.DataFrame(rows, columns=["source_a", "source_b", "n_a",
                                      "n_b", "d_num", "ks"])
    for c in ("n_a", "n_b", "d_num"):
        out[c] = out[c].astype("int64")
    out["ks"] = out["ks"].astype("float64")
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


def q_source_bigram_cond_entropy(sf_dir: str):
    """Per-source conditional entropy H(next word | current word) over
    adjacent-word bigrams — the bigram-LM cross-entropy of each source
    under its own bigram model, the classic "how predictable is this
    text" quality signal (low = boilerplate/templated, high = diverse
    prose). Bigrams are consecutive non-empty lowercased
    whitespace-words (the word_pmi_topk convention; a doc whose text
    strips empty contributes nothing).

    Exactness: H = sum_cells n * (ln(margin) - ln(n)) / total / 1e6
    with per-factor 1e-6-unit ln quantization (corpus_drift_psi
    convention). The per-bucket weighted unit sums can exceed int64 at
    corpus scale (~1e13 bigrams x 3e7 units), so buckets ship them as
    hi/lo int64 LIMBS (hi = su >> 30, lo = su & (2^30-1) — the
    CLAUDE.md big-int transport rule) and the driver recombines in
    Python ints, fail-fasting at the BIGINT output cast exactly where
    the oracle's CAST raises.

    Scale shape: (source, w1, w2, n) counter partials hash-bucketed by
    the (source, w1) PAIR (stable_pair_partition), so every margin
    group sits whole in one bucket and per-bucket margins are global;
    buckets emit one (source, total, su_hi, su_lo) row each — raw text
    and vocabulary never shuffle beyond the counter cells."""
    from ..partition import stable_pair_partition
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_up, typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(source=object, total_bigrams="int64",
                        sum_units="int64", cond_entropy="float64")
    n_parts = 64

    def _bi_partial(b: pa.Table) -> pa.Table:
        cols = {"source": pa.array([], pa.string()),
                "wa": pa.array([], pa.string()),
                "wb": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        src = pd.Series(b["source"].to_pandas().to_numpy())
        lists = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE)
        ex = lists.explode()
        ex = ex[ex.notna() & (ex != "")]
        df = ex.reset_index()
        df.columns = ["doc", "w"]
        nxt = df["w"].shift(-1)
        same_doc = df["doc"].shift(-1) == df["doc"]
        pairs = pd.DataFrame({
            "source": src.reindex(df["doc"][same_doc]).to_numpy(),
            "wa": df["w"][same_doc].to_numpy(),
            "wb": nxt[same_doc].to_numpy(),
        })
        part = (pairs.groupby(["source", "wa", "wb"], as_index=False)
                .size().rename(columns={"size": "n"}))
        if not len(part):
            return pa.table(cols)
        part["n"] = part["n"].astype("int64")
        part["_part"] = stable_pair_partition(
            part["source"], part["wa"], n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"source": pd.Series([], dtype=object),
                    "total": pd.Series([], dtype="int64"),
                    "su_hi": pd.Series([], dtype="int64"),
                    "su_lo": pd.Series([], dtype="int64")}
        if not len(g) or "wa" not in g.columns:
            return pd.DataFrame(out_cols)
        cells = g.groupby(["source", "wa", "wb"], as_index=False)["n"].sum()
        margin = cells.groupby(["source", "wa"])["n"].transform("sum")
        lnu_m = np.floor(np.log(margin.to_numpy(np.float64)) * 1e6
                         + 0.5).astype(np.int64)
        lnu_n = np.floor(np.log(cells["n"].to_numpy(np.float64)) * 1e6
                         + 0.5).astype(np.int64)
        cells["dm"] = lnu_m - lnu_n  # ln-unit diffs: small ints
        rows = []
        for src, sub in cells.groupby("source"):
            su = sum(int(a) * int(b)
                     for a, b in zip(sub["n"].tolist(), sub["dm"].tolist()))
            rows.append((src, sum(int(v) for v in sub["n"].tolist()),
                         su >> 30, su & ((1 << 30) - 1)))
        out = pd.DataFrame(rows, columns=["source", "total", "su_hi",
                                          "su_lo"])
        for c in ("total", "su_hi", "su_lo"):
            out[c] = out[c].astype("int64")
        return out

    parts = (
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(_bi_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "source" not in parts.columns:
        return empty
    rows = []
    for src, g in parts.groupby("source"):
        total = sum(int(v) for v in g["total"])
        su = (sum(int(v) for v in g["su_hi"]) << 30) \
            + sum(int(v) for v in g["su_lo"])
        if su > 2**63 - 1 or total > 2**63 - 1:
            raise OverflowError(
                "source_bigram_cond_entropy: weighted ln-unit sum "
                "exceeds BIGINT; widen the output type on both sides")
        h = float(round_half_up(
            np.array([float(su) / float(total) / 1e6]), 6)[0])
        rows.append((src, total, su, h))
    out = pd.DataFrame(rows, columns=["source", "total_bigrams",
                                      "sum_units", "cond_entropy"])
    for c in ("total_bigrams", "sum_units"):
        out[c] = out[c].astype("int64")
    out["cond_entropy"] = out["cond_entropy"].astype("float64")
    return out.sort_values("source").reset_index(drop=True)


def _source_word_cells(sf_dir: str, n_parts: int = 64):
    """Shared stage: (source, word, n, _part) counter cells over
    lowercased ASCII-whitespace words (the word_doc_freq parity
    convention), hash-bucketed by the (source, word) PAIR via
    stable_pair_partition so every word's bucket-sum is its GLOBAL
    per-source count. Feeds the lexical-richness family
    (source_yule_k, source_hapax_ratio)."""
    from ..partition import stable_pair_partition
    from .text import _ASCII_WS, _WS_RE

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"source": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        src = pd.Series(b["source"].to_pandas().to_numpy())
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        ex = ex[ex.notna() & (ex != "")]
        if not len(ex):
            return pa.table(cols)
        df = pd.DataFrame({"source": src.reindex(ex.index).to_numpy(),
                           "w": ex.to_numpy()})
        part = (df.groupby(["source", "w"], as_index=False).size()
                .rename(columns={"size": "n"}))
        part["n"] = part["n"].astype("int64")
        part["_part"] = stable_pair_partition(part["source"], part["w"],
                                              n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    return (_read(sf_dir, "documents", columns=["source", "text"])
            .map_batches(_cells, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None))


def q_source_yule_k(sf_dir: str):
    """Yule's K lexical-richness characteristic per source — the classic
    repeat-rate statistic K = 1e4 * (S2 - S1) / S1^2 over the per-source
    word-frequency spectrum (S1 = total tokens, S2 = sum of squared word
    counts); high K = repetitive/templated text, low K = diverse
    vocabulary — a standard corpus-quality screen for boilerplate-heavy
    sources. Words are lowercased ASCII-whitespace tokens (word_doc_freq
    parity convention).

    Exactness: per-word global counts are exact int64 cell sums; each is
    squared in PYTHON ints behind a fail-fast at isqrt(2^63-1) (the
    oracle's BIGINT n*n raises there), per-bucket S2 partials ship as
    hi/lo int64 LIMBS (CLAUDE.md big-int transport rule) and recombine
    driver-side in Python ints with the BIGINT output fail-fast; K is
    ONE float(num)/float(den) divide (HUGEINT products oracle-side),
    half-up round to 6dp.

    Scale shape: (source, word, n) counter cells bucketed by the
    (source, word) pair; buckets emit one row per (bucket, source) —
    text never shuffles beyond counter cells and the driver folds
    64 x sources rows, never the vocabulary."""
    from ..util import round_half_up, typed_empty

    empty = typed_empty(source=object, n_tokens="int64",
                        sum_freq_sq="int64", yule_k="float64")
    I64MAX = 2**63 - 1
    NMAX = 3037000499  # isqrt(2^63-1): the oracle's n*n raises above

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"source": pd.Series([], dtype=object),
                    "s1": pd.Series([], dtype="int64"),
                    "s2_hi": pd.Series([], dtype="int64"),
                    "s2_lo": pd.Series([], dtype="int64")}
        if not len(g) or "w" not in g.columns:
            return pd.DataFrame(out_cols)
        cells = g.groupby(["source", "w"], as_index=False)["n"].sum()
        rows = []
        for src, sub in cells.groupby("source"):
            ns = [int(v) for v in sub["n"].tolist()]
            if max(ns) > NMAX:
                raise OverflowError(
                    "source_yule_k: a squared word count exceeds BIGINT; "
                    "the oracle's n*n raises here too")
            s2 = sum(v * v for v in ns)
            if s2 > I64MAX:
                raise OverflowError(
                    "source_yule_k: sum of squared counts exceeds BIGINT; "
                    "the oracle's CAST raises here too")
            rows.append((src, sum(ns), s2 >> 30, s2 & ((1 << 30) - 1)))
        out = pd.DataFrame(rows, columns=["source", "s1", "s2_hi", "s2_lo"])
        for c in ("s1", "s2_hi", "s2_lo"):
            out[c] = out[c].astype("int64")
        return out

    parts = (_source_word_cells(sf_dir)
             .groupby("_part").map_groups(_bucket, batch_format="pandas")
             .to_pandas())
    if not len(parts) or "source" not in parts.columns:
        return empty
    rows = []
    for src, g in parts.groupby("source"):
        s1 = sum(int(v) for v in g["s1"])
        s2 = ((sum(int(v) for v in g["s2_hi"]) << 30)
              + sum(int(v) for v in g["s2_lo"]))
        if s2 > I64MAX or s1 > I64MAX:
            raise OverflowError(
                "source_yule_k: S1/S2 exceeds BIGINT; the oracle's CAST "
                "raises here too")
        k = float(round_half_up(
            np.array([float(10000 * (s2 - s1)) / float(s1 * s1)]), 6)[0])
        rows.append((src, s1, s2, k))
    out = pd.DataFrame(rows, columns=["source", "n_tokens", "sum_freq_sq",
                                      "yule_k"])
    for c in ("n_tokens", "sum_freq_sq"):
        out[c] = out[c].astype("int64")
    out["yule_k"] = out["yule_k"].astype("float64")
    return out.sort_values("source").reset_index(drop=True)


def q_source_hapax_ratio(sf_dir: str):
    """Hapax-legomena ratio per source — the fraction of each source's
    vocabulary that occurs exactly once, the complementary
    vocabulary-richness screen to Yule's K (high hapax ratio = diverse /
    long-tail text, low = templated). Same lowercased ASCII-whitespace
    word convention as word_doc_freq.

    Exactness: per-word global counts are exact int64 cell sums (the
    (source, word) pair bucketing makes each bucket's count global, so
    "occurs exactly once" is decidable IN the bucket); vocab and hapax
    are exact int64 counts and the ratio is ONE CAST-CAST divide,
    half-up round to 6dp (representable .5 ties are possible for ratios
    of small ints — the CLAUDE.md round_half_up rule).

    Scale shape: identical cell fold to source_yule_k; buckets emit one
    (source, vocab, hapax) row each — the driver folds 64 x sources
    rows, never the vocabulary."""
    from ..util import round_half_up, typed_empty

    empty = typed_empty(source=object, n_vocab="int64", n_hapax="int64",
                        hapax_ratio="float64")

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"source": pd.Series([], dtype=object),
                    "vocab": pd.Series([], dtype="int64"),
                    "hapax": pd.Series([], dtype="int64")}
        if not len(g) or "w" not in g.columns:
            return pd.DataFrame(out_cols)
        cells = g.groupby(["source", "w"], as_index=False)["n"].sum()
        out = (cells.assign(hapax=(cells["n"] == 1).astype("int64"))
               .groupby("source", as_index=False)
               .agg(vocab=("w", "size"), hapax=("hapax", "sum")))
        for c in ("vocab", "hapax"):
            out[c] = out[c].astype("int64")
        return out

    parts = (_source_word_cells(sf_dir)
             .groupby("_part").map_groups(_bucket, batch_format="pandas")
             .to_pandas())
    if not len(parts) or "source" not in parts.columns:
        return empty
    g = parts.groupby("source", as_index=False).agg(
        n_vocab=("vocab", "sum"), n_hapax=("hapax", "sum"))
    g["hapax_ratio"] = round_half_up(
        g["n_hapax"].to_numpy(np.float64) / g["n_vocab"].to_numpy(np.float64),
        6)
    for c in ("n_vocab", "n_hapax"):
        g[c] = g[c].astype("int64")
    g["hapax_ratio"] = g["hapax_ratio"].astype("float64")
    return g.sort_values("source").reset_index(drop=True)


def q_source_g2_keywords(sf_dir: str, topk: int = 10, min_count: int = 5):
    """Top-``topk`` distinctive words per source by Dunning's G^2
    log-likelihood ratio — the standard corpus-linguistics keyword
    extraction (which words does THIS source use disproportionately vs
    the rest), the significance-aware upgrade of raw PMI. Words are
    lowercased ASCII-whitespace tokens with per-source count >=
    ``min_count``; the 2x2 contingency per (source, word) is
    a = in-source count, b = rest-of-corpus count, c/d the complements.

    Exactness: G^2/2 = sum over the 4 cells of O * (ln O + ln N - ln R
    - ln C) with per-factor 1e-6-unit ln quantization (the lang_source_mi
    convention; GREATEST(x,1) keeps vectorized ln(0) out of dead
    branches on both sides) — the cells partition N, so |g2_units| <=
    N * max|dln|, and the kernel uses exact int64 numpy when that bound
    fits (always at test scale) and exact object-dtype Python ints past
    it; the BIGINT output cast fail-fasts exactly where the oracle's
    CAST raises. g2 is ONE float divide by 1e6, half-away round
    (quantization can leave a tiny negative near independence).

    Scale shape: per-source token totals are a sources-cardinality fold
    captured in the bucket closure; (source, word, n) cells hash-bucket
    by WORD so each word's cross-source counts co-locate and its corpus
    row margin is in-bucket-global; each bucket emits its top-``topk``
    candidates PER SOURCE (a global top-k row is its bucket's top-k row
    — rows are globally unique), so the driver folds
    64 x sources x topk rows, never the vocabulary."""
    from ..partition import stable_partition
    from ..pipelines.queries import _fold_partials
    from ..util import round_half_away, typed_empty
    from .text import _ASCII_WS, _WS_RE

    empty = typed_empty(source=object, word=object, n_source="int64",
                        n_rest="int64", g2_units="int64", g2="float64")
    n_parts = 64
    I64MAX = 2**63 - 1

    def _tok_totals(b: pa.Table) -> pa.Table:
        cols = {"source": pa.array([], pa.string()),
                "n_tok": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        src = pd.Series(b["source"].to_pandas().to_numpy())
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        ex = ex[ex.notna() & (ex != "")]
        if not len(ex):
            return pa.table(cols)
        g = (pd.DataFrame({"source": src.reindex(ex.index).to_numpy()})
             .groupby("source", as_index=False).size()
             .rename(columns={"size": "n_tok"}))
        g["n_tok"] = g["n_tok"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    totals = _fold_partials(
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(_tok_totals, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None),
        ["source"], ["n_tok"],
    )
    if totals is None:
        return empty
    cs_map = {str(r["source"]): int(r["n_tok"])
              for _, r in totals.iterrows()}
    n_total = sum(cs_map.values())
    if n_total == 0:
        return empty

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"source": pa.array([], pa.string()),
                "w": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        src = pd.Series(b["source"].to_pandas().to_numpy())
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        ex = ex[ex.notna() & (ex != "")]
        if not len(ex):
            return pa.table(cols)
        df = pd.DataFrame({"source": src.reindex(ex.index).to_numpy(),
                           "w": ex.to_numpy()})
        part = (df.groupby(["source", "w"], as_index=False).size()
                .rename(columns={"size": "n"}))
        part["n"] = part["n"].astype("int64")
        part["_part"] = stable_partition(part["w"], n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _lnu_np(v: np.ndarray) -> np.ndarray:
        return np.floor(np.log(np.maximum(v, 1).astype(np.float64)) * 1e6
                        + 0.5).astype(np.int64)

    lnu_n = int(_lnu_np(np.array([n_total]))[0])
    # |g2_units| <= N * max|dln|; past this bound int64 numpy would wrap.
    int64_safe = n_total * (4 * lnu_n + 8) < I64MAX

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"source": pd.Series([], dtype=object),
                    "word": pd.Series([], dtype=object),
                    "n_source": pd.Series([], dtype="int64"),
                    "n_rest": pd.Series([], dtype="int64"),
                    "g2_units": pd.Series([], dtype="int64")}
        if not len(g) or "w" not in g.columns:
            return pd.DataFrame(out_cols)
        cells = g.groupby(["source", "w"], as_index=False)["n"].sum()
        row = cells.groupby("w")["n"].transform("sum").to_numpy(np.int64)
        a = cells["n"].to_numpy(np.int64)
        keep = a >= min_count
        if not keep.any():
            return pd.DataFrame(out_cols)
        cells, row, a = cells[keep], row[keep], a[keep]
        cs = (cells["source"].map(cs_map).to_numpy(np.int64))
        n = n_total
        b_ = row - a
        c_ = cs - a
        d_ = n - row - cs + a
        dln_a = _lnu_np(a) + lnu_n - _lnu_np(row) - _lnu_np(cs)
        dln_b = _lnu_np(b_) + lnu_n - _lnu_np(row) - _lnu_np(n - cs)
        dln_c = _lnu_np(c_) + lnu_n - _lnu_np(n - row) - _lnu_np(cs)
        dln_d = _lnu_np(d_) + lnu_n - _lnu_np(n - row) - _lnu_np(n - cs)
        if int64_safe:
            units = (np.where(a > 0, a * dln_a, 0)
                     + np.where(b_ > 0, b_ * dln_b, 0)
                     + np.where(c_ > 0, c_ * dln_c, 0)
                     + np.where(d_ > 0, d_ * dln_d, 0))
            out = pd.DataFrame({"source": cells["source"].to_numpy(),
                                "word": cells["w"].to_numpy(),
                                "n_source": a, "n_rest": b_,
                                "g2_units": units})
        else:  # exact object-dtype path: Python-int products, no wrap
            units = [
                (int(av) * int(da) if av > 0 else 0)
                + (int(bv) * int(db) if bv > 0 else 0)
                + (int(cv) * int(dc) if cv > 0 else 0)
                + (int(dv) * int(dd) if dv > 0 else 0)
                for av, bv, cv, dv, da, db, dc, dd in zip(
                    a, b_, c_, d_, dln_a, dln_b, dln_c, dln_d)
            ]
            if any(abs(u) > I64MAX for u in units):
                raise OverflowError(
                    "source_g2_keywords: g2_units exceeds BIGINT; the "
                    "oracle's CAST raises here too")
            out = pd.DataFrame({"source": cells["source"].to_numpy(),
                                "word": cells["w"].to_numpy(),
                                "n_source": a, "n_rest": b_,
                                "g2_units": np.array(units, np.int64)})
        out = (out.sort_values(["source", "g2_units", "word"],
                               ascending=[True, False, True])
               .groupby("source", as_index=False).head(topk))
        for c in ("n_source", "n_rest", "g2_units"):
            out[c] = out[c].astype("int64")
        return out

    parts = (
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "source" not in parts.columns:
        return empty
    out = (parts.sort_values(["source", "g2_units", "word"],
                             ascending=[True, False, True])
           .groupby("source", as_index=False).head(topk)
           .reset_index(drop=True))
    out["g2"] = round_half_away(
        np.array([float(2 * int(u)) for u in out["g2_units"]]) / 1e6, 6)
    for c in ("n_source", "n_rest", "g2_units"):
        out[c] = out[c].astype("int64")
    out["g2"] = out["g2"].astype("float64")
    return out[["source", "word", "n_source", "n_rest", "g2_units",
                "g2"]].reset_index(drop=True)


def q_word_skipgram_topk(sf_dir: str, topk: int = 20, min_count: int = 5,
                         n_parts: int = 64):
    """Top-``topk`` ordered word pairs by skip-gram co-occurrence within
    a forward window of 2 (distances 1 AND 2) — the context-window
    counting stage of a word-embedding / collocation pipeline, the
    window-2 companion to word_pmi_topk's adjacency counts. Pairs with
    n < ``min_count`` drop; ties break (n DESC, word_a, word_b).

    Scale shape: raw text never shuffles — per-block (a, b, n) partials
    hash-bucket by the PAIR, so per-bucket collapsed counts are global
    and each bucket emits only its top-``topk`` candidates; the driver
    folds 64 x topk rows."""
    from ..partition import stable_pair_partition
    from .text import _ASCII_WS, _WS_RE

    ds = _read(sf_dir, "documents", columns=["text"])
    empty = pd.DataFrame({
        "word_a": pd.Series([], dtype="object"),
        "word_b": pd.Series([], dtype="object"),
        "n": pd.Series([], dtype="int64"),
    })

    def _partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.Table.from_pandas(
                empty.assign(_part=pd.Series([], dtype="int64")),
                preserve_index=False)
        lists = (b["text"].to_pandas().str.lower()
                 .str.strip(_ASCII_WS).str.split(_WS_RE))
        ex = lists.explode()
        ex = ex[ex.notna() & (ex != "")]
        df = ex.reset_index()
        df.columns = ["doc", "w"]
        frames = []
        for d in (1, 2):
            nxt = df["w"].shift(-d)
            same = df["doc"].shift(-d) == df["doc"]
            frames.append(pd.DataFrame(
                {"word_a": df["w"][same], "word_b": nxt[same]}))
        pairs = pd.concat(frames, ignore_index=True)
        part = (pairs.groupby(["word_a", "word_b"], as_index=False)
                .size().rename(columns={"size": "n"}))
        part["n"] = part["n"].astype("int64")
        part["_part"] = stable_pair_partition(
            part["word_a"], part["word_b"], n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "word_a" not in g.columns:
            return empty.copy()
        c = g.groupby(["word_a", "word_b"], as_index=False)["n"].sum()
        c = c[c["n"] >= min_count]
        return (c.sort_values(["n", "word_a", "word_b"],
                              ascending=[False, True, True])
                .head(topk).reset_index(drop=True))

    parts = (ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
             .groupby("_part").map_groups(_bucket, batch_format="pandas")
             .to_pandas())
    if not len(parts) or "word_a" not in parts.columns:
        return empty
    out = (parts.sort_values(["n", "word_a", "word_b"],
                             ascending=[False, True, True])
           .head(topk).reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out[["word_a", "word_b", "n"]]


def q_source_burrows_delta(sf_dir: str, topk_words: int = 30,
                           n_parts: int = 64):
    """Burrows' Delta stylometric distance between every source pair —
    the authorship/style drift screen: mean absolute z-score difference
    of the global top-``topk_words`` word frequencies, normalized by the
    across-source dispersion of each word. High delta = the two sources
    are written in measurably different styles.

    Exactness: per-source relative frequencies quantize ONCE to integer
    1e-9 units via floor division (fu = c*1e9 // T_s, exact both sides);
    the across-source dispersion V_w = S*sum(fu^2) - (sum fu)^2 is exact
    Python ints (HUGEINT oracle-side — fu^2 alone passes int64); each
    word's pair term floor-quantizes the identical float expression
    S*|fu_a-fu_b| / sqrt(V_w) to 1e-6 units so the cross-word sum is an
    order-free integer (<= 30 words x 1e16 — inside int64 by
    construction); delta is ONE half-up divide. Zero-dispersion words
    drop on both sides.

    Scale shape: pass A folds word totals (pair never ships raw text)
    and keeps only per-bucket top-k candidates; pass B re-reads with the
    tiny top-word set in the task closure, emitting (source, word, c)
    cells plus per-source token totals as sentinel rows through ONE
    fold — driver sees sources x (topk+1) rows, never vocabulary."""
    import math

    from ..partition import stable_partition, stable_pair_partition
    from ..util import round_half_up
    from .text import _ASCII_WS, _WS_RE

    empty = pd.DataFrame({
        "src_a": pd.Series([], dtype="object"),
        "src_b": pd.Series([], dtype="object"),
        "n_words": pd.Series([], dtype="int64"),
        "sum_units": pd.Series([], dtype="int64"),
        "delta": pd.Series([], dtype="float64"),
    })
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def _tot_partial(b: pa.Table) -> pa.Table:
        cols = {"word": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "_part": pd.Series([], dtype="int64")}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.Table.from_pandas(pd.DataFrame(cols),
                                        preserve_index=False)
        w = (b["text"].to_pandas().str.lower()
             .str.strip(_ASCII_WS).str.split(_WS_RE).explode())
        w = w[w.notna() & (w != "")]
        part = w.value_counts().rename_axis("word").reset_index(name="n")
        part["n"] = part["n"].astype("int64")
        part["_part"] = stable_partition(part["word"], n_parts)
        return pa.Table.from_pandas(part, preserve_index=False)

    def _tot_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "word" not in g.columns:
            return pd.DataFrame({"word": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        c = g.groupby("word", as_index=False)["n"].sum()
        return (c.sort_values(["n", "word"], ascending=[False, True])
                .head(topk_words).reset_index(drop=True))

    cand = (ds.map_batches(_tot_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
            .groupby("_part").map_groups(_tot_bucket,
                                         batch_format="pandas")
            .to_pandas())
    if not len(cand) or "word" not in cand.columns:
        return empty
    top_words = set(
        cand.sort_values(["n", "word"], ascending=[False, True])
        .head(topk_words)["word"].tolist())

    def _cell_partial(b: pa.Table) -> pa.Table:
        cols = {"source": pd.Series([], dtype="object"),
                "word": pd.Series([], dtype="object"),
                "c": pd.Series([], dtype="int64"),
                "_part": pd.Series([], dtype="int64")}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.Table.from_pandas(pd.DataFrame(cols),
                                        preserve_index=False)
        lists = (b["text"].to_pandas().str.lower()
                 .str.strip(_ASCII_WS).str.split(_WS_RE))
        src = b["source"].to_pandas()
        df = pd.DataFrame({"source": src.repeat(lists.str.len()),
                           "word": lists.explode()})
        df = df[df["word"].notna() & (df["word"] != "")]
        tot = (df.groupby("source", as_index=False).size()
               .rename(columns={"size": "c"}))
        tot["word"] = ""
        hit = df[df["word"].isin(top_words)]
        cells = (hit.groupby(["source", "word"], as_index=False).size()
                 .rename(columns={"size": "c"}))
        out = pd.concat([cells, tot[["source", "word", "c"]]],
                        ignore_index=True)
        out["c"] = out["c"].astype("int64")
        out["_part"] = stable_pair_partition(out["source"], out["word"],
                                             n_parts)
        return pa.Table.from_pandas(out, preserve_index=False)

    def _cell_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "source" not in g.columns:
            return pd.DataFrame({"source": pd.Series([], dtype="object"),
                                 "word": pd.Series([], dtype="object"),
                                 "c": pd.Series([], dtype="int64")})
        return g.groupby(["source", "word"], as_index=False)["c"].sum()

    cells = (ds.map_batches(_cell_partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
             .groupby("_part").map_groups(_cell_bucket,
                                          batch_format="pandas")
             .to_pandas())
    if not len(cells) or "source" not in cells.columns:
        return empty
    totals = {r["source"]: int(r["c"])
              for _, r in cells[cells["word"] == ""].iterrows()}
    sources = sorted(s for s, t in totals.items() if t > 0)
    if len(sources) < 2:
        return empty
    s_n = len(sources)
    cmap = {(r["source"], r["word"]): int(r["c"])
            for _, r in cells[cells["word"] != ""].iterrows()}
    words = sorted(top_words)
    fu = {(s, w): (cmap.get((s, w), 0) * 10**9) // totals[s]
          for s in sources for w in words}
    keep = []
    vv = {}
    for w in words:
        sm = sum(fu[(s, w)] for s in sources)
        sq = sum(fu[(s, w)] * fu[(s, w)] for s in sources)
        v = s_n * sq - sm * sm
        if v > 0:
            keep.append(w)
            vv[w] = v
    if not keep:
        return empty
    rows = []
    for i, sa in enumerate(sources):
        for sb in sources[i + 1:]:
            su = 0
            for w in keep:
                dfu = abs(fu[(sa, w)] - fu[(sb, w)])
                su += int(math.floor(
                    float(s_n * dfu) / math.sqrt(float(vv[w]))
                    * 1000000 + 0.5))
            delta = float(round_half_up(
                np.array([float(su) / float(10**6 * len(keep))]), 6)[0])
            rows.append((sa, sb, len(keep), su, delta))
    out = pd.DataFrame(rows, columns=["src_a", "src_b", "n_words",
                                      "sum_units", "delta"])
    for c in ("n_words", "sum_units"):
        out[c] = out[c].astype("int64")
    out["delta"] = out["delta"].astype("float64")
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


def q_word_length_hist(sf_dir: str):
    """Corpus word-length histogram: how many tokens have each character
    length — the tokenizer-design input (length distribution drives
    subword vocabulary sizing) next to doc_token_counts' per-doc view.
    Split/strip semantics are the repo's explicit-ASCII convention.

    Exactness: integer lengths and counts only.

    Scale shape: each block explodes its own docs and collapses to a
    (wlen, n) histogram before anything ships — bounded by max word
    length, never token count; the driver folds those cells."""
    from .text import _ASCII_WS, _WS_RE

    ds = _read(sf_dir, "documents", columns=["text"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"wlen": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas().dropna()
        if not len(s):
            return pa.table(cols)
        words = s.str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        words = words[words.notna() & (words != "")]
        if not len(words):
            return pa.table(cols)
        h = (words.str.len().astype("int64").value_counts()
             .rename_axis("wlen").reset_index(name="n_words"))
        h["wlen"] = h["wlen"].astype("int64")
        h["n_words"] = h["n_words"].astype("int64")
        return pa.Table.from_pandas(h, preserve_index=False)

    parts = (ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
             .to_pandas())
    empty = pd.DataFrame({"wlen": pd.Series([], dtype="int64"),
                          "n_words": pd.Series([], dtype="int64")})
    if not len(parts) or "wlen" not in parts.columns:
        return empty
    out = parts.groupby("wlen", as_index=False)["n_words"].sum()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("wlen").reset_index(drop=True)
