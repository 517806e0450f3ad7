"""Text analysis stages over a documents table.

All per-batch bodies are vectorized (pandas str / compiled regex / numpy);
none iterate Python rows in the hot path except where a per-doc set is
inherently needed (noted).
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

# ASCII whitespace explicitly, matching the DuckDB/RE2 oracle patterns
# ('[ \t\n\r\v\f]+'); python's default \s and str.strip() are
# unicode-aware and would diverge on e.g. \xa0
_ASCII_WS = " \t\n\r\x0b\x0c"
_WS_RE = re.compile(r"\s+", re.ASCII)
# BPE-ish pretokenizer: words with optional leading space, numbers, other
# symbols - a simplified GPT-2-style split.
_BPE_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+", re.ASCII)
_PUNCT_RE = re.compile(r"[.,!?;:]")
_UPPER_RE = re.compile(r"[A-Z]")

# Tiny stopword lists for the n-gram/stopword language heuristic.
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "se", "las"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "une"},
    "de": {"der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"},
}


def ws_token_counts(s: "pd.Series") -> "pd.Series":
    """ASCII-whitespace word counts (the one shared implementation both
    query paths and their oracles are pinned to)."""
    return s.str.strip(_ASCII_WS).str.split(_WS_RE).str.len().fillna(0).astype("int64")


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Whitespace token count + BPE-ish piece count per doc."""
    s = pd.Series(batch["text"].to_pandas())
    ws = ws_token_counts(s)
    bpe = s.str.findall(_BPE_RE).str.len().fillna(0).astype("int64")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pa.array(ws, pa.int64()),
            "n_bpe_pieces": pa.array(bpe, pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality counters: words, punctuation, uppercase, length flags."""
    s = pd.Series(batch["text"].to_pandas())
    n_words = s.str.strip(_ASCII_WS).str.split(_WS_RE).str.len().fillna(0).astype("int64")
    n_punct = s.str.count(_PUNCT_RE).astype("int64")
    n_upper = s.str.count(_UPPER_RE).astype("int64")
    n_chars = s.str.len().astype("int64")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "n_punct": pa.array(n_punct, pa.int64()),
            "n_upper": pa.array(n_upper, pa.int64()),
            "is_short": pa.array((n_chars < 100).astype(bool), pa.bool_()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-vote language heuristic ('und' = undetermined)."""
    texts = batch["text"].to_pylist()
    preds: List[str] = []
    for t in texts:  # per-doc set intersection; vocabulary is tiny
        words = set(_WS_RE.split(t.lower()))
        best, best_n = "und", 0
        for lang, sw in _LANG_STOPWORDS.items():
            n = len(words & sw)
            if n > best_n:
                best, best_n = lang, n
        preds.append(best)
    return pa.table(
        {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, pa.string())}
    )


def normalize_text(t: str) -> str:
    return _WS_RE.sub(" ", t).lower()


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (content identity) + a 64-bit polynomial rolling hash (cheap equality
    prefilter)."""
    texts = batch["text"].to_pylist()
    fps, rolls = [], []
    for t in texts:
        norm = normalize_text(t)
        fps.append(hashlib.md5(norm.encode("utf-8")).hexdigest()[:16])
        rolls.append(zlib.crc32(norm.encode("utf-8")))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fp": pa.array(fps, pa.string()),
            "crc": pa.array(np.array(rolls, dtype=np.int64), pa.int64()),
        }
    )


# PII scrubbing: conservative ASCII patterns written to mean the same
# thing in python `re` and RE2 (DuckDB regexp_*) — no lookarounds, no
# unicode classes, so the oracle can run the IDENTICAL pattern.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized PII redaction: replace every PII_PATTERNS match with its
    placeholder (email pass first, then ipv4 — the oracle applies the same
    order) and count matches per kind. Returns the input columns with
    ``text_col`` redacted plus n_<kind> count columns."""
    s = batch[text_col].to_pandas()
    counts = {}
    for kind, pat, repl in PII_PATTERNS:
        counts[f"n_{kind}"] = s.str.count(pat).astype("int64")
        s = s.str.replace(pat, repl, regex=True)
    out = batch.drop([text_col]).append_column(
        text_col, pa.array(s.tolist(), pa.string())
    )
    for name, vals in counts.items():
        out = out.append_column(name, pa.array(vals.to_numpy(), pa.int64()))
    return out


# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1), restated
# with INTEGER-EXACT predicates so the DuckDB oracle evaluates the
# identical arithmetic (no float-division thresholds to drift on):
#   wc_ok:   20 <= n_words <= 90            (word-count bounds)
#   mwl_ok:  n_word_chars >= 4 * n_words    (mean word length >= 4)
#   uniq_ok: 20 * n_distinct >= 11 * n_words (unique-word fraction >= 0.55
#            — the intra-doc repetition rule)
#   stop_ok: >= 2 stopword hits (counting repeats) from _GOPHER_STOPWORDS
_GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "that", "for", "it")


def gopher_rules_batch(batch: pa.Table) -> pa.Table:
    """Per-doc Gopher rule flags, vectorized: ONE strip/split pass plus an
    explode+groupby for the per-doc distinct and stopword counters (C
    groupby, never a per-doc Python set)."""
    s = pd.Series(batch["text"].to_pandas())
    words = s.str.strip(_ASCII_WS).str.split(_WS_RE)
    n_words = words.str.len().fillna(0).astype("int64")
    n_wchars = (
        s.str.replace(_WS_RE, "", regex=True).str.len().fillna(0).astype("int64")
    )
    ex = words.explode()
    g = ex.groupby(level=0)
    n_uniq = g.nunique().reindex(s.index, fill_value=0).astype("int64")
    n_stop = (
        ex.isin(_GOPHER_STOPWORDS)
        .groupby(level=0)
        .sum()
        .reindex(s.index, fill_value=0)
        .astype("int64")
    )
    wc_ok = (n_words >= 20) & (n_words <= 90)
    mwl_ok = n_wchars >= 4 * n_words
    uniq_ok = 20 * n_uniq >= 11 * n_words
    stop_ok = n_stop >= 2
    return pa.table(
        {
            "source": batch["source"],
            "n_docs": pa.array(np.ones(len(s), dtype=np.int64), pa.int64()),
            "n_wc_ok": pa.array(wc_ok.to_numpy().astype(np.int64), pa.int64()),
            "n_mwl_ok": pa.array(mwl_ok.to_numpy().astype(np.int64), pa.int64()),
            "n_uniq_ok": pa.array(uniq_ok.to_numpy().astype(np.int64), pa.int64()),
            "n_stop_ok": pa.array(stop_ok.to_numpy().astype(np.int64), pa.int64()),
            "n_pass": pa.array(
                (wc_ok & mwl_ok & uniq_ok & stop_ok).to_numpy().astype(np.int64),
                pa.int64(),
            ),
        }
    )


def levenshtein_pairs(a_codes, b_codes, la, lb, max_dist=None):
    """Edit distance for P string pairs AT ONCE: row-streamed DP with the
    two character loops in Python (bounded by the fixed prefix width,
    e.g. 24x24 = 576 iterations) and every cell update vectorized across
    the whole pair batch — the loop count is independent of P, so the
    kernel stays O(width^2) vector ops no matter how many candidate pairs
    a bucket holds. Only two DP rows are live (O(P x W) memory, not
    O(P x W^2)); each pair's answer is captured as its row i == la
    streams past.

    ``max_dist`` enables Ukkonen banding: cells with |i - j| > max_dist
    are provably > max_dist, so only the 2*max_dist+1 diagonal band is
    computed (24x24 -> 24x9 at max_dist=4). Distances <= max_dist stay
    EXACT; anything larger is reported as some value > max_dist (callers
    threshold on <= max_dist). Default None computes the full exact DP
    (the DuckDB-pinned record-linkage contract).

    ``a_codes``/``b_codes``: (P, W) uint8 matrices (ASCII, zero-padded);
    ``la``/``lb``: true lengths. Returns int64 distances (true lengths
    honoured via the (la, lb) cell, so padding never affects results)."""
    P, W = a_codes.shape
    BIG = np.int16(W + 1)  # > any true distance; +1 per step stays < 2^15
    out = np.empty(P, dtype=np.int16)
    prev = np.tile(np.arange(W + 1, dtype=np.int16), (P, 1))
    if max_dist is not None:
        prev[:, max_dist + 1 :] = BIG
    m0 = la == 0
    if m0.any():
        out[m0] = prev[m0, lb[m0]]
    for i in range(1, W + 1):
        cur = np.full((P, W + 1), BIG, dtype=np.int16)
        if max_dist is None:
            jlo, jhi = 1, W
            cur[:, 0] = i
        else:
            jlo = max(1, i - max_dist)
            jhi = min(W, i + max_dist)
            if i <= max_dist:
                cur[:, 0] = i
        ai = a_codes[:, i - 1]
        for j in range(jlo, jhi + 1):
            cost = (ai != b_codes[:, j - 1]).astype(np.int16)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
        mi = la == i
        if mi.any():
            out[mi] = cur[mi, lb[mi]]
        prev = cur
    return out.astype(np.int64)
