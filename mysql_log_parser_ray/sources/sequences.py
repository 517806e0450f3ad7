"""The input table: pre-tokenized sequences.

Schema (per BASELINE.json input_hint):
  doc_id:string, tokens:list<int32>, n_tok:int32, source:string

Tokenization is the simplest reversible choice: UTF-8 bytes of the doc text,
one byte per int32 token, so ``detokenize == bytes(tokens)`` and the
byte-for-byte token-array equality invariant is checkable per doc_id.

Detokenization of a whole Arrow batch is vectorized: the list column's child
values are cast to uint8 in one numpy op and per-row slices are taken from
the list offsets - no per-token Python.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa

SEQUENCE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def tokenize(text: Union[str, bytes]) -> np.ndarray:
    """UTF-8 bytes -> int32 token array (reversible)."""
    data = text.encode("utf-8") if isinstance(text, str) else text
    return np.frombuffer(data, dtype=np.uint8).astype(np.int32)


def detokenize_column(tokens: Union[pa.Array, pa.ChunkedArray]) -> List[bytes]:
    """Vectorized list<int32> -> list of per-row byte strings."""
    out: List[bytes] = []
    chunks = tokens.chunks if isinstance(tokens, pa.ChunkedArray) else [tokens]
    for arr in chunks:
        if isinstance(arr, pa.LargeListArray):
            offsets = arr.offsets.to_numpy()
        else:
            arr = arr.cast(pa.list_(pa.int32()))
            offsets = arr.offsets.to_numpy()
        values = arr.values.to_numpy(zero_copy_only=False).astype(np.uint8)
        buf = values.tobytes()
        out.extend(buf[offsets[i] : offsets[i + 1]] for i in range(len(arr)))
    return out


def build_sequences_table(
    texts: Sequence[Union[str, bytes]],
    doc_ids: Sequence[str],
    sources: Sequence[str],
) -> pa.Table:
    """Assemble a sequences table from raw doc texts (vectorized offsets)."""
    blobs = [t.encode("utf-8") if isinstance(t, str) else t for t in texts]
    lengths = np.fromiter((len(b) for b in blobs), dtype=np.int32, count=len(blobs))
    offsets = np.zeros(len(blobs) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    values = np.frombuffer(b"".join(blobs), dtype=np.uint8).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))
    return pa.table(
        {
            "doc_id": pa.array([str(d) for d in doc_ids], pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lengths, pa.int32()),
            "source": pa.array(list(sources), pa.string()),
        }
    )


def read_sequences(path, columns: Optional[List[str]] = None, **kwargs):
    """ray.data.read_parquet over a sequences table, pruning to ``columns``.

    Column pruning matters at scale: a stage that only needs (doc_id, source)
    must not pull the token payload off storage.
    """
    import ray.data as rd

    return rd.read_parquet(path, columns=columns, **kwargs)


def read_log_files(paths, **read_kwargs):
    """Raw log FILES (plain or .gz) -> the sequences schema, one document
    per file.

    ``ray.data.read_binary_files(include_paths=True)`` streams file blobs
    (gzip decompression is inferred from the .gz extension and happens
    WORKER-side in the read task, verified in tests); byte-tokenization
    happens inside the batch fn, so the driver never touches file bytes.
    Parallelism is per-file — the reference's own unit of work (slow.go
    parses one file serially); a deployment with few giant files should
    pre-shard them on event boundaries and lean on the byte-offset resume
    contract (slow.go:46-49) instead.

    doc_id is the file basename (.gz stripped), source its parent
    directory (the routing key convention of the multi-source tests).
    """
    import os as _os

    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **read_kwargs)

    def _to_seqs(b: pa.Table) -> pa.Table:
        file_paths = b["path"].to_pylist()
        blobs = b["bytes"].to_pylist()
        texts, ids, srcs = [], [], []
        for p, blob in zip(file_paths, blobs):
            if p.endswith(".gz"):  # payload already decompressed by the read
                p = p[: -len(".gz")]
            ids.append(_os.path.basename(p))
            srcs.append(_os.path.basename(_os.path.dirname(p)) or "file")
            texts.append(blob)
        return build_sequences_table(texts, ids, srcs)

    return ds.map_batches(_to_seqs, batch_format="pyarrow")
