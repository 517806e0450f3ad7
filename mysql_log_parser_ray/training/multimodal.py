"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``payload: binary`` columns with metadata
(``media_type``, declared dims). The REAL parts here are the Ray-side
plumbing - schema, actor-pool stage signature, batch sizing for large
binary rows, output layout; the codec itself is STUBBED: the image/audio
libraries are not in this container, so ``decode_real`` raises
NotImplementedError behind an import-try, and the deterministic fake
decoder (seeded from the payload bytes) stands in so the distributed
plumbing is testable end-to-end.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image/fake", "audio/fake", ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (header: magic + w + h, then bytes)."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, ws, hs = [], [], [], [], []
    for i in range(n):
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        body = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        payloads.append(b"FAKE" + struct.pack("<II", w, h) + body)
        ids.append(f"media-{i:06d}")
        types.append("image/fake" if i % 3 else "audio/fake")
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(types),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
        }
    )


def decode_real(payload: bytes):
    """Real decode path - requires an image library not in this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires Pillow; this container ships none - "
            "use the deterministic fake decoder (DecodeFeatures stage)"
        ) from e
    raise NotImplementedError("wire PIL decode here when the library exists")


class DecodeFeatures:
    """Actor-pool stage: decode payloads and emit fixed-size features.

    Stateful on purpose (a real model/codec loads once per actor in
    __init__); batches should be SMALL for large binary rows - size
    batch_size so batch_bytes x concurrency fits the worker heap.
    """

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim  # "model load" happens here, once

    def _decode(self, payload: bytes):
        if payload[:4] != b"FAKE":
            return decode_real(payload)  # pragma: no cover
        w, h = struct.unpack("<II", payload[4:12])
        body = np.frombuffer(payload, dtype=np.uint8, offset=12)
        return w, h, body

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ws, hs = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, body = self._decode(payload)
            # deterministic "features": digest-seeded moments of the body
            digest = hashlib.blake2b(payload, digest_size=8).digest()
            base = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
            moments = np.array(
                [body.mean(), body.std(), body.min(), body.max()], dtype=np.float64
            )
            f = np.resize(np.concatenate([moments, base]), self.feature_dim)
            feats.append(f)
            ws.append(int(w))
            hs.append(int(h))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "decoded_width": pa.array(ws, pa.int32()),
                "decoded_height": pa.array(hs, pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float64())
                ),
            }
        )


def decode_features(media_ds, feature_dim: int = 16, concurrency=(1, 4),
                    batch_size: int = 256):
    """Run the decode/feature stage as an actor pool over small batches."""
    return media_ds.map_batches(
        DecodeFeatures,
        fn_constructor_args=(feature_dim,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
