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


def synth_video_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake video rows: b"FAKV" + n_frames + w + h + frames."""
    rng = np.random.default_rng(seed)
    ids, payloads = [], []
    for i in range(n):
        nf = int(rng.integers(4, 24))
        w, h = int(rng.integers(4, 16)), int(rng.integers(4, 16))
        frames = rng.integers(0, 256, size=nf * w * h, dtype=np.uint8).tobytes()
        payloads.append(b"FAKV" + struct.pack("<III", nf, w, h) + frames)
        ids.append(f"video-{i:06d}")
    return pa.table(
        {
            "media_id": pa.array(ids),
            "media_type": pa.array(["video/fake"] * n),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def sample_frames_batch(batch: pa.Table, every: int = 4) -> pa.Table:
    """One input video row -> one output row per SAMPLED frame (the
    one-to-many frame-sampling shape; a flat map inside map_batches).

    Frame payloads are sliced zero-copy-ish from the video payload; the
    output schema (media_id, frame_index, width, height, frame) is what a
    downstream image-decode actor pool consumes. Real codecs are stubbed
    (decode_real) - the Ray-side plumbing is the tested part.
    """
    ids, fidx, ws, hs, frames = [], [], [], [], []
    for mid, payload in zip(
        batch["media_id"].to_pylist(), batch["payload"].to_pylist()
    ):
        if payload[:4] != b"FAKV":
            decode_real(payload)  # pragma: no cover (raises NotImplementedError)
        nf, w, h = struct.unpack("<III", payload[4:16])
        fsize = w * h
        for k in range(0, nf, every):
            ids.append(mid)
            fidx.append(k)
            ws.append(w)
            hs.append(h)
            frames.append(payload[16 + k * fsize : 16 + (k + 1) * fsize])
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "frame_index": pa.array(fidx, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        }
    )


def sample_frames(media_ds, every: int = 4, batch_size: int = 64):
    """Frame sampling as a streaming stage: SMALL batches on purpose -
    each input row fans out to nf/every binary rows, so batch_size bounds
    the output block bytes (batch x frames x w x h must fit the heap)."""
    import functools

    return media_ds.map_batches(
        functools.partial(sample_frames_batch, every=every),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
