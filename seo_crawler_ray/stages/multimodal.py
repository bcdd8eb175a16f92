"""Multimodal (binary-column) stages: decode / feature-extract plumbing.

Images, audio and video travel as opaque ``binary`` columns with typed
metadata — here the corpus ``html`` binary column stands in for the payload.
The decode libraries (PIL/av/etc.) are NOT in this container, so the actual
decode is stubbed: ``DecodeStub`` raises ``NotImplementedError`` unless the
library import succeeds, and ``BinaryFeatures`` computes deterministic real
features (byte length, sha256) so the Ray-side plumbing — actor-pool
signature, small batch sizes for wide rows, schema, output layout — is real
and tested end-to-end.

Batch-size guidance: with multi-MB payloads, ``batch_size`` must be small
(32-128) so batch x concurrency fits worker heaps; blocks of wide binary
rows should keep ``target_max_block_size`` at default or larger so Ray
doesn't split them absurdly small (Ray guide, pitfalls).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class BinaryFeatures:
    """Actor-pool stage: binary payload -> (n_bytes, sha256, head bytes)."""

    def __init__(self, payload_col: str = "html", key_col: str = "url"):
        self.payload_col = payload_col
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        # digest over the UPPERCASE hex encoding: DuckDB has no blob digest,
        # so the SQL oracle computes sha256(hex(blob)) — mirror that exactly
        return pa.table({
            self.key_col: batch[self.key_col],
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "sha256_hex": pa.array(
                [hashlib.sha256(p.hex().upper().encode()).hexdigest()
                 for p in payloads]),
        })


class DecodeStub:
    """Image/audio decode stage. Real decode requires PIL (absent here);
    ``fake=True`` produces a deterministic pseudo-decode so downstream
    stages (resize, embed, frame-sample) can be exercised."""

    def __init__(self, payload_col: str = "html", key_col: str = "url",
                 fake: bool = True, feature_dim: int = 16):
        self.payload_col = payload_col
        self.key_col = key_col
        self.fake = fake
        self.feature_dim = feature_dim
        self._pil = None
        if not fake:
            try:
                import PIL.Image  # noqa: F401
                self._pil = PIL.Image
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode needs PIL, which is not available in "
                    "this environment; use fake=True") from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats = []
        for p in payloads:
            # deterministic fake "embedding": sha256 bytes -> float32 vector
            digest = hashlib.sha256(p).digest()
            arr = np.frombuffer(digest[: self.feature_dim * 2], dtype=np.uint16)
            feats.append((arr.astype(np.float32) / 65535.0).tolist())
        return pa.table({
            self.key_col: batch[self.key_col],
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


def binary_features(pages_ds, concurrency=(1, 4), batch_size: int = 64):
    return pages_ds.map_batches(
        BinaryFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


class ResizeStub:
    """Image-resize stage shape: payload in, fixed-budget payload + typed
    metadata struct out. PIL is absent, so fake mode center-crops the byte
    stream to ``target_bytes`` (deterministic — the crop IS the contract a
    real resizer would replace) and emits the metadata struct a downstream
    embedder needs: media_type, original/output sizes, truncation flag."""

    def __init__(self, target_bytes: int = 1024, payload_col: str = "html",
                 key_col: str = "url", media_type: str = "image",
                 fake: bool = True):
        self.target_bytes = target_bytes
        self.payload_col = payload_col
        self.key_col = key_col
        self.media_type = media_type
        if not fake:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real resize needs PIL, not available here; use "
                    "fake=True") from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, payloads, metas = [], [], []
        for key, payload in zip(batch[self.key_col].to_pylist(),
                                batch[self.payload_col].to_pylist()):
            n = len(payload)
            start = max(0, (n - self.target_bytes) // 2)
            out = payload[start:start + self.target_bytes]
            keys.append(key)
            payloads.append(out)
            metas.append({"media_type": self.media_type,
                          "orig_bytes": n, "out_bytes": len(out),
                          "truncated": n > self.target_bytes})
        meta_type = pa.struct([("media_type", pa.string()),
                               ("orig_bytes", pa.int64()),
                               ("out_bytes", pa.int64()),
                               ("truncated", pa.bool_())])
        return pa.table({
            self.key_col: pa.array(keys, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, meta_type),
        })


class FrameSampleStub:
    """Video frame-sampling stage shape: one input payload row explodes to
    ``n_frames`` output rows (frame_idx, frame bytes, metadata). The real
    decoder (av/ffmpeg) is absent from this container and gated behind an
    import-try; the fake samples ``n_frames`` evenly spaced byte windows of
    the payload — deterministic, so the whole explode pipeline has a DuckDB
    oracle. Batch sizes must stay small: output width is
    n_frames x frame_bytes per input row."""

    def __init__(self, n_frames: int = 4, frame_bytes: int = 256,
                 payload_col: str = "html", key_col: str = "url",
                 fake: bool = True):
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes
        self.payload_col = payload_col
        self.key_col = key_col
        if not fake:
            try:
                import av  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real frame sampling needs PyAV/ffmpeg, not available "
                    "in this environment; use fake=True") from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, idxs, n_bytes, md5s = [], [], [], []
        for key, payload in zip(batch[self.key_col].to_pylist(),
                                batch[self.payload_col].to_pylist()):
            n = len(payload)
            for i in range(self.n_frames):
                offset = (n * i) // self.n_frames
                frame = payload[offset:offset + self.frame_bytes]
                keys.append(key)
                idxs.append(i)
                n_bytes.append(len(frame))
                # digest over the UPPERCASE hex — DuckDB-blob-mirrorable,
                # same convention as BinaryFeatures
                md5s.append(hashlib.md5(
                    frame.hex().upper().encode()).hexdigest())
        return pa.table({
            self.key_col: pa.array(keys, pa.string()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_bytes": pa.array(n_bytes, pa.int64()),
            "frame_md5": pa.array(md5s, pa.string()),
        })


def sample_frames(pages_ds, n_frames: int = 4, frame_bytes: int = 256,
                  concurrency=(1, 4), batch_size: int = 32):
    return pages_ds.map_batches(
        FrameSampleStub, batch_format="pyarrow",
        fn_constructor_kwargs={"n_frames": n_frames,
                               "frame_bytes": frame_bytes},
        batch_size=batch_size, concurrency=concurrency)
