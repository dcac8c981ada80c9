"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with sibling metadata
columns (mime, width/height/duration). Decode / feature-extract / resize /
frame-sample are actor-pool ``map_batches`` stages. The actual codecs are
NOT available in this container, so the decode kernel is stubbed: pass
``fake=True`` for a deterministic content-derived fake (real Ray plumbing —
schema, batch sizing, actor signature, output layout — is exercised and
tested), otherwise the stage raises ``NotImplementedError`` at first batch.

Batch-size note: binary payloads dominate block size — run these stages
with a small ``batch_size`` (e.g. 64–256) and let ``target_max_block_size``
keep blocks sane (SURVEY "Memory-aware").
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("meta_json", pa.string()),
    ]
)


def synthesize_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(128 + int(rng.randint(0, 512))) for _ in range(n)]
    mimes = [("image/png", "audio/wav", "video/mp4")[i % 3] for i in range(n)]
    metas = [
        '{"width": %d, "height": %d}' % (32 + i % 64, 32 + (i * 7) % 64)
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(mimes, type=pa.string()),
            "meta_json": pa.array(metas, type=pa.string()),
        }
    )


@dataclass(frozen=True)
class DecodeConfig:
    feature_dim: int = 32
    fake: bool = False  # deterministic stand-in decode for tests/benches


class DecodeMedia:
    """Actor stage: binary payload → fixed-dim feature vector column.

    Real implementation would load PIL/ffmpeg/torchaudio in ``__init__``
    (once per actor) and decode per batch. STUB: ``fake=True`` derives the
    feature vector from blake2b(payload) — deterministic, shape-correct.
    """

    def __init__(self, config: DecodeConfig = DecodeConfig()):
        self.config = config
        if not config.fake:
            # This is where the codec import/model load would happen.
            self._codec = None

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        d = self.config.feature_dim
        raw = hashlib.blake2b(payload, digest_size=d).digest()
        return np.frombuffer(raw, dtype=np.uint8).astype(np.float32) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.config.fake:
            raise NotImplementedError(
                "Media codecs are not available in this environment; "
                "run with DecodeConfig(fake=True) for the deterministic stub."
            )
        feats = [
            None if p is None else self._decode_fake(p)
            for p in batch.column("payload").to_pylist()
        ]
        arr = pa.array(
            [None if f is None else f.tolist() for f in feats],
            type=pa.list_(pa.float32()),
        )
        return batch.append_column(pa.field("features", arr.type), arr)


class FrameSample:
    """Actor stage: sample ``n_frames`` pseudo-frames per video payload —
    emits one row per frame (flat_map-shaped output). STUB: frame bytes are
    deterministic slices of the payload."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("No video codec in this environment.")
        ids, frames, fidx = [], [], []
        for mid, p in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if p is None:
                continue
            step = max(1, len(p) // self.n_frames)
            for f in range(self.n_frames):
                ids.append(mid)
                fidx.append(f)
                frames.append(p[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(fidx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )
