"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with sibling metadata
columns (mime, width/height/duration). Decode / feature-extract / resize /
frame-sample are actor-pool ``map_batches`` stages.

Codec status (this container ships no PIL/ffmpeg/torchaudio):

- ``audio/wav``  — REAL decoder: ``decode_wav`` walks the RIFF chunk list
  (fmt/data, arbitrary extra chunks), validates PCM, and reads int16
  samples zero-copy via numpy. Works on any spec-conformant mono/stereo
  16-bit PCM WAV, not just our synthesizer's output.
- ``image/bmp``  — REAL decoder: ``decode_bmp`` parses the
  BITMAPFILEHEADER/BITMAPINFOHEADER, handles 4-byte row padding and
  bottom-up row order, and returns an (h, w, 3) RGB uint8 array.
- video          — still stubbed (no container/codec parser is feasible
  without ffmpeg); ``FrameSample`` keeps the deterministic byte-slice
  stand-in behind ``fake=True`` and raises otherwise.

Batch-size note: binary payloads dominate block size — run these stages
with a small ``batch_size`` (e.g. 64–256) and let ``target_max_block_size``
keep blocks sane (SURVEY "Memory-aware").
"""

from __future__ import annotations

import hashlib
import struct
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


def synthesize_media_table(n: int = 64, seed: int = 5, real: bool = False) -> pa.Table:
    """Deterministic media corpus for tests. ``real=True`` emits genuine
    WAV/BMP containers (decodable by the real codecs below) instead of
    random bytes."""
    rng = np.random.RandomState(seed)
    if real:
        payloads, mimes = [], []
        for i in range(n):
            if i % 2 == 0:
                s = rng.randint(-32768, 32768, size=64 + i % 32).astype(np.int16)
                payloads.append(encode_wav(s))
                mimes.append("audio/wav")
            else:
                img = rng.randint(0, 256, size=(3 + i % 4, 4 + i % 5, 3))
                payloads.append(encode_bmp(img.astype(np.uint8)))
                mimes.append("image/bmp")
    else:
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


# ---------------------------------------------------------------------------
# Real codecs: RIFF/WAVE (PCM) and BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Pack int16 PCM samples into a spec-conformant mono RIFF/WAVE file."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> dict:
    """REAL RIFF/WAVE parser: walk the chunk list (tolerating extra chunks
    like LIST/INFO), require PCM 16-bit, and read samples zero-copy.

    Returns ``{"sample_rate", "n_channels", "samples"}`` with ``samples``
    an ``(n_frames, n_channels)`` int16 array.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding: fmt={audio_format} bits={bits}")
    samples = np.frombuffer(data, dtype="<i2")
    samples = samples[: (len(samples) // n_channels) * n_channels]
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "samples": samples.reshape(-1, n_channels),
    }


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Pack an (h, w, 3) uint8 RGB array into a 24-bit uncompressed BMP
    (bottom-up rows, 4-byte row padding, BGR byte order — the spec)."""
    h, w, _ = rgb.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row] = rgb[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    data = body.tobytes()
    file_hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL BMP parser: BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit
    uncompressed only; honors the data offset, 4-byte row padding, and
    bottom-up (positive height) vs top-down (negative) row order.

    Returns an (h, w, 3) uint8 RGB array.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP file")
    (_, _, _, offset) = struct.unpack_from("<IHHI", payload, 2)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


class DecodeWav:
    """Actor stage: WAV payload column → per-row integer audio stats
    (n_samples, sample_rate, sum, sum of squares, zero crossings).

    Integer outputs keep the stats bit-exact across platforms — that is
    what lets the driver hash-compare them against a SQL oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in (
            "n_samples", "sample_rate", "sum_samples", "sum_squares",
            "zero_crossings",
        )}
        for p in batch.column("payload").to_pylist():
            if p is None:
                for k in out:
                    out[k].append(None)
                continue
            d = decode_wav(p)
            s = d["samples"][:, 0].astype(np.int64)
            neg = s < 0
            out["n_samples"].append(len(s))
            out["sample_rate"].append(d["sample_rate"])
            out["sum_samples"].append(int(s.sum()))
            out["sum_squares"].append(int((s * s).sum()))
            out["zero_crossings"].append(int((neg[1:] != neg[:-1]).sum()))
        res = pa.table({
            "media_id": batch.column("media_id"),
            **{k: pa.array(v, pa.int64()) for k, v in out.items()},
        })
        return res


class DecodeBmp:
    """Actor stage: BMP payload column → per-row integer image stats
    (width, height, per-channel pixel sums)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("width", "height", "sum_r", "sum_g", "sum_b")}
        for p in batch.column("payload").to_pylist():
            if p is None:
                for k in out:
                    out[k].append(None)
                continue
            img = decode_bmp(p).astype(np.int64)
            h, w, _ = img.shape
            sums = img.sum(axis=(0, 1))
            out["width"].append(w)
            out["height"].append(h)
            out["sum_r"].append(int(sums[0]))
            out["sum_g"].append(int(sums[1]))
            out["sum_b"].append(int(sums[2]))
        return pa.table({
            "media_id": batch.column("media_id"),
            **{k: pa.array(v, pa.int64()) for k, v in out.items()},
        })


@dataclass(frozen=True)
class DecodeConfig:
    feature_dim: int = 32
    fake: bool = False  # deterministic stand-in decode for tests/benches


class DecodeMedia:
    """Actor stage: binary payload → fixed-dim feature vector column.

    Non-fake path dispatches by the ``mime`` column to the REAL codecs
    above: ``audio/wav`` → mean-pooled |PCM| envelope (feature_dim bins),
    ``image/bmp`` → feature_dim-bin grayscale histogram. Anything else
    (video, png/jpeg — no parser without external libs) raises
    ``NotImplementedError``. ``fake=True`` keeps the blake2b stand-in for
    payloads with no parseable container (plumbing tests/benches).
    """

    def __init__(self, config: DecodeConfig = DecodeConfig()):
        self.config = config

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        d = self.config.feature_dim
        raw = hashlib.blake2b(payload, digest_size=d).digest()
        return np.frombuffer(raw, dtype=np.uint8).astype(np.float32) / 255.0

    def _decode_real(self, payload: bytes, mime: str) -> np.ndarray:
        d = self.config.feature_dim
        if mime == "audio/wav":
            s = np.abs(decode_wav(payload)["samples"][:, 0].astype(np.float32))
            n = (len(s) // d) * d
            if n == 0:  # shorter than feature_dim: pad
                s = np.pad(s, (0, d - len(s)))
                n = d
            return s[:n].reshape(d, -1).mean(axis=1) / 32768.0
        if mime == "image/bmp":
            gray = decode_bmp(payload).astype(np.float32).mean(axis=2)
            hist, _ = np.histogram(gray, bins=d, range=(0.0, 256.0))
            return hist.astype(np.float32) / max(gray.size, 1)
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment (wav/bmp are real; "
            "video and compressed images need ffmpeg/PIL)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.config.fake:
            feats = [None if p is None else self._decode_fake(p) for p in payloads]
        else:
            mimes = (
                batch.column("mime").to_pylist()
                if "mime" in batch.column_names else [None] * len(payloads)
            )
            feats = [
                None if p is None else self._decode_real(p, m)
                for p, m in zip(payloads, mimes)
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
