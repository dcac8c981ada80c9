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
- ``image/png``  — REAL codec on stdlib zlib: ``encode_png`` /
  ``decode_png`` handle chunk CRCs, multi-IDAT streams, and ALL five
  scanline filters (the encoder cycles through them row by row, so the
  decoder's unfilter paths are exercised on every round-trip). 8-bit
  truecolor non-interlaced; other color types raise.
- ``video/x-y4m`` — REAL codec: ``encode_y4m`` / ``decode_y4m`` speak
  YUV4MPEG2 (the uncompressed interchange format mjpegtools/ffmpeg use):
  tokenized stream header (W/H/F/I/A/C), per-frame ``FRAME`` markers with
  optional parameters, and raw planes for C444 / C420 (2×2 chroma
  subsampling) / Cmono. ``decode_y4m_frame`` gives O(1) random access to
  frame k (frames are fixed-size once the header is parsed), which is
  what makes distributed frame *sampling* cheap: a sampler never inflates
  the frames it skips. Compressed containers (mp4/h264) still need
  ffmpeg and raise.
- ``image/jpeg`` — REAL baseline codec in ``ops/jpeg.py`` (ITU-T T.81:
  Annex-K tables, Huffman entropy coding with byte stuffing + RSTn
  restarts, batched numpy IDCT, grayscale / 4:4:4 / 4:2:0). Progressive
  JPEG and compressed video (mp4/h264) still raise.
- ``FrameSample`` samples REAL evenly-spaced Y4M frames when
  ``fake=False``; the deterministic byte-slice stand-in stays available
  behind ``fake=True`` for opaque containers.

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
    if n_channels < 1:
        raise ValueError(f"corrupt fmt chunk: n_channels={n_channels}")
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


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def encode_png(rgb: np.ndarray) -> bytes:
    """Pack an (h, w, 3) uint8 RGB array into a REAL PNG: 8-bit truecolor
    (color type 2), zlib-compressed scanlines, CRC-checked chunks. Each
    row uses filter type ``y % 5`` — deliberately cycling through ALL five
    spec filters (None/Sub/Up/Average/Paeth) so any decoder consuming our
    output must implement the full filter set (and ours is exercised by
    every round-trip test). Forward filtering references the RAW previous
    row/pixel, so it vectorizes per row."""
    import zlib

    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    raw = rgb.reshape(h, w * 3).astype(np.int16)
    prior = np.zeros(w * 3, dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(3, np.int16), cur[:-3]])
        upleft = np.concatenate([np.zeros(3, np.int16), prior[:-3]])
        ft = y % 5
        if ft == 0:
            f = cur
        elif ft == 1:
            f = cur - left
        elif ft == 2:
            f = cur - prior
        elif ft == 3:
            f = cur - (left + prior) // 2
        else:  # Paeth — vectorized predictor over the raw neighbors
            p = left + prior - upleft
            pa_ = np.abs(p - left)
            pb = np.abs(p - prior)
            pc_ = np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left,
                np.where(pb <= pc_, prior, upleft),
            )
            f = cur - pred
        lines.append(bytes([ft]) + (f % 256).astype(np.uint8).tobytes())
        prior = cur
    idat = zlib.compress(b"".join(lines), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG parser: chunk walk with CRC verification, multi-IDAT
    concatenation, zlib inflate, and full scanline unfiltering (all five
    filter types). Supports 8-bit truecolor (color type 2),
    non-interlaced — the PNG subset our encoder emits and typical raster
    exports use; anything else raises. Returns an (h, w, 3) uint8 array.

    Unfiltering: None/Up vectorize whole-row; Sub is a per-lane cumsum
    (recon[x] = f[x] + recon[x-3] decomposes into 3 independent byte
    lanes); Average/Paeth are inherently sequential along x (each pixel
    needs the RECONSTRUCTED left neighbor) and run as per-byte loops."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG: depth={depth} color={color} "
            f"interlace={interlace} (8-bit truecolor non-interlaced only)"
        )
    stride = w * 3
    flat = zlib.decompress(b"".join(idat))
    if len(flat) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    rows = np.frombuffer(flat, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        f = rows[y, 1:].astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ft == 0:
            recon = f
        elif ft == 1:  # Sub: per-lane cumsum mod 256
            recon = f.copy()
            for lane in range(3):
                recon[lane::3] = np.cumsum(f[lane::3]) % 256
        elif ft == 2:
            recon = (f + prior) % 256
        elif ft == 3:
            recon = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = recon[x - 3] if x >= 3 else 0
                recon[x] = (f[x] + (left + prior[x]) // 2) % 256
        elif ft == 4:
            recon = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = recon[x - 3] if x >= 3 else 0
                ul = prior[x - 3] if x >= 3 else 0
                recon[x] = (f[x] + _paeth(int(left), int(prior[x]),
                                          int(ul))) % 256
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = recon.astype(np.uint8)
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Real video codec: YUV4MPEG2 ("Y4M") — uncompressed interchange format
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def _y4m_plane_sizes(w: int, h: int, colorspace: str) -> list[tuple[int, int]]:
    """(width, height) of each plane per frame for the supported spaces."""
    if colorspace.startswith("C420"):  # C420, C420jpeg, C420mpeg2, C420paldv
        return [(w, h), (w // 2, h // 2), (w // 2, h // 2)]
    if colorspace == "C444":
        return [(w, h), (w, h), (w, h)]
    if colorspace == "Cmono":
        return [(w, h)]
    raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")


def encode_y4m(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    colorspace: str | None = None,
) -> bytes:
    """Pack frames into a spec-conformant YUV4MPEG2 stream.

    ``frames`` is ``(n, h, w)`` uint8 (mono → ``Cmono``) or ``(n, h, w, 3)``
    uint8 YUV (→ ``C444``). Each frame is emitted as a ``FRAME\\n`` marker
    followed by the raw planes (Y, then U/V when present)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        colorspace = colorspace or "Cmono"
        if colorspace != "Cmono":
            raise ValueError("mono frames require Cmono")
    elif frames.ndim == 4 and frames.shape[3] == 3:
        colorspace = colorspace or "C444"
        if colorspace != "C444":
            raise ValueError("(n,h,w,3) frames require C444")
    else:
        raise ValueError(f"bad frame array shape {frames.shape}")
    n, h, w = frames.shape[:3]
    header = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    ).encode()
    parts = [header]
    for f in range(n):
        parts.append(b"FRAME\n")
        if colorspace == "Cmono":
            parts.append(frames[f].tobytes())
        else:  # C444: planar, not interleaved
            parts.append(np.ascontiguousarray(
                frames[f].transpose(2, 0, 1)).tobytes())
    return b"".join(parts)


def _y4m_parse_header(payload: bytes) -> tuple[dict, int]:
    """Parse the stream header line → (params dict, offset past newline)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    params: dict = {"C": "C420jpeg"}  # spec default when no C tag
    for tok in payload[len(_Y4M_MAGIC):nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode()
        if tag == "W":
            params["W"] = int(val)
        elif tag == "H":
            params["H"] = int(val)
        elif tag == "F":
            num, den = val.split(":")
            params["F"] = (int(num), int(den))
        elif tag == "C":
            params["C"] = "C" + val
        else:  # I/A/X — parsed, not needed for decode
            params[tag] = val
    if "W" not in params or "H" not in params:
        raise ValueError("Y4M header missing W/H")
    return params, nl + 1


def _y4m_frame_offsets(payload: bytes, pos: int, frame_size: int) -> list[int]:
    """Walk FRAME markers → list of plane-data offsets. Each marker is
    ``FRAME[ params]\\n``; frame data is fixed-size so the walk is O(n)
    header scans, no plane copies."""
    offsets = []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        nl = payload.find(b"\n", pos + 5)
        if nl < 0:
            raise ValueError("truncated FRAME header")
        data_at = nl + 1
        if data_at + frame_size > len(payload):
            raise ValueError("truncated Y4M frame data")
        offsets.append(data_at)
        pos = data_at + frame_size
    return offsets


def decode_y4m(payload: bytes) -> dict:
    """REAL YUV4MPEG2 parser. Returns ``{"width", "height", "fps",
    "colorspace", "n_frames", "frames"}`` where ``frames`` is a list of
    per-frame plane tuples (each plane a 2-D uint8 array, zero-copy views
    into the payload buffer)."""
    params, pos = _y4m_parse_header(payload)
    w, h, cs = params["W"], params["H"], params["C"]
    planes = _y4m_plane_sizes(w, h, cs)
    frame_size = sum(pw * ph for pw, ph in planes)
    offsets = _y4m_frame_offsets(payload, pos, frame_size)
    frames = []
    for off in offsets:
        frame, cur = [], off
        for pw, ph in planes:
            plane = np.frombuffer(payload, dtype=np.uint8,
                                  count=pw * ph, offset=cur).reshape(ph, pw)
            frame.append(plane)
            cur += pw * ph
        frames.append(tuple(frame))
    return {
        "width": w, "height": h, "fps": params.get("F", (25, 1)),
        "colorspace": cs, "n_frames": len(offsets), "frames": frames,
    }


def decode_y4m_frame(payload: bytes, k: int) -> tuple[np.ndarray, ...]:
    """Random-access decode of frame ``k`` — walks only the fixed-size
    FRAME headers (no plane reads for skipped frames), so sampling s of n
    frames costs O(n) marker scans + O(s) plane views, not O(n) decodes."""
    params, pos = _y4m_parse_header(payload)
    w, h, cs = params["W"], params["H"], params["C"]
    planes = _y4m_plane_sizes(w, h, cs)
    frame_size = sum(pw * ph for pw, ph in planes)
    idx = 0
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        nl = payload.find(b"\n", pos + 5)
        if nl < 0:
            raise ValueError("truncated FRAME header")
        data_at = nl + 1
        if data_at + frame_size > len(payload):
            raise ValueError("truncated Y4M frame data")
        if idx == k:
            out, cur = [], data_at
            for pw, ph in planes:
                out.append(np.frombuffer(
                    payload, dtype=np.uint8, count=pw * ph, offset=cur
                ).reshape(ph, pw))
                cur += pw * ph
            return tuple(out)
        idx += 1
        pos = data_at + frame_size
    raise IndexError(f"frame {k} out of range ({idx} frames)")


class DecodeY4m:
    """Actor stage: Y4M payload column → per-row integer video stats
    (width, height, n_frames, luma sum / sum-of-squares over ALL frames).
    Integer outputs keep the stats bit-exact for the SQL oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in (
            "width", "height", "n_frames", "sum_luma", "sum_luma_sq",
        )}
        for p in batch.column("payload").to_pylist():
            if p is None:
                for k in out:
                    out[k].append(None)
                continue
            d = decode_y4m(p)
            luma = np.stack([f[0] for f in d["frames"]]).astype(np.int64)
            out["width"].append(d["width"])
            out["height"].append(d["height"])
            out["n_frames"].append(d["n_frames"])
            out["sum_luma"].append(int(luma.sum()))
            out["sum_luma_sq"].append(int((luma * luma).sum()))
        return pa.table({
            "media_id": batch.column("media_id"),
            **{k: pa.array(v, pa.int64()) for k, v in out.items()},
        })


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


class ResizeImage:
    """Actor stage: REAL image resize — decode the BMP payload, resample
    to ``out_w × out_h`` with integer nearest-neighbor (source pixel of
    output (x, y) is ``((x·w_in)//out_w, (y·h_in)//out_h)`` — pure int64
    floor division, so a SQL oracle can address the exact same source
    pixels), and re-encode through the real BMP writer. Output rows carry
    the resized payload plus new width/height; chain ``DecodeBmp`` after
    it for stats.

    The resample is one numpy fancy-index gather per image (no per-pixel
    Python); per-image work is independent, so the stage scales as a
    plain actor-pool ``map_batches``. Completes the prompt's multimodal
    quartet (decode / feature-extract / RESIZE / frame-sample) with a
    real kernel rather than a stand-in."""

    def __init__(self, out_w: int, out_h: int):
        if out_w <= 0 or out_h <= 0:
            raise ValueError("output dimensions must be positive")
        self.out_w, self.out_h = out_w, out_h
        # index maps are per-(w_in, h_in); memoize across the actor's life
        self._maps: dict = {}

    def _index_map(self, w_in: int, h_in: int):
        key = (w_in, h_in)
        if key not in self._maps:
            xs = (np.arange(self.out_w, dtype=np.int64) * w_in) // self.out_w
            ys = (np.arange(self.out_h, dtype=np.int64) * h_in) // self.out_h
            self._maps[key] = (xs, ys)
        return self._maps[key]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for p in batch.column("payload").to_pylist():
            if p is None:
                payloads.append(None)
                continue
            img = decode_bmp(p)
            h_in, w_in, _ = img.shape
            xs, ys = self._index_map(w_in, h_in)
            payloads.append(encode_bmp(img[np.ix_(ys, xs)]))
        return pa.table({
            "media_id": batch.column("media_id"),
            "payload": pa.array(payloads, type=pa.binary()),
        })


class DecodePng:
    """Actor stage: PNG payload column → per-row integer image stats
    (width, height, per-channel pixel sums) — the PNG twin of DecodeBmp,
    going through the real inflate + unfilter path."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("width", "height", "sum_r", "sum_g", "sum_b")}
        for p in batch.column("payload").to_pylist():
            if p is None:
                for k in out:
                    out[k].append(None)
                continue
            img = decode_png(p).astype(np.int64)
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


class DecodeJpeg:
    """Actor stage: baseline-JPEG payload column → per-row integer image
    stats (width, height, sum of all decoded samples) through the real
    Huffman + IDCT path (``ops/jpeg.py: decode_jpeg``). Works for both
    grayscale (h, w) and RGB (h, w, 3) streams; ``pix_sum`` sums every
    decoded sample either way."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from connect_smts_ray.ops.jpeg import decode_jpeg

        out = {k: [] for k in ("width", "height", "pix_sum")}
        for p in batch.column("payload").to_pylist():
            if p is None:
                for k in out:
                    out[k].append(None)
                continue
            img = decode_jpeg(p).astype(np.int64)
            out["width"].append(img.shape[1])
            out["height"].append(img.shape[0])
            out["pix_sum"].append(int(img.sum()))
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
    ``image/bmp`` / ``image/png`` / ``image/gif`` / ``image/jpeg`` →
    feature_dim-bin grayscale histogram, ``video/x-y4m`` →
    feature_dim-bin luma histogram over all frames. Compressed video
    (mp4/h264 — no parser without ffmpeg) raises ``NotImplementedError``.
    ``fake=True`` keeps the blake2b stand-in for payloads with no
    parseable container (plumbing tests/benches).
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
        if mime in ("image/bmp", "image/png", "image/gif", "image/jpeg"):
            from connect_smts_ray.ops.jpeg import decode_jpeg
            dec = {"image/bmp": decode_bmp, "image/png": decode_png,
                   "image/gif": decode_gif, "image/jpeg": decode_jpeg}[mime]
            img = dec(payload).astype(np.float32)
            # jpeg grayscale decodes to (h, w); the rest are (h, w, 3)
            gray = img if img.ndim == 2 else img.mean(axis=2)
            hist, _ = np.histogram(gray, bins=d, range=(0.0, 256.0))
            return hist.astype(np.float32) / max(gray.size, 1)
        if mime == "video/x-y4m":
            luma = np.concatenate([
                f[0].ravel() for f in decode_y4m(payload)["frames"]
            ])
            hist, _ = np.histogram(luma, bins=d, range=(0.0, 256.0))
            return hist.astype(np.float32) / max(luma.size, 1)
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment (wav/bmp/png/gif/"
            "jpeg/y4m are real; compressed video needs ffmpeg)"
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
    """Actor stage: sample ``n_frames`` frames per video payload — emits
    one row per frame (flat_map-shaped output).

    ``fake=False`` (REAL): payloads are YUV4MPEG2; samples evenly-spaced
    frames ``orig = floor(i * F / n)`` for ``i in 0..n-1`` (clamped to F
    when the clip is shorter), emitting the raw luma plane bytes plus the
    original frame number. Random access via ``decode_y4m_frame`` means
    skipped frames are never materialized — the property that matters
    when the payload is minutes of video and the sampler wants 4 frames.

    ``fake=True``: deterministic byte-slice stand-in for opaque
    containers (mp4/h264) this environment cannot parse."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def _rows_fake(self, mid, p, ids, fidx, orig, frames):
        step = max(1, len(p) // self.n_frames)
        for f in range(self.n_frames):
            ids.append(mid)
            fidx.append(f)
            orig.append(f)
            frames.append(p[f * step : (f + 1) * step])

    def _rows_real(self, mid, p, ids, fidx, orig, frames):
        params, pos = _y4m_parse_header(p)
        planes = _y4m_plane_sizes(params["W"], params["H"], params["C"])
        frame_size = sum(pw * ph for pw, ph in planes)
        # ONE marker walk yields every frame's data offset; the sampled
        # luma planes are then direct byte slices (luma is the first,
        # row-major plane — identical bytes to decode_y4m_frame(k)[0]).
        offsets = _y4m_frame_offsets(p, pos, frame_size)
        total = len(offsets)
        n = min(self.n_frames, total)
        luma_size = planes[0][0] * planes[0][1]
        for i in range(n):
            k = (i * total) // n
            ids.append(mid)
            fidx.append(i)
            orig.append(k)
            frames.append(p[offsets[k]:offsets[k] + luma_size])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, orig, frames = [], [], [], []
        emit = self._rows_fake if self.fake else self._rows_real
        for mid, p in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if p is None:
                continue
            emit(mid, p, ids, fidx, orig, frames)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(fidx, type=pa.int32()),
                "orig_frame": pa.array(orig, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


# ---------------------------------------------------------------------------
# Real GIF codec (GIF89a, single full-frame image, real LZW both ways;
# public spec — GIF89a specification + standard LZW with 12-bit cap)
# ---------------------------------------------------------------------------

def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 index image + (n≤256, 3) palette as a
    GIF89a file with REAL LZW compression (variable code width, clear on
    dictionary overflow at 12 bits)."""
    h, w = indices.shape
    n = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(n, 2)))))  # GCT size field ≥ 2
    gct_n = 1 << bits
    out = bytearray()
    out += b"GIF89a"
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0])
    pal = np.zeros((gct_n, 3), dtype=np.uint8)
    pal[:n] = palette
    out += pal.tobytes()
    # image descriptor: full frame, no LCT, not interlaced
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += b"\x00"

    min_code = max(2, bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out.append(min_code)

    codes = []  # emitted (code, width) stream

    def fresh_dict():
        return {bytes([i]): i for i in range(1 << min_code)}

    table = fresh_dict()
    next_code = eoi + 1
    width = min_code + 1
    codes.append((clear, width))
    seq = b""
    for px in indices.tobytes():
        trial = seq + bytes([px])
        if trial in table:
            seq = trial
            continue
        codes.append((table[seq], width))
        table[trial] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12):
            codes.append((clear, width))
            table = fresh_dict()
            next_code = eoi + 1
            width = min_code + 1
        seq = bytes([px])
    if seq:
        codes.append((table[seq], width))
    codes.append((eoi, width))

    # pack codes LSB-first into bytes
    acc = bit_n = 0
    payload = bytearray()
    for code, cw in codes:
        acc |= code << bit_n
        bit_n += cw
        while bit_n >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            bit_n -= 8
    if bit_n:
        payload.append(acc & 0xFF)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode a GIF87a/89a file to an (h, w, 3) uint8 RGB array. Supports
    a single full-frame non-interlaced image with a global color table
    (exactly what ``encode_gif`` writes and what formula fixtures need);
    interlaced, sub-rectangle, or multi-frame inputs raise — honest
    partial coverage, like the video container before Y4M."""
    mv = memoryview(payload)
    if bytes(mv[:6]) not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    sw = int.from_bytes(mv[6:8], "little")
    sh = int.from_bytes(mv[8:10], "little")
    packed = mv[10]
    pos = 13
    if not packed & 0x80:
        raise ValueError("GIF without a global color table is unsupported")
    gct_n = 2 << (packed & 0x07)
    palette = np.frombuffer(mv[pos:pos + 3 * gct_n],
                            dtype=np.uint8).reshape(gct_n, 3)
    pos += 3 * gct_n

    while pos < len(mv):
        b = mv[pos]
        pos += 1
        if b == 0x3B:  # trailer
            raise ValueError("GIF contains no image data")
        if b == 0x21:  # extension: skip sub-blocks
            pos += 1  # label
            while mv[pos]:
                pos += 1 + mv[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left = int.from_bytes(mv[pos:pos + 2], "little")
        top = int.from_bytes(mv[pos + 2:pos + 4], "little")
        w = int.from_bytes(mv[pos + 4:pos + 6], "little")
        h = int.from_bytes(mv[pos + 6:pos + 8], "little")
        ipacked = mv[pos + 8]
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF is unsupported")
        if ipacked & 0x80:
            raise ValueError("local color tables are unsupported")
        if (left, top, w, h) != (0, 0, sw, sh):
            raise ValueError("sub-rectangle GIF frames are unsupported")

        min_code = mv[pos]
        pos += 1
        data = bytearray()
        while mv[pos]:
            ln = mv[pos]
            data += mv[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        clear, eoi = 1 << min_code, (1 << min_code) + 1
        width = min_code + 1
        table = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
        out = bytearray()
        acc = bit_n = 0
        prev = None
        for byte in data:
            acc |= byte << bit_n
            bit_n += 8
            while bit_n >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                bit_n -= width
                if code == clear:
                    table = [bytes([i])
                             for i in range(1 << min_code)] + [b"", b""]
                    width = min_code + 1
                    prev = None
                    continue
                if code == eoi:
                    bit_n = 0
                    acc = 0
                    break
                if prev is None:
                    entry = table[code]
                else:
                    if code < len(table):
                        entry = table[code]
                        table.append(prev + entry[:1])
                    else:  # the KwKwK case
                        entry = prev + prev[:1]
                        table.append(entry)
                    if (len(table) == (1 << width) and width < 12):
                        width += 1
                out += entry
                prev = entry
        idx = np.frombuffer(bytes(out[:w * h]), dtype=np.uint8)
        if len(idx) != w * h:
            raise ValueError("LZW stream shorter than the frame")
        return palette[idx.reshape(h, w)]
    raise ValueError("truncated GIF")


class DecodeGif:
    """Actor stage: GIF payload column → per-row integer image stats
    (width, height, per-channel pixel sums) through the real LZW path."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("width", "height", "sum_r", "sum_g", "sum_b")}
        for p in batch.column("payload").to_pylist():
            if p is None:
                for k in out:
                    out[k].append(None)
                continue
            img = decode_gif(p).astype(np.int64)
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


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container codec (ISO/IEC 14496-12)
# ---------------------------------------------------------------------------
# A real box-structure writer/parser: length-prefixed box tree (including
# 64-bit `size==1` largesize and `size==0` to-end forms), FullBox
# version/flags, and the complete sample-table chain stsd/stts/stsc/stsz/
# stco resolved into absolute per-sample (offset, size) pairs — the same
# random-access property decode_y4m_frame gives uncompressed video: a
# reader can fetch sample k of a multi-GB file without touching the rest.
# What is NOT here, on purpose: the H.264 bitstream inside the samples.
# Parsing the CONTAINER is pure structure; decoding AVC NAL units needs a
# real entropy/transform stack (ffmpeg's job) and stays behind the honest
# NotImplementedError in DecodeMedia. The synthesizer fills samples with
# deterministic bytes so container parsing + sample gather are still
# verifiable bit-exactly against a SQL oracle.

_MP4_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts", b"udta",
}

_IDENTITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full_box(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version)
                + flags.to_bytes(3, "big") + payload)


def encode_mp4(samples: list, timescale: int = 1000,
               sample_delta: int = 40, width: int = 64,
               height: int = 48) -> bytes:
    """Write a minimal but spec-conformant single-track ISO BMFF file:
    ftyp + mdat (samples contiguous, one chunk) + moov with the full
    stbl chain. Sample payloads are opaque bytes (`avc1` sample entry
    without a real avcC — the bitstream is not this codec's claim)."""
    n = len(samples)
    duration = n * sample_delta
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isomiso2avc1mp41")
    mdat_payload = b"".join(samples)
    # one chunk, starting right after the mdat header
    chunk_offset = len(ftyp) + 8

    mvhd = _full_box(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
        + b"\x00" * 10 + _IDENTITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", 2))
    tkhd = _full_box(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0) + _IDENTITY_MATRIX
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _full_box(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0))  # language 'und'
    hdlr = _full_box(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                     + b"\x00" * 12 + b"VideoHandler\x00")
    avc1 = _box(b"avc1", b"\x00" * 6 + struct.pack(">H", 1)
                + b"\x00" * 16 + struct.pack(">HH", width, height)
                + struct.pack(">II", 0x00480000, 0x00480000)
                + b"\x00" * 4 + struct.pack(">H", 1) + b"\x00" * 32
                + struct.pack(">Hh", 24, -1))
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
    stts = _full_box(b"stts", 0, 0,
                     struct.pack(">III", 1, n, sample_delta))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1)
                     + _full_box(b"url ", 0, 1, b""))
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, box_end) for each box in [start, end) —
    handles 32-bit sizes, `size==1` 64-bit largesize, and `size==0`
    (box extends to the end of the enclosing scope)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        typ = bytes(buf[pos + 4:pos + 8])
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box header")
            box_end = pos + int.from_bytes(buf[pos + 8:pos + 16], "big")
            body = pos + 16
        elif size == 0:
            box_end, body = end, pos + 8
        else:
            box_end, body = pos + size, pos + 8
        if box_end < body or box_end > end:
            raise ValueError(
                f"mp4: box {typ!r} overruns its container "
                f"(pos={pos}, size={size})")
        yield typ, body, box_end
        pos = box_end


def _mp4_collect(buf: bytes, start: int, end: int, out: dict) -> None:
    for typ, body, box_end in _mp4_boxes(buf, start, end):
        if typ in _MP4_CONTAINERS:
            _mp4_collect(buf, body, box_end, out)
        else:
            out.setdefault(typ, (body, box_end))


def decode_mp4(payload: bytes) -> dict:
    """Parse the box tree + sample tables of an ISO BMFF file. Returns
    timescale, duration (media ticks), width/height (tkhd 16.16 fixed →
    int), codec fourcc (first stsd entry), and absolute per-sample
    byte ranges (sample_offsets, sample_sizes) resolved through
    stsc × stco × stsz — i.e. O(1) random access to any sample."""
    buf = memoryview(payload)
    boxes: dict = {}
    _mp4_collect(buf, 0, len(buf), boxes)
    for req in (b"mvhd", b"stsd", b"stts", b"stsc", b"stsz", b"stco"):
        if req not in boxes:
            raise ValueError(f"mp4: missing required box {req!r}")

    def full(typ: bytes):
        s, e = boxes[typ]
        version = buf[s]
        return version, s + 4, e

    v, s, _ = full(b"mvhd")
    if v == 1:
        # v1: 8 creation + 8 modification, then 4 timescale + 8 duration
        (timescale,) = struct.unpack(">I", buf[s + 16:s + 20])
        (duration,) = struct.unpack(">Q", buf[s + 20:s + 28])
    else:
        # v0: 4 creation + 4 modification, then 4 timescale + 4 duration
        timescale, duration = struct.unpack(">II", buf[s + 8:s + 16])
    if timescale == 0:
        raise ValueError("mp4: mvhd timescale is zero")

    width = height = 0
    if b"tkhd" in boxes:
        v, s, e = full(b"tkhd")
        # v0: creation/modification/track_ID/reserved/duration = 20 bytes;
        # v1 widens the two times and the duration to 64-bit = 32 bytes.
        # Both then have 8 reserved + 8 layer/alt/volume/reserved2 +
        # 36 matrix before width — so width sits at +72 (v0) / +84 (v1).
        off = s + (84 if v == 1 else 72)
        w_fx, h_fx = struct.unpack(">II", buf[off:off + 8])
        width, height = w_fx >> 16, h_fx >> 16

    _, s, _ = full(b"stsd")
    codec = bytes(buf[s + 8:s + 12]).decode("latin1")

    def table_bytes(typ: bytes, s: int, e: int, n: int, width: int,
                    skip: int) -> memoryview:
        """Slice ``n`` fixed-width entries out of a box body, refusing to
        read past the box end — an oversized count field must raise here,
        not silently consume the next box's bytes (the same overrun
        philosophy ``_mp4_boxes`` applies to box sizes)."""
        lo, hi = s + skip, s + skip + width * n
        if hi > e:
            raise ValueError(
                f"mp4: {typ.decode('latin1')} entry count {n} overruns "
                f"its box body ({hi - s} bytes needed, {e - s} present)")
        return buf[lo:hi]

    _, s, e = full(b"stts")
    (n_ent,) = struct.unpack(">I", buf[s:s + 4])
    stts = np.frombuffer(table_bytes(b"stts", s, e, n_ent, 8, 4),
                         dtype=">u4").reshape(n_ent, 2).astype(np.int64)
    n_samples = int(stts[:, 0].sum())
    media_dur = int((stts[:, 0] * stts[:, 1]).sum())

    _, s, e = full(b"stsz")
    fixed, count = struct.unpack(">II", buf[s:s + 8])
    if fixed:
        sizes = np.full(count, fixed, dtype=np.int64)
    else:
        sizes = np.frombuffer(table_bytes(b"stsz", s, e, count, 4, 8),
                              dtype=">u4").astype(np.int64)
    if n_samples != count:
        raise ValueError(
            f"mp4: stts sample total {n_samples} != stsz count {count}")

    _, s, e = full(b"stco")
    (n_chunks,) = struct.unpack(">I", buf[s:s + 4])
    chunk_off = np.frombuffer(table_bytes(b"stco", s, e, n_chunks, 4, 4),
                              dtype=">u4").astype(np.int64)

    _, s, e = full(b"stsc")
    (n_sc,) = struct.unpack(">I", buf[s:s + 4])
    stsc = np.frombuffer(table_bytes(b"stsc", s, e, n_sc, 12, 4),
                         dtype=">u4").reshape(n_sc, 3).astype(np.int64)
    # expand samples-per-chunk runs to one value per chunk; the first run
    # must start at chunk 1 (ISO 14496-12 §8.7.4) or chunks before it
    # would have undefined samples-per-chunk
    if n_sc and int(stsc[0, 0]) != 1:
        raise ValueError("mp4: stsc first entry does not start at chunk 1")
    spc = np.zeros(n_chunks, dtype=np.int64)
    for i in range(n_sc):
        first = stsc[i, 0] - 1
        last = stsc[i + 1, 0] - 1 if i + 1 < n_sc else n_chunks
        spc[first:last] = stsc[i, 1]
    if int(spc.sum()) != count:
        raise ValueError("mp4: stsc×stco sample count != stsz count")

    offsets = np.empty(count, dtype=np.int64)
    k = 0
    for c in range(n_chunks):
        m = int(spc[c])
        sz = sizes[k:k + m]
        offsets[k:k + m] = chunk_off[c] + np.concatenate(
            ([0], np.cumsum(sz[:-1])))
        k += m
    return {
        "timescale": int(timescale), "duration": int(duration),
        "media_duration": media_dur, "n_samples": n_samples,
        "width": width, "height": height, "codec": codec,
        "sample_sizes": sizes, "sample_offsets": offsets,
    }


def decode_mp4_sample(payload: bytes, meta: dict, k: int) -> bytes:
    """Random access: raw bytes of sample k via the resolved tables."""
    o, s = int(meta["sample_offsets"][k]), int(meta["sample_sizes"][k])
    return bytes(payload[o:o + s])


class DecodeMp4:
    """Actor stage: MP4 payload column → bit-exact container stats.

    Walks the real box tree, then proves the random-access path by
    GATHERING every sample's bytes through (stco×stsc×stsz)-resolved
    offsets and summing them — a wrong offset table cannot produce the
    oracle's payload_sum. duration_ms is ticks→ms via the mvhd
    timescale."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = ("n_samples", "duration_ms", "width", "height",
                "total_bytes", "payload_sum")
        out = {k: [] for k in cols}
        for p in batch.column("payload").to_pylist():
            if p is None:
                for k in out:
                    out[k].append(None)
                continue
            m = decode_mp4(p)
            # zero-copy uint8 view; accumulate in int64 via sum dtype —
            # an .astype(np.int64) here would copy the whole file 8× wide
            buf = np.frombuffer(p, dtype=np.uint8)
            psum = 0
            for j in range(m["n_samples"]):
                o, s = int(m["sample_offsets"][j]), int(m["sample_sizes"][j])
                psum += int(buf[o:o + s].sum(dtype=np.int64))
            out["n_samples"].append(m["n_samples"])
            out["duration_ms"].append(
                m["duration"] * 1000 // m["timescale"])
            out["width"].append(m["width"])
            out["height"].append(m["height"])
            out["total_bytes"].append(int(m["sample_sizes"].sum()))
            out["payload_sum"].append(psum)
        return pa.table({
            "media_id": batch.column("media_id"),
            **{k: pa.array(v, pa.int64()) for k, v in out.items()},
        })
