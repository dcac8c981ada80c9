"""Baseline JPEG codec (ops/jpeg.py): round-trips, goldens, marker
handling, and the block-constant exactness property the SQL-oracled
``media_jpeg_stats`` query relies on."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from connect_smts_ray.ops.jpeg import decode_jpeg, encode_jpeg


def _block_constant(vals: np.ndarray, h: int, w: int) -> np.ndarray:
    """Image constant within each 8×8 block: vals is the (bh, bw) grid."""
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:h, :w]


def test_block_constant_grayscale_roundtrips_exactly():
    """Even-valued block-constant grayscale images survive the full
    encode→decode path BIT-EXACTLY (DC-only blocks, /16 quantizer) —
    the invariant media_jpeg_stats' DuckDB oracle recomputes."""
    rng = np.random.RandomState(0)
    for trial in range(12):
        bw, bh = rng.randint(1, 5), rng.randint(1, 4)
        w = max(8 * bw - rng.randint(0, 8), 1)
        h = max(8 * bh - rng.randint(0, 8), 1)
        vals = (2 * rng.randint(0, 128, size=(bh, bw))).astype(np.uint8)
        img = _block_constant(vals, h, w)
        rst = int(rng.choice([0, 1, 2, 5]))
        back = decode_jpeg(encode_jpeg(img, restart_interval=rst))
        assert back.shape == (h, w)
        assert np.array_equal(back, img), f"trial {trial} rst={rst}"


def test_random_grayscale_within_quant_error():
    rng = np.random.RandomState(3)
    for _ in range(6):
        h, w = rng.randint(5, 40), rng.randint(5, 40)
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        back = decode_jpeg(encode_jpeg(img))
        err = np.abs(back.astype(int) - img.astype(int))
        assert err.mean() < 25  # white noise is JPEG's worst case


def test_smooth_rgb_444_and_420():
    yy, xx = np.mgrid[0:24, 0:31]
    img = np.stack([(yy * 3) % 256, (xx * 5) % 256,
                    ((xx + yy) * 2) % 256], axis=-1).astype(np.uint8)
    for kw in ({}, {"subsample": True}, {"subsample": True,
                                         "restart_interval": 2}):
        back = decode_jpeg(encode_jpeg(img, **kw))
        assert back.shape == img.shape
        err = np.abs(back.astype(int) - img.astype(int))
        assert err.mean() < 8, kw


def test_golden_pins():
    """Pin encoder bytes + decoder output so silent drift in either
    direction (tables, rounding, bit packing) fails loudly."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(21, 26)).astype(np.uint8)
    enc = encode_jpeg(img, restart_interval=2)
    assert hashlib.sha256(enc).hexdigest()[:16] == "4cfb9eeea36485f6"
    assert len(enc) == 646
    assert int(decode_jpeg(enc).astype(np.int64).sum()) == 70934

    rgb = rng.randint(0, 256, size=(13, 18, 3)).astype(np.uint8)
    enc444 = encode_jpeg(rgb)
    assert hashlib.sha256(enc444).hexdigest()[:16] == "d586ca192c99327d"
    assert int(decode_jpeg(enc444).astype(np.int64).sum()) == 86851
    enc420 = encode_jpeg(rgb, subsample=True)
    assert hashlib.sha256(enc420).hexdigest()[:16] == "ca12cebd7b24541f"
    assert int(decode_jpeg(enc420).astype(np.int64).sum()) == 86945


def test_marker_robustness():
    img = np.full((8, 8), 100, np.uint8)
    enc = bytearray(encode_jpeg(img))
    # foreign APP2 + COM segments between SOI and the rest must be skipped
    extra = (b"\xff\xe2" + (5).to_bytes(2, "big") + b"abc"
             + b"\xff\xfe" + (9).to_bytes(2, "big") + b"comment")
    patched = bytes(enc[:2]) + extra + bytes(enc[2:])
    assert np.array_equal(decode_jpeg(patched), img)

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(bytes(enc[:2]))  # SOI only
    # progressive SOF2 must be rejected, not mis-decoded
    sof0 = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:sof0]) + b"\xff\xc2" + bytes(enc[sof0 + 2:])
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)


def test_decode_media_dispatch_and_stage(ray_session):
    """image/jpeg flows through DecodeMedia's real-codec path and the
    DecodeJpeg stats stage end-to-end on a Dataset."""
    import ray

    from connect_smts_ray.ops.multimodal import DecodeJpeg, DecodeMedia

    rng = np.random.RandomState(11)
    rows = []
    for i in range(24):
        bw, bh = 1 + i % 3, 1 + i % 2
        vals = (2 * rng.randint(0, 128, size=(bh, bw))).astype(np.uint8)
        img = _block_constant(vals, 8 * bh - i % 5, 8 * bw - i % 7)
        rows.append({"media_id": i, "payload": encode_jpeg(img),
                     "mime": "image/jpeg",
                     "want_sum": int(img.astype(np.int64).sum()),
                     "want_w": img.shape[1], "want_h": img.shape[0]})
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    ds = ray.data.from_arrow(t)

    stats = ds.map_batches(DecodeJpeg, batch_format="pyarrow",
                           concurrency=(1, 2), batch_size=8).to_pandas()
    stats = stats.sort_values("media_id").reset_index(drop=True)
    for r in rows:
        row = stats.iloc[r["media_id"]]
        assert (row.width, row.height, row.pix_sum) == (
            r["want_w"], r["want_h"], r["want_sum"])

    feats = ds.map_batches(DecodeMedia, batch_format="pyarrow",
                           concurrency=(1, 2), batch_size=8).to_pandas()
    for f in feats["features"]:
        v = np.asarray(f, dtype=np.float32)
        assert v.shape == (32,) and abs(v.sum() - 1.0) < 1e-4
