"""Avro Object Container File codec: spec conformance pinned by
hand-built golden bytes (no avro lib exists in this environment), plus
roundtrip and Ray connector coverage."""

import struct

import pyarrow as pa
import pytest

from connect_smts_ray.sources.avro import (arrow_to_avro_schema,
                                           decode_container,
                                           encode_container)


def table_all_types() -> pa.Table:
    return pa.table({
        "id": pa.array([1, -2, 3, None], pa.int64()),
        "name": pa.array(["a", None, "ccc", "d"], pa.string()),
        "score": pa.array([1.5, 2.5, None, -0.25], pa.float64()),
        "ok": pa.array([True, False, None, True], pa.bool_()),
        "blob": pa.array([b"\x00\xff", b"", None, b"xyz"], pa.binary()),
        "ts": pa.array([0, 1, None, 1_700_000_000_000_000],
                       pa.timestamp("us")),
    })


def test_roundtrip_all_types_both_codecs():
    t = table_all_types()
    for codec in ("null", "deflate"):
        back = decode_container(encode_container(t, codec=codec))
        assert back.equals(t), codec


def test_schema_mapping():
    s = arrow_to_avro_schema(table_all_types().schema)
    by_name = {f["name"]: f["type"] for f in s["fields"]}
    assert by_name["id"] == ["null", "long"]
    assert by_name["score"] == ["null", "double"]
    assert by_name["ts"] == [
        "null", {"type": "long", "logicalType": "timestamp-micros"}]


def _vint(n: int) -> bytes:
    """Spec zigzag varint, written independently of the library."""
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_golden_container_hand_built():
    """A container assembled byte-by-byte from the Avro 1.11 spec (magic,
    metadata map, sync-delimited null-codec block) must decode to the
    expected rows — pins the READER to the public wire format, not to
    whatever the writer happens to emit."""
    schema = (b'{"type":"record","name":"R","fields":['
              b'{"name":"k","type":"long"},'
              b'{"name":"s","type":"string"},'
              b'{"name":"x","type":"double"}]}')
    sync = bytes(range(16))
    buf = bytearray()
    buf += b"Obj\x01"
    buf += _vint(2)  # two metadata entries
    buf += _vint(len(b"avro.schema")) + b"avro.schema"
    buf += _vint(len(schema)) + schema
    buf += _vint(len(b"avro.codec")) + b"avro.codec"
    buf += _vint(len(b"null")) + b"null"
    buf += _vint(0)
    buf += sync
    rows = bytearray()
    for k, s, x in [(7, "hi", 1.5), (-1, "", -2.0)]:
        rows += _vint(k)
        rows += _vint(len(s.encode())) + s.encode()
        rows += struct.pack("<d", x)
    buf += _vint(2)            # rows in block
    buf += _vint(len(rows)) + bytes(rows)
    buf += sync

    t = decode_container(bytes(buf))
    assert t.column("k").to_pylist() == [7, -1]
    assert t.column("s").to_pylist() == ["hi", "", ]
    assert t.column("x").to_pylist() == [1.5, -2.0]


def test_writer_emits_spec_header():
    """Writer output starts with the spec magic, declares the codec in
    the metadata map, and ends with its own sync marker."""
    t = pa.table({"k": pa.array([1, 2], pa.int64())})
    data = encode_container(t, codec="deflate", sync=bytes(range(16)))
    assert data[:4] == b"Obj\x01"
    assert b"avro.codec" in data and b"deflate" in data
    assert data.endswith(bytes(range(16)))


def test_zigzag_longs_roundtrip_extremes():
    t = pa.table({"k": pa.array(
        [0, -1, 1, 2**62, -(2**62), 2**63 - 1, -(2**63)], pa.int64())})
    back = decode_container(encode_container(t, codec="null"))
    assert back.column("k").to_pylist() == t.column("k").to_pylist()


def test_corrupt_sync_detected():
    t = pa.table({"k": pa.array([1], pa.int64())})
    data = bytearray(encode_container(t, codec="null"))
    data[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        decode_container(bytes(data))


def test_ray_connector_roundtrip(ray_session, tmp_path):
    import ray.data

    from connect_smts_ray.sources.avro import read_avro, write_avro

    t = table_all_types()
    ds = ray.data.from_arrow(t).repartition(3)
    files = write_avro(ds, str(tmp_path / "avro")).take_all()
    assert sum(f["n_rows"] for f in files) == t.num_rows
    assert len(files) >= 2  # one file per non-empty block
    back = read_avro(str(tmp_path / "avro"))
    got = back.to_pandas().sort_values("id", na_position="last") \
        .reset_index(drop=True)
    want = t.to_pandas().sort_values("id", na_position="last") \
        .reset_index(drop=True)
    assert got.equals(want)


def test_avro_split_read_one_big_file(ray_session, tmp_path):
    """One multi-block container decodes split across >1 task with
    content identical to the whole-file decode."""
    import ray

    from connect_smts_ray.sources.avro import (
        decode_container, encode_container, read_avro)

    n = 20_000
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "name": pa.array([f"user-{i % 997}" for i in range(n)], pa.string()),
        "score": pa.array([i * 0.5 for i in range(n)], pa.float64()),
    })
    path = str(tmp_path / "big.avro")
    with open(path, "wb") as f:
        f.write(encode_container(t, codec="deflate", max_block_rows=1000))

    ds = read_avro([path], split_size=32 * 1024).materialize()
    assert ds.num_blocks() > 1  # the single file actually split
    back = (ds.to_pandas().sort_values("id").reset_index(drop=True))
    whole = decode_container(open(path, "rb").read()).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert back.equals(whole)
    assert len(back) == n


def test_avro_write_idempotent_and_tmp_immune(ray_session, tmp_path):
    """Retried writes land on the same content-addressed file; directory
    reads skip .tmp leftovers."""
    import os

    import ray

    from connect_smts_ray.sources.avro import read_avro, write_avro

    t = pa.table({"id": pa.array(range(50), pa.int64()),
                  "v": pa.array([f"x{i}" for i in range(50)], pa.string())})
    out = str(tmp_path / "avro")
    p1 = sorted(r["path"] for r in
                write_avro(ray.data.from_arrow(t).repartition(1), out)
                .take_all())
    p2 = sorted(r["path"] for r in
                write_avro(ray.data.from_arrow(t).repartition(1), out)
                .take_all())
    assert p1 == p2  # byte-identical retry → same name, atomic replace
    with open(os.path.join(out, "part-junk.avro.9999.tmp"), "wb") as f:
        f.write(b"half-written garbage")
    assert read_avro(out).count() == 50
