"""Avro Object Container File source + sink — dependency-free, from the
public Apache Avro 1.11 spec (no avro/fastavro in this environment; the
byte format is pinned by hand-built golden vectors in tests).

Avro is the Kafka-ecosystem wire format a Debezium/Connect deployment
actually ships (reference context: the SMTs sit in a Connect worker whose
converters are Avro + Schema Registry), so a CDC engine needs to ingest
and emit it natively.

Supported schema subset — the tabular slice a Connect record uses:
records of null/boolean/int/long/float/double/string/bytes fields,
nullable via ``["null", T]`` unions, and ``timestamp-micros`` logical
longs (↔ Arrow ``timestamp("us")``). Codecs: ``null`` and ``deflate``
(raw RFC-1951, zlib wbits=-15 — the spec's definition).

Distribution shape (same contract as ``sources/orc.py``): the sink
writes one container file per input block via ``map_batches`` (atomic
rename, content-addressed name + deterministic sync marker → idempotent
under task retries, never one giant file); the source SPLITS INSIDE
files — planning carves each container body into byte ranges and every
decode task syncs to its first block boundary via the 16-byte sync
marker (the Hadoop/Spark Avro split protocol), so one huge file decodes
with parallelism = ceil(body / split_size), not 1.

Decode cost: Avro's varint stream is inherently sequential per block, so
the inner loop is Python ``unpack_from`` — distributed per file, and the
slot where a C decoder (fastavro) would drop in unchanged. Encode is the
same in reverse. Both stay off the driver.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import struct
import uuid
import zlib

import pyarrow as pa

_MAGIC = b"Obj\x01"


# -- varint / primitive encoding ------------------------------------------

def _write_long(buf: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # arithmetic shift keeps sign handling exact
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(mv, pos: int) -> tuple:
    shift = 0
    acc = 0
    while True:
        b = mv[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(buf: bytearray, data: bytes) -> None:
    _write_long(buf, len(data))
    buf += data


# -- schema mapping --------------------------------------------------------

_ARROW_TO_AVRO = [
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_int32, "int"),
    (pa.types.is_integer, "long"),
    (pa.types.is_float32, "float"),
    (pa.types.is_floating, "double"),
    (pa.types.is_string, "string"),
    (pa.types.is_binary, "bytes"),
]


def arrow_to_avro_schema(schema: pa.Schema, name: str = "Row") -> dict:
    fields = []
    for f in schema:
        if pa.types.is_timestamp(f.type):
            if f.type.unit != "us":
                raise ValueError(f"timestamp unit must be us, got {f.type}")
            t: object = {"type": "long", "logicalType": "timestamp-micros"}
        else:
            for pred, avro_t in _ARROW_TO_AVRO:
                if pred(f.type):
                    t = avro_t
                    break
            else:
                raise ValueError(f"unsupported Arrow type for Avro: {f.type}")
        fields.append({"name": f.name, "type": ["null", t]
                       if f.nullable else t})
    return {"type": "record", "name": name, "fields": fields}


def _avro_field_kind(t) -> tuple:
    """(kind, nullable) from an Avro field type node."""
    nullable = False
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(t) != len(branches) + 1 or len(branches) != 1:
            raise ValueError(f"only [null, T] unions supported, got {t}")
        nullable = True
        t = branches[0]
    if isinstance(t, dict):
        if t.get("logicalType") == "timestamp-micros" and t["type"] == "long":
            return "timestamp-micros", nullable
        t = t["type"]
    if t not in ("boolean", "int", "long", "float", "double",
                 "string", "bytes"):
        raise ValueError(f"unsupported Avro type: {t}")
    return t, nullable


_KIND_TO_ARROW = {
    "boolean": pa.bool_(), "int": pa.int32(), "long": pa.int64(),
    "float": pa.float32(), "double": pa.float64(), "string": pa.string(),
    "bytes": pa.binary(), "timestamp-micros": pa.timestamp("us"),
}


# -- encode ----------------------------------------------------------------

def encode_container(table: pa.Table, codec: str = "deflate",
                     sync: bytes | None = None,
                     max_block_rows: int = 65_536) -> bytes:
    """One Arrow table → one Avro Object Container File (bytes).

    Rows chunk into blocks of ≤ ``max_block_rows`` — a block is the
    atomic decode (and deflate) unit, so multi-block files are what lets
    ``read_avro`` split a big container across tasks."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec}")
    schema = arrow_to_avro_schema(table.schema)
    sync = sync or uuid.uuid4().bytes
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")

    out = bytearray()
    out += _MAGIC
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)  # end of metadata map
    out += sync

    kinds = [_avro_field_kind(f["type"]) for f in schema["fields"]]
    cols = []
    for f, (kind, _n) in zip(table.schema, kinds):
        col = table.column(f.name)
        if kind == "timestamp-micros":
            col = col.cast(pa.int64())  # µs since epoch, exactly the wire long
        elif kind == "long" and pa.types.is_unsigned_integer(f.type):
            # Avro "long" is SIGNED 64-bit; a uint64 value >= 2^63 would
            # silently corrupt through the zigzag mask (encode 2^63 →
            # decode -1). A checked cast raises ArrowInvalid instead.
            col = col.cast(pa.int64())
        cols.append(col.to_pylist())

    n = table.num_rows
    for lo in range(0, n, max_block_rows):
        hi = min(lo + max_block_rows, n)
        body = bytearray()
        for i in range(lo, hi):
            for (kind, nullable), col in zip(kinds, cols):
                v = col[i]
                if nullable:
                    _write_long(body, 0 if v is None else 1)
                    if v is None:
                        continue
                if kind in ("long", "int", "timestamp-micros"):
                    _write_long(body, int(v))
                elif kind == "double":
                    body += struct.pack("<d", v)
                elif kind == "float":
                    body += struct.pack("<f", v)
                elif kind == "boolean":
                    body.append(1 if v else 0)
                elif kind == "string":
                    _write_bytes(body, str(v).encode())
                else:  # bytes
                    _write_bytes(body, bytes(v))
        payload = bytes(body)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw DEFLATE
            payload = comp.compress(payload) + comp.flush()
        _write_long(out, hi - lo)
        _write_bytes(out, payload)
        out += sync
    return bytes(out)


# -- decode ----------------------------------------------------------------

def _parse_header(mv) -> tuple:
    """Container header → (names, kinds, codec, sync, body_start)."""
    if bytes(mv[:4]) != _MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta = {}
    while True:
        cnt, pos = _read_long(mv, pos)
        if cnt == 0:
            break
        if cnt < 0:  # block with byte size prefix
            cnt = -cnt
            _, pos = _read_long(mv, pos)
        for _ in range(cnt):
            klen, pos = _read_long(mv, pos)
            key = bytes(mv[pos:pos + klen]).decode()
            pos += klen
            vlen, pos = _read_long(mv, pos)
            meta[key] = bytes(mv[pos:pos + vlen])
            pos += vlen
    sync = bytes(mv[pos:pos + 16])
    pos += 16

    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec}")
    names = [f["name"] for f in schema["fields"]]
    kinds = [_avro_field_kind(f["type"]) for f in schema["fields"]]
    return names, kinds, codec, sync, pos


def _decode_block(mv, pos: int, kinds, codec: str, sync: bytes, out) -> int:
    """Decode ONE (count, size, data, sync) block at ``pos`` into ``out``
    column lists; returns the position after the trailing sync. The sync
    check doubles as the guard against a split-scan false positive."""
    n_rows, pos = _read_long(mv, pos)
    n_bytes, pos = _read_long(mv, pos)
    block = bytes(mv[pos:pos + n_bytes])
    pos += n_bytes
    if bytes(mv[pos:pos + 16]) != sync:
        raise ValueError("sync marker mismatch — corrupt container "
                         "(or a coincidental sync hit in a split scan)")
    pos += 16
    if codec == "deflate":
        block = zlib.decompress(block, wbits=-15)
    bmv = memoryview(block)
    bpos = 0
    for _ in range(n_rows):
        for ci, (kind, nullable) in enumerate(kinds):
            if nullable:
                branch, bpos = _read_long(bmv, bpos)
                if branch == 0:
                    out[ci].append(None)
                    continue
            if kind in ("long", "int", "timestamp-micros"):
                v, bpos = _read_long(bmv, bpos)
            elif kind == "double":
                v = struct.unpack_from("<d", bmv, bpos)[0]
                bpos += 8
            elif kind == "float":
                v = struct.unpack_from("<f", bmv, bpos)[0]
                bpos += 4
            elif kind == "boolean":
                v = bmv[bpos] == 1
                bpos += 1
            else:  # string / bytes
                ln, bpos = _read_long(bmv, bpos)
                raw = bytes(bmv[bpos:bpos + ln])
                bpos += ln
                v = raw.decode() if kind == "string" else raw
            out[ci].append(v)
    return pos


def _columns_to_table(out, names, kinds) -> pa.Table:
    arrays = [pa.array(vals, type=_KIND_TO_ARROW[kind])
              for vals, (kind, _n) in zip(out, kinds)]
    return pa.table(dict(zip(names, arrays)))


def decode_container(data: bytes) -> pa.Table:
    """One Avro Object Container File → Arrow table."""
    mv = memoryview(data)
    names, kinds, codec, sync, pos = _parse_header(mv)
    out: list = [[] for _ in names]
    total = len(mv)
    while pos < total:
        pos = _decode_block(mv, pos, kinds, codec, sync, out)
    return _columns_to_table(out, names, kinds)


# -- Ray Data connector ----------------------------------------------------

def write_avro(ds, out_dir: str, codec: str = "deflate"):
    """Write a Dataset to ``{out_dir}/part-*.avro``, one container file
    per block, via a ``Datasink`` (streaming). Runs the write eagerly and
    returns the per-file summary Dataset (path, n_rows).

    Idempotent under Ray task retries AND multiplicity-preserving: the
    file name mixes the stable write-task index with the block's content
    sha (see ``sources/filesink.py``) — a retry rewrites the identical
    path/bytes atomically, while two different blocks with identical
    content keep distinct files so directory reads never drop rows. The
    container's sync marker still derives from the content sha."""
    import ray.data

    from connect_smts_ray.sources.filesink import BlockFileDatasink

    def encode(t: pa.Table, tmp: str, sync: bytes) -> None:
        with open(tmp, "wb") as f:
            f.write(encode_container(t, codec=codec, sync=sync))

    sink = BlockFileDatasink(out_dir, ".avro", encode)
    ds.write_datasink(sink)
    if not sink.results:
        return ray.data.from_arrow(pa.table({
            "path": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64())}))
    return ray.data.from_items(sink.results)


def _resolve_avro_paths(dir_or_paths) -> list:
    """Explicit list, or ``*.avro`` under a directory — never ``.tmp``
    leftovers from a killed writer task (same hazard class as ORC)."""
    if isinstance(dir_or_paths, (str, os.PathLike)):
        p = str(dir_or_paths)
        if os.path.isdir(p):
            return sorted(glob.glob(os.path.join(p, "*.avro")))
        return [p]
    return [str(x) for x in dir_or_paths]


def _read_header_bytes(path: str) -> bytes:
    """Read just enough of the file to parse the container header
    (metadata-only planning IO, doubling until the parse fits)."""
    size = os.path.getsize(path)
    want = 64 * 1024
    with open(path, "rb") as f:
        while True:
            f.seek(0)
            buf = f.read(min(want, size))
            try:
                _parse_header(memoryview(buf))
                return buf
            except (IndexError, ValueError):
                if want >= size:
                    raise
                want *= 2


def _plan_one_header(p: str) -> tuple:
    head = _read_header_bytes(p)
    _, _, _, _, body_start = _parse_header(memoryview(head))
    return p, body_start, os.path.getsize(p)


def _plan_headers(paths: list) -> list:
    """``(path, body_start, size)`` per file via the shared chunked-Ray
    planner (``sources/filesink.py: plan_files``) — a thousand-part
    directory plans distributed, not serially on the driver."""
    from connect_smts_ray.sources.filesink import plan_files

    return plan_files(paths, _plan_one_header)


def read_avro(dir_or_paths, split_size: int = 8 * 1024 * 1024):
    """Read Avro container files as a Dataset, split INSIDE files.

    Planning parses each header (metadata-only) and carves the body into
    ~``split_size`` byte ranges; each decode task syncs to the first
    block boundary at-or-after its range start (the Hadoop/Spark split
    protocol: scan for the 16-byte sync marker) and decodes exactly the
    blocks whose start offset falls in [start, end) — so one huge
    container decodes with parallelism = ceil(body/split_size) and every
    block is decoded exactly once. A coincidental sync-pattern hit inside
    block data (probability 2⁻¹²⁸ per position) is caught by the
    per-block trailing-sync check and raises rather than corrupting.
    """
    import ray.data

    paths = _resolve_avro_paths(dir_or_paths)
    units: list = []
    for p, body_start, size in _plan_headers(paths):
        start = body_start
        while start < size:
            end = min(start + split_size, size)
            units.append({"path": p, "start": start, "end": end,
                          "body_start": body_start})
            start = end
    if not units:
        return ray.data.from_items([])

    plan = ray.data.from_items(units, override_num_blocks=len(units))

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for path, start, end, body_start in zip(
                batch.column("path").to_pylist(),
                batch.column("start").to_pylist(),
                batch.column("end").to_pylist(),
                batch.column("body_start").to_pylist()):
            size = os.path.getsize(path)
            with open(path, "rb") as f:
                # header (bounded — it ends exactly at body_start)
                head = f.read(body_start)
                names, kinds, codec, sync, _ = _parse_header(
                    memoryview(head))
                # bounded window: this split's byte range plus slack for
                # the one block that may START before `end` and overrun
                # it; extend on demand instead of reading the whole file
                # (whole-file reads made total IO O(splits × file_size) —
                # round-5 review finding)
                buf_off = max(body_start, start - 16)
                f.seek(buf_off)
                slack = 1 << 20
                data = f.read(min(end + slack, size) - buf_off)

                def extend() -> bool:
                    nonlocal data
                    have = buf_off + len(data)
                    if have >= size:
                        return False
                    data = data + f.read(min(slack + len(data),
                                             size - have))
                    return True

                if start == body_start:
                    pos = start
                else:
                    # sync to the first block boundary at-or-after
                    # `start`: boundaries sit right after a sync marker
                    while True:
                        q = data.find(sync, 0)
                        while q != -1 and buf_off + q + 16 < start:
                            q = data.find(sync, q + 1)
                        if q != -1 or not extend():
                            break
                    pos = buf_off + q + 16 if q != -1 else size
                out: list = [[] for _ in names]
                while pos < end and pos < size:
                    try:
                        nxt = _decode_block(
                            memoryview(data), pos - buf_off,
                            kinds, codec, sync, out)
                        pos = buf_off + nxt
                    except (IndexError, ValueError, struct.error):
                        # short buffer (the block overruns the window):
                        # extend and retry; genuine corruption keeps
                        # failing until EOF and then raises for real.
                        # Safe to retry: _decode_block validates the
                        # trailing sync BEFORE appending any row to out,
                        # so a short-buffer failure appends nothing.
                        if not extend():
                            raise
            tables.append(_columns_to_table(out, names, kinds))
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)

    return plan.map_batches(decode, batch_format="pyarrow")
