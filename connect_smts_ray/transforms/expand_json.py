"""ExpandJson — the DebeziumJsonDeserializer SMT as a Ray Data actor stage.

Behavioral parity with /root/reference
``smt/DebeziumJsonDeserializer.java:59-256``:

- JSON-string columns (the ``io.debezium.data.Json`` analog) are parsed and
  expanded into typed nested struct columns, schemas inferred per record.
- ``null`` / ``""`` payloads drop the field for that record
  (:87-89) — columnar equivalent: a null in the expanded column.
- Union-widening registry: a *list* of candidate schemas per column because
  some shapes are mutually incompatible (:56, :223-253). New records union
  into the first compatible slot; the slot is replaced by the widened union.
- Probabilistic fast path (:196-212): strict-map the parsed tree against each
  known slot before falling back to infer+union.
- Tombstones (null payload) pass through untouched (:60-63).

Ray Data mapping: a callable class for
``ds.map_batches(ExpandJson(cfg), batch_format="pyarrow", concurrency=N)``.
Config + bootstrap schemas are parsed once per actor in ``__init__``; each
``__call__`` processes one zero-copy Arrow batch. Because each actor widens
its registry independently (exactly like one Connect task, §3.4 of SURVEY),
block schemas may differ until converged; pipelines that need a single
stable schema pass ``bootstrap_schemas`` (the reference's
``union-previous-messages-schema.topic.{t}.field.{f}`` analog,
:134-162) or reconcile at the sink with
``connect_smts_ray.core.schema.union_arrow_types``.

Output columns: the source column is replaced in place by the expanded value
typed to slot 0's widened schema; additional incompatible slots (rare) emit
``{col}__s{k}`` columns, null where a row belongs to a different slot.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import orjson
import pyarrow as pa

logger = logging.getLogger(__name__)

from connect_smts_ray.core.schema import (
    FastPathMiss,
    InferConfig,
    SchemaUnionError,
    SType,
    compile_fast_checker,
    infer_json_value,
    map_json_to_schema,
    stype_from_dict,
    stype_to_dict,
    to_arrow,
    union_types,
)


@dataclass(frozen=True)
class ExpandJsonConfig:
    """Engine analog of the SMT's ConfigDef
    (smt/DebeziumJsonDeserializer.java:41-48)."""

    columns: tuple = ("value_json",)
    union_previous_messages_schema: bool = True
    probabilistic_fast_path: bool = True
    optional_struct_fields: bool = False
    convert_numbers_to_double: bool = False
    sanitize_field_names: bool = False
    ignored_fields: tuple = ()
    # column -> list of serialized SType dicts (SchemaSerDer wire format)
    bootstrap_schemas: Optional[dict] = None
    # replace the source column in place (reference semantics); if False the
    # expanded column is appended as f"{col}_expanded"
    replace_source: bool = True

    def infer_config(self) -> InferConfig:
        return InferConfig(
            optional_struct_fields=self.optional_struct_fields,
            convert_numbers_to_double=self.convert_numbers_to_double,
            sanitize_field_names=self.sanitize_field_names,
            ignored_fields=InferConfig.rewrite_ignored_paths(self.ignored_fields),
        )


class ExpandJson:
    """Stateful batch transform; one instance per Ray actor."""

    def __init__(self, config: ExpandJsonConfig = ExpandJsonConfig()):
        self.config = config
        self.cfg = config.infer_config()
        # registry: column -> list[SType] (slot list, smt/DebeziumJsonDeserializer.java:56)
        self.registry: dict = {col: [] for col in config.columns}
        # cached Arrow types / compiled checkers per slot, invalidated on widening
        self._arrow_cache: dict = {}
        self._checker_cache: dict = {}
        for col, serialized in (config.bootstrap_schemas or {}).items():
            self.registry.setdefault(col, [])
            self.registry[col].extend(stype_from_dict(d) for d in serialized)

    # -- registry -----------------------------------------------------------

    def known_schemas(self, col: str):
        return list(self.registry.get(col, ()))

    def serialized_registry(self) -> dict:
        return {
            col: [stype_to_dict(s) for s in slots]
            for col, slots in self.registry.items()
        }

    def _arrow_type(self, col: str, slot: int) -> pa.DataType:
        stype = self.registry[col][slot]
        hit = self._arrow_cache.get((col, slot))
        if hit is not None and hit[0] == stype:
            return hit[1]
        at = to_arrow(stype)
        self._arrow_cache[(col, slot)] = (stype, at)
        return at

    def _checker(self, col: str, slot: int):
        stype = self.registry[col][slot]
        hit = self._checker_cache.get((col, slot))
        if hit is not None and hit[0] == stype:
            return hit[1]
        fn = compile_fast_checker(stype)
        self._checker_cache[(col, slot)] = (stype, fn)
        return fn

    # -- per-record core (transformDebeziumJsonField, :187-256) -------------

    def _transform_one(self, col: str, raw: str, pre: tuple | None = None):
        """Returns (slot_index, value) or None when the field is dropped.
        ``pre`` is a 1-tuple holding an already-parsed node (from the
        vectorized fast path) so a fast-path miss never re-parses rows
        it already decoded."""
        if pre is not None:
            node = pre[0]
        else:
            try:
                node = orjson.loads(raw)
            except orjson.JSONDecodeError as e:
                raise ValueError(f"cannot parse JSON value {raw!r}") from e

        slots = self.registry[col]
        union_mode = self.config.union_previous_messages_schema

        if union_mode and self.config.probabilistic_fast_path:
            for i, known in enumerate(slots):
                try:
                    value = map_json_to_schema(known, node, self.cfg)
                    return (i, value)
                except FastPathMiss:
                    continue
                except Exception:
                    continue

        transformed = infer_json_value(node, col, self.cfg)
        if transformed is None:
            return None
        schema, value = transformed
        if not union_mode:
            # still need a slot for Arrow column typing; widen slot 0 lazily
            if not slots:
                slots.append(schema)
                return (0, value)
            try:
                unioned = union_types(
                    slots[0], schema,
                    optional_struct_fields=self.cfg.optional_struct_fields,
                )
                if unioned != slots[0]:
                    slots[0] = unioned
                    self._log_widened(col, 0)
                return (0, value)
            except SchemaUnionError:
                return self._register_new_slot(col, slots, schema, value)

        for i, known in enumerate(slots):
            try:
                unioned = union_types(
                    known, schema,
                    optional_struct_fields=self.cfg.optional_struct_fields,
                )
            except SchemaUnionError:
                continue
            if unioned != known:
                slots[i] = unioned
                self._log_widened(col, i)
            return (i, value)

        return self._register_new_slot(col, slots, schema, value)

    def _register_new_slot(self, col: str, slots: list, schema: SType, value):
        slots.append(schema)
        self._log_widened(col, len(slots) - 1)
        return (len(slots) - 1, value)

    def _log_widened(self, col: str, slot: int) -> None:
        """Widening observability: log the serialized schema every time a
        registry slot widens or a new slot registers, so operators can
        bootstrap configs from logs exactly like the reference
        (smt/DebeziumJsonDeserializer.java:240-252 logs the SchemaSerDer
        wire format on every replacement). Widening is monotone → rare."""
        logger.info(
            "expand_json schema widened column=%s slot=%d schema=%s",
            col, slot,
            orjson.dumps(stype_to_dict(self.registry[col][slot])).decode(),
        )

    # -- per-batch ----------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        for col in self.config.columns:
            if col not in batch.column_names:
                continue
            batch = self._expand_column(batch, col)
        return batch

    def _vectorized_fast_path(self, batch: pa.Table, col: str, raw: list,
                              parsed_out: list | None = None):
        """Whole-batch fast path: compiled-checker validation per parsed row
        against slot 0, then ONE ``pa.array`` build. Returns the new batch or
        None (→ authoritative row-wise path). Only valid for configs where
        ``compile_fast_checker`` mirrors ``map_json_to_schema`` exactly.

        ``parsed_out`` (len(raw) slots) receives ``(node,)`` for every row
        this pass successfully ``orjson.loads``-ed, so on a miss the
        row-wise path reuses the parse work instead of decoding the whole
        batch a second time (round-5 review finding)."""
        if not (
            self.config.union_previous_messages_schema
            and self.config.probabilistic_fast_path
            and not self.cfg.sanitize_field_names
            and not self.cfg.convert_numbers_to_double
            and not self.cfg.ignored_fields
            and self.registry[col]
        ):
            return None
        check = self._checker(col, 0)
        parsed: list = [None] * len(raw)
        for i, r in enumerate(raw):
            if r is None or r == "" or r == b"":
                continue  # dropped field → null (:60-63,:87-89)
            try:
                node = orjson.loads(r)
            except orjson.JSONDecodeError:
                return None
            if parsed_out is not None:
                parsed_out[i] = (node,)
            if node is None:
                continue
            if not check(node):
                return None
            parsed[i] = node
        at = self._arrow_type(col, 0)
        arr = None
        if pa.types.is_struct(at):
            # Build struct children directly — ~1.7x faster than
            # pa.array(list-of-dicts) and produces the identical array.
            try:
                mask = pa.array([d is None for d in parsed], type=pa.bool_())
                children = [
                    pa.array(
                        [None if d is None else d.get(f.name) for d in parsed],
                        type=f.type,
                    )
                    for f in at
                ]
                arr = pa.StructArray.from_arrays(
                    children, fields=list(at), mask=mask
                )
            except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                arr = None
        if arr is None:
            try:
                arr = pa.array(parsed, type=at)
            except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                return None
        idx = batch.column_names.index(col)
        name = col if self.config.replace_source else f"{col}_expanded"
        if self.config.replace_source:
            return batch.set_column(idx, pa.field(name, at), arr)
        return batch.append_column(pa.field(name, at), arr)

    def _expand_column(self, batch: pa.Table, col: str) -> pa.Table:
        raw = batch.column(col).to_pylist()
        n = len(raw)
        parsed_cache: list = [None] * n
        fast = self._vectorized_fast_path(batch, col, raw, parsed_cache)
        if fast is not None:
            return fast
        slot_of: list = [None] * n
        val_of: list = [None] * n
        for i, r in enumerate(raw):
            # tombstone / null / empty payloads → dropped field (:60-63,:87-89)
            if r is None or r == "" or r == b"":
                continue
            t = self._transform_one(col, r, pre=parsed_cache[i])
            if t is None:
                continue
            slot_of[i], val_of[i] = t

        slots = self.registry[col]
        # Slot 0 is ALWAYS emitted when any slot exists: the source column's
        # replacement must be present (all-null if this batch only hit other
        # slots) so block schemas stay congruent across batches.
        used = sorted(
            {s for s in slot_of if s is not None} | ({0} if slots else set())
        )
        arrays = {}
        for s in used:
            vals = [val_of[i] if slot_of[i] == s else None for i in range(n)]
            at = self._arrow_type(col, s)
            arrays[s] = pa.array(vals, type=at)
        if not arrays:
            # no record ever produced a schema: emit all-null column
            arrays = {0: pa.nulls(n, type=pa.null())}

        idx = batch.column_names.index(col)
        out = batch
        first = True
        for s, arr in sorted(arrays.items()):
            name = col if self.config.replace_source else f"{col}_expanded"
            if s > 0:
                name = f"{name}__s{s}"
            if first and self.config.replace_source:
                out = out.set_column(idx, pa.field(name, arr.type), arr)
            else:
                out = out.append_column(pa.field(name, arr.type), arr)
            first = False
        return out
