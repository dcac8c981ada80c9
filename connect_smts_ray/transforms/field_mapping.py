"""Declarative field mapping — the engine's JSONata-style projection stage
(SURVEY §2.4; reference analog: Outbox's payload extraction + header
promotion, smt/Outbox.java:99-100,134-184).

A mapping spec is an ordered tuple of ``(output_name, path)`` where ``path``
is a dotted accessor into the batch: ``"col"`` selects a column,
``"col.a.b"`` drills into struct fields (vectorized ``pc.struct_field``,
zero-copy). Optional ``cast`` per entry. Unmatched paths yield null columns
(schema-evolution friendly: a field ExpandJson hasn't discovered yet simply
reads as null).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class FieldMap:
    out: str
    path: str
    cast: Optional[pa.DataType] = None


@dataclass(frozen=True)
class FieldMappingConfig:
    mappings: tuple = ()
    # keep=None → only mapped columns; else passthrough these then mapped
    keep: Optional[tuple] = None


def _resolve(batch: pa.Table, path: str):
    parts = path.split(".")
    if parts[0] not in batch.column_names:
        return None
    arr = batch.column(parts[0])
    for p in parts[1:]:
        typ = arr.type
        if not pa.types.is_struct(typ) or typ.get_field_index(p) < 0:
            return None
        arr = pc.struct_field(arr, p)
    return arr


def apply_field_mapping(batch: pa.Table, cfg: FieldMappingConfig) -> pa.Table:
    cols = {}
    if cfg.keep:
        for name in cfg.keep:
            if name in batch.column_names:
                cols[name] = batch.column(name)
    for m in cfg.mappings:
        arr = _resolve(batch, m.path)
        if arr is None:
            typ = m.cast or pa.null()
            arr = pa.nulls(batch.num_rows, type=typ)
        elif m.cast is not None and arr.type != m.cast:
            arr = pc.cast(arr, m.cast)
        cols[m.out] = arr
    if not cols:
        # pa.table({}) has num_rows == 0 — a vacuous config (no mappings
        # and no keep column present in the batch) would silently DELETE
        # every row of the stream; that is always a misconfiguration
        raise ValueError(
            "field mapping produced no columns (empty mappings and no "
            "keep column present in the batch) — refusing to emit a "
            "zero-row table for a non-empty input")
    return pa.table(cols)


class FieldMapping:
    """map_batches callable."""

    def __init__(self, cfg: FieldMappingConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return apply_field_mapping(batch, self.cfg)
