"""Declarative SMT-chain assembly — the Kafka Connect config surface.

Reference users never call transform constructors: Connect reads flat
properties (`transforms=a,b` + `transforms.<alias>.<key>=<value>`) and
builds the SMT chain itself (the `ConfigDef` surface,
`smt/DebeziumJsonDeserializer.java:41-48`). This module accepts exactly
that property shape — string values, dashed keys, ordered aliases — and
chains the engine's transforms onto a Dataset:

    props = {
        "transforms": "expand,route",
        "transforms.expand.type": "expand-json",
        "transforms.expand.columns": "props",
        "transforms.route.type": "outbox",
        "transforms.route.topic": "events.v1",
    }
    ds = build_chain(ds, props)

Unknown transform types and unknown config keys raise (ConfigDef
validation semantics). Stateful stages run as per-worker cached tasks
(`core/worker_state.stateful_task`) so the declarative surface needs no
pool-size knobs and stage resources scale with the cluster.
"""

from __future__ import annotations

import dataclasses

import pyarrow as pa

from connect_smts_ray.core.worker_state import stateful_task
from connect_smts_ray.transforms.crypto import (
    DecryptColumn,
    EncryptColumn,
    JoseConfig,
)
from connect_smts_ray.transforms.expand_json import ExpandJson, ExpandJsonConfig
from connect_smts_ray.transforms.field_mapping import (
    FieldMap,
    FieldMappingConfig,
    apply_field_mapping,
)
from connect_smts_ray.transforms.outbox import OutboxConfig, outbox_route


class ChainConfigError(ValueError):
    pass


def _coerce_config(cfg_cls, kwargs: dict):
    """Build a config dataclass from string-valued properties: dashed keys
    normalize to field names; 'true'/'false', ints and comma-lists coerce
    by the field's annotation; unknown keys raise (ConfigDef behavior)."""
    fields = {f.name: f for f in dataclasses.fields(cfg_cls)}
    out = {}
    for k, v in kwargs.items():
        name = k.replace("-", "_").replace(".", "_")
        if name not in fields:
            raise ChainConfigError(
                f"{cfg_cls.__name__}: unknown config key {k!r}"
            )
        ann = str(fields[name].type)
        if isinstance(v, str):
            if "bool" in ann:
                v = v.strip().lower() in ("true", "1", "yes")
            elif "tuple" in ann:
                v = tuple(s.strip() for s in v.split(",") if s.strip())
            elif "int" in ann:
                v = int(v)
        out[name] = v
    return cfg_cls(**out)


def _parse_field_mapping(kwargs: dict) -> FieldMappingConfig:
    """mappings: 'out=path[:cast]' comma-list; keep: comma-list."""
    keep = kwargs.pop("keep", None)
    spec = kwargs.pop("mappings", "")
    if kwargs:
        raise ChainConfigError(
            f"field-mapping: unknown config keys {sorted(kwargs)}"
        )
    maps = []
    items = spec if isinstance(spec, (list, tuple)) else [
        s for s in str(spec).split(",") if s.strip()
    ]
    for item in items:
        out_name, _, rest = str(item).strip().partition("=")
        if not rest:
            raise ChainConfigError(f"field-mapping: bad mapping {item!r}")
        path, _, cast = rest.partition(":")
        maps.append(FieldMap(
            out_name, path,
            pa.type_for_alias(cast) if cast else None,
        ))
    if isinstance(keep, str):
        keep = tuple(s.strip() for s in keep.split(",") if s.strip())
    return FieldMappingConfig(mappings=tuple(maps), keep=keep)


def _stage_expand(ds, kwargs):
    cfg = _coerce_config(ExpandJsonConfig, kwargs)
    return ds.map_batches(
        stateful_task(ExpandJson, config=cfg), batch_format="pyarrow"
    )


def _stage_decrypt(ds, kwargs):
    cfg = _coerce_config(JoseConfig, kwargs)
    return ds.map_batches(
        stateful_task(DecryptColumn, config=cfg), batch_format="pyarrow"
    )


def _stage_encrypt(ds, kwargs):
    det = kwargs.pop("deterministic", False)
    if isinstance(det, str):
        det = det.strip().lower() in ("true", "1", "yes")
    cfg = _coerce_config(JoseConfig, kwargs)
    return ds.map_batches(
        stateful_task(EncryptColumn, config=cfg, deterministic=det),
        batch_format="pyarrow",
    )


def _stage_outbox(ds, kwargs):
    cfg = _coerce_config(OutboxConfig, kwargs)
    return ds.map_batches(
        lambda b: outbox_route(b, cfg), batch_format="pyarrow"
    )


def _stage_field_mapping(ds, kwargs):
    cfg = _parse_field_mapping(dict(kwargs))
    return ds.map_batches(
        lambda b: apply_field_mapping(b, cfg), batch_format="pyarrow"
    )


STAGE_TYPES = {
    "expand-json": _stage_expand,
    "decrypt": _stage_decrypt,
    "encrypt": _stage_encrypt,
    "outbox": _stage_outbox,
    "field-mapping": _stage_field_mapping,
}


def parse_chain(props: dict) -> list:
    """[(type, kwargs)] in declared order from flat Connect-style props."""
    try:
        order = [
            a.strip() for a in str(props["transforms"]).split(",") if a.strip()
        ]
    except KeyError:
        raise ChainConfigError("missing 'transforms' ordering key")
    chain = []
    for alias in order:
        prefix = f"transforms.{alias}."
        tkey = prefix + "type"
        if tkey not in props:
            raise ChainConfigError(f"missing {tkey}")
        kind = props[tkey]
        if kind not in STAGE_TYPES:
            raise ChainConfigError(
                f"unknown transform type {kind!r} "
                f"(known: {sorted(STAGE_TYPES)})"
            )
        kwargs = {
            k[len(prefix):]: v
            for k, v in props.items()
            if k.startswith(prefix) and k != tkey
        }
        chain.append((kind, kwargs))
    return chain


def build_chain(ds, props: dict):
    """Chain the declared transforms onto ``ds`` (lazy — nothing runs
    until the Dataset is consumed)."""
    for kind, kwargs in parse_chain(props):
        ds = STAGE_TYPES[kind](ds, kwargs)
    return ds
