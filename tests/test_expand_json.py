"""ExpandJson batch-transform oracles (DebeziumJsonDeserializerTest.java
re-expressed columnar). Operates on pa.Table batches directly — no Ray."""

import pyarrow as pa
import pytest

from connect_smts_ray.core.schema import stype_to_dict, SType
from connect_smts_ray.transforms.expand_json import ExpandJson, ExpandJsonConfig


def make_batch(payloads, ids=None):
    ids = ids or [str(i) for i in range(len(payloads))]
    return pa.table({"id": pa.array(ids), "json": pa.array(payloads, type=pa.string())})


def expand(payloads, **cfg_kwargs):
    cfg_kwargs.setdefault("columns", ("json",))
    t = ExpandJson(ExpandJsonConfig(**cfg_kwargs))
    return t, t(make_batch(payloads))


def test_array_of_strings():
    # DebeziumJsonDeserializerTest.java:46-60
    _, out = expand(['["foo","bar"]'])
    assert out.column("json").to_pylist() == [["foo", "bar"]]
    assert out.schema.field("json").type == pa.list_(pa.string())


def test_null_and_empty_payloads_are_null():
    # :62-75, :263-273 — dropped field ≙ null cell
    _, out = expand([None, "", '{"foo":"bar"}'])
    assert out.column("json").to_pylist() == [None, None, {"foo": "bar"}]


def test_empty_json_string_literal_kept():
    # :275-286
    _, out = expand(['"\\""' if False else '""'])
    # '""' is a JSON empty-string literal → STRING kept
    assert out.schema.field("json").type == pa.string()
    assert out.column("json").to_pylist() == [""]


def test_struct_with_nested_array():
    # :97-123
    _, out = expand(['{"foo":"bar","baz":10,"plop":["a","b"]}'])
    row = out.column("json").to_pylist()[0]
    assert row == {"foo": "bar", "baz": 10, "plop": ["a", "b"]}


def test_cross_record_union_evolution():
    # :449-489 — {"foo"} then {"bar"} then both: one widened schema
    t, out = expand(['{"foo":"a"}', '{"bar":1}', '{"foo":"b","bar":2}'])
    assert len(t.registry["json"]) == 1
    widened = t.registry["json"][0]
    assert widened.field_names() == ["bar", "foo"]
    assert all(f.optional for _, f in widened.fields)
    vals = out.column("json").to_pylist()
    assert vals[0] == {"bar": None, "foo": "a"}
    assert vals[1] == {"bar": 1, "foo": None}
    assert vals[2] == {"bar": 2, "foo": "b"}


def test_incompatible_schemas_get_separate_slots():
    # :605-649 — string vs array → two slots, two output columns
    t, out = expand(['{"foo":"x"}', '{"foo":["y"]}'])
    assert len(t.registry["json"]) == 2
    assert "json__s1" in out.column_names
    v0 = out.column("json").to_pylist()
    v1 = out.column("json__s1").to_pylist()
    assert v0 == [{"foo": "x"}, None]
    assert v1 == [None, {"foo": ["y"]}]


def test_fast_path_no_widening():
    # :714-753 — second identical-shape record maps via fast path
    t, _ = expand(['{"foo":"a"}', '{"foo":"b"}'])
    assert len(t.registry["json"]) == 1
    assert t.registry["json"][0].field_names() == ["foo"]


def test_fast_path_falls_back_on_new_field():
    t, out = expand(['{"foo":"a"}'])
    out2 = t(make_batch(['{"foo":"b","bar":1}']))
    widened = t.registry["json"][0]
    assert widened.field_names() == ["bar", "foo"]
    assert out2.column("json").to_pylist() == [{"bar": 1, "foo": "b"}]


def test_root_literals_get_slots_per_type():
    # :506-550
    t, out = expand(["true", "500", "false", "1000"])
    kinds = [s.kind for s in t.registry["json"]]
    assert kinds == ["boolean", "int32"]
    assert out.column("json").to_pylist() == [True, None, False, None]
    assert out.column("json__s1").to_pylist() == [None, 500, None, 1000]


def test_ignored_fields_pruned():
    # :755-778
    _, out = expand(
        ['{"foo":1,"baz":2}'],
        ignored_fields=("json.baz",),
    )
    assert out.column("json").to_pylist() == [{"foo": 1}]


def test_sanitize_field_names():
    # :351-376
    _, out = expand(
        ['{"with space":10,"1some_details":{"plop":true}}'],
        sanitize_field_names=True,
    )
    row = out.column("json").to_pylist()[0]
    assert row == {"with_space": 10, "_1some_details": {"plop": True}}


def test_bigint_to_double():
    # :332-349
    _, out = expand(['{"big_number":190000000000000100000}'])
    assert out.schema.field("json").type == pa.struct(
        [pa.field("big_number", pa.float64())]
    )


def test_convert_numbers_to_double():
    # :314-330
    _, out = expand(['{"temperature":37}'], convert_numbers_to_double=True)
    assert out.schema.field("json").type.field("temperature").type == pa.float64()


def test_unparseable_json_raises():
    # :188-193
    with pytest.raises(ValueError):
        expand(["{not json"])


def test_bootstrap_schema_used():
    # union-previous-messages-schema.topic.{t}.field.{f} analog (:134-162)
    boot = SType(
        "struct",
        name="json",
        fields=(
            ("bar", SType("int32", optional=True)),
            ("foo", SType("string", optional=True)),
        ),
    )
    t, out = expand(
        ['{"foo":"a"}'],
        bootstrap_schemas={"json": [stype_to_dict(boot)]},
    )
    # fast path hits the bootstrap schema: no widening, full field set present
    assert t.registry["json"][0] == boot
    assert out.column("json").to_pylist() == [{"bar": None, "foo": "a"}]


def test_passthrough_columns_untouched():
    _, out = expand(['{"a":1}'])
    assert out.column("id").to_pylist() == ["0"]


def test_heterogeneous_batch_then_convergence():
    # actors converge: second batch reuses widened schema (fast path)
    t = ExpandJson(ExpandJsonConfig(columns=("json",)))
    t(make_batch(['{"a":1}', '{"b":"x"}']))
    out2 = t(make_batch(['{"a":2,"b":"y"}']))
    assert out2.column("json").to_pylist() == [{"a": 2, "b": "y"}]
    assert len(t.registry["json"]) == 1


def test_null_field_deviation_is_deliberate():
    """PINNED DEVIATION vs the reference (deliberate, documented in
    transforms/expand_json.py module docstring):

    - Reference: a null / empty-string JSON payload drops the field FROM
      THE RECORD'S SCHEMA entirely — `assertNull(schema.field("json"))`
      (DebeziumJsonDeserializerTest.java:62-75 ignoresANullValue,
      :263-273 ignoresEmptyJsonValue). Kafka Connect can do this because
      every record carries its own schema.
    - This engine: Arrow batches have ONE schema for all rows, so a
      per-record dropped field is unrepresentable; the column stays in the
      batch schema and the affected row reads as a null cell. Dropping the
      column would also break downstream stages that select it.

    Same divergence applies within nested structs (:77-95
    ignoresANullValueWithinProperty): the reference drops `baz` from the
    struct schema; we keep the struct field as optional with a null value
    when other rows carry it, and the inference itself never ADDS a field
    only seen as null (matching the reference's pruning)."""
    # top level: column must EXIST in the output schema (Arrow invariant),
    # value must be null (reference: field absent)
    t, out = expand([None, ""])
    assert "json" in out.schema.names
    assert out.column("json").to_pylist() == [None, None]

    # nested: {"foo":"bar","baz":null} — inference DROPS baz like the
    # reference (no row ever carries a typed baz, so no column slot exists)
    t2, out2 = expand(['{"foo": "bar", "baz": null}'])
    assert out2.column("json").to_pylist() == [{"foo": "bar"}]
    struct_t = out2.schema.field("json").type
    assert struct_t.get_field_index("baz") == -1
