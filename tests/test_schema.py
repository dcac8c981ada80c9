"""Unit oracles for core/schema.py, re-expressing the reference's tests
(DebeziumJsonDeserializerTest.java, SchemaTransformerTest.java — see
docstring citations). Pure Python — no Ray."""

import orjson
import pyarrow as pa
import pytest

from connect_smts_ray.core.schema import (
    FastPathMiss,
    InferConfig,
    SchemaUnionError,
    SType,
    from_arrow,
    infer_json_value,
    infer_literal,
    map_json_to_schema,
    repackage,
    sanitize_column_name,
    stype_from_dict,
    stype_to_dict,
    to_arrow,
    union_arrow_types,
    union_types,
)

CFG = InferConfig()


def infer(payload, key="json", cfg=CFG):
    return infer_json_value(orjson.loads(payload), key, cfg)


# -- literals (DebeziumJsonDeserializerTest.java:310-311,506-550) -----------

def test_small_int_is_int32():
    s, v = infer_literal(10, CFG)
    assert s.kind == "int32" and v == 10


def test_long_is_int64():
    s, v = infer_literal(5_000_000_000, CFG)
    assert s.kind == "int64"


def test_bigint_is_float64():
    # DebeziumJsonDeserializerTest.java:332-349
    s, v = infer("{\"big_number\":190000000000000100000}")
    assert s.field_schema("big_number").kind == "float64"
    assert v["big_number"] == float(190000000000000100000)


def test_decimal_is_float64():
    s, v = infer_literal(1.5, CFG)
    assert s.kind == "float64"


def test_bool_and_string():
    assert infer_literal(True, CFG)[0].kind == "boolean"
    assert infer_literal("x", CFG)[0].kind == "string"


def test_convert_numbers_to_double():
    # DebeziumJsonDeserializerTest.java:314-330
    cfg = InferConfig(convert_numbers_to_double=True)
    s, v = infer_json_value({"temperature": 37}, "json", cfg)
    assert s.field_schema("temperature").kind == "float64"
    assert v["temperature"] == 37.0


def test_root_literals():
    # DebeziumJsonDeserializerTest.java:506-550
    assert infer("true")[0].kind == "boolean"
    assert infer("500")[0].kind == "int32"
    assert infer("\"\"")[0].kind == "string"   # empty JSON string kept, :275-286


# -- trees (DebeziumJsonDeserializerTest.java:46-295) -----------------------

def test_array_of_strings():
    s, v = infer('["foo","bar"]')
    assert s.kind == "array" and s.element.kind == "string"
    assert s.name == "json_array" and s.element.name is None
    assert v == ["foo", "bar"]


def test_json_null_dropped():
    assert infer("null") is None


def test_null_property_dropped():
    # :77-95
    s, v = infer('{"foo":"bar","baz":null}')
    assert s.field_names() == ["foo"]
    assert v == {"foo": "bar"}


def test_nested_object_naming():
    # struct name = recursion key (:69; asserted at :371)
    s, v = infer('{"a":{"b":1}}')
    inner = s.field_schema("a")
    assert inner.kind == "struct" and inner.name == "json_a"
    assert inner.field_schema("b").kind == "int32"


def test_mixed_struct():
    # :97-123
    s, v = infer('{"foo":"bar","baz":10,"plop":["a","b"]}')
    assert s.field_schema("foo").kind == "string"
    assert s.field_schema("baz").kind == "int32"
    plop = s.field_schema("plop")
    assert plop.kind == "array" and plop.element.kind == "string"
    assert plop.name == "json_plop_array"


def test_empty_array_dropped():
    # :237-248
    s, v = infer('{"field1":[{"ids":[1,2,3]},{"ids":[]}]}')
    f1 = s.field_schema("field1")
    elem = f1.element
    assert elem.kind == "struct"
    # second element's empty array was dropped → ids optional in the union
    ids = elem.field_schema("ids")
    assert ids.kind == "array" and ids.element.kind == "int32"
    assert ids.optional
    assert v == {"field1": [{"ids": [1, 2, 3]}, {}]}
    assert infer("[]") is None


def test_empty_object_is_empty_struct():
    # :250-261
    s, v = infer("{}")
    assert s.kind == "struct" and s.fields == ()
    assert v == {}


def test_array_of_structs_unified():
    # :125-140
    s, v = infer('{"field1":[{"id":1}],"field2":[{"id":2},{"id":3}]}')
    for f in ("field1", "field2"):
        fs = s.field_schema(f)
        assert fs.kind == "array"
        assert fs.element.field_schema("id").kind == "int32"
        assert fs.element.name == f"json_{f}_array_item"


def test_heterogeneous_struct_array_union():
    # :158-214 — common fields required, others optional
    payload = (
        '[{"type":"care_task","id":1,"care":"x"},'
        '{"type":"regular_task","id":2,"regular":"y"}]'
    )
    s, v = infer(payload)
    elem = s.element
    assert not elem.field_schema("type").optional
    assert not elem.field_schema("id").optional
    assert elem.field_schema("care").optional
    assert elem.field_schema("regular").optional
    # union sorts fields by name
    assert elem.field_names() == sorted(elem.field_names())


def test_mixed_primitive_array_raises():
    # :288-295
    with pytest.raises(SchemaUnionError):
        infer('["a", 12]')


def test_all_null_array_elements_empty_struct():
    s, v = infer("[null, null]")
    assert s.element.kind == "struct" and s.element.fields == ()
    assert s.element.name == "json_array_item"
    assert v == [None, None]


# -- sanitize (AvroUtils + DebeziumJsonDeserializerTest.java:351-376) -------

def test_sanitize_names():
    assert sanitize_column_name("with space") == "with_space"
    assert sanitize_column_name("1some_details") == "_1some_details"
    assert sanitize_column_name("ok_name9") == "ok_name9"
    assert sanitize_column_name("a-b.c") == "a_b_c"


def test_sanitize_in_inference():
    cfg = InferConfig(sanitize_field_names=True)
    s, v = infer_json_value(
        orjson.loads('{"with space":10,"1some_details":{"plop":true}}'), "json", cfg
    )
    assert s.field_names() == ["with_space", "_1some_details"]
    inner = s.field_schema("_1some_details")
    assert inner.name == "json__1some_details"  # asserted at :371
    assert v == {"with_space": 10, "_1some_details": {"plop": True}}


# -- ignored fields (DebeziumJsonDeserializerTest.java:755-839) -------------

def test_ignored_fields():
    cfg = InferConfig(
        ignored_fields=InferConfig.rewrite_ignored_paths(
            ["json.baz", "json.nested.again[].nay"]
        )
    )
    s, v = infer_json_value(
        orjson.loads(
            '{"foo":1,"baz":2,"nested":{"again":[{"yay":1,"nay":2}]}}'
        ),
        "json",
        cfg,
    )
    assert s.field_names() == ["foo", "nested"]
    elem = s.field_schema("nested").field_schema("again").element
    assert elem.field_names() == ["yay"]
    assert v["nested"]["again"] == [{"yay": 1}]


# -- unions (SchemaTransformerTest.java) ------------------------------------

def _struct(name=None, **fields):
    return SType("struct", name=name, fields=tuple(fields.items()))


def test_union_idempotent():
    # SchemaTransformerTest.java:15-31
    s = _struct("v", foo=SType("string"))
    assert union_types(s, s) == SType(
        "struct", name="v", fields=(("foo", SType("string")),)
    )


def test_union_nested_merge():
    # SchemaTransformerTest.java:33-56
    a = _struct("v", nested=_struct("n", foo=SType("string")))
    b = _struct("v", nested=_struct("n", bar=SType("int32")))
    u = union_types(a, b)
    nested = u.field_schema("nested")
    assert nested.field_names() == ["bar", "foo"]
    assert nested.field_schema("foo").optional
    assert nested.field_schema("bar").optional


def test_union_deterministic_order():
    # SchemaTransformerTest.java:58-82
    a = _struct("v", b=SType("string"), a=SType("string"), c=SType("string"))
    b = _struct("v", c=SType("string"), a=SType("string"), b=SType("string"))
    assert union_types(a, b) == union_types(b, a)
    assert union_types(a, b).field_names() == ["a", "b", "c"]


def test_union_missing_field_becomes_optional():
    a = _struct("v", foo=SType("string"))
    b = _struct("v", foo=SType("string"), bar=SType("int32"))
    u = union_types(a, b)
    assert not u.field_schema("foo").optional
    assert u.field_schema("bar").optional


def test_union_incompatible_kinds_raise():
    with pytest.raises(SchemaUnionError):
        union_types(SType("string"), SType("int32"))
    with pytest.raises(SchemaUnionError):
        union_types(SType("int32"), SType("int64"))  # no numeric widening


def test_union_array_element_kinds_must_match():
    a = SType("array", element=SType("string"))
    b = SType("array", element=SType("int32"))
    with pytest.raises(SchemaUnionError):
        union_types(a, b)


def test_union_optional_propagates():
    a = SType("string", optional=True)
    b = SType("string")
    assert union_types(a, b).optional
    assert union_types(b, b).optional is False


# -- repackage --------------------------------------------------------------

def test_repackage_fills_missing_fields():
    target = _struct("v", bar=SType("int32", optional=True), foo=SType("string"))
    out = repackage(target, {"foo": "x"})
    assert out == {"bar": None, "foo": "x"}


def test_repackage_list_of_structs():
    target = SType(
        "array", element=_struct("e", a=SType("int32", optional=True),
                                 b=SType("int32", optional=True))
    )
    out = repackage(target, [{"a": 1}, None, {"b": 2}])
    assert out == [{"a": 1, "b": None}, None, {"a": None, "b": 2}]


# -- fast path (SchemaMapper + DebeziumJsonDeserializerTest.java:714-753) ---

def test_fast_path_hit():
    schema = _struct("v", foo=SType("string"), baz=SType("int32", optional=True))
    assert map_json_to_schema(schema, {"foo": "x", "baz": 1}, CFG) == {
        "foo": "x", "baz": 1,
    }
    # null field skipped, optional → ok
    assert map_json_to_schema(schema, {"foo": "x", "baz": None}, CFG) == {"foo": "x"}


def test_fast_path_unknown_field_misses():
    schema = _struct("v", foo=SType("string"))
    with pytest.raises(FastPathMiss):
        map_json_to_schema(schema, {"foo": "x", "new": 1}, CFG)


def test_fast_path_wrong_literal_kind_misses():
    schema = _struct("v", foo=SType("int64"))
    with pytest.raises(FastPathMiss):
        map_json_to_schema(schema, {"foo": 1}, CFG)  # int32 literal vs int64


def test_fast_path_missing_required_field_misses():
    schema = _struct("v", foo=SType("string"))
    with pytest.raises(FastPathMiss):
        map_json_to_schema(schema, {}, CFG)


# -- arrow interop ----------------------------------------------------------

def test_to_arrow_roundtrip():
    s, v = infer('{"foo":"bar","baz":10,"plop":["a","b"],"n":{"x":1.5}}')
    at = to_arrow(s)
    arr = pa.array([v], type=at)
    assert arr[0]["foo"].as_py() == "bar"
    assert arr[0]["plop"].as_py() == ["a", "b"]
    back = from_arrow(at)
    assert back.kind == "struct"
    assert back.field_schema("n").field_schema("x").kind == "float64"


def test_union_arrow_types():
    a = pa.struct([pa.field("foo", pa.string())])
    b = pa.struct([pa.field("foo", pa.string()), pa.field("bar", pa.int32())])
    u = union_arrow_types(a, b)
    assert u == pa.struct(
        [pa.field("bar", pa.int32()), pa.field("foo", pa.string())]
    )


# -- serde (SchemaSerDer round-trip, DebeziumJsonDeserializerTest.java:552-603)

def test_serde_roundtrip():
    s, _ = infer('{"foo":"bar","nested":{"a":[1,2]},"arr":[{"x":true}]}')
    d = stype_to_dict(s)
    assert d["type"] == "STRUCT"
    assert stype_from_dict(d) == s


class TestRegistryCompatibility:
    """Schema-registry verdicts (public Confluent/Avro resolution rules)."""

    def _struct(self, *fields):
        from connect_smts_ray.core.schema import SType
        return SType("struct", fields=tuple(fields))

    def test_add_optional_field_is_full(self):
        from connect_smts_ray.core.schema import SType, compatibility
        old = self._struct(("a", SType("int64")))
        new = self._struct(("a", SType("int64")),
                           ("b", SType("string", optional=True)))
        assert compatibility(old, new) == "FULL"

    def test_add_required_field_is_forward_only(self):
        from connect_smts_ray.core.schema import SType, compatibility
        old = self._struct(("a", SType("int64")))
        new = self._struct(("a", SType("int64")), ("b", SType("string")))
        # new readers CANNOT fill required b from old data -> not backward;
        # old readers skip b -> forward
        assert compatibility(old, new) == "FORWARD"

    def test_delete_required_field_is_backward_only(self):
        from connect_smts_ray.core.schema import SType, compatibility
        old = self._struct(("a", SType("int64")), ("b", SType("string")))
        new = self._struct(("a", SType("int64")))
        assert compatibility(old, new) == "BACKWARD"

    def test_kind_change_is_none_without_promotion(self):
        from connect_smts_ray.core.schema import SType, compatibility
        old = self._struct(("a", SType("string")))
        new = self._struct(("a", SType("int64")))
        assert compatibility(old, new) == "NONE"

    def test_numeric_promotion_reads_one_way(self):
        from connect_smts_ray.core.schema import SType, can_read
        assert can_read(SType("float64"), SType("int32"))
        assert not can_read(SType("int32"), SType("float64"))
        assert can_read(SType("int64"), SType("int32"))
        assert not can_read(SType("int32"), SType("int64"))

    def test_optional_writer_needs_null_tolerant_reader(self):
        from connect_smts_ray.core.schema import SType, can_read
        assert not can_read(SType("int64"),
                            SType("int64", optional=True))
        assert can_read(SType("int64", optional=True), SType("int64"))

    def test_transitive_mode_checks_all_ancestors(self):
        from connect_smts_ray.core.schema import SType, check_compatibility
        v1 = self._struct(("a", SType("int64")), ("b", SType("string")))
        v2 = self._struct(("a", SType("int64")))
        v3 = self._struct(("a", SType("int64")),
                          ("b", SType("string", optional=True)))
        # v3 vs latest-only (v2): backward OK (b optional fills from null)
        assert check_compatibility([v1, v2], v3, "BACKWARD")
        # transitive also checks v1: still OK (optional b reads v1's b)
        assert check_compatibility([v1, v2], v3, "BACKWARD_TRANSITIVE")
        # a REQUIRED c fails against both
        v4 = self._struct(("a", SType("int64")), ("c", SType("int64")))
        assert not check_compatibility([v1, v2], v4, "BACKWARD")
        assert check_compatibility([v1, v2], v4, "NONE")

    def test_union_result_is_backward_for_both_inputs(self):
        """The engine's own evolution path (union_types with optional
        struct fields) always produces a schema that can read data
        written under either input — the property the LWW sink relies on
        when merging evolved epochs."""
        from connect_smts_ray.core.schema import (SType, can_read,
                                                  union_types)
        a = self._struct(("x", SType("int64")), ("y", SType("string")))
        b = self._struct(("x", SType("int64")), ("z", SType("float64")))
        u = union_types(a, b, optional_struct_fields=False)
        assert can_read(u, a) and can_read(u, b)
