"""Outbox routing oracles (OutboxTest.java re-expressed columnar). No Ray."""

import orjson
import pyarrow as pa
import pytest

from connect_smts_ray.transforms.outbox import (
    OutboxConfig,
    OutboxError,
    TopicDescription,
    outbox_route,
)


def route(rows, **cfg):
    cols = {k: [r.get(k) for r in rows] for k in {k for r in rows for k in r}}
    batch = pa.table(cols)
    return outbox_route(batch, OutboxConfig(**cfg))


def test_partition_number_mode():
    # OutboxTest.java:78-102
    out = route(
        [{"key": "k", "partition_number": 2, "payload": '{"a":1}'}],
        topic="caregivers.matches.v1",
    )
    assert out.column("out_topic").to_pylist() == ["caregivers.matches.v1"]
    assert out.column("out_partition").to_pylist() == [2]
    assert out.column("out_payload").to_pylist() == ['{"a":1}']
    assert out.column("is_tombstone").to_pylist() == [False]


def test_partition_key_mode_murmur2():
    # OutboxTest.java:223-269 — N=3 golden partitions
    out = route(
        [
            {"key": "a", "partition_key": "some-partition-key", "payload": "{}"},
            {"key": "b", "partition_key": "another-partition-key", "payload": "{}"},
        ],
        topic="caregivers.matches.v1",
        partition_setting="partition-key",
        num_partitions=3,
    )
    assert out.column("out_partition").to_pylist() == [1, 2]
    # partition_key promoted to headers (OutboxTest.java:266)
    headers = [orjson.loads(h) for h in out.column("out_headers").to_pylist()]
    assert headers[0]["partition_key"] == "some-partition-key"


def test_topic_at_n_syntax():
    # OutboxTest.java:403-431 — "my.topic.v1@3" → topic name + partition count
    out = route(
        [{"key": "k", "partition_key": "1234-5678", "payload": "{}",
          "topic": "my.topic.v1@3"}],
        partition_setting="partition-key",
    )
    assert out.column("out_topic").to_pylist() == ["my.topic.v1"]
    assert out.column("out_partition").to_pylist() == [2]


def test_topic_prefix():
    # OutboxTest.java:467-531
    out = route(
        [{"key": "k", "partition_number": 0, "payload": "{}"}],
        topic="caregivers.matches.v1",
        topic_prefix="integration",
    )
    assert out.column("out_topic").to_pylist() == ["integration.caregivers.matches.v1"]
    out2 = route(
        [{"key": "k", "partition_number": 0, "payload": "{}",
          "topic": "my.topic.v1@3"}],
        topic_prefix="integration",
    )
    assert out2.column("out_topic").to_pylist() == ["integration.my.topic.v1"]


def test_record_topic_overrides_config():
    # OutboxTest.java:374-401
    out = route(
        [{"key": "k", "partition_number": 1, "payload": "{}",
          "topic": "my.topic.v1"}],
        topic="other.topic",
    )
    assert out.column("out_topic").to_pylist() == ["my.topic.v1"]


def test_missing_topic_raises():
    # smt/Outbox.java:113-115
    with pytest.raises(OutboxError):
        route([{"key": "k", "partition_number": 1, "payload": "{}"}])


def test_dbz_signal_passthrough():
    # OutboxTest.java:104-124
    out = route(
        [{"key": "k", "topic": "public.dbz_signal", "type": "t", "data": "d"}],
        topic="unused",
    )
    assert out.column("is_passthrough").to_pylist() == [True]
    assert out.column("out_topic").to_pylist() == ["public.dbz_signal"]


def test_heartbeat_passthrough():
    # smt/Outbox.java:85-88
    out = route(
        [{"key": "k",
          "value_schema_name": "io.debezium.connector.common.Heartbeat"}],
        topic="t",
    )
    assert out.column("is_passthrough").to_pylist() == [True]


def test_deleted_generates_tombstone():
    # OutboxTest.java:343-372
    out = route(
        [{"key": "k", "partition_number": 1, "payload": '{"x":1}',
          "__deleted": "true"}],
        topic="t",
    )
    assert out.column("is_tombstone").to_pylist() == [True]
    assert out.column("out_payload").to_pylist() == [None]
    assert out.column("out_partition").to_pylist() == [1]  # partition preserved


def test_null_payload_generates_tombstone():
    # OutboxTest.java:434-465
    out = route(
        [{"key": "k", "partition_number": 0, "payload": None,
          "__deleted": "false"}],
        topic="t",
    )
    assert out.column("is_tombstone").to_pylist() == [True]


def test_key_only_tombstone_dropped():
    # OutboxTest.java:328-341 — value_is_null marker row is filtered out
    out = route(
        [
            {"key": "k1", "partition_number": 0, "payload": "{}",
             "value_is_null": False},
            {"key": "k2", "partition_number": None, "payload": None,
             "value_is_null": True},
        ],
        topic="t",
    )
    assert out.num_rows == 1
    assert out.column("key").to_pylist() == ["k1"]


def test_headers_struct_promoted():
    # OutboxTest.java:126-149
    rows = [{"key": "k", "partition_number": 0, "payload": "{}"}]
    batch = pa.table({
        "key": ["k"],
        "partition_number": pa.array([0], type=pa.int32()),
        "payload": ["{}"],
        "headers": pa.array([{"agency_id": "123"}],
                            type=pa.struct([pa.field("agency_id", pa.string())])),
    })
    out = outbox_route(batch, OutboxConfig(topic="t"))
    assert orjson.loads(out.column("out_headers").to_pylist()[0]) == {
        "agency_id": "123"
    }


def test_headers_json_string_with_numbers_and_nulls():
    # OutboxTest.java:174-196 — numbers coerced to strings, nulls kept
    out = route(
        [{"key": "k", "partition_number": 0, "payload": "{}",
          "headers": '{"a":"x","n":12,"z":null}'}],
        topic="t",
    )
    assert orjson.loads(out.column("out_headers").to_pylist()[0]) == {
        "a": "x", "n": "12", "z": None,
    }


def test_headers_absent_is_null():
    # OutboxTest.java:198-221
    out = route(
        [{"key": "k", "partition_number": 0, "payload": "{}"}], topic="t"
    )
    assert out.column("out_headers").to_pylist() == [None]


def test_missing_partition_number_raises():
    # OutboxTest.java:300-326
    with pytest.raises(OutboxError):
        route([{"key": "k", "payload": "{}"}], topic="t")


def test_missing_partition_key_raises():
    # OutboxTest.java:271-298
    with pytest.raises(OutboxError):
        route(
            [{"key": "k", "payload": "{}"}],
            topic="t",
            partition_setting="partition-key",
            num_partitions=3,
        )


def test_missing_num_partitions_raises():
    with pytest.raises(OutboxError):
        route(
            [{"key": "k", "partition_key": "x", "payload": "{}"}],
            topic="t",
            partition_setting="partition-key",
        )


def test_topic_description_parse():
    # smt/Outbox.java:249-259
    assert TopicDescription.from_string("a@3") == TopicDescription("a", 3)
    assert TopicDescription.from_string("a") == TopicDescription("a", None)
    with pytest.raises(OutboxError):
        TopicDescription.from_string("a@3@4")


def test_invalid_partition_setting():
    with pytest.raises(OutboxError):
        OutboxConfig(topic="t", partition_setting="bogus")


def test_key_only_tombstone_derived_without_marker():
    """Without a value_is_null marker, null-value-ness is DERIVED from the
    value columns themselves (ref smt/Outbox.java:79-82): a row where
    payload AND __deleted are both null is a key-only Debezium tombstone
    (Debezium's flattening writes a non-null "true"/"false" __deleted for
    every real value) → dropped. A null payload with __deleted present is
    a tombstone-GENERATING record (:99-100), not a drop."""
    out = route(
        [
            {"key": "k1", "partition_number": 0, "payload": "{}",
             "__deleted": "false"},
            # value.payload == null, value present → emit tombstone
            {"key": "k2", "partition_number": 1, "payload": None,
             "__deleted": "false"},
            # record.value() == null → drop entirely
            {"key": "k3", "partition_number": None, "payload": None,
             "__deleted": None},
        ],
        topic="t",
    )
    assert out.column("key").to_pylist() == ["k1", "k2"]
    assert out.column("is_tombstone").to_pylist() == [False, True]


def test_key_only_tombstone_derived_fast_path():
    """Same derivation through the vectorized partition-key fast path."""
    out = route(
        [
            {"key": "k1", "partition_key": "a", "payload": "{}",
             "__deleted": "false"},
            {"key": "k3", "partition_key": "b", "payload": None,
             "__deleted": None},
        ],
        topic="t@3",
        partition_setting="partition-key",
    )
    assert out.column("key").to_pylist() == ["k1"]
