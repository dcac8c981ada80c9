"""connect_smts_ray — a Ray-Data-native CDC ingest engine.

A from-scratch rebuild of the *semantics* of birdiecare/connect-smts
(Kafka Connect SMTs: DebeziumJsonDeserializer / Jose decrypt / Outbox)
as zero-copy Arrow ``map_batches`` stages over ``ray.data.Dataset``,
plus the engine around them: deterministic binlog replay source,
key-partitioned last-write-wins upsert sink, exactly-once manifests,
checkpoint resume and per-partition lineage.

Nothing here imports from the reference; file:line citations in
docstrings point at ``/root/reference`` for behavioral parity only.
"""

__version__ = "0.1.0"
