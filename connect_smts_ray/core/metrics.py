"""Per-partition replay lineage as Ray metrics (north-star contract:
"per-partition lineage (source offsets, rows merged, bytes written) is
emitted as Ray Data metrics").

The lineage TABLES returned by the sink stay the exact, queryable record
(they are what tests and the resume protocol read); this module
additionally pushes the same numbers through ``ray.util.metrics`` so a
real cluster's Prometheus endpoint / Ray dashboard sees live
per-partition ingest telemetry without touching the lake. Emission is
best-effort by design: a metrics failure (no Ray worker context, agent
down, exporter disabled — all normal in unit tests) must NEVER fail a
merge that has already durably committed its manifest.

Metric instances are cached per worker process (`ray.util.metrics`
objects are cheap but not free to construct; merge tasks run many times
per worker). Tag cardinality is bounded by ``num_partitions`` — the
fixed partition count of the lake layout, not data volume.
"""

from __future__ import annotations

_cache: dict = {}


def _metric(kind_name: str, name: str, description: str):
    m = _cache.get(name)
    if m is None:
        from ray.util import metrics

        kind = getattr(metrics, kind_name)
        m = kind(name, description=description, tag_keys=("partition_id",))
        _cache[name] = m
    return m


def emit_merge_lineage(manifest: dict, skipped: bool) -> None:
    """Push one committed (or replay-skipped) epoch's lineage counters.

    Called from ``sinks/upsert.merge_partition`` after the manifest is
    durable — so the metrics are an at-least-once VIEW of an exactly-once
    commit stream (a task retry after commit re-emits under the skipped
    counter, never double-counts rows/bytes)."""
    try:
        tags = {"partition_id": str(manifest["partition_id"])}
        if skipped:
            _metric("Counter", "csr_replay_epochs_skipped",
                    "epoch replays skipped by the idempotence gate").inc(
                        1, tags)
            return
        _metric("Counter", "csr_replay_epochs_committed",
                "epoch manifests committed").inc(1, tags)
        for key, mname, desc in (
            ("rows_in", "csr_replay_rows_in",
             "source change events routed to this partition"),
            ("rows_merged", "csr_replay_rows_merged",
             "live LWW winners written this epoch"),
            ("deletes_applied", "csr_replay_deletes_applied",
             "tombstone winners this epoch"),
            ("bytes_written", "csr_replay_bytes_written",
             "delta parquet bytes committed"),
        ):
            v = manifest.get(key) or 0
            if v > 0:  # Counter.inc requires a positive value
                _metric("Counter", mname, desc).inc(v, tags)
        max_off = (manifest.get("offset_range") or [None, None])[1]
        if max_off is not None:
            _metric("Gauge", "csr_replay_max_source_offset",
                    "highest source offset merged").set(max_off, tags)
    except Exception:  # noqa: BLE001 — telemetry must never fail the sink
        pass
