"""Write-Audit-Publish: an audit gate between ingestion and visibility.

The lakehouse WAP pattern (Iceberg's `write.wap.enabled`, Databricks'
staging-branch merge): never let an epoch become readable until a data
quality audit over the STAGED result passes. The engine analog:

1. WRITE — the epoch is upserted into a STAGING lake (its own
   `ManifestStore` directory, same partitioner/key/order config), using
   the exact same exactly-once commit protocol as a production write.
   A crashed stage re-runs idempotently.
2. AUDIT — `audit_fn(staged_state_ds) -> (ok, report)` runs over the
   staged partition states as a Dataset (distributed merge-on-read, the
   same read the main lake would serve). The audit sees EXACTLY what
   readers would see if published.
3. PUBLISH — only on a passing audit: each staged delta file is
   committed into the MAIN lake through `ManifestStore.commit`, which is
   idempotent and atomic per partition — a crash mid-publish resumes by
   re-running `publish` (already-committed partitions skip; the staged
   bytes are immutable so every retry writes identical data). A
   publish marker records the passed audit so resumes do not re-audit.

A failed audit leaves the MAIN lake bit-identical to before (nothing of
the epoch exists outside the staging directory); the staged data stays
for inspection and can be re-audited after a fix or discarded.

Scale notes: stage and audit are full Dataset pipelines; publish moves
one delta file per touched partition (bounded by P), no data transform.

Reference analog: none (lakehouse-side extension of SURVEY §2.4's
exactly-once sink).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from connect_smts_ray.sinks.upsert import (
    UpsertConfig,
    _maybe_compact,
    read_lake_ds,
    run_upsert,
)


def _staging_cfg(main_cfg: UpsertConfig, epoch: int,
                 staging_dir: str | None) -> UpsertConfig:
    import dataclasses

    return dataclasses.replace(
        main_cfg,
        lake_dir=staging_dir
        or os.path.join(main_cfg.lake_dir, f"_staging-epoch={epoch}"),
        compact_every=0,  # staging holds ONE epoch; never compacts
    )


def _marker_path(main_cfg: UpsertConfig, epoch: int) -> str:
    return os.path.join(main_cfg.lake_dir, f"_wap-publish-{epoch}.json")


def stage_epoch(source_ds, main_cfg: UpsertConfig, epoch: int,
                staging_dir: str | None = None) -> UpsertConfig:
    """WRITE: upsert the epoch into the staging lake (idempotent);
    returns the staging config for audit/publish."""
    scfg = _staging_cfg(main_cfg.resolve(), epoch, staging_dir)
    run_upsert(source_ds, scfg, epoch=epoch).materialize()
    return scfg


def audit_and_publish(main_cfg: UpsertConfig, scfg: UpsertConfig,
                      epoch: int, audit_fn) -> dict:
    """AUDIT the staged state; PUBLISH into the main lake iff it passes.

    Returns ``{"published": bool, "partitions": n, "report": ...}``.
    Idempotent: a crash mid-publish resumes (committed partitions skip);
    a recorded passing audit is not re-run."""
    import pyarrow.parquet as pq

    main_cfg = main_cfg.resolve()
    main_store = main_cfg.store()
    sstore = scfg.store()

    marker = _marker_path(main_cfg, epoch)
    if os.path.exists(marker):
        with open(marker) as f:
            report = json.load(f)
    else:
        ok, report = audit_fn(read_lake_ds(scfg))
        if not ok:
            return {"published": False, "partitions": 0, "report": report}
        os.makedirs(main_cfg.lake_dir, exist_ok=True)
        tmp = f"{marker}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(report, f)
        os.replace(tmp, marker)

    published = 0
    for pid in sstore.all_partitions():
        manifest = sstore.read_manifest(pid, epoch)
        if manifest is None:
            continue
        src = sstore.state_path(pid, epoch)
        lineage = {k: manifest[k] for k in
                   ("rows_in", "rows_shuffled", "rows_merged",
                    "deletes_applied", "offset_range") if k in manifest}
        main_store.commit(
            pid, epoch, lambda tmp_path: shutil.copyfile(src, tmp_path),
            lineage)
        # the main lake's deterministic compaction trigger still applies
        # to published epochs (merge_partition would have run it)
        _maybe_compact(main_store, main_cfg, pid, epoch)
        published += 1
    return {"published": True, "partitions": published, "report": report}


def wap_write(source_ds, main_cfg: UpsertConfig, epoch: int, audit_fn,
              staging_dir: str | None = None) -> dict:
    """The full Write-Audit-Publish sequence for one epoch."""
    scfg = stage_epoch(source_ds, main_cfg, epoch, staging_dir)
    return audit_and_publish(main_cfg, scfg, epoch, audit_fn)
