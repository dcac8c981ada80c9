"""Writable branches over the epoch-delta lake (Nessie/Iceberg-style
`CREATE BRANCH` re-expressed on this manifest protocol).

A branch forks the table at an epoch cut and gives writers an ISOLATED
delta log — main's readers never see branch epochs, branch readers see
(main as of the fork) + (branch deltas), and `publish_branch` fast-
forwards the branch's deltas into main as ordinary committed epochs.
Everything reuses the existing exactly-once machinery:

- **Fork is metadata.** A branch is one `_table.json` entry
  (`{"fork": epoch}`) plus a manifest/data namespace under
  `lake/_branches/{name}/` — no data is copied at creation, and the
  fork cut is vacuum-pinned exactly like a snapshot tag so the branch's
  view of main stays byte-reconstructible for the branch's lifetime.
- **Branch writes are plain upserts.** `branch_cfg()` returns an
  `UpsertConfig` rooted at the branch namespace with main's RESOLVED
  partition count copied in (recorded in the branch's own `_table.json`
  so `resolve()` agrees forever after); `run_upsert(ds, bcfg, epoch=k)`
  then commits per-partition manifests with the same atomic
  write-then-rename, idempotent-replay gate, and lineage as main.
- **Branch reads are one merge.** Per partition the read plan is main's
  `read_plan(as_of=fork)` files followed by the branch's own plan;
  `merge_tables` LWW-resolves them — branch events carry later
  `(commit_lsn, source_offset)` than anything at the fork, so updates
  and tombstones written on the branch win exactly as they would have
  on main.
- **Publish is a fast-forward.** Branch epoch k maps to main epoch
  `fork + 1 + rank(k)` (one global mapping over the union of branch
  epochs, so cross-partition epoch alignment — and therefore main's
  time travel — stays coherent). Each mapped commit goes through
  `ManifestStore.commit`, which is idempotent, so a publish that
  crashes midway re-runs to completion without double-applying.
  Publishing requires main's head to still be at the fork
  (`require_fast_forward` — a diverged main raises instead of silently
  interleaving logs); the branch entry is removed only after every
  partition's every epoch is committed.

Published epochs enter main as raw deltas (no compaction is triggered —
compaction belongs to `merge_partition`'s deterministic schedule and
will fold them into the next due base); merge-on-read semantics make
that purely a read-amplification question, never a correctness one.

Reference analog: none (engine capability beyond the reference's
surface; the reference delegates environments/promotion to Kafka
Connect deployments).
"""

from __future__ import annotations

import dataclasses
import os
import re

import pyarrow.parquet as pq

from connect_smts_ray.sinks.manifest import ManifestStore
from connect_smts_ray.sinks.upsert import UpsertConfig


def _branch_dir(lake_dir: str, name: str) -> str:
    return os.path.join(lake_dir, "_branches", name)


_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def _check_name(name: str) -> None:
    """Branch names become DIRECTORY names under lake/_branches — '.',
    '..' or any path separator would alias the namespace into the lake
    itself (and gc would then rmtree the lake), so validation is a
    strict allowlist, not a denylist."""
    if (not name or name in (".", "..") or not _NAME_RE.match(name)
            or os.sep in name or (os.altsep and os.altsep in name)):
        raise ValueError(f"invalid branch name {name!r}")


def create_branch(cfg: UpsertConfig, name: str,
                  at: int | None = None) -> dict:
    """Fork the table at epoch ``at`` (default: current head). Same
    naming/horizon/idempotence rules as ``create_tag``: re-creating the
    identical fork is a no-op, a different fork for an existing name
    raises, and forking below the vacuum horizon raises. A stale
    namespace left by an earlier delete/publish of the same name is
    PURGED first — otherwise the abandoned epochs' manifests would make
    the new branch's own epoch-0 commit an idempotent no-op and
    resurrect the abandoned rows."""
    _check_name(name)
    cfg = cfg.resolve()
    store = cfg.store()
    meta = store.read_table_meta() or {}
    if at is None:
        from connect_smts_ray.sinks.manifest import head_epoch

        at = head_epoch(store)
    from connect_smts_ray.sinks.manifest import check_cut_above_horizon

    check_cut_above_horizon(meta, at, "fork")
    bdir = _branch_dir(cfg.lake_dir, name)

    def mutate(m: dict) -> None:
        from connect_smts_ray.sinks.manifest import check_cut_above_horizon

        check_cut_above_horizon(m, at, "fork")  # re-check under the lock
        branches = dict(m.get("branches", {}))
        prev = branches.get(name)
        if prev is not None and int(prev["fork"]) != int(at):
            raise ValueError(
                f"branch {name!r} already forked at {prev['fork']}")
        if prev is None and os.path.isdir(bdir):
            # dead namespace from a deleted/published predecessor
            import shutil

            shutil.rmtree(bdir, ignore_errors=True)
        branches[name] = {"fork": int(at)}
        m["branches"] = branches

    store.mutate_table_meta(mutate)
    # the branch namespace records the parent's RESOLVED partition count
    # so branch-side resolve() routes identically even if constructed
    # from a stale config later
    bstore = ManifestStore(bdir)
    bmeta = bstore.read_table_meta() or {}
    bmeta.setdefault("num_partitions", cfg.num_partitions)
    bmeta.setdefault("fork", int(at))
    bstore.write_table_meta(bmeta)
    return {"fork": int(at)}


def list_branches(cfg: UpsertConfig) -> dict:
    return dict(
        (cfg.store().read_table_meta() or {}).get("branches", {}))


def _fork_of(cfg: UpsertConfig, name: str) -> int:
    branches = list_branches(cfg)
    if name not in branches:
        raise KeyError(f"unknown branch {name!r}")
    return int(branches[name]["fork"])


def branch_cfg(cfg: UpsertConfig, name: str) -> UpsertConfig:
    """The UpsertConfig branch writers pass to ``run_upsert``: same key /
    order / tombstone semantics, manifest+data namespace under the
    branch dir, partition count pinned to main's resolved value.

    ``compact_every`` is pinned to 0 (pure delta log): a branch-side
    base would be compacted WITHOUT main's pre-fork files, so its
    drop-tombstones pass would erase deletions the branch made against
    pre-fork keys — read_branch would resurrect them and publish (which
    copies deltas, tombstones intact) would disagree with the branch
    preview. Branch logs are short-lived; compaction happens on main
    after publish."""
    cfg = cfg.resolve()
    _fork_of(cfg, name)  # existence check
    return dataclasses.replace(
        cfg, lake_dir=_branch_dir(cfg.lake_dir, name), compact_every=0)


def _branch_read_plans(cfg: UpsertConfig, name: str) -> list:
    """Per-partition ordered file lists whose merge IS the branch state:
    main's plan at ``as_of=fork`` followed by EVERY branch delta.

    The branch side deliberately reads raw deltas, never a branch base:
    a base compacted from branch deltas alone drops tombstones without
    main's pre-fork files underneath, resurrecting keys the branch
    deleted (``branch_cfg`` pins ``compact_every=0`` so no such base
    forms; reading deltas directly also stays correct for any namespace
    an older layout left behind — branch deltas are never vacuumed)."""
    fork = _fork_of(cfg, name)
    store = cfg.store()
    bstore = ManifestStore(_branch_dir(cfg.lake_dir, name))
    plans = []
    index = store.manifest_index()
    bindex = bstore.manifest_index()
    pids = sorted(set(index["deltas"]) | set(index["bases"])
                  | set(bindex["deltas"]))
    for pid in pids:
        files = []
        base, deltas = store.read_plan(pid, as_of=fork, index=index)
        if base is not None:
            files.append(store.base_path(pid, base))
        files.extend(store.state_path(pid, e) for e in deltas)
        files.extend(bstore.state_path(pid, e)
                     for e in bindex["deltas"].get(pid, []))
        if files:
            plans.append({"pid": pid, "files": files})
    return plans


def read_branch(cfg: UpsertConfig, name: str):
    """Branch state = LWW merge of (main as of the fork) + (branch
    deltas): per partition, one ``merge_tables`` over the plan — branch
    rows win per key by their later (commit_lsn, source_offset), the
    same order rule every other read uses. Driver-side convenience
    (mirrors ``read_lake``); ``read_branch_ds`` is the distributed
    per-partition-task path."""
    import pyarrow as pa

    from connect_smts_ray.sinks.upsert import _align_schemas, merge_tables

    cfg = cfg.resolve()
    parts = [
        merge_tables([pq.read_table(f) for f in plan["files"]], cfg)
        for plan in _branch_read_plans(cfg, name)
    ]
    if not parts:
        return pa.table({})
    return pa.concat_tables(_align_schemas(parts))


def read_branch_ds(cfg: UpsertConfig, name: str):
    """Distributed branch read: one merge task per partition over the
    same plan ``read_branch`` uses — identical shape (and scaling story)
    to ``upsert.read_lake_ds``; partitions are independent, so read
    parallelism is the partition count and no node holds more than one
    partition's state."""
    import pyarrow as pa
    import ray.data

    from connect_smts_ray.sinks.upsert import _align_schemas, merge_tables

    cfg = cfg.resolve()
    plans = _branch_read_plans(cfg, name)
    if not plans:
        return ray.data.from_items([])

    def merge_batch(b: pa.Table) -> pa.Table:
        outs = []
        for row in b.to_pylist():
            tables = [pq.read_table(f) for f in row["files"]]
            outs.append(merge_tables(tables, cfg))
        return pa.concat_tables(_align_schemas(outs))

    # batch_size=1 → exactly one merge task per partition
    return ray.data.from_items(plans).map_batches(
        merge_batch, batch_size=1, batch_format="pyarrow")


def publish_branch(cfg: UpsertConfig, name: str,
                   require_fast_forward: bool = True) -> dict:
    """Fast-forward the branch's deltas into main and delete the branch.

    Branch epoch k (within the sorted union of the branch's committed
    epochs) becomes main epoch ``fork + 1 + rank(k)`` — a deterministic
    mapping, so a crashed publish re-runs idempotently: every
    ``ManifestStore.commit`` below is a no-op where the manifest already
    exists. With ``require_fast_forward`` (default) main must not have
    committed any epoch past the fork; set it False only when the caller
    KNOWS interleaving is safe (LWW keeps the table state deterministic,
    but main's epoch history would no longer read as a linear log).
    Either way a target epoch already held by a FOREIGN manifest (one
    this publish did not write) raises instead of skipping — a skip
    there would silently discard the branch delta and then delete the
    branch, losing the data permanently.

    Delta bytes are file-copied, never decoded: the branch delta file is
    immutable and already exactly the parquet the main epoch needs, so
    publish is metadata + copy, not a table pipeline through the driver.

    Returns {"published_epochs": N, "base_epoch": fork}."""
    cfg = cfg.resolve()
    fork = _fork_of(cfg, name)
    store = cfg.store()
    bstore = ManifestStore(_branch_dir(cfg.lake_dir, name))
    bmeta = bstore.read_table_meta() or {}
    if int(bmeta.get("num_partitions", cfg.num_partitions)) != cfg.num_partitions:
        raise ValueError(
            "main's partition count changed since the fork — "
            "republish requires matching routing")
    if require_fast_forward:
        for pid in store.all_partitions():
            for e in store.committed_epochs(pid):
                if e <= fork:
                    continue
                # an epoch past the fork is divergence UNLESS it is this
                # branch's own partial publish (crashed first attempt —
                # the retry must resume through it, not refuse)
                man = store.read_manifest(pid, e) or {}
                if man.get("published_from") != name:
                    raise ValueError(
                        f"main advanced past the fork (partition {pid} "
                        f"committed epoch {e}) — not a fast-forward")
    bindex = bstore.manifest_index()["deltas"]
    branch_epochs = sorted({e for es in bindex.values() for e in es})
    rank = {e: i for i, e in enumerate(branch_epochs)}
    published = 0
    import shutil

    for pid in sorted(bindex):
        for e in bindex[pid]:
            target = fork + 1 + rank[e]
            existing = store.read_manifest(pid, target)
            if existing is not None:
                if (existing.get("published_from") == name
                        and existing.get("branch_epoch") == e):
                    continue  # crashed-publish retry: already landed
                raise ValueError(
                    f"target epoch {target} of partition {pid} is held "
                    f"by a foreign manifest — refusing to drop branch "
                    f"epoch {e}; the branch is preserved")
            src = bstore.state_path(pid, e)
            bman = bstore.read_manifest(pid, e) or {}
            store.commit(
                pid, target,
                lambda tmp, _s=src: shutil.copyfile(_s, tmp),
                lineage={
                    "rows_in": bman.get("rows_in", 0),
                    "rows_merged": bman.get("rows_merged", 0),
                    "deletes_applied": bman.get("deletes_applied", 0),
                    "offset_range": bman.get("offset_range"),
                    "num_partitions": cfg.num_partitions,
                    "key_columns": list(cfg.key_columns),
                    "published_from": name,
                    "branch_epoch": e,
                },
            )
            published += 1
    # branch entry removed ONLY after every commit is durable — a crash
    # before this point re-runs publish; after it, the branch is gone
    # and its fork pin is released
    def drop(m: dict) -> None:
        branches = dict(m.get("branches", {}))
        branches.pop(name, None)
        m["branches"] = branches

    store.mutate_table_meta(drop)
    return {"published_epochs": len(branch_epochs), "base_epoch": fork,
            "commits": published}


def delete_branch(cfg: UpsertConfig, name: str) -> bool:
    """Drop a branch WITHOUT publishing (abandon its deltas). The
    namespace directory is left for ``gc_branch_namespaces`` (same
    philosophy as vacuum: metadata first, file GC explicit)."""
    store = cfg.resolve().store()
    existed = []

    def mutate(m: dict) -> None:
        branches = dict(m.get("branches", {}))
        existed.append(branches.pop(name, None) is not None)
        m["branches"] = branches

    store.mutate_table_meta(mutate)
    return existed[0]


def gc_branch_namespaces(cfg: UpsertConfig) -> list:
    """Reclaim the namespace directories of branches no longer in the
    table meta (published or deleted). Safe by construction: the meta
    entry is removed ONLY after a publish has durably committed every
    epoch into main (or on explicit delete), so nothing references these
    files. Returns the names removed."""
    import shutil

    cfg = cfg.resolve()
    root = os.path.join(cfg.lake_dir, "_branches")
    if not os.path.isdir(root):
        return []
    live = set(list_branches(cfg))
    removed = []
    for name in sorted(os.listdir(root)):
        if name not in live:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            removed.append(name)
    return removed
