"""Exactly-once per-partition manifest commits (SURVEY §4.2.3).

Layout::

    {lake_dir}/
      partition={pid}/state-epoch={e}.parquet   # full merged partition state
      _manifests/{pid}-{e}.json                 # commit record + lineage

A ``(partition_id, epoch)`` write is committed iff its manifest file exists.
Writes go to a unique tmp path then ``os.replace`` (atomic on POSIX); the
manifest is renamed into place last. Replaying a committed epoch is a no-op
(idempotent under Ray task retries, which are at-least-once). The final
table state is a pure function of the set of committed manifests, so replay
from any checkpoint reconverges to the identical table.

Lineage per manifest: source-offset range, rows merged, bytes written,
serialized Arrow schema (the monotonically union-widened table schema —
mirrors the reference's logged serialized schemas,
smt/DebeziumJsonDeserializer.java:240-252).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class ManifestStore:
    lake_dir: str

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.lake_dir, "_manifests")

    def partition_dir(self, pid: int) -> str:
        return os.path.join(self.lake_dir, f"partition={pid}")

    def state_path(self, pid: int, epoch: int) -> str:
        """Per-epoch DELTA file: only that epoch's LWW winners (tombstones
        included — merge-on-read applies them), NOT the full partition
        state. Epoch N+1 never rewrites epoch N's bytes."""
        return os.path.join(self.partition_dir(pid), f"delta-epoch={epoch}.parquet")

    def base_path(self, pid: int, epoch: int) -> str:
        """Compacted base file: merged live state of every epoch ≤ epoch
        (tombstoned keys dropped — safe because per-key commit_lsn is
        non-decreasing across epochs)."""
        return os.path.join(self.partition_dir(pid), f"base-epoch={epoch}.parquet")

    def manifest_path(self, pid: int, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"{pid}-{epoch}.json")

    def base_manifest_path(self, pid: int, epoch: int) -> str:
        # 'base-' infix makes committed_epochs()'s int() parse skip these
        return os.path.join(self.manifest_dir, f"{pid}-base-{epoch}.json")

    def table_meta_path(self) -> str:
        return os.path.join(self.lake_dir, "_table.json")

    def read_table_meta(self) -> Optional[dict]:
        """Table-level metadata (authoritative ``num_partitions`` after a
        partition split; absent for never-split tables)."""
        try:
            with open(self.table_meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def write_table_meta(self, meta: dict) -> None:
        os.makedirs(self.lake_dir, exist_ok=True)
        tmp = f"{self.table_meta_path()}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.table_meta_path())

    def mutate_table_meta(self, fn) -> dict:
        """Serialized read-modify-write of ``_table.json``: ``fn(meta)``
        mutates (or returns) the dict under an EXCLUSIVE advisory lock,
        then the result replaces the file atomically.

        Every meta mutation (tags, branches, vacuum horizons, table
        schema recording) must go through here — the CLI exposes those
        as independent ``ray job submit`` commands, and an unlocked
        read-modify-replace would let one job's write erase another's
        (e.g. vacuum dropping a tag created mid-scan, unpinning its
        epochs). flock serializes same-host writers (this sandbox and
        single-node Ray); a shared-nothing object store deployment would
        swap this for its CAS primitive — the call sites don't change."""
        import fcntl

        os.makedirs(self.lake_dir, exist_ok=True)
        lock_path = self.table_meta_path() + ".lock"
        with open(lock_path, "w") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                meta = self.read_table_meta() or {}
                out = fn(meta)
                meta = meta if out is None else out
                self.write_table_meta(meta)
                return meta
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    # -- commit protocol ----------------------------------------------------

    def is_committed(self, pid: int, epoch: int) -> bool:
        return os.path.exists(self.manifest_path(pid, epoch))

    def read_manifest(self, pid: int, epoch: int) -> Optional[dict]:
        try:
            with open(self.manifest_path(pid, epoch)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def commit(self, pid: int, epoch: int, write_table, lineage: dict) -> dict:
        """Atomically write partition state + manifest; idempotent.

        ``write_table(tmp_path)`` must write the parquet data to tmp_path.
        Returns the manifest dict (existing one if already committed).
        """
        existing = self.read_manifest(pid, epoch)
        if existing is not None:
            return existing

        os.makedirs(self.partition_dir(pid), exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

        final = self.state_path(pid, epoch)
        tmp = f"{final}.tmp-{uuid.uuid4().hex}"
        write_table(tmp)
        bytes_written = os.path.getsize(tmp)
        os.replace(tmp, final)

        manifest = {
            "partition_id": pid,
            "epoch": epoch,
            "state_file": final,
            "bytes_written": bytes_written,
            **lineage,
        }
        mtmp = f"{self.manifest_path(pid, epoch)}.tmp-{uuid.uuid4().hex}"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, self.manifest_path(pid, epoch))
        return manifest

    def commit_base(self, pid: int, epoch: int, write_table,
                    lineage: dict) -> dict:
        """Atomically commit a compacted base covering epochs ≤ epoch.
        Idempotent: a concurrent/replayed compaction computes the identical
        table (pure function of the committed deltas) and the second
        os.replace is a no-op at the manifest level."""
        existing = self.read_base_manifest(pid, epoch)
        if existing is not None:
            return existing
        os.makedirs(self.partition_dir(pid), exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)
        final = self.base_path(pid, epoch)
        tmp = f"{final}.tmp-{uuid.uuid4().hex}"
        write_table(tmp)
        bytes_written = os.path.getsize(tmp)
        os.replace(tmp, final)
        manifest = {
            "partition_id": pid,
            "epoch": epoch,
            "kind": "base",
            "state_file": final,
            "bytes_written": bytes_written,
            **lineage,
        }
        mpath = self.base_manifest_path(pid, epoch)
        mtmp = f"{mpath}.tmp-{uuid.uuid4().hex}"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, mpath)
        return manifest

    def read_base_manifest(self, pid: int, epoch: int) -> Optional[dict]:
        try:
            with open(self.base_manifest_path(pid, epoch)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # -- read side ----------------------------------------------------------

    def committed_base_epochs(self, pid: int) -> list:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        prefix = f"{pid}-base-"
        for name in os.listdir(self.manifest_dir):
            if name.startswith(prefix) and name.endswith(".json"):
                try:
                    out.append(int(name[len(prefix):-5]))
                except ValueError:
                    continue
        return sorted(out)

    def base_covers_through(self, pid: int, base_epoch: int) -> int:
        """Highest delta epoch a base file already contains. Compaction
        bases cover their own epoch (the base is built AFTER delta E
        commits); partition-SPLIT bases are numbered E_max+1 but only
        contain epochs ≤ E_max, recorded as ``covers_through`` in their
        manifest — deltas at exactly the base epoch must then still merge."""
        m = self.read_base_manifest(pid, base_epoch) or {}
        return int(m.get("covers_through", base_epoch))

    def read_plan(self, pid: int, as_of: int | None = None,
              index: dict | None = None) -> tuple:
        """(base_epoch | None, [delta epochs after the base]) — the file set
        whose merge-on-read IS the partition's current state.

        ``as_of``: TIME TRAVEL — the plan for the state as of the end of
        epoch ``as_of`` instead of the head. The delta log keeps every
        epoch's bytes immutable (compaction adds bases, never deletes
        deltas), so any historical cut is reconstructible: the newest base
        covering ≤ as_of, plus the deltas in (covered, as_of]. ``vacuum``
        may have reclaimed epochs below the recorded horizon — asking for
        those raises instead of returning a silently partial state."""
        if as_of is not None:
            meta = self.read_table_meta() or {}
            horizon = (meta.get("vacuum_horizon") or {}).get(str(pid))
            if horizon is not None and as_of < int(horizon):
                raise ValueError(
                    f"as_of={as_of} below partition {pid}'s vacuum horizon "
                    f"{horizon} — those epochs were reclaimed"
                )
        if index is not None:
            bases = list(index["bases"].get(pid, []))
            all_deltas = index["deltas"].get(pid, [])
        else:
            bases = self.committed_base_epochs(pid)
            all_deltas = self.committed_epochs(pid)
        if as_of is not None:
            bases = [
                b for b in bases
                if self.base_covers_through(pid, b) <= as_of
            ]
        base = bases[-1] if bases else None
        cutoff = self.base_covers_through(pid, base) if base is not None else None
        deltas = [
            e for e in all_deltas
            if (cutoff is None or e > cutoff)
            and (as_of is None or e <= as_of)
        ]
        return base, deltas

    def manifest_index(self) -> dict:
        """ONE directory scan grouped into
        ``{"deltas": {pid: sorted epochs}, "bases": {pid: sorted epochs}}``.

        Every planner loop (read_lake_ds, vacuum, latest_state_files,
        head_epoch, split) builds this once and hands it to
        ``read_plan(..., index=...)`` — the per-pid ``committed_epochs``
        calls inside a P-partition loop otherwise re-list and re-parse
        the whole ``_manifests`` directory P times, O(P²·E) filename
        parses at the 32768-partition design point."""
        deltas: dict = {}
        bases: dict = {}
        if not os.path.isdir(self.manifest_dir):
            return {"deltas": deltas, "bases": bases}
        for name in os.listdir(self.manifest_dir):
            if not name.endswith(".json"):
                continue
            stem = name[:-5]
            try:
                if "-base-" in stem:
                    pid_s, e_s = stem.split("-base-", 1)
                    bases.setdefault(int(pid_s), []).append(int(e_s))
                else:
                    pid_s, e_s = stem.split("-", 1)
                    deltas.setdefault(int(pid_s), []).append(int(e_s))
            except ValueError:
                continue
        for d in (deltas, bases):
            for v in d.values():
                v.sort()
        return {"deltas": deltas, "bases": bases}

    def committed_epochs(self, pid: int) -> list:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        prefix = f"{pid}-"
        base_prefix = f"{pid}-base-"
        for name in os.listdir(self.manifest_dir):
            if (name.startswith(prefix) and name.endswith(".json")
                    and not name.startswith(base_prefix)):
                try:
                    out.append(int(name[len(prefix):-5]))
                except ValueError:
                    continue
        return sorted(out)

    def all_partitions(self) -> list:
        if not os.path.isdir(self.manifest_dir):
            return []
        pids = set()
        for name in os.listdir(self.manifest_dir):
            if name.endswith(".json") and "-" in name:
                try:
                    pids.add(int(name.split("-", 1)[0]))
                except ValueError:
                    continue
        return sorted(pids)

    def latest_state_files(self) -> list:
        """Every file in every partition's merge-on-read plan (latest base
        + subsequent deltas). These are RAW log files: a plain
        ``read_parquet`` over them yields superseded key versions and
        tombstone rows, not table state — use ``upsert.read_lake_ds`` (which
        applies the per-partition LWW merge + tombstone drop) for the
        distributed state read; this method only enumerates the plan."""
        out = []
        index = self.manifest_index()
        pids = sorted(set(index["deltas"]) | set(index["bases"]))
        for pid in pids:
            base, deltas = self.read_plan(pid, index=index)
            if base is not None:
                out.append(self.base_path(pid, base))
            out.extend(self.state_path(pid, e) for e in deltas)
        return out


def vacuum(store: "ManifestStore", retain_epochs: int) -> dict:
    """Reclaim storage from the delta log while keeping the head state and
    the last ``retain_epochs`` epochs time-travelable (the Delta-Lake
    VACUUM tradeoff, made explicit).

    Per partition: pick the newest compacted base whose ``covers_through``
    ≤ head − retain_epochs (the "anchor"); every delta it covers and every
    older base is then unreachable from any plan the retention window can
    ask for, so their files AND manifests are deleted. The head plan is
    untouched (it uses the newest base, which is ≥ the anchor), and
    ``read_plan(as_of)`` for any as_of ≥ the anchor's cover still
    reconstructs exactly — the horizon is the anchor's cover itself, so
    ``as_of == covered`` stays valid (the anchor base IS that cut). as_of
    strictly BELOW the horizon raises (the horizon is recorded per
    partition in the table meta) instead of returning a silently partial
    state.

    Snapshot TAGS and BRANCH FORKS pin their cuts: the reclamation
    target is clamped to the oldest tagged ``as_of`` / branch fork, so
    every tag stays exactly readable until deleted and every open
    branch's view of main survives until published or dropped (see
    ``create_tag`` below and ``sinks/branch.py``).

    Returns {pid: horizon} for the partitions vacuumed this call."""
    meta = store.read_table_meta() or {}
    horizons = dict(meta.get("vacuum_horizon", {}))
    cuts = [int(t["as_of"]) for t in meta.get("tags", {}).values()]
    cuts += [int(b["fork"]) for b in meta.get("branches", {}).values()]
    pin = min(cuts) if cuts else None
    changed = {}
    index = store.manifest_index()
    for pid in sorted(set(index["deltas"]) | set(index["bases"])):
        epochs = index["deltas"].get(pid, [])
        if not epochs:
            continue
        target = max(epochs) - retain_epochs
        if pin is not None:
            target = min(target, pin)
        eligible = [
            b for b in index["bases"].get(pid, [])
            if store.base_covers_through(pid, b) <= target
        ]
        if not eligible:
            continue
        anchor = max(eligible, key=lambda b: store.base_covers_through(pid, b))
        covered = store.base_covers_through(pid, anchor)
        for e in [e for e in epochs if e <= covered]:
            for p in (store.state_path(pid, e), store.manifest_path(pid, e)):
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
        for b in [b for b in index["bases"].get(pid, []) if b < anchor]:
            for p in (store.base_path(pid, b),
                      store.base_manifest_path(pid, b)):
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
        # The anchor base IS the exact state as of `covered`, so that cut
        # stays reconstructible — only as_of strictly below it raises.
        horizon = covered
        if horizon > int(horizons.get(str(pid), -10**9)):
            horizons[str(pid)] = horizon
            changed[pid] = horizon
    if changed:
        def mutate(m: dict) -> None:
            hz = dict(m.get("vacuum_horizon", {}))
            for pid, h in horizons.items():
                if h > int(hz.get(str(pid), -10**9)):
                    hz[str(pid)] = h
            m["vacuum_horizon"] = hz

        store.mutate_table_meta(mutate)
    return changed


# -- snapshot tags (named, vacuum-protected time-travel refs) ---------------
#
# A tag is an IMMUTABLE named cut of the delta log — Iceberg-style
# `CREATE TAG` semantics re-expressed over this manifest protocol: zero
# data movement (the tag references the same immutable delta/base files
# every plan reads), O(1) metadata (one entry in _table.json), and
# vacuum-protection (``vacuum`` clamps its reclamation target so every
# tagged cut stays exactly reconstructible until the tag is deleted).
# Tags are resolved to an ``as_of`` epoch at read time, so the read path
# is the existing ``read_plan(as_of)`` — no second code path to diverge.
# Single-writer discipline like the rest of the table meta (the driver
# owns _table.json; partition commits never touch it).

def head_epoch(store: "ManifestStore") -> int:
    """Newest committed epoch across partitions — the default cut for
    tags and branch forks. Raises on an empty lake."""
    deltas = store.manifest_index()["deltas"]
    heads = [max(es) for es in deltas.values() if es]
    if not heads:
        raise ValueError("cannot cut an empty lake")
    return max(heads)


def check_cut_above_horizon(meta: dict, cut: int, what: str) -> None:
    """A named cut (tag / branch fork) must be readable the moment it
    exists: reject cuts below any partition's vacuum horizon."""
    for pid, h in (meta.get("vacuum_horizon") or {}).items():
        if cut < int(h):
            raise ValueError(
                f"{what}={cut} below partition {pid}'s vacuum horizon "
                f"{h} — those epochs were reclaimed")


def create_tag(store: "ManifestStore", name: str,
               as_of: int | None = None) -> dict:
    """Tag the table state as of the end of epoch ``as_of`` (default: the
    current head = newest committed epoch across partitions). Raises if
    the cut is already below any partition's vacuum horizon (a tag must
    be readable the moment it exists), or on a name collision with a
    DIFFERENT cut (re-tagging the same cut is an idempotent no-op —
    driver-retry safe, like the manifest commits)."""
    if not name or "/" in name or name.startswith("_"):
        raise ValueError(f"invalid tag name {name!r}")
    if as_of is None:
        as_of = head_epoch(store)

    def mutate(meta: dict) -> None:
        check_cut_above_horizon(meta, as_of, "as_of")
        tags = dict(meta.get("tags", {}))
        prev = tags.get(name)
        if prev is not None and int(prev["as_of"]) != int(as_of):
            raise ValueError(
                f"tag {name!r} already points at as_of={prev['as_of']}")
        tags[name] = {"as_of": int(as_of)}
        meta["tags"] = tags

    store.mutate_table_meta(mutate)
    return {"as_of": int(as_of)}


def list_tags(store: "ManifestStore") -> dict:
    return dict((store.read_table_meta() or {}).get("tags", {}))


def resolve_tag(store: "ManifestStore", name: str) -> int:
    tags = list_tags(store)
    if name not in tags:
        raise KeyError(f"unknown tag {name!r}")
    return int(tags[name]["as_of"])


def delete_tag(store: "ManifestStore", name: str) -> bool:
    """Remove a tag (idempotent). The next ``vacuum`` may then reclaim
    epochs the tag was pinning."""
    existed = []

    def mutate(meta: dict) -> None:
        tags = dict(meta.get("tags", {}))
        existed.append(tags.pop(name, None) is not None)
        meta["tags"] = tags

    store.mutate_table_meta(mutate)
    return existed[0]
