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
        return os.path.join(self.partition_dir(pid), f"state-epoch={epoch}.parquet")

    def manifest_path(self, pid: int, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"{pid}-{epoch}.json")

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

    # -- read side ----------------------------------------------------------

    def committed_epochs(self, pid: int) -> list:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        prefix = f"{pid}-"
        for name in os.listdir(self.manifest_dir):
            if name.startswith(prefix) and name.endswith(".json"):
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
        """One parquet path per partition: the highest committed epoch."""
        out = []
        for pid in self.all_partitions():
            epochs = self.committed_epochs(pid)
            if epochs:
                out.append(self.state_path(pid, epochs[-1]))
        return out
