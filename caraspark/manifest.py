"""Snapshot manifest: Iceberg-style atomic commits + resume (SURVEY.md S4).

No Iceberg jars exist offline, so this layer reproduces the semantics that
matter — atomic snapshot commit, per-unit lineage, resume from the last
committed snapshot — over plain parquet, with the same shape Iceberg uses
(snapshot chain + a CURRENT pointer swapped atomically). Swap-in path: every
call site touches only ``plan_units`` / ``commit`` / ``read_current``; an
Iceberg catalog implementation can replace this module wholesale.

Layout:
    <table>/data/bucket=<k>/*.parquet      work-unit output (dynamic
                                           partition overwrite → idempotent)
    <table>/_manifest/snapshot-<n>.json    {snapshot_id, parent, units: {...}}
    <table>/_manifest/CURRENT              name of the live snapshot (atomic
                                           os.replace swap)

A reader trusts ONLY units listed in the current snapshot: files written by
a crashed, uncommitted attempt are invisible and get overwritten on rerun.
"""

from __future__ import annotations

import json
import os
import time


class SnapshotManifest:
    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.mdir = os.path.join(table_dir, "_manifest")
        os.makedirs(self.mdir, exist_ok=True)

    # -- read side
    def current_snapshot(self) -> dict | None:
        cur = os.path.join(self.mdir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            name = f.read().strip()
        with open(os.path.join(self.mdir, name)) as f:
            return json.load(f)

    def committed_units(self, snapshot_id: int | None = None) -> set[int]:
        snap = (
            self.snapshot(snapshot_id)
            if snapshot_id is not None
            else self.current_snapshot()
        )
        return set(map(int, snap["units"])) if snap else set()

    def snapshot(self, snapshot_id: int) -> dict | None:
        """Time travel: load a specific snapshot from the chain."""
        p = os.path.join(self.mdir, f"snapshot-{snapshot_id:06d}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def snapshots(self) -> list[int]:
        """All committed snapshot ids, oldest first."""
        out = []
        for name in os.listdir(self.mdir):
            if name.startswith("snapshot-") and name.endswith(".json"):
                out.append(int(name[len("snapshot-"):-len(".json")]))
        return sorted(out)

    # -- write side
    def _publish(self, snap: dict) -> dict:
        """Durably write the snapshot file, then atomically swing CURRENT."""
        name = f"snapshot-{snap['snapshot_id']:06d}.json"
        tmp = os.path.join(self.mdir, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.mdir, name))
        cur_tmp = os.path.join(self.mdir, "CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(cur_tmp, os.path.join(self.mdir, "CURRENT"))  # the commit
        return snap

    def commit(self, new_units: dict[int, dict]) -> dict:
        """Append units to the chain atomically. Returns the new snapshot."""
        parent = self.current_snapshot()
        units = dict(parent["units"]) if parent else {}
        for k, meta in new_units.items():
            units[str(k)] = meta
        return self._publish(
            {
                "snapshot_id": (parent["snapshot_id"] + 1) if parent else 1,
                "parent": parent["snapshot_id"] if parent else None,
                "committed_at": time.time(),
                "units": units,
            }
        )

    def rollback(self, snapshot_id: int) -> dict:
        """Iceberg-style rollback: publish a NEW snapshot whose unit set is
        copied from an ancestor. History is preserved — the abandoned
        snapshots stay on the chain until ``expire_snapshots`` removes
        them — and readers flip atomically with CURRENT."""
        target = self.snapshot(snapshot_id)
        if target is None:
            raise ValueError(f"no snapshot {snapshot_id} on the chain")
        parent = self.current_snapshot()
        return self._publish(
            {
                "snapshot_id": parent["snapshot_id"] + 1,
                "parent": parent["snapshot_id"],
                "rolled_back_to": snapshot_id,
                "committed_at": time.time(),
                "units": dict(target["units"]),
            }
        )

    def expire_snapshots(
        self, keep_last: int = 2, gc_orphans: bool = True
    ) -> dict:
        """Retention: drop all but the newest ``keep_last`` snapshot files
        (CURRENT always retained), then optionally delete data buckets no
        retained snapshot references — crashed uncommitted attempts and
        buckets only reachable from expired history. Expired parents leave
        dangling ``parent`` pointers on retained snapshots, as in Iceberg;
        time travel is only valid within the retained window."""
        import shutil

        ids = self.snapshots()
        cur = self.current_snapshot()
        keep = set(ids[-keep_last:]) if keep_last > 0 else set()
        if cur:
            keep.add(cur["snapshot_id"])
        expired = [i for i in ids if i not in keep]
        for i in expired:
            os.remove(os.path.join(self.mdir, f"snapshot-{i:06d}.json"))

        orphans: list[str] = []
        if gc_orphans:
            referenced: set[int] = set()
            for i in keep:
                referenced |= self.committed_units(i)
            data_dir = os.path.join(self.table_dir, "data")
            if os.path.isdir(data_dir):
                for name in os.listdir(data_dir):
                    if not name.startswith("bucket="):
                        continue
                    if int(name.split("=", 1)[1]) not in referenced:
                        shutil.rmtree(os.path.join(data_dir, name))
                        orphans.append(name)
        return {"expired": expired, "orphan_buckets": sorted(orphans)}

    def plan_units(self, all_units: list[int]) -> list[int]:
        done = self.committed_units()
        return [u for u in all_units if u not in done]
