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
    def commit(self, new_units: dict[int, dict]) -> dict:
        """Append units to the chain atomically. Returns the new snapshot."""
        parent = self.current_snapshot()
        units = dict(parent["units"]) if parent else {}
        for k, meta in new_units.items():
            units[str(k)] = meta
        sid = (parent["snapshot_id"] + 1) if parent else 1
        snap = {
            "snapshot_id": sid,
            "parent": parent["snapshot_id"] if parent else None,
            "committed_at": time.time(),
            "units": units,
        }
        name = f"snapshot-{sid:06d}.json"
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

    def plan_units(self, all_units: list[int]) -> list[int]:
        done = self.committed_units()
        return [u for u in all_units if u not in done]
