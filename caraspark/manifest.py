"""Snapshot manifest: Iceberg-style atomic commits + resume (SURVEY.md S4).

No Iceberg jars exist offline, so this layer reproduces the semantics that
matter — atomic snapshot commit, per-unit lineage, resume from the last
committed snapshot — over plain parquet, with the same shape Iceberg uses
(snapshot chain + a CURRENT pointer swapped atomically). Swap-in path: every
call site touches only ``plan_units`` / ``commit`` / ``read_current``; an
Iceberg catalog implementation can replace this module wholesale.

Layout:
    <table>/data/gen=<g>/bucket=<k>/*.parquet
                                           work-unit output. gen 0 is the
                                           extract job's output (dynamic
                                           partition overwrite → idempotent
                                           rerun); compaction rewrites land
                                           in fresh generations (g = the
                                           committing snapshot id), never in
                                           place — see maintenance.py.
    <table>/_manifest/snapshot-<n>.json    {snapshot_id, parent,
                                            segments: [names]}
    <table>/_manifest/segment-….json       immutable unit-map fragment
                                           {unit: meta, …}
    <table>/_manifest/CURRENT              name of the live snapshot (atomic
                                           os.replace swap)

A snapshot lists SEGMENTS (Iceberg: manifest list → manifest files), and a
commit writes only its new units as one fresh segment, reusing the
parent's segment list verbatim — write amplification per commit is
O(new units + chain bookkeeping), not O(all units ever committed), which
is what keeps a 10^12-doc table's incremental chunk commits cheap. Later
segments shadow earlier ones (a re-committed unit, e.g. after compaction,
wins), and when a chain accumulates more than
``SEGMENT_COMPACT_THRESHOLD`` segments the commit folds them into one —
the manifest-compaction analog of Iceberg's ``rewrite_manifests``.
Legacy snapshots with an inline ``units`` map are still readable and get
folded into a segment on the next commit.

Each unit's manifest meta records its generation (absent → 0); readers
resolve CONCRETE paths via ``unit_paths`` and read only those, so a reader
holding a snapshot is unaffected by concurrent compaction: old generations
stay on disk until ``expire_snapshots`` GCs them, exactly like Iceberg's
rewrite-then-expire story.

A reader trusts ONLY units listed in the current snapshot: files written by
a crashed, uncommitted attempt are invisible and get overwritten on rerun.
"""

from __future__ import annotations

import json
import os
import time


SEGMENT_COMPACT_THRESHOLD = 16


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

    def _load_segment(self, name: str) -> dict[str, dict]:
        with open(os.path.join(self.mdir, name)) as f:
            return json.load(f)

    def _resolve_units(self, snap: dict | None) -> dict[str, dict]:
        """Unit map of a snapshot: segments merged in list order (later
        shadows earlier); legacy inline ``units`` passes through."""
        if snap is None:
            return {}
        if "segments" not in snap:
            return dict(snap.get("units", {}))
        out: dict[str, dict] = {}
        for name in snap["segments"]:
            out.update(self._load_segment(name))
        return out

    def units_map(self, snapshot_id: int | None = None) -> dict[str, dict]:
        snap = (
            self.snapshot(snapshot_id)
            if snapshot_id is not None
            else self.current_snapshot()
        )
        return self._resolve_units(snap)

    def committed_units(self, snapshot_id: int | None = None) -> set[int]:
        return set(map(int, self.units_map(snapshot_id)))

    def snapshot(self, snapshot_id: int) -> dict | None:
        """Time travel: load a specific snapshot from the chain."""
        p = os.path.join(self.mdir, f"snapshot-{snapshot_id:06d}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def unit_paths(self, snapshot_id: int | None = None) -> list[str]:
        """Concrete data directories of every committed unit, gen-aware.

        The returned paths all have the uniform ``data/gen=<g>/bucket=<k>``
        depth, so Spark can read them with ``basePath=<table>/data`` and
        recover both partition columns.
        """
        units = self.units_map(snapshot_id)
        data = os.path.join(self.table_dir, "data")
        return [
            os.path.join(
                data, f"gen={int((meta or {}).get('gen', 0))}", f"bucket={int(u)}"
            )
            for u, meta in sorted(units.items(), key=lambda kv: int(kv[0]))
        ]

    def changed_unit_paths(
        self, from_snapshot_id: int, to_snapshot_id: int | None = None
    ) -> list[str]:
        """Incremental scan (Iceberg's incremental-append read): concrete
        data directories of units ADDED OR REWRITTEN strictly after
        ``from_snapshot_id`` up to ``to_snapshot_id`` (default CURRENT).

        A unit counts as changed when it is absent from the older unit map
        or its resolved metadata differs (e.g. a compaction bumped its
        ``gen``). Cost is two unit-map resolutions — no data files are
        touched, so a 10^12-doc consumer polling a chunk-committing
        producer reads only the new chunk's directories each cycle."""
        # from_snapshot_id=0 is the explicit "since table creation" sentinel
        # (every unit counts as changed). Any NON-ZERO id must resolve:
        # mirroring Iceberg, an incremental read over an expired or mistyped
        # snapshot errors loudly instead of silently re-reading everything /
        # reading nothing.
        if from_snapshot_id and self.snapshot(from_snapshot_id) is None:
            raise ValueError(
                f"unknown from_snapshot_id {from_snapshot_id}: snapshot file "
                "missing (expired or mistyped)"
            )
        if to_snapshot_id is not None and self.snapshot(to_snapshot_id) is None:
            raise ValueError(
                f"unknown to_snapshot_id {to_snapshot_id}: snapshot file "
                "missing (expired or mistyped)"
            )
        old = self.units_map(from_snapshot_id) if from_snapshot_id else {}
        new = self.units_map(to_snapshot_id)
        data = os.path.join(self.table_dir, "data")
        return [
            os.path.join(
                data, f"gen={int((meta or {}).get('gen', 0))}", f"bucket={int(u)}"
            )
            for u, meta in sorted(new.items(), key=lambda kv: int(kv[0]))
            if u not in old or old[u] != meta
        ]

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

    def _write_segment(
        self, sid: int, tag: str, units: dict[str, dict]
    ) -> str:
        """Durably write one immutable unit-map fragment; returns its name.
        Segments land BEFORE the snapshot that references them publishes,
        so a crash mid-commit leaves only invisible files (GC'd by
        ``expire_snapshots``)."""
        name = f"segment-{sid:06d}-{tag}.json"
        tmp = os.path.join(self.mdir, name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(units, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.mdir, name))
        return name

    def _parent_segments(self, sid: int, parent: dict | None) -> list[str]:
        """Parent's segment list, folding a legacy inline map if needed."""
        if parent is None:
            return []
        if "segments" in parent:
            return list(parent["segments"])
        if parent.get("units"):
            return [self._write_segment(sid, "fold", parent["units"])]
        return []

    def commit(self, new_units: dict[int, dict]) -> dict:
        """Append units to the chain atomically. Returns the new snapshot.

        Writes ONE new segment holding just ``new_units`` and reuses the
        parent's segments; folds the whole list into a single segment
        once it exceeds ``SEGMENT_COMPACT_THRESHOLD``."""
        parent = self.current_snapshot()
        sid = (parent["snapshot_id"] + 1) if parent else 1
        segs = self._parent_segments(sid, parent)
        segs.append(
            self._write_segment(
                sid,
                f"a{len(segs):03d}",
                {str(k): meta for k, meta in new_units.items()},
            )
        )
        if len(segs) > SEGMENT_COMPACT_THRESHOLD:
            merged: dict[str, dict] = {}
            for name in segs:
                merged.update(self._load_segment(name))
            segs = [self._write_segment(sid, "merged", merged)]
        return self._publish(
            {
                "snapshot_id": sid,
                "parent": parent["snapshot_id"] if parent else None,
                "committed_at": time.time(),
                "segments": segs,
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
        sid = parent["snapshot_id"] + 1
        return self._publish(
            {
                "snapshot_id": sid,
                "parent": parent["snapshot_id"],
                "rolled_back_to": snapshot_id,
                "committed_at": time.time(),
                "segments": self._parent_segments(sid, target),
            }
        )

    def expire_snapshots(
        self,
        keep_last: int = 2,
        gc_orphans: bool = True,
        orphan_min_age_s: float = 3 * 3600.0,
    ) -> dict:
        """Retention: drop all but the newest ``keep_last`` snapshot files
        (CURRENT always retained), then optionally delete data buckets no
        retained snapshot references — crashed uncommitted attempts and
        buckets only reachable from expired history. Expired parents leave
        dangling ``parent`` pointers on retained snapshots, as in Iceberg;
        time travel is only valid within the retained window.

        Orphan GC skips buckets whose newest file is younger than
        ``orphan_min_age_s`` (default 3 h), mirroring Iceberg's
        ``remove_orphan_files`` age cutoff: a concurrently running extract
        job's written-but-not-yet-committed buckets must not be deleted out
        from under its upcoming snapshot commit. Pass ``0`` only when no
        concurrent writers can exist. Directory names that don't parse as
        ``bucket=<int>`` (e.g. a null-partition dir) are reported, not
        deleted, and never abort the sweep."""
        import shutil
        import time

        ids = self.snapshots()
        cur = self.current_snapshot()
        keep = set(ids[-keep_last:]) if keep_last > 0 else set()
        if cur:
            keep.add(cur["snapshot_id"])
        expired = [i for i in ids if i not in keep]
        for i in expired:
            os.remove(os.path.join(self.mdir, f"snapshot-{i:06d}.json"))

        # Segment GC: drop fragments no retained snapshot references.
        # The same min-age guard as the data sweep protects a concurrent
        # committer's just-written (not-yet-published) segments.
        referenced_segs: set[str] = set()
        for i in keep:
            s = self.snapshot(i)
            if s:
                referenced_segs |= set(s.get("segments", []))
        expired_segments: list[str] = []
        now0 = time.time()
        for name in sorted(os.listdir(self.mdir)):
            stale_tmp = name.startswith("segment-") and name.endswith(
                ".json.tmp"
            )
            if not (
                stale_tmp
                or (name.startswith("segment-") and name.endswith(".json"))
            ):
                continue
            if name in referenced_segs:
                continue
            p = os.path.join(self.mdir, name)
            if now0 - os.path.getmtime(p) < orphan_min_age_s:
                continue
            os.remove(p)
            expired_segments.append(name)

        orphans: list[str] = []
        skipped: list[str] = []
        if gc_orphans:
            referenced: set[str] = set()
            data_dir = os.path.join(self.table_dir, "data")
            for i in keep:
                referenced |= {
                    os.path.relpath(p, data_dir) for p in self.unit_paths(i)
                }
            now = time.time()

            def _sweep(parent: str, names: list[str]) -> None:
                for name in names:
                    rel = os.path.join(parent, name) if parent else name
                    prefix = "bucket=" if parent else "gen="
                    path = os.path.join(data_dir, rel)
                    if not name.startswith(prefix):
                        continue
                    try:
                        int(name.split("=", 1)[1])
                    except ValueError:
                        skipped.append(rel)
                        continue
                    if not parent:
                        # recurse into the generation's bucket dirs
                        _sweep(name, sorted(os.listdir(path)))
                        if not os.listdir(path):  # generation fully GC'd
                            os.rmdir(path)
                        continue
                    if rel in referenced:
                        continue
                    newest = max(
                        (
                            os.path.getmtime(os.path.join(root, f))
                            for root, _, files in os.walk(path)
                            for f in files
                        ),
                        default=os.path.getmtime(path),
                    )
                    if now - newest < orphan_min_age_s:
                        skipped.append(rel)
                        continue
                    shutil.rmtree(path)
                    orphans.append(rel)

            if os.path.isdir(data_dir):
                _sweep("", sorted(os.listdir(data_dir)))
        return {
            "expired": expired,
            "expired_segments": expired_segments,
            "orphan_buckets": sorted(orphans),
            "skipped_buckets": sorted(skipped),
        }

    def plan_units(self, all_units: list[int]) -> list[int]:
        done = self.committed_units()
        return [u for u in all_units if u not in done]
