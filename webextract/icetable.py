"""Iceberg-style table emulation: snapshots, manifests, partition commits.

No Iceberg jars exist in this sandbox (SURVEY.md §7.4#5), so this module
reproduces the subset of Iceberg semantics the pipeline needs, with the
same shape a real catalog would slot into:

* data files live wherever they were written (``files/<run_id>/...``);
  the MANIFEST is the only source of truth — orphan files from a killed
  run are simply never referenced (exactly Iceberg's model).
* a snapshot is a JSON manifest listing committed partitions, their data
  files, and per-partition lineage counters; snapshots chain via
  ``parent_id``.
* commits are atomic: manifest written to a temp file then ``os.replace``
  onto the ``_CURRENT`` pointer — readers see the old or the new
  snapshot, never a partial one.
* resume = read ``committed_parts()`` and skip them (the reference's
  precedent is its Redis task-registry status repair,
  /root/reference/docling_serve/orchestrator_factory.py:35-92; counters
  ≡ processing_meta, orchestrator_factory.py:104-106).
"""

from __future__ import annotations

import json
import os
import uuid


class IceTable:
    def __init__(self, root: str) -> None:
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.files_dir = os.path.join(root, "files")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.files_dir, exist_ok=True)

    # -- snapshot chain -------------------------------------------------
    @property
    def _current_path(self) -> str:
        return os.path.join(self.meta_dir, "_CURRENT")

    def current_snapshot_id(self) -> str | None:
        try:
            with open(self._current_path) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def _snapshot(self, snap_id: str) -> dict:
        with open(os.path.join(self.meta_dir, f"snap-{snap_id}.json")) as f:
            return json.load(f)

    def snapshots(self, as_of: str | None = None) -> list[dict]:
        """Chain from ``as_of`` (default: current) back to root (newest
        first) — Iceberg's snapshot-id time travel: reading from an
        older snapshot sees exactly the partitions committed then."""
        out = []
        sid = as_of or self.current_snapshot_id()
        while sid:
            s = self._snapshot(sid)
            out.append(s)
            sid = s.get("parent_id")
        return out

    def latest_snapshot(self) -> dict | None:
        sid = self.current_snapshot_id()
        return self._snapshot(sid) if sid else None

    # -- read side ------------------------------------------------------
    def committed_parts(self) -> set[int]:
        return {p["part_id"] for s in self.snapshots()
                for p in s["partitions"]}

    def data_files(self, as_of: str | None = None) -> list[str]:
        return [f for s in self.snapshots(as_of)
                for p in s["partitions"] for f in p["files"]]

    def read(self, spark, as_of: str | None = None):
        """Read the table (optionally time-traveled to snapshot id
        ``as_of``) — only manifest-listed files, never a directory
        listing, so orphans from killed runs are invisible."""
        files = self.data_files(as_of)
        if not files:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        return spark.read.parquet(*files)

    def lineage(self) -> list[dict]:
        """Per-partition lineage rows (FIXTURES.md §5) across snapshots."""
        rows = []
        for s in self.snapshots():
            for p in s["partitions"]:
                r = dict(p["counters"])
                r.update(run_id=s["run_id"], part_id=p["part_id"],
                         committed_at=s["committed_at"],
                         snapshot_id=s["snapshot_id"])
                rows.append(r)
        return rows

    def lineage_df(self, spark):
        rows = self.lineage()
        return spark.createDataFrame(
            rows or [],
            schema=("run_id string, part_id int, num_docs long, "
                    "num_processed long, num_succeeded long, "
                    "num_partial long, num_failed long, "
                    "num_skipped long, bytes_in long, bytes_out long, "
                    "wall_ms long, committed_at string, snapshot_id string"))

    # -- write side -----------------------------------------------------
    def staging_dir(self, run_id: str, wave: int) -> str:
        return os.path.join(self.files_dir, run_id, f"wave-{wave:04d}")

    def _commit_lock(self):
        """Advisory O_EXCL lock around the _CURRENT read-modify-write:
        two concurrent writers (multiple streams, stream + batch — an
        explicitly supported shape) would otherwise both read the same
        parent and one snapshot would fall off the chain, making its
        committed files look like orphans (round-3 review).  Stale
        locks (crashed writer) are stolen after 60 s.  A real catalog
        would use its conditional-swap primitive here."""
        import time as _time
        lock = os.path.join(self.meta_dir, "_COMMIT_LOCK")
        deadline = _time.time() + 120
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(_time.time()).encode())
                os.close(fd)
                return lock
            except FileExistsError:
                try:
                    age = _time.time() - float(open(lock).read() or 0)
                except (OSError, ValueError):
                    age = 0.0
                if age > 60:
                    try:
                        os.remove(lock)   # stale: writer died mid-commit
                    except OSError:
                        pass
                    continue
                if _time.time() > deadline:
                    raise TimeoutError(f"commit lock busy: {lock}")
                _time.sleep(0.05)

    def commit(self, run_id: str, partitions: list[dict],
               committed_at: str, versions: dict | None = None) -> str:
        """partitions: [{part_id, files: [...], counters: {...}}].
        Atomic snapshot append; returns the new snapshot id.
        ``versions`` records component versions in the snapshot (the
        reference's /version endpoint analogue, helper_functions.py:12-21)."""
        lock = self._commit_lock()
        try:
            snap_id = uuid.uuid4().hex[:16]
            snap = {"snapshot_id": snap_id,
                    "parent_id": self.current_snapshot_id(),
                    "run_id": run_id,
                    "committed_at": committed_at,
                    "versions": versions or {},
                    "partitions": partitions}
            path = os.path.join(self.meta_dir, f"snap-{snap_id}.json")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(snap, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
            ptmp = self._current_path + ".tmp"
            with open(ptmp, "w") as f:
                f.write(snap_id)
                f.flush()
                os.fsync(f.fileno())
            os.replace(ptmp, self._current_path)  # the atomic swap
            return snap_id
        finally:
            try:
                os.remove(lock)
            except OSError:
                pass

    def expire_orphans(self, keep_run_ids: set[str] | None = None) -> int:
        """Maintenance: delete data files not referenced by any snapshot
        (the reference's result-GC analogue, response_preparation.py:71-80).

        Paths are realpath-normalized on BOTH sides before comparing:
        manifests record paths as the writer spelled its table root
        (relative, symlinked, ...), and a raw string compare against
        the walked paths would classify every live file as an orphan
        and delete the whole table (round-3 review)."""
        referenced = {os.path.realpath(p) for p in self.data_files()}
        removed = 0
        for dirpath, _, files in os.walk(self.files_dir):
            # keep-filter matches the run_id as a whole path COMPONENT
            # (files/<run_id>/wave-NNNN/...): substring matching would
            # wrongly keep a run whose id is a prefix of another's
            parts = set(os.path.relpath(dirpath, self.files_dir).split(os.sep))
            if keep_run_ids and parts & keep_run_ids:
                continue
            for fn in files:
                if not fn.endswith(".parquet") or fn.startswith((".", "_")):
                    continue  # _SUCCESS / .crc markers are not data files
                p = os.path.realpath(os.path.join(dirpath, fn))
                if p not in referenced:
                    os.remove(p)
                    removed += 1
        return removed
