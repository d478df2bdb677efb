"""Parquet lake with an idempotent two-phase-commit manifest.

Replaces the reference's PostgreSQL layer (reference:
src/nostr_pipeline/loaders/database.py:16-119 — engine/session/DDL) and its
consume-and-ack progress flag (reference: src/nostr_pipeline/models.py:38,
loaders/event_loader.py:203-224) with an immutable-file lake:

    lake_root/
      _manifest.json              # atomic pointer {"epoch": n, "path": ...}
      manifests/epoch-{n}.json    # files, watermarks, applied segments, lineage
      parts/epoch={n}/part-{pkey:05d}.parquet

Exactly-once protocol:
  phase 1 (prepare): merge tasks write part files at DETERMINISTIC paths
      keyed by (epoch, pkey); a retried task overwrites the same path with
      the same bytes, so partial/duplicate task execution is harmless.
  phase 2 (commit): the driver writes manifests/epoch-{n}.json, then
      atomically os.replace()s _manifest.json. Readers resolve files only
      through _manifest.json, so an uncommitted epoch is invisible and a
      crash before commit simply re-runs the epoch.

Partitions untouched by an epoch are carried forward by reference in the
new manifest (metadata-only, no rewrite) — at 100 TB an epoch touching 1%
of conversations rewrites 1% of the lake, not all of it.

Concurrency model: SINGLE WRITER (one apply job owns a lake), any number of
readers — readers resolve through the atomic manifest pointer and always see
a committed snapshot. Two enforcement layers (the reference relies on its
single pipeline process, src/nostr_pipeline/pipeline.py:21-48):

  * ``writer_lock()`` — an exclusive flock on ``_writer.lock`` taken by the
    outer apply/follow/delete entry points; a second writer on the same
    host fails fast instead of corrupting the lake.
  * commit CAS — ``commit_epoch(n)`` refuses unless the committed pointer
    is exactly at ``n-1``; on storage where flock doesn't propagate (NFS,
    object stores) a racing writer loses at the commit point, before the
    pointer moves, and its part files stay invisible orphans.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Any

import pyarrow as pa


class ConcurrentWriterError(RuntimeError):
    """Another process holds this lake's writer lock (or won the commit race)."""


@contextmanager
def dir_writer_lock(root: str, what: str = "store"):
    """Exclusive single-writer flock for any directory-rooted store that
    commits like the lake (the persisted dedup/ANN indexes reuse this so
    their staged-subdir + meta-swap discipline is race-free too)."""
    import fcntl

    path = os.path.join(root, "_writer.lock")
    fd = os.open(path, os.O_CREAT | os.O_RDWR)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError as ex:
            raise ConcurrentWriterError(
                f"another writer holds {path}; a {what} has exactly one "
                "mutating job at a time"
            ) from ex
        yield
    finally:
        os.close(fd)  # releases the flock


class Lake:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "parts"), exist_ok=True)
        self._manifest_cache: tuple[tuple, dict[str, Any]] | None = None
        # epoch → parsed manifest (committed manifests are immutable);
        # pruned entries are never refreshed — manifest_at re-raises
        self._asof_cache: dict[int, dict[str, Any]] = {}

    # ---- read side -------------------------------------------------------

    def current_manifest(self) -> dict[str, Any] | None:
        """The committed manifest, parse-cached per Lake instance.

        At the design point (~400k part entries plus the applied-segments
        list) one json.load is a multi-second full-file parse, and an
        apply epoch consults the manifest half a dozen times (epoch
        number, partitioning, watermarks, partition files, commit parent)
        — all under the writer lock, so the pointer cannot move between
        them. The cache keys on the POINTER file's (inode, mtime_ns,
        size): commit_epoch's os.replace mints a new inode, so any
        committed change invalidates it, including commits by another
        process. Callers treat the returned dict as IMMUTABLE (commit_
        epoch copies every map it extends)."""
        ptr = os.path.join(self.root, "_manifest.json")
        try:
            st = os.stat(ptr)
        except FileNotFoundError:
            return None
        key = (st.st_ino, st.st_mtime_ns, st.st_size)
        if self._manifest_cache is not None and self._manifest_cache[0] == key:
            return self._manifest_cache[1]
        with open(ptr) as f:
            pointer = json.load(f)
        with open(os.path.join(self.root, pointer["path"])) as f:
            m = json.load(f)
        self._manifest_cache = (key, m)
        return m

    def current_epoch(self) -> int:
        m = self.current_manifest()
        return -1 if m is None else int(m["epoch"])

    def manifest_at(self, epoch: int) -> dict[str, Any]:
        """Committed manifest of a PAST epoch — the time-travel resolver.
        Only epochs ≤ the committed pointer are valid: phase 2 writes
        ``manifests/epoch-{n}.json`` BEFORE flipping ``_manifest.json``,
        so a bare manifest above the pointer may be an uncommitted orphan.
        Epochs pruned by ``vacuum`` raise (their manifest file is deleted
        together with their unreferenced parts, so absent a CONCURRENT
        vacuum a resolvable manifest is fully readable; readers hold no
        lock, so a vacuum racing an in-flight as-of read can still pull
        parts out from under it — the export_snapshot retry pattern).

        Committed manifests are immutable, so parses are cached per
        instance (an as-of read consults the manifest several times; at
        the 400k-partition design point one parse is multi-second)."""
        cur = self.current_epoch()
        if cur < 0:
            raise ValueError(f"lake {self.root} has no committed epoch")
        if epoch > cur or epoch < 0:
            raise ValueError(
                f"as_of epoch {epoch} is not committed (current: {cur})"
            )
        if epoch == cur:  # the pointer cache already holds this parse
            return self.current_manifest()
        hit = self._asof_cache.get(epoch)
        if hit is not None:
            return hit
        p = os.path.join(self.root, "manifests", f"epoch-{epoch}.json")
        try:
            with open(p) as f:
                m = json.load(f)
        except FileNotFoundError:
            # no exists() pre-check: a concurrent vacuum could unlink
            # between check and open — map the race to the same error
            raise ValueError(
                f"epoch {epoch} manifest is gone — pruned by vacuum; time "
                f"travel reaches only the retained window (current: {cur})"
            ) from None
        self._asof_cache[epoch] = m
        return m

    def _manifest(self, as_of: int | None) -> dict[str, Any] | None:
        return self.current_manifest() if as_of is None else self.manifest_at(as_of)

    def applied_segments(self) -> set[str]:
        m = self.current_manifest()
        return set() if m is None else set(m["applied_segments"])

    def watermarks(self) -> dict[int, int]:
        """Per-partition max applied LSN."""
        m = self.current_manifest()
        if m is None:
            return {}
        return {int(k): int(v) for k, v in m["watermarks"].items()}

    def snapshot_files(
        self, pkeys: list[int] | None = None, as_of: int | None = None
    ) -> list[str]:
        """Absolute paths of current BASE part files (optionally only for
        pkeys; ``as_of`` resolves a past committed epoch instead).
        Partitions with pending delta parts (merge-on-read policy)
        are not fully described by this — use ``partition_files``."""
        m = self._manifest(as_of)
        if m is None:
            return []
        files = m["files"]
        if pkeys is None:
            rels = files.values()
        else:
            rels = [files[str(pk)] for pk in pkeys if str(pk) in files]
        return [os.path.join(self.root, r) for r in rels]

    def partition_files(
        self, pkeys: list[int] | None = None, as_of: int | None = None
    ) -> dict[int, tuple[str | None, list[str]]]:
        """pkey → (base part abspath or None, [delta part abspaths, oldest
        first]) for the committed snapshot (``as_of`` resolves a past
        committed epoch instead). The complete read contract under
        either merge policy: rewrite lakes have empty delta lists."""
        m = self._manifest(as_of)
        if m is None:
            return {}
        files = m["files"]
        deltas = m.get("deltas", {})
        keys = (
            sorted({int(k) for k in files} | {int(k) for k in deltas})
            if pkeys is None
            else [int(p) for p in pkeys]
        )
        out: dict[int, tuple[str | None, list[str]]] = {}
        for pk in keys:
            base = files.get(str(pk))
            ds = deltas.get(str(pk), [])
            if base is None and not ds:
                continue
            out[pk] = (
                os.path.join(self.root, base) if base else None,
                [os.path.join(self.root, d) for d in ds],
            )
        return out

    def has_deltas(self, as_of: int | None = None) -> bool:
        m = self._manifest(as_of)
        return bool(m and any(m.get("deltas", {}).values()))

    def part_path(self, epoch: int, pkey: int) -> str:
        """Deterministic part path — the idempotence anchor of phase 1."""
        # NB: no "key=value" path segments — pyarrow would infer them as
        # hive partition columns on read and pollute the schema
        return os.path.join("parts", f"epoch-{epoch}", f"part-{pkey:05d}.parquet")

    # ---- commit side -----------------------------------------------------

    def writer_lock(self):
        """Exclusive single-writer lock (non-blocking flock). Held across a
        whole apply/follow/delete call; raises ConcurrentWriterError if any
        other process (or another handle in this one) already writes here.
        Delegates to ``dir_writer_lock`` — one flock implementation for
        every directory-rooted store, so a locking fix can't silently miss
        this copy."""
        return dir_writer_lock(self.root, "lake")

    def commit_epoch(
        self,
        epoch: int,
        new_files: dict[int, str],
        new_watermarks: dict[int, int],
        segments: list[str],
        lineage: dict[int, dict[str, Any]],
        schema: pa.Schema,
        stats: dict[str, Any] | None = None,
        partitioning: dict[str, int] | None = None,
        append_deltas: dict[int, str] | None = None,
        max_turn_idx: int | None = None,
        max_turn_complete: bool = False,
    ) -> dict[str, Any]:
        prev = self.current_manifest()
        # commit-point CAS: the new epoch must extend the committed pointer.
        # A writer that lost a race (stale manifest read at epoch start)
        # aborts HERE — before the pointer moves — leaving only invisible
        # orphan part files that vacuum collects.
        parent = -1 if prev is None else int(prev["epoch"])
        if epoch != parent + 1:
            raise ConcurrentWriterError(
                f"commit of epoch {epoch} expected parent {epoch - 1}, "
                f"but the lake is at epoch {parent} (concurrent writer?)"
            )
        files = dict(prev["files"]) if prev else {}
        watermarks = dict(prev["watermarks"]) if prev else {}
        lin = dict(prev.get("lineage", {})) if prev else {}
        applied = list(prev["applied_segments"]) if prev else []

        deltas = {k: list(v) for k, v in (prev.get("deltas", {}) if prev else {}).items()}
        for pk, rel in new_files.items():
            files[str(pk)] = rel
            deltas.pop(str(pk), None)  # a base rewrite supersedes its deltas
        for pk, rel in (append_deltas or {}).items():
            deltas.setdefault(str(pk), []).append(rel)
        for pk, wm in new_watermarks.items():
            watermarks[str(pk)] = max(int(wm), int(watermarks.get(str(pk), -1)))
        for pk, row in lineage.items():
            lin[str(pk)] = row
        applied += [s for s in segments if s not in applied]

        manifest = {
            "epoch": epoch,
            # per-BUILD identity, minted at epoch 0 and carried forward: a
            # lake rebuilt in place reuses epoch numbers and part paths, so
            # downstream consumers (e.g. incremental views) need an anchor
            # that survives manifest retention (vacuum prunes old epochs)
            "lake_id": (prev.get("lake_id") if prev else None)
            or f"{time.time_ns():x}",
            "committed_at": time.time(),
            "files": files,
            "deltas": {k: v for k, v in deltas.items() if v},
            "watermarks": watermarks,
            "applied_segments": applied,
            "lineage": lin,
            "schema": [[f.name, str(f.type)] for f in schema],
            "stats": stats or {},
            # the partition function's parameters travel with the lake so
            # point lookups / later writers can re-derive pkeys (carried
            # forward from the previous manifest when not supplied)
            "partitioning": partitioning
            or (prev.get("partitioning") if prev else None),
        }
        # monotone global bound on turn_idx — the exact probe budget for
        # partition-pruned point lookups (conversation_pkeys). A lake whose
        # manifest predates the field has an UNKNOWN bound: an epoch's max
        # over only its touched partitions must NOT become the global bound
        # (point lookups would silently truncate legacy high-turn rows), so
        # the field stays absent (probe-all fallback) until an operation
        # that sees EVERY row (compact) re-establishes it authoritatively.
        prev_known = prev is not None and "max_turn_idx" in prev
        prev_empty = prev is None or not prev.get("files") and not prev.get("deltas")
        if max_turn_complete and max_turn_idx is not None:
            manifest["max_turn_idx"] = int(max_turn_idx)
        elif prev_known or prev_empty:
            manifest["max_turn_idx"] = max(
                int(max_turn_idx if max_turn_idx is not None else -1),
                int(prev.get("max_turn_idx", -1)) if prev else -1,
            )
        # else: legacy lake with data and no recorded bound → stay unknown
        rel = os.path.join("manifests", f"epoch-{epoch}.json")
        with open(os.path.join(self.root, rel), "w") as f:
            json.dump(manifest, f)
        ptr_tmp = os.path.join(self.root, "_manifest.json.tmp")
        with open(ptr_tmp, "w") as f:
            json.dump({"epoch": epoch, "path": rel}, f)
        # the atomic commit point
        os.replace(ptr_tmp, os.path.join(self.root, "_manifest.json"))
        return manifest

    # ---- retention (reference analog: cleanup_old_data,
    # src/nostr_pipeline/loaders/event_loader.py:268-297 — here a
    # metadata-driven GC of part files no manifest references) -------------

    def vacuum(self, keep_manifests: int = 2) -> list[str]:
        """Retain the last ``keep_manifests`` committed epochs (time travel
        window): parts referenced by ANY retained manifest stay; everything
        older — part files and manifest JSONs alike — is pruned, so every
        surviving manifest remains fully readable (no dangling files).
        Manifests beyond the committed pointer (orphans of a crashed
        phase-2) are pruned too.

        Takes the WRITER LOCK: vacuum walks parts/ deleting unreferenced
        files, and a concurrent apply's staged exchange files (default
        scratch lives under parts/) or its just-written pre-commit manifest
        would look exactly like orphans — deleting them mid-epoch silently
        loses rows."""
        with self.writer_lock():
            return self._vacuum_locked(keep_manifests)

    def _vacuum_locked(self, keep_manifests: int) -> list[str]:
        m = self.current_manifest()
        if m is None:
            return []
        current = int(m["epoch"])
        keep_manifests = max(1, keep_manifests)
        mdir = os.path.join(self.root, "manifests")
        epochs = sorted(
            int(f[len("epoch-"):-len(".json")])
            for f in os.listdir(mdir)
            if f.startswith("epoch-") and f.endswith(".json")
        )
        retained = [e for e in epochs if e <= current][-keep_manifests:]
        live: set[str] = set()
        for e in retained:
            with open(os.path.join(mdir, f"epoch-{e}.json")) as f:
                man = json.load(f)
            live |= {os.path.join(self.root, r) for r in man["files"].values()}
            for rels in man.get("deltas", {}).values():
                live |= {os.path.join(self.root, r) for r in rels}
        removed = []
        for e in epochs:
            if e not in retained:
                p = os.path.join(mdir, f"epoch-{e}.json")
                os.unlink(p)
                removed.append(p)
        parts_root = os.path.join(self.root, "parts")
        for dirpath, _dirs, fnames in os.walk(parts_root, topdown=False):
            for fn in fnames:
                p = os.path.join(dirpath, fn)
                # a .bloom sidecar lives and dies with its part file
                if p.removesuffix(".bloom") not in live and p not in live:
                    os.unlink(p)
                    removed.append(p)
            if not os.listdir(dirpath) and dirpath != parts_root:
                os.rmdir(dirpath)
        return removed
