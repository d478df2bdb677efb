"""Lake integrity checker (``fsck``) — the operational health check.

Reference analog: ``DatabaseManager.health_check``
(reference: src/nostr_pipeline/loaders/database.py:107-115) — but a lake of
immutable files can be audited much more deeply than a live DB connection
probe, and at 100 TB you want that audit to be a *parallel scan job*, not a
driver loop.

Two tiers:

* **shallow** (metadata-only, driver-side, O(manifest)): the commit pointer
  parses and agrees with its manifest, every referenced base/delta part
  exists on disk, watermarks cover every partition that has files, the
  retained manifest chain is readable, and orphan part files (invisible to
  every retained manifest — vacuum candidates, expected after crashed
  epochs) are counted.
* **deep** (adds a Ray Data scan, one task per part file): parquet footer
  readable and row count matches the footer, part schema unifies with the
  manifest schema, rows sorted by (conv_id, turn_idx) (the read-side
  pruning contract), max(lsn) ≤ the partition watermark, every row routes
  to the part's pkey under the manifest's persisted partitioning (mis-routed
  rows would make point lookups silently miss), and the bloom sidecar has
  no false negatives for the part's conv_ids.

Findings are rows, not exceptions: fsck NEVER mutates the lake and always
returns a full report — ``{"ok": bool, "errors": [...], "warnings": [...]}``.
Missing bloom sidecars are warnings (they are optional accelerators);
everything that would return wrong query results is an error.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .lake import Lake


def _shallow(lake: Lake) -> tuple[list[dict], list[dict], dict[str, Any]]:
    errors: list[dict] = []
    warnings: list[dict] = []
    info: dict[str, Any] = {}

    ptr_path = os.path.join(lake.root, "_manifest.json")
    if not os.path.exists(ptr_path):
        errors.append({"check": "pointer", "detail": "_manifest.json missing"})
        return errors, warnings, info
    try:
        with open(ptr_path) as f:
            pointer = json.load(f)
        manifest = lake.current_manifest()
    except (json.JSONDecodeError, OSError, KeyError) as e:
        errors.append({"check": "pointer", "detail": f"unreadable: {e}"})
        return errors, warnings, info
    if manifest is None or int(manifest["epoch"]) != int(pointer["epoch"]):
        errors.append({
            "check": "pointer",
            "detail": f"pointer epoch {pointer.get('epoch')} != manifest "
                      f"epoch {None if manifest is None else manifest['epoch']}",
        })
        return errors, warnings, info
    info["epoch"] = int(manifest["epoch"])
    info["lake_id"] = manifest.get("lake_id")

    # every referenced file exists
    referenced: set[str] = set()
    missing = 0
    for pk, rel in manifest["files"].items():
        referenced.add(rel)
        if not os.path.exists(os.path.join(lake.root, rel)):
            missing += 1
            errors.append({"check": "part_exists", "pkey": int(pk), "file": rel})
    for pk, rels in manifest.get("deltas", {}).items():
        for rel in rels:
            referenced.add(rel)
            if not os.path.exists(os.path.join(lake.root, rel)):
                missing += 1
                errors.append({"check": "delta_exists", "pkey": int(pk), "file": rel})

    # watermarks cover every partition with data
    wm = manifest.get("watermarks", {})
    data_pks = set(manifest["files"]) | set(manifest.get("deltas", {}))
    for pk in sorted(data_pks):
        if pk not in wm:
            errors.append({"check": "watermark_missing", "pkey": int(pk)})

    # the retained manifest chain must be readable (time-travel window)
    retained = 0
    for mf in sorted(glob.glob(os.path.join(lake.root, "manifests", "epoch-*.json"))):
        try:
            with open(mf) as f:
                m = json.load(f)
            for rel in m["files"].values():
                referenced.add(rel)
            for rels in m.get("deltas", {}).values():
                referenced.update(rels)
            retained += 1
        except (json.JSONDecodeError, OSError, KeyError) as e:
            errors.append({"check": "manifest_chain",
                           "file": os.path.basename(mf), "detail": str(e)})
    info["retained_manifests"] = retained

    # orphans: on-disk parts invisible to every retained manifest. Expected
    # after a crashed (uncommitted) epoch — vacuum collects them; a large
    # count means vacuum hasn't run in a while.
    on_disk = {
        os.path.relpath(p, lake.root)
        for p in glob.glob(os.path.join(lake.root, "parts", "**", "*.parquet"),
                           recursive=True)
    }
    orphans = sorted(on_disk - referenced)
    info["parts_on_disk"] = len(on_disk)
    info["parts_referenced"] = len(referenced)
    info["orphans"] = len(orphans)
    if orphans:
        warnings.append({"check": "orphans", "count": len(orphans),
                         "sample": orphans[:5]})

    # sidecar presence (optional accelerators → warning only)
    current = set(manifest["files"].values())
    for rels in manifest.get("deltas", {}).values():
        current.update(rels)
    no_sidecar = [
        rel for rel in sorted(current)
        if os.path.exists(os.path.join(lake.root, rel))
        and not os.path.exists(os.path.join(lake.root, rel) + ".bloom")
    ]
    if no_sidecar:
        warnings.append({"check": "bloom_sidecars_missing",
                         "count": len(no_sidecar), "sample": no_sidecar[:5]})
    return errors, warnings, info


def _deep_check_parts(batch: pa.Table) -> pa.Table:
    """One Ray task per slice of part entries: read each part and verify
    the invariants that require looking at the data. Returns finding rows
    (empty batch = all good)."""
    from ..stages.cdc_stages import partition_key
    from . import bloom

    out: list[dict] = []
    for row in batch.to_pylist():
        path, pkey, wm = row["path"], row["pkey"], row["watermark"]
        schema_names = set(json.loads(row["schema_names"]))
        npart = row["num_partitions"]
        tbucket = row["turn_bucket"]
        try:
            t = pq.read_table(path)
        except Exception as e:  # noqa: BLE001 — any unreadable part is a finding
            out.append({"check": "part_readable", "file": path, "pkey": pkey,
                        "detail": str(e)[:200], "severity": "error"})
            continue
        md = pq.read_metadata(path)
        if md.num_rows != t.num_rows:
            out.append({"check": "footer_rows", "file": path, "pkey": pkey,
                        "detail": f"footer {md.num_rows} != data {t.num_rows}",
                        "severity": "error"})
        extra = set(t.column_names) - schema_names - {"pkey", "op"}
        if extra:
            out.append({"check": "schema", "file": path, "pkey": pkey,
                        "detail": f"columns outside manifest schema: {sorted(extra)}",
                        "severity": "error"})
        if t.num_rows == 0:
            continue
        # sorted by (conv_id, turn_idx) — the pruning/merge contract
        idx = pc.sort_indices(t, sort_keys=[("conv_id", "ascending"),
                                            ("turn_idx", "ascending")])
        if not pc.all(pc.equal(idx, pa.array(range(t.num_rows), pa.uint64()))).as_py():
            out.append({"check": "part_sorted", "file": path, "pkey": pkey,
                        "detail": "rows not in (conv_id, turn_idx) order",
                        "severity": "error"})
        # lsn bounded by the committed watermark
        max_lsn = pc.max(t["lsn"]).as_py()
        if max_lsn is not None and wm is not None and max_lsn > wm:
            out.append({"check": "lsn_watermark", "file": path, "pkey": pkey,
                        "detail": f"max lsn {max_lsn} > watermark {wm}",
                        "severity": "error"})
        # every row routes to this part's pkey under the lake's partitioner
        if npart is not None:
            got = partition_key(t["conv_id"], t["turn_idx"], npart, tbucket)
            bad = int((got != pkey).sum())
            if bad:
                out.append({"check": "pkey_routing", "file": path, "pkey": pkey,
                            "detail": f"{bad} rows route elsewhere",
                            "severity": "error"})
        # bloom sidecar: false negatives would silently drop point reads
        # (vectorized bulk probe — parts hold millions of conversations)
        sp = bloom.sidecar_path(path)
        if os.path.exists(sp):
            with open(sp, "rb") as f:
                blob = f.read()
            if not bloom.header_ok(blob):
                # fail-open blob: reads stay correct but lose all pruning —
                # contains_all would answer True trivially, so flag instead
                out.append({"check": "bloom_fail_open", "file": path,
                            "pkey": pkey,
                            "detail": "sidecar header invalid — reads fail "
                                      "open; run fsck --repair",
                            "severity": "warning"})
                continue
            distinct = np.asarray(pc.unique(t["conv_id"]).to_pylist(),
                                  dtype=object)
            if not bloom.contains_all(blob, distinct):
                out.append({"check": "bloom_false_negative", "file": path,
                            "pkey": pkey,
                            "detail": "sidecar misses committed conv_ids",
                            "severity": "error"})
    return pa.table({
        "check": pa.array([r["check"] for r in out], pa.string()),
        "file": pa.array([r["file"] for r in out], pa.string()),
        "pkey": pa.array([r["pkey"] for r in out], pa.int64()),
        "detail": pa.array([r["detail"] for r in out], pa.string()),
        "severity": pa.array([r["severity"] for r in out], pa.string()),
    })


def repair_sidecars(lake_root: str) -> int:
    """Rebuild missing/corrupt bloom sidecars for every committed part —
    the one repair that is always safe (sidecars are derived, deterministic
    accelerators; rebuild = read conv_id column + atomic tmp-rename write).
    Parallel Ray tasks, one per part slice. Returns the rebuild count.
    Everything else fsck finds needs an operator decision (restore from a
    retained manifest, re-apply the binlog, or vacuum) — never auto-fixed."""
    import ray.data as rd

    from . import bloom

    lake = Lake(lake_root)
    todo = []
    for _pk, (base, ds) in lake.partition_files().items():
        for p in ([base] if base else []) + ds:
            sp = bloom.sidecar_path(p)
            ok = False
            if os.path.exists(sp):
                with open(sp, "rb") as f:
                    # full header validation — a truncated body behind a
                    # valid magic fails open on every read (permanent
                    # silent pruning loss) and must be rebuilt too
                    ok = bloom.header_ok(f.read())
            if os.path.exists(p) and not ok:
                todo.append({"path": p})
    if not todo:
        return 0

    def rebuild(batch: pa.Table) -> pa.Table:
        for path in batch["path"].to_pylist():
            bloom.write_sidecar(path, pq.read_table(path, columns=["conv_id"])["conv_id"])
        return batch

    rd.from_items(todo).map_batches(
        rebuild, batch_format="pyarrow", batch_size=4
    ).materialize()
    return len(todo)


def check_lake(lake_root: str, deep: bool = False) -> dict[str, Any]:
    """Audit a lake; returns ``{"ok", "errors", "warnings", "info"}``.
    Shallow tier is metadata-only; ``deep=True`` adds a Ray Data scan of
    every committed part (parallel, one task per part slice)."""
    lake = Lake(lake_root)
    errors, warnings, info = _shallow(lake)
    if deep and not any(e["check"] == "pointer" for e in errors):
        import ray.data as rd

        manifest = lake.current_manifest()
        part_cfg = manifest.get("partitioning") or {}
        npart = part_cfg.get("num_partitions")
        tbucket = part_cfg.get("turn_bucket", 0)
        wm = {int(k): int(v) for k, v in manifest.get("watermarks", {}).items()}
        schema_names = json.dumps([n for n, _ in manifest.get("schema", [])])
        items = []
        for pk, (base, ds) in lake.partition_files().items():
            for p in ([base] if base else []) + ds:
                if os.path.exists(p):  # missing already reported by shallow
                    items.append({
                        "path": p, "pkey": pk, "watermark": wm.get(pk),
                        "schema_names": schema_names,
                        "num_partitions": npart, "turn_bucket": tbucket,
                    })
        info["parts_deep_checked"] = len(items)
        if items:
            findings = (
                rd.from_items(items)
                .map_batches(_deep_check_parts, batch_format="pyarrow",
                             batch_size=4)
                .take_all()  # findings only — bounded, near-always empty
            )
            for f in findings:
                sev = f.pop("severity")
                (errors if sev == "error" else warnings).append(f)
    return {"ok": not errors, "errors": errors, "warnings": warnings,
            "info": info}


def deep_scan_files(files: list[str], check_fn, ctx: dict) -> list[str]:
    """Distributed per-file content audit for the sidecar stores (near-dup
    index / IVF index / curator): run ``check_fn(path, ctx) -> list[str]``
    over every file as a Ray Data job (one slice per task, the lake's deep
    pattern — never a driver read loop), returning the error strings.
    ``ctx`` (meta the checks validate against — band counts, centroids,
    thresholds) ships through the object store once."""
    import pandas as pd
    import ray
    import ray.data as rd

    from ..stages.actors import cached_get

    if not files:
        return []
    ctx_ref = ray.put(ctx)

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        c = cached_get(ctx_ref)
        errs: list[str] = []
        for p in batch["item"]:
            try:
                errs.extend(check_fn(p, c))
            except Exception as e:  # unreadable/torn file IS a finding
                errs.append(f"{os.path.basename(p)}: unreadable ({e})")
        return pd.DataFrame({"err": pd.Series(errs, dtype="object")})

    out = (
        rd.from_items(files, override_num_blocks=min(len(files), 64))
        .map_batches(run, batch_format="pandas")
        .to_pandas()  # findings only — bounded, near-always empty
    )
    return out["err"].tolist() if len(out) else []
