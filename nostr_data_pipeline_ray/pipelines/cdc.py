"""The CDC apply pipeline: binlog/WAL tail → LWW upsert → exactly-once lake.

Ray shape (SURVEY.md §3.1):

    binlog segments (LSN > watermark)
      → read_parquet                      (per-segment; schemas may differ)
      → map_batches(conform_schema)       (additive evolution, Arrow unify)
      → map_batches(precombine)           (map-side LWW combine — bounds the shuffle)
      → map_batches(add_pkey)             (hash(conv_id, turn//bucket) % P)
      → map_batches(watermark_filter)     (row-level idempotence on replay)
      → union(current snapshot partitions touched by the delta)
      → groupby("pkey").map_groups(merge+write)   # the ONE all-to-all exchange
      → lineage rows → manifest commit (atomic rename)

Reference analog: the micro-batch loop at src/nostr_pipeline/pipeline.py:157-258
(drain queue → dedup → enrich → upsert in one transaction per batch), with the
transaction replaced by the two-phase manifest commit and arrival order
replaced by the LSN total order.
"""

from __future__ import annotations

import glob
import os
import time
from functools import partial
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..config import EngineConfig
from ..model import LAKE_SCHEMA
from ..stages.cdc_stages import add_pkey, conform_schema, precombine, watermark_filter
from ..state.lake import Lake


def list_segments(binlog_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(binlog_dir, "*.parquet")))


def _merge_schema(segment_paths: list[str], snapshot_paths: list[str]) -> pa.Schema:
    """Unified working schema for the merge (additive evolution point)."""
    schemas = [pq.read_schema(p) for p in segment_paths]
    for p in snapshot_paths[:1]:  # all snapshot parts share one schema
        snap = pq.read_schema(p)
        if "op" not in snap.names:
            snap = snap.append(pa.field("op", pa.string()))
        schemas.append(snap.remove(snap.get_field_index("pkey")) if "pkey" in snap.names else snap)
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    if "pkey" in unified.names:
        unified = unified.remove(unified.get_field_index("pkey"))
    return unified.append(pa.field("pkey", pa.int32()))


class MergeWrite:
    """Per-partition final LWW reduce + part-file write (phase 1 of 2PC).

    Called once per pkey group by ``groupby("pkey").map_groups``. Writes the
    new snapshot part at a deterministic path (idempotent under task retry)
    and returns ONE lineage row — per-partition lineage + throughput metrics
    are first-class output, not logs (north_rule requirement).
    """

    def __init__(self, lake_root: str, epoch: int):
        self.lake = Lake(lake_root)
        self.epoch = epoch

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        pkey = int(group["pkey"][0].as_py())
        rows_in = group.num_rows

        # final LWW: max-lsn row per (conv_id, turn_idx); the snapshot rows
        # (op == null) compete on their stored lsn.
        import numpy as np

        conv = group["conv_id"].combine_chunks() if isinstance(
            group["conv_id"], pa.ChunkedArray
        ) else group["conv_id"]
        codes = pc.dictionary_encode(conv)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        code_np = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        turn = group["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = code_np * np.int64(1 << 32) + turn
        lsn = group["lsn"].to_numpy(zero_copy_only=False)
        order = np.argsort(lsn, kind="stable")
        rev = order[::-1]
        _, first_pos = np.unique(key[rev], return_index=True)
        keep = rev[first_pos]
        winners = group.take(keep)
        max_lsn = int(lsn.max()) if rows_in else -1

        # drop tombstones (max-lsn op == delete ⇒ key is gone)
        is_del = pc.fill_null(pc.equal(winners["op"], "delete"), False)
        alive = winners.filter(pc.invert(is_del))
        alive = alive.drop_columns(["op"])
        # store each part sorted by the invariant order so per-file reads are
        # already (conv_id, turn_idx)-ordered
        idx = pc.sort_indices(
            alive, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        alive = alive.take(idx)

        rel = self.lake.part_path(self.epoch, pkey)
        abspath = os.path.join(self.lake.root, rel)
        os.makedirs(os.path.dirname(abspath), exist_ok=True)
        pq.write_table(alive, abspath)

        return pa.table(
            {
                "pkey": pa.array([pkey], pa.int32()),
                "epoch": pa.array([self.epoch], pa.int64()),
                "rows_in": pa.array([rows_in], pa.int64()),
                "rows_out": pa.array([alive.num_rows], pa.int64()),
                "max_lsn": pa.array([max_lsn], pa.int64()),
                "bytes": pa.array([os.path.getsize(abspath)], pa.int64()),
                "seconds": pa.array([time.time() - t0], pa.float64()),
                "path": pa.array([rel], pa.string()),
            }
        )


def apply_epoch(
    lake: Lake, segment_paths: list[str], config: EngineConfig
) -> dict[str, Any]:
    """Apply one epoch (a micro-batch of binlog segments) exactly once."""
    t0 = time.time()
    epoch = lake.current_epoch() + 1
    seg_names = [os.path.basename(p) for p in segment_paths]
    watermarks = lake.watermarks()

    snapshot_all = lake.snapshot_files()
    schema = _merge_schema(segment_paths, snapshot_all)
    data_schema = schema.remove(schema.get_field_index("pkey"))

    # --- delta: read (per segment, schemas may differ), conform, precombine,
    # partition, watermark-filter ------------------------------------------
    delta = None
    for p in segment_paths:
        part = rd.read_parquet(p).map_batches(
            partial(conform_schema, target=data_schema),
            batch_format="pyarrow",
            batch_size=config.batch_size,
        )
        delta = part if delta is None else delta.union(part)
    delta = (
        delta.map_batches(precombine, batch_format="pyarrow", batch_size=config.batch_size)
        .map_batches(
            partial(
                add_pkey,
                num_partitions=config.num_partitions,
                turn_bucket=config.turn_bucket,
            ),
            batch_format="pyarrow",
            batch_size=config.batch_size,
        )
        .map_batches(
            partial(watermark_filter, watermarks=watermarks),
            batch_format="pyarrow",
            batch_size=config.batch_size,
        )
    )
    # the epoch's delta is a bounded micro-batch — materializing it lets us
    # learn the touched partitions without a second read of the segments
    delta = delta.materialize()

    touched = sorted(
        r["pkey"] for r in delta.groupby("pkey").count().take_all()
    )
    if not touched:
        # nothing new (pure replay) — commit only the segment bookkeeping
        lake.commit_epoch(epoch, {}, {}, seg_names, {}, data_schema,
                          stats={"rows_applied": 0, "seconds": time.time() - t0})
        return {"epoch": epoch, "rows_applied": 0, "partitions": 0,
                "seconds": time.time() - t0}

    # --- snapshot side: ONLY the touched partitions are read & rewritten ---
    snap_files = lake.snapshot_files(touched)
    both = delta
    if snap_files:
        snap = rd.read_parquet(snap_files).map_batches(
            partial(conform_schema, target=schema),
            batch_format="pyarrow",
            batch_size=config.batch_size,
        )
        both = delta.union(snap)

    # --- the one shuffle: co-locate each partition, merge, write -----------
    mw = MergeWrite(lake.root, epoch)

    def merge_write(group: pa.Table) -> pa.Table:
        return mw(group)

    lineage_ds = both.groupby("pkey").map_groups(merge_write, batch_format="pyarrow")
    lineage_rows = lineage_ds.take_all()  # ≤ num_partitions rows

    new_files = {int(r["pkey"]): r["path"] for r in lineage_rows}
    new_wm = {int(r["pkey"]): int(r["max_lsn"]) for r in lineage_rows}
    lineage = {
        int(r["pkey"]): {k: (float(v) if k == "seconds" else v) for k, v in r.items() if k != "pkey"}
        for r in lineage_rows
    }
    rows_applied = int(sum(r["rows_in"] for r in lineage_rows))
    seconds = time.time() - t0
    lake.commit_epoch(
        epoch, new_files, new_wm, seg_names, lineage, data_schema,
        stats={"rows_applied": rows_applied, "seconds": seconds,
               "events_per_sec": rows_applied / max(seconds, 1e-9)},
    )
    return {
        "epoch": epoch,
        "rows_applied": rows_applied,
        "partitions": len(touched),
        "seconds": seconds,
    }


def apply_changelog(
    lake_root: str, binlog_dir: str, config: EngineConfig | None = None
) -> dict[str, Any]:
    """Tail the binlog: apply all not-yet-committed segments, epoch by epoch.

    Resume = this very function: committed segments are skipped via the
    manifest (crash between phase 1 and phase 2 re-runs the epoch; committed
    epochs are no-ops).
    """
    config = config or EngineConfig()
    lake = Lake(lake_root)
    applied = lake.applied_segments()
    pending = [p for p in list_segments(binlog_dir) if os.path.basename(p) not in applied]
    t0 = time.time()
    total_rows = 0
    epochs = []
    for i in range(0, len(pending), config.epoch_segments):
        out = apply_epoch(lake, pending[i : i + config.epoch_segments], config)
        total_rows += out["rows_applied"]
        epochs.append(out)
    seconds = time.time() - t0
    return {
        "epochs": epochs,
        "segments_applied": len(pending),
        "rows_applied": total_rows,
        "seconds": seconds,
        "events_per_sec": total_rows / max(seconds, 1e-9),
    }


def read_final(lake_root: str, sort: bool = False) -> "rd.Dataset":
    """The current lake state as a Dataset (transcript columns + lsn)."""
    lake = Lake(lake_root)
    files = lake.snapshot_files()
    if not files:
        return rd.from_arrow(LAKE_SCHEMA.empty_table())
    ds = rd.read_parquet(files).drop_columns(["pkey"])
    if sort:
        ds = ds.sort(["conv_id", "turn_idx"])
    return ds


def final_table(lake_root: str) -> pa.Table:
    """Driver-side sorted snapshot for tests/oracle comparison (small scales)."""
    import ray

    ds = read_final(lake_root, sort=False)
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        return LAKE_SCHEMA.empty_table()
    t = pa.concat_tables(tables, promote_options="permissive")
    idx = pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    return t.take(idx)
