"""Incremental materialized-view maintenance (IVM) over the lake.

A downstream aggregate — per-conversation live-turn counts — kept fresh by
refreshing ONLY the partitions whose parts changed since the view's last
epoch, instead of recomputing over the whole lake. This is the capability a
CDC engine exists to enable: the change stream has already been organized
into per-partition parts, so a view refresh is O(changed partitions), not
O(lake).

Design (exactly-once by construction, no increment log):
  * the view stores per-partition ABSOLUTE sub-aggregates
    (``view-<pkey>.parquet``: conv_id, n_turns, max_lsn for that partition)
    — absolutes are idempotent under re-runs where increments would need a
    transactional apply log;
  * a refresh diffs the lake manifest epoch against the view manifest:
    a partition is stale iff its base or any pending delta part lives in an
    epoch directory NEWER than the view's epoch (rel paths carry the epoch);
  * stale partitions recount via ``materialize_partition`` (so the view is
    correct under BOTH merge policies, tombstones and all — per-key
    resurrection, delete-then-update, makes counter-deltas unsound: the
    winning op decides liveness, so the recount goes through the same LWW
    read path as every consumer);
  * unchanged partitions carry forward by reference (metadata only);
  * the view manifest commits via tmp+rename after all parts are written —
    a crash mid-refresh leaves the old view fully readable.

Reading the view sums the per-partition sub-aggregates (a conversation's
turns spread over ~max_turn/turn_bucket partitions by the salted
partitioner), a shuffle over #convs rows — tiny next to the lake.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..state.lake import Lake
from .cdc import materialize_partition

_VIEW_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("n_turns", pa.int64()),
        pa.field("max_lsn", pa.int64()),
    ]
)


def _view_manifest(view_root: str) -> dict[str, Any]:
    p = os.path.join(view_root, "_view.json")
    if not os.path.exists(p):
        return {"epoch": -1, "files": {}}
    with open(p) as f:
        return json.load(f)


def _rel_epoch(rel: str) -> int:
    """Epoch a part file was written in (rel paths are parts/epoch-N/...)."""
    return int(os.path.basename(os.path.dirname(rel)).rsplit("-", 1)[1])


def _count_partition(base: str | None, deltas: list[str]) -> pa.Table:
    """Per-conversation live-turn counts of ONE partition via the same LWW
    read path every consumer uses (correct under tombstones/resurrection)."""
    t = materialize_partition(base, deltas)
    if t.num_rows == 0:
        return _VIEW_SCHEMA.empty_table()
    g = (
        pa.table({"conv_id": t["conv_id"], "lsn": t["lsn"]})
        .group_by("conv_id")
        .aggregate([("conv_id", "count"), ("lsn", "max")])
    )
    return pa.table(
        {
            "conv_id": g["conv_id"],
            "n_turns": g["conv_id_count"].cast(pa.int64()),
            "max_lsn": g["lsn_max"].cast(pa.int64()),
        }
    )


def refresh_turn_counts(view_root: str, lake_root: str) -> dict[str, Any]:
    """Bring the view up to the lake's committed epoch. Returns refresh
    stats; a no-op when the view is already current."""
    lake = Lake(lake_root)
    m = lake.current_manifest()
    if m is None:
        return {"epoch": None, "refreshed": 0, "carried": 0}
    epoch = int(m["epoch"])
    # the view is tied to the lake BUILD, not just an epoch number: a lake
    # rebuilt in place reuses epoch numbers and part paths, so an epoch-only
    # comparison would silently serve aggregates of the previous build.
    # Primary anchor: the lake_id minted at epoch 0 and carried through
    # every manifest (survives vacuum retention). Fallback for legacy lakes
    # without lake_id: the commit timestamp of the epoch the view refreshed
    # at, verified against that epoch's manifest — missing/absent values
    # NEVER count as a match, and an unverifiable anchor means a FULL
    # refresh, never a stale read.
    vm = _view_manifest(view_root)
    if int(vm["epoch"]) >= 0:
        lake_id = m.get("lake_id")
        if lake_id is not None:
            same_build = vm.get("lake_id") == lake_id
        else:
            anchor = os.path.join(
                lake.root, "manifests", f"epoch-{int(vm['epoch'])}.json"
            )
            same_build = False
            if os.path.exists(anchor):
                with open(anchor) as f:
                    stamp = json.load(f).get("committed_at")
                same_build = stamp is not None and stamp == vm.get("lake_commit")
        if not same_build:
            vm = {"epoch": -1, "files": {}}  # unverifiable → full refresh
    if int(vm["epoch"]) == epoch:
        return {"epoch": epoch, "refreshed": 0, "carried": len(vm["files"])}
    if int(vm["epoch"]) > epoch:
        vm = {"epoch": -1, "files": {}}

    files = m["files"]
    deltas = m.get("deltas", {})
    pkeys = sorted({int(k) for k in files} | {int(k) for k in deltas})
    vfiles: dict[str, str] = dict(vm["files"])
    since = int(vm["epoch"])
    stale = []
    for pk in pkeys:
        rels = ([files[str(pk)]] if str(pk) in files else []) + deltas.get(
            str(pk), []
        )
        if str(pk) not in vfiles or any(_rel_epoch(r) > since for r in rels):
            stale.append(pk)

    out_dir = os.path.join(view_root, f"epoch-{epoch}")
    os.makedirs(out_dir, exist_ok=True)
    root = lake.root

    if stale:
        parts = lake.partition_files(stale)
        items = [
            {"pkey": pk, "base": b, "deltas": ds}
            for pk, (b, ds) in sorted(parts.items())
        ]

        def recount(batch: pa.Table) -> pa.Table:
            rows = []
            for i in range(batch.num_rows):
                pk = int(batch["pkey"][i].as_py())
                counts = _count_partition(
                    batch["base"][i].as_py(), batch["deltas"][i].as_py() or []
                )
                rel = os.path.join(f"epoch-{epoch}", f"view-{pk:05d}.parquet")
                dst = os.path.join(view_root, rel)
                tmp = dst + ".tmp"
                pq.write_table(counts, tmp)
                os.replace(tmp, dst)  # idempotent under task retry
                rows.append({"pkey": pk, "rel": rel})
            return pa.Table.from_pylist(rows)

        refreshed = (
            rd.from_items(items, override_num_blocks=max(1, len(items)))
            .map_batches(recount, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        for r in refreshed:
            vfiles[str(int(r["pkey"]))] = r["rel"]

    # partitions delete_where/retention dropped entirely leave the view
    live = {str(pk) for pk in pkeys}
    vfiles = {pk: rel for pk, rel in vfiles.items() if pk in live}

    tmp = os.path.join(view_root, "_view.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "epoch": epoch,
                "lake_id": m.get("lake_id"),  # build identity (primary)
                "lake_commit": m.get("committed_at"),  # legacy fallback anchor
                "files": vfiles,
                "committed_at": time.time(),
            },
            f,
        )
    os.replace(tmp, os.path.join(view_root, "_view.json"))  # commit point

    # GC view epoch dirs holding no referenced sub-view (carry-forward keeps
    # old dirs alive as long as any partition still references them)
    alive_dirs = {os.path.dirname(rel) for rel in vfiles.values()}
    for d in glob.glob(os.path.join(view_root, "epoch-*")):
        if os.path.basename(d) not in alive_dirs:
            shutil.rmtree(d, ignore_errors=True)

    return {"epoch": epoch, "refreshed": len(stale), "carried": len(vfiles) - len(stale)}


def read_turn_counts(view_root: str) -> "rd.Dataset":
    """The maintained view: per-conversation totals across partitions (a
    conversation spans ~max_turn/turn_bucket partitions under the salted
    partitioner, so sub-aggregates sum here — over #convs rows, tiny)."""
    import pandas as pd

    from ..stages.shuffle import bucketed_map_groups

    vm = _view_manifest(view_root)
    paths = [os.path.join(view_root, rel) for rel in vm["files"].values()]
    if not paths:
        return rd.from_arrow(_VIEW_SCHEMA.empty_table())
    total = sum(os.path.getsize(p) for p in paths)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("conv_id", sort=False)
            .agg(n_turns=("n_turns", "sum"), max_lsn=("max_lsn", "max"))
            .reset_index()
        )

    return bucketed_map_groups(
        rd.read_parquet(paths), ["conv_id"], combine, input_bytes=total
    )
