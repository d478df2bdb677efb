"""The CDC apply pipeline: binlog/WAL tail → LWW upsert → exactly-once lake.

Ray shape (SURVEY.md §3.1), all stages embarrassingly-parallel maps:

    binlog segments (not yet committed)
      → read_parquet                  (grouped by file schema)
      → map_batches(precombine)       (map-side LWW combine — bounds the exchange)
      → map_batches(add_pkey)         (hash(conv_id, turn//bucket) % P)
      → map_batches(watermark_filter) (row-level idempotence on replay)
      → map_batches(SplitStage)       (map-side exchange: write each block's
                                       rows into per-partition staged files —
                                       the shuffle-file layout every external
                                       shuffle uses; returns metadata rows)
      → per-partition MergeTask fan-out (staged delta + snapshot part →
                                       LWW reduce → sorted part file)
      → lineage rows → manifest commit (atomic rename)

Why not ``groupby("pkey").map_groups``: profiled on 20M events, Ray's
sort-shuffle burned 74 s of remote time against ~50 s for ALL map stages
combined and capped scaling at ~8 cores; the staged exchange is pure map
fan-out on both sides. On a multi-node cluster the staged files live on
shared storage (exactly how external/serverless shuffles work).

Reference analog: the micro-batch loop at src/nostr_pipeline/pipeline.py:157-258
(drain queue → dedup → enrich → upsert in one transaction per batch), with the
transaction replaced by the two-phase manifest commit and arrival order
replaced by the LSN total order.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
from datetime import datetime
from functools import partial
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.feather as feather
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..config import EngineConfig
from ..model import CHANGELOG_SCHEMA, LAKE_SCHEMA
from ..stages.cdc_stages import (
    add_pkey,
    conform_schema,
    precombine,
    watermark_filter,
)
from ..state import bloom
from ..state.lake import Lake


def list_segments(binlog_dir: str) -> list[str]:
    """LSN-ordered segment files: parquet (native) or JSONL (the reference
    ingests JSON events — relay_client.py:149-188; a JSONL segment is that
    stream spooled to disk). Order is by file name across both formats."""
    return sorted(
        glob.glob(os.path.join(binlog_dir, "*.parquet"))
        + glob.glob(os.path.join(binlog_dir, "*.jsonl"))
    )


# path → ((mtime, size), (schema, rows)): one parse pass per JSONL segment,
# shared by _segment_schema and _segment_rows; keyed by path so a changed
# file self-evicts its stale entry (long-running follow loops don't grow)
_JSONL_META: dict = {}


_INT_FIELDS = ("turn_idx", "lsn")
_STR_FIELDS = ("conv_id", "role", "text", "tool", "op")


def _line_error(obj) -> str | None:
    """Why a decoded JSONL line cannot become a change event, or None.

    Shared by the metadata parse and the quarantine split so the two passes
    can never disagree about which lines are bad. Checks the typed
    changelog fields only (extra keys are additive string columns by the
    evolution contract — any JSON scalar casts to string downstream); a
    line that passes here can still fail the Arrow cast in principle, and
    that residual failure stays a loud epoch error."""
    if not isinstance(obj, dict):
        return f"not a JSON object ({type(obj).__name__})"
    for k in _INT_FIELDS:
        v = obj.get(k)
        if v is not None and (isinstance(v, bool) or not isinstance(v, int)):
            return f"field {k}: expected integer, got {type(v).__name__}"
    for k in _STR_FIELDS:
        v = obj.get(k)
        if v is not None and not isinstance(v, str):
            return f"field {k}: expected string, got {type(v).__name__}"
    ts = obj.get("ts")
    if ts is not None:
        # both encodings the conform cast accepts: ISO-8601 strings and
        # integer epoch microseconds (int64 → timestamp[us] is a unit cast)
        if isinstance(ts, bool) or not isinstance(ts, (str, int)):
            return (
                "field ts: expected ISO-8601 string or epoch-us integer, "
                f"got {type(ts).__name__}"
            )
        if isinstance(ts, str):
            try:
                datetime.fromisoformat(ts)
            except ValueError:
                return f"field ts: not ISO-8601: {ts!r}"
    return None


def _parse_jsonl_meta(
    path: str,
) -> tuple[pa.Schema, int, int, str | None, tuple]:
    """Single-pass JSONL metadata parse: the KEY UNION over every line (a
    key may first appear mid-file — JSON omits absent fields, and taking
    only the first line's keys would silently drop an evolved column at
    conform time) plus the true VALID row count (no trailing-newline
    undercount). Malformed lines never raise here — they're counted and the
    first error described, so the apply can choose its policy
    (``EngineConfig.on_malformed``: fail loudly, or quarantine) with the
    detection already paid for by this pass. Pure function — also shipped
    as a Ray task by ``prefetch_segment_meta`` so a follow-mode lake fed
    many JSONL segments parses them in parallel, not serially on the
    driver. Returns (schema, valid_rows, bad_lines, first_error,
    type_signature) — the signature is each key's observed JSON kind
    (sorted (key, kind) pairs, nulls transparent): Arrow's JSON reader
    infers one type per column per read, and Ray coalesces blocks across
    files into batches, so the apply may only feed files of IDENTICAL
    signature to one read_json call (the JSONL twin of the parquet path's
    group-by-identical-schema). A key with two non-null kinds INSIDE one
    file is unreadable by any inference path and is reported as
    kind "mixed" for the apply to reject loudly."""
    keys: dict[str, None] = {}  # insertion-ordered union
    kinds: dict[str, str] = {}  # key -> json kind ("mixed" on conflict)
    rows = 0
    bad = 0
    first_err: str | None = None
    with open(path) as f:
        for line_no, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            try:
                parsed = json.loads(line)
                err = _line_error(parsed)
            except ValueError as ex:  # json.JSONDecodeError
                parsed, err = None, str(ex)
            if err is not None:
                bad += 1
                if first_err is None:
                    first_err = f"line {line_no}: {err}"
                continue
            rows += 1
            for k, v in parsed.items():
                keys.setdefault(k)
                if v is None:
                    continue
                kind = type(v).__name__
                prev = kinds.get(k)
                if prev is None:
                    kinds[k] = kind
                elif prev != kind:
                    kinds[k] = "mixed"
    sig = tuple(sorted(kinds.items()))
    if not keys:
        return LAKE_SCHEMA, rows, bad, first_err, sig
    fields = []
    for k in keys:
        i = CHANGELOG_SCHEMA.get_field_index(k)
        fields.append(
            CHANGELOG_SCHEMA.field(i) if i >= 0 else pa.field(k, pa.string())
        )
    return pa.schema(fields), rows, bad, first_err, sig


def _jsonl_meta(path: str) -> tuple[pa.Schema, int, int, str | None, tuple]:
    """Cached JSONL metadata (schema-less formats pay a parse where parquet
    pays a footer read); one parse per (path, mtime, size)."""
    stat = os.stat(path)
    ver = (stat.st_mtime_ns, stat.st_size)
    hit = _JSONL_META.get(path)
    if hit is not None and hit[0] == ver:
        return hit[1]
    meta = _parse_jsonl_meta(path)
    _JSONL_META[path] = (ver, meta)
    return meta


def prefetch_segment_meta(paths: list[str]) -> None:
    """Warm the JSONL metadata cache for ``paths`` with one Ray task per
    uncached segment (parallel parse instead of a serial driver loop), and
    evict cache entries for paths no longer listed — a long-running follow
    over a rotating binlog dir would otherwise grow the cache without
    bound."""
    live = set(paths)
    for stale in [p for p in _JSONL_META if p not in live]:
        del _JSONL_META[stale]
    todo = []
    for p in paths:
        if not p.endswith(".jsonl"):
            continue
        stat = os.stat(p)
        ver = (stat.st_mtime_ns, stat.st_size)
        hit = _JSONL_META.get(p)
        if hit is None or hit[0] != ver:
            todo.append((p, ver))
    if len(todo) <= 1:
        return  # nothing to parallelize; the lazy cached path handles it
    import ray as _ray

    task = _ray.remote(num_cpus=1)(_parse_jsonl_meta)
    metas = _ray.get([task.remote(p) for p, _ in todo])
    for (p, ver), meta in zip(todo, metas):
        _JSONL_META[p] = (ver, meta)


def _segment_schema(path: str) -> pa.Schema:
    """Logical schema of a segment. JSONL carries no schema — map its keys
    onto the changelog schema's types (extra keys are additive string
    columns, the schema-evolution contract)."""
    if path.endswith(".jsonl"):
        return _jsonl_meta(path)[0]
    return pq.read_schema(path)


def _segment_rows(path: str) -> int:
    if path.endswith(".jsonl"):
        return _jsonl_meta(path)[1]
    return pq.read_metadata(path).num_rows


def _segment_bad(path: str) -> tuple[int, str | None]:
    """(malformed-line count, first error) — parquet segments carry their
    own integrity (footer/checksums) and report 0 here."""
    if path.endswith(".jsonl"):
        meta = _jsonl_meta(path)
        return meta[2], meta[3]
    return 0, None


def _quarantine_segment(path: str, qdir: str) -> pa.Table:
    """Dead-letter split of a dirty JSONL segment (quarantine policy):
    valid lines return as an Arrow table (same schema-on-read inference the
    clean read_json path feeds into conform_schema); malformed lines land
    in ``qdir/<segment>.parquet`` as (segment, line_no, error, raw) via
    tmp+rename — the file is keyed by segment name, so an epoch retry
    overwrites it idempotently. Shipped as a Ray task: one per dirty
    segment, off the driver."""
    good: list[dict] = []
    seg = os.path.basename(path)
    q_line, q_err, q_raw = [], [], []
    with open(path) as f:
        for line_no, line in enumerate(f, 1):
            stripped = line.strip()
            if not stripped:
                continue
            try:
                parsed = json.loads(stripped)
                err = _line_error(parsed)
            except ValueError as ex:
                parsed, err = None, str(ex)
            if err is None:
                good.append(parsed)
            else:
                q_line.append(line_no)
                q_err.append(err)
                q_raw.append(stripped)
    os.makedirs(qdir, exist_ok=True)
    qt = pa.table(
        {
            "segment": pa.array([seg] * len(q_line), pa.string()),
            "line_no": pa.array(q_line, pa.int64()),
            "error": pa.array(q_err, pa.string()),
            "raw": pa.array(q_raw, pa.string()),
        }
    )
    tmp = os.path.join(qdir, f".{seg}.parquet.tmp-{os.getpid()}")
    pq.write_table(qt, tmp)
    os.replace(tmp, os.path.join(qdir, f"{seg}.parquet"))
    return pa.Table.from_pylist(good)


def read_quarantine(lake_root: str) -> pa.Table:
    """All dead-letter rows of a lake (empty-shaped when none exist)."""
    qdir = os.path.join(lake_root, "_quarantine")
    shape = pa.schema(
        [("segment", pa.string()), ("line_no", pa.int64()),
         ("error", pa.string()), ("raw", pa.string())]
    )
    if not os.path.isdir(qdir):
        return shape.empty_table()
    files = sorted(
        os.path.join(qdir, f) for f in os.listdir(qdir) if f.endswith(".parquet")
    )
    if not files:
        return shape.empty_table()
    return pa.concat_tables([pq.read_table(f) for f in files])


def _read_segments(paths: list[str], columns: list[str] | None = None) -> "rd.Dataset":
    """Mixed-format segment read: column-pruned read_parquet for parquet,
    read_json (+ projection) for JSONL."""
    pq_paths = [p for p in paths if p.endswith(".parquet")]
    js_paths = [p for p in paths if p.endswith(".jsonl")]
    ds = rd.read_parquet(pq_paths, columns=columns) if pq_paths else None
    if js_paths:
        js = rd.read_json(js_paths)
        if columns is not None:
            js = js.select_columns(columns)
        ds = js if ds is None else ds.union(js)
    if ds is None:
        return rd.from_arrow(LAKE_SCHEMA.empty_table())
    return ds


def _snapshot_schemas(snapshot_paths: list[str]) -> list[pa.Schema]:
    """Distinct schemas across the current snapshot, one footer read per
    epoch directory — all parts written within an epoch share that epoch's
    unified schema, but an epoch that touches only SOME partitions leaves
    carried-forward parts on their older schema, so the snapshot as a whole
    can be mixed-schema after partial evolution epochs. O(#epochs alive),
    not O(#partitions)."""
    by_dir: dict[str, str] = {}
    for p in snapshot_paths:
        by_dir.setdefault(os.path.dirname(p), p)
    distinct: list[pa.Schema] = []
    for _, p in sorted(by_dir.items()):
        s = pq.read_schema(p)
        if not any(s.equals(o) for o in distinct):
            distinct.append(s)
    return distinct


def _merge_schema(segment_paths: list[str], snapshot_paths: list[str]) -> pa.Schema:
    """Unified working schema for the merge (additive evolution point)."""
    schemas = [_segment_schema(p) for p in segment_paths]
    for snap in _snapshot_schemas(snapshot_paths):
        if "op" not in snap.names:
            snap = snap.append(pa.field("op", pa.string()))
        schemas.append(
            snap.remove(snap.get_field_index("pkey")) if "pkey" in snap.names else snap
        )
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    if "pkey" in unified.names:
        unified = unified.remove(unified.get_field_index("pkey"))
    if "op" not in unified.names:
        # a first epoch fed ONLY op-less JSONL segments (a raw spooled
        # stream where every event is an insert) must still merge: op=null
        # means upsert throughout the read/merge path (materialize_partition
        # appends the same column defensively; the write path must match or
        # MergeTask KeyErrors on winners["op"])
        unified = unified.append(pa.field("op", pa.string()))
    return unified


def lww_reduce(table: pa.Table) -> tuple[pa.Table, int]:
    """Keep the max-(lsn, input-position) row per (conv_id, turn_idx).

    Ties on lsn (duplicate delivery) break by stable position — the
    deterministic total order of SURVEY.md §7.4. Returns (winners, max_lsn).
    """
    if table.num_rows == 0:
        return table, -1
    conv = table["conv_id"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    codes = pc.dictionary_encode(conv)
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    code_np = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = table["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = code_np * np.int64(1 << 32) + turn
    lsn = table["lsn"].to_numpy(zero_copy_only=False)
    order = np.argsort(lsn, kind="stable")
    rev = order[::-1]
    _, first_pos = np.unique(key[rev], return_index=True)
    if len(first_pos) == table.num_rows:
        return table, int(lsn.max())  # no duplicates — zero-copy passthrough
    mask = np.zeros(table.num_rows, dtype=bool)
    mask[rev[first_pos]] = True
    return table.filter(pa.array(mask)), int(lsn.max())


class SplitStage:
    """Map-side exchange: write each block's rows into per-partition staged
    delta files and return per-(block, pkey) metadata rows.

    File names are a content fingerprint (lsn range + row count + a digest
    of the slice's per-row identity keys), so a retried task — deterministic
    upstream → identical slice → identical name — overwrites its own output,
    while two DIFFERENT blocks of one partition can never collide: their
    row-key multisets differ, so the digests differ. (Same-digest overwrite
    therefore implies an identical row-key multiset, where equal-(key, lsn)
    rows are interchangeable under the LWW tie rule — nothing is lost.)
    Before the digest, blocks straddled by equal-LSN duplicate-delivery rows
    could share (min, max, count) and silently drop rows.
    """

    def __init__(
        self,
        staged_root: str,
        fmt: str = "parquet",
        dict_encode: bool = False,
    ):
        # partitioning is fully decided upstream (the precomputed 'pkey'
        # column) — this stage only groups rows by it and writes
        self.staged_root = staged_root
        self.fmt = fmt
        self.dict_encode = dict_encode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"pkey": pa.array([], pa.int32()), "rows": pa.array([], pa.int64()),
                 "max_lsn": pa.array([], pa.int64())}
            )
        pk = batch["pkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        batch = batch.take(order)
        # per-row identity hash for the filename digest: reuses the khash
        # string hash add_pkey already computed (hashing conv_id twice per
        # row measurably slowed the low-core delta phase)
        row_hash = (
            pd.util.hash_array(batch["lsn"].to_numpy(zero_copy_only=False))
            ^ batch["khash"].to_numpy(zero_copy_only=False)
            * np.uint64(0x9E3779B97F4A7C15)
            ^ pd.util.hash_array(
                batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            * np.uint64(0xC2B2AE3D27D4EB4F)
        )
        batch = batch.drop_columns(["pkey", "khash"])
        pk = pk[order]
        bounds = np.flatnonzero(np.diff(pk)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pk)]])
        out_pk, out_rows, out_max = [], [], []
        for s, e in zip(starts, ends):
            part = batch.slice(s, e - s)
            p = int(pk[s])
            lsn = part["lsn"].to_numpy(zero_copy_only=False)
            d = os.path.join(self.staged_root, f"pk-{p:05d}")
            os.makedirs(d, exist_ok=True)
            # content-fingerprint name → retried tasks overwrite themselves,
            # distinct blocks never collide (see class docstring)
            digest = hashlib.blake2b(
                row_hash[s:e].tobytes(), digest_size=8
            ).hexdigest()
            stem = f"d-{int(lsn.min())}-{int(lsn.max())}-{part.num_rows}-{digest}"
            if self.fmt.startswith("ipc"):
                if self.dict_encode:
                    # dictionary-encode string columns (the conform_schema
                    # cast on the read side decodes them back)
                    cols = []
                    for name in part.column_names:
                        col = part[name]
                        if pa.types.is_string(col.type):
                            col = pc.dictionary_encode(col.combine_chunks())
                        cols.append(col)
                    part = pa.table(dict(zip(part.column_names, cols)))
                # Arrow IPC: 5-100x faster encode/decode than parquet
                # (measured) at ~8x bytes uncompressed — for tmpfs/local
                # scratch. "ipc-lz4"/"ipc-zstd" buffer-compress the frames
                # (the middle point between parquet bytes and IPC speed);
                # the read side decompresses transparently.
                comp = self.fmt.partition("-")[2] or "uncompressed"
                feather.write_feather(
                    part, os.path.join(d, stem + ".arrow"), compression=comp
                )
            else:
                pq.write_table(part, os.path.join(d, stem + ".parquet"))
            out_pk.append(p)
            out_rows.append(part.num_rows)
            out_max.append(int(lsn.max()))
        return pa.table(
            {
                "pkey": pa.array(out_pk, pa.int32()),
                "rows": pa.array(out_rows, pa.int64()),
                "max_lsn": pa.array(out_max, pa.int64()),
            }
        )


def _write_part(table: pa.Table, abspath: str) -> None:
    """Write a lake part file plus its conv_id bloom sidecar. All part
    writers (merge, compact, delete) go through here so every committed
    part is point-read skippable; both writes are deterministic, keeping
    phase-1 tasks idempotent under retry."""
    os.makedirs(os.path.dirname(abspath), exist_ok=True)
    pq.write_table(table, abspath)
    bloom.write_sidecar(abspath, table["conv_id"])


class MergeTask:
    """Per-partition reduce (phase 1 of the two-phase commit; idempotent
    under retry — deterministic output paths). Two policies:

    * ``rewrite`` (copy-on-write): staged delta + base part + any pending
      delta parts → LWW → tombstone drop → ONE new sorted base part.
    * ``delta`` (merge-on-read): LWW-reduce ONLY the staged rows (keeping
      ``op`` so deletes travel as tombstones) → one sorted delta part; the
      base is untouched, readers merge, ``compact()`` folds back.

    Returns one lineage row per partition — per-partition lineage and
    throughput metrics are first-class output (north_rule requirement).
    """

    def __init__(
        self,
        lake_root: str,
        epoch: int,
        staged_root: str,
        data_schema: pa.Schema,
        policy: str = "rewrite",
        cache: "_SnapshotCache | None" = None,
    ):
        self.lake = Lake(lake_root)
        self.epoch = epoch
        self.staged_root = staged_root
        self.data_schema = data_schema
        self.policy = policy
        self.cache = cache

    def __call__(self, items: pa.Table) -> pa.Table:
        rows = []
        for i in range(items.num_rows):
            pkey = int(items["pkey"][i].as_py())
            snap = items["snap"][i].as_py()
            deltas = items["deltas"][i].as_py() or []
            rows.append(self._merge_one(pkey, snap, deltas))
        return pa.concat_tables(rows)

    def _read_staged(self, pkey: int) -> list[pa.Table]:
        tables = []
        d = os.path.join(self.staged_root, f"pk-{pkey:05d}")
        for f in sorted(glob.glob(os.path.join(d, "*"))):
            staged = (
                feather.read_table(f, memory_map=True)
                if f.endswith(".arrow")
                else pq.read_table(f)
            )
            tables.append(conform_schema(staged, target=self.data_schema))
        return tables

    def _lineage_row(
        self, pkey, rows_in, rows_out, max_lsn, abspath, rel, t0, max_turn
    ):
        return pa.table(
            {
                "pkey": pa.array([pkey], pa.int32()),
                "epoch": pa.array([self.epoch], pa.int64()),
                "rows_in": pa.array([rows_in], pa.int64()),
                "rows_out": pa.array([rows_out], pa.int64()),
                "max_lsn": pa.array([max_lsn], pa.int64()),
                "max_turn": pa.array([max_turn], pa.int64()),
                "bytes": pa.array([os.path.getsize(abspath)], pa.int64()),
                "seconds": pa.array([time.time() - t0], pa.float64()),
                "path": pa.array([rel], pa.string()),
            }
        )

    def _merge_one(
        self, pkey: int, snap_rel: str | None, delta_rels: list[str]
    ) -> pa.Table:
        t0 = time.time()
        tables = self._read_staged(pkey)

        if self.policy == "delta":
            merged = pa.concat_tables(tables)
            rows_in = merged.num_rows
            winners, max_lsn = lww_reduce(merged)  # op kept: tombstones travel
            idx = pc.sort_indices(
                winners,
                sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")],
            )
            out = winners.take(idx).append_column(
                "pkey", pa.array(np.full(winners.num_rows, pkey, dtype=np.int32))
            )
            rel = os.path.join(
                "parts", f"epoch-{self.epoch}", f"delta-{pkey:05d}.parquet"
            )
            abspath = os.path.join(self.lake.root, rel)
            _write_part(out, abspath)
            return self._lineage_row(
                pkey, rows_in, out.num_rows, max_lsn, abspath, rel, t0,
                int(pc.max(out["turn_idx"]).as_py() or 0),
            )

        # rewrite: fold base + pending deltas (oldest first) + staged rows
        prior = []
        if snap_rel:
            base = self.cache.get(pkey, snap_rel) if self.cache else None
            if base is None:
                base = pq.read_table(os.path.join(self.lake.root, snap_rel))
            prior.append(conform_schema(base, target=self.data_schema))
        for rel in delta_rels:
            prior.append(
                conform_schema(
                    pq.read_table(os.path.join(self.lake.root, rel)),
                    target=self.data_schema,
                )
            )
        merged = pa.concat_tables(prior + tables)
        rows_in = merged.num_rows
        winners, max_lsn = lww_reduce(merged)

        # drop tombstones (max-lsn op == delete ⇒ key is gone); base rows
        # carry op == null (= upsert)
        is_del = pc.fill_null(pc.equal(winners["op"], "delete"), False)
        alive = winners.filter(pc.invert(is_del)).drop_columns(["op"])
        # store each part sorted by the invariant order so per-file reads are
        # already (conv_id, turn_idx)-ordered
        idx = pc.sort_indices(
            alive, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        alive = alive.take(idx)
        alive = alive.append_column(
            "pkey", pa.array(np.full(alive.num_rows, pkey, dtype=np.int32))
        )

        rel = self.lake.part_path(self.epoch, pkey)
        abspath = os.path.join(self.lake.root, rel)
        _write_part(alive, abspath)
        if self.cache is not None:
            # the table just written IS the next epoch's base read
            self.cache.put(pkey, rel, alive)
        return self._lineage_row(
            pkey, rows_in, alive.num_rows, max_lsn, abspath, rel, t0,
            int(pc.max(merged["turn_idx"]).as_py() or 0),
        )


class _SnapshotCache:
    """LRU byte-bounded pkey → (base part rel, table) cache held inside one
    merge actor. Entries are keyed by the MANIFEST path of the base part
    (part paths are immutable once committed), so any external rewrite —
    compact, delete_where, another writer — changes the rel and turns into
    a plain cache miss, never a stale read."""

    def __init__(self, limit_bytes: int):
        from collections import OrderedDict

        self.limit = limit_bytes
        self.entries: "OrderedDict[int, tuple[str, pa.Table]]" = OrderedDict()
        self.bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, pkey: int, rel: str) -> pa.Table | None:
        ent = self.entries.get(pkey)
        if ent is None or ent[0] != rel:
            self.misses += 1
            return None
        self.entries.move_to_end(pkey)
        self.hits += 1
        return ent[1]

    def put(self, pkey: int, rel: str, table: pa.Table) -> None:
        old = self.entries.pop(pkey, None)
        if old is not None:
            self.bytes -= old[1].nbytes
        self.entries[pkey] = (rel, table)
        self.bytes += table.nbytes
        # evict LRU-first; a single over-budget table evicts ITSELF (the
        # limit is an OOM guard on long-running follow daemons — holding
        # one 8x-over-budget base per actor would defeat it)
        while self.bytes > self.limit and self.entries:
            _, (_, evicted) = self.entries.popitem(last=False)
            self.bytes -= evicted.nbytes


@ray.remote
class _MergeActor:
    """One shard of the follow-mode merge pool. The pool routes
    ``pkey % n_actors`` so this actor merges the SAME partitions every
    epoch and its snapshot cache keeps hitting. This is the one stage
    where raw actors beat ``map_batches``: Ray Data cannot pin a group
    key to a worker across separate pipeline runs."""

    def __init__(self, lake_root: str, cache_mb: int):
        self.lake_root = lake_root
        self.cache = _SnapshotCache(cache_mb << 20)

    def merge(
        self,
        epoch: int,
        staged_root: str,
        data_schema: pa.Schema,
        policy: str,
        items: list[dict],
    ) -> pa.Table:
        mt = MergeTask(
            self.lake_root, epoch, staged_root, data_schema, policy,
            cache=self.cache,
        )
        return pa.concat_tables(
            mt._merge_one(int(it["pkey"]), it["snap"], it["deltas"] or [])
            for it in items
        )

    def cache_stats(self) -> dict:
        return {
            "hits": self.cache.hits,
            "misses": self.cache.misses,
            "bytes": self.cache.bytes,
            "entries": len(self.cache.entries),
        }


class MergePool:
    """Persistent pkey-routed merge actors for follow mode (rewrite policy).

    One-shot ``apply_changelog`` keeps the stateless task fan-out (an actor
    pool pays 1.5–3 s spin-up and caches nothing useful across a single
    replay); a long-running ``follow_changelog`` amortizes the spin-up and
    turns every epoch's base-part read into an actor-memory hit. Reference
    analog: the profile-merge read-modify-write cache the DB gave the
    reference for free (src/nostr_pipeline/loaders/event_loader.py:60-87).
    """

    def __init__(self, lake_root: str, n_actors: int, cache_mb: int):
        self.n = max(1, n_actors)
        self.actors = [
            _MergeActor.remote(lake_root, cache_mb) for _ in range(self.n)
        ]

    def merge(
        self,
        epoch: int,
        staged_root: str,
        data_schema: pa.Schema,
        policy: str,
        items: list[dict],
    ) -> list[dict]:
        shards: list[list[dict]] = [[] for _ in range(self.n)]
        for it in items:
            shards[int(it["pkey"]) % self.n].append(it)
        refs = [
            self.actors[i].merge.remote(
                epoch, staged_root, data_schema, policy, shard
            )
            for i, shard in enumerate(shards)
            if shard
        ]
        return pa.concat_tables(ray.get(refs)).to_pylist()

    def cache_stats(self) -> dict:
        per = ray.get([a.cache_stats.remote() for a in self.actors])
        return {
            "hits": sum(p["hits"] for p in per),
            "misses": sum(p["misses"] for p in per),
            "bytes": sum(p["bytes"] for p in per),
            "entries": sum(p["entries"] for p in per),
        }

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def apply_epoch(
    lake: Lake, segment_paths: list[str], config: EngineConfig,
    merge_pool: MergePool | None = None,
) -> dict[str, Any]:
    """Apply one epoch (a micro-batch of binlog segments) exactly once."""
    t0 = time.time()
    epoch = lake.current_epoch() + 1
    # the partition function is part of the lake's on-disk state: a writer
    # with different knobs would route updates of EXISTING keys to a
    # different pkey than their base rows (the LWW merge never sees the old
    # row → duplicate keys; tombstones land in the wrong partition). Adopt
    # the persisted parameters over the caller's config.
    persisted = (lake.current_manifest() or {}).get("partitioning")
    if persisted and (
        int(persisted["num_partitions"]) != config.num_partitions
        or int(persisted["turn_bucket"]) != config.turn_bucket
    ):
        import dataclasses

        config = dataclasses.replace(
            config,
            num_partitions=int(persisted["num_partitions"]),
            turn_bucket=int(persisted["turn_bucket"]),
        )
    seg_names = [os.path.basename(p) for p in segment_paths]
    watermarks = lake.watermarks()
    part_files = lake.partition_files()
    # unify over base AND pending delta parts (either may carry evolved cols)
    snapshot_all = [b for b, _ in part_files.values() if b] + [
        d for _, ds in part_files.values() for d in ds
    ]
    data_schema = _merge_schema(segment_paths, snapshot_all)

    scratch = config.scratch_dir or os.path.join(lake.root, "parts")
    # namespace the staged dir by lake identity: a shared scratch (e.g.
    # /dev/shm) must not collide when two applies on DIFFERENT lakes hit the
    # same epoch number — the rmtree below would delete the other job's
    # staged delta mid-run and surviving files would cross-contaminate lakes
    lake_id = hashlib.sha1(os.path.realpath(lake.root).encode()).hexdigest()[:12]
    lake_ns = os.path.join(scratch, f"lake-{lake_id}")
    staged_root = os.path.join(lake_ns, f"epoch-{epoch}-delta")
    # sweep EVERY stale staged dir in this lake's namespace, not just this
    # epoch's: a crash between the manifest commit and the post-commit
    # rmtree orphans that epoch's whole exchange (RAM, on a tmpfs scratch),
    # and the next run's epoch number has already moved on. The caller
    # holds the single-writer lock, so anything here is dead weight from a
    # crashed or unswept prior attempt.
    if os.path.isdir(lake_ns):
        for d in os.listdir(lake_ns):
            if d.startswith("epoch-") and d.endswith("-delta"):
                shutil.rmtree(os.path.join(lake_ns, d), ignore_errors=True)

    # --- phase A: delta map + map-side exchange ---------------------------
    # parquet segments grouped by identical file schema → one read_parquet
    # per group (a union of single-file reads measured 2x slower); schema
    # conformance happens inside MergeTask, so heterogeneous groups flow
    groups: list[tuple[pa.Schema, list[str]]] = []
    jsonl_paths: list[str] = []
    for p in segment_paths:
        if p.endswith(".jsonl"):
            jsonl_paths.append(p)
            continue
        sch = pq.read_schema(p)
        if groups and groups[-1][0].equals(sch):
            groups[-1][1].append(p)
        else:
            groups.append((sch, [p]))

    # malformed-line policy: the tolerant metadata parse (already cached by
    # _merge_schema above) knows every segment's bad-line count for free.
    # "error" fails the epoch before any work; "quarantine" routes dirty
    # segments through the dead-letter split and keeps clean segments on
    # the zero-copy read_json fast path.
    dirty_paths = []
    rows_quarantined = 0
    for p in jsonl_paths:
        # intra-file type conflict (one key, two non-null JSON kinds): no
        # inference path can read the file and no single LINE is at fault,
        # so dead-lettering would silently lose valid rows — always loud
        mixed = [k for k, kind in _jsonl_meta(p)[4] if kind == "mixed"]
        if mixed:
            raise ValueError(
                f"segment {p} mixes JSON value types within a file for "
                f"key(s) {mixed} — one encoding per segment (e.g. ts as "
                "ISO-8601 strings OR epoch integers, not both)"
            )
        n_bad, first_err = _segment_bad(p)
        if not n_bad:
            continue
        if config.on_malformed != "quarantine":
            raise ValueError(
                f"malformed JSON in segment {p} ({n_bad} bad line(s); first: "
                f"{first_err}); set EngineConfig.on_malformed='quarantine' "
                "to divert bad lines to the dead-letter sink"
            )
        dirty_paths.append(p)
        rows_quarantined += n_bad
    if dirty_paths:
        jsonl_paths = [p for p in jsonl_paths if p not in set(dirty_paths)]

    delta = None
    for sch, paths in groups:
        part = rd.read_parquet(paths)
        # conform only when this group's schema differs from the unified one
        # (evolution epochs) — the common no-evolution path pays nothing and
        # the union below always sees homogeneous blocks
        if not (sch.names == data_schema.names
                and all(a.type == b.type for a, b in zip(sch, data_schema))):
            part = part.map_batches(
                partial(conform_schema, target=data_schema),
                batch_format="pyarrow",
                batch_size=config.batch_size,
            )
        delta = part if delta is None else delta.union(part)
    if jsonl_paths:
        # JSONL segments (schema-on-read): always conformed — the cast pulls
        # ISO timestamp strings / inferred widths onto the unified schema.
        # One read_json per TYPE-SIGNATURE group (the JSONL twin of the
        # parquet group-by-identical-schema above): Ray coalesces blocks
        # across a read's files into batches BEFORE conform runs, so files
        # whose inferred column types differ (int-ts vs ISO-ts, an evolved
        # key absent vs present) must not share a read
        by_sig: dict[tuple, list[str]] = {}
        for p in jsonl_paths:
            by_sig.setdefault(_jsonl_meta(p)[4], []).append(p)
        for paths in by_sig.values():
            part = rd.read_json(paths).map_batches(
                partial(conform_schema, target=data_schema),
                batch_format="pyarrow",
                batch_size=config.batch_size,
            )
            delta = part if delta is None else delta.union(part)
    if dirty_paths:
        # dead-letter split: one Ray task per dirty segment returns its
        # valid rows (table refs, never copied through the driver) and
        # writes <lake>/_quarantine/<segment>.parquet idempotently
        import ray as _ray

        qdir = os.path.join(lake.root, "_quarantine")
        qtask = _ray.remote(num_cpus=1)(_quarantine_segment)
        # same type-signature grouping as the clean reads: two dirty
        # segments with different inferred types must not coalesce
        dirty_by_sig: dict[tuple, list[str]] = {}
        for p in dirty_paths:
            dirty_by_sig.setdefault(_jsonl_meta(p)[4], []).append(p)
        for paths in dirty_by_sig.values():
            refs = [qtask.remote(p, qdir) for p in paths]
            part = rd.from_arrow_refs(refs).map_batches(
                partial(conform_schema, target=data_schema),
                batch_format="pyarrow",
                batch_size=config.batch_size,
            )
            delta = part if delta is None else delta.union(part)
    from ..config import resolve_staged_format

    split = SplitStage(
        staged_root,
        # "auto": ipc-lz4 on node-local scratch, parquet on shared storage
        resolve_staged_format(config.staged_format, scratch),
        config.staged_dict,
    )
    meta_rows = (
        delta.map_batches(precombine, batch_format="pyarrow", batch_size=None)
        .map_batches(
            partial(
                add_pkey,
                num_partitions=config.num_partitions,
                turn_bucket=config.turn_bucket,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        .map_batches(
            partial(watermark_filter, watermarks=watermarks),
            batch_format="pyarrow",
            batch_size=None,
        )
        .map_batches(split, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    t_delta = time.time() - t0

    touched = sorted({int(r["pkey"]) for r in meta_rows})
    if not touched:
        # nothing new (pure replay) — commit only the segment bookkeeping
        shutil.rmtree(staged_root, ignore_errors=True)
        lake.commit_epoch(epoch, {}, {}, seg_names, {}, data_schema,
                          stats={"rows_applied": 0, "seconds": time.time() - t0,
                                 "rows_quarantined": rows_quarantined},
                          partitioning={"num_partitions": config.num_partitions,
                                        "turn_bucket": config.turn_bucket})
        return {"epoch": epoch, "rows_applied": 0, "partitions": 0,
                "rows_quarantined": rows_quarantined,
                "seconds": time.time() - t0, "phases": {}}

    # --- phase B: per-partition merge fan-out -----------------------------
    m = lake.current_manifest()
    files = m["files"] if m else {}
    deltas_by_pk = m.get("deltas", {}) if m else {}
    items = [
        {
            "pkey": pk,
            "snap": files.get(str(pk)),
            "deltas": deltas_by_pk.get(str(pk), []),
        }
        for pk in touched
    ]
    if merge_pool is not None and config.merge_policy == "rewrite":
        # follow mode: pkey-routed persistent actors with base-part caching
        lineage_rows = merge_pool.merge(
            epoch, staged_root, data_schema, config.merge_policy, items
        )
    else:
        mt = MergeTask(lake.root, epoch, staged_root, data_schema,
                       config.merge_policy)

        def merge_task(batch: pa.Table) -> pa.Table:
            return mt(batch)

        lineage_rows = (
            rd.from_items(items, override_num_blocks=len(items))
            .map_batches(merge_task, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
    t_merge = time.time() - t0 - t_delta

    if config.merge_policy == "delta":
        new_files, append_deltas = {}, {int(r["pkey"]): r["path"] for r in lineage_rows}
    else:
        new_files, append_deltas = {int(r["pkey"]): r["path"] for r in lineage_rows}, {}
    new_wm = {int(r["pkey"]): int(r["max_lsn"]) for r in lineage_rows}
    lineage = {
        int(r["pkey"]): {
            k: (float(v) if k == "seconds" else v)
            for k, v in r.items()
            if k != "pkey"
        }
        for r in lineage_rows
    }
    rows_applied = int(sum(r["rows"] for r in meta_rows))
    seconds = time.time() - t0
    lake.commit_epoch(
        epoch, new_files, new_wm, seg_names, lineage, data_schema,
        stats={"rows_applied": rows_applied, "seconds": seconds,
               "events_per_sec": rows_applied / max(seconds, 1e-9),
               "rows_quarantined": rows_quarantined},
        partitioning={"num_partitions": config.num_partitions,
                      "turn_bucket": config.turn_bucket},
        append_deltas=append_deltas,
        max_turn_idx=max((int(r["max_turn"]) for r in lineage_rows), default=-1),
    )
    shutil.rmtree(staged_root, ignore_errors=True)  # post-commit cleanup
    return {
        "epoch": epoch,
        "rows_applied": rows_applied,
        "partitions": len(touched),
        "rows_quarantined": rows_quarantined,
        "seconds": seconds,
        "phases": {
            "delta": round(t_delta, 3),
            "merge": round(t_merge, 3),
            "commit": round(seconds - t_delta - t_merge, 3),
        },
    }


def apply_changelog(
    lake_root: str, binlog_dir: str, config: EngineConfig | None = None,
    merge_pool: MergePool | None = None,
) -> dict[str, Any]:
    """Tail the binlog: apply all not-yet-committed segments, epoch by epoch.

    Resume = this very function: committed segments are skipped via the
    manifest (crash between phase 1 and phase 2 re-runs the epoch; committed
    epochs are no-ops).
    """
    config = config or EngineConfig()
    lake = Lake(lake_root)
    t0 = time.time()
    total_rows = 0
    epochs = []
    with lake.writer_lock():  # single-writer: fail fast, don't corrupt
        applied = lake.applied_segments()
        pending = [
            p for p in list_segments(binlog_dir) if os.path.basename(p) not in applied
        ]
        prefetch_segment_meta(pending)  # parallel JSONL parse + cache evict
        raw_events = sum(_segment_rows(p) for p in pending)
        for i in range(0, len(pending), config.epoch_segments):
            out = apply_epoch(lake, pending[i : i + config.epoch_segments],
                              config, merge_pool=merge_pool)
            total_rows += out["rows_applied"]
            epochs.append(out)
    seconds = time.time() - t0
    return {
        "epochs": epochs,
        "segments_applied": len(pending),
        "raw_events": raw_events,  # change events replayed (incl. duplicates)
        "rows_applied": total_rows,  # post-precombine rows reaching the merge
        "seconds": seconds,
        "events_per_sec": raw_events / max(seconds, 1e-9),
    }


def materialize_partition(
    base: str | None,
    deltas: list[str],
    conv_filter: str | None = None,
    keep_pkey: bool = False,
) -> pa.Table:
    """Merge-on-read: base part (op=null ⇒ upsert) + delta parts (oldest
    first, tombstones included) → LWW → tombstone drop → (conv_id, turn_idx)
    order. The single read-side primitive every delta-aware consumer
    (read_final, compact, delete_where, read_conversation) goes through."""
    paths = ([base] if base else []) + list(deltas)
    if not paths:
        return LAKE_SCHEMA.empty_table()
    schemas = []
    for p in paths:
        s = pq.read_schema(p)
        if "pkey" in s.names and not keep_pkey:
            s = s.remove(s.get_field_index("pkey"))
        schemas.append(s)
    target = pa.unify_schemas(schemas, promote_options="permissive")
    if "op" not in target.names:
        target = target.append(pa.field("op", pa.string()))
    filt = [("conv_id", "==", conv_filter)] if conv_filter is not None else None
    # point reads skip whole chain files via the conv_id bloom sidecar
    # (false ⇒ provably no row OR tombstone of this conv in the file); the
    # schema union above still covers skipped files, so the output schema
    # is identical with and without sidecars
    read_paths = (
        paths
        if conv_filter is None
        else [p for p in paths if bloom.may_contain(p, conv_filter)]
    )
    tables = [
        conform_schema(pq.read_table(p, filters=filt), target=target)
        for p in read_paths
    ]
    if not tables:
        return target.empty_table().drop_columns(["op"])
    merged = pa.concat_tables(tables)
    # concat order (base, delta_0, …, delta_n) + stable position tie-break
    # keeps the deterministic total order even on duplicate lsn delivery
    winners, _ = lww_reduce(merged)
    is_del = pc.fill_null(pc.equal(winners["op"], "delete"), False)
    alive = winners.filter(pc.invert(is_del)).drop_columns(["op"])
    idx = pc.sort_indices(
        alive, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return alive.take(idx)


def follow_changelog(
    lake_root: str,
    binlog_dir: str,
    config: EngineConfig | None = None,
    poll_interval: float = 1.0,
    idle_timeout: float | None = 30.0,
    stop=None,
    on_epoch=None,
    on_pass=None,
    compact_after: int | None = None,
) -> dict[str, Any]:
    """Continuous tail mode — the always-on daily driver (reference analog:
    the connect→subscribe→process loop, src/nostr_pipeline/pipeline.py:69-101).

    Polls ``binlog_dir`` and applies newly appeared segments epoch by epoch;
    every pass is the same idempotent ``apply_changelog`` (which holds the
    lake's writer lock for the duration of the pass), so a crash at any
    point resumes cleanly on restart. Exits when ``stop()`` returns True
    (the CLI wires SIGTERM/SIGINT to this) or after ``idle_timeout`` seconds
    with no new segments (None = run forever). ``on_epoch`` is an optional
    callback fed each non-empty apply result (metrics hook); ``on_pass``
    fires on EVERY pass, empty or not — the hook for work that must retry
    on idle passes too (e.g. draining a publish backlog after a sink came
    back).

    ``compact_after`` (delta policy): when any partition accumulates that
    many pending delta parts, fold them into bases between polls — the LSM
    maintenance loop that keeps merge-on-read read amplification bounded.
    """
    config = config or EngineConfig()
    stop = stop or (lambda: False)
    t0 = time.time()
    pool = None
    if config.snapshot_cache_mb > 0 and config.merge_policy == "rewrite":
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        n_actors = config.merge_concurrency or max(
            1, min(config.num_partitions, cpus)
        )
        pool = MergePool(lake_root, n_actors, config.snapshot_cache_mb)
    try:
        return _follow_loop(
            lake_root, binlog_dir, config, pool, stop, idle_timeout,
            poll_interval, compact_after, on_epoch, on_pass, t0,
        )
    finally:
        if pool is not None:
            pool.shutdown()


def _follow_loop(
    lake_root, binlog_dir, config, pool, stop, idle_timeout,
    poll_interval, compact_after, on_epoch, on_pass, t0,
):
    last_new = time.time()
    passes, results = 0, []
    compactions = 0
    while True:
        out = apply_changelog(lake_root, binlog_dir, config, merge_pool=pool)
        passes += 1
        if out["segments_applied"] > 0:
            results.append(out)
            last_new = time.time()
            if on_epoch is not None:
                on_epoch(out)
        if on_pass is not None:
            on_pass(out)
        if compact_after:
            # size-tiered minor compaction: deep chains fold at the depth
            # cap, small-bytes chains fold eagerly (see select_compaction)
            picks = select_compaction(lake_root, max_depth=compact_after)
            if picks:
                compact(lake_root, partitions=picks)
                compactions += 1
        if stop():
            reason = "stopped"
            break
        if idle_timeout is not None and time.time() - last_new >= idle_timeout:
            reason = "idle"
            break
        time.sleep(poll_interval)
    # the caller's finally owns the shutdown; only read stats here
    cache_stats = pool.cache_stats() if pool is not None else None
    return {
        "reason": reason,
        "passes": passes,
        "applies": results,
        "segments_applied": sum(r["segments_applied"] for r in results),
        "rows_applied": sum(r["rows_applied"] for r in results),
        "compactions": compactions,
        "snapshot_cache": cache_stats,
        "seconds": time.time() - t0,
    }


def delete_where(
    lake_root: str, predicate, config: EngineConfig | None = None
) -> dict[str, Any]:
    """Row-level retention delete: rewrite partitions dropping rows where
    ``predicate(table) -> bool mask`` is true, committed as a new epoch.

    The full analog of the reference's cleanup_old_data
    (src/nostr_pipeline/loaders/event_loader.py:268-297 — delete rows older
    than N days): partitions with no matching rows are carried forward by
    reference (metadata-only); only hit partitions are rewritten. One map
    task per partition, exactly-once via the same manifest commit.
    """
    config = config or EngineConfig()
    lake = Lake(lake_root)
    with lake.writer_lock():
        return _delete_where_locked(lake, predicate)


def _unified_snapshot_target(
    parts: dict[int, tuple[str | None, list[str]]], with_pkey: bool
) -> pa.Schema:
    """The one schema every part REWRITTEN in an epoch must conform to:
    unify across all live base+delta files, drop the op tombstone marker,
    and include/exclude pkey per the writer's needs. An epoch dir must stay
    single-schema — the per-dir footer sampling in _snapshot_schemas /
    read_final depends on it."""
    all_files = [b for b, _ in parts.values() if b] + [
        d for _, ds in parts.values() for d in ds
    ]
    target = pa.unify_schemas(
        _snapshot_schemas(all_files), promote_options="permissive"
    )
    if "op" in target.names:
        target = target.remove(target.get_field_index("op"))
    if with_pkey and "pkey" not in target.names:
        target = target.append(pa.field("pkey", pa.int32()))
    if not with_pkey and "pkey" in target.names:
        target = target.remove(target.get_field_index("pkey"))
    return target


def _delete_where_locked(lake: Lake, predicate) -> dict[str, Any]:
    m = lake.current_manifest()
    if m is None:
        return {"rows_deleted": 0, "partitions_rewritten": 0}
    epoch = lake.current_epoch() + 1
    parts = lake.partition_files()
    if not parts:
        return {"rows_deleted": 0, "partitions_rewritten": 0}
    items = [
        {"pkey": pk, "base": b, "deltas": ds} for pk, (b, ds) in sorted(parts.items())
    ]
    root = lake.root
    target = _unified_snapshot_target(parts, with_pkey=True)

    def rewrite(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            pkey = int(batch["pkey"][i].as_py())
            base = batch["base"][i].as_py()
            ds = batch["deltas"][i].as_py() or []
            if not ds and base:
                # fast path (rewrite-policy lake): no merge needed
                t = pq.read_table(base)
                rel_unchanged = os.path.relpath(base, root)
            else:
                # merge-on-read partition: fold deltas first, then filter —
                # the delete always lands as a fresh BASE (clears deltas)
                t = materialize_partition(base, ds)
                t = t.append_column(
                    "pkey", pa.array(np.full(t.num_rows, pkey, dtype=np.int32))
                )
                rel_unchanged = None
            mask = predicate(t)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            n_hit = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            if n_hit == 0 and rel_unchanged is not None:
                out.append({"pkey": pkey, "rel": rel_unchanged, "deleted": 0,
                            "rewritten": False})
                continue
            kept = conform_schema(t.filter(pc.invert(mask)), target=target)
            new_rel = Lake(root).part_path(epoch, pkey)
            abspath = os.path.join(root, new_rel)
            _write_part(kept, abspath)
            out.append({"pkey": pkey, "rel": new_rel, "deleted": int(n_hit),
                        "rewritten": True})
        return pa.Table.from_pylist(out)

    rows = (
        rd.from_items(items, override_num_blocks=max(1, len(items)))
        .map_batches(rewrite, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    new_files = {int(r["pkey"]): r["rel"] for r in rows if r["rewritten"]}
    deleted = int(sum(r["deleted"] for r in rows))
    snap_schema = target.remove(target.get_field_index("pkey"))
    lake.commit_epoch(
        epoch, new_files, {}, [], {}, snap_schema,
        stats={"rows_deleted": deleted, "partitions_rewritten": len(new_files)},
    )
    return {"rows_deleted": deleted, "partitions_rewritten": len(new_files)}


def conversation_pkeys(
    conv_id: str, num_partitions: int, turn_bucket: int, max_turn: int = 1 << 20
) -> list[int]:
    """Candidate partitions holding any turn of ``conv_id`` with
    ``turn_idx <= max_turn``: one pkey per turn-range bucket (the salted
    partitioner spreads a conversation over ~max_turn/turn_bucket
    partitions). Once the bucket count is large enough that the candidate
    set would saturate anyway, fall back to ALL partitions — correct for
    any turn_idx, and the per-file conv_id row-group filter keeps the extra
    reads cheap (sorted parts prune to a few row groups)."""
    from ..stages.cdc_stages import partition_key

    n_buckets = max_turn // turn_bucket + 1  # covers turn 0..max_turn inclusive
    if n_buckets >= num_partitions * 8:  # birthday-saturated: probe everything
        return list(range(num_partitions))
    turns = pa.array(np.arange(n_buckets, dtype=np.int64) * turn_bucket, pa.int32())
    convs = pa.array([conv_id] * n_buckets)
    return sorted(set(partition_key(convs, turns, num_partitions, turn_bucket).tolist()))


def read_conversation(
    lake_root: str,
    conv_id: str,
    max_turn: int | None = None,
    as_of: int | None = None,
) -> pa.Table:
    """Partition-pruned point lookup: re-derive the conversation's candidate
    pkeys from the manifest's persisted partitioning, read ONLY those part
    files with a conv_id predicate (parts are sorted by conv_id, so parquet
    row-group stats prune tightly), return turns in turn order. At 100 TB
    this touches a handful of files out of ~400k. ``as_of`` resolves a
    past committed epoch's manifest instead (time travel: the
    conversation exactly as it stood after that epoch)."""
    lake = Lake(lake_root)
    m = lake._manifest(as_of)
    if m is None:
        return LAKE_SCHEMA.empty_table()
    part = m.get("partitioning")
    if not part:
        raise ValueError("lake manifest predates partitioning metadata")
    if max_turn is None:
        # the manifest tracks the lake's true max turn_idx — the EXACT probe
        # budget; probe-all fallback for lakes predating the field
        tracked = int(m.get("max_turn_idx", -1))
        max_turn = tracked if tracked >= 0 else (1 << 20)
    pkeys = conversation_pkeys(
        conv_id, int(part["num_partitions"]), int(part["turn_bucket"]), max_turn
    )
    parts = lake.partition_files(pkeys, as_of=as_of)
    if not parts:
        return LAKE_SCHEMA.empty_table()
    tables = [
        materialize_partition(b, ds, conv_filter=conv_id)
        for _, (b, ds) in sorted(parts.items())
    ]
    t = pa.concat_tables(tables, promote_options="permissive")
    return t.take(pc.sort_indices(t, sort_keys=[("turn_idx", "ascending")]))


def select_compaction(
    lake_root: str, max_depth: int, eager_bytes: int = 32 << 20
) -> list[int]:
    """Size-tiered minor-compaction picker: a partition is due when its
    pending delta CHAIN is deep (``max_depth`` — the hard read-amp cap, the
    old depth-only rule) OR when the whole REWRITE is small in bytes (base
    + delta chain ≤ ``eager_bytes`` with ≥2 deltas) — small partitions fold
    early while the merge is cheap, large bases wait for the depth cap
    instead of being re-rewritten every couple of micro-batches (the eager
    cost is read base + deltas + write base, so the base must count).
    stat() runs only for partitions with ≥2 pending deltas."""
    lake = Lake(lake_root)
    m = lake.current_manifest()
    bases = (m or {}).get("files") or {}
    picks: list[int] = []
    # the eager-bytes rule needs >=2 deltas to be worth a rewrite, but an
    # explicit max_depth=1 ("fold every delta immediately") must still be
    # honored — a blanket <2 skip silently raised the minimum cap to 2
    min_chain = 1 if max_depth <= 1 else 2
    for pk, rels in ((m or {}).get("deltas") or {}).items():
        if len(rels) < min_chain:
            continue
        if len(rels) >= max_depth:
            picks.append(int(pk))
            continue
        paths = list(rels) + ([bases[pk]] if pk in bases else [])
        total = 0
        for r in paths:
            try:
                total += os.path.getsize(os.path.join(lake.root, r))
            except OSError:
                total = eager_bytes + 1  # unknown size: don't eager-compact
                break
        if total <= eager_bytes:
            picks.append(int(pk))
    return sorted(picks)


def compact(lake_root: str, partitions: list[int] | None = None) -> dict[str, Any]:
    """Rewrite live parts into ONE new epoch directory (metadata-only
    manifests accumulate files scattered across old epoch dirs via
    carry-forward; compaction co-locates them and lets ``vacuum`` reclaim
    every older epoch). One map task per partition, committed exactly-once
    through the same manifest CAS; conforms rewritten parts to the unified
    snapshot schema.

    ``partitions``: None = major compaction (every partition; the lake is
    single-schema afterwards and the manifest's turn bound becomes
    authoritative); a list = MINOR compaction of just those partitions
    (their delta chains fold into new bases; everything else carries
    forward untouched — the size-tiered maintenance path, see
    ``select_compaction``)."""
    lake = Lake(lake_root)
    with lake.writer_lock():
        m = lake.current_manifest()
        if m is None:
            return {"partitions": 0}
        epoch = lake.current_epoch() + 1
        parts = lake.partition_files()
        target = _unified_snapshot_target(parts, with_pkey=True)
        root = lake.root
        if partitions is not None:
            want = set(partitions)
            parts = {pk: v for pk, v in parts.items() if pk in want}
            if not parts:
                return {"partitions": 0}
        items = [
            {"pkey": pk, "base": b, "deltas": ds}
            for pk, (b, ds) in sorted(parts.items())
        ]

        def rewrite(batch: pa.Table) -> pa.Table:
            out = []
            for i in range(batch.num_rows):
                pk = int(batch["pkey"][i].as_py())
                base = batch["base"][i].as_py()
                ds = batch["deltas"][i].as_py() or []
                t = materialize_partition(base, ds)  # folds tombstones away
                t = t.append_column(
                    "pkey", pa.array(np.full(t.num_rows, pk, dtype=np.int32))
                )
                t = conform_schema(t, target=target)
                new_rel = Lake(root).part_path(epoch, pk)
                dst = os.path.join(root, new_rel)
                _write_part(t, dst)
                mx = pc.max(t["turn_idx"]).as_py() if t.num_rows else None
                out.append({
                    "pkey": pk, "rel": new_rel,
                    "max_turn": int(mx) if mx is not None else -1,
                })
            return pa.Table.from_pylist(out)

        rows = (
            rd.from_items(items, override_num_blocks=max(1, len(items)))
            .map_batches(rewrite, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        new_files = {int(r["pkey"]): r["rel"] for r in rows}
        data_schema = target.remove(target.get_field_index("pkey")) \
            if "pkey" in target.names else target
        lake.commit_epoch(
            epoch, new_files, {}, [], {}, data_schema,
            stats={"compacted_partitions": len(new_files),
                   "compaction": "major" if partitions is None else "minor"},
            # a MAJOR compaction reads EVERY live row, so its turn bound is
            # authoritative — this also heals legacy lakes whose manifests
            # predate max_turn_idx (unknown → probe-all until now). A minor
            # compaction saw only a subset: its bound is a lower bound only.
            max_turn_idx=max((int(r["max_turn"]) for r in rows), default=-1),
            max_turn_complete=partitions is None,
        )
        return {"partitions": len(new_files), "epoch": epoch}


def export_snapshot(
    lake_root: str, out_dir: str, force: bool = False, _retries: int = 2
) -> dict[str, Any]:
    """Export the committed snapshot as partitioned Parquet — one file per
    lake partition, written via tmp+rename so a killed export RESUMES by
    skipping finished partitions (the resumable-output contract: at 100 TB
    an export is thousands of files and reruns must not start over).

    Output rows carry the transcript schema (pkey stripped, evolved columns
    null-filled via the unified snapshot schema); a ``_SUCCESS`` marker with
    the source epoch is written last.

    Exports take no lock, so a concurrent writer + vacuum can delete part
    files this export already resolved; a missing-file failure re-resolves
    the CURRENT manifest and retries — if the epoch advanced, the marker
    logic forces a clean rewrite against the new snapshot (never mixes
    epochs), and a genuinely vanished same-epoch file still raises after
    the bounded retries.
    """
    lake = Lake(lake_root)
    m = lake.current_manifest()
    os.makedirs(out_dir, exist_ok=True)
    if m is None:
        return {"partitions": 0, "written": 0, "skipped": 0}
    parts = lake.partition_files()
    target = _unified_snapshot_target(parts, with_pkey=False)
    items = [
        {"pkey": pk, "base": b, "deltas": ds} for pk, (b, ds) in sorted(parts.items())
    ]

    # resume is only valid against the SAME source epoch: existing part
    # files from an older epoch (or of unknown provenance) must be
    # rewritten, or a "resumed" export would mix epochs and _SUCCESS would
    # mislabel stale data as the current snapshot
    cur_epoch = int(m["epoch"])
    marker = os.path.join(out_dir, "_EXPORT.json")
    if not force:
        if os.path.exists(marker):
            with open(marker) as f:
                if int(json.load(f).get("epoch", -1)) != cur_epoch:
                    force = True
        elif any(n.endswith(".parquet") for n in os.listdir(out_dir)):
            force = True  # parts exist but no marker: unknown provenance
    success = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(success):
        os.unlink(success)  # in progress: never let a crash look complete
    if force:
        # stale parts must be GONE before the new-epoch marker lands — a
        # crash between marker write and the rewrites would otherwise make
        # the next resume skip old-epoch files as if they were current
        for n in os.listdir(out_dir):
            if n.endswith(".parquet"):
                os.unlink(os.path.join(out_dir, n))
    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as f:
        json.dump({"epoch": cur_epoch}, f)
    os.replace(tmp_marker, marker)  # written BEFORE any copy (resume anchor)

    def copy_one(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            pk = int(batch["pkey"][i].as_py())
            base = batch["base"][i].as_py()
            ds = batch["deltas"][i].as_py() or []
            dst = os.path.join(out_dir, f"part-{pk:05d}.parquet")
            if os.path.exists(dst) and not force:
                out.append({"pkey": pk, "written": False})
                continue
            t = conform_schema(materialize_partition(base, ds), target=target)
            tmp = dst + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, dst)  # atomic per partition
            out.append({"pkey": pk, "written": True})
        return pa.Table.from_pylist(out)

    try:
        rows = (
            rd.from_items(items, override_num_blocks=max(1, len(items)))
            .map_batches(copy_one, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
    except Exception as e:  # vacuum raced us: re-resolve and retry
        if _retries > 0 and "FileNotFoundError" in repr(e):
            return export_snapshot(
                lake_root, out_dir, force=force, _retries=_retries - 1
            )
        raise
    written = sum(1 for r in rows if r["written"])
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        json.dump({"epoch": int(m["epoch"]), "partitions": len(items)}, f)
    return {
        "partitions": len(items),
        "written": written,
        "skipped": len(items) - written,
    }


def partition_histogram(
    binlog_dir: str, config: EngineConfig | None = None
) -> dict[int, int]:
    """Per-partition change-row counts over a binlog — the skew diagnostic
    behind the salted partitioner (SURVEY.md §4.2 item 4). Column-pruned
    read of just the key columns; per-batch bincount; tiny driver-side sum.
    """
    from ..stages.cdc_stages import partition_key

    config = config or EngineConfig()

    def hist(batch: pa.Table) -> pa.Table:
        pk = partition_key(
            batch["conv_id"], batch["turn_idx"],
            config.num_partitions, config.turn_bucket,
        )
        counts = np.bincount(pk, minlength=config.num_partitions)
        return pa.table(
            {
                "pkey": pa.array(np.arange(config.num_partitions), pa.int32()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    rows = (
        _read_segments(list_segments(binlog_dir), columns=["conv_id", "turn_idx"])
        .map_batches(hist, batch_format="pyarrow")
        .take_all()
    )
    out: dict[int, int] = {}
    for r in rows:
        out[int(r["pkey"])] = out.get(int(r["pkey"]), 0) + int(r["n"])
    return out


def lake_lineage(lake_root: str) -> pa.Table:
    """Per-partition lineage + throughput metrics as a table (north_rule:
    lineage is first-class output; reference analog: relay/network stats
    tables, src/nostr_pipeline/models.py:159-230)."""
    m = Lake(lake_root).current_manifest()
    if not m:
        return pa.table({"pkey": pa.array([], pa.int32())})
    rows = []
    for pk, lin in sorted(m.get("lineage", {}).items(), key=lambda kv: int(kv[0])):
        rows.append({"pkey": int(pk), **{k: lin[k] for k in
                     ("epoch", "rows_in", "rows_out", "max_lsn", "bytes", "seconds")}})
    return pa.Table.from_pylist(rows)


def _materialized_dataset(items: list[dict], target: pa.Schema) -> "rd.Dataset":
    """One materialize task per partition item ({pkey, base, deltas}),
    every block conformed to ``target`` — the single merge-on-read read
    plan shared by read_final's delta branch and the change feed's
    partition-scoped reads (a fix to one must reach the other)."""

    def mat(batch: pa.Table) -> pa.Table:
        outs = []
        for i in range(batch.num_rows):
            t = materialize_partition(
                batch["base"][i].as_py(), batch["deltas"][i].as_py() or []
            )
            outs.append(conform_schema(t, target=target))
        return pa.concat_tables(outs)

    return rd.from_items(items, override_num_blocks=max(1, len(items))).map_batches(
        mat, batch_format="pyarrow", batch_size=None
    )


def read_final(
    lake_root: str,
    sort: bool = False,
    columns: list[str] | None = None,
    as_of: int | None = None,
) -> "rd.Dataset":
    """The current lake state as a Dataset (transcript columns + lsn).

    ``columns`` prunes the scan at the parquet reader (only requested
    columns leave storage) on the plain-scan path; merge-on-read lakes
    project after the per-partition LWW merge (the merge needs the key +
    lsn + op columns regardless).

    ``as_of`` is TIME TRAVEL: resolve through a past committed epoch's
    manifest instead of the pointer (Lake.manifest_at) — the snapshot
    exactly as a reader saw it after that epoch committed. Valid for the
    ``vacuum(keep_manifests=…)`` retention window; older epochs raise
    loudly (their manifests and unreferenced parts were pruned together,
    so a resolvable manifest is always fully readable).

    A partial schema-evolution epoch leaves the snapshot mixed-schema
    (rewritten parts carry the new column, carried-forward parts don't) —
    Ray would infer the schema from the first file and silently drop the
    evolved column from later blocks. Conform every block to the unified
    snapshot schema; the common homogeneous case pays nothing.
    """
    lake = Lake(lake_root)
    if lake.has_deltas(as_of=as_of):
        # merge-on-read lake: one materialize task per partition (same
        # fan-out shape as the merge itself); compact() restores the plain
        # scan fast path below
        parts = lake.partition_files(as_of=as_of)
        items = [
            {"pkey": pk, "base": b, "deltas": ds}
            for pk, (b, ds) in sorted(parts.items())
        ]
        # global output schema: one footer per (epoch dir, file kind) so all
        # blocks conform even under partial evolution (pkey/op stripped)
        sample: dict[tuple[str, str], str] = {}
        for _, (b, ds) in parts.items():
            for p in ([b] if b else []) + ds:
                key = (os.path.dirname(p), os.path.basename(p).split("-")[0])
                sample.setdefault(key, p)
        schemas = []
        for p in sample.values():
            s = pq.read_schema(p)
            for drop in ("pkey", "op"):
                if drop in s.names:
                    s = s.remove(s.get_field_index(drop))
            schemas.append(s)
        target = pa.unify_schemas(schemas, promote_options="permissive")

        if columns is not None:
            target = pa.schema([target.field(c) for c in columns])

        ds = _materialized_dataset(items, target)
        if sort:
            ds = ds.sort(["conv_id", "turn_idx"])
        return ds
    files = lake.snapshot_files(as_of=as_of)
    if not files:
        return rd.from_arrow(LAKE_SCHEMA.empty_table())
    distinct = _snapshot_schemas(files)
    if len(distinct) == 1:
        if columns is not None:
            ds = rd.read_parquet(files, columns=columns)  # pruned at the scan
        else:
            ds = rd.read_parquet(files).drop_columns(["pkey"])
    else:
        target = pa.unify_schemas(distinct, promote_options="permissive")
        if "pkey" in target.names:
            target = target.remove(target.get_field_index("pkey"))
        if columns is not None:
            target = pa.schema([target.field(c) for c in columns])
        # one read per schema group (a mixed-schema union would warn and
        # mis-infer); conform_schema projects onto the unified target,
        # dropping pkey and null-filling evolved columns
        dir_idx: dict[str, int] = {}
        by_schema: dict[int, list[str]] = {}
        for p in files:  # one footer read per epoch dir, not per file
            d = os.path.dirname(p)
            if d not in dir_idx:
                s = pq.read_schema(p)
                dir_idx[d] = next(j for j, o in enumerate(distinct) if s.equals(o))
            by_schema.setdefault(dir_idx[d], []).append(p)
        ds = None
        for i, paths in sorted(by_schema.items()):
            cols = (
                [c for c in columns if c in distinct[i].names]
                if columns is not None
                else None
            )
            part = rd.read_parquet(paths, columns=cols).map_batches(
                partial(conform_schema, target=target), batch_format="pyarrow"
            )
            ds = part if ds is None else ds.union(part)
    if sort:
        ds = ds.sort(["conv_id", "turn_idx"])
    return ds


def read_final_ordered(
    lake_root: str, columns: list[str] | None = None,
    num_ranges: int | None = None,
) -> "rd.Dataset":
    """Globally (conv_id, turn_idx)-ordered read WITHOUT a sort shuffle.

    Every part file is already sorted by (conv_id, turn_idx) (the merge
    writes them that way), so a global order needs only a RANGE
    partitioning over conv_id: boundaries come from parquet row-group
    statistics (each row group holds ~equal rows, so row-group minima
    sample the key distribution for free — no data read), then one task
    per range does a filtered read of every file, pruning to the row
    groups overlapping its range, and sorts its own slice. Blocks come
    back in range order, so the Dataset iterates globally ordered.

    vs ``read_final(sort=True)`` (Ray's sort): no all-to-all exchange —
    each range task pulls only its key range straight from storage
    (row-group stats make the per-file probe cheap), which is exactly the
    ordered-export shape you want at 100 TB. Falls back to the sort
    shuffle while the lake has pending delta parts (tombstones must fold
    before any ordered scan; run ``compact`` first for the fast path).
    """
    lake = Lake(lake_root)
    if lake.has_deltas():
        # the sort needs the keys even when the caller didn't ask for them:
        # read keys + columns, sort, project back to the caller's list
        if columns is not None:
            read_cols = list(dict.fromkeys(
                list(columns) + ["conv_id", "turn_idx"]))
            ds = read_final(lake_root, sort=True, columns=read_cols)
            return ds.select_columns(columns)
        return read_final(lake_root, sort=True, columns=columns)
    files = lake.snapshot_files()
    if not files:
        return rd.from_arrow(LAKE_SCHEMA.empty_table())

    # range boundaries from row-group conv_id minima (footer-only); keep
    # each file's column list so the range reads can prune at the scan
    minima: list[str] = []
    total_rgs = 0
    file_names: dict[str, list[str]] = {}
    for f in files:
        md = pq.read_metadata(f)
        sch = md.schema.to_arrow_schema()
        file_names[f] = sch.names
        ci = sch.get_field_index("conv_id")
        for rg in range(md.num_row_groups):
            total_rgs += 1
            st = md.row_group(rg).column(ci).statistics
            if st is not None and st.has_min_max:
                minima.append(st.min)
    minima.sort()
    if num_ranges is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_ranges = max(1, min(cpus * 2, total_rgs))
    bounds = sorted(
        {minima[(len(minima) * i) // num_ranges] for i in range(1, num_ranges)}
    ) if minima else []
    # half-open conv_id ranges (None = open end); a conversation's turns
    # all land in exactly one range
    ranges = []
    lo = None
    for b in bounds:
        ranges.append({"lo": lo, "hi": b})
        lo = b
    ranges.append({"lo": lo, "hi": None})

    distinct = _snapshot_schemas(files)
    target = pa.unify_schemas(distinct, promote_options="permissive")
    if "pkey" in target.names:
        target = target.remove(target.get_field_index("pkey"))
    keys = ["conv_id", "turn_idx"]
    if columns is not None:
        # read the sort keys regardless (the per-range sort needs them),
        # project to the caller's columns after sorting
        read_names = list(dict.fromkeys(list(columns) + keys))
        target = pa.schema([target.field(c) for c in read_names])
        out_schema = pa.schema([target.field(c) for c in columns])
    else:
        out_schema = target

    def read_range(batch: pa.Table) -> pa.Table:
        outs = []
        for i in batch["i"].to_pylist():
            lo, hi = ranges[i]["lo"], ranges[i]["hi"]
            filt = []
            if lo is not None:
                filt.append(("conv_id", ">=", lo))
            if hi is not None:
                filt.append(("conv_id", "<", hi))
            for f in files:
                # prune at the scan: only requested columns + keys leave
                # storage (evolved files read the subset they have; conform
                # null-fills the rest)
                cols = (
                    [c for c in target.names if c in file_names[f]]
                    if columns is not None
                    else None
                )
                t = pq.read_table(f, filters=filt or None, columns=cols)
                if t.num_rows:
                    outs.append(conform_schema(t, target=target))
        if not outs:
            return out_schema.empty_table()
        t = pa.concat_tables(outs)
        t = t.take(pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        ))
        return t.select(out_schema.names)

    # ship only the range INDEX (mixed None/str bounds would make Ray's
    # per-block schema inference flip between null and string)
    ds = rd.from_items(
        [{"i": i} for i in range(len(ranges))], override_num_blocks=len(ranges)
    ).map_batches(read_range, batch_format="pyarrow", batch_size=None)
    # the whole contract is block order == range order; Ray's streaming
    # executor reorders completed blocks unless told otherwise
    ds.context.execution_options.preserve_order = True
    return ds


def final_table(lake_root: str, as_of: int | None = None) -> pa.Table:
    """Driver-side sorted snapshot for tests/oracle comparison (small scales)."""
    import ray

    ds = read_final(lake_root, sort=False, as_of=as_of)
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        return LAKE_SCHEMA.empty_table()
    t = pa.concat_tables(tables, promote_options="permissive")
    idx = pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    return t.take(idx)


# ---------------------------------------------------------------------------
# change data feed — what changed between two committed snapshots
# ---------------------------------------------------------------------------


def _partitions_dataset(parts, pkeys: list[int]) -> "rd.Dataset":
    """As-of state restricted to the given partitions, via the shared
    merge-on-read read plan (rewrite lakes are the deltas=[] case);
    conforms to LAKE_SCHEMA (evolved columns beyond it are not part of
    the change-feed contract)."""
    items = [
        {"pkey": pk, "base": parts[pk][0], "deltas": parts[pk][1]}
        for pk in pkeys
        if pk in parts
    ]
    if not items:
        return rd.from_arrow(LAKE_SCHEMA.empty_table())
    return _materialized_dataset(items, LAKE_SCHEMA)


CHANGES_SCHEMA = pa.schema(
    [pa.field("change_type", pa.string())] + list(LAKE_SCHEMA)
)


def lake_changes(
    lake_root: str, from_epoch: int, to_epoch: int | None = None
) -> "rd.Dataset":
    """Change data feed: the row-level difference between two committed
    snapshots (the Delta-CDF analog, built on the same retained-manifest
    time travel as ``read_final(as_of=…)``) — 'upsert' rows carry the NEW
    state (key absent at ``from_epoch`` or re-written since: lsn is
    engine-monotone, so any change moves it), 'delete' rows carry the OLD
    state of keys gone from the new snapshot.

    Scale design: the manifest DIFF prunes the work before any file is
    read — a partition whose (base, deltas) entries are identical in both
    manifests cannot contain a change and is skipped entirely, so cost is
    O(changed partitions), not O(lake). The changed partitions then pay
    one key-bucketed join each side (upsert probe + delete anti-join).

    Readers hold no lock, so a CONCURRENT ``vacuum`` that prunes
    ``from_epoch`` can race this read (manifest or part file vanishing
    mid-plan → ValueError / FileNotFoundError) — the same documented
    window ``export_snapshot`` retries around; retry against a retained
    epoch, or don't vacuum while a change feed over old epochs runs."""
    lake = Lake(lake_root)
    to_epoch = lake.current_epoch() if to_epoch is None else to_epoch
    if from_epoch > to_epoch:
        raise ValueError(
            f"from_epoch {from_epoch} is after to_epoch {to_epoch}"
        )
    old_parts = lake.partition_files(as_of=from_epoch)
    new_parts = lake.partition_files(as_of=to_epoch)
    changed = sorted(
        pk
        for pk in set(old_parts) | set(new_parts)
        if old_parts.get(pk) != new_parts.get(pk)
    )
    if not changed:
        return rd.from_arrow(CHANGES_SCHEMA.empty_table())
    # each side feeds TWO consumers (the upsert probe and the delete
    # anti-join); materialize once or the per-partition LWW merge — the
    # feature's core cost — executes twice per side
    old_ds = _partitions_dataset(old_parts, changed).materialize()
    new_ds = _partitions_dataset(new_parts, changed).materialize()

    from ..stages.joins import bucketed_hash_join

    cols = LAKE_SCHEMA.names

    def old_key_lsn(b: "pd.DataFrame") -> "pd.DataFrame":
        return b[["conv_id", "turn_idx", "lsn"]].rename(
            columns={"conv_id": "_oc", "turn_idx": "_ot", "lsn": "_old_lsn"}
        )

    probed = bucketed_hash_join(
        new_ds,
        old_ds.map_batches(old_key_lsn, batch_format="pandas"),
        left_on=["conv_id", "turn_idx"],
        right_on=["_oc", "_ot"],
        how="left",
    )

    def upserts(b: "pd.DataFrame") -> "pd.DataFrame":
        # a missing old row left-joins to NaN (float64); lsn is bounded by
        # the event count (≪ 2^53), so the int64 round-trip is exact and
        # -1 is a safe sentinel (lsn ≥ 0)
        old_lsn = b["_old_lsn"].fillna(-1).to_numpy(dtype="int64")
        keep = b[old_lsn != b["lsn"].to_numpy(dtype="int64")]
        out = keep[cols].copy(deep=False)
        out.insert(0, "change_type", "upsert")
        return out

    def new_keys(b: "pd.DataFrame") -> "pd.DataFrame":
        return b[["conv_id", "turn_idx"]].rename(
            columns={"conv_id": "_nc", "turn_idx": "_nt"}
        )

    gone = bucketed_hash_join(
        old_ds,
        new_ds.map_batches(new_keys, batch_format="pandas"),
        left_on=["conv_id", "turn_idx"],
        right_on=["_nc", "_nt"],
        how="left_anti",
    )

    def deletes(b: "pd.DataFrame") -> "pd.DataFrame":
        out = b[cols].copy(deep=False)
        out.insert(0, "change_type", "delete")
        return out

    return probed.map_batches(upserts, batch_format="pandas").union(
        gone.map_batches(deletes, batch_format="pandas")
    )
