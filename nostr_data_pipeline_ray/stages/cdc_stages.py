"""Vectorized per-batch stages of the CDC apply pipeline.

All stages are Arrow-in / Arrow-out ``map_batches`` bodies (zero-copy from
the object store) — no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Deterministic 64-bit string hashing, vectorized (pandas' siphash over the
# fixed default key). The partition mapping is persisted in the lake
# manifest, so the hash must be stable across processes — pandas'
# hash_array with the default hash_key is.
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash_conv(conv_id: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = (
        conv_id.combine_chunks()
        if isinstance(conv_id, pa.ChunkedArray)
        else conv_id
    )
    # Hash each DISTINCT value once and gather: bitwise-identical to the
    # elementwise hash (hash_array is positionless), ~2.4x less CPU at the
    # ~6x per-segment key duplication both the bench and stress binlogs
    # carry (0.16 vs 0.37 s per 800k-row segment in isolation). Wall-time
    # on a saturated single socket is a wash (interleaved pipeline A/B:
    # 11.7-12.4 s dict vs 10.4-12.9 s elementwise per 51M-event delta
    # phase — memory bandwidth, not CPU, binds there), but lower CPU per
    # row is the right trade on a real cluster where each node brings its
    # own bandwidth. Decide on the EXACT distinct count after Arrow's
    # cheap C++ encode — a prefix probe underestimates duplication
    # (distinct keys accumulate sublinearly). Below 2x duplication the
    # gather detour stops paying; hash the raw values instead.
    if arr.null_count == 0 and len(arr):
        enc = (
            arr
            if pa.types.is_dictionary(arr.type)
            else arr.dictionary_encode()
        )
        if len(enc.dictionary) * 2 <= len(arr):
            dvals = np.asarray(enc.dictionary.to_pandas(), dtype=object)
            return pd.util.hash_array(dvals)[
                enc.indices.to_numpy(zero_copy_only=False)
            ]
    values = np.asarray(arr.to_pandas(), dtype=object)
    return pd.util.hash_array(values)


def partition_key(
    conv_id: pa.ChunkedArray | pa.Array,
    turn_idx: pa.ChunkedArray | pa.Array,
    num_partitions: int,
    turn_bucket: int,
    conv_hash: np.ndarray | None = None,
) -> np.ndarray:
    """pkey = hash(conv_id, turn_idx // turn_bucket) % P.

    Any deterministic function of the upsert key (conv_id, turn_idx) is a
    valid LWW partitioner. Folding in the turn-range bucket is the salted
    repartitioning for hot-conversation skew: a conversation with thousands
    of hot turns spreads over ~max_turn/turn_bucket partitions instead of
    landing on one reducer (cf. SURVEY.md §4.2 item 4).

    This mix expression is the persisted partition mapping — the point-read
    and pruning paths re-derive it, so it must exist exactly once.
    ``conv_hash`` lets a caller that already hashed conv_id skip the second
    (expensive) string-hash pass.
    """
    h = hash_conv(conv_id) if conv_hash is None else conv_hash
    bucket = (turn_idx.to_numpy(zero_copy_only=False).astype(np.uint64)) // np.uint64(
        turn_bucket
    )
    mixed = h ^ (bucket * _GOLDEN)
    return (mixed % np.uint64(num_partitions)).astype(np.int32)


def add_pkey(batch: pa.Table, *, num_partitions: int, turn_bucket: int) -> pa.Table:
    """Adds ``pkey`` and ``khash`` (the conv_id string hash, reused by
    SplitStage's filename digest so the expensive string hash runs once
    per row, not twice; both columns are stripped before staging)."""
    h = hash_conv(batch["conv_id"])
    pk = partition_key(
        batch["conv_id"], batch["turn_idx"], num_partitions, turn_bucket, conv_hash=h
    )
    return batch.append_column("pkey", pa.array(pk, pa.int32())).append_column(
        "khash", pa.array(h)
    )


def _key_codes(batch: pa.Table) -> np.ndarray:
    """int64 codes for (conv_id, turn_idx) within one batch."""
    conv = batch["conv_id"].combine_chunks() if isinstance(
        batch["conv_id"], pa.ChunkedArray
    ) else batch["conv_id"]
    codes = pc.dictionary_encode(conv).indices.to_numpy(zero_copy_only=False)
    # pack turn_idx through a uint32 VIEW: bijective on the full int32
    # range (negative turns map to the high half), so no two distinct
    # (conv, turn) pairs share a code — raw `codes*2^32 + turn` collided
    # (conv, -1) with (conv-1, 2^32-1) and precombine would silently drop
    # a live row. turn_idx is int32 by the changelog schema; anything
    # wider is a corrupt input worth failing loudly on.
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
    turn32 = turn.astype(np.int32)
    if not np.array_equal(turn32, turn):
        raise ValueError("turn_idx outside int32 — corrupt changelog input")
    turn_u = turn32.view(np.uint32).astype(np.int64)
    return codes.astype(np.int64) * np.int64(1 << 32) + turn_u


def precombine(batch: pa.Table) -> pa.Table:
    """Local LWW combiner: per batch, keep only the max-(lsn, position) row
    of each (conv_id, turn_idx).

    This is the map-side combine that bounds the shuffle: a hot conversation
    updated a million times in one epoch ships at most one row per key per
    input block, not a million (reference analog: per-micro-batch dedup,
    src/nostr_pipeline/pipeline.py:202-211 — generalized from
    first-by-event-id to last-by-LSN).

    Ties on lsn (duplicate delivery) are broken by stable input position,
    giving a deterministic total order (SURVEY.md §7.4).
    """
    if batch.num_rows == 0:
        return batch
    key = _key_codes(batch)
    lsn = batch["lsn"].to_numpy(zero_copy_only=False)
    order = np.argsort(lsn, kind="stable")  # ascending lsn, stable on position
    rev = order[::-1]  # descending: first hit per key = LWW winner
    _, first_pos = np.unique(key[rev], return_index=True)
    if len(first_pos) == batch.num_rows:
        return batch  # no local duplicates — zero-copy passthrough
    mask = np.zeros(batch.num_rows, dtype=bool)
    mask[rev[first_pos]] = True
    return batch.filter(pa.array(mask))  # measured 2.4x faster than take()


def conform_schema(batch: pa.Table, *, target: pa.Schema) -> pa.Table:
    """Project a batch onto the unified target schema (additive evolution).

    Missing columns become typed nulls; present columns are cast if the
    unified type promoted them (pa.unify_schemas, permissive). Reference
    analog: JSON escape-hatch columns absorbing new fields
    (reference: src/nostr_pipeline/models.py:64,117-120; CLAUDE.md:168).
    """
    arrays = []
    for field in target:
        if field.name in batch.column_names:
            col = batch[field.name]
            if col.type != field.type:
                col = pc.cast(col, field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(batch.num_rows, field.type))
    return pa.table(arrays, schema=target)


def watermark_filter(batch: pa.Table, *, watermarks: dict[int, int]) -> pa.Table:
    """Drop change rows at or below the committed per-partition watermark.

    Makes replaying an already-committed segment a row-level no-op (the
    merge is idempotent anyway; this short-circuits the work). ``watermarks``
    is a small driver-broadcast dict (ray.put'd with the stage closure).
    """
    if not watermarks or batch.num_rows == 0:
        return batch
    pk = batch["pkey"].to_numpy(zero_copy_only=False)
    lsn = batch["lsn"].to_numpy(zero_copy_only=False)
    wm = np.full(int(pk.max()) + 1, -1, dtype=np.int64)
    for k, v in watermarks.items():
        if k < len(wm):
            wm[k] = v
    return batch.filter(pa.array(lsn > wm[pk]))
