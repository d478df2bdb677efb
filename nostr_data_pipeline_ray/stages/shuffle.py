"""Bucketed shuffle-aggregate: the engine's workhorse for high-cardinality
grouped operations.

Measured on this Ray build (2.49, single node, 8 CPUs, 2.3M rows / 250k
keys): ``groupby(keys).aggregate(Count)`` = 34 s (per-key Python combine),
``sort`` alone = 2.7 s, and this pattern — hash keys into B buckets,
``groupby(bucket)`` (low-cardinality, cheap), vectorized pandas aggregation
inside each bucket — = 2.1 s. The same trick is the backbone of the CDC
merge (pipelines/cdc.py partitions by pkey for exactly this reason).

Correctness: every row of a key lands in exactly one bucket (bucket is a
hash of the key columns), so a per-bucket pandas groupby is a complete
aggregation for its keys.

Skew: bucket load is balanced by key-hash; a single hot KEY still lands in
one bucket — pass ``pre`` (a per-batch partial combiner) to collapse hot
keys map-side before the shuffle, which is the salting-equivalent for
algebraic aggregates.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd

_FNV = np.uint64(0xCBF29CE484222325)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_KNUTH = np.uint64(2654435761)
_HASH_MOD = np.uint64(1) << np.uint64(32)


def id_hash(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash of nonnegative int ids, mod 2^32 —
    bijective (odd multiplier), so distinct ids never collide, and exactly
    reproducible as DuckDB HUGEINT arithmetic
    (``(id::HUGEINT * 2654435761) % 4294967296``): the shared key for the
    deterministic samplers (pipelines/analytics.py) and the sequence
    packer's sharding (pipelines/pack.py). uint64 multiply wraps mod 2^64,
    and 2^32 divides 2^64, so the residue equals the exact-arithmetic
    oracle."""
    return (np.asarray(ids).astype(np.uint64) * _KNUTH) % _HASH_MOD


_FMIX1 = np.uint64(0x85EBCA6B)
_FMIX2 = np.uint64(0xC2B2AE35)


def finalize32(h: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix32 avalanche over 32-bit values (uint64 arrays,
    values < 2^32). A purely multiplicative hash is linear mod small
    powers of two — ``id_hash(i) % 16`` round-robins sequential ids — so
    any consumer that buckets by LOW bits (e.g. ``shard = h % n`` with a
    power-of-two n) must avalanche first. fmix32 is bijective on 32 bits
    (each xor-shift and odd multiply is invertible), so distinct hashes
    stay distinct, and every step mirrors exactly in DuckDB BIGINT/HUGEINT
    arithmetic (``xor(h, h >> k)`` and ``(h::HUGEINT * c) % 4294967296``) —
    the same oracle-reproducibility contract as ``id_hash``."""
    h = h ^ (h >> np.uint64(16))
    h = (h * _FMIX1) % _HASH_MOD
    h = h ^ (h >> np.uint64(13))
    h = (h * _FMIX2) % _HASH_MOD
    return h ^ (h >> np.uint64(16))

# Each bucket is materialized as ONE pandas DataFrame inside map_groups, so
# bucket count must scale with input size: ~64 MB of parquet (≈ a few hundred
# MB in-memory) per bucket. At 100 TB that is ~1.6M buckets — the groupby key
# stays low-cardinality per block while no single bucket outgrows a worker.
TARGET_BUCKET_BYTES = 64 << 20
MAX_BUCKETS = 1 << 20

# Below this source size the whole input is a fraction of ONE bucket's
# budget, so the groupby exchange is pure fixed overhead (~0.7-0.9 s of
# plan/sort machinery on this Ray build regardless of row count): apply the
# per-bucket fn once over the whole input in a single task instead — the
# exact num_buckets=1 semantics. 16 MB of parquet keeps the single task's
# in-memory footprint bounded even through ~10x explode stages; anything
# larger takes the distributed exchange. Only auto-sized calls take this
# path — an explicit num_buckets is honored.
LOCAL_MAX_INPUT_BYTES = 16 << 20


def resolve_buckets(
    ds=None,
    num_buckets: int | None = None,
    input_bytes: int | None = None,
) -> int:
    """Pick the bucket count: explicit override > caller-supplied input size
    > the dataset's own source files > the legacy default of 32.

    ``input_files()`` only survives until the first transform, so call sites
    that wrap the read in ``map_batches`` must pass ``input_bytes`` (the
    ``_read`` helpers know the file size anyway)."""
    if num_buckets is not None:
        return num_buckets
    if input_bytes is None and ds is not None:
        input_bytes = input_bytes_of(ds)
    if input_bytes is None:
        return 32
    return int(min(MAX_BUCKETS, max(32, -(-input_bytes // TARGET_BUCKET_BYTES))))


def _local_sized(ds, input_bytes: int | None) -> bool:
    """True when the source size is known and small enough for the
    single-task fast path (see LOCAL_MAX_INPUT_BYTES). Unknown sizes take
    the distributed path — never guess small."""
    if input_bytes is None and ds is not None:
        input_bytes = input_bytes_of(ds)
    return input_bytes is not None and input_bytes <= LOCAL_MAX_INPUT_BYTES


def input_bytes_of(ds) -> int | None:
    """Source-file bytes of a Dataset, if its plan still exposes them."""
    try:
        files = ds.input_files()
        return sum(os.path.getsize(f) for f in files if os.path.exists(f)) or None
    except Exception:
        return None


def _part_files(path: str) -> list[str]:
    return [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in sorted(fs)
        if f.endswith(".parquet")
    ]


def table_bytes(path: str) -> int:
    """Bytes of a parquet table that is either a single file (the testdata
    fixtures) or a directory of part files (engine-written output, e.g. the
    lake-document export feeding `curate --from-lake`). Used everywhere a
    pipeline sizes its bucket/block counts from the source."""
    if os.path.isdir(path):
        return sum(os.path.getsize(f) for f in _part_files(path))
    return os.path.getsize(path)


def table_rows(path: str) -> int:
    """Row count from parquet footers only — file or directory of parts."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(pq.read_metadata(f).num_rows for f in _part_files(path))
    return pq.read_metadata(path).num_rows


def key_buckets(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    h = np.full(len(df), _FNV, dtype=np.uint64)
    for k in keys:
        kh = pd.util.hash_array(np.asarray(df[k]))
        h = (h ^ kh) * _GOLDEN
    return (h % np.uint64(num_buckets)).astype(np.int32)


def bucketed_map_groups(
    ds,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
    pre: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    input_bytes: int | None = None,
    allow_local: bool = True,
):
    """Hash-partition ``ds`` by ``keys`` into buckets (count sized from the
    input — see ``resolve_buckets``) and apply ``fn`` once per bucket (all
    rows of any key co-located).

    ``fn`` receives the bucket as a DataFrame (without the bucket column)
    and must do its own per-key logic vectorized (pandas groupby / drop_
    duplicates / sort+head). ``pre`` is an optional per-batch map-side
    partial combiner run BEFORE the shuffle.
    """
    # ``allow_local=False`` opts compute-dense stages out (vector math,
    # quadratic pair fan-out): source bytes underestimate their work, and
    # serializing it onto one core costs more than the exchange saves
    if allow_local and num_buckets is None and _local_sized(ds, input_bytes):
        out = ds if pre is None else ds.map_batches(pre, batch_format="pandas")
        return out.repartition(1).map_batches(
            fn, batch_format="pandas", batch_size=None
        )
    num_buckets = resolve_buckets(ds, num_buckets, input_bytes)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        if pre is not None:
            batch = pre(batch)
        batch = batch.copy(deep=False)
        batch["_bucket"] = key_buckets(batch, keys, num_buckets)
        return batch

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def local_topk(ds, by: list[str], descending: list[bool], k: int):
    """Global top-k without a full-range sort: per-batch vectorized prune to
    k rows, then the final sort+limit runs over ≤ k·num_blocks rows.
    Deterministic given a tie-breaking key in ``by``."""
    ascending = [not d for d in descending]

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=ascending).head(k)

    return ds.map_batches(prune, batch_format="pandas").sort(
        by, descending=descending
    ).limit(k)


def bucketed_sum_count(
    ds,
    keys: list[str],
    sums: dict[str, str],
    count_as: str | None = None,
    num_buckets: int | None = None,
    input_bytes: int | None = None,
):
    """Grouped sum/count with map-side partial combine (the two-phase
    aggregate): per-batch pandas groupby first, bucketed final combine after
    — the shuffle moves one row per key per batch, not one per input row."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, observed=True)
        if sums:
            out = g[list(sums)].sum().reset_index().rename(columns=sums)
            if count_as:
                out[count_as] = g.size().to_numpy()
        else:
            out = g.size().reset_index(name=count_as)
        return out

    agg_cols = list(sums.values()) + ([count_as] if count_as else [])

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.groupby(keys, sort=False, observed=True)[agg_cols].sum().reset_index()

    return bucketed_map_groups(
        ds, keys, final, num_buckets=num_buckets, pre=partial, input_bytes=input_bytes
    )
