"""Engine configuration.

Analog of the reference's pydantic-settings config surface
(reference: src/nostr_pipeline/config.py:8-78) re-expressed as a plain
dataclass: batch/epoch knobs, partitioning knobs, lake layout knobs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    """Knobs for the CDC apply pipeline.

    num_partitions: number of hash partitions of the lake. At 100 TB this
        would be thousands; locally we default to 32 so each partition file
        stays in the tens of MB at bench scale.
    turn_bucket: the partition key is hash(conv_id, turn_idx // turn_bucket)
        — any deterministic function of the upsert key (conv_id, turn_idx)
        is a valid LWW partitioner, so bucketing by turn range splits a hot
        conversation across partitions (salted repartitioning for
        hot-conversation skew) while preserving turn-range locality.
        Set very large (2**30) for pure conv_id partitioning.
    epoch_segments: binlog segments applied per commit epoch (micro-batch
        trigger; reference batches 100 events / 5 s, config.py:44-47 — here
        the unit is a whole LSN-ordered segment file).
    batch_size: rows per Arrow batch in map_batches stages.
    merge_concurrency: actor-pool / task parallelism hint for the merge
        stage; None lets Ray size it.
    """

    num_partitions: int = 32
    turn_bucket: int = 256
    epoch_segments: int = 8
    batch_size: int = 65536
    merge_concurrency: int | None = None
    # scratch location for the map-side exchange (staged delta files). On a
    # real cluster this is node-local SSD / shared object storage; locally a
    # tmpfs path (e.g. /dev/shm/...) models per-node scratch bandwidth.
    # None → inside the lake directory.
    scratch_dir: str | None = None
    # exchange file format. "auto" (default, POLICY since the r4 exchange
    # matrix): "ipc-lz4" when the scratch filesystem is node-local (tmpfs /
    # local ext4/xfs — lz4 won BOTH 32-CPU throughput, 4.16M ev/s, and 8→32
    # scaling efficiency there), "parquet" when scratch looks like shared /
    # network storage (snappy-compressed bytes crossing a network, plus
    # tooling ubiquity) or the filesystem is unknown. Explicit values:
    # "parquet"; "ipc" (uncompressed Arrow — ~35% faster absolute on tmpfs
    # but memory-bandwidth-bound); "ipc-lz4" / "ipc-zstd" buffer-compress
    # the IPC frames (see BASELINE.md exchange matrix).
    staged_format: str = "auto"
    # dictionary-encode string columns of IPC staged files (parquet already
    # dict-encodes pages internally). Measured: no win on this workload —
    # the exchange bytes are dominated by near-unique transcript text, which
    # a dictionary cannot compress (see BASELINE.md) — kept as a knob for
    # payloads with repetitive strings.
    staged_dict: bool = False
    # how an epoch lands on a touched partition:
    #   "rewrite" (default) — copy-on-write: merge staged delta + base (+ any
    #       pending delta parts) into a new base part. Read path stays a plain
    #       parquet scan; best for bulk replay / low epoch rates.
    #   "delta" — merge-on-read (LSM): write ONE sorted delta part per
    #       touched partition and leave the base alone; readers LWW-merge
    #       base+deltas, compact() folds them back into a base. Per-epoch
    #       cost tracks the DELTA, not the partition snapshot — the
    #       high-frequency follow-mode / micro-batch policy.
    merge_policy: str = "rewrite"
    # follow-mode snapshot cache (rewrite policy only): per-merge-actor LRU
    # byte budget for keeping each partition's CURRENT base part in actor
    # memory between epochs, so the per-epoch merge re-reads only the staged
    # delta, not the whole base. 0 disables (one-shot applies gain nothing;
    # stateless tasks stay the default). Routed pkey % n_actors so the same
    # actor owns a partition across epochs; entries are keyed by the base
    # part's manifest path, so an external compact/delete simply misses.
    snapshot_cache_mb: int = 0
    # malformed-line policy for JSONL segments (a schema-less feed can carry
    # truncated / corrupt / type-invalid lines — non-JSON, non-object, a
    # string turn_idx, a bad ISO timestamp):
    #   "error" (default) — fail the apply loudly, naming the segment and
    #       the first bad line (a clean feed should never pay for tolerance
    #       it didn't ask for, and silent drops are data loss).
    #   "quarantine" — divert bad lines to a dead-letter parquet under
    #       <lake>/_quarantine/<segment>.parquet (segment, line_no, error,
    #       raw) and apply the valid rows; idempotent per segment (retry
    #       overwrites the same file). Clean segments stay on the zero-copy
    #       read_json fast path either way — the tolerant metadata parse
    #       already sees every line, so detection is free.
    on_malformed: str = "error"

    @staticmethod
    def from_env() -> "EngineConfig":
        return EngineConfig(
            num_partitions=int(os.environ.get("NDP_NUM_PARTITIONS", 32)),
            turn_bucket=int(os.environ.get("NDP_TURN_BUCKET", 256)),
            epoch_segments=int(os.environ.get("NDP_EPOCH_SEGMENTS", 8)),
            batch_size=int(os.environ.get("NDP_BATCH_SIZE", 65536)),
            scratch_dir=os.environ.get("NDP_SCRATCH_DIR") or None,
            staged_format=os.environ.get("NDP_STAGED_FORMAT", "auto"),
            staged_dict=bool(int(os.environ.get("NDP_STAGED_DICT", "0"))),
            merge_policy=os.environ.get("NDP_MERGE_POLICY", "rewrite"),
            snapshot_cache_mb=int(os.environ.get("NDP_SNAPSHOT_CACHE_MB", 0)),
            on_malformed=os.environ.get("NDP_ON_MALFORMED", "error"),
        )


# filesystem types considered node-local for staged-exchange purposes: the
# lz4-compressed IPC frames only pay off when encode/decode bandwidth is the
# bottleneck, not network bytes
_LOCAL_FS_TYPES = {
    "tmpfs", "ramfs", "ext4", "xfs", "btrfs", "zfs", "f2fs", "overlay",
    "devtmpfs",
}


def _fs_type(path: str) -> str | None:
    """Filesystem type of the longest /proc/mounts prefix of ``path``
    (the path need not exist yet — staged dirs are created lazily)."""
    path = os.path.realpath(path)
    best, fstype = "", None
    try:
        with open("/proc/mounts") as f:
            for line in f:
                parts = line.split()
                if len(parts) < 3:
                    continue
                mnt, t = parts[1], parts[2]
                pref = mnt.rstrip("/") + "/"
                if (path == mnt or path.startswith(pref)) and len(mnt) > len(best):
                    best, fstype = mnt, t
    except OSError:
        return None
    return fstype


def resolve_staged_format(fmt: str, scratch_path: str) -> str:
    """Resolve ``staged_format="auto"`` against the scratch location:
    ipc-lz4 on node-local filesystems (tmpfs/local disk — the r4 exchange
    matrix's winner for both throughput and scaling there), parquet on
    shared/network storage or when the filesystem is unrecognizable
    (conservative: compressed bytes + tooling ubiquity). Explicit formats
    pass through untouched."""
    if fmt != "auto":
        return fmt
    return "ipc-lz4" if _fs_type(scratch_path) in _LOCAL_FS_TYPES else "parquet"
