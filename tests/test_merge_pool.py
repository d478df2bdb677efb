"""Follow-mode merge pool: pkey-routed persistent actors whose snapshot
cache keeps each partition's base part in memory between epochs (rewrite
policy). Reference analog: the DB handed the reference's profile merge its
read-modify-write current row for free (event_loader.py:60-87); here the
actor owns it explicitly, keyed by the immutable manifest path."""

import pyarrow as pa

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    MergePool,
    _SnapshotCache,
    apply_changelog,
    compact,
    final_table,
    follow_changelog,
)
from nostr_data_pipeline_ray.synth import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)

CFG = EngineConfig(num_partitions=8, turn_bucket=16, epoch_segments=2,
                   merge_policy="rewrite")


def _oracle_match(lake_root, binlog):
    got = final_table(lake_root)
    want = expected_final_state(binlog)
    assert got.num_rows == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_cache_lru_eviction_and_rel_keying():
    t_small = pa.table({"x": list(range(10))})
    c = _SnapshotCache(limit_bytes=t_small.nbytes * 2 + 8)
    c.put(1, "parts/epoch-1/part-00001.parquet", t_small)
    c.put(2, "parts/epoch-1/part-00002.parquet", t_small)
    assert c.get(1, "parts/epoch-1/part-00001.parquet") is t_small
    # stale rel (external compact rewrote the base) must miss, never serve
    assert c.get(1, "parts/epoch-9/part-00001.parquet") is None
    c.put(3, "r3", t_small)  # over budget → LRU (pkey 2) evicted
    assert c.get(2, "parts/epoch-1/part-00002.parquet") is None
    assert c.get(3, "r3") is t_small
    assert c.bytes <= c.limit
    # a single table larger than the whole budget must not be retained
    # (the limit is an OOM guard — the newest entry is not exempt)
    t_big = pa.table({"x": list(range(10_000))})
    c.put(4, "r4", t_big)
    assert c.get(4, "r4") is None
    assert c.bytes <= c.limit and c.bytes >= 0


def test_pool_merges_exactly_and_hits_across_epochs(tmp_path):
    binlog = generate_changelog(
        str(tmp_path / "b"),
        ChangelogSpec(n_events=8_000, n_convs=250, n_segments=6, seed=31),
    )
    lake_root = str(tmp_path / "lake")
    pool = MergePool(lake_root, n_actors=4, cache_mb=64)
    try:
        out = apply_changelog(lake_root, binlog, CFG, merge_pool=pool)
        assert len(out["epochs"]) == 3
        stats = pool.cache_stats()
        # epoch 1 misses (cold); epochs 2-3 re-merge mostly-warm partitions
        assert stats["hits"] > 0
        assert stats["entries"] > 0
    finally:
        pool.shutdown()
    _oracle_match(lake_root, binlog)


def test_pool_result_equals_stateless_path(tmp_path):
    binlog = generate_changelog(
        str(tmp_path / "b"),
        ChangelogSpec(n_events=6_000, n_convs=200, n_segments=4, seed=7),
    )
    pooled, plain = str(tmp_path / "pooled"), str(tmp_path / "plain")
    pool = MergePool(pooled, n_actors=3, cache_mb=32)
    try:
        apply_changelog(pooled, binlog, CFG, merge_pool=pool)
    finally:
        pool.shutdown()
    apply_changelog(plain, binlog, CFG)
    a, b = final_table(pooled), final_table(plain)
    assert a.cast(b.schema).equals(b)


def test_follow_mode_owns_pool_and_reports_cache(tmp_path):
    binlog = generate_changelog(
        str(tmp_path / "b"),
        ChangelogSpec(n_events=6_000, n_convs=200, n_segments=6, seed=13),
    )
    import dataclasses

    cfg = dataclasses.replace(CFG, snapshot_cache_mb=32)
    lake_root = str(tmp_path / "lake")
    out = follow_changelog(lake_root, binlog, cfg, poll_interval=0.1,
                           idle_timeout=0.5)
    assert out["snapshot_cache"] is not None
    assert out["snapshot_cache"]["hits"] > 0
    _oracle_match(lake_root, binlog)


def test_external_compact_invalidates_via_rel(tmp_path):
    """A compaction between pooled applies rewrites base rels; the pool must
    miss (not serve stale tables) and still land on the LWW oracle."""
    binlog_dir = str(tmp_path / "b")
    binlog = generate_changelog(
        binlog_dir,
        ChangelogSpec(n_events=6_000, n_convs=200, n_segments=6, seed=19),
    )
    lake_root = str(tmp_path / "lake")
    import glob
    import os
    import shutil

    segs = sorted(glob.glob(os.path.join(binlog, "*")))
    half = str(tmp_path / "half")
    os.makedirs(half)
    for s in segs[:3]:
        shutil.copy(s, half)
    pool = MergePool(lake_root, n_actors=4, cache_mb=64)
    try:
        apply_changelog(lake_root, half, CFG, merge_pool=pool)
        compact(lake_root)  # new epoch dirs → every cached rel goes stale
        for s in segs[3:]:
            shutil.copy(s, half)
        apply_changelog(lake_root, half, CFG, merge_pool=pool)
    finally:
        pool.shutdown()
    _oracle_match(lake_root, binlog)
