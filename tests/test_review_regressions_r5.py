"""Regressions pinned from the round-5 adversarial code review of the core
engine files (cdc.py, state/lake.py, stages/joins.py, stages/graph.py):
op-less first epochs, the compact_after=1 no-op, stale staged-dir sweep,
empty-input contracts for joins/CC, int32 preservation through the
bucketed join, the per-instance manifest parse cache."""

import hashlib
import json
import os

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    compact,
    final_table,
    select_compaction,
)
from nostr_data_pipeline_ray.stages.graph import connected_components
from nostr_data_pipeline_ray.stages.joins import (
    broadcast_join,
    bucketed_hash_join,
)
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog

CFG = EngineConfig(num_partitions=8, turn_bucket=16, epoch_segments=4)


def test_opless_jsonl_first_epoch_applies(tmp_path, ray_session):
    """A first epoch fed ONLY op-less JSONL (a raw spooled stream where
    every event is an insert) must apply: the unified merge schema now
    force-appends 'op' (null = upsert) like the read path always did —
    it used to KeyError inside MergeTask at winners['op']."""
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    rows = [
        {"conv_id": "c-1", "turn_idx": 0, "role": "user", "text": "hi",
         "tool": "", "ts": 1000, "lsn": 1},
        {"conv_id": "c-1", "turn_idx": 1, "role": "assistant", "text": "yo",
         "tool": "", "ts": 1001, "lsn": 2},
        {"conv_id": "c-2", "turn_idx": 0, "role": "user", "text": "hey",
         "tool": "", "ts": 1002, "lsn": 3},
    ]
    with open(os.path.join(binlog, "seg-00000.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, CFG)
    got = final_table(lake)
    assert got.num_rows == 3
    assert set(got["conv_id"].to_pylist()) == {"c-1", "c-2"}
    # a later op-BEARING segment still merges over the op-less epoch
    with open(os.path.join(binlog, "seg-00001.jsonl"), "w") as f:
        f.write(json.dumps(
            {"conv_id": "c-1", "turn_idx": 1, "role": "assistant",
             "text": "updated", "tool": "", "ts": 1003, "lsn": 4,
             "op": "update"}
        ) + "\n")
    apply_changelog(lake, binlog, CFG)
    got = final_table(lake).to_pylist()
    texts = {(r["conv_id"], r["turn_idx"]): r["text"] for r in got}
    assert texts[("c-1", 1)] == "updated" and len(got) == 3


def test_select_compaction_honors_depth_one(tmp_path, ray_session):
    """compact_after=1 means 'fold every delta immediately': a depth-1
    chain must be picked. The old blanket `< 2` skip silently raised the
    minimum read-amp cap to 2 and made max_depth=1 a permanent no-op."""
    import dataclasses

    spec = ChangelogSpec(n_events=3_000, n_convs=120, n_segments=2, seed=31)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    lake = str(tmp_path / "lake")
    cfg = dataclasses.replace(CFG, merge_policy="delta")
    apply_changelog(lake, binlog, cfg)
    m = Lake(lake).current_manifest()
    depth1 = [int(k) for k, v in m["deltas"].items() if len(v) == 1]
    assert depth1  # single-epoch replay: every touched partition is depth 1

    assert select_compaction(lake, max_depth=2, eager_bytes=0) == []
    picks = select_compaction(lake, max_depth=1, eager_bytes=0)
    assert sorted(depth1) == [p for p in picks if p in depth1] == sorted(depth1)
    out = compact(lake, picks)
    assert out["partitions"] == len(picks)
    assert not Lake(lake).has_deltas()


def test_stale_staged_epoch_dirs_swept(tmp_path, ray_session):
    """A crash between the manifest commit and the post-commit rmtree used
    to orphan that epoch's whole staged exchange dir forever (RAM on a
    tmpfs scratch): the next apply's sweep now clears EVERY stale
    epoch-*-delta dir in this lake's scratch namespace."""
    spec = ChangelogSpec(n_events=2_000, n_convs=80, n_segments=2, seed=37)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)

    lake_id = hashlib.sha1(
        os.path.realpath(lake_root).encode()
    ).hexdigest()[:12]
    ns = os.path.join(lake_root, "parts", f"lake-{lake_id}")
    stale = os.path.join(ns, "epoch-1-delta", "pk-00001")
    os.makedirs(stale)
    with open(os.path.join(stale, "orphan.parquet"), "wb") as f:
        f.write(b"left by a crashed epoch")

    seg0 = sorted(f for f in os.listdir(binlog) if f.endswith(".parquet"))[0]
    import shutil

    shutil.copy(os.path.join(binlog, seg0),
                os.path.join(binlog, "seg-99990.parquet"))
    apply_changelog(lake_root, binlog, CFG)  # next epoch sweeps the orphan
    assert not os.path.exists(os.path.join(ns, "epoch-1-delta"))


def test_connected_components_empty_edges(ray_session):
    """CC owns its empty-input contract now (callers used to hand-guard
    count()==0 everywhere): an empty, even schema-less, edge set returns
    an empty typed (node, label) frame instead of KeyError."""
    empty = rd.from_items([])  # no inferable schema at all
    out = connected_components(empty)
    # NB: to_pandas() on an empty dataset drops columns (the documented
    # Ray hazard) — the Dataset-level schema is the contract to pin
    assert out.count() == 0
    assert list(out.schema().names) == ["node", "label"]


def test_bucketed_join_empty_right_contracts(ray_session):
    """Schema-less empty right side: semi/anti short-circuit (trivial
    answers), inner/left raise the documented contract error instead of
    AttributeError on rschema.names."""
    left = rd.from_arrow(pa.table({"k": [1, 2], "v": ["a", "b"]}))
    empty = rd.from_items([])
    assert bucketed_hash_join(
        left, empty, ["k"], ["rk"], "left_anti"
    ).count() == 2
    assert bucketed_hash_join(
        left, empty, ["k"], ["rk"], "left_semi"
    ).count() == 0
    with pytest.raises(ValueError, match="no inferable schema"):
        bucketed_hash_join(left, empty, ["k"], ["rk"], "inner")


def test_bucketed_join_preserves_int32(ray_session):
    """An int32 column must come out int32 — the NA-padding restore used
    to blanket-coerce every integer column to int64, introducing a
    join-side schema mismatch against the column's own producer."""
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "turn": pa.array([10, 20, 30], pa.int32()),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 3], pa.int64()),
        "tag": pa.array(["x", "y"]),
    }))
    out = bucketed_hash_join(left, right, ["k"], ["rk"], "inner").to_pandas()
    assert len(out) == 2
    assert out["turn"].dtype == "int32"
    assert out["k"].dtype == "int64" and out["rk"].dtype == "int64"
    # the existence probe returns left rows UNCHANGED, dtypes included
    semi = bucketed_hash_join(left, right, ["k"], ["rk"], "left_semi").to_pandas()
    assert semi["turn"].dtype == "int32"


def test_broadcast_join_rejects_per_batch_unsound_modes(ray_session):
    """right/outer over a per-batch broadcast merge would re-emit each
    unmatched small-side row once per block — refuse them up front."""
    ds = rd.from_arrow(pa.table({"k": [1, 2]}))
    small = pd.DataFrame({"k2": [1, 9], "name": ["a", "b"]})
    with pytest.raises(ValueError, match="inner.*left"):
        broadcast_join(ds, small, left_on="k", right_on="k2", how="outer")
    with pytest.raises(ValueError, match="inner.*left"):
        broadcast_join(ds, small, left_on="k", right_on="k2", how="right")


def test_round_away_matches_duckdb_for_negative_half_ties():
    """The shared rounding contract (functions/rounding.py) is DuckDB
    ROUND: half away from zero BOTH signs. The old floor(x*s+0.5) form
    rounded a negative half-tie toward zero — lm_score is always
    negative, so the sign mattered."""
    import duckdb
    import numpy as np

    from nostr_data_pipeline_ray.functions.rounding import round6, round_away

    assert round_away(np.array([-0.0000005]), 6)[0] == -0.000001
    assert round_away(np.array([0.0000005]), 6)[0] == 0.000001
    # grid parity with DuckDB ROUND, negatives and ties included
    vals = [0.0, 1.2345675, -1.2345675, -0.0000005, 0.4999996, -0.4999996,
            -3.7, 2.5e-7, -2.5e-7, 123.456789123, -123.456789123]
    con = duckdb.connect()
    for v in vals:
        want = con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [v]).fetchone()[0]
        got = float(round6(np.array([v]))[0])
        assert got == pytest.approx(want, abs=0), (v, got, want)
    con.close()


def test_price_stats_empty_table_returns_null_row(tmp_path, ray_session):
    """An empty lineitem table must yield the SQL aggregate's shape (one
    row, n=0, NULL stats) — Dataset.aggregate returns None on 0 rows and
    the clamped quantile indexes went negative, so this used to crash."""
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.analytics import q_price_stats

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.schema([("l_extendedprice", pa.float64())]).empty_table(),
        sf / "lineitem.parquet",
    )
    out = q_price_stats(str(sf))
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["n"] == 0 and row["median"] is None and row["total"] is None


def test_precombine_key_codes_negative_turns_and_width_guard(ray_session):
    """(conv, turn) codes must be injective over the full int32 turn range
    (negative turns pack through a uint32 view), and a turn outside int32
    — corrupt input the changelog schema forbids — fails loudly instead
    of silently colliding keys and dropping a live row in precombine."""
    from nostr_data_pipeline_ray.stages.cdc_stages import precombine

    t = pa.table({
        "conv_id": pa.array(["a", "a", "a"]),
        "turn_idx": pa.array([-1, 0, 2147483647], pa.int32()),
        "lsn": pa.array([1, 2, 3], pa.int64()),
    })
    out = precombine(t)
    assert out.num_rows == 3  # three distinct keys: nothing combined away

    bad = pa.table({
        "conv_id": pa.array(["a", "a"]),
        "turn_idx": pa.array([0, 1 << 32], pa.int64()),
        "lsn": pa.array([1, 2], pa.int64()),
    })
    with pytest.raises(ValueError, match="outside int32"):
        precombine(bad)


def test_embedding_sample_empty_table_clear_error(tmp_path):
    from nostr_data_pipeline_ray.pipelines.dedup import _embedding_sample

    import pyarrow.parquet as pq

    p = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.schema([("vec_id", pa.int64()),
                   ("embedding", pa.list_(pa.float64()))]).empty_table(),
        p,
    )
    with pytest.raises(ValueError, match="empty embeddings table"):
        _embedding_sample(p, 100)


def test_manifest_cache_invalidates_on_commit(tmp_path, ray_session):
    """current_manifest is parse-cached per Lake instance (an apply epoch
    consults it half a dozen times under the writer lock); the cache keys
    on the pointer file's inode+mtime+size, so a commit — even by another
    process/instance — invalidates it."""
    spec = ChangelogSpec(n_events=2_000, n_convs=80, n_segments=2, seed=43)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)

    lake = Lake(lake_root)
    m1 = lake.current_manifest()
    assert lake.current_manifest() is m1  # cache hit: same parsed object

    import shutil

    seg0 = sorted(f for f in os.listdir(binlog) if f.endswith(".parquet"))[0]
    shutil.copy(os.path.join(binlog, seg0),
                os.path.join(binlog, "seg-99991.parquet"))
    apply_changelog(lake_root, binlog, CFG)  # a DIFFERENT Lake instance commits
    m2 = lake.current_manifest()
    assert m2 is not m1 and int(m2["epoch"]) == int(m1["epoch"]) + 1
