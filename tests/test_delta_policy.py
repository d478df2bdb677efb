"""Merge-on-read (LSM delta) policy: per-epoch delta parts instead of
base rewrites, LWW merge at read, compaction folding back to bases. The
final state must be indistinguishable from the rewrite policy under every
consumer (read_final, point lookup, delete, export, compact)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    compact,
    delete_where,
    export_snapshot,
    final_table,
    read_conversation,
    read_final,
)
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)

CFG = EngineConfig(
    num_partitions=8, turn_bucket=16, epoch_segments=2, merge_policy="delta"
)


@pytest.fixture(scope="module")
def binlog(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_delta")
    spec = ChangelogSpec(n_events=10_000, n_convs=300, n_segments=6, seed=17)
    return generate_changelog(str(out), spec)


def _assert_oracle(lake_root, binlog_dir):
    got = final_table(lake_root)
    want = expected_final_state(binlog_dir)
    assert got.num_rows == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_delta_epochs_accumulate_and_read_merges(binlog, tmp_path):
    lake_root = str(tmp_path / "lake")
    out = apply_changelog(lake_root, binlog, CFG)
    assert len(out["epochs"]) == 3  # 6 segments / 2 per epoch
    m = Lake(lake_root).current_manifest()
    assert m["deltas"] and not m["files"]  # pure-delta lake: no base parts
    assert any(len(v) > 1 for v in m["deltas"].values())  # deltas stack up
    _assert_oracle(lake_root, binlog)  # merge-on-read equals the LWW oracle


def test_delta_tombstone_masks_base_row(binlog, tmp_path):
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    compact(lake_root)  # establish bases
    assert not Lake(lake_root).has_deltas()

    want = expected_final_state(binlog)
    conv = want["conv_id"][0].as_py()
    turn = int(want["turn_idx"][0].as_py())
    n_before = want.num_rows

    seg = pa.table(
        {
            "conv_id": pa.array([conv]),
            "turn_idx": pa.array([turn], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array([""]),
            "tool": pa.array([""]),
            "ts": pa.array([10**15], pa.timestamp("us")),
            "op": pa.array(["delete"]),
            "lsn": pa.array([10**9], pa.int64()),
        }
    )
    tail = tmp_path / "tail"
    tail.mkdir()
    pq.write_table(seg, tail / "zz-del.parquet")
    apply_changelog(lake_root, str(tail), CFG)
    assert Lake(lake_root).has_deltas()  # the delete landed as a delta part

    got = final_table(lake_root)
    assert got.num_rows == n_before - 1  # tombstone masks the base row
    conv_rows = read_conversation(lake_root, conv)
    assert turn not in conv_rows["turn_idx"].to_pylist()

    # compaction folds the tombstone away permanently
    compact(lake_root)
    assert not Lake(lake_root).has_deltas()
    assert final_table(lake_root).num_rows == n_before - 1


def test_delta_schema_evolution(binlog, tmp_path):
    """An EVOLVED delta part (tool_meta column) over a pre-evolution base:
    merge-on-read must surface the column null-filled everywhere, and
    compaction must persist it into the new bases."""
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    compact(lake_root)  # pre-evolution bases

    seg = pa.table(
        {
            "conv_id": pa.array(["conv-2"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["assistant"]),
            "text": pa.array(["evolved text"]),
            "tool": pa.array(["python"]),
            "ts": pa.array([10**15], pa.timestamp("us")),
            "op": pa.array(["update"]),
            "lsn": pa.array([10**9], pa.int64()),
            "tool_meta": pa.array(['{"calls":7}']),
        }
    )
    tail = tmp_path / "tail"
    tail.mkdir()
    pq.write_table(seg, tail / "zz-evolved.parquet")
    apply_changelog(lake_root, str(tail), CFG)  # lands as an evolved delta

    df = read_final(lake_root).to_pandas()
    assert "tool_meta" in df.columns
    hit = df[(df["conv_id"] == "conv-2") & (df["turn_idx"] == 0)]
    assert hit["tool_meta"].iloc[0] == '{"calls":7}'
    assert hit["text"].iloc[0] == "evolved text"
    assert df["tool_meta"].notna().sum() == 1  # everyone else null-filled

    compact(lake_root)
    df2 = read_final(lake_root).to_pandas()  # plain-scan path, post-fold
    assert df2["tool_meta"].notna().sum() == 1
    assert len(df2) == len(df)


def test_delta_point_lookup_and_export(binlog, tmp_path):
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    want = expected_final_state(binlog)
    conv = want["conv_id"][0].as_py()

    got = read_conversation(lake_root, conv)  # merges deltas per partition
    w = want.filter(pc.equal(want["conv_id"], conv))
    assert got.select(w.column_names).cast(w.schema).equals(w)

    out_dir = str(tmp_path / "export")
    res = export_snapshot(lake_root, out_dir)
    assert res["written"] == res["partitions"] > 0
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"select count(*) from read_parquet('{out_dir}/part-*.parquet')"
    ).fetchone()[0]
    con.close()
    assert n == want.num_rows


def test_delta_delete_where_clears_deltas(binlog, tmp_path):
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    want = expected_final_state(binlog)
    cutoff = want["ts"][want.num_rows // 2].as_py()

    out = delete_where(
        lake_root,
        lambda t: pc.less(t["ts"], pa.scalar(cutoff, pa.timestamp("us"))),
        CFG,
    )
    assert out["rows_deleted"] > 0
    # a predicate delete on a merge-on-read partition lands as a fresh base
    assert not Lake(lake_root).has_deltas()
    got = final_table(lake_root)
    kept = want.filter(
        pc.greater_equal(want["ts"], pa.scalar(cutoff, pa.timestamp("us")))
    )
    assert got.num_rows == kept.num_rows
    assert got.select(kept.column_names).cast(kept.schema).equals(kept)


def test_delta_crash_before_commit_recovers(binlog, tmp_path, monkeypatch):
    """Exactly-once holds under the delta policy too: a crash between delta
    part writes and the manifest commit leaves invisible orphans; re-running
    the epoch overwrites the same deterministic paths and commits once."""
    from nostr_data_pipeline_ray.pipelines.cdc import apply_epoch, list_segments

    lake_root = str(tmp_path / "lake")
    segs = list_segments(binlog)
    lake = Lake(lake_root)
    apply_epoch(lake, segs[:3], CFG)

    import nostr_data_pipeline_ray.state.lake as lake_mod

    real_commit = lake_mod.Lake.commit_epoch

    def boom(self, *a, **k):
        raise RuntimeError("crash before manifest commit")

    monkeypatch.setattr(lake_mod.Lake, "commit_epoch", boom)
    with pytest.raises(RuntimeError):
        apply_epoch(Lake(lake_root), segs[3:5], CFG)
    monkeypatch.setattr(lake_mod.Lake, "commit_epoch", real_commit)

    # orphan delta parts on disk, invisible through the manifest
    assert Lake(lake_root).applied_segments() == {
        os.path.basename(s) for s in segs[:3]
    }
    apply_changelog(lake_root, binlog, CFG)  # recovery = run the tail again
    _assert_oracle(lake_root, binlog)


def test_follow_delta_with_auto_compaction(binlog, tmp_path):
    """The LSM maintenance loop: delta-policy follow compacts whenever a
    partition's pending-delta depth reaches the threshold, keeping
    merge-on-read amplification bounded while the tail keeps applying."""
    import shutil

    from nostr_data_pipeline_ray.pipelines.cdc import follow_changelog, list_segments

    lake_root = str(tmp_path / "lake")
    segs = list_segments(binlog)
    watch = tmp_path / "watch"
    watch.mkdir()
    for s in segs[:2]:
        shutil.copy(s, watch / os.path.basename(s))

    one_per_epoch = EngineConfig(
        num_partitions=8, turn_bucket=16, epoch_segments=1, merge_policy="delta"
    )
    state = {"fed": False}

    def stop():
        if not state["fed"]:
            for s in segs[2:]:
                shutil.copy(s, watch / os.path.basename(s))
            state["fed"] = True
            return False
        return len(Lake(lake_root).applied_segments()) == len(segs)

    out = follow_changelog(
        lake_root, str(watch), one_per_epoch,
        poll_interval=0.05, idle_timeout=60.0, stop=stop, compact_after=2,
    )
    assert out["segments_applied"] == len(segs)
    assert out["compactions"] >= 1  # the threshold fired at least once
    m = Lake(lake_root).current_manifest()
    depth = max((len(v) for v in m.get("deltas", {}).values()), default=0)
    assert depth < 2  # read amplification stayed bounded
    _assert_oracle(lake_root, str(watch))


def test_delta_then_rewrite_policy_interop(binlog, tmp_path):
    """A rewrite-policy epoch applied on top of pending deltas folds them in
    (policy is per-run, the lake carries the truth)."""
    lake_root = str(tmp_path / "lake")
    segs_cfg = EngineConfig(
        num_partitions=8, turn_bucket=16, epoch_segments=4, merge_policy="delta"
    )
    from nostr_data_pipeline_ray.pipelines.cdc import list_segments

    segs = list_segments(binlog)
    import shutil

    head = tmp_path / "head"
    head.mkdir()
    for s in segs[:4]:
        shutil.copy(s, head / os.path.basename(s))
    apply_changelog(lake_root, str(head), segs_cfg)
    assert Lake(lake_root).has_deltas()

    rewrite_cfg = EngineConfig(
        num_partitions=8, turn_bucket=16, epoch_segments=4, merge_policy="rewrite"
    )
    apply_changelog(lake_root, binlog, rewrite_cfg)  # remaining segments
    # every touched partition folded its pending deltas into the new base
    m = Lake(lake_root).current_manifest()
    assert not m.get("deltas")
    _assert_oracle(lake_root, binlog)
    # plain-scan fast path (no deltas) also equals the oracle
    assert read_final(lake_root).count() == expected_final_state(binlog).num_rows


def test_minor_compaction_folds_only_picked_partitions(binlog, tmp_path):
    from nostr_data_pipeline_ray.pipelines.cdc import select_compaction

    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    m = Lake(lake_root).current_manifest()
    deep = sorted(int(k) for k, v in m["deltas"].items() if len(v) >= 2)
    assert len(deep) >= 2
    picked, skipped = deep[0], deep[1]
    out = compact(lake_root, partitions=[picked])
    assert out["partitions"] == 1
    m2 = Lake(lake_root).current_manifest()
    assert str(picked) not in m2["deltas"]  # chain folded into a base
    assert str(picked) in m2["files"]
    assert m2["deltas"][str(skipped)] == m["deltas"][str(skipped)]  # untouched
    assert m2["stats"]["compaction"] == "minor"
    _assert_oracle(lake_root, binlog)  # state unchanged under every reader

    # size-tiered picker: tiny chains are due eagerly, and the depth cap
    # still catches everything ≥ max_depth
    picks = select_compaction(lake_root, max_depth=2)
    assert skipped in picks and picked not in picks
    # with a zero eager budget only the depth rule fires
    lean = select_compaction(lake_root, max_depth=99, eager_bytes=0)
    assert lean == []


def test_follow_minor_compaction_keeps_oracle(binlog, tmp_path):
    """follow-mode auto-compaction now runs the size-tiered minor path —
    end state still matches the oracle and read amp is bounded."""
    from nostr_data_pipeline_ray.pipelines.cdc import follow_changelog

    lake_root = str(tmp_path / "lake")
    out = follow_changelog(
        lake_root, binlog, CFG, poll_interval=0.05, idle_timeout=0.5,
        compact_after=2,
    )
    assert out["compactions"] >= 1
    m = Lake(lake_root).current_manifest()
    assert all(len(v) < 2 for v in m.get("deltas", {}).values())
    _assert_oracle(lake_root, binlog)
