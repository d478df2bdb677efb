"""Time travel (as-of reads through retained epoch manifests): each past
epoch's snapshot is byte-exactly what a prefix replay produces, on both
merge policies; the retention boundary (vacuum) and the uncommitted
boundary (as_of > pointer) fail loudly."""

import shutil

import pyarrow as pa
import pytest

from nostr_data_pipeline_ray import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    final_table,
    list_segments,
)
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog

SPEC = ChangelogSpec(n_events=6_000, n_convs=200, n_segments=6, seed=11)
EPOCH_SEGMENTS = 2  # -> 3 committed epochs


def _binlog(tmp_path):
    return generate_changelog(str(tmp_path / "binlog"), SPEC)


def _cfg(policy="rewrite"):
    return EngineConfig(
        num_partitions=8, epoch_segments=EPOCH_SEGMENTS, merge_policy=policy
    )


@pytest.mark.parametrize("policy", ["rewrite", "delta"])
def test_as_of_equals_prefix_replay(ray_session, tmp_path, policy):
    binlog = _binlog(tmp_path)
    lake = str(tmp_path / f"lake_{policy}")
    apply_changelog(lake, binlog, _cfg(policy))
    assert Lake(lake).current_epoch() == 2

    segs = list_segments(binlog)
    for epoch in range(3):
        got = final_table(lake, as_of=epoch)
        # reference: a fresh lake fed only the segments epochs 0..epoch saw
        ref_binlog = str(tmp_path / f"prefix_{policy}_{epoch}")
        shutil.os.makedirs(ref_binlog)
        for s in segs[: (epoch + 1) * EPOCH_SEGMENTS]:
            shutil.copy(s, ref_binlog)
        ref_lake = str(tmp_path / f"ref_{policy}_{epoch}")
        apply_changelog(ref_lake, ref_binlog, _cfg(policy))
        want = final_table(ref_lake)
        assert got.cast(want.schema).equals(want), (policy, epoch)
    # as_of=current == the plain read
    assert final_table(lake, as_of=2).equals(final_table(lake))


def test_as_of_bounds_and_vacuum_window(ray_session, tmp_path):
    binlog = _binlog(tmp_path)
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, _cfg())

    with pytest.raises(ValueError, match="not committed"):
        final_table(lake, as_of=3)
    with pytest.raises(ValueError, match="not committed"):
        final_table(lake, as_of=-1)

    # keep the last two manifests: epoch 0 leaves the window, 1 and 2 stay
    before = final_table(lake, as_of=1)
    Lake(lake).vacuum(keep_manifests=2)
    after = final_table(lake, as_of=1)
    assert after.equals(before)  # retained manifests stay fully readable
    with pytest.raises(ValueError, match="vacuum"):
        final_table(lake, as_of=0)


def test_as_of_empty_lake_raises(ray_session, tmp_path):
    lake = str(tmp_path / "empty")
    Lake(lake)  # creates the directory skeleton, no committed epoch
    with pytest.raises(ValueError, match="no committed epoch"):
        final_table(lake, as_of=0)


# ---------------------------------------------------------------------------
# change data feed (lake_changes)
# ---------------------------------------------------------------------------

from nostr_data_pipeline_ray.model import CHANGELOG_SCHEMA  # noqa: E402
from nostr_data_pipeline_ray.pipelines.cdc import lake_changes  # noqa: E402


def _write_segment(path, rows):
    """rows: (conv_id, turn_idx, text, op, lsn)"""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
            "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
            "op": pa.array([r[3] for r in rows], pa.string()),
            "lsn": pa.array([r[4] for r in rows], pa.int64()),
        },
        schema=CHANGELOG_SCHEMA,
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, path)


@pytest.mark.parametrize("policy", ["rewrite", "delta"])
def test_changes_exact_and_pruned(ray_session, tmp_path, policy):
    """Planted two-epoch feed: epoch 1 touches three conversations out of
    64 — the CDF must emit exactly the update, the insert and the delete,
    and the manifest diff must leave untouched partitions to skip."""
    binlog = tmp_path / "binlog"
    binlog.mkdir()
    seg0 = [(f"c-{i}", 0, f"orig-{i}", "insert", i + 1) for i in range(64)]
    _write_segment(str(binlog / "seg-00000.parquet"), seg0)
    seg1 = [
        ("c-0", 0, "rewritten", "update", 100),
        ("c-new", 0, "fresh", "insert", 101),
        ("c-1", 0, "", "delete", 102),
    ]
    _write_segment(str(binlog / "seg-00001.parquet"), seg1)
    lake = str(tmp_path / "lake")
    apply_changelog(
        lake,
        str(binlog),
        EngineConfig(num_partitions=8, epoch_segments=1, merge_policy=policy),
    )
    l = Lake(lake)
    assert l.current_epoch() == 1

    got = (
        lake_changes(lake, from_epoch=0)
        .to_pandas()
        .sort_values(["change_type", "conv_id"])
        .reset_index(drop=True)
    )
    assert got["change_type"].tolist() == ["delete", "upsert", "upsert"]
    assert got["conv_id"].tolist() == ["c-1", "c-0", "c-new"]
    up = got[got["change_type"] == "upsert"].set_index("conv_id")
    assert up.loc["c-0", "text"] == "rewritten" and up.loc["c-0", "lsn"] == 100
    assert up.loc["c-new", "text"] == "fresh"
    dl = got[got["change_type"] == "delete"].iloc[0]
    assert dl["text"] == "orig-1" and dl["lsn"] == 2  # the OLD state

    # the pruning premise: most partitions are untouched by epoch 1
    old_p, new_p = l.partition_files(as_of=0), l.partition_files(as_of=1)
    unchanged = [pk for pk in old_p if old_p[pk] == new_p.get(pk)]
    assert unchanged, "epoch 1 must leave identical partitions to skip"

    # no-op window: changes between an epoch and itself is empty, with a
    # stable schema
    none = lake_changes(lake, from_epoch=1, to_epoch=1)
    assert none.count() == 0
    assert none.schema().names[0] == "change_type"

    with pytest.raises(ValueError, match="after"):
        lake_changes(lake, from_epoch=1, to_epoch=0)


def test_changes_equals_bruteforce_diff(ray_session, tmp_path):
    """Random replay: the CDF equals the pandas diff of the two as-of
    snapshots (upserts = key-lsn pairs only in the new state, deletes =
    keys only in the old)."""
    import pandas as pd

    binlog = _binlog(tmp_path)
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, _cfg())
    old = final_table(lake, as_of=0).to_pandas()
    new = final_table(lake).to_pandas()
    got = lake_changes(lake, from_epoch=0).to_pandas()

    key = ["conv_id", "turn_idx"]
    m = new.merge(old[key + ["lsn"]], on=key, how="left", suffixes=("", "_old"))
    want_up = m[m["lsn_old"].isna() | (m["lsn_old"] != m["lsn"])][new.columns]
    want_del = old.merge(new[key], on=key, how="left", indicator=True)
    want_del = want_del[want_del["_merge"] == "left_only"][old.columns]

    norm = lambda d: d.sort_values(key).reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(
        norm(got[got["change_type"] == "upsert"][new.columns]), norm(want_up)
    )
    pd.testing.assert_frame_equal(
        norm(got[got["change_type"] == "delete"][old.columns]), norm(want_del)
    )


def test_read_conversation_as_of(ray_session, tmp_path):
    """Point-lookup time travel: the conversation as it stood after an
    earlier epoch — the epoch-0 read must not see epoch 1's rewrite."""
    from nostr_data_pipeline_ray.pipelines.cdc import read_conversation

    binlog = tmp_path / "binlog"
    binlog.mkdir()
    _write_segment(
        str(binlog / "seg-00000.parquet"),
        [("c-7", 0, "before", "insert", 1), ("c-8", 0, "other", "insert", 2)],
    )
    _write_segment(
        str(binlog / "seg-00001.parquet"),
        [("c-7", 0, "after", "update", 3), ("c-7", 1, "tail", "insert", 4)],
    )
    lake = str(tmp_path / "lake")
    apply_changelog(
        lake, str(binlog), EngineConfig(num_partitions=4, epoch_segments=1)
    )
    old = read_conversation(lake, "c-7", as_of=0)
    new = read_conversation(lake, "c-7")
    assert old.num_rows == 1 and old["text"][0].as_py() == "before"
    assert new.num_rows == 2 and new["text"][0].as_py() == "after"
