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
