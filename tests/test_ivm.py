"""Incremental materialized-view maintenance (pipelines/ivm.py): the
maintained per-conversation aggregate must be indistinguishable from a full
recompute over the lake, while refreshes touch only partitions whose parts
changed since the view's epoch."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import apply_changelog, final_table
from nostr_data_pipeline_ray.pipelines.ivm import (
    read_turn_counts,
    refresh_turn_counts,
)
from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog

CFG = EngineConfig(num_partitions=8, turn_bucket=16, epoch_segments=2)


@pytest.fixture(scope="module")
def binlog(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_ivm")
    spec = ChangelogSpec(n_events=8_000, n_convs=250, n_segments=6, seed=29)
    return generate_changelog(str(out), spec)


def _recompute(lake_root: str):
    """Full-recompute oracle: per-conv live turns + max lsn from the lake."""
    t = final_table(lake_root)
    g = (
        pa.table({"conv_id": t["conv_id"], "lsn": t["lsn"]})
        .group_by("conv_id")
        .aggregate([("conv_id", "count"), ("lsn", "max")])
    )
    out = pa.table(
        {
            "conv_id": g["conv_id"],
            "n_turns": g["conv_id_count"].cast(pa.int64()),
            "max_lsn": g["lsn_max"].cast(pa.int64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("conv_id", "ascending")]))


def _view_table(view_root: str):
    t = read_turn_counts(view_root).to_arrow_refs()
    import ray

    t = pa.concat_tables([ray.get(r) for r in t]).combine_chunks()
    t = t.select(["conv_id", "n_turns", "max_lsn"]).cast(
        pa.schema(
            [
                pa.field("conv_id", pa.string()),
                pa.field("n_turns", pa.int64()),
                pa.field("max_lsn", pa.int64()),
            ]
        )
    )
    return t.take(pc.sort_indices(t, sort_keys=[("conv_id", "ascending")]))


def test_ivm_matches_recompute_and_refreshes_incrementally(binlog, tmp_path):
    lake_root = str(tmp_path / "lake")
    view_root = str(tmp_path / "view")
    apply_changelog(lake_root, binlog, CFG)

    out1 = refresh_turn_counts(view_root, lake_root)
    assert out1["refreshed"] == CFG.num_partitions  # first refresh: everything
    assert _view_table(view_root).equals(_recompute(lake_root))

    # a second refresh with no new epochs is a metadata no-op
    out2 = refresh_turn_counts(view_root, lake_root)
    assert out2["refreshed"] == 0 and out2["carried"] == CFG.num_partitions

    # append a tiny segment touching ONE conversation → only the partitions
    # holding that conversation's turn buckets are stale
    seg = pq.read_table(os.path.join(binlog, "seg-00000.parquet"))
    max_lsn = 1_000_000
    extra = pa.table(
        {
            "conv_id": pa.array(["conv-ivm-extra"] * 3),
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "role": pa.array(["user", "assistant", "user"]),
            "text": pa.array(["a", "b", "c"]),
            "tool": pa.array([None] * 3, pa.string()),
            "ts": pa.array([0, 1, 2], pa.timestamp("us")),
            "op": pa.array(["insert"] * 3),
            "lsn": pa.array([max_lsn, max_lsn + 1, max_lsn + 2], pa.int64()),
        }
    ).select(seg.column_names).cast(seg.schema)
    pq.write_table(extra, os.path.join(binlog, "seg-99999.parquet"))
    try:
        apply_changelog(lake_root, binlog, CFG)
        out3 = refresh_turn_counts(view_root, lake_root)
        # one conv over 3 turns within one turn_bucket → at most 2 partitions
        assert 1 <= out3["refreshed"] <= 2
        assert out3["carried"] == CFG.num_partitions - out3["refreshed"]
        got = _view_table(view_root)
        assert got.equals(_recompute(lake_root))
        n = got.filter(pc.equal(got["conv_id"], "conv-ivm-extra"))
        assert n["n_turns"][0].as_py() == 3
    finally:
        os.unlink(os.path.join(binlog, "seg-99999.parquet"))


def test_ivm_delta_policy_and_deletes(binlog, tmp_path):
    """The view reads through materialize_partition, so merge-on-read lakes
    and tombstones are handled by construction."""
    import dataclasses

    lake_root = str(tmp_path / "lake_delta")
    view_root = str(tmp_path / "view_delta")
    cfg = dataclasses.replace(CFG, merge_policy="delta")
    apply_changelog(lake_root, binlog, cfg)
    refresh_turn_counts(view_root, lake_root)
    assert _view_table(view_root).equals(_recompute(lake_root))
