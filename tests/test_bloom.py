"""Per-part bloom sidecars: point reads skip chain files that provably
don't hold the conversation (including its tombstones). The reference's
analog is the PK index probe (`event_loader.py:35-38`); here the filter is
a deterministic sidecar written next to every part file."""

import glob
import os

import pyarrow as pa
import pytest

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    final_table,
    read_conversation,
)
from nostr_data_pipeline_ray.state import bloom
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
def lake_and_binlog(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_bloom")
    binlog = generate_changelog(
        str(out), ChangelogSpec(n_events=8_000, n_convs=250, n_segments=6, seed=23)
    )
    lake_root = str(tmp_path_factory.mktemp("lake_bloom") / "lake")
    apply_changelog(lake_root, binlog, CFG)
    return lake_root, binlog


def test_build_contains_no_false_negatives():
    vals = [f"conv-{i:04d}" for i in range(500)]
    blob = bloom.build(pa.array(vals))
    assert all(bloom.contains(blob, v) for v in vals)  # zero false negatives


def test_false_positive_rate_is_small():
    blob = bloom.build(pa.array([f"conv-{i:04d}" for i in range(500)]))
    fp = sum(bloom.contains(blob, f"absent-{i}") for i in range(2000))
    assert fp < 2000 * 0.05  # sized for ~1%, allow 5×

def test_malformed_sidecar_never_skips():
    assert bloom.contains(b"", "x")
    assert bloom.contains(b"garbage-bytes-here", "x")
    assert bloom.contains(bloom._MAGIC + b"\x00" * 4, "x")


def test_bulk_probe_matches_scalar_probe():
    """contains_all must agree with per-value contains — including unicode
    keys and values absent from the filter (fail-open on garbage blobs is
    covered by test_malformed_sidecar_never_skips)."""
    import numpy as np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        members=st.lists(st.text(min_size=1, max_size=40), min_size=1,
                         max_size=50, unique=True),
        probes=st.lists(st.text(min_size=1, max_size=40), max_size=20),
    )
    def check(members, probes):
        blob = bloom.build(pa.array(members))
        vals = members + probes
        scalar = all(bloom.contains(blob, v) for v in vals)
        assert bloom.contains_all(blob, np.asarray(vals, dtype=object)) == scalar
        # members alone can never produce a false negative
        assert bloom.contains_all(blob, np.asarray(members, dtype=object))

    check()


def test_every_part_has_a_sidecar(lake_and_binlog):
    lake_root, _ = lake_and_binlog
    parts = glob.glob(os.path.join(lake_root, "parts", "**", "*.parquet"),
                      recursive=True)
    assert parts
    for p in parts:
        assert os.path.exists(bloom.sidecar_path(p)), p


def test_point_read_skips_files_and_stays_exact(lake_and_binlog):
    lake_root, binlog = lake_and_binlog
    want = expected_final_state(binlog)
    convs = pa.compute.unique(want["conv_id"]).to_pylist()[:20]
    bloom.stats.update(files_skipped=0, files_read=0)
    for cid in convs:
        got = read_conversation(lake_root, cid)
        exp = want.filter(pa.compute.equal(want["conv_id"], cid))
        exp = exp.take(pa.compute.sort_indices(
            exp, sort_keys=[("turn_idx", "ascending")]))
        assert got.select(exp.column_names).cast(exp.schema).equals(exp)
    # the whole point: a delta-chain lake point read skips chain files
    assert bloom.stats["files_skipped"] > 0


def test_missing_sidecars_fall_back_to_full_read(lake_and_binlog):
    lake_root, binlog = lake_and_binlog
    for sp in glob.glob(os.path.join(lake_root, "parts", "**", "*.bloom"),
                        recursive=True):
        os.unlink(sp)
    want = expected_final_state(binlog)
    cid = want["conv_id"][0].as_py()
    got = read_conversation(lake_root, cid)
    exp = want.filter(pa.compute.equal(want["conv_id"], cid))
    assert got.num_rows == exp.num_rows
    # rebuild the sidecars so the shared module fixture is order-robust
    import pyarrow.parquet as pq

    for f in glob.glob(os.path.join(lake_root, "parts", "**", "*.parquet"),
                       recursive=True):
        bloom.write_sidecar(f, pq.read_table(f, columns=["conv_id"])["conv_id"])


def test_vacuum_keeps_live_sidecars_drops_dead_ones(tmp_path):
    binlog = generate_changelog(
        str(tmp_path / "b"),
        ChangelogSpec(n_events=3_000, n_convs=80, n_segments=4, seed=5),
    )
    lake_root = str(tmp_path / "lake")
    cfg = EngineConfig(num_partitions=4, turn_bucket=16, epoch_segments=1,
                       merge_policy="rewrite")
    apply_changelog(lake_root, binlog, cfg)
    lake = Lake(lake_root)
    lake.vacuum(keep_manifests=1)
    live = set(lake.snapshot_files())
    blooms = glob.glob(os.path.join(lake_root, "parts", "**", "*.bloom"),
                       recursive=True)
    assert blooms, "live sidecars must survive vacuum"
    for bp in blooms:
        assert bp.removesuffix(".bloom") in live, f"orphan sidecar {bp}"
    assert final_table(lake_root).num_rows == \
        expected_final_state(binlog).num_rows
