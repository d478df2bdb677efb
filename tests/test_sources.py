"""Binlog source: predicate pushdown, segment pruning, empty inputs."""

import pyarrow.parquet as pq

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import apply_changelog, list_segments
from nostr_data_pipeline_ray.sources.binlog import (
    ChangeFilter,
    prune_segments,
    read_changelog,
)
from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog


def test_segment_pruning_skips_whole_files(tmp_path):
    binlog = generate_changelog(
        str(tmp_path / "s"), ChangelogSpec(n_events=4_000, n_convs=100, n_segments=8, seed=2)
    )
    segs = list_segments(binlog)
    assert len(segs) == 8
    # an LSN window inside the 3rd segment prunes everything else
    md = pq.read_table(segs[2], columns=["lsn"])["lsn"]
    lo, hi = md[10].as_py(), md[-10].as_py()
    kept = prune_segments(binlog, ChangeFilter(min_lsn=lo, max_lsn=hi))
    assert kept == [segs[2]]
    # open-ended windows prune one side only
    assert prune_segments(binlog, ChangeFilter(min_lsn=lo)) == segs[2:]
    assert prune_segments(binlog, ChangeFilter(max_lsn=hi)) == segs[:3]
    # no window → nothing pruned
    assert prune_segments(binlog, ChangeFilter(roles=("user",))) == segs


def test_filtered_read_matches_predicates(tmp_path):
    binlog = generate_changelog(
        str(tmp_path / "s"), ChangelogSpec(n_events=4_000, n_convs=100, n_segments=4, seed=2)
    )
    flt = ChangeFilter(roles=("user",), ops=("insert",), min_lsn=500, max_lsn=3000, limit=50)
    out = read_changelog(binlog, flt).to_pandas()
    assert len(out) == 50  # streaming limit
    assert set(out["role"]) == {"user"}
    assert set(out["op"]) == {"insert"}
    assert out["lsn"].between(500, 3000).all()


def test_fully_pruned_window_yields_empty_dataset(tmp_path):
    binlog = generate_changelog(
        str(tmp_path / "s"), ChangelogSpec(n_events=1_000, n_convs=50, n_segments=2, seed=2)
    )
    out = read_changelog(binlog, ChangeFilter(min_lsn=10**12))
    assert out.count() == 0
    assert "conv_id" in out.schema().names  # typed empty, not schemaless


def test_apply_empty_binlog_dir(tmp_path):
    empty = tmp_path / "emptylog"
    empty.mkdir()
    out = apply_changelog(str(tmp_path / "lake"), str(empty), EngineConfig())
    assert out["segments_applied"] == 0
    assert out["raw_events"] == 0
