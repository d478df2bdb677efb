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


def test_jsonl_segments_interop(tmp_path):
    """A binlog mixing parquet and JSONL segments (the reference's JSON
    event stream spooled to disk) replays to the same final state as the
    all-parquet oracle; JSONL timestamps arrive as ISO strings and are
    conformed at read."""
    import json as _json
    import os
    import shutil

    from nostr_data_pipeline_ray.pipelines.cdc import final_table
    from nostr_data_pipeline_ray.synth import expected_final_state

    spec = ChangelogSpec(n_events=6_000, n_convs=200, n_segments=5, seed=29)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    segs = list_segments(binlog)

    mixed = tmp_path / "mixed"
    mixed.mkdir()
    for s in segs[:3]:
        shutil.copy(s, mixed / os.path.basename(s))
    for s in segs[3:]:  # tail segments delivered as JSONL
        t = pq.read_table(s)
        rows = t.to_pylist()
        name = os.path.basename(s).replace(".parquet", ".jsonl")
        with open(mixed / name, "w") as f:
            for r in rows:
                r["ts"] = r["ts"].isoformat()
                f.write(_json.dumps(r) + "\n")

    lake_root = str(tmp_path / "lake")
    out = apply_changelog(lake_root, str(mixed), EngineConfig(num_partitions=8))
    assert out["segments_applied"] == 5
    assert out["raw_events"] == sum(pq.read_metadata(s).num_rows for s in segs)

    got = final_table(lake_root)
    want = expected_final_state(binlog)  # oracle over the original parquet
    assert got.num_rows == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_prefetch_segment_meta_parallel_and_evicting(tmp_path):
    """prefetch_segment_meta parses uncached JSONL segments via Ray tasks
    and evicts cache entries for rotated/absent paths (bounded follow-mode
    cache)."""
    import json as _json

    from nostr_data_pipeline_ray.pipelines.cdc import (
        _JSONL_META,
        _segment_rows,
        _segment_schema,
        prefetch_segment_meta,
    )

    paths = []
    for i in range(3):
        p = str(tmp_path / f"seg-{i}.jsonl")
        with open(p, "w") as f:
            f.write(_json.dumps({"conv_id": f"c{i}", "turn_idx": 0, "lsn": i}) + "\n")
            f.write(
                _json.dumps(
                    {"conv_id": f"c{i}", "turn_idx": 1, "lsn": i, "extra": "x"}
                )
                + "\n"
            )
        paths.append(p)

    _JSONL_META.clear()
    prefetch_segment_meta(paths)
    assert set(_JSONL_META) == set(paths)
    # cache hit: no re-parse needed, values correct (key union incl. mid-file)
    assert _segment_rows(paths[0]) == 2
    assert "extra" in _segment_schema(paths[1]).names
    # rotation: a shrunk listing evicts the dropped path
    prefetch_segment_meta(paths[1:])
    assert paths[0] not in _JSONL_META and paths[1] in _JSONL_META
