"""Malformed-line policy for JSONL segments: fail loudly by default,
divert to the dead-letter sink under EngineConfig(on_malformed="quarantine")
— valid rows still apply, bad lines land in <lake>/_quarantine/ with
provenance, retries overwrite idempotently."""

import json as _json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    final_table,
    list_segments,
    read_quarantine,
)
from nostr_data_pipeline_ray.synth import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)

_BAD_LINES = [
    '{"conv_id": "c1", "turn_idx": 3, "lsn":',   # truncated mid-object
    "not json at all",                            # garbage
    '{"conv_id": "c2" "turn_idx": 4}',            # missing comma
]


def _mixed_binlog(tmp_path, *, inject_bad: bool):
    """Parquet head + JSONL tail binlog; optionally inject garbage lines
    into the LAST JSONL segment (additive — every real event stays valid,
    so the all-parquet oracle still describes the expected final state)."""
    spec = ChangelogSpec(n_events=4_000, n_convs=120, n_segments=4, seed=31)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    segs = list_segments(binlog)

    mixed = tmp_path / "mixed"
    mixed.mkdir()
    for s in segs[:2]:
        shutil.copy(s, mixed / os.path.basename(s))
    for i, s in enumerate(segs[2:]):
        rows = pq.read_table(s).to_pylist()
        name = os.path.basename(s).replace(".parquet", ".jsonl")
        with open(mixed / name, "w") as f:
            for j, r in enumerate(rows):
                r["ts"] = r["ts"].isoformat()
                f.write(_json.dumps(r) + "\n")
                if inject_bad and i == 1 and j < len(_BAD_LINES):
                    f.write(_BAD_LINES[j] + "\n")
    dirty_name = os.path.basename(segs[3]).replace(".parquet", ".jsonl")
    return binlog, str(mixed), segs, dirty_name


def test_malformed_line_fails_loudly_by_default(tmp_path):
    _, mixed, _, dirty_name = _mixed_binlog(tmp_path, inject_bad=True)
    with pytest.raises(ValueError, match=dirty_name):
        apply_changelog(str(tmp_path / "lake"), mixed, EngineConfig(num_partitions=8))
    # the error names the policy escape hatch
    with pytest.raises(ValueError, match="quarantine"):
        apply_changelog(str(tmp_path / "lake2"), mixed, EngineConfig(num_partitions=8))


def test_quarantine_mode_applies_valid_and_diverts_bad(tmp_path):
    binlog, mixed, segs, dirty_name = _mixed_binlog(tmp_path, inject_bad=True)
    lake_root = str(tmp_path / "lake")
    cfg = EngineConfig(num_partitions=8, on_malformed="quarantine")
    out = apply_changelog(lake_root, mixed, cfg)

    # all real events applied; bad lines not counted as events
    assert out["segments_applied"] == 4
    assert out["raw_events"] == sum(pq.read_metadata(s).num_rows for s in segs)
    assert sum(e.get("rows_quarantined", 0) for e in out["epochs"]) == len(_BAD_LINES)

    got = final_table(lake_root)
    want = expected_final_state(binlog)
    assert got.num_rows == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)

    q = read_quarantine(lake_root)
    assert q.num_rows == len(_BAD_LINES)
    assert set(q["segment"].to_pylist()) == {dirty_name}
    assert sorted(q["raw"].to_pylist()) == sorted(_BAD_LINES)
    assert all(e for e in q["error"].to_pylist())
    assert all(n >= 1 for n in q["line_no"].to_pylist())
    # one dead-letter parquet per dirty segment, keyed by segment name
    assert os.path.exists(
        os.path.join(lake_root, "_quarantine", f"{dirty_name}.parquet")
    )

    # replay on the committed lake is a no-op and never duplicates
    # quarantine rows (the per-segment file is overwrite-idempotent)
    out2 = apply_changelog(lake_root, mixed, cfg)
    assert out2["rows_applied"] == 0
    assert read_quarantine(lake_root).num_rows == len(_BAD_LINES)
    got2 = final_table(lake_root)
    assert got2.num_rows == want.num_rows


def test_clean_feed_never_creates_quarantine_dir(tmp_path):
    binlog, mixed, _, _ = _mixed_binlog(tmp_path, inject_bad=False)
    lake_root = str(tmp_path / "lake")
    apply_changelog(
        lake_root, mixed, EngineConfig(num_partitions=8, on_malformed="quarantine")
    )
    assert not os.path.isdir(os.path.join(lake_root, "_quarantine"))
    assert read_quarantine(lake_root).num_rows == 0
    got = final_table(lake_root)
    want = expected_final_state(binlog)
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_all_bad_segment_still_applies_the_rest(tmp_path):
    """A segment that is 100% garbage contributes zero rows (its valid
    table has no columns — conform must synthesize the full schema) while
    the other segments apply normally."""
    spec = ChangelogSpec(n_events=2_000, n_convs=60, n_segments=2, seed=33)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    segs = list_segments(binlog)
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    shutil.copy(segs[0], mixed / os.path.basename(segs[0]))
    rows = pq.read_table(segs[1]).to_pylist()
    name = os.path.basename(segs[1]).replace(".parquet", ".jsonl")
    with open(mixed / name, "w") as f:
        for _ in rows:
            f.write("garbage line\n")

    lake_root = str(tmp_path / "lake")
    out = apply_changelog(
        lake_root, str(mixed), EngineConfig(num_partitions=8, on_malformed="quarantine")
    )
    assert out["raw_events"] == pq.read_metadata(segs[0]).num_rows
    assert sum(e.get("rows_quarantined", 0) for e in out["epochs"]) == len(rows)
    assert read_quarantine(lake_root).num_rows == len(rows)
    # final state == oracle over segment 0 only
    solo = tmp_path / "solo"
    solo.mkdir()
    shutil.copy(segs[0], solo / os.path.basename(segs[0]))
    want = expected_final_state(str(solo))
    got = final_table(lake_root)
    assert got.num_rows == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_type_invalid_lines_share_the_policy(tmp_path):
    """Valid JSON with wrong field types (or a non-object line) used to die
    as an opaque Arrow cast error mid-epoch; the shared _line_error check
    makes them first-class dead-letter citizens with field-specific
    provenance — and the loud default names the field, not the cast."""
    spec = ChangelogSpec(n_events=1_000, n_convs=40, n_segments=2, seed=37)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    segs = list_segments(binlog)
    mixed = tmp_path / "mixed"
    mixed.mkdir()
    shutil.copy(segs[0], mixed / os.path.basename(segs[0]))
    rows = pq.read_table(segs[1]).to_pylist()
    name = os.path.basename(segs[1]).replace(".parquet", ".jsonl")
    bad = [
        '{"conv_id": "c1", "turn_idx": "three", "lsn": 1}',      # str int
        '{"conv_id": "c1", "turn_idx": 0, "lsn": true}',          # bool int
        '{"conv_id": 7, "turn_idx": 0, "lsn": 2}',                # int str
        '{"conv_id": "c1", "turn_idx": 0, "lsn": 3, "ts": "not-a-date"}',
        '[1, 2, 3]',                                              # non-object
    ]
    with open(mixed / name, "w") as f:
        for j, r in enumerate(rows):
            r["ts"] = r["ts"].isoformat()
            f.write(_json.dumps(r) + "\n")
            if j < len(bad):
                f.write(bad[j] + "\n")

    # loud default names the offending field
    with pytest.raises(ValueError, match="turn_idx: expected integer"):
        apply_changelog(
            str(tmp_path / "lake_err"), str(mixed), EngineConfig(num_partitions=8)
        )

    lake_root = str(tmp_path / "lake")
    out = apply_changelog(
        lake_root, str(mixed), EngineConfig(num_partitions=8, on_malformed="quarantine")
    )
    assert sum(e.get("rows_quarantined", 0) for e in out["epochs"]) == len(bad)
    q = read_quarantine(lake_root)
    errs = "\n".join(q["error"].to_pylist())
    assert "turn_idx: expected integer" in errs
    assert "lsn: expected integer" in errs           # bool rejected
    assert "conv_id: expected string" in errs
    assert "ts: not ISO-8601" in errs
    assert "not a JSON object" in errs

    got = final_table(lake_root)
    want = expected_final_state(binlog)
    assert got.num_rows == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_int_epoch_ts_is_valid(tmp_path):
    """Both ts encodings the conform cast accepts must pass validation:
    integer epoch-us (the publish round-trip writes these) and ISO strings
    — a regression here broke three publish tests. One encoding per
    SEGMENT: Arrow's JSON reader infers one type per file, so mixing
    encodings within a file is a reader limitation, not a line defect."""
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    with open(os.path.join(binlog, "seg-00000.jsonl"), "w") as f:
        f.write(_json.dumps({"conv_id": "c-1", "turn_idx": 0, "role": "user",
                             "text": "hi", "tool": "", "ts": 1000,
                             "lsn": 1, "op": "insert"}) + "\n")
    with open(os.path.join(binlog, "seg-00001.jsonl"), "w") as f:
        f.write(_json.dumps({"conv_id": "c-1", "turn_idx": 1, "role": "user",
                             "text": "yo", "tool": "",
                             "ts": "2024-01-01T00:00:01",
                             "lsn": 2, "op": "insert"}) + "\n")
    lake = str(tmp_path / "lake")
    out = apply_changelog(lake, binlog, EngineConfig(num_partitions=4))
    assert out["rows_applied"] == 2
    assert read_quarantine(lake).num_rows == 0


def test_intra_file_mixed_types_always_loud(tmp_path):
    """One key carrying two non-null JSON kinds INSIDE a file is unreadable
    by any inference path and no single line is at fault — quarantining
    would silently lose valid rows, so BOTH policies refuse loudly."""
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    with open(os.path.join(binlog, "seg-00000.jsonl"), "w") as f:
        f.write(_json.dumps({"conv_id": "c-1", "turn_idx": 0, "role": "user",
                             "text": "a", "tool": "", "ts": 1000,
                             "lsn": 1, "op": "insert"}) + "\n")
        f.write(_json.dumps({"conv_id": "c-1", "turn_idx": 1, "role": "user",
                             "text": "b", "tool": "",
                             "ts": "2024-01-01T00:00:01",
                             "lsn": 2, "op": "insert"}) + "\n")
    for policy in ("error", "quarantine"):
        with pytest.raises(ValueError, match="mixes JSON value types"):
            apply_changelog(
                str(tmp_path / f"lake_{policy}"), binlog,
                EngineConfig(num_partitions=4, on_malformed=policy),
            )
