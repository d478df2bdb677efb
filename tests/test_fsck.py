"""Lake integrity checker. Reference analog: the DB health check
(src/nostr_pipeline/loaders/database.py:107-115) — here a deep parallel
audit of the immutable-file lake. fsck must (a) pass on every healthy lake
under both merge policies, (b) detect each corruption class, (c) never
mutate the lake."""

import dataclasses
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import apply_changelog, final_table
from nostr_data_pipeline_ray.state.fsck import check_lake
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog

CFG = EngineConfig(num_partitions=6, turn_bucket=16, epoch_segments=2)


@pytest.fixture(scope="module")
def binlog(tmp_path_factory):
    return generate_changelog(
        str(tmp_path_factory.mktemp("fsck") / "synth"),
        ChangelogSpec(n_events=6_000, n_convs=200, n_segments=4, seed=11),
    )


def _fresh_lake(tmp_path, binlog, policy="rewrite"):
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog,
                    dataclasses.replace(CFG, merge_policy=policy))
    return lake_root


@pytest.mark.parametrize("policy", ["rewrite", "delta"])
def test_healthy_lake_passes_shallow_and_deep(tmp_path, binlog, policy):
    lake_root = _fresh_lake(tmp_path, binlog, policy)
    rows_before = final_table(lake_root).num_rows
    report = check_lake(lake_root, deep=True)
    assert report["ok"], report["errors"]
    assert report["errors"] == []
    assert report["info"]["parts_deep_checked"] > 0
    # fsck never mutates
    assert final_table(lake_root).num_rows == rows_before


def test_detects_missing_part_and_orphan(tmp_path, binlog):
    lake_root = _fresh_lake(tmp_path, binlog)
    lake = Lake(lake_root)
    victim = lake.snapshot_files()[0]
    os.unlink(victim)
    report = check_lake(lake_root)
    assert not report["ok"]
    assert any(e["check"] == "part_exists" for e in report["errors"])

    # an unreferenced file is an orphan warning, not an error
    orphan = os.path.join(lake_root, "parts", "epoch-99", "part-99999.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    pq.write_table(pa.table({"x": [1]}), orphan)
    report2 = check_lake(lake_root)
    assert any(w["check"] == "orphans" for w in report2["warnings"])


def test_detects_corrupt_footer_and_unsorted_rows(tmp_path, binlog):
    lake_root = _fresh_lake(tmp_path, binlog)
    lake = Lake(lake_root)
    files = lake.snapshot_files()

    # truncate one part → unreadable
    with open(files[0], "r+b") as f:
        f.truncate(64)
    # reverse another part's rows → sort-contract violation (footer fine)
    t = pq.read_table(files[1])
    pq.write_table(t.take(list(range(t.num_rows - 1, -1, -1))), files[1])

    report = check_lake(lake_root, deep=True)
    assert not report["ok"]
    checks = {e["check"] for e in report["errors"]}
    assert "part_readable" in checks
    assert "part_sorted" in checks


def test_detects_misrouted_rows_and_lsn_beyond_watermark(tmp_path, binlog):
    lake_root = _fresh_lake(tmp_path, binlog)
    lake = Lake(lake_root)
    f = lake.snapshot_files()[2]
    t = pq.read_table(f)
    # swap every conv_id for one from ANOTHER partition's file and push lsn
    # past the committed watermark
    other = pq.read_table(lake.snapshot_files()[3], columns=["conv_id"])
    swapped = t.set_column(
        t.schema.get_field_index("conv_id"), "conv_id",
        pa.array([other["conv_id"][0].as_py()] * t.num_rows))
    bumped = swapped.set_column(
        t.schema.get_field_index("lsn"), "lsn",
        pa.array([10**15] * t.num_rows, pa.int64()))
    pq.write_table(bumped, f)

    report = check_lake(lake_root, deep=True)
    assert not report["ok"]
    checks = {e["check"] for e in report["errors"]}
    assert "pkey_routing" in checks
    assert "lsn_watermark" in checks


def test_deep_detects_bloom_false_negative(tmp_path, binlog):
    from nostr_data_pipeline_ray.state import bloom

    lake_root = _fresh_lake(tmp_path, binlog)
    victim = Lake(lake_root).snapshot_files()[0]
    # a well-formed sidecar built from the WRONG ids: point reads would
    # silently skip this part — exactly what deep fsck must catch
    with open(bloom.sidecar_path(victim), "wb") as f:
        f.write(bloom.build(pa.array(["not-a-real-conv"])))
    report = check_lake(lake_root, deep=True)
    assert any(e["check"] == "bloom_false_negative" for e in report["errors"])


def test_repair_rebuilds_missing_and_corrupt_sidecars(tmp_path, binlog):
    from nostr_data_pipeline_ray.state.fsck import repair_sidecars

    lake_root = _fresh_lake(tmp_path, binlog)
    lake = Lake(lake_root)
    files = lake.snapshot_files()
    os.unlink(files[0] + ".bloom")
    with open(files[1] + ".bloom", "wb") as f:
        f.write(b"garbage")
    assert any(
        w["check"] == "bloom_sidecars_missing"
        for w in check_lake(lake_root)["warnings"]
    )
    assert repair_sidecars(lake_root) == 2
    report = check_lake(lake_root, deep=True)
    assert report["ok"] and report["warnings"] == []
    assert repair_sidecars(lake_root) == 0  # idempotent


def test_detects_broken_pointer_and_missing_watermark(tmp_path, binlog):
    lake_root = _fresh_lake(tmp_path, binlog)
    man_path = os.path.join(lake_root, "_manifest.json")
    with open(man_path) as f:
        ptr = json.load(f)

    # watermark dropped for a partition that has files
    with open(os.path.join(lake_root, ptr["path"])) as f:
        man = json.load(f)
    pk = next(iter(man["files"]))
    del man["watermarks"][pk]
    with open(os.path.join(lake_root, ptr["path"]), "w") as f:
        json.dump(man, f)
    report = check_lake(lake_root)
    assert any(e["check"] == "watermark_missing" for e in report["errors"])

    # pointer/manifest epoch disagreement
    ptr["epoch"] = 42
    with open(man_path, "w") as f:
        json.dump(ptr, f)
    report2 = check_lake(lake_root)
    assert not report2["ok"]
    assert any(e["check"] == "pointer" for e in report2["errors"])


def test_repair_rebuilds_truncated_body_with_valid_magic(tmp_path, binlog):
    """A sidecar whose first bytes match the magic but whose body is
    truncated fails open on every read (silent pruning loss): deep fsck
    must flag it as a warning and --repair must rebuild it."""
    from nostr_data_pipeline_ray.state import bloom
    from nostr_data_pipeline_ray.state.fsck import repair_sidecars

    lake_root = _fresh_lake(tmp_path, binlog)
    victim = Lake(lake_root).snapshot_files()[0]
    sp = bloom.sidecar_path(victim)
    with open(sp, "rb") as f:
        blob = f.read()
    assert bloom.header_ok(blob)
    truncated = blob[: len(bloom._MAGIC) + 4]  # valid magic, torn header
    with open(sp, "wb") as f:
        f.write(truncated)
    assert not bloom.header_ok(truncated)
    assert bloom.contains(truncated, "anything")  # reads still fail open

    report = check_lake(lake_root, deep=True)
    assert any(w["check"] == "bloom_fail_open" for w in report["warnings"])
    assert repair_sidecars(lake_root) == 1
    report = check_lake(lake_root, deep=True)
    assert report["ok"] and report["warnings"] == []
