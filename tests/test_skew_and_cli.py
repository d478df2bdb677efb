"""Hot-conversation skew handling + lake utilities + CLI smoke."""

import json
import os
import subprocess
import sys

import numpy as np

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    lake_lineage,
    partition_histogram,
)
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog


def test_turn_bucket_salting_spreads_hot_conversations(tmp_path):
    # 3 conversations, up to 4000 turns each, heavy Zipf: without salting one
    # conversation's whole history lands on a single partition (reducer)
    spec = ChangelogSpec(
        n_events=30_000, n_convs=3, max_turns=4_000, zipf_alpha=1.5,
        n_segments=4, seed=13,
    )
    binlog = generate_changelog(str(tmp_path / "synth"), spec)

    P = 16
    unsalted = partition_histogram(
        binlog, EngineConfig(num_partitions=P, turn_bucket=1 << 30)
    )
    salted = partition_histogram(
        binlog, EngineConfig(num_partitions=P, turn_bucket=64)
    )
    total = sum(unsalted.values())
    assert total == sum(salted.values())
    max_unsalted = max(unsalted.values()) / total
    max_salted = max(salted.values()) / total
    # pure conv-hash: ≤3 partitions carry everything (≥1/3 each); turn-range
    # salting spreads the hot conversation across many partitions
    assert max_unsalted >= 0.33
    assert max_salted < max_unsalted / 2
    assert max_salted < 0.2


def test_lake_lineage_and_vacuum(tmp_path):
    spec = ChangelogSpec(n_events=8_000, n_convs=300, n_segments=4, seed=5)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    lake_root = str(tmp_path / "lake")
    cfg = EngineConfig(num_partitions=8, epoch_segments=2)
    apply_changelog(lake_root, binlog, cfg)

    lin = lake_lineage(lake_root)
    assert lin.num_rows == 8  # one lineage row per partition
    assert set(lin.column_names) >= {"pkey", "epoch", "rows_in", "rows_out",
                                     "max_lsn", "bytes", "seconds"}
    assert all(r >= 0 for r in lin["rows_out"].to_pylist())

    # keep_manifests=2 retains BOTH epochs: every retained manifest stays
    # fully readable (no dangling part files), nothing is removed here
    import os

    lake = Lake(lake_root)
    assert lake.vacuum(keep_manifests=2) == []
    for e in (0, 1):
        with open(os.path.join(lake_root, "manifests", f"epoch-{e}.json")) as f:
            man = json.load(f)
        assert all(
            os.path.exists(os.path.join(lake_root, r)) for r in man["files"].values()
        )

    # keep_manifests=1 collapses history: epoch-0's 8 superseded parts, their
    # bloom sidecars, AND its manifest JSON go; the current epoch stays readable
    removed = lake.vacuum(keep_manifests=1)
    parts = [r for r in removed if r.endswith(".parquet")]
    blooms = [r for r in removed if r.endswith(".bloom")]
    manifests = [r for r in removed if r.endswith(".json")]
    assert len(parts) == 8 and len(manifests) == 1
    assert len(blooms) == len(parts)  # sidecars never outlive their parts
    assert not os.path.exists(os.path.join(lake_root, "manifests", "epoch-0.json"))
    import nostr_data_pipeline_ray.pipelines.cdc as cdc

    assert cdc.read_final(lake_root).count() > 0  # still readable


def test_single_writer_lock_and_commit_cas(tmp_path):
    import pyarrow as pa
    import pytest

    from nostr_data_pipeline_ray.state.lake import ConcurrentWriterError

    spec = ChangelogSpec(n_events=4_000, n_convs=100, n_segments=2, seed=3)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    lake_root = str(tmp_path / "lake")
    cfg = EngineConfig(num_partitions=4)
    apply_changelog(lake_root, binlog, cfg)
    lake = Lake(lake_root)

    # a second writer (second lock handle) must fail fast, not corrupt
    with lake.writer_lock():
        with pytest.raises(ConcurrentWriterError):
            apply_changelog(lake_root, binlog, cfg)

    # ...and the lock releases cleanly afterwards (replay is a no-op)
    assert apply_changelog(lake_root, binlog, cfg)["segments_applied"] == 0

    # commit CAS: an epoch that doesn't extend the committed pointer is
    # refused at the commit point (the race backstop for lock-free storage)
    schema = pa.schema([("conv_id", pa.string())])
    current = lake.current_epoch()
    with pytest.raises(ConcurrentWriterError):
        lake.commit_epoch(current + 2, {}, {}, [], {}, schema)
    with pytest.raises(ConcurrentWriterError):
        lake.commit_epoch(current, {}, {}, [], {}, schema)
    assert lake.current_epoch() == current  # pointer never moved


def test_cli_smoke(tmp_path):
    env_repo = "/root/repo"

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "nostr_data_pipeline_ray", *args],
            capture_output=True, text=True, cwd=env_repo, timeout=300,
        )

    out = run("version")
    assert out.returncode == 0 and out.stdout.strip()

    synth_dir = str(tmp_path / "cli_synth")
    out = run("synth", "--out", synth_dir, "--events", "5000", "--convs", "200",
              "--segments", "4")
    assert out.returncode == 0, out.stderr
    binlog = json.loads(out.stdout)["binlog"]

    lake = str(tmp_path / "cli_lake")
    view = str(tmp_path / "cli_view")
    out = run("apply", "--lake", lake, "--binlog", binlog, "--view", view)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    assert lines[-1]["segments_applied"] == 4
    assert any("view" in ln and ln["view"]["refreshed"] > 0 for ln in lines[:-1])
    assert os.path.exists(os.path.join(view, "_view.json"))

    out = run("stats", "--lake", lake)
    assert out.returncode == 0
    stats = json.loads(out.stdout)
    assert stats["segments_applied"] == 4 and stats["epoch"] >= 0

    # follow mode through the CLI: everything already applied → idle exit
    out = run("apply", "--lake", lake, "--binlog", binlog,
              "--follow", "--poll-interval", "0.2", "--idle-timeout", "2")
    assert out.returncode == 0, out.stderr[-2000:]
    follow = json.loads(out.stdout.strip().splitlines()[-1])
    assert follow["reason"] == "idle" and follow["segments_applied"] == 0

    # publish via the apply flag (relay chain) AND the standalone command;
    # the second call must be an exactly-once no-op
    sink = str(tmp_path / "cli_sink")
    out = run("apply", "--lake", lake, "--binlog", binlog,
              "--publish-sink", sink)
    assert out.returncode == 0, out.stderr[-2000:]
    pub = next(json.loads(ln)["publish"]
               for ln in out.stdout.strip().splitlines()
               if "\"publish\"" in ln)
    assert pub["sinks"][sink]["ok"] and pub["sinks"][sink]["published"] == 4
    assert len([f for f in os.listdir(sink) if f.endswith(".parquet")]) == 4
    out = run("publish", "--lake", lake, "--binlog", binlog, "--sink", sink)
    assert out.returncode == 0, out.stderr[-2000:]
    again = json.loads(out.stdout.strip().splitlines()[-1])
    assert again["sinks"][sink]["published"] == 0
    assert again["sinks"][sink]["total"] == 4

    exp = str(tmp_path / "cli_export")
    out = run("export", "--lake", lake, "--out", exp)
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip().splitlines()[-1])["written"] > 0

    out = run("report", "--sf", "/root/testdata/sf0.001")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "network snapshot" in out.stdout and "trending topics" in out.stdout


def test_html_report_renders(tmp_path):
    """`report --html` writes a self-contained dashboard: stat tiles, four
    SVG charts with native tooltips, a table view per chart, clean geometry
    (no negative absolute coordinates)."""
    import re

    import __ray_entry__ as entrymod

    from nostr_data_pipeline_ray.report import render_html

    doc = render_html("/root/testdata/sf0.001", entrymod.queries())
    out = tmp_path / "report.html"
    out.write_text(doc)
    assert doc.count("<svg") >= 4
    assert doc.count("<details") >= 4  # table view per chart
    assert doc.count("<title>") > 20  # hover tooltips on marks
    for must in ("Trending topics", "Top users by value", "Activity by hour",
                 "Daily signups", "Lake partition health", "Total events"):
        assert must in doc, must
    assert not re.findall(r'(width|height|cx|cy|x1|x2|y1|y2|r)="(-[\d.]+)"', doc)
    starts = [tuple(map(float, m)) for m in re.findall(r'd="M(-?[\d.]+),(-?[\d.]+)', doc)]
    assert min(x for x, _ in starts) >= 0 and min(y for _, y in starts) >= 0


def test_staged_format_auto_policy(tmp_path):
    """'auto' resolves by scratch filesystem: node-local (tmpfs / local
    disk) -> ipc-lz4 (the r4 exchange-matrix winner there), unknown/shared
    -> parquet; explicit formats pass through."""
    from nostr_data_pipeline_ray.config import (
        _fs_type,
        resolve_staged_format,
    )

    # this sandbox: /tmp is local (ext4), /dev/shm is tmpfs
    assert resolve_staged_format("auto", str(tmp_path)) == "ipc-lz4"
    assert resolve_staged_format("auto", "/dev/shm/anywhere") == "ipc-lz4"
    assert resolve_staged_format("parquet", "/dev/shm/x") == "parquet"
    assert resolve_staged_format("ipc-zstd", str(tmp_path)) == "ipc-zstd"
    # a network-looking fs type falls back to parquet (simulated: the
    # resolver maps any unrecognized type conservatively)
    from nostr_data_pipeline_ray import config as cfgmod

    assert cfgmod.resolve_staged_format("auto", "/proc") == "parquet"  # procfs
    assert _fs_type("/proc") == "proc"
