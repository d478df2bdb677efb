"""End-to-end walkthrough (analog of reference examples/analytics_example.py):

  1. synthesize a deterministic changelog (binlog/WAL of change events),
  2. replay it into an exactly-once Parquet lake,
  3. kill-and-resume to show checkpointing,
  4. run a few analytics pipelines over the lake and the testdata tables.

Run:  python examples/end_to_end.py
"""

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    apply_epoch,
    lake_lineage,
    list_segments,
    read_final,
)
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog

BASE = "/tmp/ndp_example"
shutil.rmtree(BASE, ignore_errors=True)

# 1. a small changelog: 50k change events over 1.5k conversations, with a
#    schema-evolution tail segment adding tool_meta
spec = ChangelogSpec(n_events=50_000, n_convs=1_500, n_segments=10, seed=3, evolve=True)
binlog = generate_changelog(f"{BASE}/synth", spec)
print("binlog:", binlog)

# 2. replay the first half, pretending the process dies afterwards
cfg = EngineConfig(num_partitions=16, epoch_segments=5)
lake = f"{BASE}/lake"
apply_epoch(Lake(lake), list_segments(binlog)[:5], cfg)
print("after partial run:", json.dumps(Lake(lake).current_manifest()["stats"]))

# 3. resume: committed segments are skipped via the manifest
out = apply_changelog(lake, binlog, cfg)
print("resume applied:", out["segments_applied"], "segments,",
      out["rows_applied"], "rows")

final = read_final(lake, sort=True)
print("final lake:", final.count(), "rows; schema:", final.schema().names)
print("lineage sample:", lake_lineage(lake).slice(0, 3).to_pylist())

# 4. analytics over the shared testdata tables
import nostr_data_pipeline_ray.pipelines.analytics as an

top = an.q_top_users_by_value("/root/testdata/sf0.001").to_pandas()
print("\ntop users by value:\n", top.head(5).to_string())
sessions = an.q_user_sessions("/root/testdata/sf0.001").to_pandas()
print("\nsessions found:", len(sessions))

ray.shutdown()
