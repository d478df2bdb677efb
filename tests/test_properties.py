"""Property-based and adversarial correctness tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import apply_epoch, final_table, lww_reduce
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)


# ---- lww_reduce vs a straightforward pandas reference ----------------------

@st.composite
def change_tables(draw):
    n = draw(st.integers(min_value=1, max_value=200))
    convs = draw(st.integers(min_value=1, max_value=8))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    conv = rng.integers(0, convs, n)
    turn = rng.integers(0, 5, n).astype(np.int32)
    lsn = rng.integers(0, 50, n).astype(np.int64)  # deliberate lsn collisions
    op = rng.choice(["insert", "update", "delete"], n)
    return pa.table(
        {
            "conv_id": pa.array([f"c{v}" for v in conv]),
            "turn_idx": pa.array(turn, pa.int32()),
            "text": pa.array([f"t{i}" for i in range(n)]),
            "op": pa.array(op),
            "lsn": pa.array(lsn, pa.int64()),
        }
    )


@given(change_tables())
@settings(max_examples=60, deadline=None)
def test_lww_reduce_matches_pandas_reference(table):
    winners, max_lsn = lww_reduce(table)
    df = table.to_pandas()
    # reference semantics: max lsn per key, ties broken by LAST input position
    df["_pos"] = np.arange(len(df))
    ref = (
        df.sort_values(["lsn", "_pos"], kind="stable")
        .drop_duplicates(["conv_id", "turn_idx"], keep="last")
    )
    got = winners.to_pandas()
    key = ["conv_id", "turn_idx"]
    ref_s = ref.sort_values(key).reset_index(drop=True)
    got_s = got.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(ref_s)
    pd.testing.assert_frame_equal(
        got_s[["conv_id", "turn_idx", "text", "op", "lsn"]],
        ref_s[["conv_id", "turn_idx", "text", "op", "lsn"]],
    )
    assert max_lsn == int(df["lsn"].max())


# ---- row-level idempotence: overlapping segment re-delivery -----------------

def test_overlapping_segment_redelivery(tmp_path):
    """apply_epoch called with a segment that was ALREADY committed in an
    earlier epoch (duplicate delivery at the segment level, bypassing the
    changelog-level skip): the per-partition watermark filter must make the
    replayed rows a no-op and the final state must equal the oracle."""
    spec = ChangelogSpec(n_events=6_000, n_convs=200, n_segments=6, seed=21)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    from nostr_data_pipeline_ray.pipelines.cdc import list_segments

    segs = list_segments(binlog)
    lake_root = str(tmp_path / "lake")
    lake = Lake(lake_root)
    cfg = EngineConfig(num_partitions=8, epoch_segments=3)

    apply_epoch(lake, segs[0:2], cfg)
    # segments 0-1 re-delivered together with new segments 2-3
    out = apply_epoch(lake, segs[0:4], cfg)
    assert out["rows_applied"] > 0
    apply_epoch(lake, segs[4:6], cfg)

    got = final_table(lake_root)
    want = expected_final_state(binlog)
    assert got.num_rows == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_pure_replay_epoch_is_bookkeeping_only(tmp_path):
    spec = ChangelogSpec(n_events=3_000, n_convs=100, n_segments=3, seed=23)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    from nostr_data_pipeline_ray.pipelines.cdc import list_segments

    segs = list_segments(binlog)
    lake_root = str(tmp_path / "lake")
    lake = Lake(lake_root)
    cfg = EngineConfig(num_partitions=4, epoch_segments=4)
    apply_epoch(lake, segs, cfg)
    files_before = dict(Lake(lake_root).current_manifest()["files"])

    out = apply_epoch(lake, segs, cfg)  # full re-delivery of applied segments
    assert out["rows_applied"] == 0
    assert out["partitions"] == 0
    # carried forward by reference, not rewritten
    assert Lake(lake_root).current_manifest()["files"] == files_before

    got = final_table(lake_root)
    want = expected_final_state(binlog)
    assert got.select(want.column_names).cast(want.schema).equals(want)
