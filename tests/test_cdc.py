"""End-to-end CDC replay tests (the tests the reference lacks, SURVEY.md §5):

- full replay reproduces the DuckDB LWW oracle bit-for-bit, sorted by
  (conv_id, turn_idx) — the per-turn text-equality invariant;
- re-applying committed segments is a no-op (exactly-once);
- resume from a mid-replay checkpoint converges to the same state;
- a crash between phase 1 (part files written) and phase 2 (manifest commit)
  is recovered by re-running the epoch;
- additive schema evolution (tool_meta column) propagates with nulls for
  pre-evolution rows.
"""

import os

import pyarrow as pa
import pytest

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    apply_epoch,
    final_table,
    list_segments,
)
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)

CFG = EngineConfig(num_partitions=8, turn_bucket=16, epoch_segments=3)


@pytest.fixture(scope="module")
def binlog(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth")
    spec = ChangelogSpec(n_events=12_000, n_convs=400, n_segments=7, seed=7)
    return generate_changelog(str(out), spec)


def _assert_matches_oracle(lake_root: str, binlog_dir: str):
    got = final_table(lake_root)
    want = expected_final_state(binlog_dir)
    # no stray columns may leak into the lake (e.g. hive-partition inference)
    assert set(got.column_names) <= {
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn", "tool_meta",
    }
    assert got.num_rows == want.num_rows
    got = got.select(want.column_names).cast(want.schema)
    assert got.equals(want), "final lake state != DuckDB LWW oracle"


def test_full_replay_matches_oracle(binlog, tmp_path):
    lake_root = str(tmp_path / "lake")
    out = apply_changelog(lake_root, binlog, CFG)
    assert out["segments_applied"] == 7
    assert out["rows_applied"] > 0
    _assert_matches_oracle(lake_root, binlog)


def test_reapply_is_noop(binlog, tmp_path):
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    epoch_before = Lake(lake_root).current_epoch()
    again = apply_changelog(lake_root, binlog, CFG)
    assert again["segments_applied"] == 0
    assert Lake(lake_root).current_epoch() == epoch_before
    _assert_matches_oracle(lake_root, binlog)


def test_resume_mid_replay(binlog, tmp_path):
    lake_root = str(tmp_path / "lake")
    segs = list_segments(binlog)
    lake = Lake(lake_root)
    # first "process run": only the first 2 segments
    apply_epoch(lake, segs[:2], CFG)
    # resume: picks up exactly the remaining segments
    out = apply_changelog(lake_root, binlog, CFG)
    assert out["segments_applied"] == len(segs) - 2
    _assert_matches_oracle(lake_root, binlog)


def test_crash_before_commit_recovers(binlog, tmp_path, monkeypatch):
    lake_root = str(tmp_path / "lake")
    segs = list_segments(binlog)
    lake = Lake(lake_root)
    apply_epoch(lake, segs[:3], CFG)

    # simulate a crash between phase 1 and phase 2: run an epoch whose
    # manifest commit fails after part files hit disk
    import nostr_data_pipeline_ray.state.lake as lake_mod

    real_commit = lake_mod.Lake.commit_epoch

    def boom(self, *a, **k):
        raise RuntimeError("crash before manifest commit")

    monkeypatch.setattr(lake_mod.Lake, "commit_epoch", boom)
    with pytest.raises(RuntimeError):
        apply_epoch(Lake(lake_root), segs[3:5], CFG)
    monkeypatch.setattr(lake_mod.Lake, "commit_epoch", real_commit)

    # orphan part files exist but are invisible (manifest not advanced)
    assert Lake(lake_root).applied_segments() == {os.path.basename(s) for s in segs[:3]}

    # recovery = just run the tail again
    apply_changelog(lake_root, binlog, CFG)
    _assert_matches_oracle(lake_root, binlog)


def test_schema_evolution(tmp_path):
    out = tmp_path / "synth_evolved"
    spec = ChangelogSpec(n_events=6_000, n_convs=200, n_segments=5, seed=11, evolve=True)
    binlog = generate_changelog(str(out), spec)
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)

    got = final_table(lake_root)
    assert "tool_meta" in got.column_names
    # pre-evolution winners have null tool_meta; evolved winners carry values
    col = got["tool_meta"]
    assert col.null_count > 0
    assert col.null_count < got.num_rows

    # values still match the oracle (which unions by name)
    want = expected_final_state(binlog)
    got_cmp = got.select(want.column_names).cast(want.schema)
    assert got_cmp.equals(want)


def test_partial_evolution_read_final_conforms(binlog, tmp_path):
    """An evolution epoch touching only SOME partitions leaves the snapshot
    mixed-schema (rewritten parts carry tool_meta, carried-forward parts
    don't); read_final must still surface the evolved column for every row,
    null-filled on pre-evolution partitions."""
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.cdc import read_final

    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)

    # handcraft one evolved segment touching a single conversation
    extra = tmp_path / "extra_binlog"
    extra.mkdir()
    seg = pa.table(
        {
            "conv_id": pa.array(["conv-1", "conv-1"]),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": pa.array(["user", "assistant"]),
            "text": pa.array(["evolved turn 0", "evolved turn 1"]),
            "tool": pa.array(["", ""]),
            "ts": pa.array([10**15, 10**15 + 1], pa.timestamp("us")),
            "op": pa.array(["update", "update"]),
            "lsn": pa.array([10**9, 10**9 + 1], pa.int64()),
            "tool_meta": pa.array(['{"calls":1}', '{"calls":2}']),
        }
    )
    pq.write_table(seg, extra / "evolved-00000.parquet")
    apply_changelog(lake_root, str(extra), CFG)

    ds = read_final(lake_root)
    assert "tool_meta" in ds.schema().names  # not silently dropped
    df = ds.to_pandas()
    evolved = df[df["conv_id"] == "conv-1"].set_index("turn_idx")
    assert evolved.loc[0, "tool_meta"] == '{"calls":1}'
    assert evolved.loc[0, "text"] == "evolved turn 0"
    # untouched partitions: column present, null-filled
    assert df[df["conv_id"] != "conv-1"]["tool_meta"].isna().all()
    # the conforming read stays exactly-once correct on the invariant columns
    n_meta = df["tool_meta"].notna().sum()
    assert 0 < n_meta <= 2


def test_read_final_sorted_dataset(binlog, tmp_path):
    from nostr_data_pipeline_ray.pipelines.cdc import read_final

    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    df = read_final(lake_root, sort=True).to_pandas()
    # globally ordered by the invariant key
    assert df["conv_id"].is_monotonic_increasing or (
        df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)[
            ["conv_id", "turn_idx"]
        ].equals(df[["conv_id", "turn_idx"]].reset_index(drop=True))
    )
    assert df.groupby("conv_id")["turn_idx"].apply(
        lambda s: s.is_monotonic_increasing
    ).all()


def test_follow_mode_applies_segments_as_they_appear(binlog, tmp_path):
    """Continuous tail: segments written AFTER the follower starts get
    applied in a later pass, the manifest advances, and the final state
    still matches the full-replay oracle."""
    import shutil

    from nostr_data_pipeline_ray.pipelines.cdc import follow_changelog

    lake_root = str(tmp_path / "lake")
    segs = list_segments(binlog)
    watch = tmp_path / "watch"
    watch.mkdir()
    for s in segs[:3]:  # only the head of the stream exists at start
        shutil.copy(s, watch / os.path.basename(s))

    state = {"fed": False}

    def stop():
        if not state["fed"]:
            # the "producer": the rest of the stream arrives mid-follow
            for s in segs[3:]:
                shutil.copy(s, watch / os.path.basename(s))
            state["fed"] = True
            return False
        return len(Lake(lake_root).applied_segments()) == len(segs)

    out = follow_changelog(
        lake_root, str(watch), CFG, poll_interval=0.05, idle_timeout=60.0,
        stop=stop,
    )
    assert out["reason"] == "stopped"
    assert out["segments_applied"] == len(segs)
    assert out["passes"] >= 2  # the tail arrived in a later poll
    _assert_matches_oracle(lake_root, str(watch))


def test_read_final_column_pruning(binlog, tmp_path):
    from nostr_data_pipeline_ray.pipelines.cdc import read_final

    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    pruned = read_final(lake_root, columns=["conv_id", "lsn"])
    assert pruned.schema().names == ["conv_id", "lsn"]
    assert pruned.count() == read_final(lake_root).count()


def test_read_conversation_partition_pruned(binlog, tmp_path):
    """Point lookup re-derives candidate pkeys from the manifest's persisted
    partitioning and reads only those part files."""
    from nostr_data_pipeline_ray.pipelines.cdc import (
        conversation_pkeys,
        read_conversation,
    )

    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    want = expected_final_state(binlog)

    conv = want["conv_id"][0].as_py()
    got = read_conversation(lake_root, conv)
    w = want.filter(pa.compute.equal(want["conv_id"], conv))
    assert got.num_rows == w.num_rows
    assert got.select(w.column_names).cast(w.schema).equals(w)
    # turn order is the invariant order
    turns = got["turn_idx"].to_pylist()
    assert turns == sorted(turns)

    # pruning: candidate set ≪ total partitions (max_turn 4096, bucket 16 →
    # ≤256 bucket probes collapse onto ≤8 partitions; short convs hit fewer
    # actual files than the lake holds)
    pkeys = conversation_pkeys(conv, CFG.num_partitions, CFG.turn_bucket)
    assert len(pkeys) <= CFG.num_partitions

    # unknown conversation → empty, never an error
    assert read_conversation(lake_root, "conv-does-not-exist").num_rows == 0


def test_compact_collapses_epochs(binlog, tmp_path):
    from nostr_data_pipeline_ray.pipelines.cdc import compact

    import shutil

    import pyarrow.parquet as pq

    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    # a tail epoch touching ONE conversation: every other partition is
    # carried forward by reference → live files scattered across epoch dirs
    watch = tmp_path / "tail"
    watch.mkdir()
    for s in list_segments(binlog):
        shutil.copy(s, watch / os.path.basename(s))
    seg = pa.table(
        {
            "conv_id": pa.array(["conv-1"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["compacted turn"]),
            "tool": pa.array([""]),
            "ts": pa.array([10**15], pa.timestamp("us")),
            "op": pa.array(["update"]),
            "lsn": pa.array([10**9], pa.int64()),
        }
    )
    pq.write_table(seg, watch / "tail-00000.parquet")
    apply_changelog(lake_root, str(watch), CFG)

    m = Lake(lake_root).current_manifest()
    dirs_before = {os.path.dirname(r) for r in m["files"].values()}
    assert len(dirs_before) > 1  # carry-forward scattered files across epochs

    out = compact(lake_root)
    assert out["partitions"] == len(m["files"])
    m2 = Lake(lake_root).current_manifest()
    dirs_after = {os.path.dirname(r) for r in m2["files"].values()}
    assert len(dirs_after) == 1  # all live parts co-located in one epoch dir

    # state unchanged: the compacted lake equals the full-stream oracle
    got = final_table(lake_root)
    want = expected_final_state(str(watch))
    assert got.num_rows == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)

    # vacuum can now reclaim every older epoch dir
    removed = Lake(lake_root).vacuum(keep_manifests=1)
    assert removed
    got = final_table(lake_root)
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_export_snapshot_resumes(binlog, tmp_path):
    """Partitioned export: a killed run resumes by skipping finished
    partitions; the exported rows equal the lake state."""
    import duckdb
    import pyarrow.compute as pc

    from nostr_data_pipeline_ray.pipelines.cdc import export_snapshot

    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    out_dir = str(tmp_path / "export")

    first = export_snapshot(lake_root, out_dir)
    assert first["written"] == first["partitions"] > 0
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS"))

    # simulate a killed export: delete some outputs, rerun → only those
    parts = sorted(p for p in os.listdir(out_dir) if p.endswith(".parquet"))
    for p in parts[:2]:
        os.unlink(os.path.join(out_dir, p))
    second = export_snapshot(lake_root, out_dir)
    assert second["written"] == 2
    assert second["skipped"] == second["partitions"] - 2

    con = duckdb.connect()
    n = con.execute(
        f"select count(*) from read_parquet('{out_dir}/part-*.parquet')"
    ).fetchone()[0]
    con.close()
    want = expected_final_state(binlog)
    assert n == want.num_rows
    import pyarrow.parquet as pq

    assert "pkey" not in pq.read_schema(os.path.join(out_dir, parts[2])).names
    assert final_table(lake_root).num_rows == n


def test_delete_drops_keys(binlog, tmp_path):
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    got = final_table(lake_root)
    want = expected_final_state(binlog)
    # sanity: the generator produced deletes, and they are absent from both
    import duckdb

    con = duckdb.connect()
    n_del = con.execute(
        f"select count(*) from read_parquet('{binlog}/*.parquet') where op = 'delete'"
    ).fetchone()[0]
    con.close()
    assert n_del > 0
    assert got.num_rows == want.num_rows


def test_staged_files_never_collide_across_blocks(tmp_path):
    """Two DIFFERENT blocks of one partition sharing (lsn_min, lsn_max,
    row_count) — the signature of equal-LSN duplicate-delivery rows
    straddling block boundaries — must stage to two distinct files (no
    silent overwrite), while a retry of the SAME block stays idempotent
    (one file)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.cdc import SplitStage

    def block(conv_ids):
        import numpy as np
        import pandas as pd

        n = len(conv_ids)
        return pa.table(
            {
                "conv_id": pa.array(conv_ids, pa.string()),
                "turn_idx": pa.array([0] * n, pa.int32()),
                "role": pa.array(["user"] * n),
                "text": pa.array([f"t-{c}" for c in conv_ids]),
                "tool": pa.array([None] * n, pa.string()),
                "ts": pa.array([0] * n, pa.timestamp("us")),
                "op": pa.array(["insert"] * n),
                "lsn": pa.array([100, 200], pa.int64()),  # same range both blocks
                "pkey": pa.array([3] * n, pa.int32()),
                "khash": pa.array(
                    pd.util.hash_array(np.asarray(conv_ids, dtype=object))
                ),
            }
        )

    staged = str(tmp_path / "staged")
    split = SplitStage(staged)
    split(block(["c-a", "c-b"]))  # block 1
    split(block(["c-c", "c-d"]))  # block 2: same (min, max, count), new rows
    split(block(["c-a", "c-b"]))  # retry of block 1: must overwrite itself
    files = _glob.glob(os.path.join(staged, "pk-00003", "*.parquet"))
    assert len(files) == 2, files
    got = pa.concat_tables([pq.read_table(f) for f in files])
    assert sorted(got["conv_id"].to_pylist()) == ["c-a", "c-b", "c-c", "c-d"]


def test_shared_scratch_dir_exchange(binlog, tmp_path):
    """The staged exchange redirected to a shared-storage-style scratch dir
    (separate from the lake root; plain POSIX ops only): final state matches
    the oracle and the per-epoch scratch is cleaned after commit."""
    import glob as _glob

    lake_root = str(tmp_path / "lake")
    scratch = str(tmp_path / "shared_scratch")
    import dataclasses

    cfg = dataclasses.replace(CFG, scratch_dir=scratch)
    apply_changelog(lake_root, binlog, cfg)
    _assert_matches_oracle(lake_root, binlog)
    # post-commit cleanup: no epoch delta dirs left behind on the shared
    # scratch (the lake namespace dir itself may remain)
    assert _glob.glob(os.path.join(scratch, "lake-*", "epoch-*")) == []


def test_read_final_ordered_range_partitioned(binlog, tmp_path):
    """Shuffle-free ordered read: range tasks over already-sorted parts must
    reproduce final_table exactly, block order = global order."""
    import ray

    from nostr_data_pipeline_ray.pipelines.cdc import (
        final_table,
        read_final_ordered,
    )

    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    want = final_table(lake_root)
    ds = read_final_ordered(lake_root, num_ranges=5)
    got = pa.concat_tables(
        [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows],
        promote_options="permissive",
    )
    assert got.select(want.column_names).cast(want.schema).equals(want)
    # column pruning path
    pruned = read_final_ordered(lake_root, columns=["conv_id", "turn_idx"],
                                num_ranges=3)
    assert pruned.schema().names == ["conv_id", "turn_idx"]
    assert pruned.count() == want.num_rows


def test_read_final_ordered_delta_lake_falls_back(binlog, tmp_path):
    """Pending delta chains (tombstones not yet folded) must take the
    sort-shuffle path and still produce the exact ordered state."""
    import dataclasses

    from nostr_data_pipeline_ray.pipelines.cdc import (
        final_table,
        read_final_ordered,
    )

    lake_root = str(tmp_path / "lake")
    cfg = dataclasses.replace(CFG, merge_policy="delta")
    apply_changelog(lake_root, binlog, cfg)
    want = final_table(lake_root)
    got = read_final_ordered(lake_root).to_pandas()
    assert len(got) == want.num_rows
    # full (conv_id, turn_idx) order — not just conv_id monotonicity
    assert got.sort_values(["conv_id", "turn_idx"])[
        ["conv_id", "turn_idx"]
    ].reset_index(drop=True).equals(
        got[["conv_id", "turn_idx"]].reset_index(drop=True)
    )
    # ...and key-free column projection works on the fallback path too
    texts = read_final_ordered(lake_root, columns=["text"]).to_pandas()
    assert list(texts.columns) == ["text"] and len(texts) == want.num_rows


def test_conv_transcript_ordered_rebuild(binlog, tmp_path):
    """Transcript reconstruction off the applied lake: per conversation the
    '<role>: <text>' lines joined in turn order — checked against DuckDB's
    ordered string_agg over the same binlog's LWW fold."""
    import duckdb
    import pandas as pd

    from nostr_data_pipeline_ray.pipelines.flagship import conv_transcript

    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    got = (conv_transcript(lake_root).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    segs = ", ".join(f"'{p}'" for p in list_segments(binlog))
    want = duckdb.connect().execute(f"""
        WITH final AS (
            SELECT * FROM read_parquet([{segs}], union_by_name=true)
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) = 1
        )
        SELECT conv_id,
               string_agg(coalesce(role, '') || ': ' || coalesce(text, ''),
                          chr(10) ORDER BY turn_idx) AS transcript,
               CAST(count(*) AS BIGINT) AS n_turns
        FROM final WHERE op != 'delete' GROUP BY conv_id
        ORDER BY conv_id
    """).df()
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got[["conv_id", "transcript", "n_turns"]], want,
        check_dtype=False, check_exact=True,
    )
