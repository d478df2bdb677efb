"""Regressions pinned from the round-2 adversarial code review: schema
preservation through maintenance ops, partitioning adoption, export resume
consistency, JSONL late-key evolution, long-conversation point lookups."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    delete_where,
    export_snapshot,
    final_table,
    list_segments,
    read_conversation,
    read_final,
)
from nostr_data_pipeline_ray.state.lake import ConcurrentWriterError, Lake
from nostr_data_pipeline_ray.synth import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)

CFG = EngineConfig(num_partitions=8, turn_bucket=16, epoch_segments=4)


def _evolved_segment(conv: str, turn: int, lsn: int) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([conv]),
            "turn_idx": pa.array([turn], pa.int32()),
            "role": pa.array(["assistant"]),
            "text": pa.array([f"evolved {conv} {turn}"]),
            "tool": pa.array([""]),
            "ts": pa.array([1_800_000_000_000_000], pa.timestamp("us")),  # 2027
            "op": pa.array(["update"]),
            "lsn": pa.array([lsn], pa.int64()),
            "tool_meta": pa.array(['{"calls":1}']),
        }
    )


@pytest.fixture()
def mixed_schema_lake(tmp_path):
    """A lake whose snapshot is mixed-schema: one partition rewritten with
    tool_meta, the rest carried forward without it."""
    spec = ChangelogSpec(n_events=6_000, n_convs=200, n_segments=4, seed=41)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, binlog, CFG)
    tail = tmp_path / "tail"
    tail.mkdir()
    pq.write_table(_evolved_segment("conv-3", 0, 10**9), tail / "zz-ev.parquet")
    apply_changelog(lake_root, str(tail), CFG)
    return lake_root


def test_delete_where_preserves_evolved_column_on_mixed_schema(mixed_schema_lake):
    """Review finding: delete_where wrote each partition with its ORIGINAL
    schema into one epoch dir, breaking the one-schema-per-epoch-dir
    invariant — a later read/merge sampling that dir could silently drop
    the evolved column."""
    before = read_final(mixed_schema_lake).to_pandas()
    assert before["tool_meta"].notna().sum() == 1

    cutoff = pa.scalar(
        before["ts"].quantile(0.3).to_datetime64(), pa.timestamp("us")
    )
    out = delete_where(mixed_schema_lake, lambda t: pc.less(t["ts"], cutoff))
    assert out["partitions_rewritten"] > 0

    # every part of the delete epoch carries ONE unified schema
    m = Lake(mixed_schema_lake).current_manifest()
    epoch_dir = {os.path.dirname(r) for r in m["files"].values()
                 if f"epoch-{m['epoch']}" in r}
    schemas = set()
    for rel in m["files"].values():
        if f"epoch-{m['epoch']}" in rel:
            schemas.add(tuple(pq.read_schema(
                os.path.join(mixed_schema_lake, rel)).names))
    assert len(schemas) == 1 and epoch_dir
    assert "tool_meta" in next(iter(schemas))

    after = read_final(mixed_schema_lake).to_pandas()
    assert "tool_meta" in after.columns
    assert after["tool_meta"].notna().sum() == 1  # evolved row survived


def test_vacuum_respects_writer_lock(mixed_schema_lake):
    """Review finding: vacuum walked parts/ without the writer lock and
    could delete a concurrent apply's staged exchange files mid-epoch."""
    lake = Lake(mixed_schema_lake)
    with lake.writer_lock():
        with pytest.raises(ConcurrentWriterError):
            lake.vacuum(keep_manifests=1)
    assert isinstance(lake.vacuum(keep_manifests=1), list)  # lock released


def test_partitioning_adopted_from_manifest(tmp_path):
    """Review finding: a writer with different num_partitions/turn_bucket
    silently routed updates of existing keys to the wrong partition. The
    manifest's persisted partitioning must win."""
    spec = ChangelogSpec(n_events=5_000, n_convs=150, n_segments=4, seed=43)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    segs = list_segments(binlog)
    lake_root = str(tmp_path / "lake")
    head = tmp_path / "head"
    head.mkdir()
    for s in segs[:2]:
        shutil.copy(s, head / os.path.basename(s))
    apply_changelog(lake_root, str(head), EngineConfig(num_partitions=4, turn_bucket=8))

    # second writer with DIFFERENT knobs applies the tail
    apply_changelog(lake_root, binlog, EngineConfig(num_partitions=32, turn_bucket=512))
    m = Lake(lake_root).current_manifest()
    assert m["partitioning"] == {"num_partitions": 4, "turn_bucket": 8}  # adopted

    got = final_table(lake_root)
    want = expected_final_state(binlog)
    assert got.num_rows == want.num_rows  # no duplicate keys
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_jsonl_key_appearing_mid_file_is_preserved(tmp_path):
    """Review finding: deriving the JSONL schema from the first line only
    dropped columns that first appear later in the file."""
    base = {
        "conv_id": "conv-1", "turn_idx": 0, "role": "user", "text": "hi",
        "tool": "", "ts": "2024-01-01T00:00:00", "op": "insert", "lsn": 0,
    }
    evolved = dict(base, turn_idx=1, lsn=1, op="insert", tool_meta='{"calls":2}')
    binlog = tmp_path / "binlog"
    binlog.mkdir()
    with open(binlog / "seg-00000.jsonl", "w") as f:
        f.write(json.dumps(base) + "\n")
        f.write(json.dumps(evolved))  # NB: no trailing newline (count check)

    lake_root = str(tmp_path / "lake")
    out = apply_changelog(lake_root, str(binlog), EngineConfig(num_partitions=4))
    assert out["raw_events"] == 2  # no trailing-newline undercount
    got = final_table(lake_root)
    assert "tool_meta" in got.column_names
    import pandas as pd

    df = got.to_pandas().set_index("turn_idx")
    assert df.loc[1, "tool_meta"] == '{"calls":2}'
    assert pd.isna(df.loc[0, "tool_meta"])


def test_export_rewrites_when_lake_advances(tmp_path):
    """Review finding: a resumed export against a LATER epoch skipped stale
    files yet stamped _SUCCESS with the new epoch."""
    spec = ChangelogSpec(n_events=5_000, n_convs=150, n_segments=4, seed=47)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    segs = list_segments(binlog)
    lake_root = str(tmp_path / "lake")
    head = tmp_path / "head"
    head.mkdir()
    for s in segs[:2]:
        shutil.copy(s, head / os.path.basename(s))
    apply_changelog(lake_root, str(head), CFG)

    out_dir = str(tmp_path / "export")
    first = export_snapshot(lake_root, out_dir)
    assert first["written"] == first["partitions"]

    apply_changelog(lake_root, binlog, CFG)  # the lake advances an epoch
    second = export_snapshot(lake_root, out_dir)  # no --force needed
    assert second["written"] == second["partitions"]  # stale parts rewritten
    assert second["skipped"] == 0

    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"select count(*) from read_parquet('{out_dir}/part-*.parquet')"
    ).fetchone()[0]
    con.close()
    assert n == expected_final_state(binlog).num_rows


def test_export_crash_during_forced_rewrite_cannot_mix_epochs(tmp_path, monkeypatch):
    """Review finding (2nd pass): the epoch marker was written before stale
    parts were rewritten, so a crash mid-force let the next resume skip
    old-epoch files as current. Stale parts must be GONE before the marker
    lands, and _SUCCESS must never survive an in-progress export."""
    spec = ChangelogSpec(n_events=5_000, n_convs=150, n_segments=4, seed=53)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    segs = list_segments(binlog)
    lake_root = str(tmp_path / "lake")
    head = tmp_path / "head"
    head.mkdir()
    for s in segs[:2]:
        shutil.copy(s, head / os.path.basename(s))
    apply_changelog(lake_root, str(head), CFG)
    out_dir = str(tmp_path / "export")
    export_snapshot(lake_root, out_dir)
    apply_changelog(lake_root, binlog, CFG)  # lake advances an epoch

    # crash during the forced rewrite, in the window AFTER the marker lands
    # and BEFORE any part is copied (the state the old code mislabeled)
    import nostr_data_pipeline_ray.pipelines.cdc as cdc_mod

    def boom(*a, **k):
        raise RuntimeError("crash mid-export")

    monkeypatch.setattr(cdc_mod.rd, "from_items", boom)
    with pytest.raises(RuntimeError):
        export_snapshot(lake_root, out_dir)
    monkeypatch.undo()

    # post-crash: stale old-epoch parts already purged, nothing mislabeled
    names = os.listdir(out_dir)
    assert not any(n.endswith(".parquet") for n in names)
    assert "_SUCCESS" not in names

    # plain resume completes against the current epoch only
    out = export_snapshot(lake_root, out_dir)
    assert out["written"] == out["partitions"]
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"select count(*) from read_parquet('{out_dir}/part-*.parquet')"
    ).fetchone()[0]
    con.close()
    assert n == expected_final_state(binlog).num_rows


def test_legacy_manifest_without_turn_bound_stays_probe_all(tmp_path):
    """Review finding (2nd pass): an epoch over a legacy lake (manifest
    predating max_turn_idx) collapsed the unknown bound into the max of
    only its touched partitions — reintroducing silent point-lookup
    truncation for every pre-upgrade lake. Unknown must stay unknown until
    compact() re-establishes it authoritatively."""
    from nostr_data_pipeline_ray.pipelines.cdc import compact

    binlog = tmp_path / "binlog"
    binlog.mkdir()
    turns = [0, 7000]
    t = pa.table(
        {
            "conv_id": pa.array(["conv-long"] * 2),
            "turn_idx": pa.array(turns, pa.int32()),
            "role": pa.array(["user"] * 2),
            "text": pa.array(["a", "b"]),
            "tool": pa.array([""] * 2),
            "ts": pa.array([10**15, 10**15 + 1], pa.timestamp("us")),
            "op": pa.array(["insert"] * 2),
            "lsn": pa.array([0, 1], pa.int64()),
        }
    )
    pq.write_table(t, binlog / "seg-00000.parquet")
    lake_root = str(tmp_path / "lake")
    cfg = EngineConfig(num_partitions=8, turn_bucket=16)
    apply_changelog(lake_root, str(binlog), cfg)

    # simulate a pre-upgrade lake: strip the recorded bound
    lake = Lake(lake_root)
    m = lake.current_manifest()
    rel = os.path.join("manifests", f"epoch-{m['epoch']}.json")
    del m["max_turn_idx"]
    with open(os.path.join(lake_root, rel), "w") as f:
        json.dump(m, f)

    # a tiny epoch touching only a LOW-turn conversation
    tail = tmp_path / "tail"
    tail.mkdir()
    low = pa.table(
        {
            "conv_id": pa.array(["conv-low"]),
            "turn_idx": pa.array([1], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["x"]),
            "tool": pa.array([""]),
            "ts": pa.array([10**15 + 2], pa.timestamp("us")),
            "op": pa.array(["insert"]),
            "lsn": pa.array([2], pa.int64()),
        }
    )
    pq.write_table(low, tail / "seg-00001.parquet")
    apply_changelog(lake_root, str(tail), cfg)

    m2 = Lake(lake_root).current_manifest()
    assert "max_turn_idx" not in m2  # unknown stayed unknown
    got = read_conversation(lake_root, "conv-long")  # probe-all fallback
    assert got["turn_idx"].to_pylist() == turns  # turn 7000 not truncated

    compact(lake_root)  # sees every row → authoritative bound
    m3 = Lake(lake_root).current_manifest()
    assert m3["max_turn_idx"] == 7000
    got = read_conversation(lake_root, "conv-long")
    assert got["turn_idx"].to_pylist() == turns


def test_point_lookup_beyond_4096_turns(tmp_path):
    """Review finding: conversation_pkeys capped probing at turn 4096 and
    silently truncated longer conversations. The manifest now tracks the
    lake's true max turn_idx as the probe budget."""
    binlog = tmp_path / "binlog"
    binlog.mkdir()
    turns = [0, 100, 5000, 9000]
    t = pa.table(
        {
            "conv_id": pa.array(["conv-long"] * len(turns)),
            "turn_idx": pa.array(turns, pa.int32()),
            "role": pa.array(["user"] * len(turns)),
            "text": pa.array([f"turn {x}" for x in turns]),
            "tool": pa.array([""] * len(turns)),
            "ts": pa.array([10**15 + i for i in range(len(turns))], pa.timestamp("us")),
            "op": pa.array(["insert"] * len(turns)),
            "lsn": pa.array(range(len(turns)), pa.int64()),
        }
    )
    pq.write_table(t, binlog / "seg-00000.parquet")
    lake_root = str(tmp_path / "lake")
    apply_changelog(lake_root, str(binlog), EngineConfig(num_partitions=8, turn_bucket=16))
    assert Lake(lake_root).current_manifest()["max_turn_idx"] == 9000

    got = read_conversation(lake_root, "conv-long")
    assert got["turn_idx"].to_pylist() == turns  # nothing silently missing


def test_near_dup_zero_candidates_keeps_schema(tmp_path):
    """A corpus with no LSH collisions must still yield the typed
    (doc_a, doc_b, jaccard) / (vec_a, vec_b, score) schema — round-3 review
    found the empty path returned a schema-less dataset."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.dedup import (
        q_embedding_near_dup_lsh,
        q_minhash_near_dup,
    )

    rng = np.random.default_rng(5)
    docs = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(
                [
                    " ".join(rng.permutation([f"w{i}{j}" for j in range(30)]))
                    for i in range(40)
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    def cols(res):
        # a Dataset keeps its schema even at 0 rows; the zero-candidate
        # early path returns a typed pandas frame directly (Ray's
        # to_pandas drops columns on block-less datasets)
        if hasattr(res, "schema") and not isinstance(res, pa.Table):
            return res.schema().names, res.count()
        return list(res.columns), len(res)

    names, n = cols(q_minhash_near_dup(str(tmp_path)))
    assert names == ["doc_a", "doc_b", "jaccard"] and n == 0

    emb = rng.standard_normal((16, 8))
    pq.write_table(
        pa.table({"vec_id": pa.array(range(16), pa.int64()),
                  "embedding": pa.array(list(emb))}),
        str(tmp_path / "embeddings.parquet"),
    )
    names, n = cols(q_embedding_near_dup_lsh(str(tmp_path), threshold=0.9999))
    assert names == ["vec_a", "vec_b", "score"] and n == 0


def test_network_stats_handles_empty_blocks_and_odd_types(tmp_path):
    """Empty Ray blocks must not crash the partial pass; comma-bearing and
    NULL event types must count like the oracle's count(DISTINCT)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.analytics import ORACLE, q_network_stats

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "event_type": pa.array(["a,b", None, "c"]),
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(['{"k": 1}'] * 3),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))  # 1-row-per-block read
    got = q_network_stats(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(ORACLE["network_stats"]).fetch_df()
    con.close()
    assert int(got["n_event_types"][0]) == int(want["n_event_types"][0]) == 2
    assert int(got["total_events"][0]) == 3


def test_compact_report_handles_nan():
    from nostr_data_pipeline_ray.report import _compact

    assert _compact(float("nan")) == "—"
    assert _compact(float("inf")) == "—"
    assert _compact(12934) == "12.9K"


def test_network_stats_empty_events_matches_oracle(tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.analytics import ORACLE, q_network_stats

    t = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = q_network_stats(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(ORACLE["network_stats"]).fetch_df()
    con.close()
    assert int(got["total_events"][0]) == int(want["total_events"][0]) == 0
    assert int(got["n_users"][0]) == 0 and got["first_ts"].isna().all()


def test_ivm_view_detects_rebuilt_lake(tmp_path):
    """A lake rebuilt in place reuses epoch numbers; the view must detect
    the new build (manifest commit anchor) and fully refresh, never serving
    the previous build's aggregates."""
    import shutil

    from nostr_data_pipeline_ray.config import EngineConfig
    from nostr_data_pipeline_ray.pipelines.cdc import apply_changelog
    from nostr_data_pipeline_ray.pipelines.ivm import (
        read_turn_counts,
        refresh_turn_counts,
    )
    from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog

    cfg = EngineConfig(num_partitions=4, turn_bucket=16, epoch_segments=4)
    b1 = generate_changelog(
        str(tmp_path / "s1"),
        ChangelogSpec(n_events=1_500, n_convs=60, n_segments=3, seed=1),
    )
    b2 = generate_changelog(
        str(tmp_path / "s2"),
        ChangelogSpec(n_events=1_500, n_convs=90, n_segments=3, seed=2),
    )
    lake, view = str(tmp_path / "lake"), str(tmp_path / "view")
    apply_changelog(lake, b1, cfg)
    refresh_turn_counts(view, lake)
    n1 = read_turn_counts(view).count()
    # rebuild the lake in place from a DIFFERENT stream (same epoch numbers)
    shutil.rmtree(lake)
    apply_changelog(lake, b2, cfg)
    out = refresh_turn_counts(view, lake)
    assert out["refreshed"] > 0  # NOT treated as current
    n2 = read_turn_counts(view).count()
    assert n2 == 90 and n1 == 60
