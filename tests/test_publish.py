"""Publish-back sink (S6): applied changelog segments fan out to N sink
dirs as canonical Parquet; a downstream replica replaying a sink reaches
the publisher's exact final state (deletes included). Per-sink failure
isolation and exactly-once republish mirror RelayPool.publish_to_all
(reference relay_client.py:298-314)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    final_table,
)
from nostr_data_pipeline_ray.pipelines.publish import (
    publish_changelog,
    table_fingerprint,
)
from nostr_data_pipeline_ray.synth import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)

CFG = EngineConfig(num_partitions=8, turn_bucket=16, epoch_segments=3)


@pytest.fixture(scope="module")
def binlog(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_publish")
    spec = ChangelogSpec(n_events=8_000, n_convs=250, n_segments=6, seed=23,
                         evolve=True)
    return generate_changelog(str(out), spec)


def _final_sorted(lake: str) -> pa.Table:
    t = final_table(lake)
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_publish_roundtrip_two_sinks(tmp_path, ray_session, binlog):
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, CFG)
    sinks = [str(tmp_path / "sink-a"), str(tmp_path / "sink-b")]

    out = publish_changelog(lake, binlog, sinks)
    assert out["pending_upstream"] == 0
    for s in sinks:
        assert out["sinks"][s]["ok"] and out["sinks"][s]["published"] == 6

    # each sink is itself a valid binlog: replicas reach identical state —
    # schema INCLUDED (no cast: type divergence must fail, not be masked)
    want = _final_sorted(lake)
    for s in sinks:
        replica = s + "-replica"
        apply_changelog(replica, s, CFG)
        got = _final_sorted(replica).select(want.column_names)
        assert got.schema.equals(want.schema)
        assert got.equals(want)

    # ... which is also the oracle state (deletes really applied downstream)
    oracle = expected_final_state(binlog)
    got = _final_sorted(sinks[0] + "-replica")
    assert got.select(oracle.column_names).cast(oracle.schema).equals(oracle)


def test_publish_is_exactly_once_and_incremental(tmp_path, ray_session, binlog):
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, CFG)
    sink = str(tmp_path / "sink")

    first = publish_changelog(lake, binlog, [sink])["sinks"][sink]
    assert first["published"] == 6
    again = publish_changelog(lake, binlog, [sink])["sinks"][sink]
    assert again["published"] == 0 and again["total"] == 6

    # a new upstream segment is forwarded only AFTER the lake applies it
    seg0 = sorted(f for f in os.listdir(binlog) if f.endswith(".parquet"))[0]
    extra = pq.read_table(os.path.join(binlog, seg0))
    tmp = str(tmp_path / "seg-99999.parquet")
    pq.write_table(extra, tmp)
    os.replace(tmp, os.path.join(binlog, "seg-99999.parquet"))
    try:
        held = publish_changelog(lake, binlog, [sink])
        assert held["pending_upstream"] == 1
        assert held["sinks"][sink]["published"] == 0

        apply_changelog(lake, binlog, CFG)
        after = publish_changelog(lake, binlog, [sink])
        assert after["pending_upstream"] == 0
        assert after["sinks"][sink]["published"] == 1
        # replica still converges to the publisher's state
        replica = str(tmp_path / "replica")
        apply_changelog(replica, sink, CFG)
        want = _final_sorted(lake)
        got = _final_sorted(replica).select(want.column_names)
        assert got.schema.equals(want.schema) and got.equals(want)
    finally:
        os.remove(os.path.join(binlog, "seg-99999.parquet"))


def test_publish_sink_failure_is_isolated(tmp_path, ray_session, binlog):
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, CFG)
    good = str(tmp_path / "good")
    bad = str(tmp_path / "bad")
    with open(bad, "w") as f:  # a FILE where a dir is needed
        f.write("not a directory")

    out = publish_changelog(lake, binlog, [bad, good])
    assert out["sinks"][bad]["ok"] is False and "error" in out["sinks"][bad]
    assert out["sinks"][good]["ok"] and out["sinks"][good]["published"] == 6


def test_publish_normalizes_jsonl_to_parquet(tmp_path, ray_session):
    """JSONL forwarding must carry the APPLY path's typing contract
    (cdc._segment_schema: known keys get changelog types, evolved extras
    are additive STRING columns) and be exactly-once despite the
    .jsonl→.parquet basename swap — both were real bugs."""
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    rows = [
        {"conv_id": "c-1", "turn_idx": 0, "role": "user", "text": "hello",
         "tool": "", "ts": 1000, "lsn": 1, "op": "insert"},
        {"conv_id": "c-1", "turn_idx": 1, "role": "assistant", "text": "hi",
         "tool": "", "ts": 1001, "lsn": 2, "op": "insert"},
        # evolved NUMERIC extra: publisher stores it as string "5" —
        # the published parquet must carry the same type, not int64
        {"conv_id": "c-1", "turn_idx": 1, "role": "assistant", "text": "hi!",
         "tool": "", "ts": 1002, "lsn": 3, "op": "update", "score": 5},
    ]
    with open(os.path.join(binlog, "seg-00000.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, CFG)

    sink = str(tmp_path / "sink")
    out = publish_changelog(lake, binlog, [sink])
    assert out["sinks"][sink]["published"] == 1
    published = [f for f in os.listdir(sink) if not f.startswith("_")]
    # normalized; .parquet APPENDED (never swapped) so a parquet segment
    # sharing the stem can never be overwritten at the sink
    assert published == ["seg-00000.jsonl.parquet"]

    # exactly-once across the extension swap: republish is a no-op twice
    for _ in range(2):
        again = publish_changelog(lake, binlog, [sink])["sinks"][sink]
        assert again["published"] == 0 and again["total"] == 1

    replica = str(tmp_path / "replica")
    apply_changelog(replica, sink, CFG)
    want = _final_sorted(lake)
    got = _final_sorted(replica).select(want.column_names)
    assert got.schema.equals(want.schema)  # no cast: types must MATCH
    assert got.equals(want)
    assert want.num_rows == 2  # the update won via LWW on both sides
    srow = want.to_pylist()[-1]
    assert srow["score"] == "5"  # evolved extras are strings on BOTH sides


def test_publish_partial_sink_failure_keeps_progress(
    tmp_path, ray_session, binlog
):
    """One segment failing inside a sink marks the sink ok=False but the
    segments that DID land stay in the watermark — the retry forwards
    only the remainder."""
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, CFG)
    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    seg0 = sorted(f for f in os.listdir(binlog) if f.endswith(".parquet"))[0]
    os.makedirs(os.path.join(sink, seg0))  # a DIR where the dst file goes

    out = publish_changelog(lake, binlog, [sink])["sinks"][sink]
    assert out["ok"] is False and out["failed"] == 1
    assert out["published"] == 5 and out["total"] == 5

    os.rmdir(os.path.join(sink, seg0))  # the sink recovers
    out = publish_changelog(lake, binlog, [sink])["sinks"][sink]
    assert out["ok"] and out["published"] == 1 and out["total"] == 6


def test_publish_orphan_staged_files_are_swept(tmp_path, ray_session, binlog):
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, CFG)
    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    orphan = os.path.join(sink, "seg-00000.parquet.staged-99999")
    with open(orphan, "w") as f:  # a crashed prior publish's leftovers
        f.write("torn bytes")

    out = publish_changelog(lake, binlog, [sink])["sinks"][sink]
    assert out["ok"] and out["published"] == 6
    assert not os.path.exists(orphan)
    assert not [f for f in os.listdir(sink) if ".staged-" in f]


def test_publish_duplicate_basenames_forward_once(tmp_path, ray_session):
    """The lake keys applied-ness by basename; a basename present in two
    source dirs is the same logical segment and must be forwarded once,
    not clobbered twice with double-counted stats."""
    import shutil

    dir_a = str(tmp_path / "a")
    spec = ChangelogSpec(n_events=2_000, n_convs=100, n_segments=2, seed=7)
    binlog_a = generate_changelog(dir_a, spec)
    dir_b = str(tmp_path / "b")
    shutil.copytree(binlog_a, dir_b)
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog_a, CFG)

    sink = str(tmp_path / "sink")
    out = publish_changelog(lake, [binlog_a, dir_b], [sink])
    assert out["applied"] == 2 and out["pending_upstream"] == 0
    assert out["sinks"][sink]["published"] == 2
    segs = [f for f in os.listdir(sink) if f.endswith(".parquet")]
    assert len(segs) == 2


def test_publish_same_stem_parquet_and_jsonl_both_survive(
    tmp_path, ray_session
):
    """A Parquet segment and a JSONL segment sharing a stem are DISTINCT
    logical segments (the lake keys applied-ness by full basename) — both
    must land at the sink and the replica must converge to the
    publisher's state. Before the .parquet-APPEND naming both mapped to
    the same sink file: the last writer silently erased the other's
    events while the exactly-once marker recorded both as published."""
    dir_a = str(tmp_path / "binlog")
    spec = ChangelogSpec(n_events=2_000, n_convs=100, n_segments=2, seed=11)
    binlog = generate_changelog(dir_a, spec)
    rows = [
        {"conv_id": "zz-collide", "turn_idx": 0, "role": "user",
         "text": "stem twin", "tool": "", "ts": 99_000, "lsn": 10_000_000,
         "op": "insert"},
    ]
    # same stem as the generated seg-00000.parquet, different format
    with open(os.path.join(binlog, "seg-00000.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, CFG)

    sink = str(tmp_path / "sink")
    out = publish_changelog(lake, binlog, [sink])["sinks"][sink]
    assert out["ok"] and out["published"] == 3
    names = sorted(f for f in os.listdir(sink) if not f.startswith("_"))
    assert "seg-00000.parquet" in names
    assert "seg-00000.jsonl.parquet" in names

    replica = str(tmp_path / "replica")
    apply_changelog(replica, sink, CFG)
    want = _final_sorted(lake)
    got = _final_sorted(replica).select(want.column_names)
    assert got.schema.equals(want.schema) and got.equals(want)
    convs = set(want["conv_id"].to_pylist())
    assert "zz-collide" in convs  # the JSONL twin's events made it through


def test_publish_destination_collision_fails_loudly(tmp_path, ray_session):
    """Pathological pair x.jsonl + x.jsonl.parquet maps to ONE sink name
    even under append-naming: neither may publish (a silent overwrite
    plus a satisfied marker is permanent divergence) and the error must
    say why. Non-colliding segments still publish."""
    dir_a = str(tmp_path / "binlog")
    spec = ChangelogSpec(n_events=2_000, n_convs=100, n_segments=2, seed=13)
    binlog = generate_changelog(dir_a, spec)
    seg0 = sorted(f for f in os.listdir(binlog) if f.endswith(".parquet"))[0]
    import shutil

    # craft the collision: seg-00000.jsonl and seg-00000.jsonl.parquet
    shutil.copy(os.path.join(binlog, seg0),
                os.path.join(binlog, "seg-00000.jsonl.parquet"))
    with open(os.path.join(binlog, "seg-00000.jsonl"), "w") as f:
        f.write(json.dumps(
            {"conv_id": "zz-1", "turn_idx": 0, "role": "user", "text": "x",
             "tool": "", "ts": 99_000, "lsn": 10_000_001, "op": "insert"}
        ) + "\n")
    lake = str(tmp_path / "lake")
    apply_changelog(lake, binlog, CFG)

    sink = str(tmp_path / "sink")
    out = publish_changelog(lake, binlog, [sink])["sinks"][sink]
    assert out["ok"] is False and out["failed"] == 2
    assert "destination collision" in out["error"]
    assert out["published"] == 2  # the two generated segments still landed
    assert not os.path.exists(os.path.join(sink, "seg-00000.jsonl.parquet"))
    # neither collider entered the marker: a retry still reports them
    again = publish_changelog(lake, binlog, [sink])["sinks"][sink]
    assert again["failed"] == 2 and again["published"] == 0


def test_publish_refuses_missing_lake(tmp_path, ray_session, binlog):
    with pytest.raises(FileNotFoundError, match="no committed lake"):
        publish_changelog(str(tmp_path / "lak3"), binlog,
                          [str(tmp_path / "sink")])
    assert not os.path.exists(str(tmp_path / "lak3"))  # nothing created


def test_follow_publish_backlog_drains_on_idle_pass(
    tmp_path, ray_session, binlog
):
    """A sink that is dead during the apply pass must be retried on later
    IDLE passes (no new segments) — the on_pass hook, not on_epoch, owns
    the publish so the backlog drains as soon as the sink recovers."""
    from nostr_data_pipeline_ray.pipelines.cdc import follow_changelog

    lake = str(tmp_path / "lake")
    sink = str(tmp_path / "sink")
    with open(sink, "w") as f:  # dead sink: a FILE blocks mkdir
        f.write("x")

    state = {"passes": 0, "results": []}

    def on_pass(_r):
        state["passes"] += 1
        if state["passes"] == 2:  # the sink recovers between passes
            os.remove(sink)
        out = publish_changelog(lake, binlog, [sink])
        state["results"].append(out["sinks"][sink])

    follow_changelog(lake, binlog, CFG, poll_interval=0.05,
                     idle_timeout=1.0, on_pass=on_pass)
    assert state["results"][0]["ok"] is False  # pass 1: sink dead
    drained = [r for r in state["results"][1:] if r.get("published")]
    assert drained and drained[0]["published"] == 6  # idle pass drained it
    assert state["results"][-1]["published"] == 0  # then steady no-op


def test_table_fingerprint_detects_divergence(tmp_path, ray_session):
    import ray.data as rd

    a = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    b = rd.from_arrow(pa.table({"k": [3, 1, 2], "v": ["c", "a", "b"]}))
    c = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": ["a", "b", "X"]}))
    fa, fb, fc = (table_fingerprint(d) for d in (a, b, c))
    assert fa == fb  # order-independent
    assert fa != fc  # content-sensitive
