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

    # each sink is itself a valid binlog: replicas reach identical state
    want = _final_sorted(lake)
    for s in sinks:
        replica = s + "-replica"
        apply_changelog(replica, s, CFG)
        got = _final_sorted(replica)
        assert got.select(want.column_names).cast(want.schema).equals(want)

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
        got = _final_sorted(replica)
        assert got.select(want.column_names).cast(want.schema).equals(want)
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
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    rows = [
        {"conv_id": "c-1", "turn_idx": 0, "role": "user", "text": "hello",
         "tool": "", "ts": 1000, "lsn": 1, "op": "insert"},
        {"conv_id": "c-1", "turn_idx": 1, "role": "assistant", "text": "hi",
         "tool": "", "ts": 1001, "lsn": 2, "op": "insert"},
        {"conv_id": "c-1", "turn_idx": 1, "role": "assistant", "text": "hi!",
         "tool": "", "ts": 1002, "lsn": 3, "op": "update"},
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
    assert published == ["seg-00000.parquet"]  # normalized, basename kept

    replica = str(tmp_path / "replica")
    apply_changelog(replica, sink, CFG)
    want = _final_sorted(lake)
    got = _final_sorted(replica)
    assert got.select(want.column_names).cast(want.schema).equals(want)
    assert want.num_rows == 2  # the update won via LWW on both sides


def test_table_fingerprint_detects_divergence(tmp_path, ray_session):
    import ray.data as rd

    a = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    b = rd.from_arrow(pa.table({"k": [3, 1, 2], "v": ["c", "a", "b"]}))
    c = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": ["a", "b", "X"]}))
    fa, fb, fc = (table_fingerprint(d) for d in (a, b, c))
    assert fa == fb  # order-independent
    assert fa != fc  # content-sensitive
