"""curate --from-lake: the CDC lake feeds the training-data curation chain
end to end — binlog → lake → one document per conversation → dedup /
decontaminate / quality-cut / pack — with planted near-dups and a planted
benchmark 5-gram overlap so every chain stage is observably live."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.model import CHANGELOG_SCHEMA
from nostr_data_pipeline_ray.pipelines.cdc import apply_changelog
from nostr_data_pipeline_ray.pipelines.dedup import _BENCHMARK_MAX_DOC_ID
from nostr_data_pipeline_ray.pipelines.lake_docs import (
    curate_from_lake,
    export_documents,
)

# vocabulary pools: every ordinary conversation draws from its own disjoint
# word set so no accidental near-dup edges or benchmark-gram overlaps exist
_BENCH_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_CONTAM_TEXT = "my reply quotes alpha beta gamma delta epsilon verbatim today"
_DUP_A = "the quick brown fox jumps over the lazy dog again and again today"
_DUP_B = "the quick brown fox jumps over the lazy dog again and again now"


def _write_binlog(path: str, n_plain: int = 12) -> None:
    """One LSN-ordered segment: 2 near-dup convs, 1 contaminated conv, and
    n_plain mutually-dissimilar convs, each with 2-3 turns."""
    rng = np.random.default_rng(7)
    rows = []  # (conv_id, turn_idx, role, text)

    def conv(cid, texts):
        for i, t in enumerate(texts):
            rows.append((cid, i, "user" if i % 2 == 0 else "assistant", t))

    conv("dup-a", [_DUP_A, "sure thing partner"])
    conv("dup-b", [_DUP_B, "sure thing partner"])
    conv("contam", [_CONTAM_TEXT, "understood noted archived"])
    for k in range(n_plain):
        words = [f"w{k}x{j}" for j in rng.integers(0, 40, size=14)]
        conv(f"plain-{k:02d}", [" ".join(words[:7]), " ".join(words[7:])])

    n = len(rows)
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)], pa.timestamp("us")),
            "op": pa.array(["insert"] * n, pa.string()),
            "lsn": pa.array(list(range(1, n + 1)), pa.int64()),
        },
        schema=CHANGELOG_SCHEMA,
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(t, os.path.join(path, "seg-00000.parquet"))


def _write_benchmark(path: str) -> None:
    """A documents table whose doc_id < cutoff rows are the held-out set.
    Doc 0 carries the planted 5-gram the contaminated conversation quotes."""
    n = _BENCHMARK_MAX_DOC_ID
    texts = [_BENCH_TEXT] + [
        " ".join(f"bench{d}word{j}" for j in range(8)) for d in range(1, n)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["benchmark"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        path,
    )


@pytest.fixture(scope="module")
def lake(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("fromlake")
    binlog = str(root / "binlog")
    _write_binlog(binlog)
    lake_root = str(root / "lake")
    apply_changelog(lake_root, binlog, EngineConfig(num_partitions=4))
    bench = str(root / "benchmark.parquet")
    _write_benchmark(bench)
    return {"lake": lake_root, "bench": bench, "root": root}


def test_export_documents_shape_and_determinism(lake, tmp_path):
    sf = export_documents(lake["lake"], str(tmp_path / "exp1"))
    t = pq.read_table(os.path.join(sf, "documents.parquet"))
    assert t.num_rows == 15  # 12 plain + dup-a + dup-b + contam
    df = t.to_pandas().set_index("conv_id").sort_index()
    assert (df["doc_id"] >= _BENCHMARK_MAX_DOC_ID).all()
    assert df["doc_id"].is_unique
    assert (df["source"] == "lake").all()
    # turns folded in order with role prefixes
    assert df.loc["dup-a", "text"] == f"user: {_DUP_A}\nassistant: sure thing partner"
    assert (df["n_chars"] == df["text"].str.len()).all()
    assert (df["lang"] == "en").all()

    # re-export (fresh dir) assigns identical doc_ids: hash-keyed, no RNG
    sf2 = export_documents(lake["lake"], str(tmp_path / "exp2"))
    t2 = pq.read_table(os.path.join(sf2, "documents.parquet"))
    a = t.to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = t2.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert a.equals(b)


def test_export_splices_benchmark(lake, tmp_path):
    sf = export_documents(lake["lake"], str(tmp_path / "expb"), benchmark=lake["bench"])
    t = pq.read_table(os.path.join(sf, "documents.parquet"))
    assert t.num_rows == 15 + _BENCHMARK_MAX_DOC_ID
    ids = t["doc_id"].to_pylist()
    assert sorted(i for i in ids if i < _BENCHMARK_MAX_DOC_ID) == list(
        range(_BENCHMARK_MAX_DOC_ID)
    )


def test_curate_from_lake_every_stage_live(lake, tmp_path):
    out = str(tmp_path / "curated")
    summary = curate_from_lake(
        lake["lake"], out, benchmark=lake["bench"], budget=64, jsonl=True
    )

    n = summary["exported_docs"]
    assert n == 15 + _BENCHMARK_MAX_DOC_ID
    # stage 1: exactly one of the planted near-dup pair dropped
    assert summary["after_dedup"] == n - 1
    # stage 2: benchmark docs excluded by id, contaminated conv by 5-gram
    assert summary["after_decontam"] == summary["after_dedup"] - _BENCHMARK_MAX_DOC_ID - 1
    # stage 3: p75 cut keeps a strict subset
    assert 0 < summary["after_quality"] <= summary["after_decontam"]
    assert summary["curated_docs"] == summary["after_quality"]

    curated = pq.read_table(os.path.join(out, "curated.parquet")).to_pandas()
    assert len(curated) == summary["curated_docs"]
    assert (curated["doc_id"] >= _BENCHMARK_MAX_DOC_ID).all()
    assert (curated["source"] == "lake").all()
    # the contaminated conversation's text never reaches the corpus
    assert not curated["text"].str.contains("alpha beta gamma delta epsilon").any()
    # at most one member of the near-dup pair survives
    assert curated["text"].str.contains("quick brown fox").sum() <= 1

    packs = pq.read_table(os.path.join(out, "packs.parquet"))
    assert packs.num_rows == summary["curated_docs"]
    assert summary["packs"] >= 1

    # --jsonl sink: newline-delimited JSON, one record per curated doc
    import json as _json

    jdir = os.path.join(out, "curated.jsonl")
    lines = []
    for f in sorted(os.listdir(jdir)):
        with open(os.path.join(jdir, f)) as fh:
            lines.extend(_json.loads(ln) for ln in fh if ln.strip())
    assert len(lines) == summary["curated_docs"]
    assert {r["doc_id"] for r in lines} == set(curated["doc_id"])


def test_curate_from_lake_without_benchmark_is_decontam_noop(lake, tmp_path):
    out = str(tmp_path / "curated_nb")
    summary = curate_from_lake(lake["lake"], out, budget=64)
    assert summary["exported_docs"] == 15
    # no benchmark spliced in → nothing flagged, nothing below the cutoff
    assert summary["after_decontam"] == summary["after_dedup"]


def _seg_table(rows, lsn0):
    n = len(rows)
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array(
                [1_700_000_000_000_000 + lsn0 + i for i in range(n)],
                pa.timestamp("us"),
            ),
            "op": pa.array(["insert"] * n, pa.string()),
            "lsn": pa.array(list(range(lsn0, lsn0 + n)), pa.int64()),
        },
        schema=CHANGELOG_SCHEMA,
    )


def _pad_turn(text, n=260):
    return text + " " + "pad" * ((n - len(text)) // 3)


def test_incremental_curation_off_lake_watermarks(tmp_path, ray_session):
    """VERDICT r4 ask #8 — the loop closed: two lake epochs drive two
    exactly-once incremental-curator epochs keyed on the lake's manifest
    epoch; only conversations whose partition watermarks moved are read,
    newly ARRIVED conversations are curated, an UPDATED conversation keeps
    its first curated version (strict FWW), and a re-run against an
    unchanged lake is a no-op."""
    from nostr_data_pipeline_ray.pipelines.lake_docs import (
        curate_epoch_from_lake,
    )

    binlog = str(tmp_path / "binlog")
    lake_root = str(tmp_path / "lake")
    os.makedirs(binlog)
    bench = str(tmp_path / "benchmark.parquet")
    _write_benchmark(bench)

    rows0 = []
    for k in range(8):
        rows0.append((f"base-{k}", 0, "user",
                      _pad_turn(" ".join(f"b{k}w{j}" for j in range(10)))))
        rows0.append((f"base-{k}", 1, "assistant",
                      _pad_turn(" ".join(f"b{k}r{j}" for j in range(10)))))
    pq.write_table(_seg_table(rows0, 1), os.path.join(binlog, "seg-00000.parquet"))
    cfg = EngineConfig(num_partitions=4)
    apply_changelog(lake_root, binlog, cfg)

    cur_root = str(tmp_path / "cur")
    out0 = curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)
    assert out0["applied"] and out0["new_docs"] == 8
    assert out0["curated"] == 8  # distinct, clean, equal-ish lengths
    lake_epoch0 = out0["lake_epoch"]

    # unchanged lake → no-op (exactly-once on the lake's manifest epoch)
    again = curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)
    assert again == {"applied": False,
                     "update_id": f"lake-epoch-{lake_epoch0}",
                     "lake_epoch": lake_epoch0}

    # lake epoch 2: two NEW conversations + an UPDATE to base-0's turn 0
    rows1 = [
        ("new-0", 0, "user",
         _pad_turn(" ".join(f"n0w{j}" for j in range(10)), 250)),
        ("new-0", 1, "assistant",
         _pad_turn(" ".join(f"n0r{j}" for j in range(10)), 250)),
        ("new-1", 0, "user",
         _pad_turn(" ".join(f"n1w{j}" for j in range(10)), 250)),
        ("new-1", 1, "assistant",
         _pad_turn(" ".join(f"n1r{j}" for j in range(10)), 250)),
        ("base-0", 0, "user",
         _pad_turn(" ".join(f"b0EDIT{j}" for j in range(10)))),
    ]
    pq.write_table(_seg_table(rows1, 100), os.path.join(binlog, "seg-00001.parquet"))
    apply_changelog(lake_root, binlog, cfg)  # resume applies only seg 1

    out1 = curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)
    assert out1["applied"] and out1["lake_epoch"] > lake_epoch0
    # base-0 changed but is already indexed → filtered by the FWW anti-join
    assert out1["new_docs"] == 2
    assert out1["dropped_dedup"] == 0
    assert out1["curated"] == 2

    from nostr_data_pipeline_ray.pipelines.curate_index import (
        IncrementalCurator,
    )

    cur = IncrementalCurator(cur_root, benchmark=bench)
    assert cur.meta["n_curated"] == 10
    assert cur.fsck()["ok"]
    # base-0's curated text is the FIRST applied version, not the edit
    from nostr_data_pipeline_ray.pipelines.lake_docs import (
        conversations_as_documents,
    )

    docs = conversations_as_documents(lake_root).to_pandas()
    b0_id = int(docs.loc[docs["conv_id"] == "base-0", "doc_id"].iloc[0])
    curated = cur.curated().to_pandas().set_index("doc_id")
    assert "b0EDIT" not in curated.loc[b0_id, "text"]
    assert "b0w0" in curated.loc[b0_id, "text"]

    # third run against the unchanged lake → no-op again
    out2 = curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)
    assert out2["applied"] is False


def test_lake_epoch_retry_after_crash_between_fold_and_commit(
    tmp_path, ray_session, monkeypatch
):
    """Exactly-once under the worst crash window: a run dies AFTER the
    near-dup index folds the epoch (update_id committed index-side) but
    BEFORE the curator commits it. The retry's seen-id filter must NOT
    treat the half-applied fold's docs as 'already seen' — that would
    commit an empty epoch and lose the conversations forever (strict FWW).
    row_files_excluding() carves the half-applied subdir out of the
    seen-set, so the retry curates the epoch's docs exactly once."""
    from nostr_data_pipeline_ray.pipelines.curate_index import (
        IncrementalCurator,
    )
    from nostr_data_pipeline_ray.pipelines.lake_docs import (
        curate_epoch_from_lake,
    )

    binlog = str(tmp_path / "binlog")
    lake_root = str(tmp_path / "lake")
    os.makedirs(binlog)
    bench = str(tmp_path / "benchmark.parquet")
    _write_benchmark(bench)

    rows0 = []
    for k in range(6):
        rows0.append((f"base-{k}", 0, "user",
                      _pad_turn(" ".join(f"b{k}w{j}" for j in range(10)))))
        rows0.append((f"base-{k}", 1, "assistant",
                      _pad_turn(" ".join(f"b{k}r{j}" for j in range(10)))))
    pq.write_table(_seg_table(rows0, 1), os.path.join(binlog, "seg-00000.parquet"))
    cfg = EngineConfig(num_partitions=4)
    apply_changelog(lake_root, binlog, cfg)

    cur_root = str(tmp_path / "cur")
    out0 = curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)
    assert out0["applied"] and out0["curated"] == 6

    rows1 = [
        ("new-0", 0, "user",
         _pad_turn(" ".join(f"n0w{j}" for j in range(10)), 250)),
        ("new-0", 1, "assistant",
         _pad_turn(" ".join(f"n0r{j}" for j in range(10)), 250)),
        ("new-1", 0, "user",
         _pad_turn(" ".join(f"n1w{j}" for j in range(10)), 250)),
        ("new-1", 1, "assistant",
         _pad_turn(" ".join(f"n1r{j}" for j in range(10)), 250)),
    ]
    pq.write_table(_seg_table(rows1, 100), os.path.join(binlog, "seg-00001.parquet"))
    apply_changelog(lake_root, binlog, cfg)

    # crash exactly between the index fold and the curator commit
    def boom(self, survivors, n_kept, update_id):
        raise RuntimeError("simulated crash before curator commit")

    with monkeypatch.context() as m:
        m.setattr(IncrementalCurator, "_commit_epoch", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)

    # half-applied: the index has the update, the curator does not
    cur = IncrementalCurator(cur_root, benchmark=bench)
    uid = [u for u in cur.idx.meta["applied_ids"] if u.startswith("lake-epoch-")][-1]
    assert uid not in cur.meta["applied_ids"]
    del cur

    # retry curates the epoch's docs — NOT an empty epoch
    out1 = curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)
    assert out1["applied"] and out1["update_id"] == uid
    assert out1["new_docs"] == 2
    assert out1["dropped_dedup"] == 0
    assert out1["curated"] == 2

    cur = IncrementalCurator(cur_root, benchmark=bench)
    assert cur.meta["n_curated"] == 8
    assert cur.fsck()["ok"]
    curated = cur.curated().to_pandas()
    assert len(curated) == 8 and curated["doc_id"].is_unique
    texts = " ".join(curated["text"])
    assert "n0w0" in texts and "n1w0" in texts

    # idempotent after recovery
    out2 = curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)
    assert out2["applied"] is False


def test_row_files_excluding_refuses_after_compact(tmp_path, ray_session):
    """Compaction folds subdirs together, destroying per-update
    attribution — excluding a half-applied update's rows is then
    impossible, and the index must refuse loudly instead of returning
    the unsafe full set."""
    import ray.data as rd

    from nostr_data_pipeline_ray.pipelines.dedup_index import MinHashIndex

    idx = MinHashIndex(str(tmp_path / "idx"))
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta gamma delta",
                                                 "epsilon zeta eta theta"]})
    )
    idx.bootstrap(docs, update_id="e1")
    assert idx.row_files_excluding("e1") == []  # only e1's subdir exists
    assert idx.row_files_excluding("never-applied") == idx._row_files()
    docs2 = rd.from_pandas(
        pd.DataFrame({"doc_id": [3], "text": ["iota kappa lambda mu"]})
    )
    idx.update(docs2, docs.union(docs2), update_id="e2")
    assert len(idx.row_files_excluding("e2")) < len(idx._row_files())
    idx.compact()
    with pytest.raises(ValueError, match="attribution is gone"):
        idx.row_files_excluding("e2")


def test_lake_epoch_crash_then_newer_epoch_still_recovers_docs(
    tmp_path, ray_session, monkeypatch
):
    """Harder crash window: the fold for lake epoch N commits index-side,
    the curator commit dies, and the lake then advances to epoch N+1
    BEFORE the next curate run. The retry runs under update_id
    'lake-epoch-N+1' — the orphaned 'lake-epoch-N' fold is never retried
    under its own name, so the seen-set must exclude EVERY half-applied
    update's rows (not just the current id) or epoch N's conversations
    are dropped as 'seen' and lost forever."""
    from nostr_data_pipeline_ray.pipelines.curate_index import (
        IncrementalCurator,
    )
    from nostr_data_pipeline_ray.pipelines.lake_docs import (
        curate_epoch_from_lake,
    )

    binlog = str(tmp_path / "binlog")
    lake_root = str(tmp_path / "lake")
    os.makedirs(binlog)
    bench = str(tmp_path / "benchmark.parquet")
    _write_benchmark(bench)

    rows0 = []
    for k in range(6):
        rows0.append((f"base-{k}", 0, "user",
                      _pad_turn(" ".join(f"b{k}w{j}" for j in range(10)))))
        rows0.append((f"base-{k}", 1, "assistant",
                      _pad_turn(" ".join(f"b{k}r{j}" for j in range(10)))))
    pq.write_table(_seg_table(rows0, 1), os.path.join(binlog, "seg-00000.parquet"))
    cfg = EngineConfig(num_partitions=4)
    apply_changelog(lake_root, binlog, cfg)

    cur_root = str(tmp_path / "cur")
    out0 = curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)
    assert out0["applied"] and out0["curated"] == 6

    # lake epoch N: two new conversations; curate run crashes mid-epoch
    rows1 = [
        ("new-0", 0, "user",
         _pad_turn(" ".join(f"n0w{j}" for j in range(10)), 250)),
        ("new-0", 1, "assistant",
         _pad_turn(" ".join(f"n0r{j}" for j in range(10)), 250)),
        ("new-1", 0, "user",
         _pad_turn(" ".join(f"n1w{j}" for j in range(10)), 250)),
        ("new-1", 1, "assistant",
         _pad_turn(" ".join(f"n1r{j}" for j in range(10)), 250)),
    ]
    pq.write_table(_seg_table(rows1, 100), os.path.join(binlog, "seg-00001.parquet"))
    apply_changelog(lake_root, binlog, cfg)

    def boom(self, survivors, n_kept, update_id):
        raise RuntimeError("simulated crash before curator commit")

    with monkeypatch.context() as m:
        m.setattr(IncrementalCurator, "_commit_epoch", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)

    cur = IncrementalCurator(cur_root, benchmark=bench)
    orphan = [u for u in cur.idx.meta["applied_ids"]
              if u.startswith("lake-epoch-")][-1]
    assert orphan not in cur.meta["applied_ids"]
    del cur

    # the lake advances to epoch N+1 BEFORE the retry
    rows2 = [
        ("new-2", 0, "user",
         _pad_turn(" ".join(f"n2w{j}" for j in range(10)), 250)),
        ("new-2", 1, "assistant",
         _pad_turn(" ".join(f"n2r{j}" for j in range(10)), 250)),
    ]
    pq.write_table(_seg_table(rows2, 200), os.path.join(binlog, "seg-00002.parquet"))
    apply_changelog(lake_root, binlog, cfg)

    # the retry (under the NEWER epoch's update_id) recovers epoch N's
    # conversations alongside epoch N+1's
    out = curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)
    assert out["applied"] and out["update_id"] != orphan
    assert out["new_docs"] == 3
    assert out["dropped_dedup"] == 0
    assert out["curated"] == 3

    cur = IncrementalCurator(cur_root, benchmark=bench)
    assert cur.meta["n_curated"] == 9
    assert cur.fsck()["ok"]
    curated = cur.curated().to_pandas()
    assert len(curated) == 9 and curated["doc_id"].is_unique
    texts = " ".join(curated["text"])
    for marker in ("n0w0", "n1w0", "n2w0"):
        assert marker in texts

    # recovered state is stable: another run is a no-op
    assert curate_epoch_from_lake(lake_root, cur_root, benchmark=bench)[
        "applied"] is False


def test_row_files_excluding_delete_updates_are_not_errors(tmp_path, ray_session):
    """A delete's update_id lands in applied_ids without a folded subdir —
    it must count as 'nothing to exclude', not as lost attribution."""
    import ray.data as rd

    from nostr_data_pipeline_ray.pipelines.dedup_index import MinHashIndex

    idx = MinHashIndex(str(tmp_path / "idx"))
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta gamma delta",
                                                 "epsilon zeta eta theta"]})
    )
    idx.bootstrap(docs, update_id="e1")
    idx.delete([1], update_id="del-1")
    assert idx.row_files_excluding("del-1") == idx._row_files()
    assert idx.row_files_excluding(["e1", "del-1"]) == []
