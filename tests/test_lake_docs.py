"""curate --from-lake: the CDC lake feeds the training-data curation chain
end to end — binlog → lake → one document per conversation → dedup /
decontaminate / quality-cut / pack — with planted near-dups and a planted
benchmark 5-gram overlap so every chain stage is observably live."""

import os

import numpy as np
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
