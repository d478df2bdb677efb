"""Sequence packing invariants (pipelines/pack.py) — no SQL oracle exists
for greedy bin packing, so the contract is pinned here: complete coverage,
budget respected, determinism, and near-optimal bin counts."""

import numpy as np
import pandas as pd

import ray.data as rd

from nostr_data_pipeline_ray.pipelines.pack import (
    _bfd_pack,
    pack_documents,
    q_pack_sequences,
)

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 256


def _packed():
    return q_pack_sequences(SF_DIR, budget=BUDGET).to_pandas()


def test_every_doc_packed_exactly_once():
    import pyarrow.parquet as pq

    got = _packed()
    want = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    assert sorted(got["doc_id"]) == sorted(want["doc_id"].to_pylist())
    assert got["doc_id"].is_unique


def test_budget_respected_or_singleton():
    got = _packed()
    per_pack = got.groupby("pack_id").agg(total=("n_tokens", "sum"), n=("doc_id", "count"))
    over = per_pack[per_pack["total"] > BUDGET]
    assert (over["n"] == 1).all()  # only oversized single docs may exceed


def test_deterministic():
    a = _packed().sort_values("doc_id").reset_index(drop=True)
    b = _packed().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_bin_count_near_lower_bound():
    got = _packed()
    fit = got[got["n_tokens"] <= BUDGET]
    lower = int(np.ceil(fit["n_tokens"].sum() / BUDGET))
    n_bins = fit["pack_id"].nunique()
    # BFD is within 11/9·OPT + 1; allow slack for per-shard packing
    assert n_bins <= np.ceil(lower * 11 / 9) + 1


def test_bfd_kernel_cases():
    # descending inputs; budget 10
    bins = _bfd_pack(np.array([7, 6, 4, 3, 3, 2]), 10)
    sums = {}
    for b, n in zip(bins, [7, 6, 4, 3, 3, 2]):
        sums[b] = sums.get(b, 0) + n
    assert all(v <= 10 for v in sums.values())
    assert len(sums) == int(np.ceil(25 / 10))  # optimal here: 3 bins
    # oversized doc gets its own bin and doesn't poison later placements
    bins = _bfd_pack(np.array([30, 9, 9, 1, 1]), 10)
    assert (bins[0] != bins[1:]).all()
    assert max(bins) + 1 == 3  # [30] [9,1] [9,1]


def test_multi_shard_pack_ids_disjoint():
    docs = pd.DataFrame(
        {"doc_id": np.arange(1000, dtype=np.int64),
         "n_tokens": np.full(1000, 10, dtype=np.int64)}
    )
    out = pack_documents(
        rd.from_pandas(docs).repartition(4), budget=100, n_shards=7
    ).to_pandas()
    assert len(out) == 1000 and out["doc_id"].is_unique
    shards = out["pack_id"].to_numpy() >> 32
    assert set(shards) == set(range(7))
    per_pack = out.groupby("pack_id")["n_tokens"].sum()
    assert (per_pack <= 100).all()


def test_curate_corpus_end_to_end(tmp_path):
    """The composed curation sink: planted corpus with one near-dup pair,
    one benchmark-contaminated doc, and mixed quality — writes curated docs
    + pack assignments + a summary whose counts agree."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.curate import curate_corpus

    base = "the quick brown fox jumps over the lazy dog again today " * 6
    texts = {}
    # ids < 20 are the benchmark stand-in (dedup._BENCHMARK_MAX_DOC_ID)
    texts[0] = "held out benchmark question about astronomy and orbits " * 5
    for i in range(1, 20):
        texts[i] = f"benchmark filler {i} " + " ".join(
            f"b{i}q{j}" for j in range(30)
        )
    texts[20] = base + "alpha"
    texts[21] = base + "alpha beta"  # near-dup of 20 -> dropped
    texts[22] = "held out benchmark question about astronomy and orbits twice"  # contaminated
    texts[23] = " ".join(f"unique{j}" for j in range(60))  # clean, long
    texts[24] = "short"  # low quality
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(v) for v in texts.values()], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = tmp_path / "curated"
    summary = curate_corpus(str(tmp_path), str(out), budget=64)
    assert summary["input_docs"] == len(texts)
    assert summary["curated_docs"] == summary["input_docs"] - summary["dropped"]

    curated = pq.read_table(str(out / "curated.parquet")).to_pydict()
    kept = set(curated["doc_id"])
    assert 21 not in kept  # near-dup loser
    assert 22 not in kept  # contaminated
    assert 24 not in kept  # below the quality cut
    assert 20 in kept and 23 in kept

    packs = pq.read_table(str(out / "packs.parquet")).to_pydict()
    assert sorted(packs["doc_id"]) == sorted(kept)
    assert json.load(open(out / "curation_summary.json")) == summary


def test_curated_corpus_plus_adds_repetition_cut(ray_session):
    """The four-stage chain equals its composed single-statement oracle at
    sf0.001 and is a (strict-or-equal) subset of the base chain with every
    dropped doc failing the repetition threshold."""
    import duckdb

    from nostr_data_pipeline_ray.pipelines.curate import (
        ORACLE,
        REPETITION_MAX_DUP,
        q_curated_corpus,
        q_curated_corpus_plus,
    )
    from nostr_data_pipeline_ray.pipelines.textops import q_doc_repetition

    sf = "/root/testdata/sf0.001"
    counts: dict = {}
    plus = set(
        q_curated_corpus_plus(sf, counts=counts).to_pandas()["doc_id"]
    )
    base = set(q_curated_corpus(sf).to_pandas()["doc_id"])
    assert plus <= base
    assert counts["after_repetition"] == len(plus)
    rep = (
        q_doc_repetition(sf).to_pandas().set_index("doc_id")["dup_word_frac"]
    )
    for d in base - plus:
        assert rep[d] > REPETITION_MAX_DUP
    for d in plus:
        assert rep[d] <= REPETITION_MAX_DUP

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = set(con.execute(ORACLE["curated_corpus_plus"]).fetchdf()["doc_id"])
    assert plus == want


def test_curated_corpus_trimmed_five_stage_composition(ray_session):
    """Stage 5 (ExactSubstr trim within survivors): same doc set as the
    extended chain, trimmed texts equal the survivor-scoped standalone
    trim, and the whole 5-stage result matches its composed
    single-statement oracle at sf0.001."""
    import duckdb

    from nostr_data_pipeline_ray.pipelines.curate import (
        ORACLE,
        q_curated_corpus_plus,
        q_curated_corpus_trimmed,
    )

    sf = "/root/testdata/sf0.001"
    counts: dict = {}
    got = (
        q_curated_corpus_trimmed(sf, counts=counts)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    plus = set(q_curated_corpus_plus(sf).to_pandas()["doc_id"])
    assert set(got["doc_id"]) == plus
    assert counts["trimmed_docs"] == len(plus)
    # a trimmed doc loses words; an untrimmed doc's text is intact
    assert (got["n_removed"] >= 0).all()
    intact = got[got["n_removed"] == 0]
    assert (
        intact["text_clean"].str.split(" ").str.len()
        == intact["n_words"]
    ).all()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(ORACLE["curated_corpus_trimmed"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_curate_corpus_trim_writes_trimmed_text(ray_session, tmp_path):
    """curate_corpus(trim=True): curated.parquet carries the span-trimmed
    text with n_chars recomputed from it, the doc set equals the 5-stage
    chain's, and the summary reports the trim stage."""
    from nostr_data_pipeline_ray.pipelines.curate import (
        curate_corpus,
        q_curated_corpus_trimmed,
    )

    sf = "/root/testdata/sf0.001"
    out = tmp_path / "trimmed"
    summary = curate_corpus(sf, str(out), budget=256, trim=True)
    assert summary["trimmed_docs"] == summary["curated_docs"]
    assert "words_trimmed" in summary

    import pyarrow.parquet as pq

    got = pq.read_table(str(out / "curated.parquet")).to_pandas()
    want = (
        q_curated_corpus_trimmed(sf)
        .to_pandas()
        .set_index("doc_id")["text_clean"]
    )
    assert set(got["doc_id"]) == set(want.index)
    merged = got.set_index("doc_id")
    assert (merged["text"] == want.loc[merged.index]).all()
    assert (merged["text"].str.len() == merged["n_chars"]).all()
