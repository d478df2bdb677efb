"""Incremental curator (pipelines/curate_index.py): per-epoch dedup (FWW
across epochs) + decontamination + frozen-quality cut, committed like the
lake; every planted case hits exactly one stage."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from nostr_data_pipeline_ray.pipelines.curate_index import IncrementalCurator

_BENCH_GRAM = "alpha beta gamma delta epsilon"


def _pad(text: str, n: int) -> str:
    assert len(text) < n
    return text + " " + "z" * (n - len(text) - 1)


def _docs(rows: dict[int, str]):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": list(rows), "text": list(rows.values())})
    ).repartition(2)


def _base() -> dict[int, str]:
    return {
        i: _pad(
            f"unique document number {i} with entirely distinct filler words "
            + " ".join(f"w{i}x{j}" for j in range(20)),
            200,
        )
        for i in range(20, 30)
    }


def _benchmark(path: str) -> str:
    texts = [_BENCH_GRAM + " zeta eta theta iota kappa"] + [
        " ".join(f"bench{d}w{j}" for j in range(8)) for d in range(1, 20)
    ]
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(20), pa.int64()),
             "text": pa.array(texts, pa.string())}
        ),
        path,
    )
    return path


@pytest.fixture()
def curator(tmp_path, ray_session):
    bench = _benchmark(str(tmp_path / "benchmark.parquet"))
    return IncrementalCurator(str(tmp_path / "cur"), benchmark=bench)


def test_bootstrap_then_epoch_every_stage_live(curator, tmp_path):
    base = _base()
    out0 = curator.bootstrap(_docs(base), update_id="e0")
    # equal-length bootstrap corpus -> one tied quality score -> all pass;
    # all distinct -> no dedup losses
    assert out0["curated"] == 10 and out0["dropped_dedup"] == 0

    long = {
        100: base[22][:190] + " tiny tail",               # ~ old doc 22
        200: _pad("brand new long prose " + " ".join(f"n{j}" for j in range(30)), 300),
        300: _pad("quoting " + _BENCH_GRAM + " verbatim "
                  + " ".join(f"c{j}" for j in range(30)), 300),
        400: "tiny",                                       # fails quality
        500: _pad("another original piece " + " ".join(f"m{j}" for j in range(30)), 300),
    }
    long[201] = long[200][:-10] + " variation"             # ~ new doc 200
    corpus = _docs({**base, **long})
    out1 = curator.ingest(_docs(long), corpus, update_id="e1")
    assert out1["new_docs"] == 6
    assert out1["dropped_dedup"] == 2          # 100 (vs old 22), 201 (vs new 200)
    assert out1["dropped_decontam_or_quality"] == 2  # 300 contaminated, 400 short
    assert out1["curated"] == 2
    got = set(curator.curated().to_pandas()["doc_id"]) - set(base)
    assert got == {200, 500}
    assert curator.fsck()["ok"]

    # retried epoch is exactly-once
    again = curator.ingest(_docs(long), corpus, update_id="e1")
    assert again == {"applied": False, "update_id": "e1"}
    assert curator.meta["n_curated"] == out1["total_curated"]


def test_reopen_continues_and_threshold_frozen(curator, tmp_path):
    base = _base()
    curator.bootstrap(_docs(base), update_id="e0")
    thr = curator.meta["quality_min"]

    reopened = IncrementalCurator(curator.root)
    assert reopened.meta["quality_min"] == thr
    new = {600: _pad("fresh words " + " ".join(f"r{j}" for j in range(25)), 300)}
    out = reopened.ingest(_docs(new), _docs({**base, **new}), update_id="e1")
    assert out["curated"] == 1
    assert reopened.fsck()["ok"]
    with pytest.raises(ValueError, match="already bootstrapped"):
        reopened.bootstrap(_docs(base), update_id="e2")


def test_reopen_with_different_benchmark_raises(curator, tmp_path):
    curator.bootstrap(_docs(_base()), update_id="e0")
    other = str(tmp_path / "other_benchmark.parquet")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(20), pa.int64()),
             "text": pa.array([f"different benchmark text {i} a b c d e"
                               for i in range(20)], pa.string())}
        ),
        other,
    )
    with pytest.raises(ValueError, match="DIFFERENT.*benchmark"):
        IncrementalCurator(curator.root, benchmark=other)
    # same benchmark reopens fine
    IncrementalCurator(curator.root, benchmark=str(tmp_path / "benchmark.parquet"))


def test_benchmark_ids_refused(curator):
    base = _base()
    curator.bootstrap(_docs(base), update_id="e0")
    # ids below the benchmark cutoff never enter the corpus
    sneaky = {5: _pad("smuggled " + " ".join(f"s{j}" for j in range(25)), 300)}
    out = curator.ingest(
        _docs(sneaky), _docs({**base, **sneaky}), update_id="e1"
    )
    assert out["new_docs"] == 0 and out["curated"] == 0


def test_distributed_losers_match_driver_path(tmp_path, ray_session):
    """The bootstrap-scale loser computation (bucketed semi/anti joins + CC
    + vectorized per-label FWW, nothing epoch-sized on the driver) must
    produce the SAME epoch summary and curated corpus as the gate-bounded
    driver path, on a case that exercises every loser class: mixed-edge
    loss, new×new min-id loss, and a new×new component dragged down whole
    by one member's mixed edge."""
    import nostr_data_pipeline_ray.pipelines.curate_index as ci

    base = _base()
    long = {
        100: base[22][:190] + " tiny tail",                # mixed edge: loses
        200: _pad("brand new long prose " + " ".join(f"n{j}" for j in range(30)), 300),
        500: _pad("another original piece " + " ".join(f"m{j}" for j in range(30)), 300),
        # component {600, 601} where 601 ALSO near-dups old doc 23 → whole
        # component (600 and 601) must lose transitively
        601: base[23][:190] + " small edit",
    }
    long[201] = long[200][:-10] + " variation"             # new×new: 201 loses
    long[600] = long[601][:-10] + " more edit"
    corpus_rows = {**base, **long}

    def run(force):
        bench = _benchmark(str(tmp_path / f"bench-{force}.parquet"))
        cur = IncrementalCurator(str(tmp_path / f"cur-{force}"), benchmark=bench)
        cur.bootstrap(_docs(base), update_id="e0")
        old = ci._DRIVER_EPOCH
        ci._DRIVER_EPOCH = force
        try:
            out = cur.ingest(_docs(long), _docs(corpus_rows), update_id="e1")
        finally:
            ci._DRIVER_EPOCH = old
        ids = sorted(cur.curated().to_pandas()["doc_id"].tolist())
        return out, ids

    drv_out, drv_ids = run(True)
    dst_out, dst_ids = run(False)
    assert drv_out == dst_out
    assert drv_ids == dst_ids
    # the planted losses actually happened (not a vacuous agreement)
    assert drv_out["dropped_dedup"] == 4  # 100, 201, 600, 601
    assert set(drv_ids) - set(base) == {200, 500}


def test_ingest_before_bootstrap_raises(tmp_path, ray_session):
    cur = IncrementalCurator(str(tmp_path / "cur2"))
    with pytest.raises(ValueError, match="bootstrap"):
        cur.ingest(_docs({30: "x"}), _docs({30: "x"}), update_id="e0")


def test_epoch_query_steady_state_deterministic(ray_session):
    """q_incremental_curation_epoch memoizes the bootstrap fixture per
    process and copies it per call: repeated calls must each APPLY a fresh
    epoch (the copy restores pre-epoch state) and return identical
    summaries, and the epoch counts must agree with the bootstrap-inclusive
    demo's final corpus."""
    from nostr_data_pipeline_ray.pipelines.curate_index import (
        q_incremental_curation,
        q_incremental_curation_epoch,
    )

    sf = "/root/testdata/sf0.001"
    a = q_incremental_curation_epoch(sf)
    b = q_incremental_curation_epoch(sf)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    assert bool(a.loc[0, "applied"]) is True
    # the demo's curated corpus size equals the fixture bootstrap's
    # survivors + this epoch's survivors
    demo_rows = q_incremental_curation(sf).count()
    assert int(a.loc[0, "total_curated"]) == demo_rows


def test_deep_fsck_validates_curated_contents(curator, tmp_path):
    """Deep mode re-checks the three curation invariants against what's ON
    DISK (row counts preserved, so shallow passes): quality threshold,
    benchmark contamination, benchmark-id cutoff; and propagates deep into
    the owned near-dup index."""
    base = _base()
    curator.bootstrap(_docs(base), update_id="e0")
    assert curator.fsck(deep=True)["ok"]

    files = [
        os.path.join(curator.curated_dir, sub, f)
        for sub in curator.meta["committed"]
        for f in sorted(os.listdir(os.path.join(curator.curated_dir, sub)))
        if f.endswith(".parquet")
    ]
    victim = next(f for f in files if pq.read_metadata(f).num_rows)
    orig = pq.read_table(victim)
    n = orig.num_rows

    def rewrite(doc_ids, texts):
        pq.write_table(
            pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            victim,
        )

    ids = orig["doc_id"].to_pylist()

    # quality violation (short text scores far below the frozen p75)
    rewrite(ids, ["tiny"] * n)
    audit = curator.fsck(deep=True)
    assert not audit["ok"] and any("quality" in e for e in audit["errors"])
    assert curator.fsck()["ok"]  # shallow is blind — row counts intact

    # contamination (benchmark 5-gram present)
    rewrite(ids, [_pad(_BENCH_GRAM + " smuggled back in", 250)] * n)
    audit = curator.fsck(deep=True)
    assert not audit["ok"] and any("contaminated" in e for e in audit["errors"])

    # benchmark-id cutoff violation
    rewrite([1] * n, orig["text"].to_pylist())
    audit = curator.fsck(deep=True)
    assert not audit["ok"] and any("cutoff" in e for e in audit["errors"])

    # restore -> healthy; then corrupt the OWNED INDEX and see it propagate
    pq.write_table(orig, victim)
    assert curator.fsck(deep=True)["ok"]
    idx_file = next(
        f for f in curator.idx._row_files() if pq.read_metadata(f).num_rows
    )
    it = pq.read_table(idx_file)
    pq.write_table(it.rename_columns(["x", "band_hash", "doc_id"]), idx_file)
    audit = curator.fsck(deep=True)
    assert not audit["ok"] and any("near-dup index" in e for e in audit["errors"])
    assert curator.fsck()["ok"]  # shallow still blind


def test_cli_fsck_missing_store_is_an_error(tmp_path):
    """A read-only audit of a mistyped/lost store path must FAIL, not
    silently create a fresh empty store and report it healthy."""
    import json as _json

    from nostr_data_pipeline_ray.cli import main

    missing = str(tmp_path / "no_such_index")
    rc = main(["fsck", "--neardup-index", missing])
    assert rc == 1
    assert not os.path.exists(missing)  # nothing was created
    rc = main(["fsck", "--ann-index", str(tmp_path / "nope2"),
               "--curator", str(tmp_path / "nope3")])
    assert rc == 1
    assert not os.path.exists(str(tmp_path / "nope2"))
    assert not os.path.exists(str(tmp_path / "nope3"))


def _vec_table(path, rows):
    """rows: dict[vec_id -> np.ndarray]."""
    pq.write_table(
        pa.table({
            "vec_id": pa.array(list(rows), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in rows.values()],
                pa.list_(pa.float64()),
            ),
        }),
        path,
    )
    return rd.read_parquet(str(path))


def test_embedding_curator_cross_epoch_fww(tmp_path, ray_session):
    """IVF-backed embedding dedup across epochs: an epoch-2 near-dup of an
    epoch-1 vector loses (FWW), an epoch-2 internal near-dup pair keeps its
    min id, distinct vectors survive, retried epochs are exactly-once, and
    a reopened curator continues from disk."""
    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    rng = np.random.default_rng(11)
    dim = 16
    base = {i: rng.standard_normal(dim) for i in range(10, 20)}
    e1 = _vec_table(tmp_path / "e1.parquet", base)

    cur = EmbeddingCurator(str(tmp_path / "cur"), threshold=0.9,
                           n_lists=4, mine_probes=4)
    out1 = cur.bootstrap(e1, update_id="e1")
    assert out1["curated"] == 10 and out1["dropped_dedup"] == 0

    b_new = rng.standard_normal(dim)
    epoch2 = {
        100: base[12] + 0.01 * rng.standard_normal(dim),  # ~ old 12: loses
        101: b_new,                                       # new×new pair min id: survives
        102: b_new + 0.01 * rng.standard_normal(dim),     # loses to 101
        103: rng.standard_normal(dim),                    # distinct: survives
    }
    e2 = _vec_table(tmp_path / "e2.parquet", epoch2)
    out2 = cur.ingest(e2, update_id="e2")
    assert out2["new_vecs"] == 4
    assert out2["dropped_dedup"] == 2  # 100 (vs old 12), 102 (vs new 101)
    assert out2["curated"] == 2
    got = set(cur.curated().to_pandas()["vec_id"])
    assert got == set(base) | {101, 103}
    assert cur.fsck(deep=True)["ok"]
    # index memory holds EVERYTHING (losers included — candidate memory)
    assert cur.idx.meta["n_vecs"] == 14

    # retried epoch is exactly-once
    again = cur.ingest(e2, update_id="e2")
    assert again == {"applied": False, "update_id": "e2"}
    assert cur.meta["n_curated"] == out2["total_curated"]

    # reopen continues; epoch 3 near-dup of an epoch-2 SURVIVOR loses,
    # near-dup of an epoch-2 LOSER also loses (losers stay in the memory)
    reopened = EmbeddingCurator(cur.root, threshold=0.9)
    epoch3 = {
        200: epoch2[101] + 0.01 * rng.standard_normal(dim),  # ~ survivor 101
        201: epoch2[102] + 0.01 * rng.standard_normal(dim),  # ~ loser 102
        202: rng.standard_normal(dim),                       # survives
    }
    e3 = _vec_table(tmp_path / "e3.parquet", epoch3)
    out3 = reopened.ingest(e3, update_id="e3")
    assert out3["dropped_dedup"] == 2 and out3["curated"] == 1
    assert 202 in set(reopened.curated().to_pandas()["vec_id"])


def test_embedding_curator_distributed_losers_match(tmp_path, ray_session):
    """The embedding curator rides the same gated dual-path FWW machinery:
    forcing the distributed path must reproduce the driver path's summary
    and curated ids."""
    import nostr_data_pipeline_ray.pipelines.curate_index as ci
    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    rng = np.random.default_rng(23)
    dim = 16
    base = {i: rng.standard_normal(dim) for i in range(10)}
    shared = rng.standard_normal(dim)
    epoch2 = {
        100: base[3] + 0.01 * rng.standard_normal(dim),
        101: shared,
        102: shared + 0.01 * rng.standard_normal(dim),
        103: rng.standard_normal(dim),
    }

    def run(force):
        e1 = _vec_table(tmp_path / f"a-{force}.parquet", base)
        e2 = _vec_table(tmp_path / f"b-{force}.parquet", epoch2)
        cur = EmbeddingCurator(str(tmp_path / f"cur-{force}"), threshold=0.9,
                               n_lists=4, mine_probes=4)
        cur.bootstrap(e1, update_id="e1")
        old = ci._DRIVER_EPOCH
        ci._DRIVER_EPOCH = force
        try:
            out = cur.ingest(e2, update_id="e2")
        finally:
            ci._DRIVER_EPOCH = old
        return out, sorted(cur.curated().to_pandas()["vec_id"].tolist())

    drv = run(True)
    dst = run(False)
    assert drv == dst
    assert drv[0]["dropped_dedup"] == 2


def test_cli_fsck_embedding_curator(tmp_path, ray_session):
    """fsck --emb-curator audits a real store and errors on a missing one."""
    import json as _json
    from io import StringIO
    from contextlib import redirect_stdout

    from nostr_data_pipeline_ray.cli import main
    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    rng = np.random.default_rng(4)
    rows = {i: rng.standard_normal(8) for i in range(12)}
    vecs = _vec_table(tmp_path / "v.parquet", rows)
    root = str(tmp_path / "embcur")
    cur = EmbeddingCurator(root, threshold=0.9, n_lists=2)
    cur.bootstrap(vecs, update_id="e1")

    buf = StringIO()
    with redirect_stdout(buf):
        rc = main(["fsck", "--emb-curator", root])
    assert rc == 0
    assert _json.loads(buf.getvalue())["emb_curator"]["ok"]

    rc = main(["fsck", "--emb-curator", str(tmp_path / "nope")])
    assert rc == 1 and not os.path.exists(str(tmp_path / "nope"))


def test_cli_fsck_lost_inner_index_is_an_error(tmp_path, ray_session):
    """A curator whose INNER index directory was lost must fail fsck —
    constructing it would silently re-create a fresh empty index whose
    audit trivially passes (the 'healthy empty index' failure mode)."""
    import shutil as _shutil

    from nostr_data_pipeline_ray.cli import main
    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    rng = np.random.default_rng(4)
    rows = {i: rng.standard_normal(8) for i in range(12)}
    vecs = _vec_table(tmp_path / "v.parquet", rows)
    root = str(tmp_path / "embcur")
    cur = EmbeddingCurator(root, threshold=0.9, n_lists=2)
    cur.bootstrap(vecs, update_id="e1")
    del cur

    _shutil.rmtree(os.path.join(root, "ann_index"))
    rc = main(["fsck", "--emb-curator", root])
    assert rc == 1
    # the audit did NOT quietly re-create the inner index
    assert not os.path.exists(os.path.join(root, "ann_index"))

    # same hole for the text curator's near-dup index
    from nostr_data_pipeline_ray.pipelines.curate_index import (
        IncrementalCurator,
    )

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(range(100, 108)),
        "text": [" ".join(f"c{i}w{j}" for j in range(12)) for i in range(8)],
    }))
    croot = str(tmp_path / "cur")
    tcur = IncrementalCurator(croot)
    tcur.bootstrap(docs, update_id="e1")
    del tcur
    _shutil.rmtree(os.path.join(croot, "neardup_index"))
    rc = main(["fsck", "--curator", croot])
    assert rc == 1
    assert not os.path.exists(os.path.join(croot, "neardup_index"))


def test_embedding_curator_reopen_rejects_explicit_mismatch(tmp_path, ray_session):
    """Reopen adopts persisted parameters; any EXPLICITLY passed mismatch
    raises — including threshold=0.42 (formerly overloaded as the
    'unspecified' sentinel) and mine_probes."""
    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    rng = np.random.default_rng(9)
    rows = {i: rng.standard_normal(8) for i in range(10)}
    vecs = _vec_table(tmp_path / "v.parquet", rows)
    root = str(tmp_path / "embcur")
    cur = EmbeddingCurator(root, threshold=0.9, n_lists=2, mine_probes=2)
    cur.bootstrap(vecs, update_id="e1")
    del cur

    # bare reopen adopts the store's params
    re1 = EmbeddingCurator(root)
    assert re1.meta["threshold"] == 0.9 and re1.meta["mine_probes"] == 2
    # matching explicit values are fine
    EmbeddingCurator(root, threshold=0.9, mine_probes=2)
    # ANY explicit mismatch raises — 0.42 is no longer a silent sentinel
    with pytest.raises(ValueError, match="different"):
        EmbeddingCurator(root, threshold=0.42)
    with pytest.raises(ValueError, match="different"):
        EmbeddingCurator(root, mine_probes=8)


def test_text_curator_reopen_rejects_explicit_mismatch(curator):
    """The text curator now rides the SAME shared reopen protocol as the
    other stores (state/meta.py): a bare reopen adopts persisted params,
    an EXPLICITLY passed mismatch raises — it used to silently ignore a
    different threshold/quality_q, diverging from its siblings."""
    re1 = IncrementalCurator(curator.root)
    assert re1.meta["threshold"] == 0.5 and re1.meta["quality_q"] == 0.75
    IncrementalCurator(curator.root, threshold=0.5, quality_q=0.75)  # match ok
    with pytest.raises(ValueError, match="different"):
        IncrementalCurator(curator.root, threshold=0.9)
    with pytest.raises(ValueError, match="different"):
        IncrementalCurator(curator.root, quality_q=0.5)
    with pytest.raises(ValueError, match="different"):
        IncrementalCurator(curator.root, benchmark_max_doc_id=99)


def test_embedding_curator_reopen_before_train_is_trainable(
    tmp_path, ray_session
):
    """Crash window one step earlier than the train-crash test: the
    curator (and its inner IVF store) was CREATED but the process died
    before train() wrote centroids. Reopen must come back trainable —
    the old IvfIndex reopen unconditionally np.load'ed the missing
    centroids file and crashed."""
    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    rng = np.random.default_rng(29)
    vecs = _vec_table(
        tmp_path / "v.parquet", {i: rng.standard_normal(8) for i in range(6)}
    )
    root = str(tmp_path / "cur")
    created = EmbeddingCurator(root, threshold=0.9, n_lists=2)
    assert created.idx._centroids is None
    del created  # ... the process dies before train()

    cur = EmbeddingCurator(root, threshold=0.9)
    assert cur.idx._centroids is None  # reopened untrained, not a crash
    out = cur.bootstrap(vecs, update_id="e1")
    assert out["applied"] and out["curated"] == 6


def test_embedding_curator_empty_epoch_commits_exactly_once(
    tmp_path, ray_session
):
    """A 0-row epoch (everything filtered upstream) must commit an empty
    exactly-once epoch like the text curator — not run the mine pipeline
    over a block-less dataset (whose to_pandas() drops columns and
    crashed mid-mine with a KeyError before the short-circuit)."""
    import ray.data as rd

    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    rng = np.random.default_rng(21)
    vecs = _vec_table(
        tmp_path / "v.parquet", {i: rng.standard_normal(8) for i in range(6)}
    )
    cur = EmbeddingCurator(str(tmp_path / "cur"), threshold=0.9, n_lists=2)
    cur.bootstrap(vecs, update_id="e1")

    empty = rd.from_arrow(pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float64()))]
    ).empty_table())
    out = cur.ingest(empty, update_id="e2-empty")
    assert out["applied"] and out["new_vecs"] == 0 and out["curated"] == 0
    assert out["total_curated"] == 6
    # exactly-once: the retry is a no-op, and the store stays healthy
    again = cur.ingest(empty, update_id="e2-empty")
    assert again == {"applied": False, "update_id": "e2-empty"}
    assert cur.fsck(deep=True)["ok"]
    # a real epoch still works after the empty one
    more = _vec_table(
        tmp_path / "v3.parquet",
        {i: rng.standard_normal(8) for i in range(100, 103)},
    )
    out3 = cur.ingest(more, update_id="e3")
    assert out3["curated"] == 3 and out3["total_curated"] == 9


def test_embedding_curator_bootstrap_retry_after_train_crash(
    tmp_path, ray_session
):
    """Crash window: a prior bootstrap persisted the quantizer (train)
    but died before the epoch committed. Retrying bootstrap() must skip
    the re-train (IvfIndex would raise 'use add()' — the wrong recovery
    API for a curator) and complete the ingest; a COMPLETED bootstrap
    still refuses a second bootstrap with the curator-level message."""
    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    rng = np.random.default_rng(23)
    rows = {i: rng.standard_normal(8) for i in range(8)}
    vecs = _vec_table(tmp_path / "v.parquet", rows)
    root = str(tmp_path / "cur")

    crashed = EmbeddingCurator(root, threshold=0.9, n_lists=2)
    crashed.idx.train(vecs)  # ... and the process dies here
    del crashed

    cur = EmbeddingCurator(root, threshold=0.9)
    out = cur.bootstrap(vecs, update_id="e1")  # retry completes
    assert out["applied"] and out["curated"] == 8
    assert set(cur.curated().to_pandas()["vec_id"]) == set(rows)

    with pytest.raises(ValueError, match="already bootstrapped — use ingest"):
        cur.bootstrap(vecs, update_id="e2")


def test_curator_ingest_retry_after_crash_between_fold_and_commit(
    tmp_path, ray_session, monkeypatch
):
    """Standalone-API crash window: ingest() dies after MinHashIndex folded
    the epoch but before the curator committed it. The retry re-mines
    against an index that already holds the epoch's own rows — pair
    classification is by id membership, not storage state, so the summary
    and curated output must equal a never-crashed run's."""
    base = {i: " ".join(f"d{i}w{j}" for j in range(14)) for i in range(100, 110)}
    dup_src = " ".join(f"s{j}word" for j in range(14))  # base-like length
    epoch2 = {
        200: base[103],          # near-dup of an OLD doc: loses (FWW)
        201: dup_src,            # new×new pair min id: survives
        202: dup_src + " tail",  # loses to 201
        203: " ".join(f"x{j}word" for j in range(14)),  # distinct: survives
    }

    def docs(d):
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": list(d), "text": list(d.values())}
        ))

    def build(root, crash):
        cur = IncrementalCurator(str(root))
        cur.bootstrap(docs(base), update_id="e1")
        if crash:
            def boom(self, survivors, n_kept, update_id):
                raise RuntimeError("simulated crash")
            with monkeypatch.context() as m:
                m.setattr(IncrementalCurator, "_commit_epoch", boom)
                with pytest.raises(RuntimeError, match="simulated crash"):
                    cur.ingest(docs(epoch2), docs({**base, **epoch2}), "e2")
            assert "e2" in cur.idx.meta["applied_ids"]  # fold committed
            assert "e2" not in cur.meta["applied_ids"]  # epoch did not
        out = cur.ingest(docs(epoch2), docs({**base, **epoch2}), "e2")
        ids = sorted(cur.curated().to_pandas()["doc_id"].tolist())
        assert cur.fsck()["ok"]
        return out, ids

    clean = build(tmp_path / "clean", crash=False)
    retried = build(tmp_path / "crashed", crash=True)
    # known_before is a point-in-time stat: the retry correctly reports the
    # half-applied fold's rows as already indexed — exclude it, pin the rest
    for out, _ in (clean, retried):
        out.pop("known_before")
    assert retried == clean
    assert clean[0]["dropped_dedup"] == 2  # 200 (vs old 103), 202 (vs 201)
    assert clean[0]["curated"] == 2


def test_embedding_curator_retry_after_crash_between_add_and_commit(
    tmp_path, ray_session, monkeypatch
):
    """Same crash window for the embedding curator: idx.add committed the
    epoch's vectors, the curator epoch did not. The retry re-mines with
    the epoch's vectors already in the index memory — self-pairs are
    excluded by vec_id and classification is by id membership, so the
    result must equal a never-crashed run's."""
    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    rng = np.random.default_rng(31)
    dim = 16
    base = {i: rng.standard_normal(dim) for i in range(10, 20)}
    shared = rng.standard_normal(dim)
    epoch2 = {
        100: base[12] + 0.01 * rng.standard_normal(dim),  # loses to old 12
        101: shared,                                      # min id: survives
        102: shared + 0.01 * rng.standard_normal(dim),    # loses to 101
        103: rng.standard_normal(dim),                    # survives
    }

    def build(tag, crash):
        e1 = _vec_table(tmp_path / f"e1-{tag}.parquet", base)
        e2 = _vec_table(tmp_path / f"e2-{tag}.parquet", epoch2)
        cur = EmbeddingCurator(str(tmp_path / f"cur-{tag}"),
                               threshold=0.9, n_lists=4, mine_probes=4)
        cur.bootstrap(e1, update_id="e1")
        if crash:
            def boom(self, survivors, n_kept, update_id):
                raise RuntimeError("simulated crash")
            with monkeypatch.context() as m:
                m.setattr(EmbeddingCurator, "_commit_epoch", boom)
                with pytest.raises(RuntimeError, match="simulated crash"):
                    cur.ingest(e2, update_id="e2")
            assert "e2" in cur.idx.meta["applied_ids"]
            assert "e2" not in cur.meta["applied_ids"]
        out = cur.ingest(e2, update_id="e2")
        ids = sorted(cur.curated().to_pandas()["vec_id"].tolist())
        assert cur.fsck()["ok"]
        # the index memory holds each vector exactly once despite the retry
        assert cur.idx.meta["n_vecs"] == len(base) + len(epoch2)
        return out, ids

    clean = build("clean", crash=False)
    retried = build("crashed", crash=True)
    for out, _ in (clean, retried):
        out.pop("known_before")
    assert retried == clean
    assert clean[0]["dropped_dedup"] == 2
    assert clean[0]["curated"] == 2


def test_embedding_epoch_query_steady_state_deterministic(ray_session):
    """q_incremental_curation_embedding_epoch mirrors the text curator's
    steady-state protocol: the bootstrap fixture is memoized per process and
    copied per call, so repeated calls each APPLY a fresh epoch and return
    identical summaries; the epoch counts must agree with the
    bootstrap-inclusive demo's final curated vector set."""
    from nostr_data_pipeline_ray.pipelines.curate_index import (
        q_incremental_curation_embedding,
        q_incremental_curation_embedding_epoch,
    )

    sf = "/root/testdata/sf0.001"
    a = q_incremental_curation_embedding_epoch(sf)
    b = q_incremental_curation_embedding_epoch(sf)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    assert bool(a.loc[0, "applied"]) is True
    assert int(a.loc[0, "new_vecs"]) > 0
    demo_rows = q_incremental_curation_embedding(sf).count()
    assert int(a.loc[0, "total_curated"]) == demo_rows


def test_embedding_curator_matches_bruteforce_fww_randomized(tmp_path, ray_session):
    """Randomized end-to-end check of the embedding curator's MINING +
    FWW semantics against a pure brute-force reference. With mine_probes ==
    n_lists every new vector probes EVERY list, so the candidate space is
    all pairs and exact float64 cosine + union-find FWW (the same reference
    test_properties pins the loser paths with) predicts the curated set
    exactly — list partitioning stops affecting recall and only the mining
    arithmetic and loser semantics remain under test."""
    import tempfile

    from test_properties import _reference_losers

    from nostr_data_pipeline_ray.pipelines.curate_index import EmbeddingCurator

    thr = 0.9
    for seed in (3, 29, 171, 4096):
        rng = np.random.default_rng(seed)
        n, dim = int(rng.integers(10, 36)), 6
        m = rng.standard_normal((n, dim))
        for _ in range(int(rng.integers(0, 7))):  # plant some near-dups
            i, j = rng.integers(0, n, size=2)
            m[j] = m[i] + 0.03 * rng.standard_normal(dim)
        cut = int(rng.integers(3, n - 3))

        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-30)
        sims = (m / norms[:, None]) @ (m / norms[:, None]).T
        iu, ju = np.triu_indices(n, k=1)
        assert not np.any(np.abs(sims[iu, ju] - thr) < 1e-9)  # no knife-edge
        hit = sims[iu, ju] >= thr
        all_pairs = list(zip(iu[hit].tolist(), ju[hit].tolist()))

        e1_ids = list(range(cut))
        e2_ids = list(range(cut, n))
        edges1 = [(a, b) for a, b in all_pairs if a < cut and b < cut]
        # epoch 2 mines new×new and new×old, never old×old
        edges2 = [(a, b) for a, b in all_pairs if a >= cut or b >= cut]
        want = (set(e1_ids) - _reference_losers(e1_ids, edges1)) | (
            set(e2_ids) - _reference_losers(e2_ids, edges2)
        )

        work = tempfile.mkdtemp(prefix="embrand-", dir=str(tmp_path))
        rows = {i: m[i] for i in e1_ids}
        cur = EmbeddingCurator(work, threshold=thr, n_lists=2, mine_probes=2)
        cur.bootstrap(
            _vec_table(os.path.join(work, "e1.parquet"), rows), update_id="e1"
        )
        cur.ingest(
            _vec_table(
                os.path.join(work, "e2.parquet"), {i: m[i] for i in e2_ids}
            ),
            update_id="e2",
        )
        got = set(cur.curated().to_pandas()["vec_id"].tolist())
        assert got == want, f"seed={seed}: got {sorted(got)} want {sorted(want)}"
