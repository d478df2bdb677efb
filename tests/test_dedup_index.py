"""Incremental near-dup index (pipelines/dedup_index.py)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from nostr_data_pipeline_ray.pipelines.dedup_index import MinHashIndex


def _docs(rows: dict[int, str]):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": list(rows), "text": list(rows.values())})
    ).repartition(2)


BASE = {
    i: f"unique document number {i} with entirely distinct filler words "
    + " ".join(f"w{i}x{j}" for j in range(20))
    for i in range(10)
}


def test_incremental_update_finds_new_pairs_only(tmp_path):
    idx = MinHashIndex(str(tmp_path / "idx"))
    corpus1 = _docs(BASE)
    first = idx.update(corpus1, corpus1)
    first_df = first if isinstance(first, pd.DataFrame) else first.to_pandas()
    assert len(first_df) == 0  # epoch 1: all distinct, no pairs
    assert idx.stats()["n_docs"] == 10 and idx.stats()["n_updates"] == 1

    new = {
        100: BASE[3] + " tiny tail",          # near-copy of old doc 3
        101: "fresh unseen content alpha beta gamma delta epsilon zeta eta",
        102: "fresh unseen content alpha beta gamma delta epsilon zeta THETA",  # ~101
        103: "completely solitary text with no twin anywhere at all",
    }
    all_docs = _docs({**BASE, **new})
    out = idx.update(_docs(new), all_docs)
    out_df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    pairs = set(zip(out_df["doc_a"], out_df["doc_b"]))
    assert (3, 100) in pairs
    assert (101, 102) in pairs
    flat = set(out_df["doc_a"]) | set(out_df["doc_b"])
    assert 103 not in flat
    # never re-mines old×old: every pair has a NEW endpoint
    assert all(a >= 100 or b >= 100 for a, b in pairs)
    assert idx.stats()["n_docs"] == 14 and idx.stats()["n_updates"] == 2
    assert (out_df["jaccard"] >= 0.5).all()


def test_reopen_validates_parameters(tmp_path):
    MinHashIndex(str(tmp_path / "idx"), num_perm=64, bands=16)
    # same params reopen fine
    MinHashIndex(str(tmp_path / "idx"), num_perm=64, bands=16)
    with pytest.raises(ValueError, match="different LSH parameters"):
        MinHashIndex(str(tmp_path / "idx"), num_perm=32, bands=8)


def test_empty_update_is_harmless(tmp_path):
    idx = MinHashIndex(str(tmp_path / "idx"))
    corpus = _docs(BASE)
    idx.update(corpus, corpus)
    empty = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                      "text": pd.Series(dtype="object")})
    )
    out = idx.update(empty, corpus)
    out_df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(out_df) == 0
    assert idx.stats()["n_docs"] == 10  # unchanged


def test_update_id_idempotent_and_self_pair_guard(tmp_path):
    """A retried epoch (same update_id) folds in exactly once, and a doc
    re-delivered as 'new' while already indexed never pairs with itself."""
    idx = MinHashIndex(str(tmp_path / "idx"))
    corpus = _docs(BASE)
    idx.bootstrap(corpus, update_id="e1")
    assert idx.stats()["n_docs"] == 10

    redelivered = _docs({7: BASE[7]})  # doc 7 already indexed
    all_docs = _docs(BASE)
    out = idx.update(redelivered, all_docs, update_id="e2")
    out_df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert not ((out_df["doc_a"] == 7) & (out_df["doc_b"] == 7)).any()
    assert len(out_df) == 0  # no genuine near-dup of doc 7 exists
    n_after = idx.stats()["n_docs"]

    # retry the same epoch: mining re-runs, fold-in is a no-op
    idx.update(redelivered, all_docs, update_id="e2")
    assert idx.stats()["n_docs"] == n_after
    assert idx.stats()["n_updates"] == len(idx.meta["committed"])


def test_bootstrap_mines_nothing_but_indexes_everything(tmp_path):
    idx = MinHashIndex(str(tmp_path / "idx"))
    dup_corpus = _docs({0: BASE[0], 1: BASE[0] + " x"})  # internal near-dups
    idx.bootstrap(dup_corpus)
    assert idx.stats()["n_docs"] == 2
    # the bootstrap's internal pair surfaces as new x old on the NEXT epoch
    new = {50: BASE[0] + " y"}
    out = idx.update(_docs(new), _docs({**{0: BASE[0], 1: BASE[0] + " x"}, **new}))
    out_df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    pairs = set(zip(out_df["doc_a"], out_df["doc_b"]))
    assert (0, 50) in pairs and (1, 50) in pairs
    assert (0, 1) not in pairs  # old x old stays unmined, by contract


def test_format_version_guard(tmp_path):
    import json

    d = tmp_path / "idx"
    MinHashIndex(str(d))
    meta = json.load(open(d / "index_meta.json"))
    meta["format"] = 1  # simulate a legacy layout
    json.dump(meta, open(d / "index_meta.json", "w"))
    with pytest.raises(ValueError, match="on-disk format"):
        MinHashIndex(str(d))


def test_index_fsck(tmp_path):
    import shutil

    d = tmp_path / "idx"
    idx = MinHashIndex(str(d))
    idx.bootstrap(_docs(BASE), update_id="e1")
    rep = idx.fsck()
    assert rep["ok"] and rep["rows"] == 10 * idx.meta["bands"]

    # an orphan subdir (crash between write and commit) is reported, not fatal
    (d / "rows" / "update-99999").mkdir()
    rep = idx.fsck()
    assert rep["ok"] and rep["orphans"] == ["update-99999"]

    # a vanished committed subdir is an error
    shutil.rmtree(d / "rows" / idx.meta["committed"][0])
    rep = idx.fsck()
    assert not rep["ok"] and "missing on disk" in rep["errors"][0]


def test_semijoin_path_agrees_with_pushdown_path(tmp_path, monkeypatch):
    """Above the pushdown gate, update must route the existing index rows
    through the bucketed semi-join (nothing corpus-sized on the driver) and
    find exactly the same verified pairs as the broadcast path."""
    from nostr_data_pipeline_ray.pipelines import dedup_index as di

    new = {
        100: BASE[3] + " tiny tail",
        101: "fresh unseen content alpha beta gamma delta epsilon zeta eta",
        102: "fresh unseen content alpha beta gamma delta epsilon zeta THETA",
    }
    all_docs = _docs({**BASE, **new})

    def run(gate):
        monkeypatch.setattr(di, "_PUSHDOWN_MAX_KEYS", gate)
        idx = MinHashIndex(str(tmp_path / f"idx-{gate}"))
        idx.bootstrap(_docs(BASE))
        out = idx.update(_docs(new), all_docs)
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        return set(zip(df["doc_a"], df["doc_b"]))

    assert run(0) == run(50_000) >= {(3, 100), (101, 102)}


def test_delete_suppresses_pairs_and_compact_purges(tmp_path):
    """A tombstoned doc stops pairing immediately (both as old AND new
    endpoint), compact() purges its rows and clears tombstones, and after
    compact the id can be re-used live."""
    idx = MinHashIndex(str(tmp_path / "idx"))
    idx.bootstrap(_docs(BASE), update_id="e0")

    # deleting doc 3 means the near-copy no longer finds its twin
    assert idx.delete([3], update_id="d1") == 1
    assert idx.delete([3], update_id="d1") == 0  # exactly-once
    new = {100: BASE[3] + " tiny tail"}
    out = idx.update(_docs(new), _docs({**BASE, **new}), update_id="e1")
    out_df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(out_df) == 0  # the only twin is tombstoned

    # physical purge: 9 live docs of the original 10, plus the new one
    res = idx.compact()
    assert res["compacted"] and res["purged_docs"] == 1
    assert idx.stats()["n_docs"] == 10  # 9 base + doc 100
    assert idx.meta["tombstones"] == []
    audit = idx.fsck()
    assert audit["ok"], audit

    # after compact the id is re-usable and live again
    revived = {3: BASE[3]}
    out2 = idx.update(_docs(revived), _docs({**BASE, **new, **revived}),
                      update_id="e2")
    out2_df = out2 if isinstance(out2, pd.DataFrame) else out2.to_pandas()
    pairs = set(zip(out2_df["doc_a"], out2_df["doc_b"]))
    assert (3, 100) in pairs


def test_compact_without_tombstones_folds_updates(tmp_path):
    idx = MinHashIndex(str(tmp_path / "idx"))
    idx.bootstrap(_docs({k: v for k, v in BASE.items() if k < 5}), update_id="a")
    idx.bootstrap(_docs({k: v for k, v in BASE.items() if k >= 5}), update_id="b")
    assert idx.stats()["n_updates"] == 2
    res = idx.compact()
    assert res["compacted"] and res["purged_docs"] == 0
    assert idx.stats()["n_updates"] == 1 and idx.stats()["n_docs"] == 10
    assert idx.fsck()["ok"]
    assert idx.compact() == {"compacted": False, "updates": 1}


def test_verify_prune_path_agrees_with_full_stream(tmp_path, monkeypatch):
    """The gated endpoint prune (shingle only candidate-endpoint docs for
    verification — the O(epoch)-per-epoch plan for large corpora) must
    find exactly the same verified pairs as the full corpus stream."""
    from nostr_data_pipeline_ray.pipelines import dedup_index as di

    new = {
        100: BASE[3] + " tiny tail",
        101: "fresh unseen content alpha beta gamma delta epsilon zeta eta",
        102: "fresh unseen content alpha beta gamma delta epsilon zeta THETA",
    }
    all_docs = _docs({**BASE, **new})

    def run(mode):
        monkeypatch.setattr(di, "_VERIFY_PRUNE", mode)
        idx = MinHashIndex(str(tmp_path / f"idx-prune-{mode}"))
        idx.bootstrap(_docs(BASE))
        out = idx.update(_docs(new), all_docs)
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        return set(zip(df["doc_a"], df["doc_b"]))

    assert run(True) == run(False) >= {(3, 100), (101, 102)}


def _first_row_file(idx):
    import os

    for f in idx._row_files():
        import pyarrow.parquet as pq

        if pq.read_metadata(f).num_rows:
            return f
    raise AssertionError("no nonempty committed file")


def test_deep_fsck_catches_content_corruption(tmp_path, ray_session):
    """Deep mode validates row CONTENTS the shallow footer sums can't see:
    out-of-range band values, unsorted band_hash, wrong schema — each
    planted with the row count preserved so only deep can catch it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    idx = MinHashIndex(str(tmp_path / "idx"))
    idx.bootstrap(_docs(BASE), update_id="e1")
    assert idx.fsck(deep=True)["ok"]
    victim = _first_row_file(idx)
    orig = pq.read_table(victim)

    # band out of range
    bad = orig.set_column(
        orig.schema.get_field_index("band"),
        "band",
        pa.array(
            np.full(orig.num_rows, idx.meta["bands"] + 3, np.int64), pa.int64()
        ),
    )
    pq.write_table(bad, victim)
    audit = idx.fsck(deep=True)
    assert not audit["ok"] and any("band values" in e for e in audit["errors"])
    assert idx.fsck()["ok"]  # shallow is blind to it — deep is the point

    # band_hash unsorted (breaks the row-group pruning contract)
    rev = orig.sort_by([("band_hash", "descending")])
    pq.write_table(rev, victim)
    audit = idx.fsck(deep=True)
    assert not audit["ok"] and any("not sorted" in e for e in audit["errors"])

    # wrong schema
    pq.write_table(orig.rename_columns(["x", "band_hash", "doc_id"]), victim)
    audit = idx.fsck(deep=True)
    assert not audit["ok"] and any("schema" in e for e in audit["errors"])

    # restore -> healthy again
    pq.write_table(orig, victim)
    assert idx.fsck(deep=True)["ok"]
