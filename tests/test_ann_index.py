"""Persisted incremental IVF ANN index: exhaustive probe == brute force,
planted-cluster recall for the approximate probe, exactly-once fold-in,
reopen-from-disk, parameter guard, fsck."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from nostr_data_pipeline_ray.pipelines.ann_index import (
    IvfIndex,
    q_ann_topk_ivf_index,
)

SF = "/root/testdata/sf0.001"


def _vecs(sf):
    return rd.read_parquet(
        os.path.join(sf, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def test_exhaustive_probe_equals_brute_force(ray_session, tmp_path):
    from nostr_data_pipeline_ray.pipelines.analytics import q_ann_topk

    got = q_ann_topk_ivf_index(SF).reset_index(drop=True)
    want = q_ann_topk(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"vec_id": "int64"}), want.astype({"vec_id": "int64"})
    )


def test_incremental_add_exactly_once_and_reopen(ray_session, tmp_path):
    root = str(tmp_path / "idx")
    idx = IvfIndex(root, n_lists=8)
    n1 = idx.bootstrap(
        _vecs(SF).map_batches(lambda b: b[b["vec_id"] < 300], batch_format="pandas"),
        update_id="e1",
    )
    n2 = idx.add(
        _vecs(SF).map_batches(lambda b: b[b["vec_id"] >= 300], batch_format="pandas"),
        update_id="e2",
    )
    assert n1 == 300 and n1 + n2 == idx.meta["n_vecs"]
    # retried epoch folds in exactly once
    again = idx.add(
        _vecs(SF).map_batches(lambda b: b[b["vec_id"] >= 300], batch_format="pandas"),
        update_id="e2",
    )
    assert again == 0 and idx.meta["n_vecs"] == n1 + n2
    assert idx.fsck()["ok"]

    # a fresh handle reads centroids + manifest from disk and answers
    reopened = IvfIndex(root, n_lists=8)
    q = np.asarray(
        pq.read_table(
            os.path.join(SF, "embeddings.parquet"),
            columns=["embedding"],
            filters=[("vec_id", "==", 5)],
        )["embedding"][0].as_py()
    )
    res = reopened.query(q, k=5, nprobe=8, exclude=5)
    assert len(res) == 5 and 5 not in set(res["vec_id"])

    # parameter mismatch is a loud error, never a silently wrong index
    with pytest.raises(ValueError, match="different IVF parameters"):
        IvfIndex(root, n_lists=16)


def test_compact_folds_updates_row_identical(ray_session, tmp_path):
    root = str(tmp_path / "idx")
    idx = IvfIndex(root, n_lists=8)
    idx.bootstrap(
        _vecs(SF).map_batches(lambda b: b[b["vec_id"] < 300], batch_format="pandas"),
        update_id="e1",
    )
    idx.add(
        _vecs(SF).map_batches(lambda b: b[b["vec_id"] >= 300], batch_format="pandas"),
        update_id="e2",
    )
    q = np.asarray(
        pq.read_table(
            os.path.join(SF, "embeddings.parquet"),
            columns=["embedding"],
            filters=[("vec_id", "==", 0)],
        )["embedding"][0].as_py()
    )
    before = idx.query(q, k=10, nprobe=8, exclude=0)

    out = idx.compact()
    assert out["compacted"] and out["updates_folded"] == 2
    assert len(idx.meta["committed"]) == 1
    assert idx.fsck()["ok"]
    after = idx.query(q, k=10, nprobe=8, exclude=0)
    pd.testing.assert_frame_equal(before, after)
    # second compact is a no-op; exactly-once survives compaction
    assert idx.compact() == {"compacted": False, "updates": 1}
    assert idx.add(_vecs(SF), update_id="e2") == 0
    # adding after compaction still works
    n3 = idx.add(
        _vecs(SF).map_batches(lambda b: b[b["vec_id"] < 10], batch_format="pandas"),
        update_id="e3",
    )
    assert n3 == 10 and idx.fsck()["ok"]


def test_delete_tombstones_then_compact_purges(ray_session, tmp_path):
    root = str(tmp_path / "idx")
    idx = IvfIndex(root, n_lists=8)
    idx.bootstrap(_vecs(SF), update_id="e1")
    q = np.asarray(
        pq.read_table(
            os.path.join(SF, "embeddings.parquet"),
            columns=["embedding"],
            filters=[("vec_id", "==", 0)],
        )["embedding"][0].as_py()
    )
    before = idx.query(q, k=10, nprobe=8, exclude=0)
    victims = before["vec_id"].tolist()[:2]

    assert idx.delete(victims, update_id="d1") == 2
    assert idx.delete(victims, update_id="d1") == 0  # exactly-once
    after = idx.query(q, k=10, nprobe=8, exclude=0)
    assert not set(victims) & set(after["vec_id"])
    # survivors keep their relative order from the pre-delete ranking
    kept_before = [v for v in before["vec_id"] if v not in victims]
    assert after["vec_id"].tolist()[: len(kept_before)] == kept_before

    out = idx.compact()  # single update but pending tombstones -> compacts
    assert out["compacted"] and out["purged"] == 2
    assert idx.meta["tombstones"] == [] and idx.fsck()["ok"]
    assert idx.meta["n_vecs"] == 500 - 2
    again = idx.query(q, k=10, nprobe=8, exclude=0)
    pd.testing.assert_frame_equal(after, again)


def test_fsck_catches_missing_committed_subdir(ray_session, tmp_path):
    root = str(tmp_path / "idx")
    idx = IvfIndex(root, n_lists=4)
    idx.bootstrap(_vecs(SF), update_id="e1")
    assert idx.fsck()["ok"]
    victim = os.path.join(idx.rows_dir, idx.meta["committed"][0])
    shutil.rmtree(victim)
    audit = idx.fsck()
    assert not audit["ok"] and "missing" in audit["errors"][0]


def test_approximate_probe_recall_on_planted(ray_session, tmp_path):
    rng = np.random.default_rng(9)
    dim, n_noise, n_plant = 64, 480, 10
    q = rng.standard_normal(dim)
    planted = q[None, :] + 0.05 * rng.standard_normal((n_plant, dim))
    noise = rng.standard_normal((n_noise, dim))
    mat = np.vstack([q, planted, noise]).astype(np.float64)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float64())),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    idx = IvfIndex(str(tmp_path / "idx"), n_lists=16)
    idx.bootstrap(_vecs(str(tmp_path)), update_id="e1")
    res = idx.query(q, k=10, nprobe=3, exclude=0)
    # the planted cluster shares the query's inverted list → near-full recall
    hits = set(res["vec_id"]) & set(range(1, n_plant + 1))
    assert len(hits) >= 8


def test_sq_dists_matches_broadcast_kernel():
    """The matmul-form kernel (O(rows×lists) memory) must assign every
    point to the same centroid as the broadcast-temporary form it
    replaced — including on EXACT ties, planted via integer-valued
    vectors (both forms are then exact in float64, so equal d² ties
    break identically at argmin's first-min rule)."""
    from nostr_data_pipeline_ray.functions.linalg import sq_dists

    rng = np.random.default_rng(42)
    for x, c in [
        (rng.standard_normal((257, 48)), rng.standard_normal((19, 48))),
        # integer case with duplicated centroids -> exact argmin ties
        (
            rng.integers(-5, 6, size=(300, 8)).astype(np.float64),
            np.repeat(rng.integers(-5, 6, size=(6, 8)).astype(np.float64), 2, axis=0),
        ),
    ]:
        ref = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        got = sq_dists(x, c)
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-9)
        np.testing.assert_array_equal(got.argmin(axis=1), ref.argmin(axis=1))


def test_query_zero_norm_guard(ray_session, tmp_path):
    """A zero query vector raises; a stored all-zero embedding is excluded
    from results instead of emitting NaN scores that corrupt the top-k."""
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((40, 16))
    mat[7] = 0.0  # planted zero-norm stored vector
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float64())),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    idx = IvfIndex(str(tmp_path / "idx"), n_lists=4)
    idx.bootstrap(_vecs(str(tmp_path)), update_id="e1")
    with pytest.raises(ValueError, match="zero-norm query"):
        idx.query(np.zeros(16), k=5)
    res = idx.query(mat[0], k=len(mat), nprobe=4, exclude=0)
    assert 7 not in set(res["vec_id"])
    assert not res["score"].isna().any()


def test_single_writer_lock_on_index_mutations(ray_session, tmp_path):
    import fcntl

    from nostr_data_pipeline_ray.state.lake import ConcurrentWriterError

    root = str(tmp_path / "idx")
    idx = IvfIndex(root, n_lists=4)
    idx.bootstrap(_vecs(SF), update_id="e1")
    fd = os.open(os.path.join(root, "_writer.lock"), os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    try:
        with pytest.raises(ConcurrentWriterError):
            idx.delete([1], update_id="d1")
        with pytest.raises(ConcurrentWriterError):
            idx.add(_vecs(SF), update_id="e2")
    finally:
        os.close(fd)
    # lock released -> mutations proceed
    assert idx.delete([1], update_id="d1") == 1


def test_compact_overwrites_stale_staged_dir(ray_session, tmp_path):
    """A crash between staging the compacted subdir and the meta swap
    leaves a stale c-XXXXX dir: the next compact must overwrite it and
    produce a correct index (the lake's orphan-overwrite discipline)."""
    root = str(tmp_path / "idx")
    idx = IvfIndex(root, n_lists=4)
    idx.bootstrap(
        _vecs(SF).map_batches(lambda b: b[b["vec_id"] < 250], batch_format="pandas"),
        update_id="e1",
    )
    idx.add(
        _vecs(SF).map_batches(lambda b: b[b["vec_id"] >= 250], batch_format="pandas"),
        update_id="e2",
    )
    # simulate the crashed attempt: a half-written staged dir
    stale = os.path.join(idx.rows_dir, "c-00000-compact")
    os.makedirs(stale)
    with open(os.path.join(stale, "list-00000.parquet"), "wb") as f:
        f.write(b"garbage not parquet")
    out = idx.compact()
    assert out["compacted"] and out["rows"] == 500
    assert idx.fsck()["ok"]


def test_deep_fsck_catches_misassignment_and_dim(ray_session, tmp_path):
    """Deep mode validates vectors against the quantizer: a vector filed
    under the wrong list (invisible to the probes that should find it) and
    a dim mismatch are caught with row counts intact — shallow is blind to
    both."""
    root = str(tmp_path / "idx")
    idx = IvfIndex(root, n_lists=4)
    idx.bootstrap(_vecs(SF), update_id="e1")
    assert idx.fsck(deep=True)["ok"]

    sub = os.path.join(idx.rows_dir, idx.meta["committed"][0])
    files = sorted(
        os.path.join(sub, f) for f in os.listdir(sub) if f.endswith(".parquet")
    )
    assert len(files) >= 2
    a, b = files[0], files[1]
    ta, tb = pq.read_table(a), pq.read_table(b)
    # swap one row between two lists: totals unchanged, assignment broken
    swapped_a = pa.concat_tables([ta.slice(1), tb.slice(0, 1)]).sort_by("vec_id")
    swapped_b = pa.concat_tables([tb.slice(1), ta.slice(0, 1)]).sort_by("vec_id")
    pq.write_table(swapped_a, a)
    pq.write_table(swapped_b, b)
    audit = idx.fsck(deep=True)
    assert not audit["ok"]
    assert any("nearest centroid is not list" in e for e in audit["errors"])
    assert idx.fsck()["ok"]  # shallow passes — row counts are intact

    # dim mismatch: truncate every embedding in one file
    trunc = pa.table(
        {
            "vec_id": ta["vec_id"],
            "embedding": pa.array(
                [v[:-1] for v in ta["embedding"].to_pylist()],
                pa.list_(pa.float64()),
            ),
        }
    )
    pq.write_table(ta, a)
    pq.write_table(tb, b)
    assert idx.fsck(deep=True)["ok"]  # restored
    pq.write_table(trunc, a)
    audit = idx.fsck(deep=True)
    assert not audit["ok"] and any("dim" in e for e in audit["errors"])


def test_deep_fsck_tolerates_centroid_ties(ray_session, tmp_path):
    """A vector (near-)equidistant between two centroids is a healthy
    assignment in EITHER list — argmin tie-breaks (and the expanded-form
    kernel's ~1e-9 cancellation error vs the kernel that wrote an older
    index) must not read as corruption. Plant the exact midpoint of the
    two centroids into each list in turn: deep fsck stays ok both ways."""
    import numpy as np

    root = str(tmp_path / "idx")
    idx = IvfIndex(root, n_lists=2)
    idx.bootstrap(_vecs(SF), update_id="e1")
    assert idx.fsck(deep=True)["ok"]

    mid = idx._centroids.mean(axis=0)  # equidistant from both centroids
    sub = os.path.join(idx.rows_dir, idx.meta["committed"][0])
    for f in sorted(os.listdir(sub)):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(sub, f)
        t = pq.read_table(p)
        if not t.num_rows:
            continue
        emb = t["embedding"].to_pylist()
        emb[0] = [float(x) for x in mid]  # replace in place: counts intact
        pq.write_table(
            pa.table({"vec_id": t["vec_id"],
                      "embedding": pa.array(emb, pa.list_(pa.float64()))}),
            p,
        )
    audit = idx.fsck(deep=True)
    assert audit["ok"], audit["errors"]
