"""Seeded shuffle → training shards: writer coverage, resume, determinism.

The assignment itself (doc_id, shard, pos) is oracle-checked by the
driver contract (shards._SHUFFLED_SHARDS_SQL); these tests pin what SQL
cannot express — the exactly-once resumable file layout."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

from nostr_data_pipeline_ray.pipelines import shards

SF = "/root/testdata/sf0.001"


def _read_all(out_dir: str) -> pd.DataFrame:
    parts = []
    for p in sorted(glob.glob(os.path.join(out_dir, "shard-*.parquet"))):
        parts.append(pq.read_table(p).to_pandas())
    return pd.concat(parts, ignore_index=True)


def test_write_shards_covers_corpus_exactly_once(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    manifest = shards.write_shards(SF, out, n_shards=8)
    n_docs = pq.read_metadata(os.path.join(SF, "documents.parquet")).num_rows

    assert len(manifest) == 8
    assert not manifest["skipped"].any()
    assert int(manifest["n_docs"].sum()) == n_docs

    data = _read_all(out)
    # every document in exactly one shard
    assert len(data) == n_docs
    assert data["doc_id"].is_unique
    # positions contiguous 0..n-1 within each shard, file order == pos order
    for shard_id, part in data.groupby("shard"):
        assert part["pos"].tolist() == list(range(len(part)))
    # the written assignment IS the oracle-checked assignment
    view = (
        shards.shuffled_shards(SF, n_shards=8)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        data[["doc_id", "shard", "pos"]].reset_index(drop=True), view
    )


def test_write_shards_resumes_only_missing(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    shards.write_shards(SF, out, n_shards=4)
    files = sorted(glob.glob(os.path.join(out, "shard-*.parquet")))
    assert len(files) == 4
    before = {p: os.stat(p).st_mtime_ns for p in files}
    victim = files[2]
    victim_content = pq.read_table(victim)
    os.remove(victim)

    manifest = shards.write_shards(SF, out, n_shards=4)
    assert manifest.set_index("shard")["skipped"].tolist() == [
        True, True, False, True
    ]
    # untouched shards were not rewritten; the missing one came back identical
    for p in files:
        if p == victim:
            assert pq.read_table(p).equals(victim_content)
        else:
            assert os.stat(p).st_mtime_ns == before[p]


def test_seed_changes_permutation_deterministically(ray_session):
    a = shards.shuffled_shards(SF, seed=7).to_pandas()
    b = shards.shuffled_shards(SF, seed=8).to_pandas()
    a2 = shards.shuffled_shards(SF, seed=7).to_pandas()

    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(a), key(a2))  # same seed → identical
    # different seed → a different permutation (not everything can agree)
    same = (key(a)[["shard", "pos"]] == key(b)[["shard", "pos"]]).all(axis=1)
    assert not same.all()


def test_finalizer_breaks_power_of_two_round_robin():
    """shard = h % 16 takes the LOW bits; the raw multiplicative hash is
    linear mod 16, so sequential ids would cycle through all 16 shards in
    a fixed stride (a strided, not pseudo-random, sample per shard). The
    fmix32 avalanche must break that cycle while staying bijective."""
    import numpy as np

    from nostr_data_pipeline_ray.stages.shuffle import finalize32, id_hash

    ids = np.arange(4096, dtype=np.int64)
    h = finalize32(id_hash(ids.astype(np.uint64) + np.uint64(7)))
    shard = (h % np.uint64(16)).astype(np.int64)
    # the raw hash satisfies shard[i+16] == shard[i] for ALL i; avalanched
    # assignment must not (any fixed small period would stride the sample)
    for period in (2, 4, 8, 16):
        assert (shard[period:] != shard[:-period]).any(), period
    # still bijective (each xor-shift / odd multiply is invertible mod 2^32)
    assert len(np.unique(finalize32(np.arange(100_000, dtype=np.uint64)))) == 100_000
    # and balanced: each shard within 3x sqrt-deviation of the mean
    counts = np.bincount(shard, minlength=16)
    assert counts.min() > 256 - 3 * 16 and counts.max() < 256 + 3 * 16


def test_finalizer_matches_duckdb_mirror():
    """The exact xor/shift/multiply chain the oracle SQL runs, checked on
    adversarial ids (beyond 2^32, near the wrap) — the same exact-
    arithmetic contract id_hash carries."""
    import duckdb
    import numpy as np
    import pandas as pd

    from nostr_data_pipeline_ray.stages.shuffle import finalize32, id_hash

    ids = np.array(
        [0, 1, 15, 2**31 - 1, 2**32 - 5, 2**32, 2**40 + 123, 2**52 + 7],
        dtype=np.int64,
    )
    mine = finalize32(id_hash(ids.astype(np.uint64) + np.uint64(7))).astype(np.int64)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": ids}))
    got = con.execute(
        """
        WITH h0 AS (SELECT doc_id, CAST(((doc_id + 7)::HUGEINT * 2654435761)
                         % 4294967296 AS BIGINT) AS hv FROM t),
             h1 AS (SELECT doc_id, CAST((xor(hv, hv >> 16)::HUGEINT * 2246822507)
                         % 4294967296 AS BIGINT) AS hv FROM h0),
             h2 AS (SELECT doc_id, CAST((xor(hv, hv >> 13)::HUGEINT * 3266489909)
                         % 4294967296 AS BIGINT) AS hv FROM h1)
        SELECT xor(hv, hv >> 16) AS hv FROM h2 ORDER BY doc_id
        """
    ).df()["hv"].to_numpy()
    order = np.argsort(ids, kind="stable")
    assert (mine[order] == got).all()


def test_write_shards_refuses_mismatched_resume(ray_session, tmp_path):
    """The resume check is by filename, so resuming with different
    parameters (or over files from an unknown assignment version) must
    fail loudly instead of mixing two permutations."""
    import json

    import pytest as _pytest

    out = str(tmp_path / "shards")
    shards.write_shards(SF, out, n_shards=4)
    # different n_shards / seed -> refuse
    with _pytest.raises(ValueError, match="different parameters"):
        shards.write_shards(SF, out, n_shards=8)
    with _pytest.raises(ValueError, match="different parameters"):
        shards.write_shards(SF, out, n_shards=4, seed=9)
    # same parameters -> clean resume (all skipped)
    m = shards.write_shards(SF, out, n_shards=4)
    assert m["skipped"].all()
    # shard files with no meta (pre-versioning dir) -> refuse
    os.remove(os.path.join(out, "_shards_meta.json"))
    with _pytest.raises(ValueError, match="no .?_shards_meta"):
        shards.write_shards(SF, out, n_shards=4)
