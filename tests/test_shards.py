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
