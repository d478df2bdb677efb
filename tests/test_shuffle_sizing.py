"""Bucket-count sizing: the bucketed shuffle backbone must shard wider as
the input grows (a fixed 32 buckets means ~3 TB per bucket at 100 TB)."""

import os

import ray.data as rd

from nostr_data_pipeline_ray.stages.shuffle import (
    MAX_BUCKETS,
    TARGET_BUCKET_BYTES,
    resolve_buckets,
)


def test_bucket_count_grows_with_input_bytes():
    assert resolve_buckets(None, None, None) == 32          # no info → legacy default
    assert resolve_buckets(None, 7, 10**12) == 7            # explicit override wins
    assert resolve_buckets(None, None, TARGET_BUCKET_BYTES) == 32  # floor
    assert resolve_buckets(None, None, 100 * TARGET_BUCKET_BYTES) == 100
    tb100 = resolve_buckets(None, None, 100 * (1 << 40))    # 100 TB
    assert tb100 == min(MAX_BUCKETS, -(-100 * (1 << 40) // TARGET_BUCKET_BYTES))
    assert 32 < resolve_buckets(None, None, 100 * (1 << 30)) < tb100


def test_resolve_buckets_reads_dataset_source_files():
    path = "/root/testdata/sf0.01/events.parquet"
    ds = rd.read_parquet(path)
    assert resolve_buckets(ds) == resolve_buckets(None, None, os.path.getsize(path))
    # a transform erases source metadata → falls back to the default
    assert resolve_buckets(ds.map_batches(lambda b: b, batch_format="pyarrow")) == 32


def test_local_fast_path_matches_distributed_map_groups():
    """Inputs under LOCAL_MAX_INPUT_BYTES run the per-bucket fn once in a
    single task (num_buckets=1 semantics) — results must equal the
    distributed exchange's, and unknown sizes must NEVER take the local
    path (scale safety: never guess small)."""
    import numpy as np
    import pandas as pd

    from nostr_data_pipeline_ray.stages.shuffle import (
        _local_sized,
        bucketed_map_groups,
    )

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {"k": rng.integers(0, 50, 5_000), "v": rng.integers(0, 100, 5_000)}
    )
    ds = rd.from_pandas(df).repartition(4)
    fn = lambda g: g.groupby("k", sort=False)["v"].max().reset_index()

    local = (
        bucketed_map_groups(ds, ["k"], fn, input_bytes=1)  # forces local
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    dist = (
        bucketed_map_groups(ds, ["k"], fn, num_buckets=8)  # forces exchange
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)
    assert not _local_sized(ds, None)  # from_pandas: size unknown -> distributed
    assert not _local_sized(None, None)


def test_local_fast_path_matches_distributed_hash_join():
    import numpy as np
    import pandas as pd

    from nostr_data_pipeline_ray.stages.joins import bucketed_hash_join

    rng = np.random.default_rng(12)
    left = pd.DataFrame({"a": rng.integers(0, 40, 1_000), "x": np.arange(1_000)})
    right = pd.DataFrame({"b": np.arange(40), "y": np.arange(40) * 10})
    lds, rds = rd.from_pandas(left).repartition(3), rd.from_pandas(right)

    for how in ("inner", "left", "left_semi", "left_anti"):
        loc = (
            bucketed_hash_join(lds, rds, ["a"], ["b"], how=how, input_bytes=1)
            .to_pandas()
        )
        dist = (
            bucketed_hash_join(lds, rds, ["a"], ["b"], how=how, num_buckets=8)
            .to_pandas()
        )
        cols = list(loc.columns)
        loc = loc.sort_values(cols).reset_index(drop=True)
        dist = dist[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(loc, dist)


def test_local_fast_path_handles_empty_input(tmp_path):
    """A known-small but EMPTY input must produce an empty result, not
    crash (repartition(1) of zero rows can hand fn an empty frame — or no
    frame at all)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.stages.shuffle import bucketed_map_groups

    f = tmp_path / "empty.parquet"
    pq.write_table(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}),
        f,
    )
    ds = rd.read_parquet(str(f))
    out = bucketed_map_groups(
        ds, ["k"],
        lambda g: g.groupby("k", sort=False)["v"].sum().reset_index(),
        input_bytes=1,
    ).to_pandas()
    assert len(out) == 0
