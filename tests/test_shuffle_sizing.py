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
