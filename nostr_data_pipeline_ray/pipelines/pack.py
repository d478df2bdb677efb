"""Sequence packing — assembling documents into fixed-token-budget training
sequences (the "sample packing" step of an LLM pre-training pipeline:
short documents are concatenated up to the context length so no padding
tokens are wasted).

Packing is an inherently sequential bin-packing decision, so it cannot be a
pure vectorized kernel — the engine makes it scale by sharding first:
documents are hash-partitioned into deterministic buckets (the same
multiplicative id-hash as the samplers — reproducible across runs and
cluster sizes), and each bucket is packed independently with best-fit-
decreasing (sort by token count desc, place each doc into the fullest bin
that still fits, via one bisect on the sorted remaining-capacity list —
O(n log n) per bucket). Pack ids are globally unique: bucket * 2^32 + bin.

Cross-bucket packing quality is not lost at scale: BFD within a random
hash-shard of thousands of documents is statistically indistinguishable
from global BFD (bin slack concentrates), while global packing would be a
total-order bottleneck. No SQL oracle — greedy packing isn't expressible
in SQL — so the registered query is rows-only and the invariants (complete
coverage, budget respected, determinism, near-optimal bin count) are
pinned by tests/test_pack.py.
"""

from __future__ import annotations

import os
from bisect import bisect_left, insort

import numpy as np
import pandas as pd

import ray.data as rd

from ..stages.shuffle import bucketed_map_groups, finalize32, id_hash


def _t(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _bfd_pack(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Best-fit-decreasing over one shard. ``tokens`` must already be in
    descending order; returns the bin index per position. A document larger
    than the budget gets a bin of its own (truncation/splitting is the
    tokenizer stage's decision, not the packer's)."""
    bins = np.empty(len(tokens), dtype=np.int64)
    rem: list[int] = []  # sorted remaining capacities
    who: dict[int, list[int]] = {}  # remaining -> bin ids (collision stack)
    n_bins = 0
    for i, n in enumerate(tokens):
        j = bisect_left(rem, n)
        if j == len(rem):  # nothing fits (or oversized doc) — open a bin
            b = n_bins
            n_bins += 1
            r = max(0, budget - int(n))
        else:
            old = rem.pop(j)
            b = who[old].pop()
            r = old - int(n)
        bins[i] = b
        insort(rem, r)
        who.setdefault(r, []).append(b)
    return bins


def pack_documents(
    ds,
    budget: int = 256,
    input_bytes: int | None = None,
    n_shards: int | None = None,
):
    """Assign every document of ``ds`` (needs ``doc_id`` + ``n_tokens``) to
    a training sequence: returns (doc_id, n_tokens, pack_id).

    ``n_shards`` defaults to one shard per ~64 MB of input (the engine's
    bucket-sizing convention) — a deterministic function of the input, so
    the same corpus packs identically at any cluster size."""
    from ..stages.shuffle import TARGET_BUCKET_BYTES

    if n_shards is None:
        n_shards = max(1, (input_bytes or 0) // TARGET_BUCKET_BYTES)
    shards = np.uint64(n_shards)

    def shard(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        # avalanche before the modulo: the raw multiplicative hash is
        # linear mod small powers of two (id_hash(id) % 2 == id % 2), so an
        # all-even id corpus would collapse every document into one shard
        # at n_shards=2 — see stages/shuffle.py:finalize32
        b["_shard"] = (
            finalize32(id_hash(b["doc_id"].to_numpy())) % shards
        ).astype(np.int64)
        return b

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard_id, part in g.groupby("_shard", sort=False):
            part = part.sort_values(
                ["n_tokens", "doc_id"], ascending=[False, True]
            )
            bins = _bfd_pack(part["n_tokens"].to_numpy(), budget)
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": part["doc_id"].to_numpy(),
                        "n_tokens": part["n_tokens"].to_numpy(),
                        "pack_id": (np.int64(shard_id) << np.int64(32)) + bins,
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_map_groups(
        ds.map_batches(shard, batch_format="pandas"),
        keys=["_shard"],
        fn=pack,
        input_bytes=input_bytes,
    )


def q_pack_sequences(sf_dir: str, budget: int = 256):
    """Pack the documents table into ``budget``-token training sequences.
    Token counts are whitespace-split words (the ``string_split(text, ' ')``
    convention the Jaccard miners use; note doc_token_stats' ``word_count``
    counts regex ``\\w+`` matches, which differs on punctuation) — swap in
    a real tokenizer's counts per-batch when one is available; the packing
    plumbing is tokenizer-agnostic."""
    import pyarrow.compute as pc

    def count_tokens(batch):
        words = pc.split_pattern(batch["text"], " ")
        return batch.drop_columns(["text"]).append_column(
            "n_tokens", pc.cast(pc.list_value_length(words), "int64")
        )

    path = _t(sf_dir, "documents")
    blocks = min(64, max(2, os.path.getsize(path) >> 20))
    docs = rd.read_parquet(
        path, columns=["doc_id", "text"], override_num_blocks=blocks
    ).map_batches(count_tokens, batch_format="pyarrow")
    return pack_documents(
        docs, budget=budget, input_bytes=os.path.getsize(path)
    )


QUERIES = {"pack_sequences": q_pack_sequences}
