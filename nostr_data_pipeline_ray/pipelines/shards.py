"""Deterministic seeded global shuffle into fixed training shards.

The last step of a training-data pipeline: after curation the corpus is
globally shuffled (so each training shard is an unbiased sample and
epoch order is decorrelated from ingest order) and written as a FIXED
number of shards a data loader can stream. Two requirements drive the
design:

- **Deterministic + seeded.** The shuffle must be reproducible from
  (corpus, seed) alone — re-running the pipeline, resuming a failed
  write, or re-deriving "which shard holds doc X" must all agree.
  ``ray.data.Dataset.random_shuffle`` is an all-to-all exchange whose
  output order is not a pure function the oracle could re-derive, so the
  engine instead uses the repo's bijective multiplicative hash
  (stages/shuffle.py:id_hash) avalanched through murmur3 fmix32
  (stages/shuffle.py:finalize32 — the multiplicative hash alone is
  linear mod powers of two, which would round-robin sequential ids
  across a power-of-two shard count) over ``doc_id + seed``:
  shard = h % n, within-shard order = ascending h (a seeded
  pseudo-random permutation, tie-broken by doc_id where ids exceed the
  2^32 hash range). Exactly reproducible as DuckDB HUGEINT/xor-shift
  arithmetic — the same SQL-twin discipline the deterministic samplers
  use — so the full assignment carries an oracle.

- **One exchange, resumable output.** Shard assignment is map-side; the
  single bucketed exchange co-locates each shard in one task, which
  sorts it and (in the writer) emits ONE parquet file per shard via
  tmp-file + atomic rename. A re-run skips shards whose final file
  exists — a failed run resumes by completing only missing shards
  (the brief's "resumable output" requirement, same discipline as
  cdc.py export_snapshot).

At 100 TB: assignment is embarrassingly parallel; the exchange moves
each row once; ``n_shards`` is the operator knob (thousands of shards →
thousands of independent sort-and-write tasks, each ~corpus/n_shards in
size). No driver-side state beyond the O(n_shards) manifest.

Reference analog: the reference pipeline ends at an analytics store and
has no training-shard emitter; this operator is part of the
training-data extension set (SURVEY.md §2 extensions), like pack.py.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

from ..stages.shuffle import bucketed_map_groups, finalize32, id_hash, table_bytes

# Defaults for the registered query: small-but-nontrivial shard count so
# the sf fixtures exercise multi-shard assignment; the seed is part of
# the oracle SQL, so both are baked into the registered query's identity.
N_SHARDS = 16
SEED = 7


def _t(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _with_assignment(batch: pd.DataFrame, n_shards: int, seed: int) -> pd.DataFrame:
    """Map-side shard assignment: h is the seeded permutation key.

    ``id_hash`` alone is linear mod powers of two (``shard = h % 16``
    would round-robin sequential doc_ids — a strided, not pseudo-random,
    sample per shard), so the multiplicative hash is avalanched through
    ``finalize32`` (murmur3 fmix32) before the modulo. Both steps are
    bijective mod 2^32, so ``doc_id + seed`` gives a distinct permutation
    per seed with zero collisions for ids below 2^32; above that the
    (h, doc_id) sort key keeps the order deterministic."""
    ids = batch["doc_id"].to_numpy()
    batch = batch.copy(deep=False)
    batch["_h"] = finalize32(id_hash(ids + np.int64(seed))).astype(np.int64)
    batch["shard"] = (batch["_h"] % np.int64(n_shards)).astype(np.int64)
    return batch


def _order_within_shards(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket kernel: all rows of any shard are co-located, so the
    within-shard position is a sort + cumcount (vectorized; mergesort for
    a stable, fully-deterministic order on the (h, doc_id) key)."""
    g = g.sort_values(["_h", "doc_id"], kind="mergesort")
    g["pos"] = g.groupby("shard", sort=False).cumcount().astype(np.int64)
    return g.drop(columns=["_h"])


def shuffled_shards(
    sf_dir: str,
    n_shards: int = N_SHARDS,
    seed: int = SEED,
    num_buckets: int | None = None,
):
    """The assignment view: (doc_id, shard, pos) for every document."""
    path = _t(sf_dir, "documents")
    ds = rd.read_parquet(path, columns=["doc_id"]).map_batches(
        lambda b: _with_assignment(b, n_shards, seed), batch_format="pandas"
    )
    return bucketed_map_groups(
        ds,
        keys=["shard"],
        fn=lambda g: _order_within_shards(g)[["doc_id", "shard", "pos"]],
        num_buckets=num_buckets,
        input_bytes=table_bytes(path),
    )


def q_shuffled_shards(sf_dir: str):
    return shuffled_shards(sf_dir)


# the fmix32 chain, step-for-step: xor-shift and odd-multiply both mirror
# exactly (values stay < 2^32, so BIGINT xor/shift are the 32-bit ops and
# the HUGEINT multiply-mod equals the uint64 wrap — same argument as id_hash)
_SHUFFLED_SHARDS_SQL = f"""
WITH h0 AS (
    SELECT doc_id,
           CAST(((doc_id + {SEED})::HUGEINT * 2654435761) % 4294967296
                AS BIGINT) AS hv
    FROM documents
), h1 AS (
    SELECT doc_id,
           CAST((xor(hv, hv >> 16)::HUGEINT * {0x85EBCA6B}) % 4294967296
                AS BIGINT) AS hv
    FROM h0
), h2 AS (
    SELECT doc_id,
           CAST((xor(hv, hv >> 13)::HUGEINT * {0xC2B2AE35}) % 4294967296
                AS BIGINT) AS hv
    FROM h1
), h AS (
    SELECT doc_id, xor(hv, hv >> 16) AS hv FROM h2
)
SELECT doc_id,
       hv % {N_SHARDS} AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hv % {N_SHARDS}
                               ORDER BY hv, doc_id) AS BIGINT) - 1 AS pos
FROM h
"""


def write_shards(
    sf_dir: str,
    out_dir: str,
    n_shards: int = N_SHARDS,
    seed: int = SEED,
    columns: list[str] | None = None,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Materialize the shuffled corpus as ``n_shards`` parquet files.

    Exactly-once per shard: each shard is written to ``<final>.tmp`` then
    atomically renamed; a shard whose final file already exists is
    skipped untouched (``skipped=True`` in the manifest), so a partially
    failed run resumes by completing only the missing shards. The
    bucketed exchange co-locates each shard in exactly one task, so no
    two tasks ever race on a shard's final name (a retried task re-checks
    existence and the rename is atomic either way).

    Resume safety: the resume check is by FILENAME, so it is only valid
    when the existing files were produced by the same assignment function
    and parameters. A ``_shards_meta.json`` written before the first
    shard records (n_shards, seed, columns, assignment version); resuming
    into a directory whose meta mismatches — or which holds shard files
    with no meta at all (an unknown/older assignment) — raises instead of
    silently mixing two permutations (duplicated + missing documents).

    Returns the manifest — O(n_shards) rows, the only driver-side
    collection."""
    os.makedirs(out_dir, exist_ok=True)
    path = _t(sf_dir, "documents")
    cols = ["doc_id"] + [c for c in (columns or ["text"]) if c != "doc_id"]

    import json

    meta_path = os.path.join(out_dir, "_shards_meta.json")
    meta = {
        "n_shards": int(n_shards),
        "seed": int(seed),
        "columns": cols,
        "assignment": "knuth-fmix32/v2",
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        if old != meta:
            raise ValueError(
                f"write_shards: {out_dir} was written with different "
                f"parameters ({old}) than requested ({meta}) — resuming "
                "would mix two shard assignments; use a fresh out_dir"
            )
    else:
        if any(
            f.startswith("shard-") and f.endswith(".parquet")
            for f in os.listdir(out_dir)
        ):
            raise ValueError(
                f"write_shards: {out_dir} holds shard files but no "
                "_shards_meta.json — unknown assignment version; refusing "
                "to resume over them"
            )
        tmp_meta = meta_path + ".tmp"
        with open(tmp_meta, "w") as f:
            json.dump(meta, f)
        os.replace(tmp_meta, meta_path)
    ds = rd.read_parquet(path, columns=cols).map_batches(
        lambda b: _with_assignment(b, n_shards, seed), batch_format="pandas"
    )

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        g = _order_within_shards(g)
        rows = []
        for shard_id, part in g.groupby("shard", sort=True):
            final = os.path.join(out_dir, f"shard-{int(shard_id):05d}.parquet")
            if os.path.exists(final):
                rows.append((int(shard_id), len(part), final, True))
                continue
            tmp = final + ".tmp"
            pq.write_table(
                pa.Table.from_pandas(
                    part.reset_index(drop=True), preserve_index=False
                ),
                tmp,
            )
            os.replace(tmp, final)
            rows.append((int(shard_id), len(part), final, False))
        return pd.DataFrame(
            rows, columns=["shard", "n_docs", "path", "skipped"]
        )

    manifest = bucketed_map_groups(
        ds,
        keys=["shard"],
        fn=write_bucket,
        num_buckets=num_buckets,
        input_bytes=table_bytes(path),
    )
    # O(n_shards) rows — bounded driver collection by construction
    out = manifest.to_pandas()

    # a shard no document hashed into never reaches the exchange — complete
    # it with an empty file (same schema, same tmp+rename discipline) so a
    # data loader iterating shard-00000..shard-{n-1} and the resume check
    # both see exactly n_shards files, never a FileNotFound ambiguity
    missing = sorted(set(range(n_shards)) - set(out["shard"].astype(int)))
    if missing:
        import pyarrow as pa
        import pyarrow.parquet as pq

        base = pq.read_schema(_part_schema_path(path))
        fields = [base.field(c) for c in cols] + [
            pa.field("shard", pa.int64()), pa.field("pos", pa.int64())
        ]
        empty = pa.schema(fields).empty_table()
        rows = []
        for shard_id in missing:
            final = os.path.join(out_dir, f"shard-{shard_id:05d}.parquet")
            if not os.path.exists(final):
                tmp = final + ".tmp"
                pq.write_table(empty, tmp)
                os.replace(tmp, final)
                rows.append((shard_id, 0, final, False))
            else:
                rows.append((shard_id, 0, final, True))
        out = pd.concat(
            [out, pd.DataFrame(rows, columns=["shard", "n_docs", "path", "skipped"])],
            ignore_index=True,
        )
    return out.sort_values("shard").reset_index(drop=True)


def _part_schema_path(path: str) -> str:
    """First parquet file of a table that may be a directory of parts."""
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                return os.path.join(path, name)
    return path


QUERIES = {
    "shuffled_shards": q_shuffled_shards,
}
ORACLE = {
    "shuffled_shards": _SHUFFLED_SHARDS_SQL,
}
