"""Persisted-IVF stress at realistic index shape (round-4 verdict ask #3):
n_lists ≈ sqrt(n) on a corpus big enough that the list count is non-toy,
through a full lifecycle — bootstrap, multi-epoch add, targeted delete,
compact — reporting steady-state epoch seconds, query latency, and
per-list file counts before/after compact.

This is also the proof-of-fix for the distance-kernel memory hazard: at
n_lists=1024 the OLD broadcast-temporary kernel needed
rows × n_lists × dim × 8 B of scratch per batch (4096 × 1024 × 64 → 2.1 GB,
and 25 GB at dim 768 — an OOM before any real corpus); the matmul form is
rows × n_lists × 8 B (32 MB).

Usage: python scripts/ivf_stress.py [n_vecs] [dim]   (default 1_000_000 64)
Owns its Ray session. Prints one JSON blob; paste the table into
BASELINE.md.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def synth_vectors(path: str, n: int, dim: int, seed: int = 5) -> None:
    """Deterministic gaussian vectors, written in row-group-sized chunks."""
    rng = np.random.default_rng(seed)
    writer = None
    chunk = 65536
    for start in range(0, n, chunk):
        m = rng.standard_normal((min(chunk, n - start), dim)).astype(np.float64)
        t = pa.table({
            "vec_id": pa.array(range(start, start + len(m)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float64()), dim
            ).cast(pa.list_(pa.float64())),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    writer.close()


def count_list_files(idx) -> int:
    return sum(
        1
        for sub in idx.meta["committed"]
        if os.path.isdir(os.path.join(idx.rows_dir, sub))
        for f in os.listdir(os.path.join(idx.rows_dir, sub))
        if f.endswith(".parquet")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_lists = 1 << int(round(math.log2(math.sqrt(n))))  # ≈ sqrt(n), pow2

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from nostr_data_pipeline_ray.pipelines.ann_index import IvfIndex

    work = "/tmp/ivf_stress"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    src = os.path.join(work, "vectors.parquet")
    t0 = time.time()
    synth_vectors(src, n, dim)
    gen_s = time.time() - t0
    nbytes = os.path.getsize(src)

    def slice_ds(lo, hi):
        return rd.read_parquet(src, columns=["vec_id", "embedding"]).map_batches(
            lambda b: b[(b["vec_id"] >= lo) & (b["vec_id"] < hi)],
            batch_format="pandas",
        )

    boot_hi = int(n * 0.8)
    epoch_n = (n - boot_hi) // 4

    idx = IvfIndex(os.path.join(work, "idx"), n_lists=n_lists)
    t0 = time.time()
    idx.bootstrap(slice_ds(0, boot_hi), update_id="e0",
                  input_bytes=int(nbytes * 0.8))
    boot_s = time.time() - t0

    epoch_secs = []
    for e in range(4):
        lo = boot_hi + e * epoch_n
        hi = boot_hi + (e + 1) * epoch_n if e < 3 else n
        t0 = time.time()
        added = idx.add(slice_ds(lo, hi), update_id=f"e{e+1}",
                        input_bytes=int(nbytes * (hi - lo) / n))
        epoch_secs.append(round(time.time() - t0, 2))
        assert added == hi - lo

    files_before = count_list_files(idx)

    # query latency: exact (exhaustive probe) vs default nprobe
    q = pq.read_table(src, columns=["embedding"],
                      filters=[("vec_id", "==", 7)])["embedding"][0].as_py()
    q = np.asarray(q)
    t0 = time.time()
    idx.query(q, k=10, nprobe=8, exclude=7)
    q_probe8_s = time.time() - t0
    t0 = time.time()
    idx.query(q, k=10, nprobe=64, exclude=7)
    q_probe64_s = time.time() - t0

    # delete 1% then compact (physical purge + per-list fold)
    rng = np.random.default_rng(9)
    victims = rng.choice(n, size=n // 100, replace=False)
    t0 = time.time()
    idx.delete(victims.tolist(), update_id="d0")
    del_s = time.time() - t0
    t0 = time.time()
    out = idx.compact()
    compact_s = time.time() - t0
    files_after = count_list_files(idx)
    audit = idx.fsck()
    assert audit["ok"], audit
    assert out["purged"] == len(set(victims.tolist()))

    t0 = time.time()
    idx.query(q, k=10, nprobe=8, exclude=7)
    q_after_compact_s = time.time() - t0

    print(json.dumps({
        "n_vecs": n, "dim": dim, "n_lists": n_lists,
        "source_mb": round(nbytes / 2**20, 1),
        "gen_s": round(gen_s, 1),
        "bootstrap_s": round(boot_s, 2),
        "epoch_rows": epoch_n,
        "epoch_secs": epoch_secs,
        "query_nprobe8_s": round(q_probe8_s, 3),
        "query_nprobe64_s": round(q_probe64_s, 3),
        "query_nprobe8_after_compact_s": round(q_after_compact_s, 3),
        "list_files_before_compact": files_before,
        "list_files_after_compact": files_after,
        "delete_s": round(del_s, 2),
        "compact_s": round(compact_s, 2),
        "purged": out["purged"],
        "fsck_ok": audit["ok"],
    }))
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
