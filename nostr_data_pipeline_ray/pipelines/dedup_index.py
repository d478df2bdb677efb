"""Incremental near-duplicate index — the CDC answer to corpus dedup.

A batch near-dup pass (q_minhash_near_dup) re-mines the WHOLE corpus; an
ingest pipeline that adds a few million documents per epoch to a
100-TB lake cannot afford new×old to degrade into all×all. This module
persists the MinHash-LSH bucket table ``(band, band_hash, doc_id)`` as
parquet next to the lake, and each ``update`` mines candidate pairs ONLY
for buckets the new documents touch:

1. signature the new docs (the same vectorized ``MinHashLSH`` stage as the
   batch path — identical parameters are persisted in ``index_meta.json``
   and validated on reopen, because signatures from different parameter
   sets must never share an index);
2. the touched-bucket key set is O(new · bands) — a broadcast SMALL side —
   so the existing index is read with a map-side ``isin`` prefilter: only
   rows of touched buckets cross the exchange (at real scale the row files
   are written sorted by ``band_hash``, so parquet row-group min/max stats
   additionally prune the read itself);
3. one bucketed pass emits candidate pairs with at least one NEW endpoint
   (new×old and new×new — never old×old, those were mined when the old
   docs were new);
4. the shared distributed `_endpoint_verify` attaches shingle sets and
   keeps exact word-Jaccard ≥ threshold — nothing corpus-sized touches the
   driver;
5. the new signature rows are appended to the index (single-writer, like
   the lake: the CDC apply loop calls this after its commit).

The index grows by O(bands) rows per document — the same asymptotics as
the lake itself.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..stages.actors import cached_get, per_worker
from ..stages.dedup_stages import MinHashLSH, word_shingles
from ..stages.shuffle import bucketed_map_groups

_MAX_BUCKET = 512  # hot-bucket cap, same rationale as pairs_from_group


class MinHashIndex:
    """Persisted LSH bucket table with incremental candidate mining."""

    META = "index_meta.json"

    def __init__(
        self,
        index_dir: str,
        num_perm: int = 64,
        bands: int = 16,
        ngram: int = 3,
        seed: int = 7,
    ):
        self.index_dir = index_dir
        self.rows_dir = os.path.join(index_dir, "rows")
        meta_path = os.path.join(index_dir, self.META)
        want = {"num_perm": num_perm, "bands": bands, "ngram": ngram, "seed": seed}
        if os.path.exists(meta_path):
            have = json.load(open(meta_path))
            mismatch = {k: (have.get(k), v) for k, v in want.items() if have.get(k) != v}
            if mismatch:
                raise ValueError(
                    f"index at {index_dir} was built with different LSH "
                    f"parameters: {mismatch} — signatures are incompatible"
                )
            self.meta = have
        else:
            os.makedirs(self.rows_dir, exist_ok=True)
            self.meta = {**want, "n_updates": 0, "n_docs": 0}
            self._write_meta()

    def _write_meta(self) -> None:
        tmp = os.path.join(self.index_dir, f".{self.META}.tmp")
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, os.path.join(self.index_dir, self.META))

    def _hasher_cls(self):
        """No-arg class for per_worker (one instance per worker process),
        closing over the persisted LSH parameters."""
        meta = self.meta

        class _Hasher(MinHashLSH):
            def __init__(self):
                super().__init__(
                    num_perm=meta["num_perm"],
                    bands=meta["bands"],
                    ngram=meta["ngram"],
                    seed=meta["seed"],
                )

        _Hasher.__name__ = "IndexHasher"
        return _Hasher

    def _row_files(self) -> list[str]:
        if not os.path.isdir(self.rows_dir):
            return []
        return sorted(
            os.path.join(self.rows_dir, f)
            for f in os.listdir(self.rows_dir)
            if f.endswith(".parquet")
        )

    def update(
        self,
        new_docs,
        corpus,
        threshold: float = 0.5,
        input_bytes: int | None = None,
    ):
        """Mine verified near-dup pairs involving at least one NEW document,
        then fold the new docs into the index.

        ``new_docs``: Dataset[doc_id, text] of this epoch's additions (the
        caller tracks novelty — the CDC watermark already does). ``corpus``:
        Dataset[doc_id, text] covering every indexed doc plus the new ones
        (only candidate ENDPOINTS are attached from it — a bucketed
        semi-join, never a scan-side quadratic). Returns a materialized
        Dataset[(doc_a, doc_b, jaccard)]."""
        from .dedup import _SEP, _endpoint_verify, _round6

        sig_new = (
            new_docs.map_batches(
                per_worker(self._hasher_cls()), batch_format="pandas"
            )
            .map_batches(
                lambda b: b.assign(is_new=np.int8(1)), batch_format="pandas"
            )
            .materialize()
        )

        # touched-bucket key set: O(new · bands) — the broadcast small side
        touched = set()
        for b in sig_new.iter_batches(batch_format="pandas"):
            touched.update(
                zip(b["band"].to_numpy().tolist(), b["band_hash"].to_numpy().tolist())
            )
        touched_ref = ray.put(touched)

        files = self._row_files()
        parts = [sig_new]
        if files:
            def prefilter(b: pd.DataFrame) -> pd.DataFrame:
                t = cached_get(touched_ref)
                keys = list(zip(b["band"].to_numpy().tolist(),
                                b["band_hash"].to_numpy().tolist()))
                mask = np.fromiter((k in t for k in keys), bool, len(keys))
                return b[mask].assign(is_new=np.int8(0))

            parts.append(
                rd.read_parquet(files).map_batches(prefilter, batch_format="pandas")
            )
        tagged = parts[0] if len(parts) == 1 else parts[0].union(parts[1])

        def pairs_with_new(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop_duplicates("doc_id")
            new = np.sort(g.loc[g["is_new"] == 1, "doc_id"].unique())[:_MAX_BUCKET]
            old = np.sort(g.loc[g["is_new"] == 0, "doc_id"].unique())[:_MAX_BUCKET]
            out_a, out_b = [], []
            if len(new) >= 2:  # new×new
                ia, ib = np.triu_indices(len(new), k=1)
                out_a.append(new[ia]); out_b.append(new[ib])
            if len(new) and len(old):  # new×old (never old×old)
                aa = np.repeat(new, len(old))
                bb = np.tile(old, len(new))
                lo, hi = np.minimum(aa, bb), np.maximum(aa, bb)
                out_a.append(lo); out_b.append(hi)
            if not out_a:
                return pd.DataFrame(
                    {"doc_a": pd.Series(dtype="int64"),
                     "doc_b": pd.Series(dtype="int64")}
                )
            return pd.DataFrame(
                {"doc_a": np.concatenate(out_a).astype(np.int64),
                 "doc_b": np.concatenate(out_b).astype(np.int64)}
            ).drop_duplicates()

        candidates = bucketed_map_groups(
            tagged, ["band", "band_hash"], pairs_with_new, input_bytes=input_bytes
        ).materialize()

        ngram = self.meta["ngram"]

        def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "k": batch["doc_id"].astype("int64"),
                    "feat": [
                        _SEP.join(sorted(word_shingles(t or "", ngram)))
                        for t in batch["text"]
                    ],
                }
            )

        def verify(m: pd.DataFrame) -> pd.DataFrame:
            out_a, out_b, out_j = [], [], []
            for a, b_, sa, sb in zip(m["doc_a"], m["doc_b"], m["feat_a"], m["feat_b"]):
                A = set(sa.split(_SEP)) if isinstance(sa, str) and sa else set()
                B = set(sb.split(_SEP)) if isinstance(sb, str) and sb else set()
                union = len(A | B)
                j = len(A & B) / union if union else 0.0
                if j >= threshold:
                    out_a.append(a); out_b.append(b_); out_j.append(j)
            return pd.DataFrame(
                {
                    "doc_a": np.array(out_a, dtype=np.int64),
                    "doc_b": np.array(out_b, dtype=np.int64),
                    "jaccard": _round6(np.array(out_j, dtype=np.float64)),
                }
            )

        verified = _endpoint_verify(
            candidates,
            corpus.map_batches(shingle_rows, batch_format="pandas"),
            "doc_a",
            "doc_b",
            verify,
            input_bytes=input_bytes,
        )
        if not isinstance(verified, pd.DataFrame):
            verified = verified.materialize()

        # fold the new signatures in: Ray-side sorted write (rows sorted by
        # band_hash so row-group min/max stats can prune future reads; the
        # signature stream never collects on the driver)
        n_rows = sig_new.count()
        if n_rows:
            sig_new.map_batches(
                lambda b: b[["band", "band_hash", "doc_id"]],
                batch_format="pandas",
            ).sort("band_hash").write_parquet(self.rows_dir)
        # every signed doc emits exactly `bands` rows
        self.meta["n_updates"] += 1
        self.meta["n_docs"] += n_rows // self.meta["bands"]
        self._write_meta()
        return verified

    def stats(self) -> dict:
        return {**self.meta, "row_files": len(self._row_files())}


def q_incremental_near_dup(sf_dir: str, threshold: float = 0.5):
    """Driver-facing demo of the incremental flow: bootstrap the index with
    the first 80% of documents (epoch 1), then ingest the remaining 20% as
    epoch 2 — the returned pairs are epoch-2's verified near-dups (new×old
    and new×new), mined WITHOUT re-pairing the epoch-1 corpus against
    itself. Rows-only (candidate-based, like the batch MinHash path); the
    planted near-dup pairs straddling the boundary make the output
    non-vacuous at every sf."""
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    nbytes = os.path.getsize(path)
    blocks = min(64, max(2, nbytes >> 20))
    cut = int(pq.read_metadata(path).num_rows * 0.8)  # doc_ids are 0..n-1
    docs = rd.read_parquet(
        path, columns=["doc_id", "text"], override_num_blocks=blocks
    )
    old = docs.map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], cut)), batch_format="pyarrow"
    )
    new = docs.map_batches(
        lambda b: b.filter(pc.greater_equal(b["doc_id"], cut)),
        batch_format="pyarrow",
    )
    work = tempfile.mkdtemp(prefix="mhidx-", dir="/tmp")
    try:
        idx = MinHashIndex(work)
        idx.update(old, docs, threshold=threshold, input_bytes=nbytes)  # epoch 1
        out = idx.update(new, docs, threshold=threshold, input_bytes=nbytes)
        if not isinstance(out, pd.DataFrame):
            out = out.materialize()  # detach from the index files
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES = {"incremental_near_dup": q_incremental_near_dup}
