"""Incremental curation — the per-epoch form of the composed chain.

The batch chain (pipelines/curate.py) re-runs dedup + decontamination +
the quality cut over the WHOLE corpus; a CDC pipeline adding millions of
documents per epoch needs the curated set maintained incrementally:
each epoch should pay O(new), never O(corpus). ``IncrementalCurator``
owns a persisted ``MinHashIndex`` (the near-dup memory) plus a curated
output table, and applies the same three stages to each epoch's NEW
documents only:

1. DEDUP, first-writer-wins across epochs: the index mines verified
   near-dup pairs involving new docs only (never old×old). A new doc
   with an edge to ANY already-ingested doc loses (the earlier epoch's
   copy stays canonical — the same FWW convention as the lake's LWW
   inverse); new×new edges are resolved by connected components with
   min-id canonical, and a component touching any old doc loses whole
   (transitive membership in an existing cluster).
2. DECONTAMINATION against a fixed held-out benchmark (its distinct
   word 5-grams are stored per the batch operator's convention and
   broadcast per epoch — the benchmark is small by definition; ids
   below the benchmark cutoff are refused outright).
3. QUALITY against a FIXED threshold captured at bootstrap (the exact
   p75 of the bootstrap corpus — freezing it keeps epoch selection
   stable; recompute at a re-bootstrap if the corpus drifts).

Survivors append to ``curated/`` exactly like the index commits: staged
per-epoch subdir + atomic meta swap + caller ``update_id`` exactly-once,
all under the shared single-writer flock. ``curated()`` reads only
committed parts. Every stage's drop count is returned per epoch, so the
pipeline's health is observable without scanning the output.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..stages.actors import cached_get
from .dedup import _explode_ngrams
from .dedup_index import MinHashIndex


def _quality_scores(df: pd.DataFrame) -> np.ndarray:
    """The oracle-pinned doc_quality length score over len(text)."""
    n = df["text"].str.len().to_numpy(dtype=np.float64)
    length_score = np.where(
        n < 50,
        n / 50.0 * 50.0,
        np.where(
            n <= 500,
            50.0 + (n - 50.0) / 450.0 * 50.0,
            100.0 - np.minimum(50.0, (n - 500.0) / 100.0),
        ),
    )
    return np.floor(length_score * 0.3 * 100.0 + 0.5) / 100.0


class IncrementalCurator:
    """Persisted, epoch-incremental dedup+decontaminate+quality curation."""

    META = "curator_meta.json"
    FORMAT = 1

    def __init__(
        self,
        root: str,
        benchmark: str | None = None,
        benchmark_max_doc_id: int = 20,
        threshold: float = 0.5,
        quality_q: float = 0.75,
        **lsh_params,
    ):
        self.root = root
        self.curated_dir = os.path.join(root, "curated")
        self.idx = MinHashIndex(os.path.join(root, "neardup_index"), **lsh_params)
        meta_path = os.path.join(root, self.META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)
            if self.meta.get("format") != self.FORMAT:
                raise ValueError(f"curator at {root} uses a different format")
            if benchmark is not None:
                t = pq.read_table(
                    benchmark,
                    columns=["doc_id", "text"],
                    filters=[("doc_id", "<", self.meta["benchmark_max_doc_id"])],
                )
                grams = sorted(set(_explode_ngrams(t, 5)["word"].to_pylist()))
                if grams != self.meta["benchmark_grams"]:
                    raise ValueError(
                        f"curator at {root} was built against a DIFFERENT "
                        "held-out benchmark — decontamination would silently "
                        "diverge; re-bootstrap a fresh curator instead"
                    )
        else:
            os.makedirs(self.curated_dir, exist_ok=True)
            grams: list[str] = []
            if benchmark is not None:
                t = pq.read_table(
                    benchmark,
                    columns=["doc_id", "text"],
                    filters=[("doc_id", "<", benchmark_max_doc_id)],
                )
                grams = sorted(
                    set(_explode_ngrams(t, 5)["word"].to_pylist())
                )
            self.meta = {
                "format": self.FORMAT,
                "threshold": threshold,
                "quality_q": quality_q,
                "benchmark_max_doc_id": benchmark_max_doc_id,
                "benchmark_grams": grams,
                "quality_min": None,  # captured at bootstrap
                "committed": [],
                "applied_ids": [],
                "n_curated": 0,
            }
            self._write_meta()

    def _write_meta(self) -> None:
        tmp = os.path.join(self.root, f".{self.META}.tmp")
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, os.path.join(self.root, self.META))

    # -- epochs -------------------------------------------------------------

    def bootstrap(self, docs, update_id: str) -> dict:
        """Epoch 1: capture the exact p-quantile quality threshold from
        this corpus, then ingest it (bootstrap pays O(corpus) once — the
        point is that every later epoch doesn't)."""
        if self.meta["quality_min"] is not None:
            raise ValueError("curator already bootstrapped — use ingest()")
        scored = docs.map_batches(
            lambda b: pd.DataFrame(
                {"doc_id": b["doc_id"], "q": _quality_scores(b)}
            ),
            batch_format="pandas",
        ).materialize()
        n = scored.count()
        if n == 0:
            raise ValueError("empty bootstrap corpus")
        idxq = min(int(n * self.meta["quality_q"]), n - 1)
        thr = (
            scored.sort("q").split_at_indices([idxq])[1].take(1)[0]["q"]
        )
        self.meta["quality_min"] = float(thr)
        self._write_meta()
        return self.ingest(docs, docs, update_id)

    def ingest(self, new_docs, corpus, update_id: str) -> dict:
        """Apply the chain to one epoch's NEW docs; append survivors.

        ``corpus`` must cover every indexed doc plus the new ones (the
        MinHash verify attaches candidate endpoints from it — a bucketed
        semi-join, never a scan)."""
        from ..stages.graph import connected_components

        if self.meta["quality_min"] is None:
            raise ValueError("bootstrap() first — the quality threshold is unset")
        if update_id in self.meta["applied_ids"]:
            return {"applied": False, "update_id": update_id}

        cutoff = self.meta["benchmark_max_doc_id"]
        new_docs = new_docs.map_batches(
            lambda b: b[b["doc_id"] >= cutoff], batch_format="pandas"
        ).materialize()
        n_new = new_docs.count()
        known_new = self.idx.stats()["n_docs"]  # docs indexed BEFORE this epoch
        if n_new == 0:
            # nothing (left) to ingest — still commit the epoch so a retry
            # of the same update_id stays exactly-once
            self._commit_epoch(None, 0, update_id)
            return {
                "applied": True, "update_id": update_id, "new_docs": 0,
                "known_before": int(known_new), "dropped_dedup": 0,
                "dropped_decontam_or_quality": 0, "curated": 0,
                "total_curated": int(self.meta["n_curated"]),
            }

        # stage 1 — dedup (also folds the new docs into the index)
        pairs = self.idx.update(
            new_docs, corpus, threshold=self.meta["threshold"],
            update_id=update_id,
        )
        pdf = pairs if isinstance(pairs, pd.DataFrame) else pairs.to_pandas()
        new_ids_df = new_docs.map_batches(
            lambda b: b[["doc_id"]], batch_format="pandas"
        ).to_pandas()  # O(epoch) ids on the driver: the epoch IS the unit
        new_ids = new_ids_df["doc_id"].to_numpy(np.int64)
        # edges where at least one endpoint is old → the new endpoint loses
        lost: set[int] = set()
        nn_edges = pd.DataFrame(columns=["src", "dst"])
        if len(pdf):
            a = pdf["doc_a"].to_numpy(np.int64)
            b = pdf["doc_b"].to_numpy(np.int64)
            a_new, b_new = np.isin(a, new_ids), np.isin(b, new_ids)
            both = a_new & b_new
            lost.update(a[a_new & ~b_new].tolist())
            lost.update(b[b_new & ~a_new].tolist())
            nn_edges = pd.DataFrame({"src": a[both], "dst": b[both]})
        if len(nn_edges):
            edges = rd.from_pandas(nn_edges.astype("int64"))
            labels = connected_components(edges).to_pandas()
            by_label: dict[int, list[int]] = {}
            for node, lab in zip(labels["node"], labels["label"]):
                by_label.setdefault(int(lab), []).append(int(node))
            for lab, members in by_label.items():
                if any(m in lost for m in members):
                    lost.update(members)  # transitively joined an old cluster
                else:
                    lost.update(m for m in members if m != min(members))
        n_lost_dedup = len(lost)

        # stages 2+3 — decontaminate + quality, one vectorized pass
        grams_ref = ray.put(
            pa.array(self.meta["benchmark_grams"], pa.string())
        )
        lost_ref = ray.put(np.fromiter(lost, dtype=np.int64, count=len(lost)))
        qmin = self.meta["quality_min"]

        def survive(df: pd.DataFrame) -> pd.DataFrame:
            df = df[~np.isin(df["doc_id"].to_numpy(), cached_get(lost_ref))]
            if not len(df):
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "text": pd.Series(dtype="object")})
            grams = cached_get(grams_ref)
            if len(grams):
                t = pa.table(
                    {"doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                     "text": pa.array(df["text"].astype(str))}
                )
                exploded = _explode_ngrams(t, 5)
                hits = exploded.filter(
                    pc.is_in(exploded["word"], value_set=grams)
                )
                bad = set(hits["doc_id"].to_pylist())
                if bad:
                    df = df[~df["doc_id"].isin(bad)]
            if not len(df):
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                     "text": pd.Series(dtype="object")})
            keep = _quality_scores(df) >= qmin
            return df.loc[keep, ["doc_id", "text"]]

        survivors = new_docs.map_batches(survive, batch_format="pandas").materialize()
        n_kept = survivors.count()
        self._commit_epoch(survivors, n_kept, update_id)
        return {
            "applied": True,
            "update_id": update_id,
            "new_docs": int(n_new),
            "known_before": int(known_new),
            "dropped_dedup": int(n_lost_dedup),
            "dropped_decontam_or_quality": int(n_new - n_lost_dedup - n_kept),
            "curated": int(n_kept),
            "total_curated": int(self.meta["n_curated"]),
        }

    def _commit_epoch(self, survivors, n_kept: int, update_id: str) -> None:
        from ..state.lake import dir_writer_lock

        with dir_writer_lock(self.root, "curator"):
            sub = f"epoch-{len(self.meta['committed']):05d}"
            target = os.path.join(self.curated_dir, sub)
            shutil.rmtree(target, ignore_errors=True)
            if n_kept:
                survivors.write_parquet(target)
            else:
                os.makedirs(target, exist_ok=True)
            self.meta["committed"].append(sub)
            self.meta["applied_ids"].append(update_id)
            self.meta["n_curated"] += n_kept
            self._write_meta()

    # -- read ---------------------------------------------------------------

    def curated(self) -> "rd.Dataset":
        """The curated corpus so far (committed epochs only)."""
        files = []
        for sub in self.meta["committed"]:
            d = os.path.join(self.curated_dir, sub)
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
        if not files:
            return rd.from_arrow(
                pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
                .empty_table()
            )
        return rd.read_parquet(files)

    def fsck(self) -> dict:
        """Committed epoch dirs exist; row totals match n_curated; the
        owned near-dup index passes its own audit."""
        errors, missing, total = [], [], 0
        for sub in self.meta["committed"]:
            d = os.path.join(self.curated_dir, sub)
            if not os.path.isdir(d):
                missing.append(sub)
                continue
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(d, f)).num_rows
        if missing:
            errors.append(f"committed epoch dirs missing: {missing}")
        if not missing and total != self.meta["n_curated"]:
            errors.append(f"curated rows {total} != n_curated {self.meta['n_curated']}")
        sub_audit = self.idx.fsck()
        if not sub_audit["ok"]:
            errors.append(f"near-dup index: {sub_audit['errors']}")
        return {"ok": not errors, "errors": errors, "rows": total}


def q_incremental_curation(sf_dir: str):
    """Driver-facing demo of the incremental flow: bootstrap the curator on
    the first 80% of documents (which freezes the quality threshold and
    seeds the near-dup memory), ingest the remaining 20% as epoch 2 — paying
    O(epoch), never re-running the chain over epoch 1 — and return the full
    curated corpus ids. Rows-only: first-writer-wins dedup across epochs is
    ORDER-dependent state a single SQL statement over the static tables
    cannot express (the batch chain's min-id convention is the SQL-checkable
    twin — `curated_corpus`)."""
    import tempfile

    from ..stages.shuffle import table_bytes, table_rows

    path = os.path.join(sf_dir, "documents.parquet")
    cut = int(table_rows(path) * 0.8)  # doc_ids are 0..n-1
    blocks = min(64, max(2, table_bytes(path) >> 20))
    docs = rd.read_parquet(
        path, columns=["doc_id", "text"], override_num_blocks=blocks
    )
    old = docs.map_batches(lambda b: b[b["doc_id"] < cut], batch_format="pandas")
    new = docs.map_batches(lambda b: b[b["doc_id"] >= cut], batch_format="pandas")
    work = tempfile.mkdtemp(prefix="curidx-", dir="/tmp")
    try:
        cur = IncrementalCurator(work, benchmark=path)
        cur.bootstrap(old, update_id="epoch-1")
        cur.ingest(new, docs, update_id="epoch-2")
        out = cur.curated().map_batches(
            lambda b: b[["doc_id"]], batch_format="pandas"
        ).materialize()  # detach from the curator's files
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# bootstrap fixture per (process, sf_dir): the steady-state query below
# copies it per call instead of re-paying the O(corpus) bootstrap
_EPOCH_FIXTURE: dict[str, str] = {}


def q_incremental_curation_epoch(sf_dir: str):
    """STEADY-STATE cost of one ingest epoch — the number a standing
    100-TB curator plans capacity around. The epoch-1 fixture (curator
    bootstrapped on the first 80% of documents) is built once per process
    and COPIED per call, so repeated timings of this query measure only
    the per-epoch work: index the 20% of new docs, mine new×index pairs,
    decontaminate + quality-filter, commit. (`incremental_curation` is the
    bootstrap-inclusive demo; BASELINE.md reports both.) Returns the
    deterministic one-row epoch summary."""
    import tempfile

    from ..stages.shuffle import table_bytes, table_rows

    path = os.path.join(sf_dir, "documents.parquet")
    cut = int(table_rows(path) * 0.8)
    blocks = min(64, max(2, table_bytes(path) >> 20))
    docs = rd.read_parquet(
        path, columns=["doc_id", "text"], override_num_blocks=blocks
    )
    old = docs.map_batches(lambda b: b[b["doc_id"] < cut], batch_format="pandas")
    new = docs.map_batches(lambda b: b[b["doc_id"] >= cut], batch_format="pandas")

    fixture = _EPOCH_FIXTURE.get(sf_dir)
    if fixture is None:
        fixture = tempfile.mkdtemp(prefix="curfix-", dir="/tmp")
        cur = IncrementalCurator(fixture, benchmark=path)
        cur.bootstrap(old, update_id="epoch-1")
        _EPOCH_FIXTURE[sf_dir] = fixture

    work = tempfile.mkdtemp(prefix="curepoch-", dir="/tmp")
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(fixture, work)
    try:
        cur = IncrementalCurator(work, benchmark=path)
        summary = cur.ingest(new, docs, update_id="epoch-2")
        return pd.DataFrame([summary])
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES = {
    "incremental_curation": q_incremental_curation,
    "incremental_curation_epoch": q_incremental_curation_epoch,
}
