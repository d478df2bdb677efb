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
from .dedup_index import _PUSHDOWN_MAX_KEYS, MinHashIndex

# Epoch bookkeeping path: below the gate the mined pair set and the epoch's
# doc ids are collected driver-side (bounded by the gate — the steady-state
# shape); above it (a bootstrap-sized epoch over a large corpus) the loser
# set is computed as a DISTRIBUTED chain — endpoint classification via
# bucketed semi/anti joins, new×new resolution via connected components, a
# vectorized per-label argmin — and survivors leave via a bucketed
# anti-join, so nothing O(corpus) ever passes through the driver. "auto"
# picks by size; True/False force either path (tests A/B them for
# identical curated output).
_DRIVER_EPOCH = "auto"
_DRIVER_EPOCH_MAX = _PUSHDOWN_MAX_KEYS


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


def _check_curated_file(path: str, ctx: dict) -> list[str]:
    """Deep-fsck content checks for one curated part: schema, benchmark-id
    cutoff, frozen quality threshold, zero benchmark-gram hits."""
    name = os.path.basename(path)
    t = pq.read_table(path)
    if set(t.column_names) != {"doc_id", "text"}:
        return [f"{name}: schema {sorted(t.column_names)} != ['doc_id', 'text']"]
    if not t.num_rows:
        return []
    errs: list[str] = []
    df = t.to_pandas()
    below = int((df["doc_id"].to_numpy(np.int64) < ctx["cutoff"]).sum())
    if below:
        errs.append(f"{name}: {below} doc_id(s) below the benchmark cutoff "
                    f"{ctx['cutoff']}")
    if ctx["quality_min"] is not None:
        bad_q = int((_quality_scores(df) < ctx["quality_min"]).sum())
        if bad_q:
            errs.append(f"{name}: {bad_q} row(s) below the frozen quality "
                        f"threshold {ctx['quality_min']}")
    if ctx["grams"]:
        exploded = _explode_ngrams(t, 5)
        hits = exploded.filter(
            pc.is_in(exploded["word"],
                     value_set=pa.array(ctx["grams"], pa.string()))
        )
        if hits.num_rows:
            n_bad = len(set(hits["doc_id"].to_pylist()))
            errs.append(f"{name}: {n_bad} contaminated doc(s) — benchmark "
                        "5-grams present in curated text")
    return errs


class _EpochStore:
    """Shared persisted-epoch machinery for both curators (text and
    embedding): atomic meta writes, staged epoch-subdir commits under the
    single-writer flock, committed-files reads, and the shallow row-count
    audit. One implementation so a fix to the commit protocol can't
    silently diverge between the two."""

    META: str
    LOCK_LABEL: str

    def _write_meta(self) -> None:
        tmp = os.path.join(self.root, f".{self.META}.tmp")
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, os.path.join(self.root, self.META))

    def _commit_epoch(self, survivors, n_kept: int, update_id: str) -> None:
        from ..state.lake import dir_writer_lock

        with dir_writer_lock(self.root, self.LOCK_LABEL):
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

    def _curated_files(self) -> list[str]:
        return [
            os.path.join(self.curated_dir, sub, f)
            for sub in self.meta["committed"]
            if os.path.isdir(os.path.join(self.curated_dir, sub))
            for f in sorted(os.listdir(os.path.join(self.curated_dir, sub)))
            if f.endswith(".parquet")
        ]

    def curated(self) -> "rd.Dataset":
        """The curated output so far (committed epochs only)."""
        files = self._curated_files()
        if not files:
            return rd.from_arrow(self.CURATED_SCHEMA.empty_table())
        return rd.read_parquet(files)

    def _epochs_rowcount_audit(self):
        """Shallow audit: committed epoch dirs exist and their footer row
        total matches n_curated. Returns (errors, files, total, missing)."""
        errors, missing, total = [], [], 0
        files: list[str] = []
        for sub in self.meta["committed"]:
            d = os.path.join(self.curated_dir, sub)
            if not os.path.isdir(d):
                missing.append(sub)
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    p = os.path.join(d, f)
                    total += pq.read_metadata(p).num_rows
                    files.append(p)
        if missing:
            errors.append(f"committed epoch dirs missing: {missing}")
        if not missing and total != self.meta["n_curated"]:
            errors.append(
                f"curated rows {total} != n_curated {self.meta['n_curated']}"
            )
        return errors, files, total, missing


class IncrementalCurator(_EpochStore):
    """Persisted, epoch-incremental dedup+decontaminate+quality curation."""

    META = "curator_meta.json"
    FORMAT = 1
    LOCK_LABEL = "curator"
    CURATED_SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def __init__(
        self,
        root: str,
        benchmark: str | None = None,
        benchmark_max_doc_id: int | None = None,
        threshold: float | None = None,
        quality_q: float | None = None,
        **lsh_params,
    ):
        """None = "use the store's persisted value" (the shared reopen
        convention, state/meta.py: omitted params adopt the manifest, an
        EXPLICITLY passed mismatch raises — previously this curator
        silently IGNORED a mismatched threshold/quality_q on reopen while
        its sibling stores raised). Defaults on create: threshold 0.5,
        quality_q 0.75, benchmark_max_doc_id 20."""
        from ..state.meta import open_or_init_meta

        self.root = root
        self.curated_dir = os.path.join(root, "curated")
        self.idx = MinHashIndex(os.path.join(root, "neardup_index"), **lsh_params)
        explicit = {k: v for k, v in
                    (("threshold", threshold), ("quality_q", quality_q),
                     ("benchmark_max_doc_id", benchmark_max_doc_id))
                    if v is not None}
        self.meta, created = open_or_init_meta(
            os.path.join(root, self.META), self.FORMAT,
            f"curator at {root}",
            {"threshold": 0.5, "quality_q": 0.75, "benchmark_max_doc_id": 20},
            explicit,
            mismatch_hint=(" (persisted, requested) — epochs would "
                           "silently diverge"),
        )
        if created:
            os.makedirs(self.curated_dir, exist_ok=True)
            grams: list[str] = []
            if benchmark is not None:
                t = pq.read_table(
                    benchmark,
                    columns=["doc_id", "text"],
                    filters=[("doc_id", "<",
                              self.meta["benchmark_max_doc_id"])],
                )
                grams = sorted(
                    set(_explode_ngrams(t, 5)["word"].to_pylist())
                )
            self.meta.update(
                benchmark_grams=grams,
                quality_min=None,  # captured at bootstrap
                committed=[], applied_ids=[], n_curated=0,
            )
            self._write_meta()
        elif benchmark is not None:
            # content check no scalar-param protocol can express: the
            # SAME benchmark file must re-derive the persisted gram set
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

    # -- epochs -------------------------------------------------------------

    def bootstrap(self, docs, update_id: str,
                  corpus_bytes: int | None = None) -> dict:
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
        return self.ingest(docs, docs, update_id, corpus_bytes=corpus_bytes)

    def ingest(self, new_docs, corpus, update_id: str,
               corpus_bytes: int | None = None) -> dict:
        """Apply the chain to one epoch's NEW docs; append survivors.

        ``corpus`` must cover every indexed doc plus the new ones (the
        MinHash verify attaches candidate endpoints from it — a bucketed
        semi-join, never a scan). ``corpus_bytes`` sizes the index's
        un-pruned verify exchange (see MinHashIndex.update)."""
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
            update_id=update_id, corpus_bytes=corpus_bytes,
        )
        pairs_h, n_pairs = _pairs_handle(pairs)
        lost_ds, n_lost_dedup = _resolve_losers(
            new_docs, pairs_h, n_pairs, n_new, self._epoch_bytes(new_docs)
        )
        base = _drop_losers(
            new_docs, lost_ds, n_lost_dedup, "doc_id",
            self._epoch_bytes(new_docs),
        )

        # stages 2+3 — decontaminate + quality, one vectorized pass
        grams_ref = ray.put(
            pa.array(self.meta["benchmark_grams"], pa.string())
        )
        qmin = self.meta["quality_min"]

        def survive(df: pd.DataFrame) -> pd.DataFrame:
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

        survivors = base.map_batches(survive, batch_format="pandas").materialize()
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

    @staticmethod
    def _epoch_bytes(new_docs) -> int | None:
        return _epoch_bytes(new_docs)

    # -- read ---------------------------------------------------------------

    def fsck(self, deep: bool = False) -> dict:
        """Committed epoch dirs exist; row totals match n_curated; the
        owned near-dup index passes its own audit (``deep`` propagates).

        ``deep`` adds a distributed per-file content scan of the curated
        output against the frozen meta: exact schema, no doc_id below the
        benchmark cutoff, every row's quality score ≥ the frozen threshold,
        and zero benchmark 5-gram hits — i.e. the three curation invariants
        actually HOLD in what's on disk, not just in the epoch counters."""
        errors, files, total, missing = self._epochs_rowcount_audit()
        if deep and not missing:
            from ..state.fsck import deep_scan_files

            errors.extend(deep_scan_files(
                files, _check_curated_file,
                {"quality_min": self.meta["quality_min"],
                 "cutoff": self.meta["benchmark_max_doc_id"],
                 "grams": self.meta["benchmark_grams"]},
            ))
        sub_audit = self.idx.fsck(deep=deep)
        if not sub_audit["ok"]:
            errors.append(f"near-dup index: {sub_audit['errors']}")
        return {"ok": not errors, "errors": errors, "rows": total}




def _epoch_bytes(new_docs) -> int | None:
    try:
        return new_docs.size_bytes()  # materialized — free
    except Exception:
        return None


def _pairs_handle(pairs):
    """Normalize index-mined pairs — a pandas DataFrame under the pushdown
    gate, a Dataset above it — to (pairs_or_none, n_pairs) WITHOUT a Ray
    round trip: the steady-state DataFrame stays a DataFrame (the old
    from_pandas → count → to_pandas detour paid object-store serialization
    plus two executions per epoch for nothing)."""
    if isinstance(pairs, pd.DataFrame):
        return (pairs if len(pairs) else None), len(pairs)
    n = pairs.count()
    return (pairs if n else None), n


def _resolve_losers(new_ids, pairs, n_pairs, n_new, epoch_bytes):
    """Dispatch FWW loser resolution by the driver-epoch gate (shared by
    both curators). ``pairs`` may be a DataFrame or a Dataset. Returns
    ``(losers, n_lost)`` where ``losers`` is a sorted int64 ndarray on the
    driver path (it stays driver-side — round-tripping it through a Ray
    dataset just to re-collect it in _drop_losers paid object-store
    serialization per steady-state epoch) or a Dataset[loser_id] on the
    distributed path."""
    driver_path = (
        _DRIVER_EPOCH is True
        or (_DRIVER_EPOCH == "auto"
            and n_new <= _DRIVER_EPOCH_MAX and n_pairs <= _DRIVER_EPOCH_MAX)
    )
    if driver_path:
        return _losers_driver(new_ids, pairs)
    return _losers_distributed(new_ids, pairs, epoch_bytes)


def _drop_losers(src, lost_ds, n_lost, id_col, epoch_bytes):
    """FWW drop of the loser set from ``src`` by ``id_col``: broadcast the
    ids under the gate (steady state), else a bucketed anti-join
    (bootstrap scale). Shared by both curators. ``lost_ds`` is an ndarray
    (driver path) or a Dataset[loser_id] (distributed path)."""
    if n_lost == 0:
        return src
    if n_lost <= _DRIVER_EPOCH_MAX:
        lost_arr = (
            lost_ds if isinstance(lost_ds, np.ndarray)
            else np.sort(lost_ds.to_pandas()["loser_id"].to_numpy(np.int64))
        )  # bounded by the gate
        lost_ref = ray.put(lost_arr)
        return src.map_batches(
            lambda b: b[~np.isin(b[id_col].to_numpy(), cached_get(lost_ref))],
            batch_format="pandas",
        )
    from ..stages.joins import bucketed_hash_join

    if isinstance(lost_ds, np.ndarray):  # driver-resolved but above the
        lost_ds = rd.from_pandas(         # broadcast gate: ship it once
            pd.DataFrame({"loser_id": lost_ds})
        )
    return bucketed_hash_join(
        src, lost_ds, left_on=[id_col], right_on=["loser_id"],
        how="left_anti", input_bytes=epoch_bytes,
    )


def _losers_driver(new_docs, pairs_ds):
    """Gate-bounded FWW loser computation (shared by the text and embedding
    curators — ``new_docs`` only needs a ``doc_id`` column, ``pairs_ds``
    needs ``doc_a``/``doc_b``): collect the epoch's ids and the mined pairs
    (both ≤ _DRIVER_EPOCH_MAX by the caller's gate), resolve mixed-edge and
    new×new-component losses driver-side. Returns (sorted int64 ndarray,
    n_lost) — the array stays driver-side for _drop_losers' broadcast."""
    from ..stages.graph import connected_components

    if pairs_ds is None:
        pdf = pd.DataFrame(columns=["doc_a", "doc_b"])
    elif isinstance(pairs_ds, pd.DataFrame):
        pdf = pairs_ds
    else:
        pdf = pairs_ds.to_pandas()
    new_ids = new_docs.map_batches(
        lambda b: b[["doc_id"]], batch_format="pandas"
    ).to_pandas()["doc_id"].to_numpy(np.int64)
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
    arr = np.sort(np.fromiter(lost, dtype=np.int64, count=len(lost)))
    return arr, len(lost)

def _losers_distributed(new_docs, pairs_ds, epoch_bytes=None):
    """Bootstrap-scale loser computation — the dedup_survivors pattern:
    endpoint novelty via bucketed semi/anti joins against the epoch's id
    set, mixed-edge losers map-side, new×new components via the
    checkpointed CC loop, per-label FWW argmin vectorized inside one
    bucketed exchange. Nothing epoch- or corpus-sized on the driver.
    Returns (Dataset[loser_id] distinct, n_lost)."""
    from ..stages.graph import connected_components
    from ..stages.joins import bucketed_hash_join
    from ..stages.shuffle import bucketed_map_groups

    eb = epoch_bytes if epoch_bytes is not None else _epoch_bytes(new_docs)
    empty = rd.from_arrow(
        pa.schema([("loser_id", pa.int64())]).empty_table()
    )
    if pairs_ds is None:
        return empty, 0
    if isinstance(pairs_ds, pd.DataFrame):
        pairs_ds = rd.from_pandas(pairs_ds)
    new_ids = new_docs.map_batches(
        lambda b: b[["doc_id"]], batch_format="pandas"
    )
    p = pairs_ds.map_batches(
        lambda b: b[["doc_a", "doc_b"]], batch_format="pandas"
    )
    # classify both endpoints: two semi/anti splits per side. Each split
    # feeds TWO downstream joins — materialize so the lazy upstream isn't
    # re-executed per consumer (pair sets are id-only, bytes are small)
    a_new = bucketed_hash_join(
        p, new_ids, ["doc_a"], ["doc_id"], "left_semi", input_bytes=eb
    ).materialize()
    a_old = bucketed_hash_join(
        p, new_ids, ["doc_a"], ["doc_id"], "left_anti", input_bytes=eb
    ).materialize()
    both_new = bucketed_hash_join(
        a_new, new_ids, ["doc_b"], ["doc_id"], "left_semi", input_bytes=eb
    )
    a_only = bucketed_hash_join(  # doc_a new, doc_b old → doc_a loses
        a_new, new_ids, ["doc_b"], ["doc_id"], "left_anti", input_bytes=eb
    )
    b_only = bucketed_hash_join(  # doc_b new, doc_a old → doc_b loses
        a_old, new_ids, ["doc_b"], ["doc_id"], "left_semi", input_bytes=eb
    )
    lost_mixed = a_only.map_batches(
        lambda b: pd.DataFrame({"loser_id": b["doc_a"].astype("int64")}),
        batch_format="pandas",
    ).union(
        b_only.map_batches(
            lambda b: pd.DataFrame({"loser_id": b["doc_b"].astype("int64")}),
            batch_format="pandas",
        )
    ).materialize()

    nn_edges = both_new.map_batches(
        lambda b: pd.DataFrame(
            {"src": b["doc_a"].astype("int64"),
             "dst": b["doc_b"].astype("int64")}
        ),
        batch_format="pandas",
    ).materialize()
    lost = lost_mixed
    if nn_edges.count():
        labels = connected_components(nn_edges, input_bytes=eb)
        # members already lost through a mixed edge drag their whole
        # component down (transitive membership in an existing cluster)
        flagged = bucketed_hash_join(
            labels, lost_mixed, ["node"], ["loser_id"], "left_semi",
            input_bytes=eb,
        ).map_batches(
            lambda b: b.assign(f=np.int8(1)), batch_format="pandas"
        )
        tagged = labels.map_batches(
            lambda b: b.assign(f=np.int8(0)), batch_format="pandas"
        ).union(flagged)

        def cc_losers(g: pd.DataFrame) -> pd.DataFrame:
            per = (
                g.groupby(["label", "node"], sort=False)["f"]
                .max().reset_index()
            )
            any_lost = per.groupby("label", sort=False)["f"].transform("max")
            min_node = per.groupby("label", sort=False)["node"].transform("min")
            is_loser = (any_lost == 1) | (per["node"] != min_node)
            return pd.DataFrame(
                {"loser_id": per.loc[is_loser, "node"].astype("int64")}
            )

        lost = lost.union(
            bucketed_map_groups(tagged, ["label"], cc_losers, input_bytes=eb)
        )

    distinct = bucketed_map_groups(
        lost,
        ["loser_id"],
        lambda g: g.drop_duplicates(),
        pre=lambda b: b.drop_duplicates(),
        input_bytes=eb,
    ).materialize()
    return distinct, distinct.count()

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
        nbytes = table_bytes(path)
        cur = IncrementalCurator(work, benchmark=path)
        cur.bootstrap(old, update_id="epoch-1", corpus_bytes=nbytes)
        cur.ingest(new, docs, update_id="epoch-2", corpus_bytes=nbytes)
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
        import atexit

        fixture = tempfile.mkdtemp(prefix="curfix-", dir="/tmp")
        # the memoized bootstrap tree is per-process scratch: reap it at
        # interpreter exit so repeated bench processes don't leak index
        # copies under /tmp
        atexit.register(shutil.rmtree, fixture, ignore_errors=True)
        cur = IncrementalCurator(fixture, benchmark=path)
        cur.bootstrap(old, update_id="epoch-1", corpus_bytes=table_bytes(path))
        _EPOCH_FIXTURE[sf_dir] = fixture

    work = tempfile.mkdtemp(prefix="curepoch-", dir="/tmp")
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(fixture, work)
    try:
        cur = IncrementalCurator(work, benchmark=path)
        summary = cur.ingest(new, docs, update_id="epoch-2",
                             corpus_bytes=table_bytes(path))
        return pd.DataFrame([summary])
    finally:
        shutil.rmtree(work, ignore_errors=True)


class EmbeddingCurator(_EpochStore):
    """Epoch-incremental embedding dedup — the IVF-index twin of
    ``IncrementalCurator`` (which uses MinHashIndex as its near-dup
    memory): each epoch's vectors fold into a persisted ``IvfIndex`` and
    near-duplicates by cosine are dropped first-writer-wins across epochs.

    Mining is the MinHashIndex.update pattern transposed to vector space:
    candidates are generated ONLY within the inverted lists the epoch
    touches — each new vector probes its ``mine_probes`` nearest lists,
    the stored vectors of exactly those lists are point-read from the
    index's per-list files (the index IS the vector storage), and exact
    cosine runs per list inside one bucketed exchange (never an all-pairs
    scan; recall is bounded by list co-location, same contract as LSH
    banding — raise mine_probes for recall, like nprobe at query time).
    Mine-before-fold order makes a retried epoch re-mine identically
    (self-pairs are excluded by vec_id, and the loser classification is by
    id membership, not storage state). Losers resolve through the SAME
    gated dual-path FWW machinery as the text curator (_losers_driver /
    _losers_distributed). Survivor ids commit exactly like every store
    here: staged epoch subdir + atomic meta + update_id exactly-once under
    the single-writer flock."""

    META = "emb_curator_meta.json"
    FORMAT = 1
    LOCK_LABEL = "embedding curator"
    CURATED_SCHEMA = pa.schema([("vec_id", pa.int64())])

    def __init__(self, root: str, threshold: float | None = None,
                 mine_probes: int | None = None, **ivf_params):
        from .ann_index import IvfIndex

        from ..state.meta import open_or_init_meta

        self.root = root
        self.curated_dir = os.path.join(root, "curated")
        self.idx = IvfIndex(os.path.join(root, "ann_index"), **ivf_params)
        # None = "use the store's persisted value" (the shared convention:
        # reopen adopts persisted params; any EXPLICITLY passed mismatch
        # raises — no sentinel value is overloaded as 'unspecified')
        explicit = {k: v for k, v in
                    (("threshold", threshold), ("mine_probes", mine_probes))
                    if v is not None}
        self.meta, created = open_or_init_meta(
            os.path.join(root, self.META), self.FORMAT,
            f"embedding curator at {root}",
            {"threshold": 0.42, "mine_probes": 4},
            explicit,
            mismatch_hint=(" (persisted, requested) — epochs would "
                           "silently diverge"),
        )
        if created:
            os.makedirs(self.curated_dir, exist_ok=True)
            self.meta.update(committed=[], applied_ids=[], n_curated=0)
            self._write_meta()

    # -- epochs -------------------------------------------------------------

    def bootstrap(self, vecs, update_id: str) -> dict:
        """Epoch 1: train the coarse quantizer, then ingest the corpus
        (mining its internal near-dups new×new, min-id canonical).
        Retryable after a crash: a prior attempt that persisted the
        quantizer but died before the epoch committed skips straight to
        the ingest (re-training would raise IvfIndex's own guard with a
        message pointing at the wrong recovery API)."""
        if self.meta["applied_ids"]:
            raise ValueError(
                "embedding curator already bootstrapped — use ingest()"
            )
        if self.idx._centroids is None:
            self.idx.train(vecs)
        return self.ingest(vecs, update_id)

    def ingest(self, new_vecs, update_id: str) -> dict:
        """Dedup one epoch's vectors against the index memory (and each
        other), fold ALL of them into the index (losers stay visible as
        candidate memory — the MinHash curator's convention), append
        survivor ids to curated/."""
        from ..functions.linalg import sq_dists
        from .dedup_index import _MAX_BUCKET

        if self.idx._centroids is None:
            raise ValueError("bootstrap() first — the quantizer is untrained")
        if update_id in self.meta["applied_ids"]:
            return {"applied": False, "update_id": update_id}

        new_vecs = new_vecs.materialize()
        n_new = new_vecs.count()
        known = int(self.idx.meta["n_vecs"])
        if n_new == 0:
            # nothing to ingest — still commit the epoch so a retry of the
            # same update_id stays exactly-once (the text curator's
            # convention; a block-less dataset would otherwise reach
            # to_pandas() with its columns dropped and fail mid-mine)
            self._commit_epoch(None, 0, update_id)
            return {
                "applied": True, "update_id": update_id, "new_vecs": 0,
                "known_before": known, "pairs": 0, "dropped_dedup": 0,
                "curated": 0,
                "total_curated": int(self.meta["n_curated"]),
            }
        thr = self.meta["threshold"]
        dim = self.idx.meta["dim"]
        probes = min(self.meta["mine_probes"], len(self.idx._centroids))
        cref = ray.put(self.idx._centroids)

        def probe_lists(b: pd.DataFrame) -> pd.DataFrame:
            # explode each new vector to its `probes` nearest lists (the
            # mining candidate space; storage assignment stays top-1 in add)
            if not len(b):
                return pd.DataFrame({
                    "list_id": pd.Series(dtype="int64"),
                    "vec_id": pd.Series(dtype="int64"),
                    "embedding": pd.Series(dtype="object"),
                    "is_new": pd.Series(dtype="int8"),
                })
            cent = cached_get(cref)
            m = np.stack(b["embedding"].to_numpy()).reshape(-1, dim)
            d2 = sq_dists(m, cent)
            top = np.argsort(d2, axis=1, kind="stable")[:, :probes]
            n = len(b)
            return pd.DataFrame({
                "list_id": top.ravel().astype(np.int64),
                "vec_id": np.repeat(b["vec_id"].to_numpy(np.int64), probes),
                "embedding": np.repeat(b["embedding"].to_numpy(), probes),
                "is_new": np.int8(1),
            })

        sig_new = new_vecs.map_batches(
            probe_lists, batch_format="pandas"
        ).materialize()
        eb = _epoch_bytes(sig_new)

        # touched lists: bounded by n_lists (≈ sqrt(corpus)) by construction
        touched = sorted(
            set(
                sig_new.map_batches(
                    lambda b: b[["list_id"]].drop_duplicates(),
                    batch_format="pandas",
                ).to_pandas()["list_id"].tolist()
            )
        )
        files = self.idx._list_files(touched)
        tagged = sig_new
        if files:
            dead = self.idx._tombstone_ids()
            dead_ref = ray.put(dead)

            def old_rows(b: pd.DataFrame) -> pd.DataFrame:
                lids = (
                    b["path"].str.rsplit("-", n=1).str[-1]
                    .str.removesuffix(".parquet").astype("int64")
                )
                out = pd.DataFrame({
                    "list_id": lids,
                    "vec_id": b["vec_id"].astype("int64"),
                    "embedding": b["embedding"],
                    "is_new": np.int8(0),
                })
                dead_w = cached_get(dead_ref)
                if len(dead_w):
                    out = out[~np.isin(out["vec_id"].to_numpy(), dead_w)]
                return out

            old = rd.read_parquet(files, include_paths=True).map_batches(
                old_rows, batch_format="pandas"
            )
            old_bytes = sum(os.path.getsize(f) for f in files)
            eb = (eb or 0) + old_bytes
            tagged = tagged.union(old)

        def pair_fn(g: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                                  "doc_b": pd.Series(dtype="int64")})
            outs = []
            for _, grp in g.groupby("list_id", sort=False):
                # a vec may appear as both new (probe replica) and old
                # (stored) — classify by ANY new row, keep one embedding
                per = grp.sort_values("is_new", ascending=False).drop_duplicates(
                    "vec_id"
                )
                newg = per[per["is_new"] == 1].sort_values("vec_id")[:_MAX_BUCKET]
                oldg = per[per["is_new"] == 0].sort_values("vec_id")[:_MAX_BUCKET]
                if not len(newg):
                    continue
                mn = np.stack(newg["embedding"].to_numpy()).reshape(-1, dim)
                mn = mn / np.maximum(np.linalg.norm(mn, axis=1, keepdims=True), 1e-30)
                ids_n = newg["vec_id"].to_numpy(np.int64)
                if len(oldg):
                    mo = np.stack(oldg["embedding"].to_numpy()).reshape(-1, dim)
                    mo = mo / np.maximum(
                        np.linalg.norm(mo, axis=1, keepdims=True), 1e-30
                    )
                    ids_o = oldg["vec_id"].to_numpy(np.int64)
                    s = mn @ mo.T
                    ia, ib = np.where(s >= thr)
                    aa, bb = ids_n[ia], ids_o[ib]
                    keep = aa != bb  # a re-ingested vec never pairs with itself
                    outs.append(pd.DataFrame({
                        "doc_a": np.minimum(aa[keep], bb[keep]),
                        "doc_b": np.maximum(aa[keep], bb[keep]),
                    }))
                if len(newg) >= 2:
                    s = mn @ mn.T
                    ia, ib = np.triu_indices(len(ids_n), k=1)
                    hit = s[ia, ib] >= thr
                    outs.append(pd.DataFrame({
                        "doc_a": ids_n[ia[hit]], "doc_b": ids_n[ib[hit]],
                    }))
            if not outs:
                return empty
            out = pd.concat(outs, ignore_index=True).drop_duplicates()
            return out.astype({"doc_a": "int64", "doc_b": "int64"})

        from ..stages.shuffle import bucketed_map_groups

        pairs = bucketed_map_groups(
            tagged, ["list_id"], pair_fn, input_bytes=eb
        ).materialize()
        pairs_h, n_pairs = _pairs_handle(pairs)

        new_ids = sig_new.map_batches(
            lambda b: b[["vec_id"]].drop_duplicates().rename(
                columns={"vec_id": "doc_id"}
            ),
            batch_format="pandas",
        )
        lost_ds, n_lost = _resolve_losers(new_ids, pairs_h, n_pairs, n_new, eb)

        survivors_src = new_vecs.map_batches(
            lambda b: b[["vec_id"]], batch_format="pandas"
        )
        survivors = _drop_losers(
            survivors_src, lost_ds, n_lost, "vec_id", eb
        ).materialize()
        n_kept = survivors.count()

        # fold ALL epoch vectors into the index memory, then commit the
        # survivor ids — idx.add is itself exactly-once by update_id, so a
        # crash between the two leaves a retry that re-mines identically
        self.idx.add(new_vecs, update_id, input_bytes=_epoch_bytes(new_vecs))
        self._commit_epoch(survivors, n_kept, update_id)
        return {
            "applied": True,
            "update_id": update_id,
            "new_vecs": int(n_new),
            "known_before": known,
            "pairs": int(n_pairs),
            "dropped_dedup": int(n_lost),
            "curated": int(n_kept),
            "total_curated": int(self.meta["n_curated"]),
        }

    # -- read ---------------------------------------------------------------

    def fsck(self, deep: bool = False) -> dict:
        """Committed epoch dirs exist; row totals match n_curated; the
        owned IVF index passes its own audit (``deep`` propagates into its
        per-list content scan)."""
        errors, _files, total, _missing = self._epochs_rowcount_audit()
        sub_audit = self.idx.fsck(deep=deep)
        if not sub_audit["ok"]:
            errors.append(f"ivf index: {sub_audit['errors']}")
        return {"ok": not errors, "errors": errors, "rows": total}


def q_incremental_curation_embedding(sf_dir: str):
    """Driver-facing demo of the embedding-dedup incremental flow: bootstrap
    the embedding curator on the first 80% of vectors (trains the IVF
    quantizer, dedups the bootstrap corpus new×new), ingest the remaining
    20% as epoch 2 — dropping near-dups by cosine against the index memory,
    O(epoch · touched lists), never all-pairs — and return the curated
    vec_ids. Rows-only: FWW across epochs is order-dependent state (the
    static SQL twin is `dedup_clusters_embedding`'s min-id convention)."""
    import tempfile

    from ..stages.shuffle import table_bytes, table_rows

    path = os.path.join(sf_dir, "embeddings.parquet")
    cut = int(table_rows(path) * 0.8)  # vec_ids are 0..n-1
    blocks = min(64, max(2, table_bytes(path) >> 20))
    vecs = rd.read_parquet(
        path, columns=["vec_id", "embedding"], override_num_blocks=blocks
    )
    old = vecs.map_batches(lambda b: b[b["vec_id"] < cut], batch_format="pandas")
    new = vecs.map_batches(lambda b: b[b["vec_id"] >= cut], batch_format="pandas")
    work = tempfile.mkdtemp(prefix="embcur-", dir="/tmp")
    try:
        cur = EmbeddingCurator(work, threshold=0.42, n_lists=8)
        cur.bootstrap(old, update_id="epoch-1")
        cur.ingest(new, update_id="epoch-2")
        out = cur.curated().map_batches(
            lambda b: b[["vec_id"]], batch_format="pandas"
        ).materialize()  # detach from the curator's files
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# bootstrap fixture per (process, sf_dir) for the embedding curator's
# steady-state query — same copy-per-call protocol as _EPOCH_FIXTURE
_EMB_EPOCH_FIXTURE: dict[str, str] = {}


def q_incremental_curation_embedding_epoch(sf_dir: str):
    """STEADY-STATE cost of one embedding-curator ingest epoch — the
    capacity-planning twin of `incremental_curation_epoch` for the vector
    side: the epoch-1 fixture (curator bootstrapped on the first 80% of
    vectors, quantizer trained, bootstrap near-dups resolved) is built once
    per process and COPIED per call, so repeated timings measure only the
    per-epoch work: probe each new vector's nearest lists, point-read
    exactly the touched lists' stored vectors, exact cosine within lists,
    FWW loser resolution, fold + commit. Returns the deterministic one-row
    epoch summary (rows-only: FWW across epochs is order-dependent state)."""
    import tempfile

    from ..stages.shuffle import table_bytes, table_rows

    path = os.path.join(sf_dir, "embeddings.parquet")
    cut = int(table_rows(path) * 0.8)
    blocks = min(64, max(2, table_bytes(path) >> 20))
    vecs = rd.read_parquet(
        path, columns=["vec_id", "embedding"], override_num_blocks=blocks
    )
    old = vecs.map_batches(lambda b: b[b["vec_id"] < cut], batch_format="pandas")
    new = vecs.map_batches(lambda b: b[b["vec_id"] >= cut], batch_format="pandas")

    fixture = _EMB_EPOCH_FIXTURE.get(sf_dir)
    if fixture is None:
        import atexit

        fixture = tempfile.mkdtemp(prefix="embfix-", dir="/tmp")
        atexit.register(shutil.rmtree, fixture, ignore_errors=True)
        cur = EmbeddingCurator(fixture, threshold=0.42, n_lists=8)
        cur.bootstrap(old, update_id="epoch-1")
        _EMB_EPOCH_FIXTURE[sf_dir] = fixture

    work = tempfile.mkdtemp(prefix="embepoch-", dir="/tmp")
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(fixture, work)
    try:
        # reopen with no explicit params: the copied store's persisted
        # threshold/mine_probes/n_lists are adopted (mismatch would raise)
        cur = EmbeddingCurator(work)
        summary = cur.ingest(new, update_id="epoch-2")
        return pd.DataFrame([summary])
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES = {
    "incremental_curation": q_incremental_curation,
    "incremental_curation_epoch": q_incremental_curation_epoch,
    "incremental_curation_embedding": q_incremental_curation_embedding,
    "incremental_curation_embedding_epoch": q_incremental_curation_embedding_epoch,
}
