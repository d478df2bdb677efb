"""Persisted incremental IVF ANN index — similarity search the way the
lake does CDC.

The batch ANN paths (analytics.q_ann_topk brute force, dedup's LSH/IVF)
re-score or re-train per query run; a serving/ingest pipeline over a
growing embedding corpus wants the inverted-file structure built ONCE and
maintained incrementally:

- ``bootstrap`` trains the coarse quantizer (deterministic Lloyd's k-means
  on a BOUNDED sample — ``ds.limit(sample_max)``, never the corpus) and
  stores the centroids as ``centroids.npy`` next to the index meta;
- every ``add`` epoch assigns its vectors to their nearest centroid inside
  a broadcast-centroid ``map_batches`` stage and writes ONE parquet file
  per (update, list) via the bucketed backbone — the index IS the vector
  storage, partitioned by list, so a query touches only the lists it
  probes. Commits follow the lake/MinHashIndex discipline: staged per-
  update subdir + atomic meta manifest + caller ``update_id`` for
  exactly-once retried epochs;
- ``query`` reads ONLY the ``nprobe`` closest lists' files (a file-layout
  point read — O(corpus/n_lists · nprobe) rows, never a table scan),
  scores exact cosine on the candidates, and returns top-k. With
  ``nprobe = n_lists`` the candidate set is the whole corpus and the
  result is EXACTLY the brute-force answer — which is how the registered
  query stays oracle-checked against the same SQL as ``ann_topk`` while
  the approximate path is pinned by a recall test.

Scale: n_lists grows with the corpus (≈ sqrt(n) is the usual rule); the
per-list files stay bounded because each update writes its own partition
files — a compaction (concat small per-update list files) is the same
size-tiered story as the lake's minor compaction and can reuse it later.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..functions.linalg import sq_dists
from ..stages.actors import cached_get
from ..stages.shuffle import bucketed_map_groups

_ROUND6 = lambda x: np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6  # noqa: E731


def _kmeans(sample: np.ndarray, n_lists: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic Lloyd's on the sample (same kernel as dedup's
    q_ann_topk_ivf, dedup.py)."""
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)]
    for _ in range(iters):
        d2 = sq_dists(sample, cent)  # O(rows × n_lists) memory, not ×dim
        assign = d2.argmin(axis=1)
        for c in range(len(cent)):
            pts = sample[assign == c]
            if len(pts):
                cent[c] = pts.mean(axis=0)
    return cent.astype(np.float64)


def _mat_of(batch: pd.DataFrame, dim: int) -> np.ndarray:
    return np.stack(batch["embedding"].to_numpy()).reshape(-1, dim).astype(np.float64)


def _check_list_file(path: str, ctx: dict) -> list[str]:
    """Deep-fsck content checks for one per-list parquet: exact schema,
    dim == meta dim, vec_id sorted, assignment == nearest centroid."""
    import pyarrow.parquet as pq

    from ..functions.linalg import sq_dists as _sq

    name = os.path.basename(path)
    lid = int(name.split("-")[1].split(".")[0])
    t = pq.read_table(path)
    if set(t.column_names) != {"vec_id", "embedding"}:
        return [f"{name}: schema {sorted(t.column_names)} != "
                "['embedding', 'vec_id']"]
    if not t.num_rows:
        return []
    errs: list[str] = []
    vids = t["vec_id"].to_numpy(zero_copy_only=False)
    if np.any(np.diff(vids) < 0):
        errs.append(f"{name}: vec_id not sorted")
    emb = t["embedding"].combine_chunks()
    lens = np.diff(emb.offsets.to_numpy(zero_copy_only=False))
    if np.any(lens != ctx["dim"]):
        errs.append(f"{name}: embedding dim != meta dim {ctx['dim']}")
        return errs
    m = emb.flatten().to_numpy(zero_copy_only=False).reshape(-1, ctx["dim"])
    d2 = _sq(m.astype(np.float64), ctx["centroids"])
    # tie-tolerant: a vector (near-)equidistant between its stored list's
    # centroid and the argmin is a healthy assignment, not corruption —
    # the expanded-form kernel's cancellation error (~1e-9 on unit-scale
    # data) and true ties both flip argmin without any probe-miss risk
    # worth flagging (a midline vector is reached from either list)
    best = d2.min(axis=1)
    stored = d2[:, lid]
    bad = int((stored > best + 1e-6 * np.maximum(best, 1.0)).sum())
    if bad:
        errs.append(
            f"{name}: {bad} vector(s) whose nearest centroid is not list "
            f"{lid} — probes would miss them"
        )
    return errs


class IvfIndex:
    """Inverted-file ANN index persisted as per-list parquet."""

    META = "ivf_meta.json"
    CENTROIDS = "centroids.npy"
    FORMAT = 1

    def __init__(self, index_dir: str, n_lists: int | None = None,
                 iters: int | None = None, seed: int | None = None):
        """Omitted parameters adopt the persisted meta on reopen (the
        manifest is authoritative — an audit/reader must not need to
        re-state build params); EXPLICITLY passed values that differ from
        the persisted ones still raise (state/meta.py owns the
        protocol)."""
        from ..state.meta import open_or_init_meta

        self.index_dir = index_dir
        self.rows_dir = os.path.join(index_dir, "rows")
        explicit = {k: v for k, v in
                    {"n_lists": n_lists, "iters": iters, "seed": seed}.items()
                    if v is not None}
        self.meta, created = open_or_init_meta(
            os.path.join(index_dir, self.META), self.FORMAT,
            f"index at {index_dir}",
            {"n_lists": 16, "iters": 5, "seed": 17},
            explicit, mismatch_kind="IVF ",
        )
        if created:
            os.makedirs(self.rows_dir, exist_ok=True)
            self.meta.update(dim=None, n_vecs=0, committed=[],
                             applied_ids=[])
            self._centroids = None
            self._write_meta()
        else:
            # a store can legitimately exist UNtrained (created, process
            # died before train()) — reopen must come back trainable, not
            # crash on the missing centroids file
            cpath = os.path.join(index_dir, self.CENTROIDS)
            self._centroids = np.load(cpath) if os.path.exists(cpath) else None

    def _write_meta(self) -> None:
        tmp = os.path.join(self.index_dir, f".{self.META}.tmp")
        with open(tmp, "w") as f:
            json.dump(self.meta, f)
        os.replace(tmp, os.path.join(self.index_dir, self.META))

    # -- build ------------------------------------------------------------

    def train(self, vecs, sample_max: int = 100_000) -> np.ndarray:
        """Train the coarse quantizer on a bounded sample of ``vecs`` (a
        Dataset of (vec_id, embedding)) WITHOUT folding anything in — the
        embedding curator mines its bootstrap epoch's pairs between train
        and add, the same mine-before-fold order as MinHashIndex.update."""
        if self._centroids is not None:
            raise ValueError("index already bootstrapped — use add()")
        sample_df = vecs.limit(sample_max).to_pandas()  # bounded by design
        dim = len(sample_df["embedding"].iloc[0])
        sample = _mat_of(sample_df, dim)
        cent = _kmeans(sample, self.meta["n_lists"], self.meta["iters"],
                       self.meta["seed"])
        np.save(os.path.join(self.index_dir, self.CENTROIDS), cent)
        self._centroids = cent
        self.meta["dim"] = dim
        self._write_meta()
        return cent

    def bootstrap(self, vecs, update_id: str, sample_max: int = 100_000,
                  input_bytes: int | None = None) -> int:
        """Train the quantizer on a bounded sample of ``vecs`` (a Dataset of
        (vec_id, embedding)), then fold the whole input in as epoch 1."""
        self.train(vecs, sample_max=sample_max)
        return self.add(vecs, update_id, input_bytes=input_bytes)

    def add(self, vecs, update_id: str, input_bytes: int | None = None) -> int:
        """Assign + append one epoch of vectors; exactly-once by update_id.
        Single-writer: mutations take the index's flock (staged-subdir
        names derive from the committed list — the lake's discipline)."""
        from ..state.lake import dir_writer_lock

        if self._centroids is None:
            raise ValueError("bootstrap() first — the quantizer is untrained")
        with dir_writer_lock(self.index_dir, "ann index"):
            return self._add_locked(vecs, update_id, input_bytes)

    def _add_locked(self, vecs, update_id: str, input_bytes: int | None) -> int:
        if update_id in self.meta["applied_ids"]:
            return 0
        dim = self.meta["dim"]
        sub = f"u-{len(self.meta['committed']):05d}-{update_id}"
        sub_dir = os.path.join(self.rows_dir, sub)
        shutil.rmtree(sub_dir, ignore_errors=True)  # orphan from a crash
        os.makedirs(sub_dir, exist_ok=True)
        cref = ray.put(self._centroids)

        def assign(batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                batch = batch.copy(deep=False)
                batch["list_id"] = pd.array([], dtype="int64")
                return batch
            cent = cached_get(cref)
            m = _mat_of(batch, dim)
            d2 = sq_dists(m, cent)
            batch = batch.copy(deep=False)
            batch["list_id"] = d2.argmin(axis=1).astype(np.int64)
            return batch

        def write_list(g: pd.DataFrame) -> pd.DataFrame:
            import pyarrow as pa
            import pyarrow.parquet as pq

            out = []
            for lid, part in g.groupby("list_id", sort=True):
                part = part.sort_values("vec_id")
                path = os.path.join(sub_dir, f"list-{int(lid):05d}.parquet")
                tmp = path + ".tmp"
                pq.write_table(
                    pa.table({
                        "vec_id": pa.array(part["vec_id"].to_numpy(np.int64)),
                        "embedding": pa.array(
                            part["embedding"].tolist(),
                            pa.list_(pa.float64()),
                        ),
                    }),
                    tmp,
                )
                os.replace(tmp, path)  # deterministic path: retries overwrite
                out.append((int(lid), len(part)))
            return pd.DataFrame(out, columns=["list_id", "rows"])

        counts = bucketed_map_groups(
            vecs.map_batches(assign, batch_format="pandas"),
            keys=["list_id"],
            fn=write_list,
            input_bytes=input_bytes,
        ).to_pandas()  # O(n_lists) rows
        n = int(counts["rows"].sum()) if len(counts) else 0
        self.meta["committed"].append(sub)
        self.meta["applied_ids"].append(update_id)
        self.meta["n_vecs"] += n
        self._write_meta()
        return n

    # -- delete -----------------------------------------------------------

    def delete(self, vec_ids, update_id: str) -> int:
        """Tombstone a set of vector ids (CDC delete analog): queries stop
        returning them immediately; ``compact()`` purges them physically.
        The id set is an explicit driver-side list by design — deletes are
        a small targeted operation between compactions (bulk rewrites go
        through a fresh bootstrap). Exactly-once by update_id."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..state.lake import dir_writer_lock

        with dir_writer_lock(self.index_dir, "ann index"):
            if update_id in self.meta["applied_ids"]:
                return 0
            ids = np.unique(np.asarray(list(vec_ids), dtype=np.int64))
            ts_dir = os.path.join(self.index_dir, "tombstones")
            os.makedirs(ts_dir, exist_ok=True)
            name = f"t-{len(self.meta.get('tombstones', [])):05d}-{update_id}.parquet"
            path = os.path.join(ts_dir, name)
            tmp = path + ".tmp"
            pq.write_table(pa.table({"vec_id": pa.array(ids, pa.int64())}), tmp)
            os.replace(tmp, path)
            self.meta.setdefault("tombstones", []).append(name)
            self.meta["applied_ids"].append(update_id)
            self._write_meta()
            return len(ids)

    def _tombstone_ids(self) -> np.ndarray:
        """All tombstoned ids (bounded by deletes since the last compact)."""
        import pyarrow.parquet as pq

        names = self.meta.get("tombstones", [])
        if not names:
            return np.array([], dtype=np.int64)
        parts = [
            pq.read_table(os.path.join(self.index_dir, "tombstones", n))["vec_id"]
            .to_numpy(zero_copy_only=False)
            for n in names
        ]
        return np.unique(np.concatenate(parts))

    # -- read -------------------------------------------------------------

    def _list_files(self, list_ids) -> list[str]:
        files = []
        for sub in self.meta["committed"]:
            for lid in list_ids:
                p = os.path.join(self.rows_dir, sub, f"list-{int(lid):05d}.parquet")
                if os.path.exists(p):  # a list an update never touched
                    files.append(p)
        return files

    def query(self, qvec: np.ndarray, k: int = 10, nprobe: int = 4,
              exclude: int | None = None) -> pd.DataFrame:
        """(vec_id, score) of the top-k cosine neighbours among the nprobe
        closest lists. nprobe = n_lists ≡ exact brute force."""
        from ..stages.shuffle import local_topk

        if self._centroids is None:
            raise ValueError("bootstrap() first — the quantizer is untrained")
        qvec = np.asarray(qvec, dtype=np.float64)
        qnorm = float(np.linalg.norm(qvec))
        if qnorm == 0.0:
            raise ValueError("zero-norm query vector — cosine is undefined")
        d2 = ((self._centroids - qvec) ** 2).sum(axis=1)
        probe = np.argsort(d2)[: min(nprobe, len(d2))]
        files = self._list_files(probe.tolist())
        if not files:
            return pd.DataFrame({"vec_id": pd.array([], dtype="int64"),
                                 "score": pd.array([], dtype="float64")})
        dim = self.meta["dim"]
        qref = ray.put((qvec, qnorm, self._tombstone_ids()))

        def score(batch: pd.DataFrame) -> pd.DataFrame:
            qv, qn, dead = cached_get(qref)
            if exclude is not None:
                batch = batch[batch["vec_id"] != exclude]
            if len(dead):
                batch = batch[~np.isin(batch["vec_id"].to_numpy(), dead)]
            if not len(batch):
                return pd.DataFrame({"vec_id": pd.array([], dtype="int64"),
                                     "score": pd.array([], dtype="float64")})
            m = _mat_of(batch, dim)
            norms = np.linalg.norm(m, axis=1)
            keep = norms > 0.0  # a stored all-zero vector has no cosine rank
            m, norms = m[keep], norms[keep]
            batch = batch[keep]
            s = (m @ qv) / (norms * qn)
            return pd.DataFrame({
                "vec_id": batch["vec_id"].to_numpy(np.int64),
                "score": _ROUND6(s),
            })

        scored = rd.read_parquet(files).map_batches(score, batch_format="pandas")
        top = local_topk(scored, by=["score", "vec_id"],
                         descending=[True, False], k=k)
        return top.to_pandas().reset_index(drop=True)

    def compact(self) -> dict:
        """Fold every committed update's per-list files into ONE file per
        list (the lake-compact analog): probe cost drops from O(#updates)
        file opens per list to one, row-identical. Crash-safe like the
        lake: the compacted subdir is fully staged first, the meta swap is
        atomic, and a crash in between leaves the old committed set
        readable plus an orphan the next compact overwrites. applied_ids
        survive, so retried epochs stay exactly-once across compactions."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..state.lake import dir_writer_lock

        with dir_writer_lock(self.index_dir, "ann index"):
            return self._compact_locked(pa, pq)

    def _compact_locked(self, pa, pq) -> dict:
        subs = self.meta["committed"]
        dead = self._tombstone_ids()
        if len(subs) <= 1 and not len(dead):
            return {"compacted": False, "updates": len(subs)}
        per_list: dict[int, list[str]] = {}
        for sub in subs:
            d = os.path.join(self.rows_dir, sub)
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    lid = int(f.split("-")[1].split(".")[0])
                    per_list.setdefault(lid, []).append(os.path.join(d, f))
        gen = self.meta.get("compactions", 0)
        new_sub = f"c-{gen:05d}-compact"
        new_dir = os.path.join(self.rows_dir, new_sub)
        shutil.rmtree(new_dir, ignore_errors=True)
        os.makedirs(new_dir, exist_ok=True)

        dead_ref = ray.put(dead)

        def fold(batch: pd.DataFrame) -> pd.DataFrame:
            dead_w = cached_get(dead_ref)
            out = []
            for _, row in batch.iterrows():
                t = pa.concat_tables([pq.read_table(p) for p in row["files"]])
                t = t.sort_by("vec_id")
                n_in = t.num_rows
                if len(dead_w):  # physical purge of tombstoned vectors
                    import pyarrow as _pa

                    keep = ~np.isin(t["vec_id"].to_numpy(zero_copy_only=False), dead_w)
                    t = t.filter(_pa.array(keep))
                path = os.path.join(new_dir, f"list-{int(row['lid']):05d}.parquet")
                tmp = path + ".tmp"
                pq.write_table(t, tmp)
                os.replace(tmp, path)
                out.append((int(row["lid"]), t.num_rows, n_in - t.num_rows))
            return pd.DataFrame(out, columns=["lid", "rows", "purged"])

        items = [{"lid": lid, "files": fs} for lid, fs in sorted(per_list.items())]
        counts = (
            rd.from_items(items, override_num_blocks=min(len(items), 64))
            .map_batches(fold, batch_format="pandas")
            .to_pandas()  # O(n_lists) rows
        )
        total = int(counts["rows"].sum()) if len(counts) else 0
        purged = int(counts["purged"].sum()) if len(counts) else 0
        if total + purged != self.meta["n_vecs"]:
            raise RuntimeError(
                f"compact row mismatch: folded {total} + purged {purged}, "
                f"expected {self.meta['n_vecs']} — leaving the old committed set"
            )
        old = list(subs)
        old_ts = list(self.meta.get("tombstones", []))
        self.meta["committed"] = [new_sub]
        self.meta["compactions"] = gen + 1
        self.meta["n_vecs"] = total  # physical rows after the purge
        self.meta["tombstones"] = []
        self._write_meta()
        for sub in old:  # best-effort: failures leave orphans, not errors
            shutil.rmtree(os.path.join(self.rows_dir, sub), ignore_errors=True)
        for n in old_ts:
            try:
                os.remove(os.path.join(self.index_dir, "tombstones", n))
            except OSError:
                pass
        return {"compacted": True, "updates_folded": len(old),
                "lists": len(items), "rows": total, "purged": purged}

    def stats(self) -> dict:
        return {k: v for k, v in self.meta.items() if k != "centroids"} | {
            "n_updates": len(self.meta["committed"])
        }

    def fsck(self, deep: bool = False) -> dict:
        """Integrity audit: committed subdirs exist and footer row counts
        sum to n_vecs; orphans reported, not errors (next add overwrites).

        ``deep`` adds a distributed per-list-file content scan validating
        rows against the meta: exact schema, embedding dim == meta dim,
        vec_id sorted (the write contract), and every vector's nearest
        centroid == the file's list id — a misassigned vector is invisible
        to the probes that should find it, the worst silent corruption an
        IVF layout can carry."""
        import pyarrow.parquet as pq

        errors, missing, total = [], [], 0
        for sub in self.meta["committed"]:
            d = os.path.join(self.rows_dir, sub)
            if not os.path.isdir(d):
                missing.append(sub)
                continue
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(d, f)).num_rows
        if missing:
            errors.append(f"committed subdirs missing: {missing}")
        if not missing and total != self.meta["n_vecs"]:
            errors.append(f"row count {total} != n_vecs {self.meta['n_vecs']}")
        if deep and not missing and self._centroids is not None:
            from ..state.fsck import deep_scan_files

            files = self._list_files(range(len(self._centroids)))
            errors.extend(deep_scan_files(
                files, _check_list_file,
                {"dim": self.meta["dim"], "centroids": self._centroids},
            ))
        orphans = [
            s for s in os.listdir(self.rows_dir)
            if os.path.isdir(os.path.join(self.rows_dir, s))
            and s not in self.meta["committed"]
        ] if os.path.isdir(self.rows_dir) else []
        return {"ok": not errors, "errors": errors, "rows": total,
                "orphans": orphans}


def q_ann_topk_ivf_index(sf_dir: str, k: int = 10):
    """Driver-facing demo of the persisted-index flow: bootstrap on the
    first 80% of vectors, ADD the remaining 20% as a second epoch (the
    incremental path a growing corpus takes), then answer vec 0's top-k
    with an EXHAUSTIVE probe — candidate set = whole corpus, so the result
    is bit-for-bit the brute-force answer and shares ``ann_topk``'s SQL
    oracle. The approximate (small-nprobe) path is pinned by the recall
    test in tests/test_ann_index.py."""
    import tempfile

    import pyarrow.parquet as pq

    from .dedup import _point_read_vec, _read, _t

    path = _t(sf_dir, "embeddings")
    cut = int(pq.read_metadata(path).num_rows * 0.8)  # vec_ids are 0..n-1
    vecs = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    old = vecs.map_batches(lambda b: b[b["vec_id"] < cut], batch_format="pandas")
    new = vecs.map_batches(lambda b: b[b["vec_id"] >= cut], batch_format="pandas")
    work = tempfile.mkdtemp(prefix="ivfidx-", dir="/tmp")
    try:
        idx = IvfIndex(work, n_lists=16)
        idx.bootstrap(old, update_id="epoch-1")
        idx.add(new, update_id="epoch-2")
        audit = idx.fsck()
        if not audit["ok"]:
            raise RuntimeError(f"ivf index failed fsck: {audit['errors']}")
        q = _point_read_vec(path, vec_id=0)
        return idx.query(q, k=k, nprobe=idx.meta["n_lists"], exclude=0)
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES = {"ann_topk_ivf_index": q_ann_topk_ivf_index}
# exhaustive probe ≡ brute force: the persisted-index query shares the
# batch ANN oracle (analytics.ORACLE["ann_topk"]) — wired in __ray_entry__.
