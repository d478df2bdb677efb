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
2. the touched-bucket key set is computed as a DISTRIBUTED bucketed
   distinct. When pushdown-sized (the steady state: O(new · bands) keys)
   it is collected under the size gate and the existing index is read with
   a parquet ``band_hash IN (...)`` predicate (rows are written sorted by
   ``band_hash``, so row-group min/max stats prune the read) plus a
   vectorized packed-key ``np.isin`` residual filter; above the gate (the
   bootstrap epoch, where new = whole corpus) the index rows are instead
   SEMI-JOINED against the touched key set — one bucketed exchange,
   nothing corpus-sized ever passes through the driver;
3. one bucketed pass emits candidate pairs per (band, band_hash) LSH
   bucket with at least one NEW endpoint (new×old and new×new — never
   old×old, those were mined when the old docs were new; a re-ingested
   doc never pairs with itself);
4. the shared distributed verify (`dedup.make_jaccard_verify` through
   `_endpoint_verify`) keeps exact word-Jaccard ≥ threshold — nothing
   corpus-sized touches the driver;
5. the new signature rows are committed like the lake commits epochs: each
   update writes its own staged subdir, then the subdir is recorded in the
   meta manifest atomically. Readers only see committed subdirs (a crash
   mid-write leaves an orphan dir that the next attempt overwrites), and a
   caller-supplied ``update_id`` makes retried epochs fold in exactly once
   (mining is read-only and simply re-runs).

The index grows by O(bands) rows per document — the same asymptotics as
the lake itself.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..stages.actors import cached_get, per_worker
from ..stages.dedup_stages import MinHashLSH
from ..stages.shuffle import bucketed_map_groups

# gate-collected endpoint prune before pair verification (see update()):
# "auto" prunes only when the indexed corpus is large enough that shingling
# it would dominate (measured at sf0.1 / 5k docs: the prune's extra plan
# stage costs ~1 s MORE than the shingle volume it saves, so small corpora
# take the plain full-stream plan; at 10^6+ docs the full stream is the
# O(corpus)-per-epoch scale hazard the prune exists to remove). True/False
# force either path — tests A/B them for bit-identical pairs.
_VERIFY_PRUNE = "auto"
_VERIFY_PRUNE_MIN_DOCS = 250_000

# above this many touched band_hash values, skip the parquet IN-predicate
# (a huge DNF slows planning more than it saves) and rely on the
# vectorized residual filter alone
_PUSHDOWN_MAX_KEYS = 50_000

# hot-bucket cap per side, same rationale as dedup_stages.pairs_from_group:
# a degenerate band must not blow up quadratically
_MAX_BUCKET = 512


def _pack_keys(band: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """(band, band_hash) → one uint64 key (bands < 64, so 6 low bits)."""
    return (band_hash.astype(np.uint64) << np.uint64(6)) | band.astype(np.uint64)


def _check_index_file(path: str, ctx: dict) -> list[str]:
    """Deep-fsck content checks for one committed index file: exact schema,
    band values within [0, bands), band_hash sorted (the read-side
    row-group pruning contract)."""
    import pyarrow.parquet as pq

    name = os.path.basename(path)
    t = pq.read_table(path)
    want = {"band", "band_hash", "doc_id"}
    if set(t.column_names) != want:
        return [f"{name}: schema {sorted(t.column_names)} != {sorted(want)}"]
    errs: list[str] = []
    if t.num_rows:
        band = t["band"].to_numpy(zero_copy_only=False)
        if band.min() < 0 or band.max() >= ctx["bands"]:
            errs.append(
                f"{name}: band values [{band.min()}, {band.max()}] outside "
                f"[0, {ctx['bands']})"
            )
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        if np.any(np.diff(bh) < 0):
            errs.append(f"{name}: band_hash not sorted — row-group pruning broken")
    return errs


class MinHashIndex:
    """Persisted LSH bucket table with incremental candidate mining."""

    META = "index_meta.json"
    FORMAT = 2  # committed-subdir manifest; bump on incompatible layout changes

    def __init__(
        self,
        index_dir: str,
        num_perm: int | None = None,
        bands: int | None = None,
        ngram: int | None = None,
        seed: int | None = None,
    ):
        """Omitted parameters adopt the persisted meta on reopen (the
        manifest is authoritative — auditors/readers need no build
        params); EXPLICITLY passed values that differ still raise
        (state/meta.py owns the protocol)."""
        from ..state.meta import open_or_init_meta

        self.index_dir = index_dir
        self.rows_dir = os.path.join(index_dir, "rows")
        explicit = {
            k: v
            for k, v in {"num_perm": num_perm, "bands": bands,
                         "ngram": ngram, "seed": seed}.items()
            if v is not None
        }
        self.meta, created = open_or_init_meta(
            os.path.join(index_dir, self.META), self.FORMAT,
            f"index at {index_dir}",
            {"num_perm": 64, "bands": 16, "ngram": 3, "seed": 7},
            explicit,
            format_hint=(" — rebuild the index (bootstrap) rather than "
                         "silently missing its rows"),
            mismatch_kind="LSH ",
            mismatch_hint=" — signatures are incompatible",
        )
        if created:
            assert self.meta["bands"] < 64, \
                "packed bucket keys reserve 6 bits for the band"
            os.makedirs(self.rows_dir, exist_ok=True)
            self.meta.update(n_docs=0, committed=[], applied_ids=[])
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
        """Files of COMMITTED update subdirs only (the manifest view)."""
        out: list[str] = []
        for sub in self.meta["committed"]:
            d = os.path.join(self.rows_dir, sub)
            if os.path.isdir(d):
                out.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
        return out

    def row_files_excluding(self, update_ids) -> list[str]:
        """Committed row files EXCLUDING the subdirs folded by the given
        update id(s) (a str or an iterable of them).

        The lake→curator loop needs this on a crash retry: if a run died
        after the index fold committed but before the curator epoch did,
        that epoch's docs are already in the index — a seen-id filter
        built from ALL row files would drop them and they could never
        re-enter (permanent data loss under strict FWW). The caller
        passes EVERY id applied index-side but not curator-side (more
        than one if further lake epochs committed between the crash and
        the retry). Raises when an applied id's attribution was lost (a
        compact folded the subdirs together) rather than silently
        returning the unsafe full set."""
        ids = {update_ids} if isinstance(update_ids, str) else set(update_ids)
        subs: set[str] = set()
        attrib = self.meta.get("update_subs", {})
        for uid in ids:
            if uid in attrib:
                if attrib[uid] is not None:  # None = a delete: no subdir
                    subs.add(attrib[uid])
            elif uid in self.meta["applied_ids"]:
                raise ValueError(
                    f"update {uid!r} is applied but its subdir "
                    "attribution is gone (compacted?) — cannot safely "
                    "exclude its rows; re-bootstrap the curator"
                )
        excl = {os.path.join(self.rows_dir, s) for s in subs}
        return [f for f in self._row_files() if os.path.dirname(f) not in excl]

    # -- write path ---------------------------------------------------------

    def _signature_rows(self, docs):
        return docs.map_batches(
            per_worker(self._hasher_cls()), batch_format="pandas"
        ).materialize()

    def _fold_in(self, sig, update_id: str | None) -> None:
        """Commit the signature rows: staged subdir + atomic meta append.
        A repeated ``update_id`` is a no-op (the retried-epoch contract).
        Single-writer: mutations take the index's flock (the lake's own
        discipline — staged-subdir names derive from the committed list,
        so concurrent writers would collide on slots)."""
        from ..state.lake import dir_writer_lock

        with dir_writer_lock(self.index_dir, "near-dup index"):
            return self._fold_in_locked(sig, update_id)

    def _fold_in_locked(self, sig, update_id: str | None) -> None:
        if update_id is not None and update_id in self.meta["applied_ids"]:
            return
        n_rows = sig.count()
        sub = f"update-{len(self.meta['committed']):05d}"
        target = os.path.join(self.rows_dir, sub)
        shutil.rmtree(target, ignore_errors=True)  # orphan from a crash
        if n_rows:
            # sorted by band_hash so row-group min/max stats prune reads
            sig.map_batches(
                lambda b: b[["band", "band_hash", "doc_id"]],
                batch_format="pandas",
            ).sort("band_hash").write_parquet(target)
        else:
            os.makedirs(target, exist_ok=True)
        self.meta["committed"].append(sub)
        if update_id is not None:
            self.meta["applied_ids"].append(update_id)
            # subdir attribution: lets row_files_excluding() carve a
            # half-applied update's rows out of a retry's seen-set
            self.meta.setdefault("update_subs", {})[update_id] = sub
        # every signed doc emits exactly `bands` rows
        self.meta["n_docs"] += n_rows // self.meta["bands"]
        self._write_meta()

    def bootstrap(self, docs, update_id: str | None = None) -> None:
        """Load an existing corpus into the index WITHOUT mining pairs —
        the first epoch of a migration (its internal duplicates, if wanted,
        are the batch path's job: q_minhash_near_dup)."""
        self._fold_in(self._signature_rows(docs), update_id)

    # -- delete / compact -----------------------------------------------------

    def delete(self, doc_ids, update_id: str | None = None) -> int:
        """Tombstone documents (CDC delete analog): their rows stop acting
        as candidate endpoints in every subsequent ``update`` immediately;
        ``compact()`` purges them physically and clears the tombstones.
        A tombstoned id stays dead — including if re-added — until the next
        compact (generation semantics; re-use the id after compacting).
        Explicit driver-side id list by design (targeted deletes between
        compactions); exactly-once by update_id."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..state.lake import dir_writer_lock

        with dir_writer_lock(self.index_dir, "near-dup index"):
            if update_id is not None and update_id in self.meta["applied_ids"]:
                return 0
            ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
            ts_dir = os.path.join(self.index_dir, "tombstones")
            os.makedirs(ts_dir, exist_ok=True)
            name = f"t-{len(self.meta.get('tombstones', [])):05d}.parquet"
            path = os.path.join(ts_dir, name)
            pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), path + ".tmp")
            os.replace(path + ".tmp", path)
            self.meta.setdefault("tombstones", []).append(name)
            if update_id is not None:
                self.meta["applied_ids"].append(update_id)
                # a delete folds no subdir: record the attribution as None
                # so row_files_excluding() knows there is nothing to
                # exclude (vs a fold whose attribution was lost — an error)
                self.meta.setdefault("update_subs", {})[update_id] = None
            self._write_meta()
            return len(ids)

    def _tombstone_ids(self) -> np.ndarray:
        import pyarrow.parquet as pq

        names = self.meta.get("tombstones", [])
        if not names:
            return np.array([], dtype=np.int64)
        parts = [
            pq.read_table(os.path.join(self.index_dir, "tombstones", n))["doc_id"]
            .to_numpy(zero_copy_only=False)
            for n in names
        ]
        return np.unique(np.concatenate(parts))

    def compact(self) -> dict:
        """Fold all committed update subdirs into one, purging tombstoned
        docs physically (band_hash-sorted like every fold-in, so row-group
        pruning keeps working). Staged-dir + atomic meta swap; n_docs drops
        by the purged-doc count (each doc is exactly ``bands`` rows)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..state.lake import dir_writer_lock

        with dir_writer_lock(self.index_dir, "near-dup index"):
            return self._compact_locked(pa, pc)

    def _compact_locked(self, pa, pc) -> dict:
        subs = self.meta["committed"]
        dead = self._tombstone_ids()
        if len(subs) <= 1 and not len(dead):
            return {"compacted": False, "updates": len(subs)}
        files = self._row_files()
        gen = self.meta.get("compactions", 0)
        new_sub = f"compact-{gen:05d}"
        target = os.path.join(self.rows_dir, new_sub)
        shutil.rmtree(target, ignore_errors=True)
        rows_before = self.meta["n_docs"] * self.meta["bands"]
        if files:
            ds = rd.read_parquet(files)
            if len(dead):
                ds = ds.map_batches(
                    lambda b: b.filter(
                        pc.invert(pc.is_in(b["doc_id"], pa.array(dead)))
                    ),
                    batch_format="pyarrow",
                )
            ds = ds.sort("band_hash").materialize()
            rows_after = ds.count()
            if rows_after:
                ds.write_parquet(target)
            else:
                os.makedirs(target, exist_ok=True)
        else:
            rows_after = 0
            os.makedirs(target, exist_ok=True)
        purged = rows_before - rows_after
        if purged % self.meta["bands"] != 0:
            raise RuntimeError(
                f"compact purged {purged} rows, not a multiple of bands="
                f"{self.meta['bands']} — index corrupt, old set left intact"
            )
        old = list(subs)
        old_ts = list(self.meta.get("tombstones", []))
        self.meta["committed"] = [new_sub]
        # per-update subdir attribution is folded away — drop the map so
        # row_files_excluding() refuses (raises) instead of lying
        self.meta["update_subs"] = {}
        self.meta["compactions"] = gen + 1
        self.meta["n_docs"] -= purged // self.meta["bands"]
        self.meta["tombstones"] = []
        self._write_meta()
        for sub in old:
            shutil.rmtree(os.path.join(self.rows_dir, sub), ignore_errors=True)
        for n in old_ts:
            try:
                os.remove(os.path.join(self.index_dir, "tombstones", n))
            except OSError:
                pass
        return {"compacted": True, "updates_folded": len(old),
                "rows": rows_after, "purged_docs": purged // self.meta["bands"]}

    # -- incremental mining ---------------------------------------------------

    def update(
        self,
        new_docs,
        corpus,
        threshold: float = 0.5,
        input_bytes: int | None = None,
        update_id: str | None = None,
        corpus_bytes: int | None = None,
    ):
        """Mine verified near-dup pairs involving at least one NEW document,
        then fold the new docs into the index.

        ``new_docs``: Dataset[doc_id, text] of this epoch's additions (the
        caller tracks novelty — the CDC watermark already does). ``corpus``:
        Dataset[doc_id, text] covering every indexed doc plus the new ones
        (only candidate ENDPOINTS are attached from it — a bucketed
        semi-join, never a scan-side quadratic). Returns a materialized
        Dataset / DataFrame of (doc_a, doc_b, jaccard).

        ``input_bytes`` sizes the EPOCH-scoped exchanges (touched distinct,
        candidate pairing); when omitted it is derived from the materialized
        signature bytes. ``corpus_bytes`` sizes the verify exchange in the
        un-pruned case, where the shingle stream is the FULL corpus — an
        epoch-sized estimate there would let a tiny epoch over a large
        corpus collapse the whole corpus's exploded shingles into one local
        task. When omitted and un-pruned, the verify stays distributed
        (never guess small)."""
        from .dedup import _endpoint_verify, make_jaccard_verify, make_shingle_rows

        from ..stages.joins import bucketed_hash_join

        sig_new = self._signature_rows(new_docs)
        if input_bytes is None:
            # size the epoch-scoped exchanges (touched distinct, candidate
            # pairing) from the ACTUAL signature bytes — sig_new is already
            # materialized, so this is free. In steady state the epoch is a
            # fraction of a bucket and both exchanges collapse to the
            # single-task local plan; a bootstrap-sized epoch grows the
            # byte count and takes the distributed plan automatically.
            try:
                input_bytes = sig_new.size_bytes()
            except Exception:
                pass

        # touched-bucket key set, computed DISTRIBUTED (bucketed distinct).
        # In steady state it is O(new · bands) and pushdown-sized; in the
        # bootstrap epoch (new = whole corpus) it is corpus-sized — so it is
        # only ever collected to the driver under the size gate, never
        # unconditionally (the r3 scale hazard: tens of GB through the
        # driver at 10^9 docs × 8 bands).
        touched = bucketed_map_groups(
            sig_new.map_batches(
                lambda b: b[["band", "band_hash"]].rename(
                    columns={"band": "t_band", "band_hash": "t_hash"}
                ),
                batch_format="pandas",
            ),
            keys=["t_band", "t_hash"],
            fn=lambda g: g.drop_duplicates(),
            pre=lambda b: b.drop_duplicates(),
            input_bytes=input_bytes,
        ).materialize()
        n_touched = touched.count()

        files = self._row_files()
        tagged = sig_new.map_batches(
            lambda b: b.assign(is_new=np.int8(1)), batch_format="pandas"
        )
        if files and n_touched:
            if n_touched <= _PUSHDOWN_MAX_KEYS:
                # small touched set: parquet IN-predicate (row-group stats
                # prune the read) + packed-key np.isin residual — collecting
                # it is bounded by the gate
                import pyarrow.compute as pc

                tdf = touched.to_pandas()
                touched_packed = np.unique(
                    _pack_keys(
                        tdf["t_band"].to_numpy(), tdf["t_hash"].to_numpy()
                    )
                )
                touched_hashes = np.unique(tdf["t_hash"].to_numpy())
                touched_ref = ray.put(touched_packed)

                def prefilter(b: pd.DataFrame) -> pd.DataFrame:
                    keys = _pack_keys(
                        b["band"].to_numpy(), b["band_hash"].to_numpy()
                    )
                    mask = np.isin(keys, cached_get(touched_ref))
                    return b[mask].assign(is_new=np.int8(0))

                existing = rd.read_parquet(
                    files,
                    filter=pc.field("band_hash").isin(touched_hashes.tolist()),
                ).map_batches(prefilter, batch_format="pandas")
            else:
                # bootstrap-scale touched set: bucketed semi-join of the
                # index rows against the distinct touched keys — one
                # exchange over the bucket table, nothing on the driver
                existing = bucketed_hash_join(
                    rd.read_parquet(files),
                    touched,
                    left_on=["band", "band_hash"],
                    right_on=["t_band", "t_hash"],
                    how="left_semi",
                    input_bytes=input_bytes,
                ).map_batches(
                    lambda b: b.assign(is_new=np.int8(0)),
                    batch_format="pandas",
                )
            tagged = tagged.union(existing)

        # tombstoned docs are dead on BOTH sides until compact() (see
        # delete() — generation semantics): drop their rows before pairing.
        # The dead set is bounded by deletes since the last compact.
        dead = self._tombstone_ids()
        if len(dead):
            dead_ref = ray.put(dead)
            tagged = tagged.map_batches(
                lambda b: b[~np.isin(b["doc_id"].to_numpy(), cached_get(dead_ref))],
                batch_format="pandas",
            )

        def pairs_with_new(g: pd.DataFrame) -> pd.DataFrame:
            # one shuffle bucket holds MANY (band, band_hash) LSH buckets —
            # regroup before pairing (pairing across LSH buckets would both
            # invent candidates and misapply the hot-bucket cap); singleton
            # buckets drop vectorized first
            empty = pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64")}
            )
            sizes = g.groupby(["band", "band_hash"], sort=False)[
                "doc_id"
            ].transform("size")
            hits = g[sizes >= 2]
            outs = []
            for _, grp in hits.groupby(["band", "band_hash"], sort=False):
                # a re-ingested doc may appear as both new and old: classify
                # by ANY new row, and never pair a doc with itself
                per_doc = grp.groupby("doc_id", sort=False)["is_new"].max()
                new = np.sort(per_doc[per_doc == 1].index.to_numpy())
                old = np.sort(per_doc[per_doc == 0].index.to_numpy())
                new, old = new[:_MAX_BUCKET], old[:_MAX_BUCKET]
                if len(new) >= 2:
                    ia, ib = np.triu_indices(len(new), k=1)
                    outs.append(
                        pd.DataFrame({"doc_a": new[ia], "doc_b": new[ib]})
                    )
                if len(new) and len(old):
                    aa = np.repeat(new, len(old))
                    bb = np.tile(old, len(new))
                    keep = aa != bb
                    aa, bb = aa[keep], bb[keep]
                    outs.append(
                        pd.DataFrame(
                            {"doc_a": np.minimum(aa, bb),
                             "doc_b": np.maximum(aa, bb)}
                        )
                    )
            if not outs:
                return empty
            out = pd.concat(outs, ignore_index=True).drop_duplicates()
            return out.astype({"doc_a": "int64", "doc_b": "int64"})

        candidates = bucketed_map_groups(
            tagged, ["band", "band_hash"], pairs_with_new, input_bytes=input_bytes
        ).materialize()

        # verify-side corpus pruning: shingling the WHOLE corpus every epoch
        # makes the steady-state epoch O(corpus); the endpoints of the mined
        # candidates are O(epoch), so when the corpus is big enough for the
        # shingle volume to matter (_VERIFY_PRUNE_MIN_DOCS) and the
        # candidate set fits the size gate, collect its ids (bounded by the
        # gate), broadcast once, and shingle only those docs. Above the gate
        # (bootstrap-scale candidate sets) the full stream is the right
        # plan: the endpoint set is itself corpus-sized. A/B-verified
        # bit-identical pairs (interleaved, 3 rounds) at sf0.1.
        feats_src = corpus
        pruned = False
        n_cand = candidates.count()
        prune = (
            self.meta["n_docs"] >= _VERIFY_PRUNE_MIN_DOCS
            if _VERIFY_PRUNE == "auto"
            else bool(_VERIFY_PRUNE)
        )
        if prune and 0 < n_cand <= _PUSHDOWN_MAX_KEYS // 2:
            cdf = candidates.to_pandas()  # bounded by the gate
            end_ids = np.unique(
                np.concatenate(
                    [cdf["doc_a"].to_numpy(np.int64), cdf["doc_b"].to_numpy(np.int64)]
                )
            )
            end_ref = ray.put(end_ids)
            feats_src = corpus.map_batches(
                lambda b: b[np.isin(b["doc_id"].to_numpy(), cached_get(end_ref))],
                batch_format="pandas",
            )
            pruned = True

        # un-pruned verify streams the FULL corpus's shingles: size it from
        # corpus bytes (None → distributed), never from the epoch signature
        verify_bytes = input_bytes if pruned else corpus_bytes
        verified = _endpoint_verify(
            candidates,
            feats_src.map_batches(
                make_shingle_rows(self.meta["ngram"]), batch_format="pandas"
            ),
            "doc_a",
            "doc_b",
            make_jaccard_verify(threshold),
            input_bytes=verify_bytes,
        )
        if not isinstance(verified, pd.DataFrame):
            verified = verified.materialize()

        self._fold_in(sig_new, update_id)
        return verified

    def stats(self) -> dict:
        return {
            **self.meta,
            "n_updates": len(self.meta["committed"]),
            "row_files": len(self._row_files()),
        }

    def fsck(self, deep: bool = False) -> dict:
        """Integrity audit (the lake-fsck analog for the index): every
        committed subdir must exist and the total committed row count must
        equal n_docs · bands (each signed doc emits exactly one row per
        band). Orphan subdirs (a crash between write and commit) are
        reported, not errors — the next fold-in at that slot overwrites.

        ``deep`` adds a Ray Data scan (one task per committed file, the
        lake-fsck pattern) validating row CONTENTS against the meta: exact
        schema, band values in [0, bands), and band_hash sorted within each
        file (the read-side row-group pruning contract); plus a
        footer-level per-subdir rows % bands == 0 check (a fold-in commits
        whole docs — a torn file inside a committed subdir breaks it)."""
        import pyarrow.parquet as pq

        errors, missing = [], []
        total_rows = 0
        for sub in self.meta["committed"]:
            d = os.path.join(self.rows_dir, sub)
            if not os.path.isdir(d):
                missing.append(sub)
                continue
            sub_rows = 0
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    sub_rows += pq.read_metadata(os.path.join(d, f)).num_rows
            total_rows += sub_rows
            if deep and sub_rows % self.meta["bands"] != 0:
                errors.append(
                    f"subdir {sub}: {sub_rows} rows not a multiple of "
                    f"bands={self.meta['bands']} (torn fold-in?)"
                )
        if missing:
            errors.append(f"committed subdirs missing on disk: {missing}")
        want_rows = self.meta["n_docs"] * self.meta["bands"]
        if not missing and total_rows != want_rows:
            errors.append(
                f"row count {total_rows} != n_docs*bands {want_rows} "
                "(partial write inside a committed subdir?)"
            )
        if deep and not missing:
            from ..state.fsck import deep_scan_files

            errors.extend(deep_scan_files(self._row_files(), _check_index_file,
                                          {"bands": self.meta["bands"]}))
        orphans = [
            s
            for s in os.listdir(self.rows_dir)
            if os.path.isdir(os.path.join(self.rows_dir, s))
            and s not in self.meta["committed"]
        ] if os.path.isdir(self.rows_dir) else []
        return {
            "ok": not errors,
            "errors": errors,
            "committed": len(self.meta["committed"]),
            "rows": total_rows,
            "orphans": orphans,
        }


def q_incremental_near_dup(sf_dir: str, threshold: float = 0.5):
    """Driver-facing demo of the incremental flow: bootstrap the index with
    the first 80% of documents (epoch 1, signatures only — no mining), then
    ingest the remaining 20% as epoch 2 — the returned pairs are epoch-2's
    verified near-dups (new×old and new×new), mined WITHOUT re-pairing the
    epoch-1 corpus against itself. Rows-only (candidate-based, like the
    batch MinHash path); the planted near-dup pairs straddling the boundary
    make the output non-vacuous at every sf."""
    import shutil as _sh
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
        idx.bootstrap(old, update_id="epoch-1")
        out = idx.update(
            new, docs, threshold=threshold, input_bytes=nbytes,
            update_id="epoch-2", corpus_bytes=nbytes,
        )
        if not isinstance(out, pd.DataFrame):
            out = out.materialize()  # detach from the index files
        return out
    finally:
        _sh.rmtree(work, ignore_errors=True)


QUERIES = {"incremental_near_dup": q_incremental_near_dup}
