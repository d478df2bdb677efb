"""Lake → documents bridge: ``curate --from-lake``.

Folds the CDC lake's transcript rows into the documents-table shape
(doc_id, text, lang, source, n_chars) — ONE document per conversation,
turns concatenated in turn_idx order as ``role: text`` lines — then runs
the SAME oracle-checked curation chain (pipelines/curate.py) over the
export. This closes the loop the engine exists for: binlog → lake →
dedup/decontaminate/quality-cut → packed training sequences, with zero
curation code that behaves differently on lake-fed input.

Reference analog: the reference feeds its analytics straight from the DB
its loader maintains (src/nostr_pipeline/loaders/event_loader.py writes,
the dashboard queries the same tables); here the lake is that DB and the
curation chain is the consumer.

Scale shape: the fold is one bucketed exchange keyed on conv_id (all
turns of a conversation co-locate; bucket count sized from the lake
bytes), the export is partitioned parquet (one part per bucket block —
resumable, never one giant file), and the chain downstream already sizes
itself from the export via table_bytes (file-or-directory aware).

doc_id assignment: conversations get ``_BENCHMARK_MAX_DOC_ID + (h >> 1)``
where h is the 64-bit deterministic hash of conv_id (same keyed hash the
bucketed backbone partitions by) — stable across runs and cluster sizes
without a global ordering pass, always above the benchmark id range so
the decontamination stage's id convention holds. A held-out benchmark
table (doc_id < _BENCHMARK_MAX_DOC_ID rows of a documents fixture) can be
spliced in so the decontamination stage is live, not vacuous; the
benchmark docs themselves never reach the curated output (the chain drops
ids below the benchmark cutoff before flagging).
"""

from __future__ import annotations

import os
import re
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.shuffle import bucketed_map_groups, bucketed_sum_count, table_rows
from .cdc import read_final
from .dedup import _BENCHMARK_MAX_DOC_ID

# same CJK-block heuristic as stages/text.py's TextAnalyzer (reference:
# event_processor.py:299-315) — module-level so each worker compiles once
_ZH = re.compile("[一-鿿]")
_JA = re.compile("[぀-ゟ゠-ヿ]")
_KO = re.compile("[가-힯]")

_DOC_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars", "conv_id"]


def _lake_bytes(lake_root: str) -> int:
    from ..state.lake import Lake

    lake = Lake(lake_root)
    files = list(lake.snapshot_files())
    if lake.has_deltas():
        for _, (base, deltas) in lake.partition_files().items():
            files.extend(([base] if base else []) + deltas)
    return sum(os.path.getsize(f) for f in set(files) if os.path.exists(f))


def _fold_conversations(df: pd.DataFrame) -> pd.DataFrame:
    """All turns of each conv are in this bucket: order by turn_idx, join
    ``role: text`` lines, derive the document columns. Vectorized except
    the per-group string join (inherent to concatenation)."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    line = df["role"].fillna("") + ": " + df["text"].fillna("")
    text = line.groupby(df["conv_id"].to_numpy(), sort=False).agg("\n".join)
    conv = text.index.to_numpy(dtype=object)
    txt = pd.Series(text.to_numpy(dtype=object))
    h = pd.util.hash_array(conv)  # deterministic keyed 64-bit hash
    doc_id = (
        (h >> np.uint64(1)).astype(np.int64) + np.int64(_BENCHMARK_MAX_DOC_ID)
    )
    lang = np.where(
        txt.str.contains(_ZH),
        "zh",
        np.where(txt.str.contains(_JA), "ja", np.where(txt.str.contains(_KO), "ko", "en")),
    )
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "text": txt.to_numpy(dtype=object),
            "lang": lang,
            "source": "lake",
            "n_chars": txt.str.len().to_numpy(dtype=np.int64),
            "conv_id": conv,
        }
    )


def conversations_as_documents(lake_root: str) -> "rd.Dataset":
    """The lake's current state as a documents-shaped Dataset (one row per
    conversation). One bucketed exchange on conv_id; nothing on the driver."""
    rows = read_final(
        lake_root, columns=["conv_id", "turn_idx", "role", "text"]
    )
    return bucketed_map_groups(
        rows, ["conv_id"], _fold_conversations, input_bytes=_lake_bytes(lake_root)
    )


def _benchmark_rows(benchmark_path: str) -> "rd.Dataset":
    """The held-out set: the sub-benchmark-cutoff rows of a documents
    table — a filtered point read (row-group pruning), never a scan."""
    t = pq.read_table(
        benchmark_path,
        columns=["doc_id", "text", "lang", "source", "n_chars"],
        filters=[("doc_id", "<", _BENCHMARK_MAX_DOC_ID)],
    )
    t = t.append_column("conv_id", pa.array([""] * t.num_rows, pa.string()))
    return rd.from_arrow(t.select(_DOC_COLUMNS))


def export_documents(
    lake_root: str,
    out_dir: str,
    benchmark: str | None = None,
    verify: bool = True,
) -> str:
    """Write the lake's conversations as a partitioned documents table at
    ``out_dir/documents.parquet/`` (a directory of part files — the export
    is owned by this function and replaced on re-run). Returns ``out_dir``,
    which then serves as the sf_dir of every documents-table pipeline.

    ``verify=True`` adds one doc-level distinct pass asserting the hashed
    doc_ids are collision-free (P(collision) ~ n²/2⁶³, but a silent
    collision would merge two conversations downstream — cheap insurance
    at one row per conversation)."""
    docs_dir = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(docs_dir):
        shutil.rmtree(docs_dir)
    os.makedirs(out_dir, exist_ok=True)

    ds = conversations_as_documents(lake_root)
    if benchmark is not None:
        ds = ds.union(_benchmark_rows(benchmark))
    ds.write_parquet(docs_dir)

    if verify:
        n_rows = table_rows(docs_dir)
        n_ids = bucketed_sum_count(
            rd.read_parquet(docs_dir, columns=["doc_id"]),
            ["doc_id"],
            sums={},
            count_as="c",
        ).count()
        if n_ids != n_rows:
            raise RuntimeError(
                f"doc_id collision in lake export: {n_rows} docs but only "
                f"{n_ids} distinct ids — re-key the conversations"
            )
    return out_dir


def curate_from_lake(
    lake_root: str,
    out_dir: str,
    benchmark: str | None = None,
    budget: int = 256,
    jsonl: bool = False,
    plus: bool = False,
    trim: bool = False,
) -> dict:
    """End-to-end: export the lake as documents, then run the composed
    curation chain (dedup → decontaminate → p75 quality cut → pack) over
    the export. Writes ``curated.parquet`` + ``packs.parquet`` under
    ``out_dir`` exactly like fixture-fed ``curate_corpus``."""
    from .curate import curate_corpus

    docs_sf = export_documents(
        lake_root, os.path.join(out_dir, "lake_docs"), benchmark=benchmark
    )
    summary = curate_corpus(docs_sf, out_dir, budget=budget, jsonl=jsonl,
                            plus=plus, trim=trim)
    summary["lake_root"] = lake_root
    summary["exported_docs"] = int(
        table_rows(os.path.join(docs_sf, "documents.parquet"))
    )
    return summary


def _changed_conv_ids(lake, changed_pk: list[int], prev_wm: dict[int, int]):
    """Distinct conv_ids with at least one row applied after the cursor:
    partition-level pruning first (only partitions whose watermark moved
    are read at all), then a per-row lsn > prev-watermark[pkey] filter —
    the lineage structure doing its job. Returns a Dataset[cid]."""
    import ray

    from ..stages.actors import cached_get
    from .cdc import materialize_partition

    thr_ref = ray.put({pk: prev_wm.get(pk, -1) for pk in changed_pk})
    changed = set(changed_pk)
    if lake.has_deltas():
        import pyarrow.compute as pc_

        parts = lake.partition_files()
        items = [
            {"pkey": pk, "base": b, "deltas": d}
            for pk, (b, d) in sorted(parts.items())
            if pk in changed
        ]

        def mat(batch: pa.Table) -> pa.Table:
            thr = cached_get(thr_ref)
            outs = []
            for i in range(batch.num_rows):
                pk = batch["pkey"][i].as_py()
                t = materialize_partition(
                    batch["base"][i].as_py(), list(batch["deltas"][i].as_py() or [])
                )
                hit = t.filter(pc_.greater(t["lsn"], thr[pk]))
                outs.append(pa.table({"cid": hit["conv_id"]}))
            return (
                pa.concat_tables(outs)
                if outs
                else pa.table({"cid": pa.array([], pa.string())})
            )

        rows = rd.from_items(
            items, override_num_blocks=max(1, len(items))
        ).map_batches(mat, batch_format="pyarrow", batch_size=None)
    else:
        files = lake.snapshot_files(pkeys=sorted(changed))

        def newer(df: pd.DataFrame) -> pd.DataFrame:
            thr = cached_get(thr_ref)
            lim = df["pkey"].map(thr).to_numpy()
            return pd.DataFrame(
                {"cid": df.loc[df["lsn"].to_numpy() > lim, "conv_id"]}
            )

        rows = rd.read_parquet(
            files, columns=["conv_id", "lsn", "pkey"]
        ).map_batches(newer, batch_format="pandas")
    return bucketed_map_groups(
        rows,
        ["cid"],
        lambda g: g.drop_duplicates(),
        pre=lambda b: b.drop_duplicates(),
        input_bytes=_lake_bytes(lake.root),
    )


def curate_epoch_from_lake(
    lake_root: str, curator_root: str, benchmark: str | None = None
) -> dict:
    """One exactly-once INCREMENTAL curation epoch off the lake's own
    watermarks — the loop closed: binlog → lake → incremental curation.

    The curator epoch = conversations newly APPLIED since the curator's
    last run: the update_id is the lake's manifest epoch (a re-run against
    an unchanged lake is a no-op), changed conversations are found by
    comparing the current per-partition watermarks against the manifest
    retained at the curator's previous lake epoch (partitions whose
    watermark didn't move are never read), and already-indexed doc_ids are
    anti-joined away so an UPDATED conversation keeps its first curated
    version (strict FWW — the curated corpus is append-only, versioning is
    the lake's job). The full lake fold (``conversations_as_documents``) is
    still materialized once per epoch as the verify-side corpus — the
    selective stages (shingling, mining, curation) stay O(changed).

    Requires the manifest chain to retain the curator's cursor epoch;
    re-bootstrap a fresh curator if retention pruned it."""
    from ..stages.joins import bucketed_hash_join
    from ..state.lake import Lake
    from .curate_index import IncrementalCurator

    lake = Lake(lake_root)
    m = lake.current_manifest()
    if m is None:
        raise ValueError(f"no committed lake at {lake_root}")
    lake_epoch = int(m["epoch"])
    cur = IncrementalCurator(curator_root, benchmark=benchmark)
    update_id = f"lake-epoch-{lake_epoch}"
    if update_id in cur.meta["applied_ids"]:
        return {"applied": False, "update_id": update_id,
                "lake_epoch": lake_epoch}

    lb = _lake_bytes(lake_root)
    docs = conversations_as_documents(lake_root).map_batches(
        lambda b: b[["doc_id", "text", "conv_id"]], batch_format="pandas"
    ).materialize()

    prev_epochs = [
        int(u.rsplit("-", 1)[1])
        for u in cur.meta["applied_ids"]
        if u.startswith("lake-epoch-")
    ]
    if cur.meta["quality_min"] is None:
        # bootstrap: the whole lake is the curator's first epoch
        out = cur.bootstrap(
            docs.map_batches(lambda b: b[["doc_id", "text"]],
                             batch_format="pandas"),
            update_id, corpus_bytes=lb,
        )
        out["lake_epoch"] = lake_epoch
        return out

    if prev_epochs:
        prev = max(prev_epochs)
        prev_path = os.path.join(lake_root, "manifests", f"epoch-{prev}.json")
        if not os.path.exists(prev_path):
            raise ValueError(
                f"manifest epoch-{prev}.json was pruned by retention — the "
                "watermark cursor is gone; re-bootstrap a fresh curator"
            )
        import json as _json

        with open(prev_path) as f:
            prev_wm = {int(k): int(v)
                       for k, v in _json.load(f).get("watermarks", {}).items()}
    else:
        # curator bootstrapped outside the lake loop: no watermark cursor —
        # treat every partition as changed once; the seen-id anti-join
        # below still keeps already-indexed conversations out
        prev_wm = {}
    wm_now = lake.watermarks()
    changed_pk = sorted(pk for pk, w in wm_now.items()
                        if w > prev_wm.get(pk, -1))
    if changed_pk:
        cids = _changed_conv_ids(lake, changed_pk, prev_wm)
        new_docs = bucketed_hash_join(
            docs, cids, left_on=["conv_id"], right_on=["cid"],
            how="left_semi", input_bytes=lb,
        )
        # strict FWW: a conversation the index has already seen (an UPDATE,
        # not an arrival) never re-enters — its first version is canonical.
        # Crash-retry carve-out: if a prior run died AFTER the index fold
        # committed but BEFORE the curator epoch did, that epoch's docs
        # are in the index but not in the curated set — the seen-set must
        # exclude EVERY such half-applied update's rows (not just the
        # current update_id: if the lake committed further epochs between
        # the crash and the retry, the orphaned fold carries an OLDER
        # lake-epoch id that will never be retried under its own name) or
        # those conversations would be dropped as 'seen' and, under FWW,
        # never re-enter.
        curator_applied = set(cur.meta["applied_ids"])
        half_applied = [u for u in cur.idx.meta["applied_ids"]
                        if u not in curator_applied]
        seen_files = (cur.idx.row_files_excluding(half_applied)
                      if half_applied else cur.idx._row_files())
        if seen_files:
            seen = rd.read_parquet(
                seen_files, columns=["doc_id"]
            ).map_batches(
                lambda b: b.rename(columns={"doc_id": "seen_id"})
                .drop_duplicates(),
                batch_format="pandas",
            )
            new_docs = bucketed_hash_join(
                new_docs, seen, left_on=["doc_id"], right_on=["seen_id"],
                how="left_anti", input_bytes=lb,
            )
        new_docs = new_docs.map_batches(
            lambda b: b[["doc_id", "text"]], batch_format="pandas"
        )
    else:
        new_docs = rd.from_arrow(
            pa.schema([("doc_id", pa.int64()),
                       ("text", pa.string())]).empty_table()
        )
    out = cur.ingest(
        new_docs,
        docs.map_batches(lambda b: b[["doc_id", "text"]],
                         batch_format="pandas"),
        update_id, corpus_bytes=lb,
    )
    out["lake_epoch"] = lake_epoch
    return out
