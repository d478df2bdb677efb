"""End-to-end walkthrough (analog of reference examples/analytics_example.py):

  1. synthesize a deterministic changelog (binlog/WAL of change events),
  2. replay it into an exactly-once Parquet lake,
  3. kill-and-resume to show checkpointing,
  4. run a few analytics pipelines over the lake and the testdata tables,
  5. merge-on-read delta policy: micro-epoch appends, point lookup,
     compaction, resumable export.

Run:  python examples/end_to_end.py
"""

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    apply_epoch,
    final_table,
    lake_lineage,
    list_segments,
    read_final,
)
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog

BASE = "/tmp/ndp_example"
shutil.rmtree(BASE, ignore_errors=True)

# 1. a small changelog: 50k change events over 1.5k conversations, with a
#    schema-evolution tail segment adding tool_meta
spec = ChangelogSpec(n_events=50_000, n_convs=1_500, n_segments=10, seed=3, evolve=True)
binlog = generate_changelog(f"{BASE}/synth", spec)
print("binlog:", binlog)

# 2. replay the first half, pretending the process dies afterwards
cfg = EngineConfig(num_partitions=16, epoch_segments=5)
lake = f"{BASE}/lake"
apply_epoch(Lake(lake), list_segments(binlog)[:5], cfg)
print("after partial run:", json.dumps(Lake(lake).current_manifest()["stats"]))

# 3. resume: committed segments are skipped via the manifest
out = apply_changelog(lake, binlog, cfg)
print("resume applied:", out["segments_applied"], "segments,",
      out["rows_applied"], "rows")

final = read_final(lake, sort=True)
print("final lake:", final.count(), "rows; schema:", final.schema().names)
print("lineage sample:", lake_lineage(lake).slice(0, 3).to_pylist())

# 3b. time travel + change data feed: read the snapshot AS OF epoch 0
#     (resolved through that epoch's retained manifest), then the exact
#     row-level changes epoch 1 applied — the manifest diff prunes
#     untouched partitions before any file is read.
from nostr_data_pipeline_ray.pipelines.cdc import lake_changes

asof0 = read_final(lake, as_of=0)
changes = lake_changes(lake, from_epoch=0).to_pandas()
print("as-of epoch 0:", asof0.count(), "rows; changes since:",
      (changes["change_type"] == "upsert").sum(), "upserts,",
      (changes["change_type"] == "delete").sum(), "deletes")

# 4. analytics over the shared testdata tables
import nostr_data_pipeline_ray.pipelines.analytics as an

top = an.q_top_users_by_value("/root/testdata/sf0.001").to_pandas()
print("\ntop users by value:\n", top.head(5).to_string())
sessions = an.q_user_sessions("/root/testdata/sf0.001").to_pandas()
print("\nsessions found:", len(sessions))

# 5. merge-on-read: a second stream lands as per-epoch DELTA parts (no base
#    rewrites), a point lookup merges them on the fly, compact() folds them
#    back, and the snapshot exports resumably
from nostr_data_pipeline_ray.pipelines.cdc import (
    compact,
    export_snapshot,
    read_conversation,
)

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

spec2 = ChangelogSpec(n_events=8_000, n_convs=1_500, n_segments=4, seed=4)
binlog2 = generate_changelog(f"{BASE}/synth2", spec2)
# continue the SAME stream: fresh segment names, LSNs above the watermark
stream2 = f"{BASE}/stream2"
os.makedirs(stream2, exist_ok=True)
for i, seg in enumerate(list_segments(binlog2)):
    t = pq.read_table(seg)
    t = t.set_column(t.column_names.index("lsn"), "lsn", pc.add(t["lsn"], 100_000))
    pq.write_table(t, f"{stream2}/seg-{i + 100:05d}.parquet")
delta_cfg = EngineConfig(num_partitions=16, epoch_segments=1, merge_policy="delta")
out = apply_changelog(lake, stream2, delta_cfg)
m = Lake(lake).current_manifest()
print("\ndelta epochs applied:", len(out["epochs"]),
      "| pending delta parts:", sum(len(v) for v in m["deltas"].values()))
conv = read_conversation(lake, "conv-7")
print("point lookup conv-7:", conv.num_rows, "turns (merged base+deltas)")
print("compact:", compact(lake))
print("export:", export_snapshot(lake, f"{BASE}/export"))

# 6. incremental materialized view: per-conversation turn counts maintained
#    from changed partitions only (O(changed), not O(lake)); a second
#    refresh with nothing new is a metadata no-op
from nostr_data_pipeline_ray.pipelines.ivm import (
    read_turn_counts,
    refresh_turn_counts,
)

view = f"{BASE}/view"
print("\nview refresh:", refresh_turn_counts(view, lake))
print("view no-op:  ", refresh_turn_counts(view, lake))
print("view rows:   ", read_turn_counts(view).count())

# 7. audit the lake before handing it to consumers: shallow metadata tier
#    + deep parallel per-part scan (sort order, pkey routing, watermarks,
#    sidecar false negatives) — the DB health-check analog
from nostr_data_pipeline_ray.state.fsck import check_lake

audit = check_lake(lake, deep=True)
print("\nfsck:", "ok" if audit["ok"] else audit["errors"],
      "| parts scanned:", audit["info"]["parts_deep_checked"],
      "| orphans:", audit["info"]["orphans"])

# 8. the dashboard: one self-contained HTML file (inline SVG, no deps)
import __ray_entry__ as entrymod

from nostr_data_pipeline_ray.report import render_html

html_doc = render_html("/root/testdata/sf0.001", entrymod.queries())
with open(f"{BASE}/report.html", "w") as f:
    f.write(html_doc)
print("dashboard:   ", f"{BASE}/report.html", f"({len(html_doc)} bytes)")

# 9. training-data curation over the documents table: near-dup clusters ->
#    canonical survivors -> drop benchmark-contaminated docs -> p75 quality
#    cut -> pack into fixed-token-budget training sequences. The same chain
#    is oracle-checked end-to-end as the `curated_corpus` query.
from nostr_data_pipeline_ray.pipelines.curate import curate_corpus

print("\ncurate:", curate_corpus("/root/testdata/sf0.001", f"{BASE}/curated"))

# 10. incremental near-dup maintenance: index today's corpus once, then
#     each ingest epoch mines pairs ONLY for its new docs (never old x old)
import pandas as pd
import ray.data as rd

from nostr_data_pipeline_ray.pipelines.dedup_index import MinHashIndex

docs = rd.read_parquet(
    "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
)
idx = MinHashIndex(f"{BASE}/neardup_index")
idx.bootstrap(
    docs.map_batches(lambda b: b[b["doc_id"] < 40], batch_format="pandas"),
    update_id="epoch-0",
)
pairs = idx.update(
    docs.map_batches(lambda b: b[b["doc_id"] >= 40], batch_format="pandas"),
    docs,
    update_id="epoch-1",
)
n_pairs = len(pairs) if isinstance(pairs, pd.DataFrame) else pairs.count()
print("incremental near-dup pairs (new epoch only):", n_pairs,
      "| index:", idx.stats()["n_docs"], "docs")

# 11. curate straight FROM THE LAKE: fold each conversation into one
#     document (turns in order, `role: text` lines) and run the SAME
#     curation chain over the export — binlog -> lake -> curated training
#     corpus with no intermediate fixtures. The sub-cutoff rows of the
#     documents fixture stand in as the held-out benchmark set.
from nostr_data_pipeline_ray.pipelines.lake_docs import curate_from_lake

print("\ncurate --from-lake:",
      curate_from_lake(lake, f"{BASE}/curated_lake",
                       benchmark="/root/testdata/sf0.001/documents.parquet"))

# 12. persisted IVF ANN index: build once, add epochs incrementally, then
#     answer queries by reading ONLY the probed lists' files
from nostr_data_pipeline_ray.pipelines.ann_index import IvfIndex
from nostr_data_pipeline_ray.pipelines.dedup import _point_read_vec

emb = "/root/testdata/sf0.001/embeddings.parquet"
vecs = rd.read_parquet(emb, columns=["vec_id", "embedding"])
aidx = IvfIndex(f"{BASE}/ivf_index", n_lists=8)
aidx.bootstrap(
    vecs.map_batches(lambda b: b[b["vec_id"] < 400], batch_format="pandas"),
    update_id="day-0",
)
aidx.add(
    vecs.map_batches(lambda b: b[b["vec_id"] >= 400], batch_format="pandas"),
    update_id="day-1",
)
nn = aidx.query(_point_read_vec(emb, vec_id=0), k=5, nprobe=3, exclude=0)
print("ivf index:", aidx.stats()["n_vecs"], "vectors |",
      "fsck ok:", aidx.fsck()["ok"], "| top-5 for vec 0:",
      nn["vec_id"].tolist())
# lifecycle: tombstone-delete the nearest neighbour, compact purges it
aidx.delete(nn["vec_id"].tolist()[:1], update_id="gdpr-1")
print("after delete:", aidx.query(_point_read_vec(emb, vec_id=0),
                                  k=5, nprobe=3, exclude=0)["vec_id"].tolist(),
      "| compact:", aidx.compact())

# 13. INCREMENTAL curation — the nightly pipeline: bootstrap once (freezes
#     the quality threshold, seeds the near-dup memory), then each epoch
#     pays O(new): FWW dedup vs everything already seen + decontam +
#     the frozen quality cut. Per-stage drop counts come back per epoch.
from nostr_data_pipeline_ray.pipelines.curate_index import IncrementalCurator

docs_path = "/root/testdata/sf0.001/documents.parquet"
all_docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
day0 = all_docs.map_batches(lambda b: b[b["doc_id"] < 400], batch_format="pandas")
day1 = all_docs.map_batches(lambda b: b[b["doc_id"] >= 400], batch_format="pandas")
cur = IncrementalCurator(f"{BASE}/curator", benchmark=docs_path)
print("\ncurator day 0:", cur.bootstrap(day0, update_id="day-0"))
print("curator day 1:", cur.ingest(day1, all_docs, update_id="day-1"))
print("curated total:", cur.curated().count(), "| fsck ok:", cur.fsck()["ok"])

# 14. ExactSubstr dedup — substring-level: which documents share word-
#     5-gram spans with another document, and the corpus with those spans
#     CUT from every non-canonical holder (lowest doc_id keeps its copy).
from nostr_data_pipeline_ray.pipelines.textops import (
    q_doc_dup_spans,
    q_dup_span_trim,
)

sf = "/root/testdata/sf0.001"
spans = q_doc_dup_spans(sf).to_pandas()
trimmed = q_dup_span_trim(sf).to_pandas()
print("\ndup spans: docs with cross-doc 5-gram overlap:",
      int((spans["n_dup_grams"] > 0).sum()), "of", len(spans),
      "| words cut by trim:", int(trimmed["n_removed"].sum()),
      "| docs emptied:",
      int(((trimmed["n_removed"] > 0)
           & (trimmed["text_clean"] == "")).sum()))

# 15. the loop CLOSED — binlog → lake → incremental curation, keyed on the
#     lake's own watermarks: each applied lake epoch drives exactly one
#     curator epoch (update_id = manifest epoch), only partitions whose
#     watermark moved are read, and an updated conversation keeps its first
#     curated version (strict FWW). Re-running against an unchanged lake is
#     a no-op.
from nostr_data_pipeline_ray.pipelines.lake_docs import curate_epoch_from_lake

loop_cur = f"{BASE}/lake_curator"
print("\nlake-loop epoch 1:", curate_epoch_from_lake(lake, loop_cur))
print("lake-loop rerun:  ", curate_epoch_from_lake(lake, loop_cur))

# 16. publish-back (S6): forward the applied changelog to downstream sink
#     dirs — each sink is itself a valid binlog, so a replica replaying it
#     reaches the publisher's exact final state (deletes included).
#     Exactly-once per sink via _published.json; re-publishing is a no-op.
from nostr_data_pipeline_ray.pipelines.publish import publish_changelog

pub = publish_changelog(lake, [binlog, stream2],
                        [f"{BASE}/sink-a", f"{BASE}/sink-b"])
print("\npublish-back:", {s: r["published"] for s, r in pub["sinks"].items()})
replica = f"{BASE}/replica"
apply_changelog(replica, f"{BASE}/sink-a", cfg)
print("replica rows:", final_table(replica).num_rows,
      "== lake rows:", final_table(lake).num_rows)
print("re-publish is a no-op:",
      publish_changelog(lake, [binlog, stream2], [f"{BASE}/sink-a"])
      ["sinks"][f"{BASE}/sink-a"]["published"] == 0)

# 17. dead-letter quarantine: a dirty JSONL feed (truncated JSON, a string
#     turn_idx) fails the apply loudly by default; under
#     on_malformed="quarantine" the bad lines land in <lake>/_quarantine/
#     with provenance and every valid row still applies.
from nostr_data_pipeline_ray.pipelines.cdc import read_quarantine

dirty = f"{BASE}/dirty_feed"
os.makedirs(dirty, exist_ok=True)
with open(f"{dirty}/seg-00000.jsonl", "w") as f:
    f.write('{"conv_id": "q-1", "turn_idx": 0, "role": "user", '
            '"text": "hello", "tool": "", "ts": "2024-01-01T00:00:00", '
            '"op": "insert", "lsn": 1}\n')
    f.write('{"conv_id": "q-1", "turn_idx": 1, "lsn":\n')        # truncated
    f.write('{"conv_id": "q-2", "turn_idx": "one", "lsn": 3}\n')  # bad type
qlake = f"{BASE}/qlake"
try:
    apply_changelog(qlake, dirty, EngineConfig(num_partitions=4))
except ValueError as ex:
    print("\nloud default:", str(ex)[:88], "...")
shutil.rmtree(qlake, ignore_errors=True)
out = apply_changelog(
    qlake, dirty, EngineConfig(num_partitions=4, on_malformed="quarantine")
)
q = read_quarantine(qlake)
print("quarantined:", q.num_rows, "lines |", "applied:", out["rows_applied"],
      "rows | errors:", [e[:40] for e in q["error"].to_pylist()])

# 18. the window-function + statistical-aggregate families: each is one
#     bucketed exchange with the kernel vectorized inside the bucket, and
#     every float is derived from exact integers (microseconds / cents /
#     ranks) so distributed execution cannot drift at a rounding boundary.
sf = "/root/testdata/sf0.001"
gaps = an.q_event_gaps(sf).to_pandas()
print("\ninter-event gaps (LAG):", len(gaps), "users | max gap",
      gaps["max_gap_sec"].max(), "s")
mom = an.q_quantity_moments(sf).to_pandas()
print("quantity moments:\n", mom.head(4).to_string())
hh = an.q_top_words_sketch(sf, k=4096, topn=5).to_pandas()
print("Misra-Gries top words:", list(zip(hh["word"], hh["est_count"])))

# 19. the last mile: context-window chunking (overlapping model-sized
#     windows; a pure map), then seeded deterministic shuffle of the corpus
#     into fixed training shards — one parquet per shard, exactly-once
#     (tmp+rename), resumable (existing shards skipped). A data loader
#     streams these.
from nostr_data_pipeline_ray.pipelines.shards import write_shards
from nostr_data_pipeline_ray.pipelines.textops import doc_chunks

ch = doc_chunks(sf).to_pandas()
print("\ncontext windows:", len(ch), "chunks from",
      ch["doc_id"].nunique(), "docs (W=16, stride=12)")

manifest = write_shards(sf, f"{BASE}/shards", n_shards=8)
print("\ntraining shards:", len(manifest), "files,",
      int(manifest["n_docs"].sum()), "docs; resume skips:",
      int(write_shards(sf, f"{BASE}/shards", n_shards=8)["skipped"].sum()))

# 20. retrieval + relevance over the same corpus: BM25 top-k and each
#     source's characteristic vocabulary (grouped TF-IDF).
from nostr_data_pipeline_ray.pipelines import relevance as rv

top = rv.bm25_search(sf).to_pandas()
print("bm25 top-3 for", rv.BM25_TERMS, ":", top["doc_id"].head(3).tolist())
fp = rv.source_tfidf_top_terms(sf).to_pandas()
print("source fingerprint (first source):",
      fp[fp["source"] == fp["source"].iloc[0]]["word"].tolist())

# 21. iterative graph ranking: integer fixed-point PageRank over the
#     bipartite customer↔supplier order graph (K=5 damped iterations,
#     rank mass as exact int64 micro-units so the distributed sums match
#     the SQL oracle bit-for-bit).
from nostr_data_pipeline_ray.pipelines.graphrank import supplier_pagerank

pr = supplier_pagerank(sf).to_pandas()
print("\npagerank top-3:",
      [(r.kind, int(r.entity_id), float(r.rank)) for r in
       pr.head(3).itertuples()])

ray.shutdown()
