"""Corpus curation — the composed training-data pipeline.

Chains the individually-oracle-checked operators into the cut an LLM
pre-training corpus actually receives:

1. near-dup DEDUP: keep only each cluster's canonical member
   (connected components over bigram-Jaccard >= 0.5 edges — dedup.py);
2. DECONTAMINATION: drop documents sharing a word 5-gram with the held-out
   benchmark set (dedup.q_contamination_flags);
3. QUALITY CUT: keep documents at or above the exact p75 quality score
   (analytics.q_quality_filter).

`q_curated_corpus` is itself ORACLE-CHECKED: one DuckDB statement composes
the recursive-CTE reachability closure, the 5-gram overlap semi-join, and
the window-function percentile threshold — so the whole chain, not just
its pieces, is pinned bit-for-bit. `curate_corpus` is the user-facing
sink: it writes the curated documents plus their packed training-sequence
assignment (pack.pack_documents) and returns per-stage counts.

Shape at scale: each stage is a bucketed semi/anti join against a flag
set that is small relative to the corpus (losers ~ dup rate, contaminated
~ overlap rate, below-quality ~ 75%); the joins materialize between
all-to-alls per the engine's chaining rule.
"""

from __future__ import annotations

import json
import os

import pandas as pd

import ray.data as rd

from ..stages.joins import bucketed_hash_join


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def q_curated_corpus(sf_dir: str):
    """(doc_id) of every document surviving dedup + decontamination + the
    p75 quality cut."""
    from .analytics import _read, q_quality_filter
    from .dedup import _cluster_labels, q_contamination_flags

    nbytes = os.path.getsize(_docs_path(sf_dir))
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    # stage 1 — dedup: drop non-canonical cluster members
    labels = _cluster_labels(sf_dir, 0.5)
    if labels is not None:
        losers = labels.map_batches(
            lambda b: pd.DataFrame(
                {"loser_id": b.loc[b["node"] != b["label"], "node"].astype("int64")}
            ),
            batch_format="pandas",
        )
        docs = bucketed_hash_join(
            docs, losers, left_on=["doc_id"], right_on=["loser_id"],
            how="left_anti", input_bytes=nbytes,
        ).materialize()

    # stage 2 — decontamination: drop benchmark-overlapping docs
    contam = q_contamination_flags(sf_dir).map_batches(
        lambda b: b.select(["doc_id"]).rename_columns(["bad_id"]),
        batch_format="pyarrow",
    )
    docs = bucketed_hash_join(
        docs, contam, left_on=["doc_id"], right_on=["bad_id"],
        how="left_anti", input_bytes=nbytes,
    ).materialize()

    # stage 3 — quality cut: keep the top quartile (threshold over the FULL
    # corpus, same convention as the standalone quality_filter oracle)
    keep = q_quality_filter(sf_dir).map_batches(
        lambda b: b.select(["doc_id"]).rename_columns(["keep_id"]),
        batch_format="pyarrow",
    )
    return bucketed_hash_join(
        docs, keep, left_on=["doc_id"], right_on=["keep_id"],
        how="left_semi", input_bytes=nbytes,
    )


def curate_corpus(sf_dir: str, out_dir: str, budget: int = 256) -> dict:
    """Run the curation chain and WRITE the results: ``curated.parquet``
    (the surviving documents) and ``packs.parquet`` (their training-
    sequence assignment at ``budget`` tokens). Returns per-stage counts."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .pack import pack_documents

    os.makedirs(out_dir, exist_ok=True)
    nbytes = os.path.getsize(_docs_path(sf_dir))
    n_total = pq.read_metadata(_docs_path(sf_dir)).num_rows

    kept_ids = q_curated_corpus(sf_dir).materialize()
    n_kept = kept_ids.count()

    blocks = min(64, max(2, nbytes >> 20))
    full = rd.read_parquet(
        _docs_path(sf_dir),
        columns=["doc_id", "text", "lang", "source", "n_chars"],
        override_num_blocks=blocks,
    )
    kept = kept_ids.map_batches(
        lambda b: b.rename_columns(["keep_id"]), batch_format="pyarrow"
    )
    curated = bucketed_hash_join(
        full, kept, left_on=["doc_id"], right_on=["keep_id"],
        how="left_semi", input_bytes=nbytes,
    ).materialize()
    curated.write_parquet(os.path.join(out_dir, "curated.parquet"))

    def count_tokens(batch):
        words = pc.split_pattern(batch["text"], " ")
        return batch.select(["doc_id"]).append_column(
            "n_tokens", pc.cast(pc.list_value_length(words), "int64")
        )

    packed = pack_documents(
        curated.map_batches(count_tokens, batch_format="pyarrow"),
        budget=budget,
        input_bytes=nbytes,
    ).materialize()
    packed.write_parquet(os.path.join(out_dir, "packs.parquet"))
    n_packs = packed.map_batches(
        lambda b: pd.DataFrame({"p": b["pack_id"].unique()}),
        batch_format="pandas",
    ).to_pandas()["p"].nunique()

    summary = {
        "input_docs": int(n_total),
        "curated_docs": int(n_kept),
        "dropped": int(n_total - n_kept),
        "packs": int(n_packs),
        "budget": budget,
        "out": out_dir,
    }
    with open(os.path.join(out_dir, "curation_summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


# the composed-chain oracle: recursive CC closure + 5-gram contamination +
# window-function percentile cut in ONE statement (pieces reused verbatim
# from the standalone operators' oracles)
def _oracle() -> str:
    from .dedup import _BENCHMARK_MAX_DOC_ID, _CC_EDGE_CTES

    return f"""
        WITH RECURSIVE {_CC_EDGE_CTES},
        g5 AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(range(1, len(w) - 3),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               || ' ' || w[i+3] || ' ' || w[i+4])) AS gram
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        ), contam AS (
            SELECT DISTINCT g5.doc_id
            FROM g5 JOIN (
                SELECT DISTINCT gram FROM g5
                WHERE doc_id < {_BENCHMARK_MAX_DOC_ID}
            ) b USING (gram)
            WHERE g5.doc_id >= {_BENCHMARK_MAX_DOC_ID}
        ), q AS (
            SELECT doc_id,
                   round(0.3 * (CASE
                       WHEN n_chars < 50 THEN n_chars / 50.0 * 50.0
                       WHEN n_chars <= 500 THEN 50.0 + (n_chars - 50.0) / 450.0 * 50.0
                       ELSE 100.0 - least(50.0, (n_chars - 500.0) / 100.0)
                   END), 2) AS quality_score
            FROM documents
        ), r AS (
            SELECT quality_score,
                   row_number() OVER (ORDER BY quality_score) AS rn,
                   count(*) OVER () AS n
            FROM q
        )
        SELECT cc.doc_id FROM cc
        JOIN q USING (doc_id)
        WHERE cc.doc_id = cc.cluster_id
          AND cc.doc_id NOT IN (SELECT doc_id FROM contam)
          AND q.quality_score >= (
              SELECT quality_score FROM r
              WHERE rn - 1 = least(CAST(floor(n * 0.75) AS BIGINT), n - 1)
          )
    """


QUERIES = {"curated_corpus": q_curated_corpus}
ORACLE = {"curated_corpus": _oracle()}
