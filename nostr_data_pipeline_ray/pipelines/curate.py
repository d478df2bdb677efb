"""Corpus curation — the composed training-data pipeline.

Chains the individually-oracle-checked operators into the cut an LLM
pre-training corpus actually receives:

1. near-dup DEDUP: keep only each cluster's canonical member
   (connected components over bigram-Jaccard >= 0.5 edges — dedup.py);
2. DECONTAMINATION: drop the held-out benchmark documents themselves AND
   every document sharing a word 5-gram with them (a training corpus must
   contain neither the benchmark nor its paraphrases —
   dedup.q_contamination_flags);
3. QUALITY CUT: keep documents at or above the exact p75 quality score
   (analytics.q_quality_filter).

`q_curated_corpus` is itself ORACLE-CHECKED: one DuckDB statement composes
the recursive-CTE reachability closure, the 5-gram overlap semi-join, and
the window-function percentile threshold — assembled from the SAME SQL
constants the standalone operators' oracles use (`dedup._CC_EDGE_CTES`,
`dedup._GRAM5_CTES`, `analytics.QUALITY_SQL_CTES`), so the whole chain,
not just its pieces, is pinned bit-for-bit and cannot silently diverge
from them. `curate_corpus` is the user-facing sink: it writes the curated
documents plus their packed training-sequence assignment
(pack.pack_documents) and returns per-stage survivor counts.

Shape at scale: each stage is a bucketed semi/anti join against a flag
set that is small relative to the corpus (losers ~ dup rate, contaminated
~ overlap rate, below-quality ~ 75%); the joins materialize between
all-to-alls per the engine's chaining rule.
"""

from __future__ import annotations

import json
import os

import ray.data as rd

from ..stages.joins import bucketed_hash_join
from ..stages.shuffle import table_bytes, table_rows


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def q_curated_corpus(sf_dir: str, counts: dict | None = None):
    """(doc_id) of every document surviving dedup + decontamination + the
    p75 quality cut. Pass ``counts`` (a dict) to receive per-stage survivor
    counts — each stage is materialized anyway, so counting is free."""
    import pyarrow.compute as pc

    from .analytics import _read, q_quality_filter
    from .dedup import (
        _BENCHMARK_MAX_DOC_ID,
        _cluster_labels,
        loser_ids,
        q_contamination_flags,
    )

    nbytes = table_bytes(_docs_path(sf_dir))
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    # stage 1 — dedup: drop non-canonical cluster members
    labels = _cluster_labels(sf_dir, 0.5)
    if labels is not None:
        docs = bucketed_hash_join(
            docs, loser_ids(labels), left_on=["doc_id"], right_on=["loser_id"],
            how="left_anti", input_bytes=nbytes,
        ).materialize()
    if counts is not None:
        counts["after_dedup"] = docs.count()

    # stage 2 — decontamination: the held-out set itself never enters the
    # training corpus, and neither does anything 5-gram-overlapping it
    docs = docs.map_batches(
        lambda b: b.filter(pc.greater_equal(b["doc_id"], _BENCHMARK_MAX_DOC_ID)),
        batch_format="pyarrow",
    )
    contam = q_contamination_flags(sf_dir).map_batches(
        lambda b: b.select(["doc_id"]).rename_columns(["bad_id"]),
        batch_format="pyarrow",
    )
    docs = bucketed_hash_join(
        docs, contam, left_on=["doc_id"], right_on=["bad_id"],
        how="left_anti", input_bytes=nbytes,
    ).materialize()
    if counts is not None:
        counts["after_decontam"] = docs.count()

    # stage 3 — quality cut: keep the top quartile (threshold over the FULL
    # corpus, same convention as the standalone quality_filter oracle)
    keep = q_quality_filter(sf_dir).map_batches(
        lambda b: b.select(["doc_id"]).rename_columns(["keep_id"]),
        batch_format="pyarrow",
    )
    out = bucketed_hash_join(
        docs, keep, left_on=["doc_id"], right_on=["keep_id"],
        how="left_semi", input_bytes=nbytes,
    )
    if counts is not None:
        out = out.materialize()
        counts["after_quality"] = out.count()
    return out


# stage-4 knob for the extended chain: documents whose duplicate-word
# fraction exceeds this are degenerate/boilerplate (Gopher-style
# repetition removal) and leave the corpus
REPETITION_MAX_DUP = 0.65


def q_curated_corpus_plus(sf_dir: str, counts: dict | None = None):
    """The round-4 extended chain: everything ``q_curated_corpus`` keeps,
    MINUS documents failing the repetition cut (dup_word_frac >
    REPETITION_MAX_DUP) — dedup ∩ decontaminated ∩ top-quartile quality ∩
    non-repetitive. One more bucketed anti join against a corpus-small
    flag set; the oracle composes the repetition CTE into the same single
    statement, so the four-stage composition is pinned end to end."""
    import pyarrow.compute as pc

    from .textops import q_doc_repetition

    nbytes = table_bytes(_docs_path(sf_dir))
    base = q_curated_corpus(sf_dir, counts=counts)

    def select_bad(b):
        mask = pc.greater(b["dup_word_frac"], REPETITION_MAX_DUP)
        return b.filter(mask).select(["doc_id"]).rename_columns(["rep_id"])

    rep_bad = q_doc_repetition(sf_dir).map_batches(
        select_bad, batch_format="pyarrow"
    )

    out = bucketed_hash_join(
        base, rep_bad, left_on=["doc_id"], right_on=["rep_id"],
        how="left_anti", input_bytes=nbytes,
    )
    if counts is not None:
        out = out.materialize()
        counts["after_repetition"] = out.count()
    return out


def q_curated_corpus_trimmed(sf_dir: str, counts: dict | None = None):
    """Stage 5 on top of the extended chain: ExactSubstr span removal
    WITHIN the curated survivors — near-dup docs are already gone (stage
    1), so what remains to cut is residual copied word-5-gram spans
    between otherwise-distinct survivors (quoted passages, boilerplate
    runs). Returns (doc_id, n_words, n_removed, text_clean) for every
    surviving document; the oracle composes the trim CTEs after the
    four-stage chain's own CTEs in ONE statement, so all five stages are
    pinned end to end."""
    from .textops import dup_span_trim_ds

    nbytes = table_bytes(_docs_path(sf_dir))
    surv = q_curated_corpus_plus(sf_dir, counts=counts).map_batches(
        lambda b: b.rename_columns(["surv_id"]), batch_format="pyarrow"
    )
    docs = bucketed_hash_join(
        _read_docs_text(sf_dir), surv, left_on=["doc_id"], right_on=["surv_id"],
        how="left_semi", input_bytes=nbytes,
    ).materialize()  # consumed twice by the trim (grams + texts)
    out = dup_span_trim_ds(docs, docs, input_bytes=nbytes)
    if counts is not None:
        out = out.materialize()
        counts["trimmed_docs"] = out.count()
    return out


def _read_docs_text(sf_dir: str):
    from .analytics import _read

    return _read(sf_dir, "documents", columns=["doc_id", "text"])


def curate_corpus(
    sf_dir: str, out_dir: str, budget: int = 256, jsonl: bool = False,
    plus: bool = False, trim: bool = False,
) -> dict:
    """Run the curation chain and WRITE the results: ``curated.parquet``
    (the surviving documents) and ``packs.parquet`` (their training-
    sequence assignment at ``budget`` tokens). ``jsonl=True`` additionally
    writes ``curated.jsonl/`` (partitioned newline-delimited JSON — the
    wire format most training jobs ingest). ``trim=True`` runs the
    five-stage chain (implies the plus chain) and ships SPAN-TRIMMED text:
    curated.parquet's ``text`` is the ExactSubstr-cleaned text and
    ``n_chars`` is recomputed from it, so the packer budgets real tokens.
    Returns per-stage survivor counts plus pack stats."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.shuffle import bucketed_sum_count
    from .pack import pack_documents

    os.makedirs(out_dir, exist_ok=True)
    nbytes = table_bytes(_docs_path(sf_dir))
    n_total = table_rows(_docs_path(sf_dir))

    stage_counts: dict = {}
    trimmed = None
    if trim:
        trimmed = q_curated_corpus_trimmed(sf_dir, counts=stage_counts).materialize()
        kept_ids = trimmed.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"
        ).materialize()
    else:
        chain = q_curated_corpus_plus if plus else q_curated_corpus
        kept_ids = chain(sf_dir, counts=stage_counts).materialize()
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
    if trim:
        # swap in the span-trimmed text (same doc set) and recompute n_chars
        clean = trimmed.map_batches(
            lambda b: pa.table(
                {"trim_id": b["doc_id"], "text_clean": b["text_clean"]}
            ),
            batch_format="pyarrow",
        )
        def swap_text(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "text": b["text_clean"],
                    "lang": b["lang"],
                    "source": b["source"],
                    "n_chars": pc.cast(
                        pc.utf8_length(b["text_clean"]), pa.int64()
                    ),
                }
            )
        curated = bucketed_hash_join(
            curated.map_batches(
                lambda b: b.drop_columns(["text"]), batch_format="pyarrow"
            ),
            clean, left_on=["doc_id"], right_on=["trim_id"],
            how="inner", input_bytes=nbytes,
        ).map_batches(swap_text, batch_format="pyarrow").materialize()
    curated.write_parquet(os.path.join(out_dir, "curated.parquet"))
    if jsonl:
        curated.write_json(os.path.join(out_dir, "curated.jsonl"))

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
    # distributed distinct count — pack ids are O(total_tokens/budget),
    # never collected on the driver
    n_packs = bucketed_sum_count(
        packed, ["pack_id"], sums={}, count_as="c", input_bytes=nbytes
    ).count()

    summary = {
        "input_docs": int(n_total),
        **{k: int(v) for k, v in stage_counts.items()},
        "curated_docs": int(n_kept),
        "dropped": int(n_total - n_kept),
        "packs": int(n_packs),
        "budget": budget,
        "out": out_dir,
    }
    if trim:
        summary["words_trimmed"] = int(trimmed.sum("n_removed") or 0)
    with open(os.path.join(out_dir, "curation_summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


# the composed-chain oracle, assembled from the standalone operators' own
# SQL constants: recursive CC closure + 5-gram contamination + percentile
# cut in ONE statement
def _oracle() -> str:
    from .analytics import QUALITY_SQL_CTES, QUALITY_SQL_THRESHOLD
    from .dedup import _BENCHMARK_MAX_DOC_ID, _CC_EDGE_CTES, _GRAM5_CTES

    return f"""
        WITH RECURSIVE {_CC_EDGE_CTES}, {_GRAM5_CTES}, {QUALITY_SQL_CTES}
        SELECT cc.doc_id FROM cc
        JOIN q USING (doc_id)
        WHERE cc.doc_id = cc.cluster_id
          AND cc.doc_id >= {_BENCHMARK_MAX_DOC_ID}
          AND cc.doc_id NOT IN (
              SELECT DISTINCT g5.doc_id FROM g5 JOIN b5 USING (gram)
              WHERE g5.doc_id >= {_BENCHMARK_MAX_DOC_ID}
          )
          AND q.quality_score >= {QUALITY_SQL_THRESHOLD}
    """


def _oracle_plus() -> str:
    """The four-stage composition in ONE statement: the base chain's own
    CTE constants plus the repetition CTE from textops (same SQL the
    standalone doc_repetition oracle runs)."""
    from .analytics import QUALITY_SQL_CTES, QUALITY_SQL_THRESHOLD
    from .dedup import _BENCHMARK_MAX_DOC_ID, _CC_EDGE_CTES, _GRAM5_CTES
    from .textops import _REPETITION_SQL

    return f"""
        WITH RECURSIVE {_CC_EDGE_CTES}, {_GRAM5_CTES}, {QUALITY_SQL_CTES},
        rep AS ({_REPETITION_SQL})
        SELECT cc.doc_id FROM cc
        JOIN q USING (doc_id)
        WHERE cc.doc_id = cc.cluster_id
          AND cc.doc_id >= {_BENCHMARK_MAX_DOC_ID}
          AND cc.doc_id NOT IN (
              SELECT DISTINCT g5.doc_id FROM g5 JOIN b5 USING (gram)
              WHERE g5.doc_id >= {_BENCHMARK_MAX_DOC_ID}
          )
          AND q.quality_score >= {QUALITY_SQL_THRESHOLD}
          AND cc.doc_id NOT IN (
              SELECT doc_id FROM rep WHERE dup_word_frac > {REPETITION_MAX_DUP}
          )
    """


def _oracle_trimmed() -> str:
    """All five stages in ONE statement: the extended chain's CTEs, a
    ``surv`` CTE holding its survivors, the survivor texts, then the trim
    CTE chain (textops._trim_ctes) over that relation."""
    from .analytics import QUALITY_SQL_CTES, QUALITY_SQL_THRESHOLD
    from .dedup import _BENCHMARK_MAX_DOC_ID, _CC_EDGE_CTES, _GRAM5_CTES
    from .textops import _REPETITION_SQL, _TRIM_SELECT, _trim_ctes

    return f"""
        WITH RECURSIVE {_CC_EDGE_CTES}, {_GRAM5_CTES}, {QUALITY_SQL_CTES},
        rep AS ({_REPETITION_SQL}),
        surv AS (
            SELECT cc.doc_id FROM cc
            JOIN q USING (doc_id)
            WHERE cc.doc_id = cc.cluster_id
              AND cc.doc_id >= {_BENCHMARK_MAX_DOC_ID}
              AND cc.doc_id NOT IN (
                  SELECT DISTINCT g5.doc_id FROM g5 JOIN b5 USING (gram)
                  WHERE g5.doc_id >= {_BENCHMARK_MAX_DOC_ID}
              )
              AND q.quality_score >= {QUALITY_SQL_THRESHOLD}
              AND cc.doc_id NOT IN (
                  SELECT doc_id FROM rep
                  WHERE dup_word_frac > {REPETITION_MAX_DUP}
              )
        ),
        sdocs AS (
            SELECT d.doc_id, d.text FROM documents d JOIN surv USING (doc_id)
        ),
        {_trim_ctes('sdocs')}
        {_TRIM_SELECT}
    """


QUERIES = {
    "curated_corpus": q_curated_corpus,
    "curated_corpus_plus": q_curated_corpus_plus,
    "curated_corpus_trimmed": q_curated_corpus_trimmed,
}
ORACLE = {
    "curated_corpus": _oracle(),
    "curated_corpus_plus": _oracle_plus(),
    "curated_corpus_trimmed": _oracle_trimmed(),
}
