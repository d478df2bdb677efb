"""Text-relevance operators: TF-IDF keyword extraction and BM25 ranking.

Two retrieval-grade scoring operators a training-data / search pipeline
runs over a document corpus (the reference's nearest analog is its
substring search, analytics/query.py:326-353 — these are the ranked
generalizations):

- ``doc_tfidf_top_terms`` — the top-K most characteristic terms per
  document by TF-IDF (tf · ln(N/df)): the classic keyword-extraction /
  document-fingerprinting signal. Term frequencies are batch-local (a
  document is one row); document frequencies take ONE bucketed exchange
  (map-side partial counts of per-doc-distinct words). Scoring then
  either runs entirely map-side against a broadcast df table (one
  ``ray.put``, fetched once per worker) or — above the vocabulary gate —
  as a bucketed join by word plus a per-doc top-K bucket pass, the same
  gate-or-join discipline as ``doc_lm_score``. Ranking compares the
  ROUNDED score (then the word), so rank disagreements between engine
  and oracle are exactly as likely as value disagreements — the float
  contract is not amplified by the ranking.

- ``bm25_search`` — Okapi BM25 (k1=1.2, b=0.75, Lucene idf) of a fixed
  query against every document, top-20. The corpus statistics (per-term
  document frequency, total token count, doc count) reduce to O(#terms)
  numbers via per-batch partials summed over O(blocks) driver rows (the
  ``corpus_token_budget`` discipline); scoring is then a pure map with
  zero exchanges and the top-20 is a ``local_topk`` prune. The per-term
  score sum is evaluated in FIXED term order on both sides (engine
  columns, oracle CASE-per-term addition) — a SUM() over an unordered
  tok join would reorder float addition between engines.

At 100 TB: both operators move at most one word-keyed exchange of
pre-combined (word, count) partials; document scoring is embarrassingly
parallel; nothing corpus-sized touches the driver (the df broadcast is
vocabulary-gated, the BM25 stats are O(#query-terms)).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rounding import round6 as _round6
from ..stages.shuffle import bucketed_map_groups, table_bytes, table_rows
from .textops import VOCAB_BROADCAST_MAX
from .textops import _read_docs as _read_docs_cols  # shared block sizing

TOP_TERMS_K = 3

BM25_TERMS = ("merge", "filter", "column")  # fixed query, part of the oracle
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def _t(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read_docs(sf_dir: str):
    return _read_docs_cols(sf_dir, ["doc_id", "text"])


def _doc_word_tf(batch: pa.Table) -> pd.DataFrame:
    """(doc_id, word, tf) for one batch — globally complete per (doc, word)
    because a document is one input row. Vectorized: explode + lexsort
    run-length (pandas groupby on the exploded frame)."""
    # NULL text drops the document — matching the oracle's unnest semantics
    # (string_split(NULL) unnests to zero rows), NOT the ''-coalesce some
    # dirty-corpus signals use; see oracle-parity pitfalls: null semantics
    # are part of the spec
    batch = batch.filter(pc.is_valid(batch["text"]))
    if batch.num_rows == 0:  # dtype-pinned empty frame (Arrow unification)
        return pd.DataFrame(
            {
                "doc_id": pd.array([], dtype="int64"),
                "word": pd.array([], dtype="str"),
                "tf": pd.array([], dtype="int64"),
            }
        )
    words = pc.split_pattern(batch["text"], " ")
    flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    parents = pc.list_parent_indices(flat).to_numpy(zero_copy_only=False)
    toks = pc.list_flatten(flat).to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy()
    df = pd.DataFrame({"doc_id": ids[parents], "word": toks})
    out = df.groupby(["doc_id", "word"], sort=False).size().reset_index(name="tf")
    out["tf"] = out["tf"].astype("int64")
    return out


def _topk_per_doc(g: pd.DataFrame, k: int) -> pd.DataFrame:
    """Top-k terms per doc by (rounded tfidf DESC, word ASC), ranked 1..k —
    exactly the oracle's row_number ordering."""
    g = g.sort_values(
        ["doc_id", "tfidf", "word"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    g["rank"] = (g.groupby("doc_id", sort=False).cumcount() + 1).astype("int64")
    return g[g["rank"] <= k][["doc_id", "word", "tfidf", "rank"]]


def doc_tfidf_top_terms(
    sf_dir: str,
    k: int = TOP_TERMS_K,
    broadcast_max: int = VOCAB_BROADCAST_MAX,
):
    """(doc_id, word, tfidf, rank): each document's top-k terms by
    tf · ln(N/df). One bucketed exchange for df; scoring map-side via a
    broadcast df table below the vocabulary gate, else bucketed join +
    per-doc bucket top-k."""
    import ray

    from ..stages.actors import cached_get
    from ..stages.joins import bucketed_hash_join
    from ..stages.shuffle import bucketed_sum_count

    doc_path = _t(sf_dir, "documents")
    doc_bytes = table_bytes(doc_path)
    n_docs = float(table_rows(doc_path))
    docs = _read_docs(sf_dir)

    def df_partial(batch: pa.Table) -> pd.DataFrame:
        # per-doc-distinct words → per-batch partial document frequencies
        tf = _doc_word_tf(batch)
        out = tf.groupby("word", sort=False).size().reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        return out

    wdf = bucketed_sum_count(
        docs.map_batches(df_partial, batch_format="pyarrow"),
        ["word"],
        sums={"c": "df"},
        input_bytes=doc_bytes,
    ).materialize()
    vocab = wdf.count()

    if vocab <= broadcast_max:
        table = wdf.to_pandas()
        dfmap = pd.Series(
            table["df"].to_numpy(dtype="float64"), index=table["word"]
        )
        ref = ray.put(dfmap)

        def score(batch: pa.Table) -> pd.DataFrame:
            tf = _doc_word_tf(batch)
            dfv = tf["word"].map(cached_get(ref)).to_numpy(dtype="float64")
            tf["tfidf"] = _round6(
                tf["tf"].to_numpy(dtype="float64") * np.log(n_docs / dfv)
            )
            return _topk_per_doc(tf, k)

        return docs.map_batches(score, batch_format="pyarrow")

    # large-vocabulary path: join (doc, word, tf) to (word, df) by word,
    # then co-locate each doc's terms for the top-k — two exchanges
    tf_rows = docs.map_batches(_doc_word_tf, batch_format="pyarrow")
    wdf_r = wdf.map_batches(
        lambda b: b.rename_columns(["w", "df"]), batch_format="pyarrow"
    )
    joined = bucketed_hash_join(
        tf_rows, wdf_r, left_on=["word"], right_on=["w"], how="inner",
        input_bytes=doc_bytes,
    )

    def add_score(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "word": b["word"],
                "tfidf": _round6(
                    b["tf"].to_numpy(dtype="float64")
                    * np.log(n_docs / b["df"].to_numpy(dtype="float64"))
                ),
            }
        )

    return bucketed_map_groups(
        joined.map_batches(add_score, batch_format="pandas"),
        ["doc_id"],
        fn=lambda g: _topk_per_doc(g, k),
        input_bytes=doc_bytes,
    )


def q_doc_tfidf_top_terms(sf_dir: str):
    return doc_tfidf_top_terms(sf_dir)


_TFIDF_SQL = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
        SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, word
    ), df AS (
        SELECT word, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY word
    ), n AS (
        SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.word,
               round(CAST(tf.tf AS DOUBLE) * ln(n.n / df.df), 6) AS tfidf
        FROM tf JOIN df USING (word) CROSS JOIN n
    ), ranked AS (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, word
               ) AS BIGINT) AS rank
        FROM scored
    )
    SELECT doc_id, word, tfidf, rank FROM ranked WHERE rank <= {TOP_TERMS_K}
"""


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _doc_term_stats(batch: pa.Table, terms: tuple[str, ...]) -> pd.DataFrame:
    """Per document: token count + per-query-term frequency (vectorized:
    one exploded comparison per term against the flat token array).
    NULL-text docs are dropped to match the oracle's unnest semantics —
    they contribute to neither the corpus stats (n, avglen, df) nor the
    scored set."""
    batch = batch.filter(pc.is_valid(batch["text"]))
    words = pc.split_pattern(batch["text"], " ")
    flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    parents = pc.list_parent_indices(flat).to_numpy(zero_copy_only=False)
    toks = pc.list_flatten(flat)
    n = batch.num_rows
    out = {
        "doc_id": batch["doc_id"].to_numpy(),
        "len": np.bincount(parents, minlength=n).astype("int64"),
    }
    for i, t in enumerate(terms):
        hit = pc.equal(toks, t).to_numpy(zero_copy_only=False)
        out[f"tf{i}"] = np.bincount(
            parents, weights=hit.astype("float64"), minlength=n
        ).astype("int64")
    return pd.DataFrame(out)


def bm25_search(
    sf_dir: str,
    terms: tuple[str, ...] = BM25_TERMS,
    top: int = BM25_TOP,
):
    """Top-``top`` documents for ``terms`` by Okapi BM25 (k1=1.2, b=0.75,
    Lucene idf ln((N−df+0.5)/(df+0.5)+1)). Corpus stats reduce per batch
    to one O(#terms) row (summed over O(blocks) driver rows); scoring is
    a pure map; the top-k is a per-batch prune + final small sort."""
    from ..stages.shuffle import local_topk

    docs = _read_docs(sf_dir)
    k1, b = BM25_K1, BM25_B

    def stats_partial(batch: pa.Table) -> pd.DataFrame:
        s = _doc_term_stats(batch, terms)
        row = {"n_docs": np.int64(len(s)), "total_len": s["len"].sum()}
        for i in range(len(terms)):
            row[f"df{i}"] = np.int64((s[f"tf{i}"] > 0).sum())
        return pd.DataFrame([row])

    # O(blocks) rows → driver sum: the bounded-collection discipline
    agg = docs.map_batches(stats_partial, batch_format="pyarrow").to_pandas().sum()
    n_d = float(agg["n_docs"])
    avglen = float(agg["total_len"]) / n_d  # one double division, mirrored
    idf = [
        math.log((n_d - float(agg[f"df{i}"]) + 0.5) / (float(agg[f"df{i}"]) + 0.5) + 1.0)
        for i in range(len(terms))
    ]

    def score(batch: pa.Table) -> pd.DataFrame:
        s = _doc_term_stats(batch, terms)
        len_d = s["len"].to_numpy(dtype="float64")
        total = np.zeros(len(s), dtype="float64")
        any_tf = np.zeros(len(s), dtype="int64")
        for i in range(len(terms)):  # FIXED term order — mirrors the oracle
            tf = s[f"tf{i}"].to_numpy(dtype="float64")
            denom = tf + k1 * (1.0 - b + b * (len_d / avglen))
            total = total + np.where(tf > 0.0, idf[i] * (tf * (k1 + 1.0) / denom), 0.0)
            any_tf = any_tf + s[f"tf{i}"].to_numpy()
        keep = any_tf > 0
        return pd.DataFrame(
            {
                "doc_id": s["doc_id"].to_numpy()[keep],
                "score": _round6(total[keep]),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow")
    return local_topk(scored, by=["score", "doc_id"], descending=[True, False], k=top)


def q_bm25_search(sf_dir: str):
    return bm25_search(sf_dir)


def _bm25_term_sql(i: int, term: str) -> str:
    """One term's BM25 contribution — expression order mirrors the engine
    operation-for-operation (idf · (tf·(k1+1) / (tf + k1·(1−b+b·len/avg))))."""
    return f"""CASE WHEN tf{i} > 0 THEN
        ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0)
        * (CAST(tf{i} AS DOUBLE) * (1.2 + 1.0)
           / (CAST(tf{i} AS DOUBLE)
              + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(len AS DOUBLE) / avglen))))
    ELSE 0.0 END"""


def _bm25_sql(terms: tuple[str, ...] = BM25_TERMS, top: int = BM25_TOP) -> str:
    tf_cols = ",\n".join(
        f"CAST(count(*) FILTER (WHERE word = '{t}') AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n".join(
        f"CAST(count(DISTINCT CASE WHEN word = '{t}' THEN doc_id END) AS DOUBLE) AS df{i}"
        for i, t in enumerate(terms)
    )
    score = " + ".join(f"({_bm25_term_sql(i, t)})" for i, t in enumerate(terms))
    any_tf = " + ".join(f"tf{i}" for i in range(len(terms)))
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), perdoc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS len,
               {tf_cols}
        FROM tok GROUP BY doc_id
    ), dfs AS (
        SELECT {df_cols} FROM tok
    ), stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avglen
        FROM perdoc
    )
    SELECT doc_id, round({score}, 6) AS score
    FROM perdoc CROSS JOIN dfs CROSS JOIN stats
    WHERE {any_tf} > 0
    ORDER BY score DESC, doc_id
    LIMIT {top}
"""


# ---------------------------------------------------------------------------
# grouped TF-IDF: per-SOURCE top terms (each source's doc set as one
# pseudo-document) — the grouped twin of doc_tfidf_top_terms, completing
# the global/grouped symmetry the sketch family follows (HLL, t-digest,
# Misra-Gries each have both forms).
# ---------------------------------------------------------------------------

SOURCE_TERMS_K = 5


def source_tfidf_top_terms(sf_dir: str, k: int = SOURCE_TERMS_K):
    """(source, word, tfidf, rank): each source's top-k characteristic
    terms by tf·ln(N/df) with N = #sources, df = #sources containing the
    word. Unlike the per-doc variant, term frequencies SPAN batches, so
    tf takes its own (source, word)-keyed exchange; df then rides a
    word-keyed exchange over the O(sources × vocab) tf rows, scoring is
    an unconditional bucketed join (no broadcast gate needed — there is
    no driver-side collection at all), and the top-k co-locates each
    source's candidates. Rank compares the ROUNDED score, word ASC."""
    from ..stages.joins import bucketed_hash_join
    from ..stages.shuffle import bucketed_sum_count

    doc_bytes = table_bytes(_t(sf_dir, "documents"))
    docs = _read_docs_cols(sf_dir, ["source", "text"])

    def tf_partial(batch: pa.Table) -> pd.DataFrame:
        batch = batch.filter(pc.is_valid(batch["text"]))  # oracle unnest drops NULL
        if batch.num_rows == 0:  # dtype-pinned empty (Arrow unification)
            return pd.DataFrame(
                {
                    "source": pd.array([], dtype="str"),
                    "word": pd.array([], dtype="str"),
                    "c": pd.array([], dtype="int64"),
                }
            )
        words = pc.split_pattern(batch["text"], " ")
        flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        parents = pc.list_parent_indices(flat).to_numpy(zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"source": src[parents],
             "word": pc.list_flatten(flat).to_numpy(zero_copy_only=False)}
        )
        out = df.groupby(["source", "word"], sort=False).size().reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        return out

    tf = bucketed_sum_count(
        docs.map_batches(tf_partial, batch_format="pyarrow"),
        ["source", "word"],
        sums={"c": "tf"},
        input_bytes=doc_bytes,
    ).materialize()

    # N = #sources: an O(#sources) driver scalar off the already-grouped rows
    n_sources = float(
        tf.map_batches(
            lambda b: b[["source"]].drop_duplicates(), batch_format="pandas"
        ).to_pandas()["source"].nunique()
    )

    df_rows = bucketed_sum_count(
        tf.map_batches(
            lambda b: pd.DataFrame({"w": b["word"], "one": np.int64(1)}),
            batch_format="pandas",
        ),
        ["w"],
        sums={"one": "df"},
        input_bytes=doc_bytes,
    )

    joined = bucketed_hash_join(
        tf, df_rows, left_on=["word"], right_on=["w"], how="inner",
        input_bytes=doc_bytes,
    )

    def add_score(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": b["source"],
                "word": b["word"],
                "tfidf": _round6(
                    b["tf"].to_numpy(dtype="float64")
                    * np.log(n_sources / b["df"].to_numpy(dtype="float64"))
                ),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["source", "tfidf", "word"], ascending=[True, False, True],
            kind="mergesort",
        )
        g["rank"] = (g.groupby("source", sort=False).cumcount() + 1).astype("int64")
        return g[g["rank"] <= k][["source", "word", "tfidf", "rank"]]

    return bucketed_map_groups(
        joined.map_batches(add_score, batch_format="pandas"),
        ["source"],
        fn=topk,
        input_bytes=doc_bytes,
    )


def q_source_tfidf_top_terms(sf_dir: str):
    return source_tfidf_top_terms(sf_dir)


_SOURCE_TFIDF_SQL = f"""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
        SELECT source, word, CAST(count(*) AS BIGINT) AS tf
        FROM tok GROUP BY source, word
    ), df AS (
        SELECT word, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY word
    ), n AS (
        SELECT CAST(count(DISTINCT source) AS DOUBLE) AS n FROM documents
    ), scored AS (
        SELECT tf.source, tf.word,
               round(CAST(tf.tf AS DOUBLE) * ln(n.n / df.df), 6) AS tfidf
        FROM tf JOIN df USING (word) CROSS JOIN n
    ), ranked AS (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY source ORDER BY tfidf DESC, word
               ) AS BIGINT) AS rank
        FROM scored
    )
    SELECT source, word, tfidf, rank FROM ranked WHERE rank <= {SOURCE_TERMS_K}
"""


QUERIES = {
    "doc_tfidf_top_terms": q_doc_tfidf_top_terms,
    "bm25_search": q_bm25_search,
    "source_tfidf_top_terms": q_source_tfidf_top_terms,
}
ORACLE = {
    "doc_tfidf_top_terms": _TFIDF_SQL,
    "bm25_search": _bm25_sql(),
    "source_tfidf_top_terms": _SOURCE_TFIDF_SQL,
}
