"""Text-analysis training-data ops with exact SQL oracles.

Two operators a pre-training corpus pipeline runs that the engine lacked:

- ``doc_repetition`` — Gopher-style repetition signals per document
  (duplicate-word fraction, top-word fraction, top-bigram fraction; cf.
  Rae et al. 2021 §A1.1 "repetition removal"): the filter signal for
  degenerate/boilerplate text. Fully batch-local (a document is one row),
  vectorized via factorize + lexsort run-length counting — zero shuffles
  at any scale.

- ``corpus_token_budget`` — "fill the token budget with the best
  documents": order the corpus by (quality_score DESC, doc_id) and keep
  the maximal prefix whose cumulative token count stays within the
  budget — the selection step that turns a scored corpus into a training
  set of a target size. Implemented as a distributed ordered prefix-sum:
  Ray sort (range exchange), then ONE bounded driver pass over per-block
  summaries (first sort key + token subtotal per block — O(blocks), never
  O(corpus)) to compute block offsets, then a map-side cumsum + filter.
  The global sort is inherent to exact ordered selection; the approximate
  scale path for when a sort is unaffordable is the t-digest quality
  threshold (``price_stats_tdigest`` pattern / ``quality_filter``).

- ``doc_lm_score`` — corpus-trained unigram-LM proxy score (mean token
  log-likelihood under the corpus's own unigram distribution; the classic
  "LM perplexity" quality signal with the corpus itself as the model):
  pass 1 trains the model — global word counts via map-side partial
  combine + one bucketed exchange; pass 2 scores every document against
  it. The trained table is broadcast when the vocabulary fits the size
  gate (one ``ray.put``, fetched once per worker), otherwise scoring
  falls back to an exploded bucketed join + per-doc combine — the same
  gate-or-join discipline as the dedup pushdown prefilters. Both paths
  are equivalence-tested.

All oracles follow the engine convention: identical column names, 6dp
half-away rounding on both sides, DuckDB CTEs kept structurally parallel
to the Ray plan.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.shuffle import bucketed_map_groups, table_bytes


def _t(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read_docs(sf_dir: str, columns: list[str]):
    path = _t(sf_dir, "documents")
    blocks = min(64, max(2, table_bytes(path) >> 20))
    return rd.read_parquet(path, columns=columns, override_num_blocks=blocks)


from ..functions.rounding import round6 as _round6  # the shared 6dp contract


def _group_counts(a: np.ndarray, b: np.ndarray):
    """Counts of equal (a, b) pairs via lexsort + run-length — no hash
    table, no pair-key packing (which would overflow int64 for large
    vocabularies). Empty-safe: a batch can have zero pairs (e.g. the
    bigram path when no document has two adjacent words)."""
    if len(a) == 0:
        return a, b, np.array([], dtype=np.int64)
    order = np.lexsort((b, a))
    aa, bb = a[order], b[order]
    new = np.empty(len(aa), dtype=bool)
    new[0] = True
    new[1:] = (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(aa)))
    return aa[starts], bb[starts], counts


# ---------------------------------------------------------------------------
# doc_repetition
# ---------------------------------------------------------------------------


_REPETITION_EMPTY = pa.schema(
    [("doc_id", pa.int64()), ("dup_word_frac", pa.float64()),
     ("top_word_frac", pa.float64()), ("top_bigram_frac", pa.float64())]
)


def _repetition_batch(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return _REPETITION_EMPTY.empty_table()
    # null text behaves like "" (one empty token) — defined output instead
    # of NaN rows on dirty corpora; the fixtures carry no nulls either way
    words = pc.split_pattern(pc.coalesce(batch["text"], ""), " ")
    flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    parents = pc.list_parent_indices(flat).to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(pc.list_flatten(flat).to_numpy(zero_copy_only=False))
    n_docs = batch.num_rows

    total = np.bincount(parents, minlength=n_docs).astype(np.float64)

    # per-doc distinct words + most frequent word count
    gp, _, gc = _group_counts(parents, codes)
    distinct = np.bincount(gp, minlength=n_docs).astype(np.float64)
    top_word = np.zeros(n_docs)
    np.maximum.at(top_word, gp, gc)

    # per-doc bigram totals + most frequent bigram count (adjacent word
    # pairs within one document; parents are non-decreasing so adjacency
    # in the flat array + equal parent == adjacency in the document)
    top_gram = np.zeros(n_docs)
    gram_total = np.zeros(n_docs)
    if len(codes) >= 2:
        same = parents[:-1] == parents[1:]
        bp = parents[:-1][same]
        gram_total = np.bincount(bp, minlength=n_docs).astype(np.float64)
        # pack the pair into one key: codes fit 32 bits within a batch
        # (factorize is batch-local), so this cannot overflow int64
        bk = codes[:-1][same].astype(np.int64) * np.int64(len(codes) + 1) + codes[1:][same]
        gp2, _, gc2 = _group_counts(bp, bk)
        np.maximum.at(top_gram, gp2, gc2)

    with np.errstate(invalid="ignore", divide="ignore"):
        dup = 1.0 - distinct / total
        topw = top_word / total
        topg = np.where(gram_total > 0, top_gram / np.maximum(gram_total, 1.0), 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "dup_word_frac": pa.array(_round6(dup), pa.float64()),
            "top_word_frac": pa.array(_round6(topw), pa.float64()),
            "top_bigram_frac": pa.array(_round6(topg), pa.float64()),
        }
    )


def q_doc_repetition(sf_dir: str):
    """(doc_id, dup_word_frac, top_word_frac, top_bigram_frac) — the
    repetition-removal signals, one row per document."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _repetition_batch, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# corpus_token_budget
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 10_000  # whitespace tokens the selected corpus may total


def _score_tokens(batch: pa.Table) -> pa.Table:
    """quality_score (the oracle-pinned doc_quality length score) +
    whitespace token count, one pass over (doc_id, text, n_chars)."""
    n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
    length_score = np.where(
        n < 50,
        n / 50.0 * 50.0,
        np.where(
            n <= 500,
            50.0 + (n - 50.0) / 450.0 * 50.0,
            100.0 - np.minimum(50.0, (n - 500.0) / 100.0),
        ),
    )
    quality = np.floor(length_score * 0.3 * 100.0 + 0.5) / 100.0  # round2
    words = pc.split_pattern(pc.coalesce(batch["text"], ""), " ")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "quality_score": pa.array(quality, pa.float64()),
            "n_tokens": pc.cast(pc.list_value_length(words), pa.int64()),
        }
    )


def q_corpus_token_budget(sf_dir: str, budget: int = TOKEN_BUDGET):
    """The selected training corpus: documents in (quality_score DESC,
    doc_id) order while the running token total stays ≤ budget —
    (doc_id, quality_score, n_tokens, cum_tokens).

    Distributed ordered prefix-sum: after the range sort, pass A reduces
    each block to (first-row sort key, token subtotal) — one row PER BLOCK
    on the driver, the same bounded pattern as q_network_stats — pass B
    adds each block's offset to its local cumsum and filters. Blocks whose
    offset already exceeds the budget emit nothing (their rows are all past
    the cut), so the tail of a huge corpus costs a subtotal scan, not a
    materialization."""
    import ray

    from ..stages.actors import cached_get
    scored = (
        _read_docs(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(_score_tokens, batch_format="pyarrow")
        .sort(key=["quality_score", "doc_id"], descending=[True, False])
        .materialize()
    )

    # pass A: one summary row per block (bounded driver-side collection)
    def block_summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"q0": pa.array([], pa.float64()), "id0": pa.array([], pa.int64()),
                 "toks": pa.array([], pa.int64()), "tok0": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "q0": pa.array([batch["quality_score"][0].as_py()], pa.float64()),
                "id0": pa.array([batch["doc_id"][0].as_py()], pa.int64()),
                "toks": pa.array(
                    [pc.sum(batch["n_tokens"]).as_py()], pa.int64()
                ),
                "tok0": pa.array([batch["n_tokens"][0].as_py()], pa.int64()),
            }
        )

    summaries = scored.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None
    ).take_all()  # O(number of blocks), never O(corpus)
    summaries.sort(key=lambda r: (-r["q0"], r["id0"]))
    _anchor = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "quality_score": pa.array([], pa.float64()),
         "n_tokens": pa.array([], pa.int64()),
         "cum_tokens": pa.array([], pa.int64())}
    )
    # degenerate case: even the single best document exceeds the budget.
    # Return the typed empty directly — Ray's sort represents empty
    # partitions as zero-COLUMN blocks, so an all-empty filter result
    # would otherwise lose its schema.
    if not summaries or summaries[0]["tok0"] > budget:
        return rd.from_arrow(_anchor)
    offsets: dict[tuple, int] = {}
    running = 0
    for s in summaries:
        offsets[(s["q0"], s["id0"])] = running
        running += s["toks"]
    # broadcast the O(blocks) offsets dict once (ray.put + per-worker
    # cached_get, the engine's broadcast discipline) — capturing it in the
    # closure would pickle it into EVERY select task's spec: at the 100 TB
    # design point that's ~1.6M entries re-shipped ~1.6M times
    offsets_ref = ray.put(offsets)

    # pass B: map-side cumsum + budget filter over the SAME sorted blocks
    def select(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "quality_score": pa.array([], pa.float64()),
             "n_tokens": pa.array([], pa.int64()),
             "cum_tokens": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        off = cached_get(offsets_ref)[
            (batch["quality_score"][0].as_py(), batch["doc_id"][0].as_py())
        ]
        if off > budget:
            return empty
        cum = off + np.cumsum(batch["n_tokens"].to_numpy(zero_copy_only=False))
        keep = cum <= budget
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "quality_score": batch["quality_score"].filter(pa.array(keep)),
                "n_tokens": batch["n_tokens"].filter(pa.array(keep)),
                "cum_tokens": pa.array(cum[keep], pa.int64()),
            }
        )

    return scored.map_batches(select, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# doc_lm_score
# ---------------------------------------------------------------------------

# above this vocabulary size the word→log-probability table is no longer
# "small-side" (2M entries ≈ 100-200 MB as a pandas Series) and scoring
# takes the bucketed-join path instead of a broadcast
VOCAB_BROADCAST_MAX = 2_000_000


def _explode_tokens(batch: pa.Table) -> pa.Table:
    """(doc_id, word) with duplicates — LM scoring weights every token."""
    words = pc.split_pattern(pc.coalesce(batch["text"], ""), " ")
    flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    parents = pc.list_parent_indices(flat)
    return pa.table(
        {"doc_id": batch["doc_id"].take(parents), "word": pc.list_flatten(flat)}
    )


def q_doc_lm_score(sf_dir: str, broadcast_max: int = VOCAB_BROADCAST_MAX):
    """(doc_id, lm_score): mean ln p(word) per document under the corpus
    unigram model — higher (closer to 0) = more typical text, very low =
    out-of-distribution/noise. Two passes over the corpus: train (word
    counts, one bucketed exchange), then score (broadcast lookup or
    bucketed join — chosen by vocabulary size, never by guess)."""
    import ray

    from ..stages.actors import cached_get
    from ..stages.joins import bucketed_hash_join
    from ..stages.shuffle import bucketed_sum_count

    doc_bytes = table_bytes(_t(sf_dir, "documents"))
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.coalesce(batch["text"], ""), " ")
        t = pa.table({"word": pc.list_flatten(words)})
        out = t.group_by("word").aggregate([("word", "count")])
        return pa.table(
            {"word": out["word"], "c": pc.cast(out["word_count"], pa.int64())}
        )

    wc = bucketed_sum_count(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        ["word"],
        sums={"c": "c"},
        input_bytes=doc_bytes,
    ).materialize()
    vocab = wc.count()
    n_total = float(wc.sum("c"))

    if vocab <= broadcast_max:
        # small-side broadcast: ONE ray.put of the trained table, fetched
        # once per worker (cached_get), vectorized hash-join via Series.map
        table = wc.to_pandas()
        logp = pd.Series(
            np.log(table["c"].to_numpy(dtype=np.float64) / n_total),
            index=table["word"],
        )
        ref = ray.put(logp)

        def score(batch: pa.Table) -> pa.Table:
            words = pc.split_pattern(pc.coalesce(batch["text"], ""), " ")
            flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
            parents = pc.list_parent_indices(flat).to_numpy(zero_copy_only=False)
            toks = pd.Series(pc.list_flatten(flat).to_numpy(zero_copy_only=False))
            lp = toks.map(cached_get(ref)).to_numpy(dtype=np.float64)
            n_docs = batch.num_rows
            tot = np.bincount(parents, weights=lp, minlength=n_docs)
            cnt = np.bincount(parents, minlength=n_docs).astype(np.float64)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "lm_score": pa.array(
                        _round6(tot / np.maximum(cnt, 1.0)), pa.float64()
                    ),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow")

    # large-vocabulary path: join every token against the count table by
    # word (bucketed), then combine per document (bucketed) — two
    # exchanges, nothing on the driver
    tokens = docs.map_batches(_explode_tokens, batch_format="pyarrow")
    wc_r = wc.map_batches(
        lambda b: b.rename_columns(["w", "c"]), batch_format="pyarrow"
    )
    joined = bucketed_hash_join(
        tokens, wc_r, left_on=["word"], right_on=["w"], how="inner",
        input_bytes=doc_bytes,
    )

    def to_partial(b: pd.DataFrame) -> pd.DataFrame:
        # no ones-column: bucketed_sum_count's partial computes the group
        # size itself, so shipping constant 1s only inflated the doc-keyed
        # exchange on exactly the too-big-to-broadcast path
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "lp": np.log(b["c"].to_numpy(dtype=np.float64) / n_total),
            }
        )

    sums = bucketed_sum_count(
        joined.map_batches(to_partial, batch_format="pandas"),
        ["doc_id"],
        sums={"lp": "lp"},
        count_as="n",
        input_bytes=doc_bytes,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "lm_score": _round6(
                    b["lp"].to_numpy(dtype=np.float64)
                    / np.maximum(b["n"].to_numpy(dtype=np.float64), 1.0)
                ),
            }
        )

    return sums.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# corpus_collocations — PMI collocation extraction
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP = 20


def q_corpus_collocations(
    sf_dir: str,
    min_count: int = PMI_MIN_COUNT,
    top: int = PMI_TOP,
    broadcast_max: int = VOCAB_BROADCAST_MAX,
):
    """Top collocations by pointwise mutual information: bigrams whose
    co-occurrence beats chance, PMI = ln(P(w1w2)/(P(w1)·P(w2))) — the
    classic phrase-mining signal (Church & Hanks 1990). Unigram and
    bigram counts each take ONE map-side-combined exchange; the totals
    T/B are scalars off the already-grouped tables; attaching c(w1)/c(w2)
    is a vocabulary-gated broadcast (one ray.put, fetched per worker) or
    two bucketed joins above the gate; the top-k is a local_topk prune
    over candidates already thinned by the integer min_count filter. The
    float derivation — three divisions, one multiply, one ln — is
    mirrored operation-for-operation in the oracle, ranked on the ROUNDED
    score (then w1, w2)."""
    import ray

    from ..stages.actors import cached_get
    from ..stages.joins import bucketed_hash_join
    from ..stages.shuffle import bucketed_sum_count, local_topk

    doc_bytes = table_bytes(_t(sf_dir, "documents"))
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def uni_partial(batch: pa.Table) -> pd.DataFrame:
        # NULL text contributes no tokens (string_split(NULL) unnests to
        # zero rows in the oracle — the relevance.py convention)
        words = pc.split_pattern(batch["text"].drop_null(), " ")
        t = pd.DataFrame(
            {"word": pc.list_flatten(words).to_numpy(zero_copy_only=False)}
        )
        out = t.groupby("word", sort=False).size().reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        return out

    def bg_partial(batch: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "w1": pd.array([], dtype="str"),
                "w2": pd.array([], dtype="str"),
                "c": pd.array([], dtype="int64"),
            }
        )
        if batch.num_rows == 0:
            return empty
        words = pc.split_pattern(batch["text"].drop_null(), " ")
        flat_list = (
            words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        )
        parents = pc.list_parent_indices(flat_list).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(flat_list).to_numpy(zero_copy_only=False)
        if len(flat) < 2:
            return empty
        same = parents[:-1] == parents[1:]  # adjacent tokens, same document
        if not same.any():
            return empty
        t = pd.DataFrame({"w1": flat[:-1][same], "w2": flat[1:][same]})
        out = t.groupby(["w1", "w2"], sort=False).size().reset_index(name="c")
        out["c"] = out["c"].astype("int64")
        return out

    uni = bucketed_sum_count(
        docs.map_batches(uni_partial, batch_format="pyarrow"),
        ["word"], sums={"c": "c"}, input_bytes=doc_bytes,
    ).materialize()
    bgc = bucketed_sum_count(
        docs.map_batches(bg_partial, batch_format="pyarrow"),
        ["w1", "w2"], sums={"c": "c12"}, input_bytes=doc_bytes,
    ).materialize()
    t_total = float(uni.sum("c"))
    b_total = float(bgc.sum("c12"))
    vocab = uni.count()

    cand = bgc.map_batches(
        lambda b: b[b["c12"] >= np.int64(min_count)], batch_format="pandas"
    )

    if vocab <= broadcast_max:
        table = uni.to_pandas()
        cmap = pd.Series(table["c"].to_numpy(dtype="float64"), index=table["word"])
        ref = ray.put(cmap)

        def score(b: pd.DataFrame) -> pd.DataFrame:
            cm = cached_get(ref)
            c12 = b["c12"].to_numpy(dtype="float64")
            c1 = b["w1"].map(cm).to_numpy(dtype="float64")
            c2 = b["w2"].map(cm).to_numpy(dtype="float64")
            pmi = np.log((c12 / b_total) / ((c1 / t_total) * (c2 / t_total)))
            return pd.DataFrame(
                {
                    "w1": b["w1"], "w2": b["w2"],
                    "c12": b["c12"].astype("int64"),
                    "pmi": _round6(pmi),
                }
            )

        scored = cand.map_batches(score, batch_format="pandas")
    else:
        uni1 = uni.map_batches(
            lambda b: b.rename_columns(["u1", "c1"]), batch_format="pyarrow"
        )
        uni2 = uni.map_batches(
            lambda b: b.rename_columns(["u2", "c2"]), batch_format="pyarrow"
        )
        j1 = bucketed_hash_join(
            cand, uni1, left_on=["w1"], right_on=["u1"], how="inner",
            input_bytes=doc_bytes,
        )
        j2 = bucketed_hash_join(
            j1, uni2, left_on=["w2"], right_on=["u2"], how="inner",
            input_bytes=doc_bytes,
        )

        def score_joined(b: pd.DataFrame) -> pd.DataFrame:
            c12 = b["c12"].to_numpy(dtype="float64")
            c1 = b["c1"].to_numpy(dtype="float64")
            c2 = b["c2"].to_numpy(dtype="float64")
            pmi = np.log((c12 / b_total) / ((c1 / t_total) * (c2 / t_total)))
            return pd.DataFrame(
                {
                    "w1": b["w1"], "w2": b["w2"],
                    "c12": b["c12"].astype("int64"),
                    "pmi": _round6(pmi),
                }
            )

        scored = j2.map_batches(score_joined, batch_format="pandas")

    return local_topk(
        scored, by=["pmi", "w1", "w2"], descending=[True, False, False], k=top
    )


_COLLOCATIONS_SQL = f"""
    WITH w AS (
        SELECT string_split(text, ' ') AS ws FROM documents
    ), tok AS (
        SELECT unnest(ws) AS word FROM w
    ), uni AS (
        SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY word
    ), tot AS (
        SELECT CAST(sum(c) AS DOUBLE) AS t FROM uni
    ), bg AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM w, UNNEST(range(1, len(ws))) AS r(i)
    ), bgc AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
    ), btot AS (
        SELECT CAST(sum(c12) AS DOUBLE) AS b FROM bgc
    )
    SELECT w1, w2, c12,
           round(ln((CAST(c12 AS DOUBLE) / b)
                    / ((CAST(u1.c AS DOUBLE) / t)
                       * (CAST(u2.c AS DOUBLE) / t))), 6) AS pmi
    FROM bgc
    JOIN uni u1 ON bgc.w1 = u1.word
    JOIN uni u2 ON bgc.w2 = u2.word
    CROSS JOIN tot CROSS JOIN btot
    WHERE c12 >= {PMI_MIN_COUNT}
    ORDER BY pmi DESC, w1, w2
    LIMIT {PMI_TOP}
"""


# ---------------------------------------------------------------------------
# doc_dup_spans — cross-document duplicated-substring analysis
# ---------------------------------------------------------------------------

DUP_SPAN_K = 5  # words per gram — the ExactSubstr-style window


def _dup_span_postings(batch: pa.Table) -> pa.Table:
    """(gh, doc_id, c): per document, each distinct word 5-gram with its
    occurrence count, the gram replaced by its 64-bit hash BEFORE the
    exchange (cf. reference event_processor.py:210-223 set-dedup per row —
    here the set is corpus-wide). A doc is one input row, so within-batch
    grouping is globally complete per (doc, gram). Shipping the 8-byte hash
    instead of the ~30-byte gram string is the exchange-byte win; a
    collision (two distinct grams, one hash) would merge their document
    frequencies — probability ~n_grams²·2⁻⁶⁴, negligible at any corpus
    size this engine targets (10¹² grams → ~10⁻⁵)."""
    k = DUP_SPAN_K
    words = pc.split_pattern(batch["text"], " ")
    flat_list = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    parents = pc.list_parent_indices(flat_list).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(flat_list)
    empty = pa.table(
        {
            "gh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
        }
    )
    if len(flat) < k:
        return empty
    windows = [flat.slice(i, len(flat) - (k - 1)) for i in range(k)]
    grams = pc.binary_join_element_wise(*windows, " ")
    same_doc = parents[: len(parents) - (k - 1)] == parents[k - 1 :]
    if not same_doc.any():
        return empty
    doc_ids = (
        batch["doc_id"]
        .take(pa.array(parents[: len(parents) - (k - 1)][same_doc]))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    gh = pd.util.hash_array(
        grams.filter(pa.array(same_doc)).to_numpy(zero_copy_only=False)
    ).view(np.int64)
    d, g, c = _group_counts(doc_ids, gh)
    return pa.table({"gh": g, "doc_id": d, "c": c})


def q_doc_dup_spans(sf_dir: str, num_buckets: int | None = None):
    """(doc_id, n_grams, n_dup_grams, dup_fraction): per document, the
    fraction of its word-5-gram positions whose gram also appears in at
    least one OTHER document — the corpus-internal duplicated-substring
    signal of ExactSubstr dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL'22), reframed from suffix arrays to
    a fixed-window gram exchange that Ray Data can bucket. Documents
    shorter than 5 words have no gram positions and are absent, matching
    the oracle.

    Shape: one map_batches explode (gram→hash map-side, counts combined
    per doc), ONE bucketed exchange keyed by gram hash to compute document
    frequency and fold each doc's duplicated positions, then ONE bucketed
    per-doc sum of the bucket partials. Nothing corpus-sized touches the
    driver; the gram strings never leave the map stage."""
    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _dup_span_postings, batch_format="pyarrow"
    )
    nbytes = table_bytes(_t(sf_dir, "documents"))

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        # rows are unique per (gh, doc_id) → group size == document frequency
        df = g.groupby("gh", sort=False)["c"].transform("size")
        dup_c = np.where(df.to_numpy() >= 2, g["c"].to_numpy(), 0)
        out = pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(), "n": g["c"].to_numpy(), "nd": dup_c}
        )
        return out.groupby("doc_id", as_index=False).sum()

    partials = bucketed_map_groups(
        ds, ["gh"], bucket_partials, num_buckets=num_buckets, input_bytes=nbytes
    )

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False)[["n", "nd"]].sum()
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].to_numpy(),
                "n_grams": agg["n"].to_numpy().astype(np.int64),
                "n_dup_grams": agg["nd"].to_numpy().astype(np.int64),
                "dup_fraction": _round6(agg["nd"].to_numpy() / agg["n"].to_numpy()),
            }
        )

    return bucketed_map_groups(
        partials, ["doc_id"], per_doc, num_buckets=num_buckets, input_bytes=nbytes
    )


# ---------------------------------------------------------------------------
# dup_span_trim — ExactSubstr removal: cut duplicated spans, keep one copy
# ---------------------------------------------------------------------------


def _dup_span_gram_positions(batch: pa.Table) -> pa.Table:
    """(gh, doc_id, pos): every word-5-gram POSITION (0-based start within
    its document), gram hashed map-side. Unlike ``_dup_span_postings`` the
    positions cannot be combined into counts — the trim needs to know WHERE
    each duplicated gram starts. One row per gram position is the inherent
    exchange cost of substring-level dedup (the suffix-array formulation
    touches every position too)."""
    k = DUP_SPAN_K
    words = pc.split_pattern(batch["text"], " ")
    flat_list = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    parents = pc.list_parent_indices(flat_list).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(flat_list)
    empty = pa.table(
        {
            "gh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }
    )
    if len(flat) < k:
        return empty
    windows = [flat.slice(i, len(flat) - (k - 1)) for i in range(k)]
    grams = pc.binary_join_element_wise(*windows, " ")
    same_doc = parents[: len(parents) - (k - 1)] == parents[k - 1 :]
    if not same_doc.any():
        return empty
    lengths = pc.list_value_length(flat_list).to_numpy(zero_copy_only=False)
    row_first = np.concatenate([[0], np.cumsum(lengths[:-1])]).astype(np.int64)
    j = np.flatnonzero(same_doc)  # global word index of each kept gram start
    rows = parents[j]
    gh = pd.util.hash_array(
        grams.take(pa.array(j)).to_numpy(zero_copy_only=False)
    ).view(np.int64)
    return pa.table(
        {
            "gh": gh,
            "doc_id": batch["doc_id"].take(pa.array(rows)),
            "pos": j - row_first[rows],
        }
    )


def q_dup_span_trim(sf_dir: str, num_buckets: int | None = None):
    """(doc_id, n_words, n_removed, text_clean): ExactSubstr REMOVAL (Lee
    et al., ACL'22) — for every word-5-gram appearing in ≥2 distinct
    documents, the lowest-doc_id holder keeps its text and every other
    holder has the covered word positions cut; uncovered words are
    rejoined with single spaces. Every document appears in the output
    (n_removed = 0 when nothing was cut; a fully-duplicated non-canonical
    doc comes back with text_clean = '')."""
    nbytes = table_bytes(_t(sf_dir, "documents"))
    return dup_span_trim_ds(
        _read_docs(sf_dir, ["doc_id", "text"]),
        _read_docs(sf_dir, ["doc_id", "text"]),
        input_bytes=nbytes,
        num_buckets=num_buckets,
    )


def dup_span_trim_ds(gram_src, text_src, input_bytes, num_buckets=None):
    """The trim over arbitrary (doc_id, text) datasets — ``gram_src`` and
    ``text_src`` must yield the SAME corpus (two fresh reads for a file
    table, or the same materialized Dataset twice for a computed corpus,
    e.g. the curated survivors in pipelines/curate.py).

    Shape: gram-position explode (hashes only leave the map stage) → ONE
    bucketed exchange by gram hash (document frequency + canonical doc,
    emit covered positions for non-canonical holders) → ONE bucketed
    exchange by doc_id where the position rows meet the document texts
    (union + tag, the same conform-and-bucket plan as
    stages/joins.bucketed_hash_join) and the trim is rebuilt fully
    vectorized (range-delta coverage mask + Arrow list reassembly)."""
    nbytes = input_bytes
    grams = gram_src.map_batches(
        _dup_span_gram_positions, batch_format="pyarrow"
    )

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("gh", sort=False)
        df = grp["doc_id"].transform("nunique")
        canon = grp["doc_id"].transform("min")
        m = (df.to_numpy() >= 2) & (g["doc_id"].to_numpy() != canon.to_numpy())
        return g.loc[m, ["doc_id", "pos"]].drop_duplicates()

    covered = bucketed_map_groups(
        grams, ["gh"], dup_positions, num_buckets=num_buckets, input_bytes=nbytes
    )

    # conform both streams to (doc_id, text, pos): text rows carry pos=-1
    def tag_docs(b: pa.Table) -> pa.Table:
        return b.append_column("pos", pa.array([-1] * b.num_rows, pa.int64()))

    def tag_pos(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "text": pa.nulls(b.num_rows, pa.string()),
                "pos": b["pos"],
            }
        )

    unioned = (
        text_src
        .map_batches(tag_docs, batch_format="pyarrow")
        .union(covered.map_batches(tag_pos, batch_format="pyarrow"))
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        k = DUP_SPAN_K
        is_text = g["pos"].to_numpy() == -1
        docs = g.loc[is_text, ["doc_id", "text"]].sort_values("doc_id")
        doc_ids = docs["doc_id"].to_numpy()
        texts = pa.array(docs["text"].to_numpy(dtype=object), pa.string())
        words = pc.split_pattern(texts, " ")
        lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        row_first = np.concatenate([[0], np.cumsum(lengths[:-1])]).astype(np.int64)
        flat = pc.list_flatten(words)
        # map covered (doc, start) pairs to global word indices, build the
        # coverage mask with a range-delta cumsum — no per-doc loop
        pos_rows = g.loc[~is_text]
        row_of = np.searchsorted(doc_ids, pos_rows["doc_id"].to_numpy())
        starts = row_first[row_of] + pos_rows["pos"].to_numpy()
        delta = np.zeros(len(flat) + 1, dtype=np.int64)
        np.add.at(delta, starts, 1)
        ends = np.minimum(starts + k, row_first[row_of] + lengths[row_of])
        np.add.at(delta, ends, -1)
        covered_mask = np.cumsum(delta[:-1]) > 0
        kept = flat.filter(pa.array(~covered_mask))
        kept_per_row = np.bincount(
            np.repeat(np.arange(len(doc_ids)), lengths)[~covered_mask],
            minlength=len(doc_ids),
        )
        # int64 offsets (LargeListArray): a doc_id bucket holding >2^31
        # total kept words would silently wrap int32 offsets — unlikely at
        # the default 64MB bucket sizing but unguarded with an explicit
        # small num_buckets on a large corpus
        offsets = np.concatenate([[0], np.cumsum(kept_per_row)]).astype(np.int64)
        clean = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), kept),
            " ",
        )
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "n_words": lengths.astype(np.int64),
                "n_removed": (lengths - kept_per_row).astype(np.int64),
                "text_clean": clean.to_numpy(zero_copy_only=False),
            }
        )

    return bucketed_map_groups(
        unioned, ["doc_id"], rebuild, num_buckets=num_buckets,
        input_bytes=2 * nbytes
    )


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_REPETITION_SQL = """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), tok AS (
        SELECT doc_id, unnest(ws) AS word FROM w
    ), wc AS (
        SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word
    ), wstat AS (
        SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n,
               CAST(count(*) AS DOUBLE) AS d, CAST(max(c) AS DOUBLE) AS mw
        FROM wc GROUP BY doc_id
    ), bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS g
        FROM w WHERE len(ws) >= 2
    ), bgc AS (
        SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
    ), bgstat AS (
        SELECT doc_id, CAST(sum(c) AS DOUBLE) AS tn, CAST(max(c) AS DOUBLE) AS mg
        FROM bgc GROUP BY doc_id
    )
    SELECT wstat.doc_id,
           round(1.0 - d / n, 6) AS dup_word_frac,
           round(mw / n, 6) AS top_word_frac,
           round(coalesce(mg / tn, 0.0), 6) AS top_bigram_frac
    FROM wstat LEFT JOIN bgstat USING (doc_id)
"""

_TOKEN_BUDGET_SQL = f"""
    WITH q AS (
        SELECT doc_id,
               round(0.3 * (CASE
                   WHEN n_chars < 50 THEN n_chars / 50.0 * 50.0
                   WHEN n_chars <= 500 THEN 50.0 + (n_chars - 50.0) / 450.0 * 50.0
                   ELSE 100.0 - least(50.0, (n_chars - 500.0) / 100.0)
               END), 2) AS quality_score,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT *, CAST(SUM(n_tokens) OVER (
                   ORDER BY quality_score DESC, doc_id) AS BIGINT) AS cum_tokens
        FROM q
    )
    SELECT doc_id, quality_score, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
"""

_LM_SCORE_SQL = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), wc AS (
        SELECT word, count(*) AS c FROM tok GROUP BY word
    ), tot AS (
        SELECT CAST(sum(c) AS DOUBLE) AS n FROM wc
    )
    SELECT doc_id, round(avg(ln(wc.c / tot.n)), 6) AS lm_score
    FROM tok JOIN wc USING (word) CROSS JOIN tot
    GROUP BY doc_id
"""

_DUP_SPANS_SQL = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), grams AS (
        SELECT doc_id, array_to_string(w[i : i + 4], ' ') AS g
        FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
    ), df AS (
        SELECT g, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY g
    ), per_doc AS (
        SELECT grams.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_grams
        FROM grams JOIN df USING (g)
        GROUP BY grams.doc_id
    )
    SELECT doc_id, n_grams, n_dup_grams,
           ROUND(CAST(n_dup_grams AS DOUBLE) / n_grams, 6) AS dup_fraction
    FROM per_doc
"""

def _trim_ctes(src: str = "documents") -> str:
    """The trim's CTE chain over any (doc_id, text) source relation —
    composable into larger single-statement oracles (pipelines/curate.py
    appends it after the curation chain's own CTEs with src='sdocs')."""
    return f"""toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM {src}
    ), grams AS (
        SELECT doc_id, i, array_to_string(w[i : i + 4], ' ') AS g
        FROM toks, UNNEST(range(1, len(w) - 3)) AS t(i)
    ), gstat AS (
        SELECT g, COUNT(DISTINCT doc_id) AS df, MIN(doc_id) AS canon
        FROM grams GROUP BY g
    ), cov AS (
        SELECT DISTINCT grams.doc_id, u.p
        FROM grams JOIN gstat USING (g),
             UNNEST(range(grams.i, grams.i + 5)) AS u(p)
        WHERE gstat.df >= 2 AND grams.doc_id <> gstat.canon
    ), words AS (
        SELECT doc_id, p, w[p] AS word
        FROM toks, UNNEST(range(1, len(w) + 1)) AS t(p)
    ), kept AS (
        SELECT words.doc_id, words.p, words.word
        FROM words LEFT JOIN cov
            ON words.doc_id = cov.doc_id AND words.p = cov.p
        WHERE cov.p IS NULL
    ), agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               array_to_string(list(word ORDER BY p), ' ') AS txt
        FROM kept GROUP BY doc_id
    )"""


_TRIM_SELECT = """
    SELECT toks.doc_id,
           CAST(len(w) AS BIGINT) AS n_words,
           CAST(len(w) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(agg.txt, '') AS text_clean
    FROM toks LEFT JOIN agg USING (doc_id)
"""

_DUP_SPAN_TRIM_SQL = f"WITH {_trim_ctes()} {_TRIM_SELECT}"


# ---------------------------------------------------------------------------
# doc_chunks — fixed context-window chunking with stride
# ---------------------------------------------------------------------------

# Registered-query knobs: the sf fixtures average ~54 words/doc, so a
# 16-word window with stride 12 (4-word overlap) exercises real multi-chunk
# overlap (~4.7 chunks/doc) instead of degenerating to one chunk per doc.
# Production pre-training chunking is the same kernel at e.g. W=2048/S=1920.
CHUNK_WINDOW = 16
CHUNK_STRIDE = 12


def _chunk_batch(batch: pa.Table, window: int, stride: int) -> pa.Table:
    """Split each document's word sequence into overlapping fixed windows:
    chunk c covers words [c*stride, c*stride + window); the last chunk is
    the clamped remainder; a doc with <= window words is one chunk. NULL
    text yields no chunks (string_split(NULL) unnests to zero rows — the
    relevance.py convention, mirrored by WHERE text IS NOT NULL).

    Fully vectorized: one split, then the overlapping slices are gathered
    through a flat take-index (overlap means a plain offsets-into-values
    ListArray can't alias the split buffer) and re-joined with
    ``binary_join``. Batch-local — zero exchanges at any scale; output is
    ~window/stride × the input word count."""
    batch = batch.filter(pc.is_valid(batch["text"]))
    words = pc.split_pattern(batch["text"], " ")
    words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    n = (
        pc.list_value_length(words).to_numpy().astype(np.int64)
        if len(words)
        else np.array([], dtype=np.int64)
    )
    n_chunks = 1 + np.maximum(0, (n - window + stride - 1) // stride)
    parents = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    first = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    chunk_idx = np.arange(int(n_chunks.sum()), dtype=np.int64) - first
    offs = (
        np.asarray(words.offsets)[:-1].astype(np.int64)
        if len(words)
        else np.array([], dtype=np.int64)
    )
    start = offs[parents] + chunk_idx * stride
    length = np.minimum(chunk_idx * stride + window, n[parents]) - chunk_idx * stride
    out_offs = np.zeros(len(length) + 1, dtype=np.int64)
    np.cumsum(length, out=out_offs[1:])
    take_idx = np.repeat(start - out_offs[:-1], length) + np.arange(
        int(out_offs[-1]), dtype=np.int64
    )
    gathered = pc.list_flatten(words).take(pa.array(take_idx, pa.int64()))
    chunks = pa.LargeListArray.from_arrays(pa.array(out_offs, pa.int64()), gathered)
    return pa.table(
        {
            "doc_id": batch["doc_id"].take(pa.array(parents, pa.int64())),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_words": pa.array(length, pa.int64()),
            "chunk_text": pc.binary_join(chunks, " "),
        }
    )


def doc_chunks(
    sf_dir: str, window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
):
    """Context-window chunking — the step that turns curated documents
    into model-sized training windows (with overlap so no span is only
    seen truncated at a window boundary). The reference pipeline has no
    analog (it ends at an analytics store); this is part of the
    training-data extension set, downstream of curation and upstream of
    ``pack_sequences`` / ``write_shards``. A pure map: embarrassingly
    parallel, streams at 100 TB."""
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError(f"need 0 < stride <= window, got {window=} {stride=}")
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _chunk_batch(b, window, stride), batch_format="pyarrow"
    )


def q_doc_chunks(sf_dir: str):
    return doc_chunks(sf_dir)


# list slicing is 1-based inclusive and clamps at both ends, so
# ws[c*S + 1 : c*S + W] is exactly words [c*S, c*S + W) clamped to n
_DOC_CHUNKS_SQL = f"""
WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS ws,
           len(string_split(text, ' ')) AS n
    FROM documents WHERE text IS NOT NULL
), c AS (
    SELECT doc_id, ws, n,
           unnest(range(0, CASE WHEN n <= {CHUNK_WINDOW} THEN 1
                ELSE (n - {CHUNK_WINDOW} + {CHUNK_STRIDE} - 1)
                     // {CHUNK_STRIDE} + 1 END)) AS chunk_idx
    FROM w
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(LEAST(n - chunk_idx * {CHUNK_STRIDE}, {CHUNK_WINDOW}) AS BIGINT)
           AS n_words,
       array_to_string(ws[chunk_idx * {CHUNK_STRIDE} + 1 :
                          chunk_idx * {CHUNK_STRIDE} + {CHUNK_WINDOW}], ' ')
           AS chunk_text
FROM c
"""


QUERIES = {
    "doc_repetition": q_doc_repetition,
    "corpus_token_budget": q_corpus_token_budget,
    "doc_lm_score": q_doc_lm_score,
    "doc_dup_spans": q_doc_dup_spans,
    "dup_span_trim": q_dup_span_trim,
    "corpus_collocations": q_corpus_collocations,
    "doc_chunks": q_doc_chunks,
}
ORACLE = {
    "doc_repetition": _REPETITION_SQL,
    "corpus_token_budget": _TOKEN_BUDGET_SQL,
    "doc_lm_score": _LM_SCORE_SQL,
    "doc_dup_spans": _DUP_SPANS_SQL,
    "dup_span_trim": _DUP_SPAN_TRIM_SQL,
    "corpus_collocations": _COLLOCATIONS_SQL,
    "doc_chunks": _DOC_CHUNKS_SQL,
}
