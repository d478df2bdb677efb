"""Repetition signals + token-budget corpus selection: planted-case edge
pins and DuckDB-oracle agreement (the driver gate re-checks at sf0.01)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.pipelines.textops import (
    q_corpus_token_budget,
    q_doc_dup_spans,
    q_doc_lm_score,
    q_dup_span_trim,
    q_doc_repetition,
)

SF = "/root/testdata/sf0.001"


def _docs_dir(tmp_path, rows):
    """Write an sf_dir-shaped documents table: (doc_id, text) + derived
    n_chars (the schema the pipelines project)."""
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["test"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_repetition_planted_cases(ray_session, tmp_path):
    sf = _docs_dir(
        tmp_path,
        [
            (1, "a a a a"),          # one word repeated
            (2, "a b c d"),          # all distinct
            (3, "x"),                # single word: no bigrams
            (4, ""),                 # empty: split -> [""]
            (5, "p q p q p q"),      # alternating pair
        ],
    )
    out = (
        q_doc_repetition(sf)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "dup_word_frac"] == 0.75
    assert out.loc[1, "top_word_frac"] == 1.0
    assert out.loc[1, "top_bigram_frac"] == 1.0  # "a a" x3 of 3
    assert out.loc[2, "dup_word_frac"] == 0.0
    assert out.loc[2, "top_word_frac"] == 0.25
    assert out.loc[2, "top_bigram_frac"] == 0.333333  # 1 of 3, 6dp
    assert out.loc[3, "top_bigram_frac"] == 0.0
    assert out.loc[4, "dup_word_frac"] == 0.0 and out.loc[4, "top_word_frac"] == 1.0
    # "p q": 3 of 5 bigrams; dup: 2 distinct of 6
    assert out.loc[5, "top_bigram_frac"] == 0.6
    assert out.loc[5, "dup_word_frac"] == round(1 - 2 / 6, 6)


def test_token_budget_boundary_and_order(ray_session, tmp_path):
    # quality is the n_chars length score: longer text (below 500 chars)
    # scores higher, so doc order by quality desc is text-length desc
    rows = [
        (10, "w " * 199 + "w"),  # 200 tokens, 401 chars -> best
        (11, "v " * 149 + "v"),  # 150 tokens
        (12, "u " * 99 + "u"),   # 100 tokens
        (13, "t " * 49 + "t"),   # 50 tokens
    ]
    sf = _docs_dir(tmp_path, rows)
    # budget hits exactly after doc 11: 200 + 150 = 350
    out = q_corpus_token_budget(sf, budget=350).to_pandas()
    assert list(out["doc_id"]) == [10, 11]
    assert list(out["cum_tokens"]) == [200, 350]  # inclusive boundary
    # one token less excludes doc 11 entirely (no partial documents)
    out = q_corpus_token_budget(sf, budget=349).to_pandas()
    assert list(out["doc_id"]) == [10]
    # budget smaller than the best doc -> empty, with a stable schema
    # (assert on the Dataset schema: Ray 2.49's to_pandas drops columns
    # for ANY empty dataset regardless of its schema)
    ds = q_corpus_token_budget(sf, budget=10)
    assert ds.schema().names == ["doc_id", "quality_score", "n_tokens", "cum_tokens"]
    assert ds.count() == 0


def test_token_budget_tie_break_by_doc_id(ray_session, tmp_path):
    # equal-length texts -> equal quality; selection must break ties by
    # doc_id ascending exactly like the SQL ORDER BY
    rows = [(7, "a b c"), (3, "d e f"), (5, "g h i")]
    sf = _docs_dir(tmp_path, rows)
    out = q_corpus_token_budget(sf, budget=6).to_pandas()
    assert list(out["doc_id"]) == [3, 5]


def test_lm_score_planted(ray_session, tmp_path):
    # corpus: "a" x3, "b" x1 -> p(a)=3/4, p(b)=1/4
    sf = _docs_dir(tmp_path, [(1, "a a a"), (2, "b")])
    out = (
        q_doc_lm_score(sf).to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[1, "lm_score"] == round(float(np.log(0.75)), 6)
    assert out.loc[2, "lm_score"] == round(float(np.log(0.25)), 6)


def test_lm_score_join_path_equals_broadcast(ray_session):
    a = (
        q_doc_lm_score(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        q_doc_lm_score(SF, broadcast_max=0)  # force the bucketed-join path
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_dup_spans_planted(ray_session, tmp_path):
    """Cross-doc duplicated 5-gram fractions: shared span counts for both
    endpoint docs, a WITHIN-doc repeated gram does not (df is distinct
    docs), and docs shorter than 5 words are absent."""
    sf = _docs_dir(
        tmp_path,
        [
            (1, "v w x y z a b"),      # shares "v w x y z" with doc 2
            (2, "q v w x y z"),
            (3, "m n o p q r"),        # all grams unique
            (4, "a b c"),              # < 5 words: no gram positions
            (5, "s t u v w s t u v w s t u v w"),  # self-repeats only
        ],
    )
    out = q_doc_dup_spans(sf).to_pandas().set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2, 3, 5]  # doc 4 has no grams
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_dup_grams"] == 1
    assert out.loc[1, "dup_fraction"] == 0.333333
    assert out.loc[2, "n_grams"] == 2 and out.loc[2, "n_dup_grams"] == 1
    assert out.loc[3, "n_dup_grams"] == 0
    # doc 5's grams repeat inside the doc but appear in no OTHER doc
    assert out.loc[5, "n_grams"] == 11 and out.loc[5, "n_dup_grams"] == 0


@pytest.mark.parametrize("q", [q_doc_dup_spans, q_dup_span_trim])
def test_dup_span_distributed_equals_local(ray_session, q):
    """The sf fixtures are below the local-fast-path size cutoff, so the
    oracle gate only exercises the single-task plan — force the bucketed
    distributed plan here and require bit-identical output."""
    local = q(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    dist = (
        q(SF, num_buckets=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_dup_spans_matches_bruteforce_randomized(ray_session, tmp_path, seed):
    """Random small-vocab corpora (5-gram collisions arise naturally) vs
    an obvious pure-Python reference for BOTH the analysis fractions and
    the trimmed text."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(6)]
    rows = []
    for d in range(30):
        n = int(rng.integers(3, 25))
        rows.append((d, " ".join(rng.choice(vocab, size=n))))
    sf = _docs_dir(tmp_path, rows)
    k = 5

    # reference: gram -> set(docs) and positions per doc
    gram_docs, doc_grams = {}, {}
    for d, text in rows:
        ws = text.split(" ")
        doc_grams[d] = [
            (i, " ".join(ws[i : i + k])) for i in range(len(ws) - k + 1)
        ]
        for _, g in doc_grams[d]:
            gram_docs.setdefault(g, set()).add(d)

    spans = q_doc_dup_spans(sf).to_pandas().set_index("doc_id")
    trim = q_dup_span_trim(sf).to_pandas().set_index("doc_id")
    for d, text in rows:
        ws = text.split(" ")
        grams = doc_grams[d]
        if grams:
            nd = sum(1 for _, g in grams if len(gram_docs[g]) >= 2)
            assert spans.loc[d, "n_grams"] == len(grams)
            assert spans.loc[d, "n_dup_grams"] == nd
        else:
            assert d not in spans.index
        covered = set()
        for i, g in grams:
            if len(gram_docs[g]) >= 2 and min(gram_docs[g]) != d:
                covered.update(range(i, i + k))
        want_clean = " ".join(w for i, w in enumerate(ws) if i not in covered)
        assert trim.loc[d, "text_clean"] == want_clean
        assert trim.loc[d, "n_removed"] == len(covered)


def test_dup_span_trim_planted(ray_session, tmp_path):
    """ExactSubstr removal: the lowest-doc_id holder keeps its copy, other
    holders lose exactly the covered word positions; untouched and
    too-short docs come back identical; a full duplicate is emptied."""
    sf = _docs_dir(
        tmp_path,
        [
            (1, "v w x y z a b"),      # canonical holder of "v w x y z"
            (2, "q v w x y z"),        # loses the 5 covered words
            (3, "m n o p q r"),
            (4, "a b c"),              # < 5 words: no grams, unchanged
            (6, "v w x y z a b"),      # exact duplicate of doc 1: emptied
        ],
    )
    out = q_dup_span_trim(sf).to_pandas().set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2, 3, 4, 6]  # every doc appears
    assert out.loc[1, "n_removed"] == 0
    assert out.loc[1, "text_clean"] == "v w x y z a b"
    assert out.loc[2, "n_removed"] == 5
    assert out.loc[2, "text_clean"] == "q"
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[4, "n_removed"] == 0 and out.loc[4, "text_clean"] == "a b c"
    assert out.loc[6, "n_removed"] == 7 and out.loc[6, "text_clean"] == ""
    assert out.loc[6, "n_words"] == 7


@pytest.mark.parametrize(
    "name",
    [
        "doc_repetition",
        "corpus_token_budget",
        "doc_lm_score",
        "doc_dup_spans",
        "dup_span_trim",
        "doc_chunks",
    ],
)
def test_agrees_with_duckdb_oracle(ray_session, name):
    import nostr_data_pipeline_ray.pipelines.textops as tx

    got = tx.QUERIES[name](SF).to_pandas()
    key = [c for c in ("doc_id", "chunk_idx") if c in got.columns]
    got = got.sort_values(key).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(tx.ORACLE[name])
        .fetchdf()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        if got[c].dtype == object:  # string columns: exact equality
            assert got[c].tolist() == want[c].tolist(), c
        else:
            np.testing.assert_allclose(
                got[c].to_numpy(dtype=float), want[c].to_numpy(dtype=float),
                rtol=0, atol=0, err_msg=c,
            )


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_token_budget_matches_pandas_reference_randomized(ray_session, tmp_path, seed):
    """The distributed ordered prefix-sum must agree with the obvious
    single-process reference (sort + cumsum + filter) on random corpora —
    including duplicate quality scores and budgets landing mid-corpus."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(20, 120))
    rows = []
    for i in range(n):
        # draw few distinct word counts so quality ties are common
        k = int(rng.choice([3, 10, 25, 60, 110]))
        rows.append((1000 + i, " ".join(f"w{j}" for j in range(k))))
    sf = _docs_dir(tmp_path, rows)

    ref = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
            "n_tokens": [len(r[1].split(" ")) for r in rows],
        }
    )
    nch = ref["n_chars"].to_numpy(dtype=float)
    ls = np.where(
        nch < 50, nch / 50.0 * 50.0,
        np.where(nch <= 500, 50.0 + (nch - 50.0) / 450.0 * 50.0,
                 100.0 - np.minimum(50.0, (nch - 500.0) / 100.0)),
    )
    ref["quality_score"] = np.floor(ls * 0.3 * 100.0 + 0.5) / 100.0
    ref = ref.sort_values(
        ["quality_score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    ref["cum_tokens"] = ref["n_tokens"].cumsum()
    budget = int(ref["cum_tokens"].iloc[int(rng.integers(0, n))])
    want = ref[ref["cum_tokens"] <= budget][
        ["doc_id", "quality_score", "n_tokens", "cum_tokens"]
    ].reset_index(drop=True)

    got = q_corpus_token_budget(sf, budget=budget).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(want.dtypes.to_dict()), want
    )


# ---------------------------------------------------------------------------
# doc_chunks — properties SQL doesn't pin
# ---------------------------------------------------------------------------


def _chunks_df(sf, **kw):
    from nostr_data_pipeline_ray.pipelines.textops import doc_chunks

    return (
        doc_chunks(sf, **kw)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def test_doc_chunks_covers_and_reconstructs(ray_session, tmp_path):
    """Every word appears in at least one chunk, chunk boundaries follow
    (window, stride) exactly, and stitching the stride-prefix of each
    chunk plus the full last chunk's tail reproduces the document."""
    rows = [
        (1, ""),                                   # 1 empty word -> 1 chunk
        (2, "a"),
        (3, " ".join(f"w{i}" for i in range(16))),  # n == W -> 1 chunk
        (4, " ".join(f"w{i}" for i in range(17))),  # n == W+1 -> 2 chunks
        (5, " ".join(f"w{i}" for i in range(100))),
    ]
    sf = _docs_dir(tmp_path, rows)
    got = _chunks_df(sf, window=16, stride=12)
    by_doc = dict(iter(got.groupby("doc_id")))
    assert len(by_doc[1]) == 1 and by_doc[1]["chunk_text"].iloc[0] == ""
    assert len(by_doc[3]) == 1 and by_doc[3]["n_words"].iloc[0] == 16
    assert len(by_doc[4]) == 2 and by_doc[4]["n_words"].tolist() == [16, 5]
    for doc_id, text in rows:
        words = text.split(" ")
        part = by_doc[doc_id]
        # coverage + exact window content per chunk
        for _, r in part.iterrows():
            s = int(r["chunk_idx"]) * 12
            assert r["chunk_text"] == " ".join(words[s : s + 16])
        # reconstruction: stride-prefixes + last chunk tail == document
        stitched = []
        for _, r in part.iterrows():
            stitched.extend(r["chunk_text"].split(" ")[:12])
        last = part.iloc[-1]["chunk_text"].split(" ")
        stitched.extend(last[12:])
        assert stitched == words, doc_id


def test_doc_chunks_null_text_yields_no_chunks(ray_session, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["x y", None], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = _chunks_df(str(d))
    assert got["doc_id"].tolist() == [1]


def test_doc_chunks_rejects_bad_params(ray_session):
    from nostr_data_pipeline_ray.pipelines.textops import doc_chunks

    for kw in ({"stride": 0}, {"window": 0}, {"window": 8, "stride": 9}):
        with pytest.raises(ValueError):
            doc_chunks(SF, **kw)
