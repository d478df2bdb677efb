"""TF-IDF / BM25 / fuzzy-match: path equivalence, planted cases, kernel pins.

The oracle contract (check_contract.py / the driver) pins the full queries
against DuckDB; these tests pin what the contract alone cannot — the
broadcast≡join path equivalence, hand-computed planted scores, and the
vectorized Levenshtein kernel against DuckDB's native implementation on
adversarial strings."""

import math
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.pipelines import fuzzy, relevance

SF = "/root/testdata/sf0.001"


def _mini_corpus(docs: list[str]) -> str:
    d = tempfile.mkdtemp(prefix="relevance_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(docs) + 1), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def test_tfidf_broadcast_equals_join_path(ray_session):
    a = relevance.doc_tfidf_top_terms(SF).to_pandas()
    b = relevance.doc_tfidf_top_terms(SF, broadcast_max=0).to_pandas()
    key = lambda df: df.sort_values(  # noqa: E731
        ["doc_id", "rank"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b), check_dtype=False)


def test_tfidf_planted_scores(ray_session):
    # d1: a appears twice (df 2), b once (df 1 → most characteristic)
    # d3: c c c (df 2) vs d once (df 1)
    d = _mini_corpus(["a a b", "a c", "c c c d"])
    got = (
        relevance.doc_tfidf_top_terms(d)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    ln = math.log
    r6 = lambda v: round(v, 6)  # noqa: E731 — all planted values are clean
    # doc 1: b = 1·ln(3/1) > a = 2·ln(3/2)
    d1 = got[got["doc_id"] == 1]
    assert list(d1["word"]) == ["b", "a"]
    assert d1["tfidf"].tolist() == [r6(ln(3.0)), r6(2 * ln(1.5))]
    assert d1["rank"].tolist() == [1, 2]
    # doc 3: c = 3·ln(3/2) > d = 1·ln(3/1)
    d3 = got[got["doc_id"] == 3]
    assert list(d3["word"]) == ["c", "d"]
    # doc 2: a and c tie at 1·ln(3/2) → word ASC breaks the tie
    d2 = got[got["doc_id"] == 2]
    assert list(d2["word"]) == ["a", "c"]
    assert d2["tfidf"].nunique() == 1


def test_bm25_returns_only_matching_docs_descending(ray_session):
    got = relevance.bm25_search(SF).to_pandas()
    assert len(got) == relevance.BM25_TOP
    s = got["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()
    assert (s > 0).all()
    # every returned doc really contains a query term
    docs = pq.read_table(
        os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas().set_index("doc_id")
    for doc_id in got["doc_id"]:
        words = set(docs.loc[doc_id, "text"].split(" "))
        assert words & set(relevance.BM25_TERMS)


def test_bm25_planted_ordering(ray_session):
    # same length docs: more query-term hits → higher score; a doc with
    # no query terms is absent entirely
    d = _mini_corpus(
        ["merge merge filter x", "merge y z w", "a b c d", "merge filter column q"]
    )
    got = relevance.bm25_search(d).to_pandas()
    assert 3 not in set(got["doc_id"])
    ranks = {r.doc_id: i for i, r in enumerate(got.itertuples())}
    assert ranks[4] < ranks[2]  # three distinct terms beat one
    assert ranks[1] < ranks[2]  # two merge hits + filter beat one merge


def test_levenshtein_kernel_matches_duckdb_exhaustively(ray_session):
    import duckdb

    rng = np.random.default_rng(7)
    alphabet = list("abcde fg")
    strs = np.array(
        ["", "a", "gold bolt", "bbolt gold", "x" * 40, "smal rig", "ring small"]
        + ["".join(rng.choice(alphabet, size=rng.integers(0, 14))) for _ in range(80)],
        dtype=object,
    )
    con = duckdb.connect()
    for pattern in list(fuzzy.CANON) + ["", "zzz", "gold", "a" * 25]:
        mine = fuzzy.levenshtein_many(pattern, strs)
        want = np.array(
            [con.execute("SELECT levenshtein(?, ?)", [pattern, str(s)]).fetchone()[0]
             for s in strs]
        )
        assert (mine == want).all(), (pattern, strs[mine != want][:5])


def test_fuzzy_planted_distances(ray_session):
    d = tempfile.mkdtemp(prefix="fuzzy_")
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "p_name": pa.array(
                    ["old bolt", "cold bolt", "red widget", "small ring", "blue gear"],
                    pa.string(),
                ),
            }
        ),
        os.path.join(d, "part.parquet"),
    )
    got = (
        fuzzy.fuzzy_part_match(d)
        .to_pandas()
        .sort_values(["p_partkey", "canonical"])
        .reset_index(drop=True)
    )
    want = {
        (1, "gold bolt"): 1,   # old bolt  (insert g)
        (2, "gold bolt"): 1,   # cold bolt (substitute c→g)
        (3, "red widge"): 1,   # red widget (delete t)
        (4, "small rig"): 1,   # small ring (delete n)
    }
    assert {(r.p_partkey, r.canonical): r.dist for r in got.itertuples()} == want


def test_tfidf_rank_never_exceeds_k_and_covers_corpus(ray_session):
    got = relevance.doc_tfidf_top_terms(SF).to_pandas()
    assert got["rank"].between(1, relevance.TOP_TERMS_K).all()
    n_docs = pq.read_metadata(os.path.join(SF, "documents.parquet")).num_rows
    assert got["doc_id"].nunique() == n_docs
    # within a doc, ranks are 1..m with strictly the oracle's ordering
    per = got.groupby("doc_id")["rank"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()


def test_skew_kurtosis_single_and_degenerate_groups(ray_session):
    import nostr_data_pipeline_ray.pipelines.analytics as an

    d = tempfile.mkdtemp(prefix="skew_")
    pq.write_table(
        pa.table(
            {
                # A: varied (n=5) | B: constant (a == 0) | C: n=3 (kurt NULL)
                "l_returnflag": pa.array(list("AAAAA") + list("BBBB") + list("CCC")),
                "l_quantity": pa.array(
                    [1.0, 2, 3, 4, 10] + [7.0] * 4 + [1.0, 2, 9], pa.float64()
                ),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    got = (
        an.q_quantity_skew_kurtosis(d).to_pandas().set_index("l_returnflag")
    )
    import duckdb

    want = duckdb.connect().execute(
        "SELECT skewness(x), kurtosis(x) FROM (VALUES (1.0),(2),(3),(4),(10)) t(x)"
    ).fetchone()
    assert got.loc["A", "skew_qty"] == pytest.approx(want[0], abs=5e-7)
    assert got.loc["A", "kurt_qty"] == pytest.approx(want[1], abs=5e-7)
    assert pd.isna(got.loc["B", "skew_qty"]) and pd.isna(got.loc["B", "kurt_qty"])
    assert not pd.isna(got.loc["C", "skew_qty"]) and pd.isna(got.loc["C", "kurt_qty"])


def test_entropy_formula_matches_duckdb_builtin(ray_session):
    """The fixed-order per-type entropy must agree with DuckDB's native
    entropy(event_type) (which is log2-based) to fp precision — the
    contract pins the mirrored-SQL path; this pins the FORMULA."""
    import duckdb

    import nostr_data_pipeline_ray.pipelines.analytics as an

    got = an.q_user_event_entropy(SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).set_index(
        "user_id"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'events.parquet')}')"
    )
    want = con.execute(
        "SELECT user_id, entropy(event_type) AS e FROM events GROUP BY user_id"
    ).df().set_index("user_id")
    for uid in got.index:
        assert got.loc[uid, "entropy_bits"] == pytest.approx(
            want.loc[uid, "e"], abs=5e-7
        )


def test_dense_timeline_fills_planted_gap(ray_session):
    import nostr_data_pipeline_ray.pipelines.analytics as an

    d = tempfile.mkdtemp(prefix="dense_")
    ts = pd.to_datetime(
        ["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 03:20"]
    ).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts),
                "event_type": pa.array(["view", "click", "view"], pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = an.q_activity_timeline_dense(d)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    # spine: 4 hours (00..03) × 2 types = 8 cells, 5 of them zero-filled
    assert len(got) == 8
    assert int((got["n_events"] == 0).sum()) == 5
    assert int(got["n_events"].sum()) == 3
    g = got.set_index(["window_start", "event_type"])["n_events"]
    h0 = pd.Timestamp("2024-01-01 00:00").as_unit("us")
    h1 = pd.Timestamp("2024-01-01 01:00").as_unit("us")
    assert g.loc[(h0, "view")] == 1 and g.loc[(h0, "click")] == 1
    assert g.loc[(h1, "view")] == 0 and g.loc[(h1, "click")] == 0


def test_weighted_sample_biases_toward_heavy_docs(ray_session):
    """A-Res property: with weights 50 vs 1 and k = n/4, the heavy half
    dominates the sample; same seed is reproducible; zero/negative
    weights fail loudly."""
    import nostr_data_pipeline_ray.pipelines.analytics as an

    d = tempfile.mkdtemp(prefix="wsample_")
    n = 400
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                # even ids heavy (50), odd light (1)
                "n_chars": pa.array(
                    [50 if i % 2 == 0 else 1 for i in range(n)], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = an.q_weighted_sample_docs(d, k=100).to_pandas()
    heavy = (got["doc_id"] % 2 == 0).mean()
    assert heavy > 0.85  # expected ~0.98 at 50:1 odds; 0.85 is 5σ-safe
    again = an.q_weighted_sample_docs(d, k=100).to_pandas()
    pd.testing.assert_frame_equal(got, again)
    other = an.q_weighted_sample_docs(d, k=100, seed=99).to_pandas()
    assert set(other["doc_id"]) != set(got["doc_id"])

    bad = tempfile.mkdtemp(prefix="wsample_bad_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "n_chars": pa.array([10, 0], pa.int64()),
            }
        ),
        os.path.join(bad, "documents.parquet"),
    )
    with pytest.raises(Exception, match="non-positive weight"):
        an.q_weighted_sample_docs(bad, k=1).to_pandas()


def test_funnel_30min_boundary_and_forced_distributed(ray_session):
    """Planted attribution boundary: a view EXACTLY 30 minutes before the
    purchase converts (BETWEEN is inclusive); 30 minutes + 1 µs does not;
    a view AFTER the purchase never does. Forced multi-bucket exchange
    must agree with the local path."""
    import nostr_data_pipeline_ray.pipelines.analytics as an

    d = tempfile.mkdtemp(prefix="funnel_")
    t = pd.Timestamp("2024-03-01 12:00:00").as_unit("us")
    half_hour = pd.Timedelta(minutes=30)
    us = pd.Timedelta(microseconds=1)
    rows = [
        # u1: view exactly 30 min before → converts
        (1, t - half_hour, "view"), (1, t, "purchase"),
        # u2: view 30 min + 1 µs before → does NOT convert
        (2, t - half_hour - us, "view"), (2, t, "purchase"),
        # u3: view AFTER the purchase → does not convert
        (3, t + us, "view"), (3, t, "purchase"),
        # u4: view at the same instant → converts (BETWEEN upper bound)
        (4, t, "view"), (4, t, "purchase"),
        # u5: two purchases, one attributable view between them
        (5, t, "view"), (5, t + us, "purchase"), (5, t + half_hour + 2 * us, "purchase"),
        # u6: views only — absent from the output
        (6, t, "view"),
    ]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows]),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    for nb in (None, 7):
        got = an.q_purchase_conversions(d, num_buckets=nb)
        got = (got.to_pandas() if hasattr(got, "to_pandas") else got).set_index(
            "user_id"
        ).sort_index()
        assert 6 not in got.index
        assert got.loc[1].tolist() == [1, 1]
        assert got.loc[2].tolist() == [1, 0]
        assert got.loc[3].tolist() == [1, 0]
        assert got.loc[4].tolist() == [1, 1]
        assert got.loc[5].tolist() == [2, 1]


def test_source_tfidf_grouped_symmetry(ray_session):
    """Planted: words shared by every source score 0 (ln N/N); a word
    unique to one source ranks first for it regardless of a shared word's
    higher raw count."""
    from nostr_data_pipeline_ray.pipelines import relevance as rv

    d = tempfile.mkdtemp(prefix="srctfidf_")
    pq.write_table(
        pa.table(
            {
                "source": pa.array(["s1", "s1", "s2", "s3"], pa.string()),
                "text": pa.array(
                    ["shared shared rare", "shared", "shared common",
                     "shared common"],
                    pa.string(),
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = (
        rv.source_tfidf_top_terms(d)
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    s1 = got[got["source"] == "s1"]
    # rare (df 1, tf 1) beats shared (df 3 → idf 0, tf 3)
    assert s1.iloc[0]["word"] == "rare"
    assert s1.iloc[0]["tfidf"] == round(math.log(3.0), 6)
    shared = got[got["word"] == "shared"]
    assert (shared["tfidf"] == 0.0).all()  # present in every source
    # common appears in s2+s3 only: tfidf = 1·ln(3/2) for each
    common = got[got["word"] == "common"]
    assert sorted(common["source"]) == ["s2", "s3"]
    assert (common["tfidf"] == round(math.log(1.5), 6)).all()


def test_zscore_degenerate_and_moments(ray_session):
    """Constant group → NULL z for every row; varied group normalizes to
    sample mean 0 / stddev 1 (over the rounded values, loose tolerance)."""
    import nostr_data_pipeline_ray.pipelines.analytics as an

    d = tempfile.mkdtemp(prefix="zscore_")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(10), pa.int64()),
                "l_linenumber": pa.array([1] * 10, pa.int64()),
                "l_returnflag": pa.array(list("AAAAAA") + list("BBBB")),
                "l_quantity": pa.array(
                    [1.0, 2, 3, 4, 5, 9] + [7.0] * 4, pa.float64()
                ),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    got = an.q_quantity_zscore(d)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    a = got[got["l_returnflag"] == "A"]["z_qty"]
    b = got[got["l_returnflag"] == "B"]["z_qty"]
    assert b.isna().all()  # zero variance → NULL, matching the oracle CASE
    assert abs(a.mean()) < 1e-6
    assert abs(a.std(ddof=1) - 1.0) < 1e-5


def test_relevance_null_text_matches_oracle_semantics(ray_session):
    """NULL text drops the document on BOTH sides (the oracle's unnest of
    string_split(NULL) yields no rows): scores, df, n and avglen must be
    identical to DuckDB on a corpus WITH a NULL — the divergence class the
    fixtures can't catch."""
    import duckdb

    d = tempfile.mkdtemp(prefix="nulltext_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    ["merge filter a", None, "merge b", "column c merge"],
                    pa.string(),
                ),
                "source": pa.array(["s1", "s1", "s2", "s2"], pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'documents.parquet')}')"
    )
    norm = lambda df: df[sorted(df.columns)].sort_values(  # noqa: E731
        by=sorted(df.columns), kind="mergesort"
    ).reset_index(drop=True)
    for name, fn in relevance.QUERIES.items():
        got = fn(d)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        want = con.execute(relevance.ORACLE[name]).df()
        pd.testing.assert_frame_equal(
            norm(got), norm(want), check_dtype=False, check_exact=True
        )
        assert 2 not in set(got.get("doc_id", []))  # the NULL doc never scores


def test_write_shards_completes_empty_shards(ray_session, tmp_path):
    """More shards than documents can fill: every shard file exists (empty
    parquet with the full schema), the manifest has exactly n_shards rows,
    and a resume run skips all of them."""
    import glob

    from nostr_data_pipeline_ray.pipelines import shards

    d = _mini_corpus(["a", "b", "c", "d", "e"])  # 5 docs, 64 shards
    out = str(tmp_path / "many")
    manifest = shards.write_shards(d, out, n_shards=64)
    assert len(manifest) == 64
    files = sorted(glob.glob(os.path.join(out, "shard-*.parquet")))
    assert len(files) == 64
    assert int(manifest["n_docs"].sum()) == 5
    empties = manifest[manifest["n_docs"] == 0]
    assert len(empties) >= 59
    t = pq.read_table(empties.iloc[0]["path"])
    assert t.num_rows == 0
    assert t.schema.names == ["doc_id", "text", "shard", "pos"]
    again = shards.write_shards(d, out, n_shards=64)
    assert again["skipped"].all()


def test_new_module_queries_forced_distributed(ray_session, monkeypatch):
    """The relevance / fuzzy / shards queries under a forced multi-bucket
    exchange (LOCAL_MAX_INPUT_BYTES=0) must still match their DuckDB
    oracles — the sf0.001 fixtures otherwise take the local fast path."""
    import duckdb

    from nostr_data_pipeline_ray.pipelines import shards
    from nostr_data_pipeline_ray.stages import shuffle as sh

    monkeypatch.setattr(sh, "LOCAL_MAX_INPUT_BYTES", 0)
    con = duckdb.connect()
    for t in ("documents", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )
    norm = lambda df: df[sorted(df.columns)].sort_values(  # noqa: E731
        by=sorted(df.columns), kind="mergesort"
    ).reset_index(drop=True)
    cases = {**relevance.QUERIES, **fuzzy.QUERIES, **shards.QUERIES}
    oracles = {**relevance.ORACLE, **fuzzy.ORACLE, **shards.ORACLE}
    for name, fn in cases.items():
        got = fn(SF)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        want = con.execute(oracles[name]).df()
        pd.testing.assert_frame_equal(
            norm(got), norm(want), check_dtype=False, check_exact=True
        )


def test_collocations_planted_pmi(ray_session):
    """A pair that ALWAYS co-occurs gets the maximal PMI; a pair that
    co-occurs at chance gets ~0; counts below min_count are excluded."""
    from nostr_data_pipeline_ray.pipelines import textops as tx

    # "new york" always adjacent (6 times); "a b" co-occur but a/b are
    # everywhere; "rare gem" appears 3 times (< min_count 5) → excluded
    docs = ["new york a b"] * 6 + ["a b rare gem"] * 3 + ["b a"] * 3
    d = _mini_corpus(docs)
    got = tx.q_corpus_collocations(d, min_count=5).to_pandas()
    pairs = {(r.w1, r.w2): r.pmi for r in got.itertuples()}
    assert ("new", "york") in pairs
    assert ("rare", "gem") not in pairs  # under min_count
    # exclusive pair beats the promiscuous one
    assert pairs[("new", "york")] == max(pairs.values())
    # PMI of the exclusive pair: ln((6/B)/((6/T)*(6/T))) with
    # T = 6*4 + 3*4 + 3*2 = 42 tokens, B = 6*3 + 3*3 + 3*1 = 30 bigrams
    want = round(math.log((6 / 30.0) / ((6 / 42.0) * (6 / 42.0))), 6)
    assert pairs[("new", "york")] == want


def test_collocations_null_text_matches_oracle(ray_session):
    """NULL text must contribute zero tokens/bigrams on BOTH sides
    (string_split(NULL) unnests to zero rows) — a ''-coalesce on the Ray
    side would inflate the unigram total T and shift every PMI."""
    import duckdb

    from nostr_data_pipeline_ray.pipelines import textops as tx

    docs = ["new york a b"] * 6 + [None] * 4
    d = _mini_corpus(docs)
    got = (
        tx.q_corpus_collocations(d, min_count=5)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'documents.parquet')}')"
    )
    want = (
        con.execute(tx.ORACLE["corpus_collocations"])
        .df()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0  # the non-null pairs still score
