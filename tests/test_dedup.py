"""Dedup/similarity pipelines: oracle checks for the exact variants,
behavioral checks for the approximate (LSH) scale paths."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import nostr_data_pipeline_ray.pipelines.dedup as dd

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = con.execute(sql).df()
    con.close()
    return out


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(dd.ORACLE))
def test_exact_pair_queries_match_oracle(name):
    got = dd.QUERIES[name](SF_DIR)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = _oracle(dd.ORACLE[name])
    g, w = _normalize(got), _normalize(want)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)


@pytest.fixture()
def neardup_dir(tmp_path):
    """A documents table with a planted near-duplicate pair and noise."""
    base = (
        "the quick brown fox jumps over the lazy dog while the merge job "
        "streams arrow batches through the object store with backpressure "
        "and spills to disk when memory runs low in the cluster"
    )
    near = base.replace("lazy dog", "sleepy dog")  # one shingle region differs
    rng = np.random.default_rng(5)
    vocab = base.split()
    noise = [
        " ".join(rng.choice(vocab, size=40, replace=True)) for _ in range(30)
    ]
    texts = [base, near, *noise]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_minhash_finds_planted_neardup(neardup_dir):
    out = dd.q_minhash_near_dup(neardup_dir, threshold=0.5)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out.to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs
    jac = dict(zip(zip(out["doc_a"], out["doc_b"]), out["jaccard"]))
    assert 0.5 <= jac[(0, 1)] < 1.0
    # no duplicate pairs survive the distributed dedup
    assert len(pairs) == len(out)


def test_jaccard_max_df_caps_hot_words(tmp_path):
    """The inverted-index scale guard: words with document frequency above
    max_df are dropped BEFORE pairing (quadratic fan-out), matching a
    DuckDB mirror with the same HAVING cap bit-for-bit."""
    texts = [
        "the quick brown fox",
        "the quick brown dog",
        "the slow green turtle",
        "the slow green snail",
        "the lonely word",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    max_df = 4  # "the" appears in all 5 docs → capped out of the index
    got = dd._jaccard_topk(str(tmp_path), dd._explode_words, max_df=max_df)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(f"""
        WITH dw AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM dw GROUP BY doc_id
        ), keep AS (
            SELECT word FROM dw GROUP BY word HAVING count(*) <= {max_df}
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM dw a JOIN dw b USING (word)
            WHERE a.doc_id < b.doc_id AND word IN (SELECT word FROM keep)
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50
    """).df()
    con.close()
    g, w = _normalize(got), _normalize(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 1) in pairs and (2, 3) in pairs
    # doc 4 shares ONLY the capped word with others → no pair survives
    assert not any(4 in p for p in pairs)


def test_simhash_determinism_and_similarity(neardup_dir):
    out = dd.q_simhash_documents(neardup_dir).to_pandas().set_index("doc_id")
    h0 = np.uint64(out.loc[0, "simhash"])
    h1 = np.uint64(out.loc[1, "simhash"])
    hamming = bin(int(h0 ^ h1)).count("1")
    assert hamming <= 12  # near-dup texts agree on most bits
    # identical text → identical simhash (deterministic across actors)
    again = dd.q_simhash_documents(neardup_dir).to_pandas().set_index("doc_id")
    assert np.uint64(again.loc[0, "simhash"]) == h0


def test_ann_lsh_mechanics_on_uniform_data():
    from nostr_data_pipeline_ray.pipelines.analytics import q_ann_topk

    exact = q_ann_topk(SF_DIR).to_pandas()
    approx = dd.q_ann_topk_lsh(SF_DIR).to_pandas()
    # every approx score is a true cosine (bounded by the exact max); on
    # near-uniform vectors LSH recall is inherently low, so only mechanics
    # are asserted here — recall is asserted on planted data below
    assert len(approx) <= 10
    assert approx["score"].max() <= exact["score"].max() + 1e-9


def test_ann_lsh_recall_on_planted(tmp_path):
    import pyarrow.parquet as pqq

    rng = np.random.default_rng(3)
    dim, n_noise, n_plant = 64, 480, 10
    q = rng.standard_normal(dim)
    planted = q[None, :] + 0.05 * rng.standard_normal((n_plant, dim))  # cos≈0.999
    noise = rng.standard_normal((n_noise, dim))
    mat = np.vstack([q, planted, noise]).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(mat), pa.int32()),
        }
    )
    pqq.write_table(t, tmp_path / "embeddings.parquet")
    approx = dd.q_ann_topk_lsh(str(tmp_path)).to_pandas()
    # the planted near-neighbors (ids 1..10) dominate the approximate top-10
    hits = set(approx["vec_id"]) & set(range(1, n_plant + 1))
    assert len(hits) >= 8


def test_embedding_lsh_pair_mining_on_planted(tmp_path):
    """The 100-TB pair-mining path: finds planted near-dup pairs via sign-LSH
    buckets without ever broadcasting the full matrix."""
    import pyarrow.parquet as pqq

    rng = np.random.default_rng(21)
    dim, n_noise = 64, 400
    base = rng.standard_normal((5, dim))
    # 5 planted near-dup pairs: (i, i+5) at cosine ≈ 0.999
    dups = base + 0.02 * rng.standard_normal((5, dim))
    noise = rng.standard_normal((n_noise, dim))
    mat = np.vstack([base, dups, noise]).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(mat), pa.int32()),
        }
    )
    pqq.write_table(t, tmp_path / "embeddings.parquet")
    out = dd.q_embedding_near_dup_lsh(str(tmp_path), threshold=0.9).to_pandas()
    pairs = set(zip(out["vec_a"], out["vec_b"]))
    planted = {(i, i + 5) for i in range(5)}
    assert len(pairs & planted) >= 4  # near-full recall at cos≈0.999
    assert len(pairs) == len(out)  # cross-table dedup holds
    assert (out["score"] >= 0.9).all()


def test_ann_ivf_recall_on_planted(tmp_path):
    import pyarrow.parquet as pqq

    rng = np.random.default_rng(9)
    dim, n_noise, n_plant = 64, 480, 10
    q = rng.standard_normal(dim)
    planted = q[None, :] + 0.05 * rng.standard_normal((n_plant, dim))
    noise = rng.standard_normal((n_noise, dim))
    mat = np.vstack([q, planted, noise]).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(mat), pa.int32()),
        }
    )
    pqq.write_table(t, tmp_path / "embeddings.parquet")
    approx = dd.q_ann_topk_ivf(str(tmp_path)).to_pandas()
    # the planted cluster shares the query's inverted list → near-full recall
    hits = set(approx["vec_id"]) & set(range(1, n_plant + 1))
    assert len(hits) >= 8


def test_multimodal_plumbing():
    out = dd.q_multimodal_features(SF_DIR).to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"doc_id", "n_bytes", "crc32", "feat"}
    assert (out["n_bytes"] > 0).all()
    assert all(len(f) == 4 for f in out["feat"])
    with pytest.raises(NotImplementedError):
        dd.decode_image(b"\x89PNG")


def test_contamination_flags_planted(tmp_path):
    """Docs >= 20 sharing a 5-gram window with any doc < 20 (the benchmark
    stand-in) are flagged with the exact distinct-gram overlap count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.dedup import q_contamination_flags

    bench = "alpha beta gamma delta epsilon zeta eta theta"
    rows = {
        0: bench,                                   # benchmark
        1: "one two three four five six",           # benchmark
        20: bench + " extra tail words here",       # 4 shared 5-grams
        21: "alpha beta gamma delta epsilon",       # 1 shared 5-gram
        22: "totally different content with no overlap at all",
        23: "one two three four",                   # too short for a 5-gram
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(rows), pa.int64()),
            "text": pa.array(list(rows.values()), pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["t"] * len(rows)),
            "n_chars": pa.array([len(v) for v in rows.values()], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        q_contamination_flags(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")["n_shared"]
        .to_dict()
    )
    assert got == {20: 4, 21: 1}


def test_endpoint_verify_raises_on_missing_feature():
    """A candidate endpoint with no row in the feats stream used to verify
    as an empty set (similarity 0 → pair silently dropped); the contract
    violation must now fail loudly (ADVICE r3)."""
    import ray.data as rd

    pairs = rd.from_pandas(pd.DataFrame({"doc_a": [1], "doc_b": [2]}))
    feats = rd.from_pandas(
        pd.DataFrame({"k": [1], "feat": ["a b c"]})  # endpoint 2 missing
    )
    with pytest.raises(Exception) as ei:
        out = dd._endpoint_verify(
            pairs, feats, "doc_a", "doc_b", lambda m: m, input_bytes=1 << 20
        )
        if not isinstance(out, pd.DataFrame):
            out.materialize()
    assert "no feature row" in str(ei.value)
