"""Analytics operators vs the DuckDB oracle — the same comparison the driver
makes (row count + sorted-column value equality), at sf0.001 for speed."""

import duckdb
import pandas as pd
import pytest

import nostr_data_pipeline_ray.pipelines.analytics as an

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = con.execute(sql).df()
    con.close()
    return out


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _ray_result(name: str) -> pd.DataFrame:
    res = getattr(an, f"q_{name}")(SF_DIR)
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", sorted(an.ORACLE))
def test_query_matches_oracle(name):
    got = _normalize(_ray_result(name))
    want = _normalize(_oracle(an.ORACLE[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_doc_lang_on_planted_multilingual(tmp_path):
    """The sf corpus is English-only, so the oracle check is vacuous there —
    plant zh/ja/ko/en/empty docs and assert engine == oracle with every
    branch exercised (Python char ranges vs DuckDB RE2 unicode classes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "the merge completed without conflicts",
        "数据管道正在运行",          # zh
        "データパイプライン です",    # ja (pure kana — kanji would hit zh first)
        "데이터 파이프라인이 실행",   # ko
        "",                           # empty → null
        "mixed 数据 english",        # zh chars win (checked first)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["x"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    got = an.q_doc_lang(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(an.ORACLE["doc_lang"]).df()
    con.close()
    pd.testing.assert_frame_equal(
        _normalize(got), _normalize(want), check_dtype=False, check_exact=True
    )
    by_id = dict(zip(got["doc_id"], got["lang_detected"]))
    assert [by_id[i] for i in range(4)] == ["en", "zh", "ja", "ko"]
    assert pd.isna(by_id[4]) and by_id[5] == "zh"


def test_doc_quality_full_on_planted_content(tmp_path):
    """Full F5: the sf corpus has no markup, so exercise media/hashtag
    branches on planted docs and match the oracle exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "short",                                            # length only
        "x" * 200 + " #a #b photo https://h.io/p.png",      # media + 2 tags
        "y" * 600 + " #a #b #c #d #e #f #g",                # long + 7 tags
        "",                                                 # empty
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
    got = an.q_doc_quality_full(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(an.ORACLE["doc_quality_full"]).df()
    con.close()
    pd.testing.assert_frame_equal(
        _normalize(got), _normalize(want), check_dtype=False, check_exact=True
    )
    by_id = dict(zip(got["doc_id"], got["quality_score"]))
    assert by_id[1] > by_id[0]  # media + hashtags reward
    assert by_id[3] == 0.0


def test_doc_extract_on_planted_content(tmp_path):
    """The synthetic corpus has no hashtags/URLs, so the sf-level oracle
    check is vacuous — plant real content and assert engine == oracle with
    NONZERO counts (the regexes must agree between Python re and RE2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "check #Ray and #ray plus #data at https://example.com/x?y=1 now",
        "photo https://img.host/pic.JPG#frag and clip https://v.host/a.mp4",
        "@alice told @bob and @alice about #MinHash",
        "plain text, no markup at all",
        "",
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

    got = an.q_doc_extract(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(an.ORACLE["doc_extract"]).df()
    con.close()
    pd.testing.assert_frame_equal(
        _normalize(got), _normalize(want), check_dtype=False, check_exact=True
    )
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "hashtag_count"] == 2  # #Ray/#ray dedup to one + #data
    assert by_id.loc[0, "url_count"] == 1
    assert bool(by_id.loc[1, "has_media"])  # .JPG case-insensitive + #frag
    assert by_id.loc[2, "mention_count"] == 3  # occurrences, not distinct
    assert by_id.loc[3, "hashtag_count"] == 0 and not bool(by_id.loc[3, "has_media"])


def test_semi_anti_join_right_multiplicity_never_duplicates():
    """left_semi/left_anti are existence probes: three matching right rows
    must yield exactly one left row (semi) / zero (anti), and left columns
    pass through unchanged."""
    import ray.data as rd

    from nostr_data_pipeline_ray.stages.joins import bucketed_hash_join

    left = rd.from_items(
        [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}]
    )
    right = rd.from_items([{"rk": 2}, {"rk": 2}, {"rk": 2}, {"rk": 9}])
    semi = bucketed_hash_join(
        left, right, left_on=["k"], right_on=["rk"], how="left_semi",
        num_buckets=2,
    ).to_pandas()
    assert semi.to_dict("records") == [{"k": 2, "v": "b"}]
    anti = bucketed_hash_join(
        left, right, left_on=["k"], right_on=["rk"], how="left_anti",
        num_buckets=2,
    ).to_pandas()
    assert sorted(anti["k"].tolist()) == [1, 3]
    assert list(semi.columns) == ["k", "v"] == list(anti.columns)


def test_samplers_deterministic_and_partition_invariant():
    """The id-hash samplers must return the SAME subset across reruns and
    across different block layouts — the property that makes a resumed or
    re-scaled 100-TB run reproduce its training subset."""
    a = _ray_result("stratified_sample").sort_values("event_id").reset_index(drop=True)
    b = _ray_result("stratified_sample").sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # stratum rates actually differ (purchase kept ~5x more than error)
    by_type = a.groupby("event_type").size()
    full = _oracle("SELECT event_type, count(*) AS n FROM events GROUP BY 1")
    full = dict(zip(full["event_type"], full["n"]))
    assert by_type["purchase"] / full["purchase"] > 3 * by_type["error"] / full["error"]

    g1 = _ray_result("sample_per_group").sort_values("event_id").reset_index(drop=True)
    # a genuinely different block layout must select the identical subset
    # (per-batch pruning only pre-selects; the exchange decides)
    import ray.data as rd

    from nostr_data_pipeline_ray.pipelines.analytics import sample_per_group

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    shuffled = (
        rd.read_parquet(f"{SF_DIR}/events.parquet", columns=cols)
        .repartition(13)
    )
    g2 = (
        sample_per_group(shuffled, k=200, input_bytes=1)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g1[sorted(g1.columns)], g2[sorted(g2.columns)])
    sizes = g1.groupby("event_type").size()
    for t, n in sizes.items():
        assert n == min(200, full[t])  # exactly k per stratum, capped by stratum size


def test_domain_mix_sample_exact_proportions():
    """The mixture sampler returns the LARGEST corpus hitting the target
    source proportions: quotas are floor(p_s * min(n_s / p_s)), selection
    is deterministic by id-hash, unlisted sources are dropped entirely."""
    import numpy as np

    from nostr_data_pipeline_ray.pipelines.analytics import (
        _MIX_WEIGHTS,
        q_domain_mix_sample,
    )

    got = (
        q_domain_mix_sample(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert set(got["source"]) <= set(_MIX_WEIGHTS)
    full = _oracle("SELECT source, count(*) AS n FROM documents GROUP BY 1")
    counts = dict(zip(full["source"], full["n"]))
    total = min(counts[s] / p for s, p in _MIX_WEIGHTS.items())
    sizes = got.groupby("source").size()
    for s, p in _MIX_WEIGHTS.items():
        assert sizes.get(s, 0) == int(np.floor(p * total))
    # rerun selects the identical subset (id-hash keyed, no RNG)
    again = (
        q_domain_mix_sample(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)
    # unknown mixture source fails loudly, not silently empty
    import pytest as _pytest

    with _pytest.raises(ValueError, match="absent"):
        q_domain_mix_sample(SF_DIR, weights={"no-such-source": 1.0}).to_pandas()


def test_domain_mix_matches_pandas_reference_randomized():
    """Quota math + id-hash selection against the obvious single-process
    reference over random corpora and random weights (5 seeds)."""
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.analytics import q_domain_mix_sample
    from nostr_data_pipeline_ray.stages.shuffle import id_hash

    for seed in range(5):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 300))
        srcs = [f"s{j}" for j in range(int(rng.integers(2, 6)))]
        doc_id = np.arange(n, dtype=np.int64) * 3 + 7  # non-dense ids
        source = rng.choice(srcs + ["unlisted"], size=n)
        w = rng.random(len(srcs))
        weights = dict(zip(srcs, (w / w.sum()).tolist()))
        # every weighted source must appear at least once
        for j, s in enumerate(srcs):
            source[j] = s

        with tempfile.TemporaryDirectory() as d:
            pq.write_table(
                pa.table({
                    "doc_id": pa.array(doc_id),
                    "text": pa.array(["t"] * n),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(source),
                    "n_chars": pa.array([1] * n, pa.int64()),
                }),
                f"{d}/documents.parquet",
            )
            got = (
                q_domain_mix_sample(d, weights=weights)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

        ref = pd.DataFrame({"doc_id": doc_id, "source": source})
        ref = ref[ref["source"].isin(weights)]
        counts = ref.groupby("source").size()
        total = min(counts[s] / p for s, p in weights.items())
        keep = []
        for s, p in weights.items():
            k = int(np.floor(p * total))
            grp = ref[ref["source"] == s].copy()
            grp["_h"] = id_hash(grp["doc_id"].to_numpy())
            keep.append(grp.sort_values(["_h", "doc_id"]).head(k)[["doc_id", "source"]])
        want = (
            pd.concat(keep).sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want), seed


# ---------------------------------------------------------------------------
# window-function family (W1-W4) — the per-bucket kernels sort/lag/cumsum
# INSIDE each bucket, so correctness rides on the partition key co-locating
# whole groups; the sf0.001 fixtures take the single-task local path, which
# the parametrized oracle test above already covers. Force the multi-bucket
# exchange here and re-check the same oracles.
# ---------------------------------------------------------------------------

_WINDOW_QUERIES = (
    "event_gaps", "rolling_daily_events", "cumulative_revenue",
    "order_price_ranks",
    # grouping-sets family shares the same bucket-co-location contract
    "activity_rollup", "activity_cube", "user_type_set_ops", "daily_type_pivot",
    "user_event_path", "user_sessions",
    # statistical aggregates share the same bucket-co-location contract
    "quantity_moments", "quantity_discount_corr", "quantity_mode",
    "order_price_ntile", "user_event_context", "quantity_discount_regression",
    # round-5 fourth-session members of the same contract: higher moments,
    # funnel range-counts, entropy pivot, gap-fill counts, two-pass z-score
    "quantity_skew_kurtosis", "purchase_conversions", "user_event_entropy",
    "activity_timeline_dense", "quantity_zscore",
    # round-5 fifth-session members: within-order pair mining and the
    # two-median MAD screen both need whole groups (order / brand) in one
    # bucket
    "basket_pairs", "price_mad_outliers", "basket_rules",
    "user_retention_cohorts", "daily_purchase_vs_signup",
    "regional_supplier_volume", "pricing_summary",
    "shipping_priority", "parts_above_brand_avg", "peak_concurrency",
)


@pytest.mark.parametrize("name", _WINDOW_QUERIES)
def test_window_distributed_path_matches_oracle(name, monkeypatch):
    from nostr_data_pipeline_ray.stages import shuffle as sh

    monkeypatch.setattr(sh, "LOCAL_MAX_INPUT_BYTES", 0)
    got = _normalize(_ray_result(name))
    want = _normalize(_oracle(an.ORACLE[name]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_event_gaps_planted_edges(tmp_path):
    """LAG edges the sf fixtures can't isolate: a single-event user emits no
    gap row at all; equal timestamps tie-break by event_id into a 0 gap; and
    the stats are exact integer microseconds underneath."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00", "2024-01-01 00:00:10",  # u1: 10s gap
            "2024-01-01 00:00:10",                          # u1: tie → 0 gap
            "2024-01-02 00:00:00",                          # u2: single event
        ]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(ts),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    got = an.q_event_gaps(str(tmp_path)).to_pandas()
    got = got.sort_values("user_id").reset_index(drop=True)
    want = pd.DataFrame(
        {
            "user_id": np.array([1], dtype="int64"),
            "n_gaps": np.array([2], dtype="int64"),
            "avg_gap_sec": [5.0],
            "max_gap_sec": [10.0],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_sessions_planted_edges(tmp_path):
    """Sessionization edges the sf fixtures can't isolate: a gap of EXACTLY
    30 minutes stays in-session (strict >), one microsecond over splits, a
    single-event user is one session of duration 0, and session_id
    restarts at 1 per user."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.Timestamp("2024-01-01 00:00:00")
    ts = pd.to_datetime(
        [
            base,                                           # u1 s1
            base + pd.Timedelta(minutes=30),                # u1 s1: ==30min stays
            base + pd.Timedelta(minutes=60, microseconds=1),  # u1 s2: 1us over
            base + pd.Timedelta(days=1),                    # u2: single event
        ]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(ts),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    got = an.q_user_sessions(str(tmp_path)).to_pandas()
    got = got.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    want = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2], dtype="int64"),
            "session_id": np.array([1, 2, 1], dtype="int64"),
            "session_start": ts[[0, 2, 3]],
            "session_end": ts[[1, 2, 3]],
            "n_events": np.array([2, 1, 1], dtype="int64"),
            "duration_sec": [1800.0, 0.0, 0.0],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ntile_planted_edges(tmp_path):
    """SQL NTILE semantics the sf fixtures can't isolate: a partition
    smaller than k numbers its rows 1..n; an uneven partition gives the
    FIRST (n mod k) tiles the extra row; ties take the o_orderkey order."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # month A: 6 rows → tiles 2,2,1,1 (first 6%4=2 tiles get ceil(6/4)=2)
    # month B: 3 rows (< k) → tiles 1,2,3; two share a price → key order
    dates = (["2024-01-15"] * 6) + (["2024-02-15"] * 3)
    prices = [60.0, 50.0, 40.0, 30.0, 20.0, 10.0, 9.0, 5.0, 5.0]
    t = pa.table(
        {
            "o_orderkey": pa.array(list(range(1, 10)), pa.int64()),
            "o_custkey": pa.array([1] * 9, pa.int64()),
            "o_orderdate": pa.array(
                np.array(dates, dtype="datetime64[us]")
            ),
            "o_totalprice": pa.array(prices, pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")

    got = an.q_order_price_ntile(str(tmp_path)).to_pandas()
    got = got.sort_values("o_orderkey").reset_index(drop=True)
    assert got["price_quartile"].tolist() == [1, 1, 2, 2, 3, 4, 1, 2, 3]


def test_quantity_moments_single_row_group(tmp_path):
    """var_samp/stddev_samp of a single-row group is NULL (SQL), mean is
    the value itself; a constant-valued group has zero variance and a
    well-defined sqrt."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "l_returnflag": pa.array(["A", "B", "B"], pa.string()),
            "l_linestatus": pa.array(["O", "O", "O"], pa.string()),
            "l_quantity": pa.array([7.0, 3.0, 3.0], pa.float64()),
            "l_discount": pa.array([0.05, 0.0, 0.0], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")

    got = an.q_quantity_moments(str(tmp_path)).to_pandas()
    got = got.sort_values("l_returnflag").reset_index(drop=True)
    a, b = got.iloc[0], got.iloc[1]
    assert a["n_rows"] == 1 and a["mean_qty"] == 7.0
    assert pd.isna(a["var_qty"]) and pd.isna(a["stddev_qty"])
    assert b["n_rows"] == 2 and b["mean_qty"] == 3.0
    assert b["var_qty"] == 0.0 and b["stddev_qty"] == 0.0

    # zero-variance correlation is NULL on both sides of the contract
    corr = an.q_quantity_discount_corr(str(tmp_path)).to_pandas()
    corr = corr.sort_values("l_returnflag").reset_index(drop=True)
    assert pd.isna(corr.iloc[0]["corr_qd"])  # single row
    assert pd.isna(corr.iloc[1]["corr_qd"])  # constant x and y


def test_activity_rollup_empty_table(tmp_path):
    """SQL ROLLUP on an empty table still returns its grand-total row
    (count 0, sum NULL); the zero-block pipeline can't produce it, so the
    query answers it from the parquet footer — pin that shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    got = an.q_activity_rollup(str(tmp_path))
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) == 1
    row = got.iloc[0]
    assert row["event_type"] is None and pd.isna(row["day"])
    assert row["n_events"] == 0 and pd.isna(row["total_value"])


def test_user_event_context_null_boundary_rows(tmp_path):
    """SQL first_value/last_value return the first/last ROW's value even
    when it is NULL — a null-skipping 'first non-null' kernel would
    diverge exactly here."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:02:00"]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array(ts),
            "event_type": pa.array([None, "view", None], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    got = an.q_user_event_context(str(tmp_path)).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    assert got["first_type"].isna().all()  # first ROW is null
    assert got["last_type"].isna().all()   # last ROW is null
    assert got["cume"].tolist() == [
        pytest.approx(1 / 3, abs=1e-6), pytest.approx(2 / 3, abs=1e-6), 1.0
    ]


def test_lineitem_unpivot_excludes_null_cells(tmp_path):
    """SQL UNPIVOT's default drops NULL cells (no INCLUDE NULLS) — the
    melt must agree by construction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "l_orderkey": pa.array([1, 2], pa.int64()),
            "l_linenumber": pa.array([1, 1], pa.int64()),
            "l_quantity": pa.array([5.0, None], pa.float64()),
            "l_extendedprice": pa.array([100.0, 200.0], pa.float64()),
            "l_discount": pa.array([0.05, 0.1], pa.float64()),
            "l_tax": pa.array([None, 0.02], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")

    got = an.q_lineitem_unpivot(str(tmp_path)).to_pandas()
    assert len(got) == 6  # 8 cells − 2 nulls
    assert not got["value"].isna().any()
    k1 = set(got[got["l_orderkey"] == 1]["measure"])
    assert k1 == {"l_quantity", "l_extendedprice", "l_discount"}


def test_basket_pairs_dedups_repeated_part_within_order(tmp_path):
    """The same part on two lines of one order is ONE basket membership —
    and a pair co-occurring in two orders counts twice."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # order 1: parts {10, 20} with part 10 on two lines
    # order 2: parts {10, 20, 30}
    # order 3: single-part basket -> no pairs
    t = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
            "l_partkey": pa.array([10, 10, 20, 10, 20, 30, 99], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")

    got = an.q_basket_pairs(str(tmp_path)).to_pandas()
    got = got.sort_values(["part_a", "part_b"]).reset_index(drop=True)
    want = pd.DataFrame(
        {
            "part_a": pd.array([10, 10, 20], dtype="int64"),
            "part_b": pd.array([20, 30, 30], dtype="int64"),
            "n_orders": pd.array([2, 1, 1], dtype="int64"),
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_price_mad_outliers_strict_boundary(tmp_path):
    """dev == 3*MAD exactly is NOT an outlier (strict >) — the comparison
    must be exact, which the integer-cents encoding guarantees; a float
    formulation could flip this count by an ulp."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # brand A: prices 1.00 1.02 1.04 1.10 1.16
    #   median = 1.04; devs (cents) = 4 2 0 6 12; MAD = 4 cents
    #   3*MAD = 12 cents: the 1.16 row sits EXACTLY on the boundary -> 0
    #   outliers under strict >
    # brand B: 2.00 2.00 2.00 9.99 -> median 2.00, devs 0 0 0 799,
    #   MAD = 0 -> any nonzero dev is an outlier (the degenerate-MAD case)
    t = pa.table(
        {
            "p_brand": pa.array(["A"] * 5 + ["B"] * 4),
            "p_retailprice": pa.array(
                [1.00, 1.02, 1.04, 1.10, 1.16, 2.00, 2.00, 2.00, 9.99],
                pa.float64(),
            ),
        }
    )
    pq.write_table(t, tmp_path / "part.parquet")

    got = an.q_price_mad_outliers(str(tmp_path)).to_pandas()
    got = got.sort_values("p_brand").reset_index(drop=True)
    want = pd.DataFrame(
        {
            "p_brand": ["A", "B"],
            "n_parts": pd.array([5, 4], dtype="int64"),
            "median_price": [1.04, 2.0],
            "mad": [0.04, 0.0],
            "n_outliers": pd.array([0, 1], dtype="int64"),
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_basket_rules_confidence_is_directional(tmp_path):
    """confidence conditions on the antecedent: a rare part implying a
    common one scores high confidence, the reverse direction low — while
    support and lift stay symmetric."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # part 10 in 4 of 4 baskets; part 20 only in basket 1 -> {20}->{10}
    # has confidence 1.0, {10}->{20} confidence 0.25; lift = 4*1/(4*1) = 1
    t = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "l_partkey": pa.array([10, 20, 10, 10, 10], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")

    got = an.q_basket_rules(str(tmp_path)).to_pandas()
    got = got.sort_values(["antecedent"]).reset_index(drop=True)
    assert len(got) == 2
    fwd = got[got["antecedent"] == 20].iloc[0]
    rev = got[got["antecedent"] == 10].iloc[0]
    assert fwd["confidence"] == 1.0 and rev["confidence"] == 0.25
    assert fwd["support"] == rev["support"] == 0.25
    assert fwd["lift"] == rev["lift"] == 1.0


def test_user_retention_cohorts_planted_matrix(tmp_path):
    """Two cohorts with a skipped week: offsets are relative to each
    user's FIRST week (not the global origin) and a gap week simply has
    no row — plus Monday-start truncation (a Sunday event belongs to the
    week of the previous Monday)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        [
            # u1: first week of 2024-01-01 (Mon), active weeks 0, 2
            "2024-01-02 10:00", "2024-01-17 09:00",
            # u2: same cohort, weeks 0 and 1
            "2024-01-07 23:00",  # Sunday -> still week of 2024-01-01
            "2024-01-08 00:30",  # Monday -> week 1
            # u3: cohort 2024-01-08, week 0 only (two events, one row)
            "2024-01-09 08:00", "2024-01-10 08:00",
        ]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
            "ts": pa.array(ts),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    got = an.q_user_retention_cohorts(str(tmp_path)).to_pandas()
    got = got.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    want = pd.DataFrame(
        {
            "cohort_week": pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-01-01", "2024-01-08"]
            ),
            "week_offset": pd.array([0, 1, 2, 0], dtype="int64"),
            "n_users": pd.array([2, 1, 1, 1], dtype="int64"),
        }
    )
    got["cohort_week"] = pd.to_datetime(got["cohort_week"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_daily_purchase_vs_signup_outer_legs(tmp_path):
    """The sf fixtures have both event types every day, so the FULL OUTER
    legs are vacuous there — plant a purchase-only day and a signup-only
    day and check both survive with zero-filled counts (a LEFT join would
    drop the signup-only day entirely)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        [
            "2024-03-01 10:00",  # purchase only
            "2024-03-02 10:00", "2024-03-02 11:00",  # both
            "2024-03-03 10:00",  # signup only
        ]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "user_id": pa.array([1, 1, 2, 3], pa.int64()),
            "event_type": pa.array(["purchase", "purchase", "signup", "signup"]),
            "ts": pa.array(ts),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    got = an.q_daily_purchase_vs_signup(str(tmp_path)).to_pandas()
    got["day"] = pd.to_datetime(got["day"])
    got = got.sort_values("day").reset_index(drop=True)
    want = pd.DataFrame(
        {
            "day": pd.to_datetime(["2024-03-01", "2024-03-02", "2024-03-03"]),
            "n_purchases": pd.array([1, 1, 0], dtype="int64"),
            "n_signups": pd.array([0, 1, 1], dtype="int64"),
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_peak_concurrency_point_session_boundary(tmp_path):
    """Sweep-line boundary order is (t ASC, start-before-end): a point
    session beginning exactly when another session ends still overlaps it
    for that instant — ends-first ordering would report 1, not 2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        [
            "2024-01-01 09:00", "2024-01-01 09:20", "2024-01-01 09:40",  # u1
            "2024-01-01 09:40",  # u2: point session AT u1's session end
            "2024-01-01 11:00",  # u3: isolated point session
        ]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
            "ts": pa.array(ts),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")

    got = an.q_peak_concurrency(str(tmp_path)).to_pandas()
    assert got["peak_concurrency"].tolist() == [2]
    assert pd.Timestamp(got["peak_at"][0]) == pd.Timestamp("2024-01-01 09:40")
    assert got["n_sessions"].tolist() == [3]


def test_basket_rules_empty_input(tmp_path):
    """Zero baskets: typed empty result, no division by the collected N."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "l_partkey": pa.array([], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    got = an.q_basket_rules(str(tmp_path)).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == [
        "antecedent", "consequent", "support", "confidence", "lift"
    ]


def test_part_skyline_tie_semantics(tmp_path):
    """Dominance is strict-in-one: duplicates of a frontier point are
    mutually non-dominating and ALL survive; a same-price smaller size is
    dominated; a cheaper-and-equal-size point dominates across blocks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "p_size": pa.array([10, 10, 9, 10, 12], pa.int32()),
            "p_retailprice": [5.0, 5.0, 5.0, 7.0, 8.0],
        }
    )
    # parts 1,2: duplicate frontier point (both stay); part 3: same price,
    # smaller size (dominated); part 4: pricier, same size as 1/2
    # (dominated); part 5: pricier but strictly bigger (frontier)
    pq.write_table(t, tmp_path / "part.parquet")
    got = an.q_part_skyline(str(tmp_path)).to_pandas()
    assert sorted(got["p_partkey"]) == [1, 2, 5]


def test_part_skyline_block_prune_is_safe():
    """A locally-dominated point is globally dominated (transitivity): the
    two-pass plan equals the one-pass skyline on the same rows."""
    import numpy as np

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(400, dtype="int64"),
            "p_size": rng.integers(1, 50, 400).astype("int32"),
            "p_retailprice": rng.integers(100, 999, 400) / 10.0,
        }
    )
    whole = an._pareto_block(df)
    blocks = [an._pareto_block(df.iloc[i: i + 50]) for i in range(0, 400, 50)]
    merged = an._pareto_block(pd.concat(blocks, ignore_index=True))
    pd.testing.assert_frame_equal(
        whole.sort_values("p_partkey").reset_index(drop=True),
        merged.sort_values("p_partkey").reset_index(drop=True),
    )


def test_event_type_transitions_planted(tmp_path):
    """Tie timestamps order by event_id; a single-event user emits no
    transition; probs normalize per from_type."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00", "2024-01-01 00:00:01",
            "2024-01-01 00:00:01",  # tie with row 2 → event_id order
            "2024-01-01 00:00:00",  # user 2, single event
            "2024-01-02 00:00:00", "2024-01-02 00:00:05",
        ]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
            "event_type": ["a", "b", "c", "a", "a", "b"],
            "ts": pa.array(ts),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (an.q_event_type_transitions(str(tmp_path)).to_pandas()
           .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    # u1: a→b (ids 1→2), b→c (ids 2→3, tie broken by event_id); u3: a→b
    want = pd.DataFrame(
        {
            "from_type": ["a", "b"],
            "to_type": ["b", "c"],
            "n": pd.array([2, 1], dtype="int64"),
            "prob": [1.0, 1.0],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_copurchase_triangles_planted_hub(tmp_path):
    """Star hub + one closing edge: 1 triangle, wedges = C(5,2)+1+1 = 12,
    clustering 3·1/12 = 0.25. The skewed hub exercises the degree-ordered
    orientation (wedges enumerate at the LOW-degree apexes, not the hub)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # one 2-part order per edge: hub 100 — spokes 1..5, plus edge 1–2
    edges = [(100, v) for v in (1, 2, 3, 4, 5)] + [(1, 2)]
    ok, pk = [], []
    for i, (a, b) in enumerate(edges):
        ok += [i, i]
        pk += [a, b]
    t = pa.table(
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    got = an.q_copurchase_triangles(str(tmp_path))
    assert got.iloc[0]["n_edges"] == 6
    assert got.iloc[0]["n_wedges"] == 12
    assert got.iloc[0]["n_triangles"] == 1
    assert got.iloc[0]["global_clustering"] == 0.25


def test_table_profile_nulls_and_all_null_column(tmp_path):
    """count(DISTINCT) excludes nulls; an all-null column still reports a
    row (n_distinct 0, NULL min/max) despite having no value pairs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-02 03:04:05"]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": pa.array([2, 1], pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array([7, None], pa.int64()),
            "event_type": ["x", "x"],
            "value": [1.5, 1.5],
            "props": pa.array([None, None], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (an.q_table_profile(str(tmp_path)).to_pandas()
           .set_index("col_name"))
    assert got.loc["event_id", "n_distinct"] == 2
    assert got.loc["event_id", "min_val"] == "1"
    assert got.loc["user_id", "n_nulls"] == 1
    assert got.loc["user_id", "n_distinct"] == 1  # null excluded
    assert got.loc["user_id", "min_val"] == "7"  # int form, not "7.0"
    assert got.loc["props", "n_distinct"] == 0
    assert got.loc["props", "min_val"] is None or pd.isna(
        got.loc["props", "min_val"])
    assert got.loc["value", "n_distinct"] == 1
    assert got.loc["ts", "max_val"] == "2024-01-02 03:04:05"
    assert (got["n_rows"] == 2).all()


def test_rolling_distinct_users_window_semantics(tmp_path):
    """Trailing 7-day window: a user active on two days inside one window
    counts once; only OBSERVED days appear in the spine; a day outside the
    window doesn't leak in."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        [
            "2024-01-01 05:00:00",  # u1 day 0
            "2024-01-03 06:00:00",  # u1 day 2 (same user, same window)
            "2024-01-03 07:00:00",  # u2 day 2
            "2024-01-20 08:00:00",  # u1 far later: own window only
        ]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 1, 2, 1], pa.int64()),
            "ts": pa.array(ts),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = (an.q_rolling_distinct_users(str(tmp_path)).to_pandas()
           .sort_values("day").reset_index(drop=True))
    assert list(got["day"].dt.strftime("%Y-%m-%d")) == [
        "2024-01-01", "2024-01-03", "2024-01-20"
    ]
    assert list(got["n_users_7d"]) == [1, 2, 1]


def test_fk_integrity_planted_orphans(tmp_path):
    """Orphan child rows counted per ROW and per distinct MISSING key; a
    NULL child key is not a violation (SQL FK semantics) but still counts
    in n_child_rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 99, 99, 98, None], pa.int64()),
        "l_partkey": pa.array([10, 10, 10, 10, 10, 10], pa.int64()),
    }), tmp_path / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([5], pa.int64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([10], pa.int64()),
    }), tmp_path / "part.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([5], pa.int64()),
        "c_nationkey": pa.array([0], pa.int32()),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int32()),
    }), tmp_path / "nation.parquet")

    got = an.q_fk_integrity(str(tmp_path)).set_index("relationship")
    li = got.loc["lineitem.l_orderkey->orders"]
    assert li["n_child_rows"] == 6
    assert li["n_orphans"] == 3       # two rows key 99 + one row key 98
    assert li["n_missing_keys"] == 2  # {98, 99}; NULL not a violation
    assert got.loc["lineitem.l_partkey->part", "n_orphans"] == 0
    assert got.loc["orders.o_custkey->customer", "n_orphans"] == 0
    assert got.loc["customer.c_nationkey->nation", "n_orphans"] == 0


def test_activity_streaks_islands(tmp_path):
    """Gaps-and-islands: consecutive days chain into one run, a one-day
    gap breaks it, same-day duplicate events count once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime([
        "2024-01-01 05:00:00",  # u1 day 0
        "2024-01-01 23:59:59",  # u1 day 0 again (dedup)
        "2024-01-02 00:00:01",  # u1 day 1
        "2024-01-03 12:00:00",  # u1 day 2  -> streak of 3
        "2024-01-05 12:00:00",  # u1 day 4  (gap: day 3 missing)
        "2024-02-10 00:00:00",  # u2 single day
    ]).astype("datetime64[us]")
    pq.write_table(pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array(ts),
    }), tmp_path / "events.parquet")

    got = (an.q_activity_streaks(str(tmp_path)).to_pandas()
           .set_index("user_id"))
    assert got.loc[1, "longest_streak"] == 3
    assert got.loc[1, "n_active_days"] == 4
    assert got.loc[2, "longest_streak"] == 1
    assert got.loc[2, "n_active_days"] == 1


def test_part_hop_distance_planted_chain(tmp_path):
    """BFS min-hop labels over a planted chain 1-2-3-4-5: hops cap at
    max_hops (part 5 is 4 hops out -> excluded), a disconnected part never
    appears, and a shortcut edge lowers the label (min, not first-path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    orders = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3), (3, 4),
              (4, 4), (4, 5),
              (5, 1), (5, 3),   # shortcut: 3 is 1 hop from seed, not 2
              (6, 100)]         # isolated part: no co-purchase edge
    pq.write_table(pa.table({
        "l_orderkey": pa.array([o for o, _ in orders], pa.int64()),
        "l_partkey": pa.array([p for _, p in orders], pa.int64()),
    }), tmp_path / "lineitem.parquet")

    got = an.q_part_hop_distance(str(tmp_path), max_hops=3).to_pandas()
    labels = dict(zip(got["node"], got["hops"]))
    assert labels == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_weighted_median_price_planted(tmp_path):
    """Weighted-median edges the sf fixtures can't isolate: an exact-half
    boundary picks the row that REACHES half (lower weighted median), a
    dominant weight wins regardless of order, and a repeated price's
    weight merges before the cumsum."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # supplier 1: weights 1,1,2 over prices 10,20,30 -> total 4;
        # cum at 20 is exactly half (2) -> lower median = 20.0
        (1, 10.0, 1.0), (1, 20.0, 1.0), (1, 30.0, 2.0),
        # supplier 2: one heavy row dwarfs the rest -> 99.0
        (2, 1.0, 1.0), (2, 99.0, 10.0), (2, 2.0, 1.0),
        # supplier 3: price 5.0 split across two lines (1+3=4 of total 6)
        # merges to reach half -> 5.0
        (3, 5.0, 1.0), (3, 5.0, 3.0), (3, 7.0, 2.0),
    ]
    pq.write_table(pa.table({
        "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": [r[1] for r in rows],
        "l_quantity": [r[2] for r in rows],
    }), tmp_path / "lineitem.parquet")

    got = (an.q_weighted_median_price(str(tmp_path)).to_pandas()
           .set_index("l_suppkey")["wmedian_price"])
    assert got.loc[1] == 20.0
    assert got.loc[2] == 99.0
    assert got.loc[3] == 5.0


def test_priority_coverage_planted(tmp_path):
    """Relational division: only the customer holding EVERY divisor value
    appears; a customer with a repeated priority doesn't double-count; the
    divisor is the observed domain, not a fixed list."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (1, "HIGH"), (1, "LOW"), (1, "MED"),          # full coverage
        (2, "HIGH"), (2, "HIGH"), (2, "LOW"),         # repeat != coverage
        (3, "MED"),                                    # partial
    ]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(len(rows)), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderpriority": [r[1] for r in rows],
    }), tmp_path / "orders.parquet")

    got = an.q_priority_coverage(str(tmp_path)).to_pandas()
    assert got["o_custkey"].tolist() == [1]
    assert got["n_matched"].tolist() == [3]
