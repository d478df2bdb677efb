"""Property-based and adversarial correctness tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.cdc import apply_epoch, final_table, lww_reduce
from nostr_data_pipeline_ray.state.lake import Lake
from nostr_data_pipeline_ray.synth import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)


# ---- lww_reduce vs a straightforward pandas reference ----------------------

@st.composite
def change_tables(draw):
    n = draw(st.integers(min_value=1, max_value=200))
    convs = draw(st.integers(min_value=1, max_value=8))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    conv = rng.integers(0, convs, n)
    turn = rng.integers(0, 5, n).astype(np.int32)
    lsn = rng.integers(0, 50, n).astype(np.int64)  # deliberate lsn collisions
    op = rng.choice(["insert", "update", "delete"], n)
    return pa.table(
        {
            "conv_id": pa.array([f"c{v}" for v in conv]),
            "turn_idx": pa.array(turn, pa.int32()),
            "text": pa.array([f"t{i}" for i in range(n)]),
            "op": pa.array(op),
            "lsn": pa.array(lsn, pa.int64()),
        }
    )


@given(change_tables())
@settings(max_examples=60, deadline=None)
def test_lww_reduce_matches_pandas_reference(table):
    winners, max_lsn = lww_reduce(table)
    df = table.to_pandas()
    # reference semantics: max lsn per key, ties broken by LAST input position
    df["_pos"] = np.arange(len(df))
    ref = (
        df.sort_values(["lsn", "_pos"], kind="stable")
        .drop_duplicates(["conv_id", "turn_idx"], keep="last")
    )
    got = winners.to_pandas()
    key = ["conv_id", "turn_idx"]
    ref_s = ref.sort_values(key).reset_index(drop=True)
    got_s = got.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(ref_s)
    pd.testing.assert_frame_equal(
        got_s[["conv_id", "turn_idx", "text", "op", "lsn"]],
        ref_s[["conv_id", "turn_idx", "text", "op", "lsn"]],
    )
    assert max_lsn == int(df["lsn"].max())


# ---- row-level idempotence: overlapping segment re-delivery -----------------

def test_bucketed_backbone_correct_under_extreme_key_skew():
    """90% of rows share ONE key: the map-side partial combiner must keep
    the hot key's aggregate exact while bounding what crosses the shuffle."""
    import ray.data as rd

    from nostr_data_pipeline_ray.stages.shuffle import bucketed_sum_count

    rng = np.random.default_rng(6)
    n = 200_000
    keys = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 5_000, n))
    vals = rng.random(n)
    df = pd.DataFrame({"k": keys, "v": vals})
    ds = rd.from_pandas(df).repartition(16)
    got = (
        bucketed_sum_count(ds, ["k"], sums={"v": "total"}, count_as="n")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k").agg(total=("v", "sum"), n=("v", "size")).reset_index()
        .sort_values("k").reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    # float sums: order-dependent, compare to tolerance
    np.testing.assert_allclose(got["total"].to_numpy(), want["total"].to_numpy(),
                               rtol=1e-9)


@given(st.integers(0, 2**31), st.floats(0.5, 2.0))
@settings(max_examples=15, deadline=None)
def test_tdigest_quantiles_within_tolerance(seed, sigma):
    """Property: for arbitrary lognormal/uniform mixtures, merged partial
    digests stay within 2% of exact quantiles (5% at the tail — a σ=2
    lognormal spans orders of magnitude, so tail centroids are wide; σ is
    capped at 2 to match that bound, and the tighter 1% tail bound on the
    bench-like distribution is pinned in test_sketches.py)."""
    from nostr_data_pipeline_ray.stages.sketches import TDigest

    rng = np.random.default_rng(seed)
    vals = np.concatenate(
        [rng.lognormal(2.0, sigma, 20_000), rng.uniform(0.1, 50.0, 10_000)]
    )
    td = TDigest()  # engine default delta
    m, w = td.merge([td.from_values(p) for p in np.array_split(vals, 5)])
    assert abs(w.sum() - len(vals)) < 1e-6
    for q in (0.25, 0.5, 0.75, 0.95, 0.99):
        exact = np.quantile(vals, q)
        approx = TDigest.quantile(m, w, q)
        tol = 0.02 if q < 0.9 else 0.05
        assert abs(approx - exact) / max(exact, 1e-9) < tol, (seed, q)


def test_overlapping_segment_redelivery(tmp_path):
    """apply_epoch called with a segment that was ALREADY committed in an
    earlier epoch (duplicate delivery at the segment level, bypassing the
    changelog-level skip): the per-partition watermark filter must make the
    replayed rows a no-op and the final state must equal the oracle."""
    spec = ChangelogSpec(n_events=6_000, n_convs=200, n_segments=6, seed=21)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    from nostr_data_pipeline_ray.pipelines.cdc import list_segments

    segs = list_segments(binlog)
    lake_root = str(tmp_path / "lake")
    lake = Lake(lake_root)
    cfg = EngineConfig(num_partitions=8, epoch_segments=3)

    apply_epoch(lake, segs[0:2], cfg)
    # segments 0-1 re-delivered together with new segments 2-3
    out = apply_epoch(lake, segs[0:4], cfg)
    assert out["rows_applied"] > 0
    apply_epoch(lake, segs[4:6], cfg)

    got = final_table(lake_root)
    want = expected_final_state(binlog)
    assert got.num_rows == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)


def test_pure_replay_epoch_is_bookkeeping_only(tmp_path):
    spec = ChangelogSpec(n_events=3_000, n_convs=100, n_segments=3, seed=23)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    from nostr_data_pipeline_ray.pipelines.cdc import list_segments

    segs = list_segments(binlog)
    lake_root = str(tmp_path / "lake")
    lake = Lake(lake_root)
    cfg = EngineConfig(num_partitions=4, epoch_segments=4)
    apply_epoch(lake, segs, cfg)
    files_before = dict(Lake(lake_root).current_manifest()["files"])

    out = apply_epoch(lake, segs, cfg)  # full re-delivery of applied segments
    assert out["rows_applied"] == 0
    assert out["partitions"] == 0
    # carried forward by reference, not rewritten
    assert Lake(lake_root).current_manifest()["files"] == files_before

    got = final_table(lake_root)
    want = expected_final_state(binlog)
    assert got.select(want.column_names).cast(want.schema).equals(want)


@given(
    st.lists(
        st.text(min_size=0, max_size=12),
        min_size=0,
        max_size=200,
    ),
    st.integers(min_value=0, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_hash_conv_dictionary_path_matches_elementwise(values, dup_factor):
    """hash_conv's distinct-hash+gather fast path must be bitwise-identical
    to the elementwise pandas hash for ANY string multiset (duplicates,
    empties, unicode) — the partition mapping is persisted lake state.
    Small lists take the elementwise path; the repeat factor below pushes
    past the 4096-value probe so the dictionary path is exercised too."""
    from nostr_data_pipeline_ray.stages.cdc_stages import hash_conv

    values = values * (dup_factor + 1)
    if values:
        values = values * (4096 // len(values) + 1)  # force probe + dict path
    arr = pa.chunked_array([pa.array(values, pa.string())])
    want = pd.util.hash_array(np.asarray(pd.Series(values, dtype=object), dtype=object)) if values else np.array([], dtype=np.uint64)
    got = hash_conv(arr)
    assert np.array_equal(got, want)


def test_hash_conv_low_duplication_takes_elementwise_path():
    """A near-all-distinct array must match too (the probe routes it to the
    elementwise path — the dictionary detour is slower there)."""
    from nostr_data_pipeline_ray.stages.cdc_stages import hash_conv

    values = [f"conv-{i}" for i in range(10_000)]
    arr = pa.array(values, pa.string())
    want = pd.util.hash_array(np.asarray(pd.Series(values, dtype=object), dtype=object))
    assert np.array_equal(hash_conv(arr), want)


# ---- repetition kernel vs a per-document Python reference ------------------

@given(st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dd", "e f".replace(" ", ""), "x1"]),
             min_size=0, max_size=30),
    min_size=1, max_size=40,
), st.integers(0, 2**31))
@settings(max_examples=40, deadline=None)
def test_repetition_kernel_matches_python_reference(word_lists, seed):
    """The factorize+lexsort kernel must agree with the obvious Counter
    reference on arbitrary small documents (including empty, single-word,
    and all-identical)."""
    from collections import Counter

    from nostr_data_pipeline_ray.pipelines.textops import _repetition_batch

    texts = [" ".join(ws) for ws in word_lists]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = _repetition_batch(batch).to_pandas().set_index("doc_id")

    def r6(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    for i, t in enumerate(texts):
        ws = t.split(" ")  # "" -> [""], matching both engines
        wc = Counter(ws)
        n = len(ws)
        assert out.loc[i, "dup_word_frac"] == r6(1 - len(wc) / n)
        assert out.loc[i, "top_word_frac"] == r6(max(wc.values()) / n)
        grams = Counter(zip(ws, ws[1:]))
        want_bg = r6(max(grams.values()) / (n - 1)) if grams else 0.0
        assert out.loc[i, "top_bigram_frac"] == want_bg


# ---- FWW loser resolution: both paths vs a union-find reference ------------
#
# The incremental curators resolve first-writer-wins dedup losers through a
# gated dual path (curate_index._losers_driver under the pushdown gate,
# _losers_distributed at bootstrap scale). The planted-case A/B test
# (test_curate_index.test_distributed_losers_match_driver_path) pins one
# instance of every loser class; these properties pin the SEMANTICS on
# random mixed graphs against an independent union-find reference:
#   - an edge with exactly one new endpoint loses that new endpoint;
#   - new×new components fold whole into an existing cluster if ANY member
#     also lost through a mixed edge, else keep only the min id;
#   - old×old edges (outside the mining contract) are ignored identically.

def _reference_losers(new_ids, edges):
    new = set(new_ids)
    lost: set[int] = set()
    nn: list[tuple[int, int]] = []
    for a, b in edges:
        a_new, b_new = a in new, b in new
        if a_new and not b_new:
            lost.add(a)
        elif b_new and not a_new:
            lost.add(b)
        elif a_new and b_new:
            nn.append((a, b))
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in nn:
        parent[find(a)] = find(b)
    comps: dict[int, set[int]] = {}
    for x in parent:
        comps.setdefault(find(x), set()).add(x)
    for members in comps.values():
        if members & lost:
            lost |= members
        else:
            lost |= members - {min(members)}
    return lost


@st.composite
def loser_cases(draw):
    n_pool = draw(st.integers(4, 18))
    pool = list(range(n_pool))
    new_ids = sorted(draw(
        st.sets(st.sampled_from(pool), min_size=1, max_size=n_pool)
    ))
    raw = draw(st.lists(
        st.tuples(st.sampled_from(pool), st.sampled_from(pool)),
        max_size=14,
    ))
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    return new_ids, edges


def _run_loser_path(fn, new_ids, edges):
    import ray.data as rd

    new_docs = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(new_ids, dtype="int64")})
    )
    pairs = (
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]).astype("int64")
        if edges else None
    )
    lost_ds, n_lost = fn(new_docs, pairs)
    if not n_lost:
        got = set()
    elif hasattr(lost_ds, "to_pandas"):  # distributed path: Dataset
        got = set(lost_ds.to_pandas()["loser_id"].astype("int64").tolist())
    else:  # driver path returns the ndarray itself (no Ray round trip)
        got = set(int(x) for x in lost_ds)
    assert len(got) == n_lost  # the count the gate dispatches on is exact
    return got


@given(loser_cases())
@settings(max_examples=25, deadline=None)
def test_driver_losers_match_union_find_reference(ray_session, case):
    from nostr_data_pipeline_ray.pipelines.curate_index import _losers_driver

    new_ids, edges = case
    got = _run_loser_path(_losers_driver, new_ids, edges)
    assert got == _reference_losers(new_ids, edges)


@given(loser_cases())
@settings(max_examples=5, deadline=None)
def test_distributed_losers_match_union_find_reference(ray_session, case):
    """The bootstrap-scale path (bucketed semi/anti joins + CC + per-label
    argmin) agrees with the reference on random graphs — fewer examples,
    each runs a real multi-exchange Ray job."""
    from nostr_data_pipeline_ray.pipelines.curate_index import (
        _losers_distributed,
    )

    new_ids, edges = case
    got = _run_loser_path(_losers_distributed, new_ids, edges)
    assert got == _reference_losers(new_ids, edges)


# ---- SQL NTILE kernel vs DuckDB on randomized partitions -------------------

@given(
    sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=6),
    k=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=60, deadline=None)
def test_sql_ntile_matches_duckdb(sizes, k):
    """The vectorized NTILE kernel must agree with DuckDB's ntile(k) for
    every partition size / k combination — including partitions smaller
    than k and every uneven-split remainder."""
    import duckdb

    from nostr_data_pipeline_ray.functions.windowfns import sql_ntile

    part = np.repeat(np.arange(len(sizes)), sizes)
    order = np.concatenate([np.arange(s) for s in sizes])
    df = pd.DataFrame({"p": part, "o": order})
    want = (
        duckdb.connect()
        .execute(
            f"SELECT p, o, ntile({k}) OVER (PARTITION BY p ORDER BY o) AS t "
            "FROM df ORDER BY p, o"
        )
        .fetch_df()["t"]
        .to_numpy()
    )
    n = np.repeat(np.asarray(sizes, dtype=np.int64), sizes)
    got = sql_ntile(order, n, k)
    assert got.tolist() == want.tolist()


@given(
    seed=st.integers(0, 2**31),
    n=st.integers(min_value=2, max_value=400),
)
@settings(max_examples=40, deadline=None)
def test_exact_int_moment_formula_matches_duckdb_builtins(seed, n):
    """The closed-form (n·Σx² − (Σx)²)/(n·(n−1)) over exact ints must agree
    with DuckDB's native var_samp/stddev_samp/corr to fp precision — the
    contract queries pin the mirrored-SQL path; this pins the FORMULA
    against the reference implementations on random data."""
    import duckdb

    rng = np.random.default_rng(seed)
    x = rng.integers(0, 100, n)
    y = x * 2 + rng.integers(0, 50, n)  # correlated, non-degenerate
    df = pd.DataFrame({"x": x, "y": y})
    want = (
        duckdb.connect()
        .execute(
            "SELECT var_samp(x), stddev_samp(x), corr(x, y), covar_samp(x, y) FROM df"
        )
        .fetchone()
    )

    N, sx, sy = int(n), int(x.sum()), int(y.sum())
    sx2 = int((x.astype(object) * x.astype(object)).sum())
    sy2 = int((y.astype(object) * y.astype(object)).sum())
    sxy = int((x.astype(object) * y.astype(object)).sum())
    var = float(N * sx2 - sx * sx) / float(N * (N - 1))
    std = float(np.sqrt(var))
    dena, denb = N * sx2 - sx * sx, N * sy2 - sy * sy
    corr = (
        float(N * sxy - sx * sy) / (np.sqrt(float(dena)) * np.sqrt(float(denb)))
        if dena > 0 and denb > 0
        else None
    )
    cov = float(N * sxy - sx * sy) / float(N * (N - 1))

    assert var == pytest.approx(want[0], rel=1e-9)
    assert std == pytest.approx(want[1], rel=1e-9)
    if corr is None:
        assert want[2] is None or np.isnan(want[2])
    else:
        assert corr == pytest.approx(want[2], rel=1e-9)
    assert cov == pytest.approx(want[3], rel=1e-9)


@given(seed=st.integers(0, 2**31), n=st.integers(min_value=2, max_value=400))
@settings(max_examples=30, deadline=None)
def test_exact_int_regression_formula_matches_duckdb_builtins(seed, n):
    """slope/intercept/r² from the exact integer sums must agree with
    DuckDB's native regr_slope/regr_intercept/regr_r2 to fp precision."""
    import duckdb

    rng = np.random.default_rng(seed)
    x = rng.integers(0, 100, n)
    y = x * 3 + rng.integers(0, 50, n)
    df = pd.DataFrame({"x": x, "y": y})
    want = (
        duckdb.connect()
        .execute("SELECT regr_slope(y, x), regr_intercept(y, x), regr_r2(y, x) FROM df")
        .fetchone()
    )

    N, sx, sy = int(n), int(x.sum()), int(y.sum())
    sx2 = int((x.astype(object) * x.astype(object)).sum())
    sy2 = int((y.astype(object) * y.astype(object)).sum())
    sxy = int((x.astype(object) * y.astype(object)).sum())
    num, dena, denb = N * sxy - sx * sy, N * sx2 - sx * sx, N * sy2 - sy * sy
    if dena == 0:
        # constant x: all three regr_* are NULL (pin all, not just slope)
        assert want[0] is None and want[1] is None and want[2] is None
        return
    slope = float(num) / float(dena)
    intercept = (float(sy) - slope * float(sx)) / float(N)
    assert slope == pytest.approx(want[0], rel=1e-9)
    assert intercept == pytest.approx(want[1], rel=1e-9, abs=1e-9)
    if denb > 0:
        corr = float(num) / (np.sqrt(float(dena)) * np.sqrt(float(denb)))
        assert corr * corr == pytest.approx(want[2], rel=1e-9)
    else:
        assert want[2] == 1.0  # constant y over varying x: r² is 1, not NULL


def test_regression_degenerate_groups_match_duckdb():
    """The two degenerate branches the random generator essentially never
    hits: constant y over varying x (slope 0, intercept ȳ, r² = 1) and
    constant x (all NULL) — pinned explicitly against DuckDB's regr_*."""
    import duckdb

    df = pd.DataFrame({"x": [1, 2, 3, 4], "y": [5, 5, 5, 5]})
    want = (
        duckdb.connect()
        .execute("SELECT regr_slope(y, x), regr_intercept(y, x), regr_r2(y, x) FROM df")
        .fetchone()
    )
    assert want == (0.0, 5.0, 1.0)

    df = pd.DataFrame({"x": [7, 7, 7], "y": [1, 2, 3]})
    want = (
        duckdb.connect()
        .execute("SELECT regr_slope(y, x), regr_intercept(y, x), regr_r2(y, x) FROM df")
        .fetchone()
    )
    assert want == (None, None, None)

    # and the ENGINE's derive produces the same shape on a planted table
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    import nostr_data_pipeline_ray.pipelines.analytics as an

    with tempfile.TemporaryDirectory() as d:
        t = pa.table(
            {
                "l_returnflag": pa.array(["A"] * 4 + ["B"] * 3, pa.string()),
                "l_quantity": pa.array([1.0, 2, 3, 4] + [7.0, 7, 7], pa.float64()),
                "l_discount": pa.array([0.05] * 4 + [0.01, 0.02, 0.03], pa.float64()),
            }
        )
        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        got = (
            an.q_quantity_discount_regression(d)
            .to_pandas()
            .set_index("l_returnflag")
        )
        a, b = got.loc["A"], got.loc["B"]
        assert (a["slope"], a["intercept"], a["r2"]) == (0.0, 5.0, 1.0)
        assert pd.isna(b["slope"]) and pd.isna(b["intercept"]) and pd.isna(b["r2"])


@given(seed=st.integers(0, 2**31), n=st.integers(min_value=4, max_value=400))
@settings(max_examples=30, deadline=None)
def test_exact_int_skew_kurtosis_formula_matches_duckdb_builtins(seed, n):
    """G1/G2 from the exact integer power sums (A, B, C scaled central
    moments) must agree with DuckDB's native skewness/kurtosis to fp
    precision — the contract query pins the mirrored-SQL path; this pins
    the FORMULA against the reference implementations on random data."""
    import duckdb

    rng = np.random.default_rng(seed)
    x = rng.integers(1, 51, n)  # the l_quantity domain
    df = pd.DataFrame({"x": x})
    want = (
        duckdb.connect()
        .execute("SELECT skewness(x), kurtosis(x) FROM df")
        .fetchone()
    )

    N = int(n)
    xo = x.astype(object)
    s1, s2 = int(xo.sum()), int((xo * xo).sum())
    s3, s4 = int((xo * xo * xo).sum()), int((xo * xo * xo * xo).sum())
    a = N * s2 - s1 * s1
    bb = N * N * s3 - 3 * N * s1 * s2 + 2 * s1**3
    cc = N**3 * s4 - 4 * N * N * s1 * s3 + 6 * N * s1 * s1 * s2 - 3 * s1**4
    if a == 0:  # constant column: both builtins are NULL/NaN
        assert want[0] is None or np.isnan(want[0])
        assert want[1] is None or np.isnan(want[1])
        return
    skew = np.sqrt(float(N * (N - 1))) / float(N - 2) * (
        float(bb) / (float(a) * np.sqrt(float(a)))
    )
    g2 = float(cc) / (float(a) * float(a)) - 3.0
    kurt = (float(N + 1) * g2 + 6.0) * (float(N - 1) / float((N - 2) * (N - 3)))
    assert skew == pytest.approx(want[0], rel=1e-7, abs=1e-9)
    assert kurt == pytest.approx(want[1], rel=1e-7, abs=1e-9)
