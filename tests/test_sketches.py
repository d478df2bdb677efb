"""HLL sketch accuracy + retention delete (the scale-path extras)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nostr_data_pipeline_ray.config import EngineConfig
from nostr_data_pipeline_ray.pipelines.analytics import (
    q_approx_distinct_users,
    q_distinct_users_by_type,
)
from nostr_data_pipeline_ray.pipelines.cdc import (
    apply_changelog,
    delete_where,
    final_table,
)
from nostr_data_pipeline_ray.stages.sketches import HyperLogLog
from nostr_data_pipeline_ray.synth import (
    ChangelogSpec,
    expected_final_state,
    generate_changelog,
)

SF_DIR = "/root/testdata/sf0.01"


def test_hll_unit_accuracy_and_merge():
    hll = HyperLogLog(p=12)
    rng = np.random.default_rng(0)
    a = rng.integers(0, 50_000, 200_000)  # ~49k distinct
    b = rng.integers(25_000, 75_000, 200_000)
    exact_union = len(set(a.tolist()) | set(b.tolist()))
    merged = HyperLogLog.merge(hll.registers(a), hll.registers(b))
    est = hll.estimate(merged)
    assert abs(est - exact_union) / exact_union < 0.05
    # small-range linear counting
    small = hll.estimate(hll.registers(np.arange(100)))
    assert abs(small - 100) <= 5


def test_approx_distinct_pipeline_matches_exact_within_5pct():
    exact = {
        r["event_type"]: r["n_users"]
        for r in q_distinct_users_by_type(SF_DIR).take_all()
    }
    approx = q_approx_distinct_users(SF_DIR).to_pandas()
    assert set(approx["event_type"]) == set(exact)
    for _, row in approx.iterrows():
        e = exact[row["event_type"]]
        assert abs(row["n_users_approx"] - e) / max(e, 1) < 0.05


def test_tdigest_accuracy_and_merge():
    from nostr_data_pipeline_ray.stages.sketches import TDigest

    rng = np.random.default_rng(4)
    vals = np.concatenate(
        [rng.lognormal(3.0, 1.0, 150_000), rng.uniform(0, 10, 50_000)]
    )
    td = TDigest()  # engine default delta
    # merge of 8 partial digests ≈ digest of the whole array ≈ exact
    parts = np.array_split(vals, 8)
    m, w = td.merge([td.from_values(p) for p in parts])
    assert len(m) <= 2 * td.delta  # bounded summary
    assert abs(w.sum() - len(vals)) < 1e-6  # no mass lost
    for q in (0.25, 0.5, 0.75, 0.95, 0.99):
        exact = np.quantile(vals, q)
        approx = TDigest.quantile(m, w, q)
        # relative error: loose in the middle, tight at the tail (k1 scale)
        tol = 0.02 if q < 0.9 else 0.01
        assert abs(approx - exact) / exact < tol, (q, approx, exact)


def test_tdigest_pipeline_matches_exact_quantiles():
    from nostr_data_pipeline_ray.pipelines.analytics import (
        q_price_stats,
        q_price_stats_tdigest,
    )

    exact = q_price_stats(SF_DIR).to_pandas().iloc[0]
    approx = q_price_stats_tdigest(SF_DIR).to_pandas().iloc[0]
    for col in ("p25", "median", "p75", "p95"):
        assert abs(approx[col] - exact[col]) / exact[col] < 0.02, col


def test_delete_where_retention(tmp_path):
    spec = ChangelogSpec(n_events=8_000, n_convs=300, n_segments=4, seed=31)
    binlog = generate_changelog(str(tmp_path / "synth"), spec)
    lake_root = str(tmp_path / "lake")
    cfg = EngineConfig(num_partitions=8, epoch_segments=4)
    apply_changelog(lake_root, binlog, cfg)

    want = expected_final_state(binlog)
    cutoff = want["ts"][want.num_rows // 2].as_py()  # drop the older half

    out = delete_where(
        lake_root, lambda t: pc.less(t["ts"], pa.scalar(cutoff, pa.timestamp("us"))), cfg
    )
    assert out["rows_deleted"] > 0

    got = final_table(lake_root)
    want_kept = want.filter(pc.greater_equal(want["ts"], pa.scalar(cutoff, pa.timestamp("us"))))
    assert got.num_rows == want_kept.num_rows
    assert got.select(want_kept.column_names).cast(want_kept.schema).equals(want_kept)

    # idempotent second pass deletes nothing
    again = delete_where(
        lake_root, lambda t: pc.less(t["ts"], pa.scalar(cutoff, pa.timestamp("us"))), cfg
    )
    assert again["rows_deleted"] == 0


def test_misra_gries_unit_bound_and_merge():
    """MG guarantees: counts are lower bounds; undercount ≤ n/(k+1) across
    any merge tree; every item with true freq > n/(k+1) survives. Planted
    zipf-ish stream split into 4 'batches' merged the pipeline's way
    (summarize per batch → add counts → one final truncate)."""
    from nostr_data_pipeline_ray.stages.sketches import MisraGries

    rng = np.random.default_rng(7)
    # 40 heavy items (~1000 each) over a 5000-item light tail
    heavy = np.repeat(np.arange(40), 1000)
    tail = rng.integers(1000, 6000, 60_000)
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    n, k = len(stream), 256
    mg = MisraGries(k)

    merged: dict = {}
    for part in np.array_split(stream, 4):
        items, counts = np.unique(part, return_counts=True)
        items, counts = mg.summarize(items, counts)
        for i, c in zip(items.tolist(), counts.tolist()):
            merged[i] = merged.get(i, 0) + c
    items, counts = mg.truncate(
        np.array(list(merged)), np.array(list(merged.values()))
    )

    true = {i: int(c) for i, c in zip(*np.unique(stream, return_counts=True))}
    est = dict(zip(items.tolist(), counts.tolist()))
    bound = n / (k + 1)
    for i, c in est.items():
        assert c <= true[i], "MG must never overcount"
        assert true[i] - c <= bound, "undercount exceeded n/(k+1)"
    for i in range(40):  # heavy items all survive (freq 1000 > bound)
        assert true[i] > bound and i in est


def test_top_words_sketch_exact_when_vocab_fits():
    """With capacity ≥ vocabulary, no decrement ever fires and the sketch
    top-k IS the exact top-k (counts included) — pin against a brute-force
    count at sf0.001."""
    import pandas as pd

    from nostr_data_pipeline_ray.pipelines.analytics import q_top_words_sketch

    sf = "/root/testdata/sf0.001"
    got = q_top_words_sketch(sf, k=1_000_000, topn=10).to_pandas()

    t = pa.parquet.read_table(f"{sf}/documents.parquet", columns=["text"])
    words = pc.list_flatten(pc.split_pattern(t["text"], " ")).to_pandas()
    exact = words.value_counts()
    assert got["est_count"].tolist() == exact.head(10).tolist()
    # ties inside the exact head can permute names; compare count-sets
    assert set(got["word"]) <= set(exact[exact >= exact.iloc[9]].index)


import pytest as _pytest


@_pytest.mark.parametrize("forced_distributed", [False, True])
def test_grouped_tdigest_matches_exact_grouped_median(
    forced_distributed, monkeypatch
):
    """The grouped t-digest scale path must land within 2% of every
    brand's exact median at sf0.01 and report exact group counts — on
    BOTH the single-task local path and the forced bucketed exchange
    (list-columned sketch frames through the shuffle)."""
    from nostr_data_pipeline_ray.pipelines.analytics import (
        q_median_price_per_brand,
        q_median_price_per_brand_tdigest,
    )

    if forced_distributed:
        from nostr_data_pipeline_ray.stages import shuffle as sh

        monkeypatch.setattr(sh, "LOCAL_MAX_INPUT_BYTES", 0)
    exact = q_median_price_per_brand(SF_DIR).to_pandas().set_index("p_brand")
    approx = (
        q_median_price_per_brand_tdigest(SF_DIR).to_pandas().set_index("p_brand")
    )
    assert set(approx.index) == set(exact.index)
    for brand in exact.index:
        e, a = exact.loc[brand], approx.loc[brand]
        assert a["n_parts"] == e["n_parts"], brand  # weights are exact counts
        assert abs(a["median"] - e["median_price"]) <= 0.02 * e["median_price"], brand
        assert a["p25"] <= a["median"] <= a["p75"], brand


@_pytest.mark.parametrize("forced_distributed", [False, True])
def test_grouped_heavy_hitters_exact_when_vocab_fits(
    forced_distributed, monkeypatch
):
    """With capacity ≥ per-source vocabulary no decrement fires, so the
    grouped sketch's per-source top-n must exactly match brute-force
    counts — on both the local and the forced bucketed-exchange path."""
    import pandas as pd
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.analytics import (
        q_top_words_per_source_sketch,
    )

    if forced_distributed:
        from nostr_data_pipeline_ray.stages import shuffle as sh

        monkeypatch.setattr(sh, "LOCAL_MAX_INPUT_BYTES", 0)
    sf = "/root/testdata/sf0.001"
    got = q_top_words_per_source_sketch(sf, k=1_000_000, topn=3).to_pandas()

    t = pq.read_table(f"{sf}/documents.parquet", columns=["text", "source"])
    flat = pc.split_pattern(t["text"], " ").combine_chunks()
    parents = pc.list_parent_indices(flat)
    df = pd.DataFrame(
        {
            "source": t["source"].take(parents).to_pandas(),
            "word": pc.list_flatten(flat).to_pandas(),
        }
    )
    # every source must be present (a dropped bucket would otherwise make
    # the per-source loop below pass vacuously) and fully ranked
    assert set(got["source"]) == set(df["source"].unique())
    for src, g in got.groupby("source"):
        exact = df[df["source"] == src]["word"].value_counts()
        assert g.sort_values("rank")["est_count"].tolist() == exact.head(3).tolist(), src
        top = g.sort_values("rank")["word"].tolist()
        # words must come from the ties-allowed exact head
        assert set(top) <= set(exact[exact >= exact.iloc[2]].index), src
