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
