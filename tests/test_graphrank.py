"""Integer PageRank: oracle agreement, three-path equivalence, and exact
agreement with an obvious pure-python power iteration on random graphs."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nostr_data_pipeline_ray.pipelines import graphrank as gr

SF = "/root/testdata/sf0.001"


def _key(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(
        ["rank_scaled", "entity_id", "kind"], ascending=[False, True, True]
    ).reset_index(drop=True)


def _oracle(sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf, t + '.parquet')}')"
        )
    return con.execute(gr.ORACLE["supplier_pagerank"]).df()


def test_pagerank_matches_oracle(ray_session):
    got = gr.q_supplier_pagerank(SF).to_pandas()
    pd.testing.assert_frame_equal(_key(got), _key(_oracle(SF)))


def test_pagerank_three_paths_bit_identical(ray_session):
    """Local fast path ≡ gated-broadcast loop ≡ bucketed-join loop: the
    arithmetic is all int64, so the paths must agree exactly."""
    local = _key(gr.supplier_pagerank(SF).to_pandas())
    bc = _key(gr.supplier_pagerank(SF, allow_local=False).to_pandas())
    jn = _key(
        gr.supplier_pagerank(SF, allow_local=False, broadcast_max=0).to_pandas()
    )
    pd.testing.assert_frame_equal(local, bc)
    pd.testing.assert_frame_equal(local, jn)


def _tiny_graph_dir(tmp_path, rng, n_cust=12, n_supp=4, n_orders=30):
    """A random bipartite order graph in the two-table shape the pipeline
    reads (only the projected columns need to exist)."""
    d = tmp_path / "sf"
    d.mkdir()
    ok = np.arange(1, n_orders + 1, dtype=np.int64)
    ck = rng.integers(1, n_cust + 1, size=n_orders).astype(np.int64)
    pq.write_table(
        pa.table({"o_orderkey": ok, "o_custkey": ck}),
        str(d / "orders.parquet"),
    )
    n_lines = n_orders * 3
    lk = rng.integers(1, n_orders + 1, size=n_lines).astype(np.int64)
    sk = rng.integers(1, n_supp + 1, size=n_lines).astype(np.int64)
    pq.write_table(
        pa.table({"l_orderkey": lk, "l_suppkey": sk}),
        str(d / "lineitem.parquet"),
    )
    return str(d), pd.DataFrame({"ok": ok, "ck": ck}), pd.DataFrame(
        {"lk": lk, "sk": sk}
    )


def _reference(orders: pd.DataFrame, lines: pd.DataFrame, k: int):
    """Obvious dense power iteration with the same integer arithmetic."""
    m = lines.merge(orders, left_on="lk", right_on="ok")
    pairs = pd.DataFrame(
        {"cn": m["ck"] * 2, "sn": m["sk"] * 2 + 1}
    ).drop_duplicates()
    src = np.concatenate([pairs["cn"].to_numpy(), pairs["sn"].to_numpy()])
    dst = np.concatenate([pairs["sn"].to_numpy(), pairs["cn"].to_numpy()])
    nodes = np.unique(src)
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    r = np.full(n, gr.PAGERANK_SCALE // n, dtype=np.int64)
    base = (15 * (gr.PAGERANK_SCALE // n)) // 100
    deg = np.zeros(n, dtype=np.int64)
    for u in src:
        deg[idx[u]] += 1
    for _ in range(k):
        s = np.zeros(n, dtype=np.int64)
        for u, v in zip(src, dst):
            s[idx[v]] += r[idx[u]] // deg[idx[u]]
        r = base + (85 * s) // 100
    return nodes, r, n


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pagerank_matches_bruteforce_randomized(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    sf, orders, lines = _tiny_graph_dir(tmp_path, rng)
    got = (
        gr.supplier_pagerank(sf, top=10**9)
        .to_pandas()
        .sort_values(["kind", "entity_id"])
        .reset_index(drop=True)
    )
    nodes, r, n = _reference(orders, lines, gr.PAGERANK_K)
    want = (
        pd.DataFrame(
            {
                "kind": np.where(nodes % 2 == 0, "customer", "supplier"),
                "entity_id": nodes // 2,
                "rank_scaled": r,
            }
        )
        .sort_values(["kind", "entity_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["kind", "entity_id", "rank_scaled"]], want
    )
    # conservation: damping holds 15% at base + 85% of (leaky) sums, so
    # total mass stays within the floor-division leak of SCALE
    total = int(got["rank_scaled"].sum())
    assert 0.98 * gr.PAGERANK_SCALE < total <= gr.PAGERANK_SCALE
