"""Iterative graph ranking with an exact SQL oracle: integer PageRank.

``supplier_pagerank`` runs a damped random walk over the bipartite
customer↔supplier interaction graph (an edge per distinct customer/
supplier pair that shares an order) — the "influence score" family the
reference computes per-event (reference: transformers/event_processor.py
engagement scoring) lifted to a whole-graph iterative algorithm, and the
second iterative operator next to connected components (stages/graph.py).

Two design decisions make a 5-iteration PageRank *oracle-checkable*,
which float PageRank is not (a per-node float SUM over incoming
contributions is order-dependent, and a distributed sum cannot mirror
DuckDB's):

- **Fixed-point integer arithmetic.** Rank mass is carried as int64
  micro-units (SCALE = 10^12): r0 = SCALE // N for every node, each
  edge's contribution is ``r // outdeg`` (integer floor division), and
  damping is ``base + (85 * sum) // 100`` with
  ``base = (15 * (SCALE // N)) // 100``. Integer sums are associative —
  they ride the bucketed exchange in any order and still match the
  oracle bit-for-bit (the repo's exact-integer float contract applied to
  an iterative algorithm). The floor divisions leak O(outdeg) units per
  node per iteration — a deliberate, documented bias of ~1e-9 of total
  mass, identical on both sides.
- **Unrolled iterations.** K is part of the registered query's identity,
  so the oracle is K chained CTEs (one join + grouped sum each) —
  structurally parallel to the engine's loop.

Node encoding: ``customer c → 2c``, ``supplier s → 2s+1`` (the TPC-H key
spaces overlap). Edges are added in BOTH directions, so every node has
outdeg ≥ 1 (no dangling leak) and indeg ≥ 1 (every node appears in each
iteration's sum).

Scale story: the edge list is the big side and stays distributed — each
iteration is one map over edges plus one integer-sum exchange keyed by
dst (map-side combined). The rank table is O(nodes); below
``broadcast_max`` it rides a ``ray.put`` (one object, fetched once per
worker — the LM-score/PMI gate-or-join discipline), above it the attach
is a bucketed hash join and ranks never touch the driver. Both paths are
equivalence-tested. At 10^9 nodes the join path's per-iteration cost is
two exchanges over O(edges) rows — the same shape as the CC loop, which
checkpoints; K here is a small constant so the loop does not.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..stages.actors import cached_get
from ..stages.joins import bucketed_hash_join
from ..stages.shuffle import bucketed_sum_count, local_topk, table_bytes

PAGERANK_SCALE = 10**12
PAGERANK_K = 5
PAGERANK_TOP = 20
# nodes are (customers + suppliers); 2M ranks ≈ 32 MB as a Series — the
# same order as VOCAB_BROADCAST_MAX and well under a worker heap
NODE_BROADCAST_MAX = 2_000_000


def _t(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _edges_with_deg(sf_dir: str):
    """(src, dst, d): distinct bidirectional customer↔supplier edges with
    the source's out-degree attached once (reused every iteration)."""
    ob = table_bytes(_t(sf_dir, "orders"))
    lb = table_bytes(_t(sf_dir, "lineitem"))
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )
    lineitem = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"]
    )
    joined = bucketed_hash_join(
        lineitem, orders, left_on=["l_orderkey"], right_on=["o_orderkey"],
        how="inner", input_bytes=ob + lb,
    )
    # distinct (customer, supplier) pairs: grouped count, count discarded
    pairs = bucketed_sum_count(
        joined.map_batches(
            lambda b: pd.DataFrame(
                {
                    "cn": b["o_custkey"].to_numpy(dtype="int64") * 2,
                    "sn": b["l_suppkey"].to_numpy(dtype="int64") * 2 + 1,
                }
            ),
            batch_format="pandas",
        ),
        ["cn", "sn"], sums={}, count_as="_c", input_bytes=ob + lb,
    )

    def both_directions(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.concatenate([b["cn"].to_numpy(), b["sn"].to_numpy()]),
                "dst": np.concatenate([b["sn"].to_numpy(), b["cn"].to_numpy()]),
            }
        )

    edges = pairs.map_batches(both_directions, batch_format="pandas")
    deg = bucketed_sum_count(edges, ["src"], sums={}, count_as="d",
                             input_bytes=ob + lb).map_batches(
        lambda b: b.rename(columns={"src": "dsrc"}), batch_format="pandas"
    )
    return bucketed_hash_join(
        edges, deg, left_on=["src"], right_on=["dsrc"], how="inner",
        input_bytes=ob + lb,
    ).map_batches(
        lambda b: b[["src", "dst", "d"]], batch_format="pandas"
    ).materialize()


def _present(out: pd.DataFrame, n_nodes: int) -> pd.DataFrame:
    from ..functions.rounding import round6

    node = out["node"].to_numpy(dtype="int64")
    r = out["r"].to_numpy(dtype="int64")
    # cast each exact int to double BEFORE the multiply (an int64 product
    # r*n wraps past ~10^9 nodes; the IEEE double multiply/divide chain is
    # deterministic and mirrored op-for-op in the SQL), then the shared
    # half-away 6dp contract (np.round's half-to-even diverges from
    # DuckDB's round() on exact half-ties)
    rank = round6(
        r.astype(np.float64) * np.float64(n_nodes) / PAGERANK_SCALE
    )
    return pd.DataFrame(
        {
            "kind": np.where(node % 2 == 0, "customer", "supplier"),
            "entity_id": node // 2,
            "rank_scaled": r,
            "rank": rank,
            "_node": node,  # the oracle's tiebreaker (entity_id can tie
            # across kinds at equal rank; node cannot)
        }
    )


_EMPTY_RESULT = pa.schema(
    [("kind", pa.string()), ("entity_id", pa.int64()),
     ("rank_scaled", pa.int64()), ("rank", pa.float64())]
)


def _pagerank_local(sf_dir: str, k: int, top: int):
    """Single-process twin for gate-small sources (the shared
    LOCAL_MAX_INPUT_BYTES discipline): identical integer arithmetic, so
    output is bit-identical to the distributed plan (equivalence-tested).
    The per-iteration Ray exchange is pure fixed overhead when the whole
    edge list is a few MB."""
    import pyarrow.parquet as pq

    o = pq.read_table(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    li = pq.read_table(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"]
    ).to_pandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    cn = m["o_custkey"].to_numpy(dtype="int64") * 2
    sn = m["l_suppkey"].to_numpy(dtype="int64") * 2 + 1
    pairs = pd.DataFrame({"cn": cn, "sn": sn}).drop_duplicates()
    src = np.concatenate([pairs["cn"].to_numpy(), pairs["sn"].to_numpy()])
    dst = np.concatenate([pairs["sn"].to_numpy(), pairs["cn"].to_numpy()])
    nodes, s_idx = np.unique(src, return_inverse=True)
    d_idx = np.searchsorted(nodes, dst)  # dst values ⊆ nodes (bidirectional)
    deg = np.bincount(s_idx, minlength=len(nodes)).astype(np.int64)
    n_nodes = len(nodes)
    if n_nodes == 0:  # empty join: the oracle yields zero rows, so do we
        return rd.from_arrow(_EMPTY_RESULT.empty_table())
    r = np.full(n_nodes, PAGERANK_SCALE // n_nodes, dtype=np.int64)
    base = (15 * (PAGERANK_SCALE // n_nodes)) // 100
    for _ in range(k):
        contrib = r[s_idx] // deg[s_idx]
        s = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(s, d_idx, contrib)
        r = base + (85 * s) // 100
    pr = _present(pd.DataFrame({"node": nodes, "r": r}), n_nodes)
    pr = (
        pr.sort_values(["rank_scaled", "_node"], ascending=[False, True],
                       kind="mergesort")
        .head(top)
        .drop(columns=["_node"])
        .reset_index(drop=True)
    )
    return rd.from_pandas(pr)


def supplier_pagerank(
    sf_dir: str,
    k: int = PAGERANK_K,
    top: int = PAGERANK_TOP,
    broadcast_max: int = NODE_BROADCAST_MAX,
    allow_local: bool = True,
):
    from ..stages.shuffle import LOCAL_MAX_INPUT_BYTES

    src_bytes = table_bytes(_t(sf_dir, "orders")) + table_bytes(
        _t(sf_dir, "lineitem")
    )
    if allow_local and src_bytes <= LOCAL_MAX_INPUT_BYTES:
        return _pagerank_local(sf_dir, k, top)

    edges = _edges_with_deg(sf_dir)
    in_bytes = edges.size_bytes()
    # node ids: every node appears as a src (bidirectional edges);
    # materialized so count() + the branch below don't re-run the
    # O(edges) grouped count
    deg_tbl = bucketed_sum_count(edges, ["src"], sums={}, count_as="_e",
                                 input_bytes=in_bytes).materialize()
    n_nodes = deg_tbl.count()
    if n_nodes == 0:
        return rd.from_arrow(_EMPTY_RESULT.empty_table())
    r0 = PAGERANK_SCALE // n_nodes
    base = (15 * r0) // 100

    if n_nodes <= broadcast_max:
        # gate-bounded driver state: the rank Series is O(nodes), each
        # iteration collects exactly one O(nodes) integer table back
        nodes = deg_tbl.to_pandas()["src"].to_numpy(dtype="int64")
        ranks = pd.Series(np.full(len(nodes), r0, dtype=np.int64), index=nodes)
        for _ in range(k):
            ref = ray.put(ranks)

            def contrib(b: pd.DataFrame, ref=ref) -> pd.DataFrame:
                r = cached_get(ref)
                src = b["src"].to_numpy(dtype="int64")
                c = r.reindex(src).to_numpy(dtype="int64") // b["d"].to_numpy(
                    dtype="int64"
                )
                return pd.DataFrame({"dst": b["dst"], "c": c})

            sums = bucketed_sum_count(
                edges.map_batches(contrib, batch_format="pandas"),
                ["dst"], sums={"c": "s"}, input_bytes=in_bytes,
            ).to_pandas()
            # bidirectional edges ⇒ indeg ≥ 1 everywhere: the sum covers
            # every node, so the reindex below never fills
            s = pd.Series(
                sums["s"].to_numpy(dtype="int64"),
                index=sums["dst"].to_numpy(dtype="int64"),
            ).reindex(ranks.index, fill_value=0)
            ranks = base + (85 * s) // 100
        out = pd.DataFrame(
            {"node": ranks.index.to_numpy(), "r": ranks.to_numpy()}
        )
        ranked = rd.from_pandas(out)
    else:
        # distributed path: ranks never leave the cluster; attach by a
        # bucketed join on src each iteration
        ranked = deg_tbl.map_batches(
            lambda b: pd.DataFrame(
                {
                    "node": b["src"].to_numpy(dtype="int64"),
                    "r": np.full(len(b), r0, dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )
        for _ in range(k):
            with_r = bucketed_hash_join(
                edges, ranked, left_on=["src"], right_on=["node"],
                how="inner", input_bytes=in_bytes,
            )
            sums = bucketed_sum_count(
                with_r.map_batches(
                    lambda b: pd.DataFrame(
                        {
                            "dst": b["dst"],
                            "c": b["r"].to_numpy(dtype="int64")
                            // b["d"].to_numpy(dtype="int64"),
                        }
                    ),
                    batch_format="pandas",
                ),
                ["dst"], sums={"c": "s"}, input_bytes=in_bytes,
            )
            ranked = sums.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "node": b["dst"].to_numpy(dtype="int64"),
                        "r": base
                        + (85 * b["s"].to_numpy(dtype="int64")) // 100,
                    }
                ),
                batch_format="pandas",
            ).materialize()

    topk = local_topk(
        ranked.map_batches(
            lambda b: _present(b, n_nodes), batch_format="pandas"
        ),
        by=["rank_scaled", "_node"], descending=[True, False], k=top,
    )
    return topk.map_batches(
        lambda b: b.drop(columns=["_node"]), batch_format="pandas"
    )


def q_supplier_pagerank(sf_dir: str):
    return supplier_pagerank(sf_dir)


def _iter_cte(i: int) -> str:
    return f"""r{i} AS (
    SELECT n.node,
           (SELECT base FROM params) + (85 * COALESCE(s.s, 0)) // 100 AS r
    FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(sum(r.r // e.d) AS BIGINT) AS s
        FROM edges e JOIN r{i - 1} r ON e.src = r.node
        GROUP BY e.dst
    ) s ON n.node = s.node
)"""


_PAGERANK_SQL = f"""
WITH pairs AS (
    SELECT DISTINCT o_custkey * 2 AS cn, l_suppkey * 2 + 1 AS sn
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), dedges AS (
    SELECT cn AS src, sn AS dst FROM pairs
    UNION ALL
    SELECT sn AS src, cn AS dst FROM pairs
), deg AS (
    SELECT src, CAST(count(*) AS BIGINT) AS d FROM dedges GROUP BY src
), edges AS (
    SELECT e.src, e.dst, deg.d FROM dedges e JOIN deg ON e.src = deg.src
), nodes AS (
    SELECT DISTINCT src AS node FROM dedges
), params AS (
    SELECT CAST({PAGERANK_SCALE} // count(*) AS BIGINT) AS r0,
           CAST((15 * ({PAGERANK_SCALE} // count(*))) // 100 AS BIGINT)
               AS base,
           CAST(count(*) AS BIGINT) AS n
    FROM nodes
), r0 AS (
    SELECT node, (SELECT r0 FROM params) AS r FROM nodes
), {", ".join(_iter_cte(i) for i in range(1, PAGERANK_K + 1))}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       node // 2 AS entity_id,
       r AS rank_scaled,
       round(CAST(r AS DOUBLE) * CAST((SELECT n FROM params) AS DOUBLE)
             / {PAGERANK_SCALE}, 6) AS rank
FROM r{PAGERANK_K} ORDER BY rank_scaled DESC, node LIMIT {PAGERANK_TOP}
"""


QUERIES = {
    "supplier_pagerank": q_supplier_pagerank,
}
ORACLE = {
    "supplier_pagerank": _PAGERANK_SQL,
}
