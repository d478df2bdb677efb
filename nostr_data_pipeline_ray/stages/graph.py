"""Distributed connected components — the clustering step of near-dup dedup.

Pair mining (Jaccard / MinHash-LSH / embedding-LSH) emits EDGES between
near-duplicate documents; turning pairs into dedup GROUPS is a connected-
components problem (a~b, b~c must collapse into one group even when a~c was
never emitted). The min-id member of each component is the canonical
survivor — the convention the exact dedup sink already uses
(pipelines/cdc.py first-writer-wins, analytics.q_dedup_documents_exact).

Algorithm: min-label propagation WITH pointer jumping. Each round a node
takes the min over its own label, its neighbors' labels, and its label's
label — the pointer-jumping step that contracts chains geometrically (the
hash-to-min idea of Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14). Both message kinds ride ONE bucketed hash join per
round: the join relation is the edge set unioned with the REVERSED label
edges (label(v) -> v), so joining on the source and sending to the
destination delivers label(s) for a graph edge (s,d) and label(label(v))
for a label edge — then one bucketed min-aggregate folds messages into the
labels. All exchanges move the EDGE/LABEL set, never the corpus. Rounds =
O(log diameter) thanks to the jump. The label sum is monotone
non-increasing and strictly decreases until fixpoint, so a scalar ``Sum``
aggregate is the convergence witness (no distributed equality join).

Iteration state is CHECKPOINTED to staged parquet every round (the same
staged-exchange pattern as the CDC merge, pipelines/cdc.py): each round's
execution is rooted in files, never in the previous round's Dataset
lineage. Two naive alternatives both degrade superlinearly on this Ray
build — unioning last round's label Dataset into this round's plan doubles
the block count per round (observed 3,000+ map tasks and a 28 GB
driver-memory estimate by round 12 on a 5-edge graph), and even with
blocks/rows pinned constant, carrying Dataset handles across rounds showed
~2x per-round wall-time growth. File-rooted rounds are flat-cost, make the
loop resumable after a crash (the highest-numbered checkpoint is the
restart point), and on a multi-node cluster the scratch directory sits on
shared storage exactly like the CDC staged exchange.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd

import ray.data as rd
from ray.data.aggregate import Sum

from .joins import bucketed_hash_join
from .shuffle import bucketed_map_groups


def _min_by_node(g: pd.DataFrame) -> pd.DataFrame:
    return g.groupby("node", sort=False)["label"].min().reset_index()


# Each distributed round costs a fixed ~2-3 s of plan/shuffle overhead
# REGARDLESS of edge count (bucketed join + bucketed min + checkpoint), so a
# small graph pays seconds-per-round for microseconds of work. Below this
# edge count the whole loop runs vectorized inside ONE Ray task instead —
# same algorithm (min-label propagation + pointer jump), same fixpoint, same
# min-id labels, zero shuffles. 4M edges ≈ 64 MB of int64 pairs: comfortably
# one block, and numpy rounds are O(E) each with O(log diameter) rounds.
_LOCAL_MAX_EDGES = 4_000_000


def _cc_local(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    src = df["src"].to_numpy(dtype=np.int64)
    dst = df["dst"].to_numpy(dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s, d = inv[: len(src)], inv[len(src) :]
    label = np.arange(len(nodes))
    while True:
        new = label.copy()
        np.minimum.at(new, d, label[s])  # neighbor labels, both directions
        np.minimum.at(new, s, label[d])
        new = np.minimum(new, new[new])  # pointer jump: label's label
        if np.array_equal(new, label):
            break
        label = new
    # dense indices are sorted by node id, so index-min == min node id
    return pd.DataFrame({"node": nodes, "label": nodes[label]})


def connected_components(
    edges,
    input_bytes: int | None = None,
    max_rounds: int = 48,
    scratch_dir: str | None = None,
):
    """Component label per node of an undirected edge Dataset.

    ``edges``: Dataset with int64 columns ``src``/``dst``, one row per
    undirected edge (orientation and duplicates don't matter). Returns a
    Dataset ``(node, label)`` covering every node that appears in an edge —
    isolated nodes are the caller's complement (a left join against the
    corpus, null → own id), so the loop never touches the corpus itself.

    ``input_bytes`` sizes the bucket count of every exchange (see
    stages/shuffle.resolve_buckets); pass the pair-mining input size.
    ``scratch_dir`` hosts the per-round label checkpoints (shared storage
    on a real cluster); a fresh tempdir under /tmp by default, removed on
    every exit path — success, non-convergence, or a mid-round error. The
    final label set is materialized before intermediates are deleted.

    RESUME: rerunning with the same ``scratch_dir`` and the same edge set
    restarts from the highest committed checkpoint instead of round 0 — a
    crashed run loses at most one round. Checkpoints are committed by
    atomic directory rename, and a meta file records the edge-set row count
    so a scratch left by a DIFFERENT graph is discarded, not resumed.
    """
    n_edges = edges.count()
    if n_edges == 0:
        # the empty graph has no labeled nodes — return the typed empty
        # frame here instead of feeding _cc_local a schema-less batch
        # (whose missing src/dst columns raised KeyError); callers no
        # longer need their own count()==0 guards
        import pyarrow as pa

        return rd.from_arrow(
            pa.schema([("node", pa.int64()), ("label", pa.int64())])
            .empty_table()
        )
    if n_edges <= _LOCAL_MAX_EDGES and scratch_dir is None:
        # small-graph fast path: the edge set fits one block — run the loop
        # in a single task (still off-driver) instead of paying the fixed
        # per-round shuffle overhead of the distributed loop
        return (
            edges.repartition(1)
            .map_batches(_cc_local, batch_format="pandas", batch_size=None)
            .materialize()
        )

    scratch = scratch_dir or tempfile.mkdtemp(prefix="cc-", dir="/tmp")
    os.makedirs(scratch, exist_ok=True)
    try:
        return _cc_loop(edges, scratch, input_bytes, max_rounds, n_edges)
    finally:
        if scratch_dir is None:
            shutil.rmtree(scratch, ignore_errors=True)


def _fresh_write(ds, path: str) -> None:
    # write into a tmp dir, then COMMIT by atomic rename — a crash mid-write
    # can never leave a partial checkpoint that a resume would read; also
    # guards against write_parquet appending into an existing dir
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)


def _checkpoints(scratch: str) -> list[int]:
    out = []
    for d in os.listdir(scratch):
        stem, _, num = d.partition("-")
        if stem == "labels" and num.isdigit() and os.path.isdir(
            os.path.join(scratch, d)
        ):
            out.append(int(num))
    return sorted(out)


def _cc_loop(
    edges, scratch: str, input_bytes: int | None, max_rounds: int, n_edges: int
):
    import json

    def symmetrize(b: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"s": b["src"], "d": b["dst"]})
        rev = pd.DataFrame({"s": b["dst"], "d": b["src"]})
        return pd.concat([fwd, rev], ignore_index=True)

    edges_path = os.path.join(scratch, "edges")
    meta_path = os.path.join(scratch, "meta.json")

    def labels_path(r: int) -> str:
        return os.path.join(scratch, f"labels-{r}")

    # resume: same scratch + same edge-set row count + a committed
    # checkpoint → restart from the highest round. The row count is a cheap
    # identity witness; a scratch left by a different graph starts fresh.
    resumable = False
    if os.path.exists(meta_path) and os.path.isdir(edges_path):
        try:
            with open(meta_path) as f:
                resumable = json.load(f).get("edge_rows") == n_edges
        except (ValueError, OSError):
            resumable = False
    ckpts = _checkpoints(scratch) if resumable else []

    prev_sum: int | None = None
    if ckpts:
        start = ckpts[-1]
        # the sum of a committed checkpoint IS the `cur` of the round that
        # wrote it (and for labels-0, a valid floor: the sum is monotone
        # strictly decreasing until fixpoint, so an unchanged sum after the
        # next round correctly reads as convergence)
        prev_sum = int(
            rd.read_parquet(labels_path(start)).aggregate(Sum("label"))[
                "sum(label)"
            ]
        )
    else:
        for stale in os.listdir(scratch):  # different graph / torn state
            p = os.path.join(scratch, stale)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.remove(p)
        start = 0
        _fresh_write(
            edges.map_batches(symmetrize, batch_format="pandas"), edges_path
        )
        tmp_meta = meta_path + ".tmp"
        with open(tmp_meta, "w") as f:
            json.dump({"edge_rows": n_edges}, f)
        os.replace(tmp_meta, meta_path)

        # initial labels: node -> min(node, smallest neighbor) — one
        # exchange, already one propagation step ahead of the identity start
        _fresh_write(
            bucketed_map_groups(
                rd.read_parquet(edges_path).map_batches(
                    lambda b: pd.DataFrame(
                        {"node": b["s"], "label": b[["s", "d"]].min(axis=1)}
                    ),
                    batch_format="pandas",
                ),
                keys=["node"],
                fn=_min_by_node,
                pre=_min_by_node,
                input_bytes=input_bytes,
            ),
            labels_path(0),
        )

    for r in range(start, max_rounds):
        labels = rd.read_parquet(labels_path(r))
        # ONE join serves both propagation steps: the relation is the edge
        # set PLUS the reversed label edges (label(v) -> v), so a message
        # label(s) -> d delivers a neighbor's label when (s,d) is a graph
        # edge and label(label(v)) -> v (the pointer jump) when s = label(v)
        rel = rd.read_parquet(edges_path).union(
            labels.map_batches(
                lambda b: pd.DataFrame({"s": b["label"], "d": b["node"]}),
                batch_format="pandas",
            )
        )
        msgs = bucketed_hash_join(
            rel,
            labels,
            left_on=["s"],
            right_on=["node"],
            input_bytes=input_bytes,
        ).map_batches(
            lambda b: pd.DataFrame({"node": b["d"], "label": b["label"]}),
            batch_format="pandas",
        ).materialize()  # split consecutive all-to-alls (see shuffle.py note)
        # one heavy execution for the min pass; the convergence aggregate
        # and the checkpoint write both run off the materialized result
        # (cross-ROUND lineage stays file-rooted — only intra-round reuse)
        new_labels = bucketed_map_groups(
            labels.union(msgs),
            keys=["node"],
            fn=_min_by_node,
            pre=_min_by_node,
            input_bytes=input_bytes,
        ).materialize()
        cur = int(new_labels.aggregate(Sum("label"))["sum(label)"])
        if cur == prev_sum:
            return new_labels  # materialized — detached from scratch
        _fresh_write(new_labels, labels_path(r + 1))
        shutil.rmtree(labels_path(r), ignore_errors=True)
        prev_sum = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )
