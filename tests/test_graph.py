"""Connected components (stages/graph.py) and the dedup clustering queries."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from nostr_data_pipeline_ray.stages import graph
from nostr_data_pipeline_ray.stages.graph import connected_components

# every unit graph here is tiny, so exercise BOTH execution paths: the
# single-task numpy fast path (default for small edge sets) and the
# distributed checkpointed loop (forced by zeroing the fast-path cap)
BOTH_PATHS = pytest.mark.parametrize("local_cap", [graph._LOCAL_MAX_EDGES, -1],
                                     ids=["local", "distributed"])


def _labels_of(edges_df: pd.DataFrame, monkeypatch, local_cap) -> dict[int, int]:
    monkeypatch.setattr(graph, "_LOCAL_MAX_EDGES", local_cap)
    ds = rd.from_pandas(edges_df).repartition(3)
    out = connected_components(ds, input_bytes=1)
    return dict(zip(*(out.to_pandas()[c] for c in ("node", "label"))))


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    roots = {}
    for x in list(parent):
        roots.setdefault(find(x), []).append(x)
    return {x: min(members) for members in roots.values() for x in members}


@BOTH_PATHS
def test_triangle_plus_pairs(monkeypatch, local_cap):
    edges = [(45, 267), (267, 413), (45, 413), (8, 245), (98, 290)]
    got = _labels_of(pd.DataFrame(edges, columns=["src", "dst"]), monkeypatch, local_cap)
    assert got == _union_find(edges)
    assert got[413] == 45  # transitive closure, not just pair grouping


@BOTH_PATHS
def test_long_path_needs_many_rounds(monkeypatch, local_cap):
    # path 0-1-2-...-11: diameter 11 forces the propagation loop to iterate
    # well past one round; min label 0 must reach the far end
    edges = [(i, i + 1) for i in range(11)]
    got = _labels_of(pd.DataFrame(edges, columns=["src", "dst"]), monkeypatch, local_cap)
    assert set(got.values()) == {0}
    assert len(got) == 12


@BOTH_PATHS
def test_orientation_and_duplicates_irrelevant(monkeypatch, local_cap):
    edges = [(7, 3), (3, 7), (3, 9), (9, 3), (9, 7)]
    got = _labels_of(pd.DataFrame(edges, columns=["src", "dst"]), monkeypatch, local_cap)
    assert got == {3: 3, 7: 3, 9: 3}


@BOTH_PATHS
def test_random_graph_matches_union_find(monkeypatch, local_cap):
    rng = np.random.default_rng(7)
    edges = [tuple(sorted(p)) for p in rng.integers(0, 60, size=(40, 2)) if p[0] != p[1]]
    got = _labels_of(pd.DataFrame(edges, columns=["src", "dst"]), monkeypatch, local_cap)
    assert got == _union_find(edges)


def test_convergence_cap_raises(monkeypatch):
    # the cap only exists on the distributed loop; force past the fast path
    monkeypatch.setattr(graph, "_LOCAL_MAX_EDGES", -1)
    edges = pd.DataFrame([(i, i + 1) for i in range(10)], columns=["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(rd.from_pandas(edges), input_bytes=1, max_rounds=2)


def test_dedup_cluster_queries_consistent(tmp_path):
    """Planted corpus: near-identical chain a~b~c plus unrelated docs —
    clusters must merge the chain; survivors = canonicals only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    texts = [
        base + "alpha",
        base + "alpha beta",  # ~ doc0
        base + "alpha beta gamma",  # ~ doc1 (chain to doc0)
        "completely different content about distributed dataflow engines",
        "unrelated short text with its own vocabulary entirely",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["t"] * 5),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    from nostr_data_pipeline_ray.pipelines.dedup import (
        q_dedup_clusters,
        q_dedup_survivors,
    )

    cl = q_dedup_clusters(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert list(cl.loc[[0, 1, 2], "cluster_id"]) == [0, 0, 0]
    assert list(cl.loc[[3, 4], "cluster_id"]) == [3, 4]
    assert list(cl["is_canonical"]) == [True, False, False, True, True]

    surv = q_dedup_survivors(str(tmp_path)).to_pandas()
    assert sorted(surv["doc_id"]) == [0, 3, 4]


def test_dedup_clusters_no_edges(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["aaa bbb ccc", "ddd eee fff", "ggg hhh iii"]
    t = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    from nostr_data_pipeline_ray.pipelines.dedup import (
        q_dedup_clusters,
        q_dedup_survivors,
    )

    cl = q_dedup_clusters(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(cl["cluster_id"]) == [0, 1, 2]
    assert cl["is_canonical"].all()
    assert len(q_dedup_survivors(str(tmp_path)).to_pandas()) == 3


def test_minhash_cluster_path_agrees_with_exact(tmp_path):
    """The LSH-mined scale path and the exact bigram path must produce the
    same clusters on a corpus of obvious near-dups (MinHash recall on
    ~0.95-Jaccard pairs is effectively 1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nostr_data_pipeline_ray.pipelines.dedup import (
        q_dedup_clusters,
        q_dedup_clusters_minhash,
    )

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    texts = [
        base + "alpha",
        base + "alpha beta",
        base + "alpha beta gamma",  # 3-doc chain
        "completely different content about distributed dataflow engines",
        "unrelated short text with its own vocabulary entirely",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["t"] * 5),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    exact = q_dedup_clusters(str(tmp_path)).to_pandas().sort_values("doc_id")
    lsh = q_dedup_clusters_minhash(str(tmp_path)).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), lsh.reset_index(drop=True)
    )
    assert list(exact["cluster_id"]) == [0, 0, 0, 3, 4]


def test_resume_from_checkpoint(tmp_path, monkeypatch):
    """A crashed distributed run restarts from its highest committed
    checkpoint: the resumed run executes fewer propagation rounds than a
    fresh run and produces the same labels."""
    monkeypatch.setattr(graph, "_LOCAL_MAX_EDGES", -1)
    edges_df = pd.DataFrame([(i, i + 1) for i in range(11)], columns=["src", "dst"])

    rounds = {"n": 0}
    real_join = graph.bucketed_hash_join

    def counting_join(*a, **k):
        rounds["n"] += 1
        return real_join(*a, **k)

    monkeypatch.setattr(graph, "bucketed_hash_join", counting_join)

    # fresh run to completion (reference round count + expected labels)
    want = connected_components(
        rd.from_pandas(edges_df), input_bytes=1, scratch_dir=str(tmp_path / "a")
    ).to_pandas().sort_values("node").reset_index(drop=True)
    full_rounds = rounds["n"]
    assert set(want["label"]) == {0}

    # crash after 2 rounds, leaving a committed checkpoint behind
    scratch = str(tmp_path / "b")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            rd.from_pandas(edges_df), input_bytes=1, max_rounds=2,
            scratch_dir=scratch,
        )
    assert graph._checkpoints(scratch) == [2]

    rounds["n"] = 0
    got = connected_components(
        rd.from_pandas(edges_df), input_bytes=1, scratch_dir=scratch
    ).to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert 0 < rounds["n"] < full_rounds  # resumed, did not start from 0


def test_stale_scratch_from_different_graph_starts_fresh(tmp_path, monkeypatch):
    """A scratch dir left by a DIFFERENT edge set must be discarded, not
    resumed — the edge-row-count witness in meta.json catches it."""
    monkeypatch.setattr(graph, "_LOCAL_MAX_EDGES", -1)
    scratch = str(tmp_path / "s")
    a = pd.DataFrame([(1, 2), (2, 3), (10, 11)], columns=["src", "dst"])
    b = pd.DataFrame([(5, 6), (6, 7)], columns=["src", "dst"])
    connected_components(rd.from_pandas(a), input_bytes=1, scratch_dir=scratch)
    got = connected_components(
        rd.from_pandas(b), input_bytes=1, scratch_dir=scratch
    ).to_pandas()
    assert dict(zip(got["node"], got["label"])) == {5: 5, 6: 5, 7: 5}
