"""Approximate string matching: fuzzy dictionary join by edit distance.

``fuzzy_part_match`` matches every part name against a small canonical
dictionary with unit-cost Levenshtein distance ≤ 2 — the spell-correction
/ entity-resolution primitive (match dirty names to a reference list).
The reference engine has no fuzzy matching; this extends its exact
substring search (analytics/query.py:326-353) the same way the near-dup
family extends exact dedup.

Design: the dictionary is tiny and broadcast (a module constant here; a
``ray.put`` table in the general case), so matching is a pure map with
ZERO exchanges — the scale story is O(rows × |dict| × len²) vectorized
work, embarrassingly parallel. The Levenshtein kernel is a fully
vectorized Wagner–Fischer: one pattern against the whole batch at once
(numpy UCS-4 view → (rows, maxlen) codepoint matrix; the insertion
recurrence's left-to-right dependency is closed by the min-plus scan
``minimum.accumulate(t − j) + j``), no Python loop over rows. The
all-pairs variant (every name against every name) is deliberately NOT
offered: at scale that is a quadratic join — the bucketed MinHash/LSH
family is the right tool there.

Oracle: DuckDB's native ``levenshtein`` over the same CROSS JOIN —
integer distances, no float contract at all.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

from ..stages.shuffle import table_bytes

# canonical dictionary: deliberately near-miss spellings of real catalog
# names (the fixtures build p_name as adjective+noun) so every entry has
# distance-1 and distance-2 matches — part of the registered query's
# identity, mirrored into the oracle SQL
CANON = ("gold bolt", "red widge", "small rig")
MAX_DIST = 2


def levenshtein_many(pattern: str, names: np.ndarray) -> np.ndarray:
    """Unit-cost edit distance of ``pattern`` against every string in
    ``names`` (object/str array), vectorized across the batch. Matches
    DuckDB's ``levenshtein`` exactly (pinned in tests)."""
    n = len(names)
    p = np.frombuffer(pattern.encode("utf-32-le"), dtype=np.uint32)
    m = len(p)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    u = np.asarray(names, dtype="U")  # UCS-4, zero-padded fixed width
    width = max(1, u.dtype.itemsize // 4)
    mat = np.ascontiguousarray(u).view(np.uint32).reshape(n, width)
    lens = (mat != 0).sum(axis=1)  # no interior NULs in real strings
    if m == 0:
        return lens.astype(np.int64)

    ar = np.arange(width + 1, dtype=np.int64)
    prev = np.broadcast_to(ar, (n, width + 1)).copy()  # D[0, j] = j
    for i in range(1, m + 1):
        neq = (mat != p[i - 1]).astype(np.int64)
        # t[:, j-1] = min(delete: D[i-1, j] + 1, substitute: D[i-1, j-1] + neq)
        t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + neq)
        # insert recurrence D[i, j] = min(t[:, j-1], D[i, j-1] + 1) is a
        # running min: D[i, j] = j + min_{k<=j}(base_k - k), base_0 = i
        v = np.concatenate([np.full((n, 1), i, dtype=np.int64), t - ar[1:]], axis=1)
        prev = np.minimum.accumulate(v, axis=1) + ar
    return prev[np.arange(n), lens]


def fuzzy_part_match(
    sf_dir: str,
    canon: tuple[str, ...] = CANON,
    max_dist: int = MAX_DIST,
):
    """(p_partkey, p_name, canonical, dist) for every part whose name is
    within ``max_dist`` edits of a dictionary entry."""
    path = os.path.join(sf_dir, "part.parquet")
    blocks = min(64, max(2, table_bytes(path) >> 20))
    parts = rd.read_parquet(
        path, columns=["p_partkey", "p_name"], override_num_blocks=blocks
    )

    def match(batch: pd.DataFrame) -> pd.DataFrame:
        names = batch["p_name"].to_numpy()
        keys = batch["p_partkey"].to_numpy()
        frames = []
        for c in canon:
            d = levenshtein_many(c, names)
            hit = d <= max_dist
            if hit.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "p_partkey": keys[hit],
                            "p_name": names[hit],
                            "canonical": c,
                            "dist": d[hit],
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(
                {
                    "p_partkey": pd.array([], dtype="int64"),
                    "p_name": pd.array([], dtype="str"),
                    "canonical": pd.array([], dtype="str"),
                    "dist": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(frames, ignore_index=True)

    return parts.map_batches(match, batch_format="pandas")


def q_fuzzy_part_match(sf_dir: str):
    return fuzzy_part_match(sf_dir)


_FUZZY_SQL = f"""
    WITH canon(name) AS (
        VALUES {", ".join(f"('{c}')" for c in CANON)}
    )
    SELECT p_partkey, p_name, canon.name AS canonical,
           CAST(levenshtein(p_name, canon.name) AS BIGINT) AS dist
    FROM part CROSS JOIN canon
    WHERE levenshtein(p_name, canon.name) <= {MAX_DIST}
"""


QUERIES = {
    "fuzzy_part_match": q_fuzzy_part_match,
}
ORACLE = {
    "fuzzy_part_match": _FUZZY_SQL,
}
