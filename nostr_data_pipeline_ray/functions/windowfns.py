"""Window-function kernels shared by the analytics queries and their
property tests — kept as pure numpy functions so DuckDB-equivalence can be
pinned on randomized inputs without spinning a Ray pipeline per example."""

from __future__ import annotations

import numpy as np


def sql_ntile(rn: np.ndarray, n: np.ndarray, k: int) -> np.ndarray:
    """SQL NTILE(k): 1-based tile for each row of a partition, given the
    0-based in-partition row number ``rn`` (under the window's ORDER BY)
    and the partition size ``n`` (both int64, elementwise-aligned).

    Standard semantics: the first (n mod k) tiles hold ceil(n/k) rows, the
    rest floor(n/k) — vectorized as a split at ``(n mod k) * ceil(n/k)``
    rows. Partitions smaller than k number their rows 1..n (ceil = 1)."""
    rn = np.asarray(rn, dtype=np.int64)
    n = np.asarray(n, dtype=np.int64)
    big = -(-n // k)  # ceil(n/k): the first (n mod k) tiles' height
    r = n % k
    cut = r * big  # rows covered by the big tiles
    small = np.maximum(n // k, 1)
    return np.where(rn < cut, rn // big + 1, r + (rn - cut) // small + 1).astype(
        np.int64
    )
