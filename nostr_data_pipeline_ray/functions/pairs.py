"""Vectorized within-group (i < j) pair enumeration.

The shared kernel behind every inverted-index / co-occurrence pipeline
(word-Jaccard pairing in ``pipelines/dedup.py``, market-basket pairing in
``pipelines/analytics.py``): given rows already SORTED so each group is a
contiguous run, emit every unordered pair of rows inside a run with zero
per-group Python — repeat/arange arithmetic only.

Each row at rank r of a size-s run leads ``s - r - 1`` pairs, and its
partners are the ranks r+1 .. s-1, contiguous because the run is. The pair
count is quadratic in run size by nature — CALLERS own the fan-out bound
(a df cap for word postings, the small-basket premise for orders).
"""

from __future__ import annotations

import numpy as np


def within_group_pair_indices(grp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Row-index pairs (a_idx, b_idx), a_idx < b_idx, for all pairs within
    each contiguous run of equal values in ``grp``. ``grp`` must be
    run-contiguous (e.g. the primary key of a lexsort); values need not be
    globally sorted.
    """
    n = len(grp)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    run_break = np.concatenate([[True], grp[1:] != grp[:-1]])
    run_id = np.cumsum(run_break) - 1
    run_sizes = np.bincount(run_id)
    run_starts = np.concatenate([[0], np.cumsum(run_sizes[:-1])])
    rank = np.arange(n) - run_starts[run_id]
    reps = run_sizes[run_id] - rank - 1
    a_idx = np.repeat(np.arange(n), reps)
    rstart = np.cumsum(reps) - reps
    b_idx = a_idx + (np.arange(int(reps.sum())) - np.repeat(rstart, reps) + 1)
    return a_idx, b_idx
