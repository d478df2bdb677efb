"""Small shared vector kernels for the ANN / IVF family.

The naive pairwise squared-distance form
``((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)`` allocates an
O(rows × n_lists × dim) temporary — at a realistic index shape
(n_lists ≈ sqrt(n) ≈ 10^4, dim 768) that is ~250 GB for a 4096-row batch,
an OOM long before 100 TB. The expanded form here is O(rows × n_lists)
memory and BLAS-fast; ``tests/test_ann_index.py`` pins assignment
equivalence against the broadcast form.
"""

from __future__ import annotations

import numpy as np


def sq_dists(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Pairwise squared Euclidean distances ‖x_i − c_j‖² via
    ‖x‖² + ‖c‖² − 2·x@cᵀ. Memory O(len(x) × len(c)); negatives from
    float cancellation are clamped to 0."""
    x = np.asarray(x, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    d2 = (x * x).sum(axis=1)[:, None] + (c * c).sum(axis=1)[None, :]
    d2 -= 2.0 * (x @ c.T)
    np.maximum(d2, 0.0, out=d2)
    return d2
