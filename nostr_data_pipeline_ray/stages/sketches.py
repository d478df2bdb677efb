"""Mergeable sketches — the approximate scale path for distinct counts.

SURVEY.md §2.5 note: the reference's aggregates are all exact and the
correctness oracle requires exact results, but at 10^10-event scale a
grouped COUNT(DISTINCT) shuffles every (key, value) pair; a HyperLogLog
register vector per group ships ~2^p bytes per group per block instead and
merges with an elementwise max (the canonical sketch pattern: one sketch
per batch, tiny merge stage).

Pure numpy implementation (dense HLL, p-bit bucketing, classic bias
correction + linear-counting small-range correction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class HyperLogLog:
    def __init__(self, p: int = 12):
        assert 4 <= p <= 16
        self.p = p
        self.m = 1 << p
        if self.m >= 128:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        elif self.m == 64:
            self.alpha = 0.709
        else:
            self.alpha = 0.673

    def registers(self, values: np.ndarray) -> np.ndarray:
        """Register vector (uint8[m]) for a batch of values (any dtype)."""
        h = pd.util.hash_array(np.asarray(values))
        bucket = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = leading zeros of w + 1 (w == 0 → max rank)
        rank = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = w != 0
        # floor(log2(w)) via float conversion is exact for the top 53 bits,
        # which covers every leading-zero count we can represent
        lz = 63 - np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
        rank[nz] = (lz + 1).astype(np.uint8)
        regs = np.zeros(self.m, dtype=np.uint8)
        np.maximum.at(regs, bucket, rank)
        return regs

    @staticmethod
    def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.maximum(a, b)

    def estimate(self, regs: np.ndarray) -> int:
        regs = np.asarray(regs, dtype=np.float64)
        e = self.alpha * self.m * self.m / np.sum(2.0 ** (-regs))
        zeros = int((regs == 0).sum())
        if e <= 2.5 * self.m and zeros > 0:
            e = self.m * np.log(self.m / zeros)  # linear counting
        return int(round(e))
