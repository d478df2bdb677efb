"""Near-duplicate detection stages: MinHash+LSH, SimHash.

Actor-pool map_batches stages (hash parameters built once per actor).
Hashing uses pandas' stable 64-bit string hash so signatures are
deterministic across processes/runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_M61 = np.uint64((1 << 61) - 1)


def _hash_strings(values: list[str]) -> np.ndarray:
    return pd.util.hash_array(np.asarray(values, dtype=object))


def word_shingles(text: str, n: int = 3) -> list[str]:
    """Word n-gram shingles (deduped)."""
    words = text.split()
    if len(words) < n:
        return [" ".join(words)] if words else []
    return list({" ".join(words[i : i + n]) for i in range(len(words) - n + 1)})


class MinHashLSH:
    """text → (band, band_hash, doc_id) rows for LSH bucketing.

    k=num_perm minhashes over word-3-gram shingles; signatures sliced into
    ``bands`` bands of r rows; equal (band, band_hash) ⇒ candidate pair.
    Universal-hash family h_i(x) = (a_i·x + b_i) mod (2^61−1), seeded.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)
        self.num_perm, self.bands, self.ngram = num_perm, bands, ngram
        self.r = num_perm // bands
        # mixing constants for band hashing
        self.band_mix = rng.integers(1, _M61, size=self.r, dtype=np.uint64) | np.uint64(1)

    def signature(self, text: str) -> np.ndarray | None:
        sh = word_shingles(text, self.ngram)
        if not sh:
            return None
        base = _hash_strings(sh)  # (s,)
        # (k, s) universal hashes with uint64 wraparound, then row-min
        hashed = (self.a[:, None] * base[None, :] + self.b[:, None]) & _M61
        return hashed.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized across the batch: hash EVERY shingle of every doc
        # in one call, then per-doc minima via minimum.reduceat over the doc
        # boundary offsets (no per-doc Python in the hot path)
        shingle_lists = [word_shingles(t or "", self.ngram) for t in batch["text"]]
        counts = np.array([len(s) for s in shingle_lists], dtype=np.int64)
        keep = counts > 0
        doc_ids = batch["doc_id"].to_numpy()[keep]
        counts = counts[keep]
        if len(doc_ids) == 0:
            return pd.DataFrame(
                {
                    "band": np.array([], dtype=np.int32),
                    "band_hash": np.array([], dtype=np.int64),
                    "doc_id": np.array([], dtype=np.int64),
                }
            )
        flat = [s for lst in shingle_lists if lst for s in lst]
        base = _hash_strings(flat)  # (total_shingles,)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        # (k, total) universal hashes, per-doc min along shingle runs.
        # Shingles repeat heavily across documents (that is the whole premise
        # of near-dup detection), so hash each DISTINCT shingle once and
        # gather — measured 10x faster than the dense multiply on this
        # corpus (0.44 s vs 4.7 s for 260k shingles / 27k distinct): the
        # gather replaces two (k, total)-sized uint64 multiply+add temps.
        ub, inv = np.unique(base, return_inverse=True)
        uh = (self.a[:, None] * ub[None, :] + self.b[:, None]) & _M61
        sigs = np.minimum.reduceat(uh[:, inv], offsets, axis=1)  # (k, n_docs)
        banded = sigs.T.reshape(len(doc_ids), self.bands, self.r)
        bh = (banded * self.band_mix[None, None, :]).sum(axis=2, dtype=np.uint64)
        n = len(doc_ids)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(self.bands, dtype=np.int32), n),
                "band_hash": bh.reshape(-1).astype(np.int64),
                "doc_id": np.repeat(doc_ids, self.bands).astype(np.int64),
            }
        )


class SimHasher:
    """text → 64-bit SimHash over word features + 4 hamming-LSH band keys.

    Pairs agreeing on any 16-bit band have hamming distance concentrated
    low — the standard bucketing for ≤3-bit-difference candidates.
    """

    def __init__(self):
        self.bit_idx = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        words = (text or "").split()
        if not words:
            return 0
        h = _hash_strings(words)  # (w,) uint64
        bits = ((h[:, None] >> self.bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        v = (bits * 2 - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << self.bit_idx).sum(dtype=np.uint64))

    def _simhash_batch(self, texts) -> np.ndarray:
        # vectorized across the batch: one hash call for all words, bit
        # matrix once, per-doc sums via add.reduceat at doc offsets
        word_lists = [(t or "").split() for t in texts]
        counts = np.array([len(w) for w in word_lists], dtype=np.int64)
        out = np.zeros(len(texts), dtype=np.uint64)
        nz = counts > 0
        if not nz.any():
            return out
        flat = [w for ws in word_lists if ws for w in ws]
        h = _hash_strings(flat)
        # bit-expand each DISTINCT word hash once, then gather (vocabulary is
        # far smaller than total word count — same trick as MinHashLSH)
        uh, inv = np.unique(h, return_inverse=True)
        ubits = ((uh[:, None] >> self.bit_idx[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        signed = (ubits * 2 - 1)[inv]  # (total_words, 64)
        offsets = np.concatenate([[0], np.cumsum(counts[nz])[:-1]])
        v = np.add.reduceat(signed, offsets, axis=0)  # (n_nonempty, 64)
        packed = ((v > 0).astype(np.uint64) << self.bit_idx[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[nz] = packed
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = self._simhash_batch(batch["text"])
        out = pd.DataFrame({"doc_id": batch["doc_id"].astype("int64")})
        out["simhash"] = sh.astype(np.int64)  # two's-complement view for Arrow
        for i in range(4):
            out[f"band{i}"] = ((sh >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
        return out


def pairs_from_group(g: pd.DataFrame, max_group: int = 512) -> pd.DataFrame:
    """All (doc_a < doc_b) pairs within one LSH bucket.

    Buckets larger than ``max_group`` are truncated (a hot bucket at scale
    means a degenerate band — the cap bounds the quadratic blowup; the cut
    is logged via the emitted ``truncated`` flag rather than silently).
    """
    ids = np.sort(g["doc_id"].unique())
    truncated = len(ids) > max_group
    ids = ids[:max_group]
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "truncated": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "truncated": "bool"}
        )
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame(
        {"doc_a": ids[ia], "doc_b": ids[ib], "truncated": truncated}
    )
