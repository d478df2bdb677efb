"""Per-part-file bloom-filter sidecars for conversation point lookups.

The reference resolves a point read with a DB index probe
(`/root/reference/src/nostr_pipeline/loaders/event_loader.py:35-38`); this
engine's analog (`read_conversation`) prunes by partition key and then by
parquet row-group stats. A lake at 100 TB still leaves each candidate
partition with one base part plus a delta CHAIN (merge-on-read policy), and
a point read must open every file in the chain just to learn the
conversation isn't in it. The sidecar answers "definitely not in this
file" from a few hundred bytes, so a point read skips delta parts (and
false-candidate base parts) without touching their footers.

Design constraints:
* **Deterministic** — built purely from the part's `conv_id` column, so a
  retried merge task rewrites byte-identical sidecars (exactly-once safe).
* **Tombstone-complete** — delta parts include delete tombstones; their
  conv_ids MUST be in the filter, otherwise a skipped file could resurrect
  deleted turns. `build()` takes the raw column, tombstones and all.
* **Optional** — a missing/corrupt sidecar means "read the file"; readers
  never fail because of a sidecar, and old lakes keep working.

Format (little-endian): magic ``b"NBLM2"`` + uint32 k + uint64 m_bits +
packed bit array.  Double hashing (Kirsch–Mitzenmacher) over two
independent 64-bit siphashes (``pd.util.hash_array`` with two fixed keys —
deterministic across processes, vectorized over the whole column):
bit_i = (h1 + i*h2) mod m.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MAGIC = b"NBLM2"
_BITS_PER_KEY = 10  # ~1% false-positive rate at k=7
_K = 7
_KEY1 = "nblm-sidecar-h1."  # 16 bytes each, fixed — sidecars must hash
_KEY2 = "nblm-sidecar-h2."  # identically in every process and session
_MAX_K = 64

#: process-local read diagnostics (driver-side point reads only; tests and
#: the CLI report read them — not a distributed metric)
stats = {"files_skipped": 0, "files_read": 0}


def sidecar_path(part_path: str) -> str:
    return part_path + ".bloom"


def _hash_pairs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hashes per value, vectorized."""
    h1 = pd.util.hash_array(values, hash_key=_KEY1, categorize=False)
    h2 = pd.util.hash_array(values, hash_key=_KEY2, categorize=False)
    return h1, h2 | np.uint64(1)  # odd stride ⇒ full cycle for pow-2 m


def build(conv_ids: pa.Array | pa.ChunkedArray) -> bytes:
    """Serialize a bloom filter over the DISTINCT values of ``conv_ids``."""
    distinct = pc.unique(
        conv_ids.combine_chunks() if isinstance(conv_ids, pa.ChunkedArray) else conv_ids
    ).drop_null()
    n = max(1, len(distinct))
    m = 1 << max(6, (n * _BITS_PER_KEY - 1).bit_length())  # pow2 ≥ 10n, ≥64
    bits = np.zeros(m, dtype=bool)
    if len(distinct):
        h1, h2 = _hash_pairs(np.asarray(distinct.to_pylist(), dtype=object))
        mask = np.uint64(m - 1)
        for i in range(_K):  # k vector ops, no per-value Python
            bits[(h1 + np.uint64(i) * h2) & mask] = True
    return _MAGIC + struct.pack("<IQ", _K, m) + np.packbits(bits, bitorder="little").tobytes()


def header_ok(blob: bytes) -> bool:
    """Full header validation — the exact checks ``contains`` performs
    before trusting a blob (magic, sane k, power-of-two m, body length).
    A failing blob makes reads FAIL OPEN (never skip), which is correct
    but silently loses all pruning — fsck flags it and ``repair_sidecars``
    rebuilds it instead of treating magic-only blobs as healthy."""
    if len(blob) < len(_MAGIC) + 12 or not blob.startswith(_MAGIC):
        return False
    k, m = struct.unpack_from("<IQ", blob, len(_MAGIC))
    return not (
        k == 0 or k > _MAX_K or m == 0 or m & (m - 1)
        or len(blob) < len(_MAGIC) + 12 + m // 8
    )


def contains(blob: bytes, value: str) -> bool:
    """True if ``value`` MAY be present (false positives possible, false
    negatives not). Malformed blobs answer True (never skip on corruption)."""
    if not header_ok(blob):
        return True
    k, m = struct.unpack_from("<IQ", blob, len(_MAGIC))
    bits = np.unpackbits(
        np.frombuffer(blob, dtype=np.uint8, count=m // 8, offset=len(_MAGIC) + 12),
        bitorder="little",
    )
    h1a, h2a = _hash_pairs(np.asarray([value], dtype=object))
    # Python ints: uint64 wraparound is intended, numpy scalar ops warn on it
    h1, h2 = int(h1a[0]), int(h2a[0])
    # probe with the k the WRITER used (stored in the header), not _K
    return all(bits[(h1 + i * h2) % (1 << 64) & (m - 1)] for i in range(k))


def contains_all(blob: bytes, values: np.ndarray) -> bool:
    """Vectorized membership: True iff EVERY value probes positive.
    The bulk twin of ``contains`` (fsck's no-false-negative audit probes
    every distinct conv_id of a part — per-value scalar probes would be
    O(n) Python at millions of conversations per part)."""
    if not header_ok(blob):
        return True
    k, m = struct.unpack_from("<IQ", blob, len(_MAGIC))
    if len(values) == 0:
        return True
    bits = np.unpackbits(
        np.frombuffer(blob, dtype=np.uint8, count=m // 8, offset=len(_MAGIC) + 12),
        bitorder="little",
    )
    h1, h2 = _hash_pairs(values)
    mask = np.uint64(m - 1)
    hit = np.ones(len(values), dtype=bool)
    for i in range(k):
        hit &= bits[(h1 + np.uint64(i) * h2) & mask].astype(bool)
    return bool(hit.all())


def write_sidecar(part_path: str, conv_ids: pa.Array | pa.ChunkedArray) -> None:
    """Write ``part_path + '.bloom'`` atomically (tmp + rename, idempotent
    under task retry because the content is deterministic)."""
    blob = build(conv_ids)
    tmp = sidecar_path(part_path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, sidecar_path(part_path))


def may_contain(part_path: str, value: str) -> bool:
    """Sidecar-guarded membership probe for a part file: False ⇒ the file
    provably holds no row (or tombstone) of ``value`` and can be skipped."""
    sp = sidecar_path(part_path)
    try:
        with open(sp, "rb") as f:
            blob = f.read()
    except OSError:  # no sidecar (old lake / export copy) ⇒ must read
        stats["files_read"] += 1
        return True
    hit = contains(blob, value)
    stats["files_skipped" if not hit else "files_read"] += 1
    return hit
