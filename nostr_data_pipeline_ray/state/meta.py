"""Shared persisted-meta reopen protocol for every on-disk store (the
MinHash near-dup index, the IVF ANN index, both curators).

The convention, stated once: the persisted manifest is AUTHORITATIVE —
an auditor/reader must never need to re-state build parameters, so a
reopen with omitted parameters adopts the persisted values; a parameter
the caller EXPLICITLY passed that differs from the persisted one raises
(silently adopting it would let two writers diverge on e.g. LSH band
count or IVF list count while believing they share a store); and a
store whose on-disk ``format`` doesn't match the code raises rather
than mis-reading rows. One implementation so a fix to the mismatch
semantics (the None-means-unspecified filter, the format gate) cannot
silently diverge between the four stores that share it.
"""

from __future__ import annotations

import json
import os
from typing import Any


def open_or_init_meta(
    meta_path: str,
    fmt: int,
    label: str,
    defaults: dict[str, Any],
    explicit: dict[str, Any],
    *,
    format_hint: str = "",
    mismatch_kind: str = "",
    mismatch_hint: str = "",
) -> tuple[dict[str, Any], bool]:
    """Open a store's persisted meta, or seed a fresh one.

    Returns ``(meta, created)``. ``explicit`` must hold ONLY parameters
    the caller actually passed (filter None-valued ones out first —
    ``None`` is the unspecified sentinel by convention, never a real
    value). On reopen the persisted dict is returned as-is; on create
    the dict is ``defaults`` overridden by ``explicit`` plus the
    ``format`` stamp — the caller appends its own state fields
    (counters, committed lists) and persists it."""
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            have = json.load(f)
        if have.get("format") != fmt:
            raise ValueError(
                f"{label} uses on-disk format {have.get('format')!r}, "
                f"this code reads format {fmt}{format_hint}"
            )
        mismatch = {k: (have.get(k), v) for k, v in explicit.items()
                    if have.get(k) != v}
        if mismatch:
            raise ValueError(
                f"{label} was built with different {mismatch_kind}"
                f"parameters: {mismatch}{mismatch_hint}"
            )
        return have, False
    return {**defaults, **explicit, "format": fmt}, True
