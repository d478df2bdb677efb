"""Binlog source with source-side predicate pushdown.

Analog of the reference's NostrFilter subscription predicate
(reference: src/nostr_pipeline/extractors/relay_client.py:16-46 — kinds,
authors, since/until, ids, limit pushed to the relay): here the predicate is
pushed to the Parquet scan as a pyarrow dataset expression (row-group
statistics pruning) plus FILE-level pruning of whole LSN-ordered segments
via their parquet footer min/max — segments entirely outside the LSN window
are never opened.

| NostrFilter field | ChangeFilter field | pushdown |
|---|---|---|
| kinds             | roles / ops        | row-group stats + dictionary |
| authors           | conv_ids           | row-group stats |
| since / until     | min_lsn / max_lsn (and ts range) | segment prune + row-group stats |
| limit             | limit              | Dataset.limit (streaming early stop) |
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data as rd


@dataclass(frozen=True)
class ChangeFilter:
    roles: tuple[str, ...] | None = None
    ops: tuple[str, ...] | None = None
    conv_ids: tuple[str, ...] | None = None
    min_lsn: int | None = None
    max_lsn: int | None = None
    min_ts: object | None = None  # datetime / pa-compatible scalar
    max_ts: object | None = None
    limit: int | None = None

    def to_expression(self) -> "pads.Expression | None":
        expr = None

        def _and(e):
            nonlocal expr
            expr = e if expr is None else expr & e

        if self.roles:
            _and(pc.field("role").isin(list(self.roles)))
        if self.ops:
            _and(pc.field("op").isin(list(self.ops)))
        if self.conv_ids:
            _and(pc.field("conv_id").isin(list(self.conv_ids)))
        if self.min_lsn is not None:
            _and(pc.field("lsn") >= self.min_lsn)
        if self.max_lsn is not None:
            _and(pc.field("lsn") <= self.max_lsn)
        if self.min_ts is not None:
            _and(pc.field("ts") >= self.min_ts)
        if self.max_ts is not None:
            _and(pc.field("ts") <= self.max_ts)
        return expr


def prune_segments(binlog_dir: str, flt: ChangeFilter) -> list[str]:
    """File-level pruning: drop whole segments outside the LSN window using
    only parquet footer statistics (no data pages read)."""
    segs = sorted(glob.glob(os.path.join(binlog_dir, "*.parquet")))
    if flt.min_lsn is None and flt.max_lsn is None:
        return segs
    keep = []
    for p in segs:
        md = pq.read_metadata(p)
        idx = md.schema.to_arrow_schema().get_field_index("lsn")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        if flt.max_lsn is not None and lo > flt.max_lsn:
            continue
        if flt.min_lsn is not None and hi < flt.min_lsn:
            continue
        keep.append(p)
    return keep


def read_changelog(
    binlog_dir: str, flt: ChangeFilter | None = None, columns: list[str] | None = None
) -> "rd.Dataset":
    """Filtered Dataset over the binlog: segment prune → read_parquet with
    the predicate pushed into the scan → streaming limit."""
    flt = flt or ChangeFilter()
    segs = prune_segments(binlog_dir, flt)
    if not segs:
        import pyarrow as pa

        from ..model import CHANGELOG_SCHEMA

        return rd.from_arrow(CHANGELOG_SCHEMA.empty_table())
    ds = rd.read_parquet(segs, columns=columns, filter=flt.to_expression())
    if flt.limit is not None:
        ds = ds.limit(flt.limit)
    return ds
