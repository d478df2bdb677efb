"""Join helpers (SURVEY.md §2.4).

- ``broadcast_join``: small-side lookup join — the dimension table is
  ``ray.put`` once on the driver and fetched once per ACTOR (not per batch),
  then each batch does a vectorized pandas merge. No shuffle. Reference
  analog: pubkey→profile decoration (dashboard/pages/4:48,110).
- Large⋈large goes through ``ray.data.Dataset.join`` (hash-partitioned) at
  the call sites in pipelines/analytics.py.
"""

from __future__ import annotations

import pandas as pd
import ray


def broadcast_join(
    ds,
    small: pd.DataFrame,
    left_on: str | list[str],
    right_on: str | list[str] | None = None,
    how: str = "inner",
    batch_size: int | None = None,
):
    """Join a Dataset against a small in-memory table by broadcast.

    ``small`` is shipped through the object store once and deserialized
    once per WORKER (``cached_get``); the stage runs as plain tasks —
    measured ~1.5 s faster per pipeline than an actor pool, whose spin-up
    dominates short queries (stages/actors.py).
    """
    from .actors import cached_get

    if how not in ("inner", "left"):
        # per-batch merging is only sound when unmatched SMALL-side rows
        # are dropped: 'right'/'outer' would re-emit each unmatched small
        # row once per input batch (up to #blocks duplicates). Use
        # bucketed_hash_join for those semantics.
        raise ValueError(
            f"broadcast_join supports how='inner'/'left', got {how!r}"
        )
    small_ref = ray.put(small)
    right_on = right_on or left_on

    def joiner(batch: pd.DataFrame) -> pd.DataFrame:
        small_w = cached_get(small_ref)
        out = batch.merge(small_w, left_on=left_on, right_on=right_on, how=how)
        if right_on != left_on:
            drop = [c for c in ([right_on] if isinstance(right_on, str) else right_on)
                    if c in out.columns and c not in batch.columns]
            out = out.drop(columns=drop)
        return out

    kwargs = {"batch_format": "pandas"}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(joiner, **kwargs)


def bucketed_hash_join(
    left,
    right,
    left_on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    num_buckets: int | None = None,
    input_bytes: int | None = None,
    allow_local: bool = True,
):
    """Large⋈large hash join as ONE bucketed shuffle + per-bucket pandas
    merge (Ray's Dataset.join spins up hash-shuffle aggregator actors with a
    per-row combine — measured ~8x slower on 600k⋈150k rows).

    Plan: conform both sides to the union schema (missing columns null), tag
    a side marker, bucket each side by the hash of ITS key columns, union,
    groupby(bucket), split+merge vectorized inside each bucket.
    """
    import numpy as np
    import pyarrow as pa

    from .shuffle import _local_sized, input_bytes_of, key_buckets, resolve_buckets

    # size the bucket count from BOTH sides (a bucket holds its slice of the
    # left and the right union'd together)
    if num_buckets is None and input_bytes is None:
        known = [b for b in (input_bytes_of(left), input_bytes_of(right)) if b]
        input_bytes = sum(known) if known else None
    local = allow_local and num_buckets is None and _local_sized(None, input_bytes)
    num_buckets = resolve_buckets(None, num_buckets, input_bytes)

    right_on = right_on or left_on
    lschema, rschema = left.schema(), right.schema()
    # an EMPTY Dataset (e.g. a flag set with no hits) has no inferable
    # schema; existence probes have trivial answers there, so short-circuit
    # instead of dereferencing None
    if rschema is None:
        if how in ("left_semi", "left_anti"):
            return left if how == "left_anti" else left.limit(0)
        # an inner/left join can't synthesize the right side's columns
        # from nothing — fail with the contract instead of an
        # AttributeError three lines down
        raise ValueError(
            f"bucketed_hash_join: right side is empty with no inferable "
            f"schema — a {how!r} join can't synthesize the right columns; "
            "guard the call (count()==0) or pass a schema-bearing empty "
            "Dataset (e.g. ray.data.from_arrow(schema.empty_table()))"
        )
    if lschema is None and how in ("left_semi", "left_anti", "left", "inner"):
        return left  # empty left: nothing to join, result is empty
    lcols, rcols = list(lschema.names), list(rschema.names)
    overlap = set(lcols) & set(rcols)
    assert not overlap, f"bucketed_hash_join needs disjoint columns, got {overlap}"

    def _arrow_type(t) -> pa.DataType:
        # a pandas-block Dataset (e.g. out of bucketed_map_groups) reports
        # numpy dtypes; object columns are strings throughout this engine
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    def _na_dtype(t: pa.DataType) -> str:
        # nullable pandas dtypes so all-NA columns still carry the right
        # Arrow type (an object column of Nones would become `null` and the
        # two sides' block schemas wouldn't unify)
        if pa.types.is_integer(t):
            return "Int64"
        if pa.types.is_floating(t):
            return "Float64"
        if pa.types.is_timestamp(t):
            return "datetime64[ns]"
        if pa.types.is_boolean(t):
            return "boolean"
        return "string"

    ltypes = {n: _arrow_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _arrow_type(t) for n, t in zip(rschema.names, rschema.types)}
    order = lcols + rcols  # identical column order on both sides

    def tag(side: int, keys: list[str], other_types: dict):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy(deep=False)
            for c, t in other_types.items():
                batch[c] = pd.Series(pd.NA, index=batch.index, dtype=_na_dtype(t))
            batch = batch[order]
            batch["_bucket"] = key_buckets(batch, keys, num_buckets)
            batch["_side"] = np.int8(side)
            return batch

        return fn

    lt = left.map_batches(tag(0, left_on, rtypes), batch_format="pandas")
    rt = right.map_batches(tag(1, right_on, ltypes), batch_format="pandas")

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        l = bucket[bucket["_side"] == 0][lcols]
        r = bucket[bucket["_side"] == 1][rcols]
        if how in ("left_semi", "left_anti"):
            # existence probe, not a widening join: dedup the right keys so
            # multiplicity can't duplicate left rows, then keep/drop by
            # match indicator. Same single exchange as the inner join — no
            # driver-side distinct-key broadcast (SURVEY §2.4: the
            # reference's only anti-join is the PK existence probe,
            # event_loader.py:35-38).
            # SQL EXISTS semantics: a NULL key never matches anything
            # (pandas merge would match NA==NA), so null-keyed right rows
            # can't witness existence; null-keyed left rows fall out as
            # left_only (kept by anti, dropped by semi) — same as NOT EXISTS
            rk = r[right_on].dropna().drop_duplicates()
            probed = l.merge(
                rk, left_on=left_on, right_on=right_on, how="left",
                indicator="_m",
            )
            want = "both" if how == "left_semi" else "left_only"
            out = probed[probed["_m"] == want][lcols]
        else:
            out = l.merge(r, left_on=left_on, right_on=right_on, how=how)
        # the all-NA padding upcast int columns to nullable/float across the
        # union; restore each column's ORIGINAL integer dtype (not a blanket
        # int64 — an int32 left column must come out int32, or downstream
        # schema unions against its producer see a join-introduced mismatch)
        for c, t in {**ltypes, **rtypes}.items():
            if pa.types.is_integer(t) and c in out:
                want = np.dtype(t.to_pandas_dtype())
                if out[c].dtype != want:
                    try:
                        out[c] = out[c].astype(want)
                    except (TypeError, ValueError):
                        pass  # outer join NAs stay nullable
        return out

    if local:
        # the whole join input is a fraction of one bucket's budget: run the
        # identical merge once over everything in a single task instead of
        # paying the fixed groupby-exchange overhead (num_buckets=1 semantics;
        # see shuffle.LOCAL_MAX_INPUT_BYTES)
        return (
            lt.union(rt)
            .repartition(1)
            .map_batches(
                lambda g: merge(g.drop(columns=["_bucket"])),
                batch_format="pandas",
                batch_size=None,
            )
        )
    return (
        lt.union(rt)
        .groupby("_bucket")
        .map_groups(lambda g: merge(g.drop(columns=["_bucket"])), batch_format="pandas")
    )
