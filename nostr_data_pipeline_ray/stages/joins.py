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
    concurrency: int | tuple[int, int] = 2,
    batch_size: int | None = None,
):
    """Join a Dataset against a small in-memory table by broadcast.

    ``small`` is shipped through the object store once; each actor holds a
    deserialized copy for its lifetime.
    """
    small_ref = ray.put(small)
    right_on = right_on or left_on

    class _Joiner:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = batch.merge(
                self.small, left_on=left_on, right_on=right_on, how=how
            )
            if right_on != left_on:
                drop = [c for c in ([right_on] if isinstance(right_on, str) else right_on)
                        if c in out.columns and c not in batch.columns]
                out = out.drop(columns=drop)
            return out

    kwargs = {"batch_format": "pandas", "concurrency": concurrency}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(_Joiner, **kwargs)
