"""Analytics operators (SURVEY.md §2.2–§2.8) as Ray Data pipelines.

Every public ``q_*`` function takes ``sf_dir`` (a directory of the driver's
testdata parquet tables) and returns a Dataset / pyarrow Table. The matching
DuckDB oracle SQL lives in ``ORACLE`` keyed by the same name; computed-column
names are identical on both sides (the driver hashes values under sorted
column names).

Float contract: every float column that crosses the oracle boundary is
rounded half-away-from-zero to a fixed number of decimals on BOTH sides
(``_round2`` here, ``ROUND(x, n)`` in DuckDB) — this absorbs the
order-dependence of distributed double summation.
"""

from __future__ import annotations

import json
import os
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..stages.joins import broadcast_join, bucketed_hash_join
from ..stages.shuffle import (
    bucketed_map_groups,
    bucketed_sum_count,
    id_hash,
    local_topk,
    table_bytes,
    table_rows,
)



def _t(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    """read_parquet with block count sized to the file (default parallelism
    splits a 5 MB table into 64 micro-blocks and every downstream shuffle
    pays per-block overhead; at 100 TB parallelism comes from file count)."""
    path = _t(sf_dir, table)
    blocks = min(64, max(2, table_bytes(path) >> 20))
    return rd.read_parquet(path, columns=columns, override_num_blocks=blocks)


def _tbytes(sf_dir: str, table: str) -> int:
    """Source size for bucket-count sizing when the dataset handed to a
    bucketed helper is already post-map_batches (input_files() is empty)."""
    return table_bytes(_t(sf_dir, table))


from ..functions.rounding import round_away as _round_away  # shared contract


def _explode_words(batch: pa.Table, carry: list[str]) -> pa.Table:
    """Whitespace-tokenize ``text`` into one row per word, carrying the
    ``carry`` columns via parent indices. The combine_chunks BEFORE
    list_parent_indices is load-bearing: on a ChunkedArray the parent
    indices are per-chunk-relative and misalign the carried columns."""
    words = pc.split_pattern(batch["text"], " ")
    flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    parents = pc.list_parent_indices(flat)
    cols = {"word": pc.list_flatten(flat)}
    for c in carry:
        cols[c] = batch[c].take(parents)
    return pa.table(cols)


def _same_as_prev(arr: np.ndarray) -> np.ndarray:
    """Exact neighbor equality (row i vs i−1; row 0 False). The pandas
    idiom eq(shift(1)) upcasts int64 to float64 to hold the NaN hole, so
    two DISTINCT ids above 2^53 (e.g. 64-bit key hashes) can compare
    equal — this stays in the column's native dtype."""
    out = np.zeros(len(arr), dtype=bool)
    if len(arr) > 1:
        out[1:] = arr[1:] == arr[:-1]
    return out


def _round_col(batch: pa.Table, col: str, decimals: int = 2) -> pa.Table:
    vals = _round_away(batch[col].to_numpy(zero_copy_only=False), decimals)
    return batch.set_column(
        batch.column_names.index(col), col, pa.array(vals, pa.float64())
    )


# ---------------------------------------------------------------------------
# M1/M2 — per-batch filter + projection + JSON field extraction
# (reference: transformers/event_processor.py:37-88)
# ---------------------------------------------------------------------------


def q_purchase_events(sf_dir: str):
    def extract(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["event_type"], "purchase"))
        k = pc.struct_field(
            pc.extract_regex(batch["props"], r'"k": (?P<k>[0-9]+)'), "k"
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "user_id": batch["user_id"],
                "value": batch["value"],
                "k": pc.cast(k, pa.int64()),
            }
        )

    return _read(sf_dir, "events").map_batches(
        extract, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# M15 — substring search + sort desc + limit + truncating projection
# (reference: analytics/query.py:326-353)
# ---------------------------------------------------------------------------


def q_search_documents(sf_dir: str):
    def search(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.match_substring(batch["text"], "merge"))
        return pa.table(
            {
                "doc_id": hit["doc_id"],
                "lang": hit["lang"],
                "snippet": pc.utf8_slice_codeunits(hit["text"], 0, 80),
            }
        )

    return local_topk(
        _read(sf_dir, "documents", columns=["doc_id", "lang", "text"]).map_batches(
            search, batch_format="pyarrow"
        ),
        by=["doc_id"],
        descending=[True],
        k=20,
    )


# ---------------------------------------------------------------------------
# A2 — trending topics: explode terms → grouped count + distinct authors
# (reference: analytics/aggregator.py:203-274; trend formula
#  metrics_calculator.py:60-92 with zaps=0, 24 h window)
# ---------------------------------------------------------------------------


def q_trending_words(sf_dir: str):
    def explode(batch: pa.Table) -> pa.Table:
        return _explode_words(batch, ["source", "doc_id"])

    # two-phase: per-batch (word, source) partial counts map-side, then one
    # bucketed shuffle keyed on word computes total mentions + distinct
    # sources + a first-K doc sample (K6: reference aggregator.py:257-258
    # attaches sample_event_ids to each topic) vectorized per bucket. The
    # global 5 smallest doc ids of a word are always within the union of its
    # per-batch 5 smallest, so the sample survives the partial combine.
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["word", "source"], sort=False)
        out = g.agg(c=("doc_id", "size")).reset_index()
        d = batch.drop_duplicates(["word", "source", "doc_id"]).sort_values("doc_id")
        head = d.groupby(["word", "source"], sort=False).head(5).copy()
        head["doc_id"] = head["doc_id"].astype(str)
        cand = (
            head.groupby(["word", "source"], sort=False)["doc_id"]
            .agg(",".join)
            .rename("cand")
        )
        return out.merge(cand, on=["word", "source"], how="left")

    def per_word(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("word", sort=False)
        out = g.agg(
            mention_count=("c", "sum"), unique_sources=("source", "nunique")
        ).reset_index()
        samp = g["cand"].agg(
            lambda ss: ",".join(
                map(str, sorted({int(x) for s in ss for x in s.split(",")})[:5])
            )
        )
        out["sample_doc_ids"] = samp.to_numpy()
        return out

    agg = bucketed_map_groups(
        _read(sf_dir, "documents", columns=["doc_id", "text", "source"]).map_batches(
            explode, batch_format="pyarrow"
        ),
        keys=["word"],
        fn=per_word,
        pre=partial,
        input_bytes=_tbytes(sf_dir, "documents"),
    )

    def score(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater_equal(batch["mention_count"], 3))
        m = batch["mention_count"].to_numpy(zero_copy_only=False).astype(np.float64)
        u = batch["unique_sources"].to_numpy(zero_copy_only=False).astype(np.float64)
        trend = _round_away(m / 24.0 * np.log(1.0 + u), 2)
        return pa.table(
            {
                "word": batch["word"],
                "mention_count": pc.cast(batch["mention_count"], pa.int64()),
                "unique_sources": pc.cast(batch["unique_sources"], pa.int64()),
                "sample_doc_ids": batch["sample_doc_ids"],
                "trend_score": pa.array(trend, pa.float64()),
            }
        )

    return agg.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# A8/K1 — top-k users by grouped sum (reference: dashboard/pages/6:191-203,
# analytics/query.py:28-57)
# ---------------------------------------------------------------------------


def q_top_users_by_value(sf_dir: str):
    agg = bucketed_sum_count(
        _read(sf_dir, "events", columns=["user_id", "value"]),
        keys=["user_id"],
        sums={"value": "total_value"},
        count_as="n_events",
    ).map_batches(partial(_round_col, col="total_value"), batch_format="pyarrow")
    return local_topk(agg, by=["total_value", "user_id"], descending=[True, False], k=10)


# ---------------------------------------------------------------------------
# A6/A7 — tumbling-window timeline (reference: analytics/query.py:272-324,
# dashboard/pages/6:137-147): window = event-time group key, no watermarks
# ---------------------------------------------------------------------------


def q_activity_timeline(sf_dir: str):
    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.floor_temporal(batch["ts"], unit="hour"),
                "event_type": batch["event_type"],
                "value": batch["value"],
            }
        )

    return bucketed_sum_count(
        _read(sf_dir, "events", columns=["ts", "event_type", "value"]).map_batches(
            bucket, batch_format="pyarrow"
        ),
        keys=["window_start", "event_type"],
        sums={"value": "total_value"},
        count_as="n_events",
        input_bytes=_tbytes(sf_dir, "events"),
    ).map_batches(partial(_round_col, col="total_value"), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# §2.9 sliding window — 6-hour windows advancing hourly: each event lands in
# 6 windows (explode by window offset, then the same two-phase bucketed
# count as the tumbling timeline). The reference's trending window slides
# this way conceptually (metrics_calculator.py:60-92's 24h window re-queried
# each aggregation tick).
# ---------------------------------------------------------------------------

_SLIDE_HOURS = 6
_HOUR_US = 3_600_000_000


def q_sliding_activity(sf_dir: str):
    def explode_windows(batch: pa.Table) -> pa.Table:
        hour_us = pc.floor_temporal(batch["ts"], unit="hour").cast(pa.int64())
        base = hour_us.to_numpy(zero_copy_only=False)
        n = len(base)
        offs = np.arange(_SLIDE_HOURS, dtype=np.int64) * _HOUR_US
        starts = (np.repeat(base, _SLIDE_HOURS) - np.tile(offs, n)).astype(
            "datetime64[us]"
        )
        return pa.table(
            {
                "window_start": pa.array(starts, pa.timestamp("us")),
                "value": batch["value"].take(
                    pa.array(np.repeat(np.arange(n), _SLIDE_HOURS))
                ),
            }
        )

    return bucketed_sum_count(
        _read(sf_dir, "events", columns=["ts", "value"]).map_batches(
            explode_windows, batch_format="pyarrow"
        ),
        keys=["window_start"],
        sums={"value": "total_value"},
        count_as="n_events",
        input_bytes=_tbytes(sf_dir, "events") * _SLIDE_HOURS,
    ).map_batches(partial(_round_col, col="total_value"), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# A5 — time-of-day histogram (reference: metrics_calculator.py:324-335)
# ---------------------------------------------------------------------------


def q_hour_histogram(sf_dir: str):
    def hour(batch: pa.Table) -> pa.Table:
        return pa.table({"hour": pc.cast(pc.hour(batch["ts"]), pa.int64())})

    # two-phase bucketed count (24 keys, but Ray's groupby is still a full
    # sort shuffle of every row; the map-side partial ships 24 rows/batch)
    return bucketed_sum_count(
        _read(sf_dir, "events", columns=["ts"]).map_batches(
            hour, batch_format="pyarrow"
        ),
        keys=["hour"],
        sums={},
        count_as="n",
        input_bytes=_tbytes(sf_dir, "events"),
    )


# ---------------------------------------------------------------------------
# A4 — exact quantiles via distributed sort + split_at_indices, using the
# reference's sorted-array index convention (metrics_calculator.py:252-287:
# median = a[n//2], p95 = a[int(n*.95)]). Scale path would be a t-digest.
# ---------------------------------------------------------------------------


def q_price_stats(sf_dir: str):
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    summary = ds.aggregate(
        Count(alias_name="n"),
        Sum("l_extendedprice", alias_name="total"),
        Min("l_extendedprice", alias_name="min_price"),
        Max("l_extendedprice", alias_name="max_price"),
    )
    # empty-table contract (Dataset.aggregate returns None on 0 rows, and
    # the clamped quantile indexes would go negative): one row of NULLs
    # with n=0, matching the SQL aggregate's shape
    if summary is None or not int(summary["n"]):
        null = pa.array([None], pa.float64())
        return pa.table({
            "n": pa.array([0], pa.int64()), "total": null,
            "mean_price": null, "min_price": null, "max_price": null,
            "median": null, "p25": null, "p75": null, "p95": null,
        })
    n = int(summary["n"])
    # mean derives from the ROUNDED total so oracle and engine divide
    # bit-identical doubles (the raw distributed sum differs by ulps)
    total_rounded = _round_away(summary["total"])[()]
    # truncating index convention (reference metrics_calculator.py:252-287),
    # clamped so p95 of a tiny array can't index past the end
    qidx = {
        "median": n // 2,
        "p25": min(int(n * 0.25), n - 1),
        "p75": min(int(n * 0.75), n - 1),
        "p95": min(int(n * 0.95), n - 1),
    }
    order = sorted(set(qidx.values()))
    splits = ds.sort("l_extendedprice").split_at_indices(order)
    # element at sorted index i = first row of the split starting at i
    at = {}
    for start, part in zip(order, splits[1:]):
        at[start] = part.take(1)[0]["l_extendedprice"]
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "total": pa.array([total_rounded], pa.float64()),
            "mean_price": pa.array([_round_away(total_rounded / n)[()]], pa.float64()),
            "min_price": pa.array([summary["min_price"]], pa.float64()),
            "max_price": pa.array([summary["max_price"]], pa.float64()),
            "median": pa.array([at[qidx["median"]]], pa.float64()),
            "p25": pa.array([at[qidx["p25"]]], pa.float64()),
            "p75": pa.array([at[qidx["p75"]]], pa.float64()),
            "p95": pa.array([at[qidx["p95"]]], pa.float64()),
        }
    )


_PCTS = (0.25, 0.5, 0.75, 0.95)


def q_price_percentiles_cont(sf_dir: str):
    """A4 variant — percentile_cont (linearly INTERPOLATED quantiles, the
    ANSI convention) over l_extendedprice, alongside q_price_stats'
    truncating-index reference convention. Exact path: one distributed
    sort, split_at_indices at the floor/ceil order statistics, then the
    interpolation runs over 8 scalars on the driver. The oracle SQL spells
    out the identical formula (lo + (hi−lo)·frac over DOUBLEs) instead of
    trusting quantile_cont internals, so both sides compute bit-identical
    doubles before the shared 6dp rounding."""
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    n = ds.count()
    if n == 0:  # SQL shape: zero rows (the join legs are empty)
        return pa.table({"p": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    idx = {p: p * (n - 1) for p in _PCTS}
    lo = {p: int(np.floor(v)) for p, v in idx.items()}
    hi = {p: int(np.ceil(v)) for p, v in idx.items()}
    order = sorted(set(lo.values()) | set(hi.values()))
    splits = ds.sort("l_extendedprice").split_at_indices(order)
    at = {}
    for start, part in zip(order, splits[1:]):
        at[start] = float(part.take(1)[0]["l_extendedprice"])
    vals = [
        at[lo[p]] + (at[hi[p]] - at[lo[p]]) * (idx[p] - lo[p]) for p in _PCTS
    ]
    return pa.table(
        {
            "p": pa.array(list(_PCTS), pa.float64()),
            "value": pa.array(_round_away(np.array(vals), 6), pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# A4 scale path — t-digest quantile sketch: one bounded digest per batch
# map-side, one tiny associative merge, NO distributed sort. The exact
# sort-based q_price_stats above stays the oracle anchor; this is what runs
# at 10^10 rows (rows-only: approximate by construction, accuracy pinned by
# test_sketches.py against the exact quantiles).
# ---------------------------------------------------------------------------


def q_price_stats_tdigest(sf_dir: str, delta: int = 500):
    from ..stages.sketches import TDigest

    td = TDigest(delta)

    def sketch(batch: pa.Table) -> pa.Table:
        m, w = td.from_values(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "means": pa.array([m.tolist()], pa.list_(pa.float64())),
                "weights": pa.array([w.tolist()], pa.list_(pa.float64())),
            }
        )

    rows = (
        _read(sf_dir, "lineitem", columns=["l_extendedprice"])
        .map_batches(sketch, batch_format="pyarrow")
        .take_all()
    )  # one bounded digest row per batch — metadata-sized, not data-sized
    means, weights = td.merge(
        [(np.asarray(r["means"]), np.asarray(r["weights"])) for r in rows]
    )
    qs = {"p25": 0.25, "median": 0.5, "p75": 0.75, "p95": 0.95, "p99": 0.99}
    return pa.table(
        {
            **{k: pa.array([TDigest.quantile(means, weights, q)], pa.float64())
               for k, q in qs.items()},
            "n_centroids": pa.array([len(means)], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# D5/A3 — grouped distinct counts without a distinct shuffle per row:
# two-level pre-aggregation (reference: aggregator.py:287-299)
# ---------------------------------------------------------------------------


def q_distinct_users_by_type(sf_dir: str):
    def per_type(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby("event_type", sort=False)
            .agg(n_users=("user_id", "nunique"), n_events=("c", "sum"))
            .reset_index()
        )

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["event_type", "user_id"]),
        keys=["event_type"],
        fn=per_type,
        # map-side partial: per-batch (type, user) counts shrink the shuffle
        pre=lambda b: b.groupby(["event_type", "user_id"], sort=False)
        .size()
        .reset_index(name="c"),
    )


# ---------------------------------------------------------------------------
# J4/D2 — groupwise-latest (argmax by ts) (reference: analytics/query.py:198-215)
# ---------------------------------------------------------------------------


def q_latest_event_per_user(sf_dir: str):
    def latest(bucket: pd.DataFrame) -> pd.DataFrame:
        # vectorized per bucket: one sort, then first row per user
        return bucket.sort_values(
            ["ts", "event_id"], ascending=[False, False]
        ).drop_duplicates("user_id", keep="first")

    # `latest` is idempotent-associative, so it doubles as the map-side
    # partial: the shuffle moves one row per (user, batch), not every event
    return bucketed_map_groups(
        _read(sf_dir, "events"), keys=["user_id"], fn=latest, pre=latest
    )


# ---------------------------------------------------------------------------
# K3 — global latest (reference: analytics/query.py:88-94)
# ---------------------------------------------------------------------------


def q_latest_event(sf_dir: str):
    return local_topk(
        _read(sf_dir, "events"), by=["ts", "event_id"], descending=[True, True], k=1
    )


# ---------------------------------------------------------------------------
# J1 — fact⋈fact hash join: per-order revenue (reference:
# analytics/aggregator.py:112-139). Grouped pre-aggregate BEFORE the join so
# the join input is one row per key, then Dataset.join (hash-partitioned).
# ---------------------------------------------------------------------------


def q_order_revenue(sf_dir: str):
    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"]))
        return pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})

    per_order = bucketed_sum_count(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(revenue, batch_format="pyarrow"),
        keys=["l_orderkey"],
        sums={"rev": "revenue"},
        count_as="n_items",
        input_bytes=_tbytes(sf_dir, "lineitem"),
        # price and discount are 2-decimal, so the products (and their sums)
        # are EXACT at 4 decimals — rounding there has no boundary ties,
        # while rounding at 2 decimals would sit exactly on .xx5 for ~0.1%
        # of orders and flip between duckdb's and numpy's computed doubles
    ).map_batches(partial(_round_col, col="revenue", decimals=4), batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    # bucketed cogroup join — Ray's Dataset.join spins hash-shuffle
    # aggregator actors with per-row combine, measured ~8x slower here
    joined = bucketed_hash_join(
        orders, per_order, left_on=["o_orderkey"], right_on=["l_orderkey"]
    )
    return joined.select_columns(
        ["o_orderkey", "o_custkey", "o_totalprice", "revenue", "n_items"]
    )


# ---------------------------------------------------------------------------
# J2/J5 — grouped fan-in + small-side broadcast join (reference:
# analytics/query.py:125-193; dashboard/pages/4:33-43)
# ---------------------------------------------------------------------------


def q_customer_order_stats(sf_dir: str):
    import pyarrow.parquet as pq

    stats = bucketed_sum_count(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        keys=["o_custkey"],
        sums={"o_totalprice": "total_spent"},
        count_as="n_orders",
    ).map_batches(partial(_round_col, col="total_spent"), batch_format="pyarrow")
    customers = pq.read_table(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    ).to_pandas()
    joined = broadcast_join(stats, customers, left_on="o_custkey", right_on="c_custkey")
    return joined.select_columns(["o_custkey", "c_name", "n_orders", "total_spent"])


# ---------------------------------------------------------------------------
# semi / anti joins — existence probes as distributed joins. The reference's
# only anti-join is the insert-time PK existence probe
# (loaders/event_loader.py:35-38); here the probe is a first-class operator:
# both sides hash into the SAME single bucketed exchange as an inner join
# (no driver-side distinct-key set, no broadcast), and inside each bucket
# the right side collapses to distinct keys before the indicator merge —
# right-side multiplicity can never duplicate left rows.
# ---------------------------------------------------------------------------


def q_lapsed_customers(sf_dir: str):
    """Anti-join: customers with NO order on/after 2000-01-01 (fixed anchor
    per the no-wall-clock rule). The recency filter pushes before the
    exchange, so the probe side ships only recent order keys."""
    customers = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    cutoff = pa.scalar(np.datetime64("2000-01-01", "us"), pa.timestamp("us"))

    def recent(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater_equal(batch["o_orderdate"], cutoff))
        return batch.select(["o_custkey"])

    recent_orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate"]
    ).map_batches(recent, batch_format="pyarrow")
    return bucketed_hash_join(
        customers, recent_orders, left_on=["c_custkey"], right_on=["o_custkey"],
        how="left_anti", input_bytes=_tbytes(sf_dir, "orders"),
    )


def q_customers_with_big_orders(sf_dir: str):
    """Semi-join: customers with at least one order over 300k (selective
    right side — the filter pushes before the exchange, so the shuffle
    carries only qualifying keys)."""
    customers = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def big(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["o_totalprice"], 300000.0))
        return batch.select(["o_custkey"])

    big_orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    ).map_batches(big, batch_format="pyarrow")
    return bucketed_hash_join(
        customers, big_orders, left_on=["c_custkey"], right_on=["o_custkey"],
        how="left_semi", input_bytes=_tbytes(sf_dir, "orders"),
    )


# ---------------------------------------------------------------------------
# grouped exact quantile — A4's per-group form: median retail price per
# brand. Exact (sort-free bucketed per-group median inside map_groups);
# the global t-digest sketch (stages/sketches.py) is the approximate scale
# path when group cardinality explodes.
# ---------------------------------------------------------------------------


def q_median_price_per_brand(sf_dir: str):
    def med(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("p_brand", sort=False)["p_retailprice"]
        out = g.median().reset_index(name="median_price")
        out["n_parts"] = g.size().values
        # inputs are 2-decimal; an even-count median averages two of them →
        # exact at 3 decimals on both engines
        out["median_price"] = _round_away(out["median_price"], 3)
        return out

    return bucketed_map_groups(
        _read(sf_dir, "part", columns=["p_brand", "p_retailprice"]),
        keys=["p_brand"],
        fn=med,
    )


def q_median_price_per_brand_tdigest(sf_dir: str, delta: int = 200):
    """A4 scale path, GROUPED — per-group quantiles via mergeable t-digests
    (rows-only: approximate by construction; accuracy pinned by
    test_sketches.py against the exact grouped median above). The exact
    `median_price_per_brand` needs every group's rows co-located and
    sorted; this one ships a bounded digest per (brand, batch) map-side,
    merges digests per brand inside the bucketed exchange, and derives the
    quantiles in-bucket — the exchange moves O(brands × batches × δ)
    floats regardless of row count, and the driver never sees data. This
    is the shape grouped percentiles take at 10^10 rows."""
    from ..stages.sketches import TDigest

    td = TDigest(delta)

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for brand, g in batch.groupby("p_brand", sort=False):  # O(#brands)
            m, w = td.from_values(g["p_retailprice"].to_numpy())
            rows.append({"p_brand": brand, "means": m.tolist(),
                         "weights": w.tolist()})
        # explicit columns: an empty batch must not emit a schema-less
        # block (the bucketing stage indexes the key column)
        return pd.DataFrame(rows, columns=["p_brand", "means", "weights"])

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        for brand, g in bucket.groupby("p_brand", sort=False):
            m, w = td.merge(
                [(np.asarray(r), np.asarray(s))
                 for r, s in zip(g["means"], g["weights"])]
            )
            out.append(
                {
                    "p_brand": brand,
                    "p25": TDigest.quantile(m, w, 0.25),
                    "median": TDigest.quantile(m, w, 0.5),
                    "p75": TDigest.quantile(m, w, 0.75),
                    "n_parts": int(w.sum()),
                }
            )
        return pd.DataFrame(out)

    return bucketed_map_groups(
        _read(sf_dir, "part", columns=["p_brand", "p_retailprice"]),
        keys=["p_brand"],
        fn=merge,
        pre=sketch,
    )


# ---------------------------------------------------------------------------
# K4 — per-group top-k (reference: analytics/query.py:157-163)
# ---------------------------------------------------------------------------


def q_top3_orders_per_customer(sf_dir: str):
    def top3(bucket: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-group top-k: one sort + grouped head
        ordered = bucket.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        return ordered.groupby("o_custkey", sort=False).head(3)

    return bucketed_map_groups(
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]),
        keys=["o_custkey"],
        fn=top3,
        # map-side partial top-k: a group's global top-3 is within the union
        # of its per-batch top-3s, so prune before the shuffle
        pre=lambda b: b.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
        ).groupby("o_custkey", sort=False).head(3),
    )


# ---------------------------------------------------------------------------
# custom operator: grouped backward AS-OF join (Ray Data has no asof join).
# For each purchase, the same user's latest signup at-or-before it. The
# bucketed shuffle co-locates a user's rows; inside a bucket pandas
# merge_asof(by=...) is the vectorized per-group as-of. Partitioning
# assumption: the whole by-group fits one bucket (guaranteed — buckets are
# keyed on the by-column's hash).
# ---------------------------------------------------------------------------


def q_asof_last_signup(sf_dir: str):
    def asof(bucket: pd.DataFrame) -> pd.DataFrame:
        p = (
            bucket[bucket["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
            .sort_values("ts", kind="mergesort")
        )
        s = bucket[bucket["event_type"] == "signup"][["user_id", "ts"]].sort_values(
            "ts", kind="mergesort"
        )
        s = s.assign(signup_ts=s["ts"])
        out = pd.merge_asof(p, s, on="ts", by="user_id", direction="backward")
        return out[["event_id", "user_id", "ts", "signup_ts"]]

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]),
        keys=["user_id"],
        fn=asof,
        # map-side prune: only the two relevant event types cross the shuffle
        pre=lambda b: b[b["event_type"].isin(["purchase", "signup"])],
    )


# ---------------------------------------------------------------------------
# J3 — tiny dimension broadcast lookup (reference: dashboard/pages/4:48,110)
# ---------------------------------------------------------------------------


def q_nation_region(sf_dir: str):
    import pyarrow.parquet as pq

    regions = pq.read_table(_t(sf_dir, "region")).to_pandas()
    nations = _read(sf_dir, "nation")
    joined = broadcast_join(nations, regions, left_on="n_regionkey", right_on="r_regionkey")
    return joined.select_columns(["n_nationkey", "n_name", "r_name"])


# ---------------------------------------------------------------------------
# custom operator: broadcast RANGE join — each fact row joins the interval
# table by containment. The band table ships once (it's tiny); inside
# map_batches a vectorized searchsorted against the sorted interval edges
# replaces the O(rows × bands) BETWEEN scan a SQL engine would do.
# ---------------------------------------------------------------------------

_PRICE_BANDS = [
    ("lt_1k", 0.0, 1_000.0),
    ("1k_10k", 1_000.0, 10_000.0),
    ("10k_50k", 10_000.0, 50_000.0),
    ("ge_50k", 50_000.0, float("inf")),
]


def q_price_band_totals(sf_dir: str):
    labels = np.array([b[0] for b in _PRICE_BANDS], dtype=object)
    edges = np.array([b[1] for b in _PRICE_BANDS[1:]])  # interior boundaries

    def band(batch: pa.Table) -> pa.Table:
        x = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, x, side="right")  # lo <= x < hi
        return pa.table(
            {
                "band": pa.array(labels[idx], pa.string()),
                "value": batch["l_extendedprice"],
            }
        )

    return bucketed_sum_count(
        _read(sf_dir, "lineitem", columns=["l_extendedprice"]).map_batches(
            band, batch_format="pyarrow"
        ),
        keys=["band"],
        sums={"value": "total"},
        count_as="n",
        input_bytes=_tbytes(sf_dir, "lineitem"),
    ).map_batches(partial(_round_col, col="total"), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# D1/D2 — exact dedup: first-writer-wins by content key (reference:
# pipeline.py:202-211 + event_loader.py:35-38)
# ---------------------------------------------------------------------------


def q_dedup_documents_exact(sf_dir: str):
    def first(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.sort_values("doc_id").drop_duplicates("text", keep="first")

    return bucketed_map_groups(
        _read(sf_dir, "documents"),
        keys=["text"],
        fn=first,
        # local pre-dedup bounds shuffle volume when duplicates are common
        pre=lambda b: b.sort_values("doc_id").drop_duplicates("text", keep="first"),
    ).select_columns(["doc_id", "lang", "source", "n_chars", "text"])


# ---------------------------------------------------------------------------
# text analysis — token counting (M7-ish regex over text)
# ---------------------------------------------------------------------------


def q_doc_token_stats(sf_dir: str):
    def tokens(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["n_chars"].astype("int64"),
                "word_count": batch["text"].str.count(r"\w+").astype("int64"),
            }
        )

    return rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "n_chars", "text"]
    ).map_batches(tokens, batch_format="pandas")


# ---------------------------------------------------------------------------
# F5 through the oracle — piecewise length-quality score over documents
# (metrics_calculator.py:181-226 with media/hashtag/engagement inputs zeroed)
# ---------------------------------------------------------------------------


def q_doc_quality(sf_dir: str):
    def quality(batch: pa.Table) -> pa.Table:
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        length_score = np.where(
            n < 50,
            n / 50.0 * 50.0,
            np.where(
                n <= 500,
                50.0 + (n - 50.0) / 450.0 * 50.0,
                100.0 - np.minimum(50.0, (n - 500.0) / 100.0),
            ),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "quality_score": pa.array(
                    _round_away(length_score * 0.3), pa.float64()
                ),
            }
        )

    return rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "n_chars"]
    ).map_batches(quality, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# F5 full formula through the oracle — length + media + hashtag components
# (engagement inputs stay zero: no zaps on transcript text). Reuses the
# RE2-equal regex semantics already pinned by doc_extract; rounding is
# half-away on BOTH sides (the scoring-module twins keep np.round half-even
# semantics for the reference-parity unit tests).
# ---------------------------------------------------------------------------


def q_doc_quality_full(sf_dir: str):
    def quality(batch: pd.DataFrame) -> pd.DataFrame:
        import re

        text = batch["text"].fillna("")
        n = text.str.len().to_numpy(dtype=np.float64)
        length_score = np.where(
            n < 50,
            n / 50.0 * 50.0,
            np.where(
                n <= 500,
                50.0 + (n - 50.0) / 450.0 * 50.0,
                100.0 - np.minimum(50.0, (n - 500.0) / 100.0),
            ),
        )
        media_re = re.compile(
            r"https?://[^\s?#]+\.(?:jpg|jpeg|png|gif|webp|mp4|mov|webm)(?:[?#][^\s]*)?",
            re.IGNORECASE,
        )
        media_score = np.where(text.str.contains(media_re).to_numpy(), 20.0, 0.0)
        # distinct lowercase hashtags per doc without a per-row Python
        # lambda: extractall → per-row nunique (lowercasing the text first is
        # equivalent to lowercasing matches — case doesn't affect \w+ bounds)
        matches = text.str.lower().reset_index(drop=True).str.extractall(r"#(\w+)")[0]
        h = np.zeros(len(batch), dtype=np.float64)
        if len(matches):
            counts = matches.groupby(level=0).nunique()
            h[counts.index.to_numpy()] = counts.to_numpy(dtype=np.float64)
        hashtag_score = np.where(
            h == 0,
            0.0,
            np.where(h <= 3, 15.0, np.where(h <= 5, 10.0,
                                            np.maximum(0.0, 10.0 - (h - 5.0) * 2.0))),
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "quality_score": _round_away(
                    0.3 * length_score + 0.2 * media_score + 0.1 * hashtag_score
                ),
            }
        )

    return rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "text"]
    ).map_batches(quality, batch_format="pandas")


# ---------------------------------------------------------------------------
# M7–M10 through the oracle — hashtag/url/mention counting + media flag via
# the TextEnricher actor pool (regexes compiled once per actor), checked
# against DuckDB regexp_extract_all / regexp_matches with IDENTICAL RE2-safe
# patterns (ASCII corpus ⇒ \w/\s agree across engines).
# ---------------------------------------------------------------------------


def q_doc_extract(sf_dir: str):
    from ..stages.actors import per_worker
    from ..stages.text import TextEnricher

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[
            ["doc_id", "hashtag_count", "url_count", "mention_count", "has_media"]
        ]

    return (
        rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(per_worker(TextEnricher), batch_format="pandas")
        .map_batches(project, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# M13 through the oracle — char-range language id (zh/ja/ko/en, null for
# empty) via the vectorized TextAnalyzer, mirrored in DuckDB with the same
# unicode ranges (reference: event_processor.py:299-315).
# ---------------------------------------------------------------------------


def q_doc_lang(sf_dir: str):
    from ..stages.actors import per_worker
    from ..stages.text import TextAnalyzer

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["doc_id", "lang_detected"]]

    return (
        rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        .map_batches(per_worker(TextAnalyzer), batch_format="pandas")
        .map_batches(project, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# similarity search — brute-force cosine top-k against a broadcast query
# vector (the ANN baseline; the scale path is LSH bucketing, see dedup.py)
# ---------------------------------------------------------------------------


def q_ann_topk(sf_dir: str):
    from .dedup import _point_read_vec

    # query vector via filtered point-read (row-group pruning), not a scan
    qvec = _point_read_vec(_t(sf_dir, "embeddings"), vec_id=0)
    qnorm = np.linalg.norm(qvec)

    import ray

    from ..stages.actors import cached_get

    qref = ray.put((qvec, qnorm))

    def scorer(batch: pa.Table) -> pa.Table:
        qvec_w, qnorm_w = cached_get(qref)  # broadcast, once per worker
        batch = batch.filter(pc.not_equal(batch["vec_id"], 0))
        col = batch["embedding"].combine_chunks()
        mat = col.flatten().to_numpy(zero_copy_only=False).reshape(-1, len(qvec_w))
        mat = mat.astype(np.float64)
        score = (mat @ qvec_w) / (np.linalg.norm(mat, axis=1) * qnorm_w)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "score": pa.array(_round_away(score, 6), pa.float64()),
            }
        )

    scored = _read(sf_dir, "embeddings").map_batches(scorer, batch_format="pyarrow")
    return local_topk(scored, by=["score", "vec_id"], descending=[True, False], k=10)


# ---------------------------------------------------------------------------
# DuckDB oracle SQL — same names, same columns, same rounding
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# F1 through the oracle — virality scoring with exponential time decay
# (metrics_calculator.py:17-58: weights 3.0/0.001 + 6-hour half-life).
# Age is measured against a FIXED anchor (no wall clock — determinism).
# ---------------------------------------------------------------------------

_ANCHOR_US = 1_706_745_600_000_000  # 2024-02-01T00:00:00Z in µs


def q_virality_scores(sf_dir: str):
    def score(batch: pa.Table) -> pa.Table:
        k = pc.struct_field(pc.extract_regex(batch["props"], r'"k": (?P<k>[0-9]+)'), "k")
        kf = pc.cast(k, pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        value = batch["value"].to_numpy(zero_copy_only=False)
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        age_h = (_ANCHOR_US - ts_us) / 3600000000.0
        engagement = 3.0 * kf + 0.001 * value
        virality = _round_away(engagement * np.exp(-0.1155 * age_h), 2)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "virality": pa.array(virality, pa.float64()),
            }
        )

    return _read(sf_dir, "events", columns=["event_id", "props", "value", "ts"]).map_batches(
        score, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# F6/A10 — daily signups + day-over-day growth %
# (metrics_calculator.py:228-250; driver-side arithmetic on the tiny
# aggregated series, like the reference's snapshot math)
# ---------------------------------------------------------------------------


def q_daily_signup_growth(sf_dir: str):
    def day_col(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["event_type"], "signup"))
        return pa.table({"day": pc.floor_temporal(batch["ts"], unit="day")})

    daily = bucketed_sum_count(
        _read(sf_dir, "events", columns=["event_type", "ts"]).map_batches(
            day_col, batch_format="pyarrow"
        ),
        keys=["day"],
        sums={},
        count_as="n",
        input_bytes=_tbytes(sf_dir, "events"),
    ).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    prev = daily["n"].shift(1)
    pct = np.where(prev > 0, (daily["n"] - prev) * 100.0 / prev, 0.0)
    daily["dod_pct"] = _round_away(np.nan_to_num(pct), 2)
    daily["n"] = daily["n"].astype("int64")
    return daily[["day", "n", "dod_pct"]]


# ---------------------------------------------------------------------------
# sessionization — the stateful streaming-window analog (SURVEY.md §2.9):
# per user, a >30-minute gap starts a new session. Events of one user are
# co-located by the bucketed shuffle; the window logic is vectorized pandas
# (sort → gap flags → cumulative session ids → grouped min/max/count).
# ---------------------------------------------------------------------------

def q_user_event_context(sf_dir: str):
    """W7 — the remaining window primitives in one query: LEAD (gap to the
    NEXT event), FIRST_VALUE / LAST_VALUE over the whole partition (the
    frame must be UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING — SQL's default
    frame silently truncates last_value at CURRENT ROW), and CUME_DIST.
    One bucketed exchange on user_id; the sort key (ts, event_id) is
    unique, so cume_dist degenerates to position/n — both engines compute
    the same two exact int64s and divide once in DOUBLE. The lead gap is
    integer microseconds; the partition-final row's gap is NULL."""

    def context(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        if not len(b):
            return pd.DataFrame(
                {"user_id": [], "event_id": [], "next_gap_sec": [],
                 "first_type": [], "last_type": [], "cume": []}
            )
        us = b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        # positional partition bookkeeping (first/last ROW per user — SQL
        # first_value/last_value do NOT skip nulls, so transform('first')
        # would diverge on a null-typed boundary row)
        first_of_user = ~_same_as_prev(b["user_id"].to_numpy())
        first_pos = np.flatnonzero(first_of_user)
        counts = np.diff(np.append(first_pos, len(b)))
        last_pos = np.append(first_pos[1:] - 1, len(b) - 1)
        nxt_same = np.zeros(len(b), dtype=bool)
        nxt_same[:-1] = ~first_of_user[1:]
        gap = np.roll(us, -1) - us  # last row is garbage; masked below
        et = b["event_type"].to_numpy()
        rn = np.arange(len(b), dtype="int64") - np.repeat(first_pos, counts) + 1
        n = np.repeat(counts, counts).astype("int64")
        return pd.DataFrame(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "next_gap_sec": np.where(
                    nxt_same, _round_away(gap / 1_000_000.0, 2), np.nan
                ),
                "first_type": np.repeat(et[first_pos], counts),
                "last_type": np.repeat(et[last_pos], counts),
                "cume": _round_away(rn.astype("float64") / n.astype("float64"), 6),
            }
        )

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"]),
        keys=["user_id"],
        fn=context,
    )


_SESSION_GAP = pd.Timedelta(minutes=30)


def q_user_sessions(sf_dir: str):
    def sessions(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        same_user = _same_as_prev(b["user_id"].to_numpy())
        gap_ok = ((b["ts"] - b["ts"].shift(1)) <= _SESSION_GAP).to_numpy()
        is_new = pd.Series(~(same_user & gap_ok), index=b.index)
        b["session_id"] = is_new.groupby(b["user_id"]).cumsum().astype("int64")
        g = b.groupby(["user_id", "session_id"], sort=False)
        out = g.agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
        ).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        # duration in exact integer microseconds before the single rounding
        # (a float subtraction of two timestamps cannot drift, but spell the
        # integer path anyway — it is the contract everywhere else)
        dur_us = (
            out["session_end"].to_numpy(dtype="datetime64[us]").astype("int64")
            - out["session_start"].to_numpy(dtype="datetime64[us]").astype("int64")
        )
        out["duration_sec"] = _round_away(dur_us.astype("float64") / 1_000_000.0, 2)
        return out

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id"]),
        keys=["user_id"],
        fn=sessions,
    )


# ---------------------------------------------------------------------------
# peak concurrency — interval-overlap maximum via a distributed SWEEP LINE:
# sessions become ±1 boundary deltas, a range sort orders the sweep, and
# the running count is the corpus_token_budget prefix-sum pattern reduced
# further — here pass A's O(blocks) summaries (delta subtotal, local max
# prefix, its earliest ts) already CONTAIN the answer, so there is no pass
# B at all: the driver folds #blocks rows, never a data row. Boundary
# order is (t ASC, d DESC): at equal instants starts precede ends, so a
# zero-duration (single-event) session still counts itself — spelled
# identically in the oracle's window ORDER BY.
# ---------------------------------------------------------------------------


def q_peak_concurrency(sf_dir: str):
    def sessions(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        same_user = _same_as_prev(b["user_id"].to_numpy())
        gap_ok = ((b["ts"] - b["ts"].shift(1)) <= _SESSION_GAP).to_numpy()
        is_new = ~(same_user & gap_ok)
        sid = pd.Series(is_new, index=b.index).groupby(b["user_id"]).cumsum()
        g = b.groupby([b["user_id"], sid], sort=False)["ts"]
        return pd.DataFrame({"t0": g.min().values, "t1": g.max().values})

    sess = bucketed_map_groups(
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id"]),
        keys=["user_id"],
        fn=sessions,
        input_bytes=_tbytes(sf_dir, "events"),
    )

    def deltas(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "t": pd.concat([batch["t0"], batch["t1"]], ignore_index=True),
                "d": np.concatenate(
                    [np.ones(len(batch), dtype=np.int64),
                     -np.ones(len(batch), dtype=np.int64)]
                ),
            }
        )

    swept = (
        sess.map_batches(deltas, batch_format="pandas")
        .sort(key=["t", "d"], descending=[False, True])
        .materialize()
    )

    def summary(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"t0": pa.array([], pa.timestamp("us")),
             "d0": pa.array([], pa.int64()),
             "dsum": pa.array([], pa.int64()),
             "mx": pa.array([], pa.int64()),
             "mx_at": pa.array([], pa.timestamp("us")),
             "starts": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        d = batch["d"].to_numpy(zero_copy_only=False)
        run = np.cumsum(d)
        i = int(np.argmax(run))  # first attainment -> earliest ts in block
        return pa.table(
            {
                "t0": batch["t"].slice(0, 1),
                "d0": batch["d"].slice(0, 1),
                "dsum": pa.array([int(d.sum())], pa.int64()),
                "mx": pa.array([int(run[i])], pa.int64()),
                "mx_at": batch["t"].slice(i, 1),
                "starts": pa.array([int((d > 0).sum())], pa.int64()),
            }
        )

    rows = swept.map_batches(
        summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # O(number of sort blocks), never O(sessions)
    anchor = pa.table(
        {"peak_concurrency": pa.array([], pa.int64()),
         "peak_at": pa.array([], pa.timestamp("us")),
         "n_sessions": pa.array([], pa.int64())}
    )
    if not len(rows):
        return rd.from_arrow(anchor)
    # ties on (t0, d0) across blocks are order-invariant for BOTH outputs:
    # equal keys share d, so the combined max prefix and its (shared) t
    # don't depend on which block folds first
    rows = rows.sort_values(["t0", "d0"], ascending=[True, False],
                            kind="mergesort").reset_index(drop=True)
    running, peak, peak_at = 0, None, None
    for r in rows.itertuples(index=False):
        cand = running + int(r.mx)
        if peak is None or cand > peak:
            peak, peak_at = cand, r.mx_at
        running += int(r.dsum)
    return rd.from_arrow(
        pa.table(
            {
                "peak_concurrency": pa.array([peak], pa.int64()),
                "peak_at": pa.array(
                    [pd.Timestamp(peak_at)], pa.timestamp("us")
                ),
                "n_sessions": pa.array([int(rows["starts"].sum())], pa.int64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# approximate grouped distinct via mergeable HyperLogLog sketches — the
# scale path for D4/D5 (exact variants stay the oracle-checked default):
# one register vector per (group, batch) map-side, elementwise-max merge in
# a tiny reduce. Rows-only (approximate by construction; accuracy pinned by
# test_sketches.py against the exact counts).
# ---------------------------------------------------------------------------


def q_approx_distinct_users(sf_dir: str, p: int = 12):
    from ..stages.sketches import HyperLogLog

    hll = HyperLogLog(p)

    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, g in batch.groupby("event_type", sort=False):
            rows.append(
                {"event_type": etype, "regs": hll.registers(g["user_id"].to_numpy())}
            )
        # explicit columns: an empty batch must not emit a schema-less block
        return pd.DataFrame(rows, columns=["event_type", "regs"])

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        for etype, g in group.groupby("event_type", sort=False):
            regs = np.maximum.reduce(np.stack(g["regs"].to_list()))
            out.append({"event_type": etype, "n_users_approx": hll.estimate(regs)})
        df = pd.DataFrame(out)
        df["n_users_approx"] = df["n_users_approx"].astype("int64")
        return df

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["event_type", "user_id"]),
        keys=["event_type"],
        fn=merge,
        pre=sketch,
    )


# ---------------------------------------------------------------------------
# J5/A-family fan-in — one stitched per-user record from several keyed
# aggregates in a single bucketed pass (reference: analytics/query.py:125-193
# runs one SQL query per stat; here one shuffle computes them all)
# ---------------------------------------------------------------------------


def q_user_stats(sf_dir: str):
    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("user_id", sort=False)
        out = g.agg(
            n_events=("event_id", "size"),
            total_value=("value", "sum"),
            last_seen=("ts", "max"),
            first_seen=("ts", "min"),
        ).reset_index()
        out["n_purchases"] = (
            batch[batch["event_type"] == "purchase"]
            .groupby("user_id", sort=False)["event_id"]
            .size()
            .reindex(out["user_id"], fill_value=0)
            .to_numpy()
        )
        return out

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("user_id", sort=False)
        out = g.agg(
            n_events=("n_events", "sum"),
            total_value=("total_value", "sum"),
            n_purchases=("n_purchases", "sum"),
            last_seen=("last_seen", "max"),
            first_seen=("first_seen", "min"),
        ).reset_index()
        out["total_value"] = _round_away(out["total_value"])
        out["n_events"] = out["n_events"].astype("int64")
        out["n_purchases"] = out["n_purchases"].astype("int64")
        # F3 influence / F8 engagement rate (scoring.py:80-97,262-265) over
        # the per-user aggregates: purchases stand in for zaps, events for
        # notes, age measured to the fixed 2024-02-01 anchor. Every input to
        # the float formulas is bit-identical on the oracle side (rounded
        # total, integer counts, µs-exact age), and ln/exp match DuckDB libm.
        tv = out["total_value"].to_numpy()
        ne = out["n_events"].to_numpy().astype(np.float64)
        npur = out["n_purchases"].to_numpy().astype(np.float64)
        first_us = out["first_seen"].astype("datetime64[us]").astype("int64").to_numpy()
        age_days = (_ANCHOR_US - first_us) / 86400000000.0
        out["influence"] = _round_away(
            2.0 * np.log(1.0 + npur)
            + 1.5 * np.log(1.0 + tv)
            + 10.0 * (tv / ne)
            + np.minimum(ne / age_days, 10.0)
            + 0.5 * np.log(1.0 + age_days / 30.0)
        )
        out["engagement_rate"] = _round_away(npur * 100.0 / ne)
        return out

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["user_id", "event_id", "event_type", "value", "ts"]),
        keys=["user_id"],
        fn=final,
        pre=pre,
    )


# ---------------------------------------------------------------------------
# A3/A11 — the stitched one-row network snapshot (reference:
# analytics/aggregator.py:276-377 builds get_network_stats from totals +
# distincts + top-1 sub-queries; the dashboard Home page renders it). Each
# piece is a streamed aggregate; only the scalar results are stitched
# driver-side — exactly the reference's shape, minus the SQL round trips.
# ---------------------------------------------------------------------------


def q_network_stats(sf_dir: str):
    """Global snapshot in TWO scans of events (was five): one bucketed
    per-user pass yields n_users + top_user; one per-batch partial-aggregate
    pass yields totals, ts range, distinct types and the latest event (the
    driver combines one small partial row per block)."""
    ev_bytes = table_bytes(_t(sf_dir, "events"))

    # pass A — everything scalar, one partial row per batch (runs FIRST so
    # an empty events table short-circuits before the per-user pass)
    def partials(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):  # Ray can hand an empty block; emit no partial row
            return pd.DataFrame(
                {
                    "n": pd.Series(dtype="int64"),
                    "min_ts": pd.Series(dtype="datetime64[us]"),
                    "max_ts": pd.Series(dtype="datetime64[us]"),
                    "sum_value": pd.Series(dtype="float64"),
                    "latest_ts": pd.Series(dtype="datetime64[us]"),
                    "latest_id": pd.Series(dtype="int64"),
                    "types": pd.Series(dtype="str"),
                }
            )
        # latest: ts DESC, event_id DESC — over non-null ts like the
        # oracle's NULLS-LAST ordering (a NaT would negate to INT64_MIN and
        # masquerade as the maximum); an all-null batch falls back to
        # event_id alone (the oracle's tie order when every ts is NULL)
        sub = b[b["ts"].notna()]
        if not len(sub):
            sub = b
            order = np.argsort(-sub["event_id"].to_numpy())
        else:
            ts = sub["ts"].to_numpy()
            order = np.lexsort(
                (
                    -sub["event_id"].to_numpy(),
                    -ts.astype("datetime64[us]").astype(np.int64),
                )
            )
        li = order[0]
        # distinct types wire format: a JSON list (unambiguous for commas,
        # separators AND the empty-string type — count(DISTINCT) counts '');
        # nulls dropped like the oracle's count(DISTINCT)
        kinds = json.dumps(sorted(set(b["event_type"].dropna())))
        return pd.DataFrame(
            {
                "n": [len(b)],
                "min_ts": [b["ts"].min()],
                "max_ts": [b["ts"].max()],
                "sum_value": [b["value"].to_numpy(dtype=np.float64).sum()],
                "latest_ts": [sub["ts"].iloc[li]],
                "latest_id": [int(sub["event_id"].iloc[li])],
                "types": [kinds],
            }
        )

    parts = (
        _read(sf_dir, "events", columns=["event_id", "event_type", "ts", "value"])
        .map_batches(partials, batch_format="pandas")
        .to_pandas()  # bounded: one row per block
    )
    if not len(parts):
        # match the oracle on an empty table: one row, zero counts, NULL
        # aggregates (SQL scalar subqueries over empty inputs yield NULLs)
        return pa.table(
            {
                "total_events": pa.array([0], pa.int64()),
                "n_users": pa.array([0], pa.int64()),
                "n_event_types": pa.array([0], pa.int64()),
                "first_ts": pa.array([None], pa.timestamp("us")),
                "last_ts": pa.array([None], pa.timestamp("us")),
                "total_value": pa.array([None], pa.float64()),
                "top_user_id": pa.array([None], pa.int64()),
                "latest_event_id": pa.array([None], pa.int64()),
            }
        )
    latest_row = parts.sort_values(
        ["latest_ts", "latest_id"], ascending=[False, False]
    ).iloc[0]
    n_event_types = len(
        {t for joined in parts["types"] for t in json.loads(joined)}
    )

    # pass B — per-user: the grouped result is both the distinct-user count
    # and (rounded, tie-broken) the top user by total value
    per_user = bucketed_sum_count(
        _read(sf_dir, "events", columns=["user_id", "value"]),
        keys=["user_id"],
        sums={"value": "sv"},
        count_as="c",
        input_bytes=ev_bytes,
    ).materialize()
    n_users = per_user.count()
    top_user = local_topk(
        per_user.map_batches(partial(_round_col, col="sv"), batch_format="pyarrow"),
        by=["sv", "user_id"],
        descending=[True, False],
        k=1,
    ).take(1)[0]
    return pa.table(
        {
            "total_events": pa.array([int(parts["n"].sum())], pa.int64()),
            "n_users": pa.array([n_users], pa.int64()),
            "n_event_types": pa.array([n_event_types], pa.int64()),
            "first_ts": pa.array([parts["min_ts"].min()], pa.timestamp("us")),
            "last_ts": pa.array([parts["max_ts"].max()], pa.timestamp("us")),
            "total_value": pa.array(
                [float(_round_away(parts["sum_value"].sum()))], pa.float64()
            ),
            "top_user_id": pa.array([int(top_user["user_id"])], pa.int64()),
            "latest_event_id": pa.array([int(latest_row["latest_id"])], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Quality-percentile corpus filter (training-data op): keep documents whose
# quality score clears the exact p75 of the corpus — the "top-quartile
# corpus" cut a pre-training cleaning pipeline applies. The threshold uses
# the same truncating sorted-index convention as q_price_stats; at 10^10
# docs the t-digest sketch (q_price_stats_tdigest) supplies the threshold
# without the distributed sort — the formula and filter stages are shared.
# ---------------------------------------------------------------------------


def q_quality_filter(sf_dir: str, q: float = 0.75):
    # one scoring execution serves the count, the threshold sort, and the
    # final filter (re-deriving from the lazy plan would re-read + re-score
    # the corpus three times)
    scores = q_doc_quality(sf_dir).materialize()
    n = scores.count()
    if n == 0:
        return scores
    idx = min(int(n * q), n - 1)
    # element at sorted index idx = first row of the split starting there
    thr = (
        scores.sort("quality_score")
        .split_at_indices([idx])[1]
        .take(1)[0]["quality_score"]
    )
    return scores.map_batches(
        lambda b: b.filter(pc.greater_equal(b["quality_score"], thr)),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Deterministic sampling (training-data ops). Random sampling is useless in
# a resumable pipeline — a retry would draw a different subset — so both
# samplers key on a multiplicative integer hash of the event id (Knuth's
# 2654435761, bijective mod 2^32 for odd multipliers, so distinct ids never
# collide): reproducible across runs, partitionings, and cluster sizes, and
# expressible in exact SQL integer arithmetic for the oracle. Pure
# map-side filter / map-side-pruned group top-k — no RNG state, no shuffle
# for the fraction sampler.
# ---------------------------------------------------------------------------

# per-10,000 keep rates by stratum: class rebalancing (rare purchases kept
# at 50%, noisy error events cut to 5%) — the knob a curriculum/cleaning
# pipeline turns per source or label
_STRATUM_RATES = {"purchase": 5000, "signup": 3000, "error": 500}
_STRATUM_DEFAULT = 1000


def q_stratified_sample(sf_dir: str):
    """Per-stratum fraction sampling: keep an event iff its id-hash bucket
    (of 10,000) falls under its event_type's rate. Embarrassingly parallel
    — a pure per-batch filter at any scale."""

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        h = id_hash(batch["event_id"].to_numpy()) % np.uint64(10000)
        rates = (
            batch["event_type"]
            .map(_STRATUM_RATES)
            .fillna(_STRATUM_DEFAULT)
            .to_numpy(dtype=np.uint64)
        )
        return batch[h < rates]

    return _read(sf_dir, "events").map_batches(pick, batch_format="pandas")


def sample_per_group(ds, k: int = 200, input_bytes: int | None = None):
    """Exactly-k-per-stratum sampling of an event Dataset (deterministic
    reservoir analog): the k events with the smallest id-hash per
    event_type. Map-side partial top-k prunes each batch to k rows per
    stratum before the exchange, so the shuffle moves
    O(k · strata · blocks) rows. Block-layout invariant: the selected set
    depends only on the id-hash order, never on partitioning."""

    cols = ["event_id", "ts", "user_id", "event_type", "value"]

    def add_h(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["_h"] = id_hash(batch["event_id"].to_numpy()).astype(np.int64)
        return batch

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["_h", "event_id"])
            .groupby("event_type", sort=False, observed=True)
            .head(k)
        )

    return bucketed_map_groups(
        ds.map_batches(add_h, batch_format="pandas"),
        keys=["event_type"],
        fn=lambda g: head_k(g)[cols],
        pre=head_k,
        input_bytes=input_bytes,
    )


def q_sample_per_group(sf_dir: str, k: int = 200):
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    return sample_per_group(
        _read(sf_dir, "events", columns=cols),
        k=k,
        input_bytes=_tbytes(sf_dir, "events"),
    )


_WSAMPLE_K = 100
_WSAMPLE_SEED = 11


def q_weighted_sample_docs(sf_dir: str, k: int = _WSAMPLE_K,
                           seed: int = _WSAMPLE_SEED):
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    P(doc in sample) ∝ its weight — here n_chars, the "sample longer
    documents more often" mixing knob. Each doc gets a deterministic
    pseudo-uniform u = (id_hash(doc_id+seed) + 0.5)/2³² and the top-k by
    u^(1/w) wins; ranking by the monotone-equivalent ln(u)/w avoids the
    pow() divergence between libms, and the rank compares the ROUNDED key
    (doc_id tiebreak) like the TF-IDF ranks. Map-side keying + a
    local_topk prune — no full sort, nothing corpus-sized anywhere. The
    hash is the same HUGEINT-expressible bijection the shard shuffle
    uses, so the whole draw carries a SQL oracle. Weights must be > 0
    (checked loudly; the fixture's n_chars ≥ 48)."""

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        w = batch["n_chars"].to_numpy(dtype="float64")
        if (w <= 0).any():
            raise ValueError("weighted_sample_docs: non-positive weight")
        h = id_hash(ids + np.int64(seed)).astype("float64")
        u = (h + 0.5) / 4294967296.0
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_chars": batch["n_chars"].to_numpy(dtype="int64"),
                "key": _round_away(np.log(u) / w, 6),
            }
        )

    scored = _read(sf_dir, "documents", columns=["doc_id", "n_chars"]).map_batches(
        add_key, batch_format="pandas"
    )
    return local_topk(scored, by=["key", "doc_id"], descending=[True, False], k=k)


# ---------------------------------------------------------------------------
# Domain mixing: draw the LARGEST corpus that hits exact target source
# proportions (the data-mixture step of a pre-training pipeline). Phase 1
# counts per source (tiny aggregate, O(#sources) on the driver — bounded by
# the domain vocabulary, never the corpus); the binding source fixes the
# total T = min(n_s / p_s) and per-source quotas k_s = floor(p_s · T);
# phase 2 takes exactly k_s docs per source by smallest id-hash — the same
# deterministic reservoir analog as sample_per_group (block-layout
# invariant, map-side pruned).
# ---------------------------------------------------------------------------

# target mixture over the selected domains; sources not listed are dropped
# (a mixture spec IS a whitelist)
_MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def q_domain_mix_sample(sf_dir: str, weights: dict[str, float] | None = None):
    """(doc_id, source) of the maximal exact-proportion mixture corpus."""
    weights = weights or _MIX_WEIGHTS
    doc_bytes = _tbytes(sf_dir, "documents")
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    counts = bucketed_sum_count(
        docs, ["source"], sums={}, count_as="n", input_bytes=doc_bytes
    ).to_pandas()  # O(#sources) rows — the mixture spec's own cardinality
    by_src = dict(zip(counts["source"], counts["n"]))
    missing = [s for s in weights if s not in by_src]
    if missing:
        raise ValueError(f"mixture sources absent from corpus: {missing}")
    total = min(by_src[s] / p for s, p in weights.items())
    quota = {s: int(np.floor(p * total)) for s, p in weights.items()}
    kmax = max(quota.values(), default=0)

    def add_h(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["source"].isin(quota)].copy(deep=False)
        batch["_h"] = id_hash(batch["doc_id"].to_numpy()).astype(np.int64)
        return batch

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        # ONE definition of the candidate order + per-source cap: the
        # map-side prune and the final selection must agree on it exactly
        # or the prune's superset invariant breaks (a tiebreaker change
        # applied to one copy and not the other would silently drop rows)
        return (
            g.sort_values(["_h", "doc_id"])
            .groupby("source", sort=False, observed=True)
            .head(kmax)
        )

    def head_quota(g: pd.DataFrame) -> pd.DataFrame:
        g = prune(g)  # same order/cap; here every row of a source is present
        keep = g.groupby("source", sort=False, observed=True).cumcount() < g[
            "source"
        ].map(quota).to_numpy()
        return g[keep]

    return bucketed_map_groups(
        docs.map_batches(add_h, batch_format="pandas"),
        keys=["source"],
        fn=lambda g: head_quota(g)[["doc_id", "source"]],
        pre=prune,
        input_bytes=doc_bytes,
    )


# ---------------------------------------------------------------------------
# Window functions (beyond-reference operator family, W1-W4): LAG-based
# inter-event gaps, frame-based rolling aggregates, per-group running
# totals, and the ranking family (rank / dense_rank / percent_rank).
#
# Shape: every window is a groupby-window — bucketed by its PARTITION BY
# key so all of a partition's rows are co-located by ONE hash exchange,
# then the frame/lag/rank kernel runs vectorized (numpy / pandas) inside
# the bucket. Each input row moves exactly once; nothing is collected on
# the driver. Float contract: window arithmetic is carried in exact
# integers (microseconds / cents / ranks) on BOTH sides of the oracle, and
# any float column is derived from those integers by the same expression
# in the same order — a distributed float prefix-sum would be
# order-sensitive exactly at the rounding boundary.
# ---------------------------------------------------------------------------


def q_event_gaps(sf_dir: str):
    """W1 — LAG: per-user inter-event gap stats over
    ``lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)``.
    Gaps are integer microseconds (the tables are us-precision), so sum and
    max are exact and the derived 2dp seconds cannot drift across block
    boundaries. Users with a single event have no gap and are excluded,
    matching the oracle's ``WHERE gap_us IS NOT NULL``."""

    def gaps(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        us = b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        same = _same_as_prev(b["user_id"].to_numpy())
        gap = us - np.roll(us, 1)  # row 0 is garbage; masked by `same`
        g = (
            pd.DataFrame({"user_id": b["user_id"].to_numpy()[same], "gap_us": gap[same]})
            .groupby("user_id", sort=False)["gap_us"]
        )
        out = pd.DataFrame(
            {
                "n_gaps": g.size().astype("int64"),
                "_sum_us": g.sum(),
                "_max_us": g.max(),
            }
        ).reset_index()
        out["avg_gap_sec"] = _round_away(
            out["_sum_us"].to_numpy(dtype="float64")
            / out["n_gaps"].to_numpy()
            / 1_000_000.0,
            2,
        )
        out["max_gap_sec"] = _round_away(
            out["_max_us"].to_numpy(dtype="float64") / 1_000_000.0, 2
        )
        return out[["user_id", "n_gaps", "avg_gap_sec", "max_gap_sec"]]

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id"]),
        keys=["user_id"],
        fn=gaps,
    )


def q_rolling_daily_events(sf_dir: str):
    """W2 — frame-based rolling aggregate:
    ``sum/avg(n) OVER (PARTITION BY event_type ORDER BY day
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)`` on the per-day count
    series. Two-phase: a distributed daily groupby-count (map-side partial
    combine) collapses the raw events first, so the rolling exchange moves
    one row per (event_type, day) — O(days × types) regardless of corpus
    size — and the frame kernel is an exact integer cumsum delta."""

    def add_day(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["day"] = (
            batch["ts"].to_numpy(dtype="datetime64[D]").astype("datetime64[us]")
        )
        return batch[["event_type", "day"]]

    daily = bucketed_sum_count(
        _read(sf_dir, "events", columns=["event_type", "ts"]).map_batches(
            add_day, batch_format="pandas"
        ),
        keys=["event_type", "day"],
        sums={},
        count_as="n",
        input_bytes=_tbytes(sf_dir, "events"),
    )

    def roll(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["event_type", "day"]).reset_index(drop=True)
        outs = []
        for _, g in b.groupby("event_type", sort=False):  # O(#types) groups
            n = g["n"].to_numpy(dtype="int64")
            c = np.cumsum(n)
            n7 = c.copy()
            n7[7:] -= c[:-7]  # ROWS 6 PRECEDING..CURRENT = cumsum delta
            cnt7 = np.minimum(np.arange(len(n)) + 1, 7)
            g = g.copy(deep=False)
            g["n_7d"] = n7
            g["avg_7d"] = _round_away(n7.astype("float64") / cnt7, 2)
            outs.append(g)
        return pd.concat(outs, ignore_index=True)

    return bucketed_map_groups(daily, keys=["event_type"], fn=roll)


def q_cumulative_revenue(sf_dir: str):
    """W3 — running total + row_number: ``sum(spend) OVER (PARTITION BY
    o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING)``.
    Spend is fixed to integer cents per order (half-away 2dp, the shared
    contract) BEFORE the prefix sum, so the running total is exact integer
    arithmetic on both sides — the one window where a float accumulator
    genuinely diverges between engines."""

    def cum(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"]
        ).reset_index(drop=True)
        cents = _round_away(b["o_totalprice"].to_numpy() * 100.0, 0).astype("int64")
        key = b["o_custkey"]
        cum_cents = pd.Series(cents).groupby(key.to_numpy(), sort=False).cumsum()
        seq = b.groupby(key, sort=False).cumcount() + 1
        return pd.DataFrame(
            {
                "o_custkey": b["o_custkey"],
                "o_orderkey": b["o_orderkey"],
                "o_orderdate": b["o_orderdate"],
                "order_seq": seq.astype("int64"),
                "cum_spend": cum_cents.to_numpy() / 100.0,
            }
        )

    return bucketed_map_groups(
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]),
        keys=["o_custkey"],
        fn=cum,
    )


def q_order_price_ranks(sf_dir: str):
    """W4 — ranking family: ``rank() / dense_rank() / percent_rank() OVER
    (PARTITION BY month ORDER BY o_totalprice DESC)``. All three are
    order-insensitive given the partition (ties share a rank), and
    percent_rank is derived from integer rank and partition size —
    (rank−1)/(n−1), 0 for a single-row partition — so the 6dp rounding is
    FP-safe."""

    def add_month(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["month"] = (
            batch["o_orderdate"].to_numpy(dtype="datetime64[M]").astype("datetime64[us]")
        )
        return batch[["month", "o_orderkey", "o_totalprice"]]

    def ranks(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("month", sort=False)["o_totalprice"]
        r = g.rank(method="min", ascending=False).to_numpy()
        dr = g.rank(method="dense", ascending=False).to_numpy()
        n = g.transform("size").to_numpy()
        pct = np.where(n > 1, (r - 1.0) / np.maximum(n - 1.0, 1.0), 0.0)
        return pd.DataFrame(
            {
                "month": bucket["month"],
                "o_orderkey": bucket["o_orderkey"],
                "price_rank": r.astype("int64"),
                "price_dense_rank": dr.astype("int64"),
                "price_pct_rank": _round_away(pct, 6),
            }
        )

    return bucketed_map_groups(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"]).map_batches(
            add_month, batch_format="pandas"
        ),
        keys=["month"],
        fn=ranks,
        input_bytes=_tbytes(sf_dir, "orders"),
    )


def q_user_event_path(sf_dir: str):
    """W5 — ordered string aggregation (the funnel-path operator):
    ``string_agg(event_type, '>' ORDER BY ts, event_id)`` per user, plus
    the path length. Order inside the aggregate is what makes this a
    window-class op — the bucketed exchange co-locates each user, the sort
    key (ts, event_id) is unique, so the concatenation is deterministic."""

    def paths(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        g = b.groupby("user_id", sort=False)["event_type"]
        out = pd.DataFrame(
            {"event_path": g.agg(">".join), "path_len": g.size().astype("int64")}
        ).reset_index()
        return out

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"]),
        keys=["user_id"],
        fn=paths,
    )


# ---------------------------------------------------------------------------
# Grouping sets / set algebra / pivot (beyond-reference family, G1-G3):
# ROLLUP, INTERSECT/EXCEPT, and crosstab — the remaining classic SQL
# aggregation shapes. Same design rules as the window family: integer
# arithmetic rides the exchanges, floats round once at the edge.
# ---------------------------------------------------------------------------


def q_activity_rollup(sf_dir: str):
    """G1 — grouping sets: ``GROUP BY ROLLUP(event_type, day)``. The
    (event_type, day) base aggregate is computed once over the raw events
    (map-side partial combine); the coarser levels re-aggregate the BASE's
    O(types × days) partial sums — the hierarchical-reuse plan, so the raw
    table is scanned exactly once however many grouping sets are asked
    for. Value sums stay raw through every level and round once at the
    edge (the shared 2dp contract). The level-0 union runs in one task
    over the bounded level rows, never over the raw table."""
    from ..stages.shuffle import table_rows

    # ROLLUP on an empty table still returns its grand-total row
    # (count 0, sum NULL); the empty pipeline would yield zero blocks,
    # so answer that one row from the parquet footer (zero-cost check)
    if table_rows(_t(sf_dir, "events")) == 0:
        return pd.DataFrame(
            {
                "event_type": pd.array([None], dtype=object),
                "day": np.array(["NaT"], dtype="datetime64[us]"),
                "n_events": np.array([0], dtype="int64"),
                "total_value": [np.nan],
            }
        )

    def add_day(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["day"] = (
            batch["ts"].to_numpy(dtype="datetime64[D]").astype("datetime64[us]")
        )
        return batch[["event_type", "day", "value"]]

    base = bucketed_sum_count(
        _read(sf_dir, "events", columns=["event_type", "ts", "value"]).map_batches(
            add_day, batch_format="pandas"
        ),
        keys=["event_type", "day"],
        sums={"value": "_sv"},
        count_as="n_events",
        input_bytes=_tbytes(sf_dir, "events"),
    )

    def subtotals(bucket: pd.DataFrame) -> pd.DataFrame:
        # pass the base rows through; append one (event_type, NaT) subtotal
        # row per type in this bucket (explicit arrays: an all-NaT column
        # through pd.concat trips the pandas all-NA dtype deprecation)
        g = (
            bucket.groupby("event_type", sort=False)
            .agg(n_events=("n_events", "sum"), _sv=("_sv", "sum"))
            .reset_index()
        )
        return pd.DataFrame(
            {
                "event_type": np.concatenate(
                    [bucket["event_type"].to_numpy(), g["event_type"].to_numpy()]
                ),
                "day": np.concatenate(
                    [
                        bucket["day"].to_numpy(dtype="datetime64[us]"),
                        np.full(len(g), np.datetime64("NaT", "us")),
                    ]
                ),
                "n_events": np.concatenate(
                    [bucket["n_events"].to_numpy(), g["n_events"].to_numpy()]
                ).astype("int64"),
                "_sv": np.concatenate([bucket["_sv"].to_numpy(), g["_sv"].to_numpy()]),
            }
        )

    lv = bucketed_map_groups(base, keys=["event_type"], fn=subtotals)

    def grand(df: pd.DataFrame) -> pd.DataFrame:
        fine = df[df["day"].notna()]  # base rows only — no double count
        # SQL sum() over zero rows is NULL, count(*) is 0 — ROLLUP on an
        # empty table still returns its one grand-total row in that shape
        gsum = float(fine["_sv"].sum()) if len(fine) else np.nan
        out = pd.DataFrame(
            {
                "event_type": np.concatenate(
                    [df["event_type"].to_numpy(), np.array([None], dtype=object)]
                ),
                "day": np.concatenate(
                    [
                        df["day"].to_numpy(dtype="datetime64[us]"),
                        np.array(["NaT"], dtype="datetime64[us]"),
                    ]
                ),
                "n_events": np.concatenate(
                    [df["n_events"].to_numpy(), [fine["n_events"].sum()]]
                ).astype("int64"),
                "_sv": np.concatenate([df["_sv"].to_numpy(), [gsum]]),
            }
        )
        out["total_value"] = _round_away(out["_sv"].to_numpy(dtype="float64"), 2)
        return out[["event_type", "day", "n_events", "total_value"]]

    return lv.repartition(1).map_batches(
        grand, batch_format="pandas", batch_size=None
    )


def q_activity_cube(sf_dir: str):
    """G1b — full CUBE(event_type, day): all four grouping sets. Same
    hierarchical-reuse plan as the ROLLUP — the raw table is scanned once
    into the (event_type, day) base aggregate; every coarser level
    re-aggregates the base's O(types × days) partial sums, which is
    bounded by dimensional cardinality (not corpus size), so the level
    derivation runs in one task over bounded rows. Value sums stay raw
    through every level and round once at the edge."""
    from ..stages.shuffle import table_rows

    if table_rows(_t(sf_dir, "events")) == 0:  # one grand-total row (SQL)
        return pd.DataFrame(
            {
                "event_type": pd.array([None], dtype=object),
                "day": np.array(["NaT"], dtype="datetime64[us]"),
                "n_events": np.array([0], dtype="int64"),
                "total_value": [np.nan],
            }
        )

    def add_day(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["day"] = (
            batch["ts"].to_numpy(dtype="datetime64[D]").astype("datetime64[us]")
        )
        return batch[["event_type", "day", "value"]]

    base = bucketed_sum_count(
        _read(sf_dir, "events", columns=["event_type", "ts", "value"]).map_batches(
            add_day, batch_format="pandas"
        ),
        keys=["event_type", "day"],
        sums={"value": "_sv"},
        count_as="n_events",
        input_bytes=_tbytes(sf_dir, "events"),
    )

    def levels(df: pd.DataFrame) -> pd.DataFrame:
        tp = (
            df.groupby("event_type", sort=False)
            .agg(n_events=("n_events", "sum"), _sv=("_sv", "sum"))
            .reset_index()
        )
        dy = (
            df.groupby("day", sort=False)
            .agg(n_events=("n_events", "sum"), _sv=("_sv", "sum"))
            .reset_index()
        )
        nat = np.datetime64("NaT", "us")
        out = pd.DataFrame(
            {
                "event_type": np.concatenate(
                    [
                        df["event_type"].to_numpy(),
                        tp["event_type"].to_numpy(),
                        np.full(len(dy), None, dtype=object),
                        np.array([None], dtype=object),
                    ]
                ),
                "day": np.concatenate(
                    [
                        df["day"].to_numpy(dtype="datetime64[us]"),
                        np.full(len(tp), nat),
                        dy["day"].to_numpy(dtype="datetime64[us]"),
                        np.array([nat]),
                    ]
                ),
                "n_events": np.concatenate(
                    [
                        df["n_events"].to_numpy(),
                        tp["n_events"].to_numpy(),
                        dy["n_events"].to_numpy(),
                        [df["n_events"].sum()],
                    ]
                ).astype("int64"),
                "_sv": np.concatenate(
                    [
                        df["_sv"].to_numpy(),
                        tp["_sv"].to_numpy(),
                        dy["_sv"].to_numpy(),
                        [float(df["_sv"].sum())],
                    ]
                ),
            }
        )
        out["total_value"] = _round_away(out["_sv"].to_numpy(dtype="float64"), 2)
        return out[["event_type", "day", "n_events", "total_value"]]

    return base.repartition(1).map_batches(
        levels, batch_format="pandas", batch_size=None
    )


def q_user_type_set_ops(sf_dir: str):
    """G2 — set algebra: INTERSECT / EXCEPT over the distinct-user sets of
    two event types, labelled 'both' / 'purchase_only' / 'signup_only'
    (users with neither are absent). One bucketed exchange on user_id with
    a map-side distinct-flags partial; the set operations are two boolean
    columns per user, never a second scan or an anti-join."""

    def member(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["event_type"].isin(("purchase", "signup"))]
        g = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "p": (b["event_type"] == "purchase").to_numpy(),
                "s": (b["event_type"] == "signup").to_numpy(),
            }
        )
        return g.groupby("user_id", sort=False).max().reset_index()

    def classify(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("user_id", sort=False)[["p", "s"]].max().reset_index()
        lab = np.where(
            g["p"] & g["s"], "both",
            np.where(g["p"], "purchase_only", "signup_only"),
        )
        return pd.DataFrame({"user_id": g["user_id"], "membership": lab})

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        keys=["user_id"],
        fn=classify,
        pre=member,
    )


# the fixed event-kind dispatch (reference event kinds style): a pivot is
# only well-defined over a declared column set — an unexpected kind should
# surface in a count-by-type query, not silently widen this schema
_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_daily_type_pivot(sf_dir: str):
    """G3 — pivot / crosstab: one row per day, one count column per event
    type (conditional aggregation over the fixed dispatch). Indicator
    columns are built map-side, so the exchange is the same two-phase
    integer sum as any grouped count — adding pivot columns costs bytes
    per row, not extra scans."""

    def add_cols(batch: pd.DataFrame) -> pd.DataFrame:
        out = {
            "day": batch["ts"].to_numpy(dtype="datetime64[D]").astype("datetime64[us]")
        }
        et = batch["event_type"].to_numpy()
        for t in _PIVOT_TYPES:
            out[f"n_{t}"] = (et == t).astype("int64")
        return pd.DataFrame(out)

    return bucketed_sum_count(
        _read(sf_dir, "events", columns=["event_type", "ts"]).map_batches(
            add_cols, batch_format="pandas"
        ),
        keys=["day"],
        sums={f"n_{t}": f"n_{t}" for t in _PIVOT_TYPES},
        input_bytes=_tbytes(sf_dir, "events"),
    )


def q_activity_timeline_dense(sf_dir: str):
    """Gap-filled timeline (G5 — the date-spine operator): every
    (hour, event_type) cell between the corpus's first and last hour,
    zero-filled where no events landed — the reshape a charting/feature
    layer needs from a sparse groupby. The counts are the distributed
    two-phase aggregate; the spine is CALENDAR-sized (hours × types), so
    materializing and merging it driver-side is O(output), bounded by
    time range and type cardinality — never by corpus size. Pure integer
    counts: no float contract at all."""
    counts = bucketed_sum_count(
        _read(sf_dir, "events", columns=["ts", "event_type"]).map_batches(
            lambda b: pa.table(
                {
                    "window_start": pc.floor_temporal(b["ts"], unit="hour"),
                    "event_type": b["event_type"],
                }
            ),
            batch_format="pyarrow",
        ),
        keys=["window_start", "event_type"],
        sums={},
        count_as="n_events",
        input_bytes=_tbytes(sf_dir, "events"),
    ).to_pandas()  # O(observed cells) ≤ O(hours × types) — bounded
    if counts.empty:  # oracle: generate_series over NULL bounds = empty set
        return pd.DataFrame(
            {
                "window_start": pd.array([], dtype="datetime64[us]"),
                "event_type": pd.array([], dtype="str"),
                "n_events": pd.array([], dtype="int64"),
            }
        )
    lo, hi = counts["window_start"].min(), counts["window_start"].max()
    hours = pd.date_range(lo, hi, freq="h").astype(
        counts["window_start"].dtype  # ns → µs: match the Arrow timestamps
    )
    spine = pd.MultiIndex.from_product(
        [hours, sorted(counts["event_type"].unique())],
        names=["window_start", "event_type"],
    )
    out = (
        counts.set_index(["window_start", "event_type"])
        .reindex(spine, fill_value=0)
        .reset_index()
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out


def q_user_event_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution (behavioral
    diversity, in bits): the fixed-dispatch pivot counts ride ONE integer
    exchange, then entropy = −Σ (cᵢ/n)·log2(cᵢ/n) is evaluated over the
    FIXED type order on the O(#users) result — the oracle spells the same
    per-type CASE terms added left-to-right, so distributed execution
    cannot reorder the float sum. The formula is validated against
    DuckDB's native entropy() in tests/test_relevance_fuzzy.py."""

    def add_cols(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"user_id": batch["user_id"].to_numpy()}
        et = batch["event_type"].to_numpy()
        for t in _PIVOT_TYPES:
            out[f"c_{t}"] = (et == t).astype("int64")
        return pd.DataFrame(out)

    grouped = bucketed_sum_count(
        _read(sf_dir, "events", columns=["user_id", "event_type"]).map_batches(
            add_cols, batch_format="pandas"
        ),
        keys=["user_id"],
        sums={f"c_{t}": f"c_{t}" for t in _PIVOT_TYPES},
        count_as="n_events",
        input_bytes=_tbytes(sf_dir, "events"),
    )

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_events"].to_numpy(dtype="float64")
        ent = np.zeros(len(df), dtype="float64")
        for t in _PIVOT_TYPES:  # FIXED order — mirrors the oracle's terms
            c = df[f"c_{t}"].to_numpy(dtype="float64")
            p = c / n
            term = np.where(c > 0.0, -(p * np.log2(np.where(c > 0.0, p, 1.0))), 0.0)
            ent = ent + term
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "n_events": df["n_events"].astype("int64"),
                "entropy_bits": _round_away(ent, 6),
            }
        )

    return grouped.map_batches(derive, batch_format="pandas")


_FUNNEL_WINDOW_US = 30 * 60 * 1_000_000  # the view→purchase attribution window


def q_purchase_conversions(sf_dir: str, num_buckets: int | None = None):
    """Funnel conversion (W8 — event-pattern matching): per user, how many
    purchases had a 'view' by the same user within the preceding 30
    minutes (inclusive both ends, the SQL BETWEEN the oracle spells).
    One bucketed exchange on user_id; the per-bucket kernel is a fully
    vectorized segment range-count — views and purchases both sorted by
    (user, ts), each purchase's window resolved by TWO searchsorted calls
    over a packed (user-code · span + ts-offset) key. The packing is
    injective because span exceeds the bucket's time range plus the
    window; a bucket that would overflow int64 fails loudly (the CDC
    key-packing discipline). Pure integer output — no float contract."""

    def project(batch: pa.Table) -> pd.DataFrame:
        m = pc.is_in(batch["event_type"], pa.array(["view", "purchase"]))
        b = batch.filter(m)
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(zero_copy_only=False),
                "ts_us": b["ts"].to_numpy(zero_copy_only=False).astype("int64"),
                "is_purchase": pc.equal(b["event_type"], "purchase")
                .to_numpy(zero_copy_only=False)
                .astype("int8"),
            }
        )

    _FUNNEL_EMPTY = pd.DataFrame(
        {
            "user_id": pd.array([], dtype="int64"),
            "n_purchases": pd.array([], dtype="int64"),
            "n_converted": pd.array([], dtype="int64"),
        }
    )

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or not g["is_purchase"].any():
            return _FUNNEL_EMPTY.copy()
        ts = g["ts_us"].to_numpy()
        codes, users = pd.factorize(g["user_id"].to_numpy())  # bucket-local
        t0 = int(ts.min())
        span = int(ts.max()) - t0 + _FUNNEL_WINDOW_US + 2
        if (len(users)) * span >= np.iinfo(np.int64).max:
            raise ValueError(
                "purchase_conversions: bucket too wide to pack (users × "
                "time-span exceeds int64) — raise num_buckets"
            )
        key = codes.astype("int64") * span + (ts - t0)
        isp = g["is_purchase"].to_numpy().astype(bool)
        vk = np.sort(key[~isp])
        pk = key[isp]
        lo = np.searchsorted(vk, pk - _FUNNEL_WINDOW_US, side="left")
        hi = np.searchsorted(vk, pk, side="right")
        conv = (hi > lo).astype("int64")
        out = pd.DataFrame({"user_id": g["user_id"].to_numpy()[isp], "c": conv})
        agg = out.groupby("user_id", sort=False).agg(
            n_purchases=("c", "size"), n_converted=("c", "sum")
        ).reset_index()
        agg["n_purchases"] = agg["n_purchases"].astype("int64")
        agg["n_converted"] = agg["n_converted"].astype("int64")
        return agg

    return bucketed_map_groups(
        _read(sf_dir, "events", columns=["user_id", "ts", "event_type"]).map_batches(
            project, batch_format="pyarrow"
        ),
        keys=["user_id"],
        fn=funnel,
        num_buckets=num_buckets,
        input_bytes=_tbytes(sf_dir, "events"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregates (beyond-reference family, X1-X4): sample
# variance/stddev, Pearson correlation + sample covariance, grouped mode,
# and NTILE. The float contract here is the strictest in the repo: every
# sum rides the exchange as EXACT integers (quantity is integral 1-50,
# discount is 2dp → cents), the closed-form moment formulas are evaluated
# over arbitrary-precision Python ints on the O(#groups) grouped result,
# and the oracle SQL spells the IDENTICAL formula over DuckDB's exact
# HUGEINT sums — one float division (and one IEEE sqrt) per output value,
# bit-identical on both sides before the shared 6dp rounding. A float
# accumulator (the textbook sum-of-squares) would differ between engines
# in the last ulps because distributed addition reorders; exact integers
# make the question disappear.
# ---------------------------------------------------------------------------


def _obj_ints(s: pd.Series) -> pd.Series:
    """int64 → arbitrary-precision Python ints: the moment formulas square
    corpus-sized sums (n·Σx² at 10^12 rows overflows int64), and the
    grouped result is O(#groups) rows, so exact object arithmetic is free."""
    return s.astype(object)


def _int_exact(a: np.ndarray, name: str) -> np.ndarray:
    """Checked float→int64: the family's exact-integer contract relies on
    integral inputs (the oracle CASTs, this side truncates — they agree
    only when nothing is lost), so a non-integral value fails loudly
    instead of silently diverging from the oracle."""
    out = a.astype("int64")
    if not (out == a).all():
        raise ValueError(
            f"{name}: non-integral values break the exact-integer contract"
        )
    return out


def q_quantity_moments(sf_dir: str):
    """X1 — grouped sample variance / stddev: TPC-H-Q1-shaped moments of
    l_quantity per (returnflag, linestatus). Σq and Σq² are int64 partials
    through one bucketed exchange (quantity ≤ 50 ⇒ Σq² fits int64 past
    10^14 rows); var_samp = (n·Σq² − (Σq)²) / (n·(n−1)) evaluated exactly,
    divided once in DOUBLE. Single-row groups yield NULL (SQL var_samp),
    guarded identically on both sides."""

    def add_cols(batch: pd.DataFrame) -> pd.DataFrame:
        q = _int_exact(batch["l_quantity"].to_numpy(), "l_quantity")
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(),
                "l_linestatus": batch["l_linestatus"].to_numpy(),
                "q": q,
                "q2": q * q,
            }
        )

    grouped = bucketed_sum_count(
        _read(
            sf_dir, "lineitem",
            columns=["l_returnflag", "l_linestatus", "l_quantity"],
        ).map_batches(add_cols, batch_format="pandas"),
        keys=["l_returnflag", "l_linestatus"],
        sums={"q": "_sq", "q2": "_sq2"},
        count_as="n_rows",
        input_bytes=_tbytes(sf_dir, "lineitem"),
    )

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        n, sq, sq2 = _obj_ints(df["n_rows"]), _obj_ints(df["_sq"]), _obj_ints(df["_sq2"])
        num, den = n * sq2 - sq * sq, n * (n - 1)
        raw = np.where(
            den.to_numpy() != 0,
            num.astype("float64") / den.replace(0, 1).astype("float64"),
            np.nan,
        )
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "n_rows": df["n_rows"],
                "mean_qty": _round_away(
                    sq.astype("float64").to_numpy() / n.astype("float64").to_numpy(), 6
                ),
                "var_qty": _round_away(raw, 6),
                "stddev_qty": _round_away(np.sqrt(raw), 6),
            }
        )

    return grouped.map_batches(derive, batch_format="pandas")


def _quantity_discount_sums(sf_dir: str):
    """Shared X2/X5 pipeline: the grouped five-integer-sum exchange
    (Σx, Σy, Σxy, Σx², Σy² + count) of quantity vs discount-cents per
    returnflag — correlation and regression differ only in the O(#groups)
    float derivation at the edge."""

    def add_cols(batch: pd.DataFrame) -> pd.DataFrame:
        x = _int_exact(batch["l_quantity"].to_numpy(), "l_quantity")
        # cents are exact BY the rounding (the oracle rounds identically),
        # so no integrality check is needed on the discount side
        y = _round_away(batch["l_discount"].to_numpy() * 100.0, 0).astype("int64")
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(),
                "x": x, "y": y, "xy": x * y, "x2": x * x, "y2": y * y,
            }
        )

    return bucketed_sum_count(
        _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_discount"]).map_batches(
            add_cols, batch_format="pandas"
        ),
        keys=["l_returnflag"],
        sums={"x": "_sx", "y": "_sy", "xy": "_sxy", "x2": "_sx2", "y2": "_sy2"},
        count_as="n_rows",
        input_bytes=_tbytes(sf_dir, "lineitem"),
    )


def q_quantity_discount_corr(sf_dir: str):
    """X2 — Pearson correlation + sample covariance of quantity vs
    discount-cents per returnflag. Five integer sums (Σx, Σy, Σxy, Σx²,
    Σy²) ride one exchange; corr = (n·Σxy − ΣxΣy) /
    (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)) with exact integer inner terms,
    each cast to DOUBLE once — sqrt is correctly-rounded IEEE, so both
    engines produce the same doubles. Zero-variance groups yield NULL,
    guarded identically in the oracle's CASE."""
    grouped = _quantity_discount_sums(sf_dir)

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        n = _obj_ints(df["n_rows"])
        sx, sy = _obj_ints(df["_sx"]), _obj_ints(df["_sy"])
        sxy, sx2, sy2 = _obj_ints(df["_sxy"]), _obj_ints(df["_sx2"]), _obj_ints(df["_sy2"])
        num = n * sxy - sx * sy
        dena, denb = n * sx2 - sx * sx, n * sy2 - sy * sy
        nn1 = n * (n - 1)
        ok = ((dena > 0) & (denb > 0)).to_numpy(dtype=bool)
        corr = np.where(
            ok,
            num.astype("float64")
            / (
                np.sqrt(dena.replace(0, 1).astype("float64"))
                * np.sqrt(denb.replace(0, 1).astype("float64"))
            ),
            np.nan,
        )
        cov = np.where(
            nn1.to_numpy() != 0,
            num.astype("float64") / nn1.replace(0, 1).astype("float64"),
            np.nan,
        )
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "n_rows": df["n_rows"],
                "covar_qd": _round_away(cov, 6),
                "corr_qd": _round_away(corr, 6),
            }
        )

    return grouped.map_batches(derive, batch_format="pandas")


def q_quantity_discount_regression(sf_dir: str):
    """X5 — linear-regression aggregates: regr_slope / regr_intercept /
    regr_r2 of discount-cents on quantity per returnflag. The same five
    exact integer sums as the correlation query; slope =
    (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) with both terms exact, intercept
    derived as (Σy − slope·Σx)/n in the same operation order on both
    sides, r² = corr². Degenerate groups follow the SQL-standard builtins
    exactly (pinned by hypothesis against DuckDB's regr_*): zero
    x-variance → all three NULL; zero y-variance with varying x → slope 0,
    intercept ȳ, and r² = 1 (a constant fits itself perfectly)."""
    grouped = _quantity_discount_sums(sf_dir)

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        n = _obj_ints(df["n_rows"])
        sx, sy = _obj_ints(df["_sx"]), _obj_ints(df["_sy"])
        sxy, sx2, sy2 = _obj_ints(df["_sxy"]), _obj_ints(df["_sx2"]), _obj_ints(df["_sy2"])
        num = n * sxy - sx * sy
        dena, denb = n * sx2 - sx * sx, n * sy2 - sy * sy
        oka = (dena > 0).to_numpy(dtype=bool)
        okb = ((dena > 0) & (denb > 0)).to_numpy(dtype=bool)
        slope = np.where(
            oka,
            num.astype("float64") / dena.replace(0, 1).astype("float64"),
            np.nan,
        )
        intercept = np.where(
            oka,
            (sy.astype("float64") - slope * sx.astype("float64"))
            / n.astype("float64"),
            np.nan,
        )
        corr = np.where(
            okb,
            num.astype("float64")
            / (
                np.sqrt(dena.replace(0, 1).astype("float64"))
                * np.sqrt(denb.replace(0, 1).astype("float64"))
            ),
            np.nan,
        )
        # DuckDB/SQL regr_r2 of a CONSTANT y over varying x is 1 (a
        # constant fits itself perfectly), not NULL like corr
        const_y = (oka & (denb == 0).to_numpy(dtype=bool))
        r2 = np.where(const_y, 1.0, corr * corr)
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "n_rows": df["n_rows"],
                "slope": _round_away(slope, 6),
                "intercept": _round_away(intercept, 6),
                "r2": _round_away(r2, 6),
            }
        )

    return grouped.map_batches(derive, batch_format="pandas")


def q_quantity_skew_kurtosis(sf_dir: str):
    """X6 — higher moments: adjusted Fisher-Pearson sample skewness and
    sample excess kurtosis of l_quantity per returnflag (the two shape
    statistics DuckDB's native ``skewness``/``kurtosis`` compute — the
    formula is validated against those builtins by hypothesis in
    tests/test_analytics_oracle.py). Four integer power sums (Σq..Σq⁴)
    ride one exchange (q ≤ 50 ⇒ Σq⁴ fits int64 past 10^12 rows); the
    scaled central moments A = n·S2 − S1², B = n²·S3 − 3n·S1·S2 + 2S1³,
    C = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3S1⁴ are exact object/HUGEINT
    integers on both sides, and the float derivation — skew =
    √(n(n−1))/(n−2) · B/(A·√A), kurt = ((n+1)·(C/A² − 3) + 6) ·
    (n−1)/((n−2)(n−3)) — is mirrored operation-for-operation in the
    oracle (only IEEE sqrt/div/mul after the exact part). Degenerate
    groups (n < 3 / n < 4, zero variance) are NULL under the same CASE
    guards on both sides."""

    def add_cols(batch: pd.DataFrame) -> pd.DataFrame:
        q = _int_exact(batch["l_quantity"].to_numpy(), "l_quantity")
        q2 = q * q
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(),
                "s1": q, "s2": q2, "s3": q2 * q, "s4": q2 * q2,
            }
        )

    grouped = bucketed_sum_count(
        _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"]).map_batches(
            add_cols, batch_format="pandas"
        ),
        keys=["l_returnflag"],
        sums={"s1": "_s1", "s2": "_s2", "s3": "_s3", "s4": "_s4"},
        count_as="n_rows",
        input_bytes=_tbytes(sf_dir, "lineitem"),
    )

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        n = _obj_ints(df["n_rows"])
        s1, s2 = _obj_ints(df["_s1"]), _obj_ints(df["_s2"])
        s3, s4 = _obj_ints(df["_s3"]), _obj_ints(df["_s4"])
        a = n * s2 - s1 * s1
        bb = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
        cc = (n * n * n * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1)
        n_np = df["n_rows"].to_numpy(dtype="int64")
        a_ok = (a > 0).to_numpy(dtype=bool)
        a_d = a.where(a > 0, 1).astype("float64").to_numpy()
        b_d, c_d = bb.astype("float64").to_numpy(), cc.astype("float64").to_numpy()
        nn1_d = (n * (n - 1)).astype("float64").to_numpy()
        skew = np.where(
            (n_np >= 3) & a_ok,
            np.sqrt(nn1_d) / np.maximum(n_np - 2, 1).astype("float64")
            * (b_d / (a_d * np.sqrt(a_d))),
            np.nan,
        )
        g2 = c_d / (a_d * a_d) - 3.0
        nm2nm3 = np.maximum((n_np - 2) * (n_np - 3), 1).astype("float64")
        kurt = np.where(
            (n_np >= 4) & a_ok,
            ((n_np + 1).astype("float64") * g2 + 6.0)
            * ((n_np - 1).astype("float64") / nm2nm3),
            np.nan,
        )
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "n_rows": df["n_rows"],
                "skew_qty": _round_away(skew, 6),
                "kurt_qty": _round_away(kurt, 6),
            }
        )

    return grouped.map_batches(derive, batch_format="pandas")


def q_quantity_zscore(sf_dir: str):
    """X7 — the standard-scaler normalization (two-pass feature scaling):
    z = (x − μ_g)/σ_g of l_quantity within its returnflag group, the
    preprocessing step an ML feature pipeline runs per column. Pass 1 is
    the exact-integer grouped moment exchange (O(#groups) driver rows);
    μ/σ are derived ONCE per group in the mirrored operation order; pass
    2 is a pure map that broadcasts the tiny (group → μ, σ) table. The
    output is row-level (the whole table, normalized) — the engine's
    largest-output oracle class, like the unpivot. Zero-variance groups
    yield NULL z under the same CASE guard."""
    import ray

    from ..stages.actors import cached_get

    def add_cols(batch: pd.DataFrame) -> pd.DataFrame:
        q = _int_exact(batch["l_quantity"].to_numpy(), "l_quantity")
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(),
                "q": q,
                "q2": q * q,
            }
        )

    grouped = bucketed_sum_count(
        _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"]).map_batches(
            add_cols, batch_format="pandas"
        ),
        keys=["l_returnflag"],
        sums={"q": "_sq", "q2": "_sq2"},
        count_as="n_rows",
        input_bytes=_tbytes(sf_dir, "lineitem"),
    ).to_pandas()  # O(#groups)

    mu_d: dict[str, float] = {}
    sig_d: dict[str, float] = {}
    for flag, n, sq, sq2 in zip(
        grouped["l_returnflag"], grouped["n_rows"], grouped["_sq"], grouped["_sq2"]
    ):
        n, sq, sq2 = int(n), int(sq), int(sq2)
        mu_d[flag] = float(sq) / float(n)
        num, den = n * sq2 - sq * sq, n * (n - 1)
        sig_d[flag] = (
            float(np.sqrt(float(num) / float(den)))
            if den > 0 and num > 0 else np.nan
        )
    # two tiny Series, broadcast once — the per-batch lookup is a
    # vectorized hash join (Series.map), never a per-row Python loop
    ref = ray.put((pd.Series(mu_d), pd.Series(sig_d)))

    def zmap(batch: pd.DataFrame) -> pd.DataFrame:
        mu_s, sig_s = cached_get(ref)
        q = _int_exact(batch["l_quantity"].to_numpy(), "l_quantity").astype(
            "float64"
        )
        flags = pd.Series(batch["l_returnflag"].to_numpy())
        mu = flags.map(mu_s).to_numpy(dtype="float64")
        sig = flags.map(sig_s).to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(dtype="int64"),
                "l_linenumber": batch["l_linenumber"].to_numpy(dtype="int64"),
                "l_returnflag": flags,
                "z_qty": _round_away((q - mu) / sig, 6),
            }
        )

    return _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
    ).map_batches(zmap, batch_format="pandas")


_SPLIT_SEED = 23
_SPLIT_TRAIN_PCT = 90


def q_train_val_split(sf_dir: str):
    """Deterministic train/validation split: doc → 'train' (90%) or 'val'
    (10%) by the same HUGEINT-expressible hash bijection the shard
    shuffle uses — reproducible from (corpus, seed) alone, embarrassingly
    parallel, and any node can re-derive any doc's split without
    coordination."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        h = id_hash(ids + np.int64(_SPLIT_SEED)).astype(np.int64) % np.int64(100)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "split": np.where(h < _SPLIT_TRAIN_PCT, "train", "val"),
            }
        )

    return _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        tag, batch_format="pandas"
    )


def q_quantity_mode(sf_dir: str):
    """X3 — grouped mode (most frequent l_quantity per returnflag, ties to
    the smallest value). Two-phase count by (group, value) map-side — the
    exchange moves O(groups × distinct-values) rows — then the argmax runs
    inside the group's bucket with the (count DESC, value ASC) tie-break
    the oracle's row_number spells out."""

    def counts(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(),
                "mode_qty": _int_exact(batch["l_quantity"].to_numpy(), "l_quantity"),
            }
        )
        return b.groupby(["l_returnflag", "mode_qty"], sort=False).size().reset_index(
            name="n"
        )

    def argmax(bucket: pd.DataFrame) -> pd.DataFrame:
        g = (
            bucket.groupby(["l_returnflag", "mode_qty"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        g = g.sort_values(
            ["l_returnflag", "n", "mode_qty"], ascending=[True, False, True]
        )
        top = g.drop_duplicates("l_returnflag", keep="first")
        return pd.DataFrame(
            {
                "l_returnflag": top["l_returnflag"].to_numpy(),
                "mode_qty": top["mode_qty"].to_numpy(dtype="int64"),
                "mode_count": top["n"].to_numpy(dtype="int64"),
            }
        )

    return bucketed_map_groups(
        _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"]),
        keys=["l_returnflag"],
        fn=argmax,
        pre=counts,
        input_bytes=_tbytes(sf_dir, "lineitem"),
    )


def q_order_price_ntile(sf_dir: str):
    """X4 — NTILE(4) per month over (o_totalprice DESC, o_orderkey): the
    equal-height bucketing window. SQL NTILE semantics exactly — the first
    (n mod k) tiles carry ceil(n/k) rows — computed vectorized from the
    in-bucket row number and partition size; the secondary o_orderkey key
    makes the order (hence the tile of every tied row) deterministic."""
    K = 4

    def add_month(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["month"] = (
            batch["o_orderdate"].to_numpy(dtype="datetime64[M]").astype("datetime64[us]")
        )
        return batch[["month", "o_orderkey", "o_totalprice"]]

    def tiles(bucket: pd.DataFrame) -> pd.DataFrame:
        from ..functions.windowfns import sql_ntile

        b = bucket.sort_values(
            ["month", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
        ).reset_index(drop=True)
        g = b.groupby("month", sort=False)
        rn = g.cumcount().to_numpy(dtype="int64")  # 0-based within partition
        n = g["o_orderkey"].transform("size").to_numpy(dtype="int64")
        return pd.DataFrame(
            {
                "month": b["month"],
                "o_orderkey": b["o_orderkey"],
                "price_quartile": sql_ntile(rn, n, K),
            }
        )

    return bucketed_map_groups(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"]).map_batches(
            add_month, batch_format="pandas"
        ),
        keys=["month"],
        fn=tiles,
        input_bytes=_tbytes(sf_dir, "orders"),
    )


_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_lineitem_unpivot(sf_dir: str):
    """G4 — UNPIVOT / melt (the inverse of the crosstab): four measure
    columns become (measure, value) rows keyed by (l_orderkey,
    l_linenumber). Pure map-side reshape — zero-copy Arrow concat of the
    four column slices per batch, no exchange at all; output is 4× the
    rows but each carries two small columns, so at 100 TB this is
    bandwidth-shaped exactly like the read. NULL cells are excluded,
    matching SQL UNPIVOT's default (no INCLUDE NULLS)."""

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ok, ln = batch["l_orderkey"], batch["l_linenumber"]
        out = pa.table(
            {
                "l_orderkey": pa.concat_arrays(
                    [ok.combine_chunks()] * len(_UNPIVOT_MEASURES)
                ),
                "l_linenumber": pa.concat_arrays(
                    [ln.combine_chunks()] * len(_UNPIVOT_MEASURES)
                ),
                "measure": pa.array(
                    np.repeat(np.array(_UNPIVOT_MEASURES), n), pa.string()
                ),
                "value": pa.concat_arrays(
                    [
                        pc.cast(batch[m], pa.float64()).combine_chunks()
                        for m in _UNPIVOT_MEASURES
                    ]
                ),
            }
        )
        return out.filter(pc.is_valid(out["value"]))

    return _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", *_UNPIVOT_MEASURES],
    ).map_batches(melt, batch_format="pyarrow")


def q_top_words_sketch(sf_dir: str, k: int = 4096, topn: int = 20):
    """Heavy hitters — the Misra-Gries scale path for trending_words'
    frequency leg (rows-only: approximate by construction; accuracy pinned
    by test_sketches.py against the exact counts). Per batch the exact
    word counts collapse to a ≤k-pair MG summary, the one exchange is a
    plain grouped sum over those pairs (≤ k rows per batch, not one per
    word occurrence), and the final decrement-truncate runs once over the
    merged O(batches × k) pairs. Counts are lower bounds within n/(k+1) of
    truth — at 100 TB the exchange is bounded by k per batch regardless of
    vocabulary size, which is the whole point."""
    from ..stages.sketches import MisraGries

    mg = MisraGries(k)

    def explode(batch: pa.Table) -> pa.Table:
        return _explode_words(batch, [])

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        items, counts = np.unique(batch["word"].to_numpy(), return_counts=True)
        items, counts = mg.summarize(items, counts)
        return pd.DataFrame({"word": items, "cnt": counts})

    merged = bucketed_sum_count(
        _read(sf_dir, "documents", columns=["text"])
        .map_batches(explode, batch_format="pyarrow")
        .map_batches(summarize, batch_format="pandas"),
        keys=["word"],
        sums={"cnt": "cnt"},
        input_bytes=_tbytes(sf_dir, "documents"),
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        items, counts = mg.truncate(df["word"].to_numpy(), df["cnt"].to_numpy())
        return pd.DataFrame(
            {
                "word": items[:topn],
                "est_count": counts[:topn].astype("int64"),
                "rank": np.arange(1, min(topn, len(items)) + 1, dtype="int64"),
            }
        )

    return merged.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def q_top_words_per_source_sketch(sf_dir: str, k: int = 1024, topn: int = 5):
    """GROUPED heavy hitters — Misra-Gries per source (the per-group twin
    of `top_words_sketch`, completing the grouped-sketch symmetry: HLL has
    `approx_distinct_users`, t-digest has `median_price_per_brand_tdigest`).
    Per batch each source's exact counts collapse to a ≤k-pair summary, the
    bucketed exchange on source moves O(sources × batches × k) pairs, and
    the per-source decrement-truncate + top-n runs inside the bucket —
    the per-source undercount bound is n_source/(k+1)."""
    from ..stages.sketches import MisraGries

    mg = MisraGries(k)

    def explode(batch: pa.Table) -> pa.Table:
        return _explode_words(batch, ["source"])

    _EMPTY_SUMMARY = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            "word": pd.Series([], dtype=object),
            "cnt": pd.Series([], dtype="int64"),
        }
    )

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in batch.groupby("source", sort=False):  # O(#sources)
            items, counts = np.unique(g["word"].to_numpy(), return_counts=True)
            items, counts = mg.summarize(items, counts)
            rows.append(
                pd.DataFrame({"source": src, "word": items, "cnt": counts})
            )
        if not rows:  # dtype-pinned: an empty block must keep the schema
            return _EMPTY_SUMMARY
        return pd.concat(rows, ignore_index=True)

    def per_source(bucket: pd.DataFrame) -> pd.DataFrame:
        out = []
        merged = (
            bucket.groupby(["source", "word"], sort=False)["cnt"].sum().reset_index()
        )
        for src, g in merged.groupby("source", sort=False):
            items, counts = mg.truncate(g["word"].to_numpy(), g["cnt"].to_numpy())
            out.append(
                pd.DataFrame(
                    {
                        "source": src,
                        "word": items[:topn],
                        "est_count": counts[:topn].astype("int64"),
                        "rank": np.arange(
                            1, min(topn, len(items)) + 1, dtype="int64"
                        ),
                    }
                )
            )
        if not out:  # dtype-pinned empty (see summarize)
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "word": pd.Series([], dtype=object),
                    "est_count": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_map_groups(
        _read(sf_dir, "documents", columns=["text", "source"])
        .map_batches(explode, batch_format="pyarrow")
        .map_batches(summarize, batch_format="pandas"),
        keys=["source"],
        fn=per_source,
        input_bytes=_tbytes(sf_dir, "documents"),
    )


# ---------------------------------------------------------------------------
# market-basket co-occurrence — "parts bought together". The within-order
# pair fan-out is quadratic in BASKET size, not corpus size (TPC-H orders
# hold ≤7 lines; real carts are O(10)) — that bounded-group premise is the
# scale contract, the same one the word-Jaccard pipeline enforces with
# max_df. Two exchanges: co-locate orders, then aggregate pair counts.
# ---------------------------------------------------------------------------


def _basket_pair_counts(sf_dir: str, count_as: str = "n_orders"):
    """(part_a, part_b, <count_as>) for every co-purchased part pair —
    the level-2 frequent-itemset table both basket queries share."""
    from ..functions.pairs import within_group_pair_indices

    def pair_fn(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"part_a": [], "part_b": []}).astype("int64")
        if not len(bucket):
            return empty
        # distinct (order, part): the same part on two lines of one order
        # is one basket membership, not two
        b = bucket.drop_duplicates(["l_orderkey", "l_partkey"])
        codes, _ = pd.factorize(b["l_orderkey"].to_numpy(), sort=False)
        order = np.lexsort((b["l_partkey"].to_numpy(), codes))
        ids = b["l_partkey"].to_numpy()[order]
        a_idx, b_idx = within_group_pair_indices(codes[order])
        if not len(a_idx):
            return empty
        # part ascending within each order run -> part_a < part_b
        return pd.DataFrame({"part_a": ids[a_idx], "part_b": ids[b_idx]})

    pairs = bucketed_map_groups(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]),
        keys=["l_orderkey"],
        fn=pair_fn,
        input_bytes=_tbytes(sf_dir, "lineitem"),
    ).materialize()  # two consecutive all-to-alls: split the fused plan
    return bucketed_sum_count(
        pairs,
        ["part_a", "part_b"],
        sums={},
        count_as=count_as,
        input_bytes=pairs.size_bytes() or _tbytes(sf_dir, "lineitem"),
    )


def q_basket_pairs(sf_dir: str, k: int = 50):
    return local_topk(
        _basket_pair_counts(sf_dir), by=["n_orders", "part_a", "part_b"],
        descending=[True, False, False], k=k,
    )


def q_basket_rules(sf_dir: str, k: int = 50):
    """Association rules over the co-purchase pairs: for each directed rule
    antecedent→consequent, support = c/N, confidence = c/n_a and
    lift = c·N/(n_a·n_b) — every numerator and denominator an exact
    integer riding its own bucketed aggregate, the floats derived once at
    the edge (the products stay < 2^53 up to ~10^8-basket catalogs; past
    that the lift expression moves to the arbitrary-precision O(#rules)
    edge exactly like the moments family). Three exchanges total: the
    shared pair table, one part-frequency aggregate, and the two
    endpoint joins (bucketed, never collected)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def part_count_fn(bucket: pd.DataFrame) -> pd.DataFrame:
        # bucket key = l_partkey, so ALL (order, part) rows of a part are
        # here: within-bucket distinct == global basket-membership count
        b = bucket.drop_duplicates(["l_orderkey", "l_partkey"])
        out = b.groupby("l_partkey", sort=False).size().rename("n_part")
        out = out.reset_index()
        out["n_part"] = out["n_part"].astype("int64")
        return out

    def order_count_fn(bucket: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(bucket["l_orderkey"].nunique())]})

    # N: one int on the driver (the only thing collected); `or 0` because
    # Dataset.sum of an empty dataset is None
    n_baskets = int(
        bucketed_map_groups(
            li, ["l_orderkey"], order_count_fn,
            input_bytes=_tbytes(sf_dir, "lineitem"),
        ).sum("n")
        or 0
    )
    if n_baskets == 0:
        # Typed empty table returned directly: Ray drops column metadata on
        # 0-row from_arrow blocks, and the registry contract allows pa.Table.
        return pa.table(
            {"antecedent": pa.array([], pa.int64()),
             "consequent": pa.array([], pa.int64()),
             "support": pa.array([], pa.float64()),
             "confidence": pa.array([], pa.float64()),
             "lift": pa.array([], pa.float64())}
        )
    pc = bucketed_map_groups(
        li, ["l_partkey"], part_count_fn,
        input_bytes=_tbytes(sf_dir, "lineitem"),
    ).materialize()
    co = _basket_pair_counts(sf_dir, count_as="c").materialize()

    pc_a = pc.map_batches(
        lambda b: b.rename(columns={"l_partkey": "pa_key", "n_part": "n_a"}),
        batch_format="pandas",
    )
    pc_b = pc.map_batches(
        lambda b: b.rename(columns={"l_partkey": "pb_key", "n_part": "n_b"}),
        batch_format="pandas",
    )
    j = bucketed_hash_join(co, pc_a, left_on=["part_a"], right_on=["pa_key"])
    j = bucketed_hash_join(j, pc_b, left_on=["part_b"], right_on=["pb_key"])

    def rules(batch: pd.DataFrame) -> pd.DataFrame:
        pa_ = batch["part_a"].to_numpy(dtype=np.int64)
        pb_ = batch["part_b"].to_numpy(dtype=np.int64)
        c = batch["c"].to_numpy(dtype=np.float64)
        na = batch["n_a"].to_numpy(dtype=np.float64)
        nb = batch["n_b"].to_numpy(dtype=np.float64)
        # both rule directions; support and lift are symmetric, confidence
        # conditions on the antecedent
        ante = np.concatenate([pa_, pb_])
        cons = np.concatenate([pb_, pa_])
        cc = np.concatenate([c, c])
        n1 = np.concatenate([na, nb])
        n2 = np.concatenate([nb, na])
        return pd.DataFrame(
            {
                "antecedent": ante,
                "consequent": cons,
                "support": _round_away(cc / n_baskets, 6),
                "confidence": _round_away(cc / n1, 6),
                "lift": _round_away(cc * float(n_baskets) / (n1 * n2), 6),
            }
        )

    return local_topk(
        j.map_batches(rules, batch_format="pandas"),
        by=["lift", "antecedent", "consequent"],
        descending=[True, False, False],
        k=k,
    )


# ---------------------------------------------------------------------------
# grouped MAD (median absolute deviation) outlier screen — the robust
# two-pass companion to quantity_zscore (mean/std break under the very
# outliers being hunted; median/MAD don't). Both medians happen INSIDE one
# brand-co-located bucket, so the "two passes" cost one exchange. Exactness:
# prices are 2-decimal, so integer cents make every intermediate a quarter-
# integer — exactly representable doubles, making the strict `dev > 3·MAD`
# boundary comparison bit-identical to the oracle's (a float formulation
# could flip a count on an ulp).
# ---------------------------------------------------------------------------


def q_price_mad_outliers(sf_dir: str):
    def mad_fn(bucket: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            bucket["p_retailprice"].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        b = pd.DataFrame({"p_brand": bucket["p_brand"].to_numpy(), "c": cents})
        g = b.groupby("p_brand", sort=False)["c"]
        med = g.transform("median")  # half-integer cents: exact double
        b["dev"] = np.abs(b["c"].to_numpy(dtype=np.float64) - med.to_numpy())
        g2 = b.groupby("p_brand", sort=False)
        mad_row = g2["dev"].transform("median")  # quarter-int: exact double
        b["out"] = b["dev"].to_numpy() > 3.0 * mad_row.to_numpy()
        g2 = b.groupby("p_brand", sort=False)
        out = g2.agg(
            n_parts=("c", "size"),
            med=("c", "median"),
            mad=("dev", "median"),
            n_outliers=("out", "sum"),
        ).reset_index()
        out["n_parts"] = out["n_parts"].astype("int64")
        out["n_outliers"] = out["n_outliers"].astype("int64")
        out["median_price"] = _round_away(out["med"].to_numpy() / 100.0, 3)
        out["mad"] = _round_away(out["mad"].to_numpy() / 100.0, 4)
        return out[["p_brand", "n_parts", "median_price", "mad", "n_outliers"]]

    return bucketed_map_groups(
        _read(sf_dir, "part", columns=["p_brand", "p_retailprice"]),
        keys=["p_brand"],
        fn=mad_fn,
    )


# ---------------------------------------------------------------------------
# TPC-H Q1 analog — the canonical pricing-summary scan-aggregate: one pass
# over the fact table, eight aggregates per (returnflag, linestatus). All
# sums ride the exchange as exact integers under the family contract:
# quantity is integral, price/discount/tax are 2-decimal, so disc_price
# (cents·(100−d)) and charge (cents·(100−d)·(100+t)) are exact in 10⁻⁴ /
# 10⁻⁶ dollar units; every float is derived once at the O(#groups) edge by
# the expression the oracle spells term-for-term. int64 bounds the charge
# sum at ~10⁷ high-value rows per group per task-partial — past that the
# group sums (6 ints per group) would move to the same Python-int edge the
# moments family documents; the per-row hot path never needs it.
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str, cutoff: str = "2000-09-02"):
    def partial_cols(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(pd.Timestamp(cutoff)))
        )
        q = _int_exact(
            batch["l_quantity"].to_numpy(zero_copy_only=False), "l_quantity"
        )
        cents = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        d100 = np.round(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t100 = np.round(
            batch["l_tax"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dp = cents * (100 - d100)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(q, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "d100": pa.array(d100, pa.int64()),
                "dp": pa.array(dp, pa.int64()),
                "ch": pa.array(dp * (100 + t100), pa.int64()),
            }
        )

    sums = bucketed_sum_count(
        _read(
            sf_dir, "lineitem",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
        ).map_batches(partial_cols, batch_format="pyarrow"),
        keys=["l_returnflag", "l_linestatus"],
        sums={"qty": "sq", "cents": "sp", "d100": "sd", "dp": "sdp", "ch": "sc"},
        count_as="count_order",
        input_bytes=_tbytes(sf_dir, "lineitem"),
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["count_order"].to_numpy(dtype=np.float64)
        sp = batch["sp"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": batch["sq"].astype("int64"),
                "sum_base_price": _round_away(sp / 100.0, 2),
                "sum_disc_price": _round_away(
                    batch["sdp"].to_numpy(dtype=np.float64) / 10000.0, 2
                ),
                "sum_charge": _round_away(
                    batch["sc"].to_numpy(dtype=np.float64) / 1000000.0, 2
                ),
                "avg_qty": _round_away(
                    batch["sq"].to_numpy(dtype=np.float64) / n, 6
                ),
                "avg_price": _round_away(sp / 100.0 / n, 6),
                "avg_disc": _round_away(
                    batch["sd"].to_numpy(dtype=np.float64) / 100.0 / n, 6
                ),
                "count_order": batch["count_order"].astype("int64"),
            }
        )

    return sums.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# TPC-H Q3 analog — shipping priority: top unshipped-revenue orders for one
# market segment. Aggregate-FIRST plan: lineitem shrinks to per-order
# revenue before any join (the 100-TB rule — never widen a fact before its
# reduction), the segment filter arrives as a bucketed LEFT SEMI join
# (customer contributes existence, not columns), and the top-10 is the
# local-topk tournament, never a global sort.
# ---------------------------------------------------------------------------


def q_shipping_priority(
    sf_dir: str, segment: str = "BUILDING", date: str = "1998-06-01", k: int = 10
):
    cut = pd.Timestamp(date)

    def rev_cols(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], pa.scalar(cut)))
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev": pc.multiply(
                    batch["l_extendedprice"],
                    pc.subtract(1.0, batch["l_discount"]),
                ),
            }
        )

    per_order = bucketed_sum_count(
        _read(
            sf_dir, "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ).map_batches(rev_cols, batch_format="pyarrow"),
        keys=["l_orderkey"],
        sums={"rev": "revenue"},
        input_bytes=_tbytes(sf_dir, "lineitem"),
    ).map_batches(partial(_round_col, col="revenue", decimals=4),
                  batch_format="pyarrow")

    def seg_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(batch["c_mktsegment"], segment)
        ).select(["c_custkey"])

    def date_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["o_orderdate"], pa.scalar(cut)))

    orders = bucketed_hash_join(
        _read(
            sf_dir, "orders",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        ).map_batches(date_filter, batch_format="pyarrow"),
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(seg_filter, batch_format="pyarrow"),
        left_on=["o_custkey"],
        right_on=["c_custkey"],
        how="left_semi",
        input_bytes=_tbytes(sf_dir, "orders") + _tbytes(sf_dir, "customer"),
    )
    j = bucketed_hash_join(
        per_order, orders, left_on=["l_orderkey"], right_on=["o_orderkey"],
        input_bytes=_tbytes(sf_dir, "lineitem") + _tbytes(sf_dir, "orders"),
    )
    return local_topk(
        j.select_columns(["l_orderkey", "revenue", "o_orderdate",
                          "o_orderpriority"]),
        by=["revenue", "o_orderdate", "l_orderkey"],
        descending=[True, False, False],
        k=k,
    )


# ---------------------------------------------------------------------------
# decorrelated subquery — "rows above their group's average", the textbook
# correlated scalar subquery rewritten the distributed way: because the
# bucketed exchange co-locates each brand, the grouped sum/count AND the
# per-row comparison happen inside ONE bucket visit — no join-back pass.
# The predicate is evaluated in exact integers (cents·n > Σcents), so a
# part sitting exactly ON the average is excluded identically on both
# engines — a float avg compare could flip it by an ulp.
# ---------------------------------------------------------------------------


def q_parts_above_brand_avg(sf_dir: str):
    def fn(bucket: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            bucket["p_retailprice"].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        g = pd.Series(cents).groupby(
            bucket["p_brand"].to_numpy(), sort=False
        )
        s = g.transform("sum").to_numpy()
        n = g.transform("size").to_numpy()
        keep = cents * n > s
        out = bucket.loc[keep, ["p_partkey", "p_brand", "p_retailprice"]]
        out = out.reset_index(drop=True)
        out["brand_avg"] = _round_away(s[keep] / 100.0 / n[keep], 6)
        return out

    return bucketed_map_groups(
        _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_retailprice"]),
        keys=["p_brand"],
        fn=fn,
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 analog — the canonical multi-way star-join: revenue by nation
# where the ordering customer and the line's supplier share that nation,
# restricted to one region. Join strategy is the 100-TB playbook: the THREE
# dimension tables (region→nation filter, supplier→nationkey) ship as
# broadcasts — supplier is catalog-sized, bounded, never fact-sized — while
# the two FACT tables meet in bucketed exchanges on their natural keys
# (orders⋈customer on custkey, lineitem⋈that on orderkey). The same-nation
# predicate is applied the moment both nationkeys coexist, shrinking the
# stream 25× before the final aggregate; revenue sums ride as doubles whose
# true values sit on the 4-decimal grid (2-dec price × 2-dec discount), so
# the 4dp edge rounding has no boundary ties (cf. order_revenue).
# ---------------------------------------------------------------------------


def q_regional_supplier_volume(sf_dir: str, region: str = "ASIA"):
    import pyarrow.parquet as pq

    nations = pq.read_table(_t(sf_dir, "nation")).to_pandas()
    regions = pq.read_table(_t(sf_dir, "region")).to_pandas()
    rkey = regions.loc[regions["r_name"] == region, "r_regionkey"]
    in_region = nations[nations["n_regionkey"].isin(rkey)][
        ["n_nationkey", "n_name"]
    ]
    supplier = pq.read_table(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    # prune suppliers to the region BEFORE broadcast: the inner join then
    # drops out-of-region lineitems at the first map stage
    supplier = supplier[supplier["s_nationkey"].isin(in_region["n_nationkey"])]

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_suppkey": batch["l_suppkey"],
                "rev": rev,
            }
        )

    li = broadcast_join(
        _read(
            sf_dir, "lineitem",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ).map_batches(revenue, batch_format="pyarrow"),
        supplier,
        left_on="l_suppkey",
        right_on="s_suppkey",
    )

    oc = bucketed_hash_join(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        left_on=["o_custkey"],
        right_on=["c_custkey"],
        input_bytes=_tbytes(sf_dir, "orders") + _tbytes(sf_dir, "customer"),
    )
    j = bucketed_hash_join(
        li, oc, left_on=["l_orderkey"], right_on=["o_orderkey"],
        input_bytes=_tbytes(sf_dir, "lineitem") + _tbytes(sf_dir, "orders"),
    )

    name_of = dict(zip(in_region["n_nationkey"], in_region["n_name"]))

    def same_nation(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["s_nationkey"].to_numpy() == batch["c_nationkey"].to_numpy()
        out = batch.loc[keep, ["s_nationkey", "rev"]]
        return pd.DataFrame(
            {"n_name": out["s_nationkey"].map(name_of), "rev": out["rev"]}
        )

    return bucketed_sum_count(
        j.map_batches(same_nation, batch_format="pandas"),
        keys=["n_name"],
        sums={"rev": "revenue"},
        count_as="n_items",
        input_bytes=_tbytes(sf_dir, "nation"),  # O(#nations) group keys
    ).map_batches(
        partial(_round_col, col="revenue", decimals=4), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# retention cohorts — the classic growth-analytics matrix: users grouped by
# first-activity week, counted at each later active week offset. One
# user-co-located exchange derives (cohort, offset) membership rows, one
# integer-count aggregate produces the matrix; week truncation is Arrow
# floor_temporal(week) == DuckDB date_trunc('week') (both Monday-start) and
# the offset is exact integer day arithmetic.
# ---------------------------------------------------------------------------


def q_user_retention_cohorts(sf_dir: str):
    def to_weeks(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "w": pc.floor_temporal(batch["ts"], unit="week"),
            }
        )
        return t.group_by(["user_id", "w"]).aggregate([])  # map-side shrink

    def cohort_fn(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            return pd.DataFrame({"cohort_week": pd.Series([], dtype="datetime64[us]"),
                                 "week_offset": pd.Series([], dtype="int64")})
        # the map-side distinct is per-batch; a user's weeks can span
        # batches, so re-dedup inside the co-located bucket
        b = bucket.drop_duplicates(["user_id", "w"])
        w0 = b.groupby("user_id", sort=False)["w"].transform("min")
        off = ((b["w"].to_numpy() - w0.to_numpy())
               .astype("timedelta64[D]").astype(np.int64) // 7)
        return pd.DataFrame(
            {"cohort_week": w0.to_numpy(), "week_offset": off.astype("int64")}
        )

    uw = _read(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
        to_weeks, batch_format="pyarrow"
    )
    rows = bucketed_map_groups(
        uw, ["user_id"], cohort_fn, input_bytes=_tbytes(sf_dir, "events")
    )
    return bucketed_sum_count(
        rows,
        ["cohort_week", "week_offset"],
        sums={},
        count_as="n_users",
        input_bytes=_tbytes(sf_dir, "events"),
    )


# ---------------------------------------------------------------------------
# FULL OUTER reconciliation — two independent daily aggregates stitched so
# days present on either side survive (a LEFT join would silently drop
# signup-only days; growth dashboards reconcile exactly this way). First
# registry use of bucketed_hash_join's outer mode: unmatched rows of BOTH
# sides surface in their key's bucket, so the same single exchange covers
# all three match states.
# ---------------------------------------------------------------------------


def q_daily_purchase_vs_signup(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["event_type", "ts"])

    def day_counts(which: str, key: str, n: str):
        def f(batch: pa.Table) -> pa.Table:
            b = batch.filter(pc.equal(batch["event_type"], which))
            return pa.table({key: pc.floor_temporal(b["ts"], unit="day")})

        return bucketed_sum_count(
            ev.map_batches(f, batch_format="pyarrow"),
            keys=[key], sums={}, count_as=n,
            input_bytes=_tbytes(sf_dir, "events"),
        )

    p = day_counts("purchase", "pday", "n_purchases")
    s = day_counts("signup", "sday", "n_signups")
    j = bucketed_hash_join(
        p, s, left_on=["pday"], right_on=["sday"], how="outer",
        input_bytes=2 * _tbytes(sf_dir, "events"),
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        day = batch["pday"].fillna(batch["sday"])
        return pd.DataFrame(
            {
                "day": day,
                "n_purchases": batch["n_purchases"].fillna(0).astype("int64"),
                "n_signups": batch["n_signups"].fillna(0).astype("int64"),
            }
        )

    return j.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# skyline / Pareto frontier — "cheapest part at every size". The classic
# distributed-skyline decomposition: dominance is transitive, so a point
# dominated INSIDE a block is dominated globally and every block can prune
# to its local skyline independently (no shuffle); the union of local
# skylines — O(distinct-prices-on-the-frontier) per block, ~O(log n) points
# in expectation on non-adversarial data — then takes one final single-task
# pass. Degenerate anti-chain inputs (everything on the frontier) are the
# documented premise break, as for any skyline algorithm.
# ---------------------------------------------------------------------------


def _pareto_block(df: pd.DataFrame) -> pd.DataFrame:
    """2D skyline of one block: minimize p_retailprice, maximize p_size.
    A point survives iff its size is the max within its price group AND
    strictly above the best size at any cheaper price (ties on BOTH axes
    are mutual non-dominance — duplicates of a frontier point all stay,
    matching the NOT EXISTS oracle's strict-in-one clause)."""
    if not len(df):
        return df
    gmax = df.groupby("p_retailprice", sort=True)["p_size"].max()
    before = gmax.cummax().shift(1)  # best size strictly cheaper
    at = df["p_retailprice"].map(gmax)
    mb = df["p_retailprice"].map(before)
    keep = df["p_size"].eq(at) & (mb.isna() | (df["p_size"] > mb))
    return df[keep.to_numpy()]


def q_part_skyline(sf_dir: str):
    """Pareto-undominated parts under (price ↓, size ↑)."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])
    pruned = ds.map_batches(_pareto_block, batch_format="pandas")
    # the candidate set is the union of per-block frontiers — small by the
    # premise above — so the global pass is a single task over few rows
    return pruned.repartition(1).map_batches(
        _pareto_block, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences — the "what do
# users do next" model table. One bucketed exchange co-locates each user's
# events; consecutive-pair extraction is a vectorized shift inside the
# bucket; the (from, to) count table is O(#event-types²) rows, so the
# probability normalization runs in one trivial final task.
# ---------------------------------------------------------------------------


def q_event_type_transitions(sf_dir: str):
    ev = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "from_type": pd.Series([], dtype=object),
            "to_type": pd.Series([], dtype=object),
            "n": pd.Series([], dtype="int64"),
        })
        if not len(b):
            return empty
        b = b.sort_values(["user_id", "ts", "event_id"])
        uid = b["user_id"].to_numpy()
        et = b["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]  # consecutive rows of the SAME user
        if not same.any():
            return empty
        pairs = pd.DataFrame(
            {"from_type": et[:-1][same], "to_type": et[1:][same]}
        )
        return (pairs.groupby(["from_type", "to_type"], sort=False)
                .size().reset_index(name="n"))

    t = bucketed_map_groups(
        ev, keys=["user_id"], fn=per_bucket,
        input_bytes=_tbytes(sf_dir, "events"),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["from_type", "to_type"], sort=False)["n"]
             .sum().reset_index())
        tot = g.groupby("from_type")["n"].transform("sum")
        g["n"] = g["n"].astype("int64")
        g["prob"] = _round_away(g["n"].to_numpy() / tot.to_numpy(), 6)
        return g

    # O(#types² × #buckets) partial rows → one tiny normalization task
    return t.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None
    )


# ---------------------------------------------------------------------------
# triangle counting + global clustering coefficient over the co-purchase
# graph (nodes = parts, edges = the shared basket-pair table). Wedge
# enumeration uses DEGREE-ORDERED orientation — each edge points from its
# lower-(degree, id) endpoint to the higher — which bounds total wedge
# fan-out by O(m^1.5) regardless of skew (the standard node-iterator++
# bound); each triangle is enumerated exactly once, at its minimum-order
# apex. Closure testing is a bucketed semi-join of wedges against the
# oriented edge list: edges-only exchanges, nothing node-quadratic.
# ---------------------------------------------------------------------------


def q_copurchase_triangles(sf_dir: str):
    from ..functions.pairs import within_group_pair_indices

    edges = (_basket_pair_counts(sf_dir)
             .map_batches(lambda b: b[["part_a", "part_b"]],
                          batch_format="pandas")
             .materialize())
    ebytes = edges.size_bytes() or _tbytes(sf_dir, "lineitem")
    n_edges = edges.count()

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": np.concatenate(
            [b["part_a"].to_numpy(), b["part_b"].to_numpy()])})

    deg = bucketed_sum_count(
        edges.map_batches(endpoints, batch_format="pandas"),
        keys=["v"], sums={}, count_as="deg", input_bytes=ebytes,
    ).materialize()

    # unoriented wedge count = Σ deg·(deg−1)/2 — one scalar off the degree
    # table, no enumeration
    n_wedges = int(deg.map_batches(
        lambda b: pd.DataFrame(
            {"w": b["deg"].to_numpy() * (b["deg"].to_numpy() - 1) // 2}),
        batch_format="pandas",
    ).sum("w") or 0)

    dega = deg.map_batches(
        lambda b: b.rename(columns={"v": "va", "deg": "deg_a"}),
        batch_format="pandas")
    degb = deg.map_batches(
        lambda b: b.rename(columns={"v": "vb", "deg": "deg_b"}),
        batch_format="pandas")
    j = bucketed_hash_join(edges, dega, left_on=["part_a"],
                           right_on=["va"], input_bytes=2 * ebytes)
    j = bucketed_hash_join(j, degb, left_on=["part_b"],
                           right_on=["vb"], input_bytes=2 * ebytes)

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        a = b["part_a"].to_numpy()
        c = b["part_b"].to_numpy()
        da = b["deg_a"].to_numpy()
        dc = b["deg_b"].to_numpy()
        fwd = (da < dc) | ((da == dc) & (a < c))
        return pd.DataFrame({
            "src": np.where(fwd, a, c),
            "dst": np.where(fwd, c, a),
            "ddst": np.where(fwd, dc, da),
        })

    oe = j.map_batches(orient, batch_format="pandas").materialize()

    def wedges_of(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"v": pd.Series([], dtype="int64"),
                              "w": pd.Series([], dtype="int64")})
        if not len(b):
            return empty
        codes, _ = pd.factorize(b["src"].to_numpy(), sort=False)
        # sort each out-neighborhood by (deg, id) so pair (i<j) is already
        # oriented the same way the closing edge is
        order = np.lexsort(
            (b["dst"].to_numpy(), b["ddst"].to_numpy(), codes))
        dst = b["dst"].to_numpy()[order]
        i, k = within_group_pair_indices(codes[order])
        if not len(i):
            return empty
        return pd.DataFrame({"v": dst[i], "w": dst[k]})

    wedges = bucketed_map_groups(
        oe, keys=["src"], fn=wedges_of,
        input_bytes=oe.size_bytes() or ebytes, allow_local=False,
    )
    closed = bucketed_hash_join(
        wedges, oe.map_batches(lambda b: b[["src", "dst"]],
                               batch_format="pandas"),
        left_on=["v", "w"], right_on=["src", "dst"], how="left_semi",
        input_bytes=2 * (oe.size_bytes() or ebytes),
    )
    n_tri = closed.count()
    cc = 0.0 if n_wedges == 0 else float(
        _round_away(3.0 * n_tri / n_wedges, 6))
    return pd.DataFrame({
        "n_edges": pd.Series([n_edges], dtype="int64"),
        "n_wedges": pd.Series([n_wedges], dtype="int64"),
        "n_triangles": pd.Series([n_tri], dtype="int64"),
        "global_clustering": [cc],
    })


# ---------------------------------------------------------------------------
# table profiling — the "describe this table" operator every data-quality
# sweep starts with. Two legs: (1) per-block partials (rows / nulls /
# min / max) — O(blocks × columns) tiny rows combined in one final task,
# values carried as dtype-tagged strings (shortest-roundtrip repr is
# injective per dtype, re-parsed for the cross-block compare); (2) an exact
# per-column distinct count as ONE bucketed exchange over (column, value)
# pairs with map-side dedup. At 100 TB leg 2 swaps to the HLL sketch
# (stages/sketches.py) — the exact form is the oracle anchor.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _profile_fmt(s: pd.Series) -> pd.Series:
    """DuckDB CAST(x AS VARCHAR)-compatible string form (int/str exact;
    float shortest-roundtrip; timestamp 'YYYY-MM-DD HH:MM:SS[.ffffff]')."""
    return s.dropna().astype(str)


def q_table_profile(sf_dir: str):
    ds = _read(sf_dir, "events", columns=_PROFILE_COLS)
    kinds = {c: str(t) for c, t in zip(
        ds.schema().names, ds.schema().types)}

    def _fmt(v, kind: str) -> str:
        # a null-bearing int column surfaces as float64 in pandas — DuckDB
        # prints its min/max as an integer, so cast back before str()
        if "int" in kind:
            return str(int(v))
        return str(v)

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in _PROFILE_COLS:
            nn = b[c].dropna()
            rows.append({
                "col_name": c,
                "n_rows": len(b[c]),
                "n_nulls": int(b[c].isna().sum()),
                "min_s": _fmt(nn.min(), kinds[c]) if len(nn) else None,
                "max_s": _fmt(nn.max(), kinds[c]) if len(nn) else None,
            })
        return pd.DataFrame(rows)

    def _parse(v: str, kind: str):
        if v is None:
            return None
        if "int" in kind:
            return int(v)
        if "double" in kind or "float" in kind:
            return float(v)
        if "timestamp" in kind:
            return pd.Timestamp(v)
        return v

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for c, g in df.groupby("col_name", sort=True):
            mins = [_parse(v, kinds[c]) for v in g["min_s"] if v is not None]
            maxs = [_parse(v, kinds[c]) for v in g["max_s"] if v is not None]
            out.append({
                "col_name": c,
                "n_rows": int(g["n_rows"].sum()),
                "n_nulls": int(g["n_nulls"].sum()),
                "min_val": str(min(mins)) if mins else None,
                "max_val": str(max(maxs)) if maxs else None,
            })
        o = pd.DataFrame(out)
        o["n_rows"] = o["n_rows"].astype("int64")
        o["n_nulls"] = o["n_nulls"].astype("int64")
        return o

    leg1 = (ds.map_batches(partials, batch_format="pandas")
            .repartition(1)
            .map_batches(combine, batch_format="pandas", batch_size=None))

    def explode_vals(b: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for c in _PROFILE_COLS:
            sv = _profile_fmt(b[c]).drop_duplicates()  # map-side dedup
            parts.append(pd.DataFrame({"col_name": c, "sval": sv}))
        return pd.concat(parts, ignore_index=True)

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col_name", "sval"])
        out = d.groupby("col_name", sort=False).size().reset_index(
            name="n_distinct")
        out["n_distinct"] = out["n_distinct"].astype("int64")
        return out

    leg2 = (bucketed_map_groups(
        ds.map_batches(explode_vals, batch_format="pandas"),
        keys=["col_name", "sval"], fn=bucket_distinct,
        input_bytes=2 * _tbytes(sf_dir, "events"))
        .repartition(1)
        .map_batches(
            lambda df: (df.groupby("col_name", sort=True)["n_distinct"]
                        .sum().astype("int64").reset_index()),
            batch_format="pandas", batch_size=None))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        # an all-null column has no (col, value) pairs at all — LEFT join
        # hole, but count(DISTINCT) of an all-null column is 0, not absent
        b["n_distinct"] = b["n_distinct"].fillna(0).astype("int64")
        return b[["col_name", "n_rows", "n_nulls", "n_distinct",
                  "min_val", "max_val"]].sort_values("col_name")

    return bucketed_hash_join(
        leg1, leg2.map_batches(
            lambda b: b.rename(columns={"col_name": "col2"}),
            batch_format="pandas"),
        left_on=["col_name"], right_on=["col2"], how="left", input_bytes=1,
    ).map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# rolling 7-day DISTINCT users — the windowed-distinct class (rolling COUNT
# is a prefix trick; rolling DISTINCT is not, because distinct doesn't
# subtract). Plan: exact (day, user) dedup, then REPLICATE each active-day
# row to the ≤7 trailing window-days it serves — the replication factor is
# the window/step ratio, the honest cost of exact windowed distinct at any
# scale — then a second bucketed distinct-count. Day spine = observed days
# only (tiny, broadcast).
# ---------------------------------------------------------------------------


def q_rolling_distinct_users(sf_dir: str, window_days: int = 7):
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    ebytes = _tbytes(sf_dir, "events")

    def to_day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.floor_temporal(batch["ts"], unit="day"),
            "user_id": batch["user_id"],
        })

    def dedup(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["day", "user_id"])

    du = bucketed_map_groups(
        ev.map_batches(to_day, batch_format="pyarrow"),
        keys=["day", "user_id"], fn=dedup, pre=dedup, input_bytes=ebytes,
    ).materialize()

    # the observed-day spine is O(#days) — broadcast it as a filter set
    days = set(
        pd.concat([b["day"] for b in
                   du.map_batches(lambda b: b[["day"]].drop_duplicates(),
                                  batch_format="pandas")
                   .iter_batches(batch_format="pandas")], ignore_index=True)
        .drop_duplicates()
    )

    def replicate(b: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for k in range(window_days):
            w = b["day"] + pd.Timedelta(days=k)
            m = w.isin(days).to_numpy()  # don't serve never-observed days
            if m.any():
                parts.append(pd.DataFrame(
                    {"day": w[m], "user_id": b["user_id"][m]}))
        if not parts:
            return pd.DataFrame({
                "day": pd.Series([], dtype="datetime64[us]"),
                "user_id": pd.Series([], dtype="int64"),
            })
        return pd.concat(parts, ignore_index=True)

    def count_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["day", "user_id"])
        out = d.groupby("day", sort=False).size().reset_index(
            name="n_users_7d")
        out["n_users_7d"] = out["n_users_7d"].astype("int64")
        return out

    partial = bucketed_map_groups(
        du.map_batches(replicate, batch_format="pandas"),
        keys=["day", "user_id"], fn=count_in_bucket, pre=dedup,
        input_bytes=window_days * (du.size_bytes() or ebytes),
    )
    return bucketed_sum_count(
        partial, keys=["day"], sums={"n_users_7d": "n_users_7d"},
        input_bytes=1,
    )


# ---------------------------------------------------------------------------
# foreign-key integrity audit — the referential-quality operator every
# ingest pipeline runs before trusting a join: per relationship, how many
# child rows point at a missing parent and how many distinct keys are
# missing. Child keys pre-aggregate to (key, cnt) map-side, the orphan set
# is a bucketed LEFT ANTI join of key tables (never row tables), and the
# final fold is O(#relationships).
# ---------------------------------------------------------------------------

_FK_RELS = [
    # (name, child table, child key, parent table, parent key)
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
]


def q_fk_integrity(sf_dir: str):
    rows = []
    for name, child, ckey, parent, pkey in _FK_RELS:
        ckeys = bucketed_sum_count(
            _read(sf_dir, child, columns=[ckey]),
            keys=[ckey], sums={}, count_as="cnt",
            input_bytes=_tbytes(sf_dir, child),
        )
        orphans = bucketed_hash_join(
            ckeys,
            _read(sf_dir, parent, columns=[pkey]),
            left_on=[ckey], right_on=[pkey], how="left_anti",
            input_bytes=_tbytes(sf_dir, child) + _tbytes(sf_dir, parent),
        ).materialize()  # tiny: one row per MISSING key
        n_orphans = int(orphans.sum("cnt") or 0)
        rows.append({
            "relationship": name,
            "n_child_rows": table_rows(_t(sf_dir, child)),
            "n_orphans": n_orphans,
            "n_missing_keys": orphans.count(),
        })
    out = pd.DataFrame(rows)
    for c in ("n_child_rows", "n_orphans", "n_missing_keys"):
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# gaps-and-islands (W8): longest run of CONSECUTIVE active days per user —
# the classic streak operator SQL solves with `day - row_number()` island
# ids. Here the bucketed exchange co-locates each user's distinct days and
# the island walk is one vectorized diff+cumsum per bucket; integer day
# numbers end-to-end, so the result is exact and hash-stable.
# ---------------------------------------------------------------------------


def q_activity_streaks(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def to_day(b: pa.Table) -> pa.Table:
        # timestamp[us] → integer days since epoch (ts are post-1970, so
        # truncating division == floor); keeps the exchange 16 bytes/row
        return pa.table({
            "user_id": b["user_id"],
            "dayno": pc.divide(pc.cast(b["ts"], pa.int64()), 86_400_000_000),
        })

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["user_id", "dayno"])

    def streaks(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop_duplicates(["user_id", "dayno"]).sort_values(
            ["user_id", "dayno"]
        )
        if not len(b):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "longest_streak": pd.Series([], dtype="int64"),
                "n_active_days": pd.Series([], dtype="int64"),
            })
        u = b["user_id"].to_numpy()
        d = b["dayno"].to_numpy()
        new_run = np.ones(len(b), dtype=bool)
        new_run[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        runs = pd.DataFrame({"user_id": u, "run": np.cumsum(new_run)})
        lens = runs.groupby(["user_id", "run"], sort=False).size().reset_index(
            name="len"
        )
        g = lens.groupby("user_id", sort=False)["len"]
        return pd.DataFrame({
            "longest_streak": g.max().astype("int64"),
            "n_active_days": g.sum().astype("int64"),
        }).reset_index()

    return bucketed_map_groups(
        ev.map_batches(to_day, batch_format="pyarrow"),
        keys=["user_id"], fn=streaks, pre=pre,
        input_bytes=_tbytes(sf_dir, "events"),
    )


# ---------------------------------------------------------------------------
# BFS min-hop labeling (I3, iterative frontier expansion): hops from a seed
# part over the co-purchase graph — the third iterative-algorithm shape
# after PageRank (fixed-point value iteration) and connected components
# (pointer jumping): a FRONTIER loop whose per-round work is one bucketed
# semi-join (edges whose src is in the frontier), one bucketed distinct
# (candidate dedup) and one bucketed anti-join (drop already-visited) —
# nothing corpus-sized ever collects on the driver, and the loop's K rounds
# are the algorithm's own depth bound, not a data-size knob. The oracle is
# a recursive CTE over the identical edge set.
# ---------------------------------------------------------------------------


def q_part_hop_distance(sf_dir: str, max_hops: int = 3):
    pairs = _basket_pair_counts(sf_dir).select_columns(
        ["part_a", "part_b"]
    ).materialize()
    pbytes = pairs.size_bytes() or _tbytes(sf_dir, "lineitem")

    def sym(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "src": np.concatenate([b["part_a"].to_numpy(), b["part_b"].to_numpy()]),
            "dst": np.concatenate([b["part_b"].to_numpy(), b["part_a"].to_numpy()]),
        })

    edges = pairs.map_batches(sym, batch_format="pandas").materialize()
    seed = _read(sf_dir, "lineitem", columns=["l_partkey"]).min("l_partkey")
    if seed is None:  # empty graph: the seedless result is zero rows
        return pa.table({"node": pa.array([], pa.int64()),
                         "hops": pa.array([], pa.int64())})
    seed = int(seed)

    def dedup_nodes(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["node"])

    visited = rd.from_arrow(pa.table({
        "node": pa.array([seed], pa.int64()),
        "hops": pa.array([0], pa.int64()),
    }))
    frontier = rd.from_arrow(pa.table({"fnode": pa.array([seed], pa.int64())}))
    for h in range(1, max_hops + 1):
        # edges whose src is on the frontier; the frontier rides the same
        # bucketed exchange as the edge table (at scale it IS node-sized,
        # so no broadcast/collect shortcut)
        touched = bucketed_hash_join(
            edges, frontier, left_on=["src"], right_on=["fnode"],
            how="left_semi", input_bytes=pbytes,
        )
        cand = bucketed_map_groups(
            touched.map_batches(
                lambda b: pd.DataFrame({"node": b["dst"]}).drop_duplicates(),
                batch_format="pandas",
            ),
            keys=["node"], fn=dedup_nodes, pre=dedup_nodes, input_bytes=pbytes,
        )
        new = bucketed_hash_join(
            cand,
            visited.map_batches(
                lambda b: pd.DataFrame({"vnode": b["node"]}),
                batch_format="pandas",
            ),
            left_on=["node"], right_on=["vnode"], how="left_anti",
            input_bytes=pbytes,
        ).materialize()
        if new.count() == 0:
            break
        reached = new.map_batches(
            lambda b, hh=h: b.assign(hops=np.int64(hh)), batch_format="pandas"
        )
        visited = visited.union(reached).materialize()
        frontier = new.map_batches(
            lambda b: pd.DataFrame({"fnode": b["node"]}), batch_format="pandas"
        )
    return visited


# shared quality-cut SQL: the F5-length score table, its rank frame, and
# the truncating-index p75 threshold — used by the quality_filter oracle
# here and the composed curation oracle (pipelines/curate.py)
QUALITY_SQL_CTES = """
    q AS (
        SELECT doc_id,
               round(0.3 * (CASE
                   WHEN n_chars < 50 THEN n_chars / 50.0 * 50.0
                   WHEN n_chars <= 500 THEN 50.0 + (n_chars - 50.0) / 450.0 * 50.0
                   ELSE 100.0 - least(50.0, (n_chars - 500.0) / 100.0)
               END), 2) AS quality_score
        FROM documents
    ), r AS (
        SELECT quality_score,
               row_number() OVER (ORDER BY quality_score) AS rn,
               count(*) OVER () AS n
        FROM q
    )
"""
QUALITY_SQL_THRESHOLD = """(
    SELECT quality_score FROM r
    WHERE rn - 1 = least(CAST(floor(n * 0.75) AS BIGINT), n - 1)
)"""

def q_weighted_median_price(sf_dir: str):
    """Grouped WEIGHTED median — per supplier, the lower weighted median of
    l_extendedprice weighted by l_quantity (the smallest price whose
    cumulative quantity reaches half the supplier's total). The plain
    grouped median (`median_price_per_brand`) needs rows; this needs
    (value, weight) pairs — so the map-side partial collapses to one row
    per (supplier, price) and the exchange moves distinct pairs, not line
    items. Per bucket everything runs on int codes: factorize → lexsort →
    segmented cumsum → first row per group with 2·cum ≥ total.
    Quantities are integer-valued, so the ≥ compare is exact float64."""

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["l_suppkey", "l_extendedprice"], sort=False)
        return g.agg(wt=("l_quantity", "sum")).reset_index()

    def wmed(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "l_suppkey": pd.Series([], dtype="int64"),
            "wmedian_price": pd.Series([], dtype="float64"),
        })
        if not len(bucket):
            return empty
        # re-collapse (pre ran per input batch, keys can repeat across them)
        b = bucket.groupby(["l_suppkey", "l_extendedprice"], sort=False) \
            .agg(wt=("wt", "sum")).reset_index()
        scode, suniq = pd.factorize(b["l_suppkey"], sort=False)
        x = b["l_extendedprice"].to_numpy()
        wt = b["wt"].to_numpy()
        order = np.lexsort((x, scode))
        scode, x, wt = scode[order], x[order], wt[order]
        new_key = np.ones(len(scode), dtype=bool)
        new_key[1:] = scode[1:] != scode[:-1]
        cum = np.cumsum(wt)
        base = np.where(new_key, cum - wt, 0.0)
        seg_base = np.maximum.accumulate(base * new_key)  # cum before group
        seg_cum = cum - seg_base
        # group totals: last row of each group, broadcast back
        last = np.zeros(len(scode), dtype=bool)
        last[:-1] = new_key[1:]
        last[-1] = True
        tot_per_group = seg_cum[last]  # one per group, in group order
        gidx = np.cumsum(new_key) - 1
        tot = tot_per_group[gidx]
        hit = 2.0 * seg_cum >= tot
        # first hit per group: hits are contiguous-by-group and x-sorted
        first = hit.copy()
        first[1:] &= ~(hit[:-1] & (gidx[1:] == gidx[:-1]))
        return pd.DataFrame({
            "l_suppkey": np.asarray(suniq)[scode[first]],
            "wmedian_price": x[first],
        })

    return bucketed_map_groups(
        _read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_extendedprice", "l_quantity"]),
        keys=["l_suppkey"], fn=wmed, pre=pre,
        input_bytes=_tbytes(sf_dir, "lineitem"),
    )


def q_priority_coverage(sf_dir: str):
    """Relational DIVISION (set-containment): customers whose orders cover
    EVERY order priority in use — dividend (custkey, priority), divisor the
    distinct-priority domain. Division never enumerates the quotient's
    complement: the divisor is a distributed distinct with a bounded
    collect (the priority domain, ≤ a handful of values — same driver
    class as domain mixing's O(#sources)), and the dividend runs as ONE
    bucketed exchange of map-side-deduped (custkey, priority) pairs with a
    per-customer distinct-count == |divisor| finish."""
    ob = _tbytes(sf_dir, "orders")

    k = int(
        _read(sf_dir, "orders", columns=["o_orderpriority"])
        .map_batches(
            lambda b: pd.DataFrame(
                {"o_orderpriority": b["o_orderpriority"].unique()}),
            batch_format="pandas")
        .to_pandas()["o_orderpriority"].nunique()
    )

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return b[["o_custkey", "o_orderpriority"]].drop_duplicates()

    def cover(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket.drop_duplicates()  # exact: the bucket key IS the customer
        n = d.groupby("o_custkey", sort=False).size()
        full = n[n == k]
        return pd.DataFrame({
            "o_custkey": full.index.to_numpy(),
            "n_matched": full.to_numpy().astype("int64"),
        })

    return bucketed_map_groups(
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]),
        keys=["o_custkey"], fn=cover, pre=pre, input_bytes=ob // 2,
    )


def _fk_oracle_block(name, child, ckey, parent, pkey):
    return f"""
        SELECT '{name}' AS relationship,
               CAST(count(*) AS BIGINT) AS n_child_rows,
               CAST(coalesce(sum(CASE WHEN c.{ckey} IS NOT NULL
                    AND p.{pkey} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_orphans,
               CAST(count(DISTINCT CASE WHEN p.{pkey} IS NULL
                    THEN c.{ckey} END) AS BIGINT) AS n_missing_keys
        FROM {child} c LEFT JOIN {parent} p ON c.{ckey} = p.{pkey}
    """


ORACLE: dict[str, str] = {
    "weighted_median_price": """
        WITH w AS (
            SELECT l_suppkey, l_extendedprice AS x, SUM(l_quantity) AS wt
            FROM lineitem GROUP BY 1, 2
        ), c AS (
            SELECT l_suppkey, x,
                   SUM(wt) OVER (PARTITION BY l_suppkey ORDER BY x) AS cw,
                   SUM(wt) OVER (PARTITION BY l_suppkey) AS tot
            FROM w
        )
        SELECT l_suppkey, min(x) AS wmedian_price
        FROM c WHERE 2 * cw >= tot GROUP BY 1
    """,
    "priority_coverage": """
        WITH pr AS (SELECT DISTINCT o_orderpriority FROM orders),
        co AS (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_matched
        FROM co GROUP BY 1
        HAVING count(*) = (SELECT count(*) FROM pr)
    """,
    "activity_streaks": """
        WITH du AS (
            SELECT DISTINCT user_id,
                   date_diff('day', TIMESTAMP '1970-01-01',
                             date_trunc('day', ts)) AS dayno
            FROM events
        ), isl AS (
            SELECT user_id, dayno,
                   dayno - row_number() OVER (
                       PARTITION BY user_id ORDER BY dayno) AS grp
            FROM du
        ), runs AS (
            SELECT user_id, grp, count(*) AS len
            FROM isl GROUP BY 1, 2
        )
        SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
               CAST(sum(len) AS BIGINT) AS n_active_days
        FROM runs GROUP BY 1
    """,
    "part_hop_distance": """
        WITH RECURSIVE pairs AS (
            SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ), e AS (
            SELECT pa AS src, pb AS dst FROM pairs
            UNION ALL
            SELECT pb, pa FROM pairs
        ), bfs(node, hops) AS (
            SELECT (SELECT min(l_partkey) FROM lineitem) AS node, 0 AS hops
            UNION
            SELECT e.dst, bfs.hops + 1
            FROM bfs JOIN e ON e.src = bfs.node
            WHERE bfs.hops < 3
        )
        SELECT node, CAST(min(hops) AS BIGINT) AS hops
        FROM bfs WHERE node IS NOT NULL GROUP BY node
    """,
    "rolling_distinct_users": """
        WITH du AS (
            SELECT DISTINCT date_trunc('day', ts) AS day, user_id
            FROM events
        )
        SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT)
                   AS n_users_7d
        FROM (SELECT DISTINCT day FROM du) d
        JOIN du u
          ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
        GROUP BY 1
    """,
    "fk_integrity": " UNION ALL ".join(
        _fk_oracle_block(*rel) for rel in _FK_RELS
    ),
    "part_skyline": """
        SELECT p_partkey, p_size, p_retailprice
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice
                   OR q.p_size > p.p_size))
    """,
    "event_type_transitions": """
        WITH s AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ), t AS (
            SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
            FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               round(CAST(n AS DOUBLE)
                     / sum(n) OVER (PARTITION BY from_type), 6) AS prob
        FROM t
    """,
    "copurchase_triangles": """
        WITH lp AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), e AS (
            SELECT a.l_partkey AS a, b.l_partkey AS b
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ), d AS (
            SELECT v, CAST(count(*) AS BIGINT) AS deg
            FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
            GROUP BY 1
        ), tri AS (
            SELECT CAST(count(*) AS BIGINT) AS n
            FROM e e1
            JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) FROM d)
                   AS n_wedges,
               (SELECT n FROM tri) AS n_triangles,
               (SELECT CASE WHEN sum(deg * (deg - 1)) = 0 THEN 0.0
                       ELSE round(6.0 * (SELECT n FROM tri)
                                  / sum(deg * (deg - 1)), 6) END
                FROM d) AS global_clustering
    """,
    "table_profile": """
        SELECT col_name, n_rows, n_nulls, n_distinct, min_val, max_val
        FROM (
            SELECT 'event_id' AS col_name,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
                   CAST(min(event_id) AS VARCHAR) AS min_val,
                   CAST(max(event_id) AS VARCHAR) AS max_val
            FROM events
            UNION ALL
            SELECT 'ts', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(ts) AS BIGINT),
                   CAST(count(DISTINCT ts) AS BIGINT),
                   CAST(min(ts) AS VARCHAR), CAST(max(ts) AS VARCHAR)
            FROM events
            UNION ALL
            SELECT 'user_id', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(user_id) AS BIGINT),
                   CAST(count(DISTINCT user_id) AS BIGINT),
                   CAST(min(user_id) AS VARCHAR),
                   CAST(max(user_id) AS VARCHAR)
            FROM events
            UNION ALL
            SELECT 'event_type', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(event_type) AS BIGINT),
                   CAST(count(DISTINCT event_type) AS BIGINT),
                   min(event_type), max(event_type)
            FROM events
            UNION ALL
            SELECT 'value', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(value) AS BIGINT),
                   CAST(count(DISTINCT value) AS BIGINT),
                   CAST(min(value) AS VARCHAR), CAST(max(value) AS VARCHAR)
            FROM events
            UNION ALL
            SELECT 'props', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(props) AS BIGINT),
                   CAST(count(DISTINCT props) AS BIGINT),
                   min(props), max(props)
            FROM events
        ) ORDER BY col_name
    """,
    "basket_pairs": """
        WITH lp AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), co AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        )
        SELECT part_a, part_b, n_orders FROM co
        ORDER BY n_orders DESC, part_a, part_b LIMIT 50
    """,
    "peak_concurrency": """
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM e
        ), sess AS (
            SELECT user_id, session_id, min(ts) AS t0, max(ts) AS t1
            FROM s GROUP BY 1, 2
        ), d AS (
            SELECT t0 AS t, 1 AS d FROM sess
            UNION ALL
            SELECT t1 AS t, -1 AS d FROM sess
        ), r AS (
            SELECT t, sum(d) OVER (ORDER BY t, d DESC
                                   ROWS UNBOUNDED PRECEDING) AS run
            FROM d
        )
        SELECT CAST(max(run) AS BIGINT) AS peak_concurrency,
               min(t) FILTER (WHERE run = (SELECT max(run) FROM r))
                   AS peak_at,
               (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions
        FROM r
    """,
    "shipping_priority": """
        WITH r AS (
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4)
                       AS revenue
            FROM lineitem WHERE l_shipdate > DATE '1998-06-01' GROUP BY 1
        )
        SELECT r.l_orderkey, r.revenue, o.o_orderdate, o.o_orderpriority
        FROM r JOIN orders o ON r.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate < DATE '1998-06-01'
          AND o.o_custkey IN (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
    "parts_above_brand_avg": """
        WITH c AS (
            SELECT p_partkey, p_brand, p_retailprice,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS cents
            FROM part
        ), b AS (
            SELECT p_brand, sum(cents) AS s, CAST(count(*) AS BIGINT) AS n
            FROM c GROUP BY 1
        )
        SELECT p_partkey, c.p_brand, p_retailprice,
               round(CAST(s AS DOUBLE) / 100.0 / n, 6) AS brand_avg
        FROM c JOIN b ON c.p_brand = b.p_brand
        WHERE c.cents * b.n > b.s
    """,
    "pricing_summary": """
        WITH b AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS count_order,
                   sum(CAST(l_quantity AS BIGINT)) AS sq,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sp,
                   sum(CAST(round(l_discount * 100) AS BIGINT)) AS sd,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                       AS sdp,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS sc
            FROM lineitem
            WHERE l_shipdate <= DATE '2000-09-02'
            GROUP BY 1, 2
        )
        SELECT l_returnflag, l_linestatus,
               CAST(sq AS BIGINT) AS sum_qty,
               round(CAST(sp AS DOUBLE) / 100.0, 2) AS sum_base_price,
               round(CAST(sdp AS DOUBLE) / 10000.0, 2) AS sum_disc_price,
               round(CAST(sc AS DOUBLE) / 1000000.0, 2) AS sum_charge,
               round(CAST(sq AS DOUBLE) / count_order, 6) AS avg_qty,
               round(CAST(sp AS DOUBLE) / 100.0 / count_order, 6) AS avg_price,
               round(CAST(sd AS DOUBLE) / 100.0 / count_order, 6) AS avg_disc,
               count_order
        FROM b
    """,
    "regional_supplier_volume": """
        SELECT n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
        GROUP BY 1
    """,
    "daily_purchase_vs_signup": """
        WITH p AS (
            SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ), s AS (
            SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
            FROM events WHERE event_type = 'signup' GROUP BY 1
        )
        SELECT COALESCE(p.day, s.day) AS day,
               CAST(COALESCE(p.n, 0) AS BIGINT) AS n_purchases,
               CAST(COALESCE(s.n, 0) AS BIGINT) AS n_signups
        FROM p FULL OUTER JOIN s ON p.day = s.day
    """,
    "user_retention_cohorts": """
        WITH uw AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
        ), f AS (
            SELECT user_id, min(w) AS w0 FROM uw GROUP BY 1
        )
        SELECT f.w0 AS cohort_week,
               CAST(date_diff('day', f.w0, uw.w) // 7 AS BIGINT)
                   AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM uw JOIN f USING (user_id)
        GROUP BY 1, 2
    """,
    "basket_rules": """
        WITH lp AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), n AS (
            SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
            FROM lp
        ), pc AS (
            SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part
            FROM lp GROUP BY 1
        ), co AS (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                   CAST(count(*) AS BIGINT) AS c
            FROM lp a JOIN lp b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        ), rules AS (
            SELECT pa AS antecedent, pb AS consequent, c,
                   x.n_part AS n_a, y.n_part AS n_b
            FROM co JOIN pc x ON pa = x.l_partkey JOIN pc y ON pb = y.l_partkey
            UNION ALL
            SELECT pb, pa, c, y.n_part, x.n_part
            FROM co JOIN pc x ON pa = x.l_partkey JOIN pc y ON pb = y.l_partkey
        )
        SELECT antecedent, consequent,
               round(c * 1.0 / n.n_baskets, 6) AS support,
               round(c * 1.0 / n_a, 6) AS confidence,
               round((c * n.n_baskets) * 1.0 / (n_a * n_b), 6) AS lift
        FROM rules, n
        ORDER BY lift DESC, antecedent, consequent LIMIT 50
    """,
    "price_mad_outliers": """
        WITH c AS (
            SELECT p_brand,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS cents
            FROM part
        ), m AS (
            SELECT p_brand, median(cents) AS med,
                   CAST(count(*) AS BIGINT) AS n_parts
            FROM c GROUP BY 1
        ), d AS (
            SELECT c.p_brand, abs(c.cents - m.med) AS dev
            FROM c JOIN m USING (p_brand)
        ), md AS (
            SELECT p_brand, median(dev) AS mad FROM d GROUP BY 1
        ), o AS (
            SELECT d.p_brand,
                   CAST(count(*) FILTER (WHERE d.dev > 3 * md.mad) AS BIGINT)
                       AS n_outliers
            FROM d JOIN md USING (p_brand) GROUP BY 1
        )
        SELECT m.p_brand, m.n_parts,
               round(m.med / 100, 3) AS median_price,
               round(md.mad / 100, 4) AS mad,
               o.n_outliers
        FROM m JOIN md USING (p_brand) JOIN o USING (p_brand)
    """,
    "price_percentiles_cont": """
        WITH s AS (
            SELECT l_extendedprice AS v,
                   row_number() OVER (ORDER BY l_extendedprice) - 1 AS rn
            FROM lineitem
        ), c AS (SELECT count(*) AS n FROM lineitem),
        q(p) AS (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                        (CAST(0.75 AS DOUBLE)), (CAST(0.95 AS DOUBLE))),
        ix AS (
            SELECT p, p * (n - 1) AS idx,
                   CAST(floor(p * (n - 1)) AS BIGINT) AS lo,
                   CAST(ceil(p * (n - 1)) AS BIGINT) AS hi
            FROM q, c
        )
        SELECT ix.p, round(slo.v + (shi.v - slo.v) * (ix.idx - ix.lo), 6)
                   AS value
        FROM ix JOIN s slo ON slo.rn = ix.lo JOIN s shi ON shi.rn = ix.hi
    """,
    "user_event_path": """
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS event_path,
               count(*) AS path_len
        FROM events GROUP BY user_id
    """,
    "activity_rollup": """
        WITH e AS (
            SELECT event_type, date_trunc('day', ts) AS day, value FROM events
        )
        SELECT event_type, day, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM e GROUP BY ROLLUP(event_type, day)
    """,
    "activity_cube": """
        WITH e AS (
            SELECT event_type, date_trunc('day', ts) AS day, value FROM events
        )
        SELECT event_type, day, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM e GROUP BY CUBE(event_type, day)
    """,
    "user_type_set_ops": """
        WITH p AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'purchase'),
             s AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = 'signup')
        SELECT user_id, 'both' AS membership
        FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM s)
        UNION ALL
        SELECT user_id, 'purchase_only'
        FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM s)
        UNION ALL
        SELECT user_id, 'signup_only'
        FROM (SELECT user_id FROM s EXCEPT SELECT user_id FROM p)
    """,
    "lineitem_unpivot": """
        UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                        l_discount, l_tax FROM lineitem)
        ON l_quantity, l_extendedprice, l_discount, l_tax
        INTO NAME measure VALUE value
    """,
    "quantity_moments": """
        WITH b AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   sum(CAST(l_quantity AS BIGINT)) AS sq,
                   sum(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS sq2
            FROM lineitem GROUP BY 1, 2
        )
        SELECT l_returnflag, l_linestatus, n_rows,
               round(CAST(sq AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS mean_qty,
               CASE WHEN n_rows > 1 THEN
                   round(CAST(n_rows * sq2 - sq * sq AS DOUBLE)
                         / CAST(n_rows * (n_rows - 1) AS DOUBLE), 6)
               END AS var_qty,
               CASE WHEN n_rows > 1 THEN
                   round(sqrt(CAST(n_rows * sq2 - sq * sq AS DOUBLE)
                              / CAST(n_rows * (n_rows - 1) AS DOUBLE)), 6)
               END AS stddev_qty
        FROM b
    """,
    "quantity_discount_corr": """
        WITH b AS (
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   sum(CAST(l_quantity AS BIGINT)) AS sx,
                   sum(CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS sy,
                   sum(CAST(l_quantity AS BIGINT)
                       * CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS sxy,
                   sum(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS sx2,
                   sum(CAST(round(l_discount * 100.0, 0) AS BIGINT)
                       * CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS sy2
            FROM lineitem GROUP BY 1
        ), d AS (
            SELECT l_returnflag, n_rows,
                   n_rows * sxy - sx * sy AS num,
                   n_rows * sx2 - sx * sx AS dena,
                   n_rows * sy2 - sy * sy AS denb,
                   n_rows * (n_rows - 1) AS nn1
            FROM b
        )
        SELECT l_returnflag, n_rows,
               CASE WHEN nn1 > 0 THEN
                   round(CAST(num AS DOUBLE) / CAST(nn1 AS DOUBLE), 6)
               END AS covar_qd,
               CASE WHEN dena > 0 AND denb > 0 THEN
                   round(CAST(num AS DOUBLE)
                         / (sqrt(CAST(dena AS DOUBLE))
                            * sqrt(CAST(denb AS DOUBLE))), 6)
               END AS corr_qd
        FROM d
    """,
    "quantity_discount_regression": """
        WITH b AS (
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   sum(CAST(l_quantity AS BIGINT)) AS sx,
                   sum(CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS sy,
                   sum(CAST(l_quantity AS BIGINT)
                       * CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS sxy,
                   sum(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS sx2,
                   sum(CAST(round(l_discount * 100.0, 0) AS BIGINT)
                       * CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS sy2
            FROM lineitem GROUP BY 1
        ), d AS (
            SELECT l_returnflag, n_rows, sx, sy,
                   n_rows * sxy - sx * sy AS num,
                   n_rows * sx2 - sx * sx AS dena,
                   n_rows * sy2 - sy * sy AS denb
            FROM b
        ), f AS (
            SELECT l_returnflag, n_rows, sx, sy, dena, denb,
                   CASE WHEN dena > 0 THEN
                       CAST(num AS DOUBLE) / CAST(dena AS DOUBLE)
                   END AS slope_raw,
                   CASE WHEN dena > 0 AND denb > 0 THEN
                       CAST(num AS DOUBLE)
                       / (sqrt(CAST(dena AS DOUBLE)) * sqrt(CAST(denb AS DOUBLE)))
                   END AS corr_raw
            FROM d
        )
        SELECT l_returnflag, n_rows,
               round(slope_raw, 6) AS slope,
               round((CAST(sy AS DOUBLE) - slope_raw * CAST(sx AS DOUBLE))
                     / CAST(n_rows AS DOUBLE), 6) AS intercept,
               round(CASE WHEN dena > 0 AND denb = 0 THEN 1.0
                          ELSE corr_raw * corr_raw END, 6) AS r2
        FROM f
    """,
    "quantity_zscore": """
        WITH b AS (
            SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                   sum(CAST(l_quantity AS BIGINT)) AS sq,
                   sum(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS sq2
            FROM lineitem GROUP BY 1
        ), s AS (
            SELECT l_returnflag,
                   CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                   CASE WHEN n > 1 AND n * sq2 - sq * sq > 0 THEN
                       sqrt(CAST(n * sq2 - sq * sq AS DOUBLE)
                            / CAST(n * (n - 1) AS DOUBLE))
                   END AS sigma
            FROM b
        )
        SELECT l_orderkey, l_linenumber, lineitem.l_returnflag,
               round((CAST(l_quantity AS BIGINT) - mu) / sigma, 6) AS z_qty
        FROM lineitem JOIN s ON lineitem.l_returnflag = s.l_returnflag
    """,
    "train_val_split": f"""
        SELECT doc_id,
               CASE WHEN CAST(((doc_id + {_SPLIT_SEED})::HUGEINT * 2654435761)
                         % 4294967296 AS BIGINT) % 100 < {_SPLIT_TRAIN_PCT}
                    THEN 'train' ELSE 'val' END AS split
        FROM documents
    """,
    "purchase_conversions": """
        WITH p AS (
            SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        ), v AS (
            SELECT user_id, ts FROM events WHERE event_type = 'view'
        ), conv AS (
            SELECT p.user_id,
                   CASE WHEN EXISTS (
                       SELECT 1 FROM v
                       WHERE v.user_id = p.user_id
                         AND v.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
                   ) THEN 1 ELSE 0 END AS c
            FROM p
        )
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(c) AS BIGINT) AS n_converted
        FROM conv GROUP BY user_id
    """,
    "weighted_sample_docs": f"""
        WITH h AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(((doc_id + {_WSAMPLE_SEED})::HUGEINT * 2654435761)
                        % 4294967296 AS DOUBLE) AS hv
            FROM documents
        )
        SELECT doc_id, n_chars,
               round(ln((hv + 0.5) / 4294967296.0)
                     / CAST(n_chars AS DOUBLE), 6) AS key
        FROM h
        ORDER BY key DESC, doc_id
        LIMIT {_WSAMPLE_K}
    """,
    "quantity_skew_kurtosis": """
        WITH b AS (
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n,
                   sum(CAST(l_quantity AS BIGINT)) AS s1,
                   sum(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS s2,
                   sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS s3,
                   sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS s4
            FROM lineitem GROUP BY 1
        ), m AS (
            SELECT l_returnflag, n,
                   n * s2 - s1 * s1 AS a,
                   n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS bb,
                   n * n * n * s4 - 4 * n * n * s1 * s3
                       + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS cc
            FROM b
        )
        SELECT l_returnflag, n AS n_rows,
               CASE WHEN n >= 3 AND a > 0 THEN
                   round(sqrt(CAST(n * (n - 1) AS DOUBLE)) / CAST(n - 2 AS DOUBLE)
                         * (CAST(bb AS DOUBLE)
                            / (CAST(a AS DOUBLE) * sqrt(CAST(a AS DOUBLE)))), 6)
               END AS skew_qty,
               CASE WHEN n >= 4 AND a > 0 THEN
                   round((CAST(n + 1 AS DOUBLE)
                          * (CAST(cc AS DOUBLE)
                             / (CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) - 3.0)
                          + 6.0)
                         * (CAST(n - 1 AS DOUBLE)
                            / CAST((n - 2) * (n - 3) AS DOUBLE)), 6)
               END AS kurt_qty
        FROM m
    """,
    "quantity_mode": """
        WITH c AS (
            SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS mode_qty,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2
        ), r AS (
            SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                         ORDER BY n DESC, mode_qty ASC) AS rn
            FROM c
        )
        SELECT l_returnflag, mode_qty, CAST(n AS BIGINT) AS mode_count
        FROM r WHERE rn = 1
    """,
    "order_price_ntile": """
        WITH o AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   o_orderkey, o_totalprice
            FROM orders
        )
        SELECT month, o_orderkey,
               CAST(ntile(4) OVER (PARTITION BY month
                                   ORDER BY o_totalprice DESC, o_orderkey)
                    AS BIGINT) AS price_quartile
        FROM o
    """,
    "daily_type_pivot": """
        SELECT date_trunc('day', ts) AS day,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view
        FROM events GROUP BY 1
    """,
    "event_gaps": """
        WITH g AS (
            SELECT user_id,
                   date_diff('microsecond',
                             lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id),
                             ts) AS gap_us
            FROM events
        )
        SELECT user_id, count(*) AS n_gaps,
               round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0, 2)
                   AS avg_gap_sec,
               round(CAST(max(gap_us) AS DOUBLE) / 1000000.0, 2) AS max_gap_sec
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY user_id
    """,
    "rolling_daily_events": """
        WITH d AS (
            SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day, n,
               CAST(sum(n) OVER w AS BIGINT) AS n_7d,
               round(CAST(sum(n) OVER w AS DOUBLE) / count(n) OVER w, 2) AS avg_7d
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    "cumulative_revenue": """
        WITH o AS (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS cents
            FROM orders
        )
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(row_number() OVER w AS BIGINT) AS order_seq,
               sum(cents) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey
                                ROWS UNBOUNDED PRECEDING) / 100.0 AS cum_spend
        FROM o
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "order_price_ranks": """
        WITH o AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   o_orderkey, o_totalprice
            FROM orders
        )
        SELECT month, o_orderkey,
               CAST(rank() OVER w AS BIGINT) AS price_rank,
               CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank,
               round(percent_rank() OVER w, 6) AS price_pct_rank
        FROM o
        WINDOW w AS (PARTITION BY month ORDER BY o_totalprice DESC)
    """,
    "quality_filter": f"""
        WITH {QUALITY_SQL_CTES}
        SELECT doc_id, quality_score FROM q
        WHERE quality_score >= {QUALITY_SQL_THRESHOLD}
    """,
    "stratified_sample": """
        SELECT * FROM events
        WHERE (event_id::HUGEINT * 2654435761) % 4294967296 % 10000 <
              CASE event_type
                  WHEN 'purchase' THEN 5000
                  WHEN 'signup' THEN 3000
                  WHEN 'error' THEN 500
                  ELSE 1000
              END
    """,
    # mixture oracle shares the _MIX_WEIGHTS constants: same min(n/p)
    # binding-source total, same floor(p*T) quotas, same id-hash order
    "domain_mix_sample": f"""
        WITH w(source, p) AS (VALUES {", ".join(
            f"('{s}', {p})" for s, p in sorted(_MIX_WEIGHTS.items())
        )}),
        cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        t AS (SELECT min(n / p) AS total FROM cnt JOIN w USING (source)),
        k AS (SELECT w.source, CAST(floor(w.p * t.total) AS BIGINT) AS q
              FROM w CROSS JOIN t),
        r AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296,
                                doc_id
                   ) AS rn
            FROM documents WHERE source IN (SELECT source FROM w)
        )
        SELECT doc_id, source FROM r JOIN k USING (source) WHERE rn <= q
    """,
    "sample_per_group": """
        SELECT event_id, ts, user_id, event_type, value FROM (
            SELECT event_id, ts, user_id, event_type, value,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY (event_id::HUGEINT * 2654435761) % 4294967296,
                                event_id
                   ) AS rn
            FROM events
        ) WHERE rn <= 200
    """,
    "network_stats": """
        SELECT (SELECT count(*) FROM events) AS total_events,
               (SELECT count(DISTINCT user_id) FROM events) AS n_users,
               (SELECT count(DISTINCT event_type) FROM events) AS n_event_types,
               (SELECT min(ts) FROM events) AS first_ts,
               (SELECT max(ts) FROM events) AS last_ts,
               (SELECT round(sum(value), 2) FROM events) AS total_value,
               (SELECT user_id FROM events GROUP BY user_id
                ORDER BY round(sum(value), 2) DESC, user_id LIMIT 1) AS top_user_id,
               (SELECT event_id FROM events
                ORDER BY ts DESC, event_id DESC LIMIT 1) AS latest_event_id
    """,
    "user_stats": """
        WITH s AS (
            SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                   max(ts) AS last_seen, min(ts) AS first_seen,
                   date_diff('microsecond', min(ts), TIMESTAMP '2024-02-01 00:00:00')
                       / 86400000000.0 AS age_days
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_events, total_value, n_purchases, last_seen, first_seen,
               round(2.0 * ln(1.0 + n_purchases)
                     + 1.5 * ln(1.0 + total_value)
                     + 10.0 * (total_value / n_events)
                     + least(n_events / age_days, 10.0)
                     + 0.5 * ln(1.0 + age_days / 30.0), 2) AS influence,
               round(n_purchases * 100.0 / n_events, 2) AS engagement_rate
        FROM s
    """,
    "virality_scores": """
        SELECT event_id,
               round(
                   (3.0 * CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)
                    + 0.001 * value)
                   * exp(-0.1155 * (date_diff('microsecond', ts,
                         TIMESTAMP '2024-02-01 00:00:00') / 3600000000.0)),
                   2) AS virality
        FROM events
    """,
    "daily_signup_growth": """
        WITH d AS (
            SELECT date_trunc('day', ts) AS day, count(*) AS n
            FROM events WHERE event_type = 'signup' GROUP BY 1
        )
        SELECT day, n,
               round(CASE WHEN lag(n) OVER (ORDER BY day) > 0
                     THEN (n - lag(n) OVER (ORDER BY day)) * 100.0
                          / lag(n) OVER (ORDER BY day)
                     ELSE 0.0 END, 2) AS dod_pct
        FROM d
    """,
    "user_event_context": """
        WITH e AS (
            SELECT user_id, event_id,
                   date_diff('microsecond', ts, lead(ts) OVER w) AS gap_us,
                   first_value(event_type) OVER w AS first_type,
                   last_value(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS last_type,
                   round(cume_dist() OVER w, 6) AS cume
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id,
               round(CAST(gap_us AS DOUBLE) / 1000000.0, 2) AS next_gap_sec,
               first_type, last_type, cume
        FROM e
    """,
    "user_sessions": """
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, ts, event_id,
                   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
            FROM e
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events,
               round(CAST(date_diff('microsecond', min(ts), max(ts)) AS DOUBLE)
                     / 1000000.0, 2) AS duration_sec
        FROM s GROUP BY 1, 2
    """,
    "purchase_events": """
        SELECT event_id, ts, user_id, value,
               CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        FROM events WHERE event_type = 'purchase'
    """,
    "search_documents": """
        SELECT doc_id, lang, substr(text, 1, 80) AS snippet
        FROM documents WHERE text LIKE '%merge%'
        ORDER BY doc_id DESC LIMIT 20
    """,
    "trending_words": """
        WITH words AS (
            SELECT unnest(string_split(text, ' ')) AS word, source, doc_id
            FROM documents
        ), agg AS (
            SELECT word, count(*) AS mention_count,
                   count(DISTINCT source) AS unique_sources,
                   array_to_string(list_transform(
                       list_sort(list(DISTINCT doc_id))[1:5],
                       x -> CAST(x AS VARCHAR)), ',') AS sample_doc_ids
            FROM words GROUP BY word HAVING count(*) >= 3
        )
        SELECT word, mention_count, unique_sources, sample_doc_ids,
               round(mention_count / 24.0 * ln(1.0 + unique_sources), 2) AS trend_score
        FROM agg
    """,
    "top_users_by_value": """
        SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events GROUP BY user_id
        ORDER BY total_value DESC, user_id LIMIT 10
    """,
    "activity_timeline": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "activity_timeline_dense": """
        WITH bounds AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
        ), spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                       AS window_start
            FROM bounds
        ), types AS (
            SELECT DISTINCT event_type FROM events
        ), counts AS (
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT spine.window_start, types.event_type,
               COALESCE(counts.n_events, 0) AS n_events
        FROM spine CROSS JOIN types
        LEFT JOIN counts ON counts.window_start = spine.window_start
                        AND counts.event_type = types.event_type
    """,
    "user_event_entropy": """
        WITH g AS (
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS c_click,
                   CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS c_error,
                   CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS c_purchase,
                   CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS c_signup,
                   CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS c_view
            FROM events GROUP BY user_id
        )
        SELECT user_id, n_events,
               round(
                   (CASE WHEN c_click > 0 THEN
                       -((CAST(c_click AS DOUBLE) / CAST(n_events AS DOUBLE))
                         * log2(CAST(c_click AS DOUBLE) / CAST(n_events AS DOUBLE)))
                    ELSE 0.0 END)
                   + (CASE WHEN c_error > 0 THEN
                       -((CAST(c_error AS DOUBLE) / CAST(n_events AS DOUBLE))
                         * log2(CAST(c_error AS DOUBLE) / CAST(n_events AS DOUBLE)))
                    ELSE 0.0 END)
                   + (CASE WHEN c_purchase > 0 THEN
                       -((CAST(c_purchase AS DOUBLE) / CAST(n_events AS DOUBLE))
                         * log2(CAST(c_purchase AS DOUBLE) / CAST(n_events AS DOUBLE)))
                    ELSE 0.0 END)
                   + (CASE WHEN c_signup > 0 THEN
                       -((CAST(c_signup AS DOUBLE) / CAST(n_events AS DOUBLE))
                         * log2(CAST(c_signup AS DOUBLE) / CAST(n_events AS DOUBLE)))
                    ELSE 0.0 END)
                   + (CASE WHEN c_view > 0 THEN
                       -((CAST(c_view AS DOUBLE) / CAST(n_events AS DOUBLE))
                         * log2(CAST(c_view AS DOUBLE) / CAST(n_events AS DOUBLE)))
                    ELSE 0.0 END),
               6) AS entropy_bits
        FROM g
    """,
    "sliding_activity": """
        SELECT date_trunc('hour', ts) - to_hours(CAST(k AS BIGINT)) AS window_start,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events, range(6) t(k)
        GROUP BY 1
    """,
    "hour_histogram": """
        SELECT CAST(hour(ts) AS BIGINT) AS hour, count(*) AS n
        FROM events GROUP BY 1
    """,
    "price_stats": """
        WITH s AS (
            SELECT list_sort(list(l_extendedprice)) AS a, count(*) AS n,
                   sum(l_extendedprice) AS total,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price
            FROM lineitem
        )
        SELECT n, round(total, 2) AS total, round(round(total, 2) / n, 2) AS mean_price,
               min_price, max_price,
               a[n // 2 + 1] AS median,
               -- floor(), not CAST: CAST rounds half-away (n=10 would probe
               -- index 3/8/10-ish) while the engine and the reference use
               -- truncation (metrics_calculator.py:252-287); least() guards
               -- the p95 == n edge the same way the reference does
               a[least(CAST(floor(n * 0.25) AS INT), n - 1) + 1] AS p25,
               a[least(CAST(floor(n * 0.75) AS INT), n - 1) + 1] AS p75,
               a[least(CAST(floor(n * 0.95) AS INT), n - 1) + 1] AS p95
        FROM s
    """,
    "distinct_users_by_type": """
        SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        FROM events GROUP BY event_type
    """,
    "latest_event_per_user": """
        SELECT * FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    "latest_event": """
        SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """,
    "order_revenue": """
        SELECT o_orderkey, o_custkey, o_totalprice,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
               count(*) AS n_items
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1, 2, 3
    """,
    "customer_order_stats": """
        SELECT o_custkey, c_name, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_spent
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    """,
    "top3_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
    "asof_last_signup": """
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT max(s.ts) FROM events s
                WHERE s.user_id = p.user_id AND s.event_type = 'signup'
                  AND s.ts <= p.ts) AS signup_ts
        FROM events p WHERE p.event_type = 'purchase'
    """,
    "nation_region": """
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    "lapsed_customers": """
        SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    """,
    "customers_with_big_orders": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000.0)
    """,
    "median_price_per_brand": """
        SELECT p_brand, round(median(p_retailprice), 3) AS median_price,
               count(*) AS n_parts
        FROM part GROUP BY p_brand
    """,
    "price_band_totals": """
        WITH bands(band, lo, hi) AS (VALUES
            ('lt_1k', 0.0, 1000.0),
            ('1k_10k', 1000.0, 10000.0),
            ('10k_50k', 10000.0, 50000.0),
            ('ge_50k', 50000.0, 1e308))
        SELECT band, count(*) AS n, round(sum(l_extendedprice), 2) AS total
        FROM lineitem JOIN bands
          ON l_extendedprice >= lo AND l_extendedprice < hi
        GROUP BY band
    """,
    "dedup_documents_exact": """
        SELECT doc_id, lang, source, n_chars, text FROM documents
        QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    """,
    "doc_extract": """
        SELECT doc_id,
               CAST(len(list_distinct(list_transform(
                   regexp_extract_all(text, '#(\\w+)', 1), x -> lower(x)))) AS BIGINT)
                   AS hashtag_count,
               CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS BIGINT)
                   AS url_count,
               CAST(len(regexp_extract_all(text, '@(\\w+)')) AS BIGINT)
                   AS mention_count,
               regexp_matches(text,
                   '(?i)https?://[^\\s?#]+\\.(jpg|jpeg|png|gif|webp|mp4|mov|webm)([?#][^\\s]*)?')
                   AS has_media
        FROM documents
    """,
    "doc_lang": """
        SELECT doc_id,
               CASE WHEN len(text) = 0 THEN NULL
                    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                    WHEN regexp_matches(text, '[぀-ヿ]') THEN 'ja'
                    WHEN regexp_matches(text, '[가-힯]') THEN 'ko'
                    ELSE 'en' END AS lang_detected
        FROM documents
    """,
    "doc_token_stats": """
        SELECT doc_id, n_chars,
               CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS word_count
        FROM documents
    """,
    "doc_quality": """
        SELECT doc_id,
               round(0.3 * (CASE
                   WHEN n_chars < 50 THEN n_chars / 50.0 * 50.0
                   WHEN n_chars <= 500 THEN 50.0 + (n_chars - 50.0) / 450.0 * 50.0
                   ELSE 100.0 - least(50.0, (n_chars - 500.0) / 100.0)
               END), 2) AS quality_score
        FROM documents
    """,
    "doc_quality_full": """
        WITH d AS (
            SELECT doc_id, text, CAST(len(text) AS DOUBLE) AS n,
                   CAST(len(list_distinct(list_transform(
                       regexp_extract_all(text, '#(\\w+)', 1),
                       x -> lower(x)))) AS DOUBLE) AS h
            FROM documents
        )
        SELECT doc_id,
               round(0.3 * (CASE
                         WHEN n < 50 THEN n / 50.0 * 50.0
                         WHEN n <= 500 THEN 50.0 + (n - 50.0) / 450.0 * 50.0
                         ELSE 100.0 - least(50.0, (n - 500.0) / 100.0) END)
                   + 0.2 * (CASE WHEN regexp_matches(text,
                         '(?i)https?://[^\\s?#]+\\.(jpg|jpeg|png|gif|webp|mp4|mov|webm)([?#][^\\s]*)?')
                         THEN 20.0 ELSE 0.0 END)
                   + 0.1 * (CASE
                         WHEN h = 0 THEN 0.0
                         WHEN h <= 3 THEN 15.0
                         WHEN h <= 5 THEN 10.0
                         ELSE greatest(0.0, 10.0 - (h - 5.0) * 2.0) END), 2)
                   AS quality_score
        FROM d
    """,
    "ann_topk": """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)::DOUBLE[]), 6) AS score
        FROM embeddings WHERE vec_id != 0
        ORDER BY score DESC, vec_id LIMIT 10
    """,
}
