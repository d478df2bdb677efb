"""Publish-back sink (SURVEY §2 S6): forward applied change events to N
downstream sinks as canonical Parquet changelog segments.

Reference analog: ``RelayPool.publish_to_all``
(src/nostr_pipeline/extractors/relay_client.py:298-314) — the reference
pushes events back out to every connected relay and returns a per-relay
success map, isolating failures so one dead relay doesn't block the rest.
The CDC-native form of "publish an event back": the engine re-emits the
changelog segments it has APPLIED into sink directories that are
themselves valid binlog dirs, so a downstream replica running
``apply_changelog`` over a sink reaches the identical final table —
deletes included, because events (not state diffs) are forwarded.
JSONL segments are normalized to canonical Parquet on the way out
(basename preserved, extension swapped); Parquet segments are forwarded
byte-for-byte.

Exactly-once per sink: each segment lands under its content-stable
source basename via stage+rename (a retried publish rewrites identical
bytes), and ``_published.json`` records the names already forwarded so a
re-publish is a metadata-only no-op. A crash between the segment rename
and the marker update is safe: the rewrite is idempotent and the
downstream apply dedups by segment name anyway. Only segments the lake
has actually applied are eligible — a replica can never get ahead of the
publisher's own committed state.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from ..state.lake import Lake, dir_writer_lock

PUBLISHED_MARKER = "_published.json"


def _published_set(sink: str) -> set[str]:
    path = os.path.join(sink, PUBLISHED_MARKER)
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return set(json.load(f)["published"])


def _write_published(sink: str, names: set[str]) -> None:
    path = os.path.join(sink, PUBLISHED_MARKER)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"published": sorted(names)}, f)
    os.replace(tmp, path)


def _forward_batch(batch: pa.Table) -> pa.Table:
    """Forward one source segment (batch_size=1) into its sink: Parquet is
    copied byte-for-byte, JSONL is parsed once (the same newline-delimited
    read the apply path uses via ray.data.read_json → pyarrow.json) and
    written as canonical Parquet. Stage + atomic rename keeps a concurrent
    or retried publish from ever exposing a torn segment."""
    import shutil

    from pyarrow import json as pajson

    out = {"segment": [], "rows": [], "bytes": []}
    for src, sink in zip(
        batch["path"].to_pylist(), batch["sink"].to_pylist()
    ):
        base = os.path.basename(src)
        if base.endswith(".jsonl"):
            base = base[: -len(".jsonl")] + ".parquet"
        dst = os.path.join(sink, base)
        tmp = f"{dst}.staged-{os.getpid()}"
        if src.endswith(".parquet"):
            shutil.copyfile(src, tmp)
            rows = pq.read_metadata(tmp).num_rows
        else:
            table = pajson.read_json(src)
            pq.write_table(table, tmp)
            rows = table.num_rows
        size = os.path.getsize(tmp)
        os.replace(tmp, dst)
        out["segment"].append(base)
        out["rows"].append(rows)
        out["bytes"].append(size)
    return pa.table(
        {
            "segment": pa.array(out["segment"], pa.string()),
            "rows": pa.array(out["rows"], pa.int64()),
            "bytes": pa.array(out["bytes"], pa.int64()),
        }
    )


def publish_changelog(
    lake_root: str,
    binlog_dir: str | list[str],
    sinks: list[str] | str,
) -> dict[str, Any]:
    """Fan the lake's applied changelog segments out to every sink.

    Returns ``{"sinks": {sink: {"ok": bool, ...}}, "applied": n,
    "pending_upstream": n}`` — per-sink success isolation exactly like the
    reference's per-relay result map (relay_client.py:310-314): one
    unwritable sink is reported ``ok=False`` with its error while the
    others still publish. ``pending_upstream`` counts binlog segments the
    lake has NOT applied yet (never forwarded — the replica cannot get
    ahead of the publisher)."""
    import ray.data as rd

    from .cdc import list_segments

    if isinstance(sinks, str):
        sinks = [sinks]
    if isinstance(binlog_dir, str):
        binlog_dir = [binlog_dir]
    applied = Lake(lake_root).applied_segments()
    # fan-in parity with the apply path (S4): the lake may have consumed
    # several source dirs; publish forwards from all of them, name-ordered
    all_segs = sorted(
        (p for d in binlog_dir for p in list_segments(d)),
        key=os.path.basename,
    )
    eligible = [p for p in all_segs if os.path.basename(p) in applied]
    results: dict[str, Any] = {}
    for sink in sinks:
        try:
            os.makedirs(sink, exist_ok=True)
            with dir_writer_lock(sink, "publish sink"):
                done = _published_set(sink)
                todo = [
                    p for p in eligible if os.path.basename(p) not in done
                ]
                stats: dict[str, Any] = {
                    "ok": True,
                    "published": len(todo),
                    "total": len(done) + len(todo),
                    "rows": 0,
                    "bytes": 0,
                }
                if todo:
                    # one forward task per segment; the stats collect is
                    # O(#segments) rows — bounded bookkeeping, not data
                    items = rd.from_items(
                        [{"path": p, "sink": sink} for p in todo]
                    )
                    summary = items.map_batches(
                        _forward_batch, batch_size=1, batch_format="pyarrow"
                    ).take_all()
                    stats["rows"] = int(sum(r["rows"] for r in summary))
                    stats["bytes"] = int(sum(r["bytes"] for r in summary))
                    _write_published(
                        sink, done | {r["segment"] for r in summary}
                    )
                results[sink] = stats
        except Exception as ex:  # per-sink isolation (reference parity)
            results[sink] = {"ok": False, "error": f"{type(ex).__name__}: {ex}"}
    return {
        "sinks": results,
        "applied": len(eligible),
        "pending_upstream": len(all_segs) - len(eligible),
    }


def table_fingerprint(ds) -> tuple[int, int, int]:
    """Order-independent content fingerprint of a Dataset: per block hash
    every row (all columns, name-sorted projection), fold with XOR and a
    wrapping sum; the driver folds one row per block — O(#blocks), never
    O(rows). Two tables with equal (count, xor, sum) over unique rows are
    equal for any realistic adversary-free comparison."""
    import numpy as np
    import pandas as pd

    def fp(batch: pa.Table) -> pa.Table:
        df = batch.select(sorted(batch.column_names)).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False).to_numpy("uint64")
        return pa.table(
            {
                "n": pa.array([len(df)], pa.int64()),
                "x": pa.array(
                    [int(np.bitwise_xor.reduce(h)) if len(h) else 0],
                    pa.uint64(),
                ),
                "s": pa.array(
                    [int(np.sum(h, dtype=np.uint64)) if len(h) else 0],
                    pa.uint64(),
                ),
            }
        )

    n = x = s = 0
    for row in ds.map_batches(fp, batch_format="pyarrow").take_all():
        n += row["n"]
        x ^= row["x"]
        s = (s + row["s"]) % (1 << 64)
    return n, x, s


def q_publish_changelog(sf_dir: str):
    """Registry entry (rows-only): publish this scale point's applied
    changelog to a sink, replay the SINK into a fresh replica lake, and
    return per-sink stats plus a true round-trip witness — the replica's
    final table must equal the publisher's (LWW over the forwarded events
    reproduces state, deletes included), compared by distributed
    order-independent fingerprint so nothing corpus-sized touches the
    driver. ``state_match`` False fails loudly in the row values, so the
    driver's rows-only gate still watches the full publish→replay loop."""
    import shutil

    from .cdc import apply_changelog, read_final
    from .flagship import CONFIG, binlog_dir_for, lake_dir_for, q_cdc_apply

    q_cdc_apply(sf_dir)  # ensure the lake exists (idempotent)
    lake = lake_dir_for(sf_dir)
    sink = lake + "-pubsink"
    replica = lake + "-replica"
    out = publish_changelog(lake, binlog_dir_for(sf_dir), [sink])
    if out["sinks"][sink].get("published", 0) > 0 and os.path.isdir(replica):
        shutil.rmtree(replica)  # new segments: rebuild the replica witness
    apply_changelog(replica, sink, CONFIG)
    fp_a = table_fingerprint(read_final(lake, sort=False))
    fp_b = table_fingerprint(read_final(replica, sort=False))
    match = fp_a == fp_b
    s = out["sinks"][sink]
    return pa.table(
        {
            "sink_ok": pa.array([bool(s["ok"])], pa.bool_()),
            "segments_total": pa.array([int(s.get("total", 0))], pa.int64()),
            "replica_rows": pa.array([int(fp_b[0])], pa.int64()),
            "state_match": pa.array([bool(match)], pa.bool_()),
        }
    )


QUERIES = {"publish_changelog": q_publish_changelog}
