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
JSONL segments are normalized to canonical Parquet on the way out under
the SAME typing contract the apply path uses (``cdc._segment_schema``:
known keys get changelog types, evolved extras become additive string
columns), so the replica's types and values match the publisher's
bit-for-bit; Parquet segments are forwarded byte-for-byte. Each segment
is read/parsed ONCE and fanned to every sink needing it (the reference
publishes each event once to all relays, not once per relay).

Exactly-once per sink: each segment lands under its content-stable
SOURCE basename (``.parquet`` APPENDED for JSONL — ``x.jsonl`` →
``x.jsonl.parquet`` — so a Parquet segment and a JSONL segment sharing a
stem can never overwrite each other at the sink) via stage+rename, and
``_published.json`` records the source names already forwarded so a
re-publish is a metadata-only no-op. A crash between the segment rename
and the marker update is safe: the rewrite is idempotent and the
downstream apply dedups by segment name anyway. Only segments the lake
has actually applied are eligible — a replica can never get ahead of the
publisher's own committed state.
"""

from __future__ import annotations

import glob
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
    """Forward one source segment (batch_size=1) into every sink that
    still needs it: the source is read/parsed ONCE into task memory
    (bounded by segment size — binlogs are size-rotated) and the identical
    bytes are staged+renamed into each sink. Parquet is forwarded
    byte-for-byte; JSONL is parsed and cast to the apply path's
    ``_segment_schema`` contract so downstream types match the
    publisher's. Per-sink try/except: one dead sink fails its own row,
    the other sinks still receive the segment."""
    from .cdc import _segment_schema

    out: dict[str, list] = {
        "segment": [], "sink": [], "ok": [], "error": [],
        "rows": [], "bytes": [],
    }
    for src, sinks in zip(
        batch["path"].to_pylist(), batch["sinks"].to_pylist()
    ):
        base = os.path.basename(src)
        try:
            if src.endswith(".parquet"):
                with open(src, "rb") as f:
                    data = f.read()
                rows = pq.ParquetFile(pa.BufferReader(data)).metadata.num_rows
                dst_base = base
            else:
                from pyarrow import json as pajson

                table = pajson.read_json(src)
                want = _segment_schema(src)
                table = table.select(want.names).cast(want)
                buf = pa.BufferOutputStream()
                pq.write_table(table, buf)
                data = buf.getvalue().to_pybytes()
                rows = table.num_rows
                dst_base = base + ".parquet"
        except Exception as ex:  # source unreadable: every sink's row fails
            for sink in sinks:
                out["segment"].append(base)
                out["sink"].append(sink)
                out["ok"].append(False)
                out["error"].append(f"{type(ex).__name__}: {ex}")
                out["rows"].append(0)
                out["bytes"].append(0)
            continue
        for sink in sinks:
            try:
                dst = os.path.join(sink, dst_base)
                tmp = f"{dst}.staged-{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, dst)
                out["ok"].append(True)
                out["error"].append("")
                out["rows"].append(rows)
                out["bytes"].append(len(data))
            except Exception as ex:
                out["ok"].append(False)
                out["error"].append(f"{type(ex).__name__}: {ex}")
                out["rows"].append(0)
                out["bytes"].append(0)
            out["segment"].append(base)
            out["sink"].append(sink)
    return pa.table(
        {
            "segment": pa.array(out["segment"], pa.string()),
            "sink": pa.array(out["sink"], pa.string()),
            "ok": pa.array(out["ok"], pa.bool_()),
            "error": pa.array(out["error"], pa.string()),
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
    others still publish; a partially-failed sink keeps the segments that
    DID land in its watermark so the retry forwards only the remainder.
    ``pending_upstream`` counts binlog segments the lake has NOT applied
    yet (never forwarded — the replica cannot get ahead of the
    publisher). Raises if ``lake_root`` holds no committed lake (a typo'd
    path must not silently read as an empty lake)."""
    import contextlib

    import ray.data as rd

    from .cdc import list_segments

    if isinstance(sinks, str):
        sinks = [sinks]
    if isinstance(binlog_dir, str):
        binlog_dir = [binlog_dir]
    if not os.path.exists(os.path.join(lake_root, "_manifest.json")):
        raise FileNotFoundError(
            f"no committed lake at {lake_root!r} (missing _manifest.json) — "
            "nothing to publish; check the path"
        )
    applied = Lake(lake_root).applied_segments()
    # fan-in parity with the apply path (S4): the lake may have consumed
    # several source dirs; forward from all of them, name-ordered. The
    # lake keys applied-ness by basename, so a basename seen in two dirs
    # is the same logical segment — forward the first occurrence only.
    seen: set[str] = set()
    all_segs, eligible = [], []
    for p in sorted(
        (p for d in binlog_dir for p in list_segments(d)),
        key=os.path.basename,
    ):
        base = os.path.basename(p)
        if base in seen:
            continue
        seen.add(base)
        all_segs.append(p)
        if base in applied:
            eligible.append(p)

    results: dict[str, Any] = {}
    live: list[str] = []  # sinks whose lock+marker setup succeeded
    need: dict[str, set[str]] = {}  # sink -> source basenames still to send
    done: dict[str, set[str]] = {}
    with contextlib.ExitStack() as stack:
        for sink in sinks:
            try:
                os.makedirs(sink, exist_ok=True)
                stack.enter_context(dir_writer_lock(sink, "publish sink"))
                # sweep staged orphans a crashed prior publish left behind
                for orphan in glob.glob(os.path.join(sink, "*.staged-*")):
                    os.remove(orphan)
                done[sink] = _published_set(sink)
                need[sink] = {
                    os.path.basename(p)
                    for p in eligible
                    if os.path.basename(p) not in done[sink]
                }
                live.append(sink)
            except Exception as ex:  # per-sink isolation (reference parity)
                results[sink] = {
                    "ok": False, "error": f"{type(ex).__name__}: {ex}"
                }

        # destination-collision guard: distinct SOURCE basenames that map
        # to the same sink name (only possible for pathological pairs like
        # x.jsonl + x.jsonl.parquet now that JSONL appends rather than
        # swaps its extension) would silently overwrite each other AND
        # both enter the exactly-once marker — fail every member of such
        # a group loudly instead of publishing any of them
        def _dst(base: str) -> str:
            return base if base.endswith(".parquet") else base + ".parquet"

        by_dst: dict[str, list[str]] = {}
        for p in eligible:
            by_dst.setdefault(_dst(os.path.basename(p)), []).append(
                os.path.basename(p)
            )
        collided = {
            b for bases in by_dst.values() if len(bases) > 1 for b in bases
        }

        # one forward task per segment, fanned to every sink needing it;
        # the stats collect is O(#segments × #sinks) rows — bounded
        # bookkeeping, not data
        items = [
            {"path": p, "sinks": [s for s in live
                                  if os.path.basename(p) in need[s]]}
            for p in eligible
            if os.path.basename(p) not in collided
            and any(os.path.basename(p) in need[s] for s in live)
        ]
        rows_by_sink: dict[str, list[dict]] = {s: [] for s in live}
        run_error = None
        if items:
            try:
                summary = rd.from_items(items).map_batches(
                    _forward_batch, batch_size=1, batch_format="pyarrow"
                ).take_all()
                for r in summary:
                    rows_by_sink[r["sink"]].append(r)
            except Exception as ex:  # catastrophic run failure: no marker
                run_error = f"{type(ex).__name__}: {ex}"  # updates — retry
        for sink in live:  # collided segments fail per-sink, never publish
            for base in sorted(collided & need[sink]):
                rows_by_sink[sink].append({
                    "segment": base, "sink": sink, "ok": False,
                    "error": (
                        "destination collision: "
                        + " + ".join(sorted(by_dst[_dst(base)]))
                        + f" all publish to {_dst(base)!r} — rename the "
                        "source segments"
                    ),
                    "rows": 0, "bytes": 0,
                })
        for sink in live:
            if run_error is not None:
                results[sink] = {"ok": False, "error": run_error}
                continue
            rows = rows_by_sink[sink]
            good = [r for r in rows if r["ok"]]
            bad = [r for r in rows if not r["ok"]]
            if good:  # partial progress survives: retry sends the rest
                _write_published(
                    sink, done[sink] | {r["segment"] for r in good}
                )
            results[sink] = {
                "ok": not bad,
                "published": len(good),
                "total": len(done[sink]) + len(good),
                "rows": int(sum(r["rows"] for r in good)),
                "bytes": int(sum(r["bytes"] for r in good)),
            }
            if bad:
                results[sink]["failed"] = len(bad)
                results[sink]["error"] = bad[0]["error"]
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
