"""CLI surface — analog of the reference's console script
(reference: src/nostr_pipeline/cli.py:20-284 — run/init-db/stats/trending/
top-zapped/user/relays/version).

    python -m nostr_data_pipeline_ray apply  --lake DIR --binlog DIR
                                             [--follow --idle-timeout N]
    python -m nostr_data_pipeline_ray synth  --out DIR [--events N ...]
    python -m nostr_data_pipeline_ray stats  --lake DIR
    python -m nostr_data_pipeline_ray query  NAME [--sf DIR]
    python -m nostr_data_pipeline_ray export --lake DIR --out DIR
    python -m nostr_data_pipeline_ray report [--sf DIR]
    python -m nostr_data_pipeline_ray vacuum --lake DIR
    python -m nostr_data_pipeline_ray curate (--sf DIR | --from-lake LAKE
                                             [--benchmark FILE]) --out DIR
                                             [--budget N --jsonl]
    python -m nostr_data_pipeline_ray version

Owns its Ray session (guarded init, shutdown at exit) — library code never
calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _entry_module():
    """Import ``__ray_entry__`` from the repo root (the package's parent
    directory), not the process cwd — ``python -m nostr_data_pipeline_ray
    query ...`` must work from any directory."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    import __ray_entry__ as entrymod

    return entrymod


_RAY_OWNED = False  # True only when the CLI itself started the session


def _ray():
    import ray

    if not ray.is_initialized():
        global _RAY_OWNED
        _RAY_OWNED = True
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_apply(args) -> int:
    _ray()
    from .config import EngineConfig
    from .pipelines.cdc import apply_changelog, follow_changelog

    cfg = EngineConfig.from_env()
    if args.merge_policy or args.cache_mb is not None or args.on_malformed:
        import dataclasses

        repl = {}
        if args.merge_policy:
            repl["merge_policy"] = args.merge_policy
        if args.cache_mb is not None:
            repl["snapshot_cache_mb"] = args.cache_mb
        if args.on_malformed:
            repl["on_malformed"] = args.on_malformed
        cfg = dataclasses.replace(cfg, **repl)

    def publish_sinks(quiet_noop: bool = False):
        if not getattr(args, "publish_sink", None):
            return
        from .pipelines.publish import publish_changelog

        # like the view: a dead sink must not kill the tail loop or mask a
        # committed apply; unpublished segments are retried next pass via
        # the per-sink watermark (this runs on EVERY follow pass — idle
        # ones included — so a backlog left by a briefly-dead sink drains
        # as soon as the sink comes back, not only when new segments land)
        try:
            out = publish_changelog(args.lake, args.binlog, args.publish_sink)
            any_new = any(s.get("published", 0) > 0 or not s["ok"]
                          for s in out["sinks"].values())
            if any_new or not quiet_noop:
                print(json.dumps({"publish": out}), flush=True)
        except Exception as e:  # noqa: BLE001 — reported, not fatal
            print(json.dumps({"publish_error": str(e)}), file=sys.stderr,
                  flush=True)

    def refresh_view():
        if not args.view:
            return
        from .pipelines.ivm import refresh_turn_counts

        # the view is derived state — a failed refresh (full disk, bad dir)
        # must neither kill the always-on follow loop nor mask a lake apply
        # that already committed; the next pass retries from the manifest
        try:
            print(json.dumps({"view": refresh_turn_counts(args.view, args.lake)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — reported, not fatal
            print(json.dumps({"view_error": str(e)}), file=sys.stderr, flush=True)

    if args.follow:
        # always-on tail: SIGTERM/SIGINT request a clean stop at the next
        # epoch boundary (mid-epoch work is re-done idempotently on restart)
        import signal

        stopping = {"flag": False}

        def _request_stop(_sig, _frame):
            stopping["flag"] = True

        signal.signal(signal.SIGTERM, _request_stop)
        signal.signal(signal.SIGINT, _request_stop)
        def on_epoch(r):
            print(json.dumps(r), flush=True)
            refresh_view()  # keep the maintained view current per pass

        out = follow_changelog(
            args.lake,
            args.binlog,
            cfg,
            poll_interval=args.poll_interval,
            idle_timeout=args.idle_timeout,
            stop=lambda: stopping["flag"],
            on_epoch=on_epoch,
            # relay chain: runs on every pass so an unpublished backlog
            # drains on idle passes too (sink outages retry; no-ops quiet)
            on_pass=lambda _r: publish_sinks(quiet_noop=True),
            compact_after=args.compact_after,
        )
    else:
        out = apply_changelog(args.lake, args.binlog, cfg)
        refresh_view()
        publish_sinks()
    print(json.dumps(out))
    return 0


def cmd_synth(args) -> int:
    from .synth import ChangelogSpec, generate_changelog

    spec = ChangelogSpec(
        n_events=args.events, n_convs=args.convs, n_segments=args.segments,
        seed=args.seed, evolve=args.evolve,
    )
    binlog = generate_changelog(args.out, spec)
    print(json.dumps({"binlog": binlog, "spec": spec.cache_key()}))
    return 0


def cmd_stats(args) -> int:
    from .state.lake import Lake

    lake = Lake(args.lake)
    if getattr(args, "as_of", None) is not None:
        try:
            m = lake.manifest_at(args.as_of)  # time travel: a PAST epoch
        except ValueError as ex:
            print(json.dumps({"error": str(ex)}))
            return 1
    else:
        m = lake.current_manifest()
    if m is None:
        print(json.dumps({"epoch": None}))
        return 0
    deltas = m.get("deltas", {})
    print(
        json.dumps(
            {
                "epoch": m["epoch"],
                "partitions": len(m["files"]),
                "segments_applied": len(m["applied_segments"]),
                "watermark_min": min(m["watermarks"].values(), default=None),
                "watermark_max": max(m["watermarks"].values(), default=None),
                "pending_delta_parts": sum(len(v) for v in deltas.values()),
                "max_delta_depth": max((len(v) for v in deltas.values()), default=0),
                "stats": m.get("stats", {}),
            }
        )
    )
    return 0


def cmd_query(args) -> int:
    _ray()
    entrymod = _entry_module()

    qs = entrymod.queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; available: {sorted(qs)}", file=sys.stderr)
        return 2
    res = qs[args.name](args.sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    print(df.head(args.limit).to_string())
    print(f"... {len(df)} rows")
    return 0


def cmd_report(args) -> int:
    """Analog of the reference's Streamlit dashboard Home/Trending/Users
    pages (reference: dashboard/ — 6 Streamlit pages over the same
    aggregates): one composed snapshot rendered to the terminal, or — with
    --html PATH — as a self-contained HTML dashboard with inline SVG charts
    (stat tiles, trending/top-user bars, hourly columns, signup line,
    partition-health meters)."""
    _ray()
    entrymod = _entry_module()

    qs = entrymod.queries()
    if getattr(args, "html", None):
        from .report import render_html

        doc = render_html(args.sf, qs)
        with open(args.html, "w") as f:
            f.write(doc)
        print(json.dumps({"html": args.html, "bytes": len(doc)}))
        return 0

    def df(name):
        r = qs[name](args.sf)
        return r.to_pandas() if hasattr(r, "to_pandas") else r

    net = df("network_stats").iloc[0]
    print("== network snapshot ==")
    for k, v in net.items():
        print(f"  {k:16s} {v}")

    trend = df("trending_words").sort_values(
        ["trend_score", "word"], ascending=[False, True]
    ).head(10)
    print("\n== trending topics (top 10) ==")
    print(trend.to_string(index=False))

    users = df("top_users_by_value")
    print("\n== top users by value ==")
    print(users.to_string(index=False))

    growth = df("daily_signup_growth").tail(7)
    print("\n== signups (last 7 days) ==")
    print(growth.to_string(index=False))

    health = df("lake_health").sort_values("health").head(5)
    print("\n== lake partition health (worst 5, F4 analog) ==")
    print(health.to_string(index=False))
    return 0


def cmd_export(args) -> int:
    _ray()
    from .pipelines.cdc import export_snapshot

    out = export_snapshot(args.lake, args.out, force=args.force)
    print(json.dumps(out))
    return 0


def cmd_publish(args) -> int:
    _ray()
    from .pipelines.publish import publish_changelog

    out = publish_changelog(args.lake, args.binlog, args.sink)
    print(json.dumps(out))
    return 0 if all(s["ok"] for s in out["sinks"].values()) else 1


def cmd_vacuum(args) -> int:
    from .state.lake import Lake

    removed = Lake(args.lake).vacuum()
    print(json.dumps({"removed": len(removed)}))
    return 0


def cmd_fsck(args) -> int:
    from .state.fsck import check_lake, repair_sidecars

    # sidecar stores audit alongside the lake: the persisted near-dup /
    # ANN indexes and the incremental curator carry their own manifests.
    # fsck is read-only: the constructors CREATE a fresh store when meta is
    # absent, so a mistyped/lost path must be an error here, never a
    # silently-healthy empty index.
    if args.deep or (args.repair and args.lake):
        _ray()  # deep scans / sidecar rebuilds are Ray Data jobs

    def _open_store(cls, path, label, inner=None):
        # ``inner`` = (subdir, meta-name) of a store the class OWNS: its
        # constructor would silently re-create a lost inner index, whose
        # fsck then trivially passes (0 rows == 0 vecs) — check it exists
        # BEFORE constructing, same as the outer meta.
        missing = []
        if not os.path.exists(os.path.join(path, cls.META)):
            missing.append(cls.META)
        if inner and not os.path.exists(os.path.join(path, *inner)):
            missing.append(os.path.join(*inner))
        if missing:
            return {"ok": False,
                    "errors": [f"no {label} at {path}: missing {m}"
                               for m in missing]}
        return cls(path).fsck(deep=getattr(args, "deep", False))

    extra_ok = True
    extras = {}
    if getattr(args, "neardup_index", None):
        from .pipelines.dedup_index import MinHashIndex

        extras["neardup_index"] = _open_store(
            MinHashIndex, args.neardup_index, "near-dup index")
    if getattr(args, "ann_index", None):
        from .pipelines.ann_index import IvfIndex

        extras["ann_index"] = _open_store(IvfIndex, args.ann_index, "ann index")
    if getattr(args, "curator", None):
        from .pipelines.curate_index import IncrementalCurator

        from .pipelines.dedup_index import MinHashIndex as _MHI

        extras["curator"] = _open_store(
            IncrementalCurator, args.curator, "curator",
            inner=("neardup_index", _MHI.META))
    if getattr(args, "emb_curator", None):
        from .pipelines.curate_index import EmbeddingCurator

        from .pipelines.ann_index import IvfIndex as _IVF

        extras["emb_curator"] = _open_store(
            EmbeddingCurator, args.emb_curator, "embedding curator",
            inner=("ann_index", _IVF.META))
    extra_ok = all(v["ok"] for v in extras.values())

    if not args.lake:
        if not extras:
            print("fsck: one of --lake / --neardup-index / --ann-index / "
                  "--curator / --emb-curator is required", file=sys.stderr)
            return 2
        print(json.dumps(extras, indent=2))
        return 0 if extra_ok else 1

    if args.repair:
        rebuilt = repair_sidecars(args.lake)
        print(json.dumps({"sidecars_rebuilt": rebuilt}))
    report = check_lake(args.lake, deep=args.deep)
    if extras:
        report = {**report, "stores": extras}
    print(json.dumps(report, indent=2))
    return 0 if report["ok"] and extra_ok else 1


def cmd_curate(args) -> int:
    """Composed training-data chain: dedup survivors → decontaminate →
    p75 quality cut → write curated.parquet + packed training sequences.
    ``--from-lake`` feeds the chain from an applied CDC lake instead of a
    documents fixture (one document per conversation)."""
    _ray()
    if args.from_lake and args.incremental:
        # the standing loop: one exactly-once curator epoch per applied
        # lake epoch, keyed on the lake's manifest epoch + watermarks
        from .pipelines.lake_docs import curate_epoch_from_lake

        print(json.dumps(curate_epoch_from_lake(
            args.from_lake, args.incremental, benchmark=args.benchmark
        )))
        return 0
    if args.incremental:
        print("curate: --incremental requires --from-lake", file=sys.stderr)
        return 2
    if not args.out:
        print("curate: --out is required (batch chain)", file=sys.stderr)
        return 2
    if args.from_lake:
        from .pipelines.lake_docs import curate_from_lake

        print(
            json.dumps(
                curate_from_lake(
                    args.from_lake,
                    args.out,
                    benchmark=args.benchmark,
                    budget=args.budget,
                    jsonl=args.jsonl,
                    plus=args.plus,
                    trim=args.trim,
                )
            )
        )
        return 0
    if not args.sf:
        print("curate: one of --sf / --from-lake is required", file=sys.stderr)
        return 2
    from .pipelines.curate import curate_corpus

    print(json.dumps(curate_corpus(args.sf, args.out, budget=args.budget,
                                   jsonl=args.jsonl, plus=args.plus,
                                   trim=args.trim)))
    return 0


def cmd_version(_args) -> int:
    from . import __version__

    print(__version__)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="nostr_data_pipeline_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("apply", help="tail a binlog dir into a lake (resumable)")
    a.add_argument("--lake", required=True)
    a.add_argument("--binlog", required=True)
    a.add_argument("--follow", action="store_true",
                   help="keep polling for new segments (SIGTERM stops cleanly)")
    a.add_argument("--poll-interval", type=float, default=1.0)
    a.add_argument("--idle-timeout", type=float, default=None,
                   help="exit after this many idle seconds (default: run forever)")
    a.add_argument("--compact-after", type=int, default=None,
                   help="(delta policy) compact when a partition has this many pending deltas")
    a.add_argument("--cache-mb", type=int, default=None, metavar="MB",
                   help="per-merge-actor snapshot cache for --follow "
                        "(rewrite policy): keeps each partition's base part "
                        "in actor memory between epochs (0 = off)")
    a.add_argument("--merge-policy", choices=["rewrite", "delta"], default=None,
                   help="copy-on-write base rewrite (default) or merge-on-read deltas")
    a.add_argument("--on-malformed", choices=["error", "quarantine"], default=None,
                   help="JSONL bad-line policy: fail the apply (default) or "
                        "divert to <lake>/_quarantine/ and keep going")
    a.add_argument("--view", default=None, metavar="DIR",
                   help="maintain the incremental turn-count view here "
                        "(refreshed after each apply / follow pass)")
    a.add_argument("--publish-sink", action="append", default=None,
                   metavar="DIR",
                   help="republish applied segments to this sink dir after "
                        "each apply / follow pass (repeatable; exactly-once "
                        "per sink — the relay-chain deployment)")
    a.set_defaults(fn=cmd_apply)

    s = sub.add_parser("synth", help="generate a deterministic changelog")
    s.add_argument("--out", required=True)
    s.add_argument("--events", type=int, default=100_000)
    s.add_argument("--convs", type=int, default=3_000)
    s.add_argument("--segments", type=int, default=16)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--evolve", action="store_true")
    s.set_defaults(fn=cmd_synth)

    st = sub.add_parser("stats", help="lake manifest summary")
    st.add_argument("--lake", required=True)
    st.add_argument(
        "--as-of", type=int, default=None, dest="as_of",
        help="summarize a PAST committed epoch's manifest (time travel; "
        "valid for the vacuum retention window)",
    )
    st.set_defaults(fn=cmd_stats)

    q = sub.add_parser("query", help="run a registered analytics query")
    q.add_argument("name")
    q.add_argument("--sf", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    rp = sub.add_parser("report", help="composed analytics snapshot (dashboard analog)")
    rp.add_argument("--sf", default="/root/testdata/sf0.01")
    rp.add_argument("--html", default=None, metavar="PATH",
                    help="write a self-contained HTML dashboard instead of text")
    rp.set_defaults(fn=cmd_report)

    ex = sub.add_parser("export", help="export the snapshot as partitioned parquet (resumable)")
    ex.add_argument("--lake", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--force", action="store_true", help="rewrite finished partitions")
    ex.set_defaults(fn=cmd_export)

    pb = sub.add_parser(
        "publish",
        help="forward applied changelog segments to downstream sink dirs "
        "(publish-back; exactly-once per sink, per-sink failure isolation)",
    )
    pb.add_argument("--lake", required=True)
    pb.add_argument("--binlog", required=True)
    pb.add_argument("--sink", action="append", required=True,
                    help="sink directory (repeatable for fan-out)")
    pb.set_defaults(fn=cmd_publish)

    v = sub.add_parser("vacuum", help="delete part files no manifest references")
    v.add_argument("--lake", required=True)
    v.set_defaults(fn=cmd_vacuum)

    fs = sub.add_parser("fsck", help="audit lake integrity (health-check analog)")
    fs.add_argument("--lake")
    fs.add_argument("--deep", action="store_true",
                    help="also scan every part file (parallel Ray job)")
    fs.add_argument("--repair", action="store_true",
                    help="rebuild missing/corrupt bloom sidecars first")
    fs.add_argument("--neardup-index", dest="neardup_index",
                    help="also audit a persisted MinHash near-dup index")
    fs.add_argument("--ann-index", dest="ann_index",
                    help="also audit a persisted IVF ANN index")
    fs.add_argument("--curator", help="also audit an incremental curator")
    fs.add_argument("--emb-curator", dest="emb_curator",
                    help="also audit an incremental embedding curator")
    fs.set_defaults(fn=cmd_fsck)

    cu = sub.add_parser(
        "curate",
        help="dedup + decontaminate + quality-cut a documents table, pack sequences",
    )
    cu.add_argument("--sf", help="directory holding documents.parquet")
    cu.add_argument("--from-lake", dest="from_lake",
                    help="curate an applied CDC lake (one doc per conversation)")
    cu.add_argument("--benchmark",
                    help="documents table whose sub-cutoff rows are the "
                         "held-out set for decontamination (--from-lake only)")
    cu.add_argument("--incremental", metavar="CURATOR_DIR",
                    help="with --from-lake: run ONE incremental-curator "
                         "epoch covering the lake epochs applied since the "
                         "curator's last run (exactly-once per lake epoch; "
                         "re-run on an unchanged lake is a no-op)")
    cu.add_argument("--out", required=False,
                    help="output dir (batch chain; not used with --incremental)")
    cu.add_argument("--budget", type=int, default=256, help="tokens per pack")
    cu.add_argument("--jsonl", action="store_true",
                    help="also write curated.jsonl/ (newline-delimited JSON)")
    cu.add_argument("--plus", action="store_true",
                    help="extended chain: add the repetition cut (stage 4)")
    cu.add_argument("--trim", action="store_true",
                    help="five-stage chain (implies --plus semantics): also "
                         "cut duplicated 5-gram spans within the survivors "
                         "(ExactSubstr) — curated text is the trimmed text")
    cu.set_defaults(fn=cmd_curate)

    ver = sub.add_parser("version")
    ver.set_defaults(fn=cmd_version)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        # only tear down a session this CLI started — main() is also
        # callable in-process (tests, notebooks) under a caller-owned Ray.
        # Reset the flag so a LATER in-process main() call doesn't tear
        # down a session the caller started between calls.
        global _RAY_OWNED
        if _RAY_OWNED and ray.is_initialized():
            ray.shutdown()
        _RAY_OWNED = False


if __name__ == "__main__":
    sys.exit(main())
