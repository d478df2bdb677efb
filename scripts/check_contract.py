"""Simulate the driver's correctness gate: run every queries() entry at
sf0.01 and compare to oracle_sql() via DuckDB (row count + sorted-column
order-insensitive value equality). Owns its Ray session (do not run under
an existing one).

Also enforces the registry's COST guard: a query slower than
``MAX_QUERY_SECONDS`` at sf0.01 is a failure even when correct — the round-3
regression class where the suite grew too slow for the driver's snapshot to
cover it must not silently return (override: env NDP_MAX_QUERY_SECONDS;
pytest mirrors the threshold in tests/test_skew_and_cli.py)."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd
import ray

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
MAX_QUERY_SECONDS = float(__import__("os").environ.get("NDP_MAX_QUERY_SECONDS", "10"))


def host_tax() -> float:
    """Current host slowness vs a quiet boot, measured by the same
    microbenchmark BASELINE.md used to isolate this VM's first-touch
    page-fault tax (a 200 MB copy: ~0.08 s quiet, >1 s in a fault window).
    The cost guard exists to catch CODE cost regressions; scaling its
    threshold by the measured tax (capped 4x so a real regression still
    trips) keeps it from flagging queries that re-run fast on quiet
    boots. The factor is printed so a scaled pass is visible, never
    silent."""
    import numpy as np

    a = np.ones(25_000_000)
    t0 = time.time()
    a.copy()
    return min(4.0, max(1.0, (time.time() - t0) / 0.10))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Queries whose SECOND run is an intentional no-op or fixture-cached pass
# (manifest-committed lake replays, the published-marker no-op, the
# memoized steady-state epoch fixtures): their retry is structurally
# cheap, so a real first-run cost regression would always be excused as
# "host noise". For these the first (tax-scaled) measurement is final —
# no retry escape.
RETRY_BLIND = {
    "cdc_apply", "cdc_apply_delta", "publish_changelog",
    "incremental_curation_epoch", "incremental_curation_embedding_epoch",
}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    t0 = time.time()
    res = e.entry()
    n = res.count() if hasattr(res, "count") and not isinstance(res, pd.DataFrame) else len(res)
    print(f"entry(): {n} rows in {time.time()-t0:.1f}s | schema: "
          f"{sorted(res.schema().names) if hasattr(res, 'schema') else sorted(res.columns)}")

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    tax = host_tax()
    budget = MAX_QUERY_SECONDS * tax
    print(f"cost guard: {MAX_QUERY_SECONDS:.0f}s base × host tax {tax:.2f} "
          f"= {budget:.1f}s effective")

    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        engine_s = None  # engine query + collect only — the cost guard's
        try:                # subject; oracle SQL + compare are excluded
            got = fn(SF_DIR)
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            engine_s = time.time() - t0
            status, detail = "ROWS_ONLY", f"{len(got)} rows"
            if name in oracles:
                want = con.execute(oracles[name]).df()
                g, w = normalize(got), normalize(want)
                if list(g.columns) != list(w.columns):
                    status, detail = "FAIL", f"columns {list(g.columns)} != {list(w.columns)}"
                elif len(g) != len(w):
                    status, detail = "FAIL", f"rows {len(g)} != {len(w)}"
                else:
                    try:
                        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
                        status, detail = "OK", f"{len(g)} rows"
                    except AssertionError as ex:
                        status, detail = "FAIL", str(ex).splitlines()[0]
        except Exception as ex:  # noqa: BLE001
            status, detail = "ERROR", f"{type(ex).__name__}: {ex}"
        elapsed = time.time() - t0
        if (status in ("OK", "ROWS_ONLY") and engine_s is not None
                and engine_s > budget
                and SF_DIR.endswith("0.01")):
            if name in RETRY_BLIND:  # a re-run proves nothing here
                status = "SLOW"
                detail += (f" (> {budget:.1f}s cost guard; retry-blind — "
                           "second runs of this query are no-ops by design)")
                failures.append(name)
                print(f"{status:9s} {name:28s} {elapsed:6.1f}s  {detail}")
                continue
            # one retry before flagging: this host's page-fault-tax windows
            # (documented in BASELINE.md) can hit a contiguous multi-minute
            # slice 2-6x; a query that re-runs fast is host noise, not a
            # cost regression — the guard exists to catch the latter
            t1 = time.time()
            try:
                r2 = fn(SF_DIR)
                (r2.to_pandas() if hasattr(r2, "to_pandas") else r2)
                retry_s = time.time() - t1
            except Exception:  # noqa: BLE001 — keep the first, slow verdict
                retry_s = engine_s
            if retry_s > budget:
                status = "SLOW"
                detail += (f" (> {budget:.1f}s cost guard; "
                           f"retry {retry_s:.1f}s)")
            else:
                detail += (f" (first pass {engine_s:.1f}s > guard, "
                           f"retry {retry_s:.1f}s — host noise)")
        if status in ("FAIL", "ERROR", "SLOW"):
            failures.append(name)
        print(f"{status:9s} {name:28s} {elapsed:6.1f}s  {detail}")

    con.close()
    ray.shutdown()
    print(json.dumps({"failures": failures, "total": len(qs)}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
