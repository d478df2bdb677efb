"""Registry cost guard (the round-3 regression class: a query too slow for
the driver's correctness snapshot to cover it must fail CI, not silently
drop out of the checked set).

The FULL-suite guard lives in scripts/check_contract.py: every registered
query slower than NDP_MAX_QUERY_SECONDS (default 10 s) at sf0.01 on its
16-CPU session is a failure even when correct. This test mirrors it for the
historically heaviest registry entries so plain pytest trips too — under
the 4-CPU test session the budget is scaled ~3x."""

import time

import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
BUDGET_SECONDS = 30  # ~10 s at check_contract's 16 CPUs, 3x for 4 CPUs

# the queries that have historically dominated suite cost (r3: curated_corpus
# 30.6 s, dedup_clusters ~20 s before the fast paths landed)
HEAVIEST = [
    "incremental_curation",
    "curated_corpus_trimmed",
    "dedup_clusters",
]


@pytest.mark.parametrize("name", HEAVIEST)
def test_heaviest_queries_stay_within_budget(ray_session, name):
    qs = entrymod.queries()
    t0 = time.time()
    import pandas as pd

    res = qs[name](SF)
    n = len(res) if isinstance(res, pd.DataFrame) else res.count()
    elapsed = time.time() - t0
    assert n > 0
    assert elapsed < BUDGET_SECONDS, (
        f"{name} took {elapsed:.1f}s at sf0.01 (budget {BUDGET_SECONDS}s on "
        "4 CPUs) — the driver's correctness snapshot will start skipping "
        "queries again; make it cheaper or split it"
    )
