"""SCD2 version history off the binlog (flagship.cdc_history): oracle
equality on a fresh synthetic stream plus the structural invariants the
hash compare can't articulate — chain linkage, one current version per
surviving key, deleted keys closed, retry duplicates collapsed."""

import duckdb
import pandas as pd

from nostr_data_pipeline_ray.pipelines.cdc import list_segments
from nostr_data_pipeline_ray.pipelines.flagship import (
    cdc_history,
    history_sql_for_files,
)
from nostr_data_pipeline_ray.synth import ChangelogSpec, generate_changelog

SPEC = ChangelogSpec(n_events=8_000, n_convs=250, n_segments=5, seed=23)


def _history(tmp_path) -> tuple[pd.DataFrame, str]:
    binlog = generate_changelog(str(tmp_path / "binlog"), SPEC)
    got = cdc_history(binlog).to_pandas()
    return got, binlog


def test_cdc_history_matches_oracle(tmp_path):
    got, binlog = _history(tmp_path)
    want = duckdb.connect().execute(
        history_sql_for_files(list_segments(binlog))
    ).df()
    key = ["conv_id", "turn_idx", "valid_from_lsn"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) and len(g) > 0
    pd.testing.assert_frame_equal(
        g[sorted(g.columns)], w[sorted(w.columns)],
        check_dtype=False, check_exact=True,
    )


def test_cdc_history_invariants(tmp_path):
    got, binlog = _history(tmp_path)
    con = duckdb.connect()
    segs = ", ".join(f"'{p}'" for p in list_segments(binlog))

    # ≤1 current version per key; a key is current iff it survives the
    # LWW fold (its last event by lsn is not a delete)
    cur = got[got["is_current"]]
    assert not cur.duplicated(["conv_id", "turn_idx"]).any()
    survivors = con.execute(f"""
        SELECT count(*) FROM (
            SELECT conv_id, turn_idx, op
            FROM (SELECT DISTINCT conv_id, turn_idx, op, lsn
                  FROM read_parquet([{segs}], union_by_name=true))
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY lsn DESC, op) = 1
        ) WHERE op != 'delete'
    """).fetchone()[0]
    assert len(cur) == survivors

    # chain linkage: within a key, sorted by valid_from, every closed
    # version's valid_to is ≥ its valid_from and < the next version's
    # valid_from is impossible to violate only when deletes intervene —
    # assert the weaker always-true form: valid_to > valid_from, and the
    # NEXT version starts at or after this version's close
    s = got.sort_values(["conv_id", "turn_idx", "valid_from_lsn"])
    closed = s.dropna(subset=["valid_to_lsn"])
    assert (closed["valid_to_lsn"].astype("int64")
            > closed["valid_from_lsn"]).all()
    nxt_from = s.groupby(["conv_id", "turn_idx"])["valid_from_lsn"].shift(-1)
    m = s["valid_to_lsn"].notna() & nxt_from.notna()
    assert (s.loc[m, "valid_to_lsn"].astype("int64")
            <= nxt_from[m].astype("int64")).all()

    # retry duplicates collapsed: version rows are unique per (key, lsn)
    assert not got.duplicated(["conv_id", "turn_idx", "valid_from_lsn"]).any()
