"""Analytics operators vs the DuckDB oracle — the same comparison the driver
makes (row count + sorted-column value equality), at sf0.001 for speed."""

import duckdb
import pandas as pd
import pytest

import nostr_data_pipeline_ray.pipelines.analytics as an

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = con.execute(sql).df()
    con.close()
    return out


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _ray_result(name: str) -> pd.DataFrame:
    res = getattr(an, f"q_{name}")(SF_DIR)
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", sorted(an.ORACLE))
def test_query_matches_oracle(name):
    got = _normalize(_ray_result(name))
    want = _normalize(_oracle(an.ORACLE[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
