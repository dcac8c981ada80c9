"""Driver-style parity check: every queries() entry with an oracle_sql()
runs at sf0.01 and must match DuckDB on row count + order-insensitive
value hash (columns sorted by name, like the driver's compare)."""

import hashlib

import duckdb
import pandas as pd
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = "/root/testdata/sf0.01"


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    canon = canonical(df)
    payload = canon.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(payload).hexdigest()


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _pairs():
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    return sorted(set(qs) & set(oracles))


@pytest.mark.parametrize("name", _pairs())
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    got = to_pandas(e.queries()[name](SF_DIR))
    want = run_oracle(e.oracle_sql()[name])
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    h_got, h_want = value_hash(got), value_hash(want)
    if h_got != h_want:
        g, w = canonical(got), canonical(want)
        diff = (g != w) & ~(g.isna() & w.isna())
        raise AssertionError(
            f"{name}: value hash mismatch\nGOT:\n{g[diff.any(axis=1)].head()}\n"
            f"WANT:\n{w[diff.any(axis=1)].head()}"
        )


def test_every_oracle_has_a_query():
    import __ray_entry__ as e

    assert set(e.oracle_sql()) <= set(e.queries())


def test_rows_only_queries_run(ray_session):
    """Queries with no SQL oracle, at sf0.001 (cheap): they must run and
    return rows. (The dedup families moved to oracle-checked + pinned
    survivor sets in test_regressions, so only the genuinely
    non-SQL-expressible remainder stays here.)"""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    for name in ["knn_ivf", "replay_lineage", "cdc_replay_resume",
                 "bpe_train_merges"]:
        df = to_pandas(e.queries()[name](sf))
        assert len(df) > 0, name
