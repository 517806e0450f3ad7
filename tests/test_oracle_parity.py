"""Driver-simulation: run each queries() entry at sf0.01 and compare with
its oracle_sql() via DuckDB - row count, schema (column names), and sorted
value equality. This is a local replica of the correctness gate."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not available"
)


def _to_pandas(obj):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(obj, rd.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def _query_names():
    import __ray_entry__ as e

    return sorted(set(e.queries()) & set(e.oracle_sql()))


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, con, contract):
    queries, oracles = contract
    got_raw = _to_pandas(queries[name](SF_DIR))
    want_raw = con.sql(oracles[name]).arrow().to_pandas()
    # Driver-faithful dtype check: the driver hashes arrow values WITHOUT
    # normalization, so a DuckDB HUGEINT (decimal128) vs engine int64 is a
    # hash mismatch even when values are equal. Oracle SQL must CAST.
    got_dt = [str(got_raw[c].dtype) for c in sorted(got_raw.columns)]
    want_dt = [str(want_raw[c].dtype) for c in sorted(want_raw.columns)]
    assert got_dt == want_dt, (
        f"{name}: dtype mismatch (add CAST in oracle_sql): "
        f"engine {got_dt} != oracle {want_dt}"
    )
    got = _normalize(got_raw)
    want = _normalize(want_raw)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        if got[c].dtype == np.float64:
            assert np.allclose(got[c], want[c], rtol=0, atol=0), (
                f"{name}.{c} float mismatch\n{got[c].head()}\n{want[c].head()}"
            )
        else:
            mismatch = got[c] != want[c]
            assert not mismatch.any(), (
                f"{name}.{c} mismatch at rows {np.where(mismatch)[0][:5]}:\n"
                f"got {got[c][mismatch].head()}\nwant {want[c][mismatch].head()}"
            )


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    out = _to_pandas(e.entry())
    assert len(out) >= 1
    assert "class_id" in out.columns


def test_queries_oracle_keys_consistent():
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q), "oracle_sql keys must be a subset of queries"
