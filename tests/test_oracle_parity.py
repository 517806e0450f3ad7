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


def test_distinct_users_ignores_null_users(ray_session, tmp_path):
    """Review fix: COUNT(DISTINCT user_id) semantics — null users are not
    distinct values, and their presence must not perturb bucketing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_distinct_users_per_type

    pq.write_table(
        pa.table({
            "event_type": pa.array(["a"] * 6 + ["b"] * 3, pa.string()),
            "user_id": pa.array([1, 2, 2, None, 1, 3, 9, None, 9], pa.int64()),
        }),
        str(tmp_path / "events.parquet"),
    )
    out = q_distinct_users_per_type(str(tmp_path)).sort_values("event_type")
    assert dict(zip(out["event_type"], out["n_users"])) == {"a": 3, "b": 1}


def test_supplier_by_nation_drops_unknown_keys(ray_session, tmp_path):
    """Review fix: inner-join semantics for null/unknown nationkeys."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_supplier_by_nation

    pq.write_table(
        pa.table({
            "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
            "s_nationkey": pa.array([0, None, 99, 0], pa.int64()),
            "s_acctbal": pa.array([10.0, 20.0, 30.0, 5.0], pa.float64()),
        }),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array([0], pa.int64()),
            "n_name": pa.array(["ZERO"], pa.string()),
            "n_regionkey": pa.array([0], pa.int64()),
        }),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table({
            "r_regionkey": pa.array([0], pa.int64()),
            "r_name": pa.array(["R0"], pa.string()),
        }),
        str(tmp_path / "region.parquet"),
    )
    out = q_supplier_by_nation(str(tmp_path))
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["region"], row["nation"], int(row["n_suppliers"]),
            int(row["acctbal_cents"])) == ("R0", "ZERO", 2, 1500)


def test_report_quantiles_shape(ray_session):
    """Rows-only GK report surface: fixed 43-row shape (21 QueryRank
    steps + 20 Histo buckets + 2 Real summary rows), monotone quantile
    values, histogram counts summing to the event total."""
    import __ray_entry__ as e

    out = _to_pandas(e.queries()["slowlog_report_quantiles"](SF_DIR))
    assert list(out.columns) == ["section", "lo", "hi", "value", "n"]
    assert out["section"].value_counts().to_dict() == {
        "quantile": 21, "histo": 20, "real": 2,
    }
    quant = out[out["section"] == "quantile"].sort_values("lo")
    assert (quant["value"].diff().dropna() >= 0).all()
    histo = out[out["section"] == "histo"]
    total = int(out.loc[out["section"] == "real", "n"].iloc[0])
    assert total > 0
    # histo counts come from GK rank estimates (eps=0.01 per boundary,
    # 20 boundaries): within 2*eps*n_buckets of the true total
    assert abs(int(histo["n"].sum()) - total) <= int(0.02 * 20 * total) + 1


def test_customer_order_counts_left_outer_nulls(ray_session, tmp_path):
    """left_outer semantics: customers with no orders survive with
    n_orders=0 (the sf testdata has none, so the NULL fan-in path is only
    exercised here)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_customer_order_counts

    pq.write_table(
        pa.table({
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_mktsegment": pa.array(["A", "A", "B", "B"], pa.string()),
        }),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([10, 11, 12], pa.int64()),
            "o_custkey": pa.array([1, 1, 3], pa.int64()),
        }),
        str(tmp_path / "orders.parquet"),
    )
    out = q_customer_order_counts(str(tmp_path)).set_index("c_mktsegment")
    assert out.loc["A", "n_customers"] == 2
    assert out.loc["A", "n_no_orders"] == 1  # cust 2 has no orders
    assert out.loc["A", "n_orders"] == 2
    assert out.loc["B", "n_no_orders"] == 1  # cust 4
    assert out.loc["B", "n_orders"] == 1


def test_customer_order_counts_empty_orders(ray_session, tmp_path):
    """All-empty join side: the count() guard must skip acero entirely
    (CLAUDE.md join rule 3) and report every customer as zero-order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_customer_order_counts

    pq.write_table(
        pa.table({
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_mktsegment": pa.array(["A", "B"], pa.string()),
        }),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
        }),
        str(tmp_path / "orders.parquet"),
    )
    out = q_customer_order_counts(str(tmp_path)).set_index("c_mktsegment")
    assert int(out["n_customers"].sum()) == 2
    assert int(out["n_no_orders"].sum()) == 2
    assert int(out["n_orders"].sum()) == 0


def test_zscore_degenerate_groups(ray_session, tmp_path):
    """n=1 and constant-valued groups: sd is exactly 0.0 (integer-cents
    moments are exact), no outliers, no NaN leakage."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_events_zscore_outliers

    pq.write_table(
        pa.table({
            "event_type": pa.array(["solo", "flat", "flat", "flat"], pa.string()),
            "value": pa.array([12.34, 5.0, 5.0, 5.0], pa.float64()),
        }),
        str(tmp_path / "events.parquet"),
    )
    out = q_events_zscore_outliers(str(tmp_path)).set_index("event_type")
    assert out.loc["solo", "std_cents"] == 0.0
    assert out.loc["flat", "std_cents"] == 0.0
    assert int(out["n_outliers"].sum()) == 0
    assert not out.isna().any().any()


def test_pivot_missing_type_column(ray_session, tmp_path):
    """A corpus missing some declared pivot types still yields the full
    declared column spec, zero-filled."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_events_pivot_hour_type

    ts = pa.array([3_600_000_000 * 5] * 3, pa.timestamp("us"))
    pq.write_table(
        pa.table({
            "ts": ts,
            "event_type": pa.array(["click", "view", "click"], pa.string()),
        }),
        str(tmp_path / "events.parquet"),
    )
    out = q_events_pivot_hour_type(str(tmp_path))
    assert list(out.columns) == [
        "hod", "n_click", "n_error", "n_purchase", "n_signup", "n_view",
    ]
    assert len(out) == 1 and int(out.loc[0, "hod"]) == 5
    assert int(out.loc[0, "n_click"]) == 2 and int(out.loc[0, "n_view"]) == 1
    assert int(out.loc[0, "n_error"]) == 0 == int(out.loc[0, "n_purchase"])



def test_simhash_oracle_vocab_covers_corpus():
    """The simhash oracle embeds a fixed word->bits table; an
    out-of-vocabulary word in the corpus would silently drop from the
    oracle's inner join while the engine hashes it. Pin coverage at every
    available scale factor."""
    import re

    import pyarrow.parquet as pq

    from mysql_log_parser_ray.training.registry import _SIMHASH_VOCAB

    vocab = set(_SIMHASH_VOCAB)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        t = pq.read_table(path, columns=["text"])
        words = set()
        for s in t["text"].to_pylist():
            words.update(re.split(r"[ \t\n\r\v\f]+", s.lower()))
        words.discard("")
        assert words <= vocab, f"{sf}: out-of-vocab {sorted(words - vocab)[:5]}"
