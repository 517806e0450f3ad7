"""Invariant unit tests for the eighth relational wave: TPC-H Q13/Q19/Q21
shapes. Exact-value parity vs DuckDB is covered by
tests/test_oracle_parity.py; these pin the crafted-fixture semantics
(zero-order customers, OR-disjunct bands, single-late-supplier rule) that
parity alone would not explain on a regression."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def _write_orders(path, rows):
    """rows: list of (orderkey, custkey, status, orderdate)."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
                "o_orderdate": pa.array(
                    [pd.Timestamp(r[3]) for r in rows], pa.timestamp("us")
                ),
            }
        ),
        os.path.join(path, "orders.parquet"),
    )


def _write_lineitem(path, rows):
    """rows: list of (orderkey, suppkey, partkey, qty, price, disc, ship)."""
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_quantity": pa.array([float(r[3]) for r in rows],
                                       pa.float64()),
                "l_extendedprice": pa.array([float(r[4]) for r in rows],
                                            pa.float64()),
                "l_discount": pa.array([float(r[5]) for r in rows],
                                       pa.float64()),
                "l_shipdate": pa.array(
                    [pd.Timestamp(r[6]) for r in rows], pa.timestamp("us")
                ),
            }
        ),
        os.path.join(path, "lineitem.parquet"),
    )


def test_q13_includes_zero_order_customers(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q13_custdist

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    # cust 1 -> 2 orders, cust 2 -> 1 order, custs 3/4 -> none
    _write_orders(
        str(tmp_path),
        [(10, 1, "O", "1996-01-01"), (11, 1, "O", "1996-01-02"),
         (12, 2, "O", "1996-01-03")],
    )
    out = q_tpch_q13_custdist(str(tmp_path))
    assert out["c_count"].tolist() == [0, 1, 2]
    assert out["custdist"].tolist() == [2, 1, 1]


def test_q19_or_disjunct_bands(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q19_discount

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
                "p_brand": pa.array(
                    ["Brand#12", "Brand#23", "Brand#34", "Brand#99"],
                    pa.string(),
                ),
                "p_size": pa.array([3, 10, 20, 5], pa.int32()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    _write_lineitem(
        str(tmp_path),
        [
            # part 1 (Brand#12 size 3): qty 5 in [1,11] -> qualifies
            (1, 1, 1, 5, 100.0, 0.10, "1996-01-01"),
            # part 1: qty 20 out of [1,11] -> no
            (2, 1, 1, 20, 999.0, 0.0, "1996-01-01"),
            # part 2 (Brand#23 size 10): qty 15 in [10,20] -> qualifies
            (3, 1, 2, 15, 200.0, 0.0, "1996-01-01"),
            # part 3 (Brand#34 size 20): size out of [1,15] -> no
            (4, 1, 3, 25, 999.0, 0.0, "1996-01-01"),
            # part 4 (other brand) -> no
            (5, 1, 4, 5, 999.0, 0.0, "1996-01-01"),
        ],
    )
    out = q_tpch_q19_discount(str(tmp_path))
    assert out["n_lines"].iloc[0] == 2
    # 100*(1-0.10)=90.00 -> 9000 cents; 200*(1-0)=200.00 -> 20000 cents
    assert out["revenue_cents"].iloc[0] == 29000


def test_q21_single_late_supplier_rule(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q21_waiting

    _write_orders(
        str(tmp_path),
        [
            (101, 1, "F", "1996-01-01"),  # supp 1 late, supp 2 ok -> counts
            (102, 1, "F", "1996-01-01"),  # both late -> nobody counts
            (103, 1, "F", "1996-01-01"),  # single supplier -> no
            (104, 1, "O", "1996-01-01"),  # status O -> excluded
        ],
    )
    _write_lineitem(
        str(tmp_path),
        [
            # order 101: supp 1 has an early AND a late line (max-ship wins)
            (101, 1, 1, 1, 1.0, 0.0, "1996-01-10"),
            (101, 1, 1, 1, 1.0, 0.0, "1996-05-01"),
            (101, 2, 1, 1, 1.0, 0.0, "1996-01-15"),
            # order 102: two late suppliers
            (102, 1, 1, 1, 1.0, 0.0, "1996-06-01"),
            (102, 3, 1, 1, 1.0, 0.0, "1996-06-01"),
            # order 103: one supplier, late
            (103, 3, 1, 1, 1.0, 0.0, "1996-06-01"),
            # order 104: late but order not 'F'
            (104, 4, 1, 1, 1.0, 0.0, "1996-06-01"),
            (104, 5, 1, 1, 1.0, 0.0, "1996-01-05"),
        ],
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "s_name": pa.array([f"s{i}" for i in range(1, 6)],
                                   pa.string()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = q_tpch_q21_waiting(str(tmp_path))
    assert out["s_suppkey"].tolist() == [1]
    assert out["s_name"].tolist() == ["s1"]
    assert out["numwait"].tolist() == [1]


def _write_events(path, rows):
    """rows: list of (event_id, user_id, event_type, ts)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array([pd.Timestamp(r[3]) for r in rows],
                               pa.timestamp("us")),
            }
        ),
        os.path.join(path, "events.parquet"),
    )


def test_longest_streak_gaps_and_daydup(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_user_longest_streak

    _write_events(
        str(tmp_path),
        [
            # user 1: days 1,2,3 then gap then 5 -> longest 3
            (1, 1, "a", "2024-01-01"), (2, 1, "a", "2024-01-02"),
            (3, 1, "a", "2024-01-03"), (4, 1, "a", "2024-01-05"),
            # two events same day must dedup (no fake streak boost)
            (5, 1, "a", "2024-01-05 23:59:59"),
            # user 2: single day -> streak 1
            (6, 2, "a", "2024-01-10"),
            # user 3: days 7,8 -> streak 2
            (7, 3, "a", "2024-01-07"), (8, 3, "a", "2024-01-08"),
        ],
    )
    out = q_user_longest_streak(str(tmp_path))
    assert out["streak_days"].tolist() == [1, 2, 3]
    assert out["n_users"].tolist() == [1, 1, 1]


def test_json_roundtrip_idempotent(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_events_json_source

    _write_events(
        str(tmp_path),
        [(1, 10, "view", "2024-01-01"), (2, 20, "click", "2024-01-02"),
         (3, 30, "view", "2024-01-03")],
    )
    a1 = q_events_json_source(str(tmp_path))
    a2 = q_events_json_source(str(tmp_path))  # second run reuses shards
    assert a1.equals(a2)
    assert a1.set_index("event_type")["n_rows"].to_dict() == {
        "view": 2, "click": 1,
    }
    assert a1.set_index("event_type")["sum_user_id"].to_dict() == {
        "view": 40, "click": 20,
    }


def test_stopword_trim_majority_threshold(ray_session, tmp_path):
    from mysql_log_parser_ray.training.registry import q_docs_stopword_trim

    # "the" in 3/4 docs (2*3 > 4 -> stop); "data" in exactly 2/4
    # (2*2 = 4, NOT > 4 -> kept); others rare
    docs = [
        (1, "the data pipeline", "a"),
        (2, "the data engine", "a"),
        (3, "the ray cluster", "b"),
        (4, "arrow blocks stream", "b"),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
                "source": pa.array([d[2] for d in docs], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_docs_stopword_trim(str(tmp_path))
    assert out["source"].tolist() == ["a", "b"]
    assert out["n_stopwords"].tolist() == [1, 1]  # just "the"
    # source a: 6 tokens, 2 "the" removed; source b: 6 tokens, 1 removed
    assert out["n_docs"].tolist() == [2, 2]
    assert out["removed_tokens"].tolist() == [2, 1]
    assert out["kept_tokens"].tolist() == [4, 5]


def test_embed_cov_diag_matches_moments(ray_session):
    from mysql_log_parser_ray.pipelines.queries import (
        q_embed_cov_matrix,
        q_embed_dim_moments,
    )

    cov = q_embed_cov_matrix(SF)
    mom = q_embed_dim_moments(SF)
    diag = cov[cov["dim_i"] == cov["dim_j"]].set_index("dim_i")
    assert (
        diag["sum_prod_units"].to_dict()
        == mom.set_index("dim")["sumsq_units"].to_dict()
    )
    # symmetry of the construction: only upper triangle emitted
    assert (cov["dim_j"] >= cov["dim_i"]).all()
    assert len(cov) == 64 * 65 // 2


def test_q7_cross_nation_and_year_window(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q7_volume

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": pa.array(["N_A", "N_B"], pa.string()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_nationkey": pa.array([0, 1], pa.int32()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10, 20], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int32()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    _write_orders(
        str(tmp_path),
        [(100, 10, "O", "1996-01-01"), (200, 20, "O", "1996-01-01")],
    )
    _write_lineitem(
        str(tmp_path),
        [
            # supp 1 (N_A) -> order 200 (cust N_B): cross, 1996
            (200, 1, 1, 1, 100.0, 0.0, "1996-03-01"),
            # supp 2 (N_B) -> order 100 (cust N_A): cross, 1997
            (100, 2, 1, 1, 50.0, 0.0, "1997-03-01"),
            # supp 1 -> order 100 (cust N_A): SAME nation -> excluded
            (100, 1, 1, 1, 999.0, 0.0, "1996-03-01"),
            # cross but outside the [1996, 1998) ship window -> excluded
            (200, 1, 1, 1, 999.0, 0.0, "1998-01-01"),
        ],
    )
    out = q_tpch_q7_volume(str(tmp_path))
    assert out[["supp_nation", "cust_nation", "l_year"]].values.tolist() == [
        ["N_A", "N_B", 1996], ["N_B", "N_A", 1997],
    ]
    assert out["revenue_cents"].tolist() == [10000, 5000]
    assert out["n_lines"].tolist() == [1, 1]


def test_q8_share_type_filter_and_year_window(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q8_market_share

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
            }
        ),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([2, 3], pa.int32()),
                "n_name": pa.array(["NATION_2", "NATION_3"], pa.string()),
                "n_regionkey": pa.array([0, 1], pa.int32()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10, 20], pa.int64()),
                # cust 10 in ASIA, cust 20 in EUROPE (excluded)
                "c_nationkey": pa.array([2, 3], pa.int32()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                # supp 1 is the target nation, supp 2 is not
                "s_nationkey": pa.array([2, 3], pa.int32()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_type": pa.array(["PROMO", "LARGE"], pa.string()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    _write_orders(
        str(tmp_path),
        [
            (100, 10, "O", "1995-06-01"),   # in window, ASIA customer
            (200, 20, "O", "1995-06-01"),   # EUROPE customer -> excluded
            (300, 10, "O", "1997-06-01"),   # outside [1995,1997) window
        ],
    )
    _write_lineitem(
        str(tmp_path),
        [
            # order 100: target-nation PROMO 100.00 + other-nation PROMO
            # 300.00 -> share 0.25
            (100, 1, 1, 1, 100.0, 0.0, "1995-07-01"),
            (100, 2, 1, 1, 300.0, 0.0, "1995-07-01"),
            # non-PROMO part -> excluded from both sums
            (100, 1, 2, 1, 999.0, 0.0, "1995-07-01"),
            # excluded orders
            (200, 1, 1, 1, 999.0, 0.0, "1995-07-01"),
            (300, 1, 1, 1, 999.0, 0.0, "1997-07-01"),
        ],
    )
    out = q_tpch_q8_market_share(str(tmp_path))
    assert out["o_year"].tolist() == [1995]
    assert out["n_lines"].tolist() == [2]
    assert out["total_cents"].tolist() == [40000]
    assert out["nation_cents"].tolist() == [10000]
    assert out["mkt_share"].tolist() == [0.25]


def test_unigram_surprisal_bins(ray_session, tmp_path):
    import numpy as np

    from mysql_log_parser_ray.training.registry import (
        q_docs_unigram_surprisal,
    )

    # corpus: a appears 3x, b 1x -> p(a)=0.75, p(b)=0.25
    docs = [(1, "a a a", "s1"), (2, "b", "s2")]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
                "source": pa.array([d[2] for d in docs], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_docs_unigram_surprisal(str(tmp_path))
    # -ln(0.75)=0.2877 -> bin 2; -ln(0.25)=1.3863 -> bin 13
    assert out[["source", "bin"]].values.tolist() == [["s1", 2], ["s2", 13]]
    assert out["n_docs"].tolist() == [1, 1]
    exp = int(np.floor(np.round(-np.log(0.25), 6) * 10))
    assert exp == 13


def test_tpch_q22_hand_computed(ray_session, tmp_path):
    """Selected codes are 10 + nationkey for odd nationkeys. Positive
    balances among selected customers: 100, 600, 500 (avg 400). Above
    average: custkey 2 (600, code 11, no recent orders -> kept) and
    custkey 3 (500, code 13, has an order inside the recency window ->
    anti-joined away; its second, OLD order alone would not exclude
    it). Customer 4 is in an unselected nation; customer 5 is
    negative-balance."""
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "c_name": pa.array([f"c{i}" for i in range(1, 6)]),
                "c_nationkey": pa.array([1, 1, 3, 2, 3], pa.int32()),
                "c_acctbal": pa.array(
                    [100.0, 600.0, 500.0, 9000.0, -5.0], pa.float64()
                ),
                "c_mktsegment": pa.array(["B"] * 5),
            }
        ),
        os.path.join(str(tmp_path), "customer.parquet"),
    )
    _write_orders(
        str(tmp_path),
        [(900, 3, "F", "2000-09-01"), (901, 3, "F", "1995-01-01"),
         (902, 2, "F", "1999-12-31")],
    )
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q22_global_sales

    out = q_tpch_q22_global_sales(str(tmp_path))
    assert out["cntrycode"].tolist() == ["11"]
    assert out["numcust"].tolist() == [1]
    assert out["totacctbal"].tolist() == [600.0]
