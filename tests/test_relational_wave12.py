"""Unit tests for the wave-12 slow-log analytics: per-class rows_sent /
rows_examined efficiency and the first-half vs second-half Query_time
drift screen — both run through the REAL parse pipeline on a hand-built
documents fixture with hand-computed expectations."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from mysql_log_parser_ray.sources.synth import TEMPLATES


def _write_docs(tmp_path, n_chars_list):
    n = len(n_chars_list)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x" * c for c in n_chars_list]),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s0"] * n),
                "n_chars": pa.array(n_chars_list, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


NC = [10, 21, 33, 44, 55, 66, 77, 88]  # doc_id 0..7, mid = 3


def test_rows_efficiency_hand_computed(ray_session, tmp_path):
    _write_docs(tmp_path, NC)
    from mysql_log_parser_ray.pipelines.queries import q_slowlog_rows_efficiency

    out = q_slowlog_rows_efficiency(str(tmp_path))
    # class n%4==0 (44, 88) and n%4==3 (55) have sum(n%11) == 0 -> excluded
    assert len(out) == 2
    c1, c2 = TEMPLATES[1][2], TEMPLATES[2][2]
    r1 = out[out["class_id"] == c1].iloc[0]
    # n%4==1: {21, 33, 77} -> sent 0+5+0=5, exam 10+0+0=10
    assert (r1["n_queries"], r1["sum_sent"], r1["sum_examined"]) == (3, 5, 10)
    assert r1["efficiency"] == 0.5
    r2 = out[out["class_id"] == c2].iloc[0]
    # n%4==2: {10, 66} -> sent 3+3=6, exam 10+0=10
    assert (r2["n_queries"], r2["sum_sent"], r2["sum_examined"]) == (2, 6, 10)
    assert r2["efficiency"] == 0.6


def test_qt_regression_hand_computed(ray_session, tmp_path):
    _write_docs(tmp_path, NC)
    from mysql_log_parser_ray.pipelines.queries import q_slowlog_qt_regression

    out = q_slowlog_qt_regression(str(tmp_path))
    # class n%4==3 (only 55, doc_id 4 = second half) lacks a first-half
    # leg -> excluded; the other three classes span both halves
    assert len(out) == 3
    exp = {
        # class: (n1, n2, su1, su2, drift) with u = n_chars % 128
        TEMPLATES[0][2]: (1, 1, 44, 88, 11.0),
        TEMPLATES[1][2]: (2, 1, 21 + 33, 77, 12.5),
        TEMPLATES[2][2]: (1, 1, 10, 66, 14.0),
    }
    for cid, (n1, n2, s1, s2, drift) in exp.items():
        r = out[out["class_id"] == cid].iloc[0]
        assert (r["n_first"], r["n_second"], r["su_first"],
                r["su_second"]) == (n1, n2, s1, s2), cid
        assert r["qt_drift"] == drift, cid


def test_qt_regression_negative_drift_rounds_half_away(ray_session, tmp_path):
    # All docs in one class (n%4 == 0); second half strictly faster.
    # doc_id 0..3, mid = 1: first {124, 120}, second {0, 4}
    # drift = (4*2 - 244*2) / (4*2*2) = -480/16 = -30.0
    _write_docs(tmp_path, [124, 120, 0, 4])
    from mysql_log_parser_ray.pipelines.queries import q_slowlog_qt_regression

    out = q_slowlog_qt_regression(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0]["qt_drift"] == -30.0
    assert out.iloc[0]["n_first"] == 2 and out.iloc[0]["n_second"] == 2


def _tbl(tmp_path, name, **cols):
    pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))


def test_fk_orphans_planted(ray_session, tmp_path):
    # customers 1,2 (nation 10 exists, 99 missing); orders -> cust 1,1,3
    # (3 missing); lineitem -> orders {100 ok, 200 missing}, parts
    # {5 ok, 6 missing}, suppliers {7 ok}
    _tbl(tmp_path, "nation",
         n_nationkey=pa.array([10], pa.int32()),
         n_name=pa.array(["A"]), n_regionkey=pa.array([0], pa.int32()))
    _tbl(tmp_path, "customer",
         c_custkey=pa.array([1, 2], pa.int64()),
         c_name=pa.array(["a", "b"]),
         c_nationkey=pa.array([10, 99], pa.int32()),
         c_acctbal=pa.array([0.0, 0.0]))
    _tbl(tmp_path, "orders",
         o_orderkey=pa.array([100, 101, 102], pa.int64()),
         o_custkey=pa.array([1, 1, 3], pa.int64()),
         o_orderstatus=pa.array(["O"] * 3),
         o_totalprice=pa.array([1.0] * 3),
         o_orderdate=pa.array([None] * 3, pa.timestamp("us")),
         o_orderpriority=pa.array(["1-URGENT"] * 3))
    _tbl(tmp_path, "lineitem",
         l_orderkey=pa.array([100, 200], pa.int64()),
         l_partkey=pa.array([5, 6], pa.int64()),
         l_suppkey=pa.array([7, 7], pa.int64()),
         l_quantity=pa.array([1.0, 1.0]),
         l_extendedprice=pa.array([1.0, 1.0]),
         l_discount=pa.array([0.0, 0.0]),
         l_tax=pa.array([0.0, 0.0]),
         l_returnflag=pa.array(["N", "N"]),
         l_shipdate=pa.array([None, None], pa.timestamp("us")))
    _tbl(tmp_path, "part",
         p_partkey=pa.array([5], pa.int64()), p_name=pa.array(["p"]),
         p_brand=pa.array(["B"]), p_type=pa.array(["T"]),
         p_size=pa.array([1], pa.int32()), p_retailprice=pa.array([1.0]))
    _tbl(tmp_path, "supplier",
         s_suppkey=pa.array([7], pa.int64()), s_name=pa.array(["s"]),
         s_nationkey=pa.array([10], pa.int32()),
         s_acctbal=pa.array([0.0]))
    from mysql_log_parser_ray.pipelines.queries import q_fk_orphans_audit

    out = q_fk_orphans_audit(str(tmp_path))
    got = {r["edge"]: (r["n_child"], r["n_orphans"])
           for _, r in out.iterrows()}
    assert got == {
        "customer.c_nationkey->nation": (2, 1),
        "lineitem.l_orderkey->orders": (2, 1),
        "lineitem.l_partkey->part": (2, 1),
        "lineitem.l_suppkey->supplier": (2, 0),
        "orders.o_custkey->customer": (3, 1),
        "supplier.s_nationkey->nation": (1, 0),
    }


def test_totalprice_audit_planted(ray_session, tmp_path):
    # order 1: lines sum to exactly 30.00 -> stored 30.00 matches
    # order 2: lines sum 10.00 -> stored 10.07 (7 cents off)
    # order 3: stored but NO lines -> out of scope
    _tbl(tmp_path, "orders",
         o_orderkey=pa.array([1, 2, 3], pa.int64()),
         o_custkey=pa.array([1, 1, 1], pa.int64()),
         o_orderstatus=pa.array(["O"] * 3),
         o_totalprice=pa.array([30.0, 10.07, 5.0]),
         o_orderdate=pa.array([None] * 3, pa.timestamp("us")),
         o_orderpriority=pa.array(["1-URGENT"] * 3))
    _tbl(tmp_path, "lineitem",
         l_orderkey=pa.array([1, 1, 2], pa.int64()),
         l_partkey=pa.array([5, 5, 5], pa.int64()),
         l_suppkey=pa.array([7, 7, 7], pa.int64()),
         l_quantity=pa.array([1.0, 1.0, 1.0]),
         l_extendedprice=pa.array([10.0, 20.0, 10.0]),
         l_discount=pa.array([0.0, 0.0, 0.0]),
         l_tax=pa.array([0.0, 0.0, 0.0]),
         l_returnflag=pa.array(["N"] * 3),
         l_shipdate=pa.array([None] * 3, pa.timestamp("us")))
    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_totalprice_audit,
    )

    out = q_orders_totalprice_audit(str(tmp_path))
    assert out.iloc[0].tolist() == [2, 1, 7, 7]
