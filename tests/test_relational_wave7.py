"""Invariant unit tests for the seventh relational wave: TPC-H Q6/Q15/Q17
shapes. Exact-value parity vs DuckDB is covered by
tests/test_oracle_parity.py; these pin the structural invariants (and the
crafted-fixture semantics) that parity alone would not explain on a
regression."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def _write_lineitem(path, rows):
    """rows: list of (suppkey, partkey, qty, price, discount, shipdate)."""
    import pandas as pd

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_quantity": pa.array([float(r[2]) for r in rows],
                                       pa.float64()),
                "l_extendedprice": pa.array([float(r[3]) for r in rows],
                                            pa.float64()),
                "l_discount": pa.array([float(r[4]) for r in rows],
                                       pa.float64()),
                "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
                "l_shipdate": pa.array(
                    [pd.Timestamp(r[5]) for r in rows], pa.timestamp("us")
                ),
            }
        ),
        os.path.join(path, "lineitem.parquet"),
    )


def test_q6_matches_pandas_recompute(ray_session):
    import pandas as pd

    from mysql_log_parser_ray.pipelines.queries import q_tpch_q6_revenue

    out = q_tpch_q6_revenue(SF)
    assert list(out.columns) == ["n_lines", "revenue_cents"]
    li = pq.read_table(os.path.join(SF, "lineitem.parquet")).to_pandas()
    m = (
        (li["l_shipdate"] >= pd.Timestamp("1995-01-01"))
        & (li["l_shipdate"] < pd.Timestamp("1996-01-01"))
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    )
    sel = li[m]
    cents = np.floor(
        sel["l_extendedprice"].to_numpy() * sel["l_discount"].to_numpy()
        * 100.0 + 0.5
    ).astype(np.int64)
    assert out["n_lines"].iloc[0] == len(sel)
    assert out["revenue_cents"].iloc[0] == int(cents.sum())


def test_q15_returns_all_ties(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q15_top_supplier

    # suppliers 1 and 2 tie at 2000.00 revenue in-quarter; 3 trails;
    # supplier 4's revenue is out of quarter and must not count
    _write_lineitem(
        str(tmp_path),
        [
            (1, 1, 1, 2000.0, 0.0, "1996-02-01"),
            (2, 1, 1, 1000.0, 0.0, "1996-02-01"),
            (2, 1, 1, 1000.0, 0.0, "1996-03-30"),
            (3, 1, 1, 500.0, 0.0, "1996-01-01"),
            (4, 1, 1, 9999.0, 0.0, "1996-04-01"),
        ],
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
                "s_name": pa.array(["s1", "s2", "s3", "s4"], pa.string()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = q_tpch_q15_top_supplier(str(tmp_path))
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["s_name"].tolist() == ["s1", "s2"]
    assert out["total_revenue_cents"].tolist() == [200000, 200000]


def test_q17_threshold_and_brand_filter(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q17_small_qty

    # part 1 is Brand#23 with avg qty = (4+5+66)/3 = 25 -> threshold 5:
    # the qty-4 line qualifies, qty-5 does NOT (strict <), qty-66 raises
    # the avg; part 2 is another brand and must be excluded entirely
    _write_lineitem(
        str(tmp_path),
        [
            (1, 1, 4, 100.0, 0.0, "1996-01-01"),
            (1, 1, 5, 100.0, 0.0, "1996-01-01"),
            (1, 1, 66, 100.0, 0.0, "1996-01-01"),
            (1, 2, 1, 777.0, 0.0, "1996-01-01"),
        ],
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_brand": pa.array(["Brand#23", "Brand#11"], pa.string()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    out = q_tpch_q17_small_qty(str(tmp_path))
    assert out["n_lines"].iloc[0] == 1
    assert out["total_cents"].iloc[0] == 10000
    assert abs(out["avg_yearly"].iloc[0] - round(10000 / 700.0, 6)) < 1e-9


def test_q15_quarter_boundaries_inclusive_exclusive(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_tpch_q15_top_supplier

    # first instant of the quarter counts; first instant of the next
    # quarter does not
    _write_lineitem(
        str(tmp_path),
        [
            (1, 1, 1, 100.0, 0.0, "1996-01-01 00:00:00"),
            (2, 1, 1, 5000.0, 0.0, "1996-04-01 00:00:00"),
        ],
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_name": pa.array(["s1", "s2"], pa.string()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = q_tpch_q15_top_supplier(str(tmp_path))
    assert out["s_suppkey"].tolist() == [1]
    assert out["total_revenue_cents"].tolist() == [10000]


def test_q4_counts_orders_once_and_respects_quarter(ray_session, tmp_path):
    import pandas as pd

    from mysql_log_parser_ray.pipelines.queries import (
        q_tpch_q4_priority_returns,
    )

    # order 1: two returned lines -> must count ONCE; order 2: no returned
    # line -> excluded; order 3: returned but out of quarter -> excluded
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
                "l_returnflag": pa.array(["R", "R", "N", "R"], pa.string()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderdate": pa.array(
                    [pd.Timestamp("1996-02-01"), pd.Timestamp("1996-02-01"),
                     pd.Timestamp("1996-05-01")],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "1-URGENT", "1-URGENT"], pa.string()
                ),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = q_tpch_q4_priority_returns(str(tmp_path))
    assert out["o_orderpriority"].tolist() == ["1-URGENT"]
    assert out["n_orders"].tolist() == [1]


def test_q16_distinct_and_exclusion(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import (
        q_tpch_q16_brand_suppliers,
    )

    # brand A shipped by suppliers 1 (twice -> distinct once) and 2
    # (excluded: negative balance); brand B by supplier 1 only
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([10, 10, 10, 11], pa.int64()),
                "l_suppkey": pa.array([1, 1, 2, 1], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([10, 11], pa.int64()),
                "p_brand": pa.array(["Brand#A", "Brand#B"], pa.string()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_acctbal": pa.array([100.0, -5.0], pa.float64()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = q_tpch_q16_brand_suppliers(str(tmp_path))
    assert out["p_brand"].tolist() == ["Brand#A", "Brand#B"]
    assert out["n_suppliers"].tolist() == [1, 1]


def test_dsir_separates_target_like_docs(ray_session, tmp_path):
    from mysql_log_parser_ray.training.registry import q_docs_dsir_weights

    # target docs are all "alpha", raw docs all "beta"; one raw doc
    # written in the target's vocabulary must be selected, pure-raw must
    # not, and every target doc scores positive
    docs = (
        [("alpha alpha alpha", "tgt")] * 5
        + [("beta beta beta", "raw")] * 5
        + [("alpha alpha", "raw")]
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array([d[0] for d in docs], pa.string()),
                "source": pa.array([d[1] for d in docs], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = q_docs_dsir_weights(str(tmp_path), target_source="tgt")
    r = out.set_index("source")
    assert r.loc["tgt", "n_selected"] == 5  # every target doc positive
    assert r.loc["tgt", "n_docs"] == 5
    assert r.loc["raw", "n_docs"] == 6
    assert r.loc["raw", "n_selected"] == 1  # only the alpha-written doc
    assert r.loc["tgt", "sum_units"] > 0 > r.loc["raw", "sum_units"]


def test_increasing_pairs_order_and_tiebreak(ray_session, tmp_path):
    import pandas as pd

    from mysql_log_parser_ray.pipelines.queries import (
        q_orders_increasing_pairs,
    )

    # customer 1: prices 100 -> 200 (up), 200 -> 150 (down) = 1 of 2;
    # same-date orders tie-break on orderkey: 2 then 3
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 3, 2], pa.int64()),
                "o_custkey": pa.array([1, 1, 1], pa.int64()),
                "o_orderdate": pa.array(
                    [pd.Timestamp("1996-01-01"), pd.Timestamp("1996-02-01"),
                     pd.Timestamp("1996-02-01")],
                    pa.timestamp("us"),
                ),
                "o_totalprice": pa.array([100.0, 150.0, 200.0], pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = q_orders_increasing_pairs(str(tmp_path))
    # sequence by (date, orderkey): 100 (k1), 200 (k2), 150 (k3)
    assert out.iloc[0].tolist() == [1, 2, 1]


def test_min_cost_supplier_argmin_tiebreak(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import (
        q_part_min_cost_supplier,
    )

    # part 10: supplier 2 at unit 5.00 beats supplier 1 at 10.00; part 11:
    # suppliers 1 and 2 tie at 1.00 -> lower suppkey (1) wins
    _write_lineitem(
        str(tmp_path),
        [
            (1, 10, 2, 20.0, 0.0, "1996-01-01"),   # unit 10.00
            (2, 10, 4, 20.0, 0.0, "1996-01-01"),   # unit 5.00  <- winner
            (1, 11, 3, 3.0, 0.0, "1996-01-01"),    # unit 1.00  <- tie
            (2, 11, 5, 5.0, 0.0, "1996-01-01"),    # unit 1.00
        ],
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([10, 11], pa.int64()),
                "p_brand": pa.array(["Brand#A", "Brand#A"], pa.string()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    out = q_part_min_cost_supplier(str(tmp_path))
    assert out["p_brand"].tolist() == ["Brand#A"]
    assert out["n_parts"].tolist() == [2]
    assert out["sum_min_unit_cents"].tolist() == [500 + 100]
    assert out["sum_winner_suppkey"].tolist() == [2 + 1]


def test_gap_fill_linear_interpolation(ray_session, tmp_path):
    import pandas as pd

    from mysql_log_parser_ray.pipelines.queries import q_events_gap_fill

    # type "a": hours 0 and 3 present (values 1.00 and 4.00) -> hours 1, 2
    # interpolated at 2.00 and 3.00; fractional case: type "b" hours
    # 0 (1.00) and 2 (2.00) -> hour 1 = 1.50 (150 cents)
    base = pd.Timestamp("2024-01-01")
    rows = [
        ("a", base, 1.0),
        ("a", base + pd.Timedelta(hours=3), 4.0),
        ("b", base, 1.0),
        ("b", base + pd.Timedelta(hours=2), 2.0),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = q_events_gap_fill(str(tmp_path))
    a = out[out["event_type"] == "a"]
    assert a["filled_cents"].tolist() == [100.0, 200.0, 300.0, 400.0]
    assert a["is_filled"].tolist() == [0, 1, 1, 0]
    b = out[out["event_type"] == "b"]
    assert b["filled_cents"].tolist() == [100.0, 150.0, 200.0]
    assert b["is_filled"].tolist() == [0, 1, 0]
    # as_dataset escape returns a Dataset with identical rows
    ds = q_events_gap_fill(str(tmp_path), as_dataset=True)
    assert sorted(ds.to_pandas()["filled_cents"].tolist()) == sorted(
        out["filled_cents"].tolist()
    )


def _write_docs(path, texts, sources=None):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(sources or ["s"] * len(texts),
                                   pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


def test_containment_catches_embedded_doc_jaccard_misses(ray_session,
                                                         tmp_path):
    from mysql_log_parser_ray.training.dedup import ngram_jaccard_pairs
    from mysql_log_parser_ray.training.registry import (
        q_ngram_containment_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(20))
    _write_docs(str(tmp_path), [short, long, "zeta eta theta iota"])
    out = q_ngram_containment_pairs(str(tmp_path))
    assert out[["doc_a", "doc_b"]].values.tolist() == [[0, 1]]
    assert out["containment"].iloc[0] == 1.0  # short fully inside long
    # jaccard at the same 0.5 bar misses it (union-diluted)
    import ray.data as rd
    import pyarrow.parquet as _pq

    docs = rd.from_arrow(_pq.read_table(str(tmp_path / "documents.parquet")))
    jac = ngram_jaccard_pairs(docs, threshold=0.5)
    assert len(jac) == 0


def test_score_deciles_partition_all_docs(ray_session):
    import pyarrow.parquet as _pq

    from mysql_log_parser_ray.training.registry import q_docs_score_deciles

    out = q_docs_score_deciles(SF)
    n_docs = _pq.read_metadata(os.path.join(SF, "documents.parquet")).num_rows
    assert out["n_docs"].sum() == n_docs
    assert out["decile"].between(0, 9).all()
    # global decile sizes are near-uniform (coarse bins allow slack)
    per_dec = out.groupby("decile")["n_docs"].sum()
    assert per_dec.max() <= 2 * max(1, n_docs // 10) + 64


def test_temperature_alloc_sums_to_budget_and_flattens(ray_session,
                                                       tmp_path):
    from mysql_log_parser_ray.training.registry import (
        q_docs_temperature_alloc,
    )

    _write_docs(
        str(tmp_path),
        ["a"] * 90 + ["b"] * 9 + ["c"],
        sources=["big"] * 90 + ["mid"] * 9 + ["tiny"],
    )
    out = q_docs_temperature_alloc(str(tmp_path), alpha=0.5, budget=100)
    assert out["alloc"].sum() == 100
    r = out.set_index("source")
    # sqrt temperature flattens: tiny gets MORE than its 1% head count,
    # big gets LESS than its 90%
    assert r.loc["tiny", "alloc"] > 1
    assert r.loc["big", "alloc"] < 90
    # alpha=1 is proportional allocation (largest remainder of 90/9/1)
    out1 = q_docs_temperature_alloc(str(tmp_path), alpha=1.0, budget=100)
    assert out1.set_index("source")["alloc"].to_dict() == {
        "big": 90, "mid": 9, "tiny": 1,
    }


def _write_events(path, rows):
    """rows: list of (user_id, event_type, ts)."""
    import pandas as pd

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([pd.Timestamp(r[2]) for r in rows],
                               pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        os.path.join(path, "events.parquet"),
    )


def test_cohort_matrix_offsets_and_distinctness(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_cohort_week_matrix

    # user 1 active weeks 0,1 (two events in week 1 count once); user 2
    # active weeks 0 and 6 (offset 6 > max_offset=4 -> dropped)
    _write_events(
        str(tmp_path),
        [
            (1, "view", "1970-01-01"),
            (1, "view", "1970-01-08"),
            (1, "click", "1970-01-09"),
            (2, "view", "1970-01-02"),
            (2, "view", "1970-02-14"),
        ],
    )
    out = q_cohort_week_matrix(str(tmp_path))
    assert out.values.tolist() == [[0, 0, 2], [0, 1, 1]]


def test_conversion_delay_median(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_conversion_delay_p50

    # user 1: view 10:00, purchase 10:30 -> 30 min; user 2: purchase
    # BEFORE first view (no conversion), then purchase 11:10 after view
    # 11:00 -> 10 min; user 3: view only. p50 of {10, 30} = rank 1 -> 10
    _write_events(
        str(tmp_path),
        [
            (1, "view", "2024-01-01 10:00"),
            (1, "purchase", "2024-01-01 10:30"),
            (2, "purchase", "2024-01-01 09:00"),
            (2, "view", "2024-01-01 11:00"),
            (2, "purchase", "2024-01-01 11:10"),
            (3, "view", "2024-01-01 12:00"),
        ],
    )
    out = q_conversion_delay_p50(str(tmp_path))
    assert out["n_conversions"].tolist() == [2]
    assert out["p50_delay_min"].tolist() == [10]


def test_users_all_types_counts_full_coverage_only(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import q_users_all_types

    # 3 types exist; user 1 hits all three (one twice), user 2 two, user
    # 3 one
    _write_events(
        str(tmp_path),
        [
            (1, "view", "2024-01-01"), (1, "click", "2024-01-02"),
            (1, "purchase", "2024-01-03"), (1, "view", "2024-01-04"),
            (2, "view", "2024-01-01"), (2, "click", "2024-01-02"),
            (3, "purchase", "2024-01-01"),
        ],
    )
    out = q_users_all_types(str(tmp_path))
    assert out["n_users_all_types"].tolist() == [1]
    assert out["n_types"].tolist() == [3]


def test_apdex_bounds_and_consistency(ray_session):
    from mysql_log_parser_ray.pipelines.queries import q_slowlog_apdex

    out = q_slowlog_apdex(SF)
    assert len(out) > 0
    assert ((out["apdex"] >= 0) & (out["apdex"] <= 1)).all()
    assert (out["n_satisfied"] + out["n_tolerating"]
            <= out["n_queries"]).all()
    # T large enough that everything satisfies -> apdex exactly 1
    hi = q_slowlog_apdex(SF, threshold=1000.0)
    assert (hi["apdex"] == 1.0).all()
    assert (hi["n_satisfied"] == hi["n_queries"]).all()


def test_embed_dim_moments_exact_vs_numpy(ray_session):
    import pyarrow.parquet as _pq

    from mysql_log_parser_ray.pipelines.queries import q_embed_dim_moments

    out = q_embed_dim_moments(SF)
    t = _pq.read_table(os.path.join(SF, "embeddings.parquet"),
                       columns=["embedding"])
    x = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
    assert out["dim"].tolist() == list(range(1, x.shape[1] + 1))
    assert (out["n"] == len(x)).all()
    assert out["sum_units"].tolist() == xq.sum(axis=0).tolist()
    assert out["sumsq_units"].tolist() == (xq * xq).sum(axis=0).tolist()


def test_csv_and_hive_roundtrips_are_idempotent(ray_session, tmp_path):
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_csv_source,
        q_events_partitioned_sink,
    )

    _write_events(
        str(tmp_path),
        [(1, "view", "2024-01-01"), (2, "click", "2024-01-02"),
         (1, "view", "2024-01-03")],
    )
    a1 = q_events_csv_source(str(tmp_path))
    a2 = q_events_csv_source(str(tmp_path))  # second run reuses the stage
    assert a1.equals(a2)
    assert a1.set_index("event_type")["n_rows"].to_dict() == {
        "view": 2, "click": 1,
    }
    b1 = q_events_partitioned_sink(str(tmp_path))
    b2 = q_events_partitioned_sink(str(tmp_path))
    assert b1.equals(b2)
    assert b1.set_index("event_type")["sum_user_id"].to_dict() == {
        "view": 2, "click": 2,
    }
