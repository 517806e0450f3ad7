"""Unit tests for the wave-10 operators: RFM NTILE segmentation,
seasonal-baseline hour anomalies, and per-source nucleus (top-p)
vocabulary truncation. Hand-computed fixtures."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

US_PER_H = 3_600_000_000
US_PER_D = 86_400_000_000


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def test_rfm_ntile_matches_sql_semantics(ray_session, tmp_path):
    # 7 customers -> NTILE(5): bucket sizes 2,2,1,1,1 (first n%k=2 take 2)
    n_cust = 7
    custkeys, prices, dates = [], [], []
    for c in range(1, n_cust + 1):
        # customer c has c orders of 100.0 each, last order on day c
        for i in range(c):
            custkeys.append(c)
            prices.append(100.0)
            dates.append((c * US_PER_D) + i)
    _write(
        tmp_path, "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(len(custkeys)), pa.int64()),
                "o_custkey": pa.array(custkeys, pa.int64()),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderstatus": pa.array(["O"] * len(custkeys)),
                "o_orderdate": pa.array(dates, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(custkeys)),
            }
        ),
    )
    from mysql_log_parser_ray.pipelines.queries import q_customers_rfm_cells

    out = q_customers_rfm_cells(str(tmp_path))
    # recency DESC = c7 first; frequency DESC = c7 first; monetary DESC =
    # c7 first -> all three orders identical, so r=f=m per customer.
    # NTILE(5) over 7 rows: positions 0-1 -> 1, 2-3 -> 2, 4 -> 3, 5 -> 4,
    # 6 -> 5; customer 7 is position 0 ... customer 1 is position 6.
    want = {(1, 1, 1): 2, (2, 2, 2): 2, (3, 3, 3): 1, (4, 4, 4): 1,
            (5, 5, 5): 1}
    got = {(r.r_tile, r.f_tile, r.m_tile): r.n_customers
           for r in out.itertuples()}
    assert got == want
    assert int(out["n_customers"].sum()) == n_cust


def test_hour_anomaly_integer_threshold(ray_session, tmp_path):
    # type "a", hour 3: day0=10 events, day1=2, day2=0 (days observed in
    # corpus: 0,1,2 via type "b" rows) -> T(a,3)=12, D=3.
    # day0: 10*3=30 > 24 -> anomalous; day1: 2*3=6 < 24 -> not.
    ts, types = [], []
    for _ in range(10):
        ts.append(0 * US_PER_D + 3 * US_PER_H)
        types.append("a")
    for _ in range(2):
        ts.append(1 * US_PER_D + 3 * US_PER_H)
        types.append("a")
    for d in range(3):  # type b pins the distinct-day count at 3
        ts.append(d * US_PER_D + 5 * US_PER_H)
        types.append("b")
    n = len(ts)
    _write(
        tmp_path, "events",
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(types),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
    )
    from mysql_log_parser_ray.pipelines.queries import q_events_hour_anomaly

    out = q_events_hour_anomaly(str(tmp_path))
    flagged = {(r.event_type, r.day, r.hod): (r.n, r.hr_total, r.n_days)
               for r in out.itertuples()}
    assert ("a", 0, 3) in flagged
    assert flagged[("a", 0, 3)] == (10, 12, 3)
    assert ("a", 1, 3) not in flagged
    # type b is perfectly uniform (1*3 == 3 = hr_total, not > 2*3)
    assert not any(t == "b" for (t, _, _) in flagged)


def test_top_p_vocab_cutoff_and_ranks(ray_session, tmp_path):
    # source s0 counts: w1=6, w2=3, w3=1 (total 10; 90% mass = 9)
    # order w1(cum-before 0<9), w2(6<9), w3(9 NOT <9) -> keep w1,w2
    text0 = " ".join(["w1"] * 6 + ["w2"] * 3 + ["w3"])
    # source s1: uniform wa=wb=1 -> keep wa (0<1.8), wb (1<1.8): both
    _write(
        tmp_path, "documents",
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([text0, "wa wb"]),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["s0", "s1"]),
                "n_chars": pa.array([len(text0), 5], pa.int64()),
            }
        ),
    )
    from mysql_log_parser_ray.training.registry import q_source_top_p_vocab

    out = q_source_top_p_vocab(str(tmp_path))
    got = {(r.source, r.word): (r.n, r.rnk) for r in out.itertuples()}
    assert got == {
        ("s0", "w1"): (6, 1), ("s0", "w2"): (3, 2),
        ("s1", "wa"): (1, 1), ("s1", "wb"): (1, 2),
    }


def test_parts_skyline_hand_computed(ray_session, tmp_path):
    # (size, price): A(10, 5.00) B(10, 4.00) C(8, 3.00) D(8, 3.00)
    # E(12, 6.00) F(6, 7.00)
    # skyline: E (largest size), B (10 cheaper than E), C and D (tied,
    # neither dominates the other; cheaper than B). A dominated by B;
    # F dominated by C (size 8>6, 3.00<7.00).
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "p_name": pa.array(["a", "b", "c", "d", "e", "f"]),
                "p_brand": pa.array(["B"] * 6),
                "p_type": pa.array(["T"] * 6),
                "p_size": pa.array([10, 10, 8, 8, 12, 6], pa.int64()),
                "p_retailprice": pa.array(
                    [5.0, 4.0, 3.0, 3.0, 6.0, 7.0], pa.float64()
                ),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_parts_price_skyline

    out = q_parts_price_skyline(str(tmp_path))
    assert out["p_partkey"].tolist() == [2, 3, 4, 5]
    # tight budget: the 4 global-skyline rows survive BOTH distributed
    # rounds (they're undominated), so the guard must fail-fast rather
    # than collect
    with pytest.raises(ValueError, match="skyline"):
        q_parts_price_skyline(str(tmp_path), max_driver_rows=3)


@pytest.mark.skipif(
    os.environ.get("MLPR_BIG_TESTS") != "1",
    reason="~1 min; run with MLPR_BIG_TESTS=1 for the anti-correlated skyline scale check",
)
def test_skyline_anticorrelated_at_scale(ray_session, tmp_path):
    """Adversarial corpus where the skyline IS the corpus (size ascending,
    price descending: nothing dominates anything): the full result must
    come back exactly within budget, and a sub-corpus budget must
    fail-fast after the second distributed round instead of collecting."""
    import tracemalloc

    n = 200_000
    sizes = np.arange(n, dtype=np.int64)
    # anti-correlated for (max size, min price): price RISES with size,
    # so no row is both larger and cheaper than another -> skyline = all
    prices = (sizes + 1).astype(np.float64) / 100.0  # cents = size + 1
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n), pa.int64()),
                "p_size": pa.array(sizes, pa.int64()),
                "p_retailprice": pa.array(prices, pa.float64()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_parts_price_skyline

    tracemalloc.start()
    out = q_parts_price_skyline(str(tmp_path))
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(out) == n  # every row is Pareto-optimal
    assert (out["cents"].to_numpy() == out["p_size"].to_numpy() + 1).all()
    # driver heap stays result-sized (the collect IS the answer here)
    assert peak < n * 3 * 8 * 8 + 64 * 1024 * 1024, peak
    with pytest.raises(ValueError, match="anti-correlated"):
        q_parts_price_skyline(str(tmp_path), max_driver_rows=50_000)


def test_seasonal_index_level_demand(ray_session, tmp_path):
    # 2 orders in each of months 1 and 2 -> index = n*12/total = 2*12/4=6
    US_PER_D = 86_400_000_000
    dates = [0, 1 * US_PER_D, 32 * US_PER_D, 33 * US_PER_D]  # Jan, Jan, Feb, Feb 1970
    n = len(dates)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_totalprice": pa.array([10.0] * n, pa.float64()),
                "o_orderstatus": pa.array(["O"] * n),
                "o_orderdate": pa.array(dates, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_orders_seasonal_index

    out = q_orders_seasonal_index(str(tmp_path))
    assert out["month_of_year"].tolist() == [1, 2]
    assert out["n_orders"].tolist() == [2, 2]
    assert out["seasonal_index"].tolist() == [6.0, 6.0]
