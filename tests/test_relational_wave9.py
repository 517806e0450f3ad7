"""Unit tests for the wave-9 operators: Pareto revenue concentration,
event-type market-basket pairs, hashing-trick vocab projection, and
per-doc lexical-diversity entropy. Hand-computed fixtures, independent of
/root/testdata."""

import hashlib
import os
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


@pytest.fixture()
def sf_dir(tmp_path):
    return str(tmp_path)


def test_pareto_customers_cutoff_and_shares(ray_session, tmp_path, sf_dir):
    # revenues: c1=500, c2=300, c3=150, c4=50 (total 1000; 80% = 800)
    # ordered c1(cum 500), c2(800), c3(950): c3's prefix-before is 800,
    # NOT < 800 -> excluded; c2's prefix-before 500 < 800 -> kept.
    _write(
        tmp_path, "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(6), pa.int64()),
                "o_custkey": pa.array([1, 1, 2, 3, 4, 3], pa.int64()),
                "o_totalprice": pa.array(
                    [200.0, 300.0, 300.0, 100.0, 50.0, 50.0], pa.float64()
                ),
                "o_orderstatus": pa.array(["O"] * 6),
                "o_orderdate": pa.array([0] * 6, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 6),
            }
        ),
    )
    from mysql_log_parser_ray.pipelines.queries import q_pareto_customers

    out = q_pareto_customers(sf_dir)
    assert out["c_custkey"].tolist() == [1, 2]
    assert out["revenue"].tolist() == [500.0, 300.0]
    assert out["rnk"].tolist() == [1, 2]
    assert out["cum_share"].tolist() == [0.5, 0.8]


def test_pareto_customers_tie_breaks_by_custkey(ray_session, tmp_path, sf_dir):
    _write(
        tmp_path, "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(3), pa.int64()),
                "o_custkey": pa.array([7, 3, 5], pa.int64()),
                "o_totalprice": pa.array([100.0, 100.0, 100.0], pa.float64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_orderdate": pa.array([0] * 3, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 3),
            }
        ),
    )
    from mysql_log_parser_ray.pipelines.queries import q_pareto_customers

    out = q_pareto_customers(sf_dir)
    # equal revenue: ascending custkey; 80% of 300 = 240 -> ranks 1-3
    # (prefix-before of rank 3 is 200 < 240)
    assert out["c_custkey"].tolist() == [3, 5, 7]
    assert out["rnk"].tolist() == [1, 2, 3]


def test_event_type_pairs_counts_users_once(ray_session, tmp_path, sf_dir):
    # u1: {a,b,c}; u2: {a,b} (b twice - distinct!); u3: {c}
    _write(
        tmp_path, "events",
        pa.table(
            {
                "event_id": pa.array(range(7), pa.int64()),
                "ts": pa.array([0] * 7, pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
                "event_type": pa.array(
                    ["a", "b", "c", "a", "b", "b", "c"]
                ),
                "value": pa.array([1.0] * 7, pa.float64()),
                "props": pa.array(["{}"] * 7),
            }
        ),
    )
    from mysql_log_parser_ray.pipelines.queries import q_event_type_pairs

    out = q_event_type_pairs(sf_dir)
    got = {(r.type_a, r.type_b): r.n_users for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_hashed_vocab_counts_matches_md5_kernel(ray_session, tmp_path, sf_dir):
    _write(
        tmp_path, "documents",
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["the fast query", "the the slow"]),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["s0", "s1"]),
                "n_chars": pa.array([14, 12], pa.int64()),
            }
        ),
    )
    from mysql_log_parser_ray.training.registry import q_hashed_vocab_counts

    out = q_hashed_vocab_counts(sf_dir)

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 32

    want = {}
    for src, words in (("s0", ["the", "fast", "query"]),
                       ("s1", ["the", "the", "slow"])):
        for w in words:
            k = (src, bucket(w))
            want[k] = want.get(k, 0) + 1
    got = {(r.source, r.bucket): r.n_tokens for r in out.itertuples()}
    assert got == want


def test_doc_word_entropy_hand_computed(ray_session, tmp_path, sf_dir):
    # doc0: "a b a b" -> nw=4 nt=2 ttr=0.5 entropy=ln 2
    # doc1: "x x x"   -> nw=3 nt=1 ttr=1/3  entropy=0
    _write(
        tmp_path, "documents",
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b a b", "x x x"]),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["s0", "s0"]),
                "n_chars": pa.array([7, 5], pa.int64()),
            }
        ),
    )
    from mysql_log_parser_ray.training.registry import q_doc_word_entropy

    out = q_doc_word_entropy(sf_dir)
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_words"].tolist() == [4, 3]
    assert out["n_types"].tolist() == [2, 1]
    assert out["ttr"].tolist() == [0.5, round(1 / 3, 6)]
    assert out["entropy"].tolist() == [round(math.log(2), 6), 0.0]


def test_doc_word_entropy_ttr_half_up_tie(ray_session, tmp_path, sf_dir):
    # 1/128 = 0.0078125 exactly: half-up -> 0.007813 (np.round half-even
    # would give 0.007812 and diverge from DuckDB round()).
    text = "w0 " * 127 + "w1"  # 128 words, 2 types
    _write(
        tmp_path, "documents",
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array([text]),
                "lang": pa.array(["en"]),
                "source": pa.array(["s0"]),
                "n_chars": pa.array([len(text)], pa.int64()),
            }
        ),
    )
    from mysql_log_parser_ray.training.registry import q_doc_word_entropy

    out = q_doc_word_entropy(sf_dir)
    assert out["n_words"].tolist() == [128]
    assert out["n_types"].tolist() == [2]
    # 2/128 = 0.015625: terminates at 6dp, no tie; sanity-check plus the
    # half-up kernel on the documented 7-digit tie
    assert out["ttr"].tolist() == [0.015625]
    from mysql_log_parser_ray.util import round_half_up

    assert float(round_half_up(np.array([1 / 128]), 6)[0]) == 0.007813


def test_gini_extremes(ray_session, tmp_path, sf_dir):
    # perfectly equal: 3 users x 2 events -> G = 0
    ids = [1, 1, 2, 2, 3, 3]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(6), pa.int64()),
                "ts": pa.array([0] * 6, pa.timestamp("us")),
                "user_id": pa.array(ids, pa.int64()),
                "event_type": pa.array(["a"] * 6),
                "value": pa.array([1.0] * 6, pa.float64()),
                "props": pa.array(["{}"] * 6),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_user_activity_gini

    out = q_user_activity_gini(sf_dir)
    assert out.iloc[0].tolist() == [3, 6, 0.0]
    # skewed: counts 1, 1, 8 -> ranks 1,2,3 (ties by user);
    # G = (2*(1+2+24) - 4*10) / (3*10) = (54-40)/30 = 14/30
    ids = [1] + [2] + [3] * 8
    n = len(ids)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([0] * n, pa.timestamp("us")),
                "user_id": pa.array(ids, pa.int64()),
                "event_type": pa.array(["a"] * n),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = q_user_activity_gini(sf_dir)
    import math
    assert out.iloc[0]["n_users"] == 3
    assert out.iloc[0]["total_events"] == 10
    assert math.isclose(out.iloc[0]["gini"], round(14 / 30, 6),
                        abs_tol=1e-9)


@pytest.mark.skipif(
    os.environ.get("MLPR_BIG_TESTS") != "1",
    reason="~1 min; run with MLPR_BIG_TESTS=1 for the gini histogram-fold scale check",
)
def test_gini_million_users_bounded_driver(ray_session, tmp_path):
    """1M users / 3M events: the histogram fold must keep the driver
    Python heap far below a user-cardinality frame (the pre-r5 shape
    collected 1M (user, count) rows + a 1M-element Python list), and the
    value must equal the definition computed from the expanded rank
    array."""
    import tracemalloc

    n_users = 1_000_000
    # user i has 1 + (i % 5) events -> histogram {c: 200k} for c=1..5
    uid = np.arange(n_users, dtype=np.int64)
    events = np.repeat(uid, 1 + (uid % 5))
    pq.write_table(
        pa.table({"user_id": pa.array(events, pa.int64())}),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_user_activity_gini

    tracemalloc.start()
    out = q_user_activity_gini(str(tmp_path))
    _cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # definition, computed independently over the expanded rank array
    xs = np.sort(1 + (uid % 5)).astype(np.int64)
    sx = int(xs.sum())
    srx = int(np.dot(np.arange(1, n_users + 1, dtype=np.int64), xs))
    want = round((2 * srx - (n_users + 1) * sx) / (n_users * sx), 6)
    assert out.iloc[0]["n_users"] == n_users
    assert out.iloc[0]["total_events"] == sx
    assert math.isclose(out.iloc[0]["gini"], want, abs_tol=1e-9)
    # driver heap bound: well under the ~45 MB a 1M-user frame + Python
    # int list would cost (the histogram is 5 values x 64 buckets)
    assert peak < 24 * 1024 * 1024, peak
