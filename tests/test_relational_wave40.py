"""Unit tests for the wave-40 pair: prefix-collision duplication rate
and same-day multi-order screen."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_prefix_dup_rate_hand_computed(ray_session, tmp_path):
    # two docs share a 32-char prefix (differ beyond it), one unique
    base = "A" * 32
    texts = [base + "tail-one", base + "tail-two", "B" * 40]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["src0"] * 3),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_docs_prefix_dup_rate

    out = q_docs_prefix_dup_rate(str(tmp_path))
    assert out.iloc[0].tolist() == [3, 2, 0.666667]


def test_prefix_dup_short_docs_count_whole_text(ray_session, tmp_path):
    # docs shorter than the prefix compare as their full text
    texts = ["short", "short", "other"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["src0"] * 3),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_docs_prefix_dup_rate

    out = q_docs_prefix_dup_rate(str(tmp_path))
    assert out.iloc[0].tolist() == [3, 2, 0.666667]


def test_sameday_multi_hand_computed(ray_session, tmp_path):
    # cust 1: two orders day 0 -> multi; cust 2: orders on days 0 and 1
    # -> NOT multi; cust 3: one order
    rows = [(1, 0), (1, 0), (2, 0), (2, 1), (3, 5)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                "o_custkey": pa.array([c for c, _ in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([1.0] * len(rows)),
                "o_orderdate": pa.array(
                    [d * 86_400_000_000 for _, d in rows],
                    pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import q_orders_sameday_multi

    out = q_orders_sameday_multi(str(tmp_path))
    assert out.iloc[0].tolist() == [3, 1, 0.333333]
