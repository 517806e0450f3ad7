"""Unit tests for the wave-15 pair: revenue-weighted median quantity
per return flag (weighted quantile) and per-source character-level
entropy (hand-computed expectations)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_weighted_median_hand_computed(ray_session, tmp_path):
    # flag A: (qty, price) = (1, 1.00), (2, 1.00), (3, 10.00)
    #   cents total 1200; cum 100/200/1200 -> first 2*cum >= 1200 at qty 3
    # flag B: (5, 2.00), (7, 2.00): total 400, cum at qty5 = 200,
    #   2*200 >= 400 -> the even split takes the LOWER level (5)
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A", "A", "A", "B", "B"]),
                "l_quantity": pa.array([1.0, 2.0, 3.0, 5.0, 7.0]),
                "l_extendedprice": pa.array([1.0, 1.0, 10.0, 2.0, 2.0]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_lineitem_weighted_median_qty,
    )

    out = q_lineitem_weighted_median_qty(str(tmp_path))
    got = {r.l_returnflag: (r.n_lines, r.wmedian_qty)
           for r in out.itertuples()}
    assert got == {"A": (3, 3), "B": (2, 5)}


def test_weighted_median_null_rows_dropped(ray_session, tmp_path):
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A", "A"]),
                "l_quantity": pa.array([4.0, None]),
                "l_extendedprice": pa.array([3.0, 9.0]),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_lineitem_weighted_median_qty,
    )

    out = q_lineitem_weighted_median_qty(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0].tolist() == ["A", 1, 4]


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([t for _, t in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array([s for s, _ in rows]),
                "n_chars": pa.array(
                    [len(t) if t else 0 for _, t in rows], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_char_entropy_hand_computed(ray_session, tmp_path):
    # srcX: "aab" + "b" -> a:2 b:2, N=4 -> entropy = ln2 = 0.693147
    # srcY: "abcd" -> uniform over 4 -> ln4 = 1.386294
    _write_docs(tmp_path, [("srcX", "aab"), ("srcX", "b"),
                           ("srcY", "abcd")])
    from mysql_log_parser_ray.pipelines.queries import q_source_char_entropy

    out = q_source_char_entropy(str(tmp_path))
    got = {r.source: (r.n_chars, r.n_alphabet, r.char_entropy)
           for r in out.itertuples()}
    assert got["srcX"] == (4, 2, round(float(np.log(2.0)), 6))
    assert got["srcY"] == (4, 4, round(float(np.log(4.0)), 6))


def test_char_entropy_single_char_zero(ray_session, tmp_path):
    _write_docs(tmp_path, [("srcZ", "aaaa")])
    from mysql_log_parser_ray.pipelines.queries import q_source_char_entropy

    out = q_source_char_entropy(str(tmp_path))
    assert out.iloc[0].tolist() == ["srcZ", 4, 1, 0.0]
