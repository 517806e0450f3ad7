"""Unit tests for the wave-37 pair: zero-rows-sent waste screen and
per-source word-length percentiles."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    """rows: (source, text, n_chars)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([t for _, t, _ in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array([s for s, _, _ in rows]),
                "n_chars": pa.array([n for _, _, n in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_zero_rows_share_hand_computed(ray_session, tmp_path):
    # rows_sent = n_chars % 7: 7 -> 0 (zero), 8 -> 1; both land in the
    # SAME template class only if n_chars % 4 matches — use 7 and 11
    # (both % 4 == 3) so one class has 2 queries, 1 zero-sent
    _write_docs(tmp_path, [("s", "x" * 7, 7), ("s", "x" * 11, 11)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_slowlog_zero_rows_share,
    )

    out = q_slowlog_zero_rows_share(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_queries"], r["n_zero_sent"], r["zero_share"]) == \
        (2, 1, 0.5)


def test_word_len_p90_hand_computed(ray_session, tmp_path):
    # words: a(1) bb(2) ccc(3) dddd(4) x10 -> srcA lens sorted:
    # [1,2,3,4,4,4,4,4,4,4,4,4,4]: n=13, p50 idx 6 -> 4, p90 idx 11 -> 4
    text = "a bb ccc " + " ".join(["dddd"] * 10)
    _write_docs(tmp_path, [("srcA", text, len(text))])
    from mysql_log_parser_ray.pipelines.queries import q_source_word_len_p90

    out = q_source_word_len_p90(str(tmp_path))
    assert out.iloc[0].tolist() == ["srcA", 13, 4, 4]


def test_word_len_whitespace_only_doc_drops(ray_session, tmp_path):
    _write_docs(tmp_path, [("srcB", "   ", 3), ("srcB", "ab cd", 5)])
    from mysql_log_parser_ray.pipelines.queries import q_source_word_len_p90

    out = q_source_word_len_p90(str(tmp_path))
    assert out.iloc[0].tolist() == ["srcB", 2, 2, 2]
