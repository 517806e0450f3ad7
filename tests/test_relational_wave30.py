"""Unit tests for the wave-30 pair: per-tier latency bill through the
enrich stage and the cross-format qt consistency audit."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    """rows: (source, n_chars)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(["x" * n for _, n in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array([s for s, _ in rows]),
                "n_chars": pa.array([n for _, n in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_tier_latency_hand_computed(ray_session, tmp_path):
    # src0 -> k=0 even -> prod; src1 -> staging; src3 -> staging
    # qt quarters = n_chars % 128: 10 -> 2.5s; 5 -> 1.25s; 3 -> 0.75s
    _write_docs(tmp_path, [("src0", 10), ("src1", 5), ("src3", 3)])
    from mysql_log_parser_ray.pipelines.queries import q_slowlog_tier_latency

    out = q_slowlog_tier_latency(str(tmp_path))
    got = {r.tier: (r.n_queries, r.sum_qt) for r in out.itertuples()}
    assert got == {"prod": (1, 2.5), "staging": (2, 2.0)}


def test_formats_consistency_flags_equal(ray_session, tmp_path):
    # identical derivations -> every db row must be consistent = 1
    _write_docs(tmp_path, [("src0", 10), ("src0", 11), ("src1", 12)])
    from mysql_log_parser_ray.pipelines.queries import (
        q_formats_qt_consistency,
    )

    out = q_formats_qt_consistency(str(tmp_path))
    assert len(out) > 0
    assert (out["consistent"] == 1).all()
    assert (out["n_slow"] == out["n_json"]).all()
    assert (out["sum_qt_slow"] == out["sum_qt_json"]).all()
