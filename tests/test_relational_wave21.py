"""Unit tests for the wave-21 pair: genlog Connect-session audit per
(db, user) and jsonlog per-db latency totals (closed-form derivation
checks on tiny documents fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, n_chars_list):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(n_chars_list)), pa.int64()),
                "text": pa.array(["x" * n for n in n_chars_list]),
                "lang": pa.array(["en"] * len(n_chars_list)),
                "source": pa.array(["src0"] * len(n_chars_list)),
                "n_chars": pa.array(n_chars_list, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_genlog_connections_hand_computed(ray_session, tmp_path):
    # n_chars 0 -> db0/u0; 1 -> db1/u1; 4 -> db1/u4; 6 -> db0/u1
    _write_docs(tmp_path, [0, 1, 4, 6, 6])
    from mysql_log_parser_ray.pipelines.queries import (
        q_genlog_connections_by_db,
    )

    out = q_genlog_connections_by_db(str(tmp_path))
    got = {(r.db, r.user): r.n_connects for r in out.itertuples()}
    assert got == {("db0", "u0"): 1, ("db1", "u1"): 1, ("db1", "u4"): 1,
                   ("db0", "u1"): 2}


def test_genlog_connections_one_per_session(ray_session, tmp_path):
    # each doc emits Connect + Query + Quit: only the Connect counts
    _write_docs(tmp_path, [3])
    from mysql_log_parser_ray.pipelines.queries import (
        q_genlog_connections_by_db,
    )

    out = q_genlog_connections_by_db(str(tmp_path))
    assert int(out["n_connects"].sum()) == 1


def test_jsonlog_qt_by_db_hand_computed(ray_session, tmp_path):
    # qt = (n_chars % 128) / 4: n_chars 10 -> 2.5 (db1), 130 -> 0.5 (db1),
    # 2 -> 0.5 (db2)
    _write_docs(tmp_path, [10, 130, 2])
    from mysql_log_parser_ray.pipelines.queries import q_jsonlog_qt_by_db

    out = q_jsonlog_qt_by_db(str(tmp_path))
    got = {r.db: (r.n_queries, r.sum_qt) for r in out.itertuples()}
    assert got == {"db1": (2, 3.0), "db2": (1, 0.5)}
