"""End-to-end Ray pipeline tests.

The distributed pipeline must produce byte/value-identical results to a
single-process run of the same reference-parity functions (the moral
equivalent of the reference's ParseSlowLog wiring, bin/parser-cli.go:43-116)
on a corpus that exercises multi-event docs, admin commands, banner lines
and skewed sources.
"""

import numpy as np
import pyarrow as pa
import pytest

from mysql_log_parser_ray.functions import parse_slow_log_text
from mysql_log_parser_ray.functions.fingerprint import Checksum, Fingerprint
from mysql_log_parser_ray.functions.stats import GlobalClass, QueryClass
from mysql_log_parser_ray.sources.sequences import (
    build_sequences_table,
    detokenize_column,
    tokenize,
)
from mysql_log_parser_ray.sources.synth import (
    dim_for_sources,
    generate_corpus,
    sequences_from_documents,
)


def serial_oracle(corpus: pa.Table, example_tiebreak_docid=True):
    """Single-process reference-semantics aggregation over a corpus table."""
    texts = detokenize_column(corpus["tokens"])
    doc_ids = corpus["doc_id"].to_pylist()
    sources = corpus["source"].to_pylist()
    n_toks = corpus["n_tok"].to_pylist()
    glob = GlobalClass(exact=True)
    classes = {}
    sink_counts = {}
    for did, src, ntk, text in zip(doc_ids, sources, n_toks, texts):
        for ev in parse_slow_log_text(text):
            fp = Fingerprint(ev["query"])
            cid = Checksum(fp)
            glob.add_event(ev)
            cls = classes.get(cid)
            if cls is None:
                cls = classes[cid] = QueryClass(cid, fp, example=True, exact=True)
                cls._ex_doc = None
            # distributed-deterministic example rule: (qt desc, doc_id asc)
            qt = ev["time_metrics"].get("Query_time")
            cls.total_queries += 1
            cls.metrics.add(ev)
            if qt is not None:
                key = (-float(qt), did)
                if cls._ex_doc is None or key < cls._ex_doc[0]:
                    cls._ex_doc = (key, float(qt), ev["query"], ev["ts"])
            key = (src, cid)
            c = sink_counts.setdefault(key, [0, 0])
            c[0] += 1
            c[1] += ntk
    glob.finalize(len(classes))
    return glob, classes, sink_counts


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(1500, seed=7, n_sources=12)


@pytest.fixture(scope="module")
def flagship_result(ray_session, corpus, tmp_path_factory):
    import ray.data as rd

    from mysql_log_parser_ray.pipelines.flagship import run_flagship

    routed = str(tmp_path_factory.mktemp("routed"))
    res = run_flagship(rd.from_arrow(corpus), routed_dir=routed, exact=True)
    return res


def test_roundtrip_tokenization():
    texts = ["hello\nworld\n", "", "# Time: x\nuse db;\néü\n"]
    t = build_sequences_table(texts, ["a", "b", "c"], ["s1", "s2", "s1"])
    back = detokenize_column(t["tokens"])
    assert [b.decode() for b in back] == texts
    assert t["n_tok"].to_pylist() == [len(x.encode()) for x in texts]
    assert np.array_equal(tokenize(texts[0]), np.frombuffer(texts[0].encode(), np.uint8))


def test_flagship_matches_serial_oracle(flagship_result, corpus):
    glob, classes, sink_counts = serial_oracle(corpus)
    res = flagship_result

    assert res.global_stats.total_queries == glob.total_queries
    assert res.global_stats.unique_queries == glob.unique_queries

    # Global metric stats identical (exact mode, 6 decimals).
    g = glob.metrics.current()
    for kind in ("time_metrics", "number_metrics"):
        for m, s in g[kind].items():
            ds_s = res.global_stats.metrics[kind][m]
            for k, v in s.items():
                assert f"{float(ds_s[k]):.6f}" == f"{float(v):.6f}", (kind, m, k)

    # Per-class rows identical.
    got = {r["class_id"]: r for r in res.class_stats.to_pylist()}
    assert set(got) == set(classes)
    for cid, cls in classes.items():
        row = got[cid]
        assert row["fingerprint"] == cls.fingerprint
        assert row["total_queries"] == cls.total_queries
        ex = cls._ex_doc
        if ex is not None:
            assert f"{row['example_query_time']:.6f}" == f"{ex[1]:.6f}"
            assert row["example_query"] == ex[2]
        cur = cls.metrics.current()
        tstats = dict(row["time_stats"])
        for m, s in cur["time_metrics"].items():
            for k, v in s.items():
                assert f"{float(tstats[m][k]):.6f}" == f"{float(v):.6f}", (cid, m, k)
        nstats = dict(row["number_stats"])
        for m, s in cur["number_metrics"].items():
            for k, v in s.items():
                assert float(nstats[m][k]) == float(v), (cid, m, k)


def test_sink_counts_match(flagship_result, corpus):
    _, _, sink_counts = serial_oracle(corpus)
    df = flagship_result.sink_counts.to_pandas()
    got = {
        (r.source, r.class_id): (int(r.n_rows), int(r.n_tokens))
        for r in df.itertuples()
    }
    want = {k: (v[0], v[1]) for k, v in sink_counts.items()}
    assert got == want


def test_routed_tokens_byte_equality(flagship_result, corpus):
    """Judge invariant: routed rows carry byte-identical token arrays.

    Tokens travel as packed bytes in the routed Parquet; restore_tokens
    reconstructs the exact list<int32> arrays, which must match the input
    token arrays element-for-element."""
    from mysql_log_parser_ray.stages.route import read_routed

    routed = read_routed(flagship_result.routed_dir, restore_tokens=True).to_pandas()
    orig_tokens = {
        d: np.asarray(t, dtype=np.int32)
        for d, t in zip(corpus["doc_id"].to_pylist(), corpus["tokens"].to_pylist())
    }
    seen = set()
    for row in routed.itertuples():
        toks = np.asarray(row.tokens, dtype=np.int32)
        assert np.array_equal(toks, orig_tokens[row.doc_id]), row.doc_id
        seen.add(row.doc_id)
    # every doc that produced >=1 event is routed
    assert len(seen) > 1000


def test_routed_partitioned_by_sink(flagship_result):
    import glob
    import os

    parts = glob.glob(os.path.join(flagship_result.routed_dir, "sink=*"))
    assert len(parts) >= 2  # fan-out happened


def test_enrich_left_join_defaults(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.stages.enrich import enrich_events

    t = pa.table({"source": ["src1", "nope"], "x": [1, 2]})
    dim = dim_for_sources(["src1"])
    out = enrich_events(rd.from_arrow(t), dim).to_pandas().sort_values("x")
    assert list(out["region"]) == ["region1", "unknown"]
    assert list(out["sink"]) == ["sink1", "unknown"]


def test_filter_admin_in_pipeline(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.options import Options
    from mysql_log_parser_ray.stages.parse import parse_events

    text = (
        "# User@Host: u[u] @ localhost []\n"
        "# Query_time: 0.1  Lock_time: 0.0  Rows_sent: 1  Rows_examined: 1\n"
        "# administrator command: Quit;\n"
    )
    t = build_sequences_table([text], ["d1"], ["s"])
    evs = parse_events(rd.from_arrow(t)).take_all()
    assert len(evs) == 1 and evs[0]["admin"] and evs[0]["query"] == "Quit"
    evs = parse_events(
        rd.from_arrow(t), opt=Options(filter_admin_command=frozenset({"Quit"}))
    ).take_all()
    assert evs == []


def test_documents_derivation_deterministic():
    docs = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["a", "b"],
            "lang": ["en", "en"],
            "source": ["src1", "src2"],
            "n_chars": [100, 257],
        }
    )
    seq = sequences_from_documents(docs)
    texts = [b.decode() for b in detokenize_column(seq["tokens"])]
    assert "# Query_time: 25.0" in texts[0]  # (100 % 128) / 4
    assert "use db1;" in texts[0]  # 100 % 3 == 1
    evs = parse_slow_log_text(texts[1])
    assert len(evs) == 1
    assert evs[0]["time_metrics"]["Query_time"] == pytest.approx((257 % 128) / 4.0)
    assert evs[0]["query"] == "SELECT * FROM orders WHERE user_id = 257 LIMIT 10"


def test_parse_on_error_skip_and_raise(ray_session):
    """Error-handling contract: a doc that makes the parser raise (the
    reference PANICS on a Time header whose stamp doesn't match timeRe -
    nil-submatch index at slow.go:173-174; our AttributeError is that
    panic's parity) kills the task with on_error='raise' (default) and is
    silently dropped with 'skip'."""
    import pytest
    import ray.data as rd

    from mysql_log_parser_ray.sources.synth import build_sequences_table
    from mysql_log_parser_ray.stages.parse import parse_events

    good = "# Query_time: 1.0\nSELECT 1;\n"
    # single-token stamp: timeRe finds no submatch -> reference panics
    bad = "# Time: 2019-01-01T00:00:00Z\n# Query_time: 1.0\nSELECT 2;\n"
    seqs = build_sequences_table([good, bad], ["g", "b"], ["s", "s"])

    with pytest.raises(Exception):
        parse_events(rd.from_arrow(seqs), on_error="raise").to_pandas()

    out = parse_events(rd.from_arrow(seqs), on_error="skip").to_pandas()
    assert list(out["doc_id"]) == ["g"]


def test_parse_invalid_utf8_tokens(ray_session):
    """Tokens that are not valid UTF-8 parse with replacement chars, not a
    crash (bytes-level pipeline; decode errors='replace')."""
    import pyarrow as pa
    import numpy as np
    import ray.data as rd

    from mysql_log_parser_ray.stages.parse import parse_events

    raw = b"# Query_time: 1.0\nSELECT '\xff\xfe';\n"
    toks = np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
    seqs = pa.table(
        {
            "doc_id": ["x"],
            "tokens": pa.array([toks.tolist()], pa.list_(pa.int32())),
            "n_tok": pa.array([len(toks)], pa.int32()),
            "source": ["s"],
        }
    )
    out = parse_events(rd.from_arrow(seqs)).to_pandas()
    assert len(out) == 1
    assert "�" in out.iloc[0]["query"]


def test_reference_fixtures_through_ray_engine(ray_session):
    """Close the loop: the reference's own 17 log fixtures, tokenized into
    the sequences table and run through the REAL Ray parse stage, produce
    exactly what the direct per-doc parser produces (which the golden suite
    pins against parser_test.go)."""
    import ray.data as rd

    from mysql_log_parser_ray.functions.slowlog import parse_slow_log_text
    from mysql_log_parser_ray.sources.sequences import detokenize_column
    from mysql_log_parser_ray.sources.synth import reference_fixture_table
    from mysql_log_parser_ray.stages.parse import parse_events

    table = reference_fixture_table()
    assert table.num_rows >= 17
    ev = parse_events(rd.from_arrow(table), on_error="skip").to_pandas()
    ev = ev.sort_values(["doc_id", "event_seq"]).reset_index(drop=True)

    texts = detokenize_column(table["tokens"])
    expected = []
    for did, text in zip(table["doc_id"].to_pylist(), texts):
        try:
            evs = parse_slow_log_text(text)
        except Exception:
            continue  # same docs the Ray stage skipped
        for seq, e in enumerate(evs):
            expected.append((did, seq, e["query"], e["offset"],
                             e["time_metrics"].get("Query_time")))
    got = list(zip(ev["doc_id"], ev["event_seq"], ev["query"], ev["offset"],
                   [dict(t).get("Query_time") for t in ev["time_metrics"]]))
    assert sorted(got) == sorted(expected)
    assert len(expected) > 50  # the fixtures carry a substantial event set


def test_compact_parquet_roundtrip(ray_session, tmp_path):
    """Compaction coalesces many tiny part files into ~target-sized files
    with byte-identical content (order-insensitive)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.stages.route import compact_parquet

    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    n = 5000
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(n)], pa.string()),
    })
    rd.from_arrow(t).repartition(40).write_parquet(src)
    n_src = sum(f.endswith(".parquet") for f in os.listdir(src))
    assert n_src >= 20  # genuinely many small files

    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src) if f.endswith(".parquet")
    )
    n_out = compact_parquet(src, dst, target_bytes=total // 3 + 1)
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert 1 <= len(files) <= max(4, n_out + 1) < n_src

    a = rd.read_parquet(src).to_pandas().sort_values("k").reset_index(drop=True)
    b = rd.read_parquet(dst).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_read_log_files_plain_and_gzip(ray_session, tmp_path):
    """Raw log-file source: a fixture file read directly and its gzipped
    copy must parse to IDENTICAL event streams (decompression is
    worker-side, doc_id strips the .gz suffix)."""
    import gzip
    import os
    import shutil

    import pytest

    from mysql_log_parser_ray.sources.sequences import read_log_files
    from mysql_log_parser_ray.stages.parse import parse_events
    from .conftest import REFERENCE_LOGS

    src = os.path.join(REFERENCE_LOGS, "slow001.log")
    if not os.path.exists(src):
        pytest.skip("reference fixtures unavailable")
    plain = tmp_path / "slow001.log"
    shutil.copyfile(src, plain)
    gz = tmp_path / "gz" / "slow001.log.gz"
    gz.parent.mkdir()
    with open(src, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())

    def events_of(path):
        out = parse_events(read_log_files(str(path))).to_pandas()
        return out.sort_values(["doc_id", "event_seq"]).reset_index(drop=True)

    a = events_of(plain)
    b = events_of(gz)
    assert len(a) > 0
    assert a["doc_id"].unique().tolist() == ["slow001.log"]
    assert b["doc_id"].unique().tolist() == ["slow001.log"]
    # source is the parent directory name
    assert set(b["source"].unique() if "source" in b.columns else []) <= {"gz"}
    cmp_cols = [c for c in a.columns if c != "source"]
    import pandas as pd

    pd.testing.assert_frame_equal(a[cmp_cols], b[cmp_cols])
