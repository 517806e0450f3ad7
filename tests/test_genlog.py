"""General-log format: parser goldens + format-registry dispatch.

The reference only implements the slow log; its parser.go:3-4 interface is
the intended plugin point for formats like this one, so these goldens are
ours (format per MySQL's classic general query log)."""

import pyarrow as pa
import pytest

from mysql_log_parser_ray.functions.genlog import parse_general_log_text

SAMPLE = (
    "070823 21:01:10\t      1 Connect\troot@localhost on test1\n"
    "\t\t      1 Query\tSELECT * FROM t WHERE id = 7\n"
    "070823 21:01:12\t      2 Init DB\ttest2\n"
    "\t\t      1 Query\tSELECT a,\n"
    "       b FROM t2\n"
    "\t\t      1 Quit\t\n"
)


def test_parse_basic_session():
    evs = parse_general_log_text(SAMPLE)
    assert [e["query"] for e in evs] == [
        "Connect",
        "SELECT * FROM t WHERE id = 7",
        "Init DB test2",
        "SELECT a,\n       b FROM t2",
        "Quit",
    ]
    assert [e["admin"] for e in evs] == [True, False, True, False, True]
    assert evs[0]["user"] == "root"
    assert evs[0]["host"] == "localhost"
    assert evs[0]["db"] == "test1"
    assert evs[0]["ts"] == "070823 21:01:10"
    assert evs[1]["ts"] == ""  # continuation-style line carries no stamp
    assert evs[2]["ts"] == "070823 21:01:12"
    assert [e["number_metrics"]["Thread_id"] for e in evs] == [1, 1, 2, 1, 1]
    # offsets are absolute byte positions of each event's first line
    assert evs[0]["offset"] == 0
    assert evs[1]["offset"] == SAMPLE.index("\t\t      1 Query")


def test_filter_admin_command():
    evs = parse_general_log_text(SAMPLE, filter_admin_command=frozenset({"Quit"}))
    assert "Quit" not in [e["query"] for e in evs]
    assert len(evs) == 4
    # Connect is a distinct admin command - not filtered by Quit
    assert evs[0]["query"] == "Connect"


def test_empty_and_garbage():
    assert parse_general_log_text("") == []
    # pure garbage with no event start is dropped (no event to attach to)
    assert parse_general_log_text("not a log line\nanother\n") == []


def test_registry_dispatch(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.sources.synth import build_sequences_table
    from mysql_log_parser_ray.stages.parse import PARSER_REGISTRY, parse_events

    assert set(PARSER_REGISTRY) >= {"slowlog", "genlog"}
    seqs = build_sequences_table([SAMPLE], ["d0"], ["src0"])
    ev = parse_events(rd.from_arrow(seqs), fmt="genlog").to_pandas()
    assert len(ev) == 5
    assert list(ev["event_seq"]) == [0, 1, 2, 3, 4]
    # fingerprint/checksum run through the same chain as slowlog events
    q = ev[ev["event_seq"] == 1].iloc[0]
    assert q["fingerprint"] == "select * from t where id = ?"
    assert len(q["class_id"]) == 16


# ---------------------------------------------------------------------------
# jsonlog format
# ---------------------------------------------------------------------------

def test_jsonlog_basic():
    from mysql_log_parser_ray.functions.jsonlog import parse_json_log_text

    text = (
        '{"ts":"100","user":"u1","query":"SELECT 1","query_time":0.5,'
        '"rows_sent":3,"full_scan":true}\n'
        'garbage not json\n'
        '{"admin":true,"query":"Quit"}\n'
        '{"query":"SELECT 2","io_wait":1.25,"thread_id":9}\n'
    )
    evs = parse_json_log_text(text)
    assert len(evs) == 3  # garbage line skipped
    e0 = evs[0]
    assert e0["ts"] == "100" and e0["user"] == "u1"
    assert e0["time_metrics"]["query_time"] == 0.5
    assert e0["number_metrics"]["rows_sent"] == 3
    assert e0["bool_metrics"]["full_scan"] is True
    assert evs[1]["admin"] and evs[1]["query"] == "Quit"
    assert evs[2]["time_metrics"]["io_wait"] == 1.25
    assert evs[2]["number_metrics"]["thread_id"] == 9
    # offsets are line starts
    assert evs[1]["offset"] == text.index('{"admin"')


def test_jsonlog_filter_admin():
    from mysql_log_parser_ray.functions.jsonlog import parse_json_log_text

    text = '{"admin":true,"query":"Quit"}\n{"query":"SELECT 1"}\n'
    evs = parse_json_log_text(text, filter_admin_command=frozenset({"Quit"}))
    assert len(evs) == 1 and evs[0]["query"] == "SELECT 1"


def test_jsonlog_registry_dispatch(ray_session):
    import ray.data as rd

    from mysql_log_parser_ray.sources.synth import build_sequences_table
    from mysql_log_parser_ray.stages.parse import parse_events

    seqs = build_sequences_table(
        ['{"query":"SELECT a FROM t WHERE x = 5","query_time":1.0}\n'],
        ["d0"], ["src0"],
    )
    ev = parse_events(rd.from_arrow(seqs), fmt="jsonlog").to_pandas()
    assert len(ev) == 1
    assert ev.iloc[0]["fingerprint"] == "select a from t where x = ?"


def test_genlog_continuation_not_misread_as_event():
    """Regression (code review): multi-line SQL continuation lines shaped
    like '<ws><digits> <words>' must stay part of the query, not start a
    fabricated event."""
    from mysql_log_parser_ray.functions.genlog import parse_general_log_text

    text = (
        "070823 21:01:10\t  1 Query\tSELECT x FROM t WHERE y IN (\n"
        "  2 UNION ALL\n"
        "  5 AS x\n"
        "\t\t  1 Quit\t\n"
    )
    evs = parse_general_log_text(text)
    assert [e["query"] for e in evs] == [
        "SELECT x FROM t WHERE y IN (\n  2 UNION ALL\n  5 AS x",
        "Quit",
    ]


def test_genlog_jsonlog_byte_offsets():
    """Offsets are BYTE positions even with multi-byte UTF-8 content."""
    from mysql_log_parser_ray.functions.genlog import parse_general_log_text
    from mysql_log_parser_ray.functions.jsonlog import parse_json_log_text

    g = "070823 21:01:10\t  1 Query\tSELECT 'héllo'\n\t\t  1 Quit\t\n"
    evs = parse_general_log_text(g)
    assert evs[1]["offset"] == len(g.split("\n")[0].encode("utf-8")) + 1

    j = '{"query":"séléct"}\n{"query":"x"}\n'
    evs = parse_json_log_text(j)
    assert evs[1]["offset"] == len('{"query":"séléct"}\n'.encode("utf-8"))
    # byte-offset resume replays the second line exactly
    resumed = parse_json_log_text(j.encode("utf-8"), start_offset=evs[1]["offset"])
    assert [e["query"] for e in resumed] == ["x"]


def test_jsonlog_nonfinite_numbers_yield_zero():
    """Regression (code review): NaN/Infinity numeric fields (json.loads
    accepts them) must not crash; parse failures yield 0 like slow.go:201."""
    from mysql_log_parser_ray.functions.jsonlog import parse_json_log_text

    text = '{"query":"q","rows":NaN,"big":Infinity,"w_time":NaN}\n'
    evs = parse_json_log_text(text)
    assert evs[0]["number_metrics"]["rows"] == 0
    assert evs[0]["number_metrics"]["big"] == 0


def test_genlog_start_offset_partial_line_discarded():
    """Resuming mid-line: the partial leading line is not a valid event
    start, so it is discarded and parsing resumes at the next event -
    the genlog analogue of slow016/slow017 partial-event discard."""
    from mysql_log_parser_ray.functions.genlog import parse_general_log_text

    text = (
        "070823 21:01:10\t  1 Query\tSELECT first\n"
        "070823 21:01:12\t  2 Query\tSELECT second\n"
    )
    data = text.encode("utf-8")
    mid = data.index(b"SELECT first")  # inside line 1
    evs = parse_general_log_text(data, start_offset=mid)
    assert [e["query"] for e in evs] == ["SELECT second"]
    # offsets remain absolute
    assert evs[0]["offset"] == data.index(b"070823 21:01:12")


def test_jsonlog_start_offset_mid_line():
    from mysql_log_parser_ray.functions.jsonlog import parse_json_log_text

    data = b'{"query":"a"}\n{"query":"b"}\n'
    evs = parse_json_log_text(data, start_offset=3)  # mid first line
    # the truncated first line fails json parse and is skipped
    assert [e["query"] for e in evs] == ["b"]
    assert evs[0]["offset"] == data.index(b'{"query":"b"}')


def test_genlog_modern_commands_recognized():
    """Regression (review 3): 8.0-era commands (Reset Connection, Binlog
    Dump GTID, Register Replica) are events, not continuation text."""
    from mysql_log_parser_ray.functions.genlog import parse_general_log_text

    text = (
        "070823 21:01:10\t  1 Query\tSELECT 1\n"
        "\t\t  2 Reset Connection\t\n"
        "\t\t  3 Binlog Dump GTID\tLog: x\n"
        "\t\t  4 Register Replica\t\n"
    )
    evs = parse_general_log_text(text)
    assert [e["query"] for e in evs] == [
        "SELECT 1",
        "Reset Connection",
        "Binlog Dump GTID Log: x",
        "Register Replica",
    ]


def test_ascii_whitespace_parity_with_oracle():
    """Regression (review 3): trailing \\n or \\t must give the same word
    count on the Ray side and the DuckDB oracle side."""
    import duckdb
    import pyarrow as pa

    from mysql_log_parser_ray.training.text import token_count_batch

    texts = ["w1 w2 w3\n", "\ta b\tc \n", "x"]
    batch = pa.table({"doc_id": [0, 1, 2], "text": texts})
    ray_counts = dict(zip(
        token_count_batch(batch)["doc_id"].to_pylist(),
        token_count_batch(batch)["n_ws_tokens"].to_pylist(),
    ))
    con = duckdb.connect()
    con.register("documents", batch.to_pandas())
    sql = (
        "SELECT doc_id, len(regexp_split_to_array("
        "trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),"
        " '[ \t\n\r\v\f]+')) AS n FROM documents"
    )
    oracle = dict(con.execute(sql).fetchall())
    assert ray_counts == {k: int(v) for k, v in oracle.items()}


def test_jsonlog_negative_int_yields_zero():
    """ADVICE parity fix: Go's ParseUint errors on a minus sign and the
    slow-log dispatch stores 0; negative JSON ints must do the same, not
    wrap mod 2^64."""
    from mysql_log_parser_ray.functions.jsonlog import parse_json_log_text

    evs = parse_json_log_text('{"query": "q", "Rows_sent": -3, "Bytes": 7}\n')
    assert evs[0]["number_metrics"]["Rows_sent"] == 0
    assert evs[0]["number_metrics"]["Bytes"] == 7
