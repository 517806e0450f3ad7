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
