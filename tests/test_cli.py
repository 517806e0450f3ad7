"""CLI surface: python -m mysql_log_parser_ray {synth,run,report}.

Runs main() in-process against the session Ray (the guarded init must NOT
shut down a session it didn't start)."""

import json

import pytest


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    from mysql_log_parser_ray.sources.synth import generate_corpus

    out = str(tmp_path_factory.mktemp("cli") / "corpus")
    generate_corpus(600, seed=7, n_sources=8, out_path=out)
    return out


def test_cli_run_json(corpus, capsys):
    from mysql_log_parser_ray.cli import main

    assert main(["run", corpus, "--json", "--exact"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events"] >= 600  # multi-event docs push this above n_docs
    assert out["unique_classes"] > 0
    assert out["events_per_sec"] > 0
    assert not out["mixed_rate_limits"]


def test_cli_report(corpus, capsys):
    from mysql_log_parser_ray.cli import main

    assert main(["report", corpus]) == 0
    text = capsys.readouterr().out
    lines = text.splitlines()
    assert lines[0].startswith("Events: ")
    # quantile table at 5% steps: 21 rows for the global metric
    assert sum("pct query time" in l and not l.startswith("  ") for l in lines) == 21
    assert any(l.startswith("Real 95pct") for l in lines)
    assert any(l.startswith("histo [") for l in lines)
    # hot-class drill-down (> total/10) appears with indented sub-report
    assert any(l.startswith("Query ID ") for l in lines)


def test_cli_leaves_host_ray_session_alive(corpus):
    import ray

    from mysql_log_parser_ray.cli import main

    main(["report", corpus])
    assert ray.is_initialized()


def test_cli_run_resumable(corpus, capsys, tmp_path):
    from mysql_log_parser_ray.cli import main

    out_dir = str(tmp_path / "resume_out")
    assert main(["run", corpus, "--resume-dir", out_dir, "--json"]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # second run resumes: all shards committed, identical results
    assert main(["run", corpus, "--resume-dir", out_dir, "--json"]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["events"] == second["events"]
    assert first["unique_classes"] == second["unique_classes"]
    assert first["sinks"] == second["sinks"]


def test_cli_dump_matches_parser_golden(ray_session, capsys, tmp_path):
    """`dump` must emit exactly the events the per-doc parser produces for
    the reference's slow001 fixture (test/test.go:196-199 parity)."""
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.cli import main
    from mysql_log_parser_ray.functions import parse_slow_log_text
    from mysql_log_parser_ray.sources.synth import build_sequences_table

    from .conftest import read_log

    text = read_log("slow001.log")
    path = str(tmp_path / "seq.parquet")
    pq.write_table(build_sequences_table([text], ["slow001"], ["s0"]), path)

    assert main(["dump", path]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    got = [json.loads(l) for l in lines]
    want = parse_slow_log_text(text)
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        assert g["query"] == w["query"]
        assert g["user"] == w["user"]
        assert g["db"] == w["db"]
        assert g["offset"] == w["offset"]
        assert g["ts"] == w["ts"]
        assert g["time_metrics"]["Query_time"] == pytest.approx(
            w["time_metrics"]["Query_time"]
        )
        assert g["doc_id"] == "slow001" and g["source"] == "s0"
        assert g["fingerprint"] and g["class_id"]


def test_cli_dump_limit_and_file_out(corpus, capsys, tmp_path):
    out_path = str(tmp_path / "events.jsonl")
    from mysql_log_parser_ray.cli import main

    assert main(["dump", corpus, "--limit", "5", "--out", out_path]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["events"] == 5
    with open(out_path) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert len(rows) == 5 and all("class_id" in r for r in rows)


def test_dump_debug_with_three_arg_parser(ray_session, capsys, tmp_path):
    """Review fix: Options.debug must not crash parsers registered with
    the documented 3-arg signature (debug silently unavailable for them)."""
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.cli import main
    from mysql_log_parser_ray.functions.slowlog import new_event
    from mysql_log_parser_ray.sources.synth import build_sequences_table
    from mysql_log_parser_ray.stages.parse import PARSER_REGISTRY, register_parser

    def three_arg_parser(text, start_offset=0, filter_admin_command=frozenset()):
        ev = new_event()
        ev["query"] = "SELECT legacy"
        ev["time_metrics"]["Query_time"] = 1.0
        return [ev]

    register_parser("legacyfmt", three_arg_parser)
    try:
        path = str(tmp_path / "seq.parquet")
        pq.write_table(build_sequences_table([b"x\n"], ["d0"], ["s0"]), path)
        assert main(["dump", path, "--fmt", "legacyfmt", "--debug"]) == 0
        rows = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()]
        assert len(rows) == 1 and rows[0]["query"] == "SELECT legacy"
    finally:
        PARSER_REGISTRY.pop("legacyfmt", None)
