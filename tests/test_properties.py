"""Property-based invariants (hypothesis): GK sketch error bound,
tokenization round-trip, fingerprint totality, fast-path equivalence over
generated slow-log docs."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

# ---------------------------------------------------------------------------
# GK sketch: eps-rank guarantee, including after merges
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
             min_size=1, max_size=3000),
    st.integers(min_value=1, max_value=5),
)
def test_gk_rank_error_bound(vals, n_chunks):
    from mysql_log_parser_ray.state.gk import GKSummary

    eps = 0.01
    chunks = np.array_split(np.asarray(vals, dtype=np.float64), n_chunks)
    sketches = []
    for c in chunks:
        g = GKSummary(eps)
        if len(c):
            g.add_many(c)
        sketches.append(g)
    merged = GKSummary.merge_all(sketches)
    # merging k eps-summaries yields a (k*eps)-ish summary in the worst
    # case; the implementation compresses, so allow 2*k*eps slack
    slack = 2 * n_chunks * eps
    s = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(s)
    for phi in (0.0, 0.25, 0.5, 0.75, 0.95, 1.0):
        v = merged.query(phi)
        lo = np.searchsorted(s, v, side="left")
        hi = np.searchsorted(s, v, side="right")
        target = phi * n
        assert lo - slack * n - 1 <= target <= hi + slack * n + 1


# ---------------------------------------------------------------------------
# tokenize / detokenize round-trip
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=200), min_size=1, max_size=10))
def test_tokenize_roundtrip(texts):
    from mysql_log_parser_ray.sources.sequences import (
        build_sequences_table,
        detokenize_column,
    )

    t = build_sequences_table(
        texts, [f"d{i}" for i in range(len(texts))], ["s"] * len(texts)
    )
    back = detokenize_column(t["tokens"])
    assert [b.decode("utf-8") for b in back] == texts
    assert t["n_tok"].to_pylist() == [len(x.encode("utf-8")) for x in texts]


# ---------------------------------------------------------------------------
# fingerprint totality + basic invariants
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_fingerprint_total_and_checksum_shape(q):
    from mysql_log_parser_ray.functions.fingerprint import Checksum, Fingerprint

    fp = Fingerprint(q)  # must never raise
    cs = Checksum(fp)
    assert len(cs) == 16
    assert cs == cs.upper()
    # deterministic
    assert Fingerprint(q) == fp and Checksum(fp) == cs


# ---------------------------------------------------------------------------
# fast-path equivalence over GENERATED docs (generalizes the fixture-based
# differential test)
# ---------------------------------------------------------------------------

_metric_name = st.sampled_from(
    ["Query_time", "Lock_time", "Rows_sent", "Rows_examined", "Thread_id",
     "InnoDB_IO_r_wait", "QC_Hit", "Full_scan", "Schema",
     "Log_slow_rate_type", "Log_slow_rate_limit"]
)
_metric_val = st.sampled_from(
    ["0.000255", "1", "Yes", "No", "42", "session", "db7", "1.5e-3", ""]
)
_query_line = st.sampled_from(
    [
        "SELECT c FROM t WHERE id=5;",
        "select * from x",
        "UPDATE t SET timestamp=3;",   # unanchored-SET skip case
        "# looks like a header",
        "use otherdb;",
        "SET timestamp=1400000000;",
        "INSERT INTO t VALUES (1, 'a;b');",
        "Tcp port: 3306  Unix socket: /var/lib/mysql.sock with:",
    ]
)


@st.composite
def _doc(draw):
    lines = []
    if draw(st.booleans()):
        lines.append("# Time: 071218 11:48:27")
    if draw(st.booleans()):
        lines.append("# User@Host: bob[bob] @ localhost []")
    n_metric_lines = draw(st.integers(min_value=0, max_value=3))
    for _ in range(n_metric_lines):
        pairs = draw(st.lists(st.tuples(_metric_name, _metric_val),
                              min_size=1, max_size=4))
        lines.append("# " + "  ".join(f"{k}: {v}" for k, v in pairs))
    if draw(st.booleans()):
        lines.append("# administrator command: Quit;")
    n_q = draw(st.integers(min_value=0, max_value=3))
    for _ in range(n_q):
        lines.append(draw(_query_line))
    return "\n".join(lines) + ("\n" if draw(st.booleans()) else "")


@settings(max_examples=150, deadline=None)
@given(st.lists(_doc(), min_size=1, max_size=3))
def test_fast_path_equivalence_generated(docs):
    """Single- AND multi-event docs (concatenations) through the full
    dispatcher vs the state machine."""
    from mysql_log_parser_ray.functions.slowlog import (
        SlowLogDocParser,
        _parse_fast,
        parse_slow_log_text,
    )

    text = "".join(d if d.endswith("\n") else d + "\n" for d in docs)
    try:
        slow = SlowLogDocParser().run(text.encode("utf-8"), 0)
        slow_exc = None
    except Exception as e:
        slow, slow_exc = None, e
    try:
        dispatched = parse_slow_log_text(text)
        disp_exc = None
    except Exception as e:
        dispatched, disp_exc = None, e
    # the state machine is the spec: both raise, or both succeed equally
    if slow_exc is None:
        assert disp_exc is None, f"dispatcher crashed, machine didn't: {text!r}"
        assert dispatched == slow, f"dispatcher divergence on: {text!r}"
        fast = _parse_fast(text)
        if fast is not None:
            assert fast == slow, f"divergence on: {text!r}"
    else:
        assert disp_exc is not None, (
            f"machine raised (panic parity) but dispatcher returned: {text!r}"
        )


# ---------------------------------------------------------------------------
# Wave-3/4 vectorized kernels vs brute-force references
# ---------------------------------------------------------------------------

_ts_strategy = st.integers(min_value=0, max_value=48 * 3600)  # seconds in 2 days


@settings(max_examples=10, deadline=None)
@given(
    st.lists(_ts_strategy, min_size=1, max_size=60),
    st.lists(st.tuples(st.integers(0, 47), st.integers(1, 6)),
             min_size=1, max_size=12),
)
def test_interval_join_matches_bruteforce(ray_session, fact_secs, window_specs):
    """Vectorized candidate-bounded probe == O(n*m) nested-loop reference
    on arbitrary (possibly duplicate-start, overlapping) window layouts."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.stages.interval import interval_join_counts

    H = 3_600_000_000
    base = 1704067200 * 1_000_000
    starts = np.array(sorted(base + s * H for s, _ in window_specs), dtype=np.int64)
    widths = np.array([w for _, w in window_specs], dtype=np.int64)
    ends = starts + widths * H
    ts = np.array([base + s * 1_000_000 for s in fact_secs], dtype=np.int64)
    facts = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(["x"] * len(ts), pa.string()),
            }
        )
    )
    got = interval_join_counts(facts, starts, ends)
    want = {}
    for t in ts:
        for wid, (s, e) in enumerate(zip(starts, ends)):
            if s <= t < e:
                want[(wid, "x")] = want.get((wid, "x"), 0) + 1
    got_d = {(int(r.window_id), r.event_type): int(r.n_events)
             for r in got.itertuples()}
    assert got_d == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), _ts_strategy, st.integers(0, 50000)),
        min_size=1, max_size=80,
    )
)
def test_rolling_max3_matches_bruteforce(ray_session, rows):
    """Bucketed shifted-compare rolling max == per-user sorted window scan."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_events_rolling_max3

    d = tempfile.mkdtemp(prefix="mlpr_prop_")
    import shutil

    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [1704067200_000_000 + r[1] * 1_000_000 for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["t"] * len(rows), pa.string()),
            "value": pa.array([r[2] / 100.0 for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, f"{d}/events.parquet")
    try:
        got = q_events_rolling_max3(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    # brute force: per user, sort by (ts, event_id), window max of last 3
    per_user = {}
    for eid, (u, s, v) in enumerate(rows):
        per_user.setdefault(u, []).append((s, eid, int(np.floor(v / 100.0 * 100 + 0.5))))
    total = 0
    n = 0
    for u, evs in per_user.items():
        evs.sort()
        for i in range(len(evs)):
            total += max(c for _, _, c in evs[max(0, i - 2): i + 1])
            n += 1
    assert int(got["n"].sum()) == n
    assert int(got["rollmax_cents"].sum()) == total


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 7200),
                  st.sampled_from(["click", "purchase", "view"])),
        min_size=1, max_size=60,
    )
)
def test_conversion_attribution_matches_bruteforce(ray_session, rows):
    """Forward-fill attribution == quadratic same-user window scan."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mysql_log_parser_ray.pipelines.queries import q_conversion_attribution

    d = tempfile.mkdtemp(prefix="mlpr_prop_")
    import shutil

    base = 1704067200_000_000
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([base + r[1] * 1_000_000 for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, f"{d}/events.parquet")
    try:
        got = q_conversion_attribution(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    W = 30 * 60
    n_p, n_c = 0, 0
    for u, s, k in rows:
        if k != "purchase":
            continue
        n_p += 1
        if any(u2 == u and k2 == "click" and s - W <= s2 <= s
               for u2, s2, k2 in rows):
            n_c += 1
    assert int(got["n_purchases"].sum()) == n_p
    assert int(got["n_converted"].sum()) == n_c


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                    max_size=24),
            st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                    max_size=24),
        ),
        min_size=1, max_size=20,
    )
)
def test_levenshtein_pairs_matches_duckdb(pairs):
    """The pair-vectorized DP kernel must agree with DuckDB's
    levenshtein() on arbitrary printable-ASCII strings (the oracle
    engine for doc_prefix_editsim)."""
    import duckdb

    from mysql_log_parser_ray.training.text import levenshtein_pairs

    W = 24
    P = len(pairs)
    A = np.zeros((P, W), np.uint8)
    B = np.zeros((P, W), np.uint8)
    la = np.zeros(P, np.int64)
    lb = np.zeros(P, np.int64)
    for i, (a, b) in enumerate(pairs):
        ab, bb = a.encode("ascii"), b.encode("ascii")
        A[i, : len(ab)] = np.frombuffer(ab, np.uint8)
        B[i, : len(bb)] = np.frombuffer(bb, np.uint8)
        la[i], lb[i] = len(ab), len(bb)
    got = levenshtein_pairs(A, B, la, lb).tolist()
    con = duckdb.connect()
    want = [
        con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for a, b in pairs
    ]
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                    max_size=24),
            st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                    max_size=24),
        ),
        min_size=1, max_size=20,
    )
)
def test_levenshtein_banded_agrees_under_threshold(pairs):
    """Ukkonen banding contract: distances <= max_dist equal the exact
    kernel; distances > max_dist stay classified > max_dist (the caller
    thresholds, never reads the exact value past the band)."""
    from mysql_log_parser_ray.training.text import levenshtein_pairs

    W, K = 24, 4
    P = len(pairs)
    A = np.zeros((P, W), np.uint8)
    B = np.zeros((P, W), np.uint8)
    la = np.zeros(P, np.int64)
    lb = np.zeros(P, np.int64)
    for i, (a, b) in enumerate(pairs):
        ab, bb = a.encode("ascii"), b.encode("ascii")
        A[i, : len(ab)] = np.frombuffer(ab, np.uint8)
        B[i, : len(bb)] = np.frombuffer(bb, np.uint8)
        la[i], lb[i] = len(ab), len(bb)
    exact = levenshtein_pairs(A, B, la, lb)
    banded = levenshtein_pairs(A, B, la, lb, max_dist=K)
    under = exact <= K
    assert (banded[under] == exact[under]).all()
    assert (banded[~under] > K).all()
