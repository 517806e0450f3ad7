"""Stats golden tests from /root/reference/log/log_test.go:418-525, plus GK
sketch error-bound checks. slow010 pins the nearest-rank p95/median
convention (Pct95=2.034012, Med=0.192812 for 36 values)."""

import numpy as np
import pytest

from mysql_log_parser_ray.functions import parse_slow_log_text
from mysql_log_parser_ray.functions.stats import EventStats
from mysql_log_parser_ray.state.gk import GKSummary

from .conftest import read_log


def approx6(a, b):
    # The reference compares stats at 6 decimal places (test/test.go:130-137);
    # stats fields are float64 (of float32 event values), so no f32 coercion.
    assert f"{float(a):.6f}" == f"{float(b):.6f}", (a, b)


def build_stats(name, exact=True):
    events = parse_slow_log_text(read_log(name))
    stats = EventStats(exact=exact)
    for e in events:
        stats.add(e)
    return stats.current()


def test_stats_slow001(logs_dir):
    got = build_stats("slow001.log")
    qt = got["time_metrics"]["Query_time"]
    assert qt["cnt"] == 2
    approx6(qt["sum"], 4)
    approx6(qt["min"], 2)
    approx6(qt["avg"], 2)
    approx6(qt["pct95"], 2)
    approx6(qt["med"], 2)
    approx6(qt["max"], 2)
    lt = got["time_metrics"]["Lock_time"]
    assert lt["cnt"] == 2
    approx6(lt["sum"], 0)
    rs = got["number_metrics"]["Rows_sent"]
    assert rs == {"cnt": 2, "sum": 2, "min": 1, "avg": 1, "pct95": 1, "med": 1, "max": 1}
    re_ = got["number_metrics"]["Rows_examined"]
    assert re_["cnt"] == 2 and re_["sum"] == 0 and re_["max"] == 0


def test_stats_slow010(logs_dir):
    # 36 events; pins the (95*Cnt)//100 / (50*Cnt)//100 indices
    # (log_test.go:478-525, incl. deliberate divergence from Percona pqd).
    got = build_stats("slow010.log")
    qt = got["time_metrics"]["Query_time"]
    assert qt["cnt"] == 36
    approx6(qt["sum"], 22.703689)
    approx6(qt["min"], 0.000002)
    approx6(qt["avg"], 0.630658)
    approx6(qt["pct95"], 2.034012)  # pqd: 1.964363
    approx6(qt["med"], 0.192812)  # pqd: 0.198537
    approx6(qt["max"], 3.034012)
    lt = got["time_metrics"]["Lock_time"]
    assert lt["cnt"] == 36
    approx6(lt["sum"], 0)
    rs = got["number_metrics"]["Rows_sent"]
    assert rs == {"cnt": 36, "sum": 156, "min": 0, "avg": 4, "pct95": 6, "med": 1, "max": 99}


def test_stats_sketch_mode_close_to_exact(logs_dir):
    exact = build_stats("slow010.log", exact=True)
    approx = build_stats("slow010.log", exact=False)
    qt_e = exact["time_metrics"]["Query_time"]
    qt_a = approx["time_metrics"]["Query_time"]
    assert qt_a["cnt"] == qt_e["cnt"]
    approx6(qt_a["sum"], qt_e["sum"])
    approx6(qt_a["min"], qt_e["min"])
    approx6(qt_a["max"], qt_e["max"])
    # sketch percentile within one rank of exact at n=36
    vals = sorted(
        e["time_metrics"]["Query_time"]
        for e in parse_slow_log_text(read_log("slow010.log"))
    )
    rank = vals.index(min(vals, key=lambda v: abs(v - qt_a["pct95"])))
    assert abs(rank - (95 * 36) // 100) <= 1


def test_gk_rank_error_bound():
    rng = np.random.default_rng(7)
    data = rng.lognormal(0.0, 2.0, 100_000)
    parts = []
    for chunk in np.array_split(data, 23):
        p = GKSummary(0.01)
        p.add_many(chunk)
        parts.append(p)
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    m.compress()
    s = np.sort(data)
    for phi in np.linspace(0.02, 0.98, 25):
        est = m.query(phi)
        rank_err = abs(np.searchsorted(s, est) - phi * len(s)) / len(s)
        assert rank_err <= 0.01, (phi, rank_err)
    # summary stays small
    assert len(m) < 2000


def test_gk_serialization_roundtrip():
    g = GKSummary(0.01)
    g.add_many(np.arange(10_000, dtype=np.float64))
    g2 = GKSummary.from_bytes(g.to_bytes())
    assert g2.n == g.n
    assert abs(g2.query(0.5) - 5000) <= 200


def test_number_avg_is_integer_division():
    s = EventStats()
    for v in (1, 2):
        s.add({"time_metrics": {}, "number_metrics": {"X": v}, "bool_metrics": {}})
    assert s.current()["number_metrics"]["X"]["avg"] == 1  # 3 // 2


def test_bool_stats():
    s = EventStats()
    for v in (True, False, True):
        s.add({"time_metrics": {}, "number_metrics": {}, "bool_metrics": {"QC_Hit": v}})
    assert s.current()["bool_metrics"]["QC_Hit"] == {"cnt": 3, "true": 2}


def test_example_queries_off(ray_session):
    """Options.ExampleQueries=false parity (options.go:5, class.go:100):
    no literal query examples retained."""
    import ray.data as rd

    from mysql_log_parser_ray.options import Options
    from mysql_log_parser_ray.pipelines.flagship import run_flagship
    from mysql_log_parser_ray.sources.synth import generate_corpus

    corpus = generate_corpus(200, seed=13, n_sources=4)
    res_on = run_flagship(rd.from_arrow(corpus), exact=True)
    res_off = run_flagship(
        rd.from_arrow(corpus), exact=True, opt=Options(example_queries=False)
    )
    on = res_on.class_stats.to_pandas()
    off = res_off.class_stats.to_pandas()
    assert (on["example_query"] != "").any()
    assert (off["example_query"] == "").all()
    # everything else identical
    cols = ["class_id", "total_queries"]
    assert on[cols].sort_values(cols).reset_index(drop=True).equals(
        off[cols].sort_values(cols).reset_index(drop=True)
    )


def test_hll_accuracy_and_merge(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from mysql_log_parser_ray.state.hll import HyperLogLog, approx_distinct

    # accuracy: p=12 -> ~1.6% typical error; assert within 5%
    n = 20000
    h = HyperLogLog(12).add_many([f"v{i}" for i in range(n)])
    assert abs(h.estimate() - n) / n < 0.05
    # merge of disjoint halves == union
    a = HyperLogLog(12).add_many([f"v{i}" for i in range(0, n, 2)])
    b = HyperLogLog(12).add_many([f"v{i}" for i in range(1, n, 2)])
    merged = a.merge(HyperLogLog.from_bytes(b.to_bytes()))
    assert abs(merged.estimate() - h.estimate()) < 1e-9
    # distributed path over a Dataset with duplicates
    vals = [f"u{i % 500}" for i in range(5000)]
    ds = rd.from_arrow(pa.table({"user": vals}))
    est = approx_distinct(ds, "user")
    assert abs(est - 500) / 500 < 0.05


def test_skew_bound_partials(ray_session):
    """Scale evidence: a 90%-hot-class batch still produces at most
    (#classes) partial rows per batch - the combiner bounds what shuffles,
    independent of skew."""
    import ray.data as rd

    from mysql_log_parser_ray.sources.synth import generate_corpus
    from mysql_log_parser_ray.stages.parse import parse_events
    from mysql_log_parser_ray.stages.aggregate import class_partials

    corpus = generate_corpus(1000, seed=3, n_sources=2)
    ev = parse_events(rd.from_arrow(corpus))
    parts = class_partials(ev, exact=False).to_pandas()
    n_classes = parts["class_id"].nunique()
    n_blocks = len(parts) / max(1, n_classes)
    # partial rows ~= blocks x classes, never events
    assert len(parts) <= n_classes * (n_blocks + 1)
    assert len(parts) < 200  # far fewer than the 1000+ events


def test_sketch_mode_uint64_overflow_clamped(ray_session):
    """Regression (review 3): sketch-mode number percentiles are float64
    and can round to exactly 2^64 for values near MaxUint64 (reachable via
    the ParseUint overflow clamp); finalization must clamp, not crash."""
    import ray.data as rd

    from mysql_log_parser_ray.sources.synth import build_sequences_table
    from mysql_log_parser_ray.stages.aggregate import aggregate_events
    from mysql_log_parser_ray.stages.parse import parse_events

    doc = (
        "# Query_time: 1.0\n"
        "# Bytes_sent: 99999999999999999999999\n"
        "SELECT overflow;\n"
    )
    ev = parse_events(rd.from_arrow(build_sequences_table([doc], ["d"], ["s"])))
    cls_table, _, _ = aggregate_events(ev, exact=False)
    row = cls_table.to_pylist()[0]
    bs = dict(row["number_stats"])["Bytes_sent"]
    assert bs["max"] == (1 << 64) - 1  # clamped, not crashed


def _synthetic_events(n: int, n_blocks: int = 8):
    """EVENT_SCHEMA-shaped dataset with n rows, every row a DISTINCT class."""
    import ray.data as rd

    def _mk(batch):
        import numpy as np
        import pyarrow as pa

        ids = batch["id"].to_numpy()
        k = len(ids)
        off = pa.array(np.arange(k + 1), pa.int32())
        tm = pa.MapArray.from_arrays(
            off, pa.array(["Query_time"] * k, pa.string()),
            pa.array(np.ones(k), pa.float32()))
        empty_num = pa.MapArray.from_arrays(
            pa.array(np.zeros(k + 1), pa.int32()),
            pa.array([], pa.string()), pa.array([], pa.uint64()))
        empty_bool = pa.MapArray.from_arrays(
            pa.array(np.zeros(k + 1), pa.int32()),
            pa.array([], pa.string()), pa.array([], pa.bool_()))
        cid = pa.array([f"c{i:07d}" for i in ids], pa.string())
        return pa.table({
            "doc_id": pa.array([str(i) for i in ids], pa.string()),
            "source": pa.array(["s" + str(i % 4) for i in ids], pa.string()),
            "n_tok": pa.array(np.full(k, 3, np.int32), pa.int32()),
            "event_seq": pa.array(np.zeros(k, np.int32), pa.int32()),
            "offset": pa.array(np.zeros(k, np.uint64), pa.uint64()),
            "ts": pa.array([""] * k, pa.string()),
            "admin": pa.array([False] * k, pa.bool_()),
            "query": pa.array(["SELECT 1"] * k, pa.string()),
            "user": pa.array([""] * k, pa.string()),
            "host": pa.array([""] * k, pa.string()),
            "db": pa.array([""] * k, pa.string()),
            "rate_type": pa.array([""] * k, pa.string()),
            "rate_limit": pa.array(np.zeros(k, np.uint8), pa.uint8()),
            "time_metrics": tm,
            "number_metrics": empty_num,
            "bool_metrics": empty_bool,
            "fingerprint": cid,
            "class_id": cid,
        })

    return rd.range(n, override_num_blocks=n_blocks).map_batches(
        _mk, batch_format="pyarrow"
    )


def test_high_cardinality_auto_switches_to_distributed(ray_session):
    """~10^5+ distinct fingerprints: the driver fold must abort (bounded
    memory) and the distributed path must produce the full result."""
    from mysql_log_parser_ray.stages.aggregate import (
        DriverFoldOverflow,
        aggregate_events,
        collect_partials,
    )

    n = 60_000
    ev = _synthetic_events(n, n_blocks=4)
    import pytest as _pytest

    with _pytest.raises(DriverFoldOverflow):
        collect_partials(ev, exact=True, max_driver_classes=20_000)

    cls_table, glob, counts = aggregate_events(
        ev, exact=True, max_driver_classes=20_000
    )
    assert cls_table.num_rows == n
    assert glob.total_queries == n and glob.unique_queries == n
    assert counts["n_rows"].sum() == n
    assert set(counts["source"]) == {"s0", "s1", "s2", "s3"}


def test_distributed_path_matches_driver_fold(ray_session):
    """Small corpus: both aggregation paths must agree exactly."""
    import pandas as pd

    from mysql_log_parser_ray.stages.aggregate import aggregate_events

    ev = _synthetic_events(512, n_blocks=4)
    cls_d, glob_d, cnt_d = aggregate_events(ev, exact=True,
                                            max_driver_classes=None)
    cls_s, glob_s, cnt_s = aggregate_events(ev, exact=True,
                                            max_driver_classes=100)
    a = cls_d.to_pandas().sort_values("class_id").reset_index(drop=True)
    b = cls_s.to_pandas().sort_values("class_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert glob_d.as_dict() == glob_s.as_dict()
    ka = cnt_d.sort_values(["source", "class_id"]).reset_index(drop=True)
    kb = cnt_s.sort_values(["source", "class_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        ka[["source", "class_id", "n_rows", "n_tokens"]].astype({"n_rows": "int64", "n_tokens": "int64"}),
        kb[["source", "class_id", "n_rows", "n_tokens"]].astype({"n_rows": "int64", "n_tokens": "int64"}),
    )


def test_grouped_counts_overflow_falls_back_to_shuffle(ray_session):
    """grouped_counts(final='driver') whose fold EXCEEDS max_driver_keys
    mid-stream must abort the fold and return the correct DataFrame via
    the shuffle path (fold_rows lowered so the mid-stream check actually
    fires on a small corpus)."""
    import ray.data as rd

    from mysql_log_parser_ray.stages.aggregate import grouped_counts

    def _mk(batch):
        import pyarrow as pa
        ids = batch["id"].to_numpy()
        return pa.table({
            "k": pa.array([f"k{i}" for i in ids], pa.string()),
            "n_tok": pa.array(ids % 7, pa.int64()),
        })

    ds = rd.range(5000, override_num_blocks=4).map_batches(_mk, batch_format="pyarrow")
    out = grouped_counts(
        ds, keys=["k"], sum_col="n_tok", max_driver_keys=1000, fold_rows=512
    )
    assert len(out) == 5000  # every key distinct; result still complete
    assert int(out["n_rows"].sum()) == 5000

    # a COMPLETED fold is kept even above max_driver_keys (no re-execution)
    out2 = grouped_counts(ds, keys=["k"], sum_col="n_tok", max_driver_keys=1000)
    import pandas as pd

    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True).astype({"n_rows": "int64", "n_tokens": "int64"}),
        out2.sort_values("k").reset_index(drop=True).astype({"n_rows": "int64", "n_tokens": "int64"}),
    )


def test_hll_null_immune(ray_session):
    """Review fix: nulls in an int column must be IGNORED (COUNT DISTINCT
    semantics) and must not change how co-batched values hash."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.state.hll import approx_distinct

    vals = list(range(2000))
    clean = rd.from_arrow(pa.table({"u": pa.array(vals, pa.int64())}))
    dirty = rd.from_arrow(
        pa.table({"u": pa.array(vals + [None] * 50, pa.int64())})
    )
    a = approx_distinct(clean, "u")
    b = approx_distinct(dirty, "u")
    assert a == b  # same registers: nulls dropped, values hash identically


def _rank_ds(n_hot: int, hot_vals: int = 37):
    """One synthetic hot class (n_hot events over hot_vals distinct float
    values) plus a small cold class, as a Dataset of many blocks."""
    import pyarrow as pa
    import ray.data as rd

    hot = np.round(
        (np.arange(n_hot, dtype=np.float64) % hot_vals) * 0.25, 6
    )
    cold = np.array([1.0, 2.0, 3.0], dtype=np.float64)
    t = pa.table(
        {
            "class_id": pa.array(
                ["HOT"] * n_hot + ["COLD"] * len(cold), pa.string()
            ),
            "v": pa.array(np.concatenate([hot, cold]), pa.float64()),
        }
    )
    return rd.from_arrow(t).repartition(32)


def test_nearest_rank_by_key_hot_class_bounded(ray_session):
    """A hot class (10^6 events, 37 distinct values) completes through the
    bounded histogram fold and matches the full-sort nearest-rank answer;
    what survives the shuffle is one row per distinct (key, value) pair,
    never per event."""
    from mysql_log_parser_ray.stages.aggregate import nearest_rank_by_key

    n_hot, hot_vals = 1_000_000, 37
    ds = _rank_ds(n_hot, hot_vals)
    # the guard is the bounded-memory assertion: any reducer group larger
    # than the distinct-value count raises instead of sorting raw events
    out = (
        nearest_rank_by_key(
            ds, "class_id", "v", {"p95": 95, "med": 50},
            max_distinct_per_key=hot_vals,
        )
        .to_pandas()
        .set_index("class_id")
    )
    hot_sorted = np.sort(
        np.round((np.arange(n_hot, dtype=np.float64) % hot_vals) * 0.25, 6)
    )
    assert out.loc["HOT", "p95"] == hot_sorted[(95 * n_hot) // 100]
    assert out.loc["HOT", "med"] == hot_sorted[(50 * n_hot) // 100]
    assert out.loc["COLD", "p95"] == 3.0
    assert out.loc["COLD", "med"] == 2.0


def test_nearest_rank_by_key_overflow_guard(ray_session):
    """A key whose distinct-value cardinality exceeds the guard fails fast
    with the GK remedy named (never a silent whole-class sort)."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.stages.aggregate import (
        DriverFoldOverflow,
        nearest_rank_by_key,
    )

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(["a"] * 1000, pa.string()),
                "v": pa.array(np.arange(1000, dtype=np.float64)),
            }
        )
    )
    with pytest.raises(Exception) as ei:
        nearest_rank_by_key(
            ds, "k", "v", {"p95": 95}, max_distinct_per_key=100
        ).to_pandas()
    assert "gk_percentiles_by_key" in str(ei.value)


def test_gk_percentiles_by_key_accuracy(ray_session):
    """The GK fallback path: per-key eps-approximate percentiles within the
    rank-error bound on a continuous metric."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.stages.aggregate import gk_percentiles_by_key

    rng = np.random.default_rng(42)
    n = 50_000
    vals = {"a": rng.standard_normal(n), "b": rng.exponential(size=n)}
    t = pa.table(
        {
            "k": pa.array(["a"] * n + ["b"] * n, pa.string()),
            "v": pa.array(np.concatenate([vals["a"], vals["b"]])),
        }
    )
    out = (
        gk_percentiles_by_key(
            rd.from_arrow(t).repartition(16), "k", "v",
            {"p95": 95, "med": 50}, eps=0.01,
        )
        .to_pandas()
        .set_index("k")
    )
    for k, v in vals.items():
        s = np.sort(v)
        for name, p in (("p95", 0.95), ("med", 0.50)):
            got = out.loc[k, name]
            # rank error <= eps*n (plus the merge slack the sketch budgets)
            rank = np.searchsorted(s, got)
            assert abs(rank - p * n) <= 2 * 0.01 * n, (k, name, rank)


def test_interpolated_quantile_by_key(ray_session):
    """The histogram-fold interpolated quantile equals numpy's linear
    (type-7) quantile on the raw values — including a hot key whose events
    far exceed its distinct values — and the overflow guard fires the same
    way as nearest_rank_by_key's."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.stages.aggregate import (
        DriverFoldOverflow,
        interpolated_quantile_by_key,
    )

    n_hot, hot_vals = 100_000, 37
    ds = _rank_ds(n_hot, hot_vals)
    out = (
        interpolated_quantile_by_key(
            ds, "class_id", "v", {"q50": 0.5, "q95": 0.95},
            max_distinct_per_key=hot_vals,
        )
        .to_pandas()
        .set_index("class_id")
    )
    hot = np.round((np.arange(n_hot, dtype=np.float64) % hot_vals) * 0.25, 6)
    for key, arr in (("HOT", hot), ("COLD", np.array([1.0, 2.0, 3.0]))):
        for col, q in (("q50", 0.5), ("q95", 0.95)):
            want = round(float(np.quantile(arr, q, method="linear")), 6)
            assert out.loc[key, col] == want, (key, col)

    big = rd.from_arrow(
        pa.table(
            {
                "class_id": pa.array(["X"] * 10, pa.string()),
                "v": pa.array(np.arange(10, dtype=np.float64)),
            }
        )
    )
    import pytest as _pytest

    with _pytest.raises(DriverFoldOverflow):
        interpolated_quantile_by_key(
            big, "class_id", "v", {"q50": 0.5}, max_distinct_per_key=5
        ).to_pandas()


def test_topk_exact_via_sketch(ray_session):
    """The MG candidate pass returns the exact top-k on a skewed corpus
    (identical to the full groupby), the compression bound holds per
    block, and uniform data (sketch inconclusive) silently falls back to
    the exact path with the same answer."""
    import pyarrow as pa
    import ray.data as rd

    import pandas as pd

    from mysql_log_parser_ray.state.heavyhitters import (
        _exact_topk,
        mg_compress,
        topk_exact_via_sketch,
    )

    # mg_compress bound: true - n/(k+1) <= est <= true
    rng = np.random.default_rng(5)
    keys = np.arange(500)
    counts = rng.integers(1, 1000, 500).astype(np.int64)
    ck, cc = mg_compress(keys, counts, k=50)
    assert len(ck) <= 50
    lookup = dict(zip(ck, cc))
    n = counts.sum()
    for key, true in zip(keys, counts):
        est = lookup.get(key, 0)
        assert est <= true
        assert est >= true - n // (50 + 1) - 1

    # skewed: zipf-ish user counts, sketch path must equal full groupby
    users = np.repeat(np.arange(200), (2000 // (np.arange(200) + 1)).clip(1))
    rng.shuffle(users)
    ds = rd.from_arrow(
        pa.table({"user_id": pa.array(users, pa.int64())})
    ).repartition(16)
    got = topk_exact_via_sketch(ds, "user_id", topn=10, k=64, n_total=len(users))
    want = _exact_topk(ds, "user_id", topn=10)
    pd.testing.assert_frame_equal(got, want)

    # uniform: every key count is below n/(k+1) -> fallback, still exact
    uni = rd.from_arrow(
        pa.table({"user_id": pa.array(np.arange(5000) % 1000, pa.int64())})
    ).repartition(8)
    got_u = topk_exact_via_sketch(uni, "user_id", topn=10, k=4, n_total=5000)
    want_u = _exact_topk(uni, "user_id", topn=10)
    pd.testing.assert_frame_equal(got_u, want_u)


def test_nearest_rank_by_key_null_promotion_stable(ray_session):
    """An int64 key whose batch contains a null must hash and ship at its
    ARROW type: pandas promotes the block to float64 and a float-hashed
    key would land in a different bucket (and a different column dtype)
    than its null-free blocks - one output row per key, not fragments."""
    import pyarrow as pa
    import ray.data as rd

    from mysql_log_parser_ray.stages.aggregate import nearest_rank_by_key

    clean = pa.table({
        "k": pa.array([7] * 50, pa.int64()),
        "v": pa.array([float(i % 5) for i in range(50)], pa.float64()),
    })
    dirty = pa.table({
        "k": pa.array([7] * 50 + [None], pa.int64()),
        "v": pa.array([float(i % 5) for i in range(50)] + [9.0], pa.float64()),
    })
    ds = rd.from_arrow([clean, dirty])
    out = nearest_rank_by_key(ds, "k", "v", {"med": 50}).to_pandas()
    counts = out.groupby("k", dropna=False).size()
    assert counts.loc[7] == 1  # the key never split across buckets
    assert out.loc[out["k"] == 7, "med"].iloc[0] == 2.0
