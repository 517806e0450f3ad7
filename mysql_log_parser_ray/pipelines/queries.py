"""Oracle-checkable query implementations over the driver's test tables.

Each function takes ``sf_dir`` and returns a Dataset / pandas DataFrame /
Arrow table whose column names and value types line up exactly with the
matching SQL in ``__ray_entry__.oracle_sql()`` (the driver hashes values
after sorting columns by name, so names AND value bit-patterns matter).

The slow-log family runs the REAL pipeline: sequences derived
deterministically from ``documents`` (sources/synth.py derivation formulas)
-> tokenize -> parse -> fingerprint -> enrich -> aggregate. The oracle
reproduces the expected output in closed form over ``documents``.

Money/float aggregates are compared as exact integer cents:
``floor(x*100 + 0.5)`` summed as int64 - identical IEEE ops on both sides,
no order-dependent low bits.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..broadcast import broadcast_get as _broadcast_get
from ..sources.synth import dim_for_sources, sequences_from_documents
from ..stages.aggregate import class_stats, grouped_counts
from ..stages.enrich import enrich_events
from ..stages.flatten import flatten_events
from ..stages.parse import parse_events


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"),
        columns=columns,
        override_num_blocks=_blocks_for(os.path.join(sf_dir, f"{table}.parquet")),
    )


def _blocks_for(path: str):
    """Right-size the block count for SMALL single-file inputs: Ray's
    default targets raw read parallelism (64 blocks for a 5 MB file), but
    every downstream stage then pays per-block dispatch; one block per
    ~4 MB with a floor of 8 measured 2.7x faster end-to-end on the
    multi-stage dedup pipelines at sf0.1. Large or multi-file inputs
    return None (keep Ray's defaults - at real scale block count follows
    file layout)."""
    try:
        if os.path.isdir(path):  # multi-file input: keep Ray's defaults
            return None
        size = os.path.getsize(path)
    except OSError:
        return None
    if size >= 512 << 20:
        return None
    return max(8, int(size // (4 << 20)) + 1)


def _join_num_partitions(sf_dir: str, *tables: str) -> int:
    """CLAUDE.md Dataset.join partition sizing, in ONE place: CPU-capped
    (aggregator actors are pool-sized by partition count - 64 fixed
    partitions starve a 4-CPU session) AND volume-capped when input size
    is known (32 partitions on a 13 MB join input spent 2-4x the runtime
    on pool startup; dropping the floor 8 -> 2 measured another 6-20%
    off the four join-bound suite queries at sf0.1 - each partition is an
    aggregator actor to start, and a <32 MB input needs two at most)."""
    import ray

    in_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f"{t}.parquet")) for t in tables
    )
    return min(
        min(64, max(8, int(ray.cluster_resources().get("CPU", 8)))),
        max(2, -(-in_bytes // (32 << 20))),
    )


from ..util import typed_empty as _typed_empty  # noqa: E402


def _fold_partials(ds, keys, sum_cols):
    """Driver fold of bucket/block partial rows (bounded by keys-cardinality
    x producer count): the measured alternative to a Ray groupby whose
    fixed sort/actor cost dwarfs tiny partial frames (see the interval-join
    ds.stats() note in BASELINE.md). Returns None on a column-less empty
    collect so callers apply their typed-empty contract."""
    out = ds.to_pandas()
    if not len(out) or keys[0] not in out.columns:
        return None
    return out.groupby(keys, as_index=False)[sum_cols].sum()


def _day_from_us(col):
    """Microsecond int64 Arrow column -> int64 day bucket, via the SAME
    float floor-division the oracle SQL uses (floor(epoch_us/86400e6);
    exact at timestamp magnitudes — 1 us is ~6x a double's half-ULP
    there, verified in review)."""
    return pc.cast(
        pc.floor(pc.divide(pc.cast(col, pa.float64()), 86400000000.0)),
        pa.int64(),
    )


def derived_sequences_ds(sf_dir: str):
    """documents -> deterministic tokenized slow-log sequences Dataset."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars", "source"])
    return docs.map_batches(
        sequences_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )


def _flat_events(sf_dir: str):
    return flatten_events(parse_events(derived_sequences_ds(sf_dir)))


# ---------------------------------------------------------------------------
# Slow-log pipeline family
# ---------------------------------------------------------------------------

def q_slowlog_parse_events(sf_dir: str):
    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "user": b["user"],
                "host": b["host"],
                "db": b["db"],
                "query": b["query"],
                "fingerprint": b["fingerprint"],
                "class_id": b["class_id"],
                "query_time": b["query_time"],
                "lock_time": b["lock_time"],
                "rows_sent": b["rows_sent"],
                "rows_examined": b["rows_examined"],
                "thread_id": b["thread_id"],
            }
        )

    return _flat_events(sf_dir).map_batches(project, batch_format="pyarrow", batch_size=None)


def q_slowlog_class_counts(sf_dir: str):
    events = parse_events(derived_sequences_ds(sf_dir))
    counts = grouped_counts(events, keys=["class_id", "fingerprint"], sum_col=None)
    out = counts.rename(columns={"n_rows": "total_queries"})
    out["total_queries"] = out["total_queries"].astype("int64")
    return out


def q_incremental_class_counts(sf_dir: str):
    """Crash-safe incremental ingest, end-to-end under the external oracle:
    the documents table is split into four "daily" parquet units (the test
    fixture for a rotating log shipper; production feeds real per-day
    files), each ingested ONCE through pipelines/incremental.py — one Ray
    pipeline per file committing an atomic, idempotent per-file partial —
    and the merged fold of the partials must equal the one-shot per-class
    counts (same oracle as slowlog_class_counts)."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from .incremental import incremental_class_counts

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars", "source"],
    )
    work = tempfile.mkdtemp(prefix="mlpr_incr_")
    try:
        step = max(1, -(-t.num_rows // 4))
        paths = []
        for i in range(4):
            p = os.path.join(work, f"day{i}.parquet")
            pq.write_table(t.slice(i * step, step), p)
            paths.append(p)
        out = incremental_class_counts(paths, os.path.join(work, "state"))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    if "class_id" not in out.columns or not len(out):
        return _typed_empty(
            class_id="object", fingerprint="object", total_queries="int64"
        )
    return out


def q_slowlog_class_qt_stats(sf_dir: str):
    ev = _flat_events(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.select(["class_id", "query_time"]).to_pandas()
        g = df.groupby("class_id", as_index=False).agg(
            cnt=("query_time", "size"),
            sum_qt=("query_time", "sum"),
            min_qt=("query_time", "min"),
            max_qt=("query_time", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max, Min, Sum

    parts = ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
    out = (
        parts.groupby("class_id")
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Sum("sum_qt", alias_name="sum_qt"),
            Min("min_qt", alias_name="min_qt"),
            Max("max_qt", alias_name="max_qt"),
        )
        .to_pandas()
    )
    out["avg_qt"] = out["sum_qt"] / out["cnt"]
    out["cnt"] = out["cnt"].astype("int64")
    return out


def q_slowlog_class_qt_pct95(sf_dir: str):
    """Nearest-rank pct95/median per class (reference convention,
    stats.go:124-129): vals[(95*cnt)//100] on the ascending sorted array.

    Computed through the bounded histogram fold (nearest_rank_by_key):
    query_time values come from a finite parse-token set, so a per-class
    distinct-value histogram reproduces the exact nearest-rank answer with
    per-task memory bounded by distinct values - a hot class at corpus
    scale never materializes its raw event values in one task."""
    from ..stages.aggregate import nearest_rank_by_key

    # prune to the two needed columns BEFORE the groupby shuffle - the full
    # event rows (query text, metric maps) need not move
    ev = _flat_events(sf_dir).select_columns(["class_id", "query_time"])
    return nearest_rank_by_key(
        ev, "class_id", "query_time", {"pct95": 95, "med": 50}
    )


def q_slowlog_global(sf_dir: str):
    import pandas as pd

    from ..stages.aggregate import global_stats

    g = global_stats(parse_events(derived_sequences_ds(sf_dir)), exact=False)
    return pd.DataFrame(
        {
            "total_queries": [int(g.total_queries)],
            "unique_queries": [int(g.unique_queries)],
        }
    )


def q_slowlog_report_quantiles(sf_dir: str):
    """Driver surface for the GK report (parser-cli.go:118-137 parity
    path): the 21-step QueryRank table, the Histo(20) buckets, and the
    Real pct95/median summary, as rows (fixed 43: 21 + 20 + 2).

    Value-checked since round 4: collect_partials merges partial blobs in
    canonical sorted order, making the sketch a pure function of the
    corpus (verified identical across runs and num_cpus 4/16/32), and the
    oracle pins the exact rows per corpus size (__ray_entry__
    _REPORT_PIN_ROWS - a reproducibility pin, since GK values are
    sketch-defined rather than SQL-recomputable)."""
    import pandas as pd

    from .report import QUANTILE_STEPS, _quantile_rank, collect_partials

    ev = parse_events(derived_sequences_ds(sf_dir))
    glob, _classes = collect_partials(ev, exact=False)
    rows: List[tuple] = []
    if glob is not None and "Query_time" in glob.stats.time:
        s = glob.stats.time["Query_time"]
        for phi in QUANTILE_STEPS:
            val, _rmin, rmax = _quantile_rank(s, phi)
            rows.append(("quantile", float(phi), float(phi), float(val), int(rmax)))
        for lo, hi, cnt in s.gk.histo(20):
            rows.append(("histo", float(lo), float(hi), float(cnt), int(cnt)))
        cur = s.current()
        rows.append(("real", 0.95, 0.95, float(cur.get("pct95", 0.0)), int(s.cnt)))
        rows.append(("real", 0.50, 0.50, float(cur.get("med", 0.0)), int(s.cnt)))
    return pd.DataFrame(
        rows, columns=["section", "lo", "hi", "value", "n"]
    ).astype({"lo": "float64", "hi": "float64", "value": "float64", "n": "int64"})


def q_slowlog_sink_counts(sf_dir: str):
    events = parse_events(derived_sequences_ds(sf_dir))
    out = grouped_counts(events, keys=["source", "class_id"], sum_col="n_tok")
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out


def q_slowlog_route_enrich(sf_dir: str):
    seqs = derived_sequences_ds(sf_dir)
    dim = dim_for_sources(seqs.unique("source"))
    events = parse_events(derived_sequences_ds(sf_dir))
    enriched = enrich_events(events, dim)
    out = grouped_counts(enriched, keys=["sink", "region", "tier"], sum_col=None)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def q_slowlog_examples(sf_dir: str):
    events = parse_events(derived_sequences_ds(sf_dir))
    cls = class_stats(events, exact=True).take_all()
    import pandas as pd

    return pd.DataFrame(
        {
            "class_id": [r["class_id"] for r in cls],
            "example_query_time": [float(r["example_query_time"]) for r in cls],
            "example_query": [r["example_query"] for r in cls],
        }
    )


def q_slowlog_db_user(sf_dir: str):
    events = parse_events(derived_sequences_ds(sf_dir))
    out = grouped_counts(events, keys=["db", "user"], sum_col=None)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Relational operators over the native test tables
# ---------------------------------------------------------------------------

def _cents(col):
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


def derived_genlog_sequences_ds(sf_dir: str):
    """documents -> deterministic general-log sequences Dataset."""
    from ..sources.synth import genlog_sequences_from_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars", "source"])
    return docs.map_batches(
        genlog_sequences_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )


def q_jsonlog_parse_events(sf_dir: str):
    """Structured JSON-lines parse through the format registry."""
    from ..sources.synth import jsonlog_sequences_from_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars", "source"])
    seqs = docs.map_batches(
        jsonlog_sequences_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    ev = parse_events(seqs, fmt="jsonlog")

    def project(b: pa.Table) -> pa.Table:
        tm = [dict(x) for x in b["time_metrics"].to_pylist()]
        nm = [dict(x) for x in b["number_metrics"].to_pylist()]
        bm = [dict(x) for x in b["bool_metrics"].to_pylist()]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "ts": b["ts"],
                "user": b["user"],
                "db": b["db"],
                "query": b["query"],
                "fingerprint": b["fingerprint"],
                "class_id": b["class_id"],
                "query_time": pa.array(
                    [d.get("query_time") for d in tm], pa.float64()
                ),
                "rows_sent": pa.array(
                    [d.get("rows_sent") for d in nm], pa.int64()
                ),
                "full_scan": pa.array(
                    [d.get("full_scan") for d in bm], pa.bool_()
                ),
            }
        )

    return ev.map_batches(project, batch_format="pyarrow", batch_size=None)


def q_genlog_parse_events(sf_dir: str):
    """Full genlog parse through the format registry (fmt="genlog")."""
    ev = parse_events(derived_genlog_sequences_ds(sf_dir), fmt="genlog")

    def project(b: pa.Table) -> pa.Table:
        nm = [dict(x) for x in b["number_metrics"].to_pylist()]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "event_seq": pc.cast(b["event_seq"], pa.int64()),
                "ts": b["ts"],
                "admin": b["admin"],
                "query": b["query"],
                "user": b["user"],
                "host": b["host"],
                "db": b["db"],
                "thread_id": pa.array(
                    [d.get("Thread_id") for d in nm], pa.int64()
                ),
                "fingerprint": b["fingerprint"],
                "class_id": b["class_id"],
            }
        )

    return ev.map_batches(project, batch_format="pyarrow", batch_size=None)


def q_genlog_class_counts(sf_dir: str):
    ev = parse_events(derived_genlog_sequences_ds(sf_dir), fmt="genlog")
    counts = grouped_counts(ev, keys=["class_id", "fingerprint"], sum_col=None)
    out = counts.rename(columns={"n_rows": "total_queries"})
    out["total_queries"] = out["total_queries"].astype("int64")
    return out


def q_events_hourly(sf_dir: str):
    from ..stages.window import tumbling_window_agg

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    return tumbling_window_agg(ev, window_sec=3600)


def q_events_hopping(sf_dir: str):
    """1h windows advancing every 15min: each event lands in 4 windows."""
    from ..stages.window import hopping_window_agg

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    return hopping_window_agg(ev, window_sec=3600, hop_sec=900)


def q_events_sessions(sf_dir: str):
    from ..stages.window import sessionize

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return sessionize(ev, gap_sec=1800)


def q_events_props_k(sf_dir: str):
    """JSON property extraction (vectorized regex over the props column) +
    grouped sum - the log-attribute-parsing shape."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def _extract(b: pa.Table) -> pa.Table:
        k = (
            pd.Series(b["props"].to_pandas())
            .str.extract(r'"k":\s*(\d+)', expand=False)
            .fillna(0)
            .astype("int64")
        )
        return pa.table(
            {"event_type": b["event_type"], "k": pa.array(k, pa.int64())}
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ev.map_batches(_extract, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
        .to_pandas()
    )
    for c in ("n", "sum_k"):
        out[c] = out[c].astype("int64")
    return out


def _tier_dim_ds(ev):
    """Versioned user-tier history, derived DISTRIBUTED: distinct users via
    per-batch unique + one small groupby (no user-cardinality driver list),
    4 weekly versions expanded vectorized inside map_batches. Matches the
    DuckDB oracle's UNNEST([0,1,2,3]) dim table exactly."""
    import pandas as pd

    from ray.data.aggregate import Count

    def _uniq(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(b["user_id"])})

    users = (
        ev.select_columns(["user_id"])
        .map_batches(_uniq, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("user_id")
        .aggregate(Count(alias_name="_n"))
    )
    base_us = pd.Timestamp("2024-01-01").value // 1000
    week_us = 7 * 86400 * 1_000_000
    tiers = np.array(["tier0", "tier1", "tier2"], dtype=object)

    def _expand(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu = np.repeat(u, 4)
        k = np.tile(np.arange(4, dtype=np.int64), len(u))
        return pa.table(
            {
                "user_id": pa.array(uu, pa.int64()),
                "valid_from": pa.array(base_us + k * week_us, pa.timestamp("us")),
                "tier": pa.array(tiers[(uu + k) % 3], pa.string()),
            }
        )

    return users.map_batches(
        _expand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def q_events_asof_tier(sf_dir: str):
    """As-of join events -> versioned user-tier history (latest version at
    event time), then tier counts. Dim derived deterministically (and
    distributed - _tier_dim_ds) so the DuckDB ASOF JOIN oracle builds the
    identical table; the broadcast join path is right while the dim history
    fits in the object store."""
    from ..stages.asof import asof_join_broadcast

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    dim = _tier_dim_ds(ev).to_pandas()
    joined = asof_join_broadcast(
        ev, dim, on="ts", by="user_id", dim_on="valid_from",
        columns=["event_id", "tier"],
    )
    from ..stages.aggregate import grouped_counts

    out = grouped_counts(joined, keys=["tier"], sum_col=None)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def q_events_asof_tier_bigdim(sf_dir: str):
    """Same as-of semantics through the BIG-DIM path: facts and the dim
    history co-partitioned by user hash (asof_join_partitioned's tagged
    union shuffle), merge_asof per co-partition - the shape for dim tables
    that outgrow broadcast. Shares the oracle with events_asof_tier."""
    from ..stages.asof import asof_join_partitioned

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    # materialize the derived dim (user-cardinality x 4, object-store
    # resident, never on the driver): asof_join_partitioned needs its
    # schema up front, and schema() on the lazy groupby pipeline would
    # execute it once for inference and again for the join
    dim = _tier_dim_ds(ev).materialize()
    joined = asof_join_partitioned(
        ev, dim, on="ts", by="user_id", dim_on="valid_from",
        columns=["event_id", "tier"],
    )
    from ..stages.aggregate import grouped_counts

    out = grouped_counts(joined, keys=["tier"], sum_col=None)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def q_top_users_per_type(sf_dir: str):
    """Top-3 users per event_type by event count (top-k per group): partial
    counts per batch -> small groupby -> per-group head on the driver-sized
    result. Only (type, user, count) rows ever move."""
    from ..stages.aggregate import grouped_counts

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    counts = grouped_counts(ev, keys=["event_type", "user_id"], sum_col=None)
    counts["n_rows"] = counts["n_rows"].astype("int64")
    out = (
        counts.sort_values(
            ["event_type", "n_rows", "user_id"], ascending=[True, False, True]
        )
        .groupby("event_type", as_index=False)
        .head(3)
        .reset_index(drop=True)
    )
    return out


def q_events_value_band(sf_dir: str):
    """Range join: each event's value joined to its price band
    (lo <= value < hi) via a broadcast sorted-bounds searchsorted - the
    banded-join shape without a shuffle."""
    import numpy as np

    bands = [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1e18, "high")]
    lows = np.array([b[0] for b in bands])
    names = [b[2] for b in bands]

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def _band(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(lows, v, side="right") - 1, 0, len(bands) - 1)
        return pa.table(
            {
                "event_type": b["event_type"],
                "band": pa.array([names[i] for i in idx], pa.string()),
            }
        )

    from ..stages.aggregate import grouped_counts

    out = grouped_counts(
        ev.map_batches(_band, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        keys=["event_type", "band"],
        sum_col=None,
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def q_events_hash_sample(sf_dir: str):
    """Deterministic hash sampling (~5%): keep rows where
    event_id % 100 < 5. Value-independent, reproducible across runs and
    cluster sizes - the training-data sampling pattern (a seeded
    random_sample cannot be oracle-checked; a hash sample can)."""
    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def sample_project(b: pa.Table) -> pa.Table:
        # vectorized predicate inside the batch fn (Ray's filter expr
        # parser has no arithmetic; pc.filter is the same pushdown)
        mask = pc.less(
            pc.subtract(
                b["event_id"],
                pc.multiply(pc.divide(b["event_id"], 100), 100),
            ),
            5,
        )
        sub = b.filter(mask)
        return pa.table(
            {
                "event_id": sub["event_id"],
                "event_type": sub["event_type"],
                "value_cents": _cents(sub["value"]),
            }
        )

    return ev.map_batches(sample_project, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def q_distinct_users_per_type(sf_dir: str):
    """Exact distributed distinct-count, bucketed: per-batch distinct
    pairs (the combiner) tagged with hash(user) % 64, ONE shuffle on the
    coarse bucket key (never a groupby over millions of tiny (type, user)
    groups), global dedup + per-type count vectorized inside each bucket
    (a user's rows all land in one bucket), then a driver fold of
    64 x n_types partial rows."""
    import numpy as np
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    n_parts = 64

    def _pairs(b: pa.Table) -> pa.Table:
        from ..partition import stable_partition

        # COUNT(DISTINCT user_id) ignores NULL users (oracle parity), and
        # dropping them first also keeps the remaining batch dtype-stable
        # (no int->float promotion feeding the shuffle)
        b = b.filter(pc.is_valid(b["user_id"]))
        b = b.append_column(
            "_part", pa.array(stable_partition(b["user_id"], n_parts), pa.int64())
        )
        df = b.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def _count_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        out = (
            d.groupby("event_type", as_index=False, dropna=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return out

    out = (
        ev.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("_part")
        .map_groups(_count_part, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False, dropna=False)
        .sum()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct users (mergeable sketch; the
    10^12-row replacement for COUNT DISTINCT). The register merge is an
    elementwise max — order-independent by construction — so the estimate
    is a pure function of the corpus and is value-pinned per events-table
    size (reproducibility oracle); accuracy is pinned in test_stats."""
    import pandas as pd

    from ..state.hll import approx_distinct

    ev = _read(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ev, "user_id")
    return pd.DataFrame({"n_users_approx": [int(round(est))]})


def q_events_value_p95(sf_dir: str):
    """Exact nearest-rank p95/median of value per event_type, computed
    from a bounded (event_type, cents) HISTOGRAM fold rather than sorting
    full groups: values are integer cents, so per-batch partial counts +
    a driver fold over distinct (type, cents) pairs give the identical
    nearest-rank answer (stats.go:124-129 convention) without any task
    ever holding a whole group's rows."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def _partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas(),
                "cents": _cents(b["value"]).to_pandas(),
            }
        )
        g = df.groupby(["event_type", "cents"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n"}),
                                    preserve_index=False)

    hist = pd.concat(
        [
            b.to_pandas()
            for b in ev.map_batches(
                _partial, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        ],
        ignore_index=True,
    ).groupby(["event_type", "cents"], as_index=False)["n"].sum()

    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("cents")
        cum = g["n"].cumsum().to_numpy()
        cnt = int(cum[-1])
        cents = g["cents"].to_numpy()
        # nearest-rank: value at 0-based index (pct*cnt)//100 of the
        # conceptual sorted array == first cents with cum > index
        p95 = int(cents[np.searchsorted(cum, (95 * cnt) // 100 + 1)])
        med = int(cents[np.searchsorted(cum, (50 * cnt) // 100 + 1)])
        rows.append({"event_type": etype, "p95_cents": p95, "med_cents": med})
    out = pd.DataFrame(rows)
    for c in ("p95_cents", "med_cents"):
        out[c] = out[c].astype("int64")
    return out


def q_events_by_type(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pa.table(
            {"event_type": b["event_type"], "cents": _cents(b["value"])}
        ).to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            n=("cents", "size"), value_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["value_cents"] = out["value_cents"].astype("int64")
    return out


def q_top_users(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id"])
    out = grouped_counts(ds, keys=["user_id"], sum_col=None)
    df = out.sort_values(["n_rows", "user_id"], ascending=[False, True])
    df = df.head(10).reset_index(drop=True)
    df["n_rows"] = df["n_rows"].astype("int64")
    return df


def q_orders_by_segment(sf_dir: str):
    """Broadcast join: orders x customer (small side via ray.put dict)."""
    import ray

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .to_pandas()
    )
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def attach_segment(b: pa.Table) -> pa.Table:
        # stateless task + per-worker-process broadcast cache (module-level,
        # keyed by ObjectRef): for a dict this small an actor pool pays ~2s
        # of pool startup for no benefit
        import pandas as pd

        seg_map = _broadcast_get(seg_ref)
        seg = pd.Series(b["o_custkey"].to_pandas()).map(seg_map)
        return pa.table(
            {
                "c_mktsegment": pa.array(seg, pa.string()),
                "cents": _cents(b["o_totalprice"]),
            }
        )

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = ds.map_batches(attach_segment, batch_format="pyarrow", batch_size=None)

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("cents", "size"), total_price_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("total_price_cents", alias_name="total_price_cents"),
        )
        .to_pandas()
    )
    for c in ("n_orders", "total_price_cents"):
        out[c] = out[c].astype("int64")
    return out


def q_lineitem_order_priority(sf_dir: str):
    """Big-to-big distributed hash join: lineitem x orders on orderkey via
    ``Dataset.join`` (both sides shuffle by key - neither fits a broadcast
    at scale, unlike the dim joins in orders_by_segment), then per-batch
    revenue partials into a 5-row priority groupby.

    Partition count is session-sized AND volume-capped: the join's
    aggregator actor pool is sized by num_partitions, and 32 partitions on
    a 13 MB input spent 2-4x the query's runtime on pool startup (measured
    5.7 s -> 1.4 s at 8 partitions, sf0.1/32 CPUs). ~64 MB per partition
    with the CPU cap untouched for big inputs. The lineitem side is
    pre-aggregated per (block, orderkey) BEFORE the shuffle — per-line
    cents rounding is preserved, so results are bit-identical while the
    join moves order-level partials, not lines."""
    import ray

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    n_parts = _join_num_partitions(sf_dir, "lineitem", "orders")

    def pre(b: pa.Table) -> pa.Table:
        import pandas as pd

        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        df = pa.table(
            {"l_orderkey": b["l_orderkey"], "revenue_cents": _cents(rev)}
        ).to_pandas()
        g = df.groupby("l_orderkey", as_index=False).agg(
            n_lines=("revenue_cents", "size"),
            revenue_cents=("revenue_cents", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    joined = li.map_batches(pre, batch_format="pyarrow", batch_size=None).join(
        orders,
        "inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_lines": b["n_lines"],
                "revenue_cents": b["revenue_cents"],
            }
        ).to_pandas()
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n_lines=("n_lines", "sum"),
            revenue_cents=("revenue_cents", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_lines", alias_name="n_lines"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
    )
    out["n_lines"] = out["n_lines"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_customer_order_counts(sf_dir: str):
    """LEFT OUTER distributed hash join: customer x per-customer order
    counts, keeping customers with no orders (NULL fan-in -> 0).

    Scale shape: a tagged-union co-partitioned left join (the q5/q10
    plan) instead of ``Dataset.join`` — orders pre-reduce to
    customer-cardinality (custkey, n_orders) partials inside the batch
    fn, both sides ship schema-aligned rows into ONE stable_partition
    groupby, and the per-bucket pandas kernel does the left merge with
    zero fan-in fill. Only segment-cardinality (seg, n_customers,
    n_no_orders, n_orders) partials leave the buckets, folded on the
    driver (64 x |segments| rows). Replaced the Dataset.join version:
    same rows, none of the aggregator-pool startup that dominated it at
    benchmark scale (2.25 s -> sub-second at sf0.1/32cpu)."""
    import pandas as pd

    from ..partition import stable_partition

    n_parts = 64

    def _aligned(key, n, seg, side):
        key = np.asarray(key, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "n": pa.array(np.asarray(n, dtype=np.int64), pa.int64()),
                "seg": pa.array(list(seg), pa.string()),
                "side": pa.array(np.full(len(key), side, np.int32), pa.int32()),
                "_part": pa.array(
                    stable_partition(key, n_parts)
                    if len(key) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    def _c_side(b: pa.Table) -> pa.Table:
        if "c_custkey" not in b.column_names:
            return _aligned([], [], [], 0)
        return _aligned(
            b["c_custkey"].to_numpy(zero_copy_only=False),
            np.zeros(b.num_rows, np.int64),
            b["c_mktsegment"].to_pandas(),
            0,
        )

    def _o_side(b: pa.Table) -> pa.Table:
        if "o_custkey" not in b.column_names:
            return _aligned([], [], [], 1)
        g = (
            pd.DataFrame({"k": b["o_custkey"].to_numpy(zero_copy_only=False)})
            .groupby("k", as_index=False)
            .size()
        )
        return _aligned(g["k"], g["size"], [""] * len(g), 1)

    def _left_merge(g: "pd.DataFrame") -> "pd.DataFrame":
        c = g[g["side"] == 0]
        out_cols = {
            "c_mktsegment": "object", "n_customers": "int64",
            "n_no_orders": "int64", "n_orders": "int64",
        }
        if not len(c):
            return pd.DataFrame(
                {k: pd.Series([], dtype=t) for k, t in out_cols.items()}
            )
        o = g[g["side"] == 1]
        per_c = o.groupby("key", as_index=False)["n"].sum()
        m = c[["key", "seg"]].merge(per_c, on="key", how="left")
        n = m["n"].fillna(0).astype(np.int64)
        out = pd.DataFrame({"c_mktsegment": m["seg"].to_numpy(), "n_orders": n})
        return out.groupby("c_mktsegment", as_index=False).agg(
            n_customers=("n_orders", "size"),
            n_no_orders=("n_orders", lambda s: int((s == 0).sum())),
            n_orders=("n_orders", "sum"),
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        _c_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        _o_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    parts = (
        cust.union(orders).groupby("_part")
        .map_groups(_left_merge, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "c_mktsegment" not in parts.columns:
        return _typed_empty(c_mktsegment=object, n_customers="int64",
                            n_no_orders="int64", n_orders="int64")
    out = parts.groupby("c_mktsegment", as_index=False)[
        ["n_customers", "n_no_orders", "n_orders"]
    ].sum()
    for c in ("n_customers", "n_no_orders", "n_orders"):
        out[c] = out[c].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate, vectorized pyarrow partials."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        df = pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": b["l_quantity"],
                "revenue_cents": _cents(rev),
            }
        ).to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n=("qty", "size"), sum_qty=("qty", "sum"), revenue_cents=("revenue_cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_qty"] = out["sum_qty"].astype("float64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


def q_supplier_by_nation(sf_dir: str):
    """Two-hop broadcast dim join: supplier -> nation -> region (both dim
    tables are tiny; ONE ray.put of the composed lookup, no shuffle join),
    then grouped counts + exact acctbal cents."""
    import ray

    nation = _read(
        sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    nk = dict(
        zip(
            nation["n_nationkey"],
            zip(
                nation["n_name"],
                nation["n_regionkey"].map(
                    dict(zip(region["r_regionkey"], region["r_name"]))
                ),
            ),
        )
    )
    ref = ray.put(nk)

    def attach(b: pa.Table) -> pa.Table:
        import pandas as pd

        lut = _broadcast_get(ref)
        keys = pd.Series(b["s_nationkey"].to_pandas())
        mapped = keys.map(lut)
        # inner-join semantics (oracle parity): suppliers with a null or
        # unknown nationkey are dropped, not crashed on
        hit = mapped.notna().to_numpy()
        mapped = mapped[hit]
        return pa.table(
            {
                "nation": pa.array([m[0] for m in mapped], pa.string()),
                "region": pa.array([m[1] for m in mapped], pa.string()),
                "cents": _cents(b["s_acctbal"]).filter(pa.array(hit)),
            }
        )

    ds = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        g = df.groupby(["region", "nation"], as_index=False).agg(
            n_suppliers=("cents", "size"), acctbal_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(attach, batch_format="pyarrow", batch_size=None)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["region", "nation"])
        .aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .to_pandas()
    )
    for c in ("n_suppliers", "acctbal_cents"):
        out[c] = out[c].astype("int64")
    return out


def q_part_type_stats(sf_dir: str):
    """Grouped min/max/sum over the part table (partial-agg shape)."""
    ds = _read(
        sf_dir, "part", columns=["p_type", "p_size", "p_retailprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pa.table(
            {
                "p_type": b["p_type"],
                "p_size": b["p_size"],
                "retail_cents": _cents(b["p_retailprice"]),
            }
        ).to_pandas()
        g = df.groupby("p_type", as_index=False).agg(
            n_parts=("p_size", "size"),
            min_size=("p_size", "min"),
            max_size=("p_size", "max"),
            retail_cents=("retail_cents", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max, Min, Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("p_type")
        .aggregate(
            Sum("n_parts", alias_name="n_parts"),
            Min("min_size", alias_name="min_size"),
            Max("max_size", alias_name="max_size"),
            Sum("retail_cents", alias_name="retail_cents"),
        )
        .to_pandas()
    )
    out["n_parts"] = out["n_parts"].astype("int64")
    out["retail_cents"] = out["retail_cents"].astype("int64")
    # p_size is int32 in the parquet schema; DuckDB MIN/MAX preserve it
    out["min_size"] = out["min_size"].astype("int32")
    out["max_size"] = out["max_size"].astype("int32")
    return out


def q_token_vocab_counts(sf_dir: str):
    """Corpus-wide token (vocabulary) frequency over the ``tokens``
    array<int32> column — the canonical 10^12-sequence reduction.

    Each block flattens its list column to the underlying values buffer
    zero-copy and reduces to a <=vocab-row ``np.bincount`` partial, so what
    shuffles is #blocks x vocab tiny rows; the token payload never moves
    and the final groupby is bounded by vocab cardinality, not corpus
    size. Oracle: byte histogram of the closed-form doc text (the derived
    tokens ARE the utf-8 bytes, sources/sequences.py:60-65)."""
    seqs = derived_sequences_ds(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        arr = b["tokens"].combine_chunks()
        vals = arr.values.to_numpy(zero_copy_only=False)
        counts = np.bincount(vals)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "token": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(counts[nz].astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        seqs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["token"] = out["token"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("token").reset_index(drop=True)


def q_events_sorted_head(sf_dir: str):
    """Global top-k via per-block prefilter + distributed sort.

    A row outside its own block's top-20 under the (value desc, event_id
    asc) total order cannot be in the global top-20, so each block keeps at
    most 20 rows (pandas sort matches the oracle's NULLS LAST) and the
    range-partitioned ``ds.sort`` all-to-all runs over <=20 x n_blocks tiny
    rows instead of the whole corpus; a block with <20 non-null values
    keeps its null rows too, so the null tail is preserved when the corpus
    is that small. Cents conversion happens AFTER the sort so the order
    matches the oracle's ORDER BY on the raw double."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def _block_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["value", "event_id"], ascending=[False, True], na_position="last"
        )
        return pa.Table.from_pandas(df.head(20), preserve_index=False)

    head = (
        ds.map_batches(
            _block_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .sort(["value", "event_id"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    import pandas as pd

    cents = np.floor(head["value"].to_numpy() * 100 + 0.5)
    if np.isnan(cents).any():
        # Null values survive the per-block head when a block has <20
        # non-null rows; emit NULL value_cents (nullable Int64) like the
        # oracle instead of raising on the NaN->int64 cast. The plain
        # int64 path is kept for the no-null case so dtype parity with
        # the oracle's BIGINT is bit-exact.
        head["value_cents"] = pd.Series(cents, index=head.index).astype("Int64")
    else:
        head["value_cents"] = cents.astype("int64")
    head["event_id"] = head["event_id"].astype("int64")
    return head[["event_id", "event_type", "value_cents"]]


def q_events_hourly_distinct(sf_dir: str):
    """Windowed exact distinct: unique users per (hour, event_type).

    The q_distinct_users_per_type bucket shape with the window key carried
    through: per-batch distinct (window, type, user) triples tagged
    hash(user) % 64 (the only shuffle is on that coarse bucket key — never
    a groupby over per-user groups), per-bucket global dedupe + cell count
    (every copy of a user lands in one bucket), then a driver fold of
    64 x n_cells partial rows. Scales with distinct-triple cardinality per
    bucket, never with event count."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "user_id"])
    n_parts = 64

    def _triples(b: pa.Table) -> pa.Table:
        from ..partition import stable_partition

        b = b.filter(pc.and_(pc.is_valid(b["user_id"]), pc.is_valid(b["ts"])))
        us = b["ts"].cast(pa.int64())
        win = pc.multiply(pc.divide(us, 3_600_000_000), 3600)
        t = pa.table(
            {
                "window_start": pc.cast(win, pa.int64()),
                "event_type": b["event_type"],
                "user_id": b["user_id"],
                "_part": pa.array(
                    stable_partition(b["user_id"], n_parts), pa.int64()
                ),
            }
        )
        return pa.Table.from_pandas(
            t.to_pandas().drop_duplicates(), preserve_index=False
        )

    def _count_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["window_start", "event_type", "user_id"])
        return (
            d.groupby(["window_start", "event_type"], as_index=False, dropna=False)
            .size()
            .rename(columns={"size": "n_users"})
        )

    out = (
        ev.map_batches(
            _triples, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby("_part")
        .map_groups(_count_part, batch_format="pandas")
        .to_pandas()
        .groupby(["window_start", "event_type"], as_index=False, dropna=False)
        .sum()
    )
    out["window_start"] = out["window_start"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_token_bigram_topk(sf_dir: str):
    """Top-50 token bigrams corpus-wide (the n-gram frequency shape used
    for contamination / boilerplate analysis). Each block computes bigram
    codes over the flattened values buffer with document boundaries masked
    out via the list offsets (no cross-doc bigrams), reduces to a bounded
    <=vocab^2 bincount partial; the groupby is bigram-cardinality-sized and
    the deterministic (n desc, token asc) head is the only driver result."""
    seqs = derived_sequences_ds(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        arr = b["tokens"].combine_chunks()
        vals = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(vals) < 2:
            return pa.table(
                {
                    "token_a": pa.array([], pa.int64()),
                    "token_b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        codes = vals[:-1] * 256 + vals[1:]
        # positions whose successor starts the next doc contribute no bigram
        mask = np.ones(len(vals) - 1, dtype=bool)
        ends = offsets[1:-1] - 1  # last index of every doc but the final one
        mask[ends[(ends >= 0) & (ends < len(mask))]] = False
        counts = np.bincount(codes[mask])
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "token_a": pa.array(nz // 256, pa.int64()),
                "token_b": pa.array(nz % 256, pa.int64()),
                "n": pa.array(counts[nz].astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        seqs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["token_a", "token_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    for c in ("token_a", "token_b", "n"):
        out[c] = out[c].astype("int64")
    out = out.sort_values(
        ["n", "token_a", "token_b"], ascending=[False, True, True]
    ).head(50)
    return out.reset_index(drop=True)


def q_all_formats_class_counts(sf_dir: str):
    """Multi-source fan-in: all three parser formats (slowlog / genlog /
    jsonlog) merged with ``Dataset.union`` into ONE shared grouped count
    keyed (fmt, class_id). Union is lazy block concatenation — no data
    moves at the merge; each branch reduces to per-block partials and only
    those tiny rows shuffle, so fan-in width is free at corpus scale."""
    from ..sources.synth import jsonlog_sequences_from_documents

    def _tag(fmt: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "fmt": pa.array([fmt] * len(b), pa.string()),
                    "class_id": b["class_id"],
                }
            )

        return f

    slow = parse_events(derived_sequences_ds(sf_dir)).map_batches(
        _tag("slowlog"), batch_format="pyarrow", batch_size=None
    )
    gen = parse_events(derived_genlog_sequences_ds(sf_dir), fmt="genlog").map_batches(
        _tag("genlog"), batch_format="pyarrow", batch_size=None
    )
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars", "source"])
    jseqs = docs.map_batches(
        jsonlog_sequences_from_documents, batch_format="pyarrow", zero_copy_batch=True
    )
    js = parse_events(jseqs, fmt="jsonlog").map_batches(
        _tag("jsonlog"), batch_format="pyarrow", batch_size=None
    )
    out = grouped_counts(
        slow.union(gen).union(js), keys=["fmt", "class_id"], sum_col=None
    )
    out = out.rename(columns={"n_rows": "total_queries"})
    out["total_queries"] = out["total_queries"].astype("int64")
    return out


def q_events_value_qcont(sf_dir: str):
    """Linear-interpolated (quantile_cont / type-7) per-type value
    quantiles through the bounded distinct-value histogram fold — exact at
    any event count, per-task memory bounded by distinct values (see
    stages/aggregate.py interpolated_quantile_by_key)."""
    from ..stages.aggregate import interpolated_quantile_by_key

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    out = interpolated_quantile_by_key(
        ev, "event_type", "value", {"q50": 0.5, "q95": 0.95}
    ).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_rollup(sf_dir: str):
    """Multi-level aggregate — ROLLUP over (event_type, hour-of-day).

    The scale-correct rollup shape: the FINEST cells come from one
    map_batches partial + one small shuffle; every coarser level
    (per-type, grand total) is re-aggregated from the cells-cardinality
    result on the driver — never a second pass over events. Rolled-up
    dimensions carry the '<all>' sentinel (dtype-stable vs SQL NULLs)."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hod = (us % 86_400_000_000) // 3_600_000_000
        df = pa.table(
            {
                "event_type": b["event_type"],
                "hod": pa.array(hod.astype(np.int64), pa.int64()),
                "cents": _cents(b["value"]),
            }
        ).to_pandas()
        g = df.groupby(["event_type", "hod"], as_index=False).agg(
            n=("cents", "size"), value_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    cells = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["event_type", "hod"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents"))
        .to_pandas()
    )
    lvl2 = cells.copy()
    lvl2["hod"] = lvl2["hod"].astype("int64").astype(str)
    lvl1 = cells.groupby("event_type", as_index=False)[["n", "value_cents"]].sum()
    lvl1["hod"] = "<all>"
    lvl0 = pd.DataFrame(
        {
            "event_type": ["<all>"],
            "hod": ["<all>"],
            "n": [cells["n"].sum()],
            "value_cents": [cells["value_cents"].sum()],
        }
    )
    out = pd.concat([lvl2, lvl1, lvl0], ignore_index=True)[
        ["event_type", "hod", "n", "value_cents"]
    ]
    out["n"] = out["n"].astype("int64")
    out["value_cents"] = out["value_cents"].astype("int64")
    return out.sort_values(["event_type", "hod"]).reset_index(drop=True)


def q_events_split_stats(sf_dir: str):
    """Deterministic train/val/test split (the dataset-splitting primitive:
    assignment is a pure function of the key, so it is reproducible across
    runs, partitionings and cluster sizes — no sampling state), with
    per-split per-type counts and value sums."""
    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        b = b.filter(pc.is_valid(b["user_id"]))
        m = pc.cast(b["user_id"], pa.int64()).to_numpy(zero_copy_only=False) % 10
        split = np.where(m < 8, "train", np.where(m == 8, "val", "test"))
        df = pa.table(
            {
                "split": pa.array(split, pa.string()),
                "event_type": b["event_type"],
                "cents": _cents(b["value"]),
            }
        ).to_pandas()
        g = df.groupby(["split", "event_type"], as_index=False).agg(
            n=("cents", "size"), value_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["split", "event_type"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["value_cents"] = out["value_cents"].astype("int64")
    return out.sort_values(["split", "event_type"]).reset_index(drop=True)


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot_hour_type(sf_dir: str):
    """Pivot / wide-format aggregate: hour-of-day rows x one count column
    per event type (a pivot always carries a declared column spec — the
    generator's five types here).

    Scale shape: the long-form (hod, type) cells come from one per-block
    partial + one small groupby (the rollup shape); the reshape to wide
    happens on the driver over cells-cardinality rows (24 x n_types),
    never over events."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hod = (us % 86_400_000_000) // 3_600_000_000
        df = pa.table(
            {
                "hod": pa.array(hod.astype(np.int64), pa.int64()),
                "event_type": b["event_type"],
            }
        ).to_pandas()
        g = df.groupby(["hod", "event_type"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n"}), preserve_index=False
        )

    from ray.data.aggregate import Sum

    cells = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["hod", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    wide = (
        cells.pivot_table(
            index="hod", columns="event_type", values="n", fill_value=0
        )
        .reindex(columns=list(_PIVOT_TYPES), fill_value=0)
        .reset_index()
    )
    wide.columns.name = None
    wide = wide.rename(columns={t: f"n_{t}" for t in _PIVOT_TYPES})
    for c in wide.columns:
        wide[c] = wide[c].astype("int64")
    return wide.sort_values("hod").reset_index(drop=True)


def q_events_zscore_outliers(sf_dir: str):
    """Per-group z-score outlier counts — the two-pass quality-filter
    primitive (compute group moments, broadcast them back, flag rows
    outside mean ± 3σ).

    Exactness across engines: moments accumulate in INTEGER cents (sums
    and sums-of-squares are exact, order-independent ints on both sides),
    and the float thresholds are derived from those ints with the SAME
    expression the oracle uses, so the boundary comparison is
    bit-deterministic. Scale shape: pass 1 folds per-block
    (type, n, Σc, Σc²) partials (type-cardinality on the driver); pass 2
    re-streams events against the tiny per-type threshold table — no
    event-cardinality state anywhere."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def _moments(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["value"]))
        df = pa.table(
            {"event_type": b["event_type"], "cents": _cents(b["value"])}
        ).to_pandas()
        df["sq"] = df["cents"] * df["cents"]
        g = df.groupby("event_type", as_index=False).agg(
            n=("cents", "size"), sc=("cents", "sum"), sc2=("sq", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = pd.concat(
        [
            b.to_pandas()
            for b in ev.map_batches(
                _moments, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        ],
        ignore_index=True,
    )
    s = parts.groupby("event_type", as_index=False)[["n", "sc", "sc2"]].sum()
    # identical expression order to the oracle SQL: mean = sc/n,
    # var = sc2/n - mean*mean, bounds = mean -/+ 3*sd
    mean = s["sc"].astype("float64") / s["n"]
    sd = np.sqrt(s["sc2"].astype("float64") / s["n"] - mean * mean)
    s["mean_cents"] = mean
    s["std_cents"] = sd
    s["lo"] = mean - 3.0 * sd
    s["hi"] = mean + 3.0 * sd
    bounds = s[["event_type", "lo", "hi"]]

    def _flag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["value"]))
        df = pa.table(
            {"event_type": b["event_type"], "cents": _cents(b["value"])}
        ).to_pandas()
        m = df.merge(bounds, on="event_type", how="inner")
        m["out"] = (m["cents"] < m["lo"]) | (m["cents"] > m["hi"])
        g = m.groupby("event_type", as_index=False)["out"].sum()
        g["n_outliers"] = g["out"].astype("int64")
        return pa.Table.from_pandas(
            g[["event_type", "n_outliers"]], preserve_index=False
        )

    counts = pd.concat(
        [
            b.to_pandas()
            for b in ev.map_batches(
                _flag, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        ],
        ignore_index=True,
    ).groupby("event_type", as_index=False)["n_outliers"].sum()

    out = s[["event_type", "n", "mean_cents", "std_cents"]].merge(
        counts, on="event_type", how="left"
    )
    out["n"] = out["n"].astype("int64")
    out["mean_cents"] = np.round(out["mean_cents"], 6)
    out["std_cents"] = np.round(out["std_cents"], 6)
    out["n_outliers"] = out["n_outliers"].fillna(0).astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_top_users_sketch(sf_dir: str):
    """Exact top-10 users through the Misra-Gries candidate pass
    (state/heavyhitters.py): block sketches bound pass-1 state to k
    counters per block, the provable candidate superset is exact-counted
    in pass 2 — same answer and oracle as top_users, one full groupby
    avoided. Falls back to the exact groupby automatically when the
    sketch is inconclusive (correctness never depends on data shape)."""
    from ..state.heavyhitters import topk_exact_via_sketch

    ev = _read(sf_dir, "events", columns=["user_id"])
    return topk_exact_via_sketch(ev, "user_id", topn=10, k=256)


def q_events_range_join(sf_dir: str):
    """Time-interval (range) join: events probed against 372 OVERLAPPING
    maintenance windows (stride 2h, widths 1-4h, so one event can land in
    up to 3 windows) — a genuine non-equi join no equality bucketing can
    express. stages/interval.py broadcasts the sorted window bounds once
    and bounds the per-event candidate probe by max_width//min_gap+1;
    only (window_id, event_type) count partials ever shuffle."""
    from ..stages.interval import interval_join_counts

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    base_us = 1704067200 * 1_000_000  # 2024-01-01 00:00:00 UTC
    k = np.arange(372, dtype=np.int64)
    starts = base_us + k * 7200 * 1_000_000
    ends = base_us + (k * 2 + 1 + k % 4) * 3600 * 1_000_000
    return interval_join_counts(ev, starts, ends)


def q_events_rolling_max3(sf_dir: str):
    """Ordered per-key rolling window: max of the last 3 values per user
    in (ts, event_id) order, folded to per-type sums.

    Scale shape (the sessionize pattern, stages/window.py:95): hash-bucket
    users into 64 partitions (null-stable stable_partition), then ONE
    vectorized lexsort + shifted-compare pass per bucket — never a
    per-user groupby, never a whole-table sort. The rolling kernel is two
    shifted np.maximum passes gated on user-boundary masks."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def _tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "us": pc.cast(b["ts"], pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "cents": _cents(b["value"]),
                "_part": pa.array(stable_partition(b["user_id"], 64), pa.int64()),
            }
        )

    def _roll(g: "pd.DataFrame") -> "pd.DataFrame":
        o = np.lexsort(
            (g["event_id"].to_numpy(), g["us"].to_numpy(), g["user_id"].to_numpy())
        )
        u = g["user_id"].to_numpy()[o]
        c = g["cents"].to_numpy()[o]
        et = g["event_type"].to_numpy()[o]
        rm = c.copy()
        if len(rm) > 1:
            same = u[1:] == u[:-1]
            np.maximum(rm[1:], np.where(same, c[:-1], np.int64(-(1 << 62))), out=rm[1:])
        if len(rm) > 2:
            same2 = u[2:] == u[:-2]
            np.maximum(rm[2:], np.where(same2, c[:-2], np.int64(-(1 << 62))), out=rm[2:])
        out = (
            pd.DataFrame({"event_type": et, "rollmax_cents": rm})
            .groupby("event_type", as_index=False)
            .agg(n=("rollmax_cents", "size"), rollmax_cents=("rollmax_cents", "sum"))
        )
        return out

    out = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("_part")
        .map_groups(_roll, batch_format="pandas"),
        ["event_type"], ["n", "rollmax_cents"],
    )
    if out is None:  # empty input
        return _typed_empty(event_type=object, n="int64", rollmax_cents="int64")
    for c in ("n", "rollmax_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_customers_no_urgent(sf_dir: str):
    """Distributed ANTI join: customers with NO '1-URGENT' order, folded
    to per-segment counts + balance cents.

    Scale shape: the orders side is filtered AND reduced to per-batch
    distinct custkeys before the shuffle (anti-join semantics are
    duplicate-insensitive, so per-batch unique is enough — no global
    dedup pass), then Dataset.join(left_anti) hash-co-partitions both
    sides. Join hygiene per CLAUDE.md: numeric batch_size on the
    join-feeding map (coalesces schema-less empties), empty-side guard
    skips the join outright."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    n_parts = _join_num_partitions(sf_dir, "customer", "orders")

    def _urgent_keys(b: pa.Table) -> pa.Table:
        if "o_custkey" not in b.column_names:
            return pa.table({"o_custkey": pa.array([], pa.int64())})
        keys = pc.unique(
            pc.filter(b["o_custkey"], pc.equal(b["o_orderpriority"], "1-URGENT"))
        )
        return pa.table({"o_custkey": pc.cast(keys, pa.int64())})

    urgent = orders.map_batches(
        _urgent_keys, batch_format="pyarrow", zero_copy_batch=True, batch_size=1 << 16
    ).materialize()

    if urgent.count() == 0:
        kept = cust
    else:
        kept = cust.join(
            urgent,
            "left_anti",
            num_partitions=n_parts,
            on=("c_custkey",),
            right_on=("o_custkey",),
        )

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        if "c_mktsegment" not in b.column_names:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_customers": pa.array([], pa.int64()),
                    "acctbal_cents": pa.array([], pa.int64()),
                }
            )
        df = pa.table(
            {"c_mktsegment": b["c_mktsegment"], "cents": _cents(b["c_acctbal"])}
        ).to_pandas()
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_customers=("cents", "size"), acctbal_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        kept.map_batches(partial, batch_format="pyarrow", batch_size=1 << 16)
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .to_pandas()
    )
    for c in ("n_customers", "acctbal_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q_users_funnel_outer(sf_dir: str):
    """Distributed FULL OUTER join at user cardinality: per-user
    high-value (>180) click counts vs purchase counts (either side may be
    absent — the threshold keeps all three branches populated at every
    sf), summarized to the 3-row funnel segment table
    (click_only / purchase_only / both).

    Scale shape: each side pre-reduces to user-cardinality count partials
    inside map_batches before the groupby, the full_outer Dataset.join
    co-partitions the two count streams (key column coalesced by acero),
    and the joined stream folds to 3 rows via the usual partial+Sum
    shape. Join hygiene per CLAUDE.md: schema-enforcing maps with numeric
    batch_size feed the join; an all-empty side degrades to a single-
    segment fold without the join."""
    import ray

    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])
    n_parts = _join_num_partitions(sf_dir, "events")
    from ray.data.aggregate import Sum

    def _side(event_type: str, out_col: str):
        def _pre(b: pa.Table) -> pa.Table:
            import pandas as pd

            if "user_id" not in b.column_names:
                return pa.table(
                    {"user_id": pa.array([], pa.int64()),
                     out_col: pa.array([], pa.int64())}
                )
            u = pc.filter(
                b["user_id"],
                pc.and_(
                    pc.equal(b["event_type"], event_type),
                    pc.greater(b["value"], 180.0),
                ),
            )
            df = pa.table({"user_id": u}).to_pandas()
            g = df.groupby("user_id", as_index=False).size()
            g = g.rename(columns={"size": out_col})
            return pa.Table.from_pandas(g, preserve_index=False)

        def _guard(b: pa.Table) -> pa.Table:
            if "user_id" not in b.column_names:
                return pa.table(
                    {"user_id": pa.array([], pa.int64()),
                     out_col: pa.array([], pa.int64())}
                )
            return pa.table(
                {"user_id": pc.cast(b["user_id"], pa.int64()),
                 out_col: pc.cast(b[out_col], pa.int64())}
            )

        return (
            ev.map_batches(_pre, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
            .groupby("user_id")
            .aggregate(Sum(out_col, alias_name=out_col))
            .map_batches(_guard, batch_format="pyarrow", batch_size=1 << 16)
            .materialize()
        )

    clicks = _side("click", "n_click")
    purchases = _side("purchase", "n_purchase")

    p_empty = purchases.count() == 0
    if clicks.count() == 0 or p_empty:
        only = clicks if p_empty else purchases
        seg = "click_only" if p_empty else "purchase_only"
        import pandas as pd

        df = only.to_pandas()
        out = pd.DataFrame(
            {
                "segment": [seg],
                "n_users": [len(df)],
                "n_click": [int(df["n_click"].sum()) if "n_click" in df else 0],
                "n_purchase": [int(df["n_purchase"].sum()) if "n_purchase" in df else 0],
            }
        )
        return out if len(df) else out.iloc[0:0]

    joined = clicks.join(
        purchases, "full_outer", num_partitions=n_parts, on=("user_id",)
    )

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        if "n_click" not in b.column_names:  # schema-less empty join block
            return pa.table(
                {
                    "segment": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                    "n_click": pa.array([], pa.int64()),
                    "n_purchase": pa.array([], pa.int64()),
                }
            )
        nc = pc.coalesce(pc.cast(b["n_click"], pa.int64()), pa.scalar(0, pa.int64()))
        npu = pc.coalesce(pc.cast(b["n_purchase"], pa.int64()), pa.scalar(0, pa.int64()))
        df = pa.table({"n_click": nc, "n_purchase": npu}).to_pandas()
        df["segment"] = np.where(
            df["n_purchase"] == 0,
            "click_only",
            np.where(df["n_click"] == 0, "purchase_only", "both"),
        )
        g = df.groupby("segment", as_index=False).agg(
            n_users=("n_click", "size"),
            n_click=("n_click", "sum"),
            n_purchase=("n_purchase", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=1 << 16)
        .groupby("segment")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_click", alias_name="n_click"),
            Sum("n_purchase", alias_name="n_purchase"),
        )
        .to_pandas()
    )
    for c in ("n_users", "n_click", "n_purchase"):
        out[c] = out[c].astype("int64")
    return out.sort_values("segment").reset_index(drop=True)


def q_corpus_line_dups(sf_dir: str):
    """Corpus-level duplicate-LINE detection over the derived slow-log
    corpus (the RefinedWeb/Gopher boilerplate-removal primitive: lines
    repeated across many documents are template noise, not content).

    Scale shape: lines are counted per batch first (local value_counts),
    hash-bucketed by line (stable_partition, 64), and the >=10 frequency
    threshold is applied INSIDE the bucket collapse — every copy of a line
    lands in one bucket, so the per-bucket sum is the global count and
    only boilerplate-frequency lines ever reach the driver."""
    import pandas as pd

    from ..partition import stable_partition
    from ..sources.sequences import detokenize_column

    seqs = derived_sequences_ds(sf_dir)

    def _lines(b: pa.Table) -> pa.Table:
        texts = detokenize_column(b["tokens"])
        s = pd.Series(texts).str.decode("utf-8")
        lines = s.str.split("\n").explode()
        lines = lines[lines != ""]
        vc = lines.value_counts()
        df = pd.DataFrame({"line": vc.index.to_numpy(dtype=object),
                           "n": vc.to_numpy(dtype=np.int64)})
        df["_part"] = stable_partition(df["line"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        out = g.groupby("line", as_index=False)["n"].sum()
        return out[out["n"] >= 10]

    out = (
        seqs.map_batches(_lines, batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=None)
        .groupby("_part")
        .map_groups(_collapse, batch_format="pandas")
        .to_pandas()
    )
    if "line" not in out.columns:
        out = pd.DataFrame({"line": pd.Series([], dtype=object),
                            "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out[["line", "n"]].sort_values(["n", "line"],
                                          ascending=[False, True]).reset_index(drop=True)


def q_user_event_paths(sf_dir: str):
    """Ordered per-key collect: each user's first-5 event-type path (by
    ts, event_id), counted per distinct path — the behavioral-sequence
    feature op.

    Scale shape: the sessionize pattern again — hash-bucket users (64),
    ONE lexsort per bucket, and the per-user first-5 extraction is a
    vectorized boundary/position computation (no per-user Python loop:
    positions come from arange minus each user's start index, the path
    from five fillna'd column concats). Only (path, n_users) partials
    leave the buckets."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def _tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "us": pc.cast(b["ts"], pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "_part": pa.array(stable_partition(b["user_id"], 64), pa.int64()),
            }
        )

    def _paths(g: "pd.DataFrame") -> "pd.DataFrame":
        o = np.lexsort(
            (g["event_id"].to_numpy(), g["us"].to_numpy(), g["user_id"].to_numpy())
        )
        u = g["user_id"].to_numpy()[o]
        et = g["event_type"].to_numpy()[o]
        n = len(u)
        # position of each row within its user run, vectorized
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_user)
        run_start = np.repeat(starts, np.diff(np.append(starts, n)))
        pos = np.arange(n) - run_start
        keep = pos < 5
        uk, posk, etk = u[keep], pos[keep], et[keep]
        wide = pd.DataFrame({"user_id": uk, "pos": posk, "et": etk}).pivot(
            index="user_id", columns="pos", values="et"
        )
        path = wide.get(0, pd.Series("", index=wide.index)).fillna("")
        for p in range(1, 5):
            col = wide.get(p)
            if col is None:
                break
            path = path.where(col.isna(), path + ">" + col.fillna(""))
        out = (
            pd.DataFrame({"path": path})
            .groupby("path", as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return out

    out = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("_part")
        .map_groups(_paths, batch_format="pandas"),
        ["path"], ["n_users"],
    )
    if out is None:  # empty input
        return _typed_empty(path=object, n_users="int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("path").reset_index(drop=True)


def q_user_transition_counts(sf_dir: str):
    """Per-user Markov transition matrix: how often event_type A is
    IMMEDIATELY followed by B inside one user's (ts, event_id)-ordered
    stream, summed over all users — the behavioral n-gram feature op.

    Scale shape: the sessionize pattern — hash-bucket users (64 via
    stable_partition, whole user per bucket), ONE lexsort per bucket,
    transitions from a vectorized shift compare (pair rows whose
    successor is the same user), and only (prev, next, n) partials —
    type-cardinality squared — leave each bucket; the driver folds
    64 x |types|^2 rows, never events."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def _tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "us": pc.cast(b["ts"], pa.int64()),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "_part": pa.array(stable_partition(b["user_id"], 64), pa.int64()),
            }
        )

    def _trans(g: "pd.DataFrame") -> "pd.DataFrame":
        o = np.lexsort(
            (g["event_id"].to_numpy(), g["us"].to_numpy(), g["user_id"].to_numpy())
        )
        u = g["user_id"].to_numpy()[o]
        et = g["event_type"].to_numpy()[o]
        same = u[1:] == u[:-1]
        return (
            pd.DataFrame({"prev_type": et[:-1][same], "next_type": et[1:][same]})
            .groupby(["prev_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    out = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("_part")
        .map_groups(_trans, batch_format="pandas"),
        ["prev_type", "next_type"], ["n"],
    )
    if out is None:  # empty input
        return _typed_empty(prev_type=object, next_type=object, n="int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def q_events_cum_daily(sf_dir: str):
    """Per-type daily counts with a RUNNING cumulative total (ordered
    prefix aggregation). The distributed part folds events to
    (type, day) partials — day-cardinality output — and the prefix sum
    runs on that tiny frame (days x types), never on events."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "event_type": b["event_type"],
                "day": _day_from_us(pc.cast(b["ts"], pa.int64())),
            }
        ).to_pandas()
        g = df.groupby(["event_type", "day"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    out = _fold_partials(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["event_type", "day"], ["n"],
    )
    if out is None:  # empty input
        return _typed_empty(event_type=object, day="int64", n="int64", cum_n="int64")
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["event_type", "day"]).reset_index(drop=True)
    out["cum_n"] = out.groupby("event_type")["n"].cumsum().astype("int64")
    return out


def q_events_range_join_bigwin(sf_dir: str):
    """Same interval-join semantics through the BIG-WINDOW path: the
    windows side is a Dataset co-partitioned with the facts by 4h time
    bucket (interval_join_counts_partitioned's tagged-union shuffle) —
    the shape for window tables that outgrow broadcast. Shares the
    events_range_join oracle."""
    import ray.data as rd

    from ..stages.interval import interval_join_counts_partitioned

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    base_us = 1704067200 * 1_000_000  # 2024-01-01 00:00:00 UTC
    k = np.arange(372, dtype=np.int64)
    windows = rd.from_arrow(
        pa.table(
            {
                "window_id": pa.array(k, pa.int64()),
                "start_us": pa.array(base_us + k * 7200 * 1_000_000, pa.int64()),
                "end_us": pa.array(
                    base_us + (k * 2 + 1 + k % 4) * 3600 * 1_000_000, pa.int64()
                ),
            }
        )
    )
    return interval_join_counts_partitioned(ev, windows)


def q_events_daily_dense(sf_dir: str):
    """Gap-filled (dense) time series: rare-event (value > 250) daily
    counts on the FULL day x type grid, zeros included — the
    training-dashboard densification primitive.

    Scale shape: one pass folds events to (type, day) partials carrying
    both the all-events and rare counts; the dense grid is derived from
    that day-cardinality fold (bounds + type set) and zero-filled on the
    driver — days x types rows, never events."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "event_type": b["event_type"],
                "day": _day_from_us(pc.cast(b["ts"], pa.int64())),
                "rare": pc.cast(pc.greater(b["value"], 250.0), pa.int64()),
            }
        ).to_pandas()
        g = df.groupby(["event_type", "day"], as_index=False).agg(
            n_all=("rare", "size"), n_rare=("rare", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["event_type", "day"], ["n_all", "n_rare"],
    )
    if cells is None:  # empty input
        return _typed_empty(event_type=object, day="int64", n_rare="int64")
    d0, d1 = int(cells["day"].min()), int(cells["day"].max())
    types = sorted(cells["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, range(d0, d1 + 1)], names=["event_type", "day"]
    ).to_frame(index=False)
    out = grid.merge(
        cells[["event_type", "day", "n_rare"]], on=["event_type", "day"], how="left"
    )
    out["day"] = out["day"].astype("int64")
    out["n_rare"] = out["n_rare"].fillna(0).astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def q_conversion_attribution(sf_dir: str):
    """Time-bounded stream-stream self-join (attribution): purchases with
    at least one SAME-USER click in the preceding 30 minutes (inclusive
    of equal timestamps), counted per day.

    Scale shape: both event roles co-partition by user hash (64 buckets);
    per bucket ONE lexsort by (user, ts, role) with clicks ordered before
    purchases at equal ts, then the latest-click timestamp forward-fills
    through each user run (np.maximum.accumulate on a run-reset array) —
    the sessionize machinery, no per-user loop and no quadratic join.
    Only (day, n_purchases, n_converted) partials leave the buckets."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def _tag(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["event_type"], value_set=pa.array(["click", "purchase"]))
        t = b.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "is_purchase": pc.cast(
                    pc.equal(t["event_type"], "purchase"), pa.int8()
                ),
                "_part": pa.array(
                    stable_partition(t["user_id"], 64), pa.int64()
                ),
            }
        )

    WINDOW_US = 30 * 60 * 1_000_000

    def _attr(g: "pd.DataFrame") -> "pd.DataFrame":
        u = g["user_id"].to_numpy()
        us = g["us"].to_numpy()
        rp = g["is_purchase"].to_numpy()
        o = np.lexsort((rp, us, u))  # clicks before purchases at equal ts
        u, us, rp = u[o], us[o], rp[o]
        n = len(u)
        # forward-fill the POSITION of the latest click (monotone ints:
        # cummax never overflows); a carried-over click from a previous
        # user run fails the user-equality check, and any click inside
        # the current contiguous run would have out-ranked it
        pos = np.arange(n, dtype=np.int64)
        last_click = np.maximum.accumulate(np.where(rp == 0, pos, np.int64(-1)))
        purch = rp == 1
        has = last_click >= 0
        safe = np.where(has, last_click, 0)
        converted = (
            purch & has & (u[safe] == u) & (us[safe] >= us - WINDOW_US)
        )
        day = (us[purch] // 86_400_000_000).astype(np.int64)
        out = (
            pd.DataFrame({"day": day, "conv": converted[purch].astype(np.int64)})
            .groupby("day", as_index=False)
            .agg(n_purchases=("conv", "size"), n_converted=("conv", "sum"))
        )
        return out

    out = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_attr, batch_format="pandas"),
        ["day"], ["n_purchases", "n_converted"],
    )
    if out is None:  # no purchases/clicks at all
        return _typed_empty(day="int64", n_purchases="int64", n_converted="int64")
    for c in ("day", "n_purchases", "n_converted"):
        out[c] = out[c].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def q_tpch_q3_topk(sf_dir: str):
    """TPC-H Q3 shape: 3-table join (customer semi-joins orders, lineitem
    revenue inner-joins the surviving orders) + top-10 by revenue.

    Scale shape: lineitem - the big side - is reduced to per-order revenue
    partials BEFORE any shuffle; orders carries only 3 columns through the
    left_semi join against the filtered BUILDING custkeys; the final
    top-10 folds per-batch candidates on the driver (the sorted_head
    shape). Join hygiene per CLAUDE.md: schema-enforcing numeric-batch
    maps feed both joins, empty-side count() guards skip them."""
    import pandas as pd
    import ray

    cutoff_us = int(pd.Timestamp("1995-03-15").value // 1000)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    n_parts = _join_num_partitions(sf_dir, "customer", "orders", "lineitem")

    def _bldg(b: pa.Table) -> pa.Table:
        if "c_custkey" not in b.column_names:
            return pa.table({"c_custkey": pa.array([], pa.int64())})
        keys = pc.filter(b["c_custkey"], pc.equal(b["c_mktsegment"], "BUILDING"))
        return pa.table({"c_custkey": pc.cast(keys, pa.int64())})

    bldg = cust.map_batches(
        _bldg, batch_format="pyarrow", zero_copy_batch=True, batch_size=1 << 16
    ).materialize()

    def _ofilt(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_custkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                }
            )
        keep = pc.less(pc.cast(b["o_orderdate"], pa.int64()), cutoff_us)
        return b.filter(keep)

    ofilt = orders.map_batches(
        _ofilt, batch_format="pyarrow", zero_copy_batch=True, batch_size=1 << 16
    ).materialize()

    def _empty_result() -> "pd.DataFrame":
        import pandas as pd

        return pd.DataFrame(
            {
                "l_orderkey": pd.Series([], dtype="int64"),
                "revenue_cents": pd.Series([], dtype="int64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            }
        )

    if bldg.count() == 0 or ofilt.count() == 0:
        return _empty_result()

    o2 = ofilt.join(
        bldg, "left_semi", num_partitions=n_parts,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def _lrev(b: pa.Table) -> pa.Table:
        import pandas as pd

        from ..partition import stable_partition

        if "l_orderkey" not in b.column_names:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "_part": pa.array([], pa.int64()),
                }
            )
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        df = pa.table(
            {"l_orderkey": b["l_orderkey"], "revenue_cents": _cents(rev)}
        ).to_pandas()
        g = df.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
        g["_part"] = stable_partition(g["l_orderkey"], 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _lrev_collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        # bucket-collapse per CLAUDE.md: never a raw groupby over
        # order-cardinality keys (measured ~3x fixed overhead); every copy
        # of an orderkey lands in this bucket, so the per-bucket sum is
        # the exact per-order revenue
        return g.groupby("l_orderkey", as_index=False)["revenue_cents"].sum()

    lrev = (
        li.map_batches(_lrev, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_lrev_collapse, batch_format="pandas")
    )

    def _lrev_guard(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "revenue_cents": pc.cast(b["revenue_cents"], pa.int64()),
            }
        )

    lrev = lrev.map_batches(
        _lrev_guard, batch_format="pyarrow", batch_size=1 << 16
    ).materialize()
    if lrev.count() == 0:
        return _empty_result()

    j = lrev.join(
        o2, "inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def _topk(b: pa.Table) -> pa.Table:
        import pandas as pd

        if "l_orderkey" not in b.column_names:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                }
            )
        df = b.select(["l_orderkey", "revenue_cents", "o_orderdate"]).to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["revenue_cents", "l_orderkey"],
                           ascending=[False, True]).head(10),
            preserve_index=False,
        )

    cand = j.map_batches(_topk, batch_format="pyarrow", batch_size=1 << 16).to_pandas()
    if not len(cand):
        return _empty_result()
    out = (
        cand.sort_values(["revenue_cents", "l_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    out["l_orderkey"] = out["l_orderkey"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


def q_events_type_share(sf_dir: str):
    """Ratio-to-report analytic: each type's event count and its share of
    the grand total (6dp). The distributed part is the usual count fold;
    the share divides the type-cardinality frame on the driver."""
    from ..stages.aggregate import grouped_counts

    counts = grouped_counts(
        _read(sf_dir, "events", columns=["event_type"]),
        keys=["event_type"], sum_col=None,
    )
    if "event_type" not in counts.columns or not len(counts):  # empty input
        return _typed_empty(event_type=object, n="int64", share="float64")
    counts["n"] = counts["n_rows"].astype("int64")
    total = float(counts["n"].sum())
    # HALF-UP ties to match DuckDB round(): n/total hits representable .5
    # boundaries at many totals and np.round (half-to-even) diverges there
    from ..util import round_half_up

    counts["share"] = round_half_up(counts["n"].to_numpy(np.float64) / total, 6)
    out = counts[["event_type", "n", "share"]]
    return out.sort_values("event_type").reset_index(drop=True)


def q_user_retention(sf_dir: str):
    """Cohort retention: users grouped by their FIRST active day; for each
    cohort, how many returned exactly 1 day and exactly 7 days later.

    Scale shape: batches pre-reduce to distinct (user, day) pairs, users
    hash-bucket (64) so each user's whole activity lands in one task, and
    the per-bucket kernel is three vectorized groupbys (min-day transform
    + membership flags). Only (cohort, n_users, n_d1, n_d7) partials leave
    the buckets; events and the per-user day sets never reach the
    driver."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def _days(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "user_id": b["user_id"],
                "day": _day_from_us(pc.cast(b["ts"], pa.int64())),
            }
        ).to_pandas().drop_duplicates()
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _cohort(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g[["user_id", "day"]].drop_duplicates()
        first = g.groupby("user_id")["day"].transform("min")
        flags = pd.DataFrame(
            {
                "user_id": g["user_id"],
                "cohort": first,
                "d1": g["day"] == first + 1,
                "d7": g["day"] == first + 7,
            }
        )
        per_user = flags.groupby("user_id", as_index=False).agg(
            cohort=("cohort", "first"), d1=("d1", "any"), d7=("d7", "any")
        )
        out = per_user.groupby("cohort", as_index=False).agg(
            n_users=("d1", "size"),
            n_retained_d1=("d1", "sum"),
            n_retained_d7=("d7", "sum"),
        )
        return out

    parts = (
        ev.map_batches(_days, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_cohort, batch_format="pandas")
        .to_pandas()
    )
    if "cohort" not in parts.columns:  # empty input
        return _typed_empty(cohort="int64", n_users="int64",
                            n_retained_d1="int64", n_retained_d7="int64")
    # 64 buckets x cohort-cardinality partial rows: fold on the driver
    # (CLAUDE.md: a Ray groupby carries seconds of fixed overhead that the
    # tiny partial frame never amortizes)
    out = parts.groupby("cohort", as_index=False)[
        ["n_users", "n_retained_d1", "n_retained_d7"]
    ].sum()
    for c in ("cohort", "n_users", "n_retained_d1", "n_retained_d7"):
        out[c] = out[c].astype("int64")
    return out.sort_values("cohort").reset_index(drop=True)


def q_orders_open_per_day(sf_dir: str):
    """Concurrent-intervals sweep line: how many orders are OPEN on each
    day, where an order spans [o_orderdate, max(l_shipdate)] inclusive.

    Scale shape: lineitem folds to per-order close dates via
    bucket-collapse (never a raw order-cardinality groupby), one
    co-partitioned join attaches open dates, each span becomes two
    (+1/-1) delta events folded per day inside the batch, and the global
    prefix sum runs over the day-cardinality delta table on the driver —
    the sweep line never sees individual orders."""
    import pandas as pd

    from ..partition import stable_partition

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    n_parts = _join_num_partitions(sf_dir, "orders", "lineitem")

    def _close_partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "close_us": pc.cast(b["l_shipdate"], pa.int64()),
            }
        ).to_pandas()
        g = df.groupby("l_orderkey", as_index=False)["close_us"].max()
        g["_part"] = stable_partition(g["l_orderkey"], 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _close_collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.groupby("l_orderkey", as_index=False)["close_us"].max()

    close = (
        li.map_batches(_close_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part")
        .map_groups(_close_collapse, batch_format="pandas")
    )

    def _close_guard(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "close_us": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "close_us": pc.cast(b["close_us"], pa.int64()),
            }
        )

    close = close.map_batches(
        _close_guard, batch_format="pyarrow", batch_size=1 << 16
    ).materialize()
    if close.count() == 0:
        return _typed_empty(day="int64", n_open="int64")

    spans = close.join(
        orders, "inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def _deltas(b: pa.Table) -> pa.Table:
        import pandas as pd

        if "close_us" not in b.column_names:
            return pa.table(
                {"day": pa.array([], pa.int64()), "delta": pa.array([], pa.int64())}
            )
        d0 = _day_from_us(pc.cast(b["o_orderdate"], pa.int64())).to_numpy(
            zero_copy_only=False
        )
        d1 = _day_from_us(b["close_us"]).to_numpy(zero_copy_only=False)
        days = np.concatenate([d0, d1 + 1])
        deltas = np.concatenate(
            [np.ones(len(d0), np.int64), -np.ones(len(d1), np.int64)]
        )
        g = (
            pd.DataFrame({"day": days, "delta": deltas})
            .groupby("day", as_index=False)["delta"]
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = _fold_partials(
        spans.map_batches(_deltas, batch_format="pyarrow", batch_size=1 << 16),
        ["day"], ["delta"],
    )
    if agg is None:
        return _typed_empty(day="int64", n_open="int64")
    agg = agg.sort_values("day").reset_index(drop=True)
    agg["n_open"] = agg["delta"].cumsum().astype("int64")
    agg["day"] = agg["day"].astype("int64")
    return agg[["day", "n_open"]]


def q_funnel_steps(sf_dir: str):
    """Ordered multi-step funnel: users with a view, users whose first
    view is followed by a HIGH-VALUE (>120) click, and users whose first
    such click is followed by a high-value purchase (strictly increasing
    timestamps; the threshold keeps each step selective at every sf).

    Scale shape: user-hash buckets again; the per-bucket kernel is three
    vectorized rounds of groupby-min + timestamp-threshold mapping (first
    view -> first later click -> any later purchase), never a per-user
    Python loop. One 3-column row of counts leaves each bucket."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_type", "value"])

    def _tag(b: pa.Table) -> pa.Table:
        keep = pc.is_in(
            b["event_type"], value_set=pa.array(["view", "click", "purchase"])
        )
        t = b.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
                "value": t["value"],
                "_part": pa.array(stable_partition(t["user_id"], 64), pa.int64()),
            }
        )

    def _steps(g: "pd.DataFrame") -> "pd.DataFrame":
        views = g[g["event_type"] == "view"]
        first_view = views.groupby("user_id")["us"].min()
        clicks = g[(g["event_type"] == "click") & (g["value"] > 120.0)].copy()
        clicks["thr"] = clicks["user_id"].map(first_view)
        clicks = clicks[clicks["us"] > clicks["thr"]]
        first_click = clicks.groupby("user_id")["us"].min()
        purch = g[(g["event_type"] == "purchase") & (g["value"] > 120.0)].copy()
        purch["thr"] = purch["user_id"].map(first_click)
        purch = purch[purch["us"] > purch["thr"]]
        n_p = purch["user_id"].nunique()
        return pd.DataFrame(
            {
                "n_view": [int(len(first_view))],
                "n_view_click": [int(len(first_click))],
                "n_view_click_purchase": [int(n_p)],
            }
        )

    parts = (
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_steps, batch_format="pandas")
        .to_pandas()
    )
    cols = ["n_view", "n_view_click", "n_view_click_purchase"]
    if "n_view" not in parts.columns:
        # oracle contract: the scalar-subquery SQL always returns ONE row
        # of zero counts, never zero rows
        import pandas as pd

        return pd.DataFrame({c: pd.Series([0], dtype="int64") for c in cols})
    out = parts[cols].sum().to_frame().T
    for c in cols:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def q_events_validation(sf_dir: str):
    """Declarative data-quality gate (stages/validate.py): four rule kinds
    (not-null, numeric range, set membership, RE2-safe regex) evaluated
    vectorized per batch; only per-rule count partials shuffle."""
    from ..stages.validate import validate

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value", "props"])
    rules = [
        ("r_ts_not_null", "not_null", ("ts",)),
        ("r_value_range", "in_range", ("value", 0.0, 500.0)),
        ("r_type_known", "in_set",
         ("event_type", ("click", "view", "purchase", "signup"))),
        ("r_props_json", "regex", ("props", r"\{.*\}")),
    ]
    return validate(ev, rules)


def q_events_latest_value(sf_dir: str):
    """CDC / log-compaction: the LATEST event per (user_id, event_type) key
    under the (ts DESC, event_id DESC) total order, aggregated per type.

    The keep-newest-per-key upsert shape: per-batch argmax partials (latest
    is associative, so a batch reduces to at most its own key count), then
    the stable_pair_partition bucket-collapse — every copy of a key lands
    in one bucket, so the per-bucket argmax is the global latest; only
    (key, ts, event_id, value) partial rows ever shuffle and the driver
    folds 64 x n_types aggregate rows, never keys."""
    import pandas as pd

    from ..partition import stable_pair_partition

    ev = _read(
        sf_dir, "events",
        columns=["user_id", "event_type", "ts", "event_id", "value"],
    )
    n_parts = 64
    sort_cols = ["user_id", "event_type", "ts", "event_id"]

    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["ts"].notna()]
        df = df.sort_values(sort_cols, ascending=[True, True, False, False])
        latest = df.drop_duplicates(["user_id", "event_type"])
        latest = latest.copy()
        latest["_part"] = stable_pair_partition(
            latest["user_id"], latest["event_type"], n_parts
        )
        return pa.Table.from_pandas(latest, preserve_index=False)

    def _collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(sort_cols, ascending=[True, True, False, False])
        latest = g.drop_duplicates(["user_id", "event_type"])
        cents = np.floor(latest["value"].to_numpy() * 100 + 0.5)
        agg = (
            pd.DataFrame(
                {"event_type": latest["event_type"].to_numpy(), "cents": cents}
            )
            .groupby("event_type", as_index=False)
            .agg(n_keys=("cents", "size"), latest_value_cents=("cents", "sum"))
        )
        return agg

    parts = (
        ev.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("_part")
        .map_groups(_collapse, batch_format="pandas")
        .to_pandas()
    )
    import pandas as pd

    if len(parts) == 0 or "event_type" not in parts.columns:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype="object"),
                "n_keys": pd.Series([], dtype="int64"),
                "latest_value_cents": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby("event_type", as_index=False)[
        ["n_keys", "latest_value_cents"]
    ].sum()
    out["n_keys"] = out["n_keys"].astype("int64")
    out["latest_value_cents"] = out["latest_value_cents"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_orders_big_quantity(sf_dir: str, qty_threshold: float = 300.0,
                          max_survivors: int = 5_000_000):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds the
    threshold, joined back to the order header — the classic big-big join
    collapsed to a tiny one by aggregating the fact side FIRST.

    lineitem reduces to per-block (orderkey, qty_sum) partials, bucket-
    collapses to global per-order sums, and only threshold SURVIVORS (a
    handful by construction) leave the fold; the orders side is then
    filtered by a broadcast survivor-key array — no all-to-all join ever
    runs. A fail-fast bound guards the survivor collect (past it, the
    join must stay a Dataset)."""
    import pandas as pd
    import ray

    from ..partition import stable_partition

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    n_parts = 64

    def _partial(b: pa.Table) -> pa.Table:
        df = (
            b.to_pandas()
            .groupby("l_orderkey", as_index=False)["l_quantity"]
            .sum()
        )
        df["_part"] = stable_partition(df["l_orderkey"], n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        tot = g.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        return tot[tot["l_quantity"] > qty_threshold]

    surv_ds = (
        li.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("_part")
        .map_groups(_collapse, batch_format="pandas")
        .materialize()  # consumed twice: bound-count then collect
    )
    empty = pd.DataFrame(
        {
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_custkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="object"),
            "total_qty": pd.Series([], dtype="int64"),
            "price_cents": pd.Series([], dtype="int64"),
        }
    )
    n_surv = surv_ds.count()
    if n_surv == 0:
        return empty
    if n_surv > max_survivors:
        raise ValueError(
            f"orders_big_quantity: {n_surv} qualifying orders exceed "
            f"max_survivors={max_survivors}; keep the survivor side a "
            "Dataset and use Dataset.join past this bound"
        )
    surv = surv_ds.to_pandas()
    if "l_orderkey" not in surv.columns:
        return empty
    keys = np.sort(surv["l_orderkey"].unique())
    key_ref = ray.put(keys)

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def _filter_orders(b: pa.Table) -> pa.Table:
        ks = _broadcast_get(key_ref)
        ok = b["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, ok)
        idx[idx >= len(ks)] = 0
        return b.filter(pa.array(ks[idx] == ok))

    hdr = orders.map_batches(
        _filter_orders, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()
    if len(hdr) == 0 or "o_orderkey" not in hdr.columns:
        return empty
    out = hdr.merge(
        surv.rename(columns={"l_orderkey": "o_orderkey"}), on="o_orderkey"
    )
    out["total_qty"] = (
        np.floor(out["l_quantity"].to_numpy()).astype("int64")
    )
    out["price_cents"] = np.floor(
        out["o_totalprice"].to_numpy() * 100 + 0.5
    ).astype("int64")
    out["o_orderdate"] = out["o_orderdate"].dt.strftime("%Y-%m-%d")
    out = out.sort_values(
        ["total_qty", "o_orderkey"], ascending=[False, True]
    ).head(100)
    for c in ("o_orderkey", "o_custkey"):
        out[c] = out[c].astype("int64")
    return out[
        ["o_orderkey", "o_custkey", "o_orderdate", "total_qty", "price_cents"]
    ].reset_index(drop=True)


def q_events_value_mad(sf_dir: str):
    """Robust dispersion outliers: rows with |value - median| > 3 * MAD
    (MAD = median of absolute deviations), counted per event_type.

    Both medians come from ONE bounded distinct-value histogram fold (the
    interpolated_quantile_by_key shape: only (value, count) rows shuffle,
    every copy of a value lands in one bucket) — the deviation median
    re-reads the SAME driver-held histogram (deviations permute the
    multiset, counts are unchanged), so the second quantile costs no
    second pass. Outlier counting is then one streamed scan against the
    two broadcast scalars."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    n_parts = 64

    def _vpart(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["value"]))
        s = b["value"].to_pandas().value_counts()
        df = s.rename_axis("value").reset_index(name="n")
        df["_part"] = stable_partition(df["value"], n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _vcollapse(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.groupby("value", as_index=False)["n"].sum()

    hist_ds = (
        ev.map_batches(
            _vpart, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("_part")
        .map_groups(_vcollapse, batch_format="pandas")
        .materialize()  # consumed twice: bound-count then collect
    )
    max_distinct = 5_000_000
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"events_value_mad: {n_distinct} distinct values exceed "
            f"max_distinct={max_distinct}; fold the histogram to a GK "
            "sketch past this bound"
        )
    hist = hist_ds.to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype="object"),
            "n_outliers": pd.Series([], dtype="int64"),
            "med": pd.Series([], dtype="float64"),
            "mad": pd.Series([], dtype="float64"),
        }
    )
    if len(hist) == 0 or "value" not in hist.columns:
        return empty

    def _wq50(vals: np.ndarray, counts: np.ndarray) -> float:
        """Type-7 / quantile_cont median over a (value, count) histogram:
        h = (N-1)*0.5, v[floor(h)] + (h-floor(h)) * (v[floor(h)+1] -
        v[floor(h)]) — the exact interpolated_quantile_by_key formula."""
        order = np.argsort(vals, kind="stable")
        v = vals[order]
        c = counts[order]
        n = int(c.sum())
        h = (n - 1) * 0.5
        lo = int(np.floor(h))
        cum = np.cumsum(c)
        i_lo = int(np.searchsorted(cum, lo, side="right"))
        v_lo = v[i_lo]
        if lo + 1 <= n - 1:
            i_hi = int(np.searchsorted(cum, lo + 1, side="right"))
            v_hi = v[i_hi]
        else:
            v_hi = v_lo
        return float(v_lo + (h - lo) * (v_hi - v_lo))

    vals = hist["value"].to_numpy(dtype=np.float64)
    counts = hist["n"].to_numpy(dtype=np.int64)
    med = float(np.round(_wq50(vals, counts), 6))
    mad = float(np.round(_wq50(np.abs(vals - med), counts), 6))

    def _outliers(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["value"]))
        df = b.to_pandas()
        v = df["value"].to_numpy(dtype=np.float64)
        df["is_out"] = (np.abs(v - med) > 3.0 * mad).astype(np.int64)
        agg = df.groupby("event_type", as_index=False)["is_out"].sum()
        return pa.Table.from_pandas(
            agg.rename(columns={"is_out": "n_outliers"}), preserve_index=False
        )

    from ray.data.aggregate import Sum

    # second pass is its own read (a fresh Dataset): re-scanning storage
    # streams, materializing the whole fact table to reuse it would not
    ev2 = _read(sf_dir, "events", columns=["event_type", "value"])
    out = (
        ev2.map_batches(
            _outliers, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("event_type")
        .aggregate(Sum("n_outliers", alias_name="n_outliers"))
        .to_pandas()
    )
    if len(out) == 0 or "event_type" not in out.columns:
        return empty
    out["n_outliers"] = out["n_outliers"].astype("int64")
    out["med"] = med
    out["mad"] = mad
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_hourly_top_type(sf_dir: str):
    """Windowed heavy-hitter / mode: each hour's dominant event_type with
    its count and the hour's total (ties: count DESC, type ASC).

    The per-window argmax shape: per-batch (hour, type) count partials,
    then a stable_partition bucket-collapse on the HOUR key — every copy
    of an hour lands in one bucket, so the per-bucket winner and total are
    global; only (hour, type, n) rows ever shuffle and the result is
    window-cardinality-sized."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["ts", "event_type"])
    n_parts = 64

    def _partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us // 3_600_000_000) * 3600
        df = (
            pd.DataFrame(
                {
                    "hour_start": hour.astype(np.int64),
                    "event_type": b["event_type"].to_pandas(),
                }
            )
            .groupby(["hour_start", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        df["_part"] = stable_partition(df["hour_start"], n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        tot = g.groupby(["hour_start", "event_type"], as_index=False)["n"].sum()
        totals = tot.groupby("hour_start")["n"].transform("sum")
        tot["n_total"] = totals
        top = tot.sort_values(
            ["hour_start", "n", "event_type"], ascending=[True, False, True]
        ).drop_duplicates("hour_start")
        return pd.DataFrame(
            {
                "hour_start": top["hour_start"].to_numpy(),
                "top_type": top["event_type"].to_numpy(),
                "n_top": top["n"].to_numpy(),
                "n_total": top["n_total"].to_numpy(),
            }
        )

    out = (
        ev.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("_part")
        .map_groups(_collapse, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0 or "hour_start" not in out.columns:
        return pd.DataFrame(
            {
                "hour_start": pd.Series([], dtype="int64"),
                "top_type": pd.Series([], dtype="object"),
                "n_top": pd.Series([], dtype="int64"),
                "n_total": pd.Series([], dtype="int64"),
            }
        )
    for c in ("hour_start", "n_top", "n_total"):
        out[c] = out[c].astype("int64")
    return out.sort_values("hour_start").reset_index(drop=True)


def q_orders_monthly_growth(sf_dir: str):
    """Month-over-month order-count growth (the LAG analytic over an
    aggregated series): per-month order counts and the delta vs the
    previous CALENDAR month (NULL-as-0 delta for the first month).

    Scale shape: months are time-bounded (decades of data is still
    hundreds of rows), so events fold to per-block (month, n) partials,
    one tiny Sum groupby, and the LAG itself runs on the driver over the
    month-cardinality series — never a second pass over orders. The
    previous month is the previous CALENDAR month (gaps break the chain),
    exactly like the oracle's LAG over a month-keyed aggregate."""
    import pandas as pd

    ords = _read(sf_dir, "orders", columns=["o_orderdate"])

    def _partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        us = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # month key yyyymm via numpy datetime arithmetic (vectorized)
        d = us.astype("datetime64[us]").astype("datetime64[M]")
        yyyymm = (d.astype(np.int64) + 1970 * 12)  # months since year 0
        g = (
            pd.DataFrame({"m": yyyymm})
            .groupby("m", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ords.map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("m")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if len(out) == 0 or "m" not in out.columns:
        return pd.DataFrame(
            {
                "month": pd.Series([], dtype="object"),
                "n_orders": pd.Series([], dtype="int64"),
                "delta": pd.Series([], dtype="int64"),
            }
        )
    out = out.sort_values("m").reset_index(drop=True)
    m = out["m"].to_numpy(dtype=np.int64)
    n = out["n"].to_numpy(dtype=np.int64)
    prev = np.zeros(len(m), dtype=np.int64)
    if len(m) > 1:
        is_adjacent = m[1:] == m[:-1] + 1
        prev[1:] = np.where(is_adjacent, n[:-1], 0)
    year = m // 12
    mon = m % 12 + 1
    return pd.DataFrame(
        {
            "month": [f"{y:04d}-{mm:02d}" for y, mm in zip(year, mon)],
            "n_orders": n,
            "delta": n - prev,
        }
    )


def q_tpch_q5_revenue(sf_dir: str, region: str = "ASIA",
                      year_start: str = "1996-01-01",
                      max_supplier_broadcast: int = 20_000_000):
    """TPC-H Q5 shape: revenue per nation where the ordering customer and
    the line's supplier share a nation inside one region, for one order
    year — the 6-table join, Ray-Data-first.

    Scale shape: region/nation are true dims (driver-side, 5/25 rows);
    supplier is broadcast as a sorted suppkey->nationkey array with a
    fail-fast bound (past it the supplier lookup becomes a third
    co-partitioned join); customers prune to the region BEFORE anything
    moves. The two big joins (orders x customer on custkey, then
    order-nation x lineitem-revenue on orderkey) are TAGGED-UNION
    co-partitioned hash joins: both sides emit schema-aligned (key, val,
    rev, side) rows, union is free (lazy block concat), ONE
    stable_partition groupby co-locates each key, and a vectorized pandas
    merge per bucket joins them — no aggregator actor pools, only
    fixed-width int rows ever shuffle (the events_asof_tier_bigdim
    pattern applied to a relational plan). Lineitem pre-aggregates
    revenue per (orderkey, supplier-nation) inside the batch fn, so the
    fact table's shuffle volume is bounded by order x nation cardinality,
    not line count."""
    import pandas as pd
    import pyarrow.parquet as pq_
    import ray

    from ..partition import stable_partition

    # --- driver-side dims (region, nation are 5/25 rows at any SF)
    reg = pq_.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    ).to_pandas()
    nat = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    empty = pd.DataFrame(
        {
            "n_name": pd.Series([], dtype="object"),
            "n_lines": pd.Series([], dtype="int64"),
            "revenue_cents": pd.Series([], dtype="int64"),
        }
    )
    rkeys = reg[reg["r_name"] == region]["r_regionkey"]
    if not len(rkeys):
        return empty
    nat_in = nat[nat["n_regionkey"].isin(set(rkeys))]
    nation_keys = np.sort(nat_in["n_nationkey"].to_numpy(dtype=np.int64))
    names = dict(zip(nat_in["n_nationkey"], nat_in["n_name"]))
    if not len(nation_keys):
        return empty

    # --- supplier broadcast (suppkey -> nationkey, sorted for searchsorted)
    sup_ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n_sup = sup_ds.count()  # parquet metadata
    if n_sup > max_supplier_broadcast:
        raise ValueError(
            f"tpch_q5_revenue: {n_sup} suppliers exceed the broadcast bound "
            f"{max_supplier_broadcast}; route the supplier lookup through a "
            "third co-partitioned join instead"
        )
    sup = sup_ds.to_pandas().sort_values("s_suppkey")
    sup_ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(dtype=np.int64),
            sup["s_nationkey"].to_numpy(dtype=np.int64),
        )
    )

    lo_us = int(pd.Timestamp(year_start).value // 1000)
    hi_us = int((pd.Timestamp(year_start) + pd.DateOffset(years=1)).value // 1000)
    n_parts = 64

    def _aligned(key, val, rev, side):
        return pa.table(
            {
                "key": pa.array(np.asarray(key, dtype=np.int64), pa.int64()),
                "val": pa.array(np.asarray(val, dtype=np.int64), pa.int64()),
                "rev": pa.array(np.asarray(rev, dtype=np.int64), pa.int64()),
                "side": pa.array(
                    np.full(len(key), side, dtype=np.int32), pa.int32()
                ),
                "_part": pa.array(
                    stable_partition(np.asarray(key, dtype=np.int64), n_parts)
                    if len(key)
                    else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    # --- join 1: orders (this year) x region customers, keyed custkey
    def _o_side(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names:
            return _aligned([], [], [], 0)
        dts = pc.cast(b["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(dts, lo_us), pc.less(dts, hi_us))
        b = b.filter(keep)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return _aligned(ck, ok, np.zeros(len(ck), np.int64), 0)

    def _c_side(b: pa.Table) -> pa.Table:
        if "c_custkey" not in b.column_names:
            return _aligned([], [], [], 1)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(nation_keys, nk)
        idx[idx >= len(nation_keys)] = 0
        keep = nation_keys[idx] == nk
        return _aligned(
            b["c_custkey"].to_numpy(zero_copy_only=False)[keep],
            nk[keep],
            np.zeros(int(keep.sum()), np.int64),
            1,
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        _o_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        _c_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def _merge1(g: "pd.DataFrame") -> "pd.DataFrame":
        o = g[g["side"] == 0]
        c = g[g["side"] == 1]
        if not len(o) or not len(c):
            return pd.DataFrame(
                {
                    "key": pd.Series([], dtype="int64"),    # o_orderkey
                    "val": pd.Series([], dtype="int64"),    # c_nationkey
                    "rev": pd.Series([], dtype="int64"),
                    "side": pd.Series([], dtype="int32"),
                    "_part": pd.Series([], dtype="int64"),
                }
            )
        m = o.merge(
            c[["key", "val"]].rename(columns={"val": "c_nat"}), on="key"
        )
        out = pd.DataFrame(
            {
                "key": m["val"].to_numpy(),     # o_orderkey becomes the key
                "val": m["c_nat"].to_numpy(),   # customer nation rides along
                "rev": np.zeros(len(m), np.int64),
                "side": np.zeros(len(m), np.int32),
            }
        )
        out["_part"] = stable_partition(out["key"], n_parts)
        return out

    onat = orders.union(cust).groupby("_part").map_groups(
        _merge1, batch_format="pandas"
    )

    # --- join 2: order-nation x lineitem revenue, keyed orderkey
    def _l_side(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names:
            return _aligned([], [], [], 1)
        ks, ns = _broadcast_get(sup_ref)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ks, sk)
        pos[pos >= len(ks)] = 0
        ok_sup = ks[pos] == sk
        snat = ns[pos]
        idx = np.searchsorted(nation_keys, snat)
        idx[idx >= len(nation_keys)] = 0
        keep = ok_sup & (nation_keys[idx] == snat)
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])
        )
        df = pd.DataFrame(
            {
                "key": b["l_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "val": snat[keep],
                "rev": _cents(rev).to_numpy(zero_copy_only=False)[keep],
            }
        )
        # pre-aggregate per (orderkey, supplier nation): shuffle volume is
        # bounded by order x nation cardinality, never line count
        g = df.groupby(["key", "val"], as_index=False).agg(
            rev=("rev", "sum"), n=("rev", "size")
        )
        t = _aligned(g["key"], g["val"], g["rev"], 1)
        return t.append_column("n", pa.array(g["n"].to_numpy(np.int64), pa.int64()))

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        _l_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def _with_n(b: pa.Table) -> pa.Table:
        if "n" in b.column_names:
            return b
        return b.append_column(
            "n", pa.array(np.zeros(b.num_rows, np.int64), pa.int64())
        )

    def _merge2(g: "pd.DataFrame") -> "pd.DataFrame":
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        if not len(o) or not len(l):
            return pd.DataFrame(
                {
                    "nation": pd.Series([], dtype="int64"),
                    "n_lines": pd.Series([], dtype="int64"),
                    "revenue_cents": pd.Series([], dtype="int64"),
                }
            )
        m = o[["key", "val"]].merge(
            l[["key", "val", "rev", "n"]].rename(columns={"val": "s_nat"}),
            on="key",
        )
        m = m[m["val"] == m["s_nat"]]  # customer nation == supplier nation
        agg = m.groupby("val", as_index=False).agg(
            n_lines=("n", "sum"), revenue_cents=("rev", "sum")
        )
        return agg.rename(columns={"val": "nation"})

    parts = (
        onat.map_batches(
            _with_n, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .union(li)
        .groupby("_part")
        .map_groups(_merge2, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0 or "nation" not in parts.columns:
        return empty
    out = parts.groupby("nation", as_index=False)[
        ["n_lines", "revenue_cents"]
    ].sum()
    out["n_name"] = out["nation"].map(names)
    out["n_lines"] = out["n_lines"].astype("int64")
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return (
        out[["n_name", "n_lines", "revenue_cents"]]
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def q_tpch_q10_returns(sf_dir: str, quarter_start: str = "1996-01-01",
                       topk: int = 20):
    """TPC-H Q10 shape: top customers by revenue lost to returned items in
    one order quarter — lineitem(R) x orders x customer x nation.

    Scale shape: the q5 tagged-union co-partitioned plan applied twice.
    Lineitem pre-aggregates returned-revenue per orderkey INSIDE the batch
    fn (shuffle volume is order-cardinality, not line-cardinality), joins
    orders-in-quarter on orderkey in 64 hash buckets, re-keys the joined
    rows by custkey, and the second tagged union joins customer rows in
    the same bucketed shape. Nation is a driver dim (25 rows). Each final
    bucket keeps only its local top-k candidates under the (revenue desc,
    custkey asc) total order, so the driver folds 64 x k rows - never the
    customer space."""
    import pandas as pd
    import pyarrow.parquet as pq_

    from ..partition import stable_partition

    nat = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    names = dict(zip(nat["n_nationkey"], nat["n_name"]))

    lo_us = int(pd.Timestamp(quarter_start).value // 1000)
    hi_us = int((pd.Timestamp(quarter_start) + pd.DateOffset(months=3)).value // 1000)
    n_parts = 64

    empty = pd.DataFrame(
        {
            "c_custkey": pd.Series([], dtype="int64"),
            "c_name": pd.Series([], dtype="object"),
            "n_name": pd.Series([], dtype="object"),
            "n_lines": pd.Series([], dtype="int64"),
            "revenue_cents": pd.Series([], dtype="int64"),
        }
    )

    def _aligned(key, rev, nl, name, nat_, side):
        key = np.asarray(key, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "rev": pa.array(np.asarray(rev, dtype=np.int64), pa.int64()),
                "nl": pa.array(np.asarray(nl, dtype=np.int64), pa.int64()),
                "name": pa.array(list(name), pa.string()),
                "nat": pa.array(np.asarray(nat_, dtype=np.int64), pa.int64()),
                "side": pa.array(np.full(len(key), side, np.int32), pa.int32()),
                "_part": pa.array(
                    stable_partition(key, n_parts)
                    if len(key) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    def _l_side(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names:
            return _aligned([], [], [], [], [], 0)
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])
        )
        df = pd.DataFrame(
            {
                "k": b["l_orderkey"].to_numpy(zero_copy_only=False),
                "r": _cents(rev).to_numpy(zero_copy_only=False),
            }
        ).groupby("k", as_index=False).agg(nl=("r", "size"), r=("r", "sum"))
        z = np.zeros(len(df), np.int64)
        return _aligned(df["k"], df["r"], df["nl"], [""] * len(df), z, 0)

    def _o_side(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names:
            return _aligned([], [], [], [], [], 1)
        dts = pc.cast(b["o_orderdate"], pa.int64())
        b = b.filter(pc.and_(pc.greater_equal(dts, lo_us), pc.less(dts, hi_us)))
        n = b.num_rows
        return _aligned(
            b["o_orderkey"].to_numpy(zero_copy_only=False),
            b["o_custkey"].to_numpy(zero_copy_only=False),  # cust rides in rev
            np.zeros(n, np.int64), [""] * n, np.zeros(n, np.int64), 1,
        )

    def _merge1(g: "pd.DataFrame") -> pa.Table:
        # returns ARROW so the stage-2 union's blocks stay one block type
        # (mixing pandas map_groups output with arrow map_batches output
        # breaks the downstream shuffle's boundary sampler)
        li = g[g["side"] == 0]
        o = g[g["side"] == 1]
        if not len(li) or not len(o):
            return _aligned([], [], [], [], [], 0)
        m = li.merge(
            o[["key", "rev"]].rename(columns={"rev": "cust"}), on="key"
        )
        # re-key by custkey; pre-agg per custkey inside the bucket
        per_c = m.groupby("cust", as_index=False)[["rev", "nl"]].sum()
        return _aligned(
            per_c["cust"], per_c["rev"], per_c["nl"],
            [""] * len(per_c), np.zeros(len(per_c), np.int64), 0,
        )

    def _c_side(b: pa.Table) -> pa.Table:
        if "c_custkey" not in b.column_names:
            return _aligned([], [], [], [], [], 1)
        n = b.num_rows
        return _aligned(
            b["c_custkey"].to_numpy(zero_copy_only=False),
            np.zeros(n, np.int64), np.zeros(n, np.int64),
            b["c_name"].to_pandas(),
            b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            1,
        )

    def _merge2(g: "pd.DataFrame") -> "pd.DataFrame":
        r = g[g["side"] == 0]
        c = g[g["side"] == 1]
        out_cols = {
            "c_custkey": "int64", "c_name": "object", "nat": "int64",
            "n_lines": "int64", "revenue_cents": "int64",
        }
        if not len(r) or not len(c):
            return pd.DataFrame(
                {k: pd.Series([], dtype=t) for k, t in out_cols.items()}
            )
        # a custkey's rows arrive from MANY stage-1 buckets: sum first
        per_c = r.groupby("key", as_index=False)[["rev", "nl"]].sum()
        m = per_c.merge(c[["key", "name", "nat"]], on="key")
        m = m.sort_values(["rev", "key"], ascending=[False, True]).head(topk)
        return pd.DataFrame(
            {
                "c_custkey": m["key"].to_numpy(np.int64),
                "c_name": m["name"].to_numpy(),
                "nat": m["nat"].to_numpy(np.int64),
                "n_lines": m["nl"].to_numpy(np.int64),
                "revenue_cents": m["rev"].to_numpy(np.int64),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(_l_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(_o_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    rev_by_cust = (
        li.union(orders).groupby("_part").map_groups(_merge1, batch_format="pandas")
    )
    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"]
    ).map_batches(_c_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    cand = (
        rev_by_cust.union(cust).groupby("_part")
        .map_groups(_merge2, batch_format="pandas")
        .to_pandas()
    )
    if not len(cand) or "c_custkey" not in cand.columns:
        return empty
    out = cand.sort_values(
        ["revenue_cents", "c_custkey"], ascending=[False, True]
    ).head(topk).reset_index(drop=True)
    out["n_name"] = out["nat"].map(names)
    for c in ("c_custkey", "n_lines", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out[["c_custkey", "c_name", "n_name", "n_lines", "revenue_cents"]]


def q_tpch_q14_promo(sf_dir: str, max_part_broadcast: int = 50_000_000):
    """TPC-H Q14 shape: promo-type revenue share per ship month.

    Scale shape: part collapses to a sorted (p_partkey -> is-promo) bit
    array broadcast once via ray.put (fail-fast bound, like q5's supplier
    map); lineitem then needs NO shuffle at all — each block looks up its
    partkeys with searchsorted and emits per-month (promo_cents,
    total_cents, n_lines) partials, and the driver folds n_blocks x
    n_months rows. The share is a ratio of exact integer cents folded in
    PYTHON ints (immune to int64 overflow at any scale), rounded half-up
    like DuckDB round()."""
    import pandas as pd
    import ray

    from ..broadcast import broadcast_get
    from ..util import round_half_up

    part_ds = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    n_part = part_ds.count()  # parquet metadata only
    if n_part > max_part_broadcast:
        raise ValueError(
            f"tpch_q14_promo: {n_part} parts exceed the broadcast bound "
            f"{max_part_broadcast}; route the part lookup through a "
            "co-partitioned tagged-union join (q5/q10 shape) instead"
        )
    pdf = part_ds.to_pandas()
    if "p_partkey" not in pdf.columns:  # empty read drops the schema
        flag_ref = ray.put(
            (np.array([], dtype=np.int64), np.array([], dtype=bool))
        )
    else:
        pdf = pdf.sort_values("p_partkey")
        flag_ref = ray.put(
            (
                pdf["p_partkey"].to_numpy(dtype=np.int64),
                (pdf["p_type"].to_numpy() == "PROMO"),
            )
        )

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "month": pa.array([], pa.string()),
            "promo_cents": pa.array([], pa.int64()),
            "total_cents": pa.array([], pa.int64()),
            "n_lines": pa.array([], pa.int64()),
        }
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["l_shipdate"]))
        if b.num_rows == 0:
            return pa.table(cols)
        keys, promo = broadcast_get(flag_ref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:  # empty part table: the inner join drops all
            return pa.table(cols)
        idx = np.searchsorted(keys, pk)
        idx[idx >= len(keys)] = 0
        hit = keys[idx] == pk
        if not hit.all():  # inner-join semantics: unmatched lines drop
            b = b.filter(pa.array(hit))
            pk = pk[hit]
            idx = idx[hit]
            if b.num_rows == 0:
                return pa.table(cols)
        is_promo = promo[idx]
        cents = _cents(
            pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        ).to_numpy(zero_copy_only=False)
        month = (
            pd.Series(b["l_shipdate"].to_pandas()).dt.strftime("%Y-%m").to_numpy()
        )
        g = pd.DataFrame(
            {
                "month": month,
                "promo_cents": np.where(is_promo, cents, 0),
                "total_cents": cents,
                "n_lines": np.ones(len(cents), np.int64),
            }
        ).groupby("month", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_extendedprice", "l_discount",
                       "l_shipdate"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .to_pandas()
    )
    if not len(parts) or "month" not in parts.columns:
        return _typed_empty(month=object, n_lines="int64",
                            promo_cents="int64", total_cents="int64",
                            promo_pct="float64")
    out = parts.groupby("month", as_index=False)[
        ["promo_cents", "total_cents", "n_lines"]
    ].sum()
    # exact integer ratio in Python ints, THEN one float division per month
    pct = [
        float(int(100) * int(p)) / float(int(t))
        for p, t in zip(out["promo_cents"], out["total_cents"])
    ]
    out["promo_pct"] = round_half_up(pct, 6)
    for c in ("promo_cents", "total_cents", "n_lines"):
        out[c] = out[c].astype("int64")
    return (
        out[["month", "n_lines", "promo_cents", "total_cents", "promo_pct"]]
        .sort_values("month").reset_index(drop=True)
    )


def q_events_interarrival(sf_dir: str):
    """Per-user inter-arrival gap stats (count / mean / max seconds).

    Scale shape: the sessionize bucketing — users hash-bucket (64) via
    stable_partition so each user's full timeline lands in ONE task, the
    per-bucket kernel is one vectorized sort + diff (gap multiset per user
    is tie-order invariant: equal timestamps yield zero gaps wherever they
    land, and event_id breaks the sort deterministically anyway), and only
    per-user (n, sum_us, max_us) rows leave the bucket. Mean is a ratio of
    exact integers rounded half-up like the oracle's round()."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_id"])

    def _tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        t = pa.table(
            {
                "user_id": b["user_id"],
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "event_id": b["event_id"],
            }
        )
        df = t.to_pandas()
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _gaps(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["user_id", "ts_us", "event_id"])
        same = g["user_id"].to_numpy() == np.roll(g["user_id"].to_numpy(), 1)
        gap = g["ts_us"].to_numpy() - np.roll(g["ts_us"].to_numpy(), 1)
        if len(g):
            same[0] = False
        d = pd.DataFrame({"user_id": g["user_id"].to_numpy()[same],
                          "gap": gap[same]})
        if not len(d):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_gaps": pd.Series([], dtype="int64"),
                    "sum_us": pd.Series([], dtype="int64"),
                    "max_us": pd.Series([], dtype="int64"),
                }
            )
        return d.groupby("user_id", as_index=False).agg(
            n_gaps=("gap", "size"), sum_us=("gap", "sum"), max_us=("gap", "max")
        )

    out = (
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_gaps, batch_format="pandas")
        .to_pandas()
    )
    if not len(out) or "user_id" not in out.columns:
        return _typed_empty(user_id="int64", n_gaps="int64",
                            avg_gap_sec="float64", max_gap_sec="float64")
    out["avg_gap_sec"] = round_half_up(
        out["sum_us"].to_numpy(np.float64)
        / (out["n_gaps"].to_numpy(np.int64) * 1_000_000).astype(np.float64),
        6,
    )
    out["max_gap_sec"] = round_half_up(
        out["max_us"].to_numpy(np.float64) / 1_000_000.0, 6
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["n_gaps"] = out["n_gaps"].astype("int64")
    return (
        out[["user_id", "n_gaps", "avg_gap_sec", "max_gap_sec"]]
        .sort_values("user_id").reset_index(drop=True)
    )


def q_events_type_trend(sf_dir: str):
    """Per-type OLS regression of value (cents) on hour-of-day — slope and
    intercept from EXACT integer moment sums.

    Scale shape: each block reduces to one (type, n, sx, sy, sxy, sxx)
    partial row (int64 is safe per block), the driver folds n_blocks x
    n_types rows in PYTHON ints (unbounded — the n*sxy cross products
    overflow int64 at petabyte scale, so the closed-form slope
    numerator/denominator are computed exactly and only the final
    quotient touches floats, exactly like the oracle's HUGEINT math),
    and rounding is half-away-from-zero because slopes go negative."""
    import pandas as pd

    from ..util import round_half_away

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "sx": pa.array([], pa.int64()),
            "sy": pa.array([], pa.int64()),
            "sxy": pa.array([], pa.int64()),
            "sxx": pa.array([], pa.int64()),
        }
        if "ts" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["ts"]), pc.is_valid(b["value"])))
        if b.num_rows == 0:
            return pa.table(cols)
        us = pc.cast(b["ts"], pa.int64())
        hr = (
            pc.cast(
                pc.floor(pc.divide(pc.cast(us, pa.float64()), 3.6e9)),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            % 24
        )
        cents = _cents(b["value"]).to_numpy(zero_copy_only=False)
        g = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas().to_numpy(),
                "n": np.ones(len(hr), np.int64),
                "sx": hr,
                "sy": cents,
                "sxy": hr * cents,
                "sxx": hr * hr,
            }
        ).groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (
        ev.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .to_pandas()
    )
    if not len(parts) or "event_type" not in parts.columns:
        return _typed_empty(event_type=object, n="int64",
                            slope_cents_per_hour="float64",
                            intercept_cents="float64")
    rows = []
    for et, g in parts.groupby("event_type"):
        n = int(g["n"].sum()); sx = int(g["sx"].sum()); sy = int(g["sy"].sum())
        sxy = int(g["sxy"].sum()); sxx = int(g["sxx"].sum())
        den = n * sxx - sx * sx
        s_num = n * sxy - sx * sy
        i_num = sy * sxx - sx * sxy
        # float(num)/float(den): two correctly-rounded int->double casts +
        # one IEEE divide == the oracle's CAST(... AS DOUBLE)/CAST(...)
        slope = np.float64(s_num) / np.float64(den)
        icept = np.float64(i_num) / np.float64(den)
        rows.append((et, n, slope, icept))
    out = pd.DataFrame(
        rows, columns=["event_type", "n", "slope_cents_per_hour",
                       "intercept_cents"]
    )
    out["slope_cents_per_hour"] = round_half_away(
        out["slope_cents_per_hour"], 6
    )
    out["intercept_cents"] = round_half_away(out["intercept_cents"], 6)
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_users_weekly_churn(sf_dir: str):
    """Weekly churn: per epoch-week, active users and how many of them do
    NOT appear in the following week (the complement of user_retention's
    cohort view).

    Scale shape: batches pre-reduce to distinct (user, week) pairs, users
    hash-bucket (64) so each user's week set lands in one task, the
    per-bucket kernel is one sorted-diff membership test, and only
    (week, n_active, n_churned) partial rows reach the driver fold. The
    trailing week churns everyone by definition — same as the oracle's
    LEFT JOIN, kept symmetric."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    WEEK_US = 604_800_000_000.0
    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def _weeks(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["ts"]))
        wk = pc.cast(
            pc.floor(pc.divide(pc.cast(pc.cast(b["ts"], pa.int64()),
                                       pa.float64()), WEEK_US)),
            pa.int64(),
        )
        df = pa.table({"user_id": b["user_id"], "week": wk}).to_pandas()
        df = df.drop_duplicates()
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _churn(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g[["user_id", "week"]].drop_duplicates().sort_values(
            ["user_id", "week"]
        )
        u = g["user_id"].to_numpy()
        w = g["week"].to_numpy()
        nxt_same = np.roll(u, -1) == u
        nxt_wk = np.roll(w, -1)
        if len(g):
            nxt_same[-1] = False
        retained = nxt_same & (nxt_wk == w + 1)
        out = pd.DataFrame({"week": w, "churned": (~retained).astype(np.int64)})
        return out.groupby("week", as_index=False).agg(
            n_active=("churned", "size"), n_churned=("churned", "sum")
        )

    parts = (
        ev.map_batches(_weeks, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_churn, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "week" not in parts.columns:
        return _typed_empty(week="int64", n_active="int64",
                            n_churned="int64", churn_pct="float64")
    out = parts.groupby("week", as_index=False)[["n_active", "n_churned"]].sum()
    pct = [
        float(100 * int(c)) / float(int(a))
        for c, a in zip(out["n_churned"], out["n_active"])
    ]
    out["churn_pct"] = round_half_up(pct, 6)
    for c in ("week", "n_active", "n_churned"):
        out[c] = out[c].astype("int64")
    return out.sort_values("week").reset_index(drop=True)


def q_customers_dormant_rich(sf_dir: str, year_start: str = "1996-01-01"):
    """TPC-H Q22 shape: per nation, customers whose balance beats the
    positive-balance average but who placed NO order in one year — a
    global scalar subquery + anti-join.

    Scale shape: the average is folded as (sum_cents, n) integer partials
    (one row per block) and the threshold test is the exact integer
    cross-multiply cents * n > sum_cents — no float average is ever
    formed, so the filter is order- and parallelism-invariant. The
    anti-join co-partitions customer rows against per-block pre-reduced
    distinct 1996-customer keys in 64 hash buckets (tagged union, q5
    shape); only per-nation (n_cust, sum_cents) partials leave the
    buckets."""
    import pandas as pd
    import pyarrow.parquet as pq_

    from ..partition import stable_partition

    nat = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    names = dict(zip(nat["n_nationkey"], nat["n_name"]))

    empty = pd.DataFrame(
        {
            "n_name": pd.Series([], dtype="object"),
            "n_cust": pd.Series([], dtype="int64"),
            "acctbal_cents": pd.Series([], dtype="int64"),
        }
    )

    # --- global scalar: positive-balance average, exact integer partials
    cust_bal = _read(sf_dir, "customer", columns=["c_acctbal"])

    def _bal_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b["c_acctbal"])
        pos = pc.greater(cents, 0)
        cents = pc.filter(cents, pos)
        return pa.table(
            {
                "s": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
                "n": pa.array([len(cents)], pa.int64()),
            }
        )

    bal = cust_bal.map_batches(
        _bal_partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()
    if not len(bal) or "s" not in bal.columns:
        return empty
    tot_cents = int(bal["s"].sum())
    n_pos = int(bal["n"].sum())
    if n_pos == 0:
        return empty

    lo_us = int(pd.Timestamp(year_start).value // 1000)
    hi_us = int((pd.Timestamp(year_start) + pd.DateOffset(years=1)).value // 1000)
    n_parts = 64

    def _aligned(key, cents, natk, side):
        key = np.asarray(key, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "cents": pa.array(np.asarray(cents, dtype=np.int64), pa.int64()),
                "nat": pa.array(np.asarray(natk, dtype=np.int64), pa.int64()),
                "side": pa.array(np.full(len(key), side, np.int32), pa.int32()),
                "_part": pa.array(
                    stable_partition(key, n_parts)
                    if len(key) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    def _c_side(b: pa.Table) -> pa.Table:
        if "c_custkey" not in b.column_names:
            return _aligned([], [], [], 0)
        cents = _cents(b["c_acctbal"]).to_numpy(zero_copy_only=False)
        # exact rational threshold: cents > tot/n  <=>  cents * n > tot
        # (vectorized int64; the fail-fast guard keeps the cross-multiply
        # exact — past it, scale the comparison to HUGEINT-style object
        # math or quantize the average)
        if len(cents) and int(np.abs(cents).max()) * n_pos >= 2**62:
            raise ValueError(
                "customers_dormant_rich: balance-cents x population "
                "cross-multiply would overflow int64"
            )
        keep = cents * np.int64(n_pos) > np.int64(tot_cents)
        return _aligned(
            b["c_custkey"].to_numpy(zero_copy_only=False)[keep],
            cents[keep],
            b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep],
            0,
        )

    def _o_side(b: pa.Table) -> pa.Table:
        if "o_custkey" not in b.column_names:
            return _aligned([], [], [], 1)
        dts = pc.cast(b["o_orderdate"], pa.int64())
        b = b.filter(pc.and_(pc.greater_equal(dts, lo_us), pc.less(dts, hi_us)))
        ck = np.unique(b["o_custkey"].to_numpy(zero_copy_only=False))
        z = np.zeros(len(ck), np.int64)
        return _aligned(ck, z, z, 1)

    def _anti(g: "pd.DataFrame") -> "pd.DataFrame":
        c = g[g["side"] == 0]
        o = g[g["side"] == 1]
        out_cols = {"nat": "int64", "n_cust": "int64", "cents": "int64"}
        if not len(c):
            return pd.DataFrame(
                {k: pd.Series([], dtype=t) for k, t in out_cols.items()}
            )
        keep = c[~c["key"].isin(set(o["key"]))]
        if not len(keep):
            return pd.DataFrame(
                {k: pd.Series([], dtype=t) for k, t in out_cols.items()}
            )
        out = keep.groupby("nat", as_index=False).agg(
            n_cust=("key", "size"), cents=("cents", "sum")
        )
        return out[["nat", "n_cust", "cents"]]

    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_acctbal", "c_nationkey"]
    ).map_batches(_c_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate"]
    ).map_batches(_o_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    parts = (
        cust.union(orders).groupby("_part")
        .map_groups(_anti, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "nat" not in parts.columns:
        return empty
    out = parts.groupby("nat", as_index=False)[["n_cust", "cents"]].sum()
    out["n_name"] = out["nat"].map(names)
    out = out.rename(columns={"cents": "acctbal_cents"})
    out["n_cust"] = out["n_cust"].astype("int64")
    out["acctbal_cents"] = out["acctbal_cents"].astype("int64")
    return (
        out[["n_name", "n_cust", "acctbal_cents"]]
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def q_events_value_pctrank(sf_dir: str, max_fold_rows: int = 5_000_000):
    """Exact distributed percent-rank of every distinct value within its
    event type: (rows strictly below) / (n_type - 1).

    Scale shape: the events_value_mad histogram fold — blocks pre-reduce
    to (type, value_cents, n) partials so only distinct-value-cardinality
    rows move, the Dataset is materialized and count()-guarded BEFORE the
    driver collect (fail-fast rule), and the rank arithmetic is one
    cumsum per type over the folded histogram. The rank is a ratio of
    exact integers rounded half-up like the oracle's round()."""
    import pandas as pd

    from ..util import round_half_up

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def _hist(b: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "value_cents": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
        if "event_type" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["value"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas().to_numpy(),
                "value_cents": _cents(b["value"]).to_numpy(zero_copy_only=False),
            }
        ).groupby(["event_type", "value_cents"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ev.map_batches(
        _hist, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    n_rows = parts.count()
    if n_rows > max_fold_rows:
        raise ValueError(
            f"events_value_pctrank: {n_rows} histogram partials exceed the "
            f"driver fold bound {max_fold_rows}; bucket by type hash and "
            "fold per bucket (events_value_mad shape) instead"
        )
    h = _fold_partials(parts, ["event_type", "value_cents"], ["n"])
    if h is None:
        return _typed_empty(event_type=object, value_cents="int64",
                            n="int64", pct_rank="float64")
    h = h.sort_values(["event_type", "value_cents"]).reset_index(drop=True)
    h["n"] = h["n"].astype("int64")
    cum = h.groupby("event_type")["n"].cumsum() - h["n"]
    tot = h.groupby("event_type")["n"].transform("sum")
    denom = (tot - 1).to_numpy(np.float64)
    denom[denom == 0] = 1.0  # single-row type: percent_rank defines 0
    h["pct_rank"] = round_half_up(cum.to_numpy(np.float64) / denom, 6)
    h["value_cents"] = h["value_cents"].astype("int64")
    return h[["event_type", "value_cents", "n", "pct_rank"]]


def q_events_rolling_wau(sf_dir: str, window_days: int = 7):
    """Rolling 7-day active users: for every day, how many distinct users
    were active at least once in the trailing window [day-6, day].

    Scale shape: batches pre-reduce to distinct (user, day) pairs, each
    pair arithmetic-explodes to its <=7 covered days (np.repeat — no
    joins), users hash-bucket (64) so every copy of a (user, cover-day)
    pair lands in one task, the per-bucket kernel dedupes and counts per
    cover day, and only (day, n) partials reach the driver fold. Days
    past the corpus maximum are clipped so the output matches the
    oracle's observed-day domain."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def _cover(b: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "day": pa.array([], pa.int64()),
            "active_day": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "ts" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        df = pa.table(
            {
                "user_id": b["user_id"],
                "day": _day_from_us(pc.cast(b["ts"], pa.int64())),
            }
        ).to_pandas().drop_duplicates()
        u = np.repeat(df["user_id"].to_numpy(np.int64), window_days)
        d0 = np.repeat(df["day"].to_numpy(np.int64), window_days)
        off = np.tile(np.arange(window_days, dtype=np.int64), len(df))
        out = pd.DataFrame(
            {"user_id": u, "day": d0 + off, "active_day": d0}
        ).drop_duplicates(subset=["user_id", "day"])
        out["_part"] = stable_partition(out["user_id"], 64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def _count(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g[["user_id", "day", "active_day"]].drop_duplicates(
            subset=["user_id", "day"]
        )
        if not len(g):
            return pd.DataFrame(
                {
                    "day": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "max_active": pd.Series([], dtype="int64"),
                }
            )
        out = g.groupby("day", as_index=False).agg(
            n=("user_id", "size"), max_active=("active_day", "max")
        )
        return out

    parts = (
        ev.map_batches(_cover, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part")
        .map_groups(_count, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "day" not in parts.columns:
        return _typed_empty(day="int64", n_active_7d="int64")
    out = parts.groupby("day", as_index=False).agg(
        n_active_7d=("n", "sum"), max_active=("max_active", "max")
    )
    # clip the synthetic tail: a cover day with no REAL activity anywhere
    # on/after it (max observed active day < day) is outside the oracle's
    # observed-day domain
    max_day = int(parts["max_active"].max())
    out = out[out["day"] <= max_day]
    out["day"] = out["day"].astype("int64")
    out["n_active_7d"] = out["n_active_7d"].astype("int64")
    return (
        out[["day", "n_active_7d"]].sort_values("day").reset_index(drop=True)
    )


def q_tpch_q6_revenue(sf_dir: str, year_start: str = "1995-01-01"):
    """TPC-H Q6 shape: forecast-revenue scan-aggregate over one ship year.

    Scale shape: the ideal streaming query — a pruned 4-column read, one
    vectorized filter + integer-cents reduction per block, and a driver
    fold over n_blocks single-row partials (Python ints, overflow-proof).
    No shuffle, no state, linear in input."""
    import pandas as pd

    lo_us = int(pd.Timestamp(year_start).value // 1000)
    hi_us = int((pd.Timestamp(year_start) + pd.DateOffset(years=1)).value // 1000)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "n_lines": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
        }
        if "l_shipdate" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        mask = pc.is_valid(b["l_shipdate"])
        for c in ("l_discount", "l_quantity", "l_extendedprice"):
            mask = pc.and_(mask, pc.is_valid(b[c]))
        b = b.filter(mask)
        if b.num_rows == 0:
            return pa.table(cols)
        dts = pc.cast(b["l_shipdate"], pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(dts, lo_us), pc.less(dts, hi_us)),
            pc.and_(
                pc.and_(
                    pc.greater_equal(b["l_discount"], 0.05),
                    pc.less_equal(b["l_discount"], 0.07),
                ),
                pc.less(b["l_quantity"], 24.0),
            ),
        )
        b = b.filter(keep)
        if b.num_rows == 0:
            return pa.table(cols)
        cents = _cents(pc.multiply(b["l_extendedprice"], b["l_discount"]))
        return pa.table(
            {
                "n_lines": pa.array([b.num_rows], pa.int64()),
                "revenue_cents": pa.array(
                    [int(pc.sum(cents).as_py())], pa.int64()
                ),
            }
        )

    parts = (
        _read(sf_dir, "lineitem",
              columns=["l_shipdate", "l_discount", "l_quantity",
                       "l_extendedprice"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .to_pandas()
    )
    n = int(parts["n_lines"].sum()) if "n_lines" in parts.columns else 0
    rev = sum(int(v) for v in parts["revenue_cents"]) if len(parts) else 0
    return pd.DataFrame({"n_lines": pd.Series([n], dtype="int64"),
                         "revenue_cents": pd.Series([rev], dtype="int64")})


def q_tpch_q15_top_supplier(sf_dir: str, quarter_start: str = "1996-01-01"):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one ship
    quarter (ties all returned, like the spec's view-max semantics).

    Scale shape: lineitem pre-aggregates (suppkey -> cents) INSIDE each
    batch fn, so only supplier-cardinality partials shuffle; suppliers
    hash-bucket via stable_partition (a suppkey lives in exactly one
    bucket, so per-bucket sums are complete totals) and each bucket emits
    only its bucket-max tie set — the driver folds <= 64 x ties rows,
    never the supplier space. Winner names come from a second pruned
    supplier scan filtered against the (tiny) broadcast winner set — the
    supplier table itself never collects to the driver."""
    import pandas as pd
    import ray

    from ..partition import stable_partition

    lo_us = int(pd.Timestamp(quarter_start).value // 1000)
    hi_us = int(
        (pd.Timestamp(quarter_start) + pd.DateOffset(months=3)).value // 1000
    )
    n_parts = 64
    empty = _typed_empty(s_suppkey="int64", s_name=object,
                         total_revenue_cents="int64")

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "k": pa.array([], pa.int64()),
            "rev": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "l_suppkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        mask = pc.and_(pc.is_valid(b["l_shipdate"]),
                       pc.is_valid(b["l_extendedprice"]))
        b = b.filter(mask)
        if b.num_rows:
            dts = pc.cast(b["l_shipdate"], pa.int64())
            b = b.filter(
                pc.and_(pc.greater_equal(dts, lo_us), pc.less(dts, hi_us))
            )
        if b.num_rows == 0:
            return pa.table(cols)
        cents = _cents(
            pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        )
        g = (
            pd.DataFrame(
                {
                    "k": b["l_suppkey"].to_numpy(zero_copy_only=False),
                    "rev": cents.to_numpy(zero_copy_only=False),
                }
            )
            .groupby("k", as_index=False)["rev"].sum()
        )
        k = g["k"].to_numpy(np.int64)
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "rev": pa.array(g["rev"].to_numpy(np.int64), pa.int64()),
                "_part": pa.array(stable_partition(k, n_parts), pa.int64()),
            }
        )

    def _bucket_max(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"k": "int64", "rev": "int64"}
        if not len(g) or "k" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        tot = g.groupby("k", as_index=False)["rev"].sum()
        m = tot["rev"].max()
        w = tot[tot["rev"] == m]
        return pd.DataFrame({"k": w["k"].to_numpy(np.int64),
                             "rev": w["rev"].to_numpy(np.int64)})

    cand = (
        _read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_extendedprice", "l_discount",
                       "l_shipdate"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket_max, batch_format="pandas")
        .to_pandas()
    )
    if not len(cand) or "k" not in cand.columns:
        return empty
    mx = int(cand["rev"].max())
    winners = cand[cand["rev"] == mx]
    win_ref = ray.put(np.sort(winners["k"].to_numpy(np.int64)))

    def _names(b: pa.Table) -> pa.Table:
        cols = {"s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string())}
        if "s_suppkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        keys = _broadcast_get(win_ref)
        sk = b["s_suppkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, sk)
        idx[idx >= len(keys)] = 0
        hit = keys[idx] == sk if len(keys) else np.zeros(len(sk), bool)
        b = b.filter(pa.array(hit))
        return pa.table({"s_suppkey": pc.cast(b["s_suppkey"], pa.int64()),
                         "s_name": pc.cast(b["s_name"], pa.string())})

    names = (
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        .map_batches(_names, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .to_pandas()
    )
    if not len(names) or "s_suppkey" not in names.columns:
        return empty
    out = names.merge(
        winners.rename(columns={"k": "s_suppkey",
                                "rev": "total_revenue_cents"}),
        on="s_suppkey",
    ).sort_values("s_suppkey").reset_index(drop=True)
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_revenue_cents"] = out["total_revenue_cents"].astype("int64")
    return out[["s_suppkey", "s_name", "total_revenue_cents"]]


def q_tpch_q17_small_qty(sf_dir: str, brand: str = "Brand#23",
                         max_part_broadcast: int = 50_000_000):
    """TPC-H Q17 shape: revenue lost to small-quantity orders — lines of
    one brand's parts whose quantity is below 20% of that part's average
    order quantity.

    Scale shape: the brand predicate collapses part to a sorted partkey
    array broadcast once (fail-fast bound, q14's shape); lineitem filters
    to brand parts worker-side and ships only (partkey, qty, cents)
    triples for ~1/brand_count of lines, hash-bucketed by partkey so each
    part's complete quantity distribution lands in ONE bucket; the
    per-bucket kernel computes avg-per-part and the sub-20% sum
    vectorized, emitting one partial row per bucket. The driver folds 64
    rows. Quantities are integral in TPC-H, so the int64 qty sum divided
    by count is bit-identical to the oracle's double AVG."""
    import pandas as pd
    import ray

    from ..partition import stable_partition
    from ..util import round_half_up

    part_ds = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    if part_ds.count() > max_part_broadcast:
        raise ValueError(
            f"tpch_q17_small_qty: part table exceeds the broadcast bound "
            f"{max_part_broadcast}; route the brand filter through a "
            "co-partitioned tagged-union join (q5/q10 shape) instead"
        )
    pdf = part_ds.to_pandas()
    if "p_partkey" in pdf.columns:
        keys = np.sort(
            pdf.loc[pdf["p_brand"] == brand, "p_partkey"].to_numpy(np.int64)
        )
    else:
        keys = np.array([], dtype=np.int64)
    keys_ref = ray.put(keys)
    n_parts = 64

    def _lp(b: pa.Table) -> pa.Table:
        cols = {
            "k": pa.array([], pa.int64()),
            "qty": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        mask = pc.and_(pc.is_valid(b["l_quantity"]),
                       pc.is_valid(b["l_extendedprice"]))
        b = b.filter(mask)
        if b.num_rows == 0:
            return pa.table(cols)
        bkeys = _broadcast_get(keys_ref)
        if len(bkeys) == 0:
            return pa.table(cols)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(bkeys, pk)
        idx[idx >= len(bkeys)] = 0
        hit = bkeys[idx] == pk
        if not hit.any():
            return pa.table(cols)
        b = b.filter(pa.array(hit))
        pk = pk[hit].astype(np.int64)
        qty = np.asarray(
            b["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        cents = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(pk, pa.int64()),
                "qty": pa.array(qty, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "_part": pa.array(stable_partition(pk, n_parts), pa.int64()),
            }
        )

    def _bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"n_lines": "int64", "total_cents": "int64"}
        if not len(g) or "k" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        st = g.groupby("k")["qty"].agg(["sum", "count"])
        avg = (st["sum"].astype("float64") / st["count"]).rename("avg")
        m = g.merge(avg, left_on="k", right_index=True)
        small = m[m["qty"] < 0.2 * m["avg"]]
        return pd.DataFrame(
            {
                "n_lines": pd.Series([len(small)], dtype="int64"),
                "total_cents": pd.Series([int(small["cents"].sum())],
                                         dtype="int64"),
            }
        )

    parts = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(_lp, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    n = int(parts["n_lines"].sum()) if "n_lines" in parts.columns else 0
    tot = (
        sum(int(v) for v in parts["total_cents"])
        if len(parts) and "total_cents" in parts.columns else 0
    )
    avg_yearly = round_half_up(
        [float(int(tot)) / 700.0], 6
    )
    return pd.DataFrame(
        {
            "n_lines": pd.Series([n], dtype="int64"),
            "total_cents": pd.Series([tot], dtype="int64"),
            "avg_yearly": pd.Series(avg_yearly, dtype="float64"),
        }
    )


def q_tpch_q4_priority_returns(sf_dir: str, quarter_start: str = "1996-01-01"):
    """TPC-H Q4 shape: order-priority counts for quarter orders that have
    at least one returned line (EXISTS semi-join, vs customers_no_urgent's
    NOT-EXISTS anti-join).

    Scale shape: the lineitem side ships only per-block DISTINCT returned
    orderkeys (pre-reduced), the orders side only quarter rows; both
    hash-bucket on orderkey via the tagged-union co-partitioned plan, each
    bucket semi-joins locally and emits priority-cardinality count
    partials — the driver folds 64 x 5 rows, never order-scale data."""
    import pandas as pd

    from ..partition import stable_partition

    lo_us = int(pd.Timestamp(quarter_start).value // 1000)
    hi_us = int(
        (pd.Timestamp(quarter_start) + pd.DateOffset(months=3)).value // 1000
    )
    n_parts = 64

    def _tagged(keys, pri, side):
        keys = np.asarray(keys, dtype=np.int64)
        return pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "pri": pa.array(list(pri), pa.string()),
                "side": pa.array(np.full(len(keys), side, np.int32),
                                 pa.int32()),
                "_part": pa.array(
                    stable_partition(keys, n_parts)
                    if len(keys) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    def _l_side(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names or b.num_rows == 0:
            return _tagged([], [], 0)
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        keys = np.unique(b["l_orderkey"].to_numpy(zero_copy_only=False))
        return _tagged(keys, [""] * len(keys), 0)

    def _o_side(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names or b.num_rows == 0:
            return _tagged([], [], 1)
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows:
            dts = pc.cast(b["o_orderdate"], pa.int64())
            b = b.filter(
                pc.and_(pc.greater_equal(dts, lo_us), pc.less(dts, hi_us))
            )
        return _tagged(
            b["o_orderkey"].to_numpy(zero_copy_only=False),
            b["o_orderpriority"].to_pandas(),
            1,
        )

    def _merge(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"o_orderpriority": "object", "n_orders": "int64"}
        li = g[g["side"] == 0]
        o = g[g["side"] == 1]
        if not len(li) or not len(o):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        ret = np.unique(li["k"].to_numpy(np.int64))
        hit = o[np.isin(o["k"].to_numpy(np.int64), ret)]
        part = (
            hit.groupby("pri", as_index=False).size()
            .rename(columns={"pri": "o_orderpriority", "size": "n_orders"})
        )
        return part.astype({"n_orders": "int64"})

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"]) \
        .map_batches(_l_side, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(_o_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    parts = (
        li.union(orders).groupby("_part")
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "o_orderpriority" not in parts.columns:
        return _typed_empty(o_orderpriority=object, n_orders="int64")
    out = (
        parts.groupby("o_orderpriority", as_index=False)["n_orders"].sum()
        .sort_values("o_orderpriority").reset_index(drop=True)
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    return out[["o_orderpriority", "n_orders"]]


def q_tpch_q16_brand_suppliers(sf_dir: str,
                               max_part_broadcast: int = 50_000_000,
                               max_excl_broadcast: int = 10_000_000):
    """TPC-H Q16 shape: distinct suppliers that shipped each brand,
    excluding a supplier blocklist (negative account balance).

    Scale shape: part collapses to a broadcast sorted (partkey -> brand
    code) array and the blocklist to a broadcast sorted key array (both
    fail-fast bounded, counts checked BEFORE any collect); lineitem ships
    only per-block DISTINCT (partkey, suppkey) pairs hash-bucketed by the
    pair key, so each (brand, suppkey) combination lands in exactly one
    bucket and per-bucket distinct counts sum to the global distinct —
    the driver folds 64 x brand-cardinality count partials."""
    import pandas as pd
    import ray

    from ..partition import stable_pair_partition

    part_ds = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    if part_ds.count() > max_part_broadcast:
        raise ValueError(
            "tpch_q16_brand_suppliers: part table exceeds the broadcast "
            f"bound {max_part_broadcast}; route the brand lookup through a "
            "co-partitioned tagged-union join (q5/q10 shape) instead"
        )
    pdf = part_ds.to_pandas()
    if "p_partkey" in pdf.columns and len(pdf):
        pdf = pdf.sort_values("p_partkey")
        brands = pd.Index(sorted(pdf["p_brand"].unique()))
        bmap_ref = ray.put(
            (
                pdf["p_partkey"].to_numpy(np.int64),
                brands.get_indexer(pdf["p_brand"]).astype(np.int32),
                brands.to_numpy(object),
            )
        )
    else:
        bmap_ref = ray.put(
            (np.array([], np.int64), np.array([], np.int32),
             np.array([], object))
        )

    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])

    def _neg(b: pa.Table) -> pa.Table:
        if "s_suppkey" not in b.column_names or b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        b = b.filter(pc.less(b["s_acctbal"], 0.0))
        return pa.table({"k": pc.cast(b["s_suppkey"], pa.int64())})

    excl_ds = sup.map_batches(_neg, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=None).materialize()
    if excl_ds.count() > max_excl_broadcast:
        raise ValueError(
            "tpch_q16_brand_suppliers: supplier blocklist exceeds the "
            f"broadcast bound {max_excl_broadcast}; switch the exclusion "
            "to a co-partitioned anti-join on suppkey"
        )
    edf = excl_ds.to_pandas()
    excl = (
        np.sort(edf["k"].to_numpy(np.int64))
        if len(edf) and "k" in edf.columns else np.array([], np.int64)
    )
    excl_ref = ray.put(excl)
    n_parts = 64

    def _pairs(b: pa.Table) -> pa.Table:
        cols = {
            "bcode": pa.array([], pa.int32()),
            "sk": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        keys, codes, _ = _broadcast_get(bmap_ref)
        if len(keys) == 0:
            return pa.table(cols)
        df = pd.DataFrame(
            {
                "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
                "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        pk = df["pk"].to_numpy(np.int64)
        idx = np.searchsorted(keys, pk)
        idx[idx >= len(keys)] = 0
        hit = keys[idx] == pk
        df = df[hit]
        bcode = codes[idx[hit]]
        sk = df["sk"].to_numpy(np.int64)
        bl = _broadcast_get(excl_ref)
        if len(bl):
            j = np.searchsorted(bl, sk)
            j[j >= len(bl)] = 0
            keep = bl[j] != sk
            bcode, sk = bcode[keep], sk[keep]
        pairs = pd.DataFrame({"bcode": bcode, "sk": sk}).drop_duplicates()
        return pa.table(
            {
                "bcode": pa.array(pairs["bcode"].to_numpy(np.int32),
                                  pa.int32()),
                "sk": pa.array(pairs["sk"].to_numpy(np.int64), pa.int64()),
                "_part": pa.array(
                    stable_pair_partition(pairs["bcode"], pairs["sk"],
                                          n_parts),
                    pa.int64(),
                ),
            }
        )

    def _bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"bcode": "int32", "n": "int64"}
        if not len(g) or "bcode" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        d = g[["bcode", "sk"]].drop_duplicates()
        part = d.groupby("bcode", as_index=False).size() \
            .rename(columns={"size": "n"})
        return part.astype({"bcode": "int32", "n": "int64"})

    parts = (
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
        .map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "bcode" not in parts.columns:
        return _typed_empty(p_brand=object, n_suppliers="int64")
    _, _, brand_names = _broadcast_get(bmap_ref)
    out = parts.groupby("bcode", as_index=False)["n"].sum()
    out["p_brand"] = brand_names[out["bcode"].to_numpy(np.int64)]
    out = out.sort_values("p_brand").reset_index(drop=True)
    out["n_suppliers"] = out["n"].astype("int64")
    return out[["p_brand", "n_suppliers"]]


def q_orders_increasing_pairs(sf_dir: str):
    """Per-customer consecutive-order momentum: of each customer's orders
    sorted by (date, orderkey), how many adjacent pairs strictly increased
    in total price — the LAG-shape sequence operator on the orders table
    (events already cover user paths / transitions).

    Scale shape: the sessionize bucketing — customers hash-bucket (64) via
    stable_partition so a customer's full order history lands in ONE
    task; the per-bucket kernel is one vectorized sort + shift compare;
    only (custkey-bucket) count partials reach the driver (64 rows)."""
    import pandas as pd

    from ..partition import stable_partition

    n_parts = 64

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "ck": pa.array([], pa.int64()),
            "dt": pa.array([], pa.int64()),
            "ok": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "o_custkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["o_orderdate"]),
                             pc.is_valid(b["o_totalprice"])))
        if b.num_rows == 0:
            return pa.table(cols)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ck": pa.array(ck, pa.int64()),
                "dt": pc.cast(b["o_orderdate"], pa.int64()),
                "ok": pc.cast(b["o_orderkey"], pa.int64()),
                "cents": _cents(b["o_totalprice"]),
                "_part": pa.array(stable_partition(ck, n_parts), pa.int64()),
            }
        )

    def _bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"n_customers": "int64", "n_pairs": "int64",
                    "n_increasing": "int64"}
        if not len(g) or "ck" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        g = g.sort_values(["ck", "dt", "ok"], kind="mergesort")
        same = g["ck"].to_numpy()[1:] == g["ck"].to_numpy()[:-1]
        cents = g["cents"].to_numpy(np.int64)
        inc = cents[1:] > cents[:-1]
        return pd.DataFrame(
            {
                "n_customers": pd.Series([g["ck"].nunique()], dtype="int64"),
                "n_pairs": pd.Series([int(same.sum())], dtype="int64"),
                "n_increasing": pd.Series([int((same & inc).sum())],
                                          dtype="int64"),
            }
        )

    parts = (
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_orderdate",
                       "o_totalprice"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "n_pairs" not in parts.columns:
        return pd.DataFrame(
            {
                "n_customers": pd.Series([0], dtype="int64"),
                "n_pairs": pd.Series([0], dtype="int64"),
                "n_increasing": pd.Series([0], dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "n_customers": pd.Series([int(parts["n_customers"].sum())],
                                     dtype="int64"),
            "n_pairs": pd.Series([int(parts["n_pairs"].sum())],
                                 dtype="int64"),
            "n_increasing": pd.Series([int(parts["n_increasing"].sum())],
                                      dtype="int64"),
        }
    )


def q_part_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape (adapted to this schema): for every part, the
    supplier offering the minimum effective unit price over its shipped
    lines — a distributed argmin-per-key with a deterministic tie-break
    (min unit-price cents, then min suppkey), reported per brand.

    Scale shape: unit price collapses to integer cents per line inside
    the batch fn; lines pre-reduce per (partkey, suppkey) to the local
    min BEFORE the shuffle, then partkey-hash buckets co-locate each
    part's candidates so the per-bucket argmin is global. Only the
    (brand, winner) count partials reach the driver. Brand lookup rides
    the q14/q17 broadcast sorted-array convention."""
    import pandas as pd
    import ray

    from ..partition import stable_partition

    part_ds = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    if part_ds.count() > 50_000_000:
        raise ValueError(
            "part_min_cost_supplier: part table exceeds the broadcast "
            "bound; route the brand lookup through a co-partitioned "
            "tagged-union join (q5/q10 shape) instead"
        )
    pdf = part_ds.to_pandas()
    if "p_partkey" in pdf.columns and len(pdf):
        pdf = pdf.sort_values("p_partkey")
        brands = pd.Index(sorted(pdf["p_brand"].unique()))
        bmap_ref = ray.put(
            (
                pdf["p_partkey"].to_numpy(np.int64),
                brands.get_indexer(pdf["p_brand"]).astype(np.int32),
                brands.to_numpy(object),
            )
        )
    else:
        bmap_ref = ray.put(
            (np.array([], np.int64), np.array([], np.int32),
             np.array([], object))
        )
    n_parts = 64

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "pk": pa.array([], pa.int64()),
            "sk": pa.array([], pa.int64()),
            "unit_cents": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["l_extendedprice"]),
                             pc.greater(b["l_quantity"], 0.0)))
        if b.num_rows == 0:
            return pa.table(cols)
        unit = _cents(pc.divide(b["l_extendedprice"], b["l_quantity"]))
        g = (
            pd.DataFrame(
                {
                    "pk": b["l_partkey"].to_numpy(zero_copy_only=False),
                    "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
                    "unit_cents": unit.to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["pk", "sk"], as_index=False)["unit_cents"].min()
        )
        pk = g["pk"].to_numpy(np.int64)
        return pa.table(
            {
                "pk": pa.array(pk, pa.int64()),
                "sk": pa.array(g["sk"].to_numpy(np.int64), pa.int64()),
                "unit_cents": pa.array(g["unit_cents"].to_numpy(np.int64),
                                       pa.int64()),
                "_part": pa.array(stable_partition(pk, n_parts), pa.int64()),
            }
        )

    def _bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"bcode": "int32", "n_parts": "int64",
                    "sum_min_unit_cents": "int64",
                    "sum_winner_suppkey": "int64"}
        if not len(g) or "pk" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        # candidates from many blocks: global per-(pk, sk) min first, then
        # the per-pk argmin with the (cents, sk) tie-break
        g = g.groupby(["pk", "sk"], as_index=False)["unit_cents"].min()
        w = g.sort_values(["pk", "unit_cents", "sk"],
                          kind="mergesort").drop_duplicates("pk")
        keys, codes, _ = _broadcast_get(bmap_ref)
        pk = w["pk"].to_numpy(np.int64)
        if len(keys) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        idx = np.searchsorted(keys, pk)
        idx[idx >= len(keys)] = 0
        hit = keys[idx] == pk
        w = w[hit]
        part = (
            pd.DataFrame(
                {
                    "bcode": codes[idx[hit]],
                    "sum_min_unit_cents": w["unit_cents"].to_numpy(np.int64),
                    "sum_winner_suppkey": w["sk"].to_numpy(np.int64),
                }
            )
            .groupby("bcode", as_index=False)
            .agg(
                n_parts=("sum_min_unit_cents", "size"),
                sum_min_unit_cents=("sum_min_unit_cents", "sum"),
                sum_winner_suppkey=("sum_winner_suppkey", "sum"),
            )
        )
        return part.astype(out_cols)

    parts = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_extendedprice",
                       "l_quantity"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "bcode" not in parts.columns:
        return _typed_empty(p_brand=object, n_parts="int64",
                            sum_min_unit_cents="int64",
                            sum_winner_suppkey="int64")
    _, _, brand_names = _broadcast_get(bmap_ref)
    out = parts.groupby("bcode", as_index=False)[
        ["n_parts", "sum_min_unit_cents", "sum_winner_suppkey"]
    ].sum()
    out["p_brand"] = brand_names[out["bcode"].to_numpy(np.int64)]
    out = out.sort_values("p_brand").reset_index(drop=True)
    for c in ("n_parts", "sum_min_unit_cents", "sum_winner_suppkey"):
        out[c] = out[c].astype("int64")
    return out[["p_brand", "n_parts", "sum_min_unit_cents",
                "sum_winner_suppkey"]]


def q_events_gap_fill(sf_dir: str, as_dataset: bool = False):
    """Dense hourly value series per event type with LINEAR INTERPOLATION
    over missing hours — the time-series gap-fill / imputation operator
    (events_daily_dense densifies with zeros; this reconstructs).

    Float parity: per-(type, hour) sums are exact integer cents; an
    interpolated hour is pc + (nc-pc)*(h-ph)/(nh-ph) where every term but
    the final divide/add is exact int64, so both sides execute the SAME
    two IEEE ops; the result rounds half-away-from-zero at 6dp
    (ratio-of-ints rule).

    Scale shape: blocks pre-aggregate (type, hour, cents) so only
    hour-cardinality partials shuffle; type-hash buckets co-locate a
    type's full series and the per-bucket kernel is one vectorized
    forward/backward position fill (np.maximum.accumulate) per type —
    never a Python loop over hours. Output is types x hours rows; pass
    ``as_dataset=True`` to keep it distributed."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    n_parts = 64

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "hr": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "ts" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["ts"]), pc.is_valid(b["value"])))
        if b.num_rows == 0:
            return pa.table(cols)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hr = np.floor(us.astype(np.float64) / 3_600_000_000).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "event_type": b["event_type"].to_pandas(),
                    "hr": hr,
                    "cents": _cents(b["value"]).to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby(["event_type", "hr"], as_index=False)["cents"].sum()
        )
        g["_part"] = stable_partition(g["event_type"], n_parts)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _fill(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {
            "event_type": "object", "hr": "int64", "is_filled": "int64",
            "filled_cents": "float64",
        }
        if not len(g) or "event_type" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        tot = g.groupby(["event_type", "hr"], as_index=False)["cents"].sum()
        frames = []
        for et, grp in tot.groupby("event_type"):
            grp = grp.sort_values("hr")
            lo, hi = int(grp["hr"].iloc[0]), int(grp["hr"].iloc[-1])
            n = hi - lo + 1
            dense = np.arange(lo, hi + 1, dtype=np.int64)
            cents = np.zeros(n, np.int64)
            present = np.zeros(n, bool)
            pos = grp["hr"].to_numpy(np.int64) - lo
            present[pos] = True
            cents[pos] = grp["cents"].to_numpy(np.int64)
            idx = np.arange(n)
            ppos = np.maximum.accumulate(np.where(present, idx, -1))
            npos = n - 1 - np.maximum.accumulate(
                np.where(present[::-1], idx, -1)
            )[::-1]
            pc_, ph = cents[ppos], dense[ppos]
            nc, nh = cents[npos], dense[npos]
            filled = np.where(
                present,
                cents.astype(np.float64),
                pc_.astype(np.float64)
                + np.where(
                    nh > ph, (nc - pc_) * (dense - ph), 0
                ).astype(np.float64)
                / np.maximum(nh - ph, 1).astype(np.float64),
            )
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": et,
                        "hr": dense,
                        "is_filled": (~present).astype(np.int64),
                        "filled_cents": round_half_up(filled, 6),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({c: pd.Series([], dtype=t)
                          for c, t in out_cols.items()})

    ds = (
        _read(sf_dir, "events", columns=["ts", "event_type", "value"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_fill, batch_format="pandas")
    )
    if as_dataset:
        return ds
    out = ds.to_pandas()
    if not len(out) or "event_type" not in out.columns:
        return _typed_empty(event_type=object, hr="int64",
                            is_filled="int64", filled_cents="float64")
    out = out.sort_values(["event_type", "hr"]).reset_index(drop=True)
    out["hr"] = out["hr"].astype("int64")
    out["is_filled"] = out["is_filled"].astype("int64")
    return out[["event_type", "hr", "is_filled", "filled_cents"]]


def q_cohort_week_matrix(sf_dir: str, max_offset: int = 4):
    """Full cohort retention MATRIX: users grouped by first active week,
    distinct actives per (cohort week, week offset 0..max_offset) — the
    triangle chart behind user_retention's two fixed points.

    Scale shape: identical to user_retention — distinct (user, week)
    pre-reduce, user-hash buckets hold each user's whole activity, one
    vectorized min-transform per bucket, only (cohort, offset, n) count
    partials reach the driver (a user counts once per (cohort, offset) by
    the distinct pre-reduce, and lives in one bucket, so partial sums are
    exact)."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def _weeks(b: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "week": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "ts" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        wk = np.floor(us.astype(np.float64) / 604_800_000_000) \
            .astype(np.int64)
        df = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(zero_copy_only=False),
             "week": wk}
        ).drop_duplicates()
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _matrix(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"cohort": "int64", "wk_offset": "int64",
                    "n_users": "int64"}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        g = g[["user_id", "week"]].drop_duplicates()
        first = g.groupby("user_id")["week"].transform("min")
        off = g["week"] - first
        keep = off <= max_offset
        part = (
            pd.DataFrame({"cohort": first[keep], "wk_offset": off[keep]})
            .groupby(["cohort", "wk_offset"], as_index=False)
            .size().rename(columns={"size": "n_users"})
        )
        return part.astype(out_cols)

    parts = (
        ev.map_batches(_weeks, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_matrix, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "cohort" not in parts.columns:
        return _typed_empty(cohort="int64", wk_offset="int64",
                            n_users="int64")
    out = parts.groupby(["cohort", "wk_offset"], as_index=False)[
        "n_users"
    ].sum().sort_values(["cohort", "wk_offset"]).reset_index(drop=True)
    for c in ("cohort", "wk_offset", "n_users"):
        out[c] = out[c].astype("int64")
    return out[["cohort", "wk_offset", "n_users"]]


def q_conversion_delay_p50(sf_dir: str, max_fold_rows: int = 2_000_000):
    """Median time-to-convert: minutes between a user's FIRST view and
    their first purchase at-or-after it, nearest-rank p50 over all
    converting users (the latency companion to conversion_attribution).

    Scale shape: user-hash buckets compute each user's (first view, first
    subsequent purchase) with two vectorized groupby-mins; delays collapse
    to a (minute -> count) histogram INSIDE the bucket, so the driver
    folds histogram rows bounded by the time range (not the user count),
    count()-guarded before the collect; p50 is one cumsum walk."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def _pairs(b: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "ts_us": pa.array([], pa.int64()),
            "is_view": pa.array([], pa.int8()),
            "_part": pa.array([], pa.int64()),
        }
        if "ts" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(
            pc.and_(
                pc.is_valid(b["ts"]),
                pc.or_(pc.equal(b["event_type"], "view"),
                       pc.equal(b["event_type"], "purchase")),
            )
        )
        if b.num_rows == 0:
            return pa.table(cols)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "is_view": pc.cast(
                    pc.equal(b["event_type"], "view"), pa.int8()
                ),
                "_part": pa.array(stable_partition(uid, 64), pa.int64()),
            }
        )

    def _hist(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"delay_min": "int64", "n": "int64"}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        v = g[g["is_view"] == 1].groupby("user_id")["ts_us"].min()
        p = g[g["is_view"] == 0]
        p = p.merge(v.rename("t0"), left_on="user_id", right_index=True)
        p = p[p["ts_us"] >= p["t0"]]
        if not len(p):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        t1 = p.groupby("user_id", as_index=False).agg(
            t1=("ts_us", "min"), t0=("t0", "first")
        )
        m = np.floor(
            (t1["t1"] - t1["t0"]).to_numpy(np.int64).astype(np.float64)
            / 60_000_000
        ).astype(np.int64)
        part = (
            pd.DataFrame({"delay_min": m}).groupby("delay_min",
                                                   as_index=False)
            .size().rename(columns={"size": "n"})
        )
        return part.astype(out_cols)

    hist_ds = (
        ev.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_hist, batch_format="pandas")
        .materialize()
    )
    if hist_ds.count() > max_fold_rows:
        raise ValueError(
            "conversion_delay_p50: histogram exceeds the driver fold "
            f"bound {max_fold_rows}; coarsen the delay unit"
        )
    hist = hist_ds.to_pandas()
    if not len(hist) or "delay_min" not in hist.columns:
        return _typed_empty(n_conversions="int64", p50_delay_min="int64")
    hist = hist.groupby("delay_min", as_index=False)["n"].sum() \
        .sort_values("delay_min")
    cum = hist["n"].cumsum().to_numpy(np.int64)
    n = int(cum[-1])
    rank = max(1, (50 * n) // 100)
    p50 = int(hist["delay_min"].to_numpy(np.int64)[
        np.searchsorted(cum, rank, side="left")
    ])
    return pd.DataFrame(
        {"n_conversions": pd.Series([n], dtype="int64"),
         "p50_delay_min": pd.Series([p50], dtype="int64")}
    )


def q_users_all_types(sf_dir: str):
    """Set-intersection analytics: how many users were active in EVERY
    event type (the all-segments overlap; funnel_steps counts ordered
    progressions, this counts unordered full coverage).

    Scale shape: distinct (user, type) pairs pre-reduce per block, user-
    hash buckets hold each user's full type set, and each bucket emits a
    (types-per-user -> n_users) histogram partial (rows bounded by the
    type cardinality, not the user count). The global type count comes
    from the same materialized pair Dataset (one extra distinct-types
    scan over pre-reduced pairs), so the driver folds two tiny tables."""
    import pandas as pd

    from ..partition import stable_partition

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def _pairs(b: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "_part": pa.array([], pa.int64()),
        }
        if "user_id" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(zero_copy_only=False),
                "event_type": b["event_type"].to_pandas(),
            }
        ).drop_duplicates()
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ev.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=None).materialize()

    def _types(b: pa.Table) -> pa.Table:
        if "event_type" not in b.column_names or b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string())})
        return pa.table(
            {"event_type": pa.array(
                pd.unique(b["event_type"].to_pandas()), pa.string())}
        )

    tdf = pairs.map_batches(_types, batch_format="pyarrow",
                            zero_copy_batch=True,
                            batch_size=None).to_pandas()
    k = int(tdf["event_type"].nunique()) if len(tdf) and \
        "event_type" in tdf.columns else 0

    def _hist(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"n_types": "int64", "n_users": "int64"}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        per_user = g[["user_id", "event_type"]].drop_duplicates() \
            .groupby("user_id").size()
        part = per_user.value_counts().rename_axis("n_types") \
            .reset_index(name="n_users")
        return part.astype(out_cols)

    hist = (
        pairs.groupby("_part").map_groups(_hist, batch_format="pandas")
        .to_pandas()
    )
    n_all = (
        int(hist.loc[hist["n_types"] == k, "n_users"].sum())
        if len(hist) and "n_types" in hist.columns and k > 0 else 0
    )
    return pd.DataFrame(
        {"n_users_all_types": pd.Series([n_all], dtype="int64"),
         "n_types": pd.Series([k], dtype="int64")}
    )


def q_slowlog_apdex(sf_dir: str, threshold: float = 4.0):
    """Per-class Apdex score over the REAL slow-log pipeline (parse ->
    fingerprint -> class): satisfied = query_time <= T, tolerating =
    T < query_time <= 4T, apdex = (satisfied + tolerating/2) / n — the
    SRE satisfaction metric the reference's report tables feed.

    Exactness: per-class (n, sat, tol) are integer partials folded on the
    driver; apdex is the ratio (2*sat + tol) / (2*n) rounded half-up at
    6dp (ratio-of-integers rule)."""
    import pandas as pd

    from ..util import round_half_up

    events = _flat_events(sf_dir)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "class_id": pa.array([], pa.string()),
            "n_queries": pa.array([], pa.int64()),
            "n_satisfied": pa.array([], pa.int64()),
            "n_tolerating": pa.array([], pa.int64()),
        }
        if "class_id" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        qt = b["query_time"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "class_id": b["class_id"].to_pandas(),
                "sat": (qt <= threshold).astype(np.int64),
                "tol": ((qt > threshold)
                        & (qt <= 4 * threshold)).astype(np.int64),
            }
        )
        g = df.groupby("class_id", as_index=False).agg(
            n_queries=("sat", "size"), n_satisfied=("sat", "sum"),
            n_tolerating=("tol", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = events.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()
    if not len(parts) or "class_id" not in parts.columns:
        return _typed_empty(class_id=object, n_queries="int64",
                            n_satisfied="int64", n_tolerating="int64",
                            apdex="float64")
    out = parts.groupby("class_id", as_index=False)[
        ["n_queries", "n_satisfied", "n_tolerating"]
    ].sum()
    apdex = [
        float(2 * int(s) + int(t)) / float(2 * int(n))
        for s, t, n in zip(out["n_satisfied"], out["n_tolerating"],
                           out["n_queries"])
    ]
    out["apdex"] = round_half_up(apdex, 6)
    for c in ("n_queries", "n_satisfied", "n_tolerating"):
        out[c] = out[c].astype("int64")
    return out.sort_values("class_id").reset_index(drop=True)[
        ["class_id", "n_queries", "n_satisfied", "n_tolerating", "apdex"]
    ]


def q_embed_dim_moments(sf_dir: str):
    """Feature standardization stats: per embedding dimension, exact
    integer first/second moments (the mean/variance inputs of a vector
    normalization stage).

    Exactness: each float32 component quantizes ONCE to 1e-6 units (a
    widening f32->f64 cast is exact on both sides, so the quantization is
    bit-identical), after which every sum is int64 — no float summation
    order anywhere. Scale shape: each block folds its vectors to one
    64-row (dim, n, sum, sumsq) partial (vectors never shuffle, never
    collect); the driver folds blocks x 64 rows."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "dim": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sum_units": pa.array([], pa.int64()),
            "sumsq_units": pa.array([], pa.int64()),
        }
        if "embedding" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // b.num_rows
        x = flat.astype(np.float64).reshape(b.num_rows, d)
        xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64),
                                pa.int64()),
                "n": pa.array(np.full(d, b.num_rows, np.int64), pa.int64()),
                "sum_units": pa.array(xq.sum(axis=0), pa.int64()),
                "sumsq_units": pa.array((xq * xq).sum(axis=0), pa.int64()),
            }
        )

    parts = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()
    if not len(parts) or "dim" not in parts.columns:
        return _typed_empty(dim="int64", n="int64", sum_units="int64",
                            sumsq_units="int64")
    out = parts.groupby("dim", as_index=False)[
        ["n", "sum_units", "sumsq_units"]
    ].sum().sort_values("dim").reset_index(drop=True)
    for c in ("dim", "n", "sum_units", "sumsq_units"):
        out[c] = out[c].astype("int64")
    return out[["dim", "n", "sum_units", "sumsq_units"]]


def _staged_dir(sf_dir: str, tag: str) -> str:
    """Deterministic per-(sf_dir, tag) staging dir under /tmp."""
    import hashlib

    key = hashlib.md5(
        (os.path.realpath(sf_dir) + ":" + tag).encode()
    ).hexdigest()[:16]
    return os.path.join("/tmp", f"mlpr_stage_{tag}_{key}")


def q_events_csv_source(sf_dir: str):
    """CSV source/sink round-trip surface: events export to CSV shards
    (Dataset.write_csv — the CSV SINK), read back with ray.data.read_csv
    (the CSV SOURCE), and integrity-fold per type. Columns restricted to
    ints + strings so the text round-trip is lossless by construction.

    Staging is write-once-then-rename (the incremental-ingest atomicity
    convention) keyed on the input's realpath, so reruns reuse the
    shards; the fold is the standard per-block partial -> driver sum."""
    import shutil

    import pandas as pd
    import ray.data as rd

    src = _read(sf_dir, "events",
                columns=["event_id", "user_id", "event_type"])
    if src.count() == 0:  # an empty write leaves no shards to read back
        return _typed_empty(event_type=object, n_rows="int64",
                            sum_event_id="int64")
    dest = _staged_dir(sf_dir, "csv")
    if not os.path.isdir(dest):
        tmp = dest + ".part"
        shutil.rmtree(tmp, ignore_errors=True)
        src.write_csv(tmp)
        try:
            os.rename(tmp, dest)
        except OSError:  # lost the race to a concurrent writer: reuse
            shutil.rmtree(tmp, ignore_errors=True)
    ds = rd.read_csv(dest)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "sum_event_id": pa.array([], pa.int64()),
        }
        if "event_type" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        g = (
            pd.DataFrame(
                {
                    "event_type": b["event_type"].to_pandas(),
                    "sum_event_id": b["event_id"].to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby("event_type", as_index=False)
            .agg(n_rows=("sum_event_id", "size"),
                 sum_event_id=("sum_event_id", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    if not len(parts) or "event_type" not in parts.columns:
        return _typed_empty(event_type=object, n_rows="int64",
                            sum_event_id="int64")
    out = parts.groupby("event_type", as_index=False)[
        ["n_rows", "sum_event_id"]
    ].sum().sort_values("event_type").reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["sum_event_id"] = out["sum_event_id"].astype("int64")
    return out[["event_type", "n_rows", "sum_event_id"]]


def q_events_partitioned_sink(sf_dir: str):
    """Hive-partitioned parquet SINK round-trip: events written with
    write_parquet(partition_cols=["event_type"]) — the resumable layout
    the 100-TB pipelines shard output by — then read back (partition
    column reconstructed from the directory keys) and integrity-folded.

    Staging is write-once-then-rename keyed on the input realpath."""
    import shutil

    import pandas as pd
    import ray.data as rd

    src = _read(sf_dir, "events",
                columns=["event_id", "user_id", "event_type"])
    if src.count() == 0:  # an empty write leaves no shards to read back
        return _typed_empty(event_type=object, n_rows="int64",
                            sum_user_id="int64")
    dest = _staged_dir(sf_dir, "hive")
    if not os.path.isdir(dest):
        tmp = dest + ".part"
        shutil.rmtree(tmp, ignore_errors=True)
        src.write_parquet(tmp, partition_cols=["event_type"])
        try:
            os.rename(tmp, dest)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    ds = rd.read_parquet(dest)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "sum_user_id": pa.array([], pa.int64()),
        }
        if "event_type" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        g = (
            pd.DataFrame(
                {
                    # hive partition values read back as dictionary/
                    # categorical: normalize to plain strings
                    "event_type": b["event_type"].to_pandas().astype(str),
                    "sum_user_id": b["user_id"].to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby("event_type", as_index=False)
            .agg(n_rows=("sum_user_id", "size"),
                 sum_user_id=("sum_user_id", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    if not len(parts) or "event_type" not in parts.columns:
        return _typed_empty(event_type=object, n_rows="int64",
                            sum_user_id="int64")
    out = parts.groupby("event_type", as_index=False)[
        ["n_rows", "sum_user_id"]
    ].sum().sort_values("event_type").reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["sum_user_id"] = out["sum_user_id"].astype("int64")
    return out[["event_type", "n_rows", "sum_user_id"]]


def q_tpch_q13_custdist(sf_dir: str):
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including customers with zero orders (custdist histogram).

    Scale shape: orders pre-reduce to (custkey, n) partials inside each
    batch fn, hash-bucket by custkey (a customer lives in exactly ONE
    bucket so per-bucket sums are complete), and each bucket emits its
    count-of-counts histogram plus its distinct-customer tally — only
    |buckets| x |distinct counts| tiny rows reach the driver.  The zero
    bucket is arithmetic: customer.count() minus customers seen in
    orders.  No join, no customer-table shuffle.  Mirrors TPC-H Q13
    (left join + count + count-of-counts) without the o_comment filter
    (testdata orders carry no comment column)."""
    import pandas as pd

    from ..partition import stable_partition

    n_parts = 64

    def _o(b: pa.Table) -> pa.Table:
        cols = {
            "k": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "o_custkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        g = (
            pd.DataFrame({"k": b["o_custkey"].to_numpy(zero_copy_only=False)})
            .groupby("k", as_index=False).size()
        )
        k = g["k"].to_numpy(np.int64)
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
                "_part": pa.array(stable_partition(k, n_parts), pa.int64()),
            }
        )

    def _bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"c_count": "int64", "custdist": "int64"}
        if not len(g) or "k" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        tot = g.groupby("k")["n"].sum()
        h = tot.value_counts()
        return pd.DataFrame(
            {
                "c_count": h.index.to_numpy(np.int64),
                "custdist": h.to_numpy(np.int64),
            }
        )

    parts = (
        _read(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(_o, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    n_customers = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    if not len(parts) or "c_count" not in parts.columns:
        out = pd.DataFrame({"c_count": pd.Series([0], dtype="int64"),
                            "custdist": pd.Series([n_customers],
                                                  dtype="int64")})
        return out if n_customers else _typed_empty(c_count="int64",
                                                    custdist="int64")
    out = parts.groupby("c_count", as_index=False)["custdist"].sum()
    n_with_orders = int(out["custdist"].sum())
    n_zero = int(n_customers) - n_with_orders
    if n_zero > 0:
        out = pd.concat(
            [out, pd.DataFrame({"c_count": [0], "custdist": [n_zero]})],
            ignore_index=True,
        )
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return out.sort_values("c_count").reset_index(drop=True)


def q_tpch_q19_discount(sf_dir: str, max_part_broadcast: int = 50_000_000):
    """TPC-H Q19 shape: revenue from lines matching any of three
    brand/size/quantity disjuncts (adapted: testdata part has no
    p_container, so the container predicate is dropped).

    Scale shape: part collapses to three sorted per-disjunct partkey
    arrays broadcast once (fail-fast bound, q17's shape); lineitem
    evaluates the OR of three (membership AND quantity-band) predicates
    vectorized per block and emits ONE (n_lines, revenue_cents) partial
    row per block — integer cents, overflow-proof driver fold.  No
    shuffle at all."""
    import pandas as pd
    import ray

    disjuncts = [
        ("Brand#12", 1, 5, 1.0, 11.0),
        ("Brand#23", 1, 10, 10.0, 20.0),
        ("Brand#34", 1, 15, 20.0, 30.0),
    ]
    part_ds = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    if part_ds.count() > max_part_broadcast:
        raise ValueError(
            "tpch_q19_discount: part table exceeds the broadcast bound "
            f"{max_part_broadcast}; route the brand/size filter through a "
            "co-partitioned tagged-union join (q5/q10 shape) instead"
        )
    pdf = part_ds.to_pandas()
    key_sets = []
    for brand, lo_sz, hi_sz, _, _ in disjuncts:
        if "p_partkey" in pdf.columns:
            sel = (
                (pdf["p_brand"] == brand)
                & (pdf["p_size"] >= lo_sz)
                & (pdf["p_size"] <= hi_sz)
            )
            key_sets.append(np.sort(pdf.loc[sel, "p_partkey"].to_numpy(np.int64)))
        else:
            key_sets.append(np.array([], dtype=np.int64))
    keys_ref = ray.put(key_sets)

    def _member(keys: np.ndarray, pk: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(len(pk), bool)
        idx = np.searchsorted(keys, pk)
        idx[idx >= len(keys)] = 0
        return keys[idx] == pk

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "n_lines": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
        }
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        mask = pc.and_(pc.is_valid(b["l_quantity"]),
                       pc.is_valid(b["l_extendedprice"]))
        b = b.filter(pc.and_(mask, pc.is_valid(b["l_discount"])))
        if b.num_rows == 0:
            return pa.table(cols)
        sets = _broadcast_get(keys_ref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(pk), bool)
        for keys, (_, _, _, lo_q, hi_q) in zip(sets, disjuncts):
            keep |= _member(keys, pk) & (qty >= lo_q) & (qty <= hi_q)
        if not keep.any():
            return pa.table(cols)
        b = b.filter(pa.array(keep))
        cents = _cents(
            pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        )
        return pa.table(
            {
                "n_lines": pa.array([b.num_rows], pa.int64()),
                "revenue_cents": pa.array([int(pc.sum(cents).as_py())],
                                          pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity", "l_extendedprice",
                       "l_discount"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .to_pandas()
    )
    n = int(parts["n_lines"].sum()) if "n_lines" in parts.columns else 0
    rev = (
        sum(int(v) for v in parts["revenue_cents"])
        if len(parts) and "revenue_cents" in parts.columns else 0
    )
    return pd.DataFrame({"n_lines": pd.Series([n], dtype="int64"),
                         "revenue_cents": pd.Series([rev], dtype="int64")})


def q_tpch_q21_waiting(sf_dir: str, late_days: int = 60):
    """TPC-H Q21 shape: suppliers who kept finished multi-supplier orders
    waiting — the supplier is the ONLY one in the order whose lines
    shipped late (adapted: testdata lineitem has no receipt/commit
    dates, so "late" is l_shipdate > o_orderdate + late_days).

    Scale shape: a co-partitioned tagged-union join on orderkey (the
    q5/q10 plan) — lineitem pre-reduces to (orderkey, suppkey,
    max_ship_us) partials inside the batch fn, orders ship only 'F'
    (orderkey, orderdate_us) rows, both sides land in ONE
    stable_partition groupby, and the per-bucket pandas kernel finds
    orders with >=2 suppliers and exactly one late one, emitting
    supplier-cardinality (suppkey, numwait) partials.  The driver folds
    <=64 x |suppliers| rows; winner names come from a pruned supplier
    scan against the broadcast winner set (q15's shape) — the supplier
    table never collects."""
    import pandas as pd
    import ray

    from ..partition import stable_partition

    n_parts = 64
    late_us = late_days * 86_400_000_000
    empty = _typed_empty(s_suppkey="int64", s_name=object, numwait="int64")

    def _aligned(key, sk, ship_us, odate_us, side):
        key = np.asarray(key, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "sk": pa.array(np.asarray(sk, dtype=np.int64), pa.int64()),
                "ship_us": pa.array(np.asarray(ship_us, dtype=np.int64),
                                    pa.int64()),
                "odate_us": pa.array(np.asarray(odate_us, dtype=np.int64),
                                     pa.int64()),
                "side": pa.array(np.full(len(key), side, np.int32),
                                 pa.int32()),
                "_part": pa.array(
                    stable_partition(key, n_parts)
                    if len(key) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    def _o_side(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names or b.num_rows == 0:
            return _aligned([], [], [], [], 0)
        b = b.filter(pc.equal(b["o_orderstatus"], "F"))
        if b.num_rows == 0:
            return _aligned([], [], [], [], 0)
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        od = pc.cast(b["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        z = np.zeros(len(ok), np.int64)
        return _aligned(ok, z, z, od, 0)

    def _l_side(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names or b.num_rows == 0:
            return _aligned([], [], [], [], 1)
        g = (
            pd.DataFrame(
                {
                    "key": b["l_orderkey"].to_numpy(zero_copy_only=False),
                    "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
                    "ship": pc.cast(b["l_shipdate"], pa.int64()).to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby(["key", "sk"], as_index=False)["ship"].max()
        )
        z = np.zeros(len(g), np.int64)
        return _aligned(g["key"], g["sk"], g["ship"], z, 1)

    def _bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"sk": "int64", "numwait": "int64"}
        if not len(g) or "side" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        o = g[g["side"] == 0]
        li = g[g["side"] == 1]
        if not len(o) or not len(li):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        per = li.groupby(["key", "sk"], as_index=False)["ship_us"].max()
        m = per.merge(o[["key", "odate_us"]], on="key", how="inner")
        if not len(m):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        m["late"] = m["ship_us"] > (m["odate_us"] + late_us)
        per_o = m.groupby("key").agg(
            n_supp=("sk", "size"), n_late=("late", "sum")
        )
        qual = per_o[(per_o["n_supp"] >= 2) & (per_o["n_late"] == 1)].index
        w = m[m["key"].isin(qual) & m["late"]]
        cnt = w.groupby("sk", as_index=False).size()
        return pd.DataFrame(
            {"sk": cnt["sk"].to_numpy(np.int64),
             "numwait": cnt["size"].to_numpy(np.int64)}
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_orderdate"]
    ).map_batches(_o_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(_l_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    parts = (
        orders.union(li).groupby("_part")
        .map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "sk" not in parts.columns:
        return empty
    wait = parts.groupby("sk", as_index=False)["numwait"].sum()
    win_ref = ray.put(np.sort(wait["sk"].to_numpy(np.int64)))

    def _names(b: pa.Table) -> pa.Table:
        cols = {"s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string())}
        if "s_suppkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        keys = _broadcast_get(win_ref)
        skv = b["s_suppkey"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table(cols)
        idx = np.searchsorted(keys, skv)
        idx[idx >= len(keys)] = 0
        hit = keys[idx] == skv
        b = b.filter(pa.array(hit))
        return pa.table({"s_suppkey": pc.cast(b["s_suppkey"], pa.int64()),
                         "s_name": pc.cast(b["s_name"], pa.string())})

    names = (
        _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
        .map_batches(_names, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .to_pandas()
    )
    if not len(names) or "s_suppkey" not in names.columns:
        return empty
    out = names.merge(
        wait.rename(columns={"sk": "s_suppkey"}), on="s_suppkey"
    ).sort_values("s_suppkey").reset_index(drop=True)
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["numwait"] = out["numwait"].astype("int64")
    return out[["s_suppkey", "s_name", "numwait"]]


def q_events_json_source(sf_dir: str):
    """JSONL source/sink round-trip surface: events export to JSON-lines
    shards (Dataset.write_json — the JSON SINK), read back with
    ray.data.read_json (the JSON SOURCE), and integrity-fold per type.
    Columns restricted to ints + strings so the text round-trip is
    lossless by construction.

    Staging is write-once-then-rename (the incremental-ingest atomicity
    convention) keyed on the input's realpath, so reruns reuse the
    shards; the fold is the standard per-block partial -> driver sum."""
    import shutil

    import pandas as pd
    import ray.data as rd

    src = _read(sf_dir, "events",
                columns=["event_id", "user_id", "event_type"])
    if src.count() == 0:  # an empty write leaves no shards to read back
        return _typed_empty(event_type=object, n_rows="int64",
                            sum_event_id="int64", sum_user_id="int64")
    dest = _staged_dir(sf_dir, "jsonl")
    if not os.path.isdir(dest):
        tmp = dest + ".part"
        shutil.rmtree(tmp, ignore_errors=True)
        src.write_json(tmp)
        try:
            os.rename(tmp, dest)
        except OSError:  # lost the race to a concurrent writer: reuse
            shutil.rmtree(tmp, ignore_errors=True)
    ds = rd.read_json(dest)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "sum_event_id": pa.array([], pa.int64()),
            "sum_user_id": pa.array([], pa.int64()),
        }
        if "event_type" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        g = (
            pd.DataFrame(
                {
                    "event_type": b["event_type"].to_pandas(),
                    "sum_event_id": b["event_id"].to_numpy(
                        zero_copy_only=False
                    ),
                    "sum_user_id": b["user_id"].to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .groupby("event_type", as_index=False)
            .agg(n_rows=("sum_event_id", "size"),
                 sum_event_id=("sum_event_id", "sum"),
                 sum_user_id=("sum_user_id", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    if not len(parts) or "event_type" not in parts.columns:
        return _typed_empty(event_type=object, n_rows="int64",
                            sum_event_id="int64", sum_user_id="int64")
    out = parts.groupby("event_type", as_index=False)[
        ["n_rows", "sum_event_id", "sum_user_id"]
    ].sum().sort_values("event_type").reset_index(drop=True)
    for c in ("n_rows", "sum_event_id", "sum_user_id"):
        out[c] = out[c].astype("int64")
    return out[["event_type", "n_rows", "sum_event_id", "sum_user_id"]]


def q_user_longest_streak(sf_dir: str):
    """Distribution of each user's longest run of consecutive ACTIVE days
    (gaps-and-islands): streak_days -> n_users.

    Scale shape: blocks pre-reduce to distinct (user, day) pairs tagged
    by user hash; a user's complete day set lands in ONE bucket
    (stable_partition), so the per-bucket kernel computes exact runs —
    one vectorized sort + shift-compare island scan across ALL users in
    the bucket, no per-user loop. Buckets emit their streak histogram
    (<= |distinct streak lengths| rows each) and the driver folds
    64 x that. Day numbers are integer microsecond-epoch divisions, so
    the run test (day == prev_day + 1) is exact arithmetic."""
    import pandas as pd

    from ..partition import stable_partition

    n_parts = 64
    day_us = 86_400_000_000

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "u": pa.array([], pa.int64()),
            "d": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "user_id" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["user_id"]),
                             pc.is_valid(b["ts"])))
        if b.num_rows == 0:
            return pa.table(cols)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (
            pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // day_us
        )
        dd = pd.DataFrame({"u": u, "d": d}).drop_duplicates()
        k = dd["u"].to_numpy(np.int64)
        return pa.table(
            {
                "u": pa.array(k, pa.int64()),
                "d": pa.array(dd["d"].to_numpy(np.int64), pa.int64()),
                "_part": pa.array(stable_partition(k, n_parts), pa.int64()),
            }
        )

    def _bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"streak_days": "int64", "n_users": "int64"}
        if not len(g) or "u" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        dd = g[["u", "d"]].drop_duplicates().sort_values(["u", "d"])
        uu = dd["u"].to_numpy(np.int64)
        dv = dd["d"].to_numpy(np.int64)
        new_run = np.ones(len(dd), bool)
        if len(dd) > 1:
            new_run[1:] = (uu[1:] != uu[:-1]) | (dv[1:] != dv[:-1] + 1)
        run_id = np.cumsum(new_run)
        runs = (
            pd.DataFrame({"u": uu, "r": run_id})
            .groupby(["u", "r"]).size().rename("len").reset_index()
        )
        mx = runs.groupby("u")["len"].max()
        h = mx.value_counts()
        return pd.DataFrame(
            {
                "streak_days": h.index.to_numpy(np.int64),
                "n_users": h.to_numpy(np.int64),
            }
        )

    parts = (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "streak_days" not in parts.columns:
        return _typed_empty(streak_days="int64", n_users="int64")
    out = parts.groupby("streak_days", as_index=False)["n_users"].sum()
    out["streak_days"] = out["streak_days"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("streak_days").reset_index(drop=True)


def q_embed_cov_matrix(sf_dir: str):
    """Exact upper-triangle second-moment (Gram) matrix over quantized
    embedding units — the covariance input of a PCA / whitening stage
    (pair with embed_dim_moments' per-dim sums for the mean subtraction).

    Exactness: each float32 component quantizes ONCE to 1e-6 units (a
    widening f32->f64 cast is exact, so the quantization is bit-identical
    on both sides), after which every product/sum is integer — no float
    summation order anywhere. Scale shape: each block folds its vectors
    to ONE d*(d+1)/2-row partial via a single int64 matmul (vectors never
    shuffle, never collect); the driver folds blocks x 2080 rows with
    Python-int sums (overflow-proof past the int64 partial bound, which
    a single block cannot hit: |unit| <= ~1e6 -> products <= ~1e12, and
    blocks are target_max_block_size-bounded)."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "dim_i": pa.array([], pa.int64()),
            "dim_j": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sum_prod_units": pa.array([], pa.int64()),
        }
        if "embedding" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // b.num_rows
        x = flat.astype(np.float64).reshape(b.num_rows, d)
        xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
        gram = xq.T @ xq
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "dim_i": pa.array((iu + 1).astype(np.int64), pa.int64()),
                "dim_j": pa.array((ju + 1).astype(np.int64), pa.int64()),
                "n": pa.array(np.full(len(iu), b.num_rows, np.int64),
                              pa.int64()),
                "sum_prod_units": pa.array(gram[iu, ju], pa.int64()),
            }
        )

    parts = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()
    if not len(parts) or "dim_i" not in parts.columns:
        return _typed_empty(dim_i="int64", dim_j="int64", n="int64",
                            sum_prod_units="int64")
    # Python-int fold: immune to int64 overflow across many blocks
    grouped = parts.groupby(["dim_i", "dim_j"], sort=True)
    rows = [
        (int(i), int(j), int(sum(int(v) for v in g["n"])),
         int(sum(int(v) for v in g["sum_prod_units"])))
        for (i, j), g in grouped
    ]
    out = pd.DataFrame(rows, columns=["dim_i", "dim_j", "n",
                                      "sum_prod_units"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def q_tpch_q7_volume(sf_dir: str, year_start: str = "1996-01-01",
                     n_years: int = 2,
                     max_supplier_broadcast: int = 20_000_000):
    """TPC-H Q7 shape, generalized to the full nation-pair trade matrix:
    revenue per (supplier nation, customer nation, ship year) for
    cross-nation lines in a two-year ship window.

    Scale shape: the q5 plan — nation is a driver-side dim, supplier
    broadcasts as a sorted suppkey->nationkey array (fail-fast bound),
    and the two big joins (orders x customer on custkey, then x lineitem
    on orderkey) are tagged-union co-partitioned hash joins: one
    stable_partition groupby per stage, vectorized pandas merges per
    bucket, merge stages return pa.Table (never mix pandas/arrow block
    streams into a downstream groupby). Lineitem pre-aggregates cents
    per (orderkey, supp_nation, year) inside the batch fn, so shuffle
    volume is bounded by order x nation x year cardinality, not line
    count; buckets emit (supp_nat, cust_nat, year) partials and the
    driver folds 64 x |nations|^2 x years tiny rows."""
    import pandas as pd
    import pyarrow.parquet as pq_
    import ray

    from ..partition import stable_partition

    nat = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    empty = _typed_empty(supp_nation=object, cust_nation=object,
                         l_year="int64", n_lines="int64",
                         revenue_cents="int64")

    sup_ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n_sup = sup_ds.count()  # parquet metadata
    if n_sup > max_supplier_broadcast:
        raise ValueError(
            f"tpch_q7_volume: {n_sup} suppliers exceed the broadcast bound "
            f"{max_supplier_broadcast}; route the supplier lookup through a "
            "third co-partitioned join instead"
        )
    sup = sup_ds.to_pandas()
    if "s_suppkey" not in sup.columns or not len(sup):
        return empty
    sup = sup.sort_values("s_suppkey")
    sup_ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(dtype=np.int64),
            sup["s_nationkey"].to_numpy(dtype=np.int64),
        )
    )

    lo_us = int(pd.Timestamp(year_start).value // 1000)
    hi_us = int(
        (pd.Timestamp(year_start) + pd.DateOffset(years=n_years)).value
        // 1000
    )
    n_parts = 64

    def _aligned(key, a, yr, n, cents, side):
        key = np.asarray(key, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "a": pa.array(np.asarray(a, dtype=np.int64), pa.int64()),
                "yr": pa.array(np.asarray(yr, dtype=np.int64), pa.int64()),
                "n": pa.array(np.asarray(n, dtype=np.int64), pa.int64()),
                "cents": pa.array(np.asarray(cents, dtype=np.int64),
                                  pa.int64()),
                "side": pa.array(np.full(len(key), side, np.int32),
                                 pa.int32()),
                "_part": pa.array(
                    stable_partition(key, n_parts)
                    if len(key) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    # --- stage A: orders x customer, keyed custkey -> (orderkey, cust_nat)
    def _o_side(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names or b.num_rows == 0:
            return _aligned([], [], [], [], [], 0)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(ck), np.int64)
        return _aligned(ck, ok, z, z, z, 0)

    def _c_side(b: pa.Table) -> pa.Table:
        if "c_custkey" not in b.column_names or b.num_rows == 0:
            return _aligned([], [], [], [], [], 1)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(ck), np.int64)
        return _aligned(ck, nk, z, z, z, 1)

    def _merge_a(g: "pd.DataFrame") -> pa.Table:
        o = g[g["side"] == 0]
        c = g[g["side"] == 1]
        if not len(o) or not len(c):
            return _aligned([], [], [], [], [], 0)
        m = o.merge(c[["key", "a"]].rename(columns={"a": "c_nat"}), on="key")
        # re-key on orderkey; customer nation rides along in `a`
        return _aligned(
            m["a"].to_numpy(np.int64), m["c_nat"].to_numpy(np.int64),
            np.zeros(len(m), np.int64), np.zeros(len(m), np.int64),
            np.zeros(len(m), np.int64), 0,
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey"]
    ).map_batches(_o_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(_c_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    order_nat = (
        orders.union(cust).groupby("_part")
        .map_groups(_merge_a, batch_format="pandas")
    )

    # --- stage B: x lineitem pre-aggregated per (orderkey, supp_nat, year)
    def _l_side(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names or b.num_rows == 0:
            return _aligned([], [], [], [], [], 1)
        mask = pc.and_(pc.is_valid(b["l_shipdate"]),
                       pc.is_valid(b["l_extendedprice"]))
        b = b.filter(mask)
        if b.num_rows:
            dts = pc.cast(b["l_shipdate"], pa.int64())
            b = b.filter(pc.and_(pc.greater_equal(dts, lo_us),
                                 pc.less(dts, hi_us)))
        if b.num_rows == 0:
            return _aligned([], [], [], [], [], 1)
        sk_keys, sk_nat = _broadcast_get(sup_ref)
        lk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(sk_keys, lk)
        idx[idx >= len(sk_keys)] = 0
        hit = (sk_keys[idx] == lk) if len(sk_keys) else np.zeros(len(lk),
                                                                 bool)
        if not hit.any():
            return _aligned([], [], [], [], [], 1)
        b = b.filter(pa.array(hit))
        snat = sk_nat[idx[hit]]
        cents = _cents(
            pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        ).to_numpy(zero_copy_only=False)
        yr = pc.year(b["l_shipdate"]).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame(
                {
                    "key": b["l_orderkey"].to_numpy(zero_copy_only=False),
                    "a": snat,
                    "yr": yr.astype(np.int64),
                    "cents": cents,
                }
            )
            .groupby(["key", "a", "yr"], as_index=False)
            .agg(n=("cents", "size"), cents=("cents", "sum"))
        )
        return _aligned(g["key"], g["a"], g["yr"], g["n"], g["cents"], 1)

    def _merge_b(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"supp_nat": "int64", "cust_nat": "int64",
                    "l_year": "int64", "n_lines": "int64",
                    "revenue_cents": "int64"}
        o = g[g["side"] == 0]
        li = g[g["side"] == 1]
        if not len(o) or not len(li):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        m = li.merge(o[["key", "a"]].rename(columns={"a": "cust_nat"}),
                     on="key")
        m = m[m["a"] != m["cust_nat"]]
        if not len(m):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        out = (
            m.groupby(["a", "cust_nat", "yr"], as_index=False)
            .agg(n_lines=("n", "sum"), revenue_cents=("cents", "sum"))
            .rename(columns={"a": "supp_nat", "yr": "l_year"})
        )
        for c, t in out_cols.items():
            out[c] = out[c].astype(t)
        return out[list(out_cols)]

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    ).map_batches(_l_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    parts = (
        order_nat.union(li).groupby("_part")
        .map_groups(_merge_b, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "supp_nat" not in parts.columns:
        return empty
    out = parts.groupby(["supp_nat", "cust_nat", "l_year"], as_index=False)[
        ["n_lines", "revenue_cents"]
    ].sum()
    out["supp_nation"] = out["supp_nat"].map(names)
    out["cust_nation"] = out["cust_nat"].map(names)
    for c in ("l_year", "n_lines", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return (
        out[["supp_nation", "cust_nation", "l_year", "n_lines",
             "revenue_cents"]]
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )


def q_tpch_q8_market_share(sf_dir: str, region: str = "ASIA",
                           nation: str = "NATION_2",
                           part_type: str = "PROMO",
                           year_start: str = "1995-01-01",
                           n_years: int = 2,
                           max_broadcast: int = 50_000_000):
    """TPC-H Q8 shape: one nation's market share of a part type among a
    region's customers, per order year — share = nation_cents /
    total_cents (a ratio of integers, rounded half-up like the oracle).

    Scale shape: q7's plan with two broadcast prefilters — part collapses
    to a sorted partkey array for the type (fail-fast bound) and supplier
    to suppkey->nationkey; orders filter to the year window and carry
    the year; stage A co-partitions orders x region-customers on custkey,
    stage B co-partitions that x type-filtered lineitem pre-aggregated
    per (orderkey, is_target_nation) — both tagged-union stable_partition
    joins, no aggregator pools. Buckets emit (year, n, total, nation)
    partials; the driver folds 64 x years rows."""
    import pandas as pd
    import pyarrow.parquet as pq_
    import ray

    from ..partition import stable_partition
    from ..util import round_half_up

    nat = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq_.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    ).to_pandas()
    empty = _typed_empty(o_year="int64", n_lines="int64",
                         total_cents="int64", nation_cents="int64",
                         mkt_share="float64")
    rkeys = set(reg[reg["r_name"] == region]["r_regionkey"])
    cust_nations = np.sort(
        nat[nat["n_regionkey"].isin(rkeys)]["n_nationkey"]
        .to_numpy(dtype=np.int64)
    )
    tgt = nat[nat["n_name"] == nation]["n_nationkey"]
    if not len(cust_nations) or not len(tgt):
        return empty
    tgt_key = int(tgt.iloc[0])

    part_ds = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    sup_ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    if part_ds.count() > max_broadcast or sup_ds.count() > max_broadcast:
        raise ValueError(
            "tpch_q8_market_share: part/supplier exceed the broadcast "
            f"bound {max_broadcast}; route the lookups through "
            "co-partitioned joins (q5/q10 shape) instead"
        )
    pdf = part_ds.to_pandas()
    pkeys = (
        np.sort(pdf.loc[pdf["p_type"] == part_type, "p_partkey"]
                .to_numpy(np.int64))
        if "p_partkey" in pdf.columns else np.array([], dtype=np.int64)
    )
    sup = sup_ds.to_pandas()
    if "s_suppkey" not in sup.columns or not len(sup) or not len(pkeys):
        return empty
    sup = sup.sort_values("s_suppkey")
    bc_ref = ray.put(
        (
            pkeys,
            sup["s_suppkey"].to_numpy(dtype=np.int64),
            sup["s_nationkey"].to_numpy(dtype=np.int64),
        )
    )

    lo_us = int(pd.Timestamp(year_start).value // 1000)
    hi_us = int(
        (pd.Timestamp(year_start) + pd.DateOffset(years=n_years)).value
        // 1000
    )
    n_parts = 64

    def _aligned(key, a, n, cents, side):
        key = np.asarray(key, dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "a": pa.array(np.asarray(a, dtype=np.int64), pa.int64()),
                "n": pa.array(np.asarray(n, dtype=np.int64), pa.int64()),
                "cents": pa.array(np.asarray(cents, dtype=np.int64),
                                  pa.int64()),
                "side": pa.array(np.full(len(key), side, np.int32),
                                 pa.int32()),
                "_part": pa.array(
                    stable_partition(key, n_parts)
                    if len(key) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    def _o_side(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names or b.num_rows == 0:
            return _aligned([], [], [], [], 0)
        dts = pc.cast(b["o_orderdate"], pa.int64())
        b = b.filter(pc.and_(pc.greater_equal(dts, lo_us),
                             pc.less(dts, hi_us)))
        if b.num_rows == 0:
            return _aligned([], [], [], [], 0)
        yr = pc.year(b["o_orderdate"]).to_numpy(zero_copy_only=False)
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(ck), np.int64)
        # key=custkey, a packs (orderkey, year) via two columns: orderkey
        # rides in `n`, year in `a` (no cents yet)
        return _aligned(
            ck, yr.astype(np.int64),
            b["o_orderkey"].to_numpy(zero_copy_only=False), z, 0,
        )

    def _c_side(b: pa.Table) -> pa.Table:
        if "c_custkey" not in b.column_names or b.num_rows == 0:
            return _aligned([], [], [], [], 1)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(cust_nations, nk)
        idx[idx >= len(cust_nations)] = 0
        keep = cust_nations[idx] == nk
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)[keep]
        z = np.zeros(len(ck), np.int64)
        return _aligned(ck, z, z, z, 1)

    def _merge_a(g: "pd.DataFrame") -> pa.Table:
        o = g[g["side"] == 0]
        c = g[g["side"] == 1]
        if not len(o) or not len(c):
            return _aligned([], [], [], [], 0)
        m = o.merge(c[["key"]].drop_duplicates(), on="key")
        # re-key on orderkey (rode in `n`); year stays in `a`
        return _aligned(
            m["n"].to_numpy(np.int64), m["a"].to_numpy(np.int64),
            np.zeros(len(m), np.int64), np.zeros(len(m), np.int64), 0,
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(_o_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    cust = _read(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(_c_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    order_year = (
        orders.union(cust).groupby("_part")
        .map_groups(_merge_a, batch_format="pandas")
    )

    def _l_side(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names or b.num_rows == 0:
            return _aligned([], [], [], [], 1)
        b = b.filter(pc.and_(pc.is_valid(b["l_extendedprice"]),
                             pc.is_valid(b["l_discount"])))
        if b.num_rows == 0:
            return _aligned([], [], [], [], 1)
        pk_keys, sk_keys, sk_nat = _broadcast_get(bc_ref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(pk_keys, pk)
        idx[idx >= len(pk_keys)] = 0
        hit = pk_keys[idx] == pk
        if not hit.any():
            return _aligned([], [], [], [], 1)
        b = b.filter(pa.array(hit))
        lk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sidx = np.searchsorted(sk_keys, lk)
        sidx[sidx >= len(sk_keys)] = 0
        is_t = (sk_keys[sidx] == lk) & (sk_nat[sidx] == tgt_key)
        cents = _cents(
            pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        ).to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame(
                {
                    "key": b["l_orderkey"].to_numpy(zero_copy_only=False),
                    "a": is_t.astype(np.int64),
                    "cents": cents,
                }
            )
            .groupby(["key", "a"], as_index=False)
            .agg(n=("cents", "size"), cents=("cents", "sum"))
        )
        return _aligned(g["key"], g["a"], g["n"], g["cents"], 1)

    def _merge_b(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"o_year": "int64", "n_lines": "int64",
                    "total_cents": "int64", "nation_cents": "int64"}
        o = g[g["side"] == 0]
        li = g[g["side"] == 1]
        if not len(o) or not len(li):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        m = li.merge(o[["key", "a"]].rename(columns={"a": "o_year"}),
                     on="key")
        if not len(m):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        m["nation_cents"] = np.where(m["a"] == 1, m["cents"], 0)
        out = (
            m.groupby("o_year", as_index=False)
            .agg(n_lines=("n", "sum"), total_cents=("cents", "sum"),
                 nation_cents=("nation_cents", "sum"))
        )
        for c, t in out_cols.items():
            out[c] = out[c].astype(t)
        return out[list(out_cols)]

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(_l_side, batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    parts = (
        order_year.union(li).groupby("_part")
        .map_groups(_merge_b, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "o_year" not in parts.columns:
        return empty
    out = parts.groupby("o_year", as_index=False)[
        ["n_lines", "total_cents", "nation_cents"]
    ].sum()
    for c in ("o_year", "n_lines", "total_cents", "nation_cents"):
        out[c] = out[c].astype("int64")
    out = out[out["total_cents"] > 0]
    out["mkt_share"] = round_half_up(
        out["nation_cents"].to_numpy(np.float64)
        / out["total_cents"].to_numpy(np.float64), 6
    )
    return out.sort_values("o_year").reset_index(drop=True)


def q_pareto_customers(sf_dir: str):
    """Revenue concentration (Pareto front): the smallest prefix of
    customers, ordered by total order revenue descending, whose running
    revenue reaches 80% of the corpus total - each with its rank and
    cumulative share.

    Scale shape: per-batch partials reduce orders to (custkey, revenue)
    before anything shuffles; the driver fold is customer-cardinality
    (bounded by grouped_counts' max_driver_keys with a shuffle fallback).
    Ranking/cumsum run on that customer-sized frame only. Determinism:
    per-customer revenue lands on the 0.01 grid (sums of 2-decimal
    prices, fp error far below the 0.005 tie distance), and to stay
    independent of the oracle's window-sum ACCUMULATION TREE (DuckDB may
    segment-tree a running SUM, changing fp rounding vs a sequential
    cumsum) revenue is carried as exact integer CENTS: the cumulative
    sum, the 80% cutoff ((cum-rev)*5 < total*4) and the share ratio are
    integer arithmetic, bit-equal to the oracle by construction."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(c_custkey="int64", revenue="float64",
                         rnk="int64", cum_share="float64")
    rev = grouped_counts(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        keys=["o_custkey"], sum_col="o_totalprice",
    )
    if "o_custkey" not in rev.columns or not len(rev):
        return empty
    cents = np.floor(
        rev["n_tokens"].to_numpy(np.float64) * 100.0 + 0.5
    ).astype(np.int64)
    rev = (
        pd.DataFrame({"o_custkey": rev["o_custkey"].astype("int64"),
                      "cents": cents})
        .sort_values(["cents", "o_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    cum = rev["cents"].to_numpy(np.int64).cumsum()
    total = int(cum[-1])
    keep = (cum - rev["cents"].to_numpy(np.int64)) * 5 < total * 4
    out = pd.DataFrame(
        {
            "c_custkey": rev.loc[keep, "o_custkey"],
            "revenue": rev.loc[keep, "cents"].to_numpy(np.float64) / 100.0,
            "rnk": np.arange(1, int(keep.sum()) + 1, dtype=np.int64),
            "cum_share": round_half_up(
                cum[keep].astype(np.float64) / float(total), 6
            ),
        }
    )
    return out.reset_index(drop=True)


def q_event_type_pairs(sf_dir: str):
    """Market-basket co-occurrence: for every unordered pair of event
    types, how many users performed BOTH (frequent-itemset support
    counts at itemset size 2).

    Scale shape: batches pre-reduce to distinct (user, type) pairs and
    hash-bucket by user (partition.stable_partition — null-stable), so
    each user's full type set lands in one task; the per-bucket kernel
    is one self-merge on a deduped frame; only (type_a, type_b, n)
    partials (≤ types² per bucket) leave the buckets for the driver
    fold. Users and events never reach the driver."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(type_a=object, type_b=object, n_users="int64")
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def _pairs(b: pa.Table) -> pa.Table:
        # Empty guard emits the INTERMEDIATE schema (user_id/event_type/
        # _part) that the non-empty path produces, so a mix of empty and
        # non-empty blocks concats under one Arrow schema downstream.
        if "user_id" not in b.column_names:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64()),
            })
        if b.num_rows == 0:
            return b.select(["user_id", "event_type"]).append_column(
                "_part", pa.array([], pa.int64())
            )
        df = b.select(["user_id", "event_type"]).to_pandas().drop_duplicates()
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"type_a": pd.Series([], dtype=object),
                    "type_b": pd.Series([], dtype=object),
                    "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(out_cols)
        d = g[["user_id", "event_type"]].drop_duplicates()
        m = d.merge(d, on="user_id", suffixes=("_a", "_b"))
        m = m[m["event_type_a"] < m["event_type_b"]]
        if not len(m):
            return pd.DataFrame(out_cols)
        out = (
            m.groupby(["event_type_a", "event_type_b"], as_index=False)
            .size()
            .rename(columns={"event_type_a": "type_a",
                             "event_type_b": "type_b", "size": "n_users"})
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out

    parts = (
        ev.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
    )
    out = _fold_partials(parts, ["type_a", "type_b"], ["n_users"])
    if out is None:
        return empty
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def q_customers_rfm_cells(sf_dir: str, k: int = 5,
                          max_fold_rows: int = 4_000_000):
    """RFM segmentation: each customer scored by Recency (latest order
    day), Frequency (order count) and Monetary (revenue cents), each
    assigned an exact NTILE(k) quintile, then counted per (r,f,m) cell —
    the classic marketing segmentation cube (<= k^3 output rows).

    Scale shape: per-batch partials reduce orders to per-customer
    (count, cents, last_day) triples; the driver fold is
    customer-cardinality. The NTILE kernel replicates SQL semantics
    exactly (first n%k buckets take one extra row) over the
    deterministic (metric, custkey) order, so every tile id is
    integer-exact vs the oracle."""
    import pandas as pd

    empty = _typed_empty(r_tile="int64", f_tile="int64", m_tile="int64",
                         n_customers="int64")
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_totalprice", "o_orderdate"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "o_custkey": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "last_day": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        df = pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].to_pandas(),
                "cents": np.floor(
                    b["o_totalprice"].to_numpy(zero_copy_only=False)
                    * 100.0 + 0.5
                ).astype(np.int64),
                "day": _day_from_us(
                    pc.cast(b["o_orderdate"], pa.int64())
                ).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("o_custkey", as_index=False).agg(
            n=("cents", "size"), cents=("cents", "sum"),
            last_day=("day", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts_ds = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    # fail-fast BEFORE the collect (blocks x customers partial rows): the
    # NTILE kernel is inherently a global sort over customers, so the
    # driver frame is customer-cardinality by design - the guard turns a
    # silent OOM into a named remedy.
    n_parts = parts_ds.count()
    if n_parts > max_fold_rows:
        raise ValueError(
            f"customers_rfm_cells: {n_parts} per-block customer partials "
            f"exceed the driver fold bound {max_fold_rows}; bucket-collapse "
            "per customer (stable_partition + map_groups) before the tile "
            "sort, or raise max_fold_rows"
        )
    parts = parts_ds.to_pandas()
    if not len(parts) or "o_custkey" not in parts.columns:
        return empty
    cust = parts.groupby("o_custkey", as_index=False).agg(
        n=("n", "sum"), cents=("cents", "sum"), last_day=("last_day", "max")
    )

    def _ntile(metric: np.ndarray, keys: np.ndarray) -> np.ndarray:
        # exact SQL NTILE(k) over ORDER BY metric, custkey: the first
        # n % k buckets take floor(n/k)+1 rows, the rest floor(n/k)
        order = np.lexsort((keys, metric))
        n = len(metric)
        q, rem = divmod(n, k)
        sizes = np.full(k, q, dtype=np.int64)
        sizes[:rem] += 1
        tile_of_pos = np.repeat(np.arange(1, k + 1, dtype=np.int64), sizes)
        tiles = np.empty(n, dtype=np.int64)
        tiles[order] = tile_of_pos
        return tiles

    keys = cust["o_custkey"].to_numpy(np.int64)
    # recency: HIGHER last_day = more recent = tile 1 -> order by -last_day
    r = _ntile(-cust["last_day"].to_numpy(np.int64), keys)
    f = _ntile(-cust["n"].to_numpy(np.int64), keys)
    m = _ntile(-cust["cents"].to_numpy(np.int64), keys)
    out = (
        pd.DataFrame({"r_tile": r, "f_tile": f, "m_tile": m})
        .groupby(["r_tile", "f_tile", "m_tile"], as_index=False)
        .size().rename(columns={"size": "n_customers"})
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["r_tile", "f_tile", "m_tile"]).reset_index(
        drop=True
    )


def q_events_hour_anomaly(sf_dir: str):
    """Seasonal-baseline anomaly detection: an (event_type, day, hour)
    cell is anomalous when its count exceeds 2x that type's average for
    the SAME hour-of-day across all observed days. The comparison is
    pure integer arithmetic (cell*D > 2*T where D = distinct days in
    the corpus and T = the type-hour total), so no float baseline ever
    materializes and the oracle matches bit-for-bit.

    Scale shape: one partial fold over (type, day, hod) cell counts
    (types x days x 24 cardinality); baseline totals and the distinct-
    day count derive from the folded cells, never from a second event
    pass."""
    import pandas as pd

    empty = _typed_empty(event_type=object, day="int64", hod="int64",
                         n="int64", hr_total="int64", n_days="int64")
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "day": pa.array([], pa.int64()),
            "hod": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas(),
                "day": _day_from_us(
                    pc.cast(b["ts"], pa.int64())
                ).to_numpy(zero_copy_only=False),
                "hod": ((us % 86_400_000_000) // 3_600_000_000).astype(
                    np.int64
                ),
            }
        )
        g = (
            df.groupby(["event_type", "day", "hod"], as_index=False)
            .size().rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["event_type", "day", "hod"], ["n"],
    )
    if cells is None:
        return empty
    cells["n"] = cells["n"].astype("int64")
    n_days = int(cells["day"].nunique())
    hr_total = cells.groupby(["event_type", "hod"])["n"].transform("sum")
    flag = cells["n"].to_numpy(np.int64) * n_days > 2 * hr_total.to_numpy(
        np.int64
    )
    out = cells.loc[flag, ["event_type", "day", "hod", "n"]].copy()
    out["hr_total"] = hr_total[flag].astype("int64").to_numpy()
    out["n_days"] = np.int64(n_days)
    for c in ("day", "hod", "n", "hr_total", "n_days"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "day", "hod"]).reset_index(
        drop=True
    )


def q_embed_dim_clip(sf_dir: str, max_fold_rows: int = 4_000_000):
    """Robust-scaling prep: per embedding dimension, the exact
    nearest-rank P1/P99 bounds (in 1e-6 quantized units, the
    embed_dim_moments convention) plus how many components fall outside
    them — the inputs of an outlier-clipping normalizer.

    Exactness: components quantize once to int64 units (f32->f64 widen
    is exact), ranks are ceil(p*n/100) in integer arithmetic, and the
    bound lookup walks an integer histogram — no float path at all.
    Scale shape: blocks fold to per-(dim, unit) count partials (bounded
    by dim x distinct units, count()-guarded before the collect); the
    driver never sees a vector."""
    import pandas as pd

    empty = _typed_empty(dim="int64", n="int64", lo_units="int64",
                         hi_units="int64", n_clipped="int64")
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "dim": pa.array([], pa.int64()),
            "xq": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
        if "embedding" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // b.num_rows
        xq = np.floor(flat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64),
                               b.num_rows),
                "xq": xq,
            }
        )
        g = df.groupby(["dim", "xq"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    if parts.count() > max_fold_rows:
        raise ValueError(
            f"embed_dim_clip: histogram partials exceed {max_fold_rows}; "
            "bucket the (dim, unit) key space before folding"
        )
    hist = _fold_partials(parts, ["dim", "xq"], ["cnt"])
    if hist is None:
        return empty
    hist = hist.sort_values(["dim", "xq"]).reset_index(drop=True)
    hist["cnt"] = hist["cnt"].astype("int64")
    g = hist.groupby("dim")
    cum = g["cnt"].cumsum().to_numpy(np.int64)
    n = g["cnt"].transform("sum").to_numpy(np.int64)
    k1 = (n + 99) // 100          # ceil(0.01 * n)
    k99 = (99 * n + 99) // 100    # ceil(0.99 * n)
    xq = hist["xq"].to_numpy(np.int64)
    rows = []
    for dim, gd in hist.groupby("dim"):
        idx = gd.index.to_numpy()
        c = cum[idx]
        nn = int(n[idx[0]])
        lo = int(xq[idx[np.searchsorted(c, int(k1[idx[0]]))]])
        hi = int(xq[idx[np.searchsorted(c, int(k99[idx[0]]))]])
        clip = int(
            gd.loc[(gd["xq"] < lo) | (gd["xq"] > hi), "cnt"].sum()
        )
        rows.append((int(dim), nn, lo, hi, clip))
    out = pd.DataFrame(
        rows, columns=["dim", "n", "lo_units", "hi_units", "n_clipped"]
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("dim").reset_index(drop=True)


def q_events_type_hour_chi2(sf_dir: str):
    """Chi-square independence screen for event_type x hour-of-day: the
    full contingency grid (zero cells included) with each cell's exact
    observed count, marginals, and its chi-square term
    (o*T - r*c)^2 / (r*c*T) — the standard drift/seasonality test
    statistic, emitted per cell so no float ever sums.

    Exactness: every input to the term is an int64 count; the squared
    numerator runs in Python ints (HUGEINT in the oracle — it exceeds
    int64 at corpus scale) and the single rounded division is the
    identical correctly-rounded double op on both sides. Scale shape:
    one (type, hod) cell-count fold (types x 24), marginals and the
    grid derive from the folded cells on the driver."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(event_type=object, hod="int64", o="int64",
                         row_total="int64", col_total="int64",
                         grand_total="int64", chi_term="float64")
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "hod": pa.array([], pa.int64()),
            "o": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas(),
                "hod": ((us % 86_400_000_000) // 3_600_000_000).astype(
                    np.int64
                ),
            }
        )
        g = df.groupby(["event_type", "hod"], as_index=False).size().rename(
            columns={"size": "o"}
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["event_type", "hod"], ["o"],
    )
    if cells is None:
        return empty
    cells["o"] = cells["o"].astype("int64")
    grid = (
        pd.MultiIndex.from_product(
            [sorted(cells["event_type"].unique()),
             sorted(cells["hod"].unique())],
            names=["event_type", "hod"],
        )
        .to_frame(index=False)
        .merge(cells, on=["event_type", "hod"], how="left")
        .fillna({"o": 0})
    )
    grid["o"] = grid["o"].astype("int64")
    r = grid.groupby("event_type")["o"].transform("sum").astype("int64")
    c = grid.groupby("hod")["o"].transform("sum").astype("int64")
    t = int(grid["o"].sum())
    terms = []
    for o_i, r_i, c_i in zip(grid["o"].tolist(), r.tolist(), c.tolist()):
        d = o_i * t - r_i * c_i      # Python ints: d*d exceeds int64
        terms.append(float(d * d) / float(r_i * c_i * t))
    grid["row_total"] = r
    grid["col_total"] = c
    grid["grand_total"] = np.int64(t)
    grid["chi_term"] = round_half_up(np.array(terms, dtype=np.float64), 6)
    out = grid[["event_type", "hod", "o", "row_total", "col_total",
                "grand_total", "chi_term"]]
    return out.sort_values(["event_type", "hod"]).reset_index(drop=True)


def _skyline_2d(df):
    """Exact 2-D skyline (maximize p_size, minimize cents): keep rows no
    other row dominates ((s2>s1 and p2<=p1) or (s2>=s1 and p2<p1)).
    Vectorized: per size group (descending), a row survives iff its price
    equals the group minimum AND that minimum strictly beats the best
    price of every strictly larger size."""
    import pandas as pd

    g = df.groupby("p_size")["cents"]
    gmin = g.transform("min")
    # best price among STRICTLY larger sizes: cummin over per-size mins
    # ordered size desc, shifted by one group
    mins = g.min().sort_index(ascending=False)
    larger_best = mins.cummin().shift(1)  # NaN for the largest size
    lb = df["p_size"].map(larger_best)
    keep = (df["cents"] == gmin) & (lb.isna() | (gmin < lb))
    # .copy(): callers mutate the result (astype loops); a masked view
    # would warn and depends on copy-on-write semantics
    return df[keep].copy()


def q_parts_price_skyline(sf_dir: str, max_driver_rows: int = 1_000_000):
    """Skyline (Pareto-optimal) query: parts where no other part is both
    at-least-as-large and at-most-as-cheap (with one strict) — the
    classic dominance query, distributed the textbook way: each block
    computes its LOCAL skyline (a superset of the global one, since a
    global skyline point can't be dominated inside any subset), only
    those survivors reach the driver, and the identical kernel runs once
    more on the union. Prices compare in exact integer cents.

    Anti-correlated guard: on adversarial data the skyline itself is
    O(n), so survivors are count()ed BEFORE any collect; past the budget
    an extra distributed round repartitions survivors into fewer, larger
    blocks (more cross-row dominance pruning per task) and re-runs the
    local kernel; if survivors still exceed ``max_driver_rows`` the query
    fail-fasts naming the remedy instead of materializing."""
    import pandas as pd

    empty = _typed_empty(p_partkey="int64", p_size="int64", cents="int64")
    ds = _read(sf_dir, "part",
               columns=["p_partkey", "p_size", "p_retailprice"])

    def _local(b: pa.Table) -> pa.Table:
        cols = {
            "p_partkey": pa.array([], pa.int64()),
            "p_size": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "p_partkey" not in b.column_names:
            return pa.table(cols)
        df = pd.DataFrame(
            {
                "p_partkey": b["p_partkey"].to_pandas().astype("int64"),
                "p_size": b["p_size"].to_pandas().astype("int64"),
                "cents": np.floor(
                    b["p_retailprice"].to_numpy(zero_copy_only=False)
                    * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(_skyline_2d(df), preserve_index=False)

    def _local2(b: pa.Table) -> pa.Table:
        # second-round kernel: survivors already carry the converted
        # (p_partkey, p_size, cents) schema
        if b.num_rows == 0 or "p_partkey" not in b.column_names:
            return pa.table({
                "p_partkey": pa.array([], pa.int64()),
                "p_size": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
            })
        return pa.Table.from_pandas(_skyline_2d(b.to_pandas()),
                                    preserve_index=False)

    surv_ds = ds.map_batches(
        _local, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    n_surv = surv_ds.count()
    if n_surv > max_driver_rows:
        # second distributed round: fewer, larger blocks -> each task sees
        # more rows, so block-local dominance prunes much harder. The
        # local skyline is a superset of the global one in ANY partition,
        # so correctness is unaffected by the repartition.
        surv_ds = surv_ds.repartition(
            max(2, n_surv // max(1, max_driver_rows // 4))
        ).map_batches(
            _local2, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).materialize()
        n_surv = surv_ds.count()
        if n_surv > max_driver_rows:
            raise ValueError(
                f"parts_price_skyline: {n_surv} block-local skyline "
                f"survivors exceed the driver budget {max_driver_rows} "
                "after a second distributed round - the skyline itself is "
                "output-sized on this (anti-correlated) corpus; consume "
                "survivors as a Dataset or raise max_driver_rows"
            )
    if n_surv == 0:
        return empty
    survivors = surv_ds.to_pandas()
    if "p_partkey" not in survivors.columns:
        return empty
    out = _skyline_2d(survivors)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


def q_orders_seasonal_index(sf_dir: str):
    """Month-of-year seasonal index: each calendar month's order count
    scaled by 12x against the grand total (index 1.0 = perfectly level
    demand) — the classic seasonality diagnostic, exact by construction:
    counts fold as integers and the single n*12/total ratio-of-ints
    rounds half-up on both sides."""
    from ..util import round_half_up

    empty = _typed_empty(month_of_year="int64", n_orders="int64",
                         seasonal_index="float64")
    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def _m(b: pa.Table) -> pa.Table:
        cols = {"month_of_year": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_orderdate" not in b.column_names:
            return pa.table(cols)
        m = pc.month(b["o_orderdate"])
        return pa.table({"month_of_year": pc.cast(m, pa.int64())})

    counts = grouped_counts(
        ds.map_batches(_m, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        keys=["month_of_year"], sum_col=None,
    )
    if "month_of_year" not in counts.columns or not len(counts):
        return empty
    counts["n_orders"] = counts["n_rows"].astype("int64")
    total = int(counts["n_orders"].sum())
    counts["seasonal_index"] = round_half_up(
        counts["n_orders"].to_numpy(np.float64) * 12.0 / float(total), 6
    )
    out = counts[["month_of_year", "n_orders", "seasonal_index"]].copy()
    out["month_of_year"] = out["month_of_year"].astype("int64")
    return out.sort_values("month_of_year").reset_index(drop=True)


def q_user_activity_gini(sf_dir: str):
    """Gini coefficient of per-user event counts — the standard
    engagement-inequality diagnostic (0 = every user equally active,
    ->1 = one user generates everything).

    Exactness: with users ranked ascending by count, G = (2*sum(rank*x)
    - (n+1)*sum(x)) / (n*sum(x)); equal counts contribute x*sum(ranks)
    whatever their permutation, so G is a pure function of the DISTINCT
    COUNT-VALUE HISTOGRAM {count c -> users m_c}: users at value c span
    ranks (R_c, R_c+m_c], sum m_c*R_c + m_c*(m_c+1)/2. All sums run in
    Python ints (HUGEINT oracle-side) with one identically-rounded
    division. Scale shape: per-block (user, n) partials hash-bucket by
    user (64 buckets); each bucket collapses its users to value_counts
    of the per-user totals; the driver folds 64 x distinct-count-value
    rows — bounded by distinct activity levels, never user cardinality,
    and the rank sums are a vectorless closed form over the histogram."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(n_users="int64", total_events="int64",
                         gini="float64")
    ds = _read(sf_dir, "events", columns=["user_id"])

    def _partial(b: pa.Table) -> pa.Table:
        if "user_id" not in b.column_names or b.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64()),
            })
        df = (
            b.select(["user_id"]).to_pandas()
            .groupby("user_id", as_index=False).size()
            .rename(columns={"size": "n"})
        )
        df["n"] = df["n"].astype("int64")
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"count_value": pd.Series([], dtype="int64"),
                    "m_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(out_cols)
        totals = g.groupby("user_id")["n"].sum()
        hist = totals.value_counts().sort_index()
        return pd.DataFrame({
            "count_value": hist.index.to_numpy(np.int64),
            "m_users": hist.to_numpy(np.int64),
        })

    parts = (
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_bucket_hist, batch_format="pandas")
    )
    hist = _fold_partials(parts, ["count_value"], ["m_users"])
    if hist is None:
        return empty
    hist = hist.sort_values("count_value").reset_index(drop=True)
    cs = [int(v) for v in hist["count_value"]]
    ms = [int(v) for v in hist["m_users"]]
    n = sum(ms)
    sx = sum(c * m for c, m in zip(cs, ms))
    srx, run = 0, 0
    for c, m in zip(cs, ms):
        srx += c * (m * run + m * (m + 1) // 2)
        run += m
    gini = float(round_half_up(
        np.array([float(2 * srx - (n + 1) * sx) / float(n * sx)]), 6
    )[0])
    return pd.DataFrame(
        {"n_users": np.array([n], np.int64),
         "total_events": np.array([sx], np.int64),
         "gini": np.array([gini], np.float64)}
    )


# ---------------------------------------------------------------------------
# TPC-H completion wave (Q9/Q11/Q12/Q18/Q20 shapes, adapted: the testdata
# schema has no partsupp table, l_shipmode, or l_commitdate)
# ---------------------------------------------------------------------------

def q_tpch_q9_profit(sf_dir: str, max_part_broadcast: int = 50_000_000,
                     max_supplier_broadcast: int = 20_000_000):
    """TPC-H Q9 shape: profit per supplier nation per ship year (adapted:
    no partsupp, so unit cost is the part's retail price — profit =
    revenue cents minus retail-cents x quantity, both exact integers).

    Scale shape: part collapses to a broadcast sorted (partkey ->
    retail cents) array and supplier to (suppkey -> nationkey), both
    fail-fast bounded with counts checked BEFORE any collect (q14/q5
    pattern); lineitem then needs NO shuffle — each block looks up both
    sides with searchsorted and emits per-(nation, year) integer profit
    partials; the driver folds n_blocks x nations x years tiny rows.
    Per-line |profit| is ~1e7 cents, so even 1e10-line (nation, year)
    cells stay 100x under int64."""
    import pandas as pd
    import pyarrow.parquet as pq_
    import ray

    from ..broadcast import broadcast_get

    empty = _typed_empty(nation=object, o_year="int64", n_lines="int64",
                         profit_cents="int64")
    nat = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    nation_names = dict(zip(nat["n_nationkey"], nat["n_name"]))

    part_ds = _read(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    sup_ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n_part, n_sup = part_ds.count(), sup_ds.count()  # parquet metadata
    if n_part > max_part_broadcast:
        raise ValueError(
            f"tpch_q9_profit: {n_part} parts exceed the broadcast bound "
            f"{max_part_broadcast}; route the part lookup through a "
            "co-partitioned tagged-union join (q5/q10 shape) instead"
        )
    if n_sup > max_supplier_broadcast:
        raise ValueError(
            f"tpch_q9_profit: {n_sup} suppliers exceed the broadcast "
            f"bound {max_supplier_broadcast}; co-partition on suppkey"
        )
    pdf = part_ds.to_pandas()
    if "p_partkey" not in pdf.columns:
        pkeys = np.array([], dtype=np.int64)
        pcents = np.array([], dtype=np.int64)
    else:
        pdf = pdf.sort_values("p_partkey")
        pkeys = pdf["p_partkey"].to_numpy(dtype=np.int64)
        pcents = np.floor(
            pdf["p_retailprice"].to_numpy(dtype=np.float64) * 100.0 + 0.5
        ).astype(np.int64)
    sdf = sup_ds.to_pandas()
    if "s_suppkey" not in sdf.columns:
        skeys = np.array([], dtype=np.int64)
        snat = np.array([], dtype=np.int64)
    else:
        sdf = sdf.sort_values("s_suppkey")
        skeys = sdf["s_suppkey"].to_numpy(dtype=np.int64)
        snat = sdf["s_nationkey"].to_numpy(dtype=np.int64)
    lut_ref = ray.put((pkeys, pcents, skeys, snat))

    def _lookup(keys, sorted_keys):
        idx = np.searchsorted(sorted_keys, keys)
        idx[idx >= len(sorted_keys)] = 0
        hit = (sorted_keys[idx] == keys) if len(sorted_keys) else \
            np.zeros(len(keys), dtype=bool)
        return idx, hit

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "nationkey": pa.array([], pa.int64()),
            "o_year": pa.array([], pa.int64()),
            "n_lines": pa.array([], pa.int64()),
            "profit_cents": pa.array([], pa.int64()),
        }
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["l_shipdate"]))
        if b.num_rows == 0:
            return pa.table(cols)
        pk_, pc_, sk_, sn_ = broadcast_get(lut_ref)
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False)
        lsk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pidx, phit = _lookup(lpk, pk_)
        sidx, shit = _lookup(lsk, sk_)
        hit = phit & shit  # inner-join semantics on both dims
        if not hit.all():
            b = b.filter(pa.array(hit))
            if b.num_rows == 0:
                return pa.table(cols)
            pidx, sidx = pidx[hit], sidx[hit]
        rev = _cents(
            pc.multiply(b["l_extendedprice"],
                        pc.subtract(1.0, b["l_discount"]))
        ).to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        profit = rev - pc_[pidx] * qty
        year = pc.year(b["l_shipdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = (
            pd.DataFrame({"nationkey": sn_[sidx], "o_year": year,
                          "profit_cents": profit})
            .groupby(["nationkey", "o_year"], as_index=False)
            .agg(n_lines=("profit_cents", "size"),
                 profit_cents=("profit_cents", "sum"))
        )
        return pa.Table.from_pandas(
            g[["nationkey", "o_year", "n_lines", "profit_cents"]],
            preserve_index=False,
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )
    out = _fold_partials(
        li.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["nationkey", "o_year"], ["n_lines", "profit_cents"],
    )
    if out is None:
        return empty
    out["nation"] = out["nationkey"].map(nation_names)
    out = out[out["nation"].notna()]  # inner join to nation
    if not len(out):
        return empty
    for c in ("o_year", "n_lines", "profit_cents"):
        out[c] = out[c].astype("int64")
    return (
        out[["nation", "o_year", "n_lines", "profit_cents"]]
        .sort_values(["nation", "o_year"]).reset_index(drop=True)
    )


def q_tpch_q11_top_value_parts(sf_dir: str, num: int = 3, den: int = 2,
                               max_driver_rows: int = 2_000_000):
    """TPC-H Q11 shape: parts whose shipped value exceeds num/den x the
    MEAN per-part value (adapted: no partsupp, so 'stock value' is the
    lineitem extended-price cents per part; Q11's fraction is
    scale-dependent — 0.0001/SF — which a mean-relative cutoff
    reproduces without knowing SF).

    Scale shape: per-block (partkey, cents) partials hash-bucket by
    partkey (complete per-part sums inside one bucket); the grand total
    and part count fold from per-bucket single-row summaries in PYTHON
    ints (immune to int64 overflow at any scale); the cutoff
    val*den*n_parts > tot*num is integer cross-multiplication evaluated
    per bucket, and only qualifying rows (count()-guarded) reach the
    driver."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(l_partkey="int64", value_cents="int64")

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "l_partkey": pa.array([], pa.int64()),
            "value_cents": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        g = (
            pd.DataFrame(
                {
                    "l_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
                    "value_cents": _cents(b["l_extendedprice"])
                    .to_numpy(zero_copy_only=False),
                }
            )
            .groupby("l_partkey", as_index=False)["value_cents"].sum()
        )
        k = g["l_partkey"].to_numpy(np.int64)
        g["_part"] = stable_partition(k, 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _per_part(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"l_partkey": "int64", "value_cents": "int64"}
        if not len(g) or "l_partkey" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        t = g.groupby("l_partkey", as_index=False)["value_cents"].sum()
        return t.astype({"l_partkey": "int64", "value_cents": "int64"})

    per_part = (
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_per_part, batch_format="pandas")
        .materialize()  # consumed twice: totals fold + threshold filter
    )

    def _totals(b: pa.Table) -> pa.Table:
        if "value_cents" not in b.column_names or b.num_rows == 0:
            return pa.table({"s": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        v = b["value_cents"].to_numpy(zero_copy_only=False)
        # block-local sum as a decimal STRING so the driver fold is pure
        # Python-int (a single block's int64 sum cannot wrap below ~1e11
        # rows/block; the corpus total can and does only on the driver)
        return pa.table({"s": pa.array([str(int(v.sum()))], pa.string()),
                         "n": pa.array([len(v)], pa.int64())})

    tdf = per_part.map_batches(_totals, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    if not len(tdf) or "s" not in tdf.columns:
        return empty
    tot = sum(int(s) for s in tdf["s"])
    n_parts = int(tdf["n"].sum())
    if n_parts == 0:
        return empty
    rhs = tot * num  # Python int, exact at any magnitude

    def _filter(b: pa.Table) -> pa.Table:
        cols = {"l_partkey": pa.array([], pa.int64()),
                "value_cents": pa.array([], pa.int64())}
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        v = b["value_cents"].to_numpy(zero_copy_only=False)
        lhs_max = int(v.max()) * den * n_parts
        if lhs_max < 2**62 and rhs < 2**62:  # vectorized fast path
            keep = v * (den * n_parts) > rhs
        else:  # exact Python-int comparison (rows here are per-part)
            keep = np.fromiter(
                (int(x) * den * n_parts > rhs for x in v),
                dtype=bool, count=len(v),
            )
        return b.filter(pa.array(keep)).select(["l_partkey", "value_cents"])

    kept = per_part.map_batches(_filter, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    n_kept = kept.count()
    if n_kept == 0:
        return empty
    if n_kept > max_driver_rows:
        raise ValueError(
            f"tpch_q11_top_value_parts: {n_kept} qualifying parts exceed "
            f"the driver budget {max_driver_rows}; raise num/den or "
            "consume the filtered Dataset directly"
        )
    out = kept.to_pandas()
    out["l_partkey"] = out["l_partkey"].astype("int64")
    out["value_cents"] = out["value_cents"].astype("int64")
    return out.sort_values(
        ["value_cents", "l_partkey"], ascending=[False, True]
    ).reset_index(drop=True)


def q_tpch_q12_priority_lines(sf_dir: str):
    """TPC-H Q12 shape: line counts per return flag split by order
    priority class (adapted: testdata lineitem has no l_shipmode or
    commit/receipt dates, so the mode dimension is l_returnflag and the
    late-shipment predicate is dropped; the join + CASE-priority split
    is the Q12 core).

    Scale shape: the q4 tagged-union co-partitioned plan — lineitem
    pre-reduces to per-block (orderkey, returnflag, n) partials, orders
    ship (orderkey, is-high) bits, ONE stable_partition groupby
    co-locates each orderkey, and each bucket emits flag-cardinality
    count partials; the driver folds 64 x 3 rows."""
    import pandas as pd

    from ..partition import stable_partition

    n_parts = 64
    _HIGH = ("1-URGENT", "2-HIGH")
    empty = _typed_empty(l_returnflag=object, high_lines="int64",
                         low_lines="int64")

    def _tagged(keys, flag, n, high, side):
        keys = np.asarray(keys, dtype=np.int64)
        return pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "flag": pa.array(list(flag), pa.string()),
                "n": pa.array(np.asarray(n, dtype=np.int64), pa.int64()),
                "high": pa.array(np.asarray(high, dtype=bool), pa.bool_()),
                "side": pa.array(np.full(len(keys), side, np.int32),
                                 pa.int32()),
                "_part": pa.array(
                    stable_partition(keys, n_parts)
                    if len(keys) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    def _l_side(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names or b.num_rows == 0:
            return _tagged([], [], [], [], 0)
        g = (
            pd.DataFrame(
                {
                    "k": b["l_orderkey"].to_numpy(zero_copy_only=False),
                    "flag": b["l_returnflag"].to_pandas(),
                }
            )
            .groupby(["k", "flag"], as_index=False).size()
        )
        return _tagged(g["k"].to_numpy(np.int64), g["flag"],
                       g["size"].to_numpy(np.int64),
                       np.zeros(len(g), dtype=bool), 0)

    def _o_side(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names or b.num_rows == 0:
            return _tagged([], [], [], [], 1)
        keys = b["o_orderkey"].to_numpy(zero_copy_only=False)
        pri = b["o_orderpriority"].to_pandas()
        return _tagged(keys, [""] * len(keys),
                       np.zeros(len(keys), dtype=np.int64),
                       pri.isin(_HIGH).to_numpy(), 1)

    def _merge(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"l_returnflag": "object", "high_lines": "int64",
                    "low_lines": "int64"}
        li = g[g["side"] == 0]
        o = g[g["side"] == 1]
        if not len(li) or not len(o):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        m = li.merge(o[["k", "high"]], on="k", how="inner",
                     suffixes=("", "_o"))
        if not len(m):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        n = m["n"].to_numpy(np.int64)
        hi = m["high_o"] if "high_o" in m.columns else m["high"]
        hi = hi.to_numpy()
        part = (
            pd.DataFrame(
                {
                    "l_returnflag": m["flag"],
                    "high_lines": np.where(hi, n, 0),
                    "low_lines": np.where(hi, 0, n),
                }
            )
            .groupby("l_returnflag", as_index=False)[
                ["high_lines", "low_lines"]].sum()
        )
        return part.astype({"high_lines": "int64", "low_lines": "int64"})

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"]) \
        .map_batches(_l_side, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(_o_side, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    parts = (
        li.union(orders).groupby("_part")
        .map_groups(_merge, batch_format="pandas")
    )
    out = _fold_partials(parts, ["l_returnflag"],
                         ["high_lines", "low_lines"])
    if out is None:
        return empty
    out["high_lines"] = out["high_lines"].astype("int64")
    out["low_lines"] = out["low_lines"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_tpch_q18_big_orders(sf_dir: str, min_qty: int = 250, k: int = 100):
    """TPC-H Q18 shape: the top-k largest orders by price among orders
    whose total line quantity exceeds ``min_qty``, with the ordering
    customer's name.

    Scale shape: lineitem pre-reduces to per-block (orderkey, qty)
    integer partials and orders ship (orderkey, custkey, price cents)
    rows, co-partitioned by orderkey (q4 tagged-union plan); each bucket
    completes its quantity sums, applies the HAVING filter, and emits
    only its LOCAL top-k by (price desc, orderkey asc) — the global
    top-k is a subset of the per-bucket top-k's, so the driver folds
    64 x k rows, never the filtered order set. Customer names resolve by
    broadcasting the <= k SURVIVOR custkeys and semi-join-filtering the
    customer table distributedly (q3's BUILDING-keys shape reversed), so
    the customer collect is survivor-bounded at any scale."""
    import pandas as pd
    import ray

    from ..broadcast import broadcast_get
    from ..partition import stable_partition

    n_parts = 64
    empty = _typed_empty(o_orderkey="int64", o_custkey="int64",
                         c_name=object, sum_qty="int64",
                         total_cents="int64")

    def _tagged(keys, cust, cents, qty, side):
        keys = np.asarray(keys, dtype=np.int64)
        return pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "cust": pa.array(np.asarray(cust, dtype=np.int64),
                                 pa.int64()),
                "cents": pa.array(np.asarray(cents, dtype=np.int64),
                                  pa.int64()),
                "qty": pa.array(np.asarray(qty, dtype=np.int64), pa.int64()),
                "side": pa.array(np.full(len(keys), side, np.int32),
                                 pa.int32()),
                "_part": pa.array(
                    stable_partition(keys, n_parts)
                    if len(keys) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    def _l_side(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names or b.num_rows == 0:
            return _tagged([], [], [], [], 0)
        g = (
            pd.DataFrame(
                {
                    "k": b["l_orderkey"].to_numpy(zero_copy_only=False),
                    "qty": b["l_quantity"].to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby("k", as_index=False)["qty"].sum()
        )
        z = np.zeros(len(g), dtype=np.int64)
        return _tagged(g["k"].to_numpy(np.int64), z, z,
                       g["qty"].to_numpy(np.int64), 0)

    def _o_side(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names or b.num_rows == 0:
            return _tagged([], [], [], [], 1)
        keys = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return _tagged(
            keys,
            b["o_custkey"].to_numpy(zero_copy_only=False),
            _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False),
            np.zeros(len(keys), dtype=np.int64),
            1,
        )

    def _merge(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"o_orderkey": "int64", "o_custkey": "int64",
                    "sum_qty": "int64", "total_cents": "int64"}
        li = g[g["side"] == 0]
        o = g[g["side"] == 1]
        if not len(li) or not len(o):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        qs = li.groupby("k", as_index=False)["qty"].sum()
        qs = qs[qs["qty"] > min_qty]
        m = qs.merge(o[["k", "cust", "cents"]], on="k", how="inner")
        if not len(m):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        m = m.sort_values(["cents", "k"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "o_orderkey": m["k"].to_numpy(np.int64),
                "o_custkey": m["cust"].to_numpy(np.int64),
                "sum_qty": m["qty"].to_numpy(np.int64),
                "total_cents": m["cents"].to_numpy(np.int64),
            }
        )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]) \
        .map_batches(_l_side, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(_o_side, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    cand = (
        li.union(orders).groupby("_part")
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()  # bounded: 64 buckets x k rows
    )
    if not len(cand) or "o_orderkey" not in cand.columns:
        return empty
    top = cand.sort_values(
        ["total_cents", "o_orderkey"], ascending=[False, True]
    ).head(k)

    # survivor-bounded customer-name resolve
    ck_ref = ray.put(np.sort(top["o_custkey"].unique().astype(np.int64)))

    def _cust(b: pa.Table) -> pa.Table:
        cols = {"c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string())}
        if "c_custkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        want = broadcast_get(ck_ref)
        keys = b["c_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(want, keys)
        idx[idx >= len(want)] = 0
        hit = (want[idx] == keys) if len(want) else \
            np.zeros(len(keys), dtype=bool)
        return b.filter(pa.array(hit)).select(["c_custkey", "c_name"])

    names = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(_cust, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .to_pandas()
    )
    if not len(names) or "c_custkey" not in names.columns:
        top = top.assign(c_name=pd.Series([None] * len(top), dtype=object))
    else:
        top = top.merge(names, left_on="o_custkey", right_on="c_custkey",
                        how="inner").drop(columns=["c_custkey"])
    if not len(top):
        return empty
    for c in ("o_orderkey", "o_custkey", "sum_qty", "total_cents"):
        top[c] = top[c].astype("int64")
    return (
        top[["o_orderkey", "o_custkey", "c_name", "sum_qty", "total_cents"]]
        .sort_values(["total_cents", "o_orderkey"],
                     ascending=[False, True])
        .reset_index(drop=True)
    )


def q_tpch_q20_major_suppliers(sf_dir: str, mult: int = 5,
                               max_supplier_broadcast: int = 20_000_000):
    """TPC-H Q20 shape: suppliers holding a dominant share of some part's
    shipments — a (part, supplier) pair qualifies when mult x its
    quantity exceeds the part's total (adapted: no partsupp/availqty, so
    'excess stock' is shipped-quantity share; mult=5 = a >20% share).

    Scale shape: per-block (partkey, suppkey, qty) integer partials
    hash-bucket by PARTKEY, so each bucket holds complete per-part AND
    per-pair sums and applies the share cutoff locally with integer
    cross-multiplication; only qualifying (suppkey, n_parts) partials
    reach the driver (bounded by suppliers with a dominant part). The
    name resolve broadcasts the supplier dim with the q15/q16 fail-fast
    bound."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(s_suppkey="int64", s_name=object, n_parts="int64")

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "l_partkey": pa.array([], pa.int64()),
            "l_suppkey": pa.array([], pa.int64()),
            "qty": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        g = (
            pd.DataFrame(
                {
                    "l_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
                    "l_suppkey": b["l_suppkey"].to_numpy(zero_copy_only=False),
                    "qty": b["l_quantity"].to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby(["l_partkey", "l_suppkey"], as_index=False)["qty"].sum()
        )
        g["_part"] = stable_partition(g["l_partkey"], 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"s_suppkey": "int64", "n_parts": "int64"}
        if not len(g) or "l_partkey" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        pair = g.groupby(["l_partkey", "l_suppkey"],
                         as_index=False)["qty"].sum()
        tot = pair.groupby("l_partkey")["qty"].transform("sum")
        keep = pair[pair["qty"] * mult > tot]
        if not len(keep):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        out = (
            keep.groupby("l_suppkey", as_index=False).size()
            .rename(columns={"l_suppkey": "s_suppkey", "size": "n_parts"})
        )
        return out.astype({"s_suppkey": "int64", "n_parts": "int64"})

    parts = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
    )
    agg = _fold_partials(parts, ["s_suppkey"], ["n_parts"])
    if agg is None:
        return empty
    sup_ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    if sup_ds.count() > max_supplier_broadcast:
        raise ValueError(
            f"tpch_q20_major_suppliers: supplier dim exceeds "
            f"{max_supplier_broadcast}; co-partition the name join"
        )
    sup = sup_ds.to_pandas()
    if "s_suppkey" not in sup.columns:
        return empty
    out = agg.merge(sup, on="s_suppkey", how="inner")
    if not len(out):
        return empty
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["n_parts"] = out["n_parts"].astype("int64")
    return (
        out[["s_suppkey", "s_name", "n_parts"]]
        .sort_values("s_suppkey").reset_index(drop=True)
    )


def q_events_burstiness(sf_dir: str):
    """Traffic burstiness per event type: the Fano factor (variance /
    mean) of hourly event counts over the type's dense active hour range
    — ~1 for Poisson-like arrivals, >>1 for bursty/incident-driven types.
    The capacity-planning number a rate-limit or autoscale policy reads.

    Exactness: hourly cells are int64 counts (absolute hour = us //
    3.6e9, floor-identical to the oracle's floor(epoch/3600) at timestamp
    magnitudes); zero hours inside [min, max] contribute nothing to the
    sums and H = max - min + 1 counts them exactly. fano =
    (H*sumsq - n^2) / (n*H) runs in Python ints (HUGEINT oracle-side —
    n^2 exceeds int64 at corpus scale) with ONE rounded division.

    Scale shape: per-block (type, hour) count partials (types x hours,
    bounded by the time range, not rows) fold on the driver."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(event_type=object, n_events="int64",
                         n_hours="int64", sumsq_hourly="int64",
                         fano="float64")
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {
            "event_type": pa.array([], pa.string()),
            "hr": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "hr": (us // 3_600_000_000).astype(np.int64),
        })
        g = df.groupby(["event_type", "hr"], as_index=False).size().rename(
            columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["event_type", "hr"], ["n"],
    )
    if cells is None:
        return empty
    rows = []
    for et, g in cells.groupby("event_type"):
        hrs = g["hr"].to_numpy(np.int64)
        ns = [int(v) for v in g["n"]]
        h = int(hrs.max()) - int(hrs.min()) + 1
        n = sum(ns)
        ssq = sum(v * v for v in ns)  # Python ints: no wrap at any scale
        i64 = np.iinfo(np.int64).max
        if n > i64 or ssq > i64:
            raise OverflowError(
                f"events_burstiness: totals for {et!r} exceed int64; "
                "oracle CAST(... AS BIGINT) raises here too")
        fano = float(round_half_up(
            np.array([float(h * ssq - n * n) / (float(n) * h)]), 6)[0])
        rows.append((et, n, h, ssq, fano))
    out = pd.DataFrame(rows, columns=["event_type", "n_events", "n_hours",
                                      "sumsq_hourly", "fano"])
    for c in ("n_events", "n_hours", "sumsq_hourly"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_ab_value_ttest(sf_dir: str, arm_a: str = "purchase",
                     arm_b: str = "click"):
    """Two-arm experiment readout: Welch's t statistic comparing the mean
    event value between two event types (unequal variances, the default
    A/B-test contrast). Emits the exact integer sufficient statistics per
    arm plus the single derived float.

    Exactness: values quantize once to cents; per-block partial sums run
    in Python ints and ship as DECIMAL STRINGS (sumsq exceeds int64 within
    a single large block at corpus scale), recombining driver-side in
    Python ints with the oracle-mirroring BIGINT fail-fast. The sample
    variance uses the exact-integer form (n*ssq - s^2)/(n*(n-1)) — one
    correctly-rounded division per arm — and the t expression
    (m1 - m2)/sqrt(v1/n1 + v2/n2) is the identical IEEE tree on both
    sides (div/sub/add/sqrt are all correctly rounded). Arms with n < 2
    yield NULL t (oracle CASE) / NaN here.

    Scale shape: a 2-row-per-block partial fold; nothing key-sized ever
    moves."""
    import pandas as pd

    from ..util import round_half_away

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "arm": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "s_str": pa.array([], pa.string()),
            "ssq_str": pa.array([], pa.string()),
        }
        if b.num_rows == 0 or "value" not in b.column_names:
            return pa.table(cols)
        et = b["event_type"].to_pandas().to_numpy()
        cents = _cents(b["value"]).to_numpy(zero_copy_only=False)
        arms, ns, ss, qq = [], [], [], []
        for arm in (arm_a, arm_b):
            m = et == arm
            if not m.any():
                continue
            cs = [int(v) for v in cents[m]]
            arms.append(arm)
            ns.append(len(cs))
            ss.append(str(sum(cs)))
            qq.append(str(sum(v * v for v in cs)))
        return pa.table({"arm": pa.array(arms, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "s_str": pa.array(ss, pa.string()),
                         "ssq_str": pa.array(qq, pa.string())})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    stats = {arm_a: [0, 0, 0], arm_b: [0, 0, 0]}
    if len(parts) and "arm" in parts.columns:
        for _, r in parts.iterrows():
            st = stats[r["arm"]]
            st[0] += int(r["n"])
            st[1] += int(r["s_str"])
            st[2] += int(r["ssq_str"])
    i64 = np.iinfo(np.int64).max
    for arm, (n, s, ssq) in stats.items():
        if s > i64 or ssq > i64:
            raise OverflowError(
                f"ab_value_ttest: totals for {arm!r} exceed int64; "
                "oracle CAST(... AS BIGINT) raises here too")
    n1, s1, q1 = stats[arm_a]
    n2, s2, q2 = stats[arm_b]
    if n1 >= 2 and n2 >= 2:
        v1 = float(n1 * q1 - s1 * s1) / float(n1 * (n1 - 1))
        v2 = float(n2 * q2 - s2 * s2) / float(n2 * (n2 - 1))
        t = (float(s1) / n1 - float(s2) / n2) / np.sqrt(v1 / n1 + v2 / n2)
        t = float(round_half_away(np.array([t]), 6)[0])
    else:
        t = np.nan
    out = pd.DataFrame([{
        "n_a": n1, "sum_a_cents": s1, "sumsq_a_cents": q1,
        "n_b": n2, "sum_b_cents": s2, "sumsq_b_cents": q2,
        "welch_t": t,
    }])
    for c in ("n_a", "sum_a_cents", "sumsq_a_cents", "n_b", "sum_b_cents",
              "sumsq_b_cents"):
        out[c] = out[c].astype("int64")
    out["welch_t"] = out["welch_t"].astype("float64")
    return out


def q_events_table_checksum(sf_dir: str, n_buckets: int = 64):
    """Replica-consistency table checksum (the pt-table-checksum shape the
    reference's ecosystem pairs with log parsing): events fold to
    per-chunk row counts plus TWO order-independent digests of a
    canonical per-row string — an integer SUM of the 32-bit md5 prefix
    (catches multiset differences) and a BIT-XOR (the cheap variant two
    replicas can compare chunk-by-chunk to localize drift).

    Exactness: the canonical row string is identical on both sides
    (integer cents, exact epoch microseconds via epoch_us, '|' joins);
    md5 is md5. XOR never overflows; per-block SUM partials are int64
    (safe below ~2e9 rows/block at 32-bit row hashes), ship as decimal
    strings and recombine in Python ints with the oracle-mirroring
    BIGINT fail-fast.

    Scale shape: per-block (bucket, n, sum_str, xor) partials — 64 rows
    per block, chunked by primary key so a real deployment can re-check
    only mismatched chunks."""
    import hashlib

    import pandas as pd

    empty = _typed_empty(bucket="int64", n_rows="int64",
                         checksum_sum="int64", checksum_xor="int64")
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "bucket": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "s_str": pa.array([], pa.string()),
            "x": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "event_id" not in b.column_names:
            return pa.table(cols)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        et = b["event_type"].to_pylist()
        cents = _cents(b["value"]).to_numpy(zero_copy_only=False)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        h32 = np.fromiter(
            (int(hashlib.md5(
                f"{e}|{u}|{t}|{c}|{m}".encode("utf-8")
            ).hexdigest()[:8], 16)
             for e, u, t, c, m in zip(eid, uid, et, cents, us)),
            dtype=np.int64, count=len(eid))
        df = pd.DataFrame({"bucket": eid % n_buckets, "h": h32})
        rows = []
        for bk, g in df.groupby("bucket"):
            hs = g["h"].to_numpy(np.int64)
            rows.append((int(bk), len(hs), str(int(hs.sum())),
                         int(np.bitwise_xor.reduce(hs))))
        out = pd.DataFrame(rows, columns=["bucket", "n", "s_str", "x"])
        for c in ("bucket", "n", "x"):
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    if not len(parts) or "bucket" not in parts.columns:
        return empty
    i64 = np.iinfo(np.int64).max
    rows = []
    for bk, g in parts.groupby("bucket"):
        s = sum(int(v) for v in g["s_str"])
        if s > i64:
            raise OverflowError(
                f"events_table_checksum: sum for chunk {bk} exceeds "
                "int64; oracle CAST(... AS BIGINT) raises here too")
        rows.append((int(bk), int(g["n"].sum()), s,
                     int(np.bitwise_xor.reduce(
                         g["x"].to_numpy(np.int64)))))
    out = pd.DataFrame(rows, columns=["bucket", "n_rows", "checksum_sum",
                                      "checksum_xor"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def q_sessions_bounce(sf_dir: str):
    """Session-quality rollup over the REAL sessionize operator: total
    sessions, bounce sessions (single-event), distinct users, total
    events and dwell time — the engagement headline a product dashboard
    derives from gap-based sessions (30-min timeout, the events_sessions
    semantics).

    Exactness and split-safety: n_users counts sessions with
    session_seq == 1 (exactly one per user — immune to Ray's dynamic
    block splitting cutting a partition's output mid-user, where a
    per-block nunique would double-count); everything else is a
    row-count/int-sum over globally-unique session rows. Duration sums
    ship as per-block decimal strings and recombine in Python ints with
    the BIGINT fail-fast (microsecond dwell exceeds int64 at corpus
    scale).

    Scale shape: sessionize stays a Dataset (user-hash partitions, one
    vectorized pass per partition); this folds 5-int partials per block."""
    import pandas as pd

    from ..stages.window import sessionize
    from ..util import round_half_up

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    sess = sessionize(ev, gap_sec=1800, as_dataset=True)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "n_sessions": pa.array([], pa.int64()),
            "n_bounce": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
            "sum_events": pa.array([], pa.int64()),
            "dur_str": pa.array([], pa.string()),
        }
        if b.num_rows == 0 or "session_seq" not in b.column_names:
            return pa.table(cols)
        ne = b["n_events"].to_numpy(zero_copy_only=False)
        seq = b["session_seq"].to_numpy(zero_copy_only=False)
        dur = b["duration_us"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_sessions": pa.array([b.num_rows], pa.int64()),
            "n_bounce": pa.array([int((ne == 1).sum())], pa.int64()),
            "n_users": pa.array([int((seq == 1).sum())], pa.int64()),
            "sum_events": pa.array([int(ne.sum())], pa.int64()),
            "dur_str": pa.array([str(sum(int(v) for v in dur))],
                                pa.string()),
        })

    parts = sess.map_batches(_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    if not len(parts) or "n_sessions" not in parts.columns:
        ns = nb = nu = se = sd = 0
    else:
        ns = int(parts["n_sessions"].sum())
        nb = int(parts["n_bounce"].sum())
        nu = int(parts["n_users"].sum())
        se = int(parts["sum_events"].sum())
        sd = sum(int(v) for v in parts["dur_str"])
    if sd > np.iinfo(np.int64).max:
        raise OverflowError(
            "sessions_bounce: duration sum exceeds int64; oracle "
            "CAST(... AS BIGINT) raises here too")
    rate = (float(round_half_up(np.array([float(nb) / ns]), 6)[0])
            if ns else np.nan)
    out = pd.DataFrame([{
        "n_sessions": ns, "n_bounce": nb, "n_users": nu,
        "sum_events": se, "sum_duration_us": sd, "bounce_rate": rate,
    }])
    for c in ("n_sessions", "n_bounce", "n_users", "sum_events",
              "sum_duration_us"):
        out[c] = out[c].astype("int64")
    out["bounce_rate"] = out["bounce_rate"].astype("float64")
    return out


def q_region_revenue_rollup(sf_dir: str,
                            max_customer_broadcast: int = 50_000_000):
    """Hierarchical GROUPING-SETS rollup: order revenue at three levels —
    (region, nation) detail, per-region subtotal, grand total — the OLAP
    drill-down surface (SQL ROLLUP), with subtotal rows labeled 'ALL'.

    Exactness: revenue is integer cents; per-block partials are int64
    (order totals are ~1e7 cents, safe below ~1e11 rows/block), the
    driver recombines in Python ints and fail-fasts past int64 exactly
    where the oracle's CAST(SUM AS BIGINT) raises. Subtotals are derived
    from the SAME folded cells, so the three levels cannot disagree.

    Scale shape: customer collapses to a broadcast sorted
    (custkey -> nationkey) array, count-checked BEFORE the collect;
    orders then needs NO shuffle — each block emits nation-cardinality
    partials and the driver folds blocks x 25 rows; nation/region are
    true dims (25/5 rows, driver-side)."""
    import pandas as pd
    import pyarrow.parquet as pq_
    import ray

    from ..broadcast import broadcast_get

    empty = _typed_empty(region=object, nation=object, n_orders="int64",
                         revenue_cents="int64")
    nat = pq_.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq_.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    nation_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    region_of = dict(zip(
        nat["n_nationkey"],
        nat["n_regionkey"].map(dict(zip(reg["r_regionkey"],
                                        reg["r_name"]))),
    ))

    cust_ds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    if cust_ds.count() > max_customer_broadcast:
        raise ValueError(
            f"region_revenue_rollup: customers exceed "
            f"{max_customer_broadcast}; route the nationkey lookup "
            "through a co-partitioned tagged-union join (q5 shape)"
        )
    cdf = cust_ds.to_pandas()
    if "c_custkey" not in cdf.columns:
        return empty
    cdf = cdf.sort_values("c_custkey")
    ckeys = cdf["c_custkey"].to_numpy(np.int64)
    cnat = cdf["c_nationkey"].to_numpy(np.int64)
    lut_ref = ray.put((ckeys, cnat))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "nationkey": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        ks, ns = broadcast_get(lut_ref)
        ok = b["o_custkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, ok)
        idx[idx >= len(ks)] = 0
        hit = (ks[idx] == ok) if len(ks) else np.zeros(len(ok), bool)
        if not hit.any():
            return pa.table(cols)
        cents = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"nationkey": ns[idx[hit]],
                           "revenue_cents": cents[hit]})
             .groupby("nationkey", as_index=False)
             .agg(n_orders=("revenue_cents", "size"),
                  revenue_cents=("revenue_cents", "sum")))
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(
            g[["nationkey", "n_orders", "revenue_cents"]],
            preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).to_pandas()
    if not len(parts) or "nationkey" not in parts.columns:
        return empty
    i64 = np.iinfo(np.int64).max
    cells = []
    for nk, g in parts.groupby("nationkey"):
        rev = sum(int(v) for v in g["revenue_cents"])
        if rev > i64:
            raise OverflowError(
                "region_revenue_rollup: revenue exceeds int64; oracle "
                "CAST(... AS BIGINT) raises here too")
        cells.append((region_of[int(nk)], nation_name[int(nk)],
                      int(g["n_orders"].sum()), rev))
    det = pd.DataFrame(cells, columns=["region", "nation", "n_orders",
                                       "revenue_cents"])
    sub = (det.groupby("region", as_index=False)
           [["n_orders", "revenue_cents"]].sum())
    sub["nation"] = "ALL"
    tot = pd.DataFrame([{
        "region": "ALL", "nation": "ALL",
        "n_orders": int(det["n_orders"].sum()),
        "revenue_cents": int(det["revenue_cents"].sum()),
    }])
    out = pd.concat(
        [det, sub[["region", "nation", "n_orders", "revenue_cents"]], tot],
        ignore_index=True)
    for c in ("n_orders", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["region", "nation"]).reset_index(drop=True)


def q_users_new_vs_returning(sf_dir: str):
    """Daily acquisition split: per UTC day, active users, NEW users
    (whose global first-active day is that day) and returning users —
    the growth-accounting series every product dashboard opens with.

    Exactness: integer day buckets via the _day_from_us float-floor that
    is floor-identical to the oracle's floor(epoch/86400) at timestamp
    magnitudes; counts are exact ints. Split-safety: distinct (user, day)
    pairs hash-bucket by USER (stable_partition) so each user's global
    min-day is computed inside one task; buckets fold straight to
    day-cardinality (n_active, n_new) partials — bounded by the time
    range, never by users.

    Scale shape: one shuffle on a 64-ary key; the driver folds
    64 x days rows."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(day="int64", n_active="int64", n_new="int64",
                         n_returning="int64")
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def _pairs(b: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "day": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        d = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "day": _day_from_us(
                pc.cast(b["ts"], pa.int64())
            ).to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        d["_part"] = stable_partition(
            pa.array(d["user_id"], pa.int64()), 64)
        return pa.Table.from_pandas(d, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"day": "int64", "n_active": "int64", "n_new": "int64"}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        g = g[["user_id", "day"]].drop_duplicates()
        first = g.groupby("user_id")["day"].transform("min").to_numpy()
        out = pd.DataFrame({
            "day": g["day"].to_numpy(),
            "new": (g["day"].to_numpy() == first).astype(np.int64),
        }).groupby("day", as_index=False).agg(
            n_active=("new", "size"), n_new=("new", "sum"))
        return out.astype(out_cols)

    parts = (
        ds.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
    )
    out = _fold_partials(parts, ["day"], ["n_active", "n_new"])
    if out is None:
        return empty
    for c in ("day", "n_active", "n_new"):
        out[c] = out[c].astype("int64")
    out["n_returning"] = (out["n_active"] - out["n_new"]).astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def q_orders_ship_lag_histogram(sf_dir: str):
    """Fulfillment-latency distribution: the histogram of order-to-ship
    lag in whole days over every lineitem (l_shipdate day minus
    o_orderdate day) — the operational SLA curve, emitted as a
    distribution rather than a mean so the tail is visible.

    Exactness: integer day buckets (the _day_from_us float-floor, oracle
    floor(epoch/86400)); counts are exact ints. Scale shape: the q12
    tagged-union co-partitioned plan — lineitem pre-reduces to per-block
    (orderkey, ship_day, n) partials, orders ship (orderkey, order_day)
    bits, ONE stable_partition groupby co-locates each orderkey, and
    each bucket emits lag-cardinality count partials (lags span days,
    not rows); the driver folds 64 x lags rows."""
    import pandas as pd

    from ..partition import stable_partition

    n_parts = 64
    empty = _typed_empty(lag_days="int64", n_lines="int64")

    def _tagged(keys, d, n, side):
        keys = np.asarray(keys, dtype=np.int64)
        return pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "d": pa.array(np.asarray(d, dtype=np.int64), pa.int64()),
                "n": pa.array(np.asarray(n, dtype=np.int64), pa.int64()),
                "side": pa.array(np.full(len(keys), side, np.int32),
                                 pa.int32()),
                "_part": pa.array(
                    stable_partition(keys, n_parts)
                    if len(keys) else np.array([], dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    def _l_side(b: pa.Table) -> pa.Table:
        if "l_orderkey" not in b.column_names or b.num_rows == 0:
            return _tagged([], [], [], 0)
        b = b.filter(pc.is_valid(b["l_shipdate"]))
        if b.num_rows == 0:
            return _tagged([], [], [], 0)
        g = (pd.DataFrame({
                "k": b["l_orderkey"].to_numpy(zero_copy_only=False),
                "d": _day_from_us(pc.cast(b["l_shipdate"], pa.int64()))
                .to_numpy(zero_copy_only=False),
             })
             .groupby(["k", "d"], as_index=False).size())
        return _tagged(g["k"].to_numpy(np.int64),
                       g["d"].to_numpy(np.int64),
                       g["size"].to_numpy(np.int64), 0)

    def _o_side(b: pa.Table) -> pa.Table:
        if "o_orderkey" not in b.column_names or b.num_rows == 0:
            return _tagged([], [], [], 1)
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return _tagged([], [], [], 1)
        return _tagged(
            b["o_orderkey"].to_numpy(zero_copy_only=False),
            _day_from_us(pc.cast(b["o_orderdate"], pa.int64()))
            .to_numpy(zero_copy_only=False),
            np.zeros(b.num_rows, dtype=np.int64), 1)

    def _merge(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"lag_days": "int64", "n_lines": "int64"}
        li = g[g["side"] == 0]
        o = g[g["side"] == 1]
        if not len(li) or not len(o):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        m = li.merge(o[["k", "d"]], on="k", how="inner",
                     suffixes=("", "_o"))
        if not len(m):
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in out_cols.items()})
        part = (pd.DataFrame({
                    "lag_days": m["d"].to_numpy(np.int64)
                    - m["d_o"].to_numpy(np.int64),
                    "n_lines": m["n"].to_numpy(np.int64),
                })
                .groupby("lag_days", as_index=False)["n_lines"].sum())
        return part.astype(out_cols)

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]) \
        .map_batches(_l_side, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"]) \
        .map_batches(_o_side, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
    parts = (
        li.union(orders).groupby("_part")
        .map_groups(_merge, batch_format="pandas")
    )
    out = _fold_partials(parts, ["lag_days"], ["n_lines"])
    if out is None:
        return empty
    for c in ("lag_days", "n_lines"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lag_days").reset_index(drop=True)


def q_events_watermark_late(sf_dir: str, w_sec: int = 1800,
                            jitter_mod: int = 97,
                            jitter_step_sec: int = 300, n_buckets: int = 64):
    """Streaming watermark-lateness audit: per event type, how many
    events arrived more than w_sec behind the watermark — the metric a
    windowed streaming job uses to size its allowed-lateness/watermark
    delay. Arrival order is the event_id stream offset; the synthetic
    corpus arrives perfectly time-ordered, so event-time is jittered
    BACKWARDS by (event_id % jitter_mod) * jitter_step_sec seconds (300 s
    steps: the synthetic stream's ~259 s inter-arrival gap would absorb
    a smaller jitter and the audit would be degenerate) deterministically in
    BOTH engines (the pii_redaction derivation pattern) to simulate the
    late data a real collector sees. An event is late iff
    max(derived ts over all earlier arrivals) - own derived ts > w_sec.

    Exactness: pure integer epoch-us arithmetic end to end. Scale
    shape: the sequential watermark recurrence parallelizes as a prefix
    SCAN — one id-domain aggregate, range-bucket by arrival id, per-
    bucket max partials fold to an exclusive carry-in prefix (n_buckets
    values, driver-side), then each bucket computes its internal running
    max independently in one vectorized pass; only per-type (n, late)
    partials leave the buckets. Event rows shuffle once (the groupby),
    which is inherent: the oracle semantics are a global ordered window."""
    import pandas as pd
    from ray.data.aggregate import Max, Min

    empty = _typed_empty(event_type=object, n_events="int64",
                         n_late="int64")
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    w_us = int(w_sec) * 1_000_000
    jm = int(jitter_mod)
    step_us = int(jitter_step_sec) * 1_000_000

    def _derive(b: pa.Table) -> pa.Table:
        cols = {
            "event_id": pa.array([], pa.int64()),
            "tsu": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
        }
        if b.num_rows == 0 or "event_id" not in b.column_names:
            return pa.table(cols)
        ids = b["event_id"].to_numpy().astype(np.int64)
        tsu = b["ts"].cast(pa.int64()).to_numpy().astype(np.int64) \
            - (ids % jm) * step_us
        return pa.table({
            "event_id": pa.array(ids, pa.int64()),
            "tsu": pa.array(tsu, pa.int64()),
            "event_type": b["event_type"].cast(pa.string()),
        })

    der = ev.map_batches(_derive, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None).materialize()
    if der.count() == 0:
        return empty
    agg = der.aggregate(Min("event_id"), Max("event_id"))
    lo, hi = int(agg["min(event_id)"]), int(agg["max(event_id)"])
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def _bucket_max(b: pa.Table) -> pa.Table:
        cols = {"bucket": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64())}
        if b.num_rows == 0 or "event_id" not in b.column_names:
            return pa.table(cols)
        bk = (b["event_id"].to_numpy().astype(np.int64) - lo) // width
        g = (pd.DataFrame({"bucket": bk, "mx": b["tsu"].to_numpy()})
             .groupby("bucket", as_index=False)["mx"].max())
        return pa.Table.from_pandas(g, preserve_index=False)

    bmax = der.map_batches(_bucket_max, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=None).to_pandas()
    bmax = bmax.groupby("bucket")["mx"].max()
    SENTINEL = -(2 ** 62)
    maxima = np.full(n_buckets + 1, SENTINEL, dtype=np.int64)
    maxima[bmax.index.to_numpy().astype(np.int64)] = bmax.to_numpy()
    # exclusive prefix: carry[b] = max tsu over all buckets < b
    carry = np.concatenate(
        [[SENTINEL], np.maximum.accumulate(maxima[:-1])])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {
            "bucket": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "tsu": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
        }
        if b.num_rows == 0 or "event_id" not in b.column_names:
            return pa.table(cols)
        bk = (b["event_id"].to_numpy().astype(np.int64) - lo) // width
        return b.append_column("bucket", pa.array(bk, pa.int64()))

    def _late(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"event_type": pd.Series([], dtype=object),
                    "n_events": pd.Series([], dtype="int64"),
                    "n_late": pd.Series([], dtype="int64")}
        if not len(g) or "event_id" not in g.columns:
            return pd.DataFrame(out_cols)
        g = g.sort_values("event_id")
        tsu = g["tsu"].to_numpy(np.int64)
        cin = int(carry[int(g["bucket"].iloc[0])])
        prev = np.concatenate([[cin], np.maximum.accumulate(tsu)[:-1]])
        wm = np.maximum(prev, cin)
        late = wm - tsu > w_us
        out = (pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                             "late": late})
               .groupby("event_type", as_index=False)
               .agg(n_events=("late", "size"), n_late=("late", "sum")))
        for c in ("n_events", "n_late"):
            out[c] = out[c].astype("int64")
        return out

    parts = (
        der.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=None)
        .groupby("bucket").map_groups(_late, batch_format="pandas")
    )
    out = _fold_partials(parts, ["event_type"], ["n_events", "n_late"])
    if out is None:
        return empty
    for c in ("n_events", "n_late"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_tpch_q22_global_sales(sf_dir: str):
    """TPC-H Q22 shape ("global sales opportunity"): customers from seven
    country codes with above-average positive account balance and NO
    orders, grouped by country code (numcust + totacctbal) — completing
    the 22-query TPC-H suite. Adapted: testdata customer has no c_phone,
    so the country code derives as 10 + c_nationkey (TPC-H generates the
    phone prefix AS 10 + nationkey); the seven-code set mirrors Q22's
    seven literals; and because this testdata gives essentially EVERY
    customer at least one order, the anti-join is against orders in the
    final year of the date range (o_orderdate >= 2000-08-01) — Q22's
    exact shape with a recency window that keeps the predicate
    discriminating (~22% of customers qualify). Reference parity n/a
    (relational operator beyond the log parser's scope).

    Exactness: balances quantize once to integer cents (house
    floor(x*100+0.5), identical IEEE ops oracle-side) and the
    above-average filter is integer cross-multiplication
    (cents * n_pos > sum_cents — no float average; exact while
    |cents| * n_pos < 2^63, i.e. < ~9e12 positive-balance customers);
    totacctbal is CAST(sum_cents AS DOUBLE)/100 on both sides.
    Scale shape: the filtered projection folds (sum, n) per-block
    partials for the average (tiny), then qualifying customers and
    block-distinct order custkeys hash-bucket by custkey via
    stable_partition — the anti-join happens inside each bucket (a key
    lives in exactly one bucket), and buckets emit per-cntrycode
    (numcust, cents) partials only. No full-table shuffle, nothing
    customer-sized on the driver."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(cntrycode=object, numcust="int64",
                         totacctbal="float64")
    nat_keys = np.array([1, 3, 5, 7, 9, 11, 13], dtype=np.int64)
    n_parts = 64
    # microseconds since epoch of 2000-08-01T00:00:00 (the recency window)
    recent_cut_us = 965088000 * 1_000_000

    def _cust(b: pa.Table) -> pa.Table:
        cols = {
            "k": pa.array([], pa.int64()),
            "cntrycode": pa.array([], pa.string()),
            "cents": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "c_custkey" not in b.column_names:
            return pa.table(cols)
        nat = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(nat, nat_keys)
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)[m]
        return pa.table({
            "k": pa.array(
                b["c_custkey"].to_numpy(zero_copy_only=False)[m]
                .astype(np.int64), pa.int64()),
            "cntrycode": pa.array((10 + nat[m]).astype(str), pa.string()),
            "cents": pa.array(np.floor(bal * 100 + 0.5).astype(np.int64),
                              pa.int64()),
        })

    # consumed twice (average fold + qualifying scan) -> materialize
    cust = (
        _read(sf_dir, "customer",
              columns=["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(_cust, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .materialize()
    )
    if cust.count() == 0:
        return empty

    def _avg_part(b: pa.Table) -> pa.Table:
        cols = {
            "one": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "cents" not in b.column_names:
            return pa.table(cols)
        c = b["cents"].to_numpy()
        pos = c[c > 0]
        return pa.table({
            "one": pa.array([1], pa.int64()),
            "s": pa.array([int(pos.sum())], pa.int64()),
            "n": pa.array([len(pos)], pa.int64()),
        })

    agg = _fold_partials(
        cust.map_batches(_avg_part, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None),
        ["one"], ["s", "n"],
    )
    if agg is None or int(agg["n"].iloc[0]) == 0:
        # Q22's average over zero positive balances is NULL -> no rows
        return empty
    s_pos, n_pos = int(agg["s"].iloc[0]), int(agg["n"].iloc[0])

    def _qual(b: pa.Table) -> pa.Table:
        cols = {
            "k": pa.array([], pa.int64()),
            "cntrycode": pa.array([], pa.string()),
            "cents": pa.array([], pa.int64()),
            "side": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if b.num_rows == 0 or "k" not in b.column_names:
            return pa.table(cols)
        cents = b["cents"].to_numpy()
        m = cents * n_pos > s_pos
        k = b["k"].to_numpy()[m]
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "cntrycode": pa.array(
                b["cntrycode"].to_numpy(zero_copy_only=False)[m],
                pa.string()),
            "cents": pa.array(cents[m], pa.int64()),
            "side": pa.array(np.zeros(len(k), np.int64), pa.int64()),
            "_part": pa.array(stable_partition(k, n_parts), pa.int64()),
        })

    def _okeys(b: pa.Table) -> pa.Table:
        cols = {
            "k": pa.array([], pa.int64()),
            "cntrycode": pa.array([], pa.string()),
            "cents": pa.array([], pa.int64()),
            "side": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
        }
        if (b.num_rows == 0 or "o_custkey" not in b.column_names
                or "o_orderdate" not in b.column_names):
            return pa.table(cols)
        odus = pc.cast(b["o_orderdate"], pa.int64()).to_numpy()
        recent = odus >= recent_cut_us
        k = np.unique(
            b["o_custkey"].to_numpy(zero_copy_only=False)[recent]
            .astype(np.int64))
        return pa.table({
            "k": pa.array(k, pa.int64()),
            "cntrycode": pa.array([""] * len(k), pa.string()),
            "cents": pa.array(np.zeros(len(k), np.int64), pa.int64()),
            "side": pa.array(np.ones(len(k), np.int64), pa.int64()),
            "_part": pa.array(stable_partition(k, n_parts), pa.int64()),
        })

    def _anti(g: "pd.DataFrame") -> "pd.DataFrame":
        out_cols = {"cntrycode": pd.Series([], dtype=object),
                    "numcust": pd.Series([], dtype="int64"),
                    "cents": pd.Series([], dtype="int64")}
        if not len(g) or "k" not in g.columns:
            return pd.DataFrame(out_cols)
        has_order = g.loc[g["side"] == 1, "k"]
        c = g[g["side"] == 0]
        c = c[~c["k"].isin(has_order)]
        if not len(c):
            return pd.DataFrame(out_cols)
        out = c.groupby("cntrycode", as_index=False).agg(
            numcust=("k", "size"), cents=("cents", "sum"))
        for col in ("numcust", "cents"):
            out[col] = out[col].astype("int64")
        return out

    parts = (
        cust.map_batches(_qual, batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=None)
        .union(
            _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
            .map_batches(_okeys, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None))
        .groupby("_part").map_groups(_anti, batch_format="pandas")
    )
    out = _fold_partials(parts, ["cntrycode"], ["numcust", "cents"])
    if out is None or not len(out):
        return empty
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = out["cents"].astype("float64") / 100.0
    return (out[["cntrycode", "numcust", "totacctbal"]]
            .sort_values("cntrycode").reset_index(drop=True))


def q_events_autocorr_lag1(sf_dir: str):
    """Lag-1 autocorrelation of the daily event-count series — the
    serial-dependence audit that tells an ingestion pipeline whether
    day-over-day volume is momentum-driven (r1 near 1: backfill bursts,
    weekly seasonality bleeding through) or independent (r1 near 0),
    computed as Pearson over (x_t, x_{t+1}) pairs of CALENDAR-adjacent
    observed days (day_b = day_a + 1; gap days pair with nothing — the
    convention a JOIN ON b.day = a.day + 1 expresses on both sides).

    Exactness: all sums run in Python ints over the day-cardinality
    count frame (HUGEINT oracle-side; a day count can reach 1e9 at
    corpus scale, so m*sum(x^2) exceeds int64 well before the fold
    does — the BIGINT output casts fail-fast exactly where the oracle's
    CAST raises). One float expression at the end
    (num / sqrt(da_float * db_float), half-away round) identical to the
    oracle's CAST-CAST arithmetic.

    Scale shape: one (day, n) counter fold (the events_cum_daily
    partial); the driver frame is day-cardinality (~365 rows/year at
    any corpus size) and the pair sweep is one numpy mask over the
    sorted day vector."""
    import math

    import pandas as pd

    from ..util import round_half_away

    empty = _typed_empty(n_pairs="int64", num="int64", da="int64",
                         db="int64", r1="float64")

    def _day_counts(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        g = (pd.DataFrame({"day": _day_from_us(
                pc.cast(b["ts"], pa.int64())).to_numpy(
                    zero_copy_only=False)})
             .groupby("day", as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    d = _fold_partials(
        _read(sf_dir, "events", columns=["ts"])
        .map_batches(_day_counts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None),
        ["day"], ["n"],
    )
    if d is None:
        return empty
    d = d.sort_values("day").reset_index(drop=True)
    days = d["day"].to_numpy(np.int64)
    x = d["n"].to_numpy(np.int64)
    adj = days[1:] == days[:-1] + 1
    a = [int(v) for v in x[:-1][adj]]
    b = [int(v) for v in x[1:][adj]]
    m = len(a)
    if m == 0:
        return empty
    sa, sb = sum(a), sum(b)
    saa = sum(v * v for v in a)
    sbb = sum(v * v for v in b)
    sab = sum(u * v for u, v in zip(a, b))
    num = m * sab - sa * sb
    da = m * saa - sa * sa
    db = m * sbb - sb * sb
    if max(abs(num), da, db) > 2**63 - 1:
        raise OverflowError(
            "events_autocorr_lag1: pair sums exceed BIGINT at this "
            "corpus size; widen the output type on both sides")
    if da == 0 or db == 0:
        return empty
    r1 = float(round_half_away(
        np.array([float(num) / math.sqrt(float(da) * float(db))]), 6)[0])
    return pd.DataFrame({"n_pairs": pd.Series([m], dtype="int64"),
                         "num": pd.Series([num], dtype="int64"),
                         "da": pd.Series([da], dtype="int64"),
                         "db": pd.Series([db], dtype="int64"),
                         "r1": pd.Series([r1], dtype="float64")})


def q_orders_benford_digits(sf_dir: str):
    """Benford's-law first-digit audit over order totals (in cents) —
    the classic fabricated-data / export-truncation screen: a natural
    multi-magnitude money column should put ~30.1% of leading digits at
    1; a uniform or clipped synthetic source shows up immediately as a
    flat profile.

    Exactness: cents = floor(price*100 + 0.5) int64 on both sides; the
    leading digit is the first character of the decimal string (no
    log10-of-value arithmetic whose libm rounding could flip a digit at
    a power-of-ten boundary). observed_frac is one CAST-CAST divide
    (half-up round); benford_frac is round(log10((d+1)/d), 6) — the
    nine constants verified identical between DuckDB's round/log10 and
    the engine's half-up quantization (all nine sit far from .5 ties).

    Scale shape: one 9-row digit-counter fold; prices never shuffle.
    Only observed digits are emitted (a digit with zero orders appears
    on neither side)."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(digit="int64", n="int64",
                         observed_frac="float64", benford_frac="float64")

    def _digits(b: pa.Table) -> pa.Table:
        cols = {"digit": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_totalprice" not in b.column_names:
            return pa.table(cols)
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        lead = (pd.Series(cents).astype(str).str[0].astype(np.int64)
                .to_numpy())
        g = (pd.DataFrame({"digit": lead}).groupby("digit", as_index=False)
             .size().rename(columns={"size": "n"}))
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = _fold_partials(
        _read(sf_dir, "orders", columns=["o_totalprice"])
        .map_batches(_digits, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["digit"], ["n"],
    )
    if out is None:
        return empty
    total = int(out["n"].astype(object).sum())
    out = out.sort_values("digit").reset_index(drop=True)
    out["digit"] = out["digit"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["observed_frac"] = round_half_up(
        out["n"].to_numpy(np.float64) / float(total), 6)
    d = out["digit"].to_numpy(np.float64)
    out["benford_frac"] = round_half_up(np.log10((d + 1.0) / d), 6)
    return out


def q_user_type_stability(sf_dir: str):
    """Per-user behavioral stability between corpus halves: Jaccard of
    each user's event-TYPE set in the first half (event_id <= max//2,
    the corpus_drift_psi split convention) vs the second, histogrammed
    into 11 integer buckets ((10*|A∩B|) // |A∪B|: bucket 10 is an exact
    set match, which (10*i)//u reaches iff i == u). Users active in only
    one half carry no Jaccard and are excluded on both sides — the
    user-level complement to corpus_drift_psi's distribution-level
    drift.

    Exactness: pure set counting — |A∩B| = |A| + |B| - |A∪B| over
    distinct (user, type, half) triples, and the bucket id is one
    integer floor-division; no floats anywhere.

    Scale shape: batches pre-reduce to distinct (user, type, half)
    triples and hash-bucket by USER (stable_partition), so each user's
    full triple set lands in one task; buckets emit an 11-row histogram
    partial and the driver folds 64 x 11 rows. Users never reach the
    driver."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(bucket="int64", n_users="int64")

    def _mx(b: pa.Table) -> pa.Table:
        cols = {"m": pa.array([], pa.int64())}
        if b.num_rows == 0 or "event_id" not in b.column_names:
            return pa.table(cols)
        return pa.table({"m": pa.array(
            [int(b["event_id"].to_numpy().max())], pa.int64())})

    mparts = (
        _read(sf_dir, "events", columns=["event_id"])
        .map_batches(_mx, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .to_pandas()
    )
    if not len(mparts) or "m" not in mparts.columns:
        return empty
    mid = int(mparts["m"].max()) // 2

    def _triples(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "ha": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["user_id"]))
        df = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(zero_copy_only=False),
            "event_type": b["event_type"].to_pandas().to_numpy(),
            "ha": (b["event_id"].to_numpy(zero_copy_only=False)
                   <= mid).astype(np.int64),
        }).drop_duplicates()
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _hist(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"bucket": pd.Series([], dtype="int64"),
                    "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(out_cols)
        d = g.drop_duplicates(["user_id", "event_type", "ha"])
        per = d.groupby("user_id").agg(
            na=("ha", "sum"),
            n_rows=("ha", "size"),
        )
        # |A| = na, |B| = rows - na, |A∪B| = distinct types,
        # |A∩B| = |A| + |B| - |A∪B| = rows - union
        uni = (d.drop_duplicates(["user_id", "event_type"])
               .groupby("user_id").size())
        per["u"] = uni
        per["nb"] = per["n_rows"] - per["na"]
        per = per[(per["na"] > 0) & (per["nb"] > 0)]
        if not len(per):
            return pd.DataFrame(out_cols)
        i = (per["n_rows"] - per["u"]).to_numpy(np.int64)
        u = per["u"].to_numpy(np.int64)
        out = (pd.DataFrame({"bucket": (10 * i) // u})
               .groupby("bucket", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    parts = (
        _read(sf_dir, "events",
              columns=["event_id", "user_id", "event_type"])
        .map_batches(_triples, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_hist, batch_format="pandas")
    )
    out = _fold_partials(parts, ["bucket"], ["n_users"])
    if out is None:
        return empty
    out["bucket"] = out["bucket"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def q_user_activity_hill(sf_dir: str, k: int = 100):
    """Hill tail-index estimator over per-user event counts — the
    standard heavy-tail exponent estimate (alpha_hat = 1/hill) a
    capacity planner runs on user activity: hill =
    (1/k) * sum_{i=1..k} ln(x_(i) / x_(k+1)) over the k largest counts
    vs the (k+1)-th. The top-(k+1) VALUE multiset is well-defined under
    ties (contributions depend only on values), so the estimate is
    deterministic without naming which tied users are "in".

    Exactness: per-factor 1e-6-unit ln quantization (the
    corpus_drift_psi / lang_source_mi convention — counts are positive
    ints, half-up floor(x*1e6+0.5) equals the oracle's half-away
    round); sum_ln_units is exact int arithmetic, hill is ONE float
    division (sum_units / (k * 1e6), half-up round). Returns the typed
    empty frame when fewer than k+1 users exist (oracle WHERE).

    Scale shape: per-user counts fold per hash bucket (stable_partition
    by user, the distinct-shape guarantee that each user's rows land in
    one task), each bucket emits only its top-(k+1) candidate COUNTS,
    and the driver folds 64 x (k+1) ints — never the user frame."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(k="int64", x_k1="int64", sum_ln_units="int64",
                         hill="float64")

    def _counts(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["user_id"]))
        g = (pd.DataFrame({"user_id": b["user_id"].to_numpy(
                zero_copy_only=False)})
             .groupby("user_id", as_index=False).size()
             .rename(columns={"size": "n"}))
        g["_part"] = stable_partition(g["user_id"], 64)
        for c in ("n", "_part"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"n": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(out_cols)
        per = g.groupby("user_id", as_index=False)["n"].sum()
        top = per["n"].nlargest(k + 1).astype("int64")
        return pd.DataFrame({"n": top.to_numpy(np.int64)})

    parts = (
        _read(sf_dir, "events", columns=["user_id"])
        .map_batches(_counts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_topk, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "n" not in parts.columns:
        return empty
    vals = sorted((int(v) for v in parts["n"]), reverse=True)
    if len(vals) < k + 1:
        return empty
    top, x_k1 = vals[:k], vals[k]

    def _lnu(v: int) -> int:
        import math
        return int(np.floor(math.log(v) * 1e6 + 0.5))

    sum_units = sum(_lnu(v) for v in top) - k * _lnu(x_k1)
    hill = float(round_half_up(
        np.array([float(sum_units) / (k * 1e6)]), 6)[0])
    return pd.DataFrame({"k": pd.Series([k], dtype="int64"),
                         "x_k1": pd.Series([x_k1], dtype="int64"),
                         "sum_ln_units": pd.Series([sum_units],
                                                   dtype="int64"),
                         "hill": pd.Series([hill], dtype="float64")})


def q_events_cusum_shift(sf_dir: str):
    """CUSUM change-point detection on the daily event-count series:
    the split day t maximizing |cumulative-to-t minus the overall-rate
    expectation| — the standard "when did volume structurally shift"
    audit on an ingestion stream. The deviation is kept integer-scaled
    (D_t = n*prefix_t - t*total, i.e. n*total times the normalized
    CUSUM), ties broken to the EARLIEST day, and only split points
    strictly inside the series qualify (t < n; D_n = 0 by identity).

    Exactness: prefix sums and D_t run in Python ints over the
    day-cardinality frame (HUGEINT oracle-side; the BIGINT output casts
    fail-fast exactly where the oracle's CAST raises); stat is ONE
    CAST-CAST divide d_num/(n*total), half-up round.

    Scale shape: one (day, n) counter fold; the driver sweep is
    day-cardinality (~365 rows/year at any corpus size)."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(split_day="int64", d_num="int64",
                         n_days="int64", total_events="int64",
                         stat="float64")

    def _day_counts(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        g = (pd.DataFrame({"day": _day_from_us(
                pc.cast(b["ts"], pa.int64())).to_numpy(
                    zero_copy_only=False)})
             .groupby("day", as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    d = _fold_partials(
        _read(sf_dir, "events", columns=["ts"])
        .map_batches(_day_counts, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None),
        ["day"], ["n"],
    )
    if d is None or len(d) < 2:
        return empty
    d = d.sort_values("day").reset_index(drop=True)
    days = d["day"].tolist()
    xs = [int(v) for v in d["n"]]
    n, total = len(xs), sum(xs)
    best_day, best = None, -1
    pre = 0
    for t in range(1, n):  # split after position t, strictly inside
        pre += xs[t - 1]
        dt = abs(n * pre - t * total)
        if dt > best:
            best, best_day = dt, days[t - 1]
    if best > 2**63 - 1 or n * total > 2**63 - 1:
        raise OverflowError(
            "events_cusum_shift: scaled CUSUM exceeds BIGINT at this "
            "corpus size; widen the output type on both sides")
    stat = float(round_half_up(
        np.array([float(best) / float(n * total)]), 6)[0])
    return pd.DataFrame({
        "split_day": pd.Series([best_day], dtype="int64"),
        "d_num": pd.Series([best], dtype="int64"),
        "n_days": pd.Series([n], dtype="int64"),
        "total_events": pd.Series([total], dtype="int64"),
        "stat": pd.Series([stat], dtype="float64")})


def q_transition_cond_entropy(sf_dir: str):
    """Conditional entropy H(next | current) of the user event-type
    transition matrix — the information-rate diagnostic on behavior
    sequences: 0 means the next action is fully determined by the
    current one, ln(|types|) means it carries no signal. Transitions
    are the q_user_transition_counts cells (consecutive events inside a
    user's (ts, event_id)-ordered stream), so the two surfaces agree by
    construction.

    Exactness: H = sum_cells n * (ln(n_prev) - ln(n)) / total with
    per-factor 1e-6-unit ln quantization (the corpus_drift_psi
    convention); the weighted unit sum runs in Python ints (HUGEINT
    oracle-side — n * ln_units overflows int64 near 1e12 transitions,
    exactly where the oracle's BIGINT cast raises) and the entropy is
    the identical two-step CAST divide, half-up round.

    Scale shape: reuses the transition-cell pipeline (whole user per
    hash bucket, |types|^2 partials per bucket); the driver folds the
    types^2 cell frame in Python ints."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(total_transitions="int64", sum_units="int64",
                         cond_entropy="float64")
    cells = q_user_transition_counts(sf_dir)
    if not len(cells):
        return empty

    def _lnu(v: int) -> int:
        import math
        return int(np.floor(math.log(v) * 1e6 + 0.5))

    nc = cells.groupby("prev_type")["n"].transform("sum")
    total, su = 0, 0
    for n_cell, n_prev in zip(cells["n"].tolist(), nc.tolist()):
        n_cell, n_prev = int(n_cell), int(n_prev)
        total += n_cell
        su += n_cell * (_lnu(n_prev) - _lnu(n_cell))
    if su > 2**63 - 1 or total > 2**63 - 1:
        raise OverflowError(
            "transition_cond_entropy: weighted ln-unit sum exceeds "
            "BIGINT at this corpus size; widen the output type on both "
            "sides")
    h = float(round_half_up(
        np.array([float(su) / float(total) / 1e6]), 6)[0])
    return pd.DataFrame({
        "total_transitions": pd.Series([total], dtype="int64"),
        "sum_units": pd.Series([su], dtype="int64"),
        "cond_entropy": pd.Series([h], dtype="float64")})


def q_events_winsorized_mean(sf_dir: str):
    """5%/95% winsorized mean of event value per type — the robust
    central-tendency aggregate dashboards use when raw means are hostage
    to outliers: values below the 5th / above the 95th nearest-rank
    percentile are CLAMPED to those bounds (not dropped), then averaged.
    Bounds use the repo's 1-based nearest-rank convention
    (rank = GREATEST(1, (p*n)//100), the EventStats.Current shape).

    Exactness: cents = floor(value*100 + 0.5) int64 on both sides; the
    bounds come from histogram cumsums (exact order statistics), the
    clipped sum runs in Python ints over histogram cells (HUGEINT
    oracle-side, BIGINT fail-fast at the output cast), and the mean is
    one CAST-CAST divide, half-up round.

    Scale shape: one (type, cents, n) counter fold bounded by
    types x distinct cents (the value domain, not the event count);
    per-type bound-finding and clipping run vectorized on that cell
    frame."""
    import pandas as pd

    from ..util import round_half_away

    empty = _typed_empty(event_type=object, n="int64", lo_cents="int64",
                         hi_cents="int64", wins_sum_cents="int64",
                         wins_mean_cents="float64")

    def _hist(b: pa.Table) -> pa.Table:
        cols = {"event_type": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "value" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["value"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "event_type": b["event_type"].to_pandas().to_numpy(),
                "cents": np.floor(
                    b["value"].to_numpy(zero_copy_only=False) * 100.0
                    + 0.5).astype(np.int64)})
             .groupby(["event_type", "cents"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("cents", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _fold_partials(
        _read(sf_dir, "events", columns=["event_type", "value"])
        .map_batches(_hist, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["event_type", "cents"], ["n"],
    )
    if hist is None:
        return empty
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cents")
        vals = [int(v) for v in g["cents"]]
        cnts = [int(v) for v in g["n"]]
        n = sum(cnts)
        r_lo = max(1, (5 * n) // 100)
        r_hi = max(1, (95 * n) // 100)
        cum, lo, hi = 0, None, None
        for v, c in zip(vals, cnts):
            cum += c
            if lo is None and cum >= r_lo:
                lo = v
            if hi is None and cum >= r_hi:
                hi = v
        ws = sum(min(max(v, lo), hi) * c for v, c in zip(vals, cnts))
        if ws > 2**63 - 1:
            raise OverflowError(
                "events_winsorized_mean: clipped sum exceeds BIGINT; "
                "widen the output type on both sides")
        mean = float(round_half_away(
            np.array([float(ws) / float(n)]), 6)[0])
        rows.append((et, n, lo, hi, ws, mean))
    out = pd.DataFrame(rows, columns=["event_type", "n", "lo_cents",
                                      "hi_cents", "wins_sum_cents",
                                      "wins_mean_cents"])
    for c in ("n", "lo_cents", "hi_cents", "wins_sum_cents"):
        out[c] = out[c].astype("int64")
    out["wins_mean_cents"] = out["wins_mean_cents"].astype("float64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_user_activity_theil(sf_dir: str):
    """Theil index of per-user event counts — the entropy-based
    engagement-inequality diagnostic (0 = perfectly equal, ln(n_users) =
    one user generates everything), the decomposable companion to
    user_activity_gini.

    Exactness: T = [sum_i x_i*lnu(x_i) - S*lnu(S) + S*lnu(n)] /
    (1e6 * S) with per-factor 1e-6-unit ln quantization (the
    corpus_drift_psi convention) — every term is an exact Python int
    (HUGEINT oracle-side; S*lnu(S) ~ 1e13 x 3e7 exceeds int64 at corpus
    scale) with the BIGINT fail-fast at the sum_units output cast, and
    ONE half-away-rounded division (quantization can leave a tiny
    negative on perfectly-equal data, so ties must round away from
    zero like DuckDB).

    Scale shape: identical to user_activity_gini — per-block (user, n)
    partials hash-bucket by user, buckets collapse to the distinct
    COUNT-VALUE HISTOGRAM, the driver folds 64 x distinct-activity-level
    rows (never user cardinality) and the weighted ln sums run over
    that bounded histogram."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_away

    empty = _typed_empty(n_users="int64", total_events="int64",
                         sum_units="int64", theil="float64")
    ds = _read(sf_dir, "events", columns=["user_id"])

    def _partial(b: pa.Table) -> pa.Table:
        if "user_id" not in b.column_names or b.num_rows == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64()),
            })
        df = (
            b.select(["user_id"]).to_pandas()
            .groupby("user_id", as_index=False).size()
            .rename(columns={"size": "n"})
        )
        df["n"] = df["n"].astype("int64")
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"count_value": pd.Series([], dtype="int64"),
                    "m_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(out_cols)
        totals = g.groupby("user_id")["n"].sum()
        hist = totals.value_counts().sort_index()
        return pd.DataFrame({
            "count_value": hist.index.to_numpy(np.int64),
            "m_users": hist.to_numpy(np.int64),
        })

    parts = (
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_bucket_hist, batch_format="pandas")
    )
    hist = _fold_partials(parts, ["count_value"], ["m_users"])
    if hist is None:
        return empty

    def _lnu(v: int) -> int:
        return int(np.floor(np.log(np.float64(v)) * 1e6 + 0.5))

    cs = [int(v) for v in hist["count_value"]]
    ms = [int(v) for v in hist["m_users"]]
    n = sum(ms)
    s = sum(c * m for c, m in zip(cs, ms))
    num = (sum(m * c * _lnu(c) for c, m in zip(cs, ms))
           - s * _lnu(s) + s * _lnu(n))
    if abs(num) > 2**63 - 1:
        raise OverflowError(
            "user_activity_theil: weighted ln-unit sum exceeds BIGINT; "
            "the oracle's CAST raises here too")
    theil = float(round_half_away(
        np.array([float(num) / float(10**6 * s)]), 6)[0])
    return pd.DataFrame(
        {"n_users": np.array([n], np.int64),
         "total_events": np.array([s], np.int64),
         "sum_units": np.array([num], np.int64),
         "theil": np.array([theil], np.float64)}
    )


def q_events_kendall_daily(sf_dir: str):
    """Kendall tau-b between every pair of event types' DAILY volume
    series over the dense observed day range (absent days count 0) —
    the tie-robust ordinal answer to "do these two behaviors move
    together day over day", the companion to events_spearman_daily's
    volume-vs-users rho.

    Exactness: concordant/discordant/tie counts are exact integers
    (sign-product comparisons both sides — no magnitude products that
    could overflow on hot days); tau_b = (C - D) /
    sqrt((C + D + Tx) * (C + D + Ty)) with the denominator product in
    Python ints (HUGEINT oracle-side), one identical float expression
    (correctly-rounded sqrt on identical doubles), half-away round
    (tau is signed). All-tied sides are excluded on both sides.

    Scale shape: one (day, type, n) counter fold — bounded by calendar
    days x type cardinality, never event count; the driver's dense
    grid and the per-pair O(days^2) sign matrices are calendar-bounded
    (3650 days -> 13M int8 cells per pair)."""
    import pandas as pd

    from ..util import round_half_away

    empty = _typed_empty(type_a=object, type_b=object, n_days="int64",
                         concordant="int64", discordant="int64",
                         ties_a="int64", ties_b="int64", tau_b="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "day": _day_from_us(pc.cast(b["ts"], pa.int64()))
                       .to_numpy(zero_copy_only=False),
                "event_type": b["event_type"].to_pandas().to_numpy()})
             .groupby(["day", "event_type"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("day", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts", "event_type"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["day", "event_type"], ["n"],
    )
    if cells is None:
        return empty
    lo, hi = int(cells["day"].min()), int(cells["day"].max())
    days = np.arange(lo, hi + 1, dtype=np.int64)
    types = sorted(cells["event_type"].unique().tolist())
    series = {}
    for t in types:
        sub = cells[cells["event_type"] == t]
        v = np.zeros(len(days), dtype=np.int64)
        v[sub["day"].to_numpy(np.int64) - lo] = sub["n"].to_numpy(np.int64)
        series[t] = v
    rows = []
    n_days = len(days)
    for i, ta in enumerate(types):
        xa = series[ta]
        sa = np.sign(xa[:, None] - xa[None, :]).astype(np.int8)
        iu = np.triu_indices(n_days, k=1)
        sa_u = sa[iu]
        for tb in types[i + 1:]:
            xb = series[tb]
            sb_u = np.sign(xb[:, None] - xb[None, :]).astype(np.int8)[iu]
            prod = sa_u.astype(np.int16) * sb_u.astype(np.int16)
            c = int(np.count_nonzero(prod > 0))
            d = int(np.count_nonzero(prod < 0))
            tx = int(np.count_nonzero((sa_u == 0) & (sb_u != 0)))
            ty = int(np.count_nonzero((sb_u == 0) & (sa_u != 0)))
            den_a, den_b = c + d + tx, c + d + ty
            if den_a == 0 or den_b == 0:
                continue
            tau = float(round_half_away(np.array(
                [float(c - d) / np.sqrt(float(den_a * den_b))]), 6)[0])
            rows.append((ta, tb, n_days, c, d, tx, ty, tau))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_days",
                                      "concordant", "discordant",
                                      "ties_a", "ties_b", "tau_b"])
    for c in ("n_days", "concordant", "discordant", "ties_a", "ties_b"):
        out[c] = out[c].astype("int64")
    out["tau_b"] = out["tau_b"].astype("float64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def q_event_type_lift(sf_dir: str):
    """Market-basket LIFT for every unordered event-type pair — the
    association-rule strength of event_type_pairs' raw support counts:
    lift = n_both * n_users / (n_a * n_b), > 1 when two behaviors
    co-occur in the same users more than independence predicts.

    Exactness: all four inputs are exact distinct-user counts; the
    numerator and denominator products run in Python ints (HUGEINT
    oracle-side — n_a * n_b exceeds int64 past ~3e9 users) and lift is
    ONE float(num)/float(den) divide, half-up round (ratios of ints
    can hit representable .5 ties).

    Scale shape: the event_type_pairs bucket kernel extended to emit
    per-type margin counts and the bucket's user count through the SAME
    fold, tagged with an empty-string sentinel type_b (event types are
    never empty) — distinct (user, type) pairs hash-bucket by user so
    each user's type set sits whole in one task; only <= types^2 + types
    + 1 partial rows per bucket reach the driver."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(type_a=object, type_b=object, n_a="int64",
                         n_b="int64", n_both="int64", n_users="int64",
                         lift="float64")
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def _pairs(b: pa.Table) -> pa.Table:
        # Empty guard emits the INTERMEDIATE schema (q_event_type_pairs
        # convention) so empty and non-empty blocks concat cleanly.
        if "user_id" not in b.column_names:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64()),
            })
        if b.num_rows == 0:
            return b.select(["user_id", "event_type"]).append_column(
                "_part", pa.array([], pa.int64())
            )
        df = b.select(["user_id", "event_type"]).to_pandas().drop_duplicates()
        df["_part"] = stable_partition(df["user_id"], 64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"type_a": pd.Series([], dtype=object),
                    "type_b": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(out_cols)
        d = g[["user_id", "event_type"]].drop_duplicates()
        m = d.merge(d, on="user_id", suffixes=("_a", "_b"))
        m = m[m["event_type_a"] < m["event_type_b"]]
        pairs = (m.groupby(["event_type_a", "event_type_b"], as_index=False)
                 .size().rename(columns={"event_type_a": "type_a",
                                         "event_type_b": "type_b",
                                         "size": "n"}))
        margins = (d.groupby("event_type", as_index=False).size()
                   .rename(columns={"event_type": "type_a", "size": "n"}))
        margins["type_b"] = ""  # sentinel: per-type user count
        total = pd.DataFrame({"type_a": [""], "type_b": [""],
                              "n": [d["user_id"].nunique()]})
        out = pd.concat(
            [pairs, margins[["type_a", "type_b", "n"]], total],
            ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out

    parts = (
        ev.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
    )
    folded = _fold_partials(parts, ["type_a", "type_b"], ["n"])
    if folded is None:
        return empty
    n_users = int(folded.loc[(folded["type_a"] == "")
                             & (folded["type_b"] == ""), "n"].sum())
    marg = folded[(folded["type_b"] == "") & (folded["type_a"] != "")]
    counts = {r["type_a"]: int(r["n"]) for _, r in marg.iterrows()}
    pairs = folded[(folded["type_a"] != "") & (folded["type_b"] != "")]
    if not len(pairs) or n_users == 0:
        return empty
    rows = []
    for _, r in pairs.sort_values(["type_a", "type_b"]).iterrows():
        ta, tb, nb = r["type_a"], r["type_b"], int(r["n"])
        na, nbb = counts[ta], counts[tb]
        lift = float(round_half_up(
            np.array([float(nb * n_users) / float(na * nbb)]), 6)[0])
        rows.append((ta, tb, na, nbb, nb, n_users, lift))
    out = pd.DataFrame(rows, columns=["type_a", "type_b", "n_a", "n_b",
                                      "n_both", "n_users", "lift"])
    for c in ("n_a", "n_b", "n_both", "n_users"):
        out[c] = out[c].astype("int64")
    out["lift"] = out["lift"].astype("float64")
    return out.reset_index(drop=True)


def q_events_daily_jsd(sf_dir: str):
    """Per-day Jensen-Shannon divergence between the day's event-type mix
    and the GLOBAL type mix — the bounded, symmetric daily drift monitor
    (0 = the day looks like the corpus, ln2 = disjoint), the per-day
    companion to corpus_drift_psi's half-vs-half audit. Types absent on
    a day still contribute their ln2-weighted global mass, so the dense
    day x global-type grid is scored, not just observed cells.

    Exactness: JSD = su1/(2p) + su2/(2q) (in 1e-6 ln units) where
    su1 = sum_i p_i*(lnu(2*p_i*q) - lnu(p_i*q + q_i*p)) and su2 the
    q-side mirror — per-factor quantized ln over exact integer products
    (HUGEINT oracle-side; 2*p_i*q ~ 1e23 at corpus scale), weighted
    sums in Python ints with the BIGINT fail-fast at the su outputs,
    and ONE identical float expression (two divides + add + /1e6),
    half-away round.

    Scale shape: one (day, type) counter fold bounded by calendar x
    type cardinality; margins and the unit sums run on that bounded
    grid driver-side."""
    import pandas as pd

    from ..util import round_half_away

    empty = _typed_empty(day="int64", n_day="int64", su1="int64",
                         su2="int64", jsd="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "day": _day_from_us(pc.cast(b["ts"], pa.int64()))
                       .to_numpy(zero_copy_only=False),
                "event_type": b["event_type"].to_pandas().to_numpy()})
             .groupby(["day", "event_type"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("day", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts", "event_type"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["day", "event_type"], ["n"],
    )
    if cells is None:
        return empty

    def _lnu(v: int) -> int:
        return int(np.floor(np.log(np.float64(v)) * 1e6 + 0.5))

    qn = {t: int(s) for t, s in cells.groupby("event_type")["n"].sum().items()}
    q = sum(qn.values())
    pn_by_day = {}
    for (day, t), s in cells.groupby(["day", "event_type"])["n"].sum().items():
        pn_by_day.setdefault(int(day), {})[t] = int(s)
    rows = []
    for day in sorted(pn_by_day):
        pmap = pn_by_day[day]
        p = sum(pmap.values())
        su1, su2 = 0, 0
        for t, qv in qn.items():
            pv = pmap.get(t, 0)
            den = pv * q + qv * p
            if pv > 0:
                su1 += pv * (_lnu(2 * pv * q) - _lnu(den))
            su2 += qv * (_lnu(2 * qv * p) - _lnu(den))
        if abs(su1) > 2**63 - 1 or abs(su2) > 2**63 - 1:
            raise OverflowError(
                "events_daily_jsd: weighted ln-unit sum exceeds BIGINT; "
                "the oracle's CAST raises here too")
        jsd = float(round_half_away(np.array(
            [(float(su1) / float(2 * p) + float(su2) / float(2 * q))
             / 1e6]), 6)[0])
        rows.append((day, p, su1, su2, jsd))
    out = pd.DataFrame(rows, columns=["day", "n_day", "su1", "su2", "jsd"])
    for c in ("day", "n_day", "su1", "su2"):
        out[c] = out[c].astype("int64")
    out["jsd"] = out["jsd"].astype("float64")
    return out.reset_index(drop=True)


def q_nation_revenue_hhi(sf_dir: str,
                         max_supplier_broadcast: int = 20_000_000):
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation — the market-concentration diagnostic (1/n_suppliers =
    perfectly even, 1.0 = one supplier takes everything) over discounted
    lineitem revenue (the Q5 cents convention: floor(extendedprice *
    (1-discount) * 100 + 0.5) per line).

    Exactness: HHI = sum_s cents_s^2 / (sum_s cents_s)^2 is a pure
    ratio of integers — per-supplier global cents are exact Python-int
    bucket sums (the oracle's per-supplier BIGINT CAST mirrored by a
    fail-fast), squared in PYTHON ints; cents^2 exceeds BIGINT even at
    small SFs, so sumsq ships between stages AND to the output as a
    DECIMAL STRING (HUGEINT + VARCHAR cast oracle-side, fail-fast at
    the 2^127 HUGEINT bound); hhi is one float(num)/float(den) divide
    (HUGEINT square oracle-side), half-up round.

    Scale shape: lineitem pre-reduces to per-block (suppkey, cents)
    partials, hash-buckets by suppkey so each supplier's global total
    lives in one task; the supplier->nation lookup is the Q5 broadcast
    (sorted arrays, fail-fast bound); buckets emit one row per
    (bucket, nation) and the driver folds 64 x 25 rows."""
    import pandas as pd
    import pyarrow.parquet as pq_
    import ray

    from ..broadcast import broadcast_get
    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(n_name=object, n_suppliers="int64",
                         total_cents="int64", sumsq_cents=object,
                         hhi="float64")
    nat = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    sup_ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    n_sup = sup_ds.count()  # parquet metadata, no materialization
    if n_sup == 0:
        return empty
    if n_sup > max_supplier_broadcast:
        raise ValueError(
            f"nation_revenue_hhi: {n_sup} suppliers exceed the broadcast "
            f"bound {max_supplier_broadcast}; route the nation lookup "
            "through a co-partitioned join instead")
    sup = sup_ds.to_pandas().sort_values("s_suppkey")
    sup_ref = ray.put((sup["s_suppkey"].to_numpy(np.int64),
                       sup["s_nationkey"].to_numpy(np.int64)))
    I64MAX = 2**63 - 1

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"suppkey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_suppkey" not in b.column_names:
            return pa.table(cols)
        cents = _cents(pc.multiply(
            b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])))
        g = (pd.DataFrame({
                "suppkey": b["l_suppkey"].to_numpy(zero_copy_only=False)
                           .astype(np.int64),
                "cents": cents.to_numpy(zero_copy_only=False)})
             .groupby("suppkey", as_index=False)["cents"].sum())
        g["cents"] = g["cents"].astype("int64")
        g["_part"] = stable_partition(g["suppkey"], 64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"nationkey": pd.Series([], dtype="int64"),
                    "n_sup": pd.Series([], dtype="int64"),
                    "total": pd.Series([], dtype="int64"),
                    "sq_str": pd.Series([], dtype=object)}
        if not len(g) or "suppkey" not in g.columns:
            return pd.DataFrame(out_cols)
        ks, ns = broadcast_get(sup_ref)
        # Per-supplier totals in object-dtype Python ints: the oracle's
        # per-supplier CAST(SUM(...) AS BIGINT) raises on overflow, an
        # int64 groupby sum would silently wrap instead.
        gg = g[["suppkey", "cents"]].copy()
        gg["cents"] = gg["cents"].astype(object)
        per_sup = gg.groupby("suppkey", as_index=False)["cents"].sum()
        if any(int(v) > I64MAX for v in per_sup["cents"]):
            raise OverflowError(
                "nation_revenue_hhi: a supplier's revenue exceeds BIGINT; "
                "the oracle's CAST raises here too")
        per_sup["cents"] = per_sup["cents"].astype("int64")
        idx = np.searchsorted(ks, per_sup["suppkey"].to_numpy(np.int64))
        idx = np.clip(idx, 0, max(len(ks) - 1, 0))
        nk = ns[idx]
        rows = []
        for nkey, sub in per_sup.assign(nk=nk).groupby("nk"):
            cs = [int(v) for v in sub["cents"].tolist()]
            # cents^2 exceeds BIGINT even at small SFs (3e9 cents per
            # supplier squares past 2^63), so the partial ships as a
            # DECIMAL STRING (the CLAUDE.md big-int transport
            # alternative; limbs cap out at 2^93).
            sq = sum(v * v for v in cs)
            rows.append((int(nkey), len(cs), sum(cs), str(sq)))
        out = pd.DataFrame(rows, columns=["nationkey", "n_sup", "total",
                                          "sq_str"])
        for c in ("nationkey", "n_sup", "total"):
            out[c] = out[c].astype("int64")
        return out

    parts = (
        _read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts) or "nationkey" not in parts.columns:
        return empty
    rows = []
    for nkey, g in parts.groupby("nationkey"):
        n_s = sum(int(v) for v in g["n_sup"])
        total = sum(int(v) for v in g["total"])
        sq = sum(int(s) for s in g["sq_str"])
        if total > I64MAX:
            raise OverflowError(
                "nation_revenue_hhi: total revenue exceeds BIGINT; the "
                "oracle's CAST raises here too")
        if sq > 2**127 - 1:
            raise OverflowError(
                "nation_revenue_hhi: sum of squares exceeds HUGEINT; the "
                "oracle's SUM raises here too")
        if total <= 0:
            continue
        hhi = float(round_half_up(
            np.array([float(sq) / float(total * total)]), 6)[0])
        rows.append((names.get(int(nkey), "unknown"), n_s, total,
                     str(sq), hhi))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["n_name", "n_suppliers",
                                      "total_cents", "sumsq_cents", "hhi"])
    for c in ("n_suppliers", "total_cents"):
        out[c] = out[c].astype("int64")
    out["hhi"] = out["hhi"].astype("float64")
    return out.sort_values("n_name").reset_index(drop=True)


def q_user_transition_trigrams(sf_dir: str, topk: int = 20):
    """Second-order behavioral n-grams: the ``topk`` most frequent
    (A -> B -> C) event-type TRIGRAMS inside users' (ts, event_id)-ordered
    streams, summed over all users — the 3-gram extension of
    user_transition_counts' Markov matrix, the feature op for
    sequence-model training data.

    Scale shape: the sessionize pattern — hash-bucket users whole, ONE
    lexsort per bucket, trigrams from two vectorized shift compares;
    only (t1, t2, t3, n) partials (<= |types|^3 per bucket) leave the
    buckets. The driver folds 64 x |types|^3 rows, takes the global head
    by (n DESC, t1, t2, t3) — exact because cells fold completely before
    ranking."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(t1=object, t2=object, t3=object, n="int64")
    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"])

    def _tag(b: pa.Table) -> pa.Table:
        if "user_id" not in b.column_names:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64()),
            })
        return pa.table({
            "user_id": b["user_id"],
            "us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
            "_part": pa.array(stable_partition(b["user_id"], 64),
                              pa.int64()),
        })

    def _tri(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"t1": pd.Series([], dtype=object),
                    "t2": pd.Series([], dtype=object),
                    "t3": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(out_cols)
        o = np.lexsort((g["event_id"].to_numpy(), g["us"].to_numpy(),
                        g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy()[o]
        et = g["event_type"].to_numpy()[o]
        if len(u) < 3:
            return pd.DataFrame(out_cols)
        same = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        out = (pd.DataFrame({"t1": et[:-2][same], "t2": et[1:-1][same],
                             "t3": et[2:][same]})
               .groupby(["t1", "t2", "t3"], as_index=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    cells = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_tri, batch_format="pandas"),
        ["t1", "t2", "t3"], ["n"],
    )
    if cells is None:
        return empty
    cells["n"] = cells["n"].astype("int64")
    out = (cells.sort_values(["n", "t1", "t2", "t3"],
                             ascending=[False, True, True, True])
           .head(topk).reset_index(drop=True))
    return out


def q_orders_interpurchase_p50(sf_dir: str):
    """Inter-purchase gap percentiles: the p50/p90 of day gaps between a
    customer's CONSECUTIVE orders, pooled over all customers — the
    repurchase-cadence KPI behind churn-window and CLV models. Gaps use
    the repo's 1-based nearest-rank convention (EventStats.Current
    shape); same-day repeat orders contribute gap 0.

    Exactness: order days are the floor(epoch_us/86400e6) ints, gaps
    are differences of sorted per-customer day multisets (tie order
    between equal days cannot change the diff multiset), and the
    percentiles come from exact histogram cumsums.

    Scale shape: orders hash-bucket by customer (whole customer per
    task), one lexsort + shift-diff per bucket, and only (gap_days, n)
    HISTOGRAM cells — bounded by the distinct-gap domain, never order
    count — leave the buckets; the driver folds that histogram and
    walks its cumsum."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(n_gaps="int64", p50_days="int64",
                         p90_days="int64")
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def _tag(b: pa.Table) -> pa.Table:
        if "o_custkey" not in b.column_names:
            return pa.table({
                "cust": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64()),
            })
        return pa.table({
            "cust": pc.cast(b["o_custkey"], pa.int64()),
            "day": _day_from_us(pc.cast(b["o_orderdate"], pa.int64())),
            "_part": pa.array(stable_partition(b["o_custkey"], 64),
                              pa.int64()),
        })

    def _gaps(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"gap_days": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64")}
        if not len(g) or "cust" not in g.columns:
            return pd.DataFrame(out_cols)
        o = np.lexsort((g["day"].to_numpy(), g["cust"].to_numpy()))
        cu = g["cust"].to_numpy()[o]
        dy = g["day"].to_numpy()[o]
        if len(cu) < 2:
            return pd.DataFrame(out_cols)
        same = cu[1:] == cu[:-1]
        gaps = (dy[1:] - dy[:-1])[same]
        if not len(gaps):
            return pd.DataFrame(out_cols)
        out = (pd.DataFrame({"gap_days": gaps})
               .groupby("gap_days", as_index=False).size()
               .rename(columns={"size": "n"}))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    hist = _fold_partials(
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_gaps, batch_format="pandas"),
        ["gap_days"], ["n"],
    )
    if hist is None:
        return empty
    hist = hist.sort_values("gap_days").reset_index(drop=True)
    gs = [int(v) for v in hist["gap_days"]]
    cs = [int(v) for v in hist["n"]]
    n = sum(cs)
    r50 = max(1, (50 * n) // 100)
    r90 = max(1, (90 * n) // 100)
    cum, p50, p90 = 0, None, None
    for gv, cv in zip(gs, cs):
        cum += cv
        if p50 is None and cum >= r50:
            p50 = gv
        if p90 is None and cum >= r90:
            p90 = gv
    return pd.DataFrame({"n_gaps": np.array([n], np.int64),
                         "p50_days": np.array([p50], np.int64),
                         "p90_days": np.array([p90], np.int64)})


def q_slowlog_rows_efficiency(sf_dir: str):
    """Per-class index-efficiency audit over the REAL slow-log pipeline
    (parse -> fingerprint -> class): efficiency = sum(Rows_sent) /
    sum(Rows_examined) — the classic "is this query class scanning far
    more rows than it returns" DBA screen the reference's per-class
    metric tables feed (event.go NumberMetrics; stats semantics per
    stats.go:64-83).

    Exactness: both sums are exact int64 (rows_* parse as integers;
    <= ~10 per event so 1e12 events stays under 1e13), efficiency is ONE
    float(num)/float(den) divide rounded half-up at 6dp (ratio-of-ints
    rule); classes whose examined total is 0 are excluded on both sides
    (HAVING > 0) rather than emitting a NULL-vs-NaN hash hazard.

    Scale shape: per-block integer partials (class x 3 counters) fold on
    the driver — bounded by class cardinality x blocks, never events."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(class_id=object, n_queries="int64",
                         sum_sent="int64", sum_examined="int64",
                         efficiency="float64")
    ev = _flat_events(sf_dir)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "class_id": pa.array([], pa.string()),
            "n_queries": pa.array([], pa.int64()),
            "sum_sent": pa.array([], pa.int64()),
            "sum_examined": pa.array([], pa.int64()),
        }
        if "class_id" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        df = pd.DataFrame({
            "class_id": b["class_id"].to_pandas(),
            "sent": b["rows_sent"].to_numpy(zero_copy_only=False),
            "exam": b["rows_examined"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("class_id", as_index=False).agg(
            n_queries=("sent", "size"), sum_sent=("sent", "sum"),
            sum_examined=("exam", "sum"),
        )
        for c in ("n_queries", "sum_sent", "sum_examined"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = _fold_partials(
        ev.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["class_id"], ["n_queries", "sum_sent", "sum_examined"],
    )
    if out is None:
        return empty
    out = out[out["sum_examined"] > 0].reset_index(drop=True)
    if not len(out):
        return empty
    out["efficiency"] = round_half_up(
        [float(int(s)) / float(int(x))
         for s, x in zip(out["sum_sent"], out["sum_examined"])], 6)
    for c in ("n_queries", "sum_sent", "sum_examined"):
        out[c] = out[c].astype("int64")
    return out.sort_values("class_id").reset_index(drop=True)[
        ["class_id", "n_queries", "sum_sent", "sum_examined", "efficiency"]
    ]


def q_slowlog_qt_regression(sf_dir: str):
    """Per-class Query_time DRIFT between the first and second half of
    the corpus (split at the doc_id midpoint — the ingest-order proxy a
    rotating log shipper gives you): mean_qt(second) - mean_qt(first),
    the "which query classes got slower" regression screen run after
    every deploy.

    Exactness: Query_time is (n_chars % 128)/4 by construction, so
    qt * 4 is an exact integer in BOTH the parsed float and the oracle's
    closed form — all sums are quarter-unit int64; the drift is the ONE
    divide (su2*n1 - su1*n2) / (4*n1*n2) with numerator/denominator in
    Python ints (HUGEINT oracle-side: n1*n2 alone exceeds int64 past
    ~3e9 events per half) rounded half-AWAY at 6dp (drift is signed).
    Classes missing from either half are excluded on both sides.

    Scale shape: one cheap Min/Max aggregate over the pruned doc_id
    column picks the split point; the parse stream folds per-block
    (class x half) integer partials — class-cardinality-bounded, never
    event-bounded; nothing but the split scalar is broadcast."""
    import pandas as pd

    from ray.data.aggregate import Max, Min

    from ..util import round_half_away

    empty = _typed_empty(class_id=object, n_first="int64",
                         n_second="int64", su_first="int64",
                         su_second="int64", qt_drift="float64")
    bounds = _read(sf_dir, "documents", columns=["doc_id"]).aggregate(
        Min("doc_id"), Max("doc_id")
    )
    lo, hi = bounds.get("min(doc_id)"), bounds.get("max(doc_id)")
    if lo is None or hi is None:
        return empty
    mid = (int(lo) + int(hi)) // 2

    ev = _flat_events(sf_dir)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {
            "class_id": pa.array([], pa.string()),
            "half": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "su": pa.array([], pa.int64()),
        }
        if "class_id" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        qt = b["query_time"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "class_id": b["class_id"].to_pandas(),
            "half": (pc.cast(b["doc_id"], pa.int64())
                     .to_numpy(zero_copy_only=False)
                     > mid).astype(np.int64),
            "u": np.round(qt * 4.0).astype(np.int64),
        })
        g = df.groupby(["class_id", "half"], as_index=False).agg(
            n=("u", "size"), su=("u", "sum"))
        for c in ("half", "n", "su"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = _fold_partials(
        ev.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["class_id", "half"], ["n", "su"],
    )
    if parts is None:
        return empty
    wide = parts.pivot_table(index="class_id", columns="half",
                             values=["n", "su"], fill_value=0,
                             aggfunc="sum")
    rows = []
    for cid in wide.index:
        n1 = int(wide.at[cid, ("n", 0)]) if ("n", 0) in wide.columns else 0
        n2 = int(wide.at[cid, ("n", 1)]) if ("n", 1) in wide.columns else 0
        if n1 == 0 or n2 == 0:
            continue
        s1 = int(wide.at[cid, ("su", 0)])
        s2 = int(wide.at[cid, ("su", 1)])
        num = s2 * n1 - s1 * n2
        den = 4 * n1 * n2
        drift = float(round_half_away(
            np.array([float(num) / float(den)]), 6)[0])
        rows.append((cid, n1, n2, s1, s2, drift))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["class_id", "n_first", "n_second",
                                      "su_first", "su_second", "qt_drift"])
    for c in ("n_first", "n_second", "su_first", "su_second"):
        out[c] = out[c].astype("int64")
    out["qt_drift"] = out["qt_drift"].astype("float64")
    return out.sort_values("class_id").reset_index(drop=True)


_FK_EDGES = [
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]


def q_fk_orphans_audit(sf_dir: str, n_parts: int = 64):
    """Referential-integrity audit over every foreign-key edge of the
    warehouse star: per edge, total child rows and the number whose key
    has NO parent row — the load-validation gate a real pipeline runs
    before letting a partition into the join layer.

    Scale shape: ALL six edges ride ONE shuffle — each table is read once
    with only its key columns, child blocks fold to (edge, key, n)
    counter partials and parent blocks to deduped (edge, key) membership
    rows, everything hash-buckets by the (edge, key) PAIR
    (stable_pair_partition, so a key's partials and its parent membership
    land in the same task) and each bucket emits two counters per edge.
    Nothing key-cardinality-sized touches the driver (64 x 6 x 2 rows).
    Child keys are assumed non-null (the warehouse contract; a NULL key
    would count as an orphan oracle-side).

    Always emits one row per edge (zero counts on empty input) to match
    the oracle's scalar-aggregate contract."""
    import pandas as pd

    from ..partition import stable_pair_partition

    def _table_stream(table: str, child_edges, parent_edges):
        cols = sorted({c for _, c in child_edges}
                      | {c for _, c in parent_edges})
        ds = _read(sf_dir, table, columns=cols)

        def _fn(b: pa.Table) -> pa.Table:
            out = {"edge": [], "key": [], "n": [], "side": []}
            frames = []
            if b.num_rows and cols[0] in b.column_names:
                for eid, col in child_edges:
                    g = (pd.DataFrame(
                            {"key": pc.cast(b[col], pa.int64())
                                    .to_numpy(zero_copy_only=False)})
                         .groupby("key", as_index=False).size()
                         .rename(columns={"size": "n"}))
                    g["edge"] = np.int64(eid)
                    g["side"] = np.int64(0)
                    frames.append(g)
                for eid, col in parent_edges:
                    k = np.unique(pc.cast(b[col], pa.int64())
                                  .to_numpy(zero_copy_only=False))
                    frames.append(pd.DataFrame(
                        {"key": k,
                         "n": np.zeros(len(k), np.int64),
                         "edge": np.full(len(k), eid, np.int64),
                         "side": np.ones(len(k), np.int64)}))
            if not frames:
                df = pd.DataFrame({k: pd.Series([], dtype="int64")
                                   for k in out})
            else:
                df = pd.concat(frames, ignore_index=True)[
                    ["edge", "key", "n", "side"]]
                for c in df.columns:
                    df[c] = df[c].astype("int64")
            df["_part"] = (stable_pair_partition(
                df["edge"].to_numpy(), df["key"].to_numpy(), n_parts)
                if len(df) else pd.Series([], dtype="int64"))
            return pa.Table.from_pandas(df, preserve_index=False)

        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)

    by_table: dict = {}
    for eid, (_, ct, cc, pt, pc_) in enumerate(_FK_EDGES):
        by_table.setdefault(ct, ([], []))[0].append((eid, cc))
        by_table.setdefault(pt, ([], []))[1].append((eid, pc_))
    streams = [_table_stream(t, ch, pr) for t, (ch, pr) in by_table.items()]
    unioned = streams[0].union(*streams[1:])

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"edge": pd.Series([], dtype="int64"),
                "n_child": pd.Series([], dtype="int64"),
                "n_orphans": pd.Series([], dtype="int64")}
        if not len(g) or "edge" not in g.columns:
            return pd.DataFrame(cols)
        rows = []
        for eid, sub in g.groupby("edge"):
            ch = sub[sub["side"] == 0]
            parents = sub.loc[sub["side"] == 1, "key"]
            n_child = int(ch["n"].sum())
            miss = ~ch["key"].isin(parents)
            rows.append((int(eid), n_child, int(ch.loc[miss, "n"].sum())))
        return pd.DataFrame(rows, columns=["edge", "n_child", "n_orphans"])

    folded = _fold_partials(
        unioned.groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["edge"], ["n_child", "n_orphans"],
    )
    names = [e[0] for e in _FK_EDGES]
    out = pd.DataFrame({"edge": names,
                        "n_child": np.zeros(len(names), np.int64),
                        "n_orphans": np.zeros(len(names), np.int64)})
    if folded is not None:
        m = {int(e): (int(c), int(o)) for e, c, o in zip(
            folded["edge"], folded["n_child"], folded["n_orphans"])}
        for i in range(len(names)):
            if i in m:
                out.loc[i, "n_child"], out.loc[i, "n_orphans"] = m[i]
    for c in ("n_child", "n_orphans"):
        out[c] = out[c].astype("int64")
    return out.sort_values("edge").reset_index(drop=True)


def q_orders_totalprice_audit(sf_dir: str, n_parts: int = 64):
    """Cross-table consistency audit: recompute each order's total from
    its lines (sum of round-to-cents l_extendedprice * (1 + l_tax) *
    (1 - l_discount), the TPC-H o_totalprice identity) and compare with
    the stored o_totalprice — the "did the loader corrupt the rollup"
    reconciliation check. Reports orders checked, mismatch count, max
    and total absolute drift in cents.

    Exactness: both sides round each line/total to cents with the SAME
    floor(x*100+0.5) on identically-associated double products, so every
    compared quantity is an exact int64; the global |diff| total is
    accumulated per bucket in 2^20-row chunks (chunk sums stay ~5e13,
    far inside int64) combined in Python ints and shipped as hi/lo
    limbs, with the BIGINT fail-fast at the output cast exactly where
    the oracle's CAST raises.

    Scale shape: lineitem folds to per-(block, order) cents partials,
    partials AND the (o_orderkey, expected) pairs hash-bucket by
    orderkey through ONE shuffle, each bucket collapses and compares its
    whole orders locally and emits 5 counters; the driver folds 64 rows.
    Orders with no lines are out of scope (fk_orphans_audit owns
    missing-parent lines)."""
    import pandas as pd

    from ..partition import stable_partition

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_tax"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _child(b: pa.Table) -> pa.Table:
        cols = {"key": pa.array([], pa.int64()),
                "a": pa.array([], pa.int64()),
                "side": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return pa.table(cols)
        v = pc.multiply(
            pc.multiply(b["l_extendedprice"], pc.add(1.0, b["l_tax"])),
            pc.subtract(1.0, b["l_discount"]))
        df = pd.DataFrame({
            "key": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "a": _cents(v).to_numpy(zero_copy_only=False)})
        g = df.groupby("key", as_index=False)["a"].sum()
        g["side"] = np.int64(0)
        for c in ("key", "a", "side"):
            g[c] = g[c].astype("int64")
        g["_part"] = stable_partition(g["key"], n_parts)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _parent(b: pa.Table) -> pa.Table:
        cols = {"key": pa.array([], pa.int64()),
                "a": pa.array([], pa.int64()),
                "side": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_orderkey" not in b.column_names:
            return pa.table(cols)
        df = pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(zero_copy_only=False),
            "a": _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)})
        df["side"] = np.int64(1)
        for c in df.columns:
            df[c] = df[c].astype("int64")
        df["_part"] = stable_partition(df["key"], n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    unioned = li.map_batches(
        _child, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).union(orders.map_batches(
        _parent, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ))

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_orders": pd.Series([], dtype="int64"),
                "n_mismatch": pd.Series([], dtype="int64"),
                "max_abs": pd.Series([], dtype="int64"),
                "sum_hi": pd.Series([], dtype="int64"),
                "sum_lo": pd.Series([], dtype="int64")}
        if not len(g) or "side" not in g.columns:
            return pd.DataFrame(cols)
        rec = (g[g["side"] == 0].groupby("key", as_index=False)["a"].sum()
               .rename(columns={"a": "recomputed"}))
        exp = (g[g["side"] == 1][["key", "a"]]
               .rename(columns={"a": "expected"}))
        j = rec.merge(exp, on="key", how="inner")
        if not len(j):
            return pd.DataFrame(cols)
        diff = np.abs(j["expected"].to_numpy(np.int64)
                      - j["recomputed"].to_numpy(np.int64))
        total = 0
        for i in range(0, len(diff), 1 << 20):
            total += int(diff[i:i + (1 << 20)].sum())
        return pd.DataFrame({
            "n_orders": np.array([len(j)], np.int64),
            "n_mismatch": np.array([int(np.count_nonzero(diff))], np.int64),
            "max_abs": np.array([int(diff.max())], np.int64),
            "sum_hi": np.array([total >> 30], np.int64),
            "sum_lo": np.array([total & ((1 << 30) - 1)], np.int64),
        })

    parts = unioned.groupby("_part").map_groups(
        _bucket, batch_format="pandas").to_pandas()
    if not len(parts) or "n_orders" not in parts.columns:
        parts = pd.DataFrame({c: [0] for c in
                              ("n_orders", "n_mismatch", "max_abs",
                               "sum_hi", "sum_lo")})
    total_abs = ((int(parts["sum_hi"].astype(object).sum()) << 30)
                 + int(parts["sum_lo"].astype(object).sum()))
    if total_abs > 2**63 - 1:
        raise OverflowError(
            "orders_totalprice_audit: |diff| total exceeds BIGINT; the "
            "oracle's CAST raises here too")
    return pd.DataFrame({
        "n_orders": np.array([int(parts["n_orders"].sum())], np.int64),
        "n_mismatch": np.array([int(parts["n_mismatch"].sum())], np.int64),
        "max_abs_diff": np.array([int(parts["max_abs"].max())
                                  if len(parts) else 0], np.int64),
        "sum_abs_diff": np.array([total_abs], np.int64),
    })


def _daily_total_counts(sf_dir: str):
    """(day, n) fold of the events table over the dense observed day
    range — shared by the trend/runs screens. Returns (days_array,
    counts_array) with absent days = 0, or None over empty input;
    everything after the fold is calendar-bounded."""
    def _cells(b: pa.Table) -> pa.Table:
        import pandas as pd

        cols = {"day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "day": _day_from_us(pc.cast(b["ts"], pa.int64()))
                       .to_numpy(zero_copy_only=False)})
             .groupby("day", as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("day", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["day"], ["n"],
    )
    if cells is None:
        return None
    lo, hi = int(cells["day"].min()), int(cells["day"].max())
    days = np.arange(lo, hi + 1, dtype=np.int64)
    x = np.zeros(len(days), dtype=np.int64)
    x[cells["day"].to_numpy(np.int64) - lo] = cells["n"].to_numpy(np.int64)
    return days, x


def q_events_mann_kendall(sf_dir: str):
    """Mann-Kendall monotone-trend test on total daily event volume over
    the dense day grid (absent days = 0) — the nonparametric "is traffic
    drifting up or down" screen, tie-corrected (zero-days tie heavily).

    Exactness: S = sum_{i<j} sign(x_j - x_i) and the tie-corrected
    18*Var(S) = n(n-1)(2n+5) - sum_t t(t-1)(2t+5) are exact integers
    (calendar-bounded: n^3 at 10 years is ~5e10, far inside int64); the
    continuity-corrected z is one identical float expression both sides
    ((S -/+ 1) / sqrt(var18 / 18.0)), half-away (signed).

    Scale shape: one (day, n) counter fold, everything after is
    calendar-bounded driver math (O(days^2) sign matrix)."""
    import pandas as pd

    from ..util import round_half_away

    empty = _typed_empty(n_days="int64", s_stat="int64", var18="int64",
                         z="float64")
    dx = _daily_total_counts(sf_dir)
    if dx is None:
        return empty
    _, x = dx
    n = len(x)
    s = int(np.sign(x[None, :] - x[:, None])[
        np.triu_indices(n, k=1)].astype(np.int64).sum())
    _, tie_sizes = np.unique(x, return_counts=True)
    var18 = int(n) * (n - 1) * (2 * n + 5) - sum(
        int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in tie_sizes)
    if var18 <= 0:
        z = 0.0
    elif s > 0:
        z = float(s - 1) / np.sqrt(float(var18) / 18.0)
    elif s < 0:
        z = float(s + 1) / np.sqrt(float(var18) / 18.0)
    else:
        z = 0.0
    z = float(round_half_away(np.array([z]), 6)[0])
    return pd.DataFrame({"n_days": np.array([n], np.int64),
                         "s_stat": np.array([s], np.int64),
                         "var18": np.array([var18], np.int64),
                         "z": np.array([z], np.float64)})


def q_events_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test on total daily event volume vs its
    nearest-rank median over the dense day grid — the randomness screen
    that catches regime clustering (long stretches above/below median)
    a trend test misses. Days equal to the median are excluded (the
    standard convention).

    Exactness: the median is the repo's nearest-rank value
    (rank max(1, 50n//100) on the ascending days), runs/n_above/n_below
    are exact integers; expected_runs = (N + 2ab)/N and ratio =
    runs*N/(N + 2ab) are each ONE ratio-of-ints divide, half-up.

    Scale shape: same single (day, n) fold; the run-length scan is a
    vectorized diff over the calendar-bounded series."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(n_used="int64", n_above="int64", n_below="int64",
                         runs="int64", expected_runs="float64",
                         ratio="float64")
    dx = _daily_total_counts(sf_dir)
    if dx is None:
        return empty
    _, x = dx
    srt = np.sort(x)
    med = int(srt[max(1, (50 * len(x)) // 100) - 1])
    keep = x[x != med]
    above = keep > med
    n1 = int(np.count_nonzero(above))
    n2 = int(len(keep) - n1)
    if n1 == 0 or n2 == 0:
        return empty
    runs = 1 + int(np.count_nonzero(above[1:] != above[:-1]))
    nn = n1 + n2
    e_num = nn + 2 * n1 * n2
    expected = float(round_half_up(
        np.array([float(e_num) / float(nn)]), 6)[0])
    ratio = float(round_half_up(
        np.array([float(runs * nn) / float(e_num)]), 6)[0])
    return pd.DataFrame({"n_used": np.array([nn], np.int64),
                         "n_above": np.array([n1], np.int64),
                         "n_below": np.array([n2], np.int64),
                         "runs": np.array([runs], np.int64),
                         "expected_runs": np.array([expected], np.float64),
                         "ratio": np.array([ratio], np.float64)})


def q_events_value_anova(sf_dir: str):
    """One-way ANOVA F-statistic of value across event types — the
    k-group generalization of ab_value_ttest: "does mean spend differ
    by behavior at all" before pairwise drilldowns.

    Exactness: per-type (n, sum_cents) and per-block sum-of-squares ride
    as exact integers (cents^2 partials ship as hi/lo int64 LIMBS — a
    block's sumsq passes int64 at ~1e5 rows x (1e7 cents)^2); the
    between/within decomposition quantizes each S_g^2/n_g and S^2/N to
    1e-6 units with ONE identical float expression per group (HUGEINT ->
    DOUBLE is correctly rounded on both sides), after which
    F = (N-k)(A - g) / ((k-1)(Q*1e6 - A)) is ONE divide of exact Python
    ints (HUGEINT oracle-side).

    Scale shape: one (type x 4-counter) fold, bounded by type
    cardinality x blocks; nothing row-sized leaves the map stage."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(n_groups="int64", n_total="int64",
                         f_stat="float64")

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "q_hi": pa.array([], pa.int64()),
                "q_lo": pa.array([], pa.int64())}
        if b.num_rows == 0 or "value" not in b.column_names:
            return pa.table(cols)
        df = pd.DataFrame({
            "event_type": b["event_type"].to_pandas(),
            "c": _cents(b["value"]).to_numpy(zero_copy_only=False)})
        g = df.groupby("event_type")["c"]
        out = pd.DataFrame({
            "event_type": g.size().index,
            "n": g.size().to_numpy(np.int64),
            "s": g.sum().to_numpy(np.int64)})
        # squares in object ints: a max-cents row already nears int64 when
        # squared, so the sumsq partial is exact-arbitrary-precision and
        # ships as hi/lo limbs (CLAUDE.md big-int transport rule)
        sq = df.assign(c2=df["c"].astype(object) * df["c"].astype(object))
        q_tot = sq.groupby("event_type")["c2"].sum()
        out["q_hi"] = [int(v) >> 30 for v in q_tot.to_numpy()]
        out["q_lo"] = [int(v) & ((1 << 30) - 1) for v in q_tot.to_numpy()]
        for c in ("n", "s", "q_hi", "q_lo"):
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = _fold_partials(
        _read(sf_dir, "events", columns=["event_type", "value"])
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None),
        ["event_type"], ["n", "s", "q_hi", "q_lo"],
    )
    if parts is None:
        return empty
    k = len(parts)
    n_tot = int(parts["n"].sum())
    if k < 2 or n_tot <= k:
        return empty
    s_tot = sum(int(v) for v in parts["s"])
    q_tot = sum((int(h) << 30) + int(lo)
                for h, lo in zip(parts["q_hi"], parts["q_lo"]))
    a_units = sum(
        int(np.floor(float(int(s) * int(s)) / float(int(n))
                     * 1000000 + 0.5))
        for s, n in zip(parts["s"], parts["n"]))
    g_units = int(np.floor(float(s_tot * s_tot) / float(n_tot)
                           * 1000000 + 0.5))
    num = (n_tot - k) * (a_units - g_units)
    den = (k - 1) * (q_tot * 1000000 - a_units)
    if den <= 0:
        return empty
    f = float(round_half_up(np.array([float(num) / float(den)]), 6)[0])
    return pd.DataFrame({"n_groups": np.array([k], np.int64),
                         "n_total": np.array([n_tot], np.int64),
                         "f_stat": np.array([f], np.float64)})


def q_events_perm_entropy(sf_dir: str):
    """Permutation entropy (order-3 ordinal patterns) of total daily
    event volume over the dense day grid — the model-free complexity
    screen: low entropy = strongly patterned/periodic traffic, ln(6) =
    indistinguishable from noise. Ties rank by position (stable
    argsort), so each day triple maps to one of 6 patterns via three
    strict comparisons.

    Exactness: pattern counts are exact integers; H = [M*lnu(M) -
    sum_p c_p*lnu(c_p)] / (1e6*M) with per-factor 1e-6-unit ln
    quantization (the theil/JSD convention) — integer weighted sums
    (calendar-bounded, trivially inside int64), one half-up divide.

    Scale shape: one (day, n) counter fold; the triple scan is three
    vectorized compares over the calendar-bounded series."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(n_triples="int64", sum_units="int64",
                         perm_entropy="float64")
    dx = _daily_total_counts(sf_dir)
    if dx is None:
        return empty
    _, x = dx
    if len(x) < 3:
        return empty
    x0, x1, x2 = x[:-2], x[1:-1], x[2:]
    pat = ((x1 < x0).astype(np.int64) * 4
           + (x2 < x0).astype(np.int64) * 2
           + (x2 < x1).astype(np.int64))
    _, counts = np.unique(pat, return_counts=True)
    m = int(len(pat))

    def _lnu(v: int) -> int:
        return int(np.floor(np.log(np.float64(v)) * 1e6 + 0.5))

    su = m * _lnu(m) - sum(int(c) * _lnu(int(c)) for c in counts)
    h = float(round_half_up(
        np.array([float(su) / float(10**6 * m)]), 6)[0])
    return pd.DataFrame({"n_triples": np.array([m], np.int64),
                         "sum_units": np.array([su], np.int64),
                         "perm_entropy": np.array([h], np.float64)})


def q_embed_norm_histogram(sf_dir: str, bucket_units: int = 10**12):
    """Histogram of squared L2 embedding norms — the vector-sanity screen
    that catches unnormalized batches, zero vectors and magnitude
    outliers before any cosine math trusts the corpus.

    Exactness: each float32 component quantizes ONCE to 1e-6 units (the
    embed_dim_moments convention: the f32->f64 widening is exact, so
    floor(x*1e6+0.5) is bit-identical both sides); the squared norm is
    then an exact int64 per vector (64 dims x (1e7 units)^2 ~ 6e15) and
    the bucket id one integer floor-division. No float ever crosses a
    sum.

    Scale shape: per-block (bucket, n) counter partials fold on the
    driver — bounded by occupied buckets x blocks, never vectors."""
    import pandas as pd

    empty = _typed_empty(bucket="int64", n_vecs="int64")
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"bucket": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64())}
        if "embedding" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // b.num_rows
        x = flat.astype(np.float64).reshape(b.num_rows, d)
        xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
        sq = (xq * xq).sum(axis=1)
        g = (pd.DataFrame({"bucket": sq // bucket_units})
             .groupby("bucket", as_index=False).size()
             .rename(columns={"size": "n_vecs"}))
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = _fold_partials(
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["bucket"], ["n_vecs"],
    )
    if out is None:
        return empty
    for c in ("bucket", "n_vecs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def q_transition_predictor_acc(sf_dir: str):
    """Majority-transition predictor evaluation: if the next event type
    is always predicted as the globally most common successor of the
    current type, what fraction of transitions does that get right? The
    zero-parameter baseline every sequence model must beat, computed
    from the same (ts, event_id)-ordered per-user streams as the Markov
    matrix.

    Exactness: accuracy = sum_prev max_next / total is exact integers +
    ONE half-up divide (the argmax is over counts — value-only, so ties
    need no break).

    Scale shape: the user_transition_counts fold (whole user per bucket,
    <= |types|^2 cells per bucket); the driver folds the types^2 matrix
    and takes row maxima."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(total_transitions="int64", n_correct="int64",
                         accuracy="float64")
    from ..util import round_half_up

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        t = pa.table({
            "user_id": b["user_id"],
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "event_id": b["event_id"],
            "event_type": b["event_type"],
        })
        return t.append_column(
            "_part", pa.array(stable_partition(b["user_id"], 64),
                              pa.int64()))

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"prev_type": pd.Series([], dtype="object"),
                "next_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        same = g["user_id"].shift(-1) == g["user_id"]
        out = pd.DataFrame({
            "prev_type": g["event_type"][same],
            "next_type": g["event_type"].shift(-1)[same]})
        c = out.groupby(["prev_type", "next_type"], as_index=False).size()
        c = c.rename(columns={"size": "n"})
        c["n"] = c["n"].astype("int64")
        return c

    mat = _fold_partials(
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["prev_type", "next_type"], ["n"],
    )
    if mat is None:
        return empty
    total = int(mat["n"].sum())
    if total == 0:
        return empty
    correct = int(mat.groupby("prev_type")["n"].max().sum())
    acc = float(round_half_up(
        np.array([float(correct) / float(total)]), 6)[0])
    return pd.DataFrame({"total_transitions": np.array([total], np.int64),
                         "n_correct": np.array([correct], np.int64),
                         "accuracy": np.array([acc], np.float64)})


def q_slowlog_lock_contention(sf_dir: str):
    """Per-database lock-contention share over the REAL slow-log
    pipeline: what fraction of each db's total query wall-time is spent
    waiting on locks (sum Lock_time / sum Query_time) — the "which
    schema is lock-bound" triage the reference's per-metric stats tables
    feed (Lock_time/Query_time semantics per event.go TimeMetrics).

    Exactness: Lock_time is (n_chars % 32)/8 and Query_time
    (n_chars % 128)/4 by construction, so lock*8 and qt*4 are exact
    integer units in both the parsed floats and the oracle's closed
    form; contention = su_lock / (2 * su_qt) is ONE half-up
    ratio-of-ints divide (the unit factors fold into the constant 2).
    Dbs with zero total query time are excluded on both sides.

    Scale shape: per-block (db x 3 counters) integer partials fold on
    the driver — db-cardinality-bounded."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(db=object, n_queries="int64", su_lock="int64",
                         su_qt="int64", contention="float64")
    ev = _flat_events(sf_dir)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"db": pa.array([], pa.string()),
                "n_queries": pa.array([], pa.int64()),
                "su_lock": pa.array([], pa.int64()),
                "su_qt": pa.array([], pa.int64())}
        if "db" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        lt = b["lock_time"].to_numpy(zero_copy_only=False)
        qt = b["query_time"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "db": b["db"].to_pandas(),
            "lu": np.round(lt * 8.0).astype(np.int64),
            "qu": np.round(qt * 4.0).astype(np.int64)})
        g = df.groupby("db", as_index=False).agg(
            n_queries=("lu", "size"), su_lock=("lu", "sum"),
            su_qt=("qu", "sum"))
        for c in ("n_queries", "su_lock", "su_qt"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = _fold_partials(
        ev.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["db"], ["n_queries", "su_lock", "su_qt"],
    )
    if out is None:
        return empty
    out = out[out["su_qt"] > 0].reset_index(drop=True)
    if not len(out):
        return empty
    out["contention"] = round_half_up(
        [float(int(l)) / float(2 * int(q))
         for l, q in zip(out["su_lock"], out["su_qt"])], 6)
    for c in ("n_queries", "su_lock", "su_qt"):
        out[c] = out[c].astype("int64")
    return out.sort_values("db").reset_index(drop=True)[
        ["db", "n_queries", "su_lock", "su_qt", "contention"]]


def q_events_quiet_hours(sf_dir: str):
    """Dead-air monitor: over the dense hour grid between the first and
    last event, how many hours saw zero traffic and how long was the
    longest silent stretch — the pipeline-outage / ingestion-gap screen
    an SRE reads before trusting any daily aggregate.

    Exactness: all outputs are exact integers (hour counts and run
    lengths over the dense grid).

    Scale shape: one (hour, n) counter fold (calendar-bounded); the
    run-length scan is a vectorized boundary diff on the driver."""
    import pandas as pd

    empty = _typed_empty(n_hours="int64", n_zero_hours="int64",
                         longest_zero_run="int64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"hr": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        hr = pc.cast(
            pc.floor(pc.divide(pc.cast(pc.cast(b["ts"], pa.int64()),
                                       pa.float64()), 3600000000.0)),
            pa.int64())
        g = (pd.DataFrame({"hr": hr.to_numpy(zero_copy_only=False)})
             .groupby("hr", as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("hr", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["hr"], ["n"],
    )
    if cells is None:
        return empty
    lo, hi = int(cells["hr"].min()), int(cells["hr"].max())
    n_hours = hi - lo + 1
    occupied = np.zeros(n_hours, dtype=bool)
    occupied[cells["hr"].to_numpy(np.int64) - lo] = True
    zero = ~occupied
    n_zero = int(np.count_nonzero(zero))
    if n_zero == 0:
        longest = 0
    else:
        z = np.concatenate(([False], zero, [False]))
        d = np.diff(z.astype(np.int8))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        longest = int((ends - starts).max())
    return pd.DataFrame({
        "n_hours": np.array([n_hours], np.int64),
        "n_zero_hours": np.array([n_zero], np.int64),
        "longest_zero_run": np.array([longest], np.int64)})


def q_orders_cohort_revenue(sf_dir: str, n_parts: int = 64):
    """Cohort revenue matrix: customers grouped by FIRST-order month,
    revenue and order counts per months-since-acquisition offset — the
    LTV-curve input (the revenue-side companion to the user-retention
    cohort_week_matrix).

    Exactness: cents via the shared floor(x*100+0.5); month arithmetic
    is integer (months-since-epoch difference both sides); all sums
    int64.

    Scale shape: orders hash-bucket by custkey so each customer's
    history sits whole in one task (first-order month is in-bucket
    global); buckets emit (cohort, offset) cells — calendar^2-bounded —
    and the driver folds those."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(cohort=object, mo_offset="int64",
                         n_orders="int64", revenue_cents="int64")
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"o_custkey": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table(cols)
        t = pa.table({
            "o_custkey": b["o_custkey"],
            "ts_us": pc.cast(b["o_orderdate"], pa.int64()),
            "cents": _cents(b["o_totalprice"])})
        return t.append_column(
            "_part", pa.array(stable_partition(b["o_custkey"], n_parts),
                              pa.int64()))

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"cohort": pd.Series([], dtype="object"),
                "mo_offset": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64"),
                "revenue_cents": pd.Series([], dtype="int64")}
        if not len(g) or "o_custkey" not in g.columns:
            return pd.DataFrame(cols)
        # month index since epoch (integer), via datetime64[M]
        m = (g["ts_us"].to_numpy(np.int64).astype("datetime64[us]")
             .astype("datetime64[M]"))
        mi = m.astype(np.int64)
        df = pd.DataFrame({"cust": g["o_custkey"].to_numpy(np.int64),
                           "mi": mi,
                           "cents": g["cents"].to_numpy(np.int64)})
        first = df.groupby("cust")["mi"].transform("min")
        cohort = np.datetime_as_string(
            first.to_numpy(np.int64).astype("datetime64[M]"), unit="M")
        out = pd.DataFrame({
            "cohort": cohort,
            "mo_offset": (df["mi"] - first).astype("int64"),
            "cents": df["cents"]})
        c = out.groupby(["cohort", "mo_offset"], as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum"))
        for col in ("mo_offset", "n_orders", "revenue_cents"):
            c[col] = c[col].astype("int64")
        return c

    out = _fold_partials(
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["cohort", "mo_offset"], ["n_orders", "revenue_cents"],
    )
    if out is None:
        return empty
    for c in ("mo_offset", "n_orders", "revenue_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["cohort", "mo_offset"]).reset_index(drop=True)


def q_users_funnel_windowed(sf_dir: str, window_us: int = 3_600_000_000,
                            n_parts: int = 64):
    """Time-window-constrained funnel: users whose first view led to a
    click within an hour, and from that click to a purchase within an
    hour — the latency-honest conversion count (the plain funnel counts
    eventual converters; this one counts converters fast enough to
    attribute). Greedy anchors: first view, then FIRST qualifying click.

    Exactness: all three outputs are exact integer user counts (always
    one row, zeros on empty input — the funnel_steps scalar contract).

    Scale shape: events hash-bucket by user so each user's stream sits
    whole in one task; buckets emit one 3-counter row."""
    import pandas as pd

    from ..partition import stable_partition

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        mask = pc.is_in(b["event_type"],
                        value_set=pa.array(["view", "click", "purchase"]))
        b = b.filter(mask)
        if b.num_rows == 0:
            return pa.table(cols)
        t = pa.table({"user_id": b["user_id"],
                      "ts_us": pc.cast(b["ts"], pa.int64()),
                      "event_type": b["event_type"]})
        return t.append_column(
            "_part", pa.array(stable_partition(b["user_id"], n_parts),
                              pa.int64()))

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_view": pd.Series([], dtype="int64"),
                "n_click_1h": pd.Series([], dtype="int64"),
                "n_purchase_1h": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        v = (g[g["event_type"] == "view"]
             .groupby("user_id")["ts_us"].min())
        cl = g[g["event_type"] == "click"].merge(
            v.rename("vt"), left_on="user_id", right_index=True)
        cl = cl[(cl["ts_us"] > cl["vt"])
                & (cl["ts_us"] <= cl["vt"] + window_us)]
        c = cl.groupby("user_id")["ts_us"].min()
        pu = g[g["event_type"] == "purchase"].merge(
            c.rename("ct"), left_on="user_id", right_index=True)
        pu = pu[(pu["ts_us"] > pu["ct"])
                & (pu["ts_us"] <= pu["ct"] + window_us)]
        return pd.DataFrame({
            "n_view": np.array([len(v)], np.int64),
            "n_click_1h": np.array([len(c)], np.int64),
            "n_purchase_1h": np.array([pu["user_id"].nunique()],
                                      np.int64)})

    parts = (_read(sf_dir, "events",
                   columns=["user_id", "ts", "event_type"])
             .map_batches(_tag, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
             .groupby("_part").map_groups(_bucket, batch_format="pandas")
             .to_pandas())
    if not len(parts) or "n_view" not in parts.columns:
        parts = pd.DataFrame({"n_view": [0], "n_click_1h": [0],
                              "n_purchase_1h": [0]})
    return pd.DataFrame({
        "n_view": np.array([int(parts["n_view"].sum())], np.int64),
        "n_click_1h": np.array([int(parts["n_click_1h"].sum())],
                               np.int64),
        "n_purchase_1h": np.array([int(parts["n_purchase_1h"].sum())],
                                  np.int64)})


def q_parts_name_trigram_match(sf_dir: str, num: int = 1, den: int = 4,
                               max_vocab: int = 100_000):
    """Fuzzy entity matching over the distinct part-name vocabulary:
    character-trigram Jaccard between every pair of DISTINCT names,
    keeping pairs at or above num/den (default 0.25) — the pg_trgm-style
    duplicate-entity screen ("blue anvil" vs "blue bolt" share 'blu',
    'lue', 'ue ') run before trusting name-keyed rollups.

    Exactness: similarity is a ratio of integers (shared distinct
    trigrams / union size) thresholded in INTEGER arithmetic
    (ni*den >= num*union, zero-inter pairs excluded like the oracle's
    inner join) and rounded via round_half_up — the representable-.5-ties
    rule for ratios of small ints.

    Scale shape: names fold to the DISTINCT vocabulary per block
    (pc.unique) before anything pairwise ships; the vocabulary is
    catalog-bounded (TPC-H p_name is a closed word-combination set) with
    a max_vocab fail-fast, and the pairwise intersection is ONE numpy
    incidence-matrix product (vocab x trigrams), never a Python pair
    loop."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(name_a=object, name_b=object, n_inter="int64",
                         n_union="int64", jaccard="float64")

    def _uniq(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "p_name" not in b.column_names:
            return pa.table({"p_name": pa.array([], pa.string())})
        v = pc.unique(pc.drop_null(b["p_name"]))
        return pa.table({"p_name": v})

    parts = (_read(sf_dir, "part", columns=["p_name"])
             .map_batches(_uniq, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
             .to_pandas())
    if not len(parts) or "p_name" not in parts.columns:
        return empty
    names = sorted(set(parts["p_name"].tolist()))
    if len(names) > max_vocab:
        raise ValueError(
            f"distinct part-name vocabulary {len(names)} exceeds "
            f"max_vocab={max_vocab}; pairwise matching is vocab^2 — "
            "raise the bound deliberately or pre-block the names")
    if not names:
        return empty
    gram_sets = [{nm[i:i + 3] for i in range(len(nm) - 2)} for nm in names]
    grams = sorted(set().union(*gram_sets)) if gram_sets else []
    if not grams:
        return empty
    gidx = {g: i for i, g in enumerate(grams)}
    M = np.zeros((len(names), len(grams)), np.int64)
    for r, gs in enumerate(gram_sets):
        for g in gs:
            M[r, gidx[g]] = 1
    inter = M @ M.T
    sz = M.sum(axis=1)
    ia, ib = np.triu_indices(len(names), k=1)
    ni = inter[ia, ib]
    un = sz[ia] + sz[ib] - ni
    keep = (ni > 0) & (ni * den >= num * un)
    if not keep.any():
        return empty
    ia, ib, ni, un = ia[keep], ib[keep], ni[keep], un[keep]
    arr = np.asarray(names, dtype=object)
    out = pd.DataFrame({
        "name_a": arr[ia], "name_b": arr[ib],
        "n_inter": ni.astype("int64"), "n_union": un.astype("int64"),
        "jaccard": round_half_up(
            ni.astype(np.float64) / un.astype(np.float64), 6)})
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


def q_lineitem_flag_ols(sf_dir: str):
    """Per-returnflag OLS of extendedprice (cents) on quantity — the
    price-per-unit consistency screen: a flag class whose slope diverges
    from the others signals mispriced or mis-flagged line items.

    Exactness: quantity is integral in TPC-H (floor(q+0.5) both sides),
    price quantizes to cents; per-block moment partials (n, sx, sy, sxy,
    sxx) are int64-safe (max |xy| ~ 5e8/elem), the driver folds them in
    PYTHON ints (the n*sxy cross products overflow int64 at petabyte
    scale — mirrors the oracle's HUGEINT math), and only the final
    quotient touches floats: float(num)/float(den) == the oracle's
    CAST-CAST-divide bit-for-bit. Half-away rounding (slopes/intercepts
    can go negative)."""
    import pandas as pd

    from ..util import round_half_away

    empty = _typed_empty(l_returnflag=object, n="int64",
                         slope_cents_per_qty="float64",
                         intercept_cents="float64")
    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"l_returnflag": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
                "sxx": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_returnflag" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["l_quantity"]),
                             pc.is_valid(b["l_extendedprice"])))
        if b.num_rows == 0:
            return pa.table(cols)
        x = pc.cast(pc.floor(pc.add(b["l_quantity"], 0.5)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        y = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({
            "l_returnflag": b["l_returnflag"].to_pandas().to_numpy(),
            "n": np.ones(len(x), np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
        }).groupby("l_returnflag", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (li.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
             .to_pandas())
    if not len(parts) or "l_returnflag" not in parts.columns:
        return empty
    rows = []
    for fl, g in parts.groupby("l_returnflag"):
        n = int(g["n"].sum()); sx = int(g["sx"].sum())
        sy = int(g["sy"].sum()); sxy = int(g["sxy"].sum())
        sxx = int(g["sxx"].sum())
        den = n * sxx - sx * sx
        if den == 0:
            continue
        slope = np.float64(n * sxy - sx * sy) / np.float64(den)
        icept = np.float64(sy * sxx - sx * sxy) / np.float64(den)
        rows.append((fl, n, slope, icept))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["l_returnflag", "n",
                                      "slope_cents_per_qty",
                                      "intercept_cents"])
    out["n"] = out["n"].astype("int64")
    out["slope_cents_per_qty"] = round_half_away(
        out["slope_cents_per_qty"], 6)
    out["intercept_cents"] = round_half_away(out["intercept_cents"], 6)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_events_session_pctl(sf_dir: str, gap_us: int = 1_800_000_000):
    """Session-duration percentiles: sessionize each user's event stream
    at a 30-minute inactivity gap, then report p50/p90 of session
    duration in whole seconds — the engagement-depth KPI next to
    sessions_bounce's rate view. Singleton sessions last 0 s.

    Exactness: session boundaries are integer comparisons on epoch-us,
    durations are integer floor-divisions ((last-first)//1e6), and the
    percentiles are the repo's 1-based nearest-rank convention walked
    over an exact histogram cumsum.

    Scale shape: events hash-bucket by user (whole stream per task), one
    lexsort + boundary-diff per bucket, and only (dur_s, n) HISTOGRAM
    cells — bounded by the distinct-duration domain, never event count —
    leave the buckets; the driver folds that histogram."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(n_sessions="int64", p50_s="int64", p90_s="int64")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["user_id"]),
                             pc.is_valid(b["ts"])))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "_part": pa.array(stable_partition(b["user_id"], 64),
                              pa.int64())})

    def _durs(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"dur_s": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(out_cols)
        o = np.lexsort((g["ts_us"].to_numpy(), g["user_id"].to_numpy()))
        u = g["user_id"].to_numpy()[o]
        t = g["ts_us"].to_numpy()[o]
        # new session where user changes or in-user gap exceeds gap_us
        brk = np.ones(len(u), bool)
        if len(u) > 1:
            brk[1:] = (u[1:] != u[:-1]) | (t[1:] - t[:-1] > gap_us)
        sid = np.cumsum(brk)
        df = pd.DataFrame({"sid": sid, "t": t})
        agg = df.groupby("sid")["t"].agg(["min", "max"])
        dur = (agg["max"].to_numpy() - agg["min"].to_numpy()) // 1_000_000
        out = (pd.DataFrame({"dur_s": dur})
               .groupby("dur_s", as_index=False).size()
               .rename(columns={"size": "n"}))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    hist = _fold_partials(
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_durs, batch_format="pandas"),
        ["dur_s"], ["n"],
    )
    if hist is None:
        return empty
    hist = hist.sort_values("dur_s").reset_index(drop=True)
    n = int(hist["n"].sum())
    r50 = max(1, (50 * n) // 100)
    r90 = max(1, (90 * n) // 100)
    cum, p50, p90 = 0, None, None
    for dv, cv in zip(hist["dur_s"], hist["n"]):
        cum += int(cv)
        if p50 is None and cum >= r50:
            p50 = int(dv)
        if p90 is None and cum >= r90:
            p90 = int(dv)
    return pd.DataFrame({"n_sessions": np.array([n], np.int64),
                         "p50_s": np.array([p50], np.int64),
                         "p90_s": np.array([p90], np.int64)})


def q_nation_balance_spend_corr(sf_dir: str, n_parts: int = 64):
    """Per-nation Pearson correlation between a customer's account
    balance and their lifetime order spend — the "do rich accounts
    actually buy more" segmentation sanity check; orderless customers
    count with spend 0 (the oracle's LEFT JOIN + COALESCE).

    Exactness: balances and spend quantize to cents; per-bucket moment
    partials ship sxy/sxx/syy as hi/lo int64 LIMBS (y^2 ~ 2e16 per
    element already crowds int64 per CLAUDE.md's big-int transport
    rule; per-element products stay exact below |x*y| < 2^63, i.e.
    spend < $9e10 per customer at the 1e6-cent balance cap), the driver
    recombines in PYTHON ints mirroring HUGEINT, and
    float(num)/(sqrt(float(d1))*sqrt(float(d2))) is the oracle's
    CAST/sqrt chain op-for-op. Zero-variance nations dropped both sides.

    Scale shape: orders fold to per-customer spend inside custkey
    buckets; customers land in the SAME buckets (tagged union — both
    merge stages return pa.Table per the arrow/pandas union rule), so
    the balance~spend merge is in-bucket with no extra shuffle; nation
    names broadcast (25 rows); only nation-cardinality moment rows reach
    the driver."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_away

    empty = _typed_empty(n_name=object, n_customers="int64",
                         corr_bal_spend="float64")
    LIMB = (1 << 30) - 1

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _tag_cust(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "nat": pa.array([], pa.int64()),
                "bal_cents": pa.array([], pa.int64()),
                "spend_cents": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "c_custkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["c_custkey"], pa.int64()),
            "nat": pc.cast(b["c_nationkey"], pa.int64()),
            "bal_cents": _cents(b["c_acctbal"]),
            "spend_cents": pa.nulls(b.num_rows, pa.int64()),
            "_part": pa.array(stable_partition(b["c_custkey"], n_parts),
                              pa.int64())})

    def _tag_orders(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "nat": pa.array([], pa.int64()),
                "bal_cents": pa.array([], pa.int64()),
                "spend_cents": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["o_custkey"], pa.int64()),
            "nat": pa.nulls(b.num_rows, pa.int64()),
            "bal_cents": pa.nulls(b.num_rows, pa.int64()),
            "spend_cents": _cents(b["o_totalprice"]),
            "_part": pa.array(stable_partition(b["o_custkey"], n_parts),
                              pa.int64())})

    def _moments(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"nat": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "sx": pd.Series([], dtype="int64"),
                "sy": pd.Series([], dtype="int64"),
                "sxy_hi": pd.Series([], dtype="int64"),
                "sxy_lo": pd.Series([], dtype="int64"),
                "sxx_hi": pd.Series([], dtype="int64"),
                "sxx_lo": pd.Series([], dtype="int64"),
                "syy_hi": pd.Series([], dtype="int64"),
                "syy_lo": pd.Series([], dtype="int64")}
        if not len(g) or "cust" not in g.columns:
            return pd.DataFrame(cols)
        cd = g[g["nat"].notna()]
        if not len(cd):
            return pd.DataFrame(cols)
        od = g[g["nat"].isna() & g["spend_cents"].notna()]
        # nullable int64 columns land as float64 after the union; cents
        # magnitudes are exact below 2^53, cast back before integer math
        spend = (od.assign(sc=od["spend_cents"].astype("int64"))
                 .groupby("cust")["sc"].sum()
                 if len(od) else pd.Series(dtype="int64"))
        x = cd["bal_cents"].astype("int64").to_numpy(np.int64)
        y = (cd["cust"].map(spend).fillna(0).astype("int64")
             .to_numpy(np.int64)
             if len(spend) else np.zeros(len(cd), np.int64))
        nat = cd["nat"].astype("int64").to_numpy(np.int64)
        xy = x * y
        xx = x * x
        yy = y * y
        df = pd.DataFrame({
            "nat": nat, "n": np.ones(len(x), np.int64),
            "sx": x, "sy": y,
            "sxy_hi": xy >> 30, "sxy_lo": xy & LIMB,
            "sxx_hi": xx >> 30, "sxx_lo": xx & LIMB,
            "syy_hi": yy >> 30, "syy_lo": yy & LIMB,
        }).groupby("nat", as_index=False).sum()
        for c in df.columns:
            df[c] = df[c].astype("int64")
        return df

    parts = (
        cust.map_batches(_tag_cust, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .union(orders.map_batches(_tag_orders, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None))
        .groupby("_part").map_groups(_moments, batch_format="pandas")
        .to_pandas())
    if not len(parts) or "nat" not in parts.columns:
        return empty
    # nation names broadcast side (25 rows)
    nat_names = (_read(sf_dir, "nation",
                       columns=["n_nationkey", "n_name"]).to_pandas())
    nmap = dict(zip(nat_names["n_nationkey"].astype(int),
                    nat_names["n_name"]))
    rows = []
    for nk, g in parts.groupby("nat"):
        n = int(g["n"].sum()); sx = int(g["sx"].sum())
        sy = int(g["sy"].sum())
        sxy = (int(g["sxy_hi"].sum()) << 30) + int(g["sxy_lo"].sum())
        sxx = (int(g["sxx_hi"].sum()) << 30) + int(g["sxx_lo"].sum())
        syy = (int(g["syy_hi"].sum()) << 30) + int(g["syy_lo"].sum())
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        if d1 <= 0 or d2 <= 0:
            continue
        num = n * sxy - sx * sy
        r = np.float64(num) / (np.sqrt(np.float64(d1))
                               * np.sqrt(np.float64(d2)))
        rows.append((nmap.get(int(nk), "unknown"), n, r))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["n_name", "n_customers",
                                      "corr_bal_spend"])
    out["n_customers"] = out["n_customers"].astype("int64")
    out["corr_bal_spend"] = round_half_away(out["corr_bal_spend"], 6)
    return out.sort_values("n_name").reset_index(drop=True)


def q_orders_priority_median_lines(sf_dir: str, n_parts: int = 64):
    """Grouped median: per order-priority, the median number of line
    items per order — the order-complexity profile behind picking-cost
    models (do URGENT orders really run smaller?). 1-based nearest-rank
    (the repo's EventStats.Current convention).

    Exactness: line counts are exact integers; the median walks an
    exact (priority, n_lines, n_orders) histogram cumsum — nothing
    floats.

    Scale shape: lineitem and orders hash-bucket by ORDERKEY (tagged
    union, both merge stages return pa.Table), so per-order line counts
    and the priority label meet in-bucket with no extra shuffle; buckets
    emit (priority, n_lines) HISTOGRAM cells — bounded by priorities x
    max order width, never order count — and the driver folds those."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(o_orderpriority=object, n_orders="int64",
                         p50_lines="int64")

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def _tag_orders(b: pa.Table) -> pa.Table:
        cols = {"okey": pa.array([], pa.int64()),
                "prio": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_orderkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "prio": pc.cast(b["o_orderpriority"], pa.string()),
            "_part": pa.array(stable_partition(b["o_orderkey"], n_parts),
                              pa.int64())})

    def _tag_li(b: pa.Table) -> pa.Table:
        cols = {"okey": pa.array([], pa.int64()),
                "prio": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "okey": pc.cast(b["l_orderkey"], pa.int64()),
            "prio": pa.nulls(b.num_rows, pa.string()),
            "_part": pa.array(stable_partition(b["l_orderkey"], n_parts),
                              pa.int64())})

    def _hist(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"prio": pd.Series([], dtype="object"),
                "n_lines": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64")}
        if not len(g) or "okey" not in g.columns:
            return pd.DataFrame(cols)
        od = g[g["prio"].notna()]
        if not len(od):
            return pd.DataFrame(cols)
        ld = g[g["prio"].isna()]
        cnt = (ld.groupby("okey").size() if len(ld)
               else pd.Series(dtype="int64"))
        lines = (od["okey"].map(cnt).fillna(0).astype("int64")
                 if len(cnt) else np.zeros(len(od), np.int64))
        out = (pd.DataFrame({"prio": od["prio"].to_numpy(),
                             "n_lines": lines})
               .groupby(["prio", "n_lines"], as_index=False).size()
               .rename(columns={"size": "n_orders"}))
        out["n_lines"] = out["n_lines"].astype("int64")
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    hist = _fold_partials(
        orders.map_batches(_tag_orders, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
        .union(li.map_batches(_tag_li, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None))
        .groupby("_part").map_groups(_hist, batch_format="pandas"),
        ["prio", "n_lines"], ["n_orders"],
    )
    if hist is None:
        return empty
    rows = []
    for pr, g in hist.groupby("prio"):
        g = g.sort_values("n_lines")
        n = int(g["n_orders"].sum())
        r50 = max(1, (50 * n) // 100)
        cum, med = 0, None
        for lv, cv in zip(g["n_lines"], g["n_orders"]):
            cum += int(cv)
            if cum >= r50:
                med = int(lv)
                break
        rows.append((pr, n, med))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                      "p50_lines"])
    out["n_orders"] = out["n_orders"].astype("int64")
    out["p50_lines"] = out["p50_lines"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_events_dau_mau(sf_dir: str):
    """DAU/MAU stickiness per calendar month: average daily actives over
    the month's PRESENT days divided by monthly actives — the classic
    habit-formation KPI (1.0 = every monthly user shows up every active
    day). Days with zero events don't dilute (present-day convention,
    stated in the oracle too).

    Exactness: DAU and MAU are exact distinct counts; stickiness is ONE
    ratio of integers (sum_dau / (n_days * mau)) rounded half-up.

    Scale shape: blocks pre-reduce to distinct (user, day) pairs, users
    hash-bucket so each user's day set lands whole in one task, buckets
    emit (month, day)-level DAU partials plus per-(month, bucket) MAU
    partials — both calendar/bucket-bounded — and the driver folds
    those."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(month=object, n_days="int64", sum_dau="int64",
                         mau="int64", stickiness="float64")
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _pairs(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["user_id"]),
                             pc.is_valid(b["ts"])))
        if b.num_rows == 0:
            return pa.table(cols)
        t = pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "day": _day_from_us(pc.cast(b["ts"], pa.int64())),
        })
        t = t.group_by(["user_id", "day"]).aggregate([])
        return t.append_column(
            "_part", pa.array(stable_partition(t["user_id"], 64),
                              pa.int64()))

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"month": pd.Series([], dtype="object"),
                "day": pd.Series([], dtype="int64"),
                "dau": pd.Series([], dtype="int64"),
                "mau": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        d = g.drop_duplicates(["user_id", "day"])
        mo = np.datetime_as_string(
            (d["day"].to_numpy(np.int64) * 86_400_000_000)
            .astype("datetime64[us]").astype("datetime64[M]"), unit="M")
        df = pd.DataFrame({"month": mo,
                           "day": d["day"].to_numpy(np.int64),
                           "user_id": d["user_id"].to_numpy(np.int64)})
        dau = df.groupby(["month", "day"], as_index=False).agg(
            dau=("user_id", "size"))
        dau["mau"] = 0
        mau = df.groupby("month", as_index=False).agg(
            mau=("user_id", "nunique"))
        mau["day"] = -1  # sentinel row carries the per-bucket MAU partial
        mau["dau"] = 0
        out = pd.concat([dau, mau[["month", "day", "dau", "mau"]]],
                        ignore_index=True)
        for c in ("day", "dau", "mau"):
            out[c] = out[c].astype("int64")
        return out[["month", "day", "dau", "mau"]]

    parts = _fold_partials(
        ds.map_batches(_pairs, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["month", "day"], ["dau", "mau"],
    )
    if parts is None:
        return empty
    days = parts[parts["day"] >= 0].groupby("month").agg(
        n_days=("day", "size"), sum_dau=("dau", "sum"))
    mau = parts[parts["day"] < 0].groupby("month")["mau"].sum()
    out = days.join(mau.rename("mau")).reset_index()
    out = out[out["mau"] > 0]
    if not len(out):
        return empty
    for c in ("n_days", "sum_dau", "mau"):
        out[c] = out[c].astype("int64")
    out["stickiness"] = round_half_up(
        out["sum_dau"].to_numpy(np.float64)
        / (out["n_days"].to_numpy(np.float64)
           * out["mau"].to_numpy(np.float64)), 6)
    return out.sort_values("month").reset_index(drop=True)


def q_events_ewma_daily(sf_dir: str):
    """Exponential smoothing (alpha = 0.5) over the daily event-count
    series: the final smoothed level plus the largest one-step-ahead
    residual |x_t - s_(t-1)| and its day — the lightweight forecasting
    screen next to CUSUM's mean-shift detector.

    Exactness: the recursion runs in IEEE doubles on BOTH sides in the
    SAME day order (s = 0.5*s + 0.5*x, one multiply-add pair per step),
    so every intermediate is bit-identical to the oracle's recursive
    CTE; rounding is half-away (residuals go negative). Ties on |resid|
    break to the earliest day, in integer day numbers.

    Scale shape: blocks fold to (day, n) cells — calendar-bounded — and
    the driver walks the recursion over that series, exactly the CUSUM
    prefix-walk precedent. Needs >= 2 days (no residual exists before
    the first step); fewer returns the typed empty."""
    import pandas as pd

    from ..util import round_half_away

    empty = _typed_empty(n_days="int64", last_ewma="float64",
                         peak_day="int64", peak_resid="float64")
    ds = _read(sf_dir, "events", columns=["ts"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        t = pa.table({"day": _day_from_us(pc.cast(b["ts"], pa.int64()))})
        g = t.group_by("day").aggregate([("day", "count")])
        return pa.table({"day": g["day"],
                         "n": pc.cast(g["day_count"], pa.int64())})

    hist = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["day"], ["n"],
    )
    if hist is None or len(hist) < 2:
        return empty
    hist = hist.sort_values("day").reset_index(drop=True)
    days = hist["day"].to_numpy(np.int64)
    xs = hist["n"].to_numpy(np.int64)
    s = np.float64(xs[0])
    peak_day, peak_resid = None, None
    for i in range(1, len(xs)):
        x = np.float64(xs[i])
        resid = x - s
        if peak_resid is None or abs(resid) > abs(peak_resid):
            peak_day, peak_resid = int(days[i]), resid
        s = np.float64(0.5) * s + np.float64(0.5) * x
    return pd.DataFrame({
        "n_days": np.array([len(xs)], np.int64),
        "last_ewma": round_half_away(np.array([s], np.float64), 6),
        "peak_day": np.array([peak_day], np.int64),
        "peak_resid": round_half_away(np.array([peak_resid], np.float64),
                                      6)})


def q_orders_above_cust_avg(sf_dir: str, n_parts: int = 64):
    """Correlated-aggregate filter: how many orders exceed THEIR OWN
    customer's average order value — the whale-order share behind
    per-account anomaly alerts (a global threshold would just find rich
    customers).

    Exactness: "order > customer mean" is evaluated as the INTEGER
    cross-multiplication cents*n_cust > total_cents (no division ever
    happens), and the final share is ONE half-up ratio of counts.

    Scale shape: orders hash-bucket by custkey, so per-customer count/
    total and the per-order comparison happen in-bucket with no join;
    buckets emit one (n, n_above) counter row each."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(n_orders="int64", n_above="int64",
                         share="float64")
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["o_custkey"], pa.int64()),
            "cents": _cents(b["o_totalprice"]),
            "_part": pa.array(stable_partition(b["o_custkey"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n": pd.Series([], dtype="int64"),
                "n_above": pd.Series([], dtype="int64")}
        if not len(g) or "cust" not in g.columns:
            return pd.DataFrame(cols)
        cust = g["cust"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        df = pd.DataFrame({"cust": cust, "cents": cents})
        agg = df.groupby("cust")["cents"].agg(["size", "sum"])
        n_c = df["cust"].map(agg["size"]).to_numpy(np.int64)
        tot = df["cust"].map(agg["sum"]).to_numpy(np.int64)
        # integer cross-multiply; cents*n fits int64 far past 1e5
        # orders/customer at the 5e7-cent order cap (documented bound)
        above = int(np.count_nonzero(cents * n_c > tot))
        return pd.DataFrame({"n": np.array([len(df)], np.int64),
                             "n_above": np.array([above], np.int64)})

    parts = (ds.map_batches(_tag, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
             .groupby("_part").map_groups(_bucket, batch_format="pandas")
             .to_pandas())
    if not len(parts) or "n" not in parts.columns:
        return empty
    n = int(parts["n"].sum())
    if n == 0:
        return empty
    above = int(parts["n_above"].sum())
    return pd.DataFrame({
        "n_orders": np.array([n], np.int64),
        "n_above": np.array([above], np.int64),
        "share": round_half_up(
            np.array([np.float64(above) / np.float64(n)]), 6)})


def q_orders_rev_7d_range(sf_dir: str):
    """Rolling 7-CALENDAR-day revenue (RANGE frame, not ROWS): per order
    day, the day's revenue plus the sum over the trailing 6 calendar
    days — missing days still narrow the window, which a ROWS frame
    gets wrong on sparse calendars (the cum_daily / rolling_max3
    siblings are ROWS-frame; this is the RANGE-frame semantic).

    Exactness: revenue in integer cents; the trailing sum is a
    two-pointer walk over the day-ordered series in Python ints — no
    floats anywhere.

    Scale shape: blocks fold to (day, cents) cells — calendar-bounded —
    and the driver walks the two-pointer window over that series."""
    import pandas as pd

    empty = _typed_empty(day="int64", rev_cents="int64",
                         rev_7d_cents="int64")
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "rev_cents": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_orderdate" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table(cols)
        df = pd.DataFrame({
            "day": _day_from_us(pc.cast(b["o_orderdate"], pa.int64()))
            .to_numpy(zero_copy_only=False),
            "rev_cents": _cents(b["o_totalprice"])
            .to_numpy(zero_copy_only=False)})
        g = df.groupby("day", as_index=False)["rev_cents"].sum()
        g["day"] = g["day"].astype("int64")
        g["rev_cents"] = g["rev_cents"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["day"], ["rev_cents"],
    )
    if hist is None:
        return empty
    hist = hist.sort_values("day").reset_index(drop=True)
    days = [int(v) for v in hist["day"]]
    revs = [int(v) for v in hist["rev_cents"]]
    out, lo, acc = [], 0, 0
    for i, (d, r) in enumerate(zip(days, revs)):
        acc += r
        while days[lo] < d - 6:
            acc -= revs[lo]
            lo += 1
        out.append((d, r, acc))
    res = pd.DataFrame(out, columns=["day", "rev_cents", "rev_7d_cents"])
    for c in res.columns:
        res[c] = res[c].astype("int64")
    return res


def q_events_top_days_ties(sf_dir: str, k: int = 3):
    """Busiest days WITH TIES: every day whose event count falls in the
    top-k DISTINCT counts (DENSE_RANK <= k) — the tie-honest variant of
    a LIMIT-k leaderboard, which silently drops co-ranked days.

    Exactness: integer counts and integer dense ranks only.

    Scale shape: blocks fold to (day, n) cells — calendar-bounded — and
    the driver ranks that series."""
    import pandas as pd

    empty = _typed_empty(day="int64", n_events="int64", rnk="int64")
    ds = _read(sf_dir, "events", columns=["ts"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        t = pa.table({"day": _day_from_us(pc.cast(b["ts"], pa.int64()))})
        g = t.group_by("day").aggregate([("day", "count")])
        return pa.table({"day": g["day"],
                         "n": pc.cast(g["day_count"], pa.int64())})

    hist = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["day"], ["n"],
    )
    if hist is None:
        return empty
    hist["n"] = hist["n"].astype("int64")
    # dense rank over distinct counts, descending
    distinct = sorted(set(int(v) for v in hist["n"]), reverse=True)
    rank = {v: i + 1 for i, v in enumerate(distinct[:k])}
    keep = hist[hist["n"].isin(list(rank))].copy()
    if not len(keep):
        return empty
    keep["rnk"] = keep["n"].map(rank).astype("int64")
    keep["day"] = keep["day"].astype("int64")
    keep = keep.rename(columns={"n": "n_events"})
    return (keep[["day", "n_events", "rnk"]]
            .sort_values(["rnk", "day"]).reset_index(drop=True))


def q_supplier_balance_quartiles(sf_dir: str):
    """Per-nation supplier account-balance quartiles (p25/p50/p75 in
    cents) — the treasury-exposure profile per sourcing region, via the
    repo's exact nearest-rank machinery.

    Exactness: balances quantize to cents; percentiles use the
    reference's vals[(p*cnt)//100] convention (stats.go:124-129) over an
    exact per-(nation, cents) histogram — nearest_rank_by_key never
    materializes a nation's raw values in one task.

    Scale shape: the bucket-collapse fold inside nearest_rank_by_key
    (stages/aggregate.py) — per-block (key, val) partials, ONE coarse
    hash(key) % 64 shuffle, distinct-value-bounded per-key collapse;
    nation names broadcast driver-side (25 rows)."""
    import pandas as pd

    from ..stages.aggregate import nearest_rank_by_key

    empty = _typed_empty(n_name=object, p25_cents="int64",
                         p50_cents="int64", p75_cents="int64")
    sup = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def _prep(b: pa.Table) -> pa.Table:
        cols = {"nat": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64())}
        if b.num_rows == 0 or "s_nationkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["s_acctbal"]))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({"nat": pc.cast(b["s_nationkey"], pa.int64()),
                         "cents": _cents(b["s_acctbal"])})

    ranked = nearest_rank_by_key(
        sup.map_batches(_prep, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None),
        key="nat", val="cents",
        pcts={"p25_cents": 25, "p50_cents": 50, "p75_cents": 75},
    ).to_pandas()
    if not len(ranked) or "nat" not in ranked.columns:
        return empty
    nat_names = _read(sf_dir, "nation",
                      columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat_names["n_nationkey"].astype(int),
                    nat_names["n_name"]))
    ranked["n_name"] = ranked["nat"].astype(int).map(
        lambda k: nmap.get(k, "unknown"))
    for c in ("p25_cents", "p50_cents", "p75_cents"):
        ranked[c] = ranked[c].astype("int64")
    return (ranked[["n_name", "p25_cents", "p50_cents", "p75_cents"]]
            .sort_values("n_name").reset_index(drop=True))


def q_customers_repeat_rate(sf_dir: str, n_parts: int = 64):
    """Repeat-purchase rate per market segment: share of customers with
    >= 2 lifetime orders — the loyalty KPI behind acquisition-vs-
    retention budget splits; orderless customers stay in the
    denominator (LEFT JOIN semantics).

    Exactness: integer counts; ONE half-up ratio divide per segment.

    Scale shape: customers and orders hash-bucket by custkey (tagged
    union), per-customer order counts and the segment label meet
    in-bucket, buckets emit (segment, n, n_repeat) counter rows —
    segment-cardinality-bounded — and the driver folds those."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(c_mktsegment=object, n_customers="int64",
                         n_repeat="int64", repeat_rate="float64")
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def _tag_cust(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "seg": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "c_custkey" not in b.column_names \
                or "c_mktsegment" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["c_custkey"], pa.int64()),
            "seg": pc.cast(b["c_mktsegment"], pa.string()),
            "_part": pa.array(stable_partition(b["c_custkey"], n_parts),
                              pa.int64())})

    def _tag_orders(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "seg": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["o_custkey"], pa.int64()),
            "seg": pa.nulls(b.num_rows, pa.string()),
            "_part": pa.array(stable_partition(b["o_custkey"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"c_mktsegment": pd.Series([], dtype="object"),
                "n_customers": pd.Series([], dtype="int64"),
                "n_repeat": pd.Series([], dtype="int64")}
        if not len(g) or "cust" not in g.columns:
            return pd.DataFrame(cols)
        cd = g[g["seg"].notna()]
        if not len(cd):
            return pd.DataFrame(cols)
        od = g[g["seg"].isna()]
        cnt = (od.groupby("cust").size() if len(od)
               else pd.Series(dtype="int64"))
        n_ord = (cd["cust"].map(cnt).fillna(0).astype("int64")
                 if len(cnt) else np.zeros(len(cd), np.int64))
        out = (pd.DataFrame({"c_mktsegment": cd["seg"].to_numpy(),
                             "rep": (n_ord >= 2).astype(np.int64)})
               .groupby("c_mktsegment", as_index=False)
               .agg(n_customers=("rep", "size"), n_repeat=("rep", "sum")))
        for c in ("n_customers", "n_repeat"):
            out[c] = out[c].astype("int64")
        return out

    parts = _fold_partials(
        cust.map_batches(_tag_cust, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .union(orders.map_batches(_tag_orders, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None))
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["c_mktsegment"], ["n_customers", "n_repeat"],
    )
    if parts is None:
        return empty
    for c in ("n_customers", "n_repeat"):
        parts[c] = parts[c].astype("int64")
    parts["repeat_rate"] = round_half_up(
        parts["n_repeat"].to_numpy(np.float64)
        / parts["n_customers"].to_numpy(np.float64), 6)
    return parts.sort_values("c_mktsegment").reset_index(drop=True)


def q_orders_value_cv(sf_dir: str):
    """Per-priority coefficient of variation of order value (population
    std / mean) — the pricing-dispersion screen: a priority class whose
    CV spikes mixes wholesale and retail orders under one label.

    Exactness: cents-quantized; per-block sum-of-squares ships as hi/lo
    int64 LIMBS (cents^2 ~ 2.5e15/element overflows int64 within ~3.7k
    rows — the big-int transport rule), driver recombines in Python
    ints, and cv = sqrt(CAST(n*ss - s*s)) / CAST(s) is the oracle's op
    chain verbatim. Half-up rounding (cv >= 0). Zero-total groups
    dropped both sides.

    Scale shape: per-block (priority x 4-counter) moment partials fold
    on the driver — priority-cardinality-bounded."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(o_orderpriority=object, n="int64", cv="float64")
    LIMB = (1 << 30) - 1
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_totalprice"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"prio": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ss_hi": pa.array([], pa.int64()),
                "ss_lo": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_orderpriority" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        if b.num_rows == 0:
            return pa.table(cols)
        cents = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        sq = cents * cents
        g = pd.DataFrame({
            "prio": b["o_orderpriority"].to_pandas().to_numpy(),
            "n": np.ones(len(cents), np.int64),
            "s": cents,
            "ss_hi": sq >> 30, "ss_lo": sq & LIMB,
        }).groupby("prio", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = (ds.map_batches(_partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
             .to_pandas())
    if not len(parts) or "prio" not in parts.columns:
        return empty
    rows = []
    for prio, g in parts.groupby("prio"):
        n = int(g["n"].sum()); s = int(g["s"].sum())
        ss = (int(g["ss_hi"].sum()) << 30) + int(g["ss_lo"].sum())
        if s <= 0:
            continue
        cv = np.sqrt(np.float64(n * ss - s * s)) / np.float64(s)
        rows.append((prio, n, cv))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n", "cv"])
    out["n"] = out["n"].astype("int64")
    out["cv"] = round_half_up(out["cv"], 6)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_event_type_triples(sf_dir: str, n_parts: int = 64):
    """Frequent-itemset support at size 3: for every unordered triple of
    event types, how many users performed ALL THREE — the Apriori step
    after event_type_pairs' pair supports, the screen behind bundle
    recommendations and funnel design.

    Exactness: pure integer counts over globally-distinct (user, type)
    rows.

    Scale shape: identical bucketing to event_type_pairs — batches
    pre-reduce to distinct (user, type) pairs and hash-bucket by user
    (partition.stable_partition, null-stable), so each user's full type
    set meets in ONE bucket; the per-bucket kernel dedupes then runs two
    vectorized self-merges ordered a < b < c, and only
    (type_a, type_b, type_c, n) partials — <= C(types, 3) rows per
    bucket — reach the driver fold. The kernel is C(T, 3) in a single
    user's DISTINCT type count (the inherent itemset-mining cost,
    bounded by the type vocabulary, never by event count)."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(type_a=object, type_b=object, type_c=object,
                         n_users="int64")
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def _pairs(b: pa.Table) -> pa.Table:
        # Empty guard emits the INTERMEDIATE schema the non-empty path
        # produces (the event_type_pairs rule), so empty and non-empty
        # blocks concat under one Arrow schema downstream.
        if "user_id" not in b.column_names:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64()),
            })
        if b.num_rows == 0:
            return b.select(["user_id", "event_type"]).append_column(
                "_part", pa.array([], pa.int64())
            )
        df = b.select(["user_id", "event_type"]).to_pandas().drop_duplicates()
        df["_part"] = stable_partition(df["user_id"], n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {"type_a": pd.Series([], dtype=object),
                    "type_b": pd.Series([], dtype=object),
                    "type_c": pd.Series([], dtype=object),
                    "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(out_cols)
        d = g[["user_id", "event_type"]].drop_duplicates()
        m = d.merge(d, on="user_id", suffixes=("_a", "_b"))
        m = m[m["event_type_a"] < m["event_type_b"]]
        if not len(m):
            return pd.DataFrame(out_cols)
        m = m.merge(d.rename(columns={"event_type": "event_type_c"}),
                    on="user_id")
        m = m[m["event_type_b"] < m["event_type_c"]]
        if not len(m):
            return pd.DataFrame(out_cols)
        out = (
            m.groupby(["event_type_a", "event_type_b", "event_type_c"],
                      as_index=False)
            .size()
            .rename(columns={"event_type_a": "type_a",
                             "event_type_b": "type_b",
                             "event_type_c": "type_c", "size": "n_users"})
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out

    parts = (
        ev.map_batches(_pairs, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
    )
    out = _fold_partials(parts, ["type_a", "type_b", "type_c"], ["n_users"])
    if out is None:
        return empty
    out["n_users"] = out["n_users"].astype("int64")
    return (out.sort_values(["type_a", "type_b", "type_c"])
            .reset_index(drop=True))


def q_events_xcorr_lag1(sf_dir: str, type_a: str = "view",
                        type_b: str = "purchase"):
    """Lead-lag screen: Pearson cross-correlation between TODAY's
    type_a daily volume and TOMORROW's type_b daily volume over the
    dense observed-day grid (absent days count 0) — "do views predict
    next-day purchases", the cheap precursor to any causal-impact or
    marketing-mix model.

    Exactness: daily counts are exact integers on the dense calendar
    spanned by the two types' observed days; all five moment sums run
    in PYTHON ints on the calendar-bounded series (daily counts at
    corpus scale square past int64 — the CLAUDE.md big-int rule), and
    the final correlate is the oracle's CAST/sqrt chain op-for-op:
    float(num) / (sqrt(float(d1)) * sqrt(float(d2))), half-away signed
    rounding like the Pearson siblings.

    Scale shape: ONE (day, n_a, n_b) counter fold (calendar-bounded);
    the lag-align and moments are driver math over <= days rows."""
    import pandas as pd

    from ..util import round_half_away

    empty = _typed_empty(n_pairs="int64", xcorr="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"day": pa.array([], pa.int64()),
                "na": pa.array([], pa.int64()),
                "nb": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names \
                or "event_type" not in b.column_names:
            return pa.table(cols)
        b = b.filter(
            pc.and_(pc.is_valid(b["ts"]),
                    pc.is_in(b["event_type"],
                             value_set=pa.array([type_a, type_b]))))
        if b.num_rows == 0:
            return pa.table(cols)
        et = b["event_type"].to_pandas()
        g = (pd.DataFrame({
                "day": _day_from_us(pc.cast(b["ts"], pa.int64()))
                       .to_numpy(zero_copy_only=False),
                "na": (et == type_a).to_numpy(np.int64),
                "nb": (et == type_b).to_numpy(np.int64)})
             .groupby("day", as_index=False)[["na", "nb"]].sum())
        for c in ("day", "na", "nb"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts", "event_type"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["day"], ["na", "nb"],
    )
    if cells is None:
        return empty
    lo, hi = int(cells["day"].min()), int(cells["day"].max())
    days = hi - lo + 1
    a = np.zeros(days, dtype=np.int64)
    bv = np.zeros(days, dtype=np.int64)
    idx = cells["day"].to_numpy(np.int64) - lo
    a[idx] = cells["na"].to_numpy(np.int64)
    bv[idx] = cells["nb"].to_numpy(np.int64)
    if days < 2:
        return empty
    # pairs (a_t, b_{t+1}) for t in [lo, hi-1]
    x = [int(v) for v in a[:-1]]
    y = [int(v) for v in bv[1:]]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxy = sum(p * q for p, q in zip(x, y))
    sxx = sum(p * p for p in x)
    syy = sum(q * q for q in y)
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 <= 0 or d2 <= 0:
        return empty
    num = n * sxy - sx * sy
    r = np.float64(num) / (np.sqrt(np.float64(d1)) * np.sqrt(np.float64(d2)))
    return pd.DataFrame({
        "n_pairs": np.array([n], np.int64),
        "xcorr": round_half_away(np.array([r], np.float64), 6),
    })


def q_lineitem_weighted_median_qty(sf_dir: str):
    """Revenue-WEIGHTED median quantity per return flag: the smallest
    quantity level at which cumulative extended-price mass reaches half
    the flag's total — "what order size carries half the money", the
    weighted-quantile complement to the repo's nearest-rank medians.

    Exactness: quantities are integral in TPC-H (CAST truncation matches
    the oracle); weights quantize to cents; the cutoff is pure integer
    arithmetic (2*cum >= total) on Python ints (flag totals at corpus
    scale crowd int64 — the big-int rule), so nothing floats anywhere.

    Scale shape: ONE (flag, qty, cents, n) histogram-cell fold — bounded
    by flags x distinct quantity levels (50 in TPC-H), never line count;
    the cumsum/threshold walk is driver math on that histogram."""
    import pandas as pd

    empty = _typed_empty(l_returnflag=object, n_lines="int64",
                         wmedian_qty="int64")
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"flag": pa.array([], pa.string()),
                "qty": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_returnflag" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["l_quantity"]),
                             pc.is_valid(b["l_extendedprice"])))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "flag": b["l_returnflag"].to_pandas(),
                "qty": pc.cast(b["l_quantity"], pa.int64())
                       .to_numpy(zero_copy_only=False),
                "cents": _cents(b["l_extendedprice"])
                         .to_numpy(zero_copy_only=False)})
             .groupby(["flag", "qty"], as_index=False)
             .agg(cents=("cents", "sum"), n=("cents", "size")))
        for c in ("qty", "cents", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["flag", "qty"], ["cents", "n"],
    )
    if cells is None:
        return empty
    rows = []
    for flag, g in cells.groupby("flag"):
        g = g.sort_values("qty")
        total = sum(int(v) for v in g["cents"])
        n_lines = int(g["n"].sum())
        if total <= 0:
            continue
        cum = 0
        for qty, w in zip(g["qty"], g["cents"]):
            cum += int(w)
            if 2 * cum >= total:
                rows.append((flag, n_lines, int(qty)))
                break
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["l_returnflag", "n_lines",
                                      "wmedian_qty"])
    for c in ("n_lines", "wmedian_qty"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_source_char_entropy(sf_dir: str):
    """Per-source CHARACTER-level unigram entropy (nats) plus alphabet
    size — the tokenizer-design statistic that says how compressible /
    how diverse each source's raw byte stream is (word-level entropy
    screens can't see within-word structure).

    Exactness: the per-source byte histogram is exact integers (the
    corpus is ASCII — pinned by the generator and the oracle's
    length() == byte-count equivalence); entropy = ln(N) - sum(c*ln(c))/N
    evaluates over the <=256-cell histogram in ascending byte order,
    matching the oracle's expression term-for-term (ln-derived, np.round
    per the CLAUDE.md rule).

    Scale shape: per-block numpy bincount over the concatenated source
    bytes -> (source, byte, n) partials, <= sources x 256 rows per block;
    the fold and the entropy walk are alphabet-bounded driver math. Text
    never shuffles."""
    import pandas as pd

    empty = _typed_empty(source=object, n_chars="int64",
                         n_alphabet="int64", char_entropy="float64")
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"source": pa.array([], pa.string()),
                "byte": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        df = pd.DataFrame({"source": b["source"].to_pandas(),
                           "text": b["text"].to_pandas()})
        df = df[df["text"].notna()]
        srcs, bytes_, ns = [], [], []
        for src, txts in df.groupby("source")["text"]:
            buf = np.frombuffer(txts.str.cat().encode("ascii"), np.uint8)
            if not len(buf):
                continue
            counts = np.bincount(buf, minlength=256)
            nz = np.nonzero(counts)[0]
            srcs.extend([src] * len(nz))
            bytes_.extend(nz.tolist())
            ns.extend(counts[nz].tolist())
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "byte": pa.array(bytes_, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    cells = _fold_partials(
        docs.map_batches(_cells, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None),
        ["source", "byte"], ["n"],
    )
    if cells is None:
        return empty
    rows = []
    for src, g in cells.groupby("source"):
        g = g.sort_values("byte")
        total = int(g["n"].sum())
        if total <= 0:
            continue
        cn = g["n"].to_numpy(np.float64)
        s = float(np.sum(cn * np.log(cn)))
        ent = np.log(np.float64(total)) - s / np.float64(total)
        rows.append((src, total, len(g), ent))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["source", "n_chars", "n_alphabet",
                                      "char_entropy"])
    for c in ("n_chars", "n_alphabet"):
        out[c] = out[c].astype("int64")
    out["char_entropy"] = np.round(out["char_entropy"].to_numpy(np.float64), 6)
    return out.sort_values("source").reset_index(drop=True)


def q_events_dow_hour_heatmap(sf_dir: str):
    """Traffic heatmap surface: event counts per (day-of-week,
    hour-of-day) cell plus each hour's share of its weekday's traffic —
    the staffing/capacity-planning view behind every ops dashboard.

    Exactness: dow = (epoch_day + 4) % 7 (Sunday=0; day 0 = Thursday
    1970-01-01) and hod = (epoch_us % 86400e6) // 3600e6 are the SAME
    integer arithmetic in the oracle SQL (no locale/DST functions on
    either side); shares are ratio-of-int half-up per the tie rule.

    Scale shape: one (dow, hod, n) counter fold — 168 cells, never
    event-cardinality; shares are driver math on the folded cells."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(dow="int64", hod="int64", n_events="int64",
                         dow_share="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"dow": pa.array([], pa.int64()),
                "hod": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        g = (pd.DataFrame({
                "dow": ((day + 4) % 7).astype(np.int64),
                "hod": ((us % 86_400_000_000)
                        // 3_600_000_000).astype(np.int64)})
             .groupby(["dow", "hod"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("dow", "hod", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["dow", "hod"], ["n"],
    )
    if cells is None:
        return empty
    tot = cells.groupby("dow")["n"].transform("sum")
    out = pd.DataFrame({
        "dow": cells["dow"].astype("int64"),
        "hod": cells["hod"].astype("int64"),
        "n_events": cells["n"].astype("int64"),
        "dow_share": round_half_up(
            cells["n"].to_numpy(np.float64) / tot.to_numpy(np.float64), 6),
    })
    return out.sort_values(["dow", "hod"]).reset_index(drop=True)


def q_orders_first_last_delta(sf_dir: str, n_parts: int = 64):
    """Spend trajectory: among repeat customers (>= 2 orders), how many
    spent MORE on their last order than their first (and how many less)
    — the simplest growth-vs-decay loyalty read.

    Exactness: first/last pick by the deterministic (orderdate,
    orderkey) order (ties break on orderkey; last = highest pair);
    prices quantize to cents; the share is ONE ratio-of-ints half-up
    divide. NULL date/price rows drop on both sides.

    Scale shape: orders hash-bucket by custkey, each customer's history
    meets in one bucket; the per-bucket kernel is one vectorized
    sort + groupby first/last, and each bucket emits a SINGLE
    (n_multi, n_grew, n_shrank) counter row for the driver fold."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(n_customers_multi="int64", n_grew="int64",
                         n_shrank="int64", share_grew="float64")
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate",
                        "o_totalprice"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "okey": pa.array([], pa.int64()),
                "date_us": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["o_orderdate"]),
                             pc.is_valid(b["o_totalprice"])))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["o_custkey"], pa.int64()),
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "date_us": pc.cast(b["o_orderdate"], pa.int64()),
            "cents": _cents(b["o_totalprice"]),
            "_part": pa.array(stable_partition(b["o_custkey"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_multi": pd.Series([], dtype="int64"),
                "n_grew": pd.Series([], dtype="int64"),
                "n_shrank": pd.Series([], dtype="int64")}
        if not len(g) or "cust" not in g.columns:
            return pd.DataFrame(cols)
        g = g.sort_values(["cust", "date_us", "okey"])
        grp = g.groupby("cust")["cents"]
        first = grp.first().to_numpy(np.int64)
        last = grp.last().to_numpy(np.int64)
        multi = grp.size().to_numpy(np.int64) >= 2
        return pd.DataFrame({
            "n_multi": np.array([int(multi.sum())], np.int64),
            "n_grew": np.array(
                [int((multi & (last > first)).sum())], np.int64),
            "n_shrank": np.array(
                [int((multi & (last < first)).sum())], np.int64)})

    parts = (
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas())
    if not len(parts) or "n_multi" not in parts.columns:
        return empty
    n_multi = int(parts["n_multi"].sum())
    if n_multi == 0:
        return empty
    n_grew = int(parts["n_grew"].sum())
    n_shrank = int(parts["n_shrank"].sum())
    return pd.DataFrame({
        "n_customers_multi": np.array([n_multi], np.int64),
        "n_grew": np.array([n_grew], np.int64),
        "n_shrank": np.array([n_shrank], np.int64),
        "share_grew": round_half_up(
            np.array([n_grew / n_multi], np.float64), 6)})


def q_events_weekly_value_p50(sf_dir: str):
    """Weekly median event value per type — the SLO/pricing trend
    surface (is the typical transaction drifting?), exact nearest-rank
    per (type, epoch-week) group.

    Exactness: values quantize to cents; the median is the repo's
    vals[(50*cnt)//100] nearest-rank convention (stats.go:124-129) over
    each group's exact (cents, n) histogram; week = epoch_day // 7 is
    the same integer arithmetic in the oracle.

    Scale shape: nearest_rank_by_key's bucket-collapse shape inlined for
    a COMPOSITE key — per-block (type, week, cents, n) partials,
    stable_pair_partition(type, week) so a group's whole histogram meets
    in one bucket, per-bucket collapse + rank walk; only one result row
    per (type, week) ever reaches the driver."""
    import pandas as pd

    from ..partition import stable_pair_partition

    empty = _typed_empty(event_type=object, week="int64", n="int64",
                         p50_cents="int64")
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"event_type": pa.array([], pa.string()),
                "week": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["ts"]), pc.is_valid(b["value"])))
        if b.num_rows == 0:
            return pa.table(cols)
        day = _day_from_us(pc.cast(b["ts"], pa.int64())) \
            .to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
                "event_type": b["event_type"].to_pandas(),
                "week": (day // 7).astype(np.int64),
                "cents": _cents(b["value"]).to_numpy(zero_copy_only=False)})
             .groupby(["event_type", "week", "cents"], as_index=False)
             .size().rename(columns={"size": "n"}))
        for c in ("week", "cents", "n"):
            g[c] = g[c].astype("int64")
        g["_part"] = stable_pair_partition(
            g["event_type"].to_numpy(object), g["week"].to_numpy(np.int64),
            64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series([], dtype=object),
                "week": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "p50_cents": pd.Series([], dtype="int64")}
        if not len(g) or "event_type" not in g.columns:
            return pd.DataFrame(cols)
        h = g.groupby(["event_type", "week", "cents"],
                      as_index=False)["n"].sum()
        rows = []
        for (et, wk), gg in h.groupby(["event_type", "week"], sort=True):
            gg = gg.sort_values("cents")
            cum = gg["n"].cumsum().to_numpy()
            cnt = int(cum[-1])
            p50 = int(gg["cents"].to_numpy()[
                np.searchsorted(cum, (50 * cnt) // 100 + 1)])
            rows.append((et, int(wk), cnt, p50))
        if not rows:
            return pd.DataFrame(cols)
        out = pd.DataFrame(rows, columns=["event_type", "week", "n",
                                          "p50_cents"])
        for c in ("week", "n", "p50_cents"):
            out[c] = out[c].astype("int64")
        return out

    out = (
        ev.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_rank_bucket, batch_format="pandas")
        .to_pandas())
    if not len(out) or "event_type" not in out.columns:
        return empty
    for c in ("week", "n", "p50_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "week"]).reset_index(drop=True)


def q_user_activity_entropy(sf_dir: str, n_parts: int = 64):
    """Specialist-vs-generalist user screen: each user's event-type-mix
    Shannon entropy (nats, over their event counts per type), binned to
    0.1-nat cells and counted — the engagement-diversity histogram
    (entropy 0 = single-behavior users; ln(types) = uniform explorers).

    Exactness: per-user counts are exact integers; entropy =
    ln(n) - sum(c*ln(c))/n and the bin floor(round(ent,6)*10) evaluate
    identically in numpy and DuckDB (the unigram-surprisal binning
    precedent; ln-derived ties measure-zero).

    Scale shape: per-block (user, type, n) partials hash-bucket by user
    (stable_partition) so each user's full profile meets in one bucket;
    buckets emit (bin, n_users) cells — <= ~17 rows each (entropy is
    bounded by ln(type vocabulary)) — and the driver folds those. Users
    never reach the driver."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(bin="int64", n_users="int64")
    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        g = (pd.DataFrame({"user_id": b["user_id"].to_pandas(),
                           "event_type": b["event_type"].to_pandas()})
             .groupby(["user_id", "event_type"], as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        g["_part"] = stable_partition(
            pa.array(g["user_id"], from_pandas=True), n_parts)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"bin": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        h = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        # per-user entropy over the collapsed counts, type-sorted so the
        # c*ln(c) sum order is deterministic
        h = h.sort_values(["user_id", "event_type"])
        c = h["n"].to_numpy(np.float64)
        terms = pd.Series(c * np.log(c), index=h["user_id"].to_numpy())
        s = terms.groupby(level=0).sum()
        tot = h.groupby("user_id")["n"].sum().to_numpy(np.float64)
        ent = np.round(np.log(tot) - s.to_numpy(np.float64) / tot, 6)
        bins = np.floor(ent * 10).astype(np.int64)
        out = (pd.DataFrame({"bin": bins})
               .groupby("bin", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        for col in ("bin", "n_users"):
            out[col] = out[col].astype("int64")
        return out

    cells = _fold_partials(
        ev.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["bin"], ["n_users"],
    )
    if cells is None:
        return empty
    out = cells.copy()
    for c in ("bin", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values("bin").reset_index(drop=True)


def q_orders_price_equidepth(sf_dir: str, k: int = 8,
                             max_distinct: int = 5_000_000):
    """Equi-DEPTH histogram of order prices (optimizer-statistics build):
    k buckets of (as near as possible) equal row count with their value
    boundaries — the structure a cost-based planner keeps per column,
    where equi-width histograms lose the skewed tail.

    Exactness: NTILE semantics exactly (first n%k tiles take one extra
    row, ties ordered by (cents, orderkey) — tile COUNTS and cents
    MIN/MAX are independent of the orderkey tie-break because equal
    cents are adjacent); boundaries walk the exact (cents, n) histogram
    cumsum, all integers.

    Scale shape: one (cents, n) histogram fold — bounded by DISTINCT
    price points, guarded at max_distinct with the GK remedy named
    (the nearest_rank_by_key contract); the tile walk is driver math
    on the folded histogram."""
    import pandas as pd

    empty = _typed_empty(tile="int64", lo_cents="int64", hi_cents="int64",
                         n_orders="int64")
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_totalprice" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "cents": _cents(b["o_totalprice"])
                         .to_numpy(zero_copy_only=False)})
             .groupby("cents", as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("cents", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["cents"], ["n"],
    )
    if cells is None:
        return empty
    if len(cells) > max_distinct:
        raise ValueError(
            f"orders_price_equidepth: {len(cells)} distinct price points "
            f"exceed {max_distinct}; this metric is effectively continuous "
            "- build the histogram from gk_percentiles_by_key instead"
        )
    cells = cells.sort_values("cents")
    cum = cells["n"].to_numpy(np.int64).cumsum()
    vals = cells["cents"].to_numpy(np.int64)
    n = int(cum[-1])
    rows, start = [], 0
    for t in range(1, k + 1):
        size = n // k + (1 if t <= n % k else 0)
        if size == 0:
            continue
        lo = int(vals[np.searchsorted(cum, start + 1)])
        hi = int(vals[np.searchsorted(cum, start + size)])
        rows.append((t, lo, hi, size))
        start += size
    out = pd.DataFrame(rows, columns=["tile", "lo_cents", "hi_cents",
                                      "n_orders"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def q_slowlog_qt_log2_histogram(sf_dir: str):
    """Per-class log2-bucketed Query_time histogram over the REAL
    slow-log pipeline (parse -> fingerprint -> class) — the classic
    latency-distribution panel (each bucket doubles the latency range;
    the shape a fixed-width Histo(20) flattens at the tail).

    Exactness: query times are quarter-second quanta by derivation
    (float32-exact), so qt_q = round(qt*4) is an exact integer and
    bucket = floor(log2(qt_q)) (qt_q = 0 -> bucket -1) is integer-exact
    both sides (log2 of ints < 2^53 is correctly rounded).

    Scale shape: per-block (class_id, bucket, n) partials — classes x
    ~8 buckets — folded on the driver; events never leave the tasks."""
    import pandas as pd

    empty = _typed_empty(class_id=object, bucket="int64",
                         n_queries="int64")
    events = _flat_events(sf_dir)

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"class_id": pa.array([], pa.string()),
                "bucket": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if "class_id" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        qt = b["query_time"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        qt_q = np.floor(qt * 4.0 + 0.5).astype(np.int64)
        bucket = np.where(
            qt_q == 0, np.int64(-1),
            np.floor(np.log2(np.maximum(qt_q, 1).astype(np.float64)))
            .astype(np.int64))
        g = (pd.DataFrame({"class_id": b["class_id"].to_pandas(),
                           "bucket": bucket})
             .groupby(["class_id", "bucket"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("bucket", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        events.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None),
        ["class_id", "bucket"], ["n"],
    )
    if cells is None:
        return empty
    out = cells.rename(columns={"n": "n_queries"})
    for c in ("bucket", "n_queries"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["class_id", "bucket"]).reset_index(drop=True)


def q_user_gap_median_hist(sf_dir: str, n_parts: int = 64):
    """Engagement-rhythm screen: each user's MEDIAN inter-event gap
    (whole seconds), binned to doubling cells (floor(log2(gap_s + 1)))
    and counted — separates always-on accounts (bin 0-4) from
    check-in-weekly humans (bin 15+) better than any mean, which one
    vacation gap destroys. Users with fewer than two events drop.

    Exactness: gaps are floor-integer seconds of the us deltas over each
    user's time-ordered events (equal-timestamp ties leave the gap
    MULTISET invariant, so no tie-break is needed); the median is the
    repo's nearest-rank convention; the bin is integer-exact log2.

    Scale shape: users hash-bucket (stable_partition) so each user's
    ordered history diffs inside ONE task; buckets emit (bin, n_users)
    cells — ~25 rows each — for the driver fold."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(bin="int64", n_users="int64")
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "us": pc.cast(b["ts"], pa.int64()),
            "_part": pa.array(stable_partition(b["user_id"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"bin": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        g = g.sort_values(["user_id", "us"])
        same = g["user_id"].to_numpy(np.int64)
        us = g["us"].to_numpy(np.int64)
        d = pd.DataFrame({
            "user_id": same[1:],
            "gap_s": (us[1:] - us[:-1]) // 1_000_000,
            "ok": same[1:] == same[:-1]})
        d = d[d["ok"]]
        if not len(d):
            return pd.DataFrame(cols)
        meds = []
        for uid, gg in d.groupby("user_id")["gap_s"]:
            v = np.sort(gg.to_numpy(np.int64))
            meds.append(int(v[(50 * len(v)) // 100]))
        bins = np.floor(
            np.log2(np.array(meds, np.float64) + 1.0)).astype(np.int64)
        out = (pd.DataFrame({"bin": bins})
               .groupby("bin", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        for c in ("bin", "n_users"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["bin"], ["n_users"],
    )
    if cells is None:
        return empty
    out = cells.copy()
    for c in ("bin", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values("bin").reset_index(drop=True)


def q_events_daily_volume_bands(sf_dir: str):
    """Capacity-planning bands: p10 / p50 / p90 of TOTAL daily event
    volume over the dense observed-day grid (absent days count 0) — the
    "plan for p90, alert under p10" numbers an on-call runbook quotes.

    Exactness: daily counts are exact integers on the dense calendar;
    each band is the repo's nearest-rank vals[(p*cnt)//100] convention
    over the sorted day series — nothing floats.

    Scale shape: the shared (day, n) counter fold (calendar-bounded);
    the rank walk is driver math over <= days rows."""
    import pandas as pd

    empty = _typed_empty(n_days="int64", p10="int64", p50="int64",
                         p90="int64")
    dx = _daily_total_counts(sf_dir)
    if dx is None:
        return empty
    _, x = dx
    v = np.sort(x)
    n = len(v)
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "p10": np.array([int(v[(10 * n) // 100])], np.int64),
        "p50": np.array([int(v[(50 * n) // 100])], np.int64),
        "p90": np.array([int(v[(90 * n) // 100])], np.int64)})


def q_events_cube_type_dow(sf_dir: str):
    """CUBE over (event_type, day-of-week): all FOUR grouping sets —
    (type, dow), (type, *), (*, dow), grand total — in one result, the
    completion of the grouping-set family next to events_rollup's
    ROLLUP ('<all>' sentinel for rolled dimensions, dtype-stable vs SQL
    NULLs).

    Scale shape: the rollup rule — one (type, dow, n) finest-cell fold
    (types x 7 rows), every coarser set re-aggregated from those cells
    on the driver, never a second pass over events."""
    import pandas as pd

    empty = _typed_empty(event_type=object, dow=object, n="int64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"event_type": pa.array([], pa.string()),
                "dw": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
                "event_type": b["event_type"].to_pandas(),
                "dw": ((us // 86_400_000_000 + 4) % 7).astype(np.int64)})
             .groupby(["event_type", "dw"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("dw", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts", "event_type"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["event_type", "dw"], ["n"],
    )
    if cells is None:
        return empty
    fine = pd.DataFrame({
        "event_type": cells["event_type"].astype(object),
        "dow": cells["dw"].astype("int64").astype(str),
        "n": cells["n"].astype("int64")})
    by_type = (fine.groupby("event_type", as_index=False)["n"].sum()
               .assign(dow="<all>"))
    by_dow = (fine.groupby("dow", as_index=False)["n"].sum()
              .assign(event_type="<all>"))
    grand = pd.DataFrame({"event_type": ["<all>"], "dow": ["<all>"],
                          "n": [int(fine["n"].sum())]})
    out = pd.concat([fine, by_type, by_dow, grand], ignore_index=True)
    out = out[["event_type", "dow", "n"]]
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "dow"]).reset_index(drop=True)


def q_supplier_revenue_topk(sf_dir: str, k: int = 10):
    """Supply-concentration top-k: the k suppliers carrying the most
    shipped revenue, each with its rank and CUMULATIVE share of total
    revenue — the "how fragile is our supply base" procurement read.

    Exactness: revenue quantizes to cents and sums per supplier in the
    fold (supplier-cardinality); ranks break ties by suppkey ascending;
    cumulative shares are ratios of Python-int sums, half-up.

    Scale shape: ONE (suppkey, cents) fold bounded by supplier count
    (suppliers are the small dimension of lineitem); top-k + shares are
    driver math on that frame. Lineitem rows never leave the tasks."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(s_suppkey="int64", rnk="int64",
                         revenue_cents="int64", cum_share="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"s_suppkey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_suppkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["l_extendedprice"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "s_suppkey": pc.cast(b["l_suppkey"], pa.int64())
                             .to_numpy(zero_copy_only=False),
                "cents": _cents(b["l_extendedprice"])
                         .to_numpy(zero_copy_only=False)})
             .groupby("s_suppkey", as_index=False)["cents"].sum())
        for c in ("s_suppkey", "cents"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["s_suppkey"], ["cents"],
    )
    if cells is None:
        return empty
    total = sum(int(v) for v in cells["cents"])
    if total <= 0:
        return empty
    top = (cells.sort_values(["cents", "s_suppkey"],
                             ascending=[False, True])
           .head(k).reset_index(drop=True))
    cum = 0
    shares, cents_out = [], []
    for v in top["cents"]:
        cum += int(v)
        cents_out.append(int(v))
        shares.append(cum / total)
    return pd.DataFrame({
        "s_suppkey": top["s_suppkey"].astype("int64"),
        "rnk": np.arange(1, len(top) + 1, dtype=np.int64),
        "revenue_cents": np.array(cents_out, np.int64),
        "cum_share": round_half_up(np.array(shares, np.float64), 6)})


def q_genlog_connections_by_db(sf_dir: str):
    """Connection-audit rollup over the REAL general-log parse: Connect
    sessions per (db, user) — "who connects where, how often", the
    access-pattern table a DBA reads before tightening grants. Exercises
    the genlog parser's Connect-line user/host/db capture
    (general_log's `Connect user@host on db` argument; genlog.py:104).

    Scale shape: parse streams per block; only Connect rows (one per
    session) survive the filter, and the (db, user, n) fold is
    db x user cardinality."""
    import pandas as pd

    empty = _typed_empty(db=object, user=object, n_connects="int64")
    ev = parse_events(derived_genlog_sequences_ds(sf_dir), fmt="genlog")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"db": pa.array([], pa.string()),
                "user": pa.array([], pa.string()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "query" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.equal(b["query"], "Connect"))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({"db": b["db"].to_pandas(),
                           "user": b["user"].to_pandas()})
             .groupby(["db", "user"], as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ev.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["db", "user"], ["n"],
    )
    if cells is None:
        return empty
    out = cells.rename(columns={"n": "n_connects"})
    out["n_connects"] = out["n_connects"].astype("int64")
    return out.sort_values(["db", "user"]).reset_index(drop=True)


def q_jsonlog_qt_by_db(sf_dir: str):
    """Per-db latency totals over the REAL structured-JSON log parse —
    the per-database slow-time bill ("which schema burns the budget")
    computed from jsonlog's time_metrics map, exercising the third
    registered format end-to-end past parse.

    Exactness: query times are quarter-second quanta by derivation
    (float32-exact), so the engine sums qt*4 as INTEGER quarters in the
    fold and divides once by 4.0 (a power of two — the division is
    exact), matching the oracle's SUM of integers / 4 bit-for-bit; the
    quarter sum stays below 2^53 up to ~7e13 events (fail-fast
    asserted).

    Scale shape: per-block (db, n, sum_q) partials; db-cardinality
    fold."""
    import pandas as pd

    from ..sources.synth import jsonlog_sequences_from_documents

    empty = _typed_empty(db=object, n_queries="int64", sum_qt="float64")
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars",
                                               "source"])
    seqs = docs.map_batches(jsonlog_sequences_from_documents,
                            batch_format="pyarrow", zero_copy_batch=True)
    ev = parse_events(seqs, fmt="jsonlog")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"db": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_q": pa.array([], pa.int64())}
        if b.num_rows == 0 or "db" not in b.column_names:
            return pa.table(cols)
        tm = [dict(x) for x in b["time_metrics"].to_pylist()]
        qt = np.array([d.get("query_time", 0.0) or 0.0 for d in tm],
                      np.float64)
        g = (pd.DataFrame({
                "db": b["db"].to_pandas(),
                "q": np.floor(qt * 4.0 + 0.5).astype(np.int64)})
             .groupby("db", as_index=False)
             .agg(n=("q", "size"), sum_q=("q", "sum")))
        for c in ("n", "sum_q"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ev.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["db"], ["n", "sum_q"],
    )
    if cells is None:
        return empty
    rows = []
    for db, g in cells.groupby("db"):
        n = int(g["n"].sum())
        sq = sum(int(v) for v in g["sum_q"])
        if abs(sq) > (1 << 53):
            raise ValueError(
                "jsonlog_qt_by_db: quarter-second sum exceeds exact "
                "double range; rescale to coarser quanta")
        rows.append((db, n, float(sq) / 4.0))
    out = pd.DataFrame(rows, columns=["db", "n_queries", "sum_qt"])
    out["n_queries"] = out["n_queries"].astype("int64")
    return out.sort_values("db").reset_index(drop=True)


def q_customers_clv_deciles(sf_dir: str, k: int = 10,
                            max_fold_rows: int = 4_000_000):
    """Customer-lifetime-value deciles: customers ranked by total spend,
    split into k NTILE groups (decile 1 = biggest spenders), each with
    its customer count, revenue and revenue SHARE — the "top decile
    pays for everything" marketing table.

    Exactness: spend quantizes to cents and sums per customer in the
    fold; NTILE semantics exactly (first n%k tiles take the extra row)
    over the deterministic (cents DESC, custkey ASC) order; per-decile
    totals sum in Python ints and shares are single half-up divides.

    Scale shape: per-block (custkey, cents) partials; the driver fold is
    customer-cardinality, guarded at max_fold_rows (the rfm_cells
    contract — bucket by custkey hash and rank per bucket when a corpus
    outgrows it)."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(decile="int64", n_customers="int64",
                         revenue_cents="int64", rev_share="float64")
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "cust": pc.cast(b["o_custkey"], pa.int64())
                        .to_numpy(zero_copy_only=False),
                "cents": _cents(b["o_totalprice"])
                         .to_numpy(zero_copy_only=False)})
             .groupby("cust", as_index=False)["cents"].sum())
        for c in ("cust", "cents"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(_cells, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=None).materialize()
    if parts.count() > max_fold_rows:
        raise ValueError(
            f"customers_clv_deciles: partial rows exceed {max_fold_rows}; "
            "bucket by custkey hash and rank per bucket before folding")
    cells = _fold_partials(parts, ["cust"], ["cents"])
    if cells is None:
        return empty
    cells = cells.sort_values(["cents", "cust"],
                              ascending=[False, True]).reset_index(drop=True)
    n = len(cells)
    total = sum(int(v) for v in cells["cents"])
    if total <= 0:
        return empty
    rows, start = [], 0
    for t in range(1, k + 1):
        size = n // k + (1 if t <= n % k else 0)
        if size == 0:
            continue
        seg = cells["cents"].iloc[start:start + size]
        rev = sum(int(v) for v in seg)
        rows.append((t, size, rev, rev / total))
        start += size
    out = pd.DataFrame(rows, columns=["decile", "n_customers",
                                      "revenue_cents", "rev_share"])
    for c in ("decile", "n_customers", "revenue_cents"):
        out[c] = out[c].astype("int64")
    out["rev_share"] = round_half_up(
        out["rev_share"].to_numpy(np.float64), 6)
    return out.reset_index(drop=True)


def q_lineitem_discount_grid(sf_dir: str):
    """Promotion-effectiveness grid: per discount level (whole percents),
    line count, total quantity and gross/discounted revenue — the table
    behind "does a deeper discount actually move more units".

    Exactness: discounts are whole-percent levels (pct =
    round(discount*100)); revenue quantizes to cents; the discounted
    sum keeps CENTS x 100 integer units both sides (no float multiply
    anywhere), and because that product sum can pass int64 at corpus
    scale it ships as hi/lo int64 LIMBS (the CLAUDE.md big-int rule),
    recombines in Python ints, and fail-fasts at the final BIGINT cast
    exactly where the oracle's CAST would raise.

    Scale shape: ONE fold bounded by discount levels (~11 rows)."""
    import pandas as pd

    empty = _typed_empty(discount_pct="int64", n_lines="int64",
                         sum_qty="int64", gross_cents="int64",
                         disc_c100="int64")
    LIMB = (1 << 30) - 1
    ds = _read(sf_dir, "lineitem",
               columns=["l_discount", "l_quantity", "l_extendedprice"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"discount_pct": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "qty": pa.array([], pa.int64()),
                "gross": pa.array([], pa.int64()),
                "disc_hi": pa.array([], pa.int64()),
                "disc_lo": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_discount" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(
            pc.and_(pc.is_valid(b["l_discount"]),
                    pc.is_valid(b["l_quantity"])),
            pc.is_valid(b["l_extendedprice"])))
        if b.num_rows == 0:
            return pa.table(cols)
        pct = np.floor(
            b["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        cents = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
                "discount_pct": pct,
                "qty": pc.cast(b["l_quantity"], pa.int64())
                       .to_numpy(zero_copy_only=False),
                "gross": cents,
                "disc": cents * (100 - pct)})
             .groupby("discount_pct", as_index=False)
             .agg(n=("qty", "size"), qty=("qty", "sum"),
                  gross=("gross", "sum"), disc=("disc", "sum")))
        g["disc_hi"] = g["disc"] // (LIMB + 1)
        g["disc_lo"] = g["disc"] % (LIMB + 1)
        g = g.drop(columns=["disc"])
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["discount_pct"], ["n", "qty", "gross", "disc_hi", "disc_lo"],
    )
    if cells is None:
        return empty
    rows = []
    for pct, g in cells.groupby("discount_pct"):
        disc = (int(g["disc_hi"].sum()) << 30) + int(g["disc_lo"].sum())
        if disc >= (1 << 63):
            raise ValueError(
                "lineitem_discount_grid: disc_c100 exceeds BIGINT "
                "(the oracle CAST raises here too); report in coarser "
                "units")
        rows.append((int(pct), int(g["n"].sum()), int(g["qty"].sum()),
                     int(g["gross"].sum()), disc))
    out = pd.DataFrame(rows, columns=["discount_pct", "n_lines",
                                      "sum_qty", "gross_cents",
                                      "disc_c100"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("discount_pct").reset_index(drop=True)


def q_events_return_curve(sf_dir: str, max_k: int = 7, n_parts: int = 64):
    """Return-rate curve: for each lag k = 1..max_k days, the number of
    (user, day) active pairs where the user is ALSO active on day+k,
    normalized by total active user-days — the "do they come back
    tomorrow / in a week" retention curve, read directly off activity
    bitmaps.

    Exactness: pure integer pair counts over globally-distinct
    (user, day) rows; ONE half-up ratio per lag.

    Scale shape: batches pre-reduce to distinct (user, day) and
    hash-bucket by user, so each user's activity bitmap meets in one
    bucket; the per-bucket kernel is max_k vectorized self-merges on the
    deduped frame, and buckets emit (k, n_pairs) counters plus the k=0
    diagonal carrying the user-day denominator — <= max_k+1 rows each."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(k="int64", n_pairs="int64", n_user_days="int64",
                         rate="float64")
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        df = pd.DataFrame({
            "user_id": b["user_id"].to_pandas(),
            "day": _day_from_us(pc.cast(b["ts"], pa.int64()))
                   .to_numpy(zero_copy_only=False)}).drop_duplicates()
        df["_part"] = stable_partition(
            pa.array(df["user_id"], from_pandas=True), n_parts)
        df["day"] = df["day"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"k": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        d = g[["user_id", "day"]].drop_duplicates()
        rows = [(0, len(d))]
        for k in range(1, max_k + 1):
            shifted = d.assign(day=d["day"] + k)
            rows.append((k, len(d.merge(shifted, on=["user_id", "day"]))))
        out = pd.DataFrame(rows, columns=["k", "n"])
        for c in ("k", "n"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["k"], ["n"],
    )
    if cells is None:
        return empty
    by_k = dict(zip(cells["k"].astype(int), cells["n"].astype(int)))
    den = int(by_k.get(0, 0))
    if den == 0:
        return empty
    rows = [(k, int(by_k.get(k, 0)), den, int(by_k.get(k, 0)) / den)
            for k in range(1, max_k + 1)]
    out = pd.DataFrame(rows, columns=["k", "n_pairs", "n_user_days",
                                      "rate"])
    for c in ("k", "n_pairs", "n_user_days"):
        out[c] = out[c].astype("int64")
    out["rate"] = round_half_up(out["rate"].to_numpy(np.float64), 6)
    return out.reset_index(drop=True)


def q_embed_dim_topvar(sf_dir: str, k: int = 8):
    """Variance-ranked feature selection: the k embedding dimensions
    with the highest population variance — the screen that decides
    which dims survive a cheap-projection or get whitened first.

    Exactness: embed_dim_moments' integer-unit fold verbatim (1e-6
    quantization, int64 per-block sums recombined in PYTHON ints); the
    variance is the single float chain float(n*ss - s^2)/n/n evaluated
    op-for-op with the oracle, half-up (ratio of ints, non-negative);
    ranks break variance ties on dim ascending.

    Scale shape: blocks fold to 64-row (dim, n, sum, sumsq) partials;
    ranking is driver math on 64 rows."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(rnk="int64", dim="int64", n="int64",
                         var_units="float64")
    moments = q_embed_dim_moments(sf_dir)
    if not len(moments):
        return empty
    rows = []
    for r in moments.itertuples():
        n, s, ss = int(r.n), int(r.sum_units), int(r.sumsq_units)
        if n == 0:
            continue
        var = float(n * ss - s * s) / float(n) / float(n)
        rows.append((int(r.dim), n, var))
    if not rows:
        return empty
    df = pd.DataFrame(rows, columns=["dim", "n", "var_units"])
    df = df.sort_values(["var_units", "dim"],
                        ascending=[False, True]).head(k)
    out = pd.DataFrame({
        "rnk": np.arange(1, len(df) + 1, dtype=np.int64),
        "dim": df["dim"].to_numpy(np.int64),
        "n": df["n"].to_numpy(np.int64),
        "var_units": round_half_up(
            df["var_units"].to_numpy(np.float64), 6)})
    return out.reset_index(drop=True)


def q_orders_basket_corr(sf_dir: str, n_parts: int = 64):
    """Basket-size~value Pearson correlation: do orders with more line
    items actually bill more — the sanity check behind per-line vs
    per-order pricing models, over (lines-per-order, order cents).

    Exactness: the nation_balance_spend_corr recipe verbatim — per-order
    line counts and price cents meet in orderkey buckets (tagged union,
    both merge stages return pa.Table); sxy/sxx/syy ship as hi/lo int64
    LIMBS, the driver recombines in PYTHON ints, and the correlate is
    float(num) / (sqrt(float(d1)) * sqrt(float(d2))) op-for-op with the
    oracle's CAST/sqrt chain, half-away signed. Orders with a price but
    zero lineitem rows count with x = 0 (LEFT JOIN semantics).

    Scale shape: lineitem folds to per-order counts INSIDE the buckets;
    each bucket emits ONE moment row; the driver folds bucket rows."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_away

    empty = _typed_empty(n_orders="int64", corr_lines_price="float64")
    LIMB = (1 << 30) - 1
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def _tag_orders(b: pa.Table) -> pa.Table:
        cols = {"okey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "is_line": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_orderkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "cents": _cents(b["o_totalprice"]),
            "is_line": pa.nulls(b.num_rows, pa.int64()),
            "_part": pa.array(stable_partition(b["o_orderkey"], n_parts),
                              pa.int64())})

    def _tag_lines(b: pa.Table) -> pa.Table:
        cols = {"okey": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "is_line": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "okey": pc.cast(b["l_orderkey"], pa.int64()),
            "cents": pa.nulls(b.num_rows, pa.int64()),
            "is_line": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            "_part": pa.array(stable_partition(b["l_orderkey"], n_parts),
                              pa.int64())})

    def _moments(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n": pd.Series([], dtype="int64"),
                "sx": pd.Series([], dtype="int64"),
                "sy": pd.Series([], dtype="int64"),
                "sxy_hi": pd.Series([], dtype="int64"),
                "sxy_lo": pd.Series([], dtype="int64"),
                "sxx_hi": pd.Series([], dtype="int64"),
                "sxx_lo": pd.Series([], dtype="int64"),
                "syy_hi": pd.Series([], dtype="int64"),
                "syy_lo": pd.Series([], dtype="int64")}
        if not len(g) or "okey" not in g.columns:
            return pd.DataFrame(cols)
        od = g[g["cents"].notna()]
        if not len(od):
            return pd.DataFrame(cols)
        ld = g[g["is_line"].notna()]
        cnt = (ld.groupby("okey").size() if len(ld)
               else pd.Series(dtype="int64"))
        x = (od["okey"].map(cnt).fillna(0).to_numpy(np.int64)
             if len(cnt) else np.zeros(len(od), np.int64))
        y = od["cents"].to_numpy(np.int64)
        sxy = (x * y)
        sxx = (x * x)
        syy = (y * y)
        row = {
            "n": len(od), "sx": int(x.sum()), "sy": int(y.sum()),
        }
        for name, arr in (("sxy", sxy), ("sxx", sxx), ("syy", syy)):
            tot = int(arr.sum())
            row[f"{name}_hi"] = tot >> 30
            row[f"{name}_lo"] = tot & LIMB
        return pd.DataFrame({k: np.array([v], np.int64)
                             for k, v in row.items()})

    parts = (
        orders.map_batches(_tag_orders, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
        .union(lineitem.map_batches(_tag_lines, batch_format="pyarrow",
                                    zero_copy_batch=True, batch_size=None))
        .groupby("_part").map_groups(_moments, batch_format="pandas")
        .to_pandas())
    if not len(parts) or "n" not in parts.columns:
        return empty
    n = int(parts["n"].sum())
    if n == 0:
        return empty
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxy = (int(parts["sxy_hi"].sum()) << 30) + int(parts["sxy_lo"].sum())
    sxx = (int(parts["sxx_hi"].sum()) << 30) + int(parts["sxx_lo"].sum())
    syy = (int(parts["syy_hi"].sum()) << 30) + int(parts["syy_lo"].sum())
    d1 = n * sxx - sx * sx
    d2 = n * syy - sy * sy
    if d1 <= 0 or d2 <= 0:
        return empty
    num = n * sxy - sx * sy
    r = np.float64(num) / (np.sqrt(np.float64(d1)) * np.sqrt(np.float64(d2)))
    return pd.DataFrame({
        "n_orders": np.array([n], np.int64),
        "corr_lines_price": round_half_away(np.array([r], np.float64), 6)})


def q_events_type_hour_entropy(sf_dir: str):
    """Temporal-concentration screen per event type: the Shannon entropy
    (nats) of each type's hour-of-day distribution plus its peak hour —
    separates around-the-clock machine traffic (entropy -> ln 24) from
    business-hours human actions; the peak hour is the staffing anchor.

    Exactness: (type, hod) counts are exact integers; entropy is the
    ln(N) - sum(c*ln(c))/N formula at 6dp (surprisal precedent); peak
    breaks count ties on the LOWEST hour (ROW_NUMBER order both sides).

    Scale shape: one types x 24 counter fold; entropy and peak are
    driver math on those cells."""
    import pandas as pd

    empty = _typed_empty(event_type=object, n_events="int64",
                         peak_hod="int64", hour_entropy="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"event_type": pa.array([], pa.string()),
                "hod": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
                "event_type": b["event_type"].to_pandas(),
                "hod": ((us % 86_400_000_000)
                        // 3_600_000_000).astype(np.int64)})
             .groupby(["event_type", "hod"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("hod", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts", "event_type"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["event_type", "hod"], ["n"],
    )
    if cells is None:
        return empty
    rows = []
    for et, g in cells.groupby("event_type"):
        g = g.sort_values("hod")
        total = int(g["n"].sum())
        if total <= 0:
            continue
        c = g["n"].to_numpy(np.float64)
        ent = np.log(np.float64(total)) \
            - float(np.sum(c * np.log(c))) / np.float64(total)
        peak = g.sort_values(["n", "hod"], ascending=[False, True])
        rows.append((et, total, int(peak["hod"].iloc[0]),
                     float(np.round(ent, 6))))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["event_type", "n_events",
                                      "peak_hod", "hour_entropy"])
    for c in ("n_events", "peak_hod"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_events_sessions_per_user_hist(sf_dir: str, gap_sec: int = 1800,
                                    n_parts: int = 64):
    """Sessions-per-user histogram over the gap-sessionizer's DISTRIBUTED
    output (stages/window.py sessionize, as_dataset=True): how many
    users had 1, 2, 3... sessions — the engagement-frequency read, and
    the composition test that the sessionizer's output streams into a
    further aggregate without collecting.

    Exactness: integer session counts; sessions break on gap > gap_sec
    exactly as the sessionizer defines.

    Scale shape: session rows (user-cardinality) never collect — they
    re-bucket by user hash (a user's sessions can split across output
    blocks under dynamic block splitting, the CLAUDE.md exploded-rows
    rule) and buckets emit (n_sessions, n_users) cells for the fold."""
    import pandas as pd

    from ..partition import stable_partition
    from ..stages.window import sessionize

    empty = _typed_empty(n_sessions="int64", n_users="int64")
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    sess = sessionize(ev, gap_sec=gap_sec, as_dataset=True)

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        g = (pd.DataFrame({"user_id": b["user_id"].to_pandas()})
             .groupby("user_id", as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        g["_part"] = stable_partition(
            pa.array(g["user_id"], from_pandas=True), n_parts)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_sessions": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        per_user = g.groupby("user_id")["n"].sum()
        out = (per_user.value_counts().rename_axis("n_sessions")
               .reset_index(name="n_users"))
        for c in ("n_sessions", "n_users"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        sess.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["n_sessions"], ["n_users"],
    )
    if cells is None:
        return empty
    out = cells.copy()
    for c in ("n_sessions", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values("n_sessions").reset_index(drop=True)


def q_slowlog_fingerprint_collisions(sf_dir: str):
    """Fingerprint-integrity audit over the REAL slow-log parse: distinct
    (class_id, fingerprint) pairs vs distinct classes vs distinct
    fingerprints — class_collisions > 0 would mean one checksum maps to
    two normalized texts (a md5[16:32] collision or a fingerprint bug),
    the invariant every per-class aggregate in this engine rests on.
    Always returns ONE row (zeros over an empty corpus, matching the
    oracle's aggregates-over-empty semantics).

    Scale shape: per-block DISTINCT pairs -> class-cardinality driver
    fold; events never leave the tasks."""
    import pandas as pd

    events = _flat_events(sf_dir)

    def _pairs(b: pa.Table) -> pa.Table:
        cols = {"class_id": pa.array([], pa.string()),
                "fingerprint": pa.array([], pa.string())}
        if "class_id" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        df = (pd.DataFrame({"class_id": b["class_id"].to_pandas(),
                            "fingerprint": b["fingerprint"].to_pandas()})
              .drop_duplicates())
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = events.map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None).to_pandas()
    if not len(parts) or "class_id" not in parts.columns:
        pairs = pd.DataFrame({"class_id": [], "fingerprint": []})
    else:
        pairs = parts.drop_duplicates()
    n_pairs = len(pairs)
    n_classes = pairs["class_id"].nunique() if n_pairs else 0
    n_fp = pairs["fingerprint"].nunique() if n_pairs else 0
    return pd.DataFrame({
        "n_pairs": np.array([n_pairs], np.int64),
        "n_classes": np.array([n_classes], np.int64),
        "n_fingerprints": np.array([n_fp], np.int64),
        "class_collisions": np.array([n_pairs - n_classes], np.int64),
        "fp_collisions": np.array([n_pairs - n_fp], np.int64)})


def q_user_first_touch_attribution(sf_dir: str, n_parts: int = 64):
    """First-touch attribution: every purchase a user ever makes is
    credited to the TYPE of that user's first-ever event — the
    acquisition-channel counterpart of the repo's last-touch
    conversion_attribution. Only purchasing users appear.

    Exactness: "first" is the deterministic (ts, event_id) minimum;
    pure integer counts.

    Scale shape: users hash-bucket so each user's history meets in one
    task; buckets emit (first_type, n_purchases, n_users) cells —
    type-cardinality — for the driver fold."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(first_type=object, n_purchases="int64",
                         n_users="int64")
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "us": pc.cast(b["ts"], pa.int64()),
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "event_type": pc.cast(b["event_type"], pa.string()),
            "_part": pa.array(stable_partition(b["user_id"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"first_type": pd.Series([], dtype=object),
                "n_purchases": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        g = g.sort_values(["user_id", "us", "event_id"])
        first = g.groupby("user_id")["event_type"].first()
        purch = (g[g["event_type"] == "purchase"]
                 .groupby("user_id").size())
        if not len(purch):
            return pd.DataFrame(cols)
        df = pd.DataFrame({"first_type": first.reindex(purch.index),
                           "np": purch})
        out = (df.groupby("first_type", as_index=False)
               .agg(n_purchases=("np", "sum"), n_users=("np", "size")))
        for c in ("n_purchases", "n_users"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["first_type"], ["n_purchases", "n_users"],
    )
    if cells is None:
        return empty
    out = cells.copy()
    for c in ("n_purchases", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values("first_type").reset_index(drop=True)


def q_embed_dim_fisher(sf_dir: str):
    """Per-dimension Fisher discriminant score over the labeled
    embeddings: between-class variance / within-class variance — the
    supervised feature-selection screen ("which dims actually separate
    the labels") next to embed_dim_topvar's unsupervised one.

    Exactness: per-(label, dim) moments use embed_dim_moments' 1e-6
    integer-unit quantization and recombine in PYTHON ints; B and W are
    the identical per-label float expressions summed in label order at
    6dp (labels are a handful; the surprisal ln-sum precedent). Dims
    with zero within-variance drop on both sides.

    Scale shape: blocks fold vectors to (label, dim, n, sum, sumsq)
    partials — labels x 64 rows each; everything after is driver math
    on that grid."""
    import pandas as pd

    empty = _typed_empty(dim="int64", n="int64", fisher="float64")
    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"label": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ss": pa.array([], pa.int64())}
        if "embedding" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // b.num_rows
        x = flat.astype(np.float64).reshape(b.num_rows, d)
        xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
        lab = pc.cast(b["label"], pa.int64()).to_numpy(zero_copy_only=False)
        frames = []
        for lv in np.unique(lab):
            sub = xq[lab == lv]
            frames.append(pd.DataFrame({
                "label": np.full(d, lv, np.int64),
                "dim": np.arange(1, d + 1, dtype=np.int64),
                "n": np.full(d, len(sub), np.int64),
                "s": sub.sum(axis=0),
                "ss": (sub * sub).sum(axis=0)}))
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                    preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["label", "dim"], ["n", "s", "ss"],
    )
    if cells is None:
        return empty
    rows = []
    for dim, g in cells.groupby("dim"):
        g = g.sort_values("label")
        n_l = np.array([int(v) for v in g["n"]], np.float64)
        s_l = np.array([int(v) for v in g["s"]], np.float64)
        ss_l = np.array([int(v) for v in g["ss"]], np.float64)
        n = float(n_l.sum())
        s = float(s_l.sum())
        if n <= 0:
            continue
        m = s / n
        m_l = s_l / n_l
        between = float(np.sum(n_l * (m_l - m) * (m_l - m)))
        within = float(np.sum(ss_l - s_l * s_l / n_l))
        if within <= 0:
            continue
        rows.append((int(dim), int(n), float(np.round(between / within, 6))))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["dim", "n", "fisher"])
    for c in ("dim", "n"):
        out[c] = out[c].astype("int64")
    return out.sort_values("dim").reset_index(drop=True)


def q_events_value_gini_per_type(sf_dir: str):
    """GROUPED Gini: inequality of transaction values WITHIN each event
    type — do a few huge purchases carry the type, or is spend even? The
    per-key extension of user_activity_gini's hardened histogram shape.

    Exactness: values quantize to cents; ties permute freely under the
    rank-sum, so the (type, cents) histogram is lossless; the closed
    form 2*srx - (n+1)*sx over cumulative counts runs in PYTHON ints
    (rank x cents products crowd int64 at corpus scale) and the final
    divide is the oracle's CAST chain, half-up. Zero-total types drop.

    Scale shape: one (type, cents, m) histogram fold — bounded by types
    x distinct cents, never events — and a per-type vectorizable walk on
    the driver."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(event_type=object, n_events="int64",
                         total_cents="int64", gini="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"event_type": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64())}
        if b.num_rows == 0 or "value" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["value"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "event_type": b["event_type"].to_pandas(),
                "cents": _cents(b["value"]).to_numpy(zero_copy_only=False)})
             .groupby(["event_type", "cents"], as_index=False).size()
             .rename(columns={"size": "m"}))
        for c in ("cents", "m"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _fold_partials(
        _read(sf_dir, "events", columns=["event_type", "value"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["event_type", "cents"], ["m"],
    )
    if hist is None:
        return empty
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("cents")
        cs = [int(v) for v in g["cents"]]
        ms = [int(v) for v in g["m"]]
        n = sum(ms)
        sx = sum(c * m for c, m in zip(cs, ms))
        if sx <= 0:
            continue
        srx, run = 0, 0
        for c, m in zip(cs, ms):
            srx += c * (m * run + m * (m + 1) // 2)
            run += m
        gini = float(round_half_up(
            np.array([float(2 * srx - (n + 1) * sx) / float(n * sx)]),
            6)[0])
        rows.append((et, n, sx, gini))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["event_type", "n_events",
                                      "total_cents", "gini"])
    for c in ("n_events", "total_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_supplier_part_diversity(sf_dir: str, n_parts: int = 64):
    """Specialist-vs-generalist supplier screen: the histogram of
    DISTINCT parts each supplier ships, in doubling bins
    (floor(log2(n_parts_supplied))) — the supply-base shape behind
    second-sourcing decisions.

    Exactness: distinct (supplier, part) pairs are global (in-bucket
    dedup after the user-style hash bucketing); bins are integer-exact
    log2.

    Scale shape: batches pre-reduce to distinct pairs, suppliers
    hash-bucket so each supplier's part set counts in ONE task, buckets
    emit ~35 (bin, n_suppliers) cells for the driver fold."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(bin="int64", n_suppliers="int64")
    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"supp": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_suppkey" not in b.column_names:
            return pa.table(cols)
        df = (pd.DataFrame({
                "supp": pc.cast(b["l_suppkey"], pa.int64())
                        .to_numpy(zero_copy_only=False),
                "part": pc.cast(b["l_partkey"], pa.int64())
                        .to_numpy(zero_copy_only=False)})
              .drop_duplicates())
        df["_part"] = stable_partition(
            pa.array(df["supp"], from_pandas=True), n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"bin": pd.Series([], dtype="int64"),
                "n_suppliers": pd.Series([], dtype="int64")}
        if not len(g) or "supp" not in g.columns:
            return pd.DataFrame(cols)
        cnt = (g[["supp", "part"]].drop_duplicates()
               .groupby("supp").size().to_numpy(np.int64))
        bins = np.floor(np.log2(cnt.astype(np.float64))).astype(np.int64)
        out = (pd.DataFrame({"bin": bins})
               .groupby("bin", as_index=False).size()
               .rename(columns={"size": "n_suppliers"}))
        for c in ("bin", "n_suppliers"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["bin"], ["n_suppliers"],
    )
    if cells is None:
        return empty
    out = cells.copy()
    for c in ("bin", "n_suppliers"):
        out[c] = out[c].astype("int64")
    return out.sort_values("bin").reset_index(drop=True)


def q_orders_segment_hhi(sf_dir: str, n_parts: int = 64):
    """Revenue-concentration HHI per market segment, across CUSTOMERS:
    1/n = perfectly even wallet share, 1.0 = one whale is the segment —
    the account-risk diagnostic sales leadership reads next to the CLV
    deciles.

    Exactness: per-customer cents are exact bucket sums; cents^2
    crosses int64 even at small SFs, so per-(bucket, segment) square
    sums ship as DECIMAL STRINGS (the nation_revenue_hhi transport) and
    recombine in PYTHON ints; hhi = float(ssq) / (float(tot)*float(tot))
    is the oracle's CAST chain, half-up. Zero-revenue segments drop.

    Scale shape: orders and customers meet in custkey-hash buckets
    (tagged union); per-customer totals and the segment label collapse
    in-bucket; buckets emit one (segment, n, tot, ssq_str) row each."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(c_mktsegment=object, n_customers="int64",
                         total_cents="int64", hhi="float64")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _tag_cust(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "seg": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "c_custkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["c_custkey"], pa.int64()),
            "seg": pc.cast(b["c_mktsegment"], pa.string()),
            "cents": pa.nulls(b.num_rows, pa.int64()),
            "_part": pa.array(stable_partition(b["c_custkey"], n_parts),
                              pa.int64())})

    def _tag_orders(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "seg": pa.array([], pa.string()),
                "cents": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_totalprice"]))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["o_custkey"], pa.int64()),
            "seg": pa.nulls(b.num_rows, pa.string()),
            "cents": _cents(b["o_totalprice"]),
            "_part": pa.array(stable_partition(b["o_custkey"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"seg": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "tot": pd.Series([], dtype="int64"),
                "ssq_str": pd.Series([], dtype=object)}
        if not len(g) or "cust" not in g.columns:
            return pd.DataFrame(cols)
        cd = g[g["seg"].notna()]
        od = g[g["seg"].isna()]
        if not len(cd) or not len(od):
            return pd.DataFrame(cols)
        per_cust = od.groupby("cust")["cents"].sum()
        cd = cd.assign(cents=cd["cust"].map(per_cust))
        cd = cd[cd["cents"].notna()]
        if not len(cd):
            return pd.DataFrame(cols)
        rows = []
        for seg, gg in cd.groupby("seg"):
            vals = [int(v) for v in gg["cents"]]
            rows.append((seg, len(vals), sum(vals),
                         str(sum(v * v for v in vals))))
        return pd.DataFrame(rows, columns=["seg", "n", "tot", "ssq_str"])

    parts = (
        cust.map_batches(_tag_cust, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .union(orders.map_batches(_tag_orders, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None))
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas())
    if not len(parts) or "seg" not in parts.columns:
        return empty
    rows = []
    for seg, g in parts.groupby("seg"):
        n = int(g["n"].sum())
        tot = int(g["tot"].sum())
        ssq = sum(int(s) for s in g["ssq_str"])
        if tot <= 0:
            continue
        hhi = float(round_half_up(
            np.array([float(ssq) / (float(tot) * float(tot))]), 6)[0])
        rows.append((seg, n, tot, hhi))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["c_mktsegment", "n_customers",
                                      "total_cents", "hhi"])
    for c in ("n_customers", "total_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q_events_surge_factor(sf_dir: str):
    """Surge factor: peak daily volume over median daily volume on the
    dense day grid — the single capacity-headroom number ("provision
    for Nx the typical day"), with the peak day identified (ties break
    on the EARLIEST day).

    Exactness: integer counts; the median is nearest-rank on the dense
    series; surge is ONE ratio-of-ints half-up divide (p50 > 0
    guaranteed unless the median day is empty — those corpora drop).

    Scale shape: the shared (day, n) fold; driver math on <= days."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(n_days="int64", peak_day="int64", peak_n="int64",
                         p50_n="int64", surge="float64")
    dx = _daily_total_counts(sf_dir)
    if dx is None:
        return empty
    days, x = dx
    v = np.sort(x)
    n = len(v)
    p50 = int(v[(50 * n) // 100])
    if p50 <= 0:
        return empty
    peak_idx = int(np.argmax(x))  # argmax returns the FIRST maximum
    return pd.DataFrame({
        "n_days": np.array([n], np.int64),
        "peak_day": np.array([int(days[peak_idx])], np.int64),
        "peak_n": np.array([int(x[peak_idx])], np.int64),
        "p50_n": np.array([p50], np.int64),
        "surge": round_half_up(
            np.array([int(x[peak_idx]) / p50], np.float64), 6)})


def q_users_time_to_first_purchase(sf_dir: str, n_parts: int = 64):
    """Activation-lag histogram: for every user who ever purchases, the
    whole-day delta between their FIRST event and their FIRST purchase
    — the funnel-activation curve growth teams draw before touching
    onboarding. Day 0 = purchased the same day they appeared.

    Exactness: firsts are the deterministic (ts, event_id) minima;
    deltas are floor-integer day differences of epoch-us timestamps.

    Scale shape: user-hash buckets (each user's history in one task)
    emit (days, n_users) cells — calendar-bounded — for the fold."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(days="int64", n_users="int64")
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "is_purchase": pa.array([], pa.bool_()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "us": pc.cast(b["ts"], pa.int64()),
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "is_purchase": pc.equal(b["event_type"], "purchase"),
            "_part": pa.array(stable_partition(b["user_id"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"days": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        g = g.sort_values(["user_id", "us", "event_id"])
        first_any = g.groupby("user_id")["us"].first()
        pg = g[g["is_purchase"]]
        if not len(pg):
            return pd.DataFrame(cols)
        first_p = pg.groupby("user_id")["us"].first()
        fa = first_any.reindex(first_p.index).to_numpy(np.int64)
        fp = first_p.to_numpy(np.int64)
        days = (fp // 86_400_000_000) - (fa // 86_400_000_000)
        out = (pd.DataFrame({"days": days})
               .groupby("days", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        for c in ("days", "n_users"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["days"], ["n_users"],
    )
    if cells is None:
        return empty
    out = cells.copy()
    for c in ("days", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values("days").reset_index(drop=True)


def q_part_brand_markup(sf_dir: str, max_part_broadcast: int = 50_000_000):
    """Pricing-integrity audit per brand: realized lineitem revenue vs
    the catalog price for the SAME units (retail cents x quantity) —
    markup_pct below 100 means the brand ships under list.

    Exactness: both sides are exact integer cents sums (the Q9
    broadcast-lookup shape: parts collapse to sorted (partkey ->
    retail cents, brand) arrays, fail-fast bounded, count checked
    BEFORE the collect); markup_pct is ONE half-up ratio divide of
    Python-int totals. Retail x quantity per line is <= ~5e8 — line
    sums stay far inside int64 per block; brand totals recombine in
    Python ints with the BIGINT fail-fast.

    Scale shape: lineitem never shuffles — each block looks up
    (brand, retail) with searchsorted and emits per-brand integer
    partials; the driver folds blocks x brands tiny rows."""
    import pyarrow.parquet as pq_
    import ray

    import pandas as pd

    from ..broadcast import broadcast_get
    from ..util import round_half_up

    empty = _typed_empty(p_brand=object, n_lines="int64",
                         sold_cents="int64", retail_cents="int64",
                         markup_pct="float64")
    part_ds = _read(sf_dir, "part",
                    columns=["p_partkey", "p_brand", "p_retailprice"])
    n_part = part_ds.count()
    if n_part > max_part_broadcast:
        raise ValueError(
            f"part_brand_markup: {n_part} parts exceed the broadcast "
            f"bound {max_part_broadcast}; co-partition on partkey "
            "(q5/q10 tagged-union shape) instead")
    pdf = part_ds.to_pandas()
    if "p_partkey" not in pdf.columns or not len(pdf):
        return empty
    pdf = pdf.sort_values("p_partkey")
    pkeys = pdf["p_partkey"].to_numpy(np.int64)
    pcents = np.floor(
        pdf["p_retailprice"].to_numpy(np.float64) * 100.0 + 0.5
    ).astype(np.int64)
    brands = pdf["p_brand"].to_numpy(object)
    lut_ref = ray.put((pkeys, pcents, brands))

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"p_brand": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sold": pa.array([], pa.int64()),
                "retail": pa.array([], pa.int64())}
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["l_extendedprice"]),
                             pc.is_valid(b["l_quantity"])))
        if b.num_rows == 0:
            return pa.table(cols)
        pk_, pc_, br_ = broadcast_get(lut_ref)
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(pk_, lpk)
        idx[idx >= len(pk_)] = 0
        hit = (pk_[idx] == lpk) if len(pk_) else \
            np.zeros(len(lpk), dtype=bool)
        if not hit.any():
            return pa.table(cols)
        sold = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        qty = pc.cast(b["l_quantity"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
                "p_brand": br_[idx[hit]],
                "sold": sold[hit],
                "retail": pc_[idx[hit]] * qty[hit]})
             .groupby("p_brand", as_index=False)
             .agg(n=("sold", "size"), sold=("sold", "sum"),
                  retail=("retail", "sum")))
        for c in ("n", "sold", "retail"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None),
        ["p_brand"], ["n", "sold", "retail"],
    )
    if cells is None:
        return empty
    rows = []
    for brand, g in cells.groupby("p_brand"):
        n = int(g["n"].sum())
        sold = sum(int(v) for v in g["sold"])
        retail = sum(int(v) for v in g["retail"])
        if retail <= 0 or max(sold, retail) >= (1 << 63):
            continue
        rows.append((brand, n, sold, retail,
                     float(round_half_up(
                         np.array([100.0 * sold / retail]), 6)[0])))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["p_brand", "n_lines", "sold_cents",
                                      "retail_cents", "markup_pct"])
    for c in ("n_lines", "sold_cents", "retail_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("p_brand").reset_index(drop=True)


def q_slowlog_tier_latency(sf_dir: str):
    """Per-tier latency bill through the ENRICH stage: slow-log events
    pick up (tier, region) from the broadcast source-dimension lookup,
    then fold query counts and total Query_time per tier — "is staging
    burning prod's latency budget", the chargeback read the enrich
    stage exists to feed.

    Exactness: query times are quarter-second quanta (float32-exact by
    derivation), summed as INTEGER quarters and divided once by 4.0
    (exact power of two); tiers come from the dim derivation
    (tier = prod/staging by source-suffix parity), reproduced in the
    oracle's closed form.

    Scale shape: parse -> enrich streams (dim broadcast once, cached
    per worker); per-block (tier, n, sum_q) partials; tier-cardinality
    fold."""
    import pandas as pd

    from ..sources.synth import dim_for_sources
    from ..stages.enrich import enrich_events

    empty = _typed_empty(tier=object, n_queries="int64", sum_qt="float64")
    seqs = derived_sequences_ds(sf_dir)
    srcs = seqs.unique("source")
    if not srcs:
        return empty
    dim = dim_for_sources(srcs)
    events = enrich_events(
        flatten_events(parse_events(derived_sequences_ds(sf_dir))), dim)

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"tier": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_q": pa.array([], pa.int64())}
        if b.num_rows == 0 or "tier" not in b.column_names:
            return pa.table(cols)
        qt = b["query_time"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        g = (pd.DataFrame({
                "tier": b["tier"].to_pandas(),
                "q": np.floor(qt * 4.0 + 0.5).astype(np.int64)})
             .groupby("tier", as_index=False)
             .agg(n=("q", "size"), sum_q=("q", "sum")))
        for c in ("n", "sum_q"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        events.map_batches(_cells, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None),
        ["tier"], ["n", "sum_q"],
    )
    if cells is None:
        return empty
    rows = []
    for tier, g in cells.groupby("tier"):
        sq = sum(int(v) for v in g["sum_q"])
        if abs(sq) > (1 << 53):
            raise ValueError(
                "slowlog_tier_latency: quarter sum exceeds exact double "
                "range; rescale to coarser quanta")
        rows.append((tier, int(g["n"].sum()), float(sq) / 4.0))
    out = pd.DataFrame(rows, columns=["tier", "n_queries", "sum_qt"])
    out["n_queries"] = out["n_queries"].astype("int64")
    return out.sort_values("tier").reset_index(drop=True)


def q_formats_qt_consistency(sf_dir: str):
    """Cross-format consistency audit: the SAME corpus rendered as
    classic slow-log text and as structured JSON lines must yield
    IDENTICAL per-db query counts and Query_time totals through their
    respective parsers — the end-to-end regression tripwire for the
    format registry (a quirk fixed in one parser but not the other
    shows up here as a nonzero delta).

    Exactness: both sides sum integer quarter-seconds (exact by
    derivation); deltas are exact int/float differences.

    Scale shape: two streaming parses, each folding to db-cardinality
    partials; the comparison is driver math on db-cardinality rows."""
    import pandas as pd

    from ..sources.synth import jsonlog_sequences_from_documents

    empty = _typed_empty(db=object, n_slow="int64", n_json="int64",
                         sum_qt_slow="float64", sum_qt_json="float64",
                         consistent="int64")

    def _fold(ev) -> "pd.DataFrame | None":
        def _cells(b: pa.Table) -> pa.Table:
            cols = {"db": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64())}
            if b.num_rows == 0 or "db" not in b.column_names:
                return pa.table(cols)
            qt = b["query_time"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            g = (pd.DataFrame({
                    "db": b["db"].to_pandas(),
                    "q": np.floor(qt * 4.0 + 0.5).astype(np.int64)})
                 .groupby("db", as_index=False)
                 .agg(n=("q", "size"), sum_q=("q", "sum")))
            for c in ("n", "sum_q"):
                g[c] = g[c].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        return _fold_partials(
            ev.map_batches(_cells, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None),
            ["db"], ["n", "sum_q"],
        )

    slow = _fold(flatten_events(parse_events(derived_sequences_ds(sf_dir))))
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars",
                                               "source"])
    jseqs = docs.map_batches(jsonlog_sequences_from_documents,
                             batch_format="pyarrow", zero_copy_batch=True)
    json_ = _fold(flatten_events(parse_events(jseqs, fmt="jsonlog"),
                                 time_metrics=("query_time",),
                                 number_metrics=()))
    if slow is None and json_ is None:
        return empty
    import pandas as pd

    slow = slow if slow is not None else pd.DataFrame(
        {"db": [], "n": [], "sum_q": []})
    json_ = json_ if json_ is not None else pd.DataFrame(
        {"db": [], "n": [], "sum_q": []})
    m = slow.merge(json_, on="db", how="outer",
                   suffixes=("_s", "_j")).fillna(0)
    rows = []
    for r in m.itertuples():
        ns, nj = int(r.n_s), int(r.n_j)
        qs_, qj = int(r.sum_q_s), int(r.sum_q_j)
        rows.append((r.db, ns, nj, qs_ / 4.0, qj / 4.0,
                     int(ns == nj and qs_ == qj)))
    out = pd.DataFrame(rows, columns=["db", "n_slow", "n_json",
                                      "sum_qt_slow", "sum_qt_json",
                                      "consistent"])
    for c in ("n_slow", "n_json", "consistent"):
        out[c] = out[c].astype("int64")
    return out.sort_values("db").reset_index(drop=True)


def q_lineitem_brand_returns(sf_dir: str,
                             max_part_broadcast: int = 50_000_000):
    """Return-rate per brand: share of lineitem rows flagged 'R' —
    "which brands come back", the QA escalation table. Same Q9/markup
    broadcast-lookup shape (parts never shuffle lineitem).

    Exactness: integer counts; ONE half-up ratio divide per brand.

    Scale shape: sorted (partkey -> brand) broadcast (fail-fast bound
    checked BEFORE collect); per-block (brand, n, n_returned) partials;
    brand-cardinality fold."""
    import pyarrow.parquet as pq_
    import ray

    import pandas as pd

    from ..broadcast import broadcast_get
    from ..util import round_half_up

    empty = _typed_empty(p_brand=object, n_lines="int64",
                         n_returned="int64", return_rate="float64")
    part_ds = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    n_part = part_ds.count()
    if n_part > max_part_broadcast:
        raise ValueError(
            f"lineitem_brand_returns: {n_part} parts exceed the broadcast "
            f"bound {max_part_broadcast}; co-partition on partkey instead")
    pdf = part_ds.to_pandas()
    if "p_partkey" not in pdf.columns or not len(pdf):
        return empty
    pdf = pdf.sort_values("p_partkey")
    pkeys = pdf["p_partkey"].to_numpy(np.int64)
    brands = pdf["p_brand"].to_numpy(object)
    lut_ref = ray.put((pkeys, brands))

    def _partial(b: pa.Table) -> pa.Table:
        cols = {"p_brand": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "ret": pa.array([], pa.int64())}
        if "l_partkey" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        pk_, br_ = broadcast_get(lut_ref)
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(pk_, lpk)
        idx[idx >= len(pk_)] = 0
        hit = (pk_[idx] == lpk) if len(pk_) else \
            np.zeros(len(lpk), dtype=bool)
        if not hit.any():
            return pa.table(cols)
        flags = b["l_returnflag"].to_pandas().to_numpy(object)
        g = (pd.DataFrame({
                "p_brand": br_[idx[hit]],
                "ret": (flags[hit] == "R").astype(np.int64)})
             .groupby("p_brand", as_index=False)
             .agg(n=("ret", "size"), ret=("ret", "sum")))
        for c in ("n", "ret"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_returnflag"])
        .map_batches(_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None),
        ["p_brand"], ["n", "ret"],
    )
    if cells is None:
        return empty
    out = cells.rename(columns={"n": "n_lines", "ret": "n_returned"})
    for c in ("n_lines", "n_returned"):
        out[c] = out[c].astype("int64")
    out["return_rate"] = round_half_up(
        out["n_returned"].to_numpy(np.float64)
        / out["n_lines"].to_numpy(np.float64), 6)
    return out.sort_values("p_brand").reset_index(drop=True)


def q_users_dormancy_revival(sf_dir: str, dormant_days: int = 14,
                             n_parts: int = 64):
    """Dormancy-revival read: how many users went quiet for more than
    ``dormant_days`` and came BACK (and how many separate revivals
    happened) — the win-back campaign's addressable-market number.
    Always one row; integers only.

    Exactness: a revival is a consecutive-activity-day gap strictly
    greater than dormant_days on the user's DISTINCT active days.

    Scale shape: distinct (user, day) rows bucket by user; each bucket
    diffs its users' sorted day vectors and emits ONE
    (n_users, n_revived, n_revivals) counter row."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(n_users="int64", n_revived="int64",
                         n_revivals="int64")
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        df = pd.DataFrame({
            "user_id": b["user_id"].to_pandas(),
            "day": _day_from_us(pc.cast(b["ts"], pa.int64()))
                   .to_numpy(zero_copy_only=False)}).drop_duplicates()
        df["_part"] = stable_partition(
            pa.array(df["user_id"], from_pandas=True), n_parts)
        df["day"] = df["day"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_users": pd.Series([], dtype="int64"),
                "n_revived": pd.Series([], dtype="int64"),
                "n_revivals": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        d = (g[["user_id", "day"]].drop_duplicates()
             .sort_values(["user_id", "day"]))
        u = d["user_id"].to_numpy(np.int64)
        day = d["day"].to_numpy(np.int64)
        same = np.r_[False, u[1:] == u[:-1]]
        gap = np.r_[0, day[1:] - day[:-1]]
        reviv = same & (gap > dormant_days)
        per_user = pd.DataFrame({"u": u[reviv]}).groupby("u").size()
        return pd.DataFrame({
            "n_users": np.array([d["user_id"].nunique()], np.int64),
            "n_revived": np.array([len(per_user)], np.int64),
            "n_revivals": np.array([int(reviv.sum())], np.int64)})

    parts = (
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas())
    if not len(parts) or "n_users" not in parts.columns:
        return empty
    n_users = int(parts["n_users"].sum())
    if n_users == 0:
        return empty
    return pd.DataFrame({
        "n_users": np.array([n_users], np.int64),
        "n_revived": np.array([int(parts["n_revived"].sum())], np.int64),
        "n_revivals": np.array([int(parts["n_revivals"].sum())],
                               np.int64)})


def q_events_value_top1pct_share(sf_dir: str):
    """Whale-tail concentration: the share of total transaction value
    carried by the top 1% of events by value — the single number that
    says whether revenue is a volume business or a whale business
    (complement of the within-type Gini).

    Exactness: integer cents histogram; the p99 cutoff is nearest-rank
    (vals[(99*n)//100], 0-based); the "top" mass is everything at ranks
    STRICTLY ABOVE that index, computed from the histogram cumsum in
    PYTHON ints (totals crowd int64 at corpus scale); one half-up
    divide.

    Scale shape: one (cents, m) histogram fold bounded by distinct
    values; the rank walk is driver math."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(n_events="int64", p99_cents="int64",
                         top_cents="int64", top_share="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"cents": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64())}
        if b.num_rows == 0 or "value" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["value"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "cents": _cents(b["value"]).to_numpy(zero_copy_only=False)})
             .groupby("cents", as_index=False).size()
             .rename(columns={"size": "m"}))
        for c in ("cents", "m"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _fold_partials(
        _read(sf_dir, "events", columns=["value"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["cents"], ["m"],
    )
    if hist is None:
        return empty
    hist = hist.sort_values("cents")
    cs = [int(v) for v in hist["cents"]]
    ms = [int(v) for v in hist["m"]]
    n = sum(ms)
    total = sum(c * m for c, m in zip(cs, ms))
    if total <= 0:
        return empty
    # 0-based cutoff rank: values at sorted positions > (99*n)//100
    cut = (99 * n) // 100
    # walk the histogram: positions [run, run+m) hold value c
    run, p99, top = 0, 0, 0
    for c, m in zip(cs, ms):
        if run <= cut < run + m:
            p99 = c
            top += c * (run + m - 1 - cut)  # positions above cut at c
        elif run > cut:
            top += c * m
        run += m
    return pd.DataFrame({
        "n_events": np.array([n], np.int64),
        "p99_cents": np.array([p99], np.int64),
        "top_cents": np.array([top], np.int64),
        "top_share": round_half_up(
            np.array([top / total], np.float64), 6)})


def q_slowlog_user_qt_p95(sf_dir: str):
    """Per-USER Query_time p50/p95 over the REAL slow-log parse — the
    "who writes the slow queries" accountability table next to the
    per-class percentiles, through the shared nearest_rank_by_key
    bucket-collapse (quarter-second quanta keep the histogram exact).

    Scale shape: nearest_rank_by_key's (key, val) histogram partials +
    one coarse shuffle; one row per user reaches the driver."""
    import pandas as pd

    from ..stages.aggregate import nearest_rank_by_key

    empty = _typed_empty(user=object, p50_q="int64", p95_q="int64")
    events = _flat_events(sf_dir)

    def _narrow(b: pa.Table) -> pa.Table:
        cols = {"user": pa.array([], pa.string()),
                "qt_q": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user" not in b.column_names:
            return pa.table(cols)
        qt = b["query_time"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "user": pc.cast(b["user"], pa.string()),
            "qt_q": pa.array(np.floor(qt * 4.0 + 0.5).astype(np.int64),
                             pa.int64())})

    ds = events.map_batches(_narrow, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
    out = nearest_rank_by_key(
        ds, key="user", val="qt_q", pcts={"p50_q": 50, "p95_q": 95}
    ).to_pandas()
    if not len(out) or "user" not in out.columns:
        return empty
    for c in ("p50_q", "p95_q"):
        out[c] = out[c].astype("int64")
    return (out[["user", "p50_q", "p95_q"]]
            .sort_values("user").reset_index(drop=True))


def q_users_actions_before_purchase(sf_dir: str, n_parts: int = 64):
    """Funnel depth: p50/p90 of the number of events a user performs
    STRICTLY BEFORE their first purchase (purchasers only) — "how much
    browsing does a sale take", the merchandising-page budget number.

    Exactness: the first purchase is the deterministic (ts, event_id)
    minimum; "before" is strict (ts, event_id) lexicographic order;
    percentiles are nearest-rank over the exact per-user-count
    histogram.

    Scale shape: user-hash buckets emit (n_actions, n_users) histogram
    cells (bounded by max per-user history, never buyers); the rank
    walk is driver math."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(n_buyers="int64", p50_actions="int64",
                         p90_actions="int64")
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "us": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "is_purchase": pa.array([], pa.bool_()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "us": pc.cast(b["ts"], pa.int64()),
            "event_id": pc.cast(b["event_id"], pa.int64()),
            "is_purchase": pc.equal(b["event_type"], "purchase"),
            "_part": pa.array(stable_partition(b["user_id"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_actions": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        g = g.sort_values(["user_id", "us", "event_id"]).reset_index(
            drop=True)
        # position of each row within its user (0-based)
        pos = g.groupby("user_id").cumcount().to_numpy(np.int64)
        pg = g[g["is_purchase"].to_numpy(bool)]
        if not len(pg):
            return pd.DataFrame(cols)
        first_pos = pd.Series(
            pos[pg.index.to_numpy()], index=pg["user_id"].to_numpy()
        ).groupby(level=0).min()
        out = (first_pos.value_counts().rename_axis("n_actions")
               .reset_index(name="n_users"))
        for c in ("n_actions", "n_users"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["n_actions"], ["n_users"],
    )
    if cells is None:
        return empty
    cells = cells.sort_values("n_actions")
    cum = cells["n_users"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    vals = cells["n_actions"].to_numpy(np.int64)
    p50 = int(vals[np.searchsorted(cum, (50 * n) // 100 + 1)])
    p90 = int(vals[np.searchsorted(cum, (90 * n) // 100 + 1)])
    return pd.DataFrame({
        "n_buyers": np.array([n], np.int64),
        "p50_actions": np.array([p50], np.int64),
        "p90_actions": np.array([p90], np.int64)})


def q_parts_catalog_heatmap(sf_dir: str, band_cents: int = 20_000):
    """Catalog-shape heatmap: part counts per (size, price band) cell
    plus each size's median retail cents — the assortment-planning
    surface ("are large sizes priced into the high bands").

    Exactness: bands are integer cents // band_cents; medians are
    nearest-rank on the exact per-size histogram.

    Scale shape: one (size, band, n) fold (sizes x bands cells) plus a
    per-size (cents, n) histogram fold — both catalog-bounded."""
    import pandas as pd

    empty = _typed_empty(p_size="int64", band="int64", n_parts="int64",
                         size_p50_cents="int64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"p_size": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "p_size" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["p_size"]),
                             pc.is_valid(b["p_retailprice"])))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "p_size": pc.cast(b["p_size"], pa.int64())
                          .to_numpy(zero_copy_only=False),
                "cents": _cents(b["p_retailprice"])
                         .to_numpy(zero_copy_only=False)})
             .groupby(["p_size", "cents"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("p_size", "cents", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _fold_partials(
        _read(sf_dir, "part", columns=["p_size", "p_retailprice"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["p_size", "cents"], ["n"],
    )
    if hist is None:
        return empty
    rows = []
    for size, g in hist.groupby("p_size"):
        g = g.sort_values("cents")
        cum = g["n"].to_numpy(np.int64).cumsum()
        cnt = int(cum[-1])
        p50 = int(g["cents"].to_numpy()[
            np.searchsorted(cum, (50 * cnt) // 100 + 1)])
        bands = (g["cents"] // band_cents).astype(np.int64)
        cell = (pd.DataFrame({"band": bands,
                              "n": g["n"].to_numpy(np.int64)})
                .groupby("band", as_index=False)["n"].sum())
        for r in cell.itertuples():
            rows.append((int(size), int(r.band), int(r.n), p50))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["p_size", "band", "n_parts",
                                      "size_p50_cents"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["p_size", "band"]).reset_index(drop=True)


def q_nation_market_activation(sf_dir: str, n_parts: int = 64):
    """Market-activation table: per nation, customer count and the share
    who ever ordered — where the sales motion has accounts but no
    activity. Orderless customers stay in the denominator.

    Exactness: integer counts; ONE half-up divide per nation; nation
    names broadcast (25 rows).

    Scale shape: customers and orders meet in custkey-hash buckets
    (tagged union); buckets emit (nationkey, n, n_active) counters."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(n_name=object, n_customers="int64",
                         n_active="int64", active_share="float64")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def _tag_cust(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "nat": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "c_custkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["c_custkey"], pa.int64()),
            "nat": pc.cast(b["c_nationkey"], pa.int64()),
            "_part": pa.array(stable_partition(b["c_custkey"], n_parts),
                              pa.int64())})

    def _tag_orders(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "nat": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["o_custkey"], pa.int64()),
            "nat": pa.nulls(b.num_rows, pa.int64()),
            "_part": pa.array(stable_partition(b["o_custkey"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"nat": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "n_active": pd.Series([], dtype="int64")}
        if not len(g) or "cust" not in g.columns:
            return pd.DataFrame(cols)
        cd = g[g["nat"].notna()]
        if not len(cd):
            return pd.DataFrame(cols)
        active = set(g.loc[g["nat"].isna(), "cust"].astype(np.int64))
        out = (pd.DataFrame({
                "nat": cd["nat"].astype(np.int64),
                "act": cd["cust"].astype(np.int64).isin(active)
                       .astype(np.int64)})
               .groupby("nat", as_index=False)
               .agg(n=("act", "size"), n_active=("act", "sum")))
        for c in ("nat", "n", "n_active"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        cust.map_batches(_tag_cust, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)
        .union(orders.map_batches(_tag_orders, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None))
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["nat"], ["n", "n_active"],
    )
    if cells is None:
        return empty
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = (dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
            if "n_nationkey" in nat.columns else {})
    rows = []
    for nk, g in cells.groupby("nat"):
        n = int(g["n"].sum())
        na = int(g["n_active"].sum())
        rows.append((nmap.get(int(nk), "unknown"), n, na,
                     float(round_half_up(np.array([na / n]), 6)[0])))
    out = pd.DataFrame(rows, columns=["n_name", "n_customers",
                                      "n_active", "active_share"])
    for c in ("n_customers", "n_active"):
        out[c] = out[c].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


def q_orders_avg_lines_trend(sf_dir: str, n_parts: int = 64):
    """Basket-size trend: lines-per-order by order YEAR — is the average
    basket shrinking as order volume grows, the operational complement
    of the monthly-growth screen.

    Exactness: integer counts; avg_lines is ONE half-up ratio divide
    per year.

    Scale shape: orders ship (orderkey, year) and lineitem ships
    orderkey into the same orderkey-hash buckets (tagged union); each
    bucket counts lines against its orders and emits (year, n_orders,
    n_lines) — calendar-bounded — for the fold. Orders with zero lines
    count in the denominator."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(o_year="int64", n_orders="int64",
                         n_lines="int64", avg_lines="float64")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    lines = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def _tag_orders(b: pa.Table) -> pa.Table:
        cols = {"okey": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_orderkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table(cols)
        yr = pc.year(b["o_orderdate"])
        return pa.table({
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "yr": pc.cast(yr, pa.int64()),
            "_part": pa.array(stable_partition(b["o_orderkey"], n_parts),
                              pa.int64())})

    def _tag_lines(b: pa.Table) -> pa.Table:
        cols = {"okey": pa.array([], pa.int64()),
                "yr": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_orderkey" not in b.column_names:
            return pa.table(cols)
        return pa.table({
            "okey": pc.cast(b["l_orderkey"], pa.int64()),
            "yr": pa.nulls(b.num_rows, pa.int64()),
            "_part": pa.array(stable_partition(b["l_orderkey"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"yr": pd.Series([], dtype="int64"),
                "n_orders": pd.Series([], dtype="int64"),
                "n_lines": pd.Series([], dtype="int64")}
        if not len(g) or "okey" not in g.columns:
            return pd.DataFrame(cols)
        od = g[g["yr"].notna()]
        if not len(od):
            return pd.DataFrame(cols)
        ld = g[g["yr"].isna()]
        cnt = (ld.groupby("okey").size() if len(ld)
               else pd.Series(dtype="int64"))
        lines_per = (od["okey"].map(cnt).fillna(0).to_numpy(np.int64)
                     if len(cnt) else np.zeros(len(od), np.int64))
        out = (pd.DataFrame({"yr": od["yr"].astype(np.int64),
                             "lines": lines_per})
               .groupby("yr", as_index=False)
               .agg(n_orders=("lines", "size"), n_lines=("lines", "sum")))
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        orders.map_batches(_tag_orders, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
        .union(lines.map_batches(_tag_lines, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None))
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["yr"], ["n_orders", "n_lines"],
    )
    if cells is None:
        return empty
    out = cells.rename(columns={"yr": "o_year"})
    for c in ("o_year", "n_orders", "n_lines"):
        out[c] = out[c].astype("int64")
    out["avg_lines"] = round_half_up(
        out["n_lines"].to_numpy(np.float64)
        / out["n_orders"].to_numpy(np.float64), 6)
    return out.sort_values("o_year").reset_index(drop=True)


def q_customers_order_regularity(sf_dir: str, n_parts: int = 64):
    """Subscription-likeness screen: per repeat customer (>= 3 orders),
    the squared coefficient of variation of their inter-order DAY gaps,
    binned to integer cells bin = (10 * (n*ss - s^2)) // s^2 — bin 0
    means clockwork reordering (cv^2 < 0.1), big bins mean bursty
    one-off behavior. Counted per bin.

    Exactness: day gaps are exact ints (ties in order dates break on
    orderkey, leaving the gap multiset invariant); the bin is PURE
    INTEGER arithmetic (no float anywhere) — n*ss and s^2 run in Python
    ints per the big-int rule.

    Scale shape: custkey-hash buckets diff each customer's ordered
    dates; buckets emit (bin, n_customers) cells for the fold."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(cv2_bin="int64", n_customers="int64")
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "okey": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "cust": pc.cast(b["o_custkey"], pa.int64()),
            "day": _day_from_us(pc.cast(b["o_orderdate"], pa.int64())),
            "okey": pc.cast(b["o_orderkey"], pa.int64()),
            "_part": pa.array(stable_partition(b["o_custkey"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"cv2_bin": pd.Series([], dtype="int64"),
                "n_customers": pd.Series([], dtype="int64")}
        if not len(g) or "cust" not in g.columns:
            return pd.DataFrame(cols)
        g = g.sort_values(["cust", "day", "okey"])
        u = g["cust"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        same = np.r_[False, u[1:] == u[:-1]]
        gaps = pd.DataFrame({"cust": u[1:][same[1:]],
                             "gap": (day[1:] - day[:-1])[same[1:]]})
        bins = []
        for cust, gg in gaps.groupby("cust")["gap"]:
            v = [int(x) for x in gg]
            n = len(v)
            if n < 2:
                continue  # < 3 orders
            s = sum(v)
            if s == 0:
                continue  # all same-day orders: cv undefined, drop
            ss = sum(x * x for x in v)
            bins.append((10 * (n * ss - s * s)) // (s * s))
        if not bins:
            return pd.DataFrame(cols)
        out = (pd.DataFrame({"cv2_bin": np.array(bins, np.int64)})
               .groupby("cv2_bin", as_index=False).size()
               .rename(columns={"size": "n_customers"}))
        for c in ("cv2_bin", "n_customers"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["cv2_bin"], ["n_customers"],
    )
    if cells is None:
        return empty
    out = cells.copy()
    for c in ("cv2_bin", "n_customers"):
        out[c] = out[c].astype("int64")
    return out.sort_values("cv2_bin").reset_index(drop=True)


def q_source_len_gini(sf_dir: str):
    """Per-source Gini of document lengths — is a source a uniform feed
    or a mix of stubs and monsters; the curation-mix read next to the
    length-MAD and log-normal screens, via the hardened grouped-Gini
    histogram shape (value_gini_per_type's recipe on n_chars).

    Exactness: the (source, n_chars, m) histogram is lossless under the
    tie-invariant rank-sum; the closed form runs in Python ints; one
    half-up divide per source. Zero-total sources drop.

    Scale shape: one histogram fold bounded by sources x distinct
    lengths; text never moves."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(source=object, n_docs="int64",
                         total_chars="int64", gini="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"source": pa.array([], pa.string()),
                "len": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64())}
        if b.num_rows == 0 or "n_chars" not in b.column_names:
            return pa.table(cols)
        g = (pd.DataFrame({
                "source": b["source"].to_pandas(),
                "len": pc.cast(b["n_chars"], pa.int64())
                       .to_numpy(zero_copy_only=False)})
             .groupby(["source", "len"], as_index=False).size()
             .rename(columns={"size": "m"}))
        for c in ("len", "m"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _fold_partials(
        _read(sf_dir, "documents", columns=["source", "n_chars"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["source", "len"], ["m"],
    )
    if hist is None:
        return empty
    rows = []
    for src, g in hist.groupby("source"):
        g = g.sort_values("len")
        cs = [int(v) for v in g["len"]]
        ms = [int(v) for v in g["m"]]
        n = sum(ms)
        sx = sum(c * m for c, m in zip(cs, ms))
        if sx <= 0:
            continue
        srx, run = 0, 0
        for c, m in zip(cs, ms):
            srx += c * (m * run + m * (m + 1) // 2)
            run += m
        gini = float(round_half_up(
            np.array([float(2 * srx - (n + 1) * sx) / float(n * sx)]),
            6)[0])
        rows.append((src, n, sx, gini))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["source", "n_docs", "total_chars",
                                      "gini"])
    for c in ("n_docs", "total_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_lineitem_qty_mode(sf_dir: str):
    """MODE aggregate: the most common order quantity per return flag
    (ties break on the LOWEST quantity) plus its frequency share — the
    "standard case size" read that a median hides when the distribution
    is multi-modal.

    Exactness: integer histogram; deterministic (count DESC, qty ASC)
    pick; ONE half-up share divide per flag.

    Scale shape: one (flag, qty, n) fold — flags x 50 cells; the pick
    is driver math."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(l_returnflag=object, mode_qty="int64",
                         n_at_mode="int64", n_lines="int64",
                         mode_share="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"flag": pa.array([], pa.string()),
                "qty": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "l_returnflag" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["l_quantity"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "flag": b["l_returnflag"].to_pandas(),
                "qty": pc.cast(b["l_quantity"], pa.int64())
                       .to_numpy(zero_copy_only=False)})
             .groupby(["flag", "qty"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("qty", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["flag", "qty"], ["n"],
    )
    if cells is None:
        return empty
    rows = []
    for flag, g in cells.groupby("flag"):
        total = int(g["n"].sum())
        top = g.sort_values(["n", "qty"],
                            ascending=[False, True]).iloc[0]
        rows.append((flag, int(top["qty"]), int(top["n"]), total,
                     float(round_half_up(
                         np.array([int(top["n"]) / total]), 6)[0])))
    out = pd.DataFrame(rows, columns=["l_returnflag", "mode_qty",
                                      "n_at_mode", "n_lines",
                                      "mode_share"])
    for c in ("mode_qty", "n_at_mode", "n_lines"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_users_day1_intensity(sf_dir: str, n_parts: int = 64):
    """Day-1 onboarding intensity: the share of each user's LIFETIME
    events that happened on their first active day, binned to deciles
    (bin = (10 * n_first) // n_total, bin 10 = single-day users) — do
    users front-load and churn, or ramp?

    Exactness: PURE INTEGER bin arithmetic over exact per-user counts.

    Scale shape: user-hash buckets count first-day vs total per user
    and emit (bin, n_users) cells — 11 per bucket."""
    import pandas as pd

    from ..partition import stable_partition

    empty = _typed_empty(decile_bin="int64", n_users="int64")
    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "user_id" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["ts"]))
        if b.num_rows == 0:
            return pa.table(cols)
        return pa.table({
            "user_id": pc.cast(b["user_id"], pa.int64()),
            "day": _day_from_us(pc.cast(b["ts"], pa.int64())),
            "_part": pa.array(stable_partition(b["user_id"], n_parts),
                              pa.int64())})

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"decile_bin": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64")}
        if not len(g) or "user_id" not in g.columns:
            return pd.DataFrame(cols)
        first_day = g.groupby("user_id")["day"].min()
        total = g.groupby("user_id").size()
        n_first = (g[g["day"] == g["user_id"].map(first_day)]
                   .groupby("user_id").size())
        bins = ((10 * n_first.reindex(total.index).fillna(0)
                 .astype(np.int64)) // total.astype(np.int64))
        out = (pd.DataFrame({"decile_bin": bins.to_numpy(np.int64)})
               .groupby("decile_bin", as_index=False).size()
               .rename(columns={"size": "n_users"}))
        for c in ("decile_bin", "n_users"):
            out[c] = out[c].astype("int64")
        return out

    cells = _fold_partials(
        ev.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas"),
        ["decile_bin"], ["n_users"],
    )
    if cells is None:
        return empty
    out = cells.copy()
    for c in ("decile_bin", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values("decile_bin").reset_index(drop=True)


def q_slowlog_zero_rows_share(sf_dir: str):
    """Wasted-work screen over the REAL slow-log parse: per class, the
    share of executions that sent ZERO rows back — high shares mark
    queries that burn time producing nothing (missing index, dead
    polling loop), the triage column next to the latency percentiles.

    Exactness: integer counts off the parsed Rows_sent metric; ONE
    half-up divide per class.

    Scale shape: per-block (class_id, n, n_zero) partials;
    class-cardinality fold."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(class_id=object, n_queries="int64",
                         n_zero_sent="int64", zero_share="float64")
    events = _flat_events(sf_dir)

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"class_id": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "n_zero": pa.array([], pa.int64())}
        if "class_id" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        rs = b["rows_sent"].to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({
                "class_id": b["class_id"].to_pandas(),
                "z": (rs == 0).astype(np.int64)})
             .groupby("class_id", as_index=False)
             .agg(n=("z", "size"), n_zero=("z", "sum")))
        for c in ("n", "n_zero"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        events.map_batches(_cells, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None),
        ["class_id"], ["n", "n_zero"],
    )
    if cells is None:
        return empty
    out = cells.rename(columns={"n": "n_queries", "n_zero": "n_zero_sent"})
    for c in ("n_queries", "n_zero_sent"):
        out[c] = out[c].astype("int64")
    out["zero_share"] = round_half_up(
        out["n_zero_sent"].to_numpy(np.float64)
        / out["n_queries"].to_numpy(np.float64), 6)
    return out.sort_values("class_id").reset_index(drop=True)


def q_source_word_len_p90(sf_dir: str):
    """Per-source p50/p90 WORD length (tokenizer-design input at the
    source granularity — which feeds carry the long-tail identifiers
    that blow up subword vocabularies).

    Exactness: explicit-ASCII whitespace split both sides (the repo's
    word rule); nearest-rank ranks over the exact (source, wlen, n)
    histogram.

    Scale shape: per-block explode collapses to (source, wlen, n) —
    bounded by sources x max word length, never token count — and the
    rank walk is driver math."""
    import pandas as pd

    from ..training.text import _ASCII_WS, _WS_RE

    empty = _typed_empty(source=object, n_words="int64", p50_len="int64",
                         p90_len="int64")
    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"source": pa.array([], pa.string()),
                "wlen": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        ex = s.str.lower().str.strip(_ASCII_WS).str.split(_WS_RE).explode()
        mask = ex.notna() & (ex != "")
        if not mask.any():
            return pa.table(cols)
        g = (pd.DataFrame({
                "source": b["source"].to_pandas()
                          .reindex(ex.index[mask]).to_numpy(),
                "wlen": ex[mask].str.len().to_numpy(np.int64)})
             .groupby(["source", "wlen"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("wlen", "n"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _fold_partials(
        docs.map_batches(_cells, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None),
        ["source", "wlen"], ["n"],
    )
    if hist is None:
        return empty
    rows = []
    for src, g in hist.groupby("source"):
        g = g.sort_values("wlen")
        cum = g["n"].to_numpy(np.int64).cumsum()
        cnt = int(cum[-1])
        vals = g["wlen"].to_numpy(np.int64)
        p50 = int(vals[np.searchsorted(cum, (50 * cnt) // 100 + 1)])
        p90 = int(vals[np.searchsorted(cum, (90 * cnt) // 100 + 1)])
        rows.append((src, cnt, p50, p90))
    out = pd.DataFrame(rows, columns=["source", "n_words", "p50_len",
                                      "p90_len"])
    for c in ("n_words", "p50_len", "p90_len"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_slowlog_lock_ratio_by_class(sf_dir: str):
    """Lock-pressure ratio per class over the REAL slow-log parse: total
    Lock_time as a share of total Query_time — classes near 1.0 spend
    their latency WAITING, the classic "add an index vs shard the hot
    row" fork in slow-query triage.

    Exactness: query times are quarter-second quanta and lock times are
    EIGHTH-second quanta by derivation (both float32-exact), so the
    engine sums qt*8 and lock*8 as INTEGERS and the ratio is ONE
    half-up ratio-of-ints divide per class. Zero-qt classes drop.

    Scale shape: per-block (class, sum_q8, sum_l8) partials;
    class-cardinality fold."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(class_id=object, n_queries="int64",
                         sum_qt="float64", sum_lock="float64",
                         lock_ratio="float64")
    events = _flat_events(sf_dir)

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"class_id": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "q8": pa.array([], pa.int64()),
                "l8": pa.array([], pa.int64())}
        if "class_id" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        qt = b["query_time"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        lt = b["lock_time"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        g = (pd.DataFrame({
                "class_id": b["class_id"].to_pandas(),
                "q8": np.floor(qt * 8.0 + 0.5).astype(np.int64),
                "l8": np.floor(lt * 8.0 + 0.5).astype(np.int64)})
             .groupby("class_id", as_index=False)
             .agg(n=("q8", "size"), q8=("q8", "sum"), l8=("l8", "sum")))
        for c in ("n", "q8", "l8"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        events.map_batches(_cells, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None),
        ["class_id"], ["n", "q8", "l8"],
    )
    if cells is None:
        return empty
    rows = []
    for cid, g in cells.groupby("class_id"):
        q8 = sum(int(v) for v in g["q8"])
        l8 = sum(int(v) for v in g["l8"])
        if q8 <= 0:
            continue
        rows.append((cid, int(g["n"].sum()), q8 / 8.0, l8 / 8.0,
                     float(round_half_up(np.array([l8 / q8]), 6)[0])))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["class_id", "n_queries", "sum_qt",
                                      "sum_lock", "lock_ratio"])
    out["n_queries"] = out["n_queries"].astype("int64")
    return out.sort_values("class_id").reset_index(drop=True)


def q_events_weekend_effect(sf_dir: str):
    """Weekend effect: event count and value per weekday-vs-weekend
    bucket plus the per-day-normalized traffic ratio — does the product
    live on office hours or on couches? (dow 0=Sunday, 6=Saturday per
    the repo's epoch-day arithmetic.)

    Exactness: integer counts/cents; the ratio normalizes by bucket
    width ((n_weekend * 5) vs (n_weekday * 2) — pure ints) and rounds
    half-up once.

    Scale shape: one 2-cell counter fold."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(bucket=object, n_events="int64",
                         value_cents="int64", per_day_ratio="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"is_we": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(pc.is_valid(b["ts"]),
                             pc.is_valid(b["value"])))
        if b.num_rows == 0:
            return pa.table(cols)
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = (us // 86_400_000_000 + 4) % 7
        g = (pd.DataFrame({
                "is_we": ((dow == 0) | (dow == 6)).astype(np.int64),
                "cents": _cents(b["value"]).to_numpy(zero_copy_only=False)})
             .groupby("is_we", as_index=False)
             .agg(n=("cents", "size"), cents=("cents", "sum")))
        for c in ("is_we", "n", "cents"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts", "value"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["is_we"], ["n", "cents"],
    )
    if cells is None:
        return empty
    by = {int(r.is_we): (int(r.n), int(r.cents))
          for r in cells.itertuples()}
    n_wd, c_wd = by.get(0, (0, 0))
    n_we, c_we = by.get(1, (0, 0))
    if n_wd == 0 and n_we == 0:
        return empty
    # per-day-normalized weekend/weekday traffic ratio: (we/2) / (wd/5),
    # defined only when BOTH buckets have traffic (0.0 sentinel otherwise,
    # mirrored by the oracle's CASE)
    ratio = (float(round_half_up(
        np.array([(n_we * 5) / (n_wd * 2)]), 6)[0])
        if n_wd > 0 and n_we > 0 else 0.0)
    rows = []
    if n_wd > 0:
        rows.append(("weekday", n_wd, c_wd, ratio))
    if n_we > 0:
        rows.append(("weekend", n_we, c_we, ratio))
    out = pd.DataFrame(rows, columns=["bucket", "n_events",
                                      "value_cents", "per_day_ratio"])
    for c in ("n_events", "value_cents"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def q_orders_priority_mix_trend(sf_dir: str):
    """Priority-mix trend: per order year, the share of URGENT+HIGH
    orders — is the business drifting toward everything-is-urgent (the
    ops-load leading indicator).

    Exactness: integer counts; ONE half-up divide per year.

    Scale shape: one (year, n, n_hot) counter fold, calendar-bounded."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(o_year="int64", n_orders="int64", n_hot="int64",
                         hot_share="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"yr": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "hot": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_orderdate" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table(cols)
        pri = b["o_orderpriority"].to_pandas().to_numpy(object)
        hot = np.array([p in ("1-URGENT", "2-HIGH") for p in pri],
                       dtype=np.int64)
        g = (pd.DataFrame({
                "yr": pc.cast(pc.year(b["o_orderdate"]), pa.int64())
                      .to_numpy(zero_copy_only=False),
                "hot": hot})
             .groupby("yr", as_index=False)
             .agg(n=("hot", "size"), hot=("hot", "sum")))
        for c in ("yr", "n", "hot"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "orders", columns=["o_orderdate", "o_orderpriority"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["yr"], ["n", "hot"],
    )
    if cells is None:
        return empty
    out = cells.rename(columns={"yr": "o_year", "n": "n_orders",
                                "hot": "n_hot"})
    for c in ("o_year", "n_orders", "n_hot"):
        out[c] = out[c].astype("int64")
    out["hot_share"] = round_half_up(
        out["n_hot"].to_numpy(np.float64)
        / out["n_orders"].to_numpy(np.float64), 6)
    return out.sort_values("o_year").reset_index(drop=True)


def q_embed_label_norms(sf_dir: str):
    """Class-conditional norm check over the labeled embeddings: per
    label, exact integer-unit moments of the SQUARED L2 norm — the
    embedding-collapse / miscalibration screen (a label whose vectors
    are systematically shorter is under-trained).

    Exactness: components quantize once to 1e-6 units (f32->f64 exact);
    the squared norm per vector is an exact integer sum of unit squares;
    per-label sums recombine in PYTHON ints and ship limb-free below
    the documented bound (unit^2 ~ 4e12, x64 dims x rows: fail-fast at
    2^63 like the sibling folds).

    Scale shape: blocks fold to (label, n, sum_sq_hi, sum_sq_lo) rows
    (hi/lo LIMBS per the big-int rule); label-cardinality driver math."""
    import pandas as pd

    empty = _typed_empty(label="int64", n_vectors="int64",
                         sumsq_units_str=object, mean_sq="float64")
    LIMB = (1 << 30) - 1
    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"label": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "hi": pa.array([], pa.int64()),
                "lo": pa.array([], pa.int64())}
        if "embedding" not in b.column_names or b.num_rows == 0:
            return pa.table(cols)
        col = b["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // b.num_rows
        x = flat.astype(np.float64).reshape(b.num_rows, d)
        xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
        sq = (xq * xq).sum(axis=1)  # per-vector: <= 64 * ~4e12 — safe
        lab = pc.cast(b["label"], pa.int64()).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"label": lab, "sq": sq})
             .groupby("label", as_index=False)
             .agg(n=("sq", "size"), s=("sq", "sum")))
        g["hi"] = g["s"] // (LIMB + 1)
        g["lo"] = g["s"] % (LIMB + 1)
        g = g.drop(columns=["s"])
        for c in g.columns:
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        ds.map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None),
        ["label"], ["n", "hi", "lo"],
    )
    if cells is None:
        return empty
    rows = []
    for lab, g in cells.groupby("label"):
        n = int(g["n"].sum())
        ssq = (int(g["hi"].sum()) << 30) + int(g["lo"].sum())
        if n == 0:
            continue
        # mean squared norm in units^2, as the oracle's CAST chain
        rows.append((int(lab), n, str(ssq),
                     float(np.round(
                         np.float64(ssq) / np.float64(n), 6))))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["label", "n_vectors",
                                      "sumsq_units_str", "mean_sq"])
    for c in ("label", "n_vectors"):
        out[c] = out[c].astype("int64")
    return out.sort_values("label").reset_index(drop=True)


def q_docs_prefix_dup_rate(sf_dir: str, prefix_chars: int = 32,
                           n_parts: int = 64):
    """Prefix-collision duplication screen: the share of documents whose
    first ``prefix_chars`` characters are shared with at least one OTHER
    document — the cheapest boilerplate/template detector (exact-match
    complement of the edit-distance prefix screen).

    Exactness: integer counts over exact prefix groups.

    Scale shape: batches emit (prefix, n) partials; prefixes hash-bucket
    (stable_partition) so each prefix's global count lives in one task;
    buckets emit ONE (n_docs, n_dup) counter row each. Text beyond the
    prefix never ships."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(n_docs="int64", n_prefix_dup="int64",
                         dup_share="float64")
    docs = _read(sf_dir, "documents", columns=["text"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"prefix": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "text" not in b.column_names:
            return pa.table(cols)
        s = b["text"].to_pandas()
        s = s[s.notna()]
        if not len(s):
            return pa.table(cols)
        g = (pd.DataFrame({"prefix": s.str.slice(0, prefix_chars)})
             .groupby("prefix", as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        g["_part"] = stable_partition(
            pa.array(g["prefix"], pa.string()), n_parts)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_docs": pd.Series([], dtype="int64"),
                "n_dup": pd.Series([], dtype="int64")}
        if not len(g) or "prefix" not in g.columns:
            return pd.DataFrame(cols)
        tot = g.groupby("prefix")["n"].sum()
        return pd.DataFrame({
            "n_docs": np.array([int(tot.sum())], np.int64),
            "n_dup": np.array([int(tot[tot >= 2].sum())], np.int64)})

    parts = (
        docs.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas())
    if not len(parts) or "n_docs" not in parts.columns:
        return empty
    n = int(parts["n_docs"].sum())
    if n == 0:
        return empty
    dup = int(parts["n_dup"].sum())
    return pd.DataFrame({
        "n_docs": np.array([n], np.int64),
        "n_prefix_dup": np.array([dup], np.int64),
        "dup_share": round_half_up(np.array([dup / n], np.float64), 6)})


def q_orders_sameday_multi(sf_dir: str, n_parts: int = 64):
    """Same-day multi-order screen: how many customers EVER placed two
    or more orders on one calendar day — the impulse-buyer /
    automation-signal split (fraud teams read the share, growth teams
    read the count).

    Exactness: integer counts on exact (custkey, day) groups; ONE
    half-up share divide.

    Scale shape: custkey-hash buckets count each customer's max
    orders-per-day and emit ONE (n_customers, n_multi) counter row."""
    import pandas as pd

    from ..partition import stable_partition
    from ..util import round_half_up

    empty = _typed_empty(n_customers="int64", n_multi="int64",
                         multi_share="float64")
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def _tag(b: pa.Table) -> pa.Table:
        cols = {"cust": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_custkey" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.is_valid(b["o_orderdate"]))
        if b.num_rows == 0:
            return pa.table(cols)
        g = (pd.DataFrame({
                "cust": pc.cast(b["o_custkey"], pa.int64())
                        .to_numpy(zero_copy_only=False),
                "day": _day_from_us(pc.cast(b["o_orderdate"], pa.int64()))
                       .to_numpy(zero_copy_only=False)})
             .groupby(["cust", "day"], as_index=False).size()
             .rename(columns={"size": "n"}))
        for c in ("cust", "day", "n"):
            g[c] = g[c].astype("int64")
        g["_part"] = stable_partition(
            pa.array(g["cust"], from_pandas=True), n_parts)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_customers": pd.Series([], dtype="int64"),
                "n_multi": pd.Series([], dtype="int64")}
        if not len(g) or "cust" not in g.columns:
            return pd.DataFrame(cols)
        per_day = g.groupby(["cust", "day"])["n"].sum()
        max_per_day = per_day.groupby(level=0).max()
        return pd.DataFrame({
            "n_customers": np.array([len(max_per_day)], np.int64),
            "n_multi": np.array([int((max_per_day >= 2).sum())],
                                np.int64)})

    parts = (
        ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
        .groupby("_part").map_groups(_bucket, batch_format="pandas")
        .to_pandas())
    if not len(parts) or "n_customers" not in parts.columns:
        return empty
    n = int(parts["n_customers"].sum())
    if n == 0:
        return empty
    multi = int(parts["n_multi"].sum())
    return pd.DataFrame({
        "n_customers": np.array([n], np.int64),
        "n_multi": np.array([multi], np.int64),
        "multi_share": round_half_up(
            np.array([multi / n], np.float64), 6)})


def q_events_cvr_by_dow(sf_dir: str):
    """Conversion rate by day-of-week: purchases per view for each dow
    (Sunday=0 per the repo's epoch-day arithmetic) — do weekends browse
    without buying, the scheduling input for promo pushes.

    Exactness: integer counts; ONE half-up divide per dow; dows with
    zero views drop (the oracle's WHERE).

    Scale shape: one 7 x 2 counter fold."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(dow="int64", n_views="int64",
                         n_purchases="int64", cvr="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"dow": pa.array([], pa.int64()),
                "v": pa.array([], pa.int64()),
                "p": pa.array([], pa.int64())}
        if b.num_rows == 0 or "ts" not in b.column_names:
            return pa.table(cols)
        b = b.filter(pc.and_(
            pc.is_valid(b["ts"]),
            pc.is_in(b["event_type"],
                     value_set=pa.array(["view", "purchase"]))))
        if b.num_rows == 0:
            return pa.table(cols)
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = b["event_type"].to_pandas()
        g = (pd.DataFrame({
                "dow": ((us // 86_400_000_000 + 4) % 7).astype(np.int64),
                "v": (et == "view").to_numpy(np.int64),
                "p": (et == "purchase").to_numpy(np.int64)})
             .groupby("dow", as_index=False)[["v", "p"]].sum())
        for c in ("dow", "v", "p"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "events", columns=["ts", "event_type"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["dow"], ["v", "p"],
    )
    if cells is None:
        return empty
    cells = cells[cells["v"] > 0]
    if not len(cells):
        return empty
    out = pd.DataFrame({
        "dow": cells["dow"].astype("int64"),
        "n_views": cells["v"].astype("int64"),
        "n_purchases": cells["p"].astype("int64"),
        "cvr": round_half_up(
            cells["p"].to_numpy(np.float64)
            / cells["v"].to_numpy(np.float64), 6)})
    return out.sort_values("dow").reset_index(drop=True)


def q_orders_status_priority_matrix(sf_dir: str):
    """Status x priority contingency matrix with row shares: how order
    status distributes within each priority — the fulfillment-health
    cross-tab (URGENT orders stuck in 'O' is the page).

    Exactness: integer counts; half-up row shares.

    Scale shape: one statuses x priorities counter fold (~15 cells)."""
    import pandas as pd

    from ..util import round_half_up

    empty = _typed_empty(o_orderpriority=object, o_orderstatus=object,
                         n_orders="int64", row_share="float64")

    def _cells(b: pa.Table) -> pa.Table:
        cols = {"pri": pa.array([], pa.string()),
                "st": pa.array([], pa.string()),
                "n": pa.array([], pa.int64())}
        if b.num_rows == 0 or "o_orderpriority" not in b.column_names:
            return pa.table(cols)
        g = (pd.DataFrame({
                "pri": b["o_orderpriority"].to_pandas(),
                "st": b["o_orderstatus"].to_pandas()})
             .groupby(["pri", "st"], as_index=False).size()
             .rename(columns={"size": "n"}))
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _fold_partials(
        _read(sf_dir, "orders",
              columns=["o_orderpriority", "o_orderstatus"])
        .map_batches(_cells, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None),
        ["pri", "st"], ["n"],
    )
    if cells is None:
        return empty
    tot = cells.groupby("pri")["n"].transform("sum")
    out = pd.DataFrame({
        "o_orderpriority": cells["pri"].astype(object),
        "o_orderstatus": cells["st"].astype(object),
        "n_orders": cells["n"].astype("int64"),
        "row_share": round_half_up(
            cells["n"].to_numpy(np.float64) / tot.to_numpy(np.float64),
            6)})
    return (out.sort_values(["o_orderpriority", "o_orderstatus"])
            .reset_index(drop=True))
