"""Deterministic synthetic inputs.

Three generators, all seedless/deterministic so oracle SQL can reproduce
expected values exactly:

* ``reference_fixture_table`` - the reference's own conformance logs
  (/root/reference/test/logs/*.log) packed one doc per file, for Ray-stage
  golden tests.
* ``sequences_from_documents`` - derives a slow-log event text per row of
  the driver's ``documents`` table via closed-form arithmetic on
  (doc_id, n_chars, source). Every derived field is expressible in ANSI SQL
  over ``documents``, which is what makes the end-to-end parse -> fingerprint
  -> aggregate pipeline oracle-checkable by DuckDB.
* ``generate_corpus`` - a scalable benchmark corpus: Zipf-skewed sources,
  multi-event docs, admin commands, meta banner lines.

The derivation formulas (keep in sync with __ray_entry__.oracle_sql):
  t    = n_chars % 4                    (query template)
  qt   = (n_chars % 128) / 4.0          (Query_time; exact in float32)
  lt   = (n_chars % 32) / 8.0           (Lock_time)
  rs   = n_chars % 7                    (Rows_sent)
  rx   = n_chars % 11                   (Rows_examined)
  tid  = n_chars % 100                  (Thread_id)
  user = 'u' || (n_chars % 5)
  db   = 'db' || (n_chars % 3)          (via a ``use`` line)
  query params: n = n_chars, m = doc_id
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa

from ..functions.fingerprint import Checksum, Fingerprint
from .sequences import build_sequences_table

REFERENCE_LOGS_DIR = "/root/reference/test/logs"

# Query templates for the documents-derived corpus; fingerprints/class ids
# are fixed constants of the templates (verified in tests).
TEMPLATES = [
    ("SELECT c FROM tbl WHERE id={n}", "select c from tbl where id=?", "13C8FF6BEE79084C"),
    (
        "SELECT * FROM orders WHERE user_id = {n} LIMIT 10",
        "select * from orders where user_id = ? limit ?",
        "1C395D3A9B447FA4",
    ),
    (
        "INSERT INTO logs (a, b) VALUES ({n}, {m})",
        "insert into logs (a, b) values(?+)",
        "15B60CDA6C445218",
    ),
    (
        "UPDATE users SET last_seen = {n} WHERE id = {m}",
        "update users set last_seen = ? where id = ?",
        "F86ABC872D7AEE75",
    ),
]


def derived_event_text(doc_id: int, n_chars: int) -> str:
    """One complete slow-log event for a documents row (see module docstring)."""
    t = n_chars % 4
    qt = (n_chars % 128) / 4.0
    lt = (n_chars % 32) / 8.0
    u = n_chars % 5
    s = n_chars % 3
    query = TEMPLATES[t][0].format(n=n_chars, m=doc_id)
    return (
        f"# User@Host: u{u}[u{u}] @ localhost []\n"
        f"# Thread_id: {n_chars % 100}  Last_errno: 0\n"
        f"# Query_time: {qt}  Lock_time: {lt}  "
        f"Rows_sent: {n_chars % 7}  Rows_examined: {n_chars % 11}\n"
        f"use db{s};\n"
        f"SET timestamp={1400000000 + doc_id};\n"
        f"{query};\n"
    )


def sequences_from_documents(documents: pa.Table) -> pa.Table:
    """Derive the sequences table from a ``documents`` Arrow table/batch."""
    doc_ids = documents["doc_id"].to_pylist()
    n_chars = documents["n_chars"].to_pylist()
    sources = documents["source"].to_pylist()
    texts = [derived_event_text(d, n) for d, n in zip(doc_ids, n_chars)]
    return build_sequences_table(texts, [str(d) for d in doc_ids], sources)


def derived_genlog_text(doc_id: int, n_chars: int) -> str:
    """One general-log session (Connect / Query / Quit) per documents row.

    Deterministic closed form mirrored by the genlog oracle SQL in
    __ray_entry__: ts = utc strftime('%y%m%d %H:%M:%S') of
    1400000000+doc_id on the Connect line only; thread id, user, db and
    the query template reuse the slow-log derivation moduli.
    """
    from datetime import datetime, timezone

    t = n_chars % 4
    u = n_chars % 5
    s = n_chars % 3
    tid = n_chars % 100
    ts = datetime.fromtimestamp(1400000000 + doc_id, tz=timezone.utc).strftime(
        "%y%m%d %H:%M:%S"
    )
    query = TEMPLATES[t][0].format(n=n_chars, m=doc_id)
    return (
        f"{ts}\t{tid} Connect\tu{u}@localhost on db{s}\n"
        f"\t\t{tid} Query\t{query}\n"
        f"\t\t{tid} Quit\t\n"
    )


def derived_jsonlog_text(doc_id: int, n_chars: int) -> str:
    """One JSON-lines event per documents row (same value derivation as the
    slow-log family, so the oracle SQL fragments are shared)."""
    import json

    t = n_chars % 4
    query = TEMPLATES[t][0].format(n=n_chars, m=doc_id)
    obj = {
        "ts": str(1400000000 + doc_id),
        "user": f"u{n_chars % 5}",
        "host": "localhost",
        "db": f"db{n_chars % 3}",
        "query": query,
        "query_time": (n_chars % 128) / 4.0,
        "lock_time": (n_chars % 32) / 8.0,
        "rows_sent": n_chars % 7,
        "rows_examined": n_chars % 11,
        "full_scan": bool(n_chars % 2),
    }
    return json.dumps(obj, separators=(",", ":")) + "\n"


def jsonlog_sequences_from_documents(documents: pa.Table) -> pa.Table:
    """Derive a JSON-lines sequences table from ``documents``."""
    doc_ids = documents["doc_id"].to_pylist()
    n_chars = documents["n_chars"].to_pylist()
    sources = documents["source"].to_pylist()
    texts = [derived_jsonlog_text(d, n) for d, n in zip(doc_ids, n_chars)]
    return build_sequences_table(texts, [str(d) for d in doc_ids], sources)


def genlog_sequences_from_documents(documents: pa.Table) -> pa.Table:
    """Derive a general-log sequences table from ``documents``."""
    doc_ids = documents["doc_id"].to_pylist()
    n_chars = documents["n_chars"].to_pylist()
    sources = documents["source"].to_pylist()
    texts = [derived_genlog_text(d, n) for d, n in zip(doc_ids, n_chars)]
    return build_sequences_table(texts, [str(d) for d in doc_ids], sources)


def reference_fixture_table(logs_dir: str = REFERENCE_LOGS_DIR) -> pa.Table:
    """The reference conformance logs, one doc per file."""
    texts, ids, sources = [], [], []
    for path in sorted(glob.glob(os.path.join(logs_dir, "*.log"))):
        with open(path, "rb") as f:
            texts.append(f.read())
        name = os.path.splitext(os.path.basename(path))[0]
        ids.append(name)
        sources.append(f"fixture-{name}")
    return build_sequences_table(texts, ids, sources)


def dim_for_sources(sources: Sequence[str]) -> pa.Table:
    """Source-metadata dimension table (enrichment input; FIXTURES.md §2).

    Deterministic in the numeric suffix of the source id so oracle SQL can
    reproduce it: region = 'region' || (k%3), tier = prod/staging by k%2,
    sink = 'sink' || (k%4), where k = numeric suffix (0 if none).
    """
    rows = sorted(set(sources))
    ks = [_source_key(s) for s in rows]
    return pa.table(
        {
            "source": pa.array(rows, pa.string()),
            "region": pa.array([f"region{k % 3}" for k in ks], pa.string()),
            "tier": pa.array(["prod" if k % 2 == 0 else "staging" for k in ks]),
            "sink": pa.array([f"sink{k % 4}" for k in ks], pa.string()),
        }
    )


def _source_key(source: str) -> int:
    digits = "".join(c for c in source if c.isdigit())
    return int(digits) if digits else 0


# ---------------------------------------------------------------------------
# Benchmark corpus
# ---------------------------------------------------------------------------

_ADMIN_COMMANDS = ["Quit", "Refresh", "Init DB", "Ping"]


def _corpus_event_text(i: int, rng_vals: np.ndarray) -> str:
    """One event for the bench corpus; params derived from row index."""
    n = int(rng_vals[i % len(rng_vals)])
    return derived_event_text(i, n)


def generate_corpus(
    n_docs: int,
    seed: int = 42,
    n_sources: int = 64,
    multi_event_fraction: float = 0.05,
    admin_fraction: float = 0.02,
    banner_fraction: float = 0.01,
    out_path: Optional[str] = None,
    rows_per_file: int = 25_000,
    row_group_size: int = 8_192,
):
    """Deterministic bench corpus of slow-log docs as a sequences table.

    Sources follow a Zipf-ish distribution (one hot source takes ~25% of
    docs) to exercise skew handling. ~multi_event_fraction of docs carry 3
    events (boundary semantics inside one doc); ~admin_fraction end with an
    admin command; ~banner_fraction start with server restart meta lines.

    Writes sharded Parquet files under ``out_path`` if given (one file per
    ``rows_per_file`` rows, so readers see many independent row groups),
    else returns one Arrow table.
    """
    rng = np.random.default_rng(seed)
    # Zipf-skewed source choice.
    weights = 1.0 / np.arange(1, n_sources + 1) ** 1.2
    weights /= weights.sum()
    src_idx = rng.choice(n_sources, size=n_docs, p=weights)
    n_chars = rng.integers(40, 600, size=n_docs)
    kinds = rng.random(n_docs)

    tables = []
    texts: List[str] = []
    ids: List[str] = []
    srcs: List[str] = []
    file_no = 0

    def flush():
        nonlocal file_no, texts, ids, srcs
        if not texts:
            return
        table = build_sequences_table(texts, ids, srcs)
        if out_path is None:
            tables.append(table)
        else:
            import pyarrow.parquet as pq

            os.makedirs(out_path, exist_ok=True)
            pq.write_table(
                table,
                os.path.join(out_path, f"part-{file_no:05d}.parquet"),
                row_group_size=row_group_size,
            )
            file_no += 1
        texts, ids, srcs = [], [], []

    for i in range(n_docs):
        n = int(n_chars[i])
        parts = []
        if kinds[i] < banner_fraction:
            parts.append(
                "/usr/sbin/mysqld, Version: 5.6.15-log (binary). started with:\n"
                "Tcp port: 3306  Unix socket: /var/lib/mysql/mysql.sock\n"
                "Time                 Id Command    Argument\n"
            )
        parts.append(derived_event_text(i, n))
        if kinds[i] > 1.0 - multi_event_fraction:
            parts.append(derived_event_text(i, n + 1))
            parts.append(derived_event_text(i, n + 2))
        if banner_fraction <= kinds[i] < banner_fraction + admin_fraction:
            cmd = _ADMIN_COMMANDS[i % len(_ADMIN_COMMANDS)]
            parts.append(
                f"# User@Host: adm[adm] @ localhost []\n"
                f"# Query_time: 0.000002  Lock_time: 0.000000  Rows_sent: 0  Rows_examined: 0\n"
                f"# administrator command: {cmd};\n"
            )
        texts.append("".join(parts))
        ids.append(f"doc-{i:09d}")
        srcs.append(f"src{int(src_idx[i])}")
        if len(texts) >= rows_per_file:
            flush()
    flush()
    if out_path is None:
        return pa.concat_tables(tables)
    return out_path
