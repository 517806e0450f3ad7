"""Parse stage: tokenized docs -> flat Arrow event rows.

The reference's serial file-reader state machine (slow.go:73-142) plus its
separately-parallelized fingerprint worker pool (bin/parser-cli.go:29-56)
fuse into ONE stateless ``map_batches`` stage here: each input row carries a
full doc's text, so all cross-line parser state is confined to one row and
blocks parse independently - the input Parquet's row groups provide the
sharding the reference's single-file scan could never have.

Batch flow (batch_format="pyarrow", zero-copy from the object store):
  1. detokenize the whole batch's list<int32> column with two numpy ops
     (cast child values to uint8, slice by list offsets);
  2. run the per-doc state machine (functions/slowlog.py) per row;
  3. fingerprint + checksum each event with a per-worker memo cache (hot
     query texts repeat heavily, so most lookups skip the regex chain);
  4. emit one flat Arrow row per event; dynamic metric names are preserved
     in map<string, T> columns, matching the reference's semi-dynamic
     Event struct (event.go:34-47).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import numpy as np
import pyarrow as pa

from ..functions.fingerprint import Checksum, Fingerprint
from ..functions.genlog import parse_general_log_text
from ..functions.jsonlog import parse_json_log_text
from ..functions.slowlog import parse_slow_log_text
from ..options import Options

# Format registry - the Ray-side equivalent of the reference's intended
# MySQLLogParser plugin interface (parser.go:3-4): text-parser callables
# keyed by format name, all emitting the same event-dict shape so every
# downstream stage is format-agnostic.
PARSER_REGISTRY = {
    "slowlog": parse_slow_log_text,
    "genlog": parse_general_log_text,
    "jsonlog": parse_json_log_text,
}


def register_parser(fmt: str, fn) -> None:
    """Register a per-doc text parser: fn(text, start_offset,
    filter_admin_command) -> list of event dicts (new_event shape).
    When Options.debug is set the parser is called with an extra
    ``debug=True`` kwarg (trace to stdout); parsers may ignore it."""
    PARSER_REGISTRY[fmt] = fn
from ..sources.sequences import detokenize_column

EVENT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("n_tok", pa.int32()),
        ("event_seq", pa.int32()),
        ("offset", pa.uint64()),
        ("ts", pa.string()),
        ("admin", pa.bool_()),
        ("query", pa.string()),
        ("user", pa.string()),
        ("host", pa.string()),
        ("db", pa.string()),
        ("rate_type", pa.string()),
        ("rate_limit", pa.uint8()),
        ("time_metrics", pa.map_(pa.string(), pa.float32())),
        ("number_metrics", pa.map_(pa.string(), pa.uint64())),
        ("bool_metrics", pa.map_(pa.string(), pa.bool_())),
        ("fingerprint", pa.string()),
        ("class_id", pa.string()),
    ]
)

# Routed outputs carry the token payload as packed bytes: parquet encodes a
# binary column ~10x faster and ~2x smaller than list<int32> (measured on
# the bench corpus), and the int32 token array is recovered exactly via
# route.restore_tokens (detokenize/retokenize is a bijection here).
_TOKEN_BYTES_FIELD = pa.field("token_bytes", pa.binary())

# Per-worker fingerprint memo: literal query text -> (fingerprint, class_id).
# Slow logs repeat hot queries heavily; a hit skips the whole regex chain.
_FP_CACHE: Dict[str, tuple] = {}
_FP_CACHE_MAX = 100_000


def _fingerprint_cached(query: str) -> tuple:
    hit = _FP_CACHE.get(query)
    if hit is None:
        fp = Fingerprint(query)
        hit = (fp, Checksum(fp))
        if len(_FP_CACHE) >= _FP_CACHE_MAX:
            _FP_CACHE.clear()
        _FP_CACHE[query] = hit
    return hit


def parse_events_batch(
    batch: pa.Table,
    opt: Options = Options(),
    include_tokens: bool = False,
    on_error: str = "raise",
    fmt: str = "slowlog",
    parse_text=None,
) -> pa.Table:
    """One Arrow batch of docs -> one Arrow batch of events.

    ``parse_text`` (when given) overrides the registry lookup — the stage
    factories resolve the parser ON THE DRIVER and ship the function with
    the closure, so ``register_parser`` registrations made in the driver
    process work in workers (each worker's module-level registry only has
    the built-ins)."""
    parse_text = parse_text if parse_text is not None else PARSER_REGISTRY[fmt]
    texts = detokenize_column(batch["tokens"])
    doc_ids = batch["doc_id"].to_pylist()
    sources = (
        batch["source"].to_pylist() if "source" in batch.column_names else [""] * len(texts)
    )
    n_toks = (
        batch["n_tok"].to_pylist() if "n_tok" in batch.column_names else [len(t) for t in texts]
    )

    filt = opt.filter_admin_command
    start = opt.start_offset
    # Options.Debug (options.go:7): per-line state traces to worker stdout.
    # Passed only when on AND the registered parser declares it, so
    # third-party parsers with the documented 3-arg signature keep working
    # (an unexpected kwarg would otherwise TypeError in every worker).
    kw = {}
    if opt.debug:
        import inspect

        try:
            params = inspect.signature(parse_text).parameters
            if "debug" in params or any(
                p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
            ):
                kw = {"debug": True}
        except (TypeError, ValueError):
            pass
    # (input row idx, event_seq, event) flat list; columns are then built
    # with one C-driven comprehension per column instead of 18 appends per
    # event inside a Python loop (measured ~25% of this function)
    flat: List[tuple] = []
    for i, data in enumerate(texts):
        try:
            events = parse_text(
                data, start_offset=start, filter_admin_command=filt, **kw
            )
        except Exception:
            if on_error == "skip":
                continue
            raise
        flat.extend((i, seq, ev) for seq, ev in enumerate(events))

    fps_cids = [_fingerprint_cached(ev["query"]) for _, _, ev in flat]
    cols: Dict[str, list] = {
        "doc_id": [doc_ids[i] for i, _, _ in flat],
        "source": [sources[i] for i, _, _ in flat],
        "n_tok": [n_toks[i] for i, _, _ in flat],
        "event_seq": [seq for _, seq, _ in flat],
        "offset": [ev["offset"] for _, _, ev in flat],
        "ts": [ev["ts"] for _, _, ev in flat],
        "admin": [ev["admin"] for _, _, ev in flat],
        "query": [ev["query"] for _, _, ev in flat],
        "user": [ev["user"] for _, _, ev in flat],
        "host": [ev["host"] for _, _, ev in flat],
        "db": [ev["db"] for _, _, ev in flat],
        "rate_type": [ev["rate_type"] for _, _, ev in flat],
        "rate_limit": [ev["rate_limit"] for _, _, ev in flat],
        "time_metrics": [list(ev["time_metrics"].items()) for _, _, ev in flat],
        "number_metrics": [list(ev["number_metrics"].items()) for _, _, ev in flat],
        "bool_metrics": [list(ev["bool_metrics"].items()) for _, _, ev in flat],
        "fingerprint": [fc[0] for fc in fps_cids],
        "class_id": [fc[1] for fc in fps_cids],
    }
    tok_rows: List[int] = [i for i, _, _ in flat] if include_tokens else []

    arrays = [
        pa.array(cols[f.name], type=f.type) for f in EVENT_SCHEMA
    ]
    out = pa.Table.from_arrays(arrays, schema=EVENT_SCHEMA)
    if include_tokens:
        out = out.append_column(
            _TOKEN_BYTES_FIELD,
            pa.array([texts[i] for i in tok_rows], pa.binary()),
        )
    return out


def make_parse_fn(
    opt: Options = Options(), include_tokens: bool = False, on_error: str = "raise",
    fmt: str = "slowlog", slice_size: int = 2048,
):
    """A picklable map_batches callable with options bound.

    Large input blocks are parsed in ``slice_size``-row slices INSIDE the
    fn (cache locality: ~25% faster than parsing a whole 20k-row block at
    once) while the stage itself runs with batch_size=None so Ray never
    rebatches blocks - rebatching copies every block through a buffering
    fence, measured slower end-to-end.
    """

    # resolve HERE (driver) so custom register_parser() registrations are
    # shipped with the closure instead of re-looked-up in workers
    parse_text = PARSER_REGISTRY[fmt]

    def _parse(batch: pa.Table) -> pa.Table:
        if batch.num_rows > slice_size:
            return pa.concat_tables(
                [
                    parse_events_batch(
                        batch.slice(i, slice_size), opt=opt,
                        include_tokens=include_tokens, on_error=on_error, fmt=fmt,
                        parse_text=parse_text,
                    )
                    for i in range(0, batch.num_rows, slice_size)
                ]
            )
        return parse_events_batch(
            batch, opt=opt, include_tokens=include_tokens, on_error=on_error,
            fmt=fmt, parse_text=parse_text,
        )

    return _parse


def parse_events(
    ds,
    opt: Options = Options(),
    include_tokens: bool = False,
    on_error: str = "raise",
    batch_size: Optional[int] = None,
    fmt: str = "slowlog",
    **map_kwargs,
):
    """Dataset of sequences -> Dataset of events.

    Stateless tasks (not an actor pool): the regex tables are compiled at
    module import in each worker process, and the fingerprint memo lives at
    module scope, so tasks get actor-style amortization for free.
    """
    return ds.map_batches(
        make_parse_fn(opt, include_tokens, on_error, fmt),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        **map_kwargs,
    )
