"""MySQL slow-query-log event extraction: a per-doc line state machine.

Behavioral parity with the reference parser
(/root/reference/log/parser/slow.go). In the reference the state machine
spans a whole file read serially; in this engine each input row (``doc_id``)
carries one chunk of log text, so all cross-line state is confined to a
single row's parse and the stage is an order-free, embarrassingly parallel
``map_batches``. Semantics preserved verbatim:

* meta-line filter (restart banner / ``Tcp port:`` / ``Time`` header,
  slow.go:107-119), applied to the raw line *with* its newline
* header/query/admin dispatch (slow.go:124-132, 152-289)
* byte-offset accounting including the reference's +1 quirk for non-zero
  line offsets (slow.go:93-100) - recorded event offsets are
  ``true_start + 1`` except at offset 0
* ``Schema:`` metric vs first-query-line ``use db;`` precedence
  (slow.go:210-211, 245-251)
* metric type dispatch by name suffix / value shape (slow.go:196-222);
  parse failures silently yield 0
* events lacking ``Query_time`` (partial leading event after a resume) are
  dropped (slow.go:305-311); slow016/slow017 semantics
* a final line with no trailing newline is discarded (bufio.ReadString err
  path, slow.go:87-91)
* admin-command filtering (slow.go:270-289)

Events are plain dicts; stages/parse.py turns batches of docs into Arrow.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Union

import numpy as np

# slow.go:16-21 regex table.
_time_re = re.compile(r"Time: (\S+\s{1,2}\S+)")
_user_re = re.compile(r"User@Host: ([^\[]+|\[[^[]+\]).*?@ (\S*) \[(.*)\]")
_header_re = re.compile(r"^#\s+[A-Z]")
_metrics_re = re.compile(r"(\w+): (\S+|$)")
_admin_re = re.compile(r"command: (.+)")
_set_re = re.compile(r"SET (?:last_insert_id|insert_id|timestamp)")

_UINT64_MAX = (1 << 64) - 1


class MissingQueryTimeError(RuntimeError):
    """Raised where the reference panics: an event with zero header lines
    reached finalization without a Query_time (slow.go:306-308)."""


def new_event() -> Dict:
    """Mirror of log.NewEvent (/root/reference/log/event.go:49-55)."""
    return {
        "offset": 0,
        "ts": "",
        "admin": False,
        "query": "",
        "user": "",
        "host": "",
        "db": "",
        "rate_type": "",
        "rate_limit": 0,
        "time_metrics": {},
        "number_metrics": {},
        "bool_metrics": {},
    }


from struct import pack as _pack, unpack as _unpack


def _parse_float32(s: str) -> float:
    """strconv.ParseFloat(s, 32) with errors yielding 0 (slow.go:201).

    struct round-trip is ~3x faster than a numpy scalar for the float32
    rounding; overflow maps to +/-Inf like Go's float32 conversion.
    """
    try:
        v = float(s)
    except ValueError:
        return 0.0
    try:
        return _unpack("f", _pack("f", v))[0]
    except OverflowError:
        return float("inf") if v > 0 else float("-inf")


def _parse_uint(s: str) -> int:
    """strconv.ParseUint(s, 10, 64) with the error IGNORED (slow.go:215,219
    does ``val, _ :=``), reproducing Go's error-value conventions exactly:

    * syntax error (non-ASCII-digit chars, sign, decimal point, unicode
      digits like '²' that Python isdigit() accepts) -> 0
    * overflow (ErrRange) -> MaxUint64, because Go returns the CLAMPED
      value alongside ErrRange and the ignored error keeps it
    """
    # isascii() guards isdigit() accepting unicode digits ('²') that int()
    # rejects and Go calls a syntax error; both checks are C-level (the
    # per-char Python loop showed up at 8% of the parse profile)
    if not (s.isascii() and s.isdigit()):
        return 0
    v = int(s)
    return v if v <= _UINT64_MAX else _UINT64_MAX


class SlowLogDocParser:
    """One parse of one doc's text. Not reusable across docs.

    ``debug`` mirrors Options.Debug (options.go:7): per-line state-
    transition traces with the reference's exact labels (slow.go:102-292 -
    "+<off> line:", "meta", "header", "time", "user (bad format)", "user",
    "metrics", "query", "next event", "use db", "set var", "admin",
    "not filtered", "send event", "done"). ``debug_sink`` receives each
    trace line (default: print, i.e. worker stdout in a distributed run).
    """

    def __init__(self, filter_admin_command=frozenset(), debug: bool = False,
                 debug_sink=None):
        self.filter_admin = filter_admin_command
        self._dbg = (debug_sink if debug_sink is not None else print) if debug else None
        self.in_header = False
        self.in_query = False
        self.header_lines = 0
        self.query_lines = 0
        self.bytes_read = 0
        self.line_offset = 0
        self.event = new_event()
        self.events: List[Dict] = []

    def run(self, data: bytes, start_offset: int = 0) -> List[Dict]:
        if start_offset > 0:
            data = data[start_offset:]
        self.bytes_read = start_offset

        # C-level split; the final element is either the empty tail after a
        # trailing \n or an unterminated partial line - both discarded,
        # matching the reference's break-on-read-error loop (slow.go:87-91).
        lines = data.split(b"\n")
        del lines[-1]

        bytes_read = self.bytes_read
        header_search = _header_re.search
        dbg = self._dbg
        for raw in lines:
            line_len = len(raw) + 1  # + the stripped \n
            bytes_read += line_len
            self.line_offset = (
                bytes_read - line_len + 1 if bytes_read != line_len else 0
            )  # the reference's off-by-one for non-zero offsets (slow.go:96-100)

            if dbg is not None:  # slow.go:102-105
                dbg(f"+{self.line_offset} line: "
                    f"{raw.decode('utf-8', errors='replace')}")

            # Meta-line filter (slow.go:107-119), on the raw line incl. \n.
            if line_len >= 20 and (
                (raw[0:1] == b"/" and raw[-5:] == b"with:")
                or raw[0:5] == b"Time "
                or raw[0:4] == b"Tcp "
                or raw[0:4] == b"TCP "
            ):
                if dbg is not None:
                    dbg("meta")
                continue

            line = raw.decode("utf-8", errors="replace")
            is_header = header_search(line) is not None

            if self.in_header:
                self._parse_header(line, is_header)
            elif self.in_query:
                self._parse_query(line, is_header)
            elif is_header:
                self.in_header = True
                self.in_query = False
                self._parse_header(line, True)

        self.bytes_read = bytes_read
        if self.query_lines > 0:
            self._send_event(False, False)
        if dbg is not None:
            dbg("done")
        return self.events

    def _parse_header(self, line: str, is_header: Optional[bool] = None) -> None:
        if self._dbg is not None:
            self._dbg("header")
        if is_header is None:
            is_header = _header_re.search(line) is not None
        if not is_header:
            self.in_header = False
            self.in_query = True
            self._parse_query(line, False)
            return

        if self.header_lines == 0:
            self.event["offset"] = self.line_offset
        self.header_lines += 1

        if line.startswith("# Time"):
            if self._dbg is not None:
                self._dbg("time")
            m = _time_re.search(line)
            self.event["ts"] = m.group(1)
            um = _user_re.search(line)
            if um:  # Percona "bad format": user on the Time line (slow.go:175-182)
                if self._dbg is not None:
                    self._dbg("user (bad format)")
                self.event["user"] = um.group(1)
                self.event["host"] = um.group(2)
        elif line.startswith("# User"):
            if self._dbg is not None:
                self._dbg("user")
            m = _user_re.search(line)
            self.event["user"] = m.group(1)
            self.event["host"] = m.group(2)
        elif line.startswith("# admin"):
            self._parse_admin(line)
        else:
            if self._dbg is not None:
                self._dbg("metrics")
            ev = self.event
            for name, val in _metrics_re.findall(line):
                if name.endswith("_time") or name.endswith("_wait"):
                    ev["time_metrics"][name] = _parse_float32(val)
                elif val == "Yes" or val == "No":
                    ev["bool_metrics"][name] = val == "Yes"
                elif name == "Schema":
                    ev["db"] = val
                elif name == "Log_slow_rate_type":
                    ev["rate_type"] = val
                elif name == "Log_slow_rate_limit":
                    ev["rate_limit"] = _parse_uint(val) & 0xFF
                else:
                    ev["number_metrics"][name] = _parse_uint(val)

    def _parse_query(self, line: str, is_header: Optional[bool] = None) -> None:
        if self._dbg is not None:
            self._dbg("query")
        if line.startswith("# admin"):
            self._parse_admin(line)
            return
        if is_header is None:
            is_header = _header_re.search(line) is not None
        if is_header:
            # Next event's header: finalize this one (slow.go:234-243).
            if self._dbg is not None:
                self._dbg("next event")
            self.in_header = True
            self.in_query = False
            self._send_event(True, False)
            self._parse_header(line, True)
            return

        if self.query_lines == 0 and line.startswith("use "):
            if self._dbg is not None:
                self._dbg("use db")
            self.event["db"] = line[4:].rstrip(";")
        elif _set_re.search(line):
            if self._dbg is not None:
                self._dbg("set var")
            pass  # SET last_insert_id/insert_id/timestamp ignored (slow.go:252-256)
        else:
            if self._dbg is not None:
                self._dbg("query")
            if self.query_lines > 0:
                self.event["query"] += "\n" + line
            else:
                self.event["query"] = line
            self.query_lines += 1

    def _parse_admin(self, line: str) -> None:
        if self._dbg is not None:
            self._dbg("admin")
        self.event["admin"] = True
        m = _admin_re.search(line)
        q = m.group(1)
        if q.endswith(";"):
            q = q[:-1]
        self.event["query"] = q
        if q not in self.filter_admin:
            if self._dbg is not None:
                self._dbg("not filtered")
            self._send_event(False, False)
        else:
            # Filtered: state cleared but the event object is NOT reset,
            # matching slow.go:285-288.
            self.in_header = False
            self.in_query = False

    def _send_event(self, in_header: bool, in_query: bool) -> None:
        if self._dbg is not None:
            self._dbg("send event")
        ev = self.event
        try:
            if "Query_time" not in ev["time_metrics"]:
                if self.header_lines == 0:
                    raise MissingQueryTimeError(
                        f"No Query_time in event at {self.line_offset}: {ev!r}"
                    )
                return  # partial leading event discarded (slow.go:309-311)
            if ev["db"].endswith(";\n"):
                ev["db"] = ev["db"][:-2]
            if ev["query"].endswith(";"):
                ev["query"] = ev["query"][:-1]
            self.events.append(ev)
        finally:
            self.event = new_event()
            self.header_lines = 0
            self.query_lines = 0
            self.in_header = in_header
            self.in_query = in_query


# ---------------------------------------------------------------------------
# Fast path: the overwhelmingly common single-event doc shape
# ---------------------------------------------------------------------------
#
# Real slow logs are highly repetitive: almost every event is an optional
# "# Time:", an optional "# User@Host:", a run of "# Name: value" metric
# lines, optional use/SET lines, and ONE single-line query. One compiled
# fullmatch recognizes exactly that shape; anything else (multi-event docs,
# admin commands, meta banners, bad-format Time lines, multi-line queries,
# resume offsets) falls back to the exact state machine. The fast path's
# output is bit-identical to the state machine on the docs it accepts -
# pinned by tests/test_parser_golden.py::test_fast_path_equivalence.

_fast_re = re.compile(
    r"\A(?:# Time: (\S+\s{1,2}\S+)\n)?"          # 1: ts (no trailing junk)
    r"(?:# User@Host: ([^\[\n]+)\[[^\]\n]*\] @ (\S*) \[[^\]\n]*\]\n)?"  # 2,3
    # metric lines; "# Time: ..." must NOT be absorbed here (a Time line
    # that failed the anchored ts group above - bad-format user-on-Time
    # lines, ISO/single-token stamps, repeated Time lines - must fall back
    # to the state machine, not be mis-read as a metric named "Time")
    r"((?:# (?!Time: )\w+: [^\n]*\n)+)"          # 4: metric lines block
    r"(?:use ([^\n]*);\n)?"                      # 5: db
    r"(?:SET (?:last_insert_id|insert_id|timestamp)[^\n]*\n)*"
    r"([^#\n][^\n]*);\n\Z"                       # 6: single-line query
)


def _parse_fast(text: str) -> Optional[List[Dict]]:
    """Parse the canonical single-event shape; None -> use the state machine."""
    m = _fast_re.match(text)
    if m is None:
        return None
    ts, user, host, metrics_block, db_use, query = m.groups()
    # meta-line filter parity: a "query" that the slow path would have
    # dropped as a meta line must take the slow path instead
    if query.startswith(("Time ", "Tcp ", "TCP ", "/")):
        return None
    ev = new_event()
    if ts:
        ev["ts"] = ts
    if user is not None:
        ev["user"] = user
        ev["host"] = host
    tm, nm, bm = ev["time_metrics"], ev["number_metrics"], ev["bool_metrics"]
    for line in metrics_block.splitlines():
        for name, val in _metrics_re.findall(line):
            if name.endswith("_time") or name.endswith("_wait"):
                tm[name] = _parse_float32(val)
            elif val == "Yes" or val == "No":
                bm[name] = val == "Yes"
            elif name == "Schema":
                ev["db"] = val
            elif name == "Log_slow_rate_type":
                ev["rate_type"] = val
            elif name == "Log_slow_rate_limit":
                ev["rate_limit"] = _parse_uint(val) & 0xFF
            else:
                nm[name] = _parse_uint(val)
    if "Query_time" not in tm:
        return []  # leading partial event discarded (slow.go:309-311)
    if db_use is not None:
        ev["db"] = db_use.rstrip(";")  # use-line wins over Schema:
    if _set_re.search(query):
        # the state machine would SKIP a query line merely containing
        # "SET timestamp/insert_id/last_insert_id" (unanchored search,
        # slow.go:21,252-256 - bug-as-spec); let it decide
        return None
    if query.startswith("use "):
        # regex backtracking can skip the optional use-group and surface a
        # lone "use db;" line as the query; the state machine treats a
        # first-query-line "use " as the db directive and emits NO event
        # (slow.go:245-251) - let it decide
        return None
    # the fullmatch regex consumed exactly one trailing ';', matching the
    # single TrimSuffix in sendEvent (slow.go:315)
    ev["query"] = query
    return [ev]


_header_start_b = re.compile(rb"#\s+[A-Z]")


def _parse_fast_multi(data: bytes) -> Optional[List[Dict]]:
    """Multi-event docs: split at header-block starts (a header line whose
    predecessor is not a header line), fast-parse every segment.

    Bails (None) unless EVERY segment is the canonical single-event shape
    and the doc starts at a header - anything else goes to the state
    machine. Caller must ensure no admin lines / admin filtering (the
    reference's filtered-admin event-carryover crosses segment boundaries,
    slow.go:285-288)."""
    lines = data.split(b"\n")
    if not lines or _header_start_b.match(lines[0]) is None:
        return None
    del lines[-1]  # '' after trailing \n, or unterminated tail (discarded)

    # segment start byte positions
    starts = [0]
    pos = 0
    prev_is_header = True
    for i, raw in enumerate(lines):
        if i > 0:
            is_header = _header_start_b.match(raw) is not None
            if is_header and not prev_is_header:
                starts.append(pos)
            prev_is_header = is_header
        pos += len(raw) + 1
    if len(starts) < 2:
        return None  # single segment: the plain fast path already failed

    starts.append(pos)
    events: List[Dict] = []
    for a, b in zip(starts, starts[1:]):
        seg = _parse_fast(data[a:b].decode("utf-8", errors="replace"))
        if seg is None:
            return None
        for ev in seg:
            # the reference's +1 offset quirk for non-zero line offsets
            # (slow.go:96-100)
            ev["offset"] = a + 1 if a else 0
            events.append(ev)
    return events


def parse_slow_log_text(
    text: Union[str, bytes],
    start_offset: int = 0,
    filter_admin_command=frozenset(),
    debug: bool = False,
    debug_sink=None,
) -> List[Dict]:
    """Parse one doc's slow-log text into a list of event dicts.

    ``start_offset`` mirrors Options.StartOffset (seek before reading;
    slow.go:46-49): parsing begins at that byte and recorded offsets are
    absolute within the doc. ``debug`` mirrors Options.Debug: per-line
    state traces; it forces the state machine (the fast path has no
    per-line states to report).
    """
    data = text.encode("utf-8") if isinstance(text, str) else text
    if start_offset == 0 and not debug:
        fast = _parse_fast(data.decode("utf-8", errors="replace"))
        if fast is not None:
            return fast
        if not filter_admin_command and b"# admin" not in data:
            multi = _parse_fast_multi(data)
            if multi is not None:
                return multi
    p = SlowLogDocParser(filter_admin_command=filter_admin_command,
                         debug=debug, debug_sink=debug_sink)
    return p.run(data, start_offset)
