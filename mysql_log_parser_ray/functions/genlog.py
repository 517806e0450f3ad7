"""MySQL general-query-log event extraction: a per-doc line parser.

The reference declares ``MySQLLogParser`` as an (empty) interface —
/root/reference/log/parser/parser.go:3-4 — the intended plugin point for
log formats beyond the slow log; only the slow-log implementation exists
there. This module is the second registered format for our parser registry
(stages/parse.py), covering the classic general query log:

    070823 21:01:10\t      1 Connect\troot@localhost on test1
    \t\t      1 Query\tSELECT 1
    ...multi-line argument continuation lines...

Line grammar: an optional ``YYMMDD H:MM:SS`` timestamp, whitespace, a
numeric thread id, a command word, an optional TAB + argument. Lines that
match start a new event; anything else continues the previous event's
argument (multi-line queries). Events are emitted as the same dict shape as
the slow-log parser (functions/slowlog.py new_event) so every downstream
stage — fingerprint, enrich, route, aggregate — works unchanged:

* ``Query`` commands  -> admin=False, query=argument
* ``Connect`` command -> admin=True, query="Connect"; the argument's
  ``user@host on db`` populates user/host/db
* other commands      -> admin=True, query=command (argument, if any, is
  appended after a space — e.g. "Init DB test")
* thread id           -> number_metrics["Thread_id"]
* ``filter_admin_command`` drops listed admin commands, mirroring the
  slow-log option (options.go:6, slow.go:280-288)
"""

from __future__ import annotations

import re
from typing import Dict, List, Union

from .slowlog import new_event

# MySQL's command vocabulary (sql/sql_parse.cc command_name[]): restricting
# the command group to it keeps multi-line SQL continuation lines like
# "  2 UNION ALL" or "  5 AS x" from being misread as new events.
_COMMANDS = (
    "Sleep|Quit|Init DB|Query|Field List|Create DB|Drop DB|Refresh|Shutdown|"
    "Statistics|Processlist|Connect Out|Connect|Kill|Debug|Ping|Time|"
    "Delayed insert|Change user|Binlog Dump GTID|Binlog Dump|Table Dump|"
    "Register Slave|Register Replica|Prepare|Execute|Long Data|Close stmt|"
    "Reset stmt|Set option|Fetch|Daemon|Reset Connection|Clone|"
    "Subscribe Group Replication Stream|Error"
)

# Optional "YYMMDD  H:MM:SS" stamp (1-2 space-padded hour like the slow
# log's Time: values), thread id, a known command, optional TAB + argument.
_gen_line_re = re.compile(
    r"^(?:(\d{6}\s+\d{1,2}:\d{2}:\d{2})|\s)\s*(\d+)\s+(" + _COMMANDS + r")(?:\t(.*))?$"
)
_connect_re = re.compile(r"^(\S+)@(\S+) on (\S*)$")


def parse_general_log_text(
    text: Union[str, bytes],
    start_offset: int = 0,
    filter_admin_command=frozenset(),
    debug: bool = False,
    debug_sink=None,
) -> List[Dict]:
    """Parse one doc's general-log text into a list of event dicts.

    ``start_offset`` and recorded offsets are BYTE positions (the Options
    contract shared with the slow-log parser)."""
    data = text.encode("utf-8") if isinstance(text, str) else text
    if start_offset:
        data = data[start_offset:]

    events: List[Dict] = []
    cur: Dict = None  # type: ignore[assignment]
    offset = start_offset

    def _finish(ev: Dict) -> None:
        ev["query"] = ev["query"].rstrip("\n")
        if ev["admin"] and ev["_cmd"] in filter_admin_command:
            pass
        else:
            events.append(ev)
        del ev["_cmd"]

    for raw in data.splitlines(keepends=True):
        line = raw.decode("utf-8", errors="replace")
        stripped = line.rstrip("\n")
        m = _gen_line_re.match(stripped) if stripped else None
        if m:
            if cur is not None:
                _finish(cur)
            ts, tid, cmd, arg = m.groups()
            arg = arg or ""
            ev = new_event()
            ev["offset"] = offset
            ev["ts"] = ts or ""
            ev["_cmd"] = cmd
            ev["number_metrics"]["Thread_id"] = int(tid)
            if cmd == "Query":
                ev["admin"] = False
                ev["query"] = arg
            else:
                ev["admin"] = True
                ev["query"] = f"{cmd} {arg}" if arg else cmd
                if cmd == "Connect":
                    ev["query"] = "Connect"
                    cm = _connect_re.match(arg)
                    if cm:
                        ev["user"], ev["host"], ev["db"] = cm.groups()
            cur = ev
        elif cur is not None:
            # continuation of a multi-line argument
            cur["query"] += "\n" + stripped
        offset += len(raw)

    if cur is not None:
        _finish(cur)
    return events
