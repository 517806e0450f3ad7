"""Structured JSON log event extraction (one JSON object per line).

Third registered format (after slowlog/genlog) for the parser registry -
the shape MySQL 8 audit plugins and most modern telemetry emit. Field
mapping follows the slow-log metric dispatch rules (slow.go:196-222) so the
dynamic-metric model is identical across formats:

* string fields ``ts user host db query`` -> the event's scalar fields
* any numeric field whose key ends ``_time`` / ``_wait`` -> time_metrics
  (float32 semantics, matching the slow-log parser)
* any bool field -> bool_metrics
* any other int field -> number_metrics (negatives -> 0 like Go's
  ParseUint in the slow-log dispatch; positive overflow wraps mod 2^64)
* ``admin: true`` marks admin commands; filter_admin_command drops by
  the query/command string, mirroring slow.go:280-288
* unparseable lines are skipped (telemetry streams carry garbage; the
  skip count is the caller's concern, not a crash)
"""

from __future__ import annotations

import json
from typing import Dict, List, Union

from .slowlog import _parse_float32, new_event

_SCALARS = {"ts", "user", "host", "db", "query"}
_U64 = 1 << 64


def parse_json_log_text(
    text: Union[str, bytes],
    start_offset: int = 0,
    filter_admin_command=frozenset(),
    debug: bool = False,
    debug_sink=None,
) -> List[Dict]:
    """Parse one doc's JSON-lines text into event dicts.

    ``start_offset`` and recorded offsets are BYTE positions (the Options
    contract shared with the slow-log parser), so a resume cursor recorded
    by one run replays correctly even with multi-byte UTF-8 content.
    """
    data = text.encode("utf-8") if isinstance(text, str) else text
    if start_offset:
        data = data[start_offset:]

    events: List[Dict] = []
    offset = start_offset
    for raw in data.splitlines(keepends=True):
        stripped = raw.strip()
        if stripped:
            try:
                obj = json.loads(stripped.decode("utf-8", errors="replace"))
            except ValueError:
                obj = None
            if isinstance(obj, dict):
                ev = new_event()
                ev["offset"] = offset
                for k, v in obj.items():
                    if k in _SCALARS:
                        ev[k] = str(v)
                    elif k == "admin":
                        ev["admin"] = bool(v)
                    elif isinstance(v, bool):
                        ev["bool_metrics"][k] = v
                    elif isinstance(v, (int, float)):
                        if k.endswith("_time") or k.endswith("_wait"):
                            ev["time_metrics"][k] = _parse_float32(str(v))
                        else:
                            # json.loads accepts NaN/Infinity (non-standard
                            # but common from lenient writers); parse
                            # failures AND negatives yield 0, mirroring the
                            # slow-log ParseUint dispatch (slow.go:201 -
                            # Go's ParseUint errors on a minus sign)
                            try:
                                n = int(v)
                                ev["number_metrics"][k] = (
                                    0 if n < 0 else n % _U64
                                )
                            except (ValueError, OverflowError):
                                ev["number_metrics"][k] = 0
                if not (ev["admin"] and ev["query"] in filter_admin_command):
                    events.append(ev)
        offset += len(raw)
    return events
