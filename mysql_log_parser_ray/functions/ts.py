"""Slow-log timestamp conversion.

Reference: ConvertSlowLogTs (/root/reference/log/parser/slow.go:144-150)
parses ``060102 15:04:05`` layout; QueryClass example timestamps are
reformatted to ``2006-01-02 15:04:05`` (/root/reference/log/class.go:106-110).

Go's ``time.Parse`` is strict about the single space between date and time
(so the Percona "bad format" two-space timestamp ``131128  1:05:31`` FAILS to
parse and yields an empty example ts) but lenient about single-digit
hour/min/sec. Python's ``strptime`` is lenient about whitespace, so we use an
explicit regex to reproduce Go's acceptance set exactly.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Optional

_TS_RE = re.compile(r"\A(\d{2})(\d{2})(\d{2}) (\d{1,2}):(\d{1,2}):(\d{1,2})\Z")


def convert_slow_log_ts(ts: str) -> Optional[datetime]:
    """Parse ``YYMMDD H:MM:SS`` exactly as Go time.Parse("060102 15:04:05").

    Returns None on any mismatch (extra spaces, bad ranges), mirroring the
    reference's nil return (slow.go:146-149). Two-digit years map 69-99 ->
    19xx and 00-68 -> 20xx, matching Go.
    """
    m = _TS_RE.match(ts)
    if not m:
        return None
    yy, mo, dd, hh, mi, ss = (int(g) for g in m.groups())
    year = 1900 + yy if yy >= 69 else 2000 + yy
    try:
        return datetime(year, mo, dd, hh, mi, ss)
    except ValueError:
        return None


def format_example_ts(ts: str) -> str:
    """Reformat a raw slow-log ts for a class example (class.go:106-113).

    Unparseable or empty input yields "" (the reference stores "" on parse
    error).
    """
    if not ts:
        return ""
    t = convert_slow_log_ts(ts)
    if t is None:
        return ""
    return t.strftime("%Y-%m-%d %H:%M:%S")
