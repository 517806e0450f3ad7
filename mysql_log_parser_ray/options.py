"""Pipeline options mirroring the reference parser's Options struct.

Reference: /root/reference/log/parser/options.go:3-8
  StartOffset uint64, ExampleQueries bool, FilterAdminCommand map[string]bool,
  Debug bool.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Options:
    """Parse/aggregation options.

    start_offset: byte offset into a doc's text to begin parsing at (the
        resume cursor; options.go:4, slow.go:46-49). A partial leading event
        is discarded, matching slow.go:305-311.
    example_queries: capture the worst (max Query_time) literal query per
        class (options.go:5, class.go:100-116).
    filter_admin_command: admin commands to drop (options.go:6,
        slow.go:280-288).
    """

    start_offset: int = 0
    example_queries: bool = True
    filter_admin_command: frozenset = field(default_factory=frozenset)
    debug: bool = False
