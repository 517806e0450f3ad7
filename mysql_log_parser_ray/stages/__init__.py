"""Ray Data batch transforms: parse, enrich, route, aggregate, windows."""

from .asof import asof_join_broadcast  # noqa: F401
from .interval import interval_join_counts, interval_join_counts_partitioned  # noqa: F401
from .parse import EVENT_SCHEMA, PARSER_REGISTRY, make_parse_fn, parse_events, register_parser  # noqa: F401
from .window import sessionize, tumbling_window_agg  # noqa: F401
