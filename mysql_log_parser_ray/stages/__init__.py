"""Ray Data batch transforms: parse, enrich, route, aggregate."""

from .parse import EVENT_SCHEMA, make_parse_fn, parse_events  # noqa: F401
