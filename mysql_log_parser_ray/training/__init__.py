"""Large-scale training-data operators: dedup, similarity, text analysis,
curation, multimodal plumbing. Each operator is a vectorized Ray Data
stage; the SQL-expressible ones register DuckDB oracles via
register_oracles()."""

from .curate import curate_keep_list, write_curated  # noqa: F401
from .registry import register_oracles, register_queries  # noqa: F401
