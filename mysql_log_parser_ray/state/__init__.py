"""Distributed state helpers: mergeable sketches and checkpoint manifests."""

from .gk import GKSummary  # noqa: F401
from .hll import HyperLogLog, approx_distinct  # noqa: F401
