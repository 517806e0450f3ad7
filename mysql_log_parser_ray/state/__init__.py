"""Distributed state helpers: mergeable sketches and checkpoint manifests."""

from .gk import GKSummary  # noqa: F401
