"""End-to-end pipeline assembly."""

from .flagship import FlagshipResult, run_flagship  # noqa: F401
