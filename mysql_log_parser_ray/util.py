"""Small shared helpers for query implementations."""

from __future__ import annotations


def typed_empty(**cols):
    """Schema-stable empty result for queries whose upstream aggregate can
    be entirely empty (a Ray groupby over zero rows yields a column-less
    frame; an empty parquet read dispatches zero batches)."""
    import pandas as pd

    return pd.DataFrame({k: pd.Series([], dtype=v) for k, v in cols.items()})


def round_half_up(arr, decimals: int):
    """Decimal rounding with HALF-UP ties for non-negative values, matching
    DuckDB round() (half away from zero) — np.round is half-to-even and
    diverges on exactly-representable .5 ties (e.g. ratios of small ints),
    which the driver's value hash then catches."""
    import numpy as np

    scale = 10.0 ** decimals
    return np.floor(np.asarray(arr, dtype=np.float64) * scale + 0.5) / scale


def round_half_away(arr, decimals: int):
    """Sign-aware HALF-AWAY-FROM-ZERO rounding, matching DuckDB round()
    on values that may be negative (round_half_up's floor(x+0.5) rounds a
    negative .5 tie toward +inf instead of away from zero). Use for
    signed ratio-of-integer columns (e.g. regression slopes)."""
    import numpy as np

    x = np.asarray(arr, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
