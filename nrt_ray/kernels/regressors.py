"""Harmonic-trend design matrices.

Semantics match the reference design-matrix builder
(``/root/reference/nrt/utils.py:24-74``): an intercept column, an optional
linear-trend column expressed in days since 1970-01-01, and
``cos``/``sin`` annual-harmonic columns of the decimal-year date, ordered
``[1, trend, cos(1..h), sin(1..h)]``.

Everything here is pure NumPy/pandas, vectorized, float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EPOCH = np.datetime64("1970-01-01")


def decimal_years(ts) -> np.ndarray:
    """Convert datetimes to decimal years.

    ``year + (t - Jan1) / (Dec31 - Jan1)`` — the same formula as the
    reference (``nrt/utils.py:59-74``), which makes the fractional part
    reach 1.0 on Dec 31 rather than Jan 1 of the next year.

    Args:
        ts: anything ``pandas.DatetimeIndex`` accepts (datetime64 array,
            list of datetimes, ...).

    Returns:
        float64 ndarray of decimal years.
    """
    idx = pd.DatetimeIndex(ts)
    years = idx.year
    first_day = pd.to_datetime({"year": years, "month": 1, "day": 1})
    last_day = pd.to_datetime({"year": years, "month": 12, "day": 31})
    frac = (idx - first_day) / (last_day - first_day)
    return np.asarray(years + frac, dtype=np.float64)


def days_since_epoch(ts) -> np.ndarray:
    """Whole days since 1970-01-01 as int64 (matches
    ``datetime64[D].astype(int)`` used by the reference fit dispatch)."""
    arr = np.asarray(pd.DatetimeIndex(ts).values, dtype="datetime64[D]")
    return arr.astype(np.int64)


def design_matrix(dates, trend: bool = True, harmonic_order: int = 3) -> np.ndarray:
    """Build the harmonic-trend design matrix X.

    Column layout (reference ``nrt/utils.py:24-56``):
    ``[intercept, (trend days), cos(2π·1·dy)..cos(2π·h·dy),
    sin(2π·1·dy)..sin(2π·h·dy)]``.

    Dates are sorted ascending before building (defensive, like the
    reference).

    Args:
        dates: datetime-like sequence.
        trend: include the linear (days since epoch) trend column.
        harmonic_order: number of annual harmonics ``h``.

    Returns:
        ``(n, 1 + trend + 2h)`` float64 ndarray.
    """
    idx = pd.DatetimeIndex(dates).sort_values()
    n = len(idx)
    ncols = 1 + int(trend) + 2 * harmonic_order
    X = np.zeros((n, ncols), dtype=np.float64)
    X[:, 0] = 1.0
    col = 1
    if trend:
        X[:, col] = (idx - pd.Timestamp(1970, 1, 1)).days
        col += 1
    if harmonic_order:
        dy = decimal_years(idx)
        # angles[:, i] = 2π · (i+1) · decimal_year
        angles = 2.0 * np.pi * dy[:, None] * np.arange(1, harmonic_order + 1)[None, :]
        X[:, col:col + harmonic_order] = np.cos(angles)
        X[:, col + harmonic_order:col + 2 * harmonic_order] = np.sin(angles)
    return X


def design_row(date, trend: bool = True, harmonic_order: int = 3) -> np.ndarray:
    """Design-matrix row for a single date → shape ``(1, k)``."""
    return design_matrix([date], trend=trend, harmonic_order=harmonic_order)


def harmonic_features(days: np.ndarray, dyears: np.ndarray, trend: bool,
                      harmonic_order: int) -> np.ndarray:
    """Vectorized design matrix from precomputed day/decimal-year columns.

    Used by the ragged per-url pipeline where ``days``/``dyears`` were
    computed once per raw row during extraction; supports any array shape
    (features go on a new trailing axis).

    Returns:
        float64 array of shape ``days.shape + (1 + trend + 2h,)``.
    """
    days = np.asarray(days, dtype=np.float64)
    dyears = np.asarray(dyears, dtype=np.float64)
    ncols = 1 + int(trend) + 2 * harmonic_order
    X = np.zeros(days.shape + (ncols,), dtype=np.float64)
    X[..., 0] = 1.0
    col = 1
    if trend:
        X[..., col] = days
        col += 1
    if harmonic_order:
        angles = (2.0 * np.pi * dyears[..., None]
                  * np.arange(1, harmonic_order + 1, dtype=np.float64))
        X[..., col:col + harmonic_order] = np.cos(angles)
        X[..., col + harmonic_order:col + 2 * harmonic_order] = np.sin(angles)
    return X
