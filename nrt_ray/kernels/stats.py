"""Scalar/statistical helpers (pure NumPy, float64).

Functional parity targets (all in ``/root/reference/nrt/``):
``stats.py:20-68`` (NaN-aware least squares), ``stats.py:71-127``
(mad / bisquare / erfcc / ncdf), ``stats.py:130-154`` (per-column
nan-percentile).  The implementations here are new: the NaN-aware solver is
fully vectorized over series via batched normal equations instead of a
per-column jit loop (Ray tasks supply the coarse-grained parallelism that
numba threads supplied in the reference).
"""

from __future__ import annotations

import numpy as np


def masked_normal_equations(X: np.ndarray, y: np.ndarray,
                            weights: np.ndarray | None = None):
    """Batched normal equations for per-column missing data.

    For each series (column of ``y``), solving OLS on the subset of rows
    where ``y`` is finite is algebraically identical to solving
    ``(Xᵀ W X) β = Xᵀ W y`` with a 0/1 row-weight matrix ``W`` — which
    vectorizes across all series with one einsum + one batched solve.

    Args:
        X: ``(n, k)`` design matrix shared by all series.
        y: ``(n, m)`` observations, NaN = missing.
        weights: optional ``(n, m)`` nonnegative weights (combined with the
            NaN mask); used by the IRLS fit.

    Returns:
        (XtX ``(m, k, k)``, Xty ``(m, k)``, valid ``(n, m)`` bool)
    """
    valid = np.isfinite(y)
    w = valid.astype(np.float64)
    if weights is not None:
        w = w * weights
    y0 = np.where(valid, y, 0.0)
    # XtX[m] = Xᵀ diag(w[:, m]) X  ;  Xty[m] = Xᵀ (w*y)[:, m]
    XtX = np.einsum("nk,nm,nj->mkj", X, w, X, optimize=True)
    Xty = np.einsum("nk,nm->mk", X, w * y0, optimize=True)
    return XtX, Xty, valid


def nanlstsq(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """NaN-aware least squares, vectorized over series.

    Equivalent to solving ``lstsq(X[finite], y[finite, m])`` independently
    per column ``m`` (reference ``nrt/stats.py:20-68``), but via batched
    normal equations.

    Args:
        X: ``(n, k)`` design matrix.
        y: ``(n, m)`` observations with NaN for missing.

    Returns:
        ``(k, m)`` float64 coefficients.
    """
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    XtX, Xty, _ = masked_normal_equations(X, y)
    beta = np.linalg.solve(XtX, Xty[..., None])[..., 0]  # (m, k)
    return beta.T


def mad(resid: np.ndarray, c: float = 0.6745, axis=None) -> np.ndarray:
    """Median absolute deviation scaled to ~std-normal (MAD / c)."""
    med = np.nanmedian(resid, axis=axis, keepdims=axis is not None)
    return np.nanmedian(np.fabs(resid - med), axis=axis) / c


def bisquare(resid: np.ndarray, c: float = 4.685) -> np.ndarray:
    """Tukey biweight: ``(|r|<c) · (1 − (r/c)²)²``."""
    return (np.abs(resid) < c) * (1.0 - (resid / c) ** 2) ** 2


# Rational polynomial approximation of the complementary error function
# (Numerical Recipes §6.2, ~1e-7 absolute accuracy) — same approximation the
# reference uses so the Brownian-motion p-values agree bit-for-bit.
_ERFCC_COEF = (-1.26551223, 1.00002368, 0.37409196, 0.09678418, -0.18628806,
               0.27886807, -1.13520398, 1.48851587, -0.82215223, 0.17087277)


def erfcc(x: float) -> float:
    """Complementary error function (polynomial approximation)."""
    z = abs(x)
    t = 1.0 / (1.0 + 0.5 * z)
    poly = _ERFCC_COEF[-1]
    for coef in _ERFCC_COEF[-2::-1]:
        poly = coef + t * poly
    r = t * np.exp(-z * z + poly)
    return r if x >= 0.0 else 2.0 - r


def ncdf(x: float) -> float:
    """Standard normal CDF via :func:`erfcc`."""
    return 1.0 - 0.5 * erfcc(x / np.sqrt(2.0))


def nan_percentile_axis0(arr: np.ndarray, percentiles) -> np.ndarray:
    """``np.nanpercentile(arr, percentiles, axis=0)`` (reference exposes a
    jitted clone at ``nrt/stats.py:130-154``; plain NumPy is already
    vectorized here)."""
    arr = np.asarray(arr)
    if arr.shape[0] == 0:
        # np.nanpercentile collapses the axis on empty input
        return np.full((len(percentiles),) + arr.shape[1:], np.nan)
    with np.errstate(all="ignore"):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            return np.nanpercentile(arr, percentiles, axis=0)
