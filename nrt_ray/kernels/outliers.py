"""Pre-fit outlier screening over ``(time, n_series)`` matrices.

Functional parity targets: ``/root/reference/nrt/outliers.py:40-95``
(Shewhart control chart; CCDC-RIRLS two-band screening).
"""

from __future__ import annotations

import logging

import numpy as np

from nrt_ray.kernels.fit import ols, rirls

logger = logging.getLogger(__name__)


def shewhart(X: np.ndarray, y: np.ndarray, L: float = 5.0, **kwargs) -> np.ndarray:
    """Shewhart-chart outlier screening.

    OLS-fit every series, compute the per-series residual std, and NaN-out
    observations whose |residual| exceeds ``L·σ``.

    Returns:
        ``y`` with outliers replaced by NaN (a new array; input not mutated).
    """
    _, residuals = ols(X, y)
    with np.errstate(all="ignore"):
        sigma = np.nanstd(residuals, axis=0)
    out = np.array(y, dtype=np.float64, copy=True)
    out[np.abs(residuals) > L * sigma] = np.nan
    return out


def ccdc_rirls(X: np.ndarray, y: np.ndarray, green: np.ndarray,
               swir: np.ndarray, scaling_factor: float = 1.0,
               **kwargs) -> np.ndarray:
    """CCDC two-band (green/SWIR analog) outlier screening.

    Robust-fits the two auxiliary signal matrices and flags an observation
    as an outlier where ``green_resid > 0.04·sf`` or ``swir_resid <
    −0.04·sf`` (cloud / shadow analogs).  Warns when more than half of the
    observations get removed.

    Returns:
        ``y`` with outliers replaced by NaN (new array).
    """
    _, g_resid = rirls(X, np.asarray(green, dtype=np.float64), **kwargs)
    _, s_resid = rirls(X, np.asarray(swir, dtype=np.float64), **kwargs)
    is_outlier = np.logical_or(g_resid > 0.04 * scaling_factor,
                               s_resid < -0.04 * scaling_factor)
    denom = np.count_nonzero(np.isfinite(green))
    removed = np.count_nonzero(is_outlier) / denom if denom else 0.0
    if removed > 0.5:
        logger.warning("More than 50%% of observations removed as outliers "
                       "(%.1f%%) — check scaling_factor.", removed * 100)
    out = np.array(y, dtype=np.float64, copy=True)
    out[is_outlier] = np.nan
    return out
