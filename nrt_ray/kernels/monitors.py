"""Sequential change-detection monitors over batches of series.

This is a from-scratch re-expression of the reference monitor hierarchy
(``/root/reference/nrt/monitor/__init__.py`` plus the five subclasses in
``/root/reference/nrt/monitor/{ewma,cusum,mosum,ccdc,iqr}.py``) for the
series-batch layout our Ray engine uses: instead of dense ``(y, x)`` raster
state arrays, every state attribute is a 1-D array over the ``m`` series
(urls) in a batch, and observation matrices are ``(time, m)`` float64 with
NaN for missing snapshots.

Template-method flow per new acquisition (reference ``monitor()``
``nrt/monitor/__init__.py:259-292``):

1. predict expected values from the harmonic model,
2. residual = observation − prediction,
3. validity mask = (status == MONITORED) & finite, minus extreme outliers,
4. strategy-specific process update,
5. break when |process| ≥ boundary → status=BREAK, record detection date.

Status codes match the reference mask codes
(``nrt/monitor/__init__.py:50-55``)::

    0 NOT_MONITORED | 1 MONITORED | 2 UNSTABLE | 3 BREAK | 4 TOO_SHORT

State serialization goes to/from Arrow-friendly dicts of 1-D numpy arrays
(Parquet checkpoint tables) instead of netCDF.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd

from nrt_ray.kernels import regressors
from nrt_ray.kernels.efp import (mosum_crit, mosum_init_window, ols_cusum_crit,
                                 rec_cusum_crit)
from nrt_ray.kernels.fit import (ccdc_stable_fit, lasso, ols, rirls,
                                 roc_stable_fit)
from nrt_ray.kernels.outliers import ccdc_rirls, shewhart
from nrt_ray.kernels.stats import nan_percentile_axis0

NOT_MONITORED, MONITORED, UNSTABLE, BREAK, TOO_SHORT = 0, 1, 2, 3, 4

MONITOR_REGISTRY: dict[str, type] = {}


def register(cls):
    MONITOR_REGISTRY[cls.strategy] = cls
    return cls


def _to_days(dates) -> np.ndarray:
    return regressors.days_since_epoch(dates)


class BaseMonitor:
    """Abstract monitor over a batch of series.

    Subclasses implement ``_init_from_fit`` (derive monitoring state from
    history residuals) and ``_update_process`` (one-step sequential update),
    optionally overriding ``_detect_break`` / ``_screen_extremes``.

    Attributes (all per-series 1-D arrays of length ``m`` unless noted):
        status: uint8 status codes (reference "mask").
        beta: ``(k, m)`` float64 regression coefficients.
        process / boundary: monitor-specific running value and its limit.
        detection_date: int32 days-since-epoch of a confirmed break (0 = none).
        fit_start: int32 days-since-epoch where the stable history begins.
    """

    strategy = "BASE"
    default_fit_method = "OLS"
    default_screen_outliers = None

    def __init__(self, trend: bool = True, harmonic_order: int = 3,
                 update_mask: bool = True, save_fit_start: bool = False,
                 **state):
        self.trend = bool(trend)
        self.harmonic_order = int(harmonic_order)
        self.update_mask = bool(update_mask)
        self.save_fit_start = bool(save_fit_start)
        self.status = state.get("status")
        self.beta = state.get("beta")
        self.process = state.get("process")
        self.boundary = state.get("boundary")
        self.detection_date = state.get("detection_date")
        self.fit_start = state.get("fit_start")

    # ------------------------------------------------------------------ fit

    @property
    def n_regressors(self) -> int:
        return 1 + int(self.trend) + 2 * self.harmonic_order

    def design_matrix(self, dates) -> np.ndarray:
        return regressors.design_matrix(dates, trend=self.trend,
                                        harmonic_order=self.harmonic_order)

    def fit(self, dates, values: np.ndarray, method: str | None = None,
            screen_outliers: str | None = "default", **kwargs) -> None:
        """Fit the history model and initialize monitoring state.

        Args:
            dates: ``(n,)`` datetime-like history acquisition dates, sorted
                ascending (raises otherwise, like the reference).
            values: ``(n, m)`` float observations, NaN = missing.
            method: 'OLS' | 'RIRLS' | 'ROC' | 'CCDC-stable' (default is the
                strategy's preferred method).
            screen_outliers: None | 'Shewhart' | 'CCDC_RIRLS'; the sentinel
                "default" selects the strategy's preferred screening.
            **kwargs: forwarded to the fit / screening functions (``L``,
                ``alpha``, ``threshold``, ``green``, ``swir``, ...).
        """
        method = method or self.default_fit_method
        if screen_outliers == "default":
            screen_outliers = self.default_screen_outliers
        dates = pd.DatetimeIndex(dates)
        if not np.all(dates.values[1:] >= dates.values[:-1]):
            raise ValueError("history dates must be sorted chronologically")
        y = np.asarray(values, dtype=np.float64)
        n, m = y.shape
        X = self.design_matrix(dates).astype(np.float64)
        k = X.shape[1]
        if self.status is None:
            self.status = np.full(m, MONITORED, dtype=np.uint8)
        self.detection_date = np.zeros(m, dtype=np.int32)

        beta = np.zeros((k, m), dtype=np.float64)
        residuals = np.full((n, m), np.nan, dtype=np.float64)

        active = self.status == MONITORED
        y_act = y[:, active]
        y_act, active = self._drop_short_series(y_act, X, active)

        if screen_outliers == "Shewhart":
            y_act = shewhart(X, y_act, **{k_: v for k_, v in kwargs.items()
                                          if k_ == "L"})
            y_act, active = self._drop_short_series(y_act, X, active)
        elif screen_outliers == "CCDC_RIRLS":
            try:
                green = np.asarray(kwargs.pop("green"),
                                   dtype=np.float64)[:, active]
                swir = np.asarray(kwargs.pop("swir"),
                                  dtype=np.float64)[:, active]
            except KeyError:
                raise ValueError("green and swir matrices are required for "
                                 "CCDC_RIRLS screening")
            y_act = ccdc_rirls(X, y_act, green=green, swir=swir,
                               scaling_factor=kwargs.pop("scaling_factor", 1))
            y_act, active = self._drop_short_series(y_act, X, active)
        elif screen_outliers:
            raise ValueError(f"Unknown screen_outliers {screen_outliers!r}")

        days = _to_days(dates)
        if method == "OLS":
            beta_a, resid_a = ols(X, y_act)
        elif method == "RIRLS":
            beta_a, resid_a = rirls(X, y_act, **{k_: v for k_, v in
                                                 kwargs.items() if k_ in
                                                 ("tune", "scale_constant",
                                                  "update_scale", "maxiter",
                                                  "tol")})
        elif method == "ROC":
            crit = rec_cusum_crit(kwargs.get("alpha", 0.05))
            beta_a, resid_a, is_stable, fit_start = roc_stable_fit(
                X, y_act, days, alpha=kwargs.get("alpha", 0.05), crit=crit)
            self._mark_unstable(active, is_stable, fit_start)
        elif method == "CCDC-stable":
            if not self.trend:
                raise ValueError('Method "CCDC-stable" requires trend')
            beta_a, resid_a, is_stable, fit_start = ccdc_stable_fit(
                X, y_act, days, threshold=kwargs.get("threshold", 3))
            self._mark_unstable(active, is_stable, fit_start)
        elif method == "LASSO":
            # beyond-reference: the reference raises NotImplementedError
            # here (nrt/monitor/__init__.py:244-245) — kernels.fit.lasso
            # is a vectorized coordinate-descent implementation
            beta_a, resid_a = lasso(X, y_act, **{k_: v for k_, v in
                                                 kwargs.items() if k_ in
                                                 ("lam", "maxiter", "tol")})
        else:
            raise ValueError(f"Unknown method {method!r}")

        beta[:, active] = beta_a
        residuals[:, active] = resid_a
        self.beta = beta
        self._X_cols = k
        self._init_from_fit(X, residuals, **kwargs)

    def _drop_short_series(self, y_act, X, active):
        """Flag series with < 1.5·k valid observations as TOO_SHORT (code 4);
        raise when nothing monitorable remains."""
        short = np.count_nonzero(np.isfinite(y_act), axis=0) < X.shape[1] * 1.5
        if short.any():
            idx = np.flatnonzero(active)[short]
            self.status[idx] = TOO_SHORT
            active = self.status == MONITORED
            warnings.warn(f"{short.sum()} series shorter than 1.5x the number "
                          "of regressors were masked")
        if not np.any(active):
            raise ValueError("No series with sufficient "
                             f"({int(X.shape[1] * 1.5)}) data points.")
        return y_act[:, ~short], active

    def _mark_unstable(self, active, is_stable, fit_start):
        idx = np.flatnonzero(active)
        self.status[idx[~is_stable]] = UNSTABLE
        if self.save_fit_start:
            fs = np.zeros(self.status.shape, dtype=np.int32)
            fs[idx] = fit_start
            self.fit_start = fs

    # -------------------------------------------------------------- monitor

    def predict(self, date) -> np.ndarray:
        """Expected value per series for one date: ``x(date)ᵀ · β``."""
        X = regressors.design_row(date, trend=self.trend,
                                  harmonic_order=self.harmonic_order)
        return (X @ self.beta)[0]

    def monitor(self, values: np.ndarray, date, update_mask=None) -> None:
        """Ingest one new acquisition (all series share the date)."""
        days = int(_to_days([date])[0])
        resid = np.asarray(values, dtype=np.float64) - self.predict(date)
        self.monitor_residuals(resid, np.asarray(values, dtype=np.float64),
                               np.full(resid.shape, days, dtype=np.int64),
                               update_mask=update_mask)

    def monitor_residuals(self, resid: np.ndarray, values: np.ndarray,
                          days: np.ndarray, update_mask=None) -> None:
        """One sequential update step from precomputed residuals.

        Used by the ragged pipeline where each series has its own
        acquisition date (``days`` is per-series).
        """
        update = self.update_mask if update_mask is None else update_mask
        if self.detection_date is None:
            self.detection_date = np.zeros(self.status.shape, dtype=np.int32)
        is_valid = (self.status == MONITORED) & np.isfinite(values)
        is_valid = self._screen_extremes(resid, is_valid)
        self._update_process(resid, is_valid)
        if update:
            to_update = is_valid & self._detect_break()
            self.status[to_update] = BREAK
            self.detection_date[to_update] = days[to_update]

    def monitor_matrix(self, dates, values: np.ndarray,
                       update_mask=None) -> None:
        """Monitor a whole ``(t, m)`` block of new acquisitions in time
        order (shared time axis)."""
        dates = pd.DatetimeIndex(dates)
        values = np.asarray(values, dtype=np.float64)
        days_arr = _to_days(dates)
        preds = self.design_matrix(dates) @ self.beta  # (t, m)
        resid = values - preds
        for t in range(values.shape[0]):
            self.monitor_residuals(resid[t], values[t],
                                   np.full(values.shape[1], days_arr[t]),
                                   update_mask=update_mask)

    def _detect_break(self) -> np.ndarray:
        with np.errstate(invalid="ignore"):
            return np.abs(self.process) >= self.boundary

    def _screen_extremes(self, resid, is_valid):
        return is_valid

    def _update_process(self, resid, is_valid):  # pragma: no cover - abstract
        raise NotImplementedError

    def _init_from_fit(self, X, residuals, **kwargs):  # pragma: no cover
        raise NotImplementedError

    # ---------------------------------------------------------------- state

    #: state attributes serialized to / from checkpoint tables
    state_columns = ("status", "process", "boundary", "detection_date",
                     "fit_start")

    def state_dict(self) -> dict[str, np.ndarray]:
        """All per-series state as a dict of 1-D arrays plus the stacked
        ``beta`` rows — the Parquet-checkpoint analog of the reference's
        netCDF dump (``nrt/monitor/__init__.py:442-491``)."""
        m = len(self.status)
        out: dict[str, np.ndarray] = {}
        for name in self.state_columns:
            v = getattr(self, name, None)
            if v is not None:
                v = np.asarray(v)
                if v.ndim == 0:  # scalar boundary (CCDC/IQR) → broadcast
                    v = np.full(m, v)
                out[name] = v
        out["beta"] = self.beta.T.copy()  # (m, k) row-per-series
        extra = self._extra_state()
        for name, v in extra.items():
            if v is not None:
                out[name] = v
        assert all(len(v) == m for v in out.values())
        return out

    def _extra_state(self) -> dict[str, np.ndarray]:
        return {}

    def config_dict(self) -> dict:
        """Scalar configuration needed to reconstruct the monitor."""
        return {"strategy": self.strategy, "trend": self.trend,
                "harmonic_order": self.harmonic_order,
                "update_mask": self.update_mask,
                "save_fit_start": self.save_fit_start}

    @classmethod
    def from_state(cls, config: dict, state: dict[str, np.ndarray]):
        """Rebuild a monitor from ``config_dict()`` + ``state_dict()``
        output (checkpoint resume path)."""
        config = dict(config)
        strategy = config.pop("strategy", cls.strategy)
        klass = MONITOR_REGISTRY.get(strategy, cls)
        obj = klass(**config)
        state = dict(state)
        beta = state.pop("beta", None)
        if beta is not None:
            obj.beta = np.ascontiguousarray(np.asarray(beta).T,
                                            dtype=np.float64)
        for name, v in state.items():
            # copy: Arrow-backed numpy views are read-only
            setattr(obj, name, np.array(v))
        return obj

    def __eq__(self, other):
        if type(self) is not type(other):
            return False
        a, b = self.state_dict(), other.state_dict()
        if a.keys() != b.keys():
            return False
        return all(np.array_equal(a[k_], b[k_], equal_nan=True) for k_ in a)


@register
class EWMA(BaseMonitor):
    """EWMA control chart of residuals (Brooks et al. 2014 semantics;
    reference ``nrt/monitor/ewma.py``).

    State: ``process`` = exponentially weighted moving average of residuals,
    ``sigma`` = history residual std, static ``boundary`` =
    ``sensitivity · σ · √(λ / (2 − λ))``.  Extreme residuals
    (``|r| > threshold_outlier·σ``) are excluded from updates.
    """

    strategy = "EWMA"
    default_fit_method = "OLS"
    default_screen_outliers = "Shewhart"
    state_columns = BaseMonitor.state_columns + ("sigma",)

    def __init__(self, trend: bool = True, harmonic_order: int = 2,
                 sensitivity: float = 2, lambda_: float = 0.3,
                 threshold_outlier: float = 10, **kwargs):
        super().__init__(trend=trend, harmonic_order=harmonic_order, **kwargs)
        self.sensitivity = float(sensitivity)
        self.lambda_ = float(lambda_)
        self.threshold_outlier = float(threshold_outlier)
        self.sigma = kwargs.get("sigma")

    def _init_from_fit(self, X, residuals, **kwargs):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            self.sigma = np.nanstd(residuals, axis=0)
        self.boundary = (self.sensitivity * self.sigma
                         * np.sqrt(self.lambda_ / (2.0 - self.lambda_)))
        ewma = np.zeros(residuals.shape[1], dtype=np.float64)
        for row in residuals:
            ewma = self._ewma_step(row, ewma)
        self.process = ewma
        # already beyond the limit after fitting → unstable history
        with np.errstate(invalid="ignore"):
            self.status[self.process > self.boundary] = UNSTABLE

    def _ewma_step(self, resid, ewma):
        return np.where(np.isnan(resid), ewma,
                        (1.0 - self.lambda_) * ewma + self.lambda_ * resid)

    def _screen_extremes(self, resid, is_valid):
        with np.errstate(invalid="ignore"):
            extreme = np.abs(resid) > self.threshold_outlier * self.sigma
        return ~extreme & is_valid

    def _update_process(self, resid, is_valid):
        if self.process is None:
            raise ValueError("monitor not initialized (fit first)")
        new = self._ewma_step(resid, self.process)
        self.process = np.where(is_valid, new, self.process)

    def config_dict(self):
        d = super().config_dict()
        d.update(sensitivity=self.sensitivity, lambda_=self.lambda_,
                 threshold_outlier=self.threshold_outlier)
        return d

    def _extra_state(self):
        return {"sigma": self.sigma}


@register
class CuSum(BaseMonitor):
    """OLS-CUSUM monitoring (strucchange/bfast mefp semantics; reference
    ``nrt/monitor/cusum.py``).

    Process = running sum of residuals normalized by ``σ·√histsize``;
    boundary grows with the observation count:
    ``√(x(x−1)(crit² + ln(x/(x−1))))`` with ``x = n/histsize``.
    """

    strategy = "CUSUM"
    default_fit_method = "ROC"
    state_columns = BaseMonitor.state_columns + ("sigma", "histsize", "n")

    def __init__(self, trend: bool = True, harmonic_order: int = 2,
                 sensitivity: float = 0.05, **kwargs):
        super().__init__(trend=trend, harmonic_order=harmonic_order, **kwargs)
        self.sensitivity = float(sensitivity)
        self.critval = float(ols_cusum_crit(self.sensitivity))
        self.sigma = kwargs.get("sigma")
        self.histsize = kwargs.get("histsize")
        self.n = kwargs.get("n")

    def _init_from_fit(self, X, residuals, **kwargs):
        self.histsize = np.sum(np.isfinite(residuals), axis=0).astype(np.int32)
        self.n = self.histsize.copy()
        self.boundary = np.full(residuals.shape[1], np.nan, dtype=np.float64)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            self.sigma = np.nanstd(residuals, axis=0, ddof=X.shape[1])
        with np.errstate(divide="ignore", invalid="ignore"):
            norm_resid = residuals / (self.sigma * np.sqrt(self.histsize))
        self.process = np.nancumsum(norm_resid, axis=0)[-1]

    def _update_process(self, resid, is_valid):
        with np.errstate(divide="ignore", invalid="ignore"):
            self.n = self.n + is_valid
            x = self.n / self.histsize
            self.boundary = np.where(
                is_valid,
                np.sqrt(x * (x - 1) * (self.critval ** 2 + np.log(x / (x - 1)))),
                self.boundary)
            norm_resid = resid / (self.sigma * np.sqrt(self.histsize))
        self.process = np.where(is_valid, self.process + norm_resid,
                                self.process)

    def config_dict(self):
        d = super().config_dict()
        d.update(sensitivity=self.sensitivity)
        return d

    def _extra_state(self):
        return {"sigma": self.sigma, "histsize": self.histsize, "n": self.n}


@register
class MoSum(BaseMonitor):
    """OLS-MOSUM monitoring (moving sum over a per-series ring buffer of the
    last ``⌊h·histsize⌋`` normalized residuals; reference
    ``nrt/monitor/mosum.py``).

    ``process`` is derived (``nansum`` of the window), not stored.  The ring
    buffer is serialized as a ``(m, maxw)`` list column in checkpoints.
    """

    strategy = "MOSUM"
    default_fit_method = "ROC"
    state_columns = BaseMonitor.state_columns + ("sigma", "histsize", "n",
                                                 "winsize")

    def __init__(self, trend: bool = True, harmonic_order: int = 2,
                 sensitivity: float = 0.05, h: float = 0.25, **kwargs):
        super().__init__(trend=trend, harmonic_order=harmonic_order, **kwargs)
        self.sensitivity = float(sensitivity)
        self.h = float(h)
        self.critval = float(mosum_crit(self.sensitivity, h=self.h,
                                        period=10, functional="max"))
        self.sigma = kwargs.get("sigma")
        self.histsize = kwargs.get("histsize")
        self.n = kwargs.get("n")
        self.winsize = kwargs.get("winsize")
        self.window = kwargs.get("window")

    @property
    def process(self):
        if self.window is None:
            return None
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            return np.nansum(self.window, axis=0)

    @process.setter
    def process(self, value):
        pass  # derived quantity

    def _init_from_fit(self, X, residuals, **kwargs):
        self.histsize = np.sum(np.isfinite(residuals), axis=0).astype(np.int32)
        self.histsize[self.status != MONITORED] = 0
        self.winsize = np.floor(self.histsize * self.h).astype(np.int32)
        self.n = self.histsize.copy()
        self.boundary = np.full(residuals.shape[1], np.nan, dtype=np.float64)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            self.sigma = np.nanstd(residuals, axis=0, ddof=X.shape[1])
        with np.errstate(divide="ignore", invalid="ignore"):
            norm_resid = residuals / (self.sigma * np.sqrt(self.histsize))
        self.window = mosum_init_window(norm_resid, self.winsize)

    def _update_process(self, resid, is_valid):
        valid_idx = np.flatnonzero(is_valid)
        with np.errstate(divide="ignore", invalid="ignore"):
            slot = np.mod(self.n - self.histsize, self.winsize)[valid_idx]
            norm_resid = resid / (self.sigma * np.sqrt(self.histsize))
            self.window[slot, valid_idx] = norm_resid[valid_idx]
            self.n = self.n + is_valid
            x = self.n / self.histsize
        log_term = np.ones_like(x, dtype=np.float64)
        np.log(x, out=log_term, where=(x > np.e))
        self.boundary = np.where(is_valid,
                                 self.critval * np.sqrt(2.0 * log_term),
                                 self.boundary)

    def config_dict(self):
        d = super().config_dict()
        d.update(sensitivity=self.sensitivity, h=self.h)
        return d

    def _extra_state(self):
        return {"sigma": self.sigma, "histsize": self.histsize, "n": self.n,
                "winsize": self.winsize,
                "window": None if self.window is None else
                list(self.window.T)}

    @classmethod
    def from_state(cls, config, state):
        state = dict(state)
        window = state.pop("window", None)
        obj = super().from_state(config, state)
        if window is not None:
            obj.window = np.ascontiguousarray(np.vstack(list(window)).T,
                                              dtype=np.float64)
        return obj


class _RunLengthMonitor(BaseMonitor):
    """Shared run-length process for CCDC and IQR: ``process`` counts
    consecutive outlier observations and resets on any inlier; a break is
    ``boundary`` (default 3) consecutive outliers."""

    def __init__(self, boundary: int = 3, **kwargs):
        super().__init__(**kwargs)
        if self.boundary is None:
            self.boundary = int(boundary)

    def _is_outlier(self, resid):  # pragma: no cover - abstract
        raise NotImplementedError

    def _update_process(self, resid, is_valid):
        is_outlier = self._is_outlier(resid)
        if self.process is None:
            self.process = np.zeros(resid.shape, dtype=np.uint8)
        self.process = np.where(is_valid,
                                self.process * is_outlier + is_outlier,
                                self.process).astype(np.uint8)


@register
class CCDC(_RunLengthMonitor):
    """CCDC-style monitoring (Zhu & Woodcock 2014 semantics; reference
    ``nrt/monitor/ccdc.py``): outlier when ``|resid| / rmse > sensitivity``.
    """

    strategy = "CCDC"
    default_fit_method = "CCDC-stable"
    default_screen_outliers = "CCDC_RIRLS"
    state_columns = BaseMonitor.state_columns + ("rmse",)

    def __init__(self, trend: bool = True, harmonic_order: int = 2,
                 sensitivity: float = 3, boundary: int = 3, **kwargs):
        super().__init__(trend=trend, harmonic_order=harmonic_order,
                         boundary=boundary, **kwargs)
        self.sensitivity = float(sensitivity)
        self.rmse = kwargs.get("rmse")

    def _init_from_fit(self, X, residuals, **kwargs):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            self.rmse = np.sqrt(np.nanmean(residuals ** 2, axis=0))

    def _is_outlier(self, resid):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.abs(resid) / self.rmse > self.sensitivity

    def config_dict(self):
        d = super().config_dict()
        d.update(sensitivity=self.sensitivity)
        return d

    def _extra_state(self):
        return {"rmse": self.rmse}


@register
class IQR(_RunLengthMonitor):
    """Interquartile-range monitoring (reference ``nrt/monitor/iqr.py``):
    outlier when the residual falls outside
    ``[q25 − s·IQR, q75 + s·IQR]`` of the history residuals."""

    strategy = "IQR"
    default_fit_method = "OLS"
    state_columns = BaseMonitor.state_columns + ("q25", "q75")

    def __init__(self, trend: bool = True, harmonic_order: int = 3,
                 sensitivity: float = 1.5, boundary: int = 3, **kwargs):
        super().__init__(trend=trend, harmonic_order=harmonic_order,
                         boundary=boundary, **kwargs)
        self.sensitivity = float(sensitivity)
        self.q25 = kwargs.get("q25")
        self.q75 = kwargs.get("q75")

    def _init_from_fit(self, X, residuals, **kwargs):
        q75, q25 = nan_percentile_axis0(residuals, np.array([75, 25]))
        self.q25, self.q75 = q25, q75

    def _is_outlier(self, resid):
        iqr = self.q75 - self.q25
        lo = self.q25 - self.sensitivity * iqr
        hi = self.q75 + self.sensitivity * iqr
        with np.errstate(invalid="ignore"):
            return (resid > hi) | (resid < lo)

    def config_dict(self):
        d = super().config_dict()
        d.update(sensitivity=self.sensitivity)
        return d

    def _extra_state(self):
        return {"q25": self.q25, "q75": self.q75}
