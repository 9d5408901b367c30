"""Shared fixtures: golden conformance corpus + a single Ray session.

The golden CSVs under ``tests/data`` are vendored from the reference test
suite (R strucchange/bfast/statsmodels outputs) — see tests/data/README.md.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run."""
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def X_y_dates_romania():
    X = np.loadtxt(DATA / "X.csv", delimiter=",", dtype=np.float64)
    y = np.loadtxt(DATA / "y.csv", delimiter=",", dtype=np.float64)
    dates = np.genfromtxt(DATA / "dates.csv", delimiter=",") \
        .astype("datetime64[ns]")
    return X, y, dates


@pytest.fixture(scope="session")
def golden_recresid():
    return np.genfromtxt(DATA / "rr_result.csv", delimiter=",",
                         dtype=np.float64, missing_values="NA")


@pytest.fixture(scope="session")
def golden_efp():
    return np.genfromtxt(DATA / "efp_result.csv", delimiter=",",
                         dtype=np.float64, missing_values="NA")


@pytest.fixture(scope="session")
def golden_roc_history():
    return np.loadtxt(DATA / "roc_history_result.csv", delimiter=",",
                      dtype=np.float64)


@pytest.fixture(scope="session")
def golden_cusum():
    return np.loadtxt(DATA / "cusum_result.csv", delimiter=",",
                      dtype=np.float64)


@pytest.fixture(scope="session")
def golden_mosum():
    return np.loadtxt(DATA / "mosum_result.csv", delimiter=",",
                      dtype=np.float64)


@pytest.fixture(scope="session")
def X_y_RLM():
    X = np.loadtxt(DATA / "RLM_X.csv", delimiter=",", dtype=np.float64)
    y = np.loadtxt(DATA / "RLM_y.csv", delimiter=",", dtype=np.float64)
    return X, y


@pytest.fixture(scope="session")
def golden_RLM():
    # statsmodels RLM(TukeyBiweight) coefficients for X_y_RLM (see
    # FIXTURES.md §2 / reference unit-test conftest)
    return np.array([
        [2.3757569983999076, -51.621207292381314],
        [1.5919053949452396e-05, -0.00019788972214892546],
        [4.960483948314601, -73.95341088849317],
        [4.0427485592574195, -17.66452192456504],
        [1.0676653146683237, 0.579422996703399],
        [-0.7172424822211365, -49.52111301879781],
        [1.2701246101474761, -38.324020145702654],
        [1.1329168669944791, -9.034638787625045]], dtype=np.float64)


@pytest.fixture
def X_y_intercept_slope():
    np.random.seed(0)
    slope, intercept = 2.0, 5.0
    X = np.c_[np.ones(10), np.arange(10)]
    y = np.array([slope * X[:, 1] + intercept,
                  slope * X[:, 1] + intercept])
    y[0, 9] = 0.0
    y[1, 0] = 23.0
    return X, y.T, intercept, slope


@pytest.fixture
def X_y_clear(X_y_intercept_slope):
    X, y, intercept, slope = X_y_intercept_slope
    clear = np.ones_like(y, dtype=bool)
    clear[9, 0] = False
    clear[0, 1] = False
    return X, y, clear


@pytest.fixture
def stability_ccdc():
    np.random.seed(0)
    a_len = 30
    residuals = (np.random.rand(a_len, 4) - 0.5) * 2
    residuals[0, 0] = 100
    residuals[-1, 1] = 100
    ts = np.array([np.ones(a_len),
                   np.ones(a_len),
                   np.arange(a_len) * 20 + 5,
                   np.ones(a_len)]).T
    ts[a_len // 2, 3] = np.nan
    X = np.array([np.ones(a_len), np.arange(a_len)]).T
    y = ts + residuals
    dates = np.linspace(1, 365, a_len)
    expected = np.array([True, False, False, True])
    return X, y, dates, expected
