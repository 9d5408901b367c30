"""Driver-style correctness gate, run locally: every catalog query with an
SQL oracle must match DuckDB on row count, schema and (order-insensitive)
values; rows-only queries must run and return sane shapes."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"'{SF_DIR}/{t}.parquet'")
    return c


def _to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _queries():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queries(), mod.oracle_sql()


QUERIES, ORACLES = None, None


def _load():
    global QUERIES, ORACLES
    if QUERIES is None:
        QUERIES, ORACLES = _queries()
    return QUERIES, ORACLES


def _sql_checked_names():
    q, o = _load()
    return sorted(o)


def _rows_only_names():
    q, o = _load()
    return sorted(set(q) - set(o))


@pytest.mark.parametrize("name", _sql_checked_names())
def test_query_matches_duckdb(ray_session, con, name):
    q, o = _load()
    got = _normalize(_to_pandas(q[name](SF_DIR)))
    exp = _normalize(con.sql(o[name]).df())
    assert list(got.columns) == list(exp.columns), name
    assert len(got) == len(exp), name
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_runs(ray_session, name):
    q, _ = _load()
    got = _to_pandas(q[name](SF_DIR))
    assert got is not None
    assert len(got.columns) > 0


def test_entry_smoke(ray_session):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry2", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = _to_pandas(mod.entry())
    assert len(res) >= 0
    assert "bucket_ts" in res.columns
