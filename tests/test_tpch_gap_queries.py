"""Planted-fixture tests for the four TPC-H gap shapes added in round 3
(q2 correlated-min, q11 global-scalar HAVING, q16 distinct-count with
anti-join, q20 correlated dominance): tiny handcrafted tables where the
edge cases are explicit — min-cost ties, out-of-region suppliers, the
negative-acctbal anti-join, the exactly-half dominance boundary, and
duplicate (part, supplier) lines that must count once.

Each test runs the Ray query AND the catalog's DuckDB oracle on the
same fixture and asserts value equality — the driver's check, locally,
on inputs chosen to hit the branches the random tables may miss."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TS96 = np.datetime64("1996-06-01", "us").astype(np.int64)
TS97 = np.datetime64("1997-06-01", "us").astype(np.int64)


def _fixture(tmp_path):
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 3], pa.int64()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int64()),
        "n_name": pa.array(["N_EU", "N_AS", "N_EU2"], pa.string()),
        "n_regionkey": pa.array([3, 0, 3], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    # s4 has negative acctbal (q16's "complaints" analog)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
        "s_name": pa.array([f"S{i}" for i in (1, 2, 3, 4)], pa.string()),
        "s_nationkey": pa.array([0, 2, 1, 0], pa.int64()),
        "s_acctbal": pa.array([10.0, 20.0, 30.0, -5.0], pa.float64()),
    }), str(tmp_path / "supplier.parquet"))
    # p1/p2 size 15 (q2's filter); p3 size 3 and p5 size 9 (q16's
    # default size set); p4 size 9 but PROMO (type-excluded from q16);
    # p1..p3 named 'small …' (q20's prefix), p4/p5 not
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "p_name": pa.array(["small ring", "small bolt", "small gear",
                            "red widget", "red gear"], pa.string()),
        "p_brand": pa.array(["Brand#1", "Brand#3", "Brand#2", "Brand#1",
                             "Brand#2"], pa.string()),
        "p_type": pa.array(["LARGE", "LARGE", "MEDIUM", "PROMO",
                            "LARGE"], pa.string()),
        "p_size": pa.array([15, 15, 3, 9, 9], pa.int64()),
        "p_retailprice": pa.array([1.0, 2.0, 3.0, 4.0, 5.0],
                                  pa.float64()),
    }), str(tmp_path / "part.parquet"))
    rows = [
        # (orderkey, partkey, suppkey, qty, extprice, shipdate)
        # p1: s1 offers 10.00 twice (dup pair, min kept once), s2 ties
        #     at 10.00, s3 (ASIA) cheaper but out of region for q2
        (1, 1, 1, 4, 10.00, TS96),
        (2, 1, 1, 2, 12.00, TS96),
        (3, 1, 2, 4, 10.00, TS96),
        (4, 1, 3, 10, 1.00, TS96),
        # p2: only s2; 1997 line must not count for q20's 1996 window
        (5, 2, 2, 6, 20.00, TS96),
        (6, 2, 2, 9, 20.00, TS97),
        # p3: s1 ships exactly half of 1996 qty (>= boundary => counts),
        #     s4 the other half but is anti-joined out of q16
        (7, 3, 1, 5, 30.00, TS96),
        (8, 3, 4, 5, 30.00, TS96),
        # p4: non-prefix, PROMO-typed part (excluded from q16/q20)
        (9, 4, 3, 1, 40.00, TS96),
        # p5: q16 distinct count over {s2, s3}; the duplicate (p5, s3)
        # pair must count once
        (10, 5, 2, 1, 10.00, TS96),
        (11, 5, 3, 1, 10.00, TS96),
        (12, 5, 3, 1, 12.00, TS96),
    ]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_linenumber": pa.array([1] * len(rows), pa.int64()),
        "l_quantity": pa.array([float(r[3]) for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[4] for r in rows], pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array([r[5] for r in rows], pa.int64())
            .cast(pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _oracle(sf_dir: str, name: str) -> pd.DataFrame:
    from nrt_ray.pipelines.catalog import oracle_sql
    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "part", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{sf_dir}/{t}.parquet'")
    return con.sql(oracle_sql()[name]).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_match(sf_dir, name, fn, expect_rows):
    got = _norm(fn(sf_dir).to_pandas())
    exp = _norm(_oracle(sf_dir, name))
    assert len(got) == expect_rows, got
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_q2_min_cost_ties_and_region(ray_session, tmp_path):
    from nrt_ray.pipelines.relational import q2_min_cost_supplier
    d = _fixture(tmp_path)
    # p1: s1 and s2 tie at 10.00 (both returned); s3's cheaper ASIA
    # offer is out of region.  p2: s2 alone.  => 3 rows
    _assert_match(d, "q2_min_cost_supplier", q2_min_cost_supplier, 3)
    got = _norm(q2_min_cost_supplier(d).to_pandas())
    assert set(got["s_name"]) == {"S1", "S2"}
    assert (got.loc[got["p_partkey"] == 1, "supply_cost"] == 10.0).all()


def test_q11_above_mean_having(ray_session, tmp_path):
    from nrt_ray.pipelines.relational import q11_important_stock
    d = _fixture(tmp_path)
    # ASIA supplier is s3 only: p1 value 1.00, p4 value 40.00,
    # p5 value 22.00; mean 21.00 => p4 and p5 qualify
    _assert_match(d, "q11_important_stock", q11_important_stock, 2)
    got = q11_important_stock(d).to_pandas().sort_values("l_partkey")
    assert got["l_partkey"].tolist() == [4, 5]
    assert got["part_value"].tolist() == [40.0, 22.0]


def test_q16_distinct_counts_anti_join(ray_session, tmp_path):
    from nrt_ray.pipelines.relational import q16_supplier_part_counts
    d = _fixture(tmp_path)
    # default sizes keep p3 (Brand#2 MEDIUM 3: supps {1,4}, s4
    # anti-joined out => 1) and p5 (Brand#2 LARGE 9: supps {2,3} with
    # the duplicate pair counted once => 2); p4 excluded (PROMO),
    # p1/p2 excluded (size 15)
    _assert_match(d, "q16_supplier_part_counts",
                  q16_supplier_part_counts, 2)
    got = q16_supplier_part_counts(d).to_pandas()
    by_type = dict(zip(got["p_type"], got["supplier_cnt"]))
    assert by_type == {"MEDIUM": 1, "LARGE": 2}


def test_q20_dominance_half_boundary(ray_session, tmp_path):
    from nrt_ray.pipelines.relational import q20_dominant_part_suppliers
    d = _fixture(tmp_path)
    # 1996 'small%' parts: p1 total 20 (s1: 6 <half, s2: 4 <half,
    # s3: 10 = half => dominates); p2 total 6 (s2 all => dominates;
    # the 1997 line is outside the window); p3 total 10 (s1 and s4
    # each exactly half => both dominate)
    _assert_match(d, "q20_dominant_part_suppliers",
                  q20_dominant_part_suppliers, 4)
    got = q20_dominant_part_suppliers(d).to_pandas()
    dom = dict(zip(got["s_name"], got["n_parts_dominated"]))
    assert dom == {"S3": 1, "S2": 1, "S1": 1, "S4": 1}
