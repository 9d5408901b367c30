"""Two-sided shuffle hash join vs a pandas merge reference: one-to-many
expansion, keys missing on either side, empty partitions, P=1."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from nrt_ray.stages.shuffle_join import shuffle_hash_join


def _run(left, right, nparts):
    import ray.data

    def empty():
        return pa.table({"k": pa.array([], pa.int64()),
                         "lv": pa.array([], pa.int64()),
                         "rv": pa.array([], pa.int64())})

    lds = ray.data.from_arrow(pa.table(left)).repartition(3)
    rds = ray.data.from_arrow(pa.table(right)).repartition(2)
    out = shuffle_hash_join(lds, rds, on_left="k", on_right="rk",
                            num_partitions=nparts, empty_fn=empty)
    return out.to_pandas().sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)


@pytest.mark.parametrize("nparts", [1, 4])
def test_join_matches_pandas_merge(ray_session, nparts):
    rng = np.random.default_rng(3)
    left = {"k": pa.array(rng.integers(0, 30, 200), pa.int64()),
            "lv": pa.array(np.arange(200), pa.int64())}
    right = {"rk": pa.array(rng.integers(10, 40, 60), pa.int64()),
             "rv": pa.array(np.arange(60), pa.int64())}
    got = _run(left, right, nparts)
    exp = pd.merge(pd.DataFrame({"k": left["k"], "lv": left["lv"]}),
                   pd.DataFrame({"rk": right["rk"], "rv": right["rv"]}),
                   left_on="k", right_on="rk") \
        .drop(columns=["rk"]) \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])


def test_join_no_matches(ray_session):
    import ray.data

    def empty():
        return pa.table({"k": pa.array([], pa.int64()),
                         "lv": pa.array([], pa.int64()),
                         "rv": pa.array([], pa.int64())})

    lds = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, 2, 3], pa.int64()),
         "lv": pa.array([1, 2, 3], pa.int64())}))
    rds = ray.data.from_arrow(pa.table(
        {"rk": pa.array([10, 11], pa.int64()),
         "rv": pa.array([0, 1], pa.int64())}))
    out = shuffle_hash_join(lds, rds, on_left="k", on_right="rk",
                            num_partitions=4, empty_fn=empty)
    assert out.count() == 0
    # schema survives on the blocks (pandas conversion of an all-empty
    # dataset drops columns — a Ray Data quirk, not a join property)
    assert [f.name for f in out.schema().base_schema] == ["k", "lv", "rv"]


def test_join_skewed_hot_key(ray_session):
    """One key carrying half of both sides: correctness holds (the hot
    group simply lands in one partition — the documented skew caveat)."""
    rng = np.random.default_rng(11)
    lk = np.where(rng.random(300) < 0.5, 7, rng.integers(0, 50, 300))
    rk = np.where(rng.random(40) < 0.5, 7, rng.integers(0, 50, 40))
    left = {"k": pa.array(lk, pa.int64()),
            "lv": pa.array(np.arange(300), pa.int64())}
    right = {"rk": pa.array(rk, pa.int64()),
             "rv": pa.array(np.arange(40), pa.int64())}
    got = _run(left, right, 4)
    exp = pd.merge(pd.DataFrame({"k": lk, "lv": np.arange(300)}),
                   pd.DataFrame({"rk": rk, "rv": np.arange(40)}),
                   left_on="k", right_on="rk").drop(columns=["rk"]) \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])


def test_anti_join(ray_session):
    import ray.data
    rng = np.random.default_rng(21)
    lk = rng.integers(0, 30, 150)

    def empty():
        return pa.table({"k": pa.array([], pa.int64()),
                         "lv": pa.array([], pa.int64())})

    lds = ray.data.from_arrow(pa.table(
        {"k": pa.array(lk, pa.int64()),
         "lv": pa.array(np.arange(150), pa.int64())})).repartition(3)
    rds = ray.data.from_arrow(pa.table(
        {"rk": pa.array([3, 7, 11, 29, 99], pa.int64())}))
    got = shuffle_hash_join(lds, rds, on_left="k", on_right="rk",
                            num_partitions=4, empty_fn=empty,
                            how="anti").to_pandas() \
        .sort_values("lv").reset_index(drop=True)
    keep = ~np.isin(lk, [3, 7, 11, 29, 99])
    assert got["lv"].tolist() == np.arange(150)[keep].tolist()
    assert got["k"].tolist() == lk[keep].tolist()

def test_semi_join(ray_session):
    import ray.data
    rng = np.random.default_rng(31)
    lk = rng.integers(0, 30, 150)

    def empty():
        return pa.table({"k": pa.array([], pa.int64()),
                         "lv": pa.array([], pa.int64())})

    lds = ray.data.from_arrow(pa.table(
        {"k": pa.array(lk, pa.int64()),
         "lv": pa.array(np.arange(150), pa.int64())})).repartition(3)
    # duplicated right keys must NOT expand the left side
    rds = ray.data.from_arrow(pa.table(
        {"rk": pa.array([3, 3, 7, 11, 29, 29, 99], pa.int64())}))
    got = shuffle_hash_join(lds, rds, on_left="k", on_right="rk",
                            num_partitions=4, empty_fn=empty,
                            how="semi").to_pandas() \
        .sort_values("lv").reset_index(drop=True)
    keep = np.isin(lk, [3, 7, 11, 29, 99])
    assert got["lv"].tolist() == np.arange(150)[keep].tolist()
    assert got["k"].tolist() == lk[keep].tolist()


@pytest.mark.parametrize("nparts", [1, 4])
def test_left_outer_join(ray_session, nparts):
    import ray.data
    rng = np.random.default_rng(41)
    lk = rng.integers(0, 30, 120)
    rk = rng.integers(15, 45, 40)

    def empty():
        return pa.table({"k": pa.array([], pa.int64()),
                         "lv": pa.array([], pa.int64()),
                         "rv": pa.array([], pa.int64())})

    lds = ray.data.from_arrow(pa.table(
        {"k": pa.array(lk, pa.int64()),
         "lv": pa.array(np.arange(120), pa.int64())})).repartition(3)
    rds = ray.data.from_arrow(pa.table(
        {"rk": pa.array(rk, pa.int64()),
         "rv": pa.array(np.arange(40), pa.int64())})).repartition(2)
    got = shuffle_hash_join(lds, rds, on_left="k", on_right="rk",
                            num_partitions=nparts, empty_fn=empty,
                            how="left_outer").to_pandas() \
        .sort_values(["k", "lv", "rv"], na_position="last") \
        .reset_index(drop=True)
    exp = pd.merge(pd.DataFrame({"k": lk, "lv": np.arange(120)}),
                   pd.DataFrame({"rk": rk, "rv": np.arange(40)}),
                   left_on="k", right_on="rk", how="left") \
        .drop(columns=["rk"]) \
        .sort_values(["k", "lv", "rv"], na_position="last") \
        .reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["lv"].tolist() == exp["lv"].tolist()
    assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist()


def test_left_outer_join_empty_right(ray_session):
    import ray.data

    def empty():
        return pa.table({"k": pa.array([], pa.int64()),
                         "lv": pa.array([], pa.int64()),
                         "rv": pa.array([], pa.int64())})

    lds = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, 2, 3], pa.int64()),
         "lv": pa.array([10, 20, 30], pa.int64())}))
    rds = ray.data.from_arrow(pa.table(
        {"rk": pa.array([], pa.int64()),
         "rv": pa.array([], pa.int64())}))
    got = shuffle_hash_join(lds, rds, on_left="k", on_right="rk",
                            num_partitions=2, empty_fn=empty,
                            how="left_outer").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [1, 2, 3]
    assert got["rv"].isna().all()


@pytest.mark.parametrize("nparts", [1, 4])
def test_cogroup_fused_aggregate_join(ray_session, nparts):
    """cogroup sees every row of a key range from both sides, so a
    per-key aggregate computed inside the reduce is complete."""
    import ray.data
    from nrt_ray.stages.shuffle_join import shuffle_cogroup
    rng = np.random.default_rng(51)
    lk = rng.integers(0, 25, 200)
    lv = rng.integers(1, 10, 200)
    rk = np.arange(25)

    def empty():
        return pa.table({"k": pa.array([], pa.int64()),
                         "lsum": pa.array([], pa.int64()),
                         "rcnt": pa.array([], pa.int64())})

    def reduce_fn(lt, rt):
        if lt is None or rt is None:
            return empty()
        keys = lt["k"].to_numpy(zero_copy_only=False)
        v = lt["lv"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        lsum = np.bincount(inv, weights=v.astype(np.float64)) \
            .astype(np.int64)
        rkeys = np.sort(rt["rk"].to_numpy(zero_copy_only=False))
        rcnt = np.searchsorted(rkeys, uk, side="right") \
            - np.searchsorted(rkeys, uk, side="left")
        return pa.table({"k": pa.array(uk), "lsum": pa.array(lsum),
                         "rcnt": pa.array(rcnt.astype(np.int64))})

    lds = ray.data.from_arrow(pa.table(
        {"k": pa.array(lk, pa.int64()),
         "lv": pa.array(lv, pa.int64())})).repartition(3)
    rds = ray.data.from_arrow(pa.table(
        {"rk": pa.array(rk, pa.int64())})).repartition(2)
    got = shuffle_cogroup(lds, rds, on_left="k", on_right="rk",
                          num_partitions=nparts, reduce_fn=reduce_fn,
                          empty_fn=empty).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = pd.DataFrame({"k": lk, "lv": lv}).groupby("k", as_index=False) \
        .agg(lsum=("lv", "sum"))
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["lsum"].tolist() == exp["lsum"].tolist()
    assert (got["rcnt"] == 1).all()


def test_bfs_broadcast_and_join_paths_agree(ray_session):
    """supplier_network_hops: the broadcast-frontier fast path and the
    fully distributed semi/anti-join path must produce identical hop
    tables (threshold=0 forces every level onto the join path)."""
    from nrt_ray.pipelines.relational import supplier_network_hops
    sf = "/root/testdata/sf0.001"
    a = supplier_network_hops(sf).to_pandas() \
        .sort_values(["ntype", "node_key"]).reset_index(drop=True)
    b = supplier_network_hops(sf, broadcast_threshold=0).to_pandas() \
        .sort_values(["ntype", "node_key"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["hop"] == 0).sum() == 1          # the seed


@pytest.mark.parametrize("keytype", ["int", "str"])
def test_keyed_sum_matches_pandas(ray_session, keytype):
    import ray.data
    from nrt_ray.stages.hashagg import keyed_sum
    rng = np.random.default_rng(61)
    if keytype == "int":
        keys = rng.integers(0, 50, 300)
        karr = pa.array(keys, pa.int64())
        kdtype = pa.int64()
    else:
        keys = np.array([f"tok{i}" for i in
                         rng.integers(0, 50, 300)], dtype=object)
        karr = pa.array(keys, pa.string())
        kdtype = pa.string()
    a = rng.integers(-5, 100, 300)
    b = rng.integers(0, 10, 300)
    ds = ray.data.from_arrow(pa.table(
        {"k": karr, "a": pa.array(a, pa.int64()),
         "b": pa.array(b, pa.int64())})).repartition(4)
    got = keyed_sum(ds, "k", ["a", "b"], 3, key_dtype=kdtype) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = pd.DataFrame({"k": keys, "a": a, "b": b}) \
        .groupby("k", as_index=False).sum().sort_values("k") \
        .reset_index(drop=True)
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["a"].tolist() == exp["a"].tolist()
    assert got["b"].tolist() == exp["b"].tolist()
