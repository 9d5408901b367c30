"""Fault injection: a reduce worker dying mid-shuffle (process exit, not
a Python exception) must be retried transparently by Ray with
bit-identical results — task-level resilience complementing the
manifest-level resume tests in test_pipeline.py."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from nrt_ray.stages.exchange import exchange_dataset


def _expected(uids, vals):
    df = pd.DataFrame({"user_id": uids, "v": vals})
    return df.groupby("user_id", as_index=False).agg(
        n=("v", "size"), s=("v", "sum")).sort_values("user_id") \
        .reset_index(drop=True)


def test_reduce_survives_worker_death(ray_session, tmp_path):
    import ray.data
    marker = str(tmp_path / "died_once")
    rng = np.random.default_rng(7)
    uids = rng.integers(0, 40, 500)
    vals = rng.integers(1, 100, 500)

    def fold(tbl: pa.Table) -> pa.Table:
        # first reduce task to run kills its whole worker process —
        # Ray's task retry (worker failure, not app error) must rerun it
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            os._exit(1)
        u = tbl["user_id"].to_numpy(zero_copy_only=False)
        v = tbl["v"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(u, return_inverse=True)
        return pa.table({
            "user_id": pa.array(uk),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "s": pa.array(np.bincount(
                inv, weights=v.astype(np.float64)).astype(np.int64))})

    def empty() -> pa.Table:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64())})

    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(uids, pa.int64()),
        "v": pa.array(vals, pa.int64()),
        "pid": pa.array((uids % 3).astype(np.int64)),
    })).repartition(4)
    got = exchange_dataset(ds, 3, fold, empty).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert os.path.exists(marker), "fault was never injected"
    exp = _expected(uids, vals)
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["s"].tolist() == exp["s"].tolist()


def test_cogroup_survives_worker_death(ray_session, tmp_path):
    import ray.data
    from nrt_ray.stages.shuffle_join import shuffle_cogroup
    marker = str(tmp_path / "cg_died_once")
    lk = np.arange(100) % 10
    rk = np.arange(10)

    def empty():
        return pa.table({"k": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})

    def reduce_fn(lt, rt):
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            os._exit(1)
        if lt is None:
            return empty()
        u, cnt = np.unique(lt["k"].to_numpy(zero_copy_only=False),
                           return_counts=True)
        return pa.table({"k": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    lds = ray.data.from_arrow(pa.table(
        {"k": pa.array(lk, pa.int64())})).repartition(3)
    rds = ray.data.from_arrow(pa.table({"rk": pa.array(rk, pa.int64())}))
    got = shuffle_cogroup(lds, rds, on_left="k", on_right="rk",
                          num_partitions=3, reduce_fn=reduce_fn,
                          empty_fn=empty).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert os.path.exists(marker)
    assert got["k"].tolist() == list(range(10))
    assert got["n"].tolist() == [10] * 10


def test_flagship_pipeline_survives_mid_commit_death(ray_session,
                                                     tmp_path):
    """FLAGSHIP end-to-end: a reduce worker dies after writing its
    partition's state table but before the manifest commit.  Ray's task
    retry must rerun the partition, the atomic tmp+rename writes must
    overwrite the partial output, and every artifact must equal the
    uninterrupted run byte-for-bit (mirrors the reference's atomic-move
    backup story, /root/reference/docs/deploy.rst:445-448)."""
    import pyarrow.parquet as pq

    from nrt_ray.pipelines import monitor_pipeline as mp
    from nrt_ray.sources import synthetic
    from nrt_ray.stages import rollup

    d = str(tmp_path / "wt")
    info = synthetic.generate_webtext(d, n_urls=16, seed=11)
    tiers = (rollup.TierSpec("1d"), rollup.TierSpec("1w"))
    common = dict(strategy="EWMA", monitor_params={"trend": False},
                  monitor_start="2021-01-01", num_partitions=4,
                  tiers=tiers)

    ref = str(tmp_path / "ref")
    mp.run_pipeline(info["webtext"], ref, **common)

    marker = str(tmp_path / "died_once")

    def die_once_mid_commit(pid: int) -> None:
        # kill THIS worker process the first time any partition reaches
        # the post-state-write / pre-commit window (partial uncommitted
        # output on disk) — the hardest crash point for the manifest
        # contract.  (A closure so cloudpickle ships it by value; the
        # tests package is not importable from Ray workers.)
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write(str(pid))
            os._exit(1)

    out = str(tmp_path / "out")
    s = mp.run_pipeline(info["webtext"], out,
                        fault_hook=die_once_mid_commit, **common)
    assert os.path.exists(marker), "fault was never injected"
    assert s["partitions_processed"] == 4

    for name in ("state", "alerts", "rollup_1d", "rollup_1w",
                 "segments"):
        a = mp.read_output_table(out, name)
        b = mp.read_output_table(ref, name)
        assert a.num_rows == b.num_rows, name
        assert a.equals(b), f"{name} differs after mid-commit death"

    # and the store still resumes as fully committed (no orphan work)
    s2 = mp.run_pipeline(info["webtext"], out, **common)
    assert s2["partitions_processed"] == 0
    assert s2["partitions_skipped"] == 4
