"""JSONL / CSV interchange round-trips: value-identical to the parquet
source after the documented timestamp encoding, streamed shard-wise."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from nrt_ray.sources import formats

SF_DIR = os.environ.get("NRT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _events(limit=None):
    import ray.data
    ds = ray.data.read_parquet(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"])
    return ds


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("event_id").reset_index(drop=True) \
        [["event_id", "ts", "user_id", "event_type", "value"]]


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_roundtrip_events(ray_session, tmp_path, fmt):
    src = _events()
    out = str(tmp_path / fmt)
    if fmt == "jsonl":
        ts_cols = formats.dataset_to_jsonl(src, out)
        back = formats.jsonl_to_dataset(out, ts_cols)
    else:
        ts_cols = formats.dataset_to_csv(src, out)
        back = formats.csv_to_dataset(out, ts_cols)
    assert ts_cols == ["ts"]
    a = _norm(src.to_pandas())
    b = _norm(back.to_pandas())
    assert len(os.listdir(out)) >= 1        # sharded, not one giant file
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_csv_float_bit_exact(ray_session, tmp_path):
    """Doubles survive CSV via shortest-repr round-trip."""
    src = _events()
    out = str(tmp_path / "csv_exact")
    formats.dataset_to_csv(src, out)
    back = formats.csv_to_dataset(out, ["ts"])
    a = _norm(src.to_pandas())["value"].to_numpy()
    b = _norm(back.to_pandas())["value"].to_numpy()
    assert (a == b).all()


def test_roundtrip_ipc(ray_session, tmp_path):
    src = _events()
    out = str(tmp_path / "ipc")
    paths = formats.dataset_to_ipc(src, out)
    assert paths and all(p.endswith(".arrow") for p in paths)
    back = formats.ipc_to_dataset(out)
    a = _norm(src.to_pandas())
    b = _norm(back.to_pandas())
    pd.testing.assert_frame_equal(a, b)      # type-exact, incl. ts dtype
    assert back.schema().base_schema.field("ts").type == "timestamp[us]"


def test_ipc_preserves_binary_and_lists(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data
    t = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "blob": pa.array([b"\x00\xff", b"abc"], pa.binary()),
        "vec": pa.array([[1.5, 2.5], [3.5]], pa.list_(pa.float64())),
    })
    out = str(tmp_path / "ipc2")
    formats.dataset_to_ipc(ray.data.from_arrow(t), out)
    got = formats.ipc_to_dataset(out).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got["blob"].tolist() == [b"\x00\xff", b"abc"]
    assert [list(v) for v in got["vec"]] == [[1.5, 2.5], [3.5]]
