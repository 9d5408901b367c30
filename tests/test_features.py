"""Planted-fixture tests for the feature-assembly operators (PMI
collocations + point-in-time as-of features).  The catalog gate checks
them against DuckDB; these pin intended behavior on hand-built data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from nrt_ray.pipelines import features as ft


def _df(res):
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return res.to_pandas() if hasattr(res, "to_pandas") else res


def _write_docs(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_pmi_planted_collocation(ray_session, tmp_path):
    # "new york" always adjacent; "the cat/dog/car..." words spread out.
    fillers = ["the cat sat", "a dog ran", "one car sped",
               "the sun rose", "a bird flew"]
    texts = [f"new york {fillers[i % len(fillers)]}" for i in range(10)]
    sf = _write_docs(tmp_path, texts)
    out = _df(ft.pmi_collocations(sf, k=5, min_count=5))
    assert out.iloc[0]["bigram"] == "new york"
    # closed form: c_ab=10, c_a=c_b=10, N=50 -> ln(10*50/100)=ln 5
    assert out.iloc[0]["n_pair"] == 10
    assert abs(out.iloc[0]["pmi"] - round(math.log(5.0), 6)) < 1e-9
    # nothing else reaches the min_count floor of 5 except "new york"
    # ("york the"/"york a" appear <5 times each)
    assert (out["n_pair"] >= 5).all()


def test_pmi_min_count_floor(ray_session, tmp_path):
    sf = _write_docs(tmp_path, ["alpha beta", "alpha beta",
                                "gamma delta"])
    out = _df(ft.pmi_collocations(sf, k=10, min_count=2))
    assert set(out["bigram"]) == {"alpha beta"}
    assert out.iloc[0]["n_pair"] == 2


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array(np.array([pd.Timestamp(r[0]).value // 1000
                                 for r in rows], dtype="datetime64[us]")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([float(r[3]) for r in rows], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_features_cutoff_semantics(ray_session, tmp_path):
    base = pd.Timestamp("2024-03-01")
    day = pd.Timedelta(days=1)
    rows = [
        # user 1: old event, one purchase inside the 7d window, one
        # event INSIDE the label window (after cutoff -> must not leak)
        (base + 0 * day, 1, "view", 1.0),
        (base + 10 * day, 1, "purchase", 12.34),
        (base + 16 * day, 1, "purchase", 99.99),   # after cutoff
        # user 2: everything after the cutoff -> no feature row
        (base + 15 * day, 2, "click", 1.0),
        # user 3 defines max ts (cutoff = base+21-7 = base+14)
        (base + 21 * day, 3, "view", 1.0),
        (base + 13 * day, 3, "click", 2.0),
    ]
    sf = _write_events(tmp_path, rows)
    out = _df(ft.user_features_asof(sf)).set_index("user_id")
    # cutoff = base+14d; user 2's only event is at +15d
    assert set(out.index) == {1, 3}
    u1 = out.loc[1]
    assert u1["n_events_total"] == 2         # +16d event excluded
    assert u1["n_events_7d"] == 1            # only the +10d purchase
    assert u1["n_purchases_7d"] == 1
    assert u1["spend_7d_cents"] == 1234
    assert u1["last_age_s"] == 4 * 86400.0   # cutoff - (+10d)
    u3 = out.loc[3]
    assert u3["n_events_total"] == 1         # +21d is after cutoff
    assert u3["n_events_7d"] == 1            # +13d is inside (cutoff-7, cutoff]
    assert u3["n_purchases_7d"] == 0
    assert u3["spend_7d_cents"] == 0
    assert u3["last_age_s"] == 1 * 86400.0
