"""Generator determinism + extraction byte-identity invariant."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from nrt_ray.sources import extract, synthetic


@pytest.fixture(scope="session")
def webtext_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("webtext")
    info = synthetic.generate_webtext(str(d), n_urls=64, seed=42)
    assert info["rows"] > 0
    return d


def test_generator_deterministic(tmp_path):
    a = synthetic.generate_webtext(str(tmp_path / "a"), n_urls=16, seed=7)
    b = synthetic.generate_webtext(str(tmp_path / "b"), n_urls=16, seed=7)
    ta = pq.read_table(a["webtext"])
    tb = pq.read_table(b["webtext"])
    assert ta.equals(tb)


def test_schema(webtext_dir):
    t = pq.read_table(webtext_dir / "webtext.parquet")
    assert [f.name for f in t.schema] == ["url", "warc_ts", "html", "text",
                                          "lang"]
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert str(t.schema.field("html").type) == "binary"


def test_extract_byte_identity(webtext_dir):
    """Pipeline invariant: text == extract_text(html) byte-for-byte."""
    t = pq.read_table(webtext_dir / "webtext.parquet")
    for html, text in zip(t.column("html").to_pylist(),
                          t.column("text").to_pylist()):
        assert extract.extract_text(html) == text.encode("utf-8")


def test_parse_signal_roundtrip(webtext_dir):
    t = pq.read_table(webtext_dir / "webtext.parquet")
    texts = t.column("text").to_pylist()
    vals = np.array([extract.parse_signal(s.encode()) for s in texts])
    finite = np.isfinite(vals)
    assert finite.mean() > 0.9  # signals mostly present
    assert np.all((vals[finite] > -2) & (vals[finite] < 3))


def test_extract_batch_transform(webtext_dir):
    t = pq.read_table(webtext_dir / "webtext.parquet")
    out = extract.ExtractSignal(verify=True)(t)
    assert out.column_names == ["url", "warc_ts", "value", "days", "dyear"]
    vals = out.column("value").to_numpy(zero_copy_only=False)
    texts = t.column("text").to_pylist()
    expected = np.array([extract.parse_signal(s.encode()) for s in texts])
    np.testing.assert_array_equal(np.isnan(vals), np.isnan(expected))
    np.testing.assert_allclose(vals[~np.isnan(vals)],
                               expected[~np.isnan(expected)])
    # decimal-year column matches the reference formula
    from nrt_ray.kernels.regressors import decimal_years, days_since_epoch
    ts = t.column("warc_ts").to_pandas()
    np.testing.assert_allclose(out.column("dyear").to_numpy(),
                               decimal_years(ts), rtol=1e-12)
    np.testing.assert_array_equal(out.column("days").to_numpy(),
                                  days_since_epoch(ts))


def test_extract_verify_catches_corruption(webtext_dir):
    import pyarrow as pa
    t = pq.read_table(webtext_dir / "webtext.parquet").slice(0, 10)
    bad_text = t.column("text").to_pylist()
    bad_text[3] = bad_text[3] + " tampered"
    t = t.set_column(t.schema.get_field_index("text"), "text",
                     pa.array(bad_text, pa.string()))
    with pytest.raises(ValueError, match="byte-identical"):
        extract.ExtractSignal(verify=True)(t)
