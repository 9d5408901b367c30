"""Deterministic html → text extraction and signal parsing.

This is the per-row invariant anchor demanded by the input contract: for
every crawl snapshot, the pipeline's extracted ``text`` must equal
``extract_text(html)`` byte-for-byte, and the monitored scalar signal is
parsed from that text.  (The reference's analog is the NDVI projection
``(B8A-B04)/(B8A+B04)`` + cloud filter applied per acquisition — see
``/root/reference/tests/integration_tests/conftest.py:35-40``.)

Everything here is dependency-free and deterministic; the extractor is a
total function: malformed html yields an empty string, a missing signal
token yields NaN.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Signal token embedded in page text by the generator, e.g. "ndvi:0.532617".
# NaN analog (masked observation) is encoded as "ndvi:nan".
SIGNAL_RE = re.compile(rb"ndvi:(-?\d+\.\d{6}|nan)")
_PARA_RE = re.compile(rb"<p>(.*?)</p>", re.S)


def extract_text(html: bytes) -> bytes:
    """Extract the page text from an html document (bytes in, bytes out).

    The contract is exact-match with the generator's template: the page text
    is the content of the first ``<p>...</p>`` element, unmodified.
    """
    m = _PARA_RE.search(html)
    return m.group(1) if m else b""


def parse_signal(text: bytes) -> float:
    """Parse the monitored scalar from extracted text; NaN when absent."""
    m = SIGNAL_RE.search(text)
    if not m or m.group(1) == b"nan":
        return float("nan")
    return float(m.group(1))


class ExtractSignal:
    """Ray Data batch transform: crawl snapshots → (url, warc_ts, value).

    Arrow in / Arrow out.  Projects away the wide ``html``/``text`` columns
    immediately (they dominate block size) and emits only the narrow
    numeric columns every downstream stage needs:

    ``url: string, warc_ts: timestamp[us], value: float64,
    days: int32 (days since epoch), dyear: float64 (decimal year)``

    ``days``/``dyear`` are computed vectorized here once so the fit stage
    never needs to touch timestamps again.

    Args:
        verify: when True, additionally re-extract text from ``html`` and
            raise if any row's stored ``text`` differs byte-for-byte (the
            extraction invariant); costs one regex pass over the html.
        aux: when True, also emit the ``aux_green``/``aux_swir`` secondary
            signals (needed only for CCDC_RIRLS outlier screening — off by
            default so the shuffle stays as narrow as possible).
    """

    def __init__(self, verify: bool = False, aux: bool = False):
        self.verify = verify
        self.aux = aux

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if self.verify and "html" in batch.column_names:
            html = batch.column("html").to_pylist()
            stored = text.to_pylist()
            for h, t in zip(html, stored):
                if extract_text(h) != t.encode("utf-8"):
                    raise ValueError("extracted text mismatch (html → text "
                                     "is not byte-identical)")
        # vectorized signal parse: 'ndvi:' token → float64 (NaN when absent)
        token = pc.extract_regex(text, r"ndvi:(?P<v>-?\d+\.\d{6}|nan)")
        vals = pc.struct_field(token, "v")
        value = pc.cast(
            pc.if_else(pc.equal(vals, pa.scalar("nan")), None, vals),
            pa.float64())

        ts = batch.column("warc_ts")
        days, dyear = timestamp_features(ts)
        return pa.table({
            "url": batch.column("url"),
            "warc_ts": ts,
            "value": value,
            "days": pa.array(days, pa.int32()),
            "dyear": pa.array(dyear, pa.float64()),
            # input-fragment lineage id (added by ingest when enabled):
            # 4 bytes/row through the shuffle, recorded per partition
            **({"frag": batch.column("frag")}
               if "frag" in batch.column_names else {}),
            **(aux_signals(text) if self.aux else {}),
        })


def aux_signals(text: pa.ChunkedArray | pa.Array) -> dict:
    """Secondary per-snapshot signals for CCDC_RIRLS outlier screening.

    The reference screens NDVI outliers with two auxiliary bands
    (green residual > 0.04·sf = cloud, SWIR residual < −0.04·sf = shadow;
    ``/root/reference/nrt/outliers.py:60-95``).  The webtext analogs:

    * ``aux_green``: text length (10-kB units) — bloats when a page is
      replaced by an interstitial / error page (the "cloud" analog);
    * ``aux_swir``: punctuation density — collapses when real prose is
      replaced by boilerplate (the "shadow" analog).

    Both are deterministic Arrow-kernel computations over the extracted
    text, so the distributed fit path and the shared-axis oracle see
    bit-identical matrices.
    """
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[.,!?;:]"),
                      pa.float64())
    return {
        "aux_green": pc.divide(n_chars, pa.scalar(1e4)),
        "aux_swir": pc.divide(n_punct,
                              pc.max_element_wise(n_chars, pa.scalar(1.0))),
    }


def timestamp_features(ts: pa.ChunkedArray | pa.Array):
    """Vectorized (days-since-epoch, decimal-year) from a timestamp column.

    Decimal year uses the reference formula
    ``year + (t − Jan1) / (Dec31 − Jan1)`` (see
    ``nrt_ray.kernels.regressors.decimal_years``), computed here with Arrow
    kernels + NumPy only.
    """
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
    days = us // 86_400_000_000
    dt64 = us.astype("datetime64[us]")
    years_arr = dt64.astype("datetime64[Y]")
    year_num = years_arr.astype(int) + 1970
    jan1 = years_arr.astype("datetime64[us]").astype(np.int64)
    # Dec 31 of the same year = Jan 1 of next year − 1 day
    jan1_next = (years_arr + 1).astype("datetime64[us]").astype(np.int64)
    dec31 = jan1_next - 86_400_000_000
    dyear = year_num + (us - jan1) / (dec31 - jan1)
    return days.astype(np.int32), dyear.astype(np.float64)
