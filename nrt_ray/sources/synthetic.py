"""Deterministic synthetic webtext table generator.

Produces the exact input shape the engine is built for::

    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

Each ``url`` is a time series of crawl snapshots: the page text embeds a
scalar signal token (``ndvi:<float>``) following the same generative
structure as the reference's simulated NDVI series
(``/root/reference/docs/gallery/plot_simulation_data.py:25-63``): seasonal
harmonic + white noise + optional structural break + occasional extreme
outliers + missing snapshots.  Ground-truth parameters go to a companion
``params`` table for precision/recall assertions.

Everything is seeded and vectorized; a fixed (seed, n_urls, date range)
always produces byte-identical Parquet.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_VOCAB = np.array(
    "the quick brown fox jumps over lazy dog forest satellite crawl snapshot "
    "monitor seasonal signal archive index page update news report data "
    "web content server cache robots language text html body".split())

_LANGS = np.array(["en", "de", "fr", "ro"])

HTML_PREFIX = (b"<html><head><title>%s</title><meta charset=\"utf-8\"/></head>"
               b"<body><nav>home | about | contact</nav><p>")
HTML_SUFFIX = b"</p><footer>crawl archive</footer></body></html>"


def make_params(n_urls: int, seed: int = 42) -> pd.DataFrame:
    """Per-url ground-truth signal parameters (deterministic)."""
    rng = np.random.default_rng(seed)
    domain = rng.zipf(1.4, n_urls) % 97  # hot-domain skew
    urls = np.array([f"https://d{d}.example.com/page/{i}"
                     for i, d in enumerate(domain)])
    amplitude = rng.uniform(0.1, 0.35, n_urls)
    sigma_noise = rng.uniform(0.02, 0.12, n_urls)
    phase = rng.uniform(0, 2 * np.pi, n_urls)
    has_break = rng.random(n_urls) < 0.3
    break_frac = rng.uniform(0.6, 0.95, n_urls)  # position in the date range
    break_magnitude = rng.uniform(0.2, 0.5, n_urls) * has_break
    # ~1% of urls are crawled daily instead of weekly (per-key skew)
    hot = rng.random(n_urls) < 0.01
    return pd.DataFrame({
        "url": urls, "amplitude": amplitude, "sigma_noise": sigma_noise,
        "phase": phase, "has_break": has_break, "break_frac": break_frac,
        "break_magnitude": break_magnitude, "hot": hot,
        "lang": _LANGS[rng.integers(0, len(_LANGS), n_urls)],
    })


def generate_webtext(out_dir: str, n_urls: int = 512, seed: int = 42,
                     start: str = "2018-01-01", end: str = "2022-06-15",
                     missing_prob: float = 0.1, outlier_prob: float = 0.02,
                     shard_rows: int = 200_000) -> dict:
    """Write the webtext table (+ ``params.parquet``) under ``out_dir``.

    Tables over ``shard_rows`` rows are written as a sharded directory
    ``webtext/part-NNNNN.parquet`` (a single parquet file is read by ONE
    Ray task — sharding is what gives the read stage its parallelism);
    smaller tables stay a single ``webtext.parquet`` file.

    Returns a summary dict (row counts, paths).
    """
    os.makedirs(out_dir, exist_ok=True)
    params = make_params(n_urls, seed)
    rng = np.random.default_rng(seed + 1)

    weekly = np.arange(np.datetime64(start), np.datetime64(end),
                       7, dtype="datetime64[D]")
    daily = np.arange(np.datetime64(start), np.datetime64(end),
                      1, dtype="datetime64[D]")

    frames = []
    for hot, dates in ((False, weekly), (True, daily)):
        sel = params.index[params["hot"] == hot].to_numpy()
        if sel.size == 0:
            continue
        n, m = len(dates), len(sel)
        # per-url jitter of the acquisition hour keeps timestamps unique
        hours = rng.integers(0, 24, m)
        ts = (dates.astype("datetime64[us]")[:, None]
              + (hours * 3_600_000_000).astype("timedelta64[us]")[None, :])
        dyear = (dates - dates.astype("datetime64[Y]")).astype(int) / 365.2425 \
            + dates.astype("datetime64[Y]").astype(int) + 1970
        amp = params["amplitude"].to_numpy()[sel]
        phase = params["phase"].to_numpy()[sel]
        sig = params["sigma_noise"].to_numpy()[sel]
        values = (0.5 + amp * np.sin(2 * np.pi * dyear[:, None] + phase)
                  + rng.normal(0, 1, (n, m)) * sig)
        # structural break: level drop from break_frac onward
        frac = np.linspace(0, 1, n)
        brk = frac[:, None] >= params["break_frac"].to_numpy()[sel]
        values -= brk * params["break_magnitude"].to_numpy()[sel]
        # extreme outliers (cloud analogs)
        out_mask = rng.random((n, m)) < outlier_prob
        values += out_mask * rng.uniform(0.3, 0.8, (n, m)) \
            * rng.choice([-1.0, 1.0], (n, m))
        # missing snapshots: the row simply doesn't exist in the crawl
        present = rng.random((n, m)) >= missing_prob

        urls = params["url"].to_numpy()[sel]
        langs = params["lang"].to_numpy()[sel]
        keep = present.ravel(order="F")  # url-major
        frames.append(pd.DataFrame({
            "url": np.repeat(urls, n)[keep],
            "warc_ts": ts.ravel(order="F")[keep],
            "value": values.ravel(order="F")[keep],
            "lang": np.repeat(langs, n)[keep],
        }))
    df = pd.concat(frames, ignore_index=True)
    # global shuffle so the file is not conveniently url-ordered (a crawl
    # archive is time/fetch ordered, not key ordered)
    order = np.random.default_rng(seed + 2).permutation(len(df))
    df = df.iloc[order].reset_index(drop=True)

    def _render_table(sub: pd.DataFrame) -> pa.Table:
        text, html = render_pages(sub["url"].to_numpy(),
                                  sub["value"].to_numpy(), seed)
        return pa.table({
            "url": pa.array(sub["url"], pa.string()),
            "warc_ts": pa.array(sub["warc_ts"]).cast(pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(sub["lang"], pa.string()),
        })

    if len(df) > shard_rows:
        webtext_path = os.path.join(out_dir, "webtext")
        os.makedirs(webtext_path, exist_ok=True)
        for i, lo in enumerate(range(0, len(df), shard_rows)):
            sub = df.iloc[lo:lo + shard_rows]
            pq.write_table(_render_table(sub),
                           os.path.join(webtext_path,
                                        f"part-{i:05d}.parquet"),
                           row_group_size=shard_rows // 4 or 1)
    else:
        webtext_path = os.path.join(out_dir, "webtext.parquet")
        pq.write_table(_render_table(df), webtext_path,
                       row_group_size=shard_rows // 4 or 1)
    params_path = os.path.join(out_dir, "params.parquet")
    pq.write_table(pa.Table.from_pandas(params, preserve_index=False),
                   params_path)
    return {"rows": len(df), "n_urls": n_urls, "webtext": webtext_path,
            "params": params_path}


def render_pages(urls: np.ndarray, values: np.ndarray, seed: int = 42):
    """Render deterministic page text + html for each (url, value) row.

    The text is a few vocabulary words (seeded per row) with the signal
    token ``ndvi:<%.6f>`` embedded; html wraps the text in the fixed
    template that :func:`nrt_ray.sources.extract.extract_text` inverts.
    """
    n = len(urls)
    rng = np.random.default_rng(seed + 3)
    words = _VOCAB[rng.integers(0, len(_VOCAB), (n, 6))]
    value_tok = np.where(
        np.isfinite(values),
        np.char.add("ndvi:", np.char.mod("%.6f", np.nan_to_num(values))),
        "ndvi:nan")
    text = np.array([" ".join(w[:3]) + " " + v + " " + " ".join(w[3:])
                     for w, v in zip(words, value_tok)])
    html = [(HTML_PREFIX % u.encode()) + t.encode() + HTML_SUFFIX
            for u, t in zip(urls, text)]
    return text, html
