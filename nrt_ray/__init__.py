"""nrt_ray — a Ray-Data-native time-series rollup + change-monitoring engine.

Re-implements the query/data-processing capabilities of the reference
near-real-time monitoring engine (ec-jrc/nrt, see /root/reference) on top of
``ray.data.Dataset`` pipelines over zero-copy Arrow batches, and adds the
rollup / downsample / retention / compression / lineage layer required for
operating on Common-Crawl-scale Parquet webtext tables
``(url, warc_ts, html, text, lang)``.

Layout:
    kernels/    pure NumPy float64 math (fits, monitors, efp/cusum helpers)
    sources/    synthetic webtext generator + deterministic html->text extractor
    stages/     Ray Data batch transforms (extract, assemble, fit/monitor,
                rollup, compression)
    pipelines/  end-to-end pipelines and the driver-facing query catalog
    state/      checkpoint manifest + resume logic
"""

__version__ = "0.1.0"
