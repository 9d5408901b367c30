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

# Ray-level parallelism replaces BLAS threads: every kernel runs inside a
# Ray task/actor that is already sized in CPUs, so nested BLAS thread
# pools only oversubscribe (the reference documents the same guard for
# its numba workers, docs/gallery/plot_parallel_computing.py:30-34).
# Set before numpy's first threaded call in each worker process — workers
# import this package during task deserialization, so setdefault here
# covers driver and workers alike without clobbering explicit settings.
import os as _os

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "BLIS_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")
