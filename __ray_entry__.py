"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship monitor+rollup pipeline over the sf0.001
driver tables; ``queries()``/``oracle_sql()`` expose the full operator
catalog (see nrt_ray/pipelines/catalog.py) for the DuckDB correctness gate.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: ingest the events
    stream as per-key time series, fit + monitor, roll up into 1d/1w
    tiers with gap-fill, write partitioned outputs + manifest, and return
    the rolled-up 1d tier."""
    import ray.data

    from nrt_ray.pipelines import monitor_pipeline as mp
    from nrt_ray.stages import rollup

    sf_dir = "/root/testdata/sf0.001"
    out_dir = tempfile.mkdtemp(prefix="nrt_ray_entry_")
    flat = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["user_id", "ts", "value"]) \
        .map_batches(mp.events_to_flat, batch_format="pyarrow")
    mp.run_pipeline(
        None, out_dir, flat_dataset=flat, strategy="IQR",
        monitor_params={"trend": False, "harmonic_order": 0},
        fit_method="OLS", monitor_start="2024-01-22", num_partitions=8,
        tiers=(rollup.TierSpec("1d"), rollup.TierSpec("1w")))
    return mp.read_output_table(out_dir, "rollup_1d")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from nrt_ray.pipelines import catalog
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from nrt_ray.pipelines import catalog
    return catalog.oracle_sql()
