"""Execution-context helpers: DataContext tuning + pool sizing.

An actor pool that reserves every cluster CPU starves the stages up- and
downstream of it (the read, the groupby exchange, the write) and the
pipeline serializes — on a 4-CPU test session a ``concurrency=4`` pool
deadlocks the streaming executor outright.  ``default_pool_size`` sizes
pools to half the cluster (bounded), leaving headroom for the rest of
the pipeline.
"""

from __future__ import annotations


def default_pool_size(cap: int = 16, frac: float = 0.5) -> int:
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if \
            ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(1, min(cap, int(cpus * frac)))


def quiet_data_context() -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
