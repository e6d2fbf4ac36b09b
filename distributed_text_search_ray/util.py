"""Small shared helpers."""

from __future__ import annotations


def resolve_concurrency(concurrency=None):
    """Default actor-pool sizing: autoscale between 1 and the cluster CPU
    count so a single stage never reserves every CPU (which would starve the
    read/write stages and serialize the pipeline)."""
    if concurrency is not None:
        return concurrency
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    return (1, max(2, n))
