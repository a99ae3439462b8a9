"""Session-derived parallelism defaults (VERDICT r1 #5: no hard-coded caps).

All stages size their actor pools / partition counts from the live Ray
session so the same code scales from the 4-cpu test fixture to a 4N-core
cluster. Callers may always override explicitly.
"""

from __future__ import annotations


def session_cpus(default: int = 8) -> int:
    """Total CPUs in the connected Ray session (``default`` when Ray is not
    initialised — library code never calls ray.init itself)."""
    try:
        import ray
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def pool_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool bounds for compute stages: up to cpus-2 actors
    (a full-size pool starves the upstream read — measured in round 1)."""
    return (1, max(4, session_cpus() - 2))


def shuffle_partitions() -> int:
    """Hash-join / shuffle partition count: ~1× total cores, floor 16."""
    return max(16, session_cpus())


def coalesce_blocks() -> int:
    """Block count when coalescing a tiny derived stream (e.g. the event
    stream, which inherits one block per upstream task): ~cpus/2, floor 8."""
    return max(8, session_cpus() // 2)
