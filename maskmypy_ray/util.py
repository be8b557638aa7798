"""Small Ray helpers."""

from __future__ import annotations


def auto_concurrency(cap: int = 64) -> tuple[int, int]:
    """Autoscaling actor-pool bounds (min 1, max = CPUs - 2 capped).

    A FIXED pool equal to the CPU count reserves every slot and starves
    the upstream read stage (deadlock on small ray.init sessions); an
    autoscaling (1, N) pool starts at 1 actor and grows only while CPUs
    are free.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return (1, max(1, min(cap, cpus - 2)))
