"""Actor-pool sizing for stateful map_batches stages.

A stateful stage (compiled regexes, loaded model, codec handles) is a
callable CLASS on an actor pool. Pinning ``concurrency`` to a constant
is a scale bug in both directions: too low starves a big cluster (a
fixed pool of 2 leaves 30 of 32 cores idle), too high strands actors on
a laptop. ``autoscale_actors`` returns a (min, max) autoscaling range
sized to the cluster the pipeline is actually running on — Ray Data
launches actors up to max as demand and resources allow and reclaims
idle ones, so concurrent stages share the cores instead of deadlocking
over static reservations."""

from __future__ import annotations

from typing import Tuple


def autoscale_actors(min_actors: int = 1, max_cap: int = 0
                     ) -> Tuple[int, int]:
    """(min, max) actor-pool range: max = cluster CPU count (capped by
    ``max_cap`` when given). Evaluated at pipeline BUILD time, by which
    the driver has initialized Ray; falls back to 8 when it hasn't
    (standalone graph construction)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if (
        ray.is_initialized()
    ) else 8
    hi = max(min_actors, cpus if max_cap <= 0 else min(cpus, max_cap))
    return (min_actors, hi)
