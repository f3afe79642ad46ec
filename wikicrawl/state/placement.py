"""Actor placement policy for the chatty driver-side state plane.

The frontier and seen-set shards exchange many small Arrow tables with
the DRIVER every wave (push/pop/insert batches). On a multi-node cluster
Ray's default placement can land them on any node, turning every one of
those exchanges into a cross-node plasma copy + gRPC hop — measured on a
two-raylet cluster: drv_fpush 0.1 s -> 13 s, drv_fpop 1 s -> 11 s for
the same 30k-entity crawl (scripts/two_node_bench.py). SOFT affinity to
the driver's node keeps the wave-control plane node-local while the
bulk fetch/extract tasks SPREAD across the cluster.

Trade-off (documented): state shards hold the seen-set filters in RAM;
at 10^10 URLs across few shards this concentrates memory on the head
node. soft=True lets Ray overflow shards elsewhere when the head lacks
resources, and the shard state is spillable (state/seen.py), so the
affinity is a latency preference, not a correctness constraint.
"""

from __future__ import annotations

import logging
import warnings

_warned = False


def driver_affinity_options() -> dict:
    """kwargs for ``Actor.options(...)``: soft affinity to this node.

    Falls back to default scheduling ONLY on the two known-benign causes
    (ray not importable / not initialized, scheduling-API drift), and then
    warns ONCE — a silent fallback would reintroduce the measured 100x
    drv_fpush/drv_fpop cross-node regression with no signal (ADVICE r3)."""
    global _warned
    try:
        import ray
        from ray.util.scheduling_strategies import (
            NodeAffinitySchedulingStrategy,
        )

        node_id = ray.get_runtime_context().get_node_id()
        return {"scheduling_strategy": NodeAffinitySchedulingStrategy(
            node_id=node_id, soft=True)}
    except (ImportError, RuntimeError, AttributeError) as e:
        if not _warned:
            _warned = True
            msg = (f"driver_affinity_options: falling back to default "
                   f"placement ({type(e).__name__}: {e}) — state-plane "
                   f"actors may land off the driver node")
            logging.getLogger(__name__).warning(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        return {}
