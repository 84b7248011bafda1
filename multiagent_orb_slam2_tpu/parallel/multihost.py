"""Multi-host execution entry points.

The reference has no network layer at all (its 'distributed' system is
threads in one process, SURVEY.md §2g); scaling past one host here is
standard jax.distributed: every host runs the same driver, agents are
assigned to hosts round-robin, the global mesh spans all hosts' devices, and
the distributed BA / fusion collectives ride ICI within a slice and DCN
across slices automatically.

This module cannot be exercised in the single-host CI environment; the
sharding semantics it relies on are validated on the virtual multi-device
mesh (tests/test_dist_ba.py) and via __graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import jax


def init_distributed(coordinator_address: str = None, num_processes: int = None,
                     process_id: int = None):
    """Initialize multi-host JAX (idempotent). With no arguments, relies on
    the cluster environment (TPU pod metadata) for auto-configuration."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_names=("agents", "points"), agents_dim: int = None):
    """Mesh over every device of every host. agents_dim defaults to the
    process count so each host's agents stay host-local (frame IO stays
    local; only BA collectives cross DCN)."""
    import numpy as np
    devs = np.asarray(jax.devices())
    a = agents_dim or max(jax.process_count(), 1)
    while len(devs) % a:
        a -= 1
    return jax.sharding.Mesh(devs.reshape(a, -1), axis_names)


def agents_for_this_host(n_agents: int):
    """Round-robin agent assignment (each host tracks its own agents; the
    shared map state is replicated by construction of the jitted steps)."""
    pid, n = jax.process_index(), max(jax.process_count(), 1)
    return [a for a in range(n_agents) if a % n == pid]
