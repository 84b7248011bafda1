"""Multi-host execution entry points.

The reference has no network layer at all (its 'distributed' system is
threads in one process, SURVEY.md §2g); scaling past one host here is
standard jax.distributed: every host runs the same driver, agents are
assigned to hosts round-robin, the global mesh spans all hosts' devices, and
the distributed BA / fusion collectives ride ICI within a slice and DCN
across slices automatically.

Exercised for real by tests/test_multihost.py: two OS processes form one
global mesh over their virtual CPU devices and run the point-sharded
distributed BA with psum collectives crossing the process boundary
(localhost stands in for DCN). Ownership model for the shared map across
processes: the SharedMap arrays are replicated process-local copies whose
updates all flow through the jitted steps — in multi-host operation every
process executes the SAME jitted update on identically-sharded global
arrays (as the test does for BA), so replicated leaves stay bit-identical
by SPMD determinism; host-side bookkeeping (slot allocation, uid tables)
is per-process and synchronized at fusion boundaries by the server, which
runs the fusion phases as global collectives too.
"""
from __future__ import annotations

import jax


def init_distributed(coordinator_address: str = None, num_processes: int = None,
                     process_id: int = None):
    """Initialize multi-host JAX (idempotent). With no arguments, relies on
    the cluster environment (TPU pod metadata) for auto-configuration.

    Must run before anything touches the XLA backend, so the
    already-initialized check is a try/except rather than a
    jax.process_count() probe (which would itself initialize the backend).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" not in str(e):
            raise


def global_mesh(axis_names=("agents", "points"), agents_dim: int = None):
    """Mesh over every device of every host. agents_dim defaults to the
    process count so each host's agents stay host-local (frame IO stays
    local; only BA collectives cross DCN)."""
    import numpy as np
    devs = np.asarray(jax.devices())
    if len(axis_names) == 1:
        return jax.sharding.Mesh(devs, axis_names)
    a = agents_dim or max(jax.process_count(), 1)
    while len(devs) % a:
        a -= 1
    return jax.sharding.Mesh(devs.reshape(a, -1), axis_names)


def agents_for_this_host(n_agents: int):
    """Round-robin agent assignment (each host tracks its own agents; the
    shared map state is replicated by construction of the jitted steps)."""
    pid, n = jax.process_index(), max(jax.process_count(), 1)
    return [a for a in range(n_agents) if a % n == pid]
