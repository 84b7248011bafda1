"""Map-state checkpoint / resume.

The reference has none (System::SaveMap/LoadMap is an explicit TODO,
include/System.h:145-147 — SURVEY.md §5); here the entire map is a pytree of
arrays, so checkpointing is one compressed npz (+ the host slot counters).
A preempted host resumes by loading the state and continuing to track.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .state import MapState


def save_map(path: str, state: MapState, n_kf: int, n_mp: int,
             extra: dict = None):
    arrays = {f"ms_{k}": np.asarray(v) for k, v in state._asdict().items()}
    meta = dict(n_kf=n_kf, n_mp=n_mp)
    if extra:
        meta.update({k: v for k, v in extra.items()})
    np.savez_compressed(path, __meta__=np.asarray([list(meta.keys()),
                                                   [str(v) for v in
                                                    meta.values()]],
                                                  dtype=object),
                        **arrays)


def load_map(path: str):
    z = np.load(path, allow_pickle=True)
    fields = {k[3:]: jnp.asarray(z[k]) for k in z.files if k.startswith("ms_")}
    state = MapState(**fields)
    keys, vals = z["__meta__"]
    meta = {k: int(v) if str(v).lstrip("-").isdigit() else str(v)
            for k, v in zip(keys, vals)}
    return state, meta
