"""Smoke tests for the offline visualizer."""
import os

import numpy as np
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.config import SlamConfig, Capacities, OrbConfig
from multiagent_orb_slam2_tpu.mapstate import state as ms
from multiagent_orb_slam2_tpu.ops.frame import FrameFeatures
from multiagent_orb_slam2_tpu import viz

CFG = SlamConfig(orb=OrbConfig(n_features=64, n_levels=2),
                 caps=Capacities(max_keyframes=8, max_points=256,
                                 max_features=64, local_points=128))


def test_plot_map_and_frame(tmp_path):
    rng = np.random.default_rng(0)
    st = ms.empty_map_state(CFG)
    st = st._replace(
        kf_valid=st.kf_valid.at[:3].set(True),
        kf_agent=st.kf_agent.at[:3].set(jnp.asarray([0, 0, 1])),
        kf_t=st.kf_t.at[:3].set(jnp.asarray(rng.normal(size=(3, 3)))),
        mp_valid=st.mp_valid.at[:100].set(True),
        mp_pos=st.mp_pos.at[:100].set(jnp.asarray(rng.normal(size=(100, 3)))),
        mp_agent=st.mp_agent.at[:100].set(0),
        covis=st.covis.at[0, 1].set(30).at[1, 0].set(30))
    p = str(tmp_path / "map.png")
    viz.plot_map(st, p)
    assert os.path.getsize(p) > 5000

    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    F = 64
    feats = FrameFeatures(
        xy=jnp.asarray(rng.uniform(0, 150, (F, 2)), jnp.float32),
        response=jnp.zeros(F), level=jnp.zeros(F, jnp.int32),
        angle=jnp.zeros(F), desc=jnp.zeros((F, 8), jnp.uint32),
        valid=jnp.ones(F, bool), u_right=jnp.full(F, -1.0),
        depth=jnp.full(F, -1.0))
    fm = jnp.full((F,), -1, jnp.int32).at[:20].set(5)
    p2 = str(tmp_path / "frame.png")
    viz.draw_frame(img, feats, fm, p2)
    assert os.path.getsize(p2) > 5000

    p3 = str(tmp_path / "traj.png")
    viz.plot_trajectories(p3, {"est": rng.normal(size=(50, 3))},
                          gt=rng.normal(size=(50, 3)))
    assert os.path.getsize(p3) > 5000
