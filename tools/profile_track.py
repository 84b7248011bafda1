"""Phase breakdown of the per-frame tracking cost at reference budgets.

In-jit 10x loops: extract-only, extract pieces (pyramid+FAST / descriptors /
stereo), and track_frame_step-only, at KITTI scale (1241x376, 2000 feats).
"""
import sys
import time
import functools

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from multiagent_orb_slam2_tpu.config import (Capacities, OrbConfig,
                                             SlamConfig, Sensor,
                                             TrackingConfig)
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.io import synthetic
from multiagent_orb_slam2_tpu.ops import frame as frame_mod
from multiagent_orb_slam2_tpu.ops import orb
from multiagent_orb_slam2_tpu.runtime import steps
from multiagent_orb_slam2_tpu.runtime.tracker import SharedMap, Tracker

cam = Intrinsics(fx=718.9, fy=718.9, cx=620.5, cy=188.0, bf=386.1,
                 width=1241, height=376)
cfg = SlamConfig(
    camera=cam, sensor=Sensor.STEREO,
    orb=OrbConfig(n_features=2000),
    tracking=TrackingConfig(max_frames_between_kf=10, th_depth=35.0),
    caps=Capacities(max_keyframes=64, max_points=32768,
                    max_features=2048, local_points=8192))
scene = synthetic.BoxScene(seed=0, z_far=60.0)
qs, ts = synthetic.corridor_trajectory(8, step=0.25)
frames = [scene.render_stereo(cam, qs[i], ts[i]) for i in range(len(qs))]

sh = SharedMap(cfg)
tr = Tracker(cfg, sh)
for i, (L, R, _) in enumerate(frames):
    tr.track_stereo(L, R, frame_id=i)
print("map built:", sh.n_kf, "kfs", sh.n_mp, "points", flush=True)

L, R, _ = frames[-1]
img_l = jnp.asarray(L)
img_r = jnp.asarray(R)
feats = frame_mod.extract_frame(img_l, cfg, right_img=img_r)
state = sh.state
prev_feats = tr.last_feats
prev_mp = tr.last_frame_mp
q_pred, t_pred = tr.last_q, tr.last_t
ref_kf = max(tr.ref_kf, 0)
N = 10


def clock(label, fn):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    c = time.perf_counter() - t0
    ts_ = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        # force a real sync through the tunnel
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf).reshape(-1)[0]
        ts_.append(time.perf_counter() - t0)
    ms = min(ts_) * 1e3 / N
    print(f"{label}: compile {c:5.1f}s  per-frame {ms:6.2f} ms", flush=True)
    return ms


@jax.jit
def loop_keypoints(img):
    def body(i, acc):
        kp = orb.extract(img + acc * 0, cfg.orb)
        return acc + kp.xy[0, 0] * 1e-30
    return jax.lax.fori_loop(0, N, body, jnp.asarray(0.0))


@jax.jit
def loop_extract_mono(img):
    def body(i, acc):
        f = frame_mod.extract_frame(img + acc * 0, cfg)
        return acc + f.xy[0, 0] * 1e-30
    return jax.lax.fori_loop(0, N, body, jnp.asarray(0.0))


@jax.jit
def loop_extract_stereo(img, img2):
    def body(i, acc):
        f = frame_mod.extract_frame(img + acc * 0, cfg, right_img=img2)
        return acc + f.xy[0, 0] * 1e-30
    return jax.lax.fori_loop(0, N, body, jnp.asarray(0.0))


@jax.jit
def loop_track(q0, t0):
    def body(i, carry):
        acc, q, t = carry
        out, _, dec, _aux = steps.track_frame_step(
            state, feats, prev_feats, prev_mp, ref_kf, q, t,
            jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), False, True, cfg)
        return (acc + dec[1].astype(jnp.float32) * 1e-30, out.q, out.t)
    return jax.lax.fori_loop(0, N, body, (jnp.asarray(0.0), q0, t0))


try:
    kp_ms = clock("keypoints (pyr+FAST+topk+angle)", lambda: loop_keypoints(img_l))
except Exception as e:
    print("keypoints probe:", str(e)[:120], flush=True)
mono_ms = clock("extract mono  (+rBRIEF+undist) ", lambda: loop_extract_mono(img_l))
st_ms = clock("extract stereo (+match+SAD)     ", lambda: loop_extract_stereo(img_l, img_r))
trk_ms = clock("track_frame_step                ", lambda: loop_track(q_pred, t_pred))
