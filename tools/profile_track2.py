"""Device trace of the real per-frame pipeline (extract + track_frame_step).

All state passed as jit ARGUMENTS (closure constants let XLA fold the
track step away and fake ~12 ms numbers)."""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from multiagent_orb_slam2_tpu.config import (Capacities, OrbConfig,
                                             SlamConfig, Sensor,
                                             TrackingConfig)
from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
from multiagent_orb_slam2_tpu.io import synthetic
from multiagent_orb_slam2_tpu.ops import frame as frame_mod
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
L, R, _ = frames[-1]
img_l = jnp.asarray(L)
img_r = jnp.asarray(R)
state = sh.state
prev_feats = tr.last_feats
prev_mp = tr.last_frame_mp
q0, t0 = tr.last_q, tr.last_t
ref_kf = max(tr.ref_kf, 0)
N = 10


@jax.jit
def frame_loop(img_l, img_r, state, prev_feats, prev_mp, q0, t0):
    def body(i, carry):
        acc, q, t = carry
        f = frame_mod.extract_frame(img_l + acc * 0, cfg, right_img=img_r)
        out, _, dec, _aux = steps.track_frame_step(
            state, f, prev_feats, prev_mp, ref_kf, q, t,
            jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), False, True, cfg)
        return (acc + dec[1].astype(jnp.float32) * 1e-30, out.q, out.t)
    return jax.lax.fori_loop(0, N, body, (jnp.asarray(0.0), q0, t0))


args = (img_l, img_r, state, prev_feats, prev_mp, q0, t0)
out = frame_loop(*args)
_ = float(out[0])
t0_ = time.perf_counter()
out = frame_loop(*args)
_ = float(out[0])
print(f"per-frame: {(time.perf_counter() - t0_) * 1e2:.1f} ms", flush=True)

with jax.profiler.trace("/tmp/jaxtrace3"):
    out = frame_loop(*args)
    _ = float(out[0])

files = sorted(glob.glob("/tmp/jaxtrace3/**/*.trace.json.gz", recursive=True))
agg = defaultdict(float)
cnt = defaultdict(int)
with gzip.open(files[-1], "rt") as f:
    trj = json.load(f)
for ev in trj.get("traceEvents", []):
    if ev.get("ph") == "X" and "dur" in ev:
        agg[ev.get("name", "")] += ev["dur"]
        cnt[ev.get("name", "")] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1])
with open("/tmp/trace3_rows.txt", "w") as f:
    for name, us in rows:
        f.write(f"{us/1000:9.3f} ms  x{cnt[name]:5d}  {name}\n")
for name, us in rows[:35]:
    print(f"{us/1000:9.2f} ms  x{cnt[name]:5d}  {name[:95]}")
