"""Generate a KITTI-length synthetic stereo sequence with a loop revisit.

The reference's accuracy record is 5-trial ATE/RPE tables on TUM/KITTI/EuRoC
(Analysis/*/stats_*.txt); those blobs are unavailable here, so the at-scale
protocol runs on ray-cast box-corridor sequences with exact ground truth
instead (io/synthetic). The trajectory walks down the corridor, makes a
180-degree turn, walks back, and turns again at the start — the final
stretch revisits the opening viewpoints, so intra-map loop closure (and,
in split mode, cross-agent fusion at the split junction) must fire.

Writes left_%05d.npy / right_%05d.npy (uint8), times.txt, gt_tum.txt and
settings.json into the output directory.

  python analysis/make_synth_seq.py -o /tmp/synth0 --seed 0 --frames 660
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def loop_trajectory(n_frames: int, z_lo: float, z_hi: float, seed: int = 0):
    """Camera-to-world poses: forward along +z, 180-deg turn, return, turn
    back. Returns (q_wc [n,4], t_wc [n,3])."""
    import jax.numpy as jnp
    from multiagent_orb_slam2_tpu.geometry import se3

    rng = np.random.default_rng(seed)
    # clamp so short sequences (< ~100 frames) still produce positive legs
    n_turn = min(max(n_frames // 14, 24), max(n_frames // 4, 1))
    n_leg = max((n_frames - 2 * n_turn) // 2, 1)
    yaw = []
    zs = []
    # leg out
    zs += list(np.linspace(z_lo, z_hi, n_leg))
    yaw += [0.0] * n_leg
    # turn (in place, slight drift forward)
    yaw += list(np.linspace(0.0, np.pi, n_turn))
    zs += list(np.full(n_turn, z_hi))
    # leg back
    zs += list(np.linspace(z_hi, z_lo, n_leg))
    yaw += [np.pi] * n_leg
    # turn back at start
    rest = n_frames - len(zs)
    yaw += list(np.linspace(np.pi, 2 * np.pi, rest))
    zs += list(np.full(rest, z_lo))

    qs, ts = [], []
    for i in range(n_frames):
        w = np.array([0.0, yaw[i], 0.0]) + rng.normal(0, 0.002, 3)
        q = np.asarray(se3.so3_exp_quat(jnp.asarray(w)))
        t = np.array([0.35 * np.sin(i * 0.05), 0.15 * np.sin(i * 0.03),
                      zs[i]]) + rng.normal(0, 0.004, 3)
        qs.append(q)
        ts.append(t)
    return np.stack(qs), np.stack(ts)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--frames", type=int, default=660)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--fps", type=float, default=10.0)
    args = ap.parse_args(argv)

    from multiagent_orb_slam2_tpu.geometry.camera import Intrinsics
    from multiagent_orb_slam2_tpu.io.synthetic import BoxScene

    cam = Intrinsics(fx=260.0, fy=260.0, cx=args.width / 2.0,
                     cy=args.height / 2.0, bf=260.0 * 0.12,
                     width=args.width, height=args.height)
    scene = BoxScene(seed=args.seed, z_far=30.0)
    q_wc, t_wc = loop_trajectory(args.frames, 1.0, 24.0, seed=args.seed)

    os.makedirs(args.out, exist_ok=True)
    gt_rows = []
    for i in range(args.frames):
        L, R, _ = scene.render_stereo(cam, q_wc[i], t_wc[i])
        np.save(os.path.join(args.out, f"left_{i:05d}.npy"),
                np.clip(L, 0, 255).astype(np.uint8))
        np.save(os.path.join(args.out, f"right_{i:05d}.npy"),
                np.clip(R, 0, 255).astype(np.uint8))
        ts = i / args.fps
        q = q_wc[i]
        gt_rows.append((ts, *t_wc[i], q[1], q[2], q[3], q[0]))
        if i % 100 == 0:
            print(f"rendered {i}/{args.frames}", flush=True)

    np.savetxt(os.path.join(args.out, "times.txt"),
               np.arange(args.frames) / args.fps, fmt="%.6f")
    with open(os.path.join(args.out, "gt_tum.txt"), "w") as f:
        for row in gt_rows:
            f.write(" ".join(f"{v:.9f}" for v in row) + "\n")
    settings = {
        "Camera.fx": cam.fx, "Camera.fy": cam.fy, "Camera.cx": cam.cx,
        "Camera.cy": cam.cy, "Camera.bf": cam.bf,
        "Camera.width": cam.width, "Camera.height": cam.height,
        "Camera.fps": args.fps, "ThDepth": 35.0,
        "ORBextractor.nFeatures": 600, "ORBextractor.scaleFactor": 1.2,
        "ORBextractor.nLevels": 8, "ORBextractor.iniThFAST": 20,
        "ORBextractor.minThFAST": 7,
    }
    with open(os.path.join(args.out, "settings.json"), "w") as f:
        json.dump(settings, f, indent=1)
    print(f"wrote {args.frames}-frame sequence to {args.out}")


if __name__ == "__main__":
    main()
