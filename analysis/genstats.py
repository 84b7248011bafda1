"""Trajectory-accuracy statistics (the Analysis/ suite equivalent).

Replaces the reference's evo-based genstats_*.py scripts
(Analysis/EuRoC/genstats_two_seq.py etc., SURVEY.md §4): associate estimated
trajectories with ground truth by timestamp, SE3(+scale) Umeyama alignment,
ATE / RPE translation / RPE rotation means, emitted as a table (and
optionally the reference's LaTeX row format).

  python analysis/genstats.py --gt gt.txt --est run/SLAM0.txt run/SLAM1.txt
"""
from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from multiagent_orb_slam2_tpu.io import trajectory as T  # noqa: E402


def tum_to_mats(rows):
    """TUM rows -> [N, 4, 4] camera-to-world matrices + timestamps."""
    import jax.numpy as jnp
    from multiagent_orb_slam2_tpu.geometry import se3
    ts = rows[:, 0]
    t = rows[:, 1:4]
    qxyzw = rows[:, 4:8]
    q = np.stack([qxyzw[:, 3], qxyzw[:, 0], qxyzw[:, 1], qxyzw[:, 2]], -1)
    mats = np.asarray(se3.to_matrix44(jnp.asarray(q), jnp.asarray(t)))
    return ts, mats


def evaluate(gt_path, est_path, with_scale=True, max_dt=0.02):
    gt = T.read_tum(gt_path)
    est = T.read_tum(est_path)
    ia, ib = T.associate(est[:, 0], gt[:, 0], max_dt)
    if len(ia) < 3:
        return None
    est_ts, est_m = tum_to_mats(est[ia])
    gt_ts, gt_m = tum_to_mats(gt[ib])
    ate = T.ate(est_m[:, :3, 3], gt_m[:, :3, 3], with_scale)
    # align before RPE as evo does
    s, R, t = T.umeyama_alignment(est_m[:, :3, 3], gt_m[:, :3, 3], with_scale)
    A = np.eye(4)
    A[:3, :3] = s * R
    A[:3, 3] = t
    est_al = A[None] @ est_m
    rpe = T.rpe(est_al, gt_m, delta=1)
    return dict(n=len(ia), ate=ate["mean"], ate_rmse=ate["rmse"],
                rpe_t=rpe["trans_mean"], rpe_r=rpe["rot_mean_deg"],
                scale=ate["scale"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt", required=True)
    ap.add_argument("--est", nargs="+", required=True)
    ap.add_argument("--no-scale", action="store_true")
    ap.add_argument("--latex", action="store_true")
    args = ap.parse_args(argv)

    print(f"{'trajectory':<40} {'n':>5} {'ATE':>8} {'RPE-t':>8} {'RPE-r':>8}")
    for est in args.est:
        r = evaluate(args.gt, est, with_scale=not args.no_scale)
        if r is None:
            print(f"{est:<40}  (no timestamp overlap)")
            continue
        if args.latex:
            print(f"{os.path.basename(est)} & {r['ate']:.2f} & "
                  f"{r['rpe_t']:.2f} & {r['rpe_r']:.2f} \\\\")
        else:
            print(f"{est:<40} {r['n']:>5} {r['ate']:>8.3f} "
                  f"{r['rpe_t']:>8.3f} {r['rpe_r']:>8.2f}")


if __name__ == "__main__":
    main()
