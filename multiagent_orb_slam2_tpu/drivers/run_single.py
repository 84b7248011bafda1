"""Single-agent driver: the mono_*/stereo_*/rgbd_* examples in one CLI.

Covers the reference's six single-agent drivers (Examples/Monocular/mono_tum
.cc etc., SURVEY.md §2f): load a dataset, run the System frame by frame,
print timing, save TUM/KITTI trajectories.

  python -m multiagent_orb_slam2_tpu.drivers.run_single \
      -t stereo_kitti -d /data/kitti/sequences/00 -s settings.yaml \
      -v voc.npz -o out_dir [--max-frames N]
"""
from __future__ import annotations

import argparse
import os

from ..io import datasets
from ..runtime.system import System
from . import common


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-t", "--type", required=True,
                    choices=sorted(datasets.LOADERS))
    ap.add_argument("-d", "--data", required=True)
    ap.add_argument("-s", "--settings", required=True)
    ap.add_argument("-v", "--vocab", default="")
    ap.add_argument("-o", "--out", default=".")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--no-loop-closing", action="store_true")
    args = ap.parse_args(argv)

    sensor = common.SENSOR_OF[args.type.split("_")[0]]
    cfg = common.load_settings(args.settings, sensor)
    seq = datasets.LOADERS[args.type](args.data)
    cfg = cfg.replace(depth_map_factor=1.0 / seq.depth_factor
                      if args.type == "rgbd_tum" else cfg.depth_map_factor)
    vocab = common.get_vocabulary(args.vocab, [seq], cfg)
    rect = common.get_rectifier(args.settings)
    sys_ = System(cfg, vocab,
                  enable_loop_closing=not args.no_loop_closing)

    from ..utils import diag
    n = len(seq) if not args.max_frames else min(args.max_frames, len(seq))
    timer = common.FrameTimer()
    for i in range(n):
        left, right, depth = seq.load(i)
        with timer:
            if right is not None:
                if rect is not None:
                    left, right = rect(left, right)
                sys_.track_stereo(left, right, frame_id=i)
            elif depth is not None:
                sys_.track_rgbd(left, depth, frame_id=i)
            else:
                sys_.track_mono(left, frame_id=i)
        diag.log_frame(0, i, sys_.tracker, sys_.shared)
    sys_.shutdown()
    timer.report()

    os.makedirs(args.out, exist_ok=True)
    ts = seq.timestamps()[:n]
    sys_.save_trajectory_tum(os.path.join(args.out, "CameraTrajectory.txt"),
                             ts)
    sys_.save_keyframe_trajectory_tum(
        os.path.join(args.out, "KeyFrameTrajectory.txt"), seq.timestamps())
    if "kitti" in args.type:
        sys_.save_trajectory_kitti(
            os.path.join(args.out, "CameraTrajectoryKITTI.txt"))
    sys_.save_map(os.path.join(args.out, "map.npz"))
    print(f"saved trajectories + map to {args.out}")


if __name__ == "__main__":
    main()
