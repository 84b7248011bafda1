"""Multi-agent split-sequence driver (the fork's primary experiment).

Covers Examples/MultiAgent/generic_split_seq.cc: one dataset is split
contiguously into N sub-sequences, each fed to its own agent under a central
MultiAgentServer; agents start on separate maps and fuse when their maps
overlap. Outputs per-agent trajectories SLAM0..SLAMn and a stats.csv with
the fusion-phase timing schema (generic_split_seq.cc:140-144, :382-393).

  python -m multiagent_orb_slam2_tpu.drivers.generic_split_seq \
      -t stereo_kitti -n 2 -d /data/kitti/sequences/00 -s settings.yaml \
      -v voc.npz -o out_dir
"""
from __future__ import annotations

import argparse
import os

from ..io import datasets
from ..server import MultiAgentServer
from . import common


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-t", "--type", required=True,
                    choices=sorted(datasets.LOADERS))
    ap.add_argument("-n", "--agents", type=int, default=2)
    ap.add_argument("-d", "--data", required=True)
    ap.add_argument("-s", "--settings", required=True)
    ap.add_argument("-v", "--vocab", default="")
    ap.add_argument("-o", "--out", default=".")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args(argv)

    sensor = common.SENSOR_OF[args.type.split("_")[0]]
    cfg = common.load_settings(args.settings, sensor)
    seq = datasets.LOADERS[args.type](args.data)
    if args.max_frames:
        seq.items = seq.items[:args.max_frames]
    subs = seq.split(args.agents)
    vocab = common.get_vocabulary(args.vocab, [seq], cfg)
    rect = common.get_rectifier(args.settings)

    server = MultiAgentServer(cfg, vocab)
    trackers = [server.register_client(a) for a in range(args.agents)]

    from ..utils import diag
    timer = common.FrameTimer()
    # round-robin: frame i of every agent per tick (generic_split_seq.cc:339)
    max_len = max(len(s) for s in subs)
    for i in range(max_len):
        for a, sub in enumerate(subs):
            if i >= len(sub):
                continue
            left, right, depth = sub.load(i)
            with timer:
                if right is not None:
                    if rect is not None:
                        left, right = rect(left, right)
                    trackers[a].track_stereo(left, right, frame_id=i)
                elif depth is not None:
                    trackers[a].track_rgbd(left, depth, frame_id=i)
                else:
                    trackers[a].track_mono(left, frame_id=i)
            diag.log_frame(a, i, trackers[a], server.shared)
        server.process_new_keyframes()
    server.shutdown()
    timer.report()
    if server.n_relocalizations:
        print(f"relocalizations: {server.n_relocalizations}")

    os.makedirs(args.out, exist_ok=True)
    from ..io import trajectory as traj_mod
    for a, (tracker, sub) in enumerate(zip(trackers, subs)):
        rows = tracker.trajectory_tum(sub.timestamps())
        traj_mod.write_tum(os.path.join(args.out, f"SLAM{a}.txt"), rows)
    common.write_fusion_stats(os.path.join(args.out, "stats.csv"),
                              server.stats)
    n_maps = server.multimap.n_maps
    print(f"agents: {args.agents}, final maps: {n_maps}, "
          f"fusions: {len(server.stats)}")
    return {"final_maps": n_maps, "fusions": len(server.stats),
            "relocalizations": server.n_relocalizations}


if __name__ == "__main__":
    main()
