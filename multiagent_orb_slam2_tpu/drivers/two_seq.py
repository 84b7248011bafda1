"""Two-sequence multi-agent driver: one agent per dataset sequence.

Covers Examples/MultiAgent/euroc_two_seq.cc (and generalizes it beyond
EuRoC): two different sequences with real scene overlap, one agent each,
central fusion server. Trajectories saved per agent id (:282-284).

  python -m multiagent_orb_slam2_tpu.drivers.two_seq \
      -t stereo_euroc -d1 /data/MH01 -d2 /data/MH02 -s settings.yaml \
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
    ap.add_argument("-d1", "--data1", required=True)
    ap.add_argument("-d2", "--data2", required=True)
    ap.add_argument("-s", "--settings", required=True)
    ap.add_argument("-v", "--vocab", default="")
    ap.add_argument("-o", "--out", default=".")
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args(argv)

    sensor = common.SENSOR_OF[args.type.split("_")[0]]
    cfg = common.load_settings(args.settings, sensor)
    loader = datasets.LOADERS[args.type]
    seqs = [loader(args.data1), loader(args.data2)]
    if args.max_frames:
        for s in seqs:
            s.items = s.items[:args.max_frames]
    vocab = common.get_vocabulary(args.vocab, seqs, cfg)
    rect = common.get_rectifier(args.settings)

    server = MultiAgentServer(cfg, vocab)
    trackers = [server.register_client(a) for a in range(2)]

    timer = common.FrameTimer()
    for i in range(max(len(s) for s in seqs)):
        for a, sub in enumerate(seqs):
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
        server.process_new_keyframes()
    server.shutdown()
    timer.report()

    os.makedirs(args.out, exist_ok=True)
    from ..io import trajectory as traj_mod
    for a, (tracker, sub) in enumerate(zip(trackers, seqs)):
        traj_mod.write_tum(os.path.join(args.out, f"SLAM{a}.txt"),
                           tracker.trajectory_tum(sub.timestamps()))
    common.write_fusion_stats(os.path.join(args.out, "stats.csv"),
                              server.stats)
    print(f"final maps: {server.multimap.n_maps}, fusions: {len(server.stats)}")


if __name__ == "__main__":
    main()
