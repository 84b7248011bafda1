"""Train a bag-of-binary-words vocabulary from a dataset.

The reference ships a pre-trained 10^6-word DBoW2 vocabulary
(Vocabulary/ORBvoc.txt — a missing blob in the snapshot, SURVEY.md §6);
this tool builds an equivalent hierarchical binary vocabulary from any
supported dataset's own ORB descriptors.

  python -m multiagent_orb_slam2_tpu.drivers.train_vocab \
      -t stereo_kitti -d /data/kitti/sequences/00 -s settings.yaml \
      -o voc.npz [-k 10] [--depth 4] [--frames 100]
"""
from __future__ import annotations

import argparse

import numpy as np

from ..io import datasets
from ..vocab import bow as bow_mod
from . import common


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-t", "--type", required=True,
                    choices=sorted(datasets.LOADERS))
    ap.add_argument("-d", "--data", action="append", required=True)
    ap.add_argument("-s", "--settings", required=True)
    ap.add_argument("-o", "--out", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--frames", type=int, default=100)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from ..ops import frame as frame_mod
    sensor = common.SENSOR_OF[args.type.split("_")[0]]
    cfg = common.load_settings(args.settings, sensor)

    descs = []
    for root in args.data:
        seq = datasets.LOADERS[args.type](root)
        step = max(len(seq) // args.frames, 1)
        for i in range(0, len(seq), step):
            left, _, _ = seq.load(i)
            f = frame_mod.extract_frame(jnp.asarray(left), cfg)
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    alld = np.concatenate(descs)
    print(f"training on {len(alld)} descriptors, k={args.k}, "
          f"depth={args.depth} -> {args.k ** args.depth} words")
    vocab = bow_mod.train_vocabulary(alld, k=args.k, depth=args.depth)
    bow_mod.save_vocabulary(vocab, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
