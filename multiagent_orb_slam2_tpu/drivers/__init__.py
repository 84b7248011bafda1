"""CLI drivers mirroring the reference Examples/ layer (SURVEY.md §2f):

- run_single:       mono_tum / mono_kitti / mono_euroc / stereo_kitti /
                    stereo_euroc / rgbd_tum (single-agent, trajectory export)
- generic_split_seq: one dataset split contiguously across N agents with a
                    central fusion server (the fork's primary experiment)
- two_seq:          two different sequences, one agent each (euroc_two_seq)
- train_vocab:      build a vocabulary from a dataset's descriptors

Run as `python -m multiagent_orb_slam2_tpu.drivers.<name> --help`.
"""
