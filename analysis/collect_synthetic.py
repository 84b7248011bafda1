"""5-trial accuracy protocol at reference scale on synthetic sequences.

The reference's committed record is 5-trial ATE/RPE tables comparing the
multi-agent system against single-agent runs
(Analysis/*/stats_split_seq.txt, collect_split_seq_results.sh). This script
reproduces that protocol end-to-end THROUGH THE COMMITTED DRIVERS on
generated loop-closure sequences (make_synth_seq.py): per trial it runs the
single-agent driver (run_single) and the 2-agent split driver
(generic_split_seq), evaluates every trajectory against exact ground truth
with analysis/genstats.py, and writes the summary table to
analysis/stats_synthetic.txt.

Trials vary the scene texture and trajectory-jitter seed (the engine is
deterministic per seed; the reference's 5 trials capture thread
nondeterminism instead).

  python analysis/collect_synthetic.py --trials 5 --frames 660 \
      --work /tmp/synth_eval
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _fresh(out_file: str, gt: str) -> bool:
    """An output is reusable iff it is newer than the sequence it was run
    on (stale pre-regeneration outputs must NOT short-circuit a trial)."""
    return (os.path.exists(out_file)
            and os.path.getmtime(out_file) > os.path.getmtime(gt))


def run_trial(trial: int, work: str, frames: int, vocab_path: str):
    import genstats
    from multiagent_orb_slam2_tpu.drivers import generic_split_seq, run_single
    import make_synth_seq

    seq_dir = os.path.join(work, f"seq{trial}")
    if not os.path.exists(os.path.join(seq_dir, "gt_tum.txt")):
        make_synth_seq.main(["-o", seq_dir, "--seed", str(trial),
                             "--frames", str(frames)])
    settings = os.path.join(seq_dir, "settings.json")
    gt = os.path.join(seq_dir, "gt_tum.txt")

    out_single = os.path.join(work, f"single{trial}")
    t0 = time.perf_counter()
    if not _fresh(os.path.join(out_single, "CameraTrajectory.txt"), gt):
        run_single.main(["-t", "stereo_synth", "-d", seq_dir, "-s", settings,
                         "-v", vocab_path, "-o", out_single])
    t_single = time.perf_counter() - t0

    out_split = os.path.join(work, f"split{trial}")
    t0 = time.perf_counter()
    if _fresh(os.path.join(out_split, "SLAM0.txt"), gt):
        # resumed: fusion count recoverable from stats.csv, maps unknown
        stats_f = os.path.join(out_split, "stats.csv")
        n_fus = 0
        if os.path.exists(stats_f):
            with open(stats_f) as f:
                n_fus = max(len(f.readlines()) - 1, 0)
        split_meta = {"final_maps": -1, "fusions": n_fus,
                      "relocalizations": -1}
    else:
        split_meta = generic_split_seq.main(
            ["-t", "stereo_synth", "-n", "2", "-d", seq_dir,
             "-s", settings, "-v", vocab_path, "-o", out_split])
    t_split = time.perf_counter() - t0

    rows = {}
    r = genstats.evaluate(gt, os.path.join(out_single,
                                           "CameraTrajectory.txt"))
    rows["single"] = r
    for a in range(2):
        rows[f"agent{a}"] = genstats.evaluate(
            gt, os.path.join(out_split, f"SLAM{a}.txt"))
    rows["_meta"] = (f"maps={split_meta['final_maps']} "
                     f"fusions={split_meta['fusions']} "
                     f"relocs={split_meta['relocalizations']}")
    print(f"trial {trial}: single {t_single:.0f}s, split {t_split:.0f}s "
          f"{rows['_meta']}", flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--frames", type=int, default=660)
    ap.add_argument("--work", default="/tmp/synth_eval")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "stats_synthetic.txt"))
    args = ap.parse_args(argv)

    os.makedirs(args.work, exist_ok=True)
    # empty path -> drivers load the committed offline vocabulary asset
    # (multiagent_orb_slam2_tpu/assets/vocab_synth_100k.npz), matching the
    # reference protocol of one pre-trained vocabulary for every run
    vocab_path = ""

    all_rows = []
    for trial in range(args.trials):
        all_rows.append(run_trial(trial, args.work, args.frames, vocab_path))
        # rewrite the table after EVERY trial so an interrupted run still
        # leaves a complete partial artifact
        write_table(args.out, all_rows, args.trials)
    print(f"wrote {args.out}")
    with open(args.out) as f:
        print(f.read())


def write_table(out_path, all_rows, n_trials):
    def agg(key, field):
        vals = [t[key][field] for t in all_rows
                if t.get(key) is not None]
        return (np.mean(vals), np.std(vals)) if vals else (float("nan"), 0)

    with open(out_path, "w") as f:
        f.write("# accuracy at reference scale "
                "(synthetic loop-closure corridor, ~660 frames/trial;\n"
                "# exact ground truth; ATE/RPE-t in m, RPE-r in deg; "
                "MA = 2-agent split via MultiAgentServer,\n"
                "# OS2-equivalent = single-agent run; protocol mirrors "
                "Analysis/*/stats_split_seq.txt)\n"
                f"# trials completed: {len(all_rows)}/{n_trials}\n")
        f.write(f"{'run':<10} {'ATE':>8} {'+-':>7} {'RPE-t':>8} {'+-':>7} "
                f"{'RPE-r':>8} {'+-':>7}\n")
        for key in ("single", "agent0", "agent1"):
            am, as_ = agg(key, "ate")
            tm, ts_ = agg(key, "rpe_t")
            rm, rs_ = agg(key, "rpe_r")
            f.write(f"{key:<10} {am:>8.3f} {as_:>7.3f} {tm:>8.3f} "
                    f"{ts_:>7.3f} {rm:>8.2f} {rs_:>7.2f}\n")
        f.write("\n# per-trial ATE (and split-run fusion outcome)\n")
        for i, t in enumerate(all_rows):
            vals = " ".join(
                f"{k}={t[k]['ate']:.3f}" if t.get(k) else f"{k}=nan"
                for k in ("single", "agent0", "agent1"))
            extra = t.get("_meta", "")
            f.write(f"trial{i}: {vals} {extra}\n")


if __name__ == "__main__":
    main()
