"""Shared driver plumbing: config loading, vocabulary handling, stats output."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from ..config import SlamConfig, Sensor, from_yaml_dict
from ..vocab import bow as bow_mod


def enable_compile_cache(path: str = None):
    """Persistent XLA compilation cache: a fresh driver process re-runs
    ~500 distinct compilations (~7 min through the tunneled compile helper)
    before reaching steady state; the on-disk cache cuts that to seconds."""
    import jax
    path = path or os.environ.get("SLAM_COMPILE_CACHE",
                                  "/tmp/jax_compile_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


enable_compile_cache()


SENSOR_OF = {"mono": Sensor.MONOCULAR, "stereo": Sensor.STEREO,
             "rgbd": Sensor.RGBD}


def load_settings(path: str, sensor: int) -> SlamConfig:
    """Load a reference-style YAML settings file (cv::FileStorage syntax) or
    a JSON dict of the same keys."""
    if path.endswith(".json"):
        with open(path) as f:
            d = json.load(f)
    else:
        d = _parse_opencv_yaml(path)
    return from_yaml_dict(d, sensor=sensor)


def _parse_opencv_yaml(path: str) -> dict:
    """Minimal parser for the reference's 'Key.Sub: value' YAML files
    (e.g. Examples/Stereo/KITTI00-02.yaml, EuRoC.yaml). Handles scalar
    entries plus `!!opencv-matrix` nodes (rows/cols/data) such as the
    LEFT./RIGHT. rectification blocks read by euroc_two_seq.cc:76-92."""
    import re

    import numpy as np

    out = {}
    with open(path) as f:
        text = f.read()
    # strip comments
    lines = [ln.split("#")[0].rstrip() for ln in text.splitlines()]
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line or line.startswith("%") or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip(), val.strip()
        if val.startswith("!!opencv-matrix") or val == "!!opencv-matrix":
            # collect the indented block
            block = []
            while i < len(lines) and (lines[i].startswith((" ", "\t"))
                                      or not lines[i].strip()):
                block.append(lines[i])
                i += 1
            blob = " ".join(block)
            rows = int(re.search(r"rows:\s*(\d+)", blob).group(1))
            cols = int(re.search(r"cols:\s*(\d+)", blob).group(1))
            data = re.search(r"data:\s*\[([^\]]*)\]", blob).group(1)
            vals = [float(x) for x in data.replace(",", " ").split()]
            out[key] = np.array(vals, dtype=np.float64).reshape(rows, cols)
            continue
        if not val or val.startswith(("[", "{")):
            continue
        try:
            out[key] = float(val)
        except ValueError:
            out[key] = val
    return out


def get_rectifier(settings_path: str):
    """Build a StereoRectifier when the settings file carries the raw-camera
    LEFT./RIGHT. K/D/R/P blocks (EuRoC-style, euroc_two_seq.cc:66-112);
    None for pre-rectified datasets (KITTI/TUM)."""
    from ..io import rectify
    if settings_path and settings_path.endswith((".yaml", ".yml")):
        try:
            d = _parse_opencv_yaml(settings_path)
        except Exception:
            return None
        if rectify.StereoRectifier.available(d):
            return rectify.StereoRectifier(d)
    return None


DEFAULT_VOCAB = os.path.join(os.path.dirname(__file__), "..", "assets",
                             "vocab_synth_100k.npz")


def get_vocabulary(path: str, sequences=None, cfg: SlamConfig = None,
                   n_frames: int = 30) -> bow_mod.Vocabulary:
    """Load a vocabulary; fall back to the committed offline asset, then to
    per-run training (last resort — a vocabulary trained on 30 frames of
    the sequence under test has measurably poor cross-map recall; the
    reference always loads its offline-trained ORBvoc.txt,
    src/MultiAgentServer.cc:16)."""
    if path and os.path.exists(path):
        return bow_mod.load_vocabulary(path)
    if os.path.exists(DEFAULT_VOCAB):
        if path:
            print(f"warning: vocabulary {path} not found; using the "
                  f"bundled asset {os.path.abspath(DEFAULT_VOCAB)}",
                  file=sys.stderr)
        return bow_mod.load_vocabulary(DEFAULT_VOCAB)
    if sequences is None:
        raise FileNotFoundError(f"vocabulary {path} not found and no "
                                "training data given")
    import jax.numpy as jnp
    from ..ops import frame as frame_mod
    descs = []
    for seq in sequences:
        step = max(len(seq) // n_frames, 1)
        for i in range(0, len(seq), step):
            left, right, depth = seq.load(i)
            f = frame_mod.extract_frame(jnp.asarray(left), cfg)
            v = np.asarray(f.valid)
            descs.append(np.asarray(f.desc)[v])
    vocab = bow_mod.train_vocabulary(np.concatenate(descs), k=10, depth=4)
    if path:
        bow_mod.save_vocabulary(vocab, path)
    return vocab


class FrameTimer:
    """Per-frame timing + mean/median printout (the reference drivers print
    'mean tracking time' / 'median tracking time',
    generic_split_seq.cc:377-381)."""

    def __init__(self):
        self.times = []

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.times.append(time.perf_counter() - self._t0)

    def report(self, label="tracking"):
        if not self.times:
            return
        ts = sorted(self.times)
        print(f"median {label} time: {ts[len(ts) // 2] * 1e3:.1f} ms")
        print(f"mean {label} time:   {np.mean(ts) * 1e3:.1f} ms")


def write_fusion_stats(path: str, stats: list):
    """stats.csv with the reference's schema (generic_split_seq.cc:140-144:
    sim3, mf, ckf, cmp, mkf, mmp, cd..., gba in microseconds)."""
    with open(path, "w") as f:
        f.write("sim3,mf,ckf,cmp,mkf,mmp,cd,cdsum,cdmean,cdstdev,cdmed,gba\n")
        for s in stats:
            f.write(f"{s['sim3_ms'] * 1e3:.0f},{s['mf_ms'] * 1e3:.0f},"
                    f"{s['ckf']},{s.get('cmp', 0)},{s.get('mkf', 0)},"
                    f"{s.get('mmp', 0)},{s['cd_ms'] * 1e3:.0f},"
                    f"{s.get('cd_sum_ms', 0) * 1e3:.0f},"
                    f"{s.get('cd_mean_ms', 0) * 1e3:.0f},"
                    f"{s.get('cd_stdev_ms', 0) * 1e3:.0f},"
                    f"{s.get('cd_med_ms', 0) * 1e3:.0f},"
                    f"{s['gba_ms'] * 1e3:.0f}\n")
