"""Per-agent System facade: tracking + loop closing + relocalization +
trajectory export + checkpointing.

Replaces the reference System (src/System.cc): the constructor there loads
the vocabulary, builds KFDB/Map/drawers and spawns the LocalMapping /
LoopClosing / Viewer threads (:32-117); here the subsystems are synchronous
phases over the shared array state. TrackMonocular/TrackStereo/TrackRGBD
(:187-339), SaveTrajectoryTUM/KITTI (:390-540) and the map-save TODO
(include/System.h:145-147) all have direct equivalents.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig, Sensor
from ..geometry import se3
from ..io import trajectory as traj_mod
from ..mapstate import checkpoint as ckpt
from ..mapstate import state as ms
from ..ops import frame as frame_mod
from ..vocab import bow as bow_mod
from ..vocab import kfdb as kfdb_mod
from . import loop_closing as lc
from . import reloc as reloc_mod
from . import steps
from .tracker import SharedMap, Tracker, TrackerState


class System:
    """Single-agent SLAM engine (multi-agent setups go through
    server.MultiAgentServer, which owns the Tracker/LoopCloser pairs)."""

    def __init__(self, cfg: SlamConfig, vocab: bow_mod.Vocabulary,
                 shared: Optional[SharedMap] = None, agent: int = 0,
                 enable_loop_closing: bool = True, run_gba: bool = True):
        self.cfg = cfg
        self.vocab = vocab
        self.shared = shared or SharedMap(cfg)
        self.tracker = Tracker(cfg, self.shared, agent=agent, map_id=agent)
        self.loop_closer = lc.LoopCloser(cfg, vocab)
        self.enable_loop_closing = enable_loop_closing
        self.run_gba = run_gba
        self.n_relocalizations = 0

    # -- tracking entry points (reference System::Track*) ------------------

    def track_stereo(self, left, right, frame_id=None):
        feats = frame_mod.extract_frame(jnp.asarray(left), self.cfg,
                                        right_img=jnp.asarray(right))
        return self._track(feats, frame_id)

    def track_rgbd(self, img, depth, frame_id=None):
        feats = frame_mod.extract_frame(jnp.asarray(img), self.cfg,
                                        depth_map=jnp.asarray(depth))
        return self._track(feats, frame_id)

    def track_mono(self, img, frame_id=None):
        feats = frame_mod.extract_frame(jnp.asarray(img), self.cfg)
        return self._track(feats, frame_id)

    def activate_localization_mode(self):
        """System::ActivateLocalizationMode: freeze mapping, track only."""
        self.tracker.set_localization_mode(True)

    def deactivate_localization_mode(self):
        self.tracker.set_localization_mode(False)

    def _track(self, feats, frame_id):
        out = self.tracker.track_features(feats, frame_id)
        if self.tracker.state == TrackerState.LOST:
            if self._relocalize(feats):
                out = (self.tracker.last_q, self.tracker.last_t)
        self._process_keyframes()
        return out

    def _process_keyframes(self):
        drained = False
        while self.tracker.culled_kf_slots:
            k = self.tracker.culled_kf_slots.pop(0)
            self.loop_closer.db = kfdb_mod.erase_keyframe(self.loop_closer.db,
                                                          k)
            drained = True
        if drained:
            # database rows erased -> culled slots become reusable
            self.shared.reclaim_slots()
        while self.tracker.new_kf_slots:
            kf_slot = self.tracker.new_kf_slots.pop(0)
            if not self.enable_loop_closing:
                # still register in the database for relocalization
                st = self.shared.state
                self.loop_closer.db, _, _ = kfdb_mod.add_keyframe(
                    self.loop_closer.db, self.vocab, kf_slot,
                    st.kf_desc[kf_slot], st.kf_feat_valid[kf_slot])
                continue
            match = self.loop_closer.process_keyframe(self.shared, kf_slot)
            if match is not None:
                self.loop_closer.correct_loop(self.shared, match,
                                              run_gba=self.run_gba)

    # -- relocalization (Tracking::Relocalization src/Tracking.cc:1359-1520)

    def _relocalize(self, feats) -> bool:
        ok = reloc_mod.relocalize(self.tracker, self.loop_closer.db,
                                  self.vocab, feats, self.cfg)
        if ok:
            self.n_relocalizations += 1
        return ok

    # -- export / checkpoint ----------------------------------------------

    def save_trajectory_tum(self, path, timestamps=None):
        traj_mod.write_tum(path, self.tracker.trajectory_tum(timestamps))

    def save_trajectory_kitti(self, path):
        """KITTI format: every frame, re-chained through its reference KF so
        loop/GBA corrections reach the export (src/System.cc:487-540)."""
        mats = []
        for _, _, q_cw, t_cw in self.tracker.export_poses():
            q_wc, t_wc = se3.inverse(jnp.asarray(q_cw, jnp.float32),
                                     jnp.asarray(t_cw, jnp.float32))
            T = np.asarray(se3.to_matrix44(q_wc, t_wc))[:3]
            mats.append(T)
        traj_mod.write_kitti(path, np.stack(mats))

    def save_keyframe_trajectory_tum(self, path, timestamps=None):
        st = self.shared.state
        rows = []
        for k in np.nonzero(np.asarray(st.kf_valid))[0]:
            fid = int(st.kf_frame_id[k])
            ts = timestamps[fid] if timestamps is not None else float(fid)
            q_wc, t_wc = se3.inverse(st.kf_q[k], st.kf_t[k])
            q_wc, t_wc = np.asarray(q_wc), np.asarray(t_wc)
            rows.append((ts, *t_wc, q_wc[1], q_wc[2], q_wc[3], q_wc[0]))
        traj_mod.write_tum(path, rows)

    def save_map(self, path):
        # n_created persists so restored sessions never reissue uids of
        # already-culled keyframes (their kf_seq entries are wiped at cull,
        # so max(kf_seq)+1 alone under-counts)
        ckpt.save_map(path, self.shared.state, self.shared.n_kf,
                      self.shared.n_mp,
                      extra={"n_created": self.shared.n_created})

    def load_map(self, path):
        state, meta = ckpt.load_map(path)
        self.shared.state = state
        self.shared.n_kf = meta["n_kf"]
        self.shared.n_mp = meta["n_mp"]
        # rebuild slot-recycling tables from the persisted kf_seq column
        sh = self.shared
        seq = np.asarray(state.kf_seq)
        valid = np.asarray(state.kf_valid)
        sh.kf_uid[:] = -1
        sh.kf_uid[: len(seq)] = seq
        sh.uid_slot = {int(seq[k]): int(k)
                       for k in np.nonzero(valid & (seq >= 0))[0]}
        floor = int(seq.max()) + 1 if (seq >= 0).any() else 0
        sh.n_created = max(floor, int(meta.get("n_created", 0)))
        sh.free_kf = [int(k) for k in range(sh.n_kf) if not valid[k]]
        sh.pending_release = []
        # stale cull chains / trajectories refer to the pre-restore session;
        # clearing them prevents a reissued-looking uid from re-chaining an
        # exported frame onto an unrelated keyframe
        sh.cull_info = {}
        # refresh the relocalization database from the restored keyframes
        for k in np.nonzero(np.asarray(state.kf_valid))[0]:
            self.loop_closer.db, _, _ = kfdb_mod.add_keyframe(
                self.loop_closer.db, self.vocab, int(k),
                state.kf_desc[int(k)], state.kf_feat_valid[int(k)])

    def shutdown(self):
        self._process_keyframes()
