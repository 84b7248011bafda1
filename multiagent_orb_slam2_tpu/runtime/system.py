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
from ..geometry import epnp, se3
from ..io import trajectory as traj_mod
from ..mapstate import checkpoint as ckpt
from ..mapstate import state as ms
from ..ops import frame as frame_mod
from ..ops import matchers
from ..optim import pose_opt
from ..vocab import bow as bow_mod
from ..vocab import kfdb as kfdb_mod
from . import loop_closing as lc
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
        st = self.shared.state
        cfg = self.cfg
        words = bow_mod.transform_words(self.vocab, feats.desc, feats.valid)
        vec = bow_mod.bow_vector(self.vocab, words, feats.valid)
        cand_mask, scores = kfdb_mod.detect_reloc_candidates(
            self.loop_closer.db, words, feats.valid, vec, st.covis)
        cands = np.nonzero(np.asarray(cand_mask))[0]
        order = np.argsort(-np.asarray(scores)[cands])
        P = st.mp_pos.shape[0]
        sf = jnp.asarray(cfg.orb.scale_factors)
        for c in cands[order][:5]:
            c = int(c)
            kf_mp = st.kf_mp[c]
            qmask = (kf_mp >= 0) & st.kf_feat_valid[c] \
                & st.mp_valid[jnp.clip(kf_mp, 0, P - 1)]
            res = matchers.match_brute(st.kf_desc[c], qmask, feats.desc,
                                       feats.valid, th=cfg.matcher.th_low,
                                       nn_ratio=0.75)
            if int(jnp.sum(res.ok)) < 15:
                continue
            sel = res.ok
            mp = jnp.clip(kf_mp, 0, P - 1)
            pw = st.mp_pos[mp]
            feat = jnp.clip(res.best_feat, 0, feats.xy.shape[0] - 1)
            uv = feats.xy[feat]
            sigma2 = sf[feats.level[feat]] ** 2
            rr = epnp.epnp_ransac(pw, uv, sigma2, sel, cfg.camera,
                                  jax.random.PRNGKey(c), n_iters=200)
            if not bool(rr.ok):
                continue
            # polish with robust pose optimization over the matches
            obs = pose_opt.PoseObs(
                pw=pw,
                obs=jnp.concatenate([uv, feats.u_right[feat][:, None]], -1),
                inv_sigma2=1.0 / sigma2,
                is_stereo=feats.u_right[feat] >= 0,
                mask=sel & rr.inliers)
            q, t, inlier, n = pose_opt.pose_optimize(rr.q, rr.t, obs,
                                                     cfg.camera,
                                                     cfg.optimizer)
            # match-growth rounds (src/Tracking.cc:1452-1502): when the EPnP
            # solution has too few inliers, project the candidate keyframe's
            # points with the current estimate and window-match to add
            # observations, re-optimize; a second narrower round if still
            # short of the 50-inlier bar
            F = feats.xy.shape[0]
            feat_cur = feat
            found = inlier
            for radius_px, th_d in ((10.0, 100), (3.0, 64)):
                if int(n) >= cfg.tracking.reloc_min_inliers:
                    break
                uvp, urp, depp, visp = matchers.project_points(
                    cfg.camera, q, t, pw)
                grow_mask = qmask & ~found & visp
                radius = radius_px * sf[st.kf_level[c]]
                res2 = matchers.match_window(feats, st.kf_desc[c], grow_mask,
                                             uvp, radius, th=th_d)
                _, res2 = matchers.resolve_conflicts(res2, F)
                new_ok = res2.ok & ~found
                if int(jnp.sum(new_ok)) == 0:
                    continue
                feat_cur = jnp.where(found, feat_cur,
                                     jnp.clip(res2.best_feat, 0, F - 1))
                sel2 = found | new_ok
                sigma2_2 = sf[feats.level[feat_cur]] ** 2
                obs2 = pose_opt.PoseObs(
                    pw=pw,
                    obs=jnp.concatenate(
                        [feats.xy[feat_cur],
                         feats.u_right[feat_cur][:, None]], -1),
                    inv_sigma2=1.0 / sigma2_2,
                    is_stereo=feats.u_right[feat_cur] >= 0,
                    mask=sel2)
                q, t, inlier, n = pose_opt.pose_optimize(q, t, obs2,
                                                         cfg.camera,
                                                         cfg.optimizer)
                found = inlier
            if int(n) < cfg.tracking.reloc_min_inliers:
                continue
            # success: adopt the pose, rebuild the frame association
            frame_mp = jnp.full((F,), ms.NONE, jnp.int32).at[
                jnp.where(inlier, feat_cur, F)].set(
                    jnp.where(inlier, kf_mp, ms.NONE), mode="drop")
            tr = self.tracker
            tr.state = TrackerState.OK
            tr.last_q, tr.last_t = q, t
            tr.last_feats = feats
            tr.last_frame_mp = frame_mp
            tr.ref_kf = c
            tr.has_velocity = False
            if tr.trajectory:
                tr.trajectory[-1].q = np.asarray(q)
                tr.trajectory[-1].t = np.asarray(t)
                tr.trajectory[-1].lost = False
                # re-anchor the record on the relocalization keyframe: the
                # pre-lost reference would re-chain this frame through a
                # keyframe unrelated to the recovered pose (and pick up that
                # keyframe's future corrections instead of this one's)
                tr.trajectory[-1].ref_kf = c
                tr.trajectory[-1].ref_uid = int(self.shared.kf_uid[c])
                tr.trajectory[-1].ref_q = np.asarray(st.kf_q[c])
                tr.trajectory[-1].ref_t = np.asarray(st.kf_t[c])
            self.n_relocalizations += 1
            return True
        return False

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
