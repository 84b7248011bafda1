"""Host-side tracking orchestrator: the Tracking state machine.

Replaces the reference Tracking thread (src/Tracking.cc Track(),
:278-517) and the LocalMapping consumer for the synchronous phases. The host
never touches image or descriptor data — it sequences jitted steps
(runtime.steps) and makes the small-scalar decisions (state transitions,
keyframe need, slot allocation) the reference spreads across its state
machine.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig, Sensor
from ..geometry import se3
from ..mapstate import state as ms
from ..ops import frame as frame_mod
from . import steps


class TrackerState:
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


class SharedMap:
    """Owns the MapState arrays + slot allocation / recycling bookkeeping.

    One per map in single-agent mode; the multi-agent server shares one
    across agents (the reference's Map + MultiMap roles).

    Slot lifecycle (the reference's KeyFrame::SetBadFlag erase +
    Map::EraseMapPoint reclamation, src/KeyFrame.cc, src/Map.cc):
    - keyframes: culled slots go to `pending_release` until the database
      owner (System / MultiAgentServer) has erased their BoW rows, then to
      the `free_kf` list and are reused by alloc_kf. Every allocation gets a
      monotonically increasing uid (the reference's mnId) — uids drive age
      arithmetic (kf_seq), loop refractory windows, and trajectory-export
      re-chaining, so slot reuse never aliases a dead keyframe.
    - points: creation is contiguous from n_mp; when free capacity drops
      below one frame's worth, `compact_points` packs the surviving points
      to the front (one gather per array + a kf_mp rewrite) and rewinds
      n_mp. Creation beyond capacity safely no-ops (scatter mode="drop")
      and is counted in n_point_stalls.
    """

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.state = ms.empty_map_state(cfg)
        self.n_kf = 0          # slot high-water mark
        self.n_mp = 0
        self.n_created = 0     # total keyframes ever created (uid counter)
        self.kf_uid = np.full(cfg.caps.max_keyframes, -1, np.int64)
        self.uid_slot: dict[int, int] = {}   # live uid -> slot
        self.free_kf: list[int] = []
        self.pending_release: list[int] = []
        self.trackers: list = []             # for compaction remaps
        self.n_point_stalls = 0
        self.n_compactions = 0
        # uid -> (parent_uid, rel_q, rel_t) at cull time: the reference's
        # KeyFrame::mTcp chain used by SaveTrajectory* to re-chain frames
        # whose reference keyframe was later erased (src/System.cc:406-412)
        self.cull_info: dict[int, tuple] = {}

    def alloc_kf(self) -> int:
        if self.free_kf:
            slot = self.free_kf.pop()
        elif self.n_kf < self.cfg.caps.max_keyframes:
            slot = self.n_kf
            self.n_kf += 1
        else:
            raise RuntimeError(
                "keyframe capacity exhausted (no culled slots to recycle)")
        uid = self.n_created
        self.n_created += 1
        self.kf_uid[slot] = uid
        self.uid_slot[uid] = slot
        self.state = self.state._replace(
            kf_seq=self.state.kf_seq.at[slot].set(uid))
        return slot

    def note_culled(self, slot: int, parent_slot: int, rel_q, rel_t):
        """Record a culled keyframe's relative-pose chain entry and queue
        its slot for reuse (after upstream database erasure)."""
        uid = int(self.kf_uid[slot])
        if uid >= 0:
            if parent_slot is not None and parent_slot >= 0:
                self.cull_info[uid] = (int(self.kf_uid[parent_slot]),
                                       rel_q, rel_t)
            self.uid_slot.pop(uid, None)
        self.pending_release.append(slot)

    def note_invalidated(self, slot: int):
        """Keyframe invalidated without chain info (agent reset)."""
        uid = int(self.kf_uid[slot])
        self.uid_slot.pop(uid, None)
        self.pending_release.append(slot)

    def reclaim_slots(self):
        """Move database-erased slots to the free list (called by the
        System / server after draining culled_kf_slots)."""
        self.free_kf.extend(self.pending_release)
        self.pending_release.clear()

    def mp_base(self) -> int:
        return self.n_mp

    def commit_mp(self, n_new: int):
        if self.n_mp + n_new > self.cfg.caps.max_points:
            self.n_point_stalls += (self.n_mp + n_new
                                    - self.cfg.caps.max_points)
        self.n_mp = min(self.n_mp + n_new, self.cfg.caps.max_points)
        # keep a full keyframe-pipeline's worth of headroom: one fused KF
        # dispatch can allocate several neighbor-pairs' worth of new points
        # before the host sees the count
        if self.cfg.caps.max_points - self.n_mp \
                < 4 * self.cfg.caps.max_features:
            self.compact_points()

    def compact_points(self):
        """Pack surviving points to the front of the point arrays, reclaiming
        slots of culled/merged points (the reference's Map::EraseMapPoint +
        delete). One host argwhere + a jitted permutation-gather; every
        tracker's live frame->point row is remapped through the same LUT."""
        P = self.cfg.caps.max_points
        valid = np.asarray(self.state.mp_valid)
        idx_valid = np.nonzero(valid)[0]
        n_valid = len(idx_valid)
        if n_valid >= self.n_mp:
            return  # nothing to reclaim
        perm = np.concatenate([idx_valid,
                               np.nonzero(~valid)[0]]).astype(np.int32)
        lut = np.full(P + 1, ms.NONE, np.int32)
        lut[idx_valid] = np.arange(n_valid, dtype=np.int32)
        perm_j = jnp.asarray(perm)
        lut_j = jnp.asarray(lut)
        self.state = _compact_points_apply(self.state, perm_j, lut_j)
        for t in self.trackers:
            if t.last_frame_mp is not None:
                old = t.last_frame_mp
                t.last_frame_mp = jnp.where(
                    old >= 0, lut_j[jnp.clip(old, 0, P)], ms.NONE)
        self.n_mp = n_valid
        self.n_compactions += 1


@functools.partial(jax.jit)
def _compact_points_apply(state: ms.MapState, perm, lut):
    """Permute every point-axis array by `perm` (valid points first) and
    rewrite the forward map kf_mp through `lut` (old slot -> new slot).
    The inverse observation rows ride the same permutation, so no rebuild
    is needed."""
    P = state.mp_pos.shape[0]
    kf_mp = jnp.where(state.kf_mp >= 0,
                      lut[jnp.clip(state.kf_mp, 0, P)], ms.NONE)
    return state._replace(
        kf_mp=kf_mp,
        mp_pos=state.mp_pos[perm],
        mp_valid=state.mp_valid[perm],
        mp_desc=state.mp_desc[perm],
        mp_normal=state.mp_normal[perm],
        mp_min_dist=state.mp_min_dist[perm],
        mp_max_dist=state.mp_max_dist[perm],
        mp_ref_kf=state.mp_ref_kf[perm],
        mp_agent=state.mp_agent[perm],
        mp_map=state.mp_map[perm],
        mp_visible=state.mp_visible[perm],
        mp_found=state.mp_found[perm],
        mp_first_kf=state.mp_first_kf[perm],
        mp_obs_kf=state.mp_obs_kf[perm],
        mp_obs_feat=state.mp_obs_feat[perm])


@dataclasses.dataclass
class FrameRecord:
    """Per-frame trajectory record (the reference's mlRelativeFramePoses +
    mlpReferences + mlbLost triplet, src/Tracking.cc:500-515). The absolute
    pose q/t is the track-time estimate; ref_kf plus the reference KF's pose
    snapshot (ref_q/ref_t, taken the same frame) let export re-chain each
    frame against the CURRENT keyframe pose so loop-closure / GBA
    corrections retroactively fix the whole trajectory
    (src/System.cc:390-448)."""
    frame_id: int
    q: np.ndarray
    t: np.ndarray
    lost: bool
    ref_kf: int = -1
    ref_uid: int = -1          # creation uid of ref_kf (slots are recycled)
    ref_q: Optional[np.ndarray] = None
    ref_t: Optional[np.ndarray] = None


class Tracker:
    """Per-agent front end (one per System, reference src/System.cc:89)."""

    def __init__(self, cfg: SlamConfig, shared: SharedMap, agent: int = 0,
                 map_id: int = 0, run_local_ba: bool = True):
        self.cfg = cfg
        self.shared = shared
        self.agent = agent
        self.map_id = map_id
        self.run_local_ba = run_local_ba
        self.state = TrackerState.NOT_INITIALIZED
        self.last_q = None
        self.last_t = None
        self.last_feats = None
        self.last_frame_mp = None
        self.vel_q = jnp.array([1.0, 0.0, 0.0, 0.0])
        self.vel_t = jnp.zeros(3)
        self.has_velocity = False
        self.ref_kf = -1
        self.last_kf_frame = -1
        self.frame_id = -1
        # localization-only mode (Tracking::mbOnlyTracking,
        # System::ActivateLocalizationMode src/System.cc / Tracking.cc:336-403)
        self.only_tracking = False
        self.vo = False          # mbVO: tracking on temporal points only
        self.last_vo_pw = None
        self.last_vo_mask = None
        self.trajectory: list[FrameRecord] = []
        self.new_kf_slots: list[int] = []    # queue for loop-closing stage
        self.culled_kf_slots: list[int] = []  # for database erasure upstream
        # multi-agent reset hook (set by MultiAgentServer): a reset agent
        # must leave the merged map and restart on a FRESH logical map so
        # its new (identity-origin) keyframes re-fuse through the normal
        # Sim3 pipeline instead of polluting the fused world frame
        self.on_reset = None
        shared.trackers.append(self)         # for point-compaction remaps

    # -- public API (System::TrackStereo / TrackRGBD equivalents) ---------

    def track_stereo(self, img_left, img_right, frame_id: Optional[int] = None):
        feats = frame_mod.extract_frame(jnp.asarray(img_left), self.cfg,
                                        right_img=jnp.asarray(img_right))
        return self._track(feats, frame_id)

    def track_mono(self, img, frame_id: Optional[int] = None):
        feats = frame_mod.extract_frame(jnp.asarray(img), self.cfg)
        return self._track(feats, frame_id)

    def track_rgbd(self, img, depth, frame_id: Optional[int] = None):
        feats = frame_mod.extract_frame(jnp.asarray(img), self.cfg,
                                        depth_map=jnp.asarray(depth))
        return self._track(feats, frame_id)

    def track_features(self, feats: frame_mod.FrameFeatures,
                       frame_id: Optional[int] = None):
        """Track pre-extracted features (used by tests and batched drivers)."""
        return self._track(feats, frame_id)

    # -- core state machine (Tracking::Track, src/Tracking.cc:278-517) -----

    def _track(self, feats, frame_id):
        self.frame_id = self.frame_id + 1 if frame_id is None else frame_id
        self._last_decision = None
        if self.state == TrackerState.NOT_INITIALIZED:
            ok = self._initialize(feats)
            self._record(lost=not ok)
            return (self.last_q, self.last_t) if ok else None

        sh = self.shared

        if self.state == TrackerState.LOST or self.only_tracking:
            q_pred, t_pred = self._predict_pose()

        if self.state == TrackerState.LOST:
            # auto-reset when lost with a barely-started map (reference
            # src/Tracking.cc:483-491: KeyFramesInMap() <= 5 -> full
            # Reset): a garbage 3-KF map would otherwise pin the agent to
            # relocalization luck forever
            st = sh.state
            n_mine = int(np.asarray(
                (st.kf_agent == self.agent) & st.kf_valid).sum())
            if n_mine <= self.cfg.tracking.reset_lost_max_kfs:
                self.reset()
                ok = self._initialize(feats)
                self._record(lost=not ok)
                return (self.last_q, self.last_t) if ok else None
            # reference semantics: once lost, only relocalization recovers
            # (src/Tracking.cc:331); the System facade owns that step.
            # Dead-reckon so the trajectory stays continuous.
            self.last_q, self.last_t = q_pred, t_pred
            self.last_feats = feats
            self.last_frame_mp = jnp.full((self.cfg.caps.max_features,),
                                          ms.NONE, jnp.int32)
            self._record(lost=True)
            return None

        if self.only_tracking:
            return self._track_localization_only(feats, q_pred, t_pred)

        # one-dispatch cascade: motion model -> wide retry -> ref-KF ->
        # local map, with the host's small-scalar decisions packed into a
        # single [5] vector (one device fetch per frame instead of 3-5
        # blocking int() reads — each costs a full dispatch round trip)
        tr, new_state, decision, aux = steps.track_frame_step(
            sh.state, feats, self.last_feats, self.last_frame_mp,
            self.ref_kf, self.last_q, self.last_t, self.vel_q, self.vel_t,
            self.has_velocity, sh.n_kf > 2, self.cfg)
        q_pred, t_pred, vel_q, vel_t = aux
        decision = np.asarray(decision)
        ok = bool(decision[0])
        sh.state = new_state
        self._last_decision = decision

        if not ok:
            # dead-reckon on the motion model (reference would relocalize;
            # relocalization lands with the place-recognition stage)
            self.state = TrackerState.LOST
            self.last_q, self.last_t = q_pred, t_pred
            self.last_feats = feats
            self.last_frame_mp = jnp.full((self.cfg.caps.max_features,),
                                          ms.NONE, jnp.int32)
            self._record(lost=True)
            return None

        self.state = TrackerState.OK
        # velocity (computed in-step): Tcw_cur * Twc_last
        self.vel_q, self.vel_t = vel_q, vel_t
        self.has_velocity = True

        need_kf = self._need_new_keyframe(feats, tr)
        frame_mp = tr.frame_mp
        if need_kf:
            # _create_keyframe returns the keyframe's POST-local-BA pose:
            # the recorded frame pose must match the reference-KF snapshot
            # taken in _record, or the baked relative pose would permanently
            # cancel the BA correction (reference: Tcr is identity for a
            # frame that spawned a keyframe, src/Tracking.cc:505-509)
            frame_mp, q_kf, t_kf = self._create_keyframe(feats, tr)
            tr = tr._replace(q=q_kf, t=t_kf)

        self.last_q, self.last_t = tr.q, tr.t
        self.last_feats = feats
        self.last_frame_mp = frame_mp
        self._record(lost=False)
        return self.last_q, self.last_t

    # -- localization-only mode (mbOnlyTracking, src/Tracking.cc:336-403) ---

    def set_localization_mode(self, on: bool):
        """ActivateLocalizationMode/DeactivateLocalizationMode
        (src/System.cc): in localization mode the map is frozen — no
        keyframes, no new map points, no local BA — and tracking augments
        the motion model with temporal VO points unprojected from the last
        frame's depth (UpdateLastFrame, src/Tracking.cc:814-878)."""
        self.only_tracking = on
        if not on:
            self.vo = False
            self.last_vo_pw = None
            self.last_vo_mask = None

    def _track_localization_only(self, feats, q_pred, t_pred):
        sh = self.shared
        F = self.cfg.caps.max_features
        if self.last_vo_pw is None:
            self.last_vo_pw = jnp.zeros((F, 3), jnp.float32)
            self.last_vo_mask = jnp.zeros((F,), bool)
        tr = steps.track_motion_model_vo_step(
            sh.state, feats, self.last_feats, self.last_frame_mp,
            self.last_vo_pw, self.last_vo_mask, q_pred, t_pred, self.cfg)
        if int(tr.n_inliers) < self.cfg.tracking.min_matches_motion_model:
            tr = steps.track_motion_model_vo_step(
                sh.state, feats, self.last_feats, self.last_frame_mp,
                self.last_vo_pw, self.last_vo_mask, q_pred, t_pred, self.cfg,
                radius_mult=2.0)
        ok = int(tr.n_inliers) >= 10  # reference: >=20 incl. VO (:915 uses 20)
        # mbVO: fewer than 10 matches to real map points (:371, :929-931)
        self.vo = int(tr.n_map_inliers) < 10
        frame_mp = tr.frame_mp
        q_cur, t_cur = tr.q, tr.t
        if ok and not self.vo:
            tr2, new_state = steps.track_local_map_step(
                sh.state, feats, tr.q, tr.t, tr.frame_mp, self.ref_kf,
                self.cfg)
            sh.state = new_state
            if int(tr2.n_inliers) >= \
                    self.cfg.tracking.min_inliers_track_local_map:
                q_cur, t_cur, frame_mp = tr2.q, tr2.t, tr2.frame_mp
            else:
                ok = False

        if not ok:
            self.state = TrackerState.LOST
            self.last_q, self.last_t = q_pred, t_pred
            self.last_feats = feats
            self.last_frame_mp = jnp.full((F,), ms.NONE, jnp.int32)
            self.last_vo_pw = None
            self.last_vo_mask = None
            self._record(lost=True)
            return None

        self.state = TrackerState.OK
        if self.last_q is not None:
            self.vel_q, self.vel_t = se3.relative(q_cur, t_cur, self.last_q,
                                                  self.last_t)
            self.has_velocity = True
        self.last_q, self.last_t = q_cur, t_cur
        self.last_feats = feats
        self.last_frame_mp = frame_mp
        if self.cfg.sensor != Sensor.MONOCULAR:
            self.last_vo_pw, self.last_vo_mask = steps.make_vo_points(
                sh.state, feats, frame_mp, q_cur, t_cur, self.cfg)
        self._record(lost=False)
        return self.last_q, self.last_t

    # -- internals ---------------------------------------------------------

    def _initialize(self, feats) -> bool:
        if self.cfg.sensor == Sensor.MONOCULAR:
            return self._initialize_mono(feats)
        # reference requires 500 keypoints (src/Tracking.cc:523); scaled-down
        # test scenes use smaller budgets, so gate on usable depth instead
        n_depth = int(jnp.sum(feats.valid & (feats.depth > 0)))
        if n_depth < 100:
            return False
        sh = self.shared
        kf_slot = sh.alloc_kf()
        sh.state, frame_mp, n_new = steps.stereo_init_step(
            sh.state, feats, self.frame_id, self.agent, self.map_id,
            kf_slot, sh.mp_base(), self.cfg)
        sh.commit_mp(int(n_new))
        self.state = TrackerState.OK
        self.last_q = jnp.array([1.0, 0.0, 0.0, 0.0])
        self.last_t = jnp.zeros(3)
        self.last_feats = feats
        self.last_frame_mp = frame_mp
        self.ref_kf = kf_slot
        self.last_kf_frame = self.frame_id
        self.new_kf_slots.append(kf_slot)
        return True

    def _initialize_mono(self, feats) -> bool:
        """Two-view monocular bootstrap (MonocularInitialization
        src/Tracking.cc:576-648 + SearchForInitialization
        src/ORBmatcher.cc:407): windowed matching to a stored reference
        frame, H/F RANSAC, initial map with median-depth normalization."""
        from ..geometry import twoview
        from ..ops import matchers
        import jax

        n_feat = int(jnp.sum(feats.valid))
        ref = getattr(self, "mono_init_ref", None)
        if ref is None or n_feat < 100:
            if n_feat >= 100:
                self.mono_init_ref = (feats, self.frame_id)
            return False
        ref_feats, ref_frame_id = ref

        res = matchers.match_window(
            feats, ref_feats.desc, ref_feats.valid, ref_feats.xy,
            radius=100.0, th=self.cfg.matcher.th_low, nn_ratio=0.9)
        frame_assign, res = matchers.resolve_conflicts(
            res, self.cfg.caps.max_features)
        n_matches = int(jnp.sum(res.ok))
        if n_matches < 100:
            self.mono_init_ref = (feats, self.frame_id)  # reset (reference)
            return False

        F = self.cfg.caps.max_features
        ok = res.ok
        cur_idx = jnp.clip(res.best_feat, 0, F - 1)
        x1 = ref_feats.xy
        x2 = feats.xy[cur_idx]
        tv = twoview.initialize_two_view(
            x1, x2, ok, self.cfg.camera,
            jax.random.PRNGKey(self.frame_id))
        if not bool(tv.ok):
            return False

        sh = self.shared
        kf0 = sh.alloc_kf()
        kf1 = sh.alloc_kf()
        tri_ok = tv.inliers & ok
        sh.state, frame_mp, scale, n_pts = steps.mono_init_map_step(
            sh.state, ref_feats, feats, tv.q, tv.t, tv.points, tri_ok,
            jnp.arange(F, dtype=jnp.int32), cur_idx,
            ref_frame_id, self.frame_id, self.agent, self.map_id,
            kf0, kf1, sh.mp_base(), self.cfg)
        sh.commit_mp(int(n_pts))
        if int(n_pts) < 80:
            return False

        # initial global BA (reference: 20 iterations, src/Tracking.cc:699)
        from . import loop_closing as lc
        sh.state = lc.global_bundle_adjustment(sh.state, self.cfg, n_iters=20)

        self.state = TrackerState.OK
        self.last_q = sh.state.kf_q[kf1]
        self.last_t = sh.state.kf_t[kf1]
        self.last_feats = feats
        self.last_frame_mp = sh.state.kf_mp[kf1]
        self.ref_kf = kf1
        self.last_kf_frame = self.frame_id
        self.new_kf_slots += [kf0, kf1]
        self.mono_init_ref = None
        return True

    def _predict_pose(self):
        if self.has_velocity:
            return se3.compose(self.vel_q, self.vel_t, self.last_q, self.last_t)
        return self.last_q, self.last_t

    def _need_new_keyframe(self, feats, tr) -> bool:
        """Reference NeedNewKeyFrame (src/Tracking.cc:990-1074), without the
        mapping-idle conditions (phases are synchronous here). All device
        counters come pre-packed in the track_frame_step decision vector
        ([ok, n_inliers, tracked_close, untracked_close, ref_kf_matches]) —
        no extra device reads here."""
        tcfg = self.cfg.tracking
        frames_since = self.frame_id - self.last_kf_frame
        dec = getattr(self, "_last_decision", None)
        if dec is not None:
            n_in = int(dec[1])
            tracked_close = int(dec[2])
            untracked_close = int(dec[3])
            ref_matches = int(dec[4])
        else:
            # relocalization re-entry path: counters from the frame arrays
            n_in = int(tr.n_inliers)
            close_th = tcfg.th_depth * self.cfg.camera.baseline
            depth = np.asarray(feats.depth)
            valid = np.asarray(feats.valid)
            tracked = np.asarray(tr.frame_mp) >= 0
            close = valid & (depth > 0) & (depth < close_th)
            tracked_close = int((close & tracked).sum())
            untracked_close = int((close & ~tracked).sum())
            ref_matches = self._ref_kf_matches()
        need_close = tracked_close < 100 and untracked_close > 70

        c1a = frames_since >= tcfg.max_frames_between_kf
        c1c = self.cfg.sensor != Sensor.MONOCULAR and \
            (n_in < ref_matches * 0.25 or need_close)
        c2 = (n_in < ref_matches * 0.75 or need_close) and n_in > 15
        return bool(c1a or ((c1c or frames_since >= tcfg.min_frames_between_kf)
                            and c2))

    def _ref_kf_matches(self) -> int:
        """Tracked-point count of the reference KF (min obs 3 as the
        reference uses once >2 KFs exist)."""
        st = self.shared.state
        kf_mp = np.asarray(st.kf_mp[self.ref_kf])
        valid = kf_mp >= 0
        if self.shared.n_kf <= 2:
            return int(valid.sum())
        n_obs = np.asarray(st.mp_n_obs())[np.clip(kf_mp, 0, len(st.mp_valid) - 1)]
        return int((valid & (n_obs >= 3)).sum())

    def _create_keyframe(self, feats, tr):
        """KF insert + triangulation + local mapping + local BA + culling in
        ONE jitted dispatch (steps.keyframe_pipeline_step — the reference's
        LocalMapping iteration, SURVEY.md §3.3) with exactly two device
        fetches: the new-point count and the cull report."""
        sh = self.shared
        kf_slot = sh.alloc_kf()
        run_ba = bool(self.run_local_ba and sh.n_kf >= 3)
        (sh.state, frame_mp, q_kf, t_kf, n_new,
         cull_vec) = steps.keyframe_pipeline_step(
            sh.state, feats, tr.q, tr.t, tr.frame_mp, self.frame_id,
            self.agent, self.map_id, kf_slot, sh.mp_base(), self.cfg,
            run_ba)
        n_comp = sh.n_compactions
        sh.commit_mp(int(n_new))
        if sh.n_compactions != n_comp:
            # commit triggered a point compaction, which permuted every
            # point slot; the frame_mp row fetched from the PRE-compaction
            # state would feed stale ids into the next frame's motion model
            # (observed: a total matching wipeout every ~33 frames on the
            # tight-capacity lifecycle test)
            frame_mp = sh.state.kf_mp[kf_slot]
        self.ref_kf = kf_slot
        self.last_kf_frame = self.frame_id
        self.new_kf_slots.append(kf_slot)
        if run_ba:
            cull = np.asarray(cull_vec)
            for row in cull:
                slot = int(row[0])
                if slot < 0:
                    continue
                parent = int(row[1])
                self.culled_kf_slots.append(slot)
                sh.note_culled(slot, parent if parent >= 0 else None,
                               row[2:6].copy(), row[6:9].copy())
        return frame_mp, q_kf, t_kf

    def _record(self, lost: bool):
        """Append the per-frame trajectory record with ONE device fetch.

        Separate np.asarray calls for q/t/ref_q/ref_t each cost a full
        device round trip (~24 ms on a tunneled runtime) — batched into a
        single [14] snapshot they cost one."""
        ref_uid = -1
        has_q = self.last_q is not None
        if self.ref_kf >= 0:
            st = self.shared.state
            ref_uid = int(self.shared.kf_uid[self.ref_kf])
            snap = np.asarray(jnp.concatenate([
                jnp.asarray(self.last_q) if has_q else jnp.array(
                    [1.0, 0, 0, 0]),
                jnp.asarray(self.last_t) if has_q else jnp.zeros(3),
                st.kf_q[self.ref_kf], st.kf_t[self.ref_kf]]))
            q, t = snap[:4], snap[4:7]
            ref_q, ref_t = snap[7:11], snap[11:14]
        else:
            if has_q:
                snap = np.asarray(jnp.concatenate([
                    jnp.asarray(self.last_q), jnp.asarray(self.last_t)]))
                q, t = snap[:4], snap[4:7]
            else:
                q, t = np.array([1.0, 0, 0, 0]), np.zeros(3)
            ref_q = ref_t = None
        self.trajectory.append(FrameRecord(
            frame_id=self.frame_id, q=q, t=t,
            lost=lost, ref_kf=self.ref_kf, ref_uid=ref_uid,
            ref_q=ref_q, ref_t=ref_t))

    def reset(self):
        """Tracking::Reset (src/Tracking.cc:1522-1572): drop this agent's
        map content and restart from NOT_INITIALIZED. In the shared-state
        design this invalidates the agent's keyframes/points in place (the
        server-side database erasure rides culled_kf_slots)."""
        sh = self.shared
        st = sh.state
        mine_kf = (st.kf_agent == self.agent) & st.kf_valid
        mine_mp = (st.mp_agent == self.agent) & st.mp_valid
        for k in np.nonzero(np.asarray(mine_kf))[0]:
            self.culled_kf_slots.append(int(k))
            sh.note_invalidated(int(k))
        st = st._replace(
            kf_valid=st.kf_valid & ~mine_kf,
            kf_feat_valid=jnp.where(mine_kf[:, None], False,
                                    st.kf_feat_valid),
            kf_mp=jnp.where(mine_kf[:, None], ms.NONE, st.kf_mp),
            mp_valid=st.mp_valid & ~mine_mp)
        from . import mapping
        st = mapping.rebuild_observations(st)
        st = steps.recompute_covisibility(st)
        sh.state = st
        # pre-reset frame records are unrecoverable: their reference
        # keyframes were just invalidated, so export would fall back to raw
        # track-time poses in the DISCARDED map's local frame — mixed into
        # the post-reset (and later Sim3-fused) frame they corrupt the
        # whole trajectory evaluation (measured: split agent0 ATE 2.1 m
        # from exactly this). The reference clears its per-frame lists on
        # reset (src/Tracking.cc:1522-1572), i.e. those frames simply drop
        # out of the export; marking them lost is the same semantics.
        for rec in self.trajectory:
            rec.lost = True
        self.last_q = None
        self.last_t = None
        self.last_feats = None
        self.last_frame_mp = None
        self.has_velocity = False
        self.ref_kf = -1
        self.mono_init_ref = None
        self.new_kf_slots.clear()
        if self.on_reset is not None:
            self.on_reset(self)

    # -- trajectory export (System::SaveTrajectory*, src/System.cc:390-540) --

    def export_poses(self):
        """Re-chained camera poses for every recorded frame.

        Mirrors SaveTrajectoryTUM/KITTI (src/System.cc:390-448, :487-540):
        each frame's pose is its track-time pose RELATIVE to its reference
        keyframe, re-anchored on that keyframe's CURRENT (loop-corrected /
        GBA-corrected) pose; if the reference keyframe was culled, the
        relative pose is chained through the spanning tree via the mTcp
        snapshots taken at cull time. Chains are keyed by keyframe UID, not
        slot — slots are recycled, so a slot-keyed walk could silently
        anchor on an unrelated newer keyframe.
        Returns [(frame_id, lost, q_cw, t_cw)].
        """
        sh = self.shared
        st = sh.state
        kf_valid = np.asarray(st.kf_valid)
        kf_q = np.asarray(st.kf_q)
        kf_t = np.asarray(st.kf_t)
        cull_info = sh.cull_info
        out = []
        # frames whose reference-KF chain dead-ends (culled without a
        # cull_info entry, e.g. reset) fall back to raw track-time poses;
        # counted so silently-degraded exports are visible
        self.export_fallbacks = 0
        for rec in self.trajectory:
            q_cw, t_cw = rec.q, rec.t
            if rec.ref_kf >= 0 and rec.ref_q is not None:
                # T_frame<-ref at track time
                rel_q, rel_t = _np_relative(rec.q, rec.t, rec.ref_q, rec.ref_t)
                uid = rec.ref_uid
                ok = True
                # chain through culled reference keyframes (KeyFrame::mTcp)
                while uid not in sh.uid_slot:
                    info = cull_info.get(uid)
                    if info is None:
                        ok = False
                        self.export_fallbacks += 1
                        break
                    parent_uid, cq, ct = info
                    rel_q, rel_t = _np_compose(rel_q, rel_t, cq, ct)
                    uid = parent_uid
                if ok:
                    k = sh.uid_slot[uid]
                    if kf_valid[k]:
                        q_cw, t_cw = _np_compose(rel_q, rel_t, kf_q[k],
                                                 kf_t[k])
                    else:
                        self.export_fallbacks += 1
            out.append((rec.frame_id, rec.lost, q_cw, t_cw))
        return out

    def trajectory_tum(self, timestamps=None):
        """TUM format rows: t tx ty tz qx qy qz qw (camera-to-world).
        Lost frames are skipped as in the reference (src/System.cc:417)."""
        rows = []
        for frame_id, lost, q_cw_, t_cw_ in self.export_poses():
            if lost:
                continue
            ts = (timestamps[frame_id] if timestamps is not None
                  and 0 <= frame_id < len(timestamps) else float(frame_id))
            q_wc, t_wc = _np_inverse(_np_normalize(q_cw_), t_cw_)
            rows.append((ts, *t_wc, q_wc[1], q_wc[2], q_wc[3], q_wc[0]))
        return rows


# -- tiny numpy SE3 helpers (export-time; no device round trips) ------------

def _np_normalize(q):
    q = np.asarray(q, np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    return -q if q[0] < 0 else q


def _np_qmul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                     w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                     w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                     w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def _np_qrot(q, v):
    uv = np.cross(q[1:], v)
    uuv = np.cross(q[1:], uv)
    return np.asarray(v) + 2.0 * (q[0] * uv + uuv)


def _np_compose(qa, ta, qb, tb):
    """T_a * T_b."""
    return _np_normalize(_np_qmul(qa, qb)), _np_qrot(qa, np.asarray(tb)) + ta


def _np_inverse(q, t):
    qi = np.array([q[0], -q[1], -q[2], -q[3]])
    return qi, -_np_qrot(qi, np.asarray(t))


def _np_relative(qa, ta, qb, tb):
    """T_a * T_b^-1."""
    qbi, tbi = _np_inverse(np.asarray(qb, np.float64),
                           np.asarray(tb, np.float64))
    return _np_compose(np.asarray(qa, np.float64),
                       np.asarray(ta, np.float64), qbi, tbi)
