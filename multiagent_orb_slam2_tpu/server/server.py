"""MultiAgentServer: central fusion service coordinating N agents.

Replaces MultiAgentServer (reference src/MultiAgentServer.cc) + the MapFusion
thread loop (src/MapFusion.cc:51-81). Owns the global vocabulary + global
keyframe database + the MultiMap registry; receives every keyframe that did
not close an intra-map loop (reference src/LoopClosing.cc:82-95) and runs the
fusion pipeline: cross-map candidate detection -> Sim3 verification ->
FuseMaps -> covisibility discovery -> global BA.

All agents share one SharedMap (see server/__init__); the reference's
stop/release choreography and its per-agent KFDB swap after fusion
(src/MapFusion.cc:706-715) reduce to synchronous phase ordering and the
global database already covering every keyframe.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..mapstate import state as ms
from ..runtime import loop_closing as lc
from ..runtime import reloc as reloc_mod
from ..runtime.tracker import SharedMap, Tracker, TrackerState
from ..utils import diag
from ..vocab import bow as bow_mod
from ..vocab import kfdb as kfdb_mod
from . import fusion
from .multimap import MultiMap


class MultiAgentServer:
    def __init__(self, cfg: SlamConfig, vocab: bow_mod.Vocabulary,
                 run_gba: bool = True):
        self.cfg = cfg
        self.vocab = vocab
        self.shared = SharedMap(cfg)
        self.multimap = MultiMap()
        self.db = kfdb_mod.empty_database(cfg.caps.max_keyframes, vocab)
        self.consistency: dict[int, list] = {}   # per-agent groups
        self.run_gba = run_gba
        self.trackers: dict[int, Tracker] = {}
        self.loop_closers: dict[int, lc.LoopCloser] = {}
        self.stats: list[dict] = []              # MAP_FUSION_STATS equivalent
        self.n_relocalizations = 0

    # -- registration (reference RegisterClient/RegisterServer) ------------

    def register_client(self, agent: int) -> Tracker:
        map_id = agent  # each agent starts on its own logical map
        tracker = Tracker(self.cfg, self.shared, agent=agent, map_id=map_id)
        self.trackers[agent] = tracker
        self.loop_closers[agent] = lc.LoopCloser(self.cfg, self.vocab)
        self.multimap.add(agent, map_id)
        self.consistency[agent] = []
        tracker.on_reset = self._handle_reset
        return tracker

    def _handle_reset(self, tracker: Tracker):
        """A reset agent restarts on a FRESH logical map: its new keyframes
        begin at an identity origin unrelated to the (possibly merged) old
        map's world frame, so they must re-enter through the Sim3 fusion
        pipeline (the reference's Reset cascade deletes the agent's
        keyframes from the server database and restarts mapping,
        src/Tracking.cc:1522-1572)."""
        new_id = max(self.multimap.map_of_agent.values(), default=-1) + 1
        self.multimap.add(tracker.agent, new_id)
        tracker.map_id = new_id
        self.consistency[tracker.agent] = []
        self.loop_closers[tracker.agent].consistency.groups = []

    # -- per-keyframe processing (the MapFusion::Run loop) -----------------

    def maybe_relocalize(self, agent: int) -> bool:
        """Relocalize a lost tracker against the global database, scoped to
        its own map (the reference runs Relocalization inside every agent's
        Tracking thread, src/Tracking.cc:331 + :1359-1520 — without this the
        split agents dead-reckon forever after a hard segment)."""
        tracker = self.trackers[agent]
        if tracker.state != TrackerState.LOST or tracker.last_feats is None:
            return False
        ok = reloc_mod.relocalize(tracker, self.db, self.vocab,
                                  tracker.last_feats, self.cfg,
                                  map_id=self.multimap.map_of(agent))
        if ok:
            self.n_relocalizations += 1
        return ok

    def process_new_keyframes(self):
        """Drain every tracker's new-KF queue: relocalize lost trackers, run
        the agent's own loop closing; KFs that are not intra-map loops go to
        fusion detection (reference src/LoopClosing.cc:82-95)."""
        for agent in self.trackers:
            self.maybe_relocalize(agent)
        for agent, tracker in self.trackers.items():
            drained = False
            while tracker.culled_kf_slots:
                k = tracker.culled_kf_slots.pop(0)
                self.db = kfdb_mod.erase_keyframe(self.db, k)
                self.loop_closers[agent].db = kfdb_mod.erase_keyframe(
                    self.loop_closers[agent].db, k)
                drained = True
            if drained:
                self.shared.reclaim_slots()
            while tracker.new_kf_slots:
                kf_slot = tracker.new_kf_slots.pop(0)
                tracker.map_id = self.multimap.map_of(agent)
                lc_match = self.loop_closers[agent].process_keyframe(
                    self.shared, kf_slot)
                if lc_match is not None:
                    self.loop_closers[agent].correct_loop(
                        self.shared, lc_match, run_gba=self.run_gba)
                    continue
                self._insert_keyframe_fusion(agent, kf_slot)

    def _insert_keyframe_fusion(self, agent: int, kf_slot: int):
        """One MapFusion iteration for a queued keyframe: DB insert +
        candidate query as one jitted program, one mask fetch."""
        st = self.shared.state
        self.db, cand_mask, words, valid, vec = _fusion_detect_query(
            self.db, self.vocab, st, kf_slot)

        if self.multimap.n_maps < 2:
            return  # everything already fused

        cands = self._detect_fusion_candidates(agent, kf_slot, cand_mask,
                                               words, valid, vec)
        for c in cands:
            t0 = time.perf_counter()
            closer = self.loop_closers[agent]
            match = closer.compute_sim3(self.shared, kf_slot, c)
            sim3_ms = (time.perf_counter() - t0) * 1e3
            if match is None:
                continue
            self._fuse(agent, match, sim3_ms)
            return

    def _detect_fusion_candidates(self, agent, kf_slot, cand_mask, words,
                                  valid, vec):
        """DetectFusionCandidates (src/MapFusion.cc:96-237): global-database
        loop query, drop same-map candidates (:135-144), per-agent
        consistency groups >= 3 (:166-218)."""
        st = self.shared.state
        cur_map = self.multimap.map_of(agent)
        cand = np.nonzero(np.asarray(cand_mask))[0]
        kf_map = np.asarray(st.kf_map)
        cand_pre = [int(c) for c in cand]
        cand = [int(c) for c in cand if kf_map[c] != cur_map and kf_map[c] >= 0]
        # consistency groups, per agent (reference keys them per System)
        covis = np.asarray(st.covis)
        th = self.cfg.loop.consistency_th
        new_groups, enough, counts = [], [], []
        for c in cand:
            group = set(np.nonzero(covis[c] > 0)[0].tolist()) | {c}
            best = 0
            for (g, count) in self.consistency[agent]:
                if group & g:
                    best = max(best, count + 1)
            new_groups.append((group, best))
            counts.append(best)
            if best >= th:
                enough.append(c)
        self.consistency[agent] = new_groups
        if diag.recall_sink().enabled:
            dbq = kfdb_mod.erase_keyframe(self.db, kf_slot)
            diag.log_recall_query(
                "fusion", agent, kf_slot, int(st.kf_frame_id[kf_slot]),
                dbq, words, valid, vec, covis, kf_map, cur_map,
                cand_pre, enough, counts)
        if not cand:
            self.consistency[agent] = []
        return enough

    def _fuse(self, agent: int, match: lc.Sim3Match, sim3_ms: float):
        cfg = self.cfg
        st = self.shared.state
        cur_map = self.multimap.map_of(agent)
        dst_map = int(np.asarray(st.kf_map)[match.kf_match])

        moved = np.nonzero(np.asarray(st.kf_map) == cur_map)[0].tolist()
        # pre-fusion map sizes (reference stats columns ckf/cmp/mkf/mmp —
        # KF and MP counts of the current and matched maps at fusion time,
        # writers src/MapFusion.cc:728-733)
        kf_map = np.asarray(st.kf_map)
        mp_map = np.asarray(st.mp_map)
        kf_valid = np.asarray(st.kf_valid)
        mp_valid = np.asarray(st.mp_valid)
        cmp_ = int(((mp_map == cur_map) & mp_valid).sum())
        mkf = int(((kf_map == dst_map) & kf_valid).sum())
        mmp = int(((mp_map == dst_map) & mp_valid).sum())

        t0 = time.perf_counter()
        n_moved = fusion.merge_maps(self.shared, self.multimap, match,
                                    cur_map, dst_map, cfg,
                                    global_db=self.db, vocab=self.vocab)
        mf_ms = (time.perf_counter() - t0) * 1e3

        t0 = time.perf_counter()
        n_cd, cd_per_kf = fusion.covisibility_discovery(
            self.shared, self.db, self.vocab, moved, cfg)
        cd_ms = (time.perf_counter() - t0) * 1e3

        gba_ms = 0.0
        if self.run_gba:
            t0 = time.perf_counter()
            self.shared.state = lc.global_bundle_adjustment(self.shared.state,
                                                            cfg)
            gba_ms = (time.perf_counter() - t0) * 1e3

        # stats.csv schema equivalent (reference generic_split_seq.cc:140-144;
        # cd aggregate columns per src/MapFusion.cc:933-956)
        cd_arr = np.asarray(cd_per_kf) if cd_per_kf else np.zeros(1)
        self.stats.append(dict(
            sim3_ms=sim3_ms, mf_ms=mf_ms, ckf=n_moved, cmp=cmp_, mkf=mkf,
            mmp=mmp, cd_ms=cd_ms, cd_sum_ms=float(cd_arr.sum()),
            cd_mean_ms=float(cd_arr.mean()), cd_stdev_ms=float(cd_arr.std()),
            cd_med_ms=float(np.median(cd_arr)), n_cd=n_cd, gba_ms=gba_ms,
            cur_map=cur_map, dst_map=dst_map))

    # -- shutdown (reference Shutdown/ShutdownSystems) ---------------------

    def shutdown(self):
        self.process_new_keyframes()


@jax.jit
def _fusion_detect_query(db, vocab, st, kf_slot):
    """Global-DB insert + fusion candidate query as one program (the
    reference's mpKeyFrameDB->add + DetectLoopCandidates pair inside
    MapFusion, src/MapFusion.cc:96-237; no minScore gate — the fusion query
    relies on the consistency groups instead)."""
    valid = st.kf_feat_valid[kf_slot]
    db2, words, vec = kfdb_mod.add_keyframe(db, vocab, kf_slot,
                                            st.kf_desc[kf_slot], valid)
    dbq = kfdb_mod.erase_keyframe(db2, kf_slot)
    cand_mask, _ = kfdb_mod.detect_loop_candidates(
        dbq, vocab, words, valid, vec, st.covis[kf_slot], kf_slot,
        st.covis, None)
    return db2, cand_mask, words, valid, vec
