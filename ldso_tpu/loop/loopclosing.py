"""Loop detection + correction orchestrator.

Rebuild of the reference LoopClosing (src/frontend/LoopClosing.cc; SURVEY.md
§2 C26, §3.4): per new keyframe — BoW transform, database query with a
kfGap exclusion window and a 0.06 score gate, then the reference's
correction pipeline:
  1. SearchByBoW node-bucketed descriptor matching (FeatureMatcher.cc:66)
  2. PnP-RANSAC on candidate 3D (from feature invD) vs current 2D,
     seeding a scale-1 Sim(3) (LoopClosing.cc:202-240)
  3. ComputeOptimizedPose re-matching: candidate features projected
     through the seed into the current image, grid-window descriptor
     re-match gated by the window idepth map (LoopClosing.cc:271-405)
  4. Sim(3) GN with 3D-3D + 2D reprojection edges, inlier gating, second
     pass, scale sanity check (LoopClosing.cc:415-496)
  5. a loop `poseRel` edge with its 7x7 GN information + a pose-graph run

Design deviation (documented in PARITY.md): when the PnP seed fails, we
fall back to Umeyama RANSAC on mutual-depth 3D-3D matches — both sides
carry inverse depths in LDSO, so the 3D-3D seed directly observes scale;
the reference would simply fail the candidate.

The reference runs this on its own thread; in the synchronous pipeline it
runs inline after makeKeyFrame (the async wrapper lives in
ldso_tpu/system/pipeline.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldso_tpu.config import Config
from ldso_tpu.camera.calib import Calibration
from ldso_tpu.frontend import detector
from ldso_tpu.loop import posegraph
from ldso_tpu.loop.database import KeyframeDatabase
from ldso_tpu.loop.sim3_solver import refine_sim3, umeyama_ransac
from ldso_tpu.loop.vocab import Vocabulary
from ldso_tpu.slam_map import FrameShell, GlobalMap

MIN_BOW_MATCHES = 10    # nmatches gates (LoopClosing.cc:163,197,407)
MIN_PNP_INLIERS = 10    # cntInliers < 10 (LoopClosing.cc:226)
MIN_SIM3_INLIERS = 15   # inliers < 15 (LoopClosing.cc:479)
VOCAB_MIN_TRAIN_KFS = 8


class LoopClosing:
    def __init__(self, calib: Calibration, cfg: Config, global_map: GlobalMap,
                 vocab: Optional[Vocabulary] = None):
        self.calib = calib
        self.cfg = cfg
        self.global_map = global_map
        self.vocab = vocab
        self.db: Optional[KeyframeDatabase] = (
            KeyframeDatabase(vocab) if vocab is not None else None)
        self._pending_train: list = []
        self.key = jax.random.PRNGKey(cfg.seed)
        self.n_loops_closed = 0
        self.loop_pairs: list = []      # (kf_id, candidate_kf_id) per close
        self._db_order: list = []       # kf ids in database-insertion order
        self._db_ids: set = set()
        self.need_pose_graph = False

    # ---------------------------------------------------------------- records
    def make_kf_record(self, kf: FrameShell, pyr, point_uv_idepth: np.ndarray):
        """Detect ORB features on the keyframe and attach inverse depths from
        the window's active points (the reference's features carry invD from
        point activation, Feature.h:77-93; the 3-px nearest-point attach is
        the analogue of ComputeOptimizedPose's 1-px-dilated idepth map
        lookup, LoopClosing.cc:277-318,372-379)."""
        cfg = self.cfg
        feats = detector.detect_corners(pyr.dI[0], pyr.abs_grad[0],
                                        int(cfg.desired_immature_density))
        valid = np.asarray(feats["valid"] & feats["is_corner"])
        u = np.asarray(feats["u"])
        v = np.asarray(feats["v"])
        desc = np.asarray(feats["desc"])
        angle = np.asarray(feats["angle"])
        sel = np.nonzero(valid)[0]
        kf.feat_uv = np.stack([u[sel], v[sel]], 1)
        kf.feat_desc = desc[sel]
        kf.feat_angle = angle[sel].astype(np.float32)
        kf.feat_idepth = np.full(len(sel), -1.0, np.float32)
        # nearest active point within 1.5 px provides idepth (vectorized:
        # one kd-tree query over all features). The radius mirrors the
        # reference's 1-px-DILATED idepth map (LoopClosing.cc:277-318):
        # a wider attach (3 px was tried) borrows depths from points too
        # far off the feature's ray and inflates the loop Sim3 measurement
        # noise above the drift it is supposed to correct.
        if point_uv_idepth is not None and len(point_uv_idepth) \
                and len(sel):
            puv = point_uv_idepth[:, :2]
            pid = point_uv_idepth[:, 2]
            r = 1.5
            try:
                from scipy.spatial import cKDTree
                d, j = cKDTree(puv).query(kf.feat_uv,
                                          distance_upper_bound=r)
                found = np.isfinite(d)
                kf.feat_idepth[found] = pid[j[found]]
            except ImportError:
                d2 = ((puv[None, :, 0] - kf.feat_uv[:, 0:1]) ** 2
                      + (puv[None, :, 1] - kf.feat_uv[:, 1:2]) ** 2)
                j = np.argmin(d2, axis=1)
                found = d2[np.arange(len(sel)), j] < r * r
                kf.feat_idepth[found] = pid[j[found]]

    def _refresh_feat_depths(self, sh: FrameShell):
        """Attach depths to features that lacked one at record time from
        the keyframe's since-matured map points. The reference's
        Feature.invD fills at point ACTIVATION over the keyframe's life
        (Feature.h:77-93), long after the frame became a keyframe; our
        record snapshot only saw the window state at creation — measured
        on the 106-KF revisit head-to-head: out-leg kf 1 carried depth on
        65/898 features, starving the PnP seed (4-12 depth matches < the
        10-inlier gate) so zero loops closed. map_points (filled at point
        marginalization, the end of each point's maturation) are exactly
        the activated points hosted by this keyframe."""
        if (sh.feat_uv is None or sh.feat_idepth is None
                or not sh.map_points):
            return
        if getattr(sh, "_feat_depth_mp_n", -1) == len(sh.map_points):
            return
        sh._feat_depth_mp_n = len(sh.map_points)
        need = sh.feat_idepth <= 0
        if not need.any():
            return
        calib = self.calib
        fx, fy = calib.fx[0], calib.fy[0]
        cx, cy = calib.cx[0], calib.cy[0]
        pid = np.asarray([p.idepth for p in sh.map_points], np.float32)
        pu = np.asarray([p.u for p in sh.map_points], np.float32) * fx + cx
        pv = np.asarray([p.v for p in sh.map_points], np.float32) * fy + cy
        ok = pid > 0
        if not ok.any():
            return
        puv = np.stack([pu[ok], pv[ok]], 1)
        pid = pid[ok]
        uv = sh.feat_uv[need]
        r = 1.5                      # same radius as make_kf_record
        try:
            from scipy.spatial import cKDTree
            d, j = cKDTree(puv).query(uv, distance_upper_bound=r)
            found = np.isfinite(d)
        except ImportError:
            d2 = ((puv[None, :, 0] - uv[:, 0:1]) ** 2
                  + (puv[None, :, 1] - uv[:, 1:2]) ** 2)
            j = np.argmin(d2, axis=1)
            found = d2[np.arange(len(uv)), j] < r * r
        idx = np.nonzero(need)[0][found]
        sh.feat_idepth[idx] = pid[j[found]]

    def _ensure_vocab(self, kf: FrameShell):
        if self.vocab is not None:
            return True
        if kf.feat_desc is not None and len(kf.feat_desc):
            self._pending_train.append(kf.feat_desc)
        if len(self._pending_train) >= VOCAB_MIN_TRAIN_KFS:
            corpus = np.concatenate(self._pending_train, axis=0)
            self.vocab = Vocabulary.train(corpus, k=8, L=3,
                                          seed=self.cfg.seed)
            self.db = KeyframeDatabase(self.vocab)
            # backfill earlier keyframes
            for old in self.global_map.get_all_kfs():
                if old.feat_desc is not None and len(old.feat_desc):
                    self._add_to_db(old)
            return True
        return False

    def _compute_bow(self, kf: FrameShell):
        """ComputeBoW (Frame.cc:88-102): word ids for scoring + the
        FeatureVector node ids (levelsup=4) used by SearchByBoW. Does NOT
        add to the database — the reference adds selectively (see
        _detect_loop)."""
        wids = self.vocab.transform(jnp.asarray(kf.feat_desc),
                                    jnp.ones(len(kf.feat_desc), bool))
        kf.feat_word = np.asarray(wids, np.int32)
        kf.feat_node = self.vocab.node_ids(kf.feat_word, levelsup=4)
        kf.bow_vector = self.vocab.bow_vector(wids)

    def _add_to_db(self, kf: FrameShell):
        if kf.bow_vector is None:
            self._compute_bow(kf)
        if kf.kf_id in self._db_ids:
            return
        self.db.add(kf.kf_id, kf.bow_vector)
        self._db_order.append(kf.kf_id)
        self._db_ids.add(kf.kf_id)

    # ------------------------------------------------------------------ main
    def insert_keyframe(self, kf: FrameShell, window_kf_ids) -> bool:
        """Process one new keyframe; returns True if a loop was closed
        (LoopClosing::Run + DetectLoop + CorrectLoop, :38-269)."""
        if kf.feat_desc is None or len(kf.feat_desc) < 10:
            return False
        if not self._ensure_vocab(kf):
            return False
        if kf.bow_vector is None:
            self._compute_bow(kf)

        cand = self._detect_loop(kf, window_kf_ids)
        if cand is None:
            return False
        ok = self._correct_loop(kf, cand)
        if ok:
            self.n_loops_closed += 1
            self.need_pose_graph = True
            self.loop_pairs.append((kf.kf_id, cand.kf_id))
            # same shape as the reference's "Loop detected from kf X to Y"
            # (LoopClosing.cc) so harnesses can diff the pair lists
            print(f"loop closed: kf {kf.kf_id} -> {cand.kf_id}", flush=True)
        return ok

    def run_pose_graph_if_needed(self):
        if self.need_pose_graph:
            posegraph.run_pose_graph(self.global_map)
            self.need_pose_graph = False
            return True
        return False

    def _detect_loop(self, kf: FrameShell, window_kf_ids) -> Optional[FrameShell]:
        """DetectLoop (:95-143), faithful gate semantics:

        * the query excludes the last kfGap DATABASE-ADDED entries (the
          reference passes max_id = maxKFId - kfGap to Database::query);
        * a candidate inside the [min, max] kf-id RANGE of the current
          keyframe's covisibility-connected frames is rejected, and the
          frame is NOT added to the database on that path;
        * the score threshold does NOT reject the candidate — it only
          decides whether the current frame enters the database: frames
          whose best match already scores >= minScoreAccept are NOT added
          (":don't add into database"). On a revisit this means the
          return leg never enters the database, so loops can only close
          against genuinely novel (out-leg) views — without this policy
          a dense keyframe cadence closes temporally-adjacent same-leg
          "loops" with degenerate baselines (measured: 34 bogus edges,
          741 mm post-PGO ATE on the 106-KF revisit head-to-head).
          The geometric gates in _correct_loop do the real rejection."""
        import os
        dbg = os.environ.get("LDSO_TPU_DEBUG_LOOP")
        cfg = self.cfg
        exclude = set(self._db_order[-cfg.loop_kf_gap:]) if cfg.loop_kf_gap \
            else set()
        exclude.add(kf.kf_id)
        results = self.db.query(kf.bow_vector, exclude)
        if not results:
            self._add_to_db(kf)
            if dbg:
                print(f"[loop] kf {kf.kf_id}: no candidates, added to db "
                      f"(db={len(self._db_order)})", flush=True)
            return None
        best_id, best_score = results[0]
        cand = self.global_map.keyframes.get(best_id)
        # covisibility-window range exclusion (GetConnectedKeyFrames)
        connected = set(window_kf_ids) | set(kf.pose_rel.keys())
        connected.discard(kf.kf_id)
        if connected and min(connected) <= best_id <= max(connected):
            if dbg:
                print(f"[loop] kf {kf.kf_id}: cand {best_id} "
                      f"(score {best_score:.3f}) inside connected range "
                      f"[{min(connected)}, {max(connected)}]", flush=True)
            return None
        if best_score < cfg.loop_score_th:
            self._add_to_db(kf)
        if dbg:
            print(f"[loop] kf {kf.kf_id}: cand {best_id} score "
                  f"{best_score:.3f} -> correct_loop "
                  f"(db={len(self._db_order)})", flush=True)
        return cand

    @staticmethod
    def _pad_pow2(n: int, lo: int = 64) -> int:
        return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))

    def _backproject(self, uv, idepth):
        calib = self.calib
        fx, fy = calib.fx[0], calib.fy[0]
        cx, cy = calib.cx[0], calib.cy[0]
        z = 1.0 / np.maximum(idepth, 1e-6)
        return np.stack([(uv[:, 0] - cx) / fx * z,
                         (uv[:, 1] - cy) / fy * z, z], 1)

    def _seed_pnp(self, kf: FrameShell, cand: FrameShell,
                  mi: np.ndarray, mj: np.ndarray):
        """PnP-RANSAC seed from candidate 3D (feature invD backprojection,
        LoopClosing.cc:185-189) vs current 2D pixels (:202-229). Returns a
        scale-1 Sim(3) (cand cam -> cur cam, :235-240) or None."""
        calib = self.calib
        K = (calib.fx[0], calib.fy[0], calib.cx[0], calib.cy[0])
        import os
        has3d = cand.feat_idepth[mj] > 0
        if os.environ.get("LDSO_TPU_DEBUG_LOOP"):
            print(f"[loop] seed_pnp {kf.kf_id}->{cand.kf_id}: "
                  f"{int(has3d.sum())}/{len(mj)} matches with cand depth "
                  f"(cand feats with depth: "
                  f"{int((cand.feat_idepth > 0).sum())}/"
                  f"{len(cand.feat_idepth)})", flush=True)
        if has3d.sum() < MIN_PNP_INLIERS:
            return None
        X = self._backproject(cand.feat_uv[mj], cand.feat_idepth[mj])
        uv = kf.feat_uv[mi].astype(np.float32)
        n = len(mi)
        nb = self._pad_pow2(n)
        Xp = np.concatenate([X.astype(np.float32),
                             np.zeros((nb - n, 3), np.float32)])
        uvp = np.concatenate([uv, np.zeros((nb - n, 2), np.float32)])
        vp = np.concatenate([has3d, np.zeros(nb - n, bool)])
        self.key, sub = jax.random.split(self.key)
        from ldso_tpu.loop.pnp import pnp_ransac
        from ldso_tpu.utils.transfer import device_get
        # 8 px inlier radius, as cv::solvePnPRansac(..., 8.0, ...) (:209)
        T, inl, n_inl = pnp_ransac(jnp.asarray(Xp), jnp.asarray(uvp),
                                   jnp.asarray(vp), K, sub, inlier_px=8.0)
        n_inl_h = int(device_get(n_inl))
        if os.environ.get("LDSO_TPU_DEBUG_LOOP"):
            print(f"[loop] seed_pnp {kf.kf_id}->{cand.kf_id}: ransac "
                  f"inliers {n_inl_h}", flush=True)
        if n_inl_h < MIN_PNP_INLIERS:
            return None
        S = np.asarray(T, np.float64)
        if not np.isfinite(S).all():
            return None
        return S    # rotation part is orthonormal -> Sim3 with scale 1

    def _seed_umeyama(self, kf: FrameShell, cand: FrameShell,
                      mi: np.ndarray, mj: np.ndarray):
        """Fallback seed: Umeyama RANSAC on mutual-depth 3D-3D matches.
        DEVIATION from the reference (which fails the candidate when PnP
        fails): both frames carry inverse depths in LDSO, so 3D-3D
        alignment observes scale directly and rescues candidates whose 2D
        spread is too degenerate for DLT-PnP."""
        id_cur = kf.feat_idepth[mi]
        id_cand = cand.feat_idepth[mj]
        has3d = (id_cur > 0) & (id_cand > 0)
        if has3d.sum() < MIN_PNP_INLIERS:
            return None
        P_cand = self._backproject(cand.feat_uv[mj], id_cand)
        P_cur = self._backproject(kf.feat_uv[mi], id_cur)
        n = len(mi)
        nb = self._pad_pow2(n)
        padP = np.zeros((nb - n, 3), np.float32)
        P_cand_p = np.concatenate([P_cand.astype(np.float32), padP])
        P_cur_p = np.concatenate([P_cur.astype(np.float32), padP + 1.0])
        has3d_p = np.concatenate([has3d, np.zeros(nb - n, bool)])
        self.key, sub = jax.random.split(self.key)
        S0, _, n_inl = umeyama_ransac(
            jnp.asarray(P_cand_p), jnp.asarray(P_cur_p),
            jnp.asarray(has3d_p), sub)
        from ldso_tpu.utils.transfer import device_get
        if int(device_get(n_inl)) < MIN_PNP_INLIERS:
            return None
        S = np.asarray(S0, np.float64)
        return S if np.isfinite(S).all() else None

    def _correct_loop(self, kf: FrameShell, cand: FrameShell) -> bool:
        """SearchByBoW -> PnP seed -> projection re-match -> Sim3 GN ->
        install poseRel edge (CorrectLoop + ComputeOptimizedPose,
        LoopClosing.cc:145-496)."""
        from ldso_tpu.loop import matcher
        calib = self.calib
        fx, fy = calib.fx[0], calib.fy[0]
        cx, cy = calib.cx[0], calib.cy[0]
        # the candidate's features gained depths as its points matured
        self._refresh_feat_depths(cand)
        # records saved by older snapshots may lack orientations — degrade
        # to a no-op rotation check rather than fail the candidate
        for sh in (kf, cand):
            if sh.feat_angle is None and sh.feat_uv is not None:
                sh.feat_angle = np.zeros(len(sh.feat_uv), np.float32)

        # 1. node-bucketed descriptor matching (SearchByBoW,
        #    FeatureMatcher.cc:66-124; nnRatio=0.75 per CorrectLoop :148)
        import os
        dbg = os.environ.get("LDSO_TPU_DEBUG_LOOP")
        match = matcher.search_by_bow(kf.feat_desc, kf.feat_node,
                                      cand.feat_desc, cand.feat_node)
        mi = np.nonzero(match >= 0)[0]
        if len(mi) < MIN_BOW_MATCHES:       # nmatches < 10 (:163)
            if dbg:
                print(f"[loop] correct {kf.kf_id}->{cand.kf_id}: "
                      f"bow matches {len(mi)} < {MIN_BOW_MATCHES}", flush=True)
            return False
        mj = match[mi]

        # 2. seed Sim(3): PnP-RANSAC first (reference), 3D-3D fallback
        S0 = self._seed_pnp(kf, cand, mi, mj)
        if S0 is None:
            S0 = self._seed_umeyama(kf, cand, mi, mj)
        if S0 is None:
            if dbg:
                print(f"[loop] correct {kf.kf_id}->{cand.kf_id}: no seed "
                      f"({len(mi)} bow matches)", flush=True)
            return False

        # 3. ComputeOptimizedPose re-matching (:271-405): project EVERY
        #    candidate feature with known depth through the seed into the
        #    current image and re-match in a 5-px window; matched current
        #    features must carry window idepth (the idepth-map gate)
        ci = np.nonzero(cand.feat_idepth > 0)[0]
        if len(ci) == 0:
            return False
        P_ref = self._backproject(cand.feat_uv[ci], cand.feat_idepth[ci])
        pmatch = matcher.search_by_projection(
            P_ref, cand.feat_desc[ci], cand.feat_angle[ci], S0,
            kf.feat_uv, kf.feat_desc, kf.feat_angle, kf.feat_idepth,
            (fx, fy, cx, cy), window_size=5.0)
        pm = pmatch >= 0
        if pm.sum() < MIN_BOW_MATCHES:      # nmatches < 10 (:407)
            if dbg:
                print(f"[loop] correct {kf.kf_id}->{cand.kf_id}: projection "
                      f"re-match {int(pm.sum())} < {MIN_BOW_MATCHES}",
                      flush=True)
            return False
        j = pmatch[pm]
        P_ref_m = P_ref[pm]                              # candidate frame 3D
        uv_m = kf.feat_uv[j].astype(np.float32)          # current pixels
        P_cur_m = self._backproject(kf.feat_uv[j], kf.feat_idepth[j])

        # 4. Sim(3) GN: per match BOTH a 3D-3D edge (EdgePointSim3) and a
        #    2D reprojection edge (EdgeProjectPoseOnlySim3), Huber, 10
        #    iterations; gate 3D inliers >= 15; 10 more on inliers only
        #    (LoopClosing.cc:415-489)
        n = int(pm.sum())
        nb = self._pad_pow2(n)
        padP = np.zeros((nb - n, 3), np.float32)
        P_ref_p = np.concatenate([P_ref_m.astype(np.float32), padP])
        P_cur_p = np.concatenate([P_cur_m.astype(np.float32), padP + 1.0])
        uv_p = np.concatenate([uv_m, np.zeros((nb - n, 2), np.float32)])
        m_p = np.concatenate([np.ones(n, np.float32),
                              np.zeros(nb - n, np.float32)])
        from ldso_tpu.utils.transfer import device_get
        S0j = jnp.asarray(S0, jnp.float32)
        S1, _, inl2d, inl3d = refine_sim3(
            S0j, jnp.asarray(P_ref_p), jnp.asarray(uv_p), jnp.asarray(m_p),
            jnp.asarray(P_ref_p), jnp.asarray(P_cur_p), jnp.asarray(m_p),
            (fx, fy, cx, cy), iterations=10)
        inl3d_np = np.asarray(device_get(inl3d))
        if int(inl3d_np.sum()) < MIN_SIM3_INLIERS:   # inliers < 15 (:479)
            if dbg:
                print(f"[loop] correct {kf.kf_id}->{cand.kf_id}: sim3 "
                      f"inliers {int(inl3d_np.sum())} < {MIN_SIM3_INLIERS}",
                      flush=True)
            return False
        m2 = (m_p * inl3d_np).astype(np.float32)
        S, H, inl2d2, inl3d2 = refine_sim3(
            S1, jnp.asarray(P_ref_p), jnp.asarray(uv_p), jnp.asarray(m2),
            jnp.asarray(P_ref_p), jnp.asarray(P_cur_p), jnp.asarray(m2),
            (fx, fy, cx, cy), iterations=10)

        S_cur_cand = np.asarray(S, np.float64)   # maps candidate cam -> cur
        # scale sanity (LoopClosing.cc:488): nan / negative => failed opt
        from ldso_tpu.math import lie
        s = float(lie.sim3_scale(jnp.asarray(S_cur_cand)))
        if not np.isfinite(s) or s <= 0 or not np.isfinite(S_cur_cand).all():
            return False
        info = np.asarray(H, np.float64)
        # condition the information a bit (g2o receives the raw Hessian too)
        info = 0.5 * (info + info.T)
        # install the loop edge: pose_rel holds S_this_other = S_cur_cand
        kf.add_pose_rel(cand.kf_id, S_cur_cand, info=info, is_loop=True)
        return True
