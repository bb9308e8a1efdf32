"""Loop detection + correction orchestrator.

Rebuild of the reference LoopClosing (src/frontend/LoopClosing.cc; SURVEY.md
§2 C26, §3.4): per new keyframe — BoW transform, database query with a
kfGap exclusion window and a 0.06 score gate, descriptor matching against
the candidate, Sim(3) estimation (here: Umeyama RANSAC on 3D-3D matches —
both sides carry inverse depths in LDSO — seeded PnP fallback), pose-only
Sim(3) GN refinement with reprojection + 3D-3D edges, inlier gating, then a
loop `poseRel` edge with its 7x7 GN information and a pose-graph run.

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

MIN_SIM3_INLIERS = 12
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
        self.need_pose_graph = False

    # ---------------------------------------------------------------- records
    def make_kf_record(self, kf: FrameShell, pyr, point_uv_idepth: np.ndarray):
        """Detect ORB features on the keyframe and attach inverse depths from
        the window's active points (the reference's features carry invD from
        point activation; Feature.h:77-93)."""
        cfg = self.cfg
        feats = detector.detect_corners(pyr.dI[0], pyr.abs_grad[0],
                                        int(cfg.desired_immature_density))
        valid = np.asarray(feats["valid"] & feats["is_corner"])
        u = np.asarray(feats["u"])
        v = np.asarray(feats["v"])
        desc = np.asarray(feats["desc"])
        sel = np.nonzero(valid)[0]
        kf.feat_uv = np.stack([u[sel], v[sel]], 1)
        kf.feat_desc = desc[sel]
        kf.feat_idepth = np.full(len(sel), -1.0, np.float32)
        # nearest active point within 3 px provides idepth
        if point_uv_idepth is not None and len(point_uv_idepth):
            puv = point_uv_idepth[:, :2]
            pid = point_uv_idepth[:, 2]
            for k, (uu, vv) in enumerate(kf.feat_uv):
                d2 = (puv[:, 0] - uu) ** 2 + (puv[:, 1] - vv) ** 2
                j = np.argmin(d2)
                if d2[j] < 9.0:
                    kf.feat_idepth[k] = pid[j]

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

    def _add_to_db(self, kf: FrameShell):
        wids = self.vocab.transform(jnp.asarray(kf.feat_desc),
                                    jnp.ones(len(kf.feat_desc), bool))
        bow = self.vocab.bow_vector(wids)
        kf.bow_vector = bow
        self.db.add(kf.kf_id, bow)

    # ------------------------------------------------------------------ main
    def insert_keyframe(self, kf: FrameShell, window_kf_ids) -> bool:
        """Process one new keyframe; returns True if a loop was closed
        (LoopClosing::Run + DetectLoop + CorrectLoop, :38-269)."""
        if kf.feat_desc is None or len(kf.feat_desc) < 10:
            return False
        if not self._ensure_vocab(kf):
            return False
        if kf.bow_vector is None:
            self._add_to_db(kf)

        cand = self._detect_loop(kf, window_kf_ids)
        if cand is None:
            return False
        ok = self._correct_loop(kf, cand)
        if ok:
            self.n_loops_closed += 1
            self.need_pose_graph = True
        return ok

    def run_pose_graph_if_needed(self):
        if self.need_pose_graph:
            posegraph.run_pose_graph(self.global_map)
            self.need_pose_graph = False
            return True
        return False

    def _detect_loop(self, kf: FrameShell, window_kf_ids) -> Optional[FrameShell]:
        """kfGap exclusion + window exclusion + score gate
        (DetectLoop, :95-143)."""
        cfg = self.cfg
        exclude = set(window_kf_ids)
        exclude.add(kf.kf_id)
        exclude.update(range(max(kf.kf_id - cfg.loop_kf_gap, 0), kf.kf_id + 1))
        results = self.db.query(kf.bow_vector, exclude)
        if not results:
            return None
        best_id, best_score = results[0]
        if best_score < cfg.loop_score_th:
            return None
        return self.global_map.keyframes.get(best_id)

    def _correct_loop(self, kf: FrameShell, cand: FrameShell) -> bool:
        """Match -> Sim3 RANSAC -> GN refinement -> install poseRel edge
        (CorrectLoop + ComputeOptimizedPose, :145-496)."""
        calib = self.calib
        fx, fy = calib.fx[0], calib.fy[0]
        cx, cy = calib.cx[0], calib.cy[0]

        # matching: native popcount path when available, padded device
        # fallback otherwise (stable shapes -> no per-call recompiles)
        from ldso_tpu import native
        nm = native.hamming_match(kf.feat_desc, cand.feat_desc)
        if nm is not None:
            match = nm[0]
        else:
            def pad_desc(d):
                n = len(d)
                nb = max(64, 1 << int(np.ceil(np.log2(max(n, 1)))))
                return (np.concatenate([d, np.zeros((nb - n, 8), np.uint32)]),
                        np.arange(nb) < n)
            da, va = pad_desc(kf.feat_desc)
            db, vb = pad_desc(cand.feat_desc)
            m, _ = detector.match_descriptors(
                jnp.asarray(da), jnp.asarray(va), jnp.asarray(db),
                jnp.asarray(vb))
            match = np.asarray(m)[:len(kf.feat_desc)]
        mi = np.nonzero(match >= 0)[0]
        if len(mi) < MIN_SIM3_INLIERS:
            return False
        mj = match[mi]

        def backproject(uv, idepth):
            z = 1.0 / np.maximum(idepth, 1e-6)
            return np.stack([(uv[:, 0] - cx) / fx * z,
                             (uv[:, 1] - cy) / fy * z, z], 1)

        id_cur = kf.feat_idepth[mi]
        id_cand = cand.feat_idepth[mj]
        has3d = (id_cur > 0) & (id_cand > 0)
        if has3d.sum() < MIN_SIM3_INLIERS:
            return False

        P_cand = backproject(cand.feat_uv[mj], id_cand)   # candidate frame
        P_cur = backproject(kf.feat_uv[mi], id_cur)       # current frame

        # pad the correspondence set to a pow-2 bucket (stable jit shapes)
        n = len(mi)
        nb = max(64, 1 << int(np.ceil(np.log2(max(n, 1)))))
        padP = np.zeros((nb - n, 3), np.float32)
        P_cand_p = np.concatenate([P_cand.astype(np.float32), padP])
        P_cur_p = np.concatenate([P_cur.astype(np.float32), padP + 1.0])
        has3d_p = np.concatenate([has3d, np.zeros(nb - n, bool)])

        self.key, sub = jax.random.split(self.key)
        S0, inl, n_inl = umeyama_ransac(
            jnp.asarray(P_cand_p), jnp.asarray(P_cur_p),
            jnp.asarray(has3d_p), sub)
        from ldso_tpu.utils.transfer import device_get
        if int(device_get(n_inl)) < MIN_SIM3_INLIERS:
            return False

        # refinement: 2D reprojection of candidate 3D into the current image
        # (uses every match with candidate depth) + 3D-3D on mutual-depth ones
        m2d = np.concatenate([(id_cand > 0).astype(np.float32),
                              np.zeros(nb - n, np.float32)])
        uv_cur = np.concatenate([kf.feat_uv[mi].astype(np.float32),
                                 np.zeros((nb - n, 2), np.float32)])
        S, H, inl2d, inl3d = refine_sim3(
            S0, jnp.asarray(P_cand_p),
            jnp.asarray(uv_cur), jnp.asarray(m2d),
            jnp.asarray(P_cand_p), jnp.asarray(P_cur_p),
            jnp.asarray(has3d_p.astype(np.float32)),
            (fx, fy, cx, cy))
        n_good = int(device_get(jnp.sum(inl2d) + jnp.sum(inl3d)))
        if n_good < MIN_SIM3_INLIERS:
            return False

        S_cur_cand = np.asarray(S, np.float64)   # maps candidate cam -> cur cam
        info = np.asarray(H, np.float64)
        # condition the information a bit (g2o receives the raw Hessian too)
        info = 0.5 * (info + info.T)
        # install the loop edge: pose_rel holds S_this_other = S_cur_cand
        kf.add_pose_rel(cand.kf_id, S_cur_cand, info=info, is_loop=True)
        return True
