"""Loop-closing stack tests: vocabulary, database, Sim3 solvers, PnP,
and end-to-end loop detection+correction on synthetic views."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.frontend import detector
from ldso_tpu.loop import pnp, sim3_solver
from ldso_tpu.loop.database import KeyframeDatabase
from ldso_tpu.loop.loopclosing import LoopClosing
from ldso_tpu.loop.vocab import Vocabulary
from ldso_tpu.math import lie
from ldso_tpu.ops.preprocess import make_pyramid
from ldso_tpu.slam_map import FrameShell, GlobalMap
from ldso_tpu.synthetic import PlaneScene, default_calib

KEY = jax.random.PRNGKey(0)


def _rand_desc(rng, n):
    return rng.randint(0, 2 ** 32, size=(n, 8), dtype=np.uint32)


class TestVocabulary:
    def test_train_transform_consistency(self):
        rng = np.random.RandomState(0)
        # 3 well-separated clusters of descriptors
        bases = _rand_desc(rng, 3)
        descs, labels = [], []
        for c in range(3):
            for _ in range(40):
                d = bases[c].copy()
                w = rng.randint(0, 8)
                d[w] ^= np.uint32(1 << rng.randint(0, 32))  # flip one bit
                descs.append(d)
                labels.append(c)
        descs = np.stack(descs)
        voc = Vocabulary.train(descs, k=3, L=2, seed=1)
        wids = voc.transform(jnp.asarray(descs), jnp.ones(len(descs), bool))
        labels = np.asarray(labels)
        # different clusters never share words; within a cluster one word
        # dominates (the tree may split a tight cluster into sibling leaves)
        sets = []
        for c in range(3):
            ws = wids[labels == c]
            vals, counts = np.unique(ws, return_counts=True)
            assert counts.max() >= 0.8 * len(ws), \
                f"cluster {c} fragmented: {dict(zip(vals, counts))}"
            sets.append(set(vals.tolist()))
        assert not (sets[0] & sets[1]) and not (sets[1] & sets[2]) \
            and not (sets[0] & sets[2])

    def test_score_identity_and_disjoint(self):
        v1 = {1: 0.5, 2: 0.5}
        v2 = {3: 1.0}
        assert abs(Vocabulary.score(v1, v1) - 1.0) < 1e-9
        assert Vocabulary.score(v1, v2) == 0.0

    def test_database_query(self):
        rng = np.random.RandomState(1)
        descs = _rand_desc(rng, 200)
        voc = Vocabulary.train(descs, k=5, L=2)
        db = KeyframeDatabase(voc)
        groups = [descs[i * 40:(i + 1) * 40] for i in range(5)]
        for i, g in enumerate(groups):
            w = voc.transform(jnp.asarray(g), jnp.ones(len(g), bool))
            db.add(i, voc.bow_vector(w))
        # query with a noisy copy of group 2
        q = groups[2].copy()
        q[0] ^= np.uint32(1)
        wq = voc.transform(jnp.asarray(q), jnp.ones(len(q), bool))
        res = db.query(voc.bow_vector(wq), exclude=set())
        assert res[0][0] == 2
        assert res[0][1] > 0.9


class TestSim3Solver:
    def _pts(self, n=60, seed=0):
        rng = np.random.RandomState(seed)
        P = rng.randn(n, 3) * np.array([1.0, 0.8, 0.5]) + np.array([0, 0, 4.0])
        return P.astype(np.float32)

    def test_umeyama_exact(self):
        P = self._pts()
        S_gt = np.asarray(lie.sim3_exp(jnp.asarray(
            [0.3, -0.2, 0.5, 0.1, -0.05, 0.2, 0.15], jnp.float64)), np.float32)
        Q = (np.c_[P, np.ones(len(P))] @ S_gt.T)[:, :3]
        S = np.asarray(sim3_solver.umeyama_sim3(
            jnp.asarray(P), jnp.asarray(Q), jnp.ones(len(P), jnp.float32)))
        np.testing.assert_allclose(S, S_gt, atol=1e-4)

    def test_ransac_with_outliers(self):
        P = self._pts(100)
        S_gt = np.asarray(lie.sim3_exp(jnp.asarray(
            [0.2, 0.1, -0.3, 0.05, 0.1, -0.08, 0.1], jnp.float64)), np.float32)
        Q = (np.c_[P, np.ones(len(P))] @ S_gt.T)[:, :3]
        rng = np.random.RandomState(3)
        out = rng.rand(len(P)) < 0.35
        Q[out] += rng.randn(out.sum(), 3) * 2.0
        S, mask, n = sim3_solver.umeyama_ransac(
            jnp.asarray(P), jnp.asarray(Q), jnp.ones(len(P), bool), KEY)
        assert int(n) > 0.5 * (~out).sum()
        err = np.asarray(lie.sim3_log(jnp.asarray(
            np.linalg.inv(S_gt.astype(np.float64)) @ np.asarray(S, np.float64))))
        assert np.linalg.norm(err) < 0.02, f"sim3 error {np.linalg.norm(err)}"
        # outliers mostly rejected
        assert (np.asarray(mask) & out).sum() < 0.1 * out.sum() + 3

    def test_refine_improves(self):
        P = self._pts(80)
        S_gt = np.asarray(lie.sim3_exp(jnp.asarray(
            [0.2, 0.0, -0.1, 0.03, 0.06, -0.02, 0.08], jnp.float64)), np.float32)
        Q = (np.c_[P, np.ones(len(P))] @ S_gt.T)[:, :3]
        fx = fy = 300.0
        cx = cy = 160.0
        uv = np.stack([fx * Q[:, 0] / Q[:, 2] + cx,
                       fy * Q[:, 1] / Q[:, 2] + cy], 1).astype(np.float32)
        S0 = np.asarray(lie.sim3_exp(jnp.asarray(
            [0.17, 0.02, -0.12, 0.02, 0.07, -0.03, 0.06], jnp.float64)), np.float32)
        S, H, inl2d, inl3d = sim3_solver.refine_sim3(
            jnp.asarray(S0), jnp.asarray(P), jnp.asarray(uv),
            jnp.ones(len(P), jnp.float32), jnp.asarray(P), jnp.asarray(Q),
            jnp.ones(len(P), jnp.float32), (fx, fy, cx, cy))
        err = np.asarray(lie.sim3_log(jnp.asarray(
            np.linalg.inv(S_gt.astype(np.float64)) @ np.asarray(S, np.float64))))
        assert np.linalg.norm(err) < 1e-3, f"refined error {np.linalg.norm(err)}"
        assert int(jnp.sum(inl2d)) > 70
        # information matrix PSD-ish
        ev = np.linalg.eigvalsh(np.asarray(H, np.float64))
        assert ev.min() > -1e-3


class TestPnP:
    def test_pnp_ransac(self):
        rng = np.random.RandomState(0)
        X = (rng.randn(80, 3) * np.array([1, 0.8, 0.5])
             + np.array([0, 0, 5.0])).astype(np.float32)
        T_gt = np.asarray(lie.se3_exp(jnp.asarray(
            [0.2, -0.1, 0.3, 0.04, -0.08, 0.1], jnp.float64)), np.float32)
        fx = fy = 280.0
        cx = cy = 160.0
        Pc = X @ T_gt[:3, :3].T + T_gt[:3, 3]
        uv = np.stack([fx * Pc[:, 0] / Pc[:, 2] + cx,
                       fy * Pc[:, 1] / Pc[:, 2] + cy], 1).astype(np.float32)
        out = rng.rand(len(X)) < 0.3
        uv[out] += rng.randn(out.sum(), 2) * 40
        T, mask, n = pnp.pnp_ransac(jnp.asarray(X), jnp.asarray(uv),
                                    jnp.ones(len(X), bool),
                                    (fx, fy, cx, cy), KEY)
        assert int(n) > 0.6 * (~out).sum()
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(T_gt.astype(np.float64)) @ np.asarray(T, np.float64))))
        assert np.linalg.norm(err) < 5e-3, f"pnp error {np.linalg.norm(err)}"


class TestLoopClosing:
    def test_detect_and_correct_synthetic_loop(self):
        """Two visits to the same view separated by many kf ids: the second
        visit must retrieve the first and estimate the relative Sim3."""
        cfg = Config(loop_kf_gap=3)
        calib = default_calib(320, 240)
        scene = PlaneScene(freq_hi=45.0, contrast=80.0, n_waves=40)
        gm = GlobalMap()
        lc = LoopClosing(calib, cfg, gm)

        def make_kf(kf_id, T_cw, fill_idepth=True):
            img, idep = scene.render(calib, jnp.asarray(T_cw, jnp.float32))
            pyr = make_pyramid(img, calib.levels)
            kf = FrameShell(id=kf_id, kf_id=kf_id, T_cw=np.asarray(T_cw, np.float64))
            feats = detector.detect_corners(pyr.dI[0], pyr.abs_grad[0], 500)
            # attach ground-truth idepth at feature locations
            valid = np.asarray(feats["valid"] & feats["is_corner"])
            sel = np.nonzero(valid)[0]
            u = np.asarray(feats["u"])[sel]
            v = np.asarray(feats["v"])[sel]
            kf.feat_uv = np.stack([u, v], 1)
            kf.feat_desc = np.asarray(feats["desc"])[sel]
            kf.feat_angle = np.asarray(feats["angle"])[sel].astype(np.float32)
            kf.feat_idepth = (np.asarray(idep)[v.astype(int), u.astype(int)]
                              if fill_idepth else np.full(len(sel), -1.0))
            gm.add_keyframe(kf)
            return kf

        # a tour: distinct views (different offsets), then return near start
        views = []
        for i in range(10):
            xi = np.array([0.8 * i, 0.15 * i, 0.0, 0.0, 0.04 * i, 0.0])
            views.append(np.asarray(lie.se3_exp(jnp.asarray(xi)), np.float64))
        T_loop = np.asarray(lie.se3_exp(jnp.asarray(
            [0.05, -0.02, 0.01, 0.004, -0.01, 0.003])), np.float64) @ views[0]
        kfs = []
        for i, T in enumerate(views):
            kf = make_kf(i, np.linalg.inv(T) if False else T)
            kfs.append(kf)
            lc.insert_keyframe(kf, window_kf_ids=[i])
        # revisit
        kf_loop = make_kf(10, T_loop)
        closed = lc.insert_keyframe(kf_loop, window_kf_ids=[10])
        assert closed, "loop not closed on revisit"
        # check edge correctness
        assert any(il for (_, _, il) in kf_loop.pose_rel.values())
        cand_id = [k for k, (_, _, il) in kf_loop.pose_rel.items() if il][0]
        assert cand_id == 0, f"matched wrong keyframe {cand_id}"
        S_rel, info, _ = kf_loop.pose_rel[cand_id]
        S_gt = T_loop @ np.linalg.inv(views[0])
        err = np.asarray(lie.sim3_log(jnp.asarray(
            np.linalg.inv(S_gt) @ S_rel)))
        assert np.linalg.norm(err) < 0.02, f"loop Sim3 error {np.linalg.norm(err)}"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
