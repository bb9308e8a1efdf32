"""Sim(3) pose-graph tests (SURVEY.md §4 seam "PGO on synthetic loops")."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.loop import posegraph
from ldso_tpu.math import lie
from ldso_tpu.slam_map import FrameShell, GlobalMap


def _circle_gt(n, radius=5.0):
    """Ground-truth poses around a circle (camera = world-to-cam)."""
    poses = []
    for k in range(n):
        th = 2 * np.pi * k / n
        t = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        w = np.array([0.0, 0.0, th])
        T_wc = np.array(lie.se3_exp(jnp.asarray(np.concatenate([t * 0, w]))))
        T_wc[:3, 3] = t
        poses.append(np.linalg.inv(T_wc))
    return poses


def _drifted_odometry(gt, drift_per_step, sigma_drift=0.0):
    """Integrate noisy relative motions to simulate odometry drift.
    sigma_drift injects per-step Sim(3) log-scale drift (monocular-style)."""
    est = [gt[0].copy()]
    for k in range(1, len(gt)):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        D7 = np.concatenate([drift_per_step, [sigma_drift]])
        D = np.asarray(lie.sim3_exp(jnp.asarray(D7)))
        est.append(D @ rel @ est[-1])
    return est


class TestPoseGraph:
    def _run(self, n=24, drift=None, sigma_drift=0.0):
        gt = _circle_gt(n)
        drift = drift if drift is not None else np.zeros(6)
        est = _drifted_odometry(gt, drift, sigma_drift)

        gm = GlobalMap()
        for k in range(n):
            fr = FrameShell(id=k, kf_id=k, T_cw=est[k])
            gm.add_keyframe(fr)
        kfs = gm.get_all_kfs()
        # odometry edges from the DRIFTED estimates (what the window knew)
        for k in range(1, n):
            rel = est[k] @ np.linalg.inv(est[k - 1])
            kfs[k].add_pose_rel(k - 1, rel)
        # loop edge from ground truth (what loop closing measures)
        rel_loop = gt[0] @ np.linalg.inv(gt[n - 1])
        kfs[0].add_pose_rel(n - 1, rel_loop, is_loop=True)
        posegraph.run_pose_graph(gm, iterations=25)
        return gm, gt, est

    def test_identity_stays(self):
        gm, gt, est = self._run(drift=np.zeros(6))
        for k, kf in enumerate(gm.get_all_kfs()):
            err = np.linalg.norm(np.asarray(lie.sim3_log(
                jnp.asarray(kf.get_S_cw() @ np.linalg.inv(est[k])))))
            assert err < 1e-6, f"kf {k} moved by {err} with no drift"

    def test_closes_se3_drift(self):
        drift = np.array([2e-3, -1e-3, 0.0, 0.0, 0.0, 1.5e-3])
        gm, gt, est = self._run(drift=drift)
        # before: accumulated drift at the loop end
        pre = np.linalg.norm((est[0] @ np.linalg.inv(est[-1])
                              @ np.linalg.inv(gt[0] @ np.linalg.inv(gt[-1])))[:3, 3])
        # after: every edge residual should be small
        kfs = gm.get_all_kfs()
        errs = []
        for kf in kfs:
            for oid, (Z, _, _) in kf.pose_rel.items():
                S1 = kf.get_S_cw()
                S2 = kfs[oid].get_S_cw()
                e = np.asarray(lie.sim3_log(jnp.asarray(
                    np.linalg.inv(Z) @ S1 @ np.linalg.inv(S2))))
                errs.append(np.linalg.norm(e))
        assert np.max(errs) < 0.3 * pre, \
            f"edge errors {np.max(errs):.4f} vs pre-drift {pre:.4f}"

    def test_corrects_scale_drift(self):
        """Monocular scale drift absorbed by the Sim(3) scale dof."""
        gm, gt, est = self._run(sigma_drift=0.004)
        kfs = gm.get_all_kfs()
        # scale along the chain should now vary smoothly and the loop edge
        # must be satisfied
        S0 = kfs[0].get_S_cw()
        Sn = kfs[-1].get_S_cw()
        Z = gt[0] @ np.linalg.inv(gt[-1])
        e = np.asarray(lie.sim3_log(jnp.asarray(
            np.linalg.inv(Z) @ S0 @ np.linalg.inv(Sn))))
        assert np.linalg.norm(e) < 0.02, f"loop residual {np.linalg.norm(e)}"
        # scales deviate from 1 to absorb the drift
        scales = [float(lie.sim3_scale(jnp.asarray(kf.get_S_cw())))
                  for kf in kfs]
        assert max(scales) > 1.005 or min(scales) < 0.995

    def test_fixed_vertex_untouched(self):
        gm, gt, est = self._run(drift=np.array([1e-3, 0, 0, 0, 0, 1e-3]))
        kfs = gm.get_all_kfs()
        np.testing.assert_allclose(kfs[-1].get_S_cw(), est[-1], atol=1e-10)


class TestPoseGraphCG:
    """Matrix-free PCG path (posegraph.optimize_pose_graph_cg): must agree
    with the dense exact solver and scale past the dense memory wall."""

    def _system(self, n, drift, sigma_drift=0.0):
        gt = _circle_gt(n)
        est = _drifted_odometry(gt, drift, sigma_drift)
        N = n
        S = np.stack(est)
        fixed = np.zeros(N, bool)
        fixed[N - 1] = True
        ei = np.arange(1, N, dtype=np.int32)
        ej = np.arange(0, N - 1, dtype=np.int32)
        Z = np.stack([est[k] @ np.linalg.inv(est[k - 1])
                      for k in range(1, N)])
        # loop edge 0 <- N-1 from ground truth
        ei = np.concatenate([ei, [0]]).astype(np.int32)
        ej = np.concatenate([ej, [N - 1]]).astype(np.int32)
        Z = np.concatenate([Z, (gt[0] @ np.linalg.inv(gt[-1]))[None]])
        E = len(ei)
        info = np.tile(np.eye(7), (E, 1, 1))
        valid = np.ones(E, bool)
        return (jnp.asarray(S), jnp.asarray(fixed), jnp.asarray(ei),
                jnp.asarray(ej), jnp.asarray(Z), jnp.asarray(info),
                jnp.asarray(valid)), gt

    def test_cg_matches_dense(self):
        drift = np.array([2e-3, -1e-3, 0.0, 0.0, 0.0, 1.5e-3])
        args, gt = self._system(24, drift, sigma_drift=0.003)
        S_dense = np.asarray(posegraph.optimize_pose_graph(
            *args, iterations=15))
        S_cg = np.asarray(posegraph.optimize_pose_graph_cg(
            *args, iterations=15, cg_iters=150))
        for k in range(24):
            e = np.asarray(lie.sim3_log(jnp.asarray(
                S_cg[k] @ np.linalg.inv(S_dense[k]))))
            assert np.linalg.norm(e) < 1e-3, \
                f"vertex {k}: CG vs dense {np.linalg.norm(e):.2e}"

    def test_large_graph_uses_cg_and_converges(self):
        """1500 KFs pads to 2048 > _DENSE_MAX_VERTICES: run_pose_graph must
        take the O(E)-memory path and still close the loop (dense H here
        would be (7*2048)^2 f32 = 0.8 GB per temporary)."""
        n = 1500
        gt = _circle_gt(n)
        drift = np.array([2e-5, -1e-5, 0.0, 0.0, 0.0, 2e-5])
        est = _drifted_odometry(gt, drift)
        gm = GlobalMap()
        for k in range(n):
            gm.add_keyframe(FrameShell(id=k, kf_id=k, T_cw=est[k]))
        kfs = gm.get_all_kfs()
        for k in range(1, n):
            kfs[k].add_pose_rel(k - 1, est[k] @ np.linalg.inv(est[k - 1]))
        kfs[0].add_pose_rel(n - 1, gt[0] @ np.linalg.inv(gt[-1]),
                            is_loop=True)
        posegraph.run_pose_graph(gm, iterations=8)
        # the loop edge must be (mostly) satisfied after PGO
        Z = gt[0] @ np.linalg.inv(gt[-1])
        e = np.asarray(lie.sim3_log(jnp.asarray(
            np.linalg.inv(Z) @ kfs[0].get_S_cw()
            @ np.linalg.inv(kfs[-1].get_S_cw()))))
        pre = np.asarray(lie.sim3_log(jnp.asarray(
            np.linalg.inv(Z) @ est[0] @ np.linalg.inv(est[-1]))))
        assert np.linalg.norm(e) < 0.1 * np.linalg.norm(pre), \
            f"loop residual {np.linalg.norm(e):.4f} vs pre {np.linalg.norm(pre):.4f}"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestPoseGraphSharded:
    """Edge-sharded PCG over the 8-device CPU mesh: the distributed
    pose-graph backend (factors shard, vertices replicate, one psum per
    CG step) must agree with the single-device PCG solver."""

    def _mesh(self):
        import jax
        from jax.sharding import Mesh
        devs = np.array(jax.devices()[:8])
        if devs.size < 8:
            pytest.skip("needs the multi-device CPU mesh")
        return Mesh(devs, ("e",))

    def test_sharded_matches_single_device(self):
        mesh = self._mesh()
        drift = np.array([2e-3, -1e-3, 0.0, 0.0, 0.0, 1.5e-3])
        tc = TestPoseGraphCG()
        args, gt = tc._system(24, drift, sigma_drift=0.003)
        S, fixed, ei, ej, Z, info, valid = args
        # pad edges to a multiple of the mesh size (the host wrapper pads
        # to a power of two): dead self-edges on the fixed vertex
        E = ei.shape[0]
        Eb = ((E + 7) // 8) * 8
        pad = Eb - E
        ei = jnp.concatenate([ei, jnp.full(pad, 23, jnp.int32)])
        ej = jnp.concatenate([ej, jnp.full(pad, 23, jnp.int32)])
        Z = jnp.concatenate([Z, jnp.tile(jnp.eye(4), (pad, 1, 1))])
        info = jnp.concatenate([info, jnp.tile(jnp.eye(7), (pad, 1, 1))])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])

        S_cg = np.asarray(posegraph.optimize_pose_graph_cg(
            S, fixed, ei, ej, Z, info, valid, iterations=15, cg_iters=150))
        S_sh = np.asarray(posegraph.optimize_pose_graph_cg_sharded(
            S, fixed, ei, ej, Z, info, valid, mesh,
            iterations=15, cg_iters=150))
        for k in range(24):
            e = np.asarray(lie.sim3_log(jnp.asarray(
                S_sh[k] @ np.linalg.inv(S_cg[k]))))
            assert np.linalg.norm(e) < 1e-4, \
                f"vertex {k}: sharded vs single {np.linalg.norm(e):.2e}"
