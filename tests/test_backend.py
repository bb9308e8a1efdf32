"""Windowed-BA backend tests (SURVEY.md §4 seams: "pattern residual +
analytic Jacobians vs finite differences", "Accumulator stitch vs naive
dense construction", "Schur-marginalization identity").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import CPARS, Config
from ldso_tpu.backend import ba
from ldso_tpu.backend.energy_functional import EnergyFunctional
from ldso_tpu.backend.window import RES_IN
from ldso_tpu.math import lie
from ldso_tpu.ops.preprocess import make_pyramid
from ldso_tpu.synthetic import PlaneScene, default_calib

CFG = Config(max_points=256)


def _build_ef(n_frames=3, n_pts=64, pose_noise=0.0, idepth_noise=0.0,
              w=160, h=120, seed=0):
    """Synthetic window: frames along a lateral path, points from frame 0
    ground truth (optionally perturbed)."""
    calib = default_calib(w, h)
    # keep the texture band well below the bilinear-interp Nyquist so
    # photometric residuals at ground truth are interp-noise-free
    scene = PlaneScene(freq_hi=18.0, contrast=80.0)
    rng = np.random.RandomState(seed)

    poses = []
    imgs = []
    for i in range(n_frames):
        xi = np.array([0.06 * i, 0.01 * i, 0.0, 0.0, 0.0, 0.0])
        T = np.asarray(lie.se3_exp(jnp.asarray(xi)), np.float64)
        poses.append(T)
        img, idep = scene.render(calib, jnp.asarray(T, jnp.float32))
        imgs.append(make_pyramid(img, calib.levels))
    _, idep0 = scene.render(calib, jnp.asarray(poses[0], jnp.float32))

    ef = EnergyFunctional(CFG, calib, F=4, P=CFG.max_points)
    for i, T in enumerate(poses):
        Tn = T.copy()
        if i > 0 and pose_noise > 0:
            dx = rng.randn(6) * pose_noise
            Tn = np.asarray(lie.se3_exp(jnp.asarray(dx)), np.float64) @ T
        ef.insert_frame(Tn, exposure=1.0, aff=np.zeros(2), is_first=(i == 0))

    # points on a grid in frame 0
    gx, gy = np.meshgrid(np.linspace(12, w - 12, int(np.sqrt(n_pts))),
                         np.linspace(12, h - 12, int(np.sqrt(n_pts))))
    u = gx.reshape(-1)
    v = gy.reshape(-1)
    idep = np.asarray(idep0)[v.astype(int), u.astype(int)]
    if idepth_noise > 0:
        idep = idep * (1.0 + rng.randn(len(idep)) * idepth_noise)

    from ldso_tpu.ops.interp import bilinear
    from ldso_tpu.config import PATTERN
    patt = jnp.asarray(PATTERN, jnp.float32)
    uP = jnp.asarray(u, jnp.float32)[:, None] + patt[None, :, 0]
    vP = jnp.asarray(v, jnp.float32)[:, None] + patt[None, :, 1]
    ptc = bilinear(imgs[0].dI[0], uP, vP)
    color = np.asarray(ptc[..., 0])
    gsq = np.asarray(jnp.sum(ptc[..., 1:3] ** 2, -1))
    weights = np.sqrt(CFG.outlier_th_sum_component
                      / (CFG.outlier_th_sum_component + gsq))
    eth = np.full(len(u), 8.0 * CFG.outlier_th, np.float32)

    ef.insert_points(0, u, v, color, weights, idep, eth)
    dIs = jnp.stack([im.dI[0] for im in imgs]
                    + [jnp.zeros_like(imgs[0].dI[0])] * (4 - n_frames))
    return ef, dIs, poses, idep0, calib, (w, h)


class TestLinearize:
    def test_packed_stack_bit_identical(self):
        """linearize_all on the tap-packed (F,H,W,12) window stack must
        reproduce the plain (F,H,W,3) results exactly (the production
        full_system stores the stack packed; ops/interp.pack_taps)."""
        from ldso_tpu.ops.interp import pack_taps
        from ldso_tpu.backend.energy_functional import _reset_oob
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
            pose_noise=2e-3, idepth_noise=0.05)
        W0 = _reset_oob(ef.W)
        import jax.numpy as jnp
        packed = jnp.stack([pack_taps(dIs[f]) for f in range(dIs.shape[0])])
        W_a, e_a = ba.linearize_all(W0, dIs, CFG, w, h)
        W_b, e_b = ba.linearize_all(W0, packed, CFG, w, h)
        np.testing.assert_array_equal(np.asarray(e_a), np.asarray(e_b))
        for name in ("res_new_energy", "res_new_state", "Jpdd", "JIdx",
                     "JabF", "resF"):
            np.testing.assert_array_equal(
                np.asarray(getattr(W_a, name)),
                np.asarray(getattr(W_b, name)), err_msg=name)

    def test_zero_residual_at_ground_truth(self):
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef()
        from ldso_tpu.backend.energy_functional import _reset_oob
        ef.W = _reset_oob(ef.W)
        W2, energy = ba.linearize_all(ef.W, dIs, CFG, w, h)
        # residuals at ground truth on a noiseless scene: tiny energy
        mask = np.asarray(W2.res_exist & W2.pt_valid[:, None]
                          & W2.frame_valid[None, :])
        n_in = (np.asarray(W2.res_new_state) == RES_IN) & mask
        assert n_in.sum() > 0.8 * mask.sum()
        per_res = np.asarray(W2.res_new_energy)[n_in].mean()
        assert per_res < 3.0, f"mean energy {per_res} at ground truth"

    def test_geometric_jacobians_vs_autodiff(self):
        """Jpdxi / Jpdd / Jpdc against jacfwd of the projection chain."""
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef()
        from ldso_tpu.backend.energy_functional import _reset_oob
        ef.W = _reset_oob(ef.W)
        W2, _ = ba.linearize_all(ef.W, dIs, CFG, w, h)
        W = W2
        pc = ba.make_precalc(W)

        p, t = 10, 1  # point 10, target frame 1
        hostc = int(W.pt_host[p])
        R0 = np.asarray(pc.R0[hostc, t], np.float64)
        t0 = np.asarray(pc.t0[hostc, t], np.float64)
        c = np.asarray(pc.fxycxy, np.float64)
        u_pt = float(W.pt_u[p]); v_pt = float(W.pt_v[p])
        idep = float(W.idepth_zero[p])

        def project(xi_left, dc, d_idepth):
            """Pixel position of the center projection as a function of a
            left-multiplied target perturbation (scaled units), calib
            increments, and an idepth increment."""
            fx = c[0] + dc[0] * 50.0  # SCALE_F
            fy = c[1] + dc[1] * 50.0
            cx = c[2] + dc[2] * 50.0  # SCALE_C
            cy = c[3] + dc[3] * 50.0
            # Jpdxi/Jpdd are in UNSCALED tangent units; the SCALE_XI_* factors
            # live in the adjoint rows (setAdjointsF), not the raw Jacobian
            KliP = jnp.array([(u_pt - cx) / fx, (v_pt - cy) / fy, 1.0])
            Tp = lie.se3_exp(xi_left)
            R = Tp[:3, :3] @ R0
            tt = Tp[:3, :3] @ t0 + Tp[:3, 3]
            ptp = R @ KliP + tt * (idep + d_idepth)
            return jnp.array([fx * ptp[0] / ptp[2] + cx,
                              fy * ptp[1] / ptp[2] + cy])

        J_xi = np.asarray(jax.jacfwd(project, argnums=0)(
            jnp.zeros(6, jnp.float64), jnp.zeros(4, jnp.float64), 0.0))
        J_c = np.asarray(jax.jacfwd(project, argnums=1)(
            jnp.zeros(6, jnp.float64), jnp.zeros(4, jnp.float64), 0.0))
        J_d = np.asarray(jax.jacfwd(project, argnums=2)(
            jnp.zeros(6, jnp.float64), jnp.zeros(4, jnp.float64), 0.0))

        np.testing.assert_allclose(np.asarray(W.Jpdxi[p, t]), J_xi,
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(W.Jpdd[p, t]), J_d,
                                   rtol=2e-3, atol=2e-3)
        # calib Jacobian: the reference's formula is exact for the
        # distortion-free pinhole chain
        np.testing.assert_allclose(np.asarray(W.Jpdc[p, t]), J_c,
                                   rtol=2e-2, atol=5e-2)

    def test_stitched_system_vs_numpy_oracle(self):
        """HA/bA and the Schur parts vs a naive dense global construction."""
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef(n_pts=25)
        from ldso_tpu.backend.energy_functional import _reset_oob
        ef.W = _reset_oob(ef.W)
        W, _ = ba.linearize_all(ef.W, dIs, CFG, w, h)
        W = ba.apply_res(W)
        ef.W = W
        HA, bA, HL, bL, Hsc, bsc, aux, delta, _ = ba.build_system(W)
        nf = ef.n_frames
        n = CPARS + 8 * nf

        pc = ba.make_precalc(W)
        AH = np.asarray(pc.adHost, np.float64)
        AT = np.asarray(pc.adTarget, np.float64)

        P, F = W.P, W.F
        act = np.asarray(W.res_active & W.res_exist)
        Jpdxi = np.asarray(W.Jpdxi, np.float64)
        Jpdc = np.asarray(W.Jpdc, np.float64)
        Jpdd = np.asarray(W.Jpdd, np.float64)
        JIdx = np.asarray(W.JIdx, np.float64)
        JabF = np.asarray(W.JabF, np.float64)
        resF = np.asarray(W.resF, np.float64)
        host = np.asarray(W.pt_host)
        pt_valid = np.asarray(W.pt_valid)

        pts = np.nonzero(pt_valid)[0]
        npts = len(pts)
        ng = n + npts  # global: [c, frames, idepths]
        J_rows = []
        r_rows = []
        for pi, p in enumerate(pts):
            hh = host[p]
            for t in range(F):
                if not act[p, t]:
                    continue
                for k in range(8):
                    rel = np.zeros(8)
                    row_c = JIdx[p, t, 0, k] * Jpdc[p, t, 0] + JIdx[p, t, 1, k] * Jpdc[p, t, 1]
                    rel[:6] = JIdx[p, t, 0, k] * Jpdxi[p, t, 0] + JIdx[p, t, 1, k] * Jpdxi[p, t, 1]
                    rel[6] = JabF[p, t, 0, k]
                    rel[7] = JabF[p, t, 1, k]
                    row = np.zeros(ng)
                    row[:CPARS] = row_c
                    row[CPARS + 8 * hh: CPARS + 8 * hh + 8] += AH[hh, t] @ rel
                    row[CPARS + 8 * t: CPARS + 8 * t + 8] += AT[hh, t] @ rel
                    dd_k = (JIdx[p, t, 0, k] * Jpdd[p, t, 0]
                            + JIdx[p, t, 1, k] * Jpdd[p, t, 1])
                    row[n + pi] = dd_k
                    J_rows.append(row)
                    r_rows.append(resF[p, t, k])
        J = np.stack(J_rows)
        r = np.asarray(r_rows)
        Hg = J.T @ J
        bg = J.T @ r

        np.testing.assert_allclose(np.asarray(HA, np.float64)[:n, :n],
                                   Hg[:n, :n], rtol=2e-3, atol=2e-2)
        np.testing.assert_allclose(np.asarray(bA, np.float64)[:n],
                                   bg[:n], rtol=2e-3, atol=2e-2)

        # Schur identity: (HA - Hsc) x = bA - bsc must equal the pose part
        # of the full KKT solve (with the per-point +prior damping = 0 here)
        Hdd = np.diag(Hg[n:, n:])
        keep = Hdd > 1e-8
        Hdi = np.where(keep, 1.0 / np.maximum(Hdd, 1e-12), 0.0)
        Hsc_o = Hg[:n, n:] @ (Hdi[:, None] * Hg[n:, :n])
        bsc_o = Hg[:n, n:] @ (Hdi * bg[n:])
        np.testing.assert_allclose(np.asarray(Hsc, np.float64)[:n, :n],
                                   Hsc_o, rtol=2e-3, atol=5e-2)
        np.testing.assert_allclose(np.asarray(bsc, np.float64)[:n],
                                   bsc_o, rtol=2e-3, atol=5e-2)


class TestOptimize:
    def test_converges_from_perturbed_poses(self):
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
            pose_noise=2e-3, idepth_noise=0.05, n_pts=100)
        rmse = ef.optimize(dIs, 10, w, h)
        assert not ef.is_lost
        assert rmse < 3.0, f"final rmse {rmse}"

        # frame poses recovered (frame 0 anchored by its prior)
        from ldso_tpu.backend.window import current_poses
        T_cur = np.asarray(current_poses(ef.W), np.float64)
        for i in range(1, 3):
            rel_est = T_cur[i] @ np.linalg.inv(T_cur[0])
            rel_gt = poses[i] @ np.linalg.inv(poses[0])
            err = np.asarray(lie.se3_log(jnp.asarray(
                np.linalg.inv(rel_gt) @ rel_est)))
            # translation has a free monocular scale; compare direction+rot
            rot_err = np.linalg.norm(err[3:])
            assert rot_err < 2e-3, f"frame {i} rot error {rot_err}"
            t_est = rel_est[:3, 3]
            t_gt = rel_gt[:3, 3]
            cos = t_est @ t_gt / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
            assert cos > 0.999, f"frame {i} translation direction {cos}"

        # idepths corrected toward ground truth
        W = ef.W
        good = np.asarray(W.pt_valid)
        u = np.asarray(W.pt_u)[good].astype(int)
        v = np.asarray(W.pt_v)[good].astype(int)
        idep_gt = np.asarray(idep0)[v, u]
        idep_est = np.asarray(W.idepth)[good]
        rel_err = np.abs(idep_est - idep_gt) / idep_gt
        assert np.median(rel_err) < 0.02, f"median idepth err {np.median(rel_err)}"

    def test_marginalize_frame_keeps_solution(self):
        """After marginalizing the oldest frame, re-optimizing barely moves
        the remaining poses (linear-consistency of the Schur prior)."""
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
            pose_noise=1e-3, idepth_noise=0.02, n_pts=100)
        # re-host half of the points on frame 1 so the window still has
        # points after frame 0 is dropped (mirrors the real point spread)
        W = ef.W
        scene = PlaneScene(freq_hi=18.0, contrast=80.0)
        _, idep1 = scene.render(calib, jnp.asarray(poses[1], jnp.float32))
        from ldso_tpu.ops.interp import bilinear
        from ldso_tpu.config import PATTERN
        rng2 = np.random.RandomState(3)
        gx, gy = np.meshgrid(np.linspace(14, w - 14, 8),
                             np.linspace(14, h - 14, 8))
        u1 = gx.reshape(-1) + 0.3
        v1 = gy.reshape(-1) + 0.2
        id1 = np.asarray(idep1)[v1.astype(int), u1.astype(int)]
        img1_pyr = make_pyramid(scene.render(calib, jnp.asarray(poses[1], jnp.float32))[0],
                                calib.levels)
        patt = jnp.asarray(PATTERN, jnp.float32)
        ptc = bilinear(img1_pyr.dI[0],
                       jnp.asarray(u1, jnp.float32)[:, None] + patt[None, :, 0],
                       jnp.asarray(v1, jnp.float32)[:, None] + patt[None, :, 1])
        col1 = np.asarray(ptc[..., 0])
        gsq1 = np.asarray(jnp.sum(ptc[..., 1:3] ** 2, -1))
        w1 = np.sqrt(CFG.outlier_th_sum_component
                     / (CFG.outlier_th_sum_component + gsq1))
        eth1 = np.full(len(u1), 8.0 * CFG.outlier_th, np.float32)
        ef.insert_points(1, u1, v1, col1, w1, id1, eth1)

        ef.optimize(dIs, 8, w, h)
        from ldso_tpu.backend.window import current_poses
        T_before = np.asarray(current_poses(ef.W), np.float64)

        # drop points hosted in frame 0, then marginalize frame 0
        W = ef.W
        host0 = np.asarray(W.pt_host) == 0
        # (in the real system these would be marginalized into HM first)
        ef.drop_points(jnp.asarray(host0) & W.pt_valid)
        ef.marginalize_frame(0)
        assert ef.n_frames == 2
        rel_before = T_before[2] @ np.linalg.inv(T_before[1])

        dIs2 = jnp.stack([dIs[1], dIs[2], jnp.zeros_like(dIs[0]),
                          jnp.zeros_like(dIs[0])])
        ef.optimize(dIs2, 4, w, h)
        T_after = np.asarray(current_poses(ef.W), np.float64)
        rel_after = T_after[1] @ np.linalg.inv(T_after[0])
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(rel_before) @ rel_after)))
        assert np.linalg.norm(err) < 5e-3, f"relative pose drifted {err}"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
