"""On-device LM loop vs the host-orchestrated reference path."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.math import lie
from ldso_tpu.backend.window import current_poses
from test_backend import _build_ef, CFG


class TestDeviceOptimize:
    def test_matches_host_path(self):
        """Device single-program optimize reaches the same solution as the
        host loop (f32 solve + refinement vs host f64)."""
        res = {}
        for mode in ("host", "device"):
            ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
                pose_noise=2e-3, idepth_noise=0.05, n_pts=100)
            if mode == "host":
                ef.cfg = dataclasses.replace(CFG, force_accept_step=False)
                # the host path without force-accept evaluates real energies
            rmse = ef.optimize(dIs, 10, w, h)
            T = np.asarray(current_poses(ef.W), np.float64)
            good = np.asarray(ef.W.pt_valid)
            res[mode] = (rmse, T, np.asarray(ef.W.idepth)[good])
            assert not ef.is_lost

        rel_h = res["host"][1][2] @ np.linalg.inv(res["host"][1][0])
        rel_d = res["device"][1][2] @ np.linalg.inv(res["device"][1][0])
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(rel_h) @ rel_d)))
        assert np.linalg.norm(err) < 1e-3, f"device vs host pose diff {err}"
        assert abs(res["host"][0] - res["device"][0]) < 0.3
        # idepths agree
        np.testing.assert_allclose(res["device"][2], res["host"][2],
                                   rtol=0.02, atol=1e-3)

    def test_device_converges_to_gt(self):
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
            pose_noise=2e-3, idepth_noise=0.05, n_pts=100)
        assert ef.cfg.force_accept_step
        rmse = ef.optimize(dIs, 10, w, h)
        assert rmse < 3.0
        T = np.asarray(current_poses(ef.W), np.float64)
        for i in range(1, 3):
            rel_est = T[i] @ np.linalg.inv(T[0])
            rel_gt = poses[i] @ np.linalg.inv(poses[0])
            err = np.asarray(lie.se3_log(jnp.asarray(
                np.linalg.inv(rel_gt) @ rel_est)))
            assert np.linalg.norm(err[3:]) < 2e-3


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestSolverModes:
    def test_svd_mode_matches_ldlt(self):
        """SOLVER_SVD (scaled SVD solve with sv gating) reaches the same
        solution as the scaled LDLT path on a well-conditioned window."""
        from ldso_tpu.config import (SOLVER_SVD, SOLVER_ORTHOGONALIZE_X,
                                     SOLVER_FIX_LAMBDA)
        res = {}
        for mode in ("ldlt", "svd"):
            ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
                pose_noise=2e-3, idepth_noise=0.05, n_pts=100)
            solver = SOLVER_FIX_LAMBDA | SOLVER_ORTHOGONALIZE_X
            if mode == "svd":
                solver |= SOLVER_SVD
            ef.cfg = dataclasses.replace(CFG, force_accept_step=False,
                                         solver_mode=solver)
            ef.optimize(dIs, 10, w, h)
            T = np.asarray(current_poses(ef.W), np.float64)
            res[mode] = T
            assert not ef.is_lost
        rel_a = res["ldlt"][2] @ np.linalg.inv(res["ldlt"][0])
        rel_b = res["svd"][2] @ np.linalg.inv(res["svd"][0])
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(rel_a) @ rel_b)))
        assert np.linalg.norm(err) < 1e-3, f"svd vs ldlt pose diff {err}"

    def test_orthogonalize_system_mode_runs(self):
        """SOLVER_ORTHOGONALIZE_SYSTEM path executes and still converges
        (first frame present -> projection skipped; absent -> applied)."""
        from ldso_tpu.config import (SOLVER_ORTHOGONALIZE_SYSTEM,
                                     SOLVER_FIX_LAMBDA)
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
            pose_noise=2e-3, idepth_noise=0.05, n_pts=100)
        ef.cfg = dataclasses.replace(
            CFG, force_accept_step=False,
            solver_mode=SOLVER_FIX_LAMBDA | SOLVER_ORTHOGONALIZE_SYSTEM)
        ef.window_shells = []          # no frame 0 -> projection active
        rmse = ef.optimize(dIs, 10, w, h)
        assert not ef.is_lost
        assert np.isfinite(rmse)

    def test_momentum_mode_converges(self):
        """SOLVER_MOMENTUM (previous-step blending, FullSystem.cc:1557-1584)
        reaches the same solution as the plain path on a well-conditioned
        window."""
        from ldso_tpu.config import SOLVER_MOMENTUM, SOLVER_FIX_LAMBDA
        res = {}
        for mode in ("plain", "momentum"):
            ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
                pose_noise=2e-3, idepth_noise=0.05, n_pts=100)
            solver = SOLVER_FIX_LAMBDA
            if mode == "momentum":
                solver |= SOLVER_MOMENTUM
            ef.cfg = dataclasses.replace(CFG, force_accept_step=False,
                                         solver_mode=solver)
            rmse = ef.optimize(dIs, 10, w, h)
            assert not ef.is_lost and np.isfinite(rmse)
            res[mode] = np.asarray(current_poses(ef.W), np.float64)
        rel_a = res["plain"][2] @ np.linalg.inv(res["plain"][0])
        rel_b = res["momentum"][2] @ np.linalg.inv(res["momentum"][0])
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(rel_a) @ rel_b)))
        assert np.linalg.norm(err) < 1e-3, f"momentum vs plain diff {err}"

    def test_momentum_with_force_accept_runs(self):
        """MOMENTUM forces the host-orchestrated loop even under the default
        force-accept mode (the single-program device path has no
        previous-step state)."""
        from ldso_tpu.config import SOLVER_MOMENTUM, SOLVER_FIX_LAMBDA
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
            pose_noise=2e-3, idepth_noise=0.05, n_pts=100)
        ef.cfg = dataclasses.replace(
            CFG, solver_mode=SOLVER_FIX_LAMBDA | SOLVER_MOMENTUM)
        assert ef.cfg.force_accept_step
        rmse = ef.optimize(dIs, 10, w, h)
        assert not ef.is_lost and np.isfinite(rmse) and rmse < 3.0

    def test_stepmomentum_and_remove_poseprior_run(self):
        """SOLVER_STEPMOMENTUM adapts the step size; SOLVER_REMOVE_POSEPRIOR
        zeroes the idepth prior — both still converge."""
        from ldso_tpu.config import (SOLVER_STEPMOMENTUM,
                                     SOLVER_REMOVE_POSEPRIOR,
                                     SOLVER_FIX_LAMBDA)
        ef, dIs, poses, idep0, calib, (w, h) = _build_ef(
            pose_noise=2e-3, idepth_noise=0.05, n_pts=100)
        ef.cfg = dataclasses.replace(
            CFG, force_accept_step=False,
            solver_mode=(SOLVER_FIX_LAMBDA | SOLVER_STEPMOMENTUM
                         | SOLVER_REMOVE_POSEPRIOR))
        rmse = ef.optimize(dIs, 10, w, h)
        assert not ef.is_lost and np.isfinite(rmse)
