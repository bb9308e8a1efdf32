"""CoarseTracker tests: synthetic motion recovery (SURVEY.md §4 seam
"8x8 tracker GN step").
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.frontend import tracker
from ldso_tpu.math import lie
from ldso_tpu.ops.preprocess import make_pyramid
from ldso_tpu.synthetic import PlaneScene, default_calib

CFG = Config(tracker_caps=(8192, 4096, 2048, 1024, 512, 256))


def _setup(w=160, h=120):
    calib = default_calib(w, h)
    scene = PlaneScene()
    img0, id0 = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
    pyr0 = make_pyramid(img0, calib.levels)
    ref = tracker.make_tracker_ref_from_idepth(id0, pyr0, calib,
                                               CFG.tracker_caps[:calib.levels],
                                               stride=2)
    return calib, scene, ref


class TestTrackerRef:
    def test_ref_points_cover_levels(self):
        calib, scene, ref = _setup()
        for lvl in range(calib.levels):
            n = int(ref.valid[lvl].sum())
            assert n > 50, f"level {lvl} has too few points ({n})"
            pts = np.asarray(ref.points[lvl])[np.asarray(ref.valid[lvl])]
            assert np.all(pts[:, 2] > 0)          # idepth positive
            assert np.all(pts[:, 0] >= 2) and np.all(pts[:, 1] >= 2)

    def test_splat_and_dilate(self):
        """A sparse splat gets dilated into its neighbourhood."""
        calib = default_calib(64, 64)
        scene = PlaneScene()
        img0, _ = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
        pyr0 = make_pyramid(img0, calib.levels)
        u = jnp.array([32.0])
        v = jnp.array([32.0])
        idep = jnp.array([0.5])
        w = jnp.array([1.0])
        ok = jnp.array([True])
        ref = tracker.make_tracker_ref(u, v, idep, w, ok, pyr0.dI,
                                       1.0, jnp.zeros(2),
                                       calib, CFG.tracker_caps[:calib.levels])
        n0 = int(ref.valid[0].sum())
        assert n0 >= 1  # the splat itself (dilation adds diagonal neighbours)
        pts = np.asarray(ref.points[0])[np.asarray(ref.valid[0])]
        np.testing.assert_allclose(pts[:, 2], 0.5, rtol=1e-5)


class TestTracking:
    def _track(self, xi_true, coarsest=None, T_init=None):
        calib, scene, ref = _setup()
        T_true = lie.se3_exp(jnp.asarray(xi_true, jnp.float64)).astype(jnp.float32)
        img1, _ = scene.render(calib, T_true)
        pyr1 = make_pyramid(img1, calib.levels)
        if coarsest is None:
            coarsest = calib.levels - 1
        if T_init is None:
            T_init = jnp.eye(4, dtype=jnp.float32)
        min_abort = jnp.full((calib.levels,), 1e9, jnp.float32)
        T, aff, ok, res, flow = tracker.track_frame(
            ref, pyr1, T_init, jnp.zeros(2, jnp.float32), jnp.float32(1.0),
            min_abort, calib, CFG, coarsest)
        return np.asarray(T), np.asarray(T_true), bool(ok), np.asarray(res), np.asarray(aff)

    def test_identity_motion(self):
        T, T_true, ok, res, _ = self._track([0, 0, 0, 0, 0, 0])
        assert ok
        np.testing.assert_allclose(T, np.eye(4), atol=5e-4)
        assert res[0] < 0.5  # photometric residual ~0 on a noiseless pair

    def test_small_translation(self):
        xi = [0.02, -0.01, 0.005, 0.0, 0.0, 0.0]
        T, T_true, ok, res, _ = self._track(xi)
        assert ok
        err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_true) @ T, jnp.float64)))
        assert np.linalg.norm(err) < 2e-3, f"pose error {err}"

    def test_small_rotation(self):
        xi = [0.0, 0.0, 0.0, 0.004, -0.008, 0.003]
        T, T_true, ok, res, _ = self._track(xi)
        assert ok
        err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_true) @ T, jnp.float64)))
        assert np.linalg.norm(err) < 2e-3, f"pose error {err}"

    def test_combined_motion_coarse_to_fine(self):
        xi = [0.04, 0.02, -0.01, 0.01, 0.02, -0.005]
        T, T_true, ok, res, _ = self._track(xi)
        assert ok
        err = np.asarray(lie.se3_log(jnp.asarray(np.linalg.inv(T_true) @ T, jnp.float64)))
        assert np.linalg.norm(err) < 5e-3, f"pose error {err}"
        assert res[0] < 2.0

    def test_affine_recovery(self):
        """Brightness change absorbed by (a, b)."""
        calib, scene, ref = _setup()
        xi = jnp.array([0.01, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32)
        T_true = lie.se3_exp(xi)
        img1, _ = scene.render(calib, T_true, aff_a=0.15, aff_b=8.0)
        pyr1 = make_pyramid(img1, calib.levels)
        min_abort = jnp.full((calib.levels,), 1e9, jnp.float32)
        T, aff, ok, res, flow = tracker.track_frame(
            ref, pyr1, jnp.eye(4, dtype=jnp.float32), jnp.zeros(2, jnp.float32),
            jnp.float32(1.0), min_abort, calib, CFG, calib.levels - 1)
        assert bool(ok)
        # recovered relative affine should match the injected one
        assert abs(float(aff[0]) - 0.15) < 0.03
        assert abs(float(aff[1]) - 8.0) < 2.0
        err = np.asarray(lie.se3_log(
            jnp.asarray(np.linalg.inv(np.asarray(T_true)) @ np.asarray(T), jnp.float64)))
        assert np.linalg.norm(err) < 3e-3

    def test_failure_on_abort_threshold(self):
        """A tight minResForAbort causes early failure (retry trigger)."""
        calib, scene, ref = _setup()
        img1, _ = scene.render(calib, lie.se3_exp(
            jnp.array([0.3, 0.2, 0.0, 0.1, 0.1, 0.0], jnp.float32)))
        pyr1 = make_pyramid(img1, calib.levels)
        min_abort = jnp.full((calib.levels,), 1e-6, jnp.float32)
        _, _, ok, _, _ = tracker.track_frame(
            ref, pyr1, jnp.eye(4, dtype=jnp.float32), jnp.zeros(2, jnp.float32),
            jnp.float32(1.0), min_abort, calib, CFG, calib.levels - 1)
        assert not bool(ok)

    def test_packed_taps_bit_identical(self):
        """tracker_packed_taps=True (one packed gather per warp) must be
        bit-identical to the plain 4-tap formulation."""
        calib, scene, ref = _setup()
        xi = jnp.array([0.03, 0.01, -0.005, 0.004, 0.01, -0.002], jnp.float32)
        img1, _ = scene.render(calib, lie.se3_exp(xi))
        pyr1 = make_pyramid(img1, calib.levels)
        min_abort = jnp.full((calib.levels,), 1e9, jnp.float32)
        outs = {}
        for packed in (True, False):
            cfg = dataclasses.replace(CFG, tracker_packed_taps=packed)
            outs[packed] = tracker.track_frame(
                ref, pyr1, jnp.eye(4, dtype=jnp.float32),
                jnp.zeros(2, jnp.float32), jnp.float32(1.0), min_abort,
                calib, cfg, calib.levels - 1)
        for a, b in zip(outs[True], outs[False]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_hypothesis_batch(self):
        """vmapped multi-hypothesis tracking picks up the right motion."""
        calib, scene, ref = _setup()
        xi_true = jnp.array([0.06, 0.0, 0.0, 0.0, 0.03, 0.0], jnp.float32)
        T_true = lie.se3_exp(xi_true)
        img1, _ = scene.render(calib, T_true)
        pyr1 = make_pyramid(img1, calib.levels)
        min_abort = jnp.full((calib.levels,), 1e9, jnp.float32)
        inits = jnp.stack([
            jnp.eye(4, dtype=jnp.float32),
            lie.se3_exp(jnp.array([0.05, 0, 0, 0, 0.025, 0], jnp.float32)),
            lie.se3_exp(jnp.array([-0.1, 0, 0, 0, -0.05, 0], jnp.float32)),
        ])
        T, aff, ok, res, flow = tracker.track_frame_hypotheses(
            ref, pyr1, inits, jnp.zeros(2, jnp.float32), jnp.float32(1.0),
            min_abort, calib, CFG, calib.levels - 1)
        assert T.shape == (3, 4, 4)
        best = int(np.nanargmin(np.asarray(res)[:, 0]))
        err = np.asarray(lie.se3_log(jnp.asarray(
            np.linalg.inv(np.asarray(T_true)) @ np.asarray(T[best]), jnp.float64)))
        assert np.linalg.norm(err) < 5e-3

    def test_rank_hypotheses(self):
        """The coarse ranking pre-pass scores the near-true initialization
        best and an off-image one inf."""
        calib, scene, ref = _setup()
        xi_true = jnp.array([0.06, 0.0, 0.0, 0.0, 0.03, 0.0], jnp.float32)
        T_true = lie.se3_exp(xi_true)
        img1, _ = scene.render(calib, T_true)
        pyr1 = make_pyramid(img1, calib.levels)
        inits = jnp.stack([
            lie.se3_exp(jnp.array([0.055, 0, 0, 0, 0.028, 0], jnp.float32)),
            jnp.eye(4, dtype=jnp.float32),
            lie.se3_exp(jnp.array([0.4, 0.3, 0, 0.5, 0.5, 0], jnp.float32)),
            lie.se3_exp(jnp.array([0, 0, -50.0, 0, 0, 0], jnp.float32)),
        ])
        scores = np.asarray(tracker.rank_hypotheses(
            ref, pyr1, inits, jnp.zeros(2, jnp.float32), jnp.float32(1.0),
            calib, CFG, calib.levels - 1))
        assert scores.shape == (4,)
        assert int(np.argmin(scores)) == 0
        assert scores[0] < scores[1]
        assert np.isinf(scores[3])          # behind/off the image


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
