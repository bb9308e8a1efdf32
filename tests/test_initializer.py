"""CoarseInitializer tests: bootstrap on a synthetic translating sequence
(SURVEY.md §4 seam "initializer Schur step")."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.frontend import initializer
from ldso_tpu.math import lie
from ldso_tpu.ops.preprocess import make_pyramid
from ldso_tpu.synthetic import PlaneScene, default_calib

CFG = Config()


def _scene(w=160, h=120):
    calib = default_calib(w, h)
    scene = PlaneScene(freq_hi=40.0, contrast=70.0)
    return calib, scene


class TestSetFirst:
    def test_pools_built(self):
        calib, scene = _scene()
        img0, _ = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
        pyr0 = make_pyramid(img0, calib.levels)
        st = initializer.set_first(pyr0, calib, CFG)
        assert len(st.levels) == calib.levels
        for lvl, L in enumerate(st.levels):
            n = int(L.valid.sum())
            assert n > 30, f"level {lvl}: only {n} points"
            # neighbours are valid indices of valid points
            nb = np.asarray(L.neighbours)[np.asarray(L.valid)]
            assert (nb >= 0).all()
            assert (nb < L.u.shape[0]).all()
        # parents exist below the top level
        for lvl in range(calib.levels - 1):
            L = st.levels[lvl]
            par = np.asarray(L.parent)[np.asarray(L.valid)]
            assert (par >= 0).all()

    def test_nn_are_near(self):
        calib, scene = _scene()
        img0, _ = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
        pyr0 = make_pyramid(img0, calib.levels)
        st = initializer.set_first(pyr0, calib, CFG)
        L = st.levels[-1]
        valid = np.asarray(L.valid)
        u = np.asarray(L.u)[valid]
        v = np.asarray(L.v)[valid]
        nb = np.asarray(L.neighbours)[valid]
        # first neighbour is the point itself (distance 0)
        du = np.asarray(L.u)[nb[:, 0]] - u
        dv = np.asarray(L.v)[nb[:, 0]] - v
        assert np.all(du ** 2 + dv ** 2 < 1e-9)


class TestTrackFrame:
    def test_bootstrap_translating_sequence(self):
        """Feed a laterally-translating sequence; the initializer must snap
        and recover pose direction + plane depth structure up to scale."""
        calib, scene = _scene()
        img0, id0 = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
        pyr0 = make_pyramid(img0, calib.levels)
        st = initializer.set_first(pyr0, calib, CFG)

        step = np.array([0.04, 0.008, 0.0, 0.0, 0.0, 0.0])  # per-frame motion
        done = False
        n_frames = 0
        for i in range(1, 11):
            T_cw = lie.se3_exp(jnp.asarray(step * i, jnp.float64)).astype(jnp.float32)
            img, _ = scene.render(calib, T_cw)
            pyr = make_pyramid(img, calib.levels)
            done = initializer.track_frame(st, pyr0, pyr, calib, CFG)
            n_frames = i
            if done:
                break
        assert st.snapped, "initializer never snapped on a translating sequence"
        assert done, f"did not finish after {n_frames} frames"

        # recovered direction of translation matches ground truth direction
        t_est = st.T[:3, 3]
        t_true = np.asarray(lie.se3_exp(jnp.asarray(step * n_frames)))[:3, 3]
        cos = np.dot(t_est, t_true) / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
        assert cos > 0.99, f"translation direction off: cos={cos}"

        # idepth structure: after rescale, level-0 idepths should correlate
        # with ground truth (flat plane => nearly constant idepth ratio)
        L = st.levels[0]
        good = np.asarray(L.is_good & L.valid)
        assert good.sum() > 50
        est = np.asarray(L.idepth)[good]
        u = np.asarray(L.u)[good].astype(int)
        v = np.asarray(L.v)[good].astype(int)
        true = np.asarray(id0)[v, u]
        ratio = est / true
        spread = np.std(ratio) / np.mean(ratio)
        assert spread < 0.2, f"idepth structure inconsistent: spread={spread:.3f}"

    def test_no_snap_without_translation(self):
        """Pure in-place rotation must not snap (no parallax)."""
        calib, scene = _scene()
        img0, _ = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
        pyr0 = make_pyramid(img0, calib.levels)
        st = initializer.set_first(pyr0, calib, CFG)
        for i in range(1, 5):
            w = np.array([0.0, 0.0, 0.0, 0.0, 0.002 * i, 0.0])
            img, _ = scene.render(calib, lie.se3_exp(jnp.asarray(w)).astype(jnp.float32))
            pyr = make_pyramid(img, calib.levels)
            done = initializer.track_frame(st, pyr0, pyr, calib, CFG)
            assert not done
        assert not st.snapped


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
