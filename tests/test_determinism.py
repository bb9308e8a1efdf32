"""Determinism + perturbation tests.

The reference's regression strategy is synchronous-mode float-tolerance
trajectory replay (SURVEY.md §4: preset=0 + playbackSpeed=0 pipeline,
seeded selection). The rebuild must reproduce trajectories bit-for-bit
across runs of the same process configuration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.math import lie
from ldso_tpu.synthetic import PlaneScene, default_calib
from ldso_tpu.system.full_system import FullSystem


def _run_once(images, calib, cfg):
    fs = FullSystem(calib, cfg)
    for i, img in enumerate(images):
        fs.add_active_frame(img, i, 1.0, i * 0.05)
        if fs.is_lost or fs.init_failed:
            break
    _, poses = fs.trajectory()
    return np.stack(poses) if poses else np.zeros((0, 4, 4))


class TestDeterminism:
    def test_replay_bit_exact(self):
        cfg = Config(max_points=512, max_immature=512,
                     tracker_caps=(4096, 2048, 1024, 512, 256, 128),
                     desired_point_density=300, desired_immature_density=250,
                     enable_loop_closing=False)
        calib = default_calib(160, 120)
        scene = PlaneScene(freq_hi=25.0, contrast=80.0)
        images = []
        for i in range(14):
            t = np.concatenate([[0.035 * i, 0.01 * np.sin(0.2 * i), 0.003 * i],
                                [0, 0.0015 * i, 0]])
            T = np.linalg.inv(np.asarray(lie.se3_exp(jnp.asarray(t))))
            img, _ = scene.render(calib, jnp.asarray(T, jnp.float32))
            images.append(np.asarray(img))

        p1 = _run_once(images, calib, cfg)
        p2 = _run_once(images, calib, cfg)
        assert p1.shape == p2.shape and len(p1) > 5
        np.testing.assert_array_equal(p1, p2)


class TestPerturb:
    def test_warp_noise_bounded(self):
        from ldso_tpu.ops import perturb
        calib = default_calib(96, 96)
        img, _ = PlaneScene().render(calib, jnp.eye(4, dtype=jnp.float32))
        out = perturb.warp_noise(img, jax.random.PRNGKey(0), var_noise=1.5)
        assert out.shape == img.shape
        d = np.abs(np.asarray(out) - np.asarray(img))
        assert d.mean() > 0.01          # actually perturbed
        assert np.asarray(out).min() >= 0.0

    def test_blur_reduces_gradient(self):
        from ldso_tpu.ops import perturb
        from ldso_tpu.ops.preprocess import make_pyramid
        calib = default_calib(96, 96)
        img, _ = PlaneScene(freq_hi=40.0).render(calib,
                                                 jnp.eye(4, dtype=jnp.float32))
        out = perturb.blur_noise(img, jax.random.PRNGKey(1), var_blur=2.0)
        g0 = float(make_pyramid(img, 1).abs_grad[0].mean())
        g1 = float(make_pyramid(out, 1).abs_grad[0].mean())
        assert g1 < 0.8 * g0

    def test_zero_noise_identity(self):
        from ldso_tpu.ops import perturb
        calib = default_calib(64, 64)
        img, _ = PlaneScene().render(calib, jnp.eye(4, dtype=jnp.float32))
        out = perturb.warp_noise(img, jax.random.PRNGKey(0), var_noise=0.0)
        # interior exact; the border row/col resamples at the 0.01 px clip
        np.testing.assert_allclose(np.asarray(out)[1:-1, 1:-1],
                                   np.asarray(img)[1:-1, 1:-1], atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
