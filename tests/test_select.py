"""Pixel-selection tests (SURVEY.md §4 seam: selection determinism/density)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import Config
from ldso_tpu.ops import select
from ldso_tpu.ops.preprocess import make_pyramid
from ldso_tpu.synthetic import PlaneScene, default_calib


def _pyr(w=320, h=240, sharp=False):
    calib = default_calib(w, h)
    scene = PlaneScene(freq_hi=60.0, contrast=80.0) if sharp else PlaneScene()
    img, _ = scene.render(calib, jnp.eye(4, dtype=jnp.float32))
    return make_pyramid(img, calib.levels)


class TestThresholdMap:
    def test_shape_and_positive(self):
        pyr = _pyr()
        ths = select.make_threshold_map(pyr.abs_grad[0])
        assert ths.shape == (240 // 32, 320 // 32)
        assert np.all(np.asarray(ths) >= 49.0)  # (quantile+7)^2 >= 49

    def test_flat_image_threshold_floor(self):
        flat = jnp.zeros((64, 64), jnp.float32)
        pyr = make_pyramid(flat, 1)
        ths = select.make_threshold_map(pyr.abs_grad[0])
        # all-zero gradients: quantile 0, ths = (0 + 7)^2
        np.testing.assert_allclose(np.asarray(ths), 49.0)


class TestSelect:
    def test_statuses_and_spacing(self):
        pyr = _pyr(sharp=True)
        ths = select.make_threshold_map(pyr.abs_grad[0])
        status, counts = select.select(pyr.dI[0], pyr.abs_grad[0],
                                       pyr.abs_grad[1], pyr.abs_grad[2],
                                       ths, pot=3)
        st = np.asarray(status)
        assert set(np.unique(st)).issubset({0, 1, 2, 4})
        n1 = int(counts[0])
        assert n1 > 100  # textured scene selects plenty
        # at most one status-1 point per pot-block
        H, W = st.shape
        blocks = st[: (H // 3) * 3, : (W // 3) * 3].reshape(H // 3, 3, W // 3, 3)
        per_block = (blocks == 1).sum(axis=(1, 3))
        assert per_block.max() <= 1

    def test_smooth_scene_falls_back_to_coarse_levels(self):
        """On a low-texture image level-1 never fires but levels 2/4 do —
        the reference's fallback behaviour for weak-gradient regions."""
        pyr = _pyr(sharp=False)
        ths = select.make_threshold_map(pyr.abs_grad[0])
        _, counts = select.select(pyr.dI[0], pyr.abs_grad[0],
                                  pyr.abs_grad[1], pyr.abs_grad[2], ths, pot=3)
        assert int(counts[0]) == 0 and int(counts[1]) > 100

    def test_determinism(self):
        pyr = _pyr()
        ths = select.make_threshold_map(pyr.abs_grad[0])
        a = select.select(pyr.dI[0], pyr.abs_grad[0], pyr.abs_grad[1],
                          pyr.abs_grad[2], ths, pot=3)[0]
        b = select.select(pyr.dI[0], pyr.abs_grad[0], pyr.abs_grad[1],
                          pyr.abs_grad[2], ths, pot=3)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_border_excluded(self):
        pyr = _pyr()
        ths = select.make_threshold_map(pyr.abs_grad[0])
        st = np.asarray(select.select(pyr.dI[0], pyr.abs_grad[0],
                                      pyr.abs_grad[1], pyr.abs_grad[2],
                                      ths, pot=3)[0])
        assert st[:4, :].sum() == 0 and st[:, :4].sum() == 0
        assert st[-3:, :].sum() == 0 and st[:, -5:].sum() == 0


class TestMakeMaps:
    def test_density_adaptation(self):
        pyr = _pyr()
        cfg = Config()
        sel = select.PixelSelector(320, 240, cfg)
        want = 800.0
        status, n = sel.make_maps(pyr, want)
        # adapted count should be in the right ballpark
        assert 0.3 * want < n < 2.0 * want, f"selected {n}, wanted {want}"

    def test_subsample_deterministic(self):
        pyr = _pyr()
        cfg = Config()
        s1 = select.PixelSelector(320, 240, cfg)
        s2 = select.PixelSelector(320, 240, cfg)
        a, na = s1.make_maps(pyr, 300.0)
        b, nb = s2.make_maps(pyr, 300.0)
        assert na == nb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGridMax:
    def test_selects_strong_gradients(self):
        pyr = _pyr(128, 128)
        out, n = select.grid_max_selection(pyr.dI[1], pot=5)
        n = int(n)
        assert n > 20
        mask = np.asarray(out)
        gx = np.asarray(pyr.dI[1][..., 1])
        gy = np.asarray(pyr.dI[1][..., 2])
        sq = gx ** 2 + gy ** 2
        assert (sq[mask] > (select.MIN_USE_GRAD * 0.75) ** 2).all()

    def test_make_pixel_status_density(self):
        pyr = _pyr(256, 192)
        out, n, sp = select.make_pixel_status(pyr.dI[1], desired_density=150.0)
        assert 40 < n < 600


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestPallasDistance:
    def test_matches_xla_reference(self):
        import jax.numpy as jnp
        from ldso_tpu.ops.distance_map import distance_transform
        from ldso_tpu.ops.pallas_kernels import distance_transform_pallas
        rng = np.random.RandomState(0)
        occ = rng.rand(64, 96) < 0.01
        ref = np.asarray(distance_transform(jnp.asarray(occ)))
        pal = np.asarray(distance_transform_pallas(jnp.asarray(occ),
                                                   interpret=True))
        np.testing.assert_allclose(pal, ref, atol=0)

    def test_empty_map(self):
        import jax.numpy as jnp
        from ldso_tpu.ops.pallas_kernels import distance_transform_pallas
        occ = np.zeros((32, 32), bool)
        out = np.asarray(distance_transform_pallas(jnp.asarray(occ),
                                                   interpret=True))
        assert (out == 1000.0).all()
