"""Tests: camera models, rectification remap, photometric calib, preprocessing.

Covers the SURVEY.md §4 seams "undistort remap vs closed-form" and
"pyramid/gradient construction".
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ldso_tpu.camera.models import CameraModel, distort_coordinates, parse_calib_line
from ldso_tpu.camera.undistort import Undistorter, PhotometricCalib
from ldso_tpu.camera.calib import Calibration
from ldso_tpu.ops.preprocess import preprocess_frame, make_pyramid
from ldso_tpu.ops import interp


class TestModels:
    def test_pinhole_identity(self):
        pars = np.array([300.0, 300.0, 320.0, 240.0, 0.0])
        K = np.array([[300.0, 0, 320.0], [0, 300.0, 240.0], [0, 0, 1]])
        x = np.array([10.0, 320.0, 600.0])
        y = np.array([5.0, 240.0, 400.0])
        ox, oy = distort_coordinates(CameraModel.PINHOLE, pars, K, x, y)
        np.testing.assert_allclose(ox, x, atol=1e-12)
        np.testing.assert_allclose(oy, y, atol=1e-12)

    def test_fov_center_fixed(self):
        pars = np.array([300.0, 300.0, 320.0, 240.0, 0.9])
        K = np.array([[250.0, 0, 320.0], [0, 250.0, 240.0], [0, 0, 1]])
        ox, oy = distort_coordinates(CameraModel.FOV, pars, K,
                                     np.array([320.0]), np.array([240.0]))
        np.testing.assert_allclose(ox, [320.0], atol=1e-9)
        np.testing.assert_allclose(oy, [240.0], atol=1e-9)

    def test_fov_matches_scalar_formula(self):
        pars = np.array([300.0, 300.0, 320.0, 240.0, 0.9])
        K = np.array([[250.0, 0, 310.0], [0, 260.0, 230.0], [0, 0, 1]])
        x, y = 100.0, 50.0
        ix = (x - 310.0) / 250.0
        iy = (y - 230.0) / 260.0
        r = np.hypot(ix, iy)
        fac = np.arctan(r * 2.0 * np.tan(0.45)) / (0.9 * r)
        ox, oy = distort_coordinates(CameraModel.FOV, pars, K, np.array([x]), np.array([y]))
        np.testing.assert_allclose(ox, [300.0 * fac * ix + 320.0], rtol=1e-12)
        np.testing.assert_allclose(oy, [300.0 * fac * iy + 240.0], rtol=1e-12)

    def test_radtan_zero_coeffs_is_pinhole(self):
        pars = np.array([300.0, 305.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0])
        K = np.array([[280.0, 0, 315.0], [0, 285.0, 235.0], [0, 0, 1]])
        x = np.linspace(0, 639, 13)
        y = np.linspace(0, 479, 13)
        ox, oy = distort_coordinates(CameraModel.RADTAN, pars, K, x, y)
        px, py = distort_coordinates(CameraModel.PINHOLE, pars[:5], K, x, y)
        np.testing.assert_allclose(ox, px, atol=1e-10)
        np.testing.assert_allclose(oy, py, atol=1e-10)

    def test_equidistant_small_angle_limit(self):
        pars = np.array([300.0, 300.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0])
        K = np.array([[300.0, 0, 320.0], [0, 300.0, 240.0], [0, 0, 1]])
        # tiny angle: theta ~ r, distortion negligible
        ox, oy = distort_coordinates(CameraModel.EQUIDISTANT, pars, K,
                                     np.array([321.0]), np.array([240.5]))
        np.testing.assert_allclose(ox, [321.0], atol=1e-3)
        np.testing.assert_allclose(oy, [240.5], atol=1e-3)

    def test_kb_zero_coeffs_equals_equidistant_zero(self):
        pars = np.array([300.0, 300.0, 320.0, 240.0, 0.0, 0.0, 0.0, 0.0])
        K = np.array([[280.0, 0, 320.0], [0, 280.0, 240.0], [0, 0, 1]])
        x = np.linspace(10, 630, 7)
        y = np.linspace(10, 470, 7)
        kx, ky = distort_coordinates(CameraModel.KANNALA_BRANDT, pars, K, x, y)
        ex, ey = distort_coordinates(CameraModel.EQUIDISTANT, pars, K, x, y)
        np.testing.assert_allclose(kx, ex, rtol=1e-10)
        np.testing.assert_allclose(ky, ey, rtol=1e-10)

    def test_parse_calib_lines(self):
        m, p = parse_calib_line("0.349153 0.436593 0.493140 0.499021 0.933271")
        assert m == CameraModel.FOV and len(p) == 5
        m, _ = parse_calib_line("0.5 0.6 0.5 0.5 0")
        assert m == CameraModel.PINHOLE
        m, _ = parse_calib_line("RadTan 0.5 0.6 0.5 0.5 0.1 -0.05 0.001 0.002")
        assert m == CameraModel.RADTAN
        m, _ = parse_calib_line("0.5 0.6 0.5 0.5 0.1 -0.05 0.001 0.002")
        assert m == CameraModel.RADTAN
        m, _ = parse_calib_line("EquiDistant 0.5 0.6 0.5 0.5 0.1 0.01 0.001 0.0")
        assert m == CameraModel.EQUIDISTANT
        m, _ = parse_calib_line("KannalaBrandt 0.5 0.6 0.5 0.5 0.1 0.01 0.001 0.0")
        assert m == CameraModel.KANNALA_BRANDT


class TestUndistorter:
    def _tum_like(self, tmp_path):
        calib = tmp_path / "camera.txt"
        calib.write_text(
            "0.349153 0.436593 0.493140 0.499021 0.933271\n"
            "640 480\n"
            "crop\n"
            "640 480\n"
        )
        return str(calib)

    def test_crop_remap_valid_and_inside(self, tmp_path):
        u = Undistorter.from_file(self._tum_like(tmp_path))
        assert u.w == 640 and u.h == 480
        assert u.model == CameraModel.FOV
        valid = u.remap_x >= 0
        # crop mode should make (nearly) every output pixel valid
        assert valid.mean() > 0.99
        assert u.remap_x[valid].max() < u.w_org - 1
        assert u.remap_y[valid].max() < u.h_org - 1

    def test_remap_is_inverse_of_distortion(self, tmp_path):
        """distort(rectified px) == remap value — closed-form cross-check."""
        u = Undistorter.from_file(self._tum_like(tmp_path))
        xs, ys = np.meshgrid(np.arange(0, 640, 37, dtype=np.float64),
                             np.arange(0, 480, 31, dtype=np.float64))
        dx, dy = distort_coordinates(u.model, u.pars, u.K, xs, ys)
        sel = u.remap_x[::31, ::37][:ys.shape[0], :xs.shape[1]]
        sely = u.remap_y[::31, ::37][:ys.shape[0], :xs.shape[1]]
        ok = sel >= 0
        np.testing.assert_allclose(sel[ok], dx[ok], atol=2e-3)
        np.testing.assert_allclose(sely[ok], dy[ok], atol=2e-3)

    def test_pinhole_none_passthrough(self, tmp_path):
        calib = tmp_path / "camera.txt"
        calib.write_text("320 320 319.5 239.5 0\n640 480\nnone\n640 480\n")
        u = Undistorter.from_file(str(calib))
        assert u.passthrough
        xx, yy = np.meshgrid(np.arange(640), np.arange(480))
        np.testing.assert_allclose(u.remap_x, xx)
        np.testing.assert_allclose(u.remap_y, yy)


class TestPhotometric:
    def test_gamma_normalization(self, tmp_path):
        f = tmp_path / "pcalib.txt"
        G = np.linspace(10, 500, 256) ** 1.2
        f.write_text(" ".join(str(v) for v in G))
        vig = np.full((480, 640), 60000, np.uint16)
        pc = PhotometricCalib.load(str(f), vig, 640, 480)
        assert pc.valid
        assert pc.G[0] == 0.0 and abs(pc.G[-1] - 255.0) < 1e-4
        assert np.all(np.diff(pc.G) > 0)
        np.testing.assert_allclose(pc.vignette_inv, 1.0, atol=1e-6)

    def test_inverse_response_roundtrip(self, tmp_path):
        f = tmp_path / "pcalib.txt"
        G = (np.linspace(0, 1, 256) ** 2.2) * 255.0
        G[1:] += 1e-6 * np.arange(1, 256)  # strictly increasing
        f.write_text(" ".join(str(v) for v in G))
        pc = PhotometricCalib.load(str(f), None, 640, 480)
        B = pc.inverse_response_B()
        # B(G(x)) ~ x in the interior
        xs = np.arange(20, 235)
        vals = np.interp(pc.G[xs], np.arange(256), B)
        # piecewise-linear inversion, same granularity as the reference's
        # "stupid way" loop (FullSystem.cc:877-886): sub-bin accuracy
        np.testing.assert_allclose(vals, xs, atol=0.75)


class TestPyramid:
    def test_levels_and_gradient(self):
        img = jnp.asarray(np.random.RandomState(0).rand(64, 96).astype(np.float32) * 255)
        pyr = make_pyramid(img, 3)
        assert pyr.levels == 3
        assert pyr.dI[0].shape == (64, 96, 3)
        assert pyr.dI[1].shape == (32, 48, 3)
        assert pyr.dI[2].shape == (16, 24, 3)
        # central-difference check at an interior pixel
        i, j = 10, 20
        expect_dx = 0.5 * (img[i, j + 1] - img[i, j - 1])
        expect_dy = 0.5 * (img[i + 1, j] - img[i - 1, j])
        np.testing.assert_allclose(float(pyr.dI[0][i, j, 1]), float(expect_dx), rtol=1e-6)
        np.testing.assert_allclose(float(pyr.dI[0][i, j, 2]), float(expect_dy), rtol=1e-6)
        np.testing.assert_allclose(
            float(pyr.abs_grad[0][i, j]),
            float(expect_dx) ** 2 + float(expect_dy) ** 2, rtol=1e-6)

    def test_downsample_is_box_filter(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        pyr = make_pyramid(img, 2)
        l1 = np.asarray(pyr.dI[1][..., 0])
        np.testing.assert_allclose(l1, [[2.5, 4.5], [10.5, 12.5]])

    def test_preprocess_full_chain(self):
        h_org = w_org = 64
        rng = np.random.RandomState(1)
        raw = rng.randint(0, 255, (h_org, w_org)).astype(np.uint8)
        G = jnp.asarray(np.linspace(0, 255, 256).astype(np.float32))
        vig_inv = jnp.ones((h_org, w_org), jnp.float32)
        xx, yy = np.meshgrid(np.arange(w_org, dtype=np.float32),
                             np.arange(h_org, dtype=np.float32))
        pyr = preprocess_frame(jnp.asarray(raw), G, vig_inv,
                               jnp.asarray(xx), jnp.asarray(yy), None, 2)
        # identity remap reproduces the raw image (interior; the last
        # row/col interpolate across the clamped border)
        np.testing.assert_allclose(np.asarray(pyr.dI[0][1:-1, 1:-1, 0]),
                                   raw[1:-1, 1:-1].astype(np.float32), atol=1e-3)

    def test_gamma_weighting_changes_absgrad(self):
        img = jnp.asarray(np.random.RandomState(0).rand(32, 32).astype(np.float32) * 255)
        b_grad = jnp.asarray(np.full(256, 0.5, np.float32))
        p1 = make_pyramid(img, 1)
        p2 = make_pyramid(img, 1, b_grad)
        np.testing.assert_allclose(np.asarray(p2.abs_grad[0]),
                                   0.25 * np.asarray(p1.abs_grad[0]), rtol=1e-5)


class TestInterp:
    def test_bilinear_exact_on_grid(self):
        img = jnp.asarray(np.random.RandomState(0).rand(16, 20).astype(np.float32))
        xs = jnp.array([3.0, 7.0, 10.0])
        ys = jnp.array([2.0, 5.0, 9.0])
        vals = interp.bilinear(img, xs, ys)
        expect = [img[2, 3], img[5, 7], img[9, 10]]
        np.testing.assert_allclose(np.asarray(vals), np.asarray(expect), rtol=1e-6)

    def test_bilinear_linear_function(self):
        """Bilinear interp of a linear ramp is exact everywhere."""
        xx, yy = np.meshgrid(np.arange(20, dtype=np.float32),
                             np.arange(16, dtype=np.float32))
        img = jnp.asarray(2.0 * xx + 3.0 * yy + 1.0)
        xs = jnp.array([3.25, 7.5, 11.75])
        ys = jnp.array([2.5, 5.125, 9.875])
        vals = interp.bilinear(img, xs, ys)
        np.testing.assert_allclose(np.asarray(vals),
                                   2.0 * np.asarray(xs) + 3.0 * np.asarray(ys) + 1.0,
                                   rtol=1e-6)

    def test_bilinear_multichannel(self):
        img = jnp.asarray(np.random.RandomState(0).rand(8, 8, 3).astype(np.float32))
        v = interp.bilinear(img, jnp.array([2.5]), jnp.array([3.5]))
        assert v.shape == (1, 3)
        expect = 0.25 * (img[3, 2] + img[3, 3] + img[4, 2] + img[4, 3])
        np.testing.assert_allclose(np.asarray(v[0]), np.asarray(expect), rtol=1e-6)


class TestSynthetic:
    def test_render_photometric_consistency(self):
        """A point visible in two frames has the same intensity (direct-SLAM
        invariant the whole pipeline relies on)."""
        from ldso_tpu.synthetic import PlaneScene, default_calib
        from ldso_tpu.math import lie
        calib = default_calib(128, 96)
        scene = PlaneScene()
        T0 = jnp.eye(4, dtype=jnp.float32)
        xi = jnp.array([0.05, -0.02, 0.01, 0.004, -0.006, 0.002], jnp.float32)
        T1 = lie.se3_exp(xi)  # cam1 <- world
        img0, id0 = scene.render(calib, T0)
        img1, _ = scene.render(calib, T1)

        # project the center pixel of cam0 into cam1 and compare intensity
        u, v = 64, 48
        fx, fy, cx, cy = calib.fx[0], calib.fy[0], calib.cx[0], calib.cy[0]
        z = 1.0 / float(id0[v, u])
        X = np.array([(u - cx) / fx * z, (v - cy) / fy * z, z, 1.0])
        X1 = np.asarray(T1, np.float64) @ X
        u1 = fx * X1[0] / X1[2] + cx
        v1 = fy * X1[1] / X1[2] + cy
        val1 = float(interp.bilinear(img1, jnp.array([u1]), jnp.array([v1]))[0])
        assert abs(val1 - float(img0[v, u])) < 1.0  # sub-intensity-level match

    def test_idepth_positive_and_smooth(self):
        from ldso_tpu.synthetic import PlaneScene, default_calib
        calib = default_calib(64, 64)
        img, idep = PlaneScene().render(calib, jnp.eye(4, dtype=jnp.float32))
        assert np.all(np.asarray(idep) > 0)
        assert 0.2 < float(idep.mean()) < 1.0
        assert float(img.std()) > 10.0  # textured


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
