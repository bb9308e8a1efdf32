"""ORB detector / matcher tests (SURVEY.md §2 C20-C21)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.frontend import detector
from ldso_tpu.ops.preprocess import make_pyramid
from ldso_tpu.synthetic import PlaneScene, default_calib
from ldso_tpu.math import lie


def _scene_pyr(T=None, w=320, h=240):
    calib = default_calib(w, h)
    scene = PlaneScene(freq_hi=45.0, contrast=80.0, n_waves=40)
    if T is None:
        T = jnp.eye(4, dtype=jnp.float32)
    img, idep = scene.render(calib, T)
    return calib, scene, make_pyramid(img, calib.levels), idep


class TestShiTomasi:
    def test_matches_naive(self):
        calib, scene, pyr, _ = _scene_pyr(w=64, h=64)
        st = np.asarray(detector.shi_tomasi_map(pyr.dI[0]))
        dI = np.asarray(pyr.dI[0])
        u, v = 30, 25
        hb = 4
        gx = dI[v - hb:v + hb, u - hb:u + hb, 1]
        gy = dI[v - hb:v + hb, u - hb:u + hb, 2]
        area = (2 * hb) ** 2
        dXX = (gx ** 2).sum() / (2 * area)
        dYY = (gy ** 2).sum() / (2 * area)
        dXY = (gx * gy).sum() / (2 * area)
        expect = 0.5 * (dXX + dYY - np.sqrt((dXX + dYY) ** 2
                                            - 4 * (dXX * dYY - dXY ** 2)))
        np.testing.assert_allclose(st[v, u], expect, rtol=1e-4)


class TestDetect:
    def test_detect_basic(self):
        calib, scene, pyr, _ = _scene_pyr()
        feats = detector.detect_corners(pyr.dI[0], pyr.abs_grad[0], 600)
        n = int(feats["valid"].sum())
        nc = int(feats["is_corner"].sum())
        assert n > 200, f"only {n} features"
        assert nc > 20, f"only {nc} corners"
        # NMS: corners are >= 5 px apart
        m = np.asarray(feats["is_corner"])
        u = np.asarray(feats["u"])[m]
        v = np.asarray(feats["v"])[m]
        pts = np.stack([u, v], 1)
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        d[np.diag_indices(len(pts))] = 100
        assert d.min() >= 5.0

    def test_descriptor_rotation_invariance(self):
        """Same corner under in-plane rotation keeps a low Hamming distance
        (the point of the steered BRIEF)."""
        calib, scene, pyr, _ = _scene_pyr()
        feats = detector.detect_corners(pyr.dI[0], pyr.abs_grad[0], 600)
        m = np.asarray(feats["is_corner"] & feats["valid"])
        # rotate the image content by rolling texture coords: instead rotate
        # the camera about z (pure in-plane rotation of the view)
        T = np.asarray(lie.se3_exp(jnp.asarray([0, 0, 0, 0, 0, 0.35])), np.float64)
        calib2, scene2, pyr2, _ = _scene_pyr(jnp.asarray(T, jnp.float32))
        feats2 = detector.detect_corners(pyr2.dI[0], pyr2.abs_grad[0], 600)
        m2 = np.asarray(feats2["is_corner"] & feats2["valid"])
        match, dist = detector.match_descriptors(
            feats["desc"], feats["is_corner"] & feats["valid"],
            feats2["desc"], feats2["is_corner"] & feats2["valid"])
        matched = np.asarray(match) >= 0
        assert matched.sum() >= 5, f"only {matched.sum()} rotation-invariant matches"

    def test_matching_under_translation(self):
        calib, scene, pyr, idep = _scene_pyr()
        T = lie.se3_exp(jnp.asarray([0.05, 0.02, 0, 0, 0, 0], jnp.float64)).astype(jnp.float32)
        _, _, pyr2, _ = _scene_pyr(T)
        f1 = detector.detect_corners(pyr.dI[0], pyr.abs_grad[0], 600)
        f2 = detector.detect_corners(pyr2.dI[0], pyr2.abs_grad[0], 600)
        v1 = f1["is_corner"] & f1["valid"]
        v2 = f2["is_corner"] & f2["valid"]
        match, dist = detector.match_descriptors(f1["desc"], v1, f2["desc"], v2)
        mnp = np.asarray(match)
        ok = mnp >= 0
        assert ok.sum() >= 8
        # verify the matches geometrically: reproject with GT depth
        fx, fy = calib.fx[0], calib.fy[0]
        cx, cy = calib.cx[0], calib.cy[0]
        u1 = np.asarray(f1["u"])[ok]
        v1p = np.asarray(f1["v"])[ok]
        id1 = np.asarray(idep)[v1p.astype(int), u1.astype(int)]
        z = 1.0 / id1
        X = np.stack([(u1 - cx) / fx * z, (v1p - cy) / fy * z, z,
                      np.ones_like(z)], 0)
        Xc = np.asarray(T, np.float64) @ X
        up = fx * Xc[0] / Xc[2] + cx
        vp = fy * Xc[1] / Xc[2] + cy
        u2 = np.asarray(f2["u"])[mnp[ok]]
        v2p = np.asarray(f2["v"])[mnp[ok]]
        err = np.hypot(up - u2, vp - v2p)
        assert np.median(err) < 2.5, f"median reprojection {np.median(err):.2f}px"

    def test_device_status_map_matches_host_selection(self):
        """detect_status_map (device-only path, loop closing off) selects
        the same candidate pixels as detect_corners' host selection (the
        corner flag / NMS stages don't feed the status map)."""
        rng = np.random.RandomState(7)
        H, W = 96, 128
        img = rng.rand(H, W).astype(np.float32) * 120
        gy, gx = np.gradient(img)
        dI = jnp.asarray(np.stack([img, gx, gy], -1))
        ag = jnp.asarray((gx ** 2 + gy ** 2).astype(np.float32))
        n_feat = 120

        feats = detector.detect_corners(dI, ag, n_feat, max_feats=512)
        valid = np.asarray(feats["valid"])
        hu = np.asarray(feats["u"])[valid].astype(int)
        hv = np.asarray(feats["v"])[valid].astype(int)
        host_set = set(zip(hu.tolist(), hv.tolist()))

        gp = detector.detect_grid_params(H, W, n_feat)
        status = np.asarray(detector.detect_status_map(dI, ag, *gp))
        du, dv = np.nonzero(status.T)
        dev_set = set(zip(du.tolist(), dv.tolist()))

        # identical up to capacity truncation of the host path
        assert dev_set, "device path selected nothing"
        inter = len(dev_set & host_set)
        assert inter >= 0.9 * min(len(dev_set), len(host_set)), (
            f"device/host selection disagree: {inter} common of "
            f"{len(dev_set)} vs {len(host_set)}")

    def test_hamming_matrix_basics(self):
        a = jnp.asarray(np.array([[0, 0, 0, 0, 0, 0, 0, 0]], np.uint32))
        b = jnp.asarray(np.array([[0xFFFFFFFF] * 8,
                                  [0, 0, 0, 0, 0, 0, 0, 1]], np.uint32))
        d = np.asarray(detector.hamming_matrix(a, b))
        assert d[0, 0] == 256
        assert d[0, 1] == 1


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
