"""Synthetic photometric scene generation with exact ground truth.

No SLAM datasets ship in this environment, so tests and the benchmark run
on procedurally generated sequences: a smooth, band-limited procedural
texture painted on a 3D plane, rendered through the same pinhole model the
pipeline assumes. This gives analytically consistent images under camera
motion, exact ground-truth poses and inverse depths, and infinite
sub-pixel resolution (no resampling artifacts) — ideal for validating
direct photometric alignment to float tolerance.

The reference validates end-to-end on TUM/KITTI/EuRoC only (SURVEY.md §4);
this module is the rebuild's synthetic-parity harness.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldso_tpu.camera.calib import Calibration
from ldso_tpu.math import lie


@dataclasses.dataclass(frozen=True)
class PlaneScene:
    """A textured plane n.X = d in world coordinates (camera-0 frame)."""

    n: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    d: float = 3.0                      # plane offset: z = 3m ahead
    n_waves: int = 24
    seed: int = 7
    contrast: float = 60.0
    base: float = 128.0
    freq_lo: float = 0.5                # texture band (rad / meter)
    freq_hi: float = 12.0

    def _texture_params(self):
        rng = np.random.RandomState(self.seed)
        freqs = rng.uniform(self.freq_lo, self.freq_hi, size=(self.n_waves, 2))
        phases = rng.uniform(0, 2 * np.pi, size=self.n_waves)
        amps = rng.uniform(0.3, 1.0, size=self.n_waves)
        amps = amps / amps.sum()
        return (jnp.asarray(freqs, jnp.float32), jnp.asarray(phases, jnp.float32),
                jnp.asarray(amps, jnp.float32))

    def texture(self, u, v):
        """Procedural intensity at plane coordinates (u, v); range ~0..255."""
        freqs, phases, amps = self._texture_params()
        uf = u.reshape(-1)[None, :]
        vf = v.reshape(-1)[None, :]
        phase = freqs[:, 0][:, None] * uf + freqs[:, 1][:, None] * vf + phases[:, None]
        val = jnp.sum(amps[:, None] * jnp.sin(phase), axis=0)
        return (self.base + self.contrast * 2.0 * val).reshape(u.shape)

    def render(self, calib: Calibration, T_cw, lvl: int = 0,
               exposure: float = 1.0, aff_a: float = 0.0, aff_b: float = 0.0):
        """Render the plane seen from camera pose T_cw (world->cam, 4x4).

        Returns (image (H,W) f32, idepth (H,W) f32 in the camera frame).
        Affine (a, b) apply as I' = exp(a) * I + b, matching the DSO
        brightness-transfer convention."""
        w, h = calib.w[lvl], calib.h[lvl]
        fx, fy, cx, cy = calib.fx[lvl], calib.fy[lvl], calib.cx[lvl], calib.cy[lvl]
        T_wc = lie.se3_inv(jnp.asarray(T_cw, jnp.float32))
        R = T_wc[:3, :3]
        o = T_wc[:3, 3]

        xs, ys = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                              jnp.arange(h, dtype=jnp.float32))
        rays_cam = jnp.stack([(xs - cx) / fx, (ys - cy) / fy, jnp.ones_like(xs)], -1)
        rays_w = jnp.einsum("ij,hwj->hwi", R, rays_cam)

        n = jnp.asarray(self.n, jnp.float32)
        denom = jnp.einsum("hwi,i->hw", rays_w, n)
        t = (self.d - jnp.dot(o, n)) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        X = o[None, None, :] + t[..., None] * rays_w

        img = self.texture(X[..., 0], X[..., 1])
        img = jnp.exp(aff_a) * img + aff_b
        img = jnp.clip(img * exposure, 0.0, 255.0)
        # inverse *z*-depth in camera frame (DSO parameterization); the ray
        # param t is along rays_w = R @ rays_cam with rays_cam z == 1, so
        # camera-frame depth z == t.
        z_cam = t
        idepth = jnp.where(t > 1e-6, 1.0 / jnp.maximum(z_cam, 1e-6), 0.0)
        return img.astype(jnp.float32), idepth.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class BoxScene:
    """Fronto-parallel textured rectangles at different depths over a
    background plane: depth DISCONTINUITIES and viewpoint-dependent
    OCCLUSION (VERDICT r3 #8 — the smooth single plane never exercises
    the trace's OOB handling, selection at depth edges, or loop matching
    across parallax). Rendered by per-pixel nearest-hit ray casting
    against K+1 z=const planes, so ground-truth poses and inverse depth
    stay exact and resampling-free like PlaneScene."""

    n_boxes: int = 7
    seed: int = 11
    z_bg: float = 4.5
    z_lo: float = 1.8
    z_hi: float = 3.2
    n_waves: int = 24
    contrast: float = 60.0
    base: float = 128.0
    freq_lo: float = 0.5
    freq_hi: float = 12.0

    def _boxes(self):
        rng = np.random.RandomState(self.seed)
        cx = rng.uniform(-1.6, 1.6, self.n_boxes)
        cy = rng.uniform(-1.2, 1.2, self.n_boxes)
        hx = rng.uniform(0.35, 0.9, self.n_boxes)
        hy = rng.uniform(0.3, 0.8, self.n_boxes)
        z = np.sort(rng.uniform(self.z_lo, self.z_hi, self.n_boxes))[::-1]
        return cx, cy, hx, hy, z.copy()

    def _face(self, k: int) -> PlaneScene:
        # a distinct texture per face (and for the background, k = -1)
        return PlaneScene(n_waves=self.n_waves, seed=self.seed + 31 * (k + 2),
                          contrast=self.contrast, base=self.base,
                          freq_lo=self.freq_lo, freq_hi=self.freq_hi)

    def render(self, calib: Calibration, T_cw, lvl: int = 0,
               exposure: float = 1.0, aff_a: float = 0.0, aff_b: float = 0.0):
        """Same contract as PlaneScene.render: (image, idepth), camera
        z-parameterized inverse depth."""
        w, h = calib.w[lvl], calib.h[lvl]
        fx, fy = calib.fx[lvl], calib.fy[lvl]
        cx0, cy0 = calib.cx[lvl], calib.cy[lvl]
        T_wc = lie.se3_inv(jnp.asarray(T_cw, jnp.float32))
        R = T_wc[:3, :3]
        o = T_wc[:3, 3]

        xs, ys = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                              jnp.arange(h, dtype=jnp.float32))
        rays_cam = jnp.stack([(xs - cx0) / fx, (ys - cy0) / fy,
                              jnp.ones_like(xs)], -1)
        rays_w = jnp.einsum("ij,hwj->hwi", R, rays_cam)
        rz = jnp.where(jnp.abs(rays_w[..., 2]) < 1e-9, 1e-9, rays_w[..., 2])

        def hit(z_plane):
            t = (z_plane - o[2]) / rz
            X = o[None, None, :] + t[..., None] * rays_w
            return t, X

        t_bg, X_bg = hit(self.z_bg)
        img = self._face(-1).texture(X_bg[..., 0], X_bg[..., 1])
        t_best = t_bg

        bx, by, hx, hy, bz = self._boxes()
        for k in range(self.n_boxes):
            t, X = hit(float(bz[k]))
            inside = ((jnp.abs(X[..., 0] - float(bx[k])) < float(hx[k]))
                      & (jnp.abs(X[..., 1] - float(by[k])) < float(hy[k]))
                      & (t > 0.1))
            closer = inside & (t < t_best)
            face = self._face(k).texture(X[..., 0], X[..., 1])
            img = jnp.where(closer, face, img)
            t_best = jnp.where(closer, t, t_best)

        img = jnp.exp(aff_a) * img + aff_b
        img = jnp.clip(img * exposure, 0.0, 255.0)
        idepth = jnp.where(t_best > 1e-6, 1.0 / jnp.maximum(t_best, 1e-6), 0.0)
        return img.astype(jnp.float32), idepth.astype(jnp.float32)


def make_scene(name: str, **kw):
    """Scene-family factory: 'plane' (smooth single plane) or 'boxes'
    (multi-depth occluding rectangles)."""
    if name == "plane":
        return PlaneScene(**kw)
    if name == "boxes":
        allowed = {f.name for f in dataclasses.fields(BoxScene)}
        return BoxScene(**{k: v for k, v in kw.items() if k in allowed})
    raise ValueError(f"unknown scene family '{name}' (plane|boxes)")


def default_calib(w: int = 640, h: int = 480) -> Calibration:
    return Calibration.create(w, h, fx=0.55 * w, fy=0.55 * w,
                              cx=(w - 1) / 2.0, cy=(h - 1) / 2.0)


def orbit_trajectory(n_frames: int, radius: float = 0.15,
                     fwd: float = 0.02, yaw: float = 0.003) -> np.ndarray:
    """Gentle sideways-orbit + forward camera path: (N, 4, 4) T_cw (f64)."""
    Ts = []
    for i in range(n_frames):
        t = np.array([radius * np.sin(0.15 * i), 0.5 * radius * (1 - np.cos(0.15 * i)),
                      fwd * i])
        w = np.array([0.0, yaw * i, 0.0])
        T_wc = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([t, w]), jnp.float64)))
        Ts.append(np.linalg.inv(T_wc))
    return np.stack(Ts)


def render_sequence(scene: PlaneScene, calib: Calibration, poses_cw: np.ndarray,
                    exposures: Optional[np.ndarray] = None):
    """Render a full sequence; returns (N, H, W) images, float32."""
    if exposures is None:
        exposures = np.ones(len(poses_cw), np.float32)
    imgs = []
    for T, e in zip(poses_cw, exposures):
        img, _ = scene.render(calib, jnp.asarray(T, jnp.float32), exposure=float(e))
        imgs.append(np.asarray(img))
    return np.stack(imgs)
