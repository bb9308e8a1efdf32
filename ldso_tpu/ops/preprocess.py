"""Fused per-frame preprocessing: photometric correction + rectification +
pyramid + gradients, as one jitted device program.

Replaces four separate reference passes with one XLA program (the
BASELINE.json "north star" fusion):
  1. response-LUT inversion  (PhotometricUndistorter::processFrame,
     Undistort.cc:190-233)
  2. vignette division       (same)
  3. bilinear rectification remap (Undistort::undistort, Undistort.cc:358-470)
  4. pyramid + gradients + absSquaredGrad (FrameHessian::makeImages,
     FrameHessian.cc:44-113, incl. the gamma-gradient reweighting :93-98)

Everything is static-shaped; XLA fuses the elementwise chain into the
gathers. The output `FramePyramid` is the device-side analogue of
FrameHessian::dIp — per level an (H, W, 3) array of (intensity, dx, dy)
plus the selector's gradient-magnitude map.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class FramePyramid(NamedTuple):
    """Per-level (H, W, 3) = (I, dx, dy), and (H, W) absSquaredGrad."""
    dI: Tuple[jax.Array, ...]
    abs_grad: Tuple[jax.Array, ...]

    @property
    def levels(self) -> int:
        return len(self.dI)

    def image(self, lvl: int = 0) -> jax.Array:
        return self.dI[lvl][..., 0]


def _grad_and_abs(I, b_grad_lut):
    """Central-difference gradients; absSquaredGrad optionally reweighted by
    the forward-response gradient (FrameHessian.cc:75-99)."""
    dx = 0.5 * (jnp.roll(I, -1, axis=1) - jnp.roll(I, 1, axis=1))
    dy = 0.5 * (jnp.roll(I, -1, axis=0) - jnp.roll(I, 1, axis=0))
    # zero at the x borders (reference relies on flat-index wraparound there;
    # we zero instead) and at the y borders (reference skips first/last row).
    W = I.shape[1]
    H = I.shape[0]
    col = jnp.arange(W)
    row = jnp.arange(H)[:, None]
    edge = (col == 0) | (col == W - 1) | (row == 0) | (row == H - 1)
    dx = jnp.where(edge, 0.0, dx)
    dy = jnp.where(edge, 0.0, dy)
    # clamp the reference's NaN / >255 guard (FrameHessian.cc:85-86)
    dx = jnp.where(jnp.abs(dx) > 255.0, 0.0, dx)
    dy = jnp.where(jnp.abs(dy) > 255.0, 0.0, dy)
    ag = dx * dx + dy * dy
    if b_grad_lut is not None:
        c = jnp.clip(jnp.round(I).astype(jnp.int32), 5, 250)
        if jax.default_backend() == "tpu":
            c = jax.lax.optimization_barrier(c)   # fence the LUT gather
        gw = jnp.take(b_grad_lut, c)
        if jax.default_backend() == "tpu":
            gw = jax.lax.optimization_barrier(gw)
        ag = ag * (gw * gw)
    return dx, dy, ag


def _downsample2(I):
    """2x2 box filter (FrameHessian.cc:66-79). Reshape-reduce instead of
    four stride-2 slices: lane-strided slicing costs a relayout per slice
    on TPU."""
    H, W = I.shape
    return I[:(H // 2) * 2, :(W // 2) * 2].reshape(
        H // 2, 2, W // 2, 2).mean(axis=(1, 3))


def _make_pyramid_impl(img, levels: int, b_grad_lut=None) -> FramePyramid:
    dIs = []
    ags = []
    I = img
    for lvl in range(levels):
        if lvl > 0:
            I = _downsample2(I)
        dx, dy, ag = _grad_and_abs(I, b_grad_lut)
        dIs.append(jnp.stack([I, dx, dy], axis=-1))
        ags.append(ag)
    return FramePyramid(dI=tuple(dIs), abs_grad=tuple(ags))


def _to_intensity(img) -> jax.Array:
    """Decode a device image buffer to float intensities in [0, 255].

    uint8 carries raw 8-bit intensities (the reference's own input depth:
    ImageRW reads 8U, Undistort.cc:190-233 maps through the response LUT);
    uint16 is 8.8 fixed point (intensity * 256) — the low-bandwidth upload
    format for already-float images behind a slow host<->device link."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32)
    if img.dtype == jnp.uint16:
        return img.astype(jnp.float32) * (1.0 / 256.0)
    return jnp.asarray(img, jnp.float32)


def upload_image(image) -> jax.Array:
    """Host->device upload preserving compact integer dtypes.

    float images are cast to float32 on host; uint8/uint16 cross the link
    raw (4x / 2x fewer bytes — the transfer, not compute, bounds the
    per-frame cost behind a remote-TPU tunnel) and are decoded on device
    by `_to_intensity` inside the consuming program. A jax.Array input
    (e.g. a dataset reader that already rectified on device) passes
    through untouched."""
    if isinstance(image, jax.Array):
        return image
    import numpy as np
    if image.dtype in (np.uint8, np.uint16):
        return jnp.asarray(image)
    return jnp.asarray(image, jnp.float32)


@functools.partial(jax.jit, static_argnames=("levels",))
def make_pyramid(img, levels: int, b_grad_lut=None) -> FramePyramid:
    """img: (H, W) rectified image — float32 photometric-linear, uint8 raw
    intensities, or uint16 8.8 fixed point (see _to_intensity).
    One fused device program (FrameHessian::makeImages equivalent)."""
    return _make_pyramid_impl(_to_intensity(img), levels, b_grad_lut)


@functools.partial(jax.jit, static_argnames=("levels",))
def preprocess_frame(
    raw: jax.Array,                 # (h_org, w_org) uint8/uint16/float32
    G_lut: Optional[jax.Array],     # (GDepth,) float32 or None
    vignette_inv: Optional[jax.Array],  # (h_org, w_org) float32 or None
    remap_x: jax.Array,             # (h, w) float32, -1 invalid
    remap_y: jax.Array,
    b_grad_lut: Optional[jax.Array],  # (256,) float32 or None
    levels: int,
) -> FramePyramid:
    """The fused preprocessing program. Compiled once per calibration."""
    if G_lut is not None and jnp.issubdtype(raw.dtype, jnp.integer):
        idx_g = raw.astype(jnp.int32)
        if jax.default_backend() == "tpu":
            idx_g = jax.lax.optimization_barrier(idx_g)
        linear = jnp.take(G_lut, idx_g)
        if jax.default_backend() == "tpu":
            linear = jax.lax.optimization_barrier(linear)
    else:
        linear = raw.astype(jnp.float32)
    if vignette_inv is not None:
        linear = linear * vignette_inv

    # bilinear remap with invalid -> 0 (Undistort.cc:413-446)
    h_org, w_org = linear.shape
    x = remap_x
    y = remap_y
    valid = x >= 0
    xs = jnp.clip(x, 0.0, w_org - 1.001)
    ys = jnp.clip(y, 0.0, h_org - 1.001)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    flat = linear.reshape(-1)
    idx = yi * w_org + xi
    if jax.default_backend() == "tpu":
        idx = jax.lax.optimization_barrier(idx)   # fence the remap gather
    v00 = jnp.take(flat, idx)
    v01 = jnp.take(flat, idx + 1)
    v10 = jnp.take(flat, idx + w_org)
    v11 = jnp.take(flat, idx + w_org + 1)
    fxy = fx * fy
    rect = (fxy * v11 + (fy - fxy) * v10 + (fx - fxy) * v01
            + (1.0 - fx - fy + fxy) * v00)
    if jax.default_backend() == "tpu":
        rect = jax.lax.optimization_barrier(rect)
    rect = jnp.where(valid, rect, 0.0).astype(jnp.float32)

    return _make_pyramid_impl(rect, levels, b_grad_lut)
