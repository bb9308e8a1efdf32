"""Synthetic robustness perturbations: geometric noise + variable blur.

Rebuild of the reference's benchmark knobs (benchmark_varNoise /
benchmark_varBlurNoise / benchmark_noiseGridsize; Undistort.cc:372-470
applyBlurNoise :480-540, Setting.cc:95-101) — smooth random warp fields
and spatially-varying separable Gaussian blur used for robustness
experiments (SURVEY.md §4/§5 fault injection)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ldso_tpu.ops.interp import bilinear


@functools.partial(jax.jit, static_argnames=("grid_size",))
def warp_noise(img: jax.Array, key: jax.Array, var_noise: float,
               grid_size: int = 3) -> jax.Array:
    """Displace sampling coordinates by a smooth random field with
    amplitude +-var_noise px on a (grid_size+8)^2 control grid."""
    H, W = img.shape
    kx, ky = jax.random.split(key)
    g = grid_size + 8
    nx = (jax.random.uniform(kx, (g, g)) - 0.5) * 2.0 * var_noise
    ny = (jax.random.uniform(ky, (g, g)) - 0.5) * 2.0 * var_noise
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = 4.0 + xs / W * grid_size
    gy = 4.0 + ys / H * grid_size
    dx = bilinear(nx, gx, gy)
    dy = bilinear(ny, gx, gy)
    return bilinear(img, jnp.clip(xs + dx, 0.01, W - 1.01),
                    jnp.clip(ys + dy, 0.01, H - 1.01))


@functools.partial(jax.jit, static_argnames=("grid_size", "max_radius"))
def blur_noise(img: jax.Array, key: jax.Array, var_blur: float,
               grid_size: int = 3, max_radius: int = 6) -> jax.Array:
    """Spatially-varying separable Gaussian blur with per-region sigma in
    [0, var_blur] (applyBlurNoise equivalent, fixed-footprint kernels)."""
    H, W = img.shape
    kx, ky = jax.random.split(key)
    g = grid_size + 8
    sx = jax.random.uniform(kx, (g, g)) * var_blur
    sy = jax.random.uniform(ky, (g, g)) * var_blur
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = 4.0 + xs / W * grid_size
    gy = 4.0 + ys / H * grid_size
    sig_x = jnp.maximum(bilinear(sx, gx, gy), 0.01)
    sig_y = jnp.maximum(bilinear(sy, gx, gy), 0.01)

    def separable(img, sig, axis):
        num = jnp.zeros_like(img)
        den = jnp.zeros_like(img)
        padded = jnp.pad(img, max_radius, mode="edge")
        for d in range(-max_radius, max_radius + 1):
            w = jnp.exp(-0.5 * (d / sig) ** 2)
            if axis == 1:
                s = padded[max_radius: max_radius + H,
                           max_radius + d: max_radius + d + W]
            else:
                s = padded[max_radius + d: max_radius + d + H,
                           max_radius: max_radius + W]
            num = num + w * s
            den = den + w
        return num / den

    out = separable(img, sig_x, axis=1)
    return separable(out, sig_y, axis=0)


def benchmark_perturb(img: jax.Array, key: jax.Array, var_noise: float = 0.0,
                      var_blur: float = 0.0, grid_size: int = 3) -> jax.Array:
    """Apply the reference's benchmark perturbations in its order: geometric
    warp noise first (the reference jitters the remap coordinates inside
    `undistort<T>`, Undistort.cc:372-470), then variable blur
    (applyBlurNoise, :480-540). var_noise/var_blur <= 0 skip that stage
    (setting defaults, Setting.cc:95-101). Host-level gating: each distinct
    (on/off) combination compiles once."""
    if var_noise <= 0.0 and var_blur <= 0.0:
        return img
    k_warp, k_blur = jax.random.split(jnp.asarray(key))
    if var_noise > 0.0:
        img = warp_noise(img, k_warp, jnp.float32(var_noise), grid_size)
    if var_blur > 0.0:
        img = blur_noise(img, k_blur, jnp.float32(var_blur), grid_size)
    return img
