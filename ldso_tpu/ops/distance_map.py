"""Half-resolution distance transform for activation spacing.

Rebuild of CoarseDistanceMap (src/frontend/CoarseTracker.cc:637-819): the
reference runs an explicit BFS queue; here the same chamfer distance (4-
neighbourhood every step, diagonals on odd steps) is computed by iterated
min-plus dilation — a fixed unrolled stencil, ideal for the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = 1000.0
MAX_K = 40  # growDistBFS iterations (CoarseTracker.cc:726)


@functools.partial(jax.jit, static_argnames=("max_k",))
def distance_transform(occupied: jax.Array, max_k: int = MAX_K) -> jax.Array:
    """occupied: (H, W) bool. Returns float chamfer distance, 1000 where
    unreachable within max_k steps (matching the reference's init)."""
    d = jnp.where(occupied, 0.0, BIG)

    def body(k, d):
        kf = k.astype(jnp.float32)
        cand = d
        H, W = d.shape
        ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

        def from_shift(cand, dy, dx):
            src = jnp.roll(d, (dy, dx), axis=(0, 1))
            # source pixel (y-dy, x-dx) must be interior (reference skips
            # border frontier pixels) and must have value == k-1 frontier...
            # min-plus relaxation: any src with src < k propagates value k.
            src_y = ys - dy
            src_x = xs - dx
            ok = (src_y >= 1) & (src_y <= H - 2) & (src_x >= 1) & (src_x <= W - 2)
            return jnp.where(ok & (src < kf) & (cand > kf), kf, cand)

        cand = from_shift(cand, 0, 1)
        cand = from_shift(cand, 0, -1)
        cand = from_shift(cand, 1, 0)
        cand = from_shift(cand, -1, 0)
        use_diag = (k % 2) == 1
        diag = cand
        diag = from_shift(diag, 1, 1)
        diag = from_shift(diag, 1, -1)
        diag = from_shift(diag, -1, 1)
        diag = from_shift(diag, -1, -1)
        return jnp.where(use_diag, diag, cand)

    return jax.lax.fori_loop(1, max_k, body, d)
