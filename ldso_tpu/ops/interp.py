"""Bilinear interpolation gathers (device).

Replaces the reference's getInterpolatedElement* family
(include/internal/GlobalFuncs.h:55-230) with batched flat-index gathers.
All functions take arbitrary-shape coordinate arrays and broadcast.

Coordinates are (x, y) with x along width (axis 1), matching the reference.
Out-of-range coordinates are clamped; callers are expected to mask validity
separately (every caller in this package already tracks an in-bounds mask,
like the reference's OOB status checks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gather_flat(img_flat, idx):
    # img_flat: (H*W,) or (H*W, C); idx: (...,) int32
    return jnp.take(img_flat, idx, axis=0, indices_are_sorted=False, unique_indices=False)


def bilinear(img, x, y):
    """img: (H, W) or (H, W, C); x, y: (...) float. Returns (...) or (..., C).

    On TPU the gather is fenced with optimization barriers: XLA otherwise
    fuses the coordinate-producing math (and downstream consumers) into
    the serialized per-index gather loop, which measured 20x+ slower than
    the fenced dense-then-gather schedule (158 -> 7 ms on the BA
    linearization lattice)."""
    if jax.default_backend() == "tpu":
        x, y = jax.lax.optimization_barrier((x, y))
    H, W = img.shape[0], img.shape[1]
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).astype(img.dtype)
    dy = (y - y0).astype(img.dtype)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)

    flat = img.reshape((H * W,) + img.shape[2:])
    idx = yi * W + xi
    v00 = _gather_flat(flat, idx)
    v01 = _gather_flat(flat, idx + 1)
    v10 = _gather_flat(flat, idx + W)
    v11 = _gather_flat(flat, idx + W + 1)

    if img.ndim == 3:
        dx = dx[..., None]
        dy = dy[..., None]
    dxdy = dx * dy
    # same factorization as getInterpolatedElement (GlobalFuncs.h:55-67)
    out = (dxdy * v11 + (dy - dxdy) * v10 + (dx - dxdy) * v01
           + (1.0 - dx - dy + dxdy) * v00)
    if jax.default_backend() == "tpu":
        out = jax.lax.optimization_barrier(out)
    return out


def pack_taps(img):
    """Pack the 4 bilinear taps into the channel axis: (H, W[, C]) ->
    (H, W, 4C) with [y, x] = [img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]].

    One row-gather of the packed image fetches every tap a bilinear sample
    needs — 4x fewer gather indices than the 4-tap formulation. On TPU the
    per-index cost of the serialized gather loop dominates over bytes moved
    (BASELINE.md: the hot programs are index-bound, not byte-bound), so the
    4x index reduction is the win; the packed image costs 4x the HBM of the
    plain one and is built once per frame with dense shifts.

    The edge replication never affects results: `bilinear` clamps x to
    W-1.001 so the x+1/y+1 taps stay in range, matching the reference's
    border guards (GlobalFuncs.h:55-67 assumes in-bounds access).
    """
    if img.ndim == 2:
        img = img[..., None]
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    return jnp.concatenate([img, right, down, down_right], axis=-1)


def bilinear_packed(packed, x, y, channels: int):
    """Bilinear sample from a `pack_taps` image with ONE gather.

    packed: (H, W, 4*channels); x, y: (...) float.
    Returns (..., channels) (or (...) if channels == 1 and the caller
    squeezes). Bit-identical factorization to `bilinear`.
    """
    if jax.default_backend() == "tpu":
        x, y = jax.lax.optimization_barrier((x, y))
    H, W = packed.shape[0], packed.shape[1]
    C = channels
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).astype(packed.dtype)[..., None]
    dy = (y - y0).astype(packed.dtype)[..., None]
    idx = y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
    r = jnp.take(packed.reshape(H * W, 4 * C), idx, axis=0)   # (..., 4C)
    dxdy = dx * dy
    out = (dxdy * r[..., 3 * C:4 * C] + (dy - dxdy) * r[..., 2 * C:3 * C]
           + (dx - dxdy) * r[..., C:2 * C]
           + (1.0 - dx - dy + dxdy) * r[..., 0:C])
    if jax.default_backend() == "tpu":
        out = jax.lax.optimization_barrier(out)
    return out


def bilinear_packed_frames(packed_stack, fidx, x, y, channels: int):
    """`bilinear_packed` over a stacked per-frame packed image
    (F, H, W, 4C) with a per-element frame index (the packed counterpart
    of backend.ba._bilinear_frames)."""
    if jax.default_backend() == "tpu":
        x, y = jax.lax.optimization_barrier((x, y))
    F, H, W = packed_stack.shape[0], packed_stack.shape[1], packed_stack.shape[2]
    C = channels
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).astype(packed_stack.dtype)[..., None]
    dy = (y - y0).astype(packed_stack.dtype)[..., None]
    idx = (fidx * (H * W) + y0.astype(jnp.int32) * W
           + x0.astype(jnp.int32))
    r = jnp.take(packed_stack.reshape(F * H * W, 4 * C), idx, axis=0)
    dxdy = dx * dy
    out = (dxdy * r[..., 3 * C:4 * C] + (dy - dxdy) * r[..., 2 * C:3 * C]
           + (dx - dxdy) * r[..., C:2 * C]
           + (1.0 - dx - dy + dxdy) * r[..., 0:C])
    if jax.default_backend() == "tpu":
        out = jax.lax.optimization_barrier(out)
    return out


# NOTE: a `bilinear_mxu` variant (bilinear sampling as a one-hot-weighted
# selection MATMUL, no gathers) lived here through r2-r4 as a candidate
# for gather-bound call sites. The r5 chain-slope A/B at every candidate
# shape (tracker coarsest levels N=256-512, initializer levels N=4k-8k)
# measured it 2-4x SLOWER than the packed-tap gather (`bilinear_packed`):
# 0.108 vs 0.047 ms (trk L4), 0.403 vs 0.117 (trk L5), 0.180 vs 0.094
# (init L2), 0.570 vs 0.148 ms (init L0) — the (N, H) selection matmul's
# O(N*H*W*C) wasted FLOPs exceed the serialized-gather cost at every
# realistic shape once taps are channel-packed. Removed per the
# measure-or-delete rule (VERDICT r4 #6); this note is the ledger row.


def pack_pattern(img, pattern):
    """Pack a residual pattern into the channel axis: (H, W) + (P, 2) int
    offsets -> (H, W, P) with out[y, x, p] = img[y + pattern[p,1],
    x + pattern[p,0]] (edge-clamped).

    One nearest row-gather of the packed image then fetches ALL P pattern
    taps of a sample — P x fewer gather indices than per-tap gathers, the
    same index-count trick as `pack_taps`. Built with P dense rolls, so
    the build cost is bandwidth (~P x image bytes), not gathers.
    """
    H, W = img.shape
    chans = []
    for dx, dy in np.asarray(pattern):
        s = img
        dy, dx = int(dy), int(dx)
        if dy:
            s = (jnp.concatenate([s[dy:], jnp.repeat(s[-1:], dy, 0)], 0)
                 if dy > 0 else
                 jnp.concatenate([jnp.repeat(s[:1], -dy, 0), s[:dy]], 0))
        if dx:
            s = (jnp.concatenate([s[:, dx:], jnp.repeat(s[:, -1:], dx, 1)], 1)
                 if dx > 0 else
                 jnp.concatenate([jnp.repeat(s[:, :1], -dx, 1), s[:, :dx]], 1))
        chans.append(s)
    return jnp.stack(chans, axis=-1)


def pack_pattern_bilinear(img, pattern):
    """(H, W) image + (P, 2) INTEGER pattern offsets -> (H, W, 4P): for
    each pattern offset, the four bilinear taps [v00, v01(+x), v10(+y),
    v11(+x+y)] of img shifted by the offset.

    For integer offsets every pattern tap of a sample at (x, y) shares the
    SAME fractional part as the sample itself, so ONE gather at
    (floor(x), floor(y)) plus one set of bilinear weights yields exact
    bilinear samples of the whole pattern — P*4 x fewer gather indices
    than per-tap bilinear (the trick behind the fast epipolar search;
    `bilinear_packed_pattern`)."""
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    packs = [pack_pattern(t, pattern)
             for t in (img, right, down, down_right)]       # 4 x (H,W,P)
    return jnp.stack(packs, axis=-1).reshape(
        img.shape[0], img.shape[1], -1)                     # (H,W,P*4)


def bilinear_packed_pattern(packed, x, y, P: int):
    """Bilinear samples of ALL P (integer-offset) pattern pixels around
    each (x, y) with ONE gather: packed = pack_pattern_bilinear(img, pat).
    Returns (..., P). Uses the same weight factorization as `bilinear`,
    so it is bit-identical to per-tap bilinear at the unrotated pattern
    (away from the border clamp, which callers mask)."""
    if jax.default_backend() == "tpu":
        x, y = jax.lax.optimization_barrier((x, y))
    H, W = packed.shape[0], packed.shape[1]
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0).astype(packed.dtype)[..., None]
    dy = (y - y0).astype(packed.dtype)[..., None]
    idx = y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
    r = jnp.take(packed.reshape(H * W, -1), idx, axis=0)
    r = r.reshape(r.shape[:-1] + (P, 4))
    dxdy = dx * dy
    out = (dxdy * r[..., 3] + (dy - dxdy) * r[..., 2]
           + (dx - dxdy) * r[..., 1] + (1.0 - dx - dy + dxdy) * r[..., 0])
    if jax.default_backend() == "tpu":
        out = jax.lax.optimization_barrier(out)
    return out


def nearest_packed_pattern(packed, x, y):
    """Nearest-tap sample of all P pattern pixels around each (x, y) with
    ONE gather: packed = pack_pattern(img, pattern), x/y: (...).
    Returns (..., P) = img[round(y) + pat_y, round(x) + pat_x].

    Exactly equals per-tap `nearest(img, x + px, y + py)` for INTEGER
    pattern offsets (round(x + k) == round(x) + k for integer k), up to
    border clamping (packed clamps per-tap at the edge; callers mask
    borders anyway, like every trace caller does)."""
    if jax.default_backend() == "tpu":
        x, y = jax.lax.optimization_barrier((x, y))
    H, W, P = packed.shape
    xi = jnp.clip(jnp.round(x), 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(y), 0, H - 1).astype(jnp.int32)
    out = jnp.take(packed.reshape(H * W, P), yi * W + xi, axis=0)
    if jax.default_backend() == "tpu":
        out = jax.lax.optimization_barrier(out)
    return out


def nearest(img, x, y):
    """Nearest-neighbour gather with clamping (fenced like bilinear)."""
    if jax.default_backend() == "tpu":
        x, y = jax.lax.optimization_barrier((x, y))
    H, W = img.shape[0], img.shape[1]
    xi = jnp.clip(jnp.round(x), 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(y), 0, H - 1).astype(jnp.int32)
    flat = img.reshape((H * W,) + img.shape[2:])
    out = _gather_flat(flat, yi * W + xi)
    if jax.default_backend() == "tpu":
        out = jax.lax.optimization_barrier(out)
    return out


def in_bounds(x, y, w: int, h: int, border: float = 2.0):
    """The reference's ubiquitous OOB guard (e.g. ResidualProjections.h:75-80
    checks against [1.1, wM3G]); border ~= patternPadding + 1."""
    return (x > border) & (x < w - border - 1) & (y > border) & (y < h - border - 1)
