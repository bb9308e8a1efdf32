"""Corner-aware feature detection + ORB descriptors on device.

Rebuild of the reference FeatureDetector (src/frontend/FeatureDetector.cc,
include/frontend/FeatureDetector.h; SURVEY.md §2 C20), used by LDSO's
loop-closing point selection (setting_pointSelection == 1):

  * dense Shi-Tomasi response (8x8 box sums of the gradient Gram, smaller
    eigenvalue) — one separable box filter instead of per-candidate loops
  * per-grid-cell candidate picking with the reference's gradient threshold
    max(0.5 * cell max, 5) and top-k by Shi-Tomasi score
  * corner gate at 1% of the global max + 5 px non-max suppression
  * IC_Angle orientation over the radius-15 circular patch (batched gathers)
  * 256-bit rotated BRIEF from the published ORB pattern
    (frontend/orb_pattern.npy = bit_pattern_31_, FeatureDetector.cc:213+)

Descriptors are returned packed as (N, 8) uint32 for popcount matching.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15

_PATTERN = np.load(os.path.join(os.path.dirname(__file__), "orb_pattern.npy"))
assert _PATTERN.shape == (256, 4)


def _umax_table() -> np.ndarray:
    """Circular-patch row extents (ORB's umax, FeatureDetector.cc:8-28)."""
    umax = np.zeros(HALF_PATCH + 2, np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(HALF_PATCH * HALF_PATCH - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[:HALF_PATCH + 1]


UMAX = _umax_table()


@functools.partial(jax.jit, static_argnames=("halfbox",))
def shi_tomasi_map(dI: jax.Array, halfbox: int = 4) -> jax.Array:
    """Dense smaller-eigenvalue map (ShiTomasiScore, FeatureDetector.h:49-82).
    Box sums over [x-hb, x+hb) x [y-hb, y+hb)."""
    gx = dI[..., 1]
    gy = dI[..., 2]
    xx, yy, xy = gx * gx, gy * gy, gx * gy

    def box(a):
        # integral-image box sum of the reference's [min, max) window
        ii = jnp.cumsum(jnp.cumsum(a, axis=0), axis=1)
        ii = jnp.pad(ii, ((1, 0), (1, 0)))
        H, W = a.shape
        out = jnp.zeros_like(a)
        hb = halfbox
        # window rows [y-hb, y+hb), cols [x-hb, x+hb)
        y0 = jnp.clip(jnp.arange(H) - hb, 0, H)
        y1 = jnp.clip(jnp.arange(H) + hb, 0, H)
        x0 = jnp.clip(jnp.arange(W) - hb, 0, W)
        x1 = jnp.clip(jnp.arange(W) + hb, 0, W)
        A = ii[y1][:, x1]
        B = ii[y0][:, x1]
        C = ii[y1][:, x0]
        D = ii[y0][:, x0]
        return A - B - C + D

    area = (2 * halfbox) ** 2
    dXX = box(xx) / (2.0 * area)
    dYY = box(yy) / (2.0 * area)
    dXY = box(xy) / (2.0 * area)
    tr = dXX + dYY
    det = dXX * dYY - dXY * dXY
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    score = 0.5 * (tr - disc)
    # zero near the border like the reference's early-out
    H, W = score.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = ((xs - halfbox >= 1) & (xs + halfbox < W - 1)
          & (ys - halfbox >= 1) & (ys + halfbox < H - 1))
    return jnp.where(ok, score, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("gridsize", "per_cell", "skip"))
def detect_status_map(dI: jax.Array, abs_grad: jax.Array,
                      gridsize: int, per_cell: int, skip: int) -> jax.Array:
    """DetectCorners' candidate selection (FeatureDetector.cc:33-95) as ONE
    device program producing the (H, W) selection-status map directly — for
    callers that feed the immature-candidate pool and do NOT need host-side
    features (pure VO, loop closing off). The corner flag / orientation /
    descriptor stages (:97-189) only matter for the loop-closing feature
    records, so they stay on the host path (detect_corners below).

    Grid parameters come from detect_grid_params (host, static)."""
    H, W = abs_grad.shape
    st = shi_tomasi_map(dI)
    grid_x, grid_y = W // gridsize + 1, H // gridsize + 1
    gx0, gx1 = skip, grid_x - skip
    gy0, gy1 = skip, grid_y - skip
    Hc, Wc = gy1 - gy0, gx1 - gx0
    if Hc <= 0 or Wc <= 0:
        return jnp.zeros((H, W), jnp.int32)
    y_lo, x_lo = gy0 * gridsize, gx0 * gridsize
    crop_a = abs_grad[y_lo:y_lo + Hc * gridsize, x_lo:x_lo + Wc * gridsize]
    crop_s = st[y_lo:y_lo + Hc * gridsize, x_lo:x_lo + Wc * gridsize]
    cells_a = crop_a.reshape(Hc, gridsize, Wc, gridsize).transpose(0, 2, 1, 3)
    cells_s = crop_s.reshape(Hc, gridsize, Wc, gridsize).transpose(0, 2, 1, 3)
    cell_max = cells_a.max(axis=(2, 3), keepdims=True)
    grad_th = jnp.maximum(0.5 * cell_max, 5.0)
    flat = jnp.where(cells_a > grad_th, cells_s, -1.0).reshape(Hc, Wc, -1)
    k = min(per_cell, flat.shape[-1])
    top_val, top_idx = jax.lax.top_k(flat, k)                  # (Hc,Wc,k)
    yy = top_idx // gridsize
    xx = top_idx % gridsize
    cy = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc, k), 0)
    cx = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc, k), 1)
    u = (x_lo + cx * gridsize + xx).reshape(-1)
    v = (y_lo + cy * gridsize + yy).reshape(-1)
    ok = (top_val > 0).reshape(-1)
    u = jnp.where(ok, u, W)                    # OOB scatter -> dropped
    return jnp.zeros((H, W), jnp.int32).at[v, u].set(1, mode="drop")


def detect_grid_params(H: int, W: int, n_features: int):
    """Static grid geometry shared by both detection paths
    (FeatureDetector.cc:38-46)."""
    gridsize = max(int(np.sqrt(W * H / n_features) + 0.5), 2)
    per_cell = int(float(n_features) / (W * H) * gridsize * gridsize) + 1
    skip = (HALF_PATCH * 2 // gridsize) + 1
    return gridsize, per_cell, skip


def detect_corners(dI: jax.Array, abs_grad: jax.Array, n_features: int,
                   max_feats: int = 2048):
    """Grid-based detection (DetectCorners, FeatureDetector.cc:33-126).

    Returns dict with u, v, score, is_corner, angle, desc ((N,8) uint32),
    valid — fixed capacity max_feats. Host orchestration with device maps;
    the O(n^2) non-max suppression runs on a few hundred corners in numpy."""
    H, W = abs_grad.shape
    gridsize = int(np.sqrt(W * H / n_features) + 0.5)
    gridsize = max(gridsize, 2)
    grid_x, grid_y = W // gridsize + 1, H // gridsize + 1
    nfeat_in_grid = float(n_features) / (W * H) * gridsize * gridsize
    skip = (HALF_PATCH * 2 // gridsize) + 1
    per_cell = int(nfeat_in_grid) + 1

    st = shi_tomasi_map(dI)
    st_np = np.asarray(st)
    ag = np.asarray(abs_grad)

    us, vs, scores = [], [], []
    gx0, gx1 = skip, grid_x - skip
    gy0, gy1 = skip, grid_y - skip
    # vectorized per-cell selection
    Hc = gy1 - gy0
    Wc = gx1 - gx0
    if Hc <= 0 or Wc <= 0:
        return _empty_feats(max_feats)
    y_lo = gy0 * gridsize
    x_lo = gx0 * gridsize
    crop_a = ag[y_lo:y_lo + Hc * gridsize, x_lo:x_lo + Wc * gridsize]
    crop_s = st_np[y_lo:y_lo + Hc * gridsize, x_lo:x_lo + Wc * gridsize]
    cells_a = crop_a.reshape(Hc, gridsize, Wc, gridsize).transpose(0, 2, 1, 3)
    cells_s = crop_s.reshape(Hc, gridsize, Wc, gridsize).transpose(0, 2, 1, 3)
    cell_max = cells_a.max(axis=(2, 3), keepdims=True)
    grad_th = np.maximum(0.5 * cell_max, 5.0)
    cand = cells_a > grad_th
    masked_scores = np.where(cand, cells_s, -1.0)
    flat = masked_scores.reshape(Hc, Wc, -1)
    k = min(per_cell, flat.shape[-1])
    top_idx = np.argpartition(-flat, k - 1, axis=-1)[..., :k]
    top_val = np.take_along_axis(flat, top_idx, axis=-1)
    yy = top_idx // gridsize
    xx = top_idx % gridsize
    cy, cx = np.meshgrid(np.arange(Hc), np.arange(Wc), indexing="ij")
    u_all = (x_lo + cx[..., None] * gridsize + xx).reshape(-1)
    v_all = (y_lo + cy[..., None] * gridsize + yy).reshape(-1)
    s_all = top_val.reshape(-1)
    keep = s_all > 0
    us = u_all[keep]
    vs = v_all[keep]
    scores = s_all[keep]
    if len(us) == 0:
        return _empty_feats(max_feats)

    # corners: > 1% of max score + 5 px NMS (FeatureDetector.cc:97-118)
    max_score = scores.max()
    gate = scores > 0.01 * max_score
    from ldso_tpu import native
    keep = native.radius_nms(us[gate].astype(np.float32),
                             vs[gate].astype(np.float32),
                             scores[gate].astype(np.float32), 5.0)
    if keep is None:  # pure-python fallback (no toolchain)
        gi = np.nonzero(gate)[0]
        order = np.argsort(-scores[gi])
        taken_pos, taken = [], []
        pos = np.stack([us, vs], axis=1).astype(np.float64)
        for oi in order:
            i = gi[oi]
            if taken_pos and (np.linalg.norm(
                    np.array(taken_pos) - pos[i], axis=1) < 5.0).any():
                continue
            taken_pos.append(pos[i])
            taken.append(i)
        is_corner = np.zeros(len(us), bool)
        is_corner[taken] = True
    else:
        is_corner = np.zeros(len(us), bool)
        is_corner[np.nonzero(gate)[0][keep]] = True

    # cap to capacity, corners first
    order2 = np.argsort(~is_corner * 1 + 0.0 - scores / (scores.max() + 1e-9))
    sel = order2[:max_feats]
    us, vs, scores, is_corner = us[sel], vs[sel], scores[sel], is_corner[sel]

    n = len(us)
    pad = max_feats - n
    uj = jnp.asarray(np.concatenate([us, np.zeros(pad)]).astype(np.float32))
    vj = jnp.asarray(np.concatenate([vs, np.zeros(pad)]).astype(np.float32))
    cj = jnp.asarray(np.concatenate([is_corner, np.zeros(pad, bool)]))
    valid = jnp.asarray(np.arange(max_feats) < n)

    angle = ic_angle(dI, uj, vj)
    desc = compute_descriptors(dI, uj, vj, angle)
    return dict(u=uj, v=vj,
                score=jnp.asarray(np.concatenate([scores, np.zeros(pad)])
                                  .astype(np.float32)),
                is_corner=cj & valid, angle=angle, desc=desc, valid=valid)


def _empty_feats(max_feats):
    z = jnp.zeros(max_feats, jnp.float32)
    return dict(u=z, v=z, score=z, is_corner=jnp.zeros(max_feats, bool),
                angle=z, desc=jnp.zeros((max_feats, 8), jnp.uint32),
                valid=jnp.zeros(max_feats, bool))


@jax.jit
def ic_angle(dI: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Intensity-centroid orientation (IC_Angle, FeatureDetector.h:91-114)."""
    H, W = dI.shape[:2]
    img = dI[..., 0]
    ui = jnp.clip(u.astype(jnp.int32), HALF_PATCH + 1, W - HALF_PATCH - 2)
    vi = jnp.clip(v.astype(jnp.int32), HALF_PATCH + 1, H - HALF_PATCH - 2)

    du = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    umax = jnp.asarray(UMAX)

    flat = img.reshape(-1)

    def gather(yy, xx):
        return jnp.take(flat, yy * W + xx)

    # center row
    m10 = jnp.sum(du[None, :] * gather(vi[:, None], ui[:, None] + du[None, :]),
                  axis=1)
    m01 = jnp.zeros_like(m10)
    for vv in range(1, HALF_PATCH + 1):
        d = int(UMAX[vv])
        du2 = jnp.arange(-d, d + 1)
        plus = gather(vi[:, None] + vv, ui[:, None] + du2[None, :])
        minus = gather(vi[:, None] - vv, ui[:, None] + du2[None, :])
        m10 = m10 + jnp.sum(du2[None, :] * (plus + minus), axis=1)
        m01 = m01 + vv * jnp.sum(plus - minus, axis=1)
    return jnp.arctan2(m01, m10)


@jax.jit
def compute_descriptors(dI: jax.Array, u: jax.Array, v: jax.Array,
                        angle: jax.Array) -> jax.Array:
    """Rotated BRIEF (ComputeDescriptor, FeatureDetector.cc:131-189).
    Returns (N, 8) uint32 = 256 bits packed little-endian per 32-bit word."""
    H, W = dI.shape[:2]
    img = dI[..., 0].reshape(-1)
    patt = jnp.asarray(_PATTERN.astype(np.float32))      # (256,4) x0 y0 x1 y1
    a = jnp.cos(angle)
    b = jnp.sin(angle)
    ui = jnp.clip(u.astype(jnp.int32), 16, W - 17)
    vi = jnp.clip(v.astype(jnp.int32), 16, H - 17)

    def rotated_val(px, py):
        # reference: offset = int(px*b + py*a)*step + int(px*a - py*b)
        ry = (px[None, :] * b[:, None] + py[None, :] * a[:, None]).astype(jnp.int32)
        rx = (px[None, :] * a[:, None] - py[None, :] * b[:, None]).astype(jnp.int32)
        idx = (vi[:, None] + ry) * W + (ui[:, None] + rx)
        return jnp.take(img, idx)

    t0 = rotated_val(patt[:, 0], patt[:, 1])             # (N,256)
    t1 = rotated_val(patt[:, 2], patt[:, 3])
    bits = (t0 < t1).astype(jnp.uint32)                  # (N,256)
    bits = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    return words


@jax.jit
def hamming_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """(Na, Nb) Hamming distances via popcount (FeatureMatcher.cc:16-33
    replaces _mm_popcnt_u64)."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("nn_ratio", "th_low"))
def match_descriptors(desc_a, valid_a, desc_b, valid_b,
                      nn_ratio: float = 0.9, th_low: int = 50):
    """Brute-force matching with NN-ratio test (SearchByBoW semantics,
    FeatureMatcher.cc:66-124: best distance < TH_LOW and best < ratio *
    second-best). Returns (match index into b or -1, best distance)."""
    d = hamming_matrix(desc_a, desc_b)
    big = jnp.int32(10 ** 6)
    d = jnp.where(valid_b[None, :], d, big)
    d = jnp.where(valid_a[:, None], d, big)
    best = jnp.argmin(d, axis=1)
    best_d = jnp.min(d, axis=1)
    d2 = d.at[jnp.arange(d.shape[0]), best].set(big)
    second_d = jnp.min(d2, axis=1)
    ok = (best_d < th_low) & (best_d.astype(jnp.float32)
                              < nn_ratio * second_d.astype(jnp.float32))
    return jnp.where(ok & valid_a, best, -1), best_d
