"""Sliding-window photometric bundle adjustment on TPU.

Rebuild of the reference optimization backend (SURVEY.md §2 C12-C17):
  * `linearize_all`  <- PointFrameResidual::linearize (Residuals.cc:13-214):
    the full analytic Jacobian factorization (Jpdxi 2x6, Jpdc 2x4, Jpdd 2x1,
    JIdx 2x8, JabF 2x8) with first-estimate-Jacobians — geometric parts at
    the FEJ point (state_zero / T_eval), photometric parts at the current
    state — for ALL residual slots as one batched program.
  * `apply_res`      <- PointFrameResidual::applyRes (Residuals.h:63-95).
  * `build_system`   <- AccumulatedTopHessianSSE (modes 0/1) +
    AccumulatedSCHessianSSE + stitchDouble with adjoints
    (AccumulatedTopHessian.cc, AccumulatedSCHessian.cc): per-(host,target)
    13x13 blocks by one masked segment-sum of row outer products, stitched
    into the (4+8F)^2 system via the adHost/adTarget adjoints.
  * `resubstitute`   <- EnergyFunctional::resubstituteF (:491-547).
  * host-side `EnergyFunctional` class: the LM driver, float64 stitched
    solve (the reference stitches in double: AccumulatedTopHessian.cc:144),
    nullspace orthogonalization (EnergyFunctional.cc:685-717), frame
    marginalization by scaled Schur complement onto HM/bM
    (EnergyFunctional.cc:72-151), and point marginalization (:165-222).

Parameter vector x: [c(4), frame0(8), ..., frame{F-1}(8)] in UNSCALED units
(the SCALE_* factors are folded into the Jacobians, like the reference).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldso_tpu.config import (CPARS, Config, PATTERN, SCALE_C, SCALE_F,
                             SCALE_IDEPTH)
from ldso_tpu.backend.window import (FRAME_SCALE, RES_IN, RES_OOB,
                                     RES_OUTLIER, Window, aff_g2l,
                                     aff_g2l_zero, c_scaled, current_poses)
from ldso_tpu.frontend import affine
from ldso_tpu.math import lie
from ldso_tpu.ops.interp import bilinear_packed_frames


# ---------------------------------------------------------------------------
# precalc (FrameFramePrecalc + setAdjointsF + setDeltaF)
# ---------------------------------------------------------------------------

class Precalc(NamedTuple):
    R0: jax.Array        # (F,F,3,3) FEJ relative rotation (h -> t)
    t0: jax.Array        # (F,F,3)
    KRKi: jax.Array      # (F,F,3,3) current K R K^-1
    Kt: jax.Array        # (F,F,3)
    aff: jax.Array       # (F,F,2) current relative (a, b)
    b0: jax.Array        # (F,) host aff_zero b
    adHost: jax.Array    # (F,F,8,8) indexed [h, t]
    adTarget: jax.Array  # (F,F,8,8)
    adHTdelta: jax.Array  # (F,F,8)  delta_h @ AH + delta_t @ AT
    c_delta: jax.Array   # (4,)
    fxycxy: jax.Array    # (4,) current physical intrinsics


def make_precalc(W: Window) -> Precalc:
    F = W.F
    T_eval = W.T_eval
    T_cur = current_poses(W)
    Tinv_eval = lie.se3_inv(T_eval)
    Tinv_cur = lie.se3_inv(T_cur)

    # relative transforms [h, t]: target * host^-1
    rel0 = jnp.einsum("tij,hjk->htik", T_eval, Tinv_eval)
    relc = jnp.einsum("tij,hjk->htik", T_cur, Tinv_cur)
    R0 = rel0[..., :3, :3]
    t0 = rel0[..., :3, 3]
    Rc = relc[..., :3, :3]
    tc = relc[..., :3, 3]

    c = c_scaled(W.c_value)
    fx, fy, cx, cy = c[0], c[1], c[2], c[3]
    K = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], jnp.float32)
    K = K.at[0, 0].set(fx).at[1, 1].set(fy).at[0, 2].set(cx).at[1, 2].set(cy)
    Ki = jnp.linalg.inv(K)
    KRKi = jnp.einsum("ij,htjk,kl->htil", K, Rc, Ki)
    Kt = jnp.einsum("ij,htj->hti", K, tc)

    aff_cur = aff_g2l(W)
    aff0 = aff_g2l_zero(W)
    expo = W.exposure
    aff_rel = affine.from_to(expo[:, None], expo[None, :],
                             aff_cur[:, None, :], aff_cur[None, :, :])
    b0 = aff0[:, 1]

    # adjoints at the FEJ point (setAdjointsF, EnergyFunctional.cc:431-489)
    adj = lie.se3_adj(rel0.reshape(-1, 4, 4)).reshape(F, F, 6, 6)
    AH = jnp.zeros((F, F, 8, 8), jnp.float32)
    AT = jnp.zeros((F, F, 8, 8), jnp.float32)
    AH = AH.at[..., :6, :6].set(-jnp.swapaxes(adj, -1, -2))
    AT = AT.at[..., :6, :6].set(jnp.eye(6, dtype=jnp.float32))
    aff0_rel = affine.from_to(expo[:, None], expo[None, :],
                              aff0[:, None, :], aff0[None, :, :])
    a0 = aff0_rel[..., 0]
    AT = AT.at[..., 6, 6].set(-a0)
    AH = AH.at[..., 6, 6].set(a0)
    AT = AT.at[..., 7, 7].set(-1.0)
    AH = AH.at[..., 7, 7].set(a0)
    rowscale = jnp.asarray(FRAME_SCALE)
    AH = AH * rowscale[None, None, :, None]
    AT = AT * rowscale[None, None, :, None]

    delta = (W.state - W.state_zero)[:, :8]           # (F,8) unscaled
    adHTdelta = (jnp.einsum("hj,htjk->htk", delta, AH)
                 + jnp.einsum("tj,htjk->htk", delta, AT))
    c_delta = W.c_value - W.c_zero
    return Precalc(R0=R0, t0=t0, KRKi=KRKi, Kt=Kt, aff=aff_rel, b0=b0,
                   adHost=AH, adTarget=AT, adHTdelta=adHTdelta,
                   c_delta=c_delta, fxycxy=c)


def _bilinear_frames(dIs, fidx, x, y):
    """Bilinear gather from stacked per-frame images dIs (F,H,W,C) with a
    per-element frame index fidx broadcastable to x/y."""
    F, H, Wd, C = dIs.shape
    x = jnp.clip(x, 0.0, Wd - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    base = fidx * (H * Wd) + yi * Wd + xi
    flat = dIs.reshape(-1, C)
    v00 = jnp.take(flat, base, axis=0)
    v01 = jnp.take(flat, base + 1, axis=0)
    v10 = jnp.take(flat, base + Wd, axis=0)
    v11 = jnp.take(flat, base + Wd + 1, axis=0)
    dx = dx[..., None]
    dy = dy[..., None]
    dxdy = dx * dy
    return (dxdy * v11 + (dy - dxdy) * v10 + (dx - dxdy) * v01
            + (1.0 - dx - dy + dxdy) * v00)


# ---------------------------------------------------------------------------
# linearize_all
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "img_w", "img_h"))
def linearize_all(W: Window, dIs: jax.Array, cfg: Config,
                  img_w: int, img_h: int):
    """Batched PointFrameResidual::linearize over the whole (P, F) lattice.

    Returns (new Window with J/new-state fields updated, energy_sum)."""
    P, F = W.P, W.F
    pc = make_precalc(W)
    fx, fy, cx, cy = pc.fxycxy[0], pc.fxycxy[1], pc.fxycxy[2], pc.fxycxy[3]
    wM3 = img_w - 3.0
    hM3 = img_h - 3.0

    lin_mask = (W.res_exist & W.pt_valid[:, None] & ~W.res_linearized
                & W.frame_valid[None, :])
    prev_oob = W.res_state == RES_OOB

    h = W.pt_host                                  # (P,)
    # gather per-residual precalc: (P, F, ...)
    R0 = pc.R0[h]
    t0 = pc.t0[h]
    KRKi = pc.KRKi[h]
    Kt = pc.Kt[h]
    affLL = pc.aff[h]                              # (P,F,2)
    b0 = pc.b0[h]                                  # (P,)

    # ---- center projection at the FEJ point (Residuals.cc:56-105) ----------
    KliP = jnp.stack([(W.pt_u - cx) / fx, (W.pt_v - cy) / fy,
                      jnp.ones_like(W.pt_u)], axis=-1)         # (P,3)
    ptp0 = jnp.einsum("pfij,pj->pfi", R0, KliP) + t0 * W.idepth_zero[:, None, None]
    drescale = 1.0 / ptp0[..., 2]
    new_idepth = W.idepth_zero[:, None] * drescale
    u = ptp0[..., 0] * drescale
    v = ptp0[..., 1] * drescale
    Ku_c = u * fx + cx
    Kv_c = v * fy + cy
    center_ok = (drescale > 0) & (Ku_c > 1.1) & (Kv_c > 1.1) & (Ku_c < wM3) & (Kv_c < hM3)

    d_d_x = drescale * (t0[..., 0] - t0[..., 2] * u) * SCALE_IDEPTH * fx
    d_d_y = drescale * (t0[..., 1] - t0[..., 2] * v) * SCALE_IDEPTH * fy

    dCx2 = drescale * (R0[..., 2, 0] * u - R0[..., 0, 0])
    dCx3 = fx * drescale * (R0[..., 2, 1] * u - R0[..., 0, 1]) / fy
    dCx0 = (KliP[:, None, 0] * dCx2 + u) * SCALE_F
    dCx1 = (KliP[:, None, 1] * dCx3) * SCALE_F
    dCx2 = (dCx2 + 1.0) * SCALE_C
    dCx3 = dCx3 * SCALE_C
    dCy2 = fy * drescale * (R0[..., 2, 0] * v - R0[..., 1, 0]) / fx
    dCy3 = drescale * (R0[..., 2, 1] * v - R0[..., 1, 1])
    dCy0 = (KliP[:, None, 0] * dCy2) * SCALE_F
    dCy1 = (KliP[:, None, 1] * dCy3 + v) * SCALE_F
    dCy2 = dCy2 * SCALE_C
    dCy3 = (dCy3 + 1.0) * SCALE_C
    Jpdc = jnp.stack([jnp.stack([dCx0, dCx1, dCx2, dCx3], -1),
                      jnp.stack([dCy0, dCy1, dCy2, dCy3], -1)], axis=-2)  # (P,F,2,4)

    one = jnp.ones_like(u)
    Jxi_x = jnp.stack([new_idepth * fx, 0 * one, -new_idepth * u * fx,
                       -u * v * fx, (1 + u * u) * fx, -v * fx], -1)
    Jxi_y = jnp.stack([0 * one, new_idepth * fy, -new_idepth * v * fy,
                       -(1 + v * v) * fy, u * v * fy, u * fy], -1)
    Jpdxi = jnp.stack([Jxi_x, Jxi_y], axis=-2)                # (P,F,2,6)
    Jpdd = jnp.stack([d_d_x, d_d_y], axis=-1)                 # (P,F,2)
    center_proj = jnp.stack([Ku_c, Kv_c, new_idepth], -1)

    # ---- pattern projections at the CURRENT state (Residuals.cc:126-188) ---
    patt = jnp.asarray(PATTERN, jnp.float32)
    ones_pf8 = jnp.ones((P, F, 8), jnp.float32)
    uP = (W.pt_u[:, None, None] + patt[None, None, :, 0]) * ones_pf8
    vP = (W.pt_v[:, None, None] + patt[None, None, :, 1]) * ones_pf8
    pk = jnp.stack([uP, vP, ones_pf8], axis=-1)
    ptp = jnp.einsum("pfij,pfkj->pfki", KRKi, pk) + Kt[:, :, None, :] * W.idepth[:, None, None, None]
    Ku = ptp[..., 0] / ptp[..., 2]
    Kv = ptp[..., 1] / ptp[..., 2]
    patt_ok = (Ku > 1.1) & (Kv > 1.1) & (Ku < wM3) & (Kv < hM3)

    tgt = jax.lax.broadcasted_iota(jnp.int32, (P, F, 8), 1)
    # tap-packed frame stack (F,H,W,12; full_system stores the window's
    # images pre-packed per ops/interp.pack_taps): ONE gather per sample
    # instead of four — bit-identical, 4x fewer indices on this lattice
    packed = dIs.shape[-1] == 12
    if jax.default_backend() == "tpu":
        # fence the gather: without the barriers XLA fuses the projection
        # math (and consumers) into the serialized per-index gather loop,
        # turning a ~5 ms op into ~150 ms of scalar code
        Ku, Kv = jax.lax.optimization_barrier((Ku, Kv))
        hit = (bilinear_packed_frames(dIs, tgt, Ku, Kv, 3) if packed
               else _bilinear_frames(dIs, tgt, Ku, Kv))       # (P,F,8,3)
        hit = jax.lax.optimization_barrier(hit)
    else:
        hit = (bilinear_packed_frames(dIs, tgt, Ku, Kv, 3) if packed
               else _bilinear_frames(dIs, tgt, Ku, Kv))       # (P,F,8,3)
    finite = jnp.isfinite(hit[..., 0])
    oob = prev_oob | ~center_ok | ~jnp.all(patt_ok & finite, axis=-1)

    resid = hit[..., 0] - (affLL[..., 0:1] * W.pt_color[:, None, :] + affLL[..., 1:2])
    drdA = W.pt_color[:, None, :] - b0[:, None, None]
    gsq = hit[..., 1] ** 2 + hit[..., 2] ** 2
    wg = jnp.sqrt(cfg.outlier_th_sum_component / (cfg.outlier_th_sum_component + gsq))
    wgt = 0.5 * (wg + W.pt_weights[:, None, :])
    ar = jnp.abs(resid)
    hw_e = jnp.where(ar < cfg.huber_th, 1.0, cfg.huber_th / jnp.maximum(ar, 1e-12))
    energy = jnp.sum(wgt * wgt * hw_e * resid * resid * (2.0 - hw_e), axis=-1)

    hw = jnp.where(hw_e < 1.0, jnp.sqrt(hw_e), hw_e) * wgt
    JIdx = jnp.stack([hit[..., 1] * hw, hit[..., 2] * hw], axis=-2)  # (P,F,2,8)
    Jab0 = drdA * hw
    Jab1 = hw
    if cfg.affine_opt_mode_a < 0:
        Jab0 = jnp.zeros_like(Jab0)
    if cfg.affine_opt_mode_b < 0:
        Jab1 = jnp.zeros_like(Jab1)
    JabF = jnp.stack([Jab0, Jab1], axis=-2)
    resF = resid * hw
    wJI2 = jnp.sum(hw * hw * gsq, axis=-1)

    th = jnp.maximum(W.frame_energy_th[W.pt_host][:, None],
                     W.frame_energy_th[None, :])
    is_outlier = (energy > th) | (wJI2 < 2.0)
    new_energy = jnp.where(is_outlier, th, energy)

    new_state = jnp.where(oob, RES_OOB,
                          jnp.where(is_outlier, RES_OUTLIER, RES_IN))
    # OOB keeps the previous energy (Residuals.cc:17-21,58-60)
    new_energy = jnp.where(oob, W.res_energy, new_energy)
    new_energy_wo = jnp.where(oob, -1.0, energy)

    apply = lin_mask
    sel = lambda a, b: jnp.where(apply[..., None] if a.ndim == 3 else
                                 (apply[..., None, None] if a.ndim == 4 else apply),
                                 a, b)
    W = W._replace(
        Jpdxi=sel(Jpdxi, W.Jpdxi), Jpdc=sel(Jpdc, W.Jpdc),
        Jpdd=sel(Jpdd, W.Jpdd), JIdx=sel(JIdx, W.JIdx),
        JabF=sel(JabF, W.JabF), resF=sel(resF, W.resF),
        center_proj=sel(center_proj, W.center_proj),
        res_new_state=jnp.where(apply, new_state, W.res_new_state),
        res_new_energy=jnp.where(apply, new_energy, W.res_new_energy),
        res_new_energy_wo=jnp.where(apply, new_energy_wo, W.res_new_energy_wo),
    )
    energy_sum = jnp.sum(jnp.where(apply, new_energy, 0.0))
    return W, energy_sum


@functools.partial(jax.jit, static_argnames=("cfg", "img_w", "img_h"))
def linearize_target(W: Window, dIs: jax.Array, cfg: Config,
                     img_w: int, img_h: int, tgt: jax.Array):
    """`linearize_all` restricted to ONE target column (residuals whose
    target frame is `tgt`, traced index).

    Used for the post-LM final relinearization after re-fixing the newest
    frame's evaluation point (FullSystem.cc:833-846 + linearizeAll(true)):
    only pairs involving the newest frame see changed FEJ quantities, and
    no points are hosted in the newest frame at that stage, so the
    newest-target column is the complete changed set — residuals of other
    columns are bit-identical to the LM loop's last evaluation (same
    state, same precalc entries). Keeps the reference's sticky-OOB
    semantics (Residuals.cc:17-21: linearize early-outs OOB residuals
    without reset). Cuts the (P,F,8) gather lattice to (P,8) — the final
    relinearize was a third of the whole-BA device program's time.

    Returns (W', energy_sum) where energy_sum spans the FULL residual
    lattice (old columns' res_new_energy are still current), matching
    linearize_all's return for the RMSE bookkeeping."""
    P, F = W.P, W.F
    pc = make_precalc(W)
    fx, fy, cx, cy = pc.fxycxy[0], pc.fxycxy[1], pc.fxycxy[2], pc.fxycxy[3]
    wM3 = img_w - 3.0
    hM3 = img_h - 3.0

    col = lambda a: jnp.take(a, tgt, axis=1)        # (P, F, ...) -> (P, ...)
    lin_mask = (col(W.res_exist) & W.pt_valid & ~col(W.res_linearized)
                & W.frame_valid[tgt])
    prev_oob = col(W.res_state) == RES_OOB

    h = W.pt_host                                    # (P,)
    R0 = pc.R0[h, tgt]                               # (P,3,3)
    t0 = pc.t0[h, tgt]
    KRKi = pc.KRKi[h, tgt]
    Kt = pc.Kt[h, tgt]
    affLL = pc.aff[h, tgt]                           # (P,2)
    b0 = pc.b0[h]                                    # (P,)

    # center projection at the FEJ point
    KliP = jnp.stack([(W.pt_u - cx) / fx, (W.pt_v - cy) / fy,
                      jnp.ones_like(W.pt_u)], axis=-1)          # (P,3)
    ptp0 = jnp.einsum("pij,pj->pi", R0, KliP) + t0 * W.idepth_zero[:, None]
    drescale = 1.0 / ptp0[..., 2]
    new_idepth = W.idepth_zero * drescale
    u = ptp0[..., 0] * drescale
    v = ptp0[..., 1] * drescale
    Ku_c = u * fx + cx
    Kv_c = v * fy + cy
    center_ok = (drescale > 0) & (Ku_c > 1.1) & (Kv_c > 1.1) & (Ku_c < wM3) & (Kv_c < hM3)

    d_d_x = drescale * (t0[..., 0] - t0[..., 2] * u) * SCALE_IDEPTH * fx
    d_d_y = drescale * (t0[..., 1] - t0[..., 2] * v) * SCALE_IDEPTH * fy

    dCx2 = drescale * (R0[..., 2, 0] * u - R0[..., 0, 0])
    dCx3 = fx * drescale * (R0[..., 2, 1] * u - R0[..., 0, 1]) / fy
    dCx0 = (KliP[:, 0] * dCx2 + u) * SCALE_F
    dCx1 = (KliP[:, 1] * dCx3) * SCALE_F
    dCx2 = (dCx2 + 1.0) * SCALE_C
    dCx3 = dCx3 * SCALE_C
    dCy2 = fy * drescale * (R0[..., 2, 0] * v - R0[..., 1, 0]) / fx
    dCy3 = drescale * (R0[..., 2, 1] * v - R0[..., 1, 1])
    dCy0 = (KliP[:, 0] * dCy2) * SCALE_F
    dCy1 = (KliP[:, 1] * dCy3 + v) * SCALE_F
    dCy2 = dCy2 * SCALE_C
    dCy3 = (dCy3 + 1.0) * SCALE_C
    Jpdc = jnp.stack([jnp.stack([dCx0, dCx1, dCx2, dCx3], -1),
                      jnp.stack([dCy0, dCy1, dCy2, dCy3], -1)], axis=-2)  # (P,2,4)

    one = jnp.ones_like(u)
    Jxi_x = jnp.stack([new_idepth * fx, 0 * one, -new_idepth * u * fx,
                       -u * v * fx, (1 + u * u) * fx, -v * fx], -1)
    Jxi_y = jnp.stack([0 * one, new_idepth * fy, -new_idepth * v * fy,
                       -(1 + v * v) * fy, u * v * fy, u * fy], -1)
    Jpdxi = jnp.stack([Jxi_x, Jxi_y], axis=-2)                # (P,2,6)
    Jpdd = jnp.stack([d_d_x, d_d_y], axis=-1)                 # (P,2)
    center_proj = jnp.stack([Ku_c, Kv_c, new_idepth], -1)

    # pattern projections at the CURRENT state
    patt = jnp.asarray(PATTERN, jnp.float32)
    uP = W.pt_u[:, None] + patt[None, :, 0]                   # (P,8)
    vP = W.pt_v[:, None] + patt[None, :, 1]
    pk = jnp.stack([uP, vP, jnp.ones_like(uP)], axis=-1)      # (P,8,3)
    ptp = jnp.einsum("pij,pkj->pki", KRKi, pk) + Kt[:, None, :] * W.idepth[:, None, None]
    Ku = ptp[..., 0] / ptp[..., 2]
    Kv = ptp[..., 1] / ptp[..., 2]
    patt_ok = (Ku > 1.1) & (Kv > 1.1) & (Ku < wM3) & (Kv < hM3)

    packed = dIs.shape[-1] == 12
    tgt_b = jnp.broadcast_to(tgt, Ku.shape)
    if jax.default_backend() == "tpu":
        Ku, Kv = jax.lax.optimization_barrier((Ku, Kv))
        hit = (bilinear_packed_frames(dIs, tgt_b, Ku, Kv, 3) if packed
               else _bilinear_frames(dIs, tgt_b, Ku, Kv))     # (P,8,3)
        hit = jax.lax.optimization_barrier(hit)
    else:
        hit = (bilinear_packed_frames(dIs, tgt_b, Ku, Kv, 3) if packed
               else _bilinear_frames(dIs, tgt_b, Ku, Kv))     # (P,8,3)
    finite = jnp.isfinite(hit[..., 0])
    oob = prev_oob | ~center_ok | ~jnp.all(patt_ok & finite, axis=-1)

    resid = hit[..., 0] - (affLL[..., 0:1] * W.pt_color + affLL[..., 1:2])
    drdA = W.pt_color - b0[:, None]
    gsq = hit[..., 1] ** 2 + hit[..., 2] ** 2
    wg = jnp.sqrt(cfg.outlier_th_sum_component / (cfg.outlier_th_sum_component + gsq))
    wgt = 0.5 * (wg + W.pt_weights)
    ar = jnp.abs(resid)
    hw_e = jnp.where(ar < cfg.huber_th, 1.0, cfg.huber_th / jnp.maximum(ar, 1e-12))
    energy = jnp.sum(wgt * wgt * hw_e * resid * resid * (2.0 - hw_e), axis=-1)

    hw = jnp.where(hw_e < 1.0, jnp.sqrt(hw_e), hw_e) * wgt
    JIdx = jnp.stack([hit[..., 1] * hw, hit[..., 2] * hw], axis=-2)  # (P,2,8)
    Jab0 = drdA * hw
    Jab1 = hw
    if cfg.affine_opt_mode_a < 0:
        Jab0 = jnp.zeros_like(Jab0)
    if cfg.affine_opt_mode_b < 0:
        Jab1 = jnp.zeros_like(Jab1)
    JabF = jnp.stack([Jab0, Jab1], axis=-2)
    resF = resid * hw
    wJI2 = jnp.sum(hw * hw * gsq, axis=-1)

    th = jnp.maximum(W.frame_energy_th[W.pt_host], W.frame_energy_th[tgt])
    is_outlier = (energy > th) | (wJI2 < 2.0)
    new_energy = jnp.where(is_outlier, th, energy)

    new_state = jnp.where(oob, RES_OOB,
                          jnp.where(is_outlier, RES_OUTLIER, RES_IN))
    new_energy = jnp.where(oob, col(W.res_energy), new_energy)
    new_energy_wo = jnp.where(oob, -1.0, energy)

    apply = lin_mask

    def put(field, upd):
        m = apply.reshape((P,) + (1,) * (upd.ndim - 1))
        merged = jnp.where(m, upd, col(field))
        return jax.lax.dynamic_update_slice_in_dim(
            field, merged[:, None], tgt, axis=1)

    W = W._replace(
        Jpdxi=put(W.Jpdxi, Jpdxi), Jpdc=put(W.Jpdc, Jpdc),
        Jpdd=put(W.Jpdd, Jpdd), JIdx=put(W.JIdx, JIdx),
        JabF=put(W.JabF, JabF), resF=put(W.resF, resF),
        center_proj=put(W.center_proj, center_proj),
        res_new_state=put(W.res_new_state, new_state),
        res_new_energy=put(W.res_new_energy, new_energy),
        res_new_energy_wo=put(W.res_new_energy_wo, new_energy_wo),
    )
    full_mask = (W.res_exist & W.pt_valid[:, None] & ~W.res_linearized
                 & W.frame_valid[None, :])
    energy_sum = jnp.sum(jnp.where(full_mask, W.res_new_energy, 0.0))
    return W, energy_sum


@jax.jit
def apply_res(W: Window) -> Window:
    """Commit NewState for the active (non-linearized) residual set
    (applyRes(true), Residuals.h:70-87)."""
    mask = (W.res_exist & W.pt_valid[:, None] & ~W.res_linearized
            & W.frame_valid[None, :])
    frozen = W.res_state == RES_OOB       # OOB residuals never come back
    upd = mask & ~frozen
    active = upd & (W.res_new_state == RES_IN)
    return W._replace(
        res_active=jnp.where(upd, active, W.res_active),
        res_state=jnp.where(upd, W.res_new_state, W.res_state),
        res_energy=jnp.where(upd, W.res_new_energy, W.res_energy),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def set_new_frame_energy_th(W: Window, newest: jax.Array, cfg: Config) -> Window:
    """Quantile-based per-frame outlier threshold (FullSystem.cc:1762-1793)."""
    mask = (W.res_exist & W.pt_valid[:, None] & ~W.res_linearized
            & W.frame_valid[None, :] & (W.res_new_energy_wo >= 0))
    tsel = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1) == newest
    mask = mask & tsel
    vals = jnp.where(mask, W.res_new_energy_wo, jnp.inf).reshape(-1)
    n = jnp.sum(mask)
    svals = jnp.sort(vals)
    nth = jnp.clip((cfg.frame_energy_th_n * n).astype(jnp.int32), 0,
                   vals.shape[0] - 1)
    nth_el = jnp.sqrt(jnp.where(n > 0, svals[nth], 12.0 * 12.0 * 8.0))
    th = nth_el * cfg.frame_energy_th_fac_median
    th = (26.0 * cfg.frame_energy_th_const_weight
          + th * (1.0 - cfg.frame_energy_th_const_weight))
    th = th * th * cfg.overall_energy_th_weight ** 2
    th = jnp.where(n > 0, th, 12.0 * 12.0 * 8.0)
    return W._replace(frame_energy_th=W.frame_energy_th.at[newest].set(th))


# ---------------------------------------------------------------------------
# accumulation + stitch
# ---------------------------------------------------------------------------

def _res_approx(W: Window, pc: Precalc, mode: int):
    """resApprox per mode (AccumulatedTopHessian.cc:40-66)."""
    if mode == 0:
        return W.resF
    if mode == 2:
        return W.res_toZero
    dp = pc.adHTdelta[W.pt_host]                 # (P,F,8)
    dd = (W.idepth - W.idepth_zero)[:, None]
    Jp_dx = (jnp.einsum("pfj,pfj->pf", W.Jpdxi[:, :, 0, :], dp[..., :6])
             + jnp.einsum("pfj,j->pf", W.Jpdc[:, :, 0, :], pc.c_delta)
             + W.Jpdd[..., 0] * dd)
    Jp_dy = (jnp.einsum("pfj,pfj->pf", W.Jpdxi[:, :, 1, :], dp[..., :6])
             + jnp.einsum("pfj,j->pf", W.Jpdc[:, :, 1, :], pc.c_delta)
             + W.Jpdd[..., 1] * dd)
    return (W.res_toZero
            + W.JIdx[:, :, 0, :] * Jp_dx[..., None]
            + W.JIdx[:, :, 1, :] * Jp_dy[..., None]
            + W.JabF[:, :, 0, :] * dp[..., 6:7]
            + W.JabF[:, :, 1, :] * dp[..., 7:8])


def _mode_mask(W: Window, mode: int, pt_mask=None):
    base = W.res_active & W.res_exist & W.frame_valid[None, :]
    if pt_mask is None:
        pt_mask = W.pt_valid
    base = base & pt_mask[:, None]
    if mode == 0:
        return base & ~W.res_linearized
    if mode == 1:
        return base & W.res_linearized
    return base  # mode 2: every active residual of the marg set


def _accumulate_top(W: Window, pc: Precalc, mode: int, pt_mask=None):
    """Per-pair 13x13 blocks + per-point Hdd/bd/Hcd for one mode."""
    P, F = W.P, W.F
    mask = _mode_mask(W, mode, pt_mask)
    resApprox = _res_approx(W, pc, mode)

    # rows (P,F,8,13): [JIdx_x*Jpdc0 + JIdx_y*Jpdc1 | same for Jpdxi | Jab | r]
    rows_c = (W.JIdx[:, :, 0, :, None] * W.Jpdc[:, :, None, 0, :]
              + W.JIdx[:, :, 1, :, None] * W.Jpdc[:, :, None, 1, :])   # (P,F,8,4)
    rows_xi = (W.JIdx[:, :, 0, :, None] * W.Jpdxi[:, :, None, 0, :]
               + W.JIdx[:, :, 1, :, None] * W.Jpdxi[:, :, None, 1, :])  # (P,F,8,6)
    rows = jnp.concatenate(
        [rows_c, rows_xi, W.JabF[:, :, 0, :, None], W.JabF[:, :, 1, :, None],
         resApprox[..., None]], axis=-1)                                # (P,F,8,13)
    rows = rows * mask[..., None, None]

    # pair aggregation: aidx = h + F*t (column-major like the reference)
    outer = jnp.einsum("pfka,pfkb->pfab", rows, rows)                   # (P,F,13,13)
    hostoh = jax.nn.one_hot(W.pt_host, F, dtype=jnp.float32)            # (P,Fh)
    acc = jnp.einsum("ph,pfab->hfab", hostoh, outer)                    # (Fh,Ft,13,13)

    # per-point pieces (AccumulatedTopHessian.cc:94-100)
    JI_r = jnp.einsum("pfik,pfk->pfi", W.JIdx, resApprox)               # (P,F,2)
    JIdx2 = jnp.einsum("pfik,pfjk->pfij", W.JIdx, W.JIdx)               # (P,F,2,2)
    Ji2_Jpdd = jnp.einsum("pfij,pfj->pfi", JIdx2, W.Jpdd)               # (P,F,2)
    m = mask.astype(jnp.float32)
    bd = jnp.sum(m * jnp.einsum("pfi,pfi->pf", JI_r, W.Jpdd), axis=1)
    Hdd = jnp.sum(m * jnp.einsum("pfi,pfi->pf", Ji2_Jpdd, W.Jpdd), axis=1)
    Hcd = jnp.sum(m[..., None] * (W.Jpdc[:, :, 0, :] * Ji2_Jpdd[..., 0:1]
                                  + W.Jpdc[:, :, 1, :] * Ji2_Jpdd[..., 1:2]), axis=1)
    nres = jnp.sum(mask)
    return acc, Hdd, bd, Hcd, nres


def _stitch_top(acc, pc: Precalc, W: Window, use_prior: bool):
    """stitchDouble (AccumulatedTopHessian.cc:131-198), fully vectorized."""
    F = acc.shape[0]
    n = CPARS + 8 * F
    AH, AT = pc.adHost, pc.adTarget                      # (F,F,8,8)
    G = acc[:, :, CPARS:CPARS + 8, CPARS:CPARS + 8]      # (F,F,8,8)
    Gc = acc[:, :, CPARS:CPARS + 8, 0:CPARS]             # (F,F,8,4)
    Gcc = acc[:, :, 0:CPARS, 0:CPARS]
    gb = acc[:, :, CPARS:CPARS + 8, CPARS + 8]           # (F,F,8)
    cb = acc[:, :, 0:CPARS, CPARS + 8]                   # (F,F,4)

    Bhh = jnp.einsum("htij,htjk,htlk->htil", AH, G, AH)
    Btt = jnp.einsum("htij,htjk,htlk->htil", AT, G, AT)
    Bht = jnp.einsum("htij,htjk,htlk->htil", AH, G, AT)
    col_h = jnp.einsum("htij,htjc->htic", AH, Gc)        # (F,F,8,4)
    col_t = jnp.einsum("htij,htjc->htic", AT, Gc)
    b_h = jnp.einsum("htij,htj->hti", AH, gb)
    b_t = jnp.einsum("htij,htj->hti", AT, gb)

    grid = jnp.zeros((F, F, 8, 8), jnp.float32)
    hs = jnp.arange(F)
    # sum over t of Bhh goes to (h,h); over h of Btt to (t,t); Bht to (h,t)
    grid = grid.at[hs, hs].add(jnp.sum(Bhh, axis=1))
    grid = grid.at[hs, hs].add(jnp.sum(Btt, axis=0))
    grid = grid + Bht

    # symmetrize off-diagonal blocks exactly like the reference
    gridT = jnp.swapaxes(jnp.swapaxes(grid, 0, 1), 2, 3)
    eye = jnp.eye(F, dtype=bool)[:, :, None, None]
    sym = jnp.where(eye, grid, grid + gridT)
    # the reference leaves H[h,t] = H[t,h]^T; "sym" already satisfies that.

    Hcc = jnp.sum(Gcc, axis=(0, 1))
    colC = jnp.sum(col_h, axis=1) + jnp.sum(col_t, axis=0)   # (F,8,4)
    bF = jnp.sum(b_h, axis=1) + jnp.sum(b_t, axis=0)         # (F,8)
    bC = jnp.sum(cb, axis=(0, 1))

    H = jnp.zeros((n, n), jnp.float32)
    H = H.at[:CPARS, :CPARS].set(Hcc)
    Hffs = sym.transpose(0, 2, 1, 3).reshape(8 * F, 8 * F)
    H = H.at[CPARS:, CPARS:].set(Hffs)
    colCf = colC.reshape(8 * F, CPARS)
    H = H.at[CPARS:, :CPARS].set(colCf)
    H = H.at[:CPARS, CPARS:].set(colCf.T)
    b = jnp.concatenate([bC, bF.reshape(-1)])

    if use_prior:
        delta_prior = (W.state - 0.0)[:, :8]   # priorZero == 0 (FrameHessian.h:156-158)
        pdiag = W.prior * W.frame_valid[:, None]
        H = H.at[jnp.arange(CPARS), jnp.arange(CPARS)].add(W.c_prior)
        b = b.at[:CPARS].add(W.c_prior * pc.c_delta)
        idx = CPARS + jnp.arange(8 * W.F)
        H = H.at[idx, idx].add(pdiag.reshape(-1))
        b = b.at[CPARS:].add((pdiag * delta_prior).reshape(-1))
    return H, b


def _accumulate_sc(W: Window, pc: Precalc, Hdd_tot, bd_tot, Hcd_tot,
                   shift_prior: bool, pt_mask=None):
    """AccumulatedSCHessian accumulation + stitch (AccumulatedSCHessian.cc)."""
    P, F = W.P, W.F
    if pt_mask is None:
        pt_mask = W.pt_valid
    act = W.res_active & W.res_exist & W.frame_valid[None, :] & pt_mask[:, None]
    ngood = jnp.sum(act, axis=1)
    has = (ngood > 0) & pt_mask

    Hd = jnp.maximum(Hdd_tot + W.pt_prior, 1e-10)
    HdiF = jnp.where(has, 1.0 / Hd, 0.0)
    bdSum = bd_tot + (W.pt_prior * (W.idepth - W.idepth_zero) if shift_prior else 0.0)
    bdSum = jnp.where(has, bdSum, 0.0)
    Hcd = jnp.where(has[:, None], Hcd_tot, 0.0)

    # JpJdF (Residuals.h:123-128)
    JIdx2 = jnp.einsum("pfik,pfjk->pfij", W.JIdx, W.JIdx)
    JI_JI_Jd = jnp.einsum("pfij,pfj->pfi", JIdx2, W.Jpdd)
    JabJIdx = jnp.einsum("pfik,pfjk->pfij", W.JabF, W.JIdx)
    JpJd6 = (W.Jpdxi[:, :, 0, :] * JI_JI_Jd[..., 0:1]
             + W.Jpdxi[:, :, 1, :] * JI_JI_Jd[..., 1:2])
    JpJd2 = jnp.einsum("pfij,pfj->pfi", JabJIdx, W.Jpdd)
    JpJdF = jnp.concatenate([JpJd6, JpJd2], axis=-1) * act[..., None]   # (P,F,8)

    hostoh = jax.nn.one_hot(W.pt_host, F, dtype=jnp.float32) * has[:, None]

    Hcc_sc = jnp.einsum("p,pi,pj->ij", HdiF, Hcd, Hcd)
    bc_sc = jnp.einsum("p,pi,p->i", HdiF, Hcd, bdSum)
    accE = jnp.einsum("ph,p,pti,pc->htic", hostoh, HdiF, JpJdF, Hcd)    # (F,F,8,4)
    accEB = jnp.einsum("ph,p,pti->hti", hostoh, HdiF * bdSum, JpJdF)    # (F,F,8)
    accD = jnp.einsum("ph,p,pti,psj->htisj", hostoh, HdiF, JpJdF, JpJdF)
    # accD: (Fh, Ft1, 8, Ft2, 8) -> reorder to (h, t1, t2, 8, 8)
    accD = accD.transpose(0, 1, 3, 2, 4)

    AH, AT = pc.adHost, pc.adTarget
    n = CPARS + 8 * F
    H = jnp.zeros((n, n), jnp.float32)
    b = jnp.zeros((n,), jnp.float32)

    colH = jnp.einsum("htij,htjc->htic", AH, accE)
    colT = jnp.einsum("htij,htjc->htic", AT, accE)
    colC = jnp.sum(colH, axis=1) + jnp.sum(colT, axis=0)      # (F,8,4)
    bH = jnp.einsum("htij,htj->hti", AH, accEB)
    bT = jnp.einsum("htij,htj->hti", AT, accEB)
    bF = jnp.sum(bH, axis=1) + jnp.sum(bT, axis=0)

    # frame-frame blocks (AccumulatedSCHessian.cc:91-108):
    # for (i=h, j=t1, k=t2) with D = accD[i,j,k]:
    #   H[i,i] += AH[ij] D AH[ik]^T ;  H[j,k] += AT[ij] D AT[ik]^T
    #   H[j,i] += AT[ij] D AH[ik]^T ;  H[i,k] += AH[ij] D AT[ik]^T
    D_AHAH = jnp.einsum("hjab,hjkbc,hkdc->hjkad", AH, accD, AH)
    D_ATAT = jnp.einsum("hjab,hjkbc,hkdc->hjkad", AT, accD, AT)
    D_ATAH = jnp.einsum("hjab,hjkbc,hkdc->hjkad", AT, accD, AH)
    D_AHAT = jnp.einsum("hjab,hjkbc,hkdc->hjkad", AH, accD, AT)

    grid = jnp.zeros((F, F, 8, 8), jnp.float32)
    hs = jnp.arange(F)
    grid = grid.at[hs, hs].add(jnp.sum(D_AHAH, axis=(1, 2)))             # (i,i)
    grid = grid + jnp.sum(D_ATAT, axis=0)                                # (j,k)
    grid = grid + jnp.sum(D_ATAH, axis=2).transpose(1, 0, 2, 3)          # (j,i)
    grid = grid + jnp.sum(D_AHAT, axis=1)                                # (i,k)

    H = H.at[CPARS:, CPARS:].set(grid.transpose(0, 2, 1, 3).reshape(8 * F, 8 * F))
    H = H.at[:CPARS, :CPARS].set(Hcc_sc)
    colCf = colC.reshape(8 * F, CPARS)
    H = H.at[CPARS:, :CPARS].set(colCf)
    H = H.at[:CPARS, CPARS:].set(colCf.T)
    b = b.at[:CPARS].set(bc_sc)
    b = b.at[CPARS:].set(bF.reshape(-1))

    aux = dict(HdiF=HdiF, bdSum=bdSum, Hcd=Hcd, JpJdF=JpJdF, ngood=ngood)
    return H, b, aux


@jax.jit
def build_system(W: Window):
    """Accumulate A (mode 0), L (mode 1, with priors), and SC parts.

    Returns (HA, bA, HL, bL, Hsc, bsc, aux, stitched_delta, nres_A)."""
    pc = make_precalc(W)
    accA, HddA, bdA, HcdA, nresA = _accumulate_top(W, pc, mode=0)
    accL, HddL, bdL, HcdL, _ = _accumulate_top(W, pc, mode=1)
    HA, bA = _stitch_top(accA, pc, W, use_prior=False)
    HL, bL = _stitch_top(accL, pc, W, use_prior=True)
    Hsc, bsc, aux = _accumulate_sc(W, pc, HddA + HddL, bdA + bdL,
                                   HcdA + HcdL, shift_prior=True)
    delta = jnp.concatenate([pc.c_delta,
                             ((W.state - W.state_zero)[:, :8]
                              * W.frame_valid[:, None]).reshape(-1)])
    return HA, bA, HL, bL, Hsc, bsc, aux, delta, nresA


@jax.jit
def resubstitute(W: Window, x: jax.Array, aux_HdiF, aux_bdSum, aux_Hcd,
                 aux_JpJdF) -> Window:
    """Per-point idepth steps (EnergyFunctional::resubstituteF, :491-547)
    plus the frame/calib steps."""
    pc = make_precalc(W)
    F = W.F
    xc = x[:CPARS]
    xf = x[CPARS:].reshape(F, 8)
    # xAd[h,t] = x_h @ AH[h,t] + x_t @ AT[h,t]
    xAd = (jnp.einsum("hj,htjk->htk", xf, pc.adHost)
           + jnp.einsum("tj,htjk->htk", xf, pc.adTarget))
    act = W.res_active & W.res_exist & W.frame_valid[None, :] & W.pt_valid[:, None]
    xAd_p = xAd[W.pt_host]                                # (P,F,8)
    b = aux_bdSum - aux_Hcd @ xc
    b = b - jnp.sum(jnp.einsum("pfk,pfk->pf", xAd_p, aux_JpJdF) * act, axis=1)
    step = -b * aux_HdiF
    ngood = jnp.sum(act, axis=1)
    step = jnp.where((ngood > 0) & jnp.isfinite(step), step, 0.0)

    c_step = -x[:CPARS]
    f_step = jnp.zeros_like(W.frame_step)
    f_step = f_step.at[:, :8].set(-xf)
    return W._replace(pt_step=step, c_step=c_step.astype(jnp.float32),
                      frame_step=f_step.astype(jnp.float32))


# ---------------------------------------------------------------------------
# state stepping (FullSystem backup/doStep/load; :1546-1692)
# ---------------------------------------------------------------------------

@jax.jit
def backup_state(W: Window) -> Window:
    return W._replace(state_backup=W.state, c_backup=W.c_value,
                      idepth_backup=W.idepth)


@jax.jit
def do_step(W: Window, stepfac_c, stepfac_t, stepfac_r, stepfac_a, stepfac_d):
    """Returns (new W, canbreak, stats)."""
    pstep = jnp.concatenate([
        jnp.full(3, stepfac_t), jnp.full(3, stepfac_r), jnp.full(4, stepfac_a)])
    new_state = W.state_backup + pstep * W.frame_step
    new_c = W.c_backup + stepfac_c * W.c_step
    new_id = W.idepth_backup + stepfac_d * W.pt_step
    act = W.pt_valid
    new_id = jnp.where(act, new_id, W.idepth)

    nf = jnp.maximum(jnp.sum(W.frame_valid), 1)
    fv = W.frame_valid[:, None]
    sumA = jnp.sum(fv[:, 0] * W.frame_step[:, 6] ** 2) / nf
    sumB = jnp.sum(fv[:, 0] * W.frame_step[:, 7] ** 2) / nf
    sumT = jnp.sum(fv * W.frame_step[:, 0:3] ** 2) / nf
    sumR = jnp.sum(fv * W.frame_step[:, 3:6] ** 2) / nf
    nid = jnp.maximum(jnp.sum(act), 1)
    sumID = jnp.sum(act * W.pt_step ** 2) / nid
    sumNID = jnp.sum(act * jnp.abs(W.idepth_backup)) / nid

    W = W._replace(state=jnp.where(fv, new_state, W.state),
                   c_value=new_c, idepth=new_id,
                   idepth_zero=jnp.where(act, new_id, W.idepth_zero))
    th = 0.00005 * 1.2  # setting_thOptIterations = 1.2
    canbreak = ((jnp.sqrt(sumA) < 0.0005 * 1.2) & (jnp.sqrt(sumB) < th)
                & (jnp.sqrt(sumR) < th) & (jnp.sqrt(sumT) * sumNID < th))
    return W, canbreak


@jax.jit
def do_step_momentum(W: Window, prev_frame_step, prev_pt_step):
    """doStepFromBackup, SOLVER_MOMENTUM branch (FullSystem.cc:1557-1584):
    the applied step blends the fresh solver step with half the previous
    iteration's raw step on the pose head and the point idepths; calib and
    affine take the raw step with no step factor. Returns (new W, canbreak)
    with the break thresholds evaluated on the blended step."""
    step = W.frame_step.at[:, :6].add(0.5 * prev_frame_step[:, :6])
    new_state = W.state_backup + step
    new_c = W.c_backup + W.c_step
    pstep = W.pt_step + 0.5 * prev_pt_step
    new_id = W.idepth_backup + pstep
    act = W.pt_valid
    new_id = jnp.where(act, new_id, W.idepth)

    nf = jnp.maximum(jnp.sum(W.frame_valid), 1)
    fv = W.frame_valid[:, None]
    sumA = jnp.sum(fv[:, 0] * step[:, 6] ** 2) / nf
    sumB = jnp.sum(fv[:, 0] * step[:, 7] ** 2) / nf
    sumT = jnp.sum(fv * step[:, 0:3] ** 2) / nf
    sumR = jnp.sum(fv * step[:, 3:6] ** 2) / nf
    nid = jnp.maximum(jnp.sum(act), 1)
    sumID = jnp.sum(act * pstep ** 2) / nid
    sumNID = jnp.sum(act * jnp.abs(W.idepth_backup)) / nid
    del sumID  # tracked by the reference but unused in the break test

    W = W._replace(state=jnp.where(fv, new_state, W.state),
                   c_value=new_c, idepth=new_id,
                   idepth_zero=jnp.where(act, new_id, W.idepth_zero))
    th = 0.00005 * 1.2  # setting_thOptIterations = 1.2
    canbreak = ((jnp.sqrt(sumA) < 0.0005 * 1.2) & (jnp.sqrt(sumB) < th)
                & (jnp.sqrt(sumR) < th) & (jnp.sqrt(sumT) * sumNID < th))
    return W, canbreak


@jax.jit
def load_backup(W: Window) -> Window:
    idep = jnp.where(W.pt_valid, W.idepth_backup, W.idepth)
    return W._replace(state=W.state_backup, c_value=W.c_backup,
                      idepth=idep, idepth_zero=idep)


@jax.jit
def calc_L_energy(W: Window):
    """calcLEnergyF_MT (EnergyFunctional.cc:361-378, 627-682)."""
    pc = make_precalc(W)
    delta_prior = (W.state - 0.0)[:, :8] * W.frame_valid[:, None]
    E = jnp.sum(delta_prior * W.prior * delta_prior)
    E = E + jnp.sum(pc.c_delta * W.c_prior * pc.c_delta)

    mask = _mode_mask(W, 1)
    dp = pc.adHTdelta[W.pt_host]
    dd = (W.idepth - W.idepth_zero)[:, None]
    Jp_dx = (jnp.einsum("pfj,pfj->pf", W.Jpdxi[:, :, 0, :], dp[..., :6])
             + jnp.einsum("pfj,j->pf", W.Jpdc[:, :, 0, :], pc.c_delta)
             + W.Jpdd[..., 0] * dd)
    Jp_dy = (jnp.einsum("pfj,pfj->pf", W.Jpdxi[:, :, 1, :], dp[..., :6])
             + jnp.einsum("pfj,j->pf", W.Jpdc[:, :, 1, :], pc.c_delta)
             + W.Jpdd[..., 1] * dd)
    Jdelta = (W.JIdx[:, :, 0, :] * Jp_dx[..., None]
              + W.JIdx[:, :, 1, :] * Jp_dy[..., None]
              + W.JabF[:, :, 0, :] * dp[..., 6:7]
              + W.JabF[:, :, 1, :] * dp[..., 7:8])
    term = jnp.sum(Jdelta * (Jdelta + 2.0 * W.res_toZero), axis=-1)
    E = E + jnp.sum(jnp.where(mask, term, 0.0))
    dF = (W.idepth - W.idepth_zero) * W.pt_valid
    E = E + jnp.sum(dF * dF * W.pt_prior)
    return E


@jax.jit
def fix_linearization(W: Window, pt_mask) -> Window:
    """res_toZero = resF - J*delta for active residuals of the given points
    (fixLinearizationF, Residuals.cc:216-242); marks them linearized."""
    pc = make_precalc(W)
    dp = pc.adHTdelta[W.pt_host]
    dd = (W.idepth - W.idepth_zero)[:, None]
    Jp_dx = (jnp.einsum("pfj,pfj->pf", W.Jpdxi[:, :, 0, :], dp[..., :6])
             + jnp.einsum("pfj,j->pf", W.Jpdc[:, :, 0, :], pc.c_delta)
             + W.Jpdd[..., 0] * dd)
    Jp_dy = (jnp.einsum("pfj,pfj->pf", W.Jpdxi[:, :, 1, :], dp[..., :6])
             + jnp.einsum("pfj,j->pf", W.Jpdc[:, :, 1, :], pc.c_delta)
             + W.Jpdd[..., 1] * dd)
    rtz = (W.resF
           - W.JIdx[:, :, 0, :] * Jp_dx[..., None]
           - W.JIdx[:, :, 1, :] * Jp_dy[..., None]
           - W.JabF[:, :, 0, :] * dp[..., 6:7]
           - W.JabF[:, :, 1, :] * dp[..., 7:8])
    mask = (W.res_active & W.res_exist & pt_mask[:, None]
            & W.frame_valid[None, :])
    return W._replace(
        res_toZero=jnp.where(mask[..., None], rtz, W.res_toZero),
        res_linearized=W.res_linearized | mask,
    )


@jax.jit
def accumulate_marg(W: Window, pt_mask):
    """Mode-2 top accumulation + SC for the points being marginalized
    (EnergyFunctional::marginalizePointsF, :165-222). Returns (H, b) with
    H = M - Msc, b = Mb - Mbsc (both f32, caller scales by margWeightFac)."""
    pc = make_precalc(W)
    acc, Hdd, bd, Hcd, nres = _accumulate_top(W, pc, mode=2, pt_mask=pt_mask)
    M, Mb = _stitch_top(acc, pc, W, use_prior=False)
    Msc, Mbsc, _ = _accumulate_sc(W, pc, Hdd, bd, Hcd, shift_prior=False,
                                  pt_mask=pt_mask)
    return M - Msc, Mb - Mbsc, nres
