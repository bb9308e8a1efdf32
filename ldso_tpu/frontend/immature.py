"""Immature points: batched epipolar trace + depth-only activation GN.

Rebuild of the reference ImmaturePoint (src/internal/ImmaturePoint.cc):
  * `make_pool` <- the ImmaturePoint constructor (:14-38): pattern colors,
    gradient-matched weights, gradH.
  * `trace`     <- traceOn (:47-310): per new frame, project the idepth
    interval, discrete SSD search over <= 100 epipolar steps with the
    rotated 8-pattern, <= 3 GN refinement steps along the line, then update
    [idepth_min, idepth_max] from errorInPixel. The reference traces points
    one-by-one in the mapping thread; here ALL candidates x 100 steps x 8
    pattern pixels run as one batched gather program.
  * `linearize_depth_residual` / `activate` <- linearizeResidual (:312-381)
    + FullSystem::optimizeImmaturePoint (FullSystem.cc:892-1010): depth-only
    LM over every (candidate x window-frame) residual, batched.

Statuses mirror ImmaturePointStatus (include/internal/ImmaturePoint.h:31-38).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ldso_tpu.config import Config, PATTERN
from ldso_tpu.camera.calib import Calibration
from ldso_tpu.ops.interp import bilinear, bilinear_packed, pack_taps

# status codes
IPS_GOOD = 0
IPS_OOB = 1
IPS_OUTLIER = 2
IPS_SKIPPED = 3
IPS_BADCONDITION = 4
IPS_UNINITIALIZED = 5

MAX_STEPS = 100           # absolute cap (ImmaturePoint.cc:157 clamps at 100)


def _steps_cap(W: int, H: int, cfg) -> int:
    """Static bound on the epipolar step count: n_steps <= 2 + maxPixSearch /
    stepsize (ImmaturePoint.cc:101-157), so the traced search loop doesn't
    pay for 100 slots when geometry bounds it at ~62."""
    return min(MAX_STEPS, int(2.0 + (W + H) * cfg.max_pix_search
                              / cfg.trace_stepsize) + 2)

# residual states (include/internal/Residuals.h)
RES_IN = 0
RES_OOB = 1
RES_OUTLIER = 2


class ImmaturePool(NamedTuple):
    """Fixed-capacity immature-candidate pool (one per host keyframe)."""
    u: jax.Array            # (cap,)
    v: jax.Array
    valid: jax.Array        # slot holds a live candidate
    color: jax.Array        # (cap, 8) host pattern colors
    weights: jax.Array      # (cap, 8) gradient-dependent weights
    gradH: jax.Array        # (cap, 2, 2)
    idepth_min: jax.Array
    idepth_max: jax.Array   # +inf when uninitialized
    quality: jax.Array
    energy_th: jax.Array
    status: jax.Array       # (cap,) int32 IPS_*
    last_u: jax.Array
    last_v: jax.Array
    last_interval: jax.Array
    my_type: jax.Array      # (cap,) int32 selector status (1/2/4)


@functools.partial(jax.jit, static_argnames=("cap", "cfg"))
def make_pool(status_map: jax.Array, dI0: jax.Array, cap: int, cfg: Config) -> ImmaturePool:
    """Build a pool from a selection status map ((H,W) int, 0 = unselected).

    Mirrors ImmaturePoint ctor (ImmaturePoint.cc:14-38); candidates whose
    pattern colors are non-finite are dropped."""
    H, W = status_map.shape
    flat = status_map.reshape(-1)
    sel = flat != 0
    idx = jnp.nonzero(sel, size=cap, fill_value=0)[0]
    got = jnp.arange(cap) < jnp.sum(sel)
    u = (idx % W).astype(jnp.float32)
    v = (idx // W).astype(jnp.float32)
    my_type = jnp.take(flat, idx)

    patt = jnp.asarray(PATTERN, jnp.float32)
    uP = u[:, None] + patt[None, :, 0]
    vP = v[:, None] + patt[None, :, 1]
    ptc = bilinear(dI0, uP, vP)                 # (cap, 8, 3)
    color = ptc[..., 0]
    g = ptc[..., 1:3]
    gradH = jnp.einsum("npi,npj->nij", g, g)
    gsq = jnp.sum(g * g, axis=-1)
    weights = jnp.sqrt(cfg.outlier_th_sum_component
                       / (cfg.outlier_th_sum_component + gsq))
    finite = jnp.all(jnp.isfinite(color), axis=-1)
    valid = got & finite

    energy_th = (8.0 * cfg.outlier_th
                 * cfg.overall_energy_th_weight * cfg.overall_energy_th_weight)
    capf = jnp.full((cap,), jnp.inf, jnp.float32)
    return ImmaturePool(
        u=u, v=v, valid=valid, color=color, weights=weights, gradH=gradH,
        idepth_min=jnp.zeros(cap, jnp.float32), idepth_max=capf,
        quality=jnp.full((cap,), 10000.0, jnp.float32),
        energy_th=jnp.full((cap,), energy_th, jnp.float32),
        status=jnp.full((cap,), IPS_UNINITIALIZED, jnp.int32),
        last_u=jnp.full((cap,), -1.0, jnp.float32),
        last_v=jnp.full((cap,), -1.0, jnp.float32),
        last_interval=jnp.zeros(cap, jnp.float32),
        my_type=my_type.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("calib", "cfg"))
def trace(pool: ImmaturePool, dI_target: jax.Array, KRKi: jax.Array,
          Kt: jax.Array, aff: jax.Array, calib: Calibration, cfg: Config) -> ImmaturePool:
    """Batched traceOn (ImmaturePoint.cc:47-310) against one new frame.

    KRKi: (3,3) = K R_target<-host K^-1; Kt: (3,) = K t; aff: (2,) relative
    host->target brightness transfer. Each may also carry a leading
    per-candidate axis ((N,3,3)/(N,3)/(N,2)) — the flat-arena path where
    every candidate has its own host frame."""
    W, H = calib.w[0], calib.h[0]
    max_pix_search = (W + H) * cfg.max_pix_search
    patt = jnp.asarray(PATTERN, jnp.float32)
    N = pool.u.shape[0]
    if KRKi.ndim == 2:                       # shared-transform callers
        KRKi = jnp.broadcast_to(KRKi, (N, 3, 3))
        Kt = jnp.broadcast_to(Kt, (N, 3))
        aff = jnp.broadcast_to(aff, (N, 2))

    sticky_oob = pool.status == IPS_OOB
    active = pool.valid & ~sticky_oob

    ones = jnp.ones_like(pool.u)
    pr = jnp.einsum("nij,nj->ni",
                    KRKi, jnp.stack([pool.u, pool.v, ones], -1))   # (N,3)
    ptp_min = pr + Kt * pool.idepth_min[:, None]
    u_min = ptp_min[:, 0] / ptp_min[:, 2]
    v_min = ptp_min[:, 1] / ptp_min[:, 2]
    inb_min = (u_min > 4) & (v_min > 4) & (u_min < W - 5) & (v_min < H - 5)

    finite_max = jnp.isfinite(pool.idepth_max)
    id_max = jnp.where(finite_max, pool.idepth_max, 0.01)
    ptp_max = pr + Kt * id_max[:, None]
    u_max0 = ptp_max[:, 0] / ptp_max[:, 2]
    v_max0 = ptp_max[:, 1] / ptp_max[:, 2]

    dist_f = jnp.sqrt((u_min - u_max0) ** 2 + (v_min - v_max0) ** 2)
    # infinite-depth branch: stretch direction to maxPixSearch (:101-122)
    dnorm = 1.0 / jnp.maximum(dist_f, 1e-12)
    u_max_inf = u_min + max_pix_search * (u_max0 - u_min) * dnorm
    v_max_inf = v_min + max_pix_search * (v_max0 - v_min) * dnorm
    u_max = jnp.where(finite_max, u_max0, u_max_inf)
    v_max = jnp.where(finite_max, v_max0, v_max_inf)
    dist = jnp.where(finite_max, dist_f, max_pix_search)
    inb_max = (u_max > 4) & (v_max > 4) & (u_max < W - 5) & (v_max < H - 5)

    oob = ~inb_min | ~inb_max
    skipped = finite_max & (dist < cfg.trace_slack_interval) & ~oob
    # scale-change gate (:125-129)
    scale_ok = (pool.idepth_min < 0) | ((ptp_min[:, 2] > 0.75) & (ptp_min[:, 2] < 1.5))
    oob = oob | (~scale_ok)

    # error bound from gradH (:133-146)
    dx0 = cfg.trace_stepsize * (u_max - u_min)
    dy0 = cfg.trace_stepsize * (v_max - v_min)
    gH = pool.gradH
    a = (dx0 * (gH[:, 0, 0] * dx0 + gH[:, 0, 1] * dy0)
         + dy0 * (gH[:, 1, 0] * dx0 + gH[:, 1, 1] * dy0))
    b_q = (dy0 * (gH[:, 0, 0] * dy0 - gH[:, 0, 1] * dx0)
           - dx0 * (gH[:, 1, 0] * dy0 - gH[:, 1, 1] * dx0))
    error_px = 0.2 + 0.2 * (a + b_q) / jnp.maximum(a, 1e-12)
    badcond = (error_px * cfg.trace_min_improvement_factor > dist) & finite_max & ~oob & ~skipped
    error_px = jnp.minimum(error_px, 10.0)

    # normalized step direction (:149-156)
    dxn = dx0 / jnp.maximum(dist, 1e-12)
    dyn = dy0 / jnp.maximum(dist, 1e-12)
    clipped = dist > max_pix_search
    u_max = jnp.where(clipped, u_min + max_pix_search * dxn, u_max)
    v_max = jnp.where(clipped, v_min + max_pix_search * dyn, v_max)
    dist = jnp.minimum(dist, max_pix_search)
    n_cap = _steps_cap(W, H, cfg)
    n_steps = jnp.minimum((1.9999 + dist / cfg.trace_stepsize).astype(jnp.int32),
                          n_cap - 1)
    bad_dir = ~jnp.isfinite(dxn) | ~jnp.isfinite(dyn)
    oob = oob | bad_dir

    do_search = active & ~oob & ~skipped & ~badcond

    # rotated pattern (:159-166), per candidate
    Rp = KRKi[:, :2, :2]
    rot_patt = jnp.einsum("pk,njk->npj", patt, Rp)                  # (N,8,2)

    rand_shift = u_min * 1000.0 - jnp.floor(u_min * 1000.0)
    ptx0 = u_min - rand_shift * dxn
    pty0 = v_min - rand_shift * dyn

    steps = jnp.arange(n_cap, dtype=jnp.float32)
    sx = ptx0[:, None] + steps[None, :] * dxn[:, None]              # (N,100)
    sy = pty0[:, None] + steps[None, :] * dyn[:, None]
    px = sx[:, :, None] + rot_patt[:, None, :, 0]                   # (N,S,8)
    py = sy[:, :, None] + rot_patt[:, None, :, 1]
    # intensity-only gather: the discrete SSD search never reads the
    # gradient channels, and gathering (H,W) instead of (H,W,3) rows cuts
    # the dominant VPU gather traffic of the whole per-frame program 3x.
    # trace_search_nearest further drops the search stage to single-tap
    # nearest sampling (4x fewer taps on the hottest lattice of the whole
    # per-frame path; measured 44 -> ~15 ms): the discrete argmin only
    # seeds the bilinear GN refinement below, which supplies the subpixel
    # estimate, and the start-position dither (rand_shift above) decorates
    # the rounding. The reference samples the search bilinearly
    # (ImmaturePoint.cc:182-205) — set trace_search_nearest=False for the
    # exact-semantics path.
    # trace_packed: fetch all 8 pattern taps of a step with ONE gather from
    # a pattern-packed image (ops/interp.pack_pattern) — 8x fewer indices
    # on this, the hottest gather lattice of the whole per-frame path. The
    # packed search samples the UNROTATED integer pattern (the rotated
    # pattern rounds to the same integers except when a <2px offset lands
    # within rotation-angle of a rounding boundary); the bilinear GN
    # refinement below keeps the exact rotated pattern. Ablated in
    # tools/ablate_ate.py (`trace_packed_off`).
    packed3 = pack_taps(dI_target) if cfg.trace_packed else None
    if cfg.trace_search_nearest:
        if cfg.trace_packed:
            from ldso_tpu.ops.interp import pack_pattern, \
                nearest_packed_pattern
            pimg = pack_pattern(dI_target[..., 0], PATTERN)
            hit = nearest_packed_pattern(pimg, sx, sy)           # (N,S,8)
        else:
            from ldso_tpu.ops.interp import nearest
            hit = nearest(dI_target[..., 0], px, py)
    elif cfg.trace_packed:
        # the reference's BILINEAR search energy (ImmaturePoint.cc:182-205)
        # at packed-nearest cost: integer pattern offsets share the step's
        # fractional part, so one gather of the pattern+tap-packed image
        # per step bilinearly samples the whole (unrotated) pattern
        from ldso_tpu.ops.interp import (bilinear_packed_pattern,
                                         pack_pattern_bilinear)
        pimg = pack_pattern_bilinear(dI_target[..., 0], PATTERN)
        hit = bilinear_packed_pattern(pimg, sx, sy, PATTERN.shape[0])
    else:
        hit = bilinear(dI_target[..., 0], px, py)
    res = hit - (aff[:, None, None, 0] * pool.color[:, None, :]
                 + aff[:, None, None, 1])
    abs_r = jnp.abs(res)
    hw = jnp.where(abs_r < cfg.huber_th, 1.0, cfg.huber_th / jnp.maximum(abs_r, 1e-12))
    e_pix = jnp.where(jnp.isfinite(hit), hw * res * res * (2.0 - hw), 1e5)
    energies = jnp.sum(e_pix, axis=-1)                              # (N,100)
    step_live = steps[None, :] < n_steps[:, None].astype(jnp.float32)
    energies = jnp.where(step_live, energies, 1e10)

    best_idx = jnp.argmin(energies, axis=-1)
    best_energy = jnp.min(energies, axis=-1)
    best_u = ptx0 + best_idx.astype(jnp.float32) * dxn
    best_v = pty0 + best_idx.astype(jnp.float32) * dyn

    # second-best outside +-2 steps -> quality (:213-220)
    far = jnp.abs(steps[None, :] - best_idx[:, None].astype(jnp.float32)) > 2.0
    second = jnp.min(jnp.where(far, energies, 1e10), axis=-1)
    new_q = second / jnp.maximum(best_energy, 1e-12)
    quality = jnp.where((new_q < pool.quality) | (n_steps > 10), new_q, pool.quality)

    # Hybrid refine: the nearest-tap SSD surface's argmin can sit +-1-2
    # steps off the bilinear surface's (each tap rounds by up to 0.5 px),
    # and the GN below (step clip +-0.5 px, ImmaturePoint.cc:254) cannot
    # always recover the offset — the ablated 8.4%-vs-5% ATE residue
    # (BASELINE.md). Re-scoring just the +-K neighbourhood with the
    # reference's bilinear energy (ImmaturePoint.cc:182-205) recovers the
    # bilinear argmin at (2K+1)/n_steps of a full bilinear search.
    if cfg.trace_search_nearest and cfg.trace_refine_steps > 0:
        K = cfg.trace_refine_steps
        offs = jnp.arange(-K, K + 1, dtype=jnp.float32)           # (2K+1,)
        cand = best_idx[:, None].astype(jnp.float32) + offs[None, :]
        cand_live = (cand >= 0) & (cand < n_steps[:, None].astype(jnp.float32))
        cu = ptx0[:, None] + cand * dxn[:, None]
        cv = pty0[:, None] + cand * dyn[:, None]
        rpx = cu[:, :, None] + rot_patt[:, None, :, 0]            # (N,2K+1,8)
        rpy = cv[:, :, None] + rot_patt[:, None, :, 1]
        rhit = (bilinear_packed(packed3, rpx, rpy, 3)[..., 0]
                if cfg.trace_packed
                else bilinear(dI_target[..., 0], rpx, rpy))
        rres = rhit - (aff[:, None, None, 0] * pool.color[:, None, :]
                       + aff[:, None, None, 1])
        rar = jnp.abs(rres)
        rhw = jnp.where(rar < cfg.huber_th, 1.0,
                        cfg.huber_th / jnp.maximum(rar, 1e-12))
        re_pix = jnp.where(jnp.isfinite(rhit), rhw * rres * rres * (2.0 - rhw),
                           1e5)
        re_sum = jnp.where(cand_live, jnp.sum(re_pix, axis=-1), 1e10)
        j = jnp.argmin(re_sum, axis=-1)
        best_energy = jnp.min(re_sum, axis=-1)
        best_u = jnp.take_along_axis(cu, j[:, None], axis=-1)[:, 0]
        best_v = jnp.take_along_axis(cv, j[:, None], axis=-1)[:, 0]

    # GN refinement along the line (:223-275)
    def gn_energy_Hb(bu, bv):
        gx = bu[:, None] + rot_patt[:, :, 0]
        gy = bv[:, None] + rot_patt[:, :, 1]
        hc = (bilinear_packed(packed3, gx, gy, 3) if cfg.trace_packed
              else bilinear(dI_target, gx, gy))                     # (N,8,3)
        finite = jnp.isfinite(hc[..., 0])
        r = hc[..., 0] - (aff[:, None, 0] * pool.color + aff[:, None, 1])
        d = dxn[:, None] * hc[..., 1] + dyn[:, None] * hc[..., 2]
        ar = jnp.abs(r)
        hw = jnp.where(ar < cfg.huber_th, 1.0, cfg.huber_th / jnp.maximum(ar, 1e-12))
        e = jnp.where(finite,
                      pool.weights ** 2 * hw * r * r * (2.0 - hw), 1e5)
        Hc = 1.0 + jnp.sum(jnp.where(finite, hw * d * d, 0.0), -1)
        bc = jnp.sum(jnp.where(finite, hw * r * d, 0.0), -1)
        return jnp.sum(e, -1), Hc, bc

    gn0 = dict(bu=best_u, bv=best_v, ubak=best_u, vbak=best_v,
               be=jnp.full_like(best_energy, 1e5),
               stepback=jnp.zeros_like(best_u),
               done=jnp.zeros_like(do_search))

    def gn_body(_, s):
        e, Hc, bc = gn_energy_Hb(s["bu"], s["bv"])
        worse = e > s["be"]
        sb_half = s["stepback"] * 0.5
        bu_back = s["ubak"] + sb_half * dxn
        bv_back = s["vbak"] + sb_half * dyn
        step = jnp.clip(-bc / Hc, -0.5, 0.5)
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        bu_fwd = s["bu"] + step * dxn
        bv_fwd = s["bv"] + step * dyn
        upd = ~s["done"]
        new = dict(
            bu=jnp.where(upd, jnp.where(worse, bu_back, bu_fwd), s["bu"]),
            bv=jnp.where(upd, jnp.where(worse, bv_back, bv_fwd), s["bv"]),
            ubak=jnp.where(upd & ~worse, s["bu"], s["ubak"]),
            vbak=jnp.where(upd & ~worse, s["bv"], s["vbak"]),
            stepback=jnp.where(upd, jnp.where(worse, sb_half, step), s["stepback"]),
            be=jnp.where(upd & ~worse, e, s["be"]),
            done=s["done"] | (jnp.abs(jnp.where(worse, sb_half, step))
                              < cfg.trace_gn_threshold),
        )
        return new

    if cfg.trace_gn_iterations > 0:
        gn = jax.lax.fori_loop(0, cfg.trace_gn_iterations, gn_body, gn0)
        best_u, best_v, best_energy = gn["bu"], gn["bv"], gn["be"]

    # energy-based outlier (:278-287)
    is_outlier = ~(best_energy < pool.energy_th * cfg.trace_extra_slack_on_th)
    was_outlier = pool.status == IPS_OUTLIER
    outlier_to_oob = is_outlier & was_outlier

    # new idepth interval (:290-303)
    use_x = dxn * dxn > dyn * dyn
    px_lo = jnp.where(use_x, best_u - error_px * dxn, best_v - error_px * dyn)
    px_hi = jnp.where(use_x, best_u + error_px * dxn, best_v + error_px * dyn)
    pr_a = jnp.where(use_x, pr[:, 0], pr[:, 1])
    kt_a = jnp.where(use_x, Kt[:, 0], Kt[:, 1])
    id_lo = (pr[:, 2] * px_lo - pr_a) / (kt_a - Kt[:, 2] * px_lo)
    id_hi = (pr[:, 2] * px_hi - pr_a) / (kt_a - Kt[:, 2] * px_hi)
    new_min = jnp.minimum(id_lo, id_hi)
    new_max = jnp.maximum(id_lo, id_hi)
    interval_bad = (~jnp.isfinite(new_min)) | (~jnp.isfinite(new_max)) | (new_max < 0)

    good = do_search & ~is_outlier & ~interval_bad

    # compose final status with the documented precedence
    status = pool.status
    status = jnp.where(active & oob, IPS_OOB, status)
    status = jnp.where(active & ~oob & skipped, IPS_SKIPPED, status)
    status = jnp.where(active & badcond, IPS_BADCONDITION, status)
    status = jnp.where(do_search & (is_outlier | interval_bad),
                       jnp.where(outlier_to_oob, IPS_OOB, IPS_OUTLIER), status)
    status = jnp.where(good, IPS_GOOD, status)

    mid_u = (u_max + u_min) * 0.5
    mid_v = (v_max + v_min) * 0.5
    last_u = jnp.where(good, best_u,
                       jnp.where(active & (skipped | badcond), mid_u, pool.last_u))
    last_v = jnp.where(good, best_v,
                       jnp.where(active & (skipped | badcond), mid_v, pool.last_v))
    last_u = jnp.where(active & (oob | (do_search & (is_outlier | interval_bad))),
                       -1.0, last_u)
    last_v = jnp.where(active & (oob | (do_search & (is_outlier | interval_bad))),
                       -1.0, last_v)
    last_int = jnp.where(good, 2.0 * error_px,
                         jnp.where(active & (skipped | badcond), dist,
                                   jnp.where(active, 0.0, pool.last_interval)))

    return pool._replace(
        idepth_min=jnp.where(good, new_min, pool.idepth_min),
        idepth_max=jnp.where(good, new_max, pool.idepth_max),
        quality=jnp.where(do_search, quality, pool.quality),
        status=status,
        last_u=last_u, last_v=last_v, last_interval=last_int,
    )


# ---------------------------------------------------------------------------
# flat candidate arena: ONE pool with a per-candidate host index
# ---------------------------------------------------------------------------
# All hosts' candidates live in one (N,) pool + host (N,) int32 (an F x cap
# per-frame stack would pay F x cap trace/gate/activate lanes while only a
# few hundred candidates are live — measured 425 of 8192 before the switch).
# Slot allocation happens on device (no host mirror or extra pull), and
# arena_compact keeps the live set a contiguous prefix so the hot programs
# run on a statically-sized bucket of ~live lanes.

class ImmatureArena(NamedTuple):
    pool: ImmaturePool       # flat (N,) fields
    host: jax.Array          # (N,) int32 window-slot of each candidate; -1 dead


def empty_arena(N: int, cfg: Config) -> ImmatureArena:
    z = lambda *sh: jnp.zeros((N,) + sh, jnp.float32)
    pool = ImmaturePool(
        u=z(), v=z(), valid=jnp.zeros(N, bool),
        color=z(8), weights=z(8), gradH=z(2, 2),
        idepth_min=z(), idepth_max=jnp.full(N, jnp.inf, jnp.float32),
        quality=z(), energy_th=z(),
        status=jnp.full(N, IPS_UNINITIALIZED, jnp.int32),
        last_u=z(), last_v=z(), last_interval=z(),
        my_type=jnp.zeros(N, jnp.int32))
    return ImmatureArena(pool=pool, host=jnp.full(N, -1, jnp.int32))


@functools.partial(jax.jit, static_argnames=("cap", "cfg"))
def arena_add_from_status(arena: ImmatureArena, status_map, dI0,
                          host_idx, cap: int, cfg: Config):
    """make_pool + arena_add as one dispatch (the per-keyframe candidate
    creation path)."""
    return arena_add(arena, make_pool(status_map, dI0, cap, cfg), host_idx)


@jax.jit
def arena_add(arena: ImmatureArena, new_pool: ImmaturePool, host_idx):
    """Move a freshly selected per-KF pool into free arena slots. Allocation
    is on-device: the k-th valid candidate goes to the k-th free slot;
    overflow beyond capacity is dropped (the reference has no cap, but the
    selector's density target bounds the live count in practice)."""
    N = arena.host.shape[0]
    cap = new_pool.u.shape[0]
    free = jnp.nonzero(~arena.pool.valid, size=cap, fill_value=N)[0]
    rank = jnp.cumsum(new_pool.valid.astype(jnp.int32)) - 1
    slot = jnp.where(new_pool.valid, free[jnp.clip(rank, 0, cap - 1)], N)

    def put(dst, src):
        return dst.at[slot].set(src, mode="drop")

    pool = ImmaturePool(*[put(d, s) for d, s in zip(arena.pool, new_pool)])
    host = arena.host.at[slot].set(jnp.int32(host_idx), mode="drop")
    return ImmatureArena(pool=pool, host=host)


@functools.partial(jax.jit, static_argnames=("calib", "cfg"))
def trace_arena(arena: ImmatureArena, dI_target: jax.Array, KRKis, Kts, affs,
                calib: Calibration, cfg: Config) -> ImmatureArena:
    """traceNewCoarse over the flat arena: per-candidate host->new transforms
    gathered from the (F,...) tables, one dispatch, ~live-sized lanes."""
    h = jnp.clip(arena.host, 0, KRKis.shape[0] - 1)
    pool = arena.pool._replace(valid=arena.pool.valid & (arena.host >= 0))
    traced = trace(pool, dI_target, KRKis[h], Kts[h], affs[h], calib, cfg)
    return arena._replace(pool=traced._replace(valid=arena.pool.valid))


def trace_arena_prefix(arena: ImmatureArena, dI_target: jax.Array,
                       KRKis, Kts, affs, calib: Calibration, cfg: Config,
                       n: int) -> ImmatureArena:
    """trace_arena restricted to the first `n` lanes (jit-traceable body).

    `arena_compact` keeps live candidates in a contiguous prefix, so the
    caller can bound `n` by the live count (rounded up to a bucket) and
    the trace lattice shrinks from capacity x steps x pattern to
    ~live x steps x pattern — the hottest per-frame gather program
    (measured 13.5 ms at 4096 lanes for ~500 live candidates)."""
    if n >= arena.host.shape[0]:
        return trace_arena(arena, dI_target, KRKis, Kts, affs, calib, cfg)
    pre = ImmatureArena(
        pool=ImmaturePool(*[x[:n] for x in arena.pool]),
        host=arena.host[:n])
    traced = trace_arena(pre, dI_target, KRKis, Kts, affs, calib, cfg)
    return ImmatureArena(
        pool=ImmaturePool(*[f.at[:n].set(t) for f, t
                            in zip(arena.pool, traced.pool)]),
        host=arena.host)


@functools.partial(jax.jit, static_argnames=("calib", "cfg", "n"))
def trace_arena_sized(arena: ImmatureArena, dI_target: jax.Array,
                      KRKis, Kts, affs, calib: Calibration, cfg: Config,
                      n: int) -> ImmatureArena:
    """Dispatchable wrapper of trace_arena_prefix (host retry path)."""
    return trace_arena_prefix(arena, dI_target, KRKis, Kts, affs,
                              calib, cfg, n)


@jax.jit
def arena_compact(arena: ImmatureArena) -> ImmatureArena:
    """Stable-partition live candidates into a contiguous prefix.

    Run right before `arena_add` at keyframe creation: arena_add fills the
    lowest free slots, which after compaction are exactly the tail, so
    live lanes remain a prefix whose length is the live count pulled by
    `arena_counts` at the end of the keyframe — the watermark the
    per-frame trace uses to pick its static lane bucket. Between
    keyframes candidates only die, so the prefix stays a superset."""
    live = arena.pool.valid & (arena.host >= 0)
    order = jnp.argsort(~live, stable=True)
    pool = jax.tree_util.tree_map(
        lambda x: jnp.take(x, order, axis=0), arena.pool)
    host = jnp.take(arena.host, order)
    live_p = pool.valid & (host >= 0)
    return ImmatureArena(pool=pool._replace(valid=live_p),
                         host=jnp.where(live_p, host, -1))


@functools.partial(jax.jit, static_argnames=("F",))
def arena_counts(arena: ImmatureArena, F: int):
    """(F,) live-candidate counts per host slot."""
    live = (arena.pool.valid & (arena.host >= 0)).astype(jnp.int32)
    return jax.ops.segment_sum(live, jnp.clip(arena.host, 0, F - 1),
                               num_segments=F)


@functools.partial(jax.jit, static_argnames=("F",))
def arena_counts_and_watermark(arena: ImmatureArena, F: int):
    """(F+1,) = per-host live counts ++ [watermark].

    watermark = index of the last live lane + 1: the exact prefix extent
    even after deaths punch holes in the compacted prefix (a bare count
    would under-size the trace bucket then). One pull serves both the
    marginalization policy and the trace-lane bucket."""
    N = arena.host.shape[0]
    live = arena.pool.valid & (arena.host >= 0)
    counts = jax.ops.segment_sum(live.astype(jnp.int32),
                                 jnp.clip(arena.host, 0, F - 1),
                                 num_segments=F)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0] + 1
    wm = jnp.max(jnp.where(live, lanes, 0))
    return jnp.concatenate([counts, wm[None]])


@jax.jit
def arena_marg_shift(arena: ImmatureArena, idx):
    """Host slot idx leaves the window: kill its candidates, renumber."""
    valid = arena.pool.valid & (arena.host != idx)
    host = jnp.where(arena.host > idx, arena.host - 1, arena.host)
    return ImmatureArena(pool=arena.pool._replace(valid=valid), host=host)


@jax.jit
def arena_mask(arena: ImmatureArena, remove) -> ImmatureArena:
    return arena._replace(
        pool=arena.pool._replace(valid=arena.pool.valid & ~remove))


@jax.jit
def arena_insert_data(arena: ImmatureArena):
    """(N, 20) packed [u, v, energy_th, color(8), weights(8), host] — one
    pull feeds host-side point insertion."""
    p = arena.pool
    return jnp.concatenate([
        p.u[:, None], p.v[:, None], p.energy_th[:, None],
        p.color, p.weights, arena.host.astype(jnp.float32)[:, None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("calib", "cfg"))
def activate_arena(arena: ImmatureArena, idepth0, cand_valid,
                   Rs_all, ts_all, affs_all, target_masks, dIs,
                   calib: Calibration, cfg: Config):
    """Flat activation: depth-only LM for every gated candidate against all
    window frames, with per-candidate host->target precalc gathered from the
    (F, T, ...) tables. Output packed (N, 3) = [new idepth, ok, n_good]."""
    h = jnp.clip(arena.host, 0, Rs_all.shape[0] - 1)
    p = arena.pool
    new_id, ok, n_good, _ = activate(
        p.u, p.v, p.color, p.weights, p.energy_th, idepth0,
        cand_valid & (arena.host >= 0),
        Rs_all[h], ts_all[h], affs_all[h], target_masks[h],
        dIs, calib, cfg)
    return jnp.stack([new_id, ok.astype(jnp.float32),
                      n_good.astype(jnp.float32)], axis=-1)


# ---------------------------------------------------------------------------
# activation (depth-only GN over all window frames)
# ---------------------------------------------------------------------------

def linearize_depth_residual(u, v, color, weights, energy_th, idepth,
                             R, t, affLL, dI_target, calib: Calibration,
                             cfg: Config, outlier_slack):
    """One (point x target) depth-only residual (linearizeResidual,
    ImmaturePoint.cc:312-381). All args batched over points; R/t/affLL are
    one target's precalc — shared ((3,3)/(3,)/(2,)) or per-candidate
    ((N,3,3)/(N,3)/(N,2), the flat-arena path). Returns
    (energy, Hdd, bd, state)."""
    fx, fy = calib.fx[0], calib.fy[0]
    cx, cy = calib.cx[0], calib.cy[0]
    W, H = calib.w[0], calib.h[0]
    patt = jnp.asarray(PATTERN, jnp.float32)
    N = u.shape[0]
    if R.ndim == 2:
        R = jnp.broadcast_to(R, (N, 3, 3))
        t = jnp.broadcast_to(t, (N, 3))
        affLL = jnp.broadcast_to(affLL, (N, 2))

    # projectPoint with pattern offsets (ResidualProjections.h:58-86)
    KliP = jnp.stack([
        (u[:, None] + patt[None, :, 0] - cx) / fx,
        (v[:, None] + patt[None, :, 1] - cy) / fy,
        jnp.ones((u.shape[0], 8), jnp.float32)], axis=-1)           # (N,8,3)
    ptp = (jnp.einsum("nij,npj->npi", R, KliP)
           + t[:, None, :] * idepth[:, None, None])
    drescale = 1.0 / ptp[..., 2]
    new_idepth = idepth[:, None] * drescale
    uu = ptp[..., 0] * drescale
    vv = ptp[..., 1] * drescale
    Ku = uu * fx + cx
    Kv = vv * fy + cy
    inb = (drescale > 0) & (Ku > 1.1) & (Kv > 1.1) & (Ku < W - 3) & (Kv < H - 3)

    # accepts the tap-packed (H,W,12) window stack (bit-identical gather)
    hit = (bilinear_packed(dI_target, Ku, Kv, 3)
           if dI_target.shape[-1] == 12 else bilinear(dI_target, Ku, Kv))
    finite = jnp.isfinite(hit[..., 0])
    pix_ok = inb & finite
    oob = ~jnp.all(pix_ok, axis=-1)

    r = hit[..., 0] - (affLL[:, None, 0] * color + affLL[:, None, 1])
    ar = jnp.abs(r)
    hw = jnp.where(ar < cfg.huber_th, 1.0, cfg.huber_th / jnp.maximum(ar, 1e-12))
    w2 = weights * weights
    energy = jnp.sum(jnp.where(pix_ok, w2 * hw * r * r * (2.0 - hw), 0.0), -1)

    dxI = hit[..., 1] * fx
    dyI = hit[..., 2] * fy
    d_id = (dxI * drescale * (t[:, 0:1] - t[:, 2:3] * uu)
            + dyI * drescale * (t[:, 1:2] - t[:, 2:3] * vv))
    hww = hw * w2
    Hdd = jnp.sum(jnp.where(pix_ok, hww * d_id * d_id, 0.0), -1)
    bd = jnp.sum(jnp.where(pix_ok, hww * r * d_id, 0.0), -1)

    over = energy > energy_th * outlier_slack
    energy = jnp.where(over, energy_th * outlier_slack, energy)
    state = jnp.where(oob, RES_OOB, jnp.where(over, RES_OUTLIER, RES_IN))
    Hdd = jnp.where(oob, 0.0, Hdd)
    bd = jnp.where(oob, 0.0, bd)
    return energy, Hdd, bd, state


@functools.partial(jax.jit, static_argnames=("calib", "cfg"))
def activate(u, v, color, weights, energy_th, idepth0, cand_valid,
             Rs, ts, affs, target_mask, dIs, calib: Calibration, cfg: Config):
    """Batched optimizeImmaturePoint (FullSystem.cc:892-1010): depth-only LM
    for every candidate against every window frame.

    Rs (T,3,3), ts (T,3), affs (T,2): host->target precalc per window frame;
    target_mask (T,) marks real targets; dIs: (T,H,W,3) stacked pyramids
    (level 0). Per-candidate variants (N,T,...) are accepted too (the
    flat-arena path). Returns (idepth, ok, n_good_res, state (N,T))."""
    N = u.shape[0]
    if Rs.ndim == 3:                       # shared tables -> per-candidate
        Rs = jnp.broadcast_to(Rs, (N,) + Rs.shape)
        ts = jnp.broadcast_to(ts, (N,) + ts.shape)
        affs = jnp.broadcast_to(affs, (N,) + affs.shape)
        target_mask = jnp.broadcast_to(target_mask, (N,) + target_mask.shape)
    T = Rs.shape[1]

    def all_targets(idepth, slack):
        es, Hs, bs, sts = [], [], [], []
        for k in range(T):
            e, Hdd, bd, st = linearize_depth_residual(
                u, v, color, weights, energy_th, idepth,
                Rs[:, k], ts[:, k], affs[:, k], dIs[k], calib, cfg, slack)
            live = target_mask[:, k]
            es.append(jnp.where(live, e, 0.0))
            Hs.append(jnp.where(live, Hdd, 0.0))
            bs.append(jnp.where(live, bd, 0.0))
            sts.append(jnp.where(live, st, RES_OOB))
        return (sum(es), sum(Hs), sum(bs), jnp.stack(sts, axis=-1))

    idepth = idepth0
    energy, Hdd, bd, state = all_targets(idepth, 1000.0)

    lam = jnp.full_like(idepth, 0.1)
    carry = dict(idepth=idepth, e=energy, H=Hdd, b=bd, st=state, lam=lam,
                 done=jnp.zeros_like(cand_valid))

    def body(_, c):
        step = (1.0 / (c["H"] * (1.0 + c["lam"]) + 1e-12)) * c["b"]
        new_id = c["idepth"] - step
        e2, H2, b2, st2 = all_targets(new_id, 1.0)
        accept = e2 < c["e"]
        upd = ~c["done"]
        take = accept & upd
        out = dict(
            idepth=jnp.where(take, new_id, c["idepth"]),
            e=jnp.where(take, e2, c["e"]),
            H=jnp.where(take, H2, c["H"]),
            b=jnp.where(take, b2, c["b"]),
            st=jnp.where(take[:, None], st2, c["st"]),
            lam=jnp.where(upd, jnp.where(accept, c["lam"] * 0.5, c["lam"] * 5.0),
                          c["lam"]),
            done=c["done"] | (jnp.abs(step) < 1e-4 * jnp.abs(c["idepth"])),
        )
        return out

    carry = jax.lax.fori_loop(0, cfg.gn_its_on_point_activation, body, carry)

    n_good = jnp.sum((carry["st"] == RES_IN) & target_mask, axis=-1)
    ok = (cand_valid & jnp.isfinite(carry["e"]) & jnp.isfinite(carry["idepth"])
          & (carry["H"] >= cfg.min_idepth_h_act))
    return carry["idepth"], ok, n_good, carry["st"]
